#!/bin/sh
# Build the JVM-lane UDF jar (icu4j unicode normalization) against the
# installed Spark's own jars — icu4j ships inside the distribution, so
# the only build dependency is javac 17 (JAVA_HOME is set in this
# image). Output: cbts_datalake_synnex_spark/jars/spark-graft-udfs.jar,
# loaded at runtime by functions/jvm_udfs.py via ADD JAR +
# registerJavaFunction (gated: the pandas_udf lane stays the fallback).
set -eu
cd "$(dirname "$0")"
SPARK_JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
OUT_DIR=../cbts_datalake_synnex_spark/jars
mkdir -p "$OUT_DIR" build_classes
javac -encoding UTF-8 -cp "$SPARK_JARS/*" -d build_classes java/udfs/UnicodeNormalizeUdf.java
jar cf "$OUT_DIR/spark-graft-udfs.jar" -C build_classes udfs
rm -rf build_classes
echo "built $OUT_DIR/spark-graft-udfs.jar"
