"""Debug: compare old (scratch round-trip) vs new (direct) z-order
compact layouts on the lifecycle test's 60k-row fixture."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.engine import LakeEngine
from cbts_datalake_synnex_spark.session import get_spark

spark = get_spark("zdebug")
n = 60_000
df = spark.range(n).select(
    F.col("id"),
    F.abs(F.xxhash64("id", F.lit(1)) % 1000).alias("x"),
    F.abs(F.xxhash64("id", F.lit(2)) % 1000).alias("y"),
)

def report(eng, tbl):
    qt = eng.qualified(tbl)
    t = spark.table(qt).select(F.col("_metadata.file_path").alias("f"), "x", "y")
    agg = t.groupBy("f").agg(
        F.count(F.lit(1)).alias("rows"),
        (F.max("x") - F.min("x")).alias("wx"),
        (F.max("y") - F.min("y")).alias("wy"),
    ).collect()
    for r in sorted(agg, key=lambda r: -r["rows"]):
        print(f"  rows={r['rows']:6d} wx={r['wx']:4d} wy={r['wy']:4d}")
    print("  avg wx:", sum(r["wx"] for r in agg) / len(agg) / 999.0,
          "avg wy:", sum(r["wy"] for r in agg) / len(agg) / 999.0,
          "n_files:", len(agg))

root = tempfile.mkdtemp(prefix="zdbg_")
eng = LakeEngine(spark, root, database="zdbg")
eng.write_curated("zord", df, mode="overwrite", partition_cols=[])
nl = eng.compact_table("zord", target_file_bytes=48 * 1024, cluster_by=["x", "y"])
print("after linear:", nl)
nz = eng.compact_table("zord", target_file_bytes=48 * 1024, cluster_by=["x", "y"], zorder=True)
print("after zorder NEW:", nz)
report(eng, "zord")

# old shape: scratch round-trip then clustered write
eng.write_curated("zold", df, mode="overwrite", partition_cols=[])
nl = eng.compact_table("zold", target_file_bytes=48 * 1024, cluster_by=["x", "y"])
qt = eng.qualified("zold")
d2 = spark.table(qt)
from cbts_datalake_synnex_spark.plans.budget import estimate_scan_bytes
total = estimate_scan_bytes(d2)
n_files = max(1, -(-total // (48 * 1024)))
scratch = os.path.join(root, "_oldsim")
d2.repartition(n_files).write.parquet(scratch)
staged = spark.read.parquet(scratch)
zcol = eng._zvalue(staged, ["x", "y"], 8)
staged = (
    staged.withColumn("__zval", zcol)
    .repartitionByRange(n_files, F.col("__zval"))
    .sortWithinPartitions("__zval")
    .drop("__zval")
)
eng.write_curated("zold", staged, mode="overwrite", partition_cols=[])
print("OLD shape n_files:", n_files)
report(eng, "zold")
spark.stop()
