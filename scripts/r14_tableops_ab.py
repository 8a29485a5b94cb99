"""A/B the round-14 single-write z-order compact against the old
scratch-round-trip shape, on the exact table bench.py's table_ops pass
seeds (orders-sized, year/month-partitioned). Usage:
  python scripts/r14_tableops_ab.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cbts_datalake_synnex_spark.engine import LakeEngine  # noqa: E402
from cbts_datalake_synnex_spark.plans.budget import estimate_scan_bytes  # noqa: E402
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload.base import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def old_compact(eng, table, cluster_by, zorder_bits=8):
    """The pre-r14 shape: plain copy to scratch (write #1), re-read,
    cluster, write_curated overwrite (write #2)."""
    qtable = eng.qualified(table)
    df = eng.spark.table(qtable)
    total = estimate_scan_bytes(df)
    n_files = max(1, -(-total // (128 * 1024 * 1024)))
    schema_parts = [c.name for c in eng.spark.catalog.listColumns(qtable) if c.isPartition]
    scratch = os.path.join(eng.zones.root, "_compact", f"{table}_{uuid.uuid4().hex[:8]}")
    df.repartition(n_files).write.parquet(scratch)
    staged = eng.spark.read.parquet(scratch)
    zcol = eng._zvalue(staged, list(cluster_by), zorder_bits)
    staged = (
        staged.withColumn("__zval", zcol)
        .repartitionByRange(n_files, F.col("__zval"))
        .sortWithinPartitions("__zval")
        .drop("__zval")
    )
    eng.write_curated(table, staged, mode="overwrite", partition_cols=schema_parts)
    shutil.rmtree(scratch, ignore_errors=True)
    return len(eng.spark.table(qtable).inputFiles())


def main() -> None:
    spark = get_spark("r14_tableops_ab")
    orders_cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    out = {"old": [], "new": []}
    for rep in range(REPS):
        for shape in ("old", "new"):
            root = tempfile.mkdtemp(prefix="ab_lake_")
            db = f"ab_{uuid.uuid4().hex[:8]}"
            eng = LakeEngine(spark, root, database=db, clock=lambda: datetime(2024, 3, 15, 12, 0, 0))
            try:
                orders = load_table(spark, SF, "orders").select(*orders_cols)
                eng.write_curated(
                    "b_zorder",
                    orders.withColumn("processed_year", F.lit("2024")).withColumn(
                        "processed_month",
                        F.format_string("%02d", (F.col("o_orderkey") % 4 + 1).cast("int")),
                    ),
                    mode="overwrite",
                )
                spark.sparkContext.setJobDescription(f"zorder {shape} rep{rep}")
                t0 = time.perf_counter()
                if shape == "old":
                    nf = old_compact(eng, "b_zorder", ["o_custkey", "o_totalprice"])
                else:
                    nf = eng.compact_table(
                        "b_zorder", cluster_by=["o_custkey", "o_totalprice"], zorder=True
                    )
                dt = round(time.perf_counter() - t0, 3)
                out[shape].append(dt)
                print(f"{shape} rep{rep}: {dt}s n_files={nf}", flush=True)
            finally:
                try:
                    spark.catalog.setCurrentDatabase("default")
                    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
                finally:
                    shutil.rmtree(root, ignore_errors=True)
    print("old:", out["old"], "min", min(out["old"]))
    print("new:", out["new"], "min", min(out["new"]))
    spark.stop()


if __name__ == "__main__":
    main()
