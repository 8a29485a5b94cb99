"""Driver-rehearsal sweep: run EVERY registry query the way the
correctness driver does (fresh session semantics, sf0.01, DuckDB
oracle side-by-side), print per-query wall time and match status.

Usage: python scripts/check_all.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from cbts_datalake_synnex_spark.workload import REGISTRY
from cbts_datalake_synnex_spark.workload.base import TABLES
from tests.parity import assert_frames_match


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("check_all")
        .getOrCreate()
    )
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results, total = {}, 0.0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        status = "ok"
        try:
            pdf = q.fn(spark, sf_dir).toPandas()
            if q.oracle is not None:
                opdf = duck.execute(q.oracle).fetchdf()
                assert_frames_match(pdf, opdf, name)
            else:
                status = "rows_only"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {type(exc).__name__}: {str(exc)[:200]}"
        dt = time.time() - t0
        total += dt
        results[name] = (round(dt, 2), status)
        print(f"{dt:7.2f}s  {name:36s} {status}")
    n_fail = sum(1 for _, s in results.values() if s.startswith("FAIL"))
    print(f"\n{len(results)} queries, {total:.1f}s total, {n_fail} failures")
    with open("/tmp/check_all.json", "w") as f:
        json.dump({k: {"sec": v[0], "status": v[1]} for k, v in results.items()}, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
