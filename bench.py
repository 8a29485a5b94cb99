"""Benchmark runner — times the headline workload queries.

Usage: ``python bench.py`` (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS).
Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Materialization is ``df.write.format("noop")`` — full execution of
every stage without driver-side collection, so the timing measures the
plan, not the result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cbts_datalake_synnex_spark.session import get_spark
from cbts_datalake_synnex_spark.workload import REGISTRY


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    names = [n for n, q in REGISTRY.items() if q.bench]

    # Per-query fault isolation: one broken query must not cost the
    # round's numbers — record its error string and keep timing the
    # survivors (the total is over survivors only).
    broken: dict[str, str] = {}

    # Steady-state measurement: one untimed pass warms the JVM (JIT,
    # generated code, parquet footers), then caches are DROPPED so the
    # timed pass re-executes every stage — codegen stays warm, data
    # results don't.
    for name in names:
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            broken[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in names:
        if name in broken:
            continue
        q = REGISTRY[name]
        start = time.perf_counter()
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            broken[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
            continue
        timings[name] = round(time.perf_counter() - start, 3)
        spark.catalog.clearCache()  # no cross-query result reuse

    total = round(sum(timings.values()), 3)
    queries_out: dict = dict(timings)
    for name, err in broken.items():
        queries_out[name] = {"err": err}
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": queries_out,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
