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


def _run_pass(spark, sf_dir: str, names: list[str], warm: bool = True) -> tuple[dict, dict]:
    """Warm + timed noop-sink pass over ``names`` at ``sf_dir``.

    Per-query fault isolation: one broken query must not cost the
    round's numbers — record its error string and keep timing the
    survivors (the total is over survivors only).

    Steady-state measurement: one untimed pass warms the JVM (JIT,
    generated code, parquet footers), then caches are DROPPED so the
    timed pass re-executes every stage — codegen stays warm, data
    results don't.
    """
    # bench_fn: a registry entry may wrap its operator in certification
    # scaffolding (verification-report plans); the bench times the raw
    # operator so per-query wall times stay comparable across rounds.
    broken: dict[str, str] = {}
    if warm:
        for name in names:
            try:
                q = REGISTRY[name]
                fn = q.bench_fn or q.fn
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
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
            (q.bench_fn or q.fn)(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            broken[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
            continue
        timings[name] = round(time.perf_counter() - start, 3)
        spark.catalog.clearCache()  # no cross-query result reuse
    return timings, broken


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    names = [n for n, q in REGISTRY.items() if q.bench]
    timings, broken = _run_pass(spark, sf_dir, names)

    total = round(sum(timings.values()), 3)
    queries_out: dict = dict(timings)
    for name, err in broken.items():
        queries_out[name] = {"err": err}
    result = {
        "metric": "headline_queries_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": queries_out,
        "sf": float(sf),
    }

    # Second scale point: a single SF cannot separate fixed overhead
    # from scaling slope. If the 10×-scaled dataset exists (built once
    # by scripts/make_scaled_sf.py; never generated inline so the
    # primary bench can't be starved), time the same headliners there
    # and report the slope alongside. Any sf1 failure degrades to an
    # error note — the primary sf0.1 numbers are never at risk.
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_sf1"),
    )
    if os.environ.get("SPARK_GRAFT_SKIP_SF1") != "1" and os.path.isdir(sf1_dir):
        try:
            t1, b1 = _run_pass(spark, sf1_dir, names, warm=False)  # JVM already warm
            shared = [n for n in t1 if n in timings and timings[n] > 0]
            result["sf1"] = {
                "total_sec": round(sum(t1.values()), 3),
                "queries": t1,
                "errors": b1,
                "sf": 1.0,
                # wall-time ratio per 10× data — ≤10 means sublinear-or-
                # linear scaling; the per-query slope is the real signal
                "slope_vs_sf0.1": {
                    n: round(t1[n] / timings[n], 2) for n in shared
                },
            }
        except Exception as e:  # noqa: BLE001
            result["sf1"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
