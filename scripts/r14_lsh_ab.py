"""A/B minhash_lsh_pairs candidate pin: localCheckpoint(eager=True)
(shipped; leaks blocks for library callers — ADVICE r13) vs cache()
(reclaimable via clearCache/unpersist). Times the headline bench row
and the dedup_skew shapes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _isolate  # noqa: E402
from cbts_datalake_synnex_spark.operators import dedup  # noqa: E402
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload import REGISTRY  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def time_q(spark, name, reps=4):
    q = REGISTRY[name]
    fn = q.bench_fn or q.fn
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    _isolate(spark)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
        _isolate(spark)
    return min(ts), ts


def main() -> None:
    spark = get_spark("r14_lsh_ab")
    orig = dedup._pin_candidates if hasattr(dedup, "_pin_candidates") else None
    for rnd in range(2):
        for label in ("ckpt", "cache"):
            dedup._PIN_CANDIDATES_MODE = label
            m, ts = time_q(spark, "x2_minhash_lsh_pairs")
            print(f"[{rnd}] {label:5s} x2_minhash_lsh_pairs: min={m} runs={ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
