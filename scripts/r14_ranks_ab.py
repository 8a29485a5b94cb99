"""Within-session A/B of ranks._pin_ranged: cache vs eager
localCheckpoint, timed on t_rfm_segments / dq_ks_test /
x8_quantile_normalize (the two-level-CDF consumers)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _isolate  # noqa: E402
from cbts_datalake_synnex_spark.operators import ranks  # noqa: E402
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload import REGISTRY  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["t_rfm_segments", "dq_ks_test", "x8_quantile_normalize"]


def time_q(spark, name, reps=4):
    q = REGISTRY[name]
    fn = q.bench_fn or q.fn
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    _isolate(spark)
    ts = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} {i}")
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
        _isolate(spark)
    return min(ts), ts


def main() -> None:
    spark = get_spark("r14_ranks_ab")
    pin_cache = lambda df: df.cache()  # noqa: E731
    pin_ckpt = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    pin_lazy = lambda df: df.localCheckpoint(eager=False)  # noqa: E731
    for rnd in range(2):
        for label, pin in (("ckpt", pin_ckpt), ("lazy", pin_lazy)):
            ranks._pin_ranged = pin
            for name in QUERIES:
                m, ts = time_q(spark, name)
                print(f"[{rnd}] {label:5s} {name}: min={m} runs={ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
