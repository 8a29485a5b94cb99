"""Round-14 optimization measurement harness.

Times individual registry queries (noop sink, N repeats, warm JVM)
and/or dumps their formatted physical plans to plans/r14/<name>_<tag>.txt.

Usage:
  python scripts/r14_measure.py time  [--reps N] name [name ...]
  python scripts/r14_measure.py plan  --tag before name [name ...]
  python scripts/r14_measure.py both  --tag before [--reps N] name [name ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Timing methodology matches bench.py exactly: bench_fn or fn, noop sink,
bench._isolate between runs (clearCache + leaked-checkpoint sweep — the
measurement-hygiene fix r13 diagnosed; ADVICE r13 flagged r13_measure.py
for using bare clearCache), one untimed warm pass.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _isolate  # noqa: E402
from cbts_datalake_synnex_spark.plans.inspect import explain_str  # noqa: E402
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload import REGISTRY  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "plan", "both"])
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("r14_measure")
    out: dict = {}
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.names:
        q = REGISTRY[name]
        fn = q.bench_fn or q.fn
        if args.mode in ("plan", "both"):
            df = fn(spark, args.sf)
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(explain_str(df, "formatted"))
            _isolate(spark)
        if args.mode in ("time", "both"):
            spark.sparkContext.setJobDescription(f"r14 warm: {name}")
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            _isolate(spark)
            times = []
            for i in range(args.reps):
                spark.sparkContext.setJobDescription(f"r14 timed {i}: {name}")
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
                _isolate(spark)
            out[name] = {"min": min(times), "runs": times}
            print(f"{name}: min={min(times)} runs={times}", flush=True)

    if out:
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
