"""Third-scale-point slope runner (round 13, judge r12 #9): times the
heavy-tail queries (j_khop_bfs, x7_dup_ngram_rate, x3_knn_join) at the
given sf dirs so the recorded slopes have >= 3 points — two points
cannot separate fixed overhead from scaling slope. Noop sink, one warm
pass, same discipline as bench.py. Usage:

    python scripts/slope3.py /root/testdata/sf0.1 .bench_sf1 .bench_sf3
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload import REGISTRY  # noqa: E402

QUERIES = ["j_khop_bfs", "x7_dup_ngram_rate", "x3_knn_join"]


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("slope3")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}
    for d in dirs:
        out[d] = {}
        for name in QUERIES:
            q = REGISTRY[name]
            fn = q.bench_fn or q.fn
            fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            out[d][name] = round(time.perf_counter() - t0, 3)
            print(f"{d} {name}: {out[d][name]}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
