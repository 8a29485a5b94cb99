"""A/B weighted_minhash_signatures aggregate: min(struct) SortAggregate
(shipped) vs min_by (ObjectHashAggregate). Checks bit-identical
signatures, prints the aggregate node type, times the signature stage
and the full x2_weighted_minhash_pairs bench row."""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _isolate  # noqa: E402
from cbts_datalake_synnex_spark.operators import dedup  # noqa: E402
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload.base import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sigs_minby(tf, num_perm):
    n = int(num_perm)
    picks = tf.select(
        "doc",
        F.explode(F.array(*[F.lit(k) for k in range(n)])).alias("k"),
        F.struct(F.col("sh").alias("s"), F.log("w").alias("lw")).alias("pair"),
    ).select("doc", "k", dedup._icws_pick(F.col("k"), F.col("pair")).alias("p"))
    agg = picks.groupBy("doc").agg(
        *[
            F.min_by(
                F.when(F.col("k") == k, F.struct(F.col("p")["s"].alias("s"), F.col("p")["t"].alias("t"))),
                F.when(F.col("k") == k, F.col("p")),
            ).alias(f"p{k}")
            for k in range(n)
        ]
    )
    return agg.select(
        "doc",
        *[
            F.xxhash64(F.lit(k), F.col(f"p{k}")["s"], F.col(f"p{k}")["t"]).alias(f"h{k}")
            for k in range(n)
        ],
    )


def main() -> None:
    spark = get_spark("r14_icws_ab")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    tf = dedup.weighted_shingle_tf(docs, "doc_id", "text", 3).localCheckpoint()

    old = dedup.weighted_minhash_signatures(docs, "doc_id", "text", 16, 3, tf=tf)
    new = sigs_minby(tf, 16)
    hexpr = F.sum(
        F.xxhash64(*(["doc"] + [f"h{k}" for k in range(16)])).cast("decimal(38,0)")
    ).alias("h")
    ho, hn = old.agg(hexpr).first()["h"], new.agg(hexpr).first()["h"]
    print(f"hash old={ho} new={hn} equal={ho == hn}", flush=True)
    assert ho == hn

    for label, fn in (("old min(struct)", lambda: dedup.weighted_minhash_signatures(docs, "doc_id", "text", 16, 3, tf=tf)),
                      ("new min_by", lambda: sigs_minby(tf, 16))):
        plan = fn()._jdf.queryExecution().executedPlan().toString()
        aggs = sorted(set(re.findall(r"(SortAggregate|ObjectHashAggregate|HashAggregate)", plan)))
        fn().write.format("noop").mode("overwrite").save()
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{label}: aggs={aggs} min={min(ts)} runs={ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
