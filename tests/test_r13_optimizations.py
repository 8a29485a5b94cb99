"""Round-13 optimization regression pins.

1. The explode-k ICWS signature rewrite (codegen'd pick + conditional
   min aggregate) must produce BIT-IDENTICAL signatures to the
   straightforward per-permutation array_min(transform(...)) reference
   it replaced — the rewrite is a physical-plan change only.
2. bench._isolate must drop leaked checkpoint RDDs. (Round 14: the
   PROTECTED_BENCH_RDD_IDS escape hatch was retired with the
   leakage-split pair memo — the sweep is now unconditional.)
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cbts_datalake_synnex_spark.operators import dedup  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from cbts_datalake_synnex_spark.session import get_spark

    return get_spark("test_r13_optimizations")


def _reference_signatures(tf, num_perm: int):
    """The pre-r13 formulation: collect_list per doc, then one
    interpreted array_min(transform(...)) per permutation."""
    docs = tf.groupBy("doc").agg(
        F.collect_list(
            F.struct(F.col("sh").alias("s"), F.log("w").alias("lw"))
        ).alias("sw")
    )
    def _picker(kk: int):
        # one-arg lambda: a two-arg transform lambda binds the second
        # param to the ARRAY INDEX, not the closure (the _minhash_cols
        # trap) — the pre-r13 code closed over k exactly like this
        return lambda p: dedup._icws_pick(kk, p)

    cols = []
    for k in range(num_perm):
        best = F.array_min(F.transform(F.col("sw"), _picker(k)))
        cols.append(F.xxhash64(F.lit(k), best["s"], best["t"]).alias(f"h{k}"))
    return docs.select("doc", *cols)


def test_icws_signatures_match_reference(spark):
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("alpha beta gamma delta"),
            (F.col("id") % 7).cast("string"),
            (F.col("id") % 3).cast("string"),
            F.lit("omega kappa"),
        ).alias("text"),
    )
    tf = dedup.weighted_shingle_tf(docs, "doc_id", "text", 3).localCheckpoint()
    got = (
        dedup.weighted_minhash_signatures(docs, "doc_id", "text", 8, 3, tf=tf)
        .orderBy("doc")
        .collect()
    )
    want = _reference_signatures(tf, 8).orderBy("doc").collect()
    assert got == want


def test_bench_isolate_sweeps_leaked_checkpoints(spark):
    import bench

    jsc = spark.sparkContext._jsc
    before = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    _leaked = spark.range(10).localCheckpoint()
    after = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    new_ids = after - before
    assert new_ids, "localCheckpoint should register persistent RDDs"
    bench._isolate(spark)
    final = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    assert not (new_ids & final), "leaked checkpoints must be unpersisted"
