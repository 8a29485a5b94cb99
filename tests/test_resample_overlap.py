"""Gumbel-top-k resampling + source-overlap-matrix goldens."""

from __future__ import annotations

from cbts_datalake_synnex_spark.operators.decontaminate import source_overlap_matrix
from cbts_datalake_synnex_spark.operators.sampling import gumbel_topk_sample


def _scored(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, score double")


def test_gumbel_partitioning_invariant(spark):
    rows = [(i, float(i % 7)) for i in range(100)]
    a = gumbel_topk_sample(_scored(spark, rows), "doc_id", "score", n=10, salt="s")
    b = gumbel_topk_sample(
        _scored(spark, rows).repartition(13), "doc_id", "score", n=10, salt="s"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_gumbel_low_temperature_is_hard_topn(spark):
    rows = [(i, float(i)) for i in range(50)]
    out = gumbel_topk_sample(
        _scored(spark, rows), "doc_id", "score", n=5, temperature=1e-6, salt="t"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [45, 46, 47, 48, 49]


def test_gumbel_draw_tracks_weights(spark):
    # two docs, log-weights ln(19) vs 0 => doc 0 wins ~95% of draws
    import math

    rows = [(0, math.log(19.0)), (1, 0.0)]
    wins = 0
    df = _scored(spark, rows)
    picked = [
        gumbel_topk_sample(df, "doc_id", "score", n=1, salt=f"e{i}").collect()[0]["doc_id"]
        for i in range(20)
    ]
    wins = sum(1 for p in picked if p == 0)
    assert wins >= 14, picked  # binomial(20, .95) below 14 is ~1e-9


def test_gumbel_independent_salts_differ(spark):
    rows = [(i, 0.0) for i in range(200)]
    df = _scored(spark, rows)
    a = {r["doc_id"] for r in gumbel_topk_sample(df, "doc_id", "score", 20, salt="a").collect()}
    b = {r["doc_id"] for r in gumbel_topk_sample(df, "doc_id", "score", 20, salt="b").collect()}
    assert a != b


def test_source_overlap_hand_crafted(spark):
    # A and B share exactly the 5-gram "p q r s t"; C shares nothing
    docs = spark.createDataFrame(
        [
            (0, "A", "p q r s t u"),          # grams: "p q r s t", "q r s t u"
            (1, "A", "p q r s t"),            # duplicate gram within A collapses
            (2, "B", "z p q r s t"),          # grams: "z p q r s", "p q r s t"
            (3, "C", "aa bb cc dd ee ff"),
        ],
        "doc_id bigint, source string, text string",
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(docs, "text", "source", n=5).collect()
    }
    ab = out[("A", "B")]
    assert ab["n_shingles_a"] == 2 and ab["n_shingles_b"] == 2
    assert ab["n_shared"] == 1
    assert ab["containment"] == 0.5
    assert out[("A", "C")]["n_shared"] == 0
    assert out[("B", "C")]["containment"] == 0.0
    assert len(out) == 3  # full unordered pair grid


def test_source_overlap_identical_sources_fully_contained(spark):
    docs = spark.createDataFrame(
        [(0, "A", "a b c d e f g"), (1, "B", "a b c d e f g")],
        "doc_id bigint, source string, text string",
    )
    row = source_overlap_matrix(docs, "text", "source", n=5).collect()[0]
    assert row["containment"] == 1.0


def test_temporal_split_ordering_and_embargo(spark):
    from cbts_datalake_synnex_spark.operators.sampling import temporal_split

    rows = [(i, f"2024-01-{(i % 28) + 1:02d} 06:00:00") for i in range(280)]
    df = (
        spark.createDataFrame(rows, "id bigint, ts_s string")
        .selectExpr("id", "to_timestamp(ts_s) AS ts")
    )
    out = temporal_split(df, "ts", train_q=0.70, embargo_q=0.75).collect()
    by = {}
    for r in out:
        by.setdefault(r["split"], []).append(r["ts"])
    # strict temporal ordering: max(train) <= min(embargo) wait-free,
    # max(embargo) <= min(test); no overlap across the gap
    assert max(by["train"]) <= min(by["embargo"])
    assert max(by["embargo"]) <= min(by["test"])
    # discrete-quantile cuts: train holds ~70%, the embargo band is thin
    n = len(out)
    assert 0.6 * n <= len(by["train"]) <= 0.8 * n
    assert len(by["embargo"]) <= 0.15 * n
    # determinism across partitionings
    a = sorted((r["id"], r["split"]) for r in out)
    b = sorted(
        (r["id"], r["split"])
        for r in temporal_split(df.repartition(13), "ts").collect()
    )
    assert a == b

