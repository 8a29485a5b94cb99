"""Salting helpers must be EXACT rewrites — identical results to the
unsalted operator on a skewed dataset (SURVEY §4.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators import skew


def _skewed_df(spark):
    # 90% of rows on one hot key
    return spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT")).otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r["k"],): (r["n"], round(r["total"], 6))
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")).collect()
    }
    salted = {
        (r["k"],): (r["n"], round(r["total"], 6))
        for r in skew.salted_aggregate(
            df,
            ["k"],
            {"n": (F.count(F.lit(1)), F.sum("n")), "total": (F.sum("v"), F.sum("total"))},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    left = _skewed_df(spark)
    right = spark.createDataFrame(
        [("HOT", "hot-dim"), ("k10", "k10-dim"), ("missing", "never")], "k string, label string"
    )
    plain = sorted(
        (r["k"], r["v"], r["label"]) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"]) for r in skew.salted_join(left, right, ["k"], n_salts=8).collect()
    )
    assert salted == plain
    # left join preserves unmatched left rows exactly once
    plain_l = sorted((r["k"], r["v"]) for r in left.join(right, "k", "left").collect())
    salted_l = sorted(
        (r["k"], r["v"]) for r in skew.salted_join(left, right, ["k"], n_salts=8, how="left").collect()
    )
    assert salted_l == plain_l


def test_salted_join_rejects_right_preserving(spark):
    """Right/full outer would duplicate unmatched right rows n_salts
    times; the ADVICE-flagged contract is to reject, not be wrong."""
    import pytest

    left = _skewed_df(spark)
    right = spark.createDataFrame([("HOT", "d")], "k string, label string")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            skew.salted_join(left, right, ["k"], n_salts=4, how=how)
