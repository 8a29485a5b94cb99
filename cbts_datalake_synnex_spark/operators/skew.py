"""Skew-mitigation helpers (SURVEY §4.2 / 'skewed keys → salting or
AQE skew-join').

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these helpers cover the two places AQE can't:

* ``salted_aggregate`` — a single hot GROUP BY key overwhelms one
  reducer even after AQE (AQE splits *partitions*, but one key is one
  partition-slice). Two-phase aggregation over (key, salt) spreads the
  hot key across ``n_salts`` reducers; algebraic aggregates re-combine
  exactly.
* ``salted_join`` — a hot key on the LEFT of a join with a small-ish
  right side: left gets a random-but-deterministic salt, right is
  replicated across all salts. Exact same rows as the plain join for
  inner / left-outer / left-semi / left-anti; right/full outer would
  emit each unmatched right row once per salt, so those are rejected.

Both are exact rewrites — results are identical to the unsalted
operator, which is how the tests pin them.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key_cols: Sequence[str], n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): xxhash64 of the full
    row's key + a uniformly-distributed row discriminator
    (monotonically_increasing_id is partition-skewed, so we hash it)."""
    disc = F.xxhash64(*[F.col(c) for c in key_cols], F.monotonically_increasing_id())
    return df.withColumn(salt_col, F.pmod(disc, F.lit(n_salts)).cast("int"))


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase exact aggregation: partial per (key, salt), final per
    key. ``aggs`` maps output name → (partial_agg_expr, final_agg_expr
    over the partial column); e.g.
    ``{"n": (F.count(F.lit(1)), F.sum("n")), "total": (F.sum("v"), F.sum("total"))}``.
    """
    salted = with_salt(df, key_cols, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left; explode the
    (small) right across every salt value so each salted partition finds
    its matches. Right-side amplification is ×n_salts — use only when
    |right| × n_salts is comfortably shuffle-able, which is exactly the
    hot-key regime.

    Only left-preserving join types are exact under right-side
    replication: an unmatched RIGHT row exists once per salt replica, so
    right/full outer joins would emit it ``n_salts`` times. Those are
    rejected rather than silently wrong."""
    normalized = how.replace("_", "").lower()
    if normalized not in {"inner", "left", "leftouter", "leftsemi", "leftanti"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "replicating the right side across salts duplicates unmatched right rows"
        )
    lsalted = with_salt(left, on, n_salts)
    rrep = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = lsalted.join(rrep, [*on, "__salt"], how)
    return out.drop("__salt")


def skew_profile(df: DataFrame, key_col: str, round_dp: int = 6) -> DataFrame:
    """§4.2 [EXT] — shuffle-key SKEW profile (round 10): the
    diagnostic a pipeline runs BEFORE choosing between a plain join,
    `salted_join`, and AQE skew splitting — how concentrated is the
    key distribution a groupBy/join on ``key_col`` would shuffle?

    Scale shape: one hash aggregate compacts the corpus to the
    (key, cnt) table; every statistic below runs on that table —
    count/max/percentile aggregates (percentile_disc is a partial-
    aggregating built-in, no global sort task), and the top-10 share
    uses a TakeOrdered-style sort+limit (k rows to the driver side of
    the agg, never the key table). Nothing corpus-sized moves twice,
    no unpartitioned window anywhere (the classifier-eval boundedness
    discipline).

    Returns ONE row: (n_rows, n_keys, max_cnt, p50_cnt, p90_cnt,
    p99_cnt, top1_share, top10_share) — shares rounded; a uniform
    keyspace reads top1_share ≈ 1/n_keys, a hot-key disaster reads
    ≈ 1.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.percentile(F.col("cnt"), F.lit(0.5), F.lit(1)).alias("__p50"),
        F.percentile(F.col("cnt"), F.lit(0.9), F.lit(1)).alias("__p90"),
        F.percentile(F.col("cnt"), F.lit(0.99), F.lit(1)).alias("__p99"),
    )
    top10 = (
        counts.orderBy(F.desc("cnt"), F.asc(key_col))
        .limit(10)
        .agg(F.sum("cnt").cast("bigint").alias("__top10"))
    )
    return stats.crossJoin(F.broadcast(top10)).select(
        "n_rows",
        "n_keys",
        "max_cnt",
        F.round(F.col("__p50").cast("double"), round_dp).alias("p50_cnt"),
        F.round(F.col("__p90").cast("double"), round_dp).alias("p90_cnt"),
        F.round(F.col("__p99").cast("double"), round_dp).alias("p99_cnt"),
        F.round(F.col("max_cnt") / F.col("n_rows"), round_dp).alias("top1_share"),
        F.round(F.col("__top10") / F.col("n_rows"), round_dp).alias("top10_share"),
    )
