"""Mergeable frequency sketches (SURVEY §2.10 [EXT] sketch tier).

The engine's sketch family so far: HLL (built-in `approx_count_distinct`
+ the `hll_sketch_agg` incremental MV lane), Misra-Gries heavy hitters
and GK quantiles (streaming state, `streaming/stateful.py`). This
module adds the remaining classic: the COUNT-MIN sketch (Cormode &
Muthukrishnan 2005, 'An improved data stream summary: the count-min
sketch and its applications', public) — the fixed-size frequency table
a 100 TB pipeline keeps per shard/day and merges counter-wise, where
exact per-item counts would be another corpus-sized table.

Scale shape: the BUILD is one ``explode(depth)`` projection over the
corpus followed by ONE hash aggregate onto (row, bucket) — map-side
combine does the heavy lifting and the result is depth×width rows
(KB-sized), a broadcast. ESTIMATES join the probe items against the
broadcast sketch and take the min over rows. Merging two sketches is
counter-wise addition (CMS is linear), which is what makes per-shard
sketches unionable without re-reading data — the mergeable-summaries
property the MG/GK operators already certify for their families.

Determinism: bucket hashing is the engine's md5 idiom
(``conv(substr(md5(salt:row:item),1,8),16,10) % width``), so a SQL
oracle re-derives the ENTIRE sketch and every estimate bit-for-bit —
no probabilistic claim is left unverified (estimates are exact
functions of the input; only their ERROR vs true counts is what the
published ε/δ analysis bounds, and ``est >= exact`` always holds by
construction — the one-sided guarantee the registry query asserts
per item).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _bucket(row: F.Column, item: F.Column, width: int, salt: str) -> F.Column:
    h = F.md5(F.concat_ws(":", F.lit(salt), row.cast("string"), item.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % F.lit(int(width))


def count_min_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Build the depth×width counter table: one exploded projection +
    one hash aggregate. Returns (d, bucket, cnt) — at most depth×width
    rows regardless of corpus size."""
    d = F.explode(F.array(*[F.lit(i) for i in range(int(depth))])).alias("d")
    rows = df.select(F.col(item_col).alias("__item")).select("__item", d)
    return (
        rows.select(
            "d", _bucket(F.col("d"), F.col("__item"), width, salt).alias("bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for every row of ``items`` (distinct
    probe frame): est = min over the depth rows of the item's
    counters. The sketch (≤ depth×width rows) broadcasts; the probe
    side shuffles nothing but its own hash agg. Returns
    (item_col, cms_est)."""
    d = F.explode(F.array(*[F.lit(i) for i in range(int(depth))])).alias("d")
    probes = items.select(F.col(item_col)).distinct().select(item_col, d)
    keyed = probes.select(
        item_col,
        "d",
        _bucket(F.col("d"), F.col(item_col), width, salt).alias("bucket"),
    )
    return (
        keyed.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cms_est"))
    )


def cms_inner_product(a: DataFrame, b: DataFrame, depth: int = 4) -> DataFrame:
    """Join-size estimation from two count-min sketches (Cormode &
    Muthukrishnan 2005 §4.2, the inner-product query): for sketches of
    the two join columns built with the SAME (depth, width, salt),

        est = min over rows d of  Σ_bucket  cntA[d,b] · cntB[d,b]

    — an upper bound on the true equi-join cardinality
    Σ_k fA(k)·fB(k) (collisions only ADD cross terms, so ``est >=
    true`` always; the published analysis bounds the excess by
    ε·|A|·|B| per row w.h.p.). At 100 TB this answers "how big is this
    join going to be" from two KB-sized summaries kept per
    table/partition — no scan of either side at planning time.

    Inputs are (d, bucket, cnt) frames from :func:`count_min_build`.
    The arithmetic is depth×width-bounded: one equi-join of two tiny
    frames, one sum per row, one min. Returns one row (est_join_size).
    """
    prod = a.alias("a").join(
        b.alias("b"),
        (F.col("a.d") == F.col("b.d")) & (F.col("a.bucket") == F.col("b.bucket")),
    )
    per_row = prod.groupBy(F.col("a.d").alias("d")).agg(
        F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("bigint").alias("ip")
    )
    # a depth-row with NO colliding buckets has true inner product 0 —
    # it must drive the min to 0, not silently drop out of the
    # aggregate (matters for disjoint/empty inputs; impossible when
    # every row collides somewhere, the common case)
    return per_row.agg(
        F.when(F.count(F.lit(1)) == int(depth), F.min("ip"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("est_join_size")
    )


# ----------------------------------------------------------------------
# Bloom filter (round 12) — the EXISTENCE sketch completing the family:
# HLL answers "how many distinct", CMS "how often", MG "who is heavy",
# GK "what quantile"; Bloom answers "have we ever seen THIS key"
# (Bloom 1970, 'Space/time trade-offs in hash coding with allowable
# errors', public). The 100 TB role is the admission pre-check: a
# KB/MB-sized position set per table answers "does this incremental
# batch contain any already-seen ids" WITHOUT reading the lake side —
# false positives send a key to the real (indexed) check, false
# negatives are impossible by construction, so skipping the lake read
# on a negative is always safe.
#
# Representation: the SET of set bit positions, not a packed bitmap —
# at most n_bits rows (each a single int), it broadcasts, unions by
# DISTINCT (Bloom OR = set union), and every bit is restatable in SQL.
# Scale shape: BUILD is one k-exploded projection + one distinct whose
# output is bounded by n_bits regardless of corpus size (map-side
# partial dedup does the collapse); PROBE joins the k-row-per-item
# frame against the broadcast position set and counts hits — member
# iff all k positions are set. Determinism: the engine's md5 idiom, so
# the oracle re-derives every bit and every verdict exactly; the
# published FPR analysis only bounds how OFTEN a non-member collides.


def _positions(item: F.Column, n_bits: int, k: int, salt: str) -> list:
    """ONE md5 per item, k independent 32-bit slices of its 128 bits
    (the Kirsch-Mitzenmacher discipline: independent hash functions
    are unnecessary — here each position reads its own non-overlapping
    nibble range, so one hash evaluation funds all k positions, a k×
    cut of the dominant build cost). k ≤ 4 by the 128-bit budget."""
    if not 1 <= int(k) <= 4:
        raise ValueError(f"k={k}: one 128-bit md5 funds at most 4 slices")
    h = F.md5(F.concat_ws(":", F.lit(salt), item.cast("string")))
    return [
        F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("bigint")
        % F.lit(int(n_bits))
        for i in range(int(k))
    ]


def bloom_build(
    df: DataFrame,
    item_col: str,
    n_bits: int = 4096,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Set-position frame (pos) for the Bloom filter over ``item_col``
    (NULLs excluded — NULL never equi-matches, same discipline as
    `analyze_join_column`). ≤ n_bits rows out, whatever goes in."""
    rows = df.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).alias("__item")
    )
    pos = F.explode(F.array(*_positions(F.col("__item"), n_bits, k, salt)))
    return rows.select(pos.alias("pos")).distinct()


def bloom_probe(
    bits: DataFrame,
    items: DataFrame,
    item_col: str,
    n_bits: int = 4096,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Membership verdict per distinct probe item: ``bloom_member``
    is true iff ALL k of the item's positions are set. The position
    set (≤ n_bits one-int rows) broadcasts; a present key always
    probes true (its own build set exactly these bits — the zero-
    false-negative guarantee the registry query asserts per key).
    Returns (item_col, bloom_member)."""
    probes = (
        items.filter(F.col(item_col).isNotNull()).select(F.col(item_col)).distinct()
    )
    pos = F.explode(F.array(*_positions(F.col(item_col), n_bits, k, salt)))
    keyed = probes.select(item_col, pos.alias("pos"))
    # distinct: appended/merged position tables may carry duplicate
    # pos rows, which would inflate the per-item hit count past k
    hit = bits.select("pos").distinct().select(F.col("pos"), F.lit(1).alias("__hit"))
    return (
        keyed.join(F.broadcast(hit), "pos", "left")
        .groupBy(item_col)
        .agg((F.count("__hit") == int(k)).alias("bloom_member"))
    )


def bloom_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bloom OR — the mergeable-summaries property: per-shard/day
    filters built with the SAME (n_bits, k, salt) union by position-set
    union, no data re-read. ≤ n_bits rows out."""
    return a.select("pos").union(b.select("pos")).distinct()


# ----------------------------------------------------------------------
# KMV (k-minimum-values) distinct-value sketch — the theta-sketch
# family member (Bar-Yossef et al. 2002 'Counting distinct elements in
# a data stream'; Beyer et al. 2007 KMV synopses; Dasgupta et al. 2016
# theta-sketch framework — all public). Completes the engine's sketch
# tier: CMS (frequencies), Bloom (membership), MG (heavy hitters), GK
# (quantiles), HLL (plain distinct counts) — KMV adds what HLL cannot
# do: SET-OPERATION cardinalities (|A ∪ B|, |A ∩ B|) over sketches
# built independently per shard/day/source, without ever co-shuffling
# the raw keys.
#
# Scale shape: the BUILD maps each item to a 60-bit md5 hash and keeps
# the k smallest DISTINCT hashes — one Arrow scan per partition with a
# bounded per-group state (≤ k int64s), emitting ≤ partitions×groups×k
# candidate rows, then one tiny distinct + per-group top-k. The raw
# corpus is touched once and never shuffled; everything downstream
# (estimates, unions, intersections) runs on KB-sized sketch frames.
#
# Determinism: hashes are the engine's md5 idiom (15 hex chars →
# bigint in [0, 2^60)), so a SQL oracle re-derives every sketch row
# and every estimate bit-for-bit. The estimator is the unbiased
# (k−1)/h_(k) form (h in [0,1) units; here est = (k−1)·2^60/h_k) with
# the exact-count short-circuit when a group yields fewer than k
# distinct hashes — the sketch then IS the distinct set.

_KMV_SCALE = float(2**60)  # exactly representable: 2^60


def _kmv_hash(item: F.Column, salt: str = "kmv") -> F.Column:
    h = F.md5(F.concat_ws(":", F.lit(salt), item.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def kmv_build(
    df: DataFrame,
    item_col: str,
    group_cols=(),
    k: int = 128,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct 60-bit hashes
    of ``item_col``. Returns (*group_cols, rank, h) with rank 1..k
    ascending by hash — ≤ k rows per group regardless of input size."""
    import numpy as np
    import pandas as pd

    gcols = list(group_cols)
    kk = int(k)
    hashed = df.select(*gcols, _kmv_hash(F.col(item_col), salt).alias("h"))
    part_schema = hashed.schema

    def prune(batches):
        # bounded partial state: group -> ascending int64 array, ≤ k
        state: dict = {}
        for pdf in batches:
            if gcols:
                grouped = pdf.groupby(gcols, sort=False, dropna=False)
                for key, sub in grouped:
                    kt = key if isinstance(key, tuple) else (key,)
                    arr = sub["h"].to_numpy(dtype=np.int64)
                    prev = state.get(kt)
                    merged = np.unique(
                        arr if prev is None else np.concatenate([prev, arr])
                    )
                    state[kt] = merged[:kk]
            else:
                arr = pdf["h"].to_numpy(dtype=np.int64)
                prev = state.get(())
                merged = np.unique(
                    arr if prev is None else np.concatenate([prev, arr])
                )
                state[()] = merged[:kk]
        cols: dict = {c: [] for c in [*gcols, "h"]}
        for kt, arr in state.items():
            for j, g in enumerate(gcols):
                cols[g].extend([kt[j]] * len(arr))
            cols["h"].extend(int(v) for v in arr)
        yield pd.DataFrame(cols)

    partial = hashed.mapInPandas(prune, schema=part_schema)
    # candidates are ≤ partitions×groups×k rows — the distinct and the
    # per-group window below run on a KB-sized frame, never the corpus
    w = W.partitionBy(*gcols).orderBy("h") if gcols else W.orderBy("h")
    return (
        partial.distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select(*gcols, "rank", "h")
    )


def kmv_estimate(
    sketch: DataFrame, group_cols=(), k: int = 128, est_col: str = "kmv_est"
) -> DataFrame:
    """Distinct-count estimate per group from a `kmv_build` frame:
    exact n_kept when the group produced fewer than k hashes (the
    sketch saw everything), else the unbiased (k−1)·2^60/h_(k)."""
    gcols = list(group_cols)
    kk = int(k)
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max("h").alias("__hk"),
    )
    est = F.when(
        F.col("n_kept") < kk, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(kk - 1) * _KMV_SCALE) / F.col("__hk").cast("double"))
    return agg.select(*gcols, "n_kept", F.round(est, 6).alias(est_col))


def kmv_merge(a: DataFrame, b: DataFrame, group_cols=(), k: int = 128) -> DataFrame:
    """Union of two sketches (same group key): the k smallest distinct
    hashes of the combined sets — a valid KMV sketch of A ∪ B, so
    `kmv_estimate` on the result estimates |A ∪ B|. Sketch-frame-only:
    the raw corpora are never revisited."""
    gcols = list(group_cols)
    kk = int(k)
    u = a.select(*gcols, "h").unionByName(b.select(*gcols, "h")).distinct()
    w = W.partitionBy(*gcols).orderBy("h") if gcols else W.orderBy("h")
    return (
        u.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select(*gcols, "rank", "h")
    )


def kmv_intersect_estimate(
    a: DataFrame, b: DataFrame, group_cols=(), k: int = 128,
    est_col: str = "kmv_est",
) -> DataFrame:
    """|A ∩ B| estimate via the theta rule: θ = min(θ_A, θ_B) where
    θ_X is the (k)th smallest hash of X (or 2^60 when X kept < k, i.e.
    the sketch is exact); the estimate is |{h ∈ A∩B : h < θ}|·2^60/θ.
    When BOTH sides are exact this degrades gracefully to the exact
    intersection count. Returns (*group_cols, n_common, est_col); the
    ungrouped form is TOTAL — zero surviving common hashes still yield
    the one (n_common=0, est=0.0) row (a disjoint-keys pre-flight
    answer is an answer, not an empty frame). Grouped callers join on
    the group key and treat absent groups as no-overlap."""
    gcols = list(group_cols)
    kk = int(k)

    def theta(s: DataFrame, name: str) -> DataFrame:
        return s.groupBy(*gcols).agg(
            F.when(
                F.count(F.lit(1)) >= kk, F.max("h")
            ).otherwise(F.lit(int(_KMV_SCALE))).alias(name)
        )

    th = (
        theta(a, "__ta").join(theta(b, "__tb"), gcols)
        if gcols
        else theta(a, "__ta").crossJoin(theta(b, "__tb"))
    )
    th = th.withColumn("__theta", F.least("__ta", "__tb"))
    common = a.select(*gcols, "h").join(b.select(*gcols, "h"), [*gcols, "h"])
    joined = common.join(F.broadcast(th), gcols) if gcols else common.crossJoin(
        F.broadcast(th)
    )
    est = F.col("n_common").cast("double") * F.lit(_KMV_SCALE) / F.col(
        "__theta"
    ).cast("double")
    if gcols:
        agg = (
            joined.filter(F.col("h") < F.col("__theta"))
            .groupBy(*gcols, "__theta")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
        )
        return agg.select(*gcols, "n_common", F.round(est, 6).alias(est_col))
    # ungrouped: a no-groupBy aggregate always emits its one row, so a
    # zero-overlap pair reports (0, 0.0) instead of vanishing
    cnt = joined.filter(F.col("h") < F.col("__theta")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common")
    )
    return cnt.crossJoin(F.broadcast(th)).select(
        "n_common", F.round(est, 6).alias(est_col)
    )


def kmv_pairwise_overlap(
    sketch: DataFrame, group_col: str, k: int = 256, est_col: str = "kmv_est"
) -> DataFrame:
    """All-pairs |A ∩ B| estimates ACROSS the groups of one grouped
    KMV sketch frame — the sketch-only overlap MATRIX (cross-source
    contamination, vocabulary sharing, shard drift) computed entirely
    on the ≤ groups×k-row sketch: per-group thetas, every unordered
    pair (ga < gb) via a tiny cross join, common hashes below
    min(θ_a, θ_b) via one self-equi-join on h. TOTAL over pairs:
    zero-overlap pairs report (0, 0.0) rather than vanishing (a
    contamination matrix with missing cells reads as unchecked, not
    clean). Returns (group_a, group_b, n_common, est_col)."""
    kk = int(k)
    g = group_col
    th = sketch.groupBy(g).agg(
        F.when(F.count(F.lit(1)) >= kk, F.max("h"))
        .otherwise(F.lit(int(_KMV_SCALE)))
        .alias("__t")
    )
    pairs = (
        th.select(F.col(g).alias("group_a"), F.col("__t").alias("__ta"))
        .crossJoin(th.select(F.col(g).alias("group_b"), F.col("__t").alias("__tb")))
        .filter(F.col("group_a") < F.col("group_b"))
        .withColumn("__theta", F.least("__ta", "__tb"))
    )
    a = sketch.select(F.col(g).alias("group_a"), "h")
    b = sketch.select(F.col(g).alias("group_b"), "h")
    common = (
        a.join(b, "h")
        .filter(F.col("group_a") < F.col("group_b"))
        .join(F.broadcast(pairs.select("group_a", "group_b", "__theta")),
              ["group_a", "group_b"])
        .filter(F.col("h") < F.col("__theta"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    est = F.col("n_common").cast("double") * F.lit(_KMV_SCALE) / F.col(
        "__theta"
    ).cast("double")
    return (
        pairs.join(common, ["group_a", "group_b"], "left")
        .withColumn("n_common", F.coalesce("n_common", F.lit(0).cast("bigint")))
        .select("group_a", "group_b", "n_common",
                F.round(est, 6).alias(est_col))
    )
