"""As-of join (SURVEY §2.5 J6) — built from union + window, not a
candidate join.

The naive plan ("join every right row at-or-before the left timestamp,
then rank") materializes O(|L|·|R|/keys) intermediates — at 100 TB that
is the job that never finishes. This implementation is the linear one:

1. tag both inputs and union them (no shuffle yet),
2. ONE shuffle: hash-partition by the join key, sort each partition by
   (ts, side, tiebreak),
3. a single window pass carries the last-seen right-side values forward
   (``last(..., ignorenulls=True)`` over unbounded-preceding),
4. keep the left rows.

Cost: one exchange + one sort — identical shape to a sort-merge join,
with none of the fan-out. Right rows sort *before* left rows at equal
timestamps, giving ``<=`` (pandas ``merge_asof(allow_exact_matches=
True)``) semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right-side ``value_cols``
    with ``right_ts <= left_ts`` within the same ``on`` key group.

    ``tiebreak``: right-side column ordering simultaneous right rows
    (latest wins); defaults to the first value column. Left rows with
    no earlier right row get nulls (left-outer semantics).
    """
    keys = [on] if isinstance(on, str) else list(on)
    tiebreak = tiebreak or value_cols[0]

    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    r = right.select(
        *keys,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *value_cols,
    ).select(*left_cols, _TS, _SIDE, *value_cols)

    u = l.unionByName(r)
    # Total order: ts, then right-before-left (<= semantics), then the
    # right-side tiebreak (nulls last so left rows never outrank a
    # same-timestamp right row — engines disagree on default null order).
    w = (
        W.partitionBy(*keys)
        .orderBy(F.asc(_TS), F.asc(_SIDE), F.asc_nulls_last(tiebreak))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        *left_cols,
        _TS,
        _SIDE,
        *[
            F.last(F.when(F.col(_SIDE) == 0, F.col(c)), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_SIDE, _TS)


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_col: str,
    tiebreak: str,
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join, NEAREST direction (round 10) — pandas
    ``merge_asof(direction='nearest')``, which neither Spark nor the
    ``<=``-only :func:`asof_join` expresses: for each left row, the
    right row minimizing ``|left_ts - right_ts|`` within the key
    group, optionally within ``tolerance`` (same units as the ts
    columns), ties broken toward the EARLIER right row (backward
    wins), then by ``tiebreak`` (backward candidate = max
    (ts, tiebreak) at-or-before; forward = min (ts, tiebreak)
    at-or-after — fully deterministic).

    Same linear shape as :func:`asof_join` — tag, union, ONE shuffle
    on the key, one sort — but TWO window passes over the same sorted
    partition (last-preceding and first-following right row), then a
    codegen pick of the nearer side. No candidate join, no
    O(|L|·|R|/keys) fan-out. Timestamp columns must be numeric (cast
    to epoch first). Returns the left rows + (``value_col``,
    ``matched_ts``, ``matched_dir`` ∈ {'b','f', NULL}).
    """
    keys = [on] if isinstance(on, str) else list(on)
    left_cols = list(left.columns)
    l = left.select(
        *left_cols,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right.schema[value_col].dataType).alias("__rv"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__rtb"),
    )
    r = right.select(
        *keys,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in keys
        ],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.col(value_col).alias("__rv"),
        F.col(tiebreak).alias("__rtb"),
    ).select(*left_cols, _TS, _SIDE, "__rv", "__rtb")
    u = l.unionByName(r)
    order = [F.asc(_TS), F.asc(_SIDE), F.asc_nulls_last("__rtb")]
    wb = (
        W.partitionBy(*keys).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy(*keys).orderBy(*order).rowsBetween(0, W.unboundedFollowing)
    )
    # Carry ONE struct per direction so the emitted value and its
    # matched_ts always come from the SAME right row — separate
    # ignorenulls carries would skip a NULL-valued right row for the
    # value but not the timestamp (ADVICE r10, medium).
    right_row = F.when(F.col(_SIDE) == 0, F.struct(F.col(_TS).alias("t"), F.col("__rv").alias("v")))
    carried = (
        u.select(
            *left_cols,
            _TS,
            _SIDE,
            F.last(right_row, ignorenulls=True).over(wb).alias("__b"),
            F.first(right_row, ignorenulls=True).over(wf).alias("__f"),
        )
        .filter(F.col(_SIDE) == 1)
        .select(
            *left_cols,
            _TS,
            F.col("__b.v").alias("__bv"),
            F.col("__b.t").alias("__bt"),
            F.col("__f.v").alias("__fv"),
            F.col("__f.t").alias("__ft"),
        )
    )
    bd = F.col(_TS) - F.col("__bt")
    fd = F.col("__ft") - F.col(_TS)
    if tolerance is not None:
        b_ok = F.col("__bt").isNotNull() & (bd <= F.lit(int(tolerance)))
        f_ok = F.col("__ft").isNotNull() & (fd <= F.lit(int(tolerance)))
    else:
        b_ok = F.col("__bt").isNotNull()
        f_ok = F.col("__ft").isNotNull()
    use_b = b_ok & (~f_ok | (bd <= fd))
    use_f = f_ok & ~use_b
    return carried.select(
        *left_cols,
        F.when(use_b, F.col("__bv")).when(use_f, F.col("__fv")).alias(value_col),
        F.when(use_b, F.col("__bt")).when(use_f, F.col("__ft")).alias("matched_ts"),
        F.when(use_b, F.lit("b")).when(use_f, F.lit("f")).alias("matched_dir"),
    )


def banded_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    band_width: int,
) -> DataFrame:
    """Pure range join (no equi key) as a HASH join — the J5 rewrite
    that survives 100 TB.

    Spark plans a keyless ``point BETWEEN lo AND hi`` join as
    BroadcastNestedLoopJoin — quadratic, and impossible once neither
    side broadcasts. This discretizes the range dimension into bands of
    ``band_width``: a point lands in exactly one band, an interval is
    exploded to the bands it overlaps (``sequence`` — bounded when
    interval length is bounded), the join becomes an equi-join on the
    band id, and the exact predicate is the residual filter. A
    qualifying (point, interval) pair meets in exactly one band — the
    point's own — so the result needs no dedup.

    Cost: |intervals| × (len/band_width + 1) exploded rows shuffled by
    band; pick ``band_width`` ≈ the typical interval length so the
    blow-up factor stays ≈ 2. Band skew (a hot time window) is AQE
    skew-join territory, same as any hash join.

    Both columns must be numeric (cast timestamps to epoch seconds
    first). Column names must be disjoint.
    """
    p_band = F.floor(F.col(point_col) / band_width)
    i_bands = F.sequence(
        F.floor(F.col(lo_col) / band_width), F.floor(F.col(hi_col) / band_width)
    )
    p = points.withColumn("__band", p_band)
    i = intervals.withColumn("__band", F.explode(i_bands))
    joined = p.join(i, "__band").filter(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    )
    return joined.drop("__band")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    band_width: int,
) -> DataFrame:
    """Interval × interval OVERLAP join (round 10) — the two-sided
    sibling of :func:`banded_interval_join`, same rewrite: Spark plans
    the keyless ``l_lo <= r_hi AND r_lo <= l_hi`` predicate as a
    nested-loop join; discretizing both sides into bands turns it
    into a hash equi-join on the band id.

    Dedup-free by construction: a qualifying pair shares EVERY band
    the overlap spans, so pairs are kept only in the band containing
    the overlap's start ``greatest(l_lo, r_lo)`` — that band belongs
    to both explosions (the overlap start lies inside both
    intervals), so each pair survives in exactly one band and no
    distinct/dropDuplicates pass is needed (the same
    attribute-to-a-canonical-copy trick the point join gets for free).

    Cost: each side explodes by (len/band_width + 1); pick
    ``band_width`` ≈ the typical interval length for a ≈2× blow-up.
    Closed-interval semantics on numeric columns (cast timestamps to
    epoch first); column names must be disjoint across sides.
    """
    def bands(lo: str, hi: str) -> F.Column:
        return F.sequence(
            F.floor(F.col(lo) / band_width), F.floor(F.col(hi) / band_width)
        )

    a = left.withColumn("__band", F.explode(bands(l_lo, l_hi)))
    b = right.withColumn("__band", F.explode(bands(r_lo, r_hi)))
    return (
        a.join(b, "__band")
        .filter(
            (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
            & (
                F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / band_width)
                == F.col("__band")
            )
        )
        .drop("__band")
    )


# ----------------------------------------------------------------------
# Geo radius join (round 12) — the engine's first SPATIAL operator:
# "every right point within r km of each left point", the
# store-locator / geofence / POI-enrichment join. The naive plan is
# the |L|·|R| cross join with a haversine filter — the job that never
# finishes at 100 TB. This is the standard grid decomposition (the
# same bucket-then-refine shape as the IVF cell join): bucket both
# sides into square-degree cells sized so that a radius-r disc can
# only reach the 3×3 cell neighborhood, explode the LEFT side to its
# nine neighbor cells (a 9× projection — constant, not data-squared),
# equi-join on the cell id, then refine with the exact haversine.
# Lossless by construction: cell height ≥ r in latitude degrees and
# cell width ≥ r in longitude degrees at the worst (highest-|lat|)
# latitude the caller declares, so no qualifying pair can sit outside
# the neighborhood. Skew note: the cell equi-join shuffles on cell
# id; a megacity cell is a hot key — the standing salting/AQE-skew
# levers apply unchanged because this IS a plain equi-join after the
# projection.

_EARTH_KM = 6371.0088  # IUGG mean radius — the published constant


def haversine_km(lat1, lon1, lat2, lon2) -> F.Column:
    """Great-circle distance in km (haversine form — exact on the
    sphere, numerically stable at small angles where the spherical
    law of cosines loses digits)."""
    dphi = F.radians(lat2 - lat1) / 2
    dlam = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlam) * F.sin(dlam)
    )
    return F.lit(2 * _EARTH_KM) * F.asin(F.sqrt(a))


def geo_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    max_abs_lat: float = 75.0,
    lat_col: str = "lat",
    lon_col: str = "lon",
    suffix: str = "_r",
    wrap_lon: bool = False,
) -> DataFrame:
    """All (left, right) pairs with haversine distance ≤ ``radius_km``,
    via the lossless 3×3 grid candidate join. Points beyond
    ``max_abs_lat`` are REFUSED (raise at plan time would need an
    action; instead they are filtered out and the contract documented
    — near the poles the longitude cell width degenerates and a grid
    in plain degrees stops being lossless). With ``wrap_lon`` the
    longitude axis closes at ±180°: cells become EQUAL-width
    (360°/n — unequal cells would leave a narrower seam cell whose
    neighborhood under-reaches) and neighbor offsets wrap modulo n,
    so antimeridian-straddling pairs match; the haversine itself is
    Δλ-periodic, only the bucketing needed stitching. Requires at
    least three wrapped cells (radius too large to wrap raises).
    Without it, wraparound is NOT stitched (declared). Adds
    ``dist_km`` (unrounded double)."""
    cell_lat = float(radius_km) / 110.574  # km per degree latitude
    import math

    cell_lon = float(radius_km) / (
        111.320 * math.cos(math.radians(float(max_abs_lat)))
    )
    n_lon = 0
    if wrap_lon:
        n_lon = int(math.floor(360.0 / cell_lon))
        if n_lon < 3:
            raise ValueError(
                f"radius {radius_km} km needs lon cells of {cell_lon:.1f}° "
                f"at |lat| ≤ {max_abs_lat}° — fewer than 3 wrapped cells; "
                "wraparound bucketing is not lossless there"
            )
        cell_lon = 360.0 / n_lon
    def cells(df: DataFrame, rename: bool) -> DataFrame:
        out = df.filter(F.abs(F.col(lat_col)) <= float(max_abs_lat)).select(
            *[
                F.col(c).alias(c + suffix if rename else c)
                for c in df.columns
            ],
            F.floor(F.col(lat_col) / cell_lat).cast("bigint").alias("__cy"),
            (
                F.floor((F.col(lon_col) + 180.0) / cell_lon).cast("bigint")
                % n_lon
                if wrap_lon
                else F.floor(F.col(lon_col) / cell_lon).cast("bigint")
            ).alias("__cx"),
        )
        return out

    l = cells(left, rename=False)
    r = cells(right, rename=True)
    # explode LEFT to the 9 neighbor cells; right keeps its own cell
    offs = F.explode(
        F.array(*[F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                  for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    ).alias("__o")
    cx9 = F.col("__cx") + F.col("__o.dx")
    if wrap_lon:
        cx9 = ((cx9 % n_lon) + n_lon) % n_lon
    l9 = l.select("*", offs).select(
        *[c for c in l.columns if c not in ("__cy", "__cx")],
        (F.col("__cy") + F.col("__o.dy")).alias("__cy"),
        cx9.alias("__cx"),
    )
    cand = l9.join(r, ["__cy", "__cx"])
    dist = haversine_km(
        F.col(lat_col), F.col(lon_col),
        F.col(lat_col + suffix), F.col(lon_col + suffix),
    )
    return (
        cand.withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= float(radius_km))
        .drop("__cy", "__cx")
    )
