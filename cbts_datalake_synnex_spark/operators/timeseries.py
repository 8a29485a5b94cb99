"""Per-entity sequential recurrences over event streams (SURVEY §2.6
[EXT]).

`t_gap_fill` (round 8) densifies an irregular stream onto a fixed
grid; this module adds the canonical smoother over such streams: the
exponentially-weighted moving average in its adjust-free streaming
form,

    y_1 = x_1;   y_i = a * x_i + (1 - a) * y_{i-1}

— the recurrence every monitoring/feature pipeline uses for drift
smoothing. The reference has no time-series tier at all; this is part
of the mandated [EXT] large-pipeline additions.

Why not a window function: an exact EWMA is a linear recurrence whose
closed form sum_j a*(1-a)^(i-j)*x_j needs (1-a)^(-i) to be restated
as a prefix sum, which overflows double range beyond a few hundred
rows per entity — so no frame-spec aggregate or prefix-sum trick
states it exactly in fixed precision. The honest distributed shape is
ONE shuffle onto the entity key and a sequential scan (carried state:
one double per entity).

Why mapInPandas and not grouped-map: applyInPandas pays a pandas
frame construction PER GROUP — at 15k entities × ~4 ms that is tens
of seconds for a sub-second scan (measured: 20.5 s → 1-2 s at sf1).
Instead the frame is hash-repartitioned on the entity, sorted WITHIN
partitions on (entity, ts, tiebreak), and scanned once per partition
with the (entity, y) carry crossing Arrow batch boundaries — group
changes are detected inline, so the per-group overhead is zero and
the sequential cost is the one multiply-add per row it should be.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def ewma(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    order_cols: Sequence[str] = (),
    alpha: float = 0.3,
    out_col: str = "ewma",
    round_dp: int = 6,
    exact: bool = True,
) -> DataFrame:
    """Exact adjust-free EWMA per entity, ordered by (ts, *order_cols)
    — pass a unique tiebreak column (an event id) to make the scan
    order, and therefore the output, engine-replicable. Emits the
    input columns plus ``out_col`` rounded to ``round_dp`` (the
    cross-engine comparison grid; the recurrence itself runs in raw
    float64 with the same multiply-add order a SQL recursive CTE
    uses, so a DuckDB oracle restates it exactly).

    ``exact=False`` routes each entity RUN through pandas'
    ``Series.ewm(adjust=False).mean()`` (a C loop) with the
    cross-batch carry prepended as the seed row. This is NOT
    bit-identical to the recurrence and therefore not oracle-exact —
    measured (round 10), pandas' kernel (a) normalizes by
    ``(1-a)+a``, which is != 1.0 in float64 for many alphas (a=0.9:
    1.1e-13 drift over 5k rows), and (b) SKIPS the update when the
    running value equals the input, so even "nice" alphas diverge on
    equal neighbors (a=0.3, x=[0.1, 0.1]: 0x1.9999999999999p-4 pure
    vs 0x1.999999999999ap-4 pandas). Ulps the 6dp grid usually
    absorbs, but half-grid flips are real (the r9 bitext lesson) —
    use the fast lane for monitoring/feature smoothing where ulp
    drift is irrelevant, never for certified comparisons; the
    divergence is pinned by a regression test so nobody silently
    promotes it (tests/test_ewma.py). The lane is adaptive: the
    per-run pandas construction only pays off on LONG runs (measured
    16x faster at 10k rows/run, 25x slower at 13 rows/run), so
    batches whose mean run length is under ~100 rows take the exact
    loop — `exact=False` is therefore never slower than the default,
    and only long-run batches trade ulps for the C kernel."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    a = float(alpha)
    # fresh StructType — StructType.add would MUTATE df's cached schema
    # object, growing a phantom output column on the input frame
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    out_cols = [f.name for f in out_schema.fields]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # carry crosses Arrow batch boundaries WITHIN a partition;
        # partitions hold whole entities (hash-partitioned on entity)
        last_e: object = object()  # matches no real entity
        last_y = 0.0
        for pdf in batches:
            e = pdf[entity_col].to_numpy()
            x = pdf[value_col].to_numpy(dtype=np.float64)
            y = np.empty_like(x)
            le, ly = last_e, last_y
            if exact:
                for i in range(len(x)):
                    xi = x[i]
                    if e[i] != le:
                        le = e[i]
                        ly = xi
                    else:
                        # same multiply-add order as the oracle's
                        # recursive CTE: two products, then one sum
                        ly = a * xi + (1.0 - a) * ly
                    y[i] = ly
            elif len(x):
                # fast lane: C loop per entity run, carry seeded by
                # prepending the previous value (y_0 = x_0 = carry).
                # Adaptive: the per-run pandas construction costs ~µs,
                # so short runs are SLOWER in the C lane (measured
                # single-thread per 1M rows: 10k-row runs 0.40 s pure
                # -> 0.025 s ewm; 13-row runs 0.33 s -> 8.1 s). Below
                # ~100 rows mean run length, take the loop per batch.
                starts = np.flatnonzero(
                    np.concatenate(([True], e[1:] != e[:-1]))
                )
                if len(x) < 100 * len(starts):
                    for i in range(len(x)):
                        xi = x[i]
                        if e[i] != le:
                            le = e[i]
                            ly = xi
                        else:
                            ly = a * xi + (1.0 - a) * ly
                        y[i] = ly
                    last_e, last_y = le, ly
                    pdf = pdf.copy()
                    pdf[out_col] = y
                    yield pdf[out_cols]
                    continue
                ends = np.append(starts[1:], len(x))
                for s, t in zip(starts, ends):
                    if e[s] == le:
                        seg = np.concatenate(([ly], x[s:t]))
                        y[s:t] = (
                            pd.Series(seg)
                            .ewm(alpha=a, adjust=False)
                            .mean()
                            .to_numpy()[1:]
                        )
                    else:
                        y[s:t] = (
                            pd.Series(x[s:t])
                            .ewm(alpha=a, adjust=False)
                            .mean()
                            .to_numpy()
                        )
                le, ly = e[-1], y[-1]
            last_e, last_y = le, ly
            pdf = pdf.copy()
            pdf[out_col] = y
            yield pdf[out_cols]

    ordered = df.repartition(F.col(entity_col)).sortWithinPartitions(
        entity_col, ts_col, *order_cols
    )
    out = ordered.mapInPandas(scan, schema=out_schema)
    return out.withColumn(out_col, F.round(F.col(out_col), round_dp))


def decayed_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    decay_per_sec: float = 3.2e-5,
    round_dp: int = 6,
) -> DataFrame:
    """Exponentially time-decayed event counts per key (round 12) —
    the recency-weighted heavy-hitters score (the exponential-decay
    model of Cormode et al. 2009, "Forward decay", public):

        score(key) = Σ_events exp(−λ · (T_ref − t_i))      [seconds]

    with ``T_ref`` = the corpus max event time, so "one event now"
    counts 1 and history fades with half-life ln(2)/λ (~6 h at the
    default). λ is declared as an exact decimal literal — the
    cross-engine contract: both engines parse the same double, exp
    underflow on ancient events hits IEEE 0.0 identically, and the
    ≤1-ulp-per-term sum noise sits ~7 orders below the 6dp output
    grid. One (key) hash aggregate after a one-row T_ref broadcast —
    corpus moves once. Returns (key, last_us, decayed) rounded.
    """
    tref = df.agg(F.max(F.unix_micros(F.col(ts_col))).alias("__tref"))
    us = F.unix_micros(F.col(ts_col))
    return (
        df.crossJoin(F.broadcast(tref))
        .groupBy(key_col)
        .agg(
            F.max(us).cast("bigint").alias("last_us"),
            F.round(
                F.sum(
                    F.exp(
                        -F.lit(float(decay_per_sec))
                        * ((F.col("__tref") - us).cast("double") / F.lit(1_000_000.0))
                    )
                ),
                round_dp,
            ).alias("decayed"),
        )
    )


def resample_interpolate(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    step_sec: int = 86400,
    round_dp: int = 6,
) -> DataFrame:
    """Resample irregular observations onto a regular grid with
    LINEAR interpolation (round 12) — the analytic complement of the
    last-value `gap_fill` (forward-fill answers "what was the state";
    interpolation answers "what was the trajectory"). Per entity, the
    grid is every ``step_sec`` tick inside [min(ts), max(ts)], and

        v(g) = v_prev + (v_next − v_prev) · (g − t_prev)/(t_next − t_prev)

    with (t_prev, v_prev) the latest observation ≤ g and
    (t_next, v_next) the earliest ≥ g — exact at observation ticks
    (the formula degenerates to v_prev), no extrapolation (the grid
    never leaves the observed span).

    Plan: one per-entity min/max agg explodes to the grid (span/step
    rows per entity — the caller's knob), then the union+two-window
    trick (the as-of join shape, `joins.asof_nearest`): ONE shuffle
    on the entity key, a forward pass carrying the last observation
    struct and a reverse pass carrying the next; same-tick ties put
    observations before grid points in BOTH passes so an on-grid
    observation is its own neighbor. Returns
    (entity, grid_us, value) rounded."""
    e, t, v = F.col(entity_col), F.unix_micros(F.col(ts_col)), F.col(value_col)
    step_us = int(step_sec) * 1_000_000
    obs = df.select(
        e.alias("__e"), t.alias("__t"), v.cast("double").alias("__v"),
        F.lit(1).alias("__is_obs"),
    )
    span = obs.groupBy("__e").agg(
        F.min("__t").alias("__lo"), F.max("__t").alias("__hi")
    )
    grid = span.select(
        "__e",
        F.explode(
            F.sequence(
                (F.ceil(F.col("__lo") / step_us) * step_us).cast("bigint"),
                F.col("__hi"),
                F.lit(step_us),
            )
        ).alias("__t"),
        F.lit(None).cast("double").alias("__v"),
        F.lit(0).alias("__is_obs"),
    )
    u = obs.unionByName(grid)
    fwd = (
        W.partitionBy("__e")
        .orderBy(F.asc("__t"), F.desc("__is_obs"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    rev = (
        W.partitionBy("__e")
        .orderBy(F.desc("__t"), F.desc("__is_obs"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_s = F.last(
        F.when(F.col("__is_obs") == 1, F.struct(F.col("__t").alias("t"), F.col("__v").alias("v"))),
        ignorenulls=True,
    ).over(fwd)
    next_s = F.last(
        F.when(F.col("__is_obs") == 1, F.struct(F.col("__t").alias("t"), F.col("__v").alias("v"))),
        ignorenulls=True,
    ).over(rev)
    g = u.withColumn("__p", prev_s).withColumn("__n", next_s).filter(
        F.col("__is_obs") == 0
    )
    pt, pv = F.col("__p.t"), F.col("__p.v")
    nt, nv = F.col("__n.t"), F.col("__n.v")
    interp = F.when(nt == pt, pv).otherwise(
        pv + (nv - pv) * (F.col("__t") - pt).cast("double") / (nt - pt).cast("double")
    )
    return g.select(
        F.col("__e").alias(entity_col),
        F.col("__t").alias("grid_us"),
        F.round(interp, round_dp).alias("value"),
    )


def time_weighted_avg(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Time-weighted average over an irregular series (round 12) —
    the TimescaleDB/InfluxDB aggregate a plain AVG gets WRONG on
    unevenly-sampled sensors (a value that held for an hour must
    weigh 60× one that held a minute). Last-observation-carried-
    forward convention:

        twa = Σ value_i · (t_{i+1} − t_i) / (t_n − t_0)

    — each observation weighs by how long it REMAINED current; the
    final observation spans zero time (nothing is known after it).
    Entities with one observation (span 0) return that value (limit
    convention, stated; NULL would lose the entity).

    Scale shape: ONE shuffle on the entity key carries the lead()
    window and the aggregate; integer-µs weights, one double
    multiply per row, 6dp grid on the quotient. Returns
    (entity, n_obs, span_us, twa)."""
    from pyspark.sql import Window as W

    rows = df.select(
        F.col(entity_col),
        F.unix_micros(F.col(ts_col)).alias("__t"),
        F.col(value_col).alias("__v"),
    ).withColumn(
        "__dt",
        F.lead("__t").over(W.partitionBy(entity_col).orderBy("__t"))
        - F.col("__t"),
    )
    agg = rows.groupBy(entity_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        (F.max("__t") - F.min("__t")).cast("bigint").alias("span_us"),
        F.sum(F.col("__v") * F.col("__dt")).alias("__wsum"),
        F.max_by("__v", "__t").alias("__last"),
    )
    return agg.select(
        entity_col,
        "n_obs",
        "span_us",
        F.round(
            F.when(F.col("span_us") > 0, F.col("__wsum") / F.col("span_us"))
            .otherwise(F.col("__last")),
            round_dp,
        ).alias("twa"),
    )


def ohlc_bars(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    bar_hours: int = 24,
) -> DataFrame:
    """OHLC downsampling (round 12) — the candlestick aggregate: per
    (entity, fixed time bar), the first/last/min/max of the value with
    first/last resolved BY TIME via ``min_by``/``max_by`` (one hash
    aggregate — no window, no self-join; the classic pre-min_by
    formulations needed two passes). Bars are epoch-floored integer
    hours (tz-free). Tie discipline: equal timestamps within a bar
    resolve min_by/max_by nondeterministically in a distributed scan —
    callers needing total determinism pass a series with unique
    (entity, ts) pairs (the driver events table qualifies: event ids
    break ties upstream). Returns (entity, bar_start_us, n_obs, open,
    high, low, close)."""
    bar_us = int(bar_hours) * 3_600_000_000
    t = F.unix_micros(F.col(ts_col))
    # integer modulo, not floor(t/bar): double division at epoch-µs
    # magnitudes is boundary-exact only by accident of rounding
    rows = df.select(
        F.col(entity_col),
        (t - (t % bar_us)).cast("bigint").alias("bar_start_us"),
        t.alias("__t"),
        F.col(value_col).alias("__v"),
    )
    return rows.groupBy(entity_col, "bar_start_us").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.min_by("__v", "__t").alias("open"),
        F.max("__v").alias("high"),
        F.min("__v").alias("low"),
        F.max_by("__v", "__t").alias("close"),
    )


def cusum(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    order_cols: Sequence[str] = (),
    target: float = 50.0,
    slack: float = 25.0,
    threshold: float = 150.0,
    round_dp: int = 6,
) -> DataFrame:
    """Two-sided tabular CUSUM changepoint detector per entity (Page
    1954, 'Continuous inspection schemes', public; the §2.6 [EXT]
    sequential-detection complement to the Shewhart x̄ chart in
    `dq.control_chart` — CUSUM accumulates small persistent shifts a
    per-point 3σ fence never sees):

        s⁺_i = max(0, s⁺_{i-1} + (x_i − (target + slack)))
        s⁻_i = max(0, s⁻_{i-1} + ((target − slack) − x_i))

    with an alarm whenever either statistic crosses ``threshold``,
    after which THAT side resets to 0 (the standard restart
    discipline — each alarm opens a fresh detection cycle).

    Scale shape: identical to `ewma` — ONE shuffle onto the entity
    key, rows sorted within partitions on (entity, ts, *order_cols),
    one sequential Arrow scan with two carried doubles per entity;
    entities parallelize freely, no window frame, no driver state.
    The reference value is a CONSTANT (the known-target form of the
    chart), not an in-plan mean: a distributed float mean is
    summation-order-dependent, which would make the recurrence
    engine-divergent — callers wanting a data-derived target compute
    it upstream on an exact grid and pass it in.

    Determinism: the update is one subtract + one add + one max per
    side in a fixed order, so a SQL recursive CTE stepping
    ``greatest(0, s + (x − C))`` reproduces every state bit-for-bit;
    outputs are rounded to ``round_dp`` (the engine's cross-engine
    comparison grid). Emits the input columns plus (cusum_hi,
    cusum_lo, alarm_hi, alarm_lo); the emitted statistics are the
    PRE-RESET values, so alarm rows show the crossing magnitude.
    """
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StructField,
        StructType,
    )

    c_hi = float(target) + float(slack)
    c_lo = float(target) - float(slack)
    h = float(threshold)
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("cusum_hi", DoubleType()),
            StructField("cusum_lo", DoubleType()),
            StructField("alarm_hi", BooleanType()),
            StructField("alarm_lo", BooleanType()),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # carries cross Arrow batch boundaries within a partition;
        # partitions hold whole entities (hash-partitioned on entity)
        last_e: object = object()
        s_hi = 0.0
        s_lo = 0.0
        for pdf in batches:
            e = pdf[entity_col].to_numpy()
            x = pdf[value_col].to_numpy(dtype=np.float64)
            n = len(x)
            hi = np.empty(n)
            lo = np.empty(n)
            a_hi = np.empty(n, dtype=bool)
            a_lo = np.empty(n, dtype=bool)
            le, shi, slo = last_e, s_hi, s_lo
            for i in range(n):
                if e[i] != le:
                    le = e[i]
                    shi = 0.0
                    slo = 0.0
                xi = x[i]
                # same op order as the oracle CTE: inner difference
                # first, then the accumulate, then the clamp
                shi = max(0.0, shi + (xi - c_hi))
                slo = max(0.0, slo + (c_lo - xi))
                hi[i] = shi
                lo[i] = slo
                ah = shi > h
                al = slo > h
                a_hi[i] = ah
                a_lo[i] = al
                if ah:
                    shi = 0.0
                if al:
                    slo = 0.0
            last_e, s_hi, s_lo = le, shi, slo
            pdf = pdf.copy()
            pdf["cusum_hi"] = hi
            pdf["cusum_lo"] = lo
            pdf["alarm_hi"] = a_hi
            pdf["alarm_lo"] = a_lo
            yield pdf[out_cols]

    ordered = df.repartition(F.col(entity_col)).sortWithinPartitions(
        entity_col, ts_col, *order_cols
    )
    out = ordered.mapInPandas(scan, schema=out_schema)
    return out.withColumn("cusum_hi", F.round("cusum_hi", round_dp)).withColumn(
        "cusum_lo", F.round("cusum_lo", round_dp)
    )


def holt(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    order_cols: Sequence[str] = (),
    alpha: float = 0.4,
    beta: float = 0.2,
    round_dp: int = 6,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per entity
    (Holt 1957, public) — the next rung above `ewma` for drifting
    series: a LEVEL and a TREND carried together, so the one-step
    forecast l+b tracks a ramp that a single EWMA lags forever,

        l_1 = x_1,  b_1 = 0,  ŷ_1 = x_1
        ŷ_i = l_{i-1} + b_{i-1}
        l_i = α·x_i + (1−α)·(l_{i-1} + b_{i-1})
        b_i = β·(l_i − l_{i-1}) + (1−β)·b_{i-1}

    Same recurrence discipline as `ewma`/`cusum`: no window frame or
    prefix sum states this exactly in fixed precision, so the honest
    distributed shape is ONE shuffle onto the entity key + a
    sequential Arrow scan (carried state: two doubles per entity;
    entities parallelize freely). The b_i update re-derives l_i from
    the same expression the oracle's recursive CTE spells out, so
    every level/trend/forecast compares exactly on the ``round_dp``
    grid. Emits input columns + (level, trend, forecast)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    a = float(alpha)
    bt = float(beta)
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("forecast", DoubleType()),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_e: object = object()
        lv = 0.0
        tr = 0.0
        for pdf in batches:
            e = pdf[entity_col].to_numpy()
            x = pdf[value_col].to_numpy(dtype=np.float64)
            n = len(x)
            levels = np.empty(n)
            trends = np.empty(n)
            fcasts = np.empty(n)
            le, l_c, b_c = last_e, lv, tr
            for i in range(n):
                xi = x[i]
                if e[i] != le:
                    le = e[i]
                    l_c = xi
                    b_c = 0.0
                    f_c = xi
                else:
                    # same op order as the oracle CTE: the (l+b) sum
                    # first, then the two convex blends
                    f_c = l_c + b_c
                    l_new = a * xi + (1.0 - a) * f_c
                    b_c = bt * (l_new - l_c) + (1.0 - bt) * b_c
                    l_c = l_new
                levels[i] = l_c
                trends[i] = b_c
                fcasts[i] = f_c
            last_e, lv, tr = le, l_c, b_c
            pdf = pdf.copy()
            pdf["level"] = levels
            pdf["trend"] = trends
            pdf["forecast"] = fcasts
            yield pdf[out_cols]

    ordered = df.repartition(F.col(entity_col)).sortWithinPartitions(
        entity_col, ts_col, *order_cols
    )
    out = ordered.mapInPandas(scan, schema=out_schema)
    for c in ("level", "trend", "forecast"):
        out = out.withColumn(c, F.round(F.col(c), round_dp))
    return out
