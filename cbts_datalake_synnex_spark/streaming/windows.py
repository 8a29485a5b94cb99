"""T4/T5 — event-time windowed aggregation, session windows, and
stateful streaming dedup (SURVEY §2.8).

Not present in the reference (its pipeline is wall-clock scheduled, not
event-time aware) — mandated as [EXT] so the ``events`` table is
first-class. Semantics are Spark's own watermark model: a window closes
(and late rows are dropped) once the watermark — max observed event
time minus the delay — passes its end.

All four builders work on BOTH batch and streaming DataFrames:
``withWatermark`` is a no-op in batch mode, so the batch twin of every
streaming query is the same code — that is what the golden tests pin.

Scale: windowed aggregation shuffles on (window, keys); state in the
streaming case is bounded by the watermark horizon. Session windows use
Spark's native ``session_window`` (state merges on overlap), and dedup
state is similarly watermark-evicted — without a watermark, streaming
dedup state grows unboundedly, which is why ``streaming_dedup``
requires one.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _windowed(
    df: DataFrame,
    ts_col: str,
    watermark: Optional[str],
    window_col: Column,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    # session_window() names its struct `session_window`, window() names
    # it `window` — normalize via the first grouping column's position.
    out = df.groupBy(window_col, *[F.col(k) for k in keys]).agg(*aggs)
    wname = out.columns[0]
    return out.select(
        F.col(f"{wname}.start").alias("window_start"),
        F.col(f"{wname}.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c not in (wname, *keys)],
    )


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    watermark: Optional[str] = None,
) -> DataFrame:
    """T4 — non-overlapping fixed windows: one output row per
    (window, keys). ``aggs`` are ordinary aliased aggregate columns."""
    return _windowed(df, ts_col, watermark, F.window(ts_col, duration), keys, aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    watermark: Optional[str] = None,
) -> DataFrame:
    """T4 — overlapping windows (each row lands in duration/slide
    windows); Spark expands rows before the hash-agg, so the shuffle
    volume scales with the overlap factor — keep slide ≥ duration/4 at
    100 TB."""
    return _windowed(df, ts_col, watermark, F.window(ts_col, duration, slide), keys, aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    watermark: Optional[str] = None,
) -> DataFrame:
    """T4 — dynamic-length sessions: a session closes after ``gap`` of
    inactivity per key. The batch analogue (lag-gap-cumsum) lives in the
    workload as ``t_sessionize``; this is the native operator — state
    merges adjacent windows, watermark evicts closed sessions."""
    return _windowed(df, ts_col, watermark, F.session_window(ts_col, gap), keys, aggs)


def streaming_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    watermark: str,
    within_watermark: bool = True,
) -> DataFrame:
    """T5 — stateful dedup on ``keys``: first arrival wins, duplicate
    arrivals inside the watermark horizon are dropped, state is evicted
    once the watermark passes.

    ``within_watermark=True`` uses ``dropDuplicatesWithinWatermark``
    (Spark ≥3.5): keys recur after the horizon — the right semantics
    for at-least-once sources where duplicates cluster in time.
    ``False`` = classic ``dropDuplicates([keys, ts])`` keyed state.
    """
    df = df.withWatermark(ts_col, watermark)
    cols = list(keys)
    if within_watermark:
        try:
            return df.dropDuplicatesWithinWatermark(cols)
        except AttributeError:  # pre-3.5 fallback
            pass
    return df.dropDuplicates(cols + [ts_col])
