"""Watermarked stream-stream join (SURVEY §2.8 [EXT]) — correlating two
live feeds by key within an event-time band.

The reference correlates its two feeds (PO numbers ↔ PO status) only in
batch, via the catalog view (`src/purchase_orders.py:22`); a streaming
engine needs the same correlation while both sides are still arriving —
e.g. pairing `events` impressions with their conversions, or raw-zone
arrivals with staging acks.

Scale notes: Spark buffers both sides in the state store, keyed by the
join key; the watermark + the time-band condition bound how long a row
waits for a match, so state is O(rows inside the band), not O(stream).
Without the band the state grows forever — this wrapper therefore makes
the band mandatory. Shuffle is one hash exchange per side on the key
(the same plan as a batch equi-join, plus state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    band: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streaming DataFrames on ``key`` where the right event
    lands within ``[left_ts, left_ts + band]`` (e.g. a click following
    an impression). ``watermark`` bounds lateness on BOTH sides and,
    with the band, lets Spark evict matched/expired state.

    Column names must be disjoint apart from ``key`` (standard Spark
    stream-join requirement); the right key/timestamp are suffixed on
    output. Outer joins emit the unmatched side only after the
    watermark passes (semantics are Spark's own; golden-tested).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(key, f"{key}_r")
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {band}"))
    )
    return lw.join(rw, cond, how)
