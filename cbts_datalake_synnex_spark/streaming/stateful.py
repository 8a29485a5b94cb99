"""T5+ — custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.8/§2.9: the grouped-map-with-state rung of the UDF ladder).

The reference has no per-key streaming state (its incremental pipeline is
stateless batch append — ``serverless.yml:147-219``); this is the [EXT]
operator a training-data pipeline needs for running per-key accounting
(documents seen per source, bytes ingested per shard, rolling quality
counters) where the built-in windowed aggregates can't express
"cumulative since stream start, emitted every batch".

Scale notes: state lives in the state store, partitioned by the grouping
key — shuffle is on ``key`` only, and each micro-batch touches only keys
present in that batch. An optional processing-time TTL evicts idle keys
so state doesn't grow with the all-time key cardinality (the difference
between "bounded by active keys" and "unbounded" at 100 TB).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def running_stats(
    df: DataFrame,
    key: str,
    value_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Cumulative per-key count/sum/max, re-emitted on every micro-batch
    that touches the key. State = three scalars per key.

    ``ttl_ms`` sets a processing-time timeout: keys idle longer than the
    TTL have their state evicted (and emit a final tombstone row with
    the frozen totals). ``None`` keeps state forever — only safe when
    key cardinality is bounded.

    Works only on streaming DataFrames (batch twin: a plain groupBy
    agg gives the same totals in one shot).
    """
    key_field = df.schema[key]
    out_schema = StructType(
        [
            key_field,
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
            StructField("max_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("vmax", DoubleType()),
        ]
    )

    def update(
        key_tuple: Tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total, vmax = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [vmax],
                }
            )
            return
        if state.exists:
            n, total, vmax = state.get
        else:
            n, total, vmax = 0, 0.0, None
        for pdf in batches:
            vals = pdf[value_col].dropna()
            n += int(len(pdf))
            if len(vals):
                total += float(vals.sum())
                batch_max = float(vals.max())
                vmax = batch_max if vmax is None else max(vmax, batch_max)
        state.update((n, total, vmax))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                key: [key_tuple[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [vmax],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )
