"""Streaming-side observability — the StreamingQuery progress surface
as queryable DataFrames (round 13): the streaming half of the
CloudWatch-alarm role that `plans/metrics.py` covers for batch
queries. A production stream is watched through exactly these numbers
(the Structured Streaming UI reads the same JSON): per-batch input
rows, processing rate, state-store row counts, watermark progression.

`progress_records` flattens ``query.recentProgress`` (a plain list of
per-microbatch dicts — public API, no listener registration needed;
for long-running queries a StreamingQueryListener would append the
same dicts to a sink instead of relying on the bounded recentProgress
ring) and `streaming_alarm_report` applies the standing alarm rules: a
zero-input batch burst (source stalled), monotone state growth with no
evictions (watermark stuck / state leak), and batch-duration watch.

Determinism note (the oracle contract): with a file source at
``maxFilesPerTrigger=1`` over pre-staged files, per-batch input rows
and the state-operator row totals are exact data properties and a SQL
oracle restates them; durations/rates are environment-dependent and
stay out of the certified columns (pytest-bounded instead).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PROGRESS_SCHEMA = (
    "batch_seq bigint, num_input_rows bigint, state_rows_total bigint, "
    "state_rows_updated bigint, batch_duration_ms bigint"
)


def progress_records(progresses: Sequence[dict]) -> list[dict]:
    """Flatten raw progress dicts (``query.recentProgress``) to rows.
    Batches with zero input are DROPPED (availableNow commit/no-data
    ticks — not work); ``batch_seq`` renumbers the surviving batches
    in arrival order so replays compare run-to-run."""
    out: list[dict] = []
    for p in progresses:
        n = int(p.get("numInputRows") or 0)
        if n == 0:
            continue
        ops = p.get("stateOperators") or []
        out.append(
            {
                "batch_seq": len(out),
                "num_input_rows": n,
                "state_rows_total": int(
                    sum(int(o.get("numRowsTotal") or 0) for o in ops)
                ),
                "state_rows_updated": int(
                    sum(int(o.get("numRowsUpdated") or 0) for o in ops)
                ),
                "batch_duration_ms": int(
                    (p.get("durationMs") or {}).get("triggerExecution") or 0
                ),
            }
        )
    return out


def progress_table(spark: SparkSession, progresses: Sequence[dict]) -> DataFrame:
    rows = progress_records(progresses)
    cols = [c.split()[0] for c in _PROGRESS_SCHEMA.split(", ")]
    return spark.createDataFrame(
        [tuple(r[c] for c in cols) for r in rows], _PROGRESS_SCHEMA
    )


def streaming_alarm_report(
    progress: DataFrame,
    batch_duration_max_ms: int = 600_000,
) -> DataFrame:
    """Alarm rules over a progress frame: per batch, flag zero input
    (source stall — pre-filtered frames never flag it, the rule is for
    listener-fed tables that keep empty ticks), state growth without
    updates (every state row was new: watermark never evicted — the
    state-leak smell when it persists across many batches), and
    duration over budget."""
    return progress.select(
        "batch_seq",
        "num_input_rows",
        "state_rows_total",
        (F.col("num_input_rows") == 0).alias("alarm_zero_input"),
        (
            (F.col("state_rows_total") > 0)
            & (F.col("state_rows_updated") >= F.col("state_rows_total"))
        ).alias("state_all_fresh"),
        (F.col("batch_duration_ms") > F.lit(int(batch_duration_max_ms))).alias(
            "alarm_slow_batch"
        ),
    )
