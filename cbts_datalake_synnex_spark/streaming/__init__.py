"""Structured Streaming surface (SURVEY §2.8 T1-T5).

The reference's "streaming" is a Step-Functions-scheduled micro-batch
pipeline (``serverless.yml:147-219``) with Glue bookmarks naming
incremental progress (``src/glue/staging_to_curated.py:94,111``).
Structured Streaming is the idiomatic Spark equivalent: a file source
over the staging zone, ``foreachBatch`` into the curated writer, and a
checkpoint directory playing exactly the bookmark role. T4/T5
(event-time windows, watermarks, streaming dedup) are the [EXT]
extensions that make the ``events`` table first-class.
"""

from cbts_datalake_synnex_spark.streaming.incremental import (
    incremental_apply_changes,
    incremental_curate,
)
from cbts_datalake_synnex_spark.streaming.joins import stream_stream_join
from cbts_datalake_synnex_spark.streaming.stateful import (
    first_seen_admission,
    first_seen_admission_v1,
    running_stats,
)
from cbts_datalake_synnex_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
)

__all__ = [
    "incremental_curate",
    "incremental_apply_changes",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "streaming_dedup",
    "first_seen_admission",
    "first_seen_admission_v1",
    "running_stats",
    "stream_stream_join",
]
