"""T1/T2 — incremental staging→curated as a Structured Streaming job.

Reference shape (SURVEY §3.3): Step Functions triggers the Glue job on
a schedule; ``transformation_ctx`` bookmarks (disabled in the reference,
``serverless.yml:397``) would otherwise track which staging objects were
already consumed. Here the file-source + checkpoint pair does both jobs
natively: the checkpoint log (T2) records consumed files exactly-once,
and ``foreachBatch`` reuses the SAME batch writer (``write_curated``)
the batch path uses, so batch and streaming stay semantically identical.

Scale: the staging listing is incremental (only new files are read per
micro-batch); ``maxFilesPerTrigger`` bounds per-batch work the way the
reference's Map-state ``MaxConcurrency: 5`` bounded fan-out. At 100 TB
the curated append is partitioned on the audit columns, so each
micro-batch touches only its own partitions.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from cbts_datalake_synnex_spark.functions.ingest_policy import apply_ingest_policy


def incremental_curate(
    engine,
    table: str,
    checkpoint_dir: str,
    schema: Optional[StructType] = None,
    max_files_per_trigger: Optional[int] = None,
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
    available_now: bool = True,
    refresh_views: Optional[list[str]] = None,
):
    """Stream the staging zone of ``table`` into its curated table.

    ``available_now=True`` processes everything currently staged and
    stops — the scheduled-batch semantics of the reference's state
    machine (``serverless.yml:147-219``); ``False`` leaves a continuous
    micro-batch query running. Returns the StreamingQuery.

    The JSON file source requires an explicit schema (streaming cannot
    infer); when not provided we infer once from the current staging
    contents — the same "sample then lock" discipline Glue's
    DynamicFrame applied per job run.
    """
    staging = engine.zones.staging(table)
    if schema is None:
        # Infer with the same DROPMALFORMED discipline as batch curate():
        # a poisoned staging line must neither add _corrupt_record to the
        # locked schema nor null-out rows in the curated table.
        schema = (
            engine.spark.read.option("recursiveFileLookup", "true")
            .option("compression", "gzip")
            .option("mode", "DROPMALFORMED")
            .json(staging)
            .schema
        )
    reader = (
        engine.spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("compression", "gzip")
        .option("mode", "DROPMALFORMED")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(staging)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        df = apply_ingest_policy(batch_df, stringify=False)
        if transform is not None:
            df = transform(df)
        if df.limit(1).count() == 0:
            return  # empty-input short-circuit, staging_to_curated.py:97-101
        engine.write_curated(table, df, mode="append")
        # Dependent materialized views stay one micro-batch behind at
        # most. Plain mviews recompute fully per batch; views created
        # with engine.create_incremental_view merge only this batch's
        # appended files into their stored aggregate state.
        for mv in refresh_views or []:
            engine.refresh_materialized_view(mv)

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(checkpoint_dir, table))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_apply_changes(
    engine,
    table: str,
    source_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    op_col: str = "op",
    sequence_col: Optional[str] = None,
    schema: Optional[StructType] = None,
    max_files_per_trigger: Optional[int] = None,
    available_now: bool = True,
    partition_cols: Optional[list[str]] = None,
):
    """CDC stream → MERGE sink: stream a directory of change-record
    JSON files (ops D/U/I + optional sequence numbers) and apply each
    micro-batch to the curated table via ``engine.apply_changes`` —
    the streaming form of Delta's ``foreachBatch`` upsert pattern.

    Exactly-once story: the checkpoint log records consumed files, and
    the sink itself is idempotent under replay — a re-applied batch
    upserts the same values and re-deletes already-absent keys (both
    no-ops), so a crash between merge and checkpoint commit cannot
    corrupt the table. Within a batch ``sequence_col`` makes the
    latest change per key win; ACROSS batches later micro-batches
    win by arrival order (the file source lists in order). The first
    micro-batch bootstraps the table if absent.

    Scale: per micro-batch cost is the merge's — the batch's key set
    broadcast against the target, matched files only rewritten. A
    100 TB table consuming a trickle CDC feed rewrites a handful of
    files per trigger, not partitions.
    """
    if schema is None:
        schema = (
            engine.spark.read.option("recursiveFileLookup", "true")
            .option("mode", "DROPMALFORMED")
            .json(source_dir)
            .schema
        )
    reader = (
        engine.spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("mode", "DROPMALFORMED")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(source_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.limit(1).count() == 0:
            return
        engine.apply_changes(
            table,
            batch_df,
            keys=keys,
            op_col=op_col,
            sequence_col=sequence_col,
            partition_cols=partition_cols,
        )

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(checkpoint_dir, table))
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
