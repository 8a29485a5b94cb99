"""SparkSession construction tuned for the lake engine.

The reference delegates execution to two managed runtimes — a Glue 3.0
cluster (10 × G.1X workers, auto-scaling; ``serverless.yml:387,396,
413-414``) and Athena's Presto fleet (``serverless.yml:417-428``).
This module is the single place our engine encodes the equivalent
runtime posture:

* AQE on (runtime coalesce / skew-join / DPP) — replaces Glue's
  auto-scaling + the reference's 100 MB small-file grouping heuristic
  (``src/glue/staging_to_curated.py:90-92``).
* ``spark.sql.files.maxPartitionBytes=128m`` — the built-in bin-packing
  that subsumes Glue's ``groupSize: 104857600``.
* Arrow on for every pandas boundary.
* Session timezone pinned to UTC so results are reproducible across
  hosts and comparable to external oracles (DuckDB timestamps are
  UTC-naive).

At 100 TB the same settings hold; only ``spark.sql.shuffle.partitions``
moves with the cluster (rule of thumb: 2-3× total executor cores, or
leave AQE's coalescing to trim an intentionally-high value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session the engine touches —
# safe after JVM launch (unlike memory/master), so we can also apply
# them to a driver-provided session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dims in this workload (region/nation/supplier/part) are far below
    # this; keep the default 10 MB threshold but make it explicit.
    "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
    # The events testdata stores TIMESTAMP(NANOS), which Spark's reader
    # rejects outright; read it as raw int64 nanos and convert to a µs
    # timestamp in the loader (matches DuckDB's ns→µs truncation).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Cost-based optimization: consume the size/NDV statistics that
    # `engine.analyze_table` records (join reordering + better
    # broadcast decisions). No-op on stat-less path-based reads, so
    # the oracle workload's plans are unaffected.
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # Runtime semi-join reduction: build a bloom filter from the
    # filtered (selective) side of a shuffle join and push it into the
    # probe side's scan. At 100 TB this skips most fact rows BEFORE the
    # shuffle when one side carries a selective predicate — the runtime
    # twin of static partition pruning. Size thresholds stay at Spark's
    # defaults (creation side ≤ 10 MB post-filter, probe ≥ 10 GB), so
    # it self-arms only where it pays; tests/test_plans.py pins the
    # injection with scaled-down thresholds.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "cbts_datalake_synnex_spark") -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    local[$SPARK_GRAFT_CPUS] with shuffle partitions ≈ cores: the
    200-partition default over-parallelizes local data and
    under-parallelizes a real cluster — both are wrong, so we set it
    explicitly and let AQE coalesce from there.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", os.path.join(os.getcwd(), ".spark-warehouse"))
        # FAIR scheduling across concurrent jobs: `engine.run_concurrent`
        # tags each job's thread with its own pool (local property), so
        # parallel curates share executors fairly instead of head-of-line
        # blocking behind one big FIFO job — the Glue
        # MaxConcurrentRuns:10 deployment posture (serverless.yml:411).
        # Static conf (read at SparkContext start); on a driver-provided
        # session without it, run_concurrent still bounds concurrency
        # and the pool tags are inert.
        .config("spark.scheduler.mode", "FAIR")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine confs to an externally-created
    session (e.g. the correctness driver's). Idempotent."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be marked static in exotic deployments;
            # results stay correct, only tuning is lost.
            pass
    return spark
