"""Shared operator-level helpers (no Spark session state)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_narrow_input(df: DataFrame) -> DataFrame:
    """Repartition a NARROW input up to default parallelism before a
    CPU-bound projection (tokenize/shingle/explode ladders). An input
    read from a handful of files (one small parquet, a few big gz) pins
    the projection to that many cores; a well-partitioned 100 TB scan
    is already wider than the threshold and never pays this shuffle.

    Single home for the threshold policy (ADVICE r13: the same guard
    was re-implemented inline in sampling.poisson_bootstrap)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target) if df.rdd.getNumPartitions() < target // 2 else df


def sweep_pinned_rdds(spark) -> None:
    """Unpersist every persistent RDD in the session — the caller-side
    reclaim for operators that pin intermediates with localCheckpoint
    (whose blocks outlive the returned DataFrame; ADVICE r13). Safe to
    call between logically independent operator invocations; never
    call while a returned, still-to-be-consumed frame depends on a
    checkpoint (a truncated lineage cannot recompute)."""
    spark.catalog.clearCache()
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in [int(k) for k in jmap.keySet().toArray()]:
            jmap.get(rid).unpersist()
    except Exception:  # noqa: BLE001 — sweeping must never fail the caller
        pass
