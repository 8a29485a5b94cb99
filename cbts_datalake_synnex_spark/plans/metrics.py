"""Per-query execution metrics — the observability role of the
reference's CloudWatch alarm block (`serverless.yml:133-139/315`:
error/duration/throttle alarms on every function) re-expressed over
Spark's own SQLMetrics.

After an action, every physical operator carries its executed metric
values (the numbers the Spark UI's SQL tab shows): scan output rows,
file bytes behind the scan, shuffle bytes written, spill bytes, peak
memory. `executed_plan_metrics` walks the EXECUTED plan via the
driver-side JVM handle (public SparkPlan/SQLMetric API through py4j —
no listener jar, works headless with the UI disabled) and folds them
into one flat dict; `run_with_metrics` is the harness that executes a
query and captures (metrics, row count, wall time); `alarm_report`
applies alarm rules over the captured metrics frame — the
scan-amplification ("paid a full scan for a tiny result"), empty-
result, and spill alarms a lakehouse deployment pages on.

Determinism note (the oracle contract): scan_rows and output_rows are
exact data properties (rows emitted by the scans / rows returned), so
the registry query restates them and the alarm arithmetic in SQL;
bytes/spill/duration are environment-dependent and are certified by
pytest bounds instead (tests/test_query_metrics.py).
"""

from __future__ import annotations

import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _walk(jplan):
    """Yield every executed physical node, descending through the
    adaptive wrapper and materialized query stages."""
    cls = jplan.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _walk(jplan.executedPlan())
        return
    if cls.endswith("QueryStageExec"):
        yield jplan  # stage nodes carry shuffle/broadcast metrics
        yield from _walk(jplan.plan())
        return
    yield jplan
    kids = jplan.children()
    for i in range(kids.size()):
        yield from _walk(kids.apply(i))


def _node_metrics(jnode) -> dict[str, int]:
    out: dict[str, int] = {}
    it = jnode.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        try:
            out[kv._1()] = int(kv._2().value())
        except Exception:  # uninitialized metric — treat as absent
            pass
    return out


def executed_plan_metrics(df: DataFrame) -> dict[str, int]:
    """Fold the executed plan's SQLMetrics into one flat dict. Call
    AFTER an action on ``df`` (before one, metrics are zero). Keys:

    - ``scan_rows``: Σ numOutputRows over scan nodes (rows the file
      scans emitted, post row-group skipping)
    - ``files_size``: Σ filesSize over scans (bytes behind the scan
      after partition pruning — the IO upper bound)
    - ``n_files``: Σ numFiles over scans
    - ``shuffle_bytes``: Σ shuffle bytes written across exchanges
    - ``shuffle_records``: Σ shuffle records written
    - ``spill_bytes``: Σ spillSize across sorts/aggs/joins
    - ``peak_memory``: max operator peakMemory
    """
    agg = {
        "scan_rows": 0, "files_size": 0, "n_files": 0,
        "shuffle_bytes": 0, "shuffle_records": 0,
        "spill_bytes": 0, "peak_memory": 0,
    }
    for node in _walk(df._jdf.queryExecution().executedPlan()):
        name = node.nodeName()
        m = _node_metrics(node)
        if "Scan" in name:
            agg["scan_rows"] += m.get("numOutputRows", 0)
            agg["files_size"] += m.get("filesSize", 0)
            agg["n_files"] += m.get("numFiles", 0)
        agg["shuffle_bytes"] += m.get("shuffleBytesWritten", 0)
        agg["shuffle_records"] += m.get("shuffleRecordsWritten", 0)
        agg["spill_bytes"] += m.get("spillSize", 0)
        agg["peak_memory"] = max(agg["peak_memory"], m.get("peakMemory", 0))
    return agg


def run_with_metrics(name: str, df: DataFrame) -> dict:
    """Execute ``df`` (collect) and capture its metrics row:
    {query_name, output_rows, duration_ms, **executed_plan_metrics}."""
    t0 = time.monotonic()
    rows = df.collect()
    dur_ms = int((time.monotonic() - t0) * 1000)
    m = executed_plan_metrics(df)
    return {
        "query_name": name,
        "output_rows": len(rows),
        "duration_ms": dur_ms,
        **m,
    }


_METRICS_SCHEMA = (
    "query_name string, output_rows bigint, duration_ms bigint, "
    "scan_rows bigint, files_size bigint, n_files bigint, "
    "shuffle_bytes bigint, shuffle_records bigint, spill_bytes bigint, "
    "peak_memory bigint"
)


def metrics_table(spark: SparkSession, runs: Sequence[dict]) -> DataFrame:
    cols = [c.split()[0] for c in _METRICS_SCHEMA.split(", ")]
    return spark.createDataFrame(
        [tuple(r[c] for c in cols) for r in runs], _METRICS_SCHEMA
    )


def alarm_report(
    metrics: DataFrame,
    full_scan_factor: int = 1000,
    spill_bytes_max: int = 0,
) -> DataFrame:
    """The alarm-rule block over a captured metrics frame
    (CloudWatch-alarm parity): scan amplification (a scan of
    ``full_scan_factor``× the result size — the "full scan for a
    point lookup" page), empty result, and spill-over-budget. Returns
    one row per query with the rule verdicts."""
    amp = F.when(
        F.col("output_rows") > 0,
        F.round(F.col("scan_rows") / F.col("output_rows"), 6),
    )
    return metrics.select(
        "query_name",
        "scan_rows",
        "output_rows",
        amp.alias("scan_amplification"),
        (F.col("scan_rows") >= F.lit(int(full_scan_factor)) * F.col("output_rows"))
        .alias("alarm_full_scan"),
        (F.col("output_rows") == 0).alias("alarm_empty"),
        (F.col("spill_bytes") > F.lit(int(spill_bytes_max))).alias("alarm_spill"),
    )
