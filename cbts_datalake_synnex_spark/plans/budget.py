"""Scan-budget guardrail (SURVEY §4.1).

The reference caps every Athena query at 100 GiB scanned —
``BytesScannedCutoffPerQuery: 107374182400`` (``serverless.yml:422``) —
a hard pre-execution abort, not a billing note. Our engine reproduces
it as a pre-flight check: sum the on-disk size of the files a
DataFrame's plan will actually touch (``df.inputFiles()`` reflects
partition pruning, so a pruned query is charged only for surviving
files) and refuse to run when over budget.

This is deliberately a helper, not a Catalyst rule: the check is
driver-side metadata-only (one file listing), and keeping it explicit
lets callers opt particular queries out — same posture as the
reference's per-workgroup (not per-query) setting.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

DEFAULT_BUDGET_BYTES = 100 * 1024**3  # serverless.yml:422


class ScanBudgetExceeded(RuntimeError):
    def __init__(self, scanned: int, budget: int):
        self.scanned = scanned
        self.budget = budget
        super().__init__(
            f"query would scan {scanned:,} bytes, over the {budget:,}-byte budget"
        )


def estimate_scan_bytes(df: DataFrame) -> int:
    """Bytes the physical plan will actually read, post partition
    pruning. Metadata-only — no job is launched.

    ``df.inputFiles()`` reflects the *analyzed* relation (pre-pruning),
    so we walk the executed plan's file scans and sum their selected
    partitions; a pruned query is charged only for surviving files.
    Falls back to the unpruned inputFiles sum if plan introspection
    fails (still a safe over-estimate for a budget check)."""
    try:
        return _pruned_scan_bytes(df)
    except Exception:
        total = 0
        for uri in df.inputFiles():
            path = urlparse(uri).path or uri
            try:
                total += os.path.getsize(path)
            except OSError:
                total += _hadoop_size(df.sparkSession, uri)
        return total


def _pruned_scan_bytes(df: DataFrame) -> int:
    """Walk FileSourceScanExec leaves; ask each scan's FileIndex for
    the files surviving its partition+data filters and sum sizes."""
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    total = 0
    seen_scan = False
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if node.getClass().getSimpleName() != "FileSourceScanExec":
            continue
        seen_scan = True
        parts = node.relation().location().listFiles(
            node.partitionFilters(), node.dataFilters()
        )  # Seq[PartitionDirectory]
        for j in range(parts.size()):
            files = parts.apply(j).files()  # Seq[FileStatusWithMetadata]
            for k in range(files.size()):
                total += files.apply(k).getLen()
    if not seen_scan:
        raise ValueError("no file scans in plan")
    return total


def _hadoop_size(spark, uri: str) -> int:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(uri)
    fs = p.getFileSystem(conf)
    return fs.getFileStatus(p).getLen()


def check_scan_budget(df: DataFrame, budget_bytes: int = DEFAULT_BUDGET_BYTES) -> int:
    """Raise ``ScanBudgetExceeded`` if the plan's input exceeds the
    budget; returns the estimated bytes otherwise."""
    scanned = estimate_scan_bytes(df)
    if scanned > budget_bytes:
        raise ScanBudgetExceeded(scanned, budget_bytes)
    return scanned
