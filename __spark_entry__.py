"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — the declared SURVEY §2 workload;
both views of ``cbts_datalake_synnex_spark.workload.REGISTRY``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cbts_datalake_synnex_spark.workload import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped pricing summary — exercises parquet scan, filter
    pushdown, and an 8-aggregate hash aggregation.
    """
    return REGISTRY["a2_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY query. Approximate operators
    (MinHash/SimHash/LSH-ANN/IVF/PQ) and nondeterministic surfaces
    (uuid generation) emit derived-deterministic verification reports
    computed in-plan against their exact twins, so they too carry a
    full-strength hash-checkable oracle (the recall/quality gates in
    tests/ remain the tighter assertions)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
