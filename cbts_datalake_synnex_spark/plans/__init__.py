"""Plan-level utilities (SURVEY §4): scan-budget guardrail + explain
introspection helpers."""

from cbts_datalake_synnex_spark.plans.budget import ScanBudgetExceeded, check_scan_budget
from cbts_datalake_synnex_spark.plans.inspect import explain_str, pushed_filters, read_schema

__all__ = [
    "check_scan_budget",
    "ScanBudgetExceeded",
    "explain_str",
    "pushed_filters",
    "read_schema",
]
