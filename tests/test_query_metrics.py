"""Executed-plan metrics harness (round 13): SQLMetrics harvesting,
the alarm rules, and the environment-dependent columns the registry
oracle can't restate (bytes, shuffle, duration bounds)."""

import pytest
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.plans.metrics import (
    alarm_report,
    executed_plan_metrics,
    metrics_table,
    run_with_metrics,
)

SF = "/root/testdata/sf0.001"


def test_scan_metrics_match_data(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n = li.count()
    df = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("c"))
    df.collect()
    m = executed_plan_metrics(df)
    assert m["scan_rows"] == n
    assert m["n_files"] >= 1
    assert m["files_size"] > 0


def test_shuffle_and_join_metrics(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    run = run_with_metrics(
        "jc",
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n")),
    )
    assert run["scan_rows"] == o.count() + c.count()
    assert run["output_rows"] >= 1
    assert run["duration_ms"] >= 0
    # the groupBy exchange always writes shuffle bytes
    assert run["shuffle_bytes"] > 0 and run["shuffle_records"] > 0


def test_alarm_rules(spark):
    runs = [
        {"query_name": "full_scan_tiny_result", "output_rows": 2,
         "duration_ms": 5, "scan_rows": 100000, "files_size": 10,
         "n_files": 1, "shuffle_bytes": 0, "shuffle_records": 0,
         "spill_bytes": 0, "peak_memory": 0},
        {"query_name": "empty", "output_rows": 0, "duration_ms": 1,
         "scan_rows": 10, "files_size": 10, "n_files": 1,
         "shuffle_bytes": 0, "shuffle_records": 0, "spill_bytes": 7,
         "peak_memory": 0},
        {"query_name": "healthy", "output_rows": 50, "duration_ms": 1,
         "scan_rows": 100, "files_size": 10, "n_files": 1,
         "shuffle_bytes": 0, "shuffle_records": 0, "spill_bytes": 0,
         "peak_memory": 0},
    ]
    rep = {r["query_name"]: r.asDict()
           for r in alarm_report(metrics_table(spark, runs)).collect()}
    assert rep["full_scan_tiny_result"]["alarm_full_scan"] is True
    assert rep["full_scan_tiny_result"]["scan_amplification"] == 50000.0
    assert rep["empty"]["alarm_empty"] is True
    assert rep["empty"]["scan_amplification"] is None
    assert rep["empty"]["alarm_spill"] is True
    assert not rep["healthy"]["alarm_full_scan"]
    assert not rep["healthy"]["alarm_empty"]
    assert not rep["healthy"]["alarm_spill"]
