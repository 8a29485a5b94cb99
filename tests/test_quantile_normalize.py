"""Per-group quantile normalization (round 9): golden vs a python
model, identity on a single group, monotonicity within group, plan
boundedness (windows over distribution tables, broadcast attach)."""

import pytest
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators.sampling import quantile_normalize
from cbts_datalake_synnex_spark.plans.inspect import explain_str


def _py_qn(rows):
    """rows: (group, value). Returns {(group, value): norm}."""
    from collections import Counter

    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    gl = sorted(v for _, v in rows)
    n_total = len(gl)
    # global CDF on distinct values
    gcnt = Counter(gl)
    gdist = sorted(gcnt)
    cum, fmap = 0, {}
    for u in gdist:
        cum += gcnt[u]
        fmap[u] = cum / n_total
    out = {}
    for g, vals in by_g.items():
        n = len(vals)
        cnt = Counter(vals)
        c = 0
        for v in sorted(cnt):
            q = (c + cnt[v] / 2.0) / n
            c += cnt[v]
            out[(g, v)] = min(u for u in gdist if fmap[u] >= q)
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, v bigint")


ROWS = [
    ("a", 10), ("a", 10), ("a", 20), ("a", 30), ("a", 40),
    ("b", 100), ("b", 200), ("b", 200), ("b", 300),
    ("c", 15),
]


def test_quantile_normalize_matches_python(spark):
    got = {
        (r["grp"], r["v"]): r["normalized"]
        for r in quantile_normalize(_df(spark, ROWS), "grp", "v").collect()
    }
    want = _py_qn([(g, v) for g, v in ROWS])
    assert got == want


def test_single_group_is_near_identity(spark):
    # one group == the global distribution: every value maps to itself
    rows = [("x", v) for v in (1, 2, 2, 3, 5, 8, 13)]
    out = quantile_normalize(_df(spark, rows), "grp", "v").collect()
    assert all(r["normalized"] == r["v"] for r in out)


def test_normalization_is_monotone_within_group(spark):
    out = quantile_normalize(_df(spark, ROWS), "grp", "v").collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r["grp"], []).append((r["v"], r["normalized"]))
    for pairs in by_g.values():
        pairs.sort()
        norms = [n for _, n in pairs]
        assert norms == sorted(norms)


def test_output_values_come_from_global_support(spark):
    out = quantile_normalize(_df(spark, ROWS), "grp", "v").collect()
    support = {v for _, v in ROWS}
    assert all(r["normalized"] in support for r in out)


def test_partitioning_invariance(spark):
    df = _df(spark, ROWS)
    a = sorted(map(tuple, quantile_normalize(df, "grp", "v").collect()))
    b = sorted(map(tuple, quantile_normalize(df.repartition(7), "grp", "v").collect()))
    assert a == b


def test_plan_attaches_via_broadcast(spark):
    plan = explain_str(quantile_normalize(_df(spark, ROWS), "grp", "v"), "simple")
    # the per-document attach is a broadcast of the tiny norm map —
    # the corpus is never shuffled for it
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_resample_interpolate_hand_golden(spark):
    """Round 12: exact at observation ticks, linear between, grid
    bounded by the observed span."""
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators.timeseries import (
        resample_interpolate,
    )

    s = 1_000_000  # 1s in µs
    rows = [(1, 0 * s, 0.0), (1, 10 * s, 100.0), (1, 25 * s, 25.0)]
    df = spark.createDataFrame(rows, "e bigint, us bigint, v double").select(
        "e", F.timestamp_micros("us").alias("ts"), "v"
    )
    out = {r["grid_us"] // s: r["value"] for r in
           resample_interpolate(df, "e", "ts", "v", step_sec=5).collect()}
    # grid: 0, 5, 10, 15, 20, 25
    assert out[0] == 0.0 and out[10] == 100.0 and out[25] == 25.0  # on-tick exact
    assert out[5] == 50.0                      # midpoint of 0..10
    assert out[15] == 75.0 and out[20] == 50.0  # linear 100 -> 25 over 15s
    assert set(out) == {0, 5, 10, 15, 20, 25}   # no extrapolation
