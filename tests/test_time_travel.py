"""Goldens for parquet snapshot time travel + restore (the Delta
transaction-log/RESTORE stand-in — SURVEY §8.1). The append/invalidate
contracts live in test_engine_lifecycle; this file pins RESTORE."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from cbts_datalake_synnex_spark.engine import LakeEngine

CLOCK = lambda: datetime(2024, 5, 17, 12, 0, 0, tzinfo=timezone.utc)  # noqa: E731


@pytest.fixture()
def engine(spark, tmp_path):
    db = f"tt_{abs(hash(str(tmp_path))) % 10**9}"
    eng = LakeEngine(spark, str(tmp_path / "lake"), database=db, clock=CLOCK)
    yield eng
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_restore_snapshot_rolls_back_and_journals_forward(engine, spark):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    df2 = spark.createDataFrame([(3, "c")], "id int, v string")
    engine.write_curated("t", df1, mode="append", partition_cols=[])
    v1 = engine.snapshot_history("t")[-1]["version"]
    engine.write_curated("t", df2, mode="append", partition_cols=[])
    assert spark.table(engine.qualified("t")).count() == 3

    new_v = engine.restore_snapshot("t", v1)
    # current content is v1 again...
    got = {(r["id"], r["v"]) for r in spark.table(engine.qualified("t")).collect()}
    assert got == {(1, "a"), (2, "b")}
    # ...and the restore is a NEW version, not a rewrite of history
    hist = engine.snapshot_history("t")
    assert hist[-1]["version"] == new_v and new_v > v1 + 1
    assert engine.read_snapshot("t", new_v).count() == 2


def test_restore_unknown_version_raises(engine, spark):
    engine.write_curated(
        "t", spark.createDataFrame([(1, "a")], "id int, v string"), mode="append", partition_cols=[]
    )
    with pytest.raises(ValueError, match="no snapshot version 42"):
        engine.restore_snapshot("t", 42)


def test_snapshot_changes_between_versions(engine, spark):
    """Change feed between snapshots (readChangeFeed analogue): insert
    + update classified; unchanged rows absent from the delta."""
    v1_df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    engine.write_curated("t", v1_df, mode="append", partition_cols=[])
    v1 = engine.snapshot_history("t")[-1]["version"]
    # v2 = v1 plus a new row; an "update" on parquet append-history means
    # id 2 appears again with a new value (both rows present at v2), so
    # classify against a merged table instead: use merge_upsert
    engine.merge_upsert(
        "t",
        spark.createDataFrame([(2, "B"), (3, "c")], "id int, v string"),
        keys=["id"],
    )
    v2 = engine.snapshot_history("t")[-1]["version"]
    assert v2 > v1
    delta = {
        r["id"]: r["change_type"]
        for r in engine.snapshot_changes("t", v1, v2, keys=["id"]).collect()
    }
    assert delta == {2: "changed", 3: "inserted"}
