"""Round-6 DML guardrails (judge-advice hardening, Delta parity):

- SQL DML dispatch refuses a statement naming a DIFFERENT database
  instead of silently rerouting it to the engine database's
  same-named table (a wrong-table destructive operation).
- ``VERSION/TIMESTAMP AS OF`` text inside a string literal is data,
  not time-travel syntax — the query runs verbatim.
- OPTIMIZE / compact_table preserves an EVOLVED partition scheme
  (Delta's OPTIMIZE never changes partitioning).
- CHECK constraints and generated columns are enforced on
  UPDATE/MERGE splices, not just write_curated; generated columns the
  statement does not assign are recomputed from post-update values
  (Delta UPDATE/MERGE semantics).
- merge_rows' default broadcast decision comes from Catalyst's size
  estimate, so an arbitrarily large merge source cannot OOM the
  driver.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.engine import ConstraintViolation, LakeEngine

_FIXED_NOW = datetime(2024, 3, 15, 12, 0, 0)


@pytest.fixture()
def eng(spark):
    root = tempfile.mkdtemp(prefix="guard_lake_")
    db = f"guard_{uuid.uuid4().hex[:8]}"
    engine = LakeEngine(spark, root, database=db, clock=lambda: _FIXED_NOW)
    yield engine
    spark.catalog.setCurrentDatabase("default")
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(root, ignore_errors=True)


def _seed(spark, eng, table="t"):
    df = spark.createDataFrame(
        [(i, f"n{i}", (i % 5) + 1) for i in range(20)], "k int, name string, qty int"
    )
    eng.write_curated(table, df, mode="overwrite", partition_cols=[])
    return eng.qualified(table)


# ---------------------------------------------------------------- qualifiers
def test_dml_other_database_qualifier_refused(spark, eng):
    _seed(spark, eng)
    for stmt in [
        "DELETE FROM otherdb.t WHERE k = 1",
        "UPDATE otherdb.t SET qty = 0 WHERE k = 1",
        "OPTIMIZE otherdb.t",
        "VACUUM otherdb.t",
        "DESCRIBE HISTORY otherdb.t",
        "RESTORE TABLE otherdb.t TO VERSION AS OF 1",
    ]:
        with pytest.raises(ValueError, match="otherdb"):
            eng.sql(stmt)
    # nothing was deleted by the refused statements
    assert spark.table(eng.qualified("t")).count() == 20


def test_dml_same_database_qualifier_accepted(spark, eng):
    _seed(spark, eng)
    out = eng.sql(f"DELETE FROM {eng.database}.t WHERE k < 5").collect()[0]
    assert out["affected_rows"] == 5
    assert spark.table(eng.qualified("t")).count() == 15


# ---------------------------------------------------------------- literals
def test_time_travel_text_inside_literal_is_data(spark, eng):
    _seed(spark, eng)
    # Previously the dispatch re.search fired on the literal and the
    # substitution corrupted the query text around it.
    got = eng.sql(
        "SELECT count(*) AS n FROM t WHERE name != 'FROM t VERSION AS OF 99'"
    ).collect()[0]
    assert got["n"] == 20


def test_time_travel_still_dispatches_after_from(spark, eng):
    qt = _seed(spark, eng)
    eng.sql("DELETE FROM t WHERE k < 10")
    assert spark.table(qt).count() == 10
    got = eng.sql("SELECT count(*) AS n FROM t VERSION AS OF 1").collect()[0]
    assert got["n"] == 20


# ---------------------------------------------------------------- OPTIMIZE
def test_optimize_preserves_evolved_partitioning(spark, eng):
    qt = _seed(spark, eng)
    eng.repartition_table("t", ["qty"])
    parts = [c.name for c in spark.catalog.listColumns(qt) if c.isPartition]
    assert parts == ["qty"]
    eng.compact_table("t")
    parts = [c.name for c in spark.catalog.listColumns(qt) if c.isPartition]
    assert parts == ["qty"], "OPTIMIZE must never change partitioning"
    assert spark.table(qt).count() == 20
    # partition pruning still works post-compaction
    assert spark.table(qt).filter("qty = 3").count() == 4


# ------------------------------------------------------- DML validation
def test_update_enforces_check_constraint(spark, eng):
    qt = _seed(spark, eng)
    eng.add_check_constraint("t", "qty_positive", "qty >= 0")
    with pytest.raises(ConstraintViolation, match="qty_positive"):
        eng.update_rows("t", "k = 3", {"qty": "-5"})
    # rejected before splicing: table untouched
    assert spark.table(qt).filter("qty < 0").count() == 0
    assert spark.table(qt).count() == 20
    # clean update passes
    assert eng.update_rows("t", "k = 3", {"qty": "99"}) == 1
    assert spark.table(qt).filter("k = 3").collect()[0]["qty"] == 99


def test_update_recomputes_generated_column(spark, eng):
    qt = _seed(spark, eng)
    eng.add_generated_column("t", "qty2", "qty * 2", dtype="int")
    assert eng.update_rows("t", "k = 4", {"qty": "10"}) == 1
    row = spark.table(qt).filter("k = 4").collect()[0]
    assert (row["qty"], row["qty2"]) == (10, 20), "derived column must not go stale"
    # untouched rows keep consistent derived values
    bad = spark.table(qt).filter("qty2 != qty * 2").count()
    assert bad == 0


def test_update_explicit_generated_mismatch_rejected(spark, eng):
    qt = _seed(spark, eng)
    eng.add_generated_column("t", "qty2", "qty * 2", dtype="int")
    with pytest.raises(ConstraintViolation, match="generated-column"):
        eng.update_rows("t", "k = 4", {"qty2": "7"})
    assert spark.table(qt).filter("qty2 != qty * 2").count() == 0


def test_merge_enforces_check_constraint(spark, eng):
    qt = _seed(spark, eng)
    eng.add_check_constraint("t", "qty_positive", "qty >= 0")
    src = spark.createDataFrame([(3, "upd", -8)], "k int, name string, qty int")
    with pytest.raises(ConstraintViolation, match="qty_positive"):
        eng.merge_rows("t", src, keys=["k"])
    assert spark.table(qt).filter("qty < 0").count() == 0


def test_merge_insert_computes_generated_column(spark, eng):
    qt = _seed(spark, eng)
    eng.add_generated_column("t", "qty2", "qty * 2", dtype="int")
    src = spark.createDataFrame(
        [(100, "new", 6), (3, "upd", 9)], "k int, name string, qty int"
    )
    res = eng.merge_rows("t", src, keys=["k"])
    assert res["inserted"] == 1 and res["updated"] >= 1
    rows = {r["k"]: r for r in spark.table(qt).filter("k in (100, 3)").collect()}
    assert rows[100]["qty2"] == 12, "insert must compute the generated column"
    assert rows[3]["qty2"] == 18, "update must recompute the generated column"
    assert spark.table(qt).filter("qty2 != qty * 2").count() == 0


# ------------------------------------------------------- broadcast guard
def test_fits_broadcast_small_batch_and_unknown_plan(spark, eng):
    small = spark.createDataFrame([(1, "a")], "k int, v string")
    assert eng._fits_broadcast(small) is True
    # post-shuffle estimates are unknown/huge → never broadcast blind
    big = spark.range(0, 1000).groupBy((F.col("id") % 7).alias("k")).agg(
        F.collect_list("id").alias("v")
    )
    assert eng._fits_broadcast(big) in (True, False)  # never raises
    assert eng._fits_broadcast(spark.range(10 ** 9).crossJoin(spark.range(100))) is False


def test_merge_without_broadcast_matches_broadcast(spark, eng):
    _seed(spark, eng, table="a")
    _seed(spark, eng, table="b")
    src = spark.createDataFrame(
        [(5, "x", 50), (200, "y", 60)], "k int, name string, qty int"
    )
    ra = eng.merge_rows("a", src, keys=["k"], broadcast_source=True)
    rb = eng.merge_rows("b", src, keys=["k"], broadcast_source=False)
    assert ra == rb
    ta = spark.table(eng.qualified("a")).orderBy("k").collect()
    tb = spark.table(eng.qualified("b")).orderBy("k").collect()
    assert ta == tb


# ------------------------------------------------- DROP/RENAME COLUMN
def test_drop_column_rewrites_and_journals(spark, eng):
    qt = _seed(spark, eng)
    out = eng.sql("ALTER TABLE t DROP COLUMN qty").collect()[0]
    assert out["n_files"] >= 1
    assert set(spark.table(qt).columns) == {"k", "name"}
    assert spark.table(qt).count() == 20
    # the pre-drop rows (with the column) are still time-travelable
    v_before = eng.snapshot_history("t")[-2]["version"]
    old = eng.read_snapshot("t", v_before)
    assert "qty" in old.columns and old.count() == 20


def test_drop_column_refusals(spark, eng):
    _seed(spark, eng)
    eng.add_check_constraint("t", "qty_pos", "qty >= 0")
    with pytest.raises(ValueError, match="qty_pos"):
        eng.drop_column("t", "qty")
    eng.drop_check_constraint("t", "qty_pos")
    eng.add_generated_column("t", "qty2", "qty * 2", dtype="int")
    with pytest.raises(ValueError, match="qty2"):
        eng.drop_column("t", "qty")  # base of a generated column
    # dropping the generated column itself is fine and removes its rule
    eng.drop_column("t", "qty2")
    assert eng.generated_columns("t") == {}
    with pytest.raises(ValueError, match="no such column"):
        eng.drop_column("t", "nope")


def test_rename_column_moves_generated_rule(spark, eng):
    qt = _seed(spark, eng)
    eng.add_generated_column("t", "qty2", "qty * 2", dtype="int")
    out = eng.sql("ALTER TABLE t RENAME COLUMN qty2 TO qty_doubled").collect()[0]
    assert out["n_files"] >= 1
    assert "qty_doubled" in spark.table(qt).columns
    assert "qty2" not in spark.table(qt).columns
    assert eng.generated_columns("t") == {"qty_doubled": "qty * 2"}
    # the moved rule still enforces on later writes
    with pytest.raises(Exception, match="generated-column"):
        eng.update_rows("t", "k = 1", {"qty_doubled": "7"})


def test_rename_column_refusals(spark, eng):
    _seed(spark, eng)
    with pytest.raises(ValueError, match="already exists"):
        eng.rename_column("t", "qty", "name")
    eng.add_generated_column("t", "qty2", "qty * 2", dtype="int")
    with pytest.raises(ValueError, match="referenced by generated"):
        eng.rename_column("t", "qty", "quantity")


def test_restore_across_column_drop_recovers_schema(spark, eng):
    """RESTORE to a pre-DROP-COLUMN version brings back both the rows
    and the dropped column (the snapshot journal carries the old
    schema's files; write_curated overwrite recreates the catalog
    schema from them)."""
    qt = _seed(spark, eng)
    v_before = eng.snapshot_history("t")[-1]["version"]
    eng.drop_column("t", "qty")
    assert "qty" not in spark.table(qt).columns
    eng.restore_snapshot("t", v_before)
    restored = spark.table(qt)
    assert "qty" in restored.columns
    assert restored.count() == 20
    assert restored.filter("qty IS NULL").count() == 0


def test_compact_if_fragmented_policy(spark, eng):
    qt = _seed(spark, eng)
    # fragment: 20 rows across many tiny files
    df = spark.createDataFrame(
        [(i, f"n{i}", (i % 5) + 1) for i in range(20)], "k int, name string, qty int"
    )
    eng.write_curated("t", df.repartition(16), mode="overwrite", partition_cols=[])
    n_before = len(spark.table(qt).inputFiles())
    assert n_before >= 8
    # healthy threshold high enough → no-op
    assert eng.compact_if_fragmented("t", small_file_ratio=1.1) == -1
    assert len(spark.table(qt).inputFiles()) == n_before
    # tiny files are all below target → compacts
    n_after = eng.compact_if_fragmented("t", small_file_ratio=0.5)
    assert 0 < n_after < n_before
    assert spark.table(qt).count() == 20


def test_vacuum_orphans_repairs_crash_artifacts(spark, eng):
    """A file left in the table directory by a crashed rewrite is
    silently READ by the Hive parquet scan (extra rows); vacuum_orphans
    restores the directory to the last journaled manifest and sweeps
    stale scratch dirs."""
    import os
    from urllib.parse import urlparse

    qt = _seed(spark, eng)
    loc = urlparse(eng._table_location(qt)).path
    # simulate a crashed splice: an unjournaled extra parquet file
    alien = spark.createDataFrame(
        [(999, "alien", 1)], "k int, name string, qty int"
    )
    alien.coalesce(1).write.parquet(os.path.join(eng.zones.root, "_alien"))
    src = next(
        os.path.join(d, f)
        for d, _, fs in os.walk(os.path.join(eng.zones.root, "_alien"))
        for f in fs if f.endswith(".parquet")
    )
    os.replace(src, os.path.join(loc, "crash-leftover.parquet"))
    spark.catalog.refreshTable(qt)
    assert spark.table(qt).count() == 21  # the corruption mode
    # plus a stale scratch dir from a crashed DML
    os.makedirs(os.path.join(eng.zones.root, "_dml", "t_deadbeef"), exist_ok=True)
    open(os.path.join(eng.zones.root, "_dml", "t_deadbeef", "part-0.parquet"), "w").write("x")

    assert eng.vacuum_orphans("t", dry_run=True) == 2
    assert spark.table(qt).count() == 21  # dry run touches nothing
    assert eng.vacuum_orphans("t") == 2
    assert spark.table(qt).count() == 20
    assert not os.path.exists(os.path.join(eng.zones.root, "_dml", "t_deadbeef"))
    # time travel unaffected (retention links live elsewhere)
    assert eng.read_snapshot("t", 1).count() == 20
