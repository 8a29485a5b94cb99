"""CDF-maintained join view (round 12): incremental refresh equals the
full recompute under every change class — value-only update, JOIN-KEY-
MOVING update, delete, insert (with and without a dim match) — plus the
noop fast path, the refresh_materialized_view dispatch, and the
contract error paths."""

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.engine import LakeEngine


@pytest.fixture()
def eng(spark):
    root = tempfile.mkdtemp(prefix="jv_")
    db = f"jv_{uuid.uuid4().hex[:8]}"
    e = LakeEngine(spark, root, database=db)
    yield e
    spark.catalog.setCurrentDatabase("default")
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(root, ignore_errors=True)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_join_view_incremental_equals_recompute(spark, eng):
    dim = _df(spark, [(1, "a"), (2, "b"), (3, "c")], "dk int, attr string")
    v1 = _df(
        spark,
        [(10, 1, 100), (11, 1, 110), (12, 2, 120), (13, 3, 130)],
        "k int, fk int, val int",
    )
    # v2: 10 value-updated, 11 MOVES dim key 1->2, 12 deleted,
    # 14 inserted (dim match), 15 inserted with NO dim match (drops out)
    v2 = _df(
        spark,
        [(10, 1, 999), (11, 2, 110), (13, 3, 130), (14, 3, 140), (15, 9, 150)],
        "k int, fk int, val int",
    )
    eng.write_curated("dim", dim, mode="overwrite", partition_cols=[])
    eng.write_curated("fact", v1, mode="overwrite", partition_cols=[])
    eng.create_join_view(
        "mv", "fact", "dim",
        fact_key="k", fact_join_col="fk", dim_key="dk",
        fact_cols=["k", "fk", "val"], dim_cols=["attr"],
    )
    eng.write_curated("fact", v2, mode="overwrite", partition_cols=[])
    assert eng.refresh_join_view("mv") == "incremental"
    got = {
        (r["k"], r["fk"], r["val"], r["attr"])
        for r in spark.table(eng.qualified("mv")).collect()
    }
    want = {
        (r["k"], r["fk"], r["val"], r["attr"])
        for r in v2.join(dim, v2.fk == dim.dk).drop("dk").collect()
    }
    assert got == want
    assert (10, 1, 999, "a") in got and (11, 2, 110, "b") in got
    assert not any(k == 15 for k, *_ in got)  # inner: no dim match
    # unchanged fact -> noop, via both entry points
    assert eng.refresh_join_view("mv") == "noop"
    assert eng.refresh_materialized_view("mv") == "noop"


def test_join_view_contract_errors(spark, eng):
    dim = _df(spark, [(1, "a")], "dk int, attr string")
    fact = _df(spark, [(10, 1, 100)], "k int, fk int, val int")
    eng.write_curated("dim", dim, mode="overwrite", partition_cols=[])
    eng.write_curated("fact", fact, mode="overwrite", partition_cols=[])
    kw = dict(fact_key="k", fact_join_col="fk", dim_key="dk")
    with pytest.raises(ValueError, match="fact_key"):
        eng.create_join_view(
            "m1", "fact", "dim", fact_cols=["fk", "val"], dim_cols=["attr"], **kw
        )
    with pytest.raises(ValueError, match="collision"):
        eng.create_join_view(
            "m2", "fact", "dim",
            fact_cols=["k", "fk", "val"], dim_cols=["val"], **kw
        )
    with pytest.raises(ValueError, match="snapshot journal"):
        eng.create_join_view(
            "m3", "nosuch", "dim",
            fact_cols=["k", "fk", "val"], dim_cols=["attr"], **kw
        )
    eng.create_join_view(
        "mv", "fact", "dim", fact_cols=["k", "fk", "val"], dim_cols=["attr"], **kw
    )
    with pytest.raises(ValueError, match="not a join view"):
        eng.create_incremental_view(
            "agg", "fact", ["fk"], [("sum", "val", "s")]
        ) or eng.refresh_join_view("agg")
