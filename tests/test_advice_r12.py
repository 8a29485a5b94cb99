"""Regression tests for the ADVICE r12 defect ledger: MoR NULL-key
deletes (null-safe join), khop sink-node coverage, and
char_entropy_score empty-doc rows. (The bloom staleness + k-default
fixes live in test_unique_constraint.py.)"""

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.engine import LakeEngine


@pytest.fixture()
def eng(spark):
    root = tempfile.mkdtemp(prefix="ar12_")
    db = f"ar12_{uuid.uuid4().hex[:8]}"
    e = LakeEngine(spark, root, database=db)
    yield e
    spark.catalog.setCurrentDatabase("default")
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(root, ignore_errors=True)


def test_mor_delete_null_key_idempotent(spark, eng):
    """A NULL-keyed match used to be re-counted on every call (plain
    anti-joins never match NULLs) and never filtered by read_mor."""
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "b")], "k int, v string"
    )
    eng.write_curated("t", df, mode="overwrite", partition_cols=[])
    n1 = eng.delete_rows_mor("t", F.col("v") == "b", ["k"])
    assert n1 == 2  # the NULL-keyed row counts once
    # read through the vector: both "b" rows are gone, incl. NULL key
    got = {r["k"] for r in eng.read_mor("t").collect()}
    assert got == {1}
    # idempotent: a second identical delete adds nothing
    n2 = eng.delete_rows_mor("t", F.col("v") == "b", ["k"])
    assert n2 == 0
    assert spark.table(eng.qualified("t__dv")).count() == 2


def test_khop_reaches_directed_sinks(spark):
    """Directed chain 1->2->3: node 3 only ever appears as a dst; it
    used to vanish from the output. A seed with no outgoing edges
    (node 9) must still report dist=0."""
    from cbts_datalake_synnex_spark.operators.graph import khop_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,), (9,)], "node bigint")
    got = {r["node"]: r["dist"] for r in khop_distances(edges, seeds, 3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 9: 0}


def test_char_entropy_empty_docs_score_zero(spark):
    from cbts_datalake_synnex_spark.operators.text import char_entropy_score

    df = spark.createDataFrame(
        [(1, "aabb"), (2, ""), (3, None)], "id bigint, text string"
    )
    rows = {r["id"]: r for r in char_entropy_score(df, "id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["entropy"] == 1.0 and rows[1]["n_chars"] == 4
    for i in (2, 3):
        assert rows[i]["n_chars"] == 0
        assert rows[i]["n_distinct_chars"] == 0
        assert rows[i]["entropy"] == 0.0


def test_running_totals_and_ntile_parity(spark):
    """ranks.running_totals / ntile_from_rank match the window forms
    on a frame big enough to span several range partitions."""
    from pyspark.sql import Window as W

    from cbts_datalake_synnex_spark.operators.ranks import (
        global_row_number,
        ntile_from_rank,
        running_totals,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 1009).alias("v"), F.col("id").alias("uid")
    )
    # global row number vs window row_number over the same total order
    got = global_row_number(df, ["v", "uid"], "rn")
    exp = df.withColumn("rn", F.row_number().over(W.orderBy("v", "uid")))
    assert got.select("v", "uid", "rn").subtract(exp).count() == 0
    assert exp.subtract(got.select("v", "uid", "rn")).count() == 0
    # ntile buckets vs F.ntile over the same order, several n
    n_rows = df.count()
    for n in (1, 3, 5, 7, 4999, 5000, 6000):
        g = got.select(
            "uid", ntile_from_rank(F.col("rn"), F.lit(n_rows), n).alias("b")
        )
        e = df.select(
            "uid", F.ntile(n).over(W.orderBy("v", "uid")).cast("bigint").alias("b")
        )
        assert g.subtract(e).count() == 0, f"ntile({n}) mismatch"
    # running totals of a weight column vs the window cumsum
    wdf = df.withColumn("w", (F.col("uid") % 7).cast("bigint"))
    rt = running_totals(wdf, ["v", "uid"], ["w"])
    ew = wdf.withColumn(
        "run_w",
        F.sum("w").over(
            W.orderBy("v", "uid").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    assert rt.select("v", "uid", "run_w").subtract(
        ew.select("v", "uid", "run_w")
    ).count() == 0


def test_successor_lookup_matches_union_window(spark):
    from cbts_datalake_synnex_spark.operators.ranks import successor_lookup

    entries = spark.createDataFrame(
        [(0.2, "a"), (0.5, "b"), (0.5, "c"), (1.0, "d")], "key double, g string"
    )
    probes = spark.createDataFrame(
        [(0.1,), (0.2,), (0.3,), (0.5,), (0.9,), (1.0,)], "key double"
    )
    got = {
        (r["key"], r["succ"])
        for r in successor_lookup(probes, entries, "key", "g").collect()
    }
    assert got == {
        (0.1, "a"), (0.2, "a"), (0.3, "b"), (0.5, "b"), (0.9, "d"), (1.0, "d")
    }
