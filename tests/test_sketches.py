"""Count-min sketch (round 10): linearity (counter-wise merge equals
the sketch of the union — the mergeable-summaries property), the
one-sided never-undercount guarantee, and a planted-collision golden."""

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators import sketches
from cbts_datalake_synnex_spark.workload.base import load_table


def _items(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "item string")


def test_cms_merge_is_counterwise_addition(spark):
    a = _items(spark, [f"k{i % 7}" for i in range(50)])
    b = _items(spark, [f"k{i % 11}" for i in range(80)])
    kw = dict(item_col="item", depth=3, width=16)
    sa = {(r["d"], r["bucket"]): r["cnt"] for r in sketches.count_min_build(a, **kw).collect()}
    sb = {(r["d"], r["bucket"]): r["cnt"] for r in sketches.count_min_build(b, **kw).collect()}
    su = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in sketches.count_min_build(a.unionAll(b), **kw).collect()
    }
    merged: dict = {}
    for s in (sa, sb):
        for k, v in s.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == su


def test_cms_never_undercounts_and_collisions_overcount(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("item")
    )
    # width 64 << ~750 distinct items: collisions guaranteed
    sk = sketches.count_min_build(ev, "item", depth=4, width=64)
    est = sketches.count_min_estimate(sk, ev, "item", depth=4, width=64)
    exact = ev.groupBy("item").agg(F.count(F.lit(1)).alias("exact_cnt"))
    rows = exact.join(est, "item").collect()
    assert rows
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)
    assert any(r["cms_est"] > r["exact_cnt"] for r in rows), (
        "no collision overcount at width 64 — test corpus too small?"
    )


def test_engine_estimate_join_size_bounds_exact(spark, sf_dir):
    """Round 11: the persisted-sketch planning path —
    analyze_join_column builds KB-sized sketch tables, and
    estimate_join_size's inner product is (a) never an underestimate
    of the exact equi-join cardinality on real driver tables, and
    (b) EXACT when the width dwarfs the key space (no collisions:
    every cross term is a true term)."""
    import shutil
    import tempfile
    import uuid

    from cbts_datalake_synnex_spark.engine import LakeEngine

    root = tempfile.mkdtemp(prefix="jsz_")
    db = f"jsz_{uuid.uuid4().hex[:8]}"
    eng = LakeEngine(spark, root, database=db)
    try:
        for t in ("orders", "customer"):
            load_table(spark, sf_dir, t).write.saveAsTable(eng.qualified(t))
        exact = (
            spark.table(eng.qualified("orders"))
            .join(
                spark.table(eng.qualified("customer")),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        # narrow width -> collisions -> strict upper bound
        for t, c in (("orders", "o_custkey"), ("customer", "c_custkey")):
            eng.analyze_join_column(t, c, depth=4, width=32)
        est_narrow = eng.estimate_join_size(
            "orders", "o_custkey", "customer", "c_custkey"
        )
        assert est_narrow >= exact
        # wide sketch -> collision-free at sf0.001/0.01 key counts -> exact
        for t, c in (("orders", "o_custkey"), ("customer", "c_custkey")):
            eng.analyze_join_column(t, c, depth=4, width=1 << 16)
        est_wide = eng.estimate_join_size(
            "orders", "o_custkey", "customer", "c_custkey"
        )
        assert est_narrow >= est_wide >= exact

        # spec mismatch refused
        eng.analyze_join_column("orders", "o_custkey", depth=4, width=64)
        try:
            eng.estimate_join_size("orders", "o_custkey", "customer", "c_custkey")
            raise AssertionError("mismatched sketch specs must raise")
        except ValueError:
            pass
        # missing sketch refused
        try:
            eng.estimate_join_size("orders", "o_orderkey", "customer", "c_custkey")
            raise AssertionError("missing sketch must raise")
        except ValueError:
            pass
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(root, ignore_errors=True)


def test_engine_estimate_join_keys_overlap(spark, sf_dir):
    """Round 11: the HLL key-overlap companion — estimates within 5%
    of exact distinct counts at driver scale, overlap by inclusion-
    exclusion, missing sketch refused."""
    import shutil
    import tempfile
    import uuid

    from cbts_datalake_synnex_spark.engine import LakeEngine

    root = tempfile.mkdtemp(prefix="jko_")
    db = f"jko_{uuid.uuid4().hex[:8]}"
    eng = LakeEngine(spark, root, database=db)
    try:
        for t in ("orders", "customer"):
            load_table(spark, sf_dir, t).write.saveAsTable(eng.qualified(t))
        for t, c in (("orders", "o_custkey"), ("customer", "c_custkey")):
            eng.analyze_join_column(t, c)
        est = eng.estimate_join_keys("orders", "o_custkey", "customer", "c_custkey")
        na = spark.table(eng.qualified("orders")).select("o_custkey").distinct().count()
        nb = spark.table(eng.qualified("customer")).select("c_custkey").distinct().count()
        ov = (
            spark.table(eng.qualified("orders"))
            .select(F.col("o_custkey").alias("k"))
            .intersect(
                spark.table(eng.qualified("customer")).select(
                    F.col("c_custkey").cast("bigint").alias("k")
                )
            )
            .count()
        )
        assert abs(est["keys_a"] - na) <= 0.05 * na
        assert abs(est["keys_b"] - nb) <= 0.05 * nb
        assert abs(est["keys_overlap"] - ov) <= 0.05 * est["keys_union"] + 1
        try:
            eng.estimate_join_keys("orders", "o_orderkey", "customer", "c_custkey")
            raise AssertionError("missing HLL sketch must raise")
        except ValueError:
            pass
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(root, ignore_errors=True)
