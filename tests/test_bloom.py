"""Bloom filter (round 12): the zero-false-negative guarantee, union
merge (Bloom OR = position-set union), forced false positives at a
saturating fill, and the engine's persisted analyze/probe lifecycle
including the empty-filter and missing-filter edges."""

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators import sketches
from cbts_datalake_synnex_spark.workload.base import load_table


def _items(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "item string")


def test_bloom_zero_false_negatives(spark):
    present = [f"k{i}" for i in range(200)]
    bits = sketches.bloom_build(_items(spark, present), "item", n_bits=1024, k=3)
    got = {
        r["item"]: r["bloom_member"]
        for r in sketches.bloom_probe(
            bits, _items(spark, present), "item", n_bits=1024, k=3
        ).collect()
    }
    assert len(got) == 200 and all(got.values())


def test_bloom_tiny_filter_forces_false_positives(spark):
    # 3*64 hashes into 32 bits: fill ~1, so absent keys collide
    present = _items(spark, [f"p{i}" for i in range(64)])
    absent = _items(spark, [f"a{i}" for i in range(64)])
    bits = sketches.bloom_build(present, "item", n_bits=32, k=3)
    verdicts = sketches.bloom_probe(bits, absent, "item", n_bits=32, k=3).collect()
    assert any(r["bloom_member"] for r in verdicts), (
        "no false positive at fill≈1 — hashing broken?"
    )


def test_bloom_wide_filter_separates(spark):
    # 3*50 hashes into 2^16 bits: fill ~0.002, FPR ~1e-8 — absent keys all reject
    present = _items(spark, [f"p{i}" for i in range(50)])
    absent = _items(spark, [f"a{i}" for i in range(50)])
    bits = sketches.bloom_build(present, "item", n_bits=1 << 16, k=3)
    verdicts = sketches.bloom_probe(
        bits, absent, "item", n_bits=1 << 16, k=3
    ).collect()
    assert not any(r["bloom_member"] for r in verdicts)


def test_bloom_union_is_position_set_union(spark):
    a = _items(spark, [f"x{i}" for i in range(30)])
    b = _items(spark, [f"y{i}" for i in range(30)])
    kw = dict(item_col="item", n_bits=512, k=3)
    ba = sketches.bloom_build(a, **kw)
    bb = sketches.bloom_build(b, **kw)
    merged = {r["pos"] for r in sketches.bloom_union(ba, bb).collect()}
    direct = {
        r["pos"] for r in sketches.bloom_build(a.unionAll(b), **kw).collect()
    }
    assert merged == direct
    # and the merged filter answers membership for BOTH shards
    got = sketches.bloom_probe(
        sketches.bloom_union(ba, bb), a.unionAll(b), "item", n_bits=512, k=3
    ).collect()
    assert all(r["bloom_member"] for r in got)


def test_engine_membership_lifecycle(spark, sf_dir):
    import shutil
    import tempfile
    import uuid

    from cbts_datalake_synnex_spark.engine import LakeEngine

    root = tempfile.mkdtemp(prefix="blm_")
    db = f"blm_{uuid.uuid4().hex[:8]}"
    eng = LakeEngine(spark, root, database=db)
    try:
        load_table(spark, sf_dir, "orders").write.saveAsTable(
            eng.qualified("orders")
        )
        eng.analyze_membership("orders", "o_custkey", n_bits=1 << 16, k=4)
        # every key that placed an order probes member (FN = 0)
        cust = load_table(spark, sf_dir, "customer")
        verdicts = eng.probe_membership("orders", "o_custkey", cust, "c_custkey")
        truth = {
            r["c_custkey"]
            for r in load_table(spark, sf_dir, "orders")
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
            .collect()
        }
        rows = verdicts.collect()
        assert all(r["bloom_member"] for r in rows if r["c_custkey"] in truth)
        # missing filter refused
        try:
            eng.probe_membership("orders", "o_orderkey", cust, "c_custkey")
            raise AssertionError("missing membership filter must raise")
        except ValueError:
            pass
        # empty filter (all-NULL column) answers False everywhere
        spark.createDataFrame([(None,)], "v bigint").write.saveAsTable(
            eng.qualified("nulls")
        )
        eng.analyze_membership("nulls", "v", n_bits=1024, k=3)
        empty = eng.probe_membership("nulls", "v", cust, "c_custkey").collect()
        assert empty and not any(r["bloom_member"] for r in empty)
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(root, ignore_errors=True)
