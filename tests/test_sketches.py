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
