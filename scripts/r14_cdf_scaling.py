"""Slope proof for the round-13 two-level-CDF rewrites (judge r13 #8):
time the NEW (two-level ranks.py) vs OLD (single-partition window)
shapes of t_rfm_segments / dq_ks_test / x8_quantile_normalize at
sf0.1, sf1 (.bench_sf1) and sf10 (.bench_sf10). Results go into
SCALING.md. Usage: python scripts/r14_cdf_scaling.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import _isolate  # noqa: E402
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload import REGISTRY  # noqa: E402
from cbts_datalake_synnex_spark.workload.base import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".bench_sf1")),
    ("sf10", os.path.join(REPO, ".bench_sf10")),
]
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def rfm_old(spark, sf_dir):
    p = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    tmax = p.agg(F.max("t").alias("tmax"))
    u = (
        p.groupBy("user_id")
        .agg(
            F.max("t").alias("last_t"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .crossJoin(F.broadcast(tmax))
        .select(
            "user_id",
            (F.col("tmax") - F.col("last_t")).cast("bigint").alias("rec_us"),
            "freq",
            "cents",
        )
    )
    b = u.select(
        "user_id", "rec_us", "freq", "cents",
        F.ntile(5).over(W.orderBy(F.col("rec_us").desc(), "user_id")).alias("r"),
        F.ntile(5).over(W.orderBy("freq", "user_id")).alias("f"),
        F.ntile(5).over(W.orderBy("cents", "user_id")).alias("m"),
    )
    return b.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("cents").cast("bigint").alias("cents_total"),
        F.min("rec_us").cast("bigint").alias("min_rec_us"),
    ).select(
        F.col("r").cast("bigint"), F.col("f").cast("bigint"),
        F.col("m").cast("bigint"), "n_users", "cents_total", "min_rec_us",
    )


def ks_old(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "click")

    def dist(df, name):
        return (
            df.filter(F.col("value").isNotNull())
            .select(F.round(F.col("value"), 6).alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    u = dist(a, "ca").join(dist(b, "cb"), "v", "full").select(
        "v",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    tot = u.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    cdf = u.select(
        F.sum("ca").over(w).alias("run_ca"), F.sum("cb").over(w).alias("run_cb")
    ).crossJoin(F.broadcast(tot)).select(
        (F.col("run_ca") / F.col("n_a")).alias("fa"),
        (F.col("run_cb") / F.col("n_b")).alias("fb"),
        "n_a", "n_b",
    )
    crit = F.lit(1.3581015157406195) * F.sqrt(
        (F.col("n_a") + F.col("n_b")) / (F.col("n_a") * F.col("n_b"))
    )
    return cdf.groupBy("n_a", "n_b").agg(
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_stat")
    ).select(
        "n_a", "n_b", "ks_stat", F.round(crit, 6).alias("ks_crit"),
        (F.round(F.col("ks_stat"), 6) > F.round(crit, 6)).alias("drifted"),
    )


def qn_old(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    group_col, value_col = "source", "n_chars"
    ds = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    ws = W.partitionBy(group_col).orderBy(value_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    ns = ds.groupBy(group_col).agg(F.sum("cnt").alias("n"))
    qs = (
        ds.withColumn("cum", F.sum("cnt").over(ws))
        .join(ns, group_col)
        .select(
            group_col, F.col(value_col).alias("v"),
            ((F.col("cum") - F.col("cnt") + F.col("cnt") / 2.0) / F.col("n")).alias("q"),
        )
    )
    dg = df.groupBy(value_col).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    ng = dg.agg(F.sum("cnt").alias("n_total"))
    wg = W.orderBy(value_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    fg = (
        dg.withColumn("run_cnt", F.sum("cnt").over(wg))
        .crossJoin(F.broadcast(ng))
        .select(F.col(value_col).alias("g"), (F.col("run_cnt") / F.col("n_total")).alias("f"))
    )
    # union + single unpartitioned first-following window (the pre-r13
    # successor shape)
    probes = qs.select(group_col, "v", F.col("q").alias("key")).withColumn(
        "__is_e", F.lit(0)
    ).withColumn("__v", F.lit(None).cast("bigint"))
    entries = fg.select(
        F.col("f").alias("key"), F.lit(1).alias("__is_e"), F.col("g").alias("__v")
    ).withColumn(group_col, F.lit(None).cast("string")).withColumn(
        "v", F.lit(None).cast(df.schema[value_col].dataType)
    )
    both = probes.select("key", "__is_e", "__v", group_col, "v").unionByName(
        entries.select("key", "__is_e", "__v", group_col, "v")
    )
    wsucc = W.orderBy("key", "__is_e", "__v").rowsBetween(W.currentRow, W.unboundedFollowing)
    norm_map = (
        both.withColumn("norm", F.first("__v", ignorenulls=True).over(wsucc))
        .filter(F.col("__is_e") == 0)
        .select(group_col, F.col("v").alias(value_col), F.col("norm").alias("norm_chars"))
    )
    out = df.join(F.broadcast(norm_map), [group_col, value_col], "left")
    return out.select(
        "doc_id", "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("norm_chars").cast("bigint").alias("norm_chars"),
    )


def time_fn(spark, label, fn, reps=REPS):
    fn().write.format("noop").mode("overwrite").save()
    _isolate(spark)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
        _isolate(spark)
    print(f"{label}: min={min(ts)} runs={ts}", flush=True)


def main() -> None:
    spark = get_spark("r14_cdf_scaling")
    pairs = [
        ("t_rfm_segments", rfm_old),
        ("dq_ks_test", ks_old),
        ("x8_quantile_normalize", qn_old),
    ]
    for sf_name, sf_dir in SFS:
        if not os.path.isdir(sf_dir):
            print(f"{sf_name}: missing {sf_dir}", flush=True)
            continue
        for qname, old_fn in pairs:
            q = REGISTRY[qname]
            fn_new = q.bench_fn or q.fn
            time_fn(spark, f"{sf_name} {qname} NEW", lambda f=fn_new, d=sf_dir: f(spark, d))
            time_fn(spark, f"{sf_name} {qname} OLD", lambda f=old_fn, d=sf_dir: f(spark, d))
    spark.stop()


if __name__ == "__main__":
    main()
