"""Langid variants A/B:
L0 old (two tokenize subtrees, model pinned),
L1 fused + model pins + cnt uncached,
L2 fused + NO model pins + cnt uncached (single action, exchange reuse),
L3 fused + no model pins + cnt cached.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _isolate  # noqa: E402
from cbts_datalake_synnex_spark.operators import classify, sampling  # noqa: E402
from cbts_datalake_synnex_spark.operators.sampling import _BUCKETS, _hash_bucket  # noqa: E402
from cbts_datalake_synnex_spark.operators.text import LANG_ORDER  # noqa: E402
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload.base import load_table  # noqa: E402
from cbts_datalake_synnex_spark.operators.text import LANG_MARKERS  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def _base(spark, sf_dir, with_seed_col):
    raw = load_table(spark, sf_dir, "documents")
    idx = (F.col("doc_id") % 5 + 1).cast("int")
    lang_arr = F.array(*[F.lit(l) for l in LANG_ORDER])
    mark_arr = F.array(*[F.lit(" ".join(LANG_MARKERS[l])) for l in LANG_ORDER])
    mk = F.element_at(mark_arr, idx)
    docs = raw.select(
        "doc_id",
        F.element_at(lang_arr, idx).alias("lang"),
        F.concat_ws(" ", F.col("text"), mk, mk).alias("text"),
    )
    chars = docs.select(
        "doc_id", "lang",
        F.filter(F.split(F.translate(F.col("text"), " ", "_"), ""), lambda c: c != F.lit("")).alias("ch"),
    )
    n = F.size(F.col("ch"))
    gram_arr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(F.element_at(F.col("ch"), i), F.element_at(F.col("ch"), i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cols = ["doc_id", "lang", F.array_join(gram_arr, " ").alias("grams")]
    if with_seed_col:
        cols.append((_hash_bucket("doc_id", "lid") < int(0.5 * _BUCKETS)).alias("__in_seed"))
    return chars.select(*cols).localCheckpoint(eager=True)


def l0_old(spark, sf_dir):
    base = _base(spark, sf_dir, False)
    seed = sampling.hash_sample(base, "doc_id", 0.5, salt="lid")
    test = base.join(seed.select("doc_id"), "doc_id", "left_anti")
    model = classify.nb_train(seed, text_col="grams", label_col="lang")
    model = {k: v.localCheckpoint(eager=True) for k, v in model.items()}
    preds = classify.nb_score(test, model, id_col="doc_id", text_col="grams")
    hit = (F.col("pred_label") == F.col("lang")).cast("int")
    return (
        preds.join(test.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(hit).cast("bigint").alias("n_correct"),
            F.round(F.avg(hit), 6).alias("accuracy"),
        )
    )


def l_fused(spark, sf_dir, pin_model, cache_cnt):
    base = _base(spark, sf_dir, True)
    cnt = (
        classify._tokens(base, "grams", "doc_id", "lang", "__in_seed")
        .groupBy("doc_id", "lang", "__in_seed", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if cache_cnt:
        cnt = cnt.cache()
    seed_docs = base.filter(F.col("__in_seed"))
    test = base.filter(~F.col("__in_seed"))
    train_counts = (
        cnt.filter(F.col("__in_seed")).groupBy("lang", "token").agg(F.sum("cnt").alias("c"))
    )
    model = classify.nb_train(seed_docs, "grams", "lang", token_counts=train_counts)
    if pin_model:
        model = {k: v.localCheckpoint(eager=True) for k, v in model.items()}
    term = cnt.filter(~F.col("__in_seed")).select("doc_id", "token", "cnt")
    preds = classify.nb_score(test, model, id_col="doc_id", text_col="grams", term=term)
    hit = (F.col("pred_label") == F.col("lang")).cast("int")
    return (
        preds.join(test.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(hit).cast("bigint").alias("n_correct"),
            F.round(F.avg(hit), 6).alias("accuracy"),
        )
    )


def time_fn(spark, label, fn, reps=REPS):
    fn().write.format("noop").mode("overwrite").save()
    _isolate(spark)
    ts = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{label} {i}")
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
        _isolate(spark)
    print(f"{label}: min={min(ts)} runs={ts}", flush=True)


def main() -> None:
    spark = get_spark("r14_langid_ab")
    time_fn(spark, "L0 old", lambda: l0_old(spark, SF))
    time_fn(spark, "L1 fused pin+nocache", lambda: l_fused(spark, SF, True, False))
    time_fn(spark, "L2 fused nopin+nocache", lambda: l_fused(spark, SF, False, False))
    time_fn(spark, "L3 fused nopin+cache", lambda: l_fused(spark, SF, False, True))
    spark.stop()


if __name__ == "__main__":
    main()
