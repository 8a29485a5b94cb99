"""Variant A/B for pipeline_classifier_eval and x4_langid_trained:
V0 old two-subtree, V1 scored pinned via localCheckpoint (plain
tokenize), V2 scored pinned via cache, V3 fused cnt + cache (current),
V4 fused cnt WITHOUT cache + scored cache.
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
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload.base import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def _finish(seed_docs, test_docs, scored):
    truth = test_docs.select("doc_id", F.col("lang").alias("true_label"))
    preds = classify.nb_argmax(scored, "doc_id")
    acc = preds.join(truth, "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum((F.col("pred_label") == F.col("true_label")).cast("int"))
        .cast("bigint").alias("n_correct"),
    )
    en = (
        scored.filter(F.col("label") == "en")
        .join(truth, "doc_id")
        .select("score", (F.col("true_label") == "en").cast("int").alias("y"))
    )
    auc = classify.binary_auc(en, "score", "y")
    ntr = seed_docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_train"))
    return (
        ntr.crossJoin(acc).crossJoin(auc)
        .select(
            "n_train", "n_test",
            F.round(F.col("n_correct") / F.col("n_test"), 6).alias("accuracy"),
            F.col("auc").alias("auc_en"), "n_pos", "n_neg",
        )
    )


def v_pin_only(spark, sf_dir, pin):
    docs = load_table(spark, sf_dir, "documents")
    in_seed = _hash_bucket("doc_id", "nb") < int(0.5 * _BUCKETS)
    base = docs.select("doc_id", "lang", "text", in_seed.alias("__in_seed"))
    seed_docs = base.filter(F.col("__in_seed"))
    test_docs = base.filter(~F.col("__in_seed"))
    model = classify.nb_train(seed_docs, text_col="text", label_col="lang")
    scored = classify.nb_score_all(test_docs, model, id_col="doc_id", text_col="text")
    scored = scored.localCheckpoint(eager=True) if pin == "ckpt" else scored.cache()
    return _finish(seed_docs, test_docs, scored)


def v_fused(spark, sf_dir, cache_cnt, pin):
    docs = load_table(spark, sf_dir, "documents")
    in_seed = _hash_bucket("doc_id", "nb") < int(0.5 * _BUCKETS)
    base = docs.select("doc_id", "lang", "text", in_seed.alias("__in_seed"))
    cnt = (
        classify._tokens(base, "text", "doc_id", "lang", "__in_seed")
        .groupBy("doc_id", "lang", "__in_seed", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if cache_cnt:
        cnt = cnt.cache()
    seed_docs = base.filter(F.col("__in_seed"))
    test_docs = base.filter(~F.col("__in_seed"))
    train_counts = (
        cnt.filter(F.col("__in_seed")).groupBy("lang", "token").agg(F.sum("cnt").alias("c"))
    )
    model = classify.nb_train(seed_docs, "text", "lang", token_counts=train_counts)
    term = cnt.filter(~F.col("__in_seed")).select("doc_id", "token", "cnt")
    scored = classify.nb_score_all(test_docs, model, id_col="doc_id", text_col="text", term=term)
    scored = scored.localCheckpoint(eager=True) if pin == "ckpt" else scored.cache()
    return _finish(seed_docs, test_docs, scored)


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
    spark = get_spark("r14_nb_ab2")
    time_fn(spark, "V1 pin-ckpt plain", lambda: v_pin_only(spark, SF, "ckpt"))
    time_fn(spark, "V2 pin-cache plain", lambda: v_pin_only(spark, SF, "cache"))
    time_fn(spark, "V3 fused cache+ckpt", lambda: v_fused(spark, SF, True, "ckpt"))
    time_fn(spark, "V4 fused nocache+cache", lambda: v_fused(spark, SF, False, "cache"))
    time_fn(spark, "V5 fused nocache+ckpt", lambda: v_fused(spark, SF, False, "ckpt"))
    spark.stop()


if __name__ == "__main__":
    main()
