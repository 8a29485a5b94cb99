"""Within-session A/B: old (two tokenize->score subtrees) vs new
(fused token counts + pinned score matrix) for x4_langid_trained and
pipeline_classifier_eval, plus per-phase attribution of the new shape.
Usage: python scripts/r14_nb_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _isolate  # noqa: E402
from cbts_datalake_synnex_spark.operators import classify, sampling  # noqa: E402
from cbts_datalake_synnex_spark.session import get_spark  # noqa: E402
from cbts_datalake_synnex_spark.workload.base import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def old_classifier_eval(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    seed = sampling.hash_sample(docs, "doc_id", 0.5, salt="nb")
    test = docs.join(seed.select("doc_id"), "doc_id", "left_anti")
    model = classify.nb_train(seed, text_col="text", label_col="lang")
    truth = test.select("doc_id", F.col("lang").alias("true_label"))
    preds = classify.nb_score(test, model, id_col="doc_id", text_col="text")
    acc = preds.join(truth, "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum((F.col("pred_label") == F.col("true_label")).cast("int"))
        .cast("bigint").alias("n_correct"),
    )
    en = (
        classify.nb_score_all(test, model, id_col="doc_id", text_col="text")
        .filter(F.col("label") == "en")
        .join(truth, "doc_id")
        .select("score", (F.col("true_label") == "en").cast("int").alias("y"))
    )
    auc = classify.binary_auc(en, "score", "y")
    ntr = seed.agg(F.count(F.lit(1)).cast("bigint").alias("n_train"))
    return (
        ntr.crossJoin(acc).crossJoin(auc)
        .select(
            "n_train", "n_test",
            F.round(F.col("n_correct") / F.col("n_test"), 6).alias("accuracy"),
            F.col("auc").alias("auc_en"), "n_pos", "n_neg",
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
    return min(ts)


def main() -> None:
    spark = get_spark("r14_nb_ab")
    from cbts_datalake_synnex_spark.workload.llm import (
        pipeline_classifier_eval,
        x4_langid_trained,
    )

    time_fn(spark, "classifier_eval OLD", lambda: old_classifier_eval(spark, SF))
    time_fn(spark, "classifier_eval NEW", lambda: pipeline_classifier_eval(spark, SF))

    # phase attribution of the new classifier shape
    from cbts_datalake_synnex_spark.operators.sampling import _BUCKETS, _hash_bucket

    def phases():
        docs = load_table(spark, SF, "documents")
        in_seed = _hash_bucket("doc_id", "nb") < int(0.5 * _BUCKETS)
        base = docs.select("doc_id", "lang", "text", in_seed.alias("__in_seed"))
        t0 = time.perf_counter()
        cnt = (
            classify._tokens(base, "text", "doc_id", "lang", "__in_seed")
            .groupBy("doc_id", "lang", "__in_seed", "token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .cache()
        )
        cnt.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        seed_docs = base.filter(F.col("__in_seed"))
        test_docs = base.filter(~F.col("__in_seed"))
        train_counts = (
            cnt.filter(F.col("__in_seed")).groupBy("lang", "token").agg(F.sum("cnt").alias("c"))
        )
        model = classify.nb_train(seed_docs, "text", "lang", token_counts=train_counts)
        term = cnt.filter(~F.col("__in_seed")).select("doc_id", "token", "cnt")
        scored = classify.nb_score_all(
            test_docs, model, id_col="doc_id", text_col="text", term=term
        ).localCheckpoint(eager=True)
        t2 = time.perf_counter()
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
        t3 = time.perf_counter()
        ntr = seed_docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_train"))
        out = ntr.crossJoin(acc).crossJoin(auc).select(
            "n_train", "n_test",
            F.round(F.col("n_correct") / F.col("n_test"), 6).alias("accuracy"),
            F.col("auc").alias("auc_en"), "n_pos", "n_neg",
        )
        out.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        print(
            f"  phases: cnt={t1-t0:.2f} scored_pin={t2-t1:.2f} "
            f"auc_build(binary_auc ctor incl. its eager pin)={t3-t2:.2f} final={t4-t3:.2f}",
            flush=True,
        )
        _isolate(spark)

    for _ in range(2):
        phases()

    time_fn(spark, "langid NEW", lambda: x4_langid_trained(spark, SF))
    spark.stop()


if __name__ == "__main__":
    main()
