"""Lexical retrieval + rank fusion (SURVEY §2.10 [EXT] X4/X3 bridge,
round 11).

The engine's retrieval tier so far is dense-only (cosine_topk / IVF /
knn_join / retrieve→rerank). Real retrieval stacks pair a LEXICAL
ranker with the dense one and fuse: BM25 (Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond" — public) is
the standard lexical scorer, and reciprocal-rank fusion (Cormack,
Clarke & Buettcher 2009, SIGIR — public) is the standard way to merge
rankings WITHOUT comparable score scales (1/(k + rank) sums, k = 60).

Scale shape: the (doc, term, tf) table is the corpus-sized frame; the
query-term set is tiny and broadcasts into it, so candidate volume is
"docs containing a query term", never the corpus × queries product.
Document stats (dl, N, avgdl) are one hash agg + a one-row broadcast.
The per-query top-k window partitions by query over that bounded
candidate set. RRF touches only the rankers' top-k outputs (k·|queries|
rows per ranking). Determinism: ln/arithmetic rounded to a declared
grid at the score boundary, doc id as tiebreak at every cut — the
engine's cross-engine contract, so ANSI SQL restates every score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _doc_stats(docs: DataFrame, id_col: str, text_col: str):
    """((doc, term, tf), (doc, dl), one-row (n_docs, avgdl)) from a
    whitespace tokenization (empty tokens dropped, the engine-wide
    rule).

    Deliberately NOT checkpoint-pinned (r13 A/B): tf's second consumer
    (the query-df aggregate) is a broadcast-semi-filtered subtree that
    recomputes almost for free, so a forced full materialization of tf
    COSTS more than the recompute it saves (measured 2.2 vs 1.8 s on
    x4_bm25_topk at sf0.1); within one fused plan (rrf fusion sharing
    this triple across rankers) exchange reuse dedups the tf aggregate
    anyway."""
    base = docs.select(
        F.col(id_col).alias("doc"), F.split(F.col(text_col), " ").alias("toks")
    )
    dl = base.select(
        "doc",
        F.size(F.filter(F.col("toks"), lambda t: t != F.lit(""))).alias("dl"),
    )
    tf = (
        base.select("doc", F.explode("toks").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    return tf, dl, stats


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 6,
    max_doc_freq: int | float | None = None,
    doc_stats=None,
) -> DataFrame:
    """BM25 top-k documents per keyword query.

        score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
        idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))   (Lucene's
                      non-negative form of the Robertson idf)

    ``queries``: (query_id, terms array<string>). Scores are rounded
    to ``round_dp`` BEFORE ranking (ln accumulation is ≤ulp per term
    and a query has few terms — far inside the grid); rank ties break
    on the doc id. Returns (query_id, doc, score, rank ≤ k).

    ``max_doc_freq`` is the stop-term candidate cap (VERDICT r11 #2 —
    code, not prose): query terms whose document frequency exceeds it
    are dropped BEFORE the candidate join, the same skew guard as
    ``weighted_jaccard_pairs(max_doc_freq=...)``. An int is an
    absolute df bound; a float in (0, 1] is a fraction of N (0.5 is
    the classic df > N/2 stop rule). At 100 TB one stop-word in a
    query otherwise makes the candidate set corpus-sized; idf already
    downweights such terms to ~0, so dropping them changes rankings
    negligibly. The pruned term set is applied to the QUERY-term
    frame itself, so the capped term never reaches the corpus-sized
    tf join regardless of Catalyst's join order. Unset = exact BM25
    over every query term (the registry-certified contract).

    ``doc_stats``: a precomputed ``_doc_stats(docs, ...)`` triple —
    lets a fusion pipeline tokenize the corpus ONCE across rankers.
    """
    tf, dl, stats = doc_stats if doc_stats is not None else _doc_stats(docs, id_col, text_col)
    qt = queries.select(
        F.col(query_id_col).alias("query_id"), F.explode(terms_col).alias("term")
    ).distinct()
    qterms = qt.select("term").distinct()
    dfreq = tf.join(F.broadcast(qterms), "term").groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    if max_doc_freq is not None:
        if isinstance(max_doc_freq, float) and 0.0 < max_doc_freq <= 1.0:
            cap = F.col("df") <= max_doc_freq * F.col("n_docs")
        else:
            cap = F.col("df") <= float(int(max_doc_freq))
        dfreq = (
            dfreq.crossJoin(F.broadcast(stats.select("n_docs")))
            .filter(cap)
            .drop("n_docs")
        )
        qt = qt.join(F.broadcast(dfreq.select("term")), "term")
    cand = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfn = (
        F.col("tf")
        * (1.0 + float(k1))
        / (
            F.col("tf")
            + float(k1)
            * (1.0 - float(b) + float(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = cand.groupBy("query_id", "doc").agg(
        F.round(F.sum(idf * tfn), round_dp).alias("score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "doc", "score", "rank")
    )


def term_jaccard_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 5,
    round_dp: int = 6,
    doc_stats=None,
) -> DataFrame:
    """Token-set Jaccard top-k per keyword query — the deliberately
    simple second ranker for fusion demos/tests: |q ∩ d| / |q ∪ d|
    over DISTINCT doc terms. Same candidate shape as BM25 (query
    terms broadcast into the doc-term table), same rounding + id
    tiebreak. Returns (query_id, doc, score, rank ≤ k).
    ``doc_stats``: precomputed ``_doc_stats`` triple (shared tokenize)."""
    tf, _dl, _stats = doc_stats if doc_stats is not None else _doc_stats(docs, id_col, text_col)
    nd = tf.groupBy("doc").agg(F.count(F.lit(1)).cast("double").alias("nd"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.explode(terms_col).alias("term")
    ).distinct()
    nq = q.groupBy("query_id").agg(F.count(F.lit(1)).cast("double").alias("nq"))
    inter = (
        tf.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc")
        .agg(F.count(F.lit(1)).cast("double").alias("i"))
    )
    scored = (
        inter.join(nd, "doc")
        .join(F.broadcast(nq), "query_id")
        .select(
            "query_id",
            "doc",
            F.round(
                F.col("i") / (F.col("nd") + F.col("nq") - F.col("i")), round_dp
            ).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "doc", "score", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = 60,
    topk: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion: fused(q, d) = Σ_rankings 1/(k + rank),
    missing docs contribute 0 — no score normalization needed, which
    is WHY it is the standard lexical×dense merge. Inputs are
    (query_id, doc, rank) frames (any extra columns ignored); output
    (query_id, doc, rrf_score, rank ≤ topk), ties on the doc id.
    Cost: the union of the rankers' top-k outputs only — report-sized
    at any corpus scale."""
    parts = [
        r.select(
            "query_id",
            "doc",
            (F.lit(1.0) / (F.lit(float(k_const)) + F.col("rank"))).alias("c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "doc").agg(
        F.round(F.sum("c"), round_dp).alias("rrf_score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(topk))
        .select("query_id", "doc", "rrf_score", "rank")
    )
