"""Benchmark decontamination ([EXT], SURVEY §2.10).

Pretraining corpora must not contain the evaluation sets they will be
judged on. The standard defense is n-gram overlap: a corpus document
is contaminated when it shares at least ``min_overlap`` distinct
token n-grams with any benchmark document.

Scale shape: the benchmark side is SMALL by construction (an eval set,
not a corpus), so its distinct shingle set broadcasts; the corpus side
explodes to (doc, shingle) rows and the overlap count is one hash
aggregate keyed on doc. No corpus-side self-join, no shuffle of the
benchmark, one exchange on doc id — the same layout tf-idf uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> F.Column:
    return F.split(F.lower(F.col(text_col)), r"\s+")


def _shingles_over_tokens(toks_col: str, n: int) -> F.Column:
    """Distinct lowercase token n-grams from a MATERIALIZED token-array
    column (pure projection — the HOF stays inside codegen). The token
    column must be projected first: a split() expression referenced
    inside the lambda is re-evaluated once PER GRAM (no CSE across the
    lambda boundary), turning O(n) shingling into O(n²) re-splitting."""
    toks = F.col(toks_col)
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda x, i: F.concat_ws(
            " ", x, *[F.element_at(toks, i + j + 1) for j in range(1, n)]
        ),
    )
    return F.array_distinct(grams)


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_overlap: int = 5,
) -> DataFrame:
    """Per corpus document: how many distinct ``n``-gram shingles it
    shares with the benchmark's union shingle set, and whether that
    crosses ``min_overlap`` (→ drop it before training).

    Returns (id_col, n_overlap, contaminated) for every corpus row.
    """
    bench_shingles = (
        benchmark.select(_tokens(text_col).alias("__toks"))
        .select(F.explode(_shingles_over_tokens("__toks", n)).alias("sh"))
        .distinct()
    )
    corpus_shingles = corpus.select(
        F.col(id_col).alias("doc"), _tokens(text_col).alias("__toks")
    ).select("doc", F.explode(_shingles_over_tokens("__toks", n)).alias("sh"))
    counts = (
        corpus_shingles.join(F.broadcast(bench_shingles), "sh")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(counts.withColumnRenamed("doc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_overlap: int = 5,
) -> DataFrame:
    """The corpus minus contaminated documents (left-anti against the
    flagged ids — the report's equi-join layout, nothing extra)."""
    flagged = contamination_report(
        corpus, benchmark, id_col, text_col, n=n, min_overlap=min_overlap
    ).filter(F.col("contaminated"))
    return corpus.join(flagged.select(id_col), id_col, "left_anti")
