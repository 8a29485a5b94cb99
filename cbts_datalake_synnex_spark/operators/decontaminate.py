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


def source_overlap_matrix(
    docs: DataFrame,
    text_col: str,
    group_col: str,
    n: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus
    groups (crawl snapshots, vendors, domains), how many distinct
    token ``n``-grams they share and the containment ratio
    ``shared / min(|A|, |B|)`` — the triage gauge run before merging
    corpora (a high-containment pair means one source largely
    duplicates the other, so naive union double-counts it).

    Scale shape: shingles are reduced to (group, md5-hash) DISTINCT
    rows first — one hash agg whose output is bounded by the union
    vocabulary, never the corpus — then the pair counts come from a
    self-equi-join on the hash where each key appears at most
    ``n_groups`` times (fan-out ≤ n_groups² per shingle, with
    n_groups the handful of sources being compared). Shuffles carry
    32-bit shingle hashes, never text; the ~|vocab|²/2³³ birthday
    collisions are identical in any engine recomputing the same hash.
    Zero-overlap pairs are kept via the group-pair grid.

    Returns (source_a, source_b, n_shingles_a, n_shingles_b, n_shared,
    containment) for every unordered group pair.
    """
    from cbts_datalake_synnex_spark.operators.dedup import _widen_narrow_input

    # hash AFTER the explode: md5 on an exploded column stays inside
    # whole-stage codegen, while the same expression inside a
    # higher-order transform() lambda is interpreted per element
    # (measured 20x slower at sf1) — the shuffled payload is still
    # (group, bigint), never gram text, because distinct() keys on the
    # hash projection
    sh = (
        _widen_narrow_input(docs)
        .select(F.col(group_col).alias("g"), _tokens(text_col).alias("__toks"))
        .select("g", F.explode(_shingles_over_tokens("__toks", n)).alias("sh"))
        .select(
            "g",
            (F.conv(F.substring(F.md5(F.col("sh")), 1, 8), 16, 10).cast("bigint")).alias("h"),
        )
        .distinct()
    )
    sizes = sh.groupBy("g").agg(F.count(F.lit(1)).alias("n_sh"))
    shared = (
        sh.alias("a")
        .join(sh.alias("b"), "h")
        .filter(F.col("a.g") < F.col("b.g"))
        .groupBy(F.col("a.g").alias("ga"), F.col("b.g").alias("gb"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    grid = (
        sizes.select(F.col("g").alias("ga"), F.col("n_sh").alias("n_shingles_a"))
        .crossJoin(
            F.broadcast(sizes.select(F.col("g").alias("gb"), F.col("n_sh").alias("n_shingles_b")))
        )
        .filter(F.col("ga") < F.col("gb"))
    )
    return (
        grid.join(shared, ["ga", "gb"], "left")
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            F.col("n_shingles_a").cast("bigint").alias("n_shingles_a"),
            F.col("n_shingles_b").cast("bigint").alias("n_shingles_b"),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("bigint").alias("n_shared"),
            F.round(
                F.coalesce(F.col("n_shared"), F.lit(0))
                / F.least(F.col("n_shingles_a"), F.col("n_shingles_b")),
                round_dp,
            ).alias("containment"),
        )
    )
