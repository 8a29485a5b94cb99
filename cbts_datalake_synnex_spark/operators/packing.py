"""Sequence packing for LLM training batches ([EXT], SURVEY §2.10).

Pretraining pipelines concatenate documents in a fixed order and chunk
the stream into context-window-sized sequences ("concat-then-chunk"
packing). The distributed form here assigns each document to the chunk
(bin) where its first token lands: an exclusive running token count
within each shard, integer-divided by the token budget.

Scale shape: ONE shuffle on the shard key (the window partition).
The running sum is a partitioned window — never a global order-by —
so shards pack independently exactly as a 1000-executor job would
want. Deterministic: (shard, order key) fully defines the packing,
independent of physical partitioning (same property as
``operators/sampling.py``'s hash sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# BPE-ish token estimate — MUST stay in sync with operators/text.py
# token_counts (letter-runs / digit-runs / single symbols).
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def token_pack(
    df: DataFrame,
    text_col: str,
    shard_col: str,
    order_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row a ``bin_id`` per concat-then-chunk packing.

    Within each ``shard_col`` group, rows are laid out in ``order_col``
    order; ``bin_id = floor(exclusive_cumulative_tokens / budget)``.
    Adds ``tokens`` (BPE-ish estimate), ``start_tok`` (offset of the
    row's first token in the shard stream) and ``bin_id``.
    """
    tokens = F.regexp_count(F.col(text_col), F.lit(_BPE_PATTERN)).cast("bigint")
    w = (
        W.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    with_tok = df.withColumn("tokens", tokens)
    start = F.coalesce(F.sum("tokens").over(w), F.lit(0)).cast("bigint")
    return with_tok.withColumn("start_tok", start).withColumn(
        "bin_id", F.floor(F.col("start_tok") / budget).cast("bigint")
    )


def pack_summary(packed: DataFrame, shard_col: str) -> DataFrame:
    """Per-(shard, bin) roll-up: document count and token mass. The
    downstream writer would emit one training sequence per bin."""
    return packed.groupBy(shard_col, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("bin_tokens"),
    )


def ffd_pack(
    df: DataFrame,
    text_col: str,
    shard_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """First-fit-decreasing bin packing within each shard — the
    padding-efficient alternative to `token_pack` when documents must
    NOT be split across training sequences (instruction tuning,
    contrastive pairs): sort the shard's documents by token count
    descending, place each into the first bin with room; a document
    alone wider than the budget gets its own (flagged) bin.

    Scale shape: packing is inherently sequential PER SHARD, so the
    greedy loop runs inside one `applyInPandas` group per shard — the
    declared §2.9 escape hatch — after ONE shuffle on the shard key;
    bin state is O(bins) per shard, the classic FFD ≤ (11/9)·OPT + 6/9
    bound caps the output. Shard count is the parallelism lever
    exactly as in `epoch_shuffle`.

    Deterministic: (tokens desc, id asc) ordering pins the greedy
    trace. Adds ``tokens``, ``bin_id`` (per shard), ``oversize``.
    """
    import pandas as pd

    tokens = F.regexp_count(F.col(text_col), F.lit(_BPE_PATTERN)).cast("bigint")
    with_tok = df.withColumn("tokens", tokens)
    id_type = df.schema[id_col].dataType.simpleString()
    shard_type = df.schema[shard_col].dataType.simpleString()
    out_schema = (
        f"{shard_col} {shard_type}, {id_col} {id_type}, tokens bigint, "
        "bin_id bigint, oversize boolean"
    )

    import numpy as np

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["tokens", id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        # first-fit over a preallocated numpy capacity array: the
        # per-doc "first bin with room" scan runs in C (argmax over a
        # bool mask), not a Python loop over bins — the difference
        # between O(n·bins) interpreted and O(n·bins) vectorized is
        # ~100× at sf1 shard sizes.
        caps = np.empty(len(pdf), dtype=np.int64)
        n_bins = 0
        assign: list[int] = []
        oversize: list[bool] = []
        for t in pdf["tokens"]:
            t = int(t)
            if t > budget:
                # sentinel capacity -1: an oversize bin never admits
                # another document (a zero-token doc satisfies
                # `live >= 0` against a cap-0 bin, which would mix
                # oversize=true/false rows in one bin).
                caps[n_bins] = -1
                n_bins += 1
                assign.append(n_bins - 1)
                oversize.append(True)
                continue
            live = caps[:n_bins]
            fit = live >= t
            b = int(np.argmax(fit)) if n_bins else 0
            if n_bins and fit[b]:
                caps[b] = live[b] - t
                assign.append(b)
            else:
                caps[n_bins] = budget - t
                n_bins += 1
                assign.append(n_bins - 1)
            oversize.append(False)
        return pd.DataFrame(
            {
                shard_col: pdf[shard_col],
                id_col: pdf[id_col],
                "tokens": pdf["tokens"],
                "bin_id": assign,
                "oversize": oversize,
            }
        )

    return (
        with_tok.select(shard_col, id_col, "tokens")
        .groupBy(shard_col)
        .applyInPandas(pack, schema=out_schema)
    )


def fim_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rate: float = 0.5,
    salt: str = "fim",
) -> DataFrame:
    """X6 — fill-in-the-middle example construction (Bavarian et al.
    2022, arXiv:2207.14255): split a ``rate`` fraction of documents
    into (prefix, middle, suffix) at two deterministic character
    positions, tagging each example PSM or SPM (the paper's 50/50
    mode mix); the rest pass through as plain examples. The FIM
    transform is applied at the DOCUMENT level before packing, exactly
    as published.

    Determinism: selection, both split points, and the mode all derive
    from md5(id:tag) — no RNG state, reproducible on any engine and
    any partitioning (the corpus-shaping discipline of
    ``operators/sampling.py``). Split points are uniform over
    [0, len] and ordered, so any of the three parts may be empty
    (the published construction allows it). Pure projection: no
    shuffle, no UDF; whole-stage codegen end to end.

    Returns (id_col, fim, mode, a, b, prefix, middle, suffix,
    lossless) where ``lossless`` certifies prefix||middle||suffix
    reassembles the original text.
    """

    def _h(tag: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(tag))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")

    text = F.col(text_col)
    ln = F.length(text)
    fim = (_h(salt) % 1000000) < int(round(rate * 1000000))
    p1, p2 = _h(salt + "-a") % (ln + 1), _h(salt + "-b") % (ln + 1)
    a = F.when(fim, F.least(p1, p2)).otherwise(ln)
    b = F.when(fim, F.greatest(p1, p2)).otherwise(ln)
    prefix = text.substr(F.lit(1), a)
    middle = text.substr(a + 1, b - a)
    suffix = text.substr(b + 1, ln - b)
    mode = F.when(~fim, F.lit("plain")).otherwise(
        F.when(_h(salt + "-m") % 2 == 0, F.lit("psm")).otherwise(F.lit("spm"))
    )
    return df.select(
        F.col(id_col),
        fim.alias("fim"),
        mode.alias("mode"),
        a.cast("bigint").alias("a"),
        b.cast("bigint").alias("b"),
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
        (F.concat(prefix, middle, suffix) == text).alias("lossless"),
    )


def chat_assembly(
    df: DataFrame,
    conv_col: str,
    order_col: str,
    text_col: str,
    user_tag: str = "<|user|>",
    asst_tag: str = "<|assistant|>",
) -> DataFrame:
    """X6 — SFT conversation assembly with loss masking: order each
    conversation's turns, render them into the chat template
    (alternating roles, 0-based even positions = user), and report the
    span the loss actually trains on (assistant turns only — the
    instruction-tuning convention of masking user/context tokens out
    of the objective).

    One (conversation)-keyed hash aggregate; in-group ordering is an
    `array_sort` over (order, text) structs — deterministic because
    the order key is unique per conversation, and window-free (the
    `embedding_standardize` collect discipline). Aggregate state is
    ONE conversation's turns — bounded by the chat-context contract,
    never corpus-sized. Everything downstream of the collect is a
    codegen projection.

    Returns (conv_col, n_turns, total_chars, trainable_chars, sha —
    sha256 of the assembled template, the strong cross-engine check).
    """
    st = F.struct(F.col(order_col).alias("o"), F.col(text_col).alias("t"))
    g = df.groupBy(conv_col).agg(F.array_sort(F.collect_list(st)).alias("__ts"))
    idx = F.sequence(F.lit(0), F.size("__ts") - 1)
    turn_at = lambda i: F.element_at(F.col("__ts"), i + 1).getField("t")  # noqa: E731
    rendered = F.transform(
        idx,
        lambda i: F.concat(
            F.when(i % 2 == 0, F.lit(user_tag)).otherwise(F.lit(asst_tag)),
            F.lit("\n"),
            turn_at(i),
        ),
    )
    assembled = F.array_join(rendered, "\n")
    trainable = F.aggregate(
        idx,
        F.lit(0).cast("long"),
        lambda a, i: a + F.when(i % 2 == 1, F.length(turn_at(i)).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return g.select(
        F.col(conv_col),
        F.size("__ts").cast("bigint").alias("n_turns"),
        F.length(assembled).cast("bigint").alias("total_chars"),
        trainable.alias("trainable_chars"),
        F.sha2(assembled, 256).alias("sha"),
    )


def preference_pairs(
    df: DataFrame,
    prompt_col: str,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """X6 — DPO/RLHF preference-pair assembly (Rafailov et al. 2023,
    arXiv:2305.18290 — direct preference optimization trains on
    (prompt, chosen, rejected) triples): per prompt, pair the
    best-scored candidate against the worst-scored one, reporting the
    reward margin the pair carries. The reference has no preference
    lane (its pipeline stops at curated tables); this is the [EXT]
    step that turns a scored candidate pool into a DPO training set.

    Deterministic extremes: chosen = (max score, tie -> lowest id),
    rejected = (min score, tie -> lowest id), both computed as ONE
    aggregation pass over struct-ordered ``min`` (Spark orders structs
    lexicographically by field, so ``min(struct(-score, id))`` is
    exactly "max score then min id" — the NEGATION lands on the score,
    which is numeric by contract, never on the id, so string/date/any
    orderable id type works; sign-flip is exact for floats, and
    ``-0.0`` compares equal to ``0.0`` so the tie still falls to the
    id) — no window over the candidate
    pool, no join; struct extremes plan as SortAggregate (struct
    min/max is sort-based in Spark), but the partial/final split is
    intact, so map-side combine still does the heavy lifting and the
    shuffle carries two structs + a count per prompt. Zero-margin prompts
    (all candidates tied, including single-candidate prompts where
    chosen == rejected) are dropped: a DPO pair with no preference
    signal is degenerate.

    Returns (prompt_col, chosen_id, rejected_id, chosen_score,
    rejected_score, margin, n_candidates). Scores should arrive
    pre-rounded on the caller's grid so the extremes are
    engine-stable.

    NULL scores carry no preference signal and are excluded up front
    (ADVICE r10): NULL struct fields sort FIRST in Spark's struct
    ordering, so an unfiltered NULL-score candidate would win the
    ``min(struct(-score, id))`` extreme and emit NULL
    chosen_score/margin. ``n_candidates`` counts scored candidates
    only.
    """
    df = df.filter(F.col(score_col).isNotNull())
    g = df.groupBy(prompt_col).agg(
        F.min(
            F.struct((-F.col(score_col)).alias("ns"), F.col(id_col).alias("pid"))
        ).alias("__hi"),
        F.min(F.struct(F.col(score_col).alias("s"), F.col(id_col).alias("pid"))).alias(
            "__lo"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
    )
    margin = F.round((-F.col("__hi.ns")) - F.col("__lo.s"), 6)
    return (
        g.select(
            F.col(prompt_col),
            F.col("__hi.pid").alias("chosen_id"),
            F.col("__lo.pid").alias("rejected_id"),
            (-F.col("__hi.ns")).alias("chosen_score"),
            F.col("__lo.s").alias("rejected_score"),
            margin.alias("margin"),
            "n_candidates",
        )
        .filter(F.col("margin") > 0)
    )


def span_corrupt(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: int = 8,
    span_len: int = 3,
    rate_pct: int = 30,
    salt: str = "t5",
    round_dp: int = 6,
) -> DataFrame:
    """X6 — T5-style SPAN CORRUPTION example construction (Raffel et
    al. 2020, arXiv:1910.10683 §3.1.4 — denoising objectives train on
    (corrupted input with sentinels, target of masked spans)): the
    remaining classic beside FIM (`fim_split`) and the chat/preference
    assemblers.

    Deterministic blockwise variant: tokens partition into fixed
    ``block``-sized blocks; block ``j`` masks its first ``span_len``
    tokens iff the md5 gate ``hash(salt:doc:j) % 100 < rate_pct`` fires
    and the span fits (``j·block + span_len ≤ n``) — spans are
    non-overlapping BY CONSTRUCTION, which is what makes the whole
    op a pure projection (T5's sampled span starts need a sequential
    overlap scan). Sentinels carry the BLOCK ORDINAL
    (``<extra_id_j>`` — sparse but unique and order-preserving; dense
    renumbering is a trivial post-map), so no prefix count is needed
    anywhere. Masking is expectation ``rate_pct/100 · span_len/block``
    of tokens, zero RNG, idempotent, and every output character is
    restatable in ANSI SQL (the md5 idiom).

    Returns (id, corrupted, target, n_spans, masked_share):
    ``corrupted`` replaces each masked span with its sentinel;
    ``target`` is ``<extra_id_j> span tokens ...`` per masked block in
    document order, closed with ``<extra_id_end>`` (empty when no
    span fired). Lossless: original = corrupted with each sentinel
    substituted by its target span (golden-tested).
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    doc = F.col(id_col)

    def gate(j):
        h = F.md5(F.concat_ws(":", F.lit(salt), doc.cast("string"), j.cast("string")))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 100 < F.lit(
            int(rate_pct)
        )

    def masked(j):
        return gate(j) & (j * block + span_len <= n)

    def sentinel(j):
        return F.concat(F.lit("<extra_id_"), j.cast("string"), F.lit(">"))

    def tok_expr(t, i):
        j = F.floor(i / block).cast("bigint")
        in_span = masked(j) & (i - j * block < span_len)
        start = in_span & (i == j * block)
        return F.when(start, sentinel(j)).when(in_span, F.lit(None)).otherwise(t)

    ct = F.transform(toks, lambda t, i: tok_expr(t, i.cast("bigint")))
    corrupted = F.array_join(F.filter(ct, lambda x: x.isNotNull()), " ")
    nb = F.ceil(n / F.lit(block)).cast("bigint")
    masked_js = F.filter(
        F.sequence(F.lit(0).cast("bigint"), nb - 1), lambda j: masked(j)
    )
    tparts = F.transform(
        masked_js,
        lambda j: F.concat(
            sentinel(j),
            F.lit(" "),
            F.array_join(F.slice(toks, (j * block + 1).cast("int"), span_len), " "),
        ),
    )
    n_spans = F.size(masked_js)
    target = F.when(
        n_spans > 0,
        F.concat(F.array_join(tparts, " "), F.lit(" <extra_id_end>")),
    ).otherwise(F.lit(""))
    return df.select(
        doc,
        corrupted.alias("corrupted"),
        target.alias("target"),
        n_spans.cast("bigint").alias("n_spans"),
        F.round(n_spans * span_len / F.greatest(n, F.lit(1)), round_dp).alias(
            "masked_share"
        ),
    )


def needle_insert(
    df: DataFrame,
    id_col: str,
    text_col: str,
    salt: str = "needle",
    round_dp: int = 6,
) -> DataFrame:
    """Needle-in-a-haystack eval construction (round 12, public
    long-context eval methodology — Kamradt 2023 / Anthropic &
    OpenAI long-context reports): plant one uniquely-identifiable
    sentinel token at an md5-determined depth of each document, so a
    retrieval probe can later ask "what was the needle in doc X?"
    with a known ground truth at a known depth. Deterministic (zero
    RNG: position AND needle id derive from md5(id)), LOSSLESS
    (dropping the needle token restores the original text exactly —
    golden-tested), and a pure projection: split once, one slice
    concat, no shuffle.

    Returns (id, needle, insert_pos 1-based token index,
    depth_frac ∈ [0,1], out_text)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    pos = (h % (n + 1) + 1).cast("int")  # 1..n+1: before token `pos`
    needle = F.concat(
        F.lit("NEEDLE-"),
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 12),
    )
    out = F.array_join(
        F.concat(
            F.slice(toks, 1, pos - 1),
            F.array(needle),
            F.slice(toks, pos, n - pos + 1),
        ),
        " ",
    )
    return df.select(
        F.col(id_col),
        needle.alias("needle"),
        pos.alias("insert_pos"),
        F.round((pos - 1).cast("double") / F.greatest(n, F.lit(1)), round_dp).alias(
            "depth_frac"
        ),
        out.alias("out_text"),
    )
