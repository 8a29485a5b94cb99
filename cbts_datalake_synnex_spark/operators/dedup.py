"""Deduplication operators (SURVEY §2.10 X1/X2) — exact, MinHash-LSH,
SimHash, and exact n-gram Jaccard.

Everything here is built from JVM built-ins (``xxhash64``, ``sha2``,
array functions, hash aggregates) — no Python in the per-row path, so
the operators whole-stage-codegen and scale with the cluster:

* exact dedup      — hash-groupBy: one shuffle on a 256-bit digest.
* MinHash-LSH      — shingle → k minhashes (one aggregate) → banded
  bucket join (candidates only, never all pairs) → exact-Jaccard
  verification of candidates. The all-pairs quadratic never happens.
* SimHash          — 64 weighted-bit sums per doc (one aggregate),
  near-dup candidates via 16-bit chunk banding (pigeonhole: hamming ≤ 3
  ⇒ ≥ 1 of 4 chunks equal), verified with ``bit_count(xor)``.
* n-gram Jaccard   — exact token-set similarity via explode + equi-join
  on token; correct but O(pairs-sharing-a-token) — the LSH variants are
  the 100 TB path, this is the small-scope/oracle baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def _shingles(text_col: str, size: int) -> F.Column:
    """Word n-gram shingles as an array column; whole text if shorter.

    NOTE: referencing ``split(text)`` inside the transform lambda would
    re-split the text once PER SHINGLE (no CSE across the lambda
    boundary — see ``_hashed_shingles_over_tokens``), turning O(n)
    shingling into O(n²). Only use this form on a column that is
    already a materialized token array via ``_string_shingles_over_
    tokens``; this wrapper stays for single-expression callers."""
    toks = _tokens(text_col)
    ngrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - size),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, size)),
    )
    return F.when(F.size(toks) < F.lit(size), F.array(F.col(text_col))).otherwise(ngrams)


def _string_shingles_over_tokens(toks_col: str, text_col: str, size: int) -> F.Column:
    """String word-n-gram shingles from a MATERIALIZED token-array
    column — the CSE-safe twin of ``_shingles`` (the lambda binds an
    attribute, so tokenization runs once per row, not once per
    shingle). Whole raw text if shorter than ``size`` tokens, matching
    ``_shingles`` exactly."""
    toks = F.col(toks_col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - size + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, size)),
    )
    return F.when(n < F.lit(size), F.array(F.col(text_col))).otherwise(grams)


def _hashed_shingles_over_tokens(toks_col: str, size: int) -> F.Column:
    """64-bit-hashed word n-gram shingles — ``xxhash64`` over the size
    tokens directly, no per-shingle string materialization. Jaccard
    over hashed shingles equals string-shingle Jaccard up to 64-bit
    collisions (~n²/2⁶⁴ — irrelevant at any document size).

    ``toks_col`` MUST be a materialized (projected) token-array column,
    not an inline ``split(...)`` expression: expressions referenced
    inside higher-order-function lambdas are re-evaluated per element
    (no common-subexpression elimination across the lambda boundary),
    which turns O(n) shingling into O(n²) string splitting."""
    toks = F.col(toks_col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - size + 1),
        lambda i: F.xxhash64(*[F.element_at(toks, i + j) for j in range(size)]),
    )
    return F.when(n < F.lit(size), F.array(F.xxhash64(F.concat_ws(" ", toks)))).otherwise(grams)


# Shared threshold policy lives in operators/_util.py (ADVICE r13);
# re-exported here because the shingle operators and decontaminate
# import it under this name.
from cbts_datalake_synnex_spark.operators._util import (  # noqa: E402
    widen_narrow_input as _widen_narrow_input,
)



def _hashed_shingle_docs(df: DataFrame, id_col: str, text_col: str, size: int) -> DataFrame:
    """(doc, shs) with tokens projected FIRST so the shingle lambda
    binds an attribute (see _hashed_shingles_over_tokens)."""
    return df.select(
        F.col(id_col).alias("doc"), _tokens(text_col).alias("toks")
    ).select("doc", F.array_distinct(_hashed_shingles_over_tokens("toks", size)).alias("shs"))


def hashed_shingles(df: DataFrame, id_col: str, text_col: str, size: int = 3) -> DataFrame:
    """Public form of the (doc, shs) hashed-shingle projection — build
    it ONCE (optionally ``.cache()``) and pass to both
    ``minhash_lsh_pairs`` and ``ngram_jaccard_pairs`` via their
    ``shingles=`` parameter when running the operator and its exact
    twin over the same corpus (the verification-report pattern): the
    text is tokenized and shingled a single time instead of once per
    operator."""
    return _hashed_shingle_docs(df, id_col, text_col, size)


# ----------------------------------------------------------------------
def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """X1 — exact content dedup: keep the lowest id per content digest.

    ``sha2(concat_ws(...), 256)`` + min/count aggregate: one shuffle on
    the digest. Returns (id_col, content_hash, n_copies).
    """
    digest = F.sha2(F.concat_ws("\x1f", *content_cols), 256)
    return (
        df.groupBy(digest.alias("content_hash"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "content_hash", "n_copies")
    )


# ----------------------------------------------------------------------
def _rare_shingle_candidates(sh: DataFrame, max_doc_freq: int) -> DataFrame:
    """(doc1, doc2) pairs sharing ≥1 shingle whose document frequency is
    ≤ ``max_doc_freq`` — the skew guard for inverted-index self-joins.

    A shingle appearing in d documents contributes d·(d−1)/2 join rows;
    one stop-gram with d = 10⁶ alone produces 5·10¹¹ candidates and is
    THE way these joins die at 100 TB. Dropping grams above the df
    ceiling bounds every join key's fan-out at max_doc_freq²/2 rows.
    The df aggregate is one extra hash agg on the same (sh) key the
    join shuffles on anyway."""
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    rare = sh.join(dfreq.filter(F.col("df") <= max_doc_freq).select("sh"), "sh")
    a, b = rare.alias("a"), rare.alias("b")
    return (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_size: int = 1,
    max_doc_freq: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """X2 (exact baseline) — all pairs with token-set Jaccard ≥ threshold.

    explode(distinct shingles) → self-equi-join on shingle → per-pair
    intersection count → |A∪B| = |A|+|B|−|A∩B|. Exact, deterministic,
    oracle-checkable; cost grows with token document frequency, so at
    scale set ``max_doc_freq`` (or use ``minhash_lsh_pairs``).

    Candidate generation uses the LOSSLESS prefix filter (the
    AllPairs / PPJoin principle from the set-similarity-join
    literature): order every document's distinct shingles by ascending
    global document frequency (shingle as tiebreak — one total order
    for the whole corpus) and explode only the first
    ``n − ⌈t·n⌉ + 1`` per document into the inverted-index self-join.
    Jaccard ≥ t forces overlap ≥ ⌈t·n⌉ on BOTH sides, so any
    qualifying pair must collide inside these prefixes — recall stays
    exactly 1 while candidates shrink superlinearly (rare-first
    ordering makes prefix shingles nearly unique). Survivors are
    verified with exact full-array Jaccard, so precision is 1 and
    scores are identical to a naive all-shared-shingle join. This is
    what keeps the exact join alive at 100 TB: candidate volume tracks
    the near-duplicate count, not the stop-gram document frequency.

    ``max_doc_freq``: additionally drop shingles shared by more than
    this many docs before ranking (approximate — loses only pairs
    whose every common shingle is ubiquitous; bounds the worst-case
    fan-out of a single prefix shingle at max_doc_freq²/2).
    """
    from pyspark.sql import Window

    # Shingles are xxhash64-hashed (8-byte join/intersect keys instead
    # of n-gram strings — identical Jaccard up to 64-bit collisions,
    # same equivalence the MinHash path documents); halves verify cost
    # and shrinks every exchange. ``shingles`` lets a caller running
    # this op alongside its LSH twin share one (cached) projection.
    # The shingle projection feeds candidate generation AND both exact-
    # verify array sides; left lazy it re-runs tokenization once per
    # consumer. Pin it (localCheckpoint — reclaimed with the plan,
    # never a session-lifetime persist) and widen narrow inputs before
    # the CPU-bound tokenize: measured 2.2× on the sf1 fr corpus. A
    # caller-provided ``shingles`` frame is trusted to be pinned
    # already (that's its contract).
    shs_arr = (
        shingles
        if shingles is not None
        else _hashed_shingle_docs(
            _widen_narrow_input(df), id_col, text_col, shingle_size
        ).localCheckpoint()
    )
    sh = shs_arr.select("doc", F.size("shs").alias("n"), F.explode("shs").alias("sh"))
    # Document frequency as a window over the sh partition — one
    # exchange on sh, no separate groupBy+join round trip.
    withdf = sh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("sh")))
    if max_doc_freq is not None:
        withdf = withdf.filter(F.col("df") <= max_doc_freq)
    ranked = withdf.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("doc").orderBy(F.asc("df"), F.asc("sh"))),
    )
    prefix_len = F.col("n") - F.ceil(F.lit(float(threshold)) * F.col("n")) + 1
    prefix = ranked.filter(F.col("rn") <= prefix_len).select("doc", "n", "sh")
    a, b = prefix.alias("a"), prefix.alias("b")
    # Length filter (also lossless): J ≥ t ⟹ t·|A| ≤ |B| ≤ |A|/t.
    t_lit = F.lit(float(threshold))
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (F.col("b.n") >= t_lit * F.col("a.n"))
            & (F.col("a.n") >= t_lit * F.col("b.n")),
        )
        .select(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
        .distinct()
    )
    s1 = shs_arr.select(F.col("doc").alias("doc1"), F.col("shs").alias("shs1"))
    s2 = shs_arr.select(F.col("doc").alias("doc2"), F.col("shs").alias("shs2"))
    inter = F.size(F.array_intersect("shs1", "shs2"))
    union = F.size("shs1") + F.size("shs2") - inter
    # Candidates ≈ near-duplicates — tiny at any scale — so broadcast
    # THEM; the full shingle-array table is never shuffled for verify.
    return (
        s1.join(F.broadcast(cand), "doc1")
        .join(s2, "doc2")
        .select("doc1", "doc2", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ----------------------------------------------------------------------
def _minhash_cols(shs_col: str, num_perm: int) -> list:
    """k seeded-xxhash64 minhashes from a shingle-array column as PURE
    projections — ``array_min(transform(...))`` per permutation, so
    signature computation needs NO explode/shuffle/aggregate. At 100 TB
    this is the difference between a scan-bound map stage and shuffling
    every (doc, shingle) pair."""
    return [
        F.array_min(
            F.transform(F.col(shs_col), lambda s, i=i: F.xxhash64(F.lit(i), s))
        ).alias(f"h{i}")
        for i in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 32, shingle_size: int = 3
) -> DataFrame:
    sh = _hashed_shingle_docs(df, id_col, text_col, shingle_size)
    return sh.select("doc", *_minhash_cols("shs", num_perm))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    shingles: DataFrame | None = None,
    max_bucket_width: int = 64,
    broadcast_candidates: bool | None = None,
) -> DataFrame:
    """X2 — MinHash-LSH near-duplicate pairs, candidates verified with
    exact shingle-set Jaccard.

    banding: ``bands`` bands × ``num_perm/bands`` rows; docs colliding
    in ≥1 band become candidates (probability 1−(1−s^r)^b). The
    candidate join is on (band, band_hash) — cardinality ~duplicates,
    not ~pairs. Verification joins each candidate pair back to its
    distinct-shingle array and computes exact Jaccard, so the output
    has NO false positives; recall is the LSH curve (tested vs. the
    exact operator in tests/).
    Returns (doc1, doc2, jaccard).

    Adversarial-skew guards (a boilerplate-heavy web corpus puts a
    1M-copy template into ONE band bucket — all-pairs there is ~5·10¹¹
    rows): buckets wider than ``max_bucket_width`` emit a STAR on the
    bucket's minimum doc (w−1 rows) instead of the w(w−1)/2 clique.
    At CANDIDATE level the star spans the same component; after exact
    verification, connectivity survives only through hub pairs that
    PASS the Jaccard filter — a heterogeneous over-cap bucket (hash
    pileup of distinct template families rather than one template)
    loses the non-hub families' pairs in THAT band. The loss is
    per-band and bounded: each family's own bucket in any other band
    still contributes its full (under-cap) clique, which is how such
    pairs are recovered in practice (pinned by the mixed-bucket golden
    in tests/test_text_similarity_ops.py). Candidate volume becomes
    linear in bucket width, and buckets at or under the cap are
    untouched, so normal-corpus output is bit-identical.
    ``broadcast_candidates=None`` decides the verification join shape
    from a bounded early-exit count of the (cached) candidate set:
    small sets broadcast into the shingle joins (the huge shingle
    table never shuffles), big sets fall back to a plain shuffle join
    instead of OOMing the executors.
    """
    assert num_perm % bands == 0
    rows = num_perm // bands
    # One shared shingle projection feeds both the signatures (for
    # candidate generation) and the verification arrays — cached so the
    # text is shingled once, not three times. A caller-provided
    # ``shingles`` frame (see ``hashed_shingles``) extends the sharing
    # across operators; the caller then owns caching.
    shing = (
        shingles
        if shingles is not None
        else _hashed_shingle_docs(df, id_col, text_col, shingle_size).cache()
    )
    sig = shing.select("doc", *_minhash_cols("shs", num_perm))
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sig.select("doc", F.explode(F.array(*band_structs)).alias("bb")).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    cand = _lsh_candidates(buckets, max_bucket_width)
    if broadcast_candidates is None:
        # Decide the verify-join shape from the candidate count. The
        # candidate set is pinned EXECUTOR-side (localCheckpoint,
        # memory-and-disk) so it is computed exactly once: the old
        # driver-side probe (limit+toPandas then createDataFrame)
        # re-executed the whole sig→bucket→candidate plan for the probe
        # and Arrow-round-tripped it through the driver (measured
        # ~1.6 s of a ~3.3 s sf0.1 run). The count on the checkpointed
        # frame is metadata-cheap, the broadcast ships the already-
        # materialized rows, and an adversarial over-cap candidate set
        # lands on executor disk, never on the driver. LIFETIME
        # (ADVICE r13): the checkpoint blocks outlive the returned
        # frame — discarding the DataFrame does NOT reclaim them, so a
        # caller composing many dedup calls in one session must sweep
        # (`operators._util.sweep_pinned_rdds(spark)`, which is what
        # bench._isolate does between timed queries). A/B'd cache()
        # here (clearCache-reclaimable) — 12% slower on the bench row;
        # the checkpoint + explicit sweep keeps the faster shape.
        cap = 500_000
        cand = cand.localCheckpoint(eager=True)
        broadcast_candidates = cand.count() <= cap
    s1 = shing.select(F.col("doc").alias("doc1"), F.col("shs").alias("shs1"))
    s2 = shing.select(F.col("doc").alias("doc2"), F.col("shs").alias("shs2"))
    inter = F.size(F.array_intersect("shs1", "shs2"))
    union = F.size("shs1") + F.size("shs2") - inter
    # Candidate pairs are ~|near-duplicates| — normally tiny relative
    # to the doc table — so broadcast THEM into the shingle joins: the
    # (huge) shingle table is never shuffled for verification. Above
    # the auto-threshold the pair set shuffle-joins instead.
    cand_side = F.broadcast(cand) if broadcast_candidates else cand
    return (
        s1.join(cand_side, "doc1")
        .join(s2, "doc2")
        .select("doc1", "doc2", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _lsh_candidates(buckets: DataFrame, max_bucket_width: int) -> DataFrame:
    """Distinct candidate (doc1 < doc2) pairs from LSH band buckets.
    Buckets at or under ``max_bucket_width`` docs contribute their full
    clique (all-pairs equi-self-join on (band, bh)); wider buckets
    contribute a STAR centered on the bucket's minimum doc — w−1 pairs
    instead of w(w−1)/2, computed with one hash aggregate + one keyed
    join — no window sort anywhere (`max_doc_freq` discipline from
    ``ngram_jaccard_pairs``, adapted so mega-clusters stay connected
    instead of being dropped). Component preservation is a
    CANDIDATE-graph property: downstream exact verification keeps only
    hub pairs with real Jaccard ≥ t, so members of a mixed (hash-
    pileup) bucket that aren't near-dups of the hub rely on their
    other bands for recall — see ``minhash_lsh_pairs``'s docstring for
    the bound."""
    stats = buckets.groupBy("band", "bh").agg(
        F.count(F.lit(1)).alias("wdt"), F.min("doc").alias("hub")
    )
    tagged = buckets.join(stats, ["band", "bh"])
    narrow = tagged.filter(F.col("wdt") <= max_bucket_width).drop("wdt", "hub")
    a, b = narrow.alias("a"), narrow.alias("b")
    clique = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).select(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
    star = (
        tagged.filter(F.col("wdt") > max_bucket_width)
        .filter(F.col("doc") != F.col("hub"))
        .select(F.col("hub").alias("doc1"), F.col("doc").alias("doc2"))
    )
    return clique.unionByName(star).distinct()


# ----------------------------------------------------------------------
# Weighted MinHash (round 11) — ICWS (Ioffe 2010, "Improved Consistent
# Sampling, Weighted Minhash and L1 Sketching", ICDM — public): the X2
# Jaccard tier treats every shingle as 0/1, so a doc that repeats a
# template 50× and one that contains it once look identical to MinHash.
# Weighted Jaccard J_w(A,B) = Σ_s min(a_s,b_s) / Σ_s max(a_s,b_s) over
# term frequencies sees the difference; ICWS is the published sampler
# whose per-permutation collision probability is EXACTLY J_w.
_ICWS_M = 2_147_483_647  # 2^31-1: unit-interval grid for hash->uniform


def _icws_unit(seed, s) -> F.Column:
    """Deterministic uniform in (0,1) from (seed, shingle) — the md5/
    xxhash idiom: pmod to [0, M), +0.5 to dodge both endpoints.
    ``seed``: Python int or IntegerType Column (same hash either way)."""
    seed = F.lit(int(seed)) if not isinstance(seed, F.Column) else seed
    return (F.pmod(F.xxhash64(seed, s), F.lit(_ICWS_M)).cast("double") + 0.5) / F.lit(
        float(_ICWS_M)
    )


def _icws_pick(k, pair) -> F.Column:
    """One ICWS sample for permutation ``k`` over a (s, lw = ln w)
    struct: r, c ~ Gamma(2,1) (= −ln(u·u')), β ~ U(0,1), all keyed on
    (k, s); t = ⌊ln w / r + β⌋, ln a = ln c − r·(t + 1 − β). Returns
    struct(lna, s, t) — the min over these IS the argmin, and the
    winning (s*, t*) pair is the sample whose collision probability
    across two weighted sets is J_w. ``ln w`` arrives precomputed
    (perm-independent — hoisting it out of the num_perm samples drops
    a quarter of the transcendental work, the ICWS hot cost). ``k``
    may be a Python int OR an IntegerType Column — the seed arithmetic
    (5k+j, int32 in both cases) hashes identically either way."""
    s, lw = pair["s"], pair["lw"]
    k = F.lit(int(k)) if not isinstance(k, F.Column) else k
    r = -F.log(_icws_unit(5 * k, s) * _icws_unit(5 * k + 1, s))
    c = -F.log(_icws_unit(5 * k + 2, s) * _icws_unit(5 * k + 3, s))
    beta = _icws_unit(5 * k + 4, s)
    t = F.floor(lw / r + beta)
    lna = F.log(c) - r * (t.cast("double") + 1.0 - beta)
    return F.struct(lna.alias("lna"), s.alias("s"), t.cast("long").alias("t"))


def weighted_shingle_tf(
    df: DataFrame, id_col: str, text_col: str, size: int = 3
) -> DataFrame:
    """(doc, sh, w): hashed shingles with TERM-FREQUENCY weights — one
    explode + one (doc, sh) hash aggregate with map-side combine (the
    tf table is the same (doc, sh) frame the exact-Jaccard inverted
    index shuffles anyway; weights cannot be a pure projection the way
    distinct-shingle signatures are)."""
    base = df.select(F.col(id_col).alias("doc"), _tokens(text_col).alias("toks"))
    return (
        base.select(
            "doc", F.explode(_hashed_shingles_over_tokens("toks", size)).alias("sh")
        )
        .groupBy("doc", "sh")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


def weighted_minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    shingle_size: int = 3,
    tf: DataFrame | None = None,
) -> DataFrame:
    """(doc, h0..h{k-1}): ICWS weighted-minhash signature. After the tf
    aggregate, each permutation's pick is a PURE codegen'd projection
    over the (doc, sh, w) ROWS followed by a ``min(struct)`` hash
    aggregate — the argmin array_min(transform(...)) used to compute.
    Higher-order-function lambdas are CodegenFallback (interpreted
    per element), which made the 16-permutation ICWS arithmetic the
    dominant cost of the whole LSH path (measured 6.7 s of 9.4 s at
    sf0.1); as a flat projection it whole-stage-codegens, and the
    map-side-combined min shuffles only num_docs × k small structs —
    still scan-bound at 100 TB. min-over-struct ordering is the same
    lexicographic (lna, s, t) ordering array_min used, so the winning
    sample — and therefore every signature value — is identical."""
    tf = tf if tf is not None else weighted_shingle_tf(df, id_col, text_col, shingle_size)
    # One pick EXPRESSION with the permutation id exploded as a column:
    # 16 inlined pick expressions in one Project JIT-bail (HotSpot's
    # huge-method limit inside the fused whole-stage method — measured
    # 8× slowdown past ~8 picks), and per-element HOF lambdas are
    # interpreted. Exploding k keeps the generated method small; the
    # conditional mins aggregate back to one row per doc with map-side
    # combine, so the exchange carries num_docs × k structs only.
    n = int(num_perm)
    picks = tf.select(
        "doc",
        F.explode(F.array(*[F.lit(k) for k in range(n)])).alias("k"),
        F.struct(F.col("sh").alias("s"), F.log("w").alias("lw")).alias("pair"),
    ).select("doc", "k", _icws_pick(F.col("k"), F.col("pair")).alias("p"))
    agg = picks.groupBy("doc").agg(
        *[F.min(F.when(F.col("k") == k, F.col("p"))).alias(f"p{k}") for k in range(n)]
    )
    return agg.select(
        "doc",
        *[
            F.xxhash64(F.lit(k), F.col(f"p{k}")["s"], F.col(f"p{k}")["t"]).alias(f"h{k}")
            for k in range(n)
        ],
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_size: int = 3,
    max_doc_freq: int | None = None,
    tf: DataFrame | None = None,
) -> DataFrame:
    """X2 (exact weighted baseline) — all pairs with tf-weighted
    Jaccard ≥ threshold: Σ min / Σ max over term frequencies, computed
    as Σ_common min(w1,w2) / (tot1 + tot2 − Σ_common min) — one
    inverted-index self-join on sh + one (doc1, doc2) aggregate, the
    ngram_jaccard_pairs shuffle shape with weights along for the ride.
    ``max_doc_freq`` is the same skew guard (drops stop-shingles whose
    fan-out would square); exact when unset.

    LOSSLESS total-weight filter (the weighted generalization of the
    AllPairs length filter): J_w ≥ t forces Σmin ≥ t·Σmax ≥
    t·max(totA, totB) while Σmin ≤ min(totA, totB), so any qualifying
    pair satisfies ``t·totA ≤ totB ≤ totA/t`` — the self-join carries
    each side's total weight and prunes mismatched-mass pairs BEFORE
    the per-pair aggregate, at zero recall cost. The prune runs at a
    half-grid-slackened threshold (t − 0.5·10⁻⁶, ADVICE r11): the
    final filter accepts pairs whose 6dp-ROUNDED score ≥ t, which
    admits true scores down to t − 5e-7, so the mass bound must admit
    them too or boundary pairs kept by the oracle and the LSH twin
    (which has no mass prune) would be pruned here. Returns
    (doc1, doc2, wjaccard)."""
    tf = tf if tf is not None else weighted_shingle_tf(df, id_col, text_col, shingle_size)
    if max_doc_freq is not None:
        dfreq = tf.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        tf = tf.join(dfreq.filter(F.col("df") <= max_doc_freq).select("sh"), "sh")
    tot = tf.groupBy("doc").agg(F.sum("w").alias("tot"))
    tft = tf.join(tot, "doc")
    t_lit = F.lit(float(threshold) - 5e-7)
    a, b = tft.alias("a"), tft.alias("b")
    summin = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (F.col("b.tot") >= t_lit * F.col("a.tot"))
            & (F.col("a.tot") >= t_lit * F.col("b.tot")),
        )
        .groupBy(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
        .agg(F.sum(F.least(F.col("a.w"), F.col("b.w"))).alias("smin"))
    )
    t1 = tot.select(F.col("doc").alias("doc1"), F.col("tot").alias("tot1"))
    t2 = tot.select(F.col("doc").alias("doc2"), F.col("tot").alias("tot2"))
    wj = F.round(
        F.col("smin") / (F.col("tot1") + F.col("tot2") - F.col("smin")), 6
    )
    return (
        summin.join(t1, "doc1")
        .join(t2, "doc2")
        .select("doc1", "doc2", wj.alias("wjaccard"))
        .filter(F.col("wjaccard") >= threshold)
    )


def weighted_minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 16,
    bands: int = 8,
    shingle_size: int = 3,
    max_bucket_width: int = 64,
    tf: DataFrame | None = None,
) -> DataFrame:
    """X2 — weighted-MinHash-LSH near-duplicate pairs: ICWS signatures
    banded exactly like :func:`minhash_lsh_pairs` (collision
    probability per band = J_w^rows, candidates from ≥1 band
    collision, same over-cap star guard), then candidates verified
    with EXACT weighted Jaccard computed from per-doc tf MAPS — so the
    output has NO false positives and scores identical to
    :func:`weighted_jaccard_pairs`; recall is the LSH curve (gated vs
    the exact twin in tests/test_recall.py). The tf table shuffles
    once; the signature and band projection are scan-bound; the verify
    join broadcasts the candidate pairs.

    ``tf``: override the default term-frequency weights with ANY
    (doc, sh, w) table of STRICTLY POSITIVE weights — e.g. tf·idf
    with smoothed idf (ICWS samples ln(w), so a zero weight must be
    filtered or floored by the caller; Ioffe 2010 covers arbitrary
    w > 0). Pass the SAME frame to :func:`weighted_jaccard_pairs` so
    the exact twin scores on the same weights. Caller-supplied frames
    are trusted to be pinned (the ``shingles=`` contract). Returns
    (doc1, doc2, wjaccard)."""
    assert num_perm % bands == 0
    rows = num_perm // bands
    if tf is None:
        tf = weighted_shingle_tf(df, id_col, text_col, shingle_size).localCheckpoint()
    sig = weighted_minhash_signatures(
        df, id_col, text_col, num_perm, shingle_size, tf=tf
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sig.select("doc", F.explode(F.array(*band_structs)).alias("bb")).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    cand = _lsh_candidates(buckets, max_bucket_width)
    maps = tf.groupBy("doc").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("sh"), F.col("w")))
        ).alias("m"),
        F.sum("w").alias("tot"),
    )
    m1 = maps.select(
        F.col("doc").alias("doc1"), F.col("m").alias("m1"), F.col("tot").alias("tot1")
    )
    m2 = maps.select(
        F.col("doc").alias("doc2"), F.col("m").alias("m2"), F.col("tot").alias("tot2")
    )
    common = F.array_intersect(F.map_keys("m1"), F.map_keys("m2"))
    smin = F.aggregate(
        common,
        F.lit(0.0),
        lambda acc, k: acc + F.least(F.col("m1")[k], F.col("m2")[k]),
    )
    wj = F.round(smin / (F.col("tot1") + F.col("tot2") - smin), 6)
    return (
        m1.join(F.broadcast(cand), "doc1")
        .join(m2, "doc2")
        .select("doc1", "doc2", wj.alias("wjaccard"))
        .filter(F.col("wjaccard") >= threshold)
    )


# ----------------------------------------------------------------------
def dedup_clusters(
    pairs: DataFrame,
    doc1_col: str = "doc1",
    doc2_col: str = "doc2",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair list → canonical
    representative per cluster (the minimum id).

    Iterative min-label propagation with pointer doubling: each round
    every node adopts the smallest of (its label, its neighbors'
    labels, its label's label). The label-of-label contraction halves
    path lengths, so convergence is O(log(diameter)) rounds even for
    chain-shaped clusters; ``max_iters`` bounds the pathological case.
    Each round is two keyed joins + one aggregate — all shuffles key on
    doc id, so a round scales like any grouped aggregate.
    ``localCheckpoint`` truncates the growing lineage (the classic
    iterative-DataFrame trap).

    Returns (doc, canonical) for every document that appears in
    ``pairs`` — downstream, keep rows whose doc == canonical (plus all
    never-paired docs) for the deduplicated corpus.
    """
    edges = (
        pairs.select(F.col(doc1_col).alias("a"), F.col(doc2_col).alias("b"))
        .union(pairs.select(F.col(doc2_col).alias("a"), F.col(doc1_col).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("doc")).distinct().withColumn("label", F.col("doc"))
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.b == labels.doc)
            .groupBy(edges.a.alias("doc"))
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(neighbor_min, "doc", "left").select(
            "doc",
            F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
        )
        # pointer doubling: label := min(label, label(label))
        grand = stepped.select(F.col("doc").alias("gdoc"), F.col("label").alias("glabel"))
        new_labels = (
            stepped.join(grand, stepped.label == grand.gdoc, "left")
            .select(
                "doc",
                F.least(F.col("label"), F.coalesce(F.col("glabel"), F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc", F.col("label").alias("canonical"))


# ----------------------------------------------------------------------
def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """X2 — 64-bit SimHash per document from distinct-token xxhash64
    bits: explode tokens → 64 signed bit-sums in ONE aggregate →
    bitwise-OR assembly. Returns (id_col, simhash)."""
    tok = df.select(
        F.col(id_col).alias("doc"), F.explode(F.array_distinct(_tokens(text_col))).alias("t")
    ).withColumn("h", F.xxhash64("t"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = tok.groupBy("doc").agg(*bit_sums)
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return sums.select(F.col("doc").alias(id_col), sig.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, chunk_bits: int = 16
) -> DataFrame:
    """X2 — SimHash near-dup pairs with hamming ≤ max_hamming via exact
    chunk banding: the 64-bit signature splits into ``64 // chunk_bits``
    chunks; by pigeonhole any pair within hamming < n_chunks shares at
    least one intact chunk, so candidate generation is an equi-join,
    never all-pairs. ``chunk_bits`` picks the decomposition (16 → 4
    chunks, 8 → 8 chunks) — any valid choice yields the SAME pair set,
    which the registry report query exploits as a cross-check.
    Returns (doc1, doc2, hamming)."""
    n_chunks = 64 // chunk_bits
    assert n_chunks * chunk_bits == 64, "chunk_bits must divide 64"
    assert max_hamming < n_chunks, (
        f"banding on {n_chunks} chunks is only exhaustive for hamming < {n_chunks}"
    )
    mask = (1 << chunk_bits) - 1
    sig = simhash(df, id_col, text_col)
    chunks = sig.select(
        F.col(id_col).alias("doc"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * chunk_bits).bitwiseAND(F.lit(mask)).alias("cv"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cc"),
    ).select("doc", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.cv").alias("cv"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.cv") == F.col("b.cv")) & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"), ham.cast("int").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ----------------------------------------------------------------------
def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    q: int = 2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """X2 — string-similarity self-join: all pairs within levenshtein
    ``max_dist``, without the all-pairs cross join.

    Candidate generation is a character-q-gram inverted index (explode
    distinct grams → equi-join on gram → count shared grams per pair)
    with two LOSSLESS filters applied before verification:

    * length band — edit distance ≤ k forces ``|len_a − len_b| ≤ k``;
    * count bound — one edit changes at most ``q`` positions' grams, so
      a true pair shares ``≥ max(ng_a, ng_b) − k·q`` distinct grams.

    Survivors are verified with exact ``levenshtein`` (built-in, JVM).
    The bound degenerates for strings with ``≤ k·q`` distinct grams (a
    true pair could share zero grams and never meet in the index), so
    strings shorter than ``q + k·q + k`` chars take a separate
    length-band equi-join path — bounded lengths, tiny by construction
    relative to a real corpus.

    ``max_doc_freq`` is the frequent-gram skew guard for 100 TB: grams
    appearing in more than this many docs are dropped from the inverted
    index before the self-join, bounding per-key join fan-out (a gram
    in d docs makes d²/2 candidate rows). The shared-gram count bound
    is skipped under the cap (capped counts understate sharing);
    levenshtein verification keeps precision exact. A true pair can be
    missed only if ALL its shared grams exceed the cap.

    Returns (doc1, doc2, dist) with doc1 < doc2.
    """
    k = max_dist
    short_len = q + k * q + k  # partners of degenerate strings are below this too
    base = (
        df.select(
            F.col(id_col).alias("doc"),
            F.col(text_col).alias("txt"),
            F.length(text_col).alias("len"),
        )
        .withColumn(
            "grams",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.lit(1), F.col("len") - q + 1)),
                    lambda i: F.col("txt").substr(i, F.lit(q)),
                )
            ),
        )
        .withColumn("ng", F.size("grams"))
    )
    long_docs = base.filter(F.col("len") >= short_len)
    inv = long_docs.select("doc", "len", "ng", F.explode("grams").alias("g"))
    if max_doc_freq is not None:
        gfreq = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        inv = inv.join(gfreq.filter(F.col("df") <= max_doc_freq).select("g"), "g")
    a, b = inv.alias("a"), inv.alias("b")
    joined = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc") < F.col("b.doc"))
        & (F.abs(F.col("a.len") - F.col("b.len")) <= k),
    ).groupBy(
        F.col("a.doc").alias("doc1"),
        F.col("b.doc").alias("doc2"),
        F.col("a.ng").alias("ng1"),
        F.col("b.ng").alias("ng2"),
    ).agg(F.count(F.lit(1)).alias("shared"))
    if max_doc_freq is None:
        # lossless count bound — only sound when every shared gram was
        # counted (i.e. no df cap filtered the index)
        joined = joined.filter(F.col("shared") >= F.greatest("ng1", "ng2") - F.lit(k * q))
    cand_long = joined.select("doc1", "doc2")
    # short-string path: bounded lengths → length-band equi-join. Only
    # pairs with at least one TRULY short side (len < short_len) belong
    # here — both-long pairs are the long path's, and emitting them in
    # both would duplicate output rows. Probing [len, len+k] from the
    # short side reaches every partner: an even-shorter partner is
    # itself truly short and probes back.
    shortish = base.filter(F.col("len") < short_len + k).select("doc", "len")
    probe = base.filter(F.col("len") < short_len).select(
        "doc", F.explode(F.sequence(F.col("len"), F.col("len") + k)).alias("plen")
    )
    cand_short = (
        probe.alias("a")
        .join(shortish.alias("b"), (F.col("a.plen") == F.col("b.len")) & (F.col("a.doc") != F.col("b.doc")))
        .select(
            F.least("a.doc", "b.doc").alias("doc1"),
            F.greatest("a.doc", "b.doc").alias("doc2"),
        )
        .distinct()
    )
    texts = base.select("doc", "txt")
    cand = cand_long.unionByName(cand_short)
    dist = F.levenshtein(F.col("t1.txt"), F.col("t2.txt"))
    return (
        cand.join(texts.alias("t1"), F.col("doc1") == F.col("t1.doc"))
        .join(texts.alias("t2"), F.col("doc2") == F.col("t2.doc"))
        .select("doc1", "doc2", dist.cast("bigint").alias("dist"))
        .filter(F.col("dist") <= k)
    )


# ----------------------------------------------------------------------
# Span-level (sub-document) dedup — remove repeated token spans across
# the corpus, keeping only the first occurrence. The operator behind
# "exact substring dedup" training-data hygiene (boilerplate, shared
# headers/footers, license blocks) at span granularity.
def span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 16,
) -> DataFrame:
    """X2 — corpus-wide span dedup: split each document into consecutive
    ``span_tokens``-token spans, drop every span whose exact text already
    occurred earlier in the corpus (first occurrence by (doc, seg) is
    kept), and reassemble the surviving text.

    Plan: posexplode tokens → hash-agg to (doc, seg, span) — one shuffle
    on (doc, seg) — then a window ``row_number`` partitioned by the span
    text (second shuffle, on the span) marks first occurrences; a final
    hash-agg on doc reassembles. Three shuffles total, all keyed, no
    joins, no all-pairs anything. Per-row payload is bounded by
    ``span_tokens``, so a pathologically popular span costs rows in one
    partition, not memory: the window computes only row_number (no
    buffering of the frame).

    Returns (id_col, clean_text, spans_kept, spans_dropped).
    """
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(_tokens(text_col)).alias("pos", "tok"),
    )
    spans = toks.groupBy(
        "doc", (F.col("pos") / F.lit(span_tokens)).cast("int").alias("seg")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
            ),
            " ",
        ).alias("span")
    )
    first = F.row_number().over(W.partitionBy("span").orderBy("doc", "seg"))
    marked = spans.withColumn("keep", (first == 1).cast("int"))
    ordered = F.array_sort(F.collect_list(F.struct("seg", "keep", "span")))
    kept_spans = F.filter(ordered, lambda s: s["keep"] == 1)
    return marked.groupBy("doc").agg(
        F.array_join(F.transform(kept_spans, lambda s: s["span"]), " ").alias("clean_text"),
        F.sum("keep").alias("spans_kept"),
        (F.count(F.lit(1)) - F.sum("keep")).alias("spans_dropped"),
    ).withColumnRenamed("doc", id_col)


# ----------------------------------------------------------------------
def exact_substring_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 30,
) -> DataFrame:
    """X2 — ExactSubstr deduplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — their suffix-array
    ExactSubstr stage, the one canonical published dedup stage beside
    MinHash): find every maximal character span of at least
    ``min_len`` chars whose text occurs ELSEWHERE in the corpus, keep
    the corpus-first occurrence, and emit removal spans for all
    others.

    Suffix-array-order restated as a sorted shingle table (the
    distributed equivalence: a substring of length L >= k is
    duplicated iff ALL of its length-k shingles are duplicated, so
    marking non-first occurrences of every k-shingle and
    interval-merging the marked positions per document yields exactly
    the maximal duplicated spans the suffix array would): one
    posexplode to the (doc, pos, shingle) table — the corpus × k
    stream, the published cost of ExactSubstr — one
    ``row_number`` window partitioned BY SHINGLE in (doc, pos) order
    (first occurrence = rank 1 = kept; a pathologically popular
    shingle costs rows in one partition, not memory — the span_dedup
    argument), then the classic interval union per doc (window per
    doc: running max-end, new-group flag, cumulative group id). Never
    all-pairs; every shuffle is keyed.

    Returns one row per REMOVAL span: (id_col, span_id, span_start
    [1-based char], span_end [exclusive], span_chars). Documents with
    no duplicated text emit nothing; callers cut the spans out with
    one substring fold (`remove_boilerplate_spans` discipline).
    """
    from pyspark.sql import Window as W

    k = int(min_len)
    # The per-position k-char shingle stream is the published cost of
    # ExactSubstr — all of it CPU spent BEFORE the first exchange, so a
    # narrow scan (one small parquet → one task) serializes the whole
    # corpus×k expansion on one core (measured 3.3 s → 1.1 s at sf0.1).
    # Same `_widen_narrow_input` discipline as the shingle operators.
    df = _widen_narrow_input(df)
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.when(
                F.length(text_col) >= k,
                F.expr(
                    f"transform(sequence(1, length({text_col}) - {k} + 1),"
                    f" i -> substring({text_col}, i, {k}))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos0", "sh"),
    ).select("doc", (F.col("pos0") + 1).alias("pos"), "sh")
    first = F.row_number().over(W.partitionBy("sh").orderBy("doc", "pos"))
    dup = (
        sh.withColumn("rn", first)
        .filter(F.col("rn") > 1)
        .select("doc", "pos")
    )
    wd = W.partitionBy("doc").orderBy("pos")
    run_end = F.max(F.col("pos") + k).over(wd.rowsBetween(W.unboundedPreceding, -1))
    flagged = dup.select(
        "doc",
        "pos",
        (run_end.isNull() | (F.col("pos") > run_end)).cast("int").alias("is_new"),
    )
    grouped = flagged.select(
        "doc",
        "pos",
        F.sum("is_new").over(wd.rowsBetween(W.unboundedPreceding, 0)).alias("grp"),
    )
    return grouped.groupBy("doc", "grp").agg(
        F.min("pos").cast("bigint").alias("span_start"),
        (F.max("pos") + k).cast("bigint").alias("span_end"),
    ).select(
        F.col("doc").alias(id_col),
        F.col("grp").cast("bigint").alias("span_id"),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start")).alias("span_chars"),
    )


# ----------------------------------------------------------------------
def remove_boilerplate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 16,
    max_doc_freq: int = 1,
) -> DataFrame:
    """X4 — boilerplate removal by span document frequency (the CCNet /
    RefinedWeb hygiene pass): split documents into consecutive
    ``span_tokens``-token spans and drop EVERY occurrence of any span
    appearing in more than ``max_doc_freq`` distinct documents
    (headers, footers, license blocks, navigation chrome). Unlike
    ``span_dedup`` (first occurrence wins), boilerplate is removed from
    ALL documents — repeated content is evidence the span is template,
    not prose.

    Plan: posexplode tokens → hash-agg to (doc, seg, span) → distinct-
    doc frequency per span (hash-agg on span) joined back on the same
    span key (one exchange layout, reused) → per-doc reassembly.
    Everything keys on (doc, seg) or span; no all-pairs anything, and a
    pathologically popular span costs rows in one partition only.

    Returns (id_col, clean_text, spans_kept, spans_dropped).
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(_tokens(text_col)).alias("pos", "tok"),
    )
    spans = toks.groupBy(
        "doc", (F.col("pos") / F.lit(span_tokens)).cast("int").alias("seg")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
            ),
            " ",
        ).alias("span")
    )
    dfreq = spans.groupBy("span").agg(F.countDistinct("doc").alias("df"))
    marked = spans.join(dfreq, "span").withColumn(
        "keep", (F.col("df") <= max_doc_freq).cast("int")
    )
    ordered = F.array_sort(F.collect_list(F.struct("seg", "keep", "span")))
    kept_spans = F.filter(ordered, lambda s: s["keep"] == 1)
    return (
        marked.groupBy("doc")
        .agg(
            F.array_join(F.transform(kept_spans, lambda s: s["span"]), " ").alias("clean_text"),
            F.sum("keep").alias("spans_kept"),
            (F.count(F.lit(1)) - F.sum("keep")).alias("spans_dropped"),
        )
        .withColumnRenamed("doc", id_col)
    )


# ----------------------------------------------------------------------
def canonical_by_priority(
    df: DataFrame,
    content_cols: list[str],
    id_col: str,
    priority_col,
) -> DataFrame:
    """X1 variant — exact-content dedup keeping the HIGHEST-PRIORITY
    member of each duplicate group instead of the lowest id: among
    documents with identical content, keep the one from the most
    trusted source (ascending ``priority_col``; id is the tiebreak).
    The multi-source corpus-merge pattern — crawl + curated + licensed
    copies of the same text collapse to the provenance you trust most.

    One shuffle on the content digest; the winner is selected with a
    single ``min(struct(priority, id))`` aggregate — no window, no
    second pass. Returns (id_col, content_hash, n_copies, priority).
    """
    digest = F.sha2(F.concat_ws("\x1f", *content_cols), 256)
    pri = priority_col if isinstance(priority_col, F.Column) else F.col(priority_col)
    return (
        df.groupBy(digest.alias("content_hash"))
        .agg(
            F.min(F.struct(pri.alias("p"), F.col(id_col).alias("i"))).alias("w"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(
            F.col("w.i").alias(id_col),
            "content_hash",
            "n_copies",
            F.col("w.p").alias("priority"),
        )
    )


# ----------------------------------------------------------------------
def _admission_candidates(
    corpus_shingles: DataFrame,
    batch_shingles: DataFrame,
    threshold: float,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(bdoc, cdoc) candidate pairs for the admission gate — a
    prefix-filtered PROBE of the corpus-side inverted index, never a
    self-join. Corpus↔corpus pairs are impossible by construction: the
    corpus contributes index entries (its own df-ranked prefixes), the
    batch contributes probes, and candidates come only from
    probe-hits-index collisions.

    The lossless AllPairs prefix theorem needs one global total order
    shared by BOTH sides; here it is (corpus document frequency,
    shingle) ascending — batch-only shingles get df 0 and sort first,
    which wastes a few probe slots but keeps the order consistent, so
    recall stays exactly 1. df-0 probes are dropped AFTER the prefix is
    fixed (they hit nothing in the index; removing probes never loses a
    candidate). ``max_doc_freq`` mirrors ``ngram_jaccard_pairs``'s
    approximation, with df measured on the corpus alone.
    """
    from pyspark.sql import Window

    t_lit = F.lit(float(threshold))
    c_sh = corpus_shingles.select(
        "doc", F.size("shs").alias("n"), F.explode("shs").alias("sh")
    )
    dftab = c_sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    prefix_len = F.col("n") - F.ceil(t_lit * F.col("n")) + 1
    c_ranked = c_sh.join(dftab, "sh")
    if max_doc_freq is not None:
        c_ranked = c_ranked.filter(F.col("df") <= max_doc_freq)
    c_prefix = (
        c_ranked.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc").orderBy(F.asc("df"), F.asc("sh"))),
        )
        .filter(F.col("rn") <= prefix_len)
        .select(F.col("doc").alias("cdoc"), F.col("n").alias("cn"), "sh")
    )
    b_sh = batch_shingles.select(
        "doc", F.size("shs").alias("n"), F.explode("shs").alias("sh")
    )
    b_ranked = b_sh.join(dftab, "sh", "left").withColumn(
        "df", F.coalesce(F.col("df"), F.lit(0))
    )
    if max_doc_freq is not None:
        b_ranked = b_ranked.filter(F.col("df") <= max_doc_freq)
    b_prefix = (
        b_ranked.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc").orderBy(F.asc("df"), F.asc("sh"))),
        )
        .filter(F.col("rn") <= prefix_len)
        .filter(F.col("df") > 0)
        .select(F.col("doc").alias("bdoc"), F.col("n").alias("bn"), "sh")
    )
    # Length filter (lossless): J ≥ t ⟹ t·|B| ≤ |C| ≤ |B|/t.
    return (
        b_prefix.join(
            c_prefix,
            (b_prefix["sh"] == c_prefix["sh"])
            & (F.col("cn") >= t_lit * F.col("bn"))
            & (F.col("bn") >= t_lit * F.col("cn")),
        )
        .select("bdoc", "cdoc")
        .distinct()
    )


def admission_against_corpus(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    shingle_size: int = 3,
    max_doc_freq: int | None = None,
    corpus_shingles: DataFrame | None = None,
) -> DataFrame:
    """X2 — incremental near-dup admission: which documents of an
    incoming ``batch`` may enter a ``corpus`` that must stay
    near-duplicate-free? A batch doc is REJECTED when some existing
    corpus doc has shingle-Jaccard ≥ ``threshold`` with it. The
    continuous-ingestion shape: the nightly crawl lands, the corpus
    only grows by admitted documents.

    PROBE-ONLY (the 100 TB shape): the corpus side is an inverted
    prefix index, the batch side probes it — candidates are
    batch↔corpus by construction, so a nightly batch never re-pays the
    corpus's own self-join (the old tagged-union formulation generated
    the full corpus×corpus candidate set each run and discarded it).
    Candidates (≈ |batch near-dups|, tiny) broadcast into the exact
    verification joins, so neither side's shingle-array table shuffles
    for verify. Ids must be disjoint across the two frames;
    batch-internal duplicates are a separate policy (run exact_dedup or
    minhash on the admitted set). ``corpus_shingles`` accepts a
    precomputed ``hashed_shingles(corpus, ...)`` frame — persist it
    across nightly batches and the corpus text is shingled once, not
    once per batch.

    Returns one row per batch doc: (id_col, admitted, blocked_by,
    jaccard) with ``blocked_by`` the lowest-id blocking corpus doc
    (deterministic) and NULL when admitted.
    """
    # The shingle projections are each consulted several times in the
    # final plan (df table, prefix ranking, exact-verify arrays);
    # materialize them ONCE via localCheckpoint — tokenization is the
    # expensive part and must not re-run per consumer. Checkpoint
    # storage is lineage-truncated and reclaimed by the context cleaner
    # when the plan is dropped (unlike a bare .persist(), which would
    # leak for the session). A caller-provided ``corpus_shingles`` is
    # trusted to be already pinned (that's its contract).
    c_shs = (
        corpus_shingles
        if corpus_shingles is not None
        else _hashed_shingle_docs(
            _widen_narrow_input(corpus), id_col, text_col, shingle_size
        ).localCheckpoint()
    )
    b_shs = _hashed_shingle_docs(
        _widen_narrow_input(batch), id_col, text_col, shingle_size
    ).localCheckpoint()
    cand = _admission_candidates(c_shs, b_shs, threshold, max_doc_freq)
    return _admission_decisions(b_shs, c_shs, cand, batch, id_col, threshold)


# ----------------------------------------------------------------------
def shingle_index_frames(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three frames of a PERSISTENT near-dup admission index
    (round 9 — the engine-managed form of ``corpus_shingles=`` reuse):

    - ``entries`` (sh, doc, n): the FULL inverted index — every hashed
      shingle of every corpus doc, with the doc's shingle count.
      Persist bucketed+sorted by ``sh`` so the nightly probe join
      reads matching buckets with no exchange on the corpus side.
    - ``docs`` (doc, shs): the per-doc shingle arrays the exact
      Jaccard verification reads for candidate partners.
    - ``dfinc`` (sh, df): document-frequency INCREMENT rows (this
      build's counts). Increments are additive — index updates append
      rather than rewrite, and readers sum per ``sh`` (exchange-free
      on the bucketed layout). df only orders probe prefixes and
      feeds the optional skew cap, so a stale snapshot costs probe
      efficiency, never recall.

    Indexing the FULL corpus side (not a prefix) is what makes
    incremental appends lossless: the AllPairs prefix theorem needs a
    shared total order only when BOTH sides are prefix-filtered; with
    a complete index, ANY (n - ceil(t*n) + 1)-subset of a probe doc's
    shingles must intersect every qualifying partner (at most
    n - t*n < that many shingles can miss), so probe-side-only
    prefixing keeps recall exactly 1 under any ordering — appended
    docs never invalidate previously written index rows.
    """
    shs = _hashed_shingle_docs(
        _widen_narrow_input(corpus), id_col, text_col, shingle_size
    ).localCheckpoint()
    entries = shs.select(
        "doc", F.size("shs").alias("n"), F.explode("shs").alias("sh")
    ).select("sh", "doc", "n")
    dfinc = entries.groupBy("sh").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    return entries, shs, dfinc


def _admission_decisions(
    b_shs: DataFrame,
    corpus_docs: DataFrame,
    cand: DataFrame,
    batch: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Shared verify+decide tail of the admission gates: exact-Jaccard
    verification of the (bdoc, cdoc) candidates against the shingle
    arrays, lowest-id blocking partner, one row per batch doc.
    ``cand`` is tiny (≈ |batch near-dups|) and broadcasts into both
    attachment joins, so neither shingle-array side shuffles."""
    sb = b_shs.select(F.col("doc").alias("bdoc"), F.col("shs").alias("bshs"))
    sc = corpus_docs.select(F.col("doc").alias("cdoc"), F.col("shs").alias("cshs"))
    inter = F.size(F.array_intersect("bshs", "cshs"))
    union = F.size("bshs") + F.size("cshs") - inter
    verified = (
        sb.join(F.broadcast(cand), "bdoc")
        .join(sc, "cdoc")
        .select("bdoc", "cdoc", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    blocking = (
        verified.groupBy("bdoc")
        .agg(
            F.min(
                F.struct(F.col("cdoc").alias("p"), F.col("jaccard").alias("j"))
            ).alias("w")
        )
        .select(
            F.col("bdoc").alias(id_col),
            F.col("w.p").alias("blocked_by"),
            F.col("w.j").alias("jaccard"),
        )
    )
    return (
        batch.select(F.col(id_col))
        .join(blocking, id_col, "left")
        .select(
            id_col,
            F.col("blocked_by").isNull().alias("admitted"),
            "blocked_by",
            "jaccard",
        )
    )


def admission_against_index(
    entries: DataFrame,
    docs: DataFrame,
    dfinc: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    shingle_size: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """X2 — near-dup admission against a PERSISTED shingle index
    (``shingle_index_frames``), the continuous-ingestion form: the
    nightly batch tokenizes only ITSELF and probes the stored inverted
    index — the corpus text is never re-read, never re-shingled.

    Candidate generation is probe-prefix-only (lossless against the
    full index — see ``shingle_index_frames``): batch shingles rank by
    the summed df snapshot ascending (rare first; df 0 probes are
    dropped AFTER the prefix is fixed — they cannot hit the index),
    keep the first n - ceil(t*n) + 1 per doc, and equi-join ``entries``
    on ``sh`` with the lossless |B|/|C| length band. With ``entries``
    bucketed by ``sh``, the join shuffles ONLY the batch prefixes (or
    broadcasts them when small — either way the index side moves
    nothing). Verification and blocking semantics are identical to
    ``admission_against_corpus``.

    Returns (id_col, admitted, blocked_by, jaccard), one row per batch
    doc. Same contracts: ids disjoint, batch-internal dups separate.
    """
    t_lit = F.lit(float(threshold))
    b_shs = _hashed_shingle_docs(
        _widen_narrow_input(batch), id_col, text_col, shingle_size
    ).localCheckpoint()
    dftab = dfinc.groupBy("sh").agg(F.sum("df").alias("df"))
    b_sh = b_shs.select("doc", F.size("shs").alias("n"), F.explode("shs").alias("sh"))
    b_ranked = b_sh.join(dftab, "sh", "left").withColumn(
        "df", F.coalesce(F.col("df"), F.lit(0).cast("bigint"))
    )
    if max_doc_freq is not None:
        b_ranked = b_ranked.filter(F.col("df") <= max_doc_freq)
    from pyspark.sql import Window

    prefix_len = F.col("n") - F.ceil(t_lit * F.col("n")) + 1
    b_prefix = (
        b_ranked.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc").orderBy(F.asc("df"), F.asc("sh"))
            ),
        )
        .filter(F.col("rn") <= prefix_len)
        .filter(F.col("df") > 0)
        .select(F.col("doc").alias("bdoc"), F.col("n").alias("bn"), "sh")
    )
    idx = entries.select(F.col("sh"), F.col("doc").alias("cdoc"), F.col("n").alias("cn"))
    if max_doc_freq is not None:
        idx = idx.join(dftab.filter(F.col("df") <= max_doc_freq).select("sh"), "sh")
    cand = (
        b_prefix.join(
            idx,
            (b_prefix["sh"] == idx["sh"])
            & (F.col("cn") >= t_lit * F.col("bn"))
            & (F.col("bn") >= t_lit * F.col("cn")),
        )
        .select("bdoc", "cdoc")
        .distinct()
    )
    return _admission_decisions(b_shs, docs, cand, batch, id_col, threshold)
