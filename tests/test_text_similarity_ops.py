"""Golden tests for the redaction and embedding-quantization operators
(SURVEY §2.10 X3/X4) on crafted inputs the synthetic corpus can't
exercise (real PII shapes, zero vectors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cbts_datalake_synnex_spark.operators.similarity import normalize_quantize
from cbts_datalake_synnex_spark.operators.text import redact


import pytest

# Certification tier (round 14): excluded from the default driver-budget
# run via pytest.ini; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


def test_redact_pii_shapes(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com card 4111-1111-2222-3333 ok"),
            (2, "nothing sensitive here"),
            (3, None),
        ],
        "id bigint, text string",
    )
    out = redact(
        df,
        "text",
        {
            r"[\w.+-]+@[\w-]+\.[\w.]+": "[EMAIL]",
            r"\d[\d-]{7,}\d": "[CARD]",
        },
    ).collect()
    rows = {r["id"]: r.asDict() for r in out}
    assert rows[1]["redacted"] == "mail [EMAIL] card [CARD] ok"
    assert rows[1]["redacted_n"] == 2
    assert rows[2]["redacted"] == "nothing sensitive here"
    assert rows[2]["redacted_n"] == 0
    assert rows[3]["redacted"] is None  # null text passes through


def test_normalize_quantize_golden(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    rows = {r["vec_id"]: r.asDict() for r in normalize_quantize(df, "embedding", "vec_id").collect()}
    # [3,4] → norm 5, unit (0.6, 0.8) → (76, 102) with half-up floor
    assert rows[1]["l2_norm"] == 5.0
    assert rows[1]["q_vec"] == "76,102"
    # zero vector: defined, not NaN
    assert rows[2]["l2_norm"] == 0.0 and rows[2]["q_vec"] == ""
    # negative components round half-up toward +inf: -127 stays -127
    assert rows[3]["q_vec"] == "-127,0"


def test_hash_sample_partitioning_invariant(spark):
    """The whole point vs df.sample(): identical rows regardless of
    partitioning, and salt derives an independent sample."""
    from cbts_datalake_synnex_spark.operators.sampling import hash_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in hash_sample(df.repartition(17), "doc_id", 0.3).collect()}
    assert a == b
    assert 0.25 < len(a) / 2000 < 0.35
    salted = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.3, salt="ep2").collect()}
    assert salted != a


def test_stratified_hash_sample_rates(spark):
    from cbts_datalake_synnex_spark.operators.sampling import stratified_hash_sample

    df = (
        spark.range(0, 3000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("rare"))
    )
    out = stratified_hash_sample(df, "doc_id", "lang", {"en": 0.1}, default_fraction=1.0)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["rare"] == 2000          # default 1.0 keeps everything
    assert 50 < counts["en"] < 150         # ~10% of 1000


def test_python_udtf_equals_codegen_expansion(spark, sf_dir):
    """The mapInPandas table-function escape hatch must produce exactly
    the rows of the codegen explode/transform path."""
    from cbts_datalake_synnex_spark.workload import REGISTRY

    a = (
        REGISTRY["udtf_bigrams"].fn(spark, sf_dir).toPandas()
        .sort_values("bigram").reset_index(drop=True)
    )
    b = (
        REGISTRY["udtf_python_bigrams"].fn(spark, sf_dir).toPandas()
        .sort_values("bigram").reset_index(drop=True)
    )
    assert a.equals(b)


def test_approx_percentiles_within_quantile_bracket(spark, sf_dir):
    """The sketch's accuracy contract: each approx percentile must land
    inside the exact neighboring-quantile bracket (approx returns a
    real element; exact interpolates — value-equality is the wrong
    check, rank-neighborhood is the right one)."""
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.workload import REGISTRY
    from cbts_datalake_synnex_spark.workload.base import load_table

    # The registry query now carries the bracket claim itself (p±0.01
    # exact bounds + in-bracket booleans, the oracle-able surface);
    # every boolean must hold, and brackets must be sane.
    ap = REGISTRY["f_approx_percentiles"].fn(spark, sf_dir).toPandas().set_index("event_type")
    assert len(ap) > 0
    assert ap["p50_in_bracket"].all(), ap[~ap["p50_in_bracket"]]
    assert ap["p95_in_bracket"].all(), ap[~ap["p95_in_bracket"]]
    assert (ap["p50_lo"] <= ap["p50_hi"]).all()
    assert (ap["p95_lo"] <= ap["p95_hi"]).all()

    # Tail (p99) coverage stays at operator level: the sketch element
    # must land inside the exact q97..q100 neighborhood.
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    tail = (
        e.groupBy("event_type")
        .agg(
            F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("ap99"),
            F.percentile("value", F.lit(0.97)).alias("q970"),
            F.percentile("value", F.lit(1.0)).alias("q1000"),
        )
        .toPandas()
        .set_index("event_type")
    )
    for et, row in tail.iterrows():
        assert row["q970"] <= row["ap99"] <= row["q1000"], (
            f"{et} p99 {row['ap99']} outside [{row['q970']}, {row['q1000']}]"
        )


def test_banded_interval_join_exactness(spark):
    """Band boundaries: every (point ∈ [lo,hi]) pair appears exactly
    once, including points on band edges and intervals spanning
    multiple bands."""
    from cbts_datalake_synnex_spark.operators.joins import banded_interval_join

    pts = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 9, 10, 11, 19, 20, 25, 99])],
        "pid bigint, t bigint",
    )
    iv = spark.createDataFrame(
        [(100, 0, 9), (200, 5, 25), (300, 10, 10), (400, 90, 120)],
        "iid bigint, lo bigint, hi bigint",
    )
    got = {
        (r["pid"], r["iid"])
        for r in banded_interval_join(pts, iv, "t", "lo", "hi", band_width=10).collect()
    }
    pts_v = {0: 0, 1: 9, 2: 10, 3: 11, 4: 19, 5: 20, 6: 25, 7: 99}
    expect = {
        (p, i)
        for p, v in pts_v.items()
        for i, (lo, hi) in {100: (0, 9), 200: (5, 25), 300: (10, 10), 400: (90, 120)}.items()
        if lo <= v <= hi
    }
    assert got == expect


def test_redact_interacting_patterns_count_matches_scrub(spark):
    """ADVICE: the audit count must reflect what was ACTUALLY scrubbed
    when patterns interact — an earlier replacement consuming a later
    pattern's match must not be double-counted."""
    df = spark.createDataFrame([(1, "card 1234-5678 pin 99")], "id bigint, text string")
    out = redact(
        df,
        "text",
        {
            r"\d{4}-\d{4}": "[CARD]",  # consumes the digits a later pattern would see
            r"\d+": "[NUM]",
        },
    ).collect()[0]
    assert out["redacted"] == "card [CARD] pin [NUM]"
    # original-text counting would say 1 + 3 = 4; chain-aware says 2
    assert out["redacted_n"] == 2


def test_token_pack_boundary_and_partitioning_invariance(spark):
    """Packing is defined by (shard, order key) alone: a document whose
    first token lands at the budget boundary starts the next bin, and
    physical repartitioning must not change any assignment."""
    from cbts_datalake_synnex_spark.operators.packing import token_pack

    rows = [
        # shard a: token counts 3, 3, 2 with budget 4 →
        # starts 0,3,6 → bins 0,0,1 (doc 2 straddles 4 but STARTS in bin 0)
        ("a", 1, "x y z"),
        ("a", 2, "p q r"),
        ("a", 3, "m n"),
        # shard b packs independently from offset 0
        ("b", 1, "a b c d e"),
        ("b", 2, "f"),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, text string")
    expect = {("a", 1): 0, ("a", 2): 0, ("a", 3): 1, ("b", 1): 0, ("b", 2): 1}

    for layout in (df, df.repartition(7), df.repartition(1)):
        packed = token_pack(layout, "text", "source", "doc_id", budget=4)
        got = {(r["source"], r["doc_id"]): r["bin_id"] for r in packed.collect()}
        assert got == expect


def test_decontaminate_drops_only_overlapping_docs(spark):
    """A corpus doc sharing >= min_overlap distinct trigrams with the
    benchmark must be dropped; partial overlap below the bar survives."""
    from cbts_datalake_synnex_spark.operators.decontaminate import (
        contamination_report,
        decontaminate,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            # full copy → 6 shared trigrams → contaminated
            (1, "the quick brown fox jumps over the lazy dog"),
            # shares exactly 2 trigrams ("quick brown fox", "brown fox jumps") → kept
            (2, "a quick brown fox jumps away from here now"),
            # no overlap → kept
            (3, "completely different words in this sentence entirely"),
        ],
        "doc_id bigint, text string",
    )
    rep = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in contamination_report(corpus, bench, "doc_id", "text", n=3, min_overlap=3).collect()
    }
    assert rep[1][1] is True and rep[1][0] >= 3
    assert rep[2] == (2, False)
    assert rep[3] == (0, False)
    kept = {r["doc_id"] for r in decontaminate(corpus, bench, "doc_id", "text", n=3, min_overlap=3).collect()}
    assert kept == {2, 3}


def test_contamination_report_broadcasts_benchmark(spark):
    """The benchmark shingle set must broadcast — shuffling the corpus
    against it would be the wrong plan at 100 TB."""
    from cbts_datalake_synnex_spark.operators.decontaminate import contamination_report
    from cbts_datalake_synnex_spark.plans.inspect import explain_str

    bench = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    corpus = spark.createDataFrame([(2, "a b c e")], "doc_id bigint, text string")
    txt = explain_str(contamination_report(corpus, bench, "doc_id", "text"), "simple")
    assert "BroadcastHashJoin" in txt or "BroadcastExchange" in txt


def test_edit_distance_pairs_matches_brute_force(spark):
    """Inverted-index candidate generation must be lossless: compare
    against the all-pairs brute force on a mixed corpus that exercises
    both the long path and the short-string path (incl. a cross pair
    straddling the length boundary)."""
    from itertools import combinations

    from cbts_datalake_synnex_spark.operators.dedup import edit_distance_pairs

    words = [
        "small ring", "small ping", "small ring",          # sub + exact dup
        "blue bolt", "blue bolts",                          # insertion
        "red widget", "ted widget",                         # first-char sub
        "ab", "ac", "b", "abc",                             # short-string path
        "aaaaaa", "aaaaab",                                 # degenerate gram sets
        "zzzz", "completely different phrase",
    ]
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id long, txt string")
    for k in (1, 2):
        got = {
            (r["doc1"], r["doc2"], r["dist"])
            for r in edit_distance_pairs(df, "id", "txt", max_dist=k).collect()
        }

        def lev(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            return dp[-1]

        want = {
            (i, j, lev(a, b))
            for (i, a), (j, b) in combinations(rows, 2)
            if lev(a, b) <= k
        }
        assert got == want, f"k={k}: {got ^ want}"


def test_mixture_resample_is_subset_at_target_rates(spark):
    """Resample must equal stratified_hash_sample at the computed
    clamped rates (same hash keying) and never emit oversample dups."""
    from cbts_datalake_synnex_spark.operators.sampling import (
        mixture_resample,
        mixture_weights,
        stratified_hash_sample,
    )

    rows = [(i, "en" if i % 10 < 6 else ("de" if i % 2 else "fr")) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, lang string")
    out = mixture_resample(df, "id", "lang", {"en": 0.3}, default_target=0.35)
    got = {(r["id"], r["lang"]) for r in out.collect()}
    assert got <= set(rows) and len(got) == out.count()  # subset, no dups
    w = {
        r["lang"]: min(1.0, r["target_frac"] / r["actual_frac"])
        for r in mixture_weights(df, "lang", {"en": 0.3}, default_target=0.35).collect()
    }
    ref = stratified_hash_sample(df, "id", "lang", w)
    assert got == {(r["id"], r["lang"]) for r in ref.collect()}
    # the dominant stratum was actually downsampled toward the target
    n_en = sum(1 for _, l in got if l == "en")
    assert 0 < n_en < 600


def test_ngram_jaccard_df_cap_collapses_candidates(spark):
    """The max_doc_freq skew guard (SURVEY §2.10 X2, the 100 TB
    stop-gram hazard): on a corpus where every doc shares one stop
    token, uncapped candidate generation is all-pairs quadratic; the
    cap collapses it to the rare-gram pairs while the VERIFIED output
    (exact full-set Jaccard on survivors) is unchanged."""
    from cbts_datalake_synnex_spark.operators.dedup import (
        _rare_shingle_candidates,
        _shingles,
        ngram_jaccard_pairs,
    )

    # 120 docs, all containing stop token "the"; two true near-dup
    # pairs whose similarity is carried by rare tokens.
    rows = [(i, f"the unique{i} filler{i}") for i in range(116)]
    rows += [
        (200, "the alpha beta gamma delta"),
        (201, "the alpha beta gamma epsilon"),
        (300, "the omega sigma tau"),
        (301, "the omega sigma tau"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from pyspark.sql import functions as F

    sh = df.select(
        F.col("doc_id").alias("doc"),
        F.explode(F.array_distinct(_shingles("text", 1))).alias("sh"),
    )
    n_uncapped = _rare_shingle_candidates(sh, max_doc_freq=10**9).count()
    n_capped = _rare_shingle_candidates(sh, max_doc_freq=5).count()
    # stop token "the" links all 120 docs → 7140 uncapped pairs; the
    # cap leaves only the pairs sharing a rare token.
    assert n_uncapped == 120 * 119 // 2
    assert n_capped == 2, f"expected 2 rare-gram candidates, got {n_capped}"

    uncapped = {
        (r["doc1"], r["doc2"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.6).collect()
    }
    capped = {
        (r["doc1"], r["doc2"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.6, max_doc_freq=5
        ).collect()
    }
    assert uncapped == capped == {(200, 201, 0.666667), (300, 301, 1.0)}


def test_edit_distance_df_cap_preserves_pairs(spark):
    """Same guard on the q-gram inverted index: a shared frequent
    prefix gram must not re-create the quadratic join; true pairs whose
    identity rests on rare grams survive the cap with identical
    distances."""
    from cbts_datalake_synnex_spark.operators.dedup import edit_distance_pairs

    # 100 long strings sharing the prefix "common-" (its grams are
    # frequent) but pairwise ≥2 edits apart (triple-repeated digits),
    # plus one true dist-1 pair distinguished by rare suffix grams.
    rows = [(i, f"common-{str(i) * 3}-filler") for i in range(100)]
    rows += [
        (200, "common-rare-alpha-suffix-x"),
        (201, "common-rare-alpha-suffix-y"),
    ]
    df = spark.createDataFrame(rows, "id long, txt string")
    got_uncapped = {
        (r["doc1"], r["doc2"], r["dist"])
        for r in edit_distance_pairs(df, "id", "txt", max_dist=1).collect()
    }
    got_capped = {
        (r["doc1"], r["doc2"], r["dist"])
        for r in edit_distance_pairs(
            df, "id", "txt", max_dist=1, max_doc_freq=20
        ).collect()
    }
    assert (200, 201, 1) in got_capped
    assert got_capped == got_uncapped


def test_winnow_fingerprint_edge_cases_match_python_reference(spark):
    """Winnowing contract against a pure-Python reference: selection =
    distinct min-per-window of md5-derived gram hashes, with graceful
    degradation for docs shorter than k tokens or with fewer grams than
    the window."""
    import hashlib

    from cbts_datalake_synnex_spark.operators.text import winnow_fingerprint

    k, w = 3, 4
    docs = {
        1: "a b c d e f g h",          # normal
        2: "a b",                      # < k tokens → whole-text gram
        3: "a b c",                    # exactly k → one gram
        4: "x x x x x x",              # repetitive → collapses to one hash
    }

    def gram_hash(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16)

    def ref(text: str) -> set[int]:
        toks = text.split(" ")
        n_grams = max(len(toks) - k + 1, 1)
        hs = [gram_hash(" ".join(toks[i : i + k])) for i in range(n_grams)]
        n_win = max(len(hs) - w + 1, 1)
        return {min(hs[j : j + w]) for j in range(n_win)}

    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprint(df, "doc_id", "text", k=k, window=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    assert got == {i: ref(t) for i, t in docs.items()}


def test_remove_boilerplate_spans_golden(spark):
    """A span shared by two docs is removed from BOTH (vs span_dedup's
    first-occurrence-wins); unique spans survive; a fully-boilerplate
    doc comes back empty with all spans counted as dropped."""
    from cbts_datalake_synnex_spark.operators.dedup import remove_boilerplate_spans

    boiler = "b0 b1 b2 b3"
    df = spark.createDataFrame(
        [
            (1, boiler + " u0 u1 u2 u3"),
            (2, boiler + " v0 v1 v2 v3"),
            (3, boiler),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_boilerplate_spans(
            df, "doc_id", "text", span_tokens=4, max_doc_freq=1
        ).collect()
    }
    assert out[1]["clean_text"] == "u0 u1 u2 u3"
    assert out[2]["clean_text"] == "v0 v1 v2 v3"
    assert out[3]["clean_text"] == ""
    assert out[3]["spans_kept"] == 0 and out[3]["spans_dropped"] == 1
    assert out[1]["spans_dropped"] == 1 and out[1]["spans_kept"] == 1


def test_canonical_by_priority_golden(spark):
    """Identical content from several sources keeps the best-priority
    member (id tiebreak on equal priority); unique content survives."""
    from cbts_datalake_synnex_spark.operators.dedup import canonical_by_priority

    df = spark.createDataFrame(
        [
            (1, "same text", 5),
            (2, "same text", 1),  # winner: best priority
            (3, "same text", 1),  # loses tiebreak to lower id
            (4, "unique", 9),
        ],
        "doc_id bigint, text string, prio int",
    )
    out = canonical_by_priority(df, ["text"], "doc_id", F.col("prio")).collect()
    by_id = {r["doc_id"]: r.asDict() for r in out}
    assert set(by_id) == {2, 4}
    assert by_id[2]["n_copies"] == 3 and by_id[2]["priority"] == 1
    assert by_id[4]["n_copies"] == 1


def test_fixed_n_per_stratum_exact_counts_and_invariance(spark):
    """Exactly n per stratum (all rows for small strata), identical
    selection regardless of input partitioning (hash order, not
    rand())."""
    from cbts_datalake_synnex_spark.operators.sampling import fixed_n_per_stratum

    rows = [(i, "big" if i < 40 else "small") for i in range(43)]
    df = spark.createDataFrame(rows, "id bigint, grp string")
    out = fixed_n_per_stratum(df, ["grp"], "id", n=5, salt="t").collect()
    by_grp: dict[str, list[int]] = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["id"])
    assert len(by_grp["big"]) == 5
    assert sorted(by_grp["small"]) == [40, 41, 42]  # stratum < n: all kept
    # partitioning invariance
    out2 = fixed_n_per_stratum(df.repartition(7), ["grp"], "id", n=5, salt="t").collect()
    assert {(r["grp"], r["id"]) for r in out} == {(r["grp"], r["id"]) for r in out2}


def test_label_outliers_flags_far_vector(spark):
    """A vector far from its label centroid is flagged; the tight
    cluster members are not."""
    from cbts_datalake_synnex_spark.operators.similarity import label_outliers

    tight = [(i, [1.0 + 0.01 * i, 0.0], 0) for i in range(8)]
    far = [(100, [50.0, 50.0], 0)]
    df = spark.createDataFrame(tight + far, "vec_id bigint, embedding array<float>, label int")
    out = {r["vec_id"]: r.asDict() for r in label_outliers(df, "vec_id", "embedding").collect()}
    assert out[100]["is_outlier"] is True
    assert all(not out[i]["is_outlier"] for i in range(8))


def test_admission_two_batch_loop(spark):
    """The continuous-ingestion loop: corpus grows ONLY by admitted
    docs, and the next batch is checked against the GROWN corpus — a
    doc near-duplicating an admitted batch-1 doc is rejected in
    batch 2."""
    from cbts_datalake_synnex_spark.operators.dedup import admission_against_corpus

    base = "alpha beta gamma delta epsilon zeta eta theta"
    other = "one two three four five six seven eight"
    corpus = spark.createDataFrame([(1, base)], "doc_id bigint, text string")
    batch1 = spark.createDataFrame(
        [
            (10, base + " extra"),  # near-dup of corpus doc 1 → rejected
            (11, other),  # novel → admitted
        ],
        "doc_id bigint, text string",
    )
    r1 = {
        r["doc_id"]: r.asDict()
        for r in admission_against_corpus(
            corpus, batch1, "doc_id", "text", threshold=0.7, shingle_size=1
        ).collect()
    }
    assert r1[10]["admitted"] is False and r1[10]["blocked_by"] == 1
    assert r1[11]["admitted"] is True and r1[11]["blocked_by"] is None

    admitted1 = batch1.filter(F.col("doc_id").isin([k for k, v in r1.items() if v["admitted"]]))
    corpus2 = corpus.unionByName(admitted1)

    batch2 = spark.createDataFrame(
        [
            (20, other + " more"),  # near-dup of ADMITTED doc 11 → rejected
            (21, "nine ten eleven twelve thirteen fourteen"),  # novel
        ],
        "doc_id bigint, text string",
    )
    r2 = {
        r["doc_id"]: r.asDict()
        for r in admission_against_corpus(
            corpus2, batch2, "doc_id", "text", threshold=0.7, shingle_size=1
        ).collect()
    }
    assert r2[20]["admitted"] is False and r2[20]["blocked_by"] == 11
    assert r2[21]["admitted"] is True


def test_epoch_shuffle_invariants(spark):
    """Deterministic permutation: positions are a contiguous 0..n-1
    range per shard, identical across physical partitionings; a new
    epoch yields a different order of the same rows."""
    from cbts_datalake_synnex_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "id bigint")
    out = epoch_shuffle(df, "id", n_shards=4, epoch=0).collect()
    assert len(out) == 200
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # partitioning invariance: same (id, shard, pos) on any layout
    out2 = epoch_shuffle(df.repartition(13), "id", n_shards=4, epoch=0).collect()
    assert {(r["id"], r["shard"], r["pos"]) for r in out} == {
        (r["id"], r["shard"], r["pos"]) for r in out2
    }
    # a new epoch is an independent permutation of the SAME rows
    out_e1 = epoch_shuffle(df, "id", n_shards=4, epoch=1).collect()
    assert {r["id"] for r in out_e1} == {r["id"] for r in out}
    assert {(r["id"], r["shard"], r["pos"]) for r in out_e1} != {
        (r["id"], r["shard"], r["pos"]) for r in out
    }


def test_cosine_topk_arrow_matches_jvm_fold(spark):
    """The Arrow GEMM path must land the identical (query, cand,
    cosine, rank) rows as the JVM higher-order-fold baseline."""
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_arrow,
    )

    base = spark.range(300).select(
        F.col("id").alias("vid"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (F.xxhash64(F.col("id"), i) % 1000).cast("float") / 1000.0,
        ).alias("vec"),
    )
    qs = base.filter("vid < 5")
    a = {tuple(r) for r in cosine_topk(base, qs, "vid", "vec", k=4).collect()}
    b = {tuple(r) for r in cosine_topk_arrow(base, qs, "vid", "vec", k=4).collect()}
    assert a == b and len(a) == 5 * 4


def test_minhash_bucket_cap_identical_on_normal_corpus(spark):
    """Buckets at/under max_bucket_width are untouched: capped output
    is bit-identical to uncapped on a normal (non-template) corpus."""
    from cbts_datalake_synnex_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 7} jumps over the lazy dog {i % 7} again")
         for i in range(40)],
        "id bigint, text string",
    )
    kw = dict(threshold=0.5, num_perm=16, bands=4)
    capped = dedup.minhash_lsh_pairs(docs, "id", "text", **kw).orderBy(
        "doc1", "doc2").collect()
    uncapped = dedup.minhash_lsh_pairs(
        docs, "id", "text", max_bucket_width=10 ** 9, **kw
    ).orderBy("doc1", "doc2").collect()
    assert capped == uncapped and len(capped) > 0


def test_minhash_bucket_cap_bounds_adversarial_template_corpus(spark):
    """A 1k-copy boilerplate template lands in ONE band bucket; the
    clique is ~500k pairs PER BAND. The width cap must keep the
    candidate set linear while the template cluster stays CONNECTED
    (what dedup_clusters consumes)."""
    from cbts_datalake_synnex_spark.operators import dedup

    template = "identical boilerplate navigation footer text " * 4
    rows = [(i, template) for i in range(1000)]
    rows += [(2000 + i, f"unique real document number {i} with its own words {i}")
             for i in range(5)]
    docs = spark.createDataFrame(rows, "id bigint, text string")
    shing = dedup._hashed_shingle_docs(docs, "id", "text", 3).cache()
    # candidate volume: linear (chains), not quadratic (cliques)
    from pyspark.sql import functions as F
    sig = shing.select("doc", *dedup._minhash_cols("shs", 16))
    band_structs = [
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.col(f"h{b * 4 + r}") for r in range(4)]).alias("bh"))
        for b in range(4)
    ]
    buckets = sig.select(
        "doc", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    n_cand = dedup._lsh_candidates(buckets, 16).count()
    assert n_cand < 10_000, f"candidate set not bounded: {n_cand}"

    pairs = dedup.minhash_lsh_pairs(
        docs, "id", "text", threshold=0.9, num_perm=16, bands=4,
        shingles=shing, max_bucket_width=16,
    )
    clusters = dedup.dedup_clusters(pairs)
    # every template copy resolves to ONE canonical representative
    canon = clusters.filter(F.col("doc") < 2000).select("canonical").distinct()
    assert canon.count() == 1
    assert clusters.filter(F.col("doc") < 2000).count() == 1000
    shing.unpersist()


def test_cosine_topk_auto_routes_by_dimension(spark):
    """engine='auto' sends wide embeddings (>= ARROW_LANE_MIN_DIM) down
    the Arrow GEMM lane and keeps narrow ones on the JVM fold; both
    lanes return identical rows (equivalence pinned below)."""
    from cbts_datalake_synnex_spark.operators import similarity

    def _emb(n, d):
        rows = [(i, [float(((i * 31 + j * 17) % 97) - 48) / 48 for j in range(d)])
                for i in range(n)]
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    narrow = _emb(50, 64)
    wide = _emb(50, 128)
    jvm_plan = similarity.cosine_topk(
        narrow, narrow.filter("vec_id < 4"), "vec_id", "embedding", k=3
    )._jdf.queryExecution().executedPlan().toString()
    arrow_plan = similarity.cosine_topk(
        wide, wide.filter("vec_id < 4"), "vec_id", "embedding", k=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in jvm_plan
    assert "MapInPandas" in arrow_plan
    # routing is a throughput decision only: identical rows either way
    a = similarity.cosine_topk(
        wide, wide.filter("vec_id < 4"), "vec_id", "embedding", k=3, engine="jvm"
    ).orderBy("query_id", "rank").collect()
    b = similarity.cosine_topk(
        wide, wide.filter("vec_id < 4"), "vec_id", "embedding", k=3, engine="arrow"
    ).orderBy("query_id", "rank").collect()
    assert a == b


def test_semantic_dedup_crafted_groups(spark):
    """SemDeDup golden: three near-identical groups + singletons. Every
    higher-id group member is dropped with dup_of = the group's lowest
    id; singletons and group minima are kept."""
    from cbts_datalake_synnex_spark.operators import similarity

    def v(base, eps):
        return [float(b) + eps for b in base]

    b1, b2, b3 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]
    rows = [
        (1, v(b1, 0.0)), (2, v(b1, 0.001)), (3, v(b1, 0.002)),   # group A
        (10, v(b2, 0.0)), (11, v(b2, 0.001)),                     # group B
        (20, v(b3, 0.0)), (21, v(b3, 0.001)),                     # group C
        (30, [0.5, -0.5, 0.5, -0.5]),                             # singleton
        (31, [-0.5, 0.5, -0.5, 0.5]),                             # anti-parallel
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    res = {
        r["id"]: r
        for r in similarity.semantic_dedup(
            emb, "vec_id", "embedding", threshold=0.95, n_cells=4, n_assign=3
        ).collect()
    }
    assert len(res) == 9
    kept = {i for i, r in res.items() if r["keep"]}
    assert kept == {1, 10, 20, 30, 31}
    assert res[2]["dup_of"] == 1 and res[3]["dup_of"] == 1
    assert res[11]["dup_of"] == 10
    assert res[21]["dup_of"] == 20
    assert res[2]["dup_cosine"] >= 0.95


def test_semantic_dedup_empty_and_order_invariance(spark):
    """Empty input returns the declared schema; result is independent
    of input partitioning (md5-sampled training + deterministic
    tiebreaks)."""
    from cbts_datalake_synnex_spark.operators import similarity

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = similarity.semantic_dedup(empty, "vec_id", "embedding")
    assert out.count() == 0
    assert set(out.columns) == {"id", "cell", "keep", "dup_of", "dup_cosine"}

    rows = [(i, [float((i * 13 + j * 7) % 23) / 23 for j in range(8)]) for i in range(40)]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # exact copies
    emb1 = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    emb2 = emb1.repartition(7)
    r1 = similarity.semantic_dedup(emb1, "vec_id", "embedding", threshold=0.99).orderBy("id").collect()
    r2 = similarity.semantic_dedup(emb2, "vec_id", "embedding", threshold=0.99).orderBy("id").collect()
    assert r1 == r2
    dropped = {r["id"]: r["dup_of"] for r in r1 if not r["keep"]}
    for i in range(5):
        assert dropped.get(100 + i) == i, f"copy {100+i} must dedup to {i}"


def test_apply_bpe_merges_golden(spark):
    """Hand-computed BPE inference: priority order wins, merged tokens
    cascade into later merges, non-matching text passes through."""
    from cbts_datalake_synnex_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "a b c a b"),
            (2, "ab c"),          # 'ab' is ONE regex token already
            (3, "x y z"),
            (4, None),
        ],
        "id bigint, text string",
    )
    merges = [("a", "b"), ("ab", "c")]
    got = {r["id"]: r["tokens"] for r in T.apply_bpe_merges(df, "text", merges).collect()}
    # doc1: a b c a b -> ab c ab -> abc ab (priority: (a,b) first, then (ab,c))
    assert got[1] == ["abc", "ab"]
    assert got[2] == ["abc"]
    assert got[3] == ["x", "y", "z"]
    assert got[4] == []


def test_bpe_train_then_apply_removes_top_pair(spark):
    """Pipeline property: after applying the corpus's top merge, that
    pair no longer occurs adjacently anywhere in the tokenized output."""
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators import text as T

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i} the quick dog") for i in range(20)],
        "id bigint, text string",
    )
    top = T.bpe_pair_stats(docs, "text", k=1).collect()[0]
    tokenized = T.apply_bpe_merges(docs, "text", [(top["t1"], top["t2"])])
    pairs_after = (
        tokenized.select(
            F.explode(
                F.expr(
                    "zip_with(slice(tokens, 1, greatest(size(tokens) - 1, 0)),"
                    " slice(tokens, 2, greatest(size(tokens) - 1, 0)),"
                    " (a, b) -> struct(a AS t1, b AS t2))"
                )
            ).alias("p")
        )
        .filter((F.col("p.t1") == top["t1"]) & (F.col("p.t2") == top["t2"]))
        .count()
    )
    assert pairs_after == 0


def test_gopher_quality_flags_crafted(spark):
    """Pin the Gopher gates on crafted shapes: a clean doc passes, a
    bullet list fails the bullet gate, symbol spam fails the symbol
    gate, a short doc fails word count, numeric soup fails the
    alphabetic gate."""
    from cbts_datalake_synnex_spark.operators import text as T

    clean = " ".join(["sentence with ordinary readable words here"] * 10)
    bullets = "\n".join([f"- item {i} ok" for i in range(10)])
    symbols = " ".join(["woah ###"] * 60)
    short = "too short"
    numbers = " ".join(["12345 67890"] * 50)
    df = spark.createDataFrame(
        [(1, clean), (2, bullets), (3, symbols), (4, short), (5, numbers)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in T.gopher_quality_flags(df, "text").collect()}
    assert got[1]["gopher_pass"] is True
    assert got[2]["ok_bullet_lines"] is False and got[2]["gopher_pass"] is False
    assert got[3]["ok_symbol_ratio"] is False
    assert got[4]["ok_word_count"] is False
    assert got[5]["ok_alpha_words"] is False
    # ratio sanity
    assert got[2]["bullet_line_frac"] == 1.0
    assert got[5]["alpha_word_frac"] == 0.0


def test_c4_clean_crafted(spark):
    """C4 rules on crafted pages: good prose survives; short lines,
    no-terminal-punctuation lines, and javascript lines are removed;
    lorem-ipsum and curly-brace pages drop entirely."""
    from cbts_datalake_synnex_spark.operators import text as T

    good = "\n".join(
        ["This is a perfectly ordinary readable sentence."] * 4
    )
    mixed = "\n".join([
        "This line has terminal punctuation and enough words.",
        "too short.",                           # < 5 words
        "No terminal punctuation here at all",  # no [.!?"] ending
        "Please enable javascript to continue reading this.",
        "Another perfectly fine sentence with enough words here.",
    ])
    lorem = good + "\nLorem Ipsum dolor sit amet."
    code = good + "\nfunction f() { return 1; }"
    df = spark.createDataFrame(
        [(1, good), (2, mixed), (3, lorem), (4, code)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in T.c4_clean(df, "text").collect()}
    assert got[1]["c4_keep"] is True and got[1]["n_kept_lines"] == 4
    assert got[2]["n_kept_lines"] == 2
    assert got[2]["c4_keep"] is False  # only 2 lines survive, min is 3
    assert "javascript" not in got[2]["c4_text"]
    assert got[3]["has_lorem_ipsum"] is True and got[3]["c4_keep"] is False
    assert got[4]["has_curly_brace"] is True and got[4]["c4_keep"] is False


def test_pii_report_counts_and_redact_roundtrip(spark):
    """The report counts matches and containing docs per shape, and
    after redacting with the SAME patterns the report reads zero —
    the before/after compliance loop."""
    from cbts_datalake_synnex_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com and alice@test.org plus card 4111-1111-2222-3333"),
            (2, "server at 10.0.0.1 and phone 555-123-4567"),
            (3, "nothing sensitive at all"),
        ],
        "doc_id bigint, text string",
    )
    row = T.pii_report(df, "text").collect()[0]
    assert row["n_docs"] == 3
    assert row["email_matches"] == 2 and row["email_docs"] == 1
    assert row["card_matches"] == 1 and row["card_docs"] == 1
    assert row["ipv4_matches"] == 1 and row["ipv4_docs"] == 1
    assert row["phone_matches"] == 1 and row["phone_docs"] == 1

    scrubbed = T.redact(
        df, "text", {p: f"<{n}>" for n, p in T.DEFAULT_PII_PATTERNS.items()}
    ).select(F.col("redacted").alias("text"))
    after = T.pii_report(scrubbed, "text").collect()[0]
    for n in T.DEFAULT_PII_PATTERNS:
        assert after[f"{n}_matches"] == 0, n


def test_minhash_star_cap_mixed_bucket_bounded_recall_loss(spark):
    """The star-cap recall contract, pinned on a HETEROGENEOUS over-cap
    bucket (hash pileup: two distinct template families colliding into
    one band bucket, so most members are NOT near-dups of the hub).
    Within the piled-up band the cap keeps only hub spokes — the second
    family's internal pairs are deliberately absent there (the bounded,
    per-band cost of the cap) — but the family still produces its full
    clique through its OWN bucket in another band, which is how the LSH
    band structure recovers the pairs in practice."""
    from cbts_datalake_synnex_spark.operators import dedup

    rows = []
    for i in range(10):
        rows.append((i, 0, 7))          # family A in the shared bucket
        rows.append((100 + i, 0, 7))    # family B piled into the SAME bucket
        rows.append((i, 1, 11))         # band 1: family A alone
        rows.append((100 + i, 1, 13))   # band 1: family B alone
    buckets = spark.createDataFrame(rows, "doc bigint, band int, bh bigint")

    cand = dedup._lsh_candidates(buckets, max_bucket_width=16).collect()
    pairs = {(r["doc1"], r["doc2"]) for r in cand}
    # band 0 (width 20 > cap 16) contributes ONLY hub spokes (hub = doc 0)
    assert {p for p in pairs if p[0] == 0} == {(0, d) for d in list(range(1, 10)) + list(range(100, 110))}
    # family B's clique is fully present via its under-cap band-1 bucket
    expect_b = {(a, b) for a in range(100, 110) for b in range(a + 1, 110)}
    assert {p for p in pairs if p[0] >= 100} == expect_b

    # with ONLY the piled-up band, family B's internal pairs are lost —
    # the documented conditional: star connectivity survives verification
    # only through pairs the hub can verify
    cand0 = dedup._lsh_candidates(buckets.filter("band = 0"), 16).collect()
    assert all(r["doc1"] == 0 for r in cand0)


def test_admission_candidates_probe_only_shape(spark):
    """The admission gate's scale contract: candidate generation PROBES
    the corpus-side index with batch prefixes — corpus-internal
    duplication contributes ZERO candidates. A corpus of 200 identical
    docs (a ~20k-pair self-join under the old tagged-union shape) plus
    a novel batch doc must yield an empty candidate set; a batch doc
    that IS a near-dup yields corpus-partnered candidates only."""
    from cbts_datalake_synnex_spark.operators import dedup

    template = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(i, template) for i in range(200)], "doc_id bigint, text string"
    )
    novel = spark.createDataFrame(
        [(9000, "one two three four five six seven eight nine ten")],
        "doc_id bigint, text string",
    )
    c_shs = dedup._hashed_shingle_docs(corpus, "doc_id", "text", 1)
    b_shs = dedup._hashed_shingle_docs(novel, "doc_id", "text", 1)
    assert dedup._admission_candidates(c_shs, b_shs, 0.7).count() == 0

    near = spark.createDataFrame(
        [(9001, template + " extra")], "doc_id bigint, text string"
    )
    n_shs = dedup._hashed_shingle_docs(near, "doc_id", "text", 1)
    cand = dedup._admission_candidates(c_shs, n_shs, 0.7).collect()
    assert len(cand) > 0
    assert all(r["bdoc"] == 9001 and r["cdoc"] < 200 for r in cand)

    # end-to-end: the near-dup batch doc is blocked by the lowest id
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.admission_against_corpus(
            corpus, novel.unionByName(near), "doc_id", "text",
            threshold=0.7, shingle_size=1,
        ).collect()
    }
    assert out[9000]["admitted"] is True
    assert out[9001]["admitted"] is False and out[9001]["blocked_by"] == 0


def test_corpus_hygiene_pipeline_composition(spark):
    """The composed Gopher → C4 → PII plan on crafted docs: PII is
    counted ONLY on the cleaned text of documents that survive BOTH
    gates — a failing doc's PII must not leak into the report, and a
    surviving doc's PII dropped by the C4 line filter must not either."""
    from cbts_datalake_synnex_spark.operators import text as T

    good_body = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6).strip()
    docs = spark.createDataFrame(
        [
            # survives both gates; email sits on a kept (>=5-word) line
            (1, good_body + "\nwrite to alice@example.com for the details please"),
            # survives gates, but its email line has <5 words -> line dropped by C4
            (2, good_body + "\nbob@example.com wrote this"),
            # fails Gopher (too short); its email must not be counted
            (3, "short spam carol@example.com"),
            # passes Gopher, fails C4 page gate (curly brace)
            (4, good_body + " { dave@example.com"),
        ],
        "doc_id bigint, text string",
    )
    flags = T.c4_clean(
        T.gopher_quality_flags(docs, "text"), "text",
        min_kept_lines=1, line_terminal_punct=False,
    )
    from pyspark.sql import functions as F

    hygiene = F.col("gopher_pass") & F.col("c4_keep")
    got = {r["doc_id"]: r.asDict() for r in flags.select("doc_id", "gopher_pass", "c4_keep").collect()}
    assert got[1]["gopher_pass"] and got[1]["c4_keep"]
    assert got[2]["gopher_pass"] and got[2]["c4_keep"]
    assert not got[3]["gopher_pass"]
    assert got[4]["gopher_pass"] and not got[4]["c4_keep"]

    st = F.when(hygiene, F.col("c4_text"))
    pat = T.DEFAULT_PII_PATTERNS["email"]
    cnt = F.regexp_count(st, F.lit(pat))
    row = flags.agg(
        F.coalesce(F.sum(cnt), F.lit(0)).cast("bigint").alias("email_matches"),
        F.coalesce(F.sum((cnt > 0).cast("int")), F.lit(0)).cast("bigint").alias("email_docs"),
    ).collect()[0]
    # only doc 1's email survives: doc 2's line was C4-dropped, doc 3
    # failed Gopher, doc 4 failed the page gate
    assert row["email_matches"] == 1 and row["email_docs"] == 1


def test_semantic_dedup_assignment_lanes_equivalent(spark):
    """The JVM HOF cell assignment and the Arrow GEMM lane must land
    the identical (id, cell, keep, dup_of, dup_cosine) rows — routing
    is a throughput decision only (the cosine_topk contract, extended
    to SemDeDup's cell scoring and its per-cell pair GEMM)."""
    from cbts_datalake_synnex_spark.operators import similarity

    rows = [(i, [float(((i * 29 + j * 13) % 83) - 41) / 41 for j in range(32)])
            for i in range(240)]
    # a few exact duplicates so keep/dup_of paths are exercised
    rows += [(1000 + i, rows[i][1]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    kw = dict(threshold=0.6, n_cells=24, n_assign=2)
    a = {tuple(r) for r in similarity.semantic_dedup(
        df, "vec_id", "embedding", assign_engine="jvm", **kw).collect()}
    b = {tuple(r) for r in similarity.semantic_dedup(
        df, "vec_id", "embedding", assign_engine="arrow", **kw).collect()}
    assert a == b and len(a) == 246
    dropped = {r[0] for r in a if not r[2]}
    assert {1000 + i for i in range(6)} <= dropped


def test_repetition_flags_crafted_docs(spark):
    """Gopher repetition gates on hand-checkable shapes: a clean doc
    passes every gate; a line-duplicated doc fails the line gates; a
    'spam spam …' degenerate fails the n-gram gates with fractions
    CAPPED at 1.0 (overlapping occurrences multiply-count chars)."""
    from cbts_datalake_synnex_spark.operators import text as T

    # every word distinct across the whole doc — nothing repeats at any n
    clean = "\n".join(
        " ".join(f"w{i}x{j}" for j in range(8)) for i in range(6)
    )
    dup_lines = "\n".join(["the very same line again"] * 4 + ["one different line"])
    spammy = " ".join(["spam"] * 40)
    docs = spark.createDataFrame(
        [(1, clean), (2, dup_lines), (3, spammy)], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in T.repetition_flags(docs, "text").collect()}

    assert out[1]["repetition_pass"] is True
    assert out[1]["dup_line_frac"] == 0.0 and out[1]["dup_10gram_char_frac"] == 0.0

    # 4 copies of one line out of 5: 3 beyond-first duplicates
    assert out[2]["dup_line_frac"] == round(3 / 5, 6)
    assert out[2]["ok_dup_line_frac"] is False
    assert out[2]["repetition_pass"] is False

    assert out[3]["top_2gram_char_frac"] == 1.0  # capped
    assert out[3]["dup_5gram_char_frac"] == 1.0
    assert out[3]["ok_top_2gram_char_frac"] is False
    assert out[3]["repetition_pass"] is False

    # paragraph gates: two identical paragraphs out of three
    para_doc = "first para here\n\nsame body of text\n\nsame body of text"
    pd_out = T.repetition_flags(
        spark.createDataFrame([(9, para_doc)], "doc_id bigint, text string"), "text"
    ).collect()[0]
    assert pd_out["dup_para_frac"] == round(1 / 3, 6)
    assert pd_out["ok_dup_para_frac"] is False  # 0.333333 exceeds the 0.30 gate


def test_leakage_safe_split_invariants(spark):
    """The split contract: near-dup cluster members land in ONE split
    (zero cross-split pairs), singletons split independently, the
    assignment is deterministic across physical partitionings, and the
    test fraction is hash-plausible on singletons."""
    from cbts_datalake_synnex_spark.operators import dedup, sampling

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, base + f" tail{i}") for i in range(10)]          # one near-dup cluster
    rows += [(100 + i, f"unique{i} words{i} only{i} here{i} really{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.7, shingle_size=1)
    out = sampling.leakage_safe_split(docs, pairs, "doc_id", test_frac=0.3, salt="t")
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert len(got) == 50

    # the cluster is atomic: one canonical (the min id 0), one split
    cluster = [got[i] for i in range(10)]
    assert {c["canonical"] for c in cluster} == {0}
    assert len({c["split"] for c in cluster}) == 1
    # no cross-split near-dup pair anywhere
    p = {(r["doc1"], r["doc2"]) for r in pairs.collect()}
    assert all(got[a]["split"] == got[b]["split"] for a, b in p)
    # singletons: canonical = self, both splits present at 30%
    singles = [got[100 + i] for i in range(40)]
    assert all(s["canonical"] == s["doc_id"] for s in singles)
    n_test = sum(1 for s in singles if s["split"] == "test")
    assert 3 <= n_test <= 25

    # partitioning invariance
    out2 = sampling.leakage_safe_split(
        docs.repartition(13), pairs, "doc_id", test_frac=0.3, salt="t"
    )
    assert {tuple(r) for r in out2.collect()} == {tuple(r) for r in out.collect()}


def test_admission_corpus_index_reuse_roundtrip(spark, tmp_path):
    """The nightly-batch contract: the corpus shingle projection can be
    materialized ONCE (here: parquet roundtrip), and admission runs
    against the loaded index with identical output — the corpus text
    is never re-tokenized per batch."""
    from cbts_datalake_synnex_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(i, base + f" v{i}") for i in range(20)], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame(
        [(900, base + " v1 extra"), (901, "totally different words here now")],
        "doc_id bigint, text string",
    )
    kw = dict(id_col="doc_id", text_col="text", threshold=0.7, shingle_size=1)
    direct = {tuple(r) for r in dedup.admission_against_corpus(corpus, batch, **kw).collect()}

    idx_path = str(tmp_path / "corpus_shingle_index")
    dedup.hashed_shingles(corpus, "doc_id", "text", 1).write.parquet(idx_path)
    loaded = spark.read.parquet(idx_path)
    reused = {
        tuple(r)
        for r in dedup.admission_against_corpus(
            corpus, batch, corpus_shingles=loaded, **kw
        ).collect()
    }
    assert reused == direct and len(direct) == 2
    blocked = {r[0]: r for r in direct}
    assert blocked[900][1] is False and blocked[901][1] is True


def test_collapse_repeated_lines_shapes(spark):
    """First occurrence survives in ORIGINAL order; interleaved repeats
    drop; paragraphs unit works; a clean doc is untouched."""
    from cbts_datalake_synnex_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "nav menu\nreal content one.\nnav menu\nreal content two.\nnav menu"),
            (2, "only\nunique\nlines"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in T.collapse_repeated_lines(docs, "text").collect()}
    assert out[1]["collapsed_text"] == "nav menu\nreal content one.\nreal content two."
    assert out[1]["n_units"] == 5 and out[1]["n_kept_units"] == 3
    assert out[2]["collapsed_text"] == "only\nunique\nlines"

    para = spark.createDataFrame(
        [(3, "intro para\n\nbody text here\n\nintro para\n\nclosing words")],
        "doc_id bigint, text string",
    )
    p = T.collapse_repeated_lines(para, "text", unit="paragraph").collect()[0]
    assert p["collapsed_text"] == "intro para\n\nbody text here\n\nclosing words"
    assert p["n_units"] == 4 and p["n_kept_units"] == 3


def test_truncate_embeddings_and_matryoshka_report(spark):
    """Truncation golden: prefix slice + renormalize ([3,4,0,0] at d=2
    -> (0.6, 0.8)); zero vectors stay zero; the report's retention is
    exactly ||v[:d']||/||v|| with full-dim retention 1."""
    from cbts_datalake_synnex_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 0.0, 0.0]), (2, [0.0, 0.0, 0.0, 0.0]), (3, [1.0, 0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    t = {r["vec_id"]: r["embedding"] for r in S.truncate_embeddings(df, "embedding", 2).collect()}
    assert [round(x, 6) for x in t[1]] == [0.6, 0.8]
    assert t[2] == [0.0, 0.0]
    assert [round(x, 6) for x in t[3]] == [1.0, 0.0]

    rep = {r["d_prime"]: r.asDict() for r in S.matryoshka_report(
        df, "vec_id", "embedding", dims=(2, 4)).collect()}
    assert rep[4]["avg_retention"] == 1.0 and rep[4]["n_vectors"] == 3
    # d'=2: v1 keeps all mass (1.0), v2 zero -> defined as 1.0 (nothing
    # to lose), v3 sqrt(1/2)
    import math
    expect = round((1.0 + 1.0 + math.sqrt(0.5)) / 3, 6)
    assert abs(rep[2]["avg_retention"] - expect) <= 1e-6
    assert abs(rep[2]["min_retention"] - round(math.sqrt(0.5), 6)) <= 1e-6
    assert abs(rep[2]["frac_ge_090"] - round(2 / 3, 6)) <= 1e-6


def test_temperature_mixture_weights_properties(spark):
    """alpha=1 reproduces the natural distribution (all weights 1);
    alpha<1 upweights the rare stratum and downweights the common one;
    targets always sum to 1."""
    from cbts_datalake_synnex_spark.operators.sampling import temperature_mixture_weights

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id bigint, lang string",
    )
    nat = {r["lang"]: r.asDict() for r in temperature_mixture_weights(df, "lang", alpha=1.0).collect()}
    assert nat["big"]["weight"] == 1.0 and nat["small"]["weight"] == 1.0

    t = {r["lang"]: r.asDict() for r in temperature_mixture_weights(df, "lang", alpha=0.3).collect()}
    assert abs(t["big"]["target_frac"] + t["small"]["target_frac"] - 1.0) < 1e-6
    assert t["small"]["weight"] > 1.0 > t["big"]["weight"]
    # hand-computed: p_big = 0.9^0.3, p_small = 0.1^0.3
    import math
    pb, ps = 0.9 ** 0.3, 0.1 ** 0.3
    assert abs(t["small"]["target_frac"] - round(ps / (pb + ps), 6)) <= 1e-6


# --- perplexity_buckets (round 8, CCNet terciles) -------------------------


def test_perplexity_buckets_terciles(spark):
    """Six docs in one group with strictly increasing perplexity split
    2/2/2; a second group shows cutoffs are computed per group."""
    from cbts_datalake_synnex_spark.operators.text import perplexity_buckets

    # 'common' appears everywhere; docs with more distinct rare words
    # have lower avg unigram logprob => higher ppl. Construct docs
    # whose ppl strictly increases with i by diluting 'common' runs
    # with unique tokens.
    rows = []
    for i in range(6):
        text = " ".join(["common"] * (6 - i) + [f"rare{i}_{j}" for j in range(i)])
        rows.append((i, "g1", text))
    rows.append((10, "g2", "common common"))
    rows.append((11, "g2", "only rare tokens here"))
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(df, "doc_id", "text", "lang").collect()
    }
    g1_ppl = {
        r["doc_id"]: r["ppl"]
        for r in perplexity_buckets(df, "doc_id", "text", "lang")
        .filter(F.col("lang") == "g1")
        .collect()
    }
    order = sorted(g1_ppl, key=lambda k: g1_ppl[k])
    assert [out[k] for k in order] == ["head", "head", "middle", "middle", "tail", "tail"]
    # per-group cutoffs: the 2-doc g2 group splits ceil(2/3)=1 head,
    # ceil(4/3)=2 middle, nothing in tail
    assert out[10] == "head" and out[11] == "middle"


def test_perplexity_buckets_all_tied_is_all_head(spark):
    from cbts_datalake_synnex_spark.operators.text import perplexity_buckets

    df = spark.createDataFrame(
        [(i, "en", "same text every time") for i in range(9)],
        "doc_id bigint, lang string, text string",
    )
    out = perplexity_buckets(df, "doc_id", "text", "lang").collect()
    assert len(out) == 9 and all(r["bucket"] == "head" for r in out)


def test_perplexity_buckets_partitioning_invariant(spark):
    from cbts_datalake_synnex_spark.operators.text import perplexity_buckets

    rows = [
        (i, ["en", "fr"][i % 2], f"w{i % 3} w{i % 5} common common w{i % 7}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    a = sorted(map(tuple, perplexity_buckets(df, "doc_id", "text", "lang").collect()))
    b = sorted(
        map(
            tuple,
            perplexity_buckets(df.repartition(13), "doc_id", "text", "lang").collect(),
        )
    )
    assert a == b


def test_interval_overlap_join_exactness_and_no_dups(spark):
    """Round 10: every overlapping (left, right) interval pair appears
    EXACTLY once (meet-band attribution, no dedup pass), including
    pairs overlapping across several bands and touching at a single
    point; disjoint pairs never appear."""
    from cbts_datalake_synnex_spark.operators.joins import interval_overlap_join

    lv = {1: (0, 9), 2: (5, 25), 3: (30, 30), 4: (90, 120)}
    rv = {10: (9, 9), 20: (8, 35), 30: (26, 29), 40: (121, 130), 50: (40, 85)}
    left = spark.createDataFrame(
        [(k, lo, hi) for k, (lo, hi) in lv.items()], "lid bigint, l_lo bigint, l_hi bigint"
    )
    right = spark.createDataFrame(
        [(k, lo, hi) for k, (lo, hi) in rv.items()], "rid bigint, r_lo bigint, r_hi bigint"
    )
    rows = interval_overlap_join(
        left, right, "l_lo", "l_hi", "r_lo", "r_hi", band_width=10
    ).collect()
    got = [(r["lid"], r["rid"]) for r in rows]
    expect = {
        (l, r)
        for l, (llo, lhi) in lv.items()
        for r, (rlo, rhi) in rv.items()
        if llo <= rhi and rlo <= lhi
    }
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    assert set(got) == expect
    # spot-check the tricky members: single-point touch (1,10), wide
    # spanning interval (4 overlaps 20? no — disjoint), (2,20) multi-band
    assert (1, 10) in expect and (2, 20) in expect and (4, 40) not in expect


def test_interval_overlap_join_avoids_nested_loop(spark):
    from cbts_datalake_synnex_spark.operators.joins import interval_overlap_join
    from cbts_datalake_synnex_spark.plans.inspect import explain_str

    left = spark.range(100).select(
        (F.col("id") * 10).alias("l_lo"), (F.col("id") * 10 + 15).alias("l_hi")
    )
    right = spark.range(100).select(
        (F.col("id") * 7).alias("r_lo"), (F.col("id") * 7 + 12).alias("r_hi")
    )
    plan = explain_str(
        interval_overlap_join(left, right, "l_lo", "l_hi", "r_lo", "r_hi", 16),
        "simple",
    )
    assert "NestedLoop" not in plan, plan


def test_cdc_chunks_realign_after_insertion(spark):
    """The content-defined property: prepending tokens shifts every
    position, yet most chunk hashes survive (boundaries are local);
    fixed-stride chunking loses essentially all of them. Also checks
    the chunk partition is exact: chunks tile the doc."""
    from cbts_datalake_synnex_spark.operators.text import cdc_chunks, chunk_text

    base = " ".join(f"tok{i}" for i in range(400))
    edited = "zz1 zz2 zz3 " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id bigint, text string"
    )
    rows = cdc_chunks(df, "doc_id", "text", k=3, divisor=8).collect()
    by_doc: dict = {1: [], 2: []}
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    # exact tiling: starts/lengths partition [1, n]
    for doc, text in ((1, base), (2, edited)):
        n = len(text.split(" "))
        chs = sorted(by_doc[doc], key=lambda r: r["start_tok"])
        assert chs[0]["start_tok"] == 1
        assert sum(c["n_toks"] for c in chs) == n
        for a, b in zip(chs, chs[1:]):
            assert a["start_tok"] + a["n_toks"] == b["start_tok"]
    sha1 = {r["chunk_sha"] for r in by_doc[1]}
    sha2 = {r["chunk_sha"] for r in by_doc[2]}
    cdc_overlap = len(sha1 & sha2) / len(sha1)
    assert cdc_overlap >= 0.8, f"CDC chunk survival {cdc_overlap:.2f}"
    # fixed-stride baseline on the same pair: alignment destroyed
    fx = chunk_text(df, "doc_id", "text", chunk_tokens=8, stride=8).collect()
    f1 = {r["chunk"] for r in fx if r["doc_id"] == 1}
    f2 = {r["chunk"] for r in fx if r["doc_id"] == 2}
    fixed_overlap = len(f1 & f2) / len(f1)
    assert fixed_overlap < 0.2, f"fixed-stride survived {fixed_overlap:.2f}?"


def test_normalize_url_hand_goldens(spark):
    from cbts_datalake_synnex_spark.operators.text import normalize_url, url_domain

    cases = [
        # (input, normalized, domain)
        ("HTTPS://WWW.Site.COM/A/b/?utm_source=x&id=7#frag",
         "https://site.com/A/b?id=7", "site.com"),
        ("http://site.com/a/b?id=7&fbclid=zz&q=1",
         "http://site.com/a/b?id=7&q=1", "site.com"),
        ("https://Sub.SITE.com/Path/", "https://sub.site.com/Path", "sub.site.com"),
        ("https://site.com", "https://site.com", "site.com"),
        ("https://www.site.com/?utm_medium=a&utm_term=b",
         "https://site.com", "site.com"),
        ("https://site.com:8080/x?ref=rss", "https://site.com:8080/x", "site.com"),
        ("  https://site.com/x  ", "https://site.com/x", "site.com"),
        # scheme-less input: path logic only, empty domain
        ("site.com/a/", "site.com/a", ""),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _, _) in enumerate(cases)],
                               "i int, url string")
    rows = {r["i"]: r for r in df.select(
        "i",
        normalize_url("url").alias("n"),
        url_domain("url").alias("d"),
    ).collect()}
    for i, (u, want_n, want_d) in enumerate(cases):
        assert rows[i]["n"] == want_n, (u, rows[i]["n"], want_n)
        assert rows[i]["d"] == want_d, (u, rows[i]["d"], want_d)


def test_domain_cap_share_and_tail_preservation(spark):
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators.sampling import domain_cap

    # hot domain: 5000 of 10000 rows; tail: 50 domains x 100
    df = spark.range(0, 10000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 5000, F.lit("hot.com"))
        .otherwise(F.concat(F.lit("d"), (F.col("id") % 50).cast("string")))
        .alias("dom"),
    )
    out = domain_cap(df, "dom", "doc_id", max_share=0.1, salt="s")
    counts = {r["dom"]: r["c"] for r in
              out.groupBy("dom").agg(F.count(F.lit(1)).alias("c")).collect()}
    # tail domains are under the cap: every row kept
    assert all(counts[f"d{i}"] == 100 for i in range(50))
    # hot domain gated to an expected 1000 rows (binomial, n=5000,
    # p=0.2 -> 5 sigma ~ 141)
    assert 850 <= counts["hot.com"] <= 1150
    # idempotent: re-running the cap on its own output keeps all rows
    # (every domain is now under the cap against the ORIGINAL total,
    # and the gate is deterministic)
    again = domain_cap(out, "dom", "doc_id", max_share=0.2, salt="s")
    assert again.count() == out.count()


def test_sliding_chunks_coverage_and_tail(spark):
    """Round 12: every token covered, stride grid respected, tail
    window untruncated, short docs yield one whole-doc chunk."""
    from cbts_datalake_synnex_spark.operators.text import sliding_chunks

    text = " ".join(f"t{i}" for i in range(1, 11))  # 10 tokens
    df = spark.createDataFrame(
        [(1, text), (2, "a b c")], "doc_id bigint, text string"
    )
    rows = {(r["doc_id"], r["chunk_id"]): r for r in
            sliding_chunks(df, "doc_id", "text", window_toks=4, stride=3).collect()}
    d1 = sorted(k[1] for k in rows if k[0] == 1)
    # starts: 1, 4, 7 (grid), tail start = 10-4+1 = 7 (dedup with grid)
    assert d1 == [0, 1, 2]
    assert rows[(1, 0)]["chunk"] == "t1 t2 t3 t4"
    assert rows[(1, 2)]["start_tok"] == 7 and rows[(1, 2)]["n_toks"] == 4
    assert rows[(1, 2)]["chunk"] == "t7 t8 t9 t10"  # untruncated tail
    # short doc: one whole-doc chunk
    d2 = [k for k in rows if k[0] == 2]
    assert d2 == [(2, 0)]
    assert rows[(2, 0)]["chunk"] == "a b c" and rows[(2, 0)]["n_toks"] == 3
    # coverage: union of [start, start+n) spans all 10 tokens
    covered = set()
    for k, r in rows.items():
        if k[0] == 1:
            covered |= set(range(r["start_tok"], r["start_tok"] + r["n_toks"]))
    assert covered == set(range(1, 11))


def test_domain_cap_null_domains_form_their_own_group(spark):
    """Round-12 fix: NULL domains must be budgeted like any other
    domain, never silently dropped by a NULL equi-join."""
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators.sampling import domain_cap

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("d"), (F.col("id") % 10).cast("string")))
        .alias("dom"),
    )
    out = domain_cap(df, "dom", "doc_id", max_share=0.2, salt="n")
    null_kept = out.filter(F.col("dom").isNull()).count()
    # NULL group holds 50% of rows, capped to an expected 20% of 1000
    assert 120 <= null_kept <= 280
    # tail domains (50 rows = 5% each) keep everything
    assert out.filter(F.col("dom").isNotNull()).count() == 500
    # schema untouched
    assert out.columns == ["doc_id", "dom"]
