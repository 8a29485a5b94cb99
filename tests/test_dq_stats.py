"""PSI drift + corpus vocabulary report goldens."""

from __future__ import annotations

import math

from cbts_datalake_synnex_spark.operators.dq import psi_drift_report
from cbts_datalake_synnex_spark.operators.text import corpus_token_stats


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, value double")


def test_psi_identical_snapshots_is_zero(spark):
    rows = [("x", float(v)) for v in (1, 2, 3, 40, 41, 99)]
    out = psi_drift_report(
        _mk(spark, rows), _mk(spark, rows), value_col="value",
        strata_col="k", bucket_width=10.0,
    ).collect()
    assert out == [("x", 0.0, False)] or (
        out[0]["psi"] == 0.0 and out[0]["drift_flag"] is False
    )


def test_psi_flags_shifted_distribution(spark):
    a = _mk(spark, [("x", 1.0)] * 50)            # all in bucket 0
    b = _mk(spark, [("x", 95.0)] * 50)           # all in bucket 9
    out = psi_drift_report(a, b, value_col="value", strata_col="k", bucket_width=10.0).collect()
    assert out[0]["psi"] > 0.25
    assert out[0]["drift_flag"] is True


def test_psi_matches_hand_computation(spark):
    # stratum x: snapshot a = [5, 15], b = [5, 5]; width 10, 2 buckets
    a = _mk(spark, [("x", 5.0), ("x", 15.0)])
    b = _mk(spark, [("x", 5.0), ("x", 5.0)])
    out = psi_drift_report(
        a, b, value_col="value", strata_col="k", bucket_width=10.0, n_buckets=2
    ).collect()[0]
    pa = [(1 + 0.5) / (2 + 1.0), (1 + 0.5) / (2 + 1.0)]
    pb = [(2 + 0.5) / (2 + 1.0), (0 + 0.5) / (2 + 1.0)]
    want = sum((x - y) * math.log(x / y) for x, y in zip(pa, pb))
    assert out["psi"] == round(want, 6)


def test_corpus_token_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "a a a a b b c"), (1, "")], "doc_id bigint, text string"
    )
    row = corpus_token_stats(docs, "text", top_n=100).collect()[0]
    assert row["total_tokens"] == 7
    assert row["vocab_size"] == 3
    assert row["hapax_count"] == 1
    assert row["hapax_frac"] == round(1 / 3, 6)
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(f) for f in (4, 2, 1)]
    n = 3
    ax, ay = sum(xs) / n, sum(ys) / n
    slope = (sum(x * y for x, y in zip(xs, ys)) - n * ax * ay) / (
        sum(x * x for x in xs) - n * ax * ax
    )
    assert row["zipf_slope"] == round(slope, 6)


def test_corpus_token_stats_tie_break_on_token(spark):
    # equal frequencies: rank order must be token-ascending, so the
    # report is deterministic across partitionings
    docs = spark.createDataFrame([(0, "b a c")], "doc_id bigint, text string")
    one = corpus_token_stats(docs, "text", top_n=3).collect()[0]
    two = corpus_token_stats(
        spark.createDataFrame([(0, "b a c")], "doc_id bigint, text string").repartition(5),
        "text", top_n=3,
    ).collect()[0]
    assert one == two
    assert one["zipf_slope"] == 0.0  # flat frequencies => slope 0


def test_unicode_normalize_nfc_collapses_combining(spark):
    import pytest

    from cbts_datalake_synnex_spark.operators.text import unicode_normalize

    df = spark.createDataFrame(
        [(0, "école"), (1, "école"), (2, None), (3, "plain")],
        "id bigint, t string",
    )
    out = {r["id"]: r["t"] for r in unicode_normalize(df, "t", form="NFC").collect()}
    assert out[0] == out[1] == "école"   # decomposed == precomposed
    assert out[2] is None                      # null passthrough
    assert out[3] == "plain"
    # NFKC folds compatibility forms (the fi ligature); NFC must not
    df2 = spark.createDataFrame([(0, "ﬁn")], "id bigint, t string")
    nfc = unicode_normalize(df2, "t", form="NFC").collect()[0]["t"]
    nfkc = unicode_normalize(df2, "t", form="NFKC").collect()[0]["t"]
    assert nfc == "ﬁn" and nfkc == "fin"
    with pytest.raises(ValueError):
        unicode_normalize(df2, "t", form="NFX")


def test_unicode_normalize_lane_equivalence(spark):
    """The icu4j JVM lane and the unicodedata Arrow lane must produce
    byte-identical output (the cosine_topk_arrow lane-golden pattern).
    Skips only if the UDF jar genuinely can't load on this image."""
    import pytest
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.functions.jvm_udfs import (
        ensure_unicode_normalize_jvm,
    )
    from cbts_datalake_synnex_spark.operators.text import unicode_normalize

    if ensure_unicode_normalize_jvm(spark) is None:
        pytest.skip("JVM normalization lane unavailable (no jar on this image)")

    hostile = [
        "école décor",            # combining accents (NFC composes)
        "école",                   # precomposed
        "ﬁne ½ ① ㎡ Ⅳ",          # compatibility forms (NFKC folds)
        "가각 각",  # Hangul syllable + jamo sequence
        "ẛ̣ ṩ",                    # multi-step composition chains
        "Å vs Å",  # A+ring vs precomposed Å
        "plain ascii",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(hostile)], "id bigint, t string"
    )
    for form in ("NFC", "NFKC", "NFD", "NFKD"):
        a = unicode_normalize(df, "t", form=form, out_col="n", lane="arrow")
        j = unicode_normalize(df, "t", form=form, out_col="n", lane="jvm")
        digest = lambda d: sorted(
            d.select("id", F.sha2(F.coalesce(F.col("n"), F.lit("\x00null")), 256).alias("h"))
            .collect()
        )
        assert digest(a) == digest(j), form


def test_file_profile_detects_fragmentation(spark, tmp_path):
    """Round 11: metadata-only layout profile — counts files, flags
    100% small-file share on a fragmented table, single file after a
    compacting rewrite."""
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators.dq import file_profile

    db = f"fp_{uuid.uuid4().hex[:8]}"
    root = str(tmp_path / "lake")
    spark.sql(f"CREATE DATABASE {db}")
    try:
        df = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("v"))
        for _ in range(2):
            df.repartition(4, "id").write.mode("append").saveAsTable(f"{db}.t")
        p = file_profile(spark, f"{db}.t").first()
        assert p["n_files"] == 8
        assert p["small_file_share"] == 1.0
        assert p["total_bytes"] > 0 and p["min_bytes"] <= p["max_bytes"]
        spark.table(f"{db}.t").repartition(1).write.mode("overwrite").saveAsTable(
            f"{db}.c"
        )
        assert file_profile(spark, f"{db}.c").first()["n_files"] == 1
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(root, ignore_errors=True)


def test_k_anonymity_buckets_and_violations(spark):
    """Round 11: constructed classes of sizes 1, 3, 6, 12 land in the
    right k=5 buckets with correct shares and violation flags."""
    from cbts_datalake_synnex_spark.operators.dq import k_anonymity_report

    rows = (
        [("a", 1)] * 1 + [("b", 1)] * 3 + [("c", 1)] * 6 + [("d", 1)] * 12
    )
    df = spark.createDataFrame(rows, "qa string, qb int")
    out = {r["size_bucket"]: r for r in k_anonymity_report(df, ["qa", "qb"], k=5).collect()}
    assert set(out) == {"1", "2-4", "5-9", "10+"}
    assert out["1"]["n_classes"] == 1 and out["1"]["n_rows"] == 1
    assert out["2-4"]["n_rows"] == 3 and out["2-4"]["violates_k"]
    assert out["5-9"]["n_rows"] == 6 and not out["5-9"]["violates_k"]
    assert out["10+"]["n_rows"] == 12 and not out["10+"]["violates_k"]
    # shares are rounded 6dp individually; the sum lands within the
    # rounding budget (4 buckets x 5e-7)
    assert abs(sum(r["row_share"] for r in out.values()) - 1.0) <= 2e-6


def test_table_fingerprint_order_insensitive_and_null_distinct(spark):
    """Round 12: fingerprints ignore row order/partitioning; NULL and
    '' canonicalize differently; any one-row change flips the sum."""
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators.dq import table_fingerprint

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "")], "k bigint, v string"
    )
    a = table_fingerprint(df, ["k", "v"]).first()
    b = table_fingerprint(df.repartition(8).orderBy(F.desc("k")), ["k", "v"]).first()
    assert (a["n_rows"], a["content_sum"]) == (b["n_rows"], b["content_sum"])
    # NULL vs '' must not collide
    swapped = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, None)], "k bigint, v string"
    )
    c = table_fingerprint(swapped, ["k", "v"]).first()
    assert c["content_sum"] != a["content_sum"]
    # single-row perturbation detected
    pert = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "x")], "k bigint, v string"
    )
    d = table_fingerprint(pert, ["k", "v"]).first()
    assert d["content_sum"] != a["content_sum"]


def test_l_diversity_buckets_and_null_sentinel(spark):
    from cbts_datalake_synnex_spark.operators.dq import l_diversity_report

    rows = (
        # class A: 3 rows, ONE sensitive value -> bucket '1'
        [("A", "x")] * 3
        # class B: 4 rows, two values (one of them NULL -> its own
        # signature) -> bucket '2-2'
        + [("B", "y"), ("B", "y"), ("B", None), ("B", None)]
        # class C: 3 rows, three values -> bucket '3+'
        + [("C", "p"), ("C", "q"), ("C", "r")]
    )
    df = spark.createDataFrame(rows, "q string, s string")
    got = {
        r["div_bucket"]: (r["n_classes"], r["n_rows"], r["violates_l"])
        for r in l_diversity_report(df, ["q"], "s", l=3).collect()
    }
    assert got == {"1": (1, 3, True), "2-2": (1, 4, True), "3+": (1, 3, False)}


def test_l_diversity_double_digit_l_bucket_labels(spark):
    from cbts_datalake_synnex_spark.operators.dq import l_diversity_report

    # l=10: the '10+' bucket must NOT be flagged as violating (the
    # startswith('1') trap)
    rows = [("A", str(i)) for i in range(12)] + [("B", "x")]
    df = spark.createDataFrame(rows, "q string, s string")
    got = {
        r["div_bucket"]: r["violates_l"]
        for r in l_diversity_report(df, ["q"], "s", l=10).collect()
    }
    assert got == {"10+": False, "1": True}


def test_pseudonymize_null_and_referential_integrity(spark):
    from cbts_datalake_synnex_spark.operators.dq import pseudonymize

    a = spark.createDataFrame([(1, "p"), (2, "q"), (None, "r")], "k int, v string")
    b = spark.createDataFrame([(1,), (1,), (3,)], "k int")
    pa = pseudonymize(a, ["k"], salt="s1")
    pb = pseudonymize(b, ["k"], salt="s1")
    ra = pa.collect()
    # NULL stays NULL; non-NULLs are 32-hex tokens, deterministic per salt
    assert sum(1 for r in ra if r["k"] is None) == 1
    toks = {r["v"]: r["k"] for r in ra if r["k"] is not None}
    assert all(len(t) == 32 for t in toks.values())
    # same salt -> join survives: key 1 matches twice, 3 matches nothing
    assert pa.join(pb, "k").count() == 2
    # different salt -> tokens differ (no accidental linkability)
    pa2 = pseudonymize(a, ["k"], salt="s2")
    assert {r["k"] for r in pa2.collect() if r["k"]}.isdisjoint(set(toks.values()))


def test_mad_outliers_resist_masking(spark):
    from cbts_datalake_synnex_spark.operators.dq import mad_outliers_report

    # classic MASKING geometry: one enormous spike inflates σ so the
    # two moderate (but obvious) spikes hide inside mean±3σ; MAD flags
    # all three
    vals = [("g", 10.0 + (i % 5) * 0.1) for i in range(97)] + [
        ("g", 1e6), ("g", 2000.0), ("g", -2000.0),
    ]
    df = spark.createDataFrame(vals, "g string, v double")
    r = mad_outliers_report(df, ["g"], "v", k=3.0).collect()[0]
    assert r["n_outliers"] == 3 and r["n"] == 100
    # assert the masking premise itself: 3-sigma misses the ±2000 pair
    import statistics

    xs = [v for _, v in vals]
    mu, sd = statistics.fmean(xs), statistics.pstdev(xs)
    assert sum(1 for x in xs if abs(x - mu) > 3 * sd) == 1


def test_mad_zero_degenerate_flags_non_median(spark):
    from cbts_datalake_synnex_spark.operators.dq import mad_outliers_report

    vals = [("g", 5.0)] * 9 + [("g", 6.0)]
    df = spark.createDataFrame(vals, "g string, v double")
    r = mad_outliers_report(df, ["g"], "v", k=3.0).collect()[0]
    assert r["mad"] == 0.0 and r["n_outliers"] == 1
