"""In-engine classifier + DSIR operators — engine output vs a plain
Python recomputation of the declared semantics (the round-7 property
pattern), plus partitioning-invariance."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cbts_datalake_synnex_spark.operators import classify, sampling

_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "zz"])
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)


import pytest

# Certification tier (round 14): excluded from the default driver-budget
# run via pytest.ini; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


def _py_nb(train, score_docs, a=1.0):
    """(doc_id -> (pred, score, n_tokens)) exactly per the operator contract."""
    counts: dict = {}
    totals: dict = {}
    n_docs: dict = {}
    vocab = set()
    for label, text in train:
        n_docs[label] = n_docs.get(label, 0) + 1
        for t in text.split(" "):
            if not t:
                continue
            counts[(label, t)] = counts.get((label, t), 0) + 1
            totals[label] = totals.get(label, 0) + 1
            vocab.add(t)
    all_docs = sum(n_docs.values())
    v = len(vocab)
    out = {}
    for did, text in score_docs:
        toks = [t for t in text.split(" ") if t]
        best = None
        for label in sorted(n_docs):
            s = math.log(n_docs[label] / all_docs)
            tot = totals.get(label, 0)
            for t in toks:
                c = counts.get((label, t), 0)
                s += math.log((c + a) / (tot + a * v))
            s = round(s, 6)
            if best is None or s > best[1]:
                best = (label, s)
        out[did] = (best[0], best[1], len(toks))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    train=st.lists(
        st.tuples(st.sampled_from(["en", "fr"]), _doc), min_size=2, max_size=8
    ).filter(lambda rows: len({l for l, _ in rows}) == 2 and any(t for _, t in rows)),
    score=st.lists(_doc, min_size=1, max_size=5),
)
def test_nb_matches_python_model(spark, train, score):
    tdf = spark.createDataFrame(train, "lang string, text string")
    sdf = spark.createDataFrame(list(enumerate(score)), "doc_id bigint, text string")
    model = classify.nb_train(tdf, text_col="text", label_col="lang")
    got = {
        r["doc_id"]: (r["pred_label"], r["score"], r["n_tokens"])
        for r in classify.nb_score(sdf, model, id_col="doc_id", text_col="text").collect()
    }
    want = _py_nb(train, list(enumerate(score)))
    assert got == want


def test_nb_zero_token_doc_scores_on_prior(spark):
    tdf = spark.createDataFrame(
        [("en", "aa bb"), ("en", "aa"), ("fr", "cc")], "lang string, text string"
    )
    sdf = spark.createDataFrame([(0, "")], "doc_id bigint, text string")
    model = classify.nb_train(tdf, text_col="text", label_col="lang")
    row = classify.nb_score(sdf, model, id_col="doc_id", text_col="text").collect()[0]
    # priors: en 2/3, fr 1/3 — the empty doc goes to the bigger prior
    assert row["pred_label"] == "en"
    assert row["n_tokens"] == 0
    assert row["score"] == round(math.log(2 / 3), 6)


def test_nb_partitioning_invariant(spark):
    rows = [(i, f"w{i % 3} w{i % 5} common", ["en", "fr"][i % 2]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    model = classify.nb_train(df, text_col="text", label_col="lang")
    a = classify.nb_score(df, model, id_col="doc_id", text_col="text")
    model2 = classify.nb_train(df.repartition(7), text_col="text", label_col="lang")
    b = classify.nb_score(df.repartition(13), model2, id_col="doc_id", text_col="text")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _bucket(tok: str, b: int = 10_000) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % b


def _py_dsir(raw, target, b=10_000, a=1.0):
    def lm(docs):
        cnt: dict = {}
        for _, text in docs:
            for t in text.split(" "):
                if t:
                    k = _bucket(t, b)
                    cnt[k] = cnt.get(k, 0) + 1
        tot = sum(cnt.values())
        return cnt, tot

    tc, tt = lm(target)
    rc, rt = lm(raw)
    d_t = math.log(a / (tt + a * b))
    d_r = math.log(a / (rt + a * b))
    out = {}
    for did, text in raw:
        lr, n = 0.0, 0
        for t in text.split(" "):
            if not t:
                continue
            n += 1
            k = _bucket(t, b)
            lp_t = math.log((tc[k] + a) / (tt + a * b)) if k in tc else d_t
            lp_r = math.log((rc[k] + a) / (rt + a * b)) if k in rc else d_r
            lr += lp_t - lp_r
        out[did] = (n, round(lr, 6))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    raw=st.lists(_doc, min_size=1, max_size=6),
    target_idx=st.lists(st.integers(0, 5), min_size=1, max_size=3),
)
def test_dsir_matches_python_model(spark, raw, target_idx):
    raw_rows = list(enumerate(raw))
    target_rows = [raw_rows[i % len(raw_rows)] for i in target_idx]
    rdf = spark.createDataFrame(raw_rows, "doc_id bigint, text string")
    tdf = spark.createDataFrame(target_rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_ratio"])
        for r in sampling.dsir_log_ratio(
            rdf, tdf, id_col="doc_id", text_col="text"
        ).collect()
    }
    assert got == _py_dsir(raw_rows, target_rows)


def test_dsir_prefers_target_like_docs(spark):
    # target speaks 'aa bb'; raw doc 0 mimics it, doc 1 doesn't.
    raw = [(0, "aa bb aa bb"), (1, "zz yy zz yy")]
    target = [(10, "aa bb aa"), (11, "bb aa bb")]
    rdf = spark.createDataFrame(raw, "doc_id bigint, text string")
    tdf = spark.createDataFrame(target, "doc_id bigint, text string")
    got = {r["doc_id"]: r["log_ratio"] for r in
           sampling.dsir_log_ratio(rdf, tdf, id_col="doc_id", text_col="text").collect()}
    assert got[0] > got[1]


# --- binary_auc (round 8) -------------------------------------------------


def _py_auc(pairs):
    """Tie-corrected Mann-Whitney AUC over (score, label) pairs."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    u = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    return round(u / (len(pos) * len(neg)), 6)


def _auc_row(spark, pairs):
    df = spark.createDataFrame(pairs, "s double, y int")
    return classify.binary_auc(df, "s", "y").collect()[0]


def test_binary_auc_goldens(spark):
    # perfect separation
    r = _auc_row(spark, [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)])
    assert (r["auc"], r["n_pos"], r["n_neg"]) == (1.0, 2, 2)
    # perfectly inverted
    assert _auc_row(spark, [(0.9, 0), (0.8, 0), (0.1, 1)])["auc"] == 0.0
    # all scores tied -> chance
    assert _auc_row(spark, [(0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1)])["auc"] == 0.5
    # hand-computed mix: pos at 2 beats neg at 1; pos at 4 beats both -> 3/4
    assert _auc_row(spark, [(1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)])["auc"] == 0.75
    # single-class input: AUC undefined
    r = _auc_row(spark, [(0.3, 1), (0.7, 1)])
    assert r["auc"] is None and r["n_pos"] == 2 and r["n_neg"] == 0


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(
            st.sampled_from([0.0, 0.125, 0.25, 0.5, 0.625, 1.0]),
            st.sampled_from([0, 1]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_binary_auc_matches_python(spark, pairs):
    row = _auc_row(spark, pairs)
    want = _py_auc(pairs)
    assert row["auc"] == want
    assert row["n_pos"] == sum(y for _, y in pairs) or want is None


def test_logreg_train_partition_invariant_and_learns_separable(spark):
    """Round 11: (a) per-step weight rounding makes the GD trajectory
    partitioning-invariant; (b) on a linearly separable set the
    3-step trajectory already classifies perfectly."""
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators.classify import logreg_train

    rows = [(float(i), 1.0 if i >= 50 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y double").select(
        (F.col("x") / 50.0 - 1.0).alias("x"), "y"
    )
    out = logreg_train(df, ["x"], "y", steps=3, lr=4.0)
    row = out.first()
    assert row["n"] == 100
    assert row["w_x"] > 0  # positive slope toward y=1
    assert row["train_acc"] >= 0.95
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(
            tuple,
            logreg_train(df.repartition(13), ["x"], "y", steps=3, lr=4.0).collect(),
        )
    )
    assert a == b


def test_hashing_features_counts_and_determinism(spark):
    """Round 11: bucket counts per doc are exact token-count folds;
    the featurizer is vocabulary-free (unseen tokens still land in
    [0, n_features)) and partitioning-invariant."""
    from pyspark.sql import functions as F

    from cbts_datalake_synnex_spark.operators.classify import hashing_features

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in hashing_features(
        df, "doc_id", "text", n_features=4, scale=1.0
    ).collect()}
    # empty doc has no tokens -> no feature row (joins drop it)
    assert set(out) == {1, 2}
    for r in out.values():
        vals = [r[f"f{i}"] for i in range(4)]
        assert all(v >= 0 for v in vals)
    assert sum(out[1][f"f{i}"] for i in range(4)) == 3.0
    assert sum(out[2][f"f{i}"] for i in range(4)) == 2.0
    # same token always lands in the same bucket: doc1's 'a' count is
    # double doc2's in whichever bucket 'a' hashes to
    diffs = [out[1][f"f{i}"] - out[2][f"f{i}"] for i in range(4)]
    assert sorted(diffs) == [-1.0, 0.0, 0.0, 2.0] or sorted(diffs) == [-1.0, 0.0, 2.0] + [0.0]
    a = sorted(map(tuple, hashing_features(df, "doc_id", "text", 4).collect()))
    b = sorted(
        map(
            tuple,
            hashing_features(df.repartition(5), "doc_id", "text", 4).collect(),
        )
    )
    assert a == b
