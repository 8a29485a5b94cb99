"""Hypothesis properties for the round-11 operators — random inputs,
engine output checked against a plain-Python recomputation of the
declared semantics (the round-7 pattern)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["a", "b", "c", "x", "y", "z", "qq"])
_doc = st.lists(_word, min_size=0, max_size=20).map(" ".join)


import pytest

# Certification tier (round 14): excluded from the default driver-budget
# run via pytest.ini; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


def _py_weighted_jaccard(texts: dict, size: int = 3):
    """Exact weighted-Jaccard pairs over whole-text shingles, plain
    python (tf over word n-grams; whole text if shorter)."""
    tfs = {}
    for d, t in texts.items():
        toks = [w for w in t.split(" ") if w != ""]
        if len(toks) < size:
            grams = [t]
        else:
            grams = [" ".join(toks[i : i + size]) for i in range(len(toks) - size + 1)]
        tfs[d] = Counter(grams)
    out = {}
    ids = sorted(tfs)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            a, b = tfs[d1], tfs[d2]
            smin = sum(min(a[g], b[g]) for g in set(a) & set(b))
            if smin == 0:
                continue
            smax = sum(a.values()) + sum(b.values()) - smin
            out[(d1, d2)] = round(smin / smax, 6)
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc, min_size=2, max_size=6))
def test_weighted_jaccard_matches_python_model(spark, docs):
    from cbts_datalake_synnex_spark.operators.dedup import weighted_jaccard_pairs

    # NOTE: engine tokenization is split(" ") keeping empties out of
    # shingles only via xxhash over tokens — normalize inputs to
    # single-space-joined non-empty docs to stay on the shared contract
    docs = [d if d else "a" for d in docs]
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id bigint, text string")
    got = {
        (r["doc1"], r["doc2"]): r["wjaccard"]
        for r in weighted_jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    want = _py_weighted_jaccard(dict(enumerate(docs)))
    assert got.keys() == want.keys(), (docs, got, want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def _py_heartbeat(ts_batches, thr_us):
    """Reference: resume rows + final state across ordered batches."""
    last = None
    rows = []
    for batch in ts_batches:
        for t in sorted(batch):
            if last is not None and t - last > thr_us:
                rows.append((last, t, t - last))
            last = t
    return rows, last


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=10**7), min_size=1, max_size=40
    ),
    n_splits=st.integers(min_value=1, max_value=4),
    thr=st.integers(min_value=1, max_value=10**6),
)
def test_heartbeat_batch_math_matches_python_model(ts, n_splits, thr):
    """The vectorized per-batch diff/flag math (the same numpy shape
    sessionize/heartbeat use) equals the per-row reference across
    arbitrary TIME-ORDERED batch splits."""
    import numpy as np

    ts = sorted(ts)
    cuts = sorted({len(ts) * i // n_splits for i in range(1, n_splits)})
    batches = []
    prev = 0
    for c in [*cuts, len(ts)]:
        if c > prev:
            batches.append(ts[prev:c])
            prev = c
    want_rows, want_last = _py_heartbeat(batches, thr)

    last = None
    got = []
    for b in batches:
        a = np.asarray(sorted(b), dtype="int64")
        first_prev = a[0] if last is None else last
        prevs = np.concatenate(([first_prev], a[:-1]))
        silent = a - prevs
        hit = silent > thr
        got.extend(
            zip(prevs[hit].tolist(), a[hit].tolist(), silent[hit].tolist())
        )
        last = int(a[-1])
    assert got == want_rows and last == want_last


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(
        st.tuples(
            st.floats(min_value=-2, max_value=2, allow_nan=False),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=3,
        max_size=40,
    )
)
def test_logreg_trajectory_matches_python_model(spark, xs):
    """The engine's 3-step grid-rounded GD equals a plain-python
    recomputation (same rounding at every step)."""
    from cbts_datalake_synnex_spark.operators.classify import logreg_train

    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in xs], "x double, y double"
    )
    row = logreg_train(df, ["x"], "y", steps=3, lr=1.0).first()

    w = [0.0, 0.0]  # (w_x, bias)
    n = len(xs)
    for _ in range(3):
        g = [0.0, 0.0]
        for x, y in xs:
            p = 1.0 / (1.0 + math.exp(-(w[0] * x + w[1])))
            g[0] += (p - y) * x
            g[1] += p - y
        w = [round(w[i] - g[i] / n, 6) for i in range(2)]
    assert abs(row["w_x"] - w[0]) < 1e-9 and abs(row["w_bias"] - w[1]) < 1e-9
    acc = sum(
        1 for x, y in xs
        if (round(1.0 / (1.0 + math.exp(-(w[0] * x + w[1]))), 6) > 0.5) == (y > 0.5)
    ) / n
    assert abs(row["train_acc"] - round(acc, 6)) < 1e-9


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vec=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=12,
    )
)
def test_sq8_roundtrip_error_bound_property(spark, vec):
    from cbts_datalake_synnex_spark.operators.similarity import (
        scalar_quantize,
        sq_dequantized,
    )

    df = spark.createDataFrame([(1, vec)], "vec_id bigint, embedding array<double>")
    q = scalar_quantize(df, "vec_id", "embedding").first()
    dq = sq_dequantized(
        scalar_quantize(df, "vec_id", "embedding"), "vec_id"
    ).first()["dqvec"]
    scale = q["scale"]
    assert all(qv is not None and 0 <= qv <= 255 for qv in q["qvec"])
    for v, r in zip(vec, dq):
        assert abs(v - r) <= scale / 2 + 1e-9, (v, r, scale)
