"""Hypothesis properties for the round-7 text/split operators —
random inputs, engine output checked against a plain-Python
recomputation of the declared semantics (the ingest-policy pattern)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_line = st.text(alphabet="abc xyz", min_size=0, max_size=12)
_doc = st.lists(_line, min_size=0, max_size=8).map("\n".join)


import pytest

# Certification tier (round 14): excluded from the default driver-budget
# run via pytest.ini; run with `pytest -m slow` (see pytest.ini).
pytestmark = pytest.mark.slow


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc, min_size=1, max_size=5))
def test_collapse_lines_matches_python_model(spark, docs):
    from cbts_datalake_synnex_spark.operators.text import collapse_repeated_lines

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["collapsed_text"], r["n_units"], r["n_kept_units"])
        for r in collapse_repeated_lines(df, "text").collect()
    }
    for i, text in enumerate(docs):
        units = [l for l in text.split("\n") if l.strip()]
        seen, kept = set(), []
        for u in units:
            if u not in seen:
                seen.add(u)
                kept.append(u)
        assert got[i] == ("\n".join(kept), len(units), len(kept)), (i, text)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc, min_size=1, max_size=4))
def test_repetition_metrics_bounded_and_flag_consistent(spark, docs):
    from cbts_datalake_synnex_spark.operators.text import (
        GOPHER_REPETITION_THRESHOLDS,
        repetition_flags,
    )

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id bigint, text string")
    for r in repetition_flags(df, "text").collect():
        d = r.asDict()
        ok_all = True
        for name, th in GOPHER_REPETITION_THRESHOLDS.items():
            v = d[name]
            assert 0.0 <= v <= 1.0, (name, v)
            assert d[f"ok_{name}"] == (v <= th), (name, v, th)
            ok_all = ok_all and d[f"ok_{name}"]
        assert d["repetition_pass"] == ok_all
