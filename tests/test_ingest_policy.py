"""Ingest-policy chain tests (SURVEY §5.2-2 goldens + §5.2-3
hypothesis properties): P4 flatten, P8 NA-drop, P5 stringify, P6
sanitize, P7 dedup-columns."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cbts_datalake_synnex_spark.functions.ingest_policy import (
    MAX_STRING_LEN,
    apply_ingest_policy,
    drop_duplicate_columns,
    flatten_structs,
    sanitize_column_names,
    sanitize_types_for_catalog,
    stringify_columns,
)


def _df_from_records(spark, records):
    lines = [json.dumps(r, default=str) for r in records]
    return spark.read.json(spark.sparkContext.parallelize(lines, 1))


def test_flatten_nested_structs(spark):
    df = _df_from_records(spark, [{"a": {"b": {"c": 1}, "d": "x"}, "e": 2}])
    out = flatten_structs(df)
    assert sorted(out.columns) == ["a_b_c", "a_d", "e"]


def test_flatten_leaves_arrays_unexploded(spark):
    # json_normalize keeps lists as object values (SURVEY §7); the
    # stringify step then JSON-encodes them.
    df = _df_from_records(spark, [{"tags": ["x", "y"], "n": 1}])
    out = stringify_columns(flatten_structs(df))
    row = out.collect()[0]
    assert row["tags"] == '["x","y"]'


def test_stringify_scrubs_and_truncates(spark):
    df = _df_from_records(spark, [{"s": "nan", "t": None, "long": "a" * 20000}])
    out = stringify_columns(df)
    row = out.collect()[0]
    assert row["s"] == ""
    assert row["t"] == ""
    assert len(row["long"]) == MAX_STRING_LEN


def test_all_na_column_dropped(spark):
    df = _df_from_records(spark, [{"keep": 1, "gone": None}, {"keep": 2, "gone": None}])
    out = apply_ingest_policy(df)
    assert "gone" not in out.columns and "keep" in out.columns


def test_sanitize_and_dedup_columns(spark):
    df = _df_from_records(spark, [{"PO Number": 1, "po-number": 2, "9lives": 3}])
    out = drop_duplicate_columns(sanitize_column_names(df))
    assert out.columns.count("po_number") == 1
    assert "_9lives" in out.columns


def test_type_whitelist_degrades_to_string(spark):
    df = spark.createDataFrame([([1, 2], {"k": "v"}, 1)], "arr array<int>, m map<string,string>, n int")
    out = sanitize_types_for_catalog(df)
    types = dict(out.dtypes)
    assert types["arr"] == "string" and types["m"] == "string" and types["n"] == "int"


# ----------------------------------------------------------------------
# Property-based (SURVEY §5.2-3): random nested records → invariants.
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(max_size=30),
)
_keys = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" -_."),
    min_size=1,
    max_size=12,
)
_records = st.lists(
    st.dictionaries(
        _keys,
        st.one_of(_scalars, st.dictionaries(_keys, _scalars, max_size=3)),
        min_size=1,
        max_size=5,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(records=_records)
def test_ingest_policy_invariants(spark, records):
    df = _df_from_records(spark, records)
    if not df.columns:  # all-empty dicts infer a zero-column frame
        return
    out = apply_ingest_policy(df)
    # row count preserved
    assert out.count() == len(records)
    # names sanitized & unique
    assert len(set(out.columns)) == len(out.columns)
    for c in out.columns:
        assert c == c.lower() and all(ch.isalnum() or ch == "_" for ch in c)
    # all values strings ≤ cap, never literal 'nan'/'None'
    for row in out.collect():
        for v in row:
            assert v is not None and isinstance(v, str)
            assert len(v) <= MAX_STRING_LEN
            assert v not in ("nan", "None", "NaN")


def test_ingest_policy_idempotent(spark):
    df = _df_from_records(spark, [{"A B": {"c": 1}, "x": None, "y": "ok"}])
    once = apply_ingest_policy(df)
    twice = apply_ingest_policy(once)
    assert once.columns == twice.columns
    assert [tuple(r) for r in once.collect()] == [tuple(r) for r in twice.collect()]
