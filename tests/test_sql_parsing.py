"""Pure-function tests for the SQL-dispatch parsers (no Spark session):
_split_assignments must round-trip arbitrary comma/paren/quote nesting,
because a mis-split assignment would silently UPDATE the wrong columns.
"""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from cbts_datalake_synnex_spark.engine import _split_assignments


def test_basic_assignments():
    assert _split_assignments("a = 1, b = 2") == {"a": "1", "b": "2"}


def test_commas_inside_function_args_and_strings():
    got = _split_assignments(
        "v = concat(a, ',', b), n = coalesce(n, 0) + 1, s = 'x, = y'"
    )
    assert got == {
        "v": "concat(a, ',', b)",
        "n": "coalesce(n, 0) + 1",
        "s": "'x, = y'",
    }


def test_escaped_quote_inside_literal():
    got = _split_assignments("s = 'it''s, fine', t = 2")
    assert got == {"s": "'it''s, fine'", "t": "2"}


def test_equals_inside_expression_splits_on_first():
    got = _split_assignments("flag = CASE WHEN a = b THEN 1 ELSE 0 END")
    assert got == {"flag": "CASE WHEN a = b THEN 1 ELSE 0 END"}


def test_backticked_column_and_brackets():
    got = _split_assignments("`weird col` = arr[1], b = map('k,1', 2)['k,1']")
    assert got == {"weird col": "arr[1]", "b": "map('k,1', 2)['k,1']"}


def test_malformed_raises():
    with pytest.raises(ValueError, match="malformed"):
        _split_assignments("just_a_column_no_equals")


# Property: for ANY set of (col, expr) pairs whose exprs are built from
# a comma/paren/quote-rich alphabet but are individually well-formed
# (balanced parens, closed strings), joining then splitting round-trips.
_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)


@st.composite
def _expr(draw):
    base = draw(
        st.lists(
            st.one_of(
                st.from_regex(r"[A-Za-z0-9_+\-*/ .<>!]{1,8}", fullmatch=True),
                _ident.map(lambda f: f + "(x, y)"),
                st.from_regex(r"[A-Za-z0-9 ,=']{0,8}", fullmatch=True).map(
                    lambda s: "'" + s.replace("'", "''") + "'"
                ),
            ),
            min_size=1,
            max_size=4,
        )
    )
    out = " ".join(base).strip()
    return out or "1"


@given(st.dictionaries(_ident, _expr(), min_size=1, max_size=5))
def test_split_assignments_round_trips(pairs):
    joined = ", ".join(f"{c} = {e}" for c, e in pairs.items())
    got = _split_assignments(joined)
    assert got == {c: e.strip() for c, e in pairs.items()}
