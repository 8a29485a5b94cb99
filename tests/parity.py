"""Spark ↔ DuckDB differential comparison, modeled on the driver's
CORRECTNESS check: row count + column names + order-insensitive values
(columns compared by sorted name). Floats must agree to 1e-9 — the
workload pre-rounds anything whose evaluation order can differ.

Beyond tolerant value equality, the harness is dtype-class strict:
the driver hashes the *string form* of every canonicalized cell, so
an integer column on one side and a float column on the other
("1234" vs "1234.0") hash-mismatch even when numerically identical.
That exact failure escaped round 6 (DuckDB returns windowed
SUM(BIGINT) as HUGEINT -> pandas float64, Spark emits bigint), so
each column's dtype class (bool / int / float / other) must now match
between the Spark and oracle frames before values are compared."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class a driver-style string hash distinguishes."""
    if pd.api.types.is_bool_dtype(s.dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(s.dtype):
        return "int"
    if pd.api.types.is_float_dtype(s.dtype):
        return "float"
    if s.dtype == object:
        # object columns (strings, decimals, arrays, or numerics that
        # pandas refused to vectorize): classify by the first non-null
        for v in s:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            if isinstance(v, (bool, np.bool_)):
                return "bool"
            if isinstance(v, (int, np.integer)):
                return "int"
            if isinstance(v, (float, np.floating)):
                return "float"
            return "other"
        return "empty"
    return "other"


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else v)
    key = df.apply(lambda row: tuple("\0N" if pd.isna(v) else str(v) for v in row), axis=1)
    return df.loc[key.sort_values().index].reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    s = canonicalize(spark_pdf)
    d = canonicalize(duck_pdf)
    for c in s.columns:
        sc, dc = dtype_class(s[c]), dtype_class(d[c])
        assert sc == dc or "empty" in (sc, dc), (
            f"{name}: column {c!r} dtype-class drift: spark={sc} ({s[c].dtype}) "
            f"vs oracle={dc} ({d[c].dtype}) — the driver hashes string forms, "
            "so int-vs-float diverges even when values are numerically equal"
        )
    for c in s.columns:
        sv, dv = s[c], d[c]
        mismatches = []
        for i, (a, b) in enumerate(zip(sv, dv)):
            if _equal(a, b):
                continue
            mismatches.append((i, a, b))
            if len(mismatches) >= 5:
                break
        assert not mismatches, f"{name}: column {c!r} mismatches: {mismatches}"


def _equal(a, b) -> bool:
    a_na, b_na = pd.isna(a), pd.isna(b)
    if a_na or b_na:
        return bool(a_na and b_na)
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isinf(fa) or math.isinf(fb):
            return fa == fb
        return abs(fa - fb) <= 1e-9 + 1e-9 * max(abs(fa), abs(fb))
    return str(a) == str(b)
