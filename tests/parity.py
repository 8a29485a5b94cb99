"""Spark ↔ DuckDB differential comparison, modeled on the driver's
CORRECTNESS check: row count + column names + order-insensitive values
(columns compared by sorted name). Floats must agree to 1e-9 — the
workload pre-rounds anything whose evaluation order can differ."""

from __future__ import annotations

import math

import pandas as pd


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
