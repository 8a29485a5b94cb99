"""X5 multimodal-column tests — binary payload plumbing, Arrow
mapInPandas feature pass, decode stub contract (SURVEY §2.10 X5)."""

from __future__ import annotations

import hashlib

import pytest

from cbts_datalake_synnex_spark.operators import multimodal


def test_attach_binary_payload_schema_and_values(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "wörld")], "doc_id int, text string")
    out = multimodal.attach_binary_payload(df, "text")
    types = dict(out.dtypes)
    assert types["payload"] == "binary"
    assert types["media_type"] == "string" and types["byte_len"] == "bigint"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert bytes(rows[1]["payload"]) == b"hello"
    assert rows[1]["byte_len"] == 5
    assert rows[2]["byte_len"] == len("wörld".encode())  # UTF-8 length, not char count
    assert rows[1]["sha256"] == hashlib.sha256(b"hello").hexdigest()


def test_extract_payload_features_roundtrip(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "defg")], "doc_id int, text string")
    feats = multimodal.extract_payload_features(
        multimodal.attach_binary_payload(df, "text").select("doc_id", "payload")
    )
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert rows[1]["byte_len"] == 3 and rows[2]["byte_len"] == 4
    assert rows[1]["payload_sha256"] == hashlib.sha256(b"abc").hexdigest()
    # deterministic fake embedding: 8 floats in [0,1] derived from digest
    feat = rows[1]["feat"]
    assert len(feat) == 8 and all(0.0 <= v <= 1.0 for v in feat)
    expected = [round(b / 255.0, 6) for b in hashlib.sha256(b"abc").digest()[:8]]
    assert [round(v, 6) for v in feat] == pytest.approx(expected, abs=1e-6)


def test_decode_media_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG...", "image/png")
