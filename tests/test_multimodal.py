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


def test_sample_frames_expansion(spark):
    # 10 KB payload, 1 KB frames, stride 4 → chunks 0,4,8 sampled
    blob = bytes(range(256)) * 40  # 10240 bytes
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id int, payload binary")
    out = multimodal.sample_frames(df, frame_bytes=1024, stride=4, max_frames=16)
    rows = sorted(out.collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert bytes(rows[0]["frame"]) == blob[:1024]
    assert bytes(rows[1]["frame"]) == blob[4096:5120]
    assert all(r["doc_id"] == 1 for r in rows)
    assert rows[0]["frame_sha256"] == hashlib.sha256(blob[:1024]).hexdigest()


def test_sample_frames_caps_expansion(spark):
    blob = b"\x01" * (1024 * 100)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id int, payload binary")
    out = multimodal.sample_frames(df, frame_bytes=1024, stride=1, max_frames=5)
    assert out.count() == 5  # bounded expansion for the shuffle planner


def test_resize_payload_plumbing(spark):
    blob = bytes(range(100))
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id int, payload binary")
    out = multimodal.resize_payload(df, scale_divisor=2).collect()[0]
    assert out["orig_bytes"] == 100 and out["resized_bytes"] == 50
    assert bytes(out["resized"]) == blob[::2]


def test_ttl_cache_semantics():
    from cbts_datalake_synnex_spark.sources.api_source import TTLCache

    t = [0.0]
    loads = []
    cache = TTLCache(ttl_s=600, clock=lambda: t[0])

    def loader():
        loads.append(1)
        return f"cred-{len(loads)}"

    assert cache.get_or_load("k", loader) == "cred-1"
    t[0] = 599
    assert cache.get_or_load("k", loader) == "cred-1"  # within TTL: cached
    t[0] = 601
    assert cache.get_or_load("k", loader) == "cred-2"  # expired: reloaded
    assert len(loads) == 2


def test_decode_media_compressed_formats_still_stubbed():
    # Only formats needing external codec libs raise; PPM/WAV are real.
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG...", "image/png")


def test_decode_ppm_golden():
    # hand-built 2x2 P6 with a header comment; pixels 0,60,120,180 per channel
    pix = bytes([0, 0, 0, 60, 60, 60, 120, 120, 120, 180, 180, 180])
    payload = b"P6\n# comment\n2 2\n255\n" + pix
    meta = multimodal.decode_media(payload, "image/x-portable-pixmap")
    assert meta["kind"] == "image"
    assert (meta["width"], meta["height"], meta["n_channels"]) == (2, 2, 3)
    assert meta["n_frames"] == 4
    assert meta["mean_level"] == 90.0  # (0+60+120+180)/4


def test_decode_wav_golden():
    payload = multimodal.encode_wav(16, 1000, sample_rate=44100)
    meta = multimodal.decode_media(payload, "audio/wav")
    assert meta["kind"] == "audio"
    assert meta["sample_rate"] == 44100 and meta["n_channels"] == 1
    assert meta["bits_per_sample"] == 16 and meta["n_frames"] == 16
    assert meta["mean_level"] == 1000.0  # RMS of constant amplitude


def test_decode_roundtrip_encoders():
    meta = multimodal.decode_media(multimodal.encode_ppm(5, 7, 42), "image/ppm")
    assert (meta["width"], meta["height"], meta["mean_level"]) == (5, 7, 42.0)
    meta = multimodal.decode_media(multimodal.encode_bmp(5, 7, 42), "image/bmp")
    assert (meta["width"], meta["height"], meta["mean_level"]) == (5, 7, 42.0)
    assert meta["n_frames"] == 35 and meta["n_channels"] == 3


def test_decode_bmp_golden():
    # 2x2 24-bit BMP, stride pads 6 pixel bytes to 8 per row; padding
    # must not leak into the mean. Hand-patch two distinct pixel rows:
    # bottom row BGR 10s, top row BGR 30s → mean 20.
    payload = bytearray(multimodal.encode_bmp(2, 2, 0))
    stride = 8
    off = 14 + 40
    payload[off : off + 6] = bytes([10] * 6)
    payload[off + stride : off + stride + 6] = bytes([30] * 6)
    meta = multimodal.decode_media(bytes(payload), "image/bmp")
    assert meta["kind"] == "image"
    assert (meta["width"], meta["height"], meta["n_channels"]) == (2, 2, 3)
    assert meta["mean_level"] == 20.0


def test_decode_bmp_rejects_compressed_or_truncated():
    import struct

    good = multimodal.encode_bmp(4, 4, 9)
    with pytest.raises(ValueError):
        multimodal.decode_media(good[:-5], "image/bmp")
    # flip biCompression (offset 14+16) to BI_RLE8=1 → rejected
    rle = bytearray(good)
    rle[30:34] = struct.pack("<I", 1)
    with pytest.raises(ValueError):
        multimodal.decode_media(bytes(rle), "image/bmp")


def test_decode_rejects_truncated_ppm():
    bad = multimodal.encode_ppm(4, 4, 9)[:-5]
    with pytest.raises(ValueError):
        multimodal.decode_media(bad, "image/ppm")


def test_decode_payloads_quarantines_poison(spark):
    rows = [
        (1, bytearray(multimodal.encode_ppm(3, 2, 100)), "image/ppm"),
        (2, bytearray(multimodal.encode_wav(8, 250)), "audio/wav"),
        (3, bytearray(b"not media at all"), "image/ppm"),       # poisoned blob
        (4, bytearray(b"\x89PNG\r\n"), "image/png"),            # unsupported codec
    ]
    df = spark.createDataFrame(rows, "doc_id int, payload binary, media_type string")
    out = {r["doc_id"]: r for r in multimodal.decode_payloads(df).collect()}
    assert out[1]["kind"] == "image" and out[1]["mean_level"] == 100.0
    assert out[2]["kind"] == "audio" and out[2]["mean_level"] == 250.0
    # poisoned rows survive with nulls + a decode_error, never fail the stage
    assert out[3]["kind"] is None and "ValueError" in out[3]["decode_error"]
    assert out[4]["kind"] is None and "NotImplementedError" in out[4]["decode_error"]
