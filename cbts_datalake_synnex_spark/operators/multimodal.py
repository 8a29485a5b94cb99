"""Multimodal columns (SURVEY §2.10 X5): image/audio/video as opaque
binary payloads + typed metadata, processed with Arrow-batched
``mapInPandas``.

The Spark-side plumbing here is real and tested: BinaryType payload
column, metadata struct, partition-friendly batch iteration, stable
UDF output schema. ``decode_media`` carries three REAL dependency-free
codecs — binary PPM (P6) images, uncompressed 24-bit BMP images, and
PCM WAV audio, parsed byte-level in
``_decode_ppm``/``_decode_bmp``/``_decode_wav`` — exercised end-to-end by
``decode_payloads``; compressed formats (JPEG/MP3/H.264) need codec
libraries absent from this container and raise ``NotImplementedError``
(a PIL/libav decoder slots in beside the built-ins). The
sha256-derived feature vector in ``extract_payload_features`` remains
a clearly-marked deterministic fake standing in for an embedding
model.

At 100 TB: payloads ride in parquet/Delta binary columns; ``mapInPandas``
processes Arrow batches per partition, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size, and
repartitioning by a content-hash prefix spreads hot media evenly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_SCHEMA = "payload binary, media_type string, byte_len bigint, sha256 string"


def attach_binary_payload(df: DataFrame, text_col: str, media_type: str = "text/plain") -> DataFrame:
    """Wrap a source column as an opaque binary payload + typed
    metadata — the canonical multimodal column shape. Pure projection
    (encode/sha2/length are JVM built-ins)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        *df.columns,
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(payload).cast("bigint").alias("byte_len"),
        F.sha2(payload, 256).alias("sha256"),
    )


def decode_media(payload: bytes, media_type: str) -> dict:
    """Decode a binary media payload to typed metadata + summary stats.

    Two REAL, dependency-free codecs are wired in — binary PPM (P6)
    images and PCM WAV audio — so the decode slot is exercised by
    actual byte-level parsing, not only the deterministic fake.
    Compressed formats (JPEG/PNG/MP3/H.264) still require codec libs
    absent from this image and raise ``NotImplementedError``; a
    PIL/libav decoder slots in beside the two built-ins.

    Returns a dict with ``kind`` plus format-specific fields; see
    ``decode_payloads`` for the columnar shape.
    """
    if media_type in ("image/x-portable-pixmap", "image/ppm"):
        return _decode_ppm(payload)
    if media_type in ("image/bmp", "image/x-ms-bmp"):
        return _decode_bmp(payload)
    if media_type in ("audio/wav", "audio/x-wav", "audio/wave"):
        return _decode_wav(payload)
    raise NotImplementedError(
        f"media decoding for {media_type!r} requires codec libs (PIL/av/librosa) "
        "not available in this image; wire them in here."
    )


def _decode_ppm(payload: bytes) -> dict:
    """Binary PPM (P6): ``P6 <width> <height> <maxval>`` header tokens
    (whitespace/comment separated) then width*height*3 raw bytes."""
    # header tokenizer: whitespace-separated, '#' comments to EOL
    tokens, i = [], 0
    while len(tokens) < 4 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 4 or tokens[0] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    width, height, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    i += 1  # single whitespace after maxval per spec
    pixels = payload[i : i + width * height * 3]
    if len(pixels) != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    mean = sum(pixels) / len(pixels) if pixels else 0.0
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "n_channels": 3,
        "sample_rate": None,
        "bits_per_sample": 8,
        "n_frames": width * height,
        "mean_level": round(mean, 6),
    }


def _decode_bmp(payload: bytes) -> dict:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): ``BM`` magic, pixel
    array offset at byte 10; width/height/planes/bpp/compression from
    the 40-byte info header. Rows are stored bottom-up (negative height
    = top-down) and padded to 4-byte boundaries — padding is excluded
    from the mean."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size, width, height, _planes, bpp, compression = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BITMAPINFOHEADER BMPs supported "
            f"(hdr={hdr_size}, bpp={bpp}, compression={compression})"
        )
    h = abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    data = payload[pix_off : pix_off + stride * h]
    if width <= 0 or len(data) != stride * h:
        raise ValueError("truncated BMP pixel data")
    total = n = 0
    for r in range(h):
        row = data[r * stride : r * stride + width * 3]
        total += sum(row)
        n += len(row)
    return {
        "kind": "image",
        "width": width,
        "height": h,
        "n_channels": 3,
        "sample_rate": None,
        "bits_per_sample": 8,
        "n_frames": width * h,
        "mean_level": round(total / n, 6) if n else 0.0,
    }


def _decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE with PCM (format 1) fmt + data chunks; 8/16-bit."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM supported (format={audio_format}, bits={bits})")
    n_frames = len(data) // block_align if block_align else 0
    if bits == 16:
        samples = struct.unpack(f"<{len(data) // 2}h", data[: (len(data) // 2) * 2])
    else:  # 8-bit WAV is unsigned, centered at 128
        samples = [b - 128 for b in data]
    rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 if samples else 0.0
    return {
        "kind": "audio",
        "width": None,
        "height": None,
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_frames": n_frames,
        "mean_level": round(rms, 6),
    }


def encode_ppm(width: int, height: int, value: int) -> bytes:
    """Synthesize a constant-valued P6 image (test/golden helper —
    deterministic payloads without codec libs)."""
    return b"P6\n%d %d\n255\n" % (width, height) + bytes([value % 256]) * (width * height * 3)


def encode_bmp(width: int, height: int, value: int) -> bytes:
    """Synthesize a constant-valued uncompressed 24-bit BMP (test/golden
    helper): 14-byte file header + 40-byte BITMAPINFOHEADER + padded
    bottom-up pixel rows."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    pix = (bytes([value % 256]) * (width * 3) + b"\x00" * (stride - width * 3)) * height
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 14 + 40)
    return hdr + info + pix


def encode_wav(n_frames: int, amplitude: int, sample_rate: int = 8000) -> bytes:
    """Synthesize a constant-amplitude 16-bit mono PCM WAV (test/golden
    helper). RMS of a constant signal == |amplitude|."""
    import struct

    data = struct.pack(f"<{n_frames}h", *([amplitude] * n_frames))
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


DECODED_FIELDS = (
    "kind string, width int, height int, n_channels int, sample_rate int, "
    "bits_per_sample int, n_frames bigint, mean_level double, decode_error string"
)


def decode_payloads(
    df: DataFrame,
    payload_col: str = "payload",
    media_type_col: str = "media_type",
) -> DataFrame:
    """X5 — decode binary payloads to typed metadata columns via
    Arrow-batched ``mapInPandas`` (one Python roundtrip per partition
    batch, never per row). Undecodable rows keep nulls + a
    ``decode_error`` string instead of failing the job — at 100 TB a
    poisoned blob must not kill the stage."""
    passthrough = [c for c in df.columns if c not in (payload_col, media_type_col)]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in passthrough]
        + [DECODED_FIELDS]
    )
    null_rec = {
        "kind": None, "width": None, "height": None, "n_channels": None,
        "sample_rate": None, "bits_per_sample": None, "n_frames": None,
        "mean_level": None,
    }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                rec = {c: row[c] for c in passthrough}
                try:
                    rec.update(decode_media(bytes(row[payload_col]), row[media_type_col]))
                    rec["decode_error"] = None
                except Exception as ex:  # noqa: BLE001 — poisoned blob quarantine
                    rec.update(null_rec)
                    rec["decode_error"] = f"{type(ex).__name__}: {ex}"[:500]
                rows.append(rec)
            cols = passthrough + [
                "kind", "width", "height", "n_channels", "sample_rate",
                "bits_per_sample", "n_frames", "mean_level", "decode_error",
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    frame_bytes: int = 1024,
    stride: int = 4,
    max_frames: int = 16,
) -> DataFrame:
    """X5 — frame-sampling plumbing: emit every ``stride``-th
    ``frame_bytes`` chunk of each payload as its own row (one row per
    sampled frame), capped at ``max_frames``.

    This is the SHAPE of video frame sampling — UDTF-style row
    expansion from a binary column inside ``mapInPandas`` — with byte
    chunking standing in for codec-true frame extraction (no codec libs
    in this image; a real decoder slots into ``decode_media``). The
    expansion factor is bounded (max_frames), so output size is
    predictable for the shuffle planner at any scale.
    Output: (passthrough..., frame_idx, frame: binary, frame_sha256).
    """
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in passthrough]
        + ["frame_idx int", "frame binary", "frame_sha256 string"]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row[payload_col])
                n_chunks = max(1, -(-len(data) // frame_bytes))
                picked = list(range(0, n_chunks, stride))[:max_frames]
                for out_idx, chunk_idx in enumerate(picked):
                    chunk = data[chunk_idx * frame_bytes : (chunk_idx + 1) * frame_bytes]
                    rec = {c: row[c] for c in passthrough}
                    rec["frame_idx"] = out_idx
                    rec["frame"] = chunk
                    rec["frame_sha256"] = hashlib.sha256(chunk).hexdigest()
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=passthrough + ["frame_idx", "frame", "frame_sha256"]
            )

    return df.mapInPandas(batches, schema=out_schema)


def resize_payload(
    df: DataFrame,
    payload_col: str = "payload",
    scale_divisor: int = 2,
) -> DataFrame:
    """X5 — resize plumbing: emit a payload reduced by ``scale_divisor``
    alongside the original's metadata.

    Byte-stride downsampling stands in for pixel-space resampling (a
    real implementation decodes via ``decode_media`` and resamples);
    the mapInPandas shape — binary in, smaller binary out, metadata
    updated — is exactly what a PIL/libvips resize rides on. Output:
    (passthrough..., resized: binary, orig_bytes, resized_bytes).
    """
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in passthrough]
        + ["resized binary", "orig_bytes bigint", "resized_bytes bigint"]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[passthrough].copy()
            resized = [bytes(p)[::scale_divisor] for p in pdf[payload_col]]
            out["resized"] = resized
            out["orig_bytes"] = [len(bytes(p)) for p in pdf[payload_col]]
            out["resized_bytes"] = [len(r) for r in resized]
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def extract_payload_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Emits (id passthrough columns, byte_len, sha256, feat: 8 floats).
    The feature vector is a DETERMINISTIC FAKE (sha256-derived) standing
    in for a real embedding model — the batch iteration, Arrow transfer
    of binary columns, and output schema are the parts under test.
    """
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in passthrough]
        + ["byte_len bigint", "payload_sha256 string", "feat array<float>"]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            digests = [hashlib.sha256(bytes(p)).digest() for p in payloads]
            out = pdf[passthrough].copy()
            out["byte_len"] = [len(bytes(p)) for p in payloads]
            out["payload_sha256"] = [d.hex() for d in digests]
            # deterministic fake embedding: 8 floats from the digest
            out["feat"] = [
                [round(b / 255.0, 6) for b in d[:8]] for d in digests
            ]
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def encode_ppm_gradient(width: int, height: int, k: int, bright: int = 0) -> bytes:
    """Synthesize a deterministic GRADIENT P6 image (test/query helper):
    gray(x,y) = (x·(2k+3) + y·(3k+5)) mod 200 + bright, r=g=b. Distinct
    ``k`` produce distinct average-hashes (validated for k<17 at 16×16);
    ``bright`` shifts every pixel equally, which `image_ahash` is
    invariant to — the byte-exact/perceptual dedup separation."""
    px = bytearray()
    for y in range(height):
        for x in range(width):
            v = (x * (2 * k + 3) + y * (3 * k + 5)) % 200 + bright
            px += bytes((v, v, v))
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(px)


def _gray_pixels(payload: bytes) -> tuple[int, int, list]:
    """(width, height, row-major grayscale floats) from a P6 PPM or an
    uncompressed 24-bit BMP payload. Grayscale = (r+g+b)/3."""
    import struct

    if payload[:2] == b"P6":
        tokens, i = [], 0
        while len(tokens) < 4 and i < len(payload):
            c = payload[i : i + 1]
            if c == b"#":
                while i < len(payload) and payload[i : i + 1] not in (b"\n", b"\r"):
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                tokens.append(payload[i:j])
                i = j
        w, h = int(tokens[1]), int(tokens[2])
        i += 1
        data = payload[i : i + w * h * 3]
        if len(data) != w * h * 3:
            raise ValueError("truncated PPM pixel data")
        gray = [
            (data[p] + data[p + 1] + data[p + 2]) / 3.0
            for p in range(0, len(data), 3)
        ]
        return w, h, gray
    if payload[:2] == b"BM":
        pix_off = struct.unpack("<I", payload[10:14])[0]
        _hs, w, height, _pl, bpp, comp = struct.unpack("<IiiHHI", payload[14:34])
        if bpp != 24 or comp != 0:
            raise ValueError("only uncompressed 24-bit BMPs supported")
        h = abs(height)
        stride = ((w * 3 + 3) // 4) * 4
        data = payload[pix_off : pix_off + stride * h]
        if len(data) != stride * h:
            raise ValueError("truncated BMP pixel data")
        rows = range(h - 1, -1, -1) if height > 0 else range(h)  # bottom-up
        gray = []
        for r in rows:
            row = data[r * stride : r * stride + w * 3]
            gray.extend(
                (row[p] + row[p + 1] + row[p + 2]) / 3.0
                for p in range(0, len(row), 3)
            )
        return w, h, gray
    raise ValueError("unsupported image payload (PPM P6 / 24-bit BMP only)")


def image_ahash(payload: bytes, grid: int = 8) -> str:
    """Average-hash perceptual fingerprint (the aHash of the
    pHash/aHash/dHash family — public, e.g. the 2011 'Looks Like It'
    exposition): grayscale → ``grid``×``grid`` block means → bit per
    block (mean > overall mean) → hex string (grid²/4 chars). Exactly
    invariant to uniform brightness shifts (both sides of the
    comparison move equally) and to re-encoding between supported
    formats; near-identical images differ in O(1) bits (hamming-band
    candidate pairing slots into the SimHash banding machinery).
    Requires width/height divisible by ``grid``."""
    w, h, gray = _gray_pixels(payload)
    if w % grid or h % grid:
        raise ValueError(f"image {w}x{h} not divisible by grid {grid}")
    bw, bh = w // grid, h // grid
    means = []
    for by in range(grid):
        for bx in range(grid):
            s = 0.0
            for y in range(by * bh, (by + 1) * bh):
                base = y * w
                for x in range(bx * bw, (bx + 1) * bw):
                    s += gray[base + x]
            means.append(s / (bw * bh))
    overall = sum(means) / len(means)
    bits = 0
    for i, m in enumerate(means):
        if m > overall:
            bits |= 1 << i
    return format(bits, f"0{grid * grid // 4}x")
