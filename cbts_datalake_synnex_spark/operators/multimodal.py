"""Multimodal columns (SURVEY §2.10 X5): image/audio/video as opaque
binary payloads + typed metadata, processed with Arrow-batched
``mapInPandas``.

The Spark-side plumbing here is real and tested: BinaryType payload
column, metadata struct, partition-friendly batch iteration, stable
UDF output schema. The actual media decoding is STUBBED — the
image/audio libraries are not in this container — behind
``NotImplementedError`` (``decode_media``) and a clearly-marked
deterministic fake (``fake_feature_extract``) so the pipeline shape is
exercised end-to-end without pretending to decode pixels.

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


def decode_media(payload: bytes, media_type: str):  # pragma: no cover - stub
    """STUB — media decoding (image decode / audio resample / video
    frame-sample) requires codec libraries not present in this
    environment. The mapInPandas plumbing around it is real."""
    raise NotImplementedError(
        f"media decoding for {media_type!r} requires codec libs (PIL/av/librosa) "
        "not available in this image; wire them in here."
    )


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
