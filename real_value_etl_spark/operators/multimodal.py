"""Multimodal (binary) column plumbing: opaque bytes + typed metadata.

SURVEY.md §2.12: image/audio/video payloads are opaque ``BinaryType``
columns with struct metadata; decode / feature-extract runs as Arrow-batched
``mapInPandas`` so each Python invocation sees a columnar batch, never a row.

The actual codec libraries are not in this container, so ``decode_image``
is a clearly-marked deterministic STUB (see DECODE_IS_STUB): it derives
width/height/digest from the bytes themselves. The Spark-side plumbing —
binary schema, Arrow batch shape, partition-parallel UDF execution — is
real and is what the operator is testing.

Scale design: binary payloads never pass through the driver; mapInPandas
streams Arrow batches per partition, and metadata-only queries prune the
binary column at the parquet scan (column pruning => bytes not even read).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_IS_STUB = True  # real codecs (PIL/ffmpeg) are not available here

DECODED_SCHEMA = (
    "doc_id bigint, byte_len bigint, content_md5 string, width int, height int"
)


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialize an opaque binary payload column (utf-8 bytes of the text —
    a deterministic stand-in for real image bytes) plus typed metadata."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).alias("byte_len"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per Arrow batch, 'decode' each payload.

    STUB decode: width/height are deterministic functions of the byte
    length; content_md5 is the md5 of the payload bytes (byte-identical to
    SQL ``md5(text)`` because the payload is the utf-8 encoding).
    """
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int64"),
                "content_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                # deterministic fake dimensions (NotImplementedError-free
                # stand-in for a real image decode)
                "width": payloads.map(lambda b: len(b) % 640 + 16).astype("int32"),
                "height": payloads.map(lambda b: (len(b) * 7) % 480 + 16).astype(
                    "int32"
                ),
            }
        )
        yield out


FRAME_BYTES = 256
FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame_md5 string"


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One-to-MANY mapInPandas kernel: split each payload into fixed-size
    frames (the audio/video frame-sampling shape — output rows > input
    rows, which a scalar UDF cannot express)."""
    import hashlib

    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            for i in range(0, max(len(b), 1), FRAME_BYTES):
                chunk = b[i : i + FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i // FRAME_BYTES)
                out["frame_len"].append(len(chunk))
                out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(out)


def sample_frames(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched frame sampling: (doc_id, frame_idx, frame_len,
    frame_md5) — partition-parallel, no driver materialization."""
    return binary_df.select("doc_id", "payload").mapInPandas(
        _frame_batches, schema=FRAMES_SCHEMA
    )


def decode_image(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched decode of the payload column -> typed feature rows.

    Expects columns (doc_id, payload). Runs partition-parallel; no driver
    collect. Swap `_decode_batches` for a real codec kernel in production.
    """
    return binary_df.select("doc_id", "payload").mapInPandas(
        _decode_batches, schema=DECODED_SCHEMA
    )


RESIZE_SCHEMA = "doc_id bigint, payload binary, byte_len bigint, thumb_md5 string"
THUMB_BYTES = 256  # stub "thumbnail": the leading bytes of the payload

FEATURE_DIM = 16
FEATURES_LONG_SCHEMA = "doc_id bigint, feature_idx int, value double"


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Binary-in/binary-out mapInPandas kernel (the resize shape): each
    payload is reduced to a THUMB_BYTES prefix — a deterministic stand-in
    for a real downscale; swap in PIL/ffmpeg in production. Output stays
    binary so further kernels (decode, features) compose downstream."""
    import hashlib

    for pdf in batches:
        thumbs = [bytes(p)[:THUMB_BYTES] for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": thumbs,
                "byte_len": [len(t) for t in thumbs],
                "thumb_md5": [hashlib.md5(t).hexdigest() for t in thumbs],
            }
        )


def resize_image(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched stub resize: payload -> THUMB_BYTES thumbnail payload
    (binary in, binary out, partition-parallel)."""
    return binary_df.select("doc_id", "payload").mapInPandas(
        _resize_batches, schema=RESIZE_SCHEMA
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Feature-extraction kernel: payload -> FEATURE_DIM floats in long form
    (doc_id, feature_idx, value). STUB features are md5-derived byte pairs
    scaled to [0, 1] — deterministic and reproducible in SQL — standing in
    for a real vision/audio encoder; the output feeds the similarity /
    ANN operators unchanged."""
    import hashlib

    for pdf in batches:
        out = {"doc_id": [], "feature_idx": [], "value": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            h = hashlib.md5(bytes(payload)).hexdigest()
            for i in range(FEATURE_DIM):
                out["doc_id"].append(doc_id)
                out["feature_idx"].append(i)
                out["value"].append(int(h[i * 2 : i * 2 + 2], 16) / 255.0)
        yield pd.DataFrame(out)


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched stub feature extraction: payload -> FEATURE_DIM-float
    vector in long form, partition-parallel, no driver materialization."""
    return binary_df.select("doc_id", "payload").mapInPandas(
        _feature_batches, schema=FEATURES_LONG_SCHEMA
    )
