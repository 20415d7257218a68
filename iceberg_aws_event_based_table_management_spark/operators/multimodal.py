"""Multimodal column handling (BASELINE.json north-star): image/audio/
video as opaque `binary` columns with typed metadata, processed by
Arrow-batched pandas functions over `mapInPandas`.

The container has no image/audio codecs, so the decode step is a
clearly-marked stub (deterministic fake) behind the same plumbing a
real decoder would use: binary in -> fixed-schema features out, batch
iterator signature, partition-preserving.  The Spark-side contract
(schema, batching, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata struct carried alongside every media blob.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("byte_checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media_columns(documents: DataFrame) -> DataFrame:
    """Model each document's payload as an opaque binary column + typed
    metadata (the multimodal table shape: blob + struct)."""
    blob = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        blob.alias("media"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("media_meta"),
    )


def decode_media(blob: bytes) -> bytes:
    """THE DECODE STUB.  A real deployment decodes image/audio bytes
    here (PIL/ffmpeg are not in this container).  Deterministic
    passthrough keeps the pipeline testable end-to-end."""
    return blob


def extract_features(media_df: DataFrame, feature_dim: int = 4) -> DataFrame:
    """Feature extraction over binary columns via mapInPandas — the
    Arrow batch iterator shape a real embedding/decode UDF uses.
    Features here are a deterministic fake (byte-statistics vector);
    swap `_featurize` for a model call in production."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"].map(decode_media)
            n_bytes = blobs.map(len).astype("int64")
            first = blobs.map(lambda b: b[0] if len(b) else 0).astype("int32")
            checksum = blobs.map(lambda b: sum(b) % 1_000_000_007).astype("int64")
            feature = blobs.map(
                lambda b: [
                    float(len(b)),
                    float(b[0] if len(b) else 0),
                    float(b[-1] if len(b) else 0),
                    float(sum(b[:16]) % 255),
                ][:feature_dim]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "byte_checksum": checksum,
                    "feature": feature,
                }
            )

    return media_df.mapInPandas(_featurize, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("n_bytes_before", T.LongType()),
        T.StructField("n_bytes_after", T.LongType()),
    ]
)


def resize_media(media_df: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Resize/downsample plumbing (image-resize stand-in): cap each
    blob at `target_bytes` via mapInPandas.  A real deployment calls
    PIL/ffmpeg scaling here (not in this container) — the truncation
    is the DETERMINISTIC STUB; the 1->1 Arrow batch contract, binary
    output column, and metadata bookkeeping are the real plumbing."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"]
            out = blobs.map(lambda b: bytes(b[:target_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out,
                    "n_bytes_before": blobs.map(len).astype("int64"),
                    "n_bytes_after": out.map(len).astype("int64"),
                }
            )

    return media_df.mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_n_bytes", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frames(media_df: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Frame sampling plumbing (video stand-in): emit `n_frames`
    evenly-spaced fixed-size byte windows per blob — the 1->N row
    expansion a video frame sampler produces, as a mapInPandas batch
    iterator (a real sampler decodes frames here; the window slicing
    is the DETERMINISTIC STUB).  Frame k starts at
    floor(k * (len - frame_bytes) / max(n_frames - 1, 1)); short blobs
    yield fewer frames (no padding)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "frame", "frame_n_bytes", "frame_checksum")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                span = len(b) - frame_bytes
                k_max = n_frames if span >= 0 else max(len(b) // frame_bytes, 0)
                for k in range(k_max):
                    off = (k * span) // max(n_frames - 1, 1) if span > 0 else k * frame_bytes
                    fr = b[off : off + frame_bytes]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(k)
                    rows["frame"].append(fr)
                    rows["frame_n_bytes"].append(len(fr))
                    rows["frame_checksum"].append(sum(fr) % 1_000_000_007)
            yield pd.DataFrame(rows).astype(
                {"doc_id": "int64", "frame_idx": "int32", "frame_n_bytes": "int64", "frame_checksum": "int64"}
            )

    return media_df.mapInPandas(_frames, FRAME_SCHEMA)
