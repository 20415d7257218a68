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
