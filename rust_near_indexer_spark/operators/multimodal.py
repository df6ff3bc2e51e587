"""Multimodal columns: opaque binary payloads + typed metadata (north-star §LLM).

Media (image/audio/video) travels as an opaque ``BinaryType`` column with
a typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas iterators over ``mapInPandas`` — the only
sanctioned Python boundary in this engine.

The image/audio codec libraries are NOT in this container, so the real
decoders are STUBS (``NotImplementedError`` with the intended contract
documented); ``extract_features`` is the deterministic fake decode whose
Spark-side plumbing — schema, Arrow batching, partition mapping, UDF
signature — is real and oracle-tested (queries/multimodal_features).

Scale posture: payload bytes never pass through a shuffle — feature
extraction is mapInPandas on the scan partition; only the small feature
rows continue downstream.  Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of large
blobs never materializes at once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# media_id + kind + opaque payload + typed metadata (decoders fill what
# they know; NULL elsewhere)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video | text-bytes
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", LongType(), True),
                    StructField("height", LongType(), True),
                    StructField("sample_rate", LongType(), True),
                    StructField("n_frames", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("md5_hex", StringType(), True),
        StructField("feature0", LongType(), True),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Wrap the documents table as a media table (text bytes as payload) —
    the container has no binary media fixtures, so text bytes stand in;
    the column types and partitioning are exactly what image/audio use."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text-bytes").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.named_struct(
            F.lit("width"), F.lit(None).cast("long"),
            F.lit("height"), F.lit(None).cast("long"),
            F.lit("sample_rate"), F.lit(None).cast("long"),
            F.lit("n_frames"), F.lit(None).cast("long"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, meta: dict):  # pragma: no cover - stub
    """STUB — image decode (PIL/opencv not in this container).

    Contract: bytes → HWC uint8 ndarray; runs inside the mapInPandas
    iterator below, one Arrow batch at a time, never on the driver.
    """
    raise NotImplementedError("image codecs unavailable in this environment")


def decode_audio(payload: bytes, meta: dict):  # pragma: no cover - stub
    """STUB — audio decode (soundfile/ffmpeg not in this container).

    Contract: bytes → (samples float32 ndarray, sample_rate).
    """
    raise NotImplementedError("audio codecs unavailable in this environment")


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic fake decode + feature extraction over mapInPandas:
    per payload, n_bytes + md5 + a 60→63-bit integer feature (first 8 md5
    hex digits).  Replace the body of ``_featurize`` with a real decoder
    (decode_image/decode_audio) when codecs exist; the Spark-side shape
    stays identical."""

    def _featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            digests = [
                hashlib.md5(p).hexdigest() if p is not None else None for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else None for p in payloads],
                    "md5_hex": digests,
                    "feature0": [
                        int(d[:8], 16) if d is not None else None for d in digests
                    ],
                }
            )

    return media.mapInPandas(_featurize, schema=FEATURES_SCHEMA)
