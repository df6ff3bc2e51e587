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


def documents_as_video(documents: DataFrame, frame_bytes: int = 64) -> DataFrame:
    """Wrap documents as fake fixed-frame-size video media: the payload is
    the text bytes, a 'frame' is each ``frame_bytes`` slice, ``n_frames``
    lands in the typed metadata — the real video path differs only in the
    decoder."""
    payload = F.encode("text", "utf-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        payload.alias("payload"),
        F.named_struct(
            F.lit("width"), F.lit(None).cast("long"),
            F.lit("height"), F.lit(None).cast("long"),
            F.lit("sample_rate"), F.lit(None).cast("long"),
            F.lit("n_frames"), F.floor(F.length(payload) / frame_bytes).cast("long"),
        ).alias("meta"),
    )


FRAME_SCHEMA = "media_id long, frame_idx long, frame_hex string"


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every_k: int = 4
) -> DataFrame:
    """Frame sampling over mapInPandas: every ``every_k``-th complete
    ``frame_bytes`` slice of each payload, emitted as (media_id,
    frame_idx, frame_hex).  Payload bytes stay on the scan partition;
    only the sampled frames continue downstream."""

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_hex": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n = len(payload) // frame_bytes
                for i in range(0, n, every_k):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_hex"].append(
                        bytes(payload[i * frame_bytes : (i + 1) * frame_bytes])
                        .hex()
                        .upper()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = "media_id long, out_w long, out_h long, resized binary"


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize over mapInPandas: the deterministic fake
    decode interprets the payload as a ``meta.width``×``meta.height``
    grayscale uint8 raster (swap in ``decode_image`` when codecs exist);
    the resample itself is vectorized numpy, identical for a real
    decoded array.  Rows without usable dimensions are dropped."""

    def _resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "out_w": [], "out_h": [], "resized": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if payload is None or meta is None:
                    continue
                w, h = meta.get("width"), meta.get("height")
                if not w or not h or w * h > len(payload):
                    continue
                img = np.frombuffer(bytes(payload[: w * h]), dtype=np.uint8).reshape(h, w)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                out["media_id"].append(mid)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["resized"].append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(out)

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


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
