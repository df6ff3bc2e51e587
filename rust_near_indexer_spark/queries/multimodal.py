"""Gate queries for the multimodal binary-column plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    documents_as_media,
    documents_as_video,
    extract_features,
    sample_frames,
)
from ..tables import load
from . import register


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS md5_hex,
           ('0x' || substring(md5(text), 1, 8))::BIGINT AS feature0
    FROM documents
    ORDER BY media_id
    """,
    tags=("llm", "multimodal"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → Arrow-batched mapInPandas feature extraction
    (deterministic fake decode; real codecs are stubs — see
    operators/multimodal.py).  The oracle recomputes the same features
    relationally, proving the pandas plumbing end-to-end."""
    media = documents_as_media(load(spark, sf_dir, "documents"))
    return extract_features(media).orderBy("media_id")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) // 64 AS n_frames
        FROM documents
    ),
    f AS (SELECT media_id, unnest(range(0, n_frames)) AS frame_idx, hx FROM m)
    SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           substring(hx, CAST(frame_idx * 128 + 1 AS INTEGER), 128) AS frame_hex
    FROM f
    WHERE frame_idx % 4 = 0
    ORDER BY media_id, frame_idx
    """,
    tags=("llm", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over mapInPandas: documents wrapped as fake
    fixed-frame-size video (64-byte frames), every 4th frame emitted as
    hex.  The oracle re-slices the same payloads relationally in the hex
    domain — proving slice arithmetic, Arrow batching, and the
    one-row-to-many-frames expansion."""
    media = documents_as_video(load(spark, sf_dir, "documents"), frame_bytes=64)
    return sample_frames(media, frame_bytes=64, every_k=4).orderBy(
        "media_id", "frame_idx"
    )
