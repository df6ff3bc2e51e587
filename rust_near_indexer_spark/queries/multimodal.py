"""Gate query for the multimodal binary-column plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import documents_as_media, extract_features
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
