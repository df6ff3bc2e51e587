"""Gate queries for the multimodal binary-column plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


@register(
    "audio_pcm_features",
    oracle="""
    WITH d AS (SELECT doc_id, 64 + (n_chars % 64) AS n FROM documents),
    s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
    v AS (
        SELECT doc_id, n, i,
               ((doc_id * 9973 + i * 131) % 4001) - 2000 AS s
        FROM s
    ),
    w AS (
        SELECT doc_id, n, s,
               lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS p
        FROM v
    )
    SELECT doc_id AS media_id,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN s * p < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_crossings,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak
    FROM w GROUP BY doc_id ORDER BY media_id
    """,
    tags=("llm", "multimodal", "audio"),
)
def audio_pcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL audio decode path, gated end-to-end: per document a
    genuine RIFF/WAVE PCM16 payload is synthesized from an integer
    tone generator (operators/audio.synth_wav_bytes), parsed back by
    ``decode_audio``'s actual WAV branch, and reduced to integer-exact
    features (energy Σs², strict-sign zero crossings, peak).  The
    float32 normalization round-trips exactly at these amplitudes, so
    DuckDB reproduces every value from generate_series — this gates
    byte-level WAV framing, the decoder, and the Arrow mapInPandas
    plumbing, not a simplified twin.  The spectral suite (STFT/MFCC)
    stays pytest-gated: FFTs aren't relationally expressible.

    Scale shape: payload synthesis and decode live in two mapInPandas
    stages on the scan partitioning — bytes never cross a shuffle; the
    output is one bounded row per clip."""
    from ..operators.audio import pcm_gate_features, synth_wav_bytes
    from ..tables import spread

    d = spread(load(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", (64 + F.col("n_chars") % 64).cast("long").alias("n")
    )

    def _mk(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        synth_wav_bytes(int(did), int(n))
                        for did, n in zip(pdf["doc_id"], pdf["n"])
                    ],
                }
            )

    media = d.mapInPandas(_mk, schema="media_id long, payload binary")
    return pcm_gate_features(media).orderBy("media_id")


@register(
    "image_webp_decode_stats",
    oracle="""
    WITH d AS (
        SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
    ),
    r1 AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM d),
    r2 AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM r1),
    v AS (
        SELECT doc_id, w, h,
               (doc_id * 31 + y * 7 + x * 3) % 251 AS g
        FROM r2
    )
    SELECT doc_id AS media_id, 'image' AS kind,
           CAST(h AS BIGINT) AS dim0, CAST(w AS BIGINT) AS dim1,
           CAST(h * w * 3 AS BIGINT) AS n_values,
           CAST((1000 * (SUM(g) + h * w * (7 + 201))) // (h * w * 3) AS BIGINT)
               AS mean_milli
    FROM v GROUP BY doc_id, w, h ORDER BY media_id
    """,
    tags=("llm", "multimodal", "image", "webp"),
)
def image_webp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL image-codec path, gated end-to-end (the image analog of
    video_avi_frame_features): per document a genuine RIFF/WEBP lossless
    payload is synthesized from an integer pixel generator
    (operators/webp.synth_webp_gray — full uniform-8 canonical green
    code, zero-bit simple codes for the constant channels), decoded by
    ``decode_image``'s actual VP8L branch (prefix-code entropy decode),
    and reduced to integer stats by ``decoded_stats``.  VP8L is
    integer-exact, so DuckDB reproduces every value from
    generate_series — gating the RIFF walk, canonical prefix decode,
    literal pixel path, RGB channel order, and the Arrow mapInPandas
    plumbing.  (Transforms/LZ77/color-cache corners stay pytest-gated
    against the independent in-test encoder.)

    Scale shape: payload bytes never cross a shuffle (synth and decode
    ride the scan partitioning); output is one bounded row per image."""
    from ..operators.multimodal import MEDIA_SCHEMA, decoded_stats
    from ..operators.webp import synth_webp_gray
    from ..tables import spread

    d = spread(load(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id",
        (4 + F.col("doc_id") % 5).cast("int").alias("w"),
        (3 + F.col("doc_id") % 4).cast("int").alias("h"),
    )

    def _mk(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": ["image"] * len(pdf),
                    "payload": [
                        synth_webp_gray(int(did), int(w), int(h))
                        for did, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"])
                    ],
                    "meta": [None] * len(pdf),
                }
            )

    media = d.mapInPandas(_mk, schema=MEDIA_SCHEMA)
    return decoded_stats(media).orderBy("media_id")


@register(
    "video_avi_frame_features",
    oracle="""
    WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS nf FROM documents),
    f AS (SELECT doc_id, unnest(range(0, nf)) AS fi FROM d),
    kept AS (SELECT doc_id, fi FROM f WHERE fi % 2 = 0),
    r1 AS (SELECT doc_id, fi, unnest(range(0, 8)) AS r FROM kept),
    r2 AS (SELECT doc_id, fi, r, unnest(range(0, 8)) AS c FROM r1),
    r3 AS (SELECT doc_id, fi, r, c, unnest(range(0, 3)) AS ch FROM r2),
    v AS (
        SELECT doc_id, fi,
               (doc_id * 31 + fi * 17 + r * 5 + c * 3 + ch) % 251 AS p
        FROM r3
    )
    SELECT doc_id AS media_id, CAST(fi AS BIGINT) AS frame_idx,
           CAST(8 AS BIGINT) AS height, CAST(8 AS BIGINT) AS width,
           CAST((SUM(p) * 1000) // 192 AS BIGINT) AS mean_milli
    FROM v GROUP BY doc_id, fi ORDER BY media_id, frame_idx
    """,
    tags=("llm", "multimodal", "video"),
)
def video_avi_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL video container path, gated end-to-end: per document a
    genuine RIFF/AVI payload with uncompressed DIB frames is muxed from
    an integer pixel generator (operators/multimodal.synth_avi_dib),
    walked back by ``parse_avi``, and every 2nd frame decoded by
    ``decode_video``'s actual DIB branch (bottom-up BGR de-swizzle) into
    integer per-frame features.  DuckDB reproduces every value from
    generate_series — gating the RIFF walk, frame indexing, selective
    decode, and the Arrow mapInPandas plumbing.  (MJPEG frames stay
    pytest-gated: DCT round-trips aren't relationally expressible.)

    Scale shape: container bytes never cross a shuffle; skipped frames
    are never decoded (the sampler walks the chunk index); output is a
    bounded few rows per clip."""
    from ..operators.multimodal import sample_video_frames, synth_avi_dib
    from ..tables import spread

    d = spread(load(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", (2 + F.col("doc_id") % 3).cast("long").alias("nf")
    )

    def _mk(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        synth_avi_dib(int(did), int(nf))
                        for did, nf in zip(pdf["doc_id"], pdf["nf"])
                    ],
                }
            )

    media = d.mapInPandas(_mk, schema="media_id long, payload binary")
    return (
        sample_video_frames(media, every_k=2)
        .select("media_id", "frame_idx", "height", "width", "mean_milli")
        .orderBy("media_id", "frame_idx")
    )
