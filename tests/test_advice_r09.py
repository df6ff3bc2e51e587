"""Regression tests for the round-8 ADVICE items (fixed in round 9).

1. medium — publish_artifact retained-generation contract: the replaced
   generation survives the swap (a reader that resolved the symlink just
   before the swap finishes its scan) and is garbage-collected on the
   NEXT publish, along with crashed-writer orphans.
2. low — corpus_fingerprint folds a digest of the derivation chain's
   SOURCE into the key, so editing a chain function invalidates
   artifacts without a manual version bump.
3. low — register_views no longer force-builds both index artifacts
   (covered in test_cli.py::test_register_views_exposes_index_artifacts)
   and skips the ANN block when embeddings.parquet is absent.
4. low — JPEG SOS validates Huffman-table presence at SOS time and
   rejects scans that leave substantial unconsumed entropy bytes.
5. low — the AQE broadcast threshold logs its value and honors
   SPARK_GRAFT_BROADCAST_THRESHOLD.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from rust_near_indexer_spark.artifact_io import (
    chain_digest,
    corpus_fingerprint,
    publish_artifact,
)


def _publish(path: str, tag: str) -> None:
    def build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "payload.txt"), "w") as fh:
            fh.write(tag)

    publish_artifact(path, {"version": 1, "tag": tag}, build)


def _generations(path: str) -> set[str]:
    parent, base = os.path.dirname(path), os.path.basename(path)
    return {n for n in os.listdir(parent) if n.startswith(base + ".data-")}


def test_publish_retains_previous_generation(tmp_path):
    """The replaced generation must survive its own replacement: a
    reader that resolved the symlink pre-swap reads a COMPLETE old
    generation, not FileNotFound mid-scan."""
    art = str(tmp_path / "art")
    _publish(art, "gen1")
    gen1 = os.path.realpath(art)
    _publish(art, "gen2")
    # the pre-swap snapshot is still fully readable
    assert os.path.isdir(gen1)
    with open(os.path.join(gen1, "payload.txt")) as fh:
        assert fh.read() == "gen1"
    # and the symlink serves gen2
    with open(os.path.join(art, "payload.txt")) as fh:
        assert fh.read() == "gen2"
    gen2 = os.path.realpath(art)
    # next publish GCs gen1 but retains gen2 (the new "previous")
    _publish(art, "gen3")
    assert not os.path.exists(gen1)
    assert os.path.isdir(gen2)
    assert len(_generations(art)) == 2  # current + previous, nothing else


def test_publish_gc_reclaims_crashed_writer_orphans(tmp_path):
    """A generation dir left by a crashed/losing writer is reclaimed by
    the next successful publish's GC sweep."""
    art = str(tmp_path / "art")
    _publish(art, "gen1")
    orphan = f"{art}.data-deadbeef0000"
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as fh:
        fh.write("crashed writer leftovers")
    _publish(art, "gen2")
    assert not os.path.exists(orphan)
    # sibling artifacts with a shared name prefix are NOT swept
    other = str(tmp_path / "art2")
    _publish(other, "other-gen1")
    _publish(art, "gen3")
    assert os.path.isdir(os.path.realpath(other))


def test_chain_digest_invalidates_on_source_edit(tmp_path):
    """Editing a derivation-chain function changes the fingerprint even
    at the same manual version — a stale artifact can never be served
    after a code change (ADVICE r08)."""

    def chain_v1(x):
        return x * 2

    def chain_v2(x):
        return x * 2 + 1

    sf = str(tmp_path)
    with open(os.path.join(sf, "t.parquet"), "wb") as fh:
        fh.write(b"notreallyparquet")
    f1 = corpus_fingerprint(sf, "t.parquet", 1, chain_digest(chain_v1, 7))
    f2 = corpus_fingerprint(sf, "t.parquet", 1, chain_digest(chain_v2, 7))
    f3 = corpus_fingerprint(sf, "t.parquet", 1, chain_digest(chain_v1, 8))
    assert f1 != f2  # function body changed
    assert f1 != f3  # constant changed
    # and stable for identical inputs
    assert f1 == corpus_fingerprint(sf, "t.parquet", 1, chain_digest(chain_v1, 7))


def test_register_views_skips_ann_without_embeddings(spark, tmp_path, sf_dir):
    """A corpus dir with documents but no embeddings must register
    cleanly (no hard failure), without ANN views (ADVICE r08)."""
    import shutil

    from rust_near_indexer_spark.views import register_views

    lean_dir = str(tmp_path / "corpus")
    os.makedirs(lean_dir)
    for t in os.listdir(sf_dir):
        if t != "embeddings.parquet":
            src = os.path.join(sf_dir, t)
            dst = os.path.join(lean_dir, t)
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    names = register_views(spark, sf_dir=lean_dir, include_artifacts=True)
    assert "documents" in names and "dedup_pairs" in names
    assert not any(n.startswith("ann_") for n in names)


def test_jpeg_sos_missing_huffman_table_raises():
    """A scan selecting an undefined Huffman table must fail loudly at
    SOS time, not with an opaque TypeError inside the entropy decoder."""
    from rust_near_indexer_spark.operators import multimodal

    from .test_jpeg_codec import _encode_jpeg, _raster

    good = _encode_jpeg(_raster(8, 8, 1))
    # strip every DHT segment (marker 0xC4)
    import struct

    out = bytearray()
    i = 0
    while i < len(good):
        if good[i] == 0xFF and i + 1 < len(good) and good[i + 1] == 0xC4:
            (seglen,) = struct.unpack(">H", good[i + 2 : i + 4])
            i += 2 + seglen
            continue
        out.append(good[i])
        i += 1
    with pytest.raises(ValueError, match="undefined [DA]C Huffman table"):
        multimodal._decode_jpeg(bytes(out))


def test_jpeg_underconsumed_scan_raises():
    """Substantial unconsumed entropy bytes before the next marker mean
    a truncated/corrupt scan — the progressive decoder must raise, not
    silently skip to the marker (ADVICE r08)."""
    from rust_near_indexer_spark.operators import multimodal

    from .test_jpeg_codec import _encode_progressive_jpeg, _raster

    img = _raster(16, 16, 1)
    good = _encode_progressive_jpeg(img)
    assert multimodal._decode_jpeg(good) is not None
    # splice garbage entropy bytes before the EOI: the last scan now
    # under-consumes by far more than bit-padding allows
    assert good[-2:] == b"\xff\xd9"
    bad = good[:-2] + bytes([0x55] * 64) + good[-2:]
    with pytest.raises(ValueError, match="unconsumed entropy"):
        multimodal._decode_jpeg(bad)


def test_broadcast_threshold_env_override(spark, monkeypatch):
    from rust_near_indexer_spark.session import (
        _ENV_BROADCAST_THRESHOLD,
        _broadcast_threshold_bytes,
    )

    default = _broadcast_threshold_bytes(spark)
    assert 4 * 1024 * 1024 <= default <= 64 * 1024 * 1024
    monkeypatch.setenv(_ENV_BROADCAST_THRESHOLD, "12345678")
    assert _broadcast_threshold_bytes(spark) == 12345678
