"""Atomic publish for on-disk artifact datasets (dedup index, ANN index).

An "artifact" is a directory of range-clustered parquet tables plus a
``_meta.json``, maintained like a search index: built once, read by
every consumer, incrementally appended.  Publishing is an atomic
SYMLINK SWAP — the artifact path is a symlink to an immutable
``<path>.data-*`` generation directory, and a new generation replaces
the old by renaming a fresh symlink over it (atomic on POSIX).  A
reader that resolves the path at ANY instant therefore sees either the
complete previous generation or the complete new one: no empty window,
no half-written directory.

Concurrency contract: any number of READERS race safely with one
writer.  Two concurrent WRITERS are safe at the filesystem level (last
swap wins; the loser's generation is orphaned but was complete), but
read-modify-write maintenance (``append_*``) is single-writer by
contract — a racing second append can lose the other's batch.  At
100 TB the same layout runs on an object store with a manifest pointer
object in place of the symlink (the Iceberg/Delta commit pattern); the
reference gets the equivalent guarantee from ClickHouse server-side
insert atomicity (indexer-clickhouse/src/database.rs:90-98).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_clustered(
    df: DataFrame, path: str, cols: Sequence[str], n_files: int
) -> None:
    """Write one table range-clustered + sorted on ``cols`` so parquet
    min/max file stats serve point lookups with pruned scans."""
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def publish_artifact(
    path: str, meta: dict | None, build_into: Callable[[str], None]
) -> None:
    """Build a new generation via ``build_into(tmp_dir)`` then swap it in.

    ``build_into`` writes the artifact's tables under the given
    directory; this function adds ``_meta.json`` (unless ``meta`` is
    None — e.g. a compacted sink table, where a ``_``-prefixed sidecar
    is legal but pointless) and performs the atomic symlink swap
    described in the module docstring.  A legacy real-directory
    artifact (pre-symlink layout) is migrated aside on first write —
    that one-time migration has a brief gap; all subsequent swaps are
    atomic.
    """
    tmp = f"{path}.data-{uuid.uuid4().hex[:12]}"
    link_tmp = f"{path}.lnk-{uuid.uuid4().hex[:12]}"
    try:
        build_into(tmp)
        if meta is not None:
            with open(os.path.join(tmp, "_meta.json"), "w") as fh:
                json.dump(meta, fh)
        prev_target = None
        if os.path.islink(path):
            prev_target = os.path.realpath(path)
        elif os.path.isdir(path):
            legacy = f"{path}.data-legacy-{uuid.uuid4().hex[:12]}"
            os.rename(path, legacy)
            prev_target = legacy
        # relative symlink target: the artifact tree moves as a unit
        os.symlink(os.path.basename(tmp), link_tmp)
        os.rename(link_tmp, path)  # atomic swap (replaces old symlink)
        tmp = None  # published — no cleanup
        if prev_target is not None and os.path.isdir(prev_target):
            shutil.rmtree(prev_target, ignore_errors=True)
    finally:
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)
        if os.path.islink(link_tmp):
            os.unlink(link_tmp)


def load_meta(path: str, expected_version: int, what: str) -> dict:
    with open(os.path.join(path, "_meta.json")) as fh:
        meta = json.load(fh)
    if meta["version"] != expected_version:
        raise ValueError(
            f"{what} artifact at {path} has version {meta['version']}, "
            f"this code expects {expected_version} — rebuild it"
        )
    return meta


def corpus_fingerprint(sf_dir: str, table_file: str, version: int) -> str:
    """Staleness key: an artifact is valid only for the exact source
    parquet bytes (size+mtime) and chain version it was built from — a
    regenerated corpus or changed code forces a rebuild."""
    import hashlib

    p = os.path.join(sf_dir, table_file)
    try:
        st = os.stat(p)
        sig = f"{os.path.abspath(p)}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        sig = os.path.abspath(p)
    sig += f"|v{version}"
    return hashlib.md5(sig.encode()).hexdigest()[:12]


def read_tables(
    spark: SparkSession, path: str, names: Sequence[str]
) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(os.path.join(path, n)) for n in names}
