"""The dedup product as a FIRST-CLASS, incrementally-maintained dataset.

At 100 TB, near-dup detection output is not something a consumer
recomputes from the raw corpus — it is a written artifact (the same way
a search engine treats its inverted index): signatures, verified pairs,
and connected-component labels land on disk once, every downstream
consumer (cluster reports, clique-ness audits, leakage-safe splits,
curation) reads them, and new document batches are folded in by
touching ONLY the new docs' signatures and the clusters they perturb.

Layout at ``<path>/``::

    signatures/  (doc_id, hs1 array<long>, mh0..mh7)   LSH index rows
    pairs/       (doc_a, doc_b, jaccard_milli)         verified near-dups
    labels/      (node, component)                     CC labels (min-id)

Each table is written ``repartitionByRange`` on its leading id and
sorted within partitions, so parquet min/max file stats serve point
lookups ("which cluster is doc 123 in?") with pruned scans, and a
cluster's rows are co-located.  Writes are build-into-tmp + directory
rename, so readers never observe a half-written artifact.

Incremental contract (``append_dedup_artifact``): results are
bit-identical to a cold rebuild over the full corpus as long as the
append does not push an LSH (band, bucket) across the hot-bucket cap
(``MAX_BUCKET_DOCS``).  If it does, the incremental artifact KEEPS
previously-verified pairs that a cold rebuild's cap would no longer
candidate — a superset of exact-Jaccard-verified true near-dups, which
is the behavior a production dedup service wants (the cap is a
performance guard; the stored pairs passed ground-truth verification).

The work an append performs is proportional to the NEW batch plus the
clusters it touches: candidate generation joins only new-doc bands
against the band stream, verification touches only pairs with a new
side, and the CC re-run covers only the touched components (their label
rows re-enter as star edges) — untouched cluster labels are carried
over byte-for-byte.

Reference parity note: the reference engine persists dedup state in
ClickHouse tables maintained by inserts (SURVEY.md §1.3); this module
is the Spark-native equivalent — Parquet datasets + deterministic
incremental recompute instead of ReplacingMergeTree.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries.dedup import (
    MAX_BUCKET_DOCS,
    augmented_docs,
    bands_from_signatures,
    cap_hot_buckets,
    signatures_from_shingles,
    verify_pair_ids,
    _shingles,
)

# Bump when the chain's semantics change: stale artifacts must not be
# reused across incompatible code versions.
ARTIFACT_VERSION = 1
ARTIFACT_FILES = 8  # range buckets per table at test scale; config at 100 TB

_ENV_DISABLE = "SPARK_GRAFT_DEDUP_ARTIFACT"  # set to "0" to force cold compute
_ENV_BASE_DIR = "SPARK_GRAFT_DEDUP_ARTIFACT_DIR"


# ---------------------------------------------------------------------------
# Chain pieces shared by cold build and append.
# ---------------------------------------------------------------------------


def signatures_for(docs: DataFrame) -> DataFrame:
    """(doc_id, text) corpus → LSH signature rows (docs of <3 words,
    which shingle to empty, are excluded — they can never near-dup)."""
    return signatures_from_shingles(
        docs.select(
            "doc_id", _shingles(F.split(F.col("text"), " ")).alias("sh")
        ).where(F.size("sh") > 0)
    )


def candidate_pair_ids(bands: DataFrame) -> DataFrame:
    """Band stream → distinct candidate (doc_a < doc_b) id pairs."""
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Write / load.
# ---------------------------------------------------------------------------


def _write_tables(
    sigs: DataFrame, pairs: DataFrame, labels: DataFrame, path: str
) -> None:
    """Publish the three tables atomically under ``path`` via the shared
    symlink-swap publisher (artifact_io.publish_artifact): readers never
    observe a missing or half-written artifact, and appends are
    single-writer by contract (ADVICE r07; see artifact_io docstring)."""
    from .artifact_io import publish_artifact, write_clustered

    def build_into(tmp: str) -> None:
        write_clustered(
            sigs, os.path.join(tmp, "signatures"), ["doc_id"], ARTIFACT_FILES
        )
        write_clustered(
            pairs, os.path.join(tmp, "pairs"), ["doc_a", "doc_b"], ARTIFACT_FILES
        )
        write_clustered(
            labels,
            os.path.join(tmp, "labels"),
            ["component", "node"],
            ARTIFACT_FILES,
        )

    publish_artifact(
        path,
        {"version": ARTIFACT_VERSION, "max_bucket_docs": MAX_BUCKET_DOCS},
        build_into,
    )


def write_dedup_artifact(docs: DataFrame, path: str) -> dict:
    """Cold-build the artifact from a (doc_id, text) corpus.

    One shingle pass over the corpus, the audited banded-LSH candidate
    join (never all-pairs, hot buckets capped), exact-Jaccard
    verification, O(log n)-round connected components — then three
    range-clustered parquet writes.  Returns row-count stats.
    """
    from .operators.graph import connected_components

    sigs = signatures_for(docs).persist()
    pairs = verify_pair_ids(
        candidate_pair_ids(cap_hot_buckets(bands_from_signatures(sigs))), sigs
    ).persist()
    labels = connected_components(pairs, "doc_a", "doc_b")
    try:
        _write_tables(sigs, pairs, labels, path)
    finally:
        sigs.unpersist()
        pairs.unpersist()
    art = load_dedup_artifact(docs.sparkSession, path)
    return {
        "n_sigs": art["signatures"].count(),
        "n_pairs": art["pairs"].count(),
        "n_labeled": art["labels"].count(),
    }


def load_dedup_artifact(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Open the artifact's three tables as DataFrames (plus meta)."""
    with open(os.path.join(path, "_meta.json")) as fh:
        meta = json.load(fh)
    if meta["version"] != ARTIFACT_VERSION:
        raise ValueError(
            f"dedup artifact at {path} has version {meta['version']}, "
            f"this code expects {ARTIFACT_VERSION} — rebuild it"
        )
    return {
        "signatures": spark.read.parquet(os.path.join(path, "signatures")),
        "pairs": spark.read.parquet(os.path.join(path, "pairs")),
        "labels": spark.read.parquet(os.path.join(path, "labels")),
        "meta": meta,
    }


# ---------------------------------------------------------------------------
# Incremental append.
# ---------------------------------------------------------------------------


def append_dedup_artifact(
    spark: SparkSession, path: str, new_docs: DataFrame
) -> dict:
    """Fold a new (doc_id, text) batch into an existing artifact.

    New doc_ids must not collide with stored ones (append, not upsert).
    Work is proportional to the batch + touched clusters — see the
    module docstring for the exactness contract around the hot cap.
    """
    from .operators.graph import connected_components

    art = load_dedup_artifact(spark, path)
    sig_old, pairs_old, labels_old = (
        art["signatures"],
        art["pairs"],
        art["labels"],
    )
    sig_new = signatures_for(new_docs).persist()
    # Enforce the append-not-upsert contract: a re-appended doc_id would
    # silently duplicate signature rows, candidate itself, and corrupt
    # labels.  Cost is bounded by the batch (semi-join on the range-
    # clustered signature table, min/max-pruned).
    collisions = (
        sig_new.select("doc_id")
        .join(sig_old.select("doc_id"), "doc_id", "left_semi")
        .limit(5)
        .collect()
    )
    if collisions:
        sig_new.unpersist()
        ids = sorted(r.doc_id for r in collisions)
        raise ValueError(
            f"append_dedup_artifact: doc_ids already in the artifact "
            f"(append, not upsert): {ids}{'…' if len(ids) == 5 else ''}"
        )
    sig_all = sig_old.unionByName(sig_new).persist()

    # Candidate generation: ONLY new-doc bands probe the (capped) band
    # stream.  The cap is evaluated over the full stream so bucket
    # membership matches a cold build's view of the same corpus.
    bands_all = cap_hot_buckets(bands_from_signatures(sig_all))
    new_ids = sig_new.select("doc_id")
    bands_new = bands_all.join(new_ids, "doc_id")
    n = bands_new.select(F.col("doc_id").alias("na"), "band", "bucket")
    o = bands_all.select(F.col("doc_id").alias("ob"), "band", "bucket")
    pair_ids = (
        n.join(o, ["band", "bucket"])
        .where(F.col("na") != F.col("ob"))
        .select(
            F.least("na", "ob").alias("doc_a"),
            F.greatest("na", "ob").alias("doc_b"),
        )
        .distinct()
    )
    # Every candidate has >=1 new side, so pairs_new is disjoint from
    # pairs_old by construction — the union below needs no dedup.
    pairs_new = verify_pair_ids(pair_ids, sig_all).persist()
    pairs_all = pairs_old.unionByName(pairs_new)

    # Incremental CC: components touched by a new pair re-enter as star
    # edges (node—component) together with the new pairs; everything
    # else carries over.  The min-label property composes: the re-run's
    # component id is the min over the merged member set.
    touched_nodes = (
        pairs_new.select(F.col("doc_a").alias("node"))
        .unionByName(pairs_new.select(F.col("doc_b").alias("node")))
        .distinct()
    )
    touched_comps = (
        labels_old.join(touched_nodes, "node").select("component").distinct()
    )
    star_edges = labels_old.join(touched_comps, "component").select(
        F.col("node").alias("doc_a"), F.col("component").alias("doc_b")
    )
    relabeled = connected_components(
        pairs_new.select("doc_a", "doc_b").unionByName(star_edges),
        "doc_a",
        "doc_b",
    )
    labels_all = labels_old.join(
        touched_comps, "component", "left_anti"
    ).unionByName(relabeled.select("node", "component"))

    try:
        stats = {
            "n_new_sigs": sig_new.count(),
            "n_new_pairs": pairs_new.count(),
            "n_touched_components": touched_comps.count(),
        }
        _write_tables(sig_all, pairs_all, labels_all, path)
    finally:
        sig_new.unpersist()
        sig_all.unpersist()
        pairs_new.unpersist()
    return stats


# ---------------------------------------------------------------------------
# Fingerprint-keyed artifact for the registry's gate corpus.
# ---------------------------------------------------------------------------


def artifact_enabled() -> bool:
    return os.environ.get(_ENV_DISABLE, "1") != "0"


def _default_base_dir(spark: SparkSession) -> str:
    base = os.environ.get(_ENV_BASE_DIR)
    if base:
        return base
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    return os.path.join(wh.removeprefix("file:"), "dedup_artifact")


def _corpus_fingerprint(sf_dir: str) -> str:
    """Staleness key: the artifact is valid only for the exact
    documents.parquet bytes (size+mtime) and the derivation chain it
    was built from — a regenerated corpus or an EDIT to any chain
    function forces a rebuild (chain_digest hashes their source;
    ADVICE r08)."""
    from .artifact_io import chain_digest, corpus_fingerprint

    chain = chain_digest(
        augmented_docs,
        _shingles,
        signatures_from_shingles,
        bands_from_signatures,
        cap_hot_buckets,
        verify_pair_ids,
        MAX_BUCKET_DOCS,
    )
    return corpus_fingerprint(
        sf_dir, "documents.parquet", ARTIFACT_VERSION, chain
    )


def ensure_dedup_artifact(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load (building on first use) the artifact for the gate corpus
    (``augmented_docs`` over ``sf_dir``).  The path is keyed by a corpus
    fingerprint, so a regenerated testdata dir can never serve stale
    pairs.  This is what re-points the dedup consumers at the artifact:
    within a session the SessionCaches still dedupe, but across sessions
    (a new bench run, a new driver round) the LSH chain is read, not
    recomputed."""
    path = gate_artifact_path(spark, sf_dir)
    if not gate_artifact_exists(spark, sf_dir):
        write_dedup_artifact(augmented_docs(spark, sf_dir), path)
    return load_dedup_artifact(spark, path)


def gate_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    return os.path.join(
        _default_base_dir(spark), f"gate-{_corpus_fingerprint(sf_dir)}"
    )


def gate_artifact_exists(spark: SparkSession, sf_dir: str) -> bool:
    """True iff the gate-corpus artifact is already built (a pure stat)."""
    return os.path.exists(
        os.path.join(gate_artifact_path(spark, sf_dir), "_meta.json")
    )
