"""The ANN/embedding index as a FIRST-CLASS, incrementally-maintained
dataset — the vector-side mirror of :mod:`dedup_artifact`.

At 100 TB a vector store does not re-quantize, re-assign, and re-encode
its corpus per query session — the index is a written artifact (the way
FAISS persists an IVF-PQ index, but as range-clustered parquet a whole
cluster can scan): quantized vectors, the IVF coarse assignment laid
out as inverted lists, and the PQ codebook + codes land on disk once;
every consumer (top-k search, recall eval, kNN probes, pair mining)
reads them, and new vector batches are folded in by assigning/encoding
ONLY the new vectors against the carried-over quantizers.

Layout at ``<path>/``::

    vectors/      (vec_id, label, bucket, qe array<long>)   primary, by vec_id
    centroids/    (list_id, c_qe array<long>)               IVF coarse quantizer
    ivf/          (list_id, vec_id, label, qe)              inverted lists
    pq_codebook/  (m, j, cv array<long>)                    PQ subspace codebooks
    pq_codes/     (vec_id, m, j)                            8 B/vector codes

``vectors`` is range-clustered by ``vec_id`` (point lookups prune by
parquet min/max); ``ivf`` by ``(list_id, vec_id)`` so a query's probe
set reads nprobe/nlist of the files — the inverted-list layout.
Publishing is the shared atomic symlink swap (artifact_io): readers
never observe a missing or half-written index.

Incremental contract (``append_ann_artifact``): results are
BIT-IDENTICAL to a cold rebuild over the full corpus, because the
quantizers are deterministic corpus draws pinned to fixed id ranges
(IVF centroids = vec_id CENTROID_BASE..+N_LIST, PQ codeword donors =
PQ_BASE..+PQ_KS) that the append carries over unchanged.  The append
therefore REFUSES new vec_ids that collide with stored ones or fall
inside a donor range (either would make a cold rebuild derive a
different quantizer).  Work is proportional to the new batch: one
broadcast assignment pass + one broadcast encoding pass over the new
vectors only.

Reference parity note: the reference has no vector surface; this is a
beyond-reference LLM-pipeline component (prompt §training-data
pipeline), operated like the dedup index (SURVEY.md §1.3 analog).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .artifact_io import (
    corpus_fingerprint,
    load_meta,
    publish_artifact,
    read_tables,
    write_clustered,
)

ANN_ARTIFACT_VERSION = 1
ANN_FILES = 8  # range buckets per big table at test scale; config at 100 TB

TABLES = ("vectors", "centroids", "ivf", "pq_codebook", "pq_codes")

_ENV_DISABLE = "SPARK_GRAFT_ANN_ARTIFACT"  # set to "0" to force cold compute
_ENV_BASE_DIR = "SPARK_GRAFT_ANN_ARTIFACT_DIR"


def index_frames(emb: DataFrame) -> dict[str, DataFrame]:
    """Derive all five index tables from a loaded embeddings frame —
    the cold chain shared by the artifact build and the
    ``SPARK_GRAFT_ANN_ARTIFACT=0`` fallback (so artifact-read and cold
    compute are the same values by construction)."""
    from .queries.similarity import (
        ivf_assign,
        ivf_centroids,
        pq_codebook_frame,
        pq_codes_frame,
        pq_distances,
        pq_subvectors,
        quantized_embeddings,
    )

    qv = quantized_embeddings(emb)
    cent = ivf_centroids(qv)
    sub = pq_subvectors(qv)
    cb = pq_codebook_frame(sub)
    return {
        "vectors": qv,
        "centroids": cent,
        "ivf": ivf_assign(qv, cent),
        "pq_codebook": cb,
        "pq_codes": pq_codes_frame(pq_distances(sub, cb)),
    }


def _publish(frames: dict[str, DataFrame], path: str) -> None:
    def build_into(tmp: str) -> None:
        write_clustered(
            frames["vectors"], os.path.join(tmp, "vectors"), ["vec_id"], ANN_FILES
        )
        write_clustered(
            frames["centroids"], os.path.join(tmp, "centroids"), ["list_id"], 1
        )
        write_clustered(
            frames["ivf"],
            os.path.join(tmp, "ivf"),
            ["list_id", "vec_id"],
            ANN_FILES,
        )
        write_clustered(
            frames["pq_codebook"], os.path.join(tmp, "pq_codebook"), ["m", "j"], 1
        )
        write_clustered(
            frames["pq_codes"],
            os.path.join(tmp, "pq_codes"),
            ["vec_id", "m"],
            ANN_FILES,
        )

    publish_artifact(path, {"version": ANN_ARTIFACT_VERSION}, build_into)


def write_ann_artifact(emb: DataFrame, path: str) -> dict:
    """Cold-build the index from a loaded embeddings frame: ONE
    quantization pass over the corpus, one broadcast IVF assignment,
    one broadcast PQ encoding — then five clustered parquet writes.
    Returns row-count stats."""
    frames = index_frames(emb)
    qv = frames["vectors"].persist()
    frames["vectors"] = qv
    try:
        _publish(frames, path)
    finally:
        qv.unpersist()
    art = load_ann_artifact(emb.sparkSession, path)
    return {
        "n_vectors": art["vectors"].count(),
        "n_lists": art["centroids"].count(),
        "n_codes": art["pq_codes"].count(),
    }


def load_ann_artifact(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Open the index's five tables as DataFrames (plus meta)."""
    meta = load_meta(path, ANN_ARTIFACT_VERSION, "ANN")
    out: dict = read_tables(spark, path, TABLES)
    out["meta"] = meta
    return out


def append_ann_artifact(
    spark: SparkSession, path: str, new_emb: DataFrame
) -> dict:
    """Fold a new embeddings batch into an existing index.

    The carried-over quantizers (centroids, PQ codebooks) make the
    result bit-identical to a cold rebuild — see the module docstring
    for the donor-range refusal that protects that contract.  Work is
    proportional to the batch: new vectors are assigned and encoded
    against the broadcast quantizers; stored rows are unioned through
    untouched."""
    from .queries.similarity import (
        CENTROID_BASE,
        N_LIST,
        PQ_BASE,
        PQ_KS,
        ivf_assign,
        pq_codes_frame,
        pq_distances,
        pq_subvectors,
        quantized_embeddings,
    )

    art = load_ann_artifact(spark, path)
    qv_new = quantized_embeddings(new_emb).persist()

    in_donor_range = (
        (F.col("vec_id") >= CENTROID_BASE)
        & (F.col("vec_id") < CENTROID_BASE + N_LIST)
    ) | ((F.col("vec_id") >= PQ_BASE) & (F.col("vec_id") < PQ_BASE + PQ_KS))
    bad = qv_new.where(in_donor_range).select("vec_id").limit(5).collect()
    if bad:
        qv_new.unpersist()
        raise ValueError(
            "append_ann_artifact: new vec_ids fall inside a quantizer donor "
            f"range (a cold rebuild would derive a different index): "
            f"{sorted(r.vec_id for r in bad)}"
        )
    collisions = (
        qv_new.select("vec_id")
        .join(art["vectors"].select("vec_id"), "vec_id", "left_semi")
        .limit(5)
        .collect()
    )
    if collisions:
        qv_new.unpersist()
        ids = sorted(r.vec_id for r in collisions)
        raise ValueError(
            f"append_ann_artifact: vec_ids already in the index "
            f"(append, not upsert): {ids}{'…' if len(ids) == 5 else ''}"
        )

    ivf_new = ivf_assign(qv_new, art["centroids"])
    codes_new = pq_codes_frame(
        pq_distances(pq_subvectors(qv_new), art["pq_codebook"])
    )
    frames = {
        "vectors": art["vectors"].unionByName(qv_new),
        "centroids": art["centroids"],
        "ivf": art["ivf"].unionByName(ivf_new),
        "pq_codebook": art["pq_codebook"],
        "pq_codes": art["pq_codes"].unionByName(codes_new),
    }
    try:
        stats = {"n_new_vectors": qv_new.count()}
        _publish(frames, path)
    finally:
        qv_new.unpersist()
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
    return os.path.join(wh.removeprefix("file:"), "ann_artifact")


def ensure_ann_artifact(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load (building on first use) the index for the gate corpus
    (``embeddings`` under ``sf_dir``).  The path is keyed by a corpus
    fingerprint, so a regenerated testdata dir can never serve a stale
    index.  This is what re-points the ANN consumers at the artifact:
    within a session the SessionCache still dedupes, but across sessions
    (a new bench run, a new driver round) the index is read, not
    recomputed."""
    from .tables import load, spread

    path = gate_artifact_path(spark, sf_dir)
    if not gate_artifact_exists(spark, sf_dir):
        write_ann_artifact(spread(load(spark, sf_dir, "embeddings"), "vec_id"), path)
    return load_ann_artifact(spark, path)


def gate_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    from .artifact_io import chain_digest
    from .queries import similarity as _sim

    # staleness key covers the DEFINING SOURCE of the derivation chain
    # (quantizers, IVF, PQ) plus its constants — editing any of them
    # invalidates the artifact automatically (ADVICE r08)
    chain = chain_digest(
        _sim._qvec,
        _sim._bucket,
        _sim.ivf_centroids,
        _sim.ivf_assign,
        _sim.pq_subvectors,
        _sim.pq_codebook_frame,
        _sim.pq_codes_frame,
        _sim.pq_distances,
        _sim.quantized_embeddings,
        (_sim.N_LIST, _sim.CENTROID_BASE, _sim.PQ_M, _sim.PQ_SUB, _sim.PQ_KS, _sim.PQ_BASE),
    )
    return os.path.join(
        _default_base_dir(spark),
        f"gate-{corpus_fingerprint(sf_dir, 'embeddings.parquet', ANN_ARTIFACT_VERSION, chain)}",
    )


def gate_artifact_exists(spark: SparkSession, sf_dir: str) -> bool:
    """True iff the gate-corpus index is already built (a pure stat)."""
    return os.path.exists(
        os.path.join(gate_artifact_path(spark, sf_dir), "_meta.json")
    )
