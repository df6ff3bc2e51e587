"""K-means clustering over the ``embeddings`` table (north-star §LLM).

Semantic clustering is the backbone of several training-data operations
— SemDeDup-style semantic dedup, topic-balanced mixture design, and IVF
index construction (``similarity.ann_ivf_topk`` consumes exactly this
kind of coarse quantizer).  This module runs Lloyd's algorithm as a
DataFrame loop: broadcast the K centroids, assign each vector map-side,
re-estimate centroids with one partial-aggregated shuffle, repeat.

Determinism (the oracle gate is exact): embeddings are quantized once
to integer micro-units per component, so every distance is an exact
BIGINT and both engines agree bit-for-bit.  Seeding is deterministic
(the vectors at ``vec_id ∈ {0,50,…,350}``), iteration count is fixed,
and ties in the argmin break on cluster id — a float k-means with
random init could never hash-match across engines.  The DuckDB oracle
unrolls the identical iterations as a generated CTE chain (the
``receipt_pagerank`` pattern).

Scale shape (the MLlib shape, spelled out): per iteration the K×64
centroid table is broadcast (a few KiB at any corpus size), assignment
is embarrassingly parallel over the corpus scan, and the centroid
update is a single groupBy(cluster) whose 64 component sums combine
map-side — the only shuffle moves K×65 longs per upstream partition,
never the vectors.  Each new centroid table is eagerly materialized
(plans/state.py lineage rule) so iteration k never replays 0..k-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..canonical import duck_fingerprint, fingerprint
from ..tables import load, spread
from . import register

DIM = 64
KM_ITERS = 3  # assign/update rounds; one extra final assignment reports
SEED_STRIDE = 50  # seed centroids at vec_id 0,50,...,350 → K = 8
K = 8

# ---- DuckDB oracle, generated as an unrolled CTE chain --------------------

_Q_CTE = """q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
        FROM embeddings
    )"""

_C0_CTE = f"""c0 AS (
        SELECT vec_id // {SEED_STRIDE} AS cluster, qe AS ce
        FROM q WHERE vec_id % {SEED_STRIDE} = 0 AND vec_id < {K * SEED_STRIDE}
    )"""


def _km_assign(prev_c: str, out: str) -> str:
    return f"""{out}_d AS (
        SELECT v.vec_id, v.qe, c.cluster,
               CAST(list_sum(list_transform(list_zip(v.qe, c.ce),
                   p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist
        FROM q v CROSS JOIN {prev_c} c
    ),
    {out} AS (
        SELECT vec_id, qe, cluster, dist FROM (
            SELECT vec_id, qe, cluster, dist,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cluster) AS rk
            FROM {out}_d
        ) WHERE rk = 1
    )"""


def _km_update(assign: str, out: str) -> str:
    return f"""{out}_s AS (
        SELECT cluster, i, SUM(qe[i]) AS s, COUNT(*) AS n
        FROM {assign}, range(1, {DIM + 1}) t(i)
        GROUP BY cluster, i
    ),
    {out} AS (
        SELECT cluster, array_agg(CAST(s // n AS BIGINT) ORDER BY i) AS ce
        FROM {out}_s GROUP BY cluster
    )"""


_KM_CTES = ",\n    ".join(
    [_Q_CTE, _C0_CTE]
    + [
        part
        for it in range(KM_ITERS)
        for part in (
            _km_assign(f"c{it}", f"a{it + 1}"),
            _km_update(f"a{it + 1}", f"c{it + 1}"),
        )
    ]
    + [_km_assign(f"c{KM_ITERS}", f"a{KM_ITERS + 1}")]
)


@register(
    "embedding_kmeans",
    oracle=f"""
    WITH
    {_KM_CTES}
    SELECT cluster, COUNT(*) AS n_vectors,
           CAST(SUM(dist) AS BIGINT) AS inertia,
           {duck_fingerprint('vec_id')} AS member_fingerprint
    FROM a{KM_ITERS + 1}
    GROUP BY cluster
    ORDER BY cluster
    """,
    tags=("clustering", "llm-pipeline", "beyond-reference", "iterative"),
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means, {K} clusters × {KM_ITERS} rounds, over the
    micro-quantized embedding vectors.  Per round: broadcast-join the
    K×{DIM} centroid table (map-side assignment, min-struct argmin with
    map-side combine — no window sort), then one groupBy(cluster) with
    {DIM} component sums to re-estimate centroids (integer mean,
    truncating div on both engines).  Emits per-cluster size, integer
    inertia, and the exact member-set fingerprint — the gate proves the
    full partition of the corpus, not just the counts."""
    from ..plans.state import _materialize

    emb = spread(load(spark, sf_dir, "embeddings"))
    vec = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1e6).cast("long")
        ).alias("qe"),
    )

    cen = vec.where(
        (F.col("vec_id") % SEED_STRIDE == 0) & (F.col("vec_id") < K * SEED_STRIDE)
    ).select(
        F.expr(f"vec_id div {SEED_STRIDE}").alias("cluster"), F.col("qe").alias("ce")
    )

    def assign(centroids: DataFrame) -> DataFrame:
        sq = F.zip_with("qe", "ce", lambda x, y: (x - y) * (x - y))
        dist = F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v)
        scored = vec.crossJoin(F.broadcast(centroids)).select(
            "vec_id", "qe", "cluster", dist.alias("dist")
        )
        # argmin via min(struct): combines map-side, unlike a window sort
        best = scored.groupBy("vec_id").agg(
            F.min(F.struct("dist", "cluster", "qe")).alias("m")
        )
        return best.select(
            "vec_id", "m.qe", F.col("m.cluster").alias("cluster"), F.col("m.dist").alias("dist")
        )

    def update(assigned: DataFrame) -> DataFrame:
        agg = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[F.sum(F.get("qe", i)).alias(f"s{i}") for i in range(DIM)],
        )
        return _materialize(
            agg.select(
                "cluster",
                F.array(*[F.expr(f"s{i} div n") for i in range(DIM)]).alias("ce"),
            )
        )

    cen = _materialize(cen)
    for _ in range(KM_ITERS):
        cen = update(assign(cen))
    final = assign(cen)
    return (
        final.groupBy("cluster")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum("dist").alias("inertia"),
            fingerprint("vec_id").alias("member_fingerprint"),
        )
        .orderBy("cluster")
    )
