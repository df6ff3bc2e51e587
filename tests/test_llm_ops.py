"""LLM-data-pipeline operators vs DuckDB oracles + semantic checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_near_indexer_spark.queries import load_registry

from .oracle_harness import compare, duck_connect

LLM_QUERIES = [
    "text_stats",
    "text_language_id",
    "text_quality_score",
    "text_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_bruteforce_topk",
    "ann_lsh_bucketed_topk",
    "embedding_label_centroids",
    "embedding_norm_stats",
    "multimodal_features",
    "doc_chunk_windows",
    "knn_label_vote",
    "text_normalized_dedup",
    "corpus_drift_stats",
    "term_posting_lists",
    "dedup_chunk_boilerplate",
]


@pytest.mark.parametrize("name", LLM_QUERIES)
def test_llm_query_matches_oracle(spark, sf_dir, name):
    reg = load_registry()
    con = duck_connect(sf_dir)
    q = reg[name]
    r = compare(q.spark(spark, sf_dir), con, q.oracle)
    assert r["hash_match"], r


def test_minhash_finds_planted_neardups(spark, sf_dir):
    """Every planted near-dup pair (doc, doc+100000) must be recovered by
    LSH + verification; the exact copies (doc, doc+200000) too."""
    reg = load_registry()
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in reg["dedup_minhash_lsh"].spark(spark, sf_dir).collect()
    }
    import duckdb

    con = duck_connect(sf_dir)
    planted = [r[0] for r in con.sql("SELECT doc_id FROM documents WHERE doc_id % 10 = 0").fetchall()]
    found = sum((d, d + 100000) in pairs for d in planted)
    # 8 bands of 1 row: collision prob 1-(1-j)^8 ≈ 0.99 at j ≈ 0.45 —
    # demand ≥ 90 %.
    assert found >= 0.9 * len(planted), (found, len(planted))


def test_exact_dedup_finds_planted_copies(spark, sf_dir):
    reg = load_registry()
    rows = reg["dedup_exact"].spark(spark, sf_dir).collect()
    keepers = {r["keeper_id"] for r in rows}
    import duckdb

    con = duck_connect(sf_dir)
    planted = {r[0] for r in con.sql("SELECT doc_id FROM documents WHERE doc_id % 25 = 0").fetchall()}
    assert planted <= keepers  # every planted exact-copy group found


def test_prefix_filter_join_finds_every_planted_pair(spark, sf_dir):
    """The prefix-filter join is EXACT (zero false negatives): every
    planted pair above tau must appear — both the exact copies
    (d, d+200000), jaccard 1.0, and the near-dup pairs (d, d+100000)
    whose 5-gram overlap clears tau=0.15.  LSH can only claim expected
    recall; this operator's contract is completeness, so assert it."""
    reg = load_registry()
    rows = reg["dedup_prefix_filter_join"].spark(spark, sf_dir).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in rows}
    con = duck_connect(sf_dir)
    docs = {r[0] for r in con.sql("SELECT doc_id FROM documents").fetchall()}
    exact = {(d, d + 200000) for d in docs if d % 25 == 0}
    assert exact <= found  # completeness on the jaccard=1.0 pairs
    near = {(d, d + 100000) for d in docs if d % 10 == 0}
    missed = near - found
    # near-dup 5-gram overlap ~0.17-0.28 with doc-length jitter: demand
    # near-total coverage, and verify every find is above threshold
    assert len(missed) <= 0.02 * len(near), sorted(missed)[:5]
    assert all(r["jaccard_milli"] >= 150 for r in rows)


def test_leakage_safe_split_never_splits_a_cluster(spark, sf_dir):
    """The whole point of the cluster-keyed split: every near-dup
    cluster's members share one split (a doc_id-keyed split provably
    violates this on the planted pairs), and the 80/10/10 shape holds."""
    from pyspark.sql import functions as F

    from rust_near_indexer_spark.queries.dedup import (
        _pair_components,
        augmented_docs,
    )
    from rust_near_indexer_spark.canonical import hash60

    aug = augmented_docs(spark, sf_dir).select("doc_id")
    comp = _pair_components(spark, sf_dir).withColumnRenamed("node", "doc_id")
    grp = aug.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("grp")
    )
    bucket = hash60(F.col("grp").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    ).alias("split")
    spanning = (
        grp.select("grp", split)
        .groupBy("grp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert spanning == 0
    # the doc_id-keyed split WOULD leak: planted pairs (d, d+100000) hash
    # independently, so some cluster must straddle splits under it
    doc_bucket = hash60(F.col("doc_id").cast("string")) % 100
    doc_split = (
        F.when(doc_bucket < 80, "train")
        .when(doc_bucket < 90, "val")
        .otherwise("test")
    ).alias("split")
    leaky = (
        grp.select("grp", doc_split)
        .groupBy("grp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert leaky > 0


def test_simhash_neardups_close(spark, sf_dir):
    """Planted near-dups should land within small Hamming distance of the
    original; unrelated docs shouldn't systematically."""
    reg = load_registry()
    sh = {r["doc_id"]: r["simhash"] for r in reg["dedup_simhash"].spark(spark, sf_dir).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    near = [ham(sh[d], sh[d + 100000]) for d in sh if d + 100000 in sh and d < 100000]
    assert near and sum(near) / len(near) <= 2.0, near


def test_lsh_ann_is_subset_of_bruteforce_space(spark, sf_dir):
    """Bucketed ANN returns only same-bucket neighbors and never beats the
    brute-force top-1 (it searches a subset)."""
    reg = load_registry()
    bf = reg["ann_bruteforce_topk"].spark(spark, sf_dir).collect()
    lsh = reg["ann_lsh_bucketed_topk"].spark(spark, sf_dir).collect()
    bf_best = {r["query_id"]: r["cosine_pico"] for r in bf if r["rank"] == 1}
    for r in lsh:
        if r["rank"] == 1:
            assert r["cosine_pico"] <= bf_best[r["query_id"]]


def test_l2_normalize_restores_unit_norm(spark):
    """Scaled vectors come back unit-norm; the zero vector becomes null."""
    from rust_near_indexer_spark.queries.similarity import l2_normalize

    rows = [
        (1, [3.0, 4.0, 0.0]),
        (2, [0.5, 0.5, 0.5]),
        (3, [0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["embedding"] for r in l2_normalize(df).collect()}
    assert out[3] is None
    for vid in (1, 2):
        norm2 = sum(x * x for x in out[vid])
        assert abs(norm2 - 1.0) < 1e-6
    assert abs(out[1][0] - 0.6) < 1e-6 and abs(out[1][1] - 0.8) < 1e-6


def test_multimodal_stubs_raise():
    from rust_near_indexer_spark.operators import multimodal

    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"x", {})
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"x", {})


def test_cap_hot_buckets_drops_only_hot(spark):
    """The LSH hot-bucket cap removes every member of an over-cap
    (band, bucket) group and nothing else."""
    from rust_near_indexer_spark.queries.dedup import cap_hot_buckets

    rows = [(i, 0, 7) for i in range(10)] + [(i, 1, 7) for i in range(3)]
    bands = spark.createDataFrame(rows, "doc_id long, band int, bucket long")
    kept = cap_hot_buckets(bands, cap=5).collect()
    assert {(r["band"], r["bucket"]) for r in kept} == {(1, 7)}
    assert len(kept) == 3


def test_resize_media_nearest_neighbor(spark):
    """resize_media's fake grayscale decode + numpy nearest-neighbor must
    match a hand-computed reference, and drop rows without dimensions."""
    from rust_near_indexer_spark.operators import multimodal

    w, h = 4, 2
    img = bytes(range(w * h))  # 0..7 raster
    rows = [
        (1, "image", img, {"width": w, "height": h, "sample_rate": None, "n_frames": None}),
        (2, "image", b"xx", {"width": None, "height": None, "sample_rate": None, "n_frames": None}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.resize_media(media, 2, 2).collect()}
    assert set(out) == {1}
    # ys = [0,1], xs = [0,2] -> pixels (0,0),(0,2),(1,0),(1,2) = 0,2,4,6
    assert bytes(out[1]["resized"]) == bytes([0, 2, 4, 6])


def test_sample_frames_slices_and_strides(spark):
    from rust_near_indexer_spark.operators import multimodal

    payload = bytes(range(20))  # frames of 4 bytes -> 5 frames, keep 0 and 4... wait
    rows = [(7, "video", payload, {"width": None, "height": None, "sample_rate": None, "n_frames": 5})]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        (r["media_id"], r["frame_idx"]): r["frame_hex"]
        for r in multimodal.sample_frames(media, frame_bytes=4, every_k=2).collect()
    }
    assert got == {
        (7, 0): bytes(range(0, 4)).hex().upper(),
        (7, 2): bytes(range(8, 12)).hex().upper(),
        (7, 4): bytes(range(16, 20)).hex().upper(),
    }


def test_kmeans_partitions_the_corpus(spark, sf_dir):
    """Final k-means assignment must partition the embeddings table:
    cluster sizes sum to the row count and ids stay within 0..K-1."""
    from rust_near_indexer_spark.queries.clustering import K
    from rust_near_indexer_spark.tables import load

    reg = load_registry()
    rows = reg["embedding_kmeans"].spark(spark, sf_dir).collect()
    n_emb = load(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == n_emb
    assert all(0 <= r["cluster"] < K for r in rows)
    assert all(r["inertia"] >= 0 for r in rows)


def test_corpus_mixture_epoch_semantics(spark, sf_dir):
    """Sources with weight ≥ 1.0 (srcN, N ≥ 5) keep every document in
    epoch 1; no document exceeds ceil(max weight) = 3 epochs."""
    reg = load_registry()
    rows = reg["corpus_mixture"].spark(spark, sf_dir).collect()
    assert max(r["epoch"] for r in rows) <= 3
    import duckdb

    con = duck_connect(sf_dir)
    per_source = dict(
        con.sql("SELECT source, COUNT(*) FROM documents GROUP BY source").fetchall()
    )
    for r in rows:
        n = int(r["source"][3:])
        if r["epoch"] == 1 and n % 20 >= 5:
            assert r["n_docs"] == per_source[r["source"]], r


def test_token_budget_shards_conserve_tokens(spark, sf_dir):
    """Shard ids are contiguous from 0 per source and shard token totals
    sum to the source's total token count."""
    from collections import defaultdict

    reg = load_registry()
    rows = reg["token_budget_shards"].spark(spark, sf_dir).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    import duckdb

    con = duck_connect(sf_dir)
    totals = dict(
        con.sql(
            "SELECT source, CAST(SUM(len(string_split(text,' '))) AS BIGINT)"
            " FROM documents GROUP BY source"
        ).fetchall()
    )
    for src, shards in by_src.items():
        ids = sorted(s["shard_id"] for s in shards)
        assert ids == list(range(len(ids))), src
        assert sum(s["shard_tokens"] for s in shards) == totals[src], src


def test_semantic_dedup_drops_planted_neardups(spark, sf_dir):
    """The augmented corpus plants one 0.99-cosine near-dup per
    vec_id % 20 == 0; semantic dedup must drop (nearly) all of them —
    a planted dup survives only if assignment split it from its base."""
    from rust_near_indexer_spark.tables import load

    reg = load_registry()
    rows = reg["semantic_dedup"].spark(spark, sf_dir).collect()
    n_emb = load(spark, sf_dir, "embeddings").count()
    n_planted = (
        load(spark, sf_dir, "embeddings").where(F.expr("vec_id % 20 = 0")).count()
    )
    assert sum(r["n_vectors"] for r in rows) == n_emb + n_planted
    dropped = sum(r["n_dropped"] for r in rows)
    assert dropped >= int(0.8 * n_planted), (dropped, n_planted)


def _escaped_neardup_count(spark, sf_dir) -> int:
    """Brute-force recall audit of the SemDeDup bucket prefilter: count
    same-cluster pairs above the cosine threshold that land in DIFFERENT
    sign-bit buckets — exactly the pairs the cluster+bucket pair join
    would silently miss.  0 ⇒ the prune is lossless on this corpus."""
    from rust_near_indexer_spark.queries.clustering import _assign, _final_centroids
    from rust_near_indexer_spark.queries.similarity import (
        NEAR_DUP_COSINE_PICO,
        _augmented_embeddings,
        _bucket,
        _dot_pico,
        _qvec,
    )

    aug = _augmented_embeddings(spark, sf_dir)
    augq = aug.select(
        "vec_id",
        _bucket(F.col("embedding")).alias("bucket"),
        _qvec(F.col("embedding")).alias("qe"),
    )
    assigned = _assign(augq, _final_centroids(spark, sf_dir), carry=("bucket",)).select(
        "vec_id", "qe", "bucket", "cluster"
    )
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("qe").alias("qe_a"),
        F.col("bucket").alias("bucket_a"),
        "cluster",
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("qe").alias("qe_b"),
        F.col("bucket").alias("bucket_b"),
        "cluster",
    )
    return (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where(_dot_pico(F.col("qe_a"), F.col("qe_b")) >= NEAR_DUP_COSINE_PICO)
        .where(F.col("bucket_a") != F.col("bucket_b"))
        .count()
    )


def test_semantic_dedup_bucket_prune_is_lossless(spark, sf_dir):
    """ADVICE r02: the LSH-bucket prefilter on the SemDeDup pair join is
    an approximation — a cosine>=0.9 pair whose first 8 embedding
    components straddle zero could land in different buckets and escape
    dedup.  Brute-force every same-cluster pair (no bucket condition) and
    assert none above the threshold crosses buckets, so the prune is
    provably lossless on the shipped fixtures."""
    escaped = _escaped_neardup_count(spark, sf_dir)
    assert escaped == 0, f"{escaped} near-dup pairs cross LSH buckets"


def test_semantic_dedup_recall_audit_catches_planted_straddler(spark, tmp_path):
    """Red-team of the lossless assertion (VERDICT r03 item 3): plant a
    near-dup pair whose first component straddles zero (+eps vs -eps, all
    else equal) — cosine ~ 1 but different sign-bit buckets.  The recall
    audit must report it as escaped, proving the audit actually detects
    the class of recall loss the bucket prune can cause."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    dim = 64
    clustering = __import__(
        "rust_near_indexer_spark.queries.clustering", fromlist=["_CEN_CACHE"]
    )

    def unit(vals):
        n = math.sqrt(sum(x * x for x in vals))
        return [x / n for x in vals]

    rng_base = [
        unit([((7 * i + 3 * j) % 13) - 6.0 for j in range(dim)]) for i in range(8)
    ]
    # vectors 3 and 7 (avoid %20==0 so augmentation doesn't clone them):
    # identical except component 0 flips sign at tiny magnitude
    common = unit([0.0] + [((5 * j) % 11) - 5.0 for j in range(1, dim)])
    v_pos = unit([1e-3] + common[1:])
    v_neg = unit([-1e-3] + common[1:])
    vecs = list(rng_base)
    vecs[3] = v_pos
    vecs[7] = v_neg
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(8), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0] * 8, pa.int32()),
            }
        ),
        f"{tmp_path}/embeddings.parquet",
    )
    clustering._CEN_CACHE.clear()  # keyed by (session, sf_dir); drop stale state
    try:
        escaped = _escaped_neardup_count(spark, str(tmp_path))
    finally:
        clustering._CEN_CACHE.clear()
    assert escaped >= 1, "recall audit failed to flag a bucket-straddling near-dup"


def test_doc_chunk_windows_cover_every_token(spark, sf_dir):
    """Chunking invariants: chunk_idx is dense from 0, every chunk holds
    1..64 tokens, consecutive chunks overlap by exactly 16 (except the
    ragged tail), and the last chunk ends exactly at the doc's length."""
    from rust_near_indexer_spark.queries.sampling import CHUNK_STRIDE, CHUNK_TOKENS
    from rust_near_indexer_spark.tables import load

    reg = load_registry()
    rows = reg["doc_chunk_windows"].spark(spark, sf_dir).collect()
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_tokens)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        assert all(1 <= c["chunk_tokens"] <= CHUNK_TOKENS for c in chunks)
        last = chunks[-1]
        assert last["chunk_idx"] * CHUNK_STRIDE + last["chunk_tokens"] == n_tokens[doc_id]
        # all but the ragged tail are full windows
        assert all(c["chunk_tokens"] == CHUNK_TOKENS for c in chunks[:-1])


def test_bigram_queries_handle_short_docs(spark, tmp_path):
    """ADVICE r03: a corpus containing 1-word and empty-text documents
    must still hash-match — both sides emit zero bigram terms for a
    <2-token doc (the oracles' range(1, len(w)) is empty; the Spark
    slices are zero-length)."""
    docs = [
        (1, "alpha beta gamma alpha beta", "en", "web", 27),
        (2, "alpha beta alpha beta gamma", "en", "web", 27),
        (3, "solo", "en", "books", 4),  # 1-word doc: no bigrams
        (4, "", "en", "books", 0),  # empty text: split→[""], no bigrams
        (5, "beta gamma beta gamma alpha", "en", "books", 27),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path)
    cols = list(zip(*docs))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.int64()),
                "text": pa.array(cols[1], pa.string()),
                "lang": pa.array(cols[2], pa.string()),
                "source": pa.array(cols[3], pa.string()),
                "n_chars": pa.array(cols[4], pa.int64()),
            }
        ),
        f"{sf}/documents.parquet",
    )
    reg = load_registry()
    con = duck_connect(sf)
    for name in ("tfidf_top_terms", "term_posting_lists"):
        q = reg[name]
        r = compare(q.spark(spark, sf), con, q.oracle)
        assert r["hash_match"], (name, r)
        # the 1-word and empty docs must not surface as lone-word terms
        terms = {
            row["term"] for row in q.spark(spark, sf).select("term").collect()
        }
        assert "solo" not in terms and "" not in terms


def test_bm25_retrieves_planted_neardup_first(spark, sf_dir):
    """Query-by-document BM25: a probe doc whose planted near-duplicate
    (doc_id+100000, same text modulo small edits) exists in the corpus
    must retrieve it at rank 1 — the retrieval-quality smoke test."""
    reg = load_registry()
    rows = reg["bm25_topk_retrieval"].spark(spark, sf_dir).collect()
    corpus_ids = {
        r["doc_id"]
        for r in __import__("rust_near_indexer_spark.tables", fromlist=["load"])
        .load(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    }
    top1 = {r["query_doc"]: r["doc_id"] for r in rows if r["rank"] == 1}
    assert top1, "no probe docs produced results"
    for probe, best in top1.items():
        if probe % 10 == 0 and probe + 100000 in corpus_ids:
            assert best == probe + 100000, (probe, best)


# ---------------------------------------------------------------------------
# dedup_substring_spans: the oracle's gaps-and-islands span merge must
# equal a brute-force Python reference on synthetic corpora with planted
# duplicate runs (the fixed-corpus gate only exercises the testdata's
# duplicate shapes).
# ---------------------------------------------------------------------------


def _python_duplicate_spans(docs: dict[int, list[str]], window: int):
    """Reference: windows whose token-string occurs >=2 times corpus-wide;
    overlapping/adjacent duplicated positions merge into maximal spans."""
    from collections import Counter

    occurs: Counter = Counter()
    for w in docs.values():
        for p in range(len(w) - window + 1):
            occurs[" ".join(w[p : p + window])] += 1
    out = []
    for doc_id, w in sorted(docs.items()):
        dup_pos = [
            p
            for p in range(len(w) - window + 1)
            if occurs[" ".join(w[p : p + window])] >= 2
        ]
        run: list[int] = []
        for p in dup_pos:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    out.append(
                        (doc_id, run[0], run[-1] + window - 1,
                         run[-1] - run[0] + window, len(run))
                    )
                run = [p]
        if run:
            out.append(
                (doc_id, run[0], run[-1] + window - 1,
                 run[-1] - run[0] + window, len(run))
            )
    return sorted(out)


def test_substring_span_oracle_matches_python_reference():
    """Run the registered DuckDB oracle over a synthetic documents table
    (doc_ids chosen so the augmentation is the identity) and compare
    against the brute-force reference: shared prefix between docs 1 and 2,
    an intra-doc repeat in doc 3, an exact pair 4/6, and a unique doc 7."""
    import duckdb
    import pandas as pd

    from rust_near_indexer_spark.queries import load_registry
    from rust_near_indexer_spark.queries.dedup import SPAN_WINDOW

    w = SPAN_WINDOW
    shared = [f"s{i}" for i in range(w + 3)]  # 11-token shared run
    rep = [f"r{i}" for i in range(w)]  # exactly one window, repeated in-doc
    docs = {
        1: shared + ["a1", "a2", "a3"],
        2: ["b1", "b2"] + shared,
        3: rep + ["mid"] + rep,
        4: [f"x{i}" for i in range(w + 5)],
        6: [f"x{i}" for i in range(w + 5)],
        7: [f"u{i}" for i in range(w + 2)],
    }
    pdf = pd.DataFrame(
        {
            "doc_id": list(docs),
            "text": [" ".join(t) for t in docs.values()],
            "lang": "en",
            "source": "synth",
            "n_chars": [len(" ".join(t)) for t in docs.values()],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = load_registry()["dedup_substring_spans"].oracle
    got = sorted(tuple(r) for r in con.sql(oracle).fetchall())
    assert got == _python_duplicate_spans(docs, w)
