"""End-to-end curation pipeline (curation.curate): planted corpus in →
decision audit + leak-safe splits + shard manifest out, with the
invariants a production curation run relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_near_indexer_spark import curation


def _corpus(spark):
    """9 originals + planted structure: one exact copy, one near-dup
    (every 7th word dropped), two junk docs (short words → low quality)."""
    base = [
        (i, " ".join(f"sentence{i}word{j}" for j in range(40)), "web")
        for i in range(1, 10)
    ]
    near = " ".join(
        w for j, w in enumerate(base[0][1].split(" ")) if (j + 1) % 7 != 0
    )
    rows = (
        base
        + [(101, base[2][1], "web")]  # exact copy of doc 3
        + [(102, near, "web")]  # near-dup of doc 1
        + [(103, "a b c d e f g h i j k l m n o p", "books")]  # junk
        + [(104, "x y z w v u t s r q p o n m l k", "books")]  # junk
    )
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_curate_invariants(spark):
    docs = _corpus(spark)
    out = curation.curate(docs)
    dec = {r["doc_id"]: r["stage"] for r in out["decisions"].collect()}

    # document conservation: every input doc classified exactly once
    assert set(dec) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert out["decisions"].count() == docs.count()

    # planted structure found
    assert dec[101] == "exact_dup"  # the copy lost to keep-min
    assert dec[3] == "kept"
    assert dec[102] == "near_dup"  # the word-dropped variant lost
    assert dec[1] == "kept"
    assert dec[103] == "low_quality" and dec[104] == "low_quality"

    # splits cover exactly the kept docs; the rule is cluster-keyed
    splits = {r["doc_id"]: r["split"] for r in out["splits"].collect()}
    kept = {d for d, s in dec.items() if s == "kept"}
    assert set(splits) == kept
    assert set(splits.values()) <= {"train", "val", "test"}

    # manifest covers exactly the kept docs; shard token sums respect
    # the budget within one max-document overshoot
    man = out["manifest"].collect()
    assert {r["doc_id"] for r in man} == kept
    by_shard: dict[tuple, int] = {}
    max_doc = max(r["n_tokens"] for r in man)
    for r in man:
        by_shard[(r["split"], r["source"], r["shard_id"])] = (
            by_shard.get((r["split"], r["source"], r["shard_id"]), 0) + r["n_tokens"]
        )
    for (split, source, sid), tok in by_shard.items():
        assert tok < curation.SHARD_TOKENS + max_doc, (split, source, sid, tok)


def test_curate_split_is_cluster_deterministic(spark):
    """Same corpus → identical split assignment on a re-run (pure hash
    of the cluster label; no RNG, no partition-order dependence)."""
    docs = _corpus(spark)
    s1 = {r["doc_id"]: r["split"] for r in curation.curate(docs)["splits"].collect()}
    s2 = {r["doc_id"]: r["split"] for r in curation.curate(docs)["splits"].collect()}
    assert s1 == s2


def test_curate_degenerate_corpora(spark):
    """Degenerate inputs must classify cleanly, not crash: a singleton
    corpus, an all-identical corpus (one keeper, rest exact_dup), and
    short-doc corpora below the shingle width (no pairs possible)."""
    one = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(30)), "web")],
        "doc_id long, text string, source string",
    )
    out = curation.curate(one)
    assert {r["stage"] for r in out["decisions"].collect()} == {"kept"}

    same_text = " ".join(f"dup{i}" for i in range(30))
    clones = spark.createDataFrame(
        [(i, same_text, "web") for i in range(1, 6)],
        "doc_id long, text string, source string",
    )
    dec = {r["doc_id"]: r["stage"] for r in curation.curate(clones)["decisions"].collect()}
    assert dec[1] == "kept"
    assert all(dec[i] == "exact_dup" for i in range(2, 6))

    shorts = spark.createDataFrame(
        [(1, "one two", "web"), (2, "uno", "web"), (3, "", "web")],
        "doc_id long, text string, source string",
    )
    dec2 = {r["doc_id"]: r["stage"] for r in curation.curate(shorts)["decisions"].collect()}
    assert set(dec2) == {1, 2, 3}
    assert all(s in ("kept", "low_quality") for s in dec2.values())
