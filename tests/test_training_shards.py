"""write_training_shards: the token_budget_shards manifest materialized
as a partition-pruned JSONL shard tree — membership deterministic,
every document present exactly once, shard dirs enumerable by path."""

from __future__ import annotations

import glob
import json
import os

from rust_near_indexer_spark import sinks
from rust_near_indexer_spark.queries import load_registry
from rust_near_indexer_spark.tables import load


def test_shard_tree_round_trips_the_corpus(spark, sf_dir, tmp_path):
    from rust_near_indexer_spark.queries.sampling import shard_assignments

    load_registry()
    manifest = shard_assignments(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    stats = sinks.write_training_shards(docs, manifest, out)
    assert stats["n_docs"] == docs.count()  # every doc assigned + written

    # the shard key is in the path (loaders claim shards by listing)
    shard_dirs = glob.glob(os.path.join(out, "source=*", "shard_id=*"))
    assert len(shard_dirs) == stats["n_shards"]
    # one data file per shard (atomic per-shard visibility)
    for d in shard_dirs:
        files = [f for f in os.listdir(d) if f.startswith("part-")]
        assert len(files) == 1, d

    # membership matches the manifest exactly (read back raw, no Spark)
    want = {
        (r["doc_id"], r["source"], r["shard_id"])
        for r in manifest.select("doc_id", "source", "shard_id").collect()
    }
    got = set()
    for d in shard_dirs:
        src = d.split("source=")[1].split("/")[0]
        sid = int(d.split("shard_id=")[1])
        for f in glob.glob(os.path.join(d, "part-*")):
            for line in open(f):
                row = json.loads(line)
                got.add((row["doc_id"], src, sid))
                assert "text" in row and "doc_id" in row
    assert got == want

    # pruned read: one shard via the partition path predicate
    first = shard_dirs[0]
    src = first.split("source=")[1].split("/")[0]
    sid = int(first.split("shard_id=")[1])
    pruned = (
        spark.read.json(out)
        .where(f"source = '{src}' AND shard_id = {sid}")
        .count()
    )
    assert pruned == sum(1 for (_, s, k) in want if s == src and k == sid)
