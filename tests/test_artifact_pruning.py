"""File-level manifest pruning for artifact tables (artifact_io).

At 100 TB the clustered layout only pays off if a point/probe lookup
can SKIP files without opening their footers.  These tests pin:
manifest contents match the parquet footers, pruned reads return the
same rows as full scans, point/IN/range lookups actually read a
strict subset of files, files without stats are conservatively kept,
and a missing manifest degrades to the full scan.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rust_near_indexer_spark.artifact_io import read_pruned, write_clustered


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pruning") / "tbl")
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    write_clustered(df, path, ["k"], 8)
    return path


def _files(path):
    return sorted(
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def test_manifest_written_and_matches_footers(clustered):
    with open(os.path.join(clustered, "_manifest.json")) as fh:
        m = json.load(fh)
    assert m["cols"] == ["k"]
    names = [e["file"] for e in m["files"]]
    assert names == _files(clustered)
    assert len(names) == 8
    # ranges are disjoint and cover 0..3999 (repartitionByRange + sort)
    ranges = sorted(e["stats"]["k"] for e in m["files"])
    assert ranges[0][0] == 0 and ranges[-1][1] == 3999
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_point_lookup_reads_one_file(spark, clustered):
    df, n_read, n_total = read_pruned(
        spark, clustered, "k", values=[1234]
    )
    assert n_total == 8 and n_read == 1
    got = df.where(F.col("k") == 1234).collect()
    assert len(got) == 1 and got[0]["v"] == 1234 % 97


def test_in_lookup_subset_and_equality(spark, clustered):
    vals = [3, 1999, 3998]
    df, n_read, n_total = read_pruned(
        spark, clustered, "k", values=vals
    )
    assert 1 <= n_read <= 3 < n_total
    got = sorted(
        r["k"] for r in df.where(F.col("k").isin(vals)).collect()
    )
    assert got == sorted(vals)


def test_range_lookup_subset_and_equality(spark, clustered):
    df, n_read, n_total = read_pruned(
        spark, clustered, "k", lo=1000, hi=1500
    )
    assert n_read < n_total
    full = spark.read.parquet(clustered)
    want = full.where((F.col("k") >= 1000) & (F.col("k") <= 1500)).count()
    got = df.where((F.col("k") >= 1000) & (F.col("k") <= 1500)).count()
    assert got == want == 501


def test_miss_reads_zero_files(spark, clustered):
    df, n_read, _ = read_pruned(
        spark, clustered, "k", values=[999999]
    )
    assert n_read == 0
    assert df.count() == 0
    # schema preserved for downstream plan building
    assert [f.name for f in df.schema.fields] == ["k", "v"]


def test_missing_manifest_falls_back_to_full_scan(
    spark, clustered, tmp_path
):
    import shutil

    path = str(tmp_path / "nomanifest")
    shutil.copytree(clustered, path)
    os.remove(os.path.join(path, "_manifest.json"))
    df, n_read, n_total = read_pruned(spark, path, "k", values=[5])
    assert (n_read, n_total) == (-1, -1)
    assert df.where(F.col("k") == 5).count() == 1


def test_unknown_column_keeps_all_files(spark, clustered):
    df, n_read, n_total = read_pruned(
        spark, clustered, "v", values=[5]
    )
    # v is not a cluster column: no stats recorded, nothing pruned
    assert n_read == n_total
    assert df.where(F.col("v") == 5).count() > 0


def test_multi_column_manifest_second_key(spark, tmp_path):
    path = str(tmp_path / "two")
    df = spark.range(0, 1000).select(
        (F.col("id") % 10).alias("list_id"), F.col("id").alias("vec_id")
    )
    write_clustered(df, path, ["list_id", "vec_id"], 5)
    pr, n_read, n_total = read_pruned(
        spark, path, "list_id", values=[0]
    )
    assert n_read < n_total
    assert pr.where(F.col("list_id") == 0).count() == 100


def test_ann_search_cli_prunes(spark, tmp_path, capsys):
    """End-to-end: the `ann search` CLI reports a strict-subset file
    read for both the vec_id point lookup and the probe-set ivf read,
    and still returns top-k."""
    from rust_near_indexer_spark.__main__ import main as cli_main

    vecs = str(tmp_path / "vecs.parquet")
    art = str(tmp_path / "ann")
    spark.range(0, 400).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: (F.col("id") % 13 + i).cast("double") / 20.0,
        ).alias("embedding"),
        (F.col("id") % 3).cast("int").alias("label"),
    ).write.mode("overwrite").parquet(vecs)

    assert cli_main(["--cpus", "4", "ann", "build", "--vectors", vecs,
                     "--artifact", art]) == 0
    assert cli_main(["--cpus", "4", "ann", "search", "--vec-id", "7",
                     "--artifact", art]) == 0
    out = capsys.readouterr().out
    assert "manifest pruning: vectors 1/" in out
    import re

    m = re.search(r"ivf (\d+)/(\d+) files", out)
    assert m, out
    assert int(m.group(1)) <= int(m.group(2))
    assert "top-5" in out
