"""cwd-independence of the driver contract (VERDICT r09 #1).

``__spark_entry__`` fixes only the driver's ``sys.path``; executor
Python workers must import ``rust_near_indexer_spark`` themselves for
every mapInPandas closure that references module-level functions
(codecs, WARC parsing, BPE encode).  Historically that import only
worked because the JVM was launched from ``/root/repo`` (the daemon's
cwd landed on the worker path), so a vanilla session built from any
other cwd failed 9/153 queries with ModuleNotFoundError.

The fix is ``session.ship_package``: zip the package and
``sparkContext.addPyFile`` it at ``tune()`` time.  This test pins the
fix END-TO-END the only honest way: a SUBPROCESS whose cwd is a temp
dir and whose environment carries no PYTHONPATH builds a vanilla
SparkSession and runs one query per previously failing class
(WARC ingest, image codec, audio codec, BPE encode).  In-process tests
cannot catch a regression here — the suite's own JVM is repo-launched.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One representative per affected closure class (the full nine share
# these four code paths; the /tmp 153-query sweep in PLANS covers all).
PROBE_QUERIES = (
    "warc_ingest_stats",
    "image_webp_decode_stats",
    "audio_g711_expand_stats",
    "bpe_fixed_merge_token_counts",
)

_DRIVER_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "2g")
    .getOrCreate()
)
import __spark_entry__ as e

qs = e.queries()
for name in {probes!r}:
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    print(f"PROBE {{name}} rows={{n}}")
print("PROBE_OK")
"""


def test_queries_run_from_foreign_cwd_without_pythonpath(tmp_path):
    """The exact failure recipe from VERDICT r09: vanilla session, cwd
    outside the repo, no PYTHONPATH — the mapInPandas queries must
    still run because tune() ships the package zip to workers."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    script = _DRIVER_SCRIPT.format(repo=REPO_DIR, probes=PROBE_QUERIES)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "PROBE_OK" in proc.stdout, proc.stdout[-2000:]
    assert "ModuleNotFoundError" not in proc.stderr
    for name in PROBE_QUERIES:
        assert f"PROBE {name} rows=" in proc.stdout


def test_package_zip_contents_and_identity():
    """The shipped zip must be importable from its root (package dir at
    archive root), carry every source module, exclude bytecode, and be
    content-addressed (same sources → same path; the build is pure)."""
    from rust_near_indexer_spark.session import _package_zip

    z1 = _package_zip()
    z2 = _package_zip()
    assert z1 == z2
    with zipfile.ZipFile(z1) as zf:
        names = zf.namelist()
    assert all(n.startswith("rust_near_indexer_spark/") for n in names)
    assert "rust_near_indexer_spark/__init__.py" in names
    assert "rust_near_indexer_spark/operators/warc.py" in names
    assert not any(n.endswith(".pyc") or "__pycache__" in n for n in names)
    on_disk = set()
    pkg = os.path.join(REPO_DIR, "rust_near_indexer_spark")
    for root, dirs, files in os.walk(pkg):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                rel = os.path.relpath(os.path.join(root, f), pkg)
                on_disk.add("rust_near_indexer_spark/" + rel.replace(os.sep, "/"))
    assert set(names) == on_disk


def test_ship_package_idempotent(spark):
    """Second call is a no-op on the same context (addPyFile twice with
    the same name would raise on some Spark versions)."""
    from rust_near_indexer_spark.session import ship_package

    ship_package(spark)
    sc = spark.sparkContext
    assert getattr(sc, "_rni_pkg_shipped", False)
    ship_package(spark)  # must not raise


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
