"""The operational CLI drives ingest → validate → query end-to-end."""

from __future__ import annotations

import duckdb

from rust_near_indexer_spark.__main__ import main
from rust_near_indexer_spark.queries.near_events import BLOCKS_PATH, expected_path


def test_cli_ingest_validate_query(spark, tmp_path, capsys):
    out = str(tmp_path / "sink")
    assert main(["ingest", "--blocks", BLOCKS_PATH, "--out", out]) == 0
    got = capsys.readouterr().out
    assert "events:" in got and "transactions:" in got

    # the ingested events must match the golden row count exactly
    n_golden = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{expected_path('events')}')"
    ).fetchone()[0]
    n_sunk = spark.read.parquet(f"{out}/events").count()
    assert n_sunk == n_golden

    assert main(["validate", "--data", out]) == 0
    got = capsys.readouterr().out
    assert "invariants: PASS" in got

    assert main(["query", "pricing_summary"]) == 0
    assert "l_returnflag" in capsys.readouterr().out

    assert main(["query", "no_such_query"]) == 2


def test_cli_resume_skips_ingested_heights(spark, tmp_path, capsys):
    """Second ingest without --force resumes past the sink's max height —
    re-running the same stream appends nothing new (R3 semantics)."""
    out = str(tmp_path / "sink")
    assert main(["ingest", "--blocks", BLOCKS_PATH, "--out", out]) == 0
    n1 = spark.read.parquet(f"{out}/events").count()
    assert main(["ingest", "--blocks", BLOCKS_PATH, "--out", out]) == 0
    n2 = spark.read.parquet(f"{out}/events").count()
    assert n2 == n1
