"""Round-7+ schema-evolution reader: three write generations of the
same logical table — a renamed column, a widened type, and an added
column — must read back as ONE uniform frame with row-level values
intact and filter pushdown still reaching every generation's scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_near_indexer_spark.tables import read_evolved


def _write_generations(spark, root: str) -> list[str]:
    # v1: amount is INT, the free-text column is 'note'
    v1 = spark.createDataFrame(
        [(1, 10, "alpha"), (2, 20, "beta")],
        "id long, amount int, note string",
    )
    # v2: 'note' renamed to 'comment'
    v2 = spark.createDataFrame(
        [(3, 30, "gamma")],
        "id long, amount int, comment string",
    )
    # v3: amount widened to BIGINT, new 'region' column added
    v3 = spark.createDataFrame(
        [(4, 40_000_000_000, "delta", "EU")],
        "id long, amount long, comment string, region string",
    )
    paths = [f"{root}/v{i}" for i in (1, 2, 3)]
    for df, p in zip((v1, v2, v3), paths):
        df.write.parquet(p)
    return paths


def test_read_evolved_unifies_generations(spark, tmp_path):
    paths = _write_generations(spark, str(tmp_path))
    df = read_evolved(
        spark,
        paths,
        renames={"note": "comment"},
        casts={"amount": "bigint"},
    )
    assert set(df.columns) == {"id", "amount", "comment", "region"}
    assert dict(df.dtypes)["amount"] == "bigint"
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 4
    # renamed column recovered for every generation
    assert [rows[i]["comment"] for i in (1, 2, 3, 4)] == [
        "alpha", "beta", "gamma", "delta",
    ]
    # widened type holds the post-widening value exactly
    assert rows[4]["amount"] == 40_000_000_000
    # added column is NULL for elder generations, real for new ones
    assert rows[1]["region"] is None and rows[4]["region"] == "EU"


def test_read_evolved_pushdown_survives_merge(spark, tmp_path):
    """Filters on a stable column must still reach the parquet scan
    (PushedFilters) despite mergeSchema + rename/cast rewriting."""
    paths = _write_generations(spark, str(tmp_path))
    df = read_evolved(
        spark, paths, renames={"note": "comment"}, casts={"amount": "bigint"}
    ).where(F.col("id") == 3)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,3)]" in plan
    assert [r["comment"] for r in df.collect()] == ["gamma"]


def test_read_evolved_rename_only_generation_sets(spark, tmp_path):
    """A lake where NO generation carries the new name yet: plain
    rename, no coalesce column dance."""
    p = str(tmp_path / "only_old")
    spark.createDataFrame([(1, "x")], "id long, note string").write.parquet(p)
    df = read_evolved(spark, [p], renames={"note": "comment"})
    assert df.columns == ["id", "comment"]
    assert df.collect()[0]["comment"] == "x"
