"""Local replica of the driver's t2 correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, then compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their canonical string form) — mirroring the driver contract so a green
test here predicts a green CORRECTNESS_r{N}.json entry.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os

import duckdb


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # shortest round-trip rendering; integral floats normalized
        return repr(v)
    if isinstance(v, (dt.datetime,)):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    """Sort columns by name, render rows canonically, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols_sorted = [columns[i] for i in order]
    rendered = sorted("|".join(_canon_value(row[i]) for i in order) for row in rows)
    return cols_sorted, rendered


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    _, rendered = canonical_rows(columns, rows)
    h = hashlib.md5()
    for r in rendered:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(oracle_sql)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]

    result = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
    }
    result["hash_match"] = (
        result["rows_match"]
        and result["cols_match"]
        and value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows)
    )
    if not result["hash_match"] and result["cols_match"]:
        _, s_r = canonical_rows(s_cols, s_rows)
        _, d_r = canonical_rows(d_cols, d_rows)
        diffs = [(a, b) for a, b in zip(s_r, d_r) if a != b]
        result["first_diffs"] = diffs[:5]
        result["spark_only"] = [r for r in s_r if r not in set(d_r)][:3]
        result["duck_only"] = [r for r in d_r if r not in set(s_r)][:3]
    return result
