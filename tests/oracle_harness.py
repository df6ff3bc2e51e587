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


def _from_typed(v):
    """Canonicalize a cell the way the DRIVER's Arrow fetch renders it:
    Decimal → float.  DuckDB returns HUGEINT (e.g. a bare
    ``list_sum(BIGINT[])``) as Arrow decimal128(38,0), and the driver's
    rendering floats it — producing ``…000.0`` where Spark's int64 says
    ``…000``: rows match, schema matches, value hash doesn't.  Applied to
    BOTH sides (the driver floats Spark decimals identically — the
    decimal-outputting r25 query passes its gate), so decimal-vs-decimal
    still matches while int-vs-HUGEINT mismatches, exactly like the
    driver.  This is the divergence class that made the fetchall()-based
    harness green-light two red rounds (VERDICT r04 §What's wrong #3)."""
    import decimal

    if isinstance(v, (list, tuple)):
        return [_from_typed(x) for x in v]
    if isinstance(v, dict):
        return {k: _from_typed(x) for k, x in v.items()}
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def typed_oracle_rows(rel) -> tuple[list[str], list[tuple]]:
    """Fetch a DuckDB relation through Arrow — the driver-faithful typed
    path.  Unlike ``fetchall()`` (which launders HUGEINT back to exact
    Python ints), Arrow preserves the declared output types: HUGEINT
    arrives as decimal128(38,0) and then renders as a float via
    ``_from_typed``.  Unlike pandas' ``fetchdf()``, Arrow does NOT
    float-ify nullable int64 columns or turn DATEs into midnight
    Timestamps — both of which the driver demonstrably renders exactly
    (nullable-int and date-outputting queries pass their gates)."""
    tbl = rel.arrow()
    cols = list(tbl.column_names)
    rows = [
        tuple(_from_typed(rec[c]) for c in cols) for rec in tbl.to_pylist()
    ]
    return cols, rows


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(oracle_sql)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]
    # second fetch through pandas: the driver-faithful TYPED rendering
    t_cols, t_rows = typed_oracle_rows(con.sql(oracle_sql))

    result = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
    }
    result["hash_match_pyint"] = (
        result["rows_match"]
        and result["cols_match"]
        and value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows)
    )
    # typed comparison canonicalizes BOTH sides through _from_typed
    # (Decimal→float), mirroring the driver's rendering
    st_rows = [tuple(_from_typed(v) for v in row) for row in s_rows]
    result["hash_match_typed"] = (
        result["rows_match"]
        and result["cols_match"]
        and value_hash(s_cols, st_rows) == value_hash(t_cols, t_rows)
    )
    # green only if BOTH renderings agree with Spark: the Python-int path
    # is exact on values, the typed path is faithful to the driver's
    # pandas fetch (HUGEINT/DECIMAL/float-width artifacts included)
    result["hash_match"] = result["hash_match_pyint"] and result["hash_match_typed"]
    if not result["hash_match"] and result["cols_match"]:
        ref_rows = d_rows if not result["hash_match_pyint"] else t_rows
        _, s_r = canonical_rows(s_cols, s_rows)
        _, d_r = canonical_rows(d_cols, ref_rows)
        diffs = [(a, b) for a, b in zip(s_r, d_r) if a != b]
        result["first_diffs"] = diffs[:5]
        result["spark_only"] = [r for r in s_r if r not in set(d_r)][:3]
        result["duck_only"] = [r for r in d_r if r not in set(s_r)][:3]
    return result
