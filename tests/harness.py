"""Local mirror of the driver's correctness gate: run each Spark query
next to its DuckDB oracle on the same parquet and compare row multisets
(columns sorted by name, floats rounded)."""

from __future__ import annotations

import math

import duckdb

from deepref_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip([cols[i] for i in order], [cols[i] for i in order]))], out


def compare_query(spark, con, spark_fn, oracle: str, sf_dir: str):
    """Returns (ok, detail)."""
    sdf = spark_fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.sql(oracle)
    d_cols = [c.lower() for c in res.columns]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    _, s_norm = _norm_rows(s_cols, s_rows)
    _, d_norm = _norm_rows(d_cols, d_rows)
    if s_norm != d_norm:
        diff = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
        return False, f"values differ; first diffs: {diff}"
    return True, f"{len(s_rows)} rows"
