"""Local mirror of the driver's correctness gate: run each Spark query
next to its DuckDB oracle on the same parquet and compare row multisets
(columns sorted by name).

Driver-faithful typing (round 6): the driver fetches both result sets
as DATAFRAMES, so DuckDB HUGEINT/DECIMAL (and any nullable integer)
arrive as float64 and Spark DecimalType arrives as Decimal objects —
meaning an int-vs-float or decimal-vs-double drift that str()-based
comparison of fetchall() values would hide FAILS at the driver even
when every value is numerically identical (round-5 verdict:
text_chat_template / text_curate_pipeline were exactly this). This
harness therefore (a) fetches the oracle via fetchdf() so types widen
the same way they do at the driver, (b) derives each Spark column's
driver-visible class from its schema (with the same NULL->float64
widening toPandas applies), and (c) FAILS on type-class drift
(int vs float vs Decimal vs bool vs str) before comparing values.
Integer WIDTH (int32 vs int64) is deliberately not compared — the
driver has hash-matched int-width drift green since round 1
(kg_mentions, kg_get_entities, ...)."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from deepref_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


_INT_SPARK = {"tinyint", "smallint", "int", "bigint"}


def _spark_classes(sdf_schema, cols, rows):
    """Driver-visible class per Spark column: ints widen to float when
    the column holds a NULL (toPandas semantics)."""
    classes = {}
    for i, f in enumerate(sdf_schema.fields):
        s = f.dataType.simpleString()
        c = cols[i]
        if s in _INT_SPARK:
            cls = "int"
            for r in rows:
                if r[i] is None:
                    cls = "float"
                    break
        elif s in ("double", "float"):
            cls = "float"
        elif s.startswith("decimal"):
            cls = "decimal"
        elif s == "boolean":
            cls = "bool"
        elif s == "string":
            cls = "str"
        elif s.startswith("timestamp"):
            cls = "timestamp"
        elif s == "date":
            cls = "date"
        else:
            cls = "other"
        classes[c] = cls
    return classes


def _duck_classes(pdf, cols):
    """Driver-visible class per DuckDB column from fetchdf dtypes."""
    import numpy as np
    import pandas as pd

    classes = {}
    for c_orig, dt in zip(pdf.columns, pdf.dtypes):
        c = c_orig.lower()
        if pd.api.types.is_bool_dtype(dt):
            classes[c] = "bool"
        elif pd.api.types.is_integer_dtype(dt):
            classes[c] = "int"
        elif pd.api.types.is_float_dtype(dt):
            classes[c] = "float"
        elif pd.api.types.is_datetime64_any_dtype(dt):
            classes[c] = "timestamp"
        else:
            cls = "other"
            for v in pdf[c_orig]:
                if v is None or (isinstance(v, float) and np.isnan(v)):
                    continue
                if isinstance(v, str):
                    cls = "str"
                elif isinstance(v, Decimal):
                    cls = "decimal"
                elif isinstance(v, datetime.datetime):
                    cls = "timestamp"
                elif isinstance(v, datetime.date):
                    cls = "date"
                elif isinstance(v, bool):
                    cls = "bool"
                break
            classes[c] = cls
    return classes


def _norm_value(v, cls):
    """Canonical cell string under the column's driver-visible class."""
    try:
        import numpy as np

        if isinstance(v, np.generic):
            v = v.item()
    except ImportError:
        pass
    if cls == "float":
        # toPandas/fetchdf both render NULL as NaN in float columns
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "nan"
        return f"{float(v):.6f}"
    if v is None:
        return "NULL"
    if cls == "bool":
        return str(bool(v)).lower()
    if cls in ("timestamp", "date") and isinstance(v, datetime.date):
        # canonical: date part alone when there is no time of day, so
        # DATE and midnight TIMESTAMP compare equal (see drift note)
        if (isinstance(v, datetime.datetime)
                and (v.hour or v.minute or v.second or v.microsecond)):
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        return f"{v.year:04d}-{v.month:02d}-{v.day:02d}"
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return str(v)


def _norm_rows(cols, rows, classes):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [
        tuple(_norm_value(r[i], classes[cols[i]]) for i in order)
        for r in rows
    ]
    out.sort()
    return out


def compare_query(spark, con, spark_fn, oracle: str, sf_dir: str):
    """Returns (ok, detail)."""
    sdf = spark_fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.sql(oracle)
    # fetchdf (not fetchall): the driver's dataframe fetch widens
    # HUGEINT/DECIMAL/nullable-int to float64 — fetchall would hand
    # back Python ints and mask exactly the drift the driver fails on
    d_pdf = res.fetchdf()
    d_cols = [c.lower() for c in d_pdf.columns]
    d_rows = [tuple(rec) for rec in d_pdf.itertuples(index=False, name=None)]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}"

    s_classes = _spark_classes(sdf.schema, s_cols, s_rows)
    d_classes = _duck_classes(d_pdf, d_cols)
    # date-vs-timestamp is NOT flagged: pandas has no date dtype, so a
    # DuckDB DATE arrives as datetime64 while Spark DateType collects
    # as datetime.date — no driver-checked query has ever emitted a
    # temporal column (round-6 audit), so there is no evidence the
    # driver distinguishes them; values compare on the date part below.
    _compat = {frozenset(("date", "timestamp"))}
    drift = {
        c: (s_classes[c], d_classes[c])
        for c in s_classes
        if "other" not in (s_classes[c], d_classes[c])
        and s_classes[c] != d_classes[c]
        and frozenset((s_classes[c], d_classes[c])) not in _compat
    }
    if drift:
        return False, f"dtype class drift (spark, duck): {drift}"

    s_norm = _norm_rows(s_cols, s_rows, s_classes)
    d_norm = _norm_rows(d_cols, d_rows, d_classes)
    if s_norm != d_norm:
        diff = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
        return False, f"values differ; first diffs: {diff}"
    return True, f"{len(s_rows)} rows"
