"""Output-dtype audit: for every oracle-backed registry query, compare
the DuckDB result's logical column types against the Spark plan's
output schema and flag any pair that a dataframe-typed comparison
(duckdb fetchdf/arrow vs Spark toPandas/toArrow) would see as
different dtypes. Usage: python scripts/dtype_audit.py [sf_dir]."""
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from deepref_spark.schemas import TESTDATA_TABLES  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

con = duckdb.connect()
for t in TESTDATA_TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
    )

from deepref_spark.session import get_spark  # noqa: E402
import deepref_spark.queries as Q  # noqa: E402

spark = get_spark("dtype_audit")
spark.sparkContext.setLogLevel("ERROR")


def duck_class(t: str) -> str:
    t = str(t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "UTINYINT", "USMALLINT"):
        return "int32" if t == "INTEGER" else f"small:{t}"
    if t == "BIGINT":
        return "int64"
    if t == "HUGEINT":
        return "HUGEINT"          # fetchdf float64 / arrow decimal128
    if t == "DOUBLE":
        return "float64"
    if t in ("FLOAT", "REAL"):
        return "float32"
    if t.startswith("DECIMAL"):
        return t                   # fetchdf float64 / arrow decimal128
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    return t


def spark_class(dt) -> str:
    s = dt.simpleString()
    return {"bigint": "int64", "int": "int32", "smallint": "small:SMALLINT",
            "double": "float64", "float": "float32", "string": "str",
            "boolean": "bool"}.get(s, s.upper())


names = [n for n in Q.REGISTRY if Q.REGISTRY[n]["oracle"] is not None]
n_mismatch = 0
for name in names:
    try:
        oracle = Q.oracle_sql_for(name)
        rel = con.sql(oracle)
        dcols = dict(zip([c.lower() for c in rel.columns],
                         [duck_class(t) for t in rel.types]))
        sdf = Q.REGISTRY[name]["spark"](spark, sf_dir)
        scols = {f.name.lower(): spark_class(f.dataType)
                 for f in sdf.schema.fields}
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__} {e}")
        n_mismatch += 1
        continue
    if set(dcols) != set(scols):
        print(f"{name}: COLUMNS differ {sorted(dcols)} vs {sorted(scols)}")
        n_mismatch += 1
        continue
    diffs = {c: (dcols[c], scols[c]) for c in dcols if dcols[c] != scols[c]}
    if diffs:
        n_mismatch += 1
        print(f"{name}: {diffs}")

print(f"\n{n_mismatch} queries with dtype drift of {len(names)} audited")
spark.stop()
