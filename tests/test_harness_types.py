"""The type-hardened harness must FAIL on representation drift that is
value-identical (round-5 verdict item 2): decimal-vs-double,
hugeint-vs-bigint (int-vs-float after the dataframe fetch), and must
keep PASSING the drift the driver provably tolerates (int width)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from harness import compare_query, duck_connection  # noqa: E402

SF = "/root/testdata/sf0.001"


def _cmp(spark, spark_sql: str, duck_sql: str):
    con = duck_connection(SF)
    return compare_query(spark, con, lambda s, _: s.sql(spark_sql),
                         duck_sql, SF)


def test_planted_decimal_vs_double_fails(spark):
    # Spark DECIMAL(27,6) 0.080000 vs DuckDB DOUBLE 0.08 — identical
    # values; exactly the text_chat_template round-5 driver red
    ok, detail = _cmp(
        spark,
        "SELECT CAST(80 AS BIGINT) / 1000.0 AS m",
        "SELECT CAST(80 AS BIGINT) / 1000.0 AS m",
    )
    assert not ok and "drift" in detail, detail


def test_planted_bigint_vs_hugeint_fails(spark):
    # DuckDB SUM(BIGINT) promotes to HUGEINT -> float64 in the
    # dataframe fetch; Spark emits BIGINT — the text_curate_pipeline
    # round-5 driver red
    ok, detail = _cmp(
        spark,
        "SELECT CAST(5 AS BIGINT) AS s",
        "SELECT SUM(x) AS s FROM (SELECT CAST(5 AS BIGINT) AS x)",
    )
    assert not ok and "drift" in detail, detail


def test_int_width_drift_still_passes(spark):
    # int32 vs int64 has been driver-green since round 1
    ok, detail = _cmp(
        spark,
        "SELECT CAST(7 AS INT) AS n",
        "SELECT CAST(7 AS BIGINT) AS n",
    )
    assert ok, detail


def test_double_vs_double_passes(spark):
    ok, detail = _cmp(
        spark,
        "SELECT CAST(CAST(80 AS BIGINT) AS DOUBLE) / 1000.0 AS m",
        "SELECT CAST(80 AS BIGINT) / 1000.0 AS m",
    )
    assert ok, detail


def test_nullable_int_widens_like_the_driver(spark):
    # NULL in an integer column widens both sides to float64 at the
    # driver (toPandas/fetchdf) — must compare equal, not NULL-vs-nan
    ok, detail = _cmp(
        spark,
        "SELECT * FROM VALUES (1, CAST(10 AS BIGINT)), (2, NULL) t(a, b)",
        "SELECT * FROM (VALUES (1, CAST(10 AS BIGINT)), (2, NULL)) t(a, b)",
    )
    assert ok, detail
