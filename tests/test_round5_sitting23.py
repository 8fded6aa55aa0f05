"""Sitting-23 operators: TPC-H Q2-shape min-cost supplier, Q9-shape
product profit, and Q16-shape supplier census — exact expected values
on tiny hand-checked inputs, independent of the DuckDB oracle sweep."""

import pyspark.sql.functions as F

from deepref_spark.operators.relational import (
    min_cost_supplier, product_profit, supplier_census)


def _region(spark):
    return spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], schema="r_regionkey long, r_name string")


def _nation(spark):
    return spark.createDataFrame(
        [(10, "FRANCE", 0), (11, "CHINA", 1)],
        schema="n_nationkey long, n_name string, n_regionkey long")


def _supplier(spark):
    return spark.createDataFrame(
        [(1, "S1", 10), (2, "S2", 10), (3, "S3", 11)],
        schema="s_suppkey long, s_name string, s_nationkey long")


# --- min_cost_supplier ---------------------------------------------------------

def test_min_cost_supplier_regional_global_min(spark):
    # p1 (size 10, in): s1's best unit = min(2000*100//200, 3000*100//200)
    # = 1000c; s2's = 1998*100//200 = 999c -> s2 wins. s3 is CHINA
    # (outside EUROPE) so its 100c line must NOT set the floor. p2
    # (size 30) is filtered out entirely.
    part = spark.createDataFrame(
        [(1, "BrandA", 10), (2, "BrandB", 30)],
        schema="p_partkey long, p_brand string, p_size long")
    li = spark.createDataFrame(
        [(1, 1, 20.00, 2.0), (1, 1, 30.00, 2.0), (1, 2, 19.98, 2.0),
         (1, 3, 1.00, 1.0), (2, 1, 1.00, 1.0)],
        schema=("l_partkey long, l_suppkey long, l_extendedprice double,"
                " l_quantity double"))
    rows = min_cost_supplier(part, _supplier(spark), li, _nation(spark),
                             _region(spark)).collect()
    assert [(r["p_partkey"], r["p_brand"], r["p_size"], r["s_suppkey"],
             r["s_name"], r["n_name"], r["min_cents"]) for r in rows] == [
        (1, "BrandA", 10, 2, "S2", "FRANCE", 999)]


def test_min_cost_supplier_ties_keep_all(spark):
    # both EUROPE suppliers hit unit 500c -> BOTH rows survive the
    # join-back (Q2 keeps every supplier achieving the min).
    part = spark.createDataFrame([(4, "BrandC", 1)],
                                 schema="p_partkey long, p_brand string, p_size long")
    li = spark.createDataFrame(
        [(4, 1, 10.00, 2.0), (4, 2, 5.00, 1.0)],
        schema=("l_partkey long, l_suppkey long, l_extendedprice double,"
                " l_quantity double"))
    rows = min_cost_supplier(part, _supplier(spark), li, _nation(spark),
                             _region(spark)).collect()
    assert sorted((r["s_suppkey"], r["min_cents"]) for r in rows) == [
        (1, 500), (2, 500)]


# --- product_profit ------------------------------------------------------------

def test_product_profit_grids_and_grouping(spark):
    # line 1 (FRANCE, 1996): rev = 3000 * (100-10) = 270000 e4; cost =
    # 1000c retail * 200 qty_e2 DIV 2 = 100000 -> profit 170000.
    # line 2 (CHINA, 1997): rev = 500*100 = 50000; cost = 1000*100/2 =
    # 50000 -> profit exactly 0. PROMO part line is excluded.
    part = spark.createDataFrame(
        [(1, "ECONOMY", 10.00), (2, "PROMO", 10.00)],
        schema="p_partkey long, p_type string, p_retailprice double")
    orders = spark.createDataFrame(
        [(100, "1996-03-01"), (200, "1997-05-01")],
        schema="o_orderkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = spark.createDataFrame(
        [(100, 1, 1, 2.0, 30.00, 0.10),
         (200, 1, 3, 1.0, 5.00, 0.00),
         (100, 2, 1, 9.0, 99.00, 0.00)],
        schema=("l_orderkey long, l_partkey long, l_suppkey long,"
                " l_quantity double, l_extendedprice double,"
                " l_discount double"))
    rows = {(r["n_name"], r["o_year"]): r["sum_profit_e4"]
            for r in product_profit(part, _supplier(spark), li, orders,
                                    _nation(spark)).collect()}
    assert rows == {("FRANCE", 1996): 170000, ("CHINA", 1997): 0}


# --- supplier_census -----------------------------------------------------------

def test_supplier_census_excludes_complainers_and_promo(spark):
    # s1: 2R/4 lines = 50% > 33 -> excluded; s2: 0R/3 -> kept; s3:
    # 0R/3 -> kept. PROMO part p3 drops out. (BrandA, 5) is shipped by
    # kept suppliers {s2 (p1, p2), s3 (p2)} -> distinct count 2.
    part = spark.createDataFrame(
        [(1, "BrandA", 5, "STANDARD"), (2, "BrandA", 5, "STANDARD"),
         (3, "BrandB", 7, "PROMO")],
        schema="p_partkey long, p_brand string, p_size long, p_type string")
    li = spark.createDataFrame(
        [(1, 1, "R"), (1, 1, "R"), (1, 1, "N"), (1, 1, "N"),
         (1, 2, "N"), (2, 2, "N"), (3, 2, "N"),
         (2, 3, "A"), (2, 3, "N"), (2, 3, "N")],
        schema="l_partkey long, l_suppkey long, l_returnflag string")
    rows = supplier_census(part, li).collect()
    assert [(r["p_brand"], r["p_size"], r["supplier_cnt"])
            for r in rows] == [("BrandA", 5, 2)]


def test_supplier_census_exact_third_is_excluded(spark):
    # boundary: 1R/3 lines -> 100 > 99 (strict) -> excluded, so the
    # census comes back empty even though the part qualifies.
    part = spark.createDataFrame(
        [(1, "BrandA", 5, "STANDARD")],
        schema="p_partkey long, p_brand string, p_size long, p_type string")
    li = spark.createDataFrame(
        [(1, 1, "R"), (1, 1, "N"), (1, 1, "N")],
        schema="l_partkey long, l_suppkey long, l_returnflag string")
    assert supplier_census(part, li).count() == 0
