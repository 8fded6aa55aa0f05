"""Sitting-22 operators: Pareto revenue concentration, TPC-H Q11-shape
important parts, and Q12-shape shipping-delay census — exact expected
values on tiny hand-checked inputs, independent of the DuckDB oracle
sweep."""

import pyspark.sql.functions as F

from deepref_spark.operators.events import pareto_share
from deepref_spark.operators.relational import important_parts, shipping_delay


# --- pareto_share ------------------------------------------------------------

def test_pareto_share_thresholds_and_decile(spark):
    # type "buy": u1 = 2.00 + 3.00 = 500c, u2 = 300c, u3 = 100c,
    # u4 = 100c -> tot 1000c, n = 4. Ranked u1(cum 500), u2(800),
    # u3(900), u4(1000). n50: 500*2 >= 1000 at rk1; n80: 800*5 >= 4000
    # at rk2. Decile: rk*10 <= 13 -> rk1 only -> 500c -> 500000 ppm.
    rows = [("buy", 1, 2.00), ("buy", 1, 3.00), ("buy", 2, 3.00),
            ("buy", 3, 1.00), ("buy", 4, 1.00)]
    df = spark.createDataFrame(
        rows, schema="event_type string, user_id long, value double")
    [r] = pareto_share(df).collect()
    assert (r["n_users"], r["total_cents"]) == (4, 1000)
    assert (r["n50_users"], r["n80_users"]) == (1, 2)
    assert r["top_decile_ppm"] == 500000


def test_pareto_share_ties_break_on_user_id(spark):
    # two users with equal cents: rank order is (cents DESC, user_id
    # ASC), so u10 is rk1 deterministically. n50 at rk1 (100*2 >= 200),
    # n80 at rk2 (200*5 >= 800); decile rk*10 <= 11 -> rk1 -> 500000 ppm.
    rows = [("tie", 10, 1.00), ("tie", 20, 1.00)]
    df = spark.createDataFrame(
        rows, schema="event_type string, user_id long, value double")
    [r] = pareto_share(df).collect()
    assert (r["n_users"], r["total_cents"]) == (2, 200)
    assert (r["n50_users"], r["n80_users"]) == (1, 2)
    assert r["top_decile_ppm"] == 500000


def test_pareto_share_single_whale(spark):
    # one user holds everything: every threshold lands at rk1 and the
    # top decile holds 100% of value.
    df = spark.createDataFrame(
        [("w", 7, 4.25)], schema="event_type string, user_id long, value double")
    [r] = pareto_share(df).collect()
    assert (r["n_users"], r["total_cents"]) == (1, 425)
    assert (r["n50_users"], r["n80_users"]) == (1, 1)
    assert r["top_decile_ppm"] == 1000000


# --- important_parts ---------------------------------------------------------

def _parts(spark):
    return spark.createDataFrame(
        [(1, "BrandA"), (2, "BrandB"), (3, "BrandC")],
        schema="p_partkey long, p_brand string")


def _lineitem_value(spark):
    # e4 grid: part1 = 1000c * (100-10) = 90000, part2 = 100c * 100 =
    # 10000, part3 = 50c * 100 = 5000 -> total 105000.
    return spark.createDataFrame(
        [(1, 10.00, 0.10), (2, 1.00, 0.00), (3, 0.50, 0.00)],
        schema="l_partkey long, l_extendedprice double, l_discount double")


def test_important_parts_threshold_filters(spark):
    # threshold 3000 bp = 30%: only part1 (85.7%) clears
    # value*10000 > total*3000 (9e8 > 3.15e8); part2 (9.5%) and
    # part3 (4.8%) do not. share_ppm = 90000 * 1e6 // 105000 = 857142.
    rows = important_parts(_parts(spark), _lineitem_value(spark),
                           threshold_bp=3000).collect()
    assert [(r["p_partkey"], r["p_brand"], r["value_e4"], r["share_ppm"])
            for r in rows] == [(1, "BrandA", 90000, 857142)]


def test_important_parts_all_pass_low_threshold(spark):
    # 15 bp default: every part clears (min share 4.76% >> 0.15%) and
    # the shares are exact integer-division ppm of the same total.
    rows = {r["p_partkey"]: r for r in important_parts(
        _parts(spark), _lineitem_value(spark)).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["share_ppm"] == 90000 * 1000000 // 105000
    assert rows[2]["share_ppm"] == 10000 * 1000000 // 105000
    assert rows[3]["share_ppm"] == 5000 * 1000000 // 105000


def test_important_parts_boundary_is_strict(spark):
    # equality does NOT pass: two equal parts at 50% each, threshold
    # 5000 bp -> value*10000 == total*5000 exactly -> empty result.
    part = spark.createDataFrame([(1, "A"), (2, "B")],
                                 schema="p_partkey long, p_brand string")
    li = spark.createDataFrame(
        [(1, 1.00, 0.00), (2, 1.00, 0.00)],
        schema="l_partkey long, l_extendedprice double, l_discount double")
    assert important_parts(part, li, threshold_bp=5000).count() == 0


# --- shipping_delay ----------------------------------------------------------

def test_shipping_delay_buckets_cap_and_clamp(spark):
    orders = spark.createDataFrame(
        [(1, "1-URGENT", "2024-01-01"), (2, "3-MEDIUM", "2024-01-01")],
        schema="o_orderkey long, o_orderpriority string, o_orderdate string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    li = spark.createDataFrame(
        [(1, "2024-01-05"),   # delay 4  -> bucket 0, urgent
         (1, "2024-02-15"),   # delay 45 -> bucket 1, urgent
         (2, "2024-01-01"),   # delay 0  -> bucket 0, other
         (2, "2024-05-01"),   # delay 121 -> 121//30 = 4 -> capped 3
         (2, "2023-12-25")],  # delay -7 -> clamped 0 -> bucket 0
        schema="l_orderkey long, l_shipdate string",
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    out = {r["delay_bucket"]: r for r in shipping_delay(orders, li).collect()}
    assert set(out) == {0, 1, 3}
    assert (out[0]["n_lines"], out[0]["n_urgent"], out[0]["n_other"],
            out[0]["urgent_ppm"]) == (3, 1, 2, 333333)
    assert (out[1]["n_lines"], out[1]["n_urgent"], out[1]["urgent_ppm"]) == (1, 1, 1000000)
    assert (out[3]["n_lines"], out[3]["n_urgent"], out[3]["n_other"],
            out[3]["urgent_ppm"]) == (1, 0, 1, 0)


def test_shipping_delay_custom_bucket_days(spark):
    # 7-day buckets: delays 6 / 7 / 22 -> buckets 0 / 1 / 3 (22//7 = 3,
    # exactly at the cap); '2-HIGH' counts as urgent.
    orders = spark.createDataFrame(
        [(1, "2-HIGH", "2024-01-01")],
        schema="o_orderkey long, o_orderpriority string, o_orderdate string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    li = spark.createDataFrame(
        [(1, "2024-01-07"), (1, "2024-01-08"), (1, "2024-01-23")],
        schema="l_orderkey long, l_shipdate string",
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    out = {r["delay_bucket"]: r for r in
           shipping_delay(orders, li, bucket_days=7).collect()}
    assert set(out) == {0, 1, 3}
    for b in (0, 1, 3):
        assert (out[b]["n_lines"], out[b]["n_urgent"],
                out[b]["urgent_ppm"]) == (1, 1, 1000000)
