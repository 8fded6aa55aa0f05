"""Unit tests for the ninth-sitting relational star-join lane — exact
expected values on tiny hand-checked inputs, independent of the DuckDB
oracles: Q1 pricing grids, Q4 semi-join, Q13 outer-join distribution,
Q14 promo share, Q17 join-back threshold, partitioned top-N, RFM
threshold bucketing, and the MERGE classification."""

from datetime import datetime

from deepref_spark.operators.relational import (
    customer_order_distribution,
    late_ship_priority,
    merge_upsert_plan,
    pricing_summary,
    promo_revenue_share,
    rfm_segments,
    small_qty_revenue_by_brand,
    top_orders_per_customer,
    top_unshipped_orders,
)

_LI_SCHEMA = ("l_orderkey long, l_partkey long, l_suppkey long, "
              "l_quantity double, l_extendedprice double, "
              "l_discount double, l_tax double, l_returnflag string, "
              "l_linestatus string, l_shipdate timestamp")
_ORD_SCHEMA = ("o_orderkey long, o_custkey long, o_orderstatus string, "
               "o_totalprice double, o_orderdate timestamp, "
               "o_orderpriority string")


def _li(spark, rows):
    return spark.createDataFrame(rows, schema=_LI_SCHEMA)


def _orders(spark, rows):
    return spark.createDataFrame(rows, schema=_ORD_SCHEMA)


def test_pricing_summary_exact_grids(spark):
    # group (A, F): qc 200+300, bc 1000+2000, de4 1000*95 + 2000*90,
    # ce6 95000*108 + 180000*100; the 2001 row is past the cutoff
    li = _li(spark, [
        (1, 1, 1, 2.0, 10.00, 0.05, 0.08, "A", "F",
         datetime(1999, 1, 1)),
        (1, 2, 1, 3.0, 20.00, 0.10, 0.00, "A", "F",
         datetime(1999, 6, 1)),
        (2, 3, 1, 1.0, 5.00, 0.00, 0.02, "N", "O",
         datetime(2001, 1, 1)),
    ])
    rows = {(r["l_returnflag"], r["l_linestatus"]): r
            for r in pricing_summary(li).collect()}
    assert set(rows) == {("A", "F")}
    r = rows[("A", "F")]
    assert r["sum_qty_cents"] == 500
    assert r["sum_base_cents"] == 3000
    assert r["sum_disc_e4"] == 95000 + 180000
    assert r["sum_charge_e6"] == 95000 * 108 + 180000 * 100
    assert r["avg_qty_cents"] == 250
    assert r["avg_price_cents"] == 1500
    assert r["avg_disc_bp"] == (5 + 10) * 100 // 2  # 750
    assert r["n_rows"] == 2


def test_late_ship_priority_semi_join(spark):
    # order 1 (in quarter): one line +31d (match) and one +5d; order 2
    # (in quarter): only +10d -> no match; order 3: outside the quarter
    orders = _orders(spark, [
        (1, 1, "O", 100.0, datetime(1997, 7, 10), "1-URGENT"),
        (2, 1, "O", 100.0, datetime(1997, 8, 1), "5-LOW"),
        (3, 1, "O", 100.0, datetime(1997, 1, 1), "1-URGENT"),
    ])
    li = _li(spark, [
        (1, 1, 1, 1.0, 1.0, 0.0, 0.0, "A", "F", datetime(1997, 8, 10)),
        (1, 2, 1, 1.0, 1.0, 0.0, 0.0, "A", "F", datetime(1997, 7, 15)),
        (2, 3, 1, 1.0, 1.0, 0.0, 0.0, "A", "F", datetime(1997, 8, 11)),
        (3, 4, 1, 1.0, 1.0, 0.0, 0.0, "A", "F", datetime(1997, 6, 1)),
    ])
    rows = {r["o_orderpriority"]: r["n_orders"]
            for r in late_ship_priority(orders, li).collect()}
    assert rows == {"1-URGENT": 1}


def test_customer_order_distribution_keeps_zero(spark):
    cust = spark.createDataFrame(
        [(1, "a", 0, 0.0, "BUILDING"), (2, "b", 0, 0.0, "BUILDING"),
         (3, "c", 0, 0.0, "BUILDING")],
        schema=("c_custkey long, c_name string, c_nationkey int, "
                "c_acctbal double, c_mktsegment string"))
    orders = _orders(spark, [
        (1, 1, "O", 1.0, datetime(1998, 1, 1), "1-URGENT"),
        (2, 1, "O", 1.0, datetime(1998, 1, 2), "4-NOT SPECIFIED"),
        (3, 3, "O", 1.0, datetime(1998, 1, 3), "5-LOW"),
    ])
    rows = {r["c_count"]: r["custdist"]
            for r in customer_order_distribution(cust, orders).collect()}
    # c1 keeps 1 order (the excluded priority drops), c2 has none, c3 one
    assert rows == {1: 2, 0: 1}


def test_promo_share_ppm(spark):
    part = spark.createDataFrame(
        [(1, "p1", "Brand#1", "PROMO", 1, 1.0),
         (2, "p2", "Brand#2", "STANDARD", 1, 1.0)],
        schema=("p_partkey long, p_name string, p_brand string, "
                "p_type string, p_size int, p_retailprice double"))
    li = _li(spark, [
        # promo: 10.00 at 10% disc -> rev_e4 = 1000 * 90 = 90000
        (1, 1, 1, 1.0, 10.00, 0.10, 0.0, "A", "F", datetime(1997, 3, 2)),
        # standard: 20.00 at 0% -> rev_e4 = 200000
        (2, 2, 1, 1.0, 20.00, 0.00, 0.0, "A", "F", datetime(1997, 3, 9)),
    ])
    rows = promo_revenue_share(part, li).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["month"], r["promo_e4"], r["total_e4"]) == \
        ("1997-03", 90000, 290000)
    assert r["promo_share_ppm"] == 90000 * 1000000 // 290000


def test_small_qty_threshold_is_exact_integer(spark):
    part = spark.createDataFrame(
        [(1, "p1", "Brand#1", "PROMO", 1, 1.0)],
        schema=("p_partkey long, p_name string, p_brand string, "
                "p_type string, p_size int, p_retailprice double"))
    # qty cents [100, 1000, 1000, 1000]: sum_q=3100, cnt=4;
    # 100*5*4=2000 < 3100 (small), 1000*5*4=20000 >= 3100 (not)
    li = _li(spark, [
        (1, 1, 1, 1.0, 7.00, 0.0, 0.0, "A", "F", datetime(1997, 1, 1)),
        (2, 1, 1, 10.0, 9.00, 0.0, 0.0, "A", "F", datetime(1997, 1, 2)),
        (3, 1, 1, 10.0, 9.00, 0.0, 0.0, "A", "F", datetime(1997, 1, 3)),
        (4, 1, 1, 10.0, 9.00, 0.0, 0.0, "A", "F", datetime(1997, 1, 4)),
    ])
    rows = small_qty_revenue_by_brand(part, li).collect()
    assert [(r["p_brand"], r["small_rev_cents"], r["n_small_lines"])
            for r in rows] == [("Brand#1", 700, 1)]


def test_top_orders_per_customer_tie_break(spark):
    orders = _orders(spark, [
        (10, 1, "O", 30.0, datetime(1998, 1, 1), "1-URGENT"),
        (11, 1, "O", 20.0, datetime(1998, 1, 2), "1-URGENT"),
        (12, 1, "O", 10.0, datetime(1998, 1, 3), "1-URGENT"),
        # customer 2: equal prices -> lower orderkey ranks first
        (21, 2, "O", 5.0, datetime(1998, 1, 4), "1-URGENT"),
        (20, 2, "O", 5.0, datetime(1998, 1, 5), "1-URGENT"),
    ])
    rows = sorted(
        [(r["o_custkey"], r["rank"], r["o_orderkey"], r["price_cents"])
         for r in top_orders_per_customer(orders).collect()])
    assert rows == [(1, 1, 10, 3000), (1, 2, 11, 2000),
                    (2, 1, 20, 500), (2, 2, 21, 500)]


def test_top_unshipped_orders_revenue_and_cutoffs(spark):
    cust = spark.createDataFrame(
        [(1, "a", 0, 0.0, "BUILDING"), (2, "b", 0, 0.0, "MACHINERY")],
        schema=("c_custkey long, c_name string, c_nationkey int, "
                "c_acctbal double, c_mktsegment string"))
    orders = _orders(spark, [
        (1, 1, "O", 1.0, datetime(1997, 12, 1), "1-URGENT"),
        (2, 2, "O", 1.0, datetime(1997, 12, 2), "1-URGENT"),  # wrong seg
        (3, 1, "O", 1.0, datetime(1998, 2, 1), "1-URGENT"),   # too late
    ])
    li = _li(spark, [
        (1, 1, 1, 1.0, 10.00, 0.10, 0.0, "A", "F", datetime(1998, 2, 1)),
        (1, 2, 1, 1.0, 5.00, 0.00, 0.0, "A", "F", datetime(1998, 3, 1)),
        (1, 3, 1, 1.0, 9.00, 0.00, 0.0, "A", "F",
         datetime(1997, 12, 20)),  # shipped before the as-of date
        (2, 4, 1, 1.0, 9.00, 0.00, 0.0, "A", "F", datetime(1998, 2, 2)),
        (3, 5, 1, 1.0, 9.00, 0.00, 0.0, "A", "F", datetime(1998, 3, 2)),
    ])
    rows = top_unshipped_orders(cust, orders, li).collect()
    assert [(r["l_orderkey"], r["o_orderdate"], r["revenue_e4"])
            for r in rows] == [(1, "1997-12-01", 1000 * 90 + 500 * 100)]


def test_rfm_buckets_and_code(spark):
    # four customers with strictly increasing recency/frequency/monetary
    # -> with n=4 the quartile edges are the first three sorted values
    rows = []
    key = 100
    # c4: 4 orders on the max date (recency 0), 400.00 each
    for _ in range(4):
        rows.append((key, 4, "O", 400.0, datetime(1998, 1, 10), "1-URGENT"))
        key += 1
    rows.append((key, 1, "O", 100.0, datetime(1998, 1, 9), "1-URGENT"))
    key += 1
    for _ in range(2):
        rows.append((key, 2, "O", 200.0, datetime(1998, 1, 8), "1-URGENT"))
        key += 1
    for _ in range(3):
        rows.append((key, 3, "O", 300.0, datetime(1998, 1, 7), "1-URGENT"))
        key += 1
    out = {r["o_custkey"]: r for r in rfm_segments(
        _orders(spark, rows)).collect()}
    assert out[4]["recency_days"] == 0 and out[3]["recency_days"] == 3
    assert out[2]["frequency"] == 2
    assert out[3]["monetary_cents"] == 3 * 30000
    # recency sorted [0,1,2,3] -> edges (0,1,2): c4->1, c1->2, c2->3, c3->4
    assert (out[4]["r_bucket"], out[1]["r_bucket"],
            out[2]["r_bucket"], out[3]["r_bucket"]) == (1, 2, 3, 4)
    assert (out[1]["f_bucket"], out[2]["f_bucket"],
            out[3]["f_bucket"], out[4]["f_bucket"]) == (1, 2, 3, 4)
    assert (out[1]["m_bucket"], out[2]["m_bucket"],
            out[3]["m_bucket"], out[4]["m_bucket"]) == (1, 2, 3, 4)
    assert out[1]["rfm_code"] == 211
    assert out[4]["rfm_code"] == 144


def test_rfm_ties_share_a_bucket(spark):
    # all four customers identical -> every metric has one distinct
    # value, all edges equal it, nothing exceeds them -> all buckets 1
    rows = [(k, k, "O", 100.0, datetime(1998, 1, 1), "1-URGENT")
            for k in range(1, 5)]
    out = rfm_segments(_orders(spark, rows)).collect()
    assert {(r["r_bucket"], r["f_bucket"], r["m_bucket"])
            for r in out} == {(1, 1, 1)}


def test_merge_upsert_classification(spark):
    orders = _orders(spark, [
        # A: before t1 only -> keep
        (1, 1, "O", 100.0, datetime(1998, 5, 1), "1-URGENT"),
        # B: both sides -> update, total = 20000 + 5000
        (2, 2, "O", 200.0, datetime(1998, 6, 1), "1-URGENT"),
        (3, 2, "O", 50.0, datetime(1999, 3, 1), "1-URGENT"),
        # C: window only -> insert
        (4, 3, "O", 70.0, datetime(1999, 7, 1), "1-URGENT"),
        # D: past t2 -> absent from the plan
        (5, 4, "O", 90.0, datetime(2000, 7, 1), "1-URGENT"),
    ])
    rows = {r["o_custkey"]: r for r in merge_upsert_plan(orders).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["action"] == "keep"
    assert (rows[1]["n_before"], rows[1]["n_new"],
            rows[1]["total_cents_after"]) == (1, 0, 10000)
    assert rows[2]["action"] == "update"
    assert rows[2]["total_cents_after"] == 20000 + 5000
    assert rows[3]["action"] == "insert"
    assert (rows[3]["n_before"], rows[3]["n_new"],
            rows[3]["total_cents_after"]) == (0, 1, 7000)


def test_taxonomy_lca_hand_tree(spark):
    from deepref_spark.operators.graph import taxonomy_lca

    tax = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("d", "b"), ("e", "b")],
        schema="child string, parent string")
    pairs = spark.createDataFrame(
        [("d", "e"), ("c", "d"), ("a", "b")], schema="a string, b string")
    out = {(r["a"], r["b"]): r for r in taxonomy_lca(tax, pairs).collect()}
    # siblings d,e: LCA b at depth 1, dist 2, wup = 4e6 // 6
    r = out[("d", "e")]
    assert (r["lca"], r["dist"], r["lca_depth"], r["wup_ppm"]) == \
        ("b", 2, 1, 666666)
    # c (depth 1) vs d (depth 2): LCA root a, dist 3, wup = 2e6 // 5
    r = out[("c", "d")]
    assert (r["lca"], r["dist"], r["lca_depth"], r["wup_ppm"]) == \
        ("a", 3, 0, 400000)
    # root against its child: LCA is the root itself (self rows)
    r = out[("a", "b")]
    assert (r["lca"], r["dist"], r["lca_depth"], r["wup_ppm"]) == \
        ("a", 1, 0, 666666)


def test_containment_directed_asymmetry(spark):
    from deepref_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "one two three four five six")],
        schema="doc_id long, text string")
    rows = {(r["src"], r["dst"]): r
            for r in containment_pairs(docs, k=3).collect()}
    # doc1 (2 shingles) fully inside doc2 (4 shingles): 1 -> 2 at 1e6,
    # 2 -> 1 at exactly 500000 (the inclusive threshold); doc3 disjoint
    assert set(rows) == {(1, 2), (2, 1)}
    r12 = rows[(1, 2)]
    assert (r12["n_src"], r12["n_dst"], r12["common"],
            r12["containment_ppm"]) == (2, 4, 2, 1000000)
    r21 = rows[(2, 1)]
    assert (r21["n_src"], r21["common"], r21["containment_ppm"]) == \
        (4, 2, 500000)
    # below-threshold direction is dropped: shrink threshold to confirm
    # the pair set is symmetric in candidates, not in survivors
    all_rows = containment_pairs(docs, k=3, threshold_ppm=1).collect()
    assert len(all_rows) == 2  # still only the overlapping pair x2
