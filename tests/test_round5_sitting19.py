"""Nineteenth-sitting operators: TPC-H Q7 bilateral volume shipping,
Q8 market share, Q19 disjunctive revenue."""
import datetime


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_volume_shipping_directions_and_year_split(spark):
    """Two nations trade both ways across a year boundary; same-nation
    flows and out-of-window ships are excluded."""
    from deepref_spark.operators.relational import volume_shipping

    nation = spark.createDataFrame(
        [(1, "A", 0), (2, "B", 0), (3, "C", 0)],
        "n_nationkey long, n_name string, n_regionkey long")
    supplier = spark.createDataFrame(
        [(10, "s10", 1, 0.0), (20, "s20", 2, 0.0), (30, "s30", 3, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double")
    customer = spark.createDataFrame(
        [(100, "c", 1, 0.0, "X"), (200, "c", 2, 0.0, "X"),
         (300, "c", 3, 0.0, "X")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    orders = spark.createDataFrame(
        [(1000, 200, "O", 1.0, _ts("1996-02-01"), "p"),   # cust B
         (2000, 100, "O", 1.0, _ts("1996-02-01"), "p"),   # cust A
         (3000, 300, "O", 1.0, _ts("1996-02-01"), "p")],  # cust C
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    li_schema = ("l_orderkey long, l_partkey long, l_suppkey long, "
                 "l_linenumber long, l_quantity double, "
                 "l_extendedprice double, l_discount double, l_tax double, "
                 "l_returnflag string, l_linestatus string, "
                 "l_shipdate timestamp")
    lineitem = spark.createDataFrame(
        [
            # supp A (10) -> cust B: 100.00 @ 10% in 1996, 200.00 @ 0% in 1997
            (1000, 1, 10, 1, 1.0, 100.0, 0.10, 0.0, "N", "O", _ts("1996-03-01")),
            (1000, 1, 10, 2, 1.0, 200.0, 0.00, 0.0, "N", "O", _ts("1997-03-01")),
            # supp B (20) -> cust A: 50.00 @ 0% in 1996
            (2000, 1, 20, 1, 1.0, 50.0, 0.00, 0.0, "N", "O", _ts("1996-06-01")),
            # supp A -> cust A (same nation): excluded
            (2000, 1, 10, 2, 1.0, 999.0, 0.00, 0.0, "N", "O", _ts("1996-06-01")),
            # supp A -> cust C (nation C not in pair): excluded
            (3000, 1, 10, 1, 1.0, 999.0, 0.00, 0.0, "N", "O", _ts("1996-06-01")),
            # supp A -> cust B but shipped outside window: excluded
            (1000, 1, 10, 3, 1.0, 999.0, 0.00, 0.0, "N", "O", _ts("1995-06-01")),
        ], li_schema)
    got = {(r["supp_nation"], r["cust_nation"], r["l_year"]): r
           for r in volume_shipping(nation, customer, supplier, orders,
                                    lineitem, nation_a="A", nation_b="B",
                                    y0="1996-01-01", y1="1998-01-01").collect()}
    assert set(got) == {("A", "B", 1996), ("A", "B", 1997), ("B", "A", 1996)}
    # e4 grid: cents * (100 - pct)
    assert got[("A", "B", 1996)]["revenue_e4"] == 10000 * 90
    assert got[("A", "B", 1997)]["revenue_e4"] == 20000 * 100
    assert got[("B", "A", 1996)]["revenue_e4"] == 5000 * 100
    assert got[("A", "B", 1996)]["n_lines"] == 1


def test_market_share_ppm_one_aggregate(spark):
    """Target nation supplies 25.00 of 100.00 regional ECONOMY revenue
    in 1996 -> 250000 ppm; the other year has zero target share."""
    from deepref_spark.operators.relational import market_share

    region = spark.createDataFrame([(0, "R"), (1, "OTHER")],
                                   "r_regionkey long, r_name string")
    nation = spark.createDataFrame(
        [(1, "T", 0), (2, "U", 0), (3, "V", 1)],
        "n_nationkey long, n_name string, n_regionkey long")
    customer = spark.createDataFrame(
        [(100, "c", 1, 0.0, "X"),     # in region R
         (300, "c", 3, 0.0, "X")],    # in region OTHER -> excluded
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    supplier = spark.createDataFrame(
        [(10, "s", 1, 0.0), (20, "s", 2, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double")
    part = spark.createDataFrame(
        [(1, "p1", "B", "ECONOMY", 1, 1.0), (2, "p2", "B", "LARGE", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size long, p_retailprice double")
    orders = spark.createDataFrame(
        [(1000, 100, "O", 1.0, _ts("1996-02-01"), "p"),
         (2000, 100, "O", 1.0, _ts("1997-02-01"), "p"),
         (3000, 300, "O", 1.0, _ts("1996-02-01"), "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    li_schema = ("l_orderkey long, l_partkey long, l_suppkey long, "
                 "l_linenumber long, l_quantity double, "
                 "l_extendedprice double, l_discount double, l_tax double, "
                 "l_returnflag string, l_linestatus string, "
                 "l_shipdate timestamp")
    lineitem = spark.createDataFrame(
        [
            # 1996: target T supplies 25.00, U supplies 75.00
            (1000, 1, 10, 1, 1.0, 25.0, 0.0, 0.0, "N", "O", _ts("1996-03-01")),
            (1000, 1, 20, 2, 1.0, 75.0, 0.0, 0.0, "N", "O", _ts("1996-03-01")),
            # wrong p_type: excluded
            (1000, 2, 10, 3, 1.0, 999.0, 0.0, 0.0, "N", "O", _ts("1996-03-01")),
            # 1997: only U supplies
            (2000, 1, 20, 1, 1.0, 40.0, 0.0, 0.0, "N", "O", _ts("1997-03-01")),
            # customer outside region: excluded
            (3000, 1, 10, 1, 1.0, 999.0, 0.0, 0.0, "N", "O", _ts("1996-03-01")),
        ], li_schema)
    got = {r["o_year"]: r for r in market_share(
        region, nation, customer, supplier, orders, lineitem, part,
        target_nation="T", region_name="R", part_type="ECONOMY",
        y0="1996-01-01", y1="1998-01-01").collect()}
    assert set(got) == {1996, 1997}
    assert got[1996]["nation_e4"] == 2500 * 100
    assert got[1996]["total_e4"] == 10000 * 100
    assert got[1996]["mkt_share_ppm"] == 250_000
    assert got[1997]["nation_e4"] == 0
    assert got[1997]["mkt_share_ppm"] == 0


def test_disjunctive_revenue_class_boundaries(spark):
    """Each arm keys on its own (brand, size, qty) box; a row matching
    a brand but missing its qty range is dropped even though another
    arm's qty range would accept it."""
    from deepref_spark.operators.relational import disjunctive_revenue

    part = spark.createDataFrame(
        [(1, "p", "Brand#12", "T", 10, 1.0),
         (2, "p", "Brand#23", "T", 20, 1.0),
         (3, "p", "Brand#3", "T", 50, 1.0),
         (4, "p", "Brand#12", "T", 16, 1.0)],   # size beyond arm-1 cap
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size long, p_retailprice double")
    li_schema = ("l_orderkey long, l_partkey long, l_suppkey long, "
                 "l_linenumber long, l_quantity double, "
                 "l_extendedprice double, l_discount double, l_tax double, "
                 "l_returnflag string, l_linestatus string, "
                 "l_shipdate timestamp")
    t = _ts("1996-01-01")
    lineitem = spark.createDataFrame(
        [
            (1, 1, 1, 1, 11.0, 100.0, 0.0, 0.0, "N", "O", t),   # arm 1 hi edge
            (1, 1, 1, 2, 12.0, 999.0, 0.0, 0.0, "N", "O", t),   # qty past arm 1
            (1, 2, 1, 3, 10.0, 50.0, 0.10, 0.0, "N", "O", t),   # arm 2 lo edge
            (1, 3, 1, 4, 30.0, 25.0, 0.0, 0.0, "N", "O", t),    # arm 3 hi edge
            (1, 4, 1, 5, 5.0, 999.0, 0.0, 0.0, "N", "O", t),    # size out
        ], li_schema)
    got = {r["disjunct_class"]: r
           for r in disjunctive_revenue(part, lineitem).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["revenue_e4"] == 10000 * 100
    assert got[2]["revenue_e4"] == 5000 * 90
    assert got[3]["revenue_e4"] == 2500 * 100
    assert all(got[k]["n_lines"] == 1 for k in got)


def test_benford_digits_and_ppm(spark):
    """Digits read off the milli grid; zero/negative excluded; exact
    ppm shares against the fixed expected table."""
    from deepref_spark.operators.events import benford_audit, BENFORD_PPM

    vals = [1.0, 1.5, 19.99, 0.25, 0.0305, 9.0, 0.0, -5.0]
    # mills: 1000, 1500, 19990, 250, 31 (0.0305*1000=30.5 -> +0.5 floor=31),
    # 9000, 0 (excluded), -5000 (excluded) -> digits 1,1,1,2,3,9
    rows = [(i, datetime.datetime(2024, 1, 1), 1, "click", v, "{}")
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r["digit"]: r for r in benford_audit(df).collect()}
    assert set(got) == {1, 2, 3, 9}
    assert got[1]["n"] == 3 and got[1]["obs_ppm"] == 3 * 1_000_000 // 6
    assert got[2]["n"] == 1 and got[9]["n"] == 1
    for d, r in got.items():
        assert r["exp_ppm"] == BENFORD_PPM[d]
        assert r["dev_ppm"] == abs(r["obs_ppm"] - r["exp_ppm"])
    assert sum(BENFORD_PPM.values()) == 1_000_000


def _arm(u):
    import hashlib
    h = hashlib.md5(str(u).encode()).hexdigest()
    return (ord(h[0]) * 131071 + ord(h[1]) * 8191
            + ord(h[2]) * 127 + ord(h[3])) % 2


def test_power_mde_counts_and_formula(spark):
    """Counts split by the house md5 parity; the MDE reproduces the
    two-sample formula from the exact integer counts."""
    import math
    from deepref_spark.operators.events import power_mde

    # 8 users; users 0 and 1 convert (one purchase event each)
    rows = []
    for u in range(8):
        rows.append((10 * u, datetime.datetime(2024, 1, 1), u, "view",
                     0.0, "{}"))
        if u < 2:
            rows.append((10 * u + 1, datetime.datetime(2024, 1, 2), u,
                         "purchase", 0.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    r = power_mde(df).collect()[0]
    arms = [_arm(u) for u in range(8)]
    n0, n1 = arms.count(0), arms.count(1)
    conv0 = sum(1 for u in range(2) if _arm(u) == 0)
    conv1 = 2 - conv0
    assert (r["n0"], r["n1"], r["conv0"], r["conv1"]) == (n0, n1, conv0, conv1)
    assert r["p_pool_ppm"] == 2 * 1_000_000 // 8
    p = 2 / 8
    want = round(2.801585 * math.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
                 * 1_000_000, 6)
    assert abs(r["mde_ppm"] - want) < 1e-6


def test_triad_census_transitive_vs_cyclic(spark):
    """One transitive triangle, one 3-cycle (counted once per
    rotation), and a reciprocal pair (no a!=c 2-path)."""
    from deepref_spark.operators.graph import triad_census

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),       # transitive
         ("d", "e"), ("e", "f"), ("f", "d"),       # 3-cycle
         ("g", "h"), ("h", "g")],                  # reciprocal pair
        "src string, dst string")
    r = triad_census(edges).collect()[0]
    assert r["n_2paths"] == 4          # (a,b,c) + 3 cycle rotations
    assert r["n_transitive"] == 1
    assert r["n_cyclic"] == 3
    assert r["transitivity_ppm"] == 1_000_000 // 4
    assert r["cyclicity_ppm"] == 3 * 1_000_000 // 4
