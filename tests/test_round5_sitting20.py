"""Sitting-20 operators: predicate co-occurrence lift, the
write-audit-publish gate, and the split-half embedding drift monitor —
exact expected values on tiny hand-checked inputs, independent of the
DuckDB oracle sweep."""

import pyspark.sql.functions as F

from deepref_spark.operators.kgquality import predicate_pairs
from deepref_spark.operators.lakeops import wap_gate
from deepref_spark.operators.similarity import centroid_drift


# --- predicate_pairs ---------------------------------------------------------

def test_predicate_pairs_lift_grid(spark):
    # s1:{A,B} s2:{A,B} s3:{A,C} s4:{B}; duplicate (s1,A,*) rows must
    # collapse in the distinct. n_subj=4, n_A=3, n_B=3, n_C=1.
    trip = spark.createDataFrame(
        [("s1", "A", "x"), ("s1", "A", "y"), ("s1", "B", "x"),
         ("s2", "A", "x"), ("s2", "B", "y"),
         ("s3", "A", "z"), ("s3", "C", "x"),
         ("s4", "B", "z")],
        schema="subj_canon string, pred string, obj_canon string",
    )
    out = {(r["pred_a"], r["pred_b"]): (r["n_ab"], r["n_a"], r["n_b"],
                                        r["lift_milli"])
           for r in predicate_pairs(trip).collect()}
    # lift(A,B) = 2*4*1000 DIV 9 = 888; lift(A,C) = 1*4*1000 DIV 3 = 1333
    assert out == {("A", "B"): (2, 3, 3, 888),
                   ("A", "C"): (1, 3, 1, 1333)}


def test_predicate_pairs_unordered_and_no_self(spark):
    trip = spark.createDataFrame(
        [("s1", "B", "x"), ("s1", "A", "x"), ("s1", "A", "y")],
        schema="subj_canon string, pred string, obj_canon string",
    )
    rows = predicate_pairs(trip).collect()
    # exactly one unordered pair, lexicographically oriented, no (A,A)
    assert [(r["pred_a"], r["pred_b"]) for r in rows] == [("A", "B")]
    assert rows[0]["n_ab"] == 1 and rows[0]["lift_milli"] == 1000


# --- wap_gate ----------------------------------------------------------------

def _orders(spark, rows):
    return (
        spark.createDataFrame(
            rows, schema="o_orderkey long, o_orderstatus string, "
                         "o_totalprice double, o_orderdate string")
        .withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    )


def test_wap_gate_all_four_checks(spark):
    # published: 2 rows, 30000 cents total, mean 15000 cents.
    # staged: 3 rows (one duplicated key, one unseen status),
    # 48000 cents total.
    df = _orders(spark, [
        (1, "O", 100.0, "1999-05-01 00:00:00"),
        (2, "F", 200.0, "1999-06-01 00:00:00"),
        (3, "O", 140.0, "2000-02-01 00:00:00"),
        (3, "O", 140.0, "2000-02-02 00:00:00"),
        (4, "X", 200.0, "2000-03-01 00:00:00"),
    ])
    out = {r["check_name"]: (r["value"], r["threshold"], r["pass_flag"])
           for r in wap_gate(df, cutoff="2000-01-01").collect()}
    # volume = 3*1000 DIV 2 = 1500 > 800 -> fail
    assert out["volume_milli"] == (1500, 800, 0)
    # one duplicated key contributes c-1 = 1 extra row
    assert out["dup_keys"] == (1, 0, 0)
    # 'X' never published
    assert out["new_enum"] == (1, 0, 0)
    # drift = |48000*1000 DIV (3*15000) - 1000| = |1066-1000| = 66 <= 200
    assert out["drift_milli"] == (66, 200, 1)


def test_wap_gate_clean_batch_passes(spark):
    df = _orders(spark, [
        (1, "O", 100.0, "1999-05-01 00:00:00"),
        (2, "F", 100.0, "1999-06-01 00:00:00"),
        (3, "O", 100.0, "2000-02-01 00:00:00"),
    ])
    out = {r["check_name"]: r["pass_flag"]
           for r in wap_gate(df, cutoff="2000-01-01").collect()}
    assert out == {"volume_milli": 1, "dup_keys": 1, "new_enum": 1,
                   "drift_milli": 1}


# --- centroid_drift ----------------------------------------------------------

def test_centroid_drift_split_half_means(spark):
    # arm 0 = vec_id 0,2; arm 1 = vec_id 1,3.
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [2.0, 0.5]), (2, [3.0, 2.0]), (3, [4.0, 1.5])],
        schema="vec_id long, embedding array<float>",
    )
    out = {r["dim"]: r.asDict() for r in centroid_drift(emb).collect()}
    assert set(out) == {0, 1}
    d0, d1 = out[0], out[1]
    assert (d0["n_a"], d0["n_b"]) == (2, 2)
    assert (d0["mean_a"], d0["mean_b"], d0["shift"]) == (2.0, 3.0, 1.0)
    # negative shift is sign-safe on the double path
    assert (d1["mean_a"], d1["mean_b"], d1["shift"]) == (2.0, 1.0, -1.0)


def test_centroid_drift_single_aggregate_plan(spark):
    emb = spark.createDataFrame(
        [(0, [1.0]), (1, [2.0])], schema="vec_id long, embedding array<float>")
    plan = (centroid_drift(emb)._jdf.queryExecution()
            .optimizedPlan().toString())
    # one corpus pass: both arms accumulate conditionally in a single
    # grouped aggregate — no self-join of per-arm scans
    assert "Join" not in plan


# --- prospect_balance (Q22 shape) --------------------------------------------

def test_prospect_balance_mean_filter_and_dormancy(spark):
    cust = spark.createDataFrame(
        [(1, 1, 100.0), (2, 1, 300.0), (3, 2, -50.0), (4, 2, 200.0),
         (5, 1, 250.0)],
        schema="c_custkey long, c_nationkey long, c_acctbal double")
    # positives: 100+300+200+250 = 850, n=4 -> rich iff cents*4 > 85000:
    # c2 (120000) and c5 (100000); c4 is exactly below (80000).
    orders = (spark.createDataFrame(
        [(10, 2, "2001-01-01 00:00:00"),   # c2 ordered recently -> drops
         (11, 5, "1999-01-01 00:00:00")],  # c5 only pre-cutoff -> dormant
        schema="o_orderkey long, o_custkey long, o_orderdate string")
        .withColumn("o_orderdate", F.to_timestamp("o_orderdate")))
    nation = spark.createDataFrame(
        [(1, "N1"), (2, "N2")], schema="n_nationkey long, n_name string")
    from deepref_spark.operators.relational import prospect_balance
    out = [(r["n_name"], r["n_cust"], r["total_cents"])
           for r in prospect_balance(cust, orders, nation,
                                     cutoff="2000-01-01").collect()]
    assert out == [("N1", 1, 25000)]


# --- waiting_suppliers (Q21 shape) -------------------------------------------

def test_waiting_suppliers_exactly_one_late_blame(spark):
    sup = spark.createDataFrame(
        [(1, "Supp1"), (2, "Supp2")], schema="s_suppkey long, s_name string")
    orders = (spark.createDataFrame(
        [(1, "F", "2000-01-01 00:00:00"),
         (2, "F", "2000-01-01 00:00:00"),
         (3, "F", "2000-01-01 00:00:00"),
         (4, "O", "2000-01-01 00:00:00")],
        schema="o_orderkey long, o_orderstatus string, o_orderdate string")
        .withColumn("o_orderdate", F.to_timestamp("o_orderdate")))
    li = (spark.createDataFrame(
        [(1, 1, "2000-05-01 00:00:00"),   # late (> 90d)
         (1, 2, "2000-01-15 00:00:00"),   # on time -> o1 blames s1
         (2, 1, "2000-05-01 00:00:00"),
         (2, 2, "2000-06-01 00:00:00"),   # two late supps -> o2 excluded
         (3, 1, "2000-05-01 00:00:00"),   # single-supplier -> o3 excluded
         (4, 1, "2000-05-01 00:00:00")],  # status O -> ignored
        schema="l_orderkey long, l_suppkey long, l_shipdate string")
        .withColumn("l_shipdate", F.to_timestamp("l_shipdate")))
    from deepref_spark.operators.relational import waiting_suppliers
    out = [(r["s_suppkey"], r["s_name"], r["numwait"])
           for r in waiting_suppliers(sup, orders, li).collect()]
    assert out == [(1, "Supp1", 1)]


# --- top_eigen ----------------------------------------------------------------

def test_top_eigen_axis_aligned_with_constant_offset(spark):
    # dim 0 carries all the variance (values 1,-1,2,-2 -> pop var 2.5);
    # dim 1 is CONSTANT 10 — the n*S12 - S1*S2 numerator must center it
    # to exactly zero, certifying mean removal.
    emb = spark.createDataFrame(
        [(0, [1.0, 10.0]), (1, [-1.0, 10.0]),
         (2, [2.0, 10.0]), (3, [-2.0, 10.0])],
        schema="vec_id long, embedding array<float>")
    from deepref_spark.operators.similarity import top_eigen
    out = {r["dim"]: r for r in top_eigen(emb, iters=8).collect()}
    assert out[0]["component_micro"] == 1000000
    assert out[1]["component_micro"] == 0
    assert out[0]["eig"] == 2.5
    assert out[0]["eig_share"] == 1.0


def test_top_eigen_degenerate_orthogonal_start_is_zero_not_nan(spark):
    # data along (1,-1): v0 = all-ones is exactly orthogonal to the
    # dominant eigenvector, the iterate collapses to zero, and the
    # readout must pin to 0.0 (not NaN/NULL).
    emb = spark.createDataFrame(
        [(0, [1.0, -1.0]), (1, [-1.0, 1.0]),
         (2, [2.0, -2.0]), (3, [-2.0, 2.0])],
        schema="vec_id long, embedding array<float>")
    from deepref_spark.operators.similarity import top_eigen
    rows = top_eigen(emb, iters=8).collect()
    assert all(r["component_micro"] == 0 for r in rows)
    assert all(r["eig"] == 0.0 and r["eig_share"] == 0.0 for r in rows)


# --- seasonal_outliers ---------------------------------------------------------

def test_seasonal_outliers_planted_spike(spark):
    # one event per hour for 48 hours, except hour 30 carries 5 events:
    # residuals vs lag-24 are all 0 except +4 at hour 30; the median
    # |residual| is 0, the floor-1 band makes the threshold 3, and the
    # single spike flags.
    rows = []
    eid = 0
    for h in range(48):
        n = 5 if h == 30 else 1
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-01-0{1 + h // 24} "
                              f"{h % 24:02d}:00:00", 1, "c", 1.0))
    ev = (spark.createDataFrame(
        rows, schema="event_id long, ts string, user_id long, "
                     "event_type string, value double")
        .withColumn("ts", F.to_timestamp("ts")))
    from deepref_spark.operators.events import seasonal_outliers
    out = seasonal_outliers(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_scored"], r["med_abs_resid"], r["n_outliers"],
            r["max_abs_resid"]) == (24, 0, 1, 4)
    assert r["worst_hour"] == "2024-01-02 06:00:00"


# --- overlap_depth -------------------------------------------------------------

def test_overlap_depth_sweep_line(spark):
    # 4 writer-files: [0,10], [5,20], [15,30] chain-overlap pairwise
    # (max simultaneous = 2); [100,110] is disjoint.
    base = "2024-01-01 00:00:"
    def t(s):
        return f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}"
    rows = [(1, t(0), 0, "t", 1.0), (2, t(10), 0, "t", 1.0),
            (3, t(5), 1, "t", 1.0), (4, t(20), 1, "t", 1.0),
            (5, t(15), 2, "t", 1.0), (6, t(30), 2, "t", 1.0),
            (7, t(100), 3, "t", 1.0), (8, t(110), 3, "t", 1.0)]
    ev = (spark.createDataFrame(
        rows, schema="event_id long, ts string, user_id long, "
                     "event_type string, value double")
        .withColumn("ts", F.to_timestamp("ts")))
    from deepref_spark.operators.lakeops import overlap_depth
    out = overlap_depth(ev, writers=4).collect()
    assert [(r["partition_key"], r["n_files"], r["max_depth"])
            for r in out] == [("t", 4, 2)]


# --- jl_distortion -------------------------------------------------------------

def test_jl_distortion_exact_grids_and_dup_guard(spark):
    # dim=4, n_proj=2, seed=7 -> planes [[-1,1,-1,1],[1,1,1,-1]]
    # (pinned by rademacher_planes' seeded PRNG).
    from deepref_spark.operators.similarity import (
        jl_distortion, rademacher_planes)
    assert rademacher_planes(4, 2, 7).tolist() == [[-1, 1, -1, 1],
                                                   [1, 1, 1, -1]]
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
         (2, [1.0, 0.0, 0.0, 0.0])],  # vec 2 duplicates vec 0
        schema="vec_id long, embedding array<float>")
    out = {(r["vec_a"], r["vec_b"]): r.asDict()
           for r in jl_distortion(emb, dim=4, n_proj=2,
                                  sample_n=8, seed=7).collect()}
    assert set(out) == {(0, 1), (0, 2), (1, 2)}
    # projections: v0 -> (-1000, 1000), v1 -> (1000, 1000)
    assert out[(0, 1)]["d2_grid"] == 2_000_000
    assert out[(0, 1)]["pj2_grid"] == 4_000_000
    assert out[(0, 1)]["ratio_ppm"] == 1_000_000
    # identical vectors: zero distance pins to the perfect ratio
    assert out[(0, 2)]["d2_grid"] == 0
    assert out[(0, 2)]["pj2_grid"] == 0
    assert out[(0, 2)]["ratio_ppm"] == 1_000_000
