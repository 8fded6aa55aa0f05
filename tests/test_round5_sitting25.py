"""Sitting-25 operators: Theil-Sen trend slope, single change-point,
U-shaped attribution, TPC-H Q20-shape promo suppliers, and per-label
Mahalanobis OOD screen — exact expected values on tiny hand-checked
inputs, independent of the DuckDB oracle sweep."""

import pyspark.sql.functions as F

from deepref_spark.operators.events import (changepoint,
                                            positional_attribution,
                                            theil_sen_trend)
from deepref_spark.operators.relational import promo_suppliers
from deepref_spark.operators.similarity import mahalanobis_outliers


def _events_daily(spark, counts, event_type="click"):
    # one row per event; counts[i] events on day 2024-01-(i+1)
    rows, eid = [], 0
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, f"2024-01-{i + 1:02d} 06:00:00",
                         eid % 7, event_type, 1.0))
            eid += 1
    return (
        spark.createDataFrame(
            rows, schema=("event_id long, ts string, user_id long, "
                          "event_type string, value double"))
        .withColumn("ts", F.to_timestamp("ts"))
    )


# --- theil_sen_trend ---------------------------------------------------------

def test_theil_sen_exact_line(spark):
    # x = 2*day + 3 exactly: every pairwise slope is 2000 milli,
    # intercept median is 3000 milli (x*1000 - 2000*day_idx = 3000).
    counts = [3, 5, 7, 9]  # day idx 0..3
    [r] = theil_sen_trend(_events_daily(spark, counts)).collect()
    assert r["n_days"] == 4
    assert r["n_pairs"] == 6
    assert r["slope_milli"] == 2000
    assert r["intercept_milli"] == 3000


def test_theil_sen_outlier_day_is_ignored(spark):
    # days [1, 2, 3, 40]: OLS would be wrecked; the 6 pairwise slopes
    # (milli, sorted) are 1000,1000,1000,12333,18500,37000 — lower
    # median (rn = (6+1) DIV 2 = 3) is 1000.
    [r] = theil_sen_trend(_events_daily(spark, [1, 2, 3, 40])).collect()
    assert r["slope_milli"] == 1000
    # intercepts x*1000 - 1000*idx = 1000,1000,1000,37000 -> lower
    # median (rn = (4+1) DIV 2 = 2) = 1000
    assert r["intercept_milli"] == 1000


def test_theil_sen_single_day_type_drops(spark):
    df = _events_daily(spark, [4])
    assert theil_sen_trend(df).count() == 0


# --- changepoint -------------------------------------------------------------

def test_changepoint_obvious_shift(spark):
    # [1,1,1,5,5,5]: best split after day 3 (k=3), means 1.0 / 5.0,
    # gain = 9/3 + 225/3 = 78, flat = 324/6 = 54, gain_over_flat = 24.
    [r] = changepoint(_events_daily(spark, [1, 1, 1, 5, 5, 5])).collect()
    assert r["n_days"] == 6
    assert r["split_day"] == "2024-01-03"
    assert r["n_before"] == 3
    assert r["mean_before"] == 1.0
    assert r["mean_after"] == 5.0
    assert r["gain_over_flat"] == 24.0


def test_changepoint_tie_breaks_on_earlier_day(spark):
    # symmetric [2,2]: only split k=1 exists (k < n), trivially picked;
    # flat gain equals split gain -> gain_over_flat = 0.
    [r] = changepoint(_events_daily(spark, [2, 2])).collect()
    assert r["split_day"] == "2024-01-01"
    assert r["gain_over_flat"] == 0.0


# --- positional_attribution --------------------------------------------------

def _touch_rows(spark, rows):
    return (
        spark.createDataFrame(
            rows, schema=("event_id long, ts string, user_id long, "
                          "event_type string, value double"))
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_positional_attribution_u_shape(spark):
    # user 1: 4 touches then purchase. n=4: first 400000, last 400000,
    # middle two split 200000 -> pos2 gets 100000 + remainder 0,
    # pos3 gets 100000.
    rows = [
        (1, "2024-01-01 00:00:01", 1, "click", 1.0),
        (2, "2024-01-01 00:00:02", 1, "view", 1.0),
        (3, "2024-01-01 00:00:03", 1, "signup", 1.0),
        (4, "2024-01-01 00:00:04", 1, "view", 1.0),
        (5, "2024-01-01 00:00:05", 1, "purchase", 1.0),
        # user 2: single touch -> full million; later touches after
        # the purchase must NOT be credited
        (6, "2024-01-02 00:00:01", 2, "click", 1.0),
        (7, "2024-01-02 00:00:02", 2, "purchase", 1.0),
        (8, "2024-01-02 00:00:03", 2, "view", 1.0),
        # user 3: no purchase -> no credit at all
        (9, "2024-01-03 00:00:01", 3, "click", 1.0),
    ]
    out = {r["event_type"]: r
           for r in positional_attribution(_touch_rows(spark, rows))
           .collect()}
    assert out["click"]["credit_ppm"] == 400000 + 1000000
    assert out["click"]["n_touches"] == 2
    assert out["click"]["n_users"] == 2
    assert out["view"]["credit_ppm"] == 100000 + 400000
    assert out["signup"]["credit_ppm"] == 100000
    total = sum(r["credit_ppm"] for r in out.values())
    assert total == 2000000  # exactly 1e6 per converting user


def test_positional_attribution_middle_remainder_to_earliest(spark):
    # n=5: middle three split 200000 // 3 = 66666 each, remainder 2
    # goes to pos 2 (earliest middle) -> 66668.
    rows = [(i, f"2024-01-01 00:00:0{i}", 1, t, 1.0)
            for i, t in enumerate(
                ["click", "view", "view", "view", "click"], start=1)]
    rows.append((9, "2024-01-01 00:00:09", 1, "purchase", 1.0))
    out = {r["event_type"]: r["credit_ppm"]
           for r in positional_attribution(_touch_rows(spark, rows))
           .collect()}
    # pos1 click 400000 + pos5 click 400000; views pos2..4:
    # 66668 + 66666 + 66666
    assert out["click"] == 800000
    assert out["view"] == 200000
    assert sum(out.values()) == 1000000


def test_positional_attribution_two_touches_split_evenly(spark):
    rows = [
        (1, "2024-01-01 00:00:01", 1, "click", 1.0),
        (2, "2024-01-01 00:00:02", 1, "view", 1.0),
        (3, "2024-01-01 00:00:03", 1, "purchase", 1.0),
    ]
    out = {r["event_type"]: r["credit_ppm"]
           for r in positional_attribution(_touch_rows(spark, rows))
           .collect()}
    assert out == {"click": 500000, "view": 500000}


# --- promo_suppliers ---------------------------------------------------------

def test_promo_suppliers_dominance_threshold(spark):
    supplier = spark.createDataFrame(
        [(1, "Supplier#1", 0, 0.0), (2, "Supplier#2", 0, 0.0)],
        schema="s_suppkey long, s_name string, s_nationkey int, "
               "s_acctbal double")
    part = spark.createDataFrame(
        [(10, "blue rod"), (11, "red rod")],
        schema="p_partkey long, p_name string")
    # part 10 (matches prefix): supp 1 ships 80, supp 2 ships 20
    # -> only supp 1 exceeds 2500 bp (20% = 2000 bp fails).
    # part 11 (no prefix match): ignored entirely.
    li = spark.createDataFrame(
        [(10, 1, 80.0, "1995-06-01 00:00:00"),
         (10, 2, 20.0, "1995-06-02 00:00:00"),
         (11, 2, 999.0, "1995-06-03 00:00:00"),
         # out-of-window year for part 10 must not count
         (10, 2, 999.0, "1994-06-01 00:00:00")],
        schema="l_partkey long, l_suppkey long, l_quantity double, "
               "l_shipdate string"
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    rows = promo_suppliers(supplier, part, li).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["s_suppkey"] == 1
    assert r["n_parts"] == 1
    assert r["best_share_bp"] == 8000
    assert r["qty_e2"] == 8000  # 80.00 on the e2 grid


def test_promo_suppliers_exact_threshold_excluded(spark):
    # 25.00 vs 75.00: 2500 bp exactly is NOT dominant (strict >).
    supplier = spark.createDataFrame(
        [(1, "Supplier#1", 0, 0.0), (2, "Supplier#2", 0, 0.0)],
        schema="s_suppkey long, s_name string, s_nationkey int, "
               "s_acctbal double")
    part = spark.createDataFrame(
        [(10, "blue rod")], schema="p_partkey long, p_name string")
    li = spark.createDataFrame(
        [(10, 1, 25.0, "1995-06-01 00:00:00"),
         (10, 2, 75.0, "1995-06-02 00:00:00")],
        schema="l_partkey long, l_suppkey long, l_quantity double, "
               "l_shipdate string"
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    rows = promo_suppliers(supplier, part, li).collect()
    assert [r["s_suppkey"] for r in rows] == [2]
    assert rows[0]["best_share_bp"] == 7500


# --- mahalanobis_outliers ----------------------------------------------------

def test_mahalanobis_flags_the_planted_outlier(spark):
    # label 0: three vectors near [1, 0], one at [0, 4] -> the planted
    # one must rank 1; label 1 is uniform -> all scores equal, rk by
    # vec_id.
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.2], 0),
        (3, [0.8, 0.1], 0),
        (4, [0.0, 4.0], 0),
        (5, [2.0, 2.0], 1),
        (6, [2.0, 2.0], 1),
    ]
    df = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int")
    out = mahalanobis_outliers(df, dim=2, k=2).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r)
    top0 = min(by_label[0], key=lambda r: r["rk"])
    assert top0["vec_id"] == 4
    # label 1 has zero variance on every dim -> guarded to score 0
    assert all(r["score_milli"] == 0 for r in by_label[1])
    assert [r["vec_id"] for r in sorted(by_label[1],
                                        key=lambda r: r["rk"])] == [5, 6]


def test_mahalanobis_score_matches_hand_formula(spark):
    # one dim that matters: u values (milli grid) = 1000, 2000, 3000
    # n=3, s=6000, s2=14e6, var_num = 3*14e6 - 36e6 = 6e6
    # terms (n*u - s)^2 * 1000 // 6e6: u=1000 -> 9e6*1000//6e6 = 1500
    # u=2000 -> 0; u=3000 -> 1500. Second dim constant -> 0.
    rows = [(1, [1.0, 5.0], 0), (2, [2.0, 5.0], 0), (3, [3.0, 5.0], 0)]
    df = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int")
    out = {r["vec_id"]: r["score_milli"]
           for r in mahalanobis_outliers(df, dim=2, k=3).collect()}
    assert out == {1: 1500, 2: 0, 3: 1500}


# --- sales_rollup ------------------------------------------------------------

def test_sales_rollup_levels_and_gid(spark):
    from deepref_spark.operators.relational import sales_rollup
    li = spark.createDataFrame(
        [("R", "O", 1.0, 10.0, 0.0), ("R", "F", 2.0, 10.0, 0.1),
         ("A", "O", 3.0, 10.0, 0.0)],
        schema="l_returnflag string, l_linestatus string, "
               "l_quantity double, l_extendedprice double, "
               "l_discount double")
    rows = {(r["l_returnflag"], r["l_linestatus"]): r
            for r in sales_rollup(li).collect()}
    # 3 detail + 2 flag subtotals + 1 grand total
    assert len(rows) == 6
    assert rows[("R", "O")]["gid"] == 0
    assert rows[("R", None)]["gid"] == 1
    assert rows[(None, None)]["gid"] == 3
    assert rows[(None, None)]["n_rows"] == 3
    assert rows[(None, None)]["qty_e2"] == 600
    # rev_e4: 1000c * 100 + 1000c * 90 + 1000c * 100
    assert rows[(None, None)]["rev_e4"] == 100000 + 90000 + 100000
    assert rows[("R", None)]["qty_e2"] == 300


# --- pivot_daily -------------------------------------------------------------

def test_pivot_daily_fills_absent_cells(spark):
    from deepref_spark.operators.events import pivot_daily
    rows = [(1, "2024-01-01 01:00:00", 1, "click", 1.0),
            (2, "2024-01-01 02:00:00", 2, "click", 1.0),
            (3, "2024-01-02 01:00:00", 1, "view", 1.0)]
    df = (spark.createDataFrame(
        rows, schema="event_id long, ts string, user_id long, "
                     "event_type string, value double")
        .withColumn("ts", F.to_timestamp("ts")))
    out = {r["day"]: r for r in pivot_daily(df).collect()}
    assert out["2024-01-01"]["click"] == 2
    assert out["2024-01-01"]["view"] == 0       # coalesced, not null
    assert out["2024-01-02"]["view"] == 1
    assert out["2024-01-02"]["purchase"] == 0


def test_pivot_daily_explicit_values_construct_lazily(spark):
    # the scale property of the pinned value list: .pivot(col, values)
    # must NOT run an eager distinct-values job at construction time
    # (inference-mode pivot does, scanning the corpus before the plan
    # even exists). Probe: an event_type column that raises on ANY
    # evaluation — construction must stay lazy and not trigger it.
    from deepref_spark.operators.events import pivot_daily
    df = spark.range(1).select(
        F.lit(1).cast("long").alias("event_id"),
        F.to_timestamp(F.lit("2024-01-01 01:00:00")).alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.expr("CASE WHEN id >= 0 THEN "
               "raise_error('eager pivot-value scan') "
               "ELSE 'x' END").alias("event_type"),
        F.lit(1.0).alias("value"))
    out = pivot_daily(df)  # no exception = no eager value scan
    # and the desugared plan is the single pivotfirst chain over ONE
    # base aggregate — no third aggregate for value inference
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 2, plan
    assert "pivotfirst" in plan, plan


# --- bitmap_coverage ---------------------------------------------------------

def test_bitmap_coverage_hand_bitmaps(spark):
    from deepref_spark.operators.events import bitmap_coverage
    # day 1: users 0, 1, 62 -> slots {0, 1, 0} = {0, 1} -> 2 slots
    # (62 % 62 = 0 collides with user 0: the saturation the exact
    # column calibrates); day 2: user 5 -> 1 slot; merged {0,1,5} = 3
    rows = [(1, "2024-01-01 01:00:00", 0, "click", 1.0),
            (2, "2024-01-01 02:00:00", 1, "click", 1.0),
            (3, "2024-01-01 03:00:00", 62, "click", 1.0),
            (4, "2024-01-02 01:00:00", 5, "click", 1.0)]
    df = (spark.createDataFrame(
        rows, schema="event_id long, ts string, user_id long, "
                     "event_type string, value double")
        .withColumn("ts", F.to_timestamp("ts")))
    [r] = bitmap_coverage(df).collect()
    assert r["n_days"] == 2
    assert r["merged_slots"] == 3
    assert r["min_daily_slots"] == 1
    assert r["max_daily_slots"] == 2
    assert r["sum_daily_exact"] == 4  # exact sees 3 + 1 users


# --- bowtie_regions ----------------------------------------------------------

def test_bowtie_hand_graph(spark):
    from deepref_spark.operators.graph import bowtie_regions
    # core = {a, b} (2-cycle); i -> a ('in'); b -> o ('out');
    # d1 -> d2 disconnected from the core ('other' x2)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("i", "a"), ("b", "o"), ("d1", "d2")],
        schema="src string, dst string")
    out = {r["region"]: r for r in bowtie_regions(edges).collect()}
    assert out["core"]["n_components"] == 1
    assert out["core"]["n_entities"] == 2
    assert out["in"]["n_components"] == 1
    assert out["in"]["n_entities"] == 1
    assert out["out"]["n_components"] == 1
    assert out["out"]["n_entities"] == 1
    assert out["other"]["n_components"] == 2
    assert out["other"]["n_entities"] == 2


def test_bowtie_empty_edges_raises(spark):
    import pytest

    from deepref_spark.operators.graph import bowtie_regions
    edges = spark.createDataFrame([], schema="src string, dst string")
    with pytest.raises(ValueError, match="empty edge set"):
        bowtie_regions(edges)


def test_bowtie_tendril_through_in_is_in(spark):
    from deepref_spark.operators.graph import bowtie_regions
    # x -> i -> a, core {a, b}: x reaches the core transitively ->
    # 'in', not 'other' (the closure runs on the quotient, not 1-hop)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("i", "a"), ("x", "i")],
        schema="src string, dst string")
    out = {r["region"]: r["n_entities"]
           for r in bowtie_regions(edges).collect()}
    assert out["in"] == 2
    assert "other" not in out


# --- dedup_yield_report ------------------------------------------------------

def test_dedup_yield_report_counts(spark):
    from deepref_spark.operators.dedup import dedup_yield_report
    dup = "the quick brown fox jumps over the lazy dog again"
    docs = spark.createDataFrame(
        [(1, dup), (2, dup), (3, dup),
         (4, "completely unrelated text about warehouse engines ok")],
        schema="doc_id long, text string")
    [r] = dedup_yield_report(docs).collect()
    assert r["n_docs"] == 4
    assert r["n_clusters"] == 2
    assert r["n_removed"] == 2
    assert r["max_cluster"] == 3
    assert r["n_singletons"] == 1
    assert r["n_dup_clusters"] == 1
