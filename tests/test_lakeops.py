"""Unit tests for the lakehouse operational-plane operators — exact
expected values on tiny hand-checked inputs, independent of the DuckDB
oracles: one-scan column statistics, order-preserving compaction
planning, and delta-refresh aggregate maintenance."""

from deepref_spark.operators.lakeops import (
    column_stats, compaction_plan, file_inventory, incremental_agg,
)


# --- column_stats ------------------------------------------------------------

def test_column_stats_counts_ndv_grid(spark):
    df = spark.createDataFrame(
        [(1, 2.345, "A"), (1, 2.344, "B"), (2, None, "A")],
        schema="k long, v double, f string",
    )
    specs = (("k", "long"), ("v", "cents"), ("f", "str"))
    out = {r["col_name"]: r.asDict() for r in column_stats(df, specs).collect()}
    assert set(out) == {"k", "v", "f"}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_null"] == 0
    assert out["k"]["ndv"] == 2
    assert (out["k"]["min_val"], out["k"]["max_val"]) == ("1", "2")
    # cents grid: 2.345*100 = 234.50000000000003 in doubles -> 235;
    # 2.344*100 = 234.39999999999998 -> 234 (the grid is the DOUBLE
    # formula's fixpoint, identical in Spark and DuckDB — not decimal)
    assert out["v"]["n_null"] == 1 and out["v"]["ndv"] == 2
    assert (out["v"]["min_val"], out["v"]["max_val"]) == ("234", "235")
    assert out["f"]["ndv"] == 2
    assert (out["f"]["min_val"], out["f"]["max_val"]) == ("A", "B")


def test_column_stats_single_aggregate_plan(spark):
    # ONE scan: the plan must contain exactly one Expand (the
    # multi-distinct rewrite) and no join/union of per-column scans.
    df = spark.createDataFrame([(1, 1.0, "x")], schema="k long, v double, f string")
    plan = column_stats(
        df, (("k", "long"), ("v", "cents"), ("f", "str"))
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Union" not in plan


# --- file_inventory / compaction_plan ----------------------------------------

def test_compaction_plan_order_preserving_packing(spark):
    inv = spark.createDataFrame(
        [("p", "f1", 1000), ("p", "f2", 1000), ("p", "f3", 1000),
         ("p", "f4", 5000), ("p", "f5", 100),
         ("q", "f1", 10)],
        schema="partition_key string, file_id string, n_bytes long",
    )
    # cumulative-before DIV 2048: f1 cum=0 -> g0; f2 cum=1000 -> g0;
    # f3 cum=2000 -> g0; f4 cum=3000 -> g1; f5 cum=8000 -> g3
    out = {(r["partition_key"], r["compact_group"]):
           (r["n_files"], r["total_bytes"], r["first_file"], r["last_file"])
           for r in compaction_plan(inv, target_bytes=2048).collect()}
    assert out == {
        ("p", 0): (3, 3000, "f1", "f3"),
        ("p", 1): (1, 5000, "f4", "f4"),
        ("p", 3): (1, 100, "f5", "f5"),
        ("q", 0): (1, 10, "f1", "f1"),
    }


def test_file_inventory_partition_day_grain(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 05:00:00", 1, "click", 1.0),
         (2, "2024-01-01 23:59:59", 2, "click", 1.0),
         (3, "2024-01-02 00:00:00", 1, "click", 1.0),
         (4, "2024-01-01 12:00:00", 1, "view", 1.0)],
        schema="event_id long, ts string, user_id long, "
               "event_type string, value double",
    )
    out = {(r["partition_key"], r["file_id"]): r["n_bytes"]
           for r in file_inventory(ev, row_bytes=64).collect()}
    assert out == {("click", "2024-01-01"): 128,
                   ("click", "2024-01-02"): 64,
                   ("view", "2024-01-01"): 64}


# --- incremental_agg ----------------------------------------------------------

def test_incremental_agg_merge_equals_full_recompute(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "buy", 1.005),
         (2, "2024-01-20 00:00:00", 1, "buy", 2.0),
         (3, "2024-01-25 00:00:00", 2, "buy", 0.10)],
        schema="event_id long, ts string, user_id long, "
               "event_type string, value double",
    )
    # cents grid: floor(1.005*100+0.5)=101 (fp 100.49999 -> +0.5 -> 100.99999
    # -> 100? check: 1.005*100 = 100.49999999999999; +0.5 = 100.99999999999999
    # -> floor = 100), 200, 10
    out = {(r["user_id"], r["event_type"]): (r["n_events"], r["total_value"])
           for r in incremental_agg(ev, "2024-01-15 00:00:00").collect()}
    assert out == {(1, "buy"): (2, 3.0), (2, "buy"): (1, 0.1)}


def test_incremental_agg_cutoff_outside_range(spark):
    # every row lands in DELTA (cutoff before all data) — merge with an
    # empty BASE must equal the full rollup
    ev = spark.createDataFrame(
        [(1, "2024-06-01 00:00:00", 7, "x", 1.0),
         (2, "2024-06-02 00:00:00", 7, "x", 2.0)],
        schema="event_id long, ts string, user_id long, "
               "event_type string, value double",
    )
    rows = incremental_agg(ev, "2024-01-01 00:00:00").collect()
    assert [(r["user_id"], r["event_type"], r["n_events"], r["total_value"])
            for r in rows] == [(7, "x", 2, 3.0)]


# --- constraint_check ---------------------------------------------------------

_LI_SCHEMA = ("l_orderkey long, l_linenumber int, l_quantity double, "
              "l_discount double, l_returnflag string")


def test_constraint_check_all_pass(spark):
    df = spark.createDataFrame(
        [(1, 1, 5.0, 0.05, "A"), (1, 2, 2.0, 0.10, "N"), (2, 1, 1.0, 0.0, "R")],
        schema=_LI_SCHEMA,
    )
    from deepref_spark.operators.lakeops import constraint_check
    out = {r["check_name"]: (r["metric"], r["passed"])
           for r in constraint_check(df).collect()}
    assert out == {
        "complete_l_orderkey": (1_000_000, 1),
        "unique_order_line": (1_000_000, 1),
        "min_l_quantity_cents": (100, 1),
        "max_l_discount_cents": (10, 1),
        "set_l_returnflag": (1_000_000, 1),
    }


def test_constraint_check_each_violation_detected(spark):
    # null key, duplicate (orderkey, linenumber), qty 0.5 < 1,
    # discount 0.2 > 0.1, flag 'X' outside the set — all five fail
    df = spark.createDataFrame(
        [(None, 1, 0.5, 0.20, "X"), (2, 1, 5.0, 0.0, "A"),
         (2, 1, 5.0, 0.0, "A"), (3, 1, 5.0, 0.0, "N")],
        schema=_LI_SCHEMA,
    )
    from deepref_spark.operators.lakeops import constraint_check
    out = {r["check_name"]: (r["metric"], r["passed"])
           for r in constraint_check(df).collect()}
    assert out["complete_l_orderkey"] == (750_000, 0)
    # distinct keys: (null->201? no: null*100+1 is NULL, excluded by
    # countDistinct) -> {201, 301} of 4 rows = 500000 ppm
    assert out["unique_order_line"] == (500_000, 0)
    assert out["min_l_quantity_cents"] == (50, 0)
    assert out["max_l_discount_cents"] == (20, 0)
    assert out["set_l_returnflag"] == (750_000, 0)


# --- zorder -------------------------------------------------------------------

def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_expr_matches_python_morton(spark):
    from deepref_spark.operators.lakeops import zorder_expr
    from deepref_spark.portable import SPARK as SP
    rows = spark.sql(
        "SELECT xn, yn, " + zorder_expr("xn", "yn", 4, SP) + " AS z FROM "
        "(SELECT id % 16 AS xn, id div 16 AS yn FROM range(256))"
    ).collect()
    assert len(rows) == 256
    for r in rows:
        assert r["z"] == _morton(r["xn"], r["yn"], 4)


def test_zorder_buckets_envelopes(spark):
    # keys already on the grid: max=255 -> xn = x*256 div 256 = x.
    # bucket = z div 256 -> for (x<16, y<16) z < 256 -> all in bucket 0
    from deepref_spark.operators.lakeops import zorder_buckets
    df = spark.createDataFrame(
        [(x, y) for x in (0, 15) for y in (0, 15)] + [(255, 255)],
        schema="k1 long, k2 long",
    )
    out = {r["z_bucket"]: (r["n_rows"], r["min_x"], r["max_x"])
           for r in zorder_buckets(df, "k1", "k2").collect()}
    assert out[0] == (4, 0, 15)                  # the four small points
    assert out[(_morton(255, 255, 8)) // 256] == (1, 255, 255)
    assert sum(v[0] for v in out.values()) == 5


# --- textrank -----------------------------------------------------------------

def test_textrank_path_graph_center_ranks_first(spark):
    # word graph alpha-beta-gamma (beta is the hub): hand-unrolled
    # 3-round integer-grid PageRank gives beta u=1741625000,
    # alpha=gamma u=629187500; tie broken alphabetically
    from deepref_spark.operators.text_analysis import textrank_keywords
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta alpha")],
        schema="doc_id long, text string",
    )
    rows = textrank_keywords(docs).collect()
    assert [(r["rank"], r["word"]) for r in rows] == [
        (1, "beta"), (2, "alpha"), (3, "gamma")]
    assert rows[0]["score"] == 1.741625
    assert rows[1]["score"] == rows[2]["score"]


def test_textrank_short_words_and_short_docs_excluded(spark):
    # "of" and "a" fall below min_len; a 1-token doc yields no pairs
    from deepref_spark.operators.text_analysis import textrank_keywords
    docs = spark.createDataFrame(
        [(0, "quick of brown a quick brown"), (1, "solo")],
        schema="doc_id long, text string",
    )
    words = {r["word"] for r in textrank_keywords(docs).collect()}
    # adjacency is WITHIN the raw token stream: quick-of / of-brown etc.
    # drop (short word), quick-brown survives from positions 4-5
    assert words == {"quick", "brown"}
