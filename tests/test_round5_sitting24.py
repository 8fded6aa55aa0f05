"""Sitting-24 operators: difference-in-differences readout, truncated
exponential-smoothing backtest, and per-entity summary cards — exact
expected values on tiny hand-checked inputs, independent of the DuckDB
oracle sweep."""

import hashlib

import pyspark.sql.functions as F

from deepref_spark.operators.events import did_report, ses_forecast
from deepref_spark.operators.kgquality import entity_card


def _arm(u) -> int:
    # independent replay of portable.md5_mod(CAST(u AS STRING), 2)
    h = hashlib.md5(str(u).encode()).hexdigest()
    return (ord(h[0]) * 131071 + ord(h[1]) * 8191
            + ord(h[2]) * 127 + ord(h[3])) % 2


def _events(spark, rows):
    return (
        spark.createDataFrame(
            rows, schema="user_id long, ts string, value double")
        .withColumn("ts", F.to_timestamp("ts"))
    )


# --- did_report ----------------------------------------------------------------

def test_did_report_matches_hand_computation(spark):
    # span 2024-01-01 .. 2024-01-03; mid = 2024-01-02 00:00 exactly,
    # and the midpoint second itself counts as POST (sec >= mid).
    users = [1, 2, 3, 4, 5, 6]
    pre_v = {u: float(u) for u in users}           # 1.00 .. 6.00
    post_v = {u: float(u) * 3 for u in users}      # 3.00 .. 18.00
    rows = [(u, "2024-01-01 00:00:00", pre_v[u]) for u in users]
    rows += [(u, "2024-01-02 00:00:00", post_v[u]) for u in users[:1]]
    rows += [(u, "2024-01-03 00:00:00", post_v[u]) for u in users[1:]]
    [r] = did_report(_events(spark, rows)).collect()

    arms = {u: _arm(u) for u in users}
    assert set(arms.values()) == {0, 1}  # fixture must fill both arms
    n = {a: sum(1 for u in users if arms[u] == a) for a in (0, 1)}
    pre = {a: sum(round(pre_v[u] * 100) for u in users if arms[u] == a)
           for a in (0, 1)}
    post = {a: sum(round(post_v[u] * 100) for u in users if arms[u] == a)
            for a in (0, 1)}
    assert (r["n_treat"], r["n_ctrl"]) == (n[1], n[0])
    assert (r["pre_t_cents"], r["post_t_cents"]) == (pre[1], post[1])
    assert (r["pre_c_cents"], r["post_c_cents"]) == (pre[0], post[0])
    want = round((post[1] - pre[1]) / n[1] - (post[0] - pre[0]) / n[0], 6)
    assert r["did_cents"] == want


def test_did_report_single_arm_yields_null(spark):
    # every user in one arm -> the other arm's fields and the estimate
    # are NULL (tiny-input edge; both arms fill at any real scale).
    u = 1 if _arm(1) == 1 else 2  # pick any user landing in arm 1
    assert _arm(u) == 1
    rows = [(u, "2024-01-01 00:00:00", 1.0), (u, "2024-01-03 00:00:00", 2.0)]
    [r] = did_report(_events(spark, rows)).collect()
    assert r["n_ctrl"] is None and r["did_cents"] is None
    assert r["n_treat"] == 1


# --- ses_forecast --------------------------------------------------------------

def test_ses_forecast_weights_gap_and_cap(spark):
    # type x: day0 = 100c, day1 = 200c, day3 = 400c (day2 gap).
    # W = 16, denom = 65535.  Hand sums:
    #   t1: 100*2^15 = 3276800            -> 50;  actual 200 -> err 150
    #   t2: 200*2^15 + 100*2^14 = 8192000 -> 125; gap -> NULLs
    #   t3: 200*2^14 + 100*2^13 = 4096000 -> 62;  actual 400 -> err 338
    #   t4: 400*2^15 + 200*2^13 + 100*2^12 = 15155200 -> 231; beyond max
    rows = [(1, "2024-01-01 08:00:00", 1.00),
            (1, "2024-01-02 09:00:00", 2.00),
            (1, "2024-01-04 10:00:00", 4.00)]
    df = (spark.createDataFrame(
        rows, schema="user_id long, ts string, value double")
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("event_type", F.lit("x")))
    out = {r["day"]: r for r in ses_forecast(df).collect()}
    assert set(out) == {"2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"}
    assert (out["2024-01-02"]["forecast_cents"],
            out["2024-01-02"]["actual_cents"],
            out["2024-01-02"]["err_cents"]) == (50, 200, 150)
    assert (out["2024-01-03"]["forecast_cents"],
            out["2024-01-03"]["actual_cents"]) == (125, None)
    assert (out["2024-01-04"]["forecast_cents"],
            out["2024-01-04"]["err_cents"]) == (62, 338)
    assert (out["2024-01-05"]["forecast_cents"],
            out["2024-01-05"]["actual_cents"]) == (231, None)


def test_ses_forecast_short_window(spark):
    # W = 2, denom = 3: day0 = 300c, day1 = 600c.
    #   t1: 300*2 = 600 -> 200; actual 600 -> err 400
    #   t2: 600*2 + 300*1 = 1500 -> 500; one-step-ahead row, no actual
    rows = [(1, "2024-01-01 00:00:00", 3.00),
            (1, "2024-01-02 00:00:00", 6.00)]
    df = (spark.createDataFrame(
        rows, schema="user_id long, ts string, value double")
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("event_type", F.lit("x")))
    out = {r["day"]: r for r in ses_forecast(df, window_days=2).collect()}
    assert set(out) == {"2024-01-02", "2024-01-03"}
    assert (out["2024-01-02"]["forecast_cents"],
            out["2024-01-02"]["err_cents"]) == (200, 400)
    assert (out["2024-01-03"]["forecast_cents"],
            out["2024-01-03"]["actual_cents"]) == (500, None)


# --- entity_card ---------------------------------------------------------------

def test_entity_card_counts_and_dominant_pred(spark):
    trip = spark.createDataFrame(
        [("a", "p1", "x"), ("a", "p1", "y"), ("a", "p2", "x"),
         ("b", "p1", "x"), ("b", "p2", "y")],
        schema="subj_canon string, pred string, obj_canon string")
    out = {r["subj"]: r for r in entity_card(trip).collect()}
    a = out["a"]
    assert (a["n_triples"], a["n_preds"], a["n_objs"]) == (3, 2, 2)
    assert (a["top_pred"], a["top_pred_n"]) == ("p1", 2)
    assert a["top_share_ppm"] == 2 * 1000000 // 3
    # b: tie at n=1 breaks toward the lexicographically larger pred
    b = out["b"]
    assert (b["top_pred"], b["top_pred_n"], b["top_share_ppm"]) == (
        "p2", 1, 500000)
    assert (b["n_triples"], b["n_preds"], b["n_objs"]) == (2, 2, 2)
