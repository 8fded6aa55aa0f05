"""Sitting-26 operators: TPC-H Q6 revenue delta, exact two-sample
Kolmogorov-Smirnov test, and NDCG@k ANN retrieval eval — exact
expected values on tiny hand-checked inputs, independent of the
DuckDB oracle sweep."""

import pyspark.sql.functions as F

from deepref_spark.operators.events import ks_test
from deepref_spark.operators.relational import revenue_delta
from deepref_spark.operators.similarity import ann_ndcg_eval, ndcg_weights


# --- revenue_delta (TPC-H Q6) ------------------------------------------------

def _lineitem(spark, rows):
    # rows: (shipdate, extendedprice, discount, quantity)
    return (
        spark.createDataFrame(
            [(f"{d} 00:00:00", p, disc, q) for d, p, disc, q in rows],
            schema=("l_shipdate string, l_extendedprice double, "
                    "l_discount double, l_quantity double"))
        .withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    )


def test_revenue_delta_filters_and_grid(spark):
    rows = [
        ("1996-06-01", 100.00, 0.06, 10.0),   # in: 10000 * 6 = 60000
        ("1996-06-01", 50.00, 0.05, 23.0),    # in: 5000 * 5 = 25000
        ("1996-06-01", 100.00, 0.04, 10.0),   # out: discount below band
        ("1996-06-01", 100.00, 0.08, 10.0),   # out: discount above band
        ("1996-06-01", 100.00, 0.06, 24.0),   # out: quantity not < 24
        ("1995-12-31", 100.00, 0.06, 10.0),   # out: shipped before year
        ("1997-01-01", 100.00, 0.06, 10.0),   # out: shipped after year
    ]
    [r] = revenue_delta(_lineitem(spark, rows), year=1996).collect()
    assert r["n_rows"] == 2
    assert r["rev_e4"] == 85000


def test_revenue_delta_empty_year_is_zero_row(spark):
    rows = [("1996-06-01", 100.00, 0.06, 10.0)]
    [r] = revenue_delta(_lineitem(spark, rows), year=1998).collect()
    assert r["n_rows"] == 0
    assert r["rev_e4"] is None  # sum over empty set


# --- ks_test -----------------------------------------------------------------

def _events_vals(spark, vals_a, vals_b, type_a="click", type_b="purchase"):
    rows = [(i, "2024-01-01 00:00:00", 1, type_a, float(v))
            for i, v in enumerate(vals_a)]
    rows += [(1000 + i, "2024-01-01 00:00:00", 2, type_b, float(v))
             for i, v in enumerate(vals_b)]
    return (
        spark.createDataFrame(
            rows, schema=("event_id long, ts string, user_id long, "
                          "event_type string, value double"))
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_ks_shifted_samples(spark):
    # A = {1,2,3}, B = {2,3,4}: F_A - F_B maxes at x=1 with 1/3.
    # d_num = |cumA*nB - cumB*nA| = |1*3 - 0*3| = 3 at cents 100.
    df = _events_vals(spark, [1, 2, 3], [2, 3, 4])
    [r] = ks_test(df).collect()
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["at_cents"] == 100
    assert r["d_num"] == 3
    assert r["d_ppm"] == 333333  # 3 * 1e6 div 9


def test_ks_identical_samples_is_zero(spark):
    df = _events_vals(spark, [1, 2, 2, 5], [1, 2, 2, 5])
    [r] = ks_test(df).collect()
    assert r["d_num"] == 0
    assert r["d_ppm"] == 0


def test_ks_disjoint_samples_is_one(spark):
    # A entirely below B: D = 1 attained at A's max.
    df = _events_vals(spark, [1, 2], [10, 11, 12])
    [r] = ks_test(df).collect()
    assert r["d_num"] == 2 * 3  # cumA*nB - 0 at cents 200
    assert r["at_cents"] == 200
    assert r["d_ppm"] == 1_000_000


def test_ks_argmax_tie_takes_smallest_cents(spark):
    # A = {1}, B = {3}: the gap |1*1 - 0*1| = 1 holds at cents 100 and
    # 200... only distinct observed values form the support: {100, 300};
    # at 100 the gap is 1, at 300 it is 0 — argmax unique here, so use
    # duplicated gap instead: A = {1, 3}, B = {2, 4} gives gap 1*2-0=2
    # at 100 and |2*2-1*2|=2 at 200 -> ties at cents 100 and 200 (on
    # the numerator grid nA=nB=2: d_num=2 at both); smallest cents wins.
    df = _events_vals(spark, [1, 3], [2, 4])
    [r] = ks_test(df).collect()
    assert r["d_num"] == 2
    assert r["at_cents"] == 100


# --- ann_ndcg_eval -----------------------------------------------------------

def test_ndcg_weights_table():
    w = ndcg_weights(5)
    assert w == [1000000, 630930, 500000, 430677, 386853]
    assert all(a > b for a, b in zip(w, w[1:]))  # strictly decreasing


def _emb(spark, rows):
    # rows: (vec_id, [floats], label)
    return spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int")


def test_ndcg_perfect_and_partial(spark):
    # n_lists=1, nprobe=1 -> IVF degenerates to exact ranking by
    # (cosine 4dp desc, nbr_id asc). Query 0 (label 0) against five
    # corpus vectors: ranks by cosine are v1, v2, v3, v4, v5.
    # Labels: v1=0, v2=1, v3=0, v4=1, v5=1 -> rel = [1,0,1,0,0],
    # dcg = w1 + w3. r_total (corpus label-0 excl. query) = 2 ->
    # idcg = w1 + w2.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),       # query
        (1, [0.9, 0.1, 0.0, 0.0], 0),       # nearest
        (2, [0.8, 0.2, 0.0, 0.0], 1),
        (3, [0.7, 0.3, 0.0, 0.0], 0),
        (4, [0.6, 0.4, 0.0, 0.0], 1),
        (5, [0.5, 0.5, 0.0, 0.0], 1),
    ]
    emb = _emb(spark, rows)
    qs = emb.where("vec_id = 0")
    [r] = ann_ndcg_eval(emb, qs, k=5, n_lists=1, nprobe=1).collect()
    w = ndcg_weights(5)
    assert r["label"] == 0
    assert r["n_rel_at_k"] == 2
    assert r["dcg_units"] == w[0] + w[2]
    assert r["idcg_units"] == w[0] + w[1]
    assert r["ndcg_ppm"] == (w[0] + w[2]) * 1_000_000 // (w[0] + w[1])


def test_ndcg_singleton_label_class_zeroes(spark):
    # Query's label appears ONLY on the query itself: r_total = 0,
    # idcg = 0, ndcg_ppm = 0 (not a division error).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 7),       # query, unique label
        (1, [0.9, 0.1, 0.0, 0.0], 1),
        (2, [0.8, 0.2, 0.0, 0.0], 1),
    ]
    emb = _emb(spark, rows)
    qs = emb.where("vec_id = 0")
    [r] = ann_ndcg_eval(emb, qs, k=5, n_lists=1, nprobe=1).collect()
    assert r["n_rel_at_k"] == 0
    assert r["idcg_units"] == 0
    assert r["ndcg_ppm"] == 0


# --- walk_skipgram_pairs -------------------------------------------------------

def test_skipgram_pairs_chain(spark):
    # chain a->b->c: out-degree <= 1 everywhere, so the hash chooser
    # has a single option and walks are fully determined.
    # a's 2 walks: [a,b,c]; b's 2 walks: [b,c]; c's: [c] (no pairs).
    from deepref_spark.operators.graph import walk_skipgram_pairs

    edges = spark.createDataFrame([("a", "b"), ("b", "c")],
                                  schema="src string, dst string")
    got = {(r["center"], r["context"]): (r["n_pairs"], r["w_units"])
           for r in walk_skipgram_pairs(edges, walks_per_node=2,
                                        walk_len=3, window=2).collect()}
    U = 1_000_000_000
    assert got[("a", "b")] == (2, 2 * U)
    assert got[("a", "c")] == (2, 2 * (U // 2))
    assert got[("b", "a")] == (2, 2 * U)
    assert got[("b", "c")] == (4, 4 * U)       # 2 from a's walks + 2 from b's
    assert got[("c", "a")] == (2, 2 * (U // 2))
    assert got[("c", "b")] == (4, 4 * U)
    assert len(got) == 6


def test_skipgram_window_bounds(spark):
    # path a->b->c->d with window 1: only adjacent steps pair up, so
    # (a, c) must NOT appear even though both sit in a's walk.
    from deepref_spark.operators.graph import walk_skipgram_pairs

    edges = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "d")],
                                  schema="src string, dst string")
    got = {(r["center"], r["context"]) for r in
           walk_skipgram_pairs(edges, walks_per_node=1, walk_len=3,
                               window=1).collect()}
    assert ("a", "c") not in got
    assert ("a", "b") in got and ("b", "c") in got and ("c", "d") in got


# --- backoff_lm_score ----------------------------------------------------------

def _docs(spark, rows):
    # rows: (doc_id, text, source)
    return spark.createDataFrame(
        rows, schema="doc_id long, text string, source string")


def test_backoff_all_four_tiers(spark):
    from deepref_spark.operators.text_analysis import backoff_lm_score

    docs = _docs(spark, [
        (0, "x y z w", "a"),          # training corpus: N = 4 tokens
        (1, "x y z", "h"),            # tri tier: c123=1, c12=1 -> 1e6
        (2, "q y z", "h"),            # bi tier: c23(y,z)=1, c2(y)=1 -> 400000
        (3, "x y w", "h"),            # uni tier: c3(w)=1, N=4 -> 40000
        (4, "y z q q", "h"),          # oov tier twice -> 0
    ])
    got = {r["doc_id"]: r for r in
           backoff_lm_score(docs, held_out_source="h").collect()}
    assert got[1]["n_tri"] == 1 and got[1]["n_hit3"] == 1
    assert got[1]["score_ppm"] == 1_000_000
    assert got[2]["n_hit2"] == 1 and got[2]["score_ppm"] == 400_000
    assert got[3]["n_hit1"] == 1 and got[3]["score_ppm"] == 40_000
    assert got[4]["n_tri"] == 2 and got[4]["n_oov"] == 2
    assert got[4]["score_ppm"] == 0


def test_backoff_short_docs_emit_no_row(spark):
    from deepref_spark.operators.text_analysis import backoff_lm_score

    docs = _docs(spark, [
        (0, "x y z w", "a"),
        (1, "x y", "h"),              # 2 tokens: no trigram, no row
    ])
    assert backoff_lm_score(docs, held_out_source="h").count() == 0


# --- holt_linear ---------------------------------------------------------------

def _events_series(spark, day_cents, event_type="click"):
    # day_cents: {day_index: cents}; one event per present day
    rows = [(i, f"2024-01-{d + 1:02d} 06:00:00", 1, event_type, c / 100.0)
            for i, (d, c) in enumerate(sorted(day_cents.items()))]
    return (
        spark.createDataFrame(
            rows, schema=("event_id long, ts string, user_id long, "
                          "event_type string, value double"))
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_holt_rising_series(spark):
    from deepref_spark.operators.events import holt_linear

    # y = [100, 200, 300]: l1=150 b1=25; l2=(300+175)//2=237,
    # b2=(237-150+25)//2=56 -> f1=293 f2=349 f3=405
    [r] = holt_linear(_events_series(spark, {0: 100, 1: 200, 2: 300})).collect()
    assert (r["n_days"], r["level_cents"], r["trend_cents"]) == (3, 237, 56)
    assert (r["f1_cents"], r["f2_cents"], r["f3_cents"]) == (293, 349, 405)


def test_holt_negative_trend_truncates_toward_zero(spark):
    from deepref_spark.operators.events import holt_linear

    # y = [300, 100]: l1=200, b1=(200-300+0)//2 = -100 div 2 = -50
    # (truncation toward zero; floor would give -50 too — the case
    # that SEPARATES them is odd negatives, covered next)
    [r] = holt_linear(_events_series(spark, {0: 300, 1: 100})).collect()
    assert (r["level_cents"], r["trend_cents"], r["f1_cents"]) == (200, -50, 150)


def test_holt_odd_negative_halving(spark):
    from deepref_spark.operators.events import holt_linear

    # y = [300, 99]: l1=(99+300)//2=199, b1=(199-300)//2 = -101 div 2
    # = -50 under truncation toward zero (floor would give -51) — the
    # exact case where Spark div and a floored // would diverge.
    [r] = holt_linear(_events_series(spark, {0: 300, 1: 99})).collect()
    assert r["trend_cents"] == -50


def test_holt_gap_days_are_zero(spark):
    from deepref_spark.operators.events import holt_linear

    # days 0 and 2 only: day 1 is a true zero on the spine ->
    # y=[100,0,300]: l1=50 b1=-25; l2=(300+25)//2=162,
    # b2=(162-50-25)//2=43
    [r] = holt_linear(_events_series(spark, {0: 100, 2: 300})).collect()
    assert r["n_days"] == 3
    assert (r["level_cents"], r["trend_cents"]) == (162, 43)


# --- ivf_nprobe_curve ----------------------------------------------------------

def test_nprobe_curve_monotone_and_exact_at_full_probe(spark):
    from deepref_spark.operators.similarity import ivf_nprobe_curve

    # 12 vectors in 4 clusters of 3; n_lists=4. With nprobe=4 every
    # list is searched, so the IVF ranking IS brute force: recall = 1.
    rows = []
    for c in range(4):
        base = [0.0] * 4
        base[c] = 1.0
        for j in range(3):
            v = list(base)
            v[(c + 1) % 4] = 0.01 * (j + 1)
            rows.append((c * 3 + j, v, c))
    emb = _emb(spark, rows)
    qs = emb.where("vec_id % 3 = 0")
    got = {r["nprobe"]: r for r in
           ivf_nprobe_curve(emb, qs, k=3, n_lists=4,
                            nprobes=(1, 2, 4)).collect()}
    assert got[4]["recall_ppm"] == 1_000_000
    assert got[1]["recall_ppm"] <= got[2]["recall_ppm"] <= got[4]["recall_ppm"]
    assert got[1]["n_queries"] == 4


# --- mttr_report ---------------------------------------------------------------

def _events_hours(spark, hour_counts, event_type="error"):
    # hour_counts: {hour_index: n_events} on 2024-01-01
    rows, eid = [], 0
    for h, c in sorted(hour_counts.items()):
        for _ in range(c):
            rows.append((eid, f"2024-01-{h // 24 + 1:02d} {h % 24:02d}:15:00",
                         1, event_type, 1.0))
            eid += 1
    return (
        spark.createDataFrame(
            rows, schema=("event_id long, ts string, user_id long, "
                          "event_type string, value double"))
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_mttr_two_episodes(spark):
    from deepref_spark.operators.events import mttr_report

    # threshold 2: hours 0-1 alert (episode 1, 2h), hour 2 quiet (1
    # event), hours 3-5 alert (episode 2, 3h). MTBF = start3 - start0
    # = 3 hours.
    df = _events_hours(spark, {0: 3, 1: 2, 2: 1, 3: 2, 4: 5, 5: 2})
    [r] = mttr_report(df, threshold=2).collect()
    assert r["n_episodes"] == 2
    assert r["total_alert_hours"] == 5
    assert r["max_episode_hours"] == 3
    assert r["mean_episode_millih"] == 2500
    assert r["mtbf_millih"] == 3000


def test_mttr_single_episode_null_mtbf(spark):
    from deepref_spark.operators.events import mttr_report

    df = _events_hours(spark, {0: 4, 1: 4})
    [r] = mttr_report(df, threshold=2).collect()
    assert r["n_episodes"] == 1
    assert r["mtbf_millih"] is None


# --- dev_sample_report ---------------------------------------------------------

def test_dev_sample_gate_is_endpoint_conjunction(spark):
    from deepref_spark import portable
    from deepref_spark.operators.graph import dev_sample_report

    # Compute the gate in Python-free SQL terms: ask Spark which of
    # these entities pass md5 % 4 == 0, then check the edge rule.
    ents = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    gate_df = spark.createDataFrame([(e,) for e in ents], "e string") \
        .selectExpr("e", portable.md5_mod("e", 4) + " = 0 AS keep")
    keep = {r["e"]: r["keep"] for r in gate_df.collect()}
    rows = [(a, "p", b) for a in ents for b in ents if a != b]
    trip = spark.createDataFrame(
        rows, "subj_canon string, pred string, obj_canon string")
    [r] = dev_sample_report(trip, rate_den=4).collect()
    expected = sum(1 for a, _, b in rows if keep[a] and keep[b])
    assert r["n_edges"] == len(rows)
    assert r["n_kept"] == expected
    assert r["kept_ppm"] == expected * 1_000_000 // len(rows)


# --- weighted_pagerank ---------------------------------------------------------

def test_weighted_pagerank_mass_follows_weight(spark):
    from deepref_spark.operators.graph import weighted_pagerank

    # a sends 9/10 of its mass to b and 1/10 to c; with uniform
    # pagerank b and c would tie. One iteration from u=UNIT:
    # u(b) = base + 0.85 * (UNIT*9 div 10); u(c) = base + 0.85*(UNIT div 10)
    we = spark.createDataFrame([("a", "b", 9), ("a", "c", 1)],
                               schema="src string, dst string, w long")
    got = {r["entity"]: r["pagerank"]
           for r in weighted_pagerank(we, iters=1).collect()}
    U, base = 1_000_000_000, 1_000_000_000 - 850_000_000
    assert got["b"] == (base + (17 * (U * 9 // 10)) // 20) / U
    assert got["c"] == (base + (17 * (U * 1 // 10)) // 20) / U
    assert got["a"] == base / U                     # no inflow
    assert got["b"] > got["c"]


def test_weighted_pagerank_reduces_to_uniform_on_equal_weights(spark):
    from deepref_spark.operators.graph import pagerank, weighted_pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")],
        schema="src string, dst string")
    we = edges.selectExpr("src", "dst", "CAST(1 AS BIGINT) AS w")
    pu = {r["entity"]: r["pagerank"] for r in pagerank(edges, 3).collect()}
    pw = {r["entity"]: r["pagerank"]
          for r in weighted_pagerank(we, 3).collect()}
    assert pu == pw


# --- quality_keep_map ----------------------------------------------------------

def test_quality_keeper_prefers_higher_quality_member(spark):
    from deepref_spark.operators.dedup import quality_keep_map

    # Docs 1 and 2 are near-identical (one token differs), so they
    # cluster; doc 2 has the higher quality (longer, >= 10 tokens with
    # stopwords) — hand-pick texts so doc 2 wins despite higher id.
    base = ("the quick brown fox jumps over the lazy dog and then "
            "the fox sleeps near the quiet river bank today")
    docs = spark.createDataFrame(
        [(1, base.replace(" today", "")),  # shorter twin
         (2, base),
         (3, "completely unrelated text about spark shuffles")],
        schema="doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_keep_map(docs).collect()}
    assert out[1]["cluster_id"] == out[2]["cluster_id"]
    assert out[1]["best_doc_id"] == out[2]["best_doc_id"]
    # the singleton keeps itself
    assert out[3]["best_doc_id"] == 3
    # the chosen keeper has the max q_ppm of its cluster
    assert out[1]["best_q_ppm"] >= out[2]["best_q_ppm"] or \
        out[1]["best_doc_id"] == 2


# --- session_funnel ------------------------------------------------------------

def _sf_events(spark, rows):
    # rows: (event_id, ts_str, user_id, event_type)
    return (
        spark.createDataFrame(
            [(e, t, u, ty, 1.0) for e, t, u, ty in rows],
            schema=("event_id long, ts string, user_id long, "
                    "event_type string, value double"))
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_session_funnel_in_order_converts(spark):
    from deepref_spark.operators.events import session_funnel

    rows = [
        # user 1, one session: full ordered funnel
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:05:00", 1, "click"),
        (3, "2024-01-01 10:10:00", 1, "purchase"),
        # user 2: purchase BEFORE view/click -> depth stops at 1 (view
        # arrives last, click never follows it)
        (4, "2024-01-01 10:00:00", 2, "purchase"),
        (5, "2024-01-01 10:05:00", 2, "view"),
        # user 3: view then click, but purchase in a NEW session
        # (gap > 30 min) -> session 1 depth 2, session 2 depth 0
        (6, "2024-01-01 10:00:00", 3, "view"),
        (7, "2024-01-01 10:10:00", 3, "click"),
        (8, "2024-01-01 12:00:00", 3, "purchase"),
    ]
    got = {r["step"]: r for r in
           session_funnel(_sf_events(spark, rows)).collect()}
    assert got[1]["n_sessions"] == 4
    assert got[1]["n_reached"] == 3        # u1, u2, u3-s1 saw a view
    assert got[2]["n_reached"] == 2        # u1, u3-s1 clicked after view
    assert got[3]["n_reached"] == 1        # only u1 completed in-session
    assert got[3]["reach_ppm"] == 250_000


def test_session_funnel_tie_order_by_event_id(spark):
    from deepref_spark.operators.events import session_funnel

    # same timestamp: event_id breaks the tie, so view(10) before
    # click(11) converts to depth 2, but click(20) before view(21)
    # stops at depth 1.
    rows = [
        (10, "2024-01-01 10:00:00", 1, "view"),
        (11, "2024-01-01 10:00:00", 1, "click"),
        (20, "2024-01-01 10:00:00", 2, "click"),
        (21, "2024-01-01 10:00:00", 2, "view"),
    ]
    got = {r["step"]: r for r in
           session_funnel(_sf_events(spark, rows)).collect()}
    assert got[2]["n_reached"] == 1


# --- prf_expansion_report ------------------------------------------------------

def test_prf_identical_neighborhood_full_overlap(spark):
    from deepref_spark.operators.similarity import prf_expansion_report

    # One tight cluster: the feedback mean stays inside the cluster,
    # so expanded top-5 == original top-5 -> overlap 5, jaccard 1e6.
    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0], 0) for i in range(8)]
    emb = _emb(spark, rows)
    qs = emb.where("vec_id = 0")
    [r] = prf_expansion_report(emb, qs, k_fb=3, k=5).collect()
    assert r["n_overlap"] == 5
    assert r["jaccard_ppm"] == 1_000_000


def test_prf_expansion_moves_query_toward_feedback(spark):
    from deepref_spark.operators.similarity import prf_expansion_report

    # q = e1. Core cluster C (cos 0.8 to q) is the feedback; fringe F
    # sits NEAR the core direction (cos 0.96 to core) but far from q
    # (0.6); bridge B is closer to q (0.7) than F but far from core
    # (0.56). Original top-5 = 3C + 2B; expanded query = mean(C), so
    # expanded top-5 = 3C + 2F -> overlap exactly 3.
    q = [(0, [1.0, 0.0, 0.0, 0.0], 0)]
    core = [(i, [0.8, 0.6, 0.001 * i, 0.0], 0) for i in range(1, 4)]
    fringe = [(10 + i, [0.6, 0.8, 0.001 * i, 0.0], 0) for i in range(3)]
    bridge = [(20 + i, [0.7, 0.0, 0.71, 0.001 * i], 1) for i in range(2)]
    emb = _emb(spark, q + core + fringe + bridge)
    qs = emb.where("vec_id = 0")
    [r] = prf_expansion_report(emb, qs, k_fb=3, k=5).collect()
    assert r["n_overlap"] == 3
    assert r["jaccard_ppm"] == 3 * 1_000_000 // 7


# --- len_quality_corr ----------------------------------------------------------

def test_len_quality_corr_sign(spark):
    from deepref_spark.operators.text_analysis import len_quality_corr

    # Source 'pos': the 1x doc (5 tokens) misses the >= 10-token
    # length band, the 2x/3x repeats clear it -> quality rises with
    # length; source 'flat': identical docs -> zero variance -> 0.
    mk = lambda n: " ".join(["the cat is on mat"] * n)
    docs = spark.createDataFrame(
        [(1, mk(1), "pos"), (2, mk(2), "pos"), (3, mk(3), "pos"),
         (4, "same text here", "flat"), (5, "same text here", "flat")],
        schema="doc_id long, text string, source string")
    got = {r["source"]: r for r in len_quality_corr(docs).collect()}
    assert got["flat"]["len_quality_r"] == 0.0
    assert got["pos"]["n_docs"] == 3
    # quality rises with length here (len_ok band + stopword ratio
    # constant, mean-len constant): r must be positive
    assert got["pos"]["len_quality_r"] > 0.0


# --- kg_build_funnel (shape pin via the registry) --------------------------------

def test_build_funnel_is_monotone_where_expected(spark):
    from deepref_spark.queries import REGISTRY

    rows = {r["stage"]: r["n_rows"] for r in
            REGISTRY["kg_build_funnel"]["spark"](
                spark, "/root/testdata/sf0.001").collect()}
    assert rows["documents"] == 500
    # pairs >= scored-non-Other >= raw distinct triples >= canonical
    assert rows["mention_pairs"] >= rows["scored_non_other"]
    assert rows["scored_non_other"] >= rows["raw_triples"]
    assert rows["raw_triples"] >= rows["canonical_triples"]
    assert rows["entities"] > 0


# --- oov_curve -----------------------------------------------------------------

def test_oov_curve_exact_small_budgets(spark):
    from deepref_spark.operators.text_analysis import oov_curve

    # counts: a x4, b x3, c x2, d x1 -> rank a,b,c,d. budget 2:
    # OOV = c + d = 3 of 10 instances; budget 3: OOV = 1.
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b c d"), (3, "a b")],
        schema="doc_id long, text string")
    got = {r["vocab_budget"]: r
           for r in oov_curve(docs, budgets=(2, 3)).collect()}
    assert got[2]["n_types"] == 4
    assert got[2]["n_instances"] == 10
    assert got[2]["oov_instances"] == 3
    assert got[2]["oov_ppm"] == 300_000
    assert got[3]["oov_instances"] == 1


def test_oov_curve_budget_above_vocab_is_zero(spark):
    from deepref_spark.operators.text_analysis import oov_curve

    docs = spark.createDataFrame([(1, "x y z")],
                                 schema="doc_id long, text string")
    [r] = oov_curve(docs, budgets=(100,)).collect()
    assert r["oov_instances"] == 0 and r["oov_ppm"] == 0


# --- jdd_buckets ---------------------------------------------------------------

def test_jdd_star_is_hub_leaf_ridge(spark):
    from deepref_spark.operators.graph import jdd_buckets

    # 5-leaf star: hub degree 5 (bucket 2: 4 <= d < 8), leaves degree
    # 1 (bucket 0). All 5 edges land in (0, 2).
    edges = spark.createDataFrame([("h", f"l{i}") for i in range(5)],
                                  schema="src string, dst string")
    rows = jdd_buckets(edges).collect()
    assert len(rows) == 1
    assert (rows[0]["b_lo"], rows[0]["b_hi"], rows[0]["n_edges"]) == (0, 2, 5)


def test_jdd_triangle_is_diagonal(spark):
    from deepref_spark.operators.graph import jdd_buckets

    # triangle: every node degree 2 (bucket 1) -> single cell (1,1)x3.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")],
        schema="src string, dst string")
    [r] = jdd_buckets(edges).collect()
    assert (r["b_lo"], r["b_hi"], r["n_edges"]) == (1, 1, 3)


# --- churn_matrix --------------------------------------------------------------

def test_churn_matrix_label_and_axes(spark):
    from deepref_spark.operators.relational import churn_matrix

    # Customers: 1 ordered recently (recency 0), 2 ordered only >365
    # days before the max date. Same frequency/monetary everywhere ->
    # single (f,m) cell with churn 2/3.
    rows = [
        (1, "2001-06-01", 100.0), (2, "1999-01-01", 100.0),
        (3, "1999-02-01", 100.0),
    ]
    orders = (
        spark.createDataFrame(
            [(c, f"{d} 00:00:00", p) for c, d, p in rows],
            schema="o_custkey long, o_orderdate string, o_totalprice double")
        .withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    )
    out = churn_matrix(orders).collect()
    assert len(out) == 1
    [r] = out
    assert r["n_customers"] == 3
    assert r["n_churned"] == 2
    assert r["churn_ppm"] == 2 * 1_000_000 // 3


# --- anomaly_consensus ---------------------------------------------------------

def test_anomaly_consensus_counts(spark):
    from deepref_spark.operators.events import anomaly_consensus

    # 30 quiet hours at n=2, then one burst hour n=200. MAD: median 2,
    # MAD 0 -> burst flagged (198 > 0). Spike: trail = 2*24... hour 30
    # trail = sum of prior 24 hours = 48 >= 10 and 200*24 > 96 -> both
    # flag the same single hour -> n_both = 1, agreement 1e6.
    rows, eid = [], 0
    for h in range(31):
        n = 200 if h == 30 else 2
        for _ in range(n):
            rows.append((eid, f"2024-01-{h // 24 + 1:02d} {h % 24:02d}:00:00",
                         1, "error", 1.0))
            eid += 1
    df = (spark.createDataFrame(
        rows, schema=("event_id long, ts string, user_id long, "
                      "event_type string, value double"))
        .withColumn("ts", F.to_timestamp("ts")))
    [r] = anomaly_consensus(df).collect()
    assert r["n_hours"] == 31
    assert r["n_both"] >= 1
    assert r["n_mad"] >= 1 and r["n_spike"] >= 1
    if r["n_mad"] == 1 and r["n_spike"] == 1:
        assert r["agree_ppm"] == 1_000_000


# --- markdown_stats ------------------------------------------------------------

def test_markdown_stats_line_classes(spark):
    from deepref_spark.operators.text_analysis import markdown_stats

    text = "# Title\n\n- item one\n* item two\n```\ncode\n```\nprose line"
    docs = spark.createDataFrame([(1, text)],
                                 schema="doc_id long, text string")
    [r] = markdown_stats(docs).collect()
    assert r["n_lines"] == 8
    assert r["n_heading"] == 1
    assert r["n_list"] == 2
    assert r["n_fence"] == 2
    assert r["n_blank"] == 1
    assert r["heading_ppm"] == 1_000_000 // 8


def test_markdown_stats_plain_prose_is_zero(spark):
    from deepref_spark.operators.text_analysis import markdown_stats

    docs = spark.createDataFrame([(1, "just one prose line")],
                                 schema="doc_id long, text string")
    [r] = markdown_stats(docs).collect()
    assert (r["n_heading"], r["n_list"], r["n_fence"], r["n_blank"]) == \
        (0, 0, 0, 0)


# --- layout_advisor ------------------------------------------------------------

def test_layout_advisor_cardinalities(spark):
    from deepref_spark.operators.lakeops import layout_advisor

    # 2 days x 2 types, one event each + 1 extra on (d1, click):
    # day -> 2 partitions (3 + 2 rows), type -> 2 (3 + 2),
    # day_x_type -> 4 (2,1,1,1). All < 1000 -> everything small.
    rows = [
        (1, "2024-01-01 01:00:00", 1, "click", 1.0),
        (2, "2024-01-01 02:00:00", 1, "click", 1.0),
        (3, "2024-01-01 03:00:00", 1, "view", 1.0),
        (4, "2024-01-02 01:00:00", 1, "click", 1.0),
        (5, "2024-01-02 02:00:00", 1, "view", 1.0),
    ]
    df = (spark.createDataFrame(
        rows, schema=("event_id long, ts string, user_id long, "
                      "event_type string, value double"))
        .withColumn("ts", F.to_timestamp("ts")))
    got = {r["layout"]: r for r in layout_advisor(df).collect()}
    assert got["day"]["n_partitions"] == 2
    assert (got["day"]["min_rows"], got["day"]["max_rows"]) == (2, 3)
    assert got["event_type"]["n_partitions"] == 2
    assert got["day_x_type"]["n_partitions"] == 4
    assert got["day_x_type"]["max_rows"] == 2
    assert got["day_x_type"]["small_ppm"] == 1_000_000
    assert all(r["n_rows"] == 5 for r in got.values())


# --- transition_entropy --------------------------------------------------------

def test_transition_entropy_deterministic_state_is_zero(spark):
    from deepref_spark.operators.events import transition_entropy

    # user stream: a -> b, a -> b (always b after a): H(a) = 0.
    rows = [
        (1, "2024-01-01 10:00:00", 1, "a"), (2, "2024-01-01 10:01:00", 1, "b"),
        (3, "2024-01-01 10:02:00", 1, "a"), (4, "2024-01-01 10:03:00", 1, "b"),
    ]
    df = _sf_events(spark, rows)
    got = {r["from_type"]: r for r in transition_entropy(df).collect()}
    assert got["a"]["entropy_nats"] == 0.0
    assert got["a"]["n_next"] == 1
    # b -> a happens once (between the two cycles): also deterministic
    assert got["b"]["entropy_nats"] == 0.0


def test_transition_entropy_uniform_two_way(spark):
    import math

    from deepref_spark.operators.events import transition_entropy

    # from 'a': 2x to b, 2x to c -> H = ln 2 (on the per-distinct
    # round(ln*1e6) grid: both terms round(ln 2 * 1e6) = 693147).
    rows = [
        (1, "2024-01-01 10:00:00", 1, "a"), (2, "2024-01-01 10:01:00", 1, "b"),
        (3, "2024-01-01 10:02:00", 1, "a"), (4, "2024-01-01 10:03:00", 1, "c"),
        (5, "2024-01-01 10:04:00", 2, "a"), (6, "2024-01-01 10:05:00", 2, "b"),
        (7, "2024-01-01 10:06:00", 2, "a"), (8, "2024-01-01 10:07:00", 2, "c"),
    ]
    got = {r["from_type"]: r for r in
           transition_entropy(_sf_events(spark, rows)).collect()}
    assert got["a"]["n_from"] == 4 and got["a"]["n_next"] == 2
    assert abs(got["a"]["entropy_nats"] - math.log(2)) < 1e-5


# --- df_spectrum ---------------------------------------------------------------

def test_df_spectrum_buckets_and_mass(spark):
    from deepref_spark.operators.dedup import df_spectrum

    # Three docs share the shingle "x y z" (df=3 -> bucket 1);
    # each doc also has a unique shingle (df=1 -> bucket 0).
    docs = spark.createDataFrame(
        [(1, "x y z a"), (2, "x y z b"), (3, "x y z c")],
        schema="doc_id long, text string")
    got = {r["df_bucket"]: r for r in df_spectrum(docs, k=3).collect()}
    # per doc: shingles "x y z", "y z <u>" -> df=3 for "x y z",
    # df=1 for the three unique tails
    assert got[1]["n_shingles"] == 1 and got[1]["n_postings"] == 3
    assert got[0]["n_shingles"] == 3 and got[0]["n_postings"] == 3
    assert got[1]["postings_ppm"] == 500_000


# --- block_size_spectrum -------------------------------------------------------

def test_block_size_spectrum_pair_arithmetic(spark):
    from deepref_spark.operators.linking import block_size_spectrum

    # blocks: k1 x5 entities (bucket 2, 10 pairs), k2 x2 (bucket 1,
    # 1 pair), k3 x1 (bucket 0, 0 pairs).
    rows = [("k1",)] * 5 + [("k2",)] * 2 + [("k3",)]
    blocks = spark.createDataFrame(rows, "block_key string")
    got = {r["size_bucket"]: r for r in
           block_size_spectrum(blocks).collect()}
    assert got[2]["n_pairs"] == 10
    assert got[1]["n_pairs"] == 1
    assert got[0]["n_pairs"] == 0
    assert got[2]["pairs_ppm"] == 10 * 1_000_000 // 11


# --- rank_agreement ------------------------------------------------------------

def test_rank_agreement_identical_lanes(spark):
    from deepref_spark.operators.similarity import rank_agreement

    # One cluster, n_lists=1 + 8 same-sign first dims -> both lanes
    # see the whole corpus and rank identically: full overlap,
    # footrule 0.
    rows = [(i, [1.0, 0.01 * i, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0], 0)
            for i in range(8)]
    emb = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int")
    qs = emb.where("vec_id = 0")
    [r] = rank_agreement(emb, qs, k=5, n_lists=1, nprobe=1,
                         n_planes=8).collect()
    assert r["n_shared"] == 5
    assert r["footrule"] == 0


# --- transitivity_audit --------------------------------------------------------

def test_transitivity_open_and_closed_wedges(spark):
    from deepref_spark.operators.linking import transitivity_audit

    # path a-b-c (open wedge at b) + triangle x-y-z (3 closed wedges).
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z"), ("x", "z")],
        schema="a string, b string")
    [r] = transitivity_audit(edges).collect()
    assert r["n_edges"] == 5
    assert r["n_wedges"] == 4          # 1 at b + 3 in the triangle
    assert r["n_closed"] == 3
    assert r["closure_ppm"] == 750_000


def test_transitivity_no_wedges(spark):
    from deepref_spark.operators.linking import transitivity_audit

    edges = spark.createDataFrame([("a", "b"), ("c", "d")],
                                  schema="a string, b string")
    [r] = transitivity_audit(edges).collect()
    assert r["n_wedges"] == 0 and r["closure_ppm"] == 0


# --- compaction_savings --------------------------------------------------------

def test_compaction_savings_rollup(spark):
    from deepref_spark.operators.lakeops import compaction_savings

    # partition p: 4 files of 600 bytes. cum-before DIV 2048:
    # groups 0,0,0,0 -> wait cum 0,600,1200,1800 // 2048 = 0,0,0,0 ->
    # one group; add 2 more: cum 2400,3000 // 2048 = 1,1 -> 2 groups
    # of 6 files total.
    inv = spark.createDataFrame(
        [("p", f"f{i}", 600) for i in range(6)],
        schema="partition_key string, file_id string, n_bytes long")
    [r] = compaction_savings(inv, target_bytes=2048).collect()
    assert r["files_before"] == 6
    assert r["files_after"] == 2
    assert r["reduction_ppm"] == 4 * 1_000_000 // 6
    assert r["total_bytes"] == 3600
    assert r["mean_bytes_before_milli"] == 600_000
    assert r["mean_bytes_after_milli"] == 1_800_000


# --- conf_support_corr (post-capture) -----------------------------------------

def test_conf_support_corr_perfect_line(spark):
    from deepref_spark.operators.kgquality import conf_support_corr

    # y = 2x exactly (on the 1e-6 score grid): r = 1.0.
    tri = spark.createDataFrame(
        [("s1", "p", "o1", 1, 0.000002), ("s2", "p", "o2", 2, 0.000004),
         ("s3", "p", "o3", 3, 0.000006)],
        schema=("subj_canon string, pred string, obj_canon string, "
                "n_docs long, max_score double"))
    [r] = conf_support_corr(tri).collect()
    assert r["n_triples"] == 3
    assert r["support_score_r"] == 1.0


def test_conf_support_corr_constant_is_zero(spark):
    from deepref_spark.operators.kgquality import conf_support_corr

    tri = spark.createDataFrame(
        [("s1", "p", "o1", 1, 0.5), ("s2", "p", "o2", 2, 0.5)],
        schema=("subj_canon string, pred string, obj_canon string, "
                "n_docs long, max_score double"))
    [r] = conf_support_corr(tri).collect()
    assert r["support_score_r"] == 0.0     # zero y-variance guard


# --- weekend_effect (post-capture) --------------------------------------------

def test_weekend_effect_exact_ratio(spark):
    from deepref_spark.operators.events import weekend_effect

    # 2024-01-06 is a Saturday, 2024-01-08 a Monday. Weekday mean 100
    # cents (2 events of 1.00), weekend mean 300 cents (1 event of
    # 3.00) -> ratio 3.0 = 3_000_000 ppm exactly.
    rows = [
        (1, "2024-01-08 10:00:00", 1, "click", 1.00),
        (2, "2024-01-08 11:00:00", 1, "click", 1.00),
        (3, "2024-01-06 10:00:00", 1, "click", 3.00),
    ]
    df = (spark.createDataFrame(
        rows, schema=("event_id long, ts string, user_id long, "
                      "event_type string, value double"))
        .withColumn("ts", F.to_timestamp("ts")))
    [r] = weekend_effect(df).collect()
    assert (r["n_weekday"], r["n_weekend"]) == (2, 1)
    assert (r["cents_weekday"], r["cents_weekend"]) == (200, 300)
    assert r["mean_ratio_ppm"] == 3_000_000


def test_weekend_effect_missing_side_is_null(spark):
    from deepref_spark.operators.events import weekend_effect

    rows = [(1, "2024-01-08 10:00:00", 1, "view", 2.0)]  # weekday only
    df = (spark.createDataFrame(
        rows, schema=("event_id long, ts string, user_id long, "
                      "event_type string, value double"))
        .withColumn("ts", F.to_timestamp("ts")))
    [r] = weekend_effect(df).collect()
    assert r["n_weekend"] == 0
    assert r["mean_ratio_ppm"] is None


# --- degree_gini (post-capture) -----------------------------------------------

def test_degree_gini_star_vs_regular(spark):
    from deepref_spark.operators.graph import degree_gini

    # 4-leaf star: degrees [1,1,1,1,4] ascending. U = sum d*f*(2F+f+1):
    # d=1: 1*4*(0+4+1)=20; d=4: 4*1*(8+1+1)=40 -> U=60. n=5, S=8.
    # gini = (60 - 6*8)/(5*8) = 12/40 -> 300000 ppm.
    star = spark.createDataFrame([("h", f"l{i}") for i in range(4)],
                                 schema="src string, dst string")
    [r] = degree_gini(star).collect()
    assert (r["n_nodes"], r["sum_deg"]) == (5, 8)
    assert r["gini_ppm"] == 300_000
    # triangle: all degrees equal -> gini 0
    tri = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")],
                                schema="src string, dst string")
    [t] = degree_gini(tri).collect()
    assert t["gini_ppm"] == 0


# --- mattr_stats (post-capture) -----------------------------------------------

def test_mattr_windows_and_short_doc_fallback(spark):
    from deepref_spark.operators.text_analysis import mattr_stats

    # window=4: doc 1 has 8 tokens: window1 "a b a b" -> 2 distinct,
    # window2 "c d e f" -> 4 distinct; mattr = 6/8 = 750000 ppm.
    # doc 2 has 3 tokens (< window): plain TTR 2/3 with n_windows 0.
    docs = spark.createDataFrame(
        [(1, "a b a b c d e f"), (2, "x x y")],
        schema="doc_id long, text string")
    got = {r["doc_id"]: r for r in mattr_stats(docs, window=4).collect()}
    assert got[1]["n_windows"] == 2
    assert got[1]["mattr_ppm"] == 750_000
    assert got[2]["n_windows"] == 0
    assert got[2]["mattr_ppm"] == 2 * 1_000_000 // 3


def test_mattr_tail_tokens_ignored(spark):
    from deepref_spark.operators.text_analysis import mattr_stats

    # 6 tokens, window 4: ONE complete window ("a a a a" -> 1 distinct)
    # -> mattr = 1/4; the "z w" tail is excluded by design.
    docs = spark.createDataFrame([(1, "a a a a z w")],
                                 schema="doc_id long, text string")
    [r] = mattr_stats(docs, window=4).collect()
    assert r["n_windows"] == 1
    assert r["mattr_ppm"] == 250_000
