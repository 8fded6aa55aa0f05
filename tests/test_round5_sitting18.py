"""Eighteenth-sitting operators: Nelson-Aalen survival hazard, +1/−1
peak-concurrency sweep, per-dim int8 quantization audit."""
import datetime


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
          u, "click", 0.0, "{}")
         for i, (u, s) in enumerate(rows)],
        schema="event_id long, ts timestamp, user_id long, "
               "event_type string, value double, props string")


def test_survival_hazard_censoring_and_grid(spark):
    """Four users against a day-30 horizon (censor window 7 days):
    lifetimes 2 (churn), 28 (censored), 0 (censored, at horizon), and
    0 (churn) — the hazard terms and the additive cumulative ride the
    ppm grid exactly."""
    from deepref_spark.operators.events import survival_hazard

    day = 86400
    rows = (
        [("A", 0), ("A", 2 * day)]            # lifetime 2, last=day2 churn
        + [("B", 0), ("B", 28 * day)]          # lifetime 28, censored
        + [("C", 30 * day)]                    # lifetime 0, at horizon
        + [("D", 0)]                           # lifetime 0, churn
    )
    rows = [(ord(u), s) for u, s in rows]
    got = {r["t_days"]: r for r in
           survival_hazard(_events_df(spark, rows)).collect()}
    assert set(got) == {0, 2, 28}
    t0 = got[0]
    assert (t0["n_at_risk"], t0["d_churned"], t0["c_censored"]) == (4, 1, 1)
    assert t0["hazard_ppm"] == 1_000_000 // 4
    t2 = got[2]
    assert (t2["n_at_risk"], t2["d_churned"]) == (2, 1)
    assert t2["hazard_ppm"] == 1_000_000 // 2
    assert t2["cum_hazard_ppm"] == 250_000 + 500_000
    t28 = got[28]
    assert (t28["n_at_risk"], t28["d_churned"], t28["c_censored"]) == (1, 0, 1)
    assert t28["cum_hazard_ppm"] == 750_000  # censoring adds no hazard


def test_peak_concurrency_sweep_exclusive_ends(spark):
    """Three overlapping intervals peak at 3 exactly when the two
    later users join; an interval starting the second another's
    exclusive end lands does NOT overlap it."""
    from deepref_spark.operators.events import peak_concurrency

    rows = [
        (1, 0), (1, 10),    # u1 interval [0, 11)
        (2, 5), (2, 15),    # u2 interval [5, 16)
        (3, 5), (3, 8),     # u3 interval [5, 9)
        (4, 11), (4, 12),   # u4 [11, 13): starts AT u1's exclusive end
    ]
    r = peak_concurrency(_events_df(spark, rows)).collect()
    assert len(r) == 1
    row = r[0]
    base = int(datetime.datetime(
        2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp())
    assert row["n_intervals"] == 4
    assert row["peak_concurrency"] == 3
    assert row["peak_at_sec"] == base + 5
    # sanity on exclusivity: at sec 11 conc is u2+u4 = 2, not 3


def test_quantize_int8_codes_and_error(spark):
    """Known 2-dim corpus: codes are the half-up rounding of
    127*u/amax, the saturation count sees both ±amax hits, and the
    mean-abs-error grid matches the hand formula."""
    from deepref_spark.operators.similarity import quantize_int8_audit

    vecs = [(1, [1.0, -0.5]), (2, [0.5, 0.25]), (3, [-1.0, 0.5])]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in vecs],
        schema="vec_id long, embedding array<float>, label int")
    got = {r["dim"]: r for r in quantize_int8_audit(df).collect()}
    d0 = got[0]
    # dim0 u = {1000, 500, -1000}, amax 1000 -> codes {127, 64, -127}
    assert d0["amax_u"] == 1000 and d0["n_saturated"] == 2
    assert d0["sat_ppm"] == 2 * 1_000_000 // 3
    se = abs(127 * 500 - 64 * 1000)  # only the 0.5 vector has error
    assert d0["mean_abs_err_micro"] == \
        (2000 * se + 127 * 3) // (2 * 127 * 3)
    d1 = got[1]
    # dim1 u = {-500, 250, 500}, amax 500 -> codes {-127, 64, 127}
    assert d1["amax_u"] == 500 and d1["n_saturated"] == 2
    assert abs(127 * 250 - 64 * 500) == 250  # half-up rounds 63.5 -> 64


def test_reciprocity_dyad_census(spark):
    """Mutual pair + one-way edge under p, a lone q edge, and a
    self-loop that must drop."""
    from deepref_spark.operators.graph import reciprocity

    spo = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "a"), ("a", "p", "c"),
         ("a", "q", "b"), ("d", "p", "d")],
        schema="subj string, pred string, obj string")
    got = {r["pred"]: r for r in reciprocity(spo).collect()}
    p = got["p"]
    assert (p["n_edges"], p["n_mutual_edges"], p["n_dyads"],
            p["n_mutual_dyads"]) == (3, 2, 2, 1)
    assert p["reciprocity_ppm"] == 2 * 1_000_000 // 3
    q = got["q"]
    assert (q["n_edges"], q["n_mutual_edges"], q["n_dyads"]) == (1, 0, 1)


def test_rich_club_clique_plus_pendant(spark):
    """K4 clique {a,b,c,d} with pendant e-a: the k=1 and k=2 clubs are
    the clique at density 1.0; above the max degree the club empties."""
    from deepref_spark.operators.graph import rich_club

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d"), ("e", "a")],
        schema="src string, dst string")
    got = {r["k"]: r for r in rich_club(edges).collect()}
    assert set(got) == {1, 2, 4, 8, 16}
    for k in (1, 2):
        assert (got[k]["n_club"], got[k]["e_club"]) == (4, 6)
        assert got[k]["phi_ppm"] == 2 * 6 * 1_000_000 // (4 * 3)
    for k in (4, 8, 16):
        assert (got[k]["n_club"], got[k]["e_club"], got[k]["phi_ppm"]) == \
            (0, 0, 0)


def test_bigram_lm_hand_model(spark):
    """Four docs, hand-built MLE bigram model: nats are the exact
    round(ln*1e6) grid values and the single-token doc emits no row."""
    import math
    from deepref_spark.operators.text_analysis import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b"), (3, "c"), (4, "a a b")],
        schema="doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert set(got) == {1, 2, 4}  # doc 3 has no bigrams
    n_ab = round(math.log(5 / 4) * 1e6)   # C(a)=5, C(a,b)=4
    n_aa = round(math.log(5 / 1) * 1e6)
    assert got[1]["n_bigrams"] == 4
    assert got[1]["xent_nats"] == round(n_ab * 2 / 4 / 1e6, 6)  # ba scores 0
    assert got[2]["xent_nats"] == round(n_ab / 1e6, 6)
    assert got[4]["xent_nats"] == round((n_aa + n_ab) / 2 / 1e6, 6)


def test_acf_perfect_period_two(spark):
    """Alternating 4,0,4,0,... hourly counts: lag-2 correlation is
    exactly +1, lag-1 exactly -1; the zero-filled spine supplies the
    empty hours."""
    from deepref_spark.operators.events import acf_profile

    rows = []
    eid = 0
    for hour in range(0, 12, 2):  # events only in even hours
        for _ in range(4):
            rows.append((eid, hour * 3600 + eid % 3600))
            eid += 1
    df = _events_df(spark, [(1, s) for _, s in rows])
    got = {r["lag"]: r for r in
           acf_profile(df, lags=(1, 2)).collect()}
    assert got[1]["n_pairs"] == 10 and got[2]["n_pairs"] == 9
    assert got[1]["acf"] == -1.0
    assert got[2]["acf"] == 1.0


def test_returned_revenue_pushdown_and_grid(spark):
    """Only R lineitems count; revenue is cents x (100 - pct) exactly;
    ranking is (revenue DESC, custkey)."""
    from deepref_spark.operators.relational import returned_item_revenue

    cust = spark.createDataFrame(
        [(1, "alice", 0, 0.0, "BUILDING"), (2, "bob", 0, 0.0, "AUTO")],
        schema="c_custkey long, c_name string, c_nationkey long, "
               "c_acctbal double, c_mktsegment string")
    orders = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 2)],
        schema="o_orderkey long, o_custkey long")
    li = spark.createDataFrame(
        [(10, "R", 100.0, 0.10), (10, "N", 999.0, 0.0),
         (11, "R", 50.0, 0.0), (12, "R", 60.0, 0.5)],
        schema="l_orderkey long, l_returnflag string, "
               "l_extendedprice double, l_discount double")
    got = returned_item_revenue(cust, orders, li, k=10).collect()
    by = {r["c_custkey"]: r for r in got}
    # alice: 100.00 -> 10000c x 90 = 900000; the N row is excluded
    assert by[1]["revenue_e4"] == 10000 * 90
    assert by[1]["n_orders"] == 1
    # bob: 5000c x 100 + 6000c x 50 = 500000 + 300000
    assert by[2]["revenue_e4"] == 5000 * 100 + 6000 * 50
    assert by[2]["n_orders"] == 2
    assert [r["c_custkey"] for r in got] == [1, 2]  # 900000 > 800000


def test_ocr_garbage_signal_families(spark):
    """Mixed-alnum, consonant-run, and symbol tokens each count once;
    clean prose with quotes/punctuation stays clean; the any-signal
    union never double-counts a token."""
    from deepref_spark.operators.text_analysis import ocr_garbage_stats

    docs = spark.createDataFrame(
        [(1, "normal prose here."),
         (2, "q7x9z2 zzxkqwv ab##cd ok"),
         (3, "it's a \"quoted\" word, fine (see) - ok!"),
         (4, "q9z2xkqwv")],  # mixed AND run: one garbage token
        schema="doc_id long, text string")
    got = {r["doc_id"]: r for r in ocr_garbage_stats(docs).collect()}
    assert got[1]["n_garbage"] == 0 and got[1]["flagged"] == 0
    r2 = got[2]
    assert (r2["n_mixed"], r2["n_runs"], r2["n_weird"]) == (1, 1, 1)
    assert r2["n_garbage"] == 3 and r2["garbage_ppm"] == 750000
    assert r2["flagged"] == 1
    assert got[3]["n_garbage"] == 0  # quotes/punct are prose, not junk
    r4 = got[4]
    assert (r4["n_mixed"], r4["n_runs"], r4["n_garbage"]) == (1, 1, 1)


def test_props_rollup_nulls_and_grid(spark):
    """Missing / malformed props count as null; the mean rides the
    milli grid over non-null rows only."""
    from deepref_spark.operators.events import props_rollup

    rows = [
        (1, "click", '{"k": 10}'), (2, "click", '{"k": 21}'),
        (3, "click", '{}'), (4, "view", '{"k": 0}'),
        (5, "view", None),
    ]
    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1), 1, t, 0.0, p)
         for i, t, p in rows],
        schema="event_id long, ts timestamp, user_id long, "
               "event_type string, value double, props string")
    got = {r["event_type"]: r for r in props_rollup(df).collect()}
    c = got["click"]
    assert (c["n_events"], c["n_null"], c["sum_k"]) == (3, 1, 31)
    assert c["null_ppm"] == 1_000_000 // 3
    assert c["mean_k_milli"] == (2000 * 31 + 2) // 4  # 15.5 -> 15500
    v = got["view"]
    assert (v["n_null"], v["mean_k_milli"]) == (1, 0)
    assert v["min_k"] == 0 and v["max_k"] == 0


def test_srm_check_chi2_grid(spark):
    """A 40/60 split of 100 users has chi2 = 4.0 > 3.841 -> flag; a
    50/50 split never flags. Arms are forced via a pre-armed frame by
    monkeypatching is unnecessary: we verify the statistic through
    the public API on a hash-split corpus and pin the formula
    directly."""
    from deepref_spark.operators.events import srm_check

    rows = [(u, 0) for u in range(200)]
    df = _events_df(spark, rows)
    got = srm_check(df).collect()[0]
    n0, n1 = got["n0"], got["n1"]
    assert n0 + n1 == 200 == got["n_users"]
    d = n0 - n1
    assert got["chi2_milli"] == (2000 * d * d + 200) // 400
    assert got["srm_flag"] == int(got["chi2_milli"] > 3841)
    # formula pin: the 40/60-of-100 textbook case is exactly 4.0
    assert (2000 * 20 * 20 + 100) // 200 == 4000


def test_cov_topk_hand_pairs(spark):
    """3-vector corpus with dims {0,1} perfectly correlated and dim 2
    constant: the (0,1) pair ranks first with cov = population
    covariance, and constant dims produce zero covariance."""
    from deepref_spark.operators.similarity import cov_topk

    vecs = [[1.0, 2.0, 5.0], [2.0, 4.0, 5.0], [3.0, 6.0, 5.0]]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        schema="vec_id long, embedding array<float>, label int")
    got = cov_topk(df, dim=3, k=3).collect()
    top = got[0]
    assert (top["d1"], top["d2"]) == (0, 1)
    # u1={1000,2000,3000}, u2={2000,4000,6000}: cov_num = 3*28e6k... do exact
    s1, s2 = 6000, 12000
    s12 = 1000 * 2000 + 2000 * 4000 + 3000 * 6000
    cov_num = 3 * s12 - s1 * s2
    assert top["cov"] == round(cov_num / 9 / 1e6, 6)
    zeros = [r for r in got if r["d2"] == 2 or r["d1"] == 2]
    assert all(r["cov"] == 0.0 for r in zeros)


def test_cuped_theta_and_adjustment(spark):
    """Pooled theta = cov(pre,post)/var(pre) on exact moments; the
    per-arm adjustment subtracts theta * (arm pre-mean - pooled
    pre-mean). Verified against a numpy recomputation on the same
    hash-armed users."""
    from deepref_spark.operators.events import cuped_report
    from deepref_spark.portable import md5_mod
    import hashlib

    # 40 users x a pre/post pattern correlated by construction: user u
    # emits (u % 5) events in the first half and (u % 5) + (u % 3) in
    # the second half.
    rows = []
    for u in range(40):
        for i in range(u % 5):
            rows.append((u, 1000 + i))           # pre half
        for i in range((u % 5) + (u % 3)):
            rows.append((u, 90000 + i))          # post half
    rows.append((99, 0))        # pin s0
    rows.append((99, 180000))   # pin s1 -> mid = 90000
    df = _events_df(spark, rows)
    got = {r["arm"]: r for r in cuped_report(df).collect()}

    def arm_of(u):
        h = hashlib.md5(str(u).encode()).hexdigest()
        return (ord(h[0]) * 131071 + ord(h[1]) * 8191
                + ord(h[2]) * 127 + ord(h[3])) % 2

    # users emitting zero events in both halves (u % 15 == 0) never
    # reach the per-user frame — exclude them from the reference too
    pre = {u: (u % 5) for u in range(40) if (u % 5) + (u % 3) > 0}
    pre[99] = 1
    post = {u: (u % 5) + (u % 3) for u in pre if u != 99}
    post[99] = 1
    us = sorted(pre)
    n = len(us)
    sx = sum(pre[u] for u in us); sy = sum(post[u] for u in us)
    sxy = sum(pre[u] * post[u] for u in us)
    sxx = sum(pre[u] ** 2 for u in us)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    for arm in (0, 1):
        a_us = [u for u in us if arm_of(u) == arm]
        na = len(a_us)
        mean_post = sum(post[u] for u in a_us) / na
        adj = mean_post - theta * (sum(pre[u] for u in a_us) / na - sx / n)
        assert got[arm]["n_users"] == na
        assert got[arm]["theta"] == round(theta, 6)
        assert got[arm]["adj_mean"] == round(adj, 6)


def test_schema_completeness_cells(spark):
    """Two entities share the class {S:p}; one also asserts q ->
    wait, asserting q would change its signature. Verify instead: a
    3-member class where all assert p (ppm 1e6) and the class keyed
    by {O:p} never appears as a subject row; singleton classes are
    suppressed."""
    from deepref_spark.operators.kgquality import schema_completeness

    spo = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "x"), ("c", "p", "y"),
         ("d", "q", "x")],
        schema="subj_canon string, pred string, obj_canon string")
    rows = schema_completeness(spo).collect()
    cells = {(r["signature"], r["pred"]): r for r in rows}
    assert (("S:p", "p") in cells)
    c = cells[("S:p", "p")]
    assert (c["n_entities"], c["n_with"], c["coverage_ppm"]) == \
        (3, 3, 1_000_000)
    # x is in class {O:p O:q} (size 1) and y in {O:p} (size 1): both
    # suppressed; d's class {S:q} is a singleton too
    assert all(sig == "S:p" for sig, _ in cells)


def test_bucket_advisor_pow2_and_salt(spark):
    """600 rows on a uniform key -> 1 bucket at target 1000; the same
    rows at target 100 -> next pow2 of 6 = 8; a 50%-hot key trips the
    salt flag."""
    from deepref_spark.operators.lakeops import bucket_advisor

    rows = [(i % 300, i % 7, 0 if i < 300 else i) for i in range(600)]
    df = spark.createDataFrame(
        rows, schema="l_orderkey long, l_partkey long, l_suppkey long")
    got = {r["key_col"]: r for r in bucket_advisor(
        df, ["l_orderkey", "l_partkey", "l_suppkey"],
        target_rows=100).collect()}
    ok = got["l_orderkey"]
    assert (ok["n_rows"], ok["n_distinct"], ok["rec_buckets"]) == (600, 300, 8)
    assert ok["salt_flag"] == 0
    sk = got["l_suppkey"]  # key 0 holds 300/600 rows = 50%
    assert sk["top_cnt"] == 300 and sk["top_share_ppm"] == 500000
    assert sk["salt_flag"] == 1
    got1k = {r["key_col"]: r for r in bucket_advisor(
        df, ["l_orderkey"], target_rows=1000).collect()}
    assert got1k["l_orderkey"]["rec_buckets"] == 1


def test_top_supplier_tie_semantics(spark):
    """Two suppliers tied at the max both emit (the Q15 view
    semantics); out-of-quarter rows are excluded."""
    from deepref_spark.operators.relational import top_supplier_quarter

    supp = spark.createDataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (3, "s3", 0, 0.0)],
        schema="s_suppkey long, s_name string, s_nationkey long, "
               "s_acctbal double")
    li = spark.createDataFrame(
        [(1, 100.0, 0.0, datetime.datetime(1997, 8, 1)),
         (2, 50.0, 0.0, datetime.datetime(1997, 8, 1)),
         (2, 50.0, 0.0, datetime.datetime(1997, 9, 1)),
         (3, 999.0, 0.0, datetime.datetime(1996, 1, 1))],  # out of range
        schema="l_suppkey long, l_extendedprice double, "
               "l_discount double, l_shipdate timestamp")
    got = sorted(top_supplier_quarter(supp, li).collect(),
                 key=lambda r: r["s_suppkey"])
    assert [r["s_suppkey"] for r in got] == [1, 2]
    assert all(r["total_rev_e4"] == 10000 * 100 for r in got)


def test_collocations_hand_pmi(spark):
    """'x y' always adjacent in a filler corpus: the pair passes the
    support floor and its PMI matches the hand formula over the exact
    pair/unigram counts."""
    import math
    from deepref_spark.operators.text_analysis import collocations

    docs = spark.createDataFrame(
        [(i, "x y filler" + str(i % 3)) for i in range(6)],
        schema="doc_id long, text string")
    got = collocations(docs, k=5, min_count=5).collect()
    top = {(r["w1"], r["w2"]): r for r in got}
    assert ("x", "y") in top
    r = top[("x", "y")]
    # per doc: tokens [x, y, fillerK] -> d1 pairs (x,y),(fillerK,y);
    # d2 pairs (fillerK, x). Np = 18, Nt = 18, c12(x,y) = 6,
    # c1(x) = 6, c2(y) = 6
    assert (r["c12"], r["c1"], r["c2"]) == (6, 6, 6)
    pmi = math.log(6 * 18 * 18 / (18 * 6 * 6)) * 1e6
    assert r["pmi_x1e6"] == round(pmi)


def test_knn_purity_planted_clusters(spark):
    """Two well-separated label clusters -> every 1-NN stays in its
    cluster, purity 1e6 for both labels."""
    from deepref_spark.operators.similarity import knn_label_purity

    vecs = []
    for i in range(6):
        base = [0.0] * 8
        base[0] = 1.0 + i * 0.001
        vecs.append((i, base, 0))
    for i in range(6):
        base = [0.0] * 8
        base[7] = 1.0 + i * 0.001
        vecs.append((10 + i, base, 1))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in vecs],
        schema="vec_id long, embedding array<float>, label int")
    got = {r["label"]: r for r in knn_label_purity(df, sample_n=12).collect()}
    assert got[0]["purity_ppm"] == 1_000_000
    assert got[1]["purity_ppm"] == 1_000_000
    assert got[0]["n_queries"] + got[1]["n_queries"] == 12


def test_centralization_star_and_cycle(spark):
    """A 4-node star centralizes to exactly 1.0; a 4-cycle (regular)
    to 0.0."""
    from deepref_spark.operators.graph import degree_centralization

    star = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c")], schema="src string, dst string")
    r = degree_centralization(star).collect()[0]
    assert (r["n_nodes"], r["max_deg"]) == (4, 3)
    # sum(dmax - di) = (3-3) + 3*(3-1) = 6; (n-1)(n-2) = 6 -> 1.0
    assert r["centralization_ppm"] == 1_000_000
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        schema="src string, dst string")
    r2 = degree_centralization(cyc).collect()[0]
    assert r2["centralization_ppm"] == 0


def test_norm_outliers_planted_defects(spark):
    """A zeroed row and a double-scaled row outrank the healthy
    cluster, with signed z (negative for the zero row)."""
    from deepref_spark.operators.similarity import norm_outliers

    vecs = [(i, [1.0, 1.0, 1.0, 1.0], 0) for i in range(8)]
    vecs.append((100, [0.0, 0.0, 0.0, 0.0], 1))   # zeroed
    vecs.append((101, [2.0, 2.0, 2.0, 2.0], 1))   # double-scaled
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in vecs],
        schema="vec_id long, embedding array<float>, label int")
    got = norm_outliers(df, k=3).collect()
    ids = [r["vec_id"] for r in got]
    assert set(ids[:2]) == {100, 101}
    z = {r["vec_id"]: r["z"] for r in got}
    assert z[100] < 0 < z[101]
    n2 = {r["vec_id"]: r["norm2"] for r in got}
    assert n2[101] == 4 * 2000 * 2000 and n2[100] == 0


def test_big_orders_having_joinback(spark):
    """Only the order beating the quantity floor survives to the dim
    joins; grids are exact cents."""
    from deepref_spark.operators.relational import big_orders

    cust = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], schema="c_custkey long, c_name string")
    orders = spark.createDataFrame(
        [(10, 1, datetime.datetime(1997, 1, 1), 1234.56),
         (11, 2, datetime.datetime(1997, 2, 1), 10.0)],
        schema="o_orderkey long, o_custkey long, o_orderdate timestamp, "
               "o_totalprice double")
    li = spark.createDataFrame(
        [(10, 150.0), (10, 100.0), (11, 10.0)],
        schema="l_orderkey long, l_quantity double")
    got = big_orders(cust, orders, li, qty_cents_min=20000).collect()
    assert len(got) == 1
    r = got[0]
    assert r["o_orderkey"] == 10 and r["c_name"] == "alice"
    assert r["sum_qty_cents"] == 25000
    assert r["totalprice_cents"] == 123456
    assert r["o_orderdate"] == "1997-01-01"
