"""Unit tests for the tenth-sitting additions — exact expected values
on tiny hand-checked inputs, independent of the DuckDB oracles: the
robust MAD anomaly profile (exact inverted-CDF medians) and RAKE
keyphrase extraction (degree/frequency scoring on the ppm grid)."""

from datetime import datetime

from deepref_spark.operators.events import hourly_mad_profile
from deepref_spark.operators.text_analysis import rake_keywords


def _events(spark, rows):
    return spark.createDataFrame(
        rows, schema="ts timestamp, event_type string")


def test_hourly_mad_profile_exact(spark):
    # type a: hourly counts [1,1,1,1,1,1,10] -> median 1 (pos ceil(7/2)=4),
    # devs [0]*6+[9] -> MAD 0, so the 9-dev hour breaches |d| > 3*0
    # type b: counts [2,4,6,8] -> median 4 (pos 2 of the sorted evens),
    # devs [2,0,2,4] -> MAD 2 (pos 2 of [0,2,2,4]), 3*MAD=6 -> no breach
    rows = []
    for h, n in enumerate([1, 1, 1, 1, 1, 1, 10]):
        rows += [(datetime(2024, 1, 1, h), "a")] * n
    for h, n in enumerate([2, 4, 6, 8]):
        rows += [(datetime(2024, 1, 1, h), "b")] * n
    out = {r["event_type"]: r
           for r in hourly_mad_profile(_events(spark, rows)).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_hours"], a["median_n"], a["mad_n"]) == (7, 1, 0)
    assert (a["n_anomalies"], a["max_abs_dev"]) == (1, 9)
    assert (b["n_hours"], b["median_n"], b["mad_n"]) == (4, 4, 2)
    assert (b["n_anomalies"], b["max_abs_dev"]) == (0, 4)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        schema="doc_id string, text string")


def test_rake_keywords_exact(spark):
    # phrases after stopword ('of') and punct (',' '.') delimiting:
    #   "deep learning" x2, "deep networks" x1, "networks" x1,
    #   "quantum" x1, "computing" x1
    # word scores (deg*1e6 DIV freq): deep 6/3 -> 2e6, learning 4/2
    # -> 2e6, networks 3/2 -> 1.5e6, quantum/computing 1/1 -> 1e6
    # phrase scores: deep learning 4e6, deep networks 3.5e6,
    # networks 1.5e6, computing/quantum 1e6 (tie -> phrase asc)
    docs = _docs(spark, [
        "Deep learning of deep networks.",
        "Deep learning",
        "networks",
        "quantum, computing",
    ])
    rows = [((r["rank"]), r["phrase"], r["n_words"],
             r["n_occurrences"], r["score_ppm"])
            for r in rake_keywords(docs).orderBy("rank").collect()]
    assert rows == [
        (1, "deep learning", 2, 2, 4_000_000),
        (2, "deep networks", 2, 1, 3_500_000),
        (3, "networks", 1, 1, 1_500_000),
        (4, "computing", 1, 1, 1_000_000),
        (5, "quantum", 1, 1, 1_000_000),
    ]


def test_rake_drops_overlong_runs_entirely(spark):
    # a 5-word stopword-free run exceeds max_phrase_len=4: the phrase
    # is dropped AND its words must not leak into the degree table
    docs = _docs(spark, [
        "alpha beta gamma delta epsilon",
        "alpha zulu",
    ])
    rows = {r["phrase"]: r for r in rake_keywords(docs).collect()}
    assert set(rows) == {"alpha zulu"}
    # alpha: freq 1, deg 2 (only from the surviving 2-phrase)
    assert rows["alpha zulu"]["score_ppm"] == 4_000_000


def test_prefix_filter_equals_exhaustive(spark):
    # the prefix filter is lossless: pair-for-pair equality with the
    # exhaustive inverted-index join at the same threshold
    from deepref_spark.operators.dedup import (ngram_jaccard_pairs,
                                               prefix_filter_pairs)

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    docs = _docs(spark, [
        base,                          # 0
        base,                          # 1: exact dup of 0 (J = 1.0)
        base + " sierra",              # 2: near dup (high J)
        "completely different words here nothing shared at all ok",
    ])
    exp = sorted(tuple(r) for r in
                 ngram_jaccard_pairs(docs, k=3, threshold=0.8).collect())
    got = sorted(tuple(r) for r in
                 prefix_filter_pairs(docs, k=3, threshold=0.8).collect())
    assert got == exp
    assert ("0", "1", 1.0) in got  # the planted exact dup survived


def test_session_paths_exact(spark):
    from deepref_spark.operators.events import session_paths

    ev = spark.createDataFrame([
        # user 1, session 0: view view click -> collapsed view>click
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, "view"),
        (2, datetime(2024, 1, 1, 0, 0, 10), 1, "view"),
        (3, datetime(2024, 1, 1, 0, 0, 20), 1, "click"),
        # user 1, session 1 (2h gap): view purchase -> converted
        (4, datetime(2024, 1, 1, 2, 30, 0), 1, "view"),
        (5, datetime(2024, 1, 1, 2, 31, 0), 1, "purchase"),
        # user 2: single-event session
        (6, datetime(2024, 1, 1, 0, 0, 0), 2, "click"),
    ], schema="event_id long, ts timestamp, user_id long, "
              "event_type string")
    rows = [(r["rank"], r["path"], r["n_sessions"], r["n_converted"])
            for r in session_paths(ev).orderBy("rank").collect()]
    assert rows == [
        (1, "click", 1, 0),
        (2, "view>click", 1, 0),
        (3, "view>purchase", 1, 1),
    ]


def test_fellegi_sunter_exact(spark):
    from deepref_spark.operators.linking import fellegi_sunter

    ents = spark.createDataFrame(
        [("acme corp",), ("acme-corp",), ("acme inc",), ("zeta",)],
        schema="entity string")
    out = {(r["a"], r["b"]): r for r in fellegi_sunter(ents).collect()}
    # block 'a' holds three entities -> three pairs; 'zeta' is alone
    assert set(out) == {("acme corp", "acme-corp"),
                        ("acme corp", "acme inc"),
                        ("acme inc", "acme-corp")}
    # u-probabilities from the exact value histograms: n=4 ->
    # 12 ordered pairs; f1 and f2 each have one 2-count value (ap=2),
    # f3 has two 2-count values (ap=4)
    u1 = u2 = 2 / 12
    u3 = 4 / 12

    def ratio(a1, a2, a3):
        r = 1.0
        r = r * (0.95 / u1 if a1 else (1.0 - 0.95) / (1.0 - u1))
        r = r * (0.9 / u2 if a2 else (1.0 - 0.9) / (1.0 - u2))
        r = r * (0.8 / u3 if a3 else (1.0 - 0.8) / (1.0 - u3))
        return r

    r1 = out[("acme corp", "acme-corp")]   # same norm, diff tok, same len
    assert (r1["agree1"], r1["agree2"], r1["agree3"]) == (1, 0, 1)
    assert abs(r1["lr"] - ratio(1, 0, 1)) < 1e-5
    r2 = out[("acme corp", "acme inc")]    # diff norm, same tok, diff len
    assert (r2["agree1"], r2["agree2"], r2["agree3"]) == (0, 1, 0)
    assert abs(r2["lr"] - ratio(0, 1, 0)) < 1e-5
    r3 = out[("acme inc", "acme-corp")]
    assert (r3["agree1"], r3["agree2"], r3["agree3"]) == (0, 0, 0)
    assert abs(r3["lr"] - ratio(0, 0, 0)) < 1e-5
    # decision bands derive from the ratio (n=4 keeps u large, so the
    # two-agreement pair lands in 'possible', not 'match')
    assert ratio(1, 0, 1) >= 1.0
    assert r1["decision"] == "possible"
    assert ratio(0, 0, 0) < 1.0
    assert r3["decision"] == "non_match"


def test_maxsim_topk_exact(spark):
    # groups of 2 (width=2), query_mod=2 so g0 and g2 are queries;
    # vectors chosen so maxes are hand-checkable on the e4 grid
    from deepref_spark.operators.similarity import maxsim_topk

    emb = spark.createDataFrame([
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),      # g0 (query)
        (2, [1.0, 0.0]), (3, [0.6, 0.8]),      # g1
        (4, [0.0, 1.0]), (5, [-1.0, 0.0]),     # g2 (query, also corpus)
    ], schema="vec_id long, embedding array<double>")
    out = {(r["query_group"], r["doc_group"]): r
           for r in maxsim_topk(emb, group_width=2, k=2,
                                query_mod=2).collect()}
    # q g0 vs d g1: tok0 [1,0]: max(cos([1,0],[1,0])=1, cos([1,0],[.6,.8])=.6) = 1
    #              tok1 [0,1]: max(0, .8) = .8 -> 10000 + 8000
    assert out[(0, 1)]["maxsim_e4"] == 18000
    # q g0 vs d g2: tok0: max(0, -1) = 0; tok1: max(1, 0) = 10000
    assert out[(0, 2)]["maxsim_e4"] == 10000
    # q g2 vs d g1: tok [0,1]: max(0, .8)=.8; tok [-1,0]: max(-1,-.6)=-.6
    assert out[(2, 1)]["maxsim_e4"] == 8000 - 6000
    # ranks: per query ordered by maxsim desc
    assert out[(0, 1)]["rank"] == 1 and out[(0, 2)]["rank"] == 2


def test_rules_pca_confidence_exact(spark):
    from deepref_spark.operators.kgquality import rules_pca_confidence

    # body a->b->c (p,q); head r(a,c) holds; x2 has a body instance
    # a2->b2->c2 with NO r(a2, *) fact -> excluded from PCA denominator
    trip = spark.createDataFrame([
        ("a", "p", "b"), ("b", "q", "c"), ("a", "r", "c"),
        ("a2", "p", "b2"), ("b2", "q", "c2"),
        ("a3", "p", "b3"), ("b3", "q", "c3"), ("a3", "r", "zzz"),
    ], schema="subj_canon string, pred string, obj_canon string")
    rows = {(r["p1"], r["p2"], r["p3"]): r
            for r in rules_pca_confidence(trip, min_support=1).collect()}
    r = rows[("p", "q", "r")]
    # support: only (a, c) satisfies body+head -> 1
    # body_supp: (a,c), (a2,c2), (a3,c3) -> 3
    # pca_body: x in {a, a3} have some r-fact -> (a,c), (a3,c3) -> 2
    assert (r["support"], r["body_supp"], r["pca_body"]) == (1, 3, 2)
    assert abs(r["confidence"] - 1 / 3) < 1e-6
    assert abs(r["pca_confidence"] - 0.5) < 1e-6


def test_retention_plan_exact(spark):
    from deepref_spark.operators.lakeops import retention_plan

    inv = spark.createDataFrame([
        # partition A: files on day 1, 2, 20 (head) -> max_day=2024-01-20,
        # cutoff=2024-01-13; day1 superseded on day2 (<= cutoff: expired),
        # day2 superseded on day20 (> cutoff: retained), day20 head
        ("A", "2024-01-01", 100), ("A", "2024-01-02", 200),
        ("A", "2024-01-20", 400),
        # partition B: single head file, never expired
        ("B", "2024-01-05", 50),
    ], schema="partition_key string, file_id string, n_bytes long")
    out = {r["partition_key"]: r
           for r in retention_plan(inv, retain_days=7).collect()}
    a, b = out["A"], out["B"]
    assert a["cutoff"] == "2024-01-13"
    assert (a["n_files"], a["n_expired"]) == (3, 1)
    assert (a["total_bytes"], a["bytes_reclaimed"]) == (700, 100)
    assert (a["first_expired"], a["last_expired"]) == ("2024-01-01",
                                                       "2024-01-01")
    assert (b["n_files"], b["n_expired"], b["bytes_reclaimed"]) == (1, 0, 0)


def test_er_pipeline_plant_collapses(spark):
    # the composed blocking -> FS -> match edges -> CC pipeline must
    # fold the planted three-spelling alias group into ONE canonical
    # with n_members >= 3, and map untouched surfaces to themselves
    from deepref_spark.queries import _ALIAS_PLANT, kg_er_pipeline

    rows = {r["entity"]: r
            for r in kg_er_pipeline(
                spark, "/root/testdata/sf0.001").collect()}
    canons = {rows[s]["canonical"] for s in _ALIAS_PLANT}
    assert canons == {min(_ALIAS_PLANT)}
    assert rows[min(_ALIAS_PLANT)]["n_members"] >= 3
    # a surface with no match edge stays its own canonical
    singles = [r for r in rows.values() if r["n_members"] == 1]
    assert singles and all(r["entity"] == r["canonical"] for r in singles)
