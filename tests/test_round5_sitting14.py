"""Fourteenth-sitting operators: engagement Gini from the activity
histogram, code-vs-prose routing stats, per-source token entropy."""
import datetime
import math


def _brute_gini(counts):
    """Textbook Gini over ascending per-user counts:
    G = (2*sum i*x_i - (n+1)*sum x) / (n * sum x), integer ppm."""
    xs = sorted(counts)
    n, s = len(xs), sum(xs)
    u = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * u - (n + 1) * s) * 1000000 // max(1, n * s)


def test_gini_matches_sorted_definition(spark):
    from deepref_spark.operators.events import engagement_gini

    base = datetime.datetime(2024, 1, 1)
    # type 'u': uniform activity (gini 0); type 'k': one whale —
    # users 1..4 with 1 event each, user 5 with 16 (heavy skew, ties)
    per_user = {"u": {1: 3, 2: 3, 3: 3, 4: 3},
                "k": {1: 1, 2: 1, 3: 1, 4: 1, 5: 16}}
    rows, eid = [], 0
    for etype, m in per_user.items():
        for uid, c in m.items():
            for _ in range(c):
                rows.append((eid, base + datetime.timedelta(minutes=eid),
                             uid, etype, 1.0, "{}"))
                eid += 1
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long,"
                     " event_type string, value double, props string")
    got = {r["event_type"]: r for r in engagement_gini(df).collect()}
    assert got["u"]["n_users"] == 4 and got["u"]["n_events"] == 12
    assert got["u"]["gini_ppm"] == 0
    assert got["k"]["n_users"] == 5 and got["k"]["n_events"] == 20
    assert got["k"]["gini_ppm"] == _brute_gini([1, 1, 1, 1, 16])
    # the tie block (four users at x=1) exercises the closed
    # histogram sum c*f*(2F+f+1) — it must equal the sorted form
    assert got["k"]["gini_ppm"] == 600000


def test_code_stats_flags_code_not_prose(spark):
    from deepref_spark.operators.text_analysis import code_stats

    code = ('def main():\n    return [x for x in range(10) if x > 2]\n'
            'import sys\nclass Foo:\n    pass')
    prose = ("the quick brown fox jumps over the lazy dog and keeps "
             "running through the quiet meadow until dusk settles")
    docs = [(1, "py", code), (2, "web", prose), (3, "web", prose)]
    df = spark.createDataFrame(docs, schema="doc_id long, source string,"
                                            " text string")
    got = {r["source"]: r for r in code_stats(df).collect()}
    assert got["py"]["n_code"] == 1 and got["py"]["code_ppm"] == 1000000
    assert got["web"]["n_code"] == 0 and got["web"]["code_ppm"] == 0
    # symbol mass is the exact regexp length-diff on the ppm grid
    sym = sum(code.count(c) for c in "{}[]();=<>#_")
    assert got["py"]["mean_symbol_ppm"] == sym * 1000000 // len(code)


def test_entropy_matches_closed_form(spark):
    from deepref_spark.operators.text_analysis import entropy_stats

    def units(x):
        return math.floor(math.log(x) * 1000000.0 + 0.5)

    docs = [
        # 'a': counts {alpha:4, beta:2, gamma:2} over 8 tokens
        (1, "a", "alpha beta alpha gamma alpha beta alpha gamma"),
        # 'b': single repeated token -> entropy 0, lnv_units 0 (the
        # guarded edge: norm divides by greatest(1, lnv))
        (2, "b", "mono mono mono mono"),
    ]
    df = spark.createDataFrame(docs, schema="doc_id long, source string,"
                                            " text string")
    got = {r["source"]: r for r in entropy_stats(df).collect()}
    ra = got["a"]
    clnc = 4 * units(4) + 2 * units(2) + 2 * units(2)
    assert ra["n_tokens"] == 8 and ra["n_vocab"] == 3
    assert ra["clnc_units"] == clnc
    want_h = (units(8) - clnc / 8) / 1000000.0
    assert ra["entropy_nats"] == want_h
    assert ra["norm_entropy_ppm"] == math.floor(
        (units(8) - clnc / 8) / units(3) * 1000000.0 + 0.5)
    # sanity: near the true Shannon entropy of (1/2, 1/4, 1/4)
    true_h = 1.5 * math.log(2)
    assert abs(ra["entropy_nats"] - true_h) < 1e-4
    rb = got["b"]
    assert rb["n_vocab"] == 1 and rb["entropy_nats"] == 0.0
    assert rb["norm_entropy_ppm"] == 0
