"""Fifteenth-sitting operators: audience-overlap Jaccard between event
types, bot-cadence gap regularity, IVF centroid silhouette."""
import datetime
import itertools


def test_audience_overlap_exact_sets(spark):
    from deepref_spark.operators.events import audience_overlap

    base = datetime.datetime(2024, 1, 1)
    members = {"a": {1, 2, 3, 4}, "b": {3, 4, 5}, "c": {9}}
    rows, eid = [], 0
    for etype, us in members.items():
        for uid in us:
            # two events per membership: distinct must collapse them
            for _ in range(2):
                rows.append((eid, base + datetime.timedelta(minutes=eid),
                             uid, etype, 1.0, "{}"))
                eid += 1
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long,"
                     " event_type string, value double, props string")
    got = {(r["type_a"], r["type_b"]): r
           for r in audience_overlap(df).collect()}
    # every unordered pair present, including the zero-overlap ones
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ta, tb), r in got.items():
        a, b = members[ta], members[tb]
        inter = len(a & b)
        assert (r["n_a"], r["n_b"], r["n_common"]) == (len(a), len(b), inter)
        assert r["jaccard_ppm"] == inter * 1000000 // len(a | b)
        assert r["overlap_ppm"] == inter * 1000000 // min(len(a), len(b))
    assert got[("a", "b")]["n_common"] == 2
    assert got[("a", "c")]["n_common"] == 0


def _py_median_x2(vals):
    xs = sorted(vals)
    n = len(xs)
    return xs[(n - 1) // 2] + xs[n // 2]


def test_bot_cadence_flags_scheduler_not_human(spark):
    from deepref_spark.operators.events import bot_cadence

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # user 1: metronome — 60 s gaps exactly (MAD 0 -> regular)
    for i in range(10):
        rows.append((eid, base + datetime.timedelta(seconds=60 * i),
                     1, "x", 1.0, "{}"))
        eid += 1
    # user 2: human-ish gaps incl. an even gap count (median = mean of
    # two middle values, exercised on the x2 grid)
    gaps2 = [30, 300, 45, 3600, 120, 90, 15]
    t = base
    rows.append((eid, t, 2, "x", 1.0, "{}")); eid += 1
    for g in gaps2:
        t = t + datetime.timedelta(seconds=g)
        rows.append((eid, t, 2, "x", 1.0, "{}")); eid += 1
    # user 3: too few gaps -> filtered out entirely
    for i in range(3):
        rows.append((eid, base + datetime.timedelta(seconds=7 * i),
                     3, "x", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long,"
                     " event_type string, value double, props string")
    got = {r["user_id"]: r for r in bot_cadence(df, min_gaps=5).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1["n_gaps"] == 9 and r1["median_gap_ms"] == 60000
    assert r1["mad_gap_ms"] == 0 and r1["rmad_ppm"] == 0
    assert r1["is_regular"] == 1
    r2 = got[2]
    med2 = _py_median_x2(gaps2)
    mad4 = _py_median_x2([abs(2 * g - med2) for g in gaps2])
    assert r2["n_gaps"] == 7
    assert r2["median_gap_ms"] == med2 * 500
    assert r2["mad_gap_ms"] == mad4 * 250
    assert r2["rmad_ppm"] == mad4 * 1000000 // (2 * med2)
    assert r2["is_regular"] == 0


def test_silhouette_separated_vs_merged_clusters(spark):
    from deepref_spark.operators.similarity import silhouette_report

    # two orthogonal-ish clusters in 4-d: axis-0 heavy vs axis-2 heavy
    rows = []
    for i in range(40):
        if i % 2 == 0:
            v = [10.0 + (i % 5), 1.0, 0.1, 0.1]
        else:
            v = [0.1, 0.1, 10.0 + (i % 7), 1.0]
        rows.append((i, v))
    df = spark.createDataFrame(rows, schema="vec_id long,"
                                            " embedding array<double>")
    got = silhouette_report(df, n_lists=2).collect()
    assert len(got) == 2
    assert sum(r["n_members"] for r in got) == 40
    for r in got:
        # orthogonal clusters: own-centroid cosine ~1, cross ~small ->
        # silhouette far from 0, and never negative by construction
        assert 0 <= r["min_sil_ppm"] <= r["mean_sil_ppm"] <= 1000000
        assert r["mean_sil_ppm"] > 500000
    # brute-force the formula on one configuration: all vectors on two
    # exact rays -> u1 = 1e6, sil = 1e6 - guard value
    rays = [(i, [1.0 * (i % 2), 0.0, 1.0 * ((i + 1) % 2), 0.0])
            for i in range(20)]
    df2 = spark.createDataFrame(rays, schema="vec_id long,"
                                             " embedding array<double>")
    got2 = silhouette_report(df2, n_lists=2).collect()
    for r in got2:
        # own cosine exactly 1, runner-up exactly 0:
        # sil = (1e6 - 0) * 1e6 // (1e6 - 0) = 1e6
        assert r["mean_sil_ppm"] == 1000000
        assert r["min_sil_ppm"] == 1000000
