"""Sixteenth-sitting operators: PQ per-subspace distortion report,
CUSUM rate-shift detection via the prefix-min identity, dyadic
exponential-decay engagement."""
import datetime


def _mk_emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        schema="vec_id long, embedding array<float>")


def test_pq_distortion_matches_numpy_reference(spark):
    """The report must equal a brute-force numpy recomputation from the
    SAME books: per vector/subspace min squared L2 over centroids,
    quantized floor(x*1e6+0.5), mean = floor((2s+n)/(2n))/1e6."""
    import numpy as np
    from deepref_spark.operators.similarity import (
        pq_codebooks, pq_distortion_report)

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(40, 64)).round(3)
    emb = _mk_emb(spark, vecs)
    books = pq_codebooks(emb, dim=64, m=8, k_sub=4)
    got = {r["subspace"]: r for r in
           pq_distortion_report(emb, dim=64, m=8, k_sub=4,
                                books=books).collect()}
    assert set(got) == set(range(8))
    # float32 storage: recompute from the cast-to-double float32 values
    v32 = vecs.astype(np.float32).astype(np.float64)
    for j in range(8):
        cents = np.array(books[j])          # (k_sub, 8)
        svs = v32[:, j * 8:(j + 1) * 8]     # (n, 8)
        d = ((svs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        err = d.min(axis=1)
        u = np.floor(err * 1e6 + 0.5).astype(np.int64)
        n = len(u)
        mean = np.floor((2.0 * u.sum() + n) / (2.0 * n)) / 1e6
        r = got[j]
        assert r["n_vectors"] == n
        assert abs(r["mean_sq_err"] - mean) < 1e-12
        assert abs(r["max_sq_err"] - u.max() / 1e6) < 1e-12


def test_pq_distortion_lloyd_refinement_not_worse_on_sample(spark):
    """Refined books must not increase total distortion vs their seed
    books on the training corpus (Lloyd's monotonicity, observed
    through the report)."""
    import numpy as np
    from deepref_spark.operators.similarity import (
        pq_codebooks, pq_distortion_report)

    rng = np.random.RandomState(11)
    # two clusters per subspace so refinement has something to move
    base = np.repeat(rng.uniform(-1, 1, size=(2, 64)), 20, axis=0)
    vecs = (base + rng.uniform(-0.05, 0.05, size=(40, 64))).round(3)
    emb = _mk_emb(spark, vecs)
    seed = pq_codebooks(emb, dim=64, m=8, k_sub=4, lloyd_iters=0)
    refined = pq_codebooks(emb, dim=64, m=8, k_sub=4, lloyd_iters=1)

    def total(books):
        rows = pq_distortion_report(emb, dim=64, m=8, k_sub=4,
                                    books=books).collect()
        return sum(r["mean_sq_err"] for r in rows)

    assert total(refined) <= total(seed) + 1e-9


def _events(spark, rows):
    return spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long,"
                     " event_type string, value double, props string")


def test_cusum_matches_python_recurrence(spark):
    from deepref_spark.operators.events import cusum_changepoints

    base = datetime.datetime(2024, 3, 1)
    counts = [2] * 50 + [10] * 10          # mean shift at hour 50
    counts[7] = 0                           # a gap hour (spine must fill)
    rows, eid = [], 0
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append((eid, base + datetime.timedelta(hours=h, minutes=i),
                         1, "x", 1.0, "{}"))
            eid += 1
    got = sorted(cusum_changepoints(_events(spark, rows)).collect(),
                 key=lambda r: r["hour"])
    assert [r["n"] for r in got] == counts
    n_hours, sum_n = len(counts), sum(counts)
    s, exp = 0, []
    for c in counts:
        s = max(0, s + 2 * n_hours * c - 3 * sum_n)
        exp.append(s)
    assert [r["cusum_units"] for r in got] == exp
    alarms = [r["alarm"] for r in got]
    assert alarms == [1 if v >= 8 * sum_n else 0 for v in exp]
    # the shift is detected, and only after it happens
    assert max(alarms[:50]) == 0 and max(alarms[50:]) == 1


def test_decay_engagement_dyadic_exact(spark):
    from deepref_spark.operators.events import decay_engagement

    anchor = datetime.datetime(2024, 5, 30, 12, 0)
    # user 1: today x2, 3 days ago; user 2: 20 days ago (last in-horizon
    # day) and 25 days ago (clipped); user 3: only clipped history
    spec = {1: [0, 0, 3], 2: [20, 25], 3: [30]}
    rows, eid = [], 0
    for uid, ages in spec.items():
        for a in ages:
            rows.append((eid, anchor - datetime.timedelta(days=a),
                         uid, "x", 1.0, "{}"))
            eid += 1
    got = {r["user_id"]: r
           for r in decay_engagement(_events(spark, rows)).collect()}
    assert set(got) == {1, 2}               # user 3 fully clipped
    assert got[1]["n_recent"] == 3
    assert got[1]["decay_units"] == 2 * (1 << 20) + (1 << 17)
    assert got[1]["days_since_last"] == 0
    assert got[1]["decay_score"] == got[1]["decay_units"] / 2.0 ** 20
    assert got[2]["n_recent"] == 1
    assert got[2]["decay_units"] == 1       # 1 << (20 - 20)
    assert got[2]["days_since_last"] == 20
