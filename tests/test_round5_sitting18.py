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
