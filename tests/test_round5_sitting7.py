"""Unit tests for the seventh-sitting operators — exact expected values
on tiny hand-checked inputs, independent of the DuckDB oracles:
session-x-incident interval overlap and SQ8 scalar-quantization error."""

from deepref_spark.operators.events import incident_overlap
from deepref_spark.operators.similarity import sq8_error

_EV_SCHEMA = ("event_id long, ts string, user_id long, "
              "event_type string, value double")


def test_incident_overlap_hand_unrolled(spark):
    # errors: hour 0 has 3, hour 1 has 1 -> rule c*n*10 >= 13*t with
    # n=2, t=4: hour 0 (60 >= 52) is an incident, hour 1 (20) is not.
    # user 9: one session [00:05, 00:25] inside hour 0 -> overlap 1200
    # user 1: one session [00:30, 01:10] spanning hours 0-1 -> the
    #   hour-0 slice is [00:30, 01:00] = 1800 s
    # user 9's 01:45 error is its own session in hour 1 -> no row
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", 9, "error", 0.0),
         (2, "2024-01-01 00:15:00", 9, "error", 0.0),
         (3, "2024-01-01 00:25:00", 9, "error", 0.0),
         (4, "2024-01-01 01:45:00", 9, "error", 0.0),
         (5, "2024-01-01 00:30:00", 1, "click", 0.0),
         (6, "2024-01-01 00:50:00", 1, "click", 0.0),
         (7, "2024-01-01 01:10:00", 1, "click", 0.0)],
        schema=_EV_SCHEMA,
    )
    out = {(r["user_id"], r["session_seq"]):
           (r["incident_hour"], r["overlap_secs"], r["n_errors"])
           for r in incident_overlap(ev).collect()}
    h0 = 1704067200  # 2024-01-01 00:00:00 UTC
    assert out == {(9, 1): (h0, 1200, 3), (1, 1): (h0, 1800, 3)}


def test_incident_overlap_point_session_zero_seconds(spark):
    # a single-event session inside an incident hour joins with
    # overlap 0 (closed-interval point envelope) — counted, not dropped
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 9, "error", 0.0),
         (2, "2024-01-01 00:20:00", 9, "error", 0.0),
         (3, "2024-01-01 01:30:00", 2, "error", 0.0),
         (4, "2024-01-01 00:40:00", 5, "view", 0.0)],
        schema=_EV_SCHEMA,
    )
    # hours: h0 c=2, h1 c=1; rule: 2*2*10=40 >= 13*3=39 -> h0 only
    out = {(r["user_id"], r["session_seq"]): r["overlap_secs"]
           for r in incident_overlap(ev).collect()}
    assert out[(5, 1)] == 0          # the point view session
    assert out[(9, 1)] == 600
    assert (2, 1) not in out         # hour 1 is not an incident


def test_sq8_error_midpoint_reconstruction(spark):
    # dim0 spans [0, 2] (cell = 2/256); dim1 is constant -> code 0,
    # exact reconstruction. Every dim0 diff is half a cell = 1/256,
    # so err_units = (1/65536) * 2^30 = 16384 exactly per vector.
    emb = spark.createDataFrame(
        [(0, [0.0, 10.0]), (1, [1.0, 10.0]), (2, [2.0, 10.0])],
        schema="vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: (r["code_sum"], r["err_units"], r["mse_x1e9"])
           for r in sq8_error(emb).collect()}
    # codes on dim0: floor(x*255/2) clamped -> 0, 127, 255
    assert out == {
        0: (0, 16384, 7629),
        1: (127, 16384, 7629),
        2: (255, 16384, 7629),
    }


def test_sq8_error_grid_is_order_independent(spark):
    # same rows, different partitioning -> identical BIGINT outputs
    rows = [(i, [float(i % 7), float((i * 3) % 11), 4.25]) for i in range(40)]
    a = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    b = a.repartition(13, "vec_id")
    ra = sorted(tuple(r) for r in sq8_error(a).collect())
    rb = sorted(tuple(r) for r in sq8_error(b).collect())
    assert ra == rb
