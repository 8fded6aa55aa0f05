"""Sitting-21 operators: Mann-Kendall trend test, cross-source n-gram
overlap, and the cosine-to-same-label reliability curve — exact
expected values on tiny hand-checked inputs, independent of the DuckDB
oracle sweep."""

import pyspark.sql.functions as F

from deepref_spark.operators.events import trend_mk
from deepref_spark.operators.similarity import label_reliability
from deepref_spark.operators.text_analysis import source_overlap


# --- trend_mk ----------------------------------------------------------------

def _events(spark, rows):
    return (
        spark.createDataFrame(rows, schema="event_type string, ts string")
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_trend_mk_monotone_flat_and_decreasing(spark):
    # 8 days; "up" gets i+1 events on day i (strictly increasing daily
    # counts -> S = n_pairs = 28), "flat" gets 2/day (S = 0), "down"
    # gets 8-i (S = -28).  Significance: 18*28^2*1e4 = 1.4112e8 >
    # 38416*8*7*21 = 45,177,216 -> flag 1 for up/down, 0 for flat.
    rows = []
    for i in range(8):
        day = f"2024-03-{i + 1:02d}"
        rows += [("up", f"{day} 00:00:0{j % 10}") for j in range(i + 1)]
        rows += [("flat", f"{day} 01:00:00"), ("flat", f"{day} 02:00:00")]
        rows += [("down", f"{day} 03:00:0{j % 10}") for j in range(8 - i)]
    out = {r["event_type"]: r for r in trend_mk(_events(spark, rows)).collect()}
    assert set(out) == {"up", "flat", "down"}
    for t in out.values():
        assert t["n_days"] == 8 and t["n_pairs"] == 28
    assert (out["up"]["s_stat"], out["up"]["tau_milli"],
            out["up"]["trend_flag"]) == (28, 1000, 1)
    assert (out["flat"]["s_stat"], out["flat"]["tau_milli"],
            out["flat"]["trend_flag"]) == (0, 0, 0)
    assert (out["down"]["s_stat"], out["down"]["tau_milli"],
            out["down"]["trend_flag"]) == (-28, -1000, 1)


def test_trend_mk_short_series_never_flags(spark):
    # 3 increasing days: S = 3, LHS = 18*9*1e4 = 1.62e6,
    # RHS = 38416*3*2*11 = 2,535,456 -> not significant.
    rows = [("t", "2024-03-01 00:00:00"),
            ("t", "2024-03-02 00:00:00"), ("t", "2024-03-02 00:01:00"),
            ("t", "2024-03-03 00:00:00"), ("t", "2024-03-03 00:01:00"),
            ("t", "2024-03-03 00:02:00")]
    [r] = trend_mk(_events(spark, rows)).collect()
    assert (r["n_days"], r["n_pairs"], r["s_stat"]) == (3, 3, 3)
    assert r["tau_milli"] == 1000 and r["trend_flag"] == 0


# --- source_overlap ----------------------------------------------------------

def test_source_overlap_exact_jaccard(spark):
    # n=2 grams: A has {a b, b c} (the duplicate doc collapses in the
    # per-source distinct), B has {a b, b d}, C has {x y}.
    # A-B share 1 gram -> jaccard 1/3 -> 333333 ppm; C shares none and
    # must NOT appear in any pair row.
    docs = spark.createDataFrame(
        [(1, "a b c", "A"), (2, "a b", "A"),
         (3, "a b d", "B"), (4, "x y", "C")],
        schema="doc_id long, text string, source string",
    )
    rows = source_overlap(docs, n=2).collect()
    assert [(r["src_a"], r["src_b"]) for r in rows] == [("A", "B")]
    r = rows[0]
    assert (r["n_common"], r["n_a"], r["n_b"]) == (1, 2, 2)
    assert r["jaccard_ppm"] == 333333


def test_source_overlap_short_docs_contribute_nothing(spark):
    # single-token docs yield no 2-grams; identical sources -> full overlap
    docs = spark.createDataFrame(
        [(1, "p q r", "A"), (2, "z", "A"), (3, "p q r", "B")],
        schema="doc_id long, text string, source string",
    )
    [r] = source_overlap(docs, n=2).collect()
    assert (r["src_a"], r["src_b"], r["n_common"], r["n_a"], r["n_b"],
            r["jaccard_ppm"]) == ("A", "B", 2, 2, 2, 1000000)


# --- label_reliability ---------------------------------------------------------

def test_label_reliability_buckets_and_rates(spark):
    # Basis/anti-basis vectors give exact cosines {1, 0, -1}:
    # (v1,v2) cos 1 -> bucket 9 (the top-bucket clamp), same label;
    # (v1,v4),(v2,v4) cos -1 -> bucket 0, same label;
    # the three pairs against v3 cos 0 -> bucket 5, different label.
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
         (3, [0.0, 1.0], 1), (4, [-1.0, 0.0], 0)],
        schema="vec_id long, embedding array<float>, label int",
    )
    out = {r["bucket"]: (r["n_pairs"], r["n_same"], r["same_ppm"])
           for r in label_reliability(emb, sample_n=32).collect()}
    assert out == {9: (1, 1, 1000000), 5: (3, 0, 0), 0: (2, 2, 1000000)}


def test_label_reliability_sample_bound(spark):
    # sample_n caps the pair space: 3 of 5 vectors -> exactly 3 pairs.
    emb = spark.createDataFrame(
        [(i, [1.0, float(i)], i % 2) for i in range(5)],
        schema="vec_id long, embedding array<float>, label int",
    )
    total = (label_reliability(emb, sample_n=3)
             .agg(F.sum("n_pairs")).collect()[0][0])
    assert total == 3
