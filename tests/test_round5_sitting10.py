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
