"""Seventeenth-sitting operators: distant-supervision labeling report,
Soundex phonetic blocking, daily-basket association rules."""
import datetime


def test_distant_supervision_silver_and_direct(spark):
    """Hand-built fixture: two spellings of one pair collapse under the
    canon key with DIFFERENT extracted preds, plus an 'Other' mention of
    the same canonical pair -> the KB holds two predicates for the bag
    and every mention matches both (1 direct + 2 silver each); an
    unrelated singleton pair stays direct-only."""
    from deepref_spark.operators.kgquality import distant_supervision

    rows = [
        (1, "acme corp", "berlin", "founded-in"),
        (2, "acme-corp", "berlin", "located-in"),
        (3, "acmecorp", "berlin", "Other"),
        (4, "solo co", "paris", "located-in"),
        (5, "solo co", "paris", "located-in"),
    ]
    pairs = (
        distant_supervision(
            _pairs_df(rows))
        .collect()
    )
    got = {r["pred"]: r for r in pairs}
    assert set(got) == {"founded-in", "located-in"}
    f = got["founded-in"]
    # all three acme mentions match the founded-in KB triple
    assert (f["n_mentions"], f["n_bags"], f["n_direct"], f["n_silver"]) == \
        (3, 1, 1, 2)
    assert f["silver_ppm"] == 2 * 1_000_000 // 3
    lo = got["located-in"]
    # 3 acme matches (1 direct via doc 2) + 2 solo matches (both direct)
    assert (lo["n_mentions"], lo["n_bags"], lo["n_direct"],
            lo["n_silver"]) == (5, 2, 3, 2)
    assert lo["silver_ppm"] == 2 * 1_000_000 // 5


def _pairs_df(rows):
    import tests.conftest as _c  # noqa: F401  (spark fixture session)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return spark.createDataFrame(
        rows, schema="doc_id long, h_name string, t_name string,"
                     " pred_relation string")


def test_distant_supervision_no_kb_match_empty(spark):
    from deepref_spark.operators.kgquality import distant_supervision

    rows = [(1, "a", "b", "Other"), (2, "c", "d", "Other")]
    assert distant_supervision(_pairs_df(rows)).count() == 0


def test_soundex_classic_keys(spark):
    """The shared formula reproduces the classic Soundex keys on the
    canonical record-linkage examples (vowel-separator variant)."""
    import pyspark.sql.functions as F
    from deepref_spark.portable import (SPARK, soundex_from_letters,
                                        soundex_letters)

    cases = {"smith": "S530", "smyth": "S530", "schmidt": "S530",
             "pfister": "P236", "robert": "R163", "rupert": "R163",
             "tymczak": "T522", "honeyman": "H555", "spark sql": "S162",
             "": "", "42": ""}
    df = spark.createDataFrame([(s,) for s in cases], schema="entity string")
    got = {
        r["entity"]: r["sdx"]
        for r in df.withColumn("_s0", F.expr(soundex_letters("entity", SPARK)))
        .withColumn("sdx", F.expr(soundex_from_letters("_s0", SPARK)))
        .collect()
    }
    assert got == cases


def test_phonetic_blocks_counts_and_members(spark):
    from deepref_spark.operators.linking import phonetic_blocks

    surfaces = spark.createDataFrame(
        [(s,) for s in ["smith", "smyth", "schmidt", "robert", "rupert",
                        "42", "unique name"]],
        schema="entity string")
    got = {r["sdx"]: r for r in phonetic_blocks(surfaces).collect()}
    assert "42"[:1] not in "".join(got)  # unkeyable surface dropped
    s = got["S530"]
    assert s["n_surfaces"] == 3 and s["n_pairs"] == 3
    assert s["members"] == "schmidt | smith | smyth"
    r = got["R163"]
    assert r["n_surfaces"] == 2 and r["n_pairs"] == 1
    u = got["U525"]  # 'unique name' -> singleton block, 0 pairs
    assert u["n_surfaces"] == 1 and u["n_pairs"] == 0


def test_basket_rules_exact_counts(spark):
    """3 baskets: {a,b}, {a,b,c}, {a} -> n_a=3, n_b=2, n_c=1,
    ab=2, ac=1, bc=1; lift on the milli grid."""
    from deepref_spark.operators.events import basket_rules

    base = datetime.datetime(2024, 6, 1, 9, 0)
    day = datetime.timedelta(days=1)
    rows, eid = [], 0
    baskets = [(1, 0, ["a", "b"]), (1, 1, ["a", "b", "c"]), (2, 0, ["a"])]
    for uid, dd, types in baskets:
        for t in types:
            # duplicate events within the basket must not inflate counts
            for rep in range(2):
                rows.append((eid, base + dd * day
                             + datetime.timedelta(minutes=eid % 7),
                             uid, t, 1.0, "{}"))
                eid += 1
    ev = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long,"
                     " event_type string, value double, props string")
    got = {(r["type_a"], r["type_b"]): r for r in basket_rules(ev).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = got[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["n_ab"], ab["n_baskets"]) == (3, 2, 2, 3)
    assert ab["support_ppm"] == 2 * 1_000_000 // 3
    assert ab["conf_ab_ppm"] == 2 * 1_000_000 // 3
    assert ab["conf_ba_ppm"] == 1_000_000
    assert ab["lift_milli"] == 2 * 3 * 1000 // (3 * 2)  # 1000 = independent
    bc = got[("b", "c")]
    assert (bc["n_ab"], bc["lift_milli"]) == (1, 1 * 3 * 1000 // (2 * 1))
