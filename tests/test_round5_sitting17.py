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


def test_dim_stats_exact_small(spark):
    """Hand-computable 3-vector, dim-64 fixture (only dims 0/1 nonzero):
    grid quantization, variance numerator, and the descending-variance
    cumulative share."""
    from deepref_spark.operators.similarity import dim_stats

    vecs = [[0.5, 0.1] + [0.0] * 62,
            [-0.5, 0.2] + [0.0] * 62,
            [0.0, 0.3] + [0.0] * 62]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        schema="vec_id long, embedding array<float>")
    got = {r["dim"]: r for r in dim_stats(emb).collect()}
    assert len(got) == 64
    d0 = got[0]
    # u = (500, -500, 0): s=0, s2=500000, var_num=3*500000=1500000
    assert d0["n_vectors"] == 3 and d0["mean_val"] == 0.0
    assert d0["var_val"] == round(1500000 / 9 / 1e6, 6)
    assert (d0["min_val"], d0["max_val"]) == (-0.5, 0.5)
    d1 = got[1]
    # u = (100, 200, 300): s=600, s2=140000, var_num=3*140000-360000=60000
    assert d1["mean_val"] == round(600 / 3 / 1000, 6)
    assert d1["var_val"] == round(60000 / 9 / 1e6, 6)
    # dim 0 holds 1500000/1560000 of the energy, dim 1 the rest
    assert d0["var_share"] == round(1500000 / 1560000, 6)
    assert d0["cum_share"] == d0["var_share"]
    assert d1["cum_share"] == 1.0
    assert got[5]["var_val"] == 0.0 and got[5]["var_share"] == 0.0


def test_bounce_stats_sessions_and_grid(spark):
    """user 1: a 2-event 'view'-entry session then (after >30 min) a
    1-event 'click' bounce; user 2: one 3-event 'view' session spanning
    100 s. Entry pick must follow (ts, event_id) on ties."""
    from deepref_spark.operators.events import bounce_stats

    base = datetime.datetime(2024, 7, 1, 10, 0, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + 60 * s, 1, "purchase", 1.0, "{}"),
        (3, base + 4000 * s, 1, "click", 1.0, "{}"),
        # user 2: ts tie at base -> event_id 4 wins the entry pick
        (4, base, 2, "view", 1.0, "{}"),
        (5, base, 2, "click", 1.0, "{}"),
        (6, base + 100 * s, 2, "error", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long,"
                     " event_type string, value double, props string")
    got = {r["entry_type"]: r for r in bounce_stats(ev).collect()}
    assert set(got) == {"view", "click"}
    v = got["view"]
    assert (v["n_sessions"], v["n_bounces"], v["bounce_ppm"]) == (2, 0, 0)
    # events (2, 3): mean 2.5 -> tie-free half-up = 2.5 exactly on milli
    assert v["mean_events"] == (2000 * 5 + 2) // 4 / 1000
    assert v["mean_dur_secs"] == (2000 * 160 + 2) // 4 / 1000
    c = got["click"]
    assert (c["n_sessions"], c["n_bounces"], c["bounce_ppm"]) == \
        (1, 1, 1_000_000)
    assert c["mean_events"] == 1.0 and c["mean_dur_secs"] == 0.0


def test_mime_audit_sniff_and_mismatch(spark):
    from deepref_spark.operators.multimodal import mime_audit

    rows = [
        ("a.png", "89504E47" + "00" * 16),          # honest png
        ("b.wav", "52494646" + "00" * 16),          # honest riff
        ("c.mp4", "0000001866747970" + "00" * 16),  # honest ftyp
        ("d.wav", "89504E47" + "00" * 16),          # mislabeled: png bytes
        ("e.png", "DEADBEEF" + "00" * 16),          # garbage magic
        ("f.xyz", "89504E47"),                      # unknown extension
    ]
    media = spark.createDataFrame(rows, schema="media_ref string, hexstr string") \
        .selectExpr("media_ref", "unhex(hexstr) AS content")
    got = {(r["declared_kind"], r["sniffed_kind"]): r
           for r in mime_audit(media).collect()}
    assert got[("image", "image")]["n"] == 1
    assert got[("audio", "audio")]["n"] == 1
    v = got[("video", "video")]
    assert v["n"] == 1 and v["total_bytes"] == 24
    assert got[("audio", "image")]["is_mismatch"] == 1
    assert got[("image", "unknown")]["is_mismatch"] == 1
    u = got[("unknown", "image")]
    assert u["n"] == 1 and u["min_bytes"] == 4


def test_url_canon_variants_collapse(spark):
    from deepref_spark.operators.dedup import url_canon_stats

    rows = [
        (1, "https://CDN.Example.COM:443/d/7?utm_source=feed&utm_campaign=x#frag"),
        (2, "https://www.cdn.example.com/d/7/"),
        (3, "https://cdn.example.com/d/7"),
        (4, "http://other.example.com:80/p?a=1&utm_medium=m"),
        (5, "https://solo.example.com/q?utm_a=x&keep=1"),
        (6, "https://cdn.example.com/d/7"),  # exact repeat: same raw form
    ]
    urls = spark.createDataFrame(rows, schema="doc_id long, url string")
    got = {r["canon_url"]: r for r in url_canon_stats(urls).collect()}
    c = got["https://cdn.example.com/d/7"]
    assert (c["n_docs"], c["n_raw"], c["is_collapsed"]) == (4, 3, 1)
    o = got["http://other.example.com/p?a=1"]
    assert (o["n_docs"], o["n_raw"], o["is_collapsed"]) == (1, 1, 0)
    s = got["https://solo.example.com/q?keep=1"]
    assert s["n_raw"] == 1


def test_transitive_reduction_tree_plus_shortcut(spark):
    """Chain a->b->c->d plus shortcuts a->c (redundant via b) and b->d
    (redundant via c); every chain edge stays essential."""
    from deepref_spark.operators.graph import transitive_reduction

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")],
        schema="child string, parent string")
    got = {(r["child"], r["parent"]): r["is_redundant"]
           for r in transitive_reduction(edges).collect()}
    assert got == {("a", "b"): 0, ("b", "c"): 0, ("c", "d"): 0,
                   ("a", "c"): 1, ("b", "d"): 1}


def test_burn_rate_alerts_two_window_rule(spark):
    """20 calm hours at 2% errors, then 4 hot hours at 50%: the short
    window fires immediately but the alert waits for the trailing 6h
    ratio to cross 2x the 5% budget; a gap hour stays quiet."""
    from deepref_spark.operators.events import burn_rate_alerts

    base = datetime.datetime(2024, 8, 1)
    rows, eid = [], 0
    hours = []
    for h in range(24):
        if h == 7:
            hours.append((0, 0))      # gap hour: no events at all
            continue
        if h < 20:
            hours.append((50, 1))     # 2% error ratio
        else:
            hours.append((50, 25))    # 50% error ratio
    hi = 0
    for h in range(24):
        if h == 7:
            continue
        tot, err = hours[h]
        for i in range(tot):
            et = "error" if i < err else "click"
            rows.append((eid, base + datetime.timedelta(hours=h, minutes=i % 60),
                         1, et, 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long,"
                     " event_type string, value double, props string")
    got = sorted(burn_rate_alerts(ev).collect(), key=lambda r: r["hour"])
    assert len(got) == 24                      # spine fills the gap hour
    by_h = {r["hour"].hour: r for r in got}
    assert by_h[7]["tot"] == 0 and by_h[7]["alert"] == 0
    assert by_h[5]["short_ppm"] == 20000 and by_h[5]["alert"] == 0
    # hour 20: short 50% > 10% but trailing 6h = (4*50+0*1... ) check exact
    # trailing window hours 15..20: five calm (2%) + one hot: ratio
    # (4*1 + 25) / (4*50 + 0 + 50)  -> wait hour 19 calm, 7 gap not here
    h20 = by_h[20]
    assert h20["short_ppm"] == 500000
    # hours 15-19 calm (50 ev, 1 err each), hour 20 hot: 5*1+25 err / 5*50+50
    assert h20["long_ppm"] == (5 * 1 + 25) * 1_000_000 // (6 * 50)
    assert h20["alert"] == 0  # long ratio 10% == 2x budget, NOT strictly above
    h22 = by_h[22]
    # hours 17,18,19 calm + 20,21,22 hot: (3 + 75) / 300 = 26% -> alert
    assert h22["long_ppm"] == (3 * 1 + 3 * 25) * 1_000_000 // (6 * 50)
    assert h22["alert"] == 1


def test_void_summary_exact(spark):
    from deepref_spark.operators.kgquality import void_summary

    spo = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c"), ("a", "q", "b"),
         ("b", "p", "c"), ("a", "p", "b")],  # dup row must collapse
        schema="subj string, pred string, obj string")
    r = void_summary(spo).collect()[0]
    assert r["n_triples"] == 4 and r["n_subjects"] == 2
    assert r["n_objects"] == 2 and r["n_predicates"] == 2
    assert r["n_entities"] == 3  # {a, b, c}
    assert r["mean_out_degree"] == (2000 * 4 + 2) // 4 / 1000  # 2.0 half-up


def test_chat_template_flag_paths(spark):
    """Hard token alone flags; one soft family does NOT; two do; the
    Q:/A: regex counts as a soft family."""
    from deepref_spark.operators.text_analysis import chat_template_stats

    rows = [
        ("s", "plain prose with nothing special"),
        ("s", "contains <|im_start|> marker"),                    # hard
        ("s", "### Instruction only, one family"),                # 1 soft
        ("s", "### Instruction plus ### Response"),               # 2 soft
        ("s", "Q: what is this A: an answer ### Response done"),  # 2 soft
    ]
    d = spark.createDataFrame(rows, schema="source string, text string")
    r = chat_template_stats(d).collect()[0]
    assert r["n_docs"] == 5 and r["n_templated"] == 3
    assert r["templated_ppm"] == 3 * 1_000_000 // 5
