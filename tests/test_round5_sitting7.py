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


# --- calibration_bins ---------------------------------------------------------

def test_calibration_bins_hand_unrolled(spark):
    from deepref_spark.operators.metrics import calibration_bins
    scored = spark.createDataFrame(
        [("a", "a", 0.95), ("a", "b", 0.90), ("x", "x", 0.05)],
        schema="relation string, pred_relation string, score double",
    )
    out = {r["bin"]: (r["n"], r["acc_ppm"], r["conf_ppm"], r["gap_ppm"])
           for r in calibration_bins(scored).collect()}
    assert out[9] == (2, 500_000, 925_000, 425_000)
    assert out[0] == (1, 1_000_000, 50_000, 950_000)
    # summary row: ECE = (2*425000 + 1*950000) div 3 = 600000
    assert out[-1] == (3, 666_666, 633_333, 600_000)


def test_calibration_perfectly_calibrated_gap_zero(spark):
    from deepref_spark.operators.metrics import calibration_bins
    # two rows at conf 0.5, exactly one correct -> acc == conf, gap 0
    scored = spark.createDataFrame(
        [("a", "a", 0.5), ("a", "b", 0.5)],
        schema="relation string, pred_relation string, score double",
    )
    out = {r["bin"]: r["gap_ppm"] for r in calibration_bins(scored).collect()}
    assert out[5] == 0 and out[-1] == 0


# --- vocab_growth -------------------------------------------------------------

def test_vocab_growth_first_seen_and_cumulatives(spark):
    from deepref_spark.operators.text_analysis import vocab_growth
    docs = spark.createDataFrame(
        [(0, "aa bb aa"), (1, "cc"), (100, "bb dd")],
        schema="doc_id long, text string",
    )
    rows = {r["bucket"]: (r["n_docs"], r["n_tokens"], r["n_tokens_cum"],
                          r["new_terms"], r["vocab_cum"])
            for r in vocab_growth(docs).collect()}
    assert rows == {0: (2, 4, 4, 3, 3), 1: (1, 2, 6, 1, 4)}


# --- bloom_gate ---------------------------------------------------------------

def _md5_mod_py(s: str, m: int) -> int:
    import hashlib
    h = hashlib.md5(s.encode()).hexdigest()
    return (ord(h[0]) * 131071 + ord(h[1]) * 8191
            + ord(h[2]) * 127 + ord(h[3])) % m


def _bloom_py(texts_indexed, text_probe, m_words=64, k=3) -> int:
    bits = set()
    for t in texts_indexed:
        for i in range(k):
            bits.add(_md5_mod_py(f"{t}:b{i}", m_words * 63))
    return int(all(_md5_mod_py(f"{text_probe}:b{i}", m_words * 63) in bits
                   for i in range(k)))


def test_bloom_gate_matches_python_replica(spark):
    from deepref_spark.operators.dedup import bloom_gate
    texts = {0: "the quick fox", 1: "the quick fox", 2: "lazy dog",
             3: "unique probe text", 4: "another indexed", 5: "odd only"}
    docs = spark.createDataFrame(
        sorted(texts.items()), schema="doc_id long, text string")
    indexed = [texts[i] for i in (0, 2, 4)]
    out = {r["doc_id"]: (r["bloom_hit"], r["exact_hit"])
           for r in bloom_gate(docs).collect()}
    for did, text in texts.items():
        exact = int(text in indexed)
        assert out[did] == (_bloom_py(indexed, text), exact), did
        # a Bloom filter NEVER false-negatives
        assert out[did][0] >= exact


# --- mmr_rerank ---------------------------------------------------------------

def test_mmr_skips_duplicate_for_diverse_pick(spark):
    from deepref_spark.operators.similarity import mmr_rerank
    # a (id 1) and b (id 2) point the same way (b is a scaled dup);
    # c (id 3) is less relevant but diverse. Greedy MMR at lambda 0.7:
    # pick1 = a (top rel, id tiebreak vs its dup), pick2 = c (the dup's
    # sim-to-a penalty 3e6 ppm outweighs its relevance edge), pick3 = b
    rows = [(100, [1.0, 0.0]), (1, [0.95, 0.31]), (2, [1.90, 0.62]),
            (3, [0.90, -0.436])]
    emb = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    out = mmr_rerank(emb, emb.where("vec_id = 100"),
                     n_shortlist=8, n_select=3).collect()
    picks = {r["pick"]: r["nbr_id"] for r in out}
    assert picks == {1: 1, 2: 3, 3: 2}
    assert all(r["query_id"] == 100 for r in out)


def test_mmr_first_pick_is_pure_relevance(spark):
    from deepref_spark.operators.similarity import mmr_rerank
    rows = [(0, [1.0, 0.0]), (5, [0.5, 0.5]), (6, [0.9, 0.1])]
    emb = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    out = {r["pick"]: (r["nbr_id"], r["mmr_u"])
           for r in mmr_rerank(emb, emb.where("vec_id = 0"),
                               n_shortlist=4, n_select=2).collect()}
    # pick 1 carries mmr_u = 7 * rel_ppm (no similarity penalty yet)
    nbr, u = out[1]
    assert nbr == 6 and u % 7 == 0 and u > 0


# --- interarrival_hist --------------------------------------------------------

def test_interarrival_buckets_hand_unrolled(spark):
    from deepref_spark.operators.events import interarrival_hist
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "A", 0.0),
         (2, "2024-01-01 00:00:01", 1, "A", 0.0),   # gap 1 -> bucket 1
         (3, "2024-01-01 00:00:03", 1, "A", 0.0),   # gap 2 -> bucket 1
         (4, "2024-01-01 00:00:10", 1, "A", 0.0),   # gap 7 -> bucket 3
         (5, "2024-01-01 00:00:00", 2, "A", 0.0),   # lone event: no gap
         (6, "2024-01-01 00:00:00", 1, "B", 0.0),
         (7, "2024-01-01 00:00:00", 1, "B", 0.0)],  # gap 0 -> bucket 0
        schema="event_id long, ts string, user_id long, "
               "event_type string, value double",
    )
    out = {(r["event_type"], r["bucket"]): r["n"]
           for r in interarrival_hist(ev).collect()}
    assert out == {("A", 1): 2, ("A", 3): 1, ("B", 0): 1}


# --- late_audit ---------------------------------------------------------------

def test_late_audit_two_level_watermark(spark):
    from deepref_spark.operators.events import late_audit
    # bucket 0: ts 100, 200 (sets wm=200); bucket 1: ts 50 (150 s late)
    # and ts 300 (on time). watermark 100 s -> exactly one drop.
    base = "2024-01-01 00:0{m}:{s:02d}"
    ev = spark.createDataFrame(
        [(0, "2024-01-01 00:01:40"),   # epoch offset 100
         (1, "2024-01-01 00:03:20"),   # 200
         (2, "2024-01-01 00:00:50"),   # 50 -> lateness 150
         (3, "2024-01-01 00:05:00")],  # 300
        schema="event_id long, ts string",
    )
    out = {r["bucket"]: (r["n_events"], r["n_late"], r["max_lateness_secs"])
           for r in late_audit(ev, watermark_secs=100,
                               bucket_events=2).collect()}
    assert out == {0: (2, 0, 0), 1: (2, 1, 150)}


def test_late_audit_first_bucket_never_late(spark):
    from deepref_spark.operators.events import late_audit
    ev = spark.createDataFrame(
        [(0, "2024-01-01 09:00:00"), (1, "2024-01-01 08:00:00")],
        schema="event_id long, ts string",
    )
    rows = late_audit(ev, watermark_secs=60, bucket_events=10).collect()
    assert [(r["bucket"], r["n_late"]) for r in rows] == [(0, 0)]


# --- hamming_topk -------------------------------------------------------------

def test_hamming_topk_sign_bits(spark):
    from deepref_spark.operators.similarity import hamming_topk
    emb = spark.createDataFrame(
        [(0, [1.0, -1.0]), (1, [1.0, 1.0]), (2, [-1.0, -1.0]),
         (3, [2.0, -3.0])],
        schema="vec_id long, embedding array<float>",
    )
    out = [(r["nbr_id"], r["hamming"], r["rank"])
           for r in hamming_topk(emb, emb.where("vec_id = 0"), dim=2)
           .orderBy("rank").collect()]
    # 3 is a sign-exact dup (ham 0); 1 and 2 each differ in one bit
    assert out == [(3, 0, 1), (1, 1, 2), (2, 1, 3)]


def test_sign_words_spark_duck_same_packing(spark):
    import duckdb
    from deepref_spark.operators.similarity import sign_words_expr
    vec = [0.5, -0.25, 0.0, -1.0] * 20  # dim 80 -> 2 words
    s = spark.sql(
        "SELECT " + sign_words_expr(80, "spark") + " AS w FROM (SELECT "
        f"array({', '.join(f'CAST({v} AS DOUBLE)' for v in vec)}) AS e)"
    ).collect()[0]["w"]
    d = duckdb.sql(
        "SELECT " + sign_words_expr(80, "duck") + " AS w FROM (SELECT "
        f"[{', '.join(str(v) for v in vec)}]::DOUBLE[] AS e)"
    ).fetchone()[0]
    assert list(s) == list(d)


# --- editdist_verify ----------------------------------------------------------

def test_editdist_verify_threshold(spark):
    from deepref_spark.operators.linking import editdist_verify
    pairs = spark.createDataFrame(
        [("color", "colour"), ("alpha", "omega"), ("same", "same"),
         ("ab", "ba")],
        schema="a string, b string",
    )
    out = {(r["a"], r["b"]): r["dist"]
           for r in editdist_verify(pairs, max_dist=2).collect()}
    assert out == {("color", "colour"): 1, ("same", "same"): 0,
                   ("ab", "ba"): 2}


# --- conversion_time ----------------------------------------------------------

def test_conversion_time_strictly_after_anchor(spark):
    from deepref_spark.operators.events import conversion_time
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "signup", 0.0),
         (2, "2024-01-01 00:00:03", 1, "purchase", 0.0),   # gap 3 -> b2
         (3, "2024-01-01 00:05:00", 1, "purchase", 0.0),   # not first
         (4, "2024-01-01 00:00:10", 2, "purchase", 0.0),   # before signup
         (5, "2024-01-01 00:00:20", 2, "signup", 0.0),
         (6, "2024-01-01 00:00:21", 2, "purchase", 0.0),   # gap 1 -> b1
         (7, "2024-01-01 00:00:00", 3, "signup", 0.0)],    # never converts
        schema="event_id long, ts string, user_id long, "
               "event_type string, value double",
    )
    out = {r["bucket"]: (r["n_users"], r["min_secs"], r["max_secs"])
           for r in conversion_time(ev).collect()}
    assert out == {2: (1, 3, 3), 1: (1, 1, 1)}


# --- readability --------------------------------------------------------------

def test_readability_hand_counts(spark):
    from deepref_spark.operators.text_analysis import readability
    docs = spark.createDataFrame(
        [(0, "The cat sat. It sat!")],
        schema="doc_id long, text string",
    )
    r = readability(docs).collect()[0]
    # words = the shared norm-tokens count, which keeps '.' as a token:
    # the/cat/sat/./it/sat = 6 ('!' is stripped); sentences: '.' '!' = 2;
    # vowel groups: e, a, a, i, a = 5
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 5)
    # flesch_milli = 206835 - (1015*6) div 2 - (84600*5) div 6
    assert r["flesch_milli"] == 206835 - 3045 - 70500


def test_readability_no_terminator_counts_one_sentence(spark):
    from deepref_spark.operators.text_analysis import readability
    docs = spark.createDataFrame(
        [(0, "no punctuation here")], schema="doc_id long, text string")
    r = readability(docs).collect()[0]
    assert r["n_sentences"] == 1 and r["n_words"] == 3


# --- anf_hyperball ------------------------------------------------------------

def test_anf_exact_ball_on_path_graph(spark):
    from deepref_spark.operators.graph import anf_hyperball
    # path a-b-c-d-e: 2-balls: a:{a,b,c}=3, b:{a,b,c,d}=4, c:all 5,
    # d:4, e:3
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        schema="src string, dst string",
    )
    out = {r["entity"]: (r["ball_exact"], r["n_regs"])
           for r in anf_hyperball(edges, m=16, hops=2).collect()}
    assert {k: v[0] for k, v in out.items()} == {
        "a": 3, "b": 4, "c": 5, "d": 4, "e": 3}
    # registers can never exceed ball members or m
    for k, (ball, nregs) in out.items():
        assert 1 <= nregs <= min(ball, 16)


def test_anf_estimate_matches_direct_hll_of_ball(spark):
    # HyperBall invariant: the merged registers equal the HLL of the
    # exact ball membership — recompute one node's estimate in python
    import hashlib
    from deepref_spark.operators.graph import anf_hyperball
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], schema="src string, dst string")
    out = {r["entity"]: r["anf_estimate"]
           for r in anf_hyperball(edges, m=16, hops=2).collect()}

    def md5_mod(s, m):
        h = hashlib.md5(s.encode()).hexdigest()
        return (ord(h[0]) * 131071 + ord(h[1]) * 8191
                + ord(h[2]) * 127 + ord(h[3])) % m

    def rank(s):
        # hex32(h, 8): hex chars 9..16 of the md5 (offset-8 slice)
        h = hashlib.md5(s.encode()).hexdigest()
        v = int(h[8:16], 16)
        return 33 if v == 0 else 33 - v.bit_length()

    regs = {}
    for member in ("a", "b", "c"):  # node b's exact 2-ball
        h1 = hashlib.md5(f"anf|{member}".encode()).hexdigest()
        b = md5_mod(h1, 16)   # md5_mod re-hashes its argument
        regs[b] = max(regs.get(b, 0), rank(f"anf|{member}"))
    s = sum(2 ** (33 - mr) for mr in regs.values())
    s += (16 - len(regs)) * (1 << 33)
    alpha = 0.7213 / (1.0 + 1.079 / 16)
    assert out["b"] == round(alpha * 256 * float(1 << 33) / s, 2)


# --- skipping_eval ------------------------------------------------------------

def test_skipping_eval_zorder_prunes_natural_does_not(spark):
    from deepref_spark.operators.lakeops import skipping_eval
    # y == x: under the x-bucketed natural layout each bucket's y
    # envelope is tight too (perfect correlation), so both layouts
    # prune; the assertion checks the zone-map containment logic and
    # the total bookkeeping, not the (data-dependent) win ratio.
    df = spark.createDataFrame(
        [(i, i) for i in range(256)], schema="k1 long, k2 long")
    rows = skipping_eval(df, "k1", "k2", n_probes=3).collect()
    assert len(rows) == 3
    for r in rows:
        assert 1 <= r["natural_scanned"]
        assert 1 <= r["zorder_scanned"]
        assert r["total_buckets"] == rows[0]["total_buckets"] > 0
