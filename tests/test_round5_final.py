"""Unit tests for the round-5 final-sitting operators — exact expected
values on tiny hand-checked inputs, independent of the DuckDB oracles:
exact-substring dedup stats (Lee et al. windows), TransE id mapping,
temporal snapshot reads, N-Triples export, overlap chunking, the Zipf
vocabulary profile, the incremental ingest-dedup gate, label-propagation
communities, the BPE merge-pair table, HITS, and user-growth curves."""

import hashlib

import pytest

from deepref_spark.operators.dedup import substring_dup_stats
from deepref_spark.operators.graph import (
    export_ntriples, id_map_triples, snapshot_at,
)
from deepref_spark.operators.text_analysis import chunk_overlap, zipf_profile


def _docs(spark, texts, source="s1"):
    return spark.createDataFrame(
        [(i, t, source) for i, t in enumerate(texts)],
        schema="doc_id long, text string, source string",
    )


# --- substring_dup_stats ----------------------------------------------------

def test_substring_dup_stats_cross_doc_window(spark):
    # "a b c" (k=3) occurs in docs 0 and 1 -> each doc's first window is
    # duplicated; the remaining windows are corpus-unique.
    out = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
           for r in substring_dup_stats(
               _docs(spark, ["a b c d", "a b c x", "z y w"]), k=3).collect()}
    assert out == {0: (2, 1, 0.5), 1: (2, 1, 0.5), 2: (1, 0, 0.0)}


def test_substring_dup_stats_within_doc_repeat_counts(spark):
    # Lee et al. semantics: a window whose TOTAL corpus frequency > 1 is
    # duplicated — including repeats inside one document ("q q q q q"
    # emits the window "q q q" three times).
    out = substring_dup_stats(_docs(spark, ["q q q q q"]), k=3).collect()
    assert [(r["n_windows"], r["n_dup_windows"], r["dup_frac"])
            for r in out] == [(3, 3, 1.0)]


def test_substring_dup_stats_short_doc_single_window(spark):
    # n < k: greatest(1, n-k+1) = 1 -> exactly one (short) window.
    out = substring_dup_stats(_docs(spark, ["only two"]), k=5).collect()
    assert [(r["n_windows"], r["n_dup_windows"]) for r in out] == [(1, 0)]


# --- id_map_triples ---------------------------------------------------------

def test_id_map_triples_sorted_dense_ids(spark):
    t = spark.createDataFrame(
        [("b", "r1", "c"), ("a", "r2", "b")],
        schema="subj_canon string, pred string, obj_canon string",
    )
    rows = sorted(tuple(r) for r in id_map_triples(t).collect())
    # entities sorted: a=0, b=1, c=2; relations sorted: r1=0, r2=1
    assert rows == [
        (0, 1, 1, "a", "r2", "b"),
        (1, 0, 2, "b", "r1", "c"),
    ]


# --- snapshot_at ------------------------------------------------------------

def test_snapshot_at_latest_op_wins(spark):
    log = spark.createDataFrame(
        [
            ("x", "p", "o", 10, "assert"),                      # live
            ("y", "p", "o", 10, "assert"), ("y", "p", "o", 20, "retract"),  # dead
            ("z", "p", "o", 10, "assert"), ("z", "p", "o", 60, "retract"),  # future retract -> live
            ("w", "p", "o", 70, "assert"),                      # asserted after cutoff
            ("v", "p", "o", 10, "assert"), ("v", "p", "o", 20, "retract"),
            ("v", "p", "o", 30, "assert"),                      # re-asserted -> live
        ],
        schema="subj string, pred string, obj string, ts long, op string",
    )
    rows = {r["subj"]: r["valid_from"]
            for r in snapshot_at(log, cutoff=50).collect()}
    assert rows == {"x": 10, "z": 10, "v": 30}


# --- export_ntriples --------------------------------------------------------

def test_export_ntriples_percent_encoding_and_shape(spark):
    t = spark.createDataFrame(
        [("new york", "cap-of", "usa")],
        schema="subj_canon string, pred string, obj_canon string",
    )
    rows = export_ntriples(t).collect()
    assert rows[0]["pred"] == "cap-of"
    assert rows[0]["line"] == (
        "<urn:kg:e:new%20york> <urn:kg:p:cap-of> <urn:kg:e:usa> ."
    )


# --- chunk_overlap ----------------------------------------------------------

def test_chunk_overlap_strides_and_tail(spark):
    toks = "a b c d e f g h i j"  # n = 10, size 4, overlap 2 -> stride 2
    out = sorted(
        (r["chunk_idx"], r["start0"], r["chunk_len"], r["chunk_hash"])
        for r in chunk_overlap(_docs(spark, [toks]), size=4, overlap=2).collect()
    )
    assert [(i, s, ln) for i, s, ln, _ in out] == [
        (0, 0, 4), (1, 2, 4), (2, 4, 4), (3, 6, 4), (4, 8, 2),
    ]
    first = "a b c d"
    assert out[0][3] == hashlib.md5(first.encode()).hexdigest()
    last = "i j"
    assert out[4][3] == hashlib.md5(last.encode()).hexdigest()


def test_chunk_overlap_rejects_nonpositive_stride(spark):
    with pytest.raises(ValueError):
        chunk_overlap(_docs(spark, ["a b"]), size=4, overlap=4)


# --- zipf_profile -----------------------------------------------------------

def test_zipf_profile_buckets_and_ppm(spark):
    # source s1: freqs a=4 (bucket 2), b=1 (bucket 0); total mass 5.
    out = {(r["source"], r["bucket"]):
           (r["n_tokens"], r["occurrences"], r["min_freq"], r["max_freq"],
            r["share_ppm"])
           for r in zipf_profile(_docs(spark, ["a a a a b"])).collect()}
    assert out == {
        ("s1", 2): (1, 4, 4, 4, 800000),
        ("s1", 0): (1, 1, 1, 1, 200000),
    }


def test_zipf_profile_share_is_within_source(spark):
    # Two sources with different masses: ppm shares are per-source.
    docs = spark.createDataFrame(
        [(0, "a a a", "s1"), (1, "b", "s2")],
        schema="doc_id long, text string, source string",
    )
    out = {(r["source"], r["bucket"]): r["share_ppm"]
           for r in zipf_profile(docs).collect()}
    assert out == {("s1", 1): 1000000, ("s2", 0): 1000000}


# --- incremental_dedup --------------------------------------------------------

def test_incremental_dedup_flags_known_dup(spark):
    from deepref_spark.operators.dedup import incremental_dedup

    corpus = _docs(spark, [
        "the quick brown fox jumps over the lazy dog today",
        "completely different content about spark shuffles and joins",
    ])
    # batch doc 100 = near-identical to corpus doc 0; doc 101 novel
    batch = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today", "s1"),
         (101, "nothing like anything in the existing corpus at all xyz", "s1")],
        schema="doc_id long, text string, source string",
    )
    rows = {r["doc_id"]: (r["dup_of"], r["is_dup"])
            for r in incremental_dedup(corpus, batch).collect()}
    assert rows[100] == (0, True)
    assert rows[101] == (None, False)


# --- label_prop ---------------------------------------------------------------

def test_label_prop_two_rounds_deterministic(spark):
    from deepref_spark.operators.graph import label_prop

    # triangle a-b-c plus isolated pair x-y; hand-walked rounds
    # (neighbor labels only, max-label tie-break):
    #   nbrs(a)={b,c} -> counts {b:1,c:1} -> max lbl 'c'
    #   nbrs(b)={a,c} -> 'c'; nbrs(c)={a,b} -> 'b'
    #   nbrs(x)={y} -> 'y'; nbrs(y)={x} -> 'x'
    # Round 2 on (a:'c', b:'c', c:'b', x:'y', y:'x'):
    #   a: lbls of {b,c} = {'c','b'} -> 'c'
    #   b: lbls of {a,c} = {'c','b'} -> 'c'
    #   c: lbls of {a,b} = {'c','c'} -> 'c'
    #   x: lbl of y = 'x'; y: lbl of x = 'y'
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y")],
        schema="src string, dst string",
    )
    rows = {r["entity"]: r["community"]
            for r in label_prop(edges, iters=2).collect()}
    assert rows == {"a": "c", "b": "c", "c": "c", "x": "x", "y": "y"}


# --- bpe_merge_pairs ----------------------------------------------------------

def test_bpe_merge_pairs_counts_and_order(spark):
    from deepref_spark.operators.text_analysis import bpe_merge_pairs

    rows = [(r["pair"], r["cnt"]) for r in bpe_merge_pairs(
        _docs(spark, ["a b a b a", "z a b"]), top_k=3).collect()]
    # pairs doc0: (a b),(b a),(a b),(b a); doc1: (z a),(a b)
    # counts: 'a b'=3, 'b a'=2, 'z a'=1; order (cnt DESC, pair ASC)
    assert rows == [("a b", 3), ("b a", 2), ("z a", 1)]


def test_bpe_merge_pairs_skips_single_token_docs(spark):
    from deepref_spark.operators.text_analysis import bpe_merge_pairs

    rows = bpe_merge_pairs(_docs(spark, ["solo", "x y"]), top_k=5).collect()
    assert [(r["pair"], r["cnt"]) for r in rows] == [("x y", 1)]


# --- hits ---------------------------------------------------------------------

def test_hits_two_hubs_one_authority(spark):
    from deepref_spark.operators.graph import hits

    # a->c, b->c. Hand-walk on the unit grid U with the two-stage
    # normalization (raw div greatest(1, total div U)):
    #  round 1: a_raw(c)=2U, total 2U -> auth c=U, a=b=0;
    #           h_raw(a)=h_raw(b)=U, total 2U -> hub a=b=U/2, c=0.
    #  round 2: a_raw(c)=U, total U -> auth c=U;
    #           h_raw(a)=h_raw(b)=U, total 2U -> hub a=b=U/2.
    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c")], schema="src string, dst string")
    rows = {r["entity"]: (r["authority"], r["hub"])
            for r in hits(edges, iters=2).collect()}
    assert rows == {"a": (0.0, 0.5), "b": (0.0, 0.5), "c": (1.0, 0.0)}


# --- user_growth --------------------------------------------------------------

def test_user_growth_cumulative_and_segmented(spark):
    import datetime

    from deepref_spark.operators.events import user_growth

    d1, d2 = datetime.datetime(2024, 1, 1, 9), datetime.datetime(2024, 1, 2, 9)
    ev = spark.createDataFrame(
        [(1, d1, "view"), (2, d1, "view"), (1, d2, "view"),  # u1 returns: not new
         (3, d2, "view"),
         (1, d2, "click")],                                   # u1 adopts click on day 2
        schema="user_id long, ts timestamp, event_type string",
    )
    rows = {(r["event_type"], str(r["day"])): (r["new_users"], r["total_users"])
            for r in user_growth(ev, segment_col="event_type").collect()}
    assert rows == {
        ("view", "2024-01-01"): (2, 2),
        ("view", "2024-01-02"): (1, 3),
        ("click", "2024-01-02"): (1, 1),
    }

    global_rows = {str(r["day"]): (r["new_users"], r["total_users"])
                   for r in user_growth(ev).collect()}
    assert global_rows == {"2024-01-01": (2, 2), "2024-01-02": (1, 3)}
