"""Unit tests for the round-5 fourth batch — exact expected values on
tiny hand-checked inputs, independent of the DuckDB oracles: k-truss
pruning/convergence, multi-source BFS distances, deterministic walk
validity, and a hand-computed BM25 golden."""

import hashlib
import math

import pytest
import pyspark.sql.functions as F

from deepref_spark.operators.graph import (
    bfs_distances, ktruss, random_walks,
)
from deepref_spark.operators.text_analysis import bm25_topk
from deepref_spark import portable


def _edges(spark, rows):
    return spark.createDataFrame(rows, schema="src string, dst string")


# --- ktruss -------------------------------------------------------------------

def test_ktruss_prunes_pendant_and_recomputes_support(spark):
    # triangle a-b-c plus pendant edge c-d: at k=3 the pendant (support
    # 0) drops in round 1; the triangle's edges keep support 1.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    out = {(r.e1, r.e2): r.support for r in ktruss(e, k=3).collect()}
    assert out == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


def test_ktruss_cascading_prune(spark):
    # two triangles sharing edge b-c, plus edge d-e closing NOTHING:
    # K4 minus one edge {a,b,c,d}: triangles abc and bcd. At k=4
    # (support >= 2) only edge b-c has support 2 in round 1; after the
    # others drop, b-c's support falls to 0 and it drops too ->
    # cascading rounds end with an EMPTY truss.
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"),
                       ("b", "d"), ("c", "d")])
    assert ktruss(e, k=4).count() == 0


def test_ktruss_k3_keeps_closed_clique(spark):
    # K4 is a 4-truss: every edge in 2 triangles; nothing drops even
    # at k=4.
    e = _edges(spark, [("a", "b"), ("a", "c"), ("a", "d"),
                       ("b", "c"), ("b", "d"), ("c", "d")])
    out = ktruss(e, k=4).collect()
    assert len(out) == 6 and all(r.support == 2 for r in out)


def test_ktruss_nonconvergence_raises(spark):
    # max_rounds=0 exhausts the budget immediately on a graph that
    # needs a prune -> must raise, never return a truncated result.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    with pytest.raises(RuntimeError, match="did not converge"):
        ktruss(e, k=3, max_rounds=0)


# --- bfs_distances ------------------------------------------------------------

def test_bfs_path_graph_distances(spark):
    # path a-b-c-d-e, single seed = md5-smallest node; distances are
    # exact hops from it, capped at max_hops.
    nodes = ["a", "b", "c", "d", "e"]
    seed = min(nodes, key=lambda s: (hashlib.md5(s.encode()).hexdigest(), s))
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    out = {r.entity: r.dist for r in
           bfs_distances(e, n_seeds=1, max_hops=2).collect()}
    pos = {n: i for i, n in enumerate(nodes)}
    expect = {n: abs(pos[n] - pos[seed]) for n in nodes
              if abs(pos[n] - pos[seed]) <= 2}
    assert out == expect


def test_bfs_unreached_component_absent(spark):
    # two components; with 1 seed the other component never appears.
    e = _edges(spark, [("a", "b"), ("x", "y")])
    out = bfs_distances(e, n_seeds=1, max_hops=4).collect()
    comps = ({"a", "b"}, {"x", "y"})
    got = {r.entity for r in out}
    assert got in comps
    assert sorted(r.dist for r in out) == [0, 1]


# --- random_walks -------------------------------------------------------------

def _md5_int(s: str) -> int:
    h = hashlib.md5(s.encode()).hexdigest()
    return (ord(h[0]) * 131071 + ord(h[1]) * 8191
            + ord(h[2]) * 127 + ord(h[3]))


def test_random_walks_match_reference_chooser(spark):
    # diamond with a dead end: every step must equal the python
    # re-derivation of the hash chooser over the md5-ranked adjacency.
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s].sort(key=lambda d: (hashlib.md5(d.encode()).hexdigest(), d))
    expect = set()
    for node in ["a", "b", "c", "d"]:
        for w in range(2):
            wid = f"{node}#{w}"
            cur = node
            expect.add((wid, 0, cur))
            for step in range(1, 4):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_md5_int(f"{wid}|{step}") % len(nbrs)]
                expect.add((wid, step, cur))
    out = {(r.walk_id, r.step, r.entity)
           for r in random_walks(_edges(spark, edges)).collect()}
    assert out == expect


def test_random_walks_steps_are_edges(spark):
    # every consecutive (step s-1 -> s) pair within a walk is a real
    # directed edge.
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    rows = random_walks(_edges(spark, edges), walks_per_node=1,
                        walk_len=5).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r.walk_id, {})[r.step] = r.entity
    eset = set(edges)
    for steps in walks.values():
        for s in range(1, max(steps) + 1):
            assert (steps[s - 1], steps[s]) in eset


# --- bm25_topk ----------------------------------------------------------------

def test_bm25_golden_tiny_corpus(spark):
    docs = spark.createDataFrame(
        [(0, "spark join join table"),
         (1, "spark filter"),
         (2, "table scan scan scan")],
        schema="doc_id long, text string")
    out = bm25_topk(docs, queries=(("q", "spark join"),), k=3)
    rows = {r.doc_id: r for r in out.collect()}
    # python re-derivation of the integer formula
    corpus = {0: ["spark", "join", "join", "table"],
              1: ["spark", "filter"],
              2: ["table", "scan", "scan", "scan"]}
    n, tl = 3, 10
    def idf(term):
        df = sum(term in t for t in corpus.values())
        return round(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
    def micro(term, doc):
        tf = corpus[doc].count(term)
        dl = len(corpus[doc])
        return (int(idf(term)) * 22 * tf * tl) // (10 * tf * tl + 3 * tl + 9 * dl * n)
    exp0 = micro("spark", 0) + micro("join", 0)
    exp1 = micro("spark", 1)
    assert rows[0].rank == 1 and rows[0].n_hit_terms == 2
    assert rows[0].score == pytest.approx(round(exp0 / 1e6, 6))
    assert rows[1].rank == 2 and rows[1].n_hit_terms == 1
    assert rows[1].score == pytest.approx(round(exp1 / 1e6, 6))
    assert 2 not in rows  # no query term in doc 2


def test_bm25_rank_ties_break_on_doc_id(spark):
    # identical docs -> identical scores -> rank by doc_id ascending
    docs = spark.createDataFrame(
        [(5, "spark x"), (3, "spark x"), (9, "other words")],
        schema="doc_id long, text string")
    out = bm25_topk(docs, queries=(("q", "spark"),), k=5).collect()
    assert [(r.rank, r.doc_id) for r in sorted(out, key=lambda r: r.rank)] \
        == [(1, 3), (2, 5)]


def test_md5_int_matches_python(spark):
    got = spark.range(1).select(
        F.expr(portable.md5_int("'walkkey|2'")).alias("v")).first().v
    assert got == _md5_int("walkkey|2")


# --- media phash dedup ----------------------------------------------------

def _phash_py(ref: str) -> int:
    from deepref_spark.refsem import md5_mod_py
    return sum((1 << i) for i in range(16)
               if md5_mod_py(f"{ref}:{i}", 1 << 20) >= 524288)


def test_phash16_matches_python(spark):
    from deepref_spark.operators.multimodal import (
        extract_media_features, phash16,
    )
    media = spark.createDataFrame(
        [("1", 0, "/img/a.png"), ("2", 0, "/img/b.png")],
        "doc_id string, span_idx int, media_ref string")
    rows = (extract_media_features(media)
            .select("media_ref", phash16(F.col("features")).alias("p"))
            .collect())
    for r in rows:
        assert r.p == _phash_py(r.media_ref)


def test_media_dedup_groups_keep_rule(spark):
    from deepref_spark.operators.multimodal import (
        extract_media_features, media_dedup_groups,
    )
    # same ref on docs 7, 3, 12 -> one group, keep numeric-min doc 3
    # (NOT lexicographic-min "12"); unique ref never reported
    media = spark.createDataFrame(
        [("7", 0, "/img/x.png"), ("3", 0, "/img/x.png"),
         ("12", 0, "/img/x.png"), ("5", 0, "/img/solo.png")],
        "doc_id string, span_idx int, media_ref string")
    out = media_dedup_groups(extract_media_features(media)).collect()
    assert len(out) == 1
    assert out[0].n_copies == 3 and out[0].keep_doc_id == 3
    assert out[0].exemplar_ref == "/img/x.png"


def test_phash_near_pairs_band_guarantee(spark):
    from deepref_spark.operators.multimodal import (
        FEATURE_DIM, phash_near_pairs,
    )
    import itertools
    # synthesize features that hit EXACT phashes: feature i = 0.9 if
    # bit set else 0.1
    def feats(p):
        return [0.9 if (p >> i) & 1 else 0.1 for i in range(FEATURE_DIM)]
    phashes = [0b0000000000000000, 0b0000000000000011,  # hamming 2
               0b1111000011110000, 0b1111000011110111]  # hamming 3
    media = spark.createDataFrame(
        [(str(i), 0, f"/img/{i}.png", i, 1, feats(p))
         for i, p in enumerate(phashes)],
        "doc_id string, span_idx int, media_ref string, n_bytes long, "
        "x int, features array<float>")
    got = {(r.phash_a, r.phash_b): r.hamming
           for r in phash_near_pairs(media, max_hamming=3).collect()}
    expect = {}
    for a, b in itertools.combinations(phashes, 2):
        h = bin(a ^ b).count("1")
        if h <= 3:
            expect[(min(a, b), max(a, b))] = h
    assert got == expect
    with pytest.raises(ValueError):
        phash_near_pairs(media, max_hamming=4)


# --- stream-static enrichment ----------------------------------------------

def test_enriched_window_revenue_stream_equals_batch(spark, tmp_path):
    from deepref_spark.schemas import load_table
    from deepref_spark.streaming.stream_ops import enriched_window_revenue

    sf = "/root/testdata/sf0.001"
    cust = load_table(spark, sf, "customer")
    nat = load_table(spark, sf, "nation")
    src = str(tmp_path / "ev_in")
    load_table(spark, sf, "events").limit(300).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        enriched_window_revenue(stream, cust, nat)
        .writeStream.outputMode("append").format("memory")
        .queryName("enrich_out").trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    batch = enriched_window_revenue(spark.read.parquet(src), cust, nat)
    got = {(str(r.window_start), r.n_name): (r.n_purchases, r.total_value)
           for r in spark.sql("SELECT * FROM enrich_out").collect()}
    expect = {(str(r.window_start), r.n_name): (r.n_purchases, r.total_value)
              for r in batch.collect()}
    for k, v in got.items():
        assert expect[k] == v
    assert got  # at least one closed window emitted
