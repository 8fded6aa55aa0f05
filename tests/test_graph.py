"""Unit tests for the graph-analytics operators (operators/graph.py)
and SemDeDup (operators/similarity.semdedup) on tiny hand-checked
inputs — exact expected values, independent of the DuckDB oracles."""

import pyspark.sql.functions as F

import pytest

from deepref_spark.operators.graph import (
    UNIT, entity_degrees, graph_edges, graph_report, kcore,
    link_prediction, merge_triples, multihop, pagerank,
)
from deepref_spark.operators.similarity import centroid_classify, semdedup


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, schema="subj_canon string, obj_canon string")
    return graph_edges(df)


def test_graph_edges_dedup_and_self_loops(spark):
    e = _edges(spark, [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c")])
    assert sorted(tuple(r) for r in e.collect()) == [("a", "b"), ("b", "c")]


def test_entity_degrees_tiny(spark):
    # a->b, a->c, b->c: out a=2 b=1 c=0; in a=0 b=1 c=2
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c")])
    rows = {r["entity"]: (r["out_deg"], r["in_deg"], r["degree"])
            for r in entity_degrees(e).collect()}
    assert rows == {"a": (2, 0, 2), "b": (1, 1, 2), "c": (0, 2, 2)}


def test_pagerank_two_node_cycle_conserves_rank(spark):
    # a<->b: every round each node receives the other's full rank, so
    # u stays at UNIT for both: base + floor(0.85 * UNIT) = UNIT.
    e = _edges(spark, [("a", "b"), ("b", "a")])
    rows = {r["entity"]: r["pagerank"] for r in pagerank(e, iters=3).collect()}
    assert rows == {"a": 1.0, "b": 1.0}


def test_pagerank_hand_unrolled_chain(spark):
    # a->b, b->a, a->c (a splits rank between b and c; c is a sink).
    # Hand-unroll one round on the integer grid:
    #   base = UNIT - (17*UNIT)//20
    #   u1(a) = base + (17 * u0(b)//1) // 20
    #   u1(b) = u1(c) = base + (17 * (u0(a)//2)) // 20
    base = UNIT - (17 * UNIT) // 20
    u1a = base + (17 * UNIT) // 20
    u1bc = base + (17 * (UNIT // 2)) // 20
    e = _edges(spark, [("a", "b"), ("b", "a"), ("a", "c")])
    rows = {r["entity"]: r["pagerank"] for r in pagerank(e, iters=1).collect()}
    assert rows == {"a": u1a / UNIT, "b": u1bc / UNIT, "c": u1bc / UNIT}


def test_link_prediction_path_hand_checked(spark):
    # path a-b-c: the only non-adjacent pair is (a, c), common
    # neighbor b with deg(b)=2 -> n_common=1, jaccard = 1/(1+1-1)=1,
    # ra = floor(UNIT/2)/UNIT = 0.5.
    e = _edges(spark, [("a", "b"), ("b", "c")])
    rows = [tuple(r) for r in link_prediction(e).collect()]
    assert rows == [("a", "c", 1, 1.0, 0.5)]


def test_link_prediction_hub_cap_excludes_hub_wedges(spark):
    # star h-{a,b,c}: every non-adjacent pair's only common neighbor
    # is the degree-3 hub; hub_cap=2 excludes it -> no candidates.
    e = _edges(spark, [("h", "a"), ("h", "b"), ("h", "c")])
    assert len(link_prediction(e).collect()) == 3  # (a,b),(a,c),(b,c)
    assert link_prediction(e, hub_cap=2).isEmpty()


def test_link_prediction_existing_edges_dropped(spark):
    # triangle a-b-c: every pair is already an edge -> no candidates,
    # even though every pair shares a common neighbor.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert link_prediction(e).isEmpty()


def test_kcore_peels_pendant_tail(spark):
    # triangle a-b-c with pendant chain c-d, d-e: 2-core = the
    # triangle (two peel rounds: e then d), each member core_deg 2.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                       ("c", "d"), ("d", "e")])
    rows = {r["entity"]: r["core_deg"] for r in kcore(e, k=2).collect()}
    assert rows == {"a": 2, "b": 2, "c": 2}


def test_kcore_empty_when_graph_dissolves(spark):
    # a path has no 2-core: peeling consumes everything.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert kcore(e, k=2).isEmpty()


def test_kcore_raises_instead_of_truncating(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(e, k=2, max_rounds=1)


_TRIPLE_SCHEMA = ("subj_canon string, pred string, obj_canon string, "
                  "n_docs long, max_score double")


def test_merge_triples_add_max_and_status(spark):
    ex = spark.createDataFrame(
        [("a", "r", "b", 2, 0.5), ("c", "r", "d", 1, 0.9)], _TRIPLE_SCHEMA)
    inc = spark.createDataFrame(
        [("a", "r", "b", 3, 0.7), ("e", "r", "f", 1, 0.1)], _TRIPLE_SCHEMA)
    rows = {(r["subj_canon"], r["pred"], r["obj_canon"]):
            (r["n_docs"], r["max_score"], r["status"])
            for r in merge_triples(ex, inc).collect()}
    assert rows == {
        ("a", "r", "b"): (5, 0.7, "updated"),
        ("c", "r", "d"): (1, 0.9, "existing"),
        ("e", "r", "f"): (1, 0.1, "new"),
    }


def _dedges(spark, pairs):
    return spark.createDataFrame(pairs, schema="src string, dst string")


def test_multihop_chain_and_diamond(spark):
    # chain a->b->c->d plus the diamond shortcut a->x->d:
    # (a,d) reachable in 3 (via b,c) and via x in 2 -> min_hops 2,
    # n_paths 2 (one 3-hop + one 2-hop path).
    e = _dedges(spark, [("a", "b"), ("b", "c"), ("c", "d"),
                        ("a", "x"), ("x", "d")])
    rows = {(r["src"], r["dst"]): (r["min_hops"], r["n_paths"])
            for r in multihop(e, max_hops=3).collect()}
    assert rows[("a", "d")] == (2, 2)
    assert rows[("a", "c")] == (2, 1)
    assert rows[("b", "d")] == (2, 1)
    assert rows[("a", "b")] == (1, 1)


def test_multihop_cycle_counts_revisits(spark):
    # 2-cycle a<->b: (a,a) and (b,b) close in 2 hops; (a,b) has the
    # direct edge plus the 3-hop a->b->a->b walk -> n_paths 2.
    e = _dedges(spark, [("a", "b"), ("b", "a")])
    rows = {(r["src"], r["dst"]): (r["min_hops"], r["n_paths"])
            for r in multihop(e, max_hops=3).collect()}
    assert rows[("a", "a")] == (2, 1)
    assert rows[("a", "b")] == (1, 2)


def test_graph_report_composes_all_four_analytics(spark):
    # triangle a-b-c with pendant c->d: the report must agree with the
    # individual analytics — triangle members have clustering 1.0 and
    # sit in the 2-core; the pendant d has degree 1, no triangles, and
    # is outside the core (zero defaults, flag false).
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    rows = {r["entity"]: r for r in graph_report(e, k=2).collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    for v in ("a", "b"):
        assert rows[v]["n_triangles"] == 1 and rows[v]["clustering"] == 1.0
        assert rows[v]["in_kcore"] and rows[v]["core_deg"] == 2
    assert rows["c"]["und_degree"] == 3 and rows["c"]["in_kcore"]
    assert rows["d"] ["n_triangles"] == 0 and not rows["d"]["in_kcore"]
    assert rows["d"]["core_deg"] == 0 and rows["d"]["clustering"] == 0.0
    # pagerank column is the pagerank() output verbatim
    pr = {r["entity"]: r["pagerank"] for r in pagerank(graph_edges(
        spark.createDataFrame([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
                              schema="subj_canon string, obj_canon string")
    ), iters=3).collect()}
    for v, r in rows.items():
        assert r["pagerank"] == pr[v]


def test_centroid_classify_separable_and_tie_break(spark):
    # separable pair of classes on the x axis: everything classifies
    # to its own label -> diagonal confusion counts.
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0], 0), (2, [0.2, 0.0], 0),
         (3, [1.0, 0.0], 1), (4, [0.8, 0.0], 1)],
        schema="vec_id long, embedding array<float>, label int")
    rows = {(r["label"], r["pred_label"]): r["n"]
            for r in centroid_classify(emb).collect()}
    assert rows == {(0, 0): 2, (1, 1): 2}
    # identical centroids (label 1's y components cancel exactly) ->
    # every vector ties on d2 and the deterministic lowest-label
    # tie-break sends ALL of them to label 0.
    emb2 = spark.createDataFrame(
        [(1, [0.4, 0.0], 0), (2, [0.6, 0.0], 0),
         (3, [0.5, 0.9], 1), (4, [0.5, -0.9], 1)],
        schema="vec_id long, embedding array<float>, label int")
    rows2 = {(r["label"], r["pred_label"]): r["n"]
             for r in centroid_classify(emb2).collect()}
    assert rows2 == {(0, 0): 2, (1, 0): 2}


def test_semdedup_drops_all_but_one_per_dup_group(spark):
    # Two tight groups of 3 (pairwise cos ~1 within, ~0 across) plus
    # one isolated point. n_lists=1 puts everything in one cluster so
    # EVERY duplicate pair is in the comparison set: the keep order
    # (lowest centroid cosine first, ties by vec_id — the SemDeDup
    # keep-furthest rule) must leave exactly one survivor per group
    # and never touch the isolated point. (With n_lists > 1 a tight
    # group can straddle a list boundary and keep one member per list
    # — inherent IVF approximation, not tested here.)
    rows = []
    for i, b in enumerate([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]):
        for j in range(3):
            v = [x + (0.001 * (j + 1) if k == 2 else 0.0)
                 for k, x in enumerate(b)]
            rows.append((i * 10 + j, v))
    rows.append((99, [0.0, 0.0, 1.0]))
    emb = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    out = semdedup(emb, n_lists=1, threshold=0.95).collect()
    kept = sorted(r["vec_id"] for r in out if r["keep"])
    assert len(out) == 7
    assert 99 in kept
    assert len(kept) == 3
    assert {v // 10 for v in kept if v != 99} == {0, 1}
