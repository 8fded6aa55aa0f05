"""Unit tests for the eighth-sitting operators — exact expected values
on tiny hand-checked inputs, independent of the DuckDB oracles:
event-trigram mining, rolling distinct users, snapshot diff, semi-naive
taxonomy closure, and directed SCC."""

import pytest

from deepref_spark.operators.events import (rolling_distinct_users,
                                            sequence_trigrams)
from deepref_spark.operators.graph import scc, snapshot_diff, taxonomy_closure

_EV_SCHEMA = ("event_id long, ts string, user_id long, "
              "event_type string, value double")


def test_sequence_trigrams_hand_counts(spark):
    # user 1: a b a b a -> trigrams (a,b,a) x2, (b,a,b) x1
    # user 2: a b a     -> (a,b,a) x1
    # support >= 2 keeps only (a,b,a) with n=3
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:01", 1, "a", 0.0),
         (2, "2024-01-01 00:00:02", 1, "b", 0.0),
         (3, "2024-01-01 00:00:03", 1, "a", 0.0),
         (4, "2024-01-01 00:00:04", 1, "b", 0.0),
         (5, "2024-01-01 00:00:05", 1, "a", 0.0),
         (6, "2024-01-01 00:00:01", 2, "a", 0.0),
         (7, "2024-01-01 00:00:02", 2, "b", 0.0),
         (8, "2024-01-01 00:00:03", 2, "a", 0.0)],
        schema=_EV_SCHEMA,
    )
    rows = sequence_trigrams(ev).collect()
    assert [(r["t1"], r["t2"], r["t3"], r["n"]) for r in rows] == \
        [("a", "b", "a", 3)]
    # min_count=1 also surfaces (b,a,b)
    all_rows = {(r["t1"], r["t2"], r["t3"]): r["n"]
                for r in sequence_trigrams(ev, min_count=1).collect()}
    assert all_rows == {("a", "b", "a"): 3, ("b", "a", "b"): 1}


def test_sequence_trigrams_tie_break_is_event_id(spark):
    # same-ts events order by event_id: stream is x, y, z
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "x", 0.0),
         (2, "2024-01-01 00:00:00", 1, "y", 0.0),
         (3, "2024-01-01 00:00:00", 1, "z", 0.0)],
        schema=_EV_SCHEMA,
    )
    rows = sequence_trigrams(ev, min_count=1).collect()
    assert [(r["t1"], r["t2"], r["t3"], r["n"]) for r in rows] == \
        [("x", "y", "z", 1)]


def test_rolling_distinct_users_hand_window(spark):
    # day 1: users {1, 2}; day 2: {2}; day 9: {3}
    # dau: d1=2, d2=1, d9=1
    # wau_7d (trailing 7 days ending that day):
    #   d1 = {1,2} -> 2; d2 = {1,2} -> 2; d9 = {3} -> 1 (d1/d2 expired)
    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, "a", 0.0),
         (2, "2024-01-01 11:00:00", 2, "a", 0.0),
         (3, "2024-01-01 12:00:00", 2, "a", 0.0),
         (4, "2024-01-02 10:00:00", 2, "a", 0.0),
         (5, "2024-01-09 10:00:00", 3, "a", 0.0)],
        schema=_EV_SCHEMA,
    )
    out = {str(r["day"]): (r["dau"], r["wau_7d"])
           for r in rolling_distinct_users(ev).collect()}
    assert out == {"2024-01-01": (2, 2),
                   "2024-01-02": (1, 2),
                   "2024-01-09": (1, 1)}


def test_rolling_distinct_users_window_edge(spark):
    # day 8 is exactly 7 days after day 1 -> day 1's users are OUT of
    # the [day 2, day 8] window; day 7 still holds them ([d1, d7]).
    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, "a", 0.0),
         (2, "2024-01-07 10:00:00", 2, "a", 0.0),
         (3, "2024-01-08 10:00:00", 2, "a", 0.0)],
        schema=_EV_SCHEMA,
    )
    out = {str(r["day"]): r["wau_7d"]
           for r in rolling_distinct_users(ev).collect()}
    assert out == {"2024-01-01": 1, "2024-01-07": 2, "2024-01-08": 1}


_LOG_SCHEMA = "subj string, pred string, obj string, ts long, op string"


def test_snapshot_diff_three_statuses(spark):
    log = spark.createDataFrame(
        [("a", "p", "x", 100, "assert"),                # live both -> kept
         ("b", "p", "x", 400, "assert"),                # only at t2 -> added
         ("c", "p", "x", 100, "assert"),
         ("c", "p", "x", 350, "retract"),               # only at t1 -> removed
         ("d", "p", "x", 600, "assert"),                # live at neither
         ("e", "p", "x", 100, "assert"),
         ("e", "p", "x", 200, "retract"),               # dead before t1
         ("e", "p", "x", 450, "assert")],               # re-asserted -> added
        schema=_LOG_SCHEMA,
    )
    out = {r["subj"]: r["status"]
           for r in snapshot_diff(log, t1=300, t2=500).collect()}
    assert out == {"a": "kept", "b": "added", "c": "removed", "e": "added"}


_TAX_SCHEMA = "child string, parent string"


def test_taxonomy_closure_depths(spark):
    #       a
    #      / \
    #     b   c
    #    / \
    #   d   e
    tax = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("d", "b"), ("e", "b")],
        schema=_TAX_SCHEMA,
    )
    out = {(r["child"], r["anc"]): r["depth"]
           for r in taxonomy_closure(tax).collect()}
    assert out == {("b", "a"): 1, ("c", "a"): 1, ("d", "b"): 1,
                   ("e", "b"): 1, ("d", "a"): 2, ("e", "a"): 2}


def test_taxonomy_closure_raises_on_cycle(spark):
    tax = spark.createDataFrame(
        [("a", "b"), ("b", "a")], schema=_TAX_SCHEMA)
    with pytest.raises(RuntimeError, match="converge"):
        taxonomy_closure(tax, max_rounds=4)


_EDGE_SCHEMA = "src string, dst string"


def test_scc_hand_graph(spark):
    # cycle {a,b,c}, bridge c->d->e, cycle {e,f}, stray edge g->h
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("c", "d"), ("d", "e"),
         ("e", "f"), ("f", "e"),
         ("g", "h")],
        schema=_EDGE_SCHEMA,
    )
    out = {r["entity"]: (r["scc_id"], r["scc_size"])
           for r in scc(edges).collect()}
    assert out == {"a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
                   "d": ("d", 1),
                   "e": ("e", 2), "f": ("e", 2),
                   "g": ("g", 1), "h": ("h", 1)}


def test_scc_acyclic_all_singletons(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        schema=_EDGE_SCHEMA,
    )
    rows = scc(edges).collect()
    assert all(r["scc_size"] == 1 and r["scc_id"] == r["entity"]
               for r in rows)
    assert {r["entity"] for r in rows} == {"a", "b", "c", "d"}


def test_scc_two_knots_sharing_a_dag(spark):
    # two separate 2-cycles joined by a DAG path; the coloring round
    # must NOT merge them (forward-min alone would color both with the
    # global min — the backward sweep is what separates them)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"),          # knot {a,b}
         ("b", "m"), ("m", "y"),          # DAG bridge
         ("y", "z"), ("z", "y")],         # knot {y,z}
        schema=_EDGE_SCHEMA,
    )
    out = {r["entity"]: (r["scc_id"], r["scc_size"])
           for r in scc(edges).collect()}
    assert out == {"a": ("a", 2), "b": ("a", 2),
                   "m": ("m", 1),
                   "y": ("y", 2), "z": ("y", 2)}


def test_harmonic_centrality_path_graph(spark):
    # path a-b-c, all 3 nodes are seeds (n_seeds=3), grid lcm(1..4)=12:
    # H(a) = 12/1 (b) + 12/2 (c) = 18; H(b) = 12 + 12 = 24; H(c) = 18
    from deepref_spark.operators.graph import harmonic_centrality

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], schema=_EDGE_SCHEMA)
    out = {r["entity"]: (r["n_seeds_reached"], r["h_units"], r["harmonic"])
           for r in harmonic_centrality(edges, n_seeds=3).collect()}
    assert out == {"a": (2, 18, 1.5), "b": (2, 24, 2.0), "c": (2, 18, 1.5)}


def test_harmonic_centrality_disconnected(spark):
    # two components; unreachable seeds contribute nothing
    from deepref_spark.operators.graph import harmonic_centrality

    edges = spark.createDataFrame(
        [("a", "b"), ("c", "d")], schema=_EDGE_SCHEMA)
    out = {r["entity"]: (r["n_seeds_reached"], r["h_units"])
           for r in harmonic_centrality(edges, n_seeds=4).collect()}
    assert out == {"a": (1, 12), "b": (1, 12), "c": (1, 12), "d": (1, 12)}


def test_quantile_hist_hand_buckets(spark):
    from deepref_spark.operators.lakeops import quantile_hist

    df = spark.createDataFrame(
        [(0.50,), (1.50,), (2.50,), (3.50,)],
        schema="l_extendedprice double")
    out = {r["pct"]: (r["bucket"], r["est_lo_cents"], r["cum_rows"],
                      r["total_rows"])
           for r in quantile_hist(df, width_cents=100).collect()}
    # cum: b0=1, b1=2, b2=3, b3=4; rule cum*100 >= pct*4
    assert out == {50: (1, 100, 2, 4),
                   95: (3, 300, 4, 4),
                   99: (3, 300, 4, 4)}


def test_ivf_quality_consistent_with_assignments(spark):
    # n_members must reproduce the ivf_assignments list sizes exactly,
    # and cohesion stats must be sane cosines with min <= mean
    from deepref_spark.operators.similarity import (ivf_assignments,
                                                    ivf_quality)
    from deepref_spark.schemas import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qual = {r["list_id"]: r for r in ivf_quality(emb, n_lists=16).collect()}
    sizes = {r["list_id"]: r["n"]
             for r in ivf_assignments(emb, n_lists=16)
             .groupBy("list_id").count().withColumnRenamed("count", "n")
             .collect()}
    assert {k: v["n_members"] for k, v in qual.items()} == sizes
    assert sum(v["n_members"] for v in qual.values()) == emb.count()
    for v in qual.values():
        assert -1.0 <= v["min_csim"] <= v["mean_csim"] <= 1.0


def test_domain_range_audit_hand_majority(spark):
    from deepref_spark.operators.kgquality import domain_range_audit

    # p's subjects: a, a2 share signature 'S:p'; z has 'O:q S:p'
    # -> domain majority 'S:p' (n=2), z is the one domain violation.
    # p's objects: x, y, w all have signature 'O:p' -> no range viol.
    t = spark.createDataFrame(
        [("a", "p", "x"), ("a2", "p", "y"), ("z", "p", "w"),
         ("q_s", "q", "z")],
        schema="subj_canon string, pred string, obj_canon string")
    out = {r["pred"]: r for r in domain_range_audit(t).collect()}
    assert out["p"]["n_triples"] == 3
    assert out["p"]["n_domain_viol"] == 1
    assert out["p"]["n_range_viol"] == 0
    assert out["p"]["domain_sig"] == "S:p"
    assert out["p"]["range_sig"] == "O:p"
    # q has a single triple: its own sig is the majority, no violations
    assert out["q"]["n_domain_viol"] == 0 and out["q"]["n_range_viol"] == 0


def test_cohort_matrix_hand_triangle(spark):
    from deepref_spark.operators.events import cohort_matrix

    # epoch weeks: 1970-01-01..07 = week 0, 08..14 = week 1, 15.. = 2
    # user 1 first week 0, active weeks {0, 1}; user 2 first week 0,
    # active {0}; user 3 first week 1, active {1, 2}
    ev = spark.createDataFrame(
        [(1, "1970-01-02 00:00:00", 1, "a", 0.0),
         (2, "1970-01-09 00:00:00", 1, "a", 0.0),
         (3, "1970-01-03 00:00:00", 2, "a", 0.0),
         (4, "1970-01-10 00:00:00", 3, "a", 0.0),
         (5, "1970-01-16 00:00:00", 3, "a", 0.0)],
        schema=_EV_SCHEMA,
    )
    out = {(r["cohort_week"], r["age_weeks"]):
           (r["n_active"], r["cohort_size"], r["retention_ppm"])
           for r in cohort_matrix(ev).collect()}
    assert out == {(0, 0): (2, 2, 1000000),
                   (0, 1): (1, 2, 500000),
                   (1, 0): (1, 1, 1000000),
                   (1, 1): (1, 1, 1000000)}


def test_gap_fill_locf_hand_spine(spark):
    from deepref_spark.operators.events import gap_fill_locf

    # type 'a': hours 00 (v=1.50+0.50=2.00) and 03 (v=1.00);
    # hours 01, 02 are gaps carrying 200 cents forward
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 1, "a", 1.50),
         (2, "2024-01-01 00:40:00", 2, "a", 0.50),
         (3, "2024-01-01 03:20:00", 1, "a", 1.00)],
        schema=_EV_SCHEMA,
    )
    out = {r["hour"]: (r["n"], r["v_cents_locf"], r["is_gap"])
           for r in gap_fill_locf(ev).collect()}
    assert out == {"2024-01-01 00:00:00": (2, 200, 0),
                   "2024-01-01 01:00:00": (0, 200, 1),
                   "2024-01-01 02:00:00": (0, 200, 1),
                   "2024-01-01 03:00:00": (1, 100, 0)}


def test_scc_condensation_hand_dag(spark):
    from deepref_spark.operators.graph import scc_condensation

    # SCCs: A={a,b,c}, {d}, E={e,f}, {g}, {h}
    # quotient edges: a->d, d->e, g->h; levels a=0,g=0,d=1,h=1,e=2
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("c", "d"), ("d", "e"),
         ("e", "f"), ("f", "e"),
         ("g", "h")],
        schema=_EDGE_SCHEMA,
    )
    out = {r["scc_id"]: (r["n_members"], r["out_edges"], r["in_edges"],
                         r["topo_level"])
           for r in scc_condensation(edges).collect()}
    assert out == {"a": (3, 1, 0, 0), "d": (1, 1, 1, 1),
                   "e": (2, 0, 1, 2), "g": (1, 1, 0, 0),
                   "h": (1, 0, 1, 1)}


def test_validity_lookup_hand_versions(spark):
    from deepref_spark.operators.graph import validity_lookup

    log = spark.createDataFrame(
        [("a", "p", "x", 100, "assert"),
         ("a", "p", "x", 300, "retract"),
         ("a", "p", "x", 500, "assert"),
         ("b", "p", "x", 200, "assert")],
        schema=_LOG_SCHEMA,
    )
    probes = spark.createDataFrame(
        [("a", "p", "x", 150),   # inside [100, 300) -> live, from 100
         ("a", "p", "x", 400),   # in the retracted hole -> dead
         ("a", "p", "x", 600),   # open tail [500, inf) -> live, from 500
         ("b", "p", "x", 100),   # before first assert -> dead
         ("c", "p", "x", 100)],  # never asserted -> dead
        schema="subj string, pred string, obj string, probe_ts long")
    out = {(r["subj"], r["probe_ts"]): (r["live"], r["valid_from"])
           for r in validity_lookup(log, probes).collect()}
    assert out == {("a", 150): (1, 100), ("a", 400): (0, None),
                   ("a", 600): (1, 500), ("b", 100): (0, None),
                   ("c", 100): (0, None)}


def test_neighbor_agg_hand_rounds(spark):
    from deepref_spark.operators.graph import neighbor_agg

    # path a-b-c (undirected): degrees a=1, b=2, c=1
    # h0 milli: a=1000, b=2000, c=1000
    # h1: a = mean(b) = 2000; b = mean(a,c) = 1000; c = 2000
    # h2: a = 1000; b = 2000; c = 1000
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], schema=_EDGE_SCHEMA)
    out = {r["entity"]: (r["und_degree"], r["h1_milli"], r["h2_milli"])
           for r in neighbor_agg(edges, rounds=2).collect()}
    assert out == {"a": (1, 2000, 1000), "b": (2, 1000, 2000),
                   "c": (1, 2000, 1000)}


def test_neighbor_agg_half_up_rounding(spark):
    from deepref_spark.operators.graph import neighbor_agg

    # star: x connects to a, b; a-b not connected; plus a-y tail
    # degrees: x=2, a=3, b=2, y=1  (a: x, b? no... a: x, y, b? )
    # graph: x-a, x-b, a-y, a-b -> deg a=3 (x,y,b), x=2, b=2, y=1
    # h1(y) = mean(a) = 3000; h1(x) = mean(3000_a? no h0) =
    #   mean(h0(a), h0(b)) = (3000+2000)/2 = 2500
    # h1(b) = mean(h0(x), h0(a)) = 2500; h1(a) = mean(2000,2000,1000)
    #   = 5000/3 = 1666.67 -> half-up 1667
    edges = spark.createDataFrame(
        [("x", "a"), ("x", "b"), ("a", "y"), ("a", "b")],
        schema=_EDGE_SCHEMA)
    out = {r["entity"]: r["h1_milli"]
           for r in neighbor_agg(edges, rounds=1).collect()}
    assert out == {"x": 2500, "a": 1667, "b": 2500, "y": 3000}


def test_ab_lift_hand_arms(spark):
    from deepref_spark.operators.events import ab_lift
    from deepref_spark.refsem import md5_mod_py

    # craft users so both arms are non-empty, using the real hash
    users = list(range(1, 9))
    arms = {u: md5_mod_py(str(u), 2) for u in users}
    assert set(arms.values()) == {0, 1}
    rows = []
    eid = 1
    for u in users:
        rows.append((eid, "2024-01-01 00:00:00", u, "view", 0.0)); eid += 1
    # exactly one converter per arm: first user of each arm
    first0 = min(u for u in users if arms[u] == 0)
    first1 = min(u for u in users if arms[u] == 1)
    for u in (first0, first1):
        rows.append((eid, "2024-01-01 01:00:00", u, "purchase", 0.0)); eid += 1
    ev = spark.createDataFrame(rows, schema=_EV_SCHEMA)
    out = {r["arm"]: (r["n_users"], r["n_converted"], r["conv_ppm"],
                      r["lift_ppm"]) for r in ab_lift(ev).collect()}
    n0 = sum(1 for u in users if arms[u] == 0)
    n1 = len(users) - n0
    assert out[0] == (n0, 1, 1000000 // n0, 0)
    assert out[1][0:3] == (n1, 1, 1000000 // n1)
    assert out[1][3] == 1000000 // n1 - 1000000 // n0


def test_boilerplate_stats_hand_docs(spark):
    from deepref_spark.operators.dedup import boilerplate_stats

    docs = spark.createDataFrame(
        [(1, "common footer sentence shared here. unique alpha tail one"),
         (2, "common footer sentence shared here. unique beta tail two"),
         (3, "common footer sentence shared here. unique gamma tail three"),
         (4, "a lonely document sentence only")],
        schema="doc_id long, text string")
    out = {r["doc_id"]: (r["n_passages"], r["n_boiler"], r["boiler_ppm"])
           for r in boilerplate_stats(docs, df_threshold=3).collect()}
    assert out == {1: (2, 1, 500000), 2: (2, 1, 500000),
                   3: (2, 1, 500000), 4: (1, 0, 0)}


def test_hash_features_hand_counts(spark):
    from deepref_spark.operators.text_analysis import hash_features
    from deepref_spark.refsem import md5_mod_py

    docs = spark.createDataFrame(
        [(1, "apple apple banana")], schema="doc_id long, text string")
    out = {(r["doc_id"], r["feat"]): r["cnt"]
           for r in hash_features(docs, dim=32).collect()}
    fa, fb = md5_mod_py("apple", 32), md5_mod_py("banana", 32)
    expected = {}
    expected[(1, fa)] = expected.get((1, fa), 0) + 2
    expected[(1, fb)] = expected.get((1, fb), 0) + 1
    assert out == expected


def test_knn_graph_mutual_filter(spark):
    from deepref_spark.operators.similarity import knn_graph

    # all three share bucket '1111'; with k=1: 1 keeps 2, 2 keeps 1,
    # 3 keeps 2 but 2 does not keep 3 -> only the (1,2) edge survives
    emb = spark.createDataFrame(
        [(1, [1.0, 0.01, 0.01, 0.01]),
         (2, [1.0, 0.02, 0.01, 0.01]),
         (3, [0.01, 1.0, 0.01, 0.01])],
        schema="vec_id long, embedding array<float>")
    rows = knn_graph(emb, k=1, n_planes=4).collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, 2)]
    assert rows[0]["cosine"] > 0.99


def test_skew_report_hand_distribution(spark):
    from deepref_spark.queries import lake_skew_report  # noqa: F401
    # exercise the operator body directly on a tiny frame via the same
    # shape: one hot key (6 rows) + two singletons -> mean = 8 DIV 3
    # = 2, skew_ppm = 6 * 1e6 DIV 2 = 3,000,000
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] + [("c",)], schema="k string")
    g = df.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n"))
    row = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("total_rows"),
        F.max("n").cast("long").alias("max_key_rows"),
        F.expr("sum(n) DIV count(*)").cast("long").alias("mean_rows"),
        F.expr("max(n) * 1000000 DIV (sum(n) DIV count(*))")
        .cast("long").alias("skew_ppm"),
    ).collect()[0]
    assert (row["n_keys"], row["total_rows"], row["max_key_rows"],
            row["mean_rows"], row["skew_ppm"]) == (3, 8, 6, 2, 3000000)


def test_alias_dict_groups_surface_forms(spark):
    # canonicalization collapses normalized-equal surfaces; every
    # canonical must appear among its own aliases and alias counts
    # must sum to the distinct-entity count
    from deepref_spark.queries import REGISTRY

    out = REGISTRY["kg_alias_dict"]["spark"](
        spark, "/root/testdata/sf0.001").collect()
    assert all(r["canonical"] in r["aliases"].split(" | ") for r in out)
    assert sum(r["n_aliases"] for r in out) >= len(out)
    assert any(r["n_aliases"] > 1 for r in out)  # real collapses exist


def test_rrf_fuse_hand_lists(spark):
    from deepref_spark.operators.similarity import rrf_fuse

    # lane A ranks: n1=1, n2=2; lane B ranks: n2=1, n3=2
    # weights (ppm, c=60): r1 -> 16393, r2 -> 16129
    # n2 = 16129 + 16393 = 32522 (top), n1 = 16393, n3 = 16129
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)],
        schema="query_id long, nbr_id long, rank long")
    b = spark.createDataFrame(
        [(1, 20, 1), (1, 30, 2)],
        schema="query_id long, nbr_id long, rank long")
    out = [(r["nbr_id"], r["rrf_ppm"], r["rank"])
           for r in rrf_fuse([a, b], k=3).collect()]
    assert out == [(20, 32522, 1), (10, 16393, 2), (30, 16129, 3)]


def test_rrf_fuse_tie_breaks_on_nbr_id(spark):
    from deepref_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 99, 1), (1, 5, 2)],
        schema="query_id long, nbr_id long, rank long")
    b = spark.createDataFrame(
        [(1, 5, 1), (1, 99, 2)],
        schema="query_id long, nbr_id long, rank long")
    out = [(r["nbr_id"], r["rank"]) for r in rrf_fuse([a, b]).collect()]
    # equal fused scores -> smaller nbr_id first
    assert out == [(5, 1), (99, 2)]


def test_alert_episodes_islands(spark):
    from deepref_spark.operators.events import alert_episodes

    # error counts by hour: h0=2, h1=2, h2=1 (breaks), h3=0 (gap),
    # h4=3 -> episodes with threshold 2: [h0,h1] (peak 2), [h4] (peak 3)
    rows, eid = [], 1
    def add(hh, n):
        nonlocal eid
        for _ in range(n):
            rows.append((eid, f"2024-01-01 {hh:02d}:15:00", eid, "error", 0.0))
            eid += 1
    add(0, 2); add(1, 2); add(2, 1); add(4, 3)
    ev = spark.createDataFrame(rows, schema=_EV_SCHEMA)
    out = {(r["start_hour"], r["end_hour"]): (r["n_hours"], r["peak_n"])
           for r in alert_episodes(ev, threshold=2).collect()}
    assert out == {
        ("2024-01-01 00:00:00", "2024-01-01 01:00:00"): (2, 2),
        ("2024-01-01 04:00:00", "2024-01-01 04:00:00"): (1, 3),
    }


def test_rolling_hourly_counts_gap_aware(spark):
    from deepref_spark.operators.events import rolling_hourly_counts

    # hours 0 (2 events), 1 (gap), 2 (1 event); window 2h:
    # h0 -> 2; h1 -> 2 (h0+h1=2+0); h2 -> 1 (h1+h2=0+1) — a raw
    # hourly agg without the spine would give h2 -> 3 (h0+h2)
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 1, "a", 0.0),
         (2, "2024-01-01 00:20:00", 2, "a", 0.0),
         (3, "2024-01-01 02:30:00", 3, "a", 0.0)],
        schema=_EV_SCHEMA,
    )
    out = {r["hour"]: r["rolling_2h"]
           for r in rolling_hourly_counts(ev, window_hours=2).collect()}
    assert out == {"2024-01-01 00:00:00": 2,
                   "2024-01-01 01:00:00": 2,
                   "2024-01-01 02:00:00": 1}


# --- seeded randomized cross-checks vs pure-Python references --------------
# (the hypothesis discipline without a Spark job per example: fixed
# seeds, independent Python implementations, full-output equality)


def _py_scc(edge_list):
    """Kosaraju reference: entity -> (scc_id=min member, size)."""
    from collections import defaultdict

    fwd, rev = defaultdict(list), defaultdict(list)
    nodes = set()
    for a, b in edge_list:
        if a == b:
            continue
        fwd[a].append(b)
        rev[b].append(a)
        nodes.update((a, b))
    order, seen = [], set()

    def dfs1(u):
        stack = [(u, iter(fwd[u]))]
        seen.add(u)
        while stack:
            v, it = stack[-1]
            adv = next(it, None)
            if adv is None:
                order.append(v)
                stack.pop()
            elif adv not in seen:
                seen.add(adv)
                stack.append((adv, iter(fwd[adv])))
    for u in sorted(nodes):
        if u not in seen:
            dfs1(u)
    comp = {}
    for u in reversed(order):
        if u in comp:
            continue
        members, stack = [], [u]
        comp[u] = None
        while stack:
            v = stack.pop()
            members.append(v)
            for w in rev[v]:
                if w not in comp:
                    comp[w] = None
                    stack.append(w)
        cid = min(members)
        for m in members:
            comp[m] = (cid, len(members))
    return comp


def test_scc_random_digraphs_match_kosaraju(spark):
    import random

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        n = 12
        names = [f"n{i:02d}" for i in range(n)]
        edges = sorted({(names[rng.randrange(n)], names[rng.randrange(n)])
                        for _ in range(22)})
        edges = [(a, b) for a, b in edges if a != b]
        expected = _py_scc(edges)
        df = spark.createDataFrame(edges, schema=_EDGE_SCHEMA)
        got = {r["entity"]: (r["scc_id"], r["scc_size"])
               for r in scc(df).collect()}
        assert got == expected, f"seed {seed}"


def test_taxonomy_closure_random_forest_matches_python(spark):
    import random

    for seed in (3, 11):
        rng = random.Random(seed)
        n = 15
        names = [f"t{i:02d}" for i in range(n)]
        # random forest: each non-root picks an earlier node as parent
        parents = {names[i]: names[rng.randrange(i)]
                   for i in range(1, n) if rng.random() < 0.9}
        expected = {}
        for c, p in parents.items():
            d, a = 1, p
            while True:
                expected[(c, a)] = d
                if a not in parents:
                    break
                a, d = parents[a], d + 1
        df = spark.createDataFrame(list(parents.items()),
                                   schema=_TAX_SCHEMA)
        got = {(r["child"], r["anc"]): r["depth"]
               for r in taxonomy_closure(df).collect()}
        assert got == expected, f"seed {seed}"


def test_rolling_wau_matches_bruteforce(spark):
    import datetime
    import random

    rng = random.Random(42)
    base = datetime.date(2024, 3, 1)
    pairs = sorted({(rng.randrange(1, 9),
                     base + datetime.timedelta(days=rng.randrange(20)))
                    for _ in range(60)})
    rows = [(i + 1, f"{d} 12:00:00", u, "a", 0.0)
            for i, (u, d) in enumerate(pairs)]
    ev = spark.createDataFrame(rows, schema=_EV_SCHEMA)
    days = sorted({d for _, d in pairs})
    expected = {}
    for d in days:
        dau = len({u for u, dd in pairs if dd == d})
        wau = len({u for u, dd in pairs
                   if d - datetime.timedelta(days=6) <= dd <= d})
        expected[str(d)] = (dau, wau)
    got = {str(r["day"]): (r["dau"], r["wau_7d"])
           for r in rolling_distinct_users(ev).collect()}
    assert got == expected


def test_churn_buckets_cumulative_is_live_count(spark):
    # the final live_after must equal the snapshot at max ts, i.e.
    # asserts minus retracts over the whole log
    from deepref_spark.queries import REGISTRY

    rows = sorted(
        REGISTRY["kg_churn_buckets"]["spark"](
            spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["bucket"])
    total_a = sum(r["n_asserts"] for r in rows)
    total_r = sum(r["n_retracts"] for r in rows)
    assert rows[-1]["live_after"] == total_a - total_r
    assert all(r["net"] == r["n_asserts"] - r["n_retracts"] for r in rows)


def test_bucket_balance_accounts_for_all_vectors(spark):
    from deepref_spark.queries import REGISTRY
    from deepref_spark.schemas import load_table

    rows = REGISTRY["emb_bucket_balance"]["spark"](
        spark, "/root/testdata/sf0.001").collect()
    emb_n = load_table(spark, "/root/testdata/sf0.001",
                       "embeddings").count()
    assert sum(r["bucket_size"] * r["n_buckets_at_size"]
               for r in rows) == emb_n
    assert all(r["size_vs_mean_ppm"] > 0 for r in rows)
