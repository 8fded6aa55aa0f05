"""Unit tests for the eleventh-sitting additions — exact expected
values on tiny hand-checked inputs, independent of the DuckDB oracles:
Newman modularity (ppm grid), bounded-round weighted SSSP (portable
md5 edge costs replicated in Python), multi-pass sorted-neighborhood
blocking (vs a brute-force rank pairing), and cross-document k-gram
novelty (planted shared shingles)."""

import hashlib

import pyspark.sql.functions as F

from deepref_spark.operators.graph import (
    label_prop, modularity_profile, sym_closure, weighted_sssp,
)
from deepref_spark.operators.linking import sorted_neighborhood_pairs
from deepref_spark.operators.text_analysis import novelty_stats


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, schema="src string, dst string")


def _lpa_py(pairs, iters=2):
    """Python twin of graph.label_prop's deterministic sync rounds:
    most-frequent neighbor label, ties -> lexicographically largest."""
    und = set()
    for s, d in pairs:
        und.add((s, d))
        und.add((d, s))
    lbl = {v: v for v, _ in und}
    for _ in range(iters):
        nxt = {}
        for v in lbl:
            counts = {}
            for s, d in und:
                if s == v:
                    counts[lbl[d]] = counts.get(lbl[d], 0) + 1
            mc = max(counts.values())
            nxt[v] = max(l for l, c in counts.items() if c == mc)
        lbl = nxt
    return lbl, und


def _modularity_py(lbl, und):
    tv = len(und)
    per = {}
    for s, d in und:
        c = lbl[s]
        vol, internal = per.get(c, (0, 0))
        per[c] = (vol + 1, internal + (1 if lbl[d] == c else 0))
    rows = {}
    for c, (vol, internal) in per.items():
        vpm = vol * 1_000_000 // tv
        rows[c] = {
            "n_nodes": sum(1 for v in lbl if lbl[v] == c),
            "internal_edges": internal // 2,
            "vol": vol,
            "modularity_ppm": internal * 1_000_000 // tv
            - vpm * vpm // 1_000_000,
        }
    return rows


def test_modularity_two_cliques_exact(spark):
    # two triangles {a,b,c} and {x,y,z} joined by one bridge c-x;
    # expected labels + per-community Q computed by the Python twin
    # of the deterministic LPA + the shared ppm formula.
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    lbl, und_py = _lpa_py(pairs, iters=2)
    expect = _modularity_py(lbl, und_py)

    e = _edges(spark, pairs)
    und = sym_closure(e)
    labels = label_prop(e, iters=2, und=und)
    got = {r["community"]: r
           for r in modularity_profile(e, labels, und=und).collect()}
    assert set(got) == set(expect) | {"__total__"}
    for c, exp in expect.items():
        r = got[c]
        for col, v in exp.items():
            assert r[col] == v, (c, col, r[col], v)
    t = got["__total__"]
    for col in ("n_nodes", "internal_edges", "vol", "modularity_ppm"):
        assert t[col] == sum(e[col] for e in expect.values())


def _wt(src, dst):
    # the portable md5_mod(concat(src,'|',dst), 9) formula in Python
    h = hashlib.md5(f"{src}|{dst}".encode()).hexdigest()
    v = (ord(h[0]) * 131071 + ord(h[1]) * 8191
         + ord(h[2]) * 127 + ord(h[3])) % 9
    return 1 + v


def test_weighted_sssp_matches_python_bellman_ford(spark):
    # chain with a shortcut: seed set = 2 md5-smallest nodes; verify
    # against a pure-Python 3-round Bellman-Ford using the same
    # md5-derived weights.
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
             ("d", "e"), ("b", "e"), ("e", "f")]
    nodes = sorted({n for p in pairs for n in p})
    seeds = sorted(nodes, key=lambda n: (hashlib.md5(n.encode()).hexdigest(), n))[:2]
    dist = {s: 0 for s in seeds}
    for _ in range(3):
        nxt = dict(dist)
        for s, d in pairs:
            if s in dist:
                cand = dist[s] + _wt(s, d)
                if cand < nxt.get(d, 1 << 60):
                    nxt[d] = cand
        dist = nxt
    got = {r["entity"]: r["dist"]
           for r in weighted_sssp(_edges(spark, pairs),
                                  n_seeds=2, rounds=3).collect()}
    assert got == dist


def test_sorted_neighborhood_matches_bruteforce(spark):
    names = ["alpha", "alpos", "beta", "betamax", "gamma",
             "amma", "delta", "atled"]
    ents = spark.createDataFrame([(n,) for n in names],
                                 schema="entity string")
    got = {(r["e1"], r["e2"]): r["n_passes"]
           for r in sorted_neighborhood_pairs(ents, window=3).collect()}

    expect = {}
    for pass_id, key in ((1, lambda n: n), (2, lambda n: n[::-1])):
        order = sorted(names, key=lambda n: (key(n), n))
        for i, a in enumerate(order):
            for b in order[i + 1:i + 4]:
                p = (min(a, b), max(a, b))
                expect.setdefault(p, set()).add(pass_id)
    assert got == {p: len(s) for p, s in expect.items()}
    # both passes agree on lexicographic neighbors that also share
    # suffix order adjacency
    assert got[("alpha", "alpos")] >= 1


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)],
        schema="doc_id string, text string")


def test_novelty_planted_shared_shingle(spark):
    shared = "one two three four five"
    docs = _docs(spark, [
        f"{shared} alpha beta gamma",   # d0: shares the leading 5-gram
        f"{shared} delta epsilon zeta",  # d1: with d0
        "unique tokens only in this document here",  # d2: all novel
        "tiny doc",  # d3: < 5 tokens -> ONE whole-doc shingle
    ])
    got = {r["doc_id"]: r for r in novelty_stats(docs, k=5).collect()}
    assert set(got) == {"d0", "d1", "d2", "d3"}
    # d0/d1: 4 distinct shingles each (8 tokens), exactly 1 shared
    for d in ("d0", "d1"):
        r = got[d]
        assert (r["n_grams"], r["n_shared"]) == (4, 1)
        assert r["novelty_ppm"] == 3 * 1_000_000 // 4
    assert got["d2"]["n_shared"] == 0
    assert got["d2"]["novelty_ppm"] == 1_000_000
    assert (got["d3"]["n_grams"], got["d3"]["n_shared"]) == (1, 0)


def test_modularity_total_row_is_sum(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    out = modularity_profile(e, label_prop(e, iters=2)).collect()
    per = [r for r in out if r["community"] != "__total__"]
    tot = next(r for r in out if r["community"] == "__total__")
    for col in ("n_nodes", "internal_edges", "vol", "modularity_ppm"):
        assert tot[col] == sum(r[col] for r in per)


def test_sssp_no_exchange_explosion(spark):
    # plan hygiene: the relax join must be an equi-join (no cartesian)
    pairs = [("a", "b"), ("b", "c")]
    df = weighted_sssp(_edges(spark, pairs), n_seeds=1, rounds=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert df.count() >= 1


def test_matryoshka_eval_exact(spark):
    # corpus engineered so truncation to 2 dims flips the ranking:
    # q = [1,0,0,0]; n1 matches on the leading dims, n2 only on the
    # tail dims, n3 orthogonal-ish. Full-4d top-2 of q differs from
    # 2d top-2 in exactly one slot -> recall 1/2.
    from deepref_spark.operators.similarity import matryoshka_eval

    rows = [
        (0, [1.0, 0.0, 0.1, 0.1]),     # the query
        (1, [1.0, 0.0, 0.0, 0.0]),     # close at every width
        (2, [0.0, 0.1, 1.0, 1.0]),     # tail-dim neighbor: gone at 2d
        (3, [0.1, 1.0, 0.0, 0.0]),     # 2d: cos small; 4d: smaller than n2
        (4, [-1.0, 0.0, 0.0, 0.0]),    # anti-correlated everywhere
    ]
    emb = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    qs = emb.where("vec_id = 0")
    out = {(r["dim"]): r for r in matryoshka_eval(
        emb, qs, k=2, dims=(4, 2)).collect()}
    # full-width anchor is always perfect recall
    assert (out[4]["n_hit"], out[4]["recall_ppm"]) == (2, 1_000_000)
    # 4d top-2 = {1, 2} (cos(q,2) ~ 0.14 beats cos(q,3) ~ 0.097);
    # 2d top-2 = {1, 3} (tail dims invisible) -> overlap = {1}
    assert (out[2]["n_hit"], out[2]["recall_ppm"]) == (1, 500_000)


def _green(tok):
    h = hashlib.md5(tok.encode()).hexdigest()
    return (ord(h[0]) * 131071 + ord(h[1]) * 8191
            + ord(h[2]) * 127 + ord(h[3])) % 2


def test_watermark_stats_flag_rule(spark):
    from deepref_spark.operators.text_analysis import watermark_stats

    # build a 60-token doc that is ~all green and a 60-token doc that
    # is ~all red, using actual md5 parities of candidate words
    words = [f"w{i}" for i in range(300)]
    greens = [w for w in words if _green(w) == 1][:60]
    reds = [w for w in words if _green(w) == 0][:60]
    docs = spark.createDataFrame(
        [("g", " ".join(greens)),
         ("r", " ".join(reds)),
         ("s", " ".join(greens[:10]))],  # green but too short to flag
        schema="doc_id string, text string")
    out = {r["doc_id"]: r for r in watermark_stats(docs).collect()}
    assert out["g"]["n_green"] == 60 and out["g"]["watermark_flag"]
    assert out["r"]["n_green"] == 0 and not out["r"]["watermark_flag"]
    assert out["s"]["green_ppm"] == 1_000_000
    assert not out["s"]["watermark_flag"]  # n < 50 gate


def test_blocking_compare_sn_row_matches_bruteforce(spark):
    # the sorted_neighborhood row must equal a pure-Python multi-pass
    # SN over the same entity set with the head-token gold.
    from deepref_spark.queries import portable_mentions

    sf = "/root/testdata/sf0.001"
    m = portable_mentions(spark, sf)
    ents = sorted({r["e"] for r in
                   m.selectExpr("h_name AS e").union(
                       m.selectExpr("t_name AS e")).distinct().collect()})
    gk = {e: e.split(" ")[0] for e in ents}
    pairs = set()
    for key in (lambda n: n, lambda n: n[::-1]):
        order = sorted(ents, key=lambda n: (key(n), n))
        for i, a in enumerate(order):
            for b in order[i + 1:i + 4]:
                pairs.add((min(a, b), max(a, b)))
    n_hit = sum(1 for a, b in pairs if gk[a] == gk[b])
    from collections import Counter
    gold = sum(n * (n - 1) // 2 for n in Counter(gk.values()).values())

    from deepref_spark.queries import REGISTRY
    row = {r["method"]: r for r in
           REGISTRY["kg_blocking_compare"]["spark"](spark, sf).collect()}
    sn = row["sorted_neighborhood"]
    assert (sn["n_cand"], sn["n_hit"], sn["n_gold"]) == (
        len(pairs), n_hit, gold)
    assert row["lsh"]["n_gold"] == gold


def test_fertility_stats_exact(spark):
    # hand-checked per-lang rollup against the Python kernel itself:
    # occurrence-weighted piece counts over the distinct-word dict.
    from deepref_spark import refsem
    from deepref_spark.operators.text_analysis import fertility_stats
    from deepref_spark.portable import norm_tokens_py

    rows = [("0", "en", "the cat sat on the mat"),
            ("1", "en", "unfathomable zzzzqqqq cat"),
            ("2", "xx", "zzzzqqqq zzzzqqqq")]
    docs = spark.createDataFrame(
        rows, schema="doc_id string, lang string, text string")
    vocab = refsem.load_wp_vocab()
    expect = {}
    for _, lang, text in rows:
        for w in norm_tokens_py(text):
            pieces = refsem.wordpiece_basic(w, vocab)
            nw, np_, nu = expect.get(lang, (0, 0, 0))
            expect[lang] = (nw + 1, np_ + len(pieces),
                            nu + sum(1 for p in pieces if p == "[UNK]"))
    got = {r["lang"]: r for r in fertility_stats(docs).collect()}
    assert set(got) == set(expect)
    for lang, (nw, np_, nu) in expect.items():
        r = got[lang]
        assert (r["n_words"], r["n_pieces"], r["n_unk"]) == (nw, np_, nu)
        assert r["fertility_ppm"] == np_ * 1_000_000 // max(1, nw)
