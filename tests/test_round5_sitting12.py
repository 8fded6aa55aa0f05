"""Twelfth-sitting operators: landmark-pair stress centrality, KMV
distinct sketch, per-source Jensen-Shannon drift."""
import itertools
from collections import deque


def _brute_stress(edges, n_seeds, max_hops):
    """Brute-force landmark-pair stress: BFS with path counting from
    every node, then the sigma-product formula."""
    import hashlib
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    seeds = sorted(nodes, key=lambda e: (hashlib.md5(e.encode()).hexdigest(), e))[:n_seeds]

    def bfs(s):
        dist, sigma = {s: 0}, {s: 1}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for w in sorted(adj[u]):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        return dist, sigma

    info = {s: bfs(s) for s in seeds}
    out = {}
    for s, t in itertools.combinations(sorted(seeds), 2):
        ds, ss = info[s]
        dt, st = info[t]
        if t not in ds:
            continue
        for v in nodes:
            if v in (s, t) or v not in ds or v not in dt:
                continue
            if ds[v] + dt[v] == ds[t]:
                np_, sp = out.get(v, (0, 0))
                out[v] = (np_ + 1, sp + ss[v] * st[v])
    return out


def test_stress_centrality_matches_bruteforce(spark):
    from deepref_spark.operators.graph import stress_centrality

    # diamond (two parallel shortest paths s-a-t / s-b-t) + a tail and
    # a second diamond so sigma products exceed 1 somewhere
    edges = [("n1", "n2"), ("n1", "n3"), ("n2", "n4"), ("n3", "n4"),
             ("n4", "n5"), ("n5", "n6"), ("n5", "n7"), ("n6", "n8"),
             ("n7", "n8"), ("n8", "n9")]
    df = spark.createDataFrame(edges, schema="src string, dst string")
    got = {r["entity"]: (r["n_pairs"], r["stress"])
           for r in stress_centrality(df, n_seeds=4, max_hops=4).collect()}
    want = _brute_stress(edges, n_seeds=4, max_hops=4)
    assert got == want
    assert any(s > 1 for _, s in want.values()), "fixture must exercise sigma>1"


def _kmv_py(keys, k=32):
    """Independent bottom-k estimate: md5-based 32-bit hashes of the
    distinct keys, (k-1)*2^32 // kth-smallest."""
    import hashlib
    hs = sorted({int(hashlib.md5(f"kmv|{u}".encode()).hexdigest()[:8], 16)
                 for u in set(keys)})
    if len(hs) < k:
        return len(hs), len(hs)
    return len(set(keys)), (k - 1) * (1 << 32) // hs[k - 1]


def test_kmv_below_k_is_exact_and_above_k_estimates(spark):
    from deepref_spark.operators.events import kmv_distinct

    rows = (
        # type 'a': 10 distinct users (< k=32) -> sketch IS exact
        [("a", f"u{i}") for i in range(10)]
        # type 'b': 500 distinct users (> k) -> estimator path; repeats
        # must not perturb the distinct-hash order statistics
        + [("b", f"v{i % 500}") for i in range(1500)]
    )
    df = spark.createDataFrame(rows, schema="event_type string, user_id string")
    got = {r["event_type"]: r for r in kmv_distinct(df, k=32).collect()}
    assert got["a"]["exact_distinct"] == 10
    assert got["a"]["n_sk"] == 10
    assert got["a"]["est_kmv"] == 10  # below-k: sketch is the exact count
    ex_b, est_b = _kmv_py([u for t, u in rows if t == "b"], k=32)
    assert got["b"]["exact_distinct"] == ex_b == 500
    assert got["b"]["n_sk"] == 32
    assert got["b"]["est_kmv"] == est_b
    # the estimator should be in the right ballpark (k=32 -> ~18% rse)
    assert 250 <= got["b"]["est_kmv"] <= 1000


def _js_py(docs):
    """Independent JS computation on the identical micro-nat grid."""
    import math
    from collections import Counter

    from deepref_spark.portable import norm_tokens_py

    cnt = Counter()
    for src, text in docs:
        for tok in norm_tokens_py(text):
            cnt[(src, tok)] += 1
    corpus = Counter()
    totals = Counter()
    for (src, tok), c in cnt.items():
        corpus[tok] += c
        totals[src] += c
    t = sum(cnt.values())
    out = {}
    for src in totals:
        ts = totals[src]
        s1 = s2 = 0
        for tok, cc in corpus.items():
            c = cnt.get((src, tok), 0)
            den = c * t + cc * ts
            if c > 0:
                s1 += c * math.floor(math.log(2 * c * t / den) * 1e6 + 0.5)
            s2 += cc * math.floor(math.log(2 * cc * ts / den) * 1e6 + 0.5)
        out[src] = (ts, s1, s2, 0.5 * (s1 / ts + s2 / t) / 1e6)
    return out


def test_js_divergence_matches_python_and_orders_drift(spark):
    from deepref_spark.operators.text_analysis import js_divergence

    docs = [
        # 'near' speaks corpus-typical language; 'far' is skewed
        ("near", "the cat sat on the mat and the dog ran"),
        ("near", "the dog sat on the cat and the mat ran"),
        ("far", "quantum flux capacitor entangles qubits rapidly"),
        ("far", "qubits entangle flux and quantum capacitors decohere"),
    ]
    df = spark.createDataFrame(docs, schema="source string, text string")
    got = {r["source"]: r for r in js_divergence(df).collect()}
    want = _js_py(docs)
    for src, (ts, s1, s2, js) in want.items():
        assert got[src]["n_tokens"] == ts
        assert got[src]["s1_units"] == s1
        assert got[src]["s2_units"] == s2
        assert abs(got[src]["js_nats"] - js) < 1e-12
    # JS is bounded by ln(2) and the skewed source must sit farther out
    assert 0.0 < got["near"]["js_nats"] < got["far"]["js_nats"] < 0.6932
