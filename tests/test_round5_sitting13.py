"""Thirteenth-sitting operators: bounded-horizon Katz centrality,
seasonal-naive forecast baseline, content-defined chunking dedup."""
import datetime
import hashlib


def _brute_katz(edges, max_hops=4, beta_inv=4):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    w = {v: 1 for v in adj}
    acc = {v: w[v] * beta_inv ** max_hops for v in adj}
    for h in range(1, max_hops + 1):
        w = {v: sum(w[n] for n in adj[v]) for v in adj}
        for v in adj:
            acc[v] += w[v] * beta_inv ** (max_hops - h)
    return {v: (w[v], acc[v]) for v in adj}


def test_katz_matches_bruteforce(spark):
    from deepref_spark.operators.graph import katz_centrality

    edges = [("n1", "n2"), ("n1", "n3"), ("n2", "n3"), ("n3", "n4"),
             ("n4", "n5"), ("n5", "n6"), ("n6", "n4"), ("n2", "n5")]
    df = spark.createDataFrame(edges, schema="src string, dst string")
    got = {r["entity"]: (r["walks_out"], r["katz_units"])
           for r in katz_centrality(df, max_hops=4, beta_inv=4).collect()}
    assert got == _brute_katz(edges)
    # the triangle-heavy hub must out-rank the path-end node
    assert got["n3"][1] > got["n1"][1]


def test_forecast_baseline_exact_on_fixture(spark):
    from deepref_spark.operators.events import forecast_baseline

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # type 'x': hours 0..47 with count = 2 for hour h<24, 3 for h>=24,
    # EXCEPT hour 30 is silent (a spine gap -> actual 0, forecast 2)
    for h in range(48):
        if h == 30:
            continue
        c = 2 if h < 24 else 3
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(hours=h),
                         1, "x", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long,"
                     " event_type string, value double, props string")
    got = {r["event_type"]: r for r in forecast_baseline(df).collect()}
    r = got["x"]
    # scored hours: 24..47 (24 rows; hour 30 exists on the SPINE with
    # n=0). errors: |3-2|=1 for 23 hours, |0-2|=2 for hour 30
    assert r["n_hours"] == 24
    assert r["sum_abs_err"] == 23 * 1 + 2
    assert r["sum_actual"] == 23 * 3 + 0
    assert r["mae_ppm"] == 25 * 1000000 // 24
    assert r["wape_ppm"] == 25 * 1000000 // 69


def _brute_cdc(docs, divisor=16):
    from deepref_spark.portable import norm_tokens_py

    chunks = []  # (source, sig, n_toks)
    for _, source, text in docs:
        toks = norm_tokens_py(text)
        cur, out = [], []
        for t in toks:
            h = int(hashlib.md5(f"cdc|{t}".encode()).hexdigest()[:8], 16)
            if h % divisor == 0:
                if cur:
                    out.append(cur)
                cur = [t]
            else:
                cur.append(t)
        if cur:
            out.append(cur)
        for ch in out:
            chunks.append(
                (source, hashlib.md5(" ".join(ch).encode()).hexdigest(),
                 len(ch)))
    occ = {}
    for _, sig, _n in chunks:
        occ[sig] = occ.get(sig, 0) + 1
    rep = {}
    for source, sig, n in chunks:
        c = rep.setdefault(source, [0, 0, 0, 0])
        c[0] += 1
        c[1] += n
        if occ[sig] > 1:
            c[2] += 1
            c[3] += n
    return {s: (c[0], c[1], c[2], c[3], c[3] * 1000000 // max(1, c[1]))
            for s, c in rep.items()}


def test_cdc_chunks_resync_after_prefix_insertion(spark):
    from deepref_spark.operators.dedup import cdc_chunk_stats

    shared = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
              "psi omega one two three four five six seven eight nine "
              "ten eleven twelve thirteen fourteen fifteen sixteen")
    docs = [
        (1, "a", shared),
        # same tail behind a different prefix: CDC boundaries
        # re-synchronize, so some chunk sigs recur across the docs
        (2, "b", "totally different opening words here " + shared),
        (3, "c", "unrelated content with no overlap whatsoever at all"),
    ]
    df = spark.createDataFrame(docs, schema="doc_id long, source string,"
                                            " text string")
    got = {r["source"]: (r["n_chunks"], r["n_tokens"], r["n_dup_chunks"],
                         r["dup_token_mass"], r["dup_ppm"])
          for r in cdc_chunk_stats(df, divisor=16).collect()}
    want = _brute_cdc(docs, divisor=16)
    assert got == want
    # the defining CDC property: the shared tail is re-found despite
    # the insertion (fixed-width blocking at the same grain would not)
    assert want["a"][2] > 0 and want["b"][2] > 0
    assert want["c"][2] == 0
