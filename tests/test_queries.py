"""Driver-contract tests: every oracle-backed query in
__spark_entry__.queries() must match its DuckDB oracle at sf0.001 (the
local mirror of the driver's sf0.01 gate), and the model-path queries
must produce sane rows."""

import pytest

from harness import compare_query, duck_connection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    from deepref_spark.queries import REGISTRY

    return REGISTRY


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


def _oracle_names():
    from deepref_spark.queries import REGISTRY

    return sorted(n for n, s in REGISTRY.items() if s["oracle"] is not None)


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, duck, registry, name):
    ok, detail = compare_query(
        spark, duck, registry[name]["spark"], registry[name]["oracle"], SF
    )
    assert ok, f"{name}: {detail}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    assert {"subj", "pred", "obj", "subj_canon", "obj_canon", "score", "n_docs"} <= set(df.columns)
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 38


def test_model_queries_rows_only(spark, registry):
    triples = registry["kg_triples_model"]["spark"](spark, SF)
    pdf = triples.toPandas()
    assert len(pdf) > 0
    assert pdf["pred"].nunique() >= 2  # class-diverse predictions
    ev = registry["kg_eval_model"]["spark"](spark, SF).collect()[0]
    assert 0.0 <= ev["acc"] <= 1.0 and ev["micro_f1"] == ev["acc"]


def test_chunker_tokenize_twin_retired_to_tests(spark, duck):
    """The fixed-width chunker SQL twin (rounds 1-3's kg_tokenize
    oracle) stays pinned here: Spark chunker expressions vs the DuckDB
    chunker formula. The REGISTERED kg_tokenize now verifies the
    production greedy wordpiece instead."""
    from deepref_spark.queries import (
        SPARK, DUCK, _oracle_prefix, _split_select, _tokenize_sql,
        portable_mentions,
    )

    def chunker_fn(spark, sf_dir):
        m = portable_mentions(spark, sf_dir)
        return m.selectExpr("doc_id", *_split_select(_tokenize_sql(SPARK)))

    oracle = _oracle_prefix() + f"SELECT doc_id, {_tokenize_sql(DUCK)} FROM mentions"
    ok, detail = compare_query(spark, duck, chunker_fn, oracle, SF)
    assert ok, detail


def test_triples_model_golden_hash(spark, registry):
    """kg_triples_model is rows-only forever (numpy model forward, no
    SQL oracle by design) — this frozen full-output fixture makes any
    regression in the tokenize -> score -> CC -> dedup chain fail a
    test, not just a row count. Hash is over the sorted canonical
    triples at sf0.001, scores at 6dp."""
    import hashlib

    df = registry["kg_triples_model"]["spark"](spark, SF)
    rows = sorted(
        (r["subj"], r["pred"], r["obj"], r["subj_canon"], r["obj_canon"],
         f"{r['score']:.6f}", r["n_docs"])
        for r in df.collect()
    )
    h = hashlib.sha256(repr(rows).encode()).hexdigest()
    assert len(rows) == 447
    assert h == "82aa080a29e6902feadd89d61af637ffcfd703a57666f4c6186635cdc0fc3a04"
