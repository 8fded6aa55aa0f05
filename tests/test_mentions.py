"""Mention detection / candidate-pair generation (SURVEY §2.8 row 1):
span-run semantics on hand-built inputs, and the end-to-end path over
raw documents with NO gold pairs — the scenario the reference cannot
run (its converters require gold entity annotations)."""

import pyspark.sql.functions as F

from deepref_spark import portable
from deepref_spark.operators import mentions, score, tokenize
from deepref_spark.pipeline import triples_from_scored


def _toks_df(spark, tokens):
    return spark.createDataFrame(
        [(1, tokens, len(tokens))], "doc_id long, tokens array<string>, n int"
    )


def test_span_runs_and_ordered_pairs(spark):
    # entity tokens (NOUN, len>=4): apple; table lamp (one run); door
    toks = ["the", "apple", "is", "on", "table", "lamp", "by", "door"]
    out = mentions.candidate_pairs(_toks_df(spark, toks)).collect()
    spans = {(r["si"], r["h0"], r["h1"], r["h_name"]) for r in out}
    assert (1, 1, 2, "apple") in spans
    assert (2, 4, 6, "table lamp") in spans
    assert (3, 7, 8, "door") in spans
    # 3 spans -> 6 ordered pairs, i != j both directions
    assert len(out) == 6
    assert {(r["si"], r["sj"]) for r in out} == {
        (1, 2), (1, 3), (2, 1), (2, 3), (3, 1), (3, 2)
    }


def test_span_cap(spark):
    # 8 single-token runs separated by stopwords -> capped at MAX_SPANS
    toks = []
    for w in ["alpha", "bravo", "candle", "delta", "echos", "fable", "gulfs", "hotel"]:
        toks += [w, "of"]
    out = mentions.candidate_pairs(_toks_df(spark, toks)).collect()
    k = portable.MAX_SPANS
    assert len(out) == k * (k - 1)
    assert max(r["si"] for r in out) == k


def test_no_entities_no_rows(spark):
    out = mentions.candidate_pairs(_toks_df(spark, ["is", "of", "the", "and"])).collect()
    assert out == []


def test_candidate_pipeline_without_gold_pairs(spark):
    """Raw text -> candidates -> tokenize -> score -> triples. No gold
    entity pairs anywhere; plan stays JVM-side until the scoring UDF."""
    raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    sentences = raw.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(0).alias("span_idx"),
        F.concat_ws("#", "doc_id", F.lit("0")).alias("sent_id"),
        "text",
    )
    ments = mentions.candidate_mentions(sentences)
    rows = ments.limit(5).collect()
    assert rows, "expected candidate mentions over raw docs"
    for r in rows:
        h0, h1 = r["h"]["pos"]
        assert " ".join(r["token"][h0:h1]) == r["h"]["name"]
        assert r["ner"][h0] == "ENT"
        assert len(r["pos_tags"]) == len(r["token"])

    rel2id = score.rel2id_from_relations(portable.RELATION_NAMES)
    tokenized = tokenize.tokenize_mentions(ments, max_length=64)
    scored = score.attach_pred_names(
        score.score_tokenized(spark, tokenized, n_relations=len(rel2id)), rel2id
    )
    triples = triples_from_scored(scored, canonicalize=False)
    pdf = triples.toPandas()
    assert len(pdf) > 0
    assert (pdf["pred"] != "Other").all()
