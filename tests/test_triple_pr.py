"""The BASELINE quality gate, miniaturized: the Spark pipeline's
emitted (subj, pred, obj) triples over the frozen SemEval-shaped and
DDI-shaped fixture corpora must match the frozen reference predictions
(tests/fixtures/expected_triples.json, computed by the independent
pure-Python pipeline) with precision and recall >= 0.95.

Name-level comparison (never ids), per SURVEY.md §7 hard part (c).
"""

import json
from pathlib import Path

import pytest

from deepref_spark.operators import parse, score, tokenize
from deepref_spark.portable import RELATION_NAMES

FIX = Path(__file__).parent / "fixtures"
PR_GATE = 0.95


@pytest.fixture(scope="module")
def expected():
    return json.loads((FIX / "expected_triples.json").read_text())


def _spark_triples(spark, sentences_df):
    mentions = parse.parse_mentions(sentences_df)
    tokenized = tokenize.tokenize_mentions(mentions, max_length=128)
    rel2id = score.rel2id_from_relations(RELATION_NAMES)
    scored = score.score_tokenized(spark, tokenized, n_relations=len(rel2id))
    scored = score.attach_pred_names(scored, rel2id)
    return {(r["h_name"], r["pred_relation"], r["t_name"]) for r in scored.collect()}


def _pr(pred_set, gold_set):
    if not pred_set or not gold_set:
        return 0.0, 0.0
    inter = len(pred_set & gold_set)
    return inter / len(pred_set), inter / len(gold_set)


def test_semeval_triple_pr(spark, expected):
    from deepref_spark.sources.semeval2010 import read_semeval2010

    gold = {(e["subj"], e["pred"], e["obj"]) for e in expected if e["corpus"] == "semeval_mini"}
    src = read_semeval2010(spark, str(FIX / "semeval_mini.txt"))
    sentences = src.selectExpr(
        "CAST(group_id AS STRING) AS doc_id", "CAST(group_id AS INT) AS span_idx",
        "CAST(group_id AS STRING) AS sent_id", "relation", "tagged",
    )
    got = _spark_triples(spark, sentences)
    p, r = _pr(got, gold)
    assert p >= PR_GATE and r >= PR_GATE, (p, r)


def test_ddi_triple_pr(spark, expected):
    from deepref_spark.sources.ddi_xml import read_ddi_xml

    gold = {(e["subj"], e["pred"], e["obj"]) for e in expected if e["corpus"] == "ddi_mini"}
    src = read_ddi_xml(spark, str(FIX / "ddi_mini.xml"))
    sentences = src.selectExpr(
        "sent_xml_id AS doc_id", "0 AS span_idx", "pair_id AS sent_id",
        "relation", "tagged",
    )
    got = _spark_triples(spark, sentences)
    p, r = _pr(got, gold)
    assert p >= PR_GATE and r >= PR_GATE, (p, r)


def test_scores_match_reference_exactly(spark, expected):
    """Beyond set-level P/R: per-sentence scores from the distributed
    path equal the frozen single-row reference forward bit-for-bit
    (float64, row-independent math)."""
    from deepref_spark.sources.semeval2010 import read_semeval2010

    gold = {str(e["sent"]): e for e in expected if e["corpus"] == "semeval_mini"}
    src = read_semeval2010(spark, str(FIX / "semeval_mini.txt"))
    sentences = src.selectExpr(
        "CAST(group_id AS STRING) AS doc_id", "CAST(group_id AS INT) AS span_idx",
        "CAST(group_id AS STRING) AS sent_id", "relation", "tagged",
    )
    mentions = parse.parse_mentions(sentences)
    tokenized = tokenize.tokenize_mentions(mentions, max_length=128)
    rel2id = score.rel2id_from_relations(RELATION_NAMES)
    scored = score.attach_pred_names(
        score.score_tokenized(spark, tokenized, n_relations=len(rel2id)), rel2id
    )
    for row in scored.collect():
        e = gold[row["sent_id"]]
        assert row["pred_relation"] == e["pred"]
        assert abs(row["score"] - e["score"]) < 1e-9
