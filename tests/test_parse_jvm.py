"""JVM parse fast path == Python fused path, row for row."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deepref_spark import synth
from deepref_spark.operators.fused import extract_scored_fused, extract_scored_jvm

N_REL = 6


@pytest.fixture(scope="module")
def spark():
    from deepref_spark.session import get_spark

    s = get_spark("test_parse_jvm", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _cmp(spark, sentences, preprocessing=None):
    a = extract_scored_jvm(
        spark, sentences, n_relations=N_REL, preprocessing=preprocessing
    ).toPandas()
    b = extract_scored_fused(
        spark, sentences, n_relations=N_REL, preprocessing=preprocessing
    ).toPandas()
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    a["score"] = a["score"].round(9)
    b["score"] = b["score"].round(9)
    pd.testing.assert_frame_equal(a, b)
    return len(a)


def test_jvm_parse_equals_python_on_synth(spark):
    """Full synth corpus: reversed layouts, unrelated markers, hot
    entities — every row scores identically through both parses."""
    from deepref_spark.operators import convert

    docs = synth.generate_docs(spark, 150, partitions=4)
    sentences = convert.text_sentences(docs).localCheckpoint()
    n = _cmp(spark, sentences)
    assert n > 300  # ~4.2 text spans/doc


def _sent_df(spark, rows):
    return spark.createDataFrame(
        [(f"d{i}", 0, f"d{i}#0", rel, tagged) for i, (rel, tagged) in enumerate(rows)],
        "doc_id string, span_idx int, sent_id string, relation string, tagged string",
    )


def test_jvm_parse_equals_python_on_adversarial(spark):
    """Every routing class: clean, tail-first, unrelated markers,
    marker-missing (dropped by BOTH), duplicated markers, markers only,
    non-ASCII (python branch), exotic separators (python branch),
    whitespace runs."""
    rows = [
        ("member-collection",
         "the ENTITYSTART aspirin ENTITYEND helps ENTITYOTHERSTART warfarin ENTITYOTHEREND daily"),
        ("entity-origin",
         "ENTITYOTHERSTART city ENTITYOTHEREND before ENTITYSTART river delta ENTITYEND flows"),
        ("message-topic",
         "ENTITYUNRELATEDSTART senate ENTITYUNRELATEDEND near ENTITYSTART harbor ENTITYEND and "
         "ENTITYOTHERSTART violin ENTITYOTHEREND music ENTITYUNRELATEDSTART comet ENTITYUNRELATEDEND"),
        ("Other", "no markers at all in this sentence"),
        ("Other", "only ENTITYSTART aspirin ENTITYEND here"),
        ("member-collection",
         "dup ENTITYSTART a ENTITYEND mid ENTITYSTART x ENTITYEND and ENTITYOTHERSTART b ENTITYOTHEREND"),
        ("entity-origin",
         "ENTITYSTART aspirin ENTITYEND ENTITYOTHERSTART warfarin ENTITYOTHEREND"),
        ("entity-origin", "ENTITYSTART ENTITYEND empty ENTITYOTHERSTART warfarin ENTITYOTHEREND"),
        ("message-topic",
         "café talk ENTITYSTART résumé ENTITYEND with ENTITYOTHERSTART naïve ENTITYOTHEREND plan"),
        ("member-collection",
         "odd space ENTITYSTART aspirin ENTITYEND with ENTITYOTHERSTART city ENTITYOTHEREND"),
        ("entity-origin",
         "  leading   ENTITYSTART aspirin ENTITYEND \t tabs \t ENTITYOTHERSTART city ENTITYOTHEREND  "),
        ("Other", ""),
        ("member-collection",
         "UPPER Case ENTITYSTART Aspirin UNIT ENTITYEND vs ENTITYOTHERSTART WARFARIN ENTITYOTHEREND"),
    ]
    _cmp(spark, _sent_df(spark, rows))


def test_marker_missing_rows_drop_in_both(spark):
    rows = [("Other", "nothing here"), ("Other", "half ENTITYSTART a ENTITYEND only")]
    df = _sent_df(spark, rows)
    assert extract_scored_jvm(spark, df, n_relations=N_REL).count() == 0
    assert extract_scored_fused(spark, df, n_relations=N_REL).count() == 0


def test_clean_branch_has_single_python_crossing(spark):
    """The JVM branch's plan contains exactly one Arrow crossing (the
    scorer); the parse is all built-in expressions."""
    from deepref_spark.operators.parse_jvm import split_jvm_eligible

    docs = synth.generate_docs(spark, 20, partitions=2)
    from deepref_spark.operators import convert

    # checkpoint the input so synth's own mapInPandas generator is not
    # part of the inspected plan
    sentences = convert.text_sentences(docs).localCheckpoint()
    clean, _ = split_jvm_eligible(sentences)
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "EvalPython" not in plan


@pytest.mark.parametrize("variant", [
    ["sw"], ["sw", "d"], ["eb"], ["nb"], ["b", "p"], ["sw", "p", "b", "d", "eb"],
])
def test_jvm_parse_equals_python_with_preprocessing(spark, variant):
    """Preprocessing variants: JVM parse + per-row reference preproc
    kernels inside the crossing == full Python fused path."""
    from deepref_spark.operators import convert

    docs = synth.generate_docs(spark, 80, partitions=4)
    sentences = convert.text_sentences(docs).localCheckpoint()
    n = _cmp(spark, sentences, preprocessing=variant)
    assert n > 150


def test_jvm_parse_preproc_adversarial(spark):
    """Bracketed spans, stopwords inside/outside entities, digits,
    blinding with touching spans — through both engines."""
    rows = [
        ("member-collection",
         "the ( noisy aside ) ENTITYSTART aspirin ENTITYEND with the "
         "ENTITYOTHERSTART warfarin ENTITYOTHEREND in 1999"),
        ("entity-origin",
         "ENTITYSTART the aspirin ENTITYEND ENTITYOTHERSTART warfarin city ENTITYOTHEREND now"),
        ("message-topic",
         "( unclosed ENTITYSTART city ENTITYEND more ENTITYOTHERSTART river ENTITYOTHEREND words"),
        ("Other",
         "closer ) first ENTITYSTART engine ENTITYEND [ boxy ] ENTITYOTHERSTART company ENTITYOTHEREND"),
    ]
    for variant in (["sw"], ["b"], ["d"], ["eb"], ["nb"], ["sw", "p", "b", "d", "nb"]):
        _cmp(spark, _sent_df(spark, rows), preprocessing=variant)


def test_preproc_jvm_branch_has_no_python(spark):
    """The composed-preprocessing branch is also pure built-ins."""
    from deepref_spark import refsem
    from deepref_spark.operators import convert
    from deepref_spark.operators.parse_jvm import split_jvm_eligible
    from deepref_spark.operators.preproc_jvm import (
        apply_preprocessing_jvm,
        preproc_eligible_cond,
    )

    docs = synth.generate_docs(spark, 20, partitions=2)
    sentences = convert.text_sentences(docs).localCheckpoint()
    clean, _ = split_jvm_eligible(sentences)
    out = apply_preprocessing_jvm(
        clean.where(F.expr(preproc_eligible_cond())),
        refsem.normalize_preproc(["sw", "p", "b", "d", "eb"]),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_column_rule_tag_matches_python_cascade(spark):
    """_rule_tag (Column API) == nlp.rule_tag_token for every rule
    class and the fallthrough — drift guard for the faithful cascade."""
    from deepref_spark.nlp import rule_tag_token
    from deepref_spark.operators.preproc_jvm import _rule_tag

    tokens = ["(", ")", "[", "]", ".", ",", ";", "?", "'", '"', "%", "/-",
              "1999", "1.5", "1,5", "12a",
              "the", "an", "of", "into", "and", "but", "is", "been",
              "they", "its", "quickly", "ly", "running", "tested",
              "famous", "careful", "active", "logical", "warfarin",
              "x", "", "DIGIT", "ENTITY", "O"]
    df = spark.createDataFrame([(t,) for t in tokens], "tok string")
    got = {r["tok"]: r["tag"] for r in
           df.select("tok", _rule_tag(F.col("tok")).alias("tag")).collect()}
    for t in tokens:
        assert got[t] == rule_tag_token(t), t


def test_extract_scored_engines_agree(spark):
    """extract_scored's arrow (default) and jvm engines are
    row-for-row equal, with and without preprocessing."""
    from deepref_spark.pipeline import extract_scored

    docs = synth.generate_docs(spark, 60, partitions=2)
    for pre in (None, ["sw", "d"]):
        a = extract_scored(spark, docs, preprocessing=pre).toPandas()
        b = extract_scored(spark, docs, preprocessing=pre, engine="jvm").toPandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        a["score"] = a["score"].round(9)
        b["score"] = b["score"].round(9)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 100 and a["pred_relation"].nunique() >= 3


def test_jvm_non_ruletag_tagger_routes_to_fused(spark):
    """extract_scored_jvm's built-in preproc expressions mirror the
    ruletag cascade only; any other tagger_backend must route through
    the fused path (identical results to calling fused directly), not
    silently preprocess with ruletag tags."""
    from deepref_spark.operators import convert

    docs = synth.generate_docs(spark, 40, partitions=4)
    sents = convert.text_sentences(docs).localCheckpoint()
    for backend in ("ruletag", "spacy"):
        a = extract_scored_jvm(
            spark, sents, n_relations=N_REL, preprocessing=["sw", "d"],
            tagger_backend=backend,
        ).toPandas()
        b = extract_scored_fused(
            spark, sents, n_relations=N_REL, preprocessing=["sw", "d"],
            tagger_backend=backend,
        ).toPandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        a["score"] = a["score"].round(9)
        b["score"] = b["score"].round(9)
        pd.testing.assert_frame_equal(a, b)
