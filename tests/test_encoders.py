"""Encoder-variant coverage (K2/K3/K4 + M1/M3/M4/M5) and the
converted-format sources (S3/S4/S5/S6)."""

import numpy as np
import pytest

from deepref_spark import refsem
from deepref_spark import model as mdl


def test_ebem_tokenize_layout_and_quirks():
    toks = "alpha beta gamma delta eps".split()
    sk = {"ses1": ["f1", "g1"], "ses2": ["f2", "g2"]}
    out = refsem.ebem_tokenize(toks, [1, 2], [3, 4], sk, max_length=64)
    ids = out["ids"]
    # sk wrappers appear after the sentence, before [SEP]
    u4, u5 = refsem.SPECIAL_TOKENS["[unused4]"], refsem.SPECIAL_TOKENS["[unused5]"]
    u6, u7 = refsem.SPECIAL_TOKENS["[unused6]"], refsem.SPECIAL_TOKENS["[unused7]"]
    assert ids[out["sk_pos1"][0]] == u4 and ids[out["sk_pos1"][1]] == u5
    assert ids[out["sk_pos2"][0]] == u6 and ids[out["sk_pos2"][1]] == u7
    assert ids[out["pos1"]] == refsem.SPECIAL_TOKENS["[unused0]"]
    assert ids[out["pos2"]] == refsem.SPECIAL_TOKENS["[unused2]"]


def test_ebem_mask_entity_first_occurrence_quirk():
    # with mask_entity the entity placeholders [unused4/5] precede the
    # SK wrappers of the same name, so .index() finds the ENTITY, not
    # the SK block (bert_encoder.py:390-404)
    toks = "alpha beta gamma delta eps".split()
    sk = {"ses1": ["f1", "g1"], "ses2": ["f2", "g2"]}
    out = refsem.ebem_tokenize(toks, [1, 2], [3, 4], sk, max_length=64, mask_entity=True)
    assert out["sk_pos1"][0] == out["pos1"]  # both found the entity's [unused4]


def test_ebem_reversed():
    toks = "alpha beta gamma delta eps".split()
    sk = {"ses1": ["f1", "g1"], "ses2": ["f2", "g2"]}
    out = refsem.ebem_tokenize(toks, [3, 4], [1, 2], sk, max_length=64)
    ids = out["ids"]
    assert ids[out["pos1"]] == refsem.SPECIAL_TOKENS["[unused2]"]
    assert ids[out["sk_pos1"][0]] == refsem.SPECIAL_TOKENS["[unused6]"]


def test_word_position_tokenize_clipping():
    toks = ["w"] * 10
    ids, pos1, pos2 = refsem.word_position_tokenize(toks, [2, 3], [7, 8], max_length=8)
    assert len(ids) == len(pos1) == len(pos2) == 8
    assert pos1[2] == 8  # i - start + L at i==start -> L
    assert pos1[0] == 6
    assert max(pos2) <= 15


def test_pcnn_segment_mask():
    assert refsem.pcnn_segment_mask(6, [1, 2], [4, 5], 8) == [1, 1, 2, 2, 2, 3, 0, 0]
    # reversed entities use min/max of starts
    assert refsem.pcnn_segment_mask(6, [4, 5], [1, 2], 8) == [1, 1, 2, 2, 2, 3, 0, 0]


def test_model_variants_deterministic_and_diverse():
    rng = np.random.RandomState(3)
    ids = rng.randint(12, refsem.VOCAB_SIZE, (64, 32))
    mask = np.ones((64, 32), dtype=np.int64)
    w = mdl.build_weights(6)
    p1, s1 = mdl.forward_cls_batch(w, ids, mask)
    p2, s2 = mdl.forward_cls_batch(w, ids, mask)
    assert (p1 == p2).all() and (s1 == s2).all()
    we = mdl.build_ebem_weights(6)
    pe, _ = mdl.forward_ebem_batch(
        we, ids, mask, rng.randint(0, 30, 64), rng.randint(0, 30, 64),
        rng.randint(0, 30, (64, 2)), rng.randint(0, 30, (64, 2)),
    )
    assert len(set(pe.tolist())) >= 2
    wc = mdl.build_cnn_weights(6, max_length=32)
    pos = np.tile(np.arange(32), (64, 1))
    pc, _ = mdl.forward_cnn_batch(wc, ids, pos, pos)
    seg = np.tile(refsem.pcnn_segment_mask(32, [3, 4], [10, 11], 32), (64, 1))
    pp, _ = mdl.forward_pcnn_batch(wc, ids, pos, pos, seg)
    assert pp.shape == pc.shape == (64,)


def test_encoder_operators_on_spark(spark):
    from deepref_spark import synth
    from deepref_spark.operators import convert, parse, sk as sk_op
    from deepref_spark.operators.encoders import score_cls, score_cnn_family, score_ebem

    docs = synth.generate_docs(spark, 25, partitions=2)
    mentions = parse.parse_mentions(convert.text_sentences(docs))
    mentions_sk = sk_op.attach_sk(mentions, sk_op.sk_table(spark)).cache()
    n = mentions_sk.count()
    for df in (
        score_ebem(spark, mentions_sk, 6),
        score_cls(spark, mentions_sk, 6),
        score_cnn_family(spark, mentions_sk, 6),
        score_cnn_family(spark, mentions_sk, 6, piecewise=True),
        score_cnn_family(spark, mentions_sk, 6, encoder="crcnn"),
        score_cnn_family(spark, mentions_sk, 6, encoder="lstm"),
        score_cnn_family(spark, mentions_sk, 6, encoder="gru"),
    ):
        rows = df.collect()
        assert len(rows) == n
        assert all(0 <= r["pred_id"] < 6 and 0.0 < r["score"] <= 1.0 for r in rows)


def test_crcnn_lstm_gru_forwards_deterministic_and_diverse():
    rng = np.random.RandomState(7)
    ids = rng.randint(12, refsem.VOCAB_SIZE, (96, 24))
    pos = np.tile(np.arange(24), (96, 1))
    wc = mdl.build_cnn_weights(6, max_length=24)
    pc1, sc1 = mdl.forward_crcnn_batch(wc, ids, pos, pos)
    pc2, sc2 = mdl.forward_crcnn_batch(wc, ids, pos, pos)
    assert (pc1 == pc2).all() and (sc1 == sc2).all()
    assert len(set(pc1.tolist())) >= 2
    for kind in ("lstm", "gru"):
        w = mdl.build_rnn_weights(6, kind, max_length=24)
        p1, s1 = mdl.forward_rnn_batch(w, ids, pos, pos)
        p2, s2 = mdl.forward_rnn_batch(w, ids, pos, pos)
        assert (p1 == p2).all() and (s1 == s2).all()
        assert len(set(p1.tolist())) >= 2
        # calibration: no single class may own the whole batch
        assert max(np.bincount(p1, minlength=6)) < len(p1)


def test_rnn_layer_state_dependence():
    """The recurrence must actually carry state: permuting the sequence
    changes the per-step outputs (unlike the conv family's local
    windows)."""
    w = mdl.build_rnn_weights(6, "lstm", max_length=8)
    rng = np.random.RandomState(11)
    ids = rng.randint(12, refsem.VOCAB_SIZE, (4, 8))
    pos = np.tile(np.arange(8), (4, 1))
    x = mdl._word_pos_embed(w, ids, pos, pos)
    out = mdl._rnn_layer(w, 0, x, "lstm")
    out_rev = mdl._rnn_layer(w, 0, x[:, ::-1], "lstm")
    assert not np.allclose(out[:, -1], out_rev[:, -1])


def test_semeval2018_source(spark, tmp_path):
    xml = """<?xml version="1.0"?>
<doc>
 <text>
  <abstract>The <entity id="A1.1">outline</entity> focuses on <entity id="A1.2">spirituality</entity> here. A second sentence mentions <entity id="A1.3">engine</entity> and <entity id="A1.4">turbine</entity> today.</abstract>
 </text>
</doc>
"""
    rels = "MESSAGE-TOPIC(A1.1,A1.2)\nPART-WHOLE(A1.3,A1.4)\nUSAGE(A1.1,A1.2)\n"
    (tmp_path / "a.xml").write_text(xml)
    (tmp_path / "a.txt").write_text(rels)
    from deepref_spark.sources.semeval2018 import read_semeval2018

    rows = {r["e1_id"]: r for r in read_semeval2018(
        spark, str(tmp_path / "a.xml"), str(tmp_path / "a.txt")
    ).collect()}
    # last-wins on duplicate e1 (semeval2018_converter.py:63,67)
    assert rows["A1.1"]["relation"] == "usage"
    assert "ENTITYSTART outline ENTITYEND" in rows["A1.1"]["tagged"]
    assert rows["A1.3"]["relation"] == "part-whole"
    assert "ENTITYSTART engine ENTITYEND" in rows["A1.3"]["tagged"]


def test_training_txt_reader(spark, tmp_path):
    line = ("{'token': ['the', 'fox', 'ran'], 'h': {'name': 'fox', 'pos': [1, 2]}, "
            "'t': {'name': 'ran', 'pos': [2, 3]}, 'relation': 'Other', "
            "'pos_tags': ['DET', 'NOUN', 'VERB'], 'deps': ['det', 'pobj', 'root'], "
            "'ner': ['O', 'O', 'O'], 'sk': {'ses1': ['a', 'b'], 'ses2': ['c', 'd']}}")
    (tmp_path / "train.txt").write_text(line + "\n\n" + line + "\n")
    from deepref_spark.sources.converted import read_training_txt

    rows = read_training_txt(spark, str(tmp_path / "train.txt")).collect()
    assert len(rows) == 2
    assert list(rows[0]["token"]) == ["the", "fox", "ran"]
    assert rows[0]["h"]["name"] == "fox" and list(rows[0]["sk"]["ses1"]) == ["a", "b"]


def test_converted_csv_reader(spark, tmp_path):
    hdr = "original_sentence\te1\te2\trelation_type\tpos_tags\tdependencies_labels\tner\tsk_entities"
    row = ("the fox ran\t{'name': 'fox', 'position': [1, 2]}\t{'name': 'ran', 'position': [2, 3]}"
           "\tOther\tDET NOUN VERB\tdet pobj root\tO O O\t{'ses1': ['a', 'b'], 'ses2': ['c', 'd']}")
    (tmp_path / "c.csv").write_text(hdr + "\n" + row + "\n")
    from deepref_spark.sources.converted import read_converted_csv

    rows = read_converted_csv(spark, str(tmp_path / "c.csv")).collect()
    assert len(rows) == 1
    assert rows[0]["h"]["name"] == "fox" and list(rows[0]["pos_tags"]) == ["DET", "NOUN", "VERB"]


def test_word_embedding_loader(spark, tmp_path):
    (tmp_path / "emb.vec").write_text("2 3\nfox 0.1 0.2 0.3\nran 0.4 0.5 0.6\n")
    from deepref_spark.sources.converted import load_word_embeddings

    w2i, mat = load_word_embeddings(spark, str(tmp_path / "emb.vec"))
    assert w2i == {"fox": 0, "ran": 1}
    assert mat.shape == (2, 3) and abs(float(mat[1][2]) - 0.6) < 1e-6


def test_metrics_extensions(spark):
    import pyspark.sql.functions as F
    from deepref_spark.operators.metrics import ablation_summary, auc_trapezoid, cv_splits

    pr = spark.createDataFrame(
        [(0.0, 1.0), (0.5, 1.0), (1.0, 0.5)], "rec double, prec double"
    )
    auc = auc_trapezoid(pr).collect()[0]["auc"]
    assert abs(auc - (0.5 * 1.0 + 0.5 * 0.75)) < 1e-9

    res = spark.createDataFrame(
        [("ebem", "b", 1, 0.8), ("ebem", "b", 2, 0.9), ("cnn", "b", 1, 0.5)],
        "model string, preproc string, seed int, metric_value double",
    )
    summ = {(r["model"], r["preproc"]): r for r in ablation_summary(res, ["model", "preproc"]).collect()}
    assert summ[("ebem", "b")]["n_seeds"] == 2
    assert abs(summ[("ebem", "b")]["mean_metric"] - 0.85) < 1e-9
    assert summ[("cnn", "b")]["std_metric"] == 0.0

    df = spark.range(100).selectExpr("CAST(id AS STRING) AS sent_id")
    folds = cv_splits(df, k=5)
    counts = {r["fold"]: r["n"] for r in folds.groupBy("fold").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3, 4}
    assert folds.count() == 100


def test_global_ranked_cumsum_matches_local(spark):
    """Two-phase ranked cumsum (no single-partition window) must equal
    the driver-side sort+cumsum exactly, across many partitions."""
    import pandas as pd

    from deepref_spark.operators.metrics import global_ranked_cumsum, pr_curve

    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({
        "sent_id": [f"s{i:04d}" for i in range(500)],
        "score": np.round(rng.rand(500) * 0.5 + 0.25, 6),
        "is_correct": rng.randint(0, 2, 500).astype(bool),
    })
    df = spark.createDataFrame(pdf).repartition(16)
    import pyspark.sql.functions as F

    ranked = global_ranked_cumsum(
        df.withColumn("_c", F.col("is_correct").cast("long")),
        [F.desc("score"), F.asc("sent_id")], "_c",
    ).select("sent_id", "rk", "cum").toPandas().set_index("sent_id")

    ref = pdf.sort_values(["score", "sent_id"], ascending=[False, True]).reset_index(drop=True)
    ref["rk"] = np.arange(1, len(ref) + 1)
    ref["cum"] = ref["is_correct"].astype(int).cumsum()
    for _, r in ref.iterrows():
        assert ranked.loc[r["sent_id"], "rk"] == r["rk"]
        assert ranked.loc[r["sent_id"], "cum"] == r["cum"]

    # pr_curve end-to-end on the same data
    curve = pr_curve(df).toPandas().set_index("sent_id")
    total = max(int(ref["is_correct"].sum()), 1)
    for _, r in ref.iterrows():
        assert abs(curve.loc[r["sent_id"], "prec"] - r["cum"] / r["rk"]) < 1e-12
        assert abs(curve.loc[r["sent_id"], "rec"] - r["cum"] / total) < 1e-12


def test_load_hf_weights_mapping():
    """S7 adapter: a (fake, HF-key-named) checkpoint state_dict flows
    into forward_batch's layout — shapes, transposition, and the scoring
    path all work without torch."""
    rng = np.random.RandomState(0)
    H, V, N = 8, 64, 6
    sd = {
        "sentence_encoder.bert.embeddings.word_embeddings.weight": rng.randn(V, H),
        "sentence_encoder.linear.weight": rng.randn(2 * H, 2 * H),   # torch (out, in)
        "sentence_encoder.linear.bias": rng.randn(2 * H),
        "fc.weight": rng.randn(N, 2 * H),
        "fc.bias": rng.randn(N),
    }
    w = mdl.load_hf_weights(sd, n_relations=N)
    assert w["emb"].shape == (V, H) and w["w_fc"].shape == (2 * H, N)
    assert (w["logit_offset"] == 0).all()
    ids = rng.randint(0, V, (16, 12))
    mask = np.ones((16, 12), dtype=np.int64)
    pos = rng.randint(0, 12, 16)
    pred, score = mdl.forward_batch(w, ids, mask, pos, pos)
    assert pred.shape == (16,) and ((score > 0) & (score <= 1)).all()
    # transposition is load-bearing: w_fc must be fc.weight.T
    assert np.allclose(w["w_fc"], np.asarray(sd["fc.weight"]).T)
