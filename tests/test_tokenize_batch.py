"""Batch tokenizer == scalar kernel, element-wise, on adversarial layouts."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deepref_spark import refsem
from deepref_spark.operators.tokenize_batch import bert_entity_tokenize_batch

WORDS = ["the", "warfarin", "unaffable", "x1", "interaction", "city,",
         "pre-dose", "[CLS]", "a b", "", "zzzzzzzzzzzzzzzzzzzzzzzz",
         "[unused0]", "[unused5]"]


def _scalar(tokens, hp, tp, ml, mask_entity=False):
    return refsem.bert_entity_tokenize(
        list(tokens), list(hp), list(tp), max_length=ml, mask_entity=mask_entity
    )


def _check(rows, ml, mask_entity=False):
    ids, mask, p1, p2 = bert_entity_tokenize_batch(
        [r[0] for r in rows],
        [r[1][0] for r in rows], [r[1][1] for r in rows],
        [r[2][0] for r in rows], [r[2][1] for r in rows],
        max_length=ml, mask_entity=mask_entity,
    )
    for i, (tokens, hp, tp) in enumerate(rows):
        e_ids, e_mask, e_p1, e_p2 = _scalar(tokens, hp, tp, ml, mask_entity)
        assert ids[i].tolist() == e_ids, (tokens, hp, tp)
        assert mask[i].tolist() == e_mask, (tokens, hp, tp)
        assert (p1[i], p2[i]) == (e_p1, e_p2), (tokens, hp, tp)


@st.composite
def mention_row(draw):
    n = draw(st.integers(0, 12))
    tokens = [draw(st.sampled_from(WORDS)) for _ in range(n)]
    # spans beyond range, inverted, overlapping, degenerate — all fair game
    idx = st.integers(0, max(0, n + 2))
    hp = [draw(idx), draw(idx)]
    tp = [draw(idx), draw(idx)]
    return tokens, hp, tp


@settings(max_examples=120, deadline=None)
@given(st.lists(mention_row(), min_size=1, max_size=8), st.sampled_from([16, 128]))
def test_batch_equals_scalar(rows, ml):
    _check(rows, ml)


@settings(max_examples=40, deadline=None)
@given(st.lists(mention_row(), min_size=1, max_size=4))
def test_batch_equals_scalar_mask_entity(rows):
    _check(rows, 32, mask_entity=True)


def test_negative_positions_fall_back_to_python_slices():
    rows = [
        (["a", "b", "c", "d", "e"], [-1, 2], [3, 4]),
        (["a", "b", "c", "d", "e"], [0, 1], [-3, -1]),
        (["a", "b", "c"], [-2, -1], [-1, 3]),
    ]
    _check(rows, 16)


def test_truncation_and_long_words():
    long_doc = ["warfarin"] * 100
    rows = [(long_doc, [2, 4], [50, 60]), (long_doc, [90, 95], [1, 2])]
    _check(rows, 128)
    _check(rows, 16)


def test_empty_batch():
    ids, mask, p1, p2 = bert_entity_tokenize_batch([], [], [], [], [], max_length=8)
    assert ids.shape == (0, 8) and mask.shape == (0, 8)
    assert p1.size == 0 and p2.size == 0


SK_STRINGS = ["entity", "warfarin", "city of glass", "", "a b c", "unaffable",
              "[unused4]", "[unused7] x"]


def test_ebem_literal_marker_tokens_fall_back():
    """The pinned vocab contains the special tokens, so a document that
    literally says '[unused0]' wordpieces to that exact piece and the
    scalar .index() finds IT first — the review-confirmed divergence.
    These rows must route through the scalar kernel."""
    rows = [
        (["[unused0]", "likes", "alice", "bob"], [2, 3], [3, 4],
         ["x", "y", "z", "w"]),
        (["plain", "words", "alice", "bob"], [2, 3], [3, 4],
         ["[unused4]", "y", "z", "w"]),
        (["a", "[unused6]", "b", "c", "d"], [0, 1], [3, 4],
         ["x", "y", "[unused5]", "w"]),
    ]
    from deepref_spark.operators.tokenize_batch import ebem_tokenize_batch

    for mask_entity in (False, True):
        ids, mask, p1, p2, sk1, sk2 = ebem_tokenize_batch(
            [r[0] for r in rows],
            [r[1][0] for r in rows], [r[1][1] for r in rows],
            [r[2][0] for r in rows], [r[2][1] for r in rows],
            [r[3][0] for r in rows], [r[3][1] for r in rows],
            [r[3][2] for r in rows], [r[3][3] for r in rows],
            max_length=32, mask_entity=mask_entity,
        )
        for i, (tokens, hp, tp, sks) in enumerate(rows):
            exp = refsem.ebem_tokenize(
                list(tokens), list(hp), list(tp),
                {"ses1": [sks[0], sks[1]], "ses2": [sks[2], sks[3]]},
                max_length=32, mask_entity=mask_entity,
            )
            assert ids[i].tolist() == exp["ids"], (tokens, mask_entity)
            assert (p1[i], p2[i]) == (exp["pos1"], exp["pos2"]), (tokens, mask_entity)
            assert sk1[i].tolist() == exp["sk_pos1"], (tokens, mask_entity)
            assert sk2[i].tolist() == exp["sk_pos2"], (tokens, mask_entity)


@st.composite
def ebem_row(draw):
    tokens, hp, tp = draw(mention_row())
    sks = [draw(st.sampled_from(SK_STRINGS)) for _ in range(4)]
    return tokens, hp, tp, sks


@settings(max_examples=100, deadline=None)
@given(st.lists(ebem_row(), min_size=1, max_size=6),
       st.sampled_from([16, 128]), st.booleans())
def test_ebem_batch_equals_scalar(rows, ml, mask_entity):
    from deepref_spark.operators.tokenize_batch import ebem_tokenize_batch

    ids, mask, p1, p2, sk1, sk2 = ebem_tokenize_batch(
        [r[0] for r in rows],
        [r[1][0] for r in rows], [r[1][1] for r in rows],
        [r[2][0] for r in rows], [r[2][1] for r in rows],
        [r[3][0] for r in rows], [r[3][1] for r in rows],
        [r[3][2] for r in rows], [r[3][3] for r in rows],
        max_length=ml, mask_entity=mask_entity,
    )
    for i, (tokens, hp, tp, sks) in enumerate(rows):
        exp = refsem.ebem_tokenize(
            list(tokens), list(hp), list(tp),
            {"ses1": [sks[0], sks[1]], "ses2": [sks[2], sks[3]]},
            max_length=ml, mask_entity=mask_entity,
        )
        assert ids[i].tolist() == exp["ids"], (tokens, hp, tp, sks)
        assert mask[i].tolist() == exp["att_mask"], (tokens, hp, tp, sks)
        assert (p1[i], p2[i]) == (exp["pos1"], exp["pos2"]), (tokens, hp, tp, sks)
        assert sk1[i].tolist() == exp["sk_pos1"], (tokens, hp, tp, sks)
        assert sk2[i].tolist() == exp["sk_pos2"], (tokens, hp, tp, sks)


def test_ebem_negative_positions_fall_back():
    from deepref_spark.operators.tokenize_batch import ebem_tokenize_batch

    rows = [(["a", "b", "c", "d"], [-1, 2], [2, 3], ["x", "y", "z", "w"])]
    ids, mask, p1, p2, sk1, sk2 = ebem_tokenize_batch(
        [rows[0][0]], [-1], [2], [2], [3], ["x"], ["y"], ["z"], ["w"], max_length=16
    )
    exp = refsem.ebem_tokenize(
        ["a", "b", "c", "d"], [-1, 2], [2, 3],
        {"ses1": ["x", "y"], "ses2": ["z", "w"]}, max_length=16,
    )
    assert ids[0].tolist() == exp["ids"]
    assert (p1[0], p2[0]) == (exp["pos1"], exp["pos2"])
    assert sk1[0].tolist() == exp["sk_pos1"] and sk2[0].tolist() == exp["sk_pos2"]


@settings(max_examples=80, deadline=None)
@given(st.lists(mention_row(), min_size=1, max_size=8), st.sampled_from([8, 64]))
def test_word_position_batch_equals_scalar(rows, ml):
    from deepref_spark.operators.tokenize_batch import (
        pcnn_segment_mask_batch,
        word_position_tokenize_batch,
    )

    ids, p1, p2 = word_position_tokenize_batch(
        [r[0] for r in rows],
        [r[1][0] for r in rows], [r[2][0] for r in rows], max_length=ml,
    )
    seg = pcnn_segment_mask_batch(
        [len(r[0]) for r in rows],
        [r[1][0] for r in rows], [r[2][0] for r in rows], max_length=ml,
    )
    for i, (tokens, hp, tp) in enumerate(rows):
        e_ids, e_p1, e_p2 = refsem.word_position_tokenize(
            list(tokens), list(hp), list(tp), max_length=ml
        )
        e_seg = refsem.pcnn_segment_mask(len(tokens), list(hp), list(tp), max_length=ml)
        assert ids[i].tolist() == e_ids, (tokens, hp, tp)
        assert p1[i].tolist() == e_p1, (tokens, hp, tp)
        assert p2[i].tolist() == e_p2, (tokens, hp, tp)
        assert seg[i].tolist() == e_seg, (tokens, hp, tp)


def test_batch_kernel_accepts_custom_wp_wordpiece_basic():
    """A custom wp kernel (wordpiece_basic — BasicTokenizer
    normalization + greedy wordpiece) flows through the vectorized
    batch path bit-identically to the scalar kernel, including words
    the normalization SPLITS (punctuation, accents, case)."""
    from deepref_spark import refsem
    from deepref_spark.operators.tokenize_batch import bert_entity_tokenize_batch

    rows = [
        (["The", "Café,", "serves", "Tea!"], 1, 2, 3, 4),
        (["Aspirin", "(fast)", "beats", "placebo."], 0, 1, 3, 4),
        (["a中国b", "meets", "naïve", "U.S.A."], 0, 1, 2, 3),
    ]
    toks = [r[0] for r in rows]
    h0, h1, t0, t1 = ([r[i] for r in rows] for i in (1, 2, 3, 4))
    ids_b, mask_b, p1_b, p2_b = bert_entity_tokenize_batch(
        toks, h0, h1, t0, t1, wp=refsem.wordpiece_basic
    )
    for i, (tk, a, b, c, d) in enumerate(rows):
        ids_s, mask_s, p1_s, p2_s = refsem.bert_entity_tokenize(
            tk, [a, b], [c, d], wp=refsem.wordpiece_basic
        )
        assert list(ids_b[i]) == ids_s and list(mask_b[i]) == mask_s
        assert (p1_b[i], p2_b[i]) == (p1_s, p2_s)
