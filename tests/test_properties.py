"""Property-based tests (hypothesis) over the refsem kernels: the
row-level semantics must hold for ARBITRARY well-formed inputs, not
just the golden cases. Each property mirrors an invariant the reference
enforces implicitly (asserts in preprocessor.py:19-40, marker
arithmetic in sentence.py:15-29)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from deepref_spark import refsem
from deepref_spark.nlp import RuleTagger

WORDS = st.text(alphabet="abcdefghij", min_size=1, max_size=6)


@st.composite
def tagged_streams(draw):
    """Well-formed tagged sentences: two non-overlapping [start, end)
    spans over a random token stream, head-first or tail-first, plus
    optional unrelated-marker spans."""
    toks = draw(st.lists(WORDS, min_size=6, max_size=20))
    n = len(toks)
    cuts = sorted(draw(st.lists(st.integers(0, n), min_size=4, max_size=4,
                                unique=True)))
    a0, a1, b0, b1 = cuts
    if a1 == a0 or b1 == b0 or a1 > b0:
        a0, a1, b0, b1 = 0, max(1, a1), max(2, b0), max(3, b1)
        if a1 > b0:
            a1 = b0 = (a1 + b0) // 2
            a1 = max(1, a1)
            b0 = a1 + 1
            b1 = max(b0 + 1, b1)
            if b1 > n:
                return draw(tagged_streams())
    rev = draw(st.booleans())
    h_span, t_span = ((b0, b1), (a0, a1)) if rev else ((a0, a1), (b0, b1))
    first, second = min(h_span, t_span), max(h_span, t_span)
    fm = (refsem.E1_START, refsem.E1_END) if first == h_span else (refsem.E2_START, refsem.E2_END)
    sm = (refsem.E1_START, refsem.E1_END) if second == h_span else (refsem.E2_START, refsem.E2_END)
    out = (
        toks[: first[0]] + [fm[0]] + toks[first[0]:first[1]] + [fm[1]]
        + toks[first[1]:second[0]] + [sm[0]] + toks[second[0]:second[1]] + [sm[1]]
        + toks[second[1]:]
    )
    return " ".join(out), toks, h_span, t_span


@given(tagged_streams())
@settings(max_examples=200, deadline=None)
def test_untag_get_entities_roundtrip(case):
    """untag recovers the original stream; get_entities recovers the
    exact spans and names for every well-formed tagging."""
    tagged, toks, h_span, t_span = case
    stream = tagged.split()
    assert refsem.untag_tokens(stream) == toks
    e1, e2 = refsem.get_entities(stream, toks)
    assert e1["position"] == list(h_span)
    assert e2["position"] == list(t_span)
    assert e1["name"] == " ".join(toks[h_span[0]:h_span[1]]).lower()
    assert e2["name"] == " ".join(toks[t_span[0]:t_span[1]]).lower()


@given(tagged_streams(), st.lists(st.sampled_from(["sw", "d", "p", "b"]),
                                  max_size=3))
@settings(max_examples=100, deadline=None)
def test_delete_kernel_preserves_invariants(case, kinds):
    """Any delete-kernel combination (sw/p/b/d) keeps (a) lockstep
    column lengths, (b) span-name consistency, (c) in-bounds spans —
    the asserts the reference's process_sentence enforces
    (preprocessor.py:36-40)."""
    tagged, toks, _, _ = case
    try:
        m = refsem.build_mention(tagged, "Other", RuleTagger())
    except (ValueError, IndexError, AssertionError):
        return  # malformed for the pipeline contract: converter skip
    out = refsem.apply_preprocessing(m, kinds, "ENTITY")
    assert len(out.token) == len(out.pos_tags) == len(out.deps) == len(out.ner)
    for ent in (out.h, out.t):
        lo, hi = ent["pos"]
        assert 0 <= lo <= hi <= len(out.token)
        assert " ".join(out.token[lo:hi]) == ent["name"]


@given(tagged_streams(), st.lists(st.sampled_from(["sw", "d", "p", "b"]),
                                  max_size=2))
@settings(max_examples=100, deadline=None)
def test_entity_blinding_quirks(case, pre_kinds):
    """eb after any delete combination: spans collapse to width 1 and
    point at the replacement token; names stay the ORIGINAL surface
    form and tag columns are NOT rewritten — both reference quirks
    (entity_blinding_preprocessor.py:37-61 mutates only
    original_sentence and positions)."""
    tagged, toks, _, _ = case
    try:
        m = refsem.build_mention(tagged, "Other", RuleTagger())
    except (ValueError, IndexError, AssertionError):
        return
    names = (m.h["name"], m.t["name"])
    n_tags = len(m.pos_tags)
    pre = refsem.apply_preprocessing(m, pre_kinds, "ENTITY")
    n_pre_tags = len(pre.pos_tags)
    out = refsem.apply_preprocessing(pre, ["eb"], "ENTITY")
    for ent, name in zip((out.h, out.t), names):
        lo, hi = ent["pos"]
        assert hi == lo + 1
        assert out.token[lo] == "ENTITY"
        assert ent["name"] == name  # original surface form survives
    assert len(out.pos_tags) == n_pre_tags <= n_tags  # tags untouched by eb


@given(st.lists(WORDS, min_size=0, max_size=8))
@settings(max_examples=200, deadline=None)
def test_wordpiece_greedy_reconstructs(words):
    """For in-alphabet words greedy wordpiece is lossless: stripping
    '##' and concatenating reconstructs the word; no [UNK] appears."""
    for w in words:
        pieces = refsem.wordpiece_greedy(w)
        assert "[UNK]" not in pieces
        assert "".join(p.removeprefix("##") for p in pieces) == w
        assert all(p.startswith("##") for p in pieces[1:])


@given(st.lists(st.integers(0, 1 << 60), min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_md5_mod_py_matches_duckdb(values):
    """The Python twin of the portable hash must agree with DuckDB on
    arbitrary inputs (the whole oracle edifice rests on this)."""
    import duckdb

    strs = [str(v) for v in values]
    got = duckdb.sql(
        "SELECT " + ", ".join(
            f"(ascii(substr(md5('{s}'),1,1))*131071 + ascii(substr(md5('{s}'),2,1))*8191 "
            f"+ ascii(substr(md5('{s}'),3,1))*127 + ascii(substr(md5('{s}'),4,1))) % 100000"
            for s in strs
        )
    ).fetchone()
    assert list(got) == [refsem.md5_mod_py(s, 100000) for s in strs]
