"""Pluggable NLP tagging backends (T3/T4 in SURVEY.md §2.2).

The reference runs spaCy/Stanza per sentence
(deepref/nlp/spacy_nlp_tool.py:13-26, stanza_nlp_tool.py:8-17) to get
(tokens, upos, deps, ner) for the untagged sentence. Neither library is
available in this container, so the default backend is ``RuleTagger`` —
a deterministic, order-sensitive rule cascade whose rules are *also*
emittable as a SQL CASE expression (see portable.py), which is what
makes the parse stage oracle-checkable in DuckDB.

A real spaCy/Stanza backend slots in behind the same ``tagger(tokens)
-> (pos_tags, deps, ner)`` contract when installed (import-try below);
at cluster scale either backend runs inside ``mapInPandas`` with a
per-worker lazy pipeline — never on the driver.
"""

from __future__ import annotations

import re

# Ordered rule cascade over the lowercased token. Each entry is
# (tag, kind, payload): kind 'regex' | 'in' | 'suffix'. First match wins;
# fallback tag is NOUN. portable.py compiles this same table to SQL.
PUNCT_REGEX = r"^[.,;:!?()\[\]'\"%/-]+$"
NUM_REGEX = r"^[0-9]+([.,][0-9]+)*$"

TAG_RULES: list[tuple[str, str, object]] = [
    ("PUNCT", "regex", PUNCT_REGEX),
    ("NUM", "regex", NUM_REGEX),
    ("DET", "in", ("the", "a", "an", "this", "that", "these", "those")),
    ("ADP", "in", ("of", "in", "on", "at", "by", "with", "from", "to", "for", "into", "about")),
    ("CCONJ", "in", ("and", "or", "but")),
    ("AUX", "in", ("is", "are", "was", "were", "be", "been", "am", "has", "have", "had")),
    ("PRON", "in", ("he", "she", "it", "they", "we", "you", "i", "its", "their", "his")),
    ("ADV", "suffix", ("ly",)),
    ("VERB", "suffix", ("ing", "ed")),
    ("ADJ", "suffix", ("ous", "ful", "ive", "ical")),
]
FALLBACK_TAG = "NOUN"

# Deterministic token-level dep label per upos (stands in for the parse
# tree; real backends emit true relations). Lowercased like
# spacy_nlp_tool.py:19.
DEP_BY_TAG = {
    "PUNCT": "punct", "NUM": "nummod", "DET": "det", "ADP": "prep",
    "CCONJ": "cc", "AUX": "aux", "PRON": "nsubj", "ADV": "advmod",
    "VERB": "root", "ADJ": "amod", "NOUN": "pobj",
}

_COMPILED = [(tag, kind, re.compile(pat) if kind == "regex" else pat) for tag, kind, pat in TAG_RULES]


_RULE_TAG_MEMO: dict[str, str] = {}
_RULE_TAG_MEMO_CAP = 500_000


def rule_tag_token(token: str) -> str:
    # memoized per process: the rule cascade is ~75% of build_mention's
    # cost and token frequency is Zipf, so after warmup the cascade runs
    # roughly once per DISTINCT token per worker; capped because the
    # distinct-token universe is unbounded at web scale
    hit = _RULE_TAG_MEMO.get(token)
    if hit is not None:
        return hit
    if len(_RULE_TAG_MEMO) >= _RULE_TAG_MEMO_CAP:
        _RULE_TAG_MEMO.clear()
    tag = FALLBACK_TAG
    for t, kind, payload in _COMPILED:
        if kind == "regex":
            if payload.match(token):
                tag = t
                break
        elif kind == "in":
            if token in payload:
                tag = t
                break
        else:  # suffix
            if any(token.endswith(s) for s in payload):
                tag = t
                break
    _RULE_TAG_MEMO[token] = tag
    return tag


class RuleTagger:
    """Deterministic backend. NER mirrors the spaCy path's shape
    (spacy_nlp_tool.py:20-23): 'O' everywhere by default; the pipeline
    overwrites entity spans with 'ENT' post-hoc (position info lives
    outside the tagger, as in the reference where NER comes from the
    untagged parse)."""

    name = "ruletag"

    def __call__(self, tokens: list[str]) -> tuple[list[str], list[str], list[str]]:
        pos = [rule_tag_token(t) for t in tokens]
        deps = [DEP_BY_TAG[p] for p in pos]
        ner = ["O"] * len(tokens)
        return pos, deps, ner


class SpacyTagger:
    """Real-backend adapter (deepref/nlp/spacy_nlp_tool.py:13-26):
    pos/deps(lower)/ner from the untagged sentence; per-token NER labels
    with 'O' default. Lazy per-process pipeline for executor reuse."""

    name = "spacy"

    def __init__(self, model: str = "en_core_web_sm"):
        self.model = model
        self._nlp = None

    def _pipeline(self):
        if self._nlp is None:
            import spacy  # noqa: F401 — optional dependency

            self._nlp = spacy.load(self.model)
        return self._nlp

    def __call__(self, tokens: list[str]) -> tuple[list[str], list[str], list[str]]:
        doc = self._pipeline()(" ".join(tokens))
        pos = [t.pos_ for t in doc]
        deps = [t.dep_.lower() for t in doc]
        ner = ["O"] * len(doc)
        for ent in doc.ents:
            for i in range(ent.start, ent.end):
                ner[i] = ent.label_
        return pos, deps, ner


class StanzaTagger:
    """T4 — Stanza adapter (deepref/nlp/stanza_nlp_tool.py:8-17):
    Pipeline('tokenize,ner,depparse,pos,lemma', tokenize_no_ssplit=True)
    over the untagged sentence; upos / deprel / per-token ner with the
    same (pos, deps, ner) contract as the other backends. Lazy
    per-process pipeline: on an executor the download/load happens once
    per python worker, never on the driver."""

    name = "stanza"

    def __init__(self, model: str | None = None):
        self.model = model or "default"
        self._nlp = None
        self._fallback = None

    def _pipeline(self):
        if self._nlp is None:
            import stanza  # noqa: F401 — optional dependency

            # tokenize_pretokenized: our contract is lockstep tags over
            # the ALREADY-tokenized stream (Mention invariant); letting
            # stanza re-tokenize would misalign pos/deps with the input
            # tokens (its tokenizer splits differently). The reference
            # parses raw sentences (stanza_nlp_tool.py:9) because its
            # tokens COME from the parse; ours are upstream.
            self._nlp = stanza.Pipeline(
                lang="en", package=self.model,
                processors="tokenize,ner,depparse,pos,lemma",
                tokenize_pretokenized=True,
            )
        return self._nlp

    def __call__(self, tokens: list[str]) -> tuple[list[str], list[str], list[str]]:
        # model files are a separate download from the pip package —
        # degrade at CALL time too (an executor without
        # ~/stanza_resources must not fail the stage)
        if self._fallback is not None:
            return self._fallback(tokens)
        try:
            doc = self._pipeline()([tokens])
        except Exception:
            self._fallback = RuleTagger()
            return self._fallback(tokens)
        pos = [w.upos for s in doc.sentences for w in s.words]
        deps = [(w.deprel or "dep").lower() for s in doc.sentences for w in s.words]
        ner = [t.ner for s in doc.sentences for t in s.tokens]
        if len(pos) != len(tokens):
            # multi-word-token expansion (no 'mwt' processor requested,
            # but stanza can still split) would break the lockstep
            # Mention invariant (one tag per input token) — degrade to
            # the deterministic tagger for THIS call rather than emit a
            # misaligned stream
            return RuleTagger()(tokens)
        if len(ner) != len(pos):
            ner = (ner + ["O"] * len(pos))[: len(pos)]
        return pos, deps, ner


def get_tagger(backend: str = "ruletag"):
    """Backend dispatch (T3/T4). Unavailable libraries degrade to the
    deterministic RuleTagger so the pipeline keeps running."""
    if backend == "spacy":
        try:
            import spacy  # noqa: F401

            return SpacyTagger()
        except ImportError:
            return RuleTagger()
    if backend == "stanza":
        try:
            import stanza  # noqa: F401

            return StanzaTagger()
        except ImportError:
            return RuleTagger()
    return RuleTagger()
