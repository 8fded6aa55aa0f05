"""Reference semantics, transcribed — the single source of truth for
row-level behavior that the Spark operators must reproduce bit-exactly.

Every function documents the reference location it mirrors
(`path:line` into /root/reference, igorvlnascimento/DeepREF). These are
fresh implementations of the *semantics* (including the reference's
quirks, which are called out inline) — used as (a) the pytest oracle and
(b) the batch kernels inside Arrow-vectorized pandas UDFs.

Nothing in this module touches Spark; it is plain Python/numpy over
batches so it can be unit-tested in isolation.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Marker vocabulary (deepref/dataset/converters/dataset_converter.py:47-56)
# ---------------------------------------------------------------------------

E1_START = "ENTITYSTART"
E1_END = "ENTITYEND"
E2_START = "ENTITYOTHERSTART"
E2_END = "ENTITYOTHEREND"
OTHER_START = "ENTITYUNRELATEDSTART"
OTHER_END = "ENTITYUNRELATEDEND"

PAIR_MARKERS = (E1_START, E1_END, E2_START, E2_END)

# Negative-class detection order (deepref/framework/data_loader.py:68).
NEGATIVE_CLASS_NAMES = ["NA", "na", "no_relation", "Other", "Others", "none", "None", "int"]

# NLTK english stopword inventory (public list, as consumed by
# deepref/dataset/preprocessors/stop_word_preprocessor.py:25-27, which then
# drops 'o' from the set before filtering).
NLTK_ENGLISH_STOPWORDS = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "having", "do",
    "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't",
    "couldn", "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn",
    "hadn't", "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't", "shan",
    "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't",
    "won", "won't", "wouldn", "wouldn't",
]

# stop_word_preprocessor.py:26-27: set(stopwords) then .remove('o').
STOPWORDS_MINUS_O = frozenset(NLTK_ENGLISH_STOPWORDS) - {"o"}

# Preprocessing application order is FIXED regardless of the key order
# the user passes (deepref/framework/train.py:91-124); 'eb' and 'nb'
# together degrade to 'nb' (deepref/config.py:8-15).
PREPROC_ORDER = ("sw", "p", "b", "d", "eb", "nb")
PREPROC_KEYS = ("sw", "d", "b", "p", "eb", "nb")


def variant_key(preprocessing_types: list[str]) -> str:
    """Variant directory/partition key (deepref/dataset/dataset.py:65-70):
    sorted keys joined by '_', empty list -> 'original'."""
    if not preprocessing_types:
        return "original"
    return "_".join(sorted(preprocessing_types))


def normalize_preproc(preprocessing_types: list[str]) -> list[str]:
    """eb+nb together -> nb only (deepref/config.py:8-15); fixed apply
    order per deepref/framework/train.py:91-124."""
    kinds = set(preprocessing_types)
    if "eb" in kinds and "nb" in kinds:
        kinds.discard("eb")
    return [k for k in PREPROC_ORDER if k in kinds]


def all_preproc_combinations() -> list[list[str]]:
    """The 48 legal combinations (deepref/config.py:3-20,26: all subsets of
    [sw,d,b,p,eb,nb], eb+nb collapsed to nb, dedup preserving first)."""
    import itertools

    combos: list[list[str]] = []
    for r in range(len(PREPROC_KEYS) + 1):
        for comb in itertools.combinations(PREPROC_KEYS, r):
            comb = list(comb)
            if "eb" in comb and "nb" in comb:
                comb.remove("eb")
            if comb not in combos:
                combos.append(comb)
    return combos


# ---------------------------------------------------------------------------
# Converters (S1/S2 + T1/T2)
# ---------------------------------------------------------------------------

def remove_whitespace(line: str) -> str:
    """Collapse runs of whitespace (dataset_converter.py:29-30)."""
    return str(" ".join(line.split()).strip())


def tag_sentence_semeval(line: str) -> str:
    """SemEval-2010 line -> tagged sentence
    (semeval2010_converter.py:11-29): drop the id column, strip one pair
    of surrounding double quotes, inline-replace <e1>/<e2> markers."""
    _, sent = line.split("\t")
    sent = sent.strip()
    if sent[0] == '"':
        sent = sent[1:]
    if sent[-1] == '"':
        sent = sent[:-1]
    tagged = sent.replace("<e1>", f" {E1_START} ")
    tagged = tagged.replace("</e1>", f" {E1_END} ")
    tagged = tagged.replace("<e2>", f" {E2_START} ")
    tagged = tagged.replace("</e2>", f" {E2_END} ")
    return remove_whitespace(tagged)


def _parse_offset(position: str) -> tuple[int, int]:
    """'12-18' -> (12, 18); offsets are INCLUSIVE on both ends
    (dataset_converter.py:32-34)."""
    a, b = position.split("-")[0], position.split("-")[1]
    return int(a), int(b)


def tag_sentence_offsets(
    sentence: str,
    e1_offsets: list[str],
    e2_offsets: list[str],
    other_offsets: list[list[str]],
) -> str:
    """Char-offset tagging (dataset_converter.py:44-85). Semantics to
    preserve exactly:

    * the position dict is first-wins: if e2 (or an 'other') shares an
      offset with an earlier entity, the earlier markers stay (:46-56);
    * spans are processed in ascending start order (:39-42);
    * the text after the LAST span is appended only when there are >= 2
      spans (the trailing-append lives in the i>0 branch, :74-80) — a
      single-span sentence silently loses its tail;
    * empty middles between adjacent spans become a single space (:76-78);
    * final whitespace collapse (:81).
    """
    position_dict: dict[str, dict[str, str]] = {}
    for pos in e1_offsets:
        if pos not in position_dict:
            position_dict[pos] = {"start": E1_START, "end": E1_END}
    for pos in e2_offsets:
        if pos not in position_dict:
            position_dict[pos] = {"start": E2_START, "end": E2_END}
    for ent in other_offsets:
        for pos in ent:
            if pos not in position_dict:
                position_dict[pos] = {"start": OTHER_START, "end": OTHER_END}

    ordered = sorted(position_dict.keys(), key=lambda p: int(p.split("-")[0]))
    out = ""
    for i, cur in enumerate(ordered):
        start, end = _parse_offset(cur)
        piece = f" {position_dict[cur]['start']} {sentence[start:end + 1]} {position_dict[cur]['end']} "
        if i == 0:
            out += sentence[:start] + piece
        else:
            _, prev_end = _parse_offset(ordered[i - 1])
            middle = sentence[prev_end + 1:start]
            if middle == "":
                middle = " "
            out += middle + piece
            if i == len(ordered) - 1 and end < len(sentence) - 1:
                out += " " + sentence[end + 1:]
    return remove_whitespace(out)


# ---------------------------------------------------------------------------
# Untag + entity-position arithmetic (T5/T6, the bit-exact critical path)
# ---------------------------------------------------------------------------

def untag_tokens(tokens: list[str]) -> list[str]:
    """First-occurrence removal of the 4 pair markers, all-occurrence
    removal of the unrelated markers (deepref/nlp/nlp_tool.py:9-19).
    list.remove's first-occurrence behavior is the critical quirk."""
    out = list(tokens)
    for marker in PAIR_MARKERS:
        out.remove(marker)  # raises ValueError if absent, like the reference
    while OTHER_START in out:
        out.remove(OTHER_START)
    while OTHER_END in out:
        out.remove(OTHER_END)
    return out


def untag_sentence(tagged_sentence: str) -> str:
    """deepref/nlp/nlp_tool.py:9-19 (string form)."""
    return " ".join(untag_tokens(tagged_sentence.split()))


def get_entities(tokens: list[str], original: list[str]) -> tuple[dict, dict]:
    """Entity spans from marker indexes (deepref/dataset/sentence.py:15-29).

    ``tokens`` is the tagged token stream; unrelated markers are removed
    first (the reference mutates self.tokens in place doing this). The
    -1/-2/-3 shifts convert marker indexes in the 4-marker stream into
    [start, end) spans over the marker-free ``original`` stream; which
    branch applies depends on whether e1's END marker precedes e2's.
    Names are space-joined original tokens, lowercased (:27-29).
    """
    toks = [t for t in tokens if t not in (OTHER_START, OTHER_END)]
    if toks.index(E1_END) < toks.index(E2_END):
        pos1 = [toks.index(E1_START), toks.index(E1_END) - 1]
        pos2 = [toks.index(E2_START) - 2, toks.index(E2_END) - 3]
    else:
        pos1 = [toks.index(E1_START) - 2, toks.index(E1_END) - 3]
        pos2 = [toks.index(E2_START), toks.index(E2_END) - 1]
    e1_name = " ".join(original[pos1[0]:pos1[1]])
    e2_name = " ".join(original[pos2[0]:pos2[1]])
    return (
        {"name": e1_name.lower(), "position": pos1},
        {"name": e2_name.lower(), "position": pos2},
    )


# ---------------------------------------------------------------------------
# Mention row (the reference's txt-line dict, dataset.py:94-104)
# ---------------------------------------------------------------------------

@dataclass
class Mention:
    token: list[str]
    h: dict
    t: dict
    relation: str
    pos_tags: list[str]
    deps: list[str]
    ner: list[str]
    sk: dict = field(default_factory=dict)

    def copy(self) -> "Mention":
        return Mention(
            list(self.token),
            {"name": self.h["name"], "pos": list(self.h["pos"])},
            {"name": self.t["name"], "pos": list(self.t["pos"])},
            self.relation,
            list(self.pos_tags),
            list(self.deps),
            list(self.ner),
            {k: list(v) for k, v in self.sk.items()},
        )


def build_mention(tagged_sentence: str, relation: str, tagger, sk_lookup=None) -> Mention:
    """Sentence construction (deepref/dataset/sentence.py:6-41 +
    dataset.py:94-104): parse the tagged stream, untag, derive entities,
    lowercase the joined sentence, attach tags from the untagged parse.

    ``tagger(tokens) -> (pos_tags, deps, ner)`` operates on the untagged
    token stream (mirrors spacy_nlp_tool.py:13-26 which re-parses the
    untagged sentence for upos/deps/ner).
    """
    tokens = tagged_sentence.split()
    original = untag_tokens(tokens)
    e1, e2 = get_entities(tokens, original)
    lowered = " ".join(original).lower().split()
    pos_tags, deps, ner = tagger(lowered)
    sk = sk_lookup([e1["name"], e2["name"]]) if sk_lookup else {"ses1": [], "ses2": []}
    return Mention(
        token=lowered,
        h={"name": e1["name"], "pos": list(e1["position"])},
        t={"name": e2["name"], "pos": list(e2["position"])},
        relation=relation,
        pos_tags=list(pos_tags),
        deps=list(deps),
        ner=list(ner),
        sk=sk,
    )


# ---------------------------------------------------------------------------
# Preprocessors (T9-T13 over the shared delete-by-indexes kernel P1)
# ---------------------------------------------------------------------------

def process_sentence(m: Mention, indexes: list[int]) -> Mention:
    """Delete tokens at ``indexes`` across all lockstep columns and shift
    both entity spans by the number of deletions before each
    (deepref/dataset/preprocessors/preprocessor.py:19-40)."""
    before1 = sum(1 for i in indexes if i < m.h["pos"][0])
    before2 = sum(1 for i in indexes if i < m.t["pos"][0])
    drop = set(indexes)
    m.token = [tok for i, tok in enumerate(m.token) if i not in drop]
    m.pos_tags = [p for i, p in enumerate(m.pos_tags) if i not in drop]
    m.deps = [d for i, d in enumerate(m.deps) if i not in drop]
    m.ner = [n for i, n in enumerate(m.ner) if i not in drop]
    m.h["pos"] = [m.h["pos"][0] - before1, m.h["pos"][1] - before1]
    m.t["pos"] = [m.t["pos"][0] - before2, m.t["pos"][1] - before2]
    assert " ".join(m.token[m.h["pos"][0]:m.h["pos"][1]]) == m.h["name"]
    assert " ".join(m.token[m.t["pos"][0]:m.t["pos"][1]]) == m.t["name"]
    assert len(m.token) == len(m.pos_tags) == len(m.deps) == len(m.ner)
    return m


def _entity_index_set(m: Mention) -> set[int]:
    return set(range(m.h["pos"][0], m.h["pos"][1])) | set(range(m.t["pos"][0], m.t["pos"][1]))


def preproc_sw(m: Mention) -> Mention:
    """Stopword removal outside entity spans
    (stop_word_preprocessor.py:25-34); stopword set = NLTK english minus
    'o'."""
    ent = _entity_index_set(m)
    idx = [j for j, tok in enumerate(m.token) if tok in STOPWORDS_MINUS_O and j not in ent]
    return process_sentence(m, idx)


def preproc_p(m: Mention) -> Mention:
    """PUNCT-tagged token removal outside entity spans
    (punctuation_preprocessor.py:20-27)."""
    ent = _entity_index_set(m)
    idx = [j for j, p in enumerate(m.pos_tags) if p == "PUNCT" and j not in ent]
    return process_sentence(m, idx)


def preproc_b(m: Mention) -> Mention:
    """Bracket-span removal (brackets_or_parenthesis_preprocessor.py:20-36):
    stateful linear scan, no nesting, entity tokens exempt at every step
    (including inside an open bracket run)."""
    ent = _entity_index_set(m)
    idx: list[int] = []
    inside = False
    for j, tok in enumerate(m.token):
        if j in ent:
            continue
        if tok in ("(", "["):
            inside = True
            idx.append(j)
        elif tok in (")", "]"):
            inside = False
            idx.append(j)
        elif inside:
            idx.append(j)
    return process_sentence(m, idx)


def preproc_d(m: Mention) -> Mention:
    """Digit blinding (digit_blinding_preprocessor.py:20-24): token ->
    'DIGIT' wherever upos == 'NUM'. Entities are NOT protected and names
    are NOT rewritten — a reference quirk preserved deliberately."""
    m.token = ["DIGIT" if p == "NUM" else tok for tok, p in zip(m.token, m.pos_tags)]
    return m


def preproc_blind(m: Mention, kind: str, replacement: str) -> Mention:
    """Entity/NER blinding (entity_blinding_preprocessor.py:37-61):
    collapse each entity span to one token; 'entity' kind uses the
    constant replacement, 'ner' uses the span's first NER tag. The
    later entity's start shifts left by (first span length - 1). Tag
    columns (pos/deps/ner) are NOT rewritten — reference quirk."""
    p1, p2 = list(m.h["pos"]), list(m.t["pos"])
    if kind == "ner":
        rep = [m.ner[p1[0]], m.ner[p2[0]]]
    else:
        rep = [replacement, replacement]
    if p1[0] < p2[0]:
        first_len = p1[1] - p1[0]
        m.token = m.token[:p1[0]] + [rep[0]] + m.token[p1[1]:p2[0]] + [rep[1]] + m.token[p2[1]:]
        m.h["pos"] = [p1[0], p1[0] + 1]
        new2 = p2[0] - (first_len - 1)
        m.t["pos"] = [new2, new2 + 1]
    else:
        first_len = p2[1] - p2[0]
        m.token = m.token[:p2[0]] + [rep[1]] + m.token[p2[1]:p1[0]] + [rep[0]] + m.token[p1[1]:]
        m.t["pos"] = [p2[0], p2[0] + 1]
        new1 = p1[0] - (first_len - 1)
        m.h["pos"] = [new1, new1 + 1]
    assert m.token[m.h["pos"][0]] == rep[0]
    assert m.token[m.t["pos"][0]] == rep[1]
    # NB: the reference keeps the ORIGINAL entity names in the dict after
    # blinding (only positions collapse) — downstream tokenization slices
    # by position, and emitted triples carry the original surface form.
    return m


def apply_preprocessing(m: Mention, preprocessing_types: list[str], entity_replacement: str = "ENTITY") -> Mention:
    """Composition per deepref/framework/train.py:91-124: fixed order
    sw -> p -> b -> d -> blinding; eb+nb together -> ner blinding;
    replacement constant 'DRUG' for ddi, 'ENTITY' otherwise (picked by
    the caller via ``entity_replacement``)."""
    kinds = normalize_preproc(preprocessing_types)
    out = m.copy()
    for k in kinds:
        if k == "sw":
            out = preproc_sw(out)
        elif k == "p":
            out = preproc_p(out)
        elif k == "b":
            out = preproc_b(out)
        elif k == "d":
            out = preproc_d(out)
        elif k == "eb":
            out = preproc_blind(out, "entity", entity_replacement)
        elif k == "nb":
            out = preproc_blind(out, "ner", entity_replacement)
    return out


# ---------------------------------------------------------------------------
# Semantic knowledge (T8) — hypernym father/grandpa per entity
# ---------------------------------------------------------------------------

def sk_extract(entities: list[str], hypernyms: dict[str, str]) -> dict:
    """SemanticKNWL.extract semantics (deepref/nlp/semantic_knowledge.py:12-31)
    over a pluggable hypernym map (entity -> hypernym synset name like
    'boundary.n.01'; WordNet itself is an optional backend):

    * no synsets -> [entity, entity]
    * father but no grandfather -> [uni(father), uni(father)]
    * else [uni(father), uni(grandpa)]
    where uni(x) drops the synset suffix (name[:-5]) and keeps the last
    '_'-separated segment (:70-72).
    """

    def unigram(name: str) -> str:
        return name.split("_")[-1]

    def lookup(entity: str) -> list[str]:
        father_syn = hypernyms.get(entity)
        if father_syn is None:
            return [entity, entity]
        father = father_syn[:-5]  # strip '.n.01'-style suffix
        grandpa_syn = hypernyms.get(father)
        if grandpa_syn is None:
            return [unigram(father), unigram(father)]
        grandpa = grandpa_syn[:-5]
        return [unigram(father), unigram(grandpa)]

    vec = [lookup(e) for e in entities]
    return {"ses1": vec[0], "ses2": vec[1]}


# A small deterministic hypernym map standing in for WordNet's first-synset
# hypernym chain (real nltk.wordnet can be plugged in when installed). Keys
# are surface forms; values are synset-style names (suffix stripped by
# sk_extract). Includes the reference's golden pair
# (deepref/tests/dataset/test_sentence.py:12: audits->boundary/extremity,
# waste->property/possession).
DEFAULT_HYPERNYMS: dict[str, str] = {
    "audits": "boundary.n.01",
    "boundary": "extremity.n.01",
    "waste": "property.n.01",
    "property": "possession.n.01",
    "aspirin": "analgesic.n.01",
    "analgesic": "medicine.n.01",
    "warfarin": "anticoagulant.n.01",
    "anticoagulant": "medicine.n.01",
    "medicine": "drug.n.01",
    "drug": "substance.n.01",
    "outline": "line.n.01",
    "line": "shape.n.01",
    "spirituality": "belief.n.01",
    "belief": "content.n.01",
    "company": "institution.n.01",
    "institution": "organization.n.01",
    "organization": "social_group.n.01",
    "river": "stream.n.01",
    "stream": "body_of_water.n.01",
    "engine": "motor.n.01",
    "motor": "machine.n.01",
    "machine": "device.n.01",
    "device": "instrumentality.n.01",
    "city": "municipality.n.01",
    "municipality": "urban_area.n.01",
}


# ---------------------------------------------------------------------------
# Deterministic "wordpiece" tokenizer (K1/K5 stand-in)
# ---------------------------------------------------------------------------

VOCAB_SIZE = 4096
SPECIAL_TOKENS = {
    "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
    "[unused0]": 4, "[unused1]": 5, "[unused2]": 6, "[unused3]": 7,
    "[unused4]": 8, "[unused5]": 9, "[unused6]": 10, "[unused7]": 11,
}
_N_SPECIAL = 12
PIECE_WIDTH = 4


def wordpiece(word: str) -> list[str]:
    """Deterministic subword split standing in for greedy-vocab wordpiece
    (same piece/'##' continuation shape as the vendored tokenizer at
    deepref/tokenization/word_piece_tokenizer.py:40-96): fixed-width
    chunks with '##' continuations."""
    if not word:
        return []
    pieces = [word[:PIECE_WIDTH]]
    for i in range(PIECE_WIDTH, len(word), PIECE_WIDTH):
        pieces.append("##" + word[i:i + PIECE_WIDTH])
    return pieces


def tokenize_text(text: str, wp=None) -> list[str]:
    """Default wp is the REAL greedy matcher over the pinned vocab
    artifact (wordpiece_real); pass wp=wordpiece for the fixed-width
    chunker the SQL twins mirror."""
    wp = wp or wordpiece_real
    out: list[str] = []
    for w in text.split():
        out.extend(wp(w))
    return out


# ---------------------------------------------------------------------------
# K5 — REAL greedy longest-match wordpiece over a pinned vocab
# (deepref/tokenization/word_piece_tokenizer.py:61-96 semantics)
# ---------------------------------------------------------------------------

_WP_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789(),."
_WP_FRAGMENTS = [
    # the vendored tokenizer's own docstring example (word_piece_tokenizer.py:45-47)
    "un", "##aff", "##able",
    # common English morphemes — a deterministic, pinned stand-in for a
    # trained vocab file (load_vocab at word_piece_tokenizer.py:36)
    "anti", "con", "de", "dis", "en", "inter", "mis", "non", "out",
    "over", "pre", "re", "sub", "the", "under",
    "##age", "##al", "##ance", "##ate", "##ation", "##ed", "##ence",
    "##ent", "##er", "##est", "##ful", "##ing", "##ion", "##ism",
    "##ist", "##ity", "##ive", "##ize", "##less", "##ly", "##ment",
    "##ness", "##ous", "##s", "##tion",
]
WP_VOCAB = frozenset(
    list(_WP_ALPHABET)
    + ["##" + c for c in _WP_ALPHABET]
    + _WP_FRAGMENTS
)


def wordpiece_greedy(word: str, vocab: frozenset | set | None = None,
                     unk_token: str = "[UNK]",
                     max_input_chars_per_word: int = 200) -> list[str]:
    """Greedy longest-match-first wordpiece — the exact algorithm of the
    vendored tokenizer (word_piece_tokenizer.py:61-96): per start
    position shrink the candidate from the full remaining suffix until a
    vocab hit ('##'-prefixed beyond position 0); any unmatched position
    makes the whole word [UNK] (is_bad), as does exceeding
    max_input_chars_per_word. Single characters of the normalized
    alphabet are all in WP_VOCAB, so is_bad only fires on
    out-of-alphabet characters — same guarantee a trained BERT vocab
    gives via its byte fallback."""
    vocab = WP_VOCAB if vocab is None else vocab
    if not word:
        return []
    if len(word) > max_input_chars_per_word:
        return [unk_token]
    sub_tokens: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            substr = ("##" if start > 0 else "") + word[start:end]
            if substr in vocab:
                cur = substr
                break
            end -= 1
        if cur is None:
            return [unk_token]  # is_bad
        sub_tokens.append(cur)
        start = end
    return sub_tokens


_WP_VOCAB_FILE = os.path.join(os.path.dirname(__file__), "data", "wp_vocab.txt")
_WP_REAL: frozenset | None = None
_WP_MEMO: dict[str, list[str]] = {}


def load_wp_vocab(path: str | None = None) -> frozenset:
    """Pinned vocab artifact (scripts/build_wp_vocab.py), standard
    one-piece-per-line vocab.txt format — a trained 30k vocab (e.g.
    bert-base-uncased's) drops in via ``path`` unchanged. Cached.

    The default artifact is read through importlib.resources so it
    resolves inside the --py-files zip on executors (a plain open() on
    __file__-relative paths raises NotADirectoryError there)."""
    global _WP_REAL
    if path is None:
        if _WP_REAL is None:
            try:
                from importlib import resources

                text = (
                    resources.files("deepref_spark")
                    .joinpath("data/wp_vocab.txt")
                    .read_text()
                )
            except Exception:
                with open(_WP_VOCAB_FILE) as f:
                    text = f.read()
            _WP_REAL = frozenset(ln.strip() for ln in text.splitlines() if ln.strip())
        return _WP_REAL
    with open(path) as f:
        return frozenset(ln.strip() for ln in f if ln.strip())


_WP_MEMO_CAP = 250_000


def wordpiece_real(word: str) -> list[str]:
    """THE default tokenizer: greedy longest-match wordpiece over the
    pinned vocab artifact, memoized per word — the Zipf-skewed token
    distribution makes the memo hit rate ~99% inside an Arrow batch,
    so the greedy scan runs roughly once per DISTINCT word per worker.
    The memo is capped (distinct tokens are unbounded at web scale);
    clear-at-cap keeps memory bounded and the hot head re-warms in one
    batch."""
    hit = _WP_MEMO.get(word)
    if hit is None:
        if len(_WP_MEMO) >= _WP_MEMO_CAP:
            _WP_MEMO.clear()
        hit = wordpiece_greedy(word, load_wp_vocab())
        _WP_MEMO[word] = hit
    return hit


# ---------------------------------------------------------------------------
# BasicTokenizer normalization (reference deepref/tokenization/
# basic_tokenizer.py:29-64 + utils.py:9-148) — the lowercase /
# accent-strip / punctuation-split / CJK-isolate pass BertTokenizer runs
# BEFORE wordpiece (bert_tokenizer.py:48-53). The pipeline's default
# path wordpieces whitespace tokens directly (consistent with the
# pinned stand-in vocab); swap wordpiece_basic in as ``wp=`` when
# running a real trained vocab so tokenizations match the vocab's
# training-time normalization.
# ---------------------------------------------------------------------------

NEVER_SPLIT = ("[UNK]", "[SEP]", "[PAD]", "[CLS]", "[MASK]")

_CJK_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF), (0x2F800, 0x2FA1F),
)


def _is_cjk(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _is_punct(ch: str) -> bool:
    # all non-alphanumeric ASCII counts as punctuation (utils.py:32-43)
    cp = ord(ch)
    if 33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96 or 123 <= cp <= 126:
        return True
    import unicodedata

    return unicodedata.category(ch).startswith("P")


def clean_and_isolate(text: str) -> str:
    """utils.clean_text + tokenize_chinese_chars in one pass: drop NUL /
    U+FFFD / control chars (\\t\\n\\r count as whitespace, not control),
    canonicalize whitespace to ' ', and pad every CJK ideograph with
    spaces so it tokenizes as its own word."""
    import unicodedata

    out = []
    for ch in text:
        cp = ord(ch)
        if cp in (0, 0xFFFD):
            continue
        cat = unicodedata.category(ch)
        if ch in "\t\n\r" or cat == "Zs":
            out.append(" ")
        elif cat.startswith("C"):
            continue
        elif _is_cjk(cp):
            out.append(f" {ch} ")
        else:
            out.append(ch)
    return "".join(out)


def strip_accents(text: str) -> str:
    """NFD-decompose and drop combining marks (utils.py:134-143)."""
    import unicodedata

    return "".join(
        ch for ch in unicodedata.normalize("NFD", text)
        if unicodedata.category(ch) != "Mn"
    )


def split_on_punctuation(token: str) -> list[str]:
    """Each punctuation char becomes its own token (utils.py:106-119)."""
    parts: list[str] = []
    fresh = True
    for ch in token:
        if _is_punct(ch):
            parts.append(ch)
            fresh = True
        else:
            if fresh:
                parts.append("")
                fresh = False
            parts[-1] += ch
    return parts


def basic_tokenize(text: str, do_lower_case: bool = True,
                   never_split: tuple = NEVER_SPLIT) -> list[str]:
    """BasicTokenizer.tokenize minus the position bookkeeping (the
    pipeline tracks entity spans at the word level upstream): clean +
    CJK-isolate, whitespace split, then per token (unless never_split)
    lowercase + accent-strip, then punctuation split. Reference QUIRK
    preserved: never_split exempts a token from the case/accent pass
    ONLY — the punctuation split still applies (basic_tokenizer.py:
    56-61 splits unconditionally), so '[UNK]' shatters to
    '[', 'UNK', ']' with case intact."""
    out: list[str] = []
    for token in clean_and_isolate(text).split():
        if do_lower_case and token not in never_split:
            token = strip_accents(token.lower())
        out.extend(split_on_punctuation(token))
    return out


def wordpiece_basic(word: str, vocab: frozenset | set | None = None) -> list[str]:
    """wp-compatible kernel composing the reference BertTokenizer
    (bert_tokenizer.py:48-53): basic normalization first, greedy
    longest-match wordpiece over each resulting sub-token. Drop-in for
    ``wp=`` in bert_entity_tokenize / the batch kernels when running a
    real trained vocab.txt (whose training assumed this
    normalization)."""
    vocab = load_wp_vocab() if vocab is None else vocab
    return [
        piece
        for sub in basic_tokenize(word)
        for piece in wordpiece_greedy(sub, vocab)
    ]


def md5_mod_py(s: str, m: int) -> int:
    """Python twin of portable.md5_mod — the cross-engine hash used by
    every oracle-checked formula (combines the ascii codes of the first
    4 hex chars of md5)."""
    h = hashlib.md5(s.encode("utf-8")).hexdigest()
    return (ord(h[0]) * 131071 + ord(h[1]) * 8191 + ord(h[2]) * 127 + ord(h[3])) % m


def piece_to_id(piece: str) -> int:
    """Stateless deterministic vocab: special tokens pinned, everything
    else hashed into [12, VOCAB_SIZE) with the portable md5 formula (so
    token ids are reproducible in SQL oracles)."""
    if piece in SPECIAL_TOKENS:
        return SPECIAL_TOKENS[piece]
    return _N_SPECIAL + md5_mod_py(piece, VOCAB_SIZE - _N_SPECIAL)


def bert_entity_tokenize(
    token: list[str], h_pos: list[int], t_pos: list[int],
    max_length: int = 128, mask_entity: bool = False, to_id=None, wp=None,
) -> tuple[list[int], list[int], int, int]:
    """Entity-marked tokenization (deepref/encoder/bert_encoder.py:144-228):
    split around min/max entity, wrap in [unused0..3] ([unused2..3] pair
    first when the tail precedes the head), [CLS]/[SEP], compute marker
    positions BEFORE truncation then clamp to max_length-1, pad/truncate
    ids to max_length, attention mask covers min(true_len, max_length).
    Returns (ids, att_mask, pos1, pos2)."""
    pos_head, pos_tail = h_pos, t_pos
    rev = pos_head[0] > pos_tail[0]
    pos_min, pos_max = (pos_tail, pos_head) if rev else (pos_head, pos_tail)

    sent0 = tokenize_text(" ".join(token[:pos_min[0]]), wp)
    ent0 = tokenize_text(" ".join(token[pos_min[0]:pos_min[1]]), wp)
    sent1 = tokenize_text(" ".join(token[pos_min[1]:pos_max[0]]), wp)
    ent1 = tokenize_text(" ".join(token[pos_max[0]:pos_max[1]]), wp)
    sent2 = tokenize_text(" ".join(token[pos_max[1]:]), wp)

    if mask_entity:
        ent0 = ["[unused4]"] if not rev else ["[unused5]"]
        ent1 = ["[unused5]"] if not rev else ["[unused4]"]
    else:
        ent0 = (["[unused0]"] + ent0 + ["[unused1]"]) if not rev else (["[unused2]"] + ent0 + ["[unused3]"])
        ent1 = (["[unused2]"] + ent1 + ["[unused3]"]) if not rev else (["[unused0]"] + ent1 + ["[unused1]"])

    re_tokens = ["[CLS]"] + sent0 + ent0 + sent1 + ent1 + sent2 + ["[SEP]"]
    pos1 = 1 + len(sent0) if not rev else 1 + len(sent0) + len(ent0) + len(sent1)
    pos2 = 1 + len(sent0) + len(ent0) + len(sent1) if not rev else 1 + len(sent0)
    pos1 = min(max_length - 1, pos1)
    pos2 = min(max_length - 1, pos2)

    ids = [(to_id or piece_to_id)(p) for p in re_tokens]
    avai_len = len(ids)
    ids = (ids + [0] * max_length)[:max_length]
    mask = [1] * min(avai_len, max_length) + [0] * max(0, max_length - avai_len)
    return ids, mask, pos1, pos2


# ---------------------------------------------------------------------------
# Evaluation kernel (A3-A5, deepref/framework/data_loader.py:52-112)
# ---------------------------------------------------------------------------

def find_negative_class(rel2id: dict[str, int]) -> int:
    """First match in the fixed candidate order wins (data_loader.py:67-72);
    -1 when no negative class exists."""
    for name in NEGATIVE_CLASS_NAMES:
        if name in rel2id:
            return rel2id[name]
    return -1


def eval_predictions(goldens: list[int], preds: list[int], rel2id: dict[str, int]) -> dict:
    """acc + micro P/R over positive classes + micro/macro F1 over ALL
    classes (data_loader.py:74-112). Quirks preserved: the manual
    micro_f1 is overwritten by the all-classes sklearn micro (:106),
    which for single-label problems equals accuracy; macro averages over
    every id in rel2id with 0 for absent classes; div-by-zero -> 0."""
    neg = find_negative_class(rel2id)
    total = len(goldens)
    correct = sum(1 for g, p in zip(goldens, preds) if g == p)
    correct_positive = sum(1 for g, p in zip(goldens, preds) if g == p and g != neg)
    gold_positive = sum(1 for g in goldens if g != neg)
    pred_positive = sum(1 for p in preds if p != neg)

    acc = correct / total if total else 0.0
    micro_p = correct_positive / pred_positive if pred_positive else 0.0
    micro_r = correct_positive / gold_positive if gold_positive else 0.0

    micro_f1 = acc  # sklearn micro-F1 with labels=all classes == accuracy
    f1s = []
    for cid in range(len(rel2id)):
        tp = sum(1 for g, p in zip(goldens, preds) if g == cid and p == cid)
        fp = sum(1 for g, p in zip(goldens, preds) if g != cid and p == cid)
        fn = sum(1 for g, p in zip(goldens, preds) if g == cid and p != cid)
        prec = tp / (tp + fp) if (tp + fp) else 0.0
        rec = tp / (tp + fn) if (tp + fn) else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if (prec + rec) else 0.0)
    macro_f1 = sum(f1s) / len(f1s) if f1s else 0.0
    return {
        "acc": acc, "micro_p": micro_p, "micro_r": micro_r,
        "micro_f1": micro_f1, "macro_f1": macro_f1,
    }


def ebem_tokenize(
    token: list[str], h_pos: list[int], t_pos: list[int], sk: dict,
    max_length: int = 128, mask_entity: bool = False, to_id=None, wp=None,
) -> dict:
    """EBEM tokenization (K2, bert_encoder.py:332-440): K1 plus the
    semantic-knowledge father/grandpa tokens appended before [SEP],
    wrapped in [unused4..7] ([unused6..7] pair first when reversed).
    Positions are recovered with first-occurrence .index() — including
    the mask_entity quirk where the entity placeholder [unused4/5]
    shadows the SK wrapper of the same name (:390-404). Note the
    reference wraps ent0/ent1 in [unused0..3] even when mask_entity
    already replaced them (:384-385)."""
    rev = h_pos[0] > t_pos[0]
    pos_min, pos_max = (t_pos, h_pos) if rev else (h_pos, t_pos)

    sent0 = tokenize_text(" ".join(token[:pos_min[0]]), wp)
    ent0 = tokenize_text(" ".join(token[pos_min[0]:pos_min[1]]), wp)
    sent1 = tokenize_text(" ".join(token[pos_min[1]:pos_max[0]]), wp)
    ent1 = tokenize_text(" ".join(token[pos_max[0]:pos_max[1]]), wp)
    sent2 = tokenize_text(" ".join(token[pos_max[1]:]), wp)

    if mask_entity:
        ent0 = ["[unused4]"] if not rev else ["[unused5]"]
        ent1 = ["[unused5]"] if not rev else ["[unused4]"]

    sk1_father = tokenize_text(sk["ses1"][0], wp)
    sk1_grandpa = tokenize_text(sk["ses1"][-1], wp)
    sk2_father = tokenize_text(sk["ses2"][0], wp)
    sk2_grandpa = tokenize_text(sk["ses2"][-1], wp)

    ent0 = (["[unused0]"] + ent0 + ["[unused1]"]) if not rev else (["[unused2]"] + ent0 + ["[unused3]"])
    ent1 = (["[unused2]"] + ent1 + ["[unused3]"]) if not rev else (["[unused0]"] + ent1 + ["[unused1]"])
    sk1 = (["[unused4]"] + sk1_father + sk1_grandpa + ["[unused5]"]) if not rev \
        else (["[unused6]"] + sk1_father + sk1_grandpa + ["[unused7]"])
    sk2 = (["[unused6]"] + sk2_father + sk2_grandpa + ["[unused7]"]) if not rev \
        else (["[unused4]"] + sk2_father + sk2_grandpa + ["[unused5]"])
    re_tokens = ["[CLS]"] + sent0 + ent0 + sent1 + ent1 + sent2 + sk1 + sk2 + ["[SEP]"]

    clamp = lambda p: min(max_length - 1, p)  # noqa: E731
    sk_pos1 = [
        clamp(re_tokens.index("[unused4]" if not rev else "[unused6]")),
        clamp(re_tokens.index("[unused5]" if not rev else "[unused7]")),
    ]
    sk_pos2 = [
        clamp(re_tokens.index("[unused6]" if not rev else "[unused4]")),
        clamp(re_tokens.index("[unused7]" if not rev else "[unused5]")),
    ]
    if mask_entity:
        pos1 = re_tokens.index("[unused4]" if not rev else "[unused5]")
        pos2 = re_tokens.index("[unused5]" if not rev else "[unused4]")
    else:
        pos1 = re_tokens.index("[unused0]" if not rev else "[unused2]")
        pos2 = re_tokens.index("[unused2]" if not rev else "[unused0]")
    pos1, pos2 = clamp(pos1), clamp(pos2)

    ids = [(to_id or piece_to_id)(p) for p in re_tokens]
    avai_len = len(ids)
    ids = (ids + [0] * max_length)[:max_length]
    mask = [1] * min(avai_len, max_length) + [0] * max(0, max_length - avai_len)
    return {
        "ids": ids, "att_mask": mask, "pos1": pos1, "pos2": pos2,
        "sk_pos1": sk_pos1, "sk_pos2": sk_pos2,
    }


def word_to_id(word: str, vocab_size: int = VOCAB_SIZE) -> int:
    """Whole-word vocab lookup stand-in for K3 (convert_by_vocab,
    tokenization/utils.py:186-202): lowercase, deterministic hash id in
    [2, vocab_size) — 0 is [PAD], 1 is [UNK]."""
    return 2 + md5_mod_py(word.lower(), vocab_size - 2)


def word_position_tokenize(
    token: list[str], h_pos: list[int], t_pos: list[int], max_length: int = 128,
) -> tuple[list[int], list[int], list[int]]:
    """K3 (base_encoder.py:84-154, is_token path): whole-word vocab ids
    padded/truncated to max_length, plus relative-position features
    clip(i - ent_start + L, 0, 2L-1) per entity, 0-padded."""
    ids = [word_to_id(w) for w in token]
    ids = (ids + [0] * max_length)[:max_length] if True else ids
    p1i = min(h_pos[0], max_length)
    p2i = min(t_pos[0], max_length)
    pos1 = [min(i - p1i + max_length, 2 * max_length - 1) for i in range(len(token))]
    pos2 = [min(i - p2i + max_length, 2 * max_length - 1) for i in range(len(token))]
    pos1 = (pos1 + [0] * max_length)[:max_length]
    pos2 = (pos2 + [0] * max_length)[:max_length]
    return ids, pos1, pos2


def pcnn_segment_mask(n_tokens: int, h_pos: list[int], t_pos: list[int],
                      max_length: int = 128) -> list[int]:
    """K4 (pcnn_encoder.py:155-172): 1 up to and including the first
    entity start, 2 up to the second, 3 after, 0-padded."""
    p1i = min(h_pos[0], max_length)
    p2i = min(t_pos[0], max_length)
    lo, hi = min(p1i, p2i), max(p1i, p2i)
    mask = [1 if i <= lo else (2 if i <= hi else 3) for i in range(n_tokens)]
    return (mask + [0] * max_length)[:max_length]
