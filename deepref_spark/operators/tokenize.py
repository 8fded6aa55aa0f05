"""Entity-marker tokenization (SURVEY.md §2.3 K1) as one Arrow-batched
mapInPandas operator.

Reproduces BERTEntityEncoder.tokenize (bert_encoder.py:144-228):
sent0/ent0/sent1/ent1/sent2 split around min/max entity, [unused0..3]
wrapping (order flipped when the tail precedes the head, [unused4/5]
when mask_entity), [CLS]/[SEP], marker positions computed before
truncation then clamped to max_length-1, pad/truncate + attention mask.
The reference runs this per item inside 8 DataLoader workers
(data_loader.py:114-123); here the Arrow batch is the unit and a
per-worker piece->id memo removes repeated hashing of the Zipf-skewed
token distribution.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from deepref_spark import refsem

TOKENIZED_SCHEMA = (
    "sent_id string, doc_id string, relation string, "
    "h_name string, t_name string, "
    "ids array<int>, att_mask array<int>, pos1 int, pos2 int"
)


def tokenize_mentions(mentions: DataFrame, max_length: int = 128, mask_entity: bool = False,
                      wordpiece_fn=None) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def to_id(piece: str) -> int:
            v = memo.get(piece)
            if v is None:
                v = refsem.piece_to_id(piece)
                memo[piece] = v
            return v

        for pdf in batches:
            out = {k: [] for k in (
                "sent_id", "doc_id", "relation", "h_name", "t_name",
                "ids", "att_mask", "pos1", "pos2",
            )}
            for row in pdf.itertuples(index=False):
                ids, mask, p1, p2 = refsem.bert_entity_tokenize(
                    list(row.token), list(row.h["pos"]), list(row.t["pos"]),
                    max_length=max_length, mask_entity=mask_entity, to_id=to_id,
                    wp=wordpiece_fn,
                )
                out["sent_id"].append(row.sent_id)
                out["doc_id"].append(row.doc_id)
                out["relation"].append(row.relation)
                out["h_name"].append(row.h["name"])
                out["t_name"].append(row.t["name"])
                out["ids"].append(ids)
                out["att_mask"].append(mask)
                out["pos1"].append(p1)
                out["pos2"].append(p2)
            if out["sent_id"]:
                yield pd.DataFrame(out)

    return mentions.mapInPandas(run, schema=TOKENIZED_SCHEMA)


def wordpiece_basic_words(words: DataFrame) -> DataFrame:
    """(word) -> (word, wp): K5's real-vocab path — BasicTokenizer
    normalization (refsem.basic_tokenize: lowercase / NFD accent-strip /
    punctuation-split / CJK-isolate, reference basic_tokenizer.py:29-64
    + utils.py:9-148) composed with greedy wordpiece over the pinned
    vocab, space-joined.

    Runs over the DISTINCT-WORD dictionary, not the corpus: at 100 TB
    the distinct-token table is orders of magnitude smaller than the
    token stream (Zipf), so normalization executes once per word and
    the result map-joins back to the corpus — the same shape as the
    tokenize batch kernels' per-word piece cache. Unicode category /
    NFD semantics are not expressible in JVM built-ins, so this is a
    justified Arrow-batched Python kernel on the small side.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab = refsem.load_wp_vocab()
        memo: dict[str, str] = {}
        for pdf in batches:
            if pdf.empty:
                continue  # Arrow cannot type an empty object column
            wp = []
            for w in pdf["word"]:
                r = memo.get(w)
                if r is None:
                    r = memo[w] = " ".join(refsem.wordpiece_basic(w, vocab))
                wp.append(r)
            yield pd.DataFrame({"word": pdf["word"], "wp": wp})

    return words.mapInPandas(run, schema="word string, wp string")
