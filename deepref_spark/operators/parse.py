"""Parse + normalize stage (SURVEY.md §2.2 T3-T7): tagged sentence ->
mention row with tokens, entity spans, tags.

One Arrow-batched mapInPandas pass per partition (the Spark analogue of
the reference's per-sentence spaCy loop at
dataset_converter.py:98-99 / sentence.py:6-13): untag with
first-occurrence marker removal (nlp_tool.py:9-19), entity-position
arithmetic with the -1/-2/-3 shifts (sentence.py:15-29), lowercased
join (sentence.py:31-33), tag columns from the pluggable tagger run on
the untagged stream (spacy_nlp_tool.py:13-26). NER marks entity spans
('ENT') over the tagger's per-token labels.

Zero per-row Python in the Spark API sense: rows cross the JVM/Python
boundary once, in Arrow batches; the string kernel is per-batch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from deepref_spark import refsem
from deepref_spark.nlp import get_tagger

MENTION_SCHEMA = (
    "doc_id string, span_idx int, sent_id string, "
    "token array<string>, "
    "h struct<name:string, pos:array<int>>, "
    "t struct<name:string, pos:array<int>>, "
    "relation string, "
    "pos_tags array<string>, deps array<string>, ner array<string>"
)


def _parse_batch(pdf: pd.DataFrame, tagger) -> pd.DataFrame:
    rows = {k: [] for k in (
        "doc_id", "span_idx", "sent_id", "token", "h", "t",
        "relation", "pos_tags", "deps", "ner",
    )}
    for doc_id, span_idx, sent_id, relation, tagged in zip(
        pdf["doc_id"], pdf["span_idx"], pdf["sent_id"], pdf["relation"], pdf["tagged"]
    ):
        try:
            m = refsem.build_mention(tagged, relation, tagger)
        except (ValueError, IndexError):
            continue  # malformed marker stream — dropped, like a converter skip
        ner = list(m.ner)
        for lo, hi in (m.h["pos"], m.t["pos"]):
            for j in range(lo, min(hi, len(ner))):
                ner[j] = "ENT"
        rows["doc_id"].append(doc_id)
        rows["span_idx"].append(int(span_idx))
        rows["sent_id"].append(sent_id)
        rows["token"].append(m.token)
        rows["h"].append({"name": m.h["name"], "pos": m.h["pos"]})
        rows["t"].append({"name": m.t["name"], "pos": m.t["pos"]})
        rows["relation"].append(relation)
        rows["pos_tags"].append(m.pos_tags)
        rows["deps"].append(m.deps)
        rows["ner"].append(ner)
    return pd.DataFrame(rows)


def parse_mentions(sentences: DataFrame, tagger_backend: str = "ruletag") -> DataFrame:
    """sentences (doc_id, span_idx, sent_id, relation, tagged) ->
    mentions. The tagger is constructed lazily per python worker so a
    heavyweight backend (spaCy) loads once per executor core, not per
    batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tagger = get_tagger(tagger_backend)
        for pdf in batches:
            if not len(pdf):
                continue
            out = _parse_batch(pdf, tagger)
            # an all-malformed batch yields zero rows; emitting the empty
            # frame would hand Arrow untyped object columns — skip it
            if len(out):
                yield out

    return sentences.mapInPandas(run, schema=MENTION_SCHEMA)
