"""S4/S5/S6 — readers for the reference's intermediate file formats
(SURVEY.md §2.1), for interop with corpora already converted by the
reference toolchain.

S4: 8-column tab-separated CSV with Python-dict-literal columns
    (dataset.py:54-63, read back via literal_eval at sentence.py:43-51)
S5: dict-repr-per-line txt (dataset.py:94-104, read with eval at
    data_loader.py:24-31 — we parse with ast.literal_eval, never eval)
S6: word-embedding .vec files (GloVe-style "word v1 v2 ..."), loaded to
    a word2id map + broadcast float matrix
    (framework/word_embedding_loader.py:33-90)
"""

from __future__ import annotations

import ast
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MENTION_SCHEMA = (
    "token array<string>, "
    "h struct<name:string, pos:array<int>>, "
    "t struct<name:string, pos:array<int>>, "
    "relation string, "
    "pos_tags array<string>, deps array<string>, ner array<string>, "
    "sk struct<ses1:array<string>, ses2:array<string>>"
)


def _mention_row(d: dict) -> dict:
    sk = d.get("sk") or {}
    return {
        "token": [str(t) for t in d["token"]],
        "h": {"name": str(d["h"]["name"]), "pos": [int(x) for x in d["h"]["pos"]]},
        "t": {"name": str(d["t"]["name"]), "pos": [int(x) for x in d["t"]["pos"]]},
        "relation": str(d.get("relation", "")),
        "pos_tags": [str(x) for x in d.get("pos_tags", [])],
        "deps": [str(x) for x in d.get("deps", [])],
        "ner": [str(x) for x in d.get("ner", [])],
        "sk": {
            "ses1": [str(x) for x in sk.get("ses1", [])],
            "ses2": [str(x) for x in sk.get("ses2", [])],
        },
    }


def read_training_txt(spark: SparkSession, path: str) -> DataFrame:
    """S5: one dict-repr per line -> typed mention rows. ast.literal_eval
    only (the reference's eval() is the single biggest scan-time sin,
    SURVEY.md §1.1)."""
    lines = spark.read.text(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                line = line.rstrip()
                if not line:
                    continue
                try:
                    rows.append(_mention_row(ast.literal_eval(line)))
                except (ValueError, SyntaxError, KeyError):
                    continue
            if rows:
                yield pd.DataFrame({
                    k: [r[k] for r in rows]
                    for k in ("token", "h", "t", "relation", "pos_tags", "deps", "ner", "sk")
                })

    return lines.mapInPandas(run, schema=MENTION_SCHEMA)


CSV_SCHEMA = (
    "original_sentence string, "
    + MENTION_SCHEMA.replace("token array<string>, ", "")
)


def read_converted_csv(spark: SparkSession, path: str) -> DataFrame:
    """S4: the 8-column converted CSV (tab-sep, dict-literal e1/e2/sk
    columns, space-joined tag columns) -> typed rows mirroring
    Sentence.load_sentence (sentence.py:43-51)."""
    raw = spark.read.csv(path, sep="\t", header=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    e1 = ast.literal_eval(r.e1)
                    e2 = ast.literal_eval(r.e2)
                    sk = ast.literal_eval(r.sk_entities)
                except (ValueError, SyntaxError):
                    continue
                rows.append({
                    "original_sentence": r.original_sentence,
                    "h": {"name": str(e1["name"]), "pos": [int(x) for x in e1["position"]]},
                    "t": {"name": str(e2["name"]), "pos": [int(x) for x in e2["position"]]},
                    "relation": str(r.relation_type),
                    "pos_tags": str(r.pos_tags).split(),
                    "deps": str(r.dependencies_labels).split(),
                    "ner": str(r.ner).split(),
                    "sk": {
                        "ses1": [str(x) for x in sk.get("ses1", [])],
                        "ses2": [str(x) for x in sk.get("ses2", [])],
                    },
                })
            if rows:
                yield pd.DataFrame({
                    k: [row[k] for row in rows]
                    for k in ("original_sentence", "h", "t", "relation", "pos_tags", "deps", "ner", "sk")
                })

    return raw.mapInPandas(run, schema=CSV_SCHEMA)


def load_word_embeddings(spark: SparkSession, path: str, dim: int | None = None):
    """S6: GloVe/fastText/senna-style vec file -> (word2id dict,
    (V, d) float32 matrix) for broadcasting to the CNN-family encoders
    (word_embedding_loader.py:33-90). Distributed parse, driver-side
    assembly (the matrix is small relative to the corpus and is
    broadcast anyway)."""
    lines = spark.read.text(path)
    rows = [r["value"].rstrip().split(" ") for r in lines.collect() if r["value"].strip()]
    # fastText-style header line "V d" is skipped
    if rows and len(rows[0]) == 2 and rows[0][0].isdigit():
        rows = rows[1:]
    if dim is None:
        dim = len(rows[0]) - 1
    word2id: dict[str, int] = {}
    vecs = []
    for parts in rows:
        if len(parts) != dim + 1:
            continue
        word2id[parts[0]] = len(word2id)
        vecs.append([float(x) for x in parts[1:]])
    return word2id, np.asarray(vecs, dtype=np.float32)
