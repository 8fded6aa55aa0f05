"""S3 — SemEval-2018 task 7 corpus scan (SURVEY.md §2.1).

Mirrors semeval2018_converter.py:16-95: abstracts XML whose <text>
children interleave raw text and <entity> elements; the sentence text
is reconstructed with char offsets tracked per entity, split into
sentences, per-sentence entity offsets re-based; relations come from
sibling *.txt files with lines ``REL(e1,e2[,REVERSE])``.

Reference quirks preserved:
  * the relation map is keyed by e1 id, so a later line with the same
    e1 OVERWRITES the earlier one — last-wins (:63,:67);
  * relations are lowercased (:85);
  * a pair whose e2 is not in the sentence's entity dict is skipped
    (:92-95);
  * the reference re-reads the txt per sentence (:82) — a pure perf
    bug; semantics equal one dict build, which is what we do (the txt
    side becomes a broadcast map).

Sentence splitting: the reference uses NLTK Punkt with abbreviations
{e.g, viz, al}; nltk is absent here, so the default splitter is a
deterministic regex honoring the same abbreviation set (pluggable the
same way the tagger is).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from deepref_spark import refsem

ABBREVIATIONS = ("e.g", "viz", "al")
S2018_SCHEMA = "abstract_id string, e1_id string, relation string, tagged string"

_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> list[str]:
    """Deterministic Punkt stand-in: split after ./!/? + whitespace,
    then re-join pieces that end with a protected abbreviation."""
    parts = _SPLIT_RE.split(text)
    out: list[str] = []
    for p in parts:
        if out:
            prev = out[-1].rstrip(".")
            if any(prev.endswith(a.rstrip(".")) for a in ABBREVIATIONS):
                out[-1] = out[-1] + " " + p
                continue
        out.append(p)
    return [s for s in out if s]


def _entities_and_text(text_elem) -> tuple[str, dict]:
    """Rebuild the running text + absolute char offsets per entity
    (semeval2018_converter.py:16-38 semantics: offsets found with
    rfind over the accumulated string)."""
    sentences = ""
    entity_dict: dict[str, dict] = {}
    if text_elem.text is not None:
        sentences += text_elem.text.lstrip()
    for entity in text_elem:
        if entity.tag == "entity" and entity.text is not None:
            sentences += entity.text
            start = sentences.rfind(entity.text)
            end = start + len(entity.text) - 1
            entity_dict[entity.get("id")] = {
                "word": entity.text,
                "charOffset": [f"{start}-{end}"],
            }
            if entity.tail is not None:
                sentences += entity.tail
    return sentences, entity_dict


def _per_sentence_entities(sentences_text: str, entity_dict: dict) -> Iterator[tuple[str, dict]]:
    """Split + re-base offsets per sentence (converter :41-52)."""
    sents = split_sentences(sentences_text)
    for i, s in enumerate(sents):
        prefix = " ".join(sents[:i])
        base = len(prefix) if len(prefix) == 0 else len(prefix) + 1
        local = {}
        for eid, e in entity_dict.items():
            a, b = (int(x) for x in e["charOffset"][0].split("-"))
            if a >= base and b <= len(s) + base:
                local[eid] = {"word": e["word"], "charOffset": [f"{a - base}-{b - base}"]}
        yield s, local


def parse_relations(lines: list[str]) -> dict[str, dict]:
    """``REL(e1,e2[,REVERSE])`` lines -> {e1: {relation, e1, e2}} with
    last-wins on duplicate e1 (converter :54-68)."""
    pairs: dict[str, dict] = {}
    for line in lines:
        rel = line[:line.find("(")]
        if not rel:
            continue
        if "REVERSE" in line:
            e2 = line[line.find("(") + 1:line.find(",")]
            e1 = line[line.find(",") + 1:line.find(",REVERSE)")]
        else:
            e1 = line[line.find("(") + 1:line.find(",")]
            e2 = line[line.find(",") + 1:line.find(")")]
        pairs[e1] = {"relation": rel, "e1": e1, "e2": e2}
    return pairs


def sentences_from_xml(content: str, pairs: dict[str, dict]) -> Iterator[tuple[str, str, str, str]]:
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return
    for text_elem in root.findall("./text/"):
        running, entity_dict = _entities_and_text(text_elem)
        abstract_id = next(iter(entity_dict), "?").split(".")[0]
        for sentence, local in _per_sentence_entities(running, entity_dict):
            for e1_id in local:
                if e1_id not in pairs:
                    continue
                e2_id = pairs[e1_id]["e2"]
                if e2_id not in local:
                    continue
                relation = pairs[e1_id]["relation"].lower()
                others = [v["charOffset"] for k, v in local.items() if k not in (e1_id, e2_id)]
                tagged = refsem.tag_sentence_offsets(
                    sentence, local[e1_id]["charOffset"], local[e2_id]["charOffset"], others
                )
                yield abstract_id, e1_id, relation, tagged


def read_semeval2018(spark: SparkSession, xml_path: str, rel_txt_path: str) -> DataFrame:
    """xml_path: glob of abstract XML files; rel_txt_path: glob of
    relation txt files. The relation map is built once and broadcast
    (fixing the reference's per-sentence re-read)."""
    rel_lines = [r["value"] for r in spark.read.text(rel_txt_path).collect()]
    pairs_bc = spark.sparkContext.broadcast(parse_relations(rel_lines))
    files = spark.read.text(xml_path, wholetext=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pairs = pairs_bc.value
        for pdf in batches:
            rows = {"abstract_id": [], "e1_id": [], "relation": [], "tagged": []}
            for content in pdf["value"]:
                for aid, e1, rel, tagged in sentences_from_xml(content, pairs):
                    rows["abstract_id"].append(aid)
                    rows["e1_id"].append(e1)
                    rows["relation"].append(rel)
                    rows["tagged"].append(tagged)
            if rows["abstract_id"]:
                yield pd.DataFrame(rows)

    return files.mapInPandas(run, schema=S2018_SCHEMA)
