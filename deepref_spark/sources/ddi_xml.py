"""S2 — DDI-2013 XML corpus scan (SURVEY.md §2.1).

Mirrors ddi_converter.py:14-53: per <sentence>, collect the entity dict
(charOffset split on ';' — one or two ranges), then one emitted row per
<pair> with a non-empty type, tagged via the char-offset splicer
(refsem.tag_sentence_offsets). Unparseable files are skipped like the
reference's ExpatError pass.

Distributed shape: one XML file per row (wholetext read), pair
expansion inside an Arrow-batched mapInPandas — a file is the natural
work unit; downstream repartition spreads the mention rows.
"""

from __future__ import annotations

from typing import Iterator
from xml.dom import minidom
from xml.parsers.expat import ExpatError

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from deepref_spark import refsem

DDI_SCHEMA = "sent_xml_id string, pair_id string, relation string, tagged string"


def _sentences_from_xml(content: str):
    try:
        dom = minidom.parseString(content)
    except (ExpatError, ValueError):
        return
    for sent in dom.getElementsByTagName("sentence"):
        entity_dict = {}
        for ent in sent.getElementsByTagName("entity"):
            entity_dict[ent.getAttribute("id")] = {
                "word": ent.getAttribute("text"),
                "charOffset": ent.getAttribute("charOffset").split(";"),
            }
        text = sent.getAttribute("text")
        for pair in sent.getElementsByTagName("pair"):
            relation = pair.getAttribute("type")
            if not relation:
                continue  # unlabeled pair skipped (ddi_converter.py:41-42)
            e1, e2 = pair.getAttribute("e1"), pair.getAttribute("e2")
            others = [v["charOffset"] for k, v in entity_dict.items() if k not in (e1, e2)]
            tagged = refsem.tag_sentence_offsets(
                text, entity_dict[e1]["charOffset"], entity_dict[e2]["charOffset"], others
            )
            yield sent.getAttribute("id"), pair.getAttribute("id"), relation, tagged


def read_ddi_xml(spark: SparkSession, path: str) -> DataFrame:
    """path: directory/glob of DDI XML files -> (sent_xml_id, pair_id,
    relation, tagged)."""
    files = spark.read.text(path, wholetext=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"sent_xml_id": [], "pair_id": [], "relation": [], "tagged": []}
            for content in pdf["value"]:
                for sid, pid, rel, tagged in _sentences_from_xml(content):
                    rows["sent_xml_id"].append(sid)
                    rows["pair_id"].append(pid)
                    rows["relation"].append(rel)
                    rows["tagged"].append(tagged)
            if rows["sent_xml_id"]:
                yield pd.DataFrame(rows)

    return files.mapInPandas(run, schema=DDI_SCHEMA)
