"""Deterministic synthetic `docs` corpus (FIXTURES.md §1-§2, seed 42).

Generates interleaved text+media documents whose text spans carry
tagged sentences in the converter output format
(dataset_converter.py:63-85 marker vocabulary), with:
  * 3-12 spans/doc, media spans interleaved (kind='media', opaque ref)
  * head-first and tail-first entity layouts (~20% reversed)
  * optional unrelated-entity markers
  * a small hot-entity set reused in ~20% of sentences (skew fodder for
    the salted canonical aggregation)
  * golden relation labels carried as '<relation>\\t<tagged sentence>'
    in the text payload (the corpus-side label channel, like the
    SemEval 4-line group at semeval2010_converter.py:31-41)

Generation is distributed (mapInPandas over spark.range) and seeded per
doc id — no driver-side loops, no wall-clock dependence, stable under
repartitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from deepref_spark import refsem
from deepref_spark.portable import RELATION_NAMES

WORDS = (
    "the quick analysis shows that results from several experiments were "
    "reported during review and most common audits about waste recycling "
    "system design included new data for model training with large tables "
    "under heavy load while other teams measured strong effects of simple "
    "changes across many regions over time using open tools"
).split()

ENTITY_POOL = [
    "aspirin", "warfarin", "ibuprofen", "acetaminophen", "penicillin",
    "outline", "spirituality", "company", "river", "engine", "city",
    "turbine", "reactor", "compiler", "protocol", "enzyme", "membrane",
    "glacier", "archive", "senate", "harbor", "violin", "comet",
    "lattice", "quarry",
]
HOT_ENTITIES = ["aspirin", "engine", "city", "company", "river", "protocol"]

SPAN_SCHEMA = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def _doc_rng(i: int) -> np.random.RandomState:
    return np.random.RandomState(((i * 2654435761) ^ 42) % (2**31 - 1))


def _make_sentence(rng: np.random.RandomState) -> tuple[str, str]:
    """One labeled tagged sentence. Returns (relation, tagged)."""
    n_words = int(rng.randint(8, 20))
    words = [WORDS[j] for j in rng.randint(0, len(WORDS), n_words)]

    hot = rng.rand() < 0.2
    pool = HOT_ENTITIES if hot else ENTITY_POOL
    e1 = pool[int(rng.randint(0, len(pool)))]
    e2 = pool[int(rng.randint(0, len(pool)))]
    e1_len = 1 + int(rng.rand() < 0.3)
    e1_toks = [e1] + (["unit"] if e1_len == 2 else [])

    # insertion points over the word stream
    i1 = int(rng.randint(1, max(2, n_words // 2)))
    i2 = int(rng.randint(i1 + 1, n_words))
    reversed_pair = rng.rand() < 0.2

    first = ([refsem.E1_START] + e1_toks + [refsem.E1_END]) if not reversed_pair \
        else [refsem.E2_START, e2, refsem.E2_END]
    second = [refsem.E2_START, e2, refsem.E2_END] if not reversed_pair \
        else [refsem.E1_START] + e1_toks + [refsem.E1_END]

    toks = words[:i1] + first + words[i1:i2] + second + words[i2:]
    if rng.rand() < 0.3:
        j = int(rng.randint(0, len(toks) + 1))
        other = ENTITY_POOL[int(rng.randint(0, len(ENTITY_POOL)))]
        toks = toks[:j] + [refsem.OTHER_START, other, refsem.OTHER_END] + toks[j:]

    if rng.rand() < 0.3:
        relation = "Other"
    else:
        relation = RELATION_NAMES[1 + int(rng.randint(0, len(RELATION_NAMES) - 1))]
    return relation, " ".join(toks)


def _gen_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out_ids, out_spans = [], []
    for i in pdf["id"]:
        i = int(i)
        rng = _doc_rng(i)
        n_spans = int(rng.randint(3, 13))
        spans = []
        for k in range(n_spans):
            if rng.rand() < 0.25:
                spans.append({
                    "kind": "media", "text": "",
                    "media_ref": f"media://blob/{i}/{k}", "offset": k,
                })
            else:
                relation, tagged = _make_sentence(rng)
                spans.append({
                    "kind": "text", "text": f"{relation}\t{tagged}",
                    "media_ref": "", "offset": k,
                })
        out_ids.append(f"d{i:09d}")
        out_spans.append(spans)
    return pd.DataFrame({"doc_id": out_ids, "spans": out_spans})


def generate_docs(spark, n_docs: int, partitions: int | None = None):
    """Distributed deterministic docs DataFrame."""
    if partitions is None:
        partitions = max(32, spark.sparkContext.defaultParallelism * 4)
    rng_df = spark.range(0, n_docs, 1, partitions)

    def gen(it):
        for pdf in it:
            yield _gen_batch(pdf)

    return rng_df.mapInPandas(gen, schema=SPAN_SCHEMA)


def generate_docs_pandas(n_docs: int) -> pd.DataFrame:
    """Driver-side twin of generate_docs for small test fixtures —
    byte-identical rows (same per-doc seeding)."""
    return _gen_batch(pd.DataFrame({"id": np.arange(n_docs)}))
