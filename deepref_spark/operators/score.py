"""Batched relation scoring (SURVEY.md §2.4 M2 + M8).

The reference's eval loop (sentence_re.py:182-210) moves collated
tensors to the GPU and argmaxes logits; here the Arrow batch is the
tensor batch, weights arrive via a broadcast variable, and the forward
pass is whole-batch numpy inside mapInPandas — no per-row Python, one
JVM<->Python crossing per batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from deepref_spark import model as mdl

SCORED_SCHEMA = (
    "sent_id string, doc_id string, relation string, "
    "h_name string, t_name string, pred_id int, score double"
)


def rel2id_from_relations(relations: list[str]) -> dict[str, int]:
    """Deterministic label map: sorted names -> dense ids. The reference
    builds rel2id from a Python set (dataset.py:33-42) — nondeterministic
    ordering we deliberately fix (SURVEY.md §7 hard part (c)); triple
    comparison is name-level so this is safe."""
    return {r: i for i, r in enumerate(sorted(set(relations)))}


def score_tokenized(spark: SparkSession, tokenized: DataFrame, n_relations: int) -> DataFrame:
    """tokenized (ids, att_mask, pos1, pos2, ...) -> + (pred_id, score)."""
    weights_bc = spark.sparkContext.broadcast(mdl.build_weights(n_relations))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = None
        for pdf in batches:
            if not len(pdf):
                continue
            if weights is None:
                weights = mdl.cached_weights(weights_bc)
            ids = np.stack(pdf["ids"].to_numpy())         # (B, L)
            mask = np.stack(pdf["att_mask"].to_numpy())   # (B, L)
            pos1 = pdf["pos1"].to_numpy()
            pos2 = pdf["pos2"].to_numpy()
            pred, score = mdl.forward_batch(weights, ids, mask, pos1, pos2)
            yield pd.DataFrame({
                "sent_id": pdf["sent_id"],
                "doc_id": pdf["doc_id"],
                "relation": pdf["relation"],
                "h_name": pdf["h_name"],
                "t_name": pdf["t_name"],
                "pred_id": pred,
                "score": score,
            })

    return tokenized.mapInPandas(run, schema=SCORED_SCHEMA)


def attach_pred_names(scored: DataFrame, rel2id: dict[str, int]) -> DataFrame:
    """id -> relation name via a literal map expression (broadcast-free:
    the map is a plan constant, resolved JVM-side)."""
    import pyspark.sql.functions as F

    id2rel = {v: k for k, v in rel2id.items()}
    mapping = F.create_map(
        *[x for i, name in sorted(id2rel.items()) for x in (F.lit(i), F.lit(name))]
    )
    return scored.withColumn("pred_relation", mapping[F.col("pred_id")])
