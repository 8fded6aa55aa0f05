"""Canonical StructTypes for every pipeline table (SURVEY.md §1.2).

The reference's schema-by-convention (8-column CSV at
deepref/dataset/dataset.py:54, dict-per-line txt at :94-104, read back
with eval at framework/data_loader.py:27-31) becomes enforced nested
types here — no stringified dicts anywhere.
"""

from __future__ import annotations

import pyspark.sql.types as T

# Input: interleaved text+media documents (BASELINE.json input_hint).
SPAN = T.StructType([
    T.StructField("kind", T.StringType(), False),        # 'text' | 'media'
    T.StructField("text", T.StringType(), True),         # tagged sentence for text spans
    T.StructField("media_ref", T.StringType(), True),    # opaque ref for media spans
    T.StructField("offset", T.IntegerType(), False),     # order within the document
])

DOCS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(SPAN), False),
])

ENTITY = T.StructType([
    T.StructField("name", T.StringType(), False),
    T.StructField("pos", T.ArrayType(T.IntegerType()), False),  # [start, end)
])

SK = T.StructType([
    T.StructField("ses1", T.ArrayType(T.StringType()), True),
    T.StructField("ses2", T.ArrayType(T.StringType()), True),
])

# The converted mention row (mirrors the reference txt-line dict,
# dataset.py:94-104, with proper types).
MENTIONS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("span_idx", T.IntegerType(), False),
    T.StructField("token", T.ArrayType(T.StringType()), False),
    T.StructField("h", ENTITY, False),
    T.StructField("t", ENTITY, False),
    T.StructField("relation", T.StringType(), True),
    T.StructField("pos_tags", T.ArrayType(T.StringType()), False),
    T.StructField("deps", T.ArrayType(T.StringType()), False),
    T.StructField("ner", T.ArrayType(T.StringType()), False),
    T.StructField("sk", SK, True),
])

# Tokenized batch row (output of the K1 entity-marker tokenizer).
TOKENIZED = T.StructType([
    T.StructField("ids", T.ArrayType(T.IntegerType()), False),
    T.StructField("att_mask", T.ArrayType(T.IntegerType()), False),
    T.StructField("pos1", T.IntegerType(), False),
    T.StructField("pos2", T.IntegerType(), False),
])

# Scored mention (M8 output).
SCORED = T.StructType([
    T.StructField("pred_id", T.IntegerType(), False),
    T.StructField("score", T.FloatType(), False),
])

# Output graph table.
TRIPLES = T.StructType([
    T.StructField("subj", T.StringType(), False),
    T.StructField("pred", T.StringType(), False),
    T.StructField("obj", T.StringType(), False),
    T.StructField("subj_canon", T.StringType(), True),
    T.StructField("obj_canon", T.StringType(), True),
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("score", T.FloatType(), True),
])

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


# Tables whose consumers run HEAVY per-row kernels before the first
# exchange (documents: the regex-chain tokenizers; embeddings: 64-dim
# vector math) — only these need the up-front spread below. For every
# other table the first real operator is an aggregation, window or
# join whose own exchange parallelizes the work, so a keyless
# repartition is exactly the guide's "repartition(n) someone added for
# parallelism" accidental exchange: it pays sort-before-repartition +
# a full shuffle of the rows and defeats partial-agg placement.
# Round-6 measurement (sf0.1, local[32], min-of-3, 9 mixed queries):
# spreading every table 23.3 s vs kernel-tables-only 8.3 s, with
# events_cusum 2.6->0.7 and rel_supplier_census 4.0->0.8.
_SPREAD_TABLES = ("documents", "embeddings")


def load_table(spark, sf_dir: str, name: str):
    """Read one testdata table. The local files are single-row-group
    parquet (unsplittable -> ONE partition); for the per-row-kernel
    tables (_SPREAD_TABLES) that would serialize the kernel onto one
    core, so those spread to the session parallelism up front. At
    cluster scale inputs arrive in many splits and this is a no-op."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name not in _SPREAD_TABLES:
        return df
    target = spark.sparkContext.defaultParallelism
    # inputFiles() is file-index metadata (already built by the read);
    # df.rdd.getNumPartitions() would force a full plan->RDD conversion
    # (~1 s of driver time per call, measured)
    if len(df.inputFiles()) < target:
        df = df.repartition(target)
    return df
