"""Mention detection + candidate-pair generation (SURVEY.md §2.8 row 1).

The reference pipeline always consumes gold entity pairs produced by
its corpus converters (deepref/dataset/converters/
dataset_converter.py:95-113); a KG-construction pipeline over raw
documents has no gold pairs. This operator derives candidates:

  tokens -> deterministic NER flags (rule tagger, portable.ent_flags)
         -> maximal runs of flagged tokens = entity spans (capped at
            portable.MAX_SPANS per sentence)
         -> all ordered span pairs, generated with array combinatorics
            (sequence/filter/transform/flatten + one explode)

Every step is a built-in JVM expression: no Python crossing, no
shuffle, no self-join — the pair fan-out is a per-row explode bounded
by MAX_SPANS*(MAX_SPANS-1) = 30, so the operator is strictly linear in
input rows at any scale. The same formulas power the DuckDB oracle
(queries.kg_candidate_pairs) via portable.py's dual-dialect emitters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from deepref_spark import portable
from deepref_spark.portable import SPARK


def detect_spans(df: DataFrame, tokens_col: str = "tokens",
                 n_col: str = "n") -> DataFrame:
    """Add `starts`/`ends_x` (aligned 0-based [start, end) run bounds)
    and `ks` (1-based keys of the first MAX_SPANS spans). Requires
    n >= 1 rows (callers filter empty token arrays first)."""
    return (
        df.withColumn("is_ent", F.expr(portable.ent_flags(tokens_col, SPARK)))
        .withColumn("starts", F.expr(portable.run_starts("is_ent", n_col, SPARK)))
        .withColumn("ends_x", F.expr(portable.run_ends_excl("is_ent", n_col, SPARK)))
        .withColumn("ks", F.expr(portable.span_index_keys("starts", SPARK)))
    )


def candidate_pairs(df: DataFrame, tokens_col: str = "tokens",
                    n_col: str = "n") -> DataFrame:
    """One row per ordered span pair: doc_id, si, sj (1-based span
    keys), h0/h1/t0/t1 (0-based [start, end)), h_name/t_name, plus the
    original tokens/n for downstream tokenization."""
    spans = detect_spans(df, tokens_col, n_col)
    pairs = spans.withColumn(
        "pair_code", F.explode(F.expr(portable.pair_codes("ks", SPARK)))
    )
    dec_i = portable.pair_decode("pair_code", "i", SPARK)
    dec_j = portable.pair_decode("pair_code", "j", SPARK)
    staged = pairs.withColumn("si", F.expr(dec_i)).withColumn("sj", F.expr(dec_j))
    name = lambda s, e: F.expr(  # noqa: E731
        f"array_join(slice({tokens_col}, {s} + 1, {e} - {s}), ' ')"
    )
    out = (
        staged
        .withColumn("h0", F.expr("element_at(starts, si)").cast("int"))
        .withColumn("h1", F.expr("element_at(ends_x, si)").cast("int"))
        .withColumn("t0", F.expr("element_at(starts, sj)").cast("int"))
        .withColumn("t1", F.expr("element_at(ends_x, sj)").cast("int"))
    )
    return (
        out.withColumn("h_name", name("h0", "h1"))
        .withColumn("t_name", name("t0", "t1"))
        .drop("is_ent", "starts", "ends_x", "ks", "pair_code")
    )


def candidate_mentions(sentences: DataFrame) -> DataFrame:
    """Raw untagged sentences -> parse.MENTION_SCHEMA-shaped rows, so
    the existing tokenize/score stages run on detected candidates
    exactly as they do on gold pairs.

    Input: convert-style rows (doc_id, span_idx, sent_id, text).
    relation is 'unknown' (no gold label at extraction time); pos/deps
    come from the same rule cascade the gold path uses; ner marks the
    chosen spans 'ENT'. Pure JVM end to end."""
    toks = F.expr(portable.norm_tokens("text", SPARK))
    base = (
        sentences.select(
            "doc_id", "span_idx", "sent_id", toks.alias("tokens")
        )
        .where(F.size("tokens") >= 2)
        .withColumn("n", F.size("tokens"))
    )
    pairs = candidate_pairs(base)
    tag = portable.tag_case("x", SPARK)
    dep = portable.dep_case(portable.tag_case("x", SPARK))
    ner_expr = (
        "transform(sequence(0, n - 1), i -> CASE WHEN (i >= h0 AND i < h1) "
        "OR (i >= t0 AND i < t1) THEN 'ENT' ELSE 'O' END)"
    )
    return pairs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("span_idx").cast("int"),
        "sent_id",
        F.col("tokens").alias("token"),
        F.struct(
            F.col("h_name").alias("name"),
            F.array("h0", "h1").alias("pos"),
        ).alias("h"),
        F.struct(
            F.col("t_name").alias("name"),
            F.array("t0", "t1").alias("pos"),
        ).alias("t"),
        F.lit("unknown").alias("relation"),
        F.expr(f"transform(tokens, x -> {tag})").alias("pos_tags"),
        F.expr(f"transform(tokens, x -> {dep})").alias("deps"),
        F.expr(ner_expr).alias("ner"),
    )
