"""Ingest/convert stage (SURVEY.md §2.1 S1-S3, §7 step 2).

docs (interleaved spans) -> labeled tagged sentences, preserving
(doc_id, span_idx) so the span sequence can be reassembled exactly —
the per-row invariant (kind, text, media_ref, order) from
BASELINE.json. Media spans flow around the RE core untouched.

All operators here are pure built-in DataFrame ops: posexplode keeps
ordering explicit, filters push down, nothing leaves the JVM.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def explode_spans(docs: DataFrame) -> DataFrame:
    """docs -> one row per span with its array position. posexplode's
    pos column is the authoritative order key (offset is carried for
    the invariant check)."""
    return docs.select(
        "doc_id",
        F.posexplode("spans").alias("span_idx", "span"),
    ).select(
        "doc_id", "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def text_sentences(docs: DataFrame) -> DataFrame:
    """Text spans only, split into (relation, tagged) — the corpus label
    channel mirrors the SemEval 4-line group's sentence+relation pair
    (semeval2010_converter.py:31-41). sent_id = doc_id#span_idx."""
    spans = explode_spans(docs).where(F.col("kind") == "text")
    return spans.select(
        "doc_id", "span_idx",
        F.concat_ws("#", "doc_id", F.col("span_idx").cast("string")).alias("sent_id"),
        F.substring_index("text", "\t", 1).alias("relation"),
        F.expr("substring(text, instr(text, '\t') + 1)").alias("tagged"),
    )


def media_spans(docs: DataFrame) -> DataFrame:
    """Media passthrough lane — carried around the RE core unchanged."""
    return explode_spans(docs).where(F.col("kind") == "media")


def reassemble_docs(exploded: DataFrame) -> DataFrame:
    """Inverse of explode_spans: rebuild the exact span array per doc.
    sort_array over (span_idx, struct) restores order under shuffle —
    this is what the span-sequence invariant test round-trips."""
    return (
        exploded.select(
            "doc_id",
            F.struct(
                F.col("span_idx"),
                F.struct("kind", "text", "media_ref", "offset").alias("span"),
            ).alias("entry"),
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("entry")).alias("entries"))
        .select("doc_id", F.expr("transform(entries, e -> e.span)").alias("spans"))
    )
