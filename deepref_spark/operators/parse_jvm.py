"""JVM-side mention parse for the tagged-text entry path.

build_mention (refsem.py:264) is the last per-row Python on the
flagship docs->triples pipeline. For the overwhelmingly common case —
ASCII tagged text with all four pair markers and non-negative derived
spans — every step has an exact built-in-expression form, proven
against DuckDB by the kg_untag_sentence / kg_get_entities /
kg_parse_tags oracle queries (queries.py keeps the dual-dialect
originals; the SPARK-side fragments here mirror them 1:1):

  split -> drop unrelated markers -> first-occurrence pair-marker
  removal (4 staged steps) -> -1/-2/-3 span arithmetic -> lowercase ->
  entity names from span slices.

Rows the vector math cannot reproduce bit-exactly route to the Python
kernels unchanged:
  * non-ASCII text or \\x1c-\\x1f separators (Python str.split()/lower()
    semantics diverge from Java regex \\s / UTF8String lower there),
  * any pair marker missing — dropped, matching untag_tokens'
    ValueError -> row-skip in the fused operator,
  * negative derived positions (Python slices wrap; SQL slices don't).

Reference: deepref/nlp/nlp_tool.py:9-19 (untag),
deepref/dataset/sentence.py:15-29 (get_entities, the -1/-2/-3 shifts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepref_spark import refsem

_OTHERS = f"('{refsem.OTHER_START}', '{refsem.OTHER_END}')"


def _untag_step(arr: str, marker: str) -> str:
    """First-occurrence removal via slices (queries.py oracle twin)."""
    p = f"array_position({arr}, '{marker}')"
    return (
        f"CASE WHEN {p} = 0 THEN {arr} "
        f"ELSE concat(slice({arr}, 1, {p} - 1), "
        f"slice({arr}, {p} + 1, size({arr}) - {p})) END"
    )


def _get_entities_cols(tt: str) -> list:
    """T6 span arithmetic (sentence.py:15-29), 0-based."""
    def pos(marker: str) -> str:
        return f"(array_position({tt}, '{marker}') - 1)"

    e1s, e1e = pos(refsem.E1_START), pos(refsem.E1_END)
    e2s, e2e = pos(refsem.E2_START), pos(refsem.E2_END)
    head_first = f"({e1e} < {e2e})"
    return [
        F.expr(f"CASE WHEN {head_first} THEN {e1s} ELSE {e1s} - 2 END").alias("h0"),
        F.expr(f"CASE WHEN {head_first} THEN {e1e} - 1 ELSE {e1e} - 3 END").alias("h1"),
        F.expr(f"CASE WHEN {head_first} THEN {e2s} - 2 ELSE {e2s} END").alias("t0"),
        F.expr(f"CASE WHEN {head_first} THEN {e2e} - 3 ELSE {e2e} - 1 END").alias("t1"),
    ]


def _name_expr(arr: str, a: str, b: str) -> str:
    # " ".join(original[a:b]).lower(); ASCII-only rows reach here so
    # element-wise lower == join-then-lower
    return f"lower(concat_ws(' ', slice({arr}, {a} + 1, greatest(0, {b} - {a}))))"


def split_jvm_eligible(sentences: DataFrame) -> tuple[DataFrame, DataFrame]:
    """sentences (doc_id, span_idx, sent_id, relation, tagged) ->
    (clean_flat, python_rows); marker-missing rows drop implicitly.

    clean_flat: (sent_id, doc_id, relation, token, h_name, t_name,
    h0, h1, t0, t1) — the same flat shape encoders._flat_mentions
    emits, parsed entirely JVM-side.
    python_rows: original sentence rows whose parse must run through
    the reference Python kernels (non-ASCII / exotic separators /
    negative spans). Marker-missing rows appear in NEITHER output —
    both engines drop them."""
    ascii_ok = (
        F.col("tagged").rlike(r"^[\x00-\x7f]*$")
        & ~F.col("tagged").rlike(r"[\x1c-\x1f]")
    )
    # both outputs (clean flat + python rows) consume this subtree —
    # stage it once or the upstream scan/explode runs per branch.
    # Measured (30k docs, 8 cores, min-of-3): base-only 3.33s vs
    # no-checkpoint 3.56s vs base+parsed 3.79s — materializing the
    # wide `parsed` frame costs more than recomputing its expression
    # chain for the (tiny) negative-span branch, so only base stages.
    base = sentences.withColumn("_ascii", ascii_ok).localCheckpoint(eager=False)

    parsed = (
        base.where(F.col("_ascii"))
        .withColumn("_raw", F.expr(r"filter(split(tagged, '\\s+'), x -> x != '')"))
        .withColumn("_tt", F.expr(f"filter(_raw, x -> x NOT IN {_OTHERS})"))
    )
    present = " AND ".join(
        f"array_position(_tt, '{m}') > 0" for m in refsem.PAIR_MARKERS
    )
    parsed = parsed.where(F.expr(present)).select(
        "doc_id", "span_idx", "sent_id", "relation", "tagged", "_tt",
        *_get_entities_cols("_tt"),
    )
    # original = _tt minus the four pair markers, first occurrence each
    # (removal of unrelated markers commutes with first-occurrence pair
    # removal — distinct strings), one staged column per step so the
    # expression tree stays linear
    prev = "_tt"
    for k, marker in enumerate(refsem.PAIR_MARKERS):
        parsed = parsed.withColumn(f"_u{k}", F.expr(_untag_step(prev, marker)))
        prev = f"_u{k}"

    nonneg = (
        (F.col("h0") >= 0) & (F.col("h1") >= 0)
        & (F.col("t0") >= 0) & (F.col("t1") >= 0)
    )
    clean_flat = parsed.where(nonneg).select(
        "sent_id", "doc_id", "relation",
        F.expr(f"transform({prev}, x -> lower(x))").alias("token"),
        F.expr(_name_expr(prev, "h0", "h1")).alias("h_name"),
        F.expr(_name_expr(prev, "t0", "t1")).alias("t_name"),
        "h0", "h1", "t0", "t1",
    )

    sent_cols = ["doc_id", "span_idx", "sent_id", "relation", "tagged"]
    python_rows = base.where(~F.col("_ascii")).select(*sent_cols).unionByName(
        parsed.where(~nonneg).select(*sent_cols)
    )
    return clean_flat, python_rows
