"""JVM-side preprocessing composer over the flat parsed mention frame.

Chains the reference preprocessors (fixed order sw -> p -> b -> d ->
eb/nb, train.py:91-124) as built-in array expressions over
(token, h0, h1, t0, t1), completing the zero-per-row-Python path for
every preprocessing variant. Semantics per kind:

  sw  stopword removal outside entity spans (stop_word_preprocessor
      .py:25-34) — membership in the NLTK-minus-'o' set; tokens are
      already lowered by the parse.
  p   PUNCT-tagged removal (punctuation_preprocessor.py:20-27). Tags
      are a pure function of the token string (rule cascade), so each
      stage recomputes the tag instead of carrying a tags column —
      identical to the Python kernel's carried-and-filtered tags. The
      cascade here is the FAITHFUL nlp.TAG_RULES (full punct/num
      regexes), built with the Column API — NOT portable.tag_case,
      whose KEPT_PUNCT / integer-NUM restriction is only equivalent
      over norm_tokens-normalized fixture text (caught by the
      adversarial equivalence test: ']' is PUNCT to the reference
      cascade but NOUN to the fixture twin).
  b   stateful bracket scan (brackets_or_parenthesis_preprocessor
      .py:20-36): a faithful aggregate() fold — '('/'[' set the inside
      flag, ')'/']' clear it, everything inside drops; entity indexes
      are exempt at every step and do NOT touch the state. (The
      kg_preproc_b oracle keeps its depth-count formulation, which is
      equivalent for balanced single-level '(' spans; this fold also
      matches the reference on unbalanced and square brackets.)
  d   digit blinding: token -> 'DIGIT' where tag is NUM (entities NOT
      protected, names NOT rewritten — reference quirks).
  eb/nb  entity blinding (entity_blinding_preprocessor.py:37-61):
      collapse each span to one token ('ENTITY'/'DRUG' constant for
      eb; the span's first NER tag for nb — identically 'O' under the
      rule tagger); the later entity's start shifts left by
      (first span length - 1).

Deletion shifts mirror process_sentence (preprocessor.py:19-40):
both span endpoints shift by the count of deletions before the span
START (deletions cannot land inside a span).

Rows whose spans are empty, overlapping, or out of bounds are NOT
eligible (the Python kernels' consistency asserts / ner[p0] lookups
can raise there and skip the row); extract_scored_jvm routes them
through the per-row reference kernels instead. Equivalence with the
Python path is asserted row-for-row by tests/test_parse_jvm.py across
variants and adversarial corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deepref_spark import nlp, refsem


def _rule_tag(x: Column) -> Column:
    """Faithful Column-API twin of nlp.rule_tag_token (same rule order,
    same regexes/lists/suffixes)."""
    chain = None
    for tag, kind, payload in nlp.TAG_RULES:
        if kind == "regex":
            cond = x.rlike(payload)
        elif kind == "in":
            cond = x.isin(*payload)
        else:  # suffix
            cond = None
            for s in payload:
                e = x.endswith(s)
                cond = e if cond is None else (cond | e)
        chain = F.when(cond, tag) if chain is None else chain.when(cond, tag)
    return chain.otherwise(F.lit(nlp.FALLBACK_TAG))


def _in_ent(i: Column) -> Column:
    return ((i >= F.col("h0")) & (i < F.col("h1"))) | (
        (i >= F.col("t0")) & (i < F.col("t1"))
    )


_FLAT_COLS = ["sent_id", "doc_id", "relation", "token",
              "h_name", "t_name", "h0", "h1", "t0", "t1"]


def _delete_by_drops(df: DataFrame, drops: Column) -> DataFrame:
    """P1 delete kernel given a column producing the 0-based
    drop-index array for the current (token, spans)."""
    # stage the shift counts BEFORE the select: Spark's lateral column
    # alias resolution would otherwise resolve the `h0` inside a later
    # select item's filter lambda to the freshly-aliased OUTPUT h0
    # (caught by the row-for-row equivalence test: h1/t1 shifted by the
    # wrong count while h0/t0 were right)
    df = (
        df.withColumn("_drops", drops)
        .withColumn("_bh", F.size(F.filter("_drops", lambda d: d < F.col("h0"))))
        .withColumn("_bt", F.size(F.filter("_drops", lambda d: d < F.col("t0"))))
    )
    return df.select(
        "sent_id", "doc_id", "relation",
        F.filter(
            "token",
            lambda x, i: ~F.array_contains("_drops", i.cast("int")),
        ).alias("token"),
        "h_name", "t_name",
        (F.col("h0") - F.col("_bh")).alias("h0"),
        (F.col("h1") - F.col("_bh")).alias("h1"),
        (F.col("t0") - F.col("_bt")).alias("t0"),
        (F.col("t1") - F.col("_bt")).alias("t1"),
    )


def _cond_drops(cond) -> Column:
    """Drop indexes where ``cond(x)`` holds outside entity spans."""
    return F.filter(
        F.transform(
            "token",
            lambda x, i: F.when(cond(x) & ~_in_ent(i), i.cast("int")).otherwise(
                F.lit(-1)
            ),
        ),
        lambda v: v >= 0,
    )


def _empty_int_arr() -> Column:
    # F.expr needs an active session — build lazily, not at import
    return F.expr("CAST(array() AS ARRAY<INT>)")


def _bracket_drops() -> Column:
    """Faithful stateful scan as an aggregate fold over token indexes:
    state = (inside flag, collected drop indexes)."""
    def merge(acc, i):
        tok = F.element_at("token", (i + 1).cast("int"))
        grown = F.concat(acc.getField("ds"), F.array(i.cast("int")))
        return (
            F.when(_in_ent(i), acc)
            .when(tok.isin("(", "["), F.struct(
                F.lit(True).alias("ins"), grown.alias("ds")))
            .when(tok.isin(")", "]"), F.struct(
                F.lit(False).alias("ins"), grown.alias("ds")))
            .when(acc.getField("ins"), F.struct(
                acc.getField("ins").alias("ins"), grown.alias("ds")))
            .otherwise(acc)
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.size("token") - 1),
        F.struct(F.lit(False).alias("ins"), _empty_int_arr().alias("ds")),
        merge,
    ).getField("ds")


def _blind(df: DataFrame, rep: Column) -> DataFrame:
    """eb/nb collapse; ``rep`` is the replacement token column (the
    same value lands at both spans: a constant for eb, 'O' for nb
    under the rule tagger whose NER channel is identically 'O')."""
    first = F.col("h0") < F.col("t0")
    n = F.size("token")

    def seg(a, b):  # token[a:b] with clamped non-negative length
        return F.slice("token", a + 1, F.greatest(F.lit(0), b - a))

    tok = F.when(first, F.concat(
        seg(F.lit(0), F.col("h0")), F.array(rep),
        seg(F.col("h1"), F.col("t0")), F.array(rep),
        seg(F.col("t1"), n),
    )).otherwise(F.concat(
        seg(F.lit(0), F.col("t0")), F.array(rep),
        seg(F.col("t1"), F.col("h0")), F.array(rep),
        seg(F.col("h1"), n),
    ))
    h0n = F.when(first, F.col("h0")).otherwise(
        F.col("h0") - (F.col("t1") - F.col("t0") - 1))
    t0n = F.when(first, F.col("t0") - (F.col("h1") - F.col("h0") - 1)).otherwise(
        F.col("t0"))
    # stage before selecting: same lateral-column-alias trap as
    # _delete_by_drops (h1's expression must not see the new h0)
    df = (
        df.withColumn("_tok", tok)
        .withColumn("_h0n", h0n)
        .withColumn("_t0n", t0n)
    )
    return df.select(
        "sent_id", "doc_id", "relation",
        F.col("_tok").alias("token"),
        "h_name", "t_name",
        F.col("_h0n").alias("h0"), (F.col("_h0n") + 1).alias("h1"),
        F.col("_t0n").alias("t0"), (F.col("_t0n") + 1).alias("t1"),
    )


def preproc_eligible_cond() -> str:
    """Rows safe for the JVM composer: NONEMPTY, ordered, disjoint,
    in-bounds spans — the Python kernels' consistency asserts cannot
    fire and blinding's ner[p0] lookup cannot go out of range (a
    zero-width span can drift to index == len after deletions, where
    the reference raises IndexError and skips the row)."""
    return (
        "h0 < h1 AND t0 < t1 AND "
        "h1 <= size(token) AND t1 <= size(token) AND "
        "(h1 <= t0 OR t1 <= h0)"
    )


def apply_preprocessing_jvm(flat: DataFrame, kinds: list[str],
                            entity_replacement: str = "ENTITY") -> DataFrame:
    """Flat parsed mentions -> preprocessed flat mentions, all
    built-in expressions. ``kinds`` must already be normalized
    (refsem.normalize_preproc order: sw, p, b, d, then eb/nb)."""
    stop = sorted(refsem.STOPWORDS_MINUS_O)
    for k in kinds:
        if k == "sw":
            flat = _delete_by_drops(flat, _cond_drops(lambda x: x.isin(*stop)))
        elif k == "p":
            flat = _delete_by_drops(
                flat, _cond_drops(lambda x: _rule_tag(x) == "PUNCT")
            )
        elif k == "b":
            flat = _delete_by_drops(flat, _bracket_drops())
        elif k == "d":
            flat = flat.withColumn(
                "token",
                F.transform(
                    "token",
                    lambda x: F.when(_rule_tag(x) == "NUM", "DIGIT").otherwise(x),
                ),
            )
        elif k == "eb":
            flat = _blind(flat, F.lit(entity_replacement))
        elif k == "nb":
            flat = _blind(flat, F.lit("O"))
    return flat.select(*_FLAT_COLS)
