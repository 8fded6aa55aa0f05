"""S1 — SemEval-2010 Task 8 corpus scan (SURVEY.md §2.1).

The raw format is 4-line groups: `<id>\\t"<sentence with <e1>..</e2>>"`,
relation, comment, blank (semeval2010_converter.py:31-41). Distributed
read: spark.read.text preserves per-file line order via a window keyed
on a monotonic id per file partition; groups form with
floor(line_index / 4). Marker replacement + quote stripping happen as
built-in column expressions — the whole scan stays JVM-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def read_semeval2010(spark: SparkSession, path: str) -> DataFrame:
    """-> (group_id, relation, tagged) rows."""
    lines = spark.read.text(path).select(
        F.col("value"),
        F.monotonically_increasing_id().alias("mid"),
    )
    w = Window.orderBy("mid")
    indexed = lines.withColumn("line_idx", F.row_number().over(w) - 1)
    grouped = indexed.withColumn("group_id", F.floor(F.col("line_idx") / 4)) \
                     .withColumn("line_in_group", F.col("line_idx") % 4)
    pivoted = (
        grouped.where(F.col("line_in_group") <= 1)
        .groupBy("group_id")
        .agg(
            F.max(F.when(F.col("line_in_group") == 0, F.col("value"))).alias("sent_line"),
            F.max(F.when(F.col("line_in_group") == 1, F.trim(F.col("value")))).alias("relation"),
        )
    )
    sent = F.trim(F.substring_index("sent_line", "\t", -1))
    unquoted = F.regexp_replace(F.regexp_replace(sent, '^"', ""), '"$', "")
    tagged = unquoted
    for a, b in (("<e1>", " ENTITYSTART "), ("</e1>", " ENTITYEND "),
                 ("<e2>", " ENTITYOTHERSTART "), ("</e2>", " ENTITYOTHEREND ")):
        tagged = F.replace(tagged, F.lit(a), F.lit(b))
    tagged = F.trim(F.regexp_replace(tagged, r"\s+", " "))
    return pivoted.select("group_id", "relation", tagged.alias("tagged")).where(
        F.col("sent_line").isNotNull() & F.col("relation").isNotNull()
    )
