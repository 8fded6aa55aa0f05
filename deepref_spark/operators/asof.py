"""Point-in-time (as-of) join over an event stream.

Spark has no built-in as-of join (the distributed twin of pandas
``merge_asof``: for every left row, attach the most recent right row
with ``right.on <= left.on`` and the same ``by`` key). The naive
formulation — an inequality join plus a per-left-row argmax — plans as
a range join (often BroadcastNestedLoopJoin) and re-scans the right
side per left partition. This module uses the shuffle-once
formulation instead:

  1. tag the right side 0 and the left side 1 and UNION them;
  2. one window per ``by`` key ordered by (on, side, tie) carries the
     latest right-side values forward with last(..., ignorenulls);
  3. keep side=1 rows.

One shuffle total (the window partitioning on ``by``), no join, and
the carry is a plain running ``last`` the JVM executes inside
whole-stage codegen. At 100 TB the shuffle key is the natural stream
key (user, symbol, device), AQE's skew handling applies because it is
an ordinary exchange, and per-task memory beyond the sort is O(1) —
the window carries a constant number of columns, never a buffer of
right rows.

Semantics pinned by the (on, side, tie) ordering:
  * backward-inclusive — a right row at exactly left.on is visible;
  * ties among right rows at the same ``on`` resolve to the largest
    ``tie`` value (a unique id makes the result total-order
    deterministic, which the DuckDB oracle reproduces bit-for-bit).

The reference engine (igorvlnascimento/DeepREF) has no event-stream
tier at all; this operator belongs to the beyond-reference streaming/
eventstream family (SURVEY.md §2.7) next to sessionize and
session_window.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    tie: str = "event_id",
    values: Sequence[str] = ("value",),
    prefix: str = "asof_",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each ``left`` row, the most recent ``right`` row at or
    before it (per ``by`` key), as carried columns.

    Both inputs must have ``on`` (timestamp or numeric), ``by``, and a
    unique ``tie`` id column. The result is every ``left`` row plus
    ``{prefix}{on}``, ``{prefix}{tie}`` and ``{prefix}{v}`` for each v
    in ``values`` (NULL when no right row precedes). ``tolerance_s``
    optionally voids matches older than that many seconds (timestamp
    ``on``) / units (numeric ``on``), like pandas merge_asof's
    tolerance.
    """
    carried = [on, tie, *values]
    r = right.select(
        F.col(by),
        F.col(on),
        F.col(tie),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
    )
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), F.col(tie).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carried:
        u = u.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))

    out = u.where(F.col("_side") == 1).drop("_side")
    if tolerance_s is not None:
        # stage the flag FIRST: nulling _r_{on} in-place would turn the
        # staleness predicate NULL for the remaining carried columns
        out = out.withColumn(
            "_stale",
            (F.col(on).cast("double") - F.col(f"_r_{on}").cast("double"))
            > F.lit(float(tolerance_s)),
        )
        for c in carried:
            out = out.withColumn(
                f"_r_{c}",
                F.when(F.col("_stale"), F.lit(None)).otherwise(F.col(f"_r_{c}")),
            )
        out = out.drop("_stale")
    for c in carried:
        out = out.withColumnRenamed(f"_r_{c}", f"{prefix}{c}")
    return out
