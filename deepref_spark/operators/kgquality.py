"""KG quality / maintenance operators over the materialized triples.

A KG-construction engine at 10^12-document scale does more than emit
triples: it profiles predicates (which relations behave functionally —
the signal a cleaner uses to spot contradictions), lists conflict
candidates under near-functional predicates, evaluates the entity
canonicalizer against a gold clustering (B-cubed, the standard
mention-clustering metric), and produces corrupted negatives for
KG-embedding training. The reference stops at writing predictions
(`deepref/framework/train.py` prediction loop); these are the
beyond-reference graph-maintenance tier (SURVEY.md §2.8).

Cross-engine determinism disciplines (shared with operators/graph.py):
ratios are a SINGLE double division of two BIGINTs (IEEE-deterministic,
then round 6dp); threshold comparisons happen on exact integer
cross-products, never on rounded doubles; B-cubed sums ride the BIGINT
unit grid with floor division so partial-aggregation order cannot flip
a rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from deepref_spark.portable import md5_mod

UNIT = 1_000_000_000  # B-cubed unit grid, same scale as graph.pagerank


def predicate_profile(triples: DataFrame, subj: str = "subj_canon",
                      pred: str = "pred", obj: str = "obj_canon") -> DataFrame:
    """Per-predicate cardinality profile over distinct (s, p, o) rows.

    functionality(p)      = n_subj / n_triples (1.0 means every subject
                            carries exactly one object under p)
    inv_functionality(p)  = n_obj / n_triples

    One map-side-combined groupBy on ``pred`` — the predicate dimension
    is tiny (the relation vocabulary), so the output is a broadcastable
    dim table whatever the fact-table scale. Each ratio is one double
    division of two BIGINTs, rounded 6dp.
    """
    spo = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"),
        F.col(obj).alias("obj"),
    ).distinct()
    prof = spo.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_subj"),
        F.countDistinct("obj").cast("long").alias("n_obj"),
    )
    return prof.select(
        "pred", "n_triples", "n_subj", "n_obj",
        F.round(F.col("n_subj").cast("double") / F.col("n_triples"), 6)
        .alias("functionality"),
        F.round(F.col("n_obj").cast("double") / F.col("n_triples"), 6)
        .alias("inv_functionality"),
    )


def functional_conflicts(triples: DataFrame, func_num: int = 4,
                         func_den: int = 5, subj: str = "subj_canon",
                         pred: str = "pred",
                         obj: str = "obj_canon") -> DataFrame:
    """Contradiction candidates: under predicates whose functionality is
    at least ``func_num/func_den`` (default 4/5), subjects holding more
    than one distinct object.

    The threshold test is the exact integer cross-product
    ``n_subj * func_den >= n_triples * func_num`` — never a comparison
    on a rounded double, so the qualifying predicate set is identical
    in any engine. The qualifying-predicate list is a broadcast
    semi-join (predicate dim is tiny); the conflict list itself is one
    grouped agg on (subj, pred) with a sorted collect_set so the object
    list is deterministic.
    """
    spo = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"),
        F.col(obj).alias("obj"),
    ).distinct()
    functional = predicate_profile(triples, subj, pred, obj).where(
        F.col("n_subj") * F.lit(func_den) >= F.col("n_triples") * F.lit(func_num)
    ).select("pred")
    return (
        spo.join(F.broadcast(functional), "pred")
        .groupBy("subj", "pred")
        .agg(
            F.countDistinct("obj").cast("long").alias("n_obj"),
            F.array_join(F.sort_array(F.collect_set("obj")), "|").alias("objs"),
        )
        .where(F.col("n_obj") >= 2)
    )


def negative_sample(triples: DataFrame, entities: DataFrame, k: int = 2,
                    n_buckets: int = 16, subj: str = "subj_canon",
                    pred: str = "pred", obj: str = "obj_canon") -> DataFrame:
    """Deterministic bucketed negative sampling for KG-embedding
    training: for each (s, p, o) and slot in [0, k), corrupt the object
    with a hash-chosen entity, then FILTER corruptions that are true
    triples (the standard "filtered" protocol, Bordes et al. 2013,
    TransE — public paper).

    Scale shape follows PyTorch-BigGraph's bucketed sampler (public):
    entities get a hash bucket and a RANK WITHIN BUCKET (row_number
    partitioned by bucket — distributed; never a global sort of the
    entity dim), the per-bucket counts are a ``n_buckets``-row
    broadcast, and each corruption picks (bucket, rank) by md5
    arithmetic, joining back to the ring on the composite key. The
    filter is one left-anti join on (s, p, neg_obj). Every choice is a
    pure function of the triple text, so any partitioning — and the
    single-threaded SQL oracle — emits the identical sample.
    """
    spo = triples.select(
        F.col(subj).alias("subj"), F.col(pred).alias("pred"),
        F.col(obj).alias("obj"),
    ).distinct().localCheckpoint(eager=False)
    ring = entities.select(
        F.col(entities.columns[0]).alias("entity"),
        F.expr(md5_mod("entity", n_buckets)).cast("int").alias("bucket"),
    )
    ring = ring.withColumn(
        "rk",
        (F.row_number().over(Window.partitionBy("bucket").orderBy("entity")) - 1)
        .cast("long"),
    ).localCheckpoint(eager=False)
    cnts = ring.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("bcnt"))

    exp = spo.select(
        "subj", "pred", "obj",
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("slot"),
    )
    key = "concat(subj, '#', pred, '#', obj, '#', slot)"
    exp = (
        exp.withColumn("bucket", F.expr(md5_mod(key, n_buckets)).cast("int"))
        .join(F.broadcast(cnts), "bucket")
        .withColumn(
            "rk",
            F.expr(md5_mod(f"concat({key}, '#r')", "bcnt")).cast("long"),
        )
    )
    picked = exp.join(
        ring.select("bucket", "rk", F.col("entity").alias("neg_obj")),
        ["bucket", "rk"],
    )
    known = spo.select(
        "subj", "pred", F.col("obj").alias("neg_obj"))
    return (
        picked.join(known, ["subj", "pred", "neg_obj"], "left_anti")
        .select("subj", "pred", "obj", F.col("slot").cast("int").alias("slot"),
                "neg_obj")
    )


def b3_eval(assign: DataFrame, item: str = "item", pred_col: str = "pc",
            gold_col: str = "gc") -> DataFrame:
    """B-cubed precision/recall/F1 of a predicted clustering against a
    gold clustering (Bagga & Baldwin 1998 — the standard
    entity-canonicalization metric).

    Per item i: precision = |C(i) ∩ L(i)| / |C(i)|, recall with the
    gold cluster in the denominator; B3 P/R are the means over items.
    Grouped by (pred, gold) cell this is
    sum over cells of n_cell^2 / cluster_size, which rides the BIGINT
    unit grid (``n*n*UNIT div size`` per cell, then a BIGINT sum) so
    the result is independent of partial-aggregation order. The final
    P, R, F1 are a constant number of IEEE double ops on identical
    BIGINTs — bit-identical cross-engine, rounded 6dp.

    Three shuffles on the assignment table (cells, pred sizes, gold
    sizes), each a plain map-side-combined count; the two size tables
    are per-cluster (small relative to items) and join back on their
    own keys.
    """
    a = assign.select(
        F.col(item).alias("item"), F.col(pred_col).alias("pc"),
        F.col(gold_col).alias("gc"),
    ).localCheckpoint(eager=False)
    cells = a.groupBy("pc", "gc").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ps = a.groupBy("pc").agg(F.count(F.lit(1)).cast("long").alias("psz"))
    gs = a.groupBy("gc").agg(F.count(F.lit(1)).cast("long").alias("gsz"))
    u = F.lit(UNIT).cast("long")
    sums = (
        cells.join(ps, "pc").join(gs, "gc")
        .select(
            F.expr(f"n * n * CAST({UNIT} AS BIGINT) DIV psz").alias("pu"),
            F.expr(f"n * n * CAST({UNIT} AS BIGINT) DIV gsz").alias("ru"),
            F.col("n"),
        )
        .agg(
            F.sum("pu").cast("long").alias("sp"),
            F.sum("ru").cast("long").alias("sr"),
            F.sum("n").cast("long").alias("n_items"),
        )
    )
    p0 = F.col("sp").cast("double") / (F.col("n_items") * u).cast("double")
    r0 = F.col("sr").cast("double") / (F.col("n_items") * u).cast("double")
    return sums.select(
        "n_items",
        F.round(p0, 6).alias("b3_precision"),
        F.round(r0, 6).alias("b3_recall"),
        F.round(
            F.when(p0 + r0 > 0, 2.0 * p0 * r0 / (p0 + r0)).otherwise(F.lit(0.0)),
            6,
        ).alias("b3_f1"),
    )
