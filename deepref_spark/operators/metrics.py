"""Evaluation aggregations (SURVEY.md §2.5 A3-A7, A10-A11) as pure
DataFrame aggs — the distributed twin of the reference's driver-side
eval kernel (data_loader.py:52-112).

Quirks reproduced on purpose:
  * the negative class is the FIRST present name in the fixed candidate
    list (incl. DDI's 'int'), data_loader.py:67-72;
  * micro P/R exclude the negative class, but micro_f1 is the sklearn
    all-classes value (== accuracy), because :106 overwrites the manual
    number;
  * macro_f1 averages over every class in rel2id, absent classes
    contributing 0.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from deepref_spark.refsem import NEGATIVE_CLASS_NAMES


def negative_class_name(relations: list[str]) -> str | None:
    present = set(relations)
    for name in NEGATIVE_CLASS_NAMES:
        if name in present:
            return name
    return None


def eval_metrics(preds: DataFrame, golden_col: str = "relation",
                 pred_col: str = "pred_relation",
                 all_relations: list[str] | None = None) -> DataFrame:
    """One-row DataFrame: acc, micro_p, micro_r, micro_f1, macro_f1.

    ``preds`` holds name-level golden + predicted labels. A single
    shuffle-free pass of partial aggregates for the micro numbers plus a
    per-class agg for macro — both map-side combined.
    """
    if all_relations is None:
        all_relations = [
            r[0] for r in preds.select(golden_col).union(preds.select(pred_col)).distinct().collect()
        ]
    neg = negative_class_name(all_relations)
    g, p = F.col(golden_col), F.col(pred_col)
    is_neg_g = g == F.lit(neg) if neg is not None else F.lit(False)
    is_neg_p = p == F.lit(neg) if neg is not None else F.lit(False)

    micro = preds.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((g == p).cast("long")).alias("correct"),
        F.sum(((g == p) & ~is_neg_g).cast("long")).alias("correct_positive"),
        F.sum((~is_neg_g).cast("long")).alias("gold_positive"),
        F.sum((~is_neg_p).cast("long")).alias("pred_positive"),
    )

    # per-class tp/fp/fn for macro-F1 over ALL classes (data_loader.py:107)
    per_class = (
        preds.select(g.alias("cls"), (g == p).cast("long").alias("tp_flag"))
        .groupBy("cls")
        .agg(F.sum("tp_flag").alias("tp"), F.count(F.lit(1)).alias("support"))
        .join(
            preds.groupBy(p.alias("cls")).agg(F.count(F.lit(1)).alias("predicted")),
            "cls", "full",
        )
        .na.fill(0, ["tp", "support", "predicted"])
        .withColumn(
            "f1",
            F.when(
                (F.col("support") + F.col("predicted")) > 0,
                2.0 * F.col("tp") / (F.col("support") + F.col("predicted")),
            ).otherwise(F.lit(0.0)),
        )
    )
    n_classes = len(set(all_relations))
    macro = per_class.agg((F.sum("f1") / F.lit(n_classes)).alias("macro_f1"))

    return micro.crossJoin(macro).select(
        (F.col("correct") / F.col("total")).alias("acc"),
        F.when(F.col("pred_positive") > 0, F.col("correct_positive") / F.col("pred_positive"))
        .otherwise(F.lit(0.0)).alias("micro_p"),
        F.when(F.col("gold_positive") > 0, F.col("correct_positive") / F.col("gold_positive"))
        .otherwise(F.lit(0.0)).alias("micro_f1_r_tmp"),
        (F.col("correct") / F.col("total")).alias("micro_f1"),
        F.col("macro_f1"),
    ).withColumnRenamed("micro_f1_r_tmp", "micro_r").select(
        "acc", "micro_p", "micro_r", "micro_f1", "macro_f1"
    )


def confusion_matrix(preds: DataFrame, golden_col: str = "relation",
                     pred_col: str = "pred_relation") -> DataFrame:
    """groupBy(golden, pred) counts (data_loader.py:108 /
    sentence_re.py:221-231's rendered matrix)."""
    return (
        preds.groupBy(F.col(golden_col).alias("golden"), F.col(pred_col).alias("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sentence_length_histogram(mentions: DataFrame) -> DataFrame:
    """Token-count distribution (framework/statistics.py:11-45)."""
    return (
        mentions.select(F.size("token").alias("sentence_length"))
        .groupBy("sentence_length")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def global_ranked_cumsum(df: DataFrame, order_cols: list, value_col: str,
                         rank_col: str = "rk", cum_col: str = "cum",
                         num_partitions: int | None = None) -> DataFrame:
    """Global row_number + cumulative sum over a total order WITHOUT a
    single-partition Window (the round-1 100x-scale killer): range-
    repartition on the order, per-partition local window (parallel),
    then a tiny per-partition offset table (one row per partition)
    broadcast back. Exact for integer value columns. ``order_cols``
    must define a total order (include a unique tiebreak)."""
    from pyspark.sql import Window

    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    # `local` feeds both the offsets aggregate and the final join —
    # stage it so the range shuffle + windows run once, not per consumer
    local = (
        part.withColumn("_lrk", F.row_number().over(w_local))
        .withColumn("_lcum", F.sum(value_col).over(w_local))
        .localCheckpoint(eager=False)
    )
    # one row per partition — the only single-partition window left runs
    # over num_partitions rows, constant at any data scale
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(value_col).alias("_s"))
        .select(
            "_pid",
            F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_rk_off"),
            F.coalesce(F.sum("_s").over(w_off), F.lit(0)).alias("_cum_off"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_lrk") + F.col("_rk_off")).cast("long"))
        .withColumn(cum_col, F.col("_lcum") + F.col("_cum_off"))
        .drop("_pid", "_lrk", "_lcum", "_rk_off", "_cum_off")
    )


def pr_curve(preds: DataFrame, score_col: str = "score",
             correct_col: str = "is_correct") -> DataFrame:
    """Cumulative P/R sorted by score desc (BagREDataset.eval,
    data_loader.py:239-265), deterministic tiebreak. Distributed:
    two-phase ranked cumsum (global_ranked_cumsum) + a broadcast
    1-row total — no global-ordering Window, no driver collect."""
    ranked = global_ranked_cumsum(
        preds.withColumn("_c", F.col(correct_col).cast("long")),
        [F.desc(score_col), F.asc("sent_id")], "_c",
    )
    # the positive total is just the final cumulative value — derive it
    # from the staged ranking instead of re-scanning the input
    total = ranked.agg(F.greatest(F.max("cum"), F.lit(1)).alias("_total"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "sent_id", score_col,
        (F.col("cum") / F.col("rk")).alias("prec"),
        (F.col("cum") / F.col("_total").cast("double")).alias("rec"),
    )


def auc_trapezoid(pr_points: DataFrame, rec_col: str = "rec",
                  prec_col: str = "prec") -> DataFrame:
    """A10's AUC (data_loader.py:263 sklearn.metrics.auc): trapezoid
    rule over the (recall, precision) curve — a window over the sorted
    curve. Fine for bounded curves (ablation summaries, test points);
    for full prediction sets use auc_trapezoid_ranked."""
    from pyspark.sql import Window

    w = Window.orderBy(rec_col)
    stepped = pr_points.select(
        F.col(rec_col).alias("x"), F.col(prec_col).alias("y"),
        F.lag(rec_col).over(w).alias("x0"),
        F.lag(prec_col).over(w).alias("y0"),
    ).where(F.col("x0").isNotNull())
    return stepped.agg(
        F.round(F.sum((F.col("x") - F.col("x0")) * (F.col("y") + F.col("y0")) / 2.0), 6).alias("auc")
    )


def auc_trapezoid_ranked(curve: DataFrame, rank_col: str = "rk",
                         rec_col: str = "rec", prec_col: str = "prec") -> DataFrame:
    """Distributed trapezoid: the lag() a global window would need is an
    equi-join on consecutive ranks (rk = rk' + 1) — a plain shuffle
    join, no single-partition funnel, same sum as the window form."""
    cur = curve.select(
        F.col(rank_col).alias("_r"), F.col(rec_col).alias("x"), F.col(prec_col).alias("y")
    )
    prev = curve.select(
        (F.col(rank_col) + 1).alias("_r"), F.col(rec_col).alias("x0"), F.col(prec_col).alias("y0")
    )
    stepped = cur.join(prev, "_r")
    return stepped.agg(
        F.round(F.sum((F.col("x") - F.col("x0")) * (F.col("y") + F.col("y0")) / 2.0), 6).alias("auc")
    )


def ablation_summary(results: DataFrame, config_cols: list[str],
                     metric_col: str = "metric_value") -> DataFrame:
    """A12 (ablation_studies.py:77-138): per-configuration mean/std over
    seeds — the reference appends np.mean/np.std rows to a CSV; here one
    grouped aggregation."""
    return (
        results.groupBy(*config_cols)
        .agg(
            F.count(F.lit(1)).alias("n_seeds"),
            F.round(F.avg(metric_col), 6).alias("mean_metric"),
            F.round(F.coalesce(F.stddev_samp(metric_col), F.lit(0.0)), 6).alias("std_metric"),
        )
    )


def cv_splits(df: DataFrame, k: int = 5, seed: int = 42,
              id_col: str = "sent_id") -> DataFrame:
    """Cross-validation fold assignment (framework/cross_validation.py:
    23-30's shuffle+slice): deterministic hash-based fold id — stable
    under repartitioning, unlike randomSplit."""
    return df.withColumn(
        "fold", F.pmod(F.hash(F.col(id_col), F.lit(seed)), F.lit(k))
    )


def calibration_bins(scored: DataFrame, n_bins: int = 10) -> DataFrame:
    """Reliability diagram + ECE over a scored prediction table
    (relation, pred_relation, score in [0, 1]): per confidence bin,
    count / accuracy / mean confidence / |acc - conf| gap, plus one
    summary row (bin = -1) whose gap_ppm is the Expected Calibration
    Error — all on the ppm integer grid (confidence enters as
    floor(score * 1e6 + 0.5) BIGINT, so every sum is order-independent
    and one integer division finishes each ratio).

    Scale shape: ONE map-side-combinable groupBy over the corpus to
    n_bins keys; the ECE rollup runs on the n_bins-row table."""
    ppm = 1_000_000
    per_row = scored.select(
        F.expr(f"least({n_bins - 1}L, CAST(floor(score * {n_bins}) "
               "AS BIGINT))").alias("bin"),
        F.expr(f"CAST(floor(score * {ppm} + 0.5) AS BIGINT)").alias("conf_ppm"),
        F.when(F.col("relation") == F.col("pred_relation"), F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("correct"),
    )
    bins = (
        per_row.groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("correct").cast("long").alias("n_correct"),
             F.sum("conf_ppm").cast("long").alias("sum_conf"))
        .select(
            "bin", "n",
            F.expr(f"(n_correct * {ppm}) div n").alias("acc_ppm"),
            F.expr("sum_conf div n").alias("conf_ppm"),
            F.expr(f"abs((n_correct * {ppm}) div n - sum_conf div n)")
            .alias("gap_ppm"),
            "n_correct", "sum_conf",
        )
    )
    total = bins.agg(
        F.lit(-1).cast("long").alias("bin"),
        F.sum("n").cast("long").alias("n"),
        F.expr(f"(sum(n_correct) * {ppm}) div sum(n)").alias("acc_ppm"),
        F.expr("sum(sum_conf) div sum(n)").alias("conf_ppm"),
        F.expr("sum(n * gap_ppm) div sum(n)").alias("gap_ppm"),
    )
    cols = ["bin", "n", "acc_ppm", "conf_ppm", "gap_ppm"]
    return bins.select(*cols).unionAll(total.select(*cols))
