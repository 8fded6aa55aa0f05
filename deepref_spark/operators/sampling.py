"""Deterministic stratified sampling over a document corpus.

A training-data pipeline rarely ships a corpus as-is: head sources
(common-crawl-like) dwarf curated ones by orders of magnitude, and the
standard counter is per-stratum down-sampling. Two strategies live in
this repo:

  * rate-driven (operators/text_analysis.mixing_plan + the Bernoulli
    keep inside curate_corpus): rates come from a token-share target;
  * count-driven (this module): balance every stratum down to the
    SMALLEST stratum's row count — the "balance to the rarest class"
    recipe used for classifier training sets.

Both use the same deterministic keep rule — portable
``md5_unit(id) < rate`` — so a sample is (a) reproducible run-to-run
with no RNG state, (b) identical under any partitioning or executor
count (the hash depends only on the row's id), and (c) exactly
reproducible by the DuckDB oracle. That's the property
``DataFrame.sampleBy`` lacks: its Bernoulli draw depends on a seed AND
the partition iteration order, so a repartition or an AQE re-plan
changes the sample.

Scale shape: one map-side-combined count per stratum (a tiny table),
broadcast back, then a stateless per-row hash filter — no shuffle of
the corpus itself, fully pushdown-friendly (the filter references only
the id and the broadcast rate).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from deepref_spark import portable


def balanced_rates(df: DataFrame, strata: str = "source") -> DataFrame:
    """(strata, n_rows, rate): rate = smallest stratum count / own
    count, capped at 1.0 — the expected post-sample size of every
    stratum is the smallest stratum's size.

    The global window runs over the already-aggregated per-stratum
    table (bounded by contract — sources, languages, labels), the same
    tiny-table-window pattern mixing_plan uses.
    """
    counts = df.groupBy(strata).agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.partitionBy()
    return counts.withColumn(
        "rate",
        F.least(
            F.lit(1.0),
            F.min("n_rows").over(w).cast("double") / F.col("n_rows"),
        ),
    )


def balanced_sample(
    df: DataFrame, strata: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """The rows kept by the balance-to-smallest-stratum rule:
    ``md5_unit(id) < rate`` with the per-stratum rate broadcast.

    Deterministic in the row ids alone — executor count, partitioning,
    and plan changes cannot alter membership.
    """
    rates = F.broadcast(balanced_rates(df, strata).select(strata, "rate"))
    keep = F.expr(portable.md5_unit(f"CAST({id_col} AS STRING)"))
    return df.join(rates, strata).where(keep < F.col("rate"))


def balanced_sample_summary(
    df: DataFrame, strata: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Per-stratum audit of the sample: (strata, n_rows, rate,
    n_sampled). n_sampled is the realized count (hash filter), whose
    expectation is min-stratum-count; a left join keeps strata that
    happened to lose every row."""
    rates = balanced_rates(df, strata)
    sampled = (
        balanced_sample(df, strata, id_col)
        .groupBy(strata)
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        rates.join(sampled, strata, "left")
        .select(
            F.col(strata),
            F.col("n_rows"),
            F.round(F.col("rate"), 6).alias("rate"),
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("long").alias("n_sampled"),
        )
    )
