"""Lakehouse operational plane: the table-maintenance operators a
100 TB KG deployment runs NEXT to its queries — ANALYZE-style column
statistics for the optimizer, small-file compaction planning, and
incremental (delta-refresh) aggregate maintenance.

House determinism rules apply throughout: numeric statistics live on
integer grids (cents = floor(x*100 + 0.5) BIGINT), every corpus-sized
aggregation is a map-side-combinable BIGINT sum/min/max, and values
cross the string boundary only via BIGINT casts (double->string
formatting is NOT portable across engines; bigint->string is).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# (column, kind) specs for the lineitem profile: 'cents' columns are
# quantized to the integer cents grid before min/max/ndv; 'long' and
# 'str' columns are profiled as-is
LINEITEM_STATS_COLS = (
    ("l_orderkey", "long"),
    ("l_quantity", "cents"),
    ("l_extendedprice", "cents"),
    ("l_discount", "cents"),
    ("l_tax", "cents"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
)


def _grid(col: str, kind: str) -> F.Column:
    if kind == "cents":
        return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")
    return F.col(col)


def column_stats(df: DataFrame, specs=LINEITEM_STATS_COLS) -> DataFrame:
    """ANALYZE-style per-column statistics in ONE scan: row count,
    null count, exact NDV, and min/max, one output row per column —
    (col_name, n_rows, n_null, ndv, min_val, max_val) with min/max as
    strings (BIGINT-grid casts for numerics, raw values for varchars).

    Scale shape: a single global aggregate computes every column's
    count/min/max plus one count(DISTINCT grid) per column — Spark
    plans multi-distinct via one Expand (rows x n_distinct_cols)
    feeding one partial-aggregated shuffle, which is exactly what a
    built-in ANALYZE does; the explode to per-column rows happens on
    the ONE result row. For sketch-sized NDV at extreme cardinality
    swap count_distinct for approx_count_distinct and drop the oracle
    to rows-only (the HLL register path next door shows the merge
    discipline)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for col, kind in specs:
        g = _grid(col, kind)
        aggs += [
            F.count(g).alias(f"_nn_{col}"),
            F.countDistinct(g).alias(f"_ndv_{col}"),
            F.min(g).cast("string").alias(f"_min_{col}"),
            F.max(g).cast("string").alias(f"_max_{col}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(col).alias("col_name"),
            F.col("_n").cast("long").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{col}")).cast("long").alias("n_null"),
            F.col(f"_ndv_{col}").cast("long").alias("ndv"),
            F.col(f"_min_{col}").alias("min_val"),
            F.col(f"_max_{col}").alias("max_val"),
        )
        for col, _ in specs
    ])
    return one.select(F.explode(per_col).alias("s")).select("s.*")


def file_inventory(events: DataFrame, row_bytes: int = 64) -> DataFrame:
    """Deterministic stand-in for a table-format file listing: one
    'file' per (event_type partition, event day), sized at
    row_bytes * row-count — the (partition_key, file_id, n_bytes)
    shape a real manifest scan produces. One grouped count."""
    return (
        events
        .groupBy(
            F.col("event_type").alias("partition_key"),
            F.date_format(F.date_trunc("day", F.col("ts").cast("timestamp")),
                          "yyyy-MM-dd").alias("file_id"),
        )
        .agg((F.count(F.lit(1)) * row_bytes).cast("long").alias("n_bytes"))
    )


def compaction_plan(inventory: DataFrame,
                    target_bytes: int = 2048) -> DataFrame:
    """Order-preserving small-file compaction plan: within each
    partition, files are packed in file_id order into sequential
    groups of ~target_bytes (group = cumulative-bytes-before DIV
    target — the streaming coalesce rule table formats use for
    order-preserving bin-packing). Returns one row per planned rewrite
    task: (partition_key, compact_group, n_files, total_bytes,
    first_file, last_file).

    Scale shape: manifests are metadata (millions of rows, not
    billions) — one window cumsum per partition plus one grouped
    rollup; the window partitions by partition_key so planning is
    parallel across partitions and no global sort exists. All
    arithmetic is BIGINT (cum DIV target), so the plan is identical
    under any partitioning and in the SQL twin."""
    w = (Window.partitionBy("partition_key").orderBy("file_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    planned = (
        inventory
        .withColumn("_cum", F.coalesce(F.sum("n_bytes").over(w), F.lit(0)))
        .select(
            "partition_key", "file_id", "n_bytes",
            F.expr(f"_cum div {int(target_bytes)}").cast("long")
            .alias("compact_group"),
        )
    )
    return (
        planned.groupBy("partition_key", "compact_group")
        .agg(F.count(F.lit(1)).cast("long").alias("n_files"),
             F.sum("n_bytes").cast("long").alias("total_bytes"),
             F.min("file_id").alias("first_file"),
             F.max("file_id").alias("last_file"))
    )


def incremental_agg(events: DataFrame, cutoff: str) -> DataFrame:
    """Delta-refresh aggregate maintenance: the per-(user, event_type)
    rollup computed as BASE (ts < cutoff) partials merged with DELTA
    (ts >= cutoff) partials — the materialized-view refresh pattern
    (never recompute the base at 100 TB; fold the new partition's
    partials in). Returns (user_id, event_type, n_events, total_value)
    where total_value is the cents-grid sum divided once at the end.

    The registered oracle computes the SAME rollup in one direct pass,
    so the correctness gate proves the merge is exact: count/sum
    partials are associative on the BIGINT grid, so base+delta ==
    full recompute bit-for-bit under any split point."""
    ev = events.select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    cut = F.to_timestamp(F.lit(cutoff))

    def partial(side: DataFrame) -> DataFrame:
        return side.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )

    base = partial(ev.where(F.col("ts") < cut))
    delta = partial(ev.where(F.col("ts") >= cut))
    merged = (
        base.unionAll(delta)
        .groupBy("user_id", "event_type")
        .agg(F.sum("n_events").cast("long").alias("n_events"),
             F.sum("sum_cents").cast("long").alias("sum_cents"))
    )
    return merged.select(
        "user_id", "event_type", "n_events",
        F.round(F.col("sum_cents") / 100.0, 6).alias("total_value"),
    )


# the lineitem data-quality suite: each check is one row of the verify
# report. metric grids per kind: completeness/uniqueness/set-membership
# are ppm (parts-per-million, BIGINT floor division), bound checks are
# the cents-grid extreme itself.
PPM = 1_000_000


def constraint_check(df: DataFrame) -> DataFrame:
    """Deequ-style data-quality verification in ONE scan: the whole
    constraint suite evaluates as a single global aggregate (every
    primitive is a count / countDistinct / grid min-max / conditional
    sum — all map-side combinable), and the per-constraint report rows
    explode from the one result row. Returns
    (check_name, metric, passed) with metric BIGINT (ppm or cents per
    the suite table) and passed as BIGINT 0/1.

    Suite: l_orderkey completeness == 1; (l_orderkey, l_linenumber)
    uniqueness == 1; min(l_quantity) >= 1.00; max(l_discount) <= 0.10;
    l_returnflag within {A, N, R}."""
    one = df.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.count("l_orderkey").cast("long").alias("_nn_ok"),
        F.countDistinct(
            F.expr("l_orderkey * 100 + l_linenumber")).cast("long")
        .alias("_ndv_ol"),
        F.min(_grid("l_quantity", "cents")).cast("long").alias("_min_qty"),
        F.max(_grid("l_discount", "cents")).cast("long").alias("_max_disc"),
        F.sum(F.when(F.col("l_returnflag").isin("A", "N", "R"), 1)
              .otherwise(0)).cast("long").alias("_n_flag_ok"),
    )
    checks = [
        ("complete_l_orderkey", f"(_nn_ok * {PPM}) div _n", f">= {PPM}"),
        ("unique_order_line", f"(_ndv_ol * {PPM}) div _n", f">= {PPM}"),
        ("min_l_quantity_cents", "_min_qty", ">= 100"),
        ("max_l_discount_cents", "_max_disc", "<= 10"),
        ("set_l_returnflag", f"(_n_flag_ok * {PPM}) div _n", f">= {PPM}"),
    ]
    rows = F.array(*[
        F.struct(
            F.lit(name).alias("check_name"),
            F.expr(metric).cast("long").alias("metric"),
            F.expr(f"CAST(CASE WHEN ({metric}) {cond} THEN 1 ELSE 0 END "
                   "AS BIGINT)").alias("passed"),
        )
        for name, metric, cond in checks
    ])
    return one.select(F.explode(rows).alias("s")).select("s.*")


def zorder_expr(x: str, y: str, bits: int, dialect: str) -> str:
    """Morton (Z-order) bit interleave of two grid keys in [0, 2^bits)
    as pure div/mod arithmetic — identical text in both engines, so
    the clustering key is bit-reproducible: bit i of x lands at 2i,
    bit i of y at 2i+1."""
    from deepref_spark.portable import idiv

    terms = []
    for i in range(bits):
        terms.append(f"({idiv(x, str(1 << i), dialect)} % 2) * {1 << (2 * i)}")
        terms.append(f"({idiv(y, str(1 << i), dialect)} % 2) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_buckets(df: DataFrame, xcol: str = "l_orderkey",
                   ycol: str = "l_partkey", bits: int = 8,
                   bucket_shift: int = 8) -> DataFrame:
    """Z-order clustering layout plan: normalize two BIGINT keys onto a
    2^bits grid (rank-free: (key * 2^bits) div (max + 1), maxes from
    one tiny broadcast agg), Morton-interleave them, and report the
    per-bucket row counts and key envelopes — the data-skipping
    diagnostic for a space-filling-curve rewrite (each bucket's
    min/max envelope on BOTH keys is what a zone map prunes on).

    Scale shape: one 2-value global agg broadcast back (no collect),
    one stateless projection, one map-side-combinable groupBy over at
    most 2^(2*bits - bucket_shift) buckets."""
    from deepref_spark.portable import SPARK

    maxes = df.agg(F.max(xcol).cast("long").alias("_mx"),
                   F.max(ycol).cast("long").alias("_my"))
    grid = 1 << bits
    keyed = (
        df.select(F.col(xcol).cast("long").alias("x"),
                  F.col(ycol).cast("long").alias("y"))
        .crossJoin(F.broadcast(maxes))
        .select(
            "x", "y",
            F.expr(f"(x * {grid}) div (_mx + 1)").alias("xn"),
            F.expr(f"(y * {grid}) div (_my + 1)").alias("yn"),
        )
        .select(
            "x", "y",
            F.expr(zorder_expr("xn", "yn", bits, SPARK)).alias("z"),
        )
    )
    return (
        keyed.groupBy(F.expr(f"z div {1 << bucket_shift}").cast("long")
                      .alias("z_bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.min("x").alias("min_x"), F.max("x").alias("max_x"),
             F.min("y").alias("min_y"), F.max("y").alias("max_y"))
    )


def skipping_eval(df: DataFrame, xcol: str = "l_orderkey",
                  ycol: str = "l_partkey", bits: int = 8,
                  bucket_shift: int = 8, n_probes: int = 7) -> DataFrame:
    """Data-skipping effectiveness: for point predicates on ``ycol``,
    how many file buckets a zone map must scan under (a) the natural
    layout (bucketed by ``xcol`` — the secondary key's envelopes are
    full-range, so nothing prunes) versus (b) the Z-order layout from
    zorder_buckets (both keys cluster, so most envelopes exclude the
    probe). Probe keys are the deterministic grid
    (max_y * i) div (n_probes + 1), i = 1..n_probes. Returns
    (probe_key, natural_scanned, zorder_scanned, total_buckets) — the
    quantified argument for a space-filling-curve rewrite.

    Scale shape: both envelope tables are metadata-sized (<= 2^(2*bits
    - bucket_shift) rows); probes are a literal sequence exploded from
    the broadcast 1-row max — the corpus is scanned exactly twice (once
    per layout's grouped envelope), never per probe."""
    from deepref_spark.portable import SPARK

    grid = 1 << bits
    maxes = df.agg(F.max(xcol).cast("long").alias("_mx"),
                   F.max(ycol).cast("long").alias("_my"))
    natural = (
        df.select(F.col(xcol).cast("long").alias("x"),
                  F.col(ycol).cast("long").alias("y"))
        .crossJoin(F.broadcast(maxes))
        .groupBy(F.expr(f"(x * {grid}) div (_mx + 1)").cast("long")
                 .alias("nb"))
        .agg(F.min("y").alias("min_y"), F.max("y").alias("max_y"))
    )
    zb = zorder_buckets(df, xcol, ycol, bits, bucket_shift).select(
        "z_bucket", "min_y", "max_y")
    probes = maxes.select(
        F.explode(F.expr(
            f"transform(sequence(1, {n_probes}), "
            f"i -> (_my * i) div {n_probes + 1})")).alias("probe_key"))
    nat = (
        probes.join(natural, (F.col("min_y") <= F.col("probe_key"))
                    & (F.col("probe_key") <= F.col("max_y")), "left")
        .groupBy("probe_key")
        .agg(F.count("nb").cast("long").alias("natural_scanned"))
    )
    zod = (
        probes.join(zb, (F.col("min_y") <= F.col("probe_key"))
                    & (F.col("probe_key") <= F.col("max_y")), "left")
        .groupBy("probe_key")
        .agg(F.count("z_bucket").cast("long").alias("zorder_scanned"))
    )
    totals = (
        natural.agg(F.count(F.lit(1)).alias("_tn"))
        .crossJoin(zb.agg(F.count(F.lit(1)).alias("_tz")))
        .select((F.col("_tn") + F.col("_tz")).cast("long")
                .alias("total_buckets"))
    )
    return nat.join(zod, "probe_key").crossJoin(F.broadcast(totals))


def quantile_hist(df: DataFrame, col: str = "l_extendedprice",
                  width_cents: int = 100000,
                  pcts: tuple = (50, 95, 99)) -> DataFrame:
    """Mergeable-histogram quantile estimation — the distributed
    ANALYZE-percentile pattern: bucket every value on the exact cents
    grid into fixed-width bins (per-partition partials combine
    MAP-SIDE — the whole reason production quantiles are
    histogram/sketch shaped), then read each requested percentile off
    the cumulative bin table. Estimates are deterministic integers
    (bin lower bound), unlike percentile_approx whose sketch is
    merge-order dependent — that non-determinism is exactly what this
    operator exists to avoid, and why the SQL oracle can hash-match
    it.

    The cumulative window runs over the tiny histogram table (bounded
    by value range / width, independent of row count); the quantile
    rule is integer-exact: smallest bucket with cum*100 >= pct*total.
    """
    width = int(width_cents)
    hist = (
        df.select(F.expr(
            f"CAST(floor({col} * 100.0 + 0.5) AS BIGINT) DIV {width}"
        ).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)  # feeds cum, total AND the final join
    )
    wc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = hist.select("bucket", "n",
                      F.sum("n").over(wc).cast("long").alias("cum"))
    total = hist.agg(F.sum("n").cast("long").alias("total"))
    pvals = ", ".join(str(int(p)) for p in pcts)
    p = df.sparkSession.range(1).select(
        F.explode(F.expr(f"array({pvals})")).alias("pct")
    ).select(F.col("pct").cast("int").alias("pct"))
    sel = (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(p))
        .where(F.col("cum") * 100 >= F.col("pct").cast("long") * F.col("total"))
        .groupBy("pct")
        .agg(F.min("bucket").alias("bucket"))
    )
    return (
        sel.join(cum, "bucket")
        .crossJoin(F.broadcast(total))
        .select("pct", "bucket",
                (F.col("bucket") * width).cast("long").alias("est_lo_cents"),
                F.col("cum").alias("cum_rows"),
                F.col("total").alias("total_rows"))
    )


def retention_plan(inventory: DataFrame, retain_days: int = 7) -> DataFrame:
    """Snapshot-expiry vacuum plan (the Iceberg expire_snapshots /
    remove_orphan_files decision procedure on the deterministic
    file_inventory stand-in): each day's file SUPERSEDES its
    partition's previous file, so file f is live over
    [its day, partition's next file day); snapshots older than
    max_day - retain_days expire; a file is physically reclaimable iff
    its live interval ends at-or-before the cutoff (no retained
    snapshot references it — the reachability rule, not an mtime
    heuristic: head files stay whatever their age). Returns the
    per-partition vacuum rollup a maintenance job logs before acting.

    Scale shape: manifests are metadata — one lead() window per
    partition, one 1-row global max broadcast, one grouped rollup.
    Date strings compare lexicographically (yyyy-MM-dd), so the plan
    is identical under any partitioning and in the SQL twin."""
    w = Window.partitionBy("partition_key").orderBy("file_id")
    cur = inventory.withColumn("next_day", F.lead("file_id").over(w))
    cutoff = inventory.agg(
        F.date_format(
            F.date_sub(F.to_date(F.max("file_id")), retain_days),
            "yyyy-MM-dd").alias("cutoff"))
    flagged = cur.crossJoin(F.broadcast(cutoff)).withColumn(
        "expired",
        F.when(F.col("next_day").isNotNull()
               & (F.col("next_day") <= F.col("cutoff")), 1).otherwise(0))
    return (
        flagged.groupBy("partition_key", "cutoff")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("expired").cast("long").alias("n_expired"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum(F.when(F.col("expired") == 1, F.col("n_bytes"))
                  .otherwise(0)).cast("long").alias("bytes_reclaimed"),
            F.min(F.when(F.col("expired") == 1, F.col("file_id")))
            .alias("first_expired"),
            F.max(F.when(F.col("expired") == 1, F.col("file_id")))
            .alias("last_expired"),
        )
    )


def bucket_advisor(fact: DataFrame, key_cols: list,
                   target_rows: int = 1000,
                   salt_ppm: int = 200000) -> DataFrame:
    """Bucketing / salting advisor for a fact table's candidate join
    keys — the physical-design readout a lakehouse runs before
    declaring CLUSTERED BY: per key column, the row count, distinct
    cardinality, the heaviest single key's share (the skew signal),
    a recommended bucket count (next power of two covering
    rows / ``target_rows`` — pow2 so bucket unions/splits stay
    aligned), and a salt flag when the top key exceeds ``salt_ppm``
    (bucketing cannot split one hot key; salting must).

    ``target_rows`` is the per-bucket row budget: ~1e6+ on a real
    cluster (sized to executor memory), small here so tests exercise
    the pow2 ladder. Scale shape: one grouped count per key column
    (each map-side combined — the same shuffle a bucketed write would
    pay once), each collapsing to a 1-row profile; the pow2 rides
    exact BIGINT bit length (bin()), never float log2.
    """
    outs = []
    for c in key_cols:
        per = fact.groupBy(F.col(c).alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("cnt"))
        outs.append(per.agg(
            F.lit(c).alias("key_col"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.max("cnt").cast("long").alias("top_cnt"),
        ))
    prof = outs[0]
    for o in outs[1:]:
        prof = prof.unionAll(o)
    need = f"CAST((n_rows + {int(target_rows)} - 1) DIV {int(target_rows)} AS BIGINT)"
    return prof.select(
        "key_col", "n_rows", "n_distinct", "top_cnt",
        F.expr("CAST((top_cnt * 1000000) DIV n_rows AS BIGINT)")
        .alias("top_share_ppm"),
        F.expr(f"CASE WHEN {need} <= 1 THEN CAST(1 AS BIGINT)"
               f" ELSE CAST(shiftleft(CAST(1 AS BIGINT),"
               f" length(bin({need} - 1))) AS BIGINT) END")
        .alias("rec_buckets"),
        F.expr(f"CAST(CAST((top_cnt * 1000000) DIV n_rows AS BIGINT)"
               f" > {int(salt_ppm)} AS INT)").alias("salt_flag"),
    )


def wap_gate(orders: DataFrame, cutoff: str = "1999-01-01",
             max_volume_milli: int = 800,
             max_drift_milli: int = 200) -> DataFrame:
    """Write-audit-publish gate: the pre-publish CI checks a lakehouse
    runs on a staged batch (rows at/after ``cutoff``) against the
    published table (rows before it) before swapping the snapshot
    pointer — the Iceberg WAP pattern's audit step. Four checks, one
    row each, every metric an exact BIGINT so the pass flags are
    integer comparisons:

    - volume_milli: staged/published row ratio x1000 <= threshold
      (a runaway upstream duplicating the feed fails here);
    - dup_keys: duplicated o_orderkey rows inside the batch == 0;
    - new_enum: o_orderstatus values unseen in the published table
      == 0 (schema-drift canary on a closed enum);
    - drift_milli: |staged avg total price / published avg − 1| x1000
      <= threshold on the cents grid. The published-side mean is
      floored to a whole cent FIRST (one BIGINT DIV — deterministic in
      both engines, sub-cent loss irrelevant at milli granularity);
      this keeps the cross-multiplied numerator within int64 at any
      realistic scale, where the full cross-product sum_c*n_b*1000
      would overflow past ~1e5 orders.

    Scale shape: one conditional-aggregate pass over the table for
    counts/sums (map-side combined), one per-key dup probe on the
    batch only, one tiny distinct-status anti-join; the four 1-row
    aggregates cross-join broadcast into the stacked readout."""
    ts = f"TIMESTAMP '{cutoff} 00:00:00'"
    cents = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
    flags = orders.select(
        F.expr(f"CAST(o_orderdate >= {ts} AS INT)").alias("is_cand"),
        F.expr(cents).alias("cents"), "o_orderkey", "o_orderstatus")
    base_agg = F.broadcast(flags.where("is_cand = 0").agg(
        F.count(F.lit(1)).cast("long").alias("base_n"),
        F.sum("cents").cast("long").alias("base_cents")))
    cand = flags.where("is_cand = 1")
    cand_agg = F.broadcast(cand.agg(
        F.count(F.lit(1)).cast("long").alias("cand_n"),
        F.sum("cents").cast("long").alias("cand_cents")))
    dup_agg = F.broadcast(cand.groupBy("o_orderkey")
                          .agg(F.count(F.lit(1)).alias("c"))
                          .agg(F.sum(F.expr("c - 1")).cast("long")
                               .alias("dup_rows")))
    new_enum = F.broadcast(
        cand.select("o_orderstatus").distinct()
        .join(flags.where("is_cand = 0").select("o_orderstatus").distinct(),
              "o_orderstatus", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("new_statuses")))
    one = (base_agg.crossJoin(cand_agg).crossJoin(dup_agg)
           .crossJoin(new_enum))
    stack = (
        f"stack(4,"
        f" 'volume_milli', CAST(cand_n * 1000 DIV base_n AS BIGINT),"
        f"   CAST({int(max_volume_milli)} AS BIGINT),"
        f" 'dup_keys', coalesce(dup_rows, CAST(0 AS BIGINT)),"
        f"   CAST(0 AS BIGINT),"
        f" 'new_enum', new_statuses, CAST(0 AS BIGINT),"
        f" 'drift_milli',"
        f"   CAST(abs(cand_cents * 1000"
        f"            DIV (cand_n * (base_cents DIV base_n)) - 1000)"
        f"        AS BIGINT),"
        f"   CAST({int(max_drift_milli)} AS BIGINT)"
        f") AS (check_name, value, threshold)"
    )
    return one.select(F.expr(stack)).select(
        "check_name", "value", "threshold",
        F.expr("CAST(value <= threshold AS INT)").alias("pass_flag"))


def overlap_depth(events: DataFrame, writers: int = 4) -> DataFrame:
    """Clustering-health metric for data skipping: per partition, the
    maximum number of files whose [min_ts, max_ts] second-ranges
    overlap — Delta/Iceberg's OPTIMIZE-worthiness readout (a perfectly
    clustered partition has depth 1: every point query prunes to one
    file; depth ~= n_files means min/max skipping prunes nothing).
    The file listing stand-in is one 'file' per (event_type partition,
    user_id % writers) — the concurrent-writer shape whose time ranges
    genuinely interleave, unlike day-grain files which are disjoint by
    construction.

    Sweep-line without a self-join: +1 at each file's start second,
    -1 at end+1, one RANGE-frame running sum over boundary positions
    (ties collapse into a single frame step, so the depth at a tied
    position is frame-deterministic in any engine), one max per
    partition. Manifest-sized work throughout — the only stream-sized
    pass is the per-file min/max grouped agg (map-side combined)."""
    files = (
        events.groupBy(F.col("event_type").alias("partition_key"),
                       (F.col("user_id") % int(writers)).alias("fid"))
        # timestamp->long truncates to whole seconds (the oracle
        # mirrors with floor(epoch(ts)) — the events_bounce lesson);
        # the inner CAST AS TIMESTAMP bridges NTZ-typed parquet
        .agg(F.expr("min(CAST(CAST(ts AS TIMESTAMP) AS LONG))")
             .cast("long").alias("lo"),
             F.expr("max(CAST(CAST(ts AS TIMESTAMP) AS LONG))")
             .cast("long").alias("hi"))
        .localCheckpoint(eager=False)  # feeds bounds AND the file count
    )
    bounds = (
        files.select("partition_key", F.col("lo").alias("pos"),
                     F.lit(1).alias("delta"))
        .union(files.select("partition_key",
                            (F.col("hi") + 1).alias("pos"),
                            F.lit(-1).alias("delta")))
    )
    w = (Window.partitionBy("partition_key").orderBy("pos")
         .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    depth = bounds.select(
        "partition_key",
        F.sum("delta").over(w).cast("long").alias("depth"))
    nf = files.groupBy("partition_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"))
    return (
        depth.groupBy("partition_key")
        .agg(F.max("depth").cast("long").alias("max_depth"))
        .join(nf, "partition_key")
        .select("partition_key", "n_files", "max_depth")
    )


def layout_advisor(events: DataFrame, small_rows: int = 1000) -> DataFrame:
    """Partition-layout advisor over the candidate partition columns
    (day, event_type, day x event_type): per layout, partition count,
    row spread (min/max), and the share of SMALL partitions (<
    ``small_rows`` rows) — the table that decides the physical layout
    before a 100 TB write: day x type multiplies cardinalities, and
    when its small-partition share explodes this report says so BEFORE
    the writer scatters millions of tiny files (the small-file problem
    lake_compaction_plan then has to undo; bucket_advisor's
    single-column analysis composes with this cross-layout view).

    One grouped count per layout (map-side combined), each reduced to
    a one-row summary — three scans of the fact (or one with cube; the
    explicit form keeps each layout's plan independently prunable).
    """
    cands = [
        ("day", [F.to_date("ts").alias("k1")]),
        ("event_type", [F.col("event_type").alias("k1")]),
        ("day_x_type", [F.to_date("ts").alias("k1"),
                        F.col("event_type").alias("k2")]),
    ]
    parts = []
    for name, keys in cands:
        per = events.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("rows"))
        parts.append(per.agg(
            F.count(F.lit(1)).cast("long").alias("n_partitions"),
            F.sum("rows").cast("long").alias("n_rows"),
            F.min("rows").cast("long").alias("min_rows"),
            F.max("rows").cast("long").alias("max_rows"),
            F.sum(F.when(F.col("rows") < small_rows, 1).otherwise(0))
            .cast("long").alias("n_small"),
        ).select(
            F.lit(name).alias("layout"), "n_partitions", "n_rows",
            "min_rows", "max_rows", "n_small",
            F.expr("n_small * 1000000 div n_partitions").cast("long")
            .alias("small_ppm"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def compaction_savings(inventory: DataFrame,
                       target_bytes: int = 2048) -> DataFrame:
    """One-row go/no-go rollup over compaction_plan: files before vs
    rewrite groups after, the file-count reduction ppm, and mean file
    size before/after on the milli grid — the number that decides
    whether the rewrite job is worth scheduling at all (a plan whose
    reduction is 5% burns IO for nothing; the threshold belongs in
    the maintenance policy, this table feeds it).

    Derived entirely from the plan's metadata-sized output: one
    grouped rollup, exact BIGINT arithmetic.
    """
    plan = compaction_plan(inventory, target_bytes=target_bytes)
    return (
        plan.agg(
            F.countDistinct("partition_key").cast("long")
            .alias("n_partitions"),
            F.sum("n_files").cast("long").alias("files_before"),
            F.count(F.lit(1)).cast("long").alias("files_after"),
            F.sum("total_bytes").cast("long").alias("total_bytes"),
        )
        .select(
            "n_partitions", "files_before", "files_after", "total_bytes",
            F.expr("(files_before - files_after) * 1000000 div files_before")
            .cast("long").alias("reduction_ppm"),
            F.expr("total_bytes * 1000 div files_before").cast("long")
            .alias("mean_bytes_before_milli"),
            F.expr("total_bytes * 1000 div files_after").cast("long")
            .alias("mean_bytes_after_milli"),
        )
    )
