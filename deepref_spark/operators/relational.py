"""Relational star-join analytics over the TPC-H-shaped tables: the
classic multi-table OLAP shapes (broadcast star joins, semi-joins on a
date condition, outer-join distributions, join-back aggregates,
partitioned top-N windows) that a KG/lakehouse deployment runs against
its fact tables next to the document lanes.

These are the canonical warehouse query patterns (TPC-H Q1/Q3/Q4/Q5/
Q13/Q14/Q17 shapes, adapted to this corpus's columns), expressed so
Catalyst picks the right physical strategy: genuinely small dims
(region, nation, supplier, the per-part aggregate) are broadcast;
fact-fact joins shuffle on their keys with AQE; semi/anti joins are
declared as such rather than via distinct+inner.

House determinism rules: all money/quantity floats are quantized to
integer grids up front (cents = floor(x*100 + 0.5) BIGINT; discount/
tax to integer percent), so every aggregate is an order-independent
BIGINT sum and every derived ratio is an integer-division ppm — no
double accumulation anywhere, and the DuckDB oracle can replay the
identical arithmetic. Dates cross the output boundary as formatted
strings. Magnitude notes: charge lives on the e6 grid (cents x
(100-d) x (100+t)); per-group partial sums stay far inside int64 at
any realistic group cardinality — at extreme scale the same grids
port to decimal(38,0) unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# integer grids (identical expression text runs in Spark and DuckDB)
CENTS = "CAST(floor({c} * 100 + 0.5) AS BIGINT)"
PCT = "CAST(floor({c} * 100 + 0.5) AS BIGINT)"


def _cents(c: str) -> F.Column:
    return F.expr(CENTS.format(c=c))


def _rev_e4() -> F.Column:
    """discounted revenue on the e4 grid: cents x (100 - disc_pct)."""
    return F.expr(
        f"{CENTS.format(c='l_extendedprice')}"
        f" * (100 - {PCT.format(c='l_discount')})"
    )


def pricing_summary(lineitem: DataFrame,
                    cutoff: str = "2000-12-31") -> DataFrame:
    """TPC-H Q1 shape: the scan-heavy pricing rollup. One pass over
    lineitem with the ship-date filter pushed to the scan; five
    map-side-combinable BIGINT sums per (returnflag, linestatus);
    averages as integer division on the same grids (avg qty/price in
    cents, avg discount in basis points)."""
    li = lineitem.where(
        F.col("l_shipdate") <= F.expr(f"TIMESTAMP '{cutoff} 00:00:00'"))
    qty = F.expr(CENTS.format(c="l_quantity"))
    base = F.expr(CENTS.format(c="l_extendedprice"))
    dpct = F.expr(PCT.format(c="l_discount"))
    tpct = F.expr(PCT.format(c="l_tax"))
    agg = (
        li.select(
            "l_returnflag", "l_linestatus",
            qty.alias("qc"), base.alias("bc"), dpct.alias("dp"),
            (base * (100 - dpct)).alias("de4"),
            (base * (100 - dpct) * (100 + tpct)).alias("ce6"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qc").cast("long").alias("sum_qty_cents"),
            F.sum("bc").cast("long").alias("sum_base_cents"),
            F.sum("de4").cast("long").alias("sum_disc_e4"),
            F.sum("ce6").cast("long").alias("sum_charge_e6"),
            F.sum("dp").cast("long").alias("sum_disc_pct"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    return agg.select(
        "l_returnflag", "l_linestatus",
        "sum_qty_cents", "sum_base_cents", "sum_disc_e4", "sum_charge_e6",
        F.expr("sum_qty_cents DIV n_rows").cast("long").alias("avg_qty_cents"),
        F.expr("sum_base_cents DIV n_rows").cast("long")
        .alias("avg_price_cents"),
        F.expr("sum_disc_pct * 100 DIV n_rows").cast("long")
        .alias("avg_disc_bp"),
        "n_rows",
    )


def top_unshipped_orders(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, segment: str = "BUILDING",
                         asof: str = "1998-01-01", k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: top-k open-order revenue for one market segment.
    The segment-filtered customer keylist broadcasts into the orders
    scan (a broadcast semi-ish inner join that prunes orders before the
    fact-fact shuffle); lineitem joins orders on the shuffle key; the
    top-k is a TakeOrdered on the unique total order (revenue DESC,
    orderkey ASC) — no global window."""
    seg = customer.where(F.col("c_mktsegment") == segment) \
        .select("c_custkey")
    o = orders.where(
        F.col("o_orderdate") < F.expr(f"TIMESTAMP '{asof} 00:00:00'"))
    li = lineitem.where(
        F.col("l_shipdate") > F.expr(f"TIMESTAMP '{asof} 00:00:00'"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(seg), o.o_custkey == seg.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev_e4()).cast("long").alias("revenue_e4"))
    )
    return (
        j.orderBy(F.col("revenue_e4").desc(), F.col("l_orderkey"))
        .limit(k)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority", "revenue_e4",
        )
    )


def late_ship_priority(orders: DataFrame, lineitem: DataFrame,
                       d0: str = "1997-07-01",
                       d1: str = "1997-10-01") -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter having at least one line
    shipped more than 30 days after the order date, counted by
    priority. Declared as a LEFT SEMI join (EXISTS), so Spark plans
    the existence probe without materializing the match multiplicity —
    the correct shape when lineitem is the 4x-bigger side."""
    o = orders.where(
        (F.col("o_orderdate") >= F.expr(f"TIMESTAMP '{d0} 00:00:00'"))
        & (F.col("o_orderdate") < F.expr(f"TIMESTAMP '{d1} 00:00:00'")))
    cond = (lineitem.l_orderkey == o.o_orderkey) & (
        lineitem.l_shipdate > F.expr("o_orderdate + INTERVAL '30' DAY"))
    sem = o.join(lineitem, on=cond, how="left_semi")
    return (
        sem.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


def local_supplier_volume(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          orders: DataFrame, lineitem: DataFrame,
                          r_name: str = "ASIA", y0: str = "1996-01-01",
                          y1: str = "1997-01-01") -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier
    share the nation, one region, one year. region/nation/supplier are
    genuinely small at every scale factor and broadcast; customer joins
    on the o_custkey shuffle key (it does NOT broadcast at warehouse
    scale); the c_nationkey = s_nationkey locality condition rides the
    broadcast supplier join."""
    dim = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == r_name)),
            nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    o = orders.where(
        (F.col("o_orderdate") >= F.expr(f"TIMESTAMP '{y0} 00:00:00'"))
        & (F.col("o_orderdate") < F.expr(f"TIMESTAMP '{y1} 00:00:00'")))
    j = (
        lineitem.join(o, lineitem.l_orderkey == o.o_orderkey)
        .join(customer, o.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == customer.c_nationkey))
        .join(F.broadcast(dim), supplier.s_nationkey == dim.n_nationkey)
    )
    return (
        j.groupBy("n_name")
        .agg(F.sum(_rev_e4()).cast("long").alias("revenue_e4"),
             F.count(F.lit(1)).cast("long").alias("n_lines"))
    )


def customer_order_distribution(customer: DataFrame,
                                orders: DataFrame,
                                excl_priority: str = "4-NOT SPECIFIED"
                                ) -> DataFrame:
    """TPC-H Q13 shape: the distribution of customers by order count,
    zero-order customers included. A LEFT OUTER join (customers with
    no orders survive with a NULL key the count skips), then the
    double aggregation — per-customer counts, then the count-of-counts
    histogram (bounded by the max order count)."""
    o = orders.where(F.col("o_orderpriority") != excl_priority) \
        .select("o_custkey", "o_orderkey")
    per_cust = (
        customer.select("c_custkey")
        .join(o, customer.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


def promo_revenue_share(part: DataFrame, lineitem: DataFrame,
                        y0: str = "1997-01-01",
                        y1: str = "1998-01-01") -> DataFrame:
    """TPC-H Q14 shape: monthly promo-revenue share. part broadcasts
    (the part dim is orders-of-magnitude below the fact table at every
    SF); the conditional and total sums ride ONE grouped aggregate; the
    share is exact ppm integer division."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.expr(f"TIMESTAMP '{y0} 00:00:00'"))
        & (F.col("l_shipdate") < F.expr(f"TIMESTAMP '{y1} 00:00:00'")))
    j = li.join(F.broadcast(part.select("p_partkey", "p_type")),
                li.l_partkey == part.p_partkey)
    rev = _rev_e4()
    agg = (
        j.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            .cast("long").alias("promo_e4"),
            F.sum(rev).cast("long").alias("total_e4"),
        )
    )
    return agg.select(
        "month", "promo_e4", "total_e4",
        F.expr("promo_e4 * 1000000 DIV total_e4").cast("long")
        .alias("promo_share_ppm"),
    )


def small_qty_revenue_by_brand(part: DataFrame,
                               lineitem: DataFrame) -> DataFrame:
    """TPC-H Q17 shape generalized to all brands: revenue carried by
    lines whose quantity is below 20% of that part's average quantity
    (5 x qty x cnt < sum_qty on the exact cents grid — the avg never
    materializes as a double). The per-part aggregate is a join-back:
    grouped once on partkey, re-joined to lineitem on the same shuffle
    key (co-partitioned, no second shuffle under AQE), brand rollup via
    the broadcast part dim."""
    qty = F.expr(CENTS.format(c="l_quantity"))
    base = F.expr(CENTS.format(c="l_extendedprice"))
    pq = (
        lineitem.groupBy("l_partkey")
        .agg(F.sum(qty).cast("long").alias("sum_q"),
             F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    small = (
        lineitem.join(pq, "l_partkey")
        .where(qty * 5 * F.col("cnt") < F.col("sum_q"))
    )
    out = small.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        small.l_partkey == part.p_partkey)
    return (
        out.groupBy("p_brand")
        .agg(F.sum(base).cast("long").alias("small_rev_cents"),
             F.count(F.lit(1)).cast("long").alias("n_small_lines"))
    )


def top_orders_per_customer(orders: DataFrame, k: int = 2) -> DataFrame:
    """Top-k orders per customer by total price: the PARTITIONED top-N
    window (contrast with top_unshipped_orders' global TakeOrdered) —
    rank runs inside each customer partition after one shuffle on
    custkey, so parallelism scales with the customer count. Unique
    total order (price cents DESC, orderkey ASC) makes the rank
    deterministic under ties."""
    cents = F.expr(CENTS.format(c="o_totalprice"))
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("price_cents").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            cents.alias("price_cents"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _quartile_edges(per_cust: DataFrame, metric: str) -> DataFrame:
    """Exact type-1 quartile edges (positions ceil(k*n/4), k=1..3) of
    one per-customer metric via the histogram + cumulative-window +
    inverted-CDF-min pattern (same discipline as
    text_analysis.length_quantiles): the stream-sized work is one
    grouped count; the window runs over the bounded distinct-value
    table. Returns one row: (t1, t2, t3).

    Scale note: recency/frequency domains are intrinsically bounded
    (days, small counts); an unbounded-domain metric (monetary) should
    be coarsened to a wider grid (whole dollars / e3) before the
    histogram when customer cardinality makes the distinct-value table
    itself stream-sized — same thresholds discipline, bounded window
    input."""
    hist = per_cust.groupBy(F.col(metric).alias("v")) \
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum = hist.select(
        "v",
        F.sum("c").over(
            Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                            Window.currentRow))
        .cast("long").alias("cum"))
    tot = hist.agg(F.sum("c").cast("long").alias("n"))
    pos = tot.select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("kq"),
        F.col("n")).select(
        "kq", F.expr("CAST((kq * n + 3) DIV 4 AS BIGINT)").alias("pos"))
    edges = (
        cum.crossJoin(F.broadcast(pos))
        .where(F.col("cum") >= F.col("pos"))
        .groupBy("kq").agg(F.min("v").alias("t"))
    )
    return edges.groupBy().pivot("kq", [1, 2, 3]).agg(F.first("t")) \
        .select(F.col("1").alias("t1"), F.col("2").alias("t2"),
                F.col("3").alias("t3"))


def rfm_segments(orders: DataFrame) -> DataFrame:
    """RFM segmentation over the orders fact: per-customer recency
    (days since last order vs the corpus max date), frequency (order
    count), monetary (lifetime cents), each bucketed 1..4 by exact
    quartile THRESHOLDS — bucket = 1 + (m > t1) + (m > t2) + (m > t3),
    ties share a bucket — instead of a global row_number (a
    single-task window at scale). The three edge tables are one-row
    broadcasts; the per-customer pass is one grouped aggregate."""
    cents = F.expr(CENTS.format(c="o_totalprice"))
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    per_cust = (
        orders.crossJoin(F.broadcast(ref))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff("ref_date", "o_orderdate")).cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(cents).cast("long").alias("monetary_cents"),
        )
        .localCheckpoint(eager=False)
    )
    out = per_cust
    for m, b in (("recency_days", "r_bucket"), ("frequency", "f_bucket"),
                 ("monetary_cents", "m_bucket")):
        e = _quartile_edges(per_cust, m)
        out = out.crossJoin(F.broadcast(e)).withColumn(
            b,
            (F.lit(1) + (F.col(m) > F.col("t1")).cast("int")
             + (F.col(m) > F.col("t2")).cast("int")
             + (F.col(m) > F.col("t3")).cast("int")).cast("long"),
        ).drop("t1", "t2", "t3")
    return out.withColumn(
        "rfm_code",
        F.expr("r_bucket * 100 + f_bucket * 10 + m_bucket").cast("long"))


def merge_upsert_plan(orders: DataFrame, t1: str = "1999-01-01",
                      t2: str = "2000-01-01") -> DataFrame:
    """MERGE INTO classification plan: the target (per-customer spend
    snapshot before t1) full-outer-joined to the source batch (orders
    in [t1, t2)), each key classified insert / update / keep with the
    post-merge state — the row-level dry-run a lakehouse MERGE
    executes before writing. One shuffle on the merge key; AQE handles
    the skewed-customer case; at scale the source side is the small
    one and broadcasts."""
    cents = F.expr(CENTS.format(c="o_totalprice"))
    tgt = (
        orders.where(
            F.col("o_orderdate") < F.expr(f"TIMESTAMP '{t1} 00:00:00'"))
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.sum(cents).cast("long").alias("total_before"),
             F.count(F.lit(1)).cast("long").alias("n_before"))
    )
    src = (
        orders.where(
            (F.col("o_orderdate") >= F.expr(f"TIMESTAMP '{t1} 00:00:00'"))
            & (F.col("o_orderdate") < F.expr(f"TIMESTAMP '{t2} 00:00:00'")))
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.sum(cents).cast("long").alias("delta_cents"),
             F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    j = tgt.join(src, "key", "full_outer")
    return j.select(
        F.col("key").alias("o_custkey"),
        F.when(F.col("total_before").isNull(), F.lit("insert"))
        .when(F.col("delta_cents").isNull(), F.lit("keep"))
        .otherwise(F.lit("update")).alias("action"),
        F.coalesce("n_before", F.lit(0)).cast("long").alias("n_before"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        (F.coalesce("total_before", F.lit(0))
         + F.coalesce("delta_cents", F.lit(0))).cast("long")
        .alias("total_cents_after"),
    )


def returned_item_revenue(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: the top-k customers by revenue lost to
    returned items — the join-back ranking every returns/abuse review
    starts from. The returnflag filter is pushed into the lineitem
    scan (the R rows are a small fraction of the fact table), the
    surviving rows aggregate to per-order revenue BEFORE touching
    orders (pre-aggregation shrinks the fact-fact shuffle to one row
    per returned order), then join orders -> customer and roll up per
    customer. Revenue rides the e4 grid (cents x (100 - disc pct)),
    so every sum is an order-independent BIGINT; the top-k is a
    TakeOrdered on the unique (revenue DESC, custkey) order, never a
    global window."""
    rev = F.expr(f"{CENTS.format(c='l_extendedprice')}"
                 f" * (100 - {PCT.format(c='l_discount')})")
    per_order = (
        lineitem.where(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.sum(rev).cast("long").alias("rev_e4"))
    )
    per_cust = (
        per_order
        .join(orders.select("o_orderkey", "o_custkey"),
              per_order.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_e4").cast("long").alias("revenue_e4"),
             F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    return (
        per_cust
        .join(customer.select("c_custkey", "c_name", "c_mktsegment"),
              per_cust.o_custkey == customer.c_custkey)
        .select("c_custkey", "c_name", "c_mktsegment", "n_orders",
                "revenue_e4")
        .orderBy(F.col("revenue_e4").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def top_supplier_quarter(supplier: DataFrame, lineitem: DataFrame,
                         start: str = "1997-07-01",
                         end: str = "1997-10-01") -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    ship-date quarter — including the tie semantics the original view
    formulation has (every supplier AT the max is emitted, not an
    arbitrary one). The date filter pushes into the lineitem scan,
    revenue aggregates per supplier on the e4 BIGINT grid, the 1-row
    max broadcasts back for the equality filter, and only the
    surviving row(s) touch the supplier dim."""
    rev = F.expr(f"{CENTS.format(c='l_extendedprice')}"
                 f" * (100 - {PCT.format(c='l_discount')})")
    per_supp = (
        lineitem.where(
            (F.col("l_shipdate") >= F.expr(f"TIMESTAMP '{start} 00:00:00'"))
            & (F.col("l_shipdate") < F.expr(f"TIMESTAMP '{end} 00:00:00'")))
        .groupBy("l_suppkey")
        .agg(F.sum(rev).cast("long").alias("total_rev_e4"))
        .localCheckpoint(eager=False)  # feeds the max AND the filter
    )
    mx = F.broadcast(per_supp.agg(
        F.max("total_rev_e4").alias("_mx")))
    return (
        per_supp.crossJoin(mx)
        .where(F.col("total_rev_e4") == F.col("_mx"))
        .join(supplier.select("s_suppkey", "s_name"),
              per_supp.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_e4")
    )


def big_orders(customer: DataFrame, orders: DataFrame,
               lineitem: DataFrame, qty_cents_min: int = 20000) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — the group-filter-joinback
    pattern (HAVING on a fact aggregate, then enrich survivors from
    the dims). Per-order quantity aggregates on the cents grid
    map-side FIRST; only orders beating ``qty_cents_min`` (the HAVING
    floor) join back to orders and customer, so the dim joins see a
    filtered fraction of the fact table, not all of it. Output sorted
    semantics live in the caller; rows carry the exact BIGINT grids."""
    qty = F.expr(CENTS.format(c="l_quantity"))
    per_order = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(qty).cast("long").alias("sum_qty_cents"))
        .where(F.col("sum_qty_cents") > int(qty_cents_min))
    )
    return (
        per_order
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"),
              per_order.l_orderkey == orders.o_orderkey)
        .join(customer.select("c_custkey", "c_name"),
              orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.expr(CENTS.format(c="o_totalprice")).cast("long")
            .alias("totalprice_cents"),
            "sum_qty_cents",
        )
    )


def volume_shipping(nation: DataFrame, customer: DataFrame,
                    supplier: DataFrame, orders: DataFrame,
                    lineitem: DataFrame,
                    nation_a: str = "NATION_13", nation_b: str = "NATION_19",
                    y0: str = "1996-01-01", y1: str = "1998-01-01") -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    ship year. Both nation filters push into the BROADCAST dims before
    the fact-fact shuffle: supplier⋈nation(A|B) broadcasts into
    lineitem (killing most of the fact scan early), customer⋈nation
    broadcasts into orders, and only then do the two pre-filtered fact
    sides shuffle on orderkey. The (A,B)|(B,A) direction residual is a
    cheap string inequality on already-joined rows. Revenue rides the
    exact e4 grid; the year is extracted once, post-filter."""
    nat = nation.where(F.col("n_name").isin([nation_a, nation_b])) \
                .select("n_nationkey", "n_name")
    sup = supplier.join(F.broadcast(nat),
                        supplier.s_nationkey == nat.n_nationkey) \
                  .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cus = customer.join(F.broadcast(nat),
                        customer.c_nationkey == nat.n_nationkey) \
                  .select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = lineitem.where(
        (F.col("l_shipdate") >= F.expr(f"TIMESTAMP '{y0} 00:00:00'"))
        & (F.col("l_shipdate") < F.expr(f"TIMESTAMP '{y1} 00:00:00'")))
    li = li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
    ords = orders.join(cus, orders.o_custkey == cus.c_custkey) \
                 .select("o_orderkey", "cust_nation")
    j = li.join(ords, li.l_orderkey == ords.o_orderkey).where(
        ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
        | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a)))
    return (
        j.groupBy("supp_nation", "cust_nation",
                  F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(_rev_e4()).cast("long").alias("revenue_e4"),
             F.count(F.lit(1)).cast("long").alias("n_lines"))
    )


def market_share(region: DataFrame, nation: DataFrame, customer: DataFrame,
                 supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                 part: DataFrame, target_nation: str = "NATION_1",
                 region_name: str = "ASIA", part_type: str = "ECONOMY",
                 y0: str = "1996-01-01", y1: str = "1998-01-01") -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's
    revenue in one part type, per order year. The most selective
    filter (p_type) broadcasts into the fact scan FIRST; the
    customer-region membership rides a broadcast nation⋈region keylist
    into orders; the supplier nation label is a broadcast rename. The
    share never materializes a double until the final ppm division —
    conditional and total e4 sums ride ONE grouped aggregate (no
    second pass, no self-join)."""
    pt = part.where(F.col("p_type") == part_type).select("p_partkey")
    rnat = nation.join(F.broadcast(region.where(F.col("r_name") == region_name)
                                   .select("r_regionkey")),
                       nation.n_regionkey == region.r_regionkey) \
                 .select("n_nationkey")
    cus = customer.join(F.broadcast(rnat),
                        customer.c_nationkey == rnat.n_nationkey) \
                  .select("c_custkey")
    ords = orders.where(
        (F.col("o_orderdate") >= F.expr(f"TIMESTAMP '{y0} 00:00:00'"))
        & (F.col("o_orderdate") < F.expr(f"TIMESTAMP '{y1} 00:00:00'")))
    ords = ords.join(cus, ords.o_custkey == cus.c_custkey) \
               .select("o_orderkey", "o_orderdate")
    sup = supplier.join(F.broadcast(nation.select("n_nationkey", "n_name")),
                        supplier.s_nationkey == nation.n_nationkey) \
                  .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = lineitem.join(F.broadcast(pt), lineitem.l_partkey == pt.p_partkey) \
                 .join(F.broadcast(sup), lineitem.l_suppkey == sup.s_suppkey)
    j = li.join(ords, li.l_orderkey == ords.o_orderkey)
    rev = _rev_e4()
    agg = (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == target_nation, rev)
                  .otherwise(F.lit(0))).cast("long").alias("nation_e4"),
            F.sum(rev).cast("long").alias("total_e4"),
        )
    )
    return agg.select(
        "o_year", "nation_e4", "total_e4",
        F.expr("nation_e4 * 1000000 DIV total_e4").cast("long")
        .alias("mkt_share_ppm"),
    )


# (brand, max p_size, qty lo, qty hi) disjunct classes — Q19's three OR-arms
# restated over the columns this corpus carries (no container/shipmode).
DISJUNCT_CLASSES = (
    ("Brand#12", 15, 1, 11),
    ("Brand#23", 25, 10, 20),
    ("Brand#3", 50, 20, 30),
)


def disjunctive_revenue(part: DataFrame, lineitem: DataFrame,
                        classes: tuple = DISJUNCT_CLASSES) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both sides of a join. The per-side halves of each disjunct are
    pushed INTO their scans before the join (the union-of-brands
    filter prunes part; the union-of-quantity-ranges filter prunes
    lineitem) — Catalyst derives neither cross-side residual on its
    own, so the operator states them explicitly; the exact class
    membership is resolved post-join as a CASE over already-pruned
    rows. One row per disjunct class keeps the readout thresholdable."""
    brands = [c[0] for c in classes]
    qlo = min(c[2] for c in classes)
    qhi = max(c[3] for c in classes)
    qty = F.expr(CENTS.format(c="l_quantity"))
    p = part.where(F.col("p_brand").isin(brands)) \
            .select("p_partkey", "p_brand", "p_size")
    li = lineitem.where((qty >= qlo * 100) & (qty <= qhi * 100)) \
                 .select("l_partkey", "l_quantity", "l_extendedprice",
                         "l_discount")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cls = F.lit(None).cast("long")
    for i, (brand, size_hi, lo, hi) in reversed(list(enumerate(classes))):
        cls = F.when((F.col("p_brand") == brand)
                     & (F.col("p_size") >= 1) & (F.col("p_size") <= size_hi)
                     & (qty >= lo * 100) & (qty <= hi * 100),
                     F.lit(i + 1)).otherwise(cls)
    return (
        j.select(cls.alias("disjunct_class"), "l_extendedprice", "l_discount")
        .where(F.col("disjunct_class").isNotNull())
        .groupBy("disjunct_class")
        .agg(F.sum(_rev_e4()).cast("long").alias("revenue_e4"),
             F.count(F.lit(1)).cast("long").alias("n_lines"))
    )


def prospect_balance(customer: DataFrame, orders: DataFrame,
                     nation: DataFrame,
                     cutoff: str = "2000-01-01") -> DataFrame:
    """TPC-H Q22 shape restated over the columns this corpus carries
    (no phone country codes): dormant high-balance prospects — the
    customers whose account balance strictly exceeds the mean POSITIVE
    balance yet who placed no order at/after ``cutoff`` — rolled up by
    nation. The above-average filter is the exact cross-multiplied
    integer comparison cents * n_pos > sum_pos_cents (no division, no
    float mean), so the cohort boundary is deterministic in any engine.

    Scale shape: one conditional-aggregate pass over customer for the
    global mean (1-row broadcast), the dormancy probe as a LEFT ANTI
    join against the distinct recent-orderer keys (shuffled on
    custkey — the natural co-partition; bucket both sides by custkey
    at scale), nation as a broadcast dim."""
    pos = customer.where("c_acctbal > 0.0").select(
        "c_custkey", "c_nationkey",
        F.expr(CENTS.format(c="c_acctbal")).alias("cents"))
    st = F.broadcast(pos.agg(
        F.count(F.lit(1)).cast("long").alias("n_pos"),
        F.sum("cents").cast("long").alias("s_pos")))
    rich = (pos.crossJoin(st)
            .where(F.expr("cents * n_pos > s_pos"))
            .drop("n_pos", "s_pos"))
    recent = (orders
              .where(f"o_orderdate >= TIMESTAMP '{cutoff} 00:00:00'")
              .select(F.col("o_custkey").alias("c_custkey"))
              .distinct())
    dormant = rich.join(recent, "c_custkey", "left_anti")
    return (
        dormant
        .join(F.broadcast(nation.select(
            F.col("n_nationkey").alias("c_nationkey"), "n_name")),
            "c_nationkey")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cust"),
             F.sum("cents").cast("long").alias("total_cents"))
    )


def waiting_suppliers(supplier: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, late_days: int = 90,
                      k: int = 20) -> DataFrame:
    """TPC-H Q21 shape restated over the columns this corpus carries
    (no receipt/commit dates): for finalized ('F') multi-supplier
    orders where EXACTLY ONE supplier shipped more than ``late_days``
    after the order date, charge that supplier with the wait; top-k
    suppliers by orders kept waiting, (numwait DESC, s_suppkey) total
    order. The classic EXISTS / NOT EXISTS pair collapses into ONE
    per-order grouped aggregate: distinct-supplier count, distinct
    LATE-supplier count, and min(late supplier) — which IS the blamed
    supplier whenever the distinct late count is exactly 1.

    Scale shape: one lineitem->orders join shuffled on orderkey (the
    natural co-partition; bucket both by orderkey at scale), one
    two-phase distinct aggregate per order, a tiny per-supplier count,
    supplier as a broadcast dim, TakeOrdered top-k."""
    j = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders.where("o_orderstatus = 'F'")
              .select(F.col("o_orderkey").alias("l_orderkey"),
                      "o_orderdate"), "l_orderkey")
        .withColumn("late", F.expr(
            f"CAST(l_shipdate > o_orderdate + INTERVAL {int(late_days)} DAY"
            f" AS INT)"))
    )
    per_order = (
        j.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supps"),
             F.countDistinct(
                 F.expr("CASE WHEN late = 1 THEN l_suppkey END"))
             .alias("n_late"),
             F.min(F.expr("CASE WHEN late = 1 THEN l_suppkey END"))
             .alias("s_suppkey"))
    )
    return (
        per_order.where("n_supps >= 2 AND n_late = 1")
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              "s_suppkey")
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(k)
    )


def important_parts(part: DataFrame, lineitem: DataFrame,
                    threshold_bp: int = 15) -> DataFrame:
    """TPC-H Q11 shape (adapted: no partsupp table in this corpus —
    part "value" is its discounted lineitem revenue): parts whose
    revenue exceeds ``threshold_bp`` basis points of GLOBAL revenue —
    the group-HAVING-against-a-scalar-subquery pattern, the one
    warehouse shape the lane was still missing.

    Scale shape: per-part revenue is ONE map-side-combined BIGINT sum
    over lineitem; the global total is a 1-row aggregate of the SAME
    per-part table (no second corpus scan) carried by broadcast
    cross-join into the filter; the part dim joins broadcast. All
    arithmetic on the e4 grid, share as integer-division ppm."""
    per_part = (
        lineitem
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_rev_e4()).cast("long").alias("value_e4"))
        .localCheckpoint(eager=False)  # feeds the total AND the filter
    )
    total = per_part.agg(
        F.sum("value_e4").cast("long").alias("total_e4"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.expr(f"value_e4 * 10000 > total_e4 * {int(threshold_bp)}"))
        .join(F.broadcast(part.select("p_partkey", "p_brand")), "p_partkey")
        .select(
            "p_partkey", "p_brand", "value_e4",
            F.expr("value_e4 * 1000000 DIV total_e4").cast("long")
            .alias("share_ppm"))
    )


def shipping_delay(orders: DataFrame, lineitem: DataFrame,
                   bucket_days: int = 30) -> DataFrame:
    """TPC-H Q12 shape (adapted: this corpus has no commit/receipt
    dates or ship modes, so the lateness dimension is the order-to-
    ship delay bucketed in ``bucket_days`` steps, capped at bucket 3 =
    "> 3 buckets"): per delay bucket, the conditional census of
    URGENT/HIGH-priority lines vs the rest — Q12's exact
    CASE-sum-after-fact-fact-join pattern.

    Scale shape: ONE orderkey-shuffled join between the two fact
    tables (only o_orderpriority + o_orderdate carried from orders;
    AQE picks the join strategy), then a 4-row grouped aggregate of
    BIGINT conditional counts — map-side combined, order-independent.
    Delay arithmetic is day-exact integer math (datediff, floor-div),
    never float."""
    j = lineitem.select("l_orderkey", "l_shipdate").join(
        orders.select(F.col("o_orderkey").alias("l_orderkey"),
                      "o_orderpriority", "o_orderdate"),
        "l_orderkey")
    bucket = F.expr(
        "CAST(least(CAST(greatest(datediff(l_shipdate, o_orderdate), 0)"
        f" AS BIGINT) DIV {int(bucket_days)}, 3) AS BIGINT)")
    urgent = F.expr("CAST(o_orderpriority IN ('1-URGENT', '2-HIGH')"
                    " AS BIGINT)")
    return (
        j.select(bucket.alias("delay_bucket"), urgent.alias("u"))
        .groupBy("delay_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lines"),
             F.sum("u").cast("long").alias("n_urgent"))
        .select(
            "delay_bucket", "n_lines", "n_urgent",
            (F.col("n_lines") - F.col("n_urgent")).cast("long")
            .alias("n_other"),
            F.expr("n_urgent * 1000000 DIV n_lines").cast("long")
            .alias("urgent_ppm"))
    )


def min_cost_supplier(part: DataFrame, supplier: DataFrame,
                      lineitem: DataFrame, nation: DataFrame,
                      region: DataFrame, region_name: str = "EUROPE",
                      max_size: int = 25) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table in this corpus —
    a supplier's "cost" for a part is the minimum unit price it ever
    charged on a lineitem): for every qualifying part, the regional
    supplier(s) achieving the GLOBAL minimum unit cost — the
    correlated-min-subquery join-back pattern.

    Unit price lives on the cents-per-unit grid: cents * 100 DIV
    qty_e2 (both factors on the e2 grid; qty >= 1 so qty_e2 >= 100 and
    the division is well-defined integer math in both engines).

    Scale shape: the only corpus-sized pass is the per-(part,supp)
    grouped MIN over lineitem (map-side combined); the per-part global
    min is a second agg of that already-small table, joined back on
    partkey (AQE); supplier->nation->region is one broadcast chain and
    the part dim joins broadcast after its size filter."""
    sup_region = (
        supplier
        .join(F.broadcast(nation.select(
            F.col("n_nationkey").alias("s_nationkey"), "n_name",
            "n_regionkey")), "s_nationkey")
        .join(F.broadcast(region.where(F.col("r_name") == region_name)
                          .select("r_regionkey")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    unit = F.expr(
        f"{CENTS.format(c='l_extendedprice')} * 100"
        f" DIV {CENTS.format(c='l_quantity')}")
    qual_parts = F.broadcast(
        part.where(F.col("p_size") <= max_size)
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_size"))
    per_ps = (
        lineitem
        .where(F.expr(f"{CENTS.format(c='l_quantity')} > 0"))
        .join(qual_parts, "l_partkey")  # both dims pruned BEFORE the
        .join(F.broadcast(sup_region.withColumnRenamed(
            "s_suppkey", "l_suppkey")), "l_suppkey")  # grouped min
        .groupBy(F.col("l_partkey").alias("p_partkey"), "p_brand",
                 "p_size", F.col("l_suppkey").alias("s_suppkey"),
                 "s_name", "n_name")
        .agg(F.min(unit).cast("long").alias("unit_cents"))
    )
    best = (per_ps.groupBy("p_partkey")
            .agg(F.min("unit_cents").cast("long").alias("min_cents")))
    return (
        per_ps
        .join(best, "p_partkey")
        .where(F.col("unit_cents") == F.col("min_cents"))
        .select("p_partkey", "p_brand", "p_size", "s_suppkey", "s_name",
                "n_name", "min_cents")
    )


def product_profit(part: DataFrame, supplier: DataFrame,
                   lineitem: DataFrame, orders: DataFrame,
                   nation: DataFrame, type_name: str = "ECONOMY") -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp supplycost — the cost
    proxy is 50% of the part's retail price per unit): profit by
    (supplier nation, order year) for one part type — the widest
    star join in the suite (lineitem x part x supplier x nation x
    orders) with a two-term profit expression.

    Grids: revenue on e4 (cents x (100-disc)); cost on the SAME e4
    grid as retail_cents x qty_e2 DIV 2 (cents x centi-units halved),
    so profit is a pure BIGINT difference summed per group.

    Scale shape: part (filtered to one type), supplier, and nation all
    broadcast into the lineitem scan; the single shuffle-shuffle join
    is lineitem x orders on orderkey (only o_orderdate carried); the
    final rollup is a tiny (nation x year) grouped sum, map-side
    combined."""
    profit = F.expr(
        f"{CENTS.format(c='l_extendedprice')}"
        f" * (100 - {PCT.format(c='l_discount')})"
        f" - p_retail_cents * {CENTS.format(c='l_quantity')} DIV 2")
    p = (part.where(F.col("p_type") == type_name)
         .select("p_partkey",
                 F.expr(CENTS.format(c="p_retailprice"))
                 .alias("p_retail_cents")))
    s = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nationkey"),
                                  "n_name")),
        "s_nationkey").select("s_suppkey", "n_name")
    return (
        lineitem
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                            "o_orderdate"), "l_orderkey")
        .select("n_name", F.year("o_orderdate").cast("long").alias("o_year"),
                profit.cast("long").alias("profit_e4"))
        .groupBy("n_name", "o_year")
        .agg(F.sum("profit_e4").cast("long").alias("sum_profit_e4"))
    )


def supplier_census(part: DataFrame, lineitem: DataFrame,
                    excluded_type: str = "PROMO",
                    complaint_pct: int = 33) -> DataFrame:
    """TPC-H Q16 shape (adapted: the "customer complaints" exclusion
    list is derived from the data — suppliers whose returned-line
    share exceeds ``complaint_pct`` percent — 33 sits at the corpus mean
    so the census splits non-degenerately at every SF): per (p_brand, p_size),
    how many DISTINCT non-excluded suppliers ever shipped such a part,
    with one part type excluded outright — the
    distinct-count-census-with-NOT-IN-subquery pattern.

    Scale shape: exact distinct via the two-stage shape (group by
    (brand, size, suppkey) first — map-side combined — then count the
    survivors per (brand, size)), never a single-stage countDistinct
    over the corpus; the complaint list is a tiny per-supplier
    aggregate applied as a broadcast anti-join; the part dim joins
    broadcast after its type filter."""
    complained = (
        lineitem
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum(F.expr("CAST(l_returnflag = 'R' AS BIGINT)"))
             .cast("long").alias("n_ret"))
        .where(F.expr(f"n_ret * 100 > n * {int(complaint_pct)}"))
        .select("l_suppkey")
    )
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(complained), "l_suppkey", "left_anti")
        .join(F.broadcast(part.where(F.col("p_type") != excluded_type)
                          .select(F.col("p_partkey").alias("l_partkey"),
                                  "p_brand", "p_size")),
              "l_partkey")
        .select("p_brand", "p_size", "l_suppkey").distinct()
        .groupBy("p_brand", "p_size")
        .agg(F.count(F.lit(1)).cast("long").alias("supplier_cnt"))
    )


def promo_suppliers(supplier: DataFrame, part: DataFrame,
                    lineitem: DataFrame, name_prefix: str = "blue ",
                    year: int = 1995,
                    share_bp: int = 2500) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp/availqty in this corpus —
    "excess stock" is restated as DOMINANT SHIPPER: a supplier
    qualifies for a part when their shipped quantity of that part in
    the ``year`` window exceeds ``share_bp`` basis points of ALL
    suppliers' shipped quantity of it): suppliers holding at least one
    dominated part among parts whose name starts with ``name_prefix``,
    with the dominated-part count and the supplier's best share — the
    nested prefix-semi-join + correlated share-of-total threshold
    pattern, the last of the 22 TPC-H query shapes this lane was
    missing (reference parity anchor: the reference's ablation driver
    enumerates config combos the same exhaustive way,
    deepref/framework/train.py:91-124 — this is the warehouse twin).

    Scale shape: the part prefix filter broadcasts into the lineitem
    scan (predicate + semi-join pushdown, so only matching parts'
    lines survive the first shuffle); per-(part, supplier) quantities
    are ONE map-side-combined BIGINT sum on the e2 grid; the per-part
    total reuses that aggregate (grouped again on part — no second
    corpus scan); the share threshold is a pure integer cross-product
    (sq * 10000 > tq * share_bp, no division); supplier dim joins
    broadcast at the end. Dominance is per-part bounded (shares sum
    to 1), so no skew salting is needed even for hot parts."""
    matched = part.where(
        F.col("p_name").startswith(name_prefix)).select("p_partkey")
    per = (
        lineitem
        .where(F.expr(
            f"l_shipdate >= TIMESTAMP '{int(year)}-01-01 00:00:00' AND "
            f"l_shipdate < TIMESTAMP '{int(year) + 1}-01-01 00:00:00'"))
        .join(F.broadcast(matched),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.expr(CENTS.format(c="l_quantity"))).cast("long")
             .alias("sq"))
        .localCheckpoint(eager=False)  # feeds the total AND the filter
    )
    tot = per.groupBy("l_partkey").agg(
        F.sum("sq").cast("long").alias("tq"))
    dominated = (
        per.join(tot, "l_partkey")
        .where(F.expr(f"sq * 10000 > tq * {int(share_bp)}"))
        .withColumn("share_bp_val",
                    F.expr("sq * 10000 DIV tq").cast("long"))
    )
    return (
        dominated
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"),
             F.max("share_bp_val").cast("long").alias("best_share_bp"),
             F.sum("sq").cast("long").alias("qty_e2"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              "s_suppkey")
        .select("s_suppkey", "s_name", "n_parts", "best_share_bp",
                "qty_e2")
    )


def sales_rollup(lineitem: DataFrame) -> DataFrame:
    """Multi-level pricing rollup via ROLLUP(l_returnflag,
    l_linestatus) — the GROUPING SETS surface a BI cube feeds from
    TPC-H Q1's detail rows: per-(flag, status) rows, per-flag
    subtotals, and the grand total in ONE declared aggregate.
    Catalyst expands the rollup BEFORE the exchange, so every level's
    BIGINT sums combine map-side in the same pass — three levels for
    one scan, no re-aggregation job per level. grouping_id()'s bit
    order (first rollup column = MSB) matches SQL GROUPING(a, b), so
    the oracle replays it verbatim; subtotal rows carry NULL group
    keys in both engines.

    Scale shape: one lineitem scan, one shuffle on the expanded
    grouping-set key (rows x levels on the map side, but combined
    before the wire); output is sum of per-level key cardinalities."""
    qty = F.expr(CENTS.format(c="l_quantity"))
    return (
        lineitem
        .select("l_returnflag", "l_linestatus",
                qty.alias("qc"), _rev_e4().alias("de4"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().cast("long").alias("gid"),
             F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.sum("qc").cast("long").alias("qty_e2"),
             F.sum("de4").cast("long").alias("rev_e4"))
    )


def revenue_delta(lineitem: DataFrame, year: int = 1996,
                  disc_lo: int = 5, disc_hi: int = 7,
                  qty_lt: int = 24) -> DataFrame:
    """TPC-H Q6 shape (relational.revenue_delta): the forecasting
    revenue-change query — total discount revenue that would be
    recovered by eliminating small discounts on low-quantity line
    items shipped in one year. The last of the 22 TPC-H query shapes:
    a pure filter-aggregate with NO join at all, the query class whose
    entire cost is the scan, so the plan test is that every predicate
    reaches the parquet reader (shipdate range + quantity pushed as
    PushedFilters; the discount band is evaluated on the integer grid
    post-scan) and the aggregate combines map-side to a 1-row result.

    Revenue lives on the e4 grid (price cents x discount cents) so the
    sum is an order-independent BIGINT — the oracle replays it
    verbatim; at 100 TB the same expression ports to decimal(38,0).
    """
    disc = F.expr(PCT.format(c="l_discount"))
    rev = F.expr(CENTS.format(c="l_extendedprice")) * disc
    return (
        lineitem
        .where((F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
               & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
               & (F.col("l_quantity") < F.lit(float(qty_lt))))
        .where(disc.between(disc_lo, disc_hi))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.sum(rev).cast("long").alias("rev_e4"))
    )


def churn_matrix(orders: DataFrame, churn_days: int = 365) -> DataFrame:
    """Observed churn rate by (frequency, monetary) RFM segment — the
    segment-level readout an activation team reads off rfm_segments:
    the churn LABEL is recency (> ``churn_days`` since last order vs
    the corpus max date), so recency itself must stay OUT of the
    segmentation axes (bucketing by R would make the table a
    tautology); frequency and monetary are the predictive axes.

    Everything after rfm_segments is one grouped count over the
    per-customer table; rates on the exact ppm grid.
    """
    seg = rfm_segments(orders)
    return (
        seg.groupBy("f_bucket", "m_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             F.sum(F.when(F.col("recency_days") > churn_days, 1)
                   .otherwise(0)).cast("long").alias("n_churned"))
        .select("f_bucket", "m_bucket", "n_customers", "n_churned",
                F.expr("n_churned * 1000000 div n_customers").cast("long")
                .alias("churn_ppm"))
    )
