"""Relational analytics over the star schema — the OLAP leg.

The engine's graph/pipeline operators all consume tables that start as
relational scans; this module carries the representative star-join
rollup (SURVEY §2.5's relational-operator coverage) expressed the way
the 100 TB plan wants it: fact tables scan with pushed filters and
pruned columns, DIMENSION tables broadcast (region/nation/customer are
thousands of rows against billions of lineitems), aggregation is
map-side combined, and money math is done in exact integer CENTS —
sum-of-doubles reassociation never touches the result, so the rollup is
bit-identical to its SQL mirror at any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["revenue_rollup", "value_outliers", "pricing_summary",
           "large_orders", "promo_revenue", "revenue_rollup_totals",
           "trade_volume", "local_supplier_volume", "returned_items",
           "top_supplier", "product_profit", "small_qty_revenue",
           "dormant_customers", "late_shipments", "waiting_suppliers",
           "market_share", "brand_band_revenue", "join_skew_audit",
           "forecast_revenue"]


def _cents(col):
    # exact: prices have <= 2 decimals; round once to kill any parquet
    # double representation dust, then hold as int64 cents
    return F.round(col * 100, 0).cast("long")



def _rev_joined(orders, lineitem, customer, nation, region) -> DataFrame:
    """Shared Q5-shape star join: lineitem revenue units joined through
    orders to the broadcast customer/nation/region dimensions."""
    rev = _cents(F.col("l_extendedprice")) * F.round(
        (F.lit(1.0) - F.col("l_discount")) * 10000, 0
    ).cast("long")
    li = lineitem.select("l_orderkey", rev.alias("rev_u"))
    o = orders.select("o_orderkey", "o_custkey")
    c = customer.select("c_custkey", "c_nationkey")
    n = nation.select("n_nationkey", "n_name", "n_regionkey")
    r = region.select("r_regionkey", "r_name")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )


def revenue_rollup(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """(region, nation, n_orders, revenue) — discounted revenue
    sum(extendedprice * (1 - discount)) per customer nation, the
    TPC-H Q5 join shape.  Revenue is accumulated as integer
    cents*10^4 (discounts have <= 4 decimals) and divided back once at
    read-out; dimensions broadcast."""
    j = _rev_joined(orders, lineitem, customer, nation, region)
    return (
        j.groupBy(F.col("r_name").alias("region"),
                  F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.sum("rev_u").cast("long").alias("rev_u"),
        )
        .select(
            "region", "nation", "n_orders",
            F.round(F.col("rev_u") / F.lit(1e6), 2).alias("revenue"),
        )
    )


def value_outliers(
    events: DataFrame,
    z: float = 3.0,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(event_type, n, mean, std, n_outliers) — per-group z-score
    outlier counts, the numeric data-quality gate of an ingest pipeline.

    mean/std come from sufficient statistics (one map-side-combined
    aggregation — the assortativity discipline) and are ROUNDED 6dp
    BEFORE the |v - mean| > z * std comparison, so the cutoff is
    engine-portable; population std (n denominator), zero variance
    reports 0 outliers."""
    g = events.groupBy(F.col(type_col).alias("event_type")).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("s"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("ss"),
    )
    mean = F.round(F.col("s") / F.col("n"), 6)
    m = F.col("s") / F.col("n")
    var = F.col("ss") / F.col("n") - m * m  # explicit multiply: pow() is
    # not guaranteed bit-equal to x*x across libms
    std = F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6)
    stats = g.select("event_type", F.col("n").cast("long").alias("n"),
                     mean.alias("mean"), std.alias("std"))
    out = (
        events.select(F.col(type_col).alias("event_type"),
                      F.col(value_col).alias("v"))
        .join(F.broadcast(stats), "event_type")
        .where((F.col("std") > 0)
               & (F.abs(F.col("v") - F.col("mean"))
                  > F.lit(z) * F.col("std")))
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_outliers"))
    )
    return stats.join(out, "event_type", "left").select(
        "event_type", "n", "mean", "std",
        F.coalesce("n_outliers", F.lit(0)).cast("long").alias("n_outliers"),
    )


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """(l_returnflag, l_linestatus, sum_qty, sum_base, sum_disc_price,
    sum_charge, avg_qty, avg_price, avg_disc, n) — the TPC-H-Q1-shape
    pricing summary: one filtered scan, one map-side-combined
    aggregation, no joins.

    All money folds are exact integers so double reassociation never
    touches the result: quantities are integral (cast to long), prices
    hold 2 decimals (cents), discount/tax hold 2 decimals (scale 100) —
    disc_price folds at scale 1e4, charge at scale 1e6.  int64 bounds:
    charge units are ~1e11 per row, so a single (flag, status) group
    overflows past ~9e7 rows; at 100 TB fold charge in DECIMAL(38,0) or
    split the fold into (cents x disc) and a second tax multiply —
    documented seam, same trade as style_divergence's double-fold
    fallback.  The averages are one IEEE division each over
    cross-engine-identical integer inputs, rounded 6dp at read-out.

    The shipdate filter pushes to the parquet scan (PushedFilters), and
    ReadSchema carries only the 7 referenced columns.
    """
    c_price = _cents(F.col("l_extendedprice"))
    r_disc = F.round(F.col("l_discount") * 100, 0).cast("long")
    r_tax = F.round(F.col("l_tax") * 100, 0).cast("long")
    g = (
        lineitem.where(
            F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp")
        )
        .select(
            "l_returnflag", "l_linestatus",
            F.col("l_quantity").cast("long").alias("qty"),
            c_price.alias("pc"),
            (c_price * (100 - r_disc)).alias("dp_u"),
            (c_price * (100 - r_disc) * (100 + r_tax)).alias("ch_u"),
            r_disc.alias("dc"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").cast("long").alias("sum_qty"),
            F.sum("pc").cast("long").alias("base_c"),
            F.sum("dp_u").cast("long").alias("dp_u"),
            F.sum("ch_u").cast("long").alias("ch_u"),
            F.sum("dc").cast("long").alias("dc"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    return g.select(
        "l_returnflag", "l_linestatus", "sum_qty",
        F.round(F.col("base_c") / F.lit(100.0), 2).alias("sum_base"),
        F.round(F.col("dp_u") / F.lit(1e4), 2).alias("sum_disc_price"),
        F.round(F.col("ch_u") / F.lit(1e6), 2).alias("sum_charge"),
        F.round(F.col("sum_qty").cast("double") / F.col("n"), 6).alias("avg_qty"),
        F.round(F.col("base_c") / (F.lit(100.0) * F.col("n")), 6).alias("avg_price"),
        F.round(F.col("dc") / (F.lit(100.0) * F.col("n")), 6).alias("avg_disc"),
        "n",
    )


def shipping_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1996-01-01",
    k: int = 10,
) -> DataFrame:
    """(l_orderkey, o_orderdate, o_orderpriority, revenue) — the TPC-H-Q3
    shape: top-``k`` unshipped-revenue orders for one market segment
    (ordered before the cutoff, shipped after it).

    Plan: both date filters push to the parquet scans, the segment-
    filtered customer list broadcasts (a fraction of an already-small
    dimension), revenue folds as exact integer cents x 1e2 discount
    units, and the top-k compiles to TakeOrderedAndProject under the
    TOTAL order (revenue DESC, o_orderdate ASC, l_orderkey ASC) — each
    partition ships k rows, never a global sort.  o_orderdate is
    emitted as a yyyy-MM-dd string (the retention_cohorts portability
    lesson)."""
    rev = _cents(F.col("l_extendedprice")) * F.round(
        (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    cut = F.lit(cutoff).cast("timestamp")
    li = lineitem.where(F.col("l_shipdate") > cut).select(
        "l_orderkey", rev.alias("rev_u")
    )
    o = orders.where(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    g = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum("rev_u").cast("long").alias("rev_u"))
    )
    return (
        g.orderBy(F.desc("rev_u"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(k)
        .select(
            "l_orderkey", "o_orderdate", "o_orderpriority",
            F.round(F.col("rev_u") / F.lit(1e4), 2).alias("revenue"),
        )
    )


def large_orders(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    threshold: int = 200,
) -> DataFrame:
    """(c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
    sum_qty) — the TPC-H-Q18 shape: customers whose single orders total
    more than ``threshold`` quantity units.

    Plan shape is the point: the lineitem aggregation happens FIRST
    (map-side-combined sum per orderkey — the only pass over the fact
    table), the HAVING filter collapses it to a tiny qualifying set
    (~0.5% of orders at threshold=200), and everything after rides
    broadcasts of that small side: qualifying keys broadcast against the
    orders scan, then the enriched qualifying orders broadcast against
    customer.  Customer is never assumed broadcastable — at 100 TB it
    isn't — the SMALL side always moves.  Quantities are integral
    (exact long fold); o_totalprice holds 2 decimals, re-rounded once
    to kill parquet double dust; o_orderdate emits as yyyy-MM-dd text
    (the retention_cohorts portability lesson)."""
    q = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > threshold)
    )
    qual = orders.select(
        "o_orderkey", "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
    ).join(F.broadcast(q), F.col("o_orderkey") == F.col("l_orderkey"))
    return (
        customer.select("c_custkey", "c_name")
        .join(F.broadcast(qual), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", F.col("sum_qty").cast("long").alias("sum_qty"))
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    promo_prefix: str = "PROMO",
) -> DataFrame:
    """(month, promo_rev, total_rev, promo_pct) — the TPC-H-Q14 shape
    per ship month: discounted revenue attributable to promo-class parts
    as a share of all revenue.

    Part is the broadcast dimension (the first operator to exercise the
    lineitem-to-part join); revenue folds as exact integer
    cents x 1e2-discount units so the shares are reassociation-proof,
    promo_pct is ONE IEEE division of exact integers (numerator
    pre-multiplied by 100 as an integer), rounded 6dp at read-out."""
    rev_u = _cents(F.col("l_extendedprice")) * F.round(
        (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    li = lineitem.select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        rev_u.alias("rev_u"),
    )
    p = part.select(
        "p_partkey",
        F.col("p_type").startswith(promo_prefix).alias("is_promo"),
    )
    g = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("month")
        .agg(
            F.sum(F.when(F.col("is_promo"), F.col("rev_u"))
                  .otherwise(F.lit(0))).cast("long").alias("promo_u"),
            F.sum("rev_u").cast("long").alias("total_u"),
        )
    )
    return g.select(
        "month",
        F.round(F.col("promo_u") / F.lit(1e4), 2).alias("promo_rev"),
        F.round(F.col("total_u") / F.lit(1e4), 2).alias("total_rev"),
        F.when(F.col("total_u") > 0,
               F.round((F.lit(100) * F.col("promo_u")) / F.col("total_u"), 6)
               ).alias("promo_pct"),
    )


def revenue_rollup_totals(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """(region, nation, lvl, n_orders, revenue) — the Q5-shape revenue
    rollup with ROLLUP grouping sets: per-(region, nation) rows plus
    per-region subtotals and the grand total in one pass.  ``lvl`` is
    the grouping-id bit pattern (0 = leaf, 1 = region subtotal,
    3 = grand total — ROLLUP never emits 2) — emitted explicitly because rollup marks subtotal keys with NULL,
    and a NULL that MEANS "all nations" must stay distinguishable from
    a (hypothetical) NULL nation value; grouping() is the standard
    disambiguator.

    Plan: Spark compiles rollup to ONE Expand + one aggregation — the
    fact table is scanned once, each row expands to its 3 grouping-set
    replicas before the map-side combine (not 3 separate scans); exact
    integer revenue folds, countDistinct for orders."""
    j = _rev_joined(orders, lineitem, customer, nation, region)
    return (
        j.rollup("r_name", "n_name")
        .agg(
            (F.grouping("r_name") * 2 + F.grouping("n_name"))
            .cast("int").alias("lvl"),
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.sum("rev_u").cast("long").alias("rev_u"),
        )
        .select(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation"),
            "lvl", "n_orders",
            F.round(F.col("rev_u") / F.lit(1e6), 2).alias("revenue"),
        )
    )


def trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str | None = None,
    nation_b: str | None = None,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-12-31",
) -> DataFrame:
    """(supp_nation, cust_nation, year, n_items, revenue) — the
    TPC-H-Q7 shape: cross-nation shipped revenue per ship year — the
    first operator to exercise the lineitem-to-SUPPLIER join.  With a
    (nation_a, nation_b) pair it is literal Q7 (both directions of one
    corridor); the default None emits the FULL trade matrix (at tiny SF
    a fixed pair can be legitimately empty — a 0-row gate row proves
    nothing).

    Scale plan: when a pair is given its filter pushes all the way OUT
    before the fact fan-in — suppliers of the two nations become a tiny
    broadcast that shrinks fact rows at the FIRST join; either way the
    supplier/customer nation tags ride broadcasts, the ship-date range
    pushes to the parquet scan, and revenue folds exact integer
    cents x 1e2 discount units."""
    n = nation.select("n_nationkey", "n_name")
    if nation_a is not None:
        n = n.where(F.col("n_name").isin([nation_a, nation_b]))
    sup = supplier.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select(F.col("s_suppkey"), F.col("n_name").alias("supp_nation"))
    cus = customer.join(
        F.broadcast(n.withColumnRenamed("n_name", "c_nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select(F.col("c_custkey"), F.col("c_nation").alias("cust_nation"))
    rev = _cents(F.col("l_extendedprice")) * F.round(
        (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit(date_hi).cast("timestamp"))
    ).select("l_orderkey", "l_suppkey",
             F.year("l_shipdate").cast("int").alias("year"),
             rev.alias("rev_u"))
    j = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cus), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation", "year")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
             F.sum("rev_u").cast("long").alias("rev_u"))
        # half-up to cents as an INTEGER op (rev_u is exact at scale
        # 1e4; engines' float round() disagree on literal x.xx5 ties —
        # 2/1196 rows differed before this), then one exact division
        .select("supp_nation", "cust_nation", "year", "n_items",
                (F.expr("(rev_u + 50) div 100").cast("long")
                 / F.lit(100.0)).alias("revenue"))
    )


def local_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """(region, nation, n_items, revenue) — the TPC-H-Q5 shape: revenue
    from order lines where the ordering customer and the shipping
    supplier sit in the SAME nation (local fulfilment), per region and
    nation, over one order-date year.

    The join shape is the point: the same-nation predicate correlates
    two different dimension paths (customer-side nation vs
    supplier-side nation) through the fact table — neither filter alone
    is selective, only their conjunction after both tags are attached.
    Scale plan: the order-date year pushes to the orders scan BEFORE
    the fact fan-in; the supplier tag (suppkey -> nationkey) broadcasts
    (|supplier| = |customer|/15 in TPC-H proportions); customer rides
    the shuffle on custkey (never assumed broadcastable at 100 TB);
    nation/region are true broadcast dims.  Revenue folds exact integer
    cents x 1e2 discount units; one half-up integer rounding at the
    end (the trade_volume tie lesson)."""
    n = nation.select("n_nationkey", "n_name", "n_regionkey")
    r = region.select("r_regionkey", "r_name")
    sup = supplier.select(
        "s_suppkey", F.col("s_nationkey").alias("sup_nk"))
    cus = customer.select(
        "c_custkey", F.col("c_nationkey").alias("cus_nk"))
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    rev = _cents(F.col("l_extendedprice")) * F.round(
        (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    li = lineitem.select("l_orderkey", "l_suppkey", rev.alias("rev_u"))
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("cus_nk") == F.col("sup_nk"))
        .join(F.broadcast(n), F.col("cus_nk") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        j.groupBy(F.col("r_name").alias("region"),
                  F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
             F.sum("rev_u").cast("long").alias("rev_u"))
        .select("region", "nation", "n_items",
                (F.expr("(rev_u + 50) div 100").cast("long")
                 / F.lit(100.0)).alias("revenue"))
    )


def returned_items(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    k: int = 20,
) -> DataFrame:
    """(rank, c_custkey, c_name, nation, ret_revenue) — the TPC-H-Q10
    shape: the k customers who returned the most revenue
    (l_returnflag = 'R'), the churn-risk escalation list.

    Scale plan: the returnflag filter pushes to the lineitem scan
    (~25% selectivity), revenue folds exact integer units and
    aggregates per custkey BEFORE any dimension join (map-side
    combined, one shuffle on orderkey + one on custkey), the top-k is
    a TakeOrdered under the pinned (rev_u DESC, custkey) total order —
    never a global sort — and only the k survivors join the customer
    dimension (broadcast of k rows against the big side)."""
    rev = _cents(F.col("l_extendedprice")) * F.round(
        (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", rev.alias("rev_u"))
    per = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("rev_u").cast("long").alias("rev_u"))
    )
    from pyspark.sql import Window

    top = per.orderBy(F.col("rev_u").desc(), F.col("o_custkey")).limit(k)
    top = top.select(
        "o_custkey", "rev_u",
        F.row_number().over(
            Window.orderBy(F.col("rev_u").desc(), F.col("o_custkey"))
        ).cast("int").alias("rank"),
    )
    c = customer.select("c_custkey", "c_name", "c_nationkey")
    n = nation.select("n_nationkey", "n_name")
    return (
        c.join(F.broadcast(top), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("rank", "c_custkey", "c_name",
                F.col("n_name").alias("nation"),
                (F.expr("(rev_u + 50) div 100").cast("long")
                 / F.lit(100.0)).alias("ret_revenue"))
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> DataFrame:
    """(s_suppkey, s_name, total_revenue) — the TPC-H-Q15 shape: the
    supplier(s) with maximum shipped revenue over one quarter; ties all
    return (the view + HAVING = MAX semantics of the original, which is
    why the max compare happens on EXACT integer revenue units — a
    float max would make tie membership partitioning-dependent).

    Scale plan: the quarter pushes to the lineitem scan, revenue
    aggregates per suppkey map-side (one shuffle), the scalar max rides
    a broadcast 1-row cross join, and only the argmax rows (usually 1)
    touch the supplier dimension."""
    rev = _cents(F.col("l_extendedprice")) * F.round(
        (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    per = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp")))
        .select("l_suppkey", rev.alias("rev_u"))
        .groupBy("l_suppkey")
        .agg(F.sum("rev_u").cast("long").alias("rev_u"))
    )
    mx = per.agg(F.max("rev_u").alias("mx"))
    best = per.crossJoin(F.broadcast(mx)).where(
        F.col("rev_u") == F.col("mx"))
    return (
        supplier.select("s_suppkey", "s_name")
        .join(F.broadcast(best), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name",
                (F.expr("(rev_u + 50) div 100").cast("long")
                 / F.lit(100.0)).alias("total_revenue"))
    )


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """(p_type, year, n_items, profit) — the TPC-H-Q9 shape adapted to
    this schema (no partsupp table, so unit cost is the part's retail
    price): discounted revenue minus qty x retail cost, per part type
    and order year — the product-line margin read-out.

    Scale plan: two fact-side shuffles (partkey for the type/cost tag,
    orderkey for the year), both map-side-pre-projected to 3 columns;
    part is NOT broadcast (200k x SF rows in TPC-H proportions — at
    100 TB it shuffles like a fact).  Profit folds in one exact
    integer unit system: rev_u and cost_u both live at cents x 1e2
    scale, so the subtraction is exact and the single final division
    is the only float op."""
    rev_u = _cents(F.col("l_extendedprice")) * F.round(
        (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    li = lineitem.select(
        "l_orderkey", "l_partkey", rev_u.alias("rev_u"), qty.alias("qty"))
    p = part.select("p_partkey", "p_type",
                    _cents(F.col("p_retailprice")).alias("retail_c"))
    o = orders.select("o_orderkey",
                      F.year("o_orderdate").cast("int").alias("year"))
    j = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("p_type", "year", "rev_u",
                (F.col("qty") * F.col("retail_c") * F.lit(100))
                .alias("cost_u"))
    )
    return (
        j.groupBy("p_type", "year")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
             F.sum(F.col("rev_u") - F.col("cost_u")).cast("long")
             .alias("profit_u"))
        .select("p_type", "year", "n_items",
                (F.when(F.col("profit_u") >= 0,
                        F.expr("(profit_u + 50) div 100"))
                 .otherwise(-F.expr("(-profit_u + 50) div 100"))
                 .cast("long") / F.lit(100.0)).alias("profit"))
    )


def small_qty_revenue(
    lineitem: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """(p_brand, n_small_lines, lost_revenue) — the TPC-H-Q17 shape:
    list revenue sitting in order lines whose quantity is below 20% of
    that part's average line quantity — the 'could these dribble orders
    be batched?' read-out, per brand.

    The correlated-subquery shape (per-part average rejoined against
    the same fact) is the point.  Scale plan: the per-part aggregate is
    map-side combined and rejoined on partkey (self-join on the SAME
    partitioning — one shuffle feeds both sides); the 20%-of-average
    predicate is evaluated as a PURE integer cross-multiply
    (5 * qty * n_lines < sum_qty), never a float division, so band
    membership is exact at any partitioning; quantities are integral."""
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    li = lineitem.select(
        "l_partkey", qty.alias("qty"),
        _cents(F.col("l_extendedprice")).alias("price_c"))
    per = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("qty").cast("long").alias("sum_qty"))
    small = (
        li.join(per, F.col("l_partkey") == F.col("pk"))
        .where(F.lit(5) * F.col("qty") * F.col("n_lines")
               < F.col("sum_qty"))
    )
    p = part.select("p_partkey", "p_brand")
    return (
        small.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_small_lines"),
             F.sum("price_c").cast("long").alias("lost_c"))
        .select("p_brand", "n_small_lines",
                F.round(F.col("lost_c") / F.lit(100.0), 2)
                .alias("lost_revenue"))
    )


def dormant_customers(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    since: str = "2000-01-01",
) -> DataFrame:
    """(nation, n_customers, total_acctbal) — the TPC-H-Q22 shape:
    customers with an above-average positive account balance and no
    order since ``since`` — parked money going stale, per nation.
    (Literal Q22 tests 'never ordered'; in this synthetic corpus every
    customer has orders, so the never-ordered set is structurally empty
    — the 0-row-gate lesson — and the recency cutoff is the honest
    dormancy test with the identical anti-join shape.)

    Scale plan: the positive-balance average is ONE scalar aggregate
    broadcast back as a 1-row cross join, the above-average test is an
    exact integer cross-multiply (bal_c * n_pos > sum_pos_c — no float
    mean), and the dormancy test is a LEFT ANTI join against the
    distinct custkeys of the recent orders (the date filter pushes to
    the orders scan and the side collapses to keys before the join; at
    100 TB that is the small side and AQE broadcasts it)."""
    bal_c = _cents(F.col("c_acctbal"))
    c = customer.select("c_custkey", "c_nationkey", bal_c.alias("bal_c"))
    stats = c.where(F.col("bal_c") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_pos"),
        F.sum("bal_c").cast("long").alias("sum_pos"))
    rich = c.crossJoin(F.broadcast(stats)).where(
        F.col("bal_c") * F.col("n_pos") > F.col("sum_pos"))
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select("o_custkey").distinct()
    never = rich.join(recent, F.col("c_custkey") == F.col("o_custkey"),
                      "left_anti")
    n = nation.select("n_nationkey", "n_name")
    return (
        never.join(F.broadcast(n),
                   F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             F.round(F.sum("bal_c") / F.lit(100.0), 2)
             .alias("total_acctbal"))
    )


def late_shipments(
    orders: DataFrame,
    lineitem: DataFrame,
    grace_days: int = 90,
) -> DataFrame:
    """(o_orderpriority, n_orders) — the TPC-H-Q4 shape adapted to this
    schema (no commit/receipt dates): orders with AT LEAST ONE line
    shipped more than ``grace_days`` after the order date, per
    priority — does priority actually buy shipping urgency?

    The EXISTS decorrelation is the point: a LEFT SEMI join on the
    orderkey equi-key carrying the non-equi date predicate — each order
    counts ONCE however many lines are late (a plain inner join + count
    would double-count).  Scale plan: both sides pre-project to 2-3
    columns, the semi join rides the same orderkey shuffle every other
    fact-fact join uses, and the final rollup is <= |priorities|
    rows."""
    o = orders.select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate")
           > F.col("o_orderdate") + F.expr(f"INTERVAL {grace_days} DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"))


def waiting_suppliers(
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    grace_days: int = 60,
) -> DataFrame:
    """(s_name, numwait) — the TPC-H-Q21 shape adapted to this schema:
    in finished multi-supplier orders, the supplier who was the ONLY
    one to ship late (> ``grace_days`` after the order date) — the
    unambiguous bottleneck, charged per order it alone held up.

    Literal Q21 spells this as EXISTS (another supplier in the order)
    AND NOT EXISTS (another LATE supplier) — two extra fact-fact
    self-joins.  The scale-correct rewrite used here decorrelates both
    quantifiers into ONE grouped pass: fold lineitems to per
    (order, supplier) late-flags, then a window over the orderkey
    partition reads supplier count and late count per order, and the
    blame filter is `late = 1 AND n_supp > 1 AND n_late = 1`.  The
    oracle runs the literal EXISTS/NOT-EXISTS form, proving the rewrite
    equivalent.  Scale plan: one orderkey-shuffle carries the fold AND
    the window (same key — no second exchange), names broadcast, output
    <= |suppliers| rows."""
    from pyspark.sql import Window

    o = orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    tagged = li.join(
        o, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate")
         > F.col("o_orderdate") + F.expr(f"INTERVAL {grace_days} DAYS")
         ).cast("int").alias("late"),
    )
    per_su = tagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late"))
    w = Window.partitionBy("l_orderkey")
    blamed = per_su.select(
        "l_suppkey", "late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late"),
    ).where((F.col("late") == 1) & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1))
    s = supplier.select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(s),
                    F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_3",
    region_name: str = "ASIA",
) -> DataFrame:
    """(year, total_revenue, nation_revenue, mkt_share) — the TPC-H-Q8
    shape: within one customer REGION's order flow, the revenue share
    supplied by one target NATION per order year — is the corridor
    growing or losing ground?

    Scale plan: the region filter collapses customers to a key set that
    left-semi-broadcasts against orders (never the reverse); the
    supplier->nation tag is a broadcast carrying ONE precomputed
    is_target bit so the share numerator is a map-side conditional sum
    in the SAME aggregation as the denominator (one pass, never two
    scans); revenue folds exact integer cents x 1e2 discount units and
    the share is ONE division of two exact int64 sums — identical in
    any engine — rounded once at read-out."""
    n = nation.select("n_nationkey", "n_name", "n_regionkey")
    r = region.where(F.col("r_name") == region_name).select("r_regionkey")
    cust = (
        customer.join(F.broadcast(n),
                      F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    sup = supplier.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select(
        "s_suppkey",
        (F.col("n_name") == target_nation).cast("long").alias("is_target"),
    )
    rev = _cents(F.col("l_extendedprice")) * F.round(
        (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    li = lineitem.select("l_orderkey", "l_suppkey", rev.alias("rev_u"))
    j = (
        li.join(orders.select("o_orderkey", "o_custkey",
                              F.year("o_orderdate").cast("int")
                              .alias("year")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust),
              F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    agg = j.groupBy("year").agg(
        F.sum("rev_u").cast("long").alias("total_u"),
        F.sum(F.col("rev_u") * F.col("is_target")).cast("long")
        .alias("nation_u"),
    )
    return agg.select(
        "year",
        (F.expr("(total_u + 50) div 100").cast("long")
         / F.lit(100.0)).alias("total_revenue"),
        (F.expr("(nation_u + 50) div 100").cast("long")
         / F.lit(100.0)).alias("nation_revenue"),
        F.round(F.col("nation_u") / F.col("total_u"), 6).alias("mkt_share"),
    )


#: Q19-style promo bands: (brand, size_lo, size_hi, qty_lo, qty_hi).
#: Bands are keyed by DISTINCT brands so membership is disjoint and a
#: line never double-counts across bands.
PROMO_BANDS = (
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#2", 1, 25, 10, 35),
    ("Brand#3", 1, 40, 20, 50),
)


def brand_band_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    bands: tuple = PROMO_BANDS,
) -> DataFrame:
    """(p_brand, n_items, revenue) — the TPC-H-Q19 shape: discounted
    revenue from lines matching an OR-of-ANDs of (brand, part-size
    band, quantity band) promo conditions, reported per band.

    The disjunctive predicate is the point: a naive translation leaves
    the whole OR to post-join eval.  Here the UNION BOUNDS pre-push on
    both sides — part prunes to `p_brand IN bands AND p_size <=
    max(hi)` BEFORE broadcasting (at 100 TB the broadcast list shrinks
    ~10x), lineitem's scan gets `l_quantity BETWEEN global lo AND
    global hi` pushed to parquet — and only the residual per-band
    conjunction evaluates post-join.  Bands must be brand-disjoint
    (enforced); revenue folds exact integer cents x 1e2 units with one
    half-up integer rounding at read-out."""
    brands = [b[0] for b in bands]
    if len(set(brands)) != len(brands):
        raise ValueError("brand_band_revenue bands must have distinct "
                         "brands (disjoint membership)")
    max_size = max(b[2] for b in bands)
    qty_lo = min(b[3] for b in bands)
    qty_hi = max(b[4] for b in bands)
    p = part.where(
        F.col("p_brand").isin(brands) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand", "p_size")
    rev = _cents(F.col("l_extendedprice")) * F.round(
        (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    li = lineitem.where(
        (F.col("l_quantity") >= qty_lo) & (F.col("l_quantity") <= qty_hi)
    ).select("l_partkey", "l_quantity", rev.alias("rev_u"))
    cond = F.lit(False)
    for brand, s_lo, s_hi, q_lo, q_hi in bands:
        cond = cond | (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= s_lo) & (F.col("p_size") <= s_hi)
            & (F.col("l_quantity") >= q_lo) & (F.col("l_quantity") <= q_hi)
        )
    j = li.join(F.broadcast(p),
                F.col("l_partkey") == F.col("p_partkey")).where(cond)
    return (
        j.groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
             F.sum("rev_u").cast("long").alias("rev_u"))
        .select("p_brand", "n_items",
                (F.expr("(rev_u + 50) div 100").cast("long")
                 / F.lit(100.0)).alias("revenue"))
    )


def join_skew_audit(df: DataFrame, keys: tuple) -> DataFrame:
    """(key_col, n_rows, n_keys, max_key_rows, skew_factor, top_share)
    — the pre-join skew dashboard: for each candidate join key of a
    fact table, how concentrated are its rows?  skew_factor =
    max_key_rows / (n_rows / n_keys) — how many times heavier the
    heaviest key is than the average — is THE number that decides
    whether a shuffle join needs salting (graph/salting.py) or AQE
    skew splitting before anyone burns a 100-TB shuffle discovering a
    straggler.  top_share = max_key_rows / n_rows.

    Exactness: counts are exact int64; skew_factor is computed as the
    integer cross-multiply max * n_keys divided ONCE by n_rows (never
    a float average fed into a float division).  One aggregation per
    key (map-side combined), output = |keys| rows."""
    spark = df.sparkSession
    out = None
    for key in keys:
        per = df.groupBy(F.col(key)).agg(
            F.count(F.lit(1)).cast("long").alias("c"))
        agg = per.agg(
            F.lit(key).alias("key_col"),
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_key_rows"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out.select(
        "key_col", "n_rows", "n_keys", "max_key_rows",
        F.round((F.col("max_key_rows") * F.col("n_keys"))
                / F.col("n_rows"), 6).alias("skew_factor"),
        F.round(F.col("max_key_rows") / F.col("n_rows"), 6)
        .alias("top_share"),
    )


def forecast_revenue(
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    disc_lo: int = 5,
    disc_hi: int = 7,
    qty_max: int = 24,
) -> DataFrame:
    """1-row (n_lines, avg_discount_pct, revenue_delta) — the
    TPC-H-Q6 shape: how much revenue would have been gained in a year
    if the mid-band discounts (5-7%) on small-quantity lines had not
    been granted — sum(l_extendedprice * l_discount) under three
    pushed predicates.

    The point of the shape is that it is pure scan + filter + fold:
    every predicate (date window, discount band, quantity cap) pushes
    to the parquet scan, no join, map-side-combined single-row agg.
    Money math is exact: cents x discount-percent-units int64 products
    (<= 1e7 x 10 per line — no overflow until ~9e18 total), one
    division at read-out.  The discount-band test compares ROUNDED
    integer percent units, never float equality."""
    dc = F.round(F.col("l_discount") * 100, 0).cast("long")
    f = lineitem.where(
        (F.col("l_shipdate").cast("date") >= F.lit(date_lo).cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit(date_hi).cast("date"))
        & (F.round(F.col("l_quantity"), 0).cast("long") < qty_max)
    ).select(
        dc.alias("dc"),
        _cents(F.col("l_extendedprice")).alias("pc"),
    ).where((F.col("dc") >= disc_lo) & (F.col("dc") <= disc_hi))
    agg = f.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.coalesce(F.sum("dc"), F.lit(0)).cast("long").alias("dsum"),
        F.coalesce(F.sum(F.col("pc") * F.col("dc")), F.lit(0))
        .cast("long").alias("delta_u"),
    )
    return agg.select(
        "n_lines",
        F.when(
            F.col("n_lines") > 0,
            F.round(F.col("dsum") / F.col("n_lines"), 6),
        ).alias("avg_discount_pct"),
        F.round(F.col("delta_u") / F.lit(1e4), 2).alias("revenue_delta"),
    )
