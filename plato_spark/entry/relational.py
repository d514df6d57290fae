"""Entry-registry queries: relational domain (split from the former
monolithic __spark_entry__.py; round-5 manifest-ization).
"""

from __future__ import annotations

from plato_spark.entry.common import (  # noqa: F401
    BENFORD_P,
    CONTAM_NGRAM,
    F,
    H1_SQL,
    MKT_SEGMENTS,
    TOKEN_RE_SQL,
    _observed_catalog,
    _sql_benford,
    _sql_gq_chain,
    _sql_reorder_gaps,
    _sql_zorder,
    load_table,
    q_segment_pivot,
)


def q_waiting_suppliers(spark, sf_dir):
    """TPC-H-Q21-shape sole-late-supplier blame
    (functions/relational.waiting_suppliers): the EXISTS / NOT-EXISTS
    quantifier pair decorrelated into one grouped pass + one orderkey
    window — the oracle runs the literal double-quantifier SQL, so the
    gate proves the rewrite equivalent."""
    from plato_spark.functions.relational import waiting_suppliers

    return waiting_suppliers(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


def q_market_share(spark, sf_dir):
    """TPC-H-Q8-shape nation market share inside a customer region per
    order year (functions/relational.market_share): numerator as a
    map-side conditional sum beside the denominator in ONE aggregation,
    share as a single division of exact int64 folds."""
    from plato_spark.functions.relational import market_share

    return market_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_brand_band_revenue(spark, sf_dir):
    """TPC-H-Q19-shape disjunctive promo-band revenue
    (functions/relational.brand_band_revenue): OR-of-ANDs with the
    union bounds pre-pushed to both scans, residual conjunctions
    post-join, exact integer cents."""
    from plato_spark.functions.relational import brand_band_revenue

    return brand_band_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def q_ewma_revenue(spark, sf_dir):
    """Exponentially-weighted (alpha = 1/2) 20-day trailing revenue per
    day — the responsive smoother beside trailing_revenue's flat 7-day
    RANGE window.  The trick that makes EWMA oracle-checkable: with
    alpha = 1/2 every weight is a POWER OF TWO, so the weighted fold is
    an exact int64 sum of cents << (19 - gap) — float never enters
    until the ONE normalizing division ( / (2^20 - 1) / 100).

    Gap days are real zero-revenue days: the calendar is gap-filled
    in-plan (sequence + explode over the broadcast min/max bounds), so
    the decay rides CALENDAR days, not row offsets.  Scale plan: the
    window is an EXPAND x20 (each day offers its weighted contribution
    to its next 19 calendar days) + ONE shuffle on the target day —
    never a global-sort window; the series is the pre-aggregated
    per-day table (|days| rows, the bounded offsets-table role).  Only
    days with a full 20-day history report (constant weight mass)."""
    o = load_table(spark, sf_dir, "orders")
    per = (
        o.select(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long").alias("day_i"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
            .alias("pc"))
        .groupBy("day_i").agg(F.sum("pc").cast("long").alias("rev_c"))
    )
    b = per.agg(F.min("day_i").alias("lo"), F.max("day_i").alias("hi"))
    days = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day_i"))
    filled = days.join(per, "day_i", "left").select(
        "day_i", F.coalesce("rev_c", F.lit(0)).alias("c"))
    contrib = filled.select(
        F.explode(F.sequence(F.lit(0), F.lit(19))).alias("k"),
        "day_i", "c",
    ).select(
        (F.col("day_i") + F.col("k")).alias("t_day"),
        # shiftleft's bits arg must be a literal in the Python API;
        # the SQL form takes the column
        (F.col("c") * F.expr("shiftleft(1L, 19 - cast(k AS INT))"))
        .alias("w_c"),
    )
    num = contrib.groupBy(F.col("t_day").alias("day_i")).agg(
        F.sum("w_c").cast("long").alias("num"))
    return (
        num.crossJoin(F.broadcast(b))
        .where((F.col("day_i") >= F.col("lo") + 19)
               & (F.col("day_i") <= F.col("hi")))
        .select("day_i",
                F.round(F.col("num") / F.lit(((1 << 20) - 1) * 100.0), 6)
                .alias("ewma"))
    )


def q_revenue_autocorr(spark, sf_dir):
    """Lag-7 autocorrelation of daily order revenue — does the weekly
    cycle exist?  Pearson r over (x_t, x_{t-7}) pairs on the gap-filled
    calendar (missing days are REAL zero-revenue observations; skipping
    them would splice non-adjacent weeks together).

    Exactness: every sum (x, y, x^2, y^2, xy in cents) folds in
    DECIMAL(38,0) — 128-bit exact, order-free — mirrored by DuckDB's
    automatic HUGEINT sums; the lag pairing is a self-join on
    day_i = day_i + 7 (an equi-join, never a global-sort window), and
    float enters only at the final covariance / sqrt(var*var) division
    of exact integers.  sqrt is IEEE-correctly-rounded everywhere
    (unlike ln/log2 — the cross-libm lesson), so 6dp rounding is
    engine-stable."""
    o = load_table(spark, sf_dir, "orders")
    per = (
        o.select(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long").alias("day_i"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
            .alias("pc"))
        .groupBy("day_i").agg(F.sum("pc").cast("long").alias("rev_c"))
    )
    b = per.agg(F.min("day_i").alias("lo"), F.max("day_i").alias("hi"))
    days = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day_i"))
    filled = days.join(per, "day_i", "left").select(
        "day_i",
        F.coalesce("rev_c", F.lit(0)).cast("decimal(19,0)").alias("c"))
    x = filled.select(F.col("day_i").alias("tx"), F.col("c").alias("x"))
    y = filled.select((F.col("day_i") + 7).alias("tx"),
                      F.col("c").alias("y"))
    pairs = x.join(y, "tx")
    s = pairs.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return s.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.lit(7).cast("int").alias("lag"),
        F.round(
            cov.cast("double")
            / F.sqrt(vx.cast("double") * vy.cast("double")), 6
        ).alias("autocorr"),
    )


def q_rfm_segments(spark, sf_dir):
    """RFM customer segmentation: score recency / frequency / monetary
    1-4 by FIXED thresholds (quantile binning is balance_deciles' job —
    fixed cutoffs are the production-stable contract: a segment keeps
    its meaning when the population shifts), then report segment sizes
    and average spend.  Recency anchors on the dataset's LAST order
    date as a broadcast scalar (never wall-clock now() — results must
    not depend on run time); monetary folds exact int64 cents with ONE
    division at read-out."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    per = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("mx"), F.col("o_orderdate")))
            .cast("long").alias("rec_days"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").alias("mon_c"),
        )
    )
    r_s = (F.when(F.col("rec_days") <= 90, 4)
           .when(F.col("rec_days") <= 365, 3)
           .when(F.col("rec_days") <= 730, 2).otherwise(1))
    f_s = (F.when(F.col("freq") >= 15, 4)
           .when(F.col("freq") >= 10, 3)
           .when(F.col("freq") >= 5, 2).otherwise(1))
    m_s = (F.when(F.col("mon_c") >= 400_000_000, 4)
           .when(F.col("mon_c") >= 250_000_000, 3)
           .when(F.col("mon_c") >= 100_000_000, 2).otherwise(1))
    return (
        per.select(r_s.alias("r_score"), f_s.alias("f_score"),
                   m_s.alias("m_score"), "mon_c")
        .groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             F.sum("mon_c").cast("long").alias("mc"))
        .select("r_score", "f_score", "m_score", "n_customers",
                F.round(F.col("mc") / (F.col("n_customers") * F.lit(100.0)),
                        6).alias("avg_monetary"))
    )


def q_join_skew_audit(spark, sf_dir):
    """Pre-join skew dashboard over the lineitem fact's three join keys
    (functions/relational.join_skew_audit): the max-over-average key
    weight that decides salting / AQE skew-split BEFORE a 100-TB
    shuffle discovers a straggler.  Exact integer counts, skew factor
    as one integer cross-multiply divided once."""
    from plato_spark.functions.relational import join_skew_audit

    return join_skew_audit(
        load_table(spark, sf_dir, "lineitem"),
        keys=("l_orderkey", "l_partkey", "l_suppkey"),
    )


def q_discount_qty_corr(spark, sf_dir):
    """Per-brand Pearson correlation between discount (scale-100 ints)
    and quantity (integral) — do discounts actually move volume, and
    differently per brand?  The revenue_autocorr discipline: all five
    sums fold in DECIMAL(38,0) (DuckDB HUGEINT), float enters only at
    cov/sqrt(var*var), zero-variance groups report NULL (never a fake
    0).  One broadcast part join + one map-side-combined aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
        F.col("l_quantity").cast("long").alias("q"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p),
                F.col("l_partkey") == F.col("p_partkey")).select(
        "p_brand",
        F.col("d").cast("decimal(19,0)").alias("x"),
        F.col("q").cast("decimal(19,0)").alias("y"))
    s = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return s.select(
        "p_brand", F.col("n").cast("long").alias("n_items"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(cov.cast("double")
                    / F.sqrt(vx.cast("double") * vy.cast("double")), 6),
        ).alias("corr"),
    )


def q_skyline_parts(spark, sf_dir):
    """2-D skyline (Pareto frontier) of the part catalog: parts not
    dominated on (retailprice low, size high) — the best-value-per-size
    frontier.  The scale rewrite is the point: literal skyline is a
    quadratic NOT-EXISTS self-join; on 2 attributes it collapses to a
    cumulative min — best price over all STRICTLY larger sizes, and
    over >= sizes for the price-tie direction — computed on the
    per-size min table (<= |sizes| rows, the bounded-dimension role)
    and broadcast back.  The oracle runs the literal double-quantifier
    domination SQL, so the gate proves the rewrite.  Prices compare as
    exact integer cents."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("pc"))
    per_size = p.groupBy("p_size").agg(F.min("pc").alias("minp"))
    w_ge = (Window.orderBy(F.desc("p_size"))
            .rowsBetween(Window.unboundedPreceding, 0))
    w_gt = (Window.orderBy(F.desc("p_size"))
            .rowsBetween(Window.unboundedPreceding, -1))
    best = per_size.select(
        "p_size",
        F.min("minp").over(w_ge).alias("best_ge"),
        F.min("minp").over(w_gt).alias("best_gt"))
    return (
        p.join(F.broadcast(best), "p_size")
        .where(
            (F.col("best_gt").isNull() | (F.col("best_gt") > F.col("pc")))
            & (F.col("best_ge") >= F.col("pc"))
        )
        .select("p_partkey", "p_brand", "p_size",
                (F.col("pc") / F.lit(100.0)).alias("p_retailprice"))
    )


def q_benford_audit(spark, sf_dir):
    """Benford first-significant-digit audit of order totals — the
    classic fabricated-numbers / data-quality screen.  The first digit
    of the exact cents integer IS the first significant digit of the
    price (cents shift never changes it); expectations log10(1 + 1/d)
    are Python-computed literals injected into BOTH engines, so no
    runtime log10 ever runs (the cross-libm lesson applied to
    constants).  share is ONE division of exact int64 counts.  On this
    synthetic catalog the verdict is a loud NOT-Benford — which is the
    audit working, not failing."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.substring(F.round(F.col("o_totalprice") * 100, 0)
                    .cast("long").cast("string"), 1, 1).alias("digit"))
    counts = d.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("t"))
    exp = spark.createDataFrame(
        [(str(k), v) for k, v in BENFORD_P.items()],
        "digit string, benford_expected double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .join(F.broadcast(exp), "digit")
        .select(
            "digit", "n",
            F.round(F.col("n") / F.col("t"), 6).alias("share"),
            "benford_expected",
            F.round(F.col("n") / F.col("t")
                    - F.col("benford_expected"), 6).alias("dev"),
        )
    )


def q_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value matrix: customers grouped by FIRST-order
    year, revenue accumulated per years-since-acquisition — the money
    sibling of retention_cohorts' activity matrix (does an older
    cohort keep out-spending a newer one at the same age?).  Exact
    int64 cents; the cohort tag is one min-aggregation broadcast back
    onto the order stream; ages are exact integer year differences."""
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).cast("int").alias("cohort"))
    j = o.select("o_custkey",
                 F.year("o_orderdate").cast("int").alias("y"),
                 F.round(F.col("o_totalprice") * 100, 0).cast("long")
                 .alias("pc")).join(F.broadcast(first), "o_custkey")
    return (
        j.groupBy("cohort", (F.col("y") - F.col("cohort")).alias("age"))
        .agg(F.countDistinct("o_custkey").cast("long")
             .alias("active_customers"),
             F.sum("pc").cast("long").alias("rc"))
        .select("cohort", "age", "active_customers",
                F.round(F.col("rc") / F.lit(100.0), 2).alias("revenue"))
    )


def q_weighted_median_discount(spark, sf_dir):
    """Quantity-weighted discount quantiles — 'what discount does the
    MEDIAN UNIT ship at?' (unit-weighted, not line-weighted: a
    50-unit line counts 50x a 1-unit line).  The discount domain is 11
    exact scale-100 integers, so the weighted quantile needs NO
    binning or interpolation at all: cumulative quantity over the
    sorted 11-row domain, quantile q = the smallest value whose
    cumulative weight reaches ceil(q * total) — the exact
    lower-weighted-quantile rule, pure integer comparisons (the
    bounded-domain case where histogram_quantiles' machinery would be
    overkill).  Output one row per q in (0.25, 0.5, 0.75)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
          .alias("w"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select("d", F.sum("w").over(w).alias("cw")).crossJoin(
        F.broadcast(per.agg(F.sum("w").cast("long").alias("tw"))))
    qs = spark.createDataFrame(
        [(0.25,), (0.5,), (0.75,)], "q double")
    hit = (
        cum.crossJoin(F.broadcast(qs))
        # smallest d with 4*cw >= 4*q*tw, as an exact integer
        # cross-multiply: q in quarters -> 4q integral
        .where(F.col("cw") * 4 >= (F.col("q") * 4).cast("long")
               * F.col("tw"))
        .groupBy("q")
        .agg(F.min("d").alias("dmin"), F.max("tw").alias("tw"))
    )
    return hit.select(
        "q", (F.col("dmin") / F.lit(100.0)).alias("discount"),
        F.col("tw").alias("total_qty"))


def q_part_name_revenue(spark, sf_dir):
    """Catalog text facet: the top-20 part-NAME tokens by attributed
    discounted revenue — which words in the catalog sell?  Cross-domain
    join of the text tokenizer with the fact table: part names tokenize
    JVM-side, the token->part map broadcasts (parts are the dimension),
    revenue folds exact integer cents x 1e2 units once per (token,
    lineitem) incidence, and the top-20 rides TakeOrdered (never a
    global sort).  Deterministic tie-break by token."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ptok = p.select(
        "p_partkey",
        F.explode(F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("p_name")),
                                 F.lit("[a-z0-9]+"), F.lit(0))))
        .alias("token"))
    rev = (F.round(F.col("l_extendedprice") * 100, 0).cast("long")
           * F.round((F.lit(1.0) - F.col("l_discount")) * 100, 0)
           .cast("long"))
    j = li.select("l_partkey", rev.alias("rev_u")).join(
        F.broadcast(ptok),
        F.col("l_partkey") == F.col("p_partkey"))
    agg = j.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("rev_u").cast("long").alias("ru"))
    return (
        agg.orderBy(F.desc("ru"), F.asc("token")).limit(20)
        .select("token", "n_lines",
                (F.expr("(ru + 50) div 100").cast("long")
                 / F.lit(100.0)).alias("revenue"))
    )


def q_retention_cohorts(spark, sf_dir):
    """Day-N retention matrix (functions/events.retention_cohorts):
    users from each first-event cohort still active k days later —
    exact integer counts, cohort emitted as yyyy-MM-dd text."""
    from plato_spark.functions.events import retention_cohorts

    return retention_cohorts(load_table(spark, sf_dir, "events"))


def q_revenue_rollup(spark, sf_dir):
    """TPC-H-Q5-shape star rollup: discounted revenue per region/nation
    with broadcast dimensions and exact integer-cents accumulation
    (functions/relational.revenue_rollup)."""
    from plato_spark.functions.relational import revenue_rollup

    return revenue_rollup(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_value_outliers(spark, sf_dir):
    """Per-event-type z-score outlier counts from sufficient statistics
    (functions/relational.value_outliers; 6dp-rounded mean/std cutoff)."""
    from plato_spark.functions.relational import value_outliers

    return value_outliers(load_table(spark, sf_dir, "events"), z=3.0)


def q_price_quantiles(spark, sf_dir):
    """Histogram-interpolated quantiles (p50/p90/p99) of
    l_extendedprice — 256 fixed-width bins, no sort
    (functions/quantiles)."""
    from plato_spark.functions.quantiles import histogram_quantiles

    return histogram_quantiles(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice",
        quantiles=(0.5, 0.9, 0.99), nbins=256,
    )


def q_dow_profile(spark, sf_dir):
    """Day-of-week seasonality (0 = Sunday): hourly_profile's weekly
    sibling, with the weekday computed as PURE integer arithmetic
    ((epoch_days + 4) % 7 — 1970-01-01 is a Thursday) because engines'
    dayofweek()/day-name functions disagree on origin and locale.
    Exact counts, one guarded division."""
    ev = load_table(spark, sf_dir, "events")
    dow = F.pmod(
        F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(86_400_000_000)) + 4, F.lit(7)).cast("int")
    g = ev.groupBy(dow.alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long").alias("n_views"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("n_purchases"),
    )
    return g.select(
        "dow", "n_events", "n_views", "n_purchases",
        F.when(F.col("n_views") > 0,
               F.round(F.col("n_purchases") / F.col("n_views"), 6))
        .alias("cvr"),
    )


def q_order_size_histogram(spark, sf_dir):
    """Lines-per-order distribution: (n_lines, n_orders) — the basket
    shape profile behind join fan-out estimates and the quadratic
    basket guards; one map-side-combined count-of-counts."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"))
    return per.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"))


def q_segment_mix(spark, sf_dir):
    """Customer market-segment mix per nation: (nation, segment,
    n_customers, pct within nation) — the demographic slice behind
    segment-targeted queries like Q3; broadcast nation dimension, a
    per-nation window over |segments| rows for the share.  Exact
    counts, one rounded division."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    g = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
    w = Window.partitionBy("nation")
    return g.select(
        "nation", "segment", "n_customers",
        F.round((F.lit(100) * F.col("n_customers"))
                / F.sum("n_customers").over(w), 6).alias("pct"),
    )


def q_discount_bands(spark, sf_dir):
    """Revenue profile by discount band (exact integer percent bands
    over l_discount*100): the pricing-policy read-out — how much
    revenue ships at each discount depth, and the per-band margin
    forgone (list price minus discounted).  Pure integer cents/unit
    folds, one rounded division per band."""
    li = load_table(spark, sf_dir, "lineitem")
    dc = F.round(F.col("l_discount") * 100, 0).cast("long")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    b = li.select(
        dc.alias("discount_pct"),
        pc.alias("pc"),
        (pc * (100 - dc)).alias("dp_u"),
    )
    g = b.groupBy("discount_pct").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("pc").cast("long").alias("list_c"),
        F.sum("dp_u").cast("long").alias("disc_u"),
    )
    return g.select(
        "discount_pct", "n_items",
        F.round(F.col("list_c") / F.lit(100.0), 2).alias("list_revenue"),
        F.round(F.col("disc_u") / F.lit(1e4), 2).alias("disc_revenue"),
        F.round((F.col("list_c") * F.lit(100) - F.col("disc_u"))
                / F.lit(1e4), 2).alias("forgone"),
    )


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H-Q5 shape (functions/relational.local_supplier_volume):
    same-nation customer+supplier revenue per region/nation over one
    order year — the two-dimension-path correlation join; supplier tag
    broadcast, customer on the shuffle, exact integer revenue."""
    from plato_spark.functions.relational import local_supplier_volume

    return local_supplier_volume(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_returned_items(spark, sf_dir):
    """TPC-H-Q10 shape (functions/relational.returned_items): top-20
    customers by returned (l_returnflag='R') revenue under the pinned
    (revenue DESC, custkey) total order — aggregate-then-top-k-then-
    broadcast-join; only 20 rows ever touch the customer dimension."""
    from plato_spark.functions.relational import returned_items

    return returned_items(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        k=20,
    )


def q_top_supplier(spark, sf_dir):
    """TPC-H-Q15 shape (functions/relational.top_supplier): max-revenue
    supplier(s) over 1996Q1 shipments, tie membership decided on EXACT
    integer revenue units (a float max would be partitioning-
    dependent)."""
    from plato_spark.functions.relational import top_supplier

    return top_supplier(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


def q_product_profit(spark, sf_dir):
    """TPC-H-Q9 shape adapted (functions/relational.product_profit):
    per (part type, order year) margin = discounted revenue minus
    qty x retail cost, both folded in ONE exact integer unit system;
    part shuffles like a fact (never broadcast at 100 TB)."""
    from plato_spark.functions.relational import product_profit

    return product_profit(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
    )


def q_small_qty_revenue(spark, sf_dir):
    """TPC-H-Q17 shape (functions/relational.small_qty_revenue): list
    revenue in lines below 20% of their part's average quantity — the
    correlated per-part-average rejoin with the band test as a pure
    integer cross-multiply (5*qty*n < sum), exact at any
    partitioning."""
    from plato_spark.functions.relational import small_qty_revenue

    return small_qty_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def q_dormant_customers(spark, sf_dir):
    """TPC-H-Q22 shape (functions/relational.dormant_customers):
    above-average-balance customers with no order since 2000-01-01,
    per nation — the scalar-broadcast compare (integer cross-multiply,
    no float mean) plus LEFT ANTI against the collapsed recent-order
    custkeys."""
    from plato_spark.functions.relational import dormant_customers

    return dormant_customers(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


def q_late_shipments(spark, sf_dir):
    """TPC-H-Q4 shape adapted (functions/relational.late_shipments):
    orders with >=1 line shipped >90 days after order date, per
    priority — the EXISTS-decorrelated LEFT SEMI join carrying a
    non-equi date predicate on the orderkey equi-key."""
    from plato_spark.functions.relational import late_shipments

    return late_shipments(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        grace_days=90,
    )


def q_customer_distribution(spark, sf_dir):
    """TPC-H-Q13 shape: orders-per-customer count-of-counts INCLUDING
    the zero-order customers (the left join is the point — a groupBy
    over orders alone can never produce the 0 bin, and the 0 bin is the
    business signal: registered-but-inactive accounts).  Distinct from
    order_size_histogram (lines per order).  One left join + two
    map-side-combined aggs, exact counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    per = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.sum(F.when(F.col("o_custkey").isNull(), 0).otherwise(1))
             .cast("long").alias("n_orders"))
    )
    return per.groupBy("n_orders").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"))


def q_status_priority_cube(spark, sf_dir):
    """Order counts + exact revenue over CUBE(status, priority) — all
    four grouping sets in ONE pass (Spark expands the cube before the
    shuffle, so at 100 TB this is one Exchange, not four jobs).  lvl =
    GROUPING(status)*2 + GROUPING(priority) disambiguates real NULLs
    from subtotal rows, the revenue_rollup_totals discipline."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderstatus", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("pc"))
    return (
        base.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") * 2
             + F.grouping("o_orderpriority")).cast("int").alias("lvl"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("pc").cast("long").alias("rev_c"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "lvl", "n_orders",
            F.round(F.col("rev_c") / F.lit(100.0), 2).alias("revenue"),
        )
    )


def q_revenue_gini(spark, sf_dir):
    """Gini coefficient of per-customer order revenue (in exact cents)
    through the generalized value-histogram Gini kernel
    (graph/edges.gini_from_counts) — the whole-distribution inequality
    scalar beside revenue_concentration's top-k share; the only window
    runs over |distinct revenue values| rows."""
    from plato_spark.graph.edges import gini_from_counts

    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long").alias("cnt"))
    return gini_from_counts(per.select("cnt")).select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_cents"), "gini")


def q_integrity_audit(spark, sf_dir):
    """Referential-integrity audit across the star schema's four FK
    paths — each relation's violation count via a LEFT ANTI join
    against the parent's collapsed keys.  Zeros ARE the signal (the
    audit passing), unlike an empty result; at 100 TB this is the
    standard pre-flight before trusting any join's row counts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")

    def _viol(child, fk, parent, pk, tag):
        bad = child.select(F.col(fk)).join(
            parent.select(F.col(pk).alias(fk)).distinct(), fk,
            "left_anti")
        return bad.agg(F.count(F.lit(1)).cast("long").alias("n_violations")
                       ).select(F.lit(tag).alias("relation"),
                                "n_violations")

    return (
        _viol(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(_viol(li, "l_partkey", p, "p_partkey",
                           "lineitem->part"))
        .unionByName(_viol(li, "l_suppkey", s, "s_suppkey",
                           "lineitem->supplier"))
        .unionByName(_viol(o, "o_custkey", c, "c_custkey",
                           "orders->customer"))
    )


def q_priority_drift(spark, sf_dir):
    """Order-priority mix drift: per (year, priority) the share of that
    year's orders and its deviation from the priority's ALL-TIME share
    — is the urgent-order fraction creeping up.  Exact counts; the
    year share rides a per-year window over <= |priorities| rows, the
    all-time share a broadcast join; two rounded divisions."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("year"),
        "o_orderpriority")
    per = o.groupBy("year", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    overall = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("tn"))
    tot = o.count()
    w = Window.partitionBy("year")
    return (
        per.join(F.broadcast(overall), "o_orderpriority")
        .select(
            "year", F.col("o_orderpriority").alias("priority"), "n",
            F.round((F.lit(100) * F.col("n"))
                    / F.sum("n").over(w), 6).alias("share_pct"),
            F.round((F.lit(100) * F.col("n")) / F.sum("n").over(w)
                    - (F.lit(100) * F.col("tn")) / F.lit(float(tot)), 6)
            .alias("dev_pct"),
        )
    )


def q_open_order_aging(spark, sf_dir):
    """Open-order (status 'O') age quantiles per priority, aged against
    the dataset's LAST order date (a broadcast scalar — never
    wall-clock now(), which would make the result time-dependent):
    the backlog-health read-out.  Exact integer day ages through the
    in-plan per-group quantile kernel."""
    from plato_spark.functions.quantiles import group_quantiles

    o = load_table(spark, sf_dir, "orders")
    now = o.agg(F.max("o_orderdate").alias("now_d"))
    aged = (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(now))
        .select("o_orderpriority",
                F.datediff(F.col("now_d"), F.col("o_orderdate"))
                .cast("double").alias("age_days"))
    )
    return group_quantiles(aged, "o_orderpriority", "age_days")


def q_supply_demand_balance(spark, sf_dir):
    """Per-nation supply/demand imbalance: quantity SHIPPED by the
    nation's suppliers vs quantity ORDERED by its customers, and the
    exact-integer-fed ratio — which nations are net exporters of this
    catalog.  The two quantities ride the two different dimension
    paths Q5 correlates (supplier tag broadcast onto lineitem;
    customer path through orders), aggregated independently and
    full-outer-merged per nation (a nation missing one side shows 0,
    not a dropped row)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    cus = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    supplied = (
        li.select("l_suppkey", qty.alias("q"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("q").cast("long").alias("supplied_qty"))
    )
    consumed = (
        li.select("l_orderkey", qty.alias("q"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.withColumnRenamed("n_name", "nation2")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("nation2").alias("nation"))
        .agg(F.sum("q").cast("long").alias("consumed_qty"))
    )
    j = supplied.join(consumed, "nation", "full_outer").select(
        "nation",
        F.coalesce("supplied_qty", F.lit(0)).cast("long")
        .alias("supplied_qty"),
        F.coalesce("consumed_qty", F.lit(0)).cast("long")
        .alias("consumed_qty"),
    )
    return j.select(
        "nation", "supplied_qty", "consumed_qty",
        F.when(F.col("consumed_qty") > 0,
               F.round(F.col("supplied_qty") / F.col("consumed_qty"), 6))
        .alias("supply_ratio"),
    )


def q_revenue_growth(spark, sf_dir):
    """Year-over-year revenue growth per nation: exact integer yearly
    revenue with the growth ratio as the ONLY float op (lag window per
    nation over <= |years| rows — the bounded offsets-table role); the
    first year emits NULL growth, never a fake 0 (no prior year is not
    zero growth)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    per = (
        o.select("o_custkey",
                 F.year("o_orderdate").cast("int").alias("year"),
                 F.round(F.col("o_totalprice") * 100, 0).cast("long")
                 .alias("pc"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "year")
        .agg(F.sum("pc").cast("long").alias("rev_c"))
    )
    w = Window.partitionBy("nation").orderBy("year")
    prev = F.lag("rev_c").over(w)
    return per.select(
        "nation", "year",
        F.round(F.col("rev_c") / F.lit(100.0), 2).alias("revenue"),
        F.round((F.lit(100) * (F.col("rev_c") - prev)) / prev, 6)
        .alias("yoy_pct"),
    )


def q_cheapest_supplier(spark, sf_dir):
    """TPC-H-Q2 shape over the observed catalog: per part the supplier
    with the LOWEST observed unit price (min over exact integer 1e-4
    cents, ties to the smaller suppkey — a struct-min total order, one
    map-side-combined agg, no window).  The min rides (unit_u, suppkey)
    packed lexicographically; only the winners join the supplier
    dimension."""
    cat = _observed_catalog(spark, sf_dir)
    best = (
        cat.groupBy("l_partkey")
        .agg(F.min(F.struct("unit_u", "l_suppkey")).alias("m"))
        .select(F.col("l_partkey").alias("p_partkey"),
                F.col("m.l_suppkey").alias("s_suppkey"),
                F.col("m.unit_u").alias("unit_u"))
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name")
    # half-up to 4 decimals as an INTEGER op (engines' float round()
    # disagree on exact .5 ties — the trade_volume lesson)
    return best.join(s, "s_suppkey").select(
        "p_partkey", "s_suppkey", "s_name",
        (F.expr("(unit_u + 50) div 100").cast("long") / F.lit(1e4))
        .alias("unit_price"))


def q_dominant_suppliers(spark, sf_dir):
    """TPC-H-Q20 shape: suppliers holding an OUTSIZED share (> 1/8) of
    a part's total observed quantity — concentrated-supply risk, per
    supplier.  With ~100 active suppliers the fair share is ~1%, so
    1/8 flags a 12.5x overweight; a strict >1/2 majority never occurs
    in this near-uniform synthetic catalog (the 0-row lesson — a
    threshold that can't fire proves nothing).  The share test is a
    pure integer cross-multiply (8 * supplier_qty > part_total)
    against the part aggregate rejoined on its own partitioning."""
    cat = _observed_catalog(spark, sf_dir)
    per = cat.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").cast("long").alias("sq"))
    tot = per.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("sq").cast("long").alias("st"))
    dom = per.join(tot, F.col("l_partkey") == F.col("pk")).where(
        F.lit(8) * F.col("sq") > F.col("st"))
    return dom.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts_dominated"),
        F.sum("sq").cast("long").alias("qty_mass"))


def q_price_dispersion(spark, sf_dir):
    """Per-brand unit-price dispersion: how differently the same part
    sells across lines — (parts, parts with any spread, mean relative
    spread (max-min)/min).  Spread membership is decided on EXACT
    integer unit_u; the per-part ratio is the only float op, averaged
    per brand and rounded 6dp."""
    cat = _observed_catalog(spark, sf_dir)
    per = cat.groupBy("l_partkey").agg(
        F.min("unit_u").alias("lo"), F.max("unit_u").alias("hi"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = per.join(p, F.col("l_partkey") == F.col("p_partkey"))
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.when(F.col("hi") > F.col("lo"), 1).otherwise(0))
        .cast("long").alias("n_spread"),
        F.round(F.avg((F.col("hi") - F.col("lo")) / F.col("lo")), 6)
        .alias("mean_rel_spread"))


def q_reorder_gaps(spark, sf_dir):
    """Repeat-purchase interval quantiles: days between a customer's
    consecutive orders through the proven histogram-quantile kernel —
    the replenishment-cycle read-out behind dormancy cutoffs (Q22's
    'since' parameter stops being folklore).  One per-customer window
    lag under the pinned (date, orderkey) order; exact integer day
    gaps."""
    from pyspark.sql import Window

    from plato_spark.functions.quantiles import histogram_quantiles

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("long").alias("day_i"))
    w = Window.partitionBy("o_custkey").orderBy("day_i", "o_orderkey")
    gaps = o.select(
        (F.col("day_i") - F.lag("day_i").over(w)).cast("double")
        .alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    return histogram_quantiles(gaps, "gap_days",
                               quantiles=(0.5, 0.9, 0.99), nbins=256)


def q_balance_deciles(spark, sf_dir):
    """Customer account-balance decile profile: per decile (0 =
    richest) the customer count and exact min/max/sum balance in cents.
    Deciles come from the vid-encoder DISTRIBUTED rank
    (graph/edges.build_dictionary on the rankcorr composite int64 key
    custkey - bal_c*2^24, whose ascending order IS (bal DESC, custkey))
    — never ntile(), which is an unpartitioned window = a global sort
    at 100 TB.  decile = (rank * 10) div n, one scalar broadcast."""
    from plato_spark.graph.edges import build_dictionary

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_c"))
    keyed = c.select(
        "bal_c",
        (F.col("c_custkey") - F.col("bal_c") * F.lit(1 << 24))
        .cast("long").alias("vkey"))
    d = build_dictionary(keyed.select("vkey"), 8)
    ranked = keyed.join(d, "vkey").select(
        "bal_c", F.col("id").alias("rank"))
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select("bal_c",
                F.expr("(rank * 10) div n").cast("int").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             F.min("bal_c").cast("long").alias("min_bal_c"),
             F.max("bal_c").cast("long").alias("max_bal_c"),
             F.sum("bal_c").cast("long").alias("sum_bal_c"))
    )


def q_trailing_revenue(spark, sf_dir):
    """7-day trailing order revenue per priority: per (priority, day)
    the day's exact revenue and the RANGE-framed trailing week — the
    smoothed demand curve.  The sliding aggregate runs over the
    PRE-AGGREGATED per-day table (<= |priorities| x |days| rows — the
    bounded offsets-table role), partitioned by priority, with a RANGE
    BETWEEN 6 PRECEDING frame on the integer epoch day: RANGE on exact
    ints has identical semantics in both engines and skips calendar
    gaps correctly where a ROWS frame would not."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    per = (
        o.select("o_orderpriority",
                 F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
                 .cast("long").alias("day_i"),
                 F.round(F.col("o_totalprice") * 100, 0).cast("long")
                 .alias("pc"))
        .groupBy("o_orderpriority", "day_i")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
             F.sum("pc").cast("long").alias("rev_c"))
    )
    w = (Window.partitionBy("o_orderpriority").orderBy("day_i")
         .rangeBetween(-6, 0))
    return per.select(
        F.col("o_orderpriority").alias("priority"), "day_i", "n_orders",
        F.round(F.col("rev_c") / F.lit(100.0), 2).alias("revenue"),
        F.round(F.sum("rev_c").over(w) / F.lit(100.0), 2)
        .alias("trailing_7d_revenue"),
    )


def q_shipping_latency(spark, sf_dir):
    """Order-to-first-shipment latency quantiles per priority: exact
    integer day gaps (min ship date per order minus order date) through
    the in-plan per-group histogram-quantile kernel — does paying for
    1-URGENT actually ship sooner?  One map-side-combined min per
    order + one orderkey join feed the proven group_quantiles chain."""
    from plato_spark.functions.quantiles import group_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    first = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship"))
    j = o.select("o_orderkey", "o_orderpriority", "o_orderdate").join(
        first, F.col("o_orderkey") == F.col("l_orderkey"))
    lead = j.select(
        "o_orderpriority",
        F.datediff(F.col("first_ship"), F.col("o_orderdate"))
        .cast("double").alias("lead_days"))
    return group_quantiles(lead, "o_orderpriority", "lead_days")


def q_segment_unpivot(spark, sf_dir):
    """UNPIVOT (melt) of the segment_pivot contingency back to long
    form: (nation, segment, n_customers) INCLUDING explicit zero cells
    — the operator-class complement of pivot (Spark's unpivot compiles
    to one Expand, no join, no shuffle beyond the pivot's own).
    Distinct from segment_mix, which only emits observed pairs."""
    piv = q_segment_pivot(spark, sf_dir)
    return piv.unpivot(
        "nation", [s.lower() for s in MKT_SEGMENTS],
        "segment", "n_customers",
    ).select("nation", F.upper(F.col("segment")).alias("segment"),
             F.col("n_customers").cast("long").alias("n_customers"))


def q_brand_size_lift(spark, sf_dir):
    """Brand x size-decile contingency with independence lift:
    observed count and n*N / (brand_total * size_total) — pairs with
    lift far from 1 are where the catalog's brand lines specialize by
    size.  Pure integer margins via two broadcast-scale rejoins of the
    cell table onto its own marginals; ONE float division, rounded
    6dp."""
    p = load_table(spark, sf_dir, "part").select(
        "p_brand",
        F.expr("(p_size - 1) div 10").cast("int").alias("size_bucket"))
    cells = p.groupBy("p_brand", "size_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    rb = cells.groupBy("p_brand").agg(
        F.sum("n").cast("long").alias("brand_total"))
    cs = cells.groupBy("size_bucket").agg(
        F.sum("n").cast("long").alias("size_total"))
    tot = cells.agg(F.sum("n").cast("long").alias("total"))
    return (
        cells.join(F.broadcast(rb), "p_brand")
        .join(F.broadcast(cs), "size_bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "p_brand", "size_bucket", "n", "brand_total", "size_total",
            F.round((F.col("n") * F.col("total")).cast("double")
                    / (F.col("brand_total") * F.col("size_total")), 6)
            .alias("lift"),
        )
    )


def q_trade_volume(spark, sf_dir):
    """TPC-H-Q7-shape nation-pair trade volume per ship year
    (functions/relational.trade_volume): the first lineitem-to-supplier
    join emitting the full cross-nation trade matrix, nation tags
    broadcast, exact integer revenue."""
    from plato_spark.functions.relational import trade_volume

    return trade_volume(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def q_revenue_concentration(spark, sf_dir):
    """Revenue concentration: share of total order value held by the
    top-k customers (k = 10, 100) — the whale-dependence audit
    (pagerank_concentration's business twin).  Exact integer cents,
    top-k under the (revenue DESC, custkey) total order, one division
    per k."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long").alias("rc"))
    tot = per.agg(F.sum("rc").cast("long").alias("tot"))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("rc"), F.asc("o_custkey"))
    top = per.orderBy(F.desc("rc"), F.asc("o_custkey")).limit(100).select(
        "rc", F.row_number().over(w).alias("rn"))
    ks = spark_k = top.sparkSession.createDataFrame([(10,), (100,)], "k int")
    return (
        ks.join(top, F.col("rn") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("rc").cast("long").alias("mass_cents"))
        .crossJoin(F.broadcast(tot))
        .select("k", "mass_cents", "tot",
                F.round((F.lit(100) * F.col("mass_cents")) / F.col("tot"), 6)
                .alias("share_pct"))
    )


def q_revenue_rollup_totals(spark, sf_dir):
    """Q5-shape revenue with ROLLUP grouping sets
    (functions/relational.revenue_rollup_totals): leaf + per-region
    subtotal + grand total in ONE Expand pass, grouping-id lvl column
    disambiguating subtotal NULLs."""
    from plato_spark.functions.relational import revenue_rollup_totals

    return revenue_rollup_totals(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_contamination(spark, sf_dir):
    """Benchmark-contamination scan: word-8-gram overlap between the
    training split and a deterministic held-out eval split
    (portable_h1('eval|'||doc_id) % 17 == 0 — ~6% of docs). The synthetic
    corpus rarely collides on 8-grams naturally, so a deterministic
    11-token "benchmark passage" (7 variants keyed by doc_id % 7) is
    planted into every eval doc and into train docs with doc_id % 13 == 0
    — mirrored verbatim in the oracle — giving the scan real leaked
    passages to find (4 internal 8-grams per planted pair). Returns the
    contaminated train docs with shared-shingle / eval-doc counts."""
    from plato_spark.functions.dedup import contamination_check
    from plato_spark.functions.text import portable_h1

    docs = load_table(spark, sf_dir, "documents")
    is_eval = (
        portable_h1(F.concat(F.lit("eval|"), F.col("doc_id").cast("string"))) % 17
        == 0
    )
    passage = F.concat(
        F.lit(" bench passage alpha beta gamma delta epsilon zeta eta theta v"),
        (F.col("doc_id") % 7).cast("string"),
    )
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(is_eval | (F.col("doc_id") % 13 == 0), passage)
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return contamination_check(
        planted.where(~is_eval), planted.where(is_eval), n=CONTAM_NGRAM
    )


def q_zorder_key(spark, sf_dir):
    """Morton/Z-order layout key over (user_id, absolute-hour) for the
    event stream (functions/layout.zorder_key): the write-time
    clustering order whose footer stats prune scans on EITHER filter
    dimension; pure exact bit arithmetic, shuffle-free."""
    from plato_spark.functions.layout import zorder_key

    ev = load_table(spark, sf_dir, "events")
    return zorder_key(
        ev, "event_id",
        F.col("user_id"),
        F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(3_600_000_000)),
        bits=16,
    ).select(F.col("id").alias("event_id"), "z")


def q_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-shape top-10 unshipped-revenue orders for the BUILDING
    segment (functions/relational.shipping_priority): broadcast
    segment-filtered customers, exact integer revenue folds,
    TakeOrderedAndProject under a total order."""
    from plato_spark.functions.relational import shipping_priority

    return shipping_priority(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
    )


def q_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shape pricing summary over lineitem: exact integer-cents
    folds at scales 1e2/1e4/1e6, one rounded IEEE division per average
    (functions/relational.pricing_summary)."""
    from plato_spark.functions.relational import pricing_summary

    return pricing_summary(load_table(spark, sf_dir, "lineitem"))


def q_large_orders(spark, sf_dir):
    """TPC-H-Q18-shape large-quantity orders
    (functions/relational.large_orders): map-side-combined per-order
    quantity fold, HAVING filter to a tiny qualifying set, then only
    the SMALL side ever broadcasts — against orders, then against
    customer (never the reverse)."""
    from plato_spark.functions.relational import large_orders

    return large_orders(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
    )


def q_promo_revenue(spark, sf_dir):
    """TPC-H-Q14-shape promo revenue share per ship month
    (functions/relational.promo_revenue): broadcast part dimension,
    exact integer cents x discount-unit folds, one rounded IEEE
    division per month."""
    from plato_spark.functions.relational import promo_revenue

    return promo_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def q_out_of_order_stats(spark, sf_dir):
    """Per-user event-stream disorder audit: with event_id as arrival
    order (the deterministic stand-in for ingestion sequence), an event
    is LATE when its timestamp precedes the running max over everything
    that arrived before it.  Reports n_events, n_late, max lateness
    (exact epoch-micro integers) and the late fraction — the number
    that sizes a streaming watermark: allowedLateness must exceed the
    observed max_lateness_us to avoid dropping these rows.  One window
    pass (partitioned by user — never a global sort) + one agg."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    flagged = ev.select(
        "user_id", "ts_us", F.max("ts_us").over(w).alias("pm"))
    late = F.when(F.col("pm") > F.col("ts_us"), 1).otherwise(0)
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(late).cast("long").alias("n_late"),
        F.coalesce(
            F.max(F.when(F.col("pm") > F.col("ts_us"),
                         F.col("pm") - F.col("ts_us"))),
            F.lit(0)).cast("long").alias("max_lateness_us"),
    ).select(
        "user_id", "n_events", "n_late", "max_lateness_us",
        F.round(F.col("n_late") / F.col("n_events"), 6).alias("late_frac"),
    )


def q_nation_arpu(spark, sf_dir):
    """Average revenue per customer BY NATION — the per-capita view the
    raw rollup hides (a big nation with many idle customers can out-
    revenue a small engaged one while losing per head).  Exact cents,
    customer counts from the dimension (idle customers stay in the
    denominator), one division per nation."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("cents"))
    per = (
        c.select("c_custkey", "c_nationkey")
        .join(rev.withColumnRenamed("o_custkey", "c_custkey"),
              "c_custkey", "left")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             F.sum(F.coalesce("cents", F.lit(0))).cast("long")
             .alias("revenue_cents"))
    )
    return per.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nationkey"),
                             "n_name")), "c_nationkey"
    ).select(
        F.col("c_nationkey").alias("nationkey"), "n_name",
        "n_customers", "revenue_cents",
        F.round(F.col("revenue_cents") / F.col("n_customers") / 100, 6)
        .alias("arpu"))


def q_linenumber_audit(spark, sf_dir):
    """Line-number integrity of orders: l_linenumber should be a dense
    1..k sequence per order — violations (max != count, or duplicates
    collapsing the distinct count) flag partial deletes / double
    ingestion.  One grouped pass, exact counts, one rounded ratio."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("l_linenumber").cast("long").alias("nd"),
        F.max("l_linenumber").cast("long").alias("mx"),
        F.min("l_linenumber").cast("long").alias("mn"))
    bad = (F.col("mx") != F.col("n")) | (F.col("nd") != F.col("n")) \
        | (F.col("mn") != 1)
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(bad.cast("int")).cast("long").alias("n_violations"),
    ).select(
        "*",
        F.round(F.col("n_violations") / F.col("n_orders"), 6)
        .alias("violation_rate"))


def q_supplier_brand_focus(spark, sf_dir):
    """Per-supplier brand specialization: the Herfindahl concentration
    of each supplier's line volume over part brands (the entropy-free
    mixture scalar, lang_concentration's business twin) — 1.0 = single-
    brand specialist, 1/n_brands = perfectly diversified.  Exact
    integer cross-multiplication, ONE division per supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p.select(
        F.col("p_partkey").alias("l_partkey"), "p_brand")), "l_partkey")
    per = j.groupBy("l_suppkey", "p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    return per.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.sum("c").cast("long").alias("n_lines"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    ).select(
        "l_suppkey", "n_brands", "n_lines",
        F.round(F.col("ss") / (F.col("n_lines") * F.col("n_lines")), 6)
        .alias("hhi"))


def q_monthly_profile(spark, sf_dir):
    """Calendar-month seasonality of orders (the month-of-year slot
    beside dow_profile and hourly_profile): per month 1-12, order
    count, exact cents revenue, and each month's share of both — the
    seasonality prior behind inventory and the deseasonalized trend
    reads."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(
        F.month(F.col("o_orderdate").cast("date")).cast("int")
        .alias("month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("revenue_cents"))
    tot = per.agg(F.sum("n_orders").alias("no"),
                  F.sum("revenue_cents").alias("rc"))
    return per.crossJoin(F.broadcast(tot)).select(
        "month", "n_orders", "revenue_cents",
        F.round(F.col("n_orders") / F.col("no"), 6).alias("order_share"),
        F.round(F.col("revenue_cents") / F.col("rc"), 6)
        .alias("revenue_share"))


def q_tax_incidence(spark, sf_dir):
    """Tax-rate incidence rollup — the one lineitem column (l_tax) with
    no cut of its own until now: per integer tax band (rate x 100),
    line counts, taxable base and collected tax in EXACT integer
    cent-percent units (base_cents x tax_units — no float tax math),
    plus each band's share of total collections."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(
        F.round(F.col("l_tax") * 100, 0).cast("long").alias("tax_pct")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("base_cents"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")
              * F.round(F.col("l_tax") * 100, 0).cast("long"))
        .cast("long").alias("collected_cpct"))
    tot = per.agg(F.sum("collected_cpct").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "tax_pct", "n_lines", "base_cents", "collected_cpct",
        F.when(F.col("t") > 0,
               F.round(F.col("collected_cpct") / F.col("t"), 6))
        .alias("collection_share"))


def q_lineitem_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation over the four lineitem numerics
    (quantity, extendedprice, discount, tax) — discount_qty_corr's
    single pair generalized to the full matrix, every moment an exact
    integer fold (values lifted to integer units) with float entering
    only at the two correctly-rounded sqrts and one division per pair.
    The feature-redundancy screen before any modeling."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = {
        "quantity": F.col("l_quantity").cast("long"),
        "extendedprice": F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long"),
        "discount": F.round(F.col("l_discount") * 100, 0).cast("long"),
        "tax": F.round(F.col("l_tax") * 100, 0).cast("long"),
    }
    v = li.select(*[e.alias(k) for k, e in cols.items()])
    names = list(cols)
    # decimal(38) folds: n * sum(x^2) overflows int64 at cent scale
    # (6e4 rows x 1e14 per-row squares already ~6e18)
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast(dec).alias("n")]
    for k in names:
        aggs.append(F.sum(F.col(k)).cast(dec).alias(f"s_{k}"))
        aggs.append(F.sum(F.col(k).cast(dec) * F.col(k))
                    .alias(f"ss_{k}"))
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            aggs.append(F.sum(F.col(a).cast(dec) * F.col(b))
                        .alias(f"sp_{a}_{b}"))
    m = v.agg(*aggs)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            num = F.col("n") * F.col(f"sp_{a}_{b}") \
                - F.col(f"s_{a}") * F.col(f"s_{b}")
            va = F.col("n") * F.col(f"ss_{a}") \
                - F.col(f"s_{a}") * F.col(f"s_{a}")
            vb = F.col("n") * F.col(f"ss_{b}") \
                - F.col(f"s_{b}") * F.col(f"s_{b}")
            rows.append(m.select(
                F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                F.round(num.cast("double")
                        / F.sqrt(va.cast("double") * vb.cast("double")),
                        6).alias("pearson")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def q_bracket_balance(spark, sf_dir):
    """Per-source bracket/quote hygiene: docs whose parentheses don't
    balance (open != close counts) or whose double-quote count is odd —
    the extraction-damage detector (truncated docs, stripped markup).
    Exact regex counts, one rounded ratio."""
    docs = load_table(spark, sf_dir, "documents")

    def n(pat):
        return F.size(F.regexp_extract_all("text", F.lit(pat),
                                           F.lit(0))).cast("long")

    per = docs.select(
        "source",
        (n(r"\(") != n(r"\)")).cast("int").alias("paren_bad"),
        (F.pmod(n("\""), F.lit(2)) == 1).cast("int").alias("quote_bad"))
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("paren_bad").cast("long").alias("n_unbalanced_paren"),
        F.sum("quote_bad").cast("long").alias("n_odd_quotes"),
    ).select(
        "*",
        F.round((F.col("n_unbalanced_paren") + F.col("n_odd_quotes"))
                / F.col("n_docs"), 6).alias("damage_rate"))


def q_ptype_revenue(spark, sf_dir):
    """Revenue rollup over the part TYPE tier (the one part dimension
    column without its own cut): broadcast part join, exact integer
    cents, per-tier share with one division each."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p.select(
        F.col("p_partkey").alias("l_partkey"), "p_type")), "l_partkey")
    per = j.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("cents"))
    tot = per.agg(F.sum("cents").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "p_type", "n_lines", F.col("cents").alias("revenue_cents"),
        F.round(F.col("cents") / F.col("total"), 6).alias("share"))


def q_supplier_rank_corr(spark, sf_dir):
    """Spearman rank correlation between supplier account balance and
    shipped revenue — does the balance sheet predict the order book? —
    through the exact integer identity rho = 1 - 6*sum(d^2)/(n(n^2-1))
    over deterministic total-order ranks (value, then suppkey — the
    centrality_rank_corr tie discipline).  One row, all-integer folds,
    one division."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("cents"))
    j = s.select("s_suppkey",
                 F.round(F.col("s_acctbal") * 100, 0).cast("long")
                 .alias("bal")).join(rev, "s_suppkey")
    wa = Window.orderBy(F.col("bal").asc(), F.col("s_suppkey").asc())
    wb = Window.orderBy(F.col("cents").asc(), F.col("s_suppkey").asc())
    ranked = j.select(
        "s_suppkey",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"))
    n = j.count()
    agg = ranked.agg(
        F.sum((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")))
        .cast("long").alias("d2"))
    return agg.select(
        F.lit(n).cast("long").alias("n_suppliers"),
        "d2",
        F.round(1 - 6 * F.col("d2")
                / F.lit(float(n) * (n * n - 1)), 6).alias("spearman"))


def q_supplier_percentile(spark, sf_dir):
    """Each supplier's revenue percentile WITHIN its nation —
    percent_rank = (rank-1)/(n-1), an EXACT rational from two window
    integers (the one window statistic that needs no quantile math at
    all), ties sharing a rank under (revenue, suppkey) total order
    broken deterministically.  The cross-nation league table."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per = li.groupBy("l_suppkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("cents"))
    j = per.join(s.select(F.col("s_suppkey").alias("l_suppkey"),
                          "s_nationkey"), "l_suppkey")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("cents").asc(), F.col("l_suppkey").asc())
    return j.select(
        F.col("l_suppkey").alias("s_suppkey"), "s_nationkey", "cents",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"))


def q_gini_mean_difference(spark, sf_dir):
    """Gini mean difference of order values — the robust dispersion
    metric E|X - X'| — WITHOUT the O(n^2) pair join: over values sorted
    ascending, the UNORDERED pairwise sum sum_{i<j}(x_j - x_i) equals
    sum x_(i) * (2i - n - 1) — one rank window + one exact integer fold
    (cents * small integers); GMD doubles it over n(n-1) ordered pairs,
    and relative_gmd = GMD/mean (exactly twice the Gini coefficient).
    Two divisions at read-out."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    v = o.select(F.round(F.col("o_totalprice") * 100, 0).cast("long")
                 .alias("c"), "o_orderkey")
    w = Window.orderBy(F.col("c").asc(), F.col("o_orderkey").asc())
    ranked = v.select("c", F.row_number().over(w).alias("i"))
    n = v.count()
    agg = ranked.agg(
        F.sum(F.col("c") * (2 * F.col("i") - n - 1)).cast("long")
        .alias("pairsum"),
        F.sum("c").cast("long").alias("total"))
    return agg.select(
        F.lit(n).cast("long").alias("n_orders"),
        "pairsum", "total",
        F.round(2 * F.col("pairsum") / F.lit(float(n) * (n - 1)) / 100,
                6).alias("gmd"),
        F.round(2 * F.col("pairsum") / F.lit(float(n - 1))
                / F.col("total"), 6).alias("relative_gmd"))


def q_dup_order_audit(spark, sf_dir):
    """Suspect-duplicate audit: orders sharing (customer, order date,
    exact total cents) — the double-submit / replay detector a billing
    pipeline runs.  One row of exact counts."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(
        "o_custkey", F.col("o_orderdate").cast("date").alias("od"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
        .alias("cents")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).cast("long")
        .alias("n_dup_groups"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
        .cast("long").alias("n_dup_orders"))


def q_single_source_parts(spark, sf_dir):
    """Supply-chain concentration risk: parts served by exactly ONE
    supplier (per the lineitem history) and the exact revenue share
    riding on them — the single-point-of-failure audit.  One row,
    integer cents, one division."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("cents"))
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.when(F.col("n_supp") == 1, 1).otherwise(0))
        .cast("long").alias("n_single_source"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.sum(F.when(F.col("n_supp") == 1, F.col("cents")).otherwise(0))
        .cast("long").alias("at_risk_cents"),
    ).select(
        "*",
        F.round(F.col("at_risk_cents") / F.col("revenue_cents"), 6)
        .alias("at_risk_share"))


def q_customer_value_drift(spark, sf_dir):
    """Are repeat customers spending more over time?  Per multi-order
    customer, last order value minus first (order by date, ties by
    orderkey — exact cents), rolled into one row: growing / shrinking /
    flat counts and the mean drift.  The retention-quality read beside
    repeat_customer_revenue's share."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
        .alias("cents"),
        F.col("o_orderdate").cast("date").alias("od"), "o_orderkey")
    wf = Window.partitionBy("o_custkey").orderBy(
        F.col("od").asc(), F.col("o_orderkey").asc())
    wl = Window.partitionBy("o_custkey").orderBy(
        F.col("od").desc(), F.col("o_orderkey").desc())
    per = base.select(
        "o_custkey",
        F.first("cents").over(wf).alias("first_c"),
        F.first("cents").over(wl).alias("last_c"),
        F.count(F.lit(1)).over(
            Window.partitionBy("o_custkey")).alias("n"),
    ).distinct().where(F.col("n") >= 2)
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_multi_customers"),
        F.sum(F.when(F.col("last_c") > F.col("first_c"), 1).otherwise(0))
        .cast("long").alias("n_growing"),
        F.sum(F.when(F.col("last_c") < F.col("first_c"), 1).otherwise(0))
        .cast("long").alias("n_shrinking"),
        F.sum(F.col("last_c") - F.col("first_c")).cast("long")
        .alias("drift_cents_sum"),
    ).select(
        "*",
        F.round(F.col("drift_cents_sum") / F.col("n_multi_customers")
                / 100, 6).alias("mean_drift"))


def q_revenue_lorenz(spark, sf_dir):
    """Lorenz curve deciles of customer revenue — the table behind
    revenue_gini's scalar: customers ranked by (revenue, custkey),
    cumulative revenue share at each population decile boundary (exact
    integer rank (q*(n-1)) div 10 + 1 and integer cents; one division
    per row).  Reading: decile 9 at 0.4 means the bottom 90% of
    customers hold 40% of revenue."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("cents"))
    w = (Window.orderBy(F.col("cents").asc(), F.col("o_custkey").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    n = per.count()
    tot = per.agg(F.sum("cents").alias("total"))
    ranked = per.crossJoin(F.broadcast(tot)).select(
        F.row_number().over(
            Window.orderBy(F.col("cents").asc(),
                           F.col("o_custkey").asc())).alias("rn"),
        F.sum("cents").over(w).alias("cum"), "total")
    qs = spark.range(1, 11).select(
        F.col("id").cast("int").alias("decile"),
        (F.expr(f"id * ({n} - 1) div 10") + 1).alias("rn"))
    return qs.join(ranked, "rn").select(
        "decile",
        F.round(F.col("cum") / F.col("total"), 6).alias("cum_share"))


def q_customer_streaks(spark, sf_dir):
    """Per-customer ordering streaks — gaps-and-islands run IN the
    engine (it is usually only our oracle idiom): distinct order days
    per customer, island id = day - dense row number (constant within
    a consecutive-day run), exact max streak and active-day counts."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    days = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date"))
        .cast("long").alias("d")).distinct()
    w = Window.partitionBy("o_custkey").orderBy("d")
    isl = days.select(
        "o_custkey", "d",
        (F.col("d") - F.row_number().over(w)).alias("isl"))
    runs = isl.groupBy("o_custkey", "isl").agg(
        F.count(F.lit(1)).cast("long").alias("run"))
    return runs.groupBy("o_custkey").agg(
        F.sum("run").cast("long").alias("n_active_days"),
        F.max("run").cast("long").alias("max_streak_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"))


def q_repeat_customer_revenue(spark, sf_dir):
    """Repeat-buyer concentration: one row with customer counts and the
    exact share of order revenue held by customers with >= 2 orders —
    the retention-economics headline.  Integer cents, two rounded
    divisions."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("cents"))
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
        .cast("long").alias("n_repeat"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.sum(F.when(F.col("n_orders") >= 2, F.col("cents"))
              .otherwise(0)).cast("long").alias("repeat_revenue_cents"),
    ).select(
        "*",
        F.round(F.col("n_repeat") / F.col("n_customers"), 6)
        .alias("repeat_frac"),
        F.round(F.col("repeat_revenue_cents") / F.col("revenue_cents"),
                6).alias("repeat_revenue_share"))


def q_dormant_balance_gap(spark, sf_dir):
    """Do customers who stopped ordering look different?  Per segment
    (dormant = no order since 2000-01-01 vs active), exact count, mean
    and MEDIAN account balance — balances lifted to integer cents so
    the median is an exact rank pick (lower of the two middles, the
    deterministic convention), no float sums anywhere."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    recent = o.where(
        F.col("o_orderdate").cast("date") >= F.lit("2000-01-01")
    ).select(F.col("o_custkey").alias("c_custkey")).distinct()
    seg = c.join(recent, "c_custkey", "left_semi").select(
        F.lit("active").alias("segment"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents")
    ).unionByName(
        c.join(recent, "c_custkey", "left_anti").select(
            F.lit("dormant").alias("segment"),
            F.round(F.col("c_acctbal") * 100, 0).cast("long")
            .alias("cents")))
    w = Window.partitionBy("segment").orderBy("cents", "segment")
    ranked = seg.select(
        "segment", "cents",
        F.row_number().over(w).alias("rn"))
    n_per = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"))
    med = ranked.join(n_per, "segment").where(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select("segment", F.col("cents").alias("median_cents"))
    return n_per.join(med, "segment").select(
        "segment", "n",
        F.round(F.col("s") / F.col("n") / 100, 6).alias("mean_balance"),
        F.round(F.col("median_cents") / 100, 6).alias("median_balance"))


def q_abc_classification(spark, sf_dir):
    """ABC / Pareto inventory classification of parts by lineitem
    revenue: class A holds rows while the running revenue share is
    <= 80%, B to 95%, C after — boundaries decided by EXACT integer
    cross-multiplication (cum_cents * 100 <= 80 * total_cents), never
    a float share.  The global window runs over the bounded parts
    DIMENSION (post-aggregation), not the fact table; at 100 TB the
    same plan holds because |parts| << |lineitem|."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("cents"))
    w = (Window.orderBy(F.col("cents").desc(), F.col("l_partkey").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    tot = per.agg(F.sum("cents").alias("total"))
    ranked = per.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.sum("cents").over(w).alias("cum"),
        "total")
    cls = F.when(F.col("cum") * 100 <= 80 * F.col("total"), "A") \
        .when(F.col("cum") * 100 <= 95 * F.col("total"), "B") \
        .otherwise("C")
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("class_revenue_cents"),
        F.round(F.sum("cents") / F.max("total"), 6)
        .alias("revenue_share"))


def q_priority_late_orders(spark, sf_dir):
    """TPC-H-Q4-shape order-priority checking: per priority, how many
    orders have AT LEAST ONE line shipped more than 30 days after the
    order date (the EXISTS quantifier decorrelated into one semi-join
    — the Q21 lesson at Q4's simpler shape).  Exact integer counts."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.select(F.col("l_orderkey").alias("o_orderkey"), "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"), "o_orderkey")
        .where(F.col("l_shipdate").cast("date")
               > F.date_add(F.col("o_orderdate").cast("date"), 30))
        .select("o_orderkey").distinct()
    )
    return (
        o.join(late, "o_orderkey", "semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


def q_forecast_revenue(spark, sf_dir):
    """TPC-H-Q6 shape (functions/relational.forecast_revenue): revenue
    delta from mid-band discounts on small-quantity lines in one ship
    year — pure scan + three pushed predicates + single-row fold, the
    no-join end of the Q-family; exact cents x percent-unit int64
    products, integer band compares."""
    from plato_spark.functions.relational import forecast_revenue

    return forecast_revenue(load_table(spark, sf_dir, "lineitem"))


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "zorder_key": q_zorder_key,
    "shipping_priority": q_shipping_priority,
    "contamination": q_contamination,
    "waiting_suppliers": q_waiting_suppliers,
    "market_share": q_market_share,
    "brand_band_revenue": q_brand_band_revenue,
    "ewma_revenue": q_ewma_revenue,
    "revenue_autocorr": q_revenue_autocorr,
    "rfm_segments": q_rfm_segments,
    "join_skew_audit": q_join_skew_audit,
    "discount_qty_corr": q_discount_qty_corr,
    "skyline_parts": q_skyline_parts,
    "benford_audit": q_benford_audit,
    "cohort_ltv": q_cohort_ltv,
    "weighted_median_discount": q_weighted_median_discount,
    "part_name_revenue": q_part_name_revenue,
    "large_orders": q_large_orders,
    "promo_revenue": q_promo_revenue,
    "revenue_rollup_totals": q_revenue_rollup_totals,
    "revenue_concentration": q_revenue_concentration,
    "discount_bands": q_discount_bands,
    "segment_mix": q_segment_mix,
    "order_size_histogram": q_order_size_histogram,
    "local_supplier_volume": q_local_supplier_volume,
    "returned_items": q_returned_items,
    "top_supplier": q_top_supplier,
    "product_profit": q_product_profit,
    "small_qty_revenue": q_small_qty_revenue,
    "dormant_customers": q_dormant_customers,
    "late_shipments": q_late_shipments,
    "customer_distribution": q_customer_distribution,
    "status_priority_cube": q_status_priority_cube,
    "segment_unpivot": q_segment_unpivot,
    "brand_size_lift": q_brand_size_lift,
    "balance_deciles": q_balance_deciles,
    "trailing_revenue": q_trailing_revenue,
    "shipping_latency": q_shipping_latency,
    "reorder_gaps": q_reorder_gaps,
    "cheapest_supplier": q_cheapest_supplier,
    "dominant_suppliers": q_dominant_suppliers,
    "price_dispersion": q_price_dispersion,
    "revenue_growth": q_revenue_growth,
    "open_order_aging": q_open_order_aging,
    "supply_demand_balance": q_supply_demand_balance,
    "priority_drift": q_priority_drift,
    "revenue_gini": q_revenue_gini,
    "integrity_audit": q_integrity_audit,
    "trade_volume": q_trade_volume,
    "dow_profile": q_dow_profile,
    "retention_cohorts": q_retention_cohorts,
    "price_quantiles": q_price_quantiles,
    "revenue_rollup": q_revenue_rollup,
    "value_outliers": q_value_outliers,
    "out_of_order_stats": q_out_of_order_stats,
    "priority_late_orders": q_priority_late_orders,
    "abc_classification": q_abc_classification,
    "repeat_customer_revenue": q_repeat_customer_revenue,
    "dormant_balance_gap": q_dormant_balance_gap,
    "customer_streaks": q_customer_streaks,
    "revenue_lorenz": q_revenue_lorenz,
    "single_source_parts": q_single_source_parts,
    "customer_value_drift": q_customer_value_drift,
    "supplier_percentile": q_supplier_percentile,
    "gini_mean_difference": q_gini_mean_difference,
    "dup_order_audit": q_dup_order_audit,
    "supplier_rank_corr": q_supplier_rank_corr,
    "bracket_balance": q_bracket_balance,
    "ptype_revenue": q_ptype_revenue,
    "tax_incidence": q_tax_incidence,
    "lineitem_corr_matrix": q_lineitem_corr_matrix,
    "monthly_profile": q_monthly_profile,
    "linenumber_audit": q_linenumber_audit,
    "supplier_brand_focus": q_supplier_brand_focus,
    "nation_arpu": q_nation_arpu,
    "forecast_revenue": q_forecast_revenue,
}


ORACLES = {
    "pricing_summary": """
WITH b AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc,
         CAST(round(l_discount * 100, 0) AS BIGINT) AS dc,
         CAST(round(l_tax * 100, 0) AS BIGINT) AS tc
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'),
g AS (
  SELECT l_returnflag, l_linestatus,
         CAST(sum(qty) AS BIGINT) AS sum_qty,
         CAST(sum(pc) AS BIGINT) AS base_c,
         CAST(sum(pc * (100 - dc)) AS BIGINT) AS dp_u,
         CAST(sum(pc * (100 - dc) * (100 + tc)) AS BIGINT) AS ch_u,
         CAST(sum(dc) AS BIGINT) AS dcs,
         CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus, sum_qty,
       round(CAST(base_c AS DOUBLE) / 100.0, 2) AS sum_base,
       round(CAST(dp_u AS DOUBLE) / 1e4, 2) AS sum_disc_price,
       round(CAST(ch_u AS DOUBLE) / 1e6, 2) AS sum_charge,
       round(CAST(sum_qty AS DOUBLE) / n, 6) AS avg_qty,
       round(CAST(base_c AS DOUBLE) / (100.0 * n), 6) AS avg_price,
       round(CAST(dcs AS DOUBLE) / (100.0 * n), 6) AS avg_disc,
       n
FROM g ORDER BY l_returnflag, l_linestatus""",
    "zorder_key": _sql_zorder(16),
    "shipping_priority": """
WITH li AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 100, 0) AS BIGINT) AS rev_u
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1996-01-01'),
g AS MATERIALIZED (
  SELECT li.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
         o.o_orderpriority, CAST(sum(li.rev_u) AS BIGINT) AS rev_u
  FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderdate < TIMESTAMP '1996-01-01'
    AND c.c_mktsegment = 'BUILDING'
  GROUP BY li.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'),
           o.o_orderpriority)
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(CAST(rev_u AS DOUBLE) / 1e4, 2) AS revenue
FROM g ORDER BY rev_u DESC, o_orderdate ASC, l_orderkey ASC LIMIT 10""",
    "contamination": f"""
            WITH planted AS MATERIALIZED (
              SELECT doc_id,
                     text || CASE WHEN
                         {H1_SQL.format(s="('eval|' || CAST(doc_id AS VARCHAR))")} % 17 = 0
                         OR doc_id % 13 = 0
                       THEN ' bench passage alpha beta gamma delta epsilon'
                            || ' zeta eta theta v' || CAST(doc_id % 7 AS VARCHAR)
                       ELSE '' END AS text
              FROM documents),
            t AS MATERIALIZED (
              SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
              FROM planted),
            sh AS MATERIALIZED (SELECT doc_id,
              CASE WHEN length(toks) >= {CONTAM_NGRAM} THEN
                list_distinct([array_to_string(toks[i:i+{CONTAM_NGRAM - 1}], ' ')
                               for i in range(1, length(toks) - {CONTAM_NGRAM - 2})])
              ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
            ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM sh),
            hh AS MATERIALIZED (
              SELECT DISTINCT doc_id, {H1_SQL.format(s='s')} AS h FROM ex),
            ev AS MATERIALIZED (
              SELECT doc_id AS eval_id, h FROM hh
              WHERE {H1_SQL.format(s="('eval|' || CAST(doc_id AS VARCHAR))")} % 17 = 0),
            tr AS (
              SELECT doc_id AS train_id, h FROM hh
              WHERE {H1_SQL.format(s="('eval|' || CAST(doc_id AS VARCHAR))")} % 17 <> 0)
            SELECT train_id, CAST(count(DISTINCT h) AS BIGINT) AS n_shared,
                   CAST(count(DISTINCT eval_id) AS BIGINT) AS n_eval_docs
            FROM tr JOIN ev USING (h) GROUP BY train_id""",
    "waiting_suppliers": """
WITH o AS (SELECT o_orderkey, o_orderdate FROM orders
           WHERE o_orderstatus = 'F'),
l1 AS (SELECT l.l_orderkey, l.l_suppkey
       FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey
       WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
       GROUP BY 1, 2)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN o o3
                    ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name ORDER BY s.s_name""",
    "market_share": """
WITH cust_r AS (SELECT c_custkey
                FROM customer c
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
                WHERE r.r_name = 'ASIA'),
sup AS (SELECT s_suppkey,
               CASE WHEN n.n_name = 'NATION_3' THEN 1 ELSE 0 END
                 AS is_target
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey),
j AS (SELECT CAST(year(o.o_orderdate) AS INTEGER) AS year,
             CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
             * CAST(round((1.0 - l.l_discount) * 100, 0) AS BIGINT)
               AS rev_u,
             sup.is_target
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN sup ON l.l_suppkey = sup.s_suppkey
      WHERE o.o_custkey IN (SELECT c_custkey FROM cust_r)),
a AS (SELECT year, CAST(sum(rev_u) AS BIGINT) AS total_u,
             CAST(sum(rev_u * is_target) AS BIGINT) AS nation_u
      FROM j GROUP BY year)
SELECT year,
       CAST((total_u + 50) // 100 AS BIGINT) / 100.0 AS total_revenue,
       CAST((nation_u + 50) // 100 AS BIGINT) / 100.0 AS nation_revenue,
       round(CAST(nation_u AS DOUBLE) / total_u, 6) AS mkt_share
FROM a ORDER BY year""",
    "brand_band_revenue": """
WITH j AS (SELECT p.p_brand,
             CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
             * CAST(round((1.0 - l.l_discount) * 100, 0) AS BIGINT)
               AS rev_u
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
                  AND l.l_quantity BETWEEN 1 AND 20)
              OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
                  AND l.l_quantity BETWEEN 10 AND 35)
              OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 40
                  AND l.l_quantity BETWEEN 20 AND 50))
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
       CAST((sum(rev_u) + 50) // 100 AS BIGINT) / 100.0 AS revenue
FROM j GROUP BY p_brand ORDER BY p_brand""",
    "ewma_revenue": """
WITH per AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_i,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1),
b AS (SELECT min(day_i) AS lo, max(day_i) AS hi FROM per),
days AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_i FROM b),
filled AS (SELECT d.day_i, CAST(coalesce(p.rev_c, 0) AS BIGINT) AS c
           FROM days d LEFT JOIN per p USING (day_i)),
num AS (SELECT t.day_i,
          CAST(sum(c.c * (CAST(1 AS BIGINT)
                          << CAST(19 - (t.day_i - c.day_i) AS INTEGER)))
               AS BIGINT) AS num
        FROM filled t JOIN filled c
          ON c.day_i BETWEEN t.day_i - 19 AND t.day_i
        GROUP BY 1)
SELECT n.day_i, round(n.num / 104857500.0, 6) AS ewma
FROM num n, b WHERE n.day_i >= b.lo + 19 ORDER BY n.day_i""",
    "revenue_autocorr": """
WITH per AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_i,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1),
b AS (SELECT min(day_i) AS lo, max(day_i) AS hi FROM per),
days AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_i FROM b),
filled AS (SELECT d.day_i, CAST(coalesce(p.rev_c, 0) AS BIGINT) AS c
           FROM days d LEFT JOIN per p USING (day_i)),
pairs AS (SELECT x.c AS x, y.c AS y
          FROM filled x JOIN filled y ON x.day_i = y.day_i + 7),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(x AS HUGEINT) * y) AS sxy
      FROM pairs)
SELECT CAST(n AS BIGINT) AS n_pairs, CAST(7 AS INTEGER) AS lag,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS autocorr
FROM s""",
    "rfm_segments": """
WITH anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
per AS (
  SELECT o_custkey,
         min(CAST(CAST(a.mx AS DATE) - CAST(o_orderdate AS DATE)
                  AS BIGINT)) AS rec_days,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS mon_c
  FROM orders, anchor a GROUP BY o_custkey),
scored AS (
  SELECT CASE WHEN rec_days <= 90 THEN 4 WHEN rec_days <= 365 THEN 3
              WHEN rec_days <= 730 THEN 2 ELSE 1 END AS r_score,
         CASE WHEN freq >= 15 THEN 4 WHEN freq >= 10 THEN 3
              WHEN freq >= 5 THEN 2 ELSE 1 END AS f_score,
         CASE WHEN mon_c >= 400000000 THEN 4
              WHEN mon_c >= 250000000 THEN 3
              WHEN mon_c >= 100000000 THEN 2 ELSE 1 END AS m_score,
         mon_c
  FROM per)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(mon_c) AS DOUBLE)
             / (count(*) * 100.0), 6) AS avg_monetary
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "join_skew_audit": """
WITH ko AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
            GROUP BY l_orderkey),
kp AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
       GROUP BY l_partkey),
ks AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
       GROUP BY l_suppkey),
u AS (
  SELECT 'l_orderkey' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(c) AS BIGINT) AS max_key_rows FROM ko
  UNION ALL
  SELECT 'l_partkey', CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(max(c) AS BIGINT) FROM kp
  UNION ALL
  SELECT 'l_suppkey', CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(max(c) AS BIGINT) FROM ks)
SELECT key_col, n_rows, n_keys, max_key_rows,
       round(CAST(max_key_rows * n_keys AS DOUBLE) / n_rows, 6)
         AS skew_factor,
       round(CAST(max_key_rows AS DOUBLE) / n_rows, 6) AS top_share
FROM u ORDER BY key_col""",
    "discount_qty_corr": """
WITH j AS (SELECT p.p_brand,
             CAST(round(l.l_discount * 100, 0) AS BIGINT) AS x,
             CAST(l.l_quantity AS BIGINT) AS y
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
s AS (SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(x AS HUGEINT) * y) AS sxy
      FROM j GROUP BY p_brand)
SELECT p_brand, CAST(n AS BIGINT) AS n_items,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 6)
            ELSE NULL END AS corr
FROM s ORDER BY p_brand""",
    "skyline_parts": """
WITH p AS (SELECT p_partkey, p_brand, p_size,
             CAST(round(p_retailprice * 100, 0) AS BIGINT) AS pc
           FROM part)
SELECT p.p_partkey, p.p_brand, p.p_size, p.pc / 100.0 AS p_retailprice
FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM p q
  WHERE q.pc <= p.pc AND q.p_size >= p.p_size
    AND (q.pc < p.pc OR q.p_size > p.p_size))
ORDER BY p.p_partkey""",
    "benford_audit": _sql_benford(),
    "cohort_ltv": """
WITH first AS (SELECT o_custkey,
                 CAST(min(year(o_orderdate)) AS INTEGER) AS cohort
               FROM orders GROUP BY o_custkey),
j AS (SELECT o.o_custkey, f.cohort,
             CAST(year(o.o_orderdate) AS INTEGER) - f.cohort AS age,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS pc
      FROM orders o JOIN first f ON o.o_custkey = f.o_custkey)
SELECT cohort, age,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers,
       round(CAST(sum(pc) AS DOUBLE) / 100.0, 2) AS revenue
FROM j GROUP BY cohort, age ORDER BY cohort, age""",
    "weighted_median_discount": """
WITH per AS (SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS d,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
             FROM lineitem GROUP BY 1),
cum AS (SELECT d, CAST(sum(w) OVER (ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cw,
        (SELECT CAST(sum(w) AS BIGINT) FROM per) AS tw
        FROM per),
qs AS (SELECT unnest([0.25, 0.5, 0.75]) AS q)
SELECT CAST(q AS DOUBLE) AS q, min(d) / 100.0 AS discount,
       max(tw) AS total_qty
FROM cum, qs
WHERE cw * 4 >= CAST(q * 4 AS BIGINT) * tw
GROUP BY qs.q ORDER BY qs.q""",
    "part_name_revenue": """
WITH ptok AS (
  SELECT p_partkey, unnest(list_distinct(
           regexp_extract_all(lower(p_name), '[a-z0-9]+'))) AS token
  FROM part),
j AS (SELECT pt.token,
        CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
        * CAST(round((1.0 - l.l_discount) * 100, 0) AS BIGINT) AS rev_u
      FROM lineitem l JOIN ptok pt ON l.l_partkey = pt.p_partkey),
a AS (SELECT token, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(rev_u) AS BIGINT) AS ru
      FROM j GROUP BY token)
SELECT token, n_lines,
       CAST((ru + 50) // 100 AS BIGINT) / 100.0 AS revenue
FROM a ORDER BY ru DESC, token ASC LIMIT 20""",
    "large_orders": """
WITH q AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 200)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice, q.sum_qty
FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_orderkey""",
    "promo_revenue": """
WITH b AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round((1.0 - l_discount) * 100, 0) AS BIGINT) AS rev_u,
         p_type LIKE 'PROMO%' AS is_promo
  FROM lineitem JOIN part ON p_partkey = l_partkey),
g AS (
  SELECT month,
         CAST(sum(CASE WHEN is_promo THEN rev_u ELSE 0 END) AS BIGINT)
           AS promo_u,
         CAST(sum(rev_u) AS BIGINT) AS total_u
  FROM b GROUP BY month)
SELECT month, round(CAST(promo_u AS DOUBLE) / 1e4, 2) AS promo_rev,
       round(CAST(total_u AS DOUBLE) / 1e4, 2) AS total_rev,
       CASE WHEN total_u > 0
            THEN round(CAST(100 * promo_u AS DOUBLE) / total_u, 6)
       END AS promo_pct
FROM g ORDER BY month""",
    "revenue_rollup_totals": """
WITH li AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 10000, 0) AS BIGINT) AS rev_u
  FROM lineitem),
j AS MATERIALIZED (
  SELECT r.r_name, n.n_name, o.o_orderkey, li.rev_u
  FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey)
SELECT r_name AS region, n_name AS nation,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS lvl,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       round(CAST(sum(rev_u) AS DOUBLE) / 1e6, 2) AS revenue
FROM j GROUP BY ROLLUP (r_name, n_name)
ORDER BY lvl, region, nation""",
    "revenue_concentration": """
WITH per AS (SELECT o_custkey,
                    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                         AS BIGINT) AS rc
             FROM orders GROUP BY o_custkey),
tt AS (SELECT CAST(sum(rc) AS BIGINT) AS tot FROM per),
tp AS (SELECT rc, row_number() OVER (ORDER BY rc DESC, o_custkey) AS rn
       FROM per),
kd AS (SELECT CAST(k AS INTEGER) AS k FROM (VALUES (10), (100)) AS t(k))
SELECT k, CAST(sum(tp.rc) AS BIGINT) AS mass_cents, tt.tot,
       round(CAST(100 * sum(tp.rc) AS DOUBLE) / tt.tot, 6) AS share_pct
FROM kd JOIN tp ON tp.rn <= kd.k, tt
GROUP BY k, tt.tot ORDER BY k""",
    "discount_bands": """
WITH b AS (
  SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS discount_pct,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
  FROM lineitem),
g AS (SELECT discount_pct, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(pc) AS BIGINT) AS list_c,
             CAST(sum(pc * (100 - discount_pct)) AS BIGINT) AS disc_u
      FROM b GROUP BY discount_pct)
SELECT discount_pct, n_items,
       round(CAST(list_c AS DOUBLE) / 100.0, 2) AS list_revenue,
       round(CAST(disc_u AS DOUBLE) / 1e4, 2) AS disc_revenue,
       round(CAST(list_c * 100 - disc_u AS DOUBLE) / 1e4, 2) AS forgone
FROM g ORDER BY discount_pct""",
    "segment_mix": """
WITH g AS (SELECT n.n_name AS nation, c.c_mktsegment AS segment,
                  CAST(count(*) AS BIGINT) AS n_customers
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1, 2)
SELECT nation, segment, n_customers,
       round(CAST(100 * n_customers AS DOUBLE)
             / sum(n_customers) OVER (PARTITION BY nation), 6) AS pct
FROM g ORDER BY nation, segment""",
    "order_size_histogram": """
WITH per AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
             FROM lineitem GROUP BY l_orderkey)
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
FROM per GROUP BY n_lines ORDER BY n_lines""",
    "local_supplier_volume": """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 100, 0) AS BIGINT) AS rev_u
  FROM lineitem),
j AS (
  SELECT r.r_name AS region, n.n_name AS nation, li.rev_u
  FROM li
  JOIN orders o ON li.l_orderkey = o.o_orderkey
   AND o.o_orderdate >= TIMESTAMP '1996-01-01'
   AND o.o_orderdate < TIMESTAMP '1997-01-01'
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON li.l_suppkey = s.s_suppkey
   AND c.c_nationkey = s.s_nationkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey)
SELECT region, nation, CAST(count(*) AS BIGINT) AS n_items,
       CAST((sum(rev_u) + 50) // 100 AS BIGINT) / 100.0 AS revenue
FROM j GROUP BY region, nation ORDER BY region, nation""",
    "returned_items": """
WITH li AS (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 100, 0) AS BIGINT) AS rev_u
  FROM lineitem WHERE l_returnflag = 'R'),
per AS (
  SELECT o.o_custkey, CAST(sum(li.rev_u) AS BIGINT) AS rev_u
  FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey),
top AS (
  SELECT o_custkey, rev_u,
         CAST(row_number() OVER (ORDER BY rev_u DESC, o_custkey)
              AS INTEGER) AS rank
  FROM per ORDER BY rev_u DESC, o_custkey LIMIT 20)
SELECT t.rank, c.c_custkey, c.c_name, n.n_name AS nation,
       CAST((t.rev_u + 50) // 100 AS BIGINT) / 100.0 AS ret_revenue
FROM top t JOIN customer c ON t.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY t.rank""",
    "top_supplier": """
WITH per AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
              * CAST(round((1 - l_discount) * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name,
       CAST((p.rev_u + 50) // 100 AS BIGINT) / 100.0 AS total_revenue
FROM per p JOIN supplier s ON p.l_suppkey = s.s_suppkey
WHERE p.rev_u = (SELECT max(rev_u) FROM per)
ORDER BY s.s_suppkey""",
    "product_profit": """
WITH li AS (
  SELECT l_orderkey, l_partkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 100, 0) AS BIGINT) AS rev_u,
         CAST(round(l_quantity, 0) AS BIGINT) AS qty
  FROM lineitem),
j AS (
  SELECT p.p_type, CAST(year(o.o_orderdate) AS INTEGER) AS year,
         li.rev_u - li.qty
           * CAST(round(p.p_retailprice * 100, 0) AS BIGINT) * 100
           AS profit_u
  FROM li JOIN part p ON li.l_partkey = p.p_partkey
  JOIN orders o ON li.l_orderkey = o.o_orderkey),
g AS (
  SELECT p_type, year, CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(profit_u) AS BIGINT) AS profit_u
  FROM j GROUP BY p_type, year)
SELECT p_type, year, n_items,
       CAST(CASE WHEN profit_u >= 0 THEN (profit_u + 50) // 100
            ELSE -((-profit_u + 50) // 100) END AS BIGINT) / 100.0
         AS profit
FROM g ORDER BY p_type, year""",
    "small_qty_revenue": """
WITH li AS (
  SELECT l_partkey, CAST(round(l_quantity, 0) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c
  FROM lineitem),
per AS (
  SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(qty) AS BIGINT) AS sum_qty
  FROM li GROUP BY l_partkey)
SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_small_lines,
       round(CAST(sum(li.price_c) AS DOUBLE) / 100.0, 2) AS lost_revenue
FROM li JOIN per ON li.l_partkey = per.pk
JOIN part p ON li.l_partkey = p.p_partkey
WHERE 5 * li.qty * per.n_lines < per.sum_qty
GROUP BY p.p_brand ORDER BY p.p_brand""",
    "dormant_customers": """
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
  FROM customer),
st AS (SELECT CAST(count(*) AS BIGINT) AS n_pos,
              CAST(sum(bal_c) AS BIGINT) AS sum_pos
       FROM c WHERE bal_c > 0)
SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(c.bal_c) AS DOUBLE) / 100.0, 2) AS total_acctbal
FROM c
CROSS JOIN st
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.bal_c * st.n_pos > st.sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n.n_name ORDER BY nation""",
    "late_shipments": """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",
    "customer_distribution": """
WITH per AS (
  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey)
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM per GROUP BY n_orders ORDER BY n_orders""",
    "status_priority_cube": """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
            AS INTEGER) AS lvl,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS DOUBLE) / 100.0, 2) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY lvl, status, priority""",
    "segment_unpivot": """
WITH g AS (SELECT n.n_name AS nation, c.c_mktsegment AS segment,
                  CAST(count(*) AS BIGINT) AS n_customers
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1, 2),
nats AS (SELECT DISTINCT n_name AS nation FROM nation
         WHERE n_nationkey IN (SELECT c_nationkey FROM customer)),
segs AS (SELECT seg FROM (VALUES ('AUTOMOBILE'), ('BUILDING'),
                                 ('FURNITURE'), ('HOUSEHOLD'),
                                 ('MACHINERY')) AS t(seg))
SELECT nats.nation AS nation, segs.seg AS segment,
       COALESCE(g.n_customers, 0) AS n_customers
FROM nats CROSS JOIN segs
LEFT JOIN g ON g.nation = nats.nation AND g.segment = segs.seg
ORDER BY nats.nation, segs.seg""",
    "brand_size_lift": """
WITH p AS (SELECT p_brand, CAST((p_size - 1) // 10 AS INTEGER)
                    AS size_bucket
           FROM part),
cells AS (SELECT p_brand, size_bucket, CAST(count(*) AS BIGINT) AS n
          FROM p GROUP BY p_brand, size_bucket),
rb AS (SELECT p_brand, CAST(sum(n) AS BIGINT) AS brand_total
       FROM cells GROUP BY p_brand),
cs AS (SELECT size_bucket, CAST(sum(n) AS BIGINT) AS size_total
       FROM cells GROUP BY size_bucket),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cells)
SELECT c.p_brand, c.size_bucket, c.n, rb.brand_total, cs.size_total,
       round(CAST(c.n * tot.total AS DOUBLE)
             / (rb.brand_total * cs.size_total), 6) AS lift
FROM cells c JOIN rb ON c.p_brand = rb.p_brand
JOIN cs ON c.size_bucket = cs.size_bucket
CROSS JOIN tot
ORDER BY c.p_brand, c.size_bucket""",
    "balance_deciles": """
WITH c AS (SELECT c_custkey,
                  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
           FROM customer),
r AS (SELECT bal_c,
             row_number() OVER (ORDER BY bal_c DESC, c_custkey) - 1
               AS rank
      FROM c),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c)
SELECT CAST((r.rank * 10) // n.n AS INTEGER) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(min(bal_c) AS BIGINT) AS min_bal_c,
       CAST(max(bal_c) AS BIGINT) AS max_bal_c,
       CAST(sum(bal_c) AS BIGINT) AS sum_bal_c
FROM r CROSS JOIN n GROUP BY 1 ORDER BY decile""",
    "trailing_revenue": """
WITH per AS (
  SELECT o_orderpriority,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_i,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1, 2)
SELECT o_orderpriority AS priority, day_i, n_orders,
       round(CAST(rev_c AS DOUBLE) / 100.0, 2) AS revenue,
       round(CAST(sum(rev_c) OVER (
               PARTITION BY o_orderpriority ORDER BY day_i
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS DOUBLE) / 100.0, 2) AS trailing_7d_revenue
FROM per ORDER BY priority, day_i""",
    "shipping_latency": "WITH " + _sql_gq_chain(
            256, (0.5, 0.9, 0.99),
            """SELECT o.o_orderpriority AS g,
                      CAST(CAST(f.first_ship AS DATE)
                           - CAST(o.o_orderdate AS DATE) AS DOUBLE) AS x
               FROM orders o JOIN (
                 SELECT l_orderkey, min(l_shipdate) AS first_ship
                 FROM lineitem GROUP BY l_orderkey) f
               ON o.o_orderkey = f.l_orderkey""",
        ) + "\nSELECT g AS o_orderpriority, q, value FROM val"
            "\nORDER BY o_orderpriority, q",
    "reorder_gaps": _sql_reorder_gaps(),
    "cheapest_supplier": """
WITH cat AS MATERIALIZED (
  SELECT l_partkey, l_suppkey,
         (CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 10000)
           // CAST(round(l_quantity, 0) AS BIGINT) AS unit_u
  FROM lineitem),
mn AS (SELECT l_partkey, CAST(min(unit_u) AS BIGINT) AS mu
       FROM cat GROUP BY l_partkey),
best AS (
  SELECT c.l_partkey AS p_partkey,
         CAST(min(c.l_suppkey) AS BIGINT) AS s_suppkey,
         mn.mu AS unit_u
  FROM cat c JOIN mn ON c.l_partkey = mn.l_partkey
                    AND c.unit_u = mn.mu
  GROUP BY c.l_partkey, mn.mu)
SELECT b.p_partkey, b.s_suppkey, s.s_name,
       CAST((b.unit_u + 50) // 100 AS BIGINT) / 1e4 AS unit_price
FROM best b JOIN supplier s ON b.s_suppkey = s.s_suppkey
ORDER BY b.p_partkey""",
    "dominant_suppliers": """
WITH cat AS MATERIALIZED (
  SELECT l_partkey, l_suppkey,
         CAST(round(l_quantity, 0) AS BIGINT) AS qty
  FROM lineitem),
per AS (SELECT l_partkey, l_suppkey, CAST(sum(qty) AS BIGINT) AS sq
        FROM cat GROUP BY 1, 2),
tot AS (SELECT l_partkey AS pk, CAST(sum(sq) AS BIGINT) AS st
        FROM per GROUP BY 1)
SELECT per.l_suppkey AS s_suppkey,
       CAST(count(*) AS BIGINT) AS n_parts_dominated,
       CAST(sum(per.sq) AS BIGINT) AS qty_mass
FROM per JOIN tot ON per.l_partkey = tot.pk
WHERE 8 * per.sq > tot.st
GROUP BY per.l_suppkey ORDER BY s_suppkey""",
    "price_dispersion": """
WITH cat AS MATERIALIZED (
  SELECT l_partkey,
         (CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 10000)
           // CAST(round(l_quantity, 0) AS BIGINT) AS unit_u
  FROM lineitem),
per AS (SELECT l_partkey, CAST(min(unit_u) AS BIGINT) AS lo,
               CAST(max(unit_u) AS BIGINT) AS hi
        FROM cat GROUP BY l_partkey)
SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CASE WHEN hi > lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_spread,
       round(avg(CAST(hi - lo AS DOUBLE) / lo), 6) AS mean_rel_spread
FROM per JOIN part p ON per.l_partkey = p.p_partkey
GROUP BY p.p_brand ORDER BY p.p_brand""",
    "revenue_growth": """
WITH per AS (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS year,
         CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2)
SELECT nation, year,
       round(CAST(rev_c AS DOUBLE) / 100.0, 2) AS revenue,
       round(CAST(100 * (rev_c - lag(rev_c) OVER w) AS DOUBLE)
             / lag(rev_c) OVER w, 6) AS yoy_pct
FROM per WINDOW w AS (PARTITION BY nation ORDER BY year)
ORDER BY nation, year""",
    "open_order_aging": "WITH " + _sql_gq_chain(
            256, (0.5, 0.9, 0.99),
            """SELECT o_orderpriority AS g,
                      CAST(CAST((SELECT max(o_orderdate) FROM orders)
                                AS DATE)
                           - CAST(o_orderdate AS DATE) AS DOUBLE) AS x
               FROM orders WHERE o_orderstatus = 'O'""",
        ) + "\nSELECT g AS o_orderpriority, q, value FROM val"
            "\nORDER BY o_orderpriority, q",
    "supply_demand_balance": """
WITH s AS (
  SELECT n.n_name AS nation,
         CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS supplied_qty
  FROM lineitem l JOIN supplier sp ON l.l_suppkey = sp.s_suppkey
  JOIN nation n ON sp.s_nationkey = n.n_nationkey
  GROUP BY 1),
c AS (
  SELECT n.n_name AS nation,
         CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS consumed_qty
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer cu ON o.o_custkey = cu.c_custkey
  JOIN nation n ON cu.c_nationkey = n.n_nationkey
  GROUP BY 1)
SELECT COALESCE(s.nation, c.nation) AS nation,
       COALESCE(s.supplied_qty, 0) AS supplied_qty,
       COALESCE(c.consumed_qty, 0) AS consumed_qty,
       CASE WHEN COALESCE(c.consumed_qty, 0) > 0
            THEN round(CAST(COALESCE(s.supplied_qty, 0) AS DOUBLE)
                       / c.consumed_qty, 6)
       END AS supply_ratio
FROM s FULL OUTER JOIN c ON s.nation = c.nation
ORDER BY nation""",
    "priority_drift": """
WITH o AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
                  o_orderpriority
           FROM orders),
per AS (SELECT year, o_orderpriority, CAST(count(*) AS BIGINT) AS n
        FROM o GROUP BY 1, 2),
ov AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS tn FROM o
       GROUP BY 1),
tt AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM o)
SELECT per.year, per.o_orderpriority AS priority, per.n,
       round(CAST(100 * per.n AS DOUBLE)
             / sum(per.n) OVER (PARTITION BY per.year), 6) AS share_pct,
       round(CAST(100 * per.n AS DOUBLE)
             / sum(per.n) OVER (PARTITION BY per.year)
             - CAST(100 * ov.tn AS DOUBLE) / tt.tot, 6) AS dev_pct
FROM per JOIN ov ON per.o_orderpriority = ov.o_orderpriority
CROSS JOIN tt
ORDER BY per.year, priority""",
    "revenue_gini": """
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY o_custkey),
hist AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM per GROUP BY v),
h2 AS (SELECT v, c,
         CAST(COALESCE(sum(c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS BIGINT) AS o
       FROM hist),
a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(v * c) AS BIGINT) AS t,
             CAST(sum(v * (c * o + (c * (c + 1)) // 2)) AS BIGINT) AS s
      FROM h2)
SELECT n AS n_customers, t AS total_cents,
       round((2.0 * s) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
FROM a""",
    "integrity_audit": """
SELECT 'lineitem->orders' AS relation, CAST(count(*) AS BIGINT)
         AS n_violations
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem->part', CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
UNION ALL
SELECT 'orders->customer', CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""",
    "trade_volume": """
WITH n AS (SELECT n_nationkey, n_name FROM nation),
sup AS (SELECT s_suppkey, n.n_name AS supp_nation
        FROM supplier s JOIN n ON s.s_nationkey = n.n_nationkey),
cus AS (SELECT c_custkey, n.n_name AS cust_nation
        FROM customer c JOIN n ON c.c_nationkey = n.n_nationkey),
li AS (SELECT l_orderkey, l_suppkey,
              CAST(year(l_shipdate) AS INTEGER) AS year,
              CAST(round(l_extendedprice * 100, 0) AS BIGINT)
              * CAST(round((1.0 - l_discount) * 100, 0) AS BIGINT) AS rev_u
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate <= TIMESTAMP '1997-12-31'),
j AS (SELECT sup.supp_nation, cus.cust_nation, li.year, li.rev_u
      FROM li JOIN sup ON li.l_suppkey = sup.s_suppkey
      JOIN orders o ON li.l_orderkey = o.o_orderkey
      JOIN cus ON o.o_custkey = cus.c_custkey
      WHERE sup.supp_nation <> cus.cust_nation)
SELECT supp_nation, cust_nation, year,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST((sum(rev_u) + 50) // 100 AS BIGINT) / 100.0 AS revenue
FROM j GROUP BY supp_nation, cust_nation, year
ORDER BY supp_nation, cust_nation, year""",
    "dow_profile": """
WITH g AS (
  SELECT CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS INTEGER) AS dow,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_views,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases
  FROM events GROUP BY dow)
SELECT dow, n_events, n_views, n_purchases,
       CASE WHEN n_views > 0
            THEN round(CAST(n_purchases AS DOUBLE) / n_views, 6)
       END AS cvr
FROM g ORDER BY dow""",
    "retention_cohorts": """
            WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                          FROM events),
            f AS (SELECT user_id, min(day) AS cohort
                  FROM days GROUP BY user_id)
            SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
                   CAST(date_diff('day', f.cohort, d.day) AS BIGINT)
                     AS day_offset,
                   CAST(count(*) AS BIGINT) AS users
            FROM days d JOIN f ON d.user_id = f.user_id
            WHERE date_diff('day', f.cohort, d.day) <= 14
            GROUP BY 1, 2""",
    "price_quantiles": """
WITH s AS MATERIALIZED (
  SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
         max(CAST(l_extendedprice AS DOUBLE)) AS hi,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem),
p AS MATERIALIZED (
  SELECT lo, hi, n, (hi - lo) / 256 AS w,
         CASE WHEN (hi - lo) / 256 = 0 THEN 1.0
              ELSE (hi - lo) / 256 END AS ws
  FROM s),
hist AS MATERIALIZED (
  SELECT least(CAST(floor((CAST(l.l_extendedprice AS DOUBLE) - p.lo) / p.ws)
               AS INTEGER), 255) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem l, p GROUP BY 1),
cum AS MATERIALIZED (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist),
qs AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
ranks AS (
  SELECT q, CAST(greatest(ceil(q * (SELECT CAST(n AS DOUBLE) FROM p)), 1)
            AS BIGINT) AS r
  FROM qs),
pick AS (
  SELECT q, r, bin, cnt, cum FROM (
    SELECT ranks.q, ranks.r, cum.bin, cum.cnt, cum.cum,
           row_number() OVER (PARTITION BY ranks.q ORDER BY cum.bin) AS rn
    FROM ranks JOIN cum ON cum.cum >= ranks.r) t
  WHERE rn = 1)
SELECT q, round(p.lo + p.w * (bin + CAST(r - (cum - cnt) AS DOUBLE) / cnt), 6)
         AS value
FROM pick, p ORDER BY q""",
    "revenue_rollup": """
WITH li AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 10000, 0) AS BIGINT) AS rev_u
  FROM lineitem)
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       round(CAST(sum(li.rev_u) AS DOUBLE) / 1e6, 2) AS revenue
FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name ORDER BY region, nation""",
    "value_outliers": """
WITH g AS MATERIALIZED (
  SELECT event_type, CAST(count(value) AS BIGINT) AS n,
         sum(value) AS s, sum(value * value) AS ss
  FROM events GROUP BY event_type),
st AS MATERIALIZED (
  SELECT event_type, n, round(s / n, 6) AS mean,
         round(sqrt(greatest(ss / n - (s / n) * (s / n), 0)), 6) AS std
  FROM g),
o AS (SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_outliers
      FROM events e JOIN st ON e.event_type = st.event_type
      WHERE st.std > 0 AND abs(e.value - st.mean) > 3.0 * st.std
      GROUP BY e.event_type)
SELECT st.event_type, st.n, st.mean, st.std,
       COALESCE(o.n_outliers, 0) AS n_outliers
FROM st LEFT JOIN o ON st.event_type = o.event_type
ORDER BY st.event_type""",
    "out_of_order_stats": """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  max(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS pm
           FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN pm > ts_us THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(COALESCE(max(CASE WHEN pm > ts_us THEN pm - ts_us END), 0)
            AS BIGINT) AS max_lateness_us,
       round(CAST(sum(CASE WHEN pm > ts_us THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS late_frac
FROM e GROUP BY user_id ORDER BY user_id""",
    "priority_late_orders": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND CAST(l.l_shipdate AS DATE)
                    > CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "abc_classification": """
WITH per AS (SELECT l_partkey,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM lineitem GROUP BY l_partkey),
t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per),
rk AS (SELECT cents,
              sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                               ROWS UNBOUNDED PRECEDING) AS cum,
              t.total
       FROM per, t)
SELECT CASE WHEN cum * 100 <= 80 * total THEN 'A'
            WHEN cum * 100 <= 95 * total THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS class_revenue_cents,
       round(CAST(sum(cents) AS DOUBLE) / max(total), 6)
         AS revenue_share
FROM rk GROUP BY 1 ORDER BY 1""",
    "repeat_customer_revenue": """
WITH per AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                    CAST(sum(CAST(round(o_totalprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM orders GROUP BY o_custkey)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST(sum(CASE WHEN n_orders >= 2 THEN cents ELSE 0 END)
            AS BIGINT) AS repeat_revenue_cents,
       round(CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS repeat_frac,
       round(CAST(sum(CASE WHEN n_orders >= 2 THEN cents ELSE 0 END)
                  AS DOUBLE) / sum(cents), 6) AS repeat_revenue_share
FROM per""",
    "dormant_balance_gap": """
WITH recent AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01'),
seg AS (SELECT CASE WHEN r.c_custkey IS NOT NULL
                    THEN 'active' ELSE 'dormant' END AS segment,
               CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS cents
        FROM customer c LEFT JOIN recent r
          ON c.c_custkey = r.c_custkey),
rk AS (SELECT segment, cents,
              row_number() OVER (PARTITION BY segment
                                 ORDER BY cents, segment) AS rn
       FROM seg),
np AS (SELECT segment, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(cents) AS BIGINT) AS s
       FROM seg GROUP BY segment),
md AS (SELECT rk.segment, rk.cents AS median_cents
       FROM rk JOIN np ON rk.segment = np.segment
       WHERE rk.rn = (np.n + 1) // 2)
SELECT np.segment, np.n,
       round(CAST(np.s AS DOUBLE) / np.n / 100, 6) AS mean_balance,
       round(CAST(md.median_cents AS DOUBLE) / 100, 6) AS median_balance
FROM np JOIN md ON np.segment = md.segment ORDER BY np.segment""",
    "customer_streaks": """
WITH days AS (SELECT DISTINCT o_custkey,
                     CAST(CAST(o_orderdate AS DATE)
                          - DATE '1970-01-01' AS BIGINT) AS d
              FROM orders),
isl AS (SELECT o_custkey, d,
               d - row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY d) AS isl
        FROM days),
runs AS (SELECT o_custkey, isl, CAST(count(*) AS BIGINT) AS run
         FROM isl GROUP BY o_custkey, isl)
SELECT o_custkey, CAST(sum(run) AS BIGINT) AS n_active_days,
       CAST(max(run) AS BIGINT) AS max_streak_days,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY o_custkey ORDER BY o_custkey""",
    "revenue_lorenz": """
WITH per AS (SELECT o_custkey,
                    CAST(sum(CAST(round(o_totalprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM orders GROUP BY o_custkey),
t AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n FROM per),
rk AS (SELECT row_number() OVER (ORDER BY cents ASC, o_custkey ASC)
                AS rn,
              sum(cents) OVER (ORDER BY cents ASC, o_custkey ASC
                               ROWS UNBOUNDED PRECEDING) AS cum
       FROM per),
q AS (SELECT CAST(range AS INT) AS decile FROM range(1, 11))
SELECT q.decile,
       round(CAST(rk.cum AS DOUBLE) / t.total, 6) AS cum_share
FROM q, t JOIN rk ON rk.rn = (q.decile * (t.n - 1)) // 10 + 1
ORDER BY q.decile""",
    "single_source_parts": """
WITH per AS (SELECT l_partkey,
                    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM lineitem GROUP BY l_partkey)
SELECT CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_source,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST(sum(CASE WHEN n_supp = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS at_risk_cents,
       round(CAST(sum(CASE WHEN n_supp = 1 THEN cents ELSE 0 END)
                  AS DOUBLE) / sum(cents), 6) AS at_risk_share
FROM per""",
    "customer_value_drift": """
WITH base AS (SELECT o_custkey,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT)
                       AS cents,
                     CAST(o_orderdate AS DATE) AS od, o_orderkey
              FROM orders),
per AS (SELECT DISTINCT o_custkey,
          first_value(cents) OVER (PARTITION BY o_custkey
            ORDER BY od ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS first_c,
          first_value(cents) OVER (PARTITION BY o_custkey
            ORDER BY od DESC, o_orderkey DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS last_c,
          count(*) OVER (PARTITION BY o_custkey) AS n
        FROM base)
SELECT CAST(count(*) AS BIGINT) AS n_multi_customers,
       CAST(sum(CASE WHEN last_c > first_c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_growing,
       CAST(sum(CASE WHEN last_c < first_c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shrinking,
       CAST(sum(last_c - first_c) AS BIGINT) AS drift_cents_sum,
       round(CAST(sum(last_c - first_c) AS DOUBLE) / count(*) / 100, 6)
         AS mean_drift
FROM per WHERE n >= 2""",
    "supplier_percentile": """
WITH per AS (SELECT l_suppkey,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM lineitem GROUP BY l_suppkey)
SELECT p.l_suppkey AS s_suppkey, s.s_nationkey, p.cents,
       round(percent_rank() OVER (PARTITION BY s.s_nationkey
                                  ORDER BY p.cents ASC,
                                           p.l_suppkey ASC), 6)
         AS pct_rank
FROM per p JOIN supplier s ON p.l_suppkey = s.s_suppkey
ORDER BY s_suppkey""",
    "gini_mean_difference": """
WITH v AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
                  o_orderkey
           FROM orders),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
rk AS (SELECT c, row_number() OVER (ORDER BY c ASC, o_orderkey ASC)
                AS i
       FROM v),
a AS (SELECT CAST(sum(c * (2 * i - nn.n - 1)) AS BIGINT) AS pairsum,
             CAST(sum(c) AS BIGINT) AS total, nn.n
      FROM rk, nn GROUP BY nn.n)
SELECT n AS n_orders, pairsum, total,
       round(CAST(2 * pairsum AS DOUBLE) / (n * (n - 1.0)) / 100, 6)
         AS gmd,
       round(CAST(2 * pairsum AS DOUBLE) / (n - 1.0) / total, 6)
         AS relative_gmd
FROM a""",
    "dup_order_audit": """
WITH g AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                  CAST(count(*) AS BIGINT) AS c
           FROM orders GROUP BY 1, 2, 3)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_groups,
       CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
         AS n_dup_orders
FROM g""",
    "supplier_rank_corr": """
WITH rev AS (SELECT l_suppkey AS s_suppkey,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM lineitem GROUP BY l_suppkey),
j AS (SELECT s.s_suppkey,
             CAST(round(s.s_acctbal * 100, 0) AS BIGINT) AS bal,
             rev.cents
      FROM supplier s JOIN rev ON s.s_suppkey = rev.s_suppkey),
rk AS (SELECT s_suppkey,
              row_number() OVER (ORDER BY bal ASC, s_suppkey ASC)
                AS ra,
              row_number() OVER (ORDER BY cents ASC, s_suppkey ASC)
                AS rb
       FROM j),
a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS d2
      FROM rk)
SELECT n AS n_suppliers, d2,
       round(1 - CAST(6 * d2 AS DOUBLE) / (n * (n * n - 1.0)), 6)
         AS spearman
FROM a""",
    "bracket_balance": """
WITH per AS (SELECT source,
  CASE WHEN len(regexp_extract_all(text, '\\('))
            != len(regexp_extract_all(text, '\\)'))
       THEN 1 ELSE 0 END AS paren_bad,
  CASE WHEN len(regexp_extract_all(text, '"')) % 2 = 1
       THEN 1 ELSE 0 END AS quote_bad
  FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(paren_bad) AS BIGINT) AS n_unbalanced_paren,
       CAST(sum(quote_bad) AS BIGINT) AS n_odd_quotes,
       round(CAST(sum(paren_bad) + sum(quote_bad) AS DOUBLE)
             / count(*), 6) AS damage_rate
FROM per GROUP BY source ORDER BY source""",
    "ptype_revenue": """
WITH per AS (SELECT p.p_type, CAST(count(*) AS BIGINT) AS n_lines,
                    CAST(sum(CAST(round(l.l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             GROUP BY p.p_type),
t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per)
SELECT p_type, n_lines, cents AS revenue_cents,
       round(CAST(cents AS DOUBLE) / t.total, 6) AS share
FROM per, t ORDER BY p_type""",
    "tax_incidence": """
WITH per AS (SELECT CAST(round(l_tax * 100, 0) AS BIGINT) AS tax_pct,
                    CAST(count(*) AS BIGINT) AS n_lines,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS base_cents,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)
                             * CAST(round(l_tax * 100, 0) AS BIGINT))
                         AS BIGINT) AS collected_cpct
             FROM lineitem GROUP BY 1),
t AS (SELECT CAST(sum(collected_cpct) AS BIGINT) AS t FROM per)
SELECT tax_pct, n_lines, base_cents, collected_cpct,
       CASE WHEN t.t > 0
            THEN round(CAST(collected_cpct AS DOUBLE) / t.t, 6)
       END AS collection_share
FROM per, t ORDER BY tax_pct""",
    "lineitem_corr_matrix": """
WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS v_quantity, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v_extendedprice, CAST(round(l_discount * 100, 0) AS BIGINT) AS v_discount, CAST(round(l_tax * 100, 0) AS BIGINT) AS v_tax FROM lineitem),
m AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n,
  CAST(sum(v_quantity) AS HUGEINT) AS s_quantity,
  sum(CAST(v_quantity AS HUGEINT) * v_quantity) AS ss_quantity,
  CAST(sum(v_extendedprice) AS HUGEINT) AS s_extendedprice,
  sum(CAST(v_extendedprice AS HUGEINT) * v_extendedprice) AS ss_extendedprice,
  CAST(sum(v_discount) AS HUGEINT) AS s_discount,
  sum(CAST(v_discount AS HUGEINT) * v_discount) AS ss_discount,
  CAST(sum(v_tax) AS HUGEINT) AS s_tax,
  sum(CAST(v_tax AS HUGEINT) * v_tax) AS ss_tax,
  sum(CAST(v_quantity AS HUGEINT) * v_extendedprice) AS sp_quantity_extendedprice,
  sum(CAST(v_quantity AS HUGEINT) * v_discount) AS sp_quantity_discount,
  sum(CAST(v_quantity AS HUGEINT) * v_tax) AS sp_quantity_tax,
  sum(CAST(v_extendedprice AS HUGEINT) * v_discount) AS sp_extendedprice_discount,
  sum(CAST(v_extendedprice AS HUGEINT) * v_tax) AS sp_extendedprice_tax,
  sum(CAST(v_discount AS HUGEINT) * v_tax) AS sp_discount_tax FROM v)
SELECT 'quantity' AS col_a, 'extendedprice' AS col_b,
  round(CAST(n * sp_quantity_extendedprice - s_quantity * s_extendedprice AS DOUBLE)
        / sqrt(CAST(n * ss_quantity - s_quantity * s_quantity AS DOUBLE)
               * CAST(n * ss_extendedprice - s_extendedprice * s_extendedprice AS DOUBLE)), 6)
    AS pearson FROM m
UNION ALL
SELECT 'quantity' AS col_a, 'discount' AS col_b,
  round(CAST(n * sp_quantity_discount - s_quantity * s_discount AS DOUBLE)
        / sqrt(CAST(n * ss_quantity - s_quantity * s_quantity AS DOUBLE)
               * CAST(n * ss_discount - s_discount * s_discount AS DOUBLE)), 6)
    AS pearson FROM m
UNION ALL
SELECT 'quantity' AS col_a, 'tax' AS col_b,
  round(CAST(n * sp_quantity_tax - s_quantity * s_tax AS DOUBLE)
        / sqrt(CAST(n * ss_quantity - s_quantity * s_quantity AS DOUBLE)
               * CAST(n * ss_tax - s_tax * s_tax AS DOUBLE)), 6)
    AS pearson FROM m
UNION ALL
SELECT 'extendedprice' AS col_a, 'discount' AS col_b,
  round(CAST(n * sp_extendedprice_discount - s_extendedprice * s_discount AS DOUBLE)
        / sqrt(CAST(n * ss_extendedprice - s_extendedprice * s_extendedprice AS DOUBLE)
               * CAST(n * ss_discount - s_discount * s_discount AS DOUBLE)), 6)
    AS pearson FROM m
UNION ALL
SELECT 'extendedprice' AS col_a, 'tax' AS col_b,
  round(CAST(n * sp_extendedprice_tax - s_extendedprice * s_tax AS DOUBLE)
        / sqrt(CAST(n * ss_extendedprice - s_extendedprice * s_extendedprice AS DOUBLE)
               * CAST(n * ss_tax - s_tax * s_tax AS DOUBLE)), 6)
    AS pearson FROM m
UNION ALL
SELECT 'discount' AS col_a, 'tax' AS col_b,
  round(CAST(n * sp_discount_tax - s_discount * s_tax AS DOUBLE)
        / sqrt(CAST(n * ss_discount - s_discount * s_discount AS DOUBLE)
               * CAST(n * ss_tax - s_tax * s_tax AS DOUBLE)), 6)
    AS pearson FROM m""",
    "monthly_profile": """
WITH per AS (SELECT CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER)
                      AS month,
                    CAST(count(*) AS BIGINT) AS n_orders,
                    CAST(sum(CAST(round(o_totalprice * 100, 0)
                                  AS BIGINT)) AS BIGINT)
                      AS revenue_cents
             FROM orders GROUP BY 1),
t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS no,
             CAST(sum(revenue_cents) AS BIGINT) AS rc FROM per)
SELECT month, n_orders, revenue_cents,
       round(CAST(n_orders AS DOUBLE) / t.no, 6) AS order_share,
       round(CAST(revenue_cents AS DOUBLE) / t.rc, 6) AS revenue_share
FROM per, t ORDER BY month""",
    "linenumber_audit": """
WITH per AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n,
                    CAST(count(DISTINCT l_linenumber) AS BIGINT) AS nd,
                    CAST(max(l_linenumber) AS BIGINT) AS mx,
                    CAST(min(l_linenumber) AS BIGINT) AS mn
             FROM lineitem GROUP BY l_orderkey)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN mx != n OR nd != n OR mn != 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       round(CAST(sum(CASE WHEN mx != n OR nd != n OR mn != 1
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS violation_rate
FROM per""",
    "supplier_brand_focus": """
WITH per AS (SELECT l.l_suppkey, p.p_brand,
                    CAST(count(*) AS BIGINT) AS c
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             GROUP BY l.l_suppkey, p.p_brand)
SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_brands,
       CAST(sum(c) AS BIGINT) AS n_lines,
       round(CAST(sum(c * c) AS DOUBLE) / (sum(c) * sum(c)), 6) AS hhi
FROM per GROUP BY l_suppkey ORDER BY l_suppkey""",
    "nation_arpu": """
WITH rev AS (SELECT o_custkey,
                    CAST(sum(CAST(round(o_totalprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM orders GROUP BY o_custkey),
per AS (SELECT c.c_nationkey,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(COALESCE(rev.cents, 0)) AS BIGINT)
                 AS revenue_cents
        FROM customer c LEFT JOIN rev ON c.c_custkey = rev.o_custkey
        GROUP BY c.c_nationkey)
SELECT per.c_nationkey AS nationkey, n.n_name, per.n_customers,
       per.revenue_cents,
       round(CAST(per.revenue_cents AS DOUBLE) / per.n_customers / 100,
             6) AS arpu
FROM per JOIN nation n ON per.c_nationkey = n.n_nationkey
ORDER BY nationkey""",
    "forecast_revenue": """
WITH f AS (
  SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS dc,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
    AND CAST(round(l_quantity, 0) AS BIGINT) < 24
    AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_lines,
             CAST(COALESCE(sum(dc), 0) AS BIGINT) AS dsum,
             CAST(COALESCE(sum(pc * dc), 0) AS BIGINT) AS delta_u
      FROM f)
SELECT n_lines,
       CASE WHEN n_lines > 0
            THEN round(CAST(dsum AS DOUBLE) / n_lines, 6)
       END AS avg_discount_pct,
       round(CAST(delta_u AS DOUBLE) / 1e4, 2) AS revenue_delta
FROM a""",
}
