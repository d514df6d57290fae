"""Histogram-based quantile estimation — the distributed percentile path.

Exact percentiles need a global sort (or percentile_approx's opaque
t-digest, which no other engine reproduces bit-for-bit).  This operator
takes the classic fixed-width histogram route instead: one min/max pass,
one map-side-combined groupBy over <= nbins cells, then linear
interpolation inside the target bin — the same two-pass shape OLAP
engines use for approximate quantiles, with the virtue that every step
is closed-form IEEE arithmetic, so the estimate is deterministic and
bit-reproducible in ANSI SQL (the engine's oracle discipline).

Error bound: the estimate is exact to within one bin width
((max-min)/nbins); with monotone interpolation it is exact whenever the
values inside the target bin are uniformly spread.  At 100 TB the cost
is two scans and a <= nbins-cell shuffle — no sort, no per-row state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["histogram_quantiles", "group_quantiles",
           "trimmed_mean", "mad_outliers"]


def histogram_quantiles(
    df: DataFrame,
    col: str,
    quantiles: tuple = (0.5, 0.9, 0.99),
    nbins: int = 256,
) -> DataFrame:
    """(q, value) — interpolated histogram quantiles of ``df[col]``.

    Pipeline: (min, max, n) scalars -> fixed-width bin counts ->
    cumulative walk over <= nbins rows -> first bin whose cumulative
    count reaches rank ceil(q*n), interpolated at
    min + w * (bin + (rank - cum_prev)/bin_count), rounded 6dp.
    """
    spark = df.sparkSession
    x = F.col(col).cast("double")
    # nulls must not reach the histogram: count(x) already excludes them,
    # so a null bin would inflate the cumulative walk against n — and
    # null sorts FIRST in Spark's window ordering, skewing every quantile
    df = df.where(x.isNotNull())
    s = df.agg(
        F.min(x).alias("lo"), F.max(x).alias("hi"),
        F.count(x).alias("n"),
    ).collect()[0]
    if s["n"] == 0:
        return spark.createDataFrame([], "q double, value double")
    lo, hi, n = float(s["lo"]), float(s["hi"]), int(s["n"])
    w = (hi - lo) / nbins
    w_safe = w if w != 0.0 else 1.0

    hist = (
        df.select(
            F.least(
                F.floor((x - F.lit(lo)) / F.lit(w_safe)).cast("int"),
                F.lit(nbins - 1),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    cum = hist.select(
        "bin", "cnt",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
    )
    qs = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    ranks = qs.select(
        "q",
        F.greatest(F.ceil(F.col("q") * F.lit(float(n))), F.lit(1))
        .cast("long").alias("r"),
    )
    # first bin whose cumulative count reaches the rank (tiny cross join:
    # |quantiles| x nbins rows; the rank literal is the broadcast build
    # side so the pick never shuffles the histogram)
    pick = (
        cum.crossJoin(F.broadcast(ranks))
        .where(F.col("cum") >= F.col("r"))
        .groupBy("q", "r")
        .agg(F.min(F.struct("bin", "cnt", "cum")).alias("t"))
        .select("q", "r", F.col("t.bin").alias("bin"),
                F.col("t.cnt").alias("cnt"), F.col("t.cum").alias("cum"))
    )
    return pick.select(
        "q",
        F.round(
            F.lit(lo)
            + F.lit(w)
            * (
                F.col("bin")
                + (F.col("r") - (F.col("cum") - F.col("cnt")))
                .cast("double") / F.col("cnt")
            ),
            6,
        ).alias("value"),
    )


def _gq_tables(df: DataFrame, group_col: str, col: str,
               nbins: int) -> tuple:
    """Shared per-group histogram: returns (stats, cum) where stats =
    (g, lo, hi, n, w, w_safe) and cum = (g, bin, cnt, cum)."""
    x = F.col(col).cast("double")
    df = df.where(x.isNotNull()).select(
        F.col(group_col).alias("g"), x.alias("x")
    )
    stats = df.groupBy("g").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"),
        F.count("x").cast("long").alias("n"),
    )
    w = (F.col("hi") - F.col("lo")) / F.lit(int(nbins))
    stats = stats.select(
        "g", "lo", "hi", "n", w.alias("w"),
        F.when(w != 0.0, w).otherwise(F.lit(1.0)).alias("w_safe"),
    )
    hist = (
        df.join(F.broadcast(stats), "g")
        .select(
            "g",
            F.least(
                F.floor((F.col("x") - F.col("lo")) / F.col("w_safe"))
                .cast("int"),
                F.lit(int(nbins) - 1),
            ).alias("bin"),
        )
        .groupBy("g", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cum = hist.select(
        "g", "bin", "cnt",
        F.sum("cnt").over(
            Window.partitionBy("g").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
    )
    return stats, cum


def group_quantiles(
    df: DataFrame,
    group_col: str,
    col: str,
    quantiles: tuple = (0.5, 0.9, 0.99),
    nbins: int = 256,
) -> DataFrame:
    """(group, q, value) — histogram_quantiles PER GROUP, computed
    fully IN-PLAN: where the global operator collects its (min, max, n)
    scalars to the driver, the per-group form keeps them as a broadcast
    stats table, so there is NO driver action and the whole thing is one
    lazy DataFrame — the shape you want when "group" is a thousand
    tenants, not one.

    Pipeline: per-group (lo, hi, n) aggregation (map-side combined,
    |groups| rows, broadcast) -> per-row bin against the group's own
    edges -> per-group cumulative walk (window PARTITIONED by group —
    never a single-partition global window) -> rank pick + linear
    interpolation, the exact IEEE ladder of the global operator (same
    oracle discipline).  Constant columns (hi == lo) report the constant;
    null values are dropped before binning; empty groups do not appear.
    """
    stats, cum = _gq_tables(df, group_col, col, nbins)
    pick = _gq_rank_pick(stats, cum, quantiles)
    return pick.select(
        F.col("g").alias(group_col),
        "q",
        F.round(
            F.col("lo")
            + F.col("w")
            * (
                F.col("bin")
                + (F.col("r") - (F.col("cum") - F.col("cnt")))
                .cast("double") / F.col("cnt")
            ),
            6,
        ).alias("value"),
    )


def _gq_rank_pick(stats: DataFrame, cum: DataFrame,
                  quantiles: tuple) -> DataFrame:
    """Shared rank-pick: (g, q, r, lo, w, bin, cnt, cum) — the first bin
    whose cumulative count reaches rank ceil(q*n) per (group, q)."""
    spark = stats.sparkSession
    qs = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    ranks = stats.crossJoin(F.broadcast(qs)).select(
        "g", "q", "lo", "w",
        F.greatest(F.ceil(F.col("q") * F.col("n").cast("double")), F.lit(1))
        .cast("long").alias("r"),
    )
    return (
        ranks.join(cum, "g")
        .where(F.col("cum") >= F.col("r"))
        .groupBy("g", "q", "r", "lo", "w")
        .agg(F.min(F.struct("bin", "cnt", "cum")).alias("t"))
        .select("g", "q", "r", "lo", "w",
                F.col("t.bin").alias("bin"), F.col("t.cnt").alias("cnt"),
                F.col("t.cum").alias("cum"))
    )


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    nbins: int = 256,
    cents_scale: int = 100,
) -> DataFrame:
    """(group, n_kept, n_trimmed, tmean) — per-group mean over values
    inside the [lo_q, hi_q] quantile band: the robust location estimate
    a revenue/latency dashboard actually wants (one whale order or one
    stuck request should not move the headline number).

    The band uses CONSERVATIVE bin edges, not interpolation: lo_t is
    the LOWER edge of the lo_q pick bin, hi_t the UPPER edge of the
    hi_q pick bin.  Interpolated values assume uniform in-bin spread
    and on a point-mass group land ABOVE every actual value (a fixture
    with 20 copies of 10.0 plus one whale interpolated p05 = 25.6 and
    trimmed everything) — edge semantics guarantee the band is a
    SUPERSET of the true quantile band, so at most the requested tails
    trim.  Edges are identical IEEE expressions on both engines
    (broadcast, |groups| x 2 rows); kept values fold as EXACT integers
    at ``cents_scale`` (values carry fixed decimals — the money-math
    discipline), so the mean is ONE rounded IEEE division at any
    partitioning."""
    stats, cum = _gq_tables(df, group_col, col, nbins)
    pick = _gq_rank_pick(stats, cum, (float(lo_q), float(hi_q)))
    edge_lo = F.col("lo") + F.col("w") * F.col("bin")
    edge_hi = F.col("lo") + F.col("w") * (F.col("bin") + 1)
    band = (
        pick.groupBy("g")
        .agg(
            F.min(F.when(F.col("q") == float(lo_q), edge_lo)).alias("lo_t"),
            F.min(F.when(F.col("q") == float(hi_q), edge_hi)).alias("hi_t"),
        )
        .withColumnRenamed("g", group_col)
    )
    x = F.col(col).cast("double")
    v = df.where(x.isNotNull()).select(
        F.col(group_col), x.alias("x"),
        F.round(x * cents_scale, 0).cast("long").alias("xc"),
    )
    j = v.join(F.broadcast(band), group_col)
    kept = F.col("x").between(F.col("lo_t"), F.col("hi_t"))
    return (
        j.groupBy(group_col)
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(~kept, 1).otherwise(0)).cast("long")
            .alias("n_trimmed"),
            F.sum(F.when(kept, F.col("xc")).otherwise(F.lit(0)))
            .cast("long").alias("sc"),
        )
        .select(
            group_col, "n_kept", "n_trimmed",
            F.when(F.col("n_kept") > 0,
                   F.round(F.col("sc")
                           / (F.lit(float(cents_scale)) * F.col("n_kept")),
                           6)).alias("tmean"),
        )
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    col: str,
    k: float = 3.0,
    nbins: int = 256,
) -> DataFrame:
    """(group, med, mad, n, n_outliers) — median-absolute-deviation
    outlier counts per group: med = the group median, mad = the median
    of |x - med|, outlier iff |x - med| > k * mad.  The robust twin of
    value_outliers' z-score (one huge value inflates mean AND std,
    shrinking its own z; med/mad don't move).  The classic 1.4826
    normal-consistency factor is deliberately NOT folded in — k is the
    raw MAD multiple, documented.

    Both medians are the histogram-interpolated group_quantiles
    estimate (6dp-rounded, broadcast), so every comparison is
    engine-identical; counts are exact integers.  Estimator caveat: the
    median is exact to one bin width = range/nbins, and a heavy tail
    STRETCHES the range — a 31-value fixture with one 1000x whale put
    the 64-bin median at 18.25 against a true 10.2; size nbins to the
    tail, not the bulk.  mad == 0 (over half
    the group at the median) flags only values strictly different in
    the 6dp-rounded deviation."""
    med = group_quantiles(df, group_col, col, quantiles=(0.5,),
                          nbins=nbins).select(
        group_col, F.col("value").alias("med"))
    x = F.col(col).cast("double")
    v = (
        df.where(x.isNotNull()).select(F.col(group_col), x.alias("x"))
        .join(F.broadcast(med), group_col)
        .select(group_col, "x", "med",
                F.abs(F.col("x") - F.col("med")).alias("dev"))
    )
    madt = group_quantiles(v, group_col, "dev", quantiles=(0.5,),
                           nbins=nbins).select(
        group_col, F.col("value").alias("mad"))
    j = v.join(F.broadcast(madt), group_col)
    return (
        j.groupBy(group_col, "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("dev") > F.lit(float(k)) * F.col("mad"), 1)
                  .otherwise(0)).cast("long").alias("n_outliers"),
        )
        .select(group_col, "med", "mad", "n", "n_outliers")
    )
