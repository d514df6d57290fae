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

__all__ = ["histogram_quantiles", "group_quantiles"]


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
    # |quantiles| x nbins rows)
    pick = (
        ranks.crossJoin(cum)
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
    spark = df.sparkSession
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
    qs = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    ranks = stats.crossJoin(F.broadcast(qs)).select(
        "g", "q", "lo", "w",
        F.greatest(F.ceil(F.col("q") * F.col("n").cast("double")), F.lit(1))
        .cast("long").alias("r"),
    )
    pick = (
        ranks.join(cum, "g")
        .where(F.col("cum") >= F.col("r"))
        .groupBy("g", "q", "r", "lo", "w")
        .agg(F.min(F.struct("bin", "cnt", "cum")).alias("t"))
        .select("g", "q", "r", "lo", "w",
                F.col("t.bin").alias("bin"), F.col("t.cnt").alias("cnt"),
                F.col("t.cum").alias("cum"))
    )
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
