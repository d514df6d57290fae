"""Incrementally-maintained fixed-bin histogram — streaming quantiles.

The batch quantile operator (functions/quantiles.histogram_quantiles)
derives its bin edges from the observed min/max, which a stream cannot
know up front.  The streaming form therefore PINS the edges
(``lo``/``hi``/``nbins`` are operator parameters — exactly what
production metric pipelines do: a latency histogram declares its buckets
once), and the per-bin counts become a commutative additive monoid:
folding micro-batch histograms into persisted state yields EXACTLY the
fixed-bin batch histogram of the union — so the quantile read-out over
the folded state is oracle-checkable against plain batch SQL with the
same pinned edges.

State is constant-size (<= nbins + 2 rows: out-of-range values clamp
into the edge bins, the clamp counts ride the same rows) no matter how
many events arrive — the CMS layout exactly: a single versioned
directory with write-then-commit ``_SUCCESS`` markers and an ``_EPOCH``
tag, because additive counts are NOT replay-idempotent; a replayed epoch
whose tag is already committed is skipped wholesale, and a crash before
commit replays into exactly the missed fold.

Read-out: the same closed-form interpolation as the batch operator —
rank r = max(ceil(q*n), 1), first bin with cum >= r, value =
lo + w*(bin + (r - cum_prev)/cnt) — all IEEE-deterministic given the
exact integer counts, computed IN-PLAN (no driver collect beyond the
final result).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from plato_spark.streaming.incremental import _versions

HIST_SCHEMA = "bin int, cnt long"

__all__ = ["bin_counts", "merge_hist_batch", "read_hist_state",
           "quantiles_from_state"]


def _committed_epoch(state_dir: str) -> int:
    vs = _versions(state_dir)
    if not vs:
        return -1
    ep = os.path.join(state_dir, f"v{vs[-1]}", "_EPOCH")
    if not os.path.exists(ep):
        return -1
    with open(ep) as fh:
        return int(fh.read().strip())


def bin_counts(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """(bin, cnt) — fixed-edge histogram of ``df[col]``; nulls dropped,
    out-of-range values clamped into bins 0 / nbins-1 (a stream can
    always exceed the declared range; losing the rows would silently
    bias n)."""
    x = F.col(col).cast("double")
    w = (float(hi) - float(lo)) / int(nbins)
    b = F.greatest(
        F.least(F.floor((x - F.lit(float(lo))) / F.lit(w)).cast("int"),
                F.lit(int(nbins) - 1)),
        F.lit(0),
    )
    return (
        df.where(x.isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def read_hist_state(spark: SparkSession, state_dir: str) -> DataFrame:
    vs = _versions(state_dir)
    if not vs:
        return spark.createDataFrame([], HIST_SCHEMA)
    path = os.path.join(state_dir, f"v{vs[-1]}")
    if not any(n.endswith(".parquet") for n in os.listdir(path)):
        return spark.createDataFrame([], HIST_SCHEMA)
    return spark.read.parquet(path).select("bin", "cnt")


def merge_hist_batch(
    batch: DataFrame,
    state_dir: str,
    epoch_id: int,
    col: str = "value",
    lo: float = 0.0,
    hi: float = 600.0,
    nbins: int = 256,
) -> dict:
    """Fold one micro-batch's fixed-bin histogram into the persisted
    state; a replayed epoch is skipped (additive counts are not
    idempotent)."""
    spark = batch.sparkSession
    os.makedirs(state_dir, exist_ok=True)
    if _committed_epoch(state_dir) >= epoch_id:
        return {"applied": False}
    bs = bin_counts(batch, col, lo, hi, nbins)
    cur = read_hist_state(spark, state_dir)
    merged = (
        cur.select("bin", F.col("cnt").alias("oc"))
        .join(bs.select("bin", F.col("cnt").alias("nc")), ["bin"], "outer")
        .select(
            "bin",
            (F.coalesce("oc", F.lit(0)) + F.coalesce("nc", F.lit(0)))
            .cast("long").alias("cnt"),
        )
    )
    tmp = os.path.join(state_dir, f"_tmp_{uuid.uuid4().hex[:8]}")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    for n in list(os.listdir(tmp)):
        if n.startswith("_"):
            os.remove(os.path.join(tmp, n))
    vs = _versions(state_dir)
    dest = os.path.join(state_dir, f"v{(vs[-1] + 1) if vs else 0}")
    shutil.rmtree(dest, ignore_errors=True)
    os.rename(tmp, dest)
    with open(os.path.join(dest, "_EPOCH"), "w") as fh:
        fh.write(str(int(epoch_id)))
    open(os.path.join(dest, "_SUCCESS"), "w").close()
    for old in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v{old}"),
                      ignore_errors=True)
    return {"applied": True, "version": os.path.basename(dest)}


def quantiles_from_state(
    state: DataFrame,
    lo: float = 0.0,
    hi: float = 600.0,
    nbins: int = 256,
    quantiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """(q, value) — interpolated quantiles over the folded bin counts,
    the batch histogram_quantiles formula with pinned edges; everything
    in-plan (the 1-row n total broadcasts via crossJoin, the cumulative
    walk runs over <= nbins rows)."""
    spark = state.sparkSession
    w = (float(hi) - float(lo)) / int(nbins)
    cum = state.select(
        "bin", "cnt",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
    )
    tot = state.agg(F.sum("cnt").cast("long").alias("n"))
    qs = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    ranks = qs.crossJoin(F.broadcast(tot)).select(
        "q",
        F.greatest(F.ceil(F.col("q") * F.col("n").cast("double")), F.lit(1))
        .cast("long").alias("r"),
    )
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
            F.lit(float(lo))
            + F.lit(w)
            * (
                F.col("bin")
                + (F.col("r") - (F.col("cum") - F.col("cnt")))
                .cast("double") / F.col("cnt")
            ),
            6,
        ).alias("value"),
    )
