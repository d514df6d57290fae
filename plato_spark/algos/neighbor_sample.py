"""Deterministic neighbor sampling — GNN minibatch fan-out over DataFrames.

The graph-side feeder of a training-data pipeline: GraphSAGE-style
fixed-fan-out neighborhoods, k neighbors per vertex, reproducible across
runs/partitionings/retries (the property rand()-based sampling loses
under speculation). Sample definition: the k neighbors with the SMALLEST
portable md5 hash of (seed, src, ':', dst) — a uniform k-subset, stable
per seed, and exactly mirrorable in SQL (so the driver oracle checks it).

Scale path (prefilter=True): ranking all neighbors of a 10^7-degree hub
through a window sort is the exact blow-up SURVEY §7.4.3 forbids, so a
degree-aware hash prefilter keeps only rows with h below ~4k/deg of the
hash space (expected 4k candidates, Chernoff-tight), and the rare vertex
whose prefilter kept < k rows falls back to its full neighbor list. The
final window then sorts O(k) rows per vertex instead of O(deg).
Equivalence prefilter==plain is asserted in tests (the fallback makes it
exact, not approximate).

Layer composition (2-hop GraphSAGE): call again with
frontier=sample.select('nbr').distinct().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from plato_spark.functions.text import portable_h1
from plato_spark.graph.edges import symmetrize

HASH_SPACE = float(1 << 56)  # portable_h1 range
OVERSAMPLE = 4.0
# frontier tables below this row count are broadcast into the edge
# semi-join; above it (e.g. a layer-2 frontier over millions of seeds)
# a plain shuffle semi-join is used instead
FRONTIER_BROADCAST_MAX = 1_000_000


def _edge_hash(seed: str, src: Column, dst: Column) -> Column:
    return portable_h1(
        F.concat(F.lit(seed), src.cast("string"), F.lit(":"), dst.cast("string"))
    )


def neighbor_sample(
    edges: DataFrame,
    k: int = 5,
    seed: str = "gnn1",
    symmetric: bool = True,
    prefilter: bool = True,
    frontier: DataFrame | None = None,
) -> DataFrame:
    """(src, nbr, pos 1..k) — each vertex's deterministic k-neighbor sample.

    frontier: optional (src) table restricting which vertices are sampled
    (layer-2+ of a GraphSAGE fan-out); broadcast when small.
    """
    g = symmetrize(edges.select("src", "dst")) if symmetric else edges.select("src", "dst")
    g = g.distinct()  # neighbors are a SET (tolerates non-canonical input)
    if frontier is not None:
        f = frontier.select("src").distinct()
        # one cheap action decides broadcast vs shuffle semi-join; a
        # million-seed layer-2 frontier must not be force-broadcast
        if f.count() <= FRONTIER_BROADCAST_MAX:
            f = F.broadcast(f)
        g = g.join(f, "src")
    base = g.select("src", "dst", _edge_hash(seed, F.col("src"), F.col("dst")).alias("h"))

    if prefilter:
        deg = base.groupBy("src").agg(F.count("*").alias("deg"))
        thresh = (
            F.least(F.lit(1.0), F.lit(OVERSAMPLE * k) / F.col("deg"))
            * F.lit(HASH_SPACE)
        ).cast("long")
        with_deg = base.join(deg, "src")
        cand = with_deg.where(F.col("h") < thresh).select("src", "dst", "h")
        # exactness fallback: vertices whose prefilter kept < k rows rank
        # their FULL neighbor list (rare: P[Binom(deg, 4k/deg) < k] ~ e^-k)
        short = (
            deg.join(
                cand.groupBy("src").agg(F.count("*").alias("c")), "src", "left"
            )
            .where(F.coalesce("c", F.lit(0)) < F.least(F.col("deg"), F.lit(k)))
            .select("src")
        )
        base = cand.join(short, "src", "left_anti").unionByName(
            base.join(F.broadcast(short), "src")
        )

    w = Window.partitionBy("src").orderBy("h", "dst")
    return (
        base.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select("src", F.col("dst").alias("nbr"), F.col("pos").cast("long").alias("pos"))
    )
