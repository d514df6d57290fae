"""Truncated hitting time (Sarkar & Moore, UAI'07) — expected steps for
a random walk to first reach a seed set, capped at T.

The untruncated hitting time is the solution of a linear system and is
infinite off the seed component; the T-truncated form

  h^0(v) = 0
  h^k(v) = 0                                    if v in S
  h^k(v) = 1 + (1/deg v) * sum_{u in N(v)} h^{k-1}(u)   otherwise

is what the link-prediction / proximity-search literature actually uses
(h^T(v) = T exactly when the walk cannot hit S within T steps), and its
Jacobi iteration is the same one-shuffle-join + one-map-side-combined-
aggregation superstep as PageRank — seeds are the absorbing analog of
the teleport term.  Per-round state is stats-less-localCheckpointed;
raw IEEE inside the loop, ONE 6dp round at read-out (the pagerank float
discipline — the oracle is the identical unrolled chain, agreement
proven by the gate at two SFs).

Proximity reading: small h = close to the seeds under random-walk
metric — the hitting-time complement of personalized PageRank's
stationary mass, robust to degree skew in a way raw shortest-path
distance is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint
from plato_spark.graph.partitioning import auto_shuffle_partitions

__all__ = ["truncated_hitting_time"]


def truncated_hitting_time(
    edges: DataFrame,
    seeds: list,
    rounds: int = 10,
) -> DataFrame:
    """(id, hit) — T-truncated expected hitting time to ``seeds`` for
    every vertex, T = ``rounds``.  ``edges`` is the symmetrized
    (src, dst) table (vertex universe = edge endpoints, so every vertex
    has deg >= 1); vertices that cannot reach a seed within T steps
    report exactly float(T)."""
    spark = edges.sparkSession
    e0 = edges.select("src", "dst").persist()
    n_edges = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_edges)
    e = e0.repartition(shuffle_n, "src").persist()
    e.count()
    e0.unpersist()

    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    base = (
        verts.join(deg, "id", "left")
        .select(
            "id",
            F.coalesce("deg", F.lit(0)).alias("deg"),
            F.col("id").isin([int(s) for s in seeds]).alias("is_seed"),
        )
        .repartition(shuffle_n, "id")
        .persist()
    )
    base.count()

    state = base.select("id", F.lit(0.0).alias("h"))
    state = cheap_localCheckpoint(state)
    for _ in range(rounds):
        # gather sum of neighbor h along each edge dst -> src direction:
        # contribution of u's h to every neighbor v
        g = (
            e.join(state.select(F.col("id").alias("src"), "h"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").alias("g"))
        )
        state = (
            base.join(g, "id", "left")
            .select(
                "id",
                F.when(F.col("is_seed"), 0.0)
                .when(
                    F.col("deg") > 0,
                    F.lit(1.0) + F.coalesce("g", F.lit(0.0)) / F.col("deg"),
                )
                .otherwise(F.lit(1.0))
                .alias("h"),
            )
        )
        state = cheap_localCheckpoint(state)
    out = state.select("id", F.round("h", 6).alias("hit"))
    e.unpersist()
    base.unpersist()
    return out
