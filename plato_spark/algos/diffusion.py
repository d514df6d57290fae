"""Graph feature diffusion — attribute smoothing over edges.

  x_0(v)   = the vertex attribute
  x_{k+1}(v) = (1 - alpha) * x_0(v) + alpha * mean_{u in N(v)} x_k(u)

The GNN-precursor operator: a K-round personalized-teleport diffusion of
a REAL-VALUED feature (doc length, quality score, spam probability)
along the link graph — label propagation's regression sibling, and the
closed-form of what a K-layer untrained GCN with mean aggregation
computes.  Smoothness preconditions measured by edge_smoothness
(Dirichlet energy) tell you whether this diffusion carries signal.

Same superstep shape as PageRank: one co-partitioned shuffle join + one
map-side-combined aggregation per round, anchored by the (1-alpha)*x_0
teleport term (broadcast-free — x_0 rides the state), per-round state
stats-less-localCheckpointed.  Raw IEEE inside the loop, ONE 6dp round
at read-out (oracle = identical unrolled chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint
from plato_spark.graph.partitioning import auto_shuffle_partitions

__all__ = ["attribute_diffusion"]


def attribute_diffusion(
    edges: DataFrame,
    attrs: DataFrame,
    alpha: float = 0.5,
    rounds: int = 8,
) -> DataFrame:
    """(id, x) — ``rounds``-step diffusion of ``attrs`` (id, x0) over the
    symmetrized ``edges`` (src, dst).  Vertex universe = edge endpoints
    that carry an attribute; endpoints without one are dropped from the
    universe AND from neighbor means (their mass never fabricates)."""
    spark = edges.sparkSession
    e0 = edges.select("src", "dst").persist()
    n_edges = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_edges)

    verts = (
        e0.select(F.col("src").alias("id"))
        .unionByName(e0.select(F.col("dst").alias("id")))
        .distinct()
    )
    base = (
        verts.join(attrs.select("id", F.col("x0").cast("double").alias("x0")),
                   "id")
        .repartition(shuffle_n, "id")
        .persist()
    )
    base.count()
    # restrict edges to attributed endpoints, then per-vertex degree over
    # the RESTRICTED graph so the mean denominator matches the numerator
    keep = base.select("id")
    e = (
        e0.join(keep.withColumnRenamed("id", "src"), "src")
        .join(keep.withColumnRenamed("id", "dst"), "dst")
        .repartition(shuffle_n, "src")
        .persist()
    )
    e.count()
    e0.unpersist()
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    base2 = base.join(deg, "id", "left").select(
        "id", "x0", F.coalesce("deg", F.lit(0)).alias("deg")
    ).persist()
    base2.count()
    base.unpersist()

    state = base2.select("id", F.col("x0").alias("x"))
    state = cheap_localCheckpoint(state)
    for _ in range(rounds):
        g = (
            e.join(state.select(F.col("id").alias("src"), "x"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("x").alias("g"))
        )
        state = (
            base2.join(g, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("deg") > 0,
                    F.lit(1.0 - alpha) * F.col("x0")
                    + F.lit(alpha) * F.coalesce("g", F.lit(0.0)) / F.col("deg"),
                )
                .otherwise(F.col("x0"))
                .alias("x"),
            )
        )
        state = cheap_localCheckpoint(state)
    out = state.select("id", F.round("x", 6).alias("x"))
    e.unpersist()
    base2.unpersist()
    return out
