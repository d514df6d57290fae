"""Katz centrality — attenuated path-count link analysis.

Beyond the reference menu (plato ships PageRank/HITS-style scores;
/root/reference/plato/algo/pagerank/pagerank.hpp is the closest
relative): Katz scores count all incoming paths with attenuation
alpha**length, the standard centrality for citation/dependency link
graphs when dangling-mass redistribution (PageRank) is unwanted.

  x_{t+1}(v) = alpha * sum_{(u,v) in E} x_t(u) + beta

Fixed iteration count + 6dp rounding = deterministic and mirrorable as
an unrolled SQL oracle (same discipline as the pagerank oracle). Plan
shape per superstep is identical to algos/pagerank impl='join': one
co-partitioned join + map-side-combined groupBy, lineage truncated via
localCheckpoint; alpha must satisfy alpha < 1/lambda_max for
convergence — callers pick it (default 0.1 is safe for any graph with
max in-degree <= 10, and fixed-iteration use is well-defined for any
alpha).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)


def katz(
    edges: DataFrame,
    alpha: float = 0.1,
    beta: float = 1.0,
    iterations: int = 8,
) -> DataFrame:
    """Returns (id, katz: double 6dp) after ``iterations`` rounds from
    x_0 = beta (directed edges: src endorses dst)."""
    spark = edges.sparkSession
    e0 = edges.select("src", "dst").persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_e)
    e = e0.repartition(shuffle_n, "src").persist()
    e.count()
    e0.unpersist()

    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(shuffle_n, "id")
    )
    state = verts.select("id", F.lit(float(beta)).alias("x")).localCheckpoint(
        eager=True
    )

    with scoped_shuffle_partitions(spark, shuffle_n):
        for _ in range(iterations):
            gathered = (
                e.join(state.select(F.col("id").alias("src"), "x"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("x").alias("g"))
            )
            new_state = (
                state.select("id")
                .join(gathered, "id", "left")
                .select(
                    "id",
                    (
                        F.lit(float(alpha)) * F.coalesce("g", F.lit(0.0))
                        + F.lit(float(beta))
                    ).alias("x"),
                )
                .transform(cheap_localCheckpoint)
            )
            state = new_state

    return state.select("id", F.round("x", 6).alias("katz"))
