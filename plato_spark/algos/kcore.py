"""K-core decomposition (coreness / shell index) — Montresor h-index method.

Reference: /root/reference/plato/algo/kcore/kcore.hpp:63-267
  - coreness init = degree; each round every (active) vertex recomputes the
    h-index of its neighbors' current estimates (kcore.hpp:191-232: largest
    i such that >= i neighbors have estimate >= i, capped by own estimate);
    a decrease activates the vertex's neighbors; fixpoint = exact coreness.
  - plato's sparse/dense broadcast switch (kcore.hpp:150-171) maps to the
    same frontier broadcast-vs-shuffle policy as wcc.

Spark plan per superstep (all JVM-side):
  est(src) JOIN edges -> window rank per dst ordered by neighbor estimate
  desc -> h = max(min(rank, est)) -> new = min(old, h).
The h-index identity (sort desc, h = max_j min(j, e_j)) replaces plato's
per-vertex counting loop; monotone non-increasing => synchronous iteration
converges to the identical fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plato_spark.graph.edges import symmetrize
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)


def kcore(edges: DataFrame, max_iters: int = 1000) -> DataFrame:
    """Exact coreness per vertex over canonical undirected edges (src<dst).

    Returns (id, coreness: long).
    """
    spark = edges.sparkSession
    sym0 = symmetrize(edges.select("src", "dst")).persist()
    n_sym = sym0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_sym)
    sym = sym0.repartition(shuffle_n, "src").persist()
    sym.count()
    sym0.unpersist()

    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg")).persist()
    state = deg.select("id", F.col("deg").cast("long").alias("core"))

    with scoped_shuffle_partitions(spark, shuffle_n):
        k = 0
        prev_cached = None
        while k < max_iters:
            nbr = sym.join(
                state.select(F.col("id").alias("src"), F.col("core").alias("nc")), "src"
            )
            w = Window.partitionBy("dst").orderBy(F.desc("nc"), F.asc("src"))
            h = (
                nbr.withColumn("rn", F.row_number().over(w))
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max(F.least(F.col("rn").cast("long"), F.col("nc"))).alias("h"))
            )
            new_state = (
                state.join(h, "id", "left")
                .select(
                    "id",
                    F.least(F.col("core"), F.coalesce("h", F.col("core"))).alias("core"),
                    (F.coalesce("h", F.col("core")) < F.col("core")).alias("chg"),
                )
            )
            new_state = new_state.localCheckpoint(eager=False)
            changed = new_state.where("chg").count()
            new_state = new_state.drop("chg")
            if prev_cached is not None:
                try:
                    prev_cached.unpersist()
                except Exception:
                    pass
            prev_cached, state = state, new_state
            k += 1
            if changed == 0:
                break
    return state.select("id", F.col("core").cast("long").alias("coreness"))
