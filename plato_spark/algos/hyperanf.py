"""HyperANF — approximate neighborhood function + average distance.

Reference: /root/reference/plato/algo/hyperanf/hyperanf.hpp:43-46 (opts:
iterations 20, 2^12 HLL registers), 61-70 (avg distance from the ANF curve:
avg = sum_i i*(ANF_i - ANF_{i-1}) / (ANF_last - ANF_0)), 83-195 (loop: every
vertex merges its neighbors' HLL sketches each round; ANF(t) = sum of
per-vertex estimates; early-stop when the curve stops growing).

Spark-native: the per-vertex reachability sketch is a Datasketches HLL
BinaryType column (F.hll_sketch_agg / hll_union / hll_union_agg /
hll_sketch_estimate — JVM-side, mergeable, the exact primitive plato hand-
rolls in /root/reference/plato/util/hyperloglog.hpp:76-120). Each superstep
is one co-partitioned join + groupBy(dst) hll_union_agg.

Approximate by construction -> tested with relative-error bounds, no SQL
oracle (the driver records a rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)


def hyperanf(
    edges: DataFrame,
    iterations: int = 20,
    lg_k: int = 12,
    eps: float = 1e-3,
) -> tuple[float, list[float]]:
    """Average shortest-path distance estimate over DIRECTED edges.

    Returns (avg_distance, anf_curve). Pass a symmetrized table for
    undirected semantics.
    """
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
    # init sketch = {v}: hll_sketch_agg is an aggregate — build it per vertex
    state = (
        verts.groupBy("id")
        .agg(F.hll_sketch_agg("id", lg_k).alias("sk"))
        .persist()
    )

    def anf_total(st: DataFrame) -> float:
        return float(
            st.agg(F.sum(F.hll_sketch_estimate("sk"))).collect()[0][0]
        )

    curve = [anf_total(state)]
    with scoped_shuffle_partitions(spark, shuffle_n):
        prev_cached = state
        for _ in range(iterations):
            merged = (
                e.join(state.select(F.col("id").alias("src"), "sk"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.hll_union_agg("sk").alias("nsk"))
            )
            new_state = (
                state.join(merged, "id", "left")
                .select(
                    "id",
                    F.when(
                        F.col("nsk").isNull(), F.col("sk")
                    ).otherwise(F.hll_union("sk", "nsk")).alias("sk"),
                )
                .transform(cheap_localCheckpoint)
            )
            total = anf_total(new_state)
            try:
                prev_cached.unpersist()
            except Exception:
                pass
            prev_cached = state = new_state
            grew = total - curve[-1]
            curve.append(total)
            if abs(grew) <= eps * max(curve[-1], 1.0):
                break

    denom = curve[-1] - curve[0]
    if denom <= 0:
        return 0.0, curve
    avg = sum(i * (curve[i] - curve[i - 1]) for i in range(1, len(curve))) / denom
    return avg, curve
