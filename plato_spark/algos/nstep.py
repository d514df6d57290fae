"""N-step degrees — approximate n-hop neighborhood sizes via HLL sketches.

Reference: /root/reference/plato/algo/nstepdegrees/nstepdegrees.hpp:48-164 —
per-vertex HyperLogLog of the vertices reachable within n hops, spread n
supersteps (opts: step 20, type both in/out). Approximate by construction.

Spark-native: Datasketches HLL BinaryType columns with hll_union_agg per
superstep, exactly like algos/hyperanf.py but with a fixed step count and
selectable direction. Returns per-vertex ball-size estimates (the n-hop
"degree"), self excluded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# r6: layout-preserving truncation — exact-valued loop, plan metadata
# change cannot move any float reduce order (see ckpt_blocks docstring)
from plato_spark.engine.ckpt_blocks import (
    auto_loop_localCheckpoint as cheap_localCheckpoint,
)

from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_superstep_confs,
)


def nstep_degrees(
    edges: DataFrame,
    steps: int = 3,
    direction: str = "out",
    lg_k: int = 12,
) -> DataFrame:
    """(id, nstep_degree: double) over directed edges.

    direction: 'out'  = vertices reachable FROM v within n hops;
               'in'   = vertices that can reach v;
               'both' = ball over the symmetrized graph
    (the reference's in/out/both option, nstepdegrees.hpp:48-52).
    """
    from plato_spark.graph.edges import symmetrize

    spark = edges.sparkSession
    if direction == "in":
        e0 = edges.select("src", "dst")
    elif direction == "out":
        # reverse the edges: sketches flow along u->v meaning "u is reachable
        # from ...": to collect v's OUT-ball we propagate sketches backwards
        e0 = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        e0 = symmetrize(edges.select("src", "dst")).distinct()
    else:
        raise ValueError(direction)
    e0 = e0.persist()
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
    state = verts.groupBy("id").agg(F.hll_sketch_agg("id", lg_k).alias("sk")).persist()
    state.count()

    with scoped_superstep_confs(spark, shuffle_n):
        prev = state
        for _ in range(steps):
            merged = (
                e.join(state.select(F.col("id").alias("src"), "sk"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.hll_union_agg("sk").alias("nsk"))
            )
            state = (
                state.join(merged, "id", "left")
                .select(
                    "id",
                    F.when(F.col("nsk").isNull(), F.col("sk"))
                    .otherwise(F.hll_union("sk", "nsk"))
                    .alias("sk"),
                )
                .transform(cheap_localCheckpoint)
            )
            try:
                prev.unpersist()
            except Exception:
                pass
            prev = state
    # ball includes self -> subtract 1
    return state.select(
        "id",
        F.round(F.hll_sketch_estimate("sk") - 1.0, 3).alias("nstep_degree"),
    )


def nstep_reach_exact(edges: DataFrame, steps: int = 2) -> DataFrame:
    """(id, n_reach) — EXACT n-hop out-neighborhood sizes (self not
    special-cased: v counts itself only if a directed cycle returns in <=n).

    Correctness baseline for nstep_degrees' HLL estimates, same pairing as
    brute-force-vs-IVF in similarity search: exact k-hop materialization is
    O(E * avg_deg^(k-1)) pairs worst-case, so at 100TB scale use the sketch;
    at validation scale this is the oracle-checkable ground truth
    (reference: nstepdegrees.hpp computes the same quantity approximately).
    """
    e = edges.select("src", "dst").distinct()
    reach = e
    hop = e
    for _ in range(steps - 1):
        hop = (
            hop.select("src", F.col("dst").alias("mid"))
            .join(e.select(F.col("src").alias("mid"), "dst"), "mid")
            .select("src", "dst")
            .distinct()
        )
        reach = reach.unionByName(hop).distinct()
    return reach.groupBy(F.col("src").alias("id")).agg(
        F.count_distinct("dst").cast("long").alias("n_reach")
    )
