"""Single-source shortest paths (weighted) — min-plus frontier relaxation.

The reference ships unweighted BFS (/root/reference/plato/algo/bfs/
bfs.hpp:55-155); SSSP is its weighted min-plus generalization built on the
same engine machinery as algos/wcc.py: every superstep the improved
frontier offers `dist(u) + w(u,v)` to its out-neighbors, receivers keep the
min (plato's write_min combiner ≙ groupBy(dst).min), and the next frontier
is the set of vertices whose distance improved. Converges in O(max hop
count of any shortest path) supersteps — Bellman-Ford superstep structure
with frontier pruning (only improved vertices re-offer).

Distances are exact sums along paths (left-to-right accumulation), so
results are engine-reproducible and oracle-checkable with unrolled SQL.
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

PUSH_THRESHOLD = 0.05  # same frontier-broadcast policy as algos/wcc.py


def sssp(
    edges: DataFrame,
    root: int,
    weight: str | None = None,
    max_iters: int = 200,
) -> DataFrame:
    """(id, dist: double) for every vertex REACHABLE from ``root``.

    edges: directed (src, dst[, weight]); weight omitted => every edge has
    length 1.0 (degenerates to BFS hop distance). For undirected graphs
    pass the symmetrized table.
    """
    spark = edges.sparkSession
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e0 = edges.select("src", "dst", w_col.alias("w")).persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_e)
    e = e0.repartition(shuffle_n, "src").persist()
    e.count()
    e0.unpersist()
    n_vertices = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )

    state = spark.createDataFrame([(int(root), 0.0)], "id long, dist double")
    frontier = state
    with scoped_superstep_confs(spark, shuffle_n):
        for _ in range(max_iters):
            n_front = frontier.count()
            if n_front == 0:
                break
            f = frontier
            if n_front < PUSH_THRESHOLD * n_vertices:
                f = F.broadcast(f)
            cand = (
                e.join(f.select(F.col("id").alias("src"), "dist"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
            )
            merged = state.join(cand, "id", "outer").select(
                "id",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("nd", F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.col("nd").isNotNull()
                    & (F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
                ).alias("improved"),
            ).transform(cheap_localCheckpoint)
            frontier = merged.where("improved").select("id", "dist")
            state = merged.select("id", "dist")
    return state


def widest_path(
    edges: DataFrame,
    root: int,
    weight: str = "weight",
    max_iters: int = 200,
) -> DataFrame:
    """(id, cap: double) — bottleneck (widest-path) capacity from ``root``
    for every OTHER reachable vertex: max over paths of the min edge
    weight along the path.  The max-min semiring twin of :func:`sssp`
    (min-plus): same frontier relaxation, ``F.greatest``/``F.least``
    swapped in for min/+.  Values are exact copies of edge weights (the
    bottleneck IS some edge), so results are engine-reproducible with no
    float accumulation at all.

    The root itself (capacity +inf by convention) is excluded from the
    output so every returned value is a finite, hashable weight.

    Converges in O(max hop count of any bottleneck-optimal path)
    supersteps — capacities only ever increase, receivers keep the max
    (plato's write_max combiner ≙ groupBy(dst).max), and only improved
    vertices re-offer.  Unlike shortest paths, a bottleneck-optimal path
    can be LONGER (more hops) than any shortest path — the wide detour —
    so the fixpoint hop bound is measured, not inherited from sssp.
    """
    spark = edges.sparkSession
    e0 = edges.select(
        "src", "dst", F.col(weight).cast("double").alias("w")
    ).persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_e)
    e = e0.repartition(shuffle_n, "src").persist()
    e.count()
    e0.unpersist()
    n_vertices = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )

    state = spark.createDataFrame(
        [(int(root), float("inf"))], "id long, cap double"
    )
    frontier = state
    neg_inf = F.lit(float("-inf"))
    with scoped_superstep_confs(spark, shuffle_n):
        for _ in range(max_iters):
            n_front = frontier.count()
            if n_front == 0:
                break
            f = frontier
            if n_front < PUSH_THRESHOLD * n_vertices:
                f = F.broadcast(f)
            cand = (
                e.join(f.select(F.col("id").alias("src"), "cap"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max(F.least(F.col("cap"), F.col("w"))).alias("nc"))
            )
            merged = state.join(cand, "id", "outer").select(
                "id",
                F.greatest(
                    F.coalesce("cap", neg_inf), F.coalesce("nc", neg_inf)
                ).alias("cap"),
                (
                    F.col("nc").isNotNull()
                    & (F.col("cap").isNull() | (F.col("nc") > F.col("cap")))
                ).alias("improved"),
            ).transform(cheap_localCheckpoint)
            frontier = merged.where("improved").select("id", "cap")
            state = merged.select("id", "cap")
    return state.where(F.col("id") != int(root))
