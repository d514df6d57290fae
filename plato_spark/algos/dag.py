"""DAG longest-path levels (topological depth) — max-plus frontier relaxation.

Beyond-reference operator: the reference engine ships traversals (BFS
``/root/reference/plato/algo/bfs/bfs.hpp:55-155``) but no DAG layering;
this is the dependency-scheduling primitive a pipeline DAG or a software
/ citation / condensation graph needs: ``level(v)`` = length (in edges)
of the LONGEST path ending at ``v`` — i.e. the earliest parallel wave in
which ``v`` can run once all its prerequisites have.

Same superstep machinery as algos/sssp.py with (min,+) replaced by
(max,+): every round the improved frontier offers ``level(u) + 1`` to
its out-neighbors, receivers keep the max (write_max combiner ≙
``groupBy(dst).max``), and the next frontier is the set whose level
grew.  Converges in depth(DAG) supersteps; each round is one
co-partitioned join + map-side-combined aggregation, with the sparse
frontier broadcast under the same push/pull policy as wcc/sssp.  At
100 TB the cost driver is DAG depth, not vertex count — shallow/wide
DAGs (the common dependency-graph shape) finish in few supersteps.

Cycle safety: in a cyclic graph (max,+) relaxation never converges, so
after ``n_vertices`` rounds levels provably exceed any simple path and
the loop raises instead of spinning.

Levels are exact small integers (no float accumulation), so results are
engine-reproducible and oracle-checkable.
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


def dag_levels(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 10_000,
) -> DataFrame:
    """(id, level: long) for every vertex; sources have level 0.

    edges: directed (src, dst) of an acyclic graph.  ``vertices``
    optionally names isolated vertices (level 0) not present in edges.
    Raises ``ValueError`` if relaxation outlives every simple path
    (i.e. the graph has a cycle reachable by the propagation).
    """
    spark = edges.sparkSession
    e0 = edges.select("src", "dst").distinct().persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, max(n_e, 1))
    e = e0.repartition(shuffle_n, "src").persist()
    e.count()
    e0.unpersist()

    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
    )
    if vertices is not None:
        verts = verts.unionByName(vertices.select("id"))
    verts = verts.distinct()

    state = verts.select("id", F.lit(0).cast("long").alias("level"))
    state = state.transform(cheap_localCheckpoint)
    n_vertices = state.count()
    frontier = state

    with scoped_superstep_confs(spark, shuffle_n):
        for rnd in range(max_iters):
            n_front = frontier.count()
            if n_front == 0:
                break
            if rnd >= n_vertices:
                raise ValueError(
                    "dag_levels: relaxation exceeded n_vertices rounds — "
                    "input graph has a cycle"
                )
            f = frontier
            if n_front < PUSH_THRESHOLD * n_vertices:
                f = F.broadcast(f)
            cand = (
                e.join(f.select(F.col("id").alias("src"), "level"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max(F.col("level") + F.lit(1)).alias("nl"))
            )
            merged = state.join(cand, "id", "left").select(
                "id",
                F.greatest(F.col("level"), F.coalesce("nl", F.lit(0))).alias("level"),
                (F.coalesce("nl", F.lit(0)) > F.col("level")).alias("improved"),
            ).transform(cheap_localCheckpoint)
            frontier = merged.where("improved").select("id", "level")
            state = merged.select("id", "level")
    e.unpersist()
    return state


def dag_critical_path(
    edges: DataFrame,
    weights: DataFrame,
    max_iters: int = 10_000,
) -> DataFrame:
    """(id, path_weight) — weight of the HEAVIEST path ending at each
    vertex, vertex-weighted (max,+) relaxation: the critical-path /
    schedule-makespan primitive (dag_levels with edge-count replaced by
    a weight sum; levels are the w=1 special case).

    weights: (id, w) positive vertex weights; vertices absent from
    ``edges`` still report path_weight = w.  Converges in depth(DAG)
    supersteps with the same frontier push/pull policy and cycle guard
    as dag_levels.  Exact integer arithmetic.
    """
    spark = edges.sparkSession
    e0 = edges.select("src", "dst").distinct().persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, max(n_e, 1))
    e = e0.repartition(shuffle_n, "src").persist()
    e.count()
    e0.unpersist()

    w0 = weights.select("id", F.col("w").cast("long").alias("w"))
    state = w0.select("id", "w", F.col("w").alias("path_weight"))
    state = state.transform(cheap_localCheckpoint)
    n_vertices = state.count()
    frontier = state.select("id", "path_weight")

    with scoped_superstep_confs(spark, shuffle_n):
        for rnd in range(max_iters):
            n_front = frontier.count()
            if n_front == 0:
                break
            if rnd >= n_vertices:
                raise ValueError(
                    "dag_critical_path: relaxation exceeded n_vertices "
                    "rounds — input graph has a cycle"
                )
            f = frontier
            if n_front < PUSH_THRESHOLD * n_vertices:
                f = F.broadcast(f)
            cand = (
                e.join(f.select(F.col("id").alias("src"), "path_weight"),
                       "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("path_weight").alias("best_pred"))
            )
            merged = state.join(cand, "id", "left").select(
                "id", "w",
                F.greatest(
                    F.col("path_weight"),
                    F.col("w") + F.coalesce("best_pred", F.lit(0)),
                ).alias("path_weight"),
                (F.col("w") + F.coalesce("best_pred", F.lit(0))
                 > F.col("path_weight")).alias("improved"),
            ).transform(cheap_localCheckpoint)
            frontier = merged.where("improved").select("id", "path_weight")
            state = merged.select("id", "w", "path_weight")
    e.unpersist()
    return state.select("id", "path_weight")
