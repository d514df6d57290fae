"""Breadth-first search + tree depth/width statistics.

Reference:
- BFS: /root/reference/plato/algo/bfs/bfs.hpp:37-155 — frontier expansion
  from opts.root over out-edges, parent array + CAS dedup, push/pull dual
  mode; returns visited count. Our state carries (id, dist) levels instead
  of parents (equivalent traversal; plato's bfs example also reports
  levels); push/pull switch = broadcast-vs-shuffle frontier join.
- tree depth/width: /root/reference/plato/algo/tree_stat/tree_stat.hpp:37-156
  — BFS recording per-level frontier size (width) and level count (depth).
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

PUSH_THRESHOLD = 0.05


def bfs(edges: DataFrame, root: int, max_iters: int = 10_000) -> DataFrame:
    """Level-synchronous BFS over DIRECTED edges from ``root``.

    Returns (id, dist) for REACHED vertices only (plato reports the visited
    count; unreached vertices have no level). For undirected traversal pass
    a symmetrized edge table.
    """
    spark = edges.sparkSession
    e0 = edges.select("src", "dst").persist()
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

    visited = spark.createDataFrame([(int(root), 0)], "id long, dist int")
    frontier = visited
    with scoped_superstep_confs(spark, shuffle_n):
        level = 0
        while level < max_iters:
            level += 1
            n_front = frontier.count()
            if n_front == 0:
                break
            f = frontier.select(F.col("id").alias("src"))
            if n_front < PUSH_THRESHOLD * n_vertices:
                f = F.broadcast(f)
            # localCheckpoint (not persist): the visited/frontier union chain
            # otherwise grows an exponentially nested logical plan — plan
            # truncation is mandatory in iterative loops (SURVEY §4#15)
            nxt = (
                e.join(f, "src")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited.select("id", F.lit(1).alias("__seen")), "id", "left")
                .where(F.col("__seen").isNull())
                .select("id", F.lit(level).cast("int").alias("dist"))
                .transform(cheap_localCheckpoint)
            )
            visited, frontier = visited.unionByName(nxt).transform(cheap_localCheckpoint), nxt
    return visited


def tree_stat(edges: DataFrame, root: int) -> DataFrame:
    """(depth, width) of the BFS tree from root (tree_stat.hpp semantics:
    depth = number of levels below root, width = max level population)."""
    levels = bfs(edges, root)
    return levels.agg(
        F.max("dist").cast("long").alias("depth"),
        F.max(F.lit(1)).alias("__one"),
    ).drop("__one").crossJoin(
        levels.groupBy("dist").count().agg(F.max("count").cast("long").alias("width"))
    )


def pseudo_diameter(edges: DataFrame, max_iters: int = 10_000) -> DataFrame:
    """One row (start_id, far_id, diameter_lb) — the classic double-sweep
    BFS diameter lower bound (Magnien/Latapy/Habib 2009) over the
    undirected graph: BFS from a deterministic start (the smallest vertex
    id), hop to the farthest vertex found (tie: smallest id), BFS again;
    the second eccentricity is a lower bound on the true diameter that is
    exact on trees and empirically tight on real graphs.

    The cheap deterministic companion to the HyperANF effective-diameter
    estimate (algos/hyperanf): two BFS sweeps instead of a sketch per
    vertex, an exact integer instead of a quantile of an estimator.
    Cost: 2 * O(E * diameter) — two frontier loops, each superstep one
    join + one anti-join, same kernel discipline as bfs().
    """
    spark = edges.sparkSession
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    start = int(
        sym.agg(F.min("src").alias("m")).collect()[0]["m"]
    )
    d1 = bfs(sym, start, max_iters)
    far = d1.agg(
        F.max(F.struct(F.col("dist"), (-F.col("id")).alias("nid"))).alias("t")
    ).select(
        F.col("t.dist").alias("ecc1"), (-F.col("t.nid")).alias("far")
    ).collect()[0]
    far_id = int(far["far"])
    d2 = bfs(sym, far_id, max_iters)
    lb = d2.agg(F.max("dist").alias("m")).collect()[0]["m"]
    return spark.createDataFrame(
        [(start, far_id, int(lb))],
        "start_id long, far_id long, diameter_lb int",
    )


def bfs_path_counts(
    edges: DataFrame, root: int, max_iters: int = 10_000
) -> DataFrame:
    """(id, dist, sigma) — BFS levels PLUS the exact number of distinct
    shortest paths from ``root`` (Brandes' sigma, exposed standalone:
    betweenness consumes it internally, but sigma is a first-class
    signal on its own — a vertex reached by one shortest path is a
    routing bottleneck; one reached by thousands is redundantly
    connected).  Level-synchronous: the frontier carries sigma and the
    next level's sigma is the SUM over frontier predecessors (exact
    BIGINT — path counts through a level multiply only by edge fan-in,
    so int64 holds to ~1e18 paths; beyond that the count is a
    log-domain question, not a BIGINT one).  Same loop shape, plan
    truncation and broadcast policy as bfs() above.
    """
    spark = edges.sparkSession
    e0 = edges.select("src", "dst").persist()
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
    visited = spark.createDataFrame(
        [(int(root), 0, 1)], "id long, dist int, sigma long"
    )
    frontier = visited.select("id", "sigma")
    with scoped_superstep_confs(spark, shuffle_n):
        level = 0
        while level < max_iters:
            level += 1
            n_front = frontier.count()
            if n_front == 0:
                break
            f = frontier.select(F.col("id").alias("src"), "sigma")
            if n_front < PUSH_THRESHOLD * n_vertices:
                f = F.broadcast(f)
            nxt = (
                e.join(f, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("sigma").cast("long").alias("sigma"))
                .join(visited.select("id", F.lit(1).alias("__seen")), "id", "left")
                .where(F.col("__seen").isNull())
                .select("id", F.lit(level).cast("int").alias("dist"), "sigma")
                .transform(cheap_localCheckpoint)
            )
            visited = visited.unionByName(nxt).transform(cheap_localCheckpoint)
            frontier = nxt.select("id", "sigma")
    return visited


def bfs_parents(edges: DataFrame, root: int, max_iters: int = 10_000
                ) -> DataFrame:
    """(id, dist, parent) — the deterministic shortest-path TREE from
    ``root``: each reached vertex records the SMALLEST-id predecessor
    at distance dist-1 (the route you would actually follow back; the
    path-reconstruction read-out plato's visitor callbacks expose,
    bfs.hpp's per-vertex visit hook).  Root's parent is NULL.

    Composition, not a new loop: the proven level table plus ONE
    edge-predecessor join and a min-aggregation — min over equal-level
    in-neighbors is a total order, so the tree is engine-portable."""
    levels = bfs(edges, root, max_iters=max_iters)
    pred = (
        edges.join(levels.select(F.col("id").alias("src"),
                                 F.col("dist").alias("pd")), "src")
        .join(levels.select(F.col("id").alias("dst"),
                            F.col("dist").alias("cd")), "dst")
        .where(F.col("pd") == F.col("cd") - 1)
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("src").alias("parent"))
    )
    return levels.join(pred, "id", "left").select(
        "id", "dist", F.col("parent").cast("long").alias("parent"))
