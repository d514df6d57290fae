"""Sampled closeness + harmonic centrality (David et al. scheme).

Reference: /root/reference/plato/algo/cnc/david.hpp
  - run connected components first; restrict to the MAJOR component
    (david.hpp:124-141)
  - fac = V_major / (num_samples * (V_major - 1))  (david.hpp:139-140)
  - BFS from each sample accumulating hop distances
    (distance kernel /root/reference/plato/algo/cnc/distance.hpp:40-116);
    closeness[v] = 1 / (fac * sum_s dist(s, v)), inf -> 0
    (david.hpp:206-225)
  - the reference samples roots RANDOMLY on rank 0 (make_samples); we pin
    the num_samples SMALLEST vertex ids of the major component so results
    are deterministic and oracle-checkable (documented divergence; the
    estimator is identical given the same sample set).

Harmonic centrality is the standard disconnected-robust variant (sum of
1/dist instead of 1/sum-of-dist); it shares the same sampled multi-source
BFS.  Its per-vertex fold sums the INTEGER weights L/dist (L = lcm(1..R),
R = the radius cap), so the accumulation is order-free exact integer
arithmetic and only ONE float division happens at read-out — bit-identical
across engines, hence SQL-oracle-checkable (the katz lesson: never
round(6dp) a float that was accumulated in engine-dependent order).

Spark plan: one MULTI-SOURCE level-synchronous BFS — the frontier carries a
``root`` column so all samples expand in a single loop (k joins instead of
k*diameter), then one groupBy(id) fold.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

from plato_spark.algos.wcc import connected_components
from plato_spark.graph.edges import symmetrize
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)


def _sampled_bfs(
    edges: DataFrame, num_samples: int, max_iters: int
) -> tuple[DataFrame, float, DataFrame]:
    """Shared kernel: major-component restriction + deterministic sample
    policy (the ``num_samples`` smallest member ids) + one multi-source
    level-synchronous BFS.

    Returns (members, fac, visited) where visited = (root, id, dist) for
    every vertex within ``max_iters`` hops of a sample root and
    fac = V_major / (k * (V_major - 1)) — the reference's estimator scale.
    """
    spark = edges.sparkSession
    comp = connected_components(edges).persist()
    major = (
        comp.groupBy("component").count()
        .orderBy(F.desc("count"), F.asc("component")).limit(1).collect()[0]
    )
    major_label, v_major = int(major["component"]), int(major["count"])
    members = comp.where(F.col("component") == major_label).select("id").persist()
    k = min(num_samples, v_major)
    fac = float(v_major) / k / max(v_major - 1, 1)
    roots = [int(r["id"]) for r in members.orderBy("id").limit(k).collect()]

    sym0 = symmetrize(edges.select("src", "dst")).persist()
    n_sym = sym0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_sym)
    sym = sym0.repartition(shuffle_n, "src").persist()
    sym.count()
    sym0.unpersist()

    visited = spark.createDataFrame(
        [(r, r, 0) for r in roots], "root long, id long, dist int"
    )
    frontier = visited
    with scoped_shuffle_partitions(spark, shuffle_n):
        level = 0
        while level < max_iters:
            level += 1
            if frontier.count() == 0:
                break
            # localCheckpoint: truncate the exponentially nesting union plan
            nxt = (
                sym.join(frontier.select("root", F.col("id").alias("src")), "src")
                .select("root", F.col("dst").alias("id"))
                .distinct()
                .join(
                    visited.select("root", "id", F.lit(1).alias("__seen")),
                    ["root", "id"], "left",
                )
                .where(F.col("__seen").isNull())
                .select("root", "id", F.lit(level).cast("int").alias("dist"))
                .transform(cheap_localCheckpoint)
            )
            visited, frontier = (
                visited.unionByName(nxt).transform(cheap_localCheckpoint), nxt
            )
    sym.unpersist()
    comp.unpersist()
    return members, fac, visited


def closeness_sampled(
    edges: DataFrame,
    num_samples: int = 10,
    max_iters: int = 10_000,
) -> DataFrame:
    """(id, closeness: double rounded 6dp) for vertices of the major
    component, over canonical undirected edges (src<dst, unique)."""
    members, fac, visited = _sampled_bfs(edges, num_samples, max_iters)
    sums = visited.groupBy("id").agg(F.sum("dist").cast("double").alias("s"))
    return (
        members.join(sums, "id", "left")
        .select(
            "id",
            F.round(
                F.when(
                    F.coalesce("s", F.lit(0.0)) > 0,
                    1.0 / (F.lit(fac) * F.col("s")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("closeness"),
        )
    )


def closeness_exact(
    edges: DataFrame,
    num_roots: int = 64,
    max_iters: int = 10_000,
) -> DataFrame:
    """(id, closeness) — EXACT Bavelas closeness for a pinned root set.

    Reference: /root/reference/plato/algo/cnc/bavelas.hpp:55-66 —
    ``compute(root)`` is a PER-ROOT query: one full (untruncated) BFS
    from ``root``, then

        closeness(root) = (V - 1) / sum_v dist(root, v)

    with V the TOTAL graph vertex count (bavelas.hpp:64 uses
    ``graph_info_.vertices_``, not the reachable count) and 0 when the
    distance sum is 0.  The reference ships no all-vertices driver for
    it (example/cnc_simple.cc runs only sampled David) — it is an API
    you call for the roots you care about.  We mirror that shape: the
    deterministic root set is the ``num_roots`` smallest vertex ids of
    the major component (the same pinned-sample policy as
    closeness_sampled), each BFS exact to the component's eccentricity.

    Exactness: the distance sum is an order-free integer fold; the ONE
    float division (V-1)/sum happens at read-out, so the value is
    bit-identical to the SQL oracle.

    Scale fence: per-root cost is one full BFS sweep — O(E * diameter)
    work and O(V) state per root, all roots riding ONE multi-source
    level-synchronous loop (k joins total, not k*diameter).  Exact
    all-vertices closeness is O(V*E) and deliberately NOT offered as a
    single call; at 100 TB you run this for the handful of roots you
    actually need (or the sampled David estimator for a global field).
    """
    spark = edges.sparkSession
    v_total = (
        symmetrize(edges.select("src", "dst"))
        .select(F.col("src").alias("id")).distinct().count()
    )
    members, _fac, visited = _sampled_bfs(edges, num_roots, max_iters)
    sums = visited.groupBy("root").agg(
        F.sum("dist").cast("long").alias("s")
    )
    return sums.select(
        F.col("root").alias("id"),
        F.round(
            F.when(
                F.col("s") > 0,
                F.lit(float(v_total - 1)) / F.col("s").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("closeness"),
    )


def harmonic_sampled(
    edges: DataFrame,
    num_samples: int = 10,
    radius: int = 5,
) -> DataFrame:
    """(id, harmonic: double rounded 6dp) — radius-truncated sampled
    harmonic centrality over the major component:

        harmonic(v) = fac * sum_{s in samples, 0 < d(s,v) <= radius} 1/d(s,v)

    with the same fac = V/(k*(V-1)) scale as the closeness estimator.
    The truncation at ``radius`` hops is the standard bounded-radius
    variant (contributions beyond R hops are <= 1/R and dropped); it also
    bounds the BFS loop at R supersteps regardless of graph diameter.

    Exactness: the sum is folded as integer weights L/d (L = lcm(1..R),
    so every term divides L) — order-free integer addition, one float
    multiply at read-out, bit-identical to the unrolled SQL oracle.
    """
    members, fac, visited = _sampled_bfs(edges, num_samples, radius)
    lcm = math.lcm(*range(1, radius + 1))
    w = F.when(F.col("dist") > 0, F.lit(lcm) / F.col("dist")).otherwise(F.lit(0))
    sums = visited.groupBy("id").agg(
        F.sum(w.cast("long")).cast("long").alias("s")
    )
    return (
        members.join(sums, "id", "left")
        .select(
            "id",
            F.round(
                F.coalesce("s", F.lit(0)).cast("double") * F.lit(fac / lcm), 6
            ).alias("harmonic"),
        )
    )


def eccentricity(
    edges: DataFrame,
    num_roots: int = 64,
    max_iters: int = 10_000,
) -> DataFrame:
    """(id, ecc, n_reached) — EXACT eccentricity (max hop distance to any
    reachable vertex) for the pinned root set, over canonical undirected
    edges.  min(ecc) over any root set upper-bounds nothing but min over
    ALL vertices is the radius — over a pinned subset it is an UPPER
    bound on the radius, while max(ecc) is a LOWER bound on the diameter
    (the double-sweep pseudo_diameter refines that one); n_reached
    cross-checks that every root saw the whole major component.

    Same kernel, same pinned-root policy, and same scale fence as
    closeness_exact (reference bavelas.hpp runs per-root queries; all
    roots here ride ONE multi-source level-synchronous BFS): per-root
    cost is a full BFS sweep, so this is a query for the roots you
    care about, never an all-vertices call.  ecc and n_reached are
    exact integers — no float anywhere."""
    _members, _fac, visited = _sampled_bfs(edges, num_roots, max_iters)
    return visited.groupBy(F.col("root").alias("id")).agg(
        F.max("dist").cast("long").alias("ecc"),
        F.count(F.lit(1)).cast("long").alias("n_reached"),
    )


def harmonic_exact(
    edges: DataFrame,
    num_roots: int = 64,
    max_iters: int = 10_000,
    radius_cap: int = 20,
) -> DataFrame:
    """(id, harmonic) — EXACT harmonic centrality sum_{v != r} 1/d(r, v)
    for the pinned root set: the disconnected-robust centrality, here
    exact per root instead of the sampled per-vertex estimate
    (harmonic_sampled).  Same shared multi-source BFS, same pinned-root
    policy and scale fence as closeness_exact / eccentricity.

    Exactness: terms fold as integer weights L/d with L = lcm(1..
    ``radius_cap``) — order-free BIGINT addition, ONE float division at
    read-out (the harmonic_sampled discipline).  L/d is only integral
    for d <= radius_cap, so distances are asserted under the cap (a
    web-scale co-occurrence graph has diameter ~4-6; lcm(1..20) ~ 2.3e8
    leaves int64 headroom for ~4e10 accumulated terms)."""
    _members, _fac, visited = _sampled_bfs(edges, num_roots, max_iters)
    lcm = math.lcm(*range(1, radius_cap + 1))
    over = visited.where(F.col("dist") > radius_cap).count()
    if over:
        raise ValueError(
            f"harmonic_exact: {over} BFS distances exceed radius_cap="
            f"{radius_cap}; raise the cap (L must stay divisible by d)"
        )
    w = F.when(F.col("dist") > 0,
               (F.lit(lcm) / F.col("dist")).cast("long")).otherwise(F.lit(0))
    return (
        visited.groupBy(F.col("root").alias("id"))
        .agg(F.sum(w).cast("long").alias("units"))
        .select("id", F.round(F.col("units") / F.lit(float(lcm)), 6)
                .alias("harmonic"))
    )


def landmark_stretch(
    edges: DataFrame,
    num_roots: int = 64,
    num_landmarks: int = 4,
    max_iters: int = 10_000,
) -> DataFrame:
    """(stretch: int, n_pairs: long) — quality audit of LANDMARK
    distance estimation, the standard trick for answering d(u, v)
    queries at 100 TB where per-query BFS is unaffordable: precompute
    exact distances from a few landmark vertices, then estimate
    d(u, v) <= min over landmarks l of d(l, u) + d(l, v) (triangle
    inequality — always an upper bound, tight iff some landmark sits on
    a shortest path).  This operator measures how loose: the histogram
    of (estimate - exact) over every (eval root, vertex) pair the
    shared multi-source BFS already knows exactly.

    Landmarks = the ``num_landmarks`` smallest sample roots; eval roots
    = the remaining roots.  Everything is an exact integer hop count —
    no float enters at ALL, so the histogram is engine-exact.

    Scale plan: ONE multi-source BFS serves both the exact side and the
    landmark tables (k joins total); the landmark-distance table is
    |landmarks| x V rows — the small side by construction — and the
    estimate is a broadcast-joinable min-plus fold, never a pairwise
    V x V product."""
    _members, _fac, visited = _sampled_bfs(edges, num_roots, max_iters)
    roots = visited.where(F.col("dist") == 0).select("root")
    lmk = roots.orderBy("root").limit(num_landmarks)
    ev = roots.join(lmk.withColumnRenamed("root", "l"),
                    F.col("root") == F.col("l"), "left_anti")
    lv = visited.join(
        F.broadcast(lmk.withColumnRenamed("root", "l")),
        F.col("root") == F.col("l"), "left_semi",
    ).select(F.col("root").alias("l"), F.col("id").alias("v"),
             F.col("dist").alias("dlv"))
    lr = lv.join(
        F.broadcast(ev.withColumnRenamed("root", "r")),
        F.col("v") == F.col("r"), "left_semi",
    ).select("l", F.col("v").alias("r"), F.col("dlv").alias("dlr"))
    est = (
        lv.join(F.broadcast(lr), "l")
        .groupBy("r", "v")
        .agg(F.min(F.col("dlr") + F.col("dlv")).alias("dest"))
    )
    exact = visited.join(
        F.broadcast(ev.withColumnRenamed("root", "rr")),
        F.col("root") == F.col("rr"), "left_semi",
    ).where(F.col("id") != F.col("root")).select(
        F.col("root").alias("r"), F.col("id").alias("v"),
        F.col("dist").alias("dex"))
    return (
        exact.join(est, ["r", "v"])
        .groupBy((F.col("dest") - F.col("dex")).cast("int")
                 .alias("stretch"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
