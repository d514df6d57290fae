"""Sampled betweenness centrality (Bader/Brandes scheme).

Reference: /root/reference/plato/algo/bnc/bader.hpp:48-140 — Brandes
dependency accumulation from sampled roots: per root, a forward BFS builds
the shortest-path DAG (dist + sigma = #shortest paths), then a backward
level sweep accumulates delta(u) += sigma_u/sigma_w * (1 + delta_w) over DAG
edges u->w; bc(v) = sum over roots of delta (v != root). The reference
samples roots randomly with adaptive stopping (bader.hpp:121); we pin the
``num_samples`` SMALLEST vertex ids (deterministic, oracle-checkable —
same estimator given the sample set, documented divergence like cnc/lpa).

Spark plan: ONE multi-source pass — every frontier/sigma/delta table carries
a ``root`` column, so the forward phase is diameter-many joins total (not
per root) and the backward phase is max_level-many joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

from plato_spark.graph.edges import symmetrize
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)


def _forward_levels(edges: DataFrame, num_samples: int, max_iters: int):
    """Shared Brandes forward phase: multi-source BFS shortest-path DAG.

    Returns (sym, verts, shuffle_n, levels) where ``levels[k]`` is the
    (root, id, dist, sigma) frontier at distance k — consumed by the
    vertex backward sweep (betweenness_sampled) and the edge one
    (edge_betweenness_sampled)."""
    spark = edges.sparkSession
    sym0 = symmetrize(edges.select("src", "dst")).persist()
    n_sym = sym0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_sym)
    sym = sym0.repartition(shuffle_n, "src").persist()
    sym.count()
    sym0.unpersist()

    verts = (
        sym.select(F.col("src").alias("id")).distinct().persist()
    )
    roots = [
        int(r["id"]) for r in verts.orderBy("id").limit(num_samples).collect()
    ]

    # ---- forward: (root, id, dist, sigma) --------------------------------
    visited = spark.createDataFrame(
        [(r, r, 0, 1.0) for r in roots], "root long, id long, dist int, sigma double"
    )
    frontier = visited
    levels = [frontier]
    with scoped_shuffle_partitions(spark, shuffle_n):
        level = 0
        while level < max_iters:
            level += 1
            if frontier.count() == 0:
                levels.pop()  # last frontier is empty
                break
            # localCheckpoint: truncate the exponentially nesting union plan
            nxt = (
                sym.join(
                    frontier.select("root", F.col("id").alias("src"), "sigma"), "src"
                )
                .groupBy("root", F.col("dst").alias("id"))
                .agg(F.sum("sigma").alias("sigma"))
                .join(
                    visited.select("root", "id", F.lit(1).alias("__seen")),
                    ["root", "id"],
                    "left",
                )
                .where(F.col("__seen").isNull())
                .select("root", "id", F.lit(level).cast("int").alias("dist"), "sigma")
                .transform(cheap_localCheckpoint)
            )
            visited, frontier = (
                visited.unionByName(nxt).transform(cheap_localCheckpoint), nxt
            )
            levels.append(frontier)
    return sym, verts, shuffle_n, levels


def betweenness_sampled(
    edges: DataFrame,
    num_samples: int = 10,
    max_iters: int = 10_000,
) -> DataFrame:
    """(id, betweenness: double, 6dp) over canonical undirected edges."""
    spark = edges.sparkSession
    sym, verts, shuffle_n, levels = _forward_levels(edges, num_samples, max_iters)
    with scoped_shuffle_partitions(spark, shuffle_n):
        # ---- backward: delta per level ------------------------------------
        # delta(u) = sum over DAG-successors w: sigma_u/sigma_w * (1+delta_w)
        delta = levels[-1].select(
            "root", "id", "sigma", F.lit(0.0).alias("delta")
        ) if levels else None
        acc = [delta] if delta is not None else []
        for lvl in range(len(levels) - 2, -1, -1):
            succ = delta.select(
                "root", F.col("id").alias("dst"),
                ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("contrib"),
            )
            gathered = (
                sym.join(succ, "dst")
                .groupBy("root", F.col("src").alias("id"))
                .agg(F.sum("contrib").alias("g"))
            )
            cur = levels[lvl].select("root", "id", "sigma")
            delta = (
                cur.join(gathered, ["root", "id"], "left")
                .select(
                    "root",
                    "id",
                    "sigma",
                    (F.col("sigma") * F.coalesce("g", F.lit(0.0))).alias("delta"),
                )
                .transform(cheap_localCheckpoint)
            )
            acc.append(delta)

        all_delta = acc[0]
        for d in acc[1:]:
            all_delta = all_delta.unionByName(d)
        result = (
            all_delta.where(F.col("id") != F.col("root"))
            .groupBy("id")
            .agg(F.sum("delta").alias("b"))
        )
        out = (
            verts.join(result, "id", "left")
            .select(
                "id", F.round(F.coalesce("b", F.lit(0.0)), 6).alias("betweenness")
            )
            .persist()
        )
        out.count()
    return out


def edge_betweenness_sampled(
    edges: DataFrame,
    num_samples: int = 10,
    max_iters: int = 10_000,
) -> DataFrame:
    """(src, dst, edge_betweenness: double, 6dp) per canonical undirected
    edge — the Girvan–Newman edge centrality, same sampled-root Brandes
    estimator as betweenness_sampled but accumulating the dependency on
    the DAG EDGE instead of its tail vertex:

        c({u, w}) += sigma_u / sigma_w * (1 + delta_w)

    for every shortest-path-DAG edge u->w (dist_w = dist_u + 1) of every
    sampled root (bader.hpp:48-140's summand, re-keyed).  High scores
    mark inter-community bridges — the edges whose removal fragments the
    graph, and exactly the cross-partition traffic a vertex-cut placement
    pays for every superstep.  An edge on no sampled DAG scores 0.0 (all
    canonical edges are emitted).

    Per root an undirected edge is a DAG edge in at most one orientation,
    so summing directed terms after least/greatest canonicalization is
    the textbook undirected definition.  Floats follow the betweenness
    discipline: few terms per edge (samples x 1), rounded to 6dp.
    """
    spark = edges.sparkSession
    sym, verts, shuffle_n, levels = _forward_levels(edges, num_samples, max_iters)
    canon = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    with scoped_shuffle_partitions(spark, shuffle_n):
        delta = levels[-1].select(
            "root", "id", "sigma", F.lit(0.0).alias("delta")
        ) if levels else None
        edge_terms = None
        for lvl in range(len(levels) - 2, -1, -1):
            succ = delta.select(
                "root", F.col("id").alias("dst"),
                ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("contrib"),
            )
            cur = levels[lvl].select("root", "id", "sigma")
            # DAG edges at this level: graph edge src->dst with src at
            # dist lvl (the cur join) and dst at dist lvl+1 (the succ join)
            dag = sym.join(succ, "dst").join(
                cur.select("root", F.col("id").alias("src"),
                           F.col("sigma").alias("sig_u")),
                ["root", "src"],
            )
            # int64 PICOUNIT terms: the cross-root/level sum must be an
            # order-free integer fold — raw double terms summed in
            # reduce order split engines on exact 6dp half-ties
            # (2/1,196,000 edges at sf0.1).  One identical
            # multiply+round per term on both engines (the oracle uses
            # the same sig_u * contrib association); |term| <= n, so
            # term*1e12 stays in int64 through ~1e6-vertex samples —
            # the sampled-roots regime this estimator is for.
            terms = dag.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                F.round(F.col("sig_u") * F.col("contrib") * F.lit(1e12), 0)
                .cast("long").alias("term"),
            )
            edge_terms = (
                terms if edge_terms is None
                else edge_terms.unionByName(terms).transform(cheap_localCheckpoint)
            )
            gathered = (
                sym.join(succ, "dst")
                .groupBy("root", F.col("src").alias("id"))
                .agg(F.sum("contrib").alias("g"))
            )
            delta = (
                cur.join(gathered, ["root", "id"], "left")
                .select(
                    "root", "id", "sigma",
                    (F.col("sigma") * F.coalesce("g", F.lit(0.0))).alias("delta"),
                )
                .transform(cheap_localCheckpoint)
            )
        scores = (
            edge_terms.groupBy("src", "dst")
            .agg(F.sum("term").cast("long").alias("t"))
            if edge_terms is not None else None
        )
        out = canon
        if scores is not None:
            out = canon.join(scores, ["src", "dst"], "left")
        else:
            out = canon.select("src", "dst", F.lit(None).cast("long").alias("t"))
        su = F.coalesce("t", F.lit(0)) + F.lit(500000)
        out = out.select(
            "src", "dst",
            # integer HALF_UP at 6dp from the picounit sum
            ((su - su % F.lit(1000000)) / F.lit(1000000) / F.lit(1e6))
            .alias("edge_betweenness"),
        ).persist()
        out.count()
    return out
