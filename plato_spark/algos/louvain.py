"""Louvain / FastUnfolding community detection (modularity optimization).

Reference: /root/reference/plato/algo/fast_unfolding/louvain.hpp
  - opts (44-49): outer_iteration 3 (move/coarsen epochs), inner_iteration 2
  - gain (183-187): try_change(v, from, to) =
        ki_in_to - ki_in_from - 2*ki(v)*(ki(v) + sigma_tot(to) - sigma_tot(from))/m
    with m = total edge weight (doubled-undirected sum / 2, louvain.hpp:370)
  - outer rounds contract communities into super-vertices and re-run
    (rebuild, louvain.hpp:379-402): coarsen = groupBy(comm_src, comm_dst).sum(w)

Determinism divergence (documented): the reference moves vertices
asynchronously in thread order; we evaluate moves SYNCHRONOUSLY per
sub-round with (a) deterministic argmax (max gain, then smallest target
community) and (b) parity alternation — only vertices with id%2 == round%2
may move in a sub-round — which prevents the classic synchronous two-vertex
label swap oscillation. Same optimization objective, reproducible output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.graph.edges import symmetrize
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)


def _one_level(sym: DataFrame, m: float, inner_iters: int) -> DataFrame:
    """One move epoch on a (symmetrized, weighted) graph; returns (id, comm)."""
    ki = sym.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("ki")).persist()
    state = ki.select("id", F.col("id").alias("comm"), "ki")

    for r in range(2 * inner_iters):
        sigma = state.groupBy("comm").agg(F.sum("ki").alias("sigma")).persist()
        # ki_in per (vertex, neighboring community), including own community
        nbr_comm = (
            sym.join(
                state.select(F.col("id").alias("src"), F.col("comm").alias("nc")), "src"
            )
            .groupBy(F.col("dst").alias("id"), F.col("nc").alias("cand"))
            .agg(F.sum("w").alias("ki_in"))
        )
        cur = state.select(
            "id", F.col("comm").alias("from_c"), "ki"
        ).join(
            sigma.select(F.col("comm").alias("from_c"), F.col("sigma").alias("sig_from")),
            "from_c",
        )
        own_in = nbr_comm.join(
            cur.select("id", F.col("from_c").alias("cand")), ["id", "cand"]
        ).select("id", F.col("ki_in").alias("ki_in_from"))
        cands = (
            nbr_comm.join(cur, "id")
            .where(F.col("cand") != F.col("from_c"))
            .join(own_in, "id", "left")
            .join(
                sigma.select(F.col("comm").alias("cand"), F.col("sigma").alias("sig_to")),
                "cand",
            )
            .select(
                "id",
                "cand",
                # textbook Blondel gain (2m*dQ/2): moving v from A to B with
                # sigma_A including v:
                #   dQ*m = (ki_in_B - ki_in_A') - ki*(ki + sigma_B - sigma_A)/(2m)
                # NOTE divergence: the reference's try_change
                # (louvain.hpp:183-187) uses a 2*ki*x/m penalty — 4x the true
                # dQ penalty — which suppresses obviously-profitable merges
                # (two K5 cliques never coalesce under it); we optimize true
                # modularity instead.
                (
                    F.col("ki_in")
                    - F.coalesce("ki_in_from", F.lit(0.0))
                    - F.col("ki")
                    * (F.col("ki") + F.col("sig_to") - F.col("sig_from"))
                    / F.lit(2.0 * m)
                ).alias("gain"),
            )
            .where(F.col("gain") > 1e-12)
        )
        best = (
            cands.groupBy("id")
            .agg(
                F.max(
                    F.struct(
                        F.round(F.col("gain"), 9).alias("g"), (-F.col("cand")).alias("negc")
                    )
                ).alias("mx")
            )
            .select("id", (-F.col("mx.negc")).alias("to_c"))
        )
        new_state = (
            state.join(best, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("to_c").isNotNull() & (F.pmod("id", F.lit(2)) == F.lit(r % 2)),
                    F.col("to_c"),
                )
                .otherwise(F.col("comm"))
                .alias("comm"),
                "ki",
            )
            .localCheckpoint(eager=True)
        )
        sigma.unpersist()
        state = new_state
    ki.unpersist()
    return state.select("id", "comm")


def louvain(
    edges: DataFrame,
    outer_iterations: int = 3,
    inner_iterations: int = 2,
    weight: str | None = None,
) -> DataFrame:
    """Returns (id, community) over canonical undirected edges (src<dst).

    weight: optional edge-weight column; default 1.0 per edge.
    """
    spark = edges.sparkSession
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    canon = edges.select("src", "dst", w_col.alias("w")).persist()
    n_edges = canon.count()
    shuffle_n = auto_shuffle_partitions(spark, 2 * n_edges)
    m = float(canon.agg(F.sum("w")).collect()[0][0])  # louvain.hpp:370 (m = sum/2 of doubled)

    with scoped_shuffle_partitions(spark, shuffle_n):
        # mapping: original id -> current community (composed across epochs)
        mapping = None
        g = symmetrize(canon).persist()
        for epoch in range(outer_iterations):
            labels = _one_level(g, m, inner_iterations).persist()
            if mapping is None:
                mapping = labels.select("id", F.col("comm").alias("community")).persist()
            else:
                mapping = (
                    mapping.join(
                        labels.select(
                            F.col("id").alias("community"), F.col("comm").alias("nc")
                        ),
                        "community",
                    )
                    .select("id", F.col("nc").alias("community"))
                    .persist()
                )
                mapping.count()
            if epoch == outer_iterations - 1:
                break
            # coarsen: contract communities (rebuild, louvain.hpp:379-402)
            g_next = (
                g.join(labels.select(F.col("id").alias("src"), F.col("comm").alias("cs")), "src")
                .join(labels.select(F.col("id").alias("dst"), F.col("comm").alias("cd")), "dst")
                .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
                .agg(F.sum("w").alias("w"))
                .persist()
            )
            g_next.count()
            g.unpersist()
            g = g_next
    return mapping


def modularity(edges: DataFrame, communities: DataFrame, weight: str | None = None) -> float:
    """Newman modularity Q of an assignment over canonical undirected edges."""
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    canon = edges.select("src", "dst", w_col.alias("w"))
    sym = symmetrize(canon)
    m2 = float(sym.agg(F.sum("w")).collect()[0][0])  # = 2m
    c = communities.select(F.col("id"), F.col("community"))
    intra = (
        sym.join(c.select(F.col("id").alias("src"), F.col("community").alias("c1")), "src")
        .join(c.select(F.col("id").alias("dst"), F.col("community").alias("c2")), "dst")
        .where("c1 = c2")
        .agg(F.sum("w"))
        .collect()[0][0]
        or 0.0
    )
    ki = sym.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("ki"))
    sig = (
        ki.join(c, "id")
        .groupBy("community")
        .agg(F.sum("ki").alias("s"))
        .agg(F.sum(F.col("s") * F.col("s")))
        .collect()[0][0]
    )
    return float(intra) / m2 - float(sig) / (m2 * m2)
