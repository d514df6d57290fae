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

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

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
            .transform(cheap_localCheckpoint)
        )
        sigma.unpersist()
        state = new_state
    ki.unpersist()
    return state.select("id", "comm")


def _one_level_density(sym: DataFrame, m: float, inner_iters: int) -> DataFrame:
    """One move epoch of the DENSITY-modulated variant; returns (id, comm).

    Reference: /root/reference/plato/algo/fast_unfolding/louvain_density.hpp
    (try_change, 194-219): each community's contribution is scaled by its
    edge density above the graph average,
        p_c = 2*E_c / (n_c*(n_c-1)) - p_all,   p_all = 2*E / (N*(N-1)),
    and the objective is  D = sum_c [ p_c * W_c  -  p_c^2 * S_c^2 / 2m ]
    with W_c = internal weight (doubled, self-loops once), S_c = sum of ki.
    Divergence (documented, same discipline as _one_level): the reference
    tracks sigma_in / c_edges as path-dependent incremental bookkeeping
    under asynchronous moves; we compute the INVARIANT aggregates each
    sub-round and move synchronously with parity alternation and
    deterministic argmax, so output is a pure function of the graph.
    """
    m2 = 2.0 * m
    selfs = (
        sym.where(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("w").alias("self_w"), F.count("*").alias("self_e"))
    )
    nonself = sym.where(F.col("src") != F.col("dst")).persist()
    ki = sym.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("ki"))
    base = ki.join(selfs, "id", "left").select(
        "id",
        "ki",
        F.coalesce("self_w", F.lit(0.0)).alias("self_w"),
        F.coalesce("self_e", F.lit(0)).cast("long").alias("self_e"),
    ).persist()
    n_vertices = base.count()
    row = nonself.agg(F.count("*").alias("ns")).collect()[0]
    n_edges = int(row["ns"]) / 2.0 + float(
        base.agg(F.sum("self_e")).collect()[0][0] or 0
    )
    p_all = (
        2.0 * n_edges / (n_vertices * (n_vertices - 1.0))
        if n_vertices > 1 else 1.0
    )
    state = base.select("id", F.col("id").alias("comm"), "ki", "self_w", "self_e")

    def p_of(e_col, n_col):
        return F.when(
            n_col > 1, 2.0 * e_col / (n_col * (n_col - 1.0)) - F.lit(p_all)
        ).otherwise(F.lit(1.0 - p_all))

    for r in range(2 * inner_iters):
        # per (vertex, neighboring community): weighted + unweighted links
        nbr = (
            nonself.join(
                state.select(F.col("id").alias("src"), F.col("comm").alias("nc")),
                "src",
            )
            .groupBy(F.col("dst").alias("id"), F.col("nc").alias("cand"))
            .agg(F.sum("w").alias("ki_in"), F.count("*").alias("e_in"))
        ).persist()
        own = nbr.join(
            state.select("id", F.col("comm").alias("cand")), ["id", "cand"]
        ).select("id", "cand", "ki_in", "e_in")
        cstats = (
            state.join(
                own.select("id", F.col("ki_in").alias("oki"), F.col("e_in").alias("oe")),
                "id", "left",
            )
            .groupBy("comm")
            .agg(
                F.count("*").cast("double").alias("n_c"),
                F.sum("ki").alias("s_tot"),
                (F.sum(F.coalesce("oki", F.lit(0.0))) + F.sum("self_w")).alias("w_c"),
                (F.sum(F.coalesce("oe", F.lit(0))) / 2.0 + F.sum("self_e")).alias("e_c"),
            )
            .persist()
        )
        cur = (
            state.join(own.select("id", F.col("ki_in").alias("ki_in_from"),
                                  F.col("e_in").alias("e_from")), "id", "left")
            .join(cstats.select(F.col("comm"), F.col("n_c").alias("n_f"),
                                F.col("s_tot").alias("s_f"),
                                F.col("w_c").alias("w_f"),
                                F.col("e_c").alias("e_f")), "comm")
            .select(
                "id", F.col("comm").alias("from_c"), "ki", "self_w", "self_e",
                F.coalesce("ki_in_from", F.lit(0.0)).alias("kif"),
                F.coalesce("e_from", F.lit(0)).cast("double").alias("eif"),
                "n_f", "s_f", "w_f", "e_f",
            )
        )
        cands = (
            nbr.join(cur, "id")
            .where(F.col("cand") != F.col("from_c"))
            .join(cstats.select(F.col("comm").alias("cand"),
                                F.col("n_c").alias("n_t"),
                                F.col("s_tot").alias("s_t"),
                                F.col("w_c").alias("w_t"),
                                F.col("e_c").alias("e_t")), "cand")
        )
        p_f = p_of(F.col("e_f"), F.col("n_f"))
        p_f2 = F.when(
            F.col("n_f") > 2,
            2.0 * (F.col("e_f") - F.col("eif") - F.col("self_e"))
            / ((F.col("n_f") - 1.0) * (F.col("n_f") - 2.0)) - F.lit(p_all),
        ).otherwise(F.lit(1.0 - p_all))
        p_t = p_of(F.col("e_t"), F.col("n_t"))
        p_t2 = (
            2.0 * (F.col("e_t") + F.col("e_in") + F.col("self_e"))
            / (F.col("n_t") * (F.col("n_t") + 1.0)) - F.lit(p_all)
        )
        x1 = (
            p_f2 * (F.col("w_f") - 2.0 * F.col("kif") - F.col("self_w"))
            - p_f * F.col("w_f")
            + p_t2 * (F.col("w_t") + 2.0 * F.col("ki_in") + F.col("self_w"))
            - p_t * F.col("w_t")
        )
        x2 = (
            p_f2 * p_f2 * (F.col("s_f") - F.col("ki")) * (F.col("s_f") - F.col("ki"))
            - p_f * p_f * F.col("s_f") * F.col("s_f")
            + p_t2 * p_t2 * (F.col("s_t") + F.col("ki")) * (F.col("s_t") + F.col("ki"))
            - p_t * p_t * F.col("s_t") * F.col("s_t")
        )
        scored = cands.select(
            "id", "cand", (x1 - x2 / F.lit(m2)).alias("gain")
        ).where(F.col("gain") > 1e-12)
        best = (
            scored.groupBy("id")
            .agg(
                F.max(
                    F.struct(
                        F.round(F.col("gain"), 9).alias("g"),
                        (-F.col("cand")).alias("negc"),
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
                    F.col("to_c").isNotNull()
                    & (F.pmod("id", F.lit(2)) == F.lit(r % 2)),
                    F.col("to_c"),
                )
                .otherwise(F.col("comm"))
                .alias("comm"),
                "ki", "self_w", "self_e",
            )
            .transform(cheap_localCheckpoint)
        )
        nbr.unpersist()
        cstats.unpersist()
        state = new_state
    nonself.unpersist()
    base.unpersist()
    return state.select("id", "comm")


def louvain(
    edges: DataFrame,
    outer_iterations: int = 3,
    inner_iterations: int = 2,
    weight: str | None = None,
    variant: str = "modularity",
) -> DataFrame:
    """Returns (id, community) over canonical undirected edges (src<dst).

    weight: optional edge-weight column; default 1.0 per edge.
    variant: 'modularity' (louvain.hpp) or 'density' (louvain_density.hpp,
    the fast_unfolding_with_density example) — density-modulated objective,
    same move/contract structure.
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
        level_fn = {"modularity": _one_level, "density": _one_level_density}[variant]
        g = symmetrize(canon).persist()
        for epoch in range(outer_iterations):
            labels = level_fn(g, m, inner_iterations).persist()
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
