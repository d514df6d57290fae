"""Infomap — two-level map-equation community detection.

Reference: /root/reference/plato/algo/infomap/infomap.hpp:48-60 (889 LoC):
embedded PageRank for visit rates (teleport 0.15, 50 iters), then move /
rebuild loops minimizing the map equation. Our implementation keeps the
same structure Spark-first:

1. visit rates p_v: normalized PageRank (damping 1-0.15, algos/pagerank.py)
2. edge flows: f(u,v) = p_u * w(u,v) / sum_out_w(u), symmetrized for the
   undirected map equation
3. move phase: for every vertex and neighboring module, the EXACT map-
   equation delta of moving v is computed from joinable aggregates
   (module exit flow q_m, module visit mass p_m, vertex<->module flow):
       L = plogp(Q) - 2*sum_m plogp(q_m) + sum_m plogp(q_m + p_m) + const
   with plogp(x) = x*log2(x) and Q = sum_m q_m. Moves are applied
   synchronously with parity alternation + deterministic tie-breaks
   (same discipline as algos/louvain.py; the reference moves
   asynchronously with RNG ordering — documented divergence).
4. outer rounds contract modules and repeat (rebuild analog).

Approximate optimizer by nature (greedy local search) -> rows-only driver
check; tests assert determinism, map-equation descent, and clique recovery.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

from plato_spark.algos.pagerank import pagerank
from plato_spark.graph.edges import symmetrize
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)


def _plogp(col):
    return F.when(col > 0, col * F.log2(col)).otherwise(F.lit(0.0))


def _map_equation(flows: DataFrame, p: DataFrame, labels: DataFrame) -> float:
    """Exact two-level map equation L for a given assignment."""
    lab_u = labels.select(F.col("id").alias("src"), F.col("module").alias("mu"))
    lab_v = labels.select(F.col("id").alias("dst"), F.col("module").alias("mv"))
    fl = flows.join(lab_u, "src").join(lab_v, "dst")
    q_m = (
        fl.where("mu != mv")
        .groupBy(F.col("mu").alias("module"))
        .agg(F.sum("flow").alias("q"))
    )
    p_m = (
        p.join(labels, "id")
        .groupBy("module")
        .agg(F.sum("p").alias("pm"))
    )
    stats = p_m.join(q_m, "module", "left").select(
        F.coalesce("q", F.lit(0.0)).alias("q"), "pm"
    )
    # single driver action: the module-stat aggregates and the vertex
    # p-term fold through one 1-row cross join
    row = stats.agg(
        F.sum("q").alias("Q"),
        F.sum(_plogp(F.col("q"))).alias("plogp_q"),
        F.sum(_plogp(F.col("q") + F.col("pm"))).alias("plogp_qp"),
    ).crossJoin(
        p.agg(F.sum(_plogp(F.col("p"))).alias("p_term"))
    ).collect()[0]
    p_term = row["p_term"] or 0.0
    Q = row["Q"] or 0.0
    plogp_Q = Q * math.log2(Q) if Q > 0 else 0.0
    return plogp_Q - 2.0 * (row["plogp_q"] or 0.0) + (row["plogp_qp"] or 0.0) - p_term


def infomap(
    edges: DataFrame,
    outer_iterations: int = 2,
    inner_iterations: int = 3,
    teleport: float = 0.15,
    pr_iters: int = 50,
    weight: str | None = None,
) -> DataFrame:
    """Returns (id, module) over canonical undirected edges (src<dst)."""
    spark = edges.sparkSession
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    canon = edges.select("src", "dst", w_col.alias("w")).persist()
    n_edges = canon.count()
    shuffle_n = auto_shuffle_partitions(spark, 2 * n_edges)

    sym = symmetrize(canon).persist()

    # 1. visit rates (infomap.hpp embedded pagerank: iters 50, teleport 0.15)
    pr = pagerank(sym, damping=1.0 - teleport, eps=0.0, max_iters=pr_iters)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    p = pr.select("id", (F.col("rank") / F.lit(total)).alias("p")).persist()

    # 2. symmetric flows per undirected edge pair
    wsum = sym.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("ws"))
    flow_dir = (
        sym.join(p.select(F.col("id").alias("src"), F.col("p").alias("pu")), "src")
        .join(wsum.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.col("pu") * F.col("w") / F.col("ws")).alias("f"))
    )
    rev = flow_dir.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "f"
    )
    flows = (
        flow_dir.unionByName(rev)
        .groupBy("src", "dst")
        .agg((F.sum("f") / 2.0).alias("flow"))
        .persist()
    )
    flows.count()

    def move_phase(fl: DataFrame, pp: DataFrame, inner: int) -> DataFrame:
        labels = pp.select("id", F.col("id").alias("module"), "p")
        for r in range(inner):
            lab_u = labels.select(F.col("id").alias("src"), F.col("module").alias("mu"))
            lab_v = labels.select(F.col("id").alias("dst"), F.col("module").alias("mv"))
            flm = fl.join(lab_u, "src").join(lab_v, "dst").persist()
            q_m = (
                flm.where("mu != mv")
                .groupBy(F.col("mu").alias("module"))
                .agg(F.sum("flow").alias("q"))
            )
            p_m = labels.groupBy("module").agg(F.sum("p").alias("pm"))
            mstat = p_m.join(q_m, "module", "left").select(
                "module", F.coalesce("q", F.lit(0.0)).alias("q"), "pm"
            ).persist()
            # vertex->module flows (sum over both directions / symmetric flow)
            fvm = (
                flm.groupBy(F.col("src").alias("id"), F.col("mv").alias("cand"))
                .agg((2.0 * F.sum("flow")).alias("fv_m"))
            )
            fv_tot = (
                flm.groupBy(F.col("src").alias("id"))
                .agg((2.0 * F.sum("flow")).alias("fv_tot"))
            )
            cur = labels.select("id", F.col("module").alias("from_m"), "p")
            own = fvm.join(
                cur.select("id", F.col("from_m").alias("cand")), ["id", "cand"]
            ).select("id", F.col("fv_m").alias("fv_from"))
            cands = (
                fvm.join(cur, "id")
                .where(F.col("cand") != F.col("from_m"))
                .join(own, "id", "left")
                .join(fv_tot, "id")
                .join(mstat.select(F.col("module").alias("from_m"),
                                   F.col("q").alias("qa"), F.col("pm").alias("pa")),
                      "from_m")
                .join(mstat.select(F.col("module").alias("cand"),
                                   F.col("q").alias("qb"), F.col("pm").alias("pb")),
                      "cand")
                .withColumn("fv_from", F.coalesce("fv_from", F.lit(0.0)))
            )
            # exact delta-L of moving v: recompute the 3 plogp terms for the
            # two touched modules before/after
            qa2 = F.col("qa") + F.col("fv_from") - (F.col("fv_tot") - F.col("fv_from"))
            qb2 = F.col("qb") + (F.col("fv_tot") - F.col("fv_m")) - F.col("fv_m")
            pa2 = F.col("pa") - F.col("p")
            pb2 = F.col("pb") + F.col("p")
            dQ = (qa2 + qb2) - (F.col("qa") + F.col("qb"))
            # total module-exit flow rides in-plan as a broadcast 1-row agg
            # off the already-persisted mstat (no extra driver action)
            qtot_df = mstat.agg(
                F.coalesce(F.sum("q"), F.lit(0.0)).alias("q_tot")
            )
            cands = cands.crossJoin(F.broadcast(qtot_df))

            def plogp(c):
                return _plogp(c)

            Q2 = F.col("q_tot") + dQ
            dL = (
                (plogp(Q2) - plogp(F.col("q_tot")))
                - 2.0 * (plogp(qa2) + plogp(qb2) - plogp(F.col("qa")) - plogp(F.col("qb")))
                + (
                    plogp(qa2 + pa2) + plogp(qb2 + pb2)
                    - plogp(F.col("qa") + F.col("pa"))
                    - plogp(F.col("qb") + F.col("pb"))
                )
            )
            best = (
                cands.withColumn("dL", dL)
                .where(F.col("dL") < -1e-12)
                .groupBy("id")
                .agg(
                    F.min(
                        F.struct(
                            F.round(F.col("dL"), 12).alias("d"), F.col("cand").alias("c")
                        )
                    ).alias("m")
                )
                .select("id", F.col("m.c").alias("to_m"))
            )
            labels = (
                labels.join(best, "id", "left")
                .select(
                    "id",
                    F.when(
                        F.col("to_m").isNotNull()
                        & (F.pmod("id", F.lit(2)) == F.lit(r % 2)),
                        F.col("to_m"),
                    )
                    .otherwise(F.col("module"))
                    .alias("module"),
                    "p",
                )
                .transform(cheap_localCheckpoint)
            )
            flm.unpersist()
            mstat.unpersist()
        return labels.select("id", "module")

    with scoped_shuffle_partitions(spark, shuffle_n):
        mapping = None
        fl, pp = flows, p
        for epoch in range(outer_iterations):
            labels = move_phase(fl, pp, inner_iterations).persist()
            labels.count()
            if mapping is None:
                mapping = labels.withColumnRenamed("module", "community")
            else:
                mapping = (
                    mapping.join(
                        labels.select(
                            F.col("id").alias("community"), F.col("module").alias("nm")
                        ),
                        "community",
                    )
                    .select("id", F.col("nm").alias("community"))
                    .transform(cheap_localCheckpoint)
                )
            if epoch == outer_iterations - 1:
                break
            fl = (
                fl.join(labels.select(F.col("id").alias("src"), F.col("module").alias("cs")), "src")
                .join(labels.select(F.col("id").alias("dst"), F.col("module").alias("cd")), "dst")
                .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
                .agg(F.sum("flow").alias("flow"))
                .persist()
            )
            pp = (
                pp.join(labels, "id")
                .groupBy(F.col("module").alias("id"))
                .agg(F.sum("p").alias("p"))
                .persist()
            )
            fl.count(); pp.count()
    return mapping.select("id", F.col("community").alias("module"))
