"""Minimum spanning forest — Borůvka hook-and-compress rounds.

Borůvka 1926 / the standard distributed MSF (cf. GraphX's and Pegasus'
MSF shape): per round every component picks its minimum incident
inter-component edge, picked edges join the forest, and the component
merge graph is contracted with pointer jumping.  Components at least
halve per round, so O(log V) rounds; each round's cost tracks the
SURVIVING inter-component edge set (intra-component edges are dropped
as soon as both endpoints share a label — the same shrinking-residual
discipline as mis/matching/ktruss).

Determinism: edges are totally ordered by the lexicographic struct

    (weight, src, dst)

(src < dst canonical), so "the minimum incident edge" is unique, the
hook forest is unique, and the final MSF is the unique minimum forest
under that order — bit-for-bit SQL-oracle-checkable (both engines order
structs field-lexicographically; weights are exact co-occurrence counts
stored as doubles, identical in IEEE and in SQL).

Contraction details (mirrored 1:1 by the oracle):

  * hook: parent(c) = the other endpoint-component of c's min edge;
  * 2-cycle break: the mutual pair (a<->b) roots at min(a, b) — every
    hook tree has exactly one 2-cycle, so after the break each tree is
    rooted (root points to itself);
  * compress: parent := parent(parent) until fixpoint (idempotent once
    converged, which is what lets the oracle pin a jump count >= the
    measured depth);
  * relabel: vertex components map through the root table; edges with
    equal labels leave the live set.

Per-round lineage truncated with tracked checkpoints, superseded state
freed eagerly (engine/ckpt_blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# r6: layout-preserving truncation — exact-valued loop, plan metadata
# change cannot move any float reduce order (see ckpt_blocks docstring)
from plato_spark.engine.ckpt_blocks import (
    auto_loop_checkpoint_tracked as checkpoint_tracked,
    free_blocks,
)

__all__ = ["boruvka_msf"]


def boruvka_msf(
    edges_canon_weighted: DataFrame,
    max_iters: int = 32,
    metrics: list | None = None,
) -> DataFrame:
    """(src, dst, weight, msf_round) — the unique minimum spanning forest
    of the canonical weighted edge table (src < dst, unique, ``weight``
    double) under the total order (weight, src, dst).  ``msf_round`` is
    the Borůvka round at which the edge was hooked.
    """
    spark = edges_canon_weighted.sparkSession
    comp, comp_ids = checkpoint_tracked(
        edges_canon_weighted.select(F.col("src").alias("id"))
        .unionByName(edges_canon_weighted.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("c"))
    )
    live, live_ids = checkpoint_tracked(
        edges_canon_weighted.select("src", "dst", F.col("weight").alias("w"))
    )
    parts: list[DataFrame] = []
    part_ids: set[int] = set()
    for rnd in range(max_iters):
        # label endpoints with their component; drop settled edges
        lab = (
            live.join(comp.select(F.col("id").alias("src"),
                                  F.col("c").alias("cu")), "src")
            .join(comp.select(F.col("id").alias("dst"),
                              F.col("c").alias("cv")), "dst")
            .where(F.col("cu") != F.col("cv"))
        )
        lab, lab_ids = checkpoint_tracked(lab)
        n_live = lab.count()
        if metrics is not None:
            metrics.append({"round": rnd, "inter_edges": n_live})
        if n_live == 0:
            free_blocks(spark, lab_ids)
            break
        # min incident edge per component (both endpoint components vote)
        inc = lab.select(
            F.col("cu").alias("cc"),
            F.struct("w", F.col("src").alias("s"), F.col("dst").alias("d"),
                     F.col("cv").alias("o")).alias("k"),
        ).unionByName(
            lab.select(
                F.col("cv").alias("cc"),
                F.struct("w", F.col("src").alias("s"),
                         F.col("dst").alias("d"),
                         F.col("cu").alias("o")).alias("k"),
            )
        )
        m = inc.groupBy("cc").agg(F.min("k").alias("mk"))
        m, m_ids = checkpoint_tracked(m)
        picked = m.select(
            F.col("mk.s").alias("src"), F.col("mk.d").alias("dst"),
            F.col("mk.w").alias("weight"),
        ).distinct()
        picked, picked_ids = checkpoint_tracked(
            picked.select("src", "dst", "weight",
                          F.lit(rnd).cast("int").alias("msf_round"))
        )
        parts.append(picked)
        part_ids |= set(picked_ids)
        # hook forest: parent(c) = other side of its min edge;
        # break the unique 2-cycle per tree at the smaller id
        par = m.select("cc", F.col("mk.o").alias("p"))
        par = (
            par.alias("a")
            .join(par.select(F.col("cc").alias("p"),
                             F.col("p").alias("gp")).alias("b"), "p")
            .select(
                F.col("cc"),
                F.when(
                    (F.col("gp") == F.col("cc")) & (F.col("cc") < F.col("p")),
                    F.col("cc"),
                ).otherwise(F.col("p")).alias("p"),
            )
        )
        par, par_ids = checkpoint_tracked(par)
        jump_depth = 0
        while True:
            nxt = (
                par.alias("a")
                .join(par.select(F.col("cc").alias("p"),
                                 F.col("p").alias("gp")).alias("b"), "p")
                .select("cc", F.col("gp").alias("p"))
            )
            nxt, nxt_ids = checkpoint_tracked(nxt)
            changed = (
                nxt.alias("n")
                .join(par.alias("o"), "cc")
                .where(F.col("n.p") != F.col("o.p"))
                .count()
            )
            free_blocks(spark, par_ids)
            par, par_ids = nxt, nxt_ids
            jump_depth += 1
            if changed == 0:
                break
        if metrics is not None:
            metrics[-1]["jumps"] = jump_depth
        # relabel vertex components through the root table
        nxt_comp = (
            comp.join(par.select(F.col("cc").alias("c"),
                                 F.col("p").alias("root")), "c", "left")
            .select("id", F.coalesce("root", "c").alias("c"))
        )
        nxt_comp, nc_ids = checkpoint_tracked(nxt_comp)
        nxt_live, nl_ids = checkpoint_tracked(lab.select("src", "dst", "w"))
        free_blocks(spark, comp_ids | live_ids | lab_ids | m_ids | par_ids)
        comp, comp_ids = nxt_comp, nc_ids
        live, live_ids = nxt_live, nl_ids
    free_blocks(spark, comp_ids | live_ids)
    if not parts:
        return spark.createDataFrame(
            [], "src long, dst long, weight double, msf_round int"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out, _ = checkpoint_tracked(out)
    free_blocks(spark, part_ids)
    return out
