"""Greedy graph coloring — deterministic Jones–Plassmann rounds.

Jones & Plassmann 1993 ("A Parallel Graph Coloring Heuristic"): per
round every uncolored vertex whose priority is strictly maximal among
its UNCOLORED neighbors takes the smallest color not used by any
already-colored neighbor (the mex).  With the engine's unique
deterministic priorities (same family as Luby MIS, algos/mis.py:

    priority(v) = (portable_h1(str(v)) mod 2^31) * 2^31 + v

) the fixpoint is unique, so the full coloring is SQL-oracle-checkable.
Expected O(log n / log log n) rounds on random priorities; colors per
vertex bounded by degree+1.

Distributed shape (one shuffle per round, no windows):

  * local-max set: max-aggregate uncolored-neighbor priorities over the
    RESIDUAL edge set (contracted to uncolored x uncolored per round);
  * mex: each uncolored vertex carries the colors of its colored
    neighbors in a ``forb`` table; for a winner, collect_set(color) +
    JVM ``array_min(array_except(sequence(0, size), colors))`` — the
    smallest missing value is always <= |set|, so the sequence bound is
    exact, per-vertex cost O(deg), no fan-out join;
  * state hand-off: newly colored vertices leave the residual graph and
    deposit (uncolored neighbor, color) rows into ``forb``.

Per-round lineage is truncated with tracked checkpoints and superseded
state freed eagerly (engine/ckpt_blocks), the peel-loop discipline of
mis/ktruss (reference shape: /root/reference/plato/algo/kcore/kcore.hpp
iterate-a-local-rule-to-fixpoint).
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
from plato_spark.functions.text import portable_h1

__all__ = ["jones_plassmann_coloring"]

PRI_MOD = 1 << 31


def _priority(id_col):
    return (
        F.pmod(portable_h1(id_col.cast("string")), F.lit(PRI_MOD)) * PRI_MOD
        + id_col
    ).cast("long")


def jones_plassmann_coloring(
    edges_sym: DataFrame, max_iters: int = 64, metrics: list | None = None
) -> DataFrame:
    """(id, color, jp_round) — the unique hash-priority Jones–Plassmann
    coloring of the symmetrized edge table (src, dst; both directions).
    ``color`` is 0-based; ``jp_round`` is the round the vertex locked in.
    """
    spark = edges_sym.sparkSession
    unc, unc_ids = checkpoint_tracked(
        edges_sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", _priority(F.col("id")).alias("p"))
    )
    live, live_ids = checkpoint_tracked(edges_sym.select("src", "dst"))
    # (id, color) of colored NEIGHBORS of still-uncolored vertices
    forb, forb_ids = checkpoint_tracked(
        spark.createDataFrame([], "id long, color int")
    )
    parts: list[DataFrame] = []
    part_ids: set[int] = set()
    for rnd in range(max_iters):
        n_unc = unc.count()
        if metrics is not None:
            metrics.append({"round": rnd, "uncolored": n_unc})
        if n_unc == 0:
            break
        # strict local max among uncolored neighbors (priorities unique)
        maxnb = (
            live.join(unc.select(F.col("id").alias("src"), "p"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.max("p").alias("maxp"))
        )
        winners = (
            unc.join(maxnb, "id", "left")
            .where(F.col("maxp").isNull() | (F.col("p") > F.col("maxp")))
            .select("id")
        )
        colored = (
            winners.join(forb, "id", "left")
            .groupBy("id")
            .agg(F.collect_set("color").alias("cs"))
            .select(
                "id",
                F.coalesce(
                    F.array_min(
                        F.array_except(
                            F.sequence(F.lit(0), F.size("cs")), F.col("cs")
                        )
                    ),
                    F.lit(0),
                ).cast("int").alias("color"),
            )
        )
        colored, colored_ids = checkpoint_tracked(colored)
        parts.append(colored.select(
            "id", "color", F.lit(rnd).cast("int").alias("jp_round")
        ))
        part_ids |= set(colored_ids)
        won = colored.select("id")
        nxt_unc = unc.join(won, "id", "left_anti")
        # uncolored neighbors of newly colored vertices learn the color
        new_forb = (
            live.join(
                colored.select(F.col("id").alias("src"), "color"), "src"
            )
            .select(F.col("dst").alias("id"), "color")
            .join(nxt_unc.select("id"), "id", "left_semi")
            .distinct()
        )
        nxt_forb = (
            forb.join(won, "id", "left_anti").unionByName(new_forb).distinct()
        )
        nxt_live = (
            live.join(won.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(won.withColumnRenamed("id", "dst"), "dst", "left_anti")
        )
        nxt_unc, a = checkpoint_tracked(nxt_unc)
        nxt_forb, b = checkpoint_tracked(nxt_forb)
        nxt_live, c = checkpoint_tracked(nxt_live)
        free_blocks(spark, unc_ids | live_ids | forb_ids)
        unc, unc_ids = nxt_unc, a
        forb, forb_ids = nxt_forb, b
        live, live_ids = nxt_live, c
    free_blocks(spark, unc_ids | live_ids | forb_ids)
    if not parts:
        return spark.createDataFrame([], "id long, color int, jp_round int")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out, _ = checkpoint_tracked(out)
    free_blocks(spark, part_ids)
    return out
