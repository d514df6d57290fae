"""Maximal independent set — deterministic Luby rounds.

Luby's classic parallel MIS (Luby 1986, "A Simple Parallel Algorithm for
the Maximal Independent Set Problem") in the same BSP shape as plato's
peel-style loops (cf. the kcore peel driver,
/root/reference/plato/algo/kcore/kcore.hpp — iterate a local rule over a
shrinking vertex set to a fixpoint).  Per round:

  1. every alive vertex v with priority(v) strictly below every alive
     neighbor's priority joins the MIS (isolated vertices join too);
  2. MIS members and all their neighbors leave the alive set;
  3. the residual edge set is contracted to alive x alive endpoints.

Priorities are DETERMINISTIC and UNIQUE, so the fixpoint is unique and
SQL-oracle-checkable (no randomness, no tie deadlock):

  priority(v) = (portable_h1(str(v)) mod 2^31) * 2^31 + v

— pseudorandom in the high 31 bits (the engine-portable md5 family,
functions/text.portable_h1), disambiguated by the id in the low bits.
Requires 0 <= id < 2^31, which holds for vid-encoded graphs (ids are
dense ranks).  Expected O(log E) rounds; each round's cost tracks the
RESIDUAL edge set (contracted per round), not the original graph — the
same peel discipline as ktruss.  Per-round lineage is truncated with
tracked checkpoints and superseded states are freed eagerly
(engine/ckpt_blocks), so resident block-manager state stays O(1) in the
round count.
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

PRI_MOD = 1 << 31


def _priority(id_col):
    return (
        F.pmod(portable_h1(id_col.cast("string")), F.lit(PRI_MOD)) * PRI_MOD
        + id_col
    ).cast("long")


def maximal_independent_set(
    edges_sym: DataFrame, max_iters: int = 64, metrics: list | None = None
) -> DataFrame:
    """(id, mis_round) — the unique hash-priority MIS of the symmetrized
    edge table ``edges_sym`` (src, dst; both directions present).
    ``mis_round`` is the Luby round at which the vertex joined (0-based);
    vertices dominated by a neighbor are absent from the result.
    """
    spark = edges_sym.sparkSession
    alive, alive_ids = checkpoint_tracked(
        edges_sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", _priority(F.col("id")).alias("p"))
    )
    live_e, live_ids = checkpoint_tracked(edges_sym.select("src", "dst"))
    parts: list[DataFrame] = []
    for rnd in range(max_iters):
        n_alive = alive.count()
        if metrics is not None:
            metrics.append({"round": rnd, "alive": n_alive})
        if n_alive == 0:
            break
        # min alive-neighbor priority per vertex (src side of live_e is
        # alive by construction; dst-side filtering happens at the join)
        minnb = (
            live_e.join(alive.select(F.col("id").alias("src"), "p"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("p").alias("minp"))
        )
        mis = (
            alive.join(minnb, "id", "left")
            .where(F.col("minp").isNull() | (F.col("p") < F.col("minp")))
            .select("id")
        )
        mis, mis_ids = checkpoint_tracked(mis)
        n_mis = mis.count()
        if metrics is not None:
            metrics[-1]["mis"] = n_mis
        parts.append(mis.select("id", F.lit(rnd).cast("int").alias("mis_round")))
        # remove MIS + its neighborhood; contract the residual edge set
        removed = mis.unionByName(
            live_e.join(mis.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
        ).distinct()
        new_alive, new_alive_ids = checkpoint_tracked(
            alive.join(removed, "id", "left_anti")
        )
        new_live, new_live_ids = checkpoint_tracked(
            live_e.join(new_alive.select(F.col("id").alias("src")), "src")
            .join(new_alive.select(F.col("id").alias("dst")), "dst")
            .select("src", "dst")
        )
        # mis blocks stay: parts[] reads them at the final union
        free_blocks(spark, alive_ids | live_ids)
        alive, alive_ids = new_alive, new_alive_ids
        live_e, live_ids = new_live, new_live_ids

    free_blocks(spark, live_ids | alive_ids)
    if not parts:
        return spark.createDataFrame([], "id long, mis_round int")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
