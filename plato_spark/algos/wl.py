"""1-dimensional Weisfeiler-Lehman color refinement (1-WL).

The canonical graph-isomorphism signature and the exact expressiveness
ceiling of message-passing GNNs (Xu et al. ICLR'19 "How powerful are
GNNs"): starting from a uniform color, each round re-colors every
vertex with a hash of (own color, SORTED MULTISET of neighbor colors).
Two vertices that 1-WL cannot separate cannot be separated by any
standard GNN either, so the refinement curve (distinct colors per
round) is the honest "how much structure can a GNN see here" number
for a graph corpus.

Determinism / oracle discipline: the recoloring hash is the portable
md5 family (functions/text.portable_h1) over the canonical string
``own || '|' || c1,c2,...`` with the neighbor multiset sorted
numerically — both engines build the identical string, so colors match
bit-for-bit.  Rounds are PINNED (no convergence detection needed: 1-WL
stabilizes within diameter-ish rounds; extra rounds permute colors but
keep the partition, and the oracle runs the same count).

Scale: each round is one shuffle (neighbor-color gather, groupBy dst)
+ one map-side string hash; neighbor lists are collected per vertex —
the same bounded-degree contract as algos/triangles adjacency (hub
graphs should pre-cap or segment; the co-occurrence graph is fine).
Per-round lineage is truncated (engine/ckpt_blocks).
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
from plato_spark.graph.edges import symmetrize

__all__ = ["wl_colors"]


def wl_colors(canon: DataFrame, rounds: int = 3) -> DataFrame:
    """(id, color) — vertex colors after ``rounds`` of 1-WL refinement
    over the canonical undirected edge table (uniform initial color 0).
    """
    spark = canon.sparkSession
    sym, sym_ids = checkpoint_tracked(symmetrize(canon.select("src", "dst")))
    state = sym.select(F.col("src").alias("id")).distinct().select(
        "id", F.lit(0).cast("long").alias("color"))
    state, state_ids = checkpoint_tracked(state)
    for _ in range(rounds):
        msgs = sym.join(
            state.select(F.col("id").alias("src"),
                         F.col("color").alias("nc")), "src"
        ).select(F.col("dst").alias("id"), "nc")
        gathered = msgs.groupBy("id").agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list("nc")).cast(
                    "array<string>")).alias("sig"))
        nxt = state.join(gathered, "id", "left").select(
            "id",
            portable_h1(F.concat(
                F.col("color").cast("string"), F.lit("|"),
                F.coalesce("sig", F.lit("")))).alias("color"))
        nxt, nxt_ids = checkpoint_tracked(nxt)
        free_blocks(spark, state_ids)
        state, state_ids = nxt, nxt_ids
    free_blocks(spark, sym_ids)
    return state
