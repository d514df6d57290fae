"""Maximal matching — deterministic parallel greedy (locally-minimal edges).

The edge-side sibling of Luby MIS (algos/mis.py): per round every alive
edge whose priority is strictly minimal among ALL edges sharing either
endpoint joins the matching; matched endpoints (and their incident
edges) leave the alive set.  This is the classic O(log E)-round parallel
greedy matching (Israeli & Itai 1986) in the reference's peel-loop shape
(cf. /root/reference/plato/algo/kcore/kcore.hpp's iterate-to-fixpoint
over a shrinking set).

Edge priorities are DETERMINISTIC and totally ordered, so the fixpoint
is unique and SQL-oracle-checkable: an edge's key is the lexicographic
triple

    (portable_h1('src:dst'), src, dst)

— pseudorandom in the 56-bit hash (engine-portable md5 family), made
unique by the canonical endpoint pair.  Both Spark and ANSI SQL order
structs field-lexicographically, so min(struct(h, src, dst)) agrees
across engines bit-for-bit.

Per-round cost tracks the RESIDUAL edge set (matched stars removed each
round), not the original graph; lineage is truncated per round with
tracked checkpoints and superseded state freed eagerly
(engine/ckpt_blocks), the same discipline as mis/ktruss.  A round is one
shuffle (incidence groupBy) + one semi-join — no windows, no driver-side
data beyond the O(1) convergence counter.
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

__all__ = ["maximal_matching", "vertex_cover_stats"]


def _keyed(edges: DataFrame, weight_col: str | None = None) -> DataFrame:
    """Attach the unique priority key to canonical (src<dst) edges.

    Default: pseudorandom hash first (uniform greedy), ties by (src,
    dst).  With ``weight_col``: negated weight first (heaviest edge wins
    — the classic 1/2-approximate greedy weighted matching), then the
    SAME pseudorandom hash, then (src, dst).  The hash between weight
    and endpoints is load-bearing at scale: breaking equal weights by
    (src, dst) alone serializes tie CHAINS (edge (1,2) blocks (2,3)
    blocks (3,4)... — measured 31 rounds at sf0.01 where hash ties take
    ~12), because each round only picks edges locally minimal at BOTH
    endpoints and an id-ordered chain yields one pick per round.  A
    pseudorandom tiebreak splits chains probabilistically, restoring the
    O(log E) expected round count of Israeli-Itai even on
    quantized-weight graphs (integer costs — the common case)."""
    h = portable_h1(
        F.concat_ws(":", F.col("src").cast("string"),
                    F.col("dst").cast("string"))
    )
    if weight_col is not None:
        key = F.struct(
            (-F.col(weight_col)).alias("h"),
            h.alias("t"),
            F.col("src").alias("s"),
            F.col("dst").alias("d"),
        )
    else:
        key = F.struct(
            h.alias("h"),
            F.col("src").alias("s"),
            F.col("dst").alias("d"),
        )
    return edges.select("src", "dst", key.alias("k"))


def maximal_matching(
    edges_canon: DataFrame,
    max_iters: int = 64,
    metrics: list | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """(src, dst, match_round) — the unique hash-priority maximal matching
    of the canonical edge table ``edges_canon`` (src < dst, deduped).
    ``match_round`` is the 0-based round at which the edge was picked.

    With ``weight_col`` the priority is (heaviest weight, src, dst) —
    the distributed locally-heaviest-edge greedy (Preis 1999), which
    matches the sequential heaviest-first greedy exactly (unique total
    order) and carries its 1/2-approximation guarantee for maximum
    weight matching.
    """
    spark = edges_canon.sparkSession
    live, live_ids = checkpoint_tracked(_keyed(edges_canon, weight_col))
    parts: list[DataFrame] = []
    part_ids: set[int] = set()  # picked-edge blocks; freed after final union
    for rnd in range(max_iters):
        n_live = live.count()
        if metrics is not None:
            metrics.append({"round": rnd, "alive_edges": n_live})
        if n_live == 0:
            break
        # min incident key per vertex (each edge votes at both endpoints)
        inc = live.select(F.col("src").alias("id"), "k").unionByName(
            live.select(F.col("dst").alias("id"), "k")
        )
        mv = inc.groupBy("id").agg(F.min("k").alias("mk"))
        picked = (
            live.join(mv.select(F.col("id").alias("src"),
                                F.col("mk").alias("mks")), "src")
            .join(mv.select(F.col("id").alias("dst"),
                            F.col("mk").alias("mkd")), "dst")
            .where((F.col("k") == F.col("mks")) & (F.col("k") == F.col("mkd")))
            .select("src", "dst")
        )
        picked, picked_ids = checkpoint_tracked(picked)
        parts.append(picked.select(
            "src", "dst", F.lit(rnd).cast("int").alias("match_round")
        ))
        matched = picked.select(F.col("src").alias("id")).unionByName(
            picked.select(F.col("dst").alias("id"))
        ).distinct()
        nxt = (
            live.join(matched.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(matched.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst", "k")
        )
        nxt, nxt_ids = checkpoint_tracked(nxt)
        free_blocks(spark, live_ids)
        live, live_ids = nxt, nxt_ids
        part_ids |= set(picked_ids)
    free_blocks(spark, live_ids)
    if not parts:
        return spark.createDataFrame([], "src long, dst long, match_round int")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out, _ = checkpoint_tracked(out)
    free_blocks(spark, part_ids)
    return out


def vertex_cover_stats(edges_canon: DataFrame, max_iters: int = 64) -> DataFrame:
    """One row — the matching-based 2-approximate vertex cover audit.

    The endpoints of any maximal matching form a vertex cover (an
    uncovered edge would extend the matching — contradiction), and the
    cover is at most 2x the optimum because ANY cover must take >= one
    endpoint per matched edge (Gavril/Yannakakis folklore; the textbook
    2-approximation).  Both bounds are certified IN the output:

      n_uncovered   — edges with neither endpoint in the cover; 0
                      certifies coverage (and maximality of the matching)
      n_matched     — a lower bound on the optimum cover size
      approx_ratio  — cover_size / n_matched, <= 2.0 by construction

    Columns: (n_vertices, n_edges, n_matched, cover_size, n_uncovered,
    approx_ratio).  Exact integers + one rounded division.

    Scale: rides maximal_matching's residual-peel rounds; the audit
    itself is two left_anti joins against the cover (hash join on id —
    the cover is O(V), never collected) and three scalar counts.
    """
    spark = edges_canon.sparkSession
    m = maximal_matching(edges_canon, max_iters=max_iters)
    cover = m.select(F.col("src").alias("id")).unionByName(
        m.select(F.col("dst").alias("id"))
    ).distinct()
    verts = edges_canon.select(F.col("src").alias("id")).unionByName(
        edges_canon.select(F.col("dst").alias("id"))
    ).distinct()
    uncovered = (
        edges_canon
        .join(cover.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(cover.withColumnRenamed("id", "dst"), "dst", "left_anti")
    )
    n_v = verts.count()
    n_e = edges_canon.count()
    n_m = m.count()
    n_c = cover.count()
    n_u = uncovered.count()
    base = spark.createDataFrame(
        [(n_v, n_e, n_m, n_c, n_u)],
        "n_vertices long, n_edges long, n_matched long, "
        "cover_size long, n_uncovered long")
    return base.select(
        "*",
        # Explicit NULL on an empty matching (n_matched = 0) — Spark's
        # and DuckDB's divide-by-zero semantics differ, and the repo
        # convention is NULL, not a fake 0 (ADVICE r4).
        F.when(F.col("n_matched") > 0,
               F.round(F.col("cover_size") / F.col("n_matched"), 6))
        .alias("approx_ratio"))
