"""Densest subgraph — (2+eps)-approximate greedy peeling, MapReduce shape.

Bahmani, Kumar & Vassilvitskii, "Densest Subgraph in Streaming and
MapReduce" (PVLDB 5(5), 2012): instead of Charikar's one-vertex-at-a-time
peel (O(V) sequential rounds), each round removes EVERY vertex whose
degree is at most 2(1+eps) times the current average degree; the
densest of the O(log V / eps) snapshots is a 2(1+eps)-approximation of
the maximum-density subgraph.  This is the textbook example of turning
a sequential peel into a logarithmic-round BSP loop — the same
discipline as the engine's k-core/k-truss peels.

Everything is EXACT INTEGER arithmetic, so the result is deterministic
and SQL-oracle-checkable:

  * density of a snapshot with n vertices / m canonical edges is the
    rational m/n — snapshots are compared by cross-multiplication
    (m_a * n_b > m_b * n_a), never by float division;
  * the peel test deg(v) <= 2(1+eps) * (2m/n) uses eps = 1/8, i.e.
    deg(v) * 4 * n <= 18 * m in int64 (2*(1+1/8)*2 = 9/2 = 18/4);
  * ties across equally-dense snapshots resolve to the EARLIEST round.

Output: the vertices of the winning snapshot, plus the snapshot's round
and its exact density fraction — enough for the caller to both use and
audit the subgraph.  Per-round lineage is truncated with tracked
checkpoints and superseded state freed eagerly (engine/ckpt_blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import checkpoint_tracked, free_blocks

__all__ = ["densest_subgraph"]


def densest_subgraph(
    edges_canon: DataFrame, max_iters: int = 64, metrics: list | None = None
) -> DataFrame:
    """(id, peel_round, density_num, density_den) — the vertices of the
    densest snapshot met during 2(1+1/8)-average-degree peeling of the
    canonical (src < dst, unique) edge table; ``peel_round`` is the
    winning snapshot's round, density = density_num / density_den
    (canonical edges per vertex, exact)."""
    spark = edges_canon.sparkSession
    live, live_ids = checkpoint_tracked(edges_canon.select("src", "dst"))
    best = None          # (m, n, round) of the densest snapshot so far
    best_df, best_ids = None, set()
    for rnd in range(max_iters):
        m = live.count()
        if m == 0:
            break
        sym = live.unionByName(
            live.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        deg = sym.groupBy("src").agg(F.count("*").alias("d"))
        deg, deg_ids = checkpoint_tracked(deg)
        n = deg.count()
        if metrics is not None:
            metrics.append({"round": rnd, "n": n, "m": m})
        # densest so far? compare m/n vs best by cross-multiplication
        if best is None or m * best[1] > best[0] * n:
            if best_ids:
                free_blocks(spark, best_ids)
            best = (m, n, rnd)
            best_df, best_ids = checkpoint_tracked(deg.select("src"))
        # peel: deg(v) * 4 * n <= 18 * m  (i.e. deg <= 2(1+1/8) * 2m/n)
        keep = deg.where(F.col("d") * 4 * F.lit(n) > 18 * F.lit(m)).select(
            "src"
        )
        nxt = (
            live.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
        nxt, nxt_ids = checkpoint_tracked(nxt)
        free_blocks(spark, live_ids | deg_ids)
        live, live_ids = nxt, nxt_ids
    free_blocks(spark, live_ids)
    if best is None:
        return spark.createDataFrame(
            [], "id long, peel_round int, density_num long, density_den long"
        )
    out = best_df.select(
        F.col("src").alias("id"),
        F.lit(best[2]).cast("int").alias("peel_round"),
        F.lit(best[0]).cast("long").alias("density_num"),
        F.lit(best[1]).cast("long").alias("density_den"),
    )
    out, _ = checkpoint_tracked(out)
    free_blocks(spark, best_ids)
    return out
