"""Local clustering via PPR sweep cut (Andersen–Chung–Lang, FOCS 2006).

The canonical local community detector for web-scale link graphs: push
personalized-PageRank mass out of a seed, order vertices by the
degree-normalized score, and take the prefix of that order whose
conductance is lowest.  It composes two kernels this engine already
ships — `algos/pagerank.personalized_pagerank` (the reference's pagerank
loop with teleport mass restricted to the seed,
/root/reference/plato/algo/pagerank/pagerank.hpp:100-146) and the
cut/volume accounting of `algos/mixing.attribute_conductance` — into
the operator a crawl team actually runs: "what is the community around
THIS repo?", answered without touching the rest of the graph's labels.

Scale shape: the PPR vector is the only global pass (same plan as the
registered ppr query); everything sweep-specific is O(k) — the top-k
selection is a TakeOrderedAndProject, the row_number window runs over
exactly k rows, the two rank joins broadcast a k-row table against the
edge scan, and the prefix cut/volume cumulative sums are windows over k
rows.  At 100 TB, k stays human-sized (a community readout) while the
edge scan stays a single pass.

Cross-engine determinism: the sweep key is round(rank, 6) / deg — the
6dp round FIRST collapses the ~1e-16 accumulation-order noise between
engines (the ppr oracle gate proves rounded ranks agree), and one IEEE
division of identical inputs is identical, so the sweep ORDER (key DESC,
id ASC) cannot diverge.  Cut and volume are exact BIGINT folds off that
order: an edge whose endpoint sweep-ranks are lo <= hi (rank k+1 when
outside the top-k) is a cut edge for prefixes lo <= j < hi and internal
from j >= hi, giving cut(j) = cum_{lo<=j} - cum_{hi<=j}; volume(j) is
the running degree sum.  Conductance is the one rounded division per
row, NULL when the complement volume is 0 (prefix swallowed the graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ppr_sweep_cut(edges: DataFrame, ppr: DataFrame, k: int = 32) -> DataFrame:
    """(sweep_rank, id, cut_edges, volume, conductance) for the k sweep
    prefixes of the PPR order.

    ``edges``: any orientation/duplication — canonicalized to distinct
    undirected (a < b) pairs, self-loops dropped.  ``ppr``: (id, rank)
    raw doubles from personalized_pagerank.  Vertices missing from the
    graph (isolated) are not sweepable; vertices missing from ``ppr``
    hold zero mass and can never out-rank a reached vertex, so the
    inner join is exact for any connected seed component of size >= k
    (and deterministic regardless: zero-key ties order by id).
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    n_canon = canon.count()
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionAll(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    swp = ppr.select("id", "rank").join(deg, "id").select(
        "id", "deg", (F.round("rank", 6) / F.col("deg")).alias("skey")
    )
    # TakeOrderedAndProject top-k, then an O(k)-row window for the rank
    top = swp.orderBy(F.desc("skey"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("skey"), F.asc("id"))
    ranked = top.select(
        "id", "deg", F.row_number().over(w).cast("long").alias("rnk")
    ).persist()
    ranked.count()

    inf = k + 1
    ra = ranked.select(F.col("id").alias("a"), F.col("rnk").alias("rnk_a"))
    rb = ranked.select(F.col("id").alias("b"), F.col("rnk").alias("rnk_b"))
    er = (
        canon.join(F.broadcast(ra), "a", "left")
        .join(F.broadcast(rb), "b", "left")
        .select(
            F.least(
                F.coalesce("rnk_a", F.lit(inf)), F.coalesce("rnk_b", F.lit(inf))
            ).alias("lo"),
            F.greatest(
                F.coalesce("rnk_a", F.lit(inf)), F.coalesce("rnk_b", F.lit(inf))
            ).alias("hi"),
        )
    )
    cl = (
        er.where(F.col("lo") <= k)
        .groupBy(F.col("lo").alias("rnk"))
        .agg(F.count(F.lit(1)).cast("long").alias("nlo"))
    )
    ch = (
        er.where(F.col("hi") <= k)
        .groupBy(F.col("hi").alias("rnk"))
        .agg(F.count(F.lit(1)).cast("long").alias("nhi"))
    )
    cum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    sw = (
        ranked.join(cl, "rnk", "left")
        .join(ch, "rnk", "left")
        .select(
            "rnk",
            "id",
            (
                F.sum(F.coalesce("nlo", F.lit(0))).over(cum)
                - F.sum(F.coalesce("nhi", F.lit(0))).over(cum)
            ).cast("long").alias("cut_edges"),
            F.sum("deg").over(cum).cast("long").alias("volume"),
        )
    )
    tot_vol = 2 * n_canon
    den = F.least(F.col("volume"), F.lit(tot_vol) - F.col("volume"))
    # canon stays persisted: the returned plan reads it twice more (er,
    # deg) and the caller materializes lazily — Spark's LRU reclaims it.
    return sw.select(
        F.col("rnk").alias("sweep_rank"),
        "id",
        "cut_edges",
        "volume",
        F.when(
            den > 0,
            F.round(F.col("cut_edges").cast("double") / den.cast("double"), 6),
        ).alias("conductance"),
    )
