"""Weighted modularity of a vertex partition — exact integer fold.

The quality metric Louvain optimizes (Blondel et al. 2008, eq. 1; the
reference evaluates it greedily per move in
/root/reference/plato/algo/fast_unfolding/fast_unfolding.hpp try_change
but never exposes the global score).  For integral edge weights (true
for co-occurrence counts) everything folds as 64-bit integers:

    Q = NUM / (4 * W^2),   NUM = sum_c (4 * W * w_c - d_c^2)

with W = total canonical weight, w_c = intra-community canonical weight,
d_c = summed weighted degree of community c.  Integer sums are
order-free, so the single IEEE division at read-out is bitwise-identical
across engines — the same oracle discipline as the hyperanf/tfidf
queries (no engine-ordered float accumulation anywhere).

Scale shape: two shuffles (label join + per-community agg) with map-side
combine; the label table joins the edge table on each endpoint —
broadcast when small, shuffle-join otherwise (left to Catalyst/AQE).
Overflow bound: |NUM| <= 4*W^2 + (2W)^2 = 8*W^2, so W up to ~10^9
(a ~10^9-edge graph) stays inside int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def modularity(
    canon: DataFrame, labels: DataFrame, weight: str | None = None
) -> DataFrame:
    """One row (n_communities, intra_weight, modularity) for the
    partition ``labels`` (id, community) of the canonical undirected
    edge table ``canon`` (src < dst, unique; integral ``weight`` column,
    or unweighted when None)."""
    w = (F.col(weight) if weight else F.lit(1)).cast("long")
    e = canon.select("src", "dst", w.alias("w"))
    lab = labels.select("id", "community")
    wtot = e.agg(F.sum("w").alias("W"))

    intra = (
        e.join(
            lab.select(F.col("id").alias("src"), F.col("community").alias("c1")),
            "src",
        )
        .join(
            lab.select(F.col("id").alias("dst"), F.col("community").alias("c2")),
            "dst",
        )
        .where(F.col("c1") == F.col("c2"))
        .groupBy(F.col("c1").alias("community"))
        .agg(F.sum("w").alias("wc"))
    )
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    dtot = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.sum("w").alias("wsum"))
        .join(lab, "id")
        .groupBy("community")
        .agg(F.sum("wsum").alias("dc"))
    )
    per = dtot.join(intra, "community", "left").crossJoin(F.broadcast(wtot))
    agg = per.agg(
        F.count("*").cast("long").alias("n_communities"),
        F.coalesce(F.sum("wc"), F.lit(0)).cast("long").alias("intra_weight"),
        F.sum(
            4 * F.col("W") * F.coalesce(F.col("wc"), F.lit(0))
            - F.col("dc") * F.col("dc")
        ).cast("long").alias("num"),
        F.max("W").alias("W"),
    )
    return agg.select(
        "n_communities",
        "intra_weight",
        F.round(
            F.col("num").cast("double")
            / (4 * F.col("W") * F.col("W")).cast("double"),
            6,
        ).alias("modularity"),
    )
