"""Butterfly (2x2 biclique) counting over a bipartite incidence table.

Butterflies are the bipartite analogue of triangles — the motif behind
bipartite clustering coefficients and co-occurrence cohesion.  The
reference engine's mutual/triangle pipeline (cf.
/root/reference/example/mutual.cc and plato/algo/triangle) only covers
unipartite graphs; this operator extends the same wedge/intersection
discipline to bipartite data (order x part, user x item, doc x shingle).

Algorithm (exact, one aggregation tree — Wang et al., "Vertex Priority
Based Butterfly Counting for Large-scale Bipartite Networks", VLDB'19,
side-selection variant):

  1. pick the wedge-cheap side as the CENTER: total wedges centered on a
     side are sum(C(deg, 2)) over that side's vertices, computable from
     the two degree tables alone (two cheap aggregations, no pair
     blow-up);
  2. generate wedges by self-joining the incidence on the center key and
     keeping ordered endpoint pairs (u < v);
  3. pair support w(u,v) = number of common center neighbors =
     groupBy((u, v)).count()  — map-side combined;
  4. butterflies = sum(C(w, 2)).

All arithmetic is exact int64 (C(n,2) = n*(n-1) div 2), so the result is
bit-identical to any SQL mirror.

Scale notes (100 TB): the self-join shuffles the incidence once on the
center key; a hub center with degree d contributes d^2 wedge rows, which
AQE's skew-join split distributes across tasks before the map-side
combined groupBy collapses them to distinct pairs.  Side selection is
the big lever — centering on the side with the smaller sum(deg^2) is
often orders of magnitude cheaper (e.g. users-with-100-items vs
items-with-1M-users).  The returned stats include both sides' wedge
totals so the choice is auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["butterfly_stats"]


def _wedge_total(inc: DataFrame, key: str) -> DataFrame:
    """One-row DF: sum(C(deg,2)) over ``key``-side vertices + vertex count."""
    deg = inc.groupBy(key).agg(F.count("*").alias("d"))
    return deg.agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(
            F.sum(F.expr("d * (d - 1) div 2")), F.lit(0)
        ).cast("long").alias("wedges"),
    )


def butterfly_stats(inc: DataFrame, left: str = "left", right: str = "right") -> DataFrame:
    """One-row DataFrame of exact bipartite motif statistics.

    ``inc`` must be a DISTINCT incidence table with columns ``left`` and
    ``right``.  Output columns: n_left, n_right, n_edges, wedges_left
    (wedges centered on a left vertex, i.e. right-side endpoint pairs),
    wedges_right, butterflies.

    The butterfly count is a graph invariant — identical whichever side
    centers the wedges — so the cheaper side is chosen at runtime from
    the two wedge totals (two scalar aggregations).
    """
    spark = inc.sparkSession
    inc = inc.select(F.col(left).alias("l"), F.col(right).alias("r"))

    lw = _wedge_total(inc, "l").collect()[0]  # wedges centered on left
    rw = _wedge_total(inc, "r").collect()[0]
    n_edges = inc.count()

    # center on the side with fewer wedges (less pair blow-up)
    center, a, b = ("l", "r", "r") if lw["wedges"] <= rw["wedges"] else ("r", "l", "l")
    x = inc.select(F.col(center).alias("c"), F.col(a).alias("u"))
    y = inc.select(F.col(center).alias("c"), F.col(b).alias("v"))
    pair_w = (
        x.join(y, "c")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
    )
    bf = pair_w.agg(
        F.coalesce(
            F.sum(F.expr("w * (w - 1) div 2")), F.lit(0)
        ).cast("long").alias("butterflies")
    ).collect()[0]["butterflies"]

    return spark.createDataFrame(
        [(lw["n"], rw["n"], n_edges, lw["wedges"], rw["wedges"], bf)],
        "n_left long, n_right long, n_edges long, "
        "wedges_left long, wedges_right long, butterflies long",
    )


def butterfly_per_vertex(
    inc: DataFrame, left: str = "left", right: str = "right",
    side: str = "right",
) -> DataFrame:
    """(id, butterflies) — per-vertex butterfly participation on the
    chosen side (how many 2x2 bicliques each vertex corners), the
    vertex-local cohesion measure behind bipartite clustering
    coefficients.  b(u) = sum over partners v of C(w(u,v), 2) where w is
    the pair support; vertices in no butterfly are omitted.  One wedge
    join + two map-side-combined aggregations; exact int64."""
    a, b = ("r", "r") if side == "right" else ("l", "l")
    c = "l" if side == "right" else "r"
    inc = inc.select(F.col(left).alias("l"), F.col(right).alias("r"))
    x = inc.select(F.col(c).alias("c"), F.col(a).alias("u"))
    y = inc.select(F.col(c).alias("c"), F.col(b).alias("v"))
    pair_w = (
        x.join(y, "c")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= 2)
    )
    per = pair_w.select(
        F.col("u").alias("id"), F.expr("w * (w - 1) div 2").alias("b")
    ).unionByName(
        pair_w.select(F.col("v").alias("id"),
                      F.expr("w * (w - 1) div 2").alias("b"))
    )
    return per.groupBy("id").agg(
        F.sum("b").cast("long").alias("butterflies")
    )
