"""Forman-Ricci edge curvature (triangle-augmented, unweighted form).

Discrete graph geometry over the canonical undirected edge table: the
augmented Forman curvature of an edge e = (u, v) is

    F(e) = 4 - deg(u) - deg(v) + 3 * t(e)

where t(e) is the number of triangles through the edge (its common-
neighbor count).  Negative curvature marks bridge-like "traffic" edges
between dense regions (the same edges edge-betweenness ranks high, at a
tiny fraction of the cost — one common-neighbor join instead of
all-sources Brandes); positive curvature marks intra-community edges
wrapped in triangles.  Jost & Liu 2014 / Sreejith et al. 2016 establish
the form; plato has no curvature kernel, but its mutual/triangle
machinery (/root/reference/example/mutual.cc:204-222) provides exactly
the t(e) ingredient, which we reuse via algos/triangles.common_neighbors
(hub-capped, segment-rejoined — scale-safe on skewed degree).

Everything is exact integer arithmetic: degrees and supports are counts,
the curvature a linear combination — no division, no libm, so the DuckDB
oracle matches bit-for-bit.

Scale: one symmetrize + groupBy for degrees (map-side combined), one
common-neighbor join (adjacency arrays, hash-segmented above hub_cap),
one broadcast-eligible degree join.  No windows, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.algos.triangles import common_neighbors
from plato_spark.graph.edges import symmetrize

__all__ = ["forman_curvature"]


def forman_curvature(canon: DataFrame) -> DataFrame:
    """(src, dst, support, curvature) — augmented Forman-Ricci curvature
    per canonical edge (src < dst): 4 - deg(src) - deg(dst) + 3*support.

    All-integer output; support is the edge's triangle count.
    """
    deg = symmetrize(canon.select("src", "dst")).groupBy(
        F.col("src").alias("id")
    ).agg(F.count("*").cast("long").alias("deg"))
    cn = common_neighbors(canon)
    du = deg.select(F.col("id").alias("src"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv"))
    return (
        cn.join(du, "src").join(dv, "dst")
        .select(
            "src", "dst",
            F.col("common_count").cast("long").alias("support"),
            (F.lit(4) - F.col("du") - F.col("dv")
             + 3 * F.col("common_count")).cast("long").alias("curvature"),
        )
    )
