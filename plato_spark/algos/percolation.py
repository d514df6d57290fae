"""Weight-threshold percolation sweep — connectivity vs edge strength.

The bond-percolation view of a weighted graph: repeatedly discard edges
below a strength threshold and watch the component structure break up —
the standard robustness/backbone analysis (how much co-occurrence
evidence is needed before the graph stays connected?).  One hash-min WCC
(algos/wcc, the reference's connected-components semantics,
/root/reference/plato/algo/cgm) per threshold over the SHRINKING edge
set; each sweep point reports exact integer stats:

    (threshold, n_vertices, n_edges, n_components, largest)

where ``largest`` is the giant component's vertex count.  Thresholds are
compared as ``weight >= t`` on the exact co-occurrence counts, so the
sweep is deterministic and SQL-oracle-checkable (the oracle unrolls one
hash-min chain per threshold).

Scale: each threshold is one WCC over a strictly smaller edge set —
sparser graphs may have LARGER diameter (hash-min rounds grow as the
giant component thins), which is a property the oracle's pinned round
count must cover; measure before pinning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.algos.wcc import connected_components
from plato_spark.graph.edges import symmetrize

__all__ = ["percolation_sweep"]


def percolation_sweep(
    edges_canon_weighted: DataFrame, thresholds: tuple = (1, 2, 3, 5)
) -> DataFrame:
    """One row per threshold over the canonical weighted edge table."""
    spark = edges_canon_weighted.sparkSession
    rows = []
    for t in thresholds:
        sub = edges_canon_weighted.where(F.col("weight") >= t).select(
            "src", "dst"
        )
        m = sub.count()
        if m == 0:
            rows.append((int(t), 0, 0, 0, 0))
            continue
        labels = connected_components(symmetrize(sub))
        sizes = labels.groupBy("component").agg(F.count("*").alias("sz"))
        agg = sizes.agg(
            F.count("*").alias("nc"),
            F.sum("sz").alias("nv"),
            F.max("sz").alias("mx"),
        ).collect()[0]
        rows.append((int(t), int(agg["nv"]), int(m),
                     int(agg["nc"]), int(agg["mx"])))
    return spark.createDataFrame(
        rows,
        "threshold int, n_vertices long, n_edges long, "
        "n_components long, largest long",
    )
