"""Spread — relation-graph × behaviour-table payload aggregation.

Reference workload: /root/reference/example/spread.cc — two inputs, a
relation graph (uin -> adjacency) and a behaviour table (vertex ->
list of (behaviour_id, sum_items[<=5])). For every relation vertex,
aggregate the behaviour rows of its NEIGHBORS:

  count mode  (spread.cc:714-716, output_list=false): per uin, the total
              number of neighbor behaviour rows ("spread counter").
  list mode   (spread.cc:718-760): per (uin, behaviour_id), the
              occurrence count and the per-item sums.

The reference builds a behaviour bitmap and loads only relation
adjacency that touches it (spread.cc:666-671) — the Spark-first
equivalent is simply the inner join below: Catalyst's join pruning plays
the role of the bitmap, and the groupBy is map-side combined. Both
modes are one co-partitioned join + one aggregation — no iteration, no
Python. At 100 TB the behaviour side is usually the small one; Spark's
AQE broadcast-joins it automatically when it fits, otherwise both sides
hash-shuffle on the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.graph.edges import symmetrize


def _neighbor_behaviours(
    edges: DataFrame,
    behaviours: DataFrame,
    id_col: str,
    directed: bool,
) -> DataFrame:
    g = edges.select("src", "dst")
    if not directed:
        g = symmetrize(g)
    return g.join(
        behaviours.withColumnRenamed(id_col, "dst"), "dst"
    ).withColumnRenamed("src", "uin")


def spread_count(
    edges: DataFrame,
    behaviours: DataFrame,
    id_col: str = "id",
    directed: bool = False,
) -> DataFrame:
    """(uin, distinct_nbrs, spread_cnt) — per relation vertex, how many
    behaviour-having neighbors it reaches and how many behaviour rows
    they contribute (spread.cc count mode: spread_counter / distinct_uin).
    Vertices whose neighbors have no behaviours are absent (the reference
    only emits uins with size > 0)."""
    nb = _neighbor_behaviours(edges, behaviours, id_col, directed)
    return nb.groupBy("uin").agg(
        F.count_distinct("dst").cast("long").alias("distinct_nbrs"),
        F.count("*").cast("long").alias("spread_cnt"),
    )


def spread_aggregate(
    edges: DataFrame,
    behaviours: DataFrame,
    id_col: str = "id",
    behaviour_col: str = "behaviour_id",
    sum_cols: tuple = (),
    directed: bool = False,
) -> DataFrame:
    """(uin, behaviour_id, cnt, <sum_cols>_sum...) — spread.cc list mode:
    per relation vertex and behaviour id, the neighbor-behaviour count
    and the summed payload items (reference caps sum_items at 5;
    enforced here for parity)."""
    if len(sum_cols) > 5:
        raise ValueError("spread.cc parity: at most 5 sum items")
    nb = _neighbor_behaviours(edges, behaviours, id_col, directed)
    aggs = [F.count("*").cast("long").alias("cnt")] + [
        F.round(F.sum(c), 6).alias(f"{c}_sum") for c in sum_cols
    ]
    return nb.groupBy("uin", F.col(behaviour_col).alias("behaviour_id")).agg(*aggs)
