"""The three message-passing primitives — plato's entire dataflow algebra.

Reference: /root/reference/plato/graph/message_passing.hpp
  - aggregate_message (88-144): pull/gather — every vertex merges messages
    derived from its in-neighbors' states; receiver-side combining.
  - spread_message (200-249): scatter — active rows emit keyed messages,
    consumed on the owner partition.
  - broadcast_message (286-335): push — a (small/active) frontier is
    replicated to every node; receivers scan their local adjacency.

Spark equivalents (these wrappers exist so every §2.2 operator of the
reference has a named, tested counterpart; the algorithms use the same
plans inline where fusion helps):
  - aggregate_message = edges ⋈ state (co-partitioned) -> groupBy(dst).agg
    (map-side partial agg = plato's write_add/min/max combiners), or the
    CSR-block Arrow SpMV (graph/csr.py) for the custom-kernel path.
  - spread_message    = repartition by the target key + optional
    mapInPandas consume.
  - broadcast_message = F.broadcast(frontier) ⋈ adjacency.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def aggregate_message(
    edges: DataFrame,
    state: DataFrame,
    msg: Column,
    combiner: Callable[[Column], Column] = F.sum,
    state_cols: list[str] | None = None,
) -> DataFrame:
    """Pull-mode gather: returns (id, agg) with one row per dst that
    received at least one message.

    edges: (src, dst[, ...]); state: (id, ...state_cols) joined on src;
    msg: expression over edge+state columns; combiner: aggregate fn.
    """
    cols = state_cols or [c for c in state.columns if c != "id"]
    st = state.select(F.col("id").alias("src"), *cols)
    return (
        edges.join(st, "src")
        .select(F.col("dst").alias("id"), msg.alias("__msg"))
        .groupBy("id")
        .agg(combiner(F.col("__msg")).alias("agg"))
    )


def spread_message(
    messages: DataFrame,
    key: str,
    num_partitions: int | None = None,
    consume: Callable | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Scatter: redistribute messages to their owner partition by ``key``;
    optionally consume per partition with an Arrow-batched function."""
    spark = messages.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    out = messages.repartition(n, key)
    if consume is not None:
        if schema is None:
            raise ValueError("schema required with consume")
        out = out.mapInPandas(consume, schema=schema)
    return out


def broadcast_message(
    frontier: DataFrame,
    adjacency: DataFrame,
    on: str = "src",
) -> DataFrame:
    """Push-mode: replicate the frontier to all executors and join against
    local adjacency (plato broadcasts when active_edges/edges < 0.05,
    /root/reference/plato/engine/dualmode.hpp:41-43)."""
    return adjacency.join(F.broadcast(frontier), on)
