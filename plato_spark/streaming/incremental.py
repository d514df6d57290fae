"""Incrementally-maintained connected components over an edge stream.

The reference engine is batch-only: every run reloads the full edge set
and starts labels from scratch (connected_component.hpp:174-245). On
Spark, Structured Streaming + foreachBatch turns the same hash-min
machinery into an INCREMENTAL operator: each micro-batch of new edges
touches only the components it connects, so steady-state cost scales
with the batch, not the graph.

Per micro-batch (classic distributed union-find merge):

  1. Look up the current label of each endpoint (new vertices label
     themselves) — one join against the persisted state.
  2. Contract: every new edge becomes a (label_a, label_b) pair; distinct
     pairs with label_a != label_b form the MERGE GRAPH, whose size is
     bounded by the number of distinct components the batch touches —
     usually orders of magnitude smaller than the batch itself.
  3. Run the batch hash-min WCC (algos/wcc) on the merge graph ->
     old_label -> new_label mapping (min label wins, preserving the
     global min-vid invariant).
  4. Rewrite state: labels in the mapping are remapped (broadcast join —
     the mapping is tiny), new vertices are appended.

State lives as versioned parquet (state_dir/v{k}); each batch writes
v{k+1} and prunes old versions, so a crashed batch never corrupts the
current version (write-then-advance, same discipline as
engine/checkpoint.py manifests). The labels equal the batch
``connected_components`` of the union of all edges seen — asserted in
tests/test_streaming_incremental.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        if name.startswith("v") and name[1:].isdigit():
            if os.path.exists(os.path.join(state_dir, name, "_SUCCESS")):
                out.append(int(name[1:]))
    return sorted(out)


def read_component_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current (id, component) table, or empty if no batch has landed."""
    vs = _versions(state_dir)
    if not vs:
        return spark.createDataFrame([], "id long, component long")
    return spark.read.parquet(os.path.join(state_dir, f"v{vs[-1]}"))


def merge_edge_batch(batch: DataFrame, state_dir: str) -> None:
    """Fold one batch of (src, dst) edges into the component state."""
    from plato_spark.algos.wcc import connected_components

    spark = batch.sparkSession
    labels = read_component_state(spark, state_dir)
    e = batch.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    if e.isEmpty():
        return

    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    cur = verts.join(labels, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    ).persist()

    la = cur.select(F.col("id").alias("src"), F.col("component").alias("la"))
    lb = cur.select(F.col("id").alias("dst"), F.col("component").alias("lb"))
    merge_graph = (
        e.join(la, "src").join(lb, "dst")
        .where(F.col("la") != F.col("lb"))
        .select(F.col("la").alias("src"), F.col("lb").alias("dst"))
        .distinct()
    ).persist()

    if merge_graph.isEmpty():
        # batch connects nothing new: only append unseen vertices
        mapping = None
    else:
        mapping = F.broadcast(
            connected_components(merge_graph).select(
                F.col("id").alias("component"), F.col("component").alias("newc")
            ).where(F.col("component") != F.col("newc"))
        )

    def remap(df: DataFrame) -> DataFrame:
        if mapping is None:
            return df
        return df.join(mapping, "component", "left").select(
            "id", F.coalesce("newc", F.col("component")).alias("component")
        )

    new_vertices = cur.join(labels.select("id"), "id", "left_anti")
    new_state = remap(labels).unionByName(remap(new_vertices))

    vs = _versions(state_dir)
    nxt = (vs[-1] + 1) if vs else 0
    new_state.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"v{nxt}")
    )
    cur.unpersist()
    merge_graph.unpersist()
    for old in vs[:-1]:  # keep current + previous version
        shutil.rmtree(os.path.join(state_dir, f"v{old}"), ignore_errors=True)


def incremental_wcc(
    edge_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start the streaming query maintaining (id, component) in state_dir.

    Returns the StreamingQuery; read results any time with
    read_component_state. Exactly-once per batch comes from the streaming
    checkpoint (replayed batches rewrite the same merge idempotently —
    merging already-merged labels is a no-op).
    """
    writer = edge_stream.writeStream.foreachBatch(
        lambda df, _eid: merge_edge_batch(df, state_dir)
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
