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
  4. Rewrite ONLY the touched state buckets.

PARTITION-PRUNED STATE: rows are hash-bucketed by COMPONENT
(pmod(xxhash64(component), n_buckets)), each bucket versioned
independently (state_dir/b{b}/v{k}). Bucketing by component (not id)
is the load-bearing choice: the buckets a merge touches are computable
from the tiny old->new mapping alone — bucket(old) loses rows,
bucket(new) gains them, new vertices land in bucket(their component) —
so a batch reads and rewrites only those buckets; per-batch write
volume is ∝ touched components + new vertices, NOT O(V). (The
endpoint-label lookup in step 1 still scans the state — a read, not
the rewrite the versioned-parquet design was paying before.)

Each touched bucket advances write-then-commit (a _SUCCESS marker
created after the move), so a crashed batch never corrupts a committed
version; replays are idempotent because min-label merging is monotone
(already-merged labels produce an empty merge graph) and the
new-vertex anti-join skips already-appended ids. Labels always equal
the batch ``connected_components`` of the union of all edges seen —
asserted in tests/test_streaming_incremental.py.

Known limit (documented, as in the reference): edges are ADD-only.
Deletions are unsupported — labels only ever merge downward; removing
an edge would require recomputing the affected component from scratch.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS_DEFAULT = 32


def _bucket(c: Column, nb: int) -> Column:
    return F.pmod(F.xxhash64(c.cast("long")), F.lit(nb)).cast("int")


def _meta_nbuckets(state_dir: str, requested: int) -> int:
    meta = os.path.join(state_dir, "NBUCKETS")
    if os.path.exists(meta):
        with open(meta) as fh:
            return int(fh.read().strip())
    os.makedirs(state_dir, exist_ok=True)
    with open(meta, "w") as fh:
        fh.write(str(requested))
    return requested


def _bucket_dirs(state_dir: str) -> list[str]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        os.path.join(state_dir, d)
        for d in os.listdir(state_dir)
        if d.startswith("b") and d[1:].isdigit()
    )


def _versions(bucket_dir: str) -> list[int]:
    if not os.path.isdir(bucket_dir):
        return []
    out = []
    for name in os.listdir(bucket_dir):
        if name.startswith("v") and name[1:].isdigit():
            if os.path.exists(os.path.join(bucket_dir, name, "_SUCCESS")):
                out.append(int(name[1:]))
    return sorted(out)


def _latest_paths(state_dir: str) -> list[str]:
    """Latest committed version dir per bucket that holds data files."""
    paths = []
    for bdir in _bucket_dirs(state_dir):
        vs = _versions(bdir)
        if not vs:
            continue
        p = os.path.join(bdir, f"v{vs[-1]}")
        if any(n.endswith(".parquet") for n in os.listdir(p)):
            paths.append(p)
    return paths


def read_component_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current (id, component) table, or empty if no batch has landed."""
    paths = _latest_paths(state_dir)
    if not paths:
        return spark.createDataFrame([], "id long, component long")
    return spark.read.parquet(*paths).select("id", "component")


def _read_buckets(spark: SparkSession, state_dir: str, buckets: set[int]) -> DataFrame:
    paths = []
    for b in sorted(buckets):
        bdir = os.path.join(state_dir, f"b{b:04d}")
        vs = _versions(bdir)
        if vs:
            p = os.path.join(bdir, f"v{vs[-1]}")
            if any(n.endswith(".parquet") for n in os.listdir(p)):
                paths.append(p)
    if not paths:
        return spark.createDataFrame([], "id long, component long")
    return spark.read.parquet(*paths).select("id", "component")


def merge_edge_batch(
    batch: DataFrame, state_dir: str, n_buckets: int = N_BUCKETS_DEFAULT
) -> dict:
    """Fold one batch of (src, dst) edges into the component state.

    Returns per-batch stats ({touched_buckets, total_buckets}) — the
    evidence that write volume tracks the touched set."""
    from plato_spark.algos.wcc import connected_components

    spark = batch.sparkSession
    nb = _meta_nbuckets(state_dir, n_buckets)
    labels = read_component_state(spark, state_dir)
    e = batch.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    if e.isEmpty():
        return {"touched_buckets": 0, "total_buckets": nb}

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
        mapping = None
    else:
        mapping = connected_components(merge_graph).select(
            F.col("id").alias("component"), F.col("component").alias("newc")
        ).where(F.col("component") != F.col("newc")).persist()

    def remap(df: DataFrame) -> DataFrame:
        if mapping is None:
            return df
        return df.join(F.broadcast(mapping), "component", "left").select(
            "id", F.coalesce("newc", F.col("component")).alias("component")
        )

    new_vertices = remap(
        cur.join(labels.select("id"), "id", "left_anti")
    ).persist()

    # touched buckets, computable WITHOUT scanning state: old labels lose
    # rows, new labels gain them, new vertices land in their component's
    # bucket (collect is bounded by n_buckets distinct ints)
    tb = new_vertices.select(_bucket(F.col("component"), nb).alias("b"))
    if mapping is not None:
        tb = tb.unionByName(
            mapping.select(_bucket(F.col("component"), nb).alias("b"))
        ).unionByName(mapping.select(_bucket(F.col("newc"), nb).alias("b")))
    touched = {r["b"] for r in tb.distinct().collect()}

    stats = {"touched_buckets": len(touched), "total_buckets": nb}
    if not touched:
        for c in (cur, merge_graph):
            c.unpersist()
        return stats

    # rewrite = remapped rows of the touched buckets + new vertices; every
    # output row's bucket is again in `touched` (bucket is a function of
    # component, and both sides of the mapping are included above)
    out = remap(_read_buckets(spark, state_dir, touched)).unionByName(new_vertices)
    out = out.withColumn("b", _bucket(F.col("component"), nb))

    tmp = os.path.join(state_dir, f"_tmp_{uuid.uuid4().hex[:8]}")
    out.write.partitionBy("b").mode("overwrite").parquet(tmp)

    for b in sorted(touched):
        bdir = os.path.join(state_dir, f"b{b:04d}")
        vs = _versions(bdir)
        dest = os.path.join(bdir, f"v{(vs[-1] + 1) if vs else 0}")
        src = os.path.join(tmp, f"b={b}")
        shutil.rmtree(dest, ignore_errors=True)
        if os.path.isdir(src):
            os.makedirs(bdir, exist_ok=True)
            os.rename(src, dest)
        else:  # bucket fully drained by the remap: commit an EMPTY version
            os.makedirs(dest, exist_ok=True)
        # write-then-commit: the version only becomes visible here
        open(os.path.join(dest, "_SUCCESS"), "w").close()
        for old in vs[:-1]:  # keep current + previous committed version
            shutil.rmtree(os.path.join(bdir, f"v{old}"), ignore_errors=True)

    shutil.rmtree(tmp, ignore_errors=True)
    for c in (cur, merge_graph, new_vertices):
        c.unpersist()
    if mapping is not None:
        mapping.unpersist()
    return stats


def incremental_wcc(
    edge_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    n_buckets: int = N_BUCKETS_DEFAULT,
):
    """Start the streaming query maintaining (id, component) in state_dir.

    Returns the StreamingQuery; read results any time with
    read_component_state. Exactly-once per batch comes from the streaming
    checkpoint (replayed batches rewrite the same merge idempotently —
    merging already-merged labels is a no-op).
    """
    writer = edge_stream.writeStream.foreachBatch(
        lambda df, _eid: merge_edge_batch(df, state_dir, n_buckets)
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
