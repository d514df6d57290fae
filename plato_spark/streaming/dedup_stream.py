"""Incrementally-maintained exact-dedup index over a document stream.

Batch exact dedup (functions/dedup.exact_dedup) reloads the whole corpus
per run; here Structured Streaming + foreachBatch maintains the content
index incrementally: per micro-batch, only the batch's own digests and
the state buckets they hash into are touched, so steady-state cost
scales with the batch, not the corpus — the ingest-time dedup gate of a
training-data pipeline (every incoming crawl shard is folded against
the full history without rescanning it).

State: (content_sha, keeper_doc, n_copies) hash-bucketed by digest
(pmod(xxhash64(sha), n_buckets), the same partition-pruned layout as
streaming/incremental.py), each bucket versioned independently with
write-then-commit ``_SUCCESS`` markers.  Per batch:

  1. Pre-aggregate the batch map-side: sha -> (min doc_id, count).
     Only 64-byte digests + counts enter the shuffle — document text is
     hashed map-side and never moves.
  2. Touched buckets are computed from the batch digests alone (a
     distinct-collect bounded by n_buckets ints); only those buckets
     are read and rewritten.
  3. Merge: keeper = least(old, new) (min doc_id overall — makes the
     final state ORDER-INDEPENDENT, hence equal to batch dedup over the
     union of all batches, hence oracle-checkable), n_copies = old+new.

EXACTLY-ONCE per bucket via epoch tags: unlike wcc's monotone min-merge
(idempotent under replay), counts double on replay — so every committed
bucket version records the epoch that produced it (``_EPOCH`` file (underscore-prefixed: ignored by parquet dir scans),
written before the ``_SUCCESS`` marker), and a replayed batch skips
buckets whose committed epoch is already >= the replayed epoch id.  A
crash between bucket commits therefore replays into exactly the buckets
that missed their commit, and no count is ever applied twice.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plato_spark.streaming.incremental import (
    N_BUCKETS_DEFAULT,
    _bucket,
    _meta_nbuckets,
    _versions,
)


def _committed_epoch(bucket_dir: str) -> int:
    vs = _versions(bucket_dir)
    if not vs:
        return -1
    ep = os.path.join(bucket_dir, f"v{vs[-1]}", "_EPOCH")
    if not os.path.exists(ep):
        return -1
    with open(ep) as fh:
        return int(fh.read().strip())


def _latest_data_paths(state_dir: str, buckets: list[int]) -> list[str]:
    paths = []
    for b in buckets:
        bdir = os.path.join(state_dir, f"b{b:04d}")
        vs = _versions(bdir)
        if vs:
            p = os.path.join(bdir, f"v{vs[-1]}")
            if any(n.endswith(".parquet") for n in os.listdir(p)):
                paths.append(p)
    return paths


STATE_SCHEMA = "content_sha string, keeper_doc long, n_copies long"


def read_dedup_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current (content_sha, keeper_doc, n_copies) index (empty if none)."""
    nb_dirs = [
        int(d[1:]) for d in (os.listdir(state_dir) if os.path.isdir(state_dir) else [])
        if d.startswith("b") and d[1:].isdigit()
    ]
    paths = _latest_data_paths(state_dir, sorted(nb_dirs))
    if not paths:
        return spark.createDataFrame([], STATE_SCHEMA)
    return spark.read.parquet(*paths).select(
        "content_sha", "keeper_doc", "n_copies"
    )


def merge_doc_batch(
    batch: DataFrame,
    state_dir: str,
    epoch_id: int,
    n_buckets: int = N_BUCKETS_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Fold one micro-batch of documents into the dedup index.

    Returns {touched_buckets, skipped_buckets, total_buckets} — skipped
    counts buckets already committed at >= epoch_id (replay)."""
    spark = batch.sparkSession
    nb = _meta_nbuckets(state_dir, n_buckets)

    agg = (
        batch.select(
            F.sha2(F.col(text_col), 256).alias("content_sha"),
            F.col(id_col).cast("long").alias("doc_id"),
        )
        .groupBy("content_sha")
        .agg(
            F.min("doc_id").alias("keeper_doc"),
            F.count("*").alias("n_copies"),
        )
        .withColumn("b", _bucket(F.xxhash64("content_sha"), nb))
        .persist()
    )
    touched = sorted({r["b"] for r in agg.select("b").distinct().collect()})
    stats = {"touched_buckets": 0, "skipped_buckets": 0, "total_buckets": nb}
    if not touched:
        agg.unpersist()
        return stats

    # replay guard: only fold into buckets that have not yet committed
    # this epoch (per-bucket exactly-once; counts are not idempotent)
    stale = [
        b for b in touched
        if _committed_epoch(os.path.join(state_dir, f"b{b:04d}")) < epoch_id
    ]
    stats["touched_buckets"] = len(stale)
    stats["skipped_buckets"] = len(touched) - len(stale)
    if not stale:
        agg.unpersist()
        return stats

    new = agg.where(F.col("b").isin([int(b) for b in stale]))
    paths = _latest_data_paths(state_dir, stale)
    cur = (
        spark.read.parquet(*paths).select("content_sha", "keeper_doc", "n_copies")
        if paths else spark.createDataFrame([], STATE_SCHEMA)
    )
    merged = (
        cur.select(
            "content_sha",
            F.col("keeper_doc").alias("ok"),
            F.col("n_copies").alias("oc"),
        )
        .join(new.select("content_sha", "keeper_doc", "n_copies"),
              "content_sha", "outer")
        .select(
            "content_sha",
            F.least(
                F.coalesce("ok", F.col("keeper_doc")),
                F.coalesce("keeper_doc", F.col("ok")),
            ).alias("keeper_doc"),
            (F.coalesce("oc", F.lit(0)) + F.coalesce("n_copies", F.lit(0)))
            .cast("long").alias("n_copies"),
        )
        .withColumn("b", _bucket(F.xxhash64("content_sha"), nb))
    )

    tmp = os.path.join(state_dir, f"_tmp_{uuid.uuid4().hex[:8]}")
    merged.write.partitionBy("b").mode("overwrite").parquet(tmp)

    for b in stale:
        bdir = os.path.join(state_dir, f"b{b:04d}")
        vs = _versions(bdir)
        dest = os.path.join(bdir, f"v{(vs[-1] + 1) if vs else 0}")
        src = os.path.join(tmp, f"b={b}")
        shutil.rmtree(dest, ignore_errors=True)
        if os.path.isdir(src):
            os.makedirs(bdir, exist_ok=True)
            os.rename(src, dest)
        else:  # nothing hashed here after all: commit an empty version
            os.makedirs(dest, exist_ok=True)
        with open(os.path.join(dest, "_EPOCH"), "w") as fh:
            fh.write(str(int(epoch_id)))
        # write-then-commit: the version becomes visible only here
        open(os.path.join(dest, "_SUCCESS"), "w").close()
        for old in vs[:-1]:  # keep current + previous committed version
            shutil.rmtree(os.path.join(bdir, f"v{old}"), ignore_errors=True)

    shutil.rmtree(tmp, ignore_errors=True)
    agg.unpersist()
    return stats


def incremental_dedup(
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    n_buckets: int = N_BUCKETS_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Start the streaming query maintaining the dedup index in state_dir.

    Uses foreachBatch's epoch id for the per-bucket replay guard; read
    the index any time with :func:`read_dedup_state`."""
    writer = doc_stream.writeStream.foreachBatch(
        lambda df, eid: merge_doc_batch(
            df, state_dir, eid, n_buckets, text_col=text_col, id_col=id_col
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
