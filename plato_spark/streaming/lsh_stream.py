"""Incrementally-maintained MinHash-LSH near-dup index over a document
stream — the streaming sibling of functions/dedup.minhash_lsh_candidates
and the near-dup counterpart of streaming/dedup_stream's exact index.

Batch LSH re-signatures the whole corpus per run; here each micro-batch
computes signatures for ITS OWN documents only, joins them against the
persisted band-bucket index to emit candidate pairs vs. all history,
and inserts its membership rows — steady-state cost scales with the
batch, not the corpus.  This is the ingest-time near-dup gate of a
training-data pipeline: every incoming crawl shard is checked against
the full history without re-hashing it.

State: (band, bucket, doc_id) membership rows, hash-bucketed by
pmod(xxhash64(band:bucket), n_buckets) — the partition-pruned layout of
streaming/incremental.py.  Unlike the exact-dedup index (counts — NOT
replay-idempotent, epoch guard mandatory), LSH membership is a SET and
the per-batch fold is distinct-union — idempotent like wcc's min-merge
— so replays are harmless for correctness; the epoch guard still skips
them to keep replay cost zero.

Telescoping invariant (what the oracle checks): a batch candidate pair
(a < b) exists iff some band-bucket contains both docs; streaming emits
it either batch-internally (both arrive together) or as a
history-vs-batch join hit (the earlier doc is already indexed) — so the
union of per-batch candidate emissions, and equally a final self-join
of the state, equals batch ``minhash_lsh_candidates`` over the full
corpus VERBATIM.  The registered gate query folds the corpus in three
micro-batches and reads candidates off the final state against the
unchanged batch oracle SQL.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plato_spark.functions.dedup import banded_rows, minhash_signatures
from plato_spark.streaming.dedup_stream import (
    _committed_epoch,
    _latest_data_paths,
)
from plato_spark.streaming.incremental import (
    N_BUCKETS_DEFAULT,
    _bucket,
    _meta_nbuckets,
    _versions,
)

STATE_SCHEMA = "band int, bucket string, doc_id long"


def _pkey():
    return F.concat_ws(":", F.col("band").cast("string"), F.col("bucket"))


def read_lsh_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current (band, bucket, doc_id) membership index (empty if none)."""
    nb_dirs = [
        int(d[1:]) for d in (os.listdir(state_dir) if os.path.isdir(state_dir) else [])
        if d.startswith("b") and d[1:].isdigit()
    ]
    paths = _latest_data_paths(state_dir, sorted(nb_dirs))
    if not paths:
        return spark.createDataFrame([], STATE_SCHEMA)
    return spark.read.parquet(*paths).select("band", "bucket", "doc_id")


def state_candidates(state: DataFrame) -> DataFrame:
    """(a, b) distinct candidate pairs from a membership index — equal to
    batch minhash_lsh_candidates over every document ever folded."""
    lhs = state.select("band", "bucket", F.col("doc_id").alias("a"))
    rhs = state.select("band", "bucket", F.col("doc_id").alias("b"))
    return (
        lhs.join(rhs, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def merge_lsh_batch(
    batch: DataFrame,
    state_dir: str,
    epoch_id: int,
    n_buckets: int = N_BUCKETS_DEFAULT,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_impl: str = "xxhash64",
    collect_delta_pairs: bool = False,
) -> dict:
    """Fold one micro-batch of documents into the LSH index.

    Returns {touched_buckets, skipped_buckets, total_buckets[,
    delta_pairs]}; ``delta_pairs`` (opt-in, test/monitoring surface) is
    the list of NEW candidate pairs this batch creates — batch-internal
    collisions plus history-vs-batch hits."""
    spark = batch.sparkSession
    nb = _meta_nbuckets(state_dir, n_buckets)

    sigs = minhash_signatures(batch, num_hashes, n, text_col, id_col, hash_impl)
    rows = (
        banded_rows(sigs, num_hashes, bands, hash_impl)
        .select("band", "bucket", F.col("id").cast("long").alias("doc_id"))
        .withColumn("pb", _bucket(F.xxhash64(_pkey()), nb))
        .persist()
    )
    touched = sorted({r["pb"] for r in rows.select("pb").distinct().collect()})
    stats = {"touched_buckets": 0, "skipped_buckets": 0, "total_buckets": nb}
    if not touched:
        rows.unpersist()
        return stats

    stale = [
        b for b in touched
        if _committed_epoch(os.path.join(state_dir, f"b{b:04d}")) < epoch_id
    ]
    stats["touched_buckets"] = len(stale)
    stats["skipped_buckets"] = len(touched) - len(stale)

    paths = _latest_data_paths(state_dir, touched)
    cur = (
        spark.read.parquet(*paths).select("band", "bucket", "doc_id")
        if paths else spark.createDataFrame([], STATE_SCHEMA)
    )

    if collect_delta_pairs:
        new_side = rows.select(
            "band", "bucket", F.col("doc_id").alias("x"))
        internal = (
            new_side.join(
                rows.select("band", "bucket", F.col("doc_id").alias("y")),
                ["band", "bucket"])
            .where(F.col("x") < F.col("y"))
            .select(F.col("x").alias("a"), F.col("y").alias("b"))
        )
        vs_hist = (
            new_side.join(
                cur.select("band", "bucket", F.col("doc_id").alias("y")),
                ["band", "bucket"])
            .where(F.col("x") != F.col("y"))
            .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        )
        stats["delta_pairs"] = sorted(
            (int(r["a"]), int(r["b"]))
            for r in internal.unionByName(vs_hist).distinct().collect()
        )

    if not stale:
        rows.unpersist()
        return stats

    new = rows.where(F.col("pb").isin([int(b) for b in stale]))
    stale_paths = _latest_data_paths(state_dir, stale)
    cur_stale = (
        spark.read.parquet(*stale_paths).select("band", "bucket", "doc_id")
        if stale_paths else spark.createDataFrame([], STATE_SCHEMA)
    )
    merged = (
        cur_stale.unionByName(new.select("band", "bucket", "doc_id"))
        .distinct()
        .withColumn("pb", _bucket(F.xxhash64(_pkey()), nb))
    )

    tmp = os.path.join(state_dir, f"_tmp_{uuid.uuid4().hex[:8]}")
    merged.write.partitionBy("pb").mode("overwrite").parquet(tmp)
    for b in stale:
        bdir = os.path.join(state_dir, f"b{b:04d}")
        vs = _versions(bdir)
        dest = os.path.join(bdir, f"v{(vs[-1] + 1) if vs else 0}")
        src = os.path.join(tmp, f"pb={b}")
        shutil.rmtree(dest, ignore_errors=True)
        if os.path.isdir(src):
            os.makedirs(bdir, exist_ok=True)
            os.rename(src, dest)
        else:
            os.makedirs(dest, exist_ok=True)
        with open(os.path.join(dest, "_EPOCH"), "w") as fh:
            fh.write(str(int(epoch_id)))
        open(os.path.join(dest, "_SUCCESS"), "w").close()
        for old in vs[:-1]:
            shutil.rmtree(os.path.join(bdir, f"v{old}"), ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    rows.unpersist()
    return stats


def incremental_lsh(
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    n_buckets: int = N_BUCKETS_DEFAULT,
    **kwargs,
):
    """Start the streaming query maintaining the LSH index in state_dir."""
    writer = doc_stream.writeStream.foreachBatch(
        lambda df, eid: merge_lsh_batch(df, state_dir, eid, n_buckets, **kwargs)
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
