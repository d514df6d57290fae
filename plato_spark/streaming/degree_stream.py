"""Incrementally-maintained vertex degrees over a streaming edge feed.

The degree table is the live control surface for every partitioning
decision this engine makes (hub salting thresholds, push/pull policy,
degree-weighted ranges — graph/salting.py, graph/partitioning.py): on a
growing crawl it must be maintainable without re-scanning the full edge
history.  Multigraph degree (each edge occurrence counts both
endpoints) is a plain addition monoid, so folding per-batch deltas into
persisted per-vertex counts yields EXACTLY the batch degrees of the
union of all batches — the oracle for the streaming operator is the
one-line batch degree count, verbatim.

Layout and exactly-once semantics follow the incremental dedup index
(streaming/dedup_stream.py), not the CMS (whose state is constant-size
and rewrites whole): state is hash-bucketed by vertex id (pmod, the
partitioner's own function) and only buckets containing a touched
vertex rewrite — steady-state batches touch a few buckets, never the
whole table.  Additive counts are NOT idempotent under replay, so each
bucket version carries an ``_EPOCH`` tag behind a write-then-commit
``_SUCCESS`` marker: a replayed epoch skips buckets already committed
at >= that epoch and a crash between bucket commits replays into
exactly the missed buckets.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plato_spark.streaming.incremental import _versions

DEG_SCHEMA = "id long, deg long"


def _bucket_of(col, nb: int):
    return F.pmod(col, F.lit(nb))


def _committed_epoch(bdir: str) -> int:
    vs = _versions(bdir)
    if not vs:
        return -1
    ep = os.path.join(bdir, f"v{vs[-1]}", "_EPOCH")
    if not os.path.exists(ep):
        return -1
    with open(ep) as fh:
        return int(fh.read().strip())


def _read_bucket(spark: SparkSession, bdir: str) -> DataFrame:
    vs = _versions(bdir)
    if not vs:
        return spark.createDataFrame([], DEG_SCHEMA)
    path = os.path.join(bdir, f"v{vs[-1]}")
    if not any(n.endswith(".parquet") for n in os.listdir(path)):
        return spark.createDataFrame([], DEG_SCHEMA)
    return spark.read.parquet(path).select("id", "deg")


def read_degree_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """(id, deg) — union of the latest committed bucket versions."""
    if not os.path.isdir(state_dir):
        return spark.createDataFrame([], DEG_SCHEMA)
    out = None
    for name in sorted(os.listdir(state_dir)):
        if not name.startswith("b"):
            continue
        df = _read_bucket(spark, os.path.join(state_dir, name))
        out = df if out is None else out.unionByName(df)
    return out if out is not None else spark.createDataFrame([], DEG_SCHEMA)


def merge_degree_batch(
    edges: DataFrame, state_dir: str, epoch_id: int = 0, nbuckets: int = 32
) -> dict:
    """Fold one micro-batch of (src, dst) edges into the persisted
    degree table.  Returns {touched: [...], skipped: [...]} bucket
    lists; a bucket already committed at >= epoch_id is skipped
    (replay), everything else applies exactly once."""
    spark = edges.sparkSession
    os.makedirs(state_dir, exist_ok=True)
    delta = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .withColumn("b", _bucket_of(F.col("id"), nbuckets))
        .persist()
    )
    touched = sorted(
        int(r["b"]) for r in delta.select("b").distinct().collect()
    )
    applied, skipped = [], []
    for b in touched:
        bdir = os.path.join(state_dir, f"b{b:04d}")
        os.makedirs(bdir, exist_ok=True)
        if _committed_epoch(bdir) >= epoch_id:
            skipped.append(b)
            continue
        cur = _read_bucket(spark, bdir)
        merged = (
            cur.select("id", F.col("deg").alias("od"))
            .join(
                delta.where(F.col("b") == b).select("id", F.col("d").alias("nd")),
                "id",
                "outer",
            )
            .select(
                "id",
                (F.coalesce("od", F.lit(0)) + F.coalesce("nd", F.lit(0)))
                .cast("long")
                .alias("deg"),
            )
        )
        tmp = os.path.join(bdir, f"_tmp_{uuid.uuid4().hex[:8]}")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        for n in list(os.listdir(tmp)):
            if n.startswith("_"):
                os.remove(os.path.join(tmp, n))
        vs = _versions(bdir)
        dest = os.path.join(bdir, f"v{(vs[-1] + 1) if vs else 0}")
        shutil.rmtree(dest, ignore_errors=True)
        os.rename(tmp, dest)
        with open(os.path.join(dest, "_EPOCH"), "w") as fh:
            fh.write(str(int(epoch_id)))
        open(os.path.join(dest, "_SUCCESS"), "w").close()
        for old in vs[:-1]:
            shutil.rmtree(os.path.join(bdir, f"v{old}"), ignore_errors=True)
        applied.append(b)
    delta.unpersist()
    return {"touched": applied, "skipped": skipped}
