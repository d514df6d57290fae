"""Incrementally-maintained count-min sketch over a document stream.

Sketches are the textbook streaming state: the count-min cells form a
commutative monoid (cell-wise addition), so folding micro-batches into
a persisted sketch yields EXACTLY the batch sketch of the union of all
batches — the oracle for the streaming operator is the plain batch CMS
SQL, verbatim.  This is the frequency-side sibling of the incremental
dedup index (streaming/dedup_stream.py): where dedup folds min/count
per digest, CMS folds a CONSTANT-SIZE state (d x w cells, ~2048 rows)
no matter how many tokens or batches arrive — at 100 TB/day the
per-batch work is one map-side-combined d*w aggregation plus a 2048-row
merge, and the state never grows.

Exactly-once: cell counts are NOT idempotent under replay (same hazard
as dedup counts), so the persisted sketch is versioned with
write-then-commit ``_SUCCESS`` markers and an ``_EPOCH`` tag; a replayed
epoch whose tag is already committed is skipped wholesale.  The state is
small enough that a single versioned directory (no hash-bucketing) is
the right layout — the whole sketch rewrites per batch, ~2048 rows.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plato_spark.functions.sketches import cms_sketch
from plato_spark.streaming.incremental import _versions

SKETCH_SCHEMA = "r int, b int, cnt long"


def _committed_epoch(state_dir: str) -> int:
    vs = _versions(state_dir)
    if not vs:
        return -1
    ep = os.path.join(state_dir, f"v{vs[-1]}", "_EPOCH")
    if not os.path.exists(ep):
        return -1
    with open(ep) as fh:
        return int(fh.read().strip())


def read_cms_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current folded sketch (empty d x w table if nothing committed)."""
    vs = _versions(state_dir)
    if not vs:
        return spark.createDataFrame([], SKETCH_SCHEMA)
    path = os.path.join(state_dir, f"v{vs[-1]}")
    if not any(n.endswith(".parquet") for n in os.listdir(path)):
        return spark.createDataFrame([], SKETCH_SCHEMA)
    return spark.read.parquet(path).select("r", "b", "cnt")


def merge_cms_batch(
    batch: DataFrame,
    state_dir: str,
    epoch_id: int,
    depth: int = 4,
    width: int = 64,
    text_col: str = "text",
) -> dict:
    """Fold one micro-batch's sketch into the persisted state.  Returns
    {applied: bool, cells: int}; a replayed epoch is skipped."""
    spark = batch.sparkSession
    os.makedirs(state_dir, exist_ok=True)
    if _committed_epoch(state_dir) >= epoch_id:
        return {"applied": False, "cells": 0}
    bs = cms_sketch(batch, depth=depth, width=width, text_col=text_col)
    cur = read_cms_state(spark, state_dir)
    merged = (
        cur.select("r", "b", F.col("cnt").alias("oc"))
        .join(bs.select("r", "b", F.col("cnt").alias("nc")), ["r", "b"],
              "outer")
        .select(
            "r", "b",
            (F.coalesce("oc", F.lit(0)) + F.coalesce("nc", F.lit(0)))
            .cast("long").alias("cnt"),
        )
    )
    tmp = os.path.join(state_dir, f"_tmp_{uuid.uuid4().hex[:8]}")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    # the tmp write drops Spark's own _SUCCESS; stage then commit
    for n in list(os.listdir(tmp)):
        if n.startswith("_"):
            os.remove(os.path.join(tmp, n))
    vs = _versions(state_dir)
    dest = os.path.join(state_dir, f"v{(vs[-1] + 1) if vs else 0}")
    shutil.rmtree(dest, ignore_errors=True)
    os.rename(tmp, dest)
    with open(os.path.join(dest, "_EPOCH"), "w") as fh:
        fh.write(str(int(epoch_id)))
    open(os.path.join(dest, "_SUCCESS"), "w").close()
    for old in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v{old}"),
                      ignore_errors=True)
    return {"applied": True, "version": os.path.basename(dest)}
