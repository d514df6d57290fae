"""Incrementally-maintained per-group HLL registers — streaming
COUNT(DISTINCT).

This completes the streaming-state monoid trilogy with its third and
best-behaved member:

* ADDITIVE state (CMS cells, degree counts, histogram bins) — NOT
  replay-idempotent; the epoch guard is a correctness requirement.
* MIN-merge state (incremental WCC labels) — idempotent; replays are
  harmless, the guard only keeps replay cost zero.
* MAX-merge state (HLL registers, here) — idempotent like min: a
  replayed batch re-maxes the same rhos into the same registers.  The
  epoch guard is kept for cost symmetry with the siblings, but a
  crash-replay without it would still read out EXACTLY the batch
  estimate; the rollback test asserts that property directly.

State is constant-size (<= |groups| * 64 register rows) no matter how
many events arrive; read-out over the folded registers equals the batch
hll_group_cardinality verbatim, so the oracle is the unchanged batch
HLL SQL.  Same single-versioned-directory write-then-commit layout as
the CMS state (the whole register table rewrites per batch — it is
tiny).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plato_spark.functions.sketches import hll_estimate, hll_registers
from plato_spark.streaming.incremental import _versions

REG_SCHEMA = "g string, idx int, mr int"

__all__ = ["merge_hll_batch", "read_hll_state", "hll_state_estimate"]


def _committed_epoch(state_dir: str) -> int:
    vs = _versions(state_dir)
    if not vs:
        return -1
    ep = os.path.join(state_dir, f"v{vs[-1]}", "_EPOCH")
    if not os.path.exists(ep):
        return -1
    with open(ep) as fh:
        return int(fh.read().strip())


def read_hll_state(spark: SparkSession, state_dir: str) -> DataFrame:
    vs = _versions(state_dir)
    if not vs:
        return spark.createDataFrame([], REG_SCHEMA)
    path = os.path.join(state_dir, f"v{vs[-1]}")
    if not any(n.endswith(".parquet") for n in os.listdir(path)):
        return spark.createDataFrame([], REG_SCHEMA)
    return spark.read.parquet(path).select("g", "idx", "mr")


def merge_hll_batch(
    batch: DataFrame,
    state_dir: str,
    epoch_id: int,
    group_col: str,
    id_col: str,
) -> dict:
    """Max-merge one micro-batch's registers into the persisted state.
    A replayed committed epoch is skipped (cost, not correctness —
    max-merge is idempotent)."""
    spark = batch.sparkSession
    os.makedirs(state_dir, exist_ok=True)
    if _committed_epoch(state_dir) >= epoch_id:
        return {"applied": False}
    bs = hll_registers(batch, group_col, id_col)
    cur = read_hll_state(spark, state_dir)
    merged = (
        cur.select("g", "idx", F.col("mr").alias("om"))
        .join(bs.select("g", "idx", F.col("mr").alias("nm")),
              ["g", "idx"], "outer")
        .select(
            "g", "idx",
            F.greatest(F.coalesce("om", F.lit(0)), F.coalesce("nm", F.lit(0)))
            .cast("int").alias("mr"),
        )
    )
    tmp = os.path.join(state_dir, f"_tmp_{uuid.uuid4().hex[:8]}")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
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


def hll_state_estimate(state: DataFrame, group_col: str) -> DataFrame:
    """(group, est_distinct) — the batch HLL read-out over the folded
    registers."""
    return hll_estimate(state).withColumnRenamed("g", group_col)
