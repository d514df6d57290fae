"""Per-superstep checkpointing with lineage + metrics manifests.

The reference has NO mid-run recovery — a failed plato job restarts from the
CSV load. The north rule requires better: every superstep persists
per-partition state plus a manifest carrying iteration metrics (messages
sent, delta norm, straggler indicators) and lineage, so a killed run resumes
mid-algorithm.

Layout (all under one checkpoint root):

    <root>/iter=<k>/state/        parquet, partitioned as the algorithm left it
    <root>/iter=<k>/manifest.json written AFTER the parquet commit (atomic
                                  tmp+rename) — its presence marks iter k
                                  complete; resume picks the max complete k.

Manifest fields: iteration, algorithm, messages_sent, delta_norm,
elapsed_sec, partitions (count), partition_rows (per-partition row counts —
the skew/straggler signal), lineage (parent iter path + params hash),
extra (algorithm-specific state such as plato's converged flag).

Checkpointing doubles as Spark lineage truncation (the canonical iterative-
plan pitfall): the state read back from parquet has a fresh one-node plan.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, root: str, algorithm: str, params: dict | None = None,
                 every: int = 1, collect_partition_rows: bool = True):
        self.root = root
        self.algorithm = algorithm
        self.params = params or {}
        self.every = max(1, int(every))
        self.collect_partition_rows = collect_partition_rows
        os.makedirs(root, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def _iter_dir(self, k: int) -> str:
        return os.path.join(self.root, f"iter={k}")

    def _state_dir(self, k: int) -> str:
        return os.path.join(self._iter_dir(k), "state")

    def _manifest_path(self, k: int) -> str:
        return os.path.join(self._iter_dir(k), "manifest.json")

    # -- write -----------------------------------------------------------
    def save(self, k: int, state: DataFrame, metrics: dict[str, Any]) -> DataFrame:
        """Persist state for iteration k; returns the re-read (lineage-free)
        state DataFrame. No-op (returns input) on off-cadence iterations."""
        if k % self.every != 0:
            return state
        t0 = time.time()
        state.write.mode("overwrite").parquet(self._state_dir(k))
        spark = state.sparkSession
        reread = spark.read.parquet(self._state_dir(k))
        partition_rows: list[int] = []
        if self.collect_partition_rows:
            rows = (
                reread.groupBy(F.spark_partition_id().alias("p"))
                .count().collect()
            )
            partition_rows = [int(r["count"]) for r in sorted(rows, key=lambda r: r["p"])]
        manifest = {
            "iteration": k,
            "algorithm": self.algorithm,
            "params": self.params,
            "elapsed_ckpt_sec": time.time() - t0,
            "partitions": len(partition_rows) or reread.rdd.getNumPartitions(),
            "partition_rows": partition_rows,
            "straggler_hint": (
                {"max_rows": max(partition_rows), "mean_rows":
                 sum(partition_rows) / len(partition_rows)}
                if partition_rows else None
            ),
            "lineage": {
                "parent": self._iter_dir(k - self.every) if k >= self.every else None,
                "state_path": self._state_dir(k),
            },
            **metrics,
        }
        tmp = self._manifest_path(k) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        os.replace(tmp, self._manifest_path(k))
        return reread

    # -- read ------------------------------------------------------------
    def complete_iterations(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            if not name.startswith("iter="):
                continue
            k = int(name.split("=", 1)[1])
            if os.path.exists(self._manifest_path(k)) and os.path.exists(
                os.path.join(self._state_dir(k), "_SUCCESS")
            ):
                out.append(k)
        return sorted(out)

    def latest(self) -> int | None:
        its = self.complete_iterations()
        return its[-1] if its else None

    def load(self, spark: SparkSession, k: int) -> tuple[DataFrame, dict]:
        with open(self._manifest_path(k)) as f:
            manifest = json.load(f)
        return spark.read.parquet(self._state_dir(k)), manifest
