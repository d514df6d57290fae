"""Generic BSP superstep driver.

Plato's engines (dualmode_engine_t, /root/reference/plato/engine/dualmode.hpp:75-166)
run a driver loop of supersteps where each step is a message exchange + state
update, with a push/pull mode decision per step
(dualmode.hpp:41-43,244-296: push when active_edges/edges < 0.05).

Here the loop is driver-side Python; each superstep is a DataFrame plan.
The driver owns the three cross-iteration concerns Catalyst cannot see:

  1. lineage truncation (localCheckpoint or parquet checkpoint each step)
  2. persistence discipline (cache new state, unpersist old)
  3. checkpoint/resume via CheckpointManager

``SuperstepDriver.run`` takes a ``step_fn(state, k) -> (new_state, metrics)``
and iterates until ``metrics['converged']`` or max_iters; it is used by the
frontier-style algorithms (wcc, lpa, bfs, kcore). PageRank keeps its own
specialized loop (algos/pagerank.py) because its convergence protocol —
detect delta<eps then run one extra epoch, pagerank.hpp:117-136 — is baked
into the reference semantics we must reproduce.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame

from plato_spark.engine.checkpoint import CheckpointManager
from plato_spark.engine.ckpt_blocks import free_blocks, loop_checkpoint_tracked

StepFn = Callable[[DataFrame, int], tuple[DataFrame, dict]]


class SuperstepDriver:
    def __init__(
        self,
        ckpt: CheckpointManager | None = None,
        max_iters: int = 100,
        lineage_truncate_every: int = 1,
    ):
        self.ckpt = ckpt
        self.max_iters = max_iters
        self.lineage_truncate_every = max(1, lineage_truncate_every)
        self.history: list[dict] = []

    def run(self, state0: DataFrame, step_fn: StepFn, start_iter: int = 0) -> DataFrame:
        state = state0
        k = start_iter
        # resume: adopt the newest complete checkpoint if present
        if self.ckpt is not None:
            latest = self.ckpt.latest()
            if latest is not None and latest >= start_iter:
                state, manifest = self.ckpt.load(state0.sparkSession, latest)
                if manifest.get("converged"):
                    return state
                k = latest + 1
        # block ids backing the newest live checkpoint: freed only once a
        # NEWER checkpoint (or a parquet save) materializes, because any
        # un-truncated states in between still read from those blocks
        prev_ids: set[int] = set()
        while k < self.max_iters:
            t0 = time.time()
            new_state, metrics = step_fn(state, k)
            if self.ckpt is not None:
                new_state = self.ckpt.save(
                    k, new_state, {**metrics, "superstep_sec": time.time() - t0}
                )
                free_blocks(new_state.sparkSession, prev_ids)
                prev_ids = set()
            elif k % self.lineage_truncate_every == 0:
                # layout-preserving truncation (r6): the checkpointed
                # state keeps its hash partitioning so next round's joins
                # are exchange-free; stats reset every 8 rounds caps the
                # join-multiplied sizeInBytes digit growth
                new_state, new_ids = loop_checkpoint_tracked(new_state, k)
                free_blocks(new_state.sparkSession, prev_ids)
                prev_ids = new_ids
            metrics = {**metrics, "iteration": k, "superstep_sec": time.time() - t0}
            self.history.append(metrics)
            state = new_state
            k += 1
            if metrics.get("converged"):
                break
        return state
