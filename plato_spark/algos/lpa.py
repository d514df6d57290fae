"""Label propagation (community detection) — synchronous max-frequency vote.

Reference: /root/reference/plato/algo/lpa/lpa.hpp
  - opts (39-41): fixed iteration count, default 20; no early convergence.
  - init (84-100): label = vid.
  - vote (102-137): synchronous — every vertex counts the labels of its
    IN-neighbors from the PREVIOUS iteration's snapshot and adopts the most
    frequent; vertices without in-neighbors keep their label.
  - tie-break (134-137): the reference picks uniformly at random among
    maximal labels (std::mt19937 seeded by time — non-reproducible). We pin
    the SMALLEST label instead so results are deterministic and
    oracle-checkable (documented divergence, see FIXTURES.md §4).

Spark plan per superstep: labels JOIN edges ON src (co-partitioned) ->
groupBy(dst, label).count (map-side combined) -> argmax via
max(struct(cnt, -label)) — one aggregation, no window sort. The reference
allgathers the full label array to every node each round
(lpa.hpp:142-170 / allgather_state); we instead ship only the per-(dst,label)
partial counts, which is strictly less traffic at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.checkpoint import CheckpointManager
from plato_spark.engine.superstep import SuperstepDriver
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)


def label_propagation(
    edges: DataFrame,
    iterations: int = 20,
    ckpt: CheckpointManager | None = None,
) -> DataFrame:
    """Returns (id: long, label: long).

    edges: directed (src, dst); votes flow src -> dst (dst counts labels of
    in-neighbors). For undirected semantics pass a symmetrized table.
    """
    spark = edges.sparkSession
    e0 = edges.select("src", "dst").persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_e)
    e = e0.repartition(shuffle_n, "src").persist()
    e.count()
    e0.unpersist()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(shuffle_n, "id")
    )
    n_edges = e.count()

    state0 = verts.select("id", F.col("id").alias("label"))

    def step(state: DataFrame, k: int):
        votes = (
            e.join(state.select(F.col("id").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        # argmax with smallest-label tie-break: max over (cnt, -label)
        winner = (
            votes.groupBy("id")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m"))
            .select("id", (-F.col("m.neg")).alias("new_label"))
        )
        new_state = (
            state.join(winner, "id", "left")
            .select("id", F.coalesce("new_label", F.col("label")).alias("label"))
        )
        return new_state, {
            "messages_sent": n_edges,
            "converged": k + 1 >= iterations,
        }

    driver = SuperstepDriver(ckpt=ckpt, max_iters=iterations)
    with scoped_shuffle_partitions(spark, shuffle_n):
        final = driver.run(state0, step)
    return final.select("id", "label")
