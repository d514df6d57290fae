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
from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint
from plato_spark.engine.superstep import SuperstepDriver
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
    scoped_superstep_confs,
)


def label_propagation(
    edges: DataFrame,
    iterations: int = 20,
    ckpt: CheckpointManager | None = None,
    weight: str | None = None,
) -> DataFrame:
    """Returns (id: long, label: long).

    edges: directed (src, dst); votes flow src -> dst (dst counts labels of
    in-neighbors). For undirected semantics pass a symmetrized table.

    ``weight``: optional edge-weight column — each in-neighbor's vote
    counts its edge weight instead of 1 (the weighted-vote variant:
    heavily-evidenced links pull labels harder).  Weights are cast to
    exact int64 (co-occurrence counts here), so the (sum, smallest
    label) argmax stays a deterministic total order — a float vote sum
    would make tie membership partitioning-dependent.
    """
    spark = edges.sparkSession
    cols = ["src", "dst"] + ([weight] if weight else [])
    e0 = edges.select(*cols).persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_e)
    driver = SuperstepDriver(ckpt=ckpt, max_iters=iterations)
    with scoped_superstep_confs(spark, shuffle_n):
        e = e0.repartition(shuffle_n, "src").persist()
        n_edges = e.count()
        e0.unpersist()
        # vertex set as full_outer of the two endpoint aggregations: the
        # src side reads straight off the hash(src) cache (no exchange),
        # so only one <=V-rows-per-partition exchange instead of the
        # 2E-row distinct-union pass (r6)
        srcs = e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("_o"))
        dsts = e.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("_i"))
        verts = srcs.join(dsts, "id", "full_outer").select("id")

        state0 = verts.select("id", F.col("id").alias("label"))

        vote_w = (F.col(weight).cast("long") if weight
                  else F.lit(1).cast("long"))

        def step(state: DataFrame, k: int):
            votes = (
                e.join(state.select(F.col("id").alias("src"), "label")
                       .hint("shuffle_hash"), "src")
                .groupBy(F.col("dst").alias("id"), "label")
                .agg(F.sum(vote_w).alias("cnt"))
            )
            # argmax with smallest-label tie-break: max over (cnt, -label)
            winner = (
                votes.groupBy("id")
                .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m"))
                .select("id", (-F.col("m.neg")).alias("new_label"))
            )
            new_state = (
                state.join(winner.hint("shuffle_hash"), "id", "left")
                .select("id", F.coalesce("new_label", F.col("label")).alias("label"))
            )
            return new_state, {
                "messages_sent": n_edges,
                "converged": k + 1 >= iterations,
            }

        final = driver.run(state0, step)
        # sever the result's lineage from the internal edge cache, then
        # release it — no dead cached tables accumulating across queries
        final = cheap_localCheckpoint(final.select("id", "label"))
    e.unpersist()
    return final


def seeded_label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
) -> DataFrame:
    """Semi-supervised label SPREADING: a small seed set carries fixed
    labels; every other vertex iteratively adopts the most frequent label
    among its already-labeled in-neighbors (smallest label on ties, same
    deterministic vote as :func:`label_propagation`).  Seeds are CLAMPED —
    they never change — and unlabeled vertices with no labeled neighbor
    stay unlabeled (returned label -1).

    The node-classification workhorse of an entity/link pipeline
    (spam/quality/topic propagation from a trusted seed set).  Beyond the
    reference menu, but built from the same vote kernel as lpa.hpp with
    one extra clamp column; per superstep it ships only per-(dst,label)
    partial counts (map-side combined) and labels reach at most
    ``iterations`` hops from any seed, so cost is bounded by the labeled
    frontier, not the graph.

    Returns (id: long, label: long; -1 = unreached).
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

    state = verts.join(
        seeds.select("id", F.col("label").alias("seed")), "id", "left"
    ).select("id", "seed", F.col("seed").alias("label"))

    with scoped_shuffle_partitions(spark, shuffle_n):
        for _ in range(iterations):
            votes = (
                e.join(
                    state.where(F.col("label").isNotNull())
                    .select(F.col("id").alias("src"), "label"),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"), "label")
                .agg(F.count("*").alias("cnt"))
            )
            winner = (
                votes.groupBy("id")
                .agg(F.max(F.struct(F.col("cnt"),
                                    (-F.col("label")).alias("neg"))).alias("m"))
                .select("id", (-F.col("m.neg")).alias("new_label"))
            )
            state = (
                state.join(winner, "id", "left")
                .select(
                    "id", "seed",
                    F.coalesce("seed", "new_label", "label").alias("label"),
                )
                .transform(cheap_localCheckpoint)
            )
    e.unpersist()
    return state.select(
        "id", F.coalesce("label", F.lit(-1)).cast("long").alias("label")
    )
