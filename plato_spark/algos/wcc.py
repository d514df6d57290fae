"""Weakly-connected components — hash-min label propagation with frontier.

Reference: /root/reference/plato/algo/cgm/connected_component.hpp:174-245
  - labels init = vid; every superstep each ACTIVE vertex's label is offered
    to its neighbors; receivers keep the min (write_min); the next frontier
    is the set of vertices whose label changed; loop until frontier empty.
  - push/pull dual mode: plato broadcasts the frontier when
    active_edges/edges < 0.05 (/root/reference/plato/engine/dualmode.hpp:41-43,
    279-296), else pulls over all in-edges. Here the same policy becomes a
    broadcast-join vs shuffle-join choice on the frontier DataFrame.

Labels converge to the minimum vertex id of each weakly-connected component
(exact-match oracle, mirroring the reference test
/root/reference/plato/algo/cgm/test/test_cgm.cc:81-152).

Input is the CANONICAL undirected edge table (src < dst, unique); it is
symmetrized internally, matching plato's undirected edge doubling
(/root/reference/plato/graph/structure.hpp:1032-1033).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from plato_spark.engine.checkpoint import CheckpointManager
from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint
from plato_spark.engine.superstep import SuperstepDriver
from plato_spark.graph.edges import symmetrize
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
    scoped_superstep_confs,
)

# plato's push threshold: active_edges/edges < 0.05 (dualmode.hpp:41-43).
# We approximate active-edge volume with the frontier-vertex ratio; computing
# exact active out-degree would cost an extra join per superstep.
PUSH_THRESHOLD = 0.05


def connected_components(
    edges: DataFrame,
    max_iters: int = 100,
    ckpt: CheckpointManager | None = None,
    impl: str = "hashmin",
) -> DataFrame:
    """Returns (id: long, component: long) — component = min vid reachable.

    impl="hashmin": the reference's frontier loop — O(diameter) supersteps,
    optimal message volume on small-diameter graphs (social/co-occurrence).
    impl="jump": hash-min exchange + two pointer-jumping hops per superstep
    (label <- label[label], path doubling) — O(log diameter) supersteps.
    At 100TB the corpus graph contains long path-link chains (files chained
    per directory), where diameter ~ directory size makes plain hash-min
    unboundedly slow; jumping converges a 10^4-long chain in ~15 rounds.
    Both produce identical min-vid labels (equivalence-tested).
    """
    spark = edges.sparkSession
    edges = edges.select("src", "dst")
    # |sym| = 2|canon| by construction: size the loop off one cheap count
    # of the (typically already-cached) input instead of materializing the
    # symmetrized table twice (r6)
    n_sym = 2 * edges.count()
    shuffle_n = auto_shuffle_partitions(spark, n_sym)
    with scoped_superstep_confs(spark, shuffle_n):
        sym = symmetrize(edges).repartition(shuffle_n, "src").persist()
        sym.count()

        # distinct() already leaves the vertex table hash(id, shuffle_n)
        verts = sym.select(F.col("src").alias("id")).distinct()
        n_vertices = verts.count()

    state0 = verts.select("id", F.col("id").alias("label"), F.lit(True).alias("changed"))

    # round-(k-1) observation carrying |changed| so no round pays a
    # separate frontier-count job: the metric rides the checkpoint
    # materialization of the state the frontier is read from
    pending_obs: list = []

    def step(state: DataFrame, k: int):
        n_front = (int(pending_obs.pop().get["changed"])
                   if pending_obs else n_vertices)
        if n_front == 0:
            return state, {"converged": True, "messages_sent": 0, "frontier": 0}
        frontier = state.where("changed").select(
            F.col("id").alias("src"), F.col("label").alias("msg")
        )
        # push/pull policy: broadcast a sparse frontier (plato's push mode)
        if n_front < PUSH_THRESHOLD * n_vertices:
            frontier = F.broadcast(frontier)
        else:
            # dense round: frontier arrives hash(id->src, n), co-partitioned
            # with the cached sym — build the V-row hash, stream the edges
            frontier = frontier.hint("shuffle_hash")
        cands = (
            sym.join(frontier, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("msg").alias("cand"))
        )
        new_state = (
            state.join(cands.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("cand", F.col("label"))).alias("label"),
                (F.coalesce("cand", F.col("label")) < F.col("label")).alias("changed"),
            )
        )
        obs = Observation()
        new_state = new_state.observe(
            obs, F.sum(F.col("changed").cast("long")).alias("changed"))
        pending_obs.append(obs)
        return new_state, {
            "messages_sent": n_front,
            "frontier": n_front,
            "delta_norm": float(n_front),
            "converged": False,
        }

    def step_jump(state: DataFrame, k: int):
        # 1. one hash-min exchange (the reference superstep, frontier-free:
        #    jumping rewrites labels without messages, so the changed-set
        #    no longer bounds who must speak)
        msgs = (
            sym.join(
                state.select(F.col("id").alias("src"), F.col("label").alias("msg")),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("msg").alias("cand"))
        )
        s = state.join(msgs, "id", "left").select(
            "id",
            F.col("label").alias("old"),
            F.least(F.col("label"), F.coalesce("cand", F.col("label"))).alias("label"),
        )
        # 2. two pointer jumps: label <- label(label). Every label IS a
        #    vertex id, so the parent lookup is a self-join on the state
        #    table; labels only decrease (min-vid invariant), halving the
        #    distance-to-root each hop.
        for _ in range(2):
            parent = s.select(F.col("id").alias("label"), F.col("label").alias("plab"))
            s = s.join(parent, "label", "left").select(
                "id", "old",
                F.least(F.col("label"), F.coalesce("plab", F.col("label"))).alias("label"),
            )
        n_changed = s.where(F.col("label") < F.col("old")).count()
        new_state = s.select("id", "label", (F.col("label") < F.col("old")).alias("changed"))
        return new_state, {
            "messages_sent": n_sym,
            "frontier": n_changed,
            "delta_norm": float(n_changed),
            "converged": n_changed == 0,
        }

    driver = SuperstepDriver(ckpt=ckpt, max_iters=max_iters)
    with scoped_superstep_confs(spark, shuffle_n):
        final = driver.run(state0, step_jump if impl == "jump" else step)
        # sever the result's lineage from the internal edge cache, then
        # release it — no dead cached tables accumulating across queries
        final = cheap_localCheckpoint(
            final.select("id", F.col("label").alias("component"))
        )
    sym.unpersist()
    return final


def component_edges(
    edges: DataFrame, components: DataFrame, target: int | None = None
) -> DataFrame:
    """Edge-level component output: (component, src, dst) per canonical edge.

    Reference parity: connected_component.hpp:496-538 (write_all_edges,
    label,src,dst triples) and :388-467 (write_component — one target
    component's edges; target=None here keeps all, the reference's
    write_all_edges mode). At the fixpoint both endpoints share a label,
    so labeling by src alone is exact — one broadcast-or-shuffle join,
    no second label lookup.
    """
    lab = components.select(F.col("id").alias("src"), "component")
    out = (
        edges.select("src", "dst")
        .join(lab, "src")
        .select("component", "src", "dst")
    )
    if target is not None:
        out = out.where(F.col("component") == F.lit(target))
    return out


def major_component(components: DataFrame) -> int:
    """Label of the largest component (ties -> smallest label).

    The reference's default target for write_component is major_label_,
    computed during its stats pass (connected_component.hpp:247-341,
    408-415). Scalar aggregate — the collect is O(1) rows.
    """
    row = (
        components.groupBy("component")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .limit(1)
        .collect()[0]
    )
    return row["component"]


def wcc_trace(edges: DataFrame, rounds: int = 10) -> DataFrame:
    """(round, frontier, changed) — per-superstep convergence trace of the
    hash-min loop, the iteration metrics (messages sent / delta) the
    reference logs per epoch (connected_component.hpp:174-245 prints the
    active count each round; plato's watch-dog uses it to size the next
    exchange) exposed as a first-class, oracle-checkable table.

    frontier = vertices entering the round in the changed set (== the
    messages-sent upper bound the push/pull policy keys on); changed =
    vertices whose label strictly decreased during the round.  Exactly
    ``rounds`` rows are returned; after the fixpoint both columns are 0,
    so a pinned round count past the measured diameter is idempotent.

    Frontier-restricted messaging produces the SAME per-round label
    sequence as the full relabel chain (labels are monotone and every
    newly adopted label is offered exactly once, the round after
    adoption), so `changed` at round k equals the full chain's
    |{v : l_k(v) < l_{k-1}(v)}| — what the unrolled SQL oracle counts.
    """
    spark = edges.sparkSession
    sym0 = symmetrize(edges.select("src", "dst")).persist()
    n_sym = sym0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_sym)
    sym = sym0.repartition(shuffle_n, "src").persist()
    sym.count()
    sym0.unpersist()

    verts = (
        sym.select(F.col("src").alias("id")).distinct()
        .repartition(shuffle_n, "id")
    )
    n_vertices = verts.count()
    state = verts.select(
        "id", F.col("id").alias("label"), F.lit(True).alias("changed")
    )
    trace: list[tuple[int, int, int]] = []
    frontier_n = n_vertices
    for k in range(1, rounds + 1):
        if frontier_n == 0:
            trace.append((k, 0, 0))
            continue
        frontier = state.where("changed").select(
            F.col("id").alias("src"), F.col("label").alias("msg")
        )
        if frontier_n < PUSH_THRESHOLD * n_vertices:
            frontier = F.broadcast(frontier)
        cands = (
            sym.join(frontier, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("msg").alias("cand"))
        )
        state = (
            state.join(cands, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("cand", F.col("label"))).alias("label"),
                (F.coalesce("cand", F.col("label")) < F.col("label")).alias("changed"),
            )
        )
        state = cheap_localCheckpoint(state)
        changed_n = state.where("changed").count()
        trace.append((k, frontier_n, changed_n))
        frontier_n = changed_n
    sym.unpersist()
    return spark.createDataFrame(
        [(int(r), int(f), int(c)) for r, f, c in trace],
        "round BIGINT, frontier BIGINT, changed BIGINT",
    )
