"""PageRank — power iteration with plato-exact semantics.

Reference: /root/reference/plato/algo/pagerank/pagerank.hpp
  - opts (39-46): iterations<=100, damping 0.85, eps (0 disables early stop)
  - init (90-98): rank=1.0, pre-divided by out-degree when odeg>0
  - loop (100-146): pull-sum of in-neighbor states; rank' = (1-d) + d*sum
    (UNNORMALIZED, N-scaled form: sums to ~N, dangling mass decays);
    delta = sum_v |rank'-rank| (the reference computes |s'-s|*odeg on the
    divided state s = rank/odeg, identical quantity);
    when delta < eps the loop schedules exactly ONE more epoch (sets
    epoch_i = iteration_-2) whose result — left undivided — is returned.
Weighted variant: /root/reference/plato/algo/pagerank/weighted_pagerank.hpp:83-128
  - no degree pre-division; contribution = rank_u * w(u,v)/sum_out_w(u).

Two physical strategies, equivalence-tested against each other:

impl='join'  pure DataFrame: contribs = edges JOIN state ON src (edges cached
             hash-partitioned on src, so the join is co-partitioned and only
             the groupBy(dst) shuffles — one exchange per superstep, with
             map-side partial aggregation standing in for plato's
             receiver-side write_add combiners).
impl='spmv'  grouped-CSR blocks + route table + cogrouped pandas-UDF SpMV
             (graph/csr.py) — the north-star layout; hub sources are
             replicated at most once per block regardless of out-degree.

Both run the same driver loop with per-superstep checkpoint/resume
(engine/checkpoint.py) and lineage truncation.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint, loop_localCheckpoint

from plato_spark.engine.checkpoint import CheckpointManager
from plato_spark.graph.csr import build_csr_blocks, build_route, spmv_gather
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    degree_weighted_ranges,
    scoped_shuffle_partitions,
    scoped_superstep_confs,
)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    eps: float = 1e-6,
    max_iters: int = 100,
    impl: str = "join",
    weight: str | None = None,
    num_blocks: int | None = None,
    ckpt: CheckpointManager | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Returns (id: long, rank: double) for every vertex in ``edges``.

    edges: directed (src, dst[, weight]) — for undirected graphs pass the
    symmetrized table (graph.edges.symmetrize).
    """
    spark = edges.sparkSession
    edges0 = edges.persist()
    n_edges_pre = edges0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_edges_pre)

    # --- physical gather strategy ---------------------------------------
    if impl == "spmv":
        edges = edges0.repartition(shuffle_n, "src").persist()
        if weight is None:
            div = edges.groupBy(F.col("src").alias("id")).agg(
                F.count("*").alias("wsum"))
        else:
            div = edges.groupBy(F.col("src").alias("id")).agg(
                F.sum(weight).alias("wsum"))
        verts = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        base = (
            verts.join(div, "id", "left")
            .select("id", F.coalesce("wsum", F.lit(0.0)).cast("double").alias("wsum"))
            .repartition(shuffle_n, "id")
            .persist()
        )
        n_edges = edges.count()
        edges0.unpersist()
        base.count()
        if num_blocks is None:
            num_blocks = min(shuffle_n, 64)
        max_id = edges.agg(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0]
        ideg = edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("deg"))
        boundaries = degree_weighted_ranges(ideg, num_blocks, max_id)
        # pre-partition the CSR blocks by their cogroup key so the (large)
        # adjacency arrays are NOT re-shuffled every superstep — only the
        # small per-iteration message table moves
        csr = (
            build_csr_blocks(edges, boundaries, weight=weight)
            .repartition(shuffle_n, "block")
            .persist()
        )
        route = build_route(edges, boundaries).repartition(shuffle_n, "src").persist()
        msgs_per_step = route.count()
        csr.count()

        def gather(contribs: DataFrame) -> DataFrame:
            return spmv_gather(csr, route, contribs, "contrib",
                               weighted=weight is not None).withColumnRenamed(
                "gathered", "g")
    elif impl == "join":
        # ONE hash-partitioned cached copy of the edges (r6: the former
        # second `edges` copy existed only to derive degrees/vertices,
        # which the two aggregations below read straight off edge_val;
        # the distinct-union vertex pass is replaced by the dst-side
        # aggregation — full_outer(div, dsts) IS the vertex set).
        if weight is None:
            edge_val = edges0.select("src", "dst")
        else:
            edge_val = edges0.select(
                "src", "dst", F.col(weight).cast("double").alias("w"))
        edge_val = edge_val.repartition(shuffle_n, "src").persist()
        n_edges = edge_val.count()
        edges0.unpersist()
        msgs_per_step = n_edges
        if weight is None:
            div = edge_val.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).cast("double").alias("wsum"))
        else:
            div = edge_val.groupBy(F.col("src").alias("id")).agg(
                F.sum("w").alias("wsum"))
        dsts = edge_val.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("_indeg"))
        base = (
            div.join(dsts, "id", "full_outer")
            .select("id", F.coalesce(F.col("wsum").cast("double"), F.lit(0.0))
                    .alias("wsum"))
            .persist()
        )
        # NOTE: base is materialized inside the superstep conf scope below
        # so its exchanges run at shuffle_n and its layout (hash(id,
        # shuffle_n)) matches every in-loop join.

        gsum = (F.sum("contrib") if weight is None
                else F.sum(F.col("contrib") * F.col("w")))

        def gather(contribs: DataFrame) -> DataFrame:
            # build side = the V-row contrib table (hint), never the
            # cached E-row edge table; both sides arrive hash(src, n) so
            # the join is exchange-free
            return (
                edge_val.join(
                    contribs.select(F.col("id").alias("src"), "contrib")
                    .hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(gsum.alias("g"))
            )
    else:
        raise ValueError(f"unknown impl {impl!r}")

    # --- state init: rank=1.0 (pagerank.hpp:90-98) ------------------------
    state = base.select("id", "wsum", F.lit(1.0).alias("rank"))
    start_iter, last_epoch = 0, False
    if ckpt is not None:
        latest = ckpt.latest()
        if latest is not None:
            st, manifest = ckpt.load(spark, latest)
            if manifest.get("finished"):
                return st.select("id", "rank")
            state = st
            start_iter = latest + 1
            last_epoch = bool(manifest.get("last_epoch_next"))

    # contribution divides by wsum EXCEPT for the unweighted dangling case
    # (odeg==0 keeps undivided rank; never gathered anyway) and the weighted
    # variant which always divides (weighted_pagerank.hpp:121 — wsum>0 for
    # any vertex with out-edges).
    def contrib_state(st: DataFrame) -> DataFrame:
        return st.select(
            "id",
            F.when(F.col("wsum") > 0, F.col("rank") / F.col("wsum"))
            .otherwise(F.col("rank"))
            .alias("contrib"),
        )

    k = start_iter
    with scoped_superstep_confs(spark, shuffle_n):
        if impl == "join":
            # materialize base under the loop confs so its exchanges run
            # at shuffle_n and its layout matches every in-loop join
            base.count()
        state, k = _pagerank_loop(
            spark, state, k, max_iters, last_epoch, damping, eps, gather,
            contrib_state, ckpt, stats, msgs_per_step, n_edges,
        )
    return state.select("id", "rank")


def _pagerank_loop(spark, state, k, max_iters, last_epoch, damping, eps,
                   gather, contrib_state, ckpt, stats, msgs_per_step, n_edges):
    while k < max_iters:
        t0 = time.time()
        g = gather(contrib_state(state))
        rank_new = (F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("g", F.lit(0.0)))
        new_state = (
            # build side = the V-row gathered table (hint), co-partitioned
            # with state on id: exchange-free left join
            state.join(g.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                "wsum",
                rank_new.alias("rank"),
                F.abs(rank_new - F.col("rank")).alias("adelta"),
            )
        )
        is_final = last_epoch or (k == max_iters - 1)
        if ckpt is None:
            # one driver action per superstep: the L1 delta rides the
            # checkpoint job as an observed metric (CollectMetrics)
            # instead of a second agg pass over the materialized state
            obs = Observation()
            new_state = new_state.observe(obs, F.sum("adelta").alias("d"))
            new_state = loop_localCheckpoint(new_state.drop("adelta"), k)
            delta = obs.get["d"]
        else:
            delta = new_state.agg(F.sum("adelta")).collect()[0][0]
            new_state = new_state.drop("adelta")
        if ckpt is not None:
            new_state = ckpt.save(
                k,
                new_state,
                {
                    "delta_norm": delta,
                    "messages_sent": msgs_per_step,
                    "superstep_sec": time.time() - t0,
                    "last_epoch_next": bool(eps > 0.0 and delta < eps),
                    # finished == CONVERGED (post-convergence epoch done).
                    # Exhausting max_iters is NOT finished: a resume with a
                    # larger budget must continue from here.
                    "finished": bool(last_epoch),
                },
            )
        state = new_state
        if stats is not None:
            stats.setdefault("superstep_secs", []).append(time.time() - t0)
            stats.setdefault("deltas", []).append(delta)
            stats["iterations"] = k + 1
            stats["messages_per_step"] = msgs_per_step
            stats["edges"] = n_edges
        if is_final:
            break
        if eps > 0.0 and delta < eps:
            last_epoch = True  # one extra epoch, pagerank.hpp:136
        k += 1

    return state, k


def personalized_pagerank(
    edges: DataFrame,
    sources: list[int],
    damping: float = 0.85,
    iterations: int = 10,
    weight: str | None = None,
) -> DataFrame:
    """Random walk with restart: rank' = (1-d)*s + d * pull-sum, where
    s_v = 1.0 for ``sources`` else 0 (r0 = s). Fixed iteration count —
    the personalization analog of the reference's pagerank loop
    (/root/reference/plato/algo/pagerank/pagerank.hpp:100-146 with the
    teleport mass restricted to the source set). Returns (id, rank).

    Plan shape matches pagerank(impl='join'): edges cached hash-partitioned
    on src, one map-side-combined groupBy(dst) exchange per superstep,
    lineage truncated every iteration.
    """
    spark = edges.sparkSession
    e0 = edges.persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_e)
    if weight is None:
        ev = e0.select("src", "dst", F.lit(1.0).alias("w"))
    else:
        ev = e0.select("src", "dst", F.col(weight).cast("double").alias("w"))
    ev = ev.repartition(shuffle_n, "src").persist()
    ev.count()
    e0.unpersist()

    div = ev.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("wsum"))
    verts = (
        ev.select(F.col("src").alias("id"))
        .unionByName(ev.select(F.col("dst").alias("id")))
        .distinct()
    )
    src_set = {int(s) for s in sources}
    is_src = F.col("id").isin(src_set)
    base = (
        verts.join(div, "id", "left")
        .select(
            "id",
            F.coalesce("wsum", F.lit(0.0)).cast("double").alias("wsum"),
            F.when(is_src, F.lit(1.0)).otherwise(F.lit(0.0)).alias("s"),
        )
        .repartition(shuffle_n, "id")
        .persist()
    )
    base.count()

    state = base.select("id", "wsum", "s", F.col("s").alias("rank"))
    with scoped_shuffle_partitions(spark, shuffle_n):
        for _ in range(iterations):
            contribs = state.select(
                F.col("id").alias("src"),
                F.when(F.col("wsum") > 0, F.col("rank") / F.col("wsum"))
                .otherwise(F.col("rank"))
                .alias("contrib"),
            )
            g = (
                ev.join(contribs, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("contrib") * F.col("w")).alias("g"))
            )
            state = (
                state.join(g, "id", "left")
                .select(
                    "id", "wsum", "s",
                    (F.lit(1.0 - damping) * F.col("s")
                     + F.lit(damping) * F.coalesce("g", F.lit(0.0))).alias("rank"),
                )
                .transform(cheap_localCheckpoint)
            )
    return state.select("id", "rank")


def pagerank_trace(edges: DataFrame, damping: float = 0.85,
                   rounds: int = 10) -> DataFrame:
    """(round, changed, max_delta) — per-superstep convergence trace of
    the power iteration: the epoch metrics plato prints per round
    (pagerank.hpp:100-146 logs the L1 delta each epoch; the watch-dog
    sizes the next exchange off it) promoted to a first-class,
    oracle-checkable table — the wcc_trace sibling for the float
    fixpoint family.

    Cross-engine float discipline: both metrics derive from the
    6dp-PRE-ROUNDED rank vectors (the registered pagerank gate proves
    round(rank, 6) agrees between engines at every pinned superstep
    count), so ``changed`` = |{v : round(r_k) != round(r_{k-1})}| is an
    exact integer and ``max_delta`` = max_v round(|round(r_k) -
    round(r_{k-1})|, 6) is a max — order-independent — over
    cross-engine-identical IEEE subtractions.  A raw L1 SUM of deltas
    would be accumulation-order-sensitive and is deliberately NOT
    emitted (the value_outliers / degree_gini lesson).

    One shuffle join + one map-side-combined aggregation per superstep
    plus ONE scalar action collecting both metrics; per-round state is
    stats-less-localCheckpointed (the ktruss re-peel plan shape), so
    the plan never compounds across rounds.  Exactly ``rounds`` rows;
    after numeric convergence trailing rows report (0, 0.0).
    """
    spark = edges.sparkSession
    e0 = edges.select("src", "dst").persist()
    n_edges = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_edges)
    e = e0.repartition(shuffle_n, "src").persist()
    e.count()
    e0.unpersist()

    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(shuffle_n, "id")
        .persist()
    )
    verts.count()

    state = verts.select("id", F.lit(1.0).alias("rank"))
    state = cheap_localCheckpoint(state)
    trace: list[tuple[int, int, float]] = []
    for k in range(1, rounds + 1):
        contribs = (
            state.join(deg, "id")
            .select(F.col("id").alias("src"),
                    (F.col("rank") / F.col("deg")).alias("contrib"))
        )
        g = (
            e.join(contribs, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("contrib").alias("g"))
        )
        new_state = (
            verts.join(g, "id", "left")
            .select(
                "id",
                (F.lit(1.0 - damping)
                 + F.lit(damping) * F.coalesce("g", F.lit(0.0))).alias("rank"),
            )
        )
        new_state = cheap_localCheckpoint(new_state)
        r_old = F.round(F.col("o.rank"), 6)
        r_new = F.round(F.col("n.rank"), 6)
        m = (
            state.alias("o").join(new_state.alias("n"), "id")
            .agg(
                F.sum(F.when(r_new != r_old, 1).otherwise(0))
                .cast("long").alias("changed"),
                F.round(F.max(F.round(F.abs(r_new - r_old), 6)), 6)
                .alias("max_delta"),
            )
            .collect()[0]
        )
        trace.append((k, int(m["changed"]), float(m["max_delta"])))
        state = new_state
    e.unpersist()
    verts.unpersist()
    return spark.createDataFrame(
        trace, "round BIGINT, changed BIGINT, max_delta DOUBLE"
    )
