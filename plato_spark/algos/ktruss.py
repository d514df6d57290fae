"""K-truss — edge-level cohesion: the maximal subgraph where every edge
closes >= k-2 triangles WITHIN the subgraph.

Beyond the reference menu (plato ships vertex-level k-core,
/root/reference/plato/algo/kcore/kcore.hpp; k-truss is its edge analog
and the standard next step for community-core extraction on link
graphs).

INCREMENTAL peel (the 100 TB shape): support is computed in full ONCE
(hub-capped common-neighbor pass), then maintained by decrement.
Per round:

  P            = alive edges with support < k-2
  dead tris    = DISTINCT triangles (a<b<c) that contain a P-edge,
                 enumerated only from the P-edges' endpoints against the
                 round-start adjacency (cost ∝ Σ deg(P endpoints), not E)
  new support  = support - #dead triangles through each surviving edge

The distinct-triangle step is what makes the decrement exact when two or
three edges of one triangle are peeled in the same round (the triangle
dies once, not twice). A triangle killed in round t is never re-counted
in round t+1 because enumeration runs against the round-start edge set,
which no longer contains earlier peeled edges. The fixpoint (maximal
k-truss) is unique, so the result is deterministic and SQL-oracle-
checkable with an unrolled peel (extra rounds beyond the fixpoint are
identity; value-matched at sf0.01 — at sf0.1 the 12-round unrolled
DuckDB peel is cost-prohibitive, so sf0.1 coverage is the measured
Spark fixpoint plus the fixture tests).

Hub discipline: both the initial pass and the per-round enumeration use
the consistent hash-segmented adjacency (segments fixed from the
original max degree, degrees only shrink), so a 10^7-degree hub never
materializes an unbounded collect_set row. Endpoint sets are broadcast
only below a row bound. Lineage is truncated per peel (localCheckpoint),
the same discipline as every other iterative loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.algos.triangles import (
    _segmented_undirected_adj,
    common_neighbors,
)
# r6: layout-preserving truncation — exact-valued loop, plan metadata
# change cannot move any float reduce order (see ckpt_blocks docstring)
from plato_spark.engine.ckpt_blocks import (
    auto_loop_checkpoint_tracked as checkpoint_tracked,
    free_blocks,
)
from plato_spark.graph.edges import symmetrize

ENDS_BROADCAST_MAX = 1_000_000
HUB_CAP_DEFAULT = 100_000
# decrement-vs-recompute crossover: a round peeling more than this
# fraction of the surviving edges rebuilds support from scratch instead
RECOMPUTE_FRAC = 0.2


def ktruss(
    canon: DataFrame,
    k: int = 5,
    max_iters: int = 100,
    metrics: list | None = None,
    hub_cap: int = 100_000,
) -> DataFrame:
    """(src, dst) — the edges of the maximal k-truss of ``canon``.

    canon: canonical undirected edge table (src < dst, unique).
    Pass ``metrics=[]`` to receive per-round dicts (peeled edges, dead
    triangles, damaged edges) — the evidence that round-2+ cost tracks
    the peeled set, not the full edge count.
    """
    if k < 3:
        raise ValueError("k-truss is defined for k >= 3")
    state, segments, state_ids = _init_support(canon, hub_cap)
    state, _, _ = _peel_phase(
        state, k - 2, segments, max_iters, metrics,
        hub_cap=hub_cap, state_ids=state_ids,
    )
    return state.select("src", "dst")


def _init_support(canon: DataFrame, hub_cap: int):
    """One full hub-capped support pass; returns (state[src,dst,support],
    segment count fixed from the ORIGINAL max degree — degrees only
    shrink during peeling, so this stays a valid bound — and the block
    ids backing the state checkpoint, for the peel loop to free once
    superseded)."""
    cur, cur_ids = checkpoint_tracked(canon.select("src", "dst"))
    sym0 = symmetrize(cur)
    max_deg = (
        sym0.groupBy("src").agg(F.count("*").alias("d")).agg(F.max("d")).first()[0]
        or 0
    )
    segments = int((max_deg + hub_cap - 1) // hub_cap) if max_deg else 1

    caches: list = []
    state, state_ids = checkpoint_tracked(
        common_neighbors(cur, as_count=True, hub_cap=hub_cap, caches=caches)
        .select("src", "dst", F.col("common_count").alias("support"))
    )
    for c in caches:  # state is materialized; drop the builder's caches
        try:
            c.unpersist()
        except Exception:
            pass
    free_blocks(state.sparkSession, cur_ids)  # cur only fed the init pass
    return state, segments, state_ids


def _peel_phase(
    state: DataFrame,
    need: int,
    segments: int,
    max_iters: int,
    metrics: list | None = None,
    collect_peeled: bool = False,
    hub_cap: int = HUB_CAP_DEFAULT,
    state_ids: set | None = None,
):
    """Peel edges with support < ``need`` to the fixpoint.  Returns
    (state_after, peeled_edges_df_or_None, state_after_block_ids).

    ``state_ids`` are the block-manager ids backing the INCOMING state
    checkpoint; each round frees the superseded state's (and its temps')
    blocks once the new state is materialized, so resident blocks stay
    O(1) across rounds instead of growing with round index (the measured
    sf0.1 anomaly: late 7-edge rounds cost ~70s under the accumulated
    block pressure where early 80k-edge rounds cost ~9s).

    Support maintenance is HYBRID: small peel batches decrement support
    via dead-triangle enumeration (cost ∝ peeled endpoints' adjacency);
    when a round peels more than ``RECOMPUTE_FRAC`` of the surviving
    edges (the first rounds of a high-k phase on a dense graph), the
    enumeration would touch most triangles anyway — possibly several
    times over — so support is instead recomputed from scratch on the
    survivor subgraph (one hub-capped mutual pass, the same cost as
    init but on a smaller graph).  Measured at sf0.1: phase k=6 first
    rounds peel ~40% of 900k alive edges; pure decrement ran >17 min,
    the recompute path finishes the round at init-pass cost (~30s).
    """
    import time

    spark = state.sparkSession
    state_ids = set(state_ids or ())
    peeled_parts: list[DataFrame] = []
    n_alive = state.count()
    for it in range(max_iters):
        t0 = time.time()
        peeled = state.where(F.col("support") < need).select("src", "dst")
        n_peel = peeled.count()
        if metrics is not None:
            metrics.append({"iter": it, "need": need, "peeled": n_peel})
        if n_peel == 0:
            break
        if collect_peeled:
            peeled_parts.append(peeled.localCheckpoint(eager=True))
        n_alive -= n_peel

        if n_peel > RECOMPUTE_FRAC * max(n_alive, 1):
            survivors = (
                state.join(peeled, ["src", "dst"], "left_anti")
                .select("src", "dst")
            )
            caches: list = []
            state, new_ids = checkpoint_tracked(
                common_neighbors(
                    survivors, as_count=True,
                    hub_cap=hub_cap, caches=caches,
                )
                .select(
                    "src", "dst", F.col("common_count").alias("support")
                )
            )
            for c in caches:
                try:
                    c.unpersist()
                except Exception:
                    pass
            free_blocks(spark, state_ids)  # old state superseded
            state_ids = new_ids
            if metrics is not None:
                metrics[-1]["mode"] = "recompute"
                metrics[-1]["sec"] = round(time.time() - t0, 3)
            continue
        if metrics is not None:
            metrics[-1]["mode"] = "decrement"

        # materialize the (tiny) peel set once: it feeds four joins below,
        # and a checkpointed RDD gives each a concrete, reusable input
        peeled, peeled_ids = checkpoint_tracked(peeled)
        t1 = time.time()
        small = 2 * n_peel <= ENDS_BROADCAST_MAX
        peeled_b = F.broadcast(peeled) if small else peeled

        alive = state.select("src", "dst")  # round-start edge set (incl. P)
        sym = symmetrize(alive)
        ends = (
            peeled.select(F.col("src").alias("id"))
            .unionByName(peeled.select(F.col("dst").alias("id")))
            .distinct()
        )
        if small:
            ends = F.broadcast(ends)
        # adjacency ONLY for peeled endpoints, consistently segmented so
        # N(u) ∩ N(v) = ∪_s N_s(u) ∩ N_s(v) distributes across hubs
        adj = _segmented_undirected_adj(
            sym.join(ends.withColumnRenamed("id", "src"), "src"), segments
        )
        a_u = adj.select(F.col("id").alias("src"), "salt", F.col("nbrs").alias("nu"))
        a_v = adj.select(F.col("id").alias("dst"), "salt", F.col("nbrs").alias("nv"))
        wit = (
            peeled_b.join(a_u, "src")
            .join(a_v, ["dst", "salt"])
            .select("src", "dst", F.explode(F.array_intersect("nu", "nv")).alias("w"))
        )
        # distinct dead triangles (a<b<c): dedupes the case where 2-3
        # edges of one triangle are peeled in the same round.  Checkpoint
        # eagerly: tri feeds THREE branches of the damage union — left
        # lazy, the whole adjacency+intersection pipeline above would be
        # re-evaluated once per branch (measured 3x round cost at sf0.1).
        tri = wit.select(
            F.least("src", "dst", "w").alias("a"),
            F.expr(
                "CAST(src AS BIGINT) + CAST(dst AS BIGINT) + CAST(w AS BIGINT)"
            ).alias("s"),
            F.greatest("src", "dst", "w").alias("c"),
        ).select(
            "a", (F.col("s") - F.col("a") - F.col("c")).alias("b"), "c"
        ).distinct()
        if metrics is not None and os.environ.get("KTRUSS_PROBE"):
            tp = time.time()
            n_pre = tri.count()  # evaluate WITHOUT checkpoint store
            metrics[-1]["probe_tri_count_sec"] = round(time.time() - tp, 3)
            metrics[-1]["probe_state_parts"] = state.rdd.getNumPartitions()
            metrics[-1]["probe_tri_rows"] = n_pre
        tri, tri_ids = checkpoint_tracked(tri)
        n_tri = tri.count()
        t2 = time.time()
        dmg = (
            tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
            .unionAll(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
            .join(peeled_b, ["src", "dst"], "left_anti")
            .groupBy("src", "dst")
            .agg(F.count("*").cast("long").alias("dead"))
        )
        if 3 * n_tri <= ENDS_BROADCAST_MAX:
            dmg = F.broadcast(dmg)
        state, new_ids = checkpoint_tracked(
            state.join(peeled_b, ["src", "dst"], "left_anti")
            .join(dmg, ["src", "dst"], "left")
            .select(
                "src",
                "dst",
                (F.col("support") - F.coalesce("dead", F.lit(0))).alias("support"),
            )
        )
        # new state is materialized: the old state, this round's dead-
        # triangle table, and (unless collected for the caller) the peel
        # set are all unreachable from here on — free their blocks now
        free_blocks(spark, state_ids | tri_ids | peeled_ids)
        state_ids = new_ids
        if metrics is not None:
            metrics[-1]["dead_triangles"] = n_tri
            metrics[-1]["sec"] = round(time.time() - t0, 3)
            metrics[-1]["sec_peel_ckpt"] = round(t1 - t0, 3)
            metrics[-1]["sec_tri"] = round(t2 - t1, 3)
            metrics[-1]["sec_state"] = round(time.time() - t2, 3)

    if not collect_peeled:
        return state, None, state_ids
    if not peeled_parts:
        return state, spark.createDataFrame([], "src long, dst long"), state_ids
    out = peeled_parts[0]
    for p in peeled_parts[1:]:
        out = out.unionByName(p)
    return state, out, state_ids


def truss_decomposition(
    canon: DataFrame,
    k_max: int = 6,
    max_iters: int = 100,
    metrics: list | None = None,
    hub_cap: int = 100_000,
) -> DataFrame:
    """(src, dst, trussness) — the truss number of every edge, capped at
    ``k_max``: trussness(e) = max k such that e belongs to the k-truss
    (every edge trivially belongs to the 2-truss, so isolated/triangle-free
    edges get 2); edges still alive after the ``k_max`` phase are reported
    as ``k_max`` (i.e. ">= k_max").

    The cap is the 100 TB-scale operating point: the k=3..k_max phases
    peel the long tail of low-cohesion edges cheaply (support is computed
    in FULL only once, then maintained by the same incremental decrement
    as :func:`ktruss` — per-phase cost tracks the peeled set), while an
    uncapped decomposition would spend its time distinguishing the
    innermost dense cores, which callers rarely need beyond "very dense".

    Phase invariant: edges peeled while enforcing the k-truss condition
    (support < k-2 to fixpoint) are in the (k-1)-truss but not the
    k-truss, so their trussness is exactly k-1.
    """
    if k_max < 3:
        raise ValueError("truss decomposition needs k_max >= 3")
    state, segments, state_ids = _init_support(canon, hub_cap)
    labeled: list[DataFrame] = []
    for k in range(3, k_max + 1):
        state, peeled, state_ids = _peel_phase(
            state, k - 2, segments, max_iters, metrics,
            collect_peeled=True, hub_cap=hub_cap, state_ids=state_ids,
        )
        labeled.append(
            peeled.select(
                "src", "dst", F.lit(k - 1).cast("int").alias("trussness")
            )
        )
        if state.limit(1).count() == 0:
            break
    labeled.append(
        state.select(
            "src", "dst", F.lit(k_max).cast("int").alias("trussness")
        )
    )
    out = labeled[0]
    for p in labeled[1:]:
        out = out.unionByName(p)
    return out
