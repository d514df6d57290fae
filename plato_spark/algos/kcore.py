"""K-core decomposition (coreness / shell index) — Montresor h-index method.

Reference: /root/reference/plato/algo/kcore/kcore.hpp:63-267
  - coreness init = degree; each round every ACTIVE vertex recomputes the
    h-index of its neighbors' current estimates (kcore.hpp:191-232: largest
    i such that >= i neighbors have estimate >= i, capped by own estimate);
    a decrease activates the vertex's neighbors; fixpoint = exact coreness.
  - the reference maintains an explicit active set (kcore.hpp:150-171,
    233-249: only vertices with a changed neighbor recompute) — mirrored
    here as a frontier semi-join, so late rounds touch only the long-tail
    vertices still converging instead of re-scanning the whole graph.
  - plato's sparse/dense broadcast switch (kcore.hpp:150-171) maps to the
    same frontier broadcast-vs-shuffle policy as wcc (dualmode.hpp:41-43).

Spark plan per superstep (all JVM-side, no window sort, no Python):
  1. targets = vertices with >=1 neighbor whose core changed last round
     (broadcast semi-join while the frontier is sparse).
  2. gather: edges into targets joined with the neighbor estimate nc,
     capped at the target's own core C (h <= C always, so capping first
     both preserves the answer — min(C, h_uncapped) == h_capped — and
     shrinks the value domain).
  3. histogram: groupBy(dst, capped nc) count — map-side combine collapses
     a 10^7-degree hub's messages to at most C distinct rows, so no
     unbounded collect_list row exists anywhere in the plan.
  4. h-index fold: sort the (nc, cnt) histogram desc and fold
     h = max over prefixes of min(nc, cumulative count) with a JVM
     `aggregate` — replaces the per-dst row_number window (a full sort
     shuffle of E rows per round in the old plan).

Monotone non-increasing estimates => the synchronous frontier iteration
converges to the identical fixpoint as full recomputation (a vertex whose
neighbors are all unchanged recomputes the same h it had).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# r6: layout-preserving truncation — exact-valued loop, plan metadata
# change cannot move any float reduce order (see ckpt_blocks docstring)
from plato_spark.engine.ckpt_blocks import (
    auto_loop_localCheckpoint as cheap_localCheckpoint,
)

from plato_spark.graph.edges import symmetrize
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_superstep_confs,
)

# plato's push threshold (dualmode.hpp:41-43), same policy as wcc.
PUSH_THRESHOLD = 0.05
# upper bound on broadcastable target-side rows (the frontier's summed
# degree bounds |targets|); above this the gather falls back to a shuffle
# join even when the frontier itself is tiny
TGT_BROADCAST_MAX = 2_000_000


def _h_from_histogram(col: str) -> F.Column:
    """h-index from a desc-sorted array<struct<nc,cnt>> histogram.

    For the desc-sorted histogram, after consuming prefix group g there are
    cum_g neighbors with estimate >= nc_g, so min(nc_g, cum_g) is a valid
    h candidate; the max over prefixes is exactly the h-index.
    """
    zero = F.struct(
        F.lit(0).cast("long").alias("cum"), F.lit(0).cast("long").alias("best")
    )
    return F.aggregate(
        col,
        zero,
        lambda acc, x: F.struct(
            (acc["cum"] + x["cnt"]).alias("cum"),
            F.greatest(
                acc["best"], F.least(x["nc"], acc["cum"] + x["cnt"])
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def kcore(
    edges: DataFrame, max_iters: int = 1000, metrics: list | None = None
) -> DataFrame:
    """Exact coreness per vertex over canonical undirected edges (src<dst).

    Returns (id, coreness: long). Pass ``metrics=[]`` to receive per-round
    dicts (frontier size, targets recomputed, seconds) for scale audits.
    """
    import time

    spark = edges.sparkSession
    sym0 = symmetrize(edges.select("src", "dst")).persist()
    n_sym = sym0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_sym)
    sym = sym0.repartition(shuffle_n, "src").persist()
    sym.count()
    sym0.unpersist()

    deg = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("long").alias("deg"))
        .persist()
    )
    n_vertices = deg.count()
    state = deg.select("id", F.col("deg").alias("core"))
    # round 0: everyone just "changed" (init = degree), so all recompute
    frontier = deg.select("id")
    n_front = n_vertices
    front_deg_sum = n_sym  # sum of all degrees = |sym|

    with scoped_superstep_confs(spark, shuffle_n):
        k = 0
        prev_cached = None
        while k < max_iters and n_front > 0:
            t0 = time.time()
            sparse = n_front < PUSH_THRESHOLD * n_vertices
            f_src = frontier.select(F.col("id").alias("src"))
            if sparse:
                f_src = F.broadcast(f_src)
            targets = (
                sym.join(f_src, "src")
                .select(F.col("dst").alias("id"))
                .distinct()
            )
            # target's own core rides along so the gather caps nc at C
            tgt = state.join(targets, "id").select(
                F.col("id").alias("dst"), F.col("core").alias("cap")
            )
            # |targets| <= sum of frontier degrees: a sparse frontier that
            # contains one 10^7-degree hub still fans out to 10^7 targets,
            # so the tgt broadcast is gated on the degree sum, not on
            # frontier row count (broadcasting f_src alone is always safe).
            if sparse and front_deg_sum < TGT_BROADCAST_MAX:
                tgt = F.broadcast(tgt)
            gathered = (
                sym.join(
                    state.select(
                        F.col("id").alias("src"), F.col("core").alias("nc")
                    ),
                    "src",
                )
                .join(tgt, "dst")
                .select("dst", F.least("nc", "cap").alias("nc"))
            )
            hist = gathered.groupBy("dst", "nc").agg(
                F.count("*").cast("long").alias("cnt")
            )
            h = (
                hist.groupBy(F.col("dst").alias("id"))
                .agg(
                    F.sort_array(
                        F.collect_list(F.struct("nc", "cnt")), asc=False
                    ).alias("a")
                )
                .select("id", _h_from_histogram("a").alias("h"))
            )
            new_state = state.join(h, "id", "left").select(
                "id",
                F.least(F.col("core"), F.coalesce("h", F.col("core"))).alias("core"),
                (F.coalesce("h", F.col("core")) < F.col("core")).alias("chg"),
            )
            new_state = new_state.transform(cheap_localCheckpoint)
            frontier = new_state.where("chg").select("id")
            # one action for both frontier size and its degree sum (the
            # broadcast gate above); deg is cached so this is a cheap join
            fstat = frontier.join(deg, "id").agg(
                F.count("*").alias("n"), F.sum("deg").alias("ds")
            ).first()
            n_front = int(fstat["n"])
            front_deg_sum = int(fstat["ds"] or 0)
            new_state = new_state.drop("chg")
            if prev_cached is not None:
                try:
                    prev_cached.unpersist()
                except Exception:
                    pass
            prev_cached, state = state, new_state
            k += 1
            if metrics is not None:
                metrics.append(
                    {
                        "iter": k,
                        "frontier": n_front,
                        "sparse_push": sparse,
                        "sec": round(time.time() - t0, 3),
                    }
                )
    return state.select("id", F.col("core").cast("long").alias("coreness"))


def onion_layers(edges: DataFrame, max_rounds: int = 10_000) -> DataFrame:
    """(id, layer: long, core: long) — onion decomposition of the k-core
    peeling (Hebert-Dufresne/Grochow/Allard 2016): round r removes EVERY
    vertex whose remaining degree is <= k_r, where k_r is the running
    max of the minimum remaining degree.  ``core`` is the classic
    coreness (the peel threshold at removal — cross-checked against the
    h-index kcore() in tests), ``layer`` is the round index: the depth
    of the vertex inside its core, the structural "how far from the
    surface" signal core numbers flatten (all of a core's vertices share
    one core number; their layers order the peel).

    Branch-free batch formulation (mirrored verbatim in the unrolled SQL
    oracle): the min-degree vertex always satisfies deg <= k_r, so every
    round removes at least one vertex and the loop terminates in at most
    |V| rounds — 71 measured on the sf0.01 co-occurrence graph.  Rounds
    past emptiness are no-ops (empty min coalesces to the previous k),
    so the oracle's pinned round count is idempotent.

    Scale: each round is one degree recount restricted to the remaining
    vertex set (two co-partitioned semi-joins + a map-side-combined
    groupBy) and one scalar min — the same peel shape as ktruss re-peel;
    per-round state is localCheckpointed so the plan stays flat.  The
    layer count (not the vertex count) bounds the rounds, and real
    graphs peel in O(sqrt(E)) layers.
    """
    spark = edges.sparkSession
    sym0 = symmetrize(edges.select("src", "dst")).persist()
    n_sym = sym0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_sym)
    sym = sym0.repartition(shuffle_n, "src").persist()
    sym.count()
    sym0.unpersist()

    rem = cheap_localCheckpoint(sym.select(F.col("src").alias("id")).distinct())
    k = 0
    parts: list[DataFrame] = []
    r = 0
    with scoped_superstep_confs(spark, shuffle_n):
        while r < max_rounds:
            r += 1
            inner = (
                sym.join(rem.select(F.col("id").alias("dst")), "dst")
                .join(rem.select(F.col("id").alias("src")), "src")
                .groupBy(F.col("src").alias("id"))
                .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            )
            dg = cheap_localCheckpoint(
                rem.join(inner, "id", "left")
                .select("id", F.coalesce("cnt", F.lit(0)).cast("long").alias("dg"))
            )
            dmin = dg.agg(F.min("dg")).collect()[0][0]
            if dmin is None:  # remaining set empty: fully peeled
                break
            k = max(k, int(dmin))
            parts.append(
                dg.where(F.col("dg") <= k).select(
                    "id",
                    F.lit(r).cast("long").alias("layer"),
                    F.lit(k).cast("long").alias("core"),
                )
            )
            rem = cheap_localCheckpoint(dg.where(F.col("dg") > k).select("id"))
    sym.unpersist()
    if not parts:
        return spark.createDataFrame([], "id long, layer long, core long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
