"""Weight-threshold percolation sweep — connectivity vs edge strength.

The bond-percolation view of a weighted graph: repeatedly discard edges
below a strength threshold and watch the component structure break up —
the standard robustness/backbone analysis (how much co-occurrence
evidence is needed before the graph stays connected?).  One hash-min WCC
(algos/wcc, the reference's connected-components semantics,
/root/reference/plato/algo/cgm) per threshold over the SHRINKING edge
set; each sweep point reports exact integer stats:

    (threshold, n_vertices, n_edges, n_components, largest)

where ``largest`` is the giant component's vertex count.  Thresholds are
compared as ``weight >= t`` on the exact co-occurrence counts, so the
sweep is deterministic and SQL-oracle-checkable (the oracle unrolls one
hash-min chain per threshold).

Scale: each threshold is one WCC over a strictly smaller edge set —
sparser graphs may have LARGER diameter (hash-min rounds grow as the
giant component thins), which is a property the oracle's pinned round
count must cover; measure before pinning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.algos.wcc import connected_components
from plato_spark.graph.edges import symmetrize

__all__ = ["percolation_sweep", "hub_removal_sweep",
           "random_removal_sweep"]


def percolation_sweep(
    edges_canon_weighted: DataFrame, thresholds: tuple = (1, 2, 3, 5)
) -> DataFrame:
    """One row per threshold over the canonical weighted edge table."""
    spark = edges_canon_weighted.sparkSession
    rows = []
    for t in thresholds:
        sub = edges_canon_weighted.where(F.col("weight") >= t).select(
            "src", "dst"
        )
        m = sub.count()
        if m == 0:
            rows.append((int(t), 0, 0, 0, 0))
            continue
        # connected_components symmetrizes internally; passing the
        # canonical set avoids doubling every edge in the WCC shuffle.
        labels = connected_components(sub)
        sizes = labels.groupBy("component").agg(F.count("*").alias("sz"))
        agg = sizes.agg(
            F.count("*").alias("nc"),
            F.sum("sz").alias("nv"),
            F.max("sz").alias("mx"),
        ).collect()[0]
        rows.append((int(t), int(agg["nv"]), int(m),
                     int(agg["nc"]), int(agg["mx"])))
    return spark.createDataFrame(
        rows,
        "threshold int, n_vertices long, n_edges long, "
        "n_components long, largest long",
    )


def hub_removal_sweep(
    edges_canon: DataFrame, ks: tuple = (0, 10, 50, 200)
) -> DataFrame:
    """(removed, n_vertices, n_edges, n_components, largest) — the
    Albert-Jeong-Barabási targeted-attack tolerance curve: delete the
    top-k degree hubs and watch the giant component degrade.  The
    infrastructure-planning twin of the weight-threshold sweep above
    (percolation removes weak EDGES; this removes strong VERTICES):
    a graph whose giant component survives hub removal can be
    partitioned hub-agnostically, one that shatters cannot.

    Hub set per k = TakeOrdered top-k under the (deg DESC, id ASC)
    total order on the symmetrized degree table — deterministic, so the
    sweep is SQL-oracle-checkable.  One hash-min WCC per k over the
    SHRINKING edge set; remaining isolated vertices (degree>0 before
    removal, all neighbors removed) drop out of the WCC vertex set, so
    n_vertices counts only vertices with a surviving edge — the same
    accounting as percolation_sweep.  Scale note (as above): hub
    removal can GROW the diameter; the oracle's pinned round count is
    measured past the largest per-k fixpoint.
    """
    return _removal_sweep(
        edges_canon, ks,
        lambda deg, k: deg.orderBy(F.desc("deg"), F.asc("id")).limit(int(k)),
    )


def random_removal_sweep(
    edges_canon: DataFrame, ks: tuple = (0, 10, 50, 200)
) -> DataFrame:
    """(removed, n_vertices, n_edges, n_components, largest) — the
    RANDOM-failure twin of hub_removal_sweep: delete k uniformly-chosen
    vertices and watch the giant component (barely) degrade.  The
    Albert-Jeong-Barabási result is the PAIR: scale-free graphs are
    robust to random failure and fragile to targeted attack — one curve
    alone proves nothing, the gap between the two is the finding.

    "Random" is the deterministic engine-portable kind: vertices ranked
    by portable_h1('rr|' || id) (ties by id), the k smallest removed —
    a degree-blind uniform pick both engines replay exactly (the
    stratified_sample policy).  Same shrinking-edge-set WCC sweep and
    accounting as the hub variant."""
    from plato_spark.functions.text import portable_h1

    def pick(deg, k):
        h = portable_h1(F.concat(F.lit("rr|"), F.col("id").cast("string")))
        return (deg.select("id", h.alias("h"))
                .orderBy("h", "id").limit(int(k)))

    return _removal_sweep(edges_canon, ks, pick)


def _removal_sweep(edges_canon: DataFrame, ks: tuple, pick) -> DataFrame:
    """Shared vertex-removal sweep: ``pick(deg, k)`` returns the k
    vertices to delete; one hash-min WCC per k over the shrinking
    edge set."""
    spark = edges_canon.sparkSession
    canon = edges_canon.select("src", "dst").persist()
    deg = (
        symmetrize(canon)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .persist()
    )
    deg.count()
    rows = []
    for k in ks:
        if k == 0:
            sub = canon
        else:
            hub_ids = F.broadcast(pick(deg, k).select("id"))
            sub = canon.join(
                hub_ids.withColumnRenamed("id", "src"), "src", "anti"
            ).join(hub_ids.withColumnRenamed("id", "dst"), "dst", "anti")
        m = sub.count()
        if m == 0:
            rows.append((int(k), 0, 0, 0, 0))
            continue
        # connected_components symmetrizes internally; passing the
        # canonical set avoids doubling every edge in the WCC shuffle.
        labels = connected_components(sub)
        sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
        agg = sizes.agg(
            F.count(F.lit(1)).alias("nc"),
            F.sum("sz").alias("nv"),
            F.max("sz").alias("mx"),
        ).collect()[0]
        rows.append((int(k), int(agg["nv"]), int(m),
                     int(agg["nc"]), int(agg["mx"])))
    canon.unpersist()
    deg.unpersist()
    return spark.createDataFrame(
        rows,
        "removed int, n_vertices long, n_edges long, "
        "n_components long, largest long",
    )


def bond_percolation_sweep(
    edges_canon: DataFrame, ps: tuple = (25, 50, 75)
) -> DataFrame:
    """(p_pct, n_vertices, n_edges, n_components, largest) — the EDGE-
    failure member of the robustness family (weight-threshold sweep =
    evidence backbone, hub/random removal = vertex failure): keep each
    edge independently with probability p, watch the giant component
    emerge/collapse around the percolation threshold.  "Random" is the
    engine-portable deterministic kind — edge (u,v) survives at level p
    iff portable_h1('bond|u:v') % 100 < p, so the survivor sets are
    NESTED across sweep points (the standard coupled-percolation
    construction) and both engines replay them exactly.  One hash-min
    WCC per p; sub-critical levels have many small components and the
    near-critical level the largest diameter — pin oracle rounds there.
    """
    from plato_spark.functions.text import portable_h1

    spark = edges_canon.sparkSession
    keyed = edges_canon.select(
        "src", "dst",
        F.pmod(portable_h1(F.concat(
            F.lit("bond|"), F.col("src").cast("string"),
            F.lit(":"), F.col("dst").cast("string"))),
            F.lit(100)).alias("h"),
    ).persist()
    rows = []
    for p in ps:
        sub = keyed.where(F.col("h") < p).select("src", "dst")
        m = sub.count()
        if m == 0:
            rows.append((int(p), 0, 0, 0, 0))
            continue
        # connected_components symmetrizes internally; passing the
        # canonical set avoids doubling every edge in the WCC shuffle.
        labels = connected_components(sub)
        sizes = labels.groupBy("component").agg(F.count("*").alias("sz"))
        agg = sizes.agg(
            F.count("*").alias("nc"),
            F.sum("sz").alias("nv"),
            F.max("sz").alias("mx"),
        ).collect()[0]
        rows.append((int(p), int(agg["nv"]), int(m),
                     int(agg["nc"]), int(agg["mx"])))
    keyed.unpersist()
    return spark.createDataFrame(
        rows,
        "p_pct int, n_vertices long, n_edges long, "
        "n_components long, largest long")


def strength_core_sweep(
    edges_canon_weighted: DataFrame,
    thresholds: tuple = (2, 4, 8),
    max_rounds: int = 32,
) -> DataFrame:
    """(s, n_vertices, n_edges, peel_rounds) — the s-core (strength
    core) sweep: repeatedly delete vertices whose total incident WEIGHT
    is below s until stable, per threshold.  The weighted sibling of
    k-core and the missing CASCADE member of the robustness family —
    bond/weight percolation threshold edges with no iteration; here a
    removal weakens neighbors and can topple them in the next round
    (Eidsaa & Almaas 2013's s-core).  Exact integer strengths (the
    co-occurrence weights are counts); peel_rounds counts rounds that
    actually removed something, so the pinned-round oracle reproduces
    it idempotently.

    Scale: per round one symmetrized strength agg + two anti-joins on
    the shrinking edge set, lineage truncated per round
    (engine/ckpt_blocks)."""
    # r6: layout-preserving truncation — exact-valued loop, plan metadata
    # change cannot move any float reduce order (see ckpt_blocks docstring)
    from plato_spark.engine.ckpt_blocks import (
        auto_loop_checkpoint_tracked as checkpoint_tracked,
        free_blocks,
    )

    spark = edges_canon_weighted.sparkSession
    base = edges_canon_weighted.select(
        "src", "dst", F.col("weight").cast("long").alias("w"))
    base, base_ids = checkpoint_tracked(base)
    rows = []
    for s in thresholds:
        live, live_ids = checkpoint_tracked(base)
        rounds = 0
        for _ in range(max_rounds):
            sym = live.select("src", "dst", "w").unionByName(
                live.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"), "w"))
            st = sym.groupBy(F.col("src").alias("id")).agg(
                F.sum("w").alias("strength"))
            bad = st.where(F.col("strength") < s).select("id")
            n_bad = bad.count()
            if n_bad == 0:
                break
            rounds += 1
            nxt = (
                live.join(bad.withColumnRenamed("id", "src"),
                          "src", "left_anti")
                .join(bad.withColumnRenamed("id", "dst"),
                      "dst", "left_anti")
                .select("src", "dst", "w")
            )
            nxt, nxt_ids = checkpoint_tracked(nxt)
            free_blocks(spark, live_ids)
            live, live_ids = nxt, nxt_ids
        else:
            # Round budget exhausted: re-check convergence on the final
            # live set (the last removal may have settled it).  A
            # truncated peel would silently diverge from the
            # pinned-round DuckDB oracle — fail loudly instead (same
            # contract as dag_critical_path's cycle guard).
            sym = live.select("src", "dst", "w").unionByName(
                live.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"), "w"))
            n_bad = (sym.groupBy(F.col("src").alias("id"))
                     .agg(F.sum("w").alias("strength"))
                     .where(F.col("strength") < s).count())
            if n_bad > 0:
                raise RuntimeError(
                    f"strength_core_sweep: s={s} did not converge in "
                    f"{max_rounds} rounds ({n_bad} vertices still below "
                    f"threshold); raise max_rounds")
        m = live.count()
        nv = live.select(F.col("src").alias("id")).unionByName(
            live.select(F.col("dst").alias("id"))).distinct().count()
        rows.append((int(s), int(nv), int(m), int(rounds)))
        free_blocks(spark, live_ids)
    free_blocks(spark, base_ids)
    return spark.createDataFrame(
        rows, "s int, n_vertices long, n_edges long, peel_rounds long")
