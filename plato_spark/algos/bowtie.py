"""Broder bow-tie decomposition of a directed graph.

The canonical web-link-graph structure audit (Broder et al., "Graph
structure in the Web", WWW 2000): pick the largest strongly connected
component (CORE), then classify every vertex as

    CORE          — in the largest SCC (ties: smallest SCC label)
    IN            — reaches CORE but is not in it
    OUT           — reachable from CORE but not in it
    TENDRIL       — weakly connected to CORE but neither IN nor OUT
                    (Broder's tendrils AND tubes, folded together)
    DISCONNECTED  — not weakly connected to CORE at all

For a citation/link corpus this is the crawl-frontier planning map: OUT
mass is content you can reach but never return from, IN mass is content
no forward crawl will ever find, DISCONNECTED is invisible to any
link-following strategy.

Composition of existing kernels, nothing new shuffles: SCC labels
(algos/scc — forward-min color + backward extraction, the reference's
/root/reference/plato/algo/scc semantics), two multi-source frontier
reachability sweeps (the level-synchronous loop of algos/bfs.bfs
generalized to a seed SET — per-round plan truncation, broadcast small
frontiers), and one weak-connectivity pass (algos/wcc hash-min).  All
classification joins key on the vertex id.  Driver actions: one 1-row
collect for the core label, one for the core's weak-component label,
and the per-round frontier counts every BSP loop in this engine pays.

Scale: rounds grow with graph diameter (the same bound as every
frontier kernel here); data volume per round is one key-partitioned
equi-join + distinct.  The category table is 5 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# r6: layout-preserving truncation — exact-valued loop, plan metadata
# change cannot move any float reduce order (see ckpt_blocks docstring)
from plato_spark.engine.ckpt_blocks import (
    auto_loop_localCheckpoint as cheap_localCheckpoint,
)

# matches algos/bfs.PUSH_THRESHOLD semantics: broadcast the frontier
# while it is small relative to the vertex universe
_BCAST_FRAC = 0.05

CATEGORIES = ["CORE", "IN", "OUT", "TENDRIL", "DISCONNECTED"]


def reachable_set(
    edges: DataFrame, seeds: DataFrame, n_vertices: int, max_iters: int = 10_000
) -> DataFrame:
    """All vertex ids reachable from ``seeds`` (included) over directed
    ``edges`` (src, dst).  ``seeds`` must have column ``id``."""
    # r6: checkpoint only the per-round FRONTIER, not the whole visited
    # set — the old loop re-materialized the full (growing) reach table
    # every round, O(rounds x |reach|) row copies.  The visited set is
    # the union of the disjoint checkpointed frontiers (each new
    # frontier anti-joins the union, so disjointness is invariant);
    # the union lineage is collapsed every 10 rounds to bound plan
    # width on long chains.  Same exact set, same round count.
    seed_part = seeds.select("id").distinct().transform(cheap_localCheckpoint)
    parts = [seed_part]

    def visited():
        v = parts[0]
        for p in parts[1:]:
            v = v.unionByName(p)
        return v

    frontier = seed_part
    rounds = 0
    while rounds < max_iters:
        rounds += 1
        n_front = frontier.count()
        if n_front == 0:
            break
        f = frontier.select(F.col("id").alias("src"))
        if n_front < _BCAST_FRAC * max(n_vertices, 1):
            f = F.broadcast(f)
        nxt = (
            edges.join(f, "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited(), "id", "anti")
            .transform(cheap_localCheckpoint)
        )
        parts.append(nxt)
        if len(parts) >= 10:
            parts = [visited().transform(cheap_localCheckpoint)]
        frontier = nxt
    return visited()


def bowtie_decomposition(edges: DataFrame, verts: DataFrame) -> DataFrame:
    """(component, n) — exactly 5 rows (zero-filled), categories above.

    ``edges``: (src, dst) directed.  ``verts``: (id) the vertex
    universe; ids that never touch an edge count as DISCONNECTED
    singletons, mirroring how the census queries keep isolated docs in
    the denominator (cf. algos/dyads).
    """
    from plato_spark.algos.scc import strongly_connected_components
    from plato_spark.algos.wcc import connected_components

    spark = edges.sparkSession
    universe = verts.select("id").distinct().transform(cheap_localCheckpoint)
    base = spark.createDataFrame([(c,) for c in CATEGORIES], "component string")

    e = edges.select("src", "dst").persist()
    n_edges = e.count()
    if n_edges == 0:
        e.unpersist()
        n = universe.count()
        return base.join(
            spark.createDataFrame([("DISCONNECTED", n)], "component string, n long"),
            "component",
            "left",
        ).select("component", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"))

    # SCC labels cover edge endpoints; extend to the universe with
    # singleton labels (label = own id) so "largest SCC" ranks the same
    # population on both engines.
    scc = strongly_connected_components(e)
    labels = (
        universe.join(scc, "id", "left")
        .select("id", F.coalesce(F.col("scc"), F.col("id")).alias("scc"))
        .transform(cheap_localCheckpoint)
    )
    core_label = (
        labels.groupBy("scc")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("scc"))
        .limit(1)
        .collect()[0]["scc"]
    )
    core = labels.where(F.col("scc") == core_label).select("id")
    n_vertices = universe.count()

    fwd = reachable_set(e, core, n_vertices)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    bwd = reachable_set(rev, core, n_vertices)

    wcc = connected_components(e)  # (id, component), min-id labels
    rep_weak = wcc.where(F.col("id") == core_label).collect()[0]["component"]
    weak = wcc.where(F.col("component") == rep_weak).select("id")

    in_part = bwd.join(core, "id", "anti")
    out_part = fwd.join(core, "id", "anti")
    touched = fwd.unionByName(bwd).distinct()
    tendril = weak.join(touched, "id", "anti")
    disconnected = universe.join(weak, "id", "anti")

    tagged = (
        core.select("id", F.lit("CORE").alias("component"))
        .unionByName(in_part.select("id", F.lit("IN").alias("component")))
        .unionByName(out_part.select("id", F.lit("OUT").alias("component")))
        .unionByName(tendril.select("id", F.lit("TENDRIL").alias("component")))
        .unionByName(disconnected.select("id", F.lit("DISCONNECTED").alias("component")))
    )
    counts = tagged.groupBy("component").agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = base.join(counts, "component", "left").select(
        "component", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n")
    )
    e.unpersist()
    return out
