"""Strongly connected components of a DIRECTED graph (FW-Min coloring).

Beyond the reference menu: plato ships undirected/weak components
(/root/reference/plato/algo/cgm/connected_component.hpp — hash-min over
both directions); on a web-scale LINK graph the directed analog is the
canonical structural analysis (the bow-tie decomposition of the web is an
SCC statement), so the engine supplies it as a first-class operator.

Algorithm — the standard distributed coloring scheme (Orzan's FW-Min, the
same family as Spark/GraphX reference implementations), expressed as
DataFrame supersteps:

  repeat until no vertices remain:
    trim      — vertices with no in-edges or no out-edges in the remaining
                subgraph are singleton SCCs; remove them (one cheap pass —
                deeper trim chains resolve over subsequent rounds)
    color     — forward min-label propagation to fixpoint:
                color(v) = min vertex id that reaches v. Frontier-based:
                only vertices whose color changed last superstep send.
    extract   — for each color c the vertex c itself is the unique root
                (nothing smaller reaches it). SCC(c) = the backward
                closure of c along edges whose BOTH endpoints carry color
                c: v -> ... -> c with color(v)=c means c reaches v and v
                reaches c. Every color extracts its root's full SCC, so
                ALL colors extract in parallel each round.
    remove    — extracted vertices (label = color = the SCC's minimum
                member id, see proof below) leave the graph.

Label invariant: the root r of color r is the minimum member of its SCC —
any member m < r would reach r and force color(r) <= m. So the output
label is deterministic (min member id) regardless of execution order,
which is what makes the operator value-checkable.

Round complexity: one round per layer of the SCC condensation DAG that is
"exposed" (i.e. rounds <= longest chain of SCCs each shadowed by a
smaller upstream SCC). Every inner loop is frontier-based with per-step
``localCheckpoint`` lineage truncation, map-side-combined min aggregates,
and shuffle-partitioned joins — the same discipline as the WCC/k-core
loops. Worst-case graphs (one long chain of SCCs) degrade to many rounds;
``max_rounds`` guards and raises rather than silently truncating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# r6: layout-preserving truncation — exact-valued loop, plan metadata
# change cannot move any float reduce order (see ckpt_blocks docstring)
from plato_spark.engine.ckpt_blocks import (
    auto_loop_localCheckpoint as cheap_localCheckpoint,
)
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_superstep_confs,
)


def strongly_connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 100,
    max_prop_iters: int = 500,
) -> DataFrame:
    """(id, scc) — scc = the minimum vertex id of the vertex's strongly
    connected component.

    edges: directed (src, dst) table (duplicates/self-loops tolerated).
    vertices: optional (id) table — pass it when isolated vertices (no
    edges at all) must appear in the output; defaults to edge endpoints.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    if vertices is None:
        # endpoints of the RAW input: a vertex whose only edge is a
        # self-loop is still a (singleton) component of the graph
        verts = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    else:
        verts = vertices.select("id").distinct()

    n_e = e.count()
    shuffle_n = auto_shuffle_partitions(spark, max(n_e, 1))
    e = e.repartition(shuffle_n, "src").transform(cheap_localCheckpoint)
    verts = verts.transform(cheap_localCheckpoint)

    done_parts: list[DataFrame] = []

    with scoped_superstep_confs(spark, shuffle_n):
        for _round in range(max_rounds):
            if verts.count() == 0:
                break

            # ---- trim to fixpoint: vertices with no out-edges or no
            # in-edges in the remaining subgraph are singleton SCCs.  On
            # web graphs this strips the bow-tie tendrils (a large
            # fraction of V) before any coloring work; iterating to
            # fixpoint collapses whole acyclic chains in one round.
            while True:
                has_out = e.select(F.col("src").alias("id")).distinct()
                has_in = e.select(F.col("dst").alias("id")).distinct()
                core = (
                    verts.join(has_out, "id", "semi").join(has_in, "id", "semi")
                )
                trimmed = verts.join(core, "id", "anti")
                if trimmed.limit(1).count() == 0:
                    break
                done_parts.append(
                    trimmed.select("id", F.col("id").alias("scc"))
                    .transform(cheap_localCheckpoint)
                )
                verts = core.transform(cheap_localCheckpoint)
                e = (
                    e.join(verts.withColumnRenamed("id", "src"), "src", "semi")
                    .join(verts.withColumnRenamed("id", "dst"), "dst", "semi")
                    .select("src", "dst")
                    .transform(cheap_localCheckpoint)
                )
            if verts.count() == 0:
                break

            # ---- color: forward min-label propagation to fixpoint ----
            color = verts.select("id", F.col("id").alias("color"))
            frontier = color
            for _ in range(max_prop_iters):
                if frontier.count() == 0:
                    break
                msgs = (
                    e.join(
                        frontier.select(
                            F.col("id").alias("src"), F.col("color").alias("c")
                        ),
                        "src",
                    )
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.min("c").alias("newc"))
                )
                joined = color.join(msgs, "id", "left")
                changed = (
                    joined.where(F.col("newc") < F.col("color"))
                    .select("id", F.col("newc").alias("color"))
                    .transform(cheap_localCheckpoint)
                )
                color = (
                    joined.select(
                        "id",
                        F.when(
                            F.col("newc") < F.col("color"), F.col("newc")
                        ).otherwise(F.col("color")).alias("color"),
                    ).transform(cheap_localCheckpoint)
                )
                frontier = changed
            else:
                raise RuntimeError(
                    "scc: forward coloring did not converge within "
                    f"{max_prop_iters} supersteps"
                )

            # ---- extract: backward closure of each root within its color ----
            roots = color.where(F.col("id") == F.col("color"))
            reached = roots.select("color", "id").transform(cheap_localCheckpoint)
            frontier = reached
            ec = (
                e.join(
                    color.select(F.col("id").alias("src"),
                                 F.col("color").alias("c_src")),
                    "src",
                )
                .join(
                    color.select(F.col("id").alias("dst"),
                                 F.col("color").alias("c_dst")),
                    "dst",
                )
                .where(F.col("c_src") == F.col("c_dst"))
                .select("src", "dst", F.col("c_src").alias("color"))
                .transform(cheap_localCheckpoint)
            )
            # r6: checkpoint only the per-round frontier; the closure is
            # the union of disjoint checkpointed frontiers (anti-join
            # keeps them disjoint), collapsed every 10 rounds — the old
            # loop re-materialized the whole growing `reached` table
            # every round (same fix as bowtie.reachable_set)
            parts = [reached]

            def _vis():
                v = parts[0]
                for p in parts[1:]:
                    v = v.unionByName(p)
                return v

            while True:
                if frontier.count() == 0:
                    break
                preds = (
                    ec.join(
                        frontier.select(
                            F.col("id").alias("dst"), F.col("color").alias("c")
                        ),
                        "dst",
                    )
                    .where(F.col("color") == F.col("c"))
                    .select("color", F.col("src").alias("id"))
                    .distinct()
                    .join(_vis(), ["color", "id"], "anti")
                    .transform(cheap_localCheckpoint)
                )
                parts.append(preds)
                if len(parts) >= 10:
                    parts = [_vis().transform(cheap_localCheckpoint)]
                frontier = preds
            reached = _vis()

            done_parts.append(
                reached.select("id", F.col("color").alias("scc"))
                .transform(cheap_localCheckpoint)
            )

            # ---- remove extracted vertices ----
            verts = verts.join(
                reached.select("id"), "id", "anti"
            ).transform(cheap_localCheckpoint)
            e = (
                e.join(verts.withColumnRenamed("id", "src"), "src", "semi")
                .join(verts.withColumnRenamed("id", "dst"), "dst", "semi")
                .select("src", "dst")
                .transform(cheap_localCheckpoint)
            )
        else:
            raise RuntimeError(
                f"scc: did not decompose within {max_rounds} rounds"
            )

    if not done_parts:
        return spark.createDataFrame([], "id long, scc long")
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out.select("id", F.col("scc").cast("long").alias("scc"))


def condensation_edges(
    edges: DataFrame,
    labels: DataFrame | None = None,
    max_rounds: int = 100,
) -> DataFrame:
    """(src_scc, dst_scc) — the distinct directed edges of the
    condensation DAG: contract every strongly connected component to its
    label (min member id) and keep inter-component edges only.

    Mirrors the standard post-pass on plato's SCC output (the reference
    emits per-vertex labels, /root/reference/plato/algo/scc — downstream
    DAG analytics contract on them); the condensation is what turns a
    cyclic digraph into the DAG that topo-level / longest-path operators
    need.

    Plan shape: two key-partitioned equi-joins (label lookup per
    endpoint) + one distinct that map-side combines |E| rows down to the
    condensation's edge count.  ``labels`` may be passed pre-computed to
    reuse an SCC run; otherwise one is computed here.
    """
    if labels is None:
        labels = strongly_connected_components(edges, max_rounds=max_rounds)
    e = edges.select("src", "dst").distinct()
    ls = labels.select(F.col("id").alias("src"), F.col("scc").alias("src_scc"))
    ld = labels.select(F.col("id").alias("dst"), F.col("scc").alias("dst_scc"))
    return (
        e.join(ls, "src")
        .join(ld, "dst")
        .where(F.col("src_scc") != F.col("dst_scc"))
        .select("src_scc", "dst_scc")
        .distinct()
    )
