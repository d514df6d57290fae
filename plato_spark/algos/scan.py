"""SCAN — Structural Clustering Algorithm for Networks (Xu et al.,
KDD'07), deterministic DataFrame form.

SCAN clusters a graph by STRUCTURAL similarity instead of raw
modularity: two adjacent vertices are ε-similar when

    σ(u, v) = |Γ(u) ∩ Γ(v)| / sqrt(|Γ(u)| · |Γ(v)|)  >=  ε

with CLOSED neighborhoods Γ (vertex included), so for an edge (u, v)
the numerator is common_neighbors(u, v) + 2.  A vertex is a CORE when
its ε-neighborhood (which includes itself — σ(u,u) = 1) has at least μ
members; clusters are the connected components of cores under ε-edges;
non-cores ε-adjacent to a core join its cluster as BORDER members; the
rest are HUBS when their plain neighborhood spans >= 2 clusters
(structural connectors — exactly the role plato's spread/bridge
workloads hunt) and OUTLIERS otherwise.  The hub/outlier read-out is
SCAN's selling point over Louvain/LPA (algos/louvain, algos/lpa): those
force every vertex into a community; SCAN isolates noise.

Determinism (the repo's oracle discipline):
  - ε is a RATIONAL eps_num/eps_den and the test σ >= ε is evaluated as
    the exact integer comparison
        (cn + 2)^2 * eps_den^2  >=  eps_num^2 * (deg_u + 1)(deg_v + 1)
    — no sqrt, no float, bit-identical in ANSI SQL.
  - cluster ids are min-vertex-id component labels (algos/wcc hash-min);
    a core with no ε-edge to another core keeps its own id (singleton
    cluster).
  - a border ε-adjacent to cores of several clusters attaches to the
    MINIMUM cluster id (the paper leaves this arbitrary; we pin it).

Scale: one common-neighbor join (hub-capped, algos/triangles), two
degree aggs, the hash-min component loop on the (much smaller)
core-core ε-subgraph, and broadcast-friendly role joins.  No windows on
the full graph, no driver-side data beyond wcc's scalar convergence
counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.algos.triangles import common_neighbors
from plato_spark.algos.wcc import connected_components
from plato_spark.engine.ckpt_blocks import checkpoint_tracked
from plato_spark.graph.edges import symmetrize

__all__ = ["scan_clusters"]


def scan_clusters(
    canon: DataFrame,
    eps_num: int = 3,
    eps_den: int = 5,
    mu: int = 3,
) -> DataFrame:
    """(id, role, cluster) — SCAN over canonical (src<dst, deduped) edges.

    role in {'core', 'border', 'hub', 'outlier'}; cluster is the
    min-member-id label for cores/borders and NULL for hubs/outliers.
    Vertices touching no edge are absent (the graph defines the universe).
    """
    # Truncate the input's LOGICAL plan once (localCheckpoint, not
    # persist): the input is often a derived/extracted table (the
    # planted fixture: window + self-join + md5), and the component
    # loop below stacks a join per superstep on top — Catalyst
    # re-optimizes the full nested plan at every action, which measured
    # 160s+ on a 417-vertex core graph until the cut.  Same lesson as
    # the SALSA/pca loops (engine/ckpt_blocks discipline).
    canon, _ = checkpoint_tracked(canon.select("src", "dst"))
    sym = symmetrize(canon).persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg")).persist()
    verts = deg.select("id")

    cn = common_neighbors(canon)
    du = deg.select(F.col("id").alias("src"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv"))
    sim2 = (F.col("common_count") + 2) * (F.col("common_count") + 2) \
        * (eps_den * eps_den)
    bound = (eps_num * eps_num) * (F.col("du") + 1) * (F.col("dv") + 1)
    eps_edges = (
        cn.join(du, "src").join(dv, "dst")
        .where(sim2 >= bound)
        .select("src", "dst")
    )
    eps_edges, _ = checkpoint_tracked(eps_edges)

    # ε-degree counts the vertex itself (σ(u,u)=1 >= ε always)
    eps_sym = symmetrize(eps_edges)
    neps = eps_sym.groupBy(F.col("src").alias("id")).agg(
        (F.count("*") + 1).alias("neps"))
    cores = verts.join(neps, "id", "left").where(
        F.coalesce("neps", F.lit(1)) >= mu).select("id")
    cores, _ = checkpoint_tracked(cores)

    cc_edges = (
        eps_edges
        .join(cores.withColumnRenamed("id", "src"), "src", "semi")
        .join(cores.withColumnRenamed("id", "dst"), "dst", "semi")
    )
    comp = connected_components(cc_edges).select(
        "id", F.col("component").alias("cluster"))
    core_clusters = cores.join(comp, "id", "left").select(
        "id", F.coalesce("cluster", F.col("id")).alias("cluster"))

    # borders: non-core, ε-adjacent to >= 1 core; min cluster id wins
    border_clusters = (
        eps_sym
        .join(cores.withColumnRenamed("id", "dst"), "dst", "semi")
        .join(cores.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(core_clusters.withColumnRenamed("id", "dst"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )

    members = (
        core_clusters.select("id", "cluster", F.lit("core").alias("role"))
        .unionByName(border_clusters.select(
            "id", "cluster", F.lit("border").alias("role")))
        .persist()
    )

    # non-members: hub iff plain neighbors span >= 2 distinct clusters
    rest = verts.join(members, "id", "left_anti")
    nbr_clusters = (
        sym.join(rest.withColumnRenamed("id", "src"), "src", "semi")
        .join(members.select(F.col("id").alias("dst"), "cluster"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.countDistinct("cluster").alias("nc"))
    )
    rest_roles = rest.join(nbr_clusters, "id", "left").select(
        "id",
        F.lit(None).cast("long").alias("cluster"),
        F.when(F.coalesce("nc", F.lit(0)) >= 2, "hub")
        .otherwise("outlier").alias("role"),
    )

    out = members.select("id", "role", "cluster").unionByName(
        rest_roles.select("id", "role", "cluster"))
    return out
