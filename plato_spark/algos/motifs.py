"""Unipartite motif census — vertices, edges, wedges, triangles, 4-cycles.

The subgraph-count summary behind graphlet features and null-model
tests, extending the reference's triangle machinery
(/root/reference/example/mutual.cc, plato/algo/triangle) with the next
motif up: 4-cycles.  Everything derives from ONE codegree aggregation
(the wedge self-join through the common neighbor, the same shape as
butterflies/co-occurrence extraction):

    W(u, v) = |N(u) ∩ N(v)|   for unordered pairs u < v with W >= 1

  * wedges      = sum_v C(deg(v), 2)                     (degrees only)
  * triangles   = sum over ADJACENT pairs of W(u, v) / 3  (each triangle
                  is seen by its 3 edges)
  * four_cycles = sum over ALL pairs of C(W(u, v), 2) / 2 (each 4-cycle
                  is seen by its 2 diagonal pairs; chords are allowed —
                  these are C4 subgraph counts)

All arithmetic is exact int64 (sums are divisible by 3 resp. 2 BEFORE
the division, which is applied last), so the census is bit-identical to
the SQL mirror — and `triangles` cross-checks the independent
orientation/intersection triangle_count query.

Scale: the codegree join is sum_w deg(w)^2 wedge rows flowing into a
map-side-combined groupBy — hub centers are split by AQE's skew join
like the butterfly/extraction paths; at 100 TB the orientation-based
triangle path (algos/triangles) bounds work better for triangles alone,
but the census needs W(u, v) anyway for the 4-cycle term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["motif_census"]


def motif_census(edges_canon: DataFrame) -> DataFrame:
    """One-row census over the canonical (src < dst, unique) edge table:
    (n_vertices, n_edges, wedges, triangles, four_cycles)."""
    spark = edges_canon.sparkSession
    canon = edges_canon.select("src", "dst")
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("d"))
    n_vertices = deg.count()
    n_edges = canon.count()
    wedges = deg.agg(
        F.coalesce(F.sum(F.expr("d * (d - 1) div 2")), F.lit(0))
        .cast("long").alias("w")
    ).collect()[0]["w"]

    a = sym.select(F.col("src").alias("c"), F.col("dst").alias("u"))
    b = sym.select(F.col("src").alias("c"), F.col("dst").alias("v"))
    codeg = (
        a.join(b, "c")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
    ).persist()
    tri3 = (
        codeg.join(
            canon.select(F.col("src").alias("u"), F.col("dst").alias("v")),
            ["u", "v"],
        )
        .agg(F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("s"))
        .collect()[0]["s"]
    )
    cyc2 = codeg.agg(
        F.coalesce(F.sum(F.expr("w * (w - 1) div 2")), F.lit(0))
        .cast("long").alias("s")
    ).collect()[0]["s"]
    codeg.unpersist()
    assert tri3 % 3 == 0 and cyc2 % 2 == 0
    return spark.createDataFrame(
        [(n_vertices, n_edges, wedges, tri3 // 3, cyc2 // 2)],
        "n_vertices long, n_edges long, wedges long, "
        "triangles long, four_cycles long",
    )


def rich_club(edges_canon: DataFrame, ks: tuple = (4, 8, 16, 32)) -> DataFrame:
    """(k, n_rich, e_rich, phi) — rich-club coefficients: among vertices
    with degree > k, what fraction of the possible edges exist?
    (Colizza et al. 2006, "Detecting rich-club ordering in complex
    networks".)  phi(k) = 2 * e_rich / (n_rich * (n_rich - 1)), exact
    counts + one rounded division per k; n_rich < 2 reports phi = 0.

    Cost: one degree aggregation + |ks| semi-joins over the canonical
    edge table — the degree table is reused, nothing quadratic."""
    spark = edges_canon.sparkSession
    canon = edges_canon.select("src", "dst")
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("d")).persist()
    rows = []
    for k in ks:
        rich = deg.where(F.col("d") > k).select("src")
        n = rich.count()
        e = (
            canon.join(rich, "src", "left_semi")
            .join(rich.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .count()
        )
        rows.append((k, n, e))
    deg.unpersist()
    # phi via Spark's HALF_UP round (matches ANSI SQL; python's round
    # is banker's and could differ at an exact half-ulp boundary)
    return spark.createDataFrame(
        rows, "k int, n_rich long, e_rich long"
    ).select(
        "k", "n_rich", "e_rich",
        F.when(
            F.col("n_rich") >= 2,
            F.round(
                F.lit(2.0) * F.col("e_rich")
                / (F.col("n_rich") * (F.col("n_rich") - 1)),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("phi"),
    )


def graphlet_census(edges_canon: DataFrame) -> DataFrame:
    """One-row NON-INDUCED 4-node graphlet census over the canonical
    (src < dst, unique) edge table: (triangles, claws, paths_p4,
    tailed_triangles, diamonds, four_cycles).  K4s are four_cliques'
    own kernel (array-intersection based) and deliberately not
    recomputed here.

    The point is the METHOD: every count is a closed-form integer fold
    over degree / co-degree tables (the ESCAPE decomposition, Pinar et
    al., WWW'17) — no 4-way join ever runs:

      claws            = sum_v C(d_v, 3)
      paths_p4         = sum_{(u,v) in E} (d_u - 1)(d_v - 1) - 3T
      tailed_triangles = sum_v t_v (d_v - 2)
      diamonds         = sum_{(u,v) in E} C(tri_e(u,v), 2)
      four_cycles      = sum_{pairs} C(codeg, 2) / 2

    with t_v = (sum of tri_e over v's incident edges) / 2.  All pure
    int64 folds over one wedge join (codeg) — the same single expensive
    pass motif_census already pays — plus broadcast degree lookups.
    Tests pin the whole row on K5 / star / path fixtures where every
    count is hand-derivable."""
    spark = edges_canon.sparkSession
    canon = edges_canon.select("src", "dst").persist()
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(
        F.count("*").cast("long").alias("d")).persist()

    a = sym.select(F.col("src").alias("c"), F.col("dst").alias("u"))
    b = sym.select(F.col("src").alias("c"), F.col("dst").alias("v"))
    codeg = (
        a.join(b, "c")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("w"))
    ).persist()
    etri = codeg.join(
        canon.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
    ).persist()

    tri3 = etri.agg(F.coalesce(F.sum("w"), F.lit(0)).cast("long")
                    .alias("s")).collect()[0]["s"]
    assert tri3 % 3 == 0
    t = tri3 // 3
    claws = deg.agg(
        F.coalesce(F.sum(F.expr("d * (d - 1) * (d - 2) div 6")),
                   F.lit(0)).cast("long").alias("s")
    ).collect()[0]["s"]
    p4_raw = (
        canon.join(F.broadcast(deg.select(F.col("src"),
                                          F.col("d").alias("du"))), "src")
        .join(F.broadcast(deg.select(F.col("src").alias("dst"),
                                     F.col("d").alias("dv"))), "dst")
        .agg(F.coalesce(F.sum((F.col("du") - 1) * (F.col("dv") - 1)),
                        F.lit(0)).cast("long").alias("s"))
        .collect()[0]["s"]
    )
    p4 = p4_raw - 3 * t
    tv = (
        etri.select(F.col("u").alias("id"), "w")
        .unionByName(etri.select(F.col("v").alias("id"), "w"))
        .groupBy("id").agg(F.expr("sum(w) div 2").cast("long").alias("t"))
    )
    tailed = tv.join(deg.withColumnRenamed("src", "id"), "id").agg(
        F.coalesce(F.sum(F.col("t") * (F.col("d") - 2)), F.lit(0))
        .cast("long").alias("s")
    ).collect()[0]["s"]
    diamonds = etri.agg(
        F.coalesce(F.sum(F.expr("w * (w - 1) div 2")), F.lit(0))
        .cast("long").alias("s")
    ).collect()[0]["s"]
    cyc2 = codeg.agg(
        F.coalesce(F.sum(F.expr("w * (w - 1) div 2")), F.lit(0))
        .cast("long").alias("s")
    ).collect()[0]["s"]
    assert cyc2 % 2 == 0
    for c in (canon, deg, codeg, etri):
        c.unpersist()
    return spark.createDataFrame(
        [(t, claws, p4, tailed, diamonds, cyc2 // 2)],
        "triangles long, claws long, paths_p4 long, "
        "tailed_triangles long, diamonds long, four_cycles long",
    )


def collective_influence(edges_canon: DataFrame) -> DataFrame:
    """(id, ci) — Collective Influence at radius 2 (Morone & Makse,
    Nature 2015): CI(v) = (d_v - 1) * sum over u at distance EXACTLY 2
    of (d_u - 1) — the optimal-percolation heuristic that finds the
    hubs whose removal actually fragments the graph (plain degree
    overrates hubs whose neighbors are themselves connected).

    Exact-distance-2 pairs fall out of tables this module already
    pays for: u is at distance 2 from v iff the pair has a common
    neighbor (a codeg row) AND is not an edge (anti-join against
    canon) — no per-root BFS, one wedge join + one anti-join for the
    whole graph.  Everything is an exact int64 fold; isolated and
    leaf vertices report ci = 0 via the (d - 1) factor."""
    canon = edges_canon.select("src", "dst").persist()
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("d")).persist()

    a = sym.select(F.col("src").alias("c"), F.col("dst").alias("u"))
    b = sym.select(F.col("src").alias("c"), F.col("dst").alias("v"))
    codeg = (
        a.join(b, "c")
        .where(F.col("u") < F.col("v"))
        .select("u", "v").distinct()
    )
    d2 = codeg.join(canon.select(F.col("src").alias("u"),
                                 F.col("dst").alias("v")),
                    ["u", "v"], "left_anti")
    pairs = d2.unionByName(
        d2.select(F.col("v").alias("u"), F.col("u").alias("v")))
    frontier_sum = (
        pairs.join(deg.select(F.col("id").alias("v"),
                              (F.col("d") - 1).alias("dm1")), "v")
        .groupBy(F.col("u").alias("id"))
        .agg(F.sum("dm1").cast("long").alias("fs"))
    )
    out = deg.join(frontier_sum, "id", "left").select(
        "id",
        ((F.col("d") - 1) * F.coalesce("fs", F.lit(0))).cast("long")
        .alias("ci"))
    canon.unpersist()
    deg.unpersist()
    return out
