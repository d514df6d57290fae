"""SimRank — structural-context vertex similarity (Jeh & Widom, KDD'02).

"Two objects are similar if they are referenced by similar objects":
  s(a,a) = 1
  s(a,b) = C / (|N(a)| |N(b)|) * sum_{u in N(a), v in N(b)} s(u,v)

SimRank's state is inherently O(V^2) pairs — no reformulation makes the
all-pairs form tractable at web scale, so the production shapes are
(a) the seeded top-k restriction implemented here (similarity among the
k highest-degree vertices over their induced subgraph — the "compare
the hubs" question a link-graph analyst actually asks), and (b) the
linearized single-pair / single-source forms (Kusumoto et al., VLDB'14)
that turn one query into PageRank-style vector iterations.  The fence
is the brute-force-topk discipline: the quadratic form is deliberate,
bounded (k^2 pairs), and documented — never reachable on the full
vertex set.

Plan shape per iteration: the pair state (k^2 rows, broadcastable)
joins the induced edge table twice — (a,u) x s(u,v) x (b,v) — with one
map-side-combined groupBy(a, b); the pair universe then left-joins the
gathered sums so pairs over empty neighborhoods report 0 rather than
vanishing.  Per-round state is stats-less-localCheckpointed.  All
arithmetic is raw IEEE inside the loop with ONE 6dp round at read-out,
the pagerank-family float discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

__all__ = ["simrank_topk"]


def simrank_topk(
    edges: DataFrame,
    k: int = 32,
    c: float = 0.8,
    iters: int = 5,
) -> DataFrame:
    """(a, b, sim) — SimRank scores after ``iters`` iterations among the
    ``k`` highest-degree vertices (deg DESC, id ASC total order) over
    their induced subgraph.  ``edges`` is the symmetrized (src, dst)
    table.  Returns the full k x k pair matrix (diagonal 1.0); vertices
    isolated within the induced subgraph score 0 against everyone."""
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    top = deg.orderBy(F.desc("deg"), F.asc("id")).limit(k).select("id")
    top = F.broadcast(top.persist())
    top.count()

    esub = (
        edges.join(top.withColumnRenamed("id", "src"), "src")
        .join(top.withColumnRenamed("id", "dst"), "dst")
        .select("src", "dst")
        .persist()
    )
    esub.count()
    dsub = esub.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )

    pairs = (
        top.select(F.col("id").alias("a"))
        .crossJoin(top.select(F.col("id").alias("b")))
        .join(dsub.select(F.col("id").alias("a"), F.col("deg").alias("da")),
              "a", "left")
        .join(dsub.select(F.col("id").alias("b"), F.col("deg").alias("db")),
              "b", "left")
        .select("a", "b",
                F.coalesce("da", F.lit(0)).alias("da"),
                F.coalesce("db", F.lit(0)).alias("db"))
        .persist()
    )
    pairs.count()

    state = pairs.select(
        "a", "b",
        F.when(F.col("a") == F.col("b"), 1.0).otherwise(0.0).alias("s"),
    )
    state = cheap_localCheckpoint(state)
    ea = esub.select(F.col("src").alias("a"), F.col("dst").alias("u"))
    eb = esub.select(F.col("src").alias("b"), F.col("dst").alias("v"))
    for _ in range(iters):
        g = (
            ea.join(state.select(F.col("a").alias("u"),
                                 F.col("b").alias("v"), "s"), "u")
            .join(eb, "v")
            .groupBy("a", "b")
            .agg(F.sum("s").alias("g"))
        )
        state = (
            pairs.join(g, ["a", "b"], "left")
            .select(
                "a", "b",
                F.when(F.col("a") == F.col("b"), 1.0)
                .when(
                    (F.col("da") > 0) & (F.col("db") > 0),
                    F.lit(c) * F.coalesce("g", F.lit(0.0))
                    / (F.col("da") * F.col("db")),
                )
                .otherwise(0.0)
                .alias("s"),
            )
        )
        state = cheap_localCheckpoint(state)
    out = state.select("a", "b", F.round("s", 6).alias("sim"))
    esub.unpersist()
    pairs.unpersist()
    return out
