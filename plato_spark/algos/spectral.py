"""Spectral (Fiedler) coordinate — deflated power iteration on the
graph Laplacian.

The Fiedler vector (eigenvector of the second-smallest Laplacian
eigenvalue) is the continuous relaxation of minimum-balanced-cut: sort
vertices by their coordinate and the best prefix cut approximates the
sparsest bisection (Fiedler '73; the classic spectral-partitioning
pipeline).  It is computed here as power iteration on

    B = sigma*I - L,   sigma = 2*dmax + 1   (Gershgorin: B is PSD and
                                             its top eigenvector is 1)

with the trivial all-ones component DEFLATED by mean-centering each
round, and max-abs normalization (an order-independent max — never an
L2 sqrt whose summation order could drift cross-engine):

    y(v)   = (sigma - deg v) * x(v) + sum_{u in N(v)} x(u)
    c(v)   = y(v) - mean(y)
    x'(v)  = c(v) / max|c|

K pinned rounds give the deterministic power-iterate, not the converged
eigenvector — the oracle-checkable contract, same as every pinned-round
float kernel here (pagerank, simrank, diffusion).  Start vector is the
mean-centered vertex id: cross-engine identical, and never orthogonal
to the Fiedler direction in practice.

Plan per round: ONE shuffle join + map-side-combined aggregation for
the gather, then two 1-row aggregates broadcast back IN-PLAN (the
eigenvector-centrality idiom — zero driver actions inside the loop);
per-round state stats-less-localCheckpointed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint
from plato_spark.graph.partitioning import auto_shuffle_partitions

__all__ = ["spectral_coordinate"]


def spectral_coordinate(edges: DataFrame, rounds: int = 20) -> DataFrame:
    """(id, f) — the K-round deflated-power-iteration estimate of the
    Fiedler coordinate over the symmetrized ``edges`` (src, dst).
    Vertices sorted by f give the spectral-bisection sweep order."""
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
    base = deg.repartition(shuffle_n, "id").persist()
    dmax = base.agg(F.max("deg")).collect()[0][0]
    sigma = 2 * int(dmax) + 1

    # start: mean-centered vertex id (cross-engine identical), then one
    # max-abs normalize so magnitudes start O(1)
    x0 = base.select("id", F.col("id").cast("double").alias("y"))
    mu0 = x0.agg((F.sum("y") / F.count("y")).alias("mu"))
    c0 = x0.crossJoin(F.broadcast(mu0)).select(
        "id", (F.col("y") - F.col("mu")).alias("c")
    )
    m0 = c0.agg(F.max(F.abs("c")).alias("m"))
    state = c0.crossJoin(F.broadcast(m0)).select(
        "id",
        F.when(F.col("m") > 0, F.col("c") / F.col("m"))
        .otherwise(F.col("c")).alias("x"),
    )
    state = cheap_localCheckpoint(state)

    for _ in range(rounds):
        g = (
            e.join(state.select(F.col("id").alias("src"), "x"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("x").alias("g"))
        )
        y = (
            base.join(state, "id")
            .join(g, "id", "left")
            .select(
                "id",
                ((F.lit(float(sigma)) - F.col("deg")) * F.col("x")
                 + F.coalesce("g", F.lit(0.0))).alias("y"),
            )
        )
        mu = y.agg((F.sum("y") / F.count("y")).alias("mu"))
        c = y.crossJoin(F.broadcast(mu)).select(
            "id", (F.col("y") - F.col("mu")).alias("c")
        )
        m = c.agg(F.max(F.abs("c")).alias("m"))
        state = c.crossJoin(F.broadcast(m)).select(
            "id",
            F.when(F.col("m") > 0, F.col("c") / F.col("m"))
            .otherwise(F.col("c")).alias("x"),
        )
        state = cheap_localCheckpoint(state)

    # canonicalize signed zero: the Fiedler coordinate has an atom of
    # mass AT zero (weakly-attached vertices), and a value the two
    # engines place at +eps vs -eps rounds to +-0.0 — numerically equal
    # (IEEE -0.0 == 0.0) but "-0.0" != "0.0" under any stringified
    # row-sort, which misaligns the whole sorted block in a value-hash
    # compare (observed at sf0.1: one -0.0 shifted 10k rows).  The
    # oracle applies the same CASE (entry/common._sql_spectral).
    f6 = F.round("x", 6)
    out = state.select(
        "id",
        F.when(f6 == 0.0, F.lit(0.0)).otherwise(f6).alias("f"),
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    base.unpersist()
    return out
