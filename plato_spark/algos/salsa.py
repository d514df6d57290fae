"""SALSA — Stochastic Approach for Link-Structure Analysis (bipartite).

Lempel & Moran 2000: HITS' mutual-reinforcement loop with the adjacency
matrices ROW-STOCHASTICALLY normalized — each step spreads mass divided
by the spreading side's degree, i.e. a random walk alternating hub and
authority sides.  Complements the engine's HITS (algos/hits.py, same
L1-per-iteration convention) on BIPARTITE data: here hubs are orders and
authorities are parts of the order x part incidence.

Per iteration (mirrored 1:1 by the SQL oracle):

    a'(p) = sum_{o in N(p)} h(o) / deg(o),   then L1-normalize
    h'(o) = sum_{p in N(o)} a'(p) / deg(p),  then L1-normalize

Each half-step is one join + one map-side-combined groupBy; the L1
totals are computed in-plan (scalar subquery / broadcast aggregation),
no driver actions inside the loop — the discipline HITS earned in r3.
Fixed iteration count from uniform init keeps the result a genuine
power-iteration fixture (the true SALSA stationary distribution is
degree-proportional per component; a finite unconverged iteration is
what the oracle pins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

__all__ = ["salsa"]


def salsa(
    inc: DataFrame,
    iters: int = 5,
    left: str = "left",
    right: str = "right",
) -> DataFrame:
    """(id, kind, score) — SALSA hub scores for ``left`` vertices
    (kind='hub') and authority scores for ``right`` vertices
    (kind='authority') after ``iters`` L1-normalized iterations over the
    DISTINCT bipartite incidence; scores rounded 6dp."""
    if iters < 1:
        raise ValueError("salsa requires iters >= 1 (no degree-"
                         "proportional zeroth iterate is defined)")
    inc = inc.select(F.col(left).alias("o"), F.col(right).alias("p")).distinct()
    ldeg = inc.groupBy("o").agg(F.count("*").alias("dl"))
    rdeg = inc.groupBy("p").agg(F.count("*").alias("dr"))
    # edges annotated with both degrees (static; reused every iteration)
    e = inc.join(ldeg, "o").join(rdeg, "p").select("o", "p", "dl", "dr")
    e = e.persist()
    h = ldeg.select("o", F.lit(1.0).alias("hub"))
    a = None
    for _ in range(iters):
        ar = (
            e.join(h, "o")
            .groupBy("p")
            .agg(F.sum(F.col("hub") / F.col("dl")).alias("s"))
        )
        tot_a = ar.agg(F.sum("s").alias("t"))
        # cheap_localCheckpoint: the in-plan total references ar twice
        # (numerator + denominator) and each iteration nests the last,
        # so without per-round truncation the join tree doubles per
        # iteration (measured: 5 iters -> catalyst hang at sf0.001)
        a = cheap_localCheckpoint(
            ar.crossJoin(F.broadcast(tot_a)).select(
                "p", (F.col("s") / F.col("t")).alias("auth")
            )
        )
        hr = (
            e.join(a, "p")
            .groupBy("o")
            .agg(F.sum(F.col("auth") / F.col("dr")).alias("s"))
        )
        tot_h = hr.agg(F.sum("s").alias("t"))
        h = cheap_localCheckpoint(
            hr.crossJoin(F.broadcast(tot_h)).select(
                "o", (F.col("s") / F.col("t")).alias("hub")
            )
        )
    out = h.select(
        F.col("o").alias("id"), F.lit("hub").alias("kind"),
        F.round("hub", 6).alias("score"),
    ).unionByName(
        a.select(
            F.col("p").alias("id"), F.lit("authority").alias("kind"),
            F.round("auth", 6).alias("score"),
        )
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out
