"""Eigenvector centrality — power iteration with in-plan L1 normalization.

The undamped, teleport-free member of the engine's spectral-centrality
family (PageRank = damped + degree-normalized, Katz = attenuated + base,
HITS = the directed two-sided variant): x' = A x / ||A x||_1 over the
symmetrized adjacency, fixed iteration count from the uniform vector so
the unconverged iterate is a deterministic, oracle-pinnable fixture
(the same convention as algos/hits.py / algos/salsa.py).

Per iteration: ONE shuffle join + one map-side-combined groupBy; the L1
total rides in-plan as a broadcast 1-row aggregate — zero driver actions
inside the loop (the discipline HITS earned in r3, plan-asserted there).
Per-iteration ``cheap_localCheckpoint`` truncates the doubled plan
reference (numerator + denominator both read the gather result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint
from plato_spark.graph.edges import symmetrize

__all__ = ["eigenvector_centrality"]


def eigenvector_centrality(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """(id, score rounded 6dp) after ``iterations`` L1-normalized power
    steps over canonical undirected edges (src<dst, deduped)."""
    if iterations < 1:
        raise ValueError("eigenvector_centrality requires iterations >= 1")
    sym = symmetrize(edges.select("src", "dst")).persist()
    verts = sym.select(F.col("src").alias("id")).distinct().persist()
    x = verts.select("id", F.lit(1.0).alias("x"))
    for _ in range(iterations):
        g = (
            sym.join(x.select(F.col("id").alias("src"), "x"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("x").alias("s"))
        )
        tot = g.agg(F.sum("s").alias("t"))
        x = cheap_localCheckpoint(
            verts.join(g, "id", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "id",
                (F.coalesce("s", F.lit(0.0)) / F.col("t")).alias("x"),
            )
        )
    out = x.select("id", F.round("x", 6).alias("score"))
    out = out.localCheckpoint(eager=True)
    sym.unpersist()
    verts.unpersist()
    return out
