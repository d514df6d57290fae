"""Dyad census + reciprocity over a DIRECTED edge table.

The directed-structure audit beside scc/scc_condensation: of the
C(V,2) vertex pairs, how many are mutual (both directions present),
asymmetric (exactly one direction), or null (no edge)?  Reciprocity
2M/E is the classic citation-graph statistic (how often is a
reference returned) — for the code-corpus north star it measures
bidirectional coupling between files, the refactor-risk signal.

Reference parity: plato has no dyad census, but its directed-degree
machinery (out/in degrees, e.g. plato/graph/structure.hpp) computes
the same ingredients; this is the missing rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dyad_census(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """1-row (mutual, asym, nulls, reciprocity) over a directed edge set.

    ``edges``: (src, dst) directed, self-loops dropped here.
    ``vertices``: 1-column vertex universe (defines the null-dyad
    denominator — pass the full id table, not just touched endpoints,
    or isolated vertices vanish from the census).

    Plan: one distinct, one self-join on the REVERSED key (left-semi,
    so mutual edges are counted without materializing pairs twice),
    then three 1-row aggregates crossJoined — the transitivity idiom.
    Everything is exact integer arithmetic except the single rounded
    reciprocity division; an empty edge set reports reciprocity 0.0
    rather than NULL (guarded division).
    """
    vcol = vertices.columns[0]
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    m2 = (
        e.join(rev, ["src", "dst"], "left_semi")
        .agg(F.count("*").cast("long").alias("m2"))
    )
    tot = e.agg(F.count("*").cast("long").alias("tot"))
    nv = (
        vertices.select(F.col(vcol).alias("v")).distinct()
        .agg(F.count("*").cast("long").alias("n"))
    )
    mutual = (F.col("m2") / 2).cast("long")
    asym = (F.col("tot") - F.col("m2")).cast("long")
    pairs = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    return (
        m2.crossJoin(tot).crossJoin(nv)
        .select(
            mutual.alias("mutual"),
            asym.alias("asym"),
            (pairs - mutual - asym).cast("long").alias("nulls"),
            F.when(
                F.col("tot") > 0,
                F.round(F.col("m2").cast("double") / F.col("tot"), 6),
            ).otherwise(F.lit(0.0)).alias("reciprocity"),
        )
    )
