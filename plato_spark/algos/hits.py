"""HITS (hubs & authorities) — Kleinberg's link-analysis power iteration.

Beyond the reference menu (plato ships PageRank only for eigen-style
scores; /root/reference/plato/algo/pagerank/pagerank.hpp), added because
link-graph users expect the hub/authority decomposition on directed
graphs (citation/dependency edges): authority = endorsed-by-good-hubs,
hub = points-at-good-authorities.

Per iteration (two exchanges, inherently — the two vectors gather along
opposite edge directions):

  auth(v)  = sum_{(u,v) in E} hub(u)    then L1-normalize
  hub(u)   = sum_{(u,v) in E} auth(v)   then L1-normalize

Plan shape mirrors algos/pagerank impl='join': the edge table is cached
hash-partitioned on src once; each gather is one co-partitioned join +
map-side-combined groupBy; L1 normalization is a scalar agg broadcast
back as a literal (collect of ONE number, not per-row data). L1 (not L2)
keeps the oracle exact-mirrorable in SQL; any positive scaling converges
to the same principal direction. Fixed iteration count + 6dp rounding =
deterministic, DuckDB-value-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)


def hits(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """Returns (id, hub, authority), 6dp, after ``iterations`` rounds."""
    spark = edges.sparkSession
    e0 = edges.select("src", "dst").persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_e)
    e = e0.repartition(shuffle_n, "src").persist()
    e.count()
    e0.unpersist()

    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(shuffle_n, "id")
        .persist()
    )
    n_v = verts.count()

    state = verts.select(
        "id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
    ).persist()

    with scoped_shuffle_partitions(spark, shuffle_n):
        for _ in range(iterations):
            # gather hubs along edges -> raw authorities
            a_raw = (
                e.join(state.select(F.col("id").alias("src"), "hub"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("hub").alias("a_raw"))
            )
            a_tot = a_raw.agg(F.sum("a_raw")).collect()[0][0] or 1.0
            auth = state.select("id").join(a_raw, "id", "left").select(
                "id",
                (F.coalesce("a_raw", F.lit(0.0)) / F.lit(float(a_tot))).alias("auth"),
            )
            # gather authorities backwards -> raw hubs
            h_raw = (
                e.join(auth.select(F.col("id").alias("dst"), "auth"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum("auth").alias("h_raw"))
            )
            h_tot = h_raw.agg(F.sum("h_raw")).collect()[0][0] or 1.0
            new_state = (
                auth.join(h_raw, "id", "left")
                .select(
                    "id",
                    (F.coalesce("h_raw", F.lit(0.0)) / F.lit(float(h_tot))).alias("hub"),
                    "auth",
                )
                .localCheckpoint(eager=True)
            )
            state.unpersist()
            state = new_state

    return state.select(
        "id", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("authority")
    ).orderBy("id")
