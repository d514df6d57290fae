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
hash-partitioned on src once (plus a dst-partitioned copy for the
reverse gather, so both directions join co-partitioned); each gather is
one co-partitioned join + map-side-combined groupBy; L1 normalization
stays IN the plan as a broadcast 1-row aggregate (no driver collect —
the sole action per iteration is the lineage-truncating localCheckpoint,
and the in-plan division is float-identical to dividing by a collected
scalar, so the SQL oracle is unchanged). L1 (not L2) keeps the oracle
exact-mirrorable in SQL; any positive scaling converges to the same
principal direction. Fixed iteration count + 6dp rounding =
deterministic, DuckDB-value-checkable. No final sort: output order is
unspecified (the driver compare is order-insensitive), a global orderBy
would be a pure full-sort exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

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
    # dst-partitioned copy: the reverse gather joins on dst; without it
    # every iteration re-shuffles the full edge table
    e_dst = e0.repartition(shuffle_n, "dst").persist()
    e_dst.count()
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

    def _l1_total(raw: DataFrame, col: str) -> DataFrame:
        # 1-row L1 mass, guarded like the old collected scalar (`or 1.0`)
        t = F.coalesce(F.sum(col), F.lit(1.0))
        return raw.agg(
            F.when(t == 0.0, F.lit(1.0)).otherwise(t).alias(f"{col}_tot")
        )

    with scoped_shuffle_partitions(spark, shuffle_n):
        for _ in range(iterations):
            # gather hubs along edges -> raw authorities; normalization
            # rides in-plan as a broadcast 1-row agg (persist so the raw
            # table is computed once for both the agg and the join)
            a_raw = (
                e.join(state.select(F.col("id").alias("src"), "hub"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("hub").alias("a_raw"))
                .persist()
            )
            auth = (
                state.select("id")
                .join(a_raw, "id", "left")
                .crossJoin(F.broadcast(_l1_total(a_raw, "a_raw")))
                .select(
                    "id",
                    (F.coalesce("a_raw", F.lit(0.0)) / F.col("a_raw_tot")).alias("auth"),
                )
            )
            # gather authorities backwards -> raw hubs (dst-partitioned copy)
            h_raw = (
                e_dst.join(auth.select(F.col("id").alias("dst"), "auth"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum("auth").alias("h_raw"))
                .persist()
            )
            new_state = (
                auth.join(h_raw, "id", "left")
                .crossJoin(F.broadcast(_l1_total(h_raw, "h_raw")))
                .select(
                    "id",
                    (F.coalesce("h_raw", F.lit(0.0)) / F.col("h_raw_tot")).alias("hub"),
                    "auth",
                )
                .transform(cheap_localCheckpoint)  # the ONE action per iteration
            )
            for c in (a_raw, h_raw, state):
                try:
                    c.unpersist()
                except Exception:
                    pass
            state = new_state

    return state.select(
        "id", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("authority")
    )
