"""HANP — Hop Attenuation & Node Preference label propagation.

Reference: /root/reference/plato/algo/hanp/hanp.hpp:37-42 (opts: iterations
20, preference 1.0, hop_att 0.1, dis 1e-6) and 118-186 (vote):

per iteration, synchronously for every vertex v:
  - for each in-neighbor u with att(u) >= 0:
      score[label(u)] += att(u) * preference * w(u,v)
      max_att[label(u)] = max(max_att[label(u)], att(u))
  - winner = label with max score; ties within ``dis`` broken randomly in
    the reference (mt19937) — we pin SMALLEST label (same determinism
    policy as lpa.py, documented divergence)
  - att'(v) = max_att[winner]  (minus hop_att if v's label changed)

Vertices with no eligible in-neighbors keep label and attenuation.

Spark plan per superstep: edges JOIN state ON src -> groupBy(dst, label)
agg(sum score, max att) -> argmax via max(struct) -> join prev state for
the changed-label attenuation decay. All JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)


def hanp(
    edges: DataFrame,
    iterations: int = 20,
    preference: float = 1.0,
    hop_att: float = 0.1,
    dis: float = 1e-6,
    weight: str | None = None,
) -> DataFrame:
    """Returns (id, label) over directed weighted edges (src, dst[, weight]).

    dis-width ties are resolved to the smallest label (deterministic).
    """
    spark = edges.sparkSession
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e0 = edges.select("src", "dst", w_col.alias("w")).persist()
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
    )
    state = verts.select(
        "id", F.col("id").alias("label"), F.lit(1.0).alias("att")
    )

    with scoped_shuffle_partitions(spark, shuffle_n):
        prev_cached = None
        for k in range(iterations):
            contrib = e.join(
                state.select(
                    F.col("id").alias("src"), F.col("label").alias("nl"),
                    F.col("att").alias("na"),
                ).where(F.col("na") >= 0),
                "src",
            )
            per_label = (
                contrib.groupBy(F.col("dst").alias("id"), F.col("nl").alias("cand"))
                .agg(
                    F.sum(F.col("na") * F.lit(preference) * F.col("w")).alias("score"),
                    F.max("na").alias("max_att"),
                )
            )
            # argmax with dis-tolerance smallest-label tie-break: quantize
            # the score to dis buckets, then max(struct(qscore, -label)).
            qs = F.round(F.col("score") / F.lit(dis)).cast("long")
            winner = (
                per_label.groupBy("id")
                .agg(
                    F.max(
                        F.struct(
                            qs.alias("q"),
                            (-F.col("cand")).alias("neg"),
                            F.col("max_att").alias("ma"),
                        )
                    ).alias("m")
                )
                .select(
                    "id", (-F.col("m.neg")).alias("new_label"), F.col("m.ma").alias("new_att")
                )
            )
            new_state = (
                state.join(winner, "id", "left")
                .select(
                    "id",
                    F.coalesce("new_label", F.col("label")).alias("label"),
                    F.when(F.col("new_label").isNull(), F.col("att"))
                    .when(F.col("new_label") == F.col("label"), F.col("new_att"))
                    .otherwise(F.col("new_att") - F.lit(hop_att))
                    .alias("att"),
                )
            )
            new_state = new_state.transform(cheap_localCheckpoint)
            if prev_cached is not None:
                try:
                    prev_cached.unpersist()
                except Exception:
                    pass
            prev_cached, state = state, new_state
    return state.select("id", "label")
