"""GraphSAGE-style mean-aggregate feature propagation (untrained).

Beyond-reference operator: the GNN-feed loop (gnn_neighbor_sample,
negative_sampling, linkpred_eval) needs the FEATURE side too — the
K-layer neighborhood mean aggregation that GraphSAGE/GCN inference
computes before any learned weights enter (Hamilton et al., NeurIPS
2017, mean aggregator).  Each layer:

    h_{k+1}(v) = ( h_k(v) + mean_{u in N(v)} h_k(u) ) / 2

i.e. equal-weight self + neighbor-mean — the alpha=1/2 vector sibling
of algos/diffusion.attribute_diffusion's scalar smoothing.

Exactness contract: features are quantized ONCE to int64 micro-units
(round(x * 1e6)), and every layer's update is

    q' = floor( (q * deg + sum_neighbors q) / (2 * deg) )

— an integer-exact numerator with ONE floor'd IEEE division per layer
over identical integer operands in any engine (floor, not integer
`div`: Spark's div truncates toward zero while DuckDB's // floors, and
embedding sums go NEGATIVE — the tests pin floor(-1.5) = -2).
Values read out as exact 6dp decimals (micro-units / 1e6).

Plan shape: features live in LONG format (id, dim, q) — one posexplode
at entry, never a per-row Python loop.  Each layer is one co-partitioned
edge join + one map-side-combined (dst, dim) aggregation — the PageRank
superstep with a 64x wider key.  Long format is the 100-TB choice over
collect_list-of-arrays aggregation: a hub vertex's neighbor set never
has to fit one task's memory, and dim spreads the shuffle key space
(hub skew divides by the dimension count).  Output is (id, dim, value)
rows — array-typed outputs cannot ride the driver gate's canonicalizer
(the embedding_project lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint
from plato_spark.graph.partitioning import auto_shuffle_partitions

__all__ = ["sage_mean_features"]


def sage_mean_features(
    edges: DataFrame,
    features: DataFrame,
    layers: int = 2,
    vec_col: str = "embedding",
    id_col: str = "id",
    scale: int = 1_000_000,
) -> DataFrame:
    """(id, dim, value) — ``layers`` rounds of self+neighbor-mean
    aggregation of ``features`` (id, vec array) over the symmetrized
    ``edges`` (src, dst).  Vertices without a feature row are dropped
    from the universe and from neighbor means; vertices with no
    (feature-carrying) neighbor keep their own vector."""
    spark = edges.sparkSession
    q0 = features.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("dim", "x"),
    ).select(
        "id", "dim",
        # explicit float32 -> double BEFORE the scale multiply: both
        # engines must round the identical double or boundary values
        # land one micro-unit apart
        F.round(F.col("x").cast("double") * scale, 0).cast("long")
        .alias("q"),
    )
    e0 = edges.select("src", "dst").distinct().persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, max(n_e, 1))
    keep = features.select(F.col(id_col).alias("id")).distinct()
    e = (
        e0.join(keep.withColumnRenamed("id", "src"), "src")
        .join(keep.withColumnRenamed("id", "dst"), "dst")
        .repartition(shuffle_n, "src")
        .persist()
    )
    e.count()
    e0.unpersist()
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg"))

    state = cheap_localCheckpoint(q0)
    for _ in range(layers):
        g = (
            e.join(state.select(F.col("id").alias("src"), "dim", "q"),
                   "src")
            .groupBy(F.col("dst").alias("id"), "dim")
            .agg(F.sum("q").cast("long").alias("s"))
        )
        state = (
            state.join(g, ["id", "dim"], "left")
            .join(deg, "id", "left")
            .select(
                "id", "dim",
                F.when(
                    F.coalesce("deg", F.lit(0)) > 0,
                    F.floor(
                        (F.col("q") * F.col("deg")
                         + F.coalesce("s", F.lit(0)))
                        / (2.0 * F.col("deg"))
                    ),
                ).otherwise(F.col("q")).cast("long").alias("q"),
            )
        )
        state = cheap_localCheckpoint(state)
    out = state.select(
        "id", "dim",
        F.round(F.col("q") / F.lit(float(scale)), 6).alias("value"))
    e.unpersist()
    return out
