"""Link-prediction evaluation harness — split, score, hits@k, end to end.

The eval loop every link-prediction / graph-ML system needs (Liben-Nowell
& Kleinberg 2003, "The Link Prediction Problem for Social Networks"):

  1. SPLIT: hold out a deterministic ~1/holdout_mod of the canonical
     edges by portable hash (functions/sampling discipline — the same
     row always lands on the same side under any partitioning);
  2. SCORE: rank candidate partners per vertex on the TRAIN graph only —
     candidates are distance-2 pairs (wedge join), scored by
     common-neighbor count, train edges excluded, ties by neighbor id;
  3. EVALUATE: hits@k = the fraction of held-out edges (u, v) where v
     appears in u's top-k (either direction counts — an undirected edge
     is recovered if either endpoint ranks the other).

Everything is exact integer counting + one rounded division, so the
whole harness — including the ranking — is SQL-oracle-checkable.  Scale
shape: one wedge self-join on the train graph (AQE-skew-split like every
codegree pass in this engine), one per-vertex window over that vertex's
candidates, two semi-joins; no all-pairs work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plato_spark.functions.text import portable_h1

__all__ = ["link_prediction_eval", "link_prediction_first_rank"]


def _edge_hash(src, dst):
    return portable_h1(
        F.concat_ws(":", F.lit("lp"), src.cast("string"), dst.cast("string"))
    )


def link_prediction_eval(
    edges_canon: DataFrame, k: int = 10, holdout_mod: int = 5
) -> DataFrame:
    """One row: (n_train, n_test, k, n_hits, hits_at_k) over the
    canonical (src < dst, unique) edge table."""
    spark = edges_canon.sparkSession
    e = edges_canon.select(
        "src", "dst",
        (F.pmod(_edge_hash(F.col("src"), F.col("dst")),
                F.lit(holdout_mod)) == 0).alias("held"),
    )
    test = e.where("held").select("src", "dst")
    train = e.where("NOT held").select("src", "dst")
    train = train.persist()
    n_test = test.count()
    n_train = train.count()

    sym = train.unionByName(
        train.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # distance-2 candidates with common-neighbor counts (both directions)
    a = sym.select(F.col("src").alias("c"), F.col("dst").alias("u"))
    b = sym.select(F.col("src").alias("c"), F.col("dst").alias("v"))
    cand = (
        a.join(b, "c")
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
        .join(sym.select(F.col("src").alias("u"), F.col("dst").alias("v")),
              ["u", "v"], "left_anti")
    )
    w = Window.partitionBy("u").orderBy(F.col("cn").desc(), F.col("v").asc())
    topk = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("u", "v")
    )
    # an undirected held-out edge is a hit if either endpoint ranks the
    # other in its top-k
    hits = (
        test.join(topk.withColumnRenamed("u", "src")
                  .withColumnRenamed("v", "dst"), ["src", "dst"],
                  "left_semi")
        .unionByName(
            test.join(topk.select(F.col("v").alias("src"),
                                  F.col("u").alias("dst")),
                      ["src", "dst"], "left_semi")
        )
        .distinct()
        .count()
    )
    train.unpersist()
    out = spark.createDataFrame(
        [(n_train, n_test, k, hits)],
        "n_train long, n_test long, k int, n_hits long",
    )
    return out.select(
        "*",
        F.when(F.col("n_test") > 0,
               F.round(F.col("n_hits") / F.col("n_test"), 6))
        .otherwise(F.lit(0.0)).alias("hits_at_k"),
    )


def link_prediction_first_rank(
    edges_canon: DataFrame, holdout_mod: int = 5
) -> DataFrame:
    """(src, dst, rank_from_src, rank_from_dst, best_rank) — the
    rank-resolved companion of :func:`link_prediction_eval`: for every
    held-out edge, WHERE in each endpoint's full common-neighbor
    ranking (cn DESC, candidate ASC — the same total order hits@k cuts
    at k) the true neighbor actually sits.  NULL when the pair shares
    no train common neighbor (unreachable by the CN scorer at any k);
    best_rank = least non-null side.  Per-edge exact integers — the
    MRR-style read-out without a float mean (reciprocal-rank sums are
    reduce-order-sensitive; ranks are not)."""
    e = edges_canon.select(
        "src", "dst",
        (F.pmod(_edge_hash(F.col("src"), F.col("dst")),
                F.lit(holdout_mod)) == 0).alias("held"),
    )
    test = e.where("held").select("src", "dst")
    train = e.where("NOT held").select("src", "dst")
    sym = train.unionByName(
        train.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    a = sym.select(F.col("src").alias("c"), F.col("dst").alias("u"))
    b = sym.select(F.col("src").alias("c"), F.col("dst").alias("v"))
    cand = (
        a.join(b, "c")
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
        .join(sym.select(F.col("src").alias("u"), F.col("dst").alias("v")),
              ["u", "v"], "left_anti")
    )
    w = Window.partitionBy("u").orderBy(F.col("cn").desc(), F.col("v").asc())
    ranked = cand.withColumn("rnk", F.row_number().over(w)).select(
        "u", "v", "rnk")
    fwd = ranked.select(F.col("u").alias("src"), F.col("v").alias("dst"),
                        F.col("rnk").alias("rank_from_src"))
    rev = ranked.select(F.col("v").alias("src"), F.col("u").alias("dst"),
                        F.col("rnk").alias("rank_from_dst"))
    out = test.join(fwd, ["src", "dst"], "left").join(
        rev, ["src", "dst"], "left")
    return out.select(
        "src", "dst",
        F.col("rank_from_src").cast("long").alias("rank_from_src"),
        F.col("rank_from_dst").cast("long").alias("rank_from_dst"),
        F.least(
            F.coalesce("rank_from_src", "rank_from_dst"),
            F.coalesce("rank_from_dst", "rank_from_src"),
        ).cast("long").alias("best_rank"))
