"""Similarity search over embedding columns (array<float>).

- cosine_sim_col: JVM-side cosine via zip_with/aggregate (codegen, no UDF)
- brute_force_topk: exact top-k neighbors per query — the correctness
  baseline; cross-join cost O(Q*N), run with a small query set.
- threshold_neighbors: count of neighbors above a cosine threshold —
  order-insensitive output (oracle-friendly; no top-k tie ambiguity).
- lsh_bucketed_neighbors: the scale path — random-hyperplane signatures
  (deterministic planes, numpy matmul in an Arrow UDF) bucket the vectors;
  exact cosine is evaluated only within buckets. Recall < 1 by design;
  verified in tests against brute force on fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def cosine_sim_col(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / F.greatest(na * nb, F.lit(1e-300))


def _pairs(emb: DataFrame, queries: DataFrame | None,
           id_col: str, vec_col: str) -> DataFrame:
    base = emb.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"))
    q = (queries if queries is not None else emb).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    return q.crossJoin(base).where(F.col("query_id") != F.col("nbr_id"))


def brute_force_topk(
    emb: DataFrame,
    k: int = 10,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, nbr_id, cosine, rank) — exact top-k by cosine.

    Deterministic tie-break: (cosine desc, nbr_id asc).
    """
    pairs = _pairs(emb, queries, id_col, vec_col).select(
        "query_id", "nbr_id",
        F.round(cosine_sim_col(F.col("q_vec"), F.col("nbr_vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return pairs.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def threshold_neighbors(
    emb: DataFrame,
    threshold: float = 0.8,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, n_similar) — neighbor count with cosine >= threshold."""
    pairs = _pairs(emb, queries, id_col, vec_col)
    cos = cosine_sim_col(F.col("q_vec"), F.col("nbr_vec"))
    return (
        pairs.groupBy("query_id")
        .agg(F.sum(F.when(cos >= threshold, 1).otherwise(0)).cast("long").alias("n_similar"))
    )


def lsh_bucketed_neighbors(
    emb: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH (the 100TB path).

    Each of ``num_tables`` tables hashes a vector to a ``num_planes``-bit
    signature (sign of dot with deterministic gaussian planes, numpy matmul
    per Arrow batch); exact cosine runs only inside matching buckets.
    Returns (query_id, nbr_id, cosine, rank<=k) — approximate (recall<1).
    """
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_row["d"])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim)).astype(np.float64)

    @pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = []
        sigs = []
        for t in range(num_tables):
            proj = m @ planes[t].T > 0  # (n, planes) bool
            weights = (1 << np.arange(num_planes, dtype=np.int64))
            sig = (proj.astype(np.int64) * weights).sum(axis=1)
            sigs.append(sig * num_tables + t)  # disambiguate tables
        stacked = np.stack(sigs, axis=1)
        return pd.Series(list(stacked))

    tagged = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        F.explode(_buckets(F.col(vec_col))).alias("bucket"),
    )
    lhs = tagged.select("bucket", F.col("id").alias("query_id"), F.col("vec").alias("q_vec"))
    rhs = tagged.select("bucket", F.col("id").alias("nbr_id"), F.col("vec").alias("nbr_vec"))
    cand = (
        lhs.join(rhs, "bucket")
        .where(F.col("query_id") != F.col("nbr_id"))
        .select(
            "query_id", "nbr_id",
            F.round(cosine_sim_col(F.col("q_vec"), F.col("nbr_vec")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "nbr_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
