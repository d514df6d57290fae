"""Product-quantization ANN — subspace codebooks, codes, ADC top-k.

Jégou, Douze & Schmid 2011 ("Product Quantization for Nearest Neighbor
Search"): split each d-dim vector into ``m`` subvectors, k-means each
subspace independently (k_c centroids), store every vector as ``m``
small codes, and answer queries with Asymmetric Distance Computation —
the query stays exact, each database vector's distance is approximated
by summing per-subspace query→centroid distances looked up from an
m x k_c table.

This is the third leg of the engine's ANN family: brute_force (exact
baseline), IVF (cluster pruning), sign-LSH (bucketing) — PQ adds the
COMPRESSION leg: at 100 TB the codes table is m bytes/vector instead of
4*d, so the scan that IVF prunes and LSH buckets is also ~64x smaller,
and the distance tables (q x m x k_c floats) broadcast to every executor
so the ADC join never shuffles the vectors themselves.

Determinism / oracle story (same discipline as ivf_ann):

  * subspace k-means seeds = the k_c smallest ids' subvectors, Lloyd
    means rounded 6dp (functions/similarity._kmeans_fit convention);
  * distances are squared L2 computed by the polarization identity
    a.a + b.b - 2a.b from the SAME dot-product folds the cosine family
    uses, rounded 9dp — bit-reproducible in DuckDB;
  * ADC sums are done in INTEGER nanodistance (round(sq*1e9) as long),
    so the m-way addition is exact and order-independent — no IEEE
    reassociation hazard in the groupBy — and the final distance is one
    division at read-out;
  * ranking order (adc_nano ASC, nbr_id ASC) is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pq_fit", "pq_encode", "pq_ann"]


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _sqdist9(a, b):
    """Squared L2 via the polarization identity, rounded 9dp (portable)."""
    return F.round(_dot(a, a) + _dot(b, b) - F.lit(2.0) * _dot(a, b), 9)


def _sub(vec_col, s: int, d_sub: int):
    return F.slice(vec_col, s * d_sub + 1, d_sub)


def _fit_sub(vecs: DataFrame, k_c: int, lloyd_iters: int) -> DataFrame:
    """(cluster, cvec) — deterministic L2 k-means over (id, vec)."""
    seeds = vecs.orderBy(F.col("id").asc()).limit(k_c)
    w_seed = Window.orderBy(F.col("id").asc())
    cent = seeds.select(
        (F.row_number().over(w_seed) - 1).alias("cluster"),
        F.col("vec").alias("cvec"),
    )
    for _ in range(lloyd_iters):
        assigned = _assign_sub(vecs, cent)
        means = (
            assigned.select("cluster", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster", F.col("pm.m").alias("cvec"))
        )
        cent = (
            cent.select("cluster", F.col("cvec").alias("prev"))
            .join(means, "cluster", "left")
            .select("cluster", F.coalesce("cvec", "prev").alias("cvec"))
        )
    return cent


def _assign_sub(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """(id, vec, cluster) — nearest centroid by rounded squared L2,
    ties to the smaller cluster id; centroids broadcast."""
    scored = vecs.crossJoin(F.broadcast(cent)).select(
        "id", "vec", "cluster",
        _sqdist9(F.col("vec"), F.col("cvec")).alias("sq"),
    )
    w = Window.partitionBy("id").orderBy(
        F.col("sq").asc(), F.col("cluster").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("id", "vec", "cluster")
    )


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    k_c: int = 16,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sub, cluster, cvec) — one L2 codebook per subspace."""
    vecs = emb.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("full"))
    dim = len(vecs.select("full").first()["full"])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    d_sub = dim // m
    books = None
    for s in range(m):
        b = _fit_sub(
            vecs.select("id", _sub(F.col("full"), s, d_sub).alias("vec")),
            k_c, lloyd_iters,
        ).select(F.lit(s).cast("int").alias("sub"), "cluster", "cvec")
        books = b if books is None else books.unionByName(b)
    return books


def pq_encode(
    emb: DataFrame,
    books: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sub, code) — per-subspace nearest-codeword assignment."""
    vecs = emb.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("full"))
    dim = len(vecs.select("full").first()["full"])
    d_sub = dim // m
    out = None
    for s in range(m):
        cb = books.where(F.col("sub") == s).select("cluster", "cvec")
        a = _assign_sub(
            vecs.select("id", _sub(F.col("full"), s, d_sub).alias("vec")), cb
        ).select("id", F.lit(s).cast("int").alias("sub"),
                 F.col("cluster").cast("int").alias("code"))
        out = a if out is None else out.unionByName(a)
    return out


def pq_ann(
    emb: DataFrame,
    m: int = 4,
    k_c: int = 16,
    lloyd_iters: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, nbr_id, adc, rank) — top-k neighbors per vector by
    asymmetric-distance (smaller = closer), self excluded; ties by
    nbr_id.  ``adc`` is the integer-nanodistance sum divided back to
    units, rounded 6dp."""
    books = pq_fit(emb, m, k_c, lloyd_iters, id_col, vec_col)
    codes = pq_encode(emb, books, m, id_col, vec_col)
    vecs = emb.select(F.col(id_col).alias("qid"),
                      F.col(vec_col).cast("array<double>").alias("full"))
    dim = len(vecs.select("full").first()["full"])
    d_sub = dim // m
    # per-subspace query -> codeword distance tables (integer nano-L2)
    dts = None
    for s in range(m):
        cb = books.where(F.col("sub") == s)
        dt = vecs.crossJoin(F.broadcast(cb)).select(
            "qid", "sub", "cluster",
            F.round(
                _sqdist9(_sub(F.col("full"), s, d_sub), F.col("cvec"))
                * F.lit(1e9), 0
            ).cast("long").alias("nano"),
        )
        dts = dt if dts is None else dts.unionByName(dt)
    adc = (
        dts.join(
            codes.select(F.col("id").alias("nbr_id"), "sub",
                         F.col("code").alias("cluster")),
            ["sub", "cluster"],
        )
        .where(F.col("qid") != F.col("nbr_id"))
        .groupBy(F.col("qid").alias("query_id"), "nbr_id")
        .agg(F.sum("nano").alias("nano"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("nano").asc(), F.col("nbr_id").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id",
                F.round(F.col("nano") / F.lit(1e9), 6).alias("adc"), "rank")
    )
