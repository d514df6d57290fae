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
- ivf_ann: the other scale path — IVF (inverted-file) coarse quantizer:
  deterministic k-means centroids, vectors bucketed by nearest centroid,
  queries probe the ``n_probe`` nearest cells only. Fully deterministic
  (seeded init = smallest ids, fixed Lloyd iterations, rounded means), so
  it is value-checkable against an unrolled SQL oracle.
- embedding_near_dup_clusters: embedding-cosine near-dup dedup — the
  similarity join produces a dup-pair edge table and hash-min WCC closes
  transitive chains to a canonical keeper per vector.
"""

from __future__ import annotations

import math

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


def _kmeans_assign(vecs: DataFrame, c: DataFrame) -> DataFrame:
    """(id, vec, cluster) — nearest (highest-cosine) centroid per vector.
    Centroid tables are tiny (k x dim) so the pass is a broadcast
    nested-loop join evaluated JVM-side (zip_with/aggregate codegen)."""
    sim = F.round(cosine_sim_col(F.col("vec"), F.col("cvec")), 9)
    scored = vecs.crossJoin(F.broadcast(c)).select(
        "id", "vec", "cluster", sim.alias("sim")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("sim").desc(), F.col("cluster").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("id", "vec", "cluster")
    )


def _kmeans_fit(vecs: DataFrame, n_clusters: int, lloyd_iters: int) -> DataFrame:
    """(cluster, cvec) — deterministic k-means: initial centroids are the
    vectors of the ``n_clusters`` smallest ids, then ``lloyd_iters`` rounds
    of (assign to highest-cosine centroid, recompute per-dimension means).
    Means use one posexplode + groupBy(cluster, pos) shuffle and are
    rounded to 6dp so the quantizer is bit-reproducible across engines
    and partitionings."""
    # orderBy+limit compiles to TakeOrderedAndProject (distributed top-k);
    # the global row_number window then runs over only n_clusters rows —
    # never over the full vector table (no single-partition bottleneck).
    seeds = vecs.orderBy(F.col("id").asc()).limit(n_clusters)
    w_seed = Window.orderBy(F.col("id").asc())
    cent = seeds.select(
        (F.row_number().over(w_seed) - 1).alias("cluster"),
        F.col("vec").alias("cvec"),
    )
    for _ in range(lloyd_iters):
        assigned = _kmeans_assign(vecs, cent)
        means = (
            assigned.select("cluster", F.posexplode("vec").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("v"), 6).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster", F.col("pm.m").alias("cvec"))
        )
        # clusters emptied by reassignment keep their previous centroid
        cent = (
            cent.select("cluster", F.col("cvec").alias("prev"))
            .join(means, "cluster", "left")
            .select("cluster", F.coalesce("cvec", "prev").alias("cvec"))
        )
    return cent


def kmeans_clusters(
    emb: DataFrame,
    n_clusters: int = 8,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster) — deterministic k-means document clustering over
    the embedding column (the topic-bucketing / corpus-mixing step of a
    training-data pipeline, and the index build of :func:`ivf_ann`).

    Every pass is a broadcast join against a k x dim centroid table plus
    one map-side-combined aggregation — no all-pairs work, no Python in
    the hot path; at 100 TB the cost is ``lloyd_iters`` scans of the
    vector table."""
    vecs = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cent = _kmeans_fit(vecs, n_clusters, lloyd_iters)
    return _kmeans_assign(vecs, cent).select(
        F.col("id").alias(id_col), F.col("cluster").cast("int").alias("cluster")
    )


def ivf_ann(
    emb: DataFrame,
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 2,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer (the 100TB path).

    Index build: deterministic k-means (:func:`_kmeans_fit`).  Search:
    each query probes its ``n_probe`` best cells; exact cosine runs
    only against vectors in probed cells. Returns
    (query_id, nbr_id, cosine, rank<=k) — approximate (recall<1 vs brute
    force; cross-cell neighbors are missed by design).
    """
    vecs = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cent = _kmeans_fit(vecs, n_clusters, lloyd_iters)

    index = _kmeans_assign(vecs, cent).select(
        F.col("cluster"), F.col("id").alias("nbr_id"), F.col("vec").alias("nbr_vec")
    )

    # probe: top n_probe cells per query vector
    psim = F.round(cosine_sim_col(F.col("vec"), F.col("cvec")), 9)
    w_probe = Window.partitionBy("id").orderBy(
        F.col("sim").desc(), F.col("cluster").asc()
    )
    probes = (
        vecs.crossJoin(F.broadcast(cent))
        .select("id", "vec", "cluster", psim.alias("sim"))
        .withColumn("__rn", F.row_number().over(w_probe))
        .where(F.col("__rn") <= n_probe)
        .select(F.col("id").alias("query_id"), F.col("vec").alias("q_vec"), "cluster")
    )

    cand = (
        probes.join(index, "cluster")
        .where(F.col("query_id") != F.col("nbr_id"))
        .select(
            "query_id", "nbr_id",
            F.round(cosine_sim_col(F.col("q_vec"), F.col("nbr_vec")), 6).alias("cosine"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w_rank)).where(F.col("rank") <= k)


def embedding_near_dup_clusters(
    emb: DataFrame,
    threshold: float = 0.42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate CLUSTERS over a vector column.

    Pipeline: cosine-threshold similarity join (all-pairs for oracle mode;
    pass LSH/IVF ``candidates`` (query_id, nbr_id) at scale) -> dup-pair
    edge table -> hash-min connected components -> canonical keeper per
    vector. Transitive chains (A~B, B~C) dedup to one keeper even when A~C
    is below threshold. Returns (vec_id, keeper_id) for every vector in a
    near-dup cluster (singletons omitted).
    """
    from plato_spark.algos.wcc import connected_components

    if candidates is None:
        pairs = _pairs(emb, None, id_col, vec_col).where(
            F.col("query_id") < F.col("nbr_id")
        )
    else:
        base = emb.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"))
        qs = emb.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        pairs = (
            candidates.where(F.col("query_id") < F.col("nbr_id"))
            .join(qs, "query_id").join(base, "nbr_id")
        )
    cos = F.round(cosine_sim_col(F.col("q_vec"), F.col("nbr_vec")), 6)
    edges = pairs.select(
        F.col("query_id").alias("src"), F.col("nbr_id").alias("dst"),
        cos.alias("cosine"),
    ).where(F.col("cosine") >= threshold).select("src", "dst")
    comp = connected_components(edges)
    return comp.select(
        F.col("id").alias("vec_id"), F.col("component").alias("keeper_id")
    )


def rademacher_planes(num_tables: int, num_planes: int, dim: int) -> list:
    """Deterministic +/-1 hyperplanes from md5 parity — the same bytes any
    engine (or the DuckDB oracle generator) derives, so sign-LSH becomes
    reproducible across engines. Rademacher projections are an unbiased
    random-projection family (same guarantee class as gaussian planes)."""
    import hashlib

    planes = []
    for t in range(num_tables):
        tbl = []
        for p in range(num_planes):
            row = []
            for d in range(dim):
                h = hashlib.md5(f"{t}|{p}|{d}".encode()).hexdigest()
                row.append(1.0 if int(h[:14], 16) % 2 == 0 else -1.0)
            tbl.append(row)
        planes.append(tbl)
    return planes


def embedding_project(
    emb: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, proj: array<double>) — deterministic Rademacher random
    projection to ``out_dim`` dimensions (Achlioptas-style sparse JL:
    ±1 signs carry the same distance-preservation guarantee class as
    gaussian projections at a fraction of the cost).

    The dimensionality-reduction step before clustering / ANN over very
    wide embeddings: each output coordinate is a signed sum of the input
    coordinates scaled by 1/sqrt(out_dim).  Signs come from the same
    md5-parity family as :func:`rademacher_planes`, so the projection is
    bit-reproducible across engines; the whole map is JVM codegen
    (zip_with/aggregate) over one narrow stage — zero shuffle, trivially
    scan-parallel at 100 TB.  Outputs are rounded to 6dp (both engines
    compute the same left-to-right fold).  ``out_dim`` should be a power
    of four-ish so 1/sqrt(out_dim) is a binary fraction (16 -> 0.25) and
    the scaling is exact.  Pass ``dim`` (input width) when known — the
    schema's array type carries no length, so omitting it costs one
    ``first()`` action just to read the width."""
    if dim is None:
        dim = int(emb.select(F.size(vec_col).alias("d")).first()["d"])
    planes = rademacher_planes(1, out_dim, dim)[0]
    scale = 1.0 / math.sqrt(out_dim)
    vec = F.col(vec_col)
    comps = []
    for j in range(out_dim):
        signs = F.array(*[F.lit(s) for s in planes[j]])
        dot = F.aggregate(
            F.zip_with(vec, signs, lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        comps.append(F.round(dot * F.lit(scale), 6))
    return emb.select(F.col(id_col), F.array(*comps).alias("proj"))


def _portable_bucket_tags(
    emb: DataFrame,
    num_planes: int,
    num_tables: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, v, bucket) — one row per (vector, LSH table), Rademacher signs
    evaluated JVM-side."""
    dim = int(emb.select(F.size(vec_col).alias("d")).first()["d"])
    planes = rademacher_planes(num_tables, num_planes, dim)
    vec = F.col(vec_col)
    buckets = []
    for t in range(num_tables):
        sig = None
        for p in range(num_planes):
            signs = F.array(*[F.lit(s) for s in planes[t][p]])
            dot = F.aggregate(
                F.zip_with(vec, signs, lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            bit = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
            sig = bit if sig is None else sig + bit
        buckets.append((sig * num_tables + t).cast("long"))
    return emb.select(
        F.col(id_col).alias("id"), vec.alias("v"),
        F.explode(F.array(*buckets)).alias("bucket"),
    )


def lsh_candidate_pairs_portable(
    emb: DataFrame,
    num_planes: int = 10,
    num_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distinct candidate pairs (query_id < nbr_id) sharing >=1 LSH bucket —
    the scale-path candidate generator for embedding_near_dup_clusters:
    a bucketed equi-join instead of the all-pairs crossJoin, with
    deterministic Rademacher planes so the candidate set itself is
    oracle-reproducible."""
    tagged = _portable_bucket_tags(emb, num_planes, num_tables, id_col, vec_col)
    lhs = tagged.select("bucket", F.col("id").alias("query_id"))
    rhs = tagged.select("bucket", F.col("id").alias("nbr_id"))
    return (
        lhs.join(rhs, "bucket")
        .where(F.col("query_id") < F.col("nbr_id"))
        .select("query_id", "nbr_id")
        .distinct()
    )


def lsh_bucketed_neighbors_portable(
    emb: DataFrame,
    k: int = 10,
    num_planes: int = 10,
    num_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH ANN with deterministic Rademacher planes, all JVM-side
    (zip_with/aggregate dot products — no Python, and bit-reproducible in
    SQL, so the approximate result is value-checkable by an oracle).

    Same bucket->exact-cosine->top-k shape as lsh_bucketed_neighbors; the
    numpy-matmul gaussian variant stays the high-dim throughput path.
    """
    tagged = _portable_bucket_tags(emb, num_planes, num_tables, id_col, vec_col)
    lhs = tagged.select("bucket", F.col("id").alias("query_id"), F.col("v").alias("q_vec"))
    rhs = tagged.select("bucket", F.col("id").alias("nbr_id"), F.col("v").alias("nbr_vec"))
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


def rrf_fusion(lists, k: int = 5, c: int = 60) -> DataFrame:
    """(query_id, nbr_id, rrf, rank) — reciprocal-rank fusion of ranked
    neighbor lists (Cormack et al., SIGIR'09): score = sum over lists of
    1 / (c + rank), fused top-``k`` per query.

    The standard way to combine heterogeneous retrieval channels (exact
    cosine, IVF, hyperplane-LSH, lexical BM25) without calibrating their
    score scales — only ranks enter.  Engine-portable by construction:
    each term is one IEEE division of exact integers, a per-(query, nbr)
    score sums at most |lists| such terms (addition of two doubles is
    commutative-exact, so even the shuffle's accumulation order cannot
    matter for <= 2 lists), and the fused ordering is the raw-score
    total order (score DESC, nbr_id ASC).  Plan: one union + one
    map-side-combined groupBy + a per-query window over <= |lists|*k
    rows — no vector math re-runs."""
    u = None
    for df in lists:
        t = df.select(
            "query_id", "nbr_id",
            (F.lit(1.0) / (F.lit(c) + F.col("rank"))).alias("t"),
        )
        u = t if u is None else u.unionByName(t)
    sc = u.groupBy("query_id", "nbr_id").agg(F.sum("t").alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc()
    )
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id",
                F.round("score", 6).alias("rrf"),
                F.col("rank").cast("int").alias("rank"))
    )


def label_centroid_similarity(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label_a, label_b, n_a, n_b, cosine) — pairwise cosine between
    per-label embedding centroids (label_a < label_b): the
    cluster-separation audit of an embedding space (are the planted
    classes distinguishable at the centroid level?) and the
    inter-domain-similarity dashboard before mixture balancing.

    Engine-portability: each centroid dimension is an explicit
    sum/count mean ROUNDED 6dp before any cosine enters (the
    value_outliers discipline — a raw float mean's accumulation order
    differs between engines; the rounded means are identical, so the
    one cosine per label pair is deterministic).  Plan: one posexplode
    + one map-side-combined groupBy(label, dim) — the shuffle carries
    |labels| * dim rows — then a |labels|-row self-join; vectors
    reassemble via array_sort(collect_list(struct(dim, v))), a
    deterministic order-by-key reassembly."""
    cent = label_centroids(emb, id_col, vec_col, label_col)
    a = cent.select(F.col("label").alias("label_a"),
                    F.col("cvec").alias("va"), F.col("n").alias("n_a"))
    b = cent.select(F.col("label").alias("label_b"),
                    F.col("cvec").alias("vb"), F.col("n").alias("n_b"))
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a", "label_b", "n_a", "n_b",
            F.round(cosine_sim_col(F.col("va"), F.col("vb")), 6)
            .alias("cosine"),
        )
    )


def label_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, cvec, n) — per-label centroid with 6dp-pre-rounded
    per-dimension means (see label_centroid_similarity for why the round
    precedes any downstream cosine)."""
    exploded = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select("label", "dim", F.col("v").cast("double").alias("v"))
    cent = (
        exploded.groupBy("label", "dim")
        .agg(F.round(F.sum("v") / F.count("v"), 6).alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("cvec")
        )
    )
    counts = emb.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return cent.join(counts, "label")


def embedding_purity(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, n, n_correct) — nearest-centroid classification purity of
    the embedding space: each vector is assigned to its highest-cosine
    label centroid (9dp-rounded sim, ties by smallest label — the
    _kmeans_assign total order) and scored against its own label.  The
    separability eval that decides whether embedding-space curation
    (clustering, near-dup, stratification) will carry signal.

    Plan: centroids are |labels| rows — broadcast against the vector
    scan, argmin via a per-vector window over |labels| rows; exact
    integer counts out."""
    cent = label_centroids(emb, id_col, vec_col, label_col)
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        F.col(label_col).alias("true_label"),
    )
    sim = F.round(cosine_sim_col(F.col("vec"), F.col("cvec")), 9)
    scored = vecs.crossJoin(
        F.broadcast(cent.select(F.col("label").alias("clabel"), "cvec"))
    ).select("id", "true_label", "clabel", sim.alias("sim"))
    w = Window.partitionBy("id").orderBy(
        F.col("sim").desc(), F.col("clabel").asc()
    )
    assigned = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("id", "true_label", F.col("clabel").alias("pred"))
    )
    return (
        assigned.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("pred") == F.col("true_label"), 1)
                  .otherwise(0)).cast("long").alias("n_correct"),
        )
    )


def silhouette(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, n, silhouette) — simplified (centroid-based) silhouette
    per label: for each vector, a = cosine distance to its OWN label
    centroid, b = cosine distance to the nearest OTHER centroid,
    s = (b - a) / max(a, b); the per-label mean is the standard
    cluster-quality read-out (near 1 = compact and separated, near 0 =
    boundary, negative = probably mislabeled).  The medoid-free variant
    is the only one that scales: true silhouette is all-pairs.

    Engine discipline: centroids are the 6dp-pre-rounded
    label_centroids; every cosine rounds to 9dp before use (so a and b
    are exact differences of identical doubles, and the max over other
    centroids is order-independent); s rounds to 9dp and then
    accumulates as an exact integer (s * 1e9 as BIGINT) so the mean is
    ONE IEEE division regardless of partitioning.  max(a, b) == 0
    scores s = 0; a single-label input reports NULL."""
    cent = label_centroids(emb, id_col, vec_col, label_col)
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        F.col(label_col).alias("true_label"),
    )
    sim = F.round(cosine_sim_col(F.col("vec"), F.col("cvec")), 9)
    scored = vecs.crossJoin(
        F.broadcast(cent.select(F.col("label").alias("clabel"), "cvec"))
    ).select("id", "true_label", "clabel", sim.alias("sim"))
    per = scored.groupBy("id", "true_label").agg(
        F.max(F.when(F.col("clabel") == F.col("true_label"), F.col("sim"))
              ).alias("own_sim"),
        F.max(F.when(F.col("clabel") != F.col("true_label"), F.col("sim"))
              ).alias("other_sim"),
    )
    a = F.lit(1.0) - F.col("own_sim")
    b = F.lit(1.0) - F.col("other_sim")
    s = F.when(F.col("other_sim").isNull(), F.lit(None).cast("double")).when(
        F.greatest(a, b) > 0, F.round((b - a) / F.greatest(a, b), 9)
    ).otherwise(F.lit(0.0))
    s9 = F.round(s * 1e9, 0).cast("long")
    return (
        per.select("true_label", s9.alias("s9"))
        .groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.when(F.count("s9") > 0,
                   F.round(F.sum("s9") / (F.count("s9") * F.lit(1e9)), 6)
                   ).alias("silhouette"),
        )
    )


def embedding_quantization(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    bits_max: int = 127,
) -> DataFrame:
    """(label, n, max_err, mean_err) — symmetric int8 quantization audit
    of the embedding space: every element quantizes to
    clamp(round(x * scale), -127, 127) with the GLOBAL scale
    127 / max|x|, and the per-label reconstruction error
    (per-vector max |x - q/scale|, then max and mean per label) tells
    you whether the 4x storage/bandwidth cut is safe for retrieval —
    the audit run before shipping a quantized ANN index.

    Engine discipline: max|x| is an order-independent MAX over raw
    data, so scale is one identical IEEE division; q and the
    reconstruction are identical op sequences; the per-vector max is
    order-independent; per-label mean accumulates 9dp-rounded
    per-vector errors as exact e*1e9 BIGINTs (the silhouette trick) so
    the mean is ONE division at any partitioning.  An all-zero corpus
    (max|x| = 0) reports zero error."""
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        F.col(label_col).alias("label"),
    )
    g = vecs.agg(
        F.max(F.aggregate(
            "vec", F.lit(0.0),
            lambda acc, x: F.greatest(acc, F.abs(x)),
        )).alias("maxabs")
    )
    per = vecs.crossJoin(F.broadcast(g)).select(
        "id", "label",
        F.when(
            F.col("maxabs") > 0,
            F.aggregate(
                F.transform(
                    "vec",
                    lambda x: F.abs(
                        x - F.greatest(
                            F.least(
                                F.round(x * (F.lit(float(bits_max))
                                             / F.col("maxabs")), 0),
                                F.lit(float(bits_max)),
                            ),
                            F.lit(-float(bits_max)),
                        ) / (F.lit(float(bits_max)) / F.col("maxabs"))
                    ),
                ),
                F.lit(0.0),
                lambda acc, e: F.greatest(acc, e),
            ),
        ).otherwise(F.lit(0.0)).alias("verr"),
    )
    e9 = F.round(F.round(F.col("verr"), 9) * 1e9, 0).cast("long")
    return (
        per.select("label", "verr", e9.alias("e9"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.max("verr"), 6).alias("max_err"),
            F.round(F.sum("e9") / (F.count(F.lit(1)) * F.lit(1e9)), 6)
            .alias("mean_err"),
        )
    )


def _gramian_cells(
    emb: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(i, j, c) — the mean-centered gramian as 1e6-scaled BIGINT cells
    (see pca_component's portability ladder: 6dp-pre-rounded means,
    round(xi*xj,9)*1e9 integer accumulation, one re-scale)."""
    ex = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))
                     ).alias("dim", "x"),
    )
    means = ex.groupBy("dim").agg(
        F.round(F.sum("x") / F.count("x"), 6).alias("m"))
    cx = ex.join(F.broadcast(means), "dim").select(
        "id", "dim", (F.col("x") - F.col("m")).alias("x"))
    a = cx.select("id", F.col("dim").alias("i"), F.col("x").alias("xi"))
    b = cx.select("id", F.col("dim").alias("j"), F.col("x").alias("xj"))
    p9 = F.round(F.round(F.col("xi") * F.col("xj"), 9) * 1e9, 0).cast("long")
    cells9 = (
        a.join(b, "id")
        .groupBy("i", "j")
        .agg(F.sum(p9).alias("c9"))
    )
    return cells9.select(
        "i", "j",
        F.round(F.col("c9") / F.lit(1000.0), 0).cast("long").alias("c"),
    )


def pca_component(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounds: int = 8,
) -> DataFrame:
    """(dim, loading) — the top principal component of the embedding
    space (power iteration on the mean-centered gramian): the direction
    that explains the most variance — the PCA leg beside the random
    projection (data-blind), PQ (local codebooks) and IVF (clusters),
    and the feature-space sibling of the graph Fiedler coordinate.

    Engine-portability ladder (every float op is one agreed rounding or
    an identical IEEE expression):

    * per-dimension means 6dp-pre-rounded (the label_centroids rule),
      centering is then an exact subtraction of identical doubles;
    * gramian cells accumulate round(x_i*x_j, 9)*1e9 as BIGINTs — an
      order-free integer fold (raw float product sums would be
      partition-order-sensitive), re-scaled once to 1e6 integers;
    * each power round is an exact integer matvec (c6 * v6 fits int64:
      |cells| <= ~1e10 at unit-norm embeddings, v at 1e6, d=64 terms),
      normalized by the integer max-abs — an order-free MAX, never an
      L2 sqrt (the spectral_coord lesson) — with ONE division per cell;
    * pinned ``rounds``, deterministic all-ones start (generic for a
      PSD gramian).

    Scale: the map side streams N*d^2 products into a map-side-combined
    d^2-cell fold (the classic distributed gramian — the shuffle
    carries 4096 cells); the iteration then runs entirely on the tiny
    cell table.  Output loadings at 1e-6 resolution, sign fixed by the
    deterministic start."""
    cells = _gramian_cells(emb, id_col, vec_col).persist()
    v = _power_iterate(cells, rounds)
    cells.unpersist()  # v is checkpointed per round; free the cell cache
    return v.select(F.col("j").alias("dim"),
                    F.round(F.col("v") / F.lit(1e6), 6).alias("loading"))


def _power_iterate(cells: DataFrame, rounds: int) -> DataFrame:
    """(j, v) — max-abs-normalized integer power iteration over (i, j,
    c) BIGINT cells (any scale; the per-round normalization is
    scale-invariant).  v lands at 1e6 integer scale; all-ones start."""
    from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

    v = cells.select(F.col("i").alias("j")).distinct().select(
        "j", F.lit(1_000_000).cast("long").alias("v"))
    for _ in range(int(rounds)):
        s = (
            cells.join(v, "j")
            .groupBy(F.col("i"))
            .agg(F.sum(F.col("c") * F.col("v")).alias("s"))
        )
        m = s.agg(F.max(F.abs(F.col("s"))).alias("mx"))
        v = (
            s.crossJoin(F.broadcast(m))
            .select(
                F.col("i").alias("j"),
                F.when(
                    F.col("mx") > 0,
                    F.round((F.col("s") / F.col("mx")) * 1e6, 0).cast("long"),
                ).otherwise(F.lit(0)).alias("v"),
            )
            # tiny table, but the rounds double the join tree without a
            # truncation point (the SALSA catalyst-hang lesson)
            .transform(cheap_localCheckpoint)
        )
    return v


def pca_variance(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounds: int = 8,
) -> DataFrame:
    """One row (lambda_top, trace, explained_pct) — the Rayleigh
    quotient of the converged top component against the gramian trace:
    the 'is one direction carrying the space?' read-out that decides
    whether a 1-d projection (or a whitening step) is worth it.

    All integer arithmetic on down-scaled copies so every product
    chain stays inside int64 (c at 1e3 x v at 1e3 squared x d^2 terms
    ~ 4e16): num = v'Cv and den = v'v fold exactly, lambda and the
    explained share are one rounded division each."""
    cells = _gramian_cells(emb, id_col, vec_col).persist()
    comp = pca_component(emb, id_col, vec_col, rounds=rounds)
    v3 = comp.select(
        F.col("dim"),
        F.round(F.col("loading") * 1e3, 0).cast("long").alias("v3"),
    )
    c3 = cells.select(
        "i", "j", F.round(F.col("c") / F.lit(1000.0), 0).cast("long").alias("c3")
    )
    num = (
        c3.join(v3.select(F.col("dim").alias("i"), F.col("v3").alias("vi")), "i")
        .join(v3.select(F.col("dim").alias("j"), F.col("v3").alias("vj")), "j")
        .agg(F.sum(F.col("c3") * F.col("vi") * F.col("vj")).alias("num"))
    )
    den = v3.agg(F.sum(F.col("v3") * F.col("v3")).alias("den"))
    tr = c3.where(F.col("i") == F.col("j")).agg(
        F.sum("c3").alias("tr3"))
    from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

    out = num.crossJoin(F.broadcast(den)).crossJoin(F.broadcast(tr))
    # materialize the 1-row result so the cell cache can free eagerly
    out = cheap_localCheckpoint(out)
    cells.unpersist()
    return out.select(
        F.round(F.col("num") / (F.col("den") * F.lit(1000.0)), 6)
        .alias("lambda_top"),
        F.round(F.col("tr3") / F.lit(1e3), 6).alias("trace"),
        F.when(
            F.col("tr3") > 0,
            F.round((F.lit(100) * F.col("num"))
                    / (F.col("den") * F.col("tr3")), 6),
        ).alias("explained_pct"),
    )


def pca_second(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounds: int = 8,
) -> DataFrame:
    """(dim, loading) — the SECOND principal component via Hotelling
    deflation: subtract the converged top component's rank-1 term
    lambda * u u' from the gramian, then power-iterate the residual.
    With pca_component this gives the 2-d PCA projection — the
    visualization/whitening plane.

    The deflation stays on the integer ladder: cells and the top
    component re-scale to 1e3 (exact half-up of exact integers), the
    Rayleigh scalars num = v'Cv and den = v'v fold as exact BIGINTs,
    and the rank-1 term round(((num/den) * v_i*v_j) / den) is ONE fixed
    IEEE op chain per cell over engine-identical inputs — the residual
    cells are again exact integers, so the second iteration is as
    deterministic as the first.  Orthogonality to the top component is
    exact to the 1e-3 quantization (asserted in tests), the price of
    cross-engine determinism."""
    cells = _gramian_cells(emb, id_col, vec_col).persist()
    v1 = _power_iterate(cells, rounds)
    v3 = v1.select(
        "j", F.round(F.col("v") / F.lit(1000.0), 0).cast("long").alias("v3"))
    c3 = cells.select(
        "i", "j",
        F.round(F.col("c") / F.lit(1000.0), 0).cast("long").alias("c3"))
    nd = (
        c3.join(v3.select(F.col("j").alias("i"), F.col("v3").alias("vi")), "i")
        .join(v3.select("j", F.col("v3").alias("vj")), "j")
        .agg(F.sum(F.col("c3") * F.col("vi") * F.col("vj")).alias("num"),
             )
        .crossJoin(F.broadcast(
            v3.agg(F.sum(F.col("v3") * F.col("v3")).alias("den"))))
    )
    defl = (
        c3.join(v3.select(F.col("j").alias("i"), F.col("v3").alias("vi")), "i")
        .join(v3.select("j", F.col("v3").alias("vj")), "j")
        .crossJoin(F.broadcast(nd))
        .select(
            "i", "j",
            (F.col("c3")
             - F.round(((F.col("num") / F.col("den"))
                        * (F.col("vi") * F.col("vj"))) / F.col("den"), 0)
             .cast("long")).alias("c"),
        )
    ).persist()
    v2 = _power_iterate(defl, rounds)
    cells.unpersist()
    defl.unpersist()  # both loops checkpoint per round; free the caches
    return v2.select(F.col("j").alias("dim"),
                     F.round(F.col("v") / F.lit(1e6), 6).alias("loading"))


def pca_project(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounds: int = 8,
) -> DataFrame:
    """(id, p1, p2) — every vector projected onto the top-2 principal
    plane (pca_component x pca_second): the 2-d map the embedding
    dashboard actually plots, and the whitening front-end for
    downstream clustering.

    The loadings reassemble in-plan via array_sort(collect_list(
    struct(dim, loading))) — the deterministic order-by-key rebuild
    (the label_centroids idiom), broadcast as one 2-array row against
    the vector scan; each projection is a zip_with/aggregate fold whose
    summation order is the ARRAY order — sequential and engine-fixed
    (the embedding_project precedent), so the raw IEEE dot products
    agree cross-engine and one 6dp round closes it.  Mean-centering
    re-applies the same 6dp-pre-rounded means the gramian used."""
    c1 = pca_component(emb, id_col, vec_col, rounds=rounds)
    c2 = pca_second(emb, id_col, vec_col, rounds=rounds)

    def _arr(comp):
        return comp.agg(
            F.array_sort(F.collect_list(F.struct("dim", "loading")))
            .alias("s")
        ).select(F.transform("s", lambda t: t["loading"]).alias("arr"))

    ex = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))
                     ).alias("dim", "x"),
    )
    means = ex.groupBy("dim").agg(
        F.round(F.sum("x") / F.count("x"), 6).alias("m"))
    marr = means.agg(
        F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("s")
    ).select(F.transform("s", lambda t: t["m"]).alias("marr"))
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    ).crossJoin(F.broadcast(marr)).select(
        "id", F.zip_with("vec", "marr", lambda x, m: x - m).alias("cvec"))
    a1 = _arr(c1).withColumnRenamed("arr", "l1")
    a2 = _arr(c2).withColumnRenamed("arr", "l2")
    j = vecs.crossJoin(F.broadcast(a1)).crossJoin(F.broadcast(a2))
    dot = lambda v, l: F.aggregate(  # noqa: E731
        F.zip_with(v, l, lambda x, y: x * y), F.lit(0.0),
        lambda acc, t: acc + t)
    return j.select(
        "id",
        F.round(dot(F.col("cvec"), F.col("l1")), 6).alias("p1"),
        F.round(dot(F.col("cvec"), F.col("l2")), 6).alias("p2"),
    )


def pca_plane_variance(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounds: int = 8,
) -> DataFrame:
    """One row (lambda1, lambda2, trace, plane_pct) — the two-term scree
    read-out: Rayleigh quotients of BOTH converged components against
    the original gramian, and the variance share the 2-d plane
    (pca_project's target) actually captures.  lambda1 equals
    pca_variance's lambda_top by construction — a visible cross-operator
    consistency check.

    Same integer discipline as pca_variance (1e3-scaled copies, exact
    BIGINT quadratic forms, one division per quotient); plane_pct is
    one fixed IEEE chain over the two quotients and the trace."""
    cells = _gramian_cells(emb, id_col, vec_col).persist()
    c3 = cells.select(
        "i", "j",
        F.round(F.col("c") / F.lit(1000.0), 0).cast("long").alias("c3"))

    def _ray(comp, tag):
        v3 = comp.select(
            F.col("dim"),
            F.round(F.col("loading") * 1e3, 0).cast("long").alias("v3"))
        num = (
            c3.join(v3.select(F.col("dim").alias("i"),
                              F.col("v3").alias("vi")), "i")
            .join(v3.select(F.col("dim").alias("j"),
                            F.col("v3").alias("vj")), "j")
            .agg(F.sum(F.col("c3") * F.col("vi") * F.col("vj"))
                 .alias(f"num{tag}"))
        )
        den = v3.agg(F.sum(F.col("v3") * F.col("v3")).alias(f"den{tag}"))
        return num.crossJoin(F.broadcast(den))

    r1 = _ray(pca_component(emb, id_col, vec_col, rounds=rounds), "1")
    r2 = _ray(pca_second(emb, id_col, vec_col, rounds=rounds), "2")
    tr = c3.where(F.col("i") == F.col("j")).agg(F.sum("c3").alias("tr3"))
    out = r1.crossJoin(F.broadcast(r2)).crossJoin(F.broadcast(tr))
    from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

    out = cheap_localCheckpoint(out)
    cells.unpersist()
    l1 = F.col("num1") / (F.col("den1") * F.lit(1000.0))
    l2 = F.col("num2") / (F.col("den2") * F.lit(1000.0))
    t = F.col("tr3") / F.lit(1e3)
    return out.select(
        F.round(l1, 6).alias("lambda1"),
        F.round(l2, 6).alias("lambda2"),
        F.round(t, 6).alias("trace"),
        F.when(F.col("tr3") > 0,
               F.round((F.lit(100.0) * (l1 + l2)) / t, 6))
        .alias("plane_pct"),
    )


def brute_force_l2_topk(
    emb: DataFrame,
    k: int = 5,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, nbr_id, d2_micro, rank) — EXACT top-k by squared L2,
    in integer micro-space: components are rounded once to 1e-6 units
    (BIGINT), and the distance is the all-integer polarization identity
    d2 = <a,a> + <b,b> - 2<a,b> — an order-FREE fold, so both engines
    rank identically with no float-sum sensitivity (the pca gramian
    lesson).  The metric-matched ground truth for the PQ/ADC index
    (cosine ground truth would conflate metric mismatch with index
    recall).  O(|Q| x N) by design — the documented recall yardstick,
    same fence as brute_force_topk.
    """
    def ivec(c):
        return F.transform(
            c, lambda x: F.round(x.cast("double") * 1_000_000, 0)
            .cast("long"))

    def sq(c):
        return F.aggregate(F.transform(c, lambda x: x * x),
                           F.lit(0).cast("long"), lambda a, x: a + x)

    base = emb.select(F.col(id_col).alias("nbr_id"),
                      ivec(F.col(vec_col)).alias("nv"))
    q = (queries if queries is not None else emb).select(
        F.col(id_col).alias("query_id"), ivec(F.col(vec_col)).alias("qv"))
    dot = F.aggregate(F.zip_with("qv", "nv", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda a, x: a + x)
    pairs = (
        q.crossJoin(base)
        .where(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id",
                (sq(F.col("qv")) + sq(F.col("nv")) - 2 * dot)
                .alias("d2_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2_micro").asc(), F.col("nbr_id").asc())
    return pairs.withColumn(
        "rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_anisotropy(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One row (n_vectors, mean_pairwise_cosine, mean_self_sq) — the
    anisotropy read of an embedding space: the mean cosine between ALL
    distinct vector pairs, computed WITHOUT the O(N^2) pair join via the
    Gram identity  sum_{i!=j} <v_i, v_j> = ||S||^2 - sum_i ||v_i||^2
    with S = sum_i v_i over unit-normalized vectors.  High mean cosine
    = a collapsed/anisotropic space (the known transformer-embedding
    pathology); near 0 = isotropic.

    Determinism: vectors are unit-normalized then component-rounded to
    6dp and lifted to 1e-6 integer units, so the per-dimension sums and
    both quadratic folds are EXACT integers (decimal(38) — S_d^2
    overflows int64 past ~3e3 vectors); float enters only at the final
    two read-out divisions.  One explode + one d-row agg: the shuffle
    carries d partial-sum rows per task, never a pair.

    mean_self_sq reports sum_i ||v^hat_i||^2 / n (~1.0) — the rounding-
    loss sanity check on the normalization.
    """
    v = F.col(vec_col)
    norm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                              F.lit(0.0), lambda a, x: a + x))
    iv = F.transform(
        v, lambda x: F.round(F.round(x / norm, 6) * 1_000_000, 0)
        .cast("long"))
    ex = emb.select(F.posexplode(iv).alias("pos", "val"))
    per_dim = ex.groupBy("pos").agg(
        F.sum("val").alias("s"),
        F.sum(F.col("val").cast("decimal(38,0)") * F.col("val"))
        .alias("self_sq"))
    tot = per_dim.agg(
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s")).alias("ss"),
        F.sum("self_sq").alias("selfsq"))
    n = emb.select(id_col).distinct().count()
    return tot.select(
        F.lit(n).cast("long").alias("n_vectors"),
        F.round(
            (F.col("ss") - F.col("selfsq")).cast("double")
            / F.lit(float(n) * (n - 1)) / F.lit(1e12), 6)
        .alias("mean_pairwise_cosine"),
        F.round(F.col("selfsq").cast("double") / F.lit(float(n))
                / F.lit(1e12), 6).alias("mean_self_sq"))


def kcenter_seeds(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(seed_rank, vec_id, dist_micro) — Gonzalez farthest-point
    traversal: seed 1 is the smallest id; each next seed is the vector
    maximizing its squared-L2 distance (integer micro-space, the
    brute_force_l2_topk domain) to the chosen set, ties to the smallest
    id.  The classic 2-approximation for k-center and the deterministic
    k-means++-style seeding / coreset skeleton.  dist_micro is the
    vector's min distance to the PRIOR seeds at selection (0 for seed 1).

    Scale: k-1 rounds, each ONE incremental min-dist update against the
    newest seed (broadcast 1-row join, O(N) work) + one scalar argmax —
    never a |seeds| x N re-scan; state is lineage-truncated per round
    (engine/ckpt_blocks discipline).
    """
    from plato_spark.engine.ckpt_blocks import checkpoint_tracked

    def ivec(c):
        return F.transform(
            c, lambda x: F.round(x.cast("double") * 1_000_000, 0)
            .cast("long"))

    spark = emb.sparkSession
    vecs = emb.select(F.col(id_col).alias("id"),
                      ivec(F.col(vec_col)).alias("iv"))
    vecs, _ = checkpoint_tracked(vecs)
    first = vecs.orderBy("id").limit(1).collect()[0]
    seeds = [(1, int(first["id"]), 0)]
    d2 = F.aggregate(
        F.zip_with("iv", "sv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda a, x: a + x)
    state = vecs.where(F.col("id") != first["id"]).crossJoin(
        F.broadcast(vecs.where(F.col("id") == first["id"])
                    .select(F.col("iv").alias("sv")))
    ).select("id", "iv", d2.alias("dmin"))
    state, _ = checkpoint_tracked(state)
    for r in range(2, k + 1):
        top = state.orderBy(F.col("dmin").desc(), F.col("id").asc()) \
            .limit(1).collect()
        if not top:
            break
        sid, sdist = int(top[0]["id"]), int(top[0]["dmin"])
        seeds.append((r, sid, sdist))
        sv = vecs.where(F.col("id") == sid).select(
            F.col("iv").alias("sv"))
        state = state.where(F.col("id") != sid).crossJoin(
            F.broadcast(sv)).select(
            "id", "iv", F.least("dmin", d2).alias("dmin"))
        state, _ = checkpoint_tracked(state)
    return spark.createDataFrame(
        seeds, "seed_rank int, vec_id long, dist_micro long")


def davies_bouldin(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, n_members, scatter_sq, worst_ratio) — Davies-Bouldin
    cluster-validity components over the label column, in the SQUARED-
    metric variant so every ingredient stays exact: centroids are
    half-up-rounded integer-micro means, member scatter is the exact
    integer mean squared distance to the centroid, and the per-cluster
    ratio max_{j!=i} (s2_i + s2_j) / d2_ij uses exact-integer-derived
    doubles only in correctly-rounded single divisions (no float SUMS
    anywhere, so no reduce-order sensitivity).  Lower = tighter/better
    separated; the mean of worst_ratio over labels is the index.

    The k x k centroid table is broadcast-small; the heavy pass is one
    member->centroid join, map-side combinable.
    """
    def ivec(c):
        return F.transform(
            c, lambda x: F.round(x.cast("double") * 1_000_000, 0)
            .cast("long"))

    vecs = emb.select(F.col(label_col).alias("label"),
                      ivec(F.col(vec_col)).alias("iv"))
    ex = vecs.select("label", F.posexplode("iv").alias("pos", "val"))
    cent = (
        ex.groupBy("label", "pos")
        .agg(F.round(F.sum("val") / F.count(F.lit(1)), 0)
             .cast("long").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c")))
             .alias("pc"))
        .select("label", F.transform("pc", lambda s: s["c"]).alias("cv"))
    )
    d2 = F.aggregate(
        F.zip_with("iv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda a, x: a + x)
    scat = (
        vecs.join(F.broadcast(cent), "label")
        .select("label", d2.alias("d2"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"),
             F.sum("d2").alias("s2sum"))
    )
    a = scat.join(cent, "label").select(
        F.col("label").alias("li"), F.col("n_members").alias("ni"),
        F.col("s2sum").alias("si"), F.col("cv").alias("ci"))
    b = scat.join(cent, "label").select(
        F.col("label").alias("lj"), F.col("n_members").alias("nj"),
        F.col("s2sum").alias("sj"), F.col("cv").alias("cj"))
    dc2 = F.aggregate(
        F.zip_with("ci", "cj", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda a_, x: a_ + x)
    ratios = (
        a.join(b, F.col("li") != F.col("lj"))
        .select(
            "li", "ni", "si",
            ((F.col("si") / F.col("ni") + F.col("sj") / F.col("nj"))
             / dc2).alias("ratio"))
        .groupBy("li", "ni", "si")
        .agg(F.max("ratio").alias("worst"))
    )
    return ratios.select(
        F.col("li").alias("label"),
        F.col("ni").alias("n_members"),
        F.round(F.col("si") / F.col("ni") / 1e12, 6).alias("scatter_sq"),
        F.round("worst", 6).alias("worst_ratio"))


def snn_clusters(
    emb: DataFrame,
    k: int = 10,
    kt: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster) — Jarvis-Patrick shared-nearest-neighbor
    clustering (Jarvis & Patrick 1973): link u and v when each is in
    the other's k-nearest-neighbor list (MUTUAL kNN) AND the two lists
    share >= kt members; clusters are the connected components of the
    link graph (min-id labels, algos/wcc), unlinked vectors keep their
    own id as singleton clusters.  The density-adaptive clustering
    family beside kmeans (centroid) and SCAN (graph-structural): SNN
    handles variable-density blobs where a global distance threshold
    fails.

    kNN here is the exact cosine top-k (ties by nbr_id — the
    brute_force_topk contract), the documented test-scale yardstick; at
    production scale feed the same JP rule from ivf_ann/lsh_ann lists
    instead.  The JP decision itself is exact integer set arithmetic.
    """
    from plato_spark.algos.wcc import connected_components
    from plato_spark.engine.ckpt_blocks import checkpoint_tracked

    bf = brute_force_topk(emb, k=k, id_col=id_col, vec_col=vec_col) \
        .select("query_id", "nbr_id")
    bf, _ = checkpoint_tracked(bf)
    # mutual kNN pairs, canonical u < v
    fwd = bf.where(F.col("query_id") < F.col("nbr_id")).select(
        F.col("query_id").alias("u"), F.col("nbr_id").alias("v"))
    rev = bf.where(F.col("query_id") > F.col("nbr_id")).select(
        F.col("nbr_id").alias("u"), F.col("query_id").alias("v"))
    mutual = fwd.join(rev, ["u", "v"], "semi")
    # shared-neighbor count over the mutual candidates
    a = bf.select(F.col("query_id").alias("u"), F.col("nbr_id").alias("x"))
    b = bf.select(F.col("query_id").alias("v"), F.col("nbr_id").alias("x"))
    shared = (
        mutual.join(a, "u").join(b, ["v", "x"])
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= kt)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    comp = connected_components(shared).select(
        "id", F.col("component").alias("cluster"))
    ids = emb.select(F.col(id_col).alias("id")).distinct()
    return ids.join(comp, "id", "left").select(
        F.col("id").alias("vec_id"),
        F.coalesce("cluster", F.col("id")).alias("cluster"))


def knn_label_noise(
    emb: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(vec_id, label, n_disagree, suspect) — per-vector label-noise
    audit: among the k exact-cosine nearest neighbors, how many carry a
    DIFFERENT label?  High disagreement flags probable mislabels (the
    classic kNN label-cleaning filter, Wilson editing) — the
    training-data triage step before fitting anything.  suspect is
    pinned at n_disagree >= ceil(0.8 * k).  Exact integer counts over
    the brute_force_topk yardstick lists (production: same rule over
    ivf/lsh lists)."""
    thr = -(-8 * k // 10)  # ceil(0.8k)
    labs = emb.select(F.col(id_col).alias("nbr_id"),
                      F.col(label_col).alias("nbr_label"))
    own = emb.select(F.col(id_col).alias("query_id"),
                     F.col(label_col).alias("label"))
    bf = brute_force_topk(emb, k=k, id_col=id_col, vec_col=vec_col) \
        .select("query_id", "nbr_id")
    dis = (
        bf.join(labs, "nbr_id").join(own, "query_id")
        .groupBy("query_id", "label")
        .agg(F.sum(F.when(F.col("nbr_label") != F.col("label"), 1)
                   .otherwise(0)).cast("long").alias("n_disagree"))
    )
    return dis.select(
        F.col("query_id").alias("vec_id"), "label", "n_disagree",
        (F.col("n_disagree") >= thr).cast("int").alias("suspect"))


def nearest_centroid_accuracy(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, n, n_correct, accuracy) — nearest-centroid (Rocchio)
    classification audit per true label: assign every vector to the
    label whose integer-micro centroid (half-up-rounded per-dim mean,
    the davies_bouldin domain) is nearest in exact squared L2, ties to
    the smallest label, and count agreements.  Centroids include the
    vector itself (documented optimistic bias — the resubstitution
    read); all-integer distances, one rounded division per label."""
    def ivec(c):
        return F.transform(
            c, lambda x: F.round(x.cast("double") * 1_000_000, 0)
            .cast("long"))

    vecs = emb.select(F.col(id_col).alias("id"),
                      F.col(label_col).alias("label"),
                      ivec(F.col(vec_col)).alias("iv"))
    ex = vecs.select("label", F.posexplode("iv").alias("pos", "val"))
    cent = (
        ex.groupBy("label", "pos")
        .agg(F.round(F.sum("val") / F.count(F.lit(1)), 0)
             .cast("long").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c")))
             .alias("pc"))
        .select(F.col("label").alias("clabel"),
                F.transform("pc", lambda s: s["c"]).alias("cv"))
    )
    d2 = F.aggregate(
        F.zip_with("iv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda a, x: a + x)
    w = Window.partitionBy("id").orderBy(
        F.col("d2").asc(), F.col("clabel").asc())
    assigned = (
        vecs.crossJoin(F.broadcast(cent))
        .select("id", "label", "clabel", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return assigned.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("clabel") == F.col("label"), 1).otherwise(0))
        .cast("long").alias("n_correct"),
    ).select(
        "label", "n", "n_correct",
        F.round(F.col("n_correct") / F.col("n"), 6).alias("accuracy"))
