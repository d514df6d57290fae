"""Entry-registry queries: similarity domain (split from the former
monolithic __spark_entry__.py; round-5 manifest-ization).
"""

from __future__ import annotations

from plato_spark.entry.common import (  # noqa: F401
    EMB_DIM,
    EMB_SQL_PREFIX,
    F,
    H1_SQL,
    HASH_TRICK_BUCKETS,
    KCENTER_K,
    MATRYOSHKA_DIMS,
    PCA_ROUNDS,
    SNN_K,
    SNN_KT,
    SQL_GRAPH_PREFIX,
    _cos_sql,
    _emb_double,
    _scan_planted_edges,
    _sql_anisotropy,
    _sql_ann_topk,
    _sql_davies_bouldin,
    _sql_embedding_project,
    _sql_embedding_purity,
    _sql_ivf_ann,
    _sql_ivf_recall,
    _sql_kcenter,
    _sql_kmeans,
    _sql_knn_label_noise,
    _sql_l2_topk,
    _sql_label_centroid_ctes,
    _sql_matryoshka_recall,
    _sql_nearest_centroid,
    _sql_norm_quantiles,
    _sql_pca_plane_variance,
    _sql_pca_project,
    _sql_pca_second,
    _sql_pca_variance,
    _sql_pq_ann,
    _sql_rrf_fusion,
    _sql_scan,
    _sql_silhouette,
    _sql_snn,
    brute_force_topk,
    ivf_ann,
    load_table,
    part_cooccurrence_edges,
)


def q_embedding_quantization(spark, sf_dir):
    """Symmetric int8 quantization audit
    (functions/similarity.embedding_quantization): global 127/max|x|
    scale, per-label max/mean reconstruction error with exact-integer
    mean accumulation."""
    from plato_spark.functions.similarity import embedding_quantization

    return embedding_quantization(load_table(spark, sf_dir, "embeddings"))


def q_knn_hubness(spark, sf_dir):
    """In-degree histogram of the k=10 kNN graph: (in_degree,
    n_vertices) — the HUBNESS read-out of the similarity structure.  A
    heavy right tail (a few vertices in everyone's top-10) is the
    classic ANN pathology: those hubs dominate retrieval and drown
    recall; the 0 bin (never anyone's neighbor — anti-hubs) is kept via
    a left join against the full vertex set, because 'how much of the
    graph is unreachable through kNN' is the other half of the signal.
    Composes the proven knn_graph kernel; two map-side-combined
    aggs."""
    from plato_spark.functions.recommend import knn_graph

    canon = part_cooccurrence_edges(spark, sf_dir, weighted=True)
    knn = knn_graph(canon, k=10)
    verts = (
        canon.select(F.col("src").alias("id"))
        .unionByName(canon.select(F.col("dst").alias("id")))
        .distinct()
    )
    ind = knn.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("ind"))
    per = verts.join(ind, "id", "left").select(
        F.coalesce(F.col("ind"), F.lit(0)).cast("long").alias("in_degree"))
    return per.groupBy("in_degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"))


def q_pca_second(spark, sf_dir):
    """Second principal component via integer Hotelling deflation
    (functions/similarity.pca_second): rank-1 term subtracted on the
    exact-integer ladder, then the same pinned power iteration."""
    from plato_spark.functions.similarity import pca_second

    return pca_second(load_table(spark, sf_dir, "embeddings"),
                      rounds=PCA_ROUNDS)


def q_pca_project(spark, sf_dir):
    """2-d principal-plane projection of every embedding
    (functions/similarity.pca_project): in-plan loading reassembly,
    order-fixed array-fold dot products, one 6dp round."""
    from plato_spark.functions.similarity import pca_project

    return pca_project(load_table(spark, sf_dir, "embeddings"),
                       rounds=PCA_ROUNDS)


def q_pca_plane_variance(spark, sf_dir):
    """Two-term scree read-out (functions/similarity.pca_plane_variance):
    Rayleigh quotients of both components vs the original gramian and
    the 2-d plane's variance share; lambda1 must equal pca_variance's
    lambda_top — a cross-operator consistency check the gate sees."""
    from plato_spark.functions.similarity import pca_plane_variance

    return pca_plane_variance(load_table(spark, sf_dir, "embeddings"),
                              rounds=PCA_ROUNDS)


def q_pca_variance(spark, sf_dir):
    """Rayleigh quotient + trace share of the top principal component
    (functions/similarity.pca_variance): down-scaled exact integer
    quadratic form, one rounded division per output."""
    from plato_spark.functions.similarity import pca_variance

    return pca_variance(load_table(spark, sf_dir, "embeddings"),
                        rounds=PCA_ROUNDS)


def q_pq_ann(spark, sf_dir):
    """Product-quantization ANN (functions/pq): m=4 x 16-dim subspaces,
    16 codewords each, integer-nano ADC top-5 per vector."""
    from plato_spark.functions.pq import pq_ann

    return pq_ann(load_table(spark, sf_dir, "embeddings"),
                  m=4, k_c=16, lloyd_iters=2, k=5)


def q_copurchase(spark, sf_dir):
    """Item-to-item collaborative filtering: top-5 cosine co-purchase
    recommendations per part over the customer x part incidence
    (functions/recommend; basket cap 256)."""
    from plato_spark.functions.recommend import co_purchase_topk

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    inc = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).select(
        F.col("o_custkey").alias("user"), F.col("l_partkey").alias("item")
    )
    out = co_purchase_topk(inc, k=5, max_basket=256)
    return out.withColumn("score", F.round("score", 6))


def q_knn_graph(spark, sf_dir):
    """kNN sparsification of the weighted co-occurrence graph: each
    vertex keeps its 10 strongest edges (weight DESC, dst ASC)
    (functions/recommend.knn_graph)."""
    from plato_spark.functions.recommend import knn_graph

    return knn_graph(part_cooccurrence_edges(spark, sf_dir, weighted=True),
                     k=10)


def q_ann_topk(spark, sf_dir):
    return brute_force_topk(_emb_double(spark, sf_dir), k=5)


def q_ivf_ann(spark, sf_dir):
    return ivf_ann(
        _emb_double(spark, sf_dir), k=5, n_clusters=8, n_probe=2, lloyd_iters=2
    )


def q_kmeans_clusters(spark, sf_dir):
    """Deterministic k-means document clustering over the embedding
    column — the topic-bucketing / corpus-mixing step of a training-data
    pipeline (and the ivf_ann index build, here graded standalone)."""
    from plato_spark.functions.similarity import kmeans_clusters

    return kmeans_clusters(
        _emb_double(spark, sf_dir), n_clusters=8, lloyd_iters=2
    )


def q_embedding_project(spark, sf_dir):
    """Rademacher random projection 64d -> 16d (deterministic JL sketch;
    scale 0.25 is exact). The dimensionality-reduction step before
    clustering / ANN over very wide embedding columns.

    Gate shape: the library returns (vec_id, proj: array<double>), but
    the driver's pandas canonicalizer cannot sort/hash list cells (the
    one red row of round 3) — so this wrapper posexplodes the projection
    to one (vec_id, dim, value) row per coordinate.  dim=64 is passed so
    the plan stays action-free until the driver collects."""
    from plato_spark.functions.similarity import embedding_project

    proj = embedding_project(_emb_double(spark, sf_dir), out_dim=16, dim=64)
    return proj.select(
        "vec_id", F.posexplode("proj").alias("dim", "value")
    ).select("vec_id", F.col("dim").cast("int").alias("dim"), "value")


def q_embedding_purity(spark, sf_dir):
    """Nearest-centroid classification purity of the embedding space
    (functions/similarity.embedding_purity): broadcast 6dp-pre-rounded
    label centroids, 9dp-rounded argmax sim with smallest-label ties,
    exact integer counts per true label."""
    from plato_spark.functions.similarity import embedding_purity

    return embedding_purity(load_table(spark, sf_dir, "embeddings"))


def q_silhouette(spark, sf_dir):
    """Per-label simplified (centroid-based) silhouette
    (functions/similarity.silhouette): 6dp-pre-rounded centroids,
    9dp-rounded cosines, exact-integer mean accumulation (s * 1e9 as
    BIGINT), one IEEE division per label."""
    from plato_spark.functions.similarity import silhouette

    return silhouette(load_table(spark, sf_dir, "embeddings"))


def q_norm_quantiles(spark, sf_dir):
    """Embedding L2-norm distribution (p50/p90/p99 via the histogram
    kernel): the health check before cosine ANN — wildly varying norms
    mean dot-product shortcuts and IVF assignments quietly disagree
    with cosine.  Norms are per-row array folds (sequential,
    engine-fixed order — the embedding_project precedent) rounded 6dp
    before binning."""
    from plato_spark.functions.quantiles import histogram_quantiles

    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        F.round(
            F.sqrt(F.aggregate(
                F.transform("embedding", lambda x: x.cast("double")),
                F.lit(0.0), lambda acc, x: acc + x * x)),
            6,
        ).alias("nrm")
    )
    return histogram_quantiles(norms, "nrm", quantiles=(0.5, 0.9, 0.99),
                               nbins=256)


def q_ivf_recall(spark, sf_dir):
    """Recall@5 of the IVF index against the exact-cosine baseline, per
    query — measure-don't-guess promoted to a first-class oracle row:
    hits = |ivf top-5 ∩ brute top-5| as exact integers (the BENCH recall
    sweep's gate-checkable sibling)."""
    from plato_spark.functions.similarity import brute_force_topk, ivf_ann

    emb = _emb_double(spark, sf_dir)
    bf = brute_force_topk(emb, k=5).select("query_id", "nbr_id")
    iv = ivf_ann(emb, k=5, n_clusters=8, n_probe=2, lloyd_iters=2).select(
        "query_id", "nbr_id"
    )
    hits = (
        bf.join(iv, ["query_id", "nbr_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        bf.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select("query_id",
                F.coalesce("hits", F.lit(0)).cast("long").alias("hits"))
    )


def q_centroid_similarity(spark, sf_dir):
    """Pairwise cosine between per-label embedding centroids
    (functions/similarity.label_centroid_similarity): 6dp-pre-rounded
    per-dimension means, one deterministic cosine per label pair —
    the cluster-separation audit of the embedding space."""
    from plato_spark.functions.similarity import label_centroid_similarity

    return label_centroid_similarity(load_table(spark, sf_dir, "embeddings"))


def q_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of the exact-cosine and IVF neighbor lists
    (functions/similarity.rrf_fusion): rank-only channel combination,
    fused top-5 per query under the raw-score total order."""
    from plato_spark.functions.similarity import (
        brute_force_topk,
        ivf_ann,
        rrf_fusion,
    )

    emb = _emb_double(spark, sf_dir)
    return rrf_fusion(
        [brute_force_topk(emb, k=5),
         ivf_ann(emb, k=5, n_clusters=8, n_probe=2, lloyd_iters=2)],
        k=5,
    )


def q_scan_clusters(spark, sf_dir):
    """SCAN structural clustering (algos/scan, Xu et al. KDD'07) on the
    planted-community fixture: exact-integer ε-similarity (no sqrt —
    rational ε, squared comparison), hash-min components over the
    core-core ε-subgraph, pinned min-cluster border attachment, and the
    hub/outlier read-out Louvain and LPA cannot give.  ε = 3/5, μ = 3."""
    from plato_spark.algos.scan import scan_clusters

    return scan_clusters(_scan_planted_edges(spark, sf_dir),
                         eps_num=3, eps_den=5, mu=3)


def q_pq_recall(spark, sf_dir):
    """Recall@5 of the PQ/ADC index against the METRIC-MATCHED exact
    baseline — integer-micro squared L2 (similarity.brute_force_l2_topk,
    order-free polarization identity), not cosine, so the row measures
    quantization loss alone.  Completes the recall family next to
    ivf_recall and lsh_recall: every ANN index in the repo now carries a
    gate-checked recall number."""
    from plato_spark.functions.pq import pq_ann
    from plato_spark.functions.similarity import brute_force_l2_topk

    emb = load_table(spark, sf_dir, "embeddings")
    bf = brute_force_l2_topk(emb, k=5).select("query_id", "nbr_id")
    pq = pq_ann(emb, m=4, k_c=16, lloyd_iters=2, k=5).select(
        "query_id", "nbr_id")
    hits = (
        bf.join(pq, ["query_id", "nbr_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        bf.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select("query_id",
                F.coalesce("hits", F.lit(0)).cast("long").alias("hits"))
    )


def q_matryoshka_recall(spark, sf_dir):
    """Recall@5 of PREFIX-dimension search (first 16 of 64 dims) vs the
    full-dimension exact cosine top-5 — the matryoshka/truncation
    question ('how much index do the first dims buy?') as a
    gate-checked number.  Queries are a ~10% hash-picked sample
    (portable md5), the scale shape: at 100 TB the sampled-query recall
    audit is O(|Q| x N) instead of O(N^2)."""
    from plato_spark.functions.similarity import brute_force_topk
    from plato_spark.functions.text import portable_h1

    emb = _emb_double(spark, sf_dir)
    qs = emb.where(F.pmod(
        portable_h1(F.concat(F.lit("mat|"),
                             F.col("vec_id").cast("string"))),
        F.lit(10)) == 0)
    full = brute_force_topk(emb, k=5, queries=qs).select(
        "query_id", "nbr_id")
    pe = emb.select(
        "vec_id", F.slice("embedding", 1, MATRYOSHKA_DIMS)
        .alias("embedding"))
    pq_ = qs.select(
        "vec_id", F.slice("embedding", 1, MATRYOSHKA_DIMS)
        .alias("embedding"))
    pref = brute_force_topk(pe, k=5, queries=pq_).select(
        "query_id", "nbr_id")
    hits = (
        full.join(pref, ["query_id", "nbr_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        full.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select("query_id",
                F.coalesce("hits", F.lit(0)).cast("long").alias("hits"))
    )


def q_clustering_agreement(spark, sf_dir):
    """Exact Rand index between two INDEPENDENT clusterings of the
    embeddings — deterministic k-means (centroid paradigm) vs
    Jarvis-Patrick SNN (density paradigm): pair-counting agreement from
    the contingency table, ALL integer binomials (sum C(nij,2) etc.),
    one division — the cross-method stability read that tells you
    whether cluster structure is real or an artifact of one algorithm's
    bias."""
    from plato_spark.functions.similarity import (
        kmeans_clusters,
        snn_clusters,
    )

    emb = _emb_double(spark, sf_dir)
    km = kmeans_clusters(emb, n_clusters=8, lloyd_iters=2).select(
        F.col("vec_id").alias("id"), F.col("cluster").alias("ka"))
    sn = snn_clusters(emb, k=SNN_K, kt=SNN_KT).select(
        F.col("vec_id").alias("id"), F.col("cluster").alias("kb"))
    j = km.join(sn, "id")
    cont = j.groupBy("ka", "kb").agg(
        F.count(F.lit(1)).cast("long").alias("m"))
    a_m = j.groupBy("ka").agg(F.count(F.lit(1)).cast("long").alias("c"))
    b_m = j.groupBy("kb").agg(F.count(F.lit(1)).cast("long").alias("c"))

    def pairs(df):
        return df.agg(F.sum(F.col("c") * (F.col("c") - 1) / 2)
                      .cast("long")).collect()[0][0] or 0

    n = j.count()
    both = cont.agg(F.sum(F.col("m") * (F.col("m") - 1) / 2)
                    .cast("long")).collect()[0][0] or 0
    pa, pb = pairs(a_m), pairs(b_m)
    total = n * (n - 1) // 2
    out = spark.createDataFrame(
        [(n, pa, pb, both, total)],
        "n long, pairs_a long, pairs_b long, pairs_both long, "
        "pairs_total long")
    return out.select(
        "*",
        F.round((F.col("pairs_total") + 2 * F.col("pairs_both")
                 - F.col("pairs_a") - F.col("pairs_b"))
                / F.col("pairs_total"), 6).alias("rand_index"))


def q_rbm_pairs(spark, sf_dir):
    """Reciprocal-best-match pairs over the embeddings: (a, b, cosine)
    where b is a's exact-cosine top-1 neighbor AND a is b's — the
    mutual-NN matching used for high-precision alignment/dedup seeding
    (each vector appears in at most one pair; a greedy matching with
    zero parameter choices).  Built from the brute_force_topk yardstick
    lists; production feeds the same rule from ivf/lsh."""
    from plato_spark.functions.similarity import brute_force_topk

    bf = brute_force_topk(_emb_double(spark, sf_dir), k=1).select(
        "query_id", "nbr_id", "cosine")
    fwd = bf.where(F.col("query_id") < F.col("nbr_id")).select(
        F.col("query_id").alias("a"), F.col("nbr_id").alias("b"),
        "cosine")
    rev = bf.where(F.col("query_id") > F.col("nbr_id")).select(
        F.col("nbr_id").alias("a"), F.col("query_id").alias("b"))
    return fwd.join(rev, ["a", "b"], "semi")


def q_hashing_trick_audit(spark, sf_dir):
    """Feature-hashing collision audit: the corpus vocabulary hashed
    into HASH_TRICK_BUCKETS buckets (portable md5 % 4096 — the
    hashing-trick a wide-feature model actually ships), one row of
    exact collision stats: distinct tokens, buckets used, max bucket
    load, tokens sharing a bucket, and the colliding fraction.  The
    number that decides whether 2^12 features is enough."""
    from plato_spark.functions.text import portable_h1

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.regexp_extract_all(
            "text", F.lit("[A-Za-z0-9_]+"), F.lit(0))).alias("token")
    ).distinct()
    bucketed = toks.select(
        "token",
        F.pmod(portable_h1(F.col("token")),
               F.lit(HASH_TRICK_BUCKETS)).alias("b"))
    loads = bucketed.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("load"))
    return loads.agg(
        F.sum("load").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        F.max("load").cast("long").alias("max_bucket_load"),
        F.sum(F.when(F.col("load") >= 2, F.col("load")).otherwise(0))
        .cast("long").alias("n_tokens_colliding"),
    ).select(
        "*",
        F.round(F.col("n_tokens_colliding") / F.col("n_tokens"), 6)
        .alias("pct_colliding"))


def q_knn_label_noise(spark, sf_dir):
    """kNN label-noise triage (similarity.knn_label_noise, Wilson
    editing): per vector, the count of exact-cosine top-10 neighbors
    carrying a different label; suspect = disagreement >= 8/10.  The
    mislabel sweep a labeled training corpus runs before any fit."""
    from plato_spark.functions.similarity import knn_label_noise

    return knn_label_noise(load_table(spark, sf_dir, "embeddings"), k=10)


def q_nearest_centroid_accuracy(spark, sf_dir):
    """Nearest-centroid (Rocchio) resubstitution accuracy per label
    (similarity.nearest_centroid_accuracy): integer-micro centroids,
    exact squared-L2 assignment with smallest-label ties — the
    linear-separability read of the labeled embedding space."""
    from plato_spark.functions.similarity import nearest_centroid_accuracy

    return nearest_centroid_accuracy(load_table(spark, sf_dir,
                                                "embeddings"))


def q_snn_clusters(spark, sf_dir):
    """Jarvis-Patrick shared-nearest-neighbor clustering over the
    embeddings (similarity.snn_clusters): mutual-kNN links with >= kt
    shared neighbors, min-id components, singletons keep their id — the
    density-adaptive clustering family beside kmeans (centroid) and
    SCAN (graph-structural).  kNN source is the exact top-k yardstick
    at gate scale; the JP rule itself is exact integer set arithmetic."""
    from plato_spark.functions.similarity import snn_clusters

    return snn_clusters(_emb_double(spark, sf_dir), k=SNN_K, kt=SNN_KT)


def q_embedding_anisotropy(spark, sf_dir):
    """Corpus-level embedding anisotropy (similarity.embedding_anisotropy):
    mean pairwise cosine over ALL distinct pairs WITHOUT the O(N^2)
    join — Gram identity over unit-normalized 6dp-rounded integer-micro
    vectors, exact decimal folds, float only in the two read-outs.  The
    collapsed-space health check that gates every downstream ANN row."""
    from plato_spark.functions.similarity import embedding_anisotropy

    return embedding_anisotropy(load_table(spark, sf_dir, "embeddings"))


def q_kcenter_seeds(spark, sf_dir):
    """Gonzalez farthest-point traversal (similarity.kcenter_seeds):
    the deterministic k-center 2-approximation / coreset skeleton —
    k-1 rounds of ONE incremental min-dist update (broadcast newest
    seed) + one scalar argmax, integer-micro squared L2 throughout.
    The oracle unrolls the identical traversal."""
    from plato_spark.functions.similarity import kcenter_seeds

    return kcenter_seeds(load_table(spark, sf_dir, "embeddings"),
                         k=KCENTER_K)


def q_davies_bouldin(spark, sf_dir):
    """Davies-Bouldin cluster-validity components per ground-truth
    label (similarity.davies_bouldin, squared-metric variant): exact
    integer centroids/scatters, no float sums anywhere — only
    correctly-rounded single divisions, so both engines agree without
    reduce-order caveats.  Completes the cluster-quality family beside
    silhouette and embedding_purity."""
    from plato_spark.functions.similarity import davies_bouldin

    return davies_bouldin(load_table(spark, sf_dir, "embeddings"))


QUERIES = {
    "embedding_project": q_embedding_project,
    "centroid_similarity": q_centroid_similarity,
    "ivf_recall": q_ivf_recall,
    "rrf_fusion": q_rrf_fusion,
    "embedding_purity": q_embedding_purity,
    "silhouette": q_silhouette,
    "knn_hubness": q_knn_hubness,
    "pca_variance": q_pca_variance,
    "pca_second": q_pca_second,
    "pca_plane_variance": q_pca_plane_variance,
    "pca_project": q_pca_project,
    "norm_quantiles": q_norm_quantiles,
    "embedding_quantization": q_embedding_quantization,
    "copurchase_topk": q_copurchase,
    "knn_graph": q_knn_graph,
    "pq_ann": q_pq_ann,
    "kmeans_clusters": q_kmeans_clusters,
    "ann_topk": q_ann_topk,
    "ivf_ann": q_ivf_ann,
    "scan_clusters": q_scan_clusters,
    "pq_recall": q_pq_recall,
    "matryoshka_recall": q_matryoshka_recall,
    "embedding_anisotropy": q_embedding_anisotropy,
    "kcenter_seeds": q_kcenter_seeds,
    "davies_bouldin": q_davies_bouldin,
    "snn_clusters": q_snn_clusters,
    "knn_label_noise": q_knn_label_noise,
    "nearest_centroid_accuracy": q_nearest_centroid_accuracy,
    "rbm_pairs": q_rbm_pairs,
    "hashing_trick_audit": q_hashing_trick_audit,
    "clustering_agreement": q_clustering_agreement,
}


ORACLES = {
    "embedding_project": _sql_embedding_project(16),
    "centroid_similarity": f"""
WITH {_sql_label_centroid_ctes()}
SELECT a.label AS label_a, b.label AS label_b, a.n AS n_a, b.n AS n_b,
       round({_cos_sql("a.cvec", "b.cvec")}, 6) AS cosine
FROM cj a JOIN cj b ON a.label < b.label
ORDER BY label_a, label_b""",
    "ivf_recall": _sql_ivf_recall(5),
    "rrf_fusion": _sql_rrf_fusion(5),
    "embedding_purity": _sql_embedding_purity(),
    "silhouette": _sql_silhouette(),
    "knn_hubness": SQL_GRAPH_PREFIX + """
, knn AS MATERIALIZED (
  SELECT dst FROM (
    SELECT dst, row_number() OVER (
      PARTITION BY src ORDER BY weight DESC, dst ASC) AS rank
    FROM edges) r
  WHERE rank <= 10),
ind AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS ind
        FROM knn GROUP BY dst)
SELECT COALESCE(i.ind, 0) AS in_degree,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM verts v LEFT JOIN ind i ON v.id = i.id
GROUP BY COALESCE(i.ind, 0) ORDER BY in_degree""",
    "pca_variance": _sql_pca_variance(PCA_ROUNDS),
    "pca_second": _sql_pca_second(PCA_ROUNDS),
    "pca_plane_variance": _sql_pca_plane_variance(PCA_ROUNDS),
    "pca_project": _sql_pca_project(PCA_ROUNDS),
    "norm_quantiles": _sql_norm_quantiles(256),
    "embedding_quantization": """
WITH v AS MATERIALIZED (
  SELECT vec_id AS id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
g AS (SELECT max(list_max(list_transform(vec, x -> abs(x)))) AS maxabs
      FROM v),
per AS MATERIALIZED (
  SELECT id, label,
         CASE WHEN g.maxabs > 0 THEN
           list_max(list_transform(vec, x ->
             abs(x - greatest(least(round(x * (127.0 / g.maxabs), 0),
                                    127.0), -127.0)
                     / (127.0 / g.maxabs))))
         ELSE 0.0 END AS verr
  FROM v, g)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(max(verr), 6) AS max_err,
       round(CAST(sum(CAST(round(round(verr, 9) * 1e9, 0) AS BIGINT))
                  AS DOUBLE) / (count(*) * 1e9), 6) AS mean_err
FROM per GROUP BY label ORDER BY label""",
    "copurchase_topk": """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
ok AS (SELECT u FROM inc GROUP BY u HAVING count(*) <= 256),
inc2 AS MATERIALIZED (SELECT i.u, i.i FROM inc i JOIN ok ON i.u = ok.u),
deg AS MATERIALIZED (
  SELECT i, CAST(count(*) AS BIGINT) AS d FROM inc2 GROUP BY i),
co AS MATERIALIZED (
  SELECT a.i AS x, b.i AS y, CAST(count(*) AS BIGINT) AS co
  FROM inc2 a JOIN inc2 b ON a.u = b.u AND a.i < b.i GROUP BY a.i, b.i),
bo AS (SELECT x, y, co FROM co
       UNION ALL SELECT y AS x, x AS y, co FROM co),
s AS (SELECT bo.x AS item, bo.y AS rec, bo.co / sqrt(dx.d * dy.d) AS score
      FROM bo JOIN deg dx ON bo.x = dx.i JOIN deg dy ON bo.y = dy.i),
r AS (SELECT item, rec, score,
             CAST(row_number() OVER (
               PARTITION BY item ORDER BY score DESC, rec ASC)
             AS INTEGER) AS rank
      FROM s)
SELECT item, rec, round(score, 6) AS score, rank FROM r WHERE rank <= 5
ORDER BY item, rank""",
    "knn_graph": SQL_GRAPH_PREFIX + """
SELECT src, dst, weight, rank FROM (
  SELECT src, dst, weight,
         CAST(row_number() OVER (
           PARTITION BY src ORDER BY weight DESC, dst ASC)
         AS INTEGER) AS rank
  FROM edges) r
WHERE rank <= 10 ORDER BY src, rank""",
    "pq_ann": _sql_pq_ann(4, 16, 2, 64, 5),
    "kmeans_clusters": _sql_kmeans(8, 2),
    "ann_topk": _sql_ann_topk(5),
    "ivf_ann": _sql_ivf_ann(5),
    "scan_clusters": _sql_scan(6),
    "pq_recall": f"""
WITH bf AS MATERIALIZED ({_sql_l2_topk(5)}),
pqt AS MATERIALIZED ({_sql_pq_ann(4, 16, 2, 64, 5)}),
h AS (SELECT b.query_id, CAST(count(*) AS BIGINT) AS hits
      FROM bf b JOIN pqt ON b.query_id = pqt.query_id
                        AND b.nbr_id = pqt.nbr_id
      GROUP BY b.query_id)
SELECT q.query_id, COALESCE(h.hits, 0) AS hits
FROM (SELECT DISTINCT query_id FROM bf) q
LEFT JOIN h ON q.query_id = h.query_id ORDER BY q.query_id""",
    "matryoshka_recall": _sql_matryoshka_recall(5, MATRYOSHKA_DIMS),
    "embedding_anisotropy": _sql_anisotropy(EMB_DIM),
    "kcenter_seeds": _sql_kcenter(KCENTER_K),
    "davies_bouldin": _sql_davies_bouldin(EMB_DIM),
    "snn_clusters": _sql_snn(SNN_K, SNN_KT, 10),
    "knn_label_noise": _sql_knn_label_noise(10),
    "nearest_centroid_accuracy": _sql_nearest_centroid(EMB_DIM),
    "rbm_pairs": EMB_SQL_PREFIX + f""",
b1 AS MATERIALIZED (
  SELECT query_id, nbr_id, cosine FROM (
    SELECT a.id AS query_id, b.id AS nbr_id,
           round({_cos_sql("a.vec", "b.vec")}, 6) AS cosine,
           row_number() OVER (PARTITION BY a.id
                              ORDER BY round({_cos_sql("a.vec", "b.vec")},
                                             6) DESC, b.id ASC) AS rn
    FROM v a JOIN v b ON a.id != b.id) t WHERE rn = 1)
SELECT f.query_id AS a, f.nbr_id AS b, f.cosine
FROM b1 f
WHERE f.query_id < f.nbr_id
  AND EXISTS (SELECT 1 FROM b1 r
              WHERE r.query_id = f.nbr_id AND r.nbr_id = f.query_id)
ORDER BY a""",
    "hashing_trick_audit": f"""
WITH toks AS (
  SELECT DISTINCT unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
    AS token
  FROM documents),
bk AS (SELECT token,
              {H1_SQL.format(s='token')} % {HASH_TRICK_BUCKETS} AS b
       FROM toks),
ld AS (SELECT b, CAST(count(*) AS BIGINT) AS load FROM bk GROUP BY b)
SELECT CAST(sum(load) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_buckets_used,
       CAST(max(load) AS BIGINT) AS max_bucket_load,
       CAST(sum(CASE WHEN load >= 2 THEN load ELSE 0 END) AS BIGINT)
         AS n_tokens_colliding,
       round(CAST(sum(CASE WHEN load >= 2 THEN load ELSE 0 END)
                  AS DOUBLE) / sum(load), 6) AS pct_colliding
FROM ld""",
    "clustering_agreement": f"""
WITH kac AS MATERIALIZED (
  SELECT vec_id AS id, cluster AS a FROM ({_sql_kmeans(8, 2)})),
kbc AS MATERIALIZED (
  SELECT vec_id AS id, cluster AS b
  FROM ({_sql_snn(SNN_K, SNN_KT, 10)})),
jj AS MATERIALIZED (
  SELECT kac.id, a, b FROM kac JOIN kbc ON kac.id = kbc.id),
ct AS (SELECT a, b, CAST(count(*) AS BIGINT) AS m FROM jj GROUP BY 1, 2),
am AS (SELECT a, CAST(count(*) AS BIGINT) AS c FROM jj GROUP BY 1),
bm AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM jj GROUP BY 1),
s AS (SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM jj) AS n,
  (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0) AS BIGINT) FROM am)
    AS pairs_a,
  (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0) AS BIGINT) FROM bm)
    AS pairs_b,
  (SELECT CAST(COALESCE(sum(m * (m - 1) // 2), 0) AS BIGINT) FROM ct)
    AS pairs_both)
SELECT n, pairs_a, pairs_b, pairs_both,
       CAST(n * (n - 1) // 2 AS BIGINT) AS pairs_total,
       round(CAST(n * (n - 1) // 2 + 2 * pairs_both - pairs_a - pairs_b
                  AS DOUBLE) / (n * (n - 1) // 2), 6) AS rand_index
FROM s""",
}
