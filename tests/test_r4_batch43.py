"""Round-4 batch 43: embedding anisotropy (Gram trick), Gonzalez
k-center seeds, Davies-Bouldin components."""

from plato_spark.functions.similarity import (
    davies_bouldin,
    embedding_anisotropy,
    kcenter_seeds,
)


def test_anisotropy_hand_mean_cosine(spark):
    # [3,4] normalizes to [0.6,0.8] = same direction as [0.6,0.8];
    # [0,1] vs them: cos = 0.8.  Pairs (ordered, 6): two at 1.0,
    # four at 0.8 -> mean = (2*1.0 + 4*0.8)/6 = 0.866667
    emb = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.6, 0.8]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    r = embedding_anisotropy(emb).collect()[0]
    assert r.n_vectors == 3
    assert r.mean_pairwise_cosine == 0.866667
    assert r.mean_self_sq == 1.0


def test_anisotropy_orthogonal_pair(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    r = embedding_anisotropy(emb).collect()[0]
    assert r.mean_pairwise_cosine == 0.0


def test_kcenter_traversal_on_a_line(spark):
    # 1d points: id1@0, id2@1, id3@10, id4@4 — farthest-point order is
    # 1 (min id), 3 (d2=100), 4 (d2 to {1,3}=16), 2 (d2 to set=1)
    emb = spark.createDataFrame(
        [(1, [0.0]), (2, [1.0]), (3, [10.0]), (4, [4.0])],
        "vec_id long, embedding array<double>")
    out = [(r.seed_rank, r.vec_id, r.dist_micro)
           for r in kcenter_seeds(emb, k=4).collect()]
    assert out == [
        (1, 1, 0),
        (2, 3, 100 * 10**12),
        (3, 4, 16 * 10**12),
        (4, 2, 1 * 10**12),
    ]


def test_kcenter_stops_when_points_exhausted(spark):
    emb = spark.createDataFrame(
        [(1, [0.0]), (2, [5.0])], "vec_id long, embedding array<double>")
    out = kcenter_seeds(emb, k=8).collect()
    assert len(out) == 2  # only 2 points exist


def test_davies_bouldin_two_clean_clusters(spark):
    # label 0: points 0 and 2 (centroid 1, scatter_sq 1.0);
    # label 1: points 10 and 12 (centroid 11, scatter_sq 1.0);
    # centroid d2 = 100 -> worst_ratio = (1+1)/100 = 0.02 for both
    emb = spark.createDataFrame(
        [(1, [0.0], 0), (2, [2.0], 0), (3, [10.0], 1), (4, [12.0], 1)],
        "vec_id long, embedding array<double>, label int")
    out = {r.label: r for r in davies_bouldin(emb).collect()}
    assert out[0].n_members == 2 and out[1].n_members == 2
    assert out[0].scatter_sq == 1.0 and out[1].scatter_sq == 1.0
    assert out[0].worst_ratio == 0.02 and out[1].worst_ratio == 0.02
