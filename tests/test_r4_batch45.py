"""Round-4 batch 45: 1-WL refinement, kNN label-noise triage,
nearest-centroid accuracy."""

from plato_spark.algos.wl import wl_colors
from plato_spark.functions.similarity import (
    knn_label_noise,
    nearest_centroid_accuracy,
)


def test_wl_path_endpoints_vs_middle(spark):
    # P3: endpoints are 1-WL-equivalent forever; the middle differs
    # from round 1 on
    canon = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {r.id: r.color for r in wl_colors(canon, rounds=3).collect()}
    assert out[1] == out[3]
    assert out[1] != out[2]


def test_wl_cycle_stays_uniform(spark):
    # C4 is vertex-transitive: 1-WL can never split it
    canon = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "src long, dst long")
    out = {r.color for r in wl_colors(canon, rounds=3).collect()}
    assert len(out) == 1


def test_wl_separates_degree_classes_round1(spark):
    # star K1,3: hub vs leaves split immediately
    canon = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long")
    out = {r.id: r.color for r in wl_colors(canon, rounds=1).collect()}
    assert out[1] == out[2] == out[3]
    assert out[0] != out[1]


def test_knn_label_noise_flags_planted_mislabel(spark):
    # 5-point directional blob, one mislabeled: its 4 neighbors all
    # disagree -> n_disagree 4 >= ceil(0.8*4) = 4 -> suspect
    pts = [(1, [1.0, 0.00], 0), (2, [1.0, 0.01], 0),
           (3, [1.0, 0.02], 1), (4, [1.0, 0.03], 0),
           (5, [1.0, 0.04], 0)]
    emb = spark.createDataFrame(
        pts, "vec_id long, embedding array<double>, label int")
    out = {r.vec_id: r for r in knn_label_noise(emb, k=4).collect()}
    assert out[3].n_disagree == 4 and out[3].suspect == 1
    assert out[1].n_disagree == 1 and out[1].suspect == 0


def test_nearest_centroid_accuracy_with_planted_noise(spark):
    # label 0: 0 and 2 (centroid 1); label 1: 10, 12 and a stray 3
    # (centroid 8.333...): the stray lands nearer centroid 0 ->
    # label-1 accuracy 2/3
    emb = spark.createDataFrame(
        [(1, [0.0], 0), (2, [2.0], 0),
         (3, [10.0], 1), (4, [12.0], 1), (5, [3.0], 1)],
        "vec_id long, embedding array<double>, label int")
    out = {r.label: r for r in nearest_centroid_accuracy(emb).collect()}
    assert out[0].n == 2 and out[0].n_correct == 2
    assert out[0].accuracy == 1.0
    assert out[1].n == 3 and out[1].n_correct == 2
    assert out[1].accuracy == 0.666667
