"""Round-4 batch 27: landmark-stretch audit + join-skew dashboard."""

from pyspark.sql import functions as F

from plato_spark.algos.closeness import landmark_stretch
from plato_spark.functions.relational import join_skew_audit


def test_landmark_stretch_path_graph_hand_histogram(spark):
    # path 0-1-2-3, landmark {0}, eval roots {1,2,3}:
    # est(r,v) = r + v, exact = |r - v|, stretch = 2*min(r,v).
    # pairs (r, v!=r): stretch 0 x3 (v=0), 2 x4, 4 x2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long")
    got = {r.stretch: r.n_pairs
           for r in landmark_stretch(edges, num_roots=4,
                                     num_landmarks=1).collect()}
    assert got == {0: 3, 2: 4, 4: 2}


def test_landmark_stretch_landmark_on_every_path_is_tight(spark):
    # star: center 0, leaves 1..4.  landmark {0} sits on EVERY shortest
    # path, so the estimate is exact for leaf-leaf pairs (stretch 0)
    # and overshoots only leaf->center pairs (est 2, exact 1).
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long")
    got = {r.stretch: r.n_pairs
           for r in landmark_stretch(edges, num_roots=5,
                                     num_landmarks=1).collect()}
    # eval roots 1..4: v=center (4 pairs, est d(0,r)+0=1 exact 1 -> 0);
    # v=other leaf (12 pairs, est 2 exact 2 -> 0)
    assert got == {0: 16}


def test_join_skew_audit_exact_factors(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 13)], "a long, b long")
    got = {r.key_col: (r.n_rows, r.n_keys, r.max_key_rows,
                       r.skew_factor, r.top_share)
           for r in join_skew_audit(df, keys=("a", "b")).collect()}
    assert got == {
        "a": (4, 2, 3, 1.5, 0.75),
        "b": (4, 4, 1, 1.0, 0.25),
    }
