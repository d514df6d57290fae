"""Modularity: hand-computed fixtures (exact integer fold)."""

import pyspark.sql.functions as F

from plato_spark.algos.modularity import modularity


def test_two_triangles_bridge(spark):
    # triangles {0,1,2} and {3,4,5} joined by bridge (2,3); W=7
    # partition = the two triangles: w_c=3 each, d_c=7 each
    # NUM = 2*(4*7*3 - 49) = 70; Q = 70/196 = 0.35714285...
    canon = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(i, 0) for i in range(3)] + [(i, 1) for i in range(3, 6)],
        "id long, community long",
    )
    row = modularity(canon, labels).first()
    assert row.n_communities == 2
    assert row.intra_weight == 6
    assert row.modularity == round(70 / 196, 6)


def test_all_in_one_community_is_zero(spark):
    # single community: w_c = W, d_c = 2W -> NUM = 4W^2 - 4W^2 = 0
    canon = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    labels = spark.createDataFrame(
        [(i, 9) for i in range(4)], "id long, community long"
    )
    row = modularity(canon, labels).first()
    assert row.modularity == 0.0


def test_weighted_matches_duplicated_unweighted(spark):
    # integral weight w == the same edge repeated w times in parallel
    pairs = [(0, 1, 3), (1, 2, 2), (0, 2, 1), (2, 3, 1)]
    canon_w = spark.createDataFrame(pairs, "src long, dst long, weight long")
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1)], "id long, community long"
    )
    rw = modularity(canon_w, labels, weight="weight").first()
    # manual: W=7, w_0=6, w_1=0; d_0 = 4+5+4? degrees: 0:3+1=4, 1:3+2=5,
    # 2:2+1+1=4, 3:1 -> d_0=13, d_1=1
    # NUM = (4*7*6 - 169) + (0 - 1) = 168-169-1 = -2; Q = -2/196
    assert rw.modularity == round(-2 / 196, 6)
