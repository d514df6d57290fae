"""Round-4 batch 31: 4-node graphlet census (closed-form folds).

The oracle only proves both engines fold identically; THESE fixtures
prove the formulas, with every count hand-derived.
"""

from plato_spark.algos.motifs import graphlet_census


def _canon(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long")


def test_graphlet_census_k5(spark):
    # K5: T=10; claws 5*C(4,3)=20; P4 = 5!/2 ordered-4-vertex paths
    # = 60; tailed = 10 triangles x 3 corners x 2 tails = 60;
    # diamonds = C(5,4) x 6 missing-edge choices = 30;
    # C4 = C(5,4) x 3 = 15.
    edges = _canon(spark, [(i, j) for i in range(5)
                           for j in range(i + 1, 5)])
    r = graphlet_census(edges).collect()[0]
    assert (r.triangles, r.claws, r.paths_p4, r.tailed_triangles,
            r.diamonds, r.four_cycles) == (10, 20, 60, 60, 30, 15)


def test_graphlet_census_star(spark):
    # K1,4: no triangles/paths/cycles; claws = C(4,3) = 4.
    edges = _canon(spark, [(0, i) for i in range(1, 5)])
    r = graphlet_census(edges).collect()[0]
    assert (r.triangles, r.claws, r.paths_p4, r.tailed_triangles,
            r.diamonds, r.four_cycles) == (0, 4, 0, 0, 0, 0)


def test_graphlet_census_path_and_tailed(spark):
    # path 0-1-2-3: exactly one P4, nothing else.
    edges = _canon(spark, [(0, 1), (1, 2), (2, 3)])
    r = graphlet_census(edges).collect()[0]
    assert (r.triangles, r.claws, r.paths_p4, r.tailed_triangles,
            r.diamonds, r.four_cycles) == (0, 0, 1, 0, 0, 0)
    # triangle + pendant: one tailed triangle, no pure P4 beyond the
    # two that route through the triangle... non-induced P4s: walks
    # 3-1-0-2 and 3-1-2-0 -> 2; tailed = 1 (d(1)=3 corner).
    edges = _canon(spark, [(0, 1), (0, 2), (1, 2), (1, 3)])
    r = graphlet_census(edges).collect()[0]
    assert (r.triangles, r.claws, r.paths_p4, r.tailed_triangles,
            r.diamonds, r.four_cycles) == (1, 1, 2, 1, 0, 0)
