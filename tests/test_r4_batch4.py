"""Round-4 batch 4: exact K4 counting, association-rule lift."""

from itertools import combinations

from conftest import edges_df

from plato_spark.algos.triangles import four_clique_count
from plato_spark.functions.recommend import association_lift


def _clique(nodes):
    return [(a, b) for a, b in combinations(sorted(nodes), 2)]


def test_k4_is_one(spark):
    e = edges_df(spark, _clique([0, 1, 2, 3]))
    assert four_clique_count(e).collect()[0].four_cliques == 1


def test_k5_has_five(spark):
    e = edges_df(spark, _clique([0, 1, 2, 3, 4]))
    assert four_clique_count(e).collect()[0].four_cliques == 5


def test_triangle_has_none(spark):
    e = edges_df(spark, _clique([0, 1, 2]) + [(2, 9), (9, 10)])
    assert four_clique_count(e).collect()[0].four_cliques == 0


def test_two_k4_sharing_a_triangle(spark):
    # K4 on {0,1,2,3} and K4 on {1,2,3,4} share triangle {1,2,3}
    e = set(_clique([0, 1, 2, 3])) | set(_clique([1, 2, 3, 4]))
    df = edges_df(spark, sorted(e))
    assert four_clique_count(df).collect()[0].four_cliques == 2


def test_association_lift_mirror(spark):
    baskets = {
        1: ["a", "b", "c"],
        2: ["a", "b"],
        3: ["a", "b", "d"],
        4: ["c", "d"],
        5: ["a", "d"],
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    inc = spark.createDataFrame(rows, "basket long, item string")
    got = [(r.src, r.dst, r.support, r.lift)
           for r in association_lift(inc, k=10, min_support=2).collect()]

    n = len(baskets)
    cnt = {}
    sup = {}
    for b, items in baskets.items():
        for i in items:
            cnt[i] = cnt.get(i, 0) + 1
        for x, y in combinations(sorted(set(items)), 2):
            sup[(x, y)] = sup.get((x, y), 0) + 1
    want = []
    for (x, y), s in sup.items():
        if s >= 2:
            want.append((x, y, s, round(s * n / (cnt[x] * cnt[y]), 6)))
    want.sort(key=lambda t: (-t[3], t[0], t[1]))
    assert got == want
    # sanity: (a,b) co-occur 3/5 with c(a)=4, c(b)=3 -> lift 15/12 = 1.25
    assert ("a", "b", 3, 1.25) in got


def test_association_lift_min_support_prunes(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "c"), (3, "b"), (3, "c")]
    inc = spark.createDataFrame(rows, "basket long, item string")
    got = association_lift(inc, k=10, min_support=2).collect()
    assert got == []  # every pair has support 1
