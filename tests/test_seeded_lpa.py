"""Seeded (semi-supervised) label spreading — clamp, vote, reach."""

from pyspark.sql import functions as F  # noqa: F401

from tests.conftest import df_to_dict, edges_df

from plato_spark.algos.lpa import seeded_label_propagation
from plato_spark.graph.edges import symmetrize


def _run(spark, edges, seeds, iterations=3, sym=True):
    e = edges_df(spark, edges)
    if sym:
        e = symmetrize(e)
    s = spark.createDataFrame(
        [(int(i), int(l)) for i, l in seeds], "id long, label long"
    )
    return df_to_dict(seeded_label_propagation(e, s, iterations=iterations))


def test_spread_along_path(spark):
    # 0(seed A) - 1 - 2 - 3: labels reach <= iterations hops
    got = _run(spark, [(0, 1), (1, 2), (2, 3)], [(0, 7)], iterations=2)
    assert got == {0: 7, 1: 7, 2: 7, 3: -1}


def test_seeds_are_clamped(spark):
    # two adjacent seeds with different labels never overwrite each other
    got = _run(spark, [(0, 1), (1, 2)], [(0, 5), (2, 9)], iterations=3)
    assert got[0] == 5 and got[2] == 9
    # the middle vertex sees both; smallest label wins the 1-1 tie
    assert got[1] == 5


def test_majority_vote(spark):
    # vertex 9 has three neighbors: two labeled 8, one labeled 2 -> 8 wins
    got = _run(
        spark,
        [(0, 9), (1, 9), (2, 9)],
        [(0, 8), (1, 8), (2, 2)],
        iterations=1,
    )
    assert got[9] == 8


def test_unreached_stay_minus_one(spark):
    got = _run(spark, [(0, 1), (5, 6)], [(0, 3)], iterations=3)
    assert got[5] == -1 and got[6] == -1
