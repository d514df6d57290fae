"""Round-4 batch 20: weighted LPA vote flips where count vote can't."""

from pyspark.sql import functions as F

from plato_spark.algos.lpa import label_propagation
from plato_spark.graph.edges import symmetrize


def test_weighted_vote_beats_majority_count(spark):
    # vertex 0: two light edges to {1, 2} (weight 1 each) and ONE heavy
    # edge to 3 (weight 5).  After 1 iteration the unweighted vote
    # picks the smallest label among {1, 2, 3} (all count 1 -> label
    # 1); the weighted vote picks 3 (sum 5 > 1).
    canon = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1), (0, 3, 5)],
        "src long, dst long, weight long")
    sym = symmetrize(canon)
    unw = {r.id: r.label for r in
           label_propagation(sym, iterations=1).collect()}
    wgt = {r.id: r.label for r in
           label_propagation(sym, iterations=1, weight="weight")
           .collect()}
    assert unw[0] == 1
    assert wgt[0] == 3


def test_weighted_vote_tie_still_smallest_label(spark):
    # equal weight sums -> smallest label wins, same as unweighted
    canon = spark.createDataFrame(
        [(0, 5, 3), (0, 2, 3)], "src long, dst long, weight long")
    sym = symmetrize(canon)
    wgt = {r.id: r.label for r in
           label_propagation(sym, iterations=1, weight="weight")
           .collect()}
    assert wgt[0] == 2
