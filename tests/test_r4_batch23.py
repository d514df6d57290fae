"""Round-4 batch 23: widest (bottleneck) paths — the max-min semiring."""

from pyspark.sql import functions as F

from plato_spark.algos.sssp import widest_path


def _sym(spark, triples):
    canon = spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in triples],
        "src long, dst long, weight double",
    )
    return canon.unionByName(
        canon.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )


def test_widest_detour_beats_direct(spark):
    # 0-1 w10, 1-3 w1 (short but narrow) vs 0-2 w4, 2-3 w5 (detour):
    # cap(3) = min(4,5) = 4, not min(10,1) = 1.  cap(1)=10, cap(2)=4.
    sym = _sym(spark, [(0, 1, 10), (1, 3, 1), (0, 2, 4), (2, 3, 5)])
    got = {r.id: r.cap for r in widest_path(sym, root=0).collect()}
    assert got == {1: 10.0, 2: 4.0, 3: 4.0}


def test_widest_longer_path_wins(spark):
    # direct 0-3 w2 vs 3-hop chain 0-1-2-3 all w5: bottleneck-optimal
    # path has MORE hops than the shortest path — the case sssp's
    # min-plus fixpoint bound does not cover.
    sym = _sym(
        spark, [(0, 3, 2), (0, 1, 5), (1, 2, 5), (2, 3, 5)]
    )
    got = {r.id: r.cap for r in widest_path(sym, root=0).collect()}
    assert got[3] == 5.0


def test_widest_excludes_root_and_unreachable(spark):
    # component {0,1} + disjoint {7,8}: root 0 excluded, 7/8 absent.
    sym = _sym(spark, [(0, 1, 3), (7, 8, 9)])
    got = {r.id: r.cap for r in widest_path(sym, root=0).collect()}
    assert got == {1: 3.0}
