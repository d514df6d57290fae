"""Round-4 batch 28: GraphSAGE mean-aggregate feature propagation."""

from pyspark.sql import functions as F

from plato_spark.algos.sage import sage_mean_features


def _sym(spark, pairs):
    e = spark.createDataFrame([(int(a), int(b)) for a, b in pairs],
                              "src long, dst long")
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _feats(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "id long, embedding array<float>",
    )


def test_sage_two_vertices_hand_computed(spark):
    # v0=[1.0,-1.0], v1=[0.0,0.5], edge 0-1:
    # layer1: v0 -> [0.5, -0.25], v1 -> [0.5, -0.25]
    # layer2: both unchanged (already equal)
    sym = _sym(spark, [(0, 1)])
    feats = _feats(spark, [(0, [1.0, -1.0]), (1, [0.0, 0.5])])
    got = {(r.id, r.dim): r.value
           for r in sage_mean_features(sym, feats, layers=2).collect()}
    assert got == {(0, 0): 0.5, (0, 1): -0.25,
                   (1, 0): 0.5, (1, 1): -0.25}


def test_sage_floor_not_truncate_on_negative_sums(spark):
    # q0 = [3], q1 = [-6] micro-units; layer update for v0:
    # floor((3 - 6) / 2) = floor(-1.5) = -2 — truncation would give -1.
    sym = _sym(spark, [(0, 1)])
    feats = _feats(spark, [(0, [3e-6]), (1, [-6e-6])])
    got = {r.id: r.value
           for r in sage_mean_features(sym, feats, layers=1).collect()}
    assert got[0] == -2e-6
    assert got[1] == -2e-6  # floor((-6 + 3) / 2) = floor(-1.5) = -2


def test_sage_isolated_vertex_keeps_its_vector(spark):
    sym = _sym(spark, [(0, 1)])
    feats = _feats(spark, [(0, [1.0]), (1, [1.0]), (9, [0.75])])
    got = {r.id: r.value
           for r in sage_mean_features(sym, feats, layers=2).collect()}
    assert got[9] == 0.75


def test_sage_ignores_featureless_neighbors(spark):
    # vertex 2 has no feature row: dropped from universe AND from
    # v1's neighbor mean (deg computed over the RESTRICTED graph).
    sym = _sym(spark, [(0, 1), (1, 2)])
    feats = _feats(spark, [(0, [1.0]), (1, [0.0])])
    got = {r.id: r.value
           for r in sage_mean_features(sym, feats, layers=1).collect()}
    assert got == {0: 0.5, 1: 0.5}
