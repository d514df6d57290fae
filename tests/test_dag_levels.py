"""dag_levels (topological depth) + chunk-level dedup + kmeans/projection."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import df_to_dict, edges_df

from plato_spark.algos.dag import dag_levels


def _levels(spark, edges, vertices=None):
    vdf = None
    if vertices is not None:
        vdf = spark.createDataFrame([(int(v),) for v in vertices], "id long")
    return df_to_dict(dag_levels(edges_df(spark, edges), vertices=vdf))


def test_chain(spark):
    got = _levels(spark, [(0, 1), (1, 2), (2, 3)])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_diamond_longest_path_wins(spark):
    # 0 -> 1 -> 3 and 0 -> 3: level(3) must be 2 (the longest path)
    got = _levels(spark, [(0, 1), (1, 3), (0, 3)])
    assert got == {0: 0, 1: 1, 3: 2}


def test_multi_pred_and_isolated(spark):
    # two sources converging + an isolated vertex from the vertex table
    got = _levels(spark, [(0, 2), (1, 2), (2, 3)], vertices=[0, 1, 2, 3, 9])
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 9: 0}


def test_skip_edges_dont_shorten(spark):
    # chain with skips: longest path is still the full chain
    got = _levels(spark, [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_wide_shallow_dag(spark):
    # star: one source fanning out — converges in 1 round regardless of width
    edges = [(0, i) for i in range(1, 40)]
    got = _levels(spark, edges)
    assert got[0] == 0
    assert all(got[i] == 1 for i in range(1, 40))


def test_cycle_raises(spark):
    with pytest.raises(ValueError, match="cycle"):
        _levels(spark, [(0, 1), (1, 2), (2, 0)])


def test_brute_force_random_dag(spark):
    # random DAG on 25 vertices (edges only low->high id: acyclic by
    # construction); compare against a driver-side longest-path DP
    import random

    rng = random.Random(7)
    edges = sorted(
        {
            (a, b)
            for _ in range(80)
            for a, b in [sorted(rng.sample(range(25), 2))]
        }
    )
    got = _levels(spark, edges, vertices=range(25))
    exp = {v: 0 for v in range(25)}
    for a, b in edges:  # sorted by (a, b): topological order
        exp[b] = max(exp[b], exp[a] + 1)
    assert got == exp


def test_chunk_dedup_stats(spark):
    from plato_spark.functions.text import chunk_dedup_stats

    # chunk=4/stride=4: doc a and doc b share their first 4-token chunk;
    # doc c is unique; doc d repeats a's chunk once more
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff gg hh"),
            (2, "aa bb cc dd zz yy xx ww"),
            (3, "qq rr ss tt"),
            (4, "aa bb cc dd"),
        ],
        "doc_id long, text string",
    )
    out = chunk_dedup_stats(docs, chunk=4, stride=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_copies"] == 3 and r["n_docs"] == 3 and r["min_doc"] == 1
    assert r["dup_tokens"] == 8  # two redundant 4-token copies


def test_kmeans_two_obvious_clusters(spark):
    from plato_spark.functions.similarity import kmeans_clusters

    # two orthogonal bundles: ids 0-4 along e0, ids 5-9 along e1
    rows = [(i, [1.0, 0.01 * i, 0.0]) for i in range(5)] + [
        (i, [0.01 * i, 1.0, 0.0]) for i in range(5, 10)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = df_to_dict(
        kmeans_clusters(emb, n_clusters=2, lloyd_iters=2), key="vec_id"
    )
    assert len({got[i] for i in range(5)}) == 1
    assert len({got[i] for i in range(5, 10)}) == 1
    assert got[0] != got[5]


def test_embedding_project_deterministic_and_linear(spark):
    from plato_spark.functions.similarity import embedding_project

    rows = [(0, [1.0] * 8), (1, [2.0] * 8), (2, [0.0] * 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = df_to_dict(embedding_project(emb, out_dim=4), key="vec_id")
    assert len(got[0]) == 4
    # zero maps to zero; doubling the input doubles the projection
    assert all(x == 0.0 for x in got[2])
    for a, b in zip(got[0], got[1]):
        assert b == pytest.approx(2 * a, abs=2e-6)
    # scale is 1/sqrt(out_dim): each component is (sum of +-1)/2 here
    for x in got[0]:
        assert abs(x * math.sqrt(4) - round(x * math.sqrt(4))) < 1e-9
