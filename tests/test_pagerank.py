import math

from conftest import df_to_dict, edges_df
from oracles import dangling_chain, pagerank_oracle, random_graph, triangle_mix

from plato_spark.algos.pagerank import pagerank
from plato_spark.graph.edges import symmetrize


def _check(spark, edges, weights=None, **kw):
    df = edges_df(spark, edges, weights)
    got = df_to_dict(pagerank(df, weight="weight" if weights else None, **kw), val="rank")
    want = pagerank_oracle(edges, weights=weights,
                           **{k: v for k, v in kw.items()
                              if k in ("damping", "eps", "max_iters")})
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], abs_tol=1e-6), (v, got[v], want[v])


def test_pagerank_dangling(spark):
    _check(spark, dangling_chain())


def test_pagerank_random_directed(spark):
    _check(spark, random_graph(n=50, m=300, seed=3, directed=True))


def test_pagerank_undirected_symmetrized(spark):
    canon = random_graph(n=40, m=120, seed=5)
    sym = canon + [(b, a) for a, b in canon]
    _check(spark, sym)


def test_pagerank_fixed_iters_no_eps(spark):
    _check(spark, random_graph(n=30, m=90, seed=11, directed=True),
           eps=0.0, max_iters=7)


def test_pagerank_weighted(spark):
    edges = random_graph(n=30, m=150, seed=13, directed=True)
    weights = [1.0 + (i % 5) for i in range(len(edges))]
    _check(spark, edges, weights=weights)


def test_pagerank_spmv_matches_join(spark):
    edges = random_graph(n=80, m=500, seed=17, directed=True)
    df = edges_df(spark, edges)
    j = df_to_dict(pagerank(df, impl="join"), val="rank")
    s = df_to_dict(pagerank(df, impl="spmv", num_blocks=5), val="rank")
    assert set(j) == set(s)
    for v in j:
        assert math.isclose(j[v], s[v], abs_tol=1e-9), (v, j[v], s[v])


def test_pagerank_spmv_oracle(spark):
    edges = dangling_chain()
    df = edges_df(spark, edges)
    got = df_to_dict(pagerank(df, impl="spmv", num_blocks=2), val="rank")
    want = pagerank_oracle(edges)
    for v in want:
        assert math.isclose(got[v], want[v], abs_tol=1e-6)


def test_pagerank_parallelism_invariance(spark):
    # same input, different shuffle parallelism -> allclose results
    edges = random_graph(n=60, m=300, seed=19, directed=True)
    df = edges_df(spark, edges)
    a = df_to_dict(pagerank(df), val="rank")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = df_to_dict(pagerank(df), val="rank")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for v in a:
        assert math.isclose(a[v], b[v], abs_tol=1e-9)


def test_personalized_pagerank_oracle(spark):
    """PPR vs a numpy power-iteration oracle with restricted teleport."""
    import numpy as np

    from conftest import edges_df
    from oracles import random_graph
    from plato_spark.algos.pagerank import personalized_pagerank

    edges = random_graph(n=30, m=90, seed=3, directed=True)
    df = edges_df(spark, edges)
    sources = [0, 1]
    got = {r["id"]: r["rank"]
           for r in personalized_pagerank(df, sources, iterations=8).collect()}

    ids = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    odeg = np.zeros(n)
    for u, _ in edges:
        odeg[idx[u]] += 1
    s = np.zeros(n)
    for v in sources:
        s[idx[v]] = 1.0
    r = s.copy()
    for _ in range(8):
        contrib = np.where(odeg > 0, r / np.maximum(odeg, 1), r)
        g = np.zeros(n)
        for u, v in edges:
            g[idx[v]] += contrib[idx[u]]
        r = 0.15 * s + 0.85 * g
    for v in ids:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])
    # mass concentrates near sources
    assert got[0] > np.median(list(got.values()))
