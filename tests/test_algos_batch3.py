import math
from collections import defaultdict, deque

from conftest import df_to_dict, edges_df
from oracles import random_graph, triangle_mix

from plato_spark.algos.betweenness import betweenness_sampled
from plato_spark.algos.louvain import louvain, modularity
from plato_spark.algos.nstep import nstep_degrees
from plato_spark.algos.walks import random_walks


def brandes_oracle(edges, roots):
    """Brandes dependency accumulation from the given roots (undirected)."""
    nbrs = defaultdict(list)
    for u, v in edges:
        nbrs[u].append(v)
        nbrs[v].append(u)
    bc = defaultdict(float)
    for s in roots:
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in nbrs[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = defaultdict(float)
        for w in reversed(order):
            for u in nbrs[w]:
                if dist.get(u, -2) == dist[w] - 1:
                    delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_matches_brandes(spark):
    edges = random_graph(n=30, m=70, seed=61)
    verts = sorted({x for e in edges for x in e})
    roots = verts[:5]
    got = df_to_dict(
        betweenness_sampled(edges_df(spark, edges), num_samples=5), val="betweenness"
    )
    want = brandes_oracle(edges, roots)
    assert set(got) == set(verts)
    for v in verts:
        assert math.isclose(got[v], round(want[v], 6), abs_tol=2e-6), (v, got[v], want[v])


def test_betweenness_path_graph(spark):
    # path 0-1-2-3-4, all 5 roots = exact betweenness: middle vertex highest
    edges = [(i, i + 1) for i in range(4)]
    got = df_to_dict(
        betweenness_sampled(edges_df(spark, edges), num_samples=5), val="betweenness"
    )
    want = brandes_oracle(edges, [0, 1, 2, 3, 4])
    for v in range(5):
        assert math.isclose(got[v], round(want[v], 6), abs_tol=1e-6)
    assert got[2] == max(got.values())


def test_louvain_cliques(spark):
    # two K5 cliques joined by one bridge edge -> communities = cliques
    edges = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((0, 10))
    df = edges_df(spark, edges)
    comm = louvain(df, outer_iterations=2).persist()
    got = df_to_dict(comm, val="community")
    assert len({got[i] for i in range(5)}) == 1
    assert len({got[i] for i in range(10, 15)}) == 1
    assert got[0] != got[10]
    q = modularity(df, comm)
    assert q > 0.3


def test_louvain_deterministic(spark):
    edges = random_graph(n=40, m=120, seed=71)
    df = edges_df(spark, edges)
    a = df_to_dict(louvain(df), val="community")
    b = df_to_dict(louvain(df), val="community")
    assert a == b
    q = modularity(df, louvain(df))
    assert q >= -1e-9


def test_nstep_degrees_accuracy(spark):
    edges = random_graph(n=40, m=100, seed=73, directed=True)
    got = df_to_dict(nstep_degrees(edges_df(spark, edges), steps=2, direction="out"),
                     val="nstep_degree")
    # exact 2-hop out-ball
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
    for v in got:
        ball = {v} | adj[v] | {w for u in adj[v] for w in adj[u]}
        exact = len(ball) - 1
        assert abs(got[v] - exact) <= max(2, 0.2 * exact), (v, got[v], exact)


def test_nstep_reach_exact(spark):
    from plato_spark.algos.nstep import nstep_reach_exact

    edges = random_graph(n=40, m=100, seed=73, directed=True)
    got = df_to_dict(nstep_reach_exact(edges_df(spark, edges), steps=2),
                     val="n_reach")
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
    for v, n in got.items():
        reach = set(adj[v]) | {w for u in adj[v] for w in adj[u]}
        assert n == len(reach), (v, n, len(reach))
    # only vertices with out-edges appear
    assert set(got) == {u for u, _ in edges}


def test_random_walks_uniform(spark):
    edges = random_graph(n=25, m=120, seed=79, directed=True)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
    walks = random_walks(edges_df(spark, edges), walk_length=6)
    rows = walks.collect()
    verts = {x for e in edges for x in e}
    assert len(rows) == len(verts)
    for r in rows:
        path = list(r["path"])
        assert 1 <= len(path) <= 6
        for a, b in zip(path, path[1:]):
            assert b in adj[a], (a, b)
    # determinism
    again = {r["walk_id"]: list(r["path"])
             for r in random_walks(edges_df(spark, edges), walk_length=6).collect()}
    assert again == {r["walk_id"]: list(r["path"]) for r in rows}


def test_random_walks_node2vec_valid(spark):
    canon = random_graph(n=20, m=60, seed=83)
    sym = canon + [(b, a) for a, b in canon]
    adj = defaultdict(set)
    for u, v in sym:
        adj[u].add(v)
    walks = random_walks(edges_df(spark, sym), walk_length=5, p=0.5, q=2.0)
    for r in walks.collect():
        path = list(r["path"])
        for a, b in zip(path, path[1:]):
            assert b in adj[a]


def test_node2vec_non_dyadic_pq_fallback(spark):
    """Non-binary-fraction p/q (1/3, 1/0.3) must route through the
    per-segment cumsum path and still produce valid, deterministic walks."""
    canon = random_graph(n=20, m=60, seed=84)
    sym = canon + [(b, a) for a, b in canon]
    adj = defaultdict(set)
    for u, v in sym:
        adj[u].add(v)
    walks = random_walks(edges_df(spark, sym), walk_length=5, p=3.0, q=0.3)
    rows = {r["walk_id"]: list(r["path"]) for r in walks.collect()}
    for path in rows.values():
        for a, b in zip(path, path[1:]):
            assert b in adj[a]
    again = {r["walk_id"]: list(r["path"])
             for r in random_walks(edges_df(spark, sym), walk_length=5,
                                   p=3.0, q=0.3).collect()}
    assert again == rows


def test_metapath_walks(spark):
    from plato_spark.algos.walks import metapath_walks
    from pyspark.sql import functions as F

    # bipartite-ish typed graph: 'ab' edges 0..4 -> 10..14, 'ba' edges back
    edges = [(i, 10 + i, "ab") for i in range(5)] + [
        (10 + i, (i + 1) % 5, "ba") for i in range(5)
    ]
    df = spark.createDataFrame(edges, "src long, dst long, etype string")
    walks = metapath_walks(df, ["ab", "ba"], walk_length=5)
    rows = {r["walk_id"]: list(r["path"]) for r in walks.collect()}
    assert set(rows) == set(range(5))  # starts = vertices with 'ab' out-edges
    typed = {("ab"): {(s, d) for s, d, t in edges if t == "ab"},
             ("ba"): {(s, d) for s, d, t in edges if t == "ba"}}
    for path in rows.values():
        assert len(path) == 5
        for k, (a, b) in enumerate(zip(path, path[1:])):
            assert (a, b) in typed["ab" if k % 2 == 0 else "ba"]
    # determinism
    again = {r["walk_id"]: list(r["path"]) for r in
             metapath_walks(df, ["ab", "ba"], walk_length=5).collect()}
    assert again == rows


def test_infomap_cliques(spark):
    from plato_spark.algos.infomap import infomap, _map_equation

    edges = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((0, 10))
    df = edges_df(spark, edges)
    mod = infomap(df, outer_iterations=2, inner_iterations=3)
    got = df_to_dict(mod, val="module")
    assert len({got[i] for i in range(5)}) == 1
    assert len({got[i] for i in range(10, 15)}) == 1
    assert got[0] != got[10]


def test_infomap_deterministic(spark):
    from plato_spark.algos.infomap import infomap

    edges = random_graph(n=30, m=90, seed=101)
    df = edges_df(spark, edges)
    a = df_to_dict(infomap(df, outer_iterations=1, inner_iterations=2), val="module")
    b = df_to_dict(infomap(df, outer_iterations=1, inner_iterations=2), val="module")
    assert a == b
    # non-trivial clustering: fewer modules than vertices
    assert len(set(a.values())) < len(a)
