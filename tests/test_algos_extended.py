import math
from collections import defaultdict, deque

from conftest import df_to_dict, edges_df
from oracles import random_graph, triangle_mix

from plato_spark.algos.bfs import bfs, tree_stat
from plato_spark.algos.closeness import closeness_sampled
from plato_spark.algos.hanp import hanp
from plato_spark.algos.hyperanf import hyperanf
from plato_spark.algos.kcore import kcore


# ---- oracles --------------------------------------------------------------

def bfs_oracle(edges, root):
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    dist = {root: 0}
    q = deque([root])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def kcore_oracle(edges):
    """Exact coreness by peeling (canonical undirected edges)."""
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    deg = {v: len(n) for v, n in nbrs.items()}
    core = {}
    remaining = set(deg)
    k = 0
    while remaining:
        k_min = min(deg[v] for v in remaining)
        k = max(k, k_min)
        peel = [v for v in remaining if deg[v] <= k]
        while peel:
            v = peel.pop()
            if v not in remaining:
                continue
            core[v] = k
            remaining.discard(v)
            for u in nbrs[v]:
                if u in remaining:
                    deg[u] -= 1
                    if deg[u] <= k:
                        peel.append(u)
    return core


def hanp_oracle(edges, iterations=3, preference=1.0, hop_att=0.1, dis=1e-6, weights=None):
    verts = sorted({x for e in edges for x in e})
    w = weights if weights is not None else [1.0] * len(edges)
    in_nbrs = defaultdict(list)
    for (u, v), wi in zip(edges, w):
        in_nbrs[v].append((u, wi))
    label = {v: v for v in verts}
    att = {v: 1.0 for v in verts}
    for _ in range(iterations):
        pl, pa = dict(label), dict(att)
        for v in verts:
            scores: dict = defaultdict(float)
            max_att: dict = {}
            for u, wi in in_nbrs[v]:
                if pa[u] < 0:
                    continue
                lu = pl[u]
                scores[lu] += pa[u] * preference * wi
                max_att[lu] = max(max_att.get(lu, -1e18), pa[u])
            if not scores:
                continue
            # quantized-score argmax, smallest label (engine's tie policy)
            best = max(scores.items(), key=lambda kv: (round(kv[1] / dis), -kv[0]))
            newl = best[0]
            label[v] = newl
            att[v] = max_att[newl] if newl == pl[v] else max_att[newl] - hop_att
    return label


# ---- tests ----------------------------------------------------------------

def test_bfs_exact(spark):
    edges = random_graph(n=50, m=200, seed=31, directed=True)
    got = df_to_dict(bfs(edges_df(spark, edges), root=0), val="dist")
    assert got == bfs_oracle(edges, 0)


def test_bfs_chain_and_treestat(spark):
    # binary-tree fixture (FIXTURES.md): depth 3, width 4 for 10 vertices
    edges = [(i, 2 * i + 1) for i in range(5)] + [(i, 2 * i + 2) for i in range(4)]
    got = df_to_dict(bfs(edges_df(spark, edges), root=0), val="dist")
    assert got == bfs_oracle(edges, 0)
    row = tree_stat(edges_df(spark, edges), root=0).collect()[0]
    want = bfs_oracle(edges, 0)
    levels = defaultdict(int)
    for d in want.values():
        levels[d] += 1
    assert row["depth"] == max(want.values())
    assert row["width"] == max(levels.values())


def test_kcore_exact(spark):
    for seed, m in [(41, 150), (43, 300)]:
        edges = random_graph(n=40, m=m, seed=seed)
        got = df_to_dict(kcore(edges_df(spark, edges)), val="coreness")
        assert got == kcore_oracle(edges), f"seed={seed}"


def test_kcore_mix(spark):
    edges = triangle_mix()
    got = df_to_dict(kcore(edges_df(spark, edges)), val="coreness")
    want = kcore_oracle(edges)
    assert got == want
    assert got[10] == 4  # K5 member
    assert got[21] == 1  # star leaf


def test_hanp_matches_oracle(spark):
    canon = random_graph(n=30, m=90, seed=47)
    sym = canon + [(b, a) for a, b in canon]
    got = df_to_dict(hanp(edges_df(spark, sym), iterations=3), val="label")
    want = hanp_oracle(sym, iterations=3)
    assert got == want


def test_closeness_sampled(spark):
    edges = random_graph(n=30, m=80, seed=53)
    df = edges_df(spark, edges)
    got = df_to_dict(closeness_sampled(df, num_samples=4), val="closeness")
    # oracle: same deterministic sample policy
    from oracles import wcc_oracle

    comp = wcc_oracle(edges)
    counts = defaultdict(int)
    for v, c in comp.items():
        counts[c] += 1
    major = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    members = sorted(v for v, c in comp.items() if c == major)
    k = min(4, len(members))
    fac = len(members) / k / (len(members) - 1)
    roots = members[:k]
    sums = defaultdict(int)
    for r in roots:
        d = bfs_oracle(edges + [(b, a) for a, b in edges], r)
        for v, dist in d.items():
            if comp.get(v) == major:
                sums[v] += dist
    for v in members:
        want = 1.0 / (fac * sums[v]) if sums[v] > 0 else 0.0
        assert math.isclose(got[v], round(want, 6), abs_tol=2e-6), (v, got[v], want)


def test_hyperanf_reasonable(spark):
    # path graph 0-1-2-...-9 (directed both ways): exact avg distance known
    n = 10
    canon = [(i, i + 1) for i in range(n - 1)]
    sym = canon + [(b, a) for a, b in canon]
    exact_pairs = sum(
        abs(i - j) for i in range(n) for j in range(n) if i != j
    ) / (n * (n - 1))
    avg, curve = hyperanf(edges_df(spark, sym), iterations=15, lg_k=12)
    assert curve[0] > 0 and curve[-1] >= curve[0]
    assert abs(avg - exact_pairs) / exact_pairs < 0.15  # HLL tolerance


def test_sssp_matches_dijkstra(spark):
    import heapq

    from conftest import edges_df
    from oracles import random_graph
    from plato_spark.algos.sssp import sssp

    edges = random_graph(n=40, m=120, seed=5, directed=True)
    weights = [1.0 + ((u * 7 + v * 13) % 5) for u, v in edges]
    df = edges_df(spark, edges, weights)
    root = min(u for u, _ in edges)
    got = {r["id"]: r["dist"] for r in sssp(df, root=root, weight="weight").collect()}

    adj = {}
    for (u, v), w in zip(edges, weights):
        adj.setdefault(u, []).append((v, w))
    dist = {root: 0.0}
    pq = [(0.0, root)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    assert got == dist


def test_sssp_unweighted_is_bfs(spark):
    from conftest import edges_df
    from plato_spark.algos.sssp import sssp

    chain = [(i, i + 1) for i in range(20)]
    df = edges_df(spark, chain)
    got = {r["id"]: r["dist"] for r in sssp(df, root=0).collect()}
    assert got == {i: float(i) for i in range(21)}


def test_katz_matches_numpy(spark):
    """Katz vs dense numpy recurrence on a small directed graph."""
    import numpy as np

    from plato_spark.algos.katz import katz

    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    alpha, beta, iters = 0.125, 1.0, 6
    got = {r["id"]: r["katz"] for r in
           katz(df, alpha=alpha, beta=beta, iterations=iters).collect()}

    ids = sorted({v for e in edges for v in e})
    ix = {v: i for i, v in enumerate(ids)}
    a_mat = np.zeros((len(ids), len(ids)))
    for s, d in edges:
        a_mat[ix[s], ix[d]] = 1.0
    x = np.full(len(ids), beta)
    for _ in range(iters):
        x = alpha * (a_mat.T @ x) + beta
    for v in ids:
        assert abs(got[v] - round(float(x[ix[v]]), 6)) <= 1e-6, v


def test_degree_assortativity_signs(spark):
    """A star is maximally disassortative (-1); a clique's correlation is
    undefined (zero variance -> NULL)."""
    from plato_spark.graph.edges import degree_assortativity

    star = spark.createDataFrame([(0, i) for i in range(1, 6)],
                                 "src long, dst long")
    a = degree_assortativity(star).collect()[0]["assortativity"]
    assert abs(a - (-1.0)) < 1e-9

    from itertools import combinations
    clique = spark.createDataFrame(list(combinations(range(4), 2)),
                                   "src long, dst long")
    c = degree_assortativity(clique).collect()[0]["assortativity"]
    assert c is None  # all degrees equal -> zero variance


def test_repetition_ratio(spark):
    from plato_spark.functions.text import repetition_ratio

    df = spark.createDataFrame(
        [(0, "spam spam spam spam"), (1, "all tokens here differ"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["repetition"])
           for r in repetition_ratio(df).collect()}
    assert got[0] == (4, 0.75)
    assert got[1] == (4, 0.0)
    assert got[2] == (0, 0.0)


def test_closeness_exact_bavelas(spark):
    """Exact per-root Bavelas (bavelas.hpp:55-66): (V-1)/sum-dist over a
    FULL BFS, V the total graph vertex count, roots the num_roots
    smallest major-component ids."""
    from plato_spark.algos.closeness import closeness_exact

    edges = random_graph(n=30, m=80, seed=53)
    # add a disconnected pair so V_total > V_major (bavelas uses V_total)
    edges = edges + [(100, 101)]
    df = edges_df(spark, edges)
    got = df_to_dict(closeness_exact(df, num_roots=6), val="closeness")
    from oracles import wcc_oracle

    comp = wcc_oracle(edges)
    v_total = len(comp)
    counts = defaultdict(int)
    for v, c in comp.items():
        counts[c] += 1
    major = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    members = sorted(v for v, c in comp.items() if c == major)
    roots = members[: min(6, len(members))]
    sym = edges + [(b, a) for a, b in edges]
    assert set(got) == set(roots)
    for r in roots:
        d = bfs_oracle(sym, r)
        s = sum(d.values())
        want = (v_total - 1) / s if s > 0 else 0.0
        assert math.isclose(got[r], round(want, 6), abs_tol=2e-6), (r, got[r], want)


def test_eigenvector_centrality_numpy_mirror(spark):
    import numpy as np
    from plato_spark.algos.eigenvector import eigenvector_centrality

    edges = random_graph(n=20, m=50, seed=11)
    got = df_to_dict(eigenvector_centrality(edges_df(spark, edges), 4),
                     val="score")
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for a, b in edges:
        A[idx[a], idx[b]] = 1.0
        A[idx[b], idx[a]] = 1.0
    x = np.ones(len(ids))
    for _ in range(4):
        x = A @ x
        x = x / x.sum()
    for v in ids:
        assert math.isclose(got[v], round(float(x[idx[v]]), 6),
                            abs_tol=2e-6), v
    # star graph: center dominates
    star = [(0, i) for i in range(1, 6)]
    g2 = df_to_dict(eigenvector_centrality(edges_df(spark, star), 3),
                    val="score")
    assert g2[0] > max(g2[i] for i in range(1, 6))


def test_eigenvector_rejects_zero_iters(spark):
    import pytest
    from plato_spark.algos.eigenvector import eigenvector_centrality

    with pytest.raises(ValueError):
        eigenvector_centrality(edges_df(spark, [(1, 2)]), 0)


def test_pseudo_diameter_path_and_cycle(spark):
    from plato_spark.algos.bfs import pseudo_diameter

    # path 0-1-2-3-4: double sweep from 0 finds the true diameter 4
    path = [(i, i + 1) for i in range(4)]
    r = pseudo_diameter(edges_df(spark, path)).collect()[0]
    assert (r["start_id"], r["far_id"], r["diameter_lb"]) == (0, 4, 4)
    # 6-cycle: ecc(0)=3, farthest is vertex 3, second sweep also 3
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    r = pseudo_diameter(edges_df(spark, cyc)).collect()[0]
    assert (r["start_id"], r["far_id"], r["diameter_lb"]) == (0, 3, 3)
