"""Pure-Python golden oracles with plato-exact semantics.

Mirrors the reference's test strategy: a trivially-correct sequential
implementation inline in the tests, compared vertex-by-vertex
(/root/reference/plato/algo/cgm/test/test_cgm.cc:81-152).
"""

from __future__ import annotations

from collections import defaultdict


def pagerank_oracle(edges, damping=0.85, eps=1e-6, max_iters=100, weights=None):
    """Directed edges [(u,v)]; plato pagerank.hpp:90-146 semantics.

    Returns {vertex: rank} (unnormalized form). weights: parallel list ->
    weighted_pagerank.hpp semantics (contribution w/wsum, no pre-division).
    """
    verts = sorted({x for e in edges for x in e})
    w = weights if weights is not None else [1.0] * len(edges)
    wsum: dict = defaultdict(float)
    for (u, _), wi in zip(edges, w):
        wsum[u] += wi
    r = {v: 1.0 for v in verts}
    last = False
    for k in range(max_iters):
        g = defaultdict(float)
        for (u, v), wi in zip(edges, w):
            g[v] += (r[u] / wsum[u]) * wi
        new = {v: (1.0 - damping) + damping * g[v] for v in verts}
        if last or k == max_iters - 1:
            return new
        delta = sum(abs(new[v] - r[v]) for v in verts)
        r = new
        if eps > 0.0 and delta < eps:
            last = True  # one extra epoch (pagerank.hpp:136)
    return r


def wcc_oracle(edges):
    """Undirected edges; {vertex: min vid of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {v: find(v) for v in parent}


def lpa_oracle(edges, iterations=20):
    """Directed edges; synchronous in-neighbor vote (lpa.hpp:102-137),
    smallest-label tie-break (our deterministic pin)."""
    verts = sorted({x for e in edges for x in e})
    in_nbrs = defaultdict(list)
    for u, v in edges:
        in_nbrs[v].append(u)
    label = {v: v for v in verts}
    for _ in range(iterations):
        prev = dict(label)
        for v in verts:
            if not in_nbrs[v]:
                continue
            cnt: dict = defaultdict(int)
            for u in in_nbrs[v]:
                cnt[prev[u]] += 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            label[v] = best[0]
    return label


def triangles_oracle(edges):
    """Canonical undirected edges (u<v unique); exact global triangle count."""
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    total = 0
    for u, v in edges:
        total += len(nbrs[u] & nbrs[v])
    return total // 3


def common_neighbors_oracle(edges):
    """{(u,v): sorted common neighbor list} per canonical edge."""
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    return {(u, v): sorted(nbrs[u] & nbrs[v]) for u, v in edges}


# -- deterministic fixture graphs (FIXTURES.md §3) -------------------------

def random_graph(n=60, m=240, seed=7, directed=False):
    import random

    rng = random.Random(seed)
    seen = set()
    while len(seen) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u == v:
            continue
        if not directed:
            u, v = min(u, v), max(u, v)
        seen.add((u, v))
    return sorted(seen)


def triangle_mix():
    """Disjoint triangles + K5 + a star (0 triangles) — FIXTURES.md."""
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    k5 = [10, 11, 12, 13, 14]
    for i in range(5):
        for j in range(i + 1, 5):
            edges.append((k5[i], k5[j]))
    for leaf in range(21, 28):
        edges.append((20, leaf))
    return edges


def dangling_chain():
    """Directed chain with a sink (out-degree 0) — pagerank dangling case."""
    return [(0, 1), (1, 2), (2, 3), (0, 2), (4, 3)]
