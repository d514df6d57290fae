"""Borůvka minimum spanning forest — Kruskal cross-check (the MSF under
a total edge order is unique, so both algorithms must agree exactly)."""

import random

from tests.conftest import edges_df

from plato_spark.algos.msf import boruvka_msf


def _kruskal(edges):
    """edges: [(src, dst, w)] canonical.  Returns the unique MSF edge set
    under the total order (w, src, dst)."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for s, d, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            out.add((s, d, w))
    return out


def _check(spark, edges):
    df = edges_df(spark, [(s, d) for s, d, _ in edges],
                  weights=[w for _, _, w in edges])
    rows = boruvka_msf(df).collect()
    got = {(r["src"], r["dst"], r["weight"]) for r in rows}
    assert len(got) == len(rows), "duplicate forest edges"
    assert got == _kruskal(edges)
    return rows


def test_msf_triangle(spark):
    # cycle drops its max edge
    rows = _check(spark, [(1, 2, 1.0), (2, 3, 2.0), (1, 3, 3.0)])
    assert {(r["src"], r["dst"]) for r in rows} == {(1, 2), (2, 3)}


def test_msf_tie_break(spark):
    # all weights equal: order falls back to (src, dst)
    _check(spark, [(1, 2, 5.0), (2, 3, 5.0), (1, 3, 5.0), (3, 4, 5.0)])


def test_msf_two_components(spark):
    rows = _check(spark, [(1, 2, 1.0), (2, 3, 4.0), (10, 11, 2.0)])
    assert len(rows) == 3  # spanning forest covers both components


def test_msf_chain_contraction(spark):
    # decreasing-weight chain: hooks form a long path, exercising the
    # pointer-jump compression depth
    edges = [(i, i + 1, float(100 - i)) for i in range(12)]
    rows = _check(spark, edges)
    assert len(rows) == 12


def test_msf_random(spark):
    rng = random.Random(11)
    seen = set()
    edges = []
    for _ in range(80):
        s, d = sorted(rng.sample(range(26), 2))
        if (s, d) not in seen:
            seen.add((s, d))
            edges.append((s, d, float(rng.randrange(1, 6))))
    rows = _check(spark, edges)
    # forest property: |edges| = |vertices| - |components|
    verts = {v for s, d, _ in edges for v in (s, d)}
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, _ in edges:
        parent[find(s)] = find(d)
    n_comp = len({find(v) for v in verts})
    assert len(rows) == len(verts) - n_comp
