"""SimRank top-k (algos/simrank.simrank_topk) vs a python mirror."""

from plato_spark.algos.simrank import simrank_topk


def _sym(spark, edges):
    rows = [(int(a), int(b)) for a, b in edges]
    rows += [(b, a) for a, b in rows]
    return spark.createDataFrame(rows, "src long, dst long")


def _mirror(edges, ids, c=0.8, iters=5):
    adj = {v: [] for v in ids}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    s = {(a, b): 1.0 if a == b else 0.0 for a in ids for b in ids}
    for _ in range(iters):
        ns = {}
        for a in ids:
            for b in ids:
                if a == b:
                    ns[(a, b)] = 1.0
                elif adj[a] and adj[b]:
                    tot = sum(s[(u, v)] for u in adj[a] for v in adj[b])
                    ns[(a, b)] = c * tot / (len(adj[a]) * len(adj[b]))
                else:
                    ns[(a, b)] = 0.0
        s = ns
    return {k: round(v, 6) for k, v in s.items()}


def test_simrank_matches_mirror_on_seeded_graph(spark):
    n = 12
    edges = sorted({(min((5 * i + 1) % n, (3 * i + 7) % n),
                     max((5 * i + 1) % n, (3 * i + 7) % n))
                    for i in range(20)})
    edges = [(a, b) for a, b in edges if a != b]
    ids = sorted({v for e in edges for v in e})
    got = {(r.a, r.b): r.sim
           for r in simrank_topk(_sym(spark, edges), k=len(ids)).collect()}
    exp = _mirror(edges, ids)
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) <= 2e-6, (k, got[k], exp[k])


def test_simrank_symmetric_and_diagonal(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got = {(r.a, r.b): r.sim
           for r in simrank_topk(_sym(spark, edges), k=4).collect()}
    for a in range(4):
        assert got[(a, a)] == 1.0
        for b in range(4):
            assert got[(a, b)] == got[(b, a)]
    # 4-cycle: opposite corners share both neighbors -> strictly more
    # similar than adjacent corners
    assert got[(0, 2)] > got[(0, 1)]


def test_simrank_topk_restriction_isolates_low_degree(spark):
    # star 0-(1..4) plus pendant pair 5-6: top-3 by (deg desc, id) is
    # {0, 1, 2}; within the induced subgraph vertex pairs (1,2) share
    # neighbor 0, but 1 and 2 have no edge to each other
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6)]
    got = {(r.a, r.b): r.sim
           for r in simrank_topk(_sym(spark, edges), k=3, iters=3).collect()}
    assert len(got) == 9
    # leaves 1,2 share their single neighbor 0: s = c * s(0,0) = 0.8
    assert got[(1, 2)] == 0.8
    # star center vs leaf never meet (bipartite parity): stays 0
    assert got[(0, 1)] == 0.0


def test_simrank_isolated_in_subgraph_scores_zero(spark):
    # path 0-1 plus far pair 2-3; take k=3 -> {0,1,2} (deg ties by id);
    # vertex 2's only edge (to 3) leaves the subgraph -> isolated
    edges = [(0, 1), (2, 3)]
    got = {(r.a, r.b): r.sim
           for r in simrank_topk(_sym(spark, edges), k=3, iters=4).collect()}
    assert got[(2, 2)] == 1.0
    assert got[(2, 0)] == 0.0 and got[(0, 2)] == 0.0 and got[(2, 1)] == 0.0
