"""HITS vs a numpy power-iteration oracle; neighbor-sample determinism,
prefilter==plain equivalence (incl. a hub vertex), and python-gate exactness."""

from __future__ import annotations

import hashlib

import numpy as np
from conftest import edges_df

from plato_spark.algos.hits import hits
from plato_spark.algos.neighbor_sample import neighbor_sample


def _numpy_hits(edges, n_ids, iters=5):
    ids = sorted(n_ids)
    ix = {v: i for i, v in enumerate(ids)}
    a_mat = np.zeros((len(ids), len(ids)))
    for s, d in edges:
        a_mat[ix[s], ix[d]] = 1.0
    hub = np.ones(len(ids))
    auth = np.ones(len(ids))
    for _ in range(iters):
        auth = a_mat.T @ hub
        auth = auth / auth.sum()
        hub = a_mat @ auth
        hub = hub / hub.sum()
    return {v: (round(float(hub[ix[v]]), 6), round(float(auth[ix[v]]), 6))
            for v in ids}


def test_hits_matches_numpy(spark):
    # directed: 0,1,2 are hubs pointing into 3,4; 5 dangles off 4
    edges = [(0, 3), (0, 4), (1, 3), (1, 4), (2, 3), (4, 5), (3, 0)]
    got = {r["id"]: (r["hub"], r["authority"])
           for r in hits(edges_df(spark, edges), iterations=5).collect()}
    want = _numpy_hits(edges, {v for e in edges for v in e})
    for v in want:
        assert abs(got[v][0] - want[v][0]) <= 2e-6, (v, got[v], want[v])
        assert abs(got[v][1] - want[v][1]) <= 2e-6


def _h1(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def test_neighbor_sample_exact_and_prefilter_equiv(spark):
    # random-ish graph + one hub with 400 neighbors (prefilter stress)
    edges = [(i, (i * 7 + 1) % 50) for i in range(50)]
    edges += [(1000, i) for i in range(400)]
    e = edges_df(spark, [(a, b) for a, b in edges if a != b])
    plain = sorted(map(tuple, neighbor_sample(e, k=5, prefilter=False).collect()))
    fast = sorted(map(tuple, neighbor_sample(e, k=5, prefilter=True).collect()))
    assert plain == fast  # fallback makes the prefilter path exact

    # spot-check the hub's sample against the python gate definition
    nbrs = sorted({b for a, b in edges if a == 1000}
                  | {a for a, b in edges if b == 1000 and a != 1000})
    ranked = sorted(nbrs, key=lambda d: (_h1(f"gnn1{1000}:{d}"), d))[:5]
    got_hub = [r[1] for r in sorted(fast, key=lambda r: (r[0], r[2]))
               if r[0] == 1000]
    assert got_hub == ranked

    # per-vertex sample size = min(degree, k), degree over the NEIGHBOR SET
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    cnt = Counter(r[0] for r in fast)
    for v, ns in adj.items():
        assert cnt[v] == min(len(ns), 5), (v, len(ns), cnt[v])


def test_neighbor_sample_seed_changes_sample(spark):
    edges = [(0, i) for i in range(1, 30)]
    e = edges_df(spark, edges)
    s1 = {tuple(r) for r in neighbor_sample(e, k=5, seed="a").collect()}
    s2 = {tuple(r) for r in neighbor_sample(e, k=5, seed="b").collect()}
    assert s1 != s2  # different seeds, different (deterministic) subsets
    assert s1 == {tuple(r) for r in neighbor_sample(e, k=5, seed="a").collect()}


def test_ktruss_fixture(spark):
    """5-clique survives k=5 (every edge closes 3 triangles); a pendant
    triangle survives only k=3; chain edges never (support 0)."""
    from itertools import combinations

    from plato_spark.algos.ktruss import ktruss

    clique = list(combinations(range(5), 2))          # support 3 each
    tri = [(10, 11), (10, 12), (11, 12)]              # support 1 each
    chain = [(20, 21), (21, 22)]                      # support 0
    e = edges_df(spark, clique + tri + chain)

    k5 = sorted(map(tuple, ktruss(e, k=5).collect()))
    assert k5 == sorted(clique)
    k3 = sorted(map(tuple, ktruss(e, k=3).collect()))
    assert k3 == sorted(clique + tri)
    assert ktruss(e, k=6).count() == 0  # 5-clique cannot be a 6-truss


def test_ktruss_incremental_matches_full_recompute(spark):
    """The decrement-based peel must reach the same fixpoint as a naive
    full-support-recompute peel on a random graph with multiple peel
    rounds (including triangles losing 2+ edges in one round)."""
    from collections import defaultdict

    from oracles import random_graph

    from plato_spark.algos.ktruss import ktruss

    canon = random_graph(n=25, m=120, seed=31)

    def peel(edge_set, k):
        edges = set(edge_set)
        while True:
            adj = defaultdict(set)
            for u, v in edges:
                adj[u].add(v)
                adj[v].add(u)
            drop = {(u, v) for u, v in edges if len(adj[u] & adj[v]) < k - 2}
            if not drop:
                return edges
            edges -= drop

    e = edges_df(spark, canon)
    for k in (3, 4, 5):
        metrics = []
        got = sorted(map(tuple, ktruss(e, k=k, metrics=metrics).collect()))
        assert got == sorted(peel(canon, k)), f"k={k}"
        # incremental invariant: round-2+ work tracks the peeled set
        assert metrics[-1]["peeled"] == 0


def test_neighbor_sample_two_layer_frontier(spark):
    """GraphSAGE layer-2: sampling restricted to layer-1's neighbor set."""
    edges = [(i, j) for i in range(20) for j in range(20, 26)]  # bipartite
    e = edges_df(spark, edges)
    l1 = neighbor_sample(e, k=2, seed="s")
    f = l1.select(l1.nbr.alias("src"))
    l2 = neighbor_sample(e, k=3, seed="s", frontier=f)
    l1_nbrs = {r["nbr"] for r in l1.collect()}
    assert {r["src"] for r in l2.collect()} == l1_nbrs  # only frontier sampled
    assert l2.groupBy("src").count().agg({"count": "max"}).collect()[0][0] <= 3


def test_spread_count_and_aggregate(spark):
    """spread.cc semantics: star 0-{1,2,3}, behaviours on 1 (two rows) and
    2 (one row); vertex 0 spreads over 3 rows from 2 distinct neighbors,
    leaves spread over vertex 0 only if 0 had behaviours (it doesn't)."""
    from plato_spark.algos.spread import spread_aggregate, spread_count

    e = edges_df(spark, [(0, 1), (0, 2), (0, 3)])
    beh = spark.createDataFrame(
        [(1, "click", 2.0), (1, "view", 3.0), (2, "click", 5.0)],
        "id long, behaviour_id string, value double",
    )
    cnt = {r["uin"]: (r["distinct_nbrs"], r["spread_cnt"])
           for r in spread_count(e, beh).collect()}
    assert cnt == {0: (2, 3)}  # leaves 1,2,3 have only neighbor 0 (no behaviours)

    agg = {(r["uin"], r["behaviour_id"]): (r["cnt"], r["value_sum"])
           for r in spread_aggregate(e, beh, sum_cols=("value",)).collect()}
    assert agg == {(0, "click"): (2, 7.0), (0, "view"): (1, 3.0)}

    # directed mode: only out-neighbors spread
    d = spark.createDataFrame([(1, 0)], "src long, dst long")
    cnt_d = {r["uin"]: r["spread_cnt"]
             for r in spread_count(d, beh, directed=True).collect()}
    assert cnt_d == {}  # 1 -> 0 but 0 has no behaviours
