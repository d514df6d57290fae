"""Round-4 batch 7: WCC superstep trace, per-class attribute conductance."""

from plato_spark.algos.mixing import attribute_conductance
from plato_spark.algos.wcc import wcc_trace


def _edges(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )


def _labels(spark, pairs):
    return spark.createDataFrame(
        [(int(i), s) for i, s in pairs], "id long, label string"
    )


# ---------------------------------------------------------------- wcc_trace


def test_wcc_trace_path_graph(spark):
    # path 0-1-2-3: label 0 walks one hop per round, changed shrinks 3,2,1,0
    t = wcc_trace(_edges(spark, [(0, 1), (1, 2), (2, 3)]), rounds=6)
    rows = {r.round: (r.frontier, r.changed) for r in t.collect()}
    assert rows == {
        1: (4, 3),
        2: (3, 2),
        3: (2, 1),
        4: (1, 0),
        5: (0, 0),
        6: (0, 0),
    }


def test_wcc_trace_matches_full_chain_mirror(spark):
    # seeded pseudo-random graph vs a python mirror of the FULL relabel
    # chain (the oracle's form) — frontier messaging must agree round
    # for round, not just at the fixpoint
    n = 40
    edges = [((7 * i + 3) % n, (11 * i + 5) % n) for i in range(55)]
    edges = [(a, b) for a, b in edges if a != b]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in adj}
    expect = []
    frontier = len(adj)
    for k in range(1, 11):
        new = {v: min([lab[v]] + [lab[u] for u in adj[v]]) for v in adj}
        changed = sum(1 for v in adj if new[v] < lab[v])
        expect.append((k, frontier, changed))
        lab = new
        frontier = changed
    got = [
        (r.round, r.frontier, r.changed)
        for r in wcc_trace(_edges(spark, edges), rounds=10)
        .orderBy("round")
        .collect()
    ]
    assert got == expect


def test_wcc_trace_exact_row_count_after_fixpoint(spark):
    # single edge converges in 1 round; pinned rounds are padded (0, 0)
    t = wcc_trace(_edges(spark, [(5, 9)]), rounds=4).orderBy("round")
    assert [(r.frontier, r.changed) for r in t.collect()] == [
        (2, 1),
        (1, 0),
        (0, 0),
        (0, 0),
    ]


# ------------------------------------------------- attribute_conductance


TWO_TRIANGLES = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def test_conductance_two_triangles_bridge(spark):
    labels = [(0, "A"), (1, "A"), (2, "A"), (3, "B"), (4, "B"), (5, "B")]
    out = attribute_conductance(
        _edges(spark, TWO_TRIANGLES), _labels(spark, labels)
    )
    got = {r.label: (r.cut_edges, r.volume, r.conductance) for r in out.collect()}
    # vol = 2*3 internal + 1 bridge endpoint = 7 per side, cut = 1,
    # phi = 1/7
    assert got == {"A": (1, 7, 0.142857), "B": (1, 7, 0.142857)}


def test_conductance_single_class_null(spark):
    out = attribute_conductance(
        _edges(spark, [(0, 1), (1, 2)]),
        _labels(spark, [(0, "A"), (1, "A"), (2, "A")]),
    ).collect()
    assert len(out) == 1
    assert out[0].cut_edges == 0 and out[0].volume == 4
    assert out[0].conductance is None


def test_conductance_drops_unlabeled_and_dedups_orientations(spark):
    # edge (0,1) appears in both orientations -> one canonical edge;
    # edge (1, 9) has an unlabeled endpoint -> excluded from cut AND vol
    out = attribute_conductance(
        _edges(spark, [(0, 1), (1, 0), (1, 2), (1, 9)]),
        _labels(spark, [(0, "A"), (1, "A"), (2, "B")]),
    )
    got = {r.label: (r.cut_edges, r.volume, r.conductance) for r in out.collect()}
    # kept canon edges: (0,1) internal-A, (1,2) cross. vol(A) = 3,
    # vol(B) = 1, tot = 4, phi(A) = 1/min(3,1) = 1, phi(B) = 1/1 = 1
    assert got == {"A": (1, 3, 1.0), "B": (1, 1, 1.0)}


def test_conductance_isolated_class_small_side_denominator(spark):
    # star: center A, 3 leaves B -> vol(A)=3, vol(B)=3, cut=3 each side
    out = attribute_conductance(
        _edges(spark, [(0, 1), (0, 2), (0, 3)]),
        _labels(spark, [(0, "A"), (1, "B"), (2, "B"), (3, "B")]),
    )
    got = {r.label: (r.cut_edges, r.volume, r.conductance) for r in out.collect()}
    assert got == {"A": (3, 3, 1.0), "B": (3, 3, 1.0)}


# ------------------------------------------------ edge_betweenness_sampled


def test_edge_betweenness_path_all_roots(spark):
    from plato_spark.algos.betweenness import edge_betweenness_sampled

    # path 0-1-2-3 with all 4 vertices as roots: undirected pair-count
    # formula — c({i,i+1}) = 2 * (i+1) * (n-1-i) for full Brandes.
    out = edge_betweenness_sampled(
        _edges(spark, [(0, 1), (1, 2), (2, 3)]), num_samples=4
    )
    got = {(r.src, r.dst): r.edge_betweenness for r in out.collect()}
    assert got == {(0, 1): 6.0, (1, 2): 8.0, (2, 3): 6.0}


def test_edge_betweenness_diamond_split_paths(spark):
    from plato_spark.algos.betweenness import edge_betweenness_sampled

    # diamond 0-1-3, 0-2-3: two shortest 0..3 paths, each side edge gets
    # half the 0<->3 dependency.  Full 4-root Brandes by hand:
    # sigma/delta symmetric — each of the 4 edges scores identically.
    out = edge_betweenness_sampled(
        _edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3)]), num_samples=4
    )
    got = {(r.src, r.dst): r.edge_betweenness for r in out.collect()}
    assert set(got) == {(0, 1), (0, 2), (1, 3), (2, 3)}
    vals = set(got.values())
    assert len(vals) == 1  # full symmetry
    # each root contributes: its 2 incident DAG edges carry 1 + 0.5 = 1.5
    # and the opposite 2 edges carry 0.5 each -> per-edge total over the
    # 4 roots = 2*1.5 + 2*0.5 = 4.0
    assert vals == {4.0}


def test_edge_betweenness_bridge_dominates(spark):
    from plato_spark.algos.betweenness import edge_betweenness_sampled

    # two triangles + bridge: the bridge edge must strictly dominate
    out = edge_betweenness_sampled(_edges(spark, TWO_TRIANGLES), num_samples=6)
    got = {(r.src, r.dst): r.edge_betweenness for r in out.collect()}
    bridge = got[(2, 3)]
    assert all(bridge > v for k, v in got.items() if k != (2, 3))
    assert len(got) == 7


# --------------------------------------------------------- onion_layers


def test_onion_triangle_pendant(spark):
    from plato_spark.algos.kcore import onion_layers

    out = onion_layers(_edges(spark, [(0, 1), (1, 2), (0, 2), (0, 3)]))
    got = {r.id: (r.layer, r.core) for r in out.collect()}
    # round 1: min deg 1 -> pendant 3 removed at k=1;
    # round 2: all remaining have deg 2 -> triangle removed at k=2
    assert got == {3: (1, 1), 0: (2, 2), 1: (2, 2), 2: (2, 2)}


def test_onion_star_center_outlasts_leaves(spark):
    from plato_spark.algos.kcore import onion_layers

    out = onion_layers(_edges(spark, [(0, 1), (0, 2), (0, 3)]))
    got = {r.id: (r.layer, r.core) for r in out.collect()}
    # leaves peel first at k=1; the center drops to degree 0 and peels
    # the NEXT round, still core 1 but one layer deeper
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 1), 0: (2, 1)}


def test_onion_core_equals_kcore(spark):
    from plato_spark.algos.kcore import kcore, onion_layers

    n = 24
    edges = sorted({((5 * i + 2) % n, (9 * i + 7) % n) for i in range(50)})
    edges = [(a, b) for a, b in edges if a != b]
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges})
    e = _edges(spark, canon)
    peel = {r.id: r.core for r in onion_layers(e).collect()}
    hidx = {r.id: r.coreness for r in kcore(e).collect()}
    assert peel == hidx


def test_onion_chain_peels_outside_in(spark):
    from plato_spark.algos.kcore import onion_layers

    # path 0-1-2-3-4: both endpoints peel each round, meeting in the middle
    out = onion_layers(_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)]))
    got = {r.id: (r.layer, r.core) for r in out.collect()}
    assert got == {
        0: (1, 1), 4: (1, 1), 1: (2, 1), 3: (2, 1), 2: (3, 1),
    }
