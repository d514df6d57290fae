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
