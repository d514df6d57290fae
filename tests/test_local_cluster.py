"""ACL PPR sweep cut — prefix conductance accounting and determinism."""

from pyspark.sql import functions as F

from plato_spark.algos.local_cluster import ppr_sweep_cut


def _edges(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )


def _ppr(spark, scores):
    return spark.createDataFrame(
        [(int(i), float(r)) for i, r in scores], "id long, rank double"
    )


# two triangles joined by a bridge: seed community {0,1,2}
BARBELL = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def test_sweep_barbell_finds_seed_triangle(spark):
    # hand-planted ppr mass concentrated on the left triangle
    scores = [(0, 0.5), (1, 0.2), (2, 0.2), (3, 0.05), (4, 0.03), (5, 0.02)]
    out = ppr_sweep_cut(_edges(spark, BARBELL), _ppr(spark, scores), k=6)
    rows = {r.sweep_rank: r for r in out.collect()}
    assert len(rows) == 6
    # order: keys 0.5/2, 0.2/3 (id 1... wait deg(1)=2) -> compute:
    # deg: 0->2, 1->2, 2->3, 3->3, 4->2, 5->2
    # keys: 0:0.25, 1:0.1, 2:0.066667, 3:0.016667, 4:0.015, 5:0.01
    assert [rows[j].id for j in range(1, 7)] == [0, 1, 2, 3, 4, 5]
    # prefix {0}: cut=2 (0-1, 0-2), vol=2
    assert (rows[1].cut_edges, rows[1].volume) == (2, 2)
    # prefix {0,1}: cut=2 (0-2, 1-2), vol=4
    assert (rows[2].cut_edges, rows[2].volume) == (2, 4)
    # prefix {0,1,2}: cut=1 (bridge 2-3), vol=7 -> phi = 1/7: the minimum
    assert (rows[3].cut_edges, rows[3].volume) == (1, 7)
    assert rows[3].conductance == 0.142857
    phis = [rows[j].conductance for j in range(1, 6)]
    assert min(p for p in phis if p is not None) == rows[3].conductance
    # full-graph prefix: complement volume 0 -> NULL
    assert rows[6].cut_edges == 0 and rows[6].conductance is None


def test_sweep_cut_matches_python_mirror(spark):
    # seeded graph + seeded scores vs a brute-force prefix recount
    n = 20
    edges = sorted({((3 * i + 1) % n, (7 * i + 4) % n) for i in range(40)})
    edges = [(a, b) for a, b in edges if a != b]
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges})
    deg = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    scores = [(v, round(((v * 37) % 11) / 11.0, 6)) for v in deg]
    k = 8
    order = sorted(
        ((v, s / deg[v]) for v, s in scores), key=lambda t: (-t[1], t[0])
    )[:k]
    expect = []
    pref = set()
    for j, (v, _) in enumerate(order, start=1):
        pref.add(v)
        cut = sum(1 for a, b in canon if (a in pref) != (b in pref))
        vol = sum(deg[v2] for v2 in pref)
        tot = 2 * len(canon)
        den = min(vol, tot - vol)
        phi = round(cut / den, 6) if den > 0 else None
        expect.append((j, v, cut, vol, phi))
    got = [
        (r.sweep_rank, r.id, r.cut_edges, r.volume, r.conductance)
        for r in ppr_sweep_cut(_edges(spark, edges), _ppr(spark, scores), k=k)
        .orderBy("sweep_rank")
        .collect()
    ]
    assert got == expect


def test_sweep_ignores_isolated_and_unscored(spark):
    # vertex 9 scored but absent from the graph: not sweepable;
    # vertex 2 in the graph but unscored: dropped by the inner join
    out = ppr_sweep_cut(
        _edges(spark, [(0, 1), (1, 2)]),
        _ppr(spark, [(0, 0.9), (1, 0.1), (9, 0.8)]),
        k=5,
    ).collect()
    assert [r.id for r in sorted(out, key=lambda r: r.sweep_rank)] == [0, 1]
    assert len(out) == 2
