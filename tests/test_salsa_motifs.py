"""SALSA + motif census — brute-force and python-mirror checks."""

import itertools
import random

from tests.conftest import edges_df

from plato_spark.algos.motifs import motif_census
from plato_spark.algos.salsa import salsa


def _py_census(edges):
    edges = {tuple(sorted(e)) for e in edges}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    wedges = sum(len(adj[v]) * (len(adj[v]) - 1) // 2 for v in verts)
    tris = sum(
        1 for a, b, c in itertools.combinations(verts, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    c4 = 0
    for quad in itertools.combinations(verts, 4):
        a, b, c, d = quad
        for (p, q), (r, s) in [((a, b), (c, d)), ((a, c), (b, d)),
                               ((a, d), (b, c))]:
            # cycle p-r-q-s-p (diagonals (p,q) and (r,s))
            if (r in adj[p] and q in adj[r] and s in adj[q]
                    and p in adj[s]):
                c4 += 1
    return {"n_vertices": len(verts), "n_edges": len(edges),
            "wedges": wedges, "triangles": tris, "four_cycles": c4}


def _census(spark, edges):
    edges = sorted(edges)
    got = motif_census(edges_df(spark, edges)).collect()[0].asDict()
    assert got == _py_census(edges)
    return got


def test_census_k4(spark):
    got = _census(spark, itertools.combinations(range(4), 2))
    assert got == {"n_vertices": 4, "n_edges": 6, "wedges": 12,
                   "triangles": 4, "four_cycles": 3}


def test_census_c4_cycle(spark):
    got = _census(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    assert got["four_cycles"] == 1 and got["triangles"] == 0
    assert got["wedges"] == 4


def test_census_path(spark):
    got = _census(spark, [(i, i + 1) for i in range(5)])
    assert got["triangles"] == 0 and got["four_cycles"] == 0


def test_census_random(spark):
    rng = random.Random(17)
    edges = {tuple(sorted(rng.sample(range(12), 2))) for _ in range(30)}
    _census(spark, edges)


def _py_salsa(inc, iters):
    inc = sorted(set(inc))
    dl, dr = {}, {}
    for o, p in inc:
        dl[o] = dl.get(o, 0) + 1
        dr[p] = dr.get(p, 0) + 1
    h = {o: 1.0 for o in dl}
    a = {}
    for _ in range(iters):
        a = {p: 0.0 for p in dr}
        for o, p in inc:
            a[p] += h[o] / dl[o]
        t = sum(a.values())
        a = {p: v / t for p, v in a.items()}
        h = {o: 0.0 for o in dl}
        for o, p in inc:
            h[o] += a[p] / dr[p]
        t = sum(h.values())
        h = {o: v / t for o, v in h.items()}
    out = {("hub", o): round(v, 6) for o, v in h.items()}
    out.update({("authority", p): round(v, 6) for p, v in a.items()})
    return out


def test_salsa_symmetric_biclique(spark):
    # K2,2: perfect symmetry -> uniform scores on each side
    inc = [(1, 10), (1, 20), (2, 10), (2, 20)]
    df = spark.createDataFrame(inc, "left long, right long")
    got = {(r["kind"], r["id"]): r["score"] for r in salsa(df, 3).collect()}
    assert got == {("hub", 1): 0.5, ("hub", 2): 0.5,
                   ("authority", 10): 0.5, ("authority", 20): 0.5}


def test_salsa_mirror(spark):
    rng = random.Random(23)
    inc = list({(rng.randrange(6), 100 + rng.randrange(5))
                for _ in range(18)})
    df = spark.createDataFrame(inc, "left long, right long")
    got = {(r["kind"], r["id"]): r["score"] for r in salsa(df, 4).collect()}
    exp = _py_salsa(inc, 4)
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 2e-6, (k, got[k], exp[k])


# ---- densest subgraph ----

from plato_spark.algos.densest import densest_subgraph  # noqa: E402


def _py_densest(edges, max_iters=64):
    live = {tuple(sorted(e)) for e in edges}
    best = None  # (m, n, round, verts)
    for rnd in range(max_iters):
        if not live:
            break
        deg = {}
        for a, b in live:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        m, n = len(live), len(deg)
        if best is None or m * best[1] > best[0] * n:
            best = (m, n, rnd, set(deg))
        keep = {v for v, d in deg.items() if d * 4 * n > 18 * m}
        live = {(a, b) for a, b in live if a in keep and b in keep}
    return best


def _check_densest(spark, edges):
    rows = densest_subgraph(edges_df(spark, sorted(edges))).collect()
    m, n, rnd, verts = _py_densest(edges)
    assert {r["id"] for r in rows} == verts
    assert all(r["peel_round"] == rnd and r["density_num"] == m
               and r["density_den"] == n for r in rows)
    return rows


def test_densest_planted_clique(spark):
    # K8 (deg 7, density 3.5) + a 40-edge path: round 0's threshold
    # 2.25 * avg(~2.8) = 6.4 peels the whole path but keeps the clique,
    # so snapshot 1 is exactly the planted clique
    clique = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    path = [(100 + i, 101 + i) for i in range(40)]
    rows = _check_densest(spark, clique + path)
    assert {r["id"] for r in rows} == set(range(8))
    d = rows[0]
    assert d["peel_round"] == 1
    assert (d["density_num"], d["density_den"]) == (28, 8)


def test_densest_uniform_cycle(spark):
    # a cycle is uniformly dense (m == n): snapshot 0 wins
    edges = [(i, (i + 1) % 8) for i in range(8)]
    rows = _check_densest(spark, edges)
    assert rows[0]["peel_round"] == 0
    assert rows[0]["density_num"] == rows[0]["density_den"] == 8


def test_densest_random(spark):
    import random
    rng = random.Random(41)
    edges = {tuple(sorted(rng.sample(range(25), 2))) for _ in range(70)}
    _check_densest(spark, edges)


# ---- rich club ----

def test_rich_club(spark):
    from plato_spark.algos.motifs import rich_club

    # hub clique K5 (deg >= 4+pendants) + pendant spokes
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    spokes = [(a, 10 + 3 * a + i) for a in range(5) for i in range(3)]
    rows = {r["k"]: r for r in
            rich_club(edges_df(spark, clique + spokes), ks=(4, 6, 32)).collect()}
    # k=4: rich = clique vertices (deg 7 each); all C(5,2) edges present
    assert rows[4]["n_rich"] == 5 and rows[4]["e_rich"] == 10
    assert rows[4]["phi"] == 1.0
    # k=6: deg > 6 still the clique
    assert rows[6]["n_rich"] == 5
    # k=32: nobody
    assert rows[32]["n_rich"] == 0 and rows[32]["phi"] == 0.0


# ---- link-prediction eval harness ----

def test_linkpred_eval(spark):
    import hashlib
    from plato_spark.functions.linkpred import link_prediction_eval

    # two overlapping triangles + a pendant: dense enough that held-out
    # edges are recoverable via common neighbors
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = link_prediction_eval(df, k=3, holdout_mod=3).collect()[0].asDict()

    def held(s, d):
        return int(hashlib.md5(f"lp:{s}:{d}".encode()).hexdigest()[:14],
                   16) % 3 == 0

    test = [(s, d) for s, d in edges if held(s, d)]
    train = [(s, d) for s, d in edges if not held(s, d)]
    assert got["n_train"] == len(train) and got["n_test"] == len(test)
    assert 0 <= got["n_hits"] <= got["n_test"]
    assert got["hits_at_k"] == (round(got["n_hits"] / got["n_test"], 6)
                                if test else 0.0)


def test_linkpred_perfect_recovery(spark):
    from plato_spark.functions.linkpred import link_prediction_eval

    # complete graph K6: every held-out edge still has 4 common
    # neighbors in train (removing <= a few edges), so hits@k=5 is 1.0
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = link_prediction_eval(df, k=5, holdout_mod=4).collect()[0].asDict()
    assert got["n_test"] > 0
    assert got["n_hits"] == got["n_test"]
    assert got["hits_at_k"] == 1.0


def test_salsa_rejects_zero_iters(spark):
    import pytest

    df = spark.createDataFrame([(1, 10)], "left long, right long")
    with pytest.raises(ValueError):
        salsa(df, iters=0)
