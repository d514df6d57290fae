"""Triad census: hand fixtures for every class + a seeded random
digraph cross-checked against a positional brute-force mirror (the
engine decomposes analytically — wedges + per-dyad arithmetic +
complement — so an exhaustive enumeration is an independent method)."""

import random
from itertools import combinations

from plato_spark.algos.triads import TRIAD_CLASSES, triad_census


def _census_bruteforce(n_verts, arcs):
    """Positional enumeration with the same invariant rules."""
    arcs = {(u, v) for u, v in arcs if u != v}
    counts = {t: 0 for t in TRIAD_CLASSES}
    for p, q, s in combinations(range(n_verts), 3):
        pairs = [(p, q), (p, s), (q, s)]
        bits = [((x, y) in arcs, (y, x) in arcs) for x, y in pairs]
        m = sum(1 for f, r in bits if f and r)
        a = sum(1 for f, r in bits if f != r)
        outd = {v: 0 for v in (p, q, s)}
        ind = {v: 0 for v in (p, q, s)}
        for (x, y), (f, r) in zip(pairs, bits):
            if f != r:
                src, dst = (x, y) if f else (y, x)
                outd[src] += 1
                ind[dst] += 1
        if m == 0 and a == 0:
            cls = "003"
        elif m == 0 and a == 1:
            cls = "012"
        elif m == 1 and a == 0:
            cls = "102"
        elif m == 0 and a == 2:
            if max(outd.values()) == 2:
                cls = "021D"
            elif max(ind.values()) == 2:
                cls = "021U"
            else:
                cls = "021C"
        elif m == 1 and a == 1:
            tv = [v for v, (f, r) in zip((s, q, p), bits) if f and r][0]
            cls = "111D" if outd[tv] == 1 else "111U"
        elif m == 0 and a == 3:
            cls = "030C" if all(
                outd[v] == 1 and ind[v] == 1 for v in (p, q, s)
            ) else "030T"
        elif m == 1 and a == 2:
            tv = [v for v, (f, r) in zip((s, q, p), bits) if f and r][0]
            if outd[tv] == 2:
                cls = "120D"
            elif ind[tv] == 2:
                cls = "120U"
            else:
                cls = "120C"
        elif m == 2 and a == 0:
            cls = "201"
        elif m == 2 and a == 1:
            cls = "210"
        else:
            cls = "300"
        counts[cls] += 1
    return counts


def _run(spark, n_verts, arcs):
    e = spark.createDataFrame(
        [(int(u), int(v)) for u, v in arcs] or [], "src long, dst long"
    )
    v = spark.createDataFrame([(i,) for i in range(n_verts)], "id long")
    return {r.triad: r.n for r in triad_census(e, v).collect()}


def _expect(n_verts, **nonzero):
    exp = {t: 0 for t in TRIAD_CLASSES}
    exp.update(nonzero)
    others = sum(nonzero.values())
    exp["003"] = (
        n_verts * (n_verts - 1) * (n_verts - 2) // 6 - others + nonzero.get("003", 0)
    )
    return exp


def test_each_closed_class(spark):
    cases = [
        ([(0, 1), (1, 2), (2, 0)], {"030C": 1}),
        ([(0, 1), (0, 2), (1, 2)], {"030T": 1}),
        ([(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)], {"300": 1}),
        ([(0, 1), (1, 0), (0, 2), (2, 0)], {"201": 1}),
        ([(0, 1), (1, 0), (0, 2), (2, 0), (1, 2)], {"210": 1}),
        ([(0, 1), (1, 0), (2, 0), (2, 1)], {"120D": 1}),
        ([(0, 1), (1, 0), (0, 2), (1, 2)], {"120U": 1}),
        ([(0, 1), (1, 0), (2, 0), (1, 2)], {"120C": 1}),
    ]
    for arcs, nz in cases:
        assert _run(spark, 3, arcs) == _expect(3, **nz), (arcs, nz)


def test_wedge_and_dyadic_classes(spark):
    assert _run(spark, 3, [(0, 1), (0, 2)]) == _expect(3, **{"021D": 1})
    assert _run(spark, 3, [(1, 0), (2, 0)]) == _expect(3, **{"021U": 1})
    assert _run(spark, 3, [(0, 1), (1, 2)]) == _expect(3, **{"021C": 1})
    assert _run(spark, 3, [(0, 1), (1, 0), (2, 0)]) == _expect(3, **{"111D": 1})
    assert _run(spark, 3, [(0, 1), (1, 0), (0, 2)]) == _expect(3, **{"111U": 1})


def test_dyads_with_isolated_universe(spark):
    # one asym edge, three isolated thirds
    got = _run(spark, 5, [(0, 1)])
    assert got["012"] == 3 and got["003"] == 7 and sum(got.values()) == 10
    # one mutual dyad, two isolated thirds
    got = _run(spark, 4, [(0, 1), (1, 0)])
    assert got["102"] == 2 and got["003"] == 2


def test_empty_and_duplicate_edges(spark):
    got = _run(spark, 4, [])
    assert got == _expect(4)
    got = _run(spark, 3, [(0, 1), (0, 1), (1, 1)])  # dup + self loop
    assert got == _expect(3, **{"012": 1})


def test_random_digraph_vs_bruteforce(spark):
    rng = random.Random(1234)
    n = 14
    arcs = [(u, v) for u in range(n) for v in range(n)
            if u != v and rng.random() < 0.18]
    assert _run(spark, n, arcs) == _census_bruteforce(n, arcs)
    assert sum(_census_bruteforce(n, arcs).values()) == n * (n-1) * (n-2) // 6
