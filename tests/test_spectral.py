"""Spectral Fiedler coordinate (algos/spectral.spectral_coordinate)."""

import numpy as np

from plato_spark.algos.spectral import spectral_coordinate


def _sym(spark, edges):
    rows = sorted({(int(a), int(b)) for a, b in edges}
                  | {(int(b), int(a)) for a, b in edges})
    return spark.createDataFrame(rows, "src long, dst long")


def _mirror(edges, ids, rounds):
    n = len(ids)
    pos = {v: i for i, v in enumerate(ids)}
    A = np.zeros((n, n))
    for a, b in edges:
        A[pos[a], pos[b]] = 1.0
        A[pos[b], pos[a]] = 1.0
    deg = A.sum(axis=1)
    sigma = 2 * deg.max() + 1
    x = np.array([float(v) for v in ids])
    for k in range(rounds + 1):
        if k > 0:
            x = (sigma - deg) * x + A @ x
        x = x - x.sum() / n
        m = np.abs(x).max()
        if m > 0:
            x = x / m
    return {v: round(float(x[pos[v]]), 6) for v in ids}


def test_spectral_separates_barbell(spark):
    # two K4s joined by one bridge: the Fiedler sweep must put each
    # clique on one side (opposite signs)
    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = k1 + k2 + [(0, 10)]
    got = {r.id: r.f for r in
           spectral_coordinate(_sym(spark, edges), rounds=25).collect()}
    left = [got[v] for v in range(4)]
    right = [got[v] for v in range(10, 14)]
    assert all(x > 0 for x in left) != all(x > 0 for x in right)
    assert (max(left) < min(right)) or (max(right) < min(left))


def test_spectral_matches_numpy_mirror(spark):
    n = 14
    edges = sorted({(min((3 * i + 1) % n, (5 * i + 2) % n),
                     max((3 * i + 1) % n, (5 * i + 2) % n))
                    for i in range(22)})
    edges = [(a, b) for a, b in edges if a != b]
    ids = sorted({v for e in edges for v in e})
    got = {r.id: r.f for r in
           spectral_coordinate(_sym(spark, edges), rounds=12).collect()}
    exp = _mirror(edges, ids, 12)
    for v in ids:
        assert abs(got[v] - exp[v]) <= 2e-6, (v, got[v], exp[v])


def test_spectral_zero_is_canonical_positive(spark):
    # odd path 0-1-2-3-4: the center vertex's Fiedler coordinate is 0
    # by antisymmetry, and float iteration lands at +-eps, rounding to
    # IEEE +-0.0 — which value-compares equal but string-sorts apart,
    # misaligning sorted value-hash compares (seen at sf0.1).  The
    # output guard must canonicalize every zero to +0.0.
    import math

    edges = [(i, i + 1) for i in range(4)]
    got = {r.id: r.f for r in
           spectral_coordinate(_sym(spark, edges), rounds=40).collect()}
    assert got[2] == 0.0
    assert math.copysign(1.0, got[2]) == 1.0


def test_spectral_path_is_monotone(spark):
    # the Fiedler vector of a path is monotone along it; 30 rounds on a
    # 6-path is converged enough for the ORDER to hold
    edges = [(i, i + 1) for i in range(5)]
    got = {r.id: r.f for r in
           spectral_coordinate(_sym(spark, edges), rounds=30).collect()}
    seq = [got[i] for i in range(6)]
    assert seq == sorted(seq) or seq == sorted(seq, reverse=True)
