"""Maximal matching (deterministic locally-minimal edges) and bipartite
butterfly counting — hand fixtures + brute-force cross-checks."""

import hashlib
import itertools
import random

from tests.conftest import edges_df

from plato_spark.algos.butterflies import butterfly_stats
from plato_spark.algos.matching import maximal_matching


def _h(src, dst):
    return int(hashlib.md5(f"{src}:{dst}".encode()).hexdigest()[:14], 16)


def _py_matching(edges):
    """Python mirror of the engine's rule: per round, pick edges whose
    (h, src, dst) triple is minimal at both endpoints."""
    live = {(min(a, b), max(a, b)) for a, b in edges}
    out = {}
    rnd = 0
    while live:
        mv = {}
        for s, d in live:
            k = (_h(s, d), s, d)
            for v in (s, d):
                if v not in mv or k < mv[v]:
                    mv[v] = k
        picked = [(s, d) for s, d in live
                  if mv[s] == (_h(s, d), s, d) == mv[d]]
        assert picked, "no progress — rule broken"
        matched = {v for e in picked for v in e}
        for e in picked:
            out[e] = rnd
        live = {(s, d) for s, d in live
                if s not in matched and d not in matched}
        rnd += 1
    return out


def _check(spark, edges):
    got = {
        (r["src"], r["dst"]): r["match_round"]
        for r in maximal_matching(edges_df(spark, edges)).collect()
    }
    assert got == _py_matching(edges)
    # matching property: no two picked edges share a vertex
    seen = set()
    for s, d in got:
        assert s not in seen and d not in seen
        seen.update((s, d))
    # maximality: every input edge touches a matched vertex
    for a, b in edges:
        assert a in seen or b in seen
    return got


def test_matching_path(spark):
    _check(spark, [(1, 2), (2, 3), (3, 4)])


def test_matching_star(spark):
    # star: exactly one edge can match
    got = _check(spark, [(0, i) for i in range(1, 6)])
    assert len(got) == 1


def test_matching_empty(spark):
    assert maximal_matching(edges_df(spark, [])).count() == 0


def test_matching_random(spark):
    rng = random.Random(7)
    edges = list({tuple(sorted(rng.sample(range(30), 2))) for _ in range(60)})
    _check(spark, edges)


def _py_butterflies(inc):
    inc = set(inc)
    left = {o for o, _ in inc}
    right = {p for _, p in inc}
    nb = {p: {o for o, q in inc if q == p} for p in right}
    bf = sum(
        len(nb[u] & nb[v]) * (len(nb[u] & nb[v]) - 1) // 2
        for u, v in itertools.combinations(sorted(right), 2)
    )
    wl = sum(
        d * (d - 1) // 2
        for d in (sum(1 for o2, _ in inc if o2 == o) for o in left)
    )
    wr = sum(d * (d - 1) // 2 for d in (len(nb[p]) for p in right))
    return {
        "n_left": len(left), "n_right": len(right), "n_edges": len(inc),
        "wedges_left": wl, "wedges_right": wr, "butterflies": bf,
    }


def _bstats(spark, inc):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in inc], "left long, right long"
    )
    return butterfly_stats(df).collect()[0].asDict()


def test_butterflies_k22(spark):
    inc = [(1, 10), (1, 20), (2, 10), (2, 20)]
    got = _bstats(spark, inc)
    assert got == {"n_left": 2, "n_right": 2, "n_edges": 4,
                   "wedges_left": 2, "wedges_right": 2, "butterflies": 1}


def test_butterflies_k33(spark):
    inc = [(o, p) for o in (1, 2, 3) for p in (10, 20, 30)]
    got = _bstats(spark, inc)
    assert got["butterflies"] == 9
    assert got["wedges_left"] == got["wedges_right"] == 9


def test_butterflies_no_motifs(spark):
    # a perfect matching has no wedges at all
    got = _bstats(spark, [(1, 10), (2, 20), (3, 30)])
    assert got["wedges_left"] == got["wedges_right"] == 0
    assert got["butterflies"] == 0


def test_butterflies_random(spark):
    rng = random.Random(13)
    inc = list({(rng.randrange(12), 100 + rng.randrange(9)) for _ in range(50)})
    assert _bstats(spark, inc) == _py_butterflies(inc)


# ---- Jones–Plassmann coloring ----

from plato_spark.algos.coloring import jones_plassmann_coloring  # noqa: E402

PRI_MOD = 1 << 31


def _pri(v):
    return (int(hashlib.md5(str(v).encode()).hexdigest()[:14], 16)
            % PRI_MOD) * PRI_MOD + v


def _py_coloring(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    unc = set(adj)
    color = {}
    rounds = {}
    rnd = 0
    while unc:
        winners = [v for v in unc
                   if all(_pri(v) > _pri(u) for u in adj[v] if u in unc)]
        assert winners
        for v in winners:
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
            rounds[v] = rnd
        unc -= set(winners)
        rnd += 1
    return color, rounds


def _check_coloring(spark, edges):
    sym = edges + [(b, a) for a, b in edges]
    rows = jones_plassmann_coloring(edges_df(spark, sym)).collect()
    got_c = {r["id"]: r["color"] for r in rows}
    got_r = {r["id"]: r["jp_round"] for r in rows}
    exp_c, exp_r = _py_coloring(edges)
    assert got_c == exp_c and got_r == exp_r
    for a, b in edges:  # proper coloring
        assert got_c[a] != got_c[b]
    return got_c


def test_coloring_triangle(spark):
    got = _check_coloring(spark, [(1, 2), (2, 3), (1, 3)])
    assert sorted(got.values()) == [0, 1, 2]


def test_coloring_path_two_colors(spark):
    got = _check_coloring(spark, [(i, i + 1) for i in range(6)])
    assert max(got.values()) <= 2  # greedy may use 3 on a path, usually 2


def test_coloring_star(spark):
    got = _check_coloring(spark, [(0, i) for i in range(1, 8)])
    assert sorted(set(got.values())) == [0, 1]


def test_coloring_random(spark):
    rng = random.Random(5)
    edges = list({tuple(sorted(rng.sample(range(24), 2))) for _ in range(70)})
    _check_coloring(spark, edges)


# ---- weighted (locally-heaviest) matching ----

def _py_weighted_matching(edges_w):
    """Sequential heaviest-first greedy under (-w, h(src:dst), src, dst)
    order (the r4 chain-splitting hash tiebreak) — must equal the
    parallel locally-heaviest rounds exactly."""
    import hashlib

    def h(s, d):
        return int(hashlib.md5(f"{s}:{d}".encode()).hexdigest()[:14], 16)

    out = {}
    used = set()
    for w, t, s, d in sorted(
        ((-w, h(s, d), s, d) for s, d, w in edges_w)
    ):
        if s not in used and d not in used:
            used.update((s, d))
            out[(s, d)] = None
    return set(out)


def test_weighted_matching_greedy_equivalence(spark):
    from plato_spark.algos.matching import maximal_matching

    edges_w = [(1, 2, 5.0), (2, 3, 7.0), (3, 4, 6.0), (4, 5, 7.0),
               (1, 5, 1.0), (2, 5, 7.0)]
    df = edges_df(spark, [(s, d) for s, d, _ in edges_w],
                  weights=[w for _, _, w in edges_w])
    got = {(r["src"], r["dst"])
           for r in maximal_matching(df, weight_col="weight").collect()}
    assert got == _py_weighted_matching(edges_w)
    # heaviest-first on ties: (2,3) beats (2,5) and (4,5) — its md5
    # tiebreak hash is the smallest of the three weight-7 edges
    assert (2, 3) in got


def test_weighted_matching_random(spark):
    import random
    from plato_spark.algos.matching import maximal_matching

    rng = random.Random(31)
    seen = set()
    edges_w = []
    for _ in range(60):
        s, d = sorted(rng.sample(range(20), 2))
        if (s, d) not in seen:
            seen.add((s, d))
            edges_w.append((s, d, float(rng.randrange(1, 5))))
    df = edges_df(spark, [(s, d) for s, d, _ in edges_w],
                  weights=[w for _, _, w in edges_w])
    got = {(r["src"], r["dst"])
           for r in maximal_matching(df, weight_col="weight").collect()}
    assert got == _py_weighted_matching(edges_w)


# ---- per-vertex butterflies ----

def _py_bpv(inc, side="right"):
    inc = set(inc)
    nb = {}
    for o, p in inc:
        key, other = (p, o) if side == "right" else (o, p)
        nb.setdefault(key, set()).add(other)
    out = {}
    ks = sorted(nb)
    for i, u in enumerate(ks):
        tot = 0
        for v in ks[i + 1:]:
            w = len(nb[u] & nb[v])
            c = w * (w - 1) // 2
            if c:
                out[u] = out.get(u, 0) + c
                out[v] = out.get(v, 0) + c
    return out


def test_butterfly_per_vertex_k23(spark):
    from plato_spark.algos.butterflies import butterfly_per_vertex

    # K2,3: parts {10,20,30} each corner C(2,2)=1 butterfly per pair
    inc = [(o, p) for o in (1, 2) for p in (10, 20, 30)]
    df = spark.createDataFrame(inc, "left long, right long")
    got = {r["id"]: r["butterflies"]
           for r in butterfly_per_vertex(df).collect()}
    assert got == _py_bpv(inc) == {10: 2, 20: 2, 30: 2}


def test_butterfly_per_vertex_random(spark):
    import random
    from plato_spark.algos.butterflies import butterfly_per_vertex

    rng = random.Random(19)
    inc = list({(rng.randrange(10), 100 + rng.randrange(8))
                for _ in range(45)})
    df = spark.createDataFrame(inc, "left long, right long")
    got = {r["id"]: r["butterflies"]
           for r in butterfly_per_vertex(df).collect()}
    assert got == _py_bpv(inc)
