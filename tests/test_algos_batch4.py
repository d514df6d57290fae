"""Round-3 batch: SCC (FW-Min coloring), harmonic centrality,
vocabulary stats, contamination check."""

import sys

from pyspark.sql import functions as F

from tests.conftest import edges_df


# -- reference SCC (Tarjan, iterative) for brute-force comparison ----------

def _tarjan_scc(edges, vertices):
    adj = {v: [] for v in vertices}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, []).append(d)
            adj.setdefault(d, adj.get(d, []))
    sys.setrecursionlimit(10000)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    out = {}
    counter = [0]

    def strongconnect(v):
        work = [(v, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = counter[0]
                counter[0] += 1
                stack.append(node)
                on_stack.add(node)
            recurse = False
            nbrs = adj.get(node, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (node, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[node] = min(low[node], index[w])
            if recurse:
                continue
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])

    for v in sorted(adj):
        if v not in index:
            strongconnect(v)
    return out


def _check_scc(spark, edges, vertices=None):
    from plato_spark.algos.scc import strongly_connected_components

    e = edges_df(spark, edges)
    vdf = None
    vset = set()
    for s, d in edges:
        vset.add(s)
        vset.add(d)
    if vertices is not None:
        vset |= set(vertices)
        vdf = spark.createDataFrame([(int(v),) for v in vset], "id long")
    got = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(e, vertices=vdf).collect()
    }
    want = _tarjan_scc(edges, vset)
    assert got == want, f"{got} != {want}"


def test_scc_two_cycles_chained(spark):
    _check_scc(spark, [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)])


def test_scc_deep_condensation_chain(spark):
    # four 2-cycles chained: forces one extraction round per chain layer
    edges = [(1, 2), (2, 1), (3, 4), (4, 3), (5, 6), (6, 5), (7, 8), (8, 7),
             (2, 3), (4, 5), (6, 7)]
    _check_scc(spark, edges)


def test_scc_trim_chain_and_isolated(spark):
    # acyclic path of singletons + an isolated vertex (via vertices param)
    edges = [(10, 11), (11, 12), (12, 13), (13, 14)]
    _check_scc(spark, edges, vertices=[99])


def test_scc_self_loop_and_nested(spark):
    # self loop is ignored; 4-cycle with an internal chord stays one SCC
    edges = [(50, 50), (1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    _check_scc(spark, edges)


def test_scc_mixed_web_shape(spark):
    # bow-tie-ish: IN-tendril -> core cycle -> OUT-tendril + side cycle
    edges = [
        (100, 1), (101, 100),           # in-tendril
        (1, 2), (2, 3), (3, 1),         # core
        (3, 200), (200, 201),           # out-tendril
        (300, 301), (301, 300),         # detached 2-cycle
        (2, 300),                       # core -> side cycle (one-way)
    ]
    _check_scc(spark, edges)


def test_harmonic_path_graph(spark):
    from plato_spark.algos.closeness import harmonic_sampled

    e = edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_sampled(e, num_samples=4, radius=5).collect()
    }
    fac = 4.0 / 4 / 3
    want = {
        1: round(fac * (1 + 1 / 2 + 1 / 3), 6),
        2: round(fac * (1 + 1 + 1 / 2), 6),
        3: round(fac * (1 + 1 + 1 / 2), 6),
        4: round(fac * (1 + 1 / 2 + 1 / 3), 6),
    }
    assert got == want


def test_harmonic_radius_truncation(spark):
    from plato_spark.algos.closeness import harmonic_sampled

    # path 1-2-3-4-5, radius=2: contributions at dist 3+ are dropped
    e = edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_sampled(e, num_samples=5, radius=2).collect()
    }
    fac = 5.0 / 5 / 4
    def h(dists):
        return round(fac * sum(1 / d for d in dists if 0 < d <= 2), 6)
    want = {
        1: h([1, 2, 3, 4]),
        2: h([1, 1, 2, 3]),
        3: h([2, 1, 1, 2]),
        4: h([3, 2, 1, 1]),
        5: h([4, 3, 2, 1]),
    }
    assert got == want


def test_vocabulary_stats(spark):
    from plato_spark.functions.text import vocabulary_stats

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b z")], "doc_id long, text string"
    )
    rows = [tuple(r) for r in vocabulary_stats(docs, top_k=2).collect()]
    assert rows == [("b", 3, 2), ("a", 2, 1)]


def test_contamination_check(spark):
    from plato_spark.functions.dedup import contamination_check

    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9"  # 9 tokens -> two 8-grams
    train = spark.createDataFrame(
        [
            (1, "intro words here " + shared + " outro"),
            (2, "completely different text with no overlap at all"),
            (3, "prefix " + shared),
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(10, "eval head " + shared + " eval tail"), (11, "nothing common")],
        "doc_id long, text string",
    )
    got = {
        r["train_id"]: (r["n_shared"], r["n_eval_docs"])
        for r in contamination_check(train, evalset, n=8).collect()
    }
    assert got == {1: (2, 1), 3: (2, 1)}


def test_truss_decomposition_known_fixture(spark):
    from plato_spark.algos.ktruss import truss_decomposition

    # K5 on 1..5 (every edge trussness 5 with k_max=6), a pendant
    # triangle {5,10,11} (trussness 3), and a tail edge 11-12 (trussness 2)
    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    edges = k5 + [(5, 10), (5, 11), (10, 11), (11, 12)]
    got = {
        (r["src"], r["dst"]): r["trussness"]
        for r in truss_decomposition(edges_df(spark, edges), k_max=6).collect()
    }
    want = {e: 5 for e in k5}
    want.update({(5, 10): 3, (5, 11): 3, (10, 11): 3, (11, 12): 2})
    assert got == want


def test_effective_diameter_consistency(spark):
    from plato_spark.algos.hll_portable import (
        effective_diameter_portable,
        hyperanf_portable,
    )

    # path 0-1-2-3-4 (diameter 4) vs 5-clique (diameter 1)
    path = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    clique = edges_df(
        spark, [(a, b) for a in range(5) for b in range(a + 1, 5)]
    )
    row_p = effective_diameter_portable(path, steps=5).collect()[0]
    row_c = effective_diameter_portable(clique, steps=3).collect()[0]
    # clique saturates in one hop; path needs several
    assert 0.0 < row_c["eff_diameter"] <= 1.0
    assert row_p["eff_diameter"] > row_c["eff_diameter"]
    # avg_distance agrees with hyperanf_portable's step=-1 read-out
    anf_avg = {
        r["step"]: r["anf"] for r in hyperanf_portable(path, steps=5).collect()
    }[-1]
    assert abs(row_p["avg_distance"] - anf_avg) < 1e-6


def test_tfidf_keywords(spark):
    from plato_spark.functions.text import tfidf_keywords

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["rank"]): (r["token"], r["tf"], r["score"])
        for r in tfidf_keywords(docs, top_k=2).collect()
    }
    # N=2; score = tf * N / df
    assert got == {
        (1, 1): ("a", 2, 4.0),
        (1, 2): ("b", 1, 1.0),
        (2, 1): ("c", 1, 2.0),
        (2, 2): ("b", 1, 1.0),
    }
