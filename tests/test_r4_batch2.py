"""Round-4 batch 2: transitivity, avg neighbor degree, hapax stats,
partition-cut audit."""

import re

from conftest import edges_df

from plato_spark.algos.triangles import transitivity
from plato_spark.functions.text import hapax_stats
from plato_spark.graph.edges import avg_neighbor_degree
from plato_spark.graph.partitioning import partition_cut_audit

TOKEN_RE = r"[A-Za-z0-9_]+"


def test_transitivity_triangle_with_pendant(spark):
    # K3 on {0,1,2} plus pendant edge (2,3): T=1, W = 1+1+3+0 = 5
    e = edges_df(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    r = transitivity(e).collect()[0]
    assert (r.n_triangles, r.n_wedges) == (1, 5)
    assert abs(r.transitivity - 0.6) < 1e-9


def test_transitivity_triangle_free(spark):
    # path graph: no triangles, wedges exist
    e = edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    r = transitivity(e).collect()[0]
    assert r.n_triangles == 0 and r.n_wedges == 2
    assert r.transitivity == 0.0


def test_avg_neighbor_degree_star(spark):
    e = edges_df(spark, [(0, 1), (0, 2), (0, 3)])
    got = {r.id: (r.deg, r.avg_nbr_deg)
           for r in avg_neighbor_degree(e).collect()}
    assert got == {0: (3, 1.0), 1: (1, 3.0), 2: (1, 3.0), 3: (1, 3.0)}


def test_avg_neighbor_degree_path(spark):
    # 0-1-2-3: deg = 1,2,2,1; knn: 0->2.0, 1->(1+2)/2=1.5, 2->1.5, 3->2.0
    e = edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r.id: r.avg_nbr_deg for r in avg_neighbor_degree(e).collect()}
    assert got == {0: 2.0, 1: 1.5, 2: 1.5, 3: 2.0}


def test_hapax_stats_mirror(spark):
    rows = [
        (0, "a a b c", "s1"),
        (1, "c d", "s1"),
        (2, "x x x", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in hapax_stats(df).collect()}

    for src in ("s1", "s2"):
        toks = []
        for _, t, s in rows:
            if s == src:
                toks += re.findall(TOKEN_RE, t)
        counts = {t: toks.count(t) for t in set(toks)}
        hapax = sum(1 for c in counts.values() if c == 1)
        g = got[src]
        assert (g.n_tokens, g.n_types, g.n_hapax) == (
            len(toks), len(counts), hapax), src
        assert abs(g.type_token_ratio - round(len(counts) / len(toks), 6)) < 1e-9
        assert abs(g.hapax_ratio - round(hapax / len(counts), 6)) < 1e-9


def test_partition_cut_audit_mirror(spark):
    edges = [(0, 1), (0, 33), (5, 37), (40, 41), (2, 66), (63, 64)]
    e = edges_df(spark, edges)
    got = {r.strategy: (r.n_internal, r.n_cut)
           for r in partition_cut_audit(e, num_partitions=32).collect()}

    mx = 66
    w = mx // 32 + 1  # 3
    mod_in = sum(1 for a, b in edges if a % 32 == b % 32)
    rng_in = sum(1 for a, b in edges if a // w == b // w)
    n = len(edges)
    assert got["mod"] == (mod_in, n - mod_in)
    assert got["range"] == (rng_in, n - rng_in)


def test_partition_cut_range_wins_on_local_ids(spark):
    # consecutive-id edges: range placement keeps most internal,
    # mod placement cuts every one of them
    edges = [(i, i + 1) for i in range(0, 200, 2)]
    e = edges_df(spark, edges)
    got = {r.strategy: r.cut_ratio
           for r in partition_cut_audit(e, num_partitions=32).collect()}
    assert got["mod"] == 1.0
    assert got["range"] < 0.3
