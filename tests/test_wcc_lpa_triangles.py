from conftest import df_to_dict, edges_df
from oracles import (
    common_neighbors_oracle,
    lpa_oracle,
    random_graph,
    triangle_mix,
    triangles_oracle,
    wcc_oracle,
)

from plato_spark.algos.lpa import label_propagation
from plato_spark.algos.triangles import common_neighbors, triangle_count
from plato_spark.algos.wcc import connected_components
from plato_spark.graph.edges import symmetrize


def test_wcc_multi_component(spark):
    # 3 clearly separated components + isolated pair (FIXTURES multi_component)
    edges = (
        random_graph(n=30, m=60, seed=2)
        + [(a + 100, b + 100) for a, b in random_graph(n=20, m=40, seed=3)]
        + [(200, 201), (201, 202)]
    )
    got = df_to_dict(connected_components(edges_df(spark, edges)), val="component")
    want = wcc_oracle(edges)
    assert got == want


def test_wcc_chain(spark):
    edges = [(i, i + 1) for i in range(50)]
    got = df_to_dict(connected_components(edges_df(spark, edges)), val="component")
    assert set(got.values()) == {0}


def test_lpa_exact(spark):
    canon = random_graph(n=40, m=140, seed=9)
    sym = canon + [(b, a) for a, b in canon]
    got = df_to_dict(label_propagation(edges_df(spark, sym), iterations=5), val="label")
    want = lpa_oracle(sym, iterations=5)
    assert got == want


def test_lpa_directed_exact(spark):
    edges = random_graph(n=35, m=120, seed=21, directed=True)
    got = df_to_dict(label_propagation(edges_df(spark, edges), iterations=4), val="label")
    want = lpa_oracle(edges, iterations=4)
    assert got == want


def test_triangles_mix(spark):
    edges = triangle_mix()
    got = triangle_count(edges_df(spark, edges)).collect()[0]["triangles"]
    assert got == triangles_oracle(edges) == 2 + 10  # 2 triangles + C(5,3)=10


def test_triangles_random(spark):
    edges = random_graph(n=40, m=300, seed=4)
    got = triangle_count(edges_df(spark, edges)).collect()[0]["triangles"]
    assert got == triangles_oracle(edges)


def test_triangles_star_zero(spark):
    edges = [(0, i) for i in range(1, 12)]
    got = triangle_count(edges_df(spark, edges)).collect()[0]["triangles"]
    assert got == 0


def test_common_neighbors(spark):
    edges = triangle_mix()
    rows = common_neighbors(edges_df(spark, edges), as_count=False).collect()
    got = {(r["src"], r["dst"]): list(r["common"]) for r in rows}
    assert got == common_neighbors_oracle(edges)


def test_parallelism_invariance_wcc_lpa_triangles(spark):
    # SURVEY §5(d): identical results at different shuffle parallelism
    canon = random_graph(n=40, m=150, seed=131)
    sym = canon + [(b, a) for a, b in canon]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    for p in ("8", "3"):
        spark.conf.set("spark.sql.shuffle.partitions", p)
        try:
            w = df_to_dict(connected_components(edges_df(spark, canon)), val="component")
            l = df_to_dict(label_propagation(edges_df(spark, sym), iterations=4), val="label")
            t = triangle_count(edges_df(spark, canon)).collect()[0]["triangles"]
            results.append((w, l, t))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    assert results[0] == results[1]


def test_wcc_jump_matches_hashmin(spark):
    from oracles import random_graph

    edges = random_graph(n=60, m=110, seed=17, directed=False)
    df = edges_df(spark, edges)
    a = {r["id"]: r["component"]
         for r in connected_components(df, impl="hashmin").collect()}
    b = {r["id"]: r["component"]
         for r in connected_components(df, impl="jump").collect()}
    assert a == b


def test_wcc_jump_long_chain_logarithmic(spark):
    """A 400-vertex path has diameter 399: hash-min needs ~400 supersteps,
    pointer jumping must finish in O(log n) (~<=12 rounds of 1 exchange +
    2 jumps each)."""
    chain = [(i, i + 1) for i in range(400)]
    df = edges_df(spark, chain)
    got = connected_components(df, max_iters=14, impl="jump")
    comps = {r["component"] for r in got.collect()}
    assert comps == {0}


def test_clustering_coefficient_small(spark):
    from plato_spark.algos.triangles import clustering_coefficient

    # triangle 0-1-2 plus pendant 2-3
    df = edges_df(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    got = df_to_dict(clustering_coefficient(df), val="lcc")
    assert got == {0: 1.0, 1: 1.0, 2: round(1 / 3, 6), 3: 0.0}


def test_neighborhood_similarity_small(spark):
    import math

    from plato_spark.algos.triangles import neighborhood_similarity

    # triangle 0-1-2 plus pendant 2-3
    df = edges_df(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    jac = {(r["src"], r["dst"]): r["score"]
           for r in neighborhood_similarity(df, "jaccard").collect()}
    # N(0)={1,2}, N(1)={0,2}: inter={2}, union={0,1,2} -> 1/3
    assert jac[(0, 1)] == round(1 / 3, 6)
    # N(2)={0,1,3}, N(3)={2}: inter={} -> 0
    assert jac[(2, 3)] == 0.0
    aa = {(r["src"], r["dst"]): r["score"]
          for r in neighborhood_similarity(df, "adamic_adar").collect()}
    # common neighbor of (0,1) is 2 with deg 3 -> 1/ln 3
    assert aa[(0, 1)] == round(1 / math.log(3), 6)
    assert aa[(2, 3)] == 0.0
    ra = {(r["src"], r["dst"]): r["score"]
          for r in neighborhood_similarity(df, "resource_allocation").collect()}
    assert ra[(0, 1)] == round(1 / 3, 6)  # 1/deg(2)
    assert ra[(2, 3)] == 0.0
    pa = {(r["src"], r["dst"]): r["score"]
          for r in neighborhood_similarity(df, "preferential_attachment").collect()}
    # deg: 0->2, 1->2, 2->3, 3->1
    assert pa == {(0, 1): 4, (0, 2): 6, (1, 2): 6, (2, 3): 3}


def test_component_edges_and_major(spark):
    # two components: triangle {0,1,2} (3 edges) and pair {10,11} (1 edge);
    # write_all_edges parity: every canonical edge labeled by its component
    # (connected_component.hpp:496-538); major = largest component's label.
    from plato_spark.algos.wcc import component_edges, major_component

    edges = [(0, 1), (1, 2), (0, 2), (10, 11)]
    e = edges_df(spark, edges)
    comp = connected_components(e)
    lab = component_edges(e, comp).collect()
    got = {(r.src, r.dst): r.component for r in lab}
    assert got == {(0, 1): 0, (1, 2): 0, (0, 2): 0, (10, 11): 10}
    assert major_component(comp) == 0
    maj = component_edges(e, comp, target=major_component(comp)).collect()
    assert sorted((r.src, r.dst) for r in maj) == [(0, 1), (0, 2), (1, 2)]
