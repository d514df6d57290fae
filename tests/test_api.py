import math

from conftest import df_to_dict, edges_df
from oracles import pagerank_oracle, random_graph, triangles_oracle, wcc_oracle

from plato_spark.api import LinkGraph
from plato_spark.corpus.generator import synth_corpus


def test_linkgraph_from_edges_full_flow(spark):
    canon = random_graph(n=40, m=150, seed=141)
    g = LinkGraph.from_edges(edges_df(spark, canon))
    st = g.stats()
    assert st["edges"] == len(canon)

    comp = df_to_dict(g.connected_components(), val="component")
    assert comp == wcc_oracle(canon)

    tri = g.triangle_count().collect()[0]["triangles"]
    assert tri == triangles_oracle(canon)

    pr = df_to_dict(g.pagerank(eps=1e-6), val="rank")
    sym = canon + [(b, a) for a, b in canon]
    want = pagerank_oracle(sym)
    for v in want:
        assert math.isclose(pr[v], want[v], abs_tol=1e-6)

    core = g.kcore()
    assert core.count() == len({x for e in canon for x in e})


def test_linkgraph_from_corpus_decode(spark):
    corpus = synth_corpus(spark, 0.001).persist()
    g = LinkGraph.from_corpus(spark, corpus)
    assert g.dictionary is not None
    st = g.stats()
    assert st["edges"] > 100
    pr = g.pagerank(eps=0.0, max_iters=3, decode=True)
    rows = pr.collect()
    assert len(rows) == st["vertices"]
    keys = {r["id_key"] for r in rows}
    assert any(k.startswith("org") for k in keys)      # file vertices
    assert any(k.startswith("repo:") for k in keys)    # repo vertices


def test_linkgraph_string_edges_encoded(spark):
    raw = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y")], "src string, dst string"
    )
    g = LinkGraph.from_edges(raw)
    comp = g.connected_components(decode=True)
    by_key = {r["id_key"]: r["component"] for r in comp.collect()}
    assert by_key["a"] == by_key["b"] == by_key["c"]
    assert by_key["x"] == by_key["y"] != by_key["a"]


def test_linkgraph_round2_methods(spark):
    canon = random_graph(n=30, m=80, seed=7)
    g = LinkGraph.from_edges(edges_df(spark, canon))

    h = g.hits(iterations=3)
    assert set(h.columns) == {"id", "hub", "authority"}
    assert h.count() == len({x for e in canon for x in e})

    ce = g.component_edges()
    assert set(ce.columns) == {"component", "src", "dst"}
    assert ce.count() == len(canon)

    ns = g.neighbor_sample(k=3)
    assert set(ns.columns) == {"src", "nbr", "pos"}
    assert ns.groupBy("src").count().agg({"count": "max"}).collect()[0][0] <= 3
