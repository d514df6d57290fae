import gzip
import os

from conftest import edges_df
from oracles import random_graph

from pyspark.sql import functions as F

from plato_spark.engine.message import (
    aggregate_message,
    broadcast_message,
    spread_message,
)
from plato_spark.sources.edge_csv import (
    dualmode_adjacency,
    read_edge_csv,
    read_vertex_csv,
)


def test_aggregate_message_pull_sum(spark):
    edges = random_graph(n=20, m=60, seed=111, directed=True)
    df = edges_df(spark, edges)
    state = spark.createDataFrame(
        [(v, float(v + 1)) for v in {x for e in edges for x in e}], "id long, val double"
    )
    got = {r["id"]: r["agg"] for r in
           aggregate_message(df, state, F.col("val")).collect()}
    want = {}
    for u, v in edges:
        want[v] = want.get(v, 0.0) + u + 1
    assert got == want


def test_spread_and_broadcast_message(spark):
    msgs = spark.createDataFrame([(i % 3, i) for i in range(30)], "part long, v long")
    out = spread_message(msgs, "part", num_partitions=3)
    assert out.count() == 30
    assert out.rdd.getNumPartitions() == 3

    frontier = spark.createDataFrame([(0,), (1,)], "src long")
    adj = edges_df(spark, [(0, 5), (1, 6), (2, 7)])
    hit = broadcast_message(frontier, adj)
    assert {r["dst"] for r in hit.collect()} == {5, 6}


def test_read_edge_csv_gzip_and_vertex_payload(spark, tmp_path):
    # gzip CSV edge list, the reference's native input (parsers.hpp:225-295)
    p = tmp_path / "edges.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("0,1,2.5\n1,2,0.5\n2,0,1.0\n")
    e = read_edge_csv(spark, str(p), weighted=True)
    rows = {(r["src"], r["dst"], r["weight"]) for r in e.collect()}
    assert rows == {(0, 1, 2.5), (1, 2, 0.5), (2, 0, 1.0)}

    vp = tmp_path / "verts.csv"
    vp.write_text("0,1.5:2.5\n1,3.0\n")
    v = read_vertex_csv(spark, str(vp))
    got = {r["id"]: list(r["payload"]) for r in v.collect()}
    assert got == {0: [1.5, 2.5], 1: [3.0]}


def test_dualmode_adjacency(spark):
    df = edges_df(spark, [(0, 1), (0, 2), (1, 2)])
    out_adj, in_adj = dualmode_adjacency(df)
    o = {r["id"]: list(r["neighbors"]) for r in out_adj.collect()}
    i = {r["id"]: list(r["neighbors"]) for r in in_adj.collect()}
    assert o == {0: [1, 2], 1: [2]}
    assert i == {1: [0], 2: [0, 1]}
