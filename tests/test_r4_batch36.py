"""Round-4 batch 36: collective influence, trade reciprocity, hops."""

from datetime import datetime

import __spark_entry__ as entry
from plato_spark.algos.motifs import collective_influence


def _canon(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long")


def test_collective_influence_path5(spark):
    # path 0-1-2-3-4: degrees 1,2,2,2,1.
    # CI(v) = (d-1) * sum of (d-1) at distance exactly 2:
    # v=0: d-1=0 -> 0; v=1: 1 * (d3-1)=1; v=2: 1 * ((d0-1)+(d4-1))=0;
    # v=3: 1 * (d1-1)=1; v=4: 0.
    edges = _canon(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    got = {r.id: r.ci for r in collective_influence(edges).collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1, 4: 0}


def test_collective_influence_star_vs_triangle(spark):
    # hub 0 with leaves 1..3 PLUS leaf 1 extended (1-4):
    # d = {0:3, 1:2, 2:1, 3:1, 4:1}
    # dist-2 sets: 0:{4}; 1:{2,3}; 2:{1,3? no: 2-0-1,2-0-3 -> {1,3}};
    # wait 2's dist-2 = {1,3}; 3's = {1,2}? 3-0-1, 3-0-2 -> {1,2};
    # 4's = {0}.
    # CI: 0: 2*(d4-1)=0; 1: 1*((d2-1)+(d3-1))=0; 2: 0*(..)=0; 3: 0;
    # 4: 0*(d0-1)=0 -- all zero BUT 0's frontier {4} has d-1=0.
    # Extend: add 4-5. d4=2, d5=1.
    # Now 0's dist-2 = {4}: CI(0) = 2*1 = 2.
    edges = _canon(spark, [(0, 1), (0, 2), (0, 3), (1, 4), (4, 5)])
    got = {r.id: r.ci for r in collective_influence(edges).collect()}
    assert got[0] == 2 * 1      # frontier {4}, d4-1 = 1
    assert got[5] == 0          # leaf
    # v=4: d-1=1, dist-2 = {0, 5's none.. 4-1-0 -> {0}}: CI = 1*2 = 2
    assert got[4] == 2


def test_trade_reciprocity_planted_flows(spark, tmp_path):
    nation = spark.createDataFrame(
        [(0, "N0", 0), (1, "N1", 0)],
        "n_nationkey int, n_name string, n_regionkey int")
    supplier = spark.createDataFrame(
        [(1, "s", 0, 0.0), (2, "s", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
    customer = spark.createDataFrame(
        [(1, "c", 0, 0.0, "m"), (2, "c", 1, 0.0, "m")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    orders = spark.createDataFrame(
        [(1, 2, "F", 0.0, datetime(1996, 1, 1), "p"),   # cust N1
         (2, 1, "F", 0.0, datetime(1996, 1, 1), "p")],  # cust N0
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    li = spark.createDataFrame(
        # N0 -> N1 ships 300; N1 -> N0 ships 100
        [(1, 1, 300.0, 0.0), (2, 2, 100.0, 0.0)],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double")
    for name, df in [("nation", nation), ("supplier", supplier),
                     ("customer", customer), ("orders", orders),
                     ("lineitem", li)]:
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"{name}.parquet"))
    r = entry.q_trade_reciprocity(spark, str(tmp_path)).collect()[0]
    # reciprocated = min(300,100) + min(100,300) = 200; total 400
    assert (r.reciprocated_revenue, r.total_revenue, r.reciprocity) == (
        200.0, 400.0, 0.5)


def test_hop_histogram_path(spark, monkeypatch, tmp_path):
    # drive the kernel directly on a path graph via _sampled_bfs
    from plato_spark.algos.closeness import _sampled_bfs

    edges = _canon(spark, [(0, 1), (1, 2)])
    _m, _f, visited = _sampled_bfs(edges, 3, 100)
    got = {}
    for row in visited.groupBy("dist").count().collect():
        got[row.dist] = row["count"]
    # 3 roots x dists: d0 x3; d1: 0-1,1-0,1-2,2-1 -> 4; d2: 0-2,2-0 -> 2
    assert got == {0: 3, 1: 4, 2: 2}
