"""Round-4 batch 24: TPC-H Q21/Q8/Q19 relational shapes."""

from datetime import datetime

from plato_spark.functions.relational import (
    brand_band_revenue,
    market_share,
    waiting_suppliers,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_waiting_suppliers_blames_only_the_sole_late_one(spark):
    # order 1 (F): suppliers 10 (late) + 11 (on time)  -> 10 blamed
    # order 2 (F): suppliers 10 + 11 BOTH late         -> nobody
    # order 3 (F): supplier 10 alone, late             -> nobody (solo)
    # order 4 (O): supplier 11 late but order not 'F'  -> nobody
    orders = spark.createDataFrame(
        [(1, 1, "F", 0.0, _ts("1995-01-01"), "1-URGENT"),
         (2, 1, "F", 0.0, _ts("1995-01-01"), "1-URGENT"),
         (3, 1, "F", 0.0, _ts("1995-01-01"), "1-URGENT"),
         (4, 1, "O", 0.0, _ts("1995-01-01"), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    late, ok = _ts("1995-06-01"), _ts("1995-01-15")
    li = spark.createDataFrame(
        [(1, 10, late), (1, 11, ok),
         (2, 10, late), (2, 11, late),
         (3, 10, late),
         (4, 11, late)],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(10, "SUPP_10", 0, 0.0), (11, "SUPP_11", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    got = {r.s_name: r.numwait
           for r in waiting_suppliers(orders, li, supplier).collect()}
    assert got == {"SUPP_10": 1}


def test_market_share_exact_division(spark):
    # one region-matching customer; supplier 1 (target nation) sells
    # 300.00, supplier 2 (other nation) sells 100.00 -> share 0.75
    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(0, "NATION_3", 0), (1, "NATION_9", 0)],
        "n_nationkey int, n_name string, n_regionkey int")
    customer = spark.createDataFrame(
        [(5, "c", 0, 0.0, "m")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    orders = spark.createDataFrame(
        [(1, 5, "F", 0.0, _ts("1995-03-01"), "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    supplier = spark.createDataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
    li = spark.createDataFrame(
        [(1, 1, 300.0, 0.0), (1, 2, 100.0, 0.0)],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double")
    got = market_share(li, orders, customer, supplier, nation,
                       region).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.year, r.total_revenue, r.nation_revenue, r.mkt_share) == (
        1995, 400.0, 300.0, 0.75)


def test_market_share_excludes_other_regions(spark):
    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(0, "NATION_3", 0), (1, "NATION_9", 1)],
        "n_nationkey int, n_name string, n_regionkey int")
    customer = spark.createDataFrame(
        [(5, "c", 1, 0.0, "m")],  # EUROPE customer -> filtered out
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    orders = spark.createDataFrame(
        [(1, 5, "F", 0.0, _ts("1995-03-01"), "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    supplier = spark.createDataFrame(
        [(1, "s1", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
    li = spark.createDataFrame(
        [(1, 1, 300.0, 0.0)],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double")
    assert market_share(li, orders, customer, supplier, nation,
                        region).count() == 0


def test_brand_band_revenue_band_membership(spark):
    part = spark.createDataFrame(
        [(1, "p", "Brand#1", "t", 10, 0.0),   # in band 1 size range
         (2, "p", "Brand#1", "t", 40, 0.0),   # size OUT of band 1
         (3, "p", "Brand#2", "t", 20, 0.0),   # in band 2 size range
         (4, "p", "Brand#9", "t", 5, 0.0)],   # brand not in any band
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double")
    li = spark.createDataFrame(
        # (partkey, qty, price, discount)
        [(1, 5.0, 100.0, 0.0),    # band 1 hit: rev 100
         (1, 30.0, 100.0, 0.0),   # qty out of band 1 (1..20)
         (2, 5.0, 100.0, 0.0),    # size out -> no band
         (3, 20.0, 50.0, 0.5),    # band 2 hit: rev 25
         (4, 5.0, 100.0, 0.0)],   # brand out
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_discount double",
    )
    got = {r.p_brand: (r.n_items, r.revenue)
           for r in brand_band_revenue(li, part).collect()}
    assert got == {"Brand#1": (1, 100.0), "Brand#2": (1, 25.0)}
