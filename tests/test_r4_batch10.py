"""Round-4 batch 10: TPC-H Q18/Q14 shapes (large orders, promo share)."""

from datetime import datetime

from plato_spark.functions.relational import large_orders, promo_revenue


def _orders(spark, rows):
    return spark.createDataFrame(
        [(ok, ck, "O", tp, datetime(2024, 1, d), "1-URGENT")
         for ok, ck, tp, d in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def _li(spark, rows):
    # (orderkey, partkey, qty, price, disc, shipmonth)
    return spark.createDataFrame(
        [(ok, pk, 1, float(q), p, d, 0.0, "N", "O", datetime(2024, m, 1))
         for ok, pk, q, p, d, m in rows],
        "l_orderkey long, l_partkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )


def _cust(spark, rows):
    return spark.createDataFrame(
        [(ck, nm, 0, 0.0, "BUILDING") for ck, nm in rows],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )


def test_large_orders_threshold_and_join(spark):
    # order 1: qty 150+60 = 210 > 200 qualifies; order 2: 200 exactly, out
    li = _li(spark, [(1, 0, 150, 10.0, 0.0, 1), (1, 0, 60, 10.0, 0.0, 1),
                     (2, 0, 200, 10.0, 0.0, 1)])
    o = _orders(spark, [(1, 7, 1234.56, 3), (2, 8, 99.0, 4)])
    c = _cust(spark, [(7, "Alice"), (8, "Bob")])
    got = large_orders(o, li, c, threshold=200).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.c_custkey, r.c_name, r.o_orderkey) == (7, "Alice", 1)
    assert r.o_orderdate == "2024-01-03"
    assert r.o_totalprice == 1234.56
    assert r.sum_qty == 210


def test_large_orders_multiple_orders_same_customer(spark):
    li = _li(spark, [(1, 0, 300, 1.0, 0.0, 1), (2, 0, 250, 1.0, 0.0, 1)])
    o = _orders(spark, [(1, 7, 10.0, 1), (2, 7, 20.0, 2)])
    c = _cust(spark, [(7, "Alice")])
    got = sorted(large_orders(o, li, c, threshold=200).collect(),
                 key=lambda r: r.o_orderkey)
    assert [(r.o_orderkey, r.sum_qty) for r in got] == [(1, 300), (2, 250)]


def _part(spark, rows):
    return spark.createDataFrame(
        [(pk, "x", "Brand#1", ty, 1, 1.0) for pk, ty in rows],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )


def test_promo_revenue_hand_computed(spark):
    # month 1: promo part 0 rev 100*0.9=90, plain part 1 rev 200 -> 31.034483%
    # month 2: only plain -> 0%
    li = _li(spark, [(1, 0, 1, 100.0, 0.10, 1), (1, 1, 1, 200.0, 0.0, 1),
                     (2, 1, 1, 50.0, 0.0, 2)])
    p = _part(spark, [(0, "PROMO BURNISHED"), (1, "ECONOMY")])
    got = {r.month: r for r in promo_revenue(li, p).collect()}
    m1 = got["2024-01"]
    assert (m1.promo_rev, m1.total_rev) == (90.0, 290.0)
    assert m1.promo_pct == round(100 * 900000 / 2900000, 6)
    m2 = got["2024-02"]
    assert (m2.promo_rev, m2.total_rev, m2.promo_pct) == (0.0, 50.0, 0.0)


def test_promo_revenue_all_promo_is_100pct(spark):
    li = _li(spark, [(1, 0, 1, 10.0, 0.0, 3)])
    p = _part(spark, [(0, "PROMO X")])
    r = promo_revenue(li, p).collect()[0]
    assert (r.month, r.promo_pct) == ("2024-03", 100.0)
