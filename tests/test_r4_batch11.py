"""Round-4 batch 11: TPC-H Q5/Q10/Q15/Q9/Q17/Q22/Q4/Q13 shapes.

Each test pins the semantic corner the oracle comparison alone can
mask: semi-join once-per-order counting, exact integer band membership,
max-tie inclusion, the zero-order bin, and same-nation correlation.
"""

from datetime import datetime

from pyspark.sql import functions as F

from plato_spark.functions.relational import (
    dormant_customers,
    late_shipments,
    local_supplier_volume,
    returned_items,
    small_qty_revenue,
    top_supplier,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_late_shipments_counts_order_once(spark):
    # order 1: TWO late lines -> counted once; order 2: on time -> absent
    o = _df(spark, [(1, "1-URGENT", datetime(2024, 1, 1)),
                    (2, "1-URGENT", datetime(2024, 1, 1))],
            "o_orderkey long, o_orderpriority string, o_orderdate timestamp")
    li = _df(spark, [(1, datetime(2024, 6, 1)), (1, datetime(2024, 7, 1)),
                     (2, datetime(2024, 1, 15))],
             "l_orderkey long, l_shipdate timestamp")
    out = late_shipments(o, li, grace_days=90).collect()
    assert len(out) == 1 and out[0].n_orders == 1


def test_small_qty_band_is_exact_integer(spark):
    # part 7: qty [1, 10, 10] -> 5*1*3=15 < 21 qualifies; 5*10*3 doesn't
    li = _df(spark, [(7, 1.0, 100.0), (7, 10.0, 100.0), (7, 10.0, 100.0)],
             "l_partkey long, l_quantity double, l_extendedprice double")
    p = _df(spark, [(7, "BrandA")], "p_partkey long, p_brand string")
    out = small_qty_revenue(li, p).collect()
    assert len(out) == 1
    assert out[0].n_small_lines == 1 and out[0].lost_revenue == 100.0


def test_dormant_needs_above_avg_and_no_recent_order(spark):
    # avg positive bal over {100, 300} = 200: cust 1 (300, stale order)
    # dormant; cust 2 (300, recent order) not; cust 3 (100) below avg
    c = _df(spark, [(1, 0, 300.0), (2, 0, 300.0), (3, 0, 100.0)],
            "c_custkey long, c_nationkey int, c_acctbal double")
    o = _df(spark, [(10, 1, datetime(1999, 1, 1)),
                    (11, 2, datetime(2001, 1, 1))],
            "o_orderkey long, o_custkey long, o_orderdate timestamp")
    n = _df(spark, [(0, "A")], "n_nationkey int, n_name string")
    out = dormant_customers(o, c, n, since="2000-01-01").collect()
    assert len(out) == 1
    assert out[0].n_customers == 1 and out[0].total_acctbal == 300.0


def test_top_supplier_ties_all_return(spark):
    li = _df(spark, [(1, 100.0, 0.0, datetime(1996, 2, 1)),
                     (2, 100.0, 0.0, datetime(1996, 2, 1)),
                     (3, 50.0, 0.0, datetime(1996, 2, 1))],
             "l_suppkey long, l_extendedprice double, l_discount double, "
             "l_shipdate timestamp")
    s = _df(spark, [(1, "s1"), (2, "s2"), (3, "s3")],
            "s_suppkey long, s_name string")
    out = sorted(top_supplier(li, s).collect())
    assert [r.s_suppkey for r in out] == [1, 2]
    assert all(r.total_revenue == 100.0 for r in out)


def test_local_supplier_same_nation_only(spark):
    li = _df(spark, [(1, 1, 100.0, 0.0), (1, 2, 100.0, 0.0)],
             "l_orderkey long, l_suppkey long, l_extendedprice double, "
             "l_discount double")
    o = _df(spark, [(1, 5, datetime(1996, 3, 1))],
            "o_orderkey long, o_custkey long, o_orderdate timestamp")
    c = _df(spark, [(5, 0)], "c_custkey long, c_nationkey int")
    s = _df(spark, [(1, 0), (2, 1)], "s_suppkey long, s_nationkey int")
    n = _df(spark, [(0, "A", 0), (1, "B", 0)],
            "n_nationkey int, n_name string, n_regionkey int")
    r = _df(spark, [(0, "R")], "r_regionkey int, r_name string")
    out = local_supplier_volume(li, o, c, s, n, r).collect()
    assert len(out) == 1
    assert out[0].nation == "A" and out[0].n_items == 1
    assert out[0].revenue == 100.0


def test_returned_items_rank_pins_ties_by_custkey(spark):
    li = _df(spark, [(1, 100.0, 0.0, "R"), (2, 100.0, 0.0, "R"),
                     (3, 100.0, 0.0, "N")],
             "l_orderkey long, l_extendedprice double, l_discount double, "
             "l_returnflag string")
    o = _df(spark, [(1, 9), (2, 4), (3, 4)],
            "o_orderkey long, o_custkey long")
    c = _df(spark, [(9, "c9", 0), (4, "c4", 0)],
            "c_custkey long, c_name string, c_nationkey int")
    n = _df(spark, [(0, "A")], "n_nationkey int, n_name string")
    out = {r.c_custkey: r for r in returned_items(li, o, c, n, k=2).collect()}
    # equal revenue -> lower custkey ranks first
    assert out[4].rank == 1 and out[9].rank == 2
