"""Round-4 batch 56: percent_rank league, Gini mean difference, dup
order audit."""

import datetime
import itertools


def _orders(spark, tmp_path, totals, custs=None, dates=None):
    d0 = datetime.datetime(2024, 1, 1)
    rows = [(i, (custs or [1] * len(totals))[i], "O", float(t),
             (dates or [d0] * len(totals))[i], "1")
            for i, t in enumerate(totals)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def test_gini_mean_difference_matches_pairwise(spark, tmp_path):
    vals = [10.0, 20.0, 40.0, 70.0]
    _orders(spark, tmp_path, vals)
    import __spark_entry__ as entrymod

    r = entrymod.q_gini_mean_difference(spark, str(tmp_path)).collect()[0]
    n = len(vals)
    exact = sum(abs(a - b) for a, b in itertools.combinations(vals, 2))
    # pairsum is the UNORDERED pairwise sum; GMD doubles it
    assert r.pairsum == int(exact * 100)
    assert r.gmd == round(exact * 2 / (n * (n - 1)), 6)
    assert r.relative_gmd == round(
        exact * 2 / ((n - 1) * sum(vals)), 6)


def test_dup_order_audit_counts(spark, tmp_path):
    d = datetime.datetime
    # cust 1 submits 100.00 twice on the same day (dup pair) plus a
    # different amount; cust 2 clean
    _orders(spark, tmp_path, [100.0, 100.0, 55.0, 100.0],
            custs=[1, 1, 1, 2],
            dates=[d(2024, 1, 1)] * 3 + [d(2024, 1, 1)])
    import __spark_entry__ as entrymod

    r = entrymod.q_dup_order_audit(spark, str(tmp_path)).collect()[0]
    assert r.n_groups == 3
    assert r.n_dup_groups == 1
    assert r.n_dup_orders == 2


def test_supplier_percentile_endpoints(spark, tmp_path):
    d = datetime.datetime(2024, 1, 1)
    li_rows = [
        (1, 1, 7, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d),
        (2, 1, 8, 1, 1.0, 200.0, 0.0, 0.0, "N", "O", d),
        (3, 1, 9, 1, 1.0, 300.0, 0.0, 0.0, "N", "O", d),
    ]
    spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(7, "s7", 1, 0.0), (8, "s8", 1, 0.0), (9, "s9", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, "
        "s_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    import __spark_entry__ as entrymod

    out = {r.s_suppkey: r.pct_rank for r in entrymod.q_supplier_percentile(
        spark, str(tmp_path)).collect()}
    assert out[7] == 0.0
    assert out[8] == 0.5
    assert out[9] == 1.0
