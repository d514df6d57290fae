"""Round-4 batch 51: integer variance, repeat-revenue share, dormant
balance gap."""

import datetime


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def test_latency_variance_integer_identity(spark, tmp_path):
    d = datetime.datetime
    _write_orders(spark, tmp_path,
                  [(1, 1, "O", 1.0, d(2024, 1, 1), "1")])
    li = spark.createDataFrame(
        [(1, 1, 7, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2024, 1, 3)),
         (1, 2, 7, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2024, 1, 7)),
         (1, 3, 8, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2024, 1, 5))],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    import __spark_entry__ as entrymod

    out = {r.l_suppkey: r for r in entrymod.q_latency_variance(
        spark, str(tmp_path)).collect()}
    # supplier 7: gaps 2 and 6 -> mean 4, var = ((2-4)^2+(6-4)^2)/1 = 8
    assert out[7].mean_days == 4.0 and out[7].var_days == 8.0
    # supplier 8: single shipment -> NULL variance, never 0
    assert out[8].var_days is None


def test_repeat_customer_revenue_share(spark, tmp_path):
    d = datetime.datetime(2024, 1, 1)
    _write_orders(spark, tmp_path, [
        (1, 1, "O", 100.0, d, "1"), (2, 1, "O", 300.0, d, "1"),
        (3, 2, "O", 600.0, d, "1")])
    import __spark_entry__ as entrymod

    r = entrymod.q_repeat_customer_revenue(
        spark, str(tmp_path)).collect()[0]
    assert (r.n_customers, r.n_repeat) == (2, 1)
    assert r.repeat_revenue_share == 0.4   # 400/1000
    assert r.repeat_frac == 0.5


def test_dormant_balance_gap_median_convention(spark, tmp_path):
    d = datetime.datetime
    # customer 1 ordered recently (active); 2 and 3 dormant with
    # balances 10.00 and 30.00 -> even count: lower middle = 10.00
    _write_orders(spark, tmp_path,
                  [(1, 1, "O", 1.0, d(2001, 5, 1), "1")])
    c = spark.createDataFrame(
        [(1, "a", 1, 99.0, "S"), (2, "b", 1, 10.0, "S"),
         (3, "c", 1, 30.0, "S")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    c.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    import __spark_entry__ as entrymod

    out = {r.segment: r for r in entrymod.q_dormant_balance_gap(
        spark, str(tmp_path)).collect()}
    assert out["active"].n == 1 and out["active"].median_balance == 99.0
    assert out["dormant"].n == 2
    assert out["dormant"].median_balance == 10.0   # lower of the middles
    assert out["dormant"].mean_balance == 20.0
