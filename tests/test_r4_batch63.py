"""Round-4 batch 63: nation ARPU, first-day conversion."""

import datetime


def test_nation_arpu_idle_customers_in_denominator(spark, tmp_path):
    d = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, 1, "O", 100.0, d, "1")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "a", 5, 0.0, "S"), (2, "b", 5, 0.0, "S")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(5, "FRANCE", 1)],
        "n_nationkey long, n_name string, n_regionkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_nation_arpu(spark, str(tmp_path)).collect()[0]
    assert r.n_customers == 2       # idle customer 2 stays counted
    assert r.revenue_cents == 10000
    assert r.arpu == 50.0           # 100.00 over 2 heads


def test_first_day_conversion(spark, tmp_path):
    d = datetime.datetime
    # user 1 purchases on first day; user 2 purchases on day 2 only;
    # user 3 never purchases
    ev = spark.createDataFrame(
        [(1, d(2024, 1, 1), 1, "view", 0.0, ""),
         (2, d(2024, 1, 1), 1, "purchase", 1.0, ""),
         (3, d(2024, 1, 1), 2, "view", 0.0, ""),
         (4, d(2024, 1, 2), 2, "purchase", 1.0, ""),
         (5, d(2024, 1, 1), 3, "view", 0.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_first_day_conversion(spark, str(tmp_path)).collect()[0]
    assert r.n_users == 3
    assert r.n_first_day_converts == 1
    assert r.first_day_conversion == round(1 / 3, 6)
