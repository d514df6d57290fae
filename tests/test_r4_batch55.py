"""Round-4 batch 55: hourly conversion, single-source risk, value
drift."""

import datetime


def test_hourly_conversion_null_on_no_touch(spark, tmp_path):
    d = datetime.datetime
    ev = spark.createDataFrame(
        [(1, d(2024, 1, 1, 9, 0), 1, "view", 0.0, ""),
         (2, d(2024, 1, 1, 9, 5), 1, "view", 0.0, ""),
         (3, d(2024, 1, 1, 9, 9), 1, "purchase", 1.0, ""),
         (4, d(2024, 1, 1, 23, 0), 2, "purchase", 1.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as entrymod

    out = {r.hour: r for r in entrymod.q_hourly_conversion(
        spark, str(tmp_path)).collect()}
    assert out[9].n_touches == 2 and out[9].n_purchases == 1
    assert out[9].conversion == 0.5
    assert out[23].n_touches == 0 and out[23].conversion is None


def test_single_source_parts_risk_share(spark, tmp_path):
    d = datetime.datetime(2024, 1, 1)
    # part 1: suppliers {7,8} (safe, 300); part 2: supplier {7} only
    # (at risk, 100) -> share 0.25
    rows = [
        (1, 1, 7, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d),
        (1, 1, 8, 2, 1.0, 200.0, 0.0, 0.0, "N", "O", d),
        (2, 2, 7, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_single_source_parts(spark, str(tmp_path)).collect()[0]
    assert (r.n_parts, r.n_single_source) == (2, 1)
    assert r.at_risk_share == 0.25


def test_customer_value_drift_direction_counts(spark, tmp_path):
    d = datetime.datetime
    # cust 1: 100 -> 300 (growing +200); cust 2: 500 -> 400 (shrinking
    # -100); cust 3: single order (excluded)
    rows = [(1, 1, "O", 100.0, d(2024, 1, 1), "1"),
            (2, 1, "O", 300.0, d(2024, 2, 1), "1"),
            (3, 2, "O", 500.0, d(2024, 1, 1), "1"),
            (4, 2, "O", 400.0, d(2024, 3, 1), "1"),
            (5, 3, "O", 900.0, d(2024, 1, 1), "1")]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_customer_value_drift(spark, str(tmp_path)).collect()[0]
    assert r.n_multi_customers == 2
    assert (r.n_growing, r.n_shrinking) == (1, 1)
    assert r.drift_cents_sum == 10000   # +20000 - 10000
    assert r.mean_drift == 50.0
