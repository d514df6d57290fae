"""Round-4 batch 60: monthly seasonality, daily error rate."""

import datetime


def test_monthly_profile_shares(spark, tmp_path):
    d = datetime.datetime
    rows = [(1, 1, "O", 100.0, d(2024, 1, 5), "1"),
            (2, 1, "O", 100.0, d(2024, 1, 9), "1"),
            (3, 1, "O", 200.0, d(2024, 3, 5), "1")]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    import __spark_entry__ as entrymod

    out = {r.month: r for r in entrymod.q_monthly_profile(
        spark, str(tmp_path)).collect()}
    assert out[1].n_orders == 2 and out[1].order_share == round(2 / 3, 6)
    assert out[1].revenue_share == 0.5
    assert out[3].revenue_share == 0.5


def test_daily_error_rate(spark, tmp_path):
    d = datetime.datetime
    ev = spark.createDataFrame(
        [(1, d(2024, 1, 1), 1, "view", 0.0, ""),
         (2, d(2024, 1, 1), 1, "error", 0.0, ""),
         (3, d(2024, 1, 2), 1, "view", 0.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as entrymod

    out = sorted(entrymod.q_daily_error_rate(
        spark, str(tmp_path)).collect(), key=lambda r: r.day_i)
    assert out[0].n_events == 2 and out[0].error_rate == 0.5
    assert out[1].n_errors == 0 and out[1].error_rate == 0.0
