"""Round-4 batch 54: DAU/WAU stickiness, attribution comparison,
Lorenz deciles."""

import datetime


def test_stickiness_trailing_window(spark, tmp_path):
    d = datetime.datetime
    # user 1 active day 1 and day 5; user 2 active day 5:
    # day 1: dau 1, wau 1; day 5: dau 2, wau(days -1..5) 2
    ev = spark.createDataFrame(
        [(1, d(2024, 1, 1), 1, "view", 0.0, ""),
         (2, d(2024, 1, 5), 1, "view", 0.0, ""),
         (3, d(2024, 1, 5), 2, "view", 0.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as entrymod

    out = {r.day_i: r for r in entrymod.q_stickiness(
        spark, str(tmp_path)).collect()}
    assert len(out) == 2
    d1, d5 = sorted(out)
    assert out[d1].dau == 1 and out[d1].wau == 1
    assert out[d1].stickiness == 1.0
    assert out[d5].dau == 2 and out[d5].wau == 2   # day-1 is 4 days back
    assert out[d5].stickiness == 1.0


def test_attribution_first_vs_last(spark, tmp_path):
    d = datetime.datetime
    # user 1: view(1) then click(2) then purchase(3): first=1, last=2
    # user 2: single view(4) then purchase(5): first=last=4
    # user 3: purchase(6) with no touch: counted in n_conversions only
    ev = spark.createDataFrame(
        [(1, d(2024, 1, 1, 0, 0), 1, "view", 0.0, ""),
         (2, d(2024, 1, 1, 0, 5), 1, "click", 0.0, ""),
         (3, d(2024, 1, 1, 0, 9), 1, "purchase", 1.0, ""),
         (4, d(2024, 1, 1, 1, 0), 2, "view", 0.0, ""),
         (5, d(2024, 1, 1, 1, 9), 2, "purchase", 1.0, ""),
         (6, d(2024, 1, 1, 2, 0), 3, "purchase", 1.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_attribution_comparison(
        spark, str(tmp_path)).collect()[0]
    assert r.n_conversions == 3
    assert r.with_touch == 2
    assert r.same_touch == 1
    assert r.same_frac == 0.5


def test_revenue_lorenz_uniform_and_skewed(spark, tmp_path):
    d = datetime.datetime(2024, 1, 1)
    # 11 customers: ten with 10.00, one whale with 900.00 (total 1000)
    rows = [(i, i, "O", 10.0, d, "1") for i in range(10)]
    rows.append((10, 10, "O", 900.0, d, "1"))
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    import __spark_entry__ as entrymod

    out = {r.decile: r.cum_share for r in entrymod.q_revenue_lorenz(
        spark, str(tmp_path)).collect()}
    # decile q -> rank (q*10)//10 + 1 = q+1; rank r <= 10 holds cum
    # r*10.00 of 1000.00
    for q in range(1, 10):
        assert out[q] == round((q + 1) * 10 / 1000, 6)
    assert out[10] == 1.0   # rank 11 = the whale closes the curve