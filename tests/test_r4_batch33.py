"""Round-4 batch 33: funnel window sweep + Benford audit."""

from datetime import datetime, timedelta

import __spark_entry__ as entry


def test_funnel_sensitivity_monotone_and_exact(spark, tmp_path):
    # user 1: view t0, click t0+30min, purchase t0+7h
    # user 2: view t0, click t0+2h
    # 1h window: (2 views, 1 click, 0 purchases)
    # 6h window: (2, 2, 0)   [click at 2h in; purchase 6.5h after click
    #                         anchor -> out]
    # 1d window: (2, 2, 1)
    t0 = datetime(2024, 1, 1, 8, 0)
    rows = [
        (1, t0, 1, "view"), (2, t0 + timedelta(minutes=30), 1, "click"),
        (3, t0 + timedelta(hours=7), 1, "purchase"),
        (4, t0, 2, "view"), (5, t0 + timedelta(hours=2), 2, "click"),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, et, 0.0, "") for i, ts, u, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    ev.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    got = {(r.window_s, r.step): r.users for r in
           entry.q_funnel_sensitivity(spark, str(tmp_path)).collect()}
    assert got == {
        (3600, 1): 2, (3600, 2): 1, (3600, 3): 0,
        (21600, 1): 2, (21600, 2): 2, (21600, 3): 0,
        (86400, 1): 2, (86400, 2): 2, (86400, 3): 1,
    }


def test_benford_exact_shares_and_literal_expectations(spark, tmp_path):
    # totals 100.00, 19.99, 250.00, 12.00 -> first digits of cents ints
    # 10000, 1999, 25000, 1200 are 1,1,2,1
    base = datetime(1995, 1, 1)
    df = spark.createDataFrame(
        [(i + 1, 1, "F", p, base, "p")
         for i, p in enumerate([100.0, 19.99, 250.0, 12.0])],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet"))
    got = {r.digit: (r.n, r.share, r.benford_expected, r.dev) for r in
           entry.q_benford_audit(spark, str(tmp_path)).collect()}
    assert got["1"] == (3, 0.75, 0.30103, round(0.75 - 0.30103, 6))
    assert got["2"] == (1, 0.25, 0.176091, round(0.25 - 0.176091, 6))
    assert set(got) == {"1", "2"}
