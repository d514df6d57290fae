"""Round-4 batch 32: HLL set algebra + Theil-Sen robust trend."""

from datetime import datetime, timedelta

import __spark_entry__ as entry
from plato_spark.functions.sketches import hll_set_ops


def test_hll_set_ops_exact_columns_and_union_bounds(spark):
    # A = users 0..9 ('view'), B = users 5..14 ('purchase'):
    # exact a=10 b=10 union=15 intersect=5.  At tiny cardinality the
    # estimator sits in its linear-counting branch and is near-exact;
    # assert the exact columns exactly and the estimates' identities.
    rows = [(i, datetime(2024, 1, 1), u, "view", 0.0, "")
            for i, u in enumerate(range(10))]
    rows += [(100 + i, datetime(2024, 1, 1), u, "purchase", 0.0, "")
             for i, u in enumerate(range(5, 15))]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")
    r = hll_set_ops(ev, "event_type", "user_id", "view",
                    "purchase").collect()[0]
    assert (r.exact_a, r.exact_b, r.exact_union, r.exact_intersect) == (
        10, 10, 15, 5)
    # inclusion-exclusion identity holds on the rounded estimates
    assert r.est_intersect == round(r.est_a + r.est_b - r.est_union, 4)
    # union register max can never estimate below either side
    assert r.est_union >= max(r.est_a, r.est_b)


def test_theil_sen_ignores_the_outlier_day(spark, tmp_path):
    # days 0..4 revenue 100,110,120,130,10000 (one whale day):
    # pairwise slopes: all non-whale pairs are exactly 10/day; the 4
    # whale pairs are huge.  median of [10 x6, 2467.5, 3290, 4935,
    # 9870] = 10.0 -> robust; OLS would be pulled far off.
    base = datetime(1995, 1, 1)
    prices = [100.0, 110.0, 120.0, 130.0, 10000.0]
    df = spark.createDataFrame(
        [(d + 1, 1, "F", p, base + timedelta(days=d), "p")
         for d, p in enumerate(prices)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet"))
    r = entry.q_theil_sen_trend(spark, str(tmp_path)).collect()[0]
    assert (r.n_pairs, r.slope_per_day) == (10, 10.0)
