"""Round-4 batch 34: cohort LTV, weighted-median discount, name facets."""

from datetime import datetime

import __spark_entry__ as entry


def test_cohort_ltv_ages_and_exact_revenue(spark, tmp_path):
    rows = [
        # cust 1 first orders 1995, spends again in 1997
        (1, 1, "F", 100.0, datetime(1995, 3, 1), "p"),
        (2, 1, "F", 50.0, datetime(1997, 5, 1), "p"),
        # cust 2 acquired 1997
        (3, 2, "F", 70.0, datetime(1997, 7, 1), "p"),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet"))
    got = {(r.cohort, r.age): (r.active_customers, r.revenue) for r in
           entry.q_cohort_ltv(spark, str(tmp_path)).collect()}
    assert got == {(1995, 0): (1, 100.0), (1995, 2): (1, 50.0),
                   (1997, 0): (1, 70.0)}


def test_weighted_median_discount_unit_weighted(spark, tmp_path):
    # discount 0.00 carries 10 units, 0.05 carries 70, 0.10 carries 20:
    # cumulative 10/80/100 -> p25 hits at 0.05 (10*4 < 100 <= 80*4),
    # median 0.05, p75 0.05 (80*4 >= 300).
    rows = [(1, 0.00, 10.0), (2, 0.05, 70.0), (3, 0.10, 20.0)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_discount double, l_quantity double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet"))
    got = {r.q: (r.discount, r.total_qty) for r in
           entry.q_weighted_median_discount(spark,
                                            str(tmp_path)).collect()}
    assert got == {0.25: (0.05, 100), 0.5: (0.05, 100),
                   0.75: (0.05, 100)}


def test_weighted_median_boundary_hits_lower_value(spark, tmp_path):
    # exact boundary: 0.00 carries exactly half the units -> the >=
    # lower-quantile rule picks 0.00 for the median
    rows = [(1, 0.00, 50.0), (2, 0.10, 50.0)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_discount double, l_quantity double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet"))
    got = {r.q: r.discount for r in
           entry.q_weighted_median_discount(spark,
                                            str(tmp_path)).collect()}
    assert got[0.5] == 0.0 and got[0.75] == 0.1


def test_part_name_revenue_attribution(spark, tmp_path):
    part = spark.createDataFrame(
        [(1, "red shiny bolt", "B", "t", 1, 0.0),
         (2, "blue bolt", "B", "t", 1, 0.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double")
    li = spark.createDataFrame(
        [(1, 100.0, 0.0), (2, 50.0, 0.0)],
        "l_partkey long, l_extendedprice double, l_discount double")
    part.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet"))
    li.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet"))
    got = {r.token: (r.n_lines, r.revenue) for r in
           entry.q_part_name_revenue(spark, str(tmp_path)).collect()}
    # 'bolt' appears in both parts -> attributed both lines' revenue
    assert got["bolt"] == (2, 150.0)
    assert got["red"] == (1, 100.0) and got["blue"] == (1, 50.0)
