"""Round-4 batch 48: exact spectral moments, seasonal-naive forecast
error."""

import datetime


def _moments(spark, tmp_path, edges):
    # route a hand graph through the registered query by writing a
    # lineitem parquet whose co-occurrence graph IS the hand graph:
    # one order per edge, the two parts being the endpoints
    rows = []
    d = datetime.datetime(2024, 1, 1)
    for i, (u, v) in enumerate(edges):
        rows.append((i, u, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d))
        rows.append((i, v, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    import __spark_entry__ as entrymod

    return entrymod.q_spectral_moments(spark, str(tmp_path)).collect()[0]


def test_spectral_moments_triangle(spark, tmp_path):
    # K3: trace A^2 = 2E = 6; trace A^3 = 6 (one triangle);
    # A^2 = 2I + (J - I) off-diag 1s -> trace A^4 = 3*4 + 6*1 = 18
    r = _moments(spark, tmp_path, [(1, 2), (1, 3), (2, 3)])
    assert (r.trace_a2, r.trace_a3, r.trace_a4) == (6, 6, 18)


def test_spectral_moments_path(spark, tmp_path):
    # P3 (1-2-3): 2E = 4; no triangles; closed 4-walks:
    # deg^2 sum = 1+4+1 = 6; cn(1,3) = 1 both directions -> +2 -> 8
    r = _moments(spark, tmp_path, [(1, 2), (2, 3)])
    assert (r.trace_a2, r.trace_a3, r.trace_a4) == (4, 0, 8)


def test_seasonal_naive_error_hand_series(spark, tmp_path):
    # days 0..8 revenue 100,200,...; day d scored vs d-7 for d=7,8
    d0 = datetime.datetime(2024, 1, 1)
    rows = [(i, 1, "O", float(100 + 10 * i),
             d0 + datetime.timedelta(days=i), "1-URGENT")
            for i in range(9)]
    o = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")
    o.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_seasonal_naive_error(spark, str(tmp_path)).collect()[0]
    # 7-day errors: |170-100|, |180-110| = 70 each -> 7000 cents
    assert r.n_scored_7d == 2 and r.abs_err_7d_cents == 14000
    # 1-day errors: 8 pairs of 10.00 -> 8000 cents
    assert r.n_scored_1d == 8 and r.abs_err_1d_cents == 8000
    assert r.mae_7d == 70.0 and r.mae_1d == 10.0
    assert r.mase_vs_naive1 == 7.0
