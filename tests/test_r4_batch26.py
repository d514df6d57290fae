"""Round-4 batch 26: exact-EWMA, lag-7 autocorrelation, RFM segments."""

from datetime import datetime, timedelta

import __spark_entry__ as entry


def _orders_dir(spark, tmp_path, rows):
    """rows: list of (custkey, day_offset_from_1995_01_01, totalprice)."""
    base = datetime(1995, 1, 1)
    df = spark.createDataFrame(
        [(i + 1, int(c), "F", float(p), base + timedelta(days=int(d)), "p")
         for i, (c, d, p) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_ewma_constant_series_reports_the_constant(spark, tmp_path):
    # $100/day for 21 consecutive days: every full-history day's EWMA
    # is exactly 100.0 (num = C * (2^20 - 1) cancels the normalizer).
    sf = _orders_dir(spark, tmp_path, [(1, d, 100.0) for d in range(21)])
    got = {r.day_i: r.ewma for r in entry.q_ewma_revenue(spark, sf).collect()}
    assert len(got) == 2  # lo+19 and lo+20
    assert all(v == 100.0 for v in got.values())


def test_ewma_spike_weights_by_powers_of_two(spark, tmp_path):
    # zero-revenue calendar with one spike of (2^20-1)*100 cents on the
    # last day: that day's EWMA = spike * 2^19 / (2^20-1) exactly.
    spike = ((1 << 20) - 1)  # dollars, = 1048575.00
    sf = _orders_dir(spark, tmp_path,
                     [(1, 0, 0.0), (1, 20, float(spike))])
    got = {r.day_i: r.ewma for r in entry.q_ewma_revenue(spark, sf).collect()}
    days = sorted(got)
    assert got[days[0]] == 0.0          # day lo+19: spike not yet seen
    assert got[days[1]] == float(1 << 19)  # exact 524288.0


def test_autocorr_periodic_series_is_one(spark, tmp_path):
    # revenue pattern with exact period 7 (last order day 24, so the
    # calendar spans days 0..24): x_t == x_{t-7} for every pair -> 1.0
    rows = []
    for d in range(28):
        if d % 7 == 0:
            rows.append((1, d, 100.0))
        elif d % 7 == 3:
            rows.append((1, d, 50.0))
    sf = _orders_dir(spark, tmp_path, rows)
    r = entry.q_revenue_autocorr(spark, sf).collect()[0]
    assert (r.n_pairs, r.lag, r.autocorr) == (18, 7, 1.0)


def test_autocorr_alternating_series_is_minus_one(spark, tmp_path):
    # $100 on even days, nothing on odd days, lag 7 (odd) flips parity
    # -> perfect anti-correlation
    sf = _orders_dir(spark, tmp_path,
                     [(1, d, 100.0) for d in range(0, 14, 2)])
    r = entry.q_revenue_autocorr(spark, sf).collect()[0]
    assert (r.n_pairs, r.autocorr) == (6, -1.0)


def test_rfm_scores_and_exact_average(spark, tmp_path):
    # anchor = max order date (day 800).
    # cust 1: 15 orders, last on day 800 (rec 0 -> R4), freq 15 -> F4,
    #         total $4.5M -> M4
    # cust 2: 1 order on day 0 (rec 800 -> R1, F1), $1000 -> M1
    rows = [(1, 800 - i, 300_000.0) for i in range(15)]
    rows.append((2, 0, 1000.0))
    sf = _orders_dir(spark, tmp_path, rows)
    got = {(r.r_score, r.f_score, r.m_score):
           (r.n_customers, r.avg_monetary)
           for r in entry.q_rfm_segments(spark, sf).collect()}
    assert got == {(4, 4, 4): (1, 4_500_000.0), (1, 1, 1): (1, 1000.0)}
