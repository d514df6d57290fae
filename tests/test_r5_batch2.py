"""Round-5 batch 2: power-law exponent MLE, Freeman degree
centralization, TPC-H-Q6-shape forecast revenue — hand fixtures with
closed-form / python-mirror expectations."""

import math

from pyspark.sql import functions as F

from plato_spark.functions.relational import forecast_revenue
from plato_spark.graph.edges import degree_centralization, powerlaw_alpha


def _edges(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )


# ------------------------------------------------------------ powerlaw_alpha


def test_powerlaw_alpha_closed_form(spark):
    # star K1,4: hub degree 4, four leaves degree 1.  kmin=2 tail = the
    # hub only: alpha = 1 + 1/ln(4/1.5), sigma = (alpha-1)/sqrt(1)
    r = powerlaw_alpha(
        _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)]), kmin=2
    ).collect()[0]
    expect = 1.0 + 1.0 / math.log(4 / 1.5)
    assert (r.kmin, r.n_tail, r.max_degree) == (2, 1, 4)
    assert r.alpha == round(expect, 6)
    assert r.sigma == round(expect - 1.0, 6)


def test_powerlaw_alpha_python_mirror_and_histogram_fold(spark):
    # seeded pseudo-random multigraph-free edge set vs a per-VERTEX
    # python mirror — proves the histogram fold (c * ln(v/1.5)) equals
    # the per-vertex sum the estimator is defined over
    n = 60
    edges = {((3 * i + 1) % n, (17 * i + 5) % n) for i in range(150)}
    edges = {(a, b) for a, b in edges if a != b}
    canon = {(min(a, b), max(a, b)) for a, b in edges}
    deg = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tail = [d for d in deg.values() if d >= 2]
    alpha = 1.0 + len(tail) / sum(math.log(d / 1.5) for d in tail)
    r = powerlaw_alpha(_edges(spark, sorted(canon)), kmin=2).collect()[0]
    assert r.n_tail == len(tail)
    assert r.max_degree == max(deg.values())
    assert abs(r.alpha - alpha) < 1e-6


def test_powerlaw_alpha_empty_tail_is_null(spark):
    # single edge: both endpoints degree 1 < kmin — NULL alpha, not 0
    r = powerlaw_alpha(_edges(spark, [(0, 1)]), kmin=2).collect()[0]
    assert r.n_tail == 0
    assert r.alpha is None and r.sigma is None


# ----------------------------------------------------- degree_centralization


def test_degree_centralization_star_is_one(spark):
    # K1,4: Freeman centralization of a star is exactly 1.0
    r = degree_centralization(
        _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    ).collect()[0]
    assert (r.n_vertices, r.max_degree) == (5, 4)
    assert r.centralization == 1.0


def test_degree_centralization_cycle_is_zero_and_path_formula(spark):
    # cycle C5 is 2-regular: centralization exactly 0.0
    c5 = degree_centralization(
        _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)])
    ).collect()[0]
    assert c5.centralization == 0.0
    # path P4 (degrees 1,2,2,1): sum(dmax-d) = 2 over (n-1)(n-2) = 6
    p4 = degree_centralization(
        _edges(spark, [(0, 1), (1, 2), (2, 3)])
    ).collect()[0]
    assert p4.centralization == round(2 / 6, 6)


def test_degree_centralization_small_n_is_null(spark):
    # n = 2: normalizer (n-1)(n-2) vanishes — NULL, not a fake 0/inf
    r = degree_centralization(_edges(spark, [(0, 1)])).collect()[0]
    assert r.n_vertices == 2 and r.centralization is None


# --------------------------------------------------------- forecast_revenue


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_shipdate string, l_quantity double, l_extendedprice double,"
        " l_discount double",
    ).select(
        F.col("l_shipdate").cast("timestamp").alias("l_shipdate"),
        "l_quantity", "l_extendedprice", "l_discount",
    )


def test_forecast_revenue_hand_cents(spark):
    # only the first two lines qualify: in-window, qty<24, disc 5-7%
    rows = [
        ("1996-03-01", 10.0, 100.00, 0.05),   # delta 5.00
        ("1996-07-15", 23.0, 200.00, 0.07),   # delta 14.00
        ("1995-12-31", 10.0, 100.00, 0.06),   # out of window
        ("1996-03-01", 24.0, 100.00, 0.06),   # qty at cap -> excluded
        ("1996-03-01", 10.0, 100.00, 0.04),   # below band
        ("1996-03-01", 10.0, 100.00, 0.08),   # above band
    ]
    r = forecast_revenue(_li(spark, rows)).collect()[0]
    assert r.n_lines == 2
    assert r.avg_discount_pct == 6.0
    assert r.revenue_delta == 19.00


def test_forecast_revenue_empty_match_is_zero_row(spark):
    # empty qualifying set: n_lines 0, NULL avg (guard), 0.00 delta —
    # same contract the DuckDB oracle's COALESCE produces
    r = forecast_revenue(
        _li(spark, [("1995-01-05", 30.0, 100.00, 0.0)])
    ).collect()[0]
    assert r.n_lines == 0
    assert r.avg_discount_pct is None
    assert r.revenue_delta == 0.0
