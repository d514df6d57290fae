"""Histogram quantiles + funnel — python-mirror and semantic checks."""

import math

from pyspark.sql import functions as F

from plato_spark.functions.events import funnel_counts
from plato_spark.functions.quantiles import histogram_quantiles


def _py_hist_quantiles(vals, qs, nbins):
    lo, hi, n = min(vals), max(vals), len(vals)
    w = (hi - lo) / nbins
    ws = w if w != 0 else 1.0
    hist = {}
    for x in vals:
        b = min(int(math.floor((x - lo) / ws)), nbins - 1)
        hist[b] = hist.get(b, 0) + 1
    out = {}
    for q in qs:
        r = max(math.ceil(q * n), 1)
        cum = 0
        for b in sorted(hist):
            prev = cum
            cum += hist[b]
            if cum >= r:
                out[q] = round(lo + w * (b + (r - prev) / hist[b]), 6)
                break
    return out


def _q(spark, vals, qs=(0.5, 0.9), nbins=16):
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = {r["q"]: r["value"]
           for r in histogram_quantiles(df, "x", qs, nbins).collect()}
    assert got == _py_hist_quantiles(vals, qs, nbins)
    return got


def test_quantiles_uniform(spark):
    got = _q(spark, list(range(1, 101)), qs=(0.5, 0.9, 0.99))
    assert abs(got[0.5] - 50) < 2 and abs(got[0.9] - 90) < 2


def test_quantiles_skewed(spark):
    _q(spark, [1.0] * 90 + [1000.0] * 10, qs=(0.5, 0.95))


def test_quantiles_constant_column(spark):
    got = _q(spark, [7.0] * 20, qs=(0.5, 0.99))
    assert got == {0.5: 7.0, 0.99: 7.0}


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, f"2026-01-01 00:00:{s:02d}") for u, t, s in rows],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_funnel_basic(spark):
    rows = [
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),   # full funnel
        (2, "view", 1), (2, "click", 2),                        # stops at 2
        (3, "click", 1), (3, "view", 2), (3, "purchase", 3),    # click too early
        (4, "purchase", 1), (4, "view", 2),                     # purchase too early
    ]
    got = {r["step"]: (r["event_type"], r["users"])
           for r in funnel_counts(_ev(spark, rows),
                                  ["view", "click", "purchase"]).collect()}
    assert got == {1: ("view", 4), 2: ("click", 2), 3: ("purchase", 1)}


def test_funnel_strict_order_same_ts(spark):
    # same-timestamp events do NOT advance the funnel (strict >)
    rows = [(1, "view", 5), (1, "click", 5)]
    got = {r["step"]: r["users"]
           for r in funnel_counts(_ev(spark, rows),
                                  ["view", "click"]).collect()}
    assert got == {1: 1, 2: 0}


def test_funnel_earliest_anchor(spark):
    # the anchor is the EARLIEST qualifying event: user 1's second view
    # (after the click) must not be used to re-enter the funnel
    rows = [(1, "view", 1), (1, "click", 3), (1, "view", 5),
            (1, "purchase", 4)]
    got = {r["step"]: r["users"]
           for r in funnel_counts(_ev(spark, rows),
                                  ["view", "click", "purchase"]).collect()}
    assert got == {1: 1, 2: 1, 3: 1}
