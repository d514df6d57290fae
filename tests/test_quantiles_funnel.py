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


# ---- temporal co-activity graph ----

def test_co_activity_edges(spark):
    from plato_spark.functions.events import co_activity_edges

    rows = [
        (1, "view", 10), (2, "view", 15), (3, "view", 3 * 3600),  # hour 0 vs 3
        (1, "click", 30), (2, "click", 40),
        (1, "view", 20),                                       # dup bucket
    ]
    df = spark.createDataFrame(
        [(u, t, f"2026-01-01 {s // 3600:02d}:{(s % 3600) // 60:02d}:00")
         for u, t, s in rows],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {(r["src"], r["dst"]): r["weight"]
           for r in co_activity_edges(df).collect()}
    # users 1,2 share (view, hour0) and (click, hour0); user 3 is alone
    assert got == {(1, 2): 2}


def test_co_activity_bucket_guard(spark):
    from plato_spark.functions.events import co_activity_edges

    df = spark.createDataFrame(
        [(u, "view", "2026-01-01 00:00:00") for u in range(10)],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert co_activity_edges(df, max_bucket=5).count() == 0
    assert co_activity_edges(df, max_bucket=10).count() == 45


# ---- percolation sweep ----

def test_percolation_sweep(spark):
    from tests.conftest import edges_df
    from plato_spark.algos.percolation import percolation_sweep

    # triangle of weight-3 edges bridged to a pair by a weight-1 edge
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    weights = [3.0, 3.0, 3.0, 1.0, 2.0]
    rows = {r["threshold"]: r for r in percolation_sweep(
        edges_df(spark, edges, weights), (1, 2, 3, 4)).collect()}
    assert rows[1]["n_components"] == 1 and rows[1]["largest"] == 5
    assert rows[2]["n_components"] == 2  # bridge gone: {1,2,3} and {4,5}
    assert rows[2]["largest"] == 3
    assert rows[3]["n_components"] == 1 and rows[3]["n_vertices"] == 3
    assert rows[4] and rows[4]["n_edges"] == 0 and rows[4]["largest"] == 0


# ---- OOV coverage ----

def test_oov_stats(spark):
    import hashlib
    from plato_spark.functions.text import oov_stats

    docs = [(i, ["apple banana", "banana cherry date"][i % 2])
            for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = oov_stats(df).collect()[0].asDict()

    def half(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:14], 16) % 2

    train_tokens, eval_tokens = set(), []
    for i, t in docs:
        for tok in t.split():
            (train_tokens.add(tok) if half(i) == 0
             else eval_tokens.append(tok))
    n_oov = sum(1 for t in eval_tokens if t not in train_tokens)
    assert got["n_train_vocab"] == len(train_tokens)
    assert got["n_eval_tokens"] == len(eval_tokens)
    assert got["n_oov"] == n_oov
    assert got["oov_rate"] == round(n_oov / len(eval_tokens), 6)


# ---- relational rollup + outliers ----

def test_revenue_rollup_exact(spark):
    from plato_spark.functions.relational import revenue_rollup

    orders = spark.createDataFrame(
        [(1, 10), (2, 11)], "o_orderkey long, o_custkey long")
    li = spark.createDataFrame(
        [(1, 100.0, 0.1), (1, 50.0, 0.0), (2, 200.0, 0.25)],
        "l_orderkey long, l_extendedprice double, l_discount double")
    cust = spark.createDataFrame(
        [(10, 0), (11, 1)], "c_custkey long, c_nationkey long")
    nation = spark.createDataFrame(
        [(0, "A", 0), (1, "B", 0)],
        "n_nationkey long, n_name string, n_regionkey long")
    region = spark.createDataFrame([(0, "R")],
                                   "r_regionkey long, r_name string")
    got = {(r["region"], r["nation"]): (r["n_orders"], r["revenue"])
           for r in revenue_rollup(orders, li, cust, nation, region).collect()}
    assert got == {("R", "A"): (1, 140.0), ("R", "B"): (1, 150.0)}


def test_value_outliers(spark):
    from plato_spark.functions.relational import value_outliers

    rows = [("a", float(v)) for v in [10] * 50 + [11] * 50 + [1000]] \
        + [("b", 5.0)] * 10
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {r["event_type"]: r for r in value_outliers(df, z=3.0).collect()}
    assert got["a"]["n_outliers"] == 1      # the 1000 spike
    assert got["b"]["n_outliers"] == 0      # zero variance -> no outliers
    assert got["b"]["std"] == 0.0


def test_quantiles_ignore_nulls(spark):
    # nulls must not form a phantom bin: result equals the non-null input
    vals = list(range(1, 51))
    df = spark.createDataFrame(
        [(float(v),) for v in vals] + [(None,)] * 25, "x double"
    )
    got = {r["q"]: r["value"]
           for r in histogram_quantiles(df, "x", (0.5, 0.9), 16).collect()}
    assert got == _py_hist_quantiles([float(v) for v in vals], (0.5, 0.9), 16)


def test_quantiles_all_null_empty(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    assert histogram_quantiles(df, "x", (0.5,), 8).collect() == []
    empty = spark.createDataFrame([], "x double")
    assert histogram_quantiles(empty, "x", (0.5,), 8).collect() == []
