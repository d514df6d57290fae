"""Round-4 batch 3: inter-event gaps, degree Gini, Sinkhorn mixing."""

import datetime as dt

import numpy as np
from conftest import edges_df

from plato_spark.functions.events import inter_event_gaps
from plato_spark.functions.sampling import sinkhorn_mixing_weights
from plato_spark.graph.edges import degree_gini


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=us), u)
         for i, (u, us) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long",
    )


def test_inter_event_gaps_basic(spark):
    # user 1: events at 0us, 1.5s, 4.5s -> gaps 1_500_000, 3_000_000
    # user 2: single event -> 0 gaps, NULL stats
    ev = _ev(spark, [(1, 0), (1, 1_500_000), (1, 4_500_000), (2, 7)])
    got = {r.user_id: r for r in inter_event_gaps(ev).collect()}
    g1 = got[1]
    assert (g1.n_events, g1.n_gaps) == (3, 2)
    assert (g1.min_gap_us, g1.max_gap_us) == (1_500_000, 3_000_000)
    assert g1.avg_gap_us == 2_250_000
    g2 = got[2]
    assert (g2.n_events, g2.n_gaps) == (1, 0)
    assert g2.min_gap_us is None and g2.avg_gap_us is None


def test_inter_event_gaps_floor_mean(spark):
    # gaps 1us and 2us -> floor mean 1 (integer division, not rounding)
    ev = _ev(spark, [(1, 0), (1, 1), (1, 3)])
    g = inter_event_gaps(ev).collect()[0]
    assert g.avg_gap_us == 1


def gini_mirror(degs):
    d = np.sort(np.asarray(degs, dtype=np.int64))
    n = len(d)
    i = np.arange(1, n + 1, dtype=np.int64)
    return (2.0 * float((i * d).sum())) / (n * float(d.sum())) - (n + 1) / n


def test_degree_gini_uniform_is_zero(spark):
    # 4-cycle: every degree 2 -> gini 0
    e = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    r = degree_gini(e).collect()[0]
    assert (r.n_vertices, r.total_degree) == (4, 8)
    assert abs(r.gini) < 1e-9


def test_degree_gini_star_mirror(spark):
    # star K1,5: degrees [5,1,1,1,1,1]
    e = edges_df(spark, [(0, i) for i in range(1, 6)])
    r = degree_gini(e).collect()[0]
    want = gini_mirror([5, 1, 1, 1, 1, 1])
    assert abs(r.gini - round(want, 6)) < 1e-9


def test_degree_gini_tie_classes_mirror(spark):
    # mixed graph with repeated degree classes exercises the histogram
    # offset fold: path 0-1-2-3-4 plus chord (0,2)
    e = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2)])
    degs = {0: 2, 1: 2, 2: 3, 3: 2, 4: 1}
    r = degree_gini(e).collect()[0]
    assert abs(r.gini - round(gini_mirror(list(degs.values())), 6)) < 1e-9


def test_sinkhorn_marginals_approach_ones(spark):
    rows = []
    counts = {("s1", "en"): 8, ("s1", "de"): 1, ("s2", "en"): 1,
              ("s2", "de"): 2, ("s3", "de"): 4}
    i = 0
    for (s, lang), c in counts.items():
        for _ in range(c):
            rows.append((i, s, lang))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string")
    out = sinkhorn_mixing_weights(df, iterations=12).collect()
    assert {(r.source, r.lang): r.n_docs for r in out} == counts
    # probability marginals: after the final v-update column sums are
    # exactly 1/|langs|; row sums converge toward 1/|sources|
    col = {}
    row = {}
    for r in out:
        col[r.lang] = col.get(r.lang, 0.0) + r.weight
        row[r.source] = row.get(r.source, 0.0) + r.weight
    for v in col.values():
        assert abs(v - 1.0 / 2) < 1e-5
    for v in row.values():
        assert abs(v - 1.0 / 3) < 0.05


def test_sinkhorn_python_mirror(spark):
    counts = {("a", "x"): 3, ("a", "y"): 1, ("b", "x"): 2}
    rows = []
    i = 0
    for (s, lang), c in counts.items():
        for _ in range(c):
            rows.append((i, s, lang))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string")
    got = {(r.source, r.lang): r.weight
           for r in sinkhorn_mixing_weights(df, iterations=5).collect()}

    srcs = sorted({s for s, _ in counts})
    langs = sorted({l for _, l in counts})
    m = {(s, l): counts.get((s, l), 0) for s in srcs for l in langs}
    u = {s: 1.0 for s in srcs}
    v = {l: 1.0 for l in langs}
    row_t, col_t = 1.0 / len(srcs), 1.0 / len(langs)
    for _ in range(5):
        for s in srcs:
            tot = sum(m[(s, l)] * v[l] for l in langs if m[(s, l)])
            u[s] = row_t / tot
        for l in langs:
            tot = sum(m[(s, l)] * u[s] for s in srcs if m[(s, l)])
            v[l] = col_t / tot
    for (s, l), c in counts.items():
        assert abs(got[(s, l)] - round(c * u[s] * v[l], 6)) < 1e-6
