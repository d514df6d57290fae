"""Round-4 batch 8: as-of attribution join, banded interval join,
TPC-H-Q1-shape pricing summary."""

from datetime import datetime

from plato_spark.functions.events import asof_attribution, interval_counts
from plato_spark.functions.relational import pricing_summary


def _events(spark, rows):
    # rows: (event_id, user_id, event_type, ts_seconds_offset)
    base = datetime(2024, 1, 1)
    data = [
        (int(e), int(u), t, datetime.fromtimestamp(base.timestamp() + s))
        for e, u, t, s in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, event_type string, ts timestamp"
    )


# ---------------------------------------------------------- asof_attribution


def test_asof_picks_latest_at_or_before(spark):
    ev = _events(spark, [
        (1, 7, "view", 10),
        (2, 7, "click", 20),
        (3, 7, "purchase", 30),   # matches click@20
        (4, 7, "view", 40),
        (5, 7, "purchase", 40),   # equal-ts touch counts (at-or-before)
        (6, 9, "purchase", 5),    # user 9 has no touch -> NULL
    ])
    got = {r.conversion_id: (r.touch_id, r.gap_us)
           for r in asof_attribution(ev).collect()}
    assert got == {
        3: (2, 10_000_000),
        5: (4, 0),
        6: (None, None),
    }


def test_asof_equal_ts_touch_tie_breaks_by_largest_id(spark):
    ev = _events(spark, [
        (1, 7, "view", 10),
        (2, 7, "click", 10),   # same ts as event 1 -> larger id wins
        (3, 7, "purchase", 11),
    ])
    got = asof_attribution(ev).collect()
    assert len(got) == 1 and got[0].touch_id == 2


def test_asof_touch_after_conversion_ignored(spark):
    ev = _events(spark, [
        (1, 7, "purchase", 10),
        (2, 7, "view", 11),
    ])
    got = asof_attribution(ev).collect()
    assert got[0].touch_id is None and got[0].gap_us is None


# ----------------------------------------------------------- interval_counts


def test_interval_window_boundaries(spark):
    # window [lts - 600s, lts): touch exactly 600s before IS counted,
    # touch at the probe instant is NOT
    ev = _events(spark, [
        (1, 7, "view", 0),      # exactly lts - W -> in
        (2, 7, "click", 300),   # in
        (3, 7, "view", 600),    # == lts -> out
        (4, 7, "error", 600),
        (5, 8, "error", 50),    # user 8: no touches -> 0
    ])
    got = {r.event_id: r.n_touches
           for r in interval_counts(ev, window_s=600).collect()}
    assert got == {4: 2, 5: 0}


def test_interval_bucket_boundary_pairs_counted_once(spark):
    # probe near the start of its bucket: the matching touch lives in
    # the PREVIOUS bucket — the 2-bucket probe explode must find it,
    # and a same-bucket touch must not be double-counted
    ev = _events(spark, [
        (1, 7, "view", 590),     # bucket 0, probe bucket 1 -> prev probe
        (2, 7, "click", 610),    # bucket 1, same bucket as probe
        (3, 7, "error", 650),
    ])
    got = {r.event_id: r.n_touches
           for r in interval_counts(ev, window_s=600).collect()}
    assert got == {3: 2}


def test_interval_other_users_excluded(spark):
    ev = _events(spark, [
        (1, 8, "view", 100),
        (2, 7, "error", 150),
    ])
    got = interval_counts(ev, window_s=600).collect()
    assert got[0].n_touches == 0


# ----------------------------------------------------------- pricing_summary


def _lineitem(spark, rows):
    # (flag, status, qty, price, disc, tax, shipdate)
    data = [
        (f, s, float(q), float(p), float(d), float(t), datetime(1997, 1, 1))
        for f, s, q, p, d, t in rows
    ]
    return spark.createDataFrame(
        data,
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_shipdate timestamp",
    )


def test_pricing_summary_hand_computed(spark):
    li = _lineitem(spark, [
        ("A", "F", 10, 100.00, 0.05, 0.10),
        ("A", "F", 20, 200.00, 0.10, 0.00),
    ])
    r = pricing_summary(li).collect()
    assert len(r) == 1
    row = r[0]
    assert row.sum_qty == 30 and row.n == 2
    assert row.sum_base == 300.0
    # disc prices: 95 + 180 = 275
    assert row.sum_disc_price == 275.0
    # charges: 95*1.10 + 180*1.00 = 104.5 + 180 = 284.5
    assert row.sum_charge == 284.5
    assert row.avg_qty == 15.0
    assert row.avg_price == 150.0
    assert abs(row.avg_disc - 0.075) < 1e-12


def test_pricing_summary_cutoff_filters(spark):
    base = datetime(1997, 1, 1)
    late = datetime(1999, 1, 1)
    li = spark.createDataFrame(
        [
            ("N", "O", 5.0, 50.0, 0.0, 0.0, base),
            ("N", "O", 7.0, 70.0, 0.0, 0.0, late),  # past cutoff -> dropped
        ],
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_shipdate timestamp",
    )
    r = pricing_summary(li).collect()
    assert len(r) == 1 and r[0].sum_qty == 5 and r[0].n == 1


# ------------------------------------------------------------ pagerank_trace


def test_pagerank_trace_regular_graph_fixed_point(spark):
    # symmetrized 3-cycle: every vertex deg 2, contrib sums to 1.0 each
    # round -> rank stays exactly 1.0; trace must be all-zero rows
    from plato_spark.algos.pagerank import pagerank_trace

    e = _sym_edges(spark, [(0, 1), (1, 2), (2, 0)])
    t = pagerank_trace(e, rounds=4).collect()
    assert [(r.round, r.changed, r.max_delta) for r in t] == [
        (1, 0, 0.0), (2, 0, 0.0), (3, 0, 0.0), (4, 0, 0.0),
    ]


def test_pagerank_trace_star_matches_python_mirror(spark):
    from plato_spark.algos.pagerank import pagerank_trace

    edges = [(0, 1), (0, 2), (0, 3)]
    e = _sym_edges(spark, edges)
    # python mirror of the rounded chain
    adj = {0: [1, 2, 3], 1: [0], 2: [0], 3: [0]}
    rank = {v: 1.0 for v in adj}
    expect = []
    for k in range(1, 6):
        new = {
            v: 0.15 + 0.85 * sum(rank[u] / len(adj[u]) for u in adj[v])
            for v in adj
        }
        ro = {v: round(rank[v], 6) for v in adj}
        rn = {v: round(new[v], 6) for v in adj}
        changed = sum(1 for v in adj if ro[v] != rn[v])
        max_delta = round(max(round(abs(rn[v] - ro[v]), 6) for v in adj), 6)
        expect.append((k, changed, max_delta))
        rank = new
    got = [(r.round, r.changed, r.max_delta)
           for r in pagerank_trace(e, rounds=5).collect()]
    # the mirror's RAW chain differs from Spark's by summation-order ULPs,
    # so a 6dp boundary can flip in the mirror (the engine pair is safe:
    # both derive deltas from identical pre-rounded inputs, proven by the
    # gate at two SFs) — integers exact, float within one 6dp step
    assert [(r, c) for r, c, _ in got] == [(r, c) for r, c, _ in expect]
    for (_, _, g), (_, _, x) in zip(got, expect):
        assert abs(g - x) <= 2e-6


def _sym_edges(spark, edges):
    rows = [(int(a), int(b)) for a, b in edges]
    rows += [(b, a) for a, b in rows]
    return spark.createDataFrame(rows, "src long, dst long")


# -------------------------------------------------------- hitting / shipping


def test_hitting_time_path_hand_values(spark):
    # path 0-1-2, seed {0}: h(0)=0; mirror the Jacobi chain by hand
    from plato_spark.algos.hitting import truncated_hitting_time

    e = _sym_edges(spark, [(0, 1), (1, 2)])
    got = {r.id: r.hit for r in
           truncated_hitting_time(e, seeds=[0], rounds=3).collect()}
    # h1: h(1)=1+ (h0(0)+h0(2))/2 = 1, h(2)=1+h0(1)=1
    # h2: h(1)=1+(0+1)/2=1.5, h(2)=1+1=2
    # h3: h(1)=1+(0+2)/2=2.0, h(2)=1+1.5=2.5
    assert got == {0: 0.0, 1: 2.0, 2: 2.5}


def test_hitting_time_unreachable_caps_at_rounds(spark):
    from plato_spark.algos.hitting import truncated_hitting_time

    # two components: seed in one; the other reports exactly T
    e = _sym_edges(spark, [(0, 1), (5, 6)])
    got = {r.id: r.hit for r in
           truncated_hitting_time(e, seeds=[0], rounds=7).collect()}
    assert got[5] == 7.0 and got[6] == 7.0
    assert got[0] == 0.0 and got[1] == 1.0


def test_hitting_time_mirror_on_seeded_graph(spark):
    from plato_spark.algos.hitting import truncated_hitting_time

    n = 15
    edges = sorted({(min((3 * i + 1) % n, (7 * i + 2) % n),
                     max((3 * i + 1) % n, (7 * i + 2) % n))
                    for i in range(25)})
    edges = [(a, b) for a, b in edges if a != b]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    seeds = {0, 1}
    h = {v: 0.0 for v in adj}
    for _ in range(6):
        h = {v: 0.0 if v in seeds
             else 1.0 + sum(h[u] for u in adj[v]) / len(adj[v])
             for v in adj}
    got = {r.id: r.hit for r in truncated_hitting_time(
        _sym_edges(spark, edges), seeds=[0, 1], rounds=6).collect()}
    for v in adj:
        assert abs(got[v] - round(h[v], 6)) <= 2e-6


def test_shipping_priority_hand_fixture(spark):
    from datetime import datetime

    from plato_spark.functions.relational import shipping_priority

    orders = spark.createDataFrame(
        [(1, 10, datetime(1995, 6, 1), "1-URGENT"),
         (2, 20, datetime(1995, 7, 1), "5-LOW"),
         (3, 10, datetime(1996, 2, 1), "2-HIGH")],   # ordered after cutoff
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, 100.0, 0.0, datetime(1996, 3, 1)),
         (1, 50.0, 0.5, datetime(1996, 3, 2)),
         (2, 999.0, 0.0, datetime(1995, 1, 1)),      # shipped before cutoff
         (3, 500.0, 0.0, datetime(1996, 6, 1))],
        "l_orderkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    )
    cust = spark.createDataFrame(
        [(10, "BUILDING"), (20, "BUILDING")],
        "c_custkey long, c_mktsegment string",
    )
    got = shipping_priority(orders, li, cust).collect()
    assert len(got) == 1
    r = got[0]
    assert r.l_orderkey == 1 and r.o_orderdate == "1995-06-01"
    assert r.revenue == 125.0  # 100 + 50*0.5
