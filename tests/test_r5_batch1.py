"""Round-5 batch 1: reference-default parity semantics, the exact-cents
common-neighbor average, the strength-core convergence guard, the
vertex-cover divide-by-zero guard, and the stickiness equi-join plan."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df


def _plan(df):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pagerank_eps_runs_one_extra_epoch(spark):
    """plato pagerank.hpp:136-146: when the L1 delta drops below eps the
    loop runs exactly ONE more epoch then stops.  Verify iterations ==
    (first round with delta < eps) + 1, and the result equals a fixed
    eps=0 run of that length."""
    from plato_spark.algos.pagerank import pagerank

    edges = edges_df(
        spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (1, 4)])
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    stats = {}
    r = pagerank(sym, eps=1e-3, max_iters=50, stats=stats)
    got = {row["id"]: round(row["rank"], 6) for row in r.collect()}
    k = stats["iterations"]
    deltas = stats["deltas"]
    first_below = next(i + 1 for i, d in enumerate(deltas) if d < 1e-3)
    assert k == first_below + 1, (k, deltas)
    fixed = pagerank(sym, eps=0.0, max_iters=k)
    want = {row["id"]: round(row["rank"], 6) for row in fixed.collect()}
    assert got == want


def test_lpa_ref_default_iterations_fixpoint(spark):
    """20 rounds (lpa.hpp:40 default) on a small two-community graph must
    agree with the converged labeling (fixpoint well before 20)."""
    from plato_spark.algos.lpa import label_propagation

    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    edges = edges_df(spark, tri1 + tri2)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    r20 = {row["id"]: row["label"]
           for row in label_propagation(sym, iterations=20).collect()}
    # each triangle collapses to its smallest vertex id
    assert len({r20[0], r20[1], r20[2]}) == 1
    assert len({r20[10], r20[11], r20[12]}) == 1
    assert r20[0] != r20[10]


def test_common_neighbor_payload_cents_halfup_tie(spark):
    """64 common neighbors summing to 2 cents -> avg = 0.0003125 exactly:
    a 7th-decimal-digit-5 tie.  cents=True must produce the int64 HALF_UP
    value 0.000313 (raw round(avg(double), 6) is engine-dependent here)."""
    from plato_spark.algos.triangles import common_neighbor_payload

    u, v = 1000, 2000
    nbrs = list(range(64))
    canon = edges_df(
        spark,
        [(u, v)] + [(n, u) for n in nbrs] + [(n, v) for n in nbrs])
    payload = spark.createDataFrame(
        [(n, 0.01 if n < 2 else 0.0) for n in nbrs]
        + [(u, 0.0), (v, 0.0)],
        "id long, v double")
    out = common_neighbor_payload(canon, payload, "v", cents=True)
    row = [r for r in out.collect() if r["src"] == u and r["dst"] == v][0]
    assert row["common_count"] == 64
    assert row["value_avg"] == pytest.approx(0.000313, abs=1e-12)


def test_common_neighbor_payload_cents_null_when_no_common(spark):
    from plato_spark.algos.triangles import common_neighbor_payload

    canon = edges_df(spark, [(1, 2)])
    payload = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id long, v double")
    row = common_neighbor_payload(canon, payload, "v", cents=True).collect()[0]
    assert row["common_count"] == 0 and row["value_avg"] is None


def test_strength_core_raises_on_round_exhaustion(spark):
    """ADVICE r4: a truncated peel must fail loudly, not silently diverge
    from the pinned-round oracle.  Path a-b-c-d at s=2 needs 2 productive
    rounds; max_rounds=1 leaves sub-threshold vertices -> RuntimeError."""
    from plato_spark.algos.percolation import strength_core_sweep

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double")
    with pytest.raises(RuntimeError, match="did not converge"):
        strength_core_sweep(edges, thresholds=(2,), max_rounds=1).collect()
    # ample budget: converges (everything peels away at s=2)
    ok = strength_core_sweep(edges, thresholds=(2,), max_rounds=8).collect()
    assert ok[0]["n_edges"] == 0


def test_vertex_cover_empty_edges_null_ratio(spark):
    from plato_spark.algos.matching import vertex_cover_stats

    empty = spark.createDataFrame([], "src long, dst long")
    row = vertex_cover_stats(empty).collect()[0]
    assert row["n_matched"] == 0 and row["approx_ratio"] is None


def test_stickiness_plan_is_equijoin(spark):
    """VERDICT r4 item 4: the 7-day WAU band must plan as a hash
    equi-join (explode(sequence(d, d+6))), never BroadcastNestedLoopJoin."""
    from plato_spark.entry.events import q_stickiness

    p = _plan(q_stickiness(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_linkpred_all_exports():
    import plato_spark.functions.linkpred as lp

    assert "link_prediction_first_rank" in lp.__all__
    assert "link_prediction_eval" in lp.__all__
