"""Round-4 batch 38: PPJoin prefix filtering + Simpson diversity."""

from datetime import datetime

import __spark_entry__ as entry
from plato_spark.functions.dedup import ppjoin_pairs


def test_ppjoin_finds_all_qualifying_pairs(spark):
    # doc0/doc1: 10 shared tokens of 10 -> J = 1.0
    # doc0/doc2: 8 shared of union 12 -> J = 0.666.. < 0.7 (dropped)
    # doc3/doc4: 9 shared of union 11 -> J = 0.8181 (kept)
    base = [f"w{i}" for i in range(10)]
    d2 = base[:8] + ["x1", "x2"]
    d3 = [f"v{i}" for i in range(10)]
    d4 = d3[:9] + ["y1", "y2"]      # sizes 10 and 11, inter 9, union 12
    # J(3,4) = 9/12 = 0.75 >= 0.7 (kept)
    docs = spark.createDataFrame(
        [(0, " ".join(base)), (1, " ".join(base)), (2, " ".join(d2)),
         (3, " ".join(d3)), (4, " ".join(d4))],
        "doc_id long, text string")
    got = {(r.a, r.b): (r.inter, r.size_a, r.size_b, r.jaccard)
           for r in ppjoin_pairs(docs, threshold_pct=70).collect()}
    assert got[(0, 1)] == (10, 10, 10, 1.0)
    assert got[(3, 4)] == (9, 10, 11, 0.75)
    assert (0, 2) not in got and (1, 2) not in got
    assert set(got) == {(0, 1), (3, 4)}


def test_ppjoin_exact_boundary_kept(spark):
    # J exactly 0.70: inter 7, sizes 7 and 10 -> union 10, 7/10 = 0.7
    a = [f"t{i}" for i in range(7)]
    b = a + ["u1", "u2", "u3"]
    docs = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b))], "doc_id long, text string")
    got = {(r.a, r.b): r.jaccard
           for r in ppjoin_pairs(docs, threshold_pct=70).collect()}
    assert got == {(0, 1): 0.7}


def test_simpson_diversity_exact(spark, tmp_path):
    t = datetime(2024, 1, 1)
    rows = [(1, t, 1, "view"), (2, t, 1, "view"),     # user 1: 2 view,
            (3, t, 1, "click"), (4, t, 1, "click"),   # 2 click
            (5, t, 2, "view")]                        # user 2: single
    spark.createDataFrame(
        [(i, ts, u, et, 0.0, "") for i, ts, u, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    got = {r.user_id: (r.n_events, r.n_types, r.simpson) for r in
           entry.q_user_simpson_diversity(spark, str(tmp_path)).collect()}
    # user 1: 1 - (2*1 + 2*1) / (4*3) = 1 - 4/12 = 0.666667
    assert got[1] == (4, 2, round(1 - 4 / 12, 6))
    assert got[2] == (1, 1, None)
