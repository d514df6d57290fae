"""Round-4 batch 5: dyad census, local bridges, event transitions,
edit-distance dup verification."""

from datetime import datetime

from conftest import edges_df

from plato_spark.algos.dyads import dyad_census
from plato_spark.algos.triangles import local_bridges
from plato_spark.functions.dedup import edit_distance_pairs
from plato_spark.functions.events import event_transitions


def _verts(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_dyad_census_mixed(spark):
    # mutual {0,1} and {3,4}; asym 1->2; self-loop and duplicate dropped
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (3, 4), (4, 3), (2, 2), (1, 2)],
        "src long, dst long",
    )
    r = dyad_census(e, _verts(spark, range(5))).collect()[0]
    assert (r.mutual, r.asym, r.nulls) == (2, 1, 7)
    assert r.reciprocity == 0.8  # 2M/E = 4/5


def test_dyad_census_empty_edges(spark):
    e = spark.createDataFrame([], "src long, dst long")
    r = dyad_census(e, _verts(spark, range(4))).collect()[0]
    assert (r.mutual, r.asym, r.nulls, r.reciprocity) == (0, 0, 6, 0.0)


def test_dyad_census_isolated_vertices_count_as_null(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    r = dyad_census(e, _verts(spark, range(10))).collect()[0]
    assert (r.mutual, r.asym, r.nulls) == (0, 1, 44)


def test_local_bridges_path(spark):
    # path 0-1-2: neither edge's endpoints share a neighbor
    got = {(r.src, r.dst) for r in local_bridges(
        edges_df(spark, [(0, 1), (1, 2)])).collect()}
    assert got == {(0, 1), (1, 2)}


def test_local_bridges_triangle_plus_pendant(spark):
    # triangle closes every wedge; the pendant 2-9 is the only bridge
    got = {(r.src, r.dst) for r in local_bridges(
        edges_df(spark, [(0, 1), (0, 2), (1, 2), (2, 9)])).collect()}
    assert got == {(2, 9)}


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_event_transitions_counts_and_probs(spark):
    t = datetime(2026, 1, 1)

    def at(s):
        return datetime(2026, 1, 1, 0, 0, s)

    rows = [
        (1, 1, "a", at(0)), (2, 1, "b", at(1)), (3, 1, "a", at(2)),
        (4, 1, "c", at(3)),
        (5, 2, "a", at(0)), (6, 2, "b", at(1)),
    ]
    got = {(r.src_type, r.dst_type): (r.n, r.prob)
           for r in event_transitions(_ev(spark, rows)).collect()}
    # from 'a': a->b twice, a->c once
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 3  # user 2's trailing 'b' emits nothing


def test_event_transitions_tie_broken_by_event_id(spark):
    t = datetime(2026, 1, 1)
    rows = [(2, 1, "y", t), (1, 1, "x", t), (3, 1, "z", t)]
    got = {(r.src_type, r.dst_type) for r in
           event_transitions(_ev(spark, rows)).collect()}
    assert got == {("x", "y"), ("y", "z")}


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_mirror(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fax"),
         (3, "completely different text"), (4, "")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "a long, b long"
    )
    got = {(r.a, r.b): r.edit_sim for r in edit_distance_pairs(
        docs, threshold=0.0, candidates=cand).collect()}
    texts = {1: "the quick brown fox", 2: "the quick brown fax",
             3: "completely different text", 4: ""}
    for (a, b) in [(1, 2), (1, 3), (1, 4)]:
        want = round(1 - _lev(texts[a], texts[b])
                     / max(len(texts[a]), len(texts[b]), 1), 6)
        assert got[(a, b)] == want
    assert got[(1, 2)] > 0.9


def test_edit_distance_pairs_threshold_filters(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaab"), (3, "zzzz")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    got = {(r.a, r.b) for r in edit_distance_pairs(
        docs, threshold=0.5, candidates=cand).collect()}
    assert got == {(1, 2)}
