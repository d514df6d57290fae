"""Round-4 batch 40: Forman curvature, vertex-cover certificates,
event-stream disorder audit."""

import datetime

from pyspark.sql import functions as F

from plato_spark.algos.curvature import forman_curvature
from plato_spark.algos.matching import vertex_cover_stats


def test_forman_curvature_triangle_with_pendant(spark):
    # triangle {1,2,3} + pendant edge (3,4): degrees 2,2,3,1
    canon = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long")
    rows = {(r.src, r.dst): (r.support, r.curvature)
            for r in forman_curvature(canon).collect()}
    assert rows == {
        (1, 2): (1, 4 - 2 - 2 + 3),   # support 1, curvature 3
        (1, 3): (1, 4 - 2 - 3 + 3),   # 2
        (2, 3): (1, 4 - 2 - 3 + 3),   # 2
        (3, 4): (0, 4 - 3 - 1 + 0),   # 0 — the bridge scores lowest
    }


def test_vertex_cover_certificates_on_star(spark):
    # K_{1,3}: any maximal matching has exactly 1 edge; its endpoints
    # cover every edge (the hub is always an endpoint)
    canon = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long")
    r = vertex_cover_stats(canon).collect()[0]
    assert (r.n_vertices, r.n_edges, r.n_matched) == (4, 3, 1)
    # matched edges are vertex-disjoint, so the cover is exactly 2|M|
    assert r.cover_size == 2 * r.n_matched
    assert r.n_uncovered == 0
    assert r.approx_ratio == 2.0


def test_vertex_cover_maximality_certificate_on_path(spark):
    # P6: whatever the hash priority picks, maximality forces coverage
    canon = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long")
    r = vertex_cover_stats(canon).collect()[0]
    assert r.n_uncovered == 0
    assert r.cover_size == 2 * r.n_matched
    assert 2 <= r.n_matched <= 2 + 1  # maximal matching on P6 has 2 or 3


def test_out_of_order_stats_hand_fixture(spark, tmp_path, monkeypatch):
    # run the REGISTERED query against a hand-written events parquet:
    # user 7 arrives 40s, 30s (10s late), 50s, 45s (5s late); user 8
    # has a single event and can never be late.
    def ts(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    ev = spark.createDataFrame(
        [(1, ts(40), 7, "view", 0.0, ""),
         (2, ts(30), 7, "view", 0.0, ""),
         (3, ts(50), 7, "view", 0.0, ""),
         (4, ts(45), 7, "view", 0.0, ""),
         (9, ts(10), 8, "view", 0.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as entrymod

    out = {r.user_id: r
           for r in entrymod.q_out_of_order_stats(
               spark, str(tmp_path)).collect()}
    assert out[7].n_events == 4 and out[7].n_late == 2
    assert out[7].max_lateness_us == 10_000_000
    assert out[7].late_frac == 0.5
    assert out[8].n_late == 0 and out[8].max_lateness_us == 0
    assert out[8].late_frac == 0.0
