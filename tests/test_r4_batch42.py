"""Round-4 batch 42: integer-L2 brute force, prefix-dim recall,
temporal wedge closure."""

import datetime

from plato_spark.functions.similarity import (
    brute_force_l2_topk,
    brute_force_topk,
)

from pyspark.sql import functions as F


def test_brute_force_l2_exact_micro_distances(spark):
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 2.0]),
         (4, [-1.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = {(r.query_id, r.rank): (r.nbr_id, r.d2_micro)
           for r in brute_force_l2_topk(emb, k=3).collect()}
    # from 1: d2 to 2 = 1e12, to 4 = 1e12 (tie -> nbr_id 2 first),
    # to 3 = 4e12
    assert out[(1, 1)] == (2, 10**12)
    assert out[(1, 2)] == (4, 10**12)
    assert out[(1, 3)] == (3, 4 * 10**12)
    # from 3: nearest is 1 (d=4e12), then 2 and 4 tie at 5e12
    assert out[(3, 1)] == (1, 4 * 10**12)
    assert out[(3, 2)] == (2, 5 * 10**12)


def test_matryoshka_prefix_ranking_diverges(spark):
    # 4-dim vectors where the 2-dim prefix reverses the ranking:
    # q = (1,0 | 0,0); a = (1,0 | 1,0) full-cos 1/sqrt(2)=.707,
    # prefix-cos 1.0; b = (0.9,0.1 | 0,0) full-cos .9938 (best full),
    # prefix same .9938.  Top-1 full = b, top-1 prefix = a.
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),
         (2, [1.0, 0.0, 1.0, 0.0]),
         (3, [0.9, 0.1, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    qs = emb.where(F.col("vec_id") == 1)
    full = {r.nbr_id for r in brute_force_topk(emb, k=1, queries=qs)
            .collect()}
    pe = emb.select("vec_id", F.slice("embedding", 1, 2)
                    .alias("embedding"))
    pq = qs.select("vec_id", F.slice("embedding", 1, 2)
                   .alias("embedding"))
    pref = {r.nbr_id for r in brute_force_topk(pe, k=1, queries=pq)
            .collect()}
    assert full == {3}
    assert pref == {2}   # prefix recall@1 = 0 here, by construction


def test_wedge_closure_hand_fixture(spark, tmp_path):
    # early co-activity edges (1,2),(2,3),(3,4); open wedges (1,3) and
    # (2,4); late edge (1,3) closes one -> rate 0.5, cand = 6-3 = 3,
    # new = 1, base = 1/3, lift = 1.5
    def ts(h, m):
        return datetime.datetime(2024, 1, 1, h, m)

    rows = [
        (1, ts(0, 10), 1, "view", 0.0, ""),
        (2, ts(0, 20), 2, "view", 0.0, ""),
        (3, ts(1, 10), 2, "view", 0.0, ""),
        (4, ts(1, 20), 3, "view", 0.0, ""),
        (5, ts(2, 10), 3, "view", 0.0, ""),
        (6, ts(2, 20), 4, "view", 0.0, ""),
        (7, ts(9, 10), 1, "view", 0.0, ""),
        (8, ts(9, 15), 3, "view", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_wedge_closure(spark, str(tmp_path)).collect()[0]
    assert r.open_wedge_pairs == 2
    assert r.closed_pairs == 1
    assert r.candidate_pairs == 3
    assert r.new_edges == 1
    assert r.closure_rate == 0.5
    assert r.base_rate == 0.333333
    assert r.closure_lift == 1.5
