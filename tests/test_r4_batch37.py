"""Round-4 batch 37: co-activity churn, KS distance, charclass."""

from datetime import datetime

import __spark_entry__ as entry


def test_coactivity_churn_split_and_jaccard(spark, tmp_path):
    # first half (Jan 1): users 1,2 co-view; second half (Jan 20):
    # users 1,2,3 all co-view -> early {1-2}, late all 3 pairs,
    # common 1, jaccard 1/3
    t_a = datetime(2024, 1, 1, 9, 10)
    t_b = datetime(2024, 1, 20, 9, 10)
    rows = [(1, t_a, 1, "view"), (2, t_a, 2, "view"),
            (3, t_b, 1, "view"), (4, t_b, 2, "view"),
            (5, t_b, 3, "view")]
    spark.createDataFrame(
        [(i, ts, u, et, 0.0, "") for i, ts, u, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    r = entry.q_coactivity_churn(spark, str(tmp_path)).collect()[0]
    assert (r.edges_early, r.edges_late, r.common_edges, r.jaccard) == (
        1, 3, 1, round(1 / 3, 6))


def test_length_ks_distance_disjoint_is_one(spark, tmp_path):
    # src0 lengths all 10, src1 all 20: D = 1.0 at v = 10
    docs = [(i, "x", "en", "src0", 10) for i in range(4)]
    docs += [(10 + i, "x", "en", "src1", 20) for i in range(6)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    r = entry.q_length_ks_distance(spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2, r.ks_at_length, r.ks_distance) == (4, 6, 10, 1.0)


def test_length_ks_distance_identical_is_zero(spark, tmp_path):
    docs = [(i, "x", "en", "src0", 10 + i % 3) for i in range(6)]
    docs += [(10 + i, "x", "en", "src1", 10 + i % 3) for i in range(6)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    r = entry.q_length_ks_distance(spark, str(tmp_path)).collect()[0]
    assert r.ks_distance == 0.0


def test_charclass_profile_exact_counts(spark, tmp_path):
    spark.createDataFrame(
        [(1, "Ab1 c!", "en", "s0", 6)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    r = entry.q_charclass_profile(spark, str(tmp_path)).collect()[0]
    # "Ab1 c!": lower b,c; upper A; digit 1; white 1; other !
    assert (r.n_chars, r.n_lower, r.n_upper, r.n_digit, r.n_white,
            r.n_other) == (6, 2, 1, 1, 1, 1)
