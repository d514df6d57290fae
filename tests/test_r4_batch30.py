"""Round-4 batch 30: 2-D skyline + sparse token-cosine retrieval."""

import __spark_entry__ as entry


def test_skyline_parts_domination(spark, tmp_path):
    part = spark.createDataFrame(
        [(1, "B1", 10, 5.0),   # skyline
         (2, "B1", 10, 6.0),   # dominated by 1 (same size, pricier)
         (3, "B2", 20, 7.0),   # skyline (largest size tier)
         (4, "B2", 5, 5.0),    # dominated by 1 (same price, smaller)
         (5, "B3", 20, 7.0)],  # tie with 3 on both dims -> kept
        "p_partkey long, p_brand string, p_size int, "
        "p_retailprice double",
    )
    part.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet"))
    got = {r.p_partkey for r in
           entry.q_skyline_parts(spark, str(tmp_path)).collect()}
    assert got == {1, 3, 5}


def test_token_cosine_topk_exact_pairs(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "alpha beta", "en", "s", 10),
         (1, "alpha beta", "en", "s", 10),
         (2, "gamma gamma gamma", "en", "s", 17),
         (3, "alpha gamma", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    got = {(r.a, r.b): (r.cos, r.rank) for r in
           entry.q_token_cosine_topk(spark, str(tmp_path)).collect()}
    # d0~d1 identical vectors -> cos 1.0 rank 1; d0~d3 share alpha:
    # dot 1, norms 2 and 2 -> 0.5
    assert got[(0, 1)] == (1.0, 1)
    assert got[(0, 3)] == (0.5, 2)
    # d2~d3 share gamma: dot 3*1=3, norms 9 and 2 -> 3/sqrt(18)
    assert got[(2, 3)] == (round(3 / 18 ** 0.5, 6), 1)
    # no pair between the disjoint d1/d2
    assert (1, 2) not in got and (2, 1) not in got
