"""Round-4 batch 53: s-core cascade, casing profile, KMV Jaccard."""

from plato_spark.algos.percolation import strength_core_sweep


def test_strength_core_cascade(spark):
    # path 1-2-3-4 with weights 1 each: at s=2 the endpoints (strength
    # 1) peel first, THEN 2 and 3 (strength drops to 1) — a 2-round
    # cascade ending empty; at s=1 nothing peels
    canon = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)],
        "src long, dst long, weight double")
    out = {r.s: r for r in
           strength_core_sweep(canon, thresholds=(1, 2)).collect()}
    assert out[1].n_edges == 3 and out[1].peel_rounds == 0
    assert out[2].n_edges == 0 and out[2].n_vertices == 0
    assert out[2].peel_rounds == 2   # endpoints, then the middle pair


def test_strength_core_survivor(spark):
    # triangle with weight-2 edges: strength 4 each -> survives s=4
    canon = spark.createDataFrame(
        [(1, 2, 2.0), (1, 3, 2.0), (2, 3, 2.0)],
        "src long, dst long, weight double")
    out = {r.s: r for r in
           strength_core_sweep(canon, thresholds=(4, 5)).collect()}
    assert out[4].n_edges == 3 and out[4].peel_rounds == 0
    assert out[5].n_edges == 0 and out[5].peel_rounds == 1


def test_casing_profile_hand_counts(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "The QUICK brown Fox and NASA do things", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_casing_profile(spark, str(tmp_path)).collect()[0]
    # words: The QUICK brown Fox and NASA do things = 8
    # lower: brown, and, do, things = 4; Title: The, Fox = 2;
    # ALLCAPS: QUICK, NASA = 2
    assert (r.n_words, r.n_lower, r.n_title, r.n_allcaps) == (8, 4, 2, 2)
    assert r.lower_frac == 0.5


def test_kmv_small_vocab_is_exact(spark, tmp_path):
    # vocab smaller than k: the bottom-k sketch IS the vocabulary, so
    # the estimate must equal the exact Jaccard
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "sA", 1),
         (2, "beta gamma delta epsilon", "en", "sB", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_kmv_jaccard(spark, str(tmp_path)).collect()[0]
    assert (r.sa, r.sb) == ("sA", "sB")
    assert r.exact_jaccard == 0.4   # |{beta,gamma}| / |5 tokens|
    assert r.est_jaccard == r.exact_jaccard
    assert r.abs_err == 0.0
