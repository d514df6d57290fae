"""Round-4 batch 50: TWAP step integral, chi-square statistic, Rand
agreement."""

import datetime


def test_user_twap_step_integral(spark, tmp_path):
    # user 7: value 10 for 3s, then 40 for 1s -> TWAP = (30+40)/4 = 17.5
    # (the plain mean of [10, 40, 99] would be 49.67 — the trailing
    # value 99 holds no interval and must not contribute)
    def ts(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    ev = spark.createDataFrame(
        [(1, ts(0), 7, "v", 10.0, ""),
         (2, ts(3), 7, "v", 40.0, ""),
         (3, ts(4), 7, "v", 99.0, ""),
         (9, ts(0), 8, "v", 5.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as entrymod

    out = {r.user_id: r
           for r in entrymod.q_user_twap(spark, str(tmp_path)).collect()}
    assert out[7].n_events == 3
    assert out[7].span_us == 4_000_000
    assert out[7].twap == 17.5
    assert out[8].twap is None  # single event: no interval


def test_chisq_independent_table_is_zero(spark, tmp_path):
    # perfectly independent 2x2 with equal margins: chi2 = 0
    rows = []
    i = 0
    for lang in ("en", "fr"):
        for src in ("a", "b"):
            for _ in range(5):
                rows.append((i, "x", lang, src, 1))
                i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_lang_source_chisq(spark, str(tmp_path)).collect()[0]
    assert (r.n, r.n_langs, r.n_sources, r.dof) == (20, 2, 2, 1)
    assert r.chi2 == 0.0


def test_chisq_perfect_association(spark, tmp_path):
    # en only in a, fr only in b (5 each): chi2 = n = 10 for a 2x2
    rows = [(i, "x", "en", "a", 1) for i in range(5)]
    rows += [(i + 5, "x", "fr", "b", 1) for i in range(5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_lang_source_chisq(spark, str(tmp_path)).collect()[0]
    assert r.chi2 == 10.0


def test_rand_index_pair_counting():
    # pure-python pin of the pair-counting identity used by the query:
    # clusterings A = {1,2}{3,4}, B = {1,2,3,4} over n=4:
    # pairs_a = 2, pairs_b = 6, both = 2, total = 6
    # rand = (6 + 2*2 - 2 - 6)/6 = 2/6 = 0.333...
    n, pa, pb, both = 4, 2, 6, 2
    total = n * (n - 1) // 2
    rand = (total + 2 * both - pa - pb) / total
    # agreements: the 2 within-both pairs + 0 separated-in-both pairs
    # counted directly: pairs together in both = 2; apart in both = 0;
    # (6 - 2 - (6-2) - (2-2)) ... direct check:
    import itertools
    a = {1: 0, 2: 0, 3: 1, 4: 1}
    b = {1: 0, 2: 0, 3: 0, 4: 0}
    agree = sum(
        1 for x, y in itertools.combinations([1, 2, 3, 4], 2)
        if (a[x] == a[y]) == (b[x] == b[y]))
    assert rand == agree / total
