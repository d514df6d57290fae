"""Round-4 batch 35: filter ablation, packing sweep, dedup curve."""

import __spark_entry__ as entry


def _docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_filter_ablation_only_vs_all(spark, tmp_path):
    good = "the quick brown fox jumps over the lazy dog again"
    short = "tiny doc here"                    # fails ONLY token count
    digits = " ".join(["12345"] * 20)          # fails digit AND alpha
    sf = _docs(spark, tmp_path, [good, short, digits])
    got = {r.filter: (r.n_failing, r.n_failing_only) for r in
           entry.q_filter_ablation(spark, sf).collect()}
    assert got["f_tokens"] == (1, 1)       # the short doc, alone
    assert got["f_alpha"] == (1, 0)        # digits doc, shared blame
    assert got["f_digit"] == (1, 0)
    assert got["f_len"] == (0, 0)          # redundant on this corpus
    assert got["any"] == (2, 2)


def test_packing_sensitivity_exact_tradeoff(spark, tmp_path):
    # three docs of 5 tokens each (15 total):
    # budget 4: chunks ceil -> last token at off 14 -> 4 chunks,
    #   waste 1; every cut splits a doc
    # budget 16: 1 chunk, waste 1, no splits
    texts = ["a b c d e", "f g h i j", "k l m n o"]
    sf = _docs(spark, tmp_path, texts)
    # patch the constant where the callable reads it (its defining
    # module — since the r5 entry split, __spark_entry__ only re-exports)
    import plato_spark.entry.pipeline as pl
    orig = pl.PACKING_SWEEP
    pl.PACKING_SWEEP = (4, 16)
    try:
        got = {r.budget: (r.total_tokens, r.total_chunks, r.split_docs,
                          r.extra_splits, r.tail_waste)
               for r in pl.q_packing_sensitivity(spark, sf).collect()}
    finally:
        pl.PACKING_SWEEP = orig
    assert got[16] == (15, 1, 0, 0, 1)
    tt, chunks, splits, extra, waste = got[4]
    assert tt == 15 and chunks == 4 and waste == 1
    # 5-token docs at budget 4 MUST split: every doc crosses a cut
    assert splits >= 2 and extra == splits


def test_dedup_threshold_curve_monotone(spark, tmp_path):
    toks = [f"w{i}" for i in range(30)]
    texts = [" ".join(toks), " ".join(toks),            # J = 1.0 pair
             " ".join(toks[:-1] + ["zzz"])]             # J = 27/29 pairs
    sf = _docs(spark, tmp_path, texts)
    got = {r.threshold: r.n_pairs for r in
           entry.q_dedup_threshold_curve(spark, sf).collect()}
    # all 3 pairs clear 0.3..0.9; the two near-dup pairs sit at 27/29
    # ~ 0.93 so every swept threshold keeps them
    assert got == {0.3: 3, 0.5: 3, 0.7: 3, 0.9: 3}
