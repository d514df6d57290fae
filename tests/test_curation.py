"""curate_corpus: per-stage disposition correctness on a hand-built corpus."""

from __future__ import annotations

from plato_spark.functions.curation import curate_corpus


def _corpus(spark):
    good = ("this is a perfectly reasonable english document with plenty "
            "of ordinary words and enough tokens to pass the quality gate")
    near = good.replace("perfectly", "entirely")  # high 3-gram jaccard
    rows = [
        (0, good, "en"),
        (1, good, "en"),          # exact dup of 0
        (2, near, "en"),          # near dup of 0 (after 1 is removed)
        (3, "tiny", "en"),        # low quality: too few tokens
        (4, "9 8 7 6 5 4 3 2 1 0 9 8 7 6 5 4 3 2 1 0", "en"),  # too numeric
        (5, "a completely different but equally valid piece of writing "
            "about other topics entirely with many distinct words", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_curation_statuses(spark):
    out = curate_corpus(
        _corpus(spark), fractions={"en": 1.0, "de": 1.0}
    ).collect()
    st = {r["doc_id"]: r["status"] for r in out}
    sp = {r["doc_id"]: r["split"] for r in out}
    assert st[1] == "exact_dup"       # keeper is min id 0
    assert st[2] == "near_dup"
    assert st[3] == "low_quality"
    assert st[4] == "low_quality"
    assert st[0] == "kept" and st[5] == "kept"
    assert sp[0] in {"train", "val", "test"} and sp[5] in {"train", "val", "test"}
    # non-kept rows carry the empty split marker
    assert all(sp[i] == "" for i in (1, 2, 3, 4))


def test_curation_sampled_out_and_deterministic(spark):
    out1 = curate_corpus(
        _corpus(spark), fractions={"en": 0.0, "de": 1.0}
    ).collect()
    st = {r["doc_id"]: r["status"] for r in out1}
    assert st[0] == "sampled_out"     # en quota 0: survivor but not sampled
    assert st[5] == "kept"            # de quota 1.0
    out2 = curate_corpus(
        _corpus(spark), fractions={"en": 0.0, "de": 1.0}
    ).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
