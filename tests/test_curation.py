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


def test_containment_pairs(spark):
    from plato_spark.functions.dedup import containment_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, base),                                   # short doc
            (2, base + " iota kappa " + "x y z " * 20),  # contains doc 1
            (3, "totally different words entirely here"),
        ],
        "doc_id long, text string",
    )
    rows = {(r["contained"], r["container"]): r["containment"]
            for r in containment_pairs(docs, threshold=0.8, n=3).collect()}
    # 1 is fully inside 2 -> containment 1.0; the reverse is far below
    assert rows[(1, 2)] == 1.0
    assert (2, 1) not in rows and (3, 1) not in rows and (1, 3) not in rows


def test_containment_candidate_feeding(spark):
    from plato_spark.functions.dedup import containment_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " iota kappa"), (4, base + " mu nu")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame([(1, 2)], "a long, b long")
    rows = {(r["contained"], r["container"])
            for r in containment_pairs(docs, threshold=0.5, n=3,
                                       candidates=cand).collect()}
    # only the candidate pair (both directions) is scored; 4 never appears
    assert rows and all(4 not in p for p in rows)


def test_containment_candidates_both_orientations_no_dups(spark):
    # candidates already carrying both orientations must not double rows
    from plato_spark.functions.dedup import containment_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " iota kappa")], "doc_id long, text string"
    )
    cand = spark.createDataFrame([(1, 2), (2, 1)], "a long, b long")
    rows = [(r["contained"], r["container"])
            for r in containment_pairs(docs, threshold=0.5, n=3,
                                       candidates=cand).collect()]
    assert len(rows) == len(set(rows))
    assert (1, 2) in rows
