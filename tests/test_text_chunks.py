"""ngram_vocabulary + chunk_documents unit tests."""

import pyspark.sql.functions as F

from plato_spark.functions.text import chunk_documents, ngram_vocabulary


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigrams_overlapping(spark):
    d = _docs(spark, [(1, "a b a b"), (2, "a b c")])
    got = {(r.gram): (r.tf, r.df) for r in ngram_vocabulary(d, n=2).collect()}
    # doc1: "a b","b a","a b"; doc2: "a b","b c"
    assert got == {"a b": (3, 2), "b a": (1, 1), "b c": (1, 1)}


def test_trigrams_and_short_docs(spark):
    d = _docs(spark, [(1, "x y z w"), (2, "x y"), (3, "")])
    got = {r.gram: r.tf for r in ngram_vocabulary(d, n=3).collect()}
    assert got == {"x y z": 1, "y z w": 1}  # short/empty docs contribute none


def test_chunking_exact_windows(spark):
    # 10 tokens, chunk=4, stride=3 -> starts 1,4,7,10 => j_max = ceil(6/3)=2?
    # j ranges 0..(10-4+2)//3 = 0..2 -> starts 1,4,7; tokens 8-10 covered by
    # start 7 (7,8,9,10) -> full coverage with overlap 1
    text = " ".join(f"t{i}" for i in range(10))
    d = _docs(spark, [(1, text)])
    rows = sorted(
        chunk_documents(d, chunk=4, stride=3).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    assert rows[0].chunk == "t0 t1 t2 t3"
    assert rows[1].chunk == "t3 t4 t5 t6"
    assert rows[2].chunk == "t6 t7 t8 t9"
    assert all(r.n_tokens == 4 for r in rows)


def test_chunking_tail_partial_and_coverage(spark):
    text = " ".join(f"t{i}" for i in range(11))  # 11 tokens, chunk 4 stride 4
    d = _docs(spark, [(1, text)])
    rows = sorted(
        chunk_documents(d, chunk=4, stride=4).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.n_tokens for r in rows] == [4, 4, 3]
    covered = " ".join(r.chunk for r in rows)
    assert covered.split() == text.split()  # stride==chunk: exact partition


def test_chunking_empty_and_small_docs(spark):
    d = _docs(spark, [(1, ""), (2, "only two")])
    rows = chunk_documents(d, chunk=64, stride=48).collect()
    assert len(rows) == 1
    assert rows[0].doc_id == 2 and rows[0].n_tokens == 2


# ---- r4 additions: unigram_commonness / pmi_collocations / boilerplate ----

def test_unigram_commonness_mirror(spark):
    from plato_spark.functions.text import unigram_commonness

    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "aa cc"), (3, "dd")],
        "doc_id long, text string",
    )
    # corpus counts: aa=3, bb=1, cc=1, dd=1
    got = {r["doc_id"]: (r["n_tokens"], r["mean_tf"], r["rare_ratio"])
           for r in unigram_commonness(docs, rare_threshold=2).collect()}
    assert got[1] == (3, round((3 + 3 + 1) / 3, 6), round(1 / 3, 6))
    assert got[2] == (2, round((3 + 1) / 2, 6), round(1 / 2, 6))
    assert got[3] == (1, 1.0, 1.0)


def test_pmi_collocations_mirror(spark):
    from plato_spark.functions.text import pmi_collocations

    # "x y" always adjacent (lift high); "a b" co-occur but a is common
    docs = spark.createDataFrame(
        [(i, "x y a b a c a d") for i in range(3)],
        "doc_id long, text string",
    )
    rows = pmi_collocations(docs, top_k=10, min_count=3).collect()
    got = {(r["w1"], r["w2"]): (r["pair_n"], r["lift"], r["rank"]) for r in rows}
    # totals: 3 docs x 7 adjacent pairs = 21; counts: x=3,y=3,a=9,b=3,c=3,d=3
    n = 21
    assert got[("x", "y")][0] == 3
    assert got[("x", "y")][1] == round(3 * n / (3 * 3), 6)
    assert got[("a", "b")][1] == round(3 * n / (9 * 3), 6)
    # ranks follow (lift desc, w1, w2) total order, starting at 1
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    assert got[("x", "y")][2] < got[("a", "b")][2]


def test_pmi_min_count_drops_rare_pairs(spark):
    from plato_spark.functions.text import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "p q"), (2, "x y x y x y")], "doc_id long, text string"
    )
    got = {(r["w1"], r["w2"]) for r in
           pmi_collocations(docs, top_k=10, min_count=2).collect()}
    assert ("p", "q") not in got        # pair_n=1 < min_count
    assert ("x", "y") in got


def test_boilerplate_lines_banner_detection(spark):
    from plato_spark.functions.text import boilerplate_lines

    banner = "Copyright (c) 2026 Example Corp. All rights reserved."
    docs = spark.createDataFrame(
        [
            (1, banner + "\nunique body one\nshort\n" + banner),
            (2, banner + "\nunique body two goes here"),
            (3, "unique body three stands alone\n" + banner),
            (4, "nothing shared in doc four at all"),
        ],
        "doc_id long, text string",
    )
    rows = boilerplate_lines(docs, min_docs=3).collect()
    assert len(rows) == 1
    r = rows[0]
    import hashlib
    assert r["line_sha"] == hashlib.sha256(banner.encode()).hexdigest()
    assert r["n_docs"] == 3 and r["n_occurrences"] == 4
    assert r["line_len"] == len(banner)
    # min_docs=4 excludes it; 'short' never passes the length filter
    assert boilerplate_lines(docs, min_docs=4).collect() == []


def test_source_overlap_matrix(spark):
    from plato_spark.functions.dedup import source_shingle_overlap

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-gram
    docs = spark.createDataFrame(
        [
            (1, shared + " unique one two three four five six seven", "a"),
            (2, shared + " other nine ten eleven twelve thir fort fif", "b"),
            (3, "wholly different text with no overlap at all here", "c"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {(r["source_a"], r["source_b"]):
            (r["shared"], r["n_a"], r["n_b"], r["containment"])
            for r in source_shingle_overlap(docs, n=8).collect()}
    # 16 tokens -> 9 shingles per doc; only the one fully inside the
    # shared prefix is common (all later shingles cross into the
    # differing suffixes)
    got = rows[("a", "b")]
    assert got[0] == 1 and got[1] == 9 and got[2] == 9
    assert got[3] == round(1 / 9, 6)
    assert ("a", "c") not in rows and ("b", "c") not in rows


def test_doclen_histogram_buckets(spark):
    from plato_spark.functions.text import doclen_histogram

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "a b"), (4, "a b c"),
         (5, "a b c d e f g h")],
        "doc_id long, text string",
    )
    got = {r["bucket"]: (r["lo_tokens"], r["n_docs"], r["total_tokens"])
           for r in doclen_histogram(docs).collect()}
    assert got[0] == (0, 1, 0)       # empty doc
    assert got[1] == (1, 1, 1)       # 1 token
    assert got[2] == (2, 2, 5)       # 2 and 3 tokens
    assert got[4] == (8, 1, 8)       # 8 tokens -> bucket 4 (bin length)
