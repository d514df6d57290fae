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
