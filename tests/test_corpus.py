import hashlib

from pyspark.sql import functions as F

from plato_spark.corpus.extract import (
    co_commit_edges,
    extract_graph,
    path_link_edges,
    with_content_sha,
)
from plato_spark.corpus.generator import synth_corpus
from plato_spark.graph.edges import encode_vertices


def test_corpus_shape_and_determinism(spark):
    c1 = synth_corpus(spark, 0.001, num_partitions=4)
    c2 = synth_corpus(spark, 0.001, num_partitions=7)  # different parallelism
    assert c1.columns == ["repo", "path", "commit", "lang", "content"]
    r1 = sorted(map(tuple, c1.collect()))
    r2 = sorted(map(tuple, c2.collect()))
    assert r1 == r2  # bit-identical regardless of partitioning
    assert len(r1) > 200
    # every commit belongs to exactly one repo
    assert (
        c1.groupBy("commit").agg(F.countDistinct("repo").alias("n"))
        .where("n > 1").count() == 0
    )


def test_sha256_invariant_through_extraction(spark):
    corpus = synth_corpus(spark, 0.001).persist()
    pre = with_content_sha(corpus)
    edges, stamped = extract_graph(corpus)
    # per-row sha equality pre/post extraction (input_hint invariant)
    pre_rows = sorted(
        (r["repo"], r["path"], r["commit"], r["content_sha"])
        for r in pre.select("repo", "path", "commit", "content_sha").collect()
    )
    post_rows = sorted(
        (r["repo"], r["path"], r["commit"], r["content_sha"])
        for r in stamped.select("repo", "path", "commit", "content_sha").collect()
    )
    assert pre_rows == post_rows
    # F.sha2 agrees with hashlib on a sample
    sample = corpus.limit(20).collect()
    for r in sample:
        want = hashlib.sha256(r["content"].encode()).hexdigest()
        got = pre.where(
            (F.col("repo") == r["repo"]) & (F.col("path") == r["path"])
            & (F.col("commit") == r["commit"])
        ).collect()[0]["content_sha"]
        assert got == want


def test_co_commit_arrow_matches_join(spark):
    corpus = synth_corpus(spark, 0.001).persist()
    a = {(r["src"], r["dst"], r["weight"]) for r in co_commit_edges(corpus, "arrow").collect()}
    j = {(r["src"], r["dst"], r["weight"]) for r in co_commit_edges(corpus, "join").collect()}
    assert a == j
    assert len(a) > 50
    # canonical: src < dst everywhere
    assert all(s < d for s, d, _ in a)


def test_path_link_edges_linear(spark):
    corpus = synth_corpus(spark, 0.001).persist()
    pl = path_link_edges(corpus)
    n_files = corpus.select("repo", "path").distinct().count()
    n_edges = pl.count()
    # chain + per-dir head link: strictly fewer than 2 edges per file
    assert 0 < n_edges < 2 * n_files
    assert all(r["src"] < r["dst"] for r in pl.collect())


def test_end_to_end_extraction_encodes_dense(spark):
    corpus = synth_corpus(spark, 0.001).persist()
    edges, _ = extract_graph(corpus)
    enc, dic = encode_vertices(edges)
    n = dic.count()
    assert sorted(r["id"] for r in dic.collect()) == list(range(n))
    assert enc.where("src = dst").count() == 0


def test_extract_graph_encoded_equals_string_path(spark):
    from plato_spark.corpus.extract import extract_graph_encoded

    corpus = synth_corpus(spark, 0.001).persist()
    edges, _ = extract_graph(corpus)
    enc_ref, dic_ref = encode_vertices(edges)
    enc_fast, dic_fast, _ = extract_graph_encoded(corpus)
    ref = {
        (r["src"], r["dst"], r["etype"]): r["weight"]
        for r in enc_ref.collect()
    }
    fast = {
        (r["src"], r["dst"], r["etype"]): r["weight"]
        for r in enc_fast.collect()
    }
    assert ref == fast and len(ref) > 100
    assert (
        sorted(tuple(r) for r in dic_ref.collect())
        == sorted(tuple(r) for r in dic_fast.collect())
    )


def test_near_dup_clusters_lsh_matches_exact(spark):
    # documents with planted near-dups: LSH-candidate path must find the
    # same clusters as all-pairs verification
    from plato_spark.functions.dedup import near_dup_clusters

    base = [
        "the quick brown fox jumps over the lazy dog again and again " * 3,
        "completely different content about spark graph engines " * 3,
        "unrelated third document text with many unique words " * 3,
    ]
    rows = []
    did = 0
    for b in base:
        for variant in (b, b + " tail", b.replace("the", "a", 1)):
            rows.append((did, variant))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {(r["doc_id"], r["keeper_id"])
             for r in near_dup_clusters(docs, use_lsh=False).collect()}
    lsh = {(r["doc_id"], r["keeper_id"])
           for r in near_dup_clusters(docs, use_lsh=True).collect()}
    assert exact == lsh
    keepers = {k for _, k in exact}
    assert len(keepers) == 3  # one cluster per base document
