"""Product quantization — structure, determinism, and recall sanity."""

import math

from pyspark.sql import functions as F

from plato_spark.functions.pq import pq_ann, pq_encode, pq_fit


def _emb(spark, n=24, dim=8, seed=3):
    # deterministic pseudo-embeddings: two planted clusters + noise
    import hashlib

    def unit(i):
        h = hashlib.md5(f"v{i}".encode()).digest()
        base = [1.0 if i % 2 == 0 else -1.0] * dim
        return [round(base[j] + (h[j] / 255.0 - 0.5), 6)
                for j in range(dim)]

    return spark.createDataFrame(
        [(i, unit(i)) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def test_pq_fit_shape(spark):
    books = pq_fit(_emb(spark), m=2, k_c=4, lloyd_iters=1)
    rows = books.collect()
    assert {(r["sub"], r["cluster"]) for r in rows} == {
        (s, c) for s in range(2) for c in range(4)
    }
    assert all(len(r["cvec"]) == 4 for r in rows)


def test_pq_encode_complete(spark):
    emb = _emb(spark)
    books = pq_fit(emb, m=2, k_c=4, lloyd_iters=1)
    codes = pq_encode(emb, books, m=2)
    rows = codes.collect()
    assert len(rows) == 24 * 2
    assert all(0 <= r["code"] < 4 for r in rows)


def test_pq_ann_planted_clusters(spark):
    # with two well-separated planted clusters, top neighbors must come
    # from the query's own cluster (parity of the id)
    out = pq_ann(_emb(spark), m=2, k_c=4, lloyd_iters=2, k=3).collect()
    assert len(out) == 24 * 3
    for r in out:
        assert r["query_id"] != r["nbr_id"]
        assert r["query_id"] % 2 == r["nbr_id"] % 2, r
        assert r["adc"] >= 0.0


def test_pq_ann_deterministic(spark):
    a = sorted(map(tuple, pq_ann(_emb(spark), m=2, k_c=4, k=2).collect()))
    b = sorted(map(tuple, pq_ann(_emb(spark), m=2, k_c=4, k=2).collect()))
    assert a == b
