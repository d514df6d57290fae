"""Round-4 batch 47: rank-resolved link prediction, reciprocal best
match, feature-hashing audit."""

from pyspark.sql import functions as F

from plato_spark.functions.linkpred import link_prediction_first_rank
from plato_spark.functions.text import portable_h1


def test_first_rank_on_controlled_split(spark):
    # build a graph, find which canonical edges the lp-hash holds out,
    # then verify each held edge's reported rank against a python mirror
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
             (3, 5), (1, 6), (2, 6)]
    canon = spark.createDataFrame(edges, "src long, dst long")
    out = link_prediction_first_rank(canon, holdout_mod=2).collect()
    held = {(r.src, r.dst) for r in out}
    assert held  # the md5 split holds out ~half of 10 edges

    # python mirror: train = edges - held; CN ranks per vertex
    train = [e for e in edges if e not in held]
    from collections import defaultdict
    adj = defaultdict(set)
    for s, d in train:
        adj[s].add(d)
        adj[d].add(s)

    def rank_of(u, v):
        cands = [(len(adj[u] & adj[x]), x)
                 for x in adj if x != u and x not in adj[u]
                 and len(adj[u] & adj[x]) > 0]
        cands.sort(key=lambda t: (-t[0], t[1]))
        for i, (_, x) in enumerate(cands, 1):
            if x == v:
                return i
        return None

    for r in out:
        assert r.rank_from_src == rank_of(r.src, r.dst)
        assert r.rank_from_dst == rank_of(r.dst, r.src)
        ranks = [x for x in (r.rank_from_src, r.rank_from_dst)
                 if x is not None]
        assert r.best_rank == (min(ranks) if ranks else None)


def test_rbm_pairs_mutuality(spark, tmp_path):
    # a<->b mutual top-1; c's top-1 is b but b's is a -> c unmatched
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.8, 0.2])],
        "vec_id long, embedding array<float>")
    emb.write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet"))
    import __spark_entry__ as entrymod

    out = [(r.a, r.b) for r in
           entrymod.q_rbm_pairs(spark, str(tmp_path)).collect()]
    assert out == [(1, 2)]


def test_hashing_trick_audit_exact_buckets(spark, tmp_path):
    # 3 tokens, 2 buckets: compute the expected collision stats from
    # the same portable hash the query uses
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "s", 16)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    import __spark_entry__ as entrymod
    import hashlib

    def h1(s):
        return int(hashlib.md5(s.encode()).hexdigest()[0:14], 16)

    buckets = {}
    for t in ["alpha", "beta", "gamma"]:
        buckets.setdefault(h1(t) % entrymod.HASH_TRICK_BUCKETS,
                           []).append(t)
    colliding = sum(len(v) for v in buckets.values() if len(v) >= 2)
    r = entrymod.q_hashing_trick_audit(spark, str(tmp_path)).collect()[0]
    assert r.n_tokens == 3
    assert r.n_buckets_used == len(buckets)
    assert r.max_bucket_load == max(len(v) for v in buckets.values())
    assert r.n_tokens_colliding == colliding


def test_portable_h1_python_mirror(spark):
    # the audit test above leans on the hashlib mirror — pin it
    import hashlib
    df = spark.range(1).select(portable_h1(F.lit("alpha")).alias("h"))
    assert df.collect()[0].h == int(
        hashlib.md5(b"alpha").hexdigest()[0:14], 16)
