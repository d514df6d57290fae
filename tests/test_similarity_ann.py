"""Tests for ANN search (brute-force / IVF), embedding-cosine near-dup
clustering, and the portable (oracle-checkable) sketch variants.

Oracle strategy mirrors SURVEY §5: deterministic synthetic fixtures with
numpy/pure-python reference implementations; cross-impl equivalence for the
portable vs fast hash paths.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from plato_spark.functions.dedup import (
    minhash_lsh_candidates,
    simhash_signatures_portable,
)
from plato_spark.functions.similarity import (
    brute_force_topk,
    embedding_near_dup_clusters,
    ivf_ann,
)
from plato_spark.functions.text import doc_fingerprint, lang_id_ngram


def _clustered_vectors(n_clusters=3, per_cluster=10, dim=8):
    """Deterministic clustered unit-ish vectors (seeded numpy)."""
    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = np.zeros(dim)
        center[c] = 1.0
        for _ in range(per_cluster):
            v = center + 0.15 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    rows = _clustered_vectors()
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).persist()


def test_brute_force_topk_matches_numpy(emb):
    got = brute_force_topk(emb, k=3).collect()
    rows = {r["vec_id"]: np.asarray(r["embedding"]) for r in emb.collect()}
    for qid in rows:
        mine = sorted(
            [r for r in got if r["query_id"] == qid], key=lambda r: r["rank"]
        )
        sims = []
        for nid, v in rows.items():
            if nid == qid:
                continue
            q = rows[qid]
            c = float(q @ v / max(np.linalg.norm(q) * np.linalg.norm(v), 1e-300))
            sims.append((round(c, 6), nid))
        sims.sort(key=lambda t: (-t[0], t[1]))
        assert [r["nbr_id"] for r in mine] == [nid for _, nid in sims[:3]]
        assert [r["cosine"] for r in mine] == [c for c, _ in sims[:3]]


def test_ivf_ann_recall_and_exact_cosines(emb):
    """IVF with enough probes on cleanly-clustered data: high recall@3, and
    every returned cosine equals the brute-force cosine for that pair."""
    brute = {
        (r["query_id"], r["nbr_id"]): r["cosine"]
        for r in brute_force_topk(emb, k=3).collect()
    }
    got = ivf_ann(emb, k=3, n_clusters=3, n_probe=2, lloyd_iters=2).collect()
    all_pairs = {
        (r["query_id"], r["nbr_id"]): r["cosine"]
        for r in brute_force_topk(emb, k=100).collect()
    }
    for r in got:
        assert all_pairs[(r["query_id"], r["nbr_id"])] == r["cosine"]
    hits = sum(1 for p in brute if p in {(r["query_id"], r["nbr_id"]) for r in got})
    assert hits / len(brute) >= 0.9  # clean clusters: near-perfect recall


def test_ivf_ann_deterministic(emb):
    a = sorted(map(tuple, ivf_ann(emb, k=3, n_clusters=3).collect()))
    b = sorted(map(tuple, ivf_ann(emb, k=3, n_clusters=3).collect()))
    assert a == b


def test_embedding_near_dup_transitive_closure(spark):
    """A~B and B~C above threshold, A~C below: one cluster, keeper=min id.
    D orthogonal: singleton, omitted."""
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.9, 0.4359, 0.0, 0.0]   # cos(a,b) ~ 0.9
    c = [0.62, 0.7846, 0.0, 0.0]  # cos(b,c) ~ 0.9, cos(a,c) ~ 0.62
    d = [0.0, 0.0, 1.0, 0.0]
    emb = spark.createDataFrame(
        [(0, a), (1, b), (2, c), (3, d)], "vec_id long, embedding array<double>"
    )
    got = {r["vec_id"]: r["keeper_id"]
           for r in embedding_near_dup_clusters(emb, threshold=0.85).collect()}
    assert got == {0: 0, 1: 0, 2: 0}


def test_embedding_dedup_candidates_path_matches_exact(emb):
    exact = {tuple(r) for r in embedding_near_dup_clusters(emb, 0.8).collect()}
    cands = brute_force_topk(emb, k=5).select("query_id", "nbr_id")
    via = {tuple(r) for r in
           embedding_near_dup_clusters(emb, 0.8, candidates=cands).collect()}
    assert exact == via  # k=5 >= cluster fan-in on this fixture


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("quick", "speedy")),  # near dup
        (3, "def main(): return 42  # int x = 0; for (;;) {};"),
        (4, "völlig anderer text ohne gemeinsame wörter überhaupt xyz"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_portable_minhash_exact_dups_collide(docs):
    pairs = {tuple(r) for r in
             minhash_lsh_candidates(docs, hash_impl="portable").collect()}
    assert (0, 1) in pairs  # identical docs always share every band
    fast = {tuple(r) for r in
            minhash_lsh_candidates(docs, hash_impl="xxhash64").collect()}
    assert (0, 1) in fast


def test_portable_simhash_properties(docs):
    sig = {r["id"]: r["simhash"]
           for r in simhash_signatures_portable(docs).collect()}
    assert sig[0] == sig[1]          # identical text
    assert sig[5] == 0               # no tokens
    ham_near = bin(sig[0] ^ sig[2]).count("1")
    ham_far = bin(sig[0] ^ sig[4]).count("1")
    assert ham_near < ham_far        # near-dup closer than unrelated


def test_simhash_numpy_long_token_chunked_identical(spark):
    """Regression: the vectorized simhash pads tokens into a (n_tok x
    max_len) matrix; a single megabyte-long token used to inflate it to
    ~8*n*max_len bytes. The chunked pass must stay bit-identical to a
    scalar FNV-1a reference even for pathological token lengths."""
    from plato_spark.functions.dedup import simhash_signatures

    long_tok = "a" * 300_000  # forces many 64-byte chunks
    df = spark.createDataFrame(
        [(0, f"hello {long_tok} world"), (1, "hello world"), (2, long_tok)],
        "doc_id long, text string",
    )
    sig = {r["id"]: r["simhash"] for r in simhash_signatures(df).collect()}

    def fnv(tok: str) -> int:
        h = 0xCBF29CE484222325
        for b in tok.encode():
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    import re

    from plato_spark.functions.text import TOKEN_RE

    def ref_sig(text: str) -> int:
        toks = re.compile(TOKEN_RE).findall(text)
        votes = [0] * 64
        for t in toks:
            h = fnv(t)
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        out = 0
        for i in range(64):
            if votes[i] > 0:
                out |= 1 << i
        return out - (1 << 64) if out >= (1 << 63) else out

    for i, text in [(0, f"hello {long_tok} world"), (1, "hello world"), (2, long_tok)]:
        assert sig[i] == ref_sig(text), f"doc {i} mismatch"


def test_doc_fingerprint_portable_deterministic(docs):
    fp1 = {r["doc_id"]: r["fingerprint"]
           for r in doc_fingerprint(docs, hash_impl="portable").collect()}
    fp2 = {r["doc_id"]: r["fingerprint"]
           for r in doc_fingerprint(docs, hash_impl="portable").collect()}
    assert fp1 == fp2
    assert fp1[0] == fp1[1]
    assert fp1[0] != fp1[3]


def test_lang_id_unknown_not_truncated(spark):
    """Regression: '<U4' numpy array truncated 'unknown' to 'unkn'."""
    df = spark.createDataFrame(
        [(0, "zzz qqq xxx"), (1, "the thing of and to in the end"),
         (2, "int main(); for (;;) { x = 0; }")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id_ngram(df).collect()}
    assert got[0] == "unknown"
    assert got[1] == "en"
    assert got[2] == "code"


def test_lsh_portable_exact_within_buckets(emb):
    from plato_spark.functions.similarity import lsh_bucketed_neighbors_portable

    got = lsh_bucketed_neighbors_portable(emb, k=3, num_planes=6, num_tables=2).collect()
    assert got  # buckets non-degenerate on clustered data
    all_pairs = {
        (r["query_id"], r["nbr_id"]): r["cosine"]
        for r in brute_force_topk(emb, k=100).collect()
    }
    for r in got:
        assert all_pairs[(r["query_id"], r["nbr_id"])] == r["cosine"]
    again = lsh_bucketed_neighbors_portable(emb, k=3, num_planes=6, num_tables=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_simhash_banded_pairs_exact_recall(docs, spark):
    """Banded join (pigeonhole blocks) must return EXACTLY the all-pairs
    hamming<=k ground truth computed from the same signatures."""
    from itertools import combinations

    from plato_spark.functions.dedup import simhash_near_dup_pairs

    sig = {r["id"]: r["simhash"]
           for r in simhash_signatures_portable(docs).collect()}
    for k in (0, 3, 8):
        want = {
            (a, b, bin(sig[a] ^ sig[b]).count("1"))
            for a, b in combinations(sorted(sig), 2)
            if bin(sig[a] ^ sig[b]).count("1") <= k
        }
        got = {tuple(r) for r in
               simhash_near_dup_pairs(docs, max_hamming=k).collect()}
        assert got == want, f"k={k}"
