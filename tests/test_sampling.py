"""Deterministic sampling/splitting: exact equality against a pure-python
recomputation of the portable md5 gate, plus pipeline-level invariants."""

from __future__ import annotations

import hashlib

from plato_spark.functions.sampling import GATE_MOD, hash_split, stratified_sample
from plato_spark.functions.text import quality_filter


def _h1(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def _docs(spark, n=200):
    langs = ["en", "zh", "es", "de"]
    rows = [(i, f"some text body number {i} with several words here",
             langs[i % 4]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_stratified_sample_matches_python_gate(spark):
    df = _docs(spark)
    fr = {"en": 0.5, "zh": 1.0}
    got = {r["doc_id"] for r in
           stratified_sample(df, fractions=fr, default_fraction=0.25).collect()}
    langs = {i: ["en", "zh", "es", "de"][i % 4] for i in range(200)}
    want = {
        i for i in range(200)
        if _h1(f"strat1{i}") % GATE_MOD
        < int(round(fr.get(langs[i], 0.25) * GATE_MOD))
    }
    assert got == want
    assert 0 < len(got) < 200  # non-trivial split
    # rerun = identical (no RNG state)
    again = {r["doc_id"] for r in
             stratified_sample(df, fractions=fr, default_fraction=0.25).collect()}
    assert got == again


def test_hash_split_disjoint_cover_and_exact(spark):
    df = _docs(spark)
    got = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert len(got) == 200  # every row assigned exactly once
    want = {}
    for i in range(200):
        g = _h1(f"split1{i}") % GATE_MOD
        want[i] = "train" if g < 900000 else ("val" if g < 950000 else "test")
    assert got == want
    assert set(got.values()) == {"train", "val", "test"}


def test_quality_filter_rules(spark):
    rows = [
        (0, "a good long enough document with many plain english words inside"),
        (1, "short"),                                   # too few tokens
        (2, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16"),  # too numeric
        (3, ""),                                        # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["keep"] for r in quality_filter(df).collect()}
    assert got == {0: True, 1: False, 2: False, 3: False}


def test_redact_pii_and_domain_counts(spark):
    from plato_spark.functions.text import domain_counts, redact_pii

    df = spark.createDataFrame(
        [(0, "mail a.b+c@foo.org or visit https://x.io/p?q=1 from 10.1.2.3"),
         (1, "no pii here"),
         (2, "http://x.io/a http://y.net/b and bob@y.net")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (got[0]["n_emails"], got[0]["n_urls"], got[0]["n_ips"]) == (1, 1, 1)
    assert "<EMAIL>" in got[0]["clean"] and "<URL>" in got[0]["clean"]
    assert "<IP>" in got[0]["clean"]
    assert "a.b+c@foo.org" not in got[0]["clean"]
    assert got[1]["clean"] == "no pii here"
    # url redacted BEFORE ip: an address inside a url counts once
    df2 = spark.createDataFrame([(9, "go http://10.0.0.1/path now")],
                                "doc_id long, text string")
    r9 = redact_pii(df2).collect()[0]
    assert (r9["n_urls"], r9["n_ips"]) == (1, 0)

    doms = {r["domain"]: (r["n_docs"], r["n_urls"])
            for r in domain_counts(df).collect()}
    assert doms["x.io"] == (2, 2) and doms["y.net"] == (1, 1)


# ---- negative edge sampling ----

def test_negative_sampling_properties(spark):
    from tests.conftest import edges_df
    from plato_spark.functions.sampling import negative_edge_sampling
    from plato_spark.graph.edges import symmetrize

    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (4, 7)]
    sym = symmetrize(edges_df(spark, edges))
    rows = negative_edge_sampling(sym, k=3, attempts=32).collect()
    adj = {}
    verts = {1, 2, 3, 4, 7}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    per = {}
    for r in rows:
        assert r["neg"] in verts, "sampled a non-vertex"
        assert r["neg"] != r["id"], "self-sample"
        assert r["neg"] not in adj[r["id"]], "sampled a real neighbor"
        per.setdefault(r["id"], []).append(r["attempt"])
    for v, ats in per.items():
        assert len(ats) <= 3
        assert ats == sorted(ats)


def test_negative_sampling_deterministic(spark):
    from tests.conftest import edges_df
    from plato_spark.functions.sampling import negative_edge_sampling
    from plato_spark.graph.edges import symmetrize

    sym = symmetrize(edges_df(spark, [(i, i + 1) for i in range(12)]))
    a = sorted(map(tuple, negative_edge_sampling(sym, k=2).collect()))
    b = sorted(map(tuple, negative_edge_sampling(
        sym.repartition(7), k=2).collect()))
    assert a == b  # partitioning-independent
