"""Round-4 batch 1: winnowing fingerprints, shingle novelty,
SCC condensation, content-reference extraction."""

import hashlib
import re

from conftest import edges_df

from plato_spark.algos.scc import condensation_edges
from plato_spark.corpus.extract import content_reference_edges
from plato_spark.functions.dedup import shingle_novelty
from plato_spark.functions.text import winnow_fingerprints

TOKEN_RE = r"[A-Za-z0-9_]+"


def h1(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


# ---------------------------------------------------------------- winnowing

def mirror_winnow(text, k=5, w=4):
    toks = re.findall(TOKEN_RE, text)
    n_g = max(len(toks) - k + 1, 1)
    grams = [h1("".join(toks[i:i + k])) for i in range(n_g)]
    n_win = max(len(grams) - w + 1, 1)
    out = set()
    for s in range(n_win):
        win = grams[s:s + w]
        mn = min(win)
        pos = max(i for i, v in enumerate(win) if v == mn) + s
        out.add((pos + 1, mn))  # 1-based gram positions
    return out


def test_winnow_matches_python_mirror(spark):
    texts = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "x x x x x x x x x x x x"),          # tie-heavy: identical grams
        (2, "one two three"),                     # < k tokens: whole-doc gram
        (3, "a b c d e f"),                       # 2 grams < w: clamped window
        (4, ""),                                  # empty text
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r.id, r.pos, r.fp)
        for r in winnow_fingerprints(df).collect()
    }
    want = set()
    for i, t in texts:
        for pos, fp in mirror_winnow(t):
            want.add((i, pos, fp))
    assert got == want


def test_winnow_guarantee_shared_run(spark):
    # any shared token run of length >= w + k - 1 = 8 shares a fingerprint
    shared = "q1 q2 q3 q4 q5 q6 q7 q8"
    df = spark.createDataFrame(
        [(0, "aa bb cc " + shared + " dd"),
         (1, shared + " zz yy xx ww")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(df).collect()
    fps0 = {r.fp for r in rows if r.id == 0}
    fps1 = {r.fp for r in rows if r.id == 1}
    assert fps0 & fps1


def test_winnow_density(spark):
    # winnowing keeps far fewer than all grams on a long random-ish doc
    text = " ".join(f"tok{(i * 7919) % 1000}" for i in range(400))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    n_sel = winnow_fingerprints(df).count()
    n_grams = 400 - 4
    assert n_sel < n_grams * 0.7          # far below 1.0
    assert n_sel >= n_grams * 2 / (4 + 1) * 0.5   # not degenerate either


# ---------------------------------------------------------- shingle novelty

def mirror_shingles(text, n=8):
    toks = re.findall(TOKEN_RE, text)
    if len(toks) >= n:
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    return {" ".join(toks)}


def test_shingle_novelty_mirror(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    texts = [
        (0, base),                       # everything novel
        (1, base),                       # exact re-crawl: novelty 0
        (2, base + " w11 w12"),          # partially novel
        (3, "short doc"),                # < 8 tokens: one whole-doc shingle
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.id: (r.n_shingles, r.n_novel, r.novelty)
           for r in shingle_novelty(df).collect()}

    seen: dict[str, int] = {}
    for i, t in texts:
        for s in sorted(mirror_shingles(t)):
            seen.setdefault(s, i)
    for i, t in texts:
        sh = mirror_shingles(t)
        novel = sum(1 for s in sh if seen[s] == i)
        n_sh, n_novel, ratio = got[i]
        assert (n_sh, n_novel) == (len(sh), novel), i
        assert abs(ratio - round(novel / len(sh), 6)) < 1e-9, i


# --------------------------------------------------------- scc condensation

def test_condensation_two_cycles_and_tail(spark):
    # two directed 3-cycles {0,1,2} and {10,11,12}, bridge 2->10,
    # plus an acyclic tail 12->20->21
    e = edges_df(spark, [
        (0, 1), (1, 2), (2, 0),
        (10, 11), (11, 12), (12, 10),
        (2, 10),
        (12, 20), (20, 21),
    ])
    got = {(r.src_scc, r.dst_scc) for r in condensation_edges(e).collect()}
    assert got == {(0, 10), (10, 20), (20, 21)}


def test_condensation_single_scc_is_empty(spark):
    e = edges_df(spark, [(0, 1), (1, 2), (2, 0)])
    assert condensation_edges(e).count() == 0


def test_condensation_reuses_labels(spark):
    from plato_spark.algos.scc import strongly_connected_components

    e = edges_df(spark, [(0, 1), (1, 0), (1, 2)])
    labels = strongly_connected_components(e)
    got = {(r.src_scc, r.dst_scc)
           for r in condensation_edges(e, labels=labels).collect()}
    assert got == {(0, 2)}


# ------------------------------------------------- content-reference edges

def test_content_reference_extraction(spark):
    df = spark.createDataFrame(
        [(0, "intro see:doc2 middle see:doc3 end"),
         (1, "no references here"),
         (2, "self see:doc2 loop")],
        "doc_id long, text string",
    )
    got = {(r.src, r.ref)
           for r in content_reference_edges(df, r"see:doc([0-9]+)").collect()}
    assert got == {(0, "2"), (0, "3"), (2, "2")}
