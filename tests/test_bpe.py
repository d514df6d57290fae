"""BPE merge learning (functions/bpe.bpe_merges) vs a python mirror."""

import re

from plato_spark.functions.bpe import bpe_merges

TOKEN_RE = "[A-Za-z0-9_]+"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _mirror(texts, merges):
    """Python mirror of the engine contract: distinct-word loop,
    self-pairs excluded, positional (overlap-free) merge, total order
    (count DESC, a ASC, b ASC)."""
    freq = {}
    for t in texts:
        for w in re.findall(TOKEN_RE, t):
            freq[w] = freq.get(w, 0) + 1
    words = {w: [*w, "</w>"] for w in freq}
    out = []
    for r in range(1, merges + 1):
        counts = {}
        for w, s in words.items():
            for i in range(len(s) - 1):
                if s[i] != s[i + 1]:
                    counts[(s[i], s[i + 1])] = counts.get(
                        (s[i], s[i + 1]), 0) + freq[w]
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((r, a, b, n))
        for w, s in words.items():
            ns = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            words[w] = ns
    return out


def test_bpe_sennrich_style_fixture(spark):
    texts = ["low low low low low", "lower lower newest newest",
             "newest newest newest newest widest widest widest"]
    got = [(r.round, r.sym_a, r.sym_b, r.pair_count)
           for r in bpe_merges(_docs(spark, texts), merges=6).collect()]
    assert got == _mirror(texts, 6)
    # the classic outcome: 'es'/'est' family dominates (newest x6 + widest x3)
    assert got[0][1:3] == ("e", "s") or got[0][1:3] == ("s", "t")


def test_bpe_merged_symbol_feeds_next_round(spark):
    # one word repeated: merges chain deterministically into the word
    texts = ["abc abc abc"]
    got = [(r.sym_a, r.sym_b) for r in
           bpe_merges(_docs(spark, texts), merges=3).collect()]
    # pairs each round all count 3 -> lexicographic: (a,b) then (ab,c) then (abc,</w>)
    assert got == [("a", "b"), ("ab", "c"), ("abc", "</w>")]


def test_bpe_self_pairs_never_selected(spark):
    # 'aaaa' offers only (a,a) pairs -> excluded; only (a,</w>) is learnable
    texts = ["aaaa aaaa aaaa"]
    got = [(r.sym_a, r.sym_b, r.pair_count) for r in
           bpe_merges(_docs(spark, texts), merges=4).collect()]
    assert got[0] == ("a", "</w>", 3)
    # after merging (a,</w>) the only remaining pairs are (a,a) and
    # (a,'a</w>'): (a,a) is excluded, (a,'a</w>') merges next
    assert got[1] == ("a", "a</w>", 3)


def test_bpe_alternating_pattern_counts_every_occurrence(spark):
    # 'abab': pair (a,b) occurs twice per word, non-overlapping
    texts = ["abab abab"]
    got = bpe_merges(_docs(spark, texts), merges=1).collect()
    assert (got[0].sym_a, got[0].sym_b, got[0].pair_count) == ("a", "b", 4)


def test_bpe_mirror_on_mixed_corpus(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the five boxing wizards jump quickly",
        "how vexingly quick daft zebras jump",
    ]
    got = [(r.round, r.sym_a, r.sym_b, r.pair_count)
           for r in bpe_merges(_docs(spark, texts), merges=10).collect()]
    assert got == _mirror(texts, 10)


def test_bpe_compression_is_cumsum_complement_of_merges(spark):
    from plato_spark.functions.bpe import bpe_compression

    texts = ["low low low low low", "lower lower newest newest",
             "newest newest newest newest widest widest widest"]
    docs = _docs(spark, texts)
    merges = [(r.round, r.pair_count)
              for r in bpe_merges(docs, merges=5).collect()]
    curve = {r.round: r.total_symbols
             for r in bpe_compression(docs, merges=5).collect()}
    # round 0 baseline = total chars + one marker per word occurrence
    import re
    words = [w for t in texts for w in re.findall(TOKEN_RE, t)]
    assert curve[0] == sum(len(w) + 1 for w in words)
    # every merge removes exactly pair_count symbols
    for r, n in merges:
        assert curve[r] == curve[r - 1] - n
