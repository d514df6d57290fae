"""Entry-registry queries: text domain (split from the former
monolithic __spark_entry__.py; round-5 manifest-ization).
"""

from __future__ import annotations

from plato_spark.entry.common import (  # noqa: F401
    BPE_MERGES,
    F,
    H1_SQL,
    LANG_VOCAB_K,
    LPA_ITERS,
    TOKEN_RE_SQL,
    VOCAB_TOP_K,
    _sql_bpe_compression,
    _sql_bpe_merges,
    _sql_curation,
    _sql_doc_fingerprint,
    _sql_lang_id,
    _sql_lang_rand_index,
    _sql_quality_length_corr,
    doc_fingerprint,
    label_propagation,
    lang_id_ngram,
    load_table,
    ngram_jaccard_pairs,
    q_reference_graph,
    quality_filter,
    stop_re,
    symmetrize,
    text_quality,
    token_count_col,
)


def q_token_cosine_topk(spark, sf_dir):
    """Sparse token-count cosine retrieval: top-5 most similar docs per
    doc via an INVERTED-INDEX join — the sparse sibling of ann_topk's
    dense brute force, and the plan BM25-style retrieval rides at
    100 TB.  Terms with document frequency > 64 are pruned BEFORE the
    self-join (stopword posting lists are the quadratic hub poison —
    the viral-bucket guard applied to retrieval); pair scores then flow
    only through shared rare-ish terms.  Exactness: term counts and
    dot products are exact integers, norms are per-doc integer folds,
    cosine = dot / sqrt(na * nb) is one IEEE division + sqrt, and the
    top-5 rank key is (6dp-rounded cosine DESC, neighbor id ASC) —
    fully deterministic in both engines."""
    from pyspark.sql import Window

    from plato_spark.functions.text import TOKEN_RE

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.regexp_extract_all(F.col("text"),
                                           F.lit(TOKEN_RE), F.lit(0)))
            .alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ok = (
        tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= 64).select("tok")
    )
    tfp = tf.join(df_ok, "tok", "left_semi")
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("n2"))
    lhs = tfp.select("tok", F.col("doc_id").alias("a"),
                     F.col("tf").alias("ta"))
    rhs = tfp.select("tok", F.col("doc_id").alias("b"),
                     F.col("tf").alias("tb"))
    dots = (
        lhs.join(rhs, "tok")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("ta") * F.col("tb")).cast("long").alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(norms.select(F.col("doc_id").alias("a"),
                                           F.col("n2").alias("na"))), "a")
        .join(F.broadcast(norms.select(F.col("doc_id").alias("b"),
                                       F.col("n2").alias("nb"))), "b")
        .select(
            "a", "b",
            F.round(F.col("dot")
                    / F.sqrt(F.col("na").cast("double") * F.col("nb")),
                    6).alias("cos"))
    )
    w = Window.partitionBy("a").orderBy(F.desc("cos"), F.asc("b"))
    return (
        scored.select("a", "b", "cos",
                      F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= 5)
    )


def q_length_ks_distance(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov distance between two
    sources' doc-length distributions — the distribution-drift test
    behind 'did src1's crawler change?'.  D = max |F1(v) - F2(v)| is
    computed as the exact integer cross-multiply max |c1*n2 - c2*n1|
    over the merged distinct-value table (bounded by |distinct
    lengths|, the offsets-table role), with the argmax value tie-broken
    to the smallest v; float enters only at the two read-out
    divisions."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    a = docs.where(F.col("source") == "src0").groupBy(
        F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("ca"))
    b = docs.where(F.col("source") == "src1").groupBy(
        F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cb"))
    m = a.join(b, "v", "outer").select(
        "v", F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = m.select(
        "v", F.sum("ca").over(w).alias("f1"),
        F.sum("cb").over(w).alias("f2"))
    tot = m.agg(F.sum("ca").cast("long").alias("n1"),
                F.sum("cb").cast("long").alias("n2"))
    dev = cum.crossJoin(F.broadcast(tot)).select(
        "v", "n1", "n2",
        F.abs(F.col("f1") * F.col("n2")
              - F.col("f2") * F.col("n1")).alias("d"))
    best = dev.agg(
        F.max(F.struct(F.col("d"), (-F.col("v")).alias("nv"))).alias("m"),
        F.max("n1").alias("n1"), F.max("n2").alias("n2"))
    return best.select(
        F.col("n1"), F.col("n2"),
        (-F.col("m.nv")).cast("long").alias("ks_at_length"),
        F.round(F.col("m.d") / (F.col("n1") * F.col("n2")), 6)
        .alias("ks_distance"))


def q_charclass_profile(spark, sf_dir):
    """Per-source character-class profile: exact counts of lowercase /
    uppercase / digit / whitespace / other characters — the ingest
    fingerprint that catches a source flipping case conventions,
    going numeric, or injecting markup, one aggregation, JVM regex
    only."""
    docs = load_table(spark, sf_dir, "documents")

    def n_of(pat):
        return F.length(F.regexp_replace(F.col("text"),
                                         F.lit(pat), F.lit(""))).cast(
            "long")

    total = F.length(F.col("text")).cast("long")
    return (
        docs.select(
            "source", total.alias("n"),
            (total - n_of("[a-z]")).alias("lower"),
            (total - n_of("[A-Z]")).alias("upper"),
            (total - n_of("[0-9]")).alias("digit"),
            (total - n_of(r"[ \t\n\r]")).alias("white"),
        )
        .groupBy("source")
        .agg(F.sum("n").cast("long").alias("n_chars"),
             F.sum("lower").cast("long").alias("n_lower"),
             F.sum("upper").cast("long").alias("n_upper"),
             F.sum("digit").cast("long").alias("n_digit"),
             F.sum("white").cast("long").alias("n_white"),
             (F.sum("n") - F.sum("lower") - F.sum("upper")
              - F.sum("digit") - F.sum("white")).cast("long")
             .alias("n_other"))
    )


def q_repetition_ratio(spark, sf_dir):
    """Type-token redundancy per document (boilerplate/spam signal)."""
    from plato_spark.functions.text import repetition_ratio

    docs = load_table(spark, sf_dir, "documents")
    return repetition_ratio(docs)


def q_redact_pii(spark, sf_dir):
    """PII scrub (emails/URLs/IPv4 -> typed tokens + counts). The corpus
    text is synthetic and PII-free, so the query plants deterministic PII
    per doc_id (mirrored verbatim in the oracle) — the redaction regexes
    then do real work that a single byte of drift would expose."""
    from plato_spark.functions.text import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit(" mail u"), F.col("doc_id"),
                            F.lit("@example.com now")))
            .when(F.col("doc_id") % 3 == 1,
                  F.concat(F.lit(" ref https://example.org/p/"),
                           F.col("doc_id"), F.lit(" end")))
            .otherwise(F.concat(F.lit(" host 10.0."),
                                F.col("doc_id") % 256, F.lit(".7 up"))),
        ).alias("text"),
    )
    return redact_pii(planted)


def q_shingle_novelty(spark, sf_dir):
    """Per-document novel-shingle fraction vs all lower-id documents
    (functions/dedup.shingle_novelty) — the incremental-crawl "what does
    this snapshot add" curation signal.  Exact integers + one rounded
    division; only (id, hash) pairs and per-hash minima shuffle."""
    from plato_spark.functions.dedup import shingle_novelty

    return shingle_novelty(load_table(spark, sf_dir, "documents"))


def q_winnow_fingerprints(spark, sf_dir):
    """Robust-winnowing fingerprint selection (MOSS kernel, functions/
    text.winnow_fingerprints): token 5-gram hashes, window w=4, min hash
    per window with rightmost tie-break — (id, pos, fp) rows, all-JVM
    higher-order functions, zero shuffle before the final distinct."""
    from plato_spark.functions.text import winnow_fingerprints

    return winnow_fingerprints(load_table(spark, sf_dir, "documents"))


def q_hapax_stats(spark, sf_dir):
    """Per-source hapax-legomenon / type-token vocabulary profile
    (functions/text.hapax_stats) — the Heaps-law health check before
    tokenizer training."""
    from plato_spark.functions.text import hapax_stats

    return hapax_stats(load_table(spark, sf_dir, "documents"))


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking dedup (functions/dedup.cdc_chunk_stats):
    rolling-hash chunk boundaries (h % 64 == 0 over 8-char windows)
    that RESYNCHRONIZE after edits — the content-store dedup strategy
    beside the fixed-window chunk_dedup.  All JVM higher-order
    functions; exact integer reclaim accounting."""
    from plato_spark.functions.dedup import cdc_chunk_stats

    return cdc_chunk_stats(load_table(spark, sf_dir, "documents"))


def q_style_divergence(spark, sf_dir):
    """Per-source total-variation style divergence from the corpus
    unigram distribution (functions/text.source_style_divergence) —
    the STYLE sibling of the Sinkhorn VOLUME balancer.  Exact BIGINT
    cross-multiplied fold over the top-200 vocab + residual bucket,
    one rounded division per source (TV needs no ln — the cross-libm
    lesson)."""
    from plato_spark.functions.text import source_style_divergence

    return source_style_divergence(load_table(spark, sf_dir, "documents"))


def q_vocabulary(spark, sf_dir):
    """Top-200 corpus vocabulary by term frequency (+doc frequency) —
    the tokenizer/vocab-building step of a training pipeline."""
    from plato_spark.functions.text import vocabulary_stats

    docs = load_table(spark, sf_dir, "documents")
    return vocabulary_stats(docs, top_k=VOCAB_TOP_K)


def q_quality_length_corr(spark, sf_dir):
    """Rank agreement between document LENGTH (n_chars) and the
    unigram-LM quality score (algos/rankcorr.rank_correlation): the
    'is the quality filter just a length filter?' audit — rho near 1
    says the expensive signal adds nothing over n_chars.  Same pinned
    (score DESC, id) total order and distributed dictionary rank as
    centrality_rank_corr; mean_tf is already 6dp-rounded so
    round(mean_tf*1e6) is an exact integer score."""
    from plato_spark.algos.rankcorr import rank_correlation
    from plato_spark.functions.text import unigram_commonness

    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("id"),
                    F.col("n_chars").cast("long").alias("score_u"))
    b = unigram_commonness(docs).select(
        F.col("doc_id").alias("id"),
        F.round(F.col("mean_tf") * 1e6, 0).cast("long").alias("score_u"))
    return rank_correlation(a, b)


def q_lm_quality(spark, sf_dir):
    """Unigram-LM document quality scoring (the perplexity-filter signal
    in exact arithmetic — see functions/text.unigram_commonness)."""
    from plato_spark.functions.text import unigram_commonness

    return unigram_commonness(load_table(spark, sf_dir, "documents"))


def q_pmi_collocations(spark, sf_dir):
    """Top-50 adjacent-token collocations by PMI lift (multiword
    expression mining; raw-ratio ranking, no ln — the tfidf lesson)."""
    from plato_spark.functions.text import pmi_collocations

    return pmi_collocations(load_table(spark, sf_dir, "documents"))


def q_boilerplate_lines(spark, sf_dir):
    """Line-level boilerplate shared by >=3 docs (C4/RefinedWeb-style
    chrome stripping) — only sha digests shuffle.  NOTE: a true negative
    on this corpus (synthetic docs carry no newlines, all 500 texts
    distinct) — both engines compute the full pipeline and agree on the
    empty result; semantics are pinned by the banner-detection pytest."""
    from plato_spark.functions.text import boilerplate_lines

    return boilerplate_lines(load_table(spark, sf_dir, "documents"))


def q_source_overlap(spark, sf_dir):
    """Cross-source 8-gram shingle contamination matrix (which sources
    are textually entangled before blend mixing)."""
    from plato_spark.functions.dedup import source_shingle_overlap

    return source_shingle_overlap(load_table(spark, sf_dir, "documents"))


def q_doclen_histogram(spark, sf_dir):
    """Log2-bucketed document token-length distribution (integer bit
    length, not libm log2 — the no-ln discipline)."""
    from plato_spark.functions.text import doclen_histogram

    return doclen_histogram(load_table(spark, sf_dir, "documents"))


def q_bigram_vocabulary(spark, sf_dir):
    """Top-200 word bigrams (tf, df) — overlapping windows built JVM-side
    from the token array (functions/text.ngram_vocabulary)."""
    from plato_spark.functions.text import ngram_vocabulary

    return ngram_vocabulary(load_table(spark, sf_dir, "documents"), n=2)


def q_doc_chunks(spark, sf_dir):
    """Fixed-token-window training chunks (64-token windows, stride 48)
    per document (functions/text.chunk_documents)."""
    from plato_spark.functions.text import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk=64, stride=48
    )


def q_source_health(spark, sf_dir):
    """Per-source corpus health rollup: doc counts, token mass, mean
    length, language mix entropy-free proxy (distinct langs), and
    exact-duplicate rate — the pre-mixing dashboard of a curation
    pipeline.  One aggregation over per-doc JVM expressions + one
    sha-digest dup join; exact integers + rounded divisions."""
    from plato_spark.functions.text import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        token_count_col(F.col("text")).alias("n_tok"),
        F.length("text").cast("long").alias("n_chars"),
        F.col("lang"),
        F.sha2(F.col("text"), 256).alias("sha"),
    )
    dup = (
        per.groupBy("source", "sha").agg(F.count("*").alias("c"))
        .groupBy("source")
        .agg((F.sum("c") - F.count("*")).cast("long").alias("n_dups"))
    )
    agg = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.round(F.avg("n_chars"), 2).alias("mean_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    return agg.join(dup, "source").select(
        "source", "n_docs", "n_tokens", "mean_chars", "n_langs",
        "n_dups",
        F.round(F.col("n_dups") / F.col("n_docs"), 6).alias("dup_rate"),
    )


def q_oov(spark, sf_dir):
    """Tokenizer-coverage check: train/eval split by portable doc-id
    hash, eval-half OOV token mass vs the train vocabulary
    (functions/text.oov_stats)."""
    from plato_spark.functions.text import oov_stats

    return oov_stats(load_table(spark, sf_dir, "documents"))


def q_zipf_curve(spark, sf_dir):
    """Rank-frequency (Zipf) profile of the corpus vocabulary:
    (bucket, n_tokens, mass, mass_pct) over bit-length RANK buckets —
    how fast token mass decays down the frequency ranking, the
    complement of hapax_stats' frequency spectrum (that buckets by
    count; this buckets by rank, which is what Zipf's law is stated
    over).  The global rank rides the vid-encoder distributed
    dictionary rank (graph/edges.build_dictionary — range partition +
    per-partition offsets, never a single-partition window) on a
    composite STRING key whose ascending order IS (tf DESC, token ASC):
    lpad(10^12 - tf) || token."""
    from plato_spark.functions.text import TOKEN_RE
    from plato_spark.graph.edges import build_dictionary

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.regexp_extract_all(
            F.col("text"), F.lit(TOKEN_RE), F.lit(0))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    keyed = tf.select(
        "tf",
        F.concat(
            F.lpad((F.lit(10**12) - F.col("tf")).cast("string"), 13, "0"),
            F.col("token"),
        ).alias("vkey"),
    )
    d = build_dictionary(keyed.select("vkey"), 8)
    ranked = keyed.join(d, "vkey").select(
        "tf", (F.col("id") + 1).cast("long").alias("rank"))
    tot = ranked.agg(F.sum("tf").cast("long").alias("tot"))
    g = ranked.groupBy(
        F.length(F.bin(F.col("rank"))).cast("int").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
          F.sum("tf").cast("long").alias("mass"))
    return g.crossJoin(F.broadcast(tot)).select(
        "bucket", "n_tokens", "mass",
        F.round((F.lit(100) * F.col("mass")) / F.col("tot"), 6)
        .alias("mass_pct"),
    )


def q_lang_rand_index(spark, sf_dir):
    """Rand index between LPA communities on the citation graph and
    the documents' language labels — EXTERNAL clustering evaluation as
    an oracle-checked row (does community structure recover language?
    — the pair-counting answer beside lang_modularity's edge-cut one).
    RI = (C(n,2) + 2·ΣC(nij,2) - ΣC(ai,2) - ΣC(bj,2)) / C(n,2) — every
    term an exact integer from the contingency table (pair counts via
    m(m-1) div 2), ONE final division.  Communities come from the same
    3-iteration LPA protocol the lpa row pins."""
    from plato_spark.graph.edges import canonicalize_undirected

    canon = canonicalize_undirected(q_reference_graph(spark, sf_dir))
    comm = label_propagation(symmetrize(canon), iterations=LPA_ITERS)
    lang = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "lang")
    j = comm.join(lang, "id")
    cells = j.groupBy("label", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("m"))
    c2 = lambda c: F.expr(f"({c} * ({c} - 1)) div 2")  # noqa: E731
    parts = cells.agg(
        F.sum("m").cast("long").alias("n"),
        F.count_distinct("label").cast("long").alias("n_communities"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.sum(c2("m")).cast("long").alias("cell2"),
    )
    rows2 = (cells.groupBy("label").agg(F.sum("m").alias("a"))
             .agg(F.sum(c2("a")).cast("long").alias("row2")))
    cols2 = (cells.groupBy("lang").agg(F.sum("m").alias("b"))
             .agg(F.sum(c2("b")).cast("long").alias("col2")))
    return (
        parts.crossJoin(F.broadcast(rows2)).crossJoin(F.broadcast(cols2))
        .select(
            "n", "n_communities", "n_langs",
            F.round(
                (F.expr("(n * (n - 1)) div 2") + 2 * F.col("cell2")
                 - F.col("row2") - F.col("col2"))
                / F.expr("(n * (n - 1)) div 2").cast("double"), 6)
            .alias("rand_index"),
        )
    )


def q_source_entropy(spark, sf_dir):
    """Per-source token Shannon entropy in bits: H = log2(N) -
    (Σ c·log2 c)/N over the per-(source, token) counts — vocabulary
    RICHNESS where lang_concentration's Herfindahl reads dominance;
    the two disagree exactly when a source mixes a few heavy tokens
    with a long tail.  Counts are exact integers; the Σ c·log2 c fold
    is the only float sum and its reassociation error is ~V·ε relative
    (≈1e-11 here) — invisible at the 6dp rounding both engines
    apply."""
    from plato_spark.functions.text import TOKEN_RE

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.regexp_extract_all(
            F.col("text"), F.lit(TOKEN_RE), F.lit(0))).alias("token"))
    c = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    g = c.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("c") * F.log2(F.col("c"))).alias("s"),
    )
    return g.select(
        "source", "n_tokens", "vocab",
        F.round(F.log2(F.col("n_tokens")) - F.col("s") / F.col("n_tokens"),
                6).alias("entropy_bits"),
    )


def q_lang_concentration(spark, sf_dir):
    """Per-source Herfindahl language concentration
    (functions/text.lang_concentration): the entropy-free mixture
    scalar, exact integer cross-multiplication, one rounded division."""
    from plato_spark.functions.text import lang_concentration

    return lang_concentration(load_table(spark, sf_dir, "documents"))


def q_lang_vocabulary(spark, sf_dir):
    """Top-10 tokens per language (functions/recommend.topk_per_key
    over per-(lang, token) counts): the per-language tokenizer/quality
    audit beside the global vocabulary head; partition-local rank under
    the (tf DESC, token) total order."""
    from plato_spark.functions.recommend import topk_per_key
    from plato_spark.functions.text import TOKEN_RE

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select("lang", F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return topk_per_key(
        tc, "lang", [F.col("tf").desc(), F.col("token").asc()],
        LANG_VOCAB_K,
    ).select("lang", "token", "tf", F.col("rank").cast("int").alias("rank"))


def q_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth over 8 deterministic hash batches
    (functions/text.vocab_growth): per-batch token mass, first-seen
    types, cumulative vocab — the tokenizer-freeze signal."""
    from plato_spark.functions.text import vocab_growth

    return vocab_growth(load_table(spark, sf_dir, "documents"), n_batches=8)


def q_vocab_coverage(spark, sf_dir):
    """Zipf head coverage (functions/text.vocab_coverage): share of the
    corpus token mass covered by the top-k types for k in (10, 100,
    1000) — the vocab-size decision read-out."""
    from plato_spark.functions.text import vocab_coverage

    return vocab_coverage(load_table(spark, sf_dir, "documents"))


def q_corpus_card(spark, sf_dir):
    """Dataset-card headline block (functions/text.corpus_card): docs,
    sources, langs, tokens, chars, dup rate, empties — one
    map-side-combined pass, digests-only dup fold."""
    from plato_spark.functions.text import corpus_card

    return corpus_card(load_table(spark, sf_dir, "documents"))


def q_tfidf(spark, sf_dir):
    """Top-3 tf-idf keywords per document (raw-inverse-idf scoring so the
    value is exact integer arithmetic + one IEEE division)."""
    from plato_spark.functions.text import tfidf_keywords

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_keywords(docs, top_k=3)


def q_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count_col(F.col("text")).alias("n_tokens"))


def q_text_quality(spark, sf_dir):
    return text_quality(load_table(spark, sf_dir, "documents"))


def q_corpus_curation(spark, sf_dir):
    """Five-stage curation DAG (quality -> exact dedup -> LSH near-dup ->
    stratified sample -> split), the bucketed scale path end-to-end —
    value-checked because every hash is portable (functions/curation)."""
    from plato_spark.functions.curation import curate_corpus

    return curate_corpus(
        load_table(spark, sf_dir, "documents"),
        fractions={"en": 0.5, "zh": 1.0},
        default_fraction=0.25,
    )


def q_quality_filter(spark, sf_dir):
    """Training-data KEEP/DROP gate over the quality heuristics."""
    return quality_filter(load_table(spark, sf_dir, "documents"))


def q_lang_distribution(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5, n=3
    )


def q_doc_fingerprint(spark, sf_dir):
    return doc_fingerprint(
        load_table(spark, sf_dir, "documents"), hash_impl="portable"
    )


def q_lang_id(spark, sf_dir):
    return lang_id_ngram(load_table(spark, sf_dir, "documents"))


def q_chunk_dedup(spark, sf_dir):
    """Paragraph-grain exact dedup: duplicate fixed-token-window chunks
    across the corpus (boilerplate/mirror detection below document
    grain), with the token mass dedup would reclaim."""
    from plato_spark.functions.text import chunk_dedup_stats

    return chunk_dedup_stats(load_table(spark, sf_dir, "documents"))


def q_bpe_compression(spark, sf_dir):
    """Corpus compression curve of the first BPE_MERGES BPE merges
    (functions/bpe.bpe_compression): occurrence-weighted symbol count
    per round, round 0 = character baseline."""
    from plato_spark.functions.bpe import bpe_compression

    return bpe_compression(load_table(spark, sf_dir, "documents"),
                           merges=BPE_MERGES)


def q_postings(spark, sf_dir):
    """Positional inverted-index postings for the top-20 corpus tokens
    (functions/text.inverted_postings): TakeOrdered vocabulary head +
    broadcast semi-join back against the token stream."""
    from plato_spark.functions.text import inverted_postings

    return inverted_postings(load_table(spark, sf_dir, "documents"),
                             top_k=20)


def q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix: the n-gram classifier's prediction
    (functions/text.lang_id_ngram — already oracle-checked per doc)
    cross-tabulated against the planted lang label; exact counts."""
    from plato_spark.functions.text import lang_id_ngram

    docs = load_table(spark, sf_dir, "documents")
    pred = lang_id_ngram(docs)
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_bpe_merges(spark, sf_dir):
    """First BPE_MERGES BPE merge rules learned over the corpus
    (functions/bpe.bpe_merges): Zipf-collapsed distinct-word loop,
    JVM-only pair counting + positional merge, TakeOrdered-1 per round
    under the (count DESC, a, b) total order; self-pairs excluded so
    the merge is a branch-free positional map on both engines."""
    from plato_spark.functions.bpe import bpe_merges

    return bpe_merges(load_table(spark, sf_dir, "documents"), merges=BPE_MERGES)


def q_token_length_profile(spark, sf_dir):
    """Per-source token-length fingerprint: token count, exact mean
    length (sum of lengths / count — two integer folds), the longest
    token, and the share of long tokens (> 10 chars) — the
    tokenizer-fertility prior (long-token-heavy sources fragment into
    more subwords)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.regexp_extract_all(
            "text", F.lit("[A-Za-z0-9_]+"), F.lit(0))).alias("t"))
    per = toks.select("source", F.length("t").cast("long").alias("l"))
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("l").cast("long").alias("total_chars"),
        F.max("l").cast("long").alias("max_len"),
        F.sum(F.when(F.col("l") > 10, 1).otherwise(0)).cast("long")
        .alias("n_long"),
    ).select(
        "source", "n_tokens", "total_chars", "max_len", "n_long",
        F.round(F.col("total_chars") / F.col("n_tokens"), 6)
        .alias("mean_len"),
        F.round(F.col("n_long") / F.col("n_tokens"), 6)
        .alias("long_frac"))


def q_casing_profile(spark, sf_dir):
    """Word-level casing fingerprint per source: letter-run tokens
    classified as lowercase / Titlecase / ALLCAPS by anchored JVM
    regexes (the charclass_profile discipline one level up) — the
    boilerplate/shouting detector and the casing prior a tokenizer
    normalization step needs.  Exact counts + three rounded ratios."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit("[A-Za-z]+"), F.lit(0))

    def cnt(pat):
        return F.size(F.filter(toks, lambda t: t.rlike(pat))) \
            .cast("long")

    per = docs.select(
        "source",
        F.size(toks).cast("long").alias("w"),
        cnt("^[a-z]+$").alias("lo"),
        cnt("^[A-Z][a-z]+$").alias("ti"),
        cnt("^[A-Z]{2,}$").alias("up"))
    agg = per.groupBy("source").agg(
        F.sum("w").cast("long").alias("n_words"),
        F.sum("lo").cast("long").alias("n_lower"),
        F.sum("ti").cast("long").alias("n_title"),
        F.sum("up").cast("long").alias("n_allcaps"))
    return agg.select(
        "source", "n_words", "n_lower", "n_title", "n_allcaps",
        F.round(F.col("n_lower") / F.col("n_words"), 6)
        .alias("lower_frac"),
        F.round(F.col("n_title") / F.col("n_words"), 6)
        .alias("title_frac"),
        F.round(F.col("n_allcaps") / F.col("n_words"), 6)
        .alias("allcaps_frac"))


def q_length_qq_table(spark, sf_dir):
    """QQ table of doc length between src0 and src1 — the visual drift
    diagnostic behind length_ks_distance's single number: at each
    decile q, the exact rank-picked length of both distributions
    (rank = (q*(n-1)) div 10 + 1, the lower-interpolation convention —
    an integer pick, no float quantile math).  Matching columns means
    same distribution; a bowed curve localizes WHERE the crawler
    changed."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")

    def deciles(src, out):
        d = docs.where(F.col("source") == src).select(
            F.col("n_chars").alias("v"))
        w = Window.orderBy("v")
        n = d.count()
        ranked = d.select("v", F.row_number().over(w).alias("rn"))
        qs = spark.range(0, 11).select(
            F.col("id").cast("int").alias("decile"),
            (F.col("id") * (n - 1)).cast("long").alias("t"))
        return qs.select(
            "decile", (F.expr("t div 10") + 1).alias("rn")
        ).join(ranked, "rn").select(
            "decile", F.col("v").alias(out))

    a = deciles("src0", "len_src0")
    b = deciles("src1", "len_src1")
    return a.join(b, "decile").select("decile", "len_src0", "len_src1")


def q_lang_source_chisq(spark, sf_dir):
    """Chi-square statistic of the lang x source contingency table
    (independence of language and container — the mixture-drift test
    statistic, reported WITHOUT a p-value: no incomplete-gamma libm).
    Per-cell terms (O-E)^2/E come from exact integer margins through
    correctly-rounded single divisions, are rounded to 9dp and summed
    as DECIMAL(38,9) — an order-FREE fold, the pca-gramian lesson
    applied to a float statistic.  One row: n, rows, cols, dof, chi2."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o"))
    rm = cells.groupBy("lang").agg(F.sum("o").alias("rm"))
    cm = cells.groupBy("source").agg(F.sum("o").alias("cm"))
    n = docs.count()
    term = F.round(
        (F.col("o") - F.col("rm") * F.col("cm") / F.lit(float(n)))
        * (F.col("o") - F.col("rm") * F.col("cm") / F.lit(float(n)))
        / (F.col("rm") * F.col("cm") / F.lit(float(n))), 9)
    # absent (lang, source) cells contribute E (their O is 0):
    # chi2 = sum_present (O-E)^2/E + sum_absent E; the absent mass is
    # n - sum_present E, each term exact through the same fold
    present = cells.join(rm, "lang").join(cm, "source").select(
        term.cast("decimal(38,9)").alias("t"),
        F.round(F.col("rm") * F.col("cm") / F.lit(float(n)), 9)
        .cast("decimal(38,9)").alias("e"))
    nr = cells.select("lang").distinct().count()
    nc = cells.select("source").distinct().count()
    # final rounding stays a Spark DECIMAL expression (half-up), never
    # python round() (half-even) — the 6dp tie discipline
    return present.agg(
        F.sum("t").alias("tp"), F.sum("e").alias("ep")
    ).select(
        F.lit(n).cast("long").alias("n"),
        F.lit(nr).cast("long").alias("n_langs"),
        F.lit(nc).cast("long").alias("n_sources"),
        F.lit((nr - 1) * (nc - 1)).cast("long").alias("dof"),
        F.round(F.col("tp") + (F.lit(n) - F.col("ep")), 6)
        .cast("double").alias("chi2"))


def q_readability_cli(spark, sf_dir):
    """Per-source Coleman-Liau readability — the readability formula
    with NO syllable guessing and NO logs: CLI = 0.0588*L - 0.296*S -
    15.8 with L = letters per 100 words and S = sentences per 100
    words, all from exact corpus-level integer counts (letters via the
    charclass regex, words via the shared TOKEN_RE, sentences via
    [.!?]+ terminator runs floored at 1 per doc), so the only float ops
    are two correctly-rounded divisions and one linear combination."""
    docs = load_table(spark, sf_dir, "documents")
    letters = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    words = F.size(F.regexp_extract_all(
        "text", F.lit("[A-Za-z0-9_]+"), F.lit(0)))
    sents = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), F.lit(0))),
        F.lit(1))
    per = docs.select(
        "source", letters.cast("long").alias("lt"),
        words.cast("long").alias("wd"), sents.cast("long").alias("st"))
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("lt").cast("long").alias("letters"),
        F.sum("wd").cast("long").alias("words"),
        F.sum("st").cast("long").alias("sentences"))
    big_l = F.col("letters") / F.col("words") * 100
    big_s = F.col("sentences") / F.col("words") * 100
    return agg.select(
        "source", "n_docs", "letters", "words", "sentences",
        F.round(0.0588 * big_l - 0.296 * big_s - 15.8, 6).alias("cli"))


QUERIES = {
    "bpe_merges": q_bpe_merges,
    "bpe_compression": q_bpe_compression,
    "postings": q_postings,
    "lang_confusion": q_lang_confusion,
    "repetition_ratio": q_repetition_ratio,
    "redact_pii": q_redact_pii,
    "vocabulary": q_vocabulary,
    "tfidf_keywords": q_tfidf,
    "bigram_vocabulary": q_bigram_vocabulary,
    "doc_chunks": q_doc_chunks,
    "token_cosine_topk": q_token_cosine_topk,
    "length_ks_distance": q_length_ks_distance,
    "charclass_profile": q_charclass_profile,
    "cdc_chunks": q_cdc_chunks,
    "style_divergence": q_style_divergence,
    "zipf_curve": q_zipf_curve,
    "source_entropy": q_source_entropy,
    "lang_rand_index": q_lang_rand_index,
    "corpus_card": q_corpus_card,
    "lang_concentration": q_lang_concentration,
    "vocab_growth": q_vocab_growth,
    "vocab_coverage": q_vocab_coverage,
    "lang_vocabulary": q_lang_vocabulary,
    "quality_length_corr": q_quality_length_corr,
    "shingle_novelty": q_shingle_novelty,
    "winnow_fingerprints": q_winnow_fingerprints,
    "hapax_stats": q_hapax_stats,
    "lm_quality": q_lm_quality,
    "pmi_collocations": q_pmi_collocations,
    "boilerplate_lines": q_boilerplate_lines,
    "source_overlap": q_source_overlap,
    "doclen_histogram": q_doclen_histogram,
    "source_health": q_source_health,
    "oov_stats": q_oov,
    "chunk_dedup": q_chunk_dedup,
    "corpus_curation": q_corpus_curation,
    "doc_fingerprint": q_doc_fingerprint,
    "lang_distribution": q_lang_distribution,
    "lang_id": q_lang_id,
    "ngram_jaccard_dups": q_ngram_jaccard,
    "token_count": q_token_count,
    "text_quality": q_text_quality,
    "quality_filter": q_quality_filter,
    "readability_cli": q_readability_cli,
    "lang_source_chisq": q_lang_source_chisq,
    "length_qq_table": q_length_qq_table,
    "casing_profile": q_casing_profile,
    "token_length_profile": q_token_length_profile,
}


ORACLES = {
    "bpe_merges": _sql_bpe_merges(BPE_MERGES),
    "bpe_compression": _sql_bpe_compression(BPE_MERGES),
    "postings": f"""
WITH tk AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
  FROM documents),
pos AS MATERIALIZED (
  SELECT doc_id, u.p.t AS token, u.p.i AS pos
  FROM tk, UNNEST([{{'t': toks[i], 'i': i}}
                   for i in range(1, length(toks) + 1)]) AS u(p)),
top AS MATERIALIZED (
  SELECT token FROM pos GROUP BY token
  ORDER BY count(*) DESC, token ASC LIMIT 20)
SELECT p.token, p.doc_id, CAST(p.pos AS BIGINT) AS pos
FROM pos p JOIN top t ON p.token = t.token
ORDER BY p.token, p.doc_id, pos""",
    "lang_confusion": f"""
WITH pred AS MATERIALIZED ({_sql_lang_id()})
SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN pred p ON d.doc_id = p.doc_id
GROUP BY d.lang, p.lang_pred ORDER BY d.lang, p.lang_pred""",
    "repetition_ratio": f"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
                       FROM documents)
            SELECT doc_id,
                   CAST(length(toks) AS BIGINT) AS n_tokens,
                   CASE WHEN length(toks) > 0
                        THEN round(1.0 - length(list_distinct(toks))
                                   / length(toks), 6)
                        ELSE 0.0 END AS repetition
            FROM t""",
    "redact_pii": r"""
            WITH planted AS (
              SELECT doc_id,
                     text || CASE
                       WHEN doc_id % 3 = 0 THEN ' mail u' || doc_id || '@example.com now'
                       WHEN doc_id % 3 = 1 THEN ' ref https://example.org/p/' || doc_id || ' end'
                       ELSE ' host 10.0.' || (doc_id % 256) || '.7 up' END AS text
              FROM documents),
            s1 AS (
              SELECT doc_id, text,
                     CAST(length(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                       AS n_emails,
                     CAST(length(regexp_extract_all(text,
                       'https?://[A-Za-z0-9./_%+~#-]+')) AS BIGINT) AS n_urls,
                     regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       'https?://[A-Za-z0-9./_%+~#-]+', '<URL>', 'g') AS c2
              FROM planted)
            SELECT doc_id, n_emails, n_urls,
                   CAST(length(regexp_extract_all(c2,
                     '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT)
                     AS n_ips,
                   regexp_replace(c2,
                     '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')
                     AS clean
            FROM s1""",
    "vocabulary": f"""
            WITH t AS (SELECT doc_id,
                              unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                                AS token
                       FROM documents)
            SELECT token, CAST(count(*) AS BIGINT) AS tf,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM t GROUP BY token
            ORDER BY tf DESC, token ASC LIMIT {VOCAB_TOP_K}""",
    "tfidf_keywords": f"""
            WITH t AS (SELECT doc_id,
                              unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                                AS token
                       FROM documents),
            tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                   FROM t GROUP BY doc_id, token),
            dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                      FROM tf GROUP BY token),
            n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.token, tf.tf,
                     round(CAST(tf.tf * (SELECT n FROM n) AS DOUBLE)
                           / dfreq.df, 6) AS score
              FROM tf JOIN dfreq USING (token)),
            ranked AS (
              SELECT doc_id, token, tf, score,
                     CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, token ASC) AS INT) AS rank
              FROM scored)
            SELECT doc_id, token, tf, score, rank
            FROM ranked WHERE rank <= 3""",
    "bigram_vocabulary": f"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS ts
                       FROM documents),
            g AS (SELECT doc_id,
                         unnest(list_transform(generate_series(1, len(ts) - 1),
                                i -> ts[i] || ' ' || ts[i + 1])) AS gram
                  FROM t)
            SELECT gram, CAST(count(*) AS BIGINT) AS tf,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM g GROUP BY gram
            ORDER BY tf DESC, gram ASC LIMIT 200""",
    "doc_chunks": f"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS ts
                       FROM documents),
            b AS (SELECT doc_id, ts, len(ts) AS n FROM t WHERE len(ts) > 0),
            c AS (SELECT doc_id, ts, n,
                         unnest(generate_series(0,
                           CAST((greatest(n - 64, 0) + 47) // 48 AS INT)))
                           AS chunk_idx
                  FROM b)
            SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
                   CAST(len(list_slice(ts, 1 + chunk_idx * 48,
                                       chunk_idx * 48 + 64)) AS BIGINT)
                     AS n_tokens,
                   array_to_string(list_slice(ts, 1 + chunk_idx * 48,
                                              chunk_idx * 48 + 64), ' ')
                     AS chunk
            FROM c ORDER BY doc_id, chunk_idx""",
    "token_cosine_topk": f"""
WITH tf AS MATERIALIZED (
  SELECT doc_id, t AS tok, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
          unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS t
        FROM documents)
  GROUP BY doc_id, t),
ok AS (SELECT tok FROM tf GROUP BY tok HAVING count(*) <= 64),
tfp AS MATERIALIZED (
  SELECT tf.doc_id, tf.tok, tf.tf FROM tf JOIN ok ON tf.tok = ok.tok),
norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
          FROM tf GROUP BY doc_id),
dots AS MATERIALIZED (
  SELECT x.doc_id AS a, y.doc_id AS b,
         CAST(sum(x.tf * y.tf) AS BIGINT) AS dot
  FROM tfp x JOIN tfp y ON x.tok = y.tok AND x.doc_id <> y.doc_id
  GROUP BY x.doc_id, y.doc_id),
scored AS (
  SELECT d.a, d.b,
         round(d.dot / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2), 6) AS cos
  FROM dots d JOIN norms na ON d.a = na.doc_id
  JOIN norms nb ON d.b = nb.doc_id),
ranked AS (
  SELECT a, b, cos,
         CAST(row_number() OVER (PARTITION BY a
              ORDER BY cos DESC, b ASC) AS INTEGER) AS rank
  FROM scored)
SELECT a, b, cos, rank FROM ranked WHERE rank <= 5 ORDER BY a, rank""",
    "length_ks_distance": """
WITH a AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS ca
           FROM documents WHERE source = 'src0' GROUP BY 1),
b AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cb
      FROM documents WHERE source = 'src1' GROUP BY 1),
m AS (SELECT coalesce(a.v, b.v) AS v, coalesce(ca, 0) AS ca,
             coalesce(cb, 0) AS cb
      FROM a FULL OUTER JOIN b ON a.v = b.v),
cum AS (SELECT v,
          CAST(sum(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS f1,
          CAST(sum(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS f2
        FROM m),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
               CAST(sum(cb) AS BIGINT) AS n2 FROM m),
dev AS (SELECT c.v, t.n1, t.n2, abs(c.f1 * t.n2 - c.f2 * t.n1) AS d
        FROM cum c, tot t)
SELECT n1, n2, CAST(v AS BIGINT) AS ks_at_length,
       round(CAST(d AS DOUBLE) / (n1 * n2), 6) AS ks_distance
FROM dev ORDER BY d DESC, v ASC LIMIT 1""",
    "charclass_profile": """
WITH p AS (SELECT source, CAST(length(text) AS BIGINT) AS n,
  CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g'))
       AS BIGINT) AS lo,
  CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
       AS BIGINT) AS up,
  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
       AS BIGINT) AS di,
  CAST(length(text) - length(regexp_replace(text,
       '[ \t\n\r]', '', 'g')) AS BIGINT) AS wh
  FROM documents)
SELECT source, CAST(sum(n) AS BIGINT) AS n_chars,
       CAST(sum(lo) AS BIGINT) AS n_lower,
       CAST(sum(up) AS BIGINT) AS n_upper,
       CAST(sum(di) AS BIGINT) AS n_digit,
       CAST(sum(wh) AS BIGINT) AS n_white,
       CAST(sum(n) - sum(lo) - sum(up) - sum(di) - sum(wh) AS BIGINT)
         AS n_other
FROM p GROUP BY source ORDER BY source""",
    "cdc_chunks": f"""
            WITH base AS (SELECT doc_id, text, length(text) AS ln,
                            greatest(length(text) - 7, 1) AS npos
                          FROM documents),
            pos AS (SELECT doc_id, text, ln,
                           unnest(range(1, npos + 1)) AS i
                    FROM base),
            cuts AS (SELECT doc_id, i FROM pos
                     WHERE i >= 2
                       AND {H1_SQL.format(
                           s="substr(text, CAST(i AS INT), 8)")} % 64 = 0),
            starts AS (SELECT doc_id, CAST(1 AS BIGINT) AS s FROM base
                       UNION ALL SELECT doc_id, CAST(i AS BIGINT) FROM cuts),
            ord AS (SELECT st.doc_id, st.s,
                           lead(st.s) OVER (PARTITION BY st.doc_id
                                            ORDER BY st.s) AS nxt,
                           b.ln, b.text
                    FROM starts st JOIN base b ON st.doc_id = b.doc_id),
            ch AS (SELECT md5(substr(text, CAST(s AS INT),
                              CAST(COALESCE(nxt, ln + 1) - s AS INT)))
                            AS dig,
                          COALESCE(nxt, ln + 1) - s AS clen
                   FROM ord),
            g AS (SELECT dig, CAST(count(*) AS BIGINT) AS cnt,
                         CAST(max(clen) AS BIGINT) AS clen
                  FROM ch GROUP BY dig)
            SELECT CAST(COALESCE(sum(cnt), 0) AS BIGINT) AS n_chunks,
                   CAST(count(*) AS BIGINT) AS distinct_chunks,
                   CAST(COALESCE(sum(cnt - 1), 0) AS BIGINT)
                     AS dup_occurrences,
                   CAST(COALESCE(sum((cnt - 1) * clen), 0) AS BIGINT)
                     AS reclaimable_chars
            FROM g""",
    "style_divergence": f"""
            WITH t AS MATERIALIZED (
              SELECT source,
                     unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                       AS token
              FROM documents),
            gc AS MATERIALIZED (
              SELECT token, CAST(count(*) AS BIGINT) AS gc
              FROM t GROUP BY token),
            vocab AS MATERIALIZED (
              SELECT token, gc FROM gc
              ORDER BY gc DESC, token ASC LIMIT 200),
            sc AS MATERIALIZED (
              SELECT source, token, CAST(count(*) AS BIGINT) AS sc
              FROM t GROUP BY source, token),
            st AS (SELECT source, CAST(sum(sc) AS BIGINT) AS ns
                   FROM sc GROUP BY source),
            gt AS (SELECT CAST(sum(gc) AS BIGINT) AS n FROM gc),
            cells AS (
              SELECT st.source, st.ns, v.gc,
                     CAST(COALESCE(sc.sc, 0) AS BIGINT) AS sc
              FROM st CROSS JOIN vocab v
              LEFT JOIN sc ON sc.source = st.source AND sc.token = v.token),
            agg AS (
              SELECT source, ns, n,
                     CAST(sum(abs(sc * n - gc * ns)) AS BIGINT) AS head_num,
                     CAST(sum(sc) AS BIGINT) AS head_sc,
                     CAST(sum(gc) AS BIGINT) AS head_gc
              FROM cells, gt GROUP BY source, ns, n)
            SELECT source, ns AS n_tokens,
                   round(CAST(head_num
                              + abs((ns - head_sc) * n - (n - head_gc) * ns)
                              AS DOUBLE)
                         / (2.0 * ns * n), 6) AS tv
            FROM agg""",
    "zipf_curve": f"""
WITH t AS MATERIALIZED (
  SELECT unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
  FROM documents),
v AS MATERIALIZED (
  SELECT token, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY token),
r AS (SELECT tf,
             row_number() OVER (ORDER BY tf DESC, token) AS rank
      FROM v),
tot AS (SELECT CAST(sum(tf) AS BIGINT) AS tot FROM v)
SELECT CAST(length(bin(rank)) AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(tf) AS BIGINT) AS mass,
       round(CAST(100 * sum(tf) AS DOUBLE) / max(tot.tot), 6) AS mass_pct
FROM r CROSS JOIN tot GROUP BY bucket ORDER BY bucket""",
    "source_entropy": f"""
WITH t AS MATERIALIZED (
  SELECT source,
         unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
  FROM documents),
c AS MATERIALIZED (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c
  FROM t GROUP BY source, token)
SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6)
         AS entropy_bits
FROM c GROUP BY source ORDER BY source""",
    "lang_rand_index": _sql_lang_rand_index(),
    "corpus_card": f"""
WITH t AS (SELECT source, lang,
             CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                  AS BIGINT) AS tk,
             CAST(n_chars AS BIGINT) AS nc, md5(text) AS h,
             length(text) = 0 AS empty
           FROM documents),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(sum(tk) AS BIGINT) AS total_tokens,
             CAST(sum(nc) AS BIGINT) AS total_chars,
             CAST(count(DISTINCT h) AS BIGINT) AS uniq,
             CAST(sum(CASE WHEN empty THEN 1 ELSE 0 END) AS BIGINT)
               AS empty_docs
      FROM t)
SELECT n_docs, n_sources, n_langs, total_tokens, total_chars,
       round(CAST(total_tokens AS DOUBLE) / n_docs, 6) AS avg_tokens,
       CAST(n_docs - uniq AS BIGINT) AS dup_docs,
       round(CAST(100 * (n_docs - uniq) AS DOUBLE) / n_docs, 6) AS dup_pct,
       empty_docs
FROM a""",
    "lang_concentration": """
WITH per AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
             FROM documents GROUP BY source, lang),
a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_langs,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM per GROUP BY source)
SELECT source, n_docs, n_langs,
       round(CAST(ss AS DOUBLE) / (n_docs * n_docs), 6) AS hhi
FROM a ORDER BY source""",
    "vocab_growth": f"""
WITH toks AS MATERIALIZED (
  SELECT CAST(({H1_SQL.format(s="('vg|' || CAST(doc_id AS VARCHAR))")}) % 8
              AS INTEGER) AS batch,
         unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
  FROM documents),
mass AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_tokens
         FROM toks GROUP BY batch),
fst AS (SELECT token, min(batch) AS batch FROM toks GROUP BY token),
news AS (SELECT batch, CAST(count(*) AS BIGINT) AS new_types
         FROM fst GROUP BY batch)
SELECT m.batch, m.n_tokens,
       CAST(COALESCE(nw.new_types, 0) AS BIGINT) AS new_types,
       CAST(sum(COALESCE(nw.new_types, 0)) OVER (
              ORDER BY m.batch ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS vocab_size
FROM mass m LEFT JOIN news nw ON m.batch = nw.batch
ORDER BY m.batch""",
    "vocab_coverage": f"""
WITH tc AS MATERIALIZED (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
    FROM documents) z
  GROUP BY token),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_tokens FROM tc),
rk AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r FROM tc),
cm AS (SELECT r, sum(n) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS cum
       FROM rk),
kd AS (SELECT CAST(k AS INTEGER) AS k
       FROM (VALUES (10), (100), (1000)) AS t(k)),
pick AS (SELECT k, CAST(max(cum) AS BIGINT) AS covered_tokens
         FROM kd JOIN cm ON cm.r <= kd.k GROUP BY k)
SELECT k, covered_tokens, tot.total_tokens,
       round(CAST(100 * covered_tokens AS DOUBLE) / tot.total_tokens, 6)
         AS coverage_pct
FROM pick, tot ORDER BY k""",
    "lang_vocabulary": f"""
WITH tc AS MATERIALIZED (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT lang,
           unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
    FROM documents) z
  GROUP BY lang, token),
rk AS (SELECT lang, token, tf,
              CAST(row_number() OVER (PARTITION BY lang
                                      ORDER BY tf DESC, token) AS INTEGER)
                AS rank
       FROM tc)
SELECT lang, token, tf, rank FROM rk WHERE rank <= 10
ORDER BY lang, rank""",
    "quality_length_corr": _sql_quality_length_corr(),
    "shingle_novelty": f"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text,
                                '{TOKEN_RE_SQL}') AS toks FROM documents),
            sh AS MATERIALIZED (SELECT doc_id,
              CASE WHEN length(toks) >= 8 THEN
                list_distinct([array_to_string(toks[i:i+7], ' ')
                               for i in range(1, length(toks) - 6)])
              ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
            ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
            hh AS MATERIALIZED (
              SELECT DISTINCT doc_id AS id, {H1_SQL.format(s='s')} AS h
              FROM ex),
            f AS MATERIALIZED (
              SELECT h, min(id) AS first_id FROM hh GROUP BY h)
            SELECT id, CAST(count(*) AS BIGINT) AS n_shingles,
                   CAST(sum(CASE WHEN id = first_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel,
                   round(CAST(sum(CASE WHEN id = first_id THEN 1 ELSE 0
                                  END) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS novelty
            FROM hh JOIN f USING (h) GROUP BY id""",
    "winnow_fingerprints": f"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text,
                                '{TOKEN_RE_SQL}') AS toks FROM documents),
            g AS MATERIALIZED (SELECT doc_id,
              [{H1_SQL.format(s="array_to_string(toks[i:i+4], '')")}
               for i in range(1, greatest(length(toks) - 4, 1) + 1)] AS hs
              FROM t),
            e AS MATERIALIZED (
              SELECT doc_id, unnest(hs) AS h,
                     CAST(generate_subscripts(hs, 1) AS BIGINT) AS pos
              FROM g),
            mm AS (SELECT doc_id, CAST(max(pos) AS BIGINT) AS m
                   FROM e GROUP BY doc_id),
            st AS (SELECT doc_id,
                          unnest(range(1, greatest(m - 3, 1) + 1)) AS s
                   FROM mm),
            wmin AS (SELECT st.doc_id, st.s, min(e.h) AS fp
                     FROM st JOIN e ON e.doc_id = st.doc_id
                                   AND e.pos BETWEEN st.s AND st.s + 3
                     GROUP BY st.doc_id, st.s),
            sel AS (SELECT w.doc_id, w.s, CAST(max(e.pos) AS BIGINT) AS pos,
                           w.fp
                    FROM wmin w JOIN e ON e.doc_id = w.doc_id
                                      AND e.h = w.fp
                                      AND e.pos BETWEEN w.s AND w.s + 3
                    GROUP BY w.doc_id, w.s, w.fp)
            SELECT DISTINCT doc_id AS id, pos, fp FROM sel""",
    "hapax_stats": f"""
            WITH t AS (SELECT source, unnest(regexp_extract_all(text,
                                '{TOKEN_RE_SQL}')) AS tok FROM documents),
            c AS MATERIALIZED (
              SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
              FROM t GROUP BY source, tok)
            SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hapax,
                   round(CAST(count(*) AS DOUBLE)
                         / CAST(sum(cnt) AS DOUBLE), 6) AS type_token_ratio,
                   round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                              AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio
            FROM c GROUP BY source""",
    "lm_quality": f"""
            WITH t AS MATERIALIZED (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                       AS token
              FROM documents),
            v AS MATERIALIZED (
              SELECT token, CAST(count(*) AS BIGINT) AS cnt
              FROM t GROUP BY token)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(CAST(sum(cnt) AS DOUBLE) / count(*), 6) AS mean_tf,
                   round(CAST(sum(CASE WHEN cnt < 3 THEN 1 ELSE 0 END)
                              AS DOUBLE) / count(*), 6) AS rare_ratio
            FROM t JOIN v USING (token) GROUP BY doc_id""",
    "pmi_collocations": f"""
            WITH ts AS MATERIALIZED (
              SELECT regexp_extract_all(text, '{TOKEN_RE_SQL}') AS l
              FROM documents),
            pairs AS MATERIALIZED (
              SELECT u.p.w1 AS w1, u.p.w2 AS w2 FROM ts,
              unnest([{{'w1': x[1], 'w2': x[2]}}
                      for x in list_zip(l[1:len(l)-1], l[2:len(l)])]) AS u(p)
              WHERE len(l) >= 2),
            uni AS MATERIALIZED (
              SELECT unnest(l) AS token FROM ts),
            uc AS MATERIALIZED (
              SELECT token, CAST(count(*) AS BIGINT) AS cnt
              FROM uni GROUP BY token),
            pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n
                   FROM pairs GROUP BY w1, w2 HAVING count(*) >= 5),
            np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pairs),
            s AS (SELECT pc.w1, pc.w2, pc.pair_n,
                         round(CAST(pc.pair_n * (SELECT n FROM np) AS DOUBLE)
                               / CAST(a.cnt * b.cnt AS DOUBLE), 6) AS lift
                  FROM pc JOIN uc a ON pc.w1 = a.token
                          JOIN uc b ON pc.w2 = b.token)
            SELECT w1, w2, pair_n, lift,
                   CAST(row_number() OVER (
                     ORDER BY lift DESC, w1 ASC, w2 ASC) AS INT) AS "rank"
            FROM s ORDER BY lift DESC, w1 ASC, w2 ASC LIMIT 50""",
    "boilerplate_lines": """
            WITH ln AS (SELECT doc_id,
                               trim(unnest(string_split(text, chr(10))))
                                 AS line
                        FROM documents),
            f AS (SELECT doc_id, line FROM ln WHERE length(line) >= 16)
            SELECT sha256(line) AS line_sha,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_occurrences,
                   CAST(max(length(line)) AS INT) AS line_len
            FROM f GROUP BY sha256(line)
            HAVING count(DISTINCT doc_id) >= 3""",
    "source_overlap": f"""
            WITH t AS MATERIALIZED (
              SELECT source, regexp_extract_all(text, '{TOKEN_RE_SQL}')
                       AS toks
              FROM documents),
            sh AS MATERIALIZED (SELECT source,
              CASE WHEN length(toks) >= 8 THEN
                list_distinct([array_to_string(toks[i:i+7], ' ')
                               for i in range(1, length(toks) - 6)])
              ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
            ex AS (SELECT source, unnest(sh) AS s FROM sh),
            hh AS MATERIALIZED (
              SELECT DISTINCT source AS s_, {H1_SQL.format(s='s')} AS h
              FROM ex),
            sizes AS MATERIALIZED (
              SELECT s_, CAST(count(*) AS BIGINT) AS n FROM hh GROUP BY s_),
            p AS (SELECT a.s_ AS source_a, b.s_ AS source_b,
                         CAST(count(*) AS BIGINT) AS shared
                  FROM hh a JOIN hh b ON a.h = b.h AND a.s_ < b.s_
                  GROUP BY a.s_, b.s_)
            SELECT source_a, source_b, shared, x.n AS n_a, y.n AS n_b,
                   round(CAST(shared AS DOUBLE)
                         / CAST(least(x.n, y.n) AS DOUBLE), 6) AS containment
            FROM p JOIN sizes x ON p.source_a = x.s_
                   JOIN sizes y ON p.source_b = y.s_""",
    "doclen_histogram": f"""
            WITH d AS (SELECT CAST(length(regexp_extract_all(text,
                                '{TOKEN_RE_SQL}')) AS BIGINT) AS n
                       FROM documents),
            b AS (SELECT CAST(CASE WHEN n > 0 THEN length(bin(n))
                              ELSE 0 END AS INT) AS bucket, n FROM d)
            SELECT bucket,
                   CAST(CASE WHEN bucket > 0 THEN 1 << (bucket - 1)
                        ELSE 0 END AS BIGINT) AS lo_tokens,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n) AS BIGINT) AS total_tokens
            FROM b GROUP BY bucket""",
    "source_health": f"""
WITH per AS MATERIALIZED (
  SELECT source,
         CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS BIGINT)
           AS n_tok,
         CAST(length(text) AS BIGINT) AS n_chars,
         lang, sha256(text) AS sha
  FROM documents),
dup AS (SELECT source,
               CAST(sum(c) - count(*) AS BIGINT) AS n_dups
        FROM (SELECT source, sha, count(*) AS c FROM per
              GROUP BY source, sha) z
        GROUP BY source),
agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               round(avg(n_chars), 2) AS mean_chars,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        FROM per GROUP BY source)
SELECT a.source, a.n_docs, a.n_tokens, a.mean_chars, a.n_langs,
       d.n_dups, round(CAST(d.n_dups AS DOUBLE) / a.n_docs, 6) AS dup_rate
FROM agg a JOIN dup d ON a.source = d.source ORDER BY a.source""",
    "oov_stats": f"""
WITH tk AS MATERIALIZED (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
         AS BIGINT) % 2 AS half,
         unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
  FROM documents),
tv AS MATERIALIZED (SELECT DISTINCT token FROM tk WHERE half = 0),
ev AS MATERIALIZED (SELECT token FROM tk WHERE half = 1),
st AS (SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM tv) AS n_train_vocab,
  (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_eval_tokens,
  (SELECT CAST(count(*) AS BIGINT) FROM ev
   WHERE token NOT IN (SELECT token FROM tv)) AS n_oov)
SELECT n_train_vocab, n_eval_tokens, n_oov,
       CASE WHEN n_eval_tokens > 0
            THEN round(CAST(n_oov AS DOUBLE) / n_eval_tokens, 6)
            ELSE 0.0 END AS oov_rate
FROM st""",
    "chunk_dedup": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '[A-Za-z0-9_]+') AS ts
                       FROM documents),
            b AS (SELECT doc_id, ts, len(ts) AS n FROM t WHERE len(ts) > 0),
            c AS (SELECT doc_id, ts, n,
                         unnest(generate_series(0,
                           CAST((greatest(n - 64, 0) + 47) // 48 AS INT)))
                           AS chunk_idx
                  FROM b),
            ch AS (SELECT doc_id,
                          CAST(len(list_slice(ts, 1 + chunk_idx * 48,
                                              chunk_idx * 48 + 64)) AS BIGINT)
                            AS n_tokens,
                          array_to_string(list_slice(ts, 1 + chunk_idx * 48,
                                                     chunk_idx * 48 + 64), ' ')
                            AS chunk
                   FROM c)
            SELECT sha256(chunk) AS chunk_sha,
                   CAST(count(*) AS BIGINT) AS n_copies,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   min(doc_id) AS min_doc,
                   CAST(sum(n_tokens) - max(n_tokens) AS BIGINT) AS dup_tokens
            FROM ch GROUP BY sha256(chunk) HAVING count(*) > 1""",
    "corpus_curation": _sql_curation(),
    "doc_fingerprint": _sql_doc_fingerprint(),
    "lang_distribution": "SELECT lang, CAST(count(*) AS BIGINT) AS n "
        "FROM documents GROUP BY lang",
    "lang_id": _sql_lang_id(),
    "ngram_jaccard_dups": f"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
                       FROM documents),
            sh AS (SELECT doc_id,
                     CASE WHEN length(toks) >= 3 THEN
                       list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, length(toks) - 1)])
                     ELSE [array_to_string(toks, ' ')] END AS sh
                   FROM t)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   round(length(list_intersect(a.sh, b.sh))
                         / greatest(length(a.sh) + length(b.sh)
                                    - length(list_intersect(a.sh, b.sh)), 1), 6)
                     AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE round(length(list_intersect(a.sh, b.sh))
                        / greatest(length(a.sh) + length(b.sh)
                                   - length(list_intersect(a.sh, b.sh)), 1), 6) >= 0.5""",
    "token_count": f"""
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS BIGINT)
                     AS n_tokens
            FROM documents""",
    "text_quality": f"""
            WITH t AS (SELECT doc_id, text,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
                       FROM documents)
            SELECT doc_id,
              CAST(length(text) AS BIGINT) AS n_chars,
              CAST(length(toks) AS BIGINT) AS n_tokens,
              round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    / greatest(length(text), 1), 6) AS alpha_ratio,
              round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    / greatest(length(text), 1), 6) AS digit_ratio,
              round(length(regexp_replace(text, '[^ \t\n]', '', 'g'))
                    / greatest(length(text), 1), 6) AS space_ratio,
              round(length(regexp_extract_all(text, '{stop_re}'))
                    / greatest(length(toks), 1), 6) AS stopword_ratio,
              round(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
                    / greatest(length(toks), 1), 6) AS mean_token_len
            FROM t""",
    "quality_filter": f"""
            WITH t AS (SELECT doc_id, text,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
                       FROM documents),
            q AS (SELECT doc_id,
              CAST(length(toks) AS BIGINT) AS n_tokens,
              round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    / greatest(length(text), 1), 6) AS alpha_ratio,
              round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    / greatest(length(text), 1), 6) AS digit_ratio,
              round(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
                    / greatest(length(toks), 1), 6) AS mean_token_len
            FROM t)
            SELECT doc_id,
                   (n_tokens >= 8 AND alpha_ratio >= 0.45
                    AND digit_ratio <= 0.3
                    AND mean_token_len >= 2.0
                    AND mean_token_len <= 12.0) AS keep
            FROM q""",
    "readability_cli": """
WITH per AS (
  SELECT source,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
              AS BIGINT) AS lt,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+'))
              AS BIGINT) AS wd,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS st
  FROM documents),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(lt) AS BIGINT) AS letters,
             CAST(sum(wd) AS BIGINT) AS words,
             CAST(sum(st) AS BIGINT) AS sentences
      FROM per GROUP BY source)
SELECT source, n_docs, letters, words, sentences,
       round(0.0588 * (CAST(letters AS DOUBLE) / words * 100)
             - 0.296 * (CAST(sentences AS DOUBLE) / words * 100)
             - 15.8, 6) AS cli
FROM a ORDER BY source""",
    "lang_source_chisq": """
WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
           FROM documents GROUP BY 1, 2),
rm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rm FROM c GROUP BY 1),
cm AS (SELECT source, CAST(sum(o) AS BIGINT) AS cm FROM c GROUP BY 1),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
p AS (SELECT
  CAST(round((c.o - rm.rm * cm.cm / CAST(nn.n AS DOUBLE))
             * (c.o - rm.rm * cm.cm / CAST(nn.n AS DOUBLE))
             / (rm.rm * cm.cm / CAST(nn.n AS DOUBLE)), 9)
       AS DECIMAL(38, 9)) AS t,
  CAST(round(rm.rm * cm.cm / CAST(nn.n AS DOUBLE), 9)
       AS DECIMAL(38, 9)) AS e
  FROM c JOIN rm ON c.lang = rm.lang
  JOIN cm ON c.source = cm.source, nn),
dims AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS nr,
                CAST(count(DISTINCT source) AS BIGINT) AS nc FROM c)
SELECT nn.n AS n, dims.nr AS n_langs, dims.nc AS n_sources,
       CAST((dims.nr - 1) * (dims.nc - 1) AS BIGINT) AS dof,
       CAST(round(sum(p.t) + (nn.n - sum(p.e)), 6) AS DOUBLE) AS chi2
FROM p, nn, dims GROUP BY nn.n, dims.nr, dims.nc""",
    "length_qq_table": """
WITH a AS (SELECT n_chars AS v,
                  row_number() OVER (ORDER BY n_chars) AS rn
           FROM documents WHERE source = 'src0'),
b AS (SELECT n_chars AS v,
             row_number() OVER (ORDER BY n_chars) AS rn
      FROM documents WHERE source = 'src1'),
na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM a),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
q AS (SELECT CAST(range AS INT) AS decile FROM range(0, 11))
SELECT q.decile, a.v AS len_src0, b.v AS len_src1
FROM q
JOIN na ON true JOIN nb ON true
JOIN a ON a.rn = (q.decile * (na.n - 1)) // 10 + 1
JOIN b ON b.rn = (q.decile * (nb.n - 1)) // 10 + 1
ORDER BY q.decile""",
    "casing_profile": """
WITH per AS (SELECT source,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS w,
  CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+'),
       x -> regexp_matches(x, '^[a-z]+$'))) AS BIGINT) AS lo,
  CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+'),
       x -> regexp_matches(x, '^[A-Z][a-z]+$'))) AS BIGINT) AS ti,
  CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+'),
       x -> regexp_matches(x, '^[A-Z]{2,}$'))) AS BIGINT) AS up
  FROM documents),
a AS (SELECT source, CAST(sum(w) AS BIGINT) AS n_words,
             CAST(sum(lo) AS BIGINT) AS n_lower,
             CAST(sum(ti) AS BIGINT) AS n_title,
             CAST(sum(up) AS BIGINT) AS n_allcaps
      FROM per GROUP BY source)
SELECT source, n_words, n_lower, n_title, n_allcaps,
       round(CAST(n_lower AS DOUBLE) / n_words, 6) AS lower_frac,
       round(CAST(n_title AS DOUBLE) / n_words, 6) AS title_frac,
       round(CAST(n_allcaps AS DOUBLE) / n_words, 6) AS allcaps_frac
FROM a ORDER BY source""",
    "token_length_profile": """
WITH t AS (SELECT source,
                  unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                    AS tk
           FROM documents),
per AS (SELECT source, CAST(length(tk) AS BIGINT) AS l FROM t)
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(l) AS BIGINT) AS total_chars,
       CAST(max(l) AS BIGINT) AS max_len,
       CAST(sum(CASE WHEN l > 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_long,
       round(CAST(sum(l) AS DOUBLE) / count(*), 6) AS mean_len,
       round(CAST(sum(CASE WHEN l > 10 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS long_frac
FROM per GROUP BY source ORDER BY source""",
}
