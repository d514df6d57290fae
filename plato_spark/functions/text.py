"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are JVM built-ins (regexp_*, length, split — whole-stage
codegen); only language-ID uses a pandas UDF (Arrow-batched numpy, never
per-row Python). Where a DuckDB-oracle exists the exact expression is
mirrored in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

TOKEN_RE = "[A-Za-z0-9_]+"
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]


# -- portable 64-bit hash family (identical in Spark SQL and DuckDB SQL) ----
#
# h1 = first 14 hex chars of md5  (56-bit), h2 = hex chars 18..30 (52-bit);
# the i-th hash of the family is h1 + i*h2 (Kirsch-Mitzenmacher double
# hashing; i <= 64 keeps the sum < 2^59, no overflow, no modulus needed).
# Spark evaluates md5/conv JVM-side (whole-stage codegen); DuckDB mirrors it
# with CAST(('0x' || substr(md5(s), ...)) AS BIGINT), so sketch queries
# (minhash/simhash/fingerprint) become value-checkable against SQL oracles.

def portable_h1(col: Column) -> Column:
    """56-bit integer from md5 hex chars [1,14] — JVM-side, engine-portable."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def portable_h2(col: Column) -> Column:
    """52-bit integer from md5 hex chars [18,13] — independent of h1."""
    return F.conv(F.substring(F.md5(col), 18, 13), 16, 10).cast("long")


PORTABLE_H1_SQL = "CAST(('0x' || substr(md5({s}), 1, 14)) AS BIGINT)"
PORTABLE_H2_SQL = "CAST(('0x' || substr(md5({s}), 18, 13)) AS BIGINT)"


def token_count_col(text: Column) -> Column:
    """Word-ish token count (BPE-ish alnum runs), JVM-side."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0))).cast("long")


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality heuristics: length, token count, alpha/digit/
    space/punct ratios, stopword ratio, mean token length.

    Returns (id, n_chars, n_tokens, alpha_ratio, digit_ratio, space_ratio,
    stopword_ratio, mean_token_len) — all ratios rounded to 6dp so results
    hash-stably across engines.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    toks = F.regexp_extract_all(t, F.lit(TOKEN_RE), F.lit(0))
    n_tokens = F.size(toks).cast("long")
    n_alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(t, "[^0-9]", ""))
    n_space = F.length(F.regexp_replace(t, "[^ \\t\\n]", ""))
    stop_re = "(?i)\\b(" + "|".join(STOPWORDS) + ")\\b"
    n_stop = F.size(F.regexp_extract_all(t, F.lit(stop_re), F.lit(0))).cast("long")
    safe = F.greatest(n_chars, F.lit(1))
    safe_tok = F.greatest(n_tokens, F.lit(1))
    tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_alpha / safe, 6).alias("alpha_ratio"),
        F.round(n_digit / safe, 6).alias("digit_ratio"),
        F.round(n_space / safe, 6).alias("space_ratio"),
        F.round(n_stop / safe_tok, 6).alias("stopword_ratio"),
        F.round(tok_chars / safe_tok, 6).alias("mean_token_len"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 8,
    min_alpha_ratio: float = 0.45,
    max_digit_ratio: float = 0.3,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
) -> DataFrame:
    """(id, keep) — the KEEP/DROP gate of a training-data pipeline.

    Thresholds over the text_quality heuristics (C4/Gopher-style rules:
    too-short, too-numeric, gibberish-token docs are dropped). Comparisons
    run on the 6dp-rounded ratios so the decision is engine-portable.
    Pure whole-stage-codegen projection — zero exchanges at any scale.
    """
    q = text_quality(df, text_col, id_col)
    keep = (
        (F.col("n_tokens") >= F.lit(min_tokens))
        & (F.col("alpha_ratio") >= F.lit(min_alpha_ratio))
        & (F.col("digit_ratio") <= F.lit(max_digit_ratio))
        & (F.col("mean_token_len") >= F.lit(min_mean_token_len))
        & (F.col("mean_token_len") <= F.lit(max_mean_token_len))
    )
    return q.select(F.col(id_col), keep.alias("keep"))


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    shingle: int = 4, hash_impl: str = "xxhash64") -> DataFrame:
    """Deterministic document fingerprint: min hash over token
    ``shingle``-grams (winnowing-style rolling hash; JVM-side).

    hash_impl: "xxhash64" (fastest; Spark-specific) or "portable" (md5-based
    56-bit family, identical in DuckDB SQL — the oracle-checked path).
    Documents shorter than ``shingle`` tokens fall back to hashing the whole
    token array. Returns (id, fingerprint: long).
    """
    hash_fn = F.xxhash64 if hash_impl == "xxhash64" else portable_h1
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(shingle - 1), F.lit(1))),
        lambda i: hash_fn(F.concat_ws("", F.slice(toks, i, shingle))),
    )
    return df.select(
        F.col(id_col),
        F.array_min(grams).alias("fingerprint"),
    )


# -- language identification (character n-gram heuristic) -------------------

_LANG_PROFILES = {
    # tiny, deterministic character-trigram profiles; a real deployment
    # would load fastText/CLD3 — out of scope for this sandbox, but the
    # Spark-side plumbing (Arrow batch -> numpy scoring) is the real shape.
    "en": [" th", "the", "he ", " an", "and", "ing", " of", "ion"],
    "de": ["en ", "er ", "ch ", "der", "ein", "sch", "ich", "und"],
    "fr": ["es ", "de ", " de", "le ", "ent", "que", "la ", "ion"],
    "code": ["();", " = ", "def", "int", "for", "::", "=> ", "#in"],
}


def lang_id_ngram(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred) via character n-gram profile scoring (vectorized)."""
    profiles = {k: list(v) for k, v in _LANG_PROFILES.items()}
    langs = sorted(profiles)

    @pandas_udf("string")
    def _score(texts: pd.Series) -> pd.Series:
        lowered = texts.fillna("").str.lower()
        scores = np.zeros((len(texts), len(langs)), dtype=np.int64)
        for j, lang in enumerate(langs):
            for gram in profiles[lang]:
                scores[:, j] += lowered.str.count(
                    gram.replace("(", "\\(").replace(")", "\\)")
                    .replace("=", "\\=").replace("#", "\\#").replace("|", "\\|")
                ).to_numpy(dtype=np.int64)
        # dtype=object: a fixed-width '<U4' array would truncate "unknown"
        best = np.asarray(langs, dtype=object)[np.argmax(scores, axis=1)]
        best[scores.max(axis=1) == 0] = "unknown"
        return pd.Series(best)

    return df.select(F.col(id_col), _score(F.col(text_col)).alias("lang_pred"))


def repetition_ratio(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, repetition: double 6dp) — 1 - distinct/total
    tokens (type-token redundancy), the cheap repetition signal used to
    drop boilerplate/spam from LLM training corpora. Zero tokens -> 0.0.
    All JVM built-ins (regexp_extract_all + array_distinct), exactly
    mirrorable in SQL."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    n = F.size(toks)
    rep = F.when(
        n > 0,
        F.round(1.0 - F.size(F.array_distinct(toks)) / n, 6),
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        rep.alias("repetition"),
    )


# PII / URL patterns kept deliberately simple and dialect-portable (the
# same pattern string must compile identically under Java regex and
# DuckDB RE2 so the oracle can mirror the op exactly)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[A-Za-z0-9./_%+~#-]+"
IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_emails, n_urls, n_ips, clean) — count and redact the
    three cheap PII classes a training-data pipeline scrubs first.
    Replacement tokens are <EMAIL>/<URL>/<IP>; counts are pre-redaction.
    URLs are redacted before IPs so an IP inside a URL counts once.
    All JVM regex built-ins, one projection, no shuffle."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    n_urls = F.size(F.regexp_extract_all(t, F.lit(URL_RE), F.lit(0)))
    clean1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    clean2 = F.regexp_replace(clean1, URL_RE, "<URL>")
    n_ips = F.size(F.regexp_extract_all(clean2, F.lit(IPV4_RE), F.lit(0)))
    clean3 = F.regexp_replace(clean2, IPV4_RE, "<IP>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_emails.cast("long").alias("n_emails"),
        n_urls.cast("long").alias("n_urls"),
        n_ips.cast("long").alias("n_ips"),
        clean3.alias("clean"),
    )


def vocabulary_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 200,
) -> DataFrame:
    """(token, tf, df) — the ``top_k`` corpus tokens by total frequency.

    The vocabulary-building step of a tokenizer/training pipeline: term
    frequency (total occurrences) and document frequency (distinct docs)
    per token, keeping the head of the distribution.

    Plan shape: one explode + one map-side-combined groupBy(token), then a
    global top-k. Spark compiles ``orderBy(...).limit(k)`` to
    TakeOrderedAndProject — each shuffle partition keeps only its local
    top-k, so no full sort ever materializes; at 100 TB the reduce side
    sees num_partitions * k rows, not |vocab|. Tie-break (tf desc, token
    asc) is a total order because token is the group key, so the selected
    set is deterministic and oracle-checkable.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.count_distinct("id").cast("long").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(top_k)
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """(doc_id, token, tf, score, rank) — the ``top_k`` keywords per
    document by tf-idf.

    Scoring uses the RAW inverse document frequency, score = tf * N / df,
    instead of the logarithmic variant: the ranking it induces per
    document is the same monotone order for fixed tf, and the value is a
    single IEEE division of exact integers — bit-identical across
    engines, unlike ln()/log() whose libm implementations differ between
    the JVM and DuckDB (which would break value-level oracle checks).

    Plan shape: one explode + groupBy(doc, token) with map-side combine
    for tf; df derived from the tf rows by a second groupBy(token) (small
    — vocab-sized — so Catalyst broadcasts it back; at web scale it
    degrades to a shuffle join); then a per-document window top-k, whose
    partitions are bounded by document length, never by corpus size.
    Tie-break (score desc, token asc) is a total order per document.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    n_docs = df.select(F.col(id_col)).distinct().count()
    scored = tf.join(dfreq, "token").select(
        "doc_id",
        "token",
        "tf",
        F.round(
            (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df"), 6
        ).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
    )


def domain_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(domain, n_docs, n_urls) — URL host frequency across the corpus
    (source-mix analysis / domain blocklists). One explode + one
    map-side-combined groupBy; domain = host of each http(s) URL."""
    urls = df.select(
        F.col("doc_id"),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(0))).alias("url"),
    )
    dom = urls.select(
        "doc_id",
        F.regexp_extract("url", "https?://([A-Za-z0-9.-]+)", 1).alias("domain"),
    ).where(F.col("domain") != "")
    return dom.groupBy("domain").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_urls"),
    )


def ngram_vocabulary(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 200,
) -> DataFrame:
    """(gram, tf, df) — the ``top_k`` word n-grams by total frequency.

    The n-gram LM / tokenizer-merge statistics step of a training
    pipeline.  Grams are built JVM-side from the token array with
    ``transform(sequence(...), i -> concat_ws(' ', slice(ts, i, n)))`` —
    no Python UDF, overlapping windows included (a regexp scan cannot
    produce overlapping matches).  Same TakeOrderedAndProject top-k plan
    as :func:`vocabulary_stats` (per-partition top-k, no global sort);
    (tf desc, gram asc) is a total order, so deterministic.
    """
    d = df.select(
        F.col(id_col).alias("id"),
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0)).alias("ts"),
    )
    grams = d.select(
        "id",
        F.explode(
            F.expr(
                f"CASE WHEN size(ts) >= {n} THEN "
                f"transform(sequence(1, size(ts) - {n - 1}), "
                f"i -> concat_ws(' ', slice(ts, i, {n}))) "
                "ELSE array() END"
            )
        ).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.count_distinct("id").cast("long").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("gram"))
        .limit(top_k)
    )


def chunk_documents(
    df: DataFrame,
    chunk: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk) — fixed-token-window splits
    with overlap: chunk j covers tokens [1 + j*stride, ... + chunk).

    The context-window packing step that turns documents into training
    sequences.  Chunk count per doc is 1 + ceil(max(n_tok - chunk, 0) /
    stride) (empty docs produce no chunks), so every token is covered and
    consecutive chunks overlap by ``chunk - stride`` tokens.  Entirely
    JVM-side (token array + transform/slice/explode — one narrow stage,
    no shuffle at all until a downstream op needs one); at 100 TB this is
    an embarrassingly parallel map over the corpus scan.
    """
    if not (0 < stride <= chunk):
        raise ValueError("need 0 < stride <= chunk")
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0)).alias("ts"),
    ).withColumn("n", F.size("ts"))
    # j ranges over 0..(n-chunk+stride-1) div stride for n>0
    parts = d.where(F.col("n") > 0).select(
        "doc_id",
        "n",
        "ts",
        F.explode(
            F.expr(
                f"sequence(0, CAST((greatest(n - {chunk}, 0) + {stride} - 1) "
                f"DIV {stride} AS INT))"
            )
        ).alias("chunk_idx"),
    )
    sliced = F.expr(f"slice(ts, 1 + chunk_idx * {stride}, {chunk})")
    return parts.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(sliced).cast("long").alias("n_tokens"),
        F.concat_ws(" ", sliced).alias("chunk"),
    )


def chunk_dedup_stats(
    df: DataFrame,
    chunk: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk-level (paragraph-grain) exact-duplicate clusters:
    (chunk_sha, n_copies, n_docs, min_doc, dup_tokens) for every chunk
    text that occurs more than once in the corpus.

    Finer-grained than document dedup — catches boilerplate paragraphs,
    licence headers and mirrored passages that whole-document sha256
    misses because the surrounding text differs.  ``dup_tokens`` is the
    token mass that chunk-level dedup would remove (copies beyond the
    first), the number a curation pipeline reports as its savings.

    100 TB shape: chunking is a narrow map over the corpus scan
    (:func:`chunk_documents`); only fixed-width sha256 digests + counts
    enter the one aggregation shuffle — chunk text itself is hashed
    map-side and never shuffled.
    """
    ch = chunk_documents(df, chunk=chunk, stride=stride,
                         text_col=text_col, id_col=id_col)
    agg = (
        ch.groupBy(F.sha2(F.col("chunk"), 256).alias("chunk_sha"))
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            (F.sum("n_tokens") - F.max("n_tokens")).alias("dup_tokens"),
        )
    )
    return agg.where(F.col("n_copies") > 1).select(
        "chunk_sha",
        F.col("n_copies").cast("long").alias("n_copies"),
        F.col("n_docs").cast("long").alias("n_docs"),
        "min_doc",
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
    )


def oov_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """One row (n_train_vocab, n_eval_tokens, n_oov, oov_rate) — split
    the corpus into train/eval halves by the portable doc-id hash
    (functions/sampling discipline), build the train vocabulary, and
    measure the eval half's out-of-vocabulary token mass.  The
    tokenizer-coverage check run before freezing a vocab/BPE on a
    training corpus; exact integer counts + one rounded division."""
    half = F.pmod(portable_h1(F.col(id_col).cast("string")), F.lit(2))
    toks = df.select(
        half.alias("half"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    train_vocab = toks.where(F.col("half") == 0).select("token").distinct()
    train_vocab = train_vocab.persist()
    evals = toks.where(F.col("half") == 1)
    n_vocab = train_vocab.count()
    n_eval = evals.count()
    n_oov = evals.join(train_vocab, "token", "left_anti").count()
    spark = df.sparkSession
    train_vocab.unpersist()
    out = spark.createDataFrame(
        [(n_vocab, n_eval, n_oov)],
        "n_train_vocab long, n_eval_tokens long, n_oov long",
    )
    return out.select(
        "*",
        F.when(F.col("n_eval_tokens") > 0,
               F.round(F.col("n_oov") / F.col("n_eval_tokens"), 6))
        .otherwise(F.lit(0.0)).alias("oov_rate"),
    )


def unigram_commonness(
    df: DataFrame,
    rare_threshold: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, mean_tf, rare_ratio) — unigram-LM document
    quality scoring against the corpus's own token distribution.

    The classic LM-perplexity filter (score each document by a language
    model trained on the corpus and drop the tails) needs log-probability
    sums — float folds whose accumulation order differs between engines,
    and ln() itself differs between libm implementations (the tfidf
    lesson above).  This operator keeps the ranking signal but stays in
    exact arithmetic:

      * ``mean_tf``    = (sum of corpus-wide counts of the doc's tokens)
                         / n_tokens — the arithmetic-mean unigram
                         frequency, a monotone commonness score (the
                         log-domain geometric mean is what perplexity
                         uses; the arithmetic mean ranks gibberish and
                         boilerplate the same direction).  Integer sum,
                         ONE division at read-out.
      * ``rare_ratio`` = share of the doc's tokens whose corpus count is
                         < ``rare_threshold`` — the OOV-ish tail mass
                         that perplexity filters key on.

    Plan shape: one explode -> groupBy(token) vocab count (map-side
    combined, vocab-sized result) -> join back (vocab is small relative
    to the token stream; Catalyst broadcasts it under the threshold, and
    at 100 TB it degrades to a shuffle join on token — still one
    shuffle) -> groupBy(doc).  No floats until the final two divisions.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    vocab = toks.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    per_doc = (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("cnt").cast("long").alias("tf_sum"),
            F.sum(
                F.when(F.col("cnt") < rare_threshold, 1).otherwise(0)
            ).cast("long").alias("n_rare"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("tf_sum").cast("double") / F.col("n_tokens"), 6)
        .alias("mean_tf"),
        F.round(F.col("n_rare").cast("double") / F.col("n_tokens"), 6)
        .alias("rare_ratio"),
    )


def pmi_collocations(
    df: DataFrame,
    top_k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(w1, w2, pair_n, lift, rank) — the ``top_k`` adjacent-token
    collocations by PMI lift (multiword-expression mining for tokenizer
    vocab construction / dedup shingle design).

    PMI(a,b) = log( N * c(a,b) / (c(a) * c(b)) ); log is monotone, so
    ranking by the RAW LIFT ratio N*c(ab)/(c(a)*c(b)) induces the same
    order while staying a single IEEE division of exact integers —
    bit-identical across engines (same trick as tfidf_keywords' raw
    idf).  Pairs below ``min_count`` are dropped first (the standard PMI
    rare-pair correction: a 1-occurrence pair of two rare tokens
    otherwise tops the list).

    Plan shape: one explode into adjacent pairs (JVM transform over the
    token array — no Python), one map-side-combined groupBy(pair), one
    vocab groupBy, two joins against the (small) unigram table, then a
    global top-k compiled to TakeOrderedAndProject (per-partition local
    top-k; the reduce side sees partitions*k rows).  Tie-break (lift
    desc, w1, w2) is a total order.
    """
    toks = df.select(
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        .alias("ts")
    )
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("ts") >= 2,
                F.transform(
                    F.slice("ts", 1, F.size("ts") - 1),
                    lambda x, i: F.struct(
                        x.alias("w1"), F.element_at("ts", i + 2).alias("w2")
                    ),
                ),
            ).otherwise(F.array()),
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token")
    ).groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    pair_n = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("pair_n"))
        .where(F.col("pair_n") >= min_count)
    )
    n_pairs = pairs.count()
    scored = (
        pair_n.join(uni.select(F.col("token").alias("w1"),
                               F.col("cnt").alias("c1")), "w1")
        .join(uni.select(F.col("token").alias("w2"),
                         F.col("cnt").alias("c2")), "w2")
        .select(
            "w1", "w2", "pair_n",
            F.round(
                (F.col("pair_n") * F.lit(n_pairs)).cast("double")
                / (F.col("c1") * F.col("c2")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
    ranked = scored.orderBy(
        F.desc("lift"), F.asc("w1"), F.asc("w2")
    ).limit(top_k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
    return ranked.withColumn("rank", F.row_number().over(w).cast("int"))


def boilerplate_lines(
    df: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(line_sha, n_docs, n_occurrences, line_len) — non-trivial text
    lines shared by >= ``min_docs`` distinct documents: headers, footers,
    license banners, navigation chrome — the line-level boilerplate a
    curation pipeline strips before training (the paragraph-dedup leg of
    C4/RefinedWeb-style cleaning, at line granularity).

    Exact and scale-safe: lines split JVM-side, trimmed, length-filtered
    (>= 16 chars: drops blank/brace-only lines), then ONE
    map-side-combined groupBy over sha256 digests — like exact dedup,
    only 64-byte hashes shuffle, never the line text.  ``line_len`` is
    max(length) per sha (constant per sha by collision-freeness) so the
    report carries size without shipping content.
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    ).select(
        "doc_id", F.trim(F.col("raw")).alias("line")
    ).where(F.length("line") >= 16)
    return (
        lines.select(
            "doc_id",
            F.sha2(F.col("line"), 256).alias("line_sha"),
            F.length("line").alias("line_len"),
        )
        .groupBy("line_sha")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
            F.max("line_len").cast("int").alias("line_len"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def doclen_histogram(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """(bucket, lo_tokens, n_docs, total_tokens) — log2-bucketed document
    token-length distribution (the length histogram every curation
    dashboard opens with: truncation policy, packing efficiency, and
    short-doc filters all read off it).

    Bucket = bit length of the token count (floor(log2(n))+1, bucket 0 =
    empty docs) — computed as length(bin(n)), a pure INTEGER derivation
    both engines share bit-for-bit, because floor(log2(x)) through libm
    doubles can mis-round at exact powers of two (the no-ln discipline).
    ``lo_tokens`` = the bucket's inclusive lower bound 2^(bucket-1).
    One projection + one map-side-combined groupBy over <= 64 buckets.
    """
    n = token_count_col(F.col(text_col))
    b = F.when(n > 0, F.length(F.bin(n))).otherwise(F.lit(0)).cast("int")
    return (
        df.select(b.alias("bucket"), n.alias("n_tokens"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "bucket",
            # shiftleft with a COLUMN shift count needs the SQL form
            # (the python F.shiftleft only takes a literal int numBits)
            F.when(F.col("bucket") > 0,
                   F.expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)"))
            .otherwise(F.lit(0)).cast("long").alias("lo_tokens"),
            "n_docs", "total_tokens",
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos, fp) — robust-winnowing fingerprint selection (Schleimer,
    Wilkerson & Aiken, SIGMOD'03 — the MOSS kernel): hash every token
    ``k``-gram, slide a window of ``w`` consecutive gram hashes, and in
    each window select the MINIMUM hash, breaking ties by the RIGHTMOST
    position; the distinct selected (position, hash) pairs are the
    document's fingerprints.

    Guarantee: any token-level match of length >= w + k - 1 between two
    documents shares at least one fingerprint, while only ~2/(w+1) of all
    gram hashes are retained — the density/recall trade-off that makes
    winnowed copy-detection indexes fit in memory at corpus scale.

    Plan shape: everything is JVM higher-order functions over the token
    array (transform/slice/array_min/array_position — whole-stage
    codegen, zero Python, zero shuffle until the final per-doc
    distinct, which map-side combines).  Documents shorter than k
    tokens hash the whole token array as one gram; documents with fewer
    than w grams use a single clamped window (both mirrored verbatim by
    the DuckDB oracle).  Positions are 1-based gram indices.
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(m - F.lit(k - 1), F.lit(1))),
        lambda i: portable_h1(F.concat_ws("", F.slice(toks, i, k))),
    )
    g = F.col("grams")
    n_win = F.greatest(F.size(g) - F.lit(w - 1), F.lit(1))
    win = lambda s: F.slice(g, s, w)  # noqa: E731 — clamped at the tail
    # rightmost argmin: first occurrence in the REVERSED window
    sel = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda s: F.struct(
            (s + F.size(win(s))
             - F.array_position(F.reverse(win(s)), F.array_min(win(s))))
            .cast("long").alias("pos"),
            F.array_min(win(s)).alias("fp"),
        ),
    )
    return (
        df.select(F.col(id_col).alias("id"), grams.alias("grams"))
        .select("id", F.explode(sel).alias("s"))
        .select("id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
        .distinct()
    )


def hapax_stats(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(source, n_tokens, n_types, n_hapax, type_token_ratio,
    hapax_ratio) — per-source vocabulary-growth profile: total token
    mass, distinct types, hapax legomena (types occurring exactly once)
    and the derived ratios.

    The Heaps/Zipf health check run before tokenizer training: a source
    whose hapax_ratio collapses is template spam (tiny effective
    vocabulary); one whose type_token_ratio ~ 1 is id-like noise.  Plan:
    one explode + one (group, token) count (map-side combined) + one
    per-group fold — exact integers, two rounded divisions at read-out.
    """
    toks = F.explode(
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    )
    c = (
        df.select(F.col(group_col).alias("source"), toks.alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        c.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("long").alias("n_hapax"),
        )
        .select(
            "source", "n_tokens", "n_types", "n_hapax",
            F.round(
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double"), 6
            ).alias("type_token_ratio"),
            F.round(
                F.col("n_hapax").cast("double")
                / F.col("n_types").cast("double"), 6
            ).alias("hapax_ratio"),
        )
    )


def source_style_divergence(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    top_k: int = 200,
) -> DataFrame:
    """(source, n_tokens, tv) — total-variation distance between each
    source's unigram distribution and the whole-corpus distribution,
    over the global top-``top_k`` vocabulary plus one residual bucket
    (so both sides are true probability distributions).  The
    domain-mixing audit run before blending sources: TV near 0 means
    the source reads like the corpus, TV near 1 means it is stylistic
    foreign matter (cf. the Sinkhorn blend weights, which balance
    VOLUME — this measures STYLE).

    TV chosen over KL precisely because it needs no ln(): with
    N = corpus tokens, N_s = source tokens, C_i / c_si the term counts,

        tv_s = ( sum_i |c_si*N - C_i*N_s| + |rest_s*N - rest*N_s| )
               / (2 * N_s * N)

    is exact BIGINT until one rounded division per source.  Overflow
    bound: N_s*N must stay below 2^63 (~9e18) — safe to ~3e9 total
    tokens; beyond that switch the per-term fold to doubles (the
    denominators dwarf rounding there).  Vocabulary selection is the
    TakeOrdered total order (tf DESC, token ASC) of vocabulary_stats.

    Plan: one explode + two map-side-combined groupBys, a broadcast of
    the 200-row vocab crossed with the |sources|-row totals (so absent
    terms contribute |0 - C_i*N_s| instead of silently vanishing), one
    left join.  Nothing larger than |sources| * top_k rows after the
    token aggregations.
    """
    toks = df.select(
        F.col(source_col).alias("source"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    gcounts = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("gc"))
    vocab = gcounts.orderBy(F.desc("gc"), F.asc("token")).limit(top_k)
    scounts = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("sc")
    )
    stotals = scounts.groupBy("source").agg(
        F.sum("sc").cast("long").alias("ns")
    )
    gtotal = gcounts.agg(F.sum("gc").cast("long").alias("n"))

    # every (source, vocab-term) cell, zero-filled
    cells = (
        stotals.crossJoin(F.broadcast(vocab))
        .join(scounts, ["source", "token"], "left")
        .select(
            "source",
            "ns",
            "gc",
            F.coalesce(F.col("sc"), F.lit(0)).cast("long").alias("sc"),
        )
    )
    per_source = cells.crossJoin(F.broadcast(gtotal)).groupBy(
        "source", "ns", "n"
    ).agg(
        F.sum(F.abs(F.col("sc") * F.col("n") - F.col("gc") * F.col("ns")))
        .cast("long")
        .alias("head_num"),
        F.sum("sc").cast("long").alias("head_sc"),
        F.sum("gc").cast("long").alias("head_gc"),
    )
    return per_source.select(
        "source",
        F.col("ns").alias("n_tokens"),
        F.round(
            (
                F.col("head_num")
                + F.abs(
                    (F.col("ns") - F.col("head_sc")) * F.col("n")
                    - (F.col("n") - F.col("head_gc")) * F.col("ns")
                )
            ).cast("double")
            / (2.0 * F.col("ns").cast("double") * F.col("n").cast("double")),
            6,
        ).alias("tv"),
    )


def inverted_postings(
    df: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(token, doc_id, pos) — positional inverted-index postings for the
    ``top_k`` corpus tokens by total frequency: the search-index build
    step of a retrieval pipeline, exploded to rows (never a positions
    ARRAY — the embedding_project canonicalizer lesson).

    Plan: one posexplode (JVM regexp tokenization), one
    map-side-combined groupBy for the vocabulary head, a
    TakeOrderedAndProject top-k under the (tf DESC, token ASC) total
    order, and a broadcast semi-join of that k-row head back against
    the token stream — the postings shuffle carries only the selected
    tokens' occurrences.  ``pos`` is the 1-based token index within the
    document's token sequence."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("pos0", "token"),
    )
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(top_k)
        .select("token")
    )
    return toks.join(F.broadcast(top), "token").select(
        "token", "doc_id", (F.col("pos0") + 1).cast("long").alias("pos")
    )


def corpus_card(docs: DataFrame) -> DataFrame:
    """One row (n_docs, n_sources, n_langs, total_tokens, total_chars,
    avg_tokens, dup_docs, dup_pct, empty_docs) — the dataset-card
    headline block: the numbers every corpus README leads with,
    computed in ONE pass (single map-side-combined aggregation; the
    md5-distinct for the dup rate is the only extra fold and it moves
    16-byte digests, never bodies).

    Exact integer counts everywhere; the two ratios are one rounded
    IEEE division each."""
    t = docs.select(
        "source", "lang",
        token_count_col(F.col("text")).alias("tk"),
        F.col("n_chars").cast("long").alias("nc"),
        F.md5(F.col("text")).alias("h"),
        (F.length(F.col("text")) == 0).alias("empty"),
    )
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("tk").cast("long").alias("total_tokens"),
        F.sum("nc").cast("long").alias("total_chars"),
        F.countDistinct("h").cast("long").alias("uniq"),
        F.sum(F.when(F.col("empty"), 1).otherwise(0)).cast("long")
        .alias("empty_docs"),
    ).select(
        "n_docs", "n_sources", "n_langs", "total_tokens", "total_chars",
        F.round(F.col("total_tokens") / F.col("n_docs"), 6)
        .alias("avg_tokens"),
        (F.col("n_docs") - F.col("uniq")).cast("long").alias("dup_docs"),
        F.round((F.lit(100) * (F.col("n_docs") - F.col("uniq")))
                / F.col("n_docs"), 6).alias("dup_pct"),
        "empty_docs",
    )


def blocklist_hits(
    docs: DataFrame,
    terms: tuple = ("slow", "dup"),
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, docs_hit, n_hits, hit_pct) — blocklist audit per
    source: how many documents contain any blocked term, and how many
    total occurrences.  The coverage check run BEFORE wiring a term
    filter into curation (a blocklist that would nuke 40% of a source
    is a policy decision, not a filter).

    Plan: pure JVM higher-order functions over the token array — zero
    Python, zero joins, no shuffle before the per-source map-side-
    combined aggregation; the term list lives in the plan as an array
    literal (it is a config, not data).  Exact integer counts, one
    rounded division."""
    tl = F.array(*[F.lit(t) for t in terms])
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(tl, t)))
    t = docs.select(
        F.col(source_col).alias("source"),
        hits.alias("h"),
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("h") > 0, 1).otherwise(0)).cast("long")
            .alias("docs_hit"),
            F.sum("h").cast("long").alias("n_hits"),
        )
        .select(
            "source", "n_docs", "docs_hit", "n_hits",
            F.round((F.lit(100) * F.col("docs_hit")) / F.col("n_docs"), 6)
            .alias("hit_pct"),
        )
    )


def lang_concentration(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """(source, n_docs, n_langs, hhi) — Herfindahl-Hirschman language
    concentration per source: sum over languages of (share)^2, in
    (1/n_langs, 1] — 1.0 is a monolingual source, low values a mixed
    crawl.  The entropy-free concentration measure (no ln(), the
    cross-libm lesson): HHI = sum(c_i^2) / n^2 is exact integer
    cross-multiplication with ONE rounded division."""
    per = docs.groupBy(F.col(source_col).alias("source"),
                       F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    return (
        per.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        )
        .select(
            "source", "n_docs", "n_langs",
            F.round(F.col("ss") / (F.col("n_docs") * F.col("n_docs")), 6)
            .alias("hhi"),
        )
    )


def vocab_growth(
    docs: DataFrame,
    n_batches: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(batch, n_tokens, new_types, vocab_size) — the Heaps-law vocab
    growth curve: documents fall into ``n_batches`` deterministic
    hash batches (portable_h1 mod n — the stratified_sample policy, a
    reproducible stand-in for arrival order) and each batch reports its
    token mass, how many token TYPES appear for the first time, and the
    cumulative vocabulary.  Flattening new_types is the signal that a
    tokenizer/vocab freeze has seen enough corpus.

    Plan: one explode + a min-aggregation per type (its first batch),
    then a <= n_batches-row cumulative fold; exact integers."""
    h = portable_h1(F.concat(F.lit("vg|"), F.col(id_col).cast("string")))
    toks = docs.select(
        F.pmod(h, F.lit(int(n_batches))).cast("int").alias("batch"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"),
    )
    mass = toks.groupBy("batch").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"))
    first = toks.groupBy("token").agg(F.min("batch").alias("batch"))
    news = first.groupBy("batch").agg(
        F.count(F.lit(1)).cast("long").alias("new_types"))
    from pyspark.sql import Window

    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, 0)
    return (
        mass.join(news, "batch", "left")
        .select("batch", "n_tokens",
                F.coalesce("new_types", F.lit(0)).cast("long")
                .alias("new_types"))
        # <= n_batches rows: the single-partition window is bounded
        .withColumn("vocab_size",
                    F.sum("new_types").over(w).cast("long"))
    )


def vocab_coverage(
    docs: DataFrame,
    ks: tuple = (10, 100, 1000),
    text_col: str = "text",
) -> DataFrame:
    """(k, covered_tokens, total_tokens, coverage_pct) — what share of
    the corpus token MASS the top-k most frequent types cover (ties by
    token text): the Zipf head-coverage read-out behind vocab-size
    decisions (a 50k vocab covering 99.5% means the tail is UNK-noise).

    Plan: one map-side-combined type count, TakeOrdered top-max(k)
    under the (count DESC, token) total order, then per-k exact sums
    over <= max(k) rows; one rounded division per k."""
    spark = docs.sparkSession
    tc = (
        docs.select(F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = tc.agg(F.sum("n").cast("long").alias("total_tokens"))
    kmax = max(ks)
    top = tc.orderBy(F.desc("n"), F.asc("token")).limit(int(kmax))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, 0)
    ranked = top.select(
        "n", F.row_number().over(
            Window.orderBy(F.desc("n"), F.asc("token"))).alias("r"),
        F.sum("n").over(w).alias("cum"),
    )
    kdf = spark.createDataFrame([(int(k),) for k in ks], "k int")
    pick = (
        kdf.join(ranked, F.col("r") <= F.col("k"))
        .groupBy("k")
        .agg(F.max("cum").cast("long").alias("covered_tokens"))
    )
    return (
        pick.crossJoin(F.broadcast(tot))
        .select(
            "k", "covered_tokens", "total_tokens",
            F.round((F.lit(100) * F.col("covered_tokens"))
                    / F.col("total_tokens"), 6).alias("coverage_pct"),
        )
    )
