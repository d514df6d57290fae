"""Entry-registry queries: dedup domain (split from the former
monolithic __spark_entry__.py; round-5 manifest-ization).
"""

from __future__ import annotations

from plato_spark.entry.common import (  # noqa: F401
    DEDUP_THRESHOLDS,
    F,
    KMV_K,
    PORTABLE_H1_SQL,
    PORTABLE_H2_SQL,
    TOKEN_RE_SQL,
    _emb_double,
    _sql_ann_topk,
    _sql_dedup_clusters_lsh,
    _sql_dedup_savings,
    _sql_dedup_threshold_curve,
    _sql_dup_cross_sources,
    _sql_embedding_dedup,
    _sql_kmv_jaccard,
    _sql_lsh_ann,
    _sql_minhash_calibration,
    _sql_minhash_candidates,
    _sql_simhash,
    brute_force_topk,
    embedding_near_dup_clusters,
    exact_dedup,
    load_table,
    lsh_bucketed_neighbors_portable,
    lsh_candidate_pairs_portable,
    minhash_lsh_candidates,
    near_dup_clusters,
    simhash_near_dup_pairs,
    simhash_signatures_portable,
    threshold_neighbors,
)


def q_minhash_calibration(spark, sf_dir):
    """MinHash estimator audit on the LSH candidate pairs
    (functions/dedup.minhash_calibration): matching-slot fraction vs
    TRUE distinct-shingle Jaccard per pair — the empirical check that
    the 64-hash signature actually delivers its sqrt(J(1-J)/64)
    accuracy on THIS corpus.  Candidate-fed (never all-pairs), portable
    hash family, exact integer counts with three rounded divisions."""
    from plato_spark.functions.dedup import minhash_calibration

    return minhash_calibration(load_table(spark, sf_dir, "documents"))


def q_dedup_threshold_curve(spark, sf_dir):
    """The dedup threshold, swept: verified-Jaccard pair counts at
    0.3 / 0.5 / 0.7 / 0.9 over the LSH candidate set — the
    policy-decision curve behind every near-dup drop rule (a cliff
    between two thresholds means the corpus has a distinct duplication
    mode there; a plateau means the choice is safe).  Reuses the
    calibration kernel's exact integer intersections; candidate-fed."""
    from plato_spark.functions.dedup import minhash_calibration

    calib = minhash_calibration(load_table(spark, sf_dir, "documents"))
    qs = spark.createDataFrame([(t,) for t in DEDUP_THRESHOLDS],
                               "threshold double")
    return (
        calib.crossJoin(F.broadcast(qs))
        .groupBy("threshold")
        .agg(F.sum((F.col("jaccard") >= F.col("threshold"))
                   .cast("long")).cast("long").alias("n_pairs"))
    )


def q_ppjoin_pairs(spark, sf_dir):
    """EXACT set-similarity self-join via prefix filtering
    (functions/dedup.ppjoin_pairs, PPJoin): every token-set pair with
    Jaccard >= 0.95, no LSH recall loss — the deterministic complement
    to minhash_lsh_candidates.  The oracle computes the same pairs
    from the UNFILTERED all-token join, so the gate proves the prefix
    filter lossless on this corpus."""
    from plato_spark.functions.dedup import ppjoin_pairs

    return ppjoin_pairs(load_table(spark, sf_dir, "documents"),
                        threshold_pct=95)


def q_edit_distance_dups(spark, sf_dir):
    """Levenshtein-verified near-dup pairs over the MinHash-LSH
    candidate feed (functions/dedup.edit_distance_pairs) — the
    character-level final gate beside the token-level verifiers."""
    from plato_spark.functions.dedup import edit_distance_pairs

    return edit_distance_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.3
    )


def q_bloom_prune(spark, sf_dir):
    """Bloom-filter join-pruning audit (functions/sketches
    .bloom_probe_stats): portable md5 double-hashing filter over a
    third of the customer keys, probed by every ordering customer —
    exact realized false-positive count instead of the formula.
    m=2048/d=4 sized so the sf0.01 probe shows real false positives."""
    from plato_spark.functions.sketches import bloom_probe_stats

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 3 == 0
    )
    orders = load_table(spark, sf_dir, "orders")
    return bloom_probe_stats(
        cust, orders, "c_custkey", "o_custkey", m=2048, d=4
    )


def q_snm_candidates(spark, sf_dir):
    """Sorted-neighborhood near-dup candidates (functions/dedup
    .snm_candidates, Hernández-Stolfo 1995): window-8 pairs along the
    normalized 24-char-prefix sort order — the third blocking family
    beside MinHash-LSH and SimHash, catching prefix-anchored template
    dups hash blocking scatters.  Distributed rank via the vid-encoder
    range-sort idiom; the sliding window is two offset bucketings whose
    equi-joins are provably exact."""
    from plato_spark.functions.dedup import snm_candidates

    return snm_candidates(load_table(spark, sf_dir, "documents"))


def q_containment(spark, sf_dir):
    """Asymmetric shingle containment >= 0.8 (directed subset-duplication
    pairs; functions/dedup.containment_pairs, exact all-pairs baseline)."""
    from plato_spark.functions.dedup import containment_pairs

    return containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8, n=3
    )


def q_lsh_recall(spark, sf_dir):
    """Recall@5 of hyperplane-LSH against the exact brute-force top-5 —
    the estimator-quality audit AS an oracle-checked query (BENCH
    carried this number; now the gate proves it): per query the hit
    count is an exact integer (left join exact->LSH on (query, nbr)),
    mean recall = sum_hits/(k·n_queries) and the worst query's floor
    are the only divisions.  Same deterministic Rademacher planes and
    k as the registered lsh_ann/ann_topk rows."""
    from plato_spark.functions.similarity import (
        brute_force_topk,
        lsh_bucketed_neighbors_portable,
    )

    emb = _emb_double(spark, sf_dir)
    ex = brute_force_topk(emb, k=5).select("query_id", "nbr_id")
    ls = lsh_bucketed_neighbors_portable(emb, k=5).select(
        F.col("query_id").alias("q2"), F.col("nbr_id").alias("n2"))
    per = (
        ex.join(ls, (F.col("query_id") == F.col("q2"))
                & (F.col("nbr_id") == F.col("n2")), "left")
        .groupBy("query_id")
        .agg(F.count("n2").cast("long").alias("hits"))
    )
    return per.agg(
        F.lit(5).cast("int").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("hits").cast("long").alias("sum_hits"),
        F.round(F.sum("hits") / (F.lit(5) * F.count(F.lit(1))), 6)
        .alias("mean_recall"),
        F.round(F.min("hits") / F.lit(5.0), 6).alias("min_recall"),
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering through the BUCKETED scale path: portable
    minhash-LSH candidates -> jaccard verify -> WCC -> keeper per doc.
    The oracle mirrors the banding itself (portable md5 family), so the
    approximate candidate set is value-checked, not just the verifier."""
    return near_dup_clusters(
        load_table(spark, sf_dir, "documents"), threshold=0.5,
        use_lsh=True, hash_impl="portable",
    )


def q_dedup_savings(spark, sf_dir):
    """One-row executive summary of the near-dup pass: docs kept vs
    dropped and the exact character mass reclaimed — the number the
    curation report leads with.  Composes dedup_apply with doc lengths;
    exact integers, one rounded division."""
    from plato_spark.functions.dedup import dedup_apply

    docs = load_table(spark, sf_dir, "documents")
    manifest = dedup_apply(docs, threshold=0.5, hash_impl="portable")
    j = manifest.join(
        docs.select(F.col("doc_id").alias("id"),
                    F.col("n_chars").cast("long").alias("nc")), "id")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long")
        .alias("kept"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).cast("long")
        .alias("dropped"),
        F.sum(F.when(~F.col("keep"), F.col("nc")).otherwise(F.lit(0)))
        .cast("long").alias("chars_reclaimed"),
    ).select(
        "n_docs", "kept", "dropped", "chars_reclaimed",
        F.round((F.lit(100) * F.col("dropped")) / F.col("n_docs"), 6)
        .alias("drop_pct"),
    )


def q_dup_cross_sources(spark, sf_dir):
    """Cross-source near-dup pair matrix: for every near-dup cluster,
    the member pairs counted by UNORDERED source pair — mirror-site /
    template duplication localized to container pairs (the
    cluster-level sibling of source_overlap's shingle containment).
    Cluster sizes bound the self-join; exact integer counts."""
    from plato_spark.functions.dedup import near_dup_clusters

    docs = load_table(spark, sf_dir, "documents")
    cl = near_dup_clusters(docs, threshold=0.5, use_lsh=True,
                           hash_impl="portable")
    m = cl.join(docs.select("doc_id", "source"), "doc_id").select(
        "keeper_id", "doc_id", "source")
    a = m.select("keeper_id", F.col("doc_id").alias("da"),
                 F.col("source").alias("sa"))
    b = m.select("keeper_id", F.col("doc_id").alias("db"),
                 F.col("source").alias("sb"))
    return (
        a.join(b, "keeper_id")
        .where(F.col("da") < F.col("db"))
        .groupBy(F.least("sa", "sb").alias("source_a"),
                 F.greatest("sa", "sb").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def q_dedup_apply(spark, sf_dir):
    """Per-document keep/drop manifest from the near-dup clusters
    (functions/dedup.dedup_apply): keepers and singletons keep, dropped
    rows carry their keeper for provenance — the verdict table the
    curation pipeline actually filters on."""
    from plato_spark.functions.dedup import dedup_apply

    return dedup_apply(load_table(spark, sf_dir, "documents"),
                       threshold=0.5, hash_impl="portable")


def q_dedup_exact(spark, sf_dir):
    return exact_dedup(load_table(spark, sf_dir, "documents"))


def q_similarity_threshold(spark, sf_dir):
    return threshold_neighbors(_emb_double(spark, sf_dir), threshold=0.8)


def q_minhash_candidates(spark, sf_dir):
    # portable hash family => value-checked against the DuckDB oracle;
    # the xxhash64 fast path is equivalence-tested in pytest
    return minhash_lsh_candidates(
        load_table(spark, sf_dir, "documents"), hash_impl="portable"
    )


def q_simhash(spark, sf_dir):
    return simhash_signatures_portable(load_table(spark, sf_dir, "documents"))


def q_simhash_dups(spark, sf_dir):
    """Banded simhash near-dup join (pigeonhole-exact recall at
    hamming <= 3); the oracle computes the all-pairs ground truth."""
    return simhash_near_dup_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=3
    )


def q_lsh_ann(spark, sf_dir):
    # deterministic Rademacher planes => the approximate result itself is
    # value-checked; the gaussian numpy-matmul variant stays pytest-covered
    return lsh_bucketed_neighbors_portable(_emb_double(spark, sf_dir), k=5)


def q_embedding_dedup(spark, sf_dir):
    """Embedding near-dup clusters fed by LSH-bucketed candidates — the
    100TB-shape pipeline (no crossJoin of the vector table anywhere in the
    plan); the Rademacher planes make the candidate set itself
    oracle-reproducible. All-pairs mode stays pytest-covered as the exact
    recall baseline."""
    emb = _emb_double(spark, sf_dir)
    cands = lsh_candidate_pairs_portable(emb, num_planes=10, num_tables=3)
    return embedding_near_dup_clusters(emb, threshold=0.42, candidates=cands)


def q_dedup_incremental(spark, sf_dir):
    """Incremental exact dedup (streaming/dedup_stream.merge_doc_batch):
    the corpus arrives as three micro-batches folded into a persisted
    bucketed digest index with per-bucket epoch-tagged exactly-once
    commits; keeper = min doc_id makes the final index order-independent,
    so the plain batch GROUP BY sha256 oracle applies verbatim."""
    import shutil
    import tempfile

    from plato_spark.streaming.dedup_stream import (
        merge_doc_batch,
        read_dedup_state,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    sd = tempfile.mkdtemp(prefix="plato_incdedup_")
    try:
        for i in range(3):
            merge_doc_batch(
                docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i),
                sd, epoch_id=i,
            )
        out = read_dedup_state(spark, sd).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sd, ignore_errors=True)
        docs.unpersist()
    return out


def q_lsh_incremental(spark, sf_dir):
    """Incremental MinHash-LSH near-dup index
    (streaming/lsh_stream.merge_lsh_batch): the corpus arrives as three
    micro-batches folded into a persisted band-bucket membership index
    (idempotent distinct-union per bucket, epoch-tagged commits); the
    final state's self-join equals batch minhash_lsh_candidates over
    the union VERBATIM (telescoping invariant), so the unchanged batch
    oracle applies."""
    import shutil
    import tempfile

    from plato_spark.streaming.lsh_stream import (
        merge_lsh_batch,
        read_lsh_state,
        state_candidates,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    sd = tempfile.mkdtemp(prefix="plato_inclsh_")
    try:
        for i in range(3):
            merge_lsh_batch(
                docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i),
                sd, epoch_id=i, hash_impl="portable",
            )
        out = state_candidates(read_lsh_state(spark, sd)).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(sd, ignore_errors=True)
        docs.unpersist()
    return out


def q_kmv_jaccard(spark, sf_dir):
    """KMV (bottom-k) sketch Jaccard between every source pair's
    vocabulary, NEXT TO the exact value — the sketch-accuracy row: the
    estimator keeps only the k smallest portable-md5 token hashes per
    source, estimates J as |both-sketch members among the union's
    bottom-k| / min(k, |union sketch|), and the gate checks both
    numbers (the estimate is deterministic because the hash is).  The
    constant-memory path for pairwise corpus similarity at 100 TB."""
    from pyspark.sql import Window
    from plato_spark.functions.text import portable_h1

    docs = load_table(spark, sf_dir, "documents")
    vocab = docs.select(
        "source",
        F.explode(F.array_distinct(F.regexp_extract_all(
            "text", F.lit("[A-Za-z0-9_]+"), F.lit(0)))).alias("token")
    ).distinct().select(
        "source", "token", portable_h1(F.col("token")).alias("h"))
    vocab = vocab.persist()
    w = Window.partitionBy("source").orderBy("h", "token")
    bk = vocab.select(
        "source", "token", "h",
        F.row_number().over(w).alias("rn")).where(
        F.col("rn") <= KMV_K).drop("rn").persist()
    srcs = vocab.select("source").distinct()
    pairs = srcs.select(F.col("source").alias("sa")).join(
        srcs.select(F.col("source").alias("sb")),
        F.col("sa") < F.col("sb"))
    u = pairs.join(bk.withColumnRenamed("source", "sa"), "sa").select(
        "sa", "sb", "token", "h"
    ).unionByName(
        pairs.join(bk.withColumnRenamed("source", "sb"), "sb")
        .select("sa", "sb", "token", "h")
    ).distinct()
    wp = Window.partitionBy("sa", "sb").orderBy("h", "token")
    ubk = u.select("sa", "sb", "token",
                   F.row_number().over(wp).alias("rn")).where(
        F.col("rn") <= KMV_K)
    in_a = bk.select(F.col("source").alias("sa"),
                     F.col("token").alias("token"))
    in_b = bk.select(F.col("source").alias("sb"),
                     F.col("token").alias("token"))
    est = ubk.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).cast("long").alias("kk")
    ).join(
        ubk.join(in_a, ["sa", "token"], "semi")
        .join(in_b, ["sb", "token"], "semi")
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("both")),
        ["sa", "sb"], "left")
    ex = (
        pairs.join(vocab.withColumnRenamed("source", "sa"), "sa")
        .select("sa", "sb", "token")
        .join(vocab.select(F.col("source").alias("sb"),
                           F.col("token").alias("token")),
              ["sb", "token"], "semi")
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sizes = vocab.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("nv"))
    out = (
        est.join(ex, ["sa", "sb"], "left")
        .join(sizes.withColumnRenamed("source", "sa")
              .withColumnRenamed("nv", "na"), "sa")
        .join(sizes.withColumnRenamed("source", "sb")
              .withColumnRenamed("nv", "nb"), "sb")
        .select(
            "sa", "sb",
            F.round(F.coalesce("both", F.lit(0)) / F.col("kk"), 6)
            .alias("est_jaccard"),
            F.round(F.coalesce("inter", F.lit(0))
                    / (F.col("na") + F.col("nb")
                       - F.coalesce("inter", F.lit(0))), 6)
            .alias("exact_jaccard"))
    )
    return out.select(
        "sa", "sb", "est_jaccard", "exact_jaccard",
        F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 6)
        .alias("abs_err"))


QUERIES = {
    "lsh_incremental": q_lsh_incremental,
    "minhash_calibration": q_minhash_calibration,
    "dedup_threshold_curve": q_dedup_threshold_curve,
    "ppjoin_pairs": q_ppjoin_pairs,
    "bloom_prune": q_bloom_prune,
    "snm_candidates": q_snm_candidates,
    "lsh_recall": q_lsh_recall,
    "edit_distance_dups": q_edit_distance_dups,
    "containment_dups": q_containment,
    "dedup_exact": q_dedup_exact,
    "dedup_incremental": q_dedup_incremental,
    "simhash": q_simhash,
    "simhash_dups": q_simhash_dups,
    "lsh_ann": q_lsh_ann,
    "embedding_dedup": q_embedding_dedup,
    "minhash_lsh_candidates": q_minhash_candidates,
    "similarity_threshold": q_similarity_threshold,
    "dedup_clusters": q_dedup_clusters,
    "dedup_apply": q_dedup_apply,
    "dup_cross_sources": q_dup_cross_sources,
    "dedup_savings": q_dedup_savings,
    "kmv_jaccard": q_kmv_jaccard,
}


ORACLES = {
    "lsh_incremental": _sql_minhash_candidates(),
    "minhash_calibration": _sql_minhash_calibration(),
    "dedup_threshold_curve": _sql_dedup_threshold_curve(DEDUP_THRESHOLDS),
    "ppjoin_pairs": f"""
WITH tok AS MATERIALIZED (
  SELECT DISTINCT doc_id AS id,
         unnest(list_distinct(regexp_extract_all(text, '{TOKEN_RE_SQL}')))
           AS tk
  FROM documents),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz
          FROM tok GROUP BY id),
inter AS (SELECT a.id AS a, b.id AS b, CAST(count(*) AS BIGINT) AS inter
          FROM tok a JOIN tok b ON a.tk = b.tk AND a.id < b.id
          GROUP BY 1, 2)
SELECT i.a, i.b, i.inter, sa.sz AS size_a, sb.sz AS size_b,
       round(CAST(i.inter AS DOUBLE)
             / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i JOIN sizes sa ON sa.id = i.a JOIN sizes sb ON sb.id = i.b
WHERE i.inter * 100 >= 95 * (sa.sz + sb.sz - i.inter)
ORDER BY i.a, i.b""",
    "bloom_prune": f"""
            WITH bk AS MATERIALIZED (
              SELECT DISTINCT CAST(c_custkey AS BIGINT) AS k
              FROM customer WHERE c_custkey % 3 = 0),
            pk AS MATERIALIZED (
              SELECT DISTINCT CAST(o_custkey AS BIGINT) AS k FROM orders),
            bbits AS MATERIALIZED (
              SELECT DISTINCT
                ({PORTABLE_H1_SQL.format(
                    s="('bloom|' || CAST(k AS VARCHAR))")}
                 + i * {PORTABLE_H2_SQL.format(
                    s="('bloom|' || CAST(k AS VARCHAR))")}) % 2048 AS bit
              FROM bk, (VALUES (0), (1), (2), (3)) AS js(i)),
            pbits AS MATERIALIZED (
              SELECT DISTINCT k,
                ({PORTABLE_H1_SQL.format(
                    s="('bloom|' || CAST(k AS VARCHAR))")}
                 + i * {PORTABLE_H2_SQL.format(
                    s="('bloom|' || CAST(k AS VARCHAR))")}) % 2048 AS bit
              FROM pk, (VALUES (0), (1), (2), (3)) AS js(i)),
            need AS (SELECT k, count(*) AS need FROM pbits GROUP BY k),
            have AS (SELECT p.k, count(*) AS have
                     FROM pbits p JOIN bbits b ON p.bit = b.bit GROUP BY p.k),
            pass_ AS (SELECT need.k FROM need JOIN have ON need.k = have.k
                      WHERE need.need = have.have),
            s AS (SELECT
               (SELECT CAST(count(*) AS BIGINT) FROM bk) AS build_keys,
               (SELECT CAST(count(*) AS BIGINT) FROM pk) AS probe_keys,
               (SELECT CAST(count(*) AS BIGINT) FROM pk
                WHERE k IN (SELECT k FROM bk)) AS true_matches,
               (SELECT CAST(count(*) AS BIGINT) FROM pass_) AS bloom_pass)
            SELECT build_keys, probe_keys, true_matches, bloom_pass,
                   CAST(bloom_pass - true_matches AS BIGINT)
                     AS false_positives
            FROM s""",
    "snm_candidates": """
            WITH k AS (SELECT doc_id,
                         substr(lower(regexp_replace(text,
                                '[^A-Za-z0-9]', '', 'g')), 1, 24) AS key
                       FROM documents),
            r AS (SELECT doc_id,
                         row_number() OVER (ORDER BY key, doc_id) AS rk
                  FROM k)
            SELECT least(a.doc_id, b.doc_id) AS a,
                   greatest(a.doc_id, b.doc_id) AS b
            FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk <= 7""",
    "lsh_recall": f"""
WITH ex AS MATERIALIZED (
  SELECT query_id, nbr_id FROM ({_sql_ann_topk(5)})),
ls AS MATERIALIZED (
  SELECT query_id, nbr_id FROM ({_sql_lsh_ann(5)})),
per AS (
  SELECT e.query_id, CAST(count(l.nbr_id) AS BIGINT) AS hits
  FROM ex e LEFT JOIN ls l
    ON e.query_id = l.query_id AND e.nbr_id = l.nbr_id
  GROUP BY e.query_id)
SELECT CAST(5 AS INTEGER) AS k,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(hits) AS BIGINT) AS sum_hits,
       round(CAST(sum(hits) AS DOUBLE) / (5 * count(*)), 6)
         AS mean_recall,
       round(CAST(min(hits) AS DOUBLE) / 5.0, 6) AS min_recall
FROM per""",
    "edit_distance_dups": f"""
            WITH cand AS MATERIALIZED ({_sql_minhash_candidates()})
            SELECT c.a, c.b,
                   round(1.0 - CAST(levenshtein(x.text, y.text) AS DOUBLE)
                         / greatest(length(x.text), length(y.text), 1), 6)
                     AS edit_sim
            FROM cand c
            JOIN documents x ON c.a = x.doc_id
            JOIN documents y ON c.b = y.doc_id
            WHERE round(1.0 - CAST(levenshtein(x.text, y.text) AS DOUBLE)
                        / greatest(length(x.text), length(y.text), 1), 6)
                  >= 0.3""",
    "containment_dups": f"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
                       FROM documents),
            sh AS (SELECT doc_id,
                     CASE WHEN length(toks) >= 3 THEN
                       list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, length(toks) - 1)])
                     ELSE [array_to_string(toks, ' ')] END AS sh
                   FROM t)
            SELECT a.doc_id AS contained, b.doc_id AS container,
                   round(length(list_intersect(a.sh, b.sh))
                         / greatest(length(a.sh), 1), 6) AS containment
            FROM sh a JOIN sh b ON a.doc_id != b.doc_id
            WHERE round(length(list_intersect(a.sh, b.sh))
                        / greatest(length(a.sh), 1), 6) >= 0.8""",
    "dedup_exact": """
            SELECT min(doc_id) AS keeper_id, CAST(count(*) AS BIGINT) AS dup_count,
                   sha256(text) AS content_sha
            FROM documents GROUP BY sha256(text)""",
    "dedup_incremental": """
            SELECT sha256(text) AS content_sha,
                   CAST(min(doc_id) AS BIGINT) AS keeper_doc,
                   CAST(count(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY sha256(text)""",
    "simhash": _sql_simhash(),
    "simhash_dups": _sql_simhash().replace(
            """SELECT d.doc_id AS id, CAST(COALESCE(s.simhash, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN sg s ON d.doc_id = s.doc_id""",
            """SELECT x.id AS a, y.id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM (SELECT d.doc_id AS id, CAST(COALESCE(s.simhash, 0) AS BIGINT) AS simhash
      FROM documents d LEFT JOIN sg s ON d.doc_id = s.doc_id) x
JOIN (SELECT d.doc_id AS id, CAST(COALESCE(s.simhash, 0) AS BIGINT) AS simhash
      FROM documents d LEFT JOIN sg s ON d.doc_id = s.doc_id) y
  ON x.id < y.id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""",
        ),
    "lsh_ann": _sql_lsh_ann(5),
    "embedding_dedup": _sql_embedding_dedup(0.42),
    "minhash_lsh_candidates": _sql_minhash_candidates(),
    "similarity_threshold": """
            SELECT a.vec_id AS query_id,
                   CAST(sum(CASE WHEN
                     list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])) >= 0.8
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_similar
            FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
            GROUP BY a.vec_id""",
    "dedup_clusters": _sql_dedup_clusters_lsh(),
    "dedup_apply": f"""
WITH cl AS MATERIALIZED ({_sql_dedup_clusters_lsh()})
SELECT d.doc_id AS id, cl.keeper_id,
       (cl.keeper_id IS NULL OR cl.keeper_id = d.doc_id) AS keep
FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
ORDER BY id""",
    "dup_cross_sources": _sql_dup_cross_sources(),
    "dedup_savings": _sql_dedup_savings(),
    "kmv_jaccard": _sql_kmv_jaccard(KMV_K),
}
