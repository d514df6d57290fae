"""Entry-registry queries: pipeline domain (split from the former
monolithic __spark_entry__.py; round-5 manifest-ization).
"""

from __future__ import annotations

from plato_spark.entry.common import (  # noqa: F401
    F,
    H1_SQL,
    K_ANON_BAND,
    K_ANON_K,
    PACKING_SWEEP,
    SQL_GRAPH_PREFIX,
    TOKEN_RE_SQL,
    WCC_SQL_ITERS,
    _sql_filter_ablation,
    _sql_graph_card,
    _sql_graphsage,
    _sql_packing_sensitivity,
    _sym,
    connected_components,
    docs_to_media,
    hash_split,
    load_table,
    neighborhood_similarity,
    parse_media_headers,
    part_cooccurrence_edges,
    q_reference_graph,
    stratified_sample,
    symmetrize,
    text_quality,
)


def q_gnn_neighbor_sample(spark, sf_dir):
    """Deterministic GraphSAGE fan-out (k=5) through the degree-aware
    prefilter scale path (exact by fallback; algos/neighbor_sample)."""
    from plato_spark.algos.neighbor_sample import neighbor_sample

    return neighbor_sample(part_cooccurrence_edges(spark, sf_dir), k=5)


def q_link_jaccard(spark, sf_dir):
    return neighborhood_similarity(
        part_cooccurrence_edges(spark, sf_dir), method="jaccard"
    )


def q_graphsage_features(spark, sf_dir):
    """2-layer untrained GraphSAGE mean aggregation of the document
    embeddings over the symmetrized citation graph
    (algos/sage.sage_mean_features): the GNN-inference feature side
    beside gnn_neighbor_sample/negative_sampling/linkpred_eval.
    Features quantized once to int64 micro-units; each layer is one
    edge join + one (dst, dim) aggregation with a single floor'd IEEE
    division — engine-exact, incl. negative sums (floor, never
    truncating div).  Long (id, dim, value) output."""
    from plato_spark.algos.sage import sage_mean_features

    cg = q_reference_graph(spark, sf_dir).select("src", "dst")
    sym = cg.unionByName(
        cg.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    feats = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding")
    return sage_mean_features(sym, feats, layers=2)


def q_filter_ablation(spark, sf_dir):
    """Quality-filter ablation: for each of quality_filter's four rules
    (too-few-tokens, low-alpha, high-digit, token-length-band), how
    many docs fail IT at all and how many fail ONLY it — the number
    that says which rule is doing the work and which is redundant
    (a rule with n_failing_only = 0 never changes the corpus).  Same
    6dp-rounded ratios as the registered quality_filter, so the
    ablation and the gate can never disagree; exact integer counts."""
    from plato_spark.functions.text import text_quality

    q = text_quality(load_table(spark, sf_dir, "documents"))
    flags = q.select(
        (F.col("n_tokens") < 8).alias("f_tokens"),
        (F.col("alpha_ratio") < 0.45).alias("f_alpha"),
        (F.col("digit_ratio") > 0.3).alias("f_digit"),
        ((F.col("mean_token_len") < 2.0)
         | (F.col("mean_token_len") > 12.0)).alias("f_len"),
    )
    names = ["f_tokens", "f_alpha", "f_digit", "f_len"]
    aggs = []
    for n in names:
        others = [c for c in names if c != n]
        only = F.col(n)
        for o in others:
            only = only & ~F.col(o)
        aggs.append(F.sum(F.col(n).cast("long")).alias(f"{n}_all"))
        aggs.append(F.sum(only.cast("long")).alias(f"{n}_only"))
    any_fail = F.col(names[0])
    for n in names[1:]:
        any_fail = any_fail | F.col(n)
    aggs.append(F.sum(any_fail.cast("long")).alias("any_all"))
    s = flags.agg(*aggs)
    out = None
    for n in names + ["any"]:
        only = "any_all" if n == "any" else f"{n}_only"
        row = s.select(
            F.lit(n).alias("filter"),
            F.col(f"{n}_all").alias("n_failing"),
            F.col(only).alias("n_failing_only"))
        out = row if out is None else out.unionByName(row)
    return out


def q_packing_sensitivity(spark, sf_dir):
    """The packing budget, swept: the sequence_packing manifest
    summarized at 128 / 512 / 2048 tokens per chunk — split-doc count,
    extra splits (the attention-masking cost), and tail waste
    (chunks x budget - tokens), per budget.  The curve behind choosing
    a context length: small budgets split documents, large budgets
    waste tail tokens.  Same deterministic layout for every budget
    (the cut points move, the order does not); all exact BIGINTs."""
    from plato_spark.functions.packing import sequence_packing

    docs = load_table(spark, sf_dir, "documents")
    out = None
    for b in PACKING_SWEEP:
        m = sequence_packing(docs, budget=b)
        s = m.agg(
            F.lit(b).cast("long").alias("budget"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (F.max("last_chunk") + 1).cast("long").alias("total_chunks"),
            F.sum((F.col("n_chunks") > 1).cast("long")).cast("long")
            .alias("split_docs"),
            F.sum(F.col("n_chunks") - 1).cast("long")
            .alias("extra_splits"),
        ).select(
            "*",
            (F.col("total_chunks") * b - F.col("total_tokens"))
            .cast("long").alias("tail_waste"))
        out = s if out is None else out.unionByName(s)
    return out


def q_media_features(spark, sf_dir):
    """Encode each document as a real container file (PNG/BMP/JPEG/GIF/WAV,
    format + dimensions arithmetic in doc_id/n_chars), then parse the
    headers back with the independent spec-based struct parser. The oracle
    predicts every field arithmetically, so a single misplaced byte in
    either the encoder or the parser breaks the value hash."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return parse_media_headers(docs_to_media(docs))


def q_graph_card(spark, sf_dir):
    """One-row graph dashboard — the corpus_card analog for the
    co-occurrence graph: vertices, canonical edges, density (one
    division of exact integers), max degree, component count, and the
    giant component's vertex share.  Composes degree aggregates with
    the proven hash-min WCC; exact integers throughout."""
    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    deg = (
        symmetrize(canon).groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    dstats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.max("deg").cast("long").alias("max_deg"),
    )
    ecnt = canon.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    comp = connected_components(canon)
    cstats = (
        comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"),
             F.max("sz").cast("long").alias("gcc"))
    )
    out = dstats.crossJoin(F.broadcast(ecnt)).crossJoin(F.broadcast(cstats))
    out = out.localCheckpoint(eager=True)
    canon.unpersist()
    n, e = F.col("n_vertices"), F.col("n_edges")
    return out.select(
        "n_vertices", "n_edges",
        F.round((F.lit(2) * e) / (n * (n - 1)), 6).alias("density"),
        "max_deg", "n_components",
        F.round((F.lit(100) * F.col("gcc")) / n, 6).alias("gcc_pct"),
    )


def q_linkpred_eval(spark, sf_dir):
    """End-to-end link-prediction eval: portable-hash 20% edge holdout,
    common-neighbor top-10 ranking on the train graph, hits@10 against
    the held-out edges (functions/linkpred)."""
    from plato_spark.functions.linkpred import link_prediction_eval

    return link_prediction_eval(
        part_cooccurrence_edges(spark, sf_dir), k=10, holdout_mod=5
    )


def q_negative_sampling(spark, sf_dir):
    """Deterministic negative-edge sampling for link-prediction / GNN
    training: up to 5 portable-hash non-neighbors per vertex
    (functions/sampling.negative_edge_sampling)."""
    from plato_spark.functions.sampling import negative_edge_sampling

    return negative_edge_sampling(_sym(spark, sf_dir), k=5, attempts=16)


def q_weighted_sample(spark, sf_dir):
    """Deterministic weight-proportional document sample
    (functions/sampling.weighted_sample): Efraimidis-Spirakis A-ES with
    the portable hash as the fixed-granularity uniform, top-32 by
    n_chars weight, TakeOrdered under (priority, id)."""
    from plato_spark.functions.sampling import weighted_sample

    return weighted_sample(load_table(spark, sf_dir, "documents"), k=32)


def q_mixture_apply(spark, sf_dir):
    """Per-document replication factors materializing the temperature
    mixture (functions/packing.mixture_apply): floor(boost) copies plus
    one more iff the portable doc hash falls under the exact-integer
    fractional threshold — deterministic at any partitioning."""
    from plato_spark.functions.packing import mixture_apply

    return mixture_apply(load_table(spark, sf_dir, "documents"))


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language downsample (portable hash gate):
    keep 50% of en, 100% of zh, 25% of every other stratum."""
    return stratified_sample(
        load_table(spark, sf_dir, "documents"),
        strata_col="lang",
        fractions={"en": 0.5, "zh": 1.0},
        default_fraction=0.25,
    ).select("doc_id", "lang")


def q_hash_split(spark, sf_dir):
    """Deterministic disjoint train/val/test assignment (90/5/5)."""
    return hash_split(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "split"
    )


def q_sequence_packing(spark, sf_dir):
    """Concat-then-chunk packing manifest (functions/packing
    .sequence_packing): documents laid out in deterministic portable-
    hash order, the token stream cut every 512 tokens; per-doc chunk
    ranges as exact BIGINTs.  The prefix sum is DISTRIBUTED (32
    hash-range buckets, bucket-partitioned window) — the only single-
    partition window in the plan is over the 32-row bucket-offset
    table, never the corpus."""
    from plato_spark.functions.packing import sequence_packing

    return sequence_packing(load_table(spark, sf_dir, "documents"), budget=512)


def q_mixture_weights(spark, sf_dir):
    """Temperature-sampling mixture weights per source, alpha=0.5
    (functions/packing.mixture_weights) — exact-integer isqrt weights,
    one rounded division per ratio; one map-side-combined agg plus a
    broadcast 1-row total."""
    from plato_spark.functions.packing import mixture_weights

    return mixture_weights(load_table(spark, sf_dir, "documents"))


def q_selfjoin_size_audit(spark, sf_dir):
    """Join-cardinality estimator audit: for each lineitem key column,
    the EXACT self-equijoin size sum c(k)^2 next to the textbook
    independence estimate n^2/d — the ratio is the skew multiplier a
    cost-based optimizer silently eats when it assumes uniform keys
    (join_skew_audit's max-row sibling, but for JOIN OUTPUT size).
    Exact integers + one rounded division per key."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        cnt = li.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("c"))
        parts.append(cnt.agg(
            F.lit(col).alias("key_col"),
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.col("c") * F.col("c")).cast("long")
            .alias("exact_join_size")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    est = (F.col("n_rows") * F.col("n_rows")) / F.col("n_keys")
    return out.select(
        "*",
        F.round(est, 6).alias("independence_estimate"),
        F.round(F.col("exact_join_size") / est, 6).alias("skew_ratio"))


def q_linkpred_first_rank(spark, sf_dir):
    """Rank-resolved link prediction (functions/linkpred
    .link_prediction_first_rank): for every held-out edge, the exact
    position of the true neighbor in each endpoint's full
    common-neighbor ranking — the MRR read-out as per-edge integers
    (reciprocal-rank MEANS are reduce-order-sensitive; ranks are not),
    NULL when the CN scorer cannot reach the pair at any k."""
    from plato_spark.functions.linkpred import link_prediction_first_rank

    return link_prediction_first_rank(
        part_cooccurrence_edges(spark, sf_dir), holdout_mod=5)


def q_k_anonymity(spark, sf_dir):
    """Privacy-release audit of the customer dimension: k-anonymity
    over the quasi-identifier pair (nation, market segment) and
    l-diversity of the account-balance band (floor(acctbal/1000)) as
    the sensitive attribute — the pre-release check a training-data
    export runs.  One row: group counts, the minimum group size, rows
    in groups below k=5, and the minimum per-group distinct-band count.
    Exact integers + one rounded division."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / K_ANON_BAND)).cast("long")
        .alias("ldiv"))
    return g.agg(
        F.sum("sz").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("sz").cast("long").alias("min_group_size"),
        F.sum(F.when(F.col("sz") < K_ANON_K, F.col("sz"))
              .otherwise(0)).cast("long").alias("rows_below_k"),
        F.min("ldiv").cast("long").alias("min_l_diversity"),
    ).select(
        "*",
        F.round(F.col("rows_below_k") / F.col("n_rows"), 6)
        .alias("pct_below_k"))


QUERIES = {
    "graphsage_features": q_graphsage_features,
    "filter_ablation": q_filter_ablation,
    "packing_sensitivity": q_packing_sensitivity,
    "mixture_apply": q_mixture_apply,
    "graph_card": q_graph_card,
    "weighted_sample": q_weighted_sample,
    "negative_sampling": q_negative_sampling,
    "linkpred_eval": q_linkpred_eval,
    "stratified_sample": q_stratified_sample,
    "hash_split": q_hash_split,
    "media_features": q_media_features,
    "gnn_neighbor_sample": q_gnn_neighbor_sample,
    "link_jaccard": q_link_jaccard,
    "sequence_packing": q_sequence_packing,
    "mixture_weights": q_mixture_weights,
    "k_anonymity": q_k_anonymity,
    "linkpred_first_rank": q_linkpred_first_rank,
    "selfjoin_size_audit": q_selfjoin_size_audit,
}


ORACLES = {
    "graphsage_features": _sql_graphsage(),
    "filter_ablation": _sql_filter_ablation(),
    "packing_sensitivity": _sql_packing_sensitivity(PACKING_SWEEP),
    "mixture_apply": f"""
            WITH t AS (SELECT source,
                         CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                              AS BIGINT) AS tk
                       FROM documents),
            per AS (SELECT source, CAST(sum(tk) AS BIGINT) AS n_tokens
                    FROM t GROUP BY source),
            f0 AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)))
                                  AS BIGINT) AS f FROM per),
            f1 AS (SELECT *, CASE WHEN (f+1)*(f+1) <= n_tokens
                                  THEN f+1 ELSE f END AS g FROM f0),
            iw AS (SELECT source, n_tokens,
                          CASE WHEN g*g > n_tokens THEN g-1 ELSE g END AS w
                   FROM f1),
            tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
                           CAST(sum(w) AS BIGINT) AS tw FROM iw),
            rates AS (SELECT source,
                   round(CAST(w * tt AS DOUBLE) / (tw * n_tokens), 6) AS b6
                      FROM iw, tot),
            rr AS (SELECT source, CAST(floor(b6) AS BIGINT) AS n_base,
                          CAST(round((b6 - floor(b6)) * 1e6, 0) AS BIGINT)
                            AS thresh
                   FROM rates)
            SELECT d.doc_id AS id, d.source,
                   CAST(r.n_base + CASE WHEN
                     ({H1_SQL.format(s="('mix|' || CAST(d.doc_id AS VARCHAR))")})
                       % 1000000 < r.thresh THEN 1 ELSE 0 END AS BIGINT)
                     AS n_copies
            FROM documents d JOIN rr r ON d.source = r.source""",
    "graph_card": _sql_graph_card(WCC_SQL_ITERS),
    "weighted_sample": f"""
SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS weight,
       CAST(({H1_SQL.format(s="('wsample|' || CAST(doc_id AS VARCHAR))")})
            AS DOUBLE) / CAST(n_chars AS DOUBLE) AS priority
FROM documents WHERE n_chars > 0
ORDER BY priority, id LIMIT 32""",
    "negative_sampling": SQL_GRAPH_PREFIX + """,
na AS (SELECT CAST(range AS INTEGER) AS attempt FROM range(0, 16)),
nc AS MATERIALIZED (
  SELECT v.id, na.attempt,
         CAST(('0x' || substr(md5('neg:' || CAST(v.id AS VARCHAR) || ':'
               || CAST(na.attempt AS VARCHAR)), 1, 14)) AS BIGINT)
         % ((SELECT max(id) FROM verts) + 1) AS neg
  FROM verts v CROSS JOIN na),
nok AS MATERIALIZED (
  SELECT id, attempt, neg FROM nc
  WHERE neg != id
    AND EXISTS (SELECT 1 FROM verts w WHERE w.id = nc.neg)
    AND NOT EXISTS (SELECT 1 FROM edges e
                    WHERE e.src = nc.id AND e.dst = nc.neg))
SELECT id, neg, attempt FROM (
  SELECT id, neg, attempt,
         row_number() OVER (PARTITION BY id ORDER BY attempt) AS rn
  FROM nok) t
WHERE rn <= 5 ORDER BY id, attempt""",
    "linkpred_eval": SQL_GRAPH_PREFIX + """,
lpe AS MATERIALIZED (
  SELECT src, dst,
         CAST(('0x' || substr(md5('lp:' || CAST(src AS VARCHAR) || ':'
               || CAST(dst AS VARCHAR)), 1, 14)) AS BIGINT) % 5 = 0
           AS held
  FROM canon),
lpt AS MATERIALIZED (SELECT src, dst FROM lpe WHERE NOT held),
lph AS MATERIALIZED (SELECT src, dst FROM lpe WHERE held),
lps AS MATERIALIZED (
  SELECT src, dst FROM lpt
  UNION ALL SELECT dst AS src, src AS dst FROM lpt),
lpc AS MATERIALIZED (
  SELECT a.dst AS u, b.dst AS v, CAST(count(*) AS BIGINT) AS cn
  FROM lps a JOIN lps b ON a.src = b.src AND a.dst != b.dst
  GROUP BY a.dst, b.dst),
lpc2 AS MATERIALIZED (
  SELECT c.u, c.v, c.cn FROM lpc c
  WHERE NOT EXISTS (SELECT 1 FROM lps s
                    WHERE s.src = c.u AND s.dst = c.v)),
lpk AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT u, v, row_number() OVER (
      PARTITION BY u ORDER BY cn DESC, v ASC) AS rn
    FROM lpc2) t WHERE rn <= 10),
lphit AS MATERIALIZED (
  SELECT h.src, h.dst FROM lph h
  WHERE EXISTS (SELECT 1 FROM lpk k WHERE k.u = h.src AND k.v = h.dst)
     OR EXISTS (SELECT 1 FROM lpk k WHERE k.u = h.dst AND k.v = h.src))
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM lpt) AS n_train,
  (SELECT CAST(count(*) AS BIGINT) FROM lph) AS n_test,
  CAST(10 AS INTEGER) AS k,
  (SELECT CAST(count(*) AS BIGINT) FROM lphit) AS n_hits,
  CASE WHEN (SELECT count(*) FROM lph) > 0
       THEN round(CAST((SELECT count(*) FROM lphit) AS DOUBLE)
                  / (SELECT count(*) FROM lph), 6)
       ELSE 0.0 END AS hits_at_k""",
    "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CAST(('0x' || substr(md5('strat1' || CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                  % 1000000
                  < CASE lang WHEN 'en' THEN 500000
                              WHEN 'zh' THEN 1000000
                              ELSE 250000 END""",
    "hash_split": """
            SELECT doc_id,
                   CASE WHEN g < 900000 THEN 'train'
                        WHEN g < 950000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         CAST(('0x' || substr(md5('split1' || CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                         % 1000000 AS g
                  FROM documents)""",
    "media_features": """
            SELECT doc_id AS media_id,
                   ['png','bmp','jpeg','gif','wav'][CAST(doc_id % 5 AS INT) + 1] AS format,
                   CASE WHEN doc_id % 5 = 4 THEN NULL
                        ELSE CAST(16 + n_chars % 241 AS INT) END AS width,
                   CASE WHEN doc_id % 5 = 4 THEN NULL
                        ELSE CAST(16 + (doc_id * 7) % 193 AS INT) END AS height,
                   CAST(CASE WHEN doc_id % 5 = 3 THEN 1
                             WHEN doc_id % 5 = 4 THEN 1 + doc_id % 2
                             ELSE 3 END AS INT) AS channels,
                   CASE WHEN doc_id % 5 = 4
                        THEN CAST(8000 + (doc_id % 4) * 4000 AS INT)
                        ELSE NULL END AS sample_rate,
                   CAST(CASE WHEN doc_id % 5 = 4 THEN 16 ELSE 8 END AS INT) AS bit_depth
            FROM documents""",
    "gnn_neighbor_sample": SQL_GRAPH_PREFIX + """
SELECT src, dst AS nbr, CAST(rn AS BIGINT) AS pos FROM (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY h, dst) AS rn
  FROM (SELECT src, dst,
               CAST(('0x' || substr(md5('gnn1' || CAST(src AS VARCHAR)
                     || ':' || CAST(dst AS VARCHAR)), 1, 14)) AS BIGINT) AS h
        FROM edges))
WHERE rn <= 5""",
    "link_jaccard": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst,
                    round(COALESCE(t.cnt, 0)
                          / greatest(du.deg + dv.deg - COALESCE(t.cnt, 0), 1), 6)
                      AS score
             FROM canon c
             JOIN deg du ON c.src = du.id JOIN deg dv ON c.dst = dv.id
             LEFT JOIN (
               SELECT a.src AS u, b.src AS v, count(*) AS cnt
               FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
               GROUP BY a.src, b.src) t ON c.src = t.u AND c.dst = t.v""",
    "sequence_packing": f"""
            WITH t AS (SELECT doc_id,
                         CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                              AS BIGINT) AS n_tokens
                       FROM documents),
            k AS (SELECT doc_id, n_tokens,
                    {H1_SQL.format(s="('pack|' || CAST(doc_id AS VARCHAR))")}
                      AS key
                  FROM t WHERE n_tokens > 0),
            c AS (SELECT doc_id, n_tokens,
                    sum(n_tokens) OVER (
                      ORDER BY (key // 2251799813685248), key, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum
                  FROM k)
            SELECT doc_id, n_tokens,
                   CAST(cum - n_tokens AS BIGINT) AS start_off,
                   CAST((cum - n_tokens) // 512 AS BIGINT) AS first_chunk,
                   CAST((cum - 1) // 512 AS BIGINT) AS last_chunk,
                   CAST((cum - 1) // 512 - (cum - n_tokens) // 512 + 1
                        AS BIGINT) AS n_chunks
            FROM c""",
    "mixture_weights": f"""
            WITH t AS (SELECT source,
                         CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                              AS BIGINT) AS tk
                       FROM documents),
            per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                           CAST(sum(tk) AS BIGINT) AS n_tokens
                    FROM t GROUP BY source),
            f0 AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)))
                                  AS BIGINT) AS f FROM per),
            f1 AS (SELECT *, CASE WHEN (f+1)*(f+1) <= n_tokens
                                  THEN f+1 ELSE f END AS g FROM f0),
            iw AS (SELECT source, n_docs, n_tokens,
                          CASE WHEN g*g > n_tokens THEN g-1 ELSE g END AS w
                   FROM f1),
            tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
                           CAST(sum(w) AS BIGINT) AS tw FROM iw)
            SELECT source, n_docs, n_tokens,
                   round(CAST(n_tokens AS DOUBLE) / tt, 6) AS natural_share,
                   round(CAST(w AS DOUBLE) / tw, 6) AS temp_share,
                   round(CAST(w * tt AS DOUBLE) / (tw * n_tokens), 6) AS boost
            FROM iw, tot""",
    "k_anonymity": f"""
WITH g AS (SELECT c_nationkey, c_mktsegment,
                  CAST(count(*) AS BIGINT) AS sz,
                  CAST(count(DISTINCT floor(c_acctbal / {K_ANON_BAND}))
                       AS BIGINT) AS ldiv
           FROM customer GROUP BY c_nationkey, c_mktsegment)
SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(sz) AS BIGINT) AS min_group_size,
       CAST(sum(CASE WHEN sz < {K_ANON_K} THEN sz ELSE 0 END) AS BIGINT)
         AS rows_below_k,
       CAST(min(ldiv) AS BIGINT) AS min_l_diversity,
       round(CAST(sum(CASE WHEN sz < {K_ANON_K} THEN sz ELSE 0 END)
                  AS DOUBLE) / sum(sz), 6) AS pct_below_k
FROM g""",
    "linkpred_first_rank": SQL_GRAPH_PREFIX + """,
lpe AS MATERIALIZED (
  SELECT src, dst,
         CAST(('0x' || substr(md5('lp:' || CAST(src AS VARCHAR) || ':'
               || CAST(dst AS VARCHAR)), 1, 14)) AS BIGINT) % 5 = 0
           AS held
  FROM canon),
lpt AS MATERIALIZED (SELECT src, dst FROM lpe WHERE NOT held),
lph AS MATERIALIZED (SELECT src, dst FROM lpe WHERE held),
lps AS MATERIALIZED (
  SELECT src, dst FROM lpt
  UNION ALL SELECT dst AS src, src AS dst FROM lpt),
lpc AS MATERIALIZED (
  SELECT a.dst AS u, b.dst AS v, CAST(count(*) AS BIGINT) AS cn
  FROM lps a JOIN lps b ON a.src = b.src AND a.dst != b.dst
  GROUP BY a.dst, b.dst),
lpc2 AS MATERIALIZED (
  SELECT c.u, c.v, c.cn FROM lpc c
  WHERE NOT EXISTS (SELECT 1 FROM lps s
                    WHERE s.src = c.u AND s.dst = c.v)),
lpr AS MATERIALIZED (
  SELECT u, v, CAST(row_number() OVER (
    PARTITION BY u ORDER BY cn DESC, v ASC) AS BIGINT) AS rnk
  FROM lpc2)
SELECT h.src, h.dst,
       f.rnk AS rank_from_src,
       r.rnk AS rank_from_dst,
       least(COALESCE(f.rnk, r.rnk), COALESCE(r.rnk, f.rnk))
         AS best_rank
FROM lph h
LEFT JOIN lpr f ON f.u = h.src AND f.v = h.dst
LEFT JOIN lpr r ON r.u = h.dst AND r.v = h.src
ORDER BY h.src, h.dst""",
    "selfjoin_size_audit": """
WITH ko AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
            GROUP BY l_orderkey),
kp AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
       GROUP BY l_partkey),
ks AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
       GROUP BY l_suppkey),
u AS (
  SELECT 'l_orderkey' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(c * c) AS BIGINT) AS exact_join_size FROM ko
  UNION ALL
  SELECT 'l_partkey', CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(sum(c * c) AS BIGINT) FROM kp
  UNION ALL
  SELECT 'l_suppkey', CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(sum(c * c) AS BIGINT) FROM ks)
SELECT key_col, n_rows, n_keys, exact_join_size,
       round(CAST(n_rows AS DOUBLE) * n_rows / n_keys, 6)
         AS independence_estimate,
       round(CAST(exact_join_size AS DOUBLE)
             / (CAST(n_rows AS DOUBLE) * n_rows / n_keys), 6)
         AS skew_ratio
FROM u ORDER BY key_col""",
}
