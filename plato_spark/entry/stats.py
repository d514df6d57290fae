"""Entry-registry queries: stats domain (split from the former
monolithic __spark_entry__.py; round-5 manifest-ization).
"""

from __future__ import annotations

from plato_spark.entry.common import (  # noqa: F401
    F,
    _observed_catalog,
    _sql_group_quantiles,
    _sql_mad_outliers,
    _sql_orphan_docs,
    _sql_reference_graph,
    _sql_trimmed_mean,
    load_table,
    q_reference_graph,
)


def q_theil_sen_trend(spark, sf_dir):
    """Theil-Sen robust trend of daily order revenue: the MEDIAN of all
    pairwise day-to-day slopes — outlier days move the OLS slope, not
    this one.  The quadratic pair set is over the per-day table, and
    DAYS do not scale with data volume (the bounded-offsets-table
    argument made explicit: 100x the rows is the same ~2.4k days, so
    the pair count is fixed ~3M while every per-day sum rides the
    normal fold).  Slopes are IEEE divisions of exact int64 cents /
    day gaps — identical in both engines — and the median is the
    value(s) at fixed ranks (ties share the value, so tie order cannot
    change the answer), averaged for even counts, ONE /100 at
    read-out."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    per = (
        o.select(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long").alias("day_i"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
            .alias("pc"))
        .groupBy("day_i").agg(F.sum("pc").cast("long").alias("rev_c"))
    )
    a = per.select(F.col("day_i").alias("di"), F.col("rev_c").alias("ri"))
    b = per.select(F.col("day_i").alias("dj"), F.col("rev_c").alias("rj"))
    pairs = a.join(b, F.col("dj") > F.col("di")).select(
        ((F.col("rj") - F.col("ri"))
         / (F.col("dj") - F.col("di")).cast("double")).alias("slope"))
    w = Window.orderBy("slope")
    ranked = pairs.select("slope", F.row_number().over(w).alias("rn"))
    m = pairs.count()
    lo, hi = (m + 1) // 2, (m + 2) // 2
    med = ranked.where(F.col("rn").isin([lo, hi])).agg(
        F.avg("slope").alias("med"))
    return med.select(
        F.lit(m).cast("long").alias("n_pairs"),
        F.round(F.col("med") / 100.0, 6).alias("slope_per_day"))


def q_user_simpson_diversity(spark, sf_dir):
    """Per-user Gini-Simpson activity diversity: the probability two
    random events of the user differ in type, 1 - sum c_i(c_i-1) /
    (n(n-1)) — the diversity metric WITHOUT logs (source_entropy's
    bits need a documented libm caveat; this one is exact integer
    folds + ONE division).  Single-event users report NULL (no pair
    exists), never a fabricated 0."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    return per.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("ss"),
    ).select(
        "user_id", "n_events", "n_types",
        F.when(
            F.col("n_events") > 1,
            F.round(1 - F.col("ss")
                    / (F.col("n_events") * (F.col("n_events") - 1)), 6),
        ).alias("simpson"),
    )


def q_domain_counts(spark, sf_dir):
    """URL host frequency across the corpus (source-mix analysis) over
    deterministically planted URLs (see q_redact_pii)."""
    from plato_spark.functions.text import domain_counts

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see http://site"), F.col("doc_id") % 5,
            F.lit(".example.com/x/"), F.col("doc_id"),
            F.when(F.col("doc_id") % 2 == 0,
                   F.concat(F.lit(" and https://mirror.example.net/"),
                            F.col("doc_id"))).otherwise(F.lit("")),
        ).alias("text"),
    )
    return domain_counts(planted)


def q_cochange_lift(spark, sf_dir):
    """Top-50 item pairs by association-rule lift over order baskets
    (functions/recommend.association_lift) — the co-change-prediction
    signal for the code corpus, market-basket lift for curation."""
    from plato_spark.functions.recommend import association_lift

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    return association_lift(li, k=50, min_support=2)


def q_label_consistency(spark, sf_dir):
    """Per-doc neighborhood label agreement (algos/mixing
    .label_consistency) over the citation support graph — the
    weak-supervision QA pass flagging docs whose lang tag disagrees
    with their citation neighborhood; the per-vertex form of
    attr_assortativity."""
    from plato_spark.algos.mixing import label_consistency

    edges = q_reference_graph(spark, sf_dir)
    labels = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return label_consistency(edges, labels)


def q_orphan_docs(spark, sf_dir):
    """Per-source citation-orphan share: docs with zero citation
    degree in either direction (never cited, citing nothing) — the
    'dead weight' curation signal a link-graph corpus watches per
    container.  Composes instability's degree table; exact integers,
    one rounded division."""
    from plato_spark.algos.citations import instability

    edges = q_reference_graph(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    inst = instability(edges, docs.select(F.col("doc_id").alias("id")))
    j = docs.select(F.col("doc_id").alias("id"), "source").join(
        inst.select("id", (F.col("fan_in") + F.col("fan_out") == 0)
                    .alias("orphan")), "id")
    return (
        j.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum(F.when(F.col("orphan"), 1).otherwise(0)).cast("long")
             .alias("orphans"))
        .select("source", "n_docs", "orphans",
                F.round((F.lit(100) * F.col("orphans")) / F.col("n_docs"), 6)
                .alias("orphan_pct"))
    )


def q_group_quantiles(spark, sf_dir):
    """Per-event-type histogram quantiles fully in-plan
    (functions/quantiles.group_quantiles): broadcast per-group stats
    instead of driver-collected scalars, group-partitioned cumulative
    window, the proven interpolation ladder."""
    from plato_spark.functions.quantiles import group_quantiles

    return group_quantiles(
        load_table(spark, sf_dir, "events"), "event_type", "value"
    )


def q_props_stats(spark, sf_dir):
    """Typed extraction from the semi-structured event payload:
    from_json(props, 'k INT') — the JSON column is parsed ONCE into a
    typed struct JVM-side (never string-sliced per use), then per
    event type: rows, null-payload rows, exact integer sum/min/max of
    k.  The semi-structured operator class: at 100 TB the payload
    column dominates scan bytes, and the typed parse keeps everything
    in whole-stage codegen — no Python, no UDF."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k INT").alias("p"),
    ).select("event_type", F.col("p.k").cast("long").alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).cast("long")
        .alias("n_null"),
        F.sum("k").cast("long").alias("k_sum"),
        F.min("k").cast("long").alias("k_min"),
        F.max("k").cast("long").alias("k_max"),
    )


def q_catalog_breadth(spark, sf_dir):
    """TPC-H-Q16 shape over the observed catalog: per brand the
    distinct suppliers, distinct parts, and observed (part, supplier)
    pair count — supply-base breadth.  Two count-distincts share ONE
    expand over the pair-deduped catalog; part tag joins on
    partkey."""
    cat = _observed_catalog(spark, sf_dir).select(
        "l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = cat.join(p, F.col("l_partkey") == F.col("p_partkey"))
    return j.groupBy("p_brand").agg(
        F.count_distinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.count_distinct("l_partkey").cast("long").alias("n_parts"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"))


def q_active_users(spark, sf_dir):
    """DAU / trailing-7d / trailing-28d distinct active users per
    observed day (functions/events.active_users): distinct (day, user)
    pairs exploded to their <= 28 bounded target days — never a
    non-equi range join — one groupBy with conditional distincts."""
    from plato_spark.functions.events import active_users

    return active_users(load_table(spark, sf_dir, "events"))


def q_trimmed_mean(spark, sf_dir):
    """Per-type trimmed mean over the [p05, p95] quantile band
    (functions/quantiles.trimmed_mean): broadcast 6dp band edges, kept
    values fold as exact integer cents, one rounded division."""
    from plato_spark.functions.quantiles import trimmed_mean

    return trimmed_mean(load_table(spark, sf_dir, "events"),
                        "event_type", "value")


def q_mad_outliers(spark, sf_dir):
    """Median-absolute-deviation outliers per type
    (functions/quantiles.mad_outliers): the robust twin of
    value_outliers — histogram medians of value and |value - med|,
    exact integer counts."""
    from plato_spark.functions.quantiles import mad_outliers

    return mad_outliers(load_table(spark, sf_dir, "events"),
                        "event_type", "value")


QUERIES = {
    "domain_counts": q_domain_counts,
    "theil_sen_trend": q_theil_sen_trend,
    "user_simpson_diversity": q_user_simpson_diversity,
    "label_consistency": q_label_consistency,
    "props_stats": q_props_stats,
    "catalog_breadth": q_catalog_breadth,
    "group_quantiles": q_group_quantiles,
    "trimmed_mean": q_trimmed_mean,
    "mad_outliers": q_mad_outliers,
    "active_users": q_active_users,
    "orphan_docs": q_orphan_docs,
    "cochange_lift": q_cochange_lift,
}


ORACLES = {
    "domain_counts": """
            WITH planted AS (
              SELECT doc_id,
                     text || ' see http://site' || (doc_id % 5)
                          || '.example.com/x/' || doc_id
                          || CASE WHEN doc_id % 2 = 0
                             THEN ' and https://mirror.example.net/' || doc_id
                             ELSE '' END AS text
              FROM documents),
            u AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text,
                       'https?://[A-Za-z0-9./_%+~#-]+')) AS url
              FROM planted),
            d AS (
              SELECT doc_id,
                     regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS domain
              FROM u WHERE regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) != '')
            SELECT domain,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_urls
            FROM d GROUP BY domain""",
    "theil_sen_trend": """
WITH per AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_i,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1),
pairs AS MATERIALIZED (
  SELECT (b.rev_c - a.rev_c) / CAST(b.day_i - a.day_i AS DOUBLE)
           AS slope
  FROM per a JOIN per b ON b.day_i > a.day_i),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
r AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn FROM pairs)
SELECT m.m AS n_pairs, round(avg(r.slope) / 100.0, 6) AS slope_per_day
FROM r, m WHERE r.rn IN ((m.m + 1) // 2, (m.m + 2) // 2)
GROUP BY m.m""",
    "user_simpson_diversity": """
WITH per AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
             FROM events GROUP BY 1, 2),
a AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c * (c - 1)) AS BIGINT) AS ss
      FROM per GROUP BY user_id)
SELECT user_id, n_events, n_types,
       CASE WHEN n_events > 1
            THEN round(1 - CAST(ss AS DOUBLE)
                       / (n_events * (n_events - 1)), 6)
            ELSE NULL END AS simpson
FROM a ORDER BY user_id""",
    "label_consistency": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            sup AS (SELECT DISTINCT least(src, dst) AS a,
                           greatest(src, dst) AS b
                    FROM g WHERE src != dst),
            sym AS (SELECT a AS u, b AS v FROM sup
                    UNION ALL SELECT b, a FROM sup),
            j AS (SELECT sym.u, du.lang AS own, dv.lang AS nl
                  FROM sym JOIN documents du ON sym.u = du.doc_id
                           JOIN documents dv ON sym.v = dv.doc_id)
            SELECT u AS id, own AS label,
                   CAST(count(*) AS BIGINT) AS nbr_total,
                   CAST(sum(CASE WHEN own = nl THEN 1 ELSE 0 END)
                        AS BIGINT) AS nbr_same,
                   round(CAST(sum(CASE WHEN own = nl THEN 1 ELSE 0 END)
                              AS DOUBLE) / count(*), 6) AS consistency
            FROM j GROUP BY u, own""",
    "props_stats": """
WITH p AS (SELECT event_type,
                  CAST(json_extract(props, 'k') AS BIGINT) AS k
           FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(min(k) AS BIGINT) AS k_min,
       CAST(max(k) AS BIGINT) AS k_max
FROM p GROUP BY event_type ORDER BY event_type""",
    "catalog_breadth": """
WITH cat AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand,
       CAST(count(DISTINCT cat.l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(count(DISTINCT cat.l_partkey) AS BIGINT) AS n_parts,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM cat JOIN part p ON cat.l_partkey = p.p_partkey
GROUP BY p.p_brand ORDER BY p.p_brand""",
    "group_quantiles": _sql_group_quantiles(256),
    "trimmed_mean": _sql_trimmed_mean(256),
    "mad_outliers": _sql_mad_outliers(256, 3.0),
    "active_users": """
WITH du AS MATERIALIZED (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u FROM events),
dd AS (SELECT DISTINCT d FROM du)
SELECT strftime(dd.d, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT CASE WHEN du.d = dd.d THEN du.u END) AS BIGINT)
         AS dau,
       CAST(count(DISTINCT CASE WHEN du.d >= dd.d - 6 THEN du.u END)
            AS BIGINT) AS wau,
       CAST(count(DISTINCT du.u) AS BIGINT) AS mau
FROM dd JOIN du ON du.d <= dd.d AND du.d >= dd.d - 27
GROUP BY dd.d ORDER BY day""",
    "orphan_docs": _sql_orphan_docs(),
    "cochange_lift": """
            WITH inc AS MATERIALIZED (
              SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
            ok AS (SELECT b FROM inc GROUP BY b HAVING count(*) <= 256),
            inc2 AS MATERIALIZED (
              SELECT inc.b, inc.i FROM inc JOIN ok USING (b)),
            nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets
                   FROM inc2),
            cnt AS MATERIALIZED (
              SELECT i, CAST(count(*) AS BIGINT) AS c FROM inc2 GROUP BY i),
            p AS (SELECT a.i AS src, d.i AS dst,
                         CAST(count(*) AS BIGINT) AS support
                  FROM inc2 a JOIN inc2 d ON a.b = d.b AND a.i < d.i
                  GROUP BY a.i, d.i HAVING count(*) >= 2)
            SELECT src, dst, support,
                   round(CAST(support * n_baskets AS DOUBLE)
                         / CAST(ca.c * cb.c AS DOUBLE), 6) AS lift
            FROM p JOIN cnt ca ON p.src = ca.i
                   JOIN cnt cb ON p.dst = cb.i
                   CROSS JOIN nb
            ORDER BY lift DESC, src ASC, dst ASC LIMIT 50""",
}
