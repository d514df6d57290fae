"""Entry-registry queries: events domain (split from the former
monolithic __spark_entry__.py; round-5 manifest-ization).
"""

from __future__ import annotations

from plato_spark.entry.common import (  # noqa: F401
    F,
    FUNNEL_SWEEP_S,
    FUNNEL_WINDOW_S,
    H1_SQL,
    MARKOV_ITERS,
    _sql_conversion_latency,
    _sql_funnel_sensitivity,
    _sql_gq_chain,
    _sql_markov_stationary,
    _sql_peak_concurrency,
    _sql_session_gaps,
    _sql_session_stats,
    load_table,
)


def q_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint over daily order revenue: the day where the
    cumulative deviation from the all-period mean rate peaks — the
    single most likely level-shift point.  Exactness: dev_t =
    |n * cumsum_t - t * total| is a pure int64 cross-multiply (never a
    float mean fed into a running sum; cents x day-index stays < 2^63
    by orders of magnitude at any plausible SF), the argmax is ONE
    struct-max scalar aggregate with ties broken to the earliest day,
    and the only division is the normalized read-out.  The running sum
    rides a window over the pre-aggregated per-day table (|days| rows —
    the bounded offsets-table role)."""
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
    w = Window.orderBy("day_i").rowsBetween(Window.unboundedPreceding, 0)
    t = Window.orderBy("day_i")
    cum = per.select(
        "day_i",
        F.sum("rev_c").over(w).alias("cum"),
        F.row_number().over(t).cast("long").alias("t_idx"))
    tot = per.agg(F.sum("rev_c").cast("long").alias("total"),
                  F.count(F.lit(1)).cast("long").alias("n"))
    dev = cum.crossJoin(F.broadcast(tot)).select(
        "day_i", "total", "n",
        F.abs(F.col("n") * F.col("cum")
              - F.col("t_idx") * F.col("total")).alias("dev"))
    best = dev.agg(F.max(F.struct(F.col("dev"), (-F.col("day_i"))
                                  .alias("nd"))).alias("m"),
                   F.max("total").alias("total"), F.max("n").alias("n"))
    return best.select(
        (-F.col("m.nd")).alias("day_i"),
        F.col("m.dev").alias("scaled_dev"),
        F.round(F.col("m.dev") / (F.col("n") * F.col("total")), 6)
        .alias("rel_dev"),
    )


def q_funnel_sensitivity(spark, sf_dir):
    """The windowed funnel's W, swept: view -> click -> purchase at 1h /
    6h / 1d conversion windows in one result — the curve that tells you
    whether windowed_funnel's pinned W sits on a cliff or a plateau
    (the inter_event_gaps pick-the-knee discipline, applied to the
    funnel definition itself).  Each window is the same exact
    integer-microsecond anchor chain; rows = |windows| x |steps|."""
    from plato_spark.functions.events import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    out = None
    for w in FUNNEL_SWEEP_S:
        f = funnel_counts(ev, ["view", "click", "purchase"],
                          window_s=w).select(
            F.lit(w).cast("long").alias("window_s"),
            "step", "event_type", "users")
        out = f if out is None else out.unionByName(f)
    return out


def q_coactivity_churn(spark, sf_dir):
    """Temporal edge churn of the co-activity graph: build the graph
    from the FIRST and SECOND half of the event range (split at the
    exact integer midpoint of min/max epoch micros — never wall-clock)
    and read edge counts, overlap, and Jaccard — how stable is the
    inferred social structure across time?  A near-zero Jaccard says
    every downstream graph metric is a snapshot artifact.  Exact
    integer counts, one rounded division."""
    from plato_spark.functions.events import co_activity_edges

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = ev.agg(F.min(us).alias("mn"), F.max(us).alias("mx")).select(
        F.expr("(mn + mx) div 2").alias("mid"))
    tagged = ev.crossJoin(F.broadcast(bounds))
    ea = co_activity_edges(tagged.where(us < F.col("mid")))
    eb = co_activity_edges(tagged.where(us >= F.col("mid")))
    n_a = ea.count()
    n_b = eb.count()
    common = ea.select("src", "dst").join(
        eb.select("src", "dst"), ["src", "dst"], "left_semi").count()
    base = spark.createDataFrame(
        [(n_a, n_b, common)],
        "edges_early long, edges_late long, common_edges long")
    # the division stays a Spark expression (half-up round), never
    # python round() (half-even) — 6dp tie discipline
    return base.select(
        "*",
        F.round(F.col("common_edges")
                / (F.col("edges_early") + F.col("edges_late")
                   - F.col("common_edges")), 6).alias("jaccard"))


def q_events_card(spark, sf_dir):
    """One-row event-stream dashboard: events, users, span days,
    events-per-user, distinct types — the ingest sanity block beside
    corpus_card and graph_card.  Exact integers; span from exact
    microsecond min/max; one rounded division."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.unix_micros(F.min(F.col("ts").cast("timestamp"))).alias("lo"),
        F.unix_micros(F.max(F.col("ts").cast("timestamp"))).alias("hi"),
    )
    return g.select(
        "n_events", "n_users", "n_types",
        F.expr("(hi - lo) div 86400000000").cast("long").alias("span_days"),
        F.round(F.col("n_events") / F.col("n_users"), 6)
        .alias("events_per_user"),
    )


def q_events_windowed(spark, sf_dir):
    """Batch form of the streaming tumbling-window aggregation
    (plato_spark.streaming.windowed_event_counts)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"),
             F.round(F.sum("value"), 6).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "value_sum")
    )


def q_inter_event_gaps(spark, sf_dir):
    """Per-user inter-arrival profile in exact integer microseconds
    (functions/events.inter_event_gaps) — the empirical basis for the
    sessionization break and watermark delay."""
    from plato_spark.functions.events import inter_event_gaps

    return inter_event_gaps(load_table(spark, sf_dir, "events"))


def q_event_transitions(spark, sf_dir):
    """First-order event-type Markov transition matrix
    (functions/events.event_transitions) along each user's timeline."""
    from plato_spark.functions.events import event_transitions

    return event_transitions(load_table(spark, sf_dir, "events"))


def q_markov_eval(spark, sf_dir):
    """Top-1 next-event prediction accuracy of the first-order Markov
    model across the day-parity split (functions/events.markov_eval) —
    train transitions on half 0, argmax-predict, score on half 1; the
    generalization check behind event_transitions."""
    from plato_spark.functions.events import markov_eval

    return markov_eval(load_table(spark, sf_dir, "events"))


def q_funnel(spark, sf_dir):
    """view -> click -> purchase funnel over the event stream: users
    reaching each step in strict timestamp order (functions/events)."""
    from plato_spark.functions.events import funnel_counts

    return funnel_counts(
        load_table(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def q_asof_next(spark, sf_dir):
    """Forward as-of join (functions/events.asof_next): each view/click
    matched to the user's earliest purchase at-or-after within 1 hour —
    the time-to-convert mirror of asof_attribution, same tagged-union +
    one-user-keyed-window plan traversed descending."""
    from plato_spark.functions.events import asof_next

    return asof_next(load_table(spark, sf_dir, "events"), window_s=3600)


def q_conversion_latency(spark, sf_dir):
    """Time-to-convert quantiles (asof_next matches -> histogram
    quantiles over the gap, read in SECONDS): the latency distribution
    behind the conversion-window choice (windowed_funnel's W and
    asof_next's cap stop being folklore).

    Seconds, not microseconds, through the histogram: at sf0.1 the
    gaps reach ~4e11 us, where one double ulp (6.1e-5) EXCEEDS the 6dp
    readout grain — the interpolation product then differs by one ulp
    across engines and survives rounding (caught by the sf0.1 sweep).
    At seconds magnitude (~4e5) the ulp is ~1e-10 and the 6dp contract
    is safe by six orders."""
    from plato_spark.functions.events import asof_next
    from plato_spark.functions.quantiles import histogram_quantiles

    m = asof_next(load_table(spark, sf_dir, "events"), window_s=None)
    m = m.where(F.col("conversion_id").isNotNull()).withColumn(
        "gap_s", F.col("gap_us").cast("double") / F.lit(1000000.0))
    return histogram_quantiles(
        m, "gap_s", quantiles=(0.5, 0.9, 0.99), nbins=256,
    )


def q_rec_coverage(spark, sf_dir):
    """Catalog coverage + exposure Gini of the co-purchase recommender
    (functions/recommend.rec_coverage): never-recommended items stay in
    the Gini denominator — leaving them out flatters every
    recommender."""
    from plato_spark.functions.recommend import rec_coverage

    inc = load_table(spark, sf_dir, "orders").join(
        load_table(spark, sf_dir, "lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(F.col("o_custkey").alias("user"),
             F.col("l_partkey").alias("item"))
    return rec_coverage(inc, k=5)


def q_frequent_triples(spark, sf_dir):
    """Frequent 3-itemsets over order baskets
    (functions/recommend.frequent_triples): one distributed Apriori
    round — candidates only from frequent pairs with the (y,z) closure
    check, three basket-keyed semi-joins for counting."""
    from plato_spark.functions.recommend import frequent_triples

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    return frequent_triples(li, min_support=2)


def q_event_trigrams(spark, sf_dir):
    """Behavioural event-type 3-grams (functions/events.event_trigrams):
    one per-user window with two leads, (ts, event_id)-pinned order,
    exact counts over <= |types|^3 groups."""
    from plato_spark.functions.events import event_trigrams

    return event_trigrams(load_table(spark, sf_dir, "events"))


def q_propensity_by_activity(spark, sf_dir):
    """Purchase propensity by activity bucket: users bucketed by the
    integer bit length of their event count (the deterministic log2
    discipline — never libm, never a global rank), per bucket the user
    count, buyers, and conversion share.  The 'do heavy users actually
    buy more?' read-out behind engagement-driven ranking.  Exact
    integers, one rounded division per bucket."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("purchases"),
    )
    return (
        per.groupBy(F.length(F.bin(F.col("n_events"))).cast("int")
                    .alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("users"),
             F.sum(F.when(F.col("purchases") > 0, 1).otherwise(0))
             .cast("long").alias("buyers"))
        .select("bucket", "users", "buyers",
                F.round((F.lit(100) * F.col("buyers")) / F.col("users"), 6)
                .alias("buyer_pct"))
    )


def q_error_precursors(spark, sf_dir):
    """What users do immediately before an error: the lag-1 event-type
    distribution over error events (first-event-of-timeline errors
    count under 'none') — the triage signal behind interval_counts'
    window counts.  One per-user window lag pinned by (ts, event_id),
    exact counts, one rounded share division."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("event_type") == "error")
        .groupBy(F.coalesce("prev", F.lit("none")).alias("prev_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = p.agg(F.sum("n").cast("long").alias("tot"))
    return p.crossJoin(F.broadcast(tot)).select(
        "prev_type", "n",
        F.round((F.lit(100) * F.col("n")) / F.col("tot"), 6)
        .alias("share_pct"),
    )


def q_hourly_profile(spark, sf_dir):
    """Hour-of-day seasonality + conversion profile
    (functions/events.hourly_profile): <= 24 groups, exact counts, one
    guarded division."""
    from plato_spark.functions.events import hourly_profile

    return hourly_profile(load_table(spark, sf_dir, "events"))


def q_session_gaps(spark, sf_dir):
    """Inter-session gap quantiles: time from a session's last event to
    the user's next session's first event, through the proven histogram
    quantile kernel over exact integer microseconds — the empirical
    basis for the 30-minute session timeout itself (the
    inter_event_gaps pick-the-knee discipline applied one level up:
    gaps far above 30 min say the timeout isn't splitting real
    visits)."""
    from pyspark.sql import Window

    from plato_spark.functions.quantiles import histogram_quantiles

    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                   "user_id")
        .agg(F.min("ts").alias("st"), F.max("ts").alias("en"))
    )
    w = Window.partitionBy("user_id").orderBy("st")
    # parquet ts is TIMESTAMP_NTZ; cast reinterprets for unix_micros.
    # Gaps convert to SECONDS before the kernel: multi-hour gaps in µs
    # are ~3e10 and a 6dp-rounded double needs 17 significant digits
    # there — past float64; in seconds the same rounding is exact.
    # Both engines divide the SAME exact integer by 1e6, so the IEEE
    # result is bit-identical.
    st_us = F.unix_micros(F.col("st").cast("timestamp"))
    en_us = F.unix_micros(F.col("en").cast("timestamp"))
    gaps = sess.select(
        "user_id",
        ((st_us - F.lag(en_us).over(w)).cast("double")
         / F.lit(1e6)).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    return histogram_quantiles(gaps, "gap_s",
                               quantiles=(0.5, 0.9, 0.99), nbins=256)


def q_audience_overlap(spark, sf_dir):
    """Set algebra over event audiences: viewers INTERSECT buyers,
    viewers EXCEPT buyers, buyers EXCEPT viewers — the funnel-leak
    Venn as one 3-row read-out.  The point is the operator class:
    INTERSECT/EXCEPT compile to aggregate-based semi/anti plans over
    the deduped key sets (each side collapses to distinct user_ids
    BEFORE the set op — at 100 TB the events never meet each other
    row-to-row)."""
    ev = load_table(spark, sf_dir, "events")
    viewers = ev.where(F.col("event_type") == "view").select(
        "user_id").distinct()
    buyers = ev.where(F.col("event_type") == "purchase").select(
        "user_id").distinct()

    def _n(df, tag):
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_users")
                      ).select(F.lit(tag).alias("relation"), "n_users")

    return (
        _n(viewers.intersect(buyers), "view_and_buy")
        .unionByName(_n(viewers.subtract(buyers), "view_only"))
        .unionByName(_n(buyers.subtract(viewers), "buy_only"))
    )


def q_error_conversion_impact(spark, sf_dir):
    """Do errors kill conversion?  Per has-error flag over 30-minute
    sessions: session count and the share that converts (contains a
    purchase) — the incident-impact read-out composed from the proven
    session windows; exact counts, one rounded division."""
    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                   "user_id")
        .agg(F.max(F.when(F.col("event_type") == "error", 1)
                   .otherwise(0)).alias("has_error"),
             F.max(F.when(F.col("event_type") == "purchase", 1)
                   .otherwise(0)).alias("has_purchase"))
    )
    return sess.groupBy("has_error").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("has_purchase").cast("long").alias("n_converted"),
        F.round((F.lit(100) * F.sum("has_purchase"))
                / F.count(F.lit(1)), 6).alias("conversion_pct"),
    )


def q_lifetime_quantiles(spark, sf_dir):
    """User lifetime (first to last event) quantiles in seconds through
    the proven histogram kernel — the engagement-horizon read-out
    behind retention_cohorts' window choice.  Exact integer µs spans
    divided by 1e6 once (the session_gaps float64-precision
    lesson)."""
    from plato_spark.functions.quantiles import histogram_quantiles

    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    span = ev.groupBy("user_id").agg(
        ((F.max(ts_us) - F.min(ts_us)).cast("double") / F.lit(1e6))
        .alias("lifetime_s"))
    return histogram_quantiles(span, "lifetime_s",
                               quantiles=(0.5, 0.9, 0.99), nbins=256)


def q_event_grouping_sets(spark, sf_dir):
    """Custom GROUPING SETS — (type), (day), (type, day) — in ONE pass:
    the grouping-set operator class beyond ROLLUP/CUBE's fixed
    lattices (this set is NOT a rollup: it keeps both one-dimensional
    marginals but drops the grand total).  Spark expands all three
    sets before a single exchange; lvl = GROUPING bits
    disambiguate."""
    ev = load_table(spark, sf_dir, "events")
    ev.select("event_type",
              F.date_format("ts", "yyyy-MM-dd").alias("day")
              ).createOrReplaceTempView("ev_gs")
    return spark.sql("""
        SELECT event_type, day,
               CAST(grouping(event_type) * 2 + grouping(day) AS INT)
                 AS lvl,
               CAST(count(*) AS BIGINT) AS n
        FROM ev_gs
        GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
    """)


def q_audience_jaccard(spark, sf_dir):
    """Pairwise Jaccard between event-type audiences: the full
    |types| x |types| overlap matrix generalizing audience_overlap's
    single Venn — which behaviours share users.  The pair universe
    comes from the type list itself (zero-intersection pairs emit 0 —
    the 0-row lesson); intersections ride ONE self-join of the deduped
    (user, type) incidence on user_id; exact integers, one division."""
    ev = load_table(spark, sf_dir, "events")
    inc = ev.select("user_id", F.col("event_type").alias("t")).distinct()
    marg = inc.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("m"))
    inter = (
        inc.alias("a")
        .join(inc.alias("b"),
              (F.col("a.user_id") == F.col("b.user_id"))
              & (F.col("a.t") < F.col("b.t")))
        .groupBy(F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
        .agg(F.count(F.lit(1)).cast("long").alias("nab"))
    )
    pairs = (
        marg.select(F.col("t").alias("ta"), F.col("m").alias("ma"))
        .join(marg.select(F.col("t").alias("tb"), F.col("m").alias("mb")),
              F.col("ta") < F.col("tb"))
    )
    return (
        pairs.join(inter, ["ta", "tb"], "left")
        .select(
            "ta", "tb",
            F.coalesce("nab", F.lit(0)).cast("long").alias("n_both"),
            "ma", "mb",
            F.round(F.coalesce("nab", F.lit(0))
                    / (F.col("ma") + F.col("mb")
                       - F.coalesce("nab", F.lit(0))), 6).alias("jaccard"),
        )
    )


def q_markov_stationary(spark, sf_dir):
    """Stationary distribution of the first-order event-type Markov
    chain: 8 power iterations x_{t+1} = x_t P from uniform over the
    measured transition matrix (functions/events.event_transitions
    counts; probabilities recomputed as the same exact n/rowsum
    division in both engines — never the 6dp-rounded prob column,
    which would compound).  PageRank's kernel on a |types|-state
    chain: every join is broadcast-scale, the oracle unrolls the same
    8 steps, and states nothing transitions INTO get explicit 0 mass
    via the left join (the zero-bin discipline)."""
    from plato_spark.functions.events import event_transitions

    tr = event_transitions(load_table(spark, sf_dir, "events")).select(
        "src_type", "dst_type", "n")
    rows = tr.groupBy("src_type").agg(F.sum("n").alias("rs"))
    P = tr.join(rows, "src_type").select(
        "src_type", "dst_type",
        (F.col("n") / F.col("rs")).alias("p")).persist()
    states = (
        P.select(F.col("src_type").alias("state"))
        .unionByName(P.select(F.col("dst_type").alias("state")))
        .distinct().persist()
    )
    ns = states.agg(F.count(F.lit(1)).cast("long").alias("k"))
    x = states.crossJoin(F.broadcast(ns)).select(
        "state", (F.lit(1.0) / F.col("k")).alias("w"))
    for _ in range(MARKOV_ITERS):
        step = (
            P.join(x, F.col("state") == F.col("src_type"))
            .groupBy(F.col("dst_type").alias("state2"))
            .agg(F.sum(F.col("w") * F.col("p")).alias("w2"))
        )
        x = states.join(step, F.col("state") == F.col("state2"), "left"
                        ).select("state",
                                 F.coalesce("w2", F.lit(0.0)).alias("w"))
    return x.select("state", F.round("w", 6).alias("w"))


def q_session_stats(spark, sf_dir):
    """Session-quality dashboard (functions/events.session_stats):
    bounce share, mean events, exact integer duration stats over the
    proven boundary-inclusive session_window rule."""
    from plato_spark.functions.events import session_stats

    return session_stats(load_table(spark, sf_dir, "events"))


def q_rate_spikes(spark, sf_dir):
    """Per-type hourly event counts flagged against the type's own rate
    distribution (functions/events.rate_spikes): value_outliers' z-score
    discipline keyed on time buckets, 6dp-pre-rounded mean/std, exact
    epoch-microsecond hours."""
    from plato_spark.functions.events import rate_spikes

    return rate_spikes(load_table(spark, sf_dir, "events"))


def q_events_sessions(spark, sf_dir):
    """Batch session windows (native F.session_window; the streaming
    counterpart is plato_spark.streaming.sessionize_events). A session
    extends while consecutive events are <= 30 min apart — the window
    end is last_event + gap, boundary-INCLUSIVE, so an exactly-30-min
    gap still merges (proven by a peak_concurrency fixture; the oracle
    mirrors <=)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "value_sum")
    )


def q_snapshot_diff(spark, sf_dir):
    """Dataset snapshot diff (functions/packing.snapshot_diff): v2 is
    synthesized deterministically from the documents table (hash mod
    10: 0 -> removed, 1 -> text edited, 2 -> cloned under a new id);
    the diff joins (id, md5 digest) pairs only — bodies never
    shuffle."""
    from plato_spark.functions.packing import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    from plato_spark.functions.text import portable_h1

    m = F.pmod(
        portable_h1(F.concat(F.lit("diffv2|"), F.col("doc_id").cast("string"))),
        F.lit(10),
    )
    base = docs.withColumn("m", m)
    v2 = base.where(F.col("m") != 0).select(
        "doc_id",
        F.when(F.col("m") == 1, F.concat(F.col("text"), F.lit(" [v2]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = base.where(F.col("m") == 2).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" [new]")).alias("text"),
    )
    return snapshot_diff(docs, v2.unionByName(added))


def q_asof_attribution(spark, sf_dir):
    """Backward as-of join (last-touch attribution): each purchase event
    matched to the user's latest view/click at or before it
    (functions/events.asof_attribution — tagged union + one running
    window, never a per-row inequality subquery; oracle is DuckDB's
    LATERAL top-1, a genuinely different plan)."""
    from plato_spark.functions.events import asof_attribution

    return asof_attribution(load_table(spark, sf_dir, "events"))


def q_interval_counts(spark, sf_dir):
    """Banded range join: per error event, the same user's view/click
    count in the strictly-preceding 10 minutes
    (functions/events.interval_counts — time-bucket equi-join with a
    2-bucket probe explode; oracle is the naive inequality join)."""
    from plato_spark.functions.events import interval_counts

    return interval_counts(load_table(spark, sf_dir, "events"), window_s=600)


def q_burstiness(spark, sf_dir):
    """Goh-Barabasi burstiness B = (sigma-mu)/(sigma+mu) of per-user
    inter-event gaps (functions/events.burstiness): exact integer-second
    sufficient statistics, one IEEE op sequence, 6dp read-out."""
    from plato_spark.functions.events import burstiness

    return burstiness(load_table(spark, sf_dir, "events"))


def q_peak_concurrency(spark, sf_dir):
    """Max simultaneously-open sessions + earliest attaining timestamp
    (functions/events.peak_concurrency): session_window sessions, the
    +1/-1 sweep collapsed to order-independent per-ts aggregates, and
    the sequence_packing distributed prefix sum over time buckets."""
    from plato_spark.functions.events import peak_concurrency

    return peak_concurrency(load_table(spark, sf_dir, "events"))


def q_windowed_funnel(spark, sf_dir):
    """view -> click -> purchase funnel with a 1-day conversion window
    per step (functions/events.funnel_counts window_s): the constraint
    every product funnel ships with, exact integer-microsecond bounds."""
    from plato_spark.functions.events import funnel_counts

    return funnel_counts(
        load_table(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        window_s=FUNNEL_WINDOW_S,
    )


def q_first_day_conversion(spark, sf_dir):
    """Activation audit: how many users convert (purchase) on their
    FIRST active day — the onboarding-funnel headline.  Exact integer
    day comparison (min day per user vs purchase days), one row, one
    division."""
    ev = load_table(spark, sf_dir, "events")
    d = F.datediff(F.col("ts").cast("date"),
                   F.lit("1970-01-01").cast("date")).cast("long")
    days = ev.select("user_id", d.alias("d"),
                     (F.col("event_type") == "purchase").alias("p"))
    first = days.groupBy("user_id").agg(F.min("d").alias("fd"))
    conv = (
        days.where("p")
        .join(first, "user_id")
        .where(F.col("d") == F.col("fd"))
        .select("user_id").distinct()
    )
    n_users = first.count()
    n_conv = conv.count()
    out = spark.createDataFrame(
        [(n_users, n_conv)], "n_users long, n_first_day_converts long")
    return out.select(
        "*",
        F.round(F.col("n_first_day_converts") / F.col("n_users"), 6)
        .alias("first_day_conversion"))


def q_daily_error_rate(spark, sf_dir):
    """Per-day error pressure of the event stream: events, errors and
    the exact error rate per calendar day — the ops dashboard row the
    rate_spikes detector thresholds.  Integer day index (epoch days),
    one division, days without events absent."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(
        F.datediff(F.col("ts").cast("date"),
                   F.lit("1970-01-01").cast("date"))
        .cast("long").alias("day_i")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long").alias("n_errors"))
    return per.select(
        "day_i", "n_events", "n_errors",
        F.round(F.col("n_errors") / F.col("n_events"), 6)
        .alias("error_rate"))


def q_hourly_conversion(spark, sf_dir):
    """Conversion rate by hour of day: views/clicks vs purchases per
    hour bucket with the exact purchase-per-touch ratio — the dayparting
    read behind send-time optimization.  NULL rate on hours with no
    touches (never a fake 0)."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(F.hour(F.col("ts")).cast("int").alias("hour")).agg(
        F.sum(F.when(F.col("event_type").isin("view", "click"), 1)
              .otherwise(0)).cast("long").alias("n_touches"),
        F.sum(F.when(F.col("event_type") == "purchase", 1)
              .otherwise(0)).cast("long").alias("n_purchases"))
    return per.select(
        "hour", "n_touches", "n_purchases",
        F.when(F.col("n_touches") > 0,
               F.round(F.col("n_purchases") / F.col("n_touches"), 6))
        .alias("conversion"))


def q_stickiness(spark, sf_dir):
    """Per-day DAU / trailing-7-day WAU stickiness — the engagement
    ratio product teams watch.  WAU via a 7-value explode of each
    activity day into the windows it serves (d .. d+6) equi-joined to
    the observed-day set (never a sliding distinct window, which Spark
    cannot do exactly; never a band BNLJ — the explode makes it a pure
    hash equi-join, the interval_counts idiom), exact integer counts,
    one division.  Days with no events are absent (consistent with the
    distinct-day accounting elsewhere)."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.datediff(F.col("ts").cast("date"),
                   F.lit("1970-01-01").cast("date"))
        .cast("long").alias("d"), "user_id").distinct().persist()
    dau = du.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("dau"))
    days = du.select("d").distinct()
    wau = (
        du.select(
            F.explode(F.sequence(F.col("d"), F.col("d") + F.lit(6)))
            .alias("d"), "user_id")
        .join(days, "d")
        .distinct()
        .groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("wau"))
    )
    return dau.join(wau, "d").select(
        F.col("d").alias("day_i"), "dau", "wau",
        F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"))


def q_attribution_comparison(spark, sf_dir):
    """First-touch vs last-touch attribution disagreement: for every
    purchase, the earliest and latest preceding view/click of the same
    user (ties by event_id — the asof_attribution discipline), and one
    row of exact counts: how many conversions exist, how many have any
    touch, and how often the two models credit the SAME event — the
    number that says whether the attribution-model debate matters on
    this data."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conversion_id"), "user_id",
        us.alias("cts"))
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_id").alias("touch_id"), us.alias("tts"))
    j = conv.join(touch, "user_id").where(F.col("tts") <= F.col("cts"))
    w_first = Window.partitionBy("conversion_id").orderBy(
        F.col("tts").asc(), F.col("touch_id").asc())
    w_last = Window.partitionBy("conversion_id").orderBy(
        F.col("tts").desc(), F.col("touch_id").desc())
    picked = j.select(
        "conversion_id",
        F.first("touch_id").over(w_first).alias("first_touch"),
        F.first("touch_id").over(w_last).alias("last_touch"),
    ).distinct()
    n_conv = conv.count()
    agg = picked.agg(
        F.count(F.lit(1)).cast("long").alias("with_touch"),
        F.sum(F.when(F.col("first_touch") == F.col("last_touch"), 1)
              .otherwise(0)).cast("long").alias("same_touch"))
    return agg.select(
        F.lit(n_conv).cast("long").alias("n_conversions"),
        "with_touch", "same_touch",
        F.round(F.col("same_touch") / F.col("with_touch"), 6)
        .alias("same_frac"))


def q_latency_variance(spark, sf_dir):
    """Per-supplier ship-latency spread WITHOUT float sums: day gaps
    are exact integers, so mean and the unbiased sample variance come
    from the all-integer identity var = (n*sum(x^2) - sum(x)^2) /
    (n*(n-1)) — two integer folds, two correctly-rounded divisions.
    The consistency read behind supplier SLAs (shipping_latency gives
    the quantiles; this gives the moment).  Single-shipment suppliers
    report NULL variance, never a fake 0."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    gap = li.join(o.select(F.col("o_orderkey").alias("l_orderkey"),
                           "o_orderdate"), "l_orderkey").select(
        "l_suppkey",
        F.datediff(F.col("l_shipdate").cast("date"),
                   F.col("o_orderdate").cast("date"))
        .cast("long").alias("d"))
    agg = gap.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("s"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("ss"))
    return agg.select(
        "l_suppkey", "n",
        F.round(F.col("s") / F.col("n"), 6).alias("mean_days"),
        F.when(F.col("n") > 1,
               F.round((F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
                       / (F.col("n") * (F.col("n") - 1)), 6))
        .alias("var_days"))


def q_user_twap(spark, sf_dir):
    """Per-user TIME-weighted average of the event value (the step-
    function integral: each value holds until the user's next event;
    TWAP = sum v_i * dt_i / total time) — the financial/metering
    aggregate a plain mean silently gets wrong under irregular
    sampling.  Exact integer arithmetic: values in cents, gaps in epoch
    micros, one division at read-out; single-event users are NULL
    (no interval exists), never a fake mean.  One user-partitioned
    window (lead) + one agg."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seg = ev.select(
        "user_id", "cents", "us",
        F.lead("us").over(w).alias("nxt"))
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("nxt").isNotNull(),
                     F.col("cents") * (F.col("nxt") - F.col("us"))))
        .cast("long").alias("weighted_cents_us"),
        F.sum(F.when(F.col("nxt").isNotNull(),
                     F.col("nxt") - F.col("us")))
        .cast("long").alias("span_us"),
    ).select(
        "user_id", "n_events", "span_us",
        F.when(F.col("span_us") > 0,
               F.round(F.col("weighted_cents_us") / F.col("span_us")
                       / 100, 6)).alias("twap"))


def q_seasonal_naive_error(spark, sf_dir):
    """Forecast-baseline eval of daily order revenue: mean absolute
    error of the seasonal-naive forecast (value 7 days earlier) vs the
    1-step naive (previous PRESENT day is not used — strictly d-1;
    calendar gap days are skipped, not zero-filled), and their MASE-like
    ratio.  The sanity floor any revenue forecasting model must beat.
    Exact integer cents; divisions only at the three read-outs."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).alias("day_i")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
          .alias("cents"))
    base = per.select(F.col("day_i").alias("d"),
                      F.col("cents").alias("v"))

    def err(lag):
        prev = per.select((F.col("day_i") + lag).alias("d"),
                          F.col("cents").alias("pv"))
        return base.join(prev, "d").agg(
            F.count(F.lit(1)).cast("long"),
            F.sum(F.abs(F.col("v") - F.col("pv"))).cast("long"))

    n7, ae7 = err(7).collect()[0]
    n1, ae1 = err(1).collect()[0]
    out = spark.createDataFrame(
        [(n7, ae7, n1, ae1)],
        "n_scored_7d long, abs_err_7d_cents long, "
        "n_scored_1d long, abs_err_1d_cents long")
    mae7 = F.col("abs_err_7d_cents") / F.col("n_scored_7d")
    mae1 = F.col("abs_err_1d_cents") / F.col("n_scored_1d")
    return out.select(
        "*",
        F.round(mae7 / 100, 6).alias("mae_7d"),
        F.round(mae1 / 100, 6).alias("mae_1d"),
        F.when((F.col("abs_err_1d_cents") > 0)
               & (F.col("n_scored_7d") > 0),
               F.round(mae7 / mae1, 6)).alias("mase_vs_naive1"))


QUERIES = {
    "asof_attribution": q_asof_attribution,
    "interval_counts": q_interval_counts,
    "windowed_funnel": q_windowed_funnel,
    "cusum_changepoint": q_cusum_changepoint,
    "funnel_sensitivity": q_funnel_sensitivity,
    "coactivity_churn": q_coactivity_churn,
    "markov_eval": q_markov_eval,
    "burstiness": q_burstiness,
    "peak_concurrency": q_peak_concurrency,
    "rate_spikes": q_rate_spikes,
    "session_gaps": q_session_gaps,
    "audience_overlap": q_audience_overlap,
    "audience_jaccard": q_audience_jaccard,
    "markov_stationary": q_markov_stationary,
    "lifetime_quantiles": q_lifetime_quantiles,
    "event_grouping_sets": q_event_grouping_sets,
    "error_conversion_impact": q_error_conversion_impact,
    "conversion_latency": q_conversion_latency,
    "asof_next": q_asof_next,
    "session_stats": q_session_stats,
    "events_card": q_events_card,
    "hourly_profile": q_hourly_profile,
    "propensity_by_activity": q_propensity_by_activity,
    "error_precursors": q_error_precursors,
    "frequent_triples": q_frequent_triples,
    "rec_coverage": q_rec_coverage,
    "event_trigrams": q_event_trigrams,
    "inter_event_gaps": q_inter_event_gaps,
    "event_transitions": q_event_transitions,
    "event_funnel": q_funnel,
    "events_windowed": q_events_windowed,
    "events_sessions": q_events_sessions,
    "snapshot_diff": q_snapshot_diff,
    "seasonal_naive_error": q_seasonal_naive_error,
    "user_twap": q_user_twap,
    "latency_variance": q_latency_variance,
    "stickiness": q_stickiness,
    "attribution_comparison": q_attribution_comparison,
    "hourly_conversion": q_hourly_conversion,
    "daily_error_rate": q_daily_error_rate,
    "first_day_conversion": q_first_day_conversion,
}


ORACLES = {
    "asof_attribution": """
WITH l AS (SELECT event_id AS conversion_id, user_id, ts
           FROM events WHERE event_type = 'purchase'),
r AS (SELECT event_id, user_id, ts
      FROM events WHERE event_type IN ('view', 'click'))
SELECT l.conversion_id, l.user_id,
       m.event_id AS touch_id,
       CASE WHEN m.event_id IS NOT NULL
            THEN epoch_us(l.ts) - epoch_us(m.ts) END AS gap_us
FROM l LEFT JOIN LATERAL (
  SELECT r.event_id, r.ts FROM r
  WHERE r.user_id = l.user_id AND r.ts <= l.ts
  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) m ON true
ORDER BY conversion_id""",
    "interval_counts": """
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS lts
           FROM events WHERE event_type = 'error'),
r AS (SELECT user_id, epoch_us(ts) AS rts
      FROM events WHERE event_type IN ('view', 'click'))
SELECT l.event_id, l.user_id,
       CAST(count(r.rts) AS BIGINT) AS n_touches
FROM l LEFT JOIN r
  ON l.user_id = r.user_id
 AND r.rts < l.lts AND r.rts >= l.lts - 600000000
GROUP BY l.event_id, l.user_id ORDER BY l.event_id""",
    "windowed_funnel": """
WITH u1 AS MATERIALIZED (
  SELECT user_id AS u, min(ts) AS a FROM events
  WHERE event_type = 'view' GROUP BY user_id),
u2 AS MATERIALIZED (
  SELECT e.user_id AS u, min(e.ts) AS a FROM events e
  JOIN u1 ON e.user_id = u1.u
  WHERE e.event_type = 'click' AND e.ts > u1.a
    AND epoch_us(e.ts) <= epoch_us(u1.a) + 86400000000 GROUP BY e.user_id),
u3 AS MATERIALIZED (
  SELECT e.user_id AS u, min(e.ts) AS a FROM events e
  JOIN u2 ON e.user_id = u2.u
  WHERE e.event_type = 'purchase' AND e.ts > u2.a
    AND epoch_us(e.ts) <= epoch_us(u2.a) + 86400000000 GROUP BY e.user_id)
SELECT CAST(1 AS INTEGER) AS step, 'view' AS event_type,
       (SELECT CAST(count(*) AS BIGINT) FROM u1) AS users
UNION ALL SELECT 2, 'click', (SELECT count(*) FROM u2)
UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM u3)""",
    "cusum_changepoint": """
WITH per AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_i,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1),
tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n FROM per),
cum AS (SELECT day_i,
          CAST(sum(rev_c) OVER (ORDER BY day_i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum,
          CAST(row_number() OVER (ORDER BY day_i) AS BIGINT) AS t_idx
        FROM per),
dev AS (SELECT c.day_i, abs(t.n * c.cum - c.t_idx * t.total) AS dev,
               t.total, t.n
        FROM cum c, tot t)
SELECT day_i, CAST(dev AS BIGINT) AS scaled_dev,
       round(CAST(dev AS DOUBLE) / (n * total), 6) AS rel_dev
FROM dev ORDER BY dev DESC, day_i ASC LIMIT 1""",
    "funnel_sensitivity": _sql_funnel_sensitivity(FUNNEL_SWEEP_S),
    "coactivity_churn": """
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
           FROM events),
uea AS (SELECT DISTINCT user_id AS u, event_type AS t,
          date_trunc('hour', ts) AS h
        FROM events, b WHERE epoch_us(ts) < b.mid),
oka AS (SELECT t, h FROM uea GROUP BY t, h HAVING count(*) <= 256),
u2a AS (SELECT uea.u, uea.t, uea.h FROM uea
        JOIN oka ON uea.t = oka.t AND uea.h = oka.h),
ea AS MATERIALIZED (
  SELECT DISTINCT x.u AS src, y.u AS dst
  FROM u2a x JOIN u2a y ON x.t = y.t AND x.h = y.h AND x.u < y.u),
ueb AS (SELECT DISTINCT user_id AS u, event_type AS t,
          date_trunc('hour', ts) AS h
        FROM events, b WHERE epoch_us(ts) >= b.mid),
okb2 AS (SELECT t, h FROM ueb GROUP BY t, h HAVING count(*) <= 256),
u2b AS (SELECT ueb.u, ueb.t, ueb.h FROM ueb
        JOIN okb2 ON ueb.t = okb2.t AND ueb.h = okb2.h),
eb AS MATERIALIZED (
  SELECT DISTINCT x.u AS src, y.u AS dst
  FROM u2b x JOIN u2b y ON x.t = y.t AND x.h = y.h AND x.u < y.u),
s AS (SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM ea) AS edges_early,
  (SELECT CAST(count(*) AS BIGINT) FROM eb) AS edges_late,
  (SELECT CAST(count(*) AS BIGINT) FROM ea
   WHERE EXISTS (SELECT 1 FROM eb
                 WHERE eb.src = ea.src AND eb.dst = ea.dst))
    AS common_edges)
SELECT edges_early, edges_late, common_edges,
       round(CAST(common_edges AS DOUBLE)
             / (edges_early + edges_late - common_edges), 6) AS jaccard
FROM s""",
    "markov_eval": """
            WITH t0 AS MATERIALIZED (
              SELECT t AS s, nt AS d, CAST(count(*) AS BIGINT) AS n
              FROM (SELECT event_type AS t,
                           lead(event_type) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id)
                             AS nt
                    FROM events
                    WHERE date_diff('day', DATE '1970-01-01',
                                    CAST(ts AS DATE)) % 2 = 0) x
              WHERE nt IS NOT NULL GROUP BY 1, 2),
            t1 AS MATERIALIZED (
              SELECT t AS s, nt AS d, CAST(count(*) AS BIGINT) AS n
              FROM (SELECT event_type AS t,
                           lead(event_type) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id)
                             AS nt
                    FROM events
                    WHERE date_diff('day', DATE '1970-01-01',
                                    CAST(ts AS DATE)) % 2 = 1) x
              WHERE nt IS NOT NULL GROUP BY 1, 2),
            pred AS (SELECT s, d AS pred FROM (
                       SELECT s, d, row_number() OVER (
                         PARTITION BY s ORDER BY n DESC, d) AS rk
                       FROM t0) z WHERE rk = 1),
            ntr AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS n_train
                    FROM t0),
            sc AS (SELECT
                     CAST(COALESCE(sum(t1.n), 0) AS BIGINT) AS n_eval,
                     CAST(COALESCE(sum(CASE WHEN t1.d = pred.pred
                                            THEN t1.n ELSE 0 END), 0)
                          AS BIGINT) AS correct
                   FROM t1 LEFT JOIN pred ON t1.s = pred.s)
            SELECT n_train, n_eval, correct,
                   CASE WHEN n_eval > 0
                        THEN round(CAST(correct AS DOUBLE) / n_eval, 6)
                   END AS accuracy
            FROM ntr, sc""",
    "burstiness": """
WITH g AS MATERIALIZED (
  SELECT user_id,
         CAST(floor((epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) / 1000000)
         AS BIGINT) AS gs
  FROM events),
a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gs) AS BIGINT) AS s,
             CAST(sum(gs * gs) AS BIGINT) AS ss
      FROM g WHERE gs IS NOT NULL GROUP BY user_id)
SELECT user_id, n_gaps,
       CASE WHEN sqrt(greatest(ss / n_gaps - (s / n_gaps) * (s / n_gaps),
                               0.0)) + s / n_gaps > 0
            THEN round((sqrt(greatest(ss / n_gaps
                                      - (s / n_gaps) * (s / n_gaps), 0.0))
                        - s / n_gaps)
                       / (sqrt(greatest(ss / n_gaps
                                        - (s / n_gaps) * (s / n_gaps), 0.0))
                          + s / n_gaps), 6) END AS b
FROM a ORDER BY user_id""",
    "peak_concurrency": _sql_peak_concurrency(1800),
    "rate_spikes": """
WITH per AS MATERIALIZED (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) * 3600000000 AS BIGINT)
           AS hour_us,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hour_us),
g AS (SELECT event_type, count(*) AS k, CAST(sum(n) AS BIGINT) AS s,
             CAST(sum(n * n) AS BIGINT) AS ss
      FROM per GROUP BY event_type),
st AS (SELECT event_type,
              round(CAST(s AS DOUBLE) / k, 6) AS mean,
              round(sqrt(greatest(CAST(ss AS DOUBLE) / k
                                  - (CAST(s AS DOUBLE) / k)
                                    * (CAST(s AS DOUBLE) / k), 0.0)), 6)
                AS std
       FROM g)
SELECT p.event_type, p.hour_us, p.n, st.mean, st.std,
       (st.std > 0 AND abs(p.n - st.mean) > 3.0 * st.std) AS is_spike
FROM per p JOIN st ON p.event_type = st.event_type
ORDER BY p.event_type, p.hour_us""",
    "session_gaps": _sql_session_gaps(),
    "audience_overlap": """
WITH v AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'view'),
b AS (SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase')
SELECT 'view_and_buy' AS relation,
       CAST((SELECT count(*) FROM (SELECT * FROM v INTERSECT
                                   SELECT * FROM b)) AS BIGINT)
         AS n_users
UNION ALL
SELECT 'view_only',
       CAST((SELECT count(*) FROM (SELECT * FROM v EXCEPT
                                   SELECT * FROM b)) AS BIGINT)
UNION ALL
SELECT 'buy_only',
       CAST((SELECT count(*) FROM (SELECT * FROM b EXCEPT
                                   SELECT * FROM v)) AS BIGINT)""",
    "audience_jaccard": """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT user_id, event_type AS t FROM events),
marg AS (SELECT t, CAST(count(*) AS BIGINT) AS m FROM inc GROUP BY t),
inter AS (
  SELECT a.t AS ta, b.t AS tb, CAST(count(*) AS BIGINT) AS nab
  FROM inc a JOIN inc b ON a.user_id = b.user_id AND a.t < b.t
  GROUP BY a.t, b.t),
pairs AS (
  SELECT ma.t AS ta, ma.m AS ma, mb.t AS tb, mb.m AS mb
  FROM marg ma JOIN marg mb ON ma.t < mb.t)
SELECT p.ta, p.tb, COALESCE(i.nab, 0) AS n_both, p.ma, p.mb,
       round(CAST(COALESCE(i.nab, 0) AS DOUBLE)
             / (p.ma + p.mb - COALESCE(i.nab, 0)), 6) AS jaccard
FROM pairs p LEFT JOIN inter i ON p.ta = i.ta AND p.tb = i.tb
ORDER BY p.ta, p.tb""",
    "markov_stationary": _sql_markov_stationary(),
    "lifetime_quantiles": "WITH " + _sql_gq_chain(
            256, (0.5, 0.9, 0.99),
            """SELECT 0 AS g,
                      CAST(epoch_us(max(ts)) - epoch_us(min(ts))
                           AS DOUBLE) / 1e6 AS x
               FROM events GROUP BY user_id""",
        ) + "\nSELECT q, value FROM val ORDER BY q",
    "event_grouping_sets": """
WITH ev AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day
            FROM events)
SELECT event_type, day,
       CAST(GROUPING(event_type) * 2 + GROUPING(day) AS INTEGER) AS lvl,
       CAST(count(*) AS BIGINT) AS n
FROM ev
GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
ORDER BY lvl, event_type, day""",
    "error_conversion_impact": """
WITH x AS (
  SELECT user_id, ts, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS brk
  FROM events),
g AS (SELECT user_id, event_type,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM x),
sess AS (SELECT user_id, grp,
                max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS has_error,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS has_purchase
         FROM g GROUP BY user_id, grp)
SELECT has_error, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(has_purchase) AS BIGINT) AS n_converted,
       round(CAST(100 * sum(has_purchase) AS DOUBLE) / count(*), 6)
         AS conversion_pct
FROM sess GROUP BY has_error ORDER BY has_error""",
    "conversion_latency": _sql_conversion_latency(256),
    "asof_next": """
WITH e AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS ts,
                  event_id AS eid
           FROM events),
tch AS MATERIALIZED (SELECT u, ts, eid FROM e
                     WHERE t IN ('view', 'click')),
cv AS MATERIALIZED (SELECT u, ts, eid FROM e WHERE t = 'purchase')
SELECT t.eid AS touch_id, t.u AS user_id,
       CAST(c.ceid AS BIGINT) AS conversion_id,
       CAST(c.gap AS BIGINT) AS gap_us
FROM tch t LEFT JOIN LATERAL (
  SELECT c.eid AS ceid, c.ts - t.ts AS gap
  FROM cv c
  WHERE c.u = t.u AND c.ts >= t.ts AND c.ts <= t.ts + 3600000000
  ORDER BY c.ts, c.eid LIMIT 1) c ON TRUE
ORDER BY touch_id""",
    "session_stats": _sql_session_stats(1800),
    "events_card": """
WITH g AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
                  CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
                  CAST(max(epoch_us(ts)) AS BIGINT) AS hi
           FROM events)
SELECT n_events, n_users, n_types,
       CAST((hi - lo) // 86400000000 AS BIGINT) AS span_days,
       round(CAST(n_events AS DOUBLE) / n_users, 6) AS events_per_user
FROM g""",
    "hourly_profile": """
WITH g AS (
  SELECT CAST(hour(ts) AS INTEGER) AS hour,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_denom,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_numer
  FROM events GROUP BY hour)
SELECT hour, n_events, n_denom, n_numer,
       CASE WHEN n_denom > 0
            THEN round(CAST(n_numer AS DOUBLE) / n_denom, 6) END AS cvr
FROM g ORDER BY hour""",
    "propensity_by_activity": """
WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                    CAST(sum(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END) AS BIGINT) AS purchases
             FROM events GROUP BY user_id)
SELECT CAST(length(bin(n_events)) AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS users,
       CAST(sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS buyers,
       round(CAST(100 * sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS buyer_pct
FROM per GROUP BY bucket ORDER BY bucket""",
    "error_precursors": """
WITH s AS (SELECT event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
p AS (SELECT COALESCE(prev, 'none') AS prev_type,
             CAST(count(*) AS BIGINT) AS n
      FROM s WHERE event_type = 'error' GROUP BY prev_type),
tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM p)
SELECT prev_type, n,
       round(CAST(100 * n AS DOUBLE) / tt.tot, 6) AS share_pct
FROM p, tt ORDER BY prev_type""",
    "frequent_triples": """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
ok AS (SELECT b FROM inc GROUP BY b HAVING count(*) <= 256),
inc2 AS MATERIALIZED (SELECT inc.b, inc.i FROM inc JOIN ok ON inc.b = ok.b),
t AS (SELECT a.b, a.i AS x, c.i AS y, d.i AS z
      FROM inc2 a JOIN inc2 c ON a.b = c.b AND a.i < c.i
                  JOIN inc2 d ON a.b = d.b AND c.i < d.i)
SELECT x, y, z, CAST(count(*) AS BIGINT) AS support
FROM t GROUP BY x, y, z HAVING count(*) >= 2
ORDER BY x, y, z""",
    "rec_coverage": """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
ok AS (SELECT u FROM inc GROUP BY u HAVING count(*) <= 256),
inc2 AS MATERIALIZED (SELECT i.u, i.i FROM inc i JOIN ok ON i.u = ok.u),
dg AS MATERIALIZED (
  SELECT i, CAST(count(*) AS BIGINT) AS d FROM inc2 GROUP BY i),
co AS MATERIALIZED (
  SELECT a.i AS x, b.i AS y, CAST(count(*) AS BIGINT) AS co
  FROM inc2 a JOIN inc2 b ON a.u = b.u AND a.i < b.i GROUP BY a.i, b.i),
bo AS (SELECT x, y, co FROM co
       UNION ALL SELECT y AS x, x AS y, co FROM co),
sc AS (SELECT bo.x AS item, bo.y AS rec, bo.co / sqrt(dx.d * dy.d) AS score
       FROM bo JOIN dg dx ON bo.x = dx.i JOIN dg dy ON bo.y = dy.i),
rr AS (SELECT item, rec FROM (
         SELECT item, rec,
                row_number() OVER (PARTITION BY item
                                   ORDER BY score DESC, rec ASC) AS rank
         FROM sc) z WHERE rank <= 5),
cat AS (SELECT DISTINCT i FROM inc),
expo AS (SELECT CAST(COALESCE(e.cnt, 0) AS BIGINT) AS v FROM cat
         LEFT JOIN (SELECT rec AS i, CAST(count(*) AS BIGINT) AS cnt
                    FROM rr GROUP BY rec) e ON cat.i = e.i),
hist AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM expo GROUP BY v),
h2 AS (SELECT v, c,
         CAST(COALESCE(sum(c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o
       FROM hist),
a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(v * c) AS BIGINT) AS t,
             CAST(sum(v * (c * o + (c * (c + 1)) // 2)) AS BIGINT) AS s
      FROM h2),
nr AS (SELECT CAST(count(DISTINCT rec) AS BIGINT) AS items_recommended
       FROM rr)
SELECT a.n AS catalog_items, nr.items_recommended,
       round(CAST(100 * nr.items_recommended AS DOUBLE) / a.n, 6)
         AS coverage_pct,
       round((2.0 * a.s) / (CAST(a.n AS DOUBLE) * CAST(a.t AS DOUBLE))
             - CAST(a.n + 1 AS DOUBLE) / CAST(a.n AS DOUBLE), 6)
         AS exposure_gini
FROM a, nr""",
    "event_trigrams": """
WITH s AS (
  SELECT user_id,
         event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM s WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3 ORDER BY t1, t2, t3""",
    "inter_event_gaps": """
            WITH x AS (SELECT user_id,
                 date_diff('microsecond',
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id),
                           ts) AS gap
               FROM events)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(gap) AS BIGINT) AS n_gaps,
                   CAST(min(gap) AS BIGINT) AS min_gap_us,
                   CAST(max(gap) AS BIGINT) AS max_gap_us,
                   CAST(CAST(sum(gap) AS BIGINT) // count(gap)
                        AS BIGINT) AS avg_gap_us
            FROM x GROUP BY user_id""",
    "event_transitions": """
            WITH s AS (SELECT event_type AS t,
                         lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS nt
                       FROM events),
            c AS (SELECT t AS src_type, nt AS dst_type,
                         CAST(count(*) AS BIGINT) AS n
                  FROM s WHERE nt IS NOT NULL GROUP BY 1, 2)
            SELECT src_type, dst_type, n,
                   round(CAST(n AS DOUBLE)
                         / sum(n) OVER (PARTITION BY src_type), 6) AS prob
            FROM c""",
    "event_funnel": """
WITH u1 AS MATERIALIZED (
  SELECT user_id AS u, min(ts) AS a FROM events
  WHERE event_type = 'view' GROUP BY user_id),
u2 AS MATERIALIZED (
  SELECT e.user_id AS u, min(e.ts) AS a FROM events e
  JOIN u1 ON e.user_id = u1.u
  WHERE e.event_type = 'click' AND e.ts > u1.a GROUP BY e.user_id),
u3 AS MATERIALIZED (
  SELECT e.user_id AS u, min(e.ts) AS a FROM events e
  JOIN u2 ON e.user_id = u2.u
  WHERE e.event_type = 'purchase' AND e.ts > u2.a GROUP BY e.user_id)
SELECT CAST(1 AS INTEGER) AS step, 'view' AS event_type,
       (SELECT CAST(count(*) AS BIGINT) FROM u1) AS users
UNION ALL SELECT 2, 'click', (SELECT count(*) FROM u2)
UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM u3)""",
    "events_windowed": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 6) AS value_sum
            FROM events GROUP BY date_trunc('hour', ts), event_type""",
    "events_sessions": """
            WITH x AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               <= INTERVAL 30 MINUTE
                          THEN 0 ELSE 1 END AS brk
              FROM events),
            g AS (SELECT user_id, ts, value,
                         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS grp
                  FROM x)
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 6) AS value_sum
            FROM g GROUP BY user_id, grp""",
    "snapshot_diff": f"""
            WITH m AS (SELECT doc_id, text,
                    ({H1_SQL.format(s="('diffv2|' || CAST(doc_id AS VARCHAR))")})
                      % 10 AS m
                       FROM documents),
            v2 AS (SELECT doc_id,
                          CASE WHEN m = 1 THEN text || ' [v2]' ELSE text END
                            AS text
                   FROM m WHERE m != 0
                   UNION ALL
                   SELECT doc_id + 10000000, text || ' [new]'
                   FROM m WHERE m = 2),
            a AS (SELECT doc_id AS id, md5(text) AS ho FROM documents),
            b AS (SELECT doc_id AS id, md5(text) AS hn FROM v2)
            SELECT COALESCE(a.id, b.id) AS id,
                   CASE WHEN a.id IS NULL THEN 'added'
                        WHEN b.id IS NULL THEN 'removed'
                        WHEN ho = hn THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM a FULL OUTER JOIN b ON a.id = b.id""",
    "seasonal_naive_error": """
WITH per AS (SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                         AS BIGINT) AS day_i,
                    CAST(sum(CAST(round(o_totalprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM orders GROUP BY 1),
e7 AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(abs(a.cents - b.cents)) AS BIGINT) AS ae
       FROM per a JOIN per b ON a.day_i = b.day_i + 7),
e1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(abs(a.cents - b.cents)) AS BIGINT) AS ae
       FROM per a JOIN per b ON a.day_i = b.day_i + 1)
SELECT e7.n AS n_scored_7d, e7.ae AS abs_err_7d_cents,
       e1.n AS n_scored_1d, e1.ae AS abs_err_1d_cents,
       round((CAST(e7.ae AS DOUBLE) / e7.n) / 100, 6) AS mae_7d,
       round((CAST(e1.ae AS DOUBLE) / e1.n) / 100, 6) AS mae_1d,
       CASE WHEN e1.ae > 0 AND e7.n > 0
            THEN round((CAST(e7.ae AS DOUBLE) / e7.n)
                       / (CAST(e1.ae AS DOUBLE) / e1.n), 6)
       END AS mase_vs_naive1
FROM e7, e1""",
    "user_twap": """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
s AS (SELECT user_id, cents, us,
             lead(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS nxt
      FROM e)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN nxt IS NOT NULL THEN nxt - us END) AS BIGINT)
         AS span_us,
       CASE WHEN COALESCE(sum(CASE WHEN nxt IS NOT NULL
                                   THEN nxt - us END), 0) > 0
            THEN round(CAST(sum(CASE WHEN nxt IS NOT NULL
                                     THEN cents * (nxt - us) END)
                            AS DOUBLE)
                       / sum(CASE WHEN nxt IS NOT NULL
                                  THEN nxt - us END) / 100, 6)
       END AS twap
FROM s GROUP BY user_id ORDER BY user_id""",
    "latency_variance": """
WITH g AS (SELECT l.l_suppkey,
                  CAST(CAST(l.l_shipdate AS DATE)
                       - CAST(o.o_orderdate AS DATE) AS BIGINT) AS d
           FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey),
a AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS s,
             CAST(sum(d * d) AS BIGINT) AS ss
      FROM g GROUP BY l_suppkey)
SELECT l_suppkey, n,
       round(CAST(s AS DOUBLE) / n, 6) AS mean_days,
       CASE WHEN n > 1
            THEN round(CAST(n * ss - s * s AS DOUBLE)
                       / (n * (n - 1)), 6) END AS var_days
FROM a ORDER BY l_suppkey""",
    "stickiness": """
WITH du AS (SELECT DISTINCT CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                                 AS BIGINT) AS d, user_id
            FROM events),
dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d),
days AS (SELECT DISTINCT d FROM du),
wau AS (SELECT days.d, CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
        FROM days JOIN du ON du.d <= days.d AND du.d >= days.d - 6
        GROUP BY days.d)
SELECT dau.d AS day_i, dau.dau, wau.wau,
       round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
FROM dau JOIN wau ON dau.d = wau.d ORDER BY day_i""",
    "attribution_comparison": """
WITH conv AS (SELECT event_id AS conversion_id, user_id,
                     epoch_us(ts) AS cts
              FROM events WHERE event_type = 'purchase'),
touch AS (SELECT user_id, event_id AS touch_id, epoch_us(ts) AS tts
          FROM events WHERE event_type IN ('view', 'click')),
j AS (SELECT c.conversion_id, t.touch_id, t.tts
      FROM conv c JOIN touch t
        ON c.user_id = t.user_id AND t.tts <= c.cts),
p AS (SELECT DISTINCT conversion_id,
        first_value(touch_id) OVER (PARTITION BY conversion_id
          ORDER BY tts ASC, touch_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          AS first_touch,
        first_value(touch_id) OVER (PARTITION BY conversion_id
          ORDER BY tts DESC, touch_id DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          AS last_touch
      FROM j)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM conv) AS n_conversions,
       CAST(count(*) AS BIGINT) AS with_touch,
       CAST(sum(CASE WHEN first_touch = last_touch THEN 1 ELSE 0 END)
            AS BIGINT) AS same_touch,
       round(CAST(sum(CASE WHEN first_touch = last_touch
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS same_frac
FROM p""",
    "hourly_conversion": """
WITH per AS (SELECT CAST(hour(ts) AS INTEGER) AS hour,
  CAST(sum(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
       AS BIGINT) AS n_touches,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_purchases
  FROM events GROUP BY 1)
SELECT hour, n_touches, n_purchases,
       CASE WHEN n_touches > 0
            THEN round(CAST(n_purchases AS DOUBLE) / n_touches, 6)
       END AS conversion
FROM per ORDER BY hour""",
    "daily_error_rate": """
SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_i,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_errors,
       round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS error_rate
FROM events GROUP BY 1 ORDER BY day_i""",
    "first_day_conversion": """
WITH days AS (SELECT user_id,
                     CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                          AS BIGINT) AS d,
                     event_type = 'purchase' AS p
              FROM events),
f AS (SELECT user_id, CAST(min(d) AS BIGINT) AS fd
      FROM days GROUP BY user_id),
conv AS (SELECT DISTINCT days.user_id
         FROM days JOIN f ON days.user_id = f.user_id
         WHERE days.p AND days.d = f.fd)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM f) AS n_users,
       (SELECT CAST(count(*) AS BIGINT) FROM conv)
         AS n_first_day_converts,
       round(CAST((SELECT count(*) FROM conv) AS DOUBLE)
             / (SELECT count(*) FROM f), 6) AS first_day_conversion""",
}
