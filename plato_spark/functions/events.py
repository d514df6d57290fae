"""Event-stream funnel analysis — ordered multi-step conversion counts.

The product-analytics staple: of the users who did step 1, how many
later did step 2, and later still step 3?  "Later" is strict timestamp
order (each step's anchor is the user's EARLIEST qualifying event after
the previous step's anchor), which makes the funnel deterministic
regardless of event arrival order and exactly expressible in SQL —
no sessionization windows, no per-user sorting.

Shape: one min-aggregation per step over a user-keyed semi-join chain.
Each step's input shrinks to the users still in the funnel, so at
100 TB the cost is |steps| hash aggregations keyed by user, each with
map-side combine; no window functions, no per-user event arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_counts", "asof_attribution", "interval_counts",
           "burstiness", "peak_concurrency", "rate_spikes", "asof_next", "session_stats", "active_users"]


def funnel_counts(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_s: int | None = None,
) -> DataFrame:
    """(step, event_type, users) — users reaching each funnel step in
    strict timestamp order.  ``steps`` is the ordered event-type list.

    ``window_s`` (optional) adds the conversion-window constraint every
    product funnel actually ships with: each step must occur within
    ``window_s`` seconds AFTER the previous step's anchor (half-open
    (a, a + W]); the comparison runs in exact integer microseconds (the
    inter_event_gaps lesson — no float time arithmetic)."""
    spark = events.sparkSession
    ev = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
    )
    anchors = None  # (u, a): the user's anchor time after the last step
    rows = []
    for i, step in enumerate(steps):
        cand = ev.where(F.col("t") == step)
        if anchors is not None:
            cand = cand.join(anchors, "u").where(F.col("ts") > F.col("a"))
            if window_s is not None:
                cand = cand.where(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    <= F.unix_micros(F.col("a").cast("timestamp"))
                    + int(window_s) * 1_000_000
                )
        anchors = cand.groupBy("u").agg(F.min("ts").alias("a"))
        cnt = anchors.count()
        rows.append((i + 1, step, cnt))
    return spark.createDataFrame(
        rows, "step int, event_type string, users long"
    )


def co_activity_edges(
    events: DataFrame,
    window: str = "hour",
    max_bucket: int = 256,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(src, dst, weight) — the temporal co-activity graph: two users are
    linked once per (event_type, time-bucket) they both acted in, weight
    = number of shared activity buckets.  The events->graph construction
    step (events as commits, users as files — the same co-occurrence
    extraction shape as the corpus pipeline, corpus/extract.py, with
    date_trunc as the grouping key).

    Buckets with more than ``max_bucket`` distinct users are dropped
    BEFORE the pair self-join (the extractor's clique-guard precedent):
    a viral bucket is quadratic poison and links everyone to everyone —
    no signal.  Canonical output (src < dst, exact int64 weights).
    """
    ue = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.date_trunc(window, F.col(ts_col)).alias("h"),
    ).distinct()
    ok = (
        ue.groupBy("t", "h").agg(F.count("*").alias("n"))
        .where(F.col("n") <= max_bucket)
        .select("t", "h")
    )
    ue = ue.join(ok, ["t", "h"], "left_semi")
    a = ue.select("t", "h", F.col("u").alias("src"))
    b = ue.select("t", "h", F.col("u").alias("dst"))
    return (
        a.join(b, ["t", "h"])
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def inter_event_gaps(events: DataFrame) -> DataFrame:
    """(user_id, n_events, n_gaps, min_gap_us, max_gap_us, avg_gap_us) —
    per-user inter-arrival-time profile in exact integer MICROSECONDS
    (event-time order; timestamps carry sub-second precision, so
    seconds-truncating diffs would lie).  The empirical input for
    choosing a sessionization break (the 30-minute threshold
    events_sessions hard-codes) and a watermark delay: pick the knee of
    this distribution instead of folklore.

    Plan: one per-user window lag (partitioned by the aggregation key —
    no global sort) + one groupBy; integer microsecond differences, the
    mean is an exact integer floor division (no float ties).  Single-event users report 0
    gaps and NULL gap stats (no fabricated zeros).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps load as TIMESTAMP_NTZ, which unix_micros
    # rejects; the cast reinterprets in the session zone (pinned UTC by
    # plato_spark.session) and any fixed offset cancels in the
    # difference anyway
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    lag_us = F.unix_micros(F.lag(F.col("ts")).over(w).cast("timestamp"))
    gap = (ts_us - lag_us).cast("long")
    g = events.select("user_id", "ts", "event_id").withColumn("gap", gap)
    return (
        g.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count("gap").cast("long").alias("n_gaps"),
            F.min("gap").cast("long").alias("min_gap_us"),
            F.max("gap").cast("long").alias("max_gap_us"),
            # exact integer floor mean: at ~1e9 us magnitudes a 6dp
            # double round sits below the float spacing and tie-breaks
            # differently per engine — keep the whole row integer
            F.expr("sum(gap) div count(gap)").cast("long").alias("avg_gap_us"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(src_type, dst_type, n, prob) — the first-order Markov transition
    matrix of event types along each user's timeline: n counts
    consecutive (type -> next type) steps, prob row-normalizes per
    src_type.  The behavioural-model input behind funnel design and
    next-event prediction baselines (and, for the code corpus, the
    commit-kind transition profile per author).

    Plan: ONE per-user window lead (partitioned by user — no global
    sort) + one groupBy; the row-normalizing sum runs over src_type,
    whose cardinality is the distinct event-type count (tiny), so the
    second window is effectively free.  Exact integer counts, a single
    rounded division.  Ordering is pinned by (ts, event_id) so equal
    timestamps cannot flip transitions between engines.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("u").orderBy("ts", "eid")
    ev = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"), F.col(id_col).alias("eid"),
    )
    steps = (
        ev.withColumn("nt", F.lead("t").over(w))
        .where(F.col("nt").isNotNull())
        .groupBy(F.col("t").alias("src_type"), F.col("nt").alias("dst_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    row = Window.partitionBy("src_type")
    return steps.select(
        "src_type", "dst_type", "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(row), 6)
        .alias("prob"),
    )


def retention_cohorts(events: DataFrame, max_offset: int = 14) -> DataFrame:
    """(cohort, day_offset, users) — classic day-N retention matrix.

    Cohort = the calendar day of a user's FIRST event; the row
    (cohort c, offset k) counts users from cohort c active on day c+k
    (offset 0 is the cohort size itself).  The standard growth/quality
    dashboard behind any user-event stream, and the template for
    "documents first crawled on day X still re-crawled on day X+k".

    Exact integers end-to-end.  Plan: one distinct over (user, day)
    (map-side combined), a groupBy-min per user, and a join back on
    user_id — both shuffles key on user_id, so AQE coalesces them into
    co-partitioned stages; the output is at most |days| * max_offset
    rows.  No window over the global timeline, no per-user arrays.
    Cohort is emitted as 'yyyy-MM-dd' text so downstream hashing is
    engine-portable (DATE objects round-trip differently per driver).
    """
    days = events.select(
        "user_id", F.to_date(F.col("ts").cast("timestamp")).alias("day")
    ).distinct()
    firsts = days.groupBy("user_id").agg(F.min("day").alias("cohort"))
    j = days.join(firsts, "user_id").withColumn(
        "day_offset", F.datediff("day", "cohort").cast("long")
    )
    return (
        j.where(F.col("day_offset") <= max_offset)
        .groupBy("cohort", "day_offset")
        # (user, day) is distinct by construction, so count(*) IS the
        # distinct-user count — no second expensive distinct
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            "day_offset",
            "users",
        )
    )


def markov_eval(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """1 row (n_train, n_eval, correct, accuracy) — does yesterday's
    first-order Markov model predict tomorrow?  Train the transition
    matrix on the day-parity-0 half of the stream, predict the next
    event type as the argmax transition (ties: count DESC, type ASC —
    a total order), evaluate top-1 accuracy on the parity-1 half.
    The honest generalization check behind using event_transitions for
    prefetching/UI prediction; same split idiom as hub_rank_churn.

    Eval transitions whose source type never occurred in training count
    as incorrect (they are real misses, not excludable).  Exact integer
    counts, one rounded division.  Plan: two per-user window passes
    (one per half), a groupBy on the tiny type-pair space, one
    |types|-row argmax window, one broadcast join.
    """
    from pyspark.sql import Window

    half = F.pmod(
        F.datediff(
            F.to_date(F.col(ts_col).cast("timestamp")),
            F.to_date(F.lit("1970-01-01")),
        ),
        F.lit(2),
    )

    def transitions(df):
        w = Window.partitionBy("u").orderBy("ts", "eid")
        ev = df.select(
            F.col(user_col).alias("u"), F.col(type_col).alias("t"),
            F.col(ts_col).alias("ts"), F.col(id_col).alias("eid"),
        )
        return (
            ev.withColumn("nt", F.lead("t").over(w))
            .where(F.col("nt").isNotNull())
            .groupBy(F.col("t").alias("s"), F.col("nt").alias("d"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    train = transitions(events.where(half == 0))
    evald = transitions(events.where(half == 1))

    rw = Window.partitionBy("s").orderBy(F.desc("n"), F.asc("d"))
    pred = (
        train.withColumn("rk", F.row_number().over(rw))
        .where(F.col("rk") == 1)
        .select("s", F.col("d").alias("pred"))
    )
    n_train = train.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_train")
    )
    scored = evald.join(F.broadcast(pred), "s", "left").agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_eval"),
        F.coalesce(
            F.sum(F.when(F.col("d") == F.col("pred"), F.col("n")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("correct"),
    )
    return n_train.crossJoin(F.broadcast(scored)).select(
        "n_train",
        "n_eval",
        "correct",
        F.when(
            F.col("n_eval") > 0,
            F.round(F.col("correct").cast("double") / F.col("n_eval"), 6),
        ).alias("accuracy"),
    )


def asof_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple = ("view", "click"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(conversion_id, user_id, touch_id, gap_us) — backward as-of join:
    each conversion event matched to the user's LATEST touch event at or
    before the conversion timestamp (last-touch attribution), NULL when
    no prior touch exists.

    The scale-safe as-of plan is a tagged UNION + one running window —
    never a per-row inequality subquery: both sides shuffle ONCE on the
    user key, sort within the partition by (ts, side, id), and a running
    ``last(touch, ignorenulls)`` carries the most recent touch forward
    into each conversion row.  At 100 TB that is one exchange + one sort
    — the same cost as a single repartition — vs. the quadratic blow-up
    of a naive range join.  Per-user data volumes bound the sort run;
    event streams are user-sharded by construction, so no single key
    carries more than a user's history.

    Total order within equal timestamps: touches sort BEFORE conversions
    (at-or-before semantics include an equal-ts touch) and among equal-ts
    touches the largest ``event_id`` wins — both engines replay the same
    deterministic tie-break, so the match is engine-portable.  gap_us is
    exact integer microseconds (the inter_event_gaps lesson: no float
    time arithmetic).
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        us.alias("ts_us"),
        F.col(id_col).alias("eid"),
    )
    touches = base.where(F.col("t").isin(list(touch_types))).select(
        "u", "ts_us", F.lit(0).alias("side"), "eid"
    )
    convs = base.where(F.col("t") == conversion_type).select(
        "u", "ts_us", F.lit(1).alias("side"), "eid"
    )
    w = (
        Window.partitionBy("u")
        .orderBy("ts_us", "side", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = touches.unionByName(convs)
    carried = tagged.select(
        "u", "ts_us", "side", "eid",
        F.last(F.when(F.col("side") == 0, F.col("eid")), ignorenulls=True)
        .over(w).alias("touch_id"),
        F.last(F.when(F.col("side") == 0, F.col("ts_us")), ignorenulls=True)
        .over(w).alias("touch_us"),
    )
    return (
        carried.where(F.col("side") == 1)
        .select(
            F.col("eid").alias("conversion_id"),
            F.col("u").alias("user_id"),
            F.col("touch_id").cast("long").alias("touch_id"),
            (F.col("ts_us") - F.col("touch_us")).cast("long").alias("gap_us"),
        )
    )


def interval_counts(
    events: DataFrame,
    probe_type: str = "error",
    touch_types: tuple = ("view", "click"),
    window_s: int = 600,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(event_id, user_id, n_touches) — banded range join: for each
    probe event, how many touch events the same user produced in the
    strictly-preceding ``window_s``-second interval [ts - W, ts).

    The inequality predicate alone would force a per-user cross product
    (Catalyst plans non-equi joins as nested loops).  Banding converts it
    to an EQUI-join: both sides bucket time into W-wide bins, a touch
    lives in exactly one bin, and a probe's half-open window spans at
    most two — so the probe side explodes to 2 rows and joins on
    (user, bucket).  The exact filter then runs on the ~|window| rows a
    bucket pair co-locates, never on the full per-user history.  At
    100 TB: one shuffle keyed by (user, bucket) with bounded fan-out —
    the standard interval-join banding every stream processor uses.

    Exact integer microsecond arithmetic end-to-end; probes with no
    preceding touch report 0 rather than vanishing.
    """
    wus = int(window_s) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        us.alias("ts_us"),
        F.col(id_col).alias("eid"),
    )
    probes = base.where(F.col("t") == probe_type).select("u", "ts_us", "eid")
    touches = base.where(F.col("t").isin(list(touch_types))).select(
        "u",
        F.col("ts_us").alias("r_us"),
        F.floor(F.col("ts_us") / wus).alias("bucket"),
    )
    probed = probes.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.col("ts_us") / wus),
                F.floor(F.col("ts_us") / wus) - 1,
            )
        ),
    )
    hits = (
        probed.join(touches, ["u", "bucket"])
        .where(
            (F.col("r_us") < F.col("ts_us"))
            & (F.col("r_us") >= F.col("ts_us") - wus)
        )
        .groupBy("eid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_touches"))
    )
    return (
        probes.join(hits, "eid", "left")
        .select(
            F.col("eid").alias("event_id"),
            F.col("u").alias("user_id"),
            F.coalesce("n_touches", F.lit(0)).cast("long").alias("n_touches"),
        )
    )


def burstiness(events: DataFrame) -> DataFrame:
    """(user_id, n_gaps, b) — Goh-Barabasi burstiness of each user's
    inter-event gaps: B = (sigma - mu) / (sigma + mu) over the gap
    distribution, in [-1, 1] — B near -1 is a periodic emitter, near 0
    Poisson, near +1 bursty.  The single-scalar refinement of
    inter_event_gaps that rate-limiting / anomaly policies key on.

    Engine discipline: gaps fold as exact integer SECONDS (floor of the
    microsecond diff / 1e6 — second-granularity squares stay within
    int64 where microsecond squares would overflow; the floor of an
    exact double quotient below 2^53 is engine-identical), sufficient
    statistics are BIGINT sums, then sigma/mu/B are one identical IEEE
    op sequence with a single 6dp round at read-out.  sigma + mu == 0
    (all gaps zero) reports NULL; single-event users have no gaps and
    are absent."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    lag_us = F.unix_micros(F.lag(F.col("ts")).over(w).cast("timestamp"))
    gap_s = F.floor((ts_us - lag_us) / F.lit(1000000)).cast("long")
    g = (
        events.select("user_id", "ts", "event_id")
        .withColumn("gs", gap_s)
        .where(F.col("gs").isNotNull())
    )
    agg = g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gs").cast("long").alias("s"),
        F.sum(F.col("gs") * F.col("gs")).cast("long").alias("ss"),
    )
    mu = F.col("s") / F.col("n_gaps")
    var = F.col("ss") / F.col("n_gaps") - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    return agg.select(
        "user_id", "n_gaps",
        F.when(sigma + mu > 0,
               F.round((sigma - mu) / (sigma + mu), 6)).alias("b"),
    )


def peak_concurrency(
    events: DataFrame,
    gap_seconds: int = 1800,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """One row (n_sessions, peak, peak_at_us) — the maximum number of
    user sessions simultaneously open, and the earliest microsecond
    timestamp attaining it.  The capacity-planning read-out on top of
    sessionization (how many concurrent users must the serving tier
    hold?).

    Sessions come from the native session_window rule (a gap of
    EXACTLY ``gap_seconds`` still merges — the window end is
    last + gap, boundary-inclusive; a fixture proved this against the
    documented-sounding half-open reading), active over the CLOSED
    interval [first_ts, last_ts]; a session ending at t and another
    starting at t overlap at t.

    Scale + portability design: the classic +1/-1 sweep needs a global
    running sum — order-dependent and single-partition if done naively.
    Both problems go away by collapsing the sweep to PER-TIMESTAMP
    aggregates first: with starts counted before ends at equal ts, the
    within-ts maximum is always "cum through t plus the ends at t"
    (cand_t = cum_t + ends_t), which is order-independent by
    construction.  The running sum over the per-ts table is the
    sequence_packing distributed prefix sum: per-time-bucket partials
    (map-side combined), an exclusive prefix over the tiny bucket table
    (the only single-partition window, bounded by the corpus time span
    / ``bucket_us``), then a bucket-partitioned window.  Everything is
    exact integer arithmetic."""
    from pyspark.sql import Window

    gap = f"{int(gap_seconds)} seconds"
    s = (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            # parquet ts is TIMESTAMP_NTZ; cast reinterprets in the
            # session zone (pinned UTC) — the inter_event_gaps lesson
            F.unix_micros(F.min("ts").cast("timestamp")).alias("a_us"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("b_us"),
        )
    )
    deltas = s.select(F.col("a_us").alias("t"), F.lit(1).alias("d")).unionByName(
        s.select(F.col("b_us").alias("t"), F.lit(-1).alias("d"))
    )
    per_ts = deltas.groupBy("t").agg(
        F.sum("d").cast("long").alias("net"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0)).cast("long").alias("ends"),
    ).withColumn("bucket", F.floor(F.col("t") / F.lit(int(bucket_us))))
    tot = per_ts.groupBy("bucket").agg(F.sum("net").alias("bnet"))
    w_excl = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    off = tot.select(
        "bucket",
        F.coalesce(F.sum("bnet").over(w_excl), F.lit(0)).alias("boff"),
    )
    w_in = Window.partitionBy("bucket").orderBy("t")
    cand = (
        per_ts.join(F.broadcast(off), "bucket")
        .withColumn("cum", F.sum("net").over(w_in) + F.col("boff"))
        .select("t", (F.col("cum") + F.col("ends")).alias("cand"))
    )
    n_sessions = s.select(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    # peak + earliest attaining ts in ONE struct-max scalar aggregate
    # (lexicographic: max cand, then max -t = min t) — no re-scan of
    # cand, no argmax join
    at = cand.agg(
        F.max(F.struct(F.col("cand").alias("c"),
                       (-F.col("t")).alias("nt"))).alias("m")
    ).select(
        F.col("m.c").cast("long").alias("peak"),
        (-F.col("m.nt")).cast("long").alias("peak_at_us"),
    )
    return n_sessions.crossJoin(at)


def rate_spikes(
    events: DataFrame,
    z: float = 3.0,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(event_type, hour_us, n, mean, std, is_spike) — per-type hourly
    event counts flagged against the type's own rate distribution: an
    hour is a spike when |n - mean| > z * std.  The ingest-ops
    anomaly monitor (crawler stampedes, outage gaps) — value_outliers'
    sibling keyed on TIME buckets instead of values.

    Semantics note: the distribution runs over OBSERVED hours only —
    silent hours contribute no zero rows (imputing the full calendar
    needs a time-range generator; at 100 TB the observed-hour table is
    what the monitor actually materializes).  mean/std come from one
    map-side-combined sufficient-statistics fold and are ROUNDED 6dp
    BEFORE the comparison (the value_outliers discipline); hours emit
    as exact epoch microseconds."""
    hour_us = (
        F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                / F.lit(3_600_000_000)) * F.lit(3_600_000_000)
    ).cast("long")
    per = (
        events.select(F.col(type_col).alias("event_type"),
                      hour_us.alias("hour_us"))
        .groupBy("event_type", "hour_us")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    g = per.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    m = F.col("s") / F.col("k")
    var = F.col("ss") / F.col("k") - m * m
    stats = g.select(
        "event_type",
        F.round(m, 6).alias("mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("std"),
    )
    return (
        per.join(F.broadcast(stats), "event_type")
        .select(
            "event_type", "hour_us", "n", "mean", "std",
            ((F.col("std") > 0)
             & (F.abs(F.col("n") - F.col("mean"))
                > F.lit(float(z)) * F.col("std"))).alias("is_spike"),
        )
    )


def asof_next(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple = ("view", "click"),
    window_s: int | None = 3600,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(touch_id, user_id, conversion_id, gap_us) — FORWARD as-of join,
    asof_attribution's time-mirror: each touch event matched to the
    user's EARLIEST conversion at or after it (time-to-convert
    analysis), NULL when none follows within ``window_s`` seconds
    (unbounded when None).

    Same scale-safe plan as the backward form — tagged union + ONE
    user-keyed running window, never a per-row inequality subquery —
    with the traversal reversed: ordering by ts DESC carries the
    earliest future conversion backward into each touch row.  Total
    order at equal timestamps: conversions sort before touches (at-or-
    after includes an equal-ts conversion) and among equal-ts
    conversions the SMALLEST event_id wins (processed last in the
    descending traversal).  gap_us is exact integer microseconds; the
    window cap compares integers."""
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        us.alias("ts_us"),
        F.col(id_col).alias("eid"),
    )
    touches = base.where(F.col("t").isin(list(touch_types))).select(
        "u", "ts_us", F.lit(1).alias("side"), "eid"
    )
    convs = base.where(F.col("t") == conversion_type).select(
        "u", "ts_us", F.lit(0).alias("side"), "eid"
    )
    w = (
        Window.partitionBy("u")
        .orderBy(F.desc("ts_us"), F.asc("side"), F.desc("eid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = touches.unionByName(convs)
    carried = tagged.select(
        "u", "ts_us", "side", "eid",
        F.last(F.when(F.col("side") == 0, F.col("eid")), ignorenulls=True)
        .over(w).alias("conv_id"),
        F.last(F.when(F.col("side") == 0, F.col("ts_us")), ignorenulls=True)
        .over(w).alias("conv_us"),
    )
    out = carried.where(F.col("side") == 1)
    gap = (F.col("conv_us") - F.col("ts_us")).cast("long")
    if window_s is not None:
        keep = gap <= F.lit(int(window_s) * 1_000_000)
    else:
        keep = F.lit(True)
    ok = F.col("conv_id").isNotNull() & keep
    return out.select(
        F.col("eid").alias("touch_id"),
        F.col("u").alias("user_id"),
        F.when(ok, F.col("conv_id")).cast("long").alias("conversion_id"),
        F.when(ok, gap).cast("long").alias("gap_us"),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
) -> DataFrame:
    """One row (n_sessions, n_bounce, bounce_pct, avg_events,
    avg_dur_us, max_dur_us) — the session-quality dashboard over the
    proven session_window rule (exactly-gap merges; see
    peak_concurrency): bounce = single-event session, duration = the
    closed [first_ts, last_ts] span in exact integer microseconds.

    One session_window aggregation + one scalar fold; averages are one
    rounded division of exact integers each, except avg_dur_us which is
    an exact integer floor division (the inter_event_gaps lesson — at
    ~1e9 us magnitudes a 6dp double round sits below float spacing)."""
    gap = f"{int(gap_seconds)} seconds"
    s = (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.unix_micros(F.max("ts").cast("timestamp"))
             - F.unix_micros(F.min("ts").cast("timestamp")))
            .cast("long").alias("dur_us"),
        )
    )
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast("long")
        .alias("n_bounce"),
        F.sum("n_events").cast("long").alias("se"),
        F.sum("dur_us").cast("long").alias("sd"),
        F.max("dur_us").cast("long").alias("max_dur_us"),
    ).select(
        "n_sessions", "n_bounce",
        F.round((F.lit(100) * F.col("n_bounce")) / F.col("n_sessions"), 6)
        .alias("bounce_pct"),
        F.round(F.col("se") / F.col("n_sessions"), 6).alias("avg_events"),
        F.expr("sd div n_sessions").cast("long").alias("avg_dur_us"),
        "max_dur_us",
    )


def event_trigrams(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(t1, t2, t3, n) — frequent behavioural 3-grams: counts of
    consecutive event-type triples along each user's timeline, the
    second-order extension of event_transitions' Markov matrix (does
    view->click->purchase happen more than view->click predicts?).

    Plan: ONE per-user window with two leads (partitioned by user —
    no global sort) + one map-side-combined groupBy over at most
    |types|^3 groups; ordering pinned by (ts, event_id) so equal
    timestamps cannot flip grams between engines.  Exact integer
    counts."""
    from pyspark.sql import Window

    w = Window.partitionBy("u").orderBy("ts", "eid")
    ev = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"), F.col(id_col).alias("eid"),
    )
    return (
        ev.withColumn("t2", F.lead("t", 1).over(w))
        .withColumn("t3", F.lead("t", 2).over(w))
        .where(F.col("t3").isNotNull())
        .groupBy(F.col("t").alias("t1"), F.col("t2"), F.col("t3"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(day, dau, wau, mau) — daily / trailing-7-day / trailing-28-day
    distinct active users per observed activity day: the engagement
    dashboard every product ships (and DAU/MAU stickiness falls out as
    a ratio).  Windows are inclusive trailing (t-6..t and t-27..t);
    only days with any activity emit (no zero-imputed calendar).

    Scale plan: the input collapses to DISTINCT (day, user) pairs
    first; each pair then explodes to the <= 28 target days it can
    support (a bounded JVM sequence — never a non-equi range join /
    nested loop), and one groupBy(target) computes all three widths as
    conditional distinct counts.  The shuffle carries (day, user)
    pairs x 28 — at 100 TB this is the standard pre-aggregated
    engagement feed; exact integer counts.  ``day`` emits as yyyy-MM-dd
    text (the retention_cohorts portability lesson)."""
    du = events.select(
        F.to_date(F.col(ts_col)).alias("d"),
        F.col(user_col).alias("u"),
    ).distinct()
    days = du.select("d").distinct()
    span = du.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 27))
                  ).alias("t"),
        "d", "u",
    )
    g = (
        span.join(days.withColumnRenamed("d", "t"), "t", "left_semi")
        .groupBy("t")
        .agg(
            F.countDistinct(F.when(F.col("d") == F.col("t"), F.col("u")))
            .cast("long").alias("dau"),
            F.countDistinct(
                F.when(F.col("d") >= F.date_sub(F.col("t"), 6), F.col("u"))
            ).cast("long").alias("wau"),
            F.countDistinct("u").cast("long").alias("mau"),
        )
        .where(F.col("dau") > 0)
    )
    return g.select(F.date_format("t", "yyyy-MM-dd").alias("day"),
                    "dau", "wau", "mau")


def hourly_profile(
    events: DataFrame,
    numer_type: str = "purchase",
    denom_type: str = "view",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(hour, n_events, n_denom, n_numer, cvr) — the hour-of-day
    seasonality profile: total events, views, purchases, and the
    view->purchase conversion rate per wall-clock hour 0..23.  The
    capacity/campaign-planning complement of rate_spikes (which flags
    anomalies against OWN history; this shows the expected shape).

    One map-side-combined aggregation over <= 24 groups; exact integer
    counts, one guarded rounded division; hours come from the session
    zone (pinned UTC)."""
    h = F.hour(F.col(ts_col).cast("timestamp")).cast("int")
    g = events.groupBy(h.alias("hour")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col(type_col) == denom_type, 1).otherwise(0))
        .cast("long").alias("n_denom"),
        F.sum(F.when(F.col(type_col) == numer_type, 1).otherwise(0))
        .cast("long").alias("n_numer"),
    )
    return g.select(
        "hour", "n_events", "n_denom", "n_numer",
        F.when(F.col("n_denom") > 0,
               F.round(F.col("n_numer") / F.col("n_denom"), 6)).alias("cvr"),
    )


def co_activity_contacts(
    events: DataFrame,
    window: str = "hour",
    max_bucket: int = 256,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(src, dst, tm) — the TEMPORAL contact list behind
    :func:`co_activity_edges`: one directed row per (user pair,
    event_type, time-bucket) contact, ``tm`` = the bucket start in
    exact epoch MICROSECONDS (both orientations — a shared activity
    bucket transmits either way).  Where co_activity_edges collapses
    time into a weight, this keeps it: the input
    algos/temporal.temporal_reachability needs, since reachability on
    the collapsed graph overstates reach by routing through contacts
    that already happened.  Same viral-bucket guard (> ``max_bucket``
    users dropped BEFORE the pair join)."""
    ue = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.date_trunc(window, F.col(ts_col)).alias("h"),
    ).distinct()
    ok = (
        ue.groupBy("t", "h").agg(F.count("*").alias("n"))
        .where(F.col("n") <= max_bucket)
        .select("t", "h")
    )
    ue = ue.join(ok, ["t", "h"], "left_semi")
    a = ue.select("t", "h", F.col("u").alias("src"))
    b = ue.select("t", "h", F.col("u").alias("dst"))
    return (
        a.join(b, ["t", "h"])
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst",
                F.unix_micros(F.col("h").cast("timestamp")).alias("tm"))
        .distinct()
    )
