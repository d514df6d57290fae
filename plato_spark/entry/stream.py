"""Entry-registry queries: stream domain (split from the former
monolithic __spark_entry__.py; round-5 manifest-ization).
"""

from __future__ import annotations

from plato_spark.entry.common import (  # noqa: F401
    F,
    _sql_cms,
    _sql_fixed_hist_quantiles,
    _sql_hll_groups,
    _sql_hll_set_ops,
    load_table,
)


def q_hll_set_ops(spark, sf_dir):
    """HLL set algebra between the 'view' and 'purchase' user sets
    (functions/sketches.hll_set_ops): union via per-index register max
    — the merge HLL is algebraically closed under — and intersection
    via inclusion-exclusion, with the EXACT answers in the same row as
    the accuracy report.  Portable registers, every estimate
    bit-reproducible in SQL."""
    from plato_spark.functions.sketches import hll_set_ops

    return hll_set_ops(load_table(spark, sf_dir, "events"),
                       "event_type", "user_id", "view", "purchase")


def q_hll_user_cardinality(spark, sf_dir):
    """Per-event-type distinct-user estimates via the portable
    64-register HLL (functions/sketches.hll_group_cardinality) — the
    GROUP BY COUNT(DISTINCT) replacement whose shuffle carries at most
    |groups| x 64 register rows."""
    from plato_spark.functions.sketches import hll_group_cardinality

    return hll_group_cardinality(
        load_table(spark, sf_dir, "events"), "event_type", "user_id"
    )


def q_cms_incremental(spark, sf_dir):
    """Streaming count-min sketch (streaming/cms_stream): the corpus
    arrives as three micro-batches folded cell-wise into a persisted
    versioned sketch with epoch-tagged exactly-once commits; cell
    addition is a commutative monoid, so the folded sketch — and hence
    the heavy-hitter read-out — equals the batch CMS verbatim (same
    oracle as cms_heavy_hitters)."""
    import shutil
    import tempfile

    from plato_spark.functions.sketches import cms_probe
    from plato_spark.functions.text import TOKEN_RE
    from plato_spark.streaming.cms_stream import (
        merge_cms_batch,
        read_cms_state,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    sd = tempfile.mkdtemp(prefix="plato_inccms_")
    try:
        for i in range(3):
            merge_cms_batch(
                docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i),
                sd, epoch_id=i, depth=4, width=64,
            )
        cand = docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
            ).alias("token")
        ).distinct()
        out = cms_probe(
            read_cms_state(spark, sd), cand, threshold=50, depth=4, width=64
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sd, ignore_errors=True)
        docs.unpersist()
    return out


def q_hll_incremental(spark, sf_dir):
    """Streaming per-type distinct-user HLL (streaming/hll_stream):
    three micro-batches max-merged into <= |groups| x 64 register rows
    — the IDEMPOTENT member of the streaming-monoid trilogy (replays
    re-max harmlessly, unlike additive CMS/degree/histogram state);
    read-out equals batch hll_user_cardinality verbatim (same
    oracle)."""
    import shutil
    import tempfile

    from plato_spark.streaming.hll_stream import (
        hll_state_estimate,
        merge_hll_batch,
        read_hll_state,
    )

    ev = load_table(spark, sf_dir, "events").persist()
    sd = tempfile.mkdtemp(prefix="plato_inchll_")
    try:
        for i in range(3):
            merge_hll_batch(
                ev.where(F.pmod(F.xxhash64("event_id"), F.lit(3)) == i),
                sd, epoch_id=i, group_col="event_type", id_col="user_id",
            )
        out = hll_state_estimate(
            read_hll_state(spark, sd), "event_type"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sd, ignore_errors=True)
        ev.unpersist()
    return out


def q_quantiles_incremental(spark, sf_dir):
    """Streaming fixed-bin histogram quantiles (streaming/hist_stream):
    events arrive as three micro-batches folded bin-wise into a
    constant-size (<= nbins rows) versioned state with epoch-tagged
    exactly-once commits; bin counts are an additive monoid, so the
    folded histogram — and hence the interpolated quantile read-out —
    equals the fixed-edge batch histogram of the union verbatim."""
    import shutil
    import tempfile

    from plato_spark.streaming.hist_stream import (
        merge_hist_batch,
        quantiles_from_state,
        read_hist_state,
    )

    ev = load_table(spark, sf_dir, "events").persist()
    sd = tempfile.mkdtemp(prefix="plato_inchist_")
    try:
        for i in range(3):
            merge_hist_batch(
                ev.where(F.pmod(F.xxhash64("event_id"), F.lit(3)) == i),
                sd, epoch_id=i, col="value", lo=0.0, hi=600.0, nbins=256,
            )
        out = quantiles_from_state(
            read_hist_state(spark, sd), lo=0.0, hi=600.0, nbins=256,
            quantiles=(0.5, 0.9, 0.99),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sd, ignore_errors=True)
        ev.unpersist()
    return out


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters over corpus tokens
    (functions/sketches; d=4 x w=64 portable-hash sketch) —
    (token, est_count) for tokens whose estimate reaches 50."""
    from plato_spark.functions.sketches import cms_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    return cms_heavy_hitters(docs, threshold=50, depth=4, width=64)


QUERIES = {
    "hll_set_ops": q_hll_set_ops,
    "quantiles_incremental": q_quantiles_incremental,
    "hll_incremental": q_hll_incremental,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "cms_incremental": q_cms_incremental,
    "hll_user_cardinality": q_hll_user_cardinality,
}


ORACLES = {
    "hll_set_ops": _sql_hll_set_ops(),
    "quantiles_incremental": _sql_fixed_hist_quantiles(0.0, 600.0, 256),
    "hll_incremental": _sql_hll_groups(),
    "cms_heavy_hitters": _sql_cms(50, 4, 64),
    "cms_incremental": _sql_cms(50, 4, 64),
    "hll_user_cardinality": _sql_hll_groups(),
}
