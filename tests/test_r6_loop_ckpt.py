"""Round-6 loop-optimization internals: layout-preserving checkpoints,
observe-carried deltas, and the one-exchange superstep plan shape.

These pin the three properties the r6 rebuild of the iterative loops
depends on (see OPTIMIZATION_r06.md §1):

1. ``loop_localCheckpoint`` keeps the checkpointed state's hash
   partitioning visible to the planner (a co-partitioned join over it
   plans WITHOUT an Exchange on the checkpointed side), while
   ``cheap_localCheckpoint`` — by design — does not.
2. The stats-less rewrap still happens on reset rounds (k % 8 == 7), so
   the join-multiplied sizeInBytes digit growth stays capped.
3. A production pagerank superstep over checkpointed state plans with
   exactly ONE Exchange (the groupBy(dst) aggregation) and no Sort —
   the plan shape the bench numbers rest on.

Values are checked too: the observe-based delta loop returns the same
6dp ranks and iteration count as ever (the oracle gate proves that
cross-engine; here we only pin the plan metadata guarantees).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import (
    cheap_localCheckpoint,
    loop_localCheckpoint,
)
from tests.conftest import edges_df


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _top_plan(df) -> str:
    """Physical-plan tree only (stops before the details / nested cached
    plans sections)."""
    txt = _plan(df)
    tree = txt.split("== Physical Plan ==", 1)[1]
    # the numbered operator details section starts at the first blank line
    return tree.split("\n\n", 1)[0]


def _no_broadcast(spark):
    import contextlib

    @contextlib.contextmanager
    def scope():
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    return scope()


def test_loop_ck_preserves_partitioning(spark):
    """Layout preservation REQUIRES the checkpoint to execute outside
    AQE (an AdaptiveSparkPlan-wrapped checkpoint reports
    UnknownPartitioning) — which is exactly how the production loops run
    (scoped_superstep_confs switches AQE off for the loop body)."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        base = (
            spark.range(0, 1000)
            .select(F.col("id"), (F.col("id") % 7).alias("v"))
            .repartition(4, "id")
        )
        ck = loop_localCheckpoint(base, k=0)
        other = (
            spark.range(0, 1000).select(F.col("id"), F.lit(1).alias("w"))
            .repartition(4, "id")
        )
        with _no_broadcast(spark):
            tree = _top_plan(ck.join(other.hint("shuffle_hash"), "id"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    # the checkpointed side must NOT be re-exchanged: the only Exchange
    # allowed in this plan is the one building `other`'s repartition
    n_exchange = tree.count("Exchange")
    assert n_exchange == 1, tree
    assert "Scan ExistingRDD" in tree


def test_cheap_ck_drops_partitioning(spark):
    # documents the contrast loop_localCheckpoint exists to fix
    base = (
        spark.range(0, 1000)
        .select(F.col("id"), (F.col("id") % 7).alias("v"))
        .repartition(4, "id")
    )
    ck = cheap_localCheckpoint(base)
    other = (
        spark.range(0, 1000).select(F.col("id"), F.lit(1).alias("w"))
        .repartition(4, "id")
    )
    with _no_broadcast(spark):
        tree = _top_plan(ck.join(other.hint("shuffle_hash"), "id"))
    assert tree.count("Exchange") >= 2, tree


def test_loop_ck_reset_round_resets_stats(spark):
    base = (
        spark.range(0, 100)
        .select(F.col("id"), F.lit(1.0).alias("v"))
        .repartition(2, "id")
    )
    def size_of(df) -> int:
        return int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))

    # non-reset round keeps the LogicalRDD produced by localCheckpoint,
    # which carries the origin plan's (realistic) statistics
    ck_keep = loop_localCheckpoint(base, k=0)
    # reset round (k % 8 == 7) rewraps stats-less: the rewrapped frame
    # reports the conservative session default sizeInBytes, so compounded
    # join-multiplied stats cannot grow across resets — same contract as
    # cheap_localCheckpoint
    ck_reset = loop_localCheckpoint(base, k=7)
    default_size = int(
        spark.conf.get("spark.sql.defaultSizeInBytes").rstrip("b"))
    assert size_of(ck_reset) == default_size, size_of(ck_reset)
    assert size_of(ck_keep) < default_size, size_of(ck_keep)
    # both variants still return the same rows
    assert ck_keep.count() == ck_reset.count() == 100


def test_pagerank_superstep_plan_one_exchange_no_sort(spark):
    from plato_spark.graph.partitioning import scoped_superstep_confs

    edges = edges_df(
        spark,
        [(a, b) for a in range(30) for b in range(30) if a != b and (a + b) % 3],
    )
    n = 4
    with scoped_superstep_confs(spark, n):
        edge_val = edges.select("src", "dst").repartition(n, "src").persist()
        edge_val.count()
        div = edge_val.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).cast("double").alias("wsum"))
        dsts = edge_val.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("_i"))
        base = (div.join(dsts, "id", "full_outer")
                .select("id", F.coalesce(F.col("wsum").cast("double"), F.lit(0.0))
                        .alias("wsum")).persist())
        base.count()
        state = base.select("id", "wsum", F.lit(1.0).alias("rank"))

        def rnd(st):
            contribs = st.select(
                F.col("id").alias("src"),
                F.when(F.col("wsum") > 0, F.col("rank") / F.col("wsum"))
                .otherwise(F.col("rank")).alias("contrib"))
            g = (edge_val.join(contribs.hint("shuffle_hash"), "src")
                 .groupBy(F.col("dst").alias("id"))
                 .agg(F.sum("contrib").alias("g")))
            rank_new = F.lit(0.15) + F.lit(0.85) * F.coalesce("g", F.lit(0.0))
            return st.join(g.hint("shuffle_hash"), "id", "left").select(
                "id", "wsum", rank_new.alias("rank"))
        s1 = loop_localCheckpoint(rnd(state), 0)
        tree = _top_plan(rnd(s1))
    # the cached edge table's own build plan (inside InMemoryRelation)
    # contains its one-time repartition Exchange — count only the live
    # per-superstep operators above it
    live = tree.split("InMemoryRelation", 1)[0]
    assert live.count("Exchange") == 1, tree
    assert " Sort " not in tree, tree
    assert "SortMergeJoin" not in tree, tree
    assert tree.count("ShuffledHashJoin") == 2, tree
    edge_val.unpersist()
    base.unpersist()


def test_observe_delta_matches_agg(spark):
    from pyspark.sql import Observation

    df = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 11).cast("double").alias("x"))
    expected = df.agg(F.sum("x")).collect()[0][0]
    obs = Observation()
    out = loop_localCheckpoint(df.observe(obs, F.sum("x").alias("d")), 0)
    assert out.count() == 500
    assert obs.get["d"] == expected
