"""Explicit lifetime management for localCheckpoint blocks.

Every iterative loop in this engine truncates lineage per round with
``localCheckpoint(eager=True)``.  The checkpoint persists the plan's
internal RDD in the block manager — but ``DataFrame.unpersist()`` does
NOT free it (it only uncaches CacheManager entries from .cache/.persist),
and the ContextCleaner frees it only after a JVM full GC notices the
orphaned reference (periodic GC default: every 30 min).  A long peel
loop therefore accumulates every superseded state/temp table in memory:
measured at sf0.1 truss decomposition, ~3 checkpoints x ~30 rounds of up
to ~1M-row states stayed resident, and late 7-edge rounds cost ~70s
where early 80k-edge rounds cost ~9s (block-manager/GC pressure growing
with round index, not work).

These helpers make the lifetime explicit:

    state, ids = checkpoint_tracked(df)      # materialize + record ids
    ... next round builds new_state FROM state ...
    new_state, new_ids = checkpoint_tracked(new_state)
    free_blocks(spark, ids)                  # old state now truly dead

``checkpoint_tracked`` diffs the context's persistent-RDD map around the
checkpoint call, so it returns exactly the block-manager ids backing the
new checkpoint.  ``free_blocks`` unpersists those ids (non-blocking).
ONLY free ids whose DataFrame can never be evaluated again — a
localCheckpoint is non-reliable, its blocks are the only copy of the
data, and any later action on a freed DataFrame fails.

Single-threaded driver loops only: the id diff assumes no concurrent
checkpointing from another thread (true for every loop in this repo —
the driver loop is the only thing creating checkpoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _persistent_ids(sc) -> set[int]:
    return {int(k) for k in sc._jsc.getPersistentRDDs().keys()}


def cheap_localCheckpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` that does NOT compound plan
    statistics across rounds.

    Spark 4's ``Dataset.checkpoint`` stores the optimized plan's
    statistics into the returned ``LogicalRDD`` (``originStats``).  Join
    stats MULTIPLY the children's BigInt ``sizeInBytes``, so in an
    iterative loop whose round plan joins the previous checkpoint with
    itself (k-truss: state x peeled, a_u x a_v), the stored size's DIGIT
    COUNT doubles every round — and the next round's checkpoint burns
    driver CPU in million-digit Karatsuba multiplications inside
    ``SizeInBytesOnlyStatsPlanVisitor``.  Measured at sf0.1 truss
    decomposition: a 7-edge round cost 82s, ~all of it in
    ``Dataset.localCheckpoint`` stats (jstack: BigInteger.multiply), with
    every Spark job in the round under 1s.

    Fix: materialize via the normal localCheckpoint (its internal
    row-copy keeps the data safe), then re-wrap the checkpointed RDD in
    a fresh stats-less ``LogicalRDD`` (``internalCreateDataFrame``), so
    downstream plans see the conservative default size instead of the
    compounded product.  Consequence: Catalyst will never auto-broadcast
    a checkpointed table — every loop in this repo already broadcasts
    its known-small sides explicitly.  Falls back to the plain
    checkpoint if the private constructor moves.
    """
    spark = df.sparkSession
    ck = df.localCheckpoint(eager=True)
    try:
        jrdd = ck._jdf.queryExecution().toRdd()
        newjdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, ck._jdf.schema(), False
        )
        return DataFrame(newjdf, spark)
    except Exception:
        return ck


def loop_localCheckpoint(df: DataFrame, k: int, reset_every: int = 8) -> DataFrame:
    """Per-round lineage truncation for LINEAR superstep loops that keeps
    the state's physical layout visible to the planner.

    :func:`cheap_localCheckpoint`'s stats-less rewrap also drops the
    checkpointed plan's ``outputPartitioning``/``outputOrdering`` — so a
    loop whose state is hash-partitioned on the join key re-pays an
    Exchange + Sort on the state side of EVERY superstep join (measured
    r6 at sf0.1 pagerank: 3 exchanges/superstep instead of the 1 the
    design intends; per-superstep 0.48s -> 0.30s once fixed).

    Plain ``localCheckpoint(eager=True)`` preserves partitioning, but its
    ``LogicalRDD`` also inherits the optimized plan's join-multiplied
    ``sizeInBytes`` BigInt.  In a round plan that references the previous
    state TWICE (state JOIN f(state) — pagerank/wcc/lpa all do), the
    stored size's digit count DOUBLES per round, which is the
    million-digit Karatsuba pathology cheap_localCheckpoint exists to
    prevent.  Hybrid fix: plain checkpoint every round (layout
    preserved), stats-less rewrap every ``reset_every``-th round, capping
    digit growth at 2^reset_every * d (a few thousand digits — sub-ms to
    multiply) while only one round in ``reset_every`` re-pays the
    layout exchanges.
    """
    ck = df.localCheckpoint(eager=True)
    if k % reset_every == reset_every - 1:
        spark = df.sparkSession
        try:
            jrdd = ck._jdf.queryExecution().toRdd()
            newjdf = spark._jsparkSession.internalCreateDataFrame(
                jrdd, ck._jdf.schema(), False
            )
            return DataFrame(newjdf, spark)
        except Exception:
            return ck
    return ck


def checkpoint_tracked(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """:func:`cheap_localCheckpoint` + the block-manager RDD ids that
    back it (to pass to :func:`free_blocks` once superseded)."""
    sc = df.sparkSession.sparkContext
    before = _persistent_ids(sc)
    out = cheap_localCheckpoint(df)
    ids = _persistent_ids(sc) - before
    return out, ids


_auto_ck_calls = 0


def auto_loop_localCheckpoint(df: DataFrame) -> DataFrame:
    """:func:`loop_localCheckpoint` for call sites without a loop index:
    a process-global call counter schedules the stats reset.  Any chain
    of checkpoints sees at most ``reset_every - 1`` consecutive
    non-reset truncations (every checkpoint anywhere increments the same
    counter), so the digit-growth cap holds for every loop regardless of
    interleaving.  Drop-in replacement for :func:`cheap_localCheckpoint`
    in loops whose per-round VALUES are exact (integer / boolean /
    min-max folds): the only difference is plan metadata (partitioning
    kept, stats periodically reset), so downstream join-strategy changes
    cannot move a float reduce order — there is none.
    """
    global _auto_ck_calls
    _auto_ck_calls += 1
    return loop_localCheckpoint(df, _auto_ck_calls - 1)


def loop_checkpoint_tracked(
    df: DataFrame, k: int, reset_every: int = 8
) -> tuple[DataFrame, set[int]]:
    """:func:`loop_localCheckpoint` + the block-manager RDD ids that back
    it (to pass to :func:`free_blocks` once superseded)."""
    sc = df.sparkSession.sparkContext
    before = _persistent_ids(sc)
    out = loop_localCheckpoint(df, k, reset_every)
    ids = _persistent_ids(sc) - before
    return out, ids


def auto_loop_checkpoint_tracked(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """:func:`auto_loop_localCheckpoint` + backing block-manager ids —
    the tracked drop-in for :func:`checkpoint_tracked` in exact-valued
    loops."""
    sc = df.sparkSession.sparkContext
    before = _persistent_ids(sc)
    out = auto_loop_localCheckpoint(df)
    ids = _persistent_ids(sc) - before
    return out, ids


def free_blocks(spark: SparkSession, ids: set[int]) -> None:
    """Unpersist the given persistent-RDD ids (non-blocking).  The
    DataFrames they backed must never be evaluated again."""
    if not ids:
        return
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for k, v in jmap.items():
            if int(k) in ids:
                v.unpersist()
    except Exception:
        pass  # best-effort: leaking (old behavior) beats failing the job
