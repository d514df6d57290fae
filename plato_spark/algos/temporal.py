"""Time-respecting (temporal) reachability — earliest-arrival relaxation.

Beyond-reference operator: the reference engine's traversals (BFS
``/root/reference/plato/algo/bfs/bfs.hpp:55-155``) treat edges as
timeless; real contact graphs (co-activity, message passing, co-commit
sessions) only transmit FORWARD in time — u reaches w through v only if
the (v, w) contact happens AT OR AFTER the (u, v) contact.  Static
reachability over the collapsed graph systematically OVERSTATES reach
(it happily routes through contacts that happened yesterday), so any
influence/contagion question on an evolving graph needs this operator,
not wcc/bfs.

Semiring: arrival(v) = min over in-contacts (u, v, t) with
t >= arrival(u) of t — min-relaxation like sssp's (min, +) but the
"cost" is the contact TIMESTAMP itself gated by a non-equi predicate,
not an accumulated sum.  Every arrival is an exact copy of some
contact's integer microsecond timestamp (no arithmetic at all), so
results are engine-reproducible and oracle-checkable.

Superstep shape (same machinery as algos/sssp.py): the improved
frontier joins the contact table on the src equi-key (the non-equi
``t >= arrival`` stays a residual filter on the SAME hash shuffle — no
range-join blowup), receivers keep the min (write_min combiner ≙
``groupBy(dst).min``), and only improved vertices re-offer.  When an
arrival DECREASES, earlier contacts become usable — exactly the case
the frontier re-offer covers.  Arrivals are monotone non-increasing
over a finite value set (contact timestamps), so the loop terminates;
rounds are bounded by the temporal diameter (measured 6 at
sf0.001/sf0.01), not the contact count.

At 100 TB the contact table is the big fact: it shuffles ONCE onto the
src key and is reused every round; the frontier broadcasts under the
same push threshold as wcc/sssp, and per-round driver traffic is one
scalar count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)

PUSH_THRESHOLD = 0.05  # same frontier-broadcast policy as algos/wcc.py

#: arrival of the root: before every possible contact (int64 headroom —
#: never a sentinel that real epoch-micros could collide with)
ROOT_ARRIVAL = -(1 << 62)


def temporal_reachability(
    contacts: DataFrame,
    root: int,
    time_col: str = "t",
    max_iters: int = 200,
) -> DataFrame:
    """(id, arrival: long) — earliest time each vertex can be reached
    from ``root`` along a time-respecting contact path.

    contacts: directed (src, dst, ``time_col``) rows — one row per
    contact EVENT (pass both orientations for undirected contact
    graphs); ``time_col`` must be an exact integer timestamp (epoch
    micros).  The root itself (arrival -2^62 by convention) is excluded
    from the output so every returned value is a real contact time.
    """
    spark = contacts.sparkSession
    c0 = contacts.select(
        "src", "dst", F.col(time_col).cast("long").alias("t")
    ).distinct().persist()
    n_c = c0.count()
    shuffle_n = auto_shuffle_partitions(spark, max(n_c, 1))
    c = c0.repartition(shuffle_n, "src").persist()
    c.count()
    c0.unpersist()
    n_vertices = (
        c.select(F.col("src").alias("id"))
        .unionByName(c.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )

    state = spark.createDataFrame(
        [(int(root), ROOT_ARRIVAL)], "id long, arrival long"
    )
    frontier = state
    with scoped_shuffle_partitions(spark, shuffle_n):
        for _ in range(max_iters):
            n_front = frontier.count()
            if n_front == 0:
                break
            f = frontier
            if n_front < PUSH_THRESHOLD * max(n_vertices, 1):
                f = F.broadcast(f)
            cand = (
                c.join(f.select(F.col("id").alias("src"), "arrival"),
                       "src")
                .where(F.col("t") >= F.col("arrival"))
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("t").alias("na"))
            )
            merged = state.join(cand, "id", "outer").select(
                "id",
                F.least(
                    F.coalesce("arrival", F.lit(1 << 62)),
                    F.coalesce("na", F.lit(1 << 62)),
                ).alias("arrival"),
                (
                    F.col("na").isNotNull()
                    & (F.col("arrival").isNull()
                       | (F.col("na") < F.col("arrival")))
                ).alias("improved"),
            ).transform(cheap_localCheckpoint)
            frontier = merged.where("improved").select("id", "arrival")
            state = merged.select("id", "arrival")
    return state.where(F.col("id") != int(root))
