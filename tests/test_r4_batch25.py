"""Round-4 batch 25: time-respecting (temporal) reachability."""

from pyspark.sql import functions as F

from plato_spark.algos.temporal import temporal_reachability
from plato_spark.functions.events import co_activity_contacts


def _contacts(spark, triples):
    c = spark.createDataFrame(
        [(int(a), int(b), int(t)) for a, b, t in triples],
        "src long, dst long, tm long",
    )
    return c.unionByName(
        c.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                 "tm")
    )


def test_temporal_chain_respects_time_order(spark):
    # 0-1 @10 then 1-2 @20: both reached.  1-3 @5 happened BEFORE the
    # arrival at 1 (10), so 3 is NOT reachable even though the static
    # collapsed graph connects it.
    c = _contacts(spark, [(0, 1, 10), (1, 2, 20), (1, 3, 5)])
    got = {r.id: r.arrival
           for r in temporal_reachability(c, root=0, time_col="tm")
           .collect()}
    assert got == {1: 10, 2: 20}


def test_temporal_lowered_arrival_reopens_earlier_contact(spark):
    # direct contact 0-2 @50 reaches 2 late; the 2-3 contact @30 is
    # then unusable.  The 2-hop route 0-1 @10, 1-2 @20 LOWERS 2's
    # arrival to 20, re-opening 2-3 @30 — the frontier re-offer on
    # decrease is exactly what this pins.
    c = _contacts(spark, [(0, 2, 50), (0, 1, 10), (1, 2, 20), (2, 3, 30)])
    got = {r.id: r.arrival
           for r in temporal_reachability(c, root=0, time_col="tm")
           .collect()}
    assert got == {1: 10, 2: 20, 3: 30}


def test_temporal_equal_time_transmits(spark):
    # t >= arrival: a contact at exactly the arrival time passes.
    c = _contacts(spark, [(0, 1, 10), (1, 2, 10)])
    got = {r.id: r.arrival
           for r in temporal_reachability(c, root=0, time_col="tm")
           .collect()}
    assert got == {1: 10, 2: 10}


def test_co_activity_contacts_buckets_and_times(spark):
    from datetime import datetime, timezone

    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9, 5), 7, "view", 0.0, ""),
         (2, datetime(2024, 1, 1, 9, 40), 8, "view", 0.0, ""),
         (3, datetime(2024, 1, 1, 10, 5), 8, "view", 0.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {(r.src, r.dst): r.tm for r in co_activity_contacts(ev).collect()}
    # users 7 and 8 share ONLY the 09:00 bucket; both orientations,
    # tm = epoch micros of the bucket start
    # session tz is pinned UTC, so naive inputs are UTC wall times
    t9 = int(datetime(2024, 1, 1, 9, 0,
                      tzinfo=timezone.utc).timestamp() * 1_000_000)
    assert got == {(7, 8): t9, (8, 7): t9}
