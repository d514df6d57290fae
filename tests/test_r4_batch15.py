"""Round-4 batch 15: distributed deciles, RANGE-frame calendar gaps."""

from pyspark.sql import functions as F


def test_deciles_split_ties_by_custkey_exactly(spark):
    # 20 customers, all the same balance: the pinned (bal DESC,
    # custkey) order still assigns exactly 2 per decile
    from plato_spark.graph.edges import build_dictionary

    c = spark.createDataFrame([(i, 500) for i in range(20)],
                              "c_custkey long, bal_c long")
    keyed = c.select(
        "bal_c",
        (F.col("c_custkey") - F.col("bal_c") * F.lit(1 << 24))
        .cast("long").alias("vkey"))
    d = build_dictionary(keyed.select("vkey"), 4)
    ranked = keyed.join(d, "vkey").select("bal_c",
                                          F.col("id").alias("rank"))
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    out = (ranked.crossJoin(F.broadcast(n))
           .select(F.expr("(rank * 10) div n").alias("decile"))
           .groupBy("decile").count().orderBy("decile").collect())
    assert [(r.decile, r["count"]) for r in out] == [
        (i, 2) for i in range(10)]


def test_range_frame_skips_calendar_gaps(spark):
    # revenue on day 0 and day 10: a RANGE 6-preceding frame at day 10
    # must NOT include day 0 (a ROWS frame would)
    from pyspark.sql import Window

    per = spark.createDataFrame(
        [("P", 0, 100), ("P", 10, 50)],
        "priority string, day_i long, rev_c long")
    w = (Window.partitionBy("priority").orderBy("day_i")
         .rangeBetween(-6, 0))
    out = {r.day_i: r.t for r in per.select(
        "day_i", F.sum("rev_c").over(w).alias("t")).collect()}
    assert out == {0: 100, 10: 50}
