"""Round-4 batch 19: recall hit-counting, full-outer zero sides."""

from pyspark.sql import functions as F


def test_recall_hits_count_exact_intersection(spark):
    ex = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12)],
        "query_id long, nbr_id long")
    ls = spark.createDataFrame(
        [(1, 10), (2, 99)], "q2 long, n2 long")
    per = (ex.join(ls, (F.col("query_id") == F.col("q2"))
                   & (F.col("nbr_id") == F.col("n2")), "left")
           .groupBy("query_id")
           .agg(F.count("n2").cast("long").alias("hits")))
    out = {r.query_id: r.hits for r in per.collect()}
    # query 1 recovered 1 of 2; query 2 recovered none (99 not exact)
    assert out == {1: 1, 2: 0}
    agg = per.agg(
        F.round(F.sum("hits") / (F.lit(2) * F.count(F.lit(1))), 6)
        .alias("mean"),
        F.round(F.min("hits") / F.lit(2.0), 6).alias("mn")).collect()[0]
    assert (agg.mean, agg.mn) == (0.25, 0.0)


def test_supply_demand_full_outer_keeps_one_sided_nations(spark):
    s = spark.createDataFrame([("A", 10)], "nation string, supplied_qty long")
    c = spark.createDataFrame([("B", 4)], "nation string, consumed_qty long")
    j = s.join(c, "nation", "full_outer").select(
        "nation",
        F.coalesce("supplied_qty", F.lit(0)).alias("sq"),
        F.coalesce("consumed_qty", F.lit(0)).alias("cq"))
    out = {r.nation: (r.sq, r.cq) for r in j.collect()}
    assert out == {"A": (10, 0), "B": (0, 4)}
