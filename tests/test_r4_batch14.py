"""Round-4 batch 14: overlap coefficient, densification, lift."""

from datetime import datetime

from pyspark.sql import functions as F

from plato_spark.algos.triangles import neighborhood_similarity


def test_overlap_k4_is_two_thirds(spark):
    # K4: every linked pair shares the other 2 vertices; deg = 3 ->
    # overlap 2/3 (never 1.0 on linked pairs: each side's neighborhood
    # contains the other endpoint, which can't be common)
    canon = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src long, dst long")
    out = neighborhood_similarity(canon, method="overlap").collect()
    assert len(out) == 6 and all(r.score == 0.666667 for r in out)


def test_overlap_promotes_containment_over_jaccard(spark):
    # star 0-{1,2,3} + edge 1-2: pair (1,2) has common {0};
    # overlap = 1/min(2,2) = 0.5 > jaccard = 1/(2+2-1) = 0.333333
    canon = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2)], "src long, dst long")
    ov = {(r.src, r.dst): r.score
          for r in neighborhood_similarity(canon, "overlap").collect()}
    jc = {(r.src, r.dst): r.score
          for r in neighborhood_similarity(canon, "jaccard").collect()}
    assert ov[(1, 2)] == 0.5 and jc[(1, 2)] == 0.333333


def test_densification_first_seen_cumulative(spark):
    # user 1 on d1+d2, user 2 on d2: cum_users = 1 then 2; incidences
    # (user,type): (1,v) d1, (1,c) d2, (2,v) d2 -> 1 then 3
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        [(1, "v", datetime(2024, 1, 1)), (1, "c", datetime(2024, 1, 2)),
         (1, "v", datetime(2024, 1, 2)), (2, "v", datetime(2024, 1, 2))],
        "user_id long, event_type string, ts timestamp",
    ).select("user_id", "event_type", F.to_date("ts").alias("d"))
    fu = (ev.groupBy("user_id").agg(F.min("d").alias("d"))
          .groupBy("d").agg(F.count(F.lit(1)).alias("nu")))
    fi = (ev.groupBy("user_id", "event_type").agg(F.min("d").alias("d"))
          .groupBy("d").agg(F.count(F.lit(1)).alias("ni")))
    days = ev.select("d").distinct()
    w = (Window.orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (days.join(fu, "d", "left").join(fi, "d", "left")
           .select("d", F.coalesce("nu", F.lit(0)).alias("nu"),
                   F.coalesce("ni", F.lit(0)).alias("ni"))
           .select("d", F.sum("nu").over(w).alias("cu"),
                   F.sum("ni").over(w).alias("ci"))
           .orderBy("d").collect())
    assert [(r.cu, r.ci) for r in out] == [(1, 1), (2, 3)]


def test_lift_is_one_under_independence(spark):
    # balanced 2x2: every cell n=1, margins 2, total 4 -> lift 1.0
    p = spark.createDataFrame(
        [("A", 0), ("A", 1), ("B", 0), ("B", 1)],
        "p_brand string, size_bucket int")
    cells = p.groupBy("p_brand", "size_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    rb = cells.groupBy("p_brand").agg(F.sum("n").alias("bt"))
    cs = cells.groupBy("size_bucket").agg(F.sum("n").alias("st"))
    tot = cells.agg(F.sum("n").alias("tt"))
    out = (cells.join(rb, "p_brand").join(cs, "size_bucket")
           .crossJoin(tot)
           .select(F.round((F.col("n") * F.col("tt")).cast("double")
                           / (F.col("bt") * F.col("st")), 6)
                   .alias("lift")).collect())
    assert all(r.lift == 1.0 for r in out)
