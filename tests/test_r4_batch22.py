"""Round-4 batch 22: friendship paradox on a star, integrity anti-join."""

from pyspark.sql import functions as F


def test_friendship_paradox_star_exact(spark):
    # star K1,4: degrees {4,1,1,1,1}: mean = 8/5 = 1.6,
    # mean neighbor degree = (16+4)/8 = 2.5, paradox = 2.5/1.6
    canon = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long")
    sym = canon.unionByName(canon.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d"))
    r = deg.agg(
        F.round(F.sum("d") / F.count(F.lit(1)), 6).alias("md"),
        F.round(F.sum(F.col("d") * F.col("d")) / F.sum("d"), 6)
        .alias("mnd")).collect()[0]
    assert (r.md, r.mnd) == (1.6, 2.5)


def test_integrity_audit_counts_orphans(spark):
    li = spark.createDataFrame([(1,), (2,), (99,)], "l_orderkey long")
    o = spark.createDataFrame([(1,), (2,)], "o_orderkey long")
    bad = li.join(
        o.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey", "left_anti")
    assert bad.count() == 1
