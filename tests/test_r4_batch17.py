"""Round-4 batch 17: observed-catalog argmin ties + quantization."""

from pyspark.sql import functions as F


def test_cheapest_supplier_tie_goes_to_lower_suppkey(spark):
    cat = spark.createDataFrame(
        [(1, 9, 100), (1, 4, 100), (1, 7, 200)],
        "l_partkey long, l_suppkey long, unit_u long")
    best = (cat.groupBy("l_partkey")
            .agg(F.min(F.struct("unit_u", "l_suppkey")).alias("m"))
            .select("l_partkey", F.col("m.l_suppkey").alias("s"),
                    F.col("m.unit_u").alias("u")).collect())
    assert (best[0].s, best[0].u) == (4, 100)


def test_unit_price_integer_div_floors(spark):
    # 10007 cents * 10000 / 3 units: exact floor, no double rounding
    df = spark.createDataFrame([(10007, 3)], "pc long, qty long")
    out = df.select(
        F.expr("(pc * 10000) div qty").cast("long").alias("u")).collect()
    assert out[0].u == 100070000 // 3 == 33356666


def test_dominant_share_cross_multiply(spark):
    # part total 100: supplier with 13 qualifies at >1/8, 12 does not
    per = spark.createDataFrame(
        [(1, 10, 13), (1, 20, 12), (1, 30, 75)],
        "l_partkey long, l_suppkey long, sq long")
    tot = per.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("sq").alias("st"))
    dom = per.join(tot, F.col("l_partkey") == F.col("pk")).where(
        F.lit(8) * F.col("sq") > F.col("st"))
    assert sorted(r.l_suppkey for r in dom.collect()) == [10, 30]
