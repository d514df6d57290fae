"""Round-4 batch 21: Rand-index pair-counting identities."""

from pyspark.sql import functions as F


def _ri(spark, pairs):
    cells = spark.createDataFrame(pairs, "label long, lang string") \
        .groupBy("label", "lang").agg(
            F.count(F.lit(1)).cast("long").alias("m"))
    c2 = lambda c: F.expr(f"({c} * ({c} - 1)) div 2")  # noqa: E731
    parts = cells.agg(F.sum("m").cast("long").alias("n"),
                      F.sum(c2("m")).cast("long").alias("cell2"))
    rows2 = (cells.groupBy("label").agg(F.sum("m").alias("a"))
             .agg(F.sum(c2("a")).cast("long").alias("row2")))
    cols2 = (cells.groupBy("lang").agg(F.sum("m").alias("b"))
             .agg(F.sum(c2("b")).cast("long").alias("col2")))
    r = (parts.crossJoin(rows2).crossJoin(cols2)
         .select(F.round(
             (F.expr("(n * (n - 1)) div 2") + 2 * F.col("cell2")
              - F.col("row2") - F.col("col2"))
             / F.expr("(n * (n - 1)) div 2").cast("double"), 6)
             .alias("ri")).collect())
    return r[0].ri


def test_rand_index_identical_partitions_is_one(spark):
    assert _ri(spark, [(1, "en"), (1, "en"), (2, "fr"), (2, "fr")]) == 1.0


def test_rand_index_orthogonal_partitions(spark):
    # 2x2 latin square: every pair disagrees between the partitions ->
    # agreements are only the cross-cell non-pairs; RI = 2/6
    assert _ri(spark, [(1, "en"), (1, "fr"), (2, "en"), (2, "fr")]) \
        == round(2 / 6, 6)
