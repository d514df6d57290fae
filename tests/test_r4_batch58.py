"""Round-4 batch 58: Rayleigh lambda2, bracket hygiene, p_type rollup."""

import datetime


def test_rayleigh_quotient_integer_folds(spark):
    # hand check of the exact fold the query uses: coords lifted to
    # micro ints, x^T L x = sum over edges (xu-xv)^2
    from pyspark.sql import functions as F

    coords = spark.createDataFrame(
        [(1, -0.5), (2, 0.25), (3, 0.25)], "id long, f double")
    canon = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    lifted = coords.select(
        "id", F.round(F.col("f") * 1_000_000, 0).cast("long").alias("xi"))
    xu = lifted.select(F.col("id").alias("src"), F.col("xi").alias("xu"))
    xv = lifted.select(F.col("id").alias("dst"), F.col("xi").alias("xv"))
    xlx = canon.join(xu, "src").join(xv, "dst").agg(
        F.sum((F.col("xu") - F.col("xv"))
              * (F.col("xu") - F.col("xv")))).collect()[0][0]
    xx = lifted.agg(F.sum(F.col("xi") * F.col("xi"))).collect()[0][0]
    assert xlx == 2 * (750_000 ** 2)
    assert xx == 500_000 ** 2 + 2 * 250_000 ** 2
    # x = (-0.5, .25, .25) is an exact eigenvector of the star K1,2's
    # Laplacian with eigenvalue 3 (hub: 2(-.5) - .5 = -1.5 = 3*(-.5))
    assert round(xlx / xx, 6) == 3.0


def test_bracket_balance_flags(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, 'ok (paired) "quoted" text', "en", "sA", 1),
         (2, 'broken (open only and "odd quote', "en", "sA", 1),
         (3, 'clean', "en", "sB", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    import __spark_entry__ as entrymod

    out = {r.source: r for r in entrymod.q_bracket_balance(
        spark, str(tmp_path)).collect()}
    assert out["sA"].n_unbalanced_paren == 1
    assert out["sA"].n_odd_quotes == 1
    assert out["sA"].damage_rate == 1.0   # (1+1)/2 docs
    assert out["sB"].damage_rate == 0.0


def test_ptype_revenue_shares(spark, tmp_path):
    d = datetime.datetime(2024, 1, 1)
    li = spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 300.0, 0.0, 0.0, "N", "O", d),
         (2, 2, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d)],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    p = spark.createDataFrame(
        [(1, "n", "B", "LARGE", 1, 1.0), (2, "n", "B", "SMALL", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double")
    p.write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    import __spark_entry__ as entrymod

    out = {r.p_type: r.share for r in entrymod.q_ptype_revenue(
        spark, str(tmp_path)).collect()}
    assert out == {"LARGE": 0.75, "SMALL": 0.25}
