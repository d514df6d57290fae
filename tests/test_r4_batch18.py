"""Round-4 batch 18: exact lcc bins, grouping-sets lattice."""

from pyspark.sql import functions as F


def test_lcc_bins_are_exact_integer_cross_multiply(spark):
    # triangle 0-1-2 plus tail 0-3: vertex 0 has d=3, T=1 ->
    # lcc=1/3 -> bin (20*1) div 6 = 3; vertices 1,2 have lcc=1 ->
    # bin capped at 9; vertex 3 d=1 -> bin 0
    from plato_spark.algos.triangles import _degrees, triangle_count

    canon = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (0, 3)], "src long, dst long")
    tri = triangle_count(canon, per_vertex=True)
    deg = _degrees(canon)
    j = tri.join(deg, "id", "left")
    b = F.when(
        F.col("deg") >= 2,
        F.least(F.expr("(20 * triangles) div (deg * (deg - 1))"),
                F.lit(9)),
    ).otherwise(F.lit(0)).cast("int")
    out = {r.id: r.bin for r in j.select("id", b.alias("bin")).collect()}
    assert out == {0: 3, 1: 9, 2: 9, 3: 0}


def test_grouping_sets_has_no_grand_total(spark):
    df = spark.createDataFrame(
        [("a", "d1"), ("a", "d2"), ("b", "d1")], "t string, d string")
    df.createOrReplaceTempView("gs_t")
    out = spark.sql("""
        SELECT t, d, CAST(grouping(t)*2 + grouping(d) AS INT) AS lvl,
               count(*) AS n
        FROM gs_t GROUP BY GROUPING SETS ((t), (d), (t, d))
    """).collect()
    lvls = sorted(set(r.lvl for r in out))
    # 0 = leaves, 1 = per-type marginal, 2 = per-day marginal;
    # lvl 3 (grand total) must NOT exist — this set is not a rollup
    assert lvls == [0, 1, 2]
    assert sum(1 for r in out if r.lvl == 0) == 3
