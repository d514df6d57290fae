"""Round-4 batch 46: weighted DAG critical path, k-anonymity audit,
ABC classification."""

from pyspark.sql import functions as F

from plato_spark.algos.dag import dag_critical_path


def test_critical_path_diamond(spark):
    # diamond 1->{2,3}->4 with weights 1:5, 2:1, 3:10, 4:2:
    # heaviest path into 4 goes through 3 -> 5+10+2 = 17
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long")
    w = spark.createDataFrame(
        [(1, 5), (2, 1), (3, 10), (4, 2)], "id long, w long")
    out = {r.id: r.path_weight
           for r in dag_critical_path(edges, w).collect()}
    assert out == {1: 5, 2: 6, 3: 15, 4: 17}


def test_critical_path_isolated_vertex_reports_own_weight(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    w = spark.createDataFrame(
        [(1, 3), (2, 4), (9, 7)], "id long, w long")
    out = {r.id: r.path_weight
           for r in dag_critical_path(edges, w).collect()}
    assert out == {1: 3, 2: 7, 9: 7}


def test_critical_path_cycle_raises(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], "src long, dst long")
    w = spark.createDataFrame([(1, 1), (2, 1)], "id long, w long")
    try:
        dag_critical_path(edges, w).collect()
        assert False, "expected ValueError on a cycle"
    except ValueError as e:
        assert "cycle" in str(e)


def test_k_anonymity_hand_groups(spark, tmp_path):
    # QI groups: (1,'A') x 6 rows (>=k), (2,'B') x 2 rows (<k).
    # bands: group1 has balances in 3 bands, group2 in 1 band.
    rows = [(i, f"c{i}", 1, float(b), "A")
            for i, b in enumerate([0, 500, 1500, 1500, 2500, 999])]
    rows += [(10, "c10", 2, 100.0, "B"), (11, "c11", 2, 200.0, "B")]
    c = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long, "
              "c_acctbal double, c_mktsegment string")
    c.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_k_anonymity(spark, str(tmp_path)).collect()[0]
    assert r.n_rows == 8 and r.n_groups == 2
    assert r.min_group_size == 2
    assert r.rows_below_k == 2
    assert r.min_l_diversity == 1
    assert r.pct_below_k == 0.25


def test_abc_exact_integer_boundary(spark):
    # revenues 80, 15, 5 (cents x100 below): cum shares 80%, 95%, 100%
    # -> the boundary rows land in A and B via the exact <= compare
    from pyspark.sql import Window

    per = spark.createDataFrame(
        [(1, 8000), (2, 1500), (3, 500)], "l_partkey long, cents long")
    w = (Window.orderBy(F.col("cents").desc(), F.col("l_partkey").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    tot = per.agg(F.sum("cents").alias("total"))
    ranked = per.crossJoin(F.broadcast(tot)).select(
        "cents", F.sum("cents").over(w).alias("cum"), "total")
    cls = F.when(F.col("cum") * 100 <= 80 * F.col("total"), "A") \
        .when(F.col("cum") * 100 <= 95 * F.col("total"), "B") \
        .otherwise("C")
    out = {r.abc_class: r.n
           for r in ranked.groupBy(cls.alias("abc_class"))
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert out == {"A": 1, "B": 1, "C": 1}
