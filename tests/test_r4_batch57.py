"""Round-4 batch 57: triangle participation, Spearman rank corr."""

import datetime


def test_triangle_participation_fixture(spark, tmp_path):
    # co-occurrence graph: triangle {1,2,3} + pendant 4 (via orders)
    d = datetime.datetime(2024, 1, 1)
    rows = []
    oid = 0
    for u, v in [(1, 2), (1, 3), (2, 3), (3, 4)]:
        rows.append((oid, u, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d))
        rows.append((oid, v, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d))
        oid += 1
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_triangle_participation(
        spark, str(tmp_path)).collect()[0]
    assert (r.n_vertices, r.n_in_triangle, r.n_triangles) == (4, 3, 1)
    assert r.participation == 0.75


def test_spearman_perfect_and_reversed(spark, tmp_path):
    d = datetime.datetime(2024, 1, 1)
    # revenue order 7 < 8 < 9; balances reversed -> rho = -1
    li_rows = [
        (1, 1, 7, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d),
        (2, 1, 8, 1, 1.0, 200.0, 0.0, 0.0, "N", "O", d),
        (3, 1, 9, 1, 1.0, 300.0, 0.0, 0.0, "N", "O", d),
    ]
    spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(7, "s", 1, 30.0), (8, "s", 1, 20.0), (9, "s", 1, 10.0)],
        "s_suppkey long, s_name string, s_nationkey long, "
        "s_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_supplier_rank_corr(spark, str(tmp_path)).collect()[0]
    assert r.n_suppliers == 3
    assert r.d2 == 8        # ranks (3,1),(2,2),(1,3): 4+0+4
    assert r.spearman == -1.0
