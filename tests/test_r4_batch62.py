"""Round-4 batch 62: linenumber integrity, supplier brand HHI."""

import datetime


def test_linenumber_audit_violation_kinds(spark, tmp_path):
    d = datetime.datetime(2024, 1, 1)
    rows = [
        # order 1: clean 1,2
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (1, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        # order 2: gap (1,3)
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (2, 1, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        # order 3: duplicate linenumber
        (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        # order 4: starts at 2
        (4, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_linenumber_audit(spark, str(tmp_path)).collect()[0]
    assert r.n_orders == 4
    assert r.n_violations == 3
    assert r.violation_rate == 0.75


def test_supplier_brand_focus_hhi(spark, tmp_path):
    d = datetime.datetime(2024, 1, 1)
    # supplier 7: 3 lines brand A, 1 line brand B -> HHI (9+1)/16
    li_rows = [(i, pk, 7, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d)
               for i, pk in enumerate([1, 1, 1, 2])]
    # supplier 8: single brand -> HHI 1.0
    li_rows.append((9, 1, 8, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d))
    spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "n", "BrandA", "T", 1, 1.0), (2, "n", "BrandB", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    import __spark_entry__ as entrymod

    out = {r.l_suppkey: r for r in entrymod.q_supplier_brand_focus(
        spark, str(tmp_path)).collect()}
    assert out[7].n_brands == 2
    assert out[7].hhi == 0.625
    assert out[8].hhi == 1.0
