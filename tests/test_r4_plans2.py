"""Plan hygiene for this session's shuffle-bearing operators."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_token_cosine_no_cartesian_and_partial_agg(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} shared", "en", "s", 10)
         for i in range(20)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    import __spark_entry__ as entry

    p = plan_of(entry.q_token_cosine_topk(spark, str(tmp_path)))
    # the inverted-index self-join must be an equi-join on tok, never
    # a cartesian/BNLJ, and the dot fold must map-side combine
    assert "Cartesian" not in p and "BroadcastNestedLoop" not in p, p
    assert "partial_" in p or "HashAggregate" in p


def test_skyline_broadcasts_the_frontier_table(spark, tmp_path):
    part = spark.createDataFrame(
        [(i, "B", i % 5 + 1, float(i + 1)) for i in range(50)],
        "p_partkey long, p_brand string, p_size int, "
        "p_retailprice double")
    part.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet"))
    import __spark_entry__ as entry

    p = plan_of(entry.q_skyline_parts(spark, str(tmp_path)))
    # the per-size best table joins back via broadcast — the fact side
    # never shuffles for the skyline filter
    assert "BroadcastHashJoin" in p, p
    assert "Cartesian" not in p


def test_waiting_suppliers_single_orderkey_exchange_for_window(spark,
                                                               tmp_path):
    from datetime import datetime

    orders = spark.createDataFrame(
        [(i, 1, "F", 0.0, datetime(1995, 1, 1), "p") for i in range(50)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    li = spark.createDataFrame(
        [(i, i % 7, datetime(1995, 6, 1)) for i in range(50)],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp")
    sup = spark.createDataFrame(
        [(i, f"S{i}", 0, 0.0) for i in range(7)],
        "s_suppkey long, s_name string, s_nationkey int, "
        "s_acctbal double")
    orders.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet"))
    li.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet"))
    sup.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "supplier.parquet"))
    import __spark_entry__ as entry

    p = plan_of(entry.q_waiting_suppliers(spark, str(tmp_path)))
    # the per-(order,supplier) fold and the order window ride the SAME
    # orderkey hash partitioning: exactly one exchange may carry
    # l_orderkey alone (the window re-key), and the supplier name join
    # must broadcast
    assert "BroadcastHashJoin" in p, p
    assert "Cartesian" not in p
    n_orderkey_exchanges = p.count(
        "Exchange hashpartitioning(l_orderkey")
    assert n_orderkey_exchanges <= 2, p


def test_temporal_reach_contacts_join_no_range_join(spark):
    from plato_spark.algos.temporal import temporal_reachability

    c = spark.createDataFrame(
        [(i, i + 1, 10 * i) for i in range(100)],
        "src long, dst long, tm long")
    out = temporal_reachability(c, root=0, time_col="tm", max_iters=1)
    p = plan_of(out)
    # the t >= arrival gate must stay a residual filter on the src
    # equi-join, never a BroadcastNestedLoop/range join
    assert "BroadcastNestedLoop" not in p and "Cartesian" not in p, p
