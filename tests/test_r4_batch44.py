"""Round-4 batch 44: Q4-shape EXISTS count, Coleman-Liau readability,
Jarvis-Patrick SNN clustering."""

import datetime

from plato_spark.functions.similarity import snn_clusters


def test_priority_late_orders_exists_semantics(spark, tmp_path):
    # order 1: two late lines (counted ONCE); order 2: on-time only;
    # order 3: exactly 30 days late -> NOT late (> is strict)
    d = datetime.datetime
    orders = spark.createDataFrame(
        [(1, 10, "O", 1.0, d(2024, 1, 1), "1-URGENT"),
         (2, 11, "O", 1.0, d(2024, 1, 1), "1-URGENT"),
         (3, 12, "O", 1.0, d(2024, 1, 1), "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    li_rows = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2024, 3, 1)),
        (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2024, 4, 1)),
        (2, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2024, 1, 5)),
        (3, 4, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2024, 1, 31)),
    ]
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    orders.write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet"))
    li.write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet"))
    import __spark_entry__ as entrymod

    out = {r.o_orderpriority: r.order_count
           for r in entrymod.q_priority_late_orders(
               spark, str(tmp_path)).collect()}
    assert out == {"1-URGENT": 1}


def test_readability_cli_hand_counts(spark, tmp_path):
    # "Go now. Stop!" -> letters 9, words 3, sentences 2
    # L = 300, S = 66.666..., CLI = 0.0588*300 - 0.296*200/3 - 15.8
    docs = spark.createDataFrame(
        [(1, "Go now. Stop!", "en", "srcA", 13),
         (2, "no terminators here", "en", "srcB", 19)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    import __spark_entry__ as entrymod

    out = {r.source: r
           for r in entrymod.q_readability_cli(
               spark, str(tmp_path)).collect()}
    a = out["srcA"]
    assert (a.letters, a.words, a.sentences) == (9, 3, 2)
    expect = 0.0588 * (9 / 3 * 100) - 0.296 * (2 / 3 * 100) - 15.8
    assert abs(a.cli - round(expect, 6)) < 1e-9
    # zero terminators floor at 1 sentence per doc
    assert out["srcB"].sentences == 1


def test_snn_clusters_two_blobs(spark):
    # two DIRECTIONALLY separated 4-point blobs (cosine metric!): blob A
    # hugs (1,0), blob B hugs (0,1); k=3 keeps every kNN list inside the
    # blob, so mutual-kNN with kt=2 links each blob into one component;
    # min-id labels are 1 and 11
    pts = [(1, [1.0, 0.0]), (2, [1.0, 0.02]), (3, [1.0, 0.04]),
           (4, [1.0, 0.06]),
           (11, [0.0, 1.0]), (12, [0.02, 1.0]), (13, [0.04, 1.0]),
           (14, [0.06, 1.0])]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.cluster for r in
           snn_clusters(emb, k=3, kt=2).collect()}
    assert out[1] == out[2] == out[3] == out[4] == 1
    assert out[11] == out[12] == out[13] == out[14] == 11


def test_snn_singleton_keeps_own_id(spark):
    # an orthogonal lone point never forms a mutual link -> singleton
    pts = [(1, [1.0, 0.0]), (2, [1.0, 0.02]), (3, [1.0, 0.04]),
           (4, [1.0, 0.06]), (99, [0.0, 1.0])]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.cluster for r in
           snn_clusters(emb, k=3, kt=3).collect()}
    assert out[99] == 99
    assert len(out) == 5
