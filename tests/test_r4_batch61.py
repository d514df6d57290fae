"""Round-4 batch 61: coreness-degree corr, circuit rank, token
lengths."""

import datetime

from plato_spark.algos.wcc import connected_components
from plato_spark.graph.edges import symmetrize


def test_circuit_rank_identities(spark):
    # forest: rank 0; adding one edge closes exactly one cycle
    forest = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long")
    comp = connected_components(symmetrize(forest))
    m, n = 3, comp.count()
    c = comp.select("component").distinct().count()
    assert m - n + c == 0
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11)], "src long, dst long")
    comp2 = connected_components(symmetrize(cyc))
    assert 4 - comp2.count() + \
        comp2.select("component").distinct().count() == 1


def test_token_length_profile_counts(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a bb extraordinarily", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    import __spark_entry__ as entrymod

    r = entrymod.q_token_length_profile(spark, str(tmp_path)).collect()[0]
    assert (r.n_tokens, r.total_chars, r.max_len) == (3, 18, 15)
    assert r.n_long == 1   # only 'extraordinarily' (15) exceeds 10
    assert r.mean_len == 6.0


def test_coreness_degree_corr_identical_ranks(spark, tmp_path):
    # on a graph where coreness order == degree order (a clique plus a
    # pendant chain), spearman is 1.0 through the registered query
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

    r = entrymod.q_coreness_degree_corr(spark, str(tmp_path)).collect()[0]
    # triangle {1,2,3} + pendant 4: coreness (2,2,2,1), degree (2,2,3,1)
    # -> rank orders agree under the (value, id) tie discipline
    assert r.n_vertices == 4
    assert r.spearman == 1.0
