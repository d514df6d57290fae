"""Round-4 batch 52: QQ decile table, calendar gap audit, customer
streaks."""

import datetime


def _write_orders(spark, tmp_path, date_list, cust=1):
    rows = [(i, cust if isinstance(cust, int) else cust[i], "O", 1.0,
             d, "1") for i, d in enumerate(date_list)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def test_missing_days_and_gap(spark, tmp_path):
    d = datetime.datetime
    # days 1,2,3, 7, 10 of Jan: span 10, present 5, missing 5,
    # longest gap = 3 (days 4-6)
    _write_orders(spark, tmp_path,
                  [d(2024, 1, 1), d(2024, 1, 2), d(2024, 1, 3),
                   d(2024, 1, 7), d(2024, 1, 10), d(2024, 1, 10)])
    import __spark_entry__ as entrymod

    r = entrymod.q_missing_days(spark, str(tmp_path)).collect()[0]
    assert (r.span_days, r.days_with_orders) == (10, 5)
    assert r.missing_days == 5
    assert r.longest_gap_days == 3


def test_customer_streaks_islands(spark, tmp_path):
    d = datetime.datetime
    # customer 1: days 1,2,3 then 7,8 -> streaks 3 and 2;
    # two orders on day 1 count once
    dates = [d(2024, 1, 1), d(2024, 1, 1), d(2024, 1, 2), d(2024, 1, 3),
             d(2024, 1, 7), d(2024, 1, 8)]
    _write_orders(spark, tmp_path, dates)
    import __spark_entry__ as entrymod

    r = entrymod.q_customer_streaks(spark, str(tmp_path)).collect()[0]
    assert r.n_active_days == 5
    assert r.max_streak_days == 3
    assert r.n_streaks == 2


def test_length_qq_table_rank_convention(spark, tmp_path):
    # src0 lengths 10..19 (n=10): decile q picks rank (q*9)//10 + 1;
    # src1 constant 5 -> every decile reads 5
    rows = [(i, "x", "en", "src0", 10 + i) for i in range(10)]
    rows += [(100 + i, "x", "en", "src1", 5) for i in range(4)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    import __spark_entry__ as entrymod

    out = {r.decile: (r.len_src0, r.len_src1)
           for r in entrymod.q_length_qq_table(
               spark, str(tmp_path)).collect()}
    assert len(out) == 11
    assert out[0] == (10, 5)     # rank 1
    assert out[10] == (19, 5)    # rank (10*9)//10+1 = 10
    assert out[5] == (10 + (5 * 9) // 10, 5)   # rank 5 -> value 14
