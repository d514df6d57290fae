"""Round-4 batch 29: minhash calibration, discount-qty corr, CUSUM."""

from datetime import datetime, timedelta

import __spark_entry__ as entry
from plato_spark.functions.dedup import minhash_calibration


def test_minhash_calibration_identical_and_near_dup(spark):
    toks = [f"w{i}" for i in range(30)]
    text = " ".join(toks)
    text2 = " ".join(toks[:-1] + ["zzz"])  # last token changed
    docs = spark.createDataFrame(
        [(0, text, "en", "s", len(text)),
         (1, text, "en", "s", len(text)),
         (2, text2, "en", "s", len(text2))],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    got = {(r.a, r.b): r for r in minhash_calibration(docs).collect()}
    # identical pair: every slot matches, jaccard 1, err 0
    r01 = got[(0, 1)]
    assert (r01.n_match, r01.jaccard, r01.est, r01.err) == (64, 1.0, 1.0,
                                                            0.0)
    # near-dup pairs: 28 shingles each, last shingle differs ->
    # J = 27/29; the deterministic portable family collides them
    for pair in [(0, 2), (1, 2)]:
        r = got[pair]
        assert r.jaccard == round(27 / 29, 6)
        assert r.err == round(r.n_match / 64 - 27 / 29, 6)


def test_discount_qty_corr_perfect_and_degenerate(spark, tmp_path):
    li = spark.createDataFrame(
        # brand A: qty rises exactly with discount -> r = 1.0
        [(1, 0.00, 1.0), (1, 0.05, 6.0), (1, 0.10, 11.0),
         # brand B: constant discount -> zero variance -> NULL
         (2, 0.05, 3.0), (2, 0.05, 9.0)],
        "l_partkey long, l_discount double, l_quantity double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#A"), (2, "Brand#B")], "p_partkey long, p_brand string")
    li.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet"))
    part.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet"))
    got = {r.p_brand: (r.n_items, r.corr)
           for r in entry.q_discount_qty_corr(spark,
                                              str(tmp_path)).collect()}
    assert got == {"Brand#A": (3, 1.0), "Brand#B": (2, None)}


def test_cusum_finds_the_level_shift_day(spark, tmp_path):
    base = datetime(1995, 1, 1)
    rows = []
    for d in range(10):
        price = 100.0 if d < 5 else 200.0
        rows.append((d + 1, 1, "F", price, base + timedelta(days=d), "p"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet"))
    r = entry.q_cusum_changepoint(spark, str(tmp_path)).collect()[0]
    day0 = (base - datetime(1970, 1, 1)).days
    # max |10*cum - t*150000| (cents) is 250000 at t=5 (day_i offset 4)
    assert (r.day_i, r.scaled_dev, r.rel_dev) == (day0 + 4, 250000,
                                                  round(250000 / 1500000,
                                                        6))
