"""Round-4 batch 13: PIVOT zero cells, CUBE lvl bits, set-op Venn."""

from pyspark.sql import functions as F


def test_pivot_zero_cell_is_zero_not_null(spark):
    df = spark.createDataFrame(
        [("A", "X"), ("A", "X"), ("B", "Y")], "g string, s string")
    piv = df.groupBy("g").pivot("s", ["X", "Y"]).agg(
        F.count(F.lit(1)).cast("long"))
    # raw pivot leaves missing cells null -> the query coalesces to 0
    assert any(r.Y is None or r.X is None for r in piv.collect())
    fixed = piv.select(
        "g", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("X", "Y")])
    got = {r.g: (r.X, r.Y) for r in fixed.collect()}
    assert got == {"A": (2, 0), "B": (0, 1)}


def test_cube_lvl_bits_disambiguate_subtotals(spark):
    df = spark.createDataFrame([("P", "HI"), ("P", "LO"), ("F", "HI")],
                               "st string, pr string")
    out = (df.cube("st", "pr")
           .agg((F.grouping("st") * 2 + F.grouping("pr")).cast("int")
                .alias("lvl"),
                F.count(F.lit(1)).cast("long").alias("n"))
           .collect())
    by_lvl = {}
    for r in out:
        by_lvl.setdefault(r.lvl, []).append(r)
    # 3 leaves, 2 status subtotals (pr grouped), 2 priority subtotals,
    # 1 grand total
    assert sorted((k, len(v)) for k, v in by_lvl.items()) == [
        (0, 3), (1, 2), (2, 2), (3, 1)]
    assert [r.n for r in by_lvl[3]] == [3]


def test_audience_overlap_venn(spark):
    ev = spark.createDataFrame(
        [(1, "view"), (2, "view"), (2, "purchase"), (3, "purchase"),
         (1, "view")],
        "user_id long, event_type string")
    viewers = ev.where(F.col("event_type") == "view").select(
        "user_id").distinct()
    buyers = ev.where(F.col("event_type") == "purchase").select(
        "user_id").distinct()
    assert viewers.intersect(buyers).count() == 1      # user 2
    assert viewers.subtract(buyers).count() == 1       # user 1
    assert buyers.subtract(viewers).count() == 1       # user 3
