from pyspark.sql import functions as F

from plato_spark.graph.salting import salted_agg, segmented_adjacency


def test_salted_agg_equivalence(spark):
    # one hub key receiving 90% of rows + tail keys
    rows = [(0, float(i % 7)) for i in range(9000)] + [
        (k, float(k)) for k in range(1, 500) for _ in range(3)
    ]
    df = spark.createDataFrame(rows, "k long, v double")
    got = {r["k"]: r["sum_v"] for r in salted_agg(df, "k", "v", "sum").collect()}
    want = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6

    gmin = {r["k"]: r["min_v"] for r in salted_agg(df, "k", "v", "min").collect()}
    wmin = {r["k"]: r["m"] for r in df.groupBy("k").agg(F.min("v").alias("m")).collect()}
    assert gmin == wmin


def test_segmented_adjacency_caps_hub_rows(spark):
    # hub 0 with 5000 out-edges, cap 1000 -> >=5 segments, none above cap,
    # union of segments == exact neighbor set
    edges = [(0, i + 1) for i in range(5000)] + [(7, 1), (7, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seg = segmented_adjacency(df, max_per_row=1000).collect()
    hub_rows = [r for r in seg if r["id"] == 0]
    assert len(hub_rows) >= 5
    assert all(len(r["nbrs"]) <= 1000 for r in hub_rows)
    got = sorted(n for r in hub_rows for n in r["nbrs"])
    assert got == list(range(1, 5001))
    small = [r for r in seg if r["id"] == 7]
    assert sorted(n for r in small for n in r["nbrs"]) == [1, 2]
