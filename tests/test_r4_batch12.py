"""Round-4 batch 12: kNN hubness 0-bin, degree-mixing buckets, zipf
composite-key rank order, session-gap seconds conversion."""

from pyspark.sql import functions as F


def test_knn_hubness_zero_bin_exists(spark):
    # star, k=1: every leaf picks the center; the center picks only its
    # strongest leaf -> leaves 2,3 have in-degree 0 and MUST appear
    from plato_spark.functions.recommend import knn_graph

    canon = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 5.0), (0, 3, 1.0)],
        "src long, dst long, weight double")
    knn = knn_graph(canon, k=1)
    verts = (canon.select(F.col("src").alias("id"))
             .unionByName(canon.select(F.col("dst").alias("id")))
             .distinct())
    ind = knn.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("ind"))
    hist = {
        r.in_degree: r.n
        for r in verts.join(ind, "id", "left")
        .select(F.coalesce("ind", F.lit(0)).alias("in_degree"))
        .groupBy("in_degree").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # leaf 1: in-deg 1 (from center); center: in-deg 3; leaves 2,3: 0
    assert hist == {0: 2, 1: 1, 3: 1}


def test_degree_mixing_star_buckets(spark):
    # K1,3: center degree 3 (bit length 2), leaves degree 1 (bit
    # length 1) -> all 3 canonical edges land in (1, 2)
    canon = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long")
    sym = canon.unionByName(canon.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    e = (canon.join(deg.select(F.col("id").alias("sid"),
                               F.col("deg").alias("ds")),
                    F.col("src") == F.col("sid"))
         .join(deg.select(F.col("id").alias("did"),
                          F.col("deg").alias("dd")),
               F.col("dst") == F.col("did")))
    bs = F.length(F.bin(F.col("ds"))).cast("int")
    bd = F.length(F.bin(F.col("dd"))).cast("int")
    out = (e.select(F.least(bs, bd).alias("lo"),
                    F.greatest(bs, bd).alias("hi"))
           .groupBy("lo", "hi").count().collect())
    assert len(out) == 1
    assert (out[0].lo, out[0].hi, out[0]["count"]) == (1, 2, 3)


def test_zipf_composite_key_orders_tf_desc_token_asc(spark):
    # equal tf -> token ASC breaks the tie; higher tf ranks first
    from plato_spark.graph.edges import build_dictionary

    tf = spark.createDataFrame(
        [("zed", 5), ("apple", 5), ("rare", 1)], "token string, tf long")
    keyed = tf.select(
        "token",
        F.concat(F.lpad((F.lit(10**12) - F.col("tf")).cast("string"),
                        13, "0"),
                 F.col("token")).alias("vkey"))
    d = build_dictionary(keyed.select("vkey"), 2)
    ranked = {r.token: r.rank for r in keyed.join(d, "vkey").select(
        "token", (F.col("id") + 1).alias("rank")).collect()}
    assert ranked == {"apple": 1, "zed": 2, "rare": 3}
