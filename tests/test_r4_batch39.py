"""Round-4 batch 39: heavy-edge-matching coarsening stats."""

from pyspark.sql import functions as F

from plato_spark.algos.matching import maximal_matching


def test_coarsen_relabel_logic_on_path4(spark):
    # replicate q_coarsen_stats' relabel on a hand graph: path 0-1-2-3.
    # the hash-priority matching picks a maximal set; whatever it picks,
    # the contracted graph must have V' = 4 - |M| vertices and
    # every surviving edge connects two DIFFERENT supervertices.
    canon = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long")
    m = maximal_matching(canon).select("src", "dst")
    n_m = m.count()
    assert n_m in (1, 2)  # a maximal matching on P4 has 1 or 2 edges
    mp = m.select(F.col("src").alias("id"), F.col("src").alias("sv")) \
        .unionByName(m.select(F.col("dst").alias("id"),
                              F.col("src").alias("sv")))
    verts = canon.select(F.col("src").alias("id")).unionByName(
        canon.select(F.col("dst").alias("id"))).distinct()
    fm = verts.join(mp, "id", "left").select(
        "id", F.coalesce("sv", F.col("id")).alias("sv"))
    relab = (
        canon.join(fm.withColumnRenamed("id", "src")
                   .withColumnRenamed("sv", "sa"), "src")
        .join(fm.withColumnRenamed("id", "dst")
              .withColumnRenamed("sv", "sb"), "dst")
        .where(F.col("sa") != F.col("sb"))
        .select(F.least("sa", "sb").alias("s"),
                F.greatest("sa", "sb").alias("t"))
        .distinct()
    )
    supers = {r.sv for r in fm.select("sv").distinct().collect()}
    assert len(supers) == 4 - n_m
    for r in relab.collect():
        assert r.s != r.t and r.s in supers and r.t in supers
    # P4 contracts to a path/star on (4 - n_m) supervertices: edge
    # count must be at least V' - 1 (still connected) and < original
    assert (4 - n_m) - 1 <= relab.count() < 3
