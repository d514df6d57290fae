#!/usr/bin/env python
"""Dump one-superstep physical plans for the iterative headline algos.

Reconstructs the per-superstep DataFrame exactly as the production loop
builds it (state = one checkpointed round), and writes
.explain("formatted") to plans/r06/<name>_step_<suffix>.txt.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint  # noqa: E402
from plato_spark.graph.edges import symmetrize  # noqa: E402
from plato_spark.graph.partitioning import (  # noqa: E402
    auto_shuffle_partitions, scoped_shuffle_partitions)
from plato_spark.session import get_spark  # noqa: E402
from plato_spark.sources.tables import part_cooccurrence_edges  # noqa: E402

PLANS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "plans", "r06")


def dump(df, name):
    os.makedirs(PLANS, exist_ok=True)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(os.path.join(PLANS, name), "w") as f:
        f.write(txt)
    n_ex = txt.count("Exchange")
    n_sort = txt.count(" Sort ")
    print(f"{name}: Exchange={n_ex} Sort={n_sort}", flush=True)


def main():
    suffix = os.environ.get("R06_PLAN_SUFFIX", "before")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r06_step_plan", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus,
                      extra_conf={"spark.local.dir": "/dev/shm/plato_spark_bench"})
    spark.sparkContext.setLogLevel("ERROR")

    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    canon.count()
    sym = symmetrize(canon).persist()
    n_sym = sym.count()
    shuffle_n = auto_shuffle_partitions(spark, n_sym)

    # ---- pagerank superstep, production shape -------------------------
    with scoped_shuffle_partitions(spark, shuffle_n):
        edges0 = sym
        edges = edges0.repartition(shuffle_n, "src").persist()
        div = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("wsum"))
        verts = (edges.select(F.col("src").alias("id"))
                 .unionByName(edges.select(F.col("dst").alias("id"))).distinct())
        base = (verts.join(div, "id", "left")
                .select("id", F.coalesce("wsum", F.lit(0.0)).cast("double")
                        .alias("wsum"))
                .repartition(shuffle_n, "id").persist())
        base.count()
        edge_val = edges.select("src", "dst", F.lit(1.0).alias("w"))\
            .repartition(shuffle_n, "src").persist()
        edge_val.count()
        state = base.select("id", "wsum", F.lit(1.0).alias("rank"))
        # one production round to get a checkpointed state
        def round_(st):
            contribs = st.select(
                F.col("id").alias("src"),
                F.when(F.col("wsum") > 0, F.col("rank") / F.col("wsum"))
                .otherwise(F.col("rank")).alias("contrib"))
            g = (edge_val.join(contribs, "src")
                 .groupBy(F.col("dst").alias("id"))
                 .agg(F.sum(F.col("contrib") * F.col("w")).alias("g")))
            rank_new = (F.lit(0.15) + F.lit(0.85) * F.coalesce("g", F.lit(0.0)))
            return st.join(g, "id", "left").select(
                "id", "wsum", rank_new.alias("rank"),
                F.abs(rank_new - F.col("rank")).alias("adelta"))
        s1 = cheap_localCheckpoint(round_(state).drop("adelta"))
        dump(round_(s1), f"pagerank_step_{suffix}.txt")

    # ---- wcc superstep (dense round: no broadcast), production shape ---
    from plato_spark.graph.partitioning import auto_shuffle_partitions as asp
    sym2 = symmetrize(canon.select("src", "dst")).persist()
    n2 = sym2.count()
    sn2 = asp(spark, n2)
    with scoped_shuffle_partitions(spark, sn2):
        symr = sym2.repartition(sn2, "src").persist()
        symr.count()
        verts = (symr.select(F.col("src").alias("id")).distinct()
                 .repartition(sn2, "id"))
        state = verts.select("id", F.col("id").alias("label"),
                             F.lit(True).alias("changed"))

        def wstep(st):
            frontier = st.where("changed").select(
                F.col("id").alias("src"), F.col("label").alias("msg"))
            cands = (symr.join(frontier, "src")
                     .groupBy(F.col("dst").alias("id"))
                     .agg(F.min("msg").alias("cand")))
            return st.join(cands, "id", "left").select(
                "id",
                F.least(F.col("label"), F.coalesce("cand", F.col("label")))
                .alias("label"),
                (F.coalesce("cand", F.col("label")) < F.col("label"))
                .alias("changed"))
        s1 = cheap_localCheckpoint(wstep(state))
        dump(wstep(s1), f"wcc_step_{suffix}.txt")

    # ---- lpa superstep, production shape ------------------------------
    with scoped_shuffle_partitions(spark, shuffle_n):
        e = sym.select("src", "dst").repartition(shuffle_n, "src").persist()
        e.count()
        verts = (e.select(F.col("src").alias("id"))
                 .unionByName(e.select(F.col("dst").alias("id")))
                 .distinct().repartition(shuffle_n, "id"))
        state = verts.select("id", F.col("id").alias("label"))

        def lstep(st):
            votes = (e.join(st.select(F.col("id").alias("src"), "label"), "src")
                     .groupBy(F.col("dst").alias("id"), "label")
                     .agg(F.sum(F.lit(1).cast("long")).alias("cnt")))
            winner = (votes.groupBy("id")
                      .agg(F.max(F.struct(F.col("cnt"),
                                          (-F.col("label")).alias("neg"))).alias("m"))
                      .select("id", (-F.col("m.neg")).alias("new_label")))
            return (st.join(winner, "id", "left")
                    .select("id", F.coalesce("new_label", F.col("label"))
                            .alias("label")))
        s1 = cheap_localCheckpoint(lstep(state))
        dump(lstep(s1), f"lpa_step_{suffix}.txt")

    # ---- triangles full plan ------------------------------------------
    from plato_spark.algos.triangles import _triangle_count
    with scoped_shuffle_partitions(spark, auto_shuffle_partitions(spark, canon.count())):
        dump(_triangle_count(canon, False), f"triangles_{suffix}.txt")


if __name__ == "__main__":
    main()
