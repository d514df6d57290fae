#!/usr/bin/env python
"""Dump one-superstep physical plans for the iterative headline algos.

Reconstructs the per-superstep DataFrame exactly as the production loop
builds it (state = one checkpointed round), and writes
.explain("formatted") to plans/r06/<name>_step_<suffix>.txt.

R06_PLAN_SUFFIX=before reproduces the ROUND-START loop shape
(cheap_localCheckpoint rewrap, no hints, AQE on, two edge copies);
R06_PLAN_SUFFIX=after (default) mirrors the optimized production shape
(loop_localCheckpoint partition preservation, shuffle_hash hints on the
V-row sides, AQE off inside the loop scope).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from plato_spark.engine.ckpt_blocks import (  # noqa: E402
    cheap_localCheckpoint, loop_localCheckpoint)
from plato_spark.graph.edges import symmetrize  # noqa: E402
from plato_spark.graph.partitioning import (  # noqa: E402
    auto_shuffle_partitions, scoped_shuffle_partitions, scoped_superstep_confs)
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
    print(f"wrote {name}", flush=True)


def main():
    suffix = os.environ.get("R06_PLAN_SUFFIX", "after")
    after = suffix != "before"
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
    scope = scoped_superstep_confs if after else scoped_shuffle_partitions
    ck = (lambda df, k: loop_localCheckpoint(df, k)) if after else (
        lambda df, k: cheap_localCheckpoint(df))
    hint = (lambda df: df.hint("shuffle_hash")) if after else (lambda df: df)

    # ---- pagerank superstep ------------------------------------------
    with scope(spark, shuffle_n):
        edge_val = sym.select("src", "dst").repartition(shuffle_n, "src").persist()
        edge_val.count()
        div = edge_val.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).cast("double").alias("wsum"))
        dsts = edge_val.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("_indeg"))
        base = (div.join(dsts, "id", "full_outer")
                .select("id", F.coalesce(F.col("wsum").cast("double"), F.lit(0.0))
                        .alias("wsum")).persist())
        base.count()
        state = base.select("id", "wsum", F.lit(1.0).alias("rank"))

        def pr_round(st):
            contribs = st.select(
                F.col("id").alias("src"),
                F.when(F.col("wsum") > 0, F.col("rank") / F.col("wsum"))
                .otherwise(F.col("rank")).alias("contrib"))
            g = (edge_val.join(hint(contribs), "src")
                 .groupBy(F.col("dst").alias("id"))
                 .agg(F.sum("contrib").alias("g")))
            rank_new = F.lit(0.15) + F.lit(0.85) * F.coalesce("g", F.lit(0.0))
            return st.join(hint(g), "id", "left").select(
                "id", "wsum", rank_new.alias("rank"),
                F.abs(rank_new - F.col("rank")).alias("adelta"))
        s1 = ck(pr_round(state).drop("adelta"), 0)
        dump(pr_round(s1), f"pagerank_step_{suffix}.txt")

    # ---- wcc superstep (dense round) ---------------------------------
    with scope(spark, shuffle_n):
        symw = symmetrize(canon.select("src", "dst")) \
            .repartition(shuffle_n, "src").persist()
        symw.count()
        verts = symw.select(F.col("src").alias("id")).distinct()
        verts.count()
        state = verts.select("id", F.col("id").alias("label"),
                             F.lit(True).alias("changed"))

        def wstep(st):
            frontier = hint(st.where("changed").select(
                F.col("id").alias("src"), F.col("label").alias("msg")))
            cands = (symw.join(frontier, "src")
                     .groupBy(F.col("dst").alias("id"))
                     .agg(F.min("msg").alias("cand")))
            return st.join(hint(cands), "id", "left").select(
                "id",
                F.least(F.col("label"), F.coalesce("cand", F.col("label")))
                .alias("label"),
                (F.coalesce("cand", F.col("label")) < F.col("label"))
                .alias("changed"))
        s1 = ck(wstep(state), 0)
        dump(wstep(s1), f"wcc_step_{suffix}.txt")

    # ---- lpa superstep -----------------------------------------------
    with scope(spark, shuffle_n):
        e = sym.select("src", "dst").repartition(shuffle_n, "src").persist()
        e.count()
        srcs = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("_o"))
        dsts = e.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("_i"))
        verts = srcs.join(dsts, "id", "full_outer").select("id")
        state = verts.select("id", F.col("id").alias("label"))

        def lstep(st):
            votes = (e.join(hint(st.select(F.col("id").alias("src"), "label")), "src")
                     .groupBy(F.col("dst").alias("id"), "label")
                     .agg(F.sum(F.lit(1).cast("long")).alias("cnt")))
            winner = (votes.groupBy("id")
                      .agg(F.max(F.struct(F.col("cnt"),
                                          (-F.col("label")).alias("neg"))).alias("m"))
                      .select("id", (-F.col("m.neg")).alias("new_label")))
            return (st.join(hint(winner), "id", "left")
                    .select("id", F.coalesce("new_label", F.col("label"))
                            .alias("label")))
        s1 = ck(lstep(state), 0)
        dump(lstep(s1), f"lpa_step_{suffix}.txt")

    # ---- triangles full plan ------------------------------------------
    from plato_spark.algos.triangles import _triangle_count
    rpp = 75_000 if after else 250_000
    with scoped_shuffle_partitions(
            spark, auto_shuffle_partitions(spark, canon.count(),
                                           rows_per_partition=rpp)):
        dump(_triangle_count(canon, False), f"triangles_{suffix}.txt")


if __name__ == "__main__":
    main()
