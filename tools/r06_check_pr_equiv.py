#!/usr/bin/env python
"""Per-vertex equivalence check: production pagerank vs r6 loop variant."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from plato_spark.algos.pagerank import pagerank  # noqa: E402
from plato_spark.graph.edges import symmetrize  # noqa: E402
from plato_spark.session import get_spark  # noqa: E402
from plato_spark.sources.tables import part_cooccurrence_edges  # noqa: E402
from tools.r06_exp_pagerank import run_BCD  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(app_name="r06_equiv", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus,
                      extra_conf={"spark.local.dir": "/dev/shm/plato_spark_bench"})
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"]:
        canon = part_cooccurrence_edges(spark, sf_dir).persist()
        canon.count()
        sym = symmetrize(canon).persist()
        sym.count()
        old = pagerank(sym, damping=0.85, eps=1e-6, max_iters=100,
                       impl="join").persist()
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        new_df = run_variant_df(spark, sym)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        j = old.alias("o").join(new_df.alias("n"), "id", "full_outer")
        r = j.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("o.rank").isNull() | F.col("n.rank").isNull(), 1)
                  .otherwise(0)).alias("missing"),
            F.sum(F.when(F.col("o.rank") != F.col("n.rank"), 1).otherwise(0))
            .alias("bit_diff"),
            F.sum(F.when(F.round(F.col("o.rank"), 6) != F.round(F.col("n.rank"), 6), 1)
                  .otherwise(0)).alias("r6_diff"),
            F.max(F.abs(F.col("o.rank") - F.col("n.rank"))).alias("max_abs"),
        ).collect()[0]
        print(f"{sf_dir}: n={r['n']} missing={r['missing']} "
              f"bit_diff={r['bit_diff']} r6_diff={r['r6_diff']} "
              f"max_abs={r['max_abs']}", flush=True)
        old.unpersist()
        spark.catalog.clearCache()


def run_variant_df(spark, sym, damping=0.85, eps=1e-6, max_iters=100):
    """D-variant loop returning the final state DataFrame."""
    import time  # noqa: F401
    from pyspark.sql import Observation
    from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint
    from plato_spark.graph.partitioning import (
        auto_shuffle_partitions, scoped_shuffle_partitions)
    n_edges = sym.count()
    shuffle_n = auto_shuffle_partitions(spark, n_edges)
    with scoped_shuffle_partitions(spark, shuffle_n):
        edge_val = sym.select("src", "dst").repartition(shuffle_n, "src").persist()
        edge_val.count()
        div = edge_val.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).cast("double").alias("wsum"))
        dsts = edge_val.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("_ind"))
        base = (div.join(dsts, "id", "full_outer")
                .select("id", F.coalesce("wsum", F.lit(0.0)).alias("wsum"))
                .persist())
        base.count()
        state = base.select("id", "wsum", F.lit(1.0).alias("rank"))
        k, last_epoch = 0, False
        while k < max_iters:
            contribs = state.select(
                F.col("id").alias("src"),
                F.when(F.col("wsum") > 0, F.col("rank") / F.col("wsum"))
                .otherwise(F.col("rank")).alias("contrib"))
            g = (edge_val.join(contribs, "src")
                 .groupBy(F.col("dst").alias("id"))
                 .agg(F.sum("contrib").alias("g")))
            rank_new = (F.lit(1.0 - damping)
                        + F.lit(damping) * F.coalesce("g", F.lit(0.0)))
            new_state = state.join(g, "id", "left").select(
                "id", "wsum", rank_new.alias("rank"),
                F.abs(rank_new - F.col("rank")).alias("adelta"))
            obs = Observation()
            new_state = new_state.observe(obs, F.sum("adelta").alias("d"))
            new_state = new_state.drop("adelta")
            if k % 8 == 7:
                new_state = cheap_localCheckpoint(new_state)
            else:
                new_state = new_state.localCheckpoint(eager=True)
            delta = obs.get["d"]
            state = new_state
            if last_epoch or k == max_iters - 1:
                break
            if eps > 0.0 and delta < eps:
                last_epoch = True
            k += 1
    return state.select("id", "rank")


if __name__ == "__main__":
    main()
