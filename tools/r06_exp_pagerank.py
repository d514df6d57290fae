#!/usr/bin/env python
"""Round-6 experiment: per-superstep cost of pagerank loop variants.

Variants (all compute the identical rank vector; checksum printed to prove):

  A  current production loop (cheap_localCheckpoint + separate delta agg)
  B  observe-based delta: CollectMetrics inside the checkpoint job
     (2 driver actions/superstep -> 1)
  C  persist-chain: new_state.persist(); delta agg materializes the cache
     (1 action/superstep, partitioning + real stats preserved by the cache);
     lineage truncated via cheap_localCheckpoint every TRUNC rounds
  D  C + edge_val without the w column for unweighted graphs (sum(contrib))
     + base built from two degree aggs (no distinct-union vertex pass)

Usage: SPARK_GRAFT_CPUS=32 python tools/r06_exp_pagerank.py [A B C D]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Observation  # noqa: E402

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint  # noqa: E402
from plato_spark.graph.edges import symmetrize  # noqa: E402
from plato_spark.graph.partitioning import (  # noqa: E402
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)
from plato_spark.session import get_spark  # noqa: E402
from plato_spark.sources.tables import part_cooccurrence_edges  # noqa: E402

TRUNC = 8


def run_A(spark, sym, eps=1e-6, max_iters=100):
    from plato_spark.algos.pagerank import pagerank
    st: dict = {}
    pr = pagerank(sym, damping=0.85, eps=eps, max_iters=max_iters,
                  impl="join", stats=st)
    s = pr.agg(F.sum("rank")).collect()[0][0]
    return s, st.get("iterations"), st.get("superstep_secs", [])


def _setup_common(spark, sym, shuffle_n):
    """Shared setup: edge_val partitioned by src (no w col), base (id,wsum)."""
    edge_val = (
        sym.select("src", "dst").repartition(shuffle_n, "src").persist()
    )
    edge_val.count()
    div = edge_val.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("wsum"))
    dsts = edge_val.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("_ind"))
    base = (
        div.join(dsts, "id", "full_outer")
        .select("id", F.coalesce("wsum", F.lit(0.0)).alias("wsum"))
        .persist()
    )
    base.count()
    return edge_val, base


def run_BCD(spark, sym, variant, damping=0.85, eps=1e-6, max_iters=100):
    n_edges = sym.count()
    shuffle_n = auto_shuffle_partitions(spark, n_edges)
    steps = []
    with scoped_shuffle_partitions(spark, shuffle_n):
        if variant == "B":
            # same setup as production A, observe for delta
            edges = sym.repartition(shuffle_n, "src").persist()
            div = edges.groupBy(F.col("src").alias("id")).agg(
                F.count("*").alias("wsum"))
            verts = (
                edges.select(F.col("src").alias("id"))
                .unionByName(edges.select(F.col("dst").alias("id")))
                .distinct()
            )
            base = (
                verts.join(div, "id", "left")
                .select("id", F.coalesce("wsum", F.lit(0.0)).cast("double")
                        .alias("wsum"))
                .repartition(shuffle_n, "id")
                .persist()
            )
            base.count()
            edge_val = edges.select("src", "dst", F.lit(1.0).alias("w"))\
                .repartition(shuffle_n, "src").persist()
            edge_val.count()
            wexpr = F.sum(F.col("contrib") * F.col("w"))
        else:
            edge_val, base = _setup_common(spark, sym, shuffle_n)
            wexpr = F.sum("contrib")

        state = base.select("id", "wsum", F.lit(1.0).alias("rank"))
        k, last_epoch = 0, False
        cached: list = []
        while k < max_iters:
            t0 = time.time()
            contribs = state.select(
                F.col("id").alias("src"),
                F.when(F.col("wsum") > 0, F.col("rank") / F.col("wsum"))
                .otherwise(F.col("rank")).alias("contrib"),
            )
            g = (
                edge_val.join(contribs, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(wexpr.alias("g"))
            )
            rank_new = (F.lit(1.0 - damping)
                        + F.lit(damping) * F.coalesce("g", F.lit(0.0)))
            new_state = state.join(g, "id", "left").select(
                "id", "wsum", rank_new.alias("rank"),
                F.abs(rank_new - F.col("rank")).alias("adelta"),
            )
            obs = Observation()
            new_state = new_state.observe(obs, F.sum("adelta").alias("d"))
            if variant == "B":
                new_state = cheap_localCheckpoint(new_state.drop("adelta"))
            elif variant == "E":
                # plain localCheckpoint: keeps partitioning + (bloating) stats
                new_state = new_state.drop("adelta").localCheckpoint(eager=True)
            else:  # F: plain ck, stats-less rewrap every TRUNC rounds
                new_state = new_state.drop("adelta")
                if k % TRUNC == TRUNC - 1:
                    new_state = cheap_localCheckpoint(new_state)
                else:
                    new_state = new_state.localCheckpoint(eager=True)
            delta = obs.get["d"]
            state = new_state
            steps.append(time.time() - t0)
            if last_epoch or k == max_iters - 1:
                break
            if eps > 0.0 and delta < eps:
                last_epoch = True
            k += 1
        s = state.agg(F.sum("rank")).collect()[0][0]
        for c in cached:
            c.unpersist()
    return s, k + 1, steps


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r06_exp_pagerank", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus,
                      extra_conf={"spark.local.dir": "/dev/shm/plato_spark_bench"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1_000_000, 1, 8).groupBy((F.col("id") % 7).alias("k")).count().collect()

    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    canon.count()
    sym = symmetrize(canon).persist()
    sym.count()

    variants = sys.argv[1:] or ["A", "B", "C", "D"]
    for v in variants:
        spark.catalog.clearCache()
        for df in (canon, sym):
            df.persist()
            df.count()
        t0 = time.time()
        if v == "A":
            s, iters, steps = run_A(spark, sym)
        elif v == "G":
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                s, iters, steps = run_BCD(spark, sym, "D")
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")
        else:
            s, iters, steps = run_BCD(spark, sym, v)
        total = time.time() - t0
        med = sorted(steps[1:])[len(steps[1:]) // 2] if len(steps) > 1 else None
        print(f"variant {v}: total={total:.3f}s iters={iters} "
              f"checksum={s!r} median_step={med and round(med, 3)} "
              f"steps={[round(x, 3) for x in steps]}", flush=True)


if __name__ == "__main__":
    main()
