#!/usr/bin/env python
"""Round-6 optimization profiling harness (guide §1: measure first).

Breaks each headline bench query into labeled phases (setJobDescription),
times them with the noop sink where applicable, and dumps
.explain("formatted") plans to plans/r06/.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
           python tools/r06_profile.py [phase ...]
Phases: extract pagerank wcc lpa triangles  (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from plato_spark.session import get_spark  # noqa: E402

PLANS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "plans", "r06")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"  {label:48s} {dt:7.3f}s", flush=True)
    return out, dt


def dump_plan(df, name):
    os.makedirs(PLANS, exist_ok=True)
    with open(os.path.join(PLANS, name), "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    shuffle_n = int(os.environ.get("PLATO_SPARK_SHUFFLE_PARTITIONS", str(2 * cpus)))
    suffix = os.environ.get("R06_PLAN_SUFFIX", "before")
    phases = set(sys.argv[1:]) or {"extract", "pagerank", "wcc", "lpa", "triangles"}

    spark = get_spark(
        app_name="r06_profile", master=f"local[{cpus}]",
        shuffle_partitions=shuffle_n,
        extra_conf={"spark.local.dir": "/dev/shm/plato_spark_bench"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up identical to bench.py
    from pyspark.sql.functions import pandas_udf
    spark.range(0, 1_000_000, 1, 8).groupBy((F.col("id") % 7).alias("k")).count().collect()

    @pandas_udf("long")
    def _wu(s: pd.Series) -> pd.Series:
        return s * 2
    spark.range(0, 2 * cpus, 1, cpus).select(_wu("id").alias("x")).agg(F.sum("x")).collect()

    results: dict[str, dict] = {}

    if "extract" in phases:
        print("== corpus_extract phase breakdown ==", flush=True)
        from plato_spark.corpus.extract import (
            extract_graph_encoded, path_link_edges, with_content_sha,
        )
        from plato_spark.corpus.generator import corpus_params, synth_corpus
        from plato_spark.graph.edges import build_dictionary
        from plato_spark.graph.partitioning import (
            auto_shuffle_partitions, scoped_shuffle_partitions,
        )
        r = {}
        expected_rows = corpus_params(sf)["n_commits"] * 6
        ext_p = auto_shuffle_partitions(spark, expected_rows, rows_per_partition=25_000)
        spark.catalog.clearCache()
        with scoped_shuffle_partitions(spark, ext_p):
            corpus = synth_corpus(spark, sf).persist()
            _, r["p0_corpus_materialize"] = timed(
                spark, "extract: corpus persist+count", corpus.count)
            stamped = with_content_sha(corpus)
            files_cf = stamped.select(
                "commit", F.concat_ws("/", "repo", "path").alias("fkey")
            ).dropDuplicates(["commit", "fkey"]).persist()
            _, r["p1_files_cf"] = timed(
                spark, "extract: files_cf dropDup persist+count", files_cf.count)
            pl = path_link_edges(stamped.select("repo", "path")).persist()
            _, r["p2_path_links"] = timed(
                spark, "extract: path_link_edges persist+count", pl.count)
            keys = (
                files_cf.select(F.col("fkey").alias("vkey"))
                .unionByName(pl.select(F.col("src").alias("vkey")))
                .unionByName(pl.select(F.col("dst").alias("vkey")))
                .distinct()
            )
            dic_box = {}
            _, r["p3_dictionary"] = timed(
                spark, "extract: build_dictionary",
                lambda: dic_box.update(d=build_dictionary(keys, ext_p)) or
                dic_box["d"].count())
            dic = dic_box["d"]
            cf_enc = files_cf.join(
                dic.select(F.col("vkey").alias("fkey"), "id"), "fkey"
            ).select("commit", "id")
            lists = cf_enc.groupBy("commit").agg(
                F.sort_array(F.collect_set("id")).alias("vids"))
            _, r["p4_lists_noop"] = timed(
                spark, "extract: encoded commit lists (noop)", lambda: noop(lists))
            # full extraction end-to-end (fresh, as the bench does)
            spark.catalog.clearCache()
            corpus = synth_corpus(spark, sf).persist()
            def full():
                enc, dic2, _ = extract_graph_encoded(corpus)
                return enc.count()
            n, r["full_cold"] = timed(spark, "extract: FULL cold end-to-end", full)
            spark.catalog.clearCache()
            corpus = synth_corpus(spark, sf).persist()
            def full2():
                enc, dic2, _ = extract_graph_encoded(corpus)
                dump_plan(enc, f"corpus_extract_{suffix}.txt")
                return enc.count()
            n, r["full_warm"] = timed(spark, "extract: FULL warm end-to-end", full2)
        spark.catalog.clearCache()
        results["extract"] = r

    if phases & {"pagerank", "wcc", "lpa", "triangles"}:
        from plato_spark.graph.edges import symmetrize
        from plato_spark.sources.tables import part_cooccurrence_edges
        canon = part_cooccurrence_edges(spark, sf_dir).persist()
        n_edges = canon.count()
        sym = symmetrize(canon).persist()
        sym.count()
        print(f"graph: {n_edges} canonical edges", flush=True)

        def _fresh():
            spark.catalog.clearCache()
            for df in (canon, sym):
                df.persist()
                df.count()

    if "pagerank" in phases:
        print("== pagerank breakdown ==", flush=True)
        from plato_spark.algos.pagerank import pagerank
        r = {}
        for i in range(2):
            _fresh()
            st = {}
            t0 = time.time()
            pr = pagerank(sym, damping=0.85, eps=1e-6, max_iters=100,
                          impl="join", stats=st)
            pr.select(F.sum("rank")).collect()
            r[f"run{i}_total"] = time.time() - t0
            steps = st.get("superstep_secs", [])
            r[f"run{i}_steps"] = [round(s, 3) for s in steps]
            r[f"run{i}_setup"] = round(r[f"run{i}_total"] - sum(steps), 3)
            print(f"  run{i}: total={r[f'run{i}_total']:.3f} "
                  f"setup≈{r[f'run{i}_setup']} steps={r[f'run{i}_steps']}",
                  flush=True)
        results["pagerank"] = r

    if "wcc" in phases:
        print("== wcc breakdown ==", flush=True)
        from plato_spark.algos.wcc import connected_components
        r = {}
        for i in range(2):
            _fresh()
            t0 = time.time()
            connected_components(canon).select(
                F.count_distinct("component")).collect()
            r[f"run{i}_total"] = round(time.time() - t0, 3)
            print(f"  run{i}: total={r[f'run{i}_total']}", flush=True)
        results["wcc"] = r

    if "lpa" in phases:
        print("== lpa breakdown ==", flush=True)
        from plato_spark.algos.lpa import label_propagation
        r = {}
        for i in range(2):
            _fresh()
            t0 = time.time()
            label_propagation(sym, iterations=10).select(
                F.count_distinct("label")).collect()
            r[f"run{i}_total"] = round(time.time() - t0, 3)
            print(f"  run{i}: total={r[f'run{i}_total']}", flush=True)
        results["lpa"] = r

    if "triangles" in phases:
        print("== triangles breakdown ==", flush=True)
        from plato_spark.algos.triangles import triangle_count
        r = {}
        for i in range(2):
            _fresh()
            t0 = time.time()
            n = triangle_count(canon).collect()[0]["triangles"]
            r[f"run{i}_total"] = round(time.time() - t0, 3)
            print(f"  run{i}: total={r[f'run{i}_total']} n={n}", flush=True)
        results["triangles"] = r

    print(json.dumps(results))


if __name__ == "__main__":
    main()
