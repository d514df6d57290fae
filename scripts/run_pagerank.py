#!/usr/bin/env python
"""spark-submit entry point: corpus -> extraction -> PageRank -> sink.

Cluster usage (the north-rule submit path; mirror of the reference's
scripts/run_pagerank.sh mpiexec launcher):

    scripts/build_pyfiles.sh dist/plato_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/plato_spark.zip \
        scripts/run_pagerank.py \
        --sf 0.1 --eps 1e-6 --damping 0.85 --iterations 100 \
        --checkpoint /ckpt/pagerank --output /out/ranks

Local sandbox: python scripts/run_pagerank.py --sf 0.01
(builds its own local[N] session when no master is set by spark-submit).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--eps", type=float, default=1e-6)
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--impl", choices=["join", "spmv"], default="join")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from plato_spark.algos.pagerank import pagerank
    from plato_spark.corpus.extract import extract_graph
    from plato_spark.corpus.generator import synth_corpus
    from plato_spark.engine.checkpoint import CheckpointManager
    from plato_spark.graph.edges import encode_vertices, symmetrize, canonicalize_undirected
    from plato_spark.sources.sinks import write_result

    from pyspark import SparkConf
    if SparkConf().contains("spark.master"):  # set by spark-submit
        spark = SparkSession.builder.appName("plato_spark_pagerank").getOrCreate()
    else:
        from plato_spark.session import get_spark
        spark = get_spark(app_name="plato_spark_pagerank")

    t0 = time.time()
    corpus = synth_corpus(spark, args.sf)
    edges_str, stamped = extract_graph(corpus)
    edges_str = edges_str.persist()
    enc, dic = encode_vertices(edges_str)
    canon = canonicalize_undirected(enc)
    sym = symmetrize(canon)

    ckpt = (
        CheckpointManager(args.checkpoint, "pagerank",
                          {"damping": args.damping, "eps": args.eps})
        if args.checkpoint
        else None
    )
    stats: dict = {}
    ranks = pagerank(
        sym, damping=args.damping, eps=args.eps, max_iters=args.iterations,
        impl=args.impl, ckpt=ckpt, stats=stats,
    )
    if args.output:
        write_result(ranks.join(dic, "id").select("vkey", "rank"), args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = ranks.count()
    print(json.dumps({
        "rows": n,
        "iterations": stats.get("iterations"),
        "elapsed_sec": round(time.time() - t0, 3),
        "supersteps_per_sec": round(
            stats.get("iterations", 0) / max(time.time() - t0, 1e-9), 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
