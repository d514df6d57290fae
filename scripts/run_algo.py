#!/usr/bin/env python
"""Generic spark-submit entry point: corpus -> extraction -> <algorithm> -> sink.

One launcher for the whole algorithm menu (the reference ships one binary
per algorithm under example/ + scripts/run_*.sh; this is the Spark-native
equivalent of that CLI surface):

    scripts/build_pyfiles.sh dist/plato_spark.zip
    spark-submit --master <cluster> --py-files dist/plato_spark.zip \
        scripts/run_algo.py --algo wcc --sf 0.1 --output /out/components

Algorithms: pagerank (see run_pagerank.py for the full-option variant),
wcc, wcc-jump, lpa, triangles, kcore, bfs, hanp, louvain, clustering,
mis, matching, msf, coloring, densest, knn-sparsify.
Local sandbox: python scripts/run_algo.py --algo wcc --sf 0.01
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local runs: make the repo root importable (spark-submit --py-files covers
# the cluster path; this covers `python scripts/run_algo.py`)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", required=True,
                    choices=["pagerank", "wcc", "wcc-jump", "lpa", "triangles",
                             "kcore", "bfs", "hanp", "louvain", "clustering",
                             "mis", "matching", "msf", "coloring",
                             "densest", "knn-sparsify"])
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--decode", action="store_true",
                    help="join results back to original string vertex keys")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from plato_spark.api import LinkGraph
    from plato_spark.corpus.generator import synth_corpus
    from plato_spark.engine.checkpoint import CheckpointManager
    from plato_spark.sources.sinks import write_result

    # under spark-submit the master is preset; bare local runs get the
    # project session (memory/AQE/Arrow tuned) instead of 1g defaults
    from pyspark import SparkConf
    if SparkConf().contains("spark.master"):  # set by spark-submit
        spark = SparkSession.builder.appName(f"plato_spark_{args.algo}").getOrCreate()
    else:
        from plato_spark.session import get_spark
        spark = get_spark(app_name=f"plato_spark_{args.algo}")

    t0 = time.time()
    g = LinkGraph.from_corpus(spark, synth_corpus(spark, args.sf))
    kw = {}
    if args.iterations is not None:
        if args.algo in ("lpa", "hanp"):
            kw["iterations"] = args.iterations
        elif args.algo == "louvain":
            kw["outer_iterations"] = args.iterations
        elif args.algo in ("pagerank", "wcc", "wcc-jump", "kcore"):
            kw["max_iters"] = args.iterations

    if args.algo == "pagerank":
        ckpt_dir = args.checkpoint
        result = g.pagerank(decode=args.decode, ckpt_dir=ckpt_dir, **kw)
    elif args.algo == "wcc":
        result = g.connected_components(decode=args.decode, **kw)
    elif args.algo == "wcc-jump":
        result = g.connected_components(decode=args.decode, impl="jump", **kw)
    elif args.algo == "lpa":
        result = g.label_propagation(decode=args.decode, **kw)
    elif args.algo == "triangles":
        result = g.triangle_count()
    elif args.algo == "kcore":
        result = g.kcore(**kw)
    elif args.algo == "bfs":
        root = g.edges.selectExpr("min(src) AS m").collect()[0]["m"]
        result = g.bfs(root=int(root))
    elif args.algo == "hanp":
        result = g.hanp(decode=args.decode, **kw)
    elif args.algo == "louvain":
        result = g.louvain(**kw)
    elif args.algo == "clustering":
        result = g.clustering_coefficient(decode=args.decode)
    elif args.algo == "mis":
        result = g.maximal_independent_set()
    elif args.algo == "matching":
        result = g.maximal_matching()
    elif args.algo == "msf":
        result = g.minimum_spanning_forest()
    elif args.algo == "coloring":
        result = g.coloring()
    elif args.algo == "densest":
        from plato_spark.algos.densest import densest_subgraph
        result = densest_subgraph(g.edges.select("src", "dst"))
    elif args.algo == "knn-sparsify":
        result = g.knn_sparsify(k=10)

    if args.output:
        write_result(result, args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = result.count()
    print(json.dumps({
        "algo": args.algo, "rows": n,
        "elapsed_sec": round(time.time() - t0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
