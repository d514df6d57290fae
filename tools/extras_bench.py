#!/usr/bin/env python
"""Scale-shape evidence extras (run on an IDLE machine; results pasted into
BENCH/extra.md):

1. kcore-decay  — per-superstep frontier size + wall time of the
   frontier-pruned k-core on the sf0.1 co-occurrence graph: late rounds
   must cost a small fraction of round 1 (the reference's active-set
   effect, kcore.hpp:150-171).
2. node2vec-throughput — biased-pick step throughput on a mean-degree~50
   fixture (the vectorized Arrow kernel vs the per-row baseline bound:
   VERDICT r1 asked for >=5x; we report absolute steps/s and walker-steps/s).
3. ann-recall — recall@k of the two scale-path ANN indexes (IVF cells,
   sign-LSH buckets) against the exact brute-force top-k on the sf
   embeddings table, with wall times: the measured accuracy/cost tradeoff
   behind defaulting the bucketed paths at 100TB.
4. sf1-ab — the join-plan vs grouped-CSR/Arrow-SpMV PageRank A/B at sf=1
   (11.6M string edges), measuring where the crossover sits instead of
   asserting it (VERDICT r1 #10). Fixed superstep count so both plans do
   identical numeric work.

Usage: python tools/extras_bench.py [kcore|node2vec|ann|sf1|all] [sf_dir]
("all" excludes sf1 — it is a ~10 min dedicated run.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from plato_spark.algos.kcore import kcore  # noqa: E402
from plato_spark.algos.walks import random_walks  # noqa: E402
from plato_spark.session import get_spark  # noqa: E402
from plato_spark.sources.tables import part_cooccurrence_edges  # noqa: E402


def bench_kcore(spark, sf_dir):
    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    canon.count()
    metrics: list = []
    t0 = time.time()
    out = kcore(canon, metrics=metrics)
    n = out.count()
    total = time.time() - t0
    first = metrics[0]["sec"]
    late = [m["sec"] for m in metrics[len(metrics) // 2:]]
    print(json.dumps({
        "extra": "kcore_decay",
        "sf_dir": sf_dir,
        "vertices": n,
        "iterations": len(metrics),
        "total_sec": round(total, 2),
        "iter1_sec": first,
        "late_half_mean_sec": round(sum(late) / max(len(late), 1), 3),
        "per_iter": metrics,
    }))


def bench_node2vec(spark, sf_dir):
    # mean-degree ~50 fixture: 100k directed edges over 2000 vertices
    n_v, n_e = 2000, 100_000
    e = (
        spark.range(n_e)
        .select(
            F.pmod(F.xxhash64("id", F.lit(11)), F.lit(n_v)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(13)), F.lit(n_v)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    n_edges = e.count()
    walk_len = 8
    t0 = time.time()
    walks = random_walks(e, walk_length=walk_len, p=2.0, q=0.5, seed=11)
    n_walkers = walks.count()
    steps = walks.agg(F.sum(F.size("path") - 1)).collect()[0][0]
    sec = time.time() - t0
    print(json.dumps({
        "extra": "node2vec_step_throughput",
        "edges": n_edges,
        "mean_out_degree": round(n_edges / n_v, 1),
        "walkers": n_walkers,
        "walk_length": walk_len,
        "walker_steps": int(steps),
        "total_sec": round(sec, 2),
        "walker_steps_per_sec": round(steps / sec, 1),
        "supersteps_per_sec": round((walk_len - 1) / sec, 3),
    }))


def bench_ann_recall(spark, sf_dir, k=10):
    from plato_spark.functions.similarity import (
        brute_force_topk,
        ivf_ann,
        lsh_bucketed_neighbors_portable,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).persist()
    n = emb.count()

    t0 = time.time()
    truth = brute_force_topk(emb, k=k).select("query_id", "nbr_id").persist()
    n_truth = truth.count()
    t_brute = time.time() - t0

    def recall(approx_df):
        hit = truth.join(approx_df.select("query_id", "nbr_id"),
                         ["query_id", "nbr_id"]).count()
        return hit / n_truth

    # operating points picked from the measured sweep in BENCH/extra.md
    t0 = time.time()
    ivf = ivf_ann(emb, k=k, n_clusters=8, n_probe=4).persist()
    ivf.count()
    t_ivf = time.time() - t0
    r_ivf = recall(ivf)

    t0 = time.time()
    lsh = lsh_bucketed_neighbors_portable(emb, k=k, num_planes=5,
                                          num_tables=12).persist()
    lsh.count()
    t_lsh = time.time() - t0
    r_lsh = recall(lsh)

    print(json.dumps({
        "extra": "ann_recall",
        "sf_dir": sf_dir,
        "vectors": n,
        "k": k,
        "brute_force_sec": round(t_brute, 2),
        "ivf_sec": round(t_ivf, 2),
        "ivf_recall": round(r_ivf, 4),
        "ivf_params": {"n_clusters": 8, "n_probe": 4},
        "lsh_sec": round(t_lsh, 2),
        "lsh_recall": round(r_lsh, 4),
        "lsh_params": {"num_planes": 5, "num_tables": 12},
    }))


def bench_sf1_ab(spark, iters=10):
    from plato_spark.algos.pagerank import pagerank
    from plato_spark.corpus.extract import extract_graph_encoded
    from plato_spark.corpus.generator import synth_corpus
    from plato_spark.graph.edges import symmetrize

    t0 = time.time()
    corpus = synth_corpus(spark, 1.0).persist()
    enc, dic, _ = extract_graph_encoded(corpus)
    enc = enc.persist()
    n_edges = enc.count()
    t_extract = time.time() - t0
    corpus.unpersist()

    sym = symmetrize(enc.select("src", "dst")).persist()
    n_sym = sym.count()

    out = {}
    for impl in ("join", "spmv"):
        t0 = time.time()
        pr = pagerank(sym, damping=0.85, eps=0.0, max_iters=iters, impl=impl)
        chk = pr.agg(F.sum("rank")).collect()[0][0]
        sec = time.time() - t0
        out[impl] = {
            "sec": round(sec, 2),
            "supersteps_per_sec": round(iters / sec, 4),
            "edges_per_sec": round(n_sym * iters / sec, 1),
            "rank_checksum": round(float(chk), 4),
        }
    print(json.dumps({
        "extra": "sf1_pagerank_plan_ab",
        "sf": 1.0,
        "extract_sec": round(t_extract, 2),
        "encoded_edges": n_edges,
        "directed_edges": n_sym,
        "supersteps": iters,
        "plans": out,
    }))


def bench_hub_ab(spark, n_hubs=2_000, n_verts=100_000, n_edges=5_000_000, iters=10):
    """Join-vs-SpMV where the SpMV layout should shine: few sources with
    huge out-degree. The join plan's per-superstep shuffle carries one
    (dst, contrib) row PER EDGE (~n_edges); the SpMV route table dedups a
    hub's state to <= num_blocks copies, so its message shuffle carries
    ~n_hubs x blocks rows — three orders of magnitude less here. This is
    the 'hub state replicates once per block' advantage named in the
    north star; the A/B checks whether it survives the Arrow exchange."""
    from plato_spark.algos.pagerank import pagerank

    e = (
        spark.range(n_edges)
        .select(
            (F.col("id") % n_hubs).alias("src"),
            F.pmod(F.xxhash64("id"), F.lit(n_verts)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    n_e = e.count()
    out = {}
    for impl in ("join", "spmv"):
        t0 = time.time()
        pr = pagerank(e, damping=0.85, eps=0.0, max_iters=iters, impl=impl)
        chk = pr.agg(F.sum("rank")).collect()[0][0]
        sec = time.time() - t0
        out[impl] = {
            "sec": round(sec, 2),
            "supersteps_per_sec": round(iters / sec, 4),
            "edges_per_sec": round(n_e * iters / sec, 1),
            "rank_checksum": round(float(chk), 4),
        }
    print(json.dumps({
        "extra": "hub_skew_pagerank_plan_ab",
        "n_hub_sources": n_hubs,
        "n_vertices": n_verts,
        "directed_edges": n_e,
        "supersteps": iters,
        "plans": out,
    }))


def bench_ktruss(spark, sf_dir, k=5):
    """Evidence for the incremental peel: per-round wall time must track
    the peeled set (round-2+ cost ∝ peeled-edge triangles), not the total
    edge count — the r2 implementation re-ran the full mutual pass every
    round (~9x the work at sf0.1)."""
    import time as _t

    from plato_spark.algos.ktruss import ktruss
    from plato_spark.sources.tables import part_cooccurrence_edges

    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    n_edges = canon.count()
    metrics = []
    t0 = _t.time()
    out = ktruss(canon, k=k, metrics=metrics)
    n_out = out.count()
    print(json.dumps({
        "extra": "ktruss_incremental_rounds",
        "sf_dir": sf_dir,
        "k": k,
        "edges_in": n_edges,
        "edges_out": n_out,
        "total_sec": round(_t.time() - t0, 2),
        "rounds": metrics,
    }))


def bench_stream_writes(spark, n_components=2_000, batches=5):
    """Evidence for the partition-pruned incremental-WCC state: steady-
    state batches that merge a handful of components must touch a
    handful of buckets (write volume ∝ touched set, not O(V))."""
    import shutil as _sh
    import tempfile

    from plato_spark.streaming.incremental import merge_edge_batch

    sd = tempfile.mkdtemp(prefix="wcc_state_")
    try:
        # seed: n_components 3-vertex components
        seed = [(3 * i, 3 * i + 1) for i in range(n_components)] + [
            (3 * i + 1, 3 * i + 2) for i in range(n_components)
        ]
        st0 = merge_edge_batch(
            spark.createDataFrame(seed, "src long, dst long"), sd
        )
        per_batch = []
        for b in range(batches):
            # each batch merges exactly 2 neighboring components
            e = [(3 * (2 * b), 3 * (2 * b + 1))]
            st = merge_edge_batch(
                spark.createDataFrame(e, "src long, dst long"), sd
            )
            per_batch.append(st)
        print(json.dumps({
            "extra": "incremental_wcc_bucket_writes",
            "n_components_seeded": n_components,
            "seed_batch": st0,
            "steady_state_batches": per_batch,
        }))
    finally:
        _sh.rmtree(sd, ignore_errors=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="plato_spark_extras",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.local.dir": "/dev/shm/plato_spark_bench"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("kcore", "all"):
        bench_kcore(spark, sf_dir)
    if which in ("node2vec", "all"):
        bench_node2vec(spark, sf_dir)
    if which in ("ann", "all"):
        bench_ann_recall(spark, sf_dir)
    if which == "sf1":
        bench_sf1_ab(spark)
    if which == "hub":
        bench_hub_ab(spark)
    if which == "ktruss":
        bench_ktruss(spark, sf_dir)
    if which == "stream":
        bench_stream_writes(spark)


if __name__ == "__main__":
    main()
