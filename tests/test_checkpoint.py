import json
import math
import os

from conftest import df_to_dict, edges_df
from oracles import pagerank_oracle, random_graph, wcc_oracle

from plato_spark.algos.pagerank import pagerank
from plato_spark.algos.wcc import connected_components
from plato_spark.engine.checkpoint import CheckpointManager


def test_pagerank_resume_matches_uninterrupted(spark, tmp_path):
    edges = random_graph(n=50, m=250, seed=23, directed=True)
    df = edges_df(spark, edges)
    want = pagerank_oracle(edges)

    root = str(tmp_path / "pr_ckpt")
    ckpt = CheckpointManager(root, "pagerank", {"damping": 0.85})
    # phase 1: run only 3 supersteps ("killed" mid-algorithm)
    partial = pagerank(df, ckpt=ckpt, max_iters=3, eps=0.0)
    assert ckpt.latest() == 2
    m = json.load(open(os.path.join(root, "iter=2", "manifest.json")))
    assert m["iteration"] == 2
    assert m["messages_sent"] > 0
    assert "delta_norm" in m and m["delta_norm"] > 0
    assert m["partition_rows"] and sum(m["partition_rows"]) == len(want)

    # phase 2: resume with full budget -> converges to oracle
    ckpt2 = CheckpointManager(root, "pagerank", {"damping": 0.85})
    got = df_to_dict(pagerank(df, ckpt=ckpt2), val="rank")
    for v in want:
        assert math.isclose(got[v], want[v], abs_tol=1e-6), (v, got[v], want[v])

    # phase 3: re-run on the finished checkpoint returns instantly (finished flag)
    got2 = df_to_dict(pagerank(df, ckpt=CheckpointManager(root, "pagerank")), val="rank")
    assert got2 == got


def test_wcc_resume(spark, tmp_path):
    edges = [(i, i + 1) for i in range(40)]  # long chain: many supersteps
    df = edges_df(spark, edges)
    root = str(tmp_path / "wcc_ckpt")
    # run 2 supersteps then "die"
    partial = connected_components(df, max_iters=2,
                                   ckpt=CheckpointManager(root, "wcc"))
    assert CheckpointManager(root, "wcc").latest() is not None
    got = df_to_dict(
        connected_components(df, ckpt=CheckpointManager(root, "wcc")),
        val="component",
    )
    assert got == wcc_oracle(edges)


def test_manifest_lineage_chain(spark, tmp_path):
    edges = random_graph(n=20, m=60, seed=29, directed=True)
    df = edges_df(spark, edges)
    root = str(tmp_path / "chain")
    pagerank(df, ckpt=CheckpointManager(root, "pagerank"), max_iters=4, eps=0.0)
    for k in range(1, 4):
        m = json.load(open(os.path.join(root, f"iter={k}", "manifest.json")))
        assert m["lineage"]["parent"].endswith(f"iter={k-1}")
        assert os.path.exists(os.path.join(m["lineage"]["state_path"], "_SUCCESS"))
