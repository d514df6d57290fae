"""Hard-kill resume evidence: a subprocess running checkpointed PageRank is
SIGKILLed mid-algorithm; a fresh process resumes from the newest complete
manifest and converges to the oracle ranks (north rule: 'runs resume
mid-algorithm')."""

import json
import math
import os
import signal
import subprocess
import sys
import time

from oracles import pagerank_oracle, random_graph

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys, os
sys.path.insert(0, {repo!r})
from plato_spark.session import get_spark
from plato_spark.algos.pagerank import pagerank
from plato_spark.engine.checkpoint import CheckpointManager
spark = get_spark(master="local[2]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.createDataFrame({edges!r}, "src long, dst long")
print("CHILD_STARTED", flush=True)
pagerank(edges, ckpt=CheckpointManager({root!r}, "pagerank"), eps=1e-6)
print("CHILD_DONE", flush=True)
"""


def test_sigkill_mid_pagerank_then_resume(spark, tmp_path):
    edges = random_graph(n=60, m=300, seed=121, directed=True)
    root = str(tmp_path / "kill_ckpt")
    code = CHILD.format(repo=REPO, edges=[list(map(int, e)) for e in edges], root=root)
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
    )
    # wait until at least 2 checkpoints are complete, then SIGKILL
    deadline = time.time() + 240
    while time.time() < deadline:
        done = [
            d for d in (os.listdir(root) if os.path.isdir(root) else [])
            if d.startswith("iter=")
            and os.path.exists(os.path.join(root, d, "manifest.json"))
        ]
        if len(done) >= 2:
            break
        if proc.poll() is not None:
            break
        time.sleep(0.5)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        killed = True
    else:
        killed = False  # finished too fast; resume path still exercised

    from plato_spark.algos.pagerank import pagerank
    from plato_spark.engine.checkpoint import CheckpointManager
    from conftest import df_to_dict, edges_df

    ck = CheckpointManager(root, "pagerank")
    latest = ck.latest()
    assert latest is not None, "no complete checkpoint survived the kill"
    manifest = json.load(open(os.path.join(root, f"iter={latest}", "manifest.json")))
    assert manifest["iteration"] == latest
    assert "delta_norm" in manifest and "partition_rows" in manifest

    got = df_to_dict(
        pagerank(edges_df(spark, edges), ckpt=CheckpointManager(root, "pagerank")),
        val="rank",
    )
    want = pagerank_oracle(edges)
    for v in want:
        assert math.isclose(got[v], want[v], abs_tol=1e-6), (v, killed)
