"""Incremental MinHash-LSH index over a document stream == batch LSH."""

from __future__ import annotations

import os
import shutil

from plato_spark.functions.dedup import minhash_lsh_candidates
from plato_spark.streaming.lsh_stream import (
    merge_lsh_batch,
    read_lsh_state,
    state_candidates,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return sorted((int(r["a"]), int(r["b"])) for r in df.collect())


DUP = "the quick brown fox jumps over the lazy dog again and again"
DUP2 = "the quick brown fox jumps over the lazy dog again and again!"
OTHER = "completely different content about spark physical plans and shuffles"


def test_stream_state_equals_batch_lsh(spark, tmp_path):
    sd = str(tmp_path / "state")
    d1 = [(1, DUP), (2, OTHER)]
    d2 = [(3, DUP2)]            # near-dup of doc 1, arrives later
    d3 = [(4, DUP), (5, "unrelated text with its own shingle profile")]
    for i, d in enumerate([d1, d2, d3]):
        merge_lsh_batch(_docs(spark, d), sd, epoch_id=i)
    got = _pairs(state_candidates(read_lsh_state(spark, sd)))
    want = _pairs(minhash_lsh_candidates(_docs(spark, d1 + d2 + d3)))
    assert got == want
    assert (1, 4) in got        # exact dup pair across batches


def test_delta_pairs_telescope_to_batch(spark, tmp_path):
    sd = str(tmp_path / "state")
    batches = [[(1, DUP), (2, OTHER)], [(3, DUP2), (4, DUP)], [(5, DUP2)]]
    seen = set()
    for i, d in enumerate(batches):
        st = merge_lsh_batch(_docs(spark, d), sd, epoch_id=i,
                             collect_delta_pairs=True)
        new = set(st["delta_pairs"])
        # batch-internal pair (3,4) must surface in batch 2, history pair
        # (1,4) too
        if i == 1:
            assert (1, 4) in new and (3, 4) in new
        seen |= new
    allp = [r for b in batches for r in b]
    assert sorted(seen) == _pairs(minhash_lsh_candidates(_docs(spark, allp)))


def test_replay_skips_committed_buckets(spark, tmp_path):
    sd = str(tmp_path / "state")
    d1 = [(1, DUP), (2, OTHER)]
    merge_lsh_batch(_docs(spark, d1), sd, epoch_id=0)
    before = _pairs(state_candidates(read_lsh_state(spark, sd)))
    st = merge_lsh_batch(_docs(spark, d1), sd, epoch_id=0)  # replay
    assert st["touched_buckets"] == 0 and st["skipped_buckets"] > 0
    assert _pairs(state_candidates(read_lsh_state(spark, sd))) == before


def test_rollback_replays_idempotently(spark, tmp_path):
    # membership is a SET: rolling one bucket back and replaying the
    # epoch must re-apply exactly the missed bucket and converge to the
    # same state (idempotent distinct-union, unlike dedup counts)
    sd = str(tmp_path / "state")
    d1 = [(1, DUP), (2, OTHER), (3, DUP2)]
    merge_lsh_batch(_docs(spark, d1), sd, epoch_id=0)
    want = _pairs(state_candidates(read_lsh_state(spark, sd)))
    bdirs = sorted(
        d for d in os.listdir(sd) if d.startswith("b") and d[1:].isdigit()
    )
    victims = [d for d in bdirs
               if os.path.isdir(os.path.join(sd, d, "v0"))][:1]
    assert victims
    shutil.rmtree(os.path.join(sd, victims[0], "v0"))
    st = merge_lsh_batch(_docs(spark, d1), sd, epoch_id=0)  # crash replay
    assert st["touched_buckets"] == 1
    assert _pairs(state_candidates(read_lsh_state(spark, sd))) == want
