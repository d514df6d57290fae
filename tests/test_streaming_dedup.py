"""Incremental dedup index over a document stream == batch GROUP BY sha."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from plato_spark.streaming.dedup_stream import (
    incremental_dedup,
    merge_doc_batch,
    read_dedup_state,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _state(spark, sd):
    return {
        r["content_sha"]: (r["keeper_doc"], r["n_copies"])
        for r in read_dedup_state(spark, sd).collect()
    }


def _batch_truth(spark, all_rows):
    return {
        r["content_sha"]: (r["keeper_doc"], r["n_copies"])
        for r in _docs(spark, all_rows)
        .groupBy(F.sha2("text", 256).alias("content_sha"))
        .agg(
            F.min("doc_id").alias("keeper_doc"),
            F.count("*").alias("n_copies"),
        )
        .collect()
    }


def test_incremental_matches_batch(spark, tmp_path):
    sd = str(tmp_path / "state")
    d1 = [(5, "aaa"), (2, "bbb"), (3, "aaa")]
    d2 = [(1, "aaa"), (9, "ccc")]   # lowers aaa's keeper to 1
    d3 = [(7, "bbb"), (8, "ddd")]
    merge_doc_batch(_docs(spark, d1), sd, epoch_id=0)
    got = _state(spark, sd)
    assert got == _batch_truth(spark, d1)
    merge_doc_batch(_docs(spark, d2), sd, epoch_id=1)
    merge_doc_batch(_docs(spark, d3), sd, epoch_id=2)
    assert _state(spark, sd) == _batch_truth(spark, d1 + d2 + d3)


def test_replay_same_epoch_is_noop(spark, tmp_path):
    sd = str(tmp_path / "state")
    d1 = [(1, "xxx"), (2, "xxx"), (3, "yyy")]
    merge_doc_batch(_docs(spark, d1), sd, epoch_id=0)
    want = _state(spark, sd)
    # crash-replay of the SAME epoch must not double n_copies
    stats = merge_doc_batch(_docs(spark, d1), sd, epoch_id=0)
    assert stats["touched_buckets"] == 0 and stats["skipped_buckets"] > 0
    assert _state(spark, sd) == want
    # a NEW epoch with the same content genuinely adds
    merge_doc_batch(_docs(spark, d1), sd, epoch_id=1)
    assert _state(spark, sd) == _batch_truth(spark, d1 + d1)


def test_partial_commit_replay(spark, tmp_path):
    """Simulate a crash between bucket commits: roll ONE bucket back to
    its pre-batch version, then replay — only that bucket re-folds."""
    import shutil

    sd = str(tmp_path / "state")
    rows = [(i, f"doc-{i % 7}") for i in range(30)]  # spread over buckets
    merge_doc_batch(_docs(spark, rows), sd, epoch_id=0)
    rows2 = [(100 + i, f"doc-{i % 7}") for i in range(30)]
    merge_doc_batch(_docs(spark, rows2), sd, epoch_id=1)
    want = _state(spark, sd)

    # find a bucket with >=2 committed versions and drop the newest
    rolled = None
    for d in sorted(os.listdir(sd)):
        if not d.startswith("b"):
            continue
        vs = sorted(
            int(v[1:]) for v in os.listdir(os.path.join(sd, d))
            if v.startswith("v") and v[1:].isdigit()
            and os.path.exists(os.path.join(sd, d, v, "_SUCCESS"))
        )
        if len(vs) >= 2:
            shutil.rmtree(os.path.join(sd, d, f"v{vs[-1]}"))
            rolled = d
            break
    assert rolled is not None
    stats = merge_doc_batch(_docs(spark, rows2), sd, epoch_id=1)
    assert stats["touched_buckets"] == 1  # only the rolled-back bucket
    assert _state(spark, sd) == want


def test_streaming_query_end_to_end(spark, tmp_path):
    src = str(tmp_path / "drops")
    sd = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    all_rows = []

    def drop(rows):
        all_rows.extend(rows)
        _docs(spark, rows).coalesce(1).write.mode("append").parquet(src)

    drop([(1, "p"), (2, "q"), (3, "p")])
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = incremental_dedup(stream, sd, ck)
    q.awaitTermination(120)
    assert _state(spark, sd) == _batch_truth(spark, all_rows)

    drop([(0, "p"), (9, "r")])
    q2 = incremental_dedup(
        spark.readStream.schema("doc_id long, text string").parquet(src), sd, ck
    )
    q2.awaitTermination(120)
    assert _state(spark, sd) == _batch_truth(spark, all_rows)
