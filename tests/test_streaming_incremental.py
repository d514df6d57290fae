"""Incremental WCC over an edge stream == batch WCC over all edges seen."""

from __future__ import annotations

import os

from plato_spark.algos.wcc import connected_components
from plato_spark.streaming.incremental import (
    incremental_wcc,
    merge_edge_batch,
    read_component_state,
)


def _write_drop(spark, path, edges):
    spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    ).coalesce(1).write.mode("append").parquet(path)


def _state(spark, sd):
    return {
        r["id"]: r["component"]
        for r in read_component_state(spark, sd).collect()
    }


def test_incremental_matches_batch(spark, tmp_path):
    sd = str(tmp_path / "state")
    # drop 1: two separate components {0,1,2} and {10,11}
    d1 = [(0, 1), (1, 2), (10, 11)]
    merge_edge_batch(spark.createDataFrame(d1, "src long, dst long"), sd)
    got = _state(spark, sd)
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}

    # drop 2: a bridge (2, 10) merges them; plus a brand-new pair (20, 21)
    d2 = [(2, 10), (20, 21)]
    merge_edge_batch(spark.createDataFrame(d2, "src long, dst long"), sd)
    got = _state(spark, sd)
    want = {
        r["id"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(d1 + d2, "src long, dst long")
        ).collect()
    }
    assert got == want  # incremental == batch-from-scratch, min-vid labels

    # drop 3: an edge inside an existing component is a no-op merge
    merge_edge_batch(
        spark.createDataFrame([(0, 11)], "src long, dst long"), sd
    )
    assert _state(spark, sd) == want


def test_incremental_streaming_query(spark, tmp_path):
    src = str(tmp_path / "drops")
    sd = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    _write_drop(spark, src, [(0, 1), (2, 3)])

    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_wcc(stream, sd, ck)
    q.awaitTermination(120)
    assert _state(spark, sd) == {0: 0, 1: 0, 2: 2, 3: 2}

    # second drop connects the components; restart drains only NEW files
    _write_drop(spark, src, [(1, 2)])
    q2 = incremental_wcc(stream, sd, ck)
    q2.awaitTermination(120)
    assert _state(spark, sd) == {0: 0, 1: 0, 2: 0, 3: 0}


def test_partition_pruned_state_rewrite(spark, tmp_path):
    """A batch touching one component must rewrite only its buckets:
    untouched buckets keep their version number (no O(V) rewrite)."""
    import os

    from plato_spark.streaming.incremental import _bucket_dirs, _versions

    sd = str(tmp_path / "state")
    # seed many small components so they spread over many buckets
    seed = [(i, i + 1000) for i in range(50)]
    st0 = merge_edge_batch(
        spark.createDataFrame(seed, "src long, dst long"), sd, n_buckets=16
    )
    assert st0["total_buckets"] == 16
    v_before = {d: _versions(d) for d in _bucket_dirs(sd)}

    # one edge inside component 7 + one merge 7<-8: touches few buckets
    st1 = merge_edge_batch(
        spark.createDataFrame([(7, 8)], "src long, dst long"), sd, n_buckets=16
    )
    assert 0 < st1["touched_buckets"] <= 3
    v_after = {d: _versions(d) for d in _bucket_dirs(sd) if d in v_before}
    advanced = [d for d in v_before if v_after.get(d) != v_before[d]]
    assert len(advanced) <= st1["touched_buckets"]  # only touched advance

    # state still correct
    got = {r["id"]: r["component"]
           for r in read_component_state(spark, sd).collect()}
    assert got[8] == 7 and got[1008] == 7 and got[1007] == 7
    assert got[9] == 9 and got[1009] == 9
