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
