"""Result sinks + graph save/load.

Reference parity: plato writes per-(partition, thread) CSV shards, optional
gzip, to POSIX/HDFS (example/pagerank.cc:192-201; the cgm writers at
/root/reference/plato/algo/cgm/connected_component.hpp:388-538 ship
summary / per-component / per-vertex outputs). Spark's writer IS that
machinery — one file per partition, any codec, any FS — so the sinks here
are thin conventions, plus a parquet graph layout with a JSON sidecar of
graph_info_t-style stats for cheap reloads.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from plato_spark.graph.edges import graph_stats


def write_result(df: DataFrame, path: str, fmt: str = "parquet",
                 compression: str | None = None, header: bool = True) -> None:
    """Write an algorithm result (CSV shards mirror the reference sinks)."""
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", str(header).lower())
        if compression:
            w = w.option("compression", compression)  # e.g. gzip, like boost::iostreams
        w.csv(path)
    elif fmt == "parquet":
        w.parquet(path)
    else:
        raise ValueError(fmt)


def save_graph(edges: DataFrame, path: str) -> dict:
    """Persist an edge table + stats sidecar (graph_info_t analog)."""
    edges.write.mode("overwrite").parquet(os.path.join(path, "edges"))
    stats = graph_stats(edges.sparkSession.read.parquet(os.path.join(path, "edges")))
    with open(os.path.join(path, "graph_info.json"), "w") as f:
        json.dump(stats, f)
    return stats


def load_graph(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    edges = spark.read.parquet(os.path.join(path, "edges"))
    info_path = os.path.join(path, "graph_info.json")
    if os.path.exists(info_path):
        with open(info_path) as f:
            return edges, json.load(f)
    return edges, graph_stats(edges)


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int = 64,
    key: str = "src",
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist an edge table BUCKETED by ``key`` (hash-partitioned files +
    catalog metadata), so every later equi-join or aggregation on that key
    reads co-located data and skips the shuffle entirely.

    This is the Spark analog of the reference's partitioned edge cache
    (plato pre-shuffles edges to their owner rank once at load and every
    BSP superstep reuses that placement, plato/graph/structure.hpp
    load-rebalance path): pay one shuffle at write time, amortize it over
    every superstep/query that joins on the same key. At 100 TB this is
    the difference between one exchange per PageRank superstep and zero —
    the scan itself arrives pre-partitioned (`bucketBy`) and pre-sorted
    (`sortBy`), so joins between two tables bucketed the same way are
    zip-joins with no exchange AND no sort.

    Use `spark.table(table)` to read it back; see
    tests/test_plans.py::test_bucketed_join_has_no_exchange for the plan
    assertion (no ShuffleExchange on the bucketed side).
    """
    w = edges.write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:  # external table at an explicit location
        w = w.option("path", path)
    w.saveAsTable(table)
