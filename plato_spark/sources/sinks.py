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
