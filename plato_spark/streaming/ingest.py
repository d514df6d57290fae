"""Structured-streaming ingestion for incremental graph maintenance.

The reference is batch-only (CSV load -> run -> exit); a Spark-native engine
gets incremental ingestion for free from Structured Streaming, so this
module adds the streaming half of the story:

- stream_edges_from_files: watch a directory of edge parquet/json drops
  (the shape an Iceberg commit-log tail or Kafka topic would have) and emit
  a canonical (src, dst, ts) stream.
- streaming_degree_counts: continuously-maintained degree table (the
  generate_dense_out_degrees analog, as a stateful streaming aggregation).
- windowed_event_counts: watermarked tumbling-window aggregation over the
  events table shape (event_id, ts, user_id, event_type, value) — late data
  handled by watermark; the canonical streaming-aggregation pattern.

Tests drive these with file sources + Trigger.AvailableNow into memory
sinks (no external services), which exercises the exact operators a
Kafka-backed deployment would run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_edges_from_files(
    spark: SparkSession, path: str, schema: str = "src long, dst long, ts timestamp"
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )


def streaming_degree_counts(edge_stream: DataFrame) -> DataFrame:
    """Continuously-updated out-degree per vertex (complete-mode agg)."""
    return edge_stream.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("odeg")
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "value_sum",
        )
    )
