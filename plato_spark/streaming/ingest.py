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
- sessionize_events: CUSTOM stateful operator via applyInPandasWithState —
  per-user session assembly with an inactivity-gap timeout. This is the
  extension point for stateful logic the built-in aggregates can't express
  (plato has no analog; its loops restart from scratch), and the Arrow
  batch shape keeps it off the per-row-Python slow path.

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


def sessionize_events(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-user sessions via applyInPandasWithState (custom stateful op).

    A session is a maximal run of a user's events with < ``gap_seconds``
    between consecutive events. Sessions close either when a later event
    arrives past the gap, or when the event-time timeout fires after the
    watermark passes session_end + gap. Emits one row per CLOSED session:
    (user_id, session_start, session_end, n_events, value_sum).

    State per key: (session_start_ms, last_ts_ms, n_events, value_sum) —
    the Arrow-batched analog of a GroupState<SessionInfo> in Scala; no
    per-row Python, the whole group's pending batch arrives as pandas.
    """
    import pandas as pd  # local: streaming module stays import-light

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, session_start timestamp, session_end timestamp, "
        "n_events long, value_sum double"
    )
    state_schema = "start_ms long, last_ms long, n long, vsum double"
    gap_ms = gap_seconds * 1000

    def assemble(key, pdf_iter, state: GroupState):
        (uid,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            start_ms, last_ms, n, vsum = state.get
            closed.append((uid, start_ms, last_ms, n, vsum))
            state.remove()
        else:
            if state.exists:
                start_ms, last_ms, n, vsum = state.get
            else:
                start_ms = last_ms = -1
                n, vsum = 0, 0.0
            for pdf in pdf_iter:
                pdf = pdf.sort_values(ts_col)
                ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).to_numpy()
                vals = pdf["value"].to_numpy()
                for t, v in zip(ts_ms, vals):
                    if start_ms < 0:
                        start_ms, last_ms, n, vsum = t, t, 1, float(v)
                    elif t - last_ms < gap_ms:
                        last_ms, n, vsum = t, n + 1, vsum + float(v)
                    else:
                        closed.append((uid, start_ms, last_ms, n, vsum))
                        start_ms, last_ms, n, vsum = t, t, 1, float(v)
            if start_ms >= 0:
                state.update((int(start_ms), int(last_ms), int(n), float(vsum)))
                state.setTimeoutTimestamp(int(last_ms) + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="ms") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="ms") for c in closed],
                    "n_events": [c[3] for c in closed],
                    "value_sum": [c[4] for c in closed],
                }
            )
        else:
            yield pd.DataFrame(
                {
                    key_col: pd.Series(dtype="int64"),
                    "session_start": pd.Series(dtype="datetime64[ns]"),
                    "session_end": pd.Series(dtype="datetime64[ns]"),
                    "n_events": pd.Series(dtype="int64"),
                    "value_sum": pd.Series(dtype="float64"),
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            assemble,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
