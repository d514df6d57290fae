import os

from conftest import edges_df
from oracles import random_graph

from pyspark.sql import functions as F

from plato_spark.sources.sinks import load_graph, save_graph, write_result
from plato_spark.streaming.ingest import (
    stream_edges_from_files,
    streaming_degree_counts,
    windowed_event_counts,
)


def test_save_load_graph_roundtrip(spark, tmp_path):
    edges = random_graph(n=30, m=90, seed=91, directed=True)
    df = edges_df(spark, edges)
    stats = save_graph(df, str(tmp_path / "g"))
    loaded, info = load_graph(spark, str(tmp_path / "g"))
    assert info == stats
    assert {(r["src"], r["dst"]) for r in loaded.collect()} == set(edges)
    assert info["edges"] == len(edges)


def test_write_result_csv_gzip(spark, tmp_path):
    df = edges_df(spark, [(1, 2), (3, 4)])
    out = str(tmp_path / "res")
    write_result(df, out, fmt="csv", compression="gzip")
    files = [f for f in os.listdir(out) if f.endswith(".csv.gz")]
    assert files
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 2


def test_streaming_degrees_from_file_source(spark, tmp_path):
    src_dir = str(tmp_path / "edges_in")
    os.makedirs(src_dir)
    edges = random_graph(n=20, m=60, seed=93, directed=True)
    batch = edges_df(spark, edges).withColumn(
        "ts", F.current_timestamp()
    )
    batch.write.mode("overwrite").parquet(src_dir)

    stream = stream_edges_from_files(spark, src_dir)
    assert stream.isStreaming
    degs = streaming_degree_counts(stream)
    q = (
        degs.writeStream.format("memory")
        .queryName("deg_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"]: r["odeg"] for r in spark.sql("SELECT * FROM deg_stream").collect()}
    want = {}
    for u, _ in edges:
        want[u] = want.get(u, 0) + 1
    assert got == want


def test_windowed_event_counts_streaming(spark, tmp_path):
    src_dir = str(tmp_path / "events_in")
    os.makedirs(src_dir)
    rows = [
        (i, f"2024-01-01 0{i % 3}:15:00", i % 5, "click" if i % 2 else "view", float(i))
        for i in range(30)
    ]
    pdf = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value")
    pdf.write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(src_dir)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM win_stream").collect()
    # batch oracle: same aggregation non-streaming
    want = (
        pdf.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .count()
    )
    assert len(got) == want
    assert sum(r["n"] for r in got) == 30


def test_sessionize_events_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: in-batch gap closure in batch 1,
    event-time-timeout flush in batch 2 once the watermark advances."""
    from plato_spark.streaming.ingest import sessionize_events

    src_dir = str(tmp_path / "sess_in")
    os.makedirs(src_dir)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def write_file(rows, name):
        spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, event_type string, value double"
        ).select(
            "event_id", F.to_timestamp("ts_s").alias("ts"),
            "user_id", "event_type", "value",
        ).coalesce(1).write.mode("append").parquet(src_dir)

    # batch 1: user 1 has two sessions split by an in-batch gap; user 2 one open session
    write_file(
        [
            (0, "2024-01-01 00:00:00", 1, "click", 1.0),
            (1, "2024-01-01 00:02:00", 1, "view", 2.0),
            (2, "2024-01-01 01:00:00", 1, "click", 4.0),
            (3, "2024-01-01 00:00:30", 2, "click", 8.0),
        ],
        "f1",
    )
    # batch 2: user 3 far in the future advances the watermark -> timeouts fire
    write_file([(4, "2024-01-01 06:00:00", 3, "click", 16.0)], "f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sess = sessionize_events(stream, gap_seconds=300, watermark="1 hour")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT user_id, n_events, value_sum FROM sessions_out ORDER BY user_id, n_events DESC"
    ).collect()
    got = [(r["user_id"], r["n_events"], r["value_sum"]) for r in rows]
    # u1 session1 (2 events), u1 session2 (1), u2 session (1); u3 still open
    assert (1, 2, 3.0) in got
    assert (1, 1, 4.0) in got
    assert (2, 1, 8.0) in got
    assert all(u != 3 for u, _, _ in got)
