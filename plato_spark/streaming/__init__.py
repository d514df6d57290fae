from plato_spark.streaming.ingest import (  # noqa: F401
    stream_edges_from_files,
    windowed_event_counts,
    streaming_degree_counts,
)
