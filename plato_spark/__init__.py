"""plato_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the query/data-processing capabilities of
Tencent/plato (reference: /root/reference, C++/MPI graph engine) expressed as
idiomatic PySpark: DataFrame plans for the message-passing algebra, grouped-CSR
adjacency layouts with pandas-UDF SpMV for the hot loops, and a superstep
driver with per-iteration checkpoint/resume.

Sub-packages
------------
corpus     synthetic source-code corpus generator + co-commit / path-link edge
           extraction (the engine's primary input, per BASELINE.json input_hint)
graph      edge-table normalization, vid dictionary encoding, degrees,
           degree-weighted partitioning, grouped-CSR materialization
engine     superstep driver: push/pull policy, checkpoint manifest, resume
algos      pagerank (+weighted), wcc, lpa, triangles, kcore, bfs, hyperanf, ...
functions  training-data pipeline ops: dedup (exact/minhash/simhash), text
           quality/lang-id/tokens, embedding similarity search
sources    readers for the driver-provided parquet tables + derived graphs
streaming  structured-streaming wrappers for incremental graph ingestion
"""

__version__ = "0.1.0"

from plato_spark.session import get_spark  # noqa: F401
