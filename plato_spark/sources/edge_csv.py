"""CSV edge-list / vertex-payload readers — the reference's native format.

Reference: plato's only registered input format is CSV edge lists
``src,dst[,edata]`` (RFC4180, gzip via boost::iostreams), parsed by
/root/reference/plato/graph/parsers.hpp:225-295 with typed edge-data
decoders (parsers.hpp:53-181: float/double/uintN/int64/empty); vertex
payload files are ``id,v1:v2:...`` (/root/reference/example/mutual.cc:131-160).

``spark.read.csv`` subsumes the parser (schema-typed decode, any codec,
distributed): these helpers pin the exact schemas + the dual-mode build
(one edge load -> out- and in-oriented adjacency, mirroring
create_dualmode_seq_from_path, /root/reference/plato/graph/structure.hpp:983-1086).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_csv(
    spark: SparkSession,
    path: str,
    weighted: bool = False,
    weight_type: str = "double",
) -> DataFrame:
    """(src, dst[, weight]) from src,dst[,edata] CSV (gzip auto-detected)."""
    schema = "src long, dst long" + (f", weight {weight_type}" if weighted else "")
    return spark.read.csv(path, schema=schema, header=False)


def read_vertex_csv(
    spark: SparkSession,
    path: str,
    payload_sep: str = ":",
    payload_type: str = "double",
) -> DataFrame:
    """(id, payload: array<payload_type>) from ``id,v1:v2:...`` CSV
    (tcsr vertex-data scan, mutual.cc:131-160)."""
    raw = spark.read.csv(path, schema="id long, payload_raw string", header=False)
    return raw.select(
        "id",
        F.transform(
            F.split("payload_raw", payload_sep), lambda x: x.cast(payload_type)
        ).alias("payload"),
    )


def dualmode_adjacency(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One edge table -> (adj_out, adj_in) grouped neighbor arrays.

    Mirrors plato's dual-mode build (bcsr out by dst + dcsc in by src from
    a single load). Both are returned unpersisted; callers cache what their
    push/pull loop needs.
    """
    adj_out = edges.groupBy(F.col("src").alias("id")).agg(
        F.sort_array(F.collect_list("dst")).alias("neighbors")
    )
    adj_in = edges.groupBy(F.col("dst").alias("id")).agg(
        F.sort_array(F.collect_list("src")).alias("neighbors")
    )
    return adj_out, adj_in
