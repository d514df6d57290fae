"""JSONL edge / document readers — the crawl-native sibling of the CSV
edge source.

The reference's only registered input is CSV (parsers.hpp:225-295), but
every real crawl/link-graph feed (Common Crawl WAT, export pipelines)
ships newline-delimited JSON.  ``spark.read.json`` subsumes a hand
parser the same way csv does — schema-pinned decode (no sampling-based
inference pass at 100 TB: inferring schema over a petabyte corpus is a
full extra scan), any codec, distributed — so these helpers pin the
exact schemas and drop-to-null semantics (a malformed record yields
nulls under the default PERMISSIVE mode and is filtered, never a job
abort mid-crawl).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_edge_jsonl", "read_doc_jsonl"]


def read_edge_jsonl(
    spark: SparkSession,
    path: str,
    weighted: bool = False,
    weight_type: str = "double",
    src_field: str = "src",
    dst_field: str = "dst",
    weight_field: str = "weight",
) -> DataFrame:
    """(src, dst[, weight]) from JSONL records; schema pinned (never
    inferred), malformed / key-less records dropped."""
    schema = (
        f"{src_field} long, {dst_field} long"
        + (f", {weight_field} {weight_type}" if weighted else "")
    )
    raw = spark.read.schema(schema).json(path)
    cols = [F.col(src_field).alias("src"), F.col(dst_field).alias("dst")]
    if weighted:
        cols.append(F.col(weight_field).alias("weight"))
    return raw.select(*cols).where(
        F.col(src_field).isNotNull() & F.col(dst_field).isNotNull()
    )


def read_doc_jsonl(
    spark: SparkSession,
    path: str,
    id_field: str = "doc_id",
    text_field: str = "text",
    extra_fields: dict | None = None,
) -> DataFrame:
    """(doc_id, text[, extras...]) from JSONL documents; records missing
    the id or text are dropped (crawl shards always carry tombstones)."""
    extras = extra_fields or {}
    schema = f"{id_field} long, {text_field} string" + "".join(
        f", {name} {typ}" for name, typ in extras.items()
    )
    raw = spark.read.schema(schema).json(path)
    cols = [F.col(id_field).alias("doc_id"), F.col(text_field).alias("text")]
    cols += [F.col(name) for name in extras]
    return raw.select(*cols).where(
        F.col(id_field).isNotNull() & F.col(text_field).isNotNull()
    )
