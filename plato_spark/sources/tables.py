"""Readers for the driver-provided parquet tables + derived co-occurrence graphs.

The sandbox test tables (/root/testdata/sf*/, see TESTDATA.md) are TPC-H-ish;
they are not graph-shaped, so for the DuckDB correctness gate we derive a
deterministic co-occurrence graph the same way the corpus extractor derives
co-commit edges: two parts co-occur when they appear in the same order —
exactly the "files sharing a commit" relation with (order ~ commit,
part ~ file). Both Spark and the SQL oracle can compute it, which makes the
full algorithm suite oracle-checkable end-to-end.

At 100TB the same plan applies to the real corpus: the extraction is a
self-join (or Arrow pair-generation) on the grouping key, followed by a
canonical dedup — one shuffle, AQE-skew-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def part_cooccurrence_edges(spark: SparkSession, sf_dir: str, weighted: bool = False) -> DataFrame:
    """Canonical undirected edges between parts sharing an order.

    (src: long, dst: long[, weight: double]) with src < dst, deduped.
    SQL-oracle equivalent (DuckDB):
        SELECT DISTINCT least(a.l_partkey,b.l_partkey) src,
                        greatest(a.l_partkey,b.l_partkey) dst
        FROM lineitem a JOIN lineitem b USING (l_orderkey)
        WHERE a.l_partkey < b.l_partkey
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).dropDuplicates(["l_orderkey", "l_partkey"])
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    pairs = a.join(b, "k").where(F.col("src") < F.col("dst"))
    if weighted:
        return pairs.groupBy("src", "dst").agg(
            F.count("*").cast("double").alias("weight")
        )
    return pairs.select("src", "dst").distinct()
