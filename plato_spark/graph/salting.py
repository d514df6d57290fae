"""Hub-vertex skew handling: salted keys + segmented adjacency.

The north rule requires explicit salted-key handling for hub-vertex skew.
Three mechanisms cover the three places a hub hurts:

1. ``salted_agg`` — two-stage aggregation: a hot groupBy key is split into
   ``salts`` sub-keys (hash-derived, deterministic), partially aggregated,
   then re-aggregated. Use for algebraic aggregates (sum/min/max/count)
   when one key receives a large fraction of all rows. (Spark's map-side
   combine + AQE skew splitting cover most cases; this is the explicit
   fallback for single-key hotspots that AQE cannot split further because
   they are ONE reduce key.)

2. ``segmented_adjacency`` — collect_list-style neighbor arrays capped at
   ``max_per_row`` neighbors per row: a 10^7-degree hub becomes ceil(d/cap)
   rows (id, salt, nbrs) instead of one unbounded array row (SURVEY §7.4.3).
   Downstream per-segment results are re-reduced by id — semantics unchanged
   for sum/min/count-style merges.

3. The SpMV route table (graph/csr.py) bounds hub REPLICATION at one copy
   per block — documented there.

Reference parity: plato spreads hub work with round-robin partition masks
and the pair-parity rule (/root/reference/plato/algo/mutual/mutual.hpp:148-159,
226-235) plus degree-weighted ownership (partition/sequence.hpp:44-75).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, salts: int, cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic salt column in [0, salts) derived from the other
    columns (NOT the key — salting the key alone would not split it)."""
    basis = [c for c in (cols or df.columns) if c != key]
    return df.withColumn("__salt", F.pmod(F.xxhash64(*basis, F.lit(17)), F.lit(salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    combine: str = "sum",
    salts: int = 32,
) -> DataFrame:
    """Two-stage skew-safe aggregation: groupBy(key, salt) -> groupBy(key).

    combine: 'sum' | 'min' | 'max' | 'count' (algebraic, so the two-stage
    plan is exactly equivalent).
    """
    fn: Callable[[str], Column] = {
        "sum": F.sum, "min": F.min, "max": F.max, "count": lambda c: F.count("*"),
    }[combine]
    refn: Callable[[str], Column] = {
        "sum": F.sum, "min": F.min, "max": F.max, "count": F.sum,
    }[combine]
    partial = (
        with_salt(df, key, salts)
        .groupBy(key, "__salt")
        .agg(fn(agg_col).alias("__p"))
    )
    return partial.groupBy(key).agg(refn("__p").alias(f"{combine}_{agg_col}"))


def segmented_adjacency(
    edges: DataFrame,
    by: str = "src",
    nbr: str = "dst",
    max_per_row: int = 100_000,
) -> DataFrame:
    """(id, salt, nbrs: array<long>) — neighbor arrays capped per row.

    Hub vertices produce multiple (id, salt) segment rows; every segment is
    at most max_per_row long, so no single Arrow row/batch blows up.
    """
    salted = edges.select(
        F.col(by).alias("id"),
        F.col(nbr).alias("n"),
        F.pmod(F.xxhash64(nbr, F.lit(23)), F.lit(1 << 20)).alias("__h"),
    )
    # deterministic segment index: hash-bucket neighbors into ceil(deg/cap)
    # segments sized via the vertex's degree
    deg = salted.groupBy("id").agg(F.count("*").alias("__deg"))
    segd = salted.join(deg, "id").withColumn(
        "salt",
        F.pmod(
            F.col("__h"),
            F.greatest((F.col("__deg") / max_per_row).cast("int") + 1, F.lit(1)),
        ).cast("int"),
    )
    return segd.groupBy("id", "salt").agg(F.sort_array(F.collect_list("n")).alias("nbrs"))
