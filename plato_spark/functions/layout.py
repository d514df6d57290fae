"""Data-layout keys — multi-dimensional clustering for scan pruning.

At 100 TB the cheapest query is the one whose files you never open:
sorting (or range-partitioning) a fact table by a Z-order (Morton) key
over its two hottest filter dimensions co-locates rows that are close
in BOTH dimensions, so min/max footer statistics prune row groups for
either predicate — the technique behind Delta/Iceberg Z-ordering and
plato's degree-weighted vertex ranges generalized to two axes.  The
key itself is pure bit arithmetic: exact, shuffle-free, JVM-codegen'd.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key"]


def _interleave(a: Column, b: Column, bits: int) -> Column:
    mask = (1 << bits) - 1
    am = a.bitwiseAND(F.lit(mask))
    bm = b.bitwiseAND(F.lit(mask))
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(am, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(bm, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return reduce(lambda x, y: x + y, terms)


def zorder_key(
    df: DataFrame,
    id_col: str,
    a_col: Column,
    b_col: Column,
    bits: int = 16,
) -> DataFrame:
    """(id, z) — the Morton/Z-order key interleaving the low ``bits``
    bits of two integer dimensions (a in the odd bit positions, b in
    the even).  Rows sorted by z are the write-time clustering order;
    both dimensions are masked to ``bits`` bits first so the key fits
    int64 for bits <= 31."""
    return df.select(
        F.col(id_col).alias("id"),
        _interleave(a_col.cast("long"), b_col.cast("long"), bits)
        .cast("long").alias("z"),
    )
