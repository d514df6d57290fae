"""Spearman-style rank agreement between two per-vertex scores.

The cross-operator audit: does PageRank just recover degree on this
graph, or does link structure add signal?  rho near 1 means the cheap
statistic is a drop-in proxy; a gap is where the expensive one earns
its shuffles.

Tie semantics (deliberate, documented deviation): textbook Spearman
assigns ties their AVERAGE rank; here ranks come from the pinned total
order (score DESC, id ASC), so both engines replay the identical
permutation and the whole statistic stays in exact integers.  With
heavy ties (integer degrees) this measures rank agreement UNDER THE
PINNED ORDER — state it as such.

Scale: ranks come from the vid-encoder distributed dense rank
(graph/edges.build_dictionary — range partition + per-partition
offsets; never a single-partition row_number), on a composite int64
key id - score_u * 2^24 whose ascending order IS (score DESC, id ASC).
The d^2 fold is BIGINT-exact to n ~ 2e6 vertices (6*sum d^2 < 2^63
needs n^3 headroom); past that fold d^2 in DOUBLE — documented seam,
the style_divergence trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.graph.edges import build_dictionary

__all__ = ["rank_correlation"]

ID_BITS = 24  # composite-key id width; ids must stay under 2^24


def _ranks(scores: DataFrame, n_part: int) -> DataFrame:
    """(id, rank) — dense 0-based rank under (score DESC, id ASC) via
    the distributed dictionary rank on the composite key."""
    keyed = scores.select(
        F.col("id").alias("vid"),
        (F.col("id") - F.col("score_u") * F.lit(1 << ID_BITS))
        .cast("long").alias("vkey"),
    )
    d = build_dictionary(keyed.select("vkey"), n_part)
    return keyed.join(d, "vkey").select(
        F.col("vid").alias("id"), F.col("id").alias("rank")
    )


def rank_correlation(
    a: DataFrame, b: DataFrame, n_part: int = 8
) -> DataFrame:
    """One row (n, sum_d2, spearman) for two (id, score_u) tables —
    score_u an exact int64 (pre-scaled: degree as-is, 6dp floats as
    round(x*1e6)).  Vertices present in only one table are dropped
    (inner join) — compare like with like."""
    ra = _ranks(a, n_part).withColumnRenamed("rank", "r1")
    rb = _ranks(b, n_part).withColumnRenamed("rank", "r2")
    j = ra.join(rb, "id")
    d = (F.col("r1") - F.col("r2")).cast("long")
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d * d).cast("long").alias("sum_d2"),
    )
    return agg.select(
        "n", "sum_d2",
        F.when(
            F.col("n") > 1,
            F.round(
                F.lit(1.0)
                - (F.lit(6) * F.col("sum_d2"))
                / (F.col("n") * (F.col("n") * F.col("n") - F.lit(1))),
                6,
            ),
        ).alias("spearman"),
    )
