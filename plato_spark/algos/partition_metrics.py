"""Partition-comparison metrics: Rand index / adjusted Rand index.

Given two labelings of the same vertex set — two clustering runs, two
snapshots, before/after a perturbation — the Rand index is the fraction
of vertex PAIRS the two partitions agree on (same-cluster in both or
split in both); the adjusted form (Hubert & Arabie 1985) rescales so
random agreement scores 0.  The stability audit behind trusting any
community structure: if hub removal (or a re-crawl) reshuffles
co-membership, partition-dependent downstream work (bucketing by
community, per-community sampling) must be re-keyed.

Exact arithmetic throughout — pair counts are binomials of integer
contingency cells:

    sum_nij = sum_ij C(n_ij, 2);  sum_a = sum_i C(a_i, 2);
    sum_b = sum_j C(b_j, 2);  C = C(n, 2)

    rand = (C - sum_a - sum_b + 2*sum_nij) / C
    ari  = 2*(C*sum_nij - sum_a*sum_b)
           / (C*(sum_a + sum_b) - 2*sum_a*sum_b)

Both are single rounded IEEE divisions over BIGINT folds (the ARI form
is the textbook expression multiplied through by 2C to clear the
fractions).  int64 bound: C*sum_a ~ n^4/4 caps n at ~55k vertices —
beyond that, promote the two products to doubles (documented seam; the
denominators dwarf rounding there).

Plan: one co-partitioned join of the two label tables on the vertex
key, one groupBy per contingency axis (cluster-count-sized outputs),
three 1-row aggregations broadcast-crossed.  Nothing scales beyond the
label tables themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _c2(col):
    # x*(x-1) is always even: a right shift IS the exact integer
    # binomial — no double division anywhere in the fold
    return F.shiftright((col * (col - 1)).cast("long"), 1)


def partition_rand_index(a: DataFrame, b: DataFrame) -> DataFrame:
    """1 row (n_common, clusters_a, clusters_b, rand, ari).

    ``a``/``b``: (id, label).  Restricted to ids present in BOTH (the
    intersection convention — vertices one side never saw carry no
    agreement information).  Degenerate single-cluster/singleton cases
    return NULL ari (zero denominator), rand still defined.
    """
    la = a.toDF("id", "la")
    lb = b.toDF("id", "lb")
    j = la.join(lb, "id").persist()

    cells = j.groupBy("la", "lb").agg(F.count(F.lit(1)).cast("long").alias("nij"))
    s_nij = cells.agg(
        F.coalesce(F.sum(_c2(F.col("nij"))), F.lit(0)).cast("long").alias("sum_nij")
    )
    rows_a = j.groupBy("la").agg(F.count(F.lit(1)).cast("long").alias("ai"))
    s_a = rows_a.agg(
        F.coalesce(F.sum(_c2(F.col("ai"))), F.lit(0)).cast("long").alias("sum_a"),
        F.count(F.lit(1)).cast("long").alias("clusters_a"),
    )
    rows_b = j.groupBy("lb").agg(F.count(F.lit(1)).cast("long").alias("bj"))
    s_b = rows_b.agg(
        F.coalesce(F.sum(_c2(F.col("bj"))), F.lit(0)).cast("long").alias("sum_b"),
        F.count(F.lit(1)).cast("long").alias("clusters_b"),
    )
    n = j.agg(F.count(F.lit(1)).cast("long").alias("n_common"))

    out = (
        n.crossJoin(F.broadcast(s_nij))
        .crossJoin(F.broadcast(s_a))
        .crossJoin(F.broadcast(s_b))
    )
    big_c = _c2(F.col("n_common"))
    rand_num = big_c - F.col("sum_a") - F.col("sum_b") + 2 * F.col("sum_nij")
    ari_num = 2 * (big_c * F.col("sum_nij") - F.col("sum_a") * F.col("sum_b"))
    ari_den = big_c * (F.col("sum_a") + F.col("sum_b")) - 2 * F.col("sum_a") * F.col("sum_b")
    res = out.select(
        "n_common",
        "clusters_a",
        "clusters_b",
        F.when(big_c > 0, F.round(rand_num.cast("double") / big_c.cast("double"), 6))
        .alias("rand"),
        F.when(ari_den != 0, F.round(ari_num.cast("double") / ari_den.cast("double"), 6))
        .alias("ari"),
    )
    res = res.localCheckpoint(eager=True)
    j.unpersist()
    return res
