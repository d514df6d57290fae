"""Co-citation and bibliographic coupling over a directed link graph.

The two classic citation-analysis similarity kernels:

- **co-citation** (Small, JASIS 1973): documents a and b are related if
  some third document cites BOTH — count of common in-link sources per
  unordered pair.  The "cited together" signal; on a code corpus, two
  files co-mentioned by the same third file.
- **bibliographic coupling** (Kessler, American Documentation 1963):
  documents a and b are related if they cite the SAME target — count of
  common out-link targets per unordered pair.  The "look at the same
  things" signal, computable the moment a doc is crawled (its out-links
  are known), unlike co-citation which accrues over time.

Both are directed common-neighbor counts and share one kernel: count
unordered pairs of ``val`` vertices that share a ``key`` vertex — the
same self-join shape as the corpus co-occurrence extractor
(plato_spark/corpus/extract.py) and the reference's mutual/common-
neighbor family (/root/reference/plato/algo/cnc/mutual.hpp), with the
same quadratic clique guard: a key whose fan-out exceeds ``max_fanout``
is dropped BEFORE the pair join (a paper citing 10^4 things, or cited
by everyone, contributes noise quadratically).

Scale: one groupBy to measure fan-out, one semi-join prune, one
self-join keyed on the shared vertex (shuffle on that key only), one
map-side-combined pair count.  Output is bounded by
sum_k C(min(fanout_k, max_fanout), 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs_sharing_key(
    keyed: DataFrame, max_fanout: int
) -> DataFrame:
    """``keyed``: (k, v).  Returns (a, b, weight): unordered v-pairs
    (a < b) weighted by the number of distinct shared keys."""
    kv = keyed.distinct()
    ok = (
        kv.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= max_fanout)
        .select("k")
    )
    kv = kv.join(ok, "k", "left_semi")
    left = kv.select("k", F.col("v").alias("a"))
    right = kv.select("k", F.col("v").alias("b"))
    return (
        left.join(right, "k")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def co_citation(edges: DataFrame, max_fanout: int = 256) -> DataFrame:
    """(a, b, weight) — pairs of documents cited together, weight =
    number of distinct citing documents.  ``edges``: (src, dst)."""
    return _pairs_sharing_key(
        edges.select(F.col("src").alias("k"), F.col("dst").alias("v")),
        max_fanout,
    )


def bibliographic_coupling(
    edges: DataFrame, max_fanout: int = 256
) -> DataFrame:
    """(a, b, weight) — pairs of documents citing the same targets,
    weight = number of distinct shared targets.  ``edges``: (src, dst)."""
    return _pairs_sharing_key(
        edges.select(F.col("dst").alias("k"), F.col("src").alias("v")),
        max_fanout,
    )


def instability(edges: DataFrame, vertices_df: DataFrame | None = None
                ) -> DataFrame:
    """(id, fan_in, fan_out, instability) — Martin's instability metric
    I = Ce / (Ca + Ce) per vertex of a directed dependency/citation
    graph: fan_out (efferent, what I depend on / cite) over total
    coupling.  I = 1 is a pure consumer (safe to change, nothing
    depends on it), I = 0 a pure provider (every change ripples).  The
    code-architecture audit on the import/citation digraph.

    Two degree aggregations + one outer join; ``vertices_df`` (id)
    optionally pins the universe so isolated vertices report (0, 0,
    NULL) instead of vanishing.  Exact integers, one guarded rounded
    division."""
    fi = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("fan_in"))
    fo = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("fan_out"))
    base = fi.join(fo, "id", "outer")
    if vertices_df is not None:
        base = vertices_df.select("id").join(base, "id", "left")
    b = base.select(
        "id",
        F.coalesce("fan_in", F.lit(0)).cast("long").alias("fan_in"),
        F.coalesce("fan_out", F.lit(0)).cast("long").alias("fan_out"),
    )
    tot = F.col("fan_in") + F.col("fan_out")
    return b.select(
        "id", "fan_in", "fan_out",
        F.when(tot > 0, F.round(F.col("fan_out") / tot, 6))
        .alias("instability"),
    )
