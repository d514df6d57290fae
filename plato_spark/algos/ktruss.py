"""K-truss — edge-level cohesion: the maximal subgraph where every edge
closes >= k-2 triangles WITHIN the subgraph.

Beyond the reference menu (plato ships vertex-level k-core,
/root/reference/plato/algo/kcore/kcore.hpp; k-truss is its edge analog
and the standard next step for community-core extraction on link
graphs). Peel loop:

  support(u,v) = |N(u) ∩ N(v)| over the CURRENT edge set
  drop every edge with support < k-2; repeat to fixpoint.

The fixpoint (maximal k-truss) is unique, so the result is deterministic
and SQL-oracle-checkable with an unrolled peel (extra rounds beyond the
fixpoint are identity, so the oracle just needs >= the measured round
count; value-matched at sf0.01 — at sf0.1 the 12-round unrolled DuckDB
peel is cost-prohibitive, so sf0.1 coverage is the measured Spark
fixpoint, 9 rounds / 917,088 edges, plus the fixture tests). Support reuses algos/triangles.common_neighbors — the hub-capped
(consistently-segmented) adjacency path, so a 10^7-degree hub never
materializes an unbounded row. Lineage is truncated per peel
(localCheckpoint), the same discipline as every other iterative loop.

Cost shape: each round is one adjacency build + one per-edge
intersection over a SHRINKING edge set — the expensive round is the
first, exactly like the reference's peeling algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.algos.triangles import common_neighbors


def ktruss(
    canon: DataFrame,
    k: int = 5,
    max_iters: int = 50,
    metrics: list | None = None,
) -> DataFrame:
    """(src, dst) — the edges of the maximal k-truss of ``canon``.

    canon: canonical undirected edge table (src < dst, unique).
    """
    if k < 3:
        raise ValueError("k-truss is defined for k >= 3")
    cur = canon.select("src", "dst").localCheckpoint(eager=True)
    n_prev = cur.count()
    for it in range(max_iters):
        if n_prev == 0:
            break
        sup = common_neighbors(cur, as_count=True)
        nxt = (
            sup.where(F.col("common_count") >= k - 2)
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n = nxt.count()
        if metrics is not None:
            metrics.append({"iter": it, "edges": n})
        cur = nxt
        if n == n_prev:
            break
        n_prev = n
    return cur
