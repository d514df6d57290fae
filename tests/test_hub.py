"""Hub-vertex stress: SURVEY §7.4.3 — no unbounded adjacency row.

A 10^6-degree hub must never materialize as one collect_list row; the
segmented builders cap every row while producing results identical to the
one-array plan (reference spreads the same work with partition masks,
/root/reference/plato/algo/mutual/mutual.hpp:148-159).
"""

import pyspark.sql.functions as F
import pytest

from plato_spark.algos.triangles import (
    _segmented_undirected_adj,
    common_neighbors,
)
from plato_spark.algos.walks import _ranked_segment_adjacency, random_walks
from plato_spark.graph.edges import symmetrize


@pytest.fixture(scope="module")
def hub_edges(spark):
    # one 10^6-degree hub (vertex 0), canonical src<dst
    return spark.range(1, 1_000_001).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )


def test_segmented_adjacency_caps_rows(spark, hub_edges):
    cap = 100_000
    sym = symmetrize(hub_edges)
    segments = (1_000_000 + cap - 1) // cap
    adj = _segmented_undirected_adj(sym, segments)
    stats = adj.agg(
        F.max(F.size("nbrs")).alias("mx"), F.count("*").alias("rows")
    ).collect()[0]
    # hash segmentation: expected cap per row ~100k, allow hash variance
    assert stats["mx"] <= int(cap * 1.05)
    assert stats["rows"] == segments + 1_000_000  # hub segments + leaves


def test_ranked_segment_adjacency_caps_rows(spark, hub_edges):
    cap = 100_000
    adj = _ranked_segment_adjacency(hub_edges, cap)
    row = adj.agg(
        F.max(F.size("nbrs")).alias("mx"),
        F.sum(F.size("nbrs")).alias("total"),
        F.max("deg").alias("deg"),
    ).collect()[0]
    assert row["mx"] <= cap  # contiguous rank segments: exact cap
    assert row["total"] == 1_000_000
    assert row["deg"] == 1_000_000


@pytest.fixture(scope="module")
def medium_graph(spark):
    # deterministic pseudo-random canonical edge table, one mild hub
    e = spark.range(4000).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(150)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(150)).alias("b"),
    )
    hub = spark.range(1, 120).select(
        F.lit(0).cast("long").alias("a"), F.col("id").alias("b")
    )
    return (
        e.unionByName(hub)
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        )
        .distinct()
    )


def test_common_neighbors_segmented_equals_plain(spark, medium_graph):
    plain = {
        (r["src"], r["dst"]): r["common_count"]
        for r in common_neighbors(medium_graph, hub_cap=10**9).collect()
    }
    seg = {
        (r["src"], r["dst"]): r["common_count"]
        for r in common_neighbors(medium_graph, hub_cap=10).collect()
    }
    assert plain == seg and len(plain) > 100


def test_common_neighbor_lists_segmented_equals_plain(spark, medium_graph):
    plain = {
        (r["src"], r["dst"]): list(r["common"])
        for r in common_neighbors(
            medium_graph, as_count=False, hub_cap=10**9
        ).collect()
    }
    seg = {
        (r["src"], r["dst"]): list(r["common"])
        for r in common_neighbors(
            medium_graph, as_count=False, hub_cap=10
        ).collect()
    }
    assert plain == seg


def test_walks_segmented_equal_picks(spark, medium_graph):
    sym = symmetrize(medium_graph)
    base = {
        r["walk_id"]: list(r["path"])
        for r in random_walks(sym, walk_length=5, seed=7).collect()
    }
    capped = {
        r["walk_id"]: list(r["path"])
        for r in random_walks(sym, walk_length=5, seed=7, hub_cap=16).collect()
    }
    assert base == capped and len(base) > 100


def test_walks_hub_cap_rejects_second_order(spark, medium_graph):
    with pytest.raises(ValueError):
        random_walks(medium_graph, p=2.0, q=0.5, hub_cap=100)
