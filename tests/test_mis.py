"""Luby MIS: independence + maximality + determinism (brute-force check)."""

import pyspark.sql.functions as F
import pytest

from plato_spark.algos.mis import maximal_independent_set
from plato_spark.graph.edges import symmetrize


def _mk_sym(spark, pairs):
    canon = spark.createDataFrame(pairs, "src long, dst long")
    return symmetrize(canon)


def _check_mis(spark, sym, mis_ids):
    edges = {(r.src, r.dst) for r in sym.collect()}
    verts = {u for u, _ in edges} | {v for _, v in edges}
    s = set(mis_ids)
    # independence
    for u, v in edges:
        assert not (u in s and v in s), f"edge ({u},{v}) inside MIS"
    # maximality: every non-member has a member neighbor
    for v in verts - s:
        assert any(
            (v, u) in edges and u in s for u in verts
        ), f"vertex {v} has no MIS neighbor"


def test_mis_path_graph(spark):
    sym = _mk_sym(spark, [(i, i + 1) for i in range(9)])
    out = maximal_independent_set(sym).collect()
    _check_mis(spark, sym, [r.id for r in out])


def test_mis_star_plus_clique(spark):
    # star 0-(1..5) plus clique {6,7,8}: MIS has exactly one of the clique
    pairs = [(0, i) for i in range(1, 6)] + [(6, 7), (6, 8), (7, 8)]
    sym = _mk_sym(spark, pairs)
    ids = [r.id for r in maximal_independent_set(sym).collect()]
    _check_mis(spark, sym, ids)
    assert len(set(ids) & {6, 7, 8}) == 1


def test_mis_pseudorandom_graph_deterministic(spark):
    # hash-generated graph; run twice -> identical (id, mis_round) sets
    edges = spark.range(0, 400).select(
        F.pmod(F.xxhash64("id"), F.lit(60)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(60)).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    canon = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    sym = symmetrize(canon)
    a = {(r.id, r.mis_round) for r in maximal_independent_set(sym).collect()}
    b = {(r.id, r.mis_round) for r in maximal_independent_set(sym).collect()}
    assert a == b
    _check_mis(spark, sym, [i for i, _ in a])


def test_mis_empty_graph(spark):
    sym = spark.createDataFrame([], "src long, dst long")
    assert maximal_independent_set(sym).count() == 0
