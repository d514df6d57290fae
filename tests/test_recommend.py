"""Item-item co-purchase CF + kNN sparsifier — python-mirror checks."""

import math

from tests.conftest import edges_df

from plato_spark.functions.recommend import co_purchase_topk, knn_graph


def _py_cf(inc, k=2, cap=256):
    inc = set(inc)
    baskets = {}
    for u, i in inc:
        baskets.setdefault(u, set()).add(i)
    inc = {(u, i) for u, i in inc if len(baskets[u]) <= cap}
    users = {}
    for u, i in inc:
        users.setdefault(i, set()).add(u)
    out = {}
    for x in users:
        scored = []
        for y in users:
            if y == x:
                continue
            co = len(users[x] & users[y])
            if co:
                scored.append(
                    (co / math.sqrt(len(users[x]) * len(users[y])), y)
                )
        scored.sort(key=lambda t: (-t[0], t[1]))
        for r, (s, y) in enumerate(scored[:k], 1):
            out[(x, y)] = (round(s, 9), r)
    return out


def _inc_df(spark, inc):
    return spark.createDataFrame(
        [(int(u), int(i)) for u, i in inc], "user long, item long"
    )


def test_cf_small(spark):
    inc = [(1, 10), (1, 20), (2, 10), (2, 20), (2, 30), (3, 30), (3, 40)]
    rows = co_purchase_topk(_inc_df(spark, inc), k=2).collect()
    got = {(r["item"], r["rec"]): (round(r["score"], 9), r["rank"])
           for r in rows}
    assert got == _py_cf(inc, k=2)


def test_cf_basket_cap(spark):
    # user 9 exceeds the cap and must not contribute co-occurrences
    inc = [(1, 10), (1, 20), (9, 10), (9, 20), (9, 30)]
    rows = co_purchase_topk(_inc_df(spark, inc), k=3, max_basket=2).collect()
    got = {(r["item"], r["rec"]): (round(r["score"], 9), r["rank"])
           for r in rows}
    assert got == _py_cf(inc, k=3, cap=2)
    assert all(i != 30 and r != 30 for i, r in got)


def test_cf_dedup_incidence(spark):
    # duplicate (user, item) rows must not inflate counts
    inc = [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20)]
    rows = co_purchase_topk(_inc_df(spark, inc), k=2).collect()
    assert {(r["item"], r["rec"]): round(r["score"], 9) for r in rows} == {
        (10, 20): 1.0, (20, 10): 1.0
    }


def test_knn_graph(spark):
    edges = [(1, 2), (1, 3), (1, 4), (2, 3)]
    weights = [5.0, 3.0, 1.0, 2.0]
    rows = knn_graph(edges_df(spark, edges, weights), k=2).collect()
    got = {(r["src"], r["dst"]): (r["weight"], r["rank"]) for r in rows}
    assert got[(1, 2)] == (5.0, 1) and got[(1, 3)] == (3.0, 2)
    assert (1, 4) not in got          # trimmed at src=1
    assert got[(4, 1)] == (1.0, 1)    # but survives from dst side
    assert got[(2, 1)] == (5.0, 1) and got[(2, 3)] == (2.0, 2)
    assert got[(3, 1)] == (3.0, 1) and got[(3, 2)] == (2.0, 2)
