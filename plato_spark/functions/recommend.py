"""Item-item co-occurrence recommendation + top-k graph sparsification.

The classic "customers who bought X also bought Y" batch job (Linden et
al. 2003, "Amazon.com Recommendations: Item-to-Item Collaborative
Filtering") — the workload shape of the reference's spread/mutual
examples (/root/reference/example/spread.cc: relation graph x behaviour
payload; mutual.cc: common-neighbor machinery) applied to a user x item
incidence:

    cosine(u, v) = |U(u) ∩ U(v)| / sqrt(|U(u)| * |U(v)|)

computed exactly from co-occurrence pair counts (one wedge self-join on
the user key + map-side-combined groupBy — the same single-shuffle shape
as the corpus extractor), then top-k per item under the deterministic
total order (score DESC, neighbor ASC), so results are unique and
SQL-oracle-checkable (cosine is one IEEE sqrt + divide, bit-identical
across engines).

Scale notes (100 TB):

  * power users are quadratic poison AND statistical noise — a basket
    cap (default 256, the corpus extractor's clique-guard precedent,
    corpus/extract.py) drops users above it BEFORE the self-join, making
    per-user wedge work O(cap^2); the cap is part of the contract and
    mirrored by the oracle;
  * the top-k window partitions by item — partition-local sort bounded
    by the item's candidate count, no global sort exchange;
  * `topk_per_key` is also exposed as a graph sparsifier (keep each
    vertex's k strongest edges), the standard kNN-graph preprocessing
    for LPA/Louvain on dense similarity graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["topk_per_key", "co_purchase_topk", "knn_graph",
           "frequent_triples"]


def topk_per_key(
    df: DataFrame, key: str, order_exprs: list, k: int, rank_col: str = "rank"
) -> DataFrame:
    """Top-``k`` rows per ``key`` under the given deterministic order
    (pass a TOTAL order — include a unique tie-break column).  The sort
    is partition-local per key (no global exchange)."""
    w = Window.partitionBy(key).orderBy(*order_exprs)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def co_purchase_topk(
    inc: DataFrame,
    user: str = "user",
    item: str = "item",
    k: int = 5,
    max_basket: int = 256,
) -> DataFrame:
    """(item, rec, score, rank) — for every item, the ``k`` most
    cosine-similar items by co-purchase, ties broken by neighbor id.

    ``inc`` is a (user, item) incidence table (deduped internally).
    Users with more than ``max_basket`` distinct items are dropped
    entirely (quadratic guard; see module docstring).
    """
    inc = inc.select(F.col(user).alias("u"), F.col(item).alias("i")).distinct()
    ok_users = (
        inc.groupBy("u").agg(F.count("*").alias("basket"))
        .where(F.col("basket") <= max_basket)
        .select("u")
    )
    inc = inc.join(ok_users, "u", "left_semi")
    deg = inc.groupBy("i").agg(F.count("*").cast("long").alias("d"))
    a = inc.select("u", F.col("i").alias("x"))
    b = inc.select("u", F.col("i").alias("y"))
    co = (
        a.join(b, "u")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").cast("long").alias("co"))
    )
    both = co.unionByName(
        co.select(F.col("y").alias("x"), F.col("x").alias("y"), "co")
    )
    scored = (
        both.join(deg.select(F.col("i").alias("x"), F.col("d").alias("dx")), "x")
        .join(deg.select(F.col("i").alias("y"), F.col("d").alias("dy")), "y")
        .select(
            F.col("x").alias("item"),
            F.col("y").alias("rec"),
            (F.col("co") / F.sqrt(F.col("dx") * F.col("dy"))).alias("score"),
        )
    )
    return topk_per_key(
        scored, "item", [F.col("score").desc(), F.col("rec").asc()], k
    )


def knn_graph(
    edges_canon_weighted: DataFrame, k: int = 10
) -> DataFrame:
    """(src, dst, weight, rank) — keep each vertex's ``k`` strongest
    incident edges (weight DESC, neighbor ASC).  Input is canonical
    (src < dst); both directions are ranked, so an edge survives in the
    direction(s) where it makes the cut — union-of-kNN semantics."""
    sym = edges_canon_weighted.select("src", "dst", "weight").unionByName(
        edges_canon_weighted.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    return topk_per_key(
        sym, "src", [F.col("weight").desc(), F.col("dst").asc()], k
    )


def association_lift(
    inc: DataFrame,
    basket: str = "basket",
    item: str = "item",
    k: int = 50,
    min_support: int = 2,
    max_basket: int = 256,
) -> DataFrame:
    """(src, dst, support, lift) — the ``k`` item pairs with the highest
    association-rule LIFT over a (basket, item) incidence table:
    lift(a,b) = P(ab) / (P(a)P(b)) = support * N / (c(a) * c(b)).

    The market-basket sibling of co_purchase_topk's cosine: lift > 1
    flags pairs that co-occur beyond independence — for the code corpus
    this is co-change prediction (files that change together beyond what
    their individual churn explains), for curation it is topic
    entanglement between containers.  Same quadratic guard as
    co_purchase_topk (baskets over ``max_basket`` items are dropped
    whole); pairs below ``min_support`` are pruned before any division.

    Exact integer numerators/denominators (support*N and c(a)*c(b) both
    fit long at any realistic scale), ONE rounded division, and a global
    TakeOrdered top-k under the total order (lift desc, src, dst) — no
    global sort materializes.
    """
    inc = inc.select(F.col(basket).alias("b"), F.col(item).alias("i")).distinct()
    ok = (
        inc.groupBy("b").agg(F.count("*").alias("n"))
        .where(F.col("n") <= max_basket)
        .select("b")
    )
    inc = inc.join(ok, "b", "left_semi")
    nb = inc.select("b").distinct().agg(
        F.count("*").cast("long").alias("n_baskets")
    )
    cnt = inc.groupBy("i").agg(F.count("*").cast("long").alias("c"))
    a = inc.select("b", F.col("i").alias("src"))
    d = inc.select("b", F.col("i").alias("dst"))
    pairs = (
        a.join(d, "b")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= min_support)
    )
    scored = (
        pairs.join(cnt.select(F.col("i").alias("src"), F.col("c").alias("ca")), "src")
        .join(cnt.select(F.col("i").alias("dst"), F.col("c").alias("cb")), "dst")
        .crossJoin(nb)
        .select(
            "src", "dst", "support",
            F.round(
                (F.col("support") * F.col("n_baskets")).cast("double")
                / (F.col("ca") * F.col("cb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("src").asc(), F.col("dst").asc()
    ).limit(k)


def frequent_triples(
    inc: DataFrame,
    basket: str = "basket",
    item: str = "item",
    min_support: int = 2,
    max_basket: int = 256,
) -> DataFrame:
    """(x, y, z, support) — frequent 3-itemsets (x < y < z) over a
    (basket, item) incidence table: one distributed Apriori round on
    top of the pair layer.

    The Apriori prune IS the scale story: candidate triples are
    generated only from frequent PAIRS ((x,y) join (x,z) on the shared
    prefix, then (y,z) must itself be frequent — the classic a-priori
    closure), so the counting join touches a candidate set bounded by
    the frequent-pair graph's wedge count, never the |items|^3 cube.
    Counting then re-joins candidates to the incidence table via three
    basket-keyed semi-joins (co-partitioned on basket); the same
    ``max_basket`` quadratic guard as co_purchase_topk drops
    pathological baskets whole.  Exact integer supports."""
    inc = inc.select(F.col(basket).alias("b"), F.col(item).alias("i")).distinct()
    ok = (
        inc.groupBy("b").agg(F.count("*").alias("sz"))
        .where(F.col("sz") <= max_basket).select("b")
    )
    inc = inc.join(ok, "b", "left_semi").persist()
    a = inc.select("b", F.col("i").alias("x"))
    c = inc.select("b", F.col("i").alias("y"))
    fp = (
        a.join(c, "b")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= int(min_support))
        .select("x", "y")
        .persist()
    )
    # candidate generation: shared-prefix join + closure check on (y, z)
    cand = (
        fp.alias("p")
        .join(fp.select(F.col("x").alias("x2"), F.col("y").alias("z")).alias("q"),
              F.col("p.x") == F.col("x2"))
        .where(F.col("p.y") < F.col("z"))
        .select("x", "y", "z")
        .join(fp.select(F.col("x").alias("y"), F.col("y").alias("z")),
              ["y", "z"], "left_semi")
    )
    counted = (
        cand.join(inc.select("b", F.col("i").alias("x")), "x")
        .join(inc.select("b", F.col("i").alias("y")), ["b", "y"], "left_semi")
        .join(inc.select("b", F.col("i").alias("z")), ["b", "z"], "left_semi")
        .groupBy("x", "y", "z")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= int(min_support))
    )
    return counted


def rec_coverage(
    inc: DataFrame,
    user: str = "user",
    item: str = "item",
    k: int = 5,
) -> DataFrame:
    """One row (catalog_items, items_recommended, coverage_pct,
    exposure_gini) — the catalog-coverage / popularity-bias eval of the
    co-purchase recommender: how much of the catalog ever appears in a
    top-k list, and how concentrated the exposure is (Gini over per-item
    appearance counts WITH the never-recommended zeros in the
    denominator — leaving them out flatters every recommender).

    Composition: co_purchase_topk (same guard, same total order) ->
    per-rec exposure counts left-joined onto the full catalog ->
    the histogram Gini kernel (graph/edges.gini_from_counts).  Exact
    integers, one rounded division for the share."""
    from plato_spark.graph.edges import gini_from_counts

    recs = co_purchase_topk(inc, user=user, item=item, k=k)
    catalog = inc.select(F.col(item).alias("i")).distinct()
    expo = (
        catalog.join(
            recs.groupBy(F.col("rec").alias("i")).agg(
                F.count(F.lit(1)).cast("long").alias("cnt")),
            "i", "left")
        .select(F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"))
    )
    g = gini_from_counts(expo)
    nrec = recs.agg(F.countDistinct("rec").cast("long").alias("items_recommended"))
    return (
        g.crossJoin(F.broadcast(nrec))
        .select(
            F.col("n").alias("catalog_items"),
            "items_recommended",
            F.round((F.lit(100) * F.col("items_recommended")) / F.col("n"), 6)
            .alias("coverage_pct"),
            F.col("gini").alias("exposure_gini"),
        )
    )
