"""Triangle counting & common-neighbor ("mutual") queries.

Reference: /root/reference/plato/algo/mutual/mutual.hpp:104-268
  - per-vertex sorted neighbor arrays (126-143)
  - each unordered pair (u,v) is processed exactly once — the reference uses
    round-robin partition masks + a parity rule ((odd && u<v) || (!odd && u>v),
    226-235) for load balancing; we get the same single-evaluation guarantee
    from DEGREE-ORDERED EDGE ORIENTATION: direct every undirected edge from
    the endpoint with smaller (degree, id) to the larger. The oriented
    out-degree of ANY vertex is O(sqrt(E)), which is also the hub-skew bound
    (a 10^7-degree hub contributes arrays of at most ~sqrt(2E)).
  - intersection kernels (SIMD, /root/reference/plato/util/intersection.hpp:64-127)
    map to Spark's JVM-side ``array_intersect`` / ``size`` — whole-stage
    codegen, no Python in the hot path.

triangle_count: sum over oriented edges (u,v) of |N+(u) ∩ N+(v)| — every
triangle {a<b<c in (deg,id) order} is counted exactly once at edge (a,b).

common_neighbors: per unordered pair (u,v) with an edge, the full set
N(u) ∩ N(v) over the UNDIRECTED neighborhoods (plato's `mutual` example,
/root/reference/example/mutual.cc:176-227).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.graph.edges import symmetrize
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)


def _degrees(canon: DataFrame) -> DataFrame:
    """Undirected degree per vertex from the canonical (src<dst) table."""
    return (
        symmetrize(canon.select("src", "dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("deg"))
    )


def orient_edges(canon: DataFrame) -> DataFrame:
    """Orient canonical undirected edges low->high by (degree, id) order.

    Returns (src, dst) with (deg(src), src) < (deg(dst), dst).
    """
    deg = _degrees(canon)
    d1 = deg.select(F.col("id").alias("src"), F.col("deg").alias("sdeg"))
    d2 = deg.select(F.col("id").alias("dst"), F.col("deg").alias("ddeg"))
    e = canon.select("src", "dst").join(d1, "src").join(d2, "dst")
    fwd = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def _oriented_adj(oriented: DataFrame) -> DataFrame:
    """(id, nbrs) — sorted oriented out-neighbor arrays (mutual.hpp:126-143)."""
    return oriented.groupBy(F.col("src").alias("id")).agg(
        F.sort_array(F.collect_set("dst")).alias("nbrs")
    )


def triangle_count(canon: DataFrame, per_vertex: bool = False) -> DataFrame:
    """Exact triangle count over canonical undirected edges (src<dst, unique).

    Returns a 1-row DataFrame (triangles: long), or per-vertex counts
    (id, triangles) when per_vertex=True (each triangle credited to all
    three corners).
    """
    spark = canon.sparkSession
    canon = canon.persist()
    n_edges = canon.count()
    # intersection work is CPU-bound (sum of oriented-degree merges, not
    # shuffle bytes): size partitions for compute granularity — 75k edges
    # per task instead of the shuffle-oriented 250k default (r6 A/B at
    # sf0.1: 2.9s @ 5 partitions -> 2.3s @ 16 on 32 cores); the ceiling
    # stays the session conf, so cluster-scale fan-out is unchanged
    with scoped_shuffle_partitions(
        spark, auto_shuffle_partitions(spark, n_edges, rows_per_partition=75_000)
    ):
        # materialize inside the scope — shuffle.partitions is read at
        # execution time, so a lazily-returned plan would miss the scope
        caches: list[DataFrame] = []
        out = _triangle_count(canon, per_vertex, caches).persist()
        out.count()
    # the result is materialized above, so the internal adjacency cache
    # is released here instead of lingering until LRU eviction — a long
    # session running many queries must not accumulate dead cached tables
    for c in caches:
        try:
            c.unpersist()
        except Exception:
            pass
    return out


def _triangle_count(
    canon: DataFrame, per_vertex: bool, caches: list | None = None
) -> DataFrame:
    oriented = orient_edges(canon)
    adj = _oriented_adj(oriented).persist()
    if caches is not None:
        caches.append(adj)
    a_u = adj.select(F.col("id").alias("src"), F.col("nbrs").alias("nbrs_u"))
    a_v = adj.select(F.col("id").alias("dst"), F.col("nbrs").alias("nbrs_v"))
    pairs = (
        oriented.join(a_u, "src")
        .join(a_v, "dst")
        .select(
            "src",
            "dst",
            F.array_intersect("nbrs_u", "nbrs_v").alias("common"),
        )
    )
    if not per_vertex:
        return pairs.agg(
            F.coalesce(F.sum(F.size("common")), F.lit(0)).cast("long").alias("triangles")
        )
    corners = (
        pairs.select(F.col("src").alias("id"), F.size("common").alias("c"))
        .unionByName(pairs.select(F.col("dst").alias("id"), F.size("common").alias("c")))
        .unionByName(
            pairs.select(F.explode("common").alias("id"), F.lit(1).alias("c"))
        )
    )
    verts = (
        canon.select(F.col("src").alias("id"))
        .unionByName(canon.select(F.col("dst").alias("id")))
        .distinct()
    )
    counted = corners.groupBy("id").agg(F.sum("c").cast("long").alias("triangles"))
    return verts.join(counted, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )


def clustering_coefficient(canon: DataFrame) -> DataFrame:
    """(id, lcc) — local clustering coefficient per vertex:
    2*tri(v) / (deg(v)*(deg(v)-1)), deg < 2 => 0.0, rounded 6dp.

    Composes the per-vertex oriented triangle count with the undirected
    degree table — one extra co-partitioned join over triangle_count's
    plan, no new shuffle shape (the classic mutual-derived statistic;
    reference computes the ingredients in mutual.hpp / cgm stats).
    """
    tri = triangle_count(canon, per_vertex=True)
    deg = _degrees(canon)
    lcc = F.when(
        F.col("deg") >= 2,
        F.round(
            2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)), 6
        ),
    ).otherwise(F.lit(0.0))
    return tri.join(deg, "id", "left").select(
        "id", lcc.alias("lcc")
    )


def neighborhood_similarity(canon: DataFrame, method: str = "jaccard") -> DataFrame:
    """Link-prediction scores per linked pair (src<dst) over UNDIRECTED
    neighborhoods — the mutual family's scoring extension
    (reference computes the ingredients: mutual.hpp common sets + degrees).

    method="jaccard":      |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
    method="adamic_adar":  Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))
    method="resource_allocation":  Σ_{w ∈ N(u) ∩ N(v)} 1 / deg(w)
    method="preferential_attachment":  deg(u) * deg(v)  (exact integer —
        no common-neighbor pass at all, just two degree joins)
    method="overlap":      |N(u) ∩ N(v)| / min(deg(u), deg(v)) — the
        overlap (hub-promoted) coefficient: a leaf fully contained in a
        hub's neighborhood scores 1.0 where Jaccard dilutes it by the
        hub's degree — the containment-vs-resemblance distinction of
        the shingle family applied to neighborhoods
    Returns (src, dst, score) rounded 6dp (PA: exact long); pairs with
    empty intersection score 0.0. Same plan shape as common_neighbors
    (one adjacency build, JVM array_intersect); adamic-adar /
    resource-allocation add one explode + degree join.
    """
    deg = _degrees(canon)
    if method in ("jaccard", "overlap"):
        pairs = common_neighbors(canon, as_count=True)
        du = deg.select(F.col("id").alias("src"), F.col("deg").alias("du"))
        dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv"))
        denom = (
            F.greatest(F.col("du") + F.col("dv") - F.col("common_count"),
                       F.lit(1))
            if method == "jaccard"
            # linked pairs always have deg >= 1, min never hits 0
            else F.least(F.col("du"), F.col("dv"))
        )
        return (
            pairs.join(du, "src").join(dv, "dst")
            .select(
                "src", "dst",
                F.round(F.col("common_count") / denom, 6).alias("score"),
            )
        )
    if method == "preferential_attachment":
        du = deg.select(F.col("id").alias("src"), F.col("deg").alias("du"))
        dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv"))
        return (
            canon.select("src", "dst")
            .join(du, "src").join(dv, "dst")
            .select(
                "src", "dst",
                (F.col("du") * F.col("dv")).cast("long").alias("score"),
            )
        )
    if method in ("adamic_adar", "resource_allocation"):
        lists = common_neighbors(canon, as_count=False)
        exploded = lists.select("src", "dst", F.explode("common").alias("w"))
        # per-term quantization to int64 PICOUNITS before the sum: a raw
        # sum of 1/deg (or 1/ln deg) doubles is reassociation-sensitive,
        # and a pair whose true score sits on an exact 6dp half-tie then
        # splits engines by 1e-6 depending on reduce order (observed on
        # 1/1,196,000 pairs at sf0.1).  round(1e12/deg) is one identical
        # IEEE division + HALF_UP on both engines, the int64 sum is
        # order-free, and the 6dp readout is pure integer HALF_UP.
        # Quantization error <= 5e-13 * |common| — deterministic and far
        # below the readout grain.  (adamic_adar's ln keeps a residual
        # libm-vs-Java last-ulp risk inside the ONE per-term division —
        # measure-zero next to the per-pair sum ties this removes.)
        contrib = (
            1e12 / F.log("deg") if method == "adamic_adar"
            else 1e12 / F.col("deg")
        )
        scored = (
            exploded.join(deg.select(F.col("id").alias("w"), "deg"), "w")
            .groupBy("src", "dst")
            .agg(F.sum(F.round(contrib, 0).cast("long")).cast("long")
                 .alias("su"))
        )
        return (
            canon.select("src", "dst")
            .join(scored, ["src", "dst"], "left")
            .select(
                "src", "dst",
                (
                    ((F.coalesce("su", F.lit(0)) + F.lit(500000))
                     - (F.coalesce("su", F.lit(0)) + F.lit(500000))
                     % F.lit(1000000)) / F.lit(1000000)
                    / F.lit(1e6)
                ).alias("score"),
            )
        )
    raise ValueError(f"unknown method {method!r}")


def common_neighbor_payload(
    canon: DataFrame,
    payload: DataFrame,
    value_col: str,
    id_col: str = "id",
    cents: bool = False,
) -> DataFrame:
    """Per linked pair: aggregate a per-vertex payload over the COMMON
    neighbors — the reference's `mutual` example with vertex data
    (/root/reference/example/mutual.cc:131-160,204-222: payload vectors
    loaded per vertex, callback receives the common-neighbor list).

    Returns (src, dst, common_count: long, value_avg: double 6dp); pairs
    with no common neighbors get count 0 and NULL avg.

    cents=True: the payload is an exact 2-decimal non-negative currency
    value; value_avg is computed ENTIRELY in int64 (HALF_UP at 6dp:
    floor((2*sum_cents*10^4 + n) / (2n)) / 10^6) so engines sharing the
    dataset produce bit-identical doubles.  A raw round(avg(double), 6)
    can land on an exact 7th-digit-5 tie where Spark's exact-decimal
    HALF_UP and DuckDB's multiply-then-round disagree by 1e-6 (observed
    on 5/8899 pairs at sf0.001).
    """
    pairs = common_neighbors(canon, as_count=False)
    exploded = pairs.select("src", "dst", F.explode("common").alias("nbr"))
    joined = exploded.join(
        payload.select(F.col(id_col).alias("nbr"), F.col(value_col).alias("v")), "nbr"
    )
    if cents:
        aggd = joined.groupBy("src", "dst").agg(
            F.count("*").cast("long").alias("common_count"),
            F.sum(F.round(F.col("v") * 100).cast("long")).alias("_cents"),
        ).select(
            "src", "dst", "common_count",
            (F.expr(
                "CAST((2 * _cents * 10000 + common_count)"
                " DIV (2 * common_count) AS DOUBLE)") / F.lit(1e6)
             ).alias("value_avg"),
        )
    else:
        aggd = joined.groupBy("src", "dst").agg(
            F.count("*").cast("long").alias("common_count"),
            F.round(F.avg("v"), 6).alias("value_avg"),
        )
    return (
        canon.select("src", "dst")
        .join(aggd, ["src", "dst"], "left")
        .select(
            "src", "dst",
            F.coalesce("common_count", F.lit(0)).cast("long").alias("common_count"),
            "value_avg",
        )
    )


def _segmented_undirected_adj(sym: DataFrame, segments: int) -> DataFrame:
    """(id, salt, nbrs) — undirected adjacency hash-segmented by NEIGHBOR
    value into a fixed number of segments, so a hub's 10^7 neighbors become
    `segments` bounded rows instead of one unbounded array (SURVEY §7.4.3;
    plato spreads the same work with round-robin partition masks,
    mutual.hpp:148-159). Segmenting by a hash of the neighbor makes the
    segmentation CONSISTENT across vertices: N(u) ∩ N(v) =
    ∪_s N_s(u) ∩ N_s(v), so pairwise intersections distribute."""
    return (
        sym.select(
            F.col("src").alias("id"),
            F.col("dst").alias("n"),
            F.pmod(F.xxhash64("dst", F.lit(23)), F.lit(segments)).cast("int").alias("salt"),
        )
        .groupBy("id", "salt")
        .agg(F.sort_array(F.collect_set("n")).alias("nbrs"))
    )


def common_neighbors(
    canon: DataFrame,
    as_count: bool = True,
    hub_cap: int = 100_000,
    caches: list | None = None,
) -> DataFrame:
    """Per linked pair (src<dst): common neighbors over UNDIRECTED adjacency.

    Returns (src, dst, common_count) or (src, dst, common: array<long>).
    Mirrors plato's mutual example output `src,dst,count|list`
    (/root/reference/example/mutual.cc:204-222).

    hub_cap bounds the size of any collected neighbor-array row: when the
    max degree exceeds it, adjacency is hash-segmented (consistent across
    vertices) and per-segment intersections are re-reduced per pair —
    identical results, no unbounded row. When max degree <= hub_cap the
    plan is the plain one-array-per-vertex join (no extra cost).

    caches: optional list the persisted intermediates (sym, adj) are
    appended to so a caller that materializes the result (e.g. via
    localCheckpoint) can unpersist them instead of leaning on LRU
    eviction.
    """
    sym = symmetrize(canon.select("src", "dst")).persist()
    if caches is not None:
        caches.append(sym)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    max_deg = deg.agg(F.max("deg")).collect()[0][0] or 0
    segments = int((max_deg + hub_cap - 1) // hub_cap) if max_deg else 1
    pairs0 = canon.select("src", "dst")

    if segments <= 1:
        adj = sym.groupBy(F.col("src").alias("id")).agg(
            F.sort_array(F.collect_set("dst")).alias("nbrs")
        ).persist()
        if caches is not None:
            caches.append(adj)
        a_u = adj.select(F.col("id").alias("src"), F.col("nbrs").alias("nbrs_u"))
        a_v = adj.select(F.col("id").alias("dst"), F.col("nbrs").alias("nbrs_v"))
        pairs = pairs0.join(a_u, "src").join(a_v, "dst")
        common = F.array_intersect("nbrs_u", "nbrs_v")
        if as_count:
            return pairs.select(
                "src", "dst", F.size(common).cast("long").alias("common_count")
            )
        return pairs.select("src", "dst", F.sort_array(common).alias("common"))

    adj = _segmented_undirected_adj(sym, segments).persist()
    if caches is not None:
        caches.append(adj)
    a_u = adj.select(
        F.col("id").alias("src"), "salt", F.col("nbrs").alias("nbrs_u")
    )
    a_v = adj.select(
        F.col("id").alias("dst"), "salt", F.col("nbrs").alias("nbrs_v")
    )
    seg = (
        pairs0.join(a_u, "src")
        .join(a_v, ["dst", "salt"])
        .select(
            "src", "dst",
            F.array_intersect("nbrs_u", "nbrs_v").alias("common"),
        )
    )
    if as_count:
        aggd = seg.groupBy("src", "dst").agg(
            F.sum(F.size("common")).cast("long").alias("common_count")
        )
        return pairs0.join(aggd, ["src", "dst"], "left").select(
            "src", "dst",
            F.coalesce("common_count", F.lit(0)).cast("long").alias("common_count"),
        )
    aggd = seg.groupBy("src", "dst").agg(
        F.sort_array(F.flatten(F.collect_list("common"))).alias("common")
    )
    return pairs0.join(aggd, ["src", "dst"], "left").select(
        "src", "dst",
        F.coalesce("common", F.array().cast("array<long>")).alias("common"),
    )


def transitivity(canon: DataFrame) -> DataFrame:
    """1-row (n_triangles, n_wedges, transitivity) — the GLOBAL
    clustering coefficient 3*T/W (Newman): T = triangle count, W = number
    of wedges (paths of length 2) = sum over v of C(deg(v), 2).

    The scalar companion of ``clustering_coefficient`` (which is
    per-vertex): same ingredients (one oriented triangle pass + one
    degree aggregation), folded to two scalars and one rounded division
    — the 1-row crossJoin is a broadcast of a single row, the same
    pattern as graph_stats.  Exact integers until the final division.
    """
    tri = triangle_count(canon).select(
        F.col("triangles").cast("long").alias("n_triangles")
    )
    wedges = _degrees(canon).agg(
        F.expr("sum(deg * (deg - 1)) div 2").cast("long").alias("n_wedges")
    )
    return tri.crossJoin(wedges).select(
        "n_triangles",
        "n_wedges",
        F.when(
            F.col("n_wedges") > 0,
            F.round(
                3.0 * F.col("n_triangles") / F.col("n_wedges").cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("transitivity"),
    )


def four_clique_count(canon: DataFrame) -> DataFrame:
    """1-row (four_cliques) — exact K4 count: each 4-clique appears
    exactly once as a<b<c<d with all six canonical (id-ordered) edges
    present, so the count is one triangle enumeration + three further
    equi-joins against the edge table.

    The denser-motif companion of motif_census's 4-cycles and wedges
    (k-clique density is the classic community-strength signal one step
    past triangles).  NOTE: id-order orientation keeps the oracle an
    exact SQL mirror; production at 100x would orient by (degree, id)
    like triangle_count to bound the join fan-out on hubs — same count,
    different intermediate sizes (documented trade-off, the SpMV
    lesson: measure before swapping).
    """
    e = canon.select("src", "dst").distinct()
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = (
        ab.join(ac, "a")
        .where(F.col("c") > F.col("b"))
        .join(bc, ["b", "c"])
    )
    ad = e.select(F.col("src").alias("a"), F.col("dst").alias("d"))
    bd = e.select(F.col("src").alias("b"), F.col("dst").alias("d"))
    cd = e.select(F.col("src").alias("c"), F.col("dst").alias("d"))
    k4 = tri.join(cd, "c").join(bd, ["b", "d"]).join(ad, ["a", "d"])
    return k4.agg(F.count("*").cast("long").alias("four_cliques"))


def local_bridges(canon: DataFrame) -> DataFrame:
    """(src, dst) — Granovetter LOCAL BRIDGES: edges whose endpoints
    share no common neighbor (span > 2), i.e. the only 2-hop-free
    shortcuts in the graph.  Removing one lengthens its endpoints'
    distance to >= 3 — these are the weak-tie conduits information
    crosses communities on, and the edges a partitioner must not
    replicate away.

    Pure composition: common_neighbors already computes the per-linked-
    pair intersection size (hub-capped, one adjacency build); a local
    bridge is exactly a linked pair with common_count == 0.  Exact
    integer filter, no new shuffle shape.
    """
    return (
        common_neighbors(canon, as_count=True)
        .where(F.col("common_count") == 0)
        .select("src", "dst")
    )


def degree_clustering_curve(canon: DataFrame) -> DataFrame:
    """(deg, n_vertices, closed, possible, cc) — degree-dependent
    clustering curve c(k), the hierarchical-modularity probe (Ravasz &
    Barabási 2003: c(k) ~ k^-1 signals hierarchy; flat c(k) signals a
    homogeneous graph).  Decides whether hub neighborhoods are dense
    (triangle counting stays cheap under degree-ordering) or sprawling.

    Per degree class: closed = sum_v 2*tri(v), possible =
    sum_v deg(deg-1), cc = closed/possible.  This is the RATIO-OF-SUMS
    aggregation, not the mean of per-vertex coefficients — per-vertex
    ratios are IEEE floats whose per-class mean depends on accumulation
    order; ratio-of-sums keeps both engines in exact BIGINTs until one
    rounded division per class.  Plan: the oriented triangle pass +
    one co-partitioned degree join + a groupBy on the (tiny) degree
    key space.
    """
    tri = triangle_count(canon, per_vertex=True)
    deg = _degrees(canon)
    j = tri.join(deg, "id")
    per = j.groupBy("deg").agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.sum(2 * F.col("triangles")).cast("long").alias("closed"),
        F.sum(F.col("deg") * (F.col("deg") - 1)).cast("long").alias("possible"),
    )
    return per.select(
        F.col("deg").cast("long").alias("deg"),
        "n_vertices",
        "closed",
        "possible",
        F.when(
            F.col("possible") > 0,
            F.round(F.col("closed").cast("double") / F.col("possible"), 6),
        ).otherwise(F.lit(0.0)).alias("cc"),
    )
