"""Edge-table normalization, vid dictionary encoding, degrees, graph stats.

Reference parity:
- vid dictionary encoding: /root/reference/plato/graph/structure/vid_encoder.hpp:40-165
  (murmur-shuffle dedup of raw uint64/string ids -> dense uint32, decode table).
  Here: ``encode_vertices`` builds a dictionary DataFrame (vkey -> dense id)
  with a deterministic dense-rank; decode is a join against the dictionary.
- undirected doubling: the reference stores undirected graphs by doubling
  edges at load (/root/reference/plato/graph/structure.hpp:1032-1033).
  ``canonicalize_undirected`` keeps ONE canonical row (src < dst);
  ``symmetrize`` expands to both directions for algorithms that pull/push.
- graph stats: plato infers (vertices_, edges_, max_v_i_) with a bitmap +
  allreduce during load (/root/reference/plato/graph/structure.hpp:190-237);
  here one ``agg``.
- degrees: generate_dense_out_degrees
  (/root/reference/plato/graph/structure.hpp:239-289) -> groupBy().count().

All functions are pure DataFrame plans: Catalyst handles pushdown/pruning,
shuffles carry map-side partial aggregation (plato's receiver-side
write_add/min combiners, /root/reference/plato/util/atomic.hpp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def canonicalize_undirected(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Dedup an edge list into canonical undirected form: one row per
    unordered pair with src < dst; self-loops dropped (plato's CSR build also
    ignores self-edges for mutual/triangle semantics,
    /root/reference/plato/algo/mutual/mutual.hpp:226-235 parity rule)."""
    lo = F.least(F.col(src), F.col(dst)).alias("src")
    hi = F.greatest(F.col(src), F.col(dst)).alias("dst")
    return (
        edges.select(lo, hi)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Expand canonical undirected edges (src<dst, unique) to both directions.

    Mirrors the reference's undirected doubling at load
    (/root/reference/plato/graph/structure.hpp:1032-1033).
    """
    cols = edges.columns
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        *[c for c in cols if c not in ("src", "dst")],
    ).select(*cols)
    return edges.unionByName(rev)


def build_dictionary(verts: DataFrame, n_part: int) -> DataFrame:
    """(id, vkey) — deterministic dense rank of DISTINCT keys, computed
    DISTRIBUTED: range-partition by key, sort within partitions, then
    per-partition offsets via one lightweight count job (zipWithIndex
    pattern). A single-partition window (row_number over global order)
    would be a serial bottleneck at 10^12-file scale;
    monotonically_increasing_id is not reproducible across partitionings.
    Spark analog of the reference's allgathered dictionary
    (/root/reference/plato/graph/structure/vid_encoder.hpp:80-165).
    Returned hash-partitioned on vkey at n_part and persisted."""
    spark = verts.sparkSession
    # Cache the distinct key set first: repartitionByRange SAMPLES its
    # input to pick range boundaries, so an unpersisted `verts` would run
    # the whole upstream distinct-union twice (sampling pass + shuffle
    # pass) — measured r6 at sf0.1 extraction this was ~40% of the
    # dictionary build.
    verts0 = verts.persist()
    sorted_verts = (
        verts0.repartitionByRange(n_part, "vkey")
        .sortWithinPartitions("vkey")
        .withColumn("__p", F.spark_partition_id())
        .persist()
    )
    part_counts = {
        int(r["__p"]): int(r["n"])
        for r in sorted_verts.groupBy("__p").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = [], 0
    for p in range(max(part_counts) + 1 if part_counts else 0):
        offsets.append((p, acc))
        acc += part_counts.get(p, 0)
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__p int, __off long")
    w = Window.partitionBy("__p").orderBy("vkey")
    dictionary = (
        sorted_verts.join(F.broadcast(off_df), "__p")
        .select(
            (F.row_number().over(w) - F.lit(1) + F.col("__off")).cast("long").alias("id"),
            "vkey",
        )
    )
    # explicit co-partitioning on the key at n_part (independent of the
    # ambient shuffle conf) keeps downstream dictionary joins exchange-light.
    # Materialize it HERE so the two build-side caches can be released
    # immediately (they used to linger until session end).
    dictionary = dictionary.repartition(n_part, "vkey").persist()
    dictionary.count()
    sorted_verts.unpersist()
    verts0.unpersist()
    return dictionary


def encode_vertices(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dictionary-encode raw vertex keys (any orderable type) to dense longs.

    Returns (encoded_edges[src,dst,...], dictionary[id, vkey]).

    The reference's vid_encoder_t hashes raw ids across ranks, dedups in a
    cuckoo table and allgathers the table
    (/root/reference/plato/graph/structure/vid_encoder.hpp:80-165). The Spark
    plan is the declarative equivalent: distinct -> deterministic dense rank
    (order by key so the encoding is reproducible) -> two broadcast-or-shuffle
    joins to rewrite endpoints. At 100TB scale the dictionary join is a plain
    shuffle hash join on the vkey; Catalyst broadcasts it automatically when
    the vertex set is small.
    """
    spark = edges.sparkSession
    verts = (
        edges.select(F.col(src).alias("vkey"))
        .unionByName(edges.select(F.col(dst).alias("vkey")))
        .distinct()
    )
    if num_partitions is None:
        # size parallelism to the data (same rationale as
        # partitioning.auto_shuffle_partitions: per-task overhead dominates
        # small inputs; ceiling = session conf for cluster-scale runs)
        from plato_spark.graph.partitioning import auto_shuffle_partitions

        num_partitions = auto_shuffle_partitions(spark, edges.count())
    n_part = num_partitions
    dictionary = build_dictionary(verts, n_part)
    others = [c for c in edges.columns if c not in (src, dst)]
    d_src = dictionary.select(F.col("vkey").alias("__sk"), F.col("id").alias("__sid"))
    d_dst = dictionary.select(F.col("vkey").alias("__dk"), F.col("id").alias("__did"))
    enc = (
        edges.repartition(n_part, src)
        .join(d_src, edges[src] == d_src["__sk"], "inner")
        .join(d_dst, edges[dst] == d_dst["__dk"], "inner")
        .select(
            F.col("__sid").alias("src"),
            F.col("__did").alias("dst"),
            *[F.col(c) for c in others],
        )
    )
    return enc, dictionary


def out_degrees(edges: DataFrame) -> DataFrame:
    """(id, odeg) — out-degree per vertex present as a source."""
    return edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("odeg"))


def in_degrees(edges: DataFrame) -> DataFrame:
    """(id, ideg) — in-degree per vertex present as a destination."""
    return edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("ideg"))


def vertices(edges: DataFrame) -> DataFrame:
    """(id) — all vertex ids appearing as src or dst."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def graph_stats(edges: DataFrame) -> dict:
    """One-pass graph_info_t equivalent: edges, max id, distinct vertices.

    Reference fills graph_info_t{vertices_, edges_, max_v_i_} via bitmap +
    MPI_Allreduce (/root/reference/plato/graph/structure.hpp:226-234).
    """
    row = edges.agg(
        F.count("*").alias("edges"),
        F.greatest(F.max("src"), F.max("dst")).alias("max_id"),
    ).collect()[0]
    n_vertices = vertices(edges).count()
    return {
        "edges": row["edges"],
        "max_id": row["max_id"],
        "vertices": n_vertices,
    }


def degree_assortativity(canon: DataFrame) -> DataFrame:
    """1-row (assortativity: double 6dp) — Pearson correlation of the
    endpoint UNDIRECTED degrees over the symmetrized edge list (Newman's
    degree assortativity; each undirected edge contributes both
    orientations, making the measure symmetric).

    Beyond the reference menu (plato's cgm stats stop at degree counts);
    a one-aggregation query: degrees (one groupBy) + two co-partitioned
    joins + corr, fully JVM-side and exactly mirrorable in SQL.
    """
    sym = symmetrize(canon.select("src", "dst"))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("double").alias("deg")
    )
    ds = deg.select(F.col("id").alias("src"), F.col("deg").alias("dsrc"))
    dd = deg.select(F.col("id").alias("dst"), F.col("deg").alias("ddst"))
    # Pearson from sufficient statistics rather than F.corr: ANSI mode
    # makes corr() raise DIVIDE_BY_ZERO on zero-variance inputs (e.g. a
    # clique, all degrees equal) where NULL is the correct answer.
    m = (
        sym.join(ds, "src")
        .join(dd, "dst")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum("dsrc").alias("sx"),
            F.sum("ddst").alias("sy"),
            F.sum(F.col("dsrc") * F.col("ddst")).alias("sxy"),
            F.sum(F.col("dsrc") * F.col("dsrc")).alias("sxx"),
            F.sum(F.col("ddst") * F.col("ddst")).alias("syy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.when(
            (vx > 0) & (vy > 0),
            F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6),
        ).alias("assortativity")
    )


def avg_neighbor_degree(canon: DataFrame) -> DataFrame:
    """(id, deg, avg_nbr_deg) — per-vertex average UNDIRECTED degree of
    its neighbors (Pastor-Satorras' knn(v)); the vertex-level view of
    the same degree-mixing structure degree_assortativity folds to one
    scalar.  Hub-adjacent vertices score high; a decreasing knn(k) curve
    is the disassortative signature typical of co-occurrence graphs.

    Plan: one degree aggregation + one co-partitioned equi-join of the
    symmetrized edges against it + one groupBy(src) — integer sums, a
    single rounded division at read-out.  At 100x, the join shuffles on
    the same key as the degree agg, so AQE reuses the partitioning.
    """
    sym = symmetrize(canon.select("src", "dst"))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg")
    )
    dn = deg.select(F.col("id").alias("dst"), F.col("deg").alias("nbr_deg"))
    return (
        sym.join(dn, "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("nbr_deg").cast("long").alias("s"))
        .join(deg, "id")
        .select(
            "id",
            "deg",
            F.round(
                F.col("s").cast("double") / F.col("deg").cast("double"), 6
            ).alias("avg_nbr_deg"),
        )
    )


def degree_gini(canon: DataFrame) -> DataFrame:
    """1-row (n_vertices, total_degree, gini) — Gini coefficient of the
    UNDIRECTED degree distribution: the scalar skew audit that predicts
    whether hub-handling (salting, broadcast frontiers, AQE skew joins)
    will matter on this graph.  gini = (2*sum_i i*d_i)/(n*sum d) -
    (n+1)/n over ascending-sorted degrees.

    Plan: the rank-weighted sum folds over the DEGREE HISTOGRAM, not the
    vertex list — a degree class with count c starting at cumulative
    offset o contributes d*(c*o + c*(c+1)/2), all integers — so the only
    window runs over |distinct degree values| rows (hundreds at any
    scale; the degree agg itself is the one real shuffle).  Two IEEE
    divisions at read-out, identical on both engines.
    """
    sym = symmetrize(canon.select("src", "dst"))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg")
    )
    return gini_from_counts(deg.select(F.col("deg").alias("cnt"))).select(
        F.col("n").alias("n_vertices"),
        F.col("total").alias("total_degree"),
        "gini",
    )


def gini_from_counts(counts: DataFrame) -> DataFrame:
    """1-row (n, total, gini) — Gini of any nonnegative integer ``cnt``
    column, folded over its VALUE HISTOGRAM: a value class of size c
    at cumulative offset o contributes v*(c*o + c*(c+1)/2), all
    integers, so the only window runs over |distinct values| rows.  Two
    IEEE divisions at read-out (degree_gini's kernel, generalized for
    any exposure/weight distribution)."""
    hist = counts.groupBy(F.col("cnt").alias("v")).agg(
        F.count("*").cast("long").alias("c"))
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    hist = hist.withColumn(
        "offset", F.coalesce(F.sum("c").over(w), F.lit(0)).cast("long")
    )
    agg = hist.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("total"),
        F.sum(
            F.col("v")
            * (F.col("c") * F.col("offset")
               + F.expr("c * (c + 1) div 2"))
        ).cast("long").alias("s"),
    )
    n, t, s = F.col("n"), F.col("total"), F.col("s")
    return agg.select(
        "n", "total",
        F.round(
            (2.0 * s.cast("double")) / (n.cast("double") * t.cast("double"))
            - (n + 1).cast("double") / n.cast("double"),
            6,
        ).alias("gini"),
    )


def strength_disparity(weighted_canon: DataFrame) -> DataFrame:
    """(id, deg, strength, disparity) — per-vertex edge-weight
    concentration Y(v) = sum_e w_e^2 / (sum_e w_e)^2 (Barthelemy et al.
    2005).  Y ~ 1/deg means weight spreads evenly over a hub's edges;
    Y -> 1 means one edge carries everything — the per-vertex signal
    behind choosing weight-aware salting over plain degree capping
    (graph/salting.py treats all edges alike; a hub with Y near 1 only
    needs its one heavy edge isolated).

    Input: canonical undirected weighted edges (src < dst, weight =
    integer multiplicity as double, cf. sources/tables
    .part_cooccurrence_edges(weighted=True)).  Both directions count,
    so each endpoint sees the full incident weight.  Exact integer
    folds (weights are counts); one rounded IEEE division per vertex.
    Plan: one symmetrize + one map-side-combined groupBy on the vertex
    key — no joins, no windows.
    """
    sym = symmetrize(weighted_canon.select("src", "dst", "weight"))
    w = F.col("weight").cast("long")
    per = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg"),
        F.sum(w).cast("long").alias("strength"),
        F.sum(w * w).cast("long").alias("sq"),
    )
    return per.select(
        "id",
        "deg",
        "strength",
        F.round(
            F.col("sq").cast("double")
            / (F.col("strength") * F.col("strength")).cast("double"),
            6,
        ).alias("disparity"),
    )


def attribute_dirichlet(
    edges: DataFrame, attrs: DataFrame
) -> DataFrame:
    """1-row Dirichlet energy of an integer vertex attribute over a
    directed edge table: (m_edges, energy, sum_abs_diff, avg_sq_diff)
    with energy = sum_(u,v) (x_u - x_v)^2 — the graph-smoothness audit
    ("do linked documents look alike?") that decides whether
    neighborhood aggregation (GNN feeds, label propagation) carries
    signal on this graph at all.  ``attrs``: (id, x) with x integral.

    Exact BIGINT folds; the single IEEE division (avg_sq_diff) is
    rounded at read-out.  Plan: two key-partitioned attribute joins +
    one 1-row aggregation, the same vertex-payload shape as
    algos/mixing.
    """
    a = attrs.toDF("id", "x")
    sx = a.select(F.col("id").alias("src"), F.col("x").alias("sx"))
    dx = a.select(F.col("id").alias("dst"), F.col("x").alias("dx"))
    d = (
        edges.join(sx, "src")
        .join(dx, "dst")
        .select((F.col("sx") - F.col("dx")).cast("long").alias("diff"))
    )
    agg = d.agg(
        F.count(F.lit(1)).cast("long").alias("m_edges"),
        F.coalesce(F.sum(F.col("diff") * F.col("diff")), F.lit(0))
        .cast("long")
        .alias("energy"),
        F.coalesce(F.sum(F.abs(F.col("diff"))), F.lit(0))
        .cast("long")
        .alias("sum_abs_diff"),
    )
    return agg.select(
        "m_edges",
        "energy",
        "sum_abs_diff",
        F.when(
            F.col("m_edges") > 0,
            F.round(F.col("energy").cast("double") / F.col("m_edges"), 6),
        ).alias("avg_sq_diff"),
    )


def hub_rank_churn(
    edges_a: DataFrame, edges_b: DataFrame, k: int = 100
) -> DataFrame:
    """1 row: (n_common, entered, exited, footrule, avg_rank_shift) —
    stability of the top-``k`` degree hubs between two snapshots of a
    graph (two crawl rounds, two time halves of an activity stream).
    Spearman's footrule sum |rank_a - rank_b| over hubs present in both
    top lists is exact-integer; entered/exited count list membership
    churn.  The drift audit that decides whether yesterday's hub-capped
    partitioning (graph/salting.py) is still valid today.

    Rank = row_number under the total order (deg DESC, id ASC), so both
    engines agree on every tie.  Plan: per side one degree aggregation
    + a global TakeOrdered top-k (orderBy.limit — no full sort, cf. the
    vocabulary query's plan assertion); the window that materializes
    rank numbers runs on the k-row result only.  Exact BIGINTs; the
    single division is rounded at read-out.
    """
    from pyspark.sql import Window

    def hubs(e: DataFrame) -> DataFrame:
        deg = (
            symmetrize(e.select("src", "dst"))
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
        top = deg.orderBy(F.desc("deg"), F.asc("id")).limit(k)
        w = Window.orderBy(F.desc("deg"), F.asc("id"))
        return top.select(
            "id", F.row_number().over(w).cast("long").alias("r")
        )

    ha = hubs(edges_a).withColumnRenamed("r", "ra")
    hb = hubs(edges_b).withColumnRenamed("r", "rb")
    common = ha.join(hb, "id")
    stats = common.agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.coalesce(F.sum(F.abs(F.col("ra") - F.col("rb"))), F.lit(0))
        .cast("long")
        .alias("footrule"),
    )
    entered = hb.join(ha, "id", "anti").agg(
        F.count(F.lit(1)).cast("long").alias("entered")
    )
    exited = ha.join(hb, "id", "anti").agg(
        F.count(F.lit(1)).cast("long").alias("exited")
    )
    out = stats.crossJoin(F.broadcast(entered)).crossJoin(F.broadcast(exited))
    return out.select(
        "n_common",
        "entered",
        "exited",
        "footrule",
        F.when(
            F.col("n_common") > 0,
            F.round(F.col("footrule").cast("double") / F.col("n_common"), 6),
        ).alias("avg_rank_shift"),
    )


def directed_degree_assortativity(edges: DataFrame) -> DataFrame:
    """4 rows (mode, assortativity) — the four directed degree-degree
    Pearson correlations over edges (Foster et al., PNAS 2010):
    ``out-in`` / ``out-out`` / ``in-in`` / ``in-out``, correlating
    deg_alpha(src) with deg_beta(dst) per directed edge (degrees as-is,
    no excess-degree correction — documented convention, mirrored in
    the oracle).  A citation graph that is out-in disassortative but
    out-out assortative routes mass very differently under PageRank
    than its undirected projection suggests — this is the audit that
    says which.

    One degree pass per direction, two co-partitioned payload joins,
    ONE aggregation carrying the 13 sufficient statistics for all four
    correlations (integer-valued sums in doubles; sqrt is IEEE
    correctly-rounded so both engines agree bit-for-bit after 6dp).
    Zero-variance modes return NULL (the clique lesson of
    degree_assortativity above).
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    odeg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("od")
    )
    ideg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("idg")
    )
    both = (
        e.select(F.col("src").alias("id")).unionByName(
            e.select(F.col("dst").alias("id"))
        )
        .distinct()
        .join(odeg, "id", "left")
        .join(ideg, "id", "left")
        .select(
            "id",
            F.coalesce("od", F.lit(0.0)).alias("od"),
            F.coalesce("idg", F.lit(0.0)).alias("idg"),
        )
    )
    s = both.select(F.col("id").alias("src"), F.col("od").alias("xo"), F.col("idg").alias("xi"))
    d = both.select(F.col("id").alias("dst"), F.col("od").alias("yo"), F.col("idg").alias("yi"))
    j = e.join(s, "src").join(d, "dst")
    agg = j.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("xo").alias("sxo"), F.sum("xi").alias("sxi"),
        F.sum("yo").alias("syo"), F.sum("yi").alias("syi"),
        F.sum(F.col("xo") * F.col("xo")).alias("sxo2"),
        F.sum(F.col("xi") * F.col("xi")).alias("sxi2"),
        F.sum(F.col("yo") * F.col("yo")).alias("syo2"),
        F.sum(F.col("yi") * F.col("yi")).alias("syi2"),
        F.sum(F.col("xo") * F.col("yo")).alias("sxoyo"),
        F.sum(F.col("xo") * F.col("yi")).alias("sxoyi"),
        F.sum(F.col("xi") * F.col("yo")).alias("sxiyo"),
        F.sum(F.col("xi") * F.col("yi")).alias("sxiyi"),
    )

    def _r(sx, sy, sxx, syy, sxy):
        num = F.col("n") * F.col(sxy) - F.col(sx) * F.col(sy)
        vx = F.col("n") * F.col(sxx) - F.col(sx) * F.col(sx)
        vy = F.col("n") * F.col(syy) - F.col(sy) * F.col(sy)
        return F.when(
            (vx > 0) & (vy > 0), F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6)
        )

    modes = agg.select(
        _r("sxo", "syi", "sxo2", "syi2", "sxoyi").alias("out-in"),
        _r("sxo", "syo", "sxo2", "syo2", "sxoyo").alias("out-out"),
        _r("sxi", "syi", "sxi2", "syi2", "sxiyi").alias("in-in"),
        _r("sxi", "syo", "sxi2", "syo2", "sxiyo").alias("in-out"),
    )
    stack = F.expr(
        "stack(4, 'out-in', `out-in`, 'out-out', `out-out`, "
        "'in-in', `in-in`, 'in-out', `in-out`)"
    ).alias("mode", "assortativity")
    return modes.select(stack)


def strength_assortativity(weighted_canon: DataFrame) -> DataFrame:
    """1-row (assortativity) — degree_assortativity's WEIGHTED sibling:
    Pearson correlation of endpoint STRENGTHS (sum of incident integer
    weights) over the symmetrized edge list, each orientation once.  On
    a co-occurrence graph this asks whether heavily-evidenced vertices
    attach to each other (rich-club wiring by evidence mass, not just
    by link count — the two can disagree when hub edges are weak).

    Same sufficient-statistics form as the degree variant (corr() would
    raise on zero variance where NULL is the right answer); strengths
    are exact integer sums of integral weights, folded as doubles only
    inside the one Pearson read-out."""
    sym = weighted_canon.select("src", "dst", "weight").unionAll(
        weighted_canon.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    st = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").cast("double").alias("s"))
    ss = st.select(F.col("id").alias("src"), F.col("s").alias("ssrc"))
    sd = st.select(F.col("id").alias("dst"), F.col("s").alias("sdst"))
    m = (
        sym.join(ss, "src")
        .join(sd, "dst")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum("ssrc").alias("sx"),
            F.sum("sdst").alias("sy"),
            F.sum(F.col("ssrc") * F.col("sdst")).alias("sxy"),
            F.sum(F.col("ssrc") * F.col("ssrc")).alias("sxx"),
            F.sum(F.col("sdst") * F.col("sdst")).alias("syy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.when(
            (vx > 0) & (vy > 0),
            F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6),
        ).alias("assortativity")
    )


def powerlaw_alpha(canon: DataFrame, kmin: int = 2) -> DataFrame:
    """1-row (kmin, n_tail, max_degree, alpha, sigma) — discrete
    power-law exponent of the UNDIRECTED degree distribution by the
    Clauset-Shalizi-Newman MLE approximation
    alpha = 1 + n / sum_i ln(d_i / (kmin - 0.5)) over degrees >= kmin,
    with standard error sigma = (alpha - 1) / sqrt(n).

    This is the scale-free test behind every 100-TB skew decision the
    engine makes (salting thresholds, AQE skew joins, broadcast
    frontiers): alpha in [2, 3] means hub degree grows unboundedly with
    graph size, so hub handling is structural, not incidental; alpha
    well above 3 means the tail thins fast enough that plain hash
    partitioning holds.  Reference context: plato's partitioners carry
    explicit degree-aware variants for exactly this regime
    (/root/reference/plato/graph/partition/dcsc.hpp hub handling).

    Plan: the log-sum folds over the DEGREE HISTOGRAM (one shuffle for
    the degree agg, then |distinct degrees| rows — hundreds at any
    scale): a degree class (v, c) contributes c * ln(v / (kmin-0.5)).
    The 0.5 continuity correction makes every tail term strictly
    positive, so the division is well-defined whenever n_tail > 0;
    n_tail = 0 yields NULL alpha (NULL-not-fake-0 convention).
    """
    sym = symmetrize(canon.select("src", "dst"))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg"))
    hist = deg.groupBy(F.col("deg").alias("v")).agg(
        F.count("*").cast("long").alias("c"))
    shift = F.lit(float(kmin) - 0.5)
    agg = hist.where(F.col("v") >= kmin).agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_tail"),
        F.max("v").cast("long").alias("max_degree"),
        F.sum(F.col("c") * F.log(F.col("v") / shift)).alias("logsum"),
    )
    alpha = F.lit(1.0) + F.col("n_tail") / F.col("logsum")
    return agg.select(
        F.lit(kmin).cast("long").alias("kmin"),
        "n_tail",
        "max_degree",
        F.when(F.col("n_tail") > 0, F.round(alpha, 6)).alias("alpha"),
        F.when(
            F.col("n_tail") > 0,
            F.round((alpha - 1) / F.sqrt(F.col("n_tail")), 6),
        ).alias("sigma"),
    )


def degree_centralization(canon: DataFrame) -> DataFrame:
    """1-row (n_vertices, max_degree, centralization) — Freeman degree
    centralization of the undirected graph:
    C = sum_i (d_max - d_i) / ((n - 1) * (n - 2)), the star-likeness
    scalar (1.0 = perfect star, 0.0 = regular graph).  Complements
    degree_gini: gini reads inequality of the whole distribution,
    centralization reads single-hub dominance — the direct 'does ONE
    vertex bottleneck every superstep' audit.

    Plan: sum_i (d_max - d_i) = n * d_max - sum d_i, so the numerator
    is three exact int64 scalars off one degree aggregation — no
    second pass, no window; one IEEE division at read-out.  Vertices
    are the edge-incident set (isolated vertices carry no rows, same
    contract as degree_gini).  Graphs with n <= 2 yield NULL (the
    normalizer vanishes)."""
    sym = symmetrize(canon.select("src", "dst"))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg"))
    agg = deg.agg(
        F.count("*").cast("long").alias("n"),
        F.max("deg").cast("long").alias("max_degree"),
        F.sum("deg").cast("long").alias("total"),
    )
    return agg.select(
        F.col("n").alias("n_vertices"),
        "max_degree",
        F.when(
            F.col("n") > 2,
            F.round(
                (F.col("n") * F.col("max_degree") - F.col("total"))
                / ((F.col("n") - 1) * (F.col("n") - 2)),
                6,
            ),
        ).alias("centralization"),
    )
