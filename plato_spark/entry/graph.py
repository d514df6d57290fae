"""Entry-registry queries: graph domain (split from the former
monolithic __spark_entry__.py; round-5 manifest-ization).
"""

from __future__ import annotations

from plato_spark.entry.common import (  # noqa: F401
    CLOSENESS_SAMPLES,
    F,
    FRAGMENT_HIST_K,
    H1_SQL,
    HUB_SWEEP_KS,
    HUB_SWEEP_SQL_ITERS,
    HYPERANF_STEPS,
    KATZ_ITERS,
    LPA_ITERS,
    NATION_PARTITION_SQL,
    NSTEP_STEPS,
    PPR_ITERS,
    PPR_SOURCES,
    PRW_ITERS,
    PR_ITERS,
    SINKHORN_ITERS,
    SPECTRAL_ROUNDS,
    SQL_GRAPH_PREFIX,
    WCC_SQL_ITERS,
    _canonical_communities,
    _nation_clique_graph,
    _planted_digraph,
    _sql_betweenness,
    _sql_bfs_parents,
    _sql_bfs_query,
    _sql_closeness,
    _sql_closeness_exact,
    _sql_component_histogram,
    _sql_core_size_curve,
    _sql_eccentricity,
    _sql_eigenvector,
    _sql_graphlet_census,
    _sql_hanp,
    _sql_harmonic,
    _sql_hits,
    _sql_hub_removal,
    _sql_katz,
    _sql_kcore,
    _sql_ktruss,
    _sql_landmark_stretch,
    _sql_louvain,
    _sql_lpa,
    _sql_pagerank_ref_defaults,
    LPA_REF_ITERS,
    PR_REF_EPS,
    _sql_matching,
    _sql_metapath_walks,
    _sql_multi_bfs_ctes,
    _sql_node2vec_walks,
    _sql_pagerank,
    _sql_ppr,
    _sql_pseudo_diameter,
    _sql_random_removal,
    _sql_random_walks,
    _sql_reference_graph,
    _sql_sinkhorn,
    _sql_spectral,
    _sql_sssp,
    _sql_temporal_reach,
    _sql_tree_stat,
    _sql_trussness,
    _sql_wcc,
    _sql_weighted_triangles,
    _sql_widest,
    _sym,
    betweenness_sampled,
    bfs,
    closeness_sampled,
    clustering_coefficient,
    common_neighbors,
    component_edges,
    connected_components,
    hanp,
    hyperanf_portable,
    infomap,
    kcore,
    label_propagation,
    load_table,
    louvain,
    major_component,
    metapath_walks,
    neighborhood_similarity,
    nstep_degrees_portable,
    nstep_reach_exact,
    pagerank,
    part_cooccurrence_edges,
    personalized_pagerank,
    q_reference_graph,
    q_segment_pivot,
    q_spectral_coord,
    random_walks,
    sql_effective_diameter_oracle,
    sql_hyperanf_oracle,
    sql_nstep_oracle,
    sssp,
    symmetrize,
    tree_stat,
    triangle_count,
)


def q_edges(spark, sf_dir):
    return part_cooccurrence_edges(spark, sf_dir, weighted=True).select(
        "src", "dst", "weight"
    )


def q_degrees(spark, sf_dir):
    return (
        _sym(spark, sf_dir)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("long").alias("degree"))
    )


def q_graph_stats(spark, sf_dir):
    canon = part_cooccurrence_edges(spark, sf_dir)
    verts = canon.select(F.col("src").alias("id")).unionByName(
        canon.select(F.col("dst").alias("id"))
    )
    return verts.agg(
        F.count_distinct("id").cast("long").alias("n_vertices"),
        F.max("id").cast("long").alias("max_id"),
    ).crossJoin(canon.agg(F.count("*").cast("long").alias("n_edges")))


def q_pagerank(spark, sf_dir):
    r = pagerank(_sym(spark, sf_dir), eps=0.0, max_iters=PR_ITERS, impl="join")
    return r.select("id", F.round("rank", 6).alias("rank"))


def q_pagerank_spmv(spark, sf_dir):
    r = pagerank(_sym(spark, sf_dir), eps=0.0, max_iters=PR_ITERS, impl="spmv")
    return r.select("id", F.round("rank", 6).alias("rank"))


def q_pagerank_weighted(spark, sf_dir):
    sym = symmetrize(part_cooccurrence_edges(spark, sf_dir, weighted=True))
    r = pagerank(sym, eps=0.0, max_iters=PRW_ITERS, weight="weight", impl="join")
    return r.select("id", F.round("rank", 6).alias("rank"))


def q_ppr(spark, sf_dir):
    """Personalized PageRank from the PPR_SOURCES smallest vertices
    (deterministic source policy, same idea as the closeness sampler)."""
    sym = _sym(spark, sf_dir)
    srcs = [
        r["id"]
        for r in sym.select(F.col("src").alias("id")).distinct()
        .orderBy("id").limit(PPR_SOURCES).collect()
    ]
    r = personalized_pagerank(sym, sources=srcs, iterations=PPR_ITERS)
    return r.select("id", F.round("rank", 6).alias("rank"))


def q_wcc(spark, sf_dir):
    return connected_components(part_cooccurrence_edges(spark, sf_dir))


def q_hits(spark, sf_dir):
    """HITS hubs/authorities on the canonically-oriented co-occurrence
    graph (algos/hits; beyond the reference menu — L1-normalized power
    iteration, fixed 5 rounds for the oracle)."""
    from plato_spark.algos.hits import hits

    return hits(part_cooccurrence_edges(spark, sf_dir), iterations=5)


def q_ktruss(spark, sf_dir):
    """Maximal 5-truss of the co-occurrence graph (algos/ktruss: support
    peel to the unique fixpoint; hub-capped adjacency throughout)."""
    from plato_spark.algos.ktruss import ktruss

    return ktruss(part_cooccurrence_edges(spark, sf_dir), k=5)


def q_wcc_incremental(spark, sf_dir):
    """Incremental WCC (streaming/incremental.merge_edge_batch): the edge
    table arrives as three micro-batches folded into persisted state; the
    final labels must equal batch WCC from scratch, so the plain hash-min
    oracle applies verbatim."""
    import shutil
    import tempfile

    from plato_spark.streaming.incremental import (
        merge_edge_batch,
        read_component_state,
    )

    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    sd = tempfile.mkdtemp(prefix="plato_incwcc_")
    try:
        for i in range(3):
            merge_edge_batch(
                canon.where(F.pmod(F.col("src") + F.col("dst"), F.lit(3)) == i),
                sd,
            )
        # localCheckpoint severs lineage from the temp dir before cleanup
        out = read_component_state(spark, sd).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sd, ignore_errors=True)
    return out


def q_wcc_jump(spark, sf_dir):
    # pointer-jumping impl converges to the same min-vid fixpoint labels,
    # so the hash-min unrolled oracle applies verbatim
    return connected_components(part_cooccurrence_edges(spark, sf_dir), impl="jump")


def q_lpa(spark, sf_dir):
    return label_propagation(_sym(spark, sf_dir), iterations=LPA_ITERS)


def q_pagerank_ref_defaults(spark, sf_dir):
    """PageRank at the reference's PUBLISHED CLI defaults
    (/root/reference/scripts/run_pagerank.sh:15-17: eps=0.0001,
    damping=0.85, iterations=100) — the live eps stop rule plus plato's
    one extra post-convergence epoch (pagerank.hpp:136-146), not our
    pinned gate count.  The oracle re-derives the stop round from the
    same L1 rule inside DuckDB, so parity at the published settings is
    itself gate-checked (VERDICT r4 item 6)."""
    r = pagerank(_sym(spark, sf_dir), damping=0.85, eps=PR_REF_EPS,
                 max_iters=100, impl="join")
    return r.select("id", F.round("rank", 6).alias("rank"))


def q_lpa_ref_defaults(spark, sf_dir):
    """Label propagation at the reference's header default iteration
    budget (/root/reference/plato/algo/lpa/lpa.hpp:40: iteration_=20 vs
    our 3-round gate pin) — same deterministic (max vote, smallest
    label) tie-break, 20 unrolled oracle rounds (VERDICT r4 item 6)."""
    return label_propagation(_sym(spark, sf_dir),
                             iterations=LPA_REF_ITERS)


def q_lpa_weighted(spark, sf_dir):
    """Weighted-vote label propagation (algos/lpa.label_propagation
    weight='weight'): each in-neighbor's vote counts its co-occurrence
    weight — heavily-evidenced links pull labels harder; vote sums are
    exact int64 so the (sum, smallest-label) argmax stays a
    deterministic total order.  Same 3-iteration protocol and unrolled
    oracle as lpa, with the vote kernel swapped."""
    edges = symmetrize(part_cooccurrence_edges(spark, sf_dir,
                                               weighted=True))
    return label_propagation(edges, iterations=LPA_ITERS,
                             weight="weight")


def q_triangle_count(spark, sf_dir):
    return triangle_count(part_cooccurrence_edges(spark, sf_dir))


def q_common_neighbors(spark, sf_dir):
    return common_neighbors(part_cooccurrence_edges(spark, sf_dir))


def q_common_neighbor_lists(spark, sf_dir):
    """Mutual's list output mode (example/mutual.cc:204-222: src,dst,list).

    The list is emitted as a canonical comma-joined STRING (the reference
    prints it as text too) so the driver's pandas canonicalizer can sort
    and hash it — array columns are unhashable there.
    """
    lists = common_neighbors(part_cooccurrence_edges(spark, sf_dir), as_count=False)
    return lists.select(
        "src",
        "dst",
        F.concat_ws(",", F.col("common").cast("array<string>")).alias("common"),
    )


def q_link_adamic_adar(spark, sf_dir):
    return neighborhood_similarity(
        part_cooccurrence_edges(spark, sf_dir), method="adamic_adar"
    )


def q_link_preferential(spark, sf_dir):
    """Preferential-attachment link score deg(u)*deg(v) per linked pair
    (exact integer; two degree joins, no neighborhood pass)."""
    return neighborhood_similarity(
        part_cooccurrence_edges(spark, sf_dir), method="preferential_attachment"
    )


def q_link_resource_alloc(spark, sf_dir):
    """Resource-allocation index sum(1/deg(w)) over common neighbors."""
    return neighborhood_similarity(
        part_cooccurrence_edges(spark, sf_dir), method="resource_allocation"
    )


def q_clustering_coefficient(spark, sf_dir):
    return clustering_coefficient(part_cooccurrence_edges(spark, sf_dir))


def q_degree_histogram(spark, sf_dir):
    return (
        _sym(spark, sf_dir)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
        .groupBy(F.floor(F.log2("degree")).cast("long").alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_bfs(spark, sf_dir):
    canon = part_cooccurrence_edges(spark, sf_dir)
    root = canon.agg(
        F.least(F.min("src"), F.min("dst")).alias("m")
    ).collect()[0]["m"]
    return bfs(symmetrize(canon), root=int(root))


def q_bfs_parents(spark, sf_dir):
    """Deterministic shortest-path tree (algos/bfs.bfs_parents):
    smallest-id predecessor per reached vertex — the proven BFS levels
    plus one edge join and a min-aggregation."""
    from plato_spark.algos.bfs import bfs_parents

    canon = part_cooccurrence_edges(spark, sf_dir)
    root = canon.agg(
        F.least(F.min("src"), F.min("dst")).alias("m")
    ).collect()[0]["m"]
    return bfs_parents(symmetrize(canon), root=int(root))


def q_tree_stat(spark, sf_dir):
    canon = part_cooccurrence_edges(spark, sf_dir)
    root = canon.agg(
        F.least(F.min("src"), F.min("dst")).alias("m")
    ).collect()[0]["m"]
    return tree_stat(symmetrize(canon), root=int(root))


def q_sssp(spark, sf_dir):
    """Weighted shortest paths from the smallest vertex (edge length =
    co-occurrence weight), exact min-plus distances."""
    sym = symmetrize(part_cooccurrence_edges(spark, sf_dir, weighted=True))
    root = sym.agg(F.min("src").alias("m")).collect()[0]["m"]
    return sssp(sym, root=int(root), weight="weight").select(
        "id", F.round("dist", 6).alias("dist")
    )


def q_widest_path(spark, sf_dir):
    """Bottleneck (widest-path) capacity from the smallest vertex over
    the weighted co-occurrence graph — the max-min semiring twin of
    q_sssp's min-plus run (algos/sssp.widest_path): how much evidence
    the WEAKEST link on the best path carries.  Every capacity is an
    exact copy of some edge's integer co-occurrence count (no float
    accumulation); the root's +inf is excluded by contract."""
    from plato_spark.algos.sssp import widest_path

    sym = symmetrize(part_cooccurrence_edges(spark, sf_dir, weighted=True))
    root = sym.agg(F.min("src").alias("m")).collect()[0]["m"]
    return widest_path(sym, root=int(root), weight="weight").select(
        "id", F.round("cap", 6).alias("cap")
    )


def q_temporal_reach(spark, sf_dir):
    """Earliest-arrival time-respecting reachability from the smallest
    user over the co-activity CONTACT list
    (algos/temporal.temporal_reachability over
    functions/events.co_activity_contacts): static reachability on the
    collapsed graph overstates reach by routing through contacts that
    already happened; this is the honest influence cone.  Every arrival
    is an exact integer copy of some contact bucket's epoch micros."""
    from plato_spark.algos.temporal import temporal_reachability
    from plato_spark.functions.events import co_activity_contacts

    contacts = co_activity_contacts(load_table(spark, sf_dir, "events"))
    root = contacts.agg(F.min("src").alias("m")).collect()[0]["m"]
    return temporal_reachability(contacts, root=int(root), time_col="tm")


def q_landmark_stretch(spark, sf_dir):
    """Landmark distance-estimation quality audit
    (algos/closeness.landmark_stretch): histogram of (landmark
    upper-bound estimate - exact hop count) over every (eval root,
    vertex) pair the shared multi-source BFS knows exactly — how loose
    the standard 100-TB distance-query trick is on THIS graph.  Pure
    integer hop arithmetic; no float enters at all."""
    from plato_spark.algos.closeness import landmark_stretch

    return landmark_stretch(part_cooccurrence_edges(spark, sf_dir))


def q_graphlet_census(spark, sf_dir):
    """Non-induced 4-node graphlet census over the co-occurrence graph
    (algos/motifs.graphlet_census): claws / P4 paths / tailed triangles
    / diamonds / 4-cycles, every count a closed-form int64 fold over
    the degree and co-degree tables (ESCAPE decomposition) — no 4-way
    join ever runs."""
    from plato_spark.algos.motifs import graphlet_census

    return graphlet_census(part_cooccurrence_edges(spark, sf_dir))


def q_collective_influence(spark, sf_dir):
    """Collective Influence at radius 2 over the co-occurrence graph
    (algos/motifs.collective_influence): the optimal-percolation
    heuristic — (d_v - 1) x the (d - 1) mass at distance exactly 2,
    with the exact-distance-2 set recovered as codeg-pairs MINUS edges
    (one wedge join + one anti-join, no per-root BFS).  Pure int64."""
    from plato_spark.algos.motifs import collective_influence

    return collective_influence(part_cooccurrence_edges(spark, sf_dir))


def q_trade_reciprocity(spark, sf_dir):
    """Trade reciprocity over the Q7 nation-pair flow matrix: of all
    cross-nation shipped revenue, what share flows on RECIPROCATED
    corridors — min(flow_ab, flow_ba) summed over unordered pairs,
    divided by total flow.  The weighted-digraph sibling of
    dyad_census's reciprocity bit; one full-outer self-merge of the
    flow matrix on the reversed key (one-sided corridors keep 0, never
    drop), exact integer revenue units, ONE division."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cus = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n.withColumnRenamed("n_name", "c_nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", F.col("c_nation").alias("cust_nation"))
    rev = (F.round(F.col("l_extendedprice") * 100, 0).cast("long")
           * F.round((F.lit(1.0) - F.col("l_discount")) * 100, 0)
           .cast("long"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", rev.alias("rev_u"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    flow = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cus), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum("rev_u").cast("long").alias("fu"))
    )
    back = flow.select(F.col("cust_nation").alias("supp_nation"),
                       F.col("supp_nation").alias("cust_nation"),
                       F.col("fu").alias("ru"))
    m = flow.join(back, ["supp_nation", "cust_nation"], "outer").select(
        F.coalesce("fu", F.lit(0)).alias("fu"),
        F.coalesce("ru", F.lit(0)).alias("ru"))
    return m.agg(
        F.sum(F.least("fu", "ru")).cast("long").alias("rec"),
        F.sum("fu").cast("long").alias("tot"),
    ).select(
        # rev_u is cents x 1e2 discount units: half-up to cents first,
        # then one exact /100 to dollars
        (F.expr("(rec + 50) div 100").cast("long") / F.lit(100.0))
        .alias("reciprocated_revenue"),
        (F.expr("(tot + 50) div 100").cast("long") / F.lit(100.0))
        .alias("total_revenue"),
        F.round(F.col("rec") / F.col("tot"), 6).alias("reciprocity"),
    )


def q_hop_histogram(spark, sf_dir):
    """Exact hop-distance histogram over the pinned 64-root sample of
    the major component (the shared multi-source BFS): (dist, n_pairs)
    — the distribution behind effective_diameter's HyperANF estimate,
    here exact for the sampled rows.  Pure integer counts; root
    self-rows (dist 0) included as the sample-size check."""
    from plato_spark.algos.closeness import _sampled_bfs

    _m, _f, visited = _sampled_bfs(
        part_cooccurrence_edges(spark, sf_dir), 64, 10_000)
    return visited.groupBy(F.col("dist").cast("int").alias("dist")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"))


def q_coarsen_stats(spark, sf_dir):
    """Heavy-edge-matching graph coarsening (one multilevel-partitioning
    level): contract every matched pair of the hash-priority maximal
    matching (algos/matching) to its smaller endpoint and report the
    size of the coarse graph — the reduction factor that decides how
    many levels a METIS-style partitioner needs.  Exact integer counts;
    two rounded reduction ratios.  Relabeling is two broadcast map
    joins + one distinct (self-loops drop — a contracted edge's weight
    mass is interior now)."""
    from plato_spark.algos.matching import maximal_matching

    canon = part_cooccurrence_edges(spark, sf_dir).select("src", "dst")
    m = maximal_matching(canon).select("src", "dst")
    # matched map: both endpoints -> src (the smaller id); identity
    # otherwise
    mp = m.select(F.col("src").alias("id"), F.col("src").alias("sv")) \
        .unionByName(m.select(F.col("dst").alias("id"),
                              F.col("src").alias("sv")))
    verts = canon.select(F.col("src").alias("id")).unionByName(
        canon.select(F.col("dst").alias("id"))).distinct()
    full_map = verts.join(mp, "id", "left").select(
        "id", F.coalesce("sv", F.col("id")).alias("sv"))
    relab = (
        canon.join(F.broadcast(full_map.withColumnRenamed("id", "src")
                               .withColumnRenamed("sv", "sa")), "src")
        .join(F.broadcast(full_map.withColumnRenamed("id", "dst")
                          .withColumnRenamed("sv", "sb")), "dst")
        .where(F.col("sa") != F.col("sb"))
        .select(F.least("sa", "sb").alias("s"),
                F.greatest("sa", "sb").alias("t"))
        .distinct()
    )
    n_v = verts.count()
    n_e = canon.count()
    n_m = m.count()
    n_sv = n_v - n_m
    n_se = relab.count()
    base = spark.createDataFrame(
        [(n_v, n_e, n_m, n_sv, n_se)],
        "n_vertices long, n_edges long, n_matched long, "
        "n_super_vertices long, n_super_edges long")
    return base.select(
        "*",
        F.round(F.col("n_super_vertices") / F.col("n_vertices"), 6)
        .alias("vertex_ratio"),
        F.round(F.col("n_super_edges") / F.col("n_edges"), 6)
        .alias("edge_ratio"))


def q_kcore(spark, sf_dir):
    return kcore(part_cooccurrence_edges(spark, sf_dir))


def q_weighted_triangles(spark, sf_dir):
    """One row (n_triangles, min_weight_sum) — weighted triangle mass:
    each triangle contributes its weakest edge's co-occurrence count
    (the bottleneck-evidence cohesion measure; a triangle held together
    by one weak edge counts for little).  Same a<b<c orientation
    discipline as the exact triangle count — three equi-joins over the
    canonical weighted edges, each triangle enumerated exactly once;
    exact integer weights, no division at all."""
    canon = part_cooccurrence_edges(spark, sf_dir, weighted=True)
    ab = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                      F.col("weight").alias("wab"))
    ac = canon.select(F.col("src").alias("a2"), F.col("dst").alias("c"),
                      F.col("weight").alias("wac"))
    bc = canon.select(F.col("src").alias("b2"), F.col("dst").alias("c2"),
                      F.col("weight").alias("wbc"))
    tri = (
        ab.join(ac, (F.col("a") == F.col("a2")) & (F.col("c") > F.col("b")))
        .join(bc, (F.col("b2") == F.col("b")) & (F.col("c2") == F.col("c")))
    )
    return tri.agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles"),
        F.sum(F.least("wab", "wac", "wbc").cast("long")).cast("long")
        .alias("min_weight_sum"),
    )


def q_core_size_curve(spark, sf_dir):
    """k-core size curve: vertices remaining in the k-core per k — the
    peel-depth profile that a flat coreness table hides (where does the
    graph's dense nucleus start?).  Derived from the proven Montresor
    coreness by one histogram + a descending cumulative window over
    <= |distinct coreness| rows (bounded — the offsets-table role)."""
    from pyspark.sql import Window

    kc = kcore(part_cooccurrence_edges(spark, sf_dir))
    hist = kc.groupBy(F.col("coreness")).agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy(F.desc("coreness")).rowsBetween(
        Window.unboundedPreceding, 0)
    return hist.select(
        F.col("coreness").cast("long").alias("k"),
        F.sum("c").over(w).cast("long").alias("n_vertices"),
    )


def q_closeness(spark, sf_dir):
    return closeness_sampled(
        part_cooccurrence_edges(spark, sf_dir), num_samples=CLOSENESS_SAMPLES
    )


def q_hanp(spark, sf_dir):
    sym = symmetrize(part_cooccurrence_edges(spark, sf_dir, weighted=True))
    return hanp(sym, iterations=3, weight="weight")


def q_hyperanf(spark, sf_dir):
    """Portable-HLL ANF curve + avg distance (hyperanf.hpp:61-70,83-195).

    Engine-portable registers (md5 family) make the approximate curve
    value-checkable in DuckDB against the exact reachability ball; the
    Datasketches variant (algos/hyperanf.hyperanf, lg_k=12) remains the
    high-accuracy scale path and is pytest-covered.
    """
    sym = _sym(spark, sf_dir)
    # input is already symmetric -> direction='in' avoids re-symmetrizing
    return hyperanf_portable(sym, steps=HYPERANF_STEPS, direction="in")


def q_louvain(spark, sf_dir):
    # one move level (2 sub-rounds) — the oracle-checkable configuration;
    # the full multi-epoch path is q_louvain_multi below
    return louvain(
        part_cooccurrence_edges(spark, sf_dir, weighted=True),
        outer_iterations=1, inner_iterations=1, weight="weight",
    )


def q_louvain_multi(spark, sf_dir):
    """Multi-epoch Louvain (contract + repeat, louvain.hpp:379-402) on the
    unique-optimum clique-bar fixture; labels canonicalized to the min
    member id so the driver can value-check the recovered partition.
    The sf0.01 co-occurrence multi-epoch run stays pytest-covered."""
    labels = louvain(
        _nation_clique_graph(spark, sf_dir), outer_iterations=2, weight="weight"
    )
    return _canonical_communities(labels, "community")


def q_louvain_density(spark, sf_dir):
    """Fast-unfolding density variant (louvain_density.hpp:194-219,
    example/fast_unfolding_with_density_simple.cc) on the unique-optimum
    clique-bar fixture — the density-modulated objective also peaks at the
    region partition (cliques are maximally dense)."""
    labels = louvain(
        _nation_clique_graph(spark, sf_dir, bridges=False),
        outer_iterations=2, weight="weight", variant="density",
    )
    return _canonical_communities(labels, "community")


def q_betweenness(spark, sf_dir):
    return betweenness_sampled(part_cooccurrence_edges(spark, sf_dir), num_samples=4)


def q_nstep_degrees(spark, sf_dir):
    """Portable-HLL n-hop ball sizes (nstepdegrees.hpp:48-164) —
    value-checked against the exact ball; Datasketches variant stays the
    scale path (pytest-covered, direction in/out/both)."""
    return nstep_degrees_portable(
        _sym(spark, sf_dir), steps=NSTEP_STEPS, direction="out"
    )


def q_nstep_exact(spark, sf_dir):
    return nstep_reach_exact(_sym(spark, sf_dir), steps=2)


def q_random_walks(spark, sf_dir):
    return random_walks(
        _sym(spark, sf_dir), walk_length=5, hash_impl="portable"
    ).select(
        "walk_id", F.size("path").alias("path_len"), F.element_at("path", -1).alias("last")
    )


def q_node2vec_walks(spark, sf_dir):
    return random_walks(
        _sym(spark, sf_dir), walk_length=4, p=0.5, q=2.0, hash_impl="portable"
    ).select(
        "walk_id", F.size("path").alias("path_len"), F.element_at("path", -1).alias("last")
    )


def q_infomap(spark, sf_dir):
    """Infomap (map-equation, infomap.hpp:48-60) on the unique-optimum
    clique-bar fixture — value-checked against the region partition; the
    co-occurrence-graph run stays pytest-covered (determinism, descent,
    clique recovery)."""
    labels = infomap(
        _nation_clique_graph(spark, sf_dir),
        outer_iterations=2, inner_iterations=3, weight="weight",
    )
    return _canonical_communities(labels, "module")


def q_metapath_walks(spark, sf_dir):
    # typed graph: co-order edges typed by order priority class
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).dropDuplicates(["l_orderkey", "l_partkey"])
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", (F.pmod("o_orderkey", F.lit(2)) == 0).alias("even")
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    typed = (
        a.join(b, "k").where(F.col("src") != F.col("dst"))
        .join(o.withColumnRenamed("o_orderkey", "k"), "k")
        .select("src", "dst", F.when(F.col("even"), "even").otherwise("odd").alias("etype"))
        .distinct()
    )
    return metapath_walks(
        typed, ["even", "odd"], walk_length=4, hash_impl="portable"
    ).select(
        "walk_id", F.size("path").alias("path_len"), F.element_at("path", -1).alias("last")
    )


def q_component_histogram(spark, sf_dir):
    """Log2-bucketed FRAGMENT-size distribution after the targeted
    k=200 hub attack on the citation support graph — the shape behind
    hub_removal's (n_components, largest) scalars: the intact graph is
    ONE 500-vertex component (a 1-bucket histogram says nothing), the
    attacked graph shatters into a size spectrum.  Bucket = integer bit
    length of the size (the doclen_histogram lesson — length(bin(n)),
    never libm log2); exact counts."""
    from plato_spark.graph.edges import canonicalize_undirected

    support = canonicalize_undirected(q_reference_graph(spark, sf_dir))
    deg = (
        symmetrize(support).groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    hubs = F.broadcast(
        deg.orderBy(F.desc("deg"), F.asc("id"))
        .limit(FRAGMENT_HIST_K).select("id"))
    sub = support.join(
        hubs.withColumnRenamed("id", "src"), "src", "anti"
    ).join(hubs.withColumnRenamed("id", "dst"), "dst", "anti")
    comp = connected_components(sub)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz"))
    return (
        sizes.groupBy(F.length(F.bin(F.col("sz"))).cast("int")
                      .alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"),
             F.sum("sz").cast("long").alias("n_vertices"))
    )


def q_component_stats(spark, sf_dir):
    """Per-component vertex/edge counts (cgm stats,
    connected_component.hpp:247-341)."""
    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    comp = connected_components(canon).persist()
    vcnt = comp.groupBy("component").agg(F.count("*").cast("long").alias("n_vertices"))
    ecnt = (
        canon.join(comp.select(F.col("id").alias("src"), "component"), "src")
        .groupBy("component")
        .agg(F.count("*").cast("long").alias("n_edges"))
    )
    return vcnt.join(ecnt, "component", "left").select(
        "component", "n_vertices", F.coalesce("n_edges", F.lit(0)).alias("n_edges")
    )


def q_component_edges(spark, sf_dir):
    """write_all_edges parity: every canonical edge labeled with its
    component (connected_component.hpp:496-538)."""
    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    comp = connected_components(canon)
    return component_edges(canon, comp)


def q_major_component_edges(spark, sf_dir):
    """write_component parity: the largest component's edges
    (connected_component.hpp:388-467; default target = major_label_)."""
    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    comp = connected_components(canon).persist()
    return component_edges(canon, comp, target=major_component(comp)).select(
        "src", "dst"
    )


def q_katz(spark, sf_dir):
    """Katz centrality, fixed 8 iterations on the symmetrized
    co-occurrence graph (beyond-reference link analysis; unrolled-SQL
    oracle, same discipline as pagerank). alpha = 1/512: an exact binary
    fraction (the multiplication is float-exact on both engines) chosen
    so alpha * max_degree < 1 at gate scale — scores stay O(1) and the
    6dp rounding sits far above cross-engine summation ulp drift (at
    alpha=0.1 scores reached ~4e8, where ulp-level sum-order differences
    crossed rounding boundaries)."""
    from plato_spark.algos.katz import katz

    return katz(_sym(spark, sf_dir), alpha=1.0 / 512, beta=1.0,
                iterations=KATZ_ITERS)


def q_assortativity(spark, sf_dir):
    """Newman degree assortativity of the co-occurrence graph (1 row)."""
    from plato_spark.graph.edges import degree_assortativity

    return degree_assortativity(part_cooccurrence_edges(spark, sf_dir))


def q_effective_diameter(spark, sf_dir):
    """HyperANF read-outs (Boldi-Rosa-Vigna): interpolated 0.9-effective
    diameter + average distance from the portable-HLL ANF curve."""
    from plato_spark.algos.hll_portable import effective_diameter_portable

    sym = _sym(spark, sf_dir)
    return effective_diameter_portable(
        sym, steps=HYPERANF_STEPS, q=0.9, direction="in"
    )


def q_trussness(spark, sf_dir):
    """Per-edge truss number (capped decomposition, k_max=6) — the edge
    analog of coreness, phased incremental support-peel."""
    from plato_spark.algos.ktruss import truss_decomposition

    return truss_decomposition(
        part_cooccurrence_edges(spark, sf_dir), k_max=6
    )


def q_eigenvector(spark, sf_dir):
    """Eigenvector centrality — 5 L1-normalized power steps (the
    undamped member of the spectral family beside pagerank/katz/hits;
    in-plan normalization, zero per-iteration driver actions)."""
    from plato_spark.algos.eigenvector import eigenvector_centrality

    return eigenvector_centrality(
        part_cooccurrence_edges(spark, sf_dir), iterations=5
    )


def q_pseudo_diameter(spark, sf_dir):
    """Double-sweep BFS diameter lower bound (exact-integer companion of
    the HyperANF effective-diameter estimate)."""
    from plato_spark.algos.bfs import pseudo_diameter

    return pseudo_diameter(part_cooccurrence_edges(spark, sf_dir))


def q_closeness_exact(spark, sf_dir):
    """Exact Bavelas closeness (reference bavelas.hpp:55-66, a per-root
    API the reference ships no all-vertices driver for) over a pinned
    64-root set — closes the last cnc sub-variant; see the O(V*E) scale
    fence in algos/closeness.closeness_exact."""
    from plato_spark.algos.closeness import closeness_exact

    return closeness_exact(
        part_cooccurrence_edges(spark, sf_dir), num_roots=64
    )


def q_eccentricity(spark, sf_dir):
    """Exact per-root eccentricity + reached count over the same pinned
    64-root multi-source BFS as closeness_exact
    (algos/closeness.eccentricity): radius upper bound / diameter lower
    bound read-outs, exact integers end to end."""
    from plato_spark.algos.closeness import eccentricity

    return eccentricity(part_cooccurrence_edges(spark, sf_dir), num_roots=64)


def q_harmonic(spark, sf_dir):
    """Radius-truncated sampled harmonic centrality (disconnected-robust
    closeness variant) — same deterministic sample policy as closeness."""
    from plato_spark.algos.closeness import harmonic_sampled

    return harmonic_sampled(
        part_cooccurrence_edges(spark, sf_dir),
        num_samples=CLOSENESS_SAMPLES, radius=5,
    )


def q_scc(spark, sf_dir):
    """Directed strongly connected components (FW-Min coloring) on the
    planted-truth digraph (_planted_digraph): the engine runs the full
    trim + coloring + backward-extraction decomposition while the oracle
    is arithmetic (scc(r) = 4*(r//4))."""
    from plato_spark.algos.scc import strongly_connected_components

    edges, verts = _planted_digraph(spark, sf_dir)
    return strongly_connected_components(edges, vertices=verts)


def q_scc_condensation(spark, sf_dir):
    """Condensation DAG of the planted digraph (algos/scc
    condensation_edges): full SCC decomposition, then contract each
    component to its label and keep the distinct inter-component edges.
    Ground truth is arithmetic — the condensation's edges are exactly
    the planted cross edges (4b -> 4b+4 where md5-hash selects b as a
    source and not b+1) — while the engine must actually decompose the
    graph and relabel both edge endpoints."""
    from plato_spark.algos.scc import condensation_edges

    edges, _verts = _planted_digraph(spark, sf_dir)
    return condensation_edges(edges)


def q_transitivity(spark, sf_dir):
    """Global clustering coefficient 3T/W (algos/triangles.transitivity)
    — one oriented triangle pass + one degree fold, exact integers +
    one rounded division."""
    from plato_spark.algos.triangles import transitivity

    return transitivity(part_cooccurrence_edges(spark, sf_dir))


def q_avg_neighbor_degree(spark, sf_dir):
    """Per-vertex average neighbor degree knn(v) (graph/edges
    avg_neighbor_degree) — the vertex-level degree-mixing profile whose
    scalar summary is the assortativity query."""
    from plato_spark.graph.edges import avg_neighbor_degree

    return avg_neighbor_degree(part_cooccurrence_edges(spark, sf_dir))


def q_partition_cut(spark, sf_dir):
    """Edge-cut audit of explicit mod vs contiguous-range vertex
    placement at 32 blocks (graph/partitioning.partition_cut_audit) —
    measures the superstep network cost the north rule's partitioning
    choices trade on."""
    from plato_spark.graph.partitioning import partition_cut_audit

    return partition_cut_audit(part_cooccurrence_edges(spark, sf_dir), 32)


def q_degree_gini(spark, sf_dir):
    """Gini coefficient of the degree distribution (graph/edges
    degree_gini) — the scalar skew audit behind hub/salting policy;
    rank-weighted sum folded over the degree HISTOGRAM so the only
    window runs over distinct degree values."""
    from plato_spark.graph.edges import degree_gini

    return degree_gini(part_cooccurrence_edges(spark, sf_dir))


def q_sinkhorn_mixing(spark, sf_dir):
    """Sinkhorn-Knopp scaling of the (source x lang) doc-count matrix
    toward all-ones marginals (functions/sampling
    sinkhorn_mixing_weights) — the training-blend balancing step;
    5 pinned alternating normalizations, unrolled-SQL oracle."""
    from plato_spark.functions.sampling import sinkhorn_mixing_weights

    return sinkhorn_mixing_weights(
        load_table(spark, sf_dir, "documents"), iterations=SINKHORN_ITERS
    )


def q_four_cliques(spark, sf_dir):
    """Exact K4 count (algos/triangles.four_clique_count) — the
    denser-motif leg past triangles and motif_census's 4-cycles."""
    from plato_spark.algos.triangles import four_clique_count

    return four_clique_count(part_cooccurrence_edges(spark, sf_dir))


def q_dyad_census(spark, sf_dir):
    """Dyad census + reciprocity (algos/dyads.dyad_census) over the
    planted citation digraph of q_reference_graph — mutual / asymmetric
    / null pair counts with the full document table as the vertex
    universe (isolated docs count toward null dyads)."""
    from plato_spark.algos.dyads import dyad_census

    edges = q_reference_graph(spark, sf_dir)
    verts = load_table(spark, sf_dir, "documents").select("doc_id")
    return dyad_census(edges, verts)


def q_local_bridges(spark, sf_dir):
    """Granovetter local bridges (algos/triangles.local_bridges): edges
    whose endpoints share zero common neighbors — the weak-tie
    shortcuts a partitioner must keep.  Runs on the (undirected)
    planted citation graph: the dense co-occurrence graph closes every
    wedge, so its bridge set is empty — the sparse hash-wired citation
    topology actually exercises the filter."""
    from plato_spark.algos.triangles import local_bridges
    from plato_spark.graph.edges import canonicalize_undirected

    e = q_reference_graph(spark, sf_dir)
    return local_bridges(canonicalize_undirected(e))


def q_hub_removal(spark, sf_dir):
    """Targeted-attack tolerance curve (algos/percolation
    .hub_removal_sweep, Albert-Jeong-Barabási): delete the top-k degree
    hubs of the citation support graph and watch the giant component
    degrade (k=100 first fragments it: 6 components; k=200 shatters it:
    44 components, largest 32 of 230).  The vertex-removal twin of the
    weight-threshold percolation sweep; one hash-min WCC per k."""
    from plato_spark.algos.percolation import hub_removal_sweep
    from plato_spark.graph.edges import canonicalize_undirected

    support = canonicalize_undirected(q_reference_graph(spark, sf_dir))
    return hub_removal_sweep(support, ks=HUB_SWEEP_KS)


def q_random_removal(spark, sf_dir):
    """Random-failure tolerance curve (algos/percolation
    .random_removal_sweep): delete k hash-uniform vertices per sweep
    point — the Albert-Jeong-Barabási PAIR with hub_removal (scale-free
    graphs: robust to random failure, fragile to targeted attack; the
    gap between the two curves is the finding)."""
    from plato_spark.algos.percolation import random_removal_sweep
    from plato_spark.graph.edges import canonicalize_undirected

    support = canonicalize_undirected(q_reference_graph(spark, sf_dir))
    return random_removal_sweep(support, ks=HUB_SWEEP_KS)


def q_powerlaw_alpha(spark, sf_dir):
    """Discrete power-law exponent of the degree distribution
    (graph/edges.powerlaw_alpha, Clauset-Shalizi-Newman MLE at pinned
    kmin=2) — the scale-free audit behind every hub/salting policy:
    alpha in [2,3] means hub degree grows with graph size and skew
    handling is structural.  Log-sum folds over the degree histogram."""
    from plato_spark.graph.edges import powerlaw_alpha

    return powerlaw_alpha(part_cooccurrence_edges(spark, sf_dir), kmin=2)


def q_degree_centralization(spark, sf_dir):
    """Freeman degree centralization (graph/edges.degree_centralization)
    — single-hub dominance on [0,1] (1.0 = perfect star), the direct
    'does ONE vertex bottleneck every superstep' audit beside
    degree_gini's whole-distribution inequality.  Numerator is the
    exact int64 identity n*d_max - sum(d); one division."""
    from plato_spark.graph.edges import degree_centralization

    return degree_centralization(part_cooccurrence_edges(spark, sf_dir))


QUERIES = {
    "closeness_exact": q_closeness_exact,
    "infomap": q_infomap,
    "spectral_coord": q_spectral_coord,
    "katz": q_katz,
    "assortativity": q_assortativity,
    "harmonic_sampled": q_harmonic,
    "scc": q_scc,
    "trussness": q_trussness,
    "effective_diameter": q_effective_diameter,
    "link_preferential": q_link_preferential,
    "link_resource_alloc": q_link_resource_alloc,
    "widest_path": q_widest_path,
    "temporal_reach": q_temporal_reach,
    "landmark_stretch": q_landmark_stretch,
    "graphlet_census": q_graphlet_census,
    "collective_influence": q_collective_influence,
    "trade_reciprocity": q_trade_reciprocity,
    "hop_histogram": q_hop_histogram,
    "coarsen_stats": q_coarsen_stats,
    "hub_removal": q_hub_removal,
    "eccentricity": q_eccentricity,
    "segment_pivot": q_segment_pivot,
    "lpa_weighted": q_lpa_weighted,
    "random_removal": q_random_removal,
    "component_histogram": q_component_histogram,
    "bfs_parents": q_bfs_parents,
    "core_size_curve": q_core_size_curve,
    "weighted_triangles": q_weighted_triangles,
    "scc_condensation": q_scc_condensation,
    "reference_graph": q_reference_graph,
    "transitivity": q_transitivity,
    "avg_neighbor_degree": q_avg_neighbor_degree,
    "partition_cut": q_partition_cut,
    "degree_gini": q_degree_gini,
    "sinkhorn_mixing": q_sinkhorn_mixing,
    "four_cliques": q_four_cliques,
    "dyad_census": q_dyad_census,
    "local_bridges": q_local_bridges,
    "eigenvector": q_eigenvector,
    "pseudo_diameter": q_pseudo_diameter,
    "pagerank": q_pagerank,
    "pagerank_spmv": q_pagerank_spmv,
    "pagerank_weighted": q_pagerank_weighted,
    "personalized_pagerank": q_ppr,
    "wcc": q_wcc,
    "wcc_jump": q_wcc_jump,
    "wcc_incremental": q_wcc_incremental,
    "hits": q_hits,
    "lpa": q_lpa,
    "pagerank_ref_defaults": q_pagerank_ref_defaults,
    "lpa_ref_defaults": q_lpa_ref_defaults,
    "triangle_count": q_triangle_count,
    "clustering_coefficient": q_clustering_coefficient,
    "bfs": q_bfs,
    "kcore": q_kcore,
    "sssp": q_sssp,
    "ktruss": q_ktruss,
    "hanp": q_hanp,
    "hyperanf": q_hyperanf,
    "louvain": q_louvain,
    "betweenness_sampled": q_betweenness,
    "nstep_degrees": q_nstep_degrees,
    "random_walks": q_random_walks,
    "component_stats": q_component_stats,
    "co_occurrence_edges": q_edges,
    "degrees": q_degrees,
    "graph_stats": q_graph_stats,
    "degree_histogram": q_degree_histogram,
    "common_neighbors": q_common_neighbors,
    "common_neighbor_lists": q_common_neighbor_lists,
    "link_adamic_adar": q_link_adamic_adar,
    "tree_stat": q_tree_stat,
    "closeness_sampled": q_closeness,
    "louvain_multi": q_louvain_multi,
    "louvain_density": q_louvain_density,
    "nstep_exact": q_nstep_exact,
    "node2vec_walks": q_node2vec_walks,
    "metapath_walks": q_metapath_walks,
    "component_edges": q_component_edges,
    "major_component_edges": q_major_component_edges,
    "powerlaw_alpha": q_powerlaw_alpha,
    "degree_centralization": q_degree_centralization,
}


ORACLES = {
    "closeness_exact": _sql_closeness_exact(64, bfs_iters=6),
    "infomap": NATION_PARTITION_SQL.format(out="module"),
    "spectral_coord": _sql_spectral(SPECTRAL_ROUNDS),
    "katz": _sql_katz(KATZ_ITERS, alpha=1.0 / 512),
    "assortativity": SQL_GRAPH_PREFIX + """
            SELECT round(corr(CAST(d1.deg AS DOUBLE), CAST(d2.deg AS DOUBLE)), 6)
                   AS assortativity
            FROM edges e JOIN deg d1 ON e.src = d1.id
                         JOIN deg d2 ON e.dst = d2.id""",
    "harmonic_sampled": _sql_harmonic(),
    "scc": """
            WITH dd AS (SELECT DISTINCT doc_id FROM documents),
            d AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1
                              AS BIGINT) AS r FROM dd)
            SELECT r AS id, CAST(4 * (r // 4) AS BIGINT) AS scc FROM d""",
    "trussness": _sql_trussness(6),
    "effective_diameter": sql_effective_diameter_oracle(
            HYPERANF_STEPS, SQL_GRAPH_PREFIX.rstrip(), q=0.9
        ),
    "link_preferential": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst,
                    CAST(du.deg * dv.deg AS BIGINT) AS score
             FROM canon c
             JOIN deg du ON c.src = du.id JOIN deg dv ON c.dst = dv.id""",
    "link_resource_alloc": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst,
               -- int64 picounit terms + integer HALF_UP readout: the
               -- order-free twin of the engine's quantized sum (a raw
               -- double sum split engines on one 6dp half-tie pair
               -- at sf0.1)
               CAST((COALESCE(t.su, 0) + 500000)
                    - (COALESCE(t.su, 0) + 500000) % 1000000 AS BIGINT)
                 / 1000000 / 1000000.0 AS score
             FROM canon c LEFT JOIN (
               SELECT a.src AS u, b.src AS v,
                      CAST(sum(CAST(round(1000000000000.0 / d.deg, 0)
                                    AS BIGINT)) AS BIGINT) AS su
               FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
               JOIN deg d ON d.id = a.dst
               GROUP BY a.src, b.src) t ON c.src = t.u AND c.dst = t.v""",
    "widest_path": _sql_widest(),
    "temporal_reach": _sql_temporal_reach(),
    "landmark_stretch": _sql_landmark_stretch(),
    "graphlet_census": _sql_graphlet_census(),
    "collective_influence": SQL_GRAPH_PREFIX + """, cdp AS MATERIALIZED (
  SELECT DISTINCT a.dst AS u, b.dst AS v
  FROM edges a JOIN edges b ON a.src = b.src AND a.dst < b.dst),
d2 AS MATERIALIZED (
  SELECT cdp.u, cdp.v FROM cdp
  LEFT JOIN canon c ON cdp.u = c.src AND cdp.v = c.dst
  WHERE c.src IS NULL),
pairs AS (SELECT u, v FROM d2 UNION ALL SELECT v AS u, u AS v FROM d2),
fs AS (SELECT p.u AS id, CAST(sum(dg.deg - 1) AS BIGINT) AS fs
       FROM pairs p JOIN deg dg ON p.v = dg.id GROUP BY p.u)
SELECT d.id, CAST((d.deg - 1) * coalesce(fs.fs, 0) AS BIGINT) AS ci
FROM deg d LEFT JOIN fs ON d.id = fs.id ORDER BY d.id""",
    "trade_reciprocity": """
WITH n AS (SELECT n_nationkey, n_name FROM nation),
sup AS (SELECT s_suppkey, n.n_name AS supp_nation
        FROM supplier s JOIN n ON s.s_nationkey = n.n_nationkey),
cus AS (SELECT c_custkey, n.n_name AS cust_nation
        FROM customer c JOIN n ON c.c_nationkey = n.n_nationkey),
li AS (SELECT l_orderkey, l_suppkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1.0 - l_discount) * 100, 0) AS BIGINT) AS rev_u
       FROM lineitem),
flow AS (SELECT sup.supp_nation, cus.cust_nation,
           CAST(sum(li.rev_u) AS BIGINT) AS fu
         FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
         JOIN sup ON li.l_suppkey = sup.s_suppkey
         JOIN cus ON o.o_custkey = cus.c_custkey
         WHERE sup.supp_nation <> cus.cust_nation
         GROUP BY 1, 2),
m AS (SELECT coalesce(f.fu, 0) AS fu, coalesce(b.fu, 0) AS ru
      FROM flow f FULL OUTER JOIN flow b
        ON f.supp_nation = b.cust_nation
       AND f.cust_nation = b.supp_nation),
s AS (SELECT CAST(sum(least(fu, ru)) AS BIGINT) AS rec,
             CAST(sum(fu) AS BIGINT) AS tot FROM m)
SELECT CAST((rec + 50) // 100 AS BIGINT) / 100.0
         AS reciprocated_revenue,
       CAST((tot + 50) // 100 AS BIGINT) / 100.0 AS total_revenue,
       round(CAST(rec AS DOUBLE) / tot, 6) AS reciprocity
FROM s""",
    "hop_histogram": _sql_multi_bfs_ctes(64, 6) + """
SELECT CAST(dist AS INTEGER) AS dist, CAST(count(*) AS BIGINT) AS n_pairs
FROM m6 GROUP BY dist ORDER BY dist""",
    "coarsen_stats": f"""
WITH li2 AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
canon2 AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM li2 a JOIN li2 b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey),
verts2 AS MATERIALIZED (
  SELECT DISTINCT src AS id FROM canon2
  UNION SELECT DISTINCT dst FROM canon2),
m AS MATERIALIZED (
  SELECT src, dst FROM ({_sql_matching(12)})),
mp AS (SELECT src AS id, src AS sv FROM m
       UNION ALL SELECT dst AS id, src AS sv FROM m),
fm AS MATERIALIZED (
  SELECT v.id, coalesce(mp.sv, v.id) AS sv
  FROM verts2 v LEFT JOIN mp ON v.id = mp.id),
relab AS (SELECT DISTINCT least(a.sv, b.sv) AS s,
                 greatest(a.sv, b.sv) AS t
          FROM canon2 c JOIN fm a ON c.src = a.id
          JOIN fm b ON c.dst = b.id
          WHERE a.sv <> b.sv),
s AS (SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM verts2) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM canon2) AS n_edges,
  (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_matched,
  (SELECT CAST(count(*) AS BIGINT) FROM relab) AS n_super_edges)
SELECT n_vertices, n_edges, n_matched,
       CAST(n_vertices - n_matched AS BIGINT) AS n_super_vertices,
       n_super_edges,
       round(CAST(n_vertices - n_matched AS DOUBLE) / n_vertices, 6)
         AS vertex_ratio,
       round(CAST(n_super_edges AS DOUBLE) / n_edges, 6) AS edge_ratio
FROM s""",
    "hub_removal": _sql_hub_removal(HUB_SWEEP_KS, HUB_SWEEP_SQL_ITERS),
    "eccentricity": _sql_eccentricity(64, bfs_iters=6),
    "segment_pivot": """
SELECT n.n_name AS nation,
       CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END)
            AS BIGINT) AS automobile,
       CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
            AS BIGINT) AS building,
       CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END)
            AS BIGINT) AS furniture,
       CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END)
            AS BIGINT) AS household,
       CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END)
            AS BIGINT) AS machinery
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY nation""",
    "lpa_weighted": _sql_lpa(LPA_ITERS, weighted=True),
    "random_removal": _sql_random_removal(HUB_SWEEP_KS,
                                              HUB_SWEEP_SQL_ITERS),
    "component_histogram": _sql_component_histogram(
            HUB_SWEEP_SQL_ITERS),
    "bfs_parents": _sql_bfs_parents(),
    "core_size_curve": _sql_core_size_curve(),
    "weighted_triangles": _sql_weighted_triangles(),
    "scc_condensation": f"""
            WITH dd AS (SELECT DISTINCT doc_id FROM documents),
            d AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1
                              AS BIGINT) AS r FROM dd),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
            blk AS (SELECT DISTINCT (r // 4) AS b FROM d)
            SELECT CAST(4 * b AS BIGINT) AS src_scc,
                   CAST(4 * b + 4 AS BIGINT) AS dst_scc
            FROM blk, nn
            WHERE ({H1_SQL.format(s="('sccx|' || CAST(b AS VARCHAR))")} % 3 = 0)
              AND NOT ({H1_SQL.format(s="('sccx|' || CAST(b + 1 AS VARCHAR))")} % 3 = 0)
              AND 4 * (b + 1) < n""",
    "reference_graph": _sql_reference_graph(),
    "transitivity": SQL_GRAPH_PREFIX
        + """, tri AS (SELECT CAST(count(*) AS BIGINT) AS t
                FROM canon a JOIN canon b ON a.dst = b.src
                JOIN canon c ON c.src = a.src AND c.dst = b.dst),
            wd AS (SELECT CAST(sum(deg * (deg - 1)) // 2 AS BIGINT) AS w
                   FROM deg)
            SELECT t AS n_triangles, w AS n_wedges,
                   CASE WHEN w > 0
                        THEN round(3.0 * t / CAST(w AS DOUBLE), 6)
                        ELSE 0.0 END AS transitivity
            FROM tri, wd""",
    "avg_neighbor_degree": SQL_GRAPH_PREFIX
        + """SELECT e.src AS id, d0.deg,
                    round(CAST(sum(dn.deg) AS DOUBLE)
                          / CAST(d0.deg AS DOUBLE), 6) AS avg_nbr_deg
             FROM edges e JOIN deg dn ON e.dst = dn.id
             JOIN deg d0 ON e.src = d0.id
             GROUP BY e.src, d0.deg""",
    "partition_cut": SQL_GRAPH_PREFIX
        + """, mxx AS (SELECT CAST(max(id) AS BIGINT) AS mx FROM verts),
            ww AS (SELECT (mx // 32) + 1 AS w FROM mxx),
            s AS (
              SELECT 'mod' AS strategy,
                     CASE WHEN c.src % 32 = c.dst % 32
                          THEN 1 ELSE 0 END AS i
              FROM canon c
              UNION ALL
              SELECT 'range',
                     CASE WHEN c.src // w = c.dst // w THEN 1 ELSE 0 END
              FROM canon c, ww)
            SELECT strategy, CAST(sum(i) AS BIGINT) AS n_internal,
                   CAST(count(*) - sum(i) AS BIGINT) AS n_cut,
                   round(CAST(count(*) - sum(i) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS cut_ratio
            FROM s GROUP BY strategy""",
    "degree_gini": SQL_GRAPH_PREFIX
        + """, hist AS (SELECT deg AS d, CAST(count(*) AS BIGINT) AS c
                        FROM deg GROUP BY deg),
            h2 AS (SELECT d, c,
                     CAST(COALESCE(sum(c) OVER (ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS o
                   FROM hist),
            a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                         CAST(sum(d * c) AS BIGINT) AS t,
                         CAST(sum(d * (c * o + (c * (c + 1)) // 2))
                              AS BIGINT) AS s
                  FROM h2)
            SELECT n AS n_vertices, t AS total_degree,
                   round((2.0 * s) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
                         - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE),
                         6) AS gini
            FROM a""",
    "sinkhorn_mixing": _sql_sinkhorn(SINKHORN_ITERS),
    "four_cliques": SQL_GRAPH_PREFIX
        + """SELECT CAST(count(*) AS BIGINT) AS four_cliques
             FROM canon ab
             JOIN canon ac ON ac.src = ab.src AND ac.dst > ab.dst
             JOIN canon bc ON bc.src = ab.dst AND bc.dst = ac.dst
             JOIN canon cd ON cd.src = ac.dst
             JOIN canon bd ON bd.src = ab.dst AND bd.dst = cd.dst
             JOIN canon ad ON ad.src = ab.src AND ad.dst = cd.dst""",
    "dyad_census": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            m AS (SELECT CAST(count(*) AS BIGINT) AS m2
                  FROM g a JOIN g b ON a.src = b.dst AND a.dst = b.src),
            t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM g),
            v AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
                  FROM documents)
            SELECT CAST(m2 // 2 AS BIGINT) AS mutual,
                   CAST(tot - m2 AS BIGINT) AS asym,
                   CAST(n * (n - 1) // 2 - m2 // 2 - (tot - m2) AS BIGINT)
                     AS nulls,
                   CASE WHEN tot > 0
                        THEN round(CAST(m2 AS DOUBLE) / tot, 6)
                        ELSE 0.0 END AS reciprocity
            FROM m, t, v""",
    "local_bridges": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            cg AS MATERIALIZED (
              SELECT DISTINCT least(src, dst) AS src,
                              greatest(src, dst) AS dst
              FROM g WHERE src != dst),
            sym AS MATERIALIZED (
              SELECT src, dst FROM cg UNION SELECT dst, src FROM cg)
            SELECT c.src, c.dst FROM cg c
            WHERE NOT EXISTS (
              SELECT 1 FROM sym x JOIN sym y ON x.dst = y.dst
              WHERE x.src = c.src AND y.src = c.dst)""",
    "eigenvector": _sql_eigenvector(5),
    "pseudo_diameter": _sql_pseudo_diameter(8),
    "pagerank": _sql_pagerank(PR_ITERS),
    "pagerank_spmv": _sql_pagerank(PR_ITERS),
    "pagerank_weighted": _sql_pagerank(PRW_ITERS, weighted=True),
    "personalized_pagerank": _sql_ppr(PPR_ITERS, n_sources=PPR_SOURCES),
    "wcc": _sql_wcc(WCC_SQL_ITERS),
    "wcc_jump": _sql_wcc(WCC_SQL_ITERS),
    "wcc_incremental": _sql_wcc(WCC_SQL_ITERS),
    "hits": _sql_hits(5),
    "lpa": _sql_lpa(LPA_ITERS),
    "pagerank_ref_defaults": _sql_pagerank_ref_defaults(),
    "lpa_ref_defaults": _sql_lpa(LPA_REF_ITERS),
    "triangle_count": SQL_GRAPH_PREFIX
        + """SELECT CAST(count(*) AS BIGINT) AS triangles
             FROM canon a JOIN canon b ON a.dst = b.src
             JOIN canon c ON c.src = a.src AND c.dst = b.dst""",
    "clustering_coefficient": SQL_GRAPH_PREFIX
        + """, tri AS MATERIALIZED (
  SELECT a.src AS x, a.dst AS y, b.dst AS z
  FROM canon a JOIN canon b ON a.dst = b.src
  JOIN canon c ON c.src = a.src AND c.dst = b.dst),
corners AS (SELECT x AS id FROM tri UNION ALL
            SELECT y AS id FROM tri UNION ALL
            SELECT z AS id FROM tri),
tv AS (SELECT id, CAST(count(*) AS BIGINT) AS t FROM corners GROUP BY id)
SELECT v.id,
       CASE WHEN d.deg >= 2
            THEN round(2.0 * COALESCE(tv.t, 0) / (d.deg * (d.deg - 1)), 6)
            ELSE 0.0 END AS lcc
FROM verts v JOIN deg d ON v.id = d.id LEFT JOIN tv ON v.id = tv.id""",
    "bfs": _sql_bfs_query(),
    "kcore": _sql_kcore(),
    "sssp": _sql_sssp(),
    "ktruss": _sql_ktruss(5),
    "hanp": _sql_hanp(),
    "hyperanf": sql_hyperanf_oracle(
            HYPERANF_STEPS, SQL_GRAPH_PREFIX.rstrip()
        ),
    "louvain": _sql_louvain(),
    "betweenness_sampled": _sql_betweenness(),
    "nstep_degrees": sql_nstep_oracle(
            NSTEP_STEPS, SQL_GRAPH_PREFIX.rstrip()
        ),
    "random_walks": _sql_random_walks(5),
    "component_stats": _sql_wcc(WCC_SQL_ITERS).replace(
            f"\nSELECT id, lab AS component FROM l{WCC_SQL_ITERS} ORDER BY id",
            f""",
vc AS (SELECT lab AS component, CAST(count(*) AS BIGINT) AS n_vertices
       FROM l{WCC_SQL_ITERS} GROUP BY lab),
ec AS (SELECT l.lab AS component, CAST(count(*) AS BIGINT) AS n_edges
       FROM canon c JOIN l{WCC_SQL_ITERS} l ON c.src = l.id GROUP BY l.lab)
SELECT vc.component, vc.n_vertices, COALESCE(ec.n_edges, 0) AS n_edges
FROM vc LEFT JOIN ec ON vc.component = ec.component""",
        ),
    "co_occurrence_edges": SQL_GRAPH_PREFIX
        + "SELECT src, dst, weight FROM canon ORDER BY src, dst",
    "degrees": SQL_GRAPH_PREFIX
        + "SELECT src AS id, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY src",
    "graph_stats": SQL_GRAPH_PREFIX
        + """SELECT (SELECT CAST(count(*) AS BIGINT) FROM verts) AS n_vertices,
                    (SELECT CAST(max(id) AS BIGINT) FROM verts) AS max_id,
                    (SELECT CAST(count(*) AS BIGINT) FROM canon) AS n_edges""",
    "degree_histogram": SQL_GRAPH_PREFIX
        + """SELECT CAST(floor(log2(deg)) AS BIGINT) AS bucket,
                    CAST(count(*) AS BIGINT) AS n
             FROM deg GROUP BY 1""",
    "common_neighbors": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst, CAST(COALESCE(t.cnt, 0) AS BIGINT) AS common_count
             FROM canon c LEFT JOIN (
               SELECT a.src AS u, b.src AS v, count(*) AS cnt
               FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
               GROUP BY a.src, b.src) t ON c.src = t.u AND c.dst = t.v""",
    "common_neighbor_lists": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst,
                    COALESCE(array_to_string(t.l, ','), '') AS common
             FROM canon c LEFT JOIN (
               SELECT a.src AS u, b.src AS v, list(a.dst ORDER BY a.dst) AS l
               FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
               GROUP BY a.src, b.src) t ON c.src = t.u AND c.dst = t.v""",
    "link_adamic_adar": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst,
               CAST((COALESCE(t.su, 0) + 500000)
                    - (COALESCE(t.su, 0) + 500000) % 1000000 AS BIGINT)
                 / 1000000 / 1000000.0 AS score
             FROM canon c LEFT JOIN (
               SELECT a.src AS u, b.src AS v,
                      CAST(sum(CAST(round(1000000000000.0 / ln(d.deg), 0)
                                    AS BIGINT)) AS BIGINT) AS su
               FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
               JOIN deg d ON d.id = a.dst
               GROUP BY a.src, b.src) t ON c.src = t.u AND c.dst = t.v""",
    "tree_stat": _sql_tree_stat(),
    "closeness_sampled": _sql_closeness(),
    "louvain_multi": NATION_PARTITION_SQL.format(out="community"),
    "louvain_density": NATION_PARTITION_SQL.format(out="community"),
    "nstep_exact": SQL_GRAPH_PREFIX
        + """, r1 AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
r2 AS MATERIALIZED (
  SELECT DISTINCT a.src, b.dst FROM r1 a JOIN r1 b ON a.dst = b.src),
rr AS (SELECT src, dst FROM r1 UNION SELECT src, dst FROM r2)
SELECT src AS id, CAST(count(DISTINCT dst) AS BIGINT) AS n_reach
FROM rr GROUP BY src""",
    "node2vec_walks": _sql_node2vec_walks(4),
    "metapath_walks": _sql_metapath_walks(4),
    "component_edges": _sql_wcc(WCC_SQL_ITERS).replace(
            f"\nSELECT id, lab AS component FROM l{WCC_SQL_ITERS} ORDER BY id",
            f"""
SELECT l.lab AS component, c.src, c.dst
FROM canon c JOIN l{WCC_SQL_ITERS} l ON c.src = l.id""",
        ),
    "major_component_edges": _sql_wcc(WCC_SQL_ITERS).replace(
            f"\nSELECT id, lab AS component FROM l{WCC_SQL_ITERS} ORDER BY id",
            f""",
maj AS (SELECT lab FROM l{WCC_SQL_ITERS}
        GROUP BY lab ORDER BY count(*) DESC, lab ASC LIMIT 1)
SELECT c.src, c.dst
FROM canon c JOIN l{WCC_SQL_ITERS} l ON c.src = l.id
WHERE l.lab = (SELECT lab FROM maj)""",
        ),
    "powerlaw_alpha": SQL_GRAPH_PREFIX
        + """, hist AS (SELECT deg AS v, CAST(count(*) AS BIGINT) AS c
                        FROM deg GROUP BY deg),
            a AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_tail,
                         CAST(max(v) AS BIGINT) AS max_degree,
                         sum(CAST(c AS DOUBLE)
                             * ln(CAST(v AS DOUBLE) / 1.5)) AS logsum
                  FROM hist WHERE v >= 2)
            SELECT CAST(2 AS BIGINT) AS kmin, n_tail, max_degree,
                   CASE WHEN n_tail > 0
                        THEN round(1.0 + n_tail / logsum, 6) END AS alpha,
                   CASE WHEN n_tail > 0
                        THEN round((n_tail / logsum)
                                   / sqrt(CAST(n_tail AS DOUBLE)), 6)
                   END AS sigma
            FROM a""",
    "degree_centralization": SQL_GRAPH_PREFIX
        + """, a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(max(deg) AS BIGINT) AS mx,
                      CAST(sum(deg) AS BIGINT) AS tot FROM deg)
            SELECT n AS n_vertices, mx AS max_degree,
                   CASE WHEN n > 2
                        THEN round(CAST(n * mx - tot AS DOUBLE)
                                   / (CAST(n - 1 AS DOUBLE)
                                      * CAST(n - 2 AS DOUBLE)), 6)
                   END AS centralization
            FROM a""",
}
