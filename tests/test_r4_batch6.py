"""Round-4 batch 6: categorical attribute mixing / assortativity,
day-N retention cohorts."""

from datetime import datetime

from plato_spark.algos.mixing import (
    attribute_assortativity,
    attribute_mixing_matrix,
)
from plato_spark.functions.events import retention_cohorts


def _labels(spark, pairs):
    return spark.createDataFrame(
        [(int(i), s) for i, s in pairs], "id long, label string"
    )


def _edges(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )


AB = [(0, "A"), (1, "A"), (2, "B"), (3, "B")]


def test_mixing_matrix_counts(spark):
    m = attribute_mixing_matrix(
        _edges(spark, [(0, 1), (0, 2), (2, 3), (3, 0), (3, 0)]),
        _labels(spark, AB),
    )
    got = {(r.src_label, r.dst_label): r.edges for r in m.collect()}
    # duplicate directed edge counts twice: this is edge-frequency
    # mixing, dedup upstream if multiplicity is unwanted
    assert got == {("A", "A"): 1, ("A", "B"): 1, ("B", "B"): 1, ("B", "A"): 2}


def test_mixing_matrix_drops_unlabeled_endpoints(spark):
    m = attribute_mixing_matrix(
        _edges(spark, [(0, 1), (0, 9), (9, 1)]), _labels(spark, AB)
    )
    got = {(r.src_label, r.dst_label): r.edges for r in m.collect()}
    assert got == {("A", "A"): 1}


def test_assortativity_neutral_square(spark):
    # one edge in every (label, label) cell -> M=4, trace=2, S=8 -> r=0
    r = attribute_assortativity(
        _edges(spark, [(0, 1), (0, 2), (2, 3), (3, 0)]), _labels(spark, AB)
    ).collect()[0]
    assert (r.m_edges, r.same_label, r.sum_rc) == (4, 2, 8)
    assert r.assortativity == 0.0


def test_assortativity_perfect(spark):
    # only within-label edges, two label classes -> r = 1
    r = attribute_assortativity(
        _edges(spark, [(0, 1), (1, 0), (2, 3)]), _labels(spark, AB)
    ).collect()[0]
    assert (r.m_edges, r.same_label, r.sum_rc) == (3, 3, 5)
    assert r.assortativity == 1.0


def test_assortativity_perfectly_disassortative(spark):
    # A<->B only, symmetric marginals -> r = -1
    r = attribute_assortativity(
        _edges(spark, [(0, 2), (2, 0)]), _labels(spark, AB)
    ).collect()[0]
    assert r.assortativity == -1.0


def test_assortativity_single_label_is_null(spark):
    # every endpoint shares one label -> M^2 == S -> undefined -> NULL
    r = attribute_assortativity(
        _edges(spark, [(0, 1), (1, 0)]),
        _labels(spark, [(0, "A"), (1, "A")]),
    ).collect()[0]
    assert (r.m_edges, r.same_label, r.sum_rc) == (2, 2, 4)
    assert r.assortativity is None


def test_assortativity_empty_edges(spark):
    r = attribute_assortativity(
        _edges(spark, []), _labels(spark, AB)
    ).collect()[0]
    assert (r.m_edges, r.same_label, r.sum_rc) == (0, 0, 0)
    assert r.assortativity is None


def _ev(spark, rows):
    return spark.createDataFrame(
        [(int(u), datetime(2024, 1, d, h)) for u, d, h in rows],
        "user_id long, ts timestamp",
    )


def test_retention_matrix(spark):
    ev = _ev(
        spark,
        [
            (1, 1, 9), (1, 2, 9), (1, 4, 9),   # u1: cohort Jan1, +0/+1/+3
            (2, 2, 9), (2, 2, 17),             # u2: cohort Jan2, same-day dup
            (3, 1, 9), (3, 4, 9),              # u3: cohort Jan1, +0/+3
        ],
    )
    got = {(r.cohort, r.day_offset): r.users for r in retention_cohorts(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 2,
        ("2024-01-02", 0): 1,
    }


def test_retention_max_offset_clamp(spark):
    ev = _ev(spark, [(1, 1, 9), (1, 20, 9)])
    got = retention_cohorts(ev, max_offset=14).collect()
    assert {(r.cohort, r.day_offset, r.users) for r in got} == {
        ("2024-01-01", 0, 1)
    }
    wide = retention_cohorts(ev, max_offset=30).collect()
    assert ("2024-01-01", 19, 1) in {
        (r.cohort, r.day_offset, r.users) for r in wide
    }


# ---- bow-tie decomposition ----

from plato_spark.algos.bowtie import bowtie_decomposition  # noqa: E402


def _bt(spark, edges, universe):
    e = _edges(spark, edges)
    v = spark.createDataFrame([(int(i),) for i in universe], "id long")
    return {r.component: r.n for r in bowtie_decomposition(e, v).collect()}


def test_bowtie_classic(spark):
    # 3-cycle core; 10 feeds it (IN); 20 drains it (OUT); 30 hangs off
    # IN (tendril); 40 is a tube IN->OUT (folded into TENDRIL); 50-51
    # and isolated 60 are DISCONNECTED
    got = _bt(
        spark,
        [(0, 1), (1, 2), (2, 0), (10, 0), (2, 20),
         (10, 30), (10, 40), (40, 20), (50, 51)],
        [0, 1, 2, 10, 20, 30, 40, 50, 51, 60],
    )
    assert got == {"CORE": 3, "IN": 1, "OUT": 1, "TENDRIL": 2,
                   "DISCONNECTED": 3}


def test_bowtie_chain_through_core(spark):
    got = _bt(spark, [(5, 0), (0, 1), (1, 0), (1, 7)], [0, 1, 5, 7, 9])
    assert got == {"CORE": 2, "IN": 1, "OUT": 1, "TENDRIL": 0,
                   "DISCONNECTED": 1}


def test_bowtie_tiebreak_smallest_scc_label(spark):
    # two 2-cycles tie at size 2 -> the one whose min member is
    # smallest becomes CORE; the other is not weakly connected to it
    got = _bt(spark, [(0, 1), (1, 0), (2, 3), (3, 2)], [0, 1, 2, 3])
    assert got == {"CORE": 2, "IN": 0, "OUT": 0, "TENDRIL": 0,
                   "DISCONNECTED": 2}


def test_bowtie_empty_edges(spark):
    got = _bt(spark, [], [0, 1, 2])
    assert got == {"CORE": 0, "IN": 0, "OUT": 0, "TENDRIL": 0,
                   "DISCONNECTED": 3}


# ---- strength disparity / attribute Dirichlet / hub churn ----

from plato_spark.graph.edges import (  # noqa: E402
    attribute_dirichlet,
    hub_rank_churn,
    strength_disparity,
)


def _wedges(spark, rows):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in rows],
        "src long, dst long, weight double",
    )


def test_strength_disparity_star(spark):
    out = strength_disparity(_wedges(spark, [(0, 1, 3), (0, 2, 1)]))
    got = {r.id: (r.deg, r.strength, r.disparity) for r in out.collect()}
    assert got == {
        0: (2, 4, 0.625),   # (9+1)/16
        1: (1, 3, 1.0),
        2: (1, 1, 1.0),
    }


def test_strength_disparity_uniform_is_inverse_degree(spark):
    out = strength_disparity(
        _wedges(spark, [(0, 1, 2), (0, 2, 2), (0, 3, 2), (0, 4, 2)])
    )
    got = {r.id: r.disparity for r in out.collect()}
    assert got[0] == 0.25  # Y = 1/deg when weight is uniform


def test_attribute_dirichlet(spark):
    attrs = spark.createDataFrame(
        [(0, 10), (1, 13), (2, 13)], "id long, x long"
    )
    r = attribute_dirichlet(
        _edges(spark, [(0, 1), (1, 2)]), attrs
    ).collect()[0]
    assert (r.m_edges, r.energy, r.sum_abs_diff, r.avg_sq_diff) == (2, 9, 3, 4.5)


def test_attribute_dirichlet_drops_unattributed_and_empty(spark):
    attrs = spark.createDataFrame([(0, 10), (1, 11)], "id long, x long")
    r = attribute_dirichlet(
        _edges(spark, [(0, 1), (0, 9)]), attrs
    ).collect()[0]
    assert (r.m_edges, r.energy) == (1, 1)
    r0 = attribute_dirichlet(_edges(spark, []), attrs).collect()[0]
    assert (r0.m_edges, r0.energy, r0.sum_abs_diff) == (0, 0, 0)
    assert r0.avg_sq_diff is None


def test_hub_rank_churn(spark):
    a = _edges(spark, [(0, 1), (0, 2), (0, 3), (4, 5)])
    b = _edges(spark, [(3, 4), (3, 5), (1, 2)])
    r = hub_rank_churn(a, b, k=3).collect()[0]
    # A top3: 0(r1) 1(r2) 2(r3); B top3: 3(r1) 1(r2) 2(r3)
    assert (r.n_common, r.entered, r.exited, r.footrule) == (2, 1, 1, 0)
    assert r.avg_rank_shift == 0.0


def test_hub_rank_churn_rank_shift(spark):
    a = _edges(spark, [(0, 1), (0, 2), (0, 3), (1, 2)])   # deg 0:3 1:2 2:2 3:1
    b = _edges(spark, [(1, 2), (1, 3), (1, 4), (0, 2)])   # deg 1:3 2:2 0:1 3:1 4:1
    r = hub_rank_churn(a, b, k=2).collect()[0]
    # A top2: 0(r1) 1(r2); B top2: 1(r1) 2(r2)
    assert (r.n_common, r.entered, r.exited, r.footrule) == (1, 1, 1, 1)
    assert r.avg_rank_shift == 1.0


# ---- co-citation / bibliographic coupling / c(k) curve ----

from plato_spark.algos.citations import (  # noqa: E402
    bibliographic_coupling,
    co_citation,
)
from plato_spark.algos.triangles import degree_clustering_curve  # noqa: E402


def test_co_citation_counts(spark):
    e = _edges(spark, [(10, 1), (10, 2), (10, 3), (20, 1), (20, 2)])
    got = {(r.a, r.b): r.weight for r in co_citation(e).collect()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_co_citation_fanout_guard(spark):
    e = _edges(spark, [(10, 1), (10, 2), (10, 3), (20, 1), (20, 2)])
    got = {(r.a, r.b): r.weight
           for r in co_citation(e, max_fanout=2).collect()}
    assert got == {(1, 2): 1}  # source 10 (fan-out 3) pruned


def test_biblio_coupling_counts_and_dedup(spark):
    # duplicate edge (10,1) must count once (distinct kv)
    e = _edges(spark, [(10, 1), (10, 1), (10, 2), (20, 1), (20, 2)])
    got = {(r.a, r.b): r.weight
           for r in bibliographic_coupling(e).collect()}
    assert got == {(10, 20): 2}


def test_degree_clustering_curve(spark):
    # triangle 0-1-2 plus pendant 2-3
    out = degree_clustering_curve(
        _edges(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    )
    got = {r.deg: (r.n_vertices, r.closed, r.possible, r.cc)
           for r in out.collect()}
    assert got == {
        1: (1, 0, 0, 0.0),
        2: (2, 4, 4, 1.0),
        3: (1, 2, 6, 0.333333),
    }


# ---- directed pagerank dangling semantics / style divergence ----

from plato_spark.algos.pagerank import pagerank  # noqa: E402
from plato_spark.functions.text import source_style_divergence  # noqa: E402


def test_pagerank_directed_dangling(spark):
    # 0 -> 1: vertex 0 has no in-links (rank pins at 1-d), vertex 1 is
    # dangling (its mass decays, nothing redistributes — lost-mass
    # convention). After 2 fixed supersteps from r0=1:
    #   r(0) = 0.15;  r(1) = 0.15 + 0.85 * 0.15 = 0.2775
    r = pagerank(
        _edges(spark, [(0, 1)]), eps=0.0, max_iters=2, impl="join"
    )
    got = {x.id: round(x.rank, 6) for x in r.collect()}
    assert got == {0: 0.15, 1: 0.2775}


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, source string",
    )


def test_style_divergence_exact(spark):
    docs = _docs(spark, [("A", "x x y"), ("B", "y z")])
    got = {r.source: (r.n_tokens, r.tv)
           for r in source_style_divergence(docs).collect()}
    # corpus: x2 y2 z1 (N=5); A: x2 y1 (ns=3); B: y1 z1 (ns=2)
    assert got["A"] == (3, round(4 / 15, 6))
    assert got["B"] == (2, 0.4)


def test_style_divergence_residual_bucket(spark):
    # top_k=1 pushes y and z into the residual; totals must still be
    # true distributions (tie x/y at gc=2 -> token asc picks x)
    docs = _docs(spark, [("A", "x x y"), ("B", "y z")])
    got = {r.source: r.tv
           for r in source_style_divergence(docs, top_k=1).collect()}
    assert got["A"] == round(4 / 15, 6)
    assert got["B"] == 0.4


def test_style_divergence_identical_source_is_zero(spark):
    docs = _docs(spark, [("A", "x y z"), ("B", "x y z")])
    got = {r.source: r.tv
           for r in source_style_divergence(docs).collect()}
    assert got == {"A": 0.0, "B": 0.0}


# ---- SNM candidates / label consistency ----

from plato_spark.algos.mixing import label_consistency  # noqa: E402
from plato_spark.functions.dedup import snm_candidates  # noqa: E402


def test_snm_window_pairs_exact(spark):
    # keys sort as doc order; window=3 -> pairs at rank distance <= 2,
    # including pairs straddling the 2d=4 bucket boundary (3,4), (3,5)
    docs = spark.createDataFrame(
        [(i, f"a{i} filler") for i in range(6)], "doc_id long, text string"
    )
    got = {(r.a, r.b) for r in snm_candidates(docs, window=3).collect()}
    exp = {(i, j) for i in range(6) for j in range(6)
           if i < j and j - i <= 2}
    assert got == exp


def test_snm_key_normalization(spark):
    # punctuation/case-stripped keys collide -> adjacent in sort order
    docs = spark.createDataFrame(
        [(0, "The  Quick!! brown"), (5, "the quick BROWN"), (9, "zzz")],
        "doc_id long, text string",
    )
    got = {(r.a, r.b) for r in snm_candidates(docs, window=2).collect()}
    assert (0, 5) in got and (0, 9) not in got


def test_label_consistency_path(spark):
    e = _edges(spark, [(0, 1), (2, 1), (1, 0)])  # reverse edge dedups
    labels = spark.createDataFrame(
        [(0, "A"), (1, "A"), (2, "B")], "id long, label string"
    )
    got = {r.id: (r.label, r.nbr_total, r.nbr_same, r.consistency)
           for r in label_consistency(e, labels).collect()}
    assert got == {
        0: ("A", 1, 1, 1.0),
        1: ("A", 2, 1, 0.5),
        2: ("B", 1, 0, 0.0),
    }


def test_label_consistency_unlabeled_neighbors_excluded(spark):
    e = _edges(spark, [(0, 1), (0, 9)])  # 9 unlabeled
    labels = spark.createDataFrame(
        [(0, "A"), (1, "A")], "id long, label string"
    )
    got = {r.id: r.nbr_total for r in label_consistency(e, labels).collect()}
    assert got == {0: 1, 1: 1}  # 9 absent, and 9 not a denominator for 0


# ---- directed assortativity / markov eval ----

from plato_spark.functions.events import markov_eval  # noqa: E402
from plato_spark.graph.edges import directed_degree_assortativity  # noqa: E402


def test_directed_assortativity_perfect_chain_structure(spark):
    # two disjoint chains of different lengths make out-in correlation
    # computable by hand via a numpy mirror
    import numpy as np

    arcs = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (20, 0)]
    got = {r.mode: r.assortativity
           for r in directed_degree_assortativity(
               _edges(spark, arcs)).collect()}
    od, idg = {}, {}
    for u, v in arcs:
        od[u] = od.get(u, 0) + 1
        idg[v] = idg.get(v, 0) + 1
    pairs = {
        "out-in": [(od.get(u, 0), idg.get(v, 0)) for u, v in arcs],
        "out-out": [(od.get(u, 0), od.get(v, 0)) for u, v in arcs],
        "in-in": [(idg.get(u, 0), idg.get(v, 0)) for u, v in arcs],
        "in-out": [(idg.get(u, 0), od.get(v, 0)) for u, v in arcs],
    }
    for mode, xy in pairs.items():
        x = np.array([a for a, _ in xy], dtype=float)
        y = np.array([b for _, b in xy], dtype=float)
        if x.std() == 0 or y.std() == 0:
            assert got[mode] is None, mode
        else:
            exp = round(float(np.corrcoef(x, y)[0, 1]), 6)
            assert abs(got[mode] - exp) < 2e-6, (mode, got[mode], exp)


def test_directed_assortativity_zero_variance_is_null(spark):
    # a directed 3-cycle: every out/in degree is 1 -> all modes NULL
    got = {r.mode: r.assortativity
           for r in directed_degree_assortativity(
               _edges(spark, [(0, 1), (1, 2), (2, 0)])).collect()}
    assert got == {"out-in": None, "out-out": None,
                   "in-in": None, "in-out": None}


def _mev(spark, rows):
    # rows: (user, day, hour, type)
    return spark.createDataFrame(
        [(i, int(u), datetime(2024, 1, d, h), t)
         for i, (u, d, h, t) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, event_type string",
    )


def test_markov_eval_accuracy(spark):
    # epoch day of 2024-01-01 is 19723 (odd) -> Jan1 = parity 1 (eval),
    # Jan2 = parity 0 (train). train (Jan2): u1 a->b, b->a, a->b;
    # u2 a->c => n_train=4, pred(a)=b (2 beats 1), pred(b)=a.
    # eval (Jan1): a->b (hit), a->c (miss)
    ev = _mev(spark, [
        (1, 2, 9, "a"), (1, 2, 10, "b"), (1, 2, 11, "a"), (1, 2, 12, "b"),
        (2, 2, 9, "a"), (2, 2, 10, "c"),
        (3, 1, 9, "a"), (3, 1, 10, "b"),
        (4, 1, 9, "a"), (4, 1, 10, "c"),
    ])
    r = markov_eval(ev).collect()[0]
    assert (r.n_train, r.n_eval, r.correct, r.accuracy) == (4, 2, 1, 0.5)


def test_markov_eval_unseen_source_counts_as_miss(spark):
    ev = _mev(spark, [
        (1, 2, 9, "a"), (1, 2, 10, "b"),   # train: a->b
        (2, 1, 9, "z"), (2, 1, 10, "b"),   # eval: z->? unseen -> miss
    ])
    r = markov_eval(ev).collect()[0]
    assert (r.n_train, r.n_eval, r.correct, r.accuracy) == (1, 1, 0, 0.0)


# ---- hub-removal robustness sweep ----

from plato_spark.algos.percolation import hub_removal_sweep  # noqa: E402


def test_hub_removal_star_shatters(spark):
    # star: removing the single hub isolates every leaf (no edges left)
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    got = {r.removed: (r.n_vertices, r.n_edges, r.n_components, r.largest)
           for r in hub_removal_sweep(e, ks=(0, 1)).collect()}
    assert got[0] == (6, 5, 1, 6)
    assert got[1] == (0, 0, 0, 0)


def test_hub_removal_bridge_hub_splits(spark):
    # two triangles joined through vertex 2; tie-broken hub set
    # (deg DESC, id ASC) removes 2 first -> two components survive
    e = _edges(spark, [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4)])
    got = {r.removed: (r.n_components, r.largest)
           for r in hub_removal_sweep(e, ks=(0, 1)).collect()}
    assert got[0] == (1, 5)
    assert got[1] == (2, 2)


def test_hub_removal_tiebreak_by_id(spark):
    # all degrees equal on a 4-cycle: k=1 must remove vertex 0 (id asc),
    # leaving a path 1-2-3 (one component of 3)
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    got = {r.removed: (r.n_vertices, r.n_components, r.largest)
           for r in hub_removal_sweep(e, ks=(1,)).collect()}
    assert got[1] == (3, 1, 3)


# ---- Rand / adjusted Rand partition agreement ----

from plato_spark.algos.partition_metrics import partition_rand_index  # noqa: E402


def _labels_df(spark, d):
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in d.items()], "id long, label long"
    )


def test_rand_index_identical_partitions(spark):
    a = _labels_df(spark, {0: 1, 1: 1, 2: 2, 3: 2})
    r = partition_rand_index(a, a).collect()[0]
    assert (r.n_common, r.clusters_a, r.clusters_b) == (4, 2, 2)
    assert r.rand == 1.0 and r.ari == 1.0


def test_rand_index_textbook_fixture(spark):
    # sklearn ARI doc example: [0,0,1,1] vs [0,0,1,2]
    a = _labels_df(spark, {0: 0, 1: 0, 2: 1, 3: 1})
    b = _labels_df(spark, {0: 0, 1: 0, 2: 1, 3: 2})
    r = partition_rand_index(a, b).collect()[0]
    # contingency: {0,1}x{0}: 2; {2}:1; {3}:1 -> sum_nij = 1
    # sum_a = 2, sum_b = 1, C = 6 -> rand = (6-2-1+2)/6 = 5/6
    # ari = 2*(6*1 - 2)/(6*3 - 2*2) = 8/14
    assert r.rand == round(5 / 6, 6)
    assert r.ari == round(8 / 14, 6)


def test_rand_index_restricted_to_common_ids(spark):
    a = _labels_df(spark, {0: 1, 1: 1, 2: 2, 9: 7})
    b = _labels_df(spark, {0: 5, 1: 5, 2: 6})
    r = partition_rand_index(a, b).collect()[0]
    assert r.n_common == 3 and r.rand == 1.0


def test_rand_index_degenerate_single_cluster_ari_null(spark):
    a = _labels_df(spark, {0: 1, 1: 1})
    r = partition_rand_index(a, a).collect()[0]
    # one pair, both agree: rand defined, ari denominator 0 -> NULL
    assert r.rand == 1.0 and r.ari is None


# ---- incremental streaming degrees ----

import shutil  # noqa: E402
import tempfile  # noqa: E402

from plato_spark.streaming.degree_stream import (  # noqa: E402
    merge_degree_batch,
    read_degree_state,
)


def test_degree_stream_equals_batch(spark):
    sd = tempfile.mkdtemp(prefix="degtest_")
    try:
        b1 = _edges(spark, [(0, 1), (0, 2)])
        b2 = _edges(spark, [(0, 3), (1, 2)])
        merge_degree_batch(b1, sd, epoch_id=0, nbuckets=4)
        merge_degree_batch(b2, sd, epoch_id=1, nbuckets=4)
        got = {r.id: r.deg for r in read_degree_state(spark, sd).collect()}
        assert got == {0: 3, 1: 2, 2: 2, 3: 1}
    finally:
        shutil.rmtree(sd, ignore_errors=True)


def test_degree_stream_replay_is_skipped(spark):
    sd = tempfile.mkdtemp(prefix="degtest_")
    try:
        b = _edges(spark, [(0, 1)])
        r1 = merge_degree_batch(b, sd, epoch_id=0, nbuckets=4)
        r2 = merge_degree_batch(b, sd, epoch_id=0, nbuckets=4)  # replay
        assert r1["touched"] and not r2["touched"]
        assert set(r2["skipped"]) == set(r1["touched"])
        got = {r.id: r.deg for r in read_degree_state(spark, sd).collect()}
        assert got == {0: 1, 1: 1}  # counted once, not twice
    finally:
        shutil.rmtree(sd, ignore_errors=True)


def test_degree_stream_rollback_one_bucket_reapplies_exactly(spark):
    import os

    sd = tempfile.mkdtemp(prefix="degtest_")
    try:
        merge_degree_batch(_edges(spark, [(0, 1)]), sd, epoch_id=0, nbuckets=4)
        merge_degree_batch(_edges(spark, [(0, 4), (1, 5)]), sd,
                           epoch_id=1, nbuckets=4)
        # simulate a crash: roll bucket b0000 (ids 0 and 4) back to v0
        b0 = os.path.join(sd, "b0000")
        vs = sorted(int(d[1:]) for d in os.listdir(b0) if d.startswith("v"))
        shutil.rmtree(os.path.join(b0, f"v{vs[-1]}"))
        # replaying epoch 1 must re-apply ONLY the rolled-back bucket
        r = merge_degree_batch(_edges(spark, [(0, 4), (1, 5)]), sd,
                               epoch_id=1, nbuckets=4)
        assert r["touched"] == [0] and 1 in r["skipped"]
        got = {r2.id: r2.deg for r2 in read_degree_state(spark, sd).collect()}
        assert got == {0: 2, 1: 2, 4: 1, 5: 1}
    finally:
        shutil.rmtree(sd, ignore_errors=True)


# ---- incremental streaming triangles ----

from plato_spark.streaming.triangle_stream import (  # noqa: E402
    merge_triangle_batch,
    read_triangle_state,
)


def test_triangle_stream_telescopes(spark):
    sd = tempfile.mkdtemp(prefix="tritest_")
    try:
        # batch 0: a path (no triangles); batch 1 closes one triangle
        # and adds a pendant; batch 2 closes two more via vertex 3
        r0 = merge_triangle_batch(_edges(spark, [(0, 1), (1, 2)]), sd, 0)
        r1 = merge_triangle_batch(_edges(spark, [(0, 2), (2, 9)]), sd, 1)
        r2 = merge_triangle_batch(
            _edges(spark, [(0, 3), (1, 3), (2, 3)]), sd, 2)
        assert (r0["new_triangles"], r1["new_triangles"],
                r2["new_triangles"]) == (0, 1, 3)
        row = read_triangle_state(spark, sd).collect()[0]
        assert (row.triangles, row.edges, row.epoch) == (4, 7, 2)
    finally:
        shutil.rmtree(sd, ignore_errors=True)


def test_triangle_stream_replay_and_duplicate_edges(spark):
    sd = tempfile.mkdtemp(prefix="tritest_")
    try:
        merge_triangle_batch(_edges(spark, [(0, 1), (1, 2), (0, 2)]), sd, 0)
        # replayed epoch: skipped wholesale
        r = merge_triangle_batch(_edges(spark, [(0, 1), (1, 2), (0, 2)]), sd, 0)
        assert not r["applied"]
        # a later batch resending known edges (reversed too) adds nothing
        r2 = merge_triangle_batch(_edges(spark, [(1, 0), (2, 1)]), sd, 1)
        assert r2["applied"] and r2["new_edges"] == 0 and r2["new_triangles"] == 0
        assert read_triangle_state(spark, sd).collect()[0].triangles == 1
    finally:
        shutil.rmtree(sd, ignore_errors=True)


# ---- content-defined chunking ----

from plato_spark.functions.dedup import cdc_chunk_stats  # noqa: E402


def _cdc_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_cdc_identical_docs_fully_reclaimable(spark):
    t = "x" * 200  # whatever the cuts are, both docs chunk identically
    r = cdc_chunk_stats(_cdc_docs(spark, [t, t])).collect()[0]
    assert r.n_chunks == 2 * r.distinct_chunks
    assert r.dup_occurrences == r.distinct_chunks
    assert r.reclaimable_chars == 200


def test_cdc_resynchronizes_after_prefix_edit(spark):
    import hashlib

    base = "".join(
        hashlib.md5(f"w{i}".encode()).hexdigest()[:4] for i in range(120)
    )
    edited = "ZZZZZ" + base
    r = cdc_chunk_stats(_cdc_docs(spark, [base, edited])).collect()[0]
    # CDC boundaries depend only on local content: after the first cut
    # downstream of the edit, every later chunk matches -> most of the
    # 480 shared chars are reclaimed (fixed windows would reclaim 0)
    assert r.reclaimable_chars > 240, r
    assert r.dup_occurrences > 0


def test_cdc_short_and_empty_docs_single_chunk(spark):
    r = cdc_chunk_stats(_cdc_docs(spark, ["abc", ""])).collect()[0]
    assert r.n_chunks == 2 and r.distinct_chunks == 2
    assert r.dup_occurrences == 0 and r.reclaimable_chars == 0


def test_cdc_unique_content_has_no_dups(spark):
    import hashlib

    text = "".join(
        hashlib.md5(f"u{i}".encode()).hexdigest() for i in range(40)
    )
    r = cdc_chunk_stats(_cdc_docs(spark, [text])).collect()[0]
    assert r.n_chunks == r.distinct_chunks > 1
    assert r.dup_occurrences == 0 and r.reclaimable_chars == 0


# ---- BFS shortest-path counting ----

from plato_spark.algos.bfs import bfs_path_counts  # noqa: E402


def _sym_edges(spark, pairs):
    both = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src long, dst long")


def test_sigma_diamond(spark):
    # 0-1, 0-2, 1-3, 2-3: two shortest paths reach 3
    got = {r.id: (r.dist, r.sigma) for r in bfs_path_counts(
        _sym_edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3)]), 0).collect()}
    assert got == {0: (0, 1), 1: (1, 1), 2: (1, 1), 3: (2, 2)}


def test_sigma_multiplies_through_levels(spark):
    # two diamonds in series: sigma(5) = 2 * 2 = 4
    e = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (3, 5)]
    e += [(4, 6), (5, 6)]
    got = {r.id: (r.dist, r.sigma)
           for r in bfs_path_counts(_sym_edges(spark, e), 0).collect()}
    assert got[3] == (2, 2)
    assert got[6] == (4, 4)


def test_sigma_unreached_absent_and_shortcut_wins(spark):
    # 0-1-2 plus direct 0-2: dist(2)=1 with sigma 1 (the shortcut);
    # 9-8 is a separate component, absent from the result
    got = {r.id: (r.dist, r.sigma) for r in bfs_path_counts(
        _sym_edges(spark, [(0, 1), (1, 2), (0, 2), (8, 9)]), 0).collect()}
    assert got == {0: (0, 1), 1: (1, 1), 2: (1, 1)}


# ---- bloom filter join pruning ----

from plato_spark.functions.sketches import bloom_probe_stats  # noqa: E402


def _keys(spark, name, vals):
    return spark.createDataFrame([(int(v),) for v in vals], f"{name} long")


def test_bloom_no_false_negatives_and_exact_counts(spark):
    build = _keys(spark, "bk", [1, 2, 3])
    probe = _keys(spark, "pk", range(1, 9))
    r = bloom_probe_stats(build, probe, "bk", "pk", m=65536, d=4).collect()[0]
    assert (r.build_keys, r.probe_keys, r.true_matches) == (3, 8, 3)
    # every build key must pass (no false negatives); at m=65536 the
    # 5 non-members essentially never collide on all 4 bits
    assert r.bloom_pass >= 3
    assert r.false_positives == r.bloom_pass - 3


def test_bloom_matches_python_mirror(spark):
    # exact pass-set equality against a python mirror of the portable
    # md5 double-hashing family at a deliberately collision-prone m
    import hashlib

    def h1h2(k):
        hx = hashlib.md5(f"bloom|{k}".encode()).hexdigest()
        return int(hx[0:14], 16), int(hx[17:30], 16)

    m, d = 16, 4
    bvals, pvals = [1, 2, 7], list(range(1, 21))

    def bits_of(k):
        a, b = h1h2(k)
        return {(a + i * b) % m for i in range(d)}

    filt = set().union(*(bits_of(k) for k in bvals))
    expected_pass = {k for k in pvals if bits_of(k) <= filt}
    r = bloom_probe_stats(
        _keys(spark, "bk", bvals), _keys(spark, "pk", pvals),
        "bk", "pk", m=m, d=d,
    ).collect()[0]
    assert r.bloom_pass == len(expected_pass)
    assert r.false_positives == len(expected_pass - set(bvals))
    assert set(bvals) <= expected_pass  # no false negatives by mirror too


def test_bloom_empty_build_passes_nothing(spark):
    build = _keys(spark, "bk", [])
    probe = _keys(spark, "pk", [1, 2])
    r = bloom_probe_stats(build, probe, "bk", "pk").collect()[0]
    assert (r.true_matches, r.bloom_pass, r.false_positives) == (0, 0, 0)
