"""Shared building blocks for the plato_spark entry registry.

Round-5 manifest-ization (VERDICT r4 item 3): the former monolithic
__spark_entry__.py is split into per-domain modules under
plato_spark/entry/.  This module carries the original header imports,
all DuckDB oracle SQL builders, pinned iteration constants, and the
three q_ callables other queries compose (q_reference_graph,
q_segment_pivot, q_spectral_coord).  Source text of every helper is
unchanged from the pre-split file, so oracle SQL strings are
byte-identical.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plato_spark.algos.bfs import bfs, tree_stat
from plato_spark.algos.closeness import closeness_sampled
from plato_spark.algos.hanp import hanp
from plato_spark.algos.infomap import infomap
from plato_spark.algos.kcore import kcore
from plato_spark.algos.betweenness import betweenness_sampled
from plato_spark.algos.louvain import louvain
from plato_spark.algos.lpa import label_propagation
from plato_spark.algos.hll_portable import (
    hyperanf_portable,
    nstep_degrees_portable,
    sql_effective_diameter_oracle,
    sql_hyperanf_oracle,
    sql_nstep_oracle,
)
from plato_spark.algos.nstep import nstep_reach_exact
from plato_spark.algos.sssp import sssp
from plato_spark.algos.walks import metapath_walks, random_walks
from plato_spark.functions.multimodal import (
    docs_to_media,
    parse_media_headers,
)
from plato_spark.algos.pagerank import pagerank, personalized_pagerank
from plato_spark.algos.triangles import (
    clustering_coefficient,
    neighborhood_similarity,
    common_neighbor_payload,
    common_neighbors,
    triangle_count,
)
from plato_spark.algos.wcc import (
    component_edges,
    connected_components,
    major_component,
)
from plato_spark.functions.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    simhash_signatures_portable,
)
from plato_spark.functions.similarity import (
    brute_force_topk,
    embedding_near_dup_clusters,
    ivf_ann,
    lsh_bucketed_neighbors_portable,
    lsh_candidate_pairs_portable,
    rademacher_planes,
    threshold_neighbors,
)
from plato_spark.functions.sampling import hash_split, stratified_sample
from plato_spark.functions.text import (
    _LANG_PROFILES,
    doc_fingerprint,
    lang_id_ngram,
    quality_filter,
    text_quality,
    token_count_col,
)
from plato_spark.graph.edges import symmetrize
from plato_spark.sources.tables import load_table, part_cooccurrence_edges


SF_SMOKE = "/root/testdata/sf0.001"


SQL_GRAPH_PREFIX = """
WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
canon AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey),
edges AS MATERIALIZED (SELECT src, dst, weight FROM canon
          UNION ALL SELECT dst AS src, src AS dst, weight FROM canon),
verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
deg AS MATERIALIZED (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg,
               CAST(sum(weight) AS DOUBLE) AS wsum
        FROM edges GROUP BY src)
"""


def _sql_pagerank(
    iters: int,
    damping: float = 0.85,
    weighted: bool = False,
    prefix: str | None = None,
) -> str:
    """Unrolled power iteration, plato pagerank.hpp:100-146 semantics.

    On the symmetrized graph every vertex has out-degree >= 1, so the
    dangling branch is inert; COALESCE keeps the general form anyway.
    ``prefix`` overrides the graph CTE block (must define edges / verts
    / deg with the same column contract as SQL_GRAPH_PREFIX) — used by
    pagerank_citation to run the identical unrolled iteration on the
    DIRECTED planted citation digraph, where dangling vertices are real
    (lost-mass convention on both engines: a vertex with no out-edges
    contributes nothing, its rank mass decays).
    """
    return (
        (prefix if prefix is not None else SQL_GRAPH_PREFIX)
        + ", " + ",\n".join(_sql_pagerank_ctes(iters, damping, weighted))
        + f"\nSELECT id, round(rank, 6) AS rank FROM r{iters} ORDER BY id"
    )


def _sql_pagerank_ctes(iters: int, damping: float = 0.85,
                       weighted: bool = False) -> list:
    """Unrolled power-iteration CTE chain r0..r{iters} over the
    edges/verts/deg contract — shared by the pagerank-family oracles and
    the pagerank_trace oracle (which reads EVERY intermediate round)."""
    div = "d.wsum" if weighted else "d.deg"
    contrib = "r.rank / " + div + (" * e.weight" if weighted else "")
    ctes = ["r0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM verts)"]
    for k in range(iters):
        ctes.append(
            f"""r{k + 1} AS MATERIALIZED (
  SELECT v.id, {1.0 - damping} + {damping} * COALESCE(s.g, 0.0) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, sum({contrib}) AS g
    FROM edges e JOIN r{k} r ON e.src = r.id JOIN deg d ON e.src = d.id
    GROUP BY e.dst) s ON v.id = s.id)"""
        )
    return ctes


def _sql_pagerank_trace(iters: int, damping: float = 0.85) -> str:
    """Mirror of algos/pagerank.pagerank_trace: per-round (changed,
    max_delta) computed from the 6dp-pre-rounded rank chain — changed is
    an exact integer, max_delta an order-independent max of identical
    IEEE subtractions, so no accumulation-order-sensitive L1 sum ever
    crosses the engine boundary."""
    rounds = ",\n".join(
        f"""t{k} AS (
  SELECT CAST({k} AS BIGINT) AS round,
         CAST(sum(CASE WHEN round(n.rank, 6) <> round(o.rank, 6)
                       THEN 1 ELSE 0 END) AS BIGINT) AS changed,
         round(max(round(abs(round(n.rank, 6) - round(o.rank, 6)), 6)),
               6) AS max_delta
  FROM r{k} n JOIN r{k - 1} o ON n.id = o.id)"""
        for k in range(1, iters + 1)
    )
    union = "\nUNION ALL ".join(f"SELECT * FROM t{k}" for k in range(1, iters + 1))
    return (
        SQL_GRAPH_PREFIX + ", "
        + ",\n".join(_sql_pagerank_ctes(iters, damping))
        + ",\n" + rounds
        + f"\n{union} ORDER BY round"
    )


def _sql_citation_prefix() -> str:
    """edges/verts/deg CTE block (SQL_GRAPH_PREFIX column contract) for
    the DIRECTED planted citation digraph: deg = out-degree, verts
    includes dangling (dst-only) vertices."""
    return f"""
WITH cg AS MATERIALIZED ({_sql_reference_graph()}),
edges AS MATERIALIZED (
  SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight FROM cg),
verts AS MATERIALIZED (
  SELECT DISTINCT src AS id FROM edges
  UNION SELECT DISTINCT dst FROM edges),
deg AS MATERIALIZED (
  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg,
         CAST(sum(weight) AS DOUBLE) AS wsum
  FROM edges GROUP BY src)
"""


def _sql_ppr_ctes(iters: int = 10, damping: float = 0.85,
                  n_sources: int = 4) -> list:
    """Unrolled personalized-PageRank CTE chain srcs/pb/pr0..pr{iters}
    (algos/pagerank.personalized_pagerank): teleport mass restricted to
    the n_sources smallest vertices, r0 = s.  Shared by the ppr and
    ppr_sweep oracles."""
    ctes = [f"""srcs AS MATERIALIZED (SELECT id FROM verts ORDER BY id LIMIT {n_sources}),
pb AS MATERIALIZED (
  SELECT v.id, CASE WHEN s.id IS NOT NULL THEN 1.0 ELSE 0.0 END AS s
  FROM verts v LEFT JOIN srcs s ON v.id = s.id),
pr0 AS MATERIALIZED (SELECT id, CAST(s AS DOUBLE) AS rank FROM pb)"""]
    for k in range(iters):
        ctes.append(f"""pr{k + 1} AS MATERIALIZED (
  SELECT b.id, {1.0 - damping} * b.s + {damping} * COALESCE(g.g, 0.0) AS rank
  FROM pb b LEFT JOIN (
    SELECT e.dst AS id, sum(r.rank / d.deg) AS g
    FROM edges e JOIN pr{k} r ON e.src = r.id JOIN deg d ON e.src = d.id
    GROUP BY e.dst) g ON b.id = g.id)""")
    return ctes


def _sql_ppr(iters: int = 10, damping: float = 0.85, n_sources: int = 4) -> str:
    return (
        SQL_GRAPH_PREFIX + ", "
        + ",\n".join(_sql_ppr_ctes(iters, damping, n_sources))
        + f"\nSELECT id, round(rank, 6) AS rank FROM pr{iters} ORDER BY id"
    )


def _sql_ppr_sweep(iters: int = 10, k: int = 32) -> str:
    """Mirror of algos/local_cluster.ppr_sweep_cut over the co-occurrence
    graph: Andersen-Chung-Lang sweep of the single-seed PPR vector.
    Sweep key = round(rank, 6) / deg — the 6dp round FIRST makes the key
    one IEEE division of cross-engine-identical inputs (the raw rank
    doubles differ at ~1e-16 between engines; the registered ppr gate
    proves the rounded values agree), so the sweep ORDER is
    deterministic.  cut/vol prefix accounting is exact BIGINT: an edge
    with endpoint sweep-ranks lo <= hi is cut for prefixes lo <= j < hi,
    internal for j >= hi, so cut(j) = cum(lo<=j) - cum(hi<=j)."""
    inf = k + 1
    return (
        SQL_GRAPH_PREFIX + ", "
        + ",\n".join(_sql_ppr_ctes(iters, n_sources=1))
        + f""",
swp AS MATERIALIZED (
  SELECT p.id, round(p.rank, 6) / d.deg AS skey, d.deg
  FROM pr{iters} p JOIN deg d ON p.id = d.id),
topk AS MATERIALIZED (
  SELECT id, deg, row_number() OVER (ORDER BY skey DESC, id ASC) AS rnk
  FROM swp ORDER BY skey DESC, id ASC LIMIT {k}),
er AS MATERIALIZED (
  SELECT least(COALESCE(x.rnk, {inf}), COALESCE(y.rnk, {inf})) AS lo,
         greatest(COALESCE(x.rnk, {inf}), COALESCE(y.rnk, {inf})) AS hi
  FROM canon c LEFT JOIN topk x ON c.src = x.id
               LEFT JOIN topk y ON c.dst = y.id),
cl AS (SELECT lo AS rnk, CAST(count(*) AS BIGINT) AS nlo
       FROM er WHERE lo <= {k} GROUP BY lo),
ch AS (SELECT hi AS rnk, CAST(count(*) AS BIGINT) AS nhi
       FROM er WHERE hi <= {k} GROUP BY hi),
tot AS (SELECT 2 * CAST(count(*) AS BIGINT) AS tot_vol FROM canon),
sw AS (
  SELECT t.rnk, t.id,
         sum(COALESCE(l.nlo, 0)) OVER (ORDER BY t.rnk)
           - sum(COALESCE(h.nhi, 0)) OVER (ORDER BY t.rnk) AS cut_edges,
         sum(t.deg) OVER (ORDER BY t.rnk) AS volume
  FROM topk t LEFT JOIN cl l ON t.rnk = l.rnk
              LEFT JOIN ch h ON t.rnk = h.rnk)
SELECT CAST(s.rnk AS BIGINT) AS sweep_rank, s.id,
       CAST(s.cut_edges AS BIGINT) AS cut_edges,
       CAST(s.volume AS BIGINT) AS volume,
       CASE WHEN least(s.volume, t.tot_vol - s.volume) > 0
            THEN round(CAST(s.cut_edges AS DOUBLE)
                 / CAST(least(s.volume, t.tot_vol - s.volume) AS DOUBLE), 6)
       END AS conductance
FROM sw s, tot t ORDER BY sweep_rank"""
    )


def _sql_wcc_chain_ctes(iters: int) -> list:
    """Unrolled hash-min label chain l0..l{iters} — shared by the wcc
    and wcc_trace oracles (full relabel per round; equals the engine's
    frontier-restricted loop round for round, see algos/wcc.wcc_trace)."""
    ctes = ["l0 AS MATERIALIZED (SELECT id, id AS lab FROM verts)"]
    for k in range(iters):
        ctes.append(
            f"""l{k + 1} AS MATERIALIZED (
  SELECT v.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM verts v JOIN l{k} l ON v.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM edges e JOIN l{k} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON v.id = m.id)"""
        )
    return ctes


def _sql_wcc(iters: int = 10) -> str:
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(_sql_wcc_chain_ctes(iters))
        + f"\nSELECT id, lab AS component FROM l{iters} ORDER BY id"
    )


def _sql_wcc_trace(iters: int = 10) -> str:
    """Mirror of algos/wcc.wcc_trace: per-round (frontier, changed)
    counts off the full relabel chain — changed_k = |{l_k < l_{k-1}}|,
    frontier_k = changed_{k-1} (all of verts at round 1).  Rounds past
    the fixpoint are (0, 0) on both engines, so the pinned count is
    idempotent."""

    def _chg(k: int) -> str:
        return (f"(SELECT CAST(count(*) AS BIGINT) FROM l{k} a "
                f"JOIN l{k - 1} b ON a.id = b.id WHERE a.lab < b.lab)")

    rows = [
        "SELECT CAST(1 AS BIGINT) AS round, "
        "(SELECT CAST(count(*) AS BIGINT) FROM verts) AS frontier, "
        + _chg(1) + " AS changed"
    ]
    for k in range(2, iters + 1):
        rows.append(
            f"SELECT CAST({k} AS BIGINT), {_chg(k - 1)}, {_chg(k)}"
        )
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(_sql_wcc_chain_ctes(iters))
        + "\n" + "\nUNION ALL\n".join(rows) + "\nORDER BY round"
    )


def _sql_lpa(iters: int = 3, weighted: bool = False,
             prefix: str | None = None, final: str | None = None) -> str:
    """Unrolled LPA chain.  ``prefix`` overrides the graph CTE block
    (must define edges/verts — the _sql_pagerank convention); ``final``
    overrides the closing SELECT (must read lp{iters})."""
    vote = ("sum(CAST(e.weight AS BIGINT))" if weighted else "count(*)")
    ctes = ["lp0 AS MATERIALIZED (SELECT id, id AS label FROM verts)"]
    for k in range(iters):
        ctes.append(
            f"""lp{k + 1} AS MATERIALIZED (
  SELECT v.id, COALESCE(w.new_label, p.label) AS label
  FROM verts v JOIN lp{k} p ON v.id = p.id
  LEFT JOIN (
    SELECT id, label AS new_label FROM (
      SELECT e.dst AS id, l.label, {vote} AS cnt,
             row_number() OVER (PARTITION BY e.dst
                                ORDER BY {vote} DESC, l.label ASC) AS rn
      FROM edges e JOIN lp{k} l ON e.src = l.id
      GROUP BY e.dst, l.label) t
    WHERE rn = 1) w ON v.id = w.id)"""
        )
    return (
        (prefix if prefix is not None else SQL_GRAPH_PREFIX)
        + ", " + ",\n".join(ctes)
        + (final if final is not None
           else f"\nSELECT id, label FROM lp{iters} ORDER BY id")
    )


PR_ITERS = 10


PRW_ITERS = 5


LPA_ITERS = 3


# Reference CLI/header defaults (VERDICT r4 item 6): the published knobs
# parity must hold at, not just our pinned gate constants.
# /root/reference/scripts/run_pagerank.sh:15-17 → EPS=0.0001, DAMPING=0.85,
# ITERATIONS=100; /root/reference/plato/algo/lpa/lpa.hpp:40 → iteration_=20.
PR_REF_EPS = 1e-4
PR_REF_UNROLL = 14  # oracle unroll budget; stop rule picks the round
LPA_REF_ITERS = 20


def _sql_pagerank_ref_defaults() -> str:
    """PageRank at the reference's published defaults with the stop rule
    IN the oracle: plato stops when the raw L1 delta drops below eps and
    then runs ONE extra epoch (pagerank.hpp:136-146; mirrored by
    algos/pagerank._pagerank_loop's last_epoch).  Both engines evaluate
    `sum(abs(r_k - r_{k-1})) < eps` independently on their own raw
    doubles — portable here because the measured deltas bracket the
    threshold with ≥36% margin at every gate SF (2.47e-5 < 1e-4 < 2.1e-4
    at sf0.001; 2.2e-5 < 1e-4 < 1.36e-4 at sf0.01), far beyond ~1e-10
    cross-engine summation drift.  If convergence ever needs more than
    PR_REF_UNROLL rounds the stop-round subquery is NULL and the oracle
    returns zero rows — a loud row-count mismatch, never silence."""
    ctes = _sql_pagerank_ctes(PR_REF_UNROLL)
    deltas = ",\n".join(
        f"""dl{k} AS (
  SELECT {k} AS k, sum(abs(n.rank - o.rank)) AS l1
  FROM r{k} n JOIN r{k - 1} o ON n.id = o.id)"""
        for k in range(1, PR_REF_UNROLL + 1)
    )
    dunion = "\nUNION ALL ".join(
        f"SELECT * FROM dl{k}" for k in range(1, PR_REF_UNROLL + 1))
    runion = "\nUNION ALL ".join(
        f"SELECT {k} AS k, id, rank FROM r{k}"
        for k in range(1, PR_REF_UNROLL + 1))
    return (
        SQL_GRAPH_PREFIX + ", "
        + ",\n".join(ctes) + ",\n" + deltas
        + f""",
ds AS ({dunion}),
fin AS (SELECT min(k) + 1 AS stop_k FROM ds WHERE l1 < {PR_REF_EPS}),
allr AS ({runion})
SELECT a.id, round(a.rank, 6) AS rank
FROM allr a JOIN fin f ON a.k = f.stop_k
ORDER BY a.id"""
    )


WCC_SQL_ITERS = 10


BFS_SQL_ITERS = 5


KCORE_SQL_ITERS = 40


CLOSENESS_SAMPLES = 4


VOCAB_TOP_K = 200


CONTAM_NGRAM = 8


def _sql_seeded_lpa(iters: int = 3) -> str:
    """Mirror of algos/lpa.seeded_label_propagation over the q_seeded_lpa
    seed planting (every 40th vertex, label = portable-h1 % 4)."""
    h = H1_SQL.format(s="'seedlab|' || CAST(v.id AS VARCHAR)")
    ctes = [f"""s0 AS MATERIALIZED (
  SELECT v.id,
         CASE WHEN v.id % 40 = 0 THEN {h} % 4 END AS seed,
         CASE WHEN v.id % 40 = 0 THEN {h} % 4 END AS label
  FROM verts v)"""]
    for k in range(iters):
        ctes.append(f"""s{k + 1} AS MATERIALIZED (
  SELECT p.id, p.seed, COALESCE(p.seed, w.new_label, p.label) AS label
  FROM s{k} p
  LEFT JOIN (
    SELECT id, label AS new_label FROM (
      SELECT e.dst AS id, l.label, count(*) AS cnt,
             row_number() OVER (PARTITION BY e.dst
                                ORDER BY count(*) DESC, l.label ASC) AS rn
      FROM edges e JOIN s{k} l ON e.src = l.id AND l.label IS NOT NULL
      GROUP BY e.dst, l.label) t
    WHERE rn = 1) w ON p.id = w.id)""")
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT id, CAST(COALESCE(label, -1) AS BIGINT) AS label"
          f" FROM s{iters}"
    )


def _sql_hanp(iters: int = 3, preference: float = 1.0, hop_att: float = 0.1,
              dis: float = 1e-6) -> str:
    """Unrolled HANP vote (hanp.hpp:118-186, deterministic dis-quantized
    smallest-label tie-break matching algos/hanp.py)."""
    ctes = ["h0 AS MATERIALIZED (SELECT id, id AS label, CAST(1.0 AS DOUBLE) AS att FROM verts)"]
    for k in range(iters):
        ctes.append(
            f"""hs{k} AS MATERIALIZED (
  SELECT e.dst AS id, l.label AS cand,
         sum(l.att * {preference} * e.weight) AS score,
         max(l.att) AS max_att
  FROM edges e JOIN h{k} l ON e.src = l.id
  WHERE l.att >= 0
  GROUP BY e.dst, l.label),
hw{k} AS MATERIALIZED (
  SELECT id, cand, max_att FROM (
    SELECT id, cand, max_att,
           row_number() OVER (PARTITION BY id
                              ORDER BY CAST(round(score / {dis}) AS BIGINT) DESC,
                                       cand ASC) AS rn
    FROM hs{k}) t WHERE rn = 1),
h{k + 1} AS MATERIALIZED (
  SELECT s.id,
         COALESCE(w.cand, s.label) AS label,
         CASE WHEN w.cand IS NULL THEN s.att
              WHEN w.cand = s.label THEN w.max_att
              ELSE w.max_att - {hop_att} END AS att
  FROM h{k} s LEFT JOIN hw{k} w ON s.id = w.id)"""
        )
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT id, label FROM h{iters} ORDER BY id"
    )


def _sql_brandes_ctes(samples: int = 4, levels: int = 5) -> list:
    """Unrolled multi-source Brandes forward (fr/vis with sigma) +
    backward (d{k} deltas) CTE chain with the engine's smallest-id
    sample policy — shared by the vertex (betweenness_sampled) and edge
    (edge_betweenness) oracles."""
    ctes = [
        f"""roots AS MATERIALIZED (SELECT id AS root FROM verts ORDER BY id LIMIT {samples}),
fr0 AS MATERIALIZED (SELECT root, root AS id, CAST(1.0 AS DOUBLE) AS sigma FROM roots),
vis0 AS MATERIALIZED (SELECT root, id, 0 AS dist, sigma FROM fr0)"""
    ]
    for k in range(levels):
        ctes.append(
            f"""fr{k + 1} AS MATERIALIZED (
  SELECT f.root, e.dst AS id, sum(f.sigma) AS sigma
  FROM fr{k} f JOIN edges e ON e.src = f.id
  LEFT JOIN vis{k} v ON v.root = f.root AND v.id = e.dst
  WHERE v.id IS NULL
  GROUP BY f.root, e.dst),
vis{k + 1} AS MATERIALIZED (
  SELECT root, id, dist, sigma FROM vis{k}
  UNION ALL SELECT root, id, {k + 1} AS dist, sigma FROM fr{k + 1})"""
        )
    K = levels
    ctes.append(
        f"d{K} AS MATERIALIZED (SELECT root, id, sigma, CAST(0.0 AS DOUBLE) AS delta "
        f"FROM vis{K} WHERE dist = {K})"
    )
    for k in range(K - 1, -1, -1):
        ctes.append(
            f"""d{k} AS MATERIALIZED (
  SELECT l.root, l.id, l.sigma,
         l.sigma * COALESCE(sum((1.0 + n.delta) / n.sigma), 0.0) AS delta
  FROM (SELECT root, id, sigma FROM vis{K} WHERE dist = {k}) l
  LEFT JOIN edges e ON e.src = l.id
  LEFT JOIN d{k + 1} n ON n.root = l.root AND n.id = e.dst
  GROUP BY l.root, l.id, l.sigma)"""
        )
    return ctes


def _sql_betweenness(samples: int = 4, levels: int = 5) -> str:
    """Unrolled multi-source Brandes with the engine's smallest-id sample
    policy (algos/betweenness.py)."""
    K = levels
    union = " UNION ALL ".join(
        f"SELECT root, id, delta FROM d{k}" for k in range(K + 1)
    )
    return (
        SQL_GRAPH_PREFIX + ", "
        + ",\n".join(_sql_brandes_ctes(samples, levels))
        + f""",
alld AS ({union}),
bc AS (SELECT id, sum(delta) AS b FROM alld WHERE id != root GROUP BY id)
SELECT v.id, round(COALESCE(bc.b, 0.0), 6) AS betweenness
FROM verts v LEFT JOIN bc ON v.id = bc.id ORDER BY v.id"""
    )


def _sql_edge_betweenness(samples: int = 4, levels: int = 5) -> str:
    """Mirror of algos/betweenness.edge_betweenness_sampled: the d{k}
    summand re-keyed to the DAG edge — term(u->w) = sigma_u * (1 +
    delta_w) / sigma_w for u at dist k, w at dist k+1 — canonicalized
    least/greatest and summed over roots and levels; canon edges on no
    sampled DAG score 0.0."""
    K = levels
    # int64 picounit terms + integer HALF_UP readout, mirroring the
    # engine exactly (incl. the sigma * ((1+delta)/sigma) association):
    # a raw double sum over roots/levels split engines on exact 6dp
    # half-ties (2/1,196,000 edges at sf0.1)
    terms = " UNION ALL ".join(
        f"""SELECT least(e.src, e.dst) AS a, greatest(e.src, e.dst) AS b,
           CAST(round(l.sigma * ((1.0 + n.delta) / n.sigma)
                      * 1000000000000.0, 0) AS BIGINT) AS term
    FROM edges e
    JOIN (SELECT root, id, sigma FROM vis{K} WHERE dist = {k}) l
      ON e.src = l.id
    JOIN d{k + 1} n ON n.root = l.root AND n.id = e.dst"""
        for k in range(K)
    )
    return (
        SQL_GRAPH_PREFIX + ", "
        + ",\n".join(_sql_brandes_ctes(samples, levels))
        + f""",
allt AS ({terms}),
es AS (SELECT a, b, CAST(sum(term) AS BIGINT) AS t FROM allt GROUP BY a, b)
SELECT c.src, c.dst,
       CAST((COALESCE(es.t, 0) + 500000)
            - (COALESCE(es.t, 0) + 500000) % 1000000 AS BIGINT)
         / 1000000 / 1000000.0 AS edge_betweenness
FROM canon c LEFT JOIN es ON c.src = es.a AND c.dst = es.b
ORDER BY c.src, c.dst"""
    )


def _sql_louvain(sub_rounds: int = 2) -> str:
    """Unrolled Louvain move phase (one level, algos/louvain.py semantics:
    textbook Blondel gain, parity-alternating sync moves, smallest-target
    tie-break at 1e-9 gain quantization)."""
    ctes = ["c0 AS MATERIALIZED (SELECT id, id AS comm, "
            "(SELECT d.wsum FROM deg d WHERE d.id = verts.id) AS ki FROM verts)"]
    m_expr = "(SELECT sum(weight) FROM canon)"
    for r in range(sub_rounds):
        ctes.append(
            f"""sg{r} AS MATERIALIZED (SELECT comm, sum(ki) AS sigma FROM c{r} GROUP BY comm),
ni{r} AS MATERIALIZED (
  SELECT e.dst AS id, l.comm AS cand, sum(e.weight) AS ki_in
  FROM edges e JOIN c{r} l ON e.src = l.id GROUP BY e.dst, l.comm),
own{r} AS MATERIALIZED (
  SELECT n.id, n.ki_in FROM ni{r} n JOIN c{r} s ON n.id = s.id AND n.cand = s.comm),
best{r} AS MATERIALIZED (
  SELECT id, cand FROM (
    SELECT s.id, n.cand,
           n.ki_in - COALESCE(o.ki_in, 0.0)
             - s.ki * (s.ki + st.sigma - sf.sigma) / (2.0 * {m_expr}) AS gain,
           row_number() OVER (
             PARTITION BY s.id
             ORDER BY round(n.ki_in - COALESCE(o.ki_in, 0.0)
               - s.ki * (s.ki + st.sigma - sf.sigma) / (2.0 * {m_expr}), 9) DESC,
               n.cand ASC) AS rn
    FROM c{r} s
    JOIN ni{r} n ON n.id = s.id AND n.cand != s.comm
    LEFT JOIN own{r} o ON o.id = s.id
    JOIN sg{r} sf ON sf.comm = s.comm
    JOIN sg{r} st ON st.comm = n.cand) t
  WHERE rn = 1 AND gain > 1e-12),
c{r + 1} AS MATERIALIZED (
  SELECT s.id,
         CASE WHEN b.cand IS NOT NULL AND s.id % 2 = {r % 2}
              THEN b.cand ELSE s.comm END AS comm,
         s.ki
  FROM c{r} s LEFT JOIN best{r} b ON s.id = b.id)"""
        )
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT id, comm AS community FROM c{sub_rounds} ORDER BY id"
    )


def _sql_modularity(sub_rounds: int = 2) -> str:
    """Weighted modularity of the one-level Louvain partition, folded as
    EXACT INTEGERS (weights are integral counts): Q = NUM / (4*W^2) with
    NUM = sum_c (4*W*w_c - d_c^2) — the single IEEE division at read-out
    is bitwise-identical across engines (same pattern as tfidf/hyperanf).
    """
    body = _sql_louvain(sub_rounds)
    body = body[: body.rindex("\nSELECT id, comm AS community")]
    return body + f""",
part AS MATERIALIZED (SELECT id, comm FROM c{sub_rounds}),
wtot AS MATERIALIZED (SELECT CAST(sum(weight) AS BIGINT) AS w FROM canon),
intra AS MATERIALIZED (
  SELECT p1.comm, CAST(sum(c.weight) AS BIGINT) AS wc
  FROM canon c JOIN part p1 ON c.src = p1.id JOIN part p2 ON c.dst = p2.id
  WHERE p1.comm = p2.comm GROUP BY p1.comm),
dtot AS MATERIALIZED (
  SELECT p.comm, CAST(sum(d.wsum) AS BIGINT) AS dc
  FROM part p JOIN deg d ON p.id = d.id GROUP BY p.comm),
num AS MATERIALIZED (
  SELECT CAST(sum(4 * (SELECT w FROM wtot) * COALESCE(i.wc, 0) - d.dc * d.dc)
         AS BIGINT) AS n
  FROM dtot d LEFT JOIN intra i ON d.comm = i.comm)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM dtot) AS n_communities,
       (SELECT CAST(COALESCE(sum(wc), 0) AS BIGINT) FROM intra) AS intra_weight,
       round(CAST((SELECT n FROM num) AS DOUBLE)
             / CAST(4 * (SELECT w FROM wtot) * (SELECT w FROM wtot) AS DOUBLE),
             6) AS modularity"""


def _sql_bfs(iters: int = BFS_SQL_ITERS) -> str:
    """Unrolled min-dist BFS from the smallest vertex id (sym graph)."""
    ctes = ["d0 AS MATERIALIZED (SELECT id, 0 AS dist FROM verts "
            "WHERE id = (SELECT min(id) FROM verts))"]
    for k in range(iters):
        ctes.append(
            f"""d{k + 1} AS MATERIALIZED (
  SELECT id, CAST(min(dist) AS INT) AS dist FROM (
    SELECT id, dist FROM d{k}
    UNION ALL
    SELECT e.dst AS id, d.dist + 1 AS dist FROM d{k} d JOIN edges e ON e.src = d.id
  ) u GROUP BY id)"""
        )
    return SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes), f"d{iters}"


def _sql_bfs_query() -> str:
    prefix, last = _sql_bfs()
    return prefix + f"\nSELECT id, dist FROM {last} ORDER BY id"


def _sql_tree_stat() -> str:
    prefix, last = _sql_bfs()
    return prefix + f""",
lv AS (SELECT dist, count(*) AS n FROM {last} GROUP BY dist)
SELECT (SELECT CAST(max(dist) AS BIGINT) FROM {last}) AS depth,
       (SELECT CAST(max(n) AS BIGINT) FROM lv) AS width"""


def _sql_sssp(iters: int = 8) -> str:
    """Unrolled min-plus relaxation from the smallest vertex; ``iters`` must
    be >= the max hop count of any weighted shortest path (measured 4 at
    sf0.01, 5 at sf0.1 on the co-occurrence graph; 8 = headroom)."""
    ctes = ["""sd0 AS MATERIALIZED (
  SELECT id, CAST(0.0 AS DOUBLE) AS dist FROM verts
  WHERE id = (SELECT min(id) FROM verts))"""]
    for k in range(iters):
        ctes.append(f"""sd{k + 1} AS MATERIALIZED (
  SELECT id, min(dist) AS dist FROM (
    SELECT id, dist FROM sd{k}
    UNION ALL
    SELECT e.dst AS id, d.dist + e.weight AS dist
    FROM sd{k} d JOIN edges e ON e.src = d.id) u
  GROUP BY id)""")
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT id, round(dist, 6) AS dist FROM sd{iters} ORDER BY id"
    )


def _sql_widest(iters: int = 14) -> str:
    """Unrolled max-min (bottleneck) relaxation from the smallest vertex;
    ``iters`` must be >= the max hop count of any bottleneck-OPTIMAL path
    (measured via DuckDB fixpoint probe: 6 at sf0.001, 10 at sf0.01 —
    vs 4/5 for sssp's min-plus on the same graph: wide detours genuinely
    run longer than shortest paths; 14 = headroom, extra rounds are
    idempotent).  Root capacity +inf; root excluded from the output so
    every value is a finite edge weight."""
    ctes = ["""wp0 AS MATERIALIZED (
  SELECT id, CAST('infinity' AS DOUBLE) AS cap FROM verts
  WHERE id = (SELECT min(id) FROM verts))"""]
    for k in range(iters):
        ctes.append(f"""wp{k + 1} AS MATERIALIZED (
  SELECT id, max(cap) AS cap FROM (
    SELECT id, cap FROM wp{k}
    UNION ALL
    SELECT e.dst AS id, least(d.cap, e.weight) AS cap
    FROM wp{k} d JOIN edges e ON e.src = d.id) u
  GROUP BY id)""")
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"""
SELECT id, round(cap, 6) AS cap FROM wp{iters}
WHERE id != (SELECT min(id) FROM verts) ORDER BY id"""
    )


def _sql_minhash_calibration(num_hashes: int = 64, bands: int = 16,
                             n: int = 3) -> str:
    """Mirror of functions/dedup.minhash_calibration: the
    _sql_minhash_candidates chain (portable Kirsch-Mitzenmacher family)
    plus per-candidate-pair slot-match counts, exact shingle
    intersection/sizes, and the three rounded read-out divisions."""
    rows = num_hashes // bands
    sig_aggs = ", ".join(f"min(h1 + {i} * h2) AS s{i}"
                         for i in range(num_hashes))
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(f"CAST(s{b * rows + j} AS VARCHAR)"
                             for j in range(rows))
        + " AS bucket FROM sig"
        for b in range(bands)
    )
    match_sum = " + ".join(
        f"CASE WHEN xa.s{i} = xb.s{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
  FROM documents),
sh AS MATERIALIZED (SELECT doc_id,
        CASE WHEN length(toks) >= {n} THEN
          list_distinct([array_to_string(toks[i:i+{n - 1}], ' ')
                         for i in range(1, length(toks) - {n - 2})])
        ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM sh),
hh AS MATERIALIZED (SELECT doc_id, s, {H1_SQL.format(s='s')} AS h1,
                           {H2_SQL.format(s='s')} AS h2 FROM ex),
sig AS MATERIALIZED (SELECT doc_id, {sig_aggs} FROM hh GROUP BY doc_id),
banded AS MATERIALIZED (
  {band_selects}),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
mt AS (SELECT c.a, c.b, CAST({match_sum} AS BIGINT) AS n_match
       FROM cand c JOIN sig xa ON xa.doc_id = c.a
       JOIN sig xb ON xb.doc_id = c.b),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
          FROM ex GROUP BY doc_id),
inter AS (SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS i
          FROM cand c
          JOIN ex xa ON xa.doc_id = c.a
          JOIN ex xb ON xb.doc_id = c.b AND xb.s = xa.s
          GROUP BY c.a, c.b)
SELECT m.a, m.b, m.n_match,
       round(coalesce(i.i, 0)
             / (sa.c + sb.c - coalesce(i.i, 0)), 6) AS jaccard,
       round(m.n_match / {float(num_hashes)}, 6) AS est,
       round(m.n_match / {float(num_hashes)}
             - coalesce(i.i, 0)
               / (sa.c + sb.c - coalesce(i.i, 0)), 6) AS err
FROM mt m
LEFT JOIN inter i ON m.a = i.a AND m.b = i.b
JOIN sizes sa ON sa.doc_id = m.a
JOIN sizes sb ON sb.doc_id = m.b
ORDER BY m.a, m.b"""


def _sql_graphsage(layers: int = 2, dim: int = 64) -> str:
    """Mirror of q_graphsage_features: int64 micro-unit quantization,
    per-layer q' = floor((q*deg + sum_nbr q) / (2.0*deg)) over the
    symmetrized planted citation graph (floor matches Spark's F.floor;
    DuckDB's // would also floor but Spark's `div` would truncate —
    the negative-sum trap the tests pin)."""
    ctes = [f"""cg AS MATERIALIZED ({_sql_reference_graph()})""", """se0 AS MATERIALIZED (
  SELECT src, dst FROM cg UNION SELECT dst AS src, src AS dst FROM cg)""", """fe AS (SELECT DISTINCT vec_id AS id FROM embeddings)""", """se AS MATERIALIZED (
  -- feature-less vertices are dropped from the universe AND from
  -- neighbor means (the engine contract, algos/sage.py): edges keep
  -- only feature-carrying endpoints, so deg is the FILTERED degree —
  -- at SFs where some graph vertices lack embedding rows the
  -- unfiltered degree would deflate every mean (caught at sf0.1)
  SELECT se0.src, se0.dst FROM se0
  JOIN fe a ON se0.src = a.id JOIN fe b ON se0.dst = b.id)""", """degs AS MATERIALIZED (
  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM se GROUP BY src)""", f"""dims AS (SELECT unnest(generate_series(1, {dim})) AS d)""", """sg0 AS MATERIALIZED (
  SELECT e.vec_id AS id, CAST(dims.d - 1 AS INTEGER) AS dim,
         CAST(round(CAST(e.embedding[dims.d] AS DOUBLE) * 1000000, 0)
              AS BIGINT) AS q
  FROM embeddings e, dims)"""]
    for k in range(layers):
        ctes.append(f"""sg{k + 1} AS MATERIALIZED (
  SELECT b.id, b.dim,
         CASE WHEN coalesce(d.deg, 0) > 0
              THEN CAST(floor((b.q * d.deg + coalesce(g.s, 0))
                              / (2.0 * d.deg)) AS BIGINT)
              ELSE b.q END AS q
  FROM sg{k} b
  LEFT JOIN (SELECT e.dst AS id, f.dim, CAST(sum(f.q) AS BIGINT) AS s
             FROM se e JOIN sg{k} f ON e.src = f.id
             GROUP BY e.dst, f.dim) g
    ON b.id = g.id AND b.dim = g.dim
  LEFT JOIN degs d ON b.id = d.id)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id, dim, round(q / 1000000.0, 6) AS value
FROM sg{layers} ORDER BY id, dim"""
    )


def _sql_landmark_stretch(num_roots: int = 64, num_landmarks: int = 4,
                          bfs_iters: int = 6) -> str:
    """Mirror of algos/closeness.landmark_stretch: landmarks = the
    ``num_landmarks`` smallest sample roots, estimate = min over
    landmarks of d(l,r)+d(l,v), histogram of estimate - exact over the
    shared multi-source BFS distances (same pinned bfs_iters as the
    closeness_exact/eccentricity oracles)."""
    m = f"m{bfs_iters}"
    return _sql_multi_bfs_ctes(num_roots, bfs_iters) + f""",
lmk AS (SELECT root FROM roots ORDER BY root LIMIT {num_landmarks}),
ev AS (SELECT root FROM roots
       WHERE root NOT IN (SELECT root FROM lmk)),
lv AS MATERIALIZED (
  SELECT mm.root AS l, mm.id AS v, mm.dist AS dlv
  FROM {m} mm JOIN lmk ON mm.root = lmk.root),
lr AS (SELECT lv.l, lv.v AS r, lv.dlv AS dlr
       FROM lv JOIN ev ON lv.v = ev.root),
est AS MATERIALIZED (
  SELECT lr.r, lv.v, min(lr.dlr + lv.dlv) AS dest
  FROM lr JOIN lv ON lr.l = lv.l GROUP BY lr.r, lv.v),
ex AS (SELECT mm.root AS r, mm.id AS v, mm.dist AS dex
       FROM {m} mm JOIN ev ON mm.root = ev.root
       WHERE mm.id <> mm.root)
SELECT CAST(e.dest - x.dex AS INTEGER) AS stretch,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM ex x JOIN est e ON x.r = e.r AND x.v = e.v
GROUP BY 1 ORDER BY 1"""


def _sql_temporal_reach(iters: int = 10) -> str:
    """Unrolled earliest-arrival relaxation over the co-activity
    CONTACT list (one row per pair/type/hour-bucket, epoch-micros
    times); ``iters`` must be >= the temporal diameter (measured
    fixpoint: 6 at both sf0.001 and sf0.01; 10 = headroom, extra
    rounds are idempotent).  Root arrival -2^62 excluded from the
    output so every value is a real contact time."""
    ctes = ["""ue AS MATERIALIZED (
  SELECT DISTINCT user_id AS u, event_type AS t,
         date_trunc('hour', ts) AS h
  FROM events)""", """okb AS (
  SELECT t, h FROM ue GROUP BY t, h HAVING count(*) <= 256)""", """u2 AS MATERIALIZED (
  SELECT ue.u, ue.t, ue.h FROM ue
  JOIN okb ON ue.t = okb.t AND ue.h = okb.h)""", """contacts AS MATERIALIZED (
  SELECT DISTINCT a.u AS src, b.u AS dst, epoch_us(a.h) AS tm
  FROM u2 a JOIN u2 b ON a.t = b.t AND a.h = b.h AND a.u <> b.u)""", """tr0 AS MATERIALIZED (
  SELECT CAST((SELECT min(src) FROM contacts) AS BIGINT) AS id,
         CAST(-4611686018427387904 AS BIGINT) AS arr)"""]
    for k in range(iters):
        ctes.append(f"""tr{k + 1} AS MATERIALIZED (
  SELECT id, min(arr) AS arr FROM (
    SELECT id, arr FROM tr{k}
    UNION ALL
    SELECT c.dst AS id, c.tm AS arr
    FROM tr{k} r JOIN contacts c ON c.src = r.id AND c.tm >= r.arr) u
  GROUP BY id)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id, arr AS arrival FROM tr{iters}
WHERE id != (SELECT min(src) FROM contacts) ORDER BY id"""
    )


def _sql_sinkhorn(iters: int) -> str:
    """Unrolled Sinkhorn-Knopp row/col normalizations on the
    (source, lang) doc-count matrix toward probability marginals
    (1/|rows| per row, 1/|cols| per col); mirrors functions/sampling
    sinkhorn_mixing_weights (cnt * u * v, left-assoc, 6dp round)."""
    ctes = [
        """m AS MATERIALIZED (
  SELECT source AS r, lang AS c, CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY source, lang)""",
        """tr AS MATERIALIZED (
  SELECT 1.0 / CAST(count(DISTINCT r) AS DOUBLE) AS row_t FROM m)""",
        """tc AS MATERIALIZED (
  SELECT 1.0 / CAST(count(DISTINCT c) AS DOUBLE) AS col_t FROM m)""",
        "v0 AS MATERIALIZED (SELECT DISTINCT c, CAST(1.0 AS DOUBLE) AS v FROM m)",
    ]
    for k in range(iters):
        ctes.append(
            f"""u{k + 1} AS MATERIALIZED (
  SELECT r, row_t / sum(cnt * v) AS u
  FROM m JOIN v{k} USING (c) CROSS JOIN tr GROUP BY r, row_t)"""
        )
        ctes.append(
            f"""v{k + 1} AS MATERIALIZED (
  SELECT c, col_t / sum(cnt * u) AS v
  FROM m JOIN u{k + 1} USING (r) CROSS JOIN tc GROUP BY c, col_t)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT m.r AS source, m.c AS lang, m.cnt AS n_docs,
       round(m.cnt * u.u * v.v, 6) AS weight
FROM m JOIN u{iters} u USING (r) JOIN v{iters} v USING (c)"""
    )


def _sql_kcore(iters: int = KCORE_SQL_ITERS) -> str:
    """Unrolled Montresor h-index iteration (kcore.hpp:191-232)."""
    ctes = ["c0 AS MATERIALIZED (SELECT id, CAST(deg AS BIGINT) AS core FROM deg)"]
    for k in range(iters):
        ctes.append(
            f"""c{k + 1} AS MATERIALIZED (
  SELECT s.id, least(s.core, COALESCE(h.h, s.core)) AS core
  FROM c{k} s LEFT JOIN (
    SELECT id, max(least(rn, nc)) AS h FROM (
      SELECT e.dst AS id, n.core AS nc,
             CAST(row_number() OVER (PARTITION BY e.dst
                                     ORDER BY n.core DESC, e.src ASC) AS BIGINT) AS rn
      FROM edges e JOIN c{k} n ON e.src = n.id) t
    GROUP BY id) h ON s.id = h.id)"""
        )
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT id, core AS coreness FROM c{iters} ORDER BY id"
    )


ONION_SQL_ROUNDS = 168  # measured fixpoints: <=88 at sf0.01, 144 at
# sf0.1 (the r5 sf0.1 tail replica caught the 88-pin truncating there;
# tools/validate_fixpoint.py is the loop-to-convergence twin that
# measures the depth at any sf)


def _sql_onion(rounds: int = ONION_SQL_ROUNDS) -> str:
    """Mirror of algos/kcore.onion_layers: branch-free batch peel —
    round r removes every remaining vertex with degree <= k_r where
    k_r = max(k_{r-1}, min remaining degree); an empty remainder
    coalesces the min to k_{r-1}, so extra pinned rounds emit nothing."""
    ctes = [
        "rem0 AS MATERIALIZED (SELECT id FROM verts)",
        "k0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS kk)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(f"""dg{r} AS MATERIALIZED (
  SELECT v.id, COALESCE(d.cnt, 0) AS dg
  FROM rem{p} v LEFT JOIN (
    SELECT e.src AS id, CAST(count(*) AS BIGINT) AS cnt
    FROM edges e JOIN rem{p} a ON e.src = a.id
                 JOIN rem{p} b ON e.dst = b.id
    GROUP BY e.src) d ON v.id = d.id)""")
        ctes.append(f"""k{r} AS MATERIALIZED (
  SELECT greatest((SELECT kk FROM k{p}),
                  COALESCE((SELECT min(dg) FROM dg{r}),
                           (SELECT kk FROM k{p}))) AS kk)""")
        ctes.append(f"""o{r} AS MATERIALIZED (
  SELECT id, CAST({r} AS BIGINT) AS layer, (SELECT kk FROM k{r}) AS core
  FROM dg{r} WHERE dg <= (SELECT kk FROM k{r}))""")
        ctes.append(f"""rem{r} AS MATERIALIZED (
  SELECT id FROM dg{r} WHERE dg > (SELECT kk FROM k{r}))""")
    union = " UNION ALL ".join(
        f"SELECT * FROM o{r}" for r in range(1, rounds + 1)
    )
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\n{union}\nORDER BY id"
    )


def _sql_closeness(samples: int = CLOSENESS_SAMPLES, bfs_iters: int = 5,
                   wcc_iters: int = 10) -> str:
    """Sampled closeness with the engine's deterministic sample policy:
    the ``samples`` smallest member ids of the major component."""
    ctes = ["l0 AS MATERIALIZED (SELECT id, id AS lab FROM verts)"]
    for k in range(wcc_iters):
        ctes.append(
            f"""l{k + 1} AS MATERIALIZED (
  SELECT v.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM verts v JOIN l{k} l ON v.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM edges e JOIN l{k} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON v.id = m.id)"""
        )
    ctes.append(
        f"""major AS MATERIALIZED (
  SELECT lab FROM (SELECT lab, count(*) AS n FROM l{wcc_iters} GROUP BY lab
                   ORDER BY n DESC, lab ASC LIMIT 1) x),
members AS MATERIALIZED (
  SELECT id FROM l{wcc_iters} WHERE lab = (SELECT lab FROM major)),
roots AS MATERIALIZED (
  SELECT id AS root FROM members ORDER BY id LIMIT {samples}),
fac AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE)
         / (SELECT count(*) FROM roots)
         / (count(*) - 1) AS f
  FROM members),
m0 AS MATERIALIZED (SELECT root, root AS id, 0 AS dist FROM roots)"""
    )
    for k in range(bfs_iters):
        ctes.append(
            f"""m{k + 1} AS MATERIALIZED (
  SELECT root, id, CAST(min(dist) AS INT) AS dist FROM (
    SELECT root, id, dist FROM m{k}
    UNION ALL
    SELECT d.root, e.dst AS id, d.dist + 1 AS dist
    FROM m{k} d JOIN edges e ON e.src = d.id
  ) u GROUP BY root, id)"""
        )
    return SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes) + f""",
sums AS (SELECT id, CAST(sum(dist) AS DOUBLE) AS s FROM m{bfs_iters} GROUP BY id)
SELECT mem.id,
       round(CASE WHEN COALESCE(su.s, 0) > 0
                  THEN 1.0 / ((SELECT f FROM fac) * su.s)
                  ELSE 0.0 END, 6) AS closeness
FROM members mem LEFT JOIN sums su ON mem.id = su.id ORDER BY mem.id"""


def _sql_eigenvector(iters: int = 5) -> str:
    """Mirror of algos/eigenvector.eigenvector_centrality: L1-normalized
    power iteration over the undirected (both-direction) edge set."""
    ctes = ["x0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS x "
            "FROM verts)"]
    for k in range(1, iters + 1):
        ctes.append(f"""g{k} AS MATERIALIZED (
  SELECT e.dst AS id, sum(x.x) AS s
  FROM edges e JOIN x{k - 1} x ON e.src = x.id GROUP BY e.dst),
x{k} AS MATERIALIZED (
  SELECT v.id, COALESCE(g.s, 0) / (SELECT sum(s) FROM g{k}) AS x
  FROM verts v LEFT JOIN g{k} g ON v.id = g.id)""")
    return (SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
            + f"\nSELECT id, round(x, 6) AS score FROM x{iters} ORDER BY id")


def _sql_pseudo_diameter(bfs_iters: int = 8) -> str:
    """Mirror of algos/bfs.pseudo_diameter: double-sweep BFS from the
    smallest vertex id; ``bfs_iters`` pinned past the measured
    eccentricity (extra rounds are min-dist fixpoint no-ops)."""
    ctes = ["""st AS MATERIALIZED (SELECT min(id) AS r FROM verts),
b0 AS MATERIALIZED (SELECT (SELECT r FROM st) AS id, 0 AS dist)"""]
    for k in range(bfs_iters):
        ctes.append(f"""b{k + 1} AS MATERIALIZED (
  SELECT id, CAST(min(dist) AS INT) AS dist FROM (
    SELECT id, dist FROM b{k}
    UNION ALL
    SELECT e.dst AS id, d.dist + 1 AS dist
    FROM b{k} d JOIN edges e ON e.src = d.id
  ) u GROUP BY id)""")
    ctes.append(f"""fr AS MATERIALIZED (
  SELECT id, dist FROM b{bfs_iters} ORDER BY dist DESC, id ASC LIMIT 1),
c0 AS MATERIALIZED (SELECT (SELECT id FROM fr) AS id, 0 AS dist)""")
    for k in range(bfs_iters):
        ctes.append(f"""c{k + 1} AS MATERIALIZED (
  SELECT id, CAST(min(dist) AS INT) AS dist FROM (
    SELECT id, dist FROM c{k}
    UNION ALL
    SELECT e.dst AS id, d.dist + 1 AS dist
    FROM c{k} d JOIN edges e ON e.src = d.id
  ) u GROUP BY id)""")
    return SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes) + f"""
SELECT (SELECT r FROM st) AS start_id,
       (SELECT id FROM fr) AS far_id,
       CAST((SELECT max(dist) FROM c{bfs_iters}) AS INT) AS diameter_lb"""


def _sql_multi_bfs_ctes(num_roots: int = 64, bfs_iters: int = 6,
                        wcc_iters: int = 10) -> str:
    """Unrolled major-component multi-source BFS chain (shared by the
    closeness_exact and eccentricity oracles): hash-min WCC to find the
    major component, roots = its ``num_roots`` smallest ids, then
    ``bfs_iters`` frontier rounds into m{bfs_iters} = (root, id, dist)."""
    ctes = ["l0 AS MATERIALIZED (SELECT id, id AS lab FROM verts)"]
    for k in range(wcc_iters):
        ctes.append(
            f"""l{k + 1} AS MATERIALIZED (
  SELECT v.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM verts v JOIN l{k} l ON v.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM edges e JOIN l{k} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON v.id = m.id)"""
        )
    ctes.append(
        f"""major AS MATERIALIZED (
  SELECT lab FROM (SELECT lab, count(*) AS n FROM l{wcc_iters} GROUP BY lab
                   ORDER BY n DESC, lab ASC LIMIT 1) x),
members AS MATERIALIZED (
  SELECT id FROM l{wcc_iters} WHERE lab = (SELECT lab FROM major)),
roots AS MATERIALIZED (
  SELECT id AS root FROM members ORDER BY id LIMIT {num_roots}),
m0 AS MATERIALIZED (SELECT root, root AS id, 0 AS dist FROM roots)"""
    )
    for k in range(bfs_iters):
        ctes.append(
            f"""m{k + 1} AS MATERIALIZED (
  SELECT root, id, CAST(min(dist) AS INT) AS dist FROM (
    SELECT root, id, dist FROM m{k}
    UNION ALL
    SELECT d.root, e.dst AS id, d.dist + 1 AS dist
    FROM m{k} d JOIN edges e ON e.src = d.id
  ) u GROUP BY root, id)"""
        )
    return SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)


def _sql_closeness_exact(num_roots: int = 64, bfs_iters: int = 6,
                         wcc_iters: int = 10) -> str:
    """Mirror of algos/closeness.closeness_exact (Bavelas per-root exact):
    (V-1)/sum-of-distances per root over a FULL BFS; ``bfs_iters`` pinned
    past the measured root eccentricity (extra rounds are fixpoint
    no-ops)."""
    return _sql_multi_bfs_ctes(num_roots, bfs_iters, wcc_iters) + f""",
sums AS (SELECT root, CAST(sum(dist) AS BIGINT) AS s
         FROM m{bfs_iters} GROUP BY root)
SELECT root AS id,
       round(CASE WHEN s > 0
                  THEN CAST((SELECT count(*) FROM verts) - 1 AS DOUBLE)
                       / CAST(s AS DOUBLE)
                  ELSE 0.0 END, 6) AS closeness
FROM sums ORDER BY id"""


def _sql_eccentricity(num_roots: int = 64, bfs_iters: int = 6,
                      wcc_iters: int = 10) -> str:
    """Mirror of algos/closeness.eccentricity: per-root max BFS distance
    and reached count over the same pinned-root multi-source chain."""
    return _sql_multi_bfs_ctes(num_roots, bfs_iters, wcc_iters) + f"""
SELECT root AS id, CAST(max(dist) AS BIGINT) AS ecc,
       CAST(count(*) AS BIGINT) AS n_reached
FROM m{bfs_iters} GROUP BY root ORDER BY root"""


def _sql_harmonic(samples: int = CLOSENESS_SAMPLES, radius: int = 5,
                  wcc_iters: int = 10) -> str:
    """Mirror of algos/closeness.harmonic_sampled: radius-truncated sampled
    harmonic centrality, integer L/d weights (L = lcm(1..radius)) so the
    fold is order-free exact; same deterministic sample policy as
    closeness (the ``samples`` smallest member ids of the major comp)."""
    import math as _math

    lcm = _math.lcm(*range(1, radius + 1))
    ctes = ["l0 AS MATERIALIZED (SELECT id, id AS lab FROM verts)"]
    for k in range(wcc_iters):
        ctes.append(
            f"""l{k + 1} AS MATERIALIZED (
  SELECT v.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM verts v JOIN l{k} l ON v.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM edges e JOIN l{k} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON v.id = m.id)"""
        )
    ctes.append(
        f"""major AS MATERIALIZED (
  SELECT lab FROM (SELECT lab, count(*) AS n FROM l{wcc_iters} GROUP BY lab
                   ORDER BY n DESC, lab ASC LIMIT 1) x),
members AS MATERIALIZED (
  SELECT id FROM l{wcc_iters} WHERE lab = (SELECT lab FROM major)),
roots AS MATERIALIZED (
  SELECT id AS root FROM members ORDER BY id LIMIT {samples}),
fac AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE)
         / (SELECT count(*) FROM roots)
         / (count(*) - 1) AS f
  FROM members),
m0 AS MATERIALIZED (SELECT root, root AS id, 0 AS dist FROM roots)"""
    )
    for k in range(radius):
        ctes.append(
            f"""m{k + 1} AS MATERIALIZED (
  SELECT root, id, CAST(min(dist) AS INT) AS dist FROM (
    SELECT root, id, dist FROM m{k}
    UNION ALL
    SELECT d.root, e.dst AS id, d.dist + 1 AS dist
    FROM m{k} d JOIN edges e ON e.src = d.id
  ) u GROUP BY root, id)"""
        )
    return SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes) + f""",
sums AS (SELECT id, CAST(sum(CASE WHEN dist > 0 THEN {lcm} // dist
                                  ELSE 0 END) AS BIGINT) AS s
         FROM m{radius} GROUP BY id)
SELECT mem.id,
       round(CAST(COALESCE(su.s, 0) AS DOUBLE)
             * ((SELECT f FROM fac) / {lcm}), 6) AS harmonic
FROM members mem LEFT JOIN sums su ON mem.id = su.id ORDER BY mem.id"""


TOKEN_RE_SQL = "[A-Za-z0-9_]+"


def _walk_u_sql(step: int, seed: int = 42) -> str:
    """Mirror of algos/walks._step_uniform(hash_impl='portable')."""
    h = (f"CAST(('0x' || substr(md5(CAST(w.walk_id AS VARCHAR)"
         f" || '|{step}|{seed}'), 1, 14)) AS BIGINT)")
    return f"(({h} % 1000003) / 1000003.0)"


def _walk_pick_sql(step: int, seed: int = 42) -> str:
    """nbrs[floor(u*deg) % deg + 1] — identical truncation both engines."""
    u = _walk_u_sql(step, seed)
    return (f"a.nbrs[(CAST(floor({u} * length(a.nbrs)) AS BIGINT)"
            f" % length(a.nbrs)) + 1]")


def _sql_random_walks(walk_length: int = 5, seed: int = 42) -> str:
    ctes = ["""adjw AS MATERIALIZED (
  SELECT src AS cur, list(DISTINCT dst ORDER BY dst) AS nbrs
  FROM edges GROUP BY src),
rw0 AS MATERIALIZED (SELECT id AS walk_id, id AS cur, 1 AS plen FROM verts)"""]
    for k in range(1, walk_length):
        ctes.append(f"""rw{k} AS MATERIALIZED (
  SELECT w.walk_id,
         COALESCE({_walk_pick_sql(k, seed)}, w.cur) AS cur,
         w.plen + CASE WHEN a.nbrs IS NULL THEN 0 ELSE 1 END AS plen
  FROM rw{k - 1} w LEFT JOIN adjw a ON w.cur = a.cur)""")
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT walk_id, CAST(plen AS INT) AS path_len, cur AS last"
          f" FROM rw{walk_length - 1}"
    )


def _sql_node2vec_walks(walk_length: int = 4, seed: int = 42,
                        p: float = 0.5, q: float = 2.0) -> str:
    """Unrolled node2vec (algos/walks.pick_biased semantics): weights
    1/p back-to-prev, 1.0 distance-1, 1/q distance-2; pick = searchsorted
    over the weight cumsum at u*total (side='right', clipped). Weights
    0.5/1.0/2.0 are exact binary fractions so the cumsum is bit-identical
    across engines; membership test mirrors the sorted-array probe."""
    inv_p, inv_q = 1.0 / p, 1.0 / q
    ctes = ["""adjw AS MATERIALIZED (
  SELECT src AS cur, list(DISTINCT dst ORDER BY dst) AS nbrs
  FROM edges GROUP BY src),
n2v0 AS MATERIALIZED (
  SELECT id AS walk_id, id AS cur, CAST(NULL AS BIGINT) AS prev, 1 AS plen
  FROM verts)"""]
    for k in range(1, walk_length):
        u = _walk_u_sql(k, seed)
        if k == 1:
            # prev is NULL on the first hop: uniform pick (pick_biased's
            # int(u*len)%len branch == the uniform formula)
            ctes.append(f"""n2v1 AS MATERIALIZED (
  SELECT w.walk_id,
         COALESCE({_walk_pick_sql(k, seed)}, w.cur) AS cur,
         w.cur AS prev,
         w.plen + CASE WHEN a.nbrs IS NULL THEN 0 ELSE 1 END AS plen
  FROM n2v0 w LEFT JOIN adjw a ON w.cur = a.cur)""")
            continue
        ctes.append(f"""ex{k} AS MATERIALIZED (
  SELECT w.walk_id, w.cur, w.prev, {u} AS u,
         unnest(a.nbrs) AS cand, generate_subscripts(a.nbrs, 1) AS pos
  FROM n2v{k - 1} w JOIN adjw a ON w.cur = a.cur),
wg{k} AS MATERIALIZED (
  SELECT e.walk_id, e.cand, e.pos, e.u,
         CASE WHEN e.cand = e.prev THEN {inv_p!r}
              WHEN list_contains(pa.nbrs, e.cand) THEN 1.0
              ELSE {inv_q!r} END AS wgt
  FROM ex{k} e JOIN adjw pa ON e.prev = pa.cur),
cm{k} AS MATERIALIZED (
  SELECT walk_id, cand, pos, u,
         sum(wgt) OVER (PARTITION BY walk_id ORDER BY pos) AS cum,
         sum(wgt) OVER (PARTITION BY walk_id) AS tot,
         count(*) OVER (PARTITION BY walk_id) AS deg
  FROM wg{k}),
pk{k} AS MATERIALIZED (
  SELECT walk_id,
         least(sum(CASE WHEN cum <= u * tot THEN 1 ELSE 0 END),
               any_value(deg) - 1) AS idx
  FROM cm{k} GROUP BY walk_id),
n2v{k} AS MATERIALIZED (
  SELECT w.walk_id, a.nbrs[CAST(pk.idx AS INT) + 1] AS cur,
         w.cur AS prev, w.plen + 1 AS plen
  FROM n2v{k - 1} w JOIN pk{k} pk ON w.walk_id = pk.walk_id
  JOIN adjw a ON w.cur = a.cur)""")
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT walk_id, CAST(plen AS INT) AS path_len, cur AS last"
          f" FROM n2v{walk_length - 1}"
    )


def _sql_metapath_walks(walk_length: int = 4, seed: int = 42) -> str:
    """Mirror of q_metapath_walks: co-order graph typed by order parity,
    walks alternating even/odd edge types."""
    ctes = ["""li2 AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS k, l_partkey FROM lineitem),
typed AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst,
         CASE WHEN o.o_orderkey % 2 = 0 THEN 'even' ELSE 'odd' END AS etype
  FROM li2 a JOIN li2 b ON a.k = b.k AND a.l_partkey != b.l_partkey
  JOIN orders o ON o.o_orderkey = a.k),
adj_even AS MATERIALIZED (
  SELECT src AS cur, list(DISTINCT dst ORDER BY dst) AS nbrs
  FROM typed WHERE etype = 'even' GROUP BY src),
adj_odd AS MATERIALIZED (
  SELECT src AS cur, list(DISTINCT dst ORDER BY dst) AS nbrs
  FROM typed WHERE etype = 'odd' GROUP BY src),
mw0 AS MATERIALIZED (
  SELECT cur AS walk_id, cur, 1 AS plen, FALSE AS stopped FROM adj_even)"""]
    metapath = ["even", "odd"]
    for k in range(1, walk_length):
        adj = f"adj_{metapath[(k - 1) % 2]}"
        pick = _walk_pick_sql(k, seed)
        ctes.append(f"""mw{k} AS MATERIALIZED (
  SELECT w.walk_id,
         CASE WHEN w.stopped OR a.nbrs IS NULL THEN w.cur
              ELSE {pick} END AS cur,
         w.plen + CASE WHEN w.stopped OR a.nbrs IS NULL THEN 0 ELSE 1 END AS plen,
         (w.stopped OR a.nbrs IS NULL) AS stopped
  FROM mw{k - 1} w LEFT JOIN {adj} a ON w.cur = a.cur)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT walk_id, CAST(plen AS INT) AS path_len, cur AS last"
          f" FROM mw{walk_length - 1}"
    )


EMB_SQL_PREFIX = """
WITH v AS MATERIALIZED (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
"""


H1_SQL = "CAST(('0x' || substr(md5({s}), 1, 14)) AS BIGINT)"


H2_SQL = "CAST(('0x' || substr(md5({s}), 18, 13)) AS BIGINT)"


def _sql_reference_graph() -> str:
    """Mirror of q_reference_graph: the planted 'see:doc<t>' citation
    digraph (src, dst) — shared by the reference_graph and dyad_census
    oracles."""
    return f"""
            WITH nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
                        FROM documents),
            p AS (SELECT doc_id,
                    text || ' see:doc' ||
                    CAST({H1_SQL.format(
                        s="('ref|' || CAST(doc_id AS VARCHAR) || '|0')")}
                         % n AS VARCHAR) ||
                    ' see:doc' ||
                    CAST({H1_SQL.format(
                        s="('ref|' || CAST(doc_id AS VARCHAR) || '|1')")}
                         % n AS VARCHAR) AS text2
                  FROM documents, nn),
            r AS (SELECT doc_id AS src,
                         CAST(unnest(regexp_extract_all(text2,
                              'see:doc([0-9]+)', 1)) AS BIGINT) AS dst
                  FROM p)
            SELECT DISTINCT src, dst FROM r
            WHERE src != dst
              AND dst IN (SELECT doc_id FROM documents)"""


def _cos_sql(x: str, y: str) -> str:
    """Mirror of functions/similarity.cosine_sim_col (verified 0/4950
    6dp-rounded mismatches vs the Spark zip_with/aggregate form)."""
    return (
        f"(list_dot_product({x}, {y}) / greatest("
        f"sqrt(list_dot_product({x}, {x})) * sqrt(list_dot_product({y}, {y})),"
        f" 1e-300))"
    )


def _sql_bucket_exprs(num_planes: int, num_tables: int, dim: int) -> list:
    """The Rademacher sign-LSH bucket expressions — same hashlib-derived
    +/-1 plane literals as functions/similarity.rademacher_planes, so both
    engines compute identical dot signs and buckets."""
    planes = rademacher_planes(num_tables, num_planes, dim)
    bucket_exprs = []
    for t in range(num_tables):
        bits = " + ".join(
            "(CASE WHEN list_dot_product(vec, ["
            + ", ".join(str(s) for s in planes[t][p])
            + f"]) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(num_planes)
        )
        bucket_exprs.append(f"(({bits}) * {num_tables} + {t})")
    return bucket_exprs


def _sql_lsh_ann(k: int = 5, num_planes: int = 10, num_tables: int = 3,
                 dim: int = 64) -> str:
    """Mirror of functions/similarity.lsh_bucketed_neighbors_portable."""
    bucket_exprs = _sql_bucket_exprs(num_planes, num_tables, dim)
    cos = _cos_sql("a.vec", "b.vec")
    return EMB_SQL_PREFIX + f""",
tg AS MATERIALIZED (
  SELECT id, vec, unnest([{", ".join(bucket_exprs)}]) AS bucket FROM v),
cand AS MATERIALIZED (
  SELECT DISTINCT a.id AS query_id, b.id AS nbr_id, round({cos}, 6) AS cosine
  FROM tg a JOIN tg b ON a.bucket = b.bucket AND a.id != b.id)
SELECT query_id, nbr_id, cosine, CAST(rn AS INT) AS "rank" FROM (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, nbr_id ASC) AS rn
  FROM cand) t WHERE rn <= {k}"""


def _sql_ann_topk(k: int = 5) -> str:
    cos = _cos_sql("a.vec", "b.vec")
    return EMB_SQL_PREFIX + f""",
p AS (SELECT a.id AS query_id, b.id AS nbr_id, round({cos}, 6) AS cosine
      FROM v a JOIN v b ON a.id != b.id)
SELECT query_id, nbr_id, cosine, CAST(rn AS INT) AS "rank" FROM (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, nbr_id ASC) AS rn
  FROM p) t WHERE rn <= {k}"""


def _sql_kmeans_ctes(n_clusters: int, lloyd_iters: int, dim: int) -> list:
    """Unrolled deterministic k-means CTE chain over ``v`` (mirror of
    functions/similarity._kmeans_fit + _kmeans_assign: seed centroids =
    smallest ids, Lloyd means rounded 6dp, sims 9dp).  Ends with ``idx``
    = (id, vec, cluster), the final assignment."""
    cos9 = f"round({_cos_sql('v.vec', 'c.cvec')}, 9)"

    def assign(name: str, cent: str) -> str:
        return f"""{name} AS MATERIALIZED (
  SELECT id, vec, cluster FROM (
    SELECT v.id, v.vec, c.cluster,
           row_number() OVER (PARTITION BY v.id
                              ORDER BY {cos9} DESC, c.cluster ASC) AS rn
    FROM v CROSS JOIN {cent} c) t WHERE rn = 1)"""

    ctes = [f"""c0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY id) - 1 AS cluster, vec AS cvec
  FROM v ORDER BY id LIMIT {n_clusters})"""]
    for r in range(lloyd_iters):
        ctes.append(assign(f"a{r}", f"c{r}"))
        ctes.append(f"""m{r} AS MATERIALIZED (
  SELECT cluster, pos, round(avg(vec[pos]), 6) AS m
  FROM a{r} CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS pos) p
  GROUP BY cluster, pos),
mv{r} AS MATERIALIZED (
  SELECT cluster, list(m ORDER BY pos) AS cvec FROM m{r} GROUP BY cluster),
c{r + 1} AS MATERIALIZED (
  SELECT c.cluster, COALESCE(m.cvec, c.cvec) AS cvec
  FROM c{r} c LEFT JOIN mv{r} m ON c.cluster = m.cluster)""")
    ctes.append(assign("idx", f"c{lloyd_iters}"))
    return ctes


def _sql_kmeans(n_clusters: int = 8, lloyd_iters: int = 2,
                dim: int = 64) -> str:
    """Mirror of functions/similarity.kmeans_clusters."""
    ctes = _sql_kmeans_ctes(n_clusters, lloyd_iters, dim)
    return (
        EMB_SQL_PREFIX + ", " + ",\n".join(ctes)
        + "\nSELECT id AS vec_id, CAST(cluster AS INT) AS cluster FROM idx"
    )


def _sql_embedding_project(out_dim: int = 16, dim: int = 64) -> str:
    """Mirror of functions/similarity.embedding_project — the same
    hashlib-derived +/-1 plane literals, scale 1/sqrt(out_dim) (a binary
    fraction for out_dim=16, so the product is exact)."""
    planes = rademacher_planes(1, out_dim, dim)[0]
    scale = 1.0 / math.sqrt(out_dim)
    comps = ", ".join(
        "round(list_dot_product(vec, ["
        + ", ".join(str(s) for s in planes[j])
        + f"]) * {scale!r}, 6)"
        for j in range(out_dim)
    )
    # zipped unnests (DuckDB unnests in SELECT run in lockstep) emit one
    # (vec_id, dim, value) row per coordinate — the driver-gate-safe
    # shape (its pandas canonicalizer cannot hash array cells)
    return EMB_SQL_PREFIX + f"""
SELECT id AS vec_id,
       CAST(unnest(generate_series(0, {out_dim - 1})) AS INT) AS dim,
       CAST(unnest([{comps}]) AS DOUBLE) AS value
FROM v"""


def _sql_ivf_ann(k: int = 5, n_clusters: int = 8, n_probe: int = 2,
                 lloyd_iters: int = 2, dim: int = 64) -> str:
    """Unrolled deterministic IVF (functions/similarity.ivf_ann semantics)."""
    cos9 = f"round({_cos_sql('v.vec', 'c.cvec')}, 9)"
    L = lloyd_iters
    ctes = _sql_kmeans_ctes(n_clusters, lloyd_iters, dim)
    ctes.append(f"""pr AS MATERIALIZED (
  SELECT id AS query_id, vec AS q_vec, cluster FROM (
    SELECT v.id, v.vec, c.cluster,
           row_number() OVER (PARTITION BY v.id
                              ORDER BY {cos9} DESC, c.cluster ASC) AS rn
    FROM v CROSS JOIN c{L} c) t WHERE rn <= {n_probe}),
cand AS MATERIALIZED (
  SELECT p.query_id, i.id AS nbr_id,
         round({_cos_sql('p.q_vec', 'i.vec')}, 6) AS cosine
  FROM pr p JOIN idx i ON p.cluster = i.cluster WHERE p.query_id != i.id)""")
    return EMB_SQL_PREFIX + ", " + ",\n".join(ctes) + f"""
SELECT query_id, nbr_id, cosine, CAST(rn AS INT) AS "rank" FROM (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, nbr_id ASC) AS rn
  FROM cand) t WHERE rn <= {k}"""


def _sql_embedding_dedup(threshold: float = 0.42, iters: int = 8,
                         num_planes: int = 10, num_tables: int = 3,
                         dim: int = 64) -> str:
    """Mirror of q_embedding_dedup: LSH-bucketed candidate pairs (same
    Rademacher plane literals as the Spark side) -> cosine threshold ->
    hash-min WCC keeper labels."""
    bucket_exprs = _sql_bucket_exprs(num_planes, num_tables, dim)
    cos = _cos_sql("a.vec", "b.vec")
    ctes = [f"""tg AS MATERIALIZED (
  SELECT id, vec, unnest([{", ".join(bucket_exprs)}]) AS bucket FROM v),
prs AS MATERIALIZED (
  SELECT DISTINCT a.id AS a, b.id AS b
  FROM tg a JOIN tg b ON a.bucket = b.bucket AND a.id < b.id
  WHERE round({cos}, 6) >= {threshold}),
pe AS MATERIALIZED (SELECT a AS src, b AS dst FROM prs
                    UNION ALL SELECT b AS src, a AS dst FROM prs),
pv AS MATERIALIZED (SELECT DISTINCT src AS id FROM pe),
w0 AS MATERIALIZED (SELECT id, id AS lab FROM pv)"""]
    for kk in range(iters):
        ctes.append(f"""w{kk + 1} AS MATERIALIZED (
  SELECT vv.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM pv vv JOIN w{kk} l ON vv.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM pe e JOIN w{kk} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON vv.id = m.id)""")
    return (
        EMB_SQL_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT id AS vec_id, lab AS keeper_id FROM w{iters} ORDER BY id"
    )


def _sql_lang_id() -> str:
    """Mirror of functions/text.lang_id_ngram: per-language literal-gram
    counts (non-overlapping, = replace-count), argmax with first-max-wins
    over sorted language names, 'unknown' when every score is 0."""
    langs = sorted(_LANG_PROFILES)
    score_cols = []
    for lang in langs:
        terms = [
            f"(length(t) - length(replace(t, '{g.replace(chr(39), chr(39) * 2)}', '')))"
            f" / {len(g)}"
            for g in _LANG_PROFILES[lang]
        ]
        score_cols.append("(" + " + ".join(terms) + f") AS s_{lang}")
    first_max = " ".join(
        f"WHEN s_{lang} = mx THEN '{lang}'" for lang in langs[:-1]
    )
    return f"""
WITH s AS (SELECT doc_id, lower(text) AS t FROM documents),
sc AS (SELECT doc_id, {', '.join(score_cols)} FROM s),
mxx AS (SELECT doc_id, {', '.join('s_' + lang for lang in langs)},
               greatest({', '.join('s_' + lang for lang in langs)}) AS mx
        FROM sc)
SELECT doc_id, CASE WHEN mx = 0 THEN 'unknown'
  {first_max} ELSE '{langs[-1]}' END AS lang_pred
FROM mxx"""


def _sql_simhash(bits: int = 56) -> str:
    """Mirror of functions/dedup.simhash_signatures_portable."""
    vs = ",\n       ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS v{b}" for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH tk AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS t
  FROM documents),
h AS MATERIALIZED (SELECT doc_id, {H1_SQL.format(s='t')} AS h FROM tk),
vv AS MATERIALIZED (SELECT doc_id, {vs} FROM h GROUP BY doc_id),
sg AS (SELECT doc_id, {sig} AS simhash FROM vv)
SELECT d.doc_id AS id, CAST(COALESCE(s.simhash, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN sg s ON d.doc_id = s.doc_id"""


def _sql_minhash_candidates(num_hashes: int = 64, bands: int = 16,
                            n: int = 3) -> str:
    """Mirror of functions/dedup.minhash_lsh_candidates(hash_impl='portable'):
    Kirsch-Mitzenmacher family h1 + i*h2 over distinct word-3-gram shingles,
    16 bands x 4 rows, bucket key = comma-joined slot string."""
    rows = num_hashes // bands
    sig_aggs = ", ".join(f"min(h1 + {i} * h2) AS s{i}" for i in range(num_hashes))
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(f"CAST(s{b * rows + j} AS VARCHAR)" for j in range(rows))
        + " AS bucket FROM sig"
        for b in range(bands)
    )
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
  FROM documents),
sh AS MATERIALIZED (SELECT doc_id,
        CASE WHEN length(toks) >= {n} THEN
          list_distinct([array_to_string(toks[i:i+{n - 1}], ' ')
                         for i in range(1, length(toks) - {n - 2})])
        ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM sh),
hh AS MATERIALIZED (SELECT doc_id, {H1_SQL.format(s='s')} AS h1,
                           {H2_SQL.format(s='s')} AS h2 FROM ex),
sig AS MATERIALIZED (SELECT doc_id, {sig_aggs} FROM hh GROUP BY doc_id),
banded AS MATERIALIZED (
  {band_selects})
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM banded x JOIN banded y
  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id"""


def _sql_curation(num_hashes: int = 64, bands: int = 16, n: int = 3,
                  wcc_iters: int = 6) -> str:
    """Mirror of functions/curation.curate_corpus(hash_impl='portable'):
    quality gate -> sha256 exact dedup -> portable minhash-LSH candidates
    -> 3-gram Jaccard >= 0.5 verify -> WCC closure -> stratified sample
    (en 0.5 / zh 1.0 / else 0.25) -> 90/5/5 split. Every stage value-exact
    because the LSH banding itself uses the portable md5 family."""
    rows = num_hashes // bands
    sig_aggs = ", ".join(f"min(h1 + {i} * h2) AS s{i}" for i in range(num_hashes))
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(f"CAST(s{b * rows + j} AS VARCHAR)" for j in range(rows))
        + " AS bucket FROM sig"
        for b in range(bands)
    )
    jac = ("round(length(list_intersect(sa.sh, sb.sh)) "
           "/ greatest(length(sa.sh) + length(sb.sh) "
           "- length(list_intersect(sa.sh, sb.sh)), 1), 6)")
    wcc_ctes = ",\n".join(
        ["w0 AS MATERIALIZED (SELECT id, id AS lab FROM pv)"]
        + [
            f"""w{k + 1} AS MATERIALIZED (
  SELECT v.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM pv v JOIN w{k} l ON v.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM pe e JOIN w{k} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON v.id = m.id)"""
            for k in range(wcc_iters)
        ]
    )
    return f"""
WITH qd AS MATERIALIZED (
  SELECT doc_id,
         (CAST(length(toks) AS BIGINT) >= 8
          AND round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    / greatest(length(text), 1), 6) >= 0.45
          AND round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    / greatest(length(text), 1), 6) <= 0.3
          AND round(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
                    / greatest(length(toks), 1), 6) BETWEEN 2.0 AND 12.0) AS keep
  FROM (SELECT doc_id, text,
               regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
        FROM documents)),
base AS MATERIALIZED (
  SELECT d.doc_id, d.text, d.lang FROM documents d
  JOIN qd ON d.doc_id = qd.doc_id WHERE qd.keep),
shx AS MATERIALIZED (SELECT doc_id, sha256(text) AS sha FROM base),
ek AS MATERIALIZED (SELECT sha, min(doc_id) AS ekeeper FROM shx GROUP BY sha),
ed AS MATERIALIZED (
  SELECT s.doc_id FROM shx s JOIN ek ON s.sha = ek.sha
  WHERE s.doc_id <> ek.ekeeper),
s1 AS MATERIALIZED (
  SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM ed)),
t AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks FROM s1),
sh AS MATERIALIZED (SELECT doc_id,
        CASE WHEN length(toks) >= {n} THEN
          list_distinct([array_to_string(toks[i:i+{n - 1}], ' ')
                         for i in range(1, length(toks) - {n - 2})])
        ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM sh),
hh AS MATERIALIZED (SELECT doc_id, {H1_SQL.format(s='s')} AS h1,
                           {H2_SQL.format(s='s')} AS h2 FROM ex),
sig AS MATERIALIZED (SELECT doc_id, {sig_aggs} FROM hh GROUP BY doc_id),
banded AS MATERIALIZED (
  {band_selects}),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
pairs AS MATERIALIZED (
  SELECT c.a, c.b FROM cand c
  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
  WHERE {jac} >= 0.5),
pe AS MATERIALIZED (SELECT a AS src, b AS dst FROM pairs
                    UNION ALL SELECT b AS src, a AS dst FROM pairs),
pv AS MATERIALIZED (SELECT DISTINCT src AS id FROM pe),
{wcc_ctes},
ndp AS MATERIALIZED (SELECT id AS doc_id FROM w{wcc_iters} WHERE id <> lab),
s2 AS MATERIALIZED (
  SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM ndp)),
samp AS MATERIALIZED (
  SELECT doc_id FROM s2
  WHERE CAST(('0x' || substr(md5('strat1' || CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
        % 1000000
        < CASE lang WHEN 'en' THEN 500000
                    WHEN 'zh' THEN 1000000
                    ELSE 250000 END),
spl AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN g < 900000 THEN 'train'
              WHEN g < 950000 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id,
               CAST(('0x' || substr(md5('split1' || CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
               % 1000000 AS g
        FROM samp))
SELECT d.doc_id,
       CASE WHEN NOT qd.keep THEN 'low_quality'
            WHEN ed.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN ndp.doc_id IS NOT NULL THEN 'near_dup'
            WHEN spl.doc_id IS NULL THEN 'sampled_out'
            ELSE 'kept' END AS status,
       COALESCE(spl.split, '') AS split
FROM documents d
JOIN qd ON d.doc_id = qd.doc_id
LEFT JOIN ed ON d.doc_id = ed.doc_id
LEFT JOIN ndp ON d.doc_id = ndp.doc_id
LEFT JOIN spl ON d.doc_id = spl.doc_id"""


KTRUSS_SQL_ITERS = 12


def _sql_ktruss(k: int = 5, iters: int = KTRUSS_SQL_ITERS) -> str:
    """Mirror of algos/ktruss.ktruss: unrolled support-peel."""
    ctes = ["e0 AS MATERIALIZED (SELECT src, dst FROM canon)"]
    for i in range(iters):
        ctes.append(f"""sy{i} AS MATERIALIZED (
  SELECT src, dst FROM e{i} UNION ALL SELECT dst AS src, src AS dst FROM e{i}),
su{i} AS MATERIALIZED (
  SELECT a.src AS u, b.src AS v, count(*) AS c
  FROM sy{i} a JOIN sy{i} b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src),
e{i + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i} e
  JOIN su{i} s ON e.src = s.u AND e.dst = s.v
  WHERE s.c >= {k - 2})""")
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT src, dst FROM e{iters} ORDER BY src, dst"
    )


def _sql_mis(rounds: int = 12) -> str:
    """Mirror of algos/mis.maximal_independent_set: unrolled Luby rounds
    with the unique portable-hash priority (p = (h1(id) % 2^31) * 2^31
    + id); rounds pinned past the measured fixpoint (4 at sf0.001, 6 at
    sf0.01, 9 at sf0.1 — the 8-pin truncated there by one vertex, caught
    by the r5 sf0.1 tail replica) — extra rounds operate on an empty
    alive set and add no rows.
    """
    pri = (
        "(CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 14)) AS BIGINT)"
        " % 2147483648) * 2147483648 + id"
    )
    ctes = [
        f"a0 AS MATERIALIZED (SELECT id, {pri} AS p FROM verts)",
        "e0 AS MATERIALIZED (SELECT src, dst FROM edges)",
    ]
    for k in range(rounds):
        ctes.append(f"""m{k} AS MATERIALIZED (
  SELECT a.id FROM a{k} a LEFT JOIN (
    SELECT e.dst AS id, min(ap.p) AS minp
    FROM e{k} e JOIN a{k} ap ON e.src = ap.id GROUP BY e.dst) nb
  ON a.id = nb.id
  WHERE nb.minp IS NULL OR a.p < nb.minp),
r{k} AS MATERIALIZED (
  SELECT id FROM m{k}
  UNION
  SELECT e.dst AS id FROM e{k} e JOIN m{k} m ON e.src = m.id),
a{k + 1} AS MATERIALIZED (
  SELECT a.id, a.p FROM a{k} a
  WHERE NOT EXISTS (SELECT 1 FROM r{k} r WHERE r.id = a.id)),
e{k + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{k} e
  JOIN a{k + 1} x ON e.src = x.id JOIN a{k + 1} y ON e.dst = y.id)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT id, CAST({k} AS INTEGER) AS mis_round FROM m{k}"
        for k in range(rounds)
    )
    return SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes) + "\n" + sel + "\nORDER BY id"


def _sql_matching(rounds: int = 8, weighted: bool = False) -> str:
    """Mirror of algos/matching.maximal_matching: unrolled locally-minimal
    edge rounds with the unique priority key (portable_h1('src:dst'),
    src, dst) — or (-weight, hash, src, dst) for the locally-heaviest
    greedy weighted variant (the hash splits equal-weight tie chains);
    struct min/equality order field-positionally in both engines.
    ``rounds`` is pinned past the measured fixpoint — extra rounds
    operate on an empty edge set and add no rows.
    """
    md5h = ("CAST(('0x' || substr(md5(CAST(src AS VARCHAR) || ':' || "
            "CAST(dst AS VARCHAR)), 1, 14)) AS BIGINT)")
    if weighted:
        # (-weight, hash, src, dst): the hash between weight and
        # endpoints splits equal-weight tie chains (see algos/matching)
        l0_cols = f"- weight AS h, {md5h} AS t"
        key = "{{'h': {p}h, 't': {p}t, 's': {p}src, 'd': {p}dst}}"
        icols = "h, t, src, dst"
    else:
        l0_cols = f"{md5h} AS h"
        key = "{{'h': {p}h, 's': {p}src, 'd': {p}dst}}"
        icols = "h, src, dst"
    kb, kl = key.format(p=""), key.format(p="l.")
    ctes = [f"l0 AS MATERIALIZED (SELECT src, dst, {l0_cols} FROM canon)"]
    for k in range(rounds):
        ctes.append(f"""i{k} AS MATERIALIZED (
  SELECT src AS id, {icols} FROM l{k}
  UNION ALL SELECT dst AS id, {icols} FROM l{k}),
m{k} AS MATERIALIZED (
  SELECT id, min({kb}) AS mk
  FROM i{k} GROUP BY id),
p{k} AS MATERIALIZED (
  SELECT l.src, l.dst FROM l{k} l
  JOIN m{k} a ON l.src = a.id JOIN m{k} b ON l.dst = b.id
  WHERE {kl} = a.mk
    AND {kl} = b.mk),
v{k} AS MATERIALIZED (
  SELECT src AS id FROM p{k} UNION SELECT dst AS id FROM p{k}),
l{k + 1} AS MATERIALIZED (
  SELECT l.src, l.dst, {", ".join("l." + c for c in icols.split(", ")[:-2])}
  FROM l{k} l
  WHERE NOT EXISTS (SELECT 1 FROM v{k} v WHERE v.id = l.src)
    AND NOT EXISTS (SELECT 1 FROM v{k} v WHERE v.id = l.dst))""")
    sel = "\nUNION ALL\n".join(
        f"SELECT src, dst, CAST({k} AS INTEGER) AS match_round FROM p{k}"
        for k in range(rounds)
    )
    return SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes) + "\n" + sel


def _coloring_ctes(rounds: int, max_colors: int, edges_cte: str) -> list:
    """CTE list for the Jones–Plassmann mirror over ``edges_cte`` (must
    be symmetric); colored-vertex CTEs are jc0..jc{rounds-1}."""
    pri = (
        "(CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 14)) AS BIGINT)"
        " % 2147483648) * 2147483648 + id"
    )
    ctes = [
        f"ju0 AS MATERIALIZED (SELECT id, {pri} AS p FROM "
        f"(SELECT DISTINCT src AS id FROM {edges_cte}) s)",
        f"je0 AS MATERIALIZED (SELECT src, dst FROM {edges_cte})",
        "jf0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS id, "
        "CAST(NULL AS INTEGER) AS color WHERE 1 = 0)",
        f"nums AS MATERIALIZED (SELECT CAST(range AS INTEGER) AS n "
        f"FROM range(0, {max_colors}))",
    ]
    for k in range(rounds):
        ctes.append(f"""jw{k} AS MATERIALIZED (
  SELECT u.id FROM ju{k} u LEFT JOIN (
    SELECT e.dst AS id, max(up.p) AS maxp
    FROM je{k} e JOIN ju{k} up ON e.src = up.id GROUP BY e.dst) m
  ON u.id = m.id
  WHERE m.maxp IS NULL OR u.p > m.maxp),
jc{k} AS MATERIALIZED (
  SELECT w.id, CAST(min(n.n) AS INTEGER) AS color
  FROM jw{k} w CROSS JOIN nums n
  WHERE NOT EXISTS (SELECT 1 FROM jf{k} f
                    WHERE f.id = w.id AND f.color = n.n)
  GROUP BY w.id),
ju{k + 1} AS MATERIALIZED (
  SELECT u.id, u.p FROM ju{k} u
  WHERE NOT EXISTS (SELECT 1 FROM jc{k} c WHERE c.id = u.id)),
jf{k + 1} AS MATERIALIZED (
  SELECT f.id, f.color FROM jf{k} f
  WHERE EXISTS (SELECT 1 FROM ju{k + 1} u WHERE u.id = f.id)
  UNION
  SELECT e.dst AS id, c.color FROM je{k} e JOIN jc{k} c ON e.src = c.id
  WHERE EXISTS (SELECT 1 FROM ju{k + 1} u WHERE u.id = e.dst)),
je{k + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM je{k} e
  JOIN ju{k + 1} x ON e.src = x.id JOIN ju{k + 1} y ON e.dst = y.id)""")
    return ctes


def _coloring_sel(rounds: int) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT id, color, CAST({k} AS INTEGER) AS jp_round FROM jc{k}"
        for k in range(rounds)
    )


def _sql_coloring_msf(jp_rounds: int = 12, msf_rounds: int = 8,
                      jumps: int = 6, max_colors: int = 256) -> str:
    """Mirror of q_coloring: Jones-Plassmann over the SYMMETRIZED Borůvka
    spanning forest of the co-occurrence graph.  The dense co-occurrence
    graph itself is a pathological JP fixture (winners per round ~
    V/(deg+1), so rounds ~ O(V/17) at sf0.01); the forest keeps the
    operator oracle-checkable at O(log V) rounds.  ``jp_rounds`` pinned
    past the measured fixpoint (9 at sf0.01)."""
    ff = ("ff AS MATERIALIZED (" + "\nUNION ALL\n".join(
        f"SELECT src, dst FROM p{k}" for k in range(msf_rounds)) + ")")
    fe = ("fe AS MATERIALIZED (SELECT src, dst FROM ff "
          "UNION ALL SELECT dst AS src, src AS dst FROM ff)")
    ctes = (_msf_ctes(msf_rounds, jumps) + [ff, fe]
            + _coloring_ctes(jp_rounds, max_colors, "fe"))
    return (SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes) + "\n"
            + _coloring_sel(jp_rounds) + "\nORDER BY id")


def _msf_ctes(rounds: int = 8, jumps: int = 6) -> list:
    """CTE list for the Borůvka mirror (see _sql_msf); picked-edge CTEs
    are p0..p{rounds-1}."""
    ctes = [
        "c0 AS MATERIALIZED (SELECT id, id AS c FROM verts)",
        "l0 AS MATERIALIZED (SELECT src, dst, weight AS w FROM canon)",
    ]
    for k in range(rounds):
        ctes.append(f"""x{k} AS MATERIALIZED (
  SELECT l.src, l.dst, l.w, a.c AS cu, b.c AS cv
  FROM l{k} l JOIN c{k} a ON l.src = a.id JOIN c{k} b ON l.dst = b.id
  WHERE a.c <> b.c),
m{k} AS MATERIALIZED (
  SELECT cc, min(k) AS mk FROM (
    SELECT cu AS cc, {{'w': w, 's': src, 'd': dst, 'o': cv}} AS k FROM x{k}
    UNION ALL
    SELECT cv AS cc, {{'w': w, 's': src, 'd': dst, 'o': cu}} AS k
    FROM x{k}) i
  GROUP BY cc),
p{k} AS MATERIALIZED (
  SELECT DISTINCT struct_extract(mk, 's') AS src,
         struct_extract(mk, 'd') AS dst,
         struct_extract(mk, 'w') AS weight FROM m{k}),
g{k}_0 AS MATERIALIZED (
  SELECT a.cc,
         CASE WHEN b.p = a.cc AND a.cc < a.p THEN a.cc ELSE a.p END AS p
  FROM (SELECT cc, struct_extract(mk, 'o') AS p FROM m{k}) a
  JOIN (SELECT cc, struct_extract(mk, 'o') AS p FROM m{k}) b
  ON a.p = b.cc)""")
        for t in range(jumps):
            ctes.append(
                f"g{k}_{t + 1} AS MATERIALIZED (\n"
                f"  SELECT a.cc, b.p FROM g{k}_{t} a "
                f"JOIN g{k}_{t} b ON a.p = b.cc)"
            )
        ctes.append(f"""c{k + 1} AS MATERIALIZED (
  SELECT cm.id, coalesce(g.p, cm.c) AS c
  FROM c{k} cm LEFT JOIN g{k}_{jumps} g ON cm.c = g.cc),
l{k + 1} AS MATERIALIZED (SELECT src, dst, w FROM x{k})""")
    return ctes


def _sql_msf(rounds: int = 8, jumps: int = 6) -> str:
    """Mirror of algos/msf.boruvka_msf: unrolled hook-and-compress
    rounds under the unique total edge order (weight, src, dst).
    ``rounds``/``jumps`` are pinned past the measured fixpoints — extra
    Borůvka rounds see an empty inter-component edge set and extra
    pointer jumps are idempotent, so both only add empty/unchanged CTEs.
    """
    sel = "\nUNION ALL\n".join(
        f"SELECT src, dst, weight, CAST({k} AS INTEGER) AS msf_round FROM p{k}"
        for k in range(rounds)
    )
    return (
        SQL_GRAPH_PREFIX + ", "
        + ",\n".join(_msf_ctes(rounds, jumps)) + "\n" + sel
    )


def _sql_pq_ann(m: int = 4, k_c: int = 16, iters: int = 2,
                dim: int = 64, k: int = 5) -> str:
    """Mirror of functions/pq.pq_ann: per-subspace L2 k-means (seeds =
    smallest ids, means 6dp), nearest-codeword assignment by 9dp-rounded
    squared L2 (polarization identity over the same dot products as the
    cosine family), integer-nanodistance ADC sums (order-independent),
    rank (nano ASC, nbr ASC)."""
    def sd9(x, y):
        return (f"round(list_dot_product({x}, {x}) "
                f"+ list_dot_product({y}, {y}) "
                f"- 2 * list_dot_product({x}, {y}), 9)")

    ds = dim // m
    ctes = []
    pair_sels = []
    for s in range(m):
        lo, hi = s * ds + 1, (s + 1) * ds
        ctes.append(f"vs{s} AS MATERIALIZED "
                    f"(SELECT id, vec[{lo}:{hi}] AS vec FROM v)")
        ctes.append(f"""s{s}c0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY id) - 1 AS cluster, vec AS cvec
  FROM vs{s} ORDER BY id LIMIT {k_c})""")

        def assign(name, cent):
            return f"""{name} AS MATERIALIZED (
  SELECT id, vec, cluster FROM (
    SELECT t.id, t.vec, c.cluster,
           row_number() OVER (PARTITION BY t.id
                              ORDER BY {sd9('t.vec', 'c.cvec')} ASC,
                                       c.cluster ASC) AS rn
    FROM vs{s} t CROSS JOIN {cent} c) z WHERE rn = 1)"""

        for r in range(iters):
            ctes.append(assign(f"s{s}a{r}", f"s{s}c{r}"))
            ctes.append(f"""s{s}m{r} AS MATERIALIZED (
  SELECT cluster, pos, round(avg(vec[pos]), 6) AS mm
  FROM s{s}a{r} CROSS JOIN (SELECT unnest(range(1, {ds + 1})) AS pos) p
  GROUP BY cluster, pos),
s{s}v{r} AS MATERIALIZED (
  SELECT cluster, list(mm ORDER BY pos) AS cvec FROM s{s}m{r}
  GROUP BY cluster),
s{s}c{r + 1} AS MATERIALIZED (
  SELECT c.cluster, COALESCE(mv.cvec, c.cvec) AS cvec
  FROM s{s}c{r} c LEFT JOIN s{s}v{r} mv ON c.cluster = mv.cluster)""")
        ctes.append(assign(f"s{s}x", f"s{s}c{iters}"))
        ctes.append(f"""s{s}dt AS MATERIALIZED (
  SELECT q.id AS qid, c.cluster,
         CAST(round({sd9('q.vec', 'c.cvec')} * 1e9, 0) AS BIGINT) AS nano
  FROM vs{s} q CROSS JOIN s{s}c{iters} c)""")
        pair_sels.append(
            f"SELECT dt.qid, x.id AS nbr_id, dt.nano "
            f"FROM s{s}dt dt JOIN s{s}x x ON dt.cluster = x.cluster"
        )
    ctes.append("pairs AS MATERIALIZED (\n  "
                + "\n  UNION ALL ".join(pair_sels) + ")")
    ctes.append("""adc AS MATERIALIZED (
  SELECT qid AS query_id, nbr_id, CAST(sum(nano) AS BIGINT) AS nano
  FROM pairs WHERE qid != nbr_id GROUP BY qid, nbr_id)""")
    return EMB_SQL_PREFIX + ", " + ",\n".join(ctes) + f"""
SELECT query_id, nbr_id, round(nano / 1e9, 6) AS adc,
       CAST(rn AS INT) AS "rank"
FROM (SELECT query_id, nbr_id, nano,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY nano ASC, nbr_id ASC) AS rn
      FROM adc) t
WHERE rn <= {k}"""


def _sql_salsa(iters: int = 5) -> str:
    """Mirror of algos/salsa.salsa over the order x part incidence:
    degree-normalized spread + in-plan L1 totals, exactly the HITS
    oracle's shape with the bipartite degree division added."""
    ctes = ["""binc AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
bld AS MATERIALIZED (SELECT o, count(*) AS dl FROM binc GROUP BY o),
brd AS MATERIALIZED (SELECT p, count(*) AS dr FROM binc GROUP BY p),
be AS MATERIALIZED (
  SELECT i.o, i.p, bld.dl, brd.dr FROM binc i
  JOIN bld ON i.o = bld.o JOIN brd ON i.p = brd.p),
sh0 AS MATERIALIZED (SELECT o, CAST(1.0 AS DOUBLE) AS hub FROM bld)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""sar{k} AS MATERIALIZED (
  SELECT e.p, sum(h.hub / e.dl) AS s
  FROM be e JOIN sh{k - 1} h ON e.o = h.o GROUP BY e.p),
saa{k} AS MATERIALIZED (
  SELECT p, s / (SELECT sum(s) FROM sar{k}) AS auth FROM sar{k}),
shr{k} AS MATERIALIZED (
  SELECT e.o, sum(a.auth / e.dr) AS s
  FROM be e JOIN saa{k} a ON e.p = a.p GROUP BY e.o),
sh{k} AS MATERIALIZED (
  SELECT o, s / (SELECT sum(s) FROM shr{k}) AS hub FROM shr{k})""")
    return "WITH " + ",\n".join(ctes) + f"""
SELECT o AS id, 'hub' AS kind, round(hub, 6) AS score FROM sh{iters}
UNION ALL
SELECT p AS id, 'authority' AS kind, round(auth, 6) AS score FROM saa{iters}
"""


def _sql_densest(rounds: int = 12) -> str:
    """Mirror of algos/densest.densest_subgraph: unrolled
    2(1+1/8)-average-degree peel rounds, exact integer density compare
    (cross-multiplication, earliest round wins ties), winning snapshot
    selected by an unrolled best-round filter.  ``rounds`` pinned past
    the measured fixpoint (empty rounds contribute m=0 rows that the
    stats filter drops)."""
    ctes = ["dl0 AS MATERIALIZED (SELECT src, dst FROM canon)"]
    for k in range(rounds):
        ctes.append(f"""dst{k} AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS m FROM dl{k}),
ddg{k} AS MATERIALIZED (
  SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT src AS id FROM dl{k}
    UNION ALL SELECT dst AS id FROM dl{k}) s GROUP BY id),
dsn{k} AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ddg{k}),
dkp{k} AS MATERIALIZED (
  SELECT id FROM ddg{k}
  WHERE d * 4 * (SELECT n FROM dsn{k}) > 18 * (SELECT m FROM dst{k})),
dl{k + 1} AS MATERIALIZED (
  SELECT l.src, l.dst FROM dl{k} l
  JOIN dkp{k} a ON l.src = a.id JOIN dkp{k} b ON l.dst = b.id)""")
    stats = "\nUNION ALL ".join(
        f"SELECT {k} AS r, (SELECT m FROM dst{k}) AS m, "
        f"(SELECT n FROM dsn{k}) AS n"
        for k in range(rounds)
    )
    ctes.append(f"dstats AS MATERIALIZED (SELECT * FROM ({stats}) x "
                f"WHERE m > 0)")
    ctes.append("""dbest AS MATERIALIZED (
  SELECT r, m, n FROM dstats s
  WHERE NOT EXISTS (
    SELECT 1 FROM dstats s2
    WHERE s2.m * s.n > s.m * s2.n
       OR (s2.m * s.n = s.m * s2.n AND s2.r < s.r)))""")
    sel = "\nUNION ALL\n".join(
        f"SELECT g.id, CAST(b.r AS INTEGER) AS peel_round, "
        f"b.m AS density_num, b.n AS density_den "
        f"FROM dbest b JOIN ddg{k} g ON b.r = {k}"
        for k in range(rounds)
    )
    return SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes) + "\n" + sel


def _sql_bond_percolation(ps: tuple, iters: int = 16) -> str:
    """Mirror of algos/percolation.bond_percolation_sweep: nested
    hash-coupled survivor sets, one unrolled hash-min WCC per level."""
    hexpr = H1_SQL.format(
        s="('bond|' || CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR))")
    ctes = [f"""bh AS MATERIALIZED (
  SELECT src, dst, {hexpr} % 100 AS h FROM canon)"""]
    rows = []
    for p in ps:
        ctes.append(f"""be{p} AS MATERIALIZED (
  SELECT src, dst FROM bh WHERE h < {p}),
bs{p} AS MATERIALIZED (
  SELECT src, dst FROM be{p}
  UNION ALL SELECT dst AS src, src AS dst FROM be{p}),
bv{p} AS MATERIALIZED (SELECT DISTINCT src AS id FROM bs{p}),
bl{p}_0 AS MATERIALIZED (SELECT id, id AS lab FROM bv{p})""")
        for k in range(iters):
            ctes.append(f"""bl{p}_{k + 1} AS MATERIALIZED (
  SELECT v.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM bv{p} v JOIN bl{p}_{k} l ON v.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM bs{p} e JOIN bl{p}_{k} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON v.id = m.id)""")
        rows.append(f"""SELECT CAST({p} AS INTEGER) AS p_pct,
  (SELECT CAST(count(*) AS BIGINT) FROM bv{p}) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM be{p}) AS n_edges,
  (SELECT CAST(count(DISTINCT lab) AS BIGINT) FROM bl{p}_{iters})
    AS n_components,
  (SELECT CAST(COALESCE(max(c), 0) AS BIGINT) FROM (
     SELECT count(*) AS c FROM bl{p}_{iters} GROUP BY lab) z) AS largest""")
    return (SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(rows))


def _sql_percolation(thresholds: tuple = (1, 2, 3, 5), iters: int = 16) -> str:
    """Mirror of algos/percolation.percolation_sweep: one unrolled
    hash-min WCC chain per weight threshold over the shrinking edge set;
    ``iters`` pinned past the LARGEST per-threshold fixpoint (sparser
    graphs have larger diameter; extra hash-min rounds are idempotent).
    """
    ctes = []
    rows = []
    for t in thresholds:
        ctes.append(f"""pe{t} AS MATERIALIZED (
  SELECT src, dst FROM canon WHERE weight >= {t}),
ps{t} AS MATERIALIZED (
  SELECT src, dst FROM pe{t}
  UNION ALL SELECT dst AS src, src AS dst FROM pe{t}),
pv{t} AS MATERIALIZED (SELECT DISTINCT src AS id FROM ps{t}),
pl{t}_0 AS MATERIALIZED (SELECT id, id AS lab FROM pv{t})""")
        for k in range(iters):
            ctes.append(f"""pl{t}_{k + 1} AS MATERIALIZED (
  SELECT v.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM pv{t} v JOIN pl{t}_{k} l ON v.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM ps{t} e JOIN pl{t}_{k} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON v.id = m.id)""")
        rows.append(f"""SELECT CAST({t} AS INTEGER) AS threshold,
  (SELECT CAST(count(*) AS BIGINT) FROM pv{t}) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM pe{t}) AS n_edges,
  (SELECT CAST(count(DISTINCT lab) AS BIGINT) FROM pl{t}_{iters})
    AS n_components,
  (SELECT CAST(COALESCE(max(c), 0) AS BIGINT) FROM (
     SELECT count(*) AS c FROM pl{t}_{iters} GROUP BY lab) z) AS largest""")
    return (SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(rows))


def _sql_hll_groups() -> str:
    """Mirror of functions/sketches.hll_group_cardinality over
    events(event_type, user_id) — same register derivation as the
    oracle-validated hyperanf family (hll_portable.sql_rho_cte)."""
    from plato_spark.algos.hll_portable import (
        M,
        RHO_MAX,
        sql_estimate_exprs,
    )
    from plato_spark.functions.text import PORTABLE_H1_SQL

    h = PORTABLE_H1_SQL.format(s="CAST(user_id AS VARCHAR)")
    s_expr, est = sql_estimate_exprs()
    return f"""
WITH eh AS MATERIALIZED (SELECT event_type, {h} AS h FROM events),
er AS MATERIALIZED (
  SELECT event_type, CAST(h % {M} AS INT) AS idx,
         CASE WHEN (h >> 6) = 0 THEN {RHO_MAX}
              ELSE {RHO_MAX} - length(bin(h >> 6)) END AS rho
  FROM eh),
regs AS MATERIALIZED (
  SELECT event_type, idx, max(rho) AS mr FROM er GROUP BY event_type, idx),
sv AS (SELECT event_type, {s_expr} AS s, {M} - count(*) AS vz
       FROM regs GROUP BY event_type)
SELECT event_type, round({est}, 4) AS est_distinct FROM sv
ORDER BY event_type"""


def _sql_hll_set_ops(set_a: str = "view", set_b: str = "purchase") -> str:
    """Mirror of functions/sketches.hll_set_ops: per-set registers (the
    validated _sql_hll_groups derivation), union registers via
    per-index max, inclusion-exclusion intersection, exact columns
    beside."""
    from plato_spark.algos.hll_portable import (
        M,
        RHO_MAX,
        sql_estimate_exprs,
    )
    from plato_spark.functions.text import PORTABLE_H1_SQL

    h = PORTABLE_H1_SQL.format(s="CAST(user_id AS VARCHAR)")
    s_expr, est = sql_estimate_exprs()
    return f"""
WITH eh AS MATERIALIZED (
  SELECT event_type AS g, {h} AS h FROM events
  WHERE event_type IN ('{set_a}', '{set_b}')),
er AS (SELECT g, CAST(h % {M} AS INT) AS idx,
         CASE WHEN (h >> 6) = 0 THEN {RHO_MAX}
              ELSE {RHO_MAX} - length(bin(h >> 6)) END AS rho
       FROM eh),
regs AS MATERIALIZED (
  SELECT g, idx, max(rho) AS mr FROM er GROUP BY g, idx),
uregs AS (SELECT '__union__' AS g, idx, max(mr) AS mr
          FROM regs GROUP BY idx),
allregs AS (SELECT g, idx, mr FROM regs
            UNION ALL SELECT g, idx, mr FROM uregs),
sv AS (SELECT g, {s_expr} AS s, {M} - count(*) AS vz
       FROM allregs GROUP BY g),
ev AS (SELECT g, round({est}, 4) AS e FROM sv),
ids AS (SELECT DISTINCT event_type AS g, user_id AS i FROM events
        WHERE event_type IN ('{set_a}', '{set_b}')),
ex AS (SELECT
  CAST(sum(CASE WHEN g = '{set_a}' THEN 1 ELSE 0 END) AS BIGINT)
    AS exact_a,
  CAST(sum(CASE WHEN g = '{set_b}' THEN 1 ELSE 0 END) AS BIGINT)
    AS exact_b,
  CAST(count(DISTINCT i) AS BIGINT) AS exact_union FROM ids)
SELECT
  (SELECT e FROM ev WHERE g = '{set_a}') AS est_a,
  (SELECT e FROM ev WHERE g = '{set_b}') AS est_b,
  (SELECT e FROM ev WHERE g = '__union__') AS est_union,
  round((SELECT e FROM ev WHERE g = '{set_a}')
        + (SELECT e FROM ev WHERE g = '{set_b}')
        - (SELECT e FROM ev WHERE g = '__union__'), 4) AS est_intersect,
  ex.exact_a, ex.exact_b, ex.exact_union,
  CAST(ex.exact_a + ex.exact_b - ex.exact_union AS BIGINT)
    AS exact_intersect
FROM ex"""


def _sql_funnel_sensitivity(windows: tuple) -> str:
    """Mirror of q_funnel_sensitivity: the windowed_funnel anchor chain
    parameterized per window, unioned with a window_s column."""
    ctes = ["""v1 AS MATERIALIZED (
  SELECT user_id AS u, min(ts) AS a FROM events
  WHERE event_type = 'view' GROUP BY user_id)"""]
    selects = []
    for k, w in enumerate(windows):
        wus = int(w) * 1_000_000
        ctes.append(f"""u2_{k} AS MATERIALIZED (
  SELECT e.user_id AS u, min(e.ts) AS a FROM events e
  JOIN v1 ON e.user_id = v1.u
  WHERE e.event_type = 'click' AND e.ts > v1.a
    AND epoch_us(e.ts) <= epoch_us(v1.a) + {wus} GROUP BY e.user_id)""")
        ctes.append(f"""u3_{k} AS MATERIALIZED (
  SELECT e.user_id AS u, min(e.ts) AS a FROM events e
  JOIN u2_{k} ON e.user_id = u2_{k}.u
  WHERE e.event_type = 'purchase' AND e.ts > u2_{k}.a
    AND epoch_us(e.ts) <= epoch_us(u2_{k}.a) + {wus}
  GROUP BY e.user_id)""")
        selects.append(
            f"""SELECT CAST({w} AS BIGINT) AS window_s,
       CAST(1 AS INTEGER) AS step, 'view' AS event_type,
       (SELECT CAST(count(*) AS BIGINT) FROM v1) AS users
UNION ALL SELECT {w}, 2, 'click',
       (SELECT CAST(count(*) AS BIGINT) FROM u2_{k})
UNION ALL SELECT {w}, 3, 'purchase',
       (SELECT CAST(count(*) AS BIGINT) FROM u3_{k})""")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects))


def _sql_benford() -> str:
    """Mirror of q_benford_audit: same Python-literal expectations."""
    exp_rows = " UNION ALL ".join(
        f"SELECT '{d}' AS digit, CAST({p!r} AS DOUBLE) AS be"
        for d, p in BENFORD_P.items())
    return f"""
WITH d AS (SELECT substr(CAST(CAST(round(o_totalprice * 100, 0)
                     AS BIGINT) AS VARCHAR), 1, 1) AS digit
           FROM orders),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c),
e AS ({exp_rows})
SELECT c.digit, c.n, round(CAST(c.n AS DOUBLE) / t.t, 6) AS share,
       e.be AS benford_expected,
       round(CAST(c.n AS DOUBLE) / t.t - e.be, 6) AS dev
FROM c JOIN e ON c.digit = e.digit CROSS JOIN t ORDER BY c.digit"""


def _sql_filter_ablation() -> str:
    """Mirror of q_filter_ablation: the quality_filter ratio block,
    per-rule all/only fail counts, stacked to 5 rows."""
    return f"""
WITH t AS (SELECT doc_id, text,
             regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
           FROM documents),
q AS (SELECT doc_id,
        CAST(length(toks) AS BIGINT) AS n_tokens,
        round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
              / greatest(length(text), 1), 6) AS alpha_ratio,
        round(length(regexp_replace(text, '[^0-9]', '', 'g'))
              / greatest(length(text), 1), 6) AS digit_ratio,
        round(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
              / greatest(length(toks), 1), 6) AS mean_token_len
      FROM t),
fl AS (SELECT (n_tokens < 8) AS f_tokens,
              (alpha_ratio < 0.45) AS f_alpha,
              (digit_ratio > 0.3) AS f_digit,
              (mean_token_len < 2.0 OR mean_token_len > 12.0) AS f_len
       FROM q),
s AS (SELECT
  CAST(sum(CASE WHEN f_tokens THEN 1 ELSE 0 END) AS BIGINT) AS t_all,
  CAST(sum(CASE WHEN f_tokens AND NOT f_alpha AND NOT f_digit
                 AND NOT f_len THEN 1 ELSE 0 END) AS BIGINT) AS t_only,
  CAST(sum(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT) AS a_all,
  CAST(sum(CASE WHEN f_alpha AND NOT f_tokens AND NOT f_digit
                 AND NOT f_len THEN 1 ELSE 0 END) AS BIGINT) AS a_only,
  CAST(sum(CASE WHEN f_digit THEN 1 ELSE 0 END) AS BIGINT) AS d_all,
  CAST(sum(CASE WHEN f_digit AND NOT f_tokens AND NOT f_alpha
                 AND NOT f_len THEN 1 ELSE 0 END) AS BIGINT) AS d_only,
  CAST(sum(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT) AS l_all,
  CAST(sum(CASE WHEN f_len AND NOT f_tokens AND NOT f_alpha
                 AND NOT f_digit THEN 1 ELSE 0 END) AS BIGINT) AS l_only,
  CAST(sum(CASE WHEN f_tokens OR f_alpha OR f_digit OR f_len
                THEN 1 ELSE 0 END) AS BIGINT) AS any_all
  FROM fl)
SELECT 'f_tokens' AS filter, t_all AS n_failing, t_only AS n_failing_only
FROM s
UNION ALL SELECT 'f_alpha', a_all, a_only FROM s
UNION ALL SELECT 'f_digit', d_all, d_only FROM s
UNION ALL SELECT 'f_len', l_all, l_only FROM s
UNION ALL SELECT 'any', any_all, any_all FROM s"""


def _sql_packing_sensitivity(budgets: tuple) -> str:
    """Mirror of q_packing_sensitivity: one budget-independent packing
    cum chain, per-budget manifest summaries unioned."""
    selects = []
    for b in budgets:
        b = int(b)
        selects.append(f"""SELECT CAST({b} AS BIGINT) AS budget,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST(max((cum - 1) // {b}) + 1 AS BIGINT) AS total_chunks,
  CAST(sum(CASE WHEN (cum - 1) // {b} > (cum - n_tokens) // {b}
            THEN 1 ELSE 0 END) AS BIGINT) AS split_docs,
  CAST(sum((cum - 1) // {b} - (cum - n_tokens) // {b}) AS BIGINT)
    AS extra_splits,
  CAST((max((cum - 1) // {b}) + 1) * {b} - sum(n_tokens) AS BIGINT)
    AS tail_waste
FROM c""")
    return f"""
WITH t AS (SELECT doc_id,
             CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                  AS BIGINT) AS n_tokens
           FROM documents),
k AS (SELECT doc_id, n_tokens,
        {H1_SQL.format(s="('pack|' || CAST(doc_id AS VARCHAR))")} AS key
      FROM t WHERE n_tokens > 0),
c AS MATERIALIZED (SELECT doc_id, n_tokens,
        sum(n_tokens) OVER (
          ORDER BY (key // 2251799813685248), key, doc_id
          ROWS UNBOUNDED PRECEDING) AS cum
      FROM k)
""" + "\nUNION ALL\n".join(selects)


def _sql_dedup_threshold_curve(thresholds: tuple) -> str:
    """Mirror of q_dedup_threshold_curve: the calibration chain as a
    subquery, conditional pair counts per threshold."""
    ths = ", ".join(str(t) for t in thresholds)
    return f"""
SELECT CAST(th AS DOUBLE) AS threshold,
       CAST(sum(CASE WHEN c.jaccard >= th THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs
FROM ({_sql_minhash_calibration()}) c
CROSS JOIN (SELECT unnest([{ths}]) AS th) q
GROUP BY th ORDER BY th"""


def _sql_motif_census() -> str:
    """Mirror of algos/motifs.motif_census on the co-occurrence graph:
    one codegree aggregation, exact integer divisions applied last."""
    return SQL_GRAPH_PREFIX + """, cd AS MATERIALIZED (
  SELECT a.dst AS u, b.dst AS v, CAST(count(*) AS BIGINT) AS w
  FROM edges a JOIN edges b ON a.src = b.src AND a.dst < b.dst
  GROUP BY a.dst, b.dst)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM verts) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM canon) AS n_edges,
  (SELECT CAST(coalesce(sum(deg * (deg - 1) // 2), 0) AS BIGINT) FROM deg)
    AS wedges,
  (SELECT CAST(coalesce(sum(cd.w), 0) // 3 AS BIGINT)
   FROM cd JOIN canon c ON cd.u = c.src AND cd.v = c.dst) AS triangles,
  (SELECT CAST(coalesce(sum(w * (w - 1) // 2), 0) // 2 AS BIGINT) FROM cd)
    AS four_cycles"""


def _sql_graphlet_census() -> str:
    """Mirror of algos/motifs.graphlet_census: the same closed-form
    integer folds over the codeg/etri tables on the co-occurrence
    graph (non-induced ESCAPE counts; correctness of the FORMULAS is
    pinned by the hand-derived K5/star/path pytest fixtures — the gate
    proves the two engines fold identically)."""
    return SQL_GRAPH_PREFIX + """, cd AS MATERIALIZED (
  SELECT a.dst AS u, b.dst AS v, CAST(count(*) AS BIGINT) AS w
  FROM edges a JOIN edges b ON a.src = b.src AND a.dst < b.dst
  GROUP BY a.dst, b.dst),
etri AS MATERIALIZED (
  SELECT cd.u, cd.v, cd.w FROM cd
  JOIN canon c ON cd.u = c.src AND cd.v = c.dst),
tt AS (SELECT CAST(coalesce(sum(w), 0) // 3 AS BIGINT) AS t FROM etri),
tv AS (SELECT id, CAST(sum(w) // 2 AS BIGINT) AS t FROM (
         SELECT u AS id, w FROM etri
         UNION ALL SELECT v AS id, w FROM etri) GROUP BY id)
SELECT
  (SELECT t FROM tt) AS triangles,
  (SELECT CAST(coalesce(sum(deg * (deg - 1) * (deg - 2) // 6), 0)
          AS BIGINT) FROM deg) AS claws,
  (SELECT CAST(coalesce(sum((da.deg - 1) * (db.deg - 1)), 0) AS BIGINT)
   FROM canon c JOIN deg da ON c.src = da.id
   JOIN deg db ON c.dst = db.id) - 3 * (SELECT t FROM tt) AS paths_p4,
  (SELECT CAST(coalesce(sum(tv.t * (d.deg - 2)), 0) AS BIGINT)
   FROM tv JOIN deg d ON tv.id = d.id) AS tailed_triangles,
  (SELECT CAST(coalesce(sum(w * (w - 1) // 2), 0) AS BIGINT) FROM etri)
    AS diamonds,
  (SELECT CAST(coalesce(sum(w * (w - 1) // 2), 0) // 2 AS BIGINT)
   FROM cd) AS four_cycles"""


def _sql_cms(threshold: int = 50, depth: int = 4, width: int = 64) -> str:
    """Mirror of functions/sketches.cms_heavy_hitters: identical d x w
    count-min sketch (portable md5 row hashes, salt 'r:token'), identical
    min-over-probes estimate, same threshold gate."""
    def h(r):
        return (f"CAST(('0x' || substr(md5('{r}:' || token), 1, 14)) "
                f"AS BIGINT) % {width}")

    cells = "\n    UNION ALL ".join(
        f"SELECT {r} AS r, CAST({h(r)} AS INTEGER) AS b FROM tk"
        for r in range(depth)
    )
    probes = "\n  UNION ALL ".join(
        f"SELECT c.token, s.cnt FROM cand c JOIN sk s "
        f"ON s.r = {r} AND s.b = CAST({h(r).replace('token', 'c.token')} "
        f"AS INTEGER)"
        for r in range(depth)
    )
    return f"""
WITH tk AS MATERIALIZED (
  SELECT unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
  FROM documents),
sk AS MATERIALIZED (
  SELECT r, b, CAST(count(*) AS BIGINT) AS cnt FROM (
    {cells}) c GROUP BY r, b),
cand AS MATERIALIZED (SELECT DISTINCT token FROM tk),
probes AS (
  {probes})
SELECT token, min(cnt) AS est_count FROM probes
GROUP BY token HAVING min(cnt) >= {threshold}
ORDER BY token"""


def _sql_butterflies() -> str:
    """Mirror of algos/butterflies.butterfly_stats over the order x part
    incidence.  The butterfly count is side-symmetric, so the oracle's
    fixed part-side pair formulation matches whichever center side the
    engine's wedge-total heuristic picks.  All-integer arithmetic."""
    return """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
ld AS (SELECT o, count(*) AS d FROM inc GROUP BY o),
rd AS (SELECT p, count(*) AS d FROM inc GROUP BY p),
pw AS MATERIALIZED (
  SELECT a.p AS u, b.p AS v, count(*) AS w
  FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p GROUP BY a.p, b.p)
SELECT
  (SELECT count(*) FROM ld) AS n_left,
  (SELECT count(*) FROM rd) AS n_right,
  (SELECT count(*) FROM inc) AS n_edges,
  (SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) FROM ld)
    AS wedges_left,
  (SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) FROM rd)
    AS wedges_right,
  (SELECT CAST(coalesce(sum(w * (w - 1) // 2), 0) AS BIGINT) FROM pw)
    AS butterflies
"""


def _sql_trussness(k_max: int = 6, rounds: tuple = (4, 10, 11, 8)) -> str:
    """Mirror of algos/ktruss.truss_decomposition: phased support-peel,
    trussness = 2 + number of phases survived (p_k nests in p_{k-1}).
    ``rounds`` pins the unrolled peel rounds per phase, >= the measured
    engine fixpoints at sf0.01 ((2,3,4,6)) AND sf0.1 ((2,8,9,6) via
    tools/validate_fixpoint.py — the old (4,5,6,8) pin under-peeled
    phases k=4/k=5 there by 46 edges, caught by the r5 sf0.1 tail
    replica; extra rounds are identity)."""
    ctes = ["e0 AS MATERIALIZED (SELECT src, dst FROM canon)"]
    i = 0
    bounds = []
    for idx, k in enumerate(range(3, k_max + 1)):
        for _ in range(rounds[idx]):
            ctes.append(f"""sy{i} AS MATERIALIZED (
  SELECT src, dst FROM e{i} UNION ALL SELECT dst AS src, src AS dst FROM e{i}),
su{i} AS MATERIALIZED (
  SELECT a.src AS u, b.src AS v, count(*) AS c
  FROM sy{i} a JOIN sy{i} b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src),
e{i + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i} e
  JOIN su{i} s ON e.src = s.u AND e.dst = s.v
  WHERE s.c >= {k - 2})""")
            i += 1
        ctes.append(
            f"p{k} AS MATERIALIZED (SELECT src, dst FROM e{i})"
        )
        bounds.append(k)
    flags = " + ".join(
        f"CASE WHEN m{k}.src IS NOT NULL THEN 1 ELSE 0 END" for k in bounds
    )
    joins = "\n".join(
        f"LEFT JOIN p{k} m{k} ON c.src = m{k}.src AND c.dst = m{k}.dst"
        for k in bounds
    )
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"""
SELECT c.src, c.dst, CAST(2 + {flags} AS INT) AS trussness
FROM canon c
{joins}
ORDER BY c.src, c.dst"""
    )


def _sql_hits(iters: int = 5) -> str:
    """Mirror of algos/hits.hits: L1-normalized power iteration, the
    denominators computed as edge-sums exactly like the Spark side."""
    ctes = ["hh0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS hub, "
            "CAST(1.0 AS DOUBLE) AS auth FROM verts)"]
    for k in range(1, iters + 1):
        ctes.append(f"""ar{k} AS MATERIALIZED (
  SELECT c.dst AS id, sum(h.hub) AS s
  FROM canon c JOIN hh{k - 1} h ON c.src = h.id GROUP BY c.dst),
aa{k} AS MATERIALIZED (
  SELECT v.id, COALESCE(ar.s, 0) / (SELECT sum(s) FROM ar{k}) AS auth
  FROM verts v LEFT JOIN ar{k} ar ON v.id = ar.id),
hr{k} AS MATERIALIZED (
  SELECT c.src AS id, sum(a.auth) AS s
  FROM canon c JOIN aa{k} a ON c.dst = a.id GROUP BY c.src),
hh{k} AS MATERIALIZED (
  SELECT v.id, COALESCE(hr.s, 0) / (SELECT sum(s) FROM hr{k}) AS hub,
         a.auth
  FROM verts v LEFT JOIN hr{k} hr ON v.id = hr.id
  JOIN aa{k} a ON v.id = a.id)""")
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"""
SELECT id, round(hub, 6) AS hub, round(auth, 6) AS authority
FROM hh{iters} ORDER BY id"""
    )


def _sql_dedup_clusters_lsh(num_hashes: int = 64, bands: int = 16, n: int = 3,
                            wcc_iters: int = 6) -> str:
    """Mirror of functions/dedup.near_dup_clusters(use_lsh=True,
    hash_impl='portable'): the LSH banding, the jaccard verify, and the
    WCC closure are ALL reproduced, so the bucketed path is value-checked."""
    rows = num_hashes // bands
    sig_aggs = ", ".join(f"min(h1 + {i} * h2) AS s{i}" for i in range(num_hashes))
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(f"CAST(s{b * rows + j} AS VARCHAR)" for j in range(rows))
        + " AS bucket FROM sig"
        for b in range(bands)
    )
    jac = ("round(length(list_intersect(sa.sh, sb.sh)) "
           "/ greatest(length(sa.sh) + length(sb.sh) "
           "- length(list_intersect(sa.sh, sb.sh)), 1), 6)")
    wcc_ctes = ",\n".join(
        ["w0 AS MATERIALIZED (SELECT id, id AS lab FROM pv)"]
        + [
            f"""w{k + 1} AS MATERIALIZED (
  SELECT v.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM pv v JOIN w{k} l ON v.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM pe e JOIN w{k} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON v.id = m.id)"""
            for k in range(wcc_iters)
        ]
    )
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
  FROM documents),
sh AS MATERIALIZED (SELECT doc_id,
        CASE WHEN length(toks) >= {n} THEN
          list_distinct([array_to_string(toks[i:i+{n - 1}], ' ')
                         for i in range(1, length(toks) - {n - 2})])
        ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM sh),
hh AS MATERIALIZED (SELECT doc_id, {H1_SQL.format(s='s')} AS h1,
                           {H2_SQL.format(s='s')} AS h2 FROM ex),
sig AS MATERIALIZED (SELECT doc_id, {sig_aggs} FROM hh GROUP BY doc_id),
banded AS MATERIALIZED (
  {band_selects}),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
pairs AS MATERIALIZED (
  SELECT c.a, c.b FROM cand c
  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
  WHERE {jac} >= 0.5),
pe AS MATERIALIZED (SELECT a AS src, b AS dst FROM pairs
                    UNION ALL SELECT b AS src, a AS dst FROM pairs),
pv AS MATERIALIZED (SELECT DISTINCT src AS id FROM pe),
{wcc_ctes}
SELECT id AS doc_id, lab AS keeper_id FROM w{wcc_iters} ORDER BY id"""


def _sql_doc_fingerprint(shingle: int = 4) -> str:
    """Mirror of functions/text.doc_fingerprint(hash_impl='portable')."""
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
  FROM documents),
g AS (SELECT doc_id,
        list_transform(range(1, greatest(length(toks) - {shingle - 1}, 1) + 1),
                       i -> array_to_string(list_slice(toks, i, i + {shingle - 1}),
                                            chr(1))) AS grams
      FROM t)
SELECT doc_id,
       list_min(list_transform(grams,
         s -> CAST(('0x' || substr(md5(s), 1, 14)) AS BIGINT))) AS fingerprint
FROM g"""


def _sym(spark: SparkSession, sf_dir: str) -> DataFrame:
    return symmetrize(part_cooccurrence_edges(spark, sf_dir))


PPR_ITERS = 10


PPR_SOURCES = 4


def _sql_bfs_parents() -> str:
    prefix, last = _sql_bfs()
    return prefix + f""",
pp AS (SELECT e.dst AS id, CAST(min(e.src) AS BIGINT) AS parent
       FROM edges e JOIN {last} p ON e.src = p.id
            JOIN {last} c ON e.dst = c.id
       WHERE p.dist = c.dist - 1 GROUP BY e.dst)
SELECT l.id, l.dist, pp.parent
FROM {last} l LEFT JOIN pp ON l.id = pp.id ORDER BY l.id"""


FUNNEL_SWEEP_S = (3600, 21600, 86400)


BENFORD_P = {d: round(math.log10(1 + 1 / d), 6) for d in range(1, 10)}


PACKING_SWEEP = (128, 512, 2048)


DEDUP_THRESHOLDS = (0.3, 0.5, 0.7, 0.9)


def _sql_weighted_triangles() -> str:
    return SQL_GRAPH_PREFIX + """
SELECT CAST(count(*) AS BIGINT) AS n_triangles,
       CAST(sum(CAST(least(ab.weight, ac.weight, bc.weight) AS BIGINT))
            AS BIGINT) AS min_weight_sum
FROM canon ab
JOIN canon ac ON ac.src = ab.src AND ac.dst > ab.dst
JOIN canon bc ON bc.src = ab.dst AND bc.dst = ac.dst"""


def _sql_core_size_curve() -> str:
    return f"""
WITH kc AS MATERIALIZED ({_sql_kcore()}),
hist AS (SELECT coreness, CAST(count(*) AS BIGINT) AS c
         FROM kc GROUP BY coreness)
SELECT CAST(coreness AS BIGINT) AS k,
       CAST(sum(c) OVER (ORDER BY coreness DESC
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_vertices
FROM hist ORDER BY k"""


HYPERANF_STEPS = 4


NSTEP_STEPS = 2


def _nation_clique_graph(spark, sf_dir, bridges=True):
    """Deterministic clique-bar fixture: 5 intra-region 5-cliques (w=1)
    joined by a weak path over per-region min-nationkey reps (w=0.5).
    bridges=False drops the path (pure disconnected cliques — used for the
    density variant, whose greedy can wedge a bridge vertex between two
    cliques and leave them merged; without bridges the optimum is still a
    multi-round merge of 25 singletons into 5 cliques).

    The modularity / map-equation optimum is provably the region
    partition (merging two cliques across a single 0.5-weight bridge
    strictly lowers both objectives), which makes multi-epoch community
    detection value-checkable: the oracle states the region partition.
    """
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("id"),
        F.col("n_regionkey").cast("long").alias("r"),
    )
    a, b = nation.alias("a"), nation.alias("b")
    intra = a.join(
        b, (F.col("a.r") == F.col("b.r")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.id").alias("src"),
        F.col("b.id").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    if not bridges:
        return intra
    reps = nation.groupBy("r").agg(F.min("id").alias("m"))
    r2 = reps.select((F.col("r") - 1).alias("r"), F.col("m").alias("m2"))
    bridge_edges = reps.join(r2, "r").select(
        F.least("m", "m2").alias("src"),
        F.greatest("m", "m2").alias("dst"),
        F.lit(0.5).alias("weight"),
    )
    return intra.unionByName(bridge_edges)


def _canonical_communities(labels: DataFrame, label_col: str) -> DataFrame:
    mins = labels.groupBy(label_col).agg(F.min("id").alias("cmin"))
    return labels.join(mins, label_col).select(
        "id", F.col("cmin").alias(label_col)
    )


NATION_PARTITION_SQL = """
SELECT CAST(n.n_nationkey AS BIGINT) AS id,
       CAST((SELECT min(n2.n_nationkey) FROM nation n2
             WHERE n2.n_regionkey = n.n_regionkey) AS BIGINT) AS {out}
FROM nation n"""


FRAGMENT_HIST_K = 200


def _sql_component_histogram(iters: int = 24) -> str:
    ctes = _sql_hub_prefix_ctes()
    ctes.extend(_sql_hub_wcc_ctes(FRAGMENT_HIST_K, iters))
    return ("WITH " + ",\n".join(ctes) + f""",
szs AS (SELECT lab, CAST(count(*) AS BIGINT) AS sz
        FROM hl{FRAGMENT_HIST_K}_{iters} GROUP BY lab)
SELECT CAST(length(bin(sz)) AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_components,
       CAST(sum(sz) AS BIGINT) AS n_vertices
FROM szs GROUP BY bucket ORDER BY bucket""")


def _sql_graph_card(iters: int) -> str:
    return (SQL_GRAPH_PREFIX + ", "
            + ",\n".join(_sql_wcc_chain_ctes(iters)) + f""",
cs AS (SELECT CAST(count(DISTINCT lab) AS BIGINT) AS n_components,
              CAST(max(c) AS BIGINT) AS gcc FROM (
        SELECT lab, count(*) AS c FROM l{iters} GROUP BY lab) z),
dv AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices,
              CAST(max(deg) AS BIGINT) AS max_deg FROM deg),
ec AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM canon)
SELECT dv.n_vertices, ec.n_edges,
       round(CAST(2 * ec.n_edges AS DOUBLE)
             / (dv.n_vertices * (dv.n_vertices - 1)), 6) AS density,
       dv.max_deg, cs.n_components,
       round(CAST(100 * cs.gcc AS DOUBLE) / dv.n_vertices, 6) AS gcc_pct
FROM dv, ec, cs""")


KATZ_ITERS = 8


def _sql_katz(iters: int, alpha: float = 0.1, beta: float = 1.0) -> str:
    ctes = [f"x0 AS MATERIALIZED (SELECT id, CAST({beta} AS DOUBLE) AS x FROM verts)"]
    for k in range(iters):
        ctes.append(
            f"""x{k + 1} AS MATERIALIZED (
  SELECT v.id, {alpha} * COALESCE(s.g, 0.0) + {beta} AS x
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, sum(x.x) AS g
    FROM edges e JOIN x{k} x ON e.src = x.id
    GROUP BY e.dst) s ON v.id = s.id)"""
        )
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT id, round(x, 6) AS katz FROM x{iters}"
    )


def _planted_digraph(spark, sf_dir):
    """(edges, verts) — the PLANTED-TRUTH digraph shared by q_scc and
    q_scc_condensation: documents' doc_ids are dense-ranked (distributed
    dictionary, no window bottleneck); rank r joins block b = r//4; each
    block is a directed 4-cycle (r -> r+1, last -> first), and block-DAG
    cross edges 4b -> 4(b+1) are planted where md5-hash(b) selects b as
    a source and NOT b+1 (so condensation chains exist but stay short —
    deep-chain behaviour is exercised by the unit tests).  Ground truth
    is arithmetic — scc(r) = 4*(r//4), the min member of r's cycle, and
    the condensation's edges are exactly the planted cross edges — so
    both oracles are exact while the engine genuinely decomposes the
    graph."""
    from plato_spark.functions.text import portable_h1
    from plato_spark.graph.edges import build_dictionary

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("vkey")).distinct()
    )
    n = docs.count()
    d = build_dictionary(docs, 16)
    base = d.select(
        F.col("id").alias("r"),
        (F.col("id") % 4).alias("pos"),
        F.floor(F.col("id") / 4).cast("long").alias("blk"),
    )
    rr, pos, blk = F.col("r"), F.col("pos"), F.col("blk")
    succ = base.where((pos < 3) & (rr + 1 < n)).select(
        rr.alias("src"), (rr + 1).alias("dst")
    )
    close = base.where(((pos == 3) | (rr == n - 1)) & (rr > 4 * blk)).select(
        rr.alias("src"), (4 * blk).alias("dst")
    )

    def _is_source(b):
        return portable_h1(F.concat(F.lit("sccx|"), b.cast("string"))) % 3 == 0

    cross = base.where(
        (pos == 0) & _is_source(blk) & ~_is_source(blk + 1)
        & (4 * (blk + 1) < n)
    ).select(rr.alias("src"), (4 * blk + 4).alias("dst"))
    edges = succ.unionByName(close).unionByName(cross)
    verts = base.select(rr.alias("id"))
    return edges, verts


def q_reference_graph(spark, sf_dir):
    """Content-reference edge extraction (corpus/extract
    content_reference_edges — the north star's path-link idea when links
    live IN the content): deterministic 'see:doc<t>' mentions are
    planted per document (two targets via the portable md5 hash mod n,
    the planted-truth idiom of q_scc), extracted back with a
    capture-group regexp scan, resolved against the document table
    (semi-join) and deduped.  PLANTED-TRUTH: both engines compute the
    same mentions, but the engine must extract, cast, resolve and dedup
    them through the real kernel."""
    from plato_spark.corpus.extract import content_reference_edges
    from plato_spark.functions.text import portable_h1

    docs = load_table(spark, sf_dir, "documents")
    n = docs.select("doc_id").distinct().count()

    def _target(j):
        return F.pmod(
            portable_h1(
                F.concat(
                    F.lit("ref|"),
                    F.col("doc_id").cast("string"),
                    F.lit(f"|{j}"),
                )
            ),
            F.lit(n),
        ).cast("string")

    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see:doc"), _target(0),
            F.lit(" see:doc"), _target(1),
        ).alias("text"),
    )
    refs = content_reference_edges(planted, r"see:doc([0-9]+)")
    resolved = (
        refs.select("src", F.col("ref").cast("long").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .join(docs.select(F.col("doc_id").alias("dst")).distinct(), "dst", "semi")
    )
    return resolved.select("src", "dst").distinct()


SINKHORN_ITERS = 5


HUB_SWEEP_KS = (0, 50, 100, 200)


HUB_SWEEP_SQL_ITERS = 24


def _sql_hub_prefix_ctes() -> list:
    """hg/hcanon/hdeg CTEs: the citation support graph + degrees."""
    return [f"""hg AS MATERIALIZED ({_sql_reference_graph()}),
hcanon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM hg WHERE src != dst),
hdeg AS MATERIALIZED (
  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT src AS id FROM hcanon UNION ALL SELECT dst FROM hcanon) z
  GROUP BY id)"""]


def _sql_hub_wcc_ctes(k: int, iters: int, pick_sql: str = None) -> list:
    """Per-k CTEs: prune k picked vertices (default: top-k degree hubs;
    ``pick_sql`` overrides the pick, e.g. the hash-uniform random-failure
    policy), symmetrize, unrolled hash-min WCC (final labels in
    hl{k}_{iters})."""
    ctes = []
    prune = (
        f"""WHERE src NOT IN (SELECT id FROM hh{k})
    AND dst NOT IN (SELECT id FROM hh{k})"""
        if k
        else ""
    )
    if k:
        sel = pick_sql or f"SELECT id FROM hdeg ORDER BY deg DESC, id LIMIT {k}"
        ctes.append(f"""hh{k} AS MATERIALIZED (
  {sel})""")
    ctes.append(f"""he{k} AS MATERIALIZED (
  SELECT src, dst FROM hcanon {prune}),
hs{k} AS MATERIALIZED (
  SELECT src, dst FROM he{k}
  UNION ALL SELECT dst AS src, src AS dst FROM he{k}),
hv{k} AS MATERIALIZED (SELECT DISTINCT src AS id FROM hs{k}),
hl{k}_0 AS MATERIALIZED (SELECT id, id AS lab FROM hv{k})""")
    for r in range(iters):
        ctes.append(f"""hl{k}_{r + 1} AS MATERIALIZED (
  SELECT v.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM hv{k} v JOIN hl{k}_{r} l ON v.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM hs{k} e JOIN hl{k}_{r} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON v.id = m.id)""")
    return ctes


def _sql_hub_removal(ks: tuple, iters: int) -> str:
    """Mirror of q_hub_removal: per k, prune the TakeOrdered top-k
    degree hubs (deg DESC, id ASC total order) from the citation
    support graph, then one unrolled hash-min WCC chain; ``iters``
    pinned past the largest per-k fixpoint (measured 15 at k=100 —
    hub removal GROWS the diameter before the graph shatters)."""
    return _sql_removal_sweep(ks, iters, pick_for_k=None)


def _sql_removal_sweep(ks: tuple, iters: int, pick_for_k=None) -> str:
    """Shared removal-sweep mirror; ``pick_for_k(k)`` returns the pick
    SQL (None = the degree-hub default)."""
    ctes = _sql_hub_prefix_ctes()
    rows = []
    for k in ks:
        pick = pick_for_k(k) if (pick_for_k and k) else None
        ctes.extend(_sql_hub_wcc_ctes(k, iters, pick_sql=pick))
        rows.append(f"""SELECT CAST({k} AS INTEGER) AS removed,
  (SELECT CAST(count(*) AS BIGINT) FROM hv{k}) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM he{k}) AS n_edges,
  (SELECT CAST(count(DISTINCT lab) AS BIGINT) FROM hl{k}_{iters})
    AS n_components,
  (SELECT CAST(COALESCE(max(c), 0) AS BIGINT) FROM (
     SELECT count(*) AS c FROM hl{k}_{iters} GROUP BY lab) z) AS largest""")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rows)


def _sql_random_removal(ks: tuple, iters: int) -> str:
    """Mirror of q_random_removal: remove the k vertices with the
    smallest portable_h1('rr|' || id) (ties by id) per sweep point."""
    def pick(k):
        h = H1_SQL.format(s="('rr|' || CAST(id AS VARCHAR))")
        return f"SELECT id FROM hdeg ORDER BY {h}, id LIMIT {k}"

    return _sql_removal_sweep(ks, iters, pick_for_k=pick)


SP_COUNT_SQL_LEVELS = 8


def _sql_sp_counts(levels: int) -> str:
    """Mirror of q_sp_counts: unrolled level-synchronous frontier with
    summed sigma; levels pinned past the measured BFS depth (extra
    levels produce empty frontiers — idempotent)."""
    ctes = ["""spv0 AS MATERIALIZED (
  SELECT min(id) AS id, CAST(1 AS BIGINT) AS sigma FROM verts),
spvis0 AS MATERIALIZED (SELECT id, 0 AS dist, sigma FROM spv0)"""]
    for k in range(levels):
        ctes.append(f"""spf{k + 1} AS MATERIALIZED (
  SELECT e.dst AS id, CAST(sum(f.sigma) AS BIGINT) AS sigma
  FROM edges e JOIN sp{"v" if k == 0 else "f"}{k} f ON e.src = f.id
  WHERE e.dst NOT IN (SELECT id FROM spvis{k})
  GROUP BY e.dst),
spvis{k + 1} AS MATERIALIZED (
  SELECT id, dist, sigma FROM spvis{k}
  UNION ALL SELECT id, {k + 1} AS dist, sigma FROM spf{k + 1})""")
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"""
SELECT id, CAST(dist AS BIGINT) AS dist, sigma FROM spvis{levels}"""
    )


def _sql_component_stability(iters: int) -> str:
    """Mirror of q_component_stability: the k=0 and k=100 unrolled
    hash-min chains of _sql_hub_wcc_ctes joined on the common vertex
    set, then the exact contingency arithmetic of
    algos/partition_metrics (binomials via integer // 2)."""
    ctes = _sql_hub_prefix_ctes()
    ctes.extend(_sql_hub_wcc_ctes(0, iters))
    ctes.extend(_sql_hub_wcc_ctes(100, iters))
    return (
        "WITH " + ",\n".join(ctes) + f""",
j AS MATERIALIZED (
  SELECT a.id, a.lab AS la, b.lab AS lb
  FROM hl0_{iters} a JOIN hl100_{iters} b ON a.id = b.id),
cells AS (SELECT la, lb, CAST(count(*) AS BIGINT) AS nij
          FROM j GROUP BY 1, 2),
snij AS (SELECT CAST(COALESCE(sum(nij * (nij - 1) // 2), 0) AS BIGINT) AS s
         FROM cells),
sa AS (SELECT CAST(COALESCE(sum(ai * (ai - 1) // 2), 0) AS BIGINT) AS s,
              CAST(count(*) AS BIGINT) AS ca
       FROM (SELECT la, CAST(count(*) AS BIGINT) AS ai FROM j GROUP BY la) z),
sb AS (SELECT CAST(COALESCE(sum(bj * (bj - 1) // 2), 0) AS BIGINT) AS s,
              CAST(count(*) AS BIGINT) AS cb
       FROM (SELECT lb, CAST(count(*) AS BIGINT) AS bj FROM j GROUP BY lb) z),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS c2
       FROM j)
SELECT nn.n AS n_common, sa.ca AS clusters_a, sb.cb AS clusters_b,
       CASE WHEN nn.c2 > 0
            THEN round(CAST(nn.c2 - sa.s - sb.s + 2 * snij.s AS DOUBLE)
                       / nn.c2, 6) END AS rand,
       CASE WHEN nn.c2 * (sa.s + sb.s) - 2 * sa.s * sb.s != 0
            THEN round(CAST(2 * (nn.c2 * snij.s - sa.s * sb.s) AS DOUBLE)
                       / (nn.c2 * (sa.s + sb.s) - 2 * sa.s * sb.s), 6)
       END AS ari
FROM nn, snij, sa, sb"""
    )


PRC_ITERS = 12


def _sql_degree_quantiles(nbins: int = 256) -> str:
    return SQL_GRAPH_PREFIX + f""",
x AS (SELECT CAST(deg AS DOUBLE) AS x FROM deg),
st AS (SELECT min(x) AS lo, max(x) AS hi, CAST(count(x) AS BIGINT) AS n
       FROM x),
st2 AS (SELECT lo, hi, n, (hi - lo) / {nbins} AS w,
               CASE WHEN (hi - lo) / {nbins} <> 0.0
                    THEN (hi - lo) / {nbins} ELSE 1.0 END AS w_safe
        FROM st),
h AS MATERIALIZED (
  SELECT least(CAST(floor((x.x - s.lo) / s.w_safe) AS INT),
               {nbins - 1}) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM x, st2 s GROUP BY bin),
c AS (SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      FROM h),
qs AS (SELECT CAST(q AS DOUBLE) AS q
       FROM (VALUES (0.5), (0.9), (0.99)) AS t(q)),
rk AS (SELECT qs.q, s.lo, s.w,
              CAST(greatest(ceil(qs.q * CAST(s.n AS DOUBLE)), 1) AS BIGINT)
                AS r
       FROM qs, st2 s),
pick AS (
  SELECT q, r, lo, w, bin, cnt, cum FROM (
    SELECT rk.q, rk.r, rk.lo, rk.w, c.bin, c.cnt, c.cum,
           row_number() OVER (PARTITION BY rk.q ORDER BY c.bin) AS rn
    FROM rk JOIN c ON c.cum >= rk.r) z
  WHERE rn = 1)
SELECT q, round(lo + w * (bin + CAST(r - (cum - cnt) AS DOUBLE) / cnt), 6)
         AS value
FROM pick ORDER BY q"""


def _sql_orphan_docs() -> str:
    return f"""
WITH g AS MATERIALIZED ({_sql_reference_graph()}),
touched AS (SELECT DISTINCT id FROM (
  SELECT src AS id FROM g UNION ALL SELECT dst FROM g) z)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN t.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS orphans,
       round(CAST(100 * sum(CASE WHEN t.id IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS orphan_pct
FROM documents d LEFT JOIN touched t ON d.doc_id = t.id
GROUP BY d.source ORDER BY d.source"""


def _sql_quality_length_corr() -> str:
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
  FROM documents),
v AS MATERIALIZED (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY token),
lmq AS MATERIALIZED (
  SELECT doc_id, round(CAST(sum(cnt) AS DOUBLE) / count(*), 6) AS mean_tf
  FROM t JOIN v USING (token) GROUP BY doc_id),
aa AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS su FROM documents),
bb AS (SELECT doc_id AS id, CAST(round(mean_tf * 1e6, 0) AS BIGINT) AS su
       FROM lmq),
ra AS (SELECT id, row_number() OVER (ORDER BY su DESC, id) - 1 AS r1
       FROM aa),
rb AS (SELECT id, row_number() OVER (ORDER BY su DESC, id) - 1 AS r2
       FROM bb),
j AS (SELECT ra.id, r1, r2 FROM ra JOIN rb ON ra.id = rb.id),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2
        FROM j)
SELECT n, sum_d2,
       CASE WHEN n > 1
            THEN round(1.0 - CAST(6 * sum_d2 AS DOUBLE)
                             / (n * (n * n - 1)), 6)
       END AS spearman
FROM agg"""


def _sql_conversion_latency(nbins: int = 256) -> str:
    asof = """
WITH e AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS ts,
                  event_id AS eid
           FROM events),
tch AS MATERIALIZED (SELECT u, ts, eid FROM e
                     WHERE t IN ('view', 'click')),
cv AS MATERIALIZED (SELECT u, ts, eid FROM e WHERE t = 'purchase'),
mt AS MATERIALIZED (
  SELECT t.eid AS touch_id, c.gap AS gap_us
  FROM tch t LEFT JOIN LATERAL (
    SELECT c.eid AS ceid, c.ts - t.ts AS gap
    FROM cv c WHERE c.u = t.u AND c.ts >= t.ts
    ORDER BY c.ts, c.eid LIMIT 1) c ON TRUE
  WHERE c.ceid IS NOT NULL),
x AS (SELECT CAST(gap_us AS DOUBLE) / 1000000.0 AS x FROM mt),
st AS (SELECT min(x) AS lo, max(x) AS hi, CAST(count(x) AS BIGINT) AS n
       FROM x),
st2 AS (SELECT lo, hi, n, (hi - lo) / {nbins} AS w,
               CASE WHEN (hi - lo) / {nbins} <> 0.0
                    THEN (hi - lo) / {nbins} ELSE 1.0 END AS w_safe
        FROM st),
h AS MATERIALIZED (
  SELECT least(CAST(floor((x.x - s.lo) / s.w_safe) AS INT),
               {nbins_1}) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM x, st2 s GROUP BY bin),
c AS (SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      FROM h),
qs AS (SELECT CAST(q AS DOUBLE) AS q
       FROM (VALUES (0.5), (0.9), (0.99)) AS t(q)),
rk AS (SELECT qs.q, s.lo, s.w,
              CAST(greatest(ceil(qs.q * CAST(s.n AS DOUBLE)), 1) AS BIGINT)
                AS r
       FROM qs, st2 s),
pick AS (
  SELECT q, r, lo, w, bin, cnt, cum FROM (
    SELECT rk.q, rk.r, rk.lo, rk.w, c.bin, c.cnt, c.cum,
           row_number() OVER (PARTITION BY rk.q ORDER BY c.bin) AS rn
    FROM rk JOIN c ON c.cum >= rk.r) z
  WHERE rn = 1)
SELECT q, round(lo + w * (bin + CAST(r - (cum - cnt) AS DOUBLE) / cnt), 6)
         AS value
FROM pick ORDER BY q"""
    return asof.format(nbins=nbins, nbins_1=nbins - 1)


def _sql_gq_chain(nbins: int, quantiles: tuple, src_sql: str,
                  p: str = "") -> str:
    """CTE chain computing per-group histogram quantiles over
    ``src_sql`` (must yield columns (g, x)); the result lands in
    ``{p}val(g, q, value)``.  All CTE names carry prefix ``p`` so
    multiple chains compose in one query (the MAD oracle runs two)."""
    vals = ", ".join(f"({float(q)!r})" for q in quantiles)
    return f"""{p}x AS MATERIALIZED ({src_sql}),
{p}st AS MATERIALIZED (
  SELECT g, min(x) AS lo, max(x) AS hi, CAST(count(x) AS BIGINT) AS n
  FROM {p}x GROUP BY g),
{p}st2 AS MATERIALIZED (
  SELECT g, lo, hi, n, (hi - lo) / {int(nbins)} AS w,
         CASE WHEN (hi - lo) / {int(nbins)} <> 0.0
              THEN (hi - lo) / {int(nbins)} ELSE 1.0 END AS w_safe
  FROM {p}st),
{p}h AS MATERIALIZED (
  SELECT x.g,
         least(CAST(floor((x.x - s.lo) / s.w_safe) AS INT),
               {int(nbins) - 1}) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM {p}x x JOIN {p}st2 s ON x.g = s.g GROUP BY x.g, bin),
{p}c AS MATERIALIZED (
  SELECT g, bin, cnt,
         sum(cnt) OVER (PARTITION BY g ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM {p}h),
{p}qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES {vals}) AS t(q)),
{p}rk AS (SELECT s.g, qs.q, s.lo, s.w,
              CAST(greatest(ceil(qs.q * CAST(s.n AS DOUBLE)), 1) AS BIGINT)
                AS r
       FROM {p}st2 s CROSS JOIN {p}qs qs),
{p}pick AS (
  SELECT g, q, r, lo, w, bin, cnt, cum FROM (
    SELECT rk.g, rk.q, rk.r, rk.lo, rk.w, c.bin, c.cnt, c.cum,
           row_number() OVER (PARTITION BY rk.g, rk.q ORDER BY c.bin) AS rn
    FROM {p}rk rk JOIN {p}c c ON c.g = rk.g AND c.cum >= rk.r) t
  WHERE rn = 1),
{p}val AS (
  SELECT g, q,
         round(lo + w * (bin + CAST(r - (cum - cnt) AS DOUBLE) / cnt), 6)
           AS value
  FROM {p}pick)"""


_GQ_EVENTS_SRC = ("SELECT event_type AS g, CAST(value AS DOUBLE) AS x "
                  "FROM events WHERE value IS NOT NULL")


def _sql_group_quantiles(nbins: int = 256) -> str:
    return ("WITH "
            + _sql_gq_chain(nbins, (0.5, 0.9, 0.99), _GQ_EVENTS_SRC)
            + "\nSELECT g AS event_type, q, value FROM val"
              "\nORDER BY event_type, q")


def _sql_pagerank_concentration() -> str:
    pr_sql = _sql_pagerank(PRC_ITERS, prefix=_sql_citation_prefix())
    return f"""
WITH prq AS MATERIALIZED ({pr_sql}),
r6 AS (SELECT id, CAST(round(rank * 1e6, 0) AS BIGINT) AS r6 FROM prq),
tt AS (SELECT CAST(sum(r6) AS BIGINT) AS tot FROM r6),
tp AS (SELECT r6, row_number() OVER (ORDER BY r6 DESC, id) AS rn FROM r6),
kd AS (SELECT CAST(k AS INTEGER) AS k FROM (VALUES (10), (100)) AS t(k))
SELECT k, CAST(sum(tp.r6) AS BIGINT) AS mass, tt.tot,
       round(CAST(100 * sum(tp.r6) AS DOUBLE) / tt.tot, 6) AS share_pct
FROM kd JOIN tp ON tp.rn <= kd.k, tt
GROUP BY k, tt.tot ORDER BY k"""


def _sql_rank_corr() -> str:
    pr_sql = _sql_pagerank(PRC_ITERS, prefix=_sql_citation_prefix())
    return f"""
WITH prq AS MATERIALIZED ({pr_sql}),
cg AS MATERIALIZED ({_sql_reference_graph()}),
dg AS (SELECT id, CAST(count(*) AS BIGINT) AS su FROM (
         SELECT src AS id FROM cg UNION ALL SELECT dst FROM cg) z
       GROUP BY id),
pb AS (SELECT id, CAST(round(rank * 1e6, 0) AS BIGINT) AS su FROM prq),
ra AS (SELECT id, row_number() OVER (ORDER BY su DESC, id) - 1 AS r1
       FROM dg),
rb AS (SELECT id, row_number() OVER (ORDER BY su DESC, id) - 1 AS r2
       FROM pb),
j AS (SELECT ra.id, r1, r2 FROM ra JOIN rb ON ra.id = rb.id),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2
        FROM j)
SELECT n, sum_d2,
       CASE WHEN n > 1
            THEN round(1.0 - CAST(6 * sum_d2 AS DOUBLE)
                             / (n * (n * n - 1)), 6)
       END AS spearman
FROM agg"""


def _sql_session_gaps(nbins: int = 256) -> str:
    """Session chain (the events_sessions oracle logic) -> per-user
    lag gaps -> the proven per-group histogram-quantile chain with a
    constant group."""
    chain = _sql_gq_chain(
        nbins, (0.5, 0.9, 0.99),
        "SELECT 0 AS g, CAST(gap_us AS DOUBLE) / 1e6 AS x FROM gap "
        "WHERE gap_us IS NOT NULL",
        p="q",
    )
    return f"""
WITH x0 AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS brk
  FROM events),
g0 AS (SELECT user_id, ts,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS grp
       FROM x0),
sess AS MATERIALIZED (
  SELECT user_id, min(ts) AS st, max(ts) AS en
  FROM g0 GROUP BY user_id, grp),
gap AS MATERIALIZED (
  SELECT epoch_us(st)
         - lag(epoch_us(en)) OVER (PARTITION BY user_id ORDER BY st)
           AS gap_us
  FROM sess),
{chain}
SELECT q, value FROM qval ORDER BY q"""


MKT_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                "MACHINERY"]


def q_segment_pivot(spark, sf_dir):
    """Nation x market-segment contingency table via the PIVOT
    operator: one row per nation, one LONG column per (pinned)
    segment.  Pinning the value list means NO values-discovery job (an
    unpinned pivot first runs a distinct+collect over the data — the
    100-TB killer); execution is the standard two-phase plan (count
    agg + pivot_first), one scan.  Zero-count cells emit 0, not null
    (the left-join zero-bin lesson)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    base = c.join(F.broadcast(n),
                  F.col("c_nationkey") == F.col("n_nationkey"))
    piv = (
        base.groupBy(F.col("n_name").alias("nation"))
        .pivot("c_mktsegment", MKT_SEGMENTS)
        .agg(F.count(F.lit(1)).cast("long"))
    )
    return piv.select(
        "nation",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(s.lower())
          for s in MKT_SEGMENTS],
    )


def _sql_lang_rand_index() -> str:
    refpref = f"""WITH cg AS MATERIALIZED ({_sql_reference_graph()}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM cg WHERE src != dst),
edges AS MATERIALIZED (SELECT src, dst FROM canon
          UNION ALL SELECT dst AS src, src AS dst FROM canon),
verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges)"""
    final = f"""
, j AS (SELECT l.label, d.lang
        FROM lp{LPA_ITERS} l JOIN documents d ON l.id = d.doc_id),
cells AS MATERIALIZED (
  SELECT label, lang, CAST(count(*) AS BIGINT) AS m
  FROM j GROUP BY 1, 2),
parts AS (SELECT CAST(sum(m) AS BIGINT) AS n,
                 CAST(count(DISTINCT label) AS BIGINT) AS nc,
                 CAST(count(DISTINCT lang) AS BIGINT) AS nl,
                 CAST(sum((m * (m - 1)) // 2) AS BIGINT) AS cell2
          FROM cells),
r2 AS (SELECT CAST(sum((a * (a - 1)) // 2) AS BIGINT) AS row2
       FROM (SELECT CAST(sum(m) AS BIGINT) AS a FROM cells
             GROUP BY label)),
cc2 AS (SELECT CAST(sum((b * (b - 1)) // 2) AS BIGINT) AS col2
        FROM (SELECT CAST(sum(m) AS BIGINT) AS b FROM cells
              GROUP BY lang))
SELECT parts.n, parts.nc AS n_communities, parts.nl AS n_langs,
       round(CAST((parts.n * (parts.n - 1)) // 2 + 2 * parts.cell2
                  - r2.row2 - cc2.col2 AS DOUBLE)
             / ((parts.n * (parts.n - 1)) // 2), 6) AS rand_index
FROM parts CROSS JOIN r2 CROSS JOIN cc2"""
    return _sql_lpa(LPA_ITERS, prefix=refpref, final=final)


def _observed_catalog(spark, sf_dir):
    """(l_partkey, l_suppkey, qty, unit_u) — the observed supply
    catalog derived from lineitem (this schema has no partsupp table):
    per line, the unit price quantized to EXACT integer 1e-4 cents via
    floor division (extprice_c * 10000) div qty — the deterministic
    stand-in for a rational compare; both engines floor identically."""
    li = load_table(spark, sf_dir, "lineitem")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    return li.select(
        "l_partkey", "l_suppkey", qty.alias("qty"), pc.alias("pc")
    ).select(
        "l_partkey", "l_suppkey", "qty",
        # integer floor division — a double divide could round across
        # an integer boundary and flip an argmin
        F.expr("(pc * 10000) div qty").cast("long").alias("unit_u"))


MARKOV_ITERS = 8


def _sql_reorder_gaps(nbins: int = 256) -> str:
    chain = _sql_gq_chain(
        nbins, (0.5, 0.9, 0.99),
        "SELECT 0 AS g, CAST(gap_days AS DOUBLE) AS x FROM gap "
        "WHERE gap_days IS NOT NULL",
        p="q",
    )
    return f"""
WITH o AS (SELECT o_custkey, o_orderkey,
                  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                       AS BIGINT) AS day_i
           FROM orders),
gap AS MATERIALIZED (
  SELECT day_i - lag(day_i) OVER (
           PARTITION BY o_custkey ORDER BY day_i, o_orderkey)
           AS gap_days
  FROM o),
{chain}
SELECT q, value FROM qval ORDER BY q"""


def _sql_markov_stationary(iters: int = MARKOV_ITERS) -> str:
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
x{i} AS MATERIALIZED (
  SELECT s.state, COALESCE(t.w, 0.0) AS w
  FROM st s LEFT JOIN (
    SELECT p.dst_type AS state, sum(x.w * p.p) AS w
    FROM p JOIN x{i - 1} x ON x.state = p.src_type
    GROUP BY p.dst_type) t ON s.state = t.state)""")
    return f"""
WITH s0 AS (SELECT event_type AS t,
              lead(event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS nt
            FROM events),
c AS MATERIALIZED (
  SELECT t AS src_type, nt AS dst_type, CAST(count(*) AS BIGINT) AS n
  FROM s0 WHERE nt IS NOT NULL GROUP BY 1, 2),
p AS MATERIALIZED (
  SELECT src_type, dst_type,
         CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src_type) AS p
  FROM c),
st AS MATERIALIZED (
  SELECT src_type AS state FROM c
  UNION SELECT dst_type FROM c),
ns AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
x0 AS (SELECT state, 1.0 / ns.k AS w FROM st CROSS JOIN ns),
{",".join(steps)}
SELECT state, round(w, 6) AS w FROM x{iters} ORDER BY state"""


def _sql_pca_project(rounds: int) -> str:
    c1 = _sql_pca_component(rounds)
    c2 = _sql_pca_second(rounds)
    return f"""
WITH comp1 AS MATERIALIZED ({c1}),
comp2 AS MATERIALIZED ({c2}),
l1 AS (SELECT list(loading ORDER BY dim) AS arr FROM comp1),
l2 AS (SELECT list(loading ORDER BY dim) AS arr FROM comp2),
pex AS MATERIALIZED (
  SELECT vec_id AS id, u.p.d - 1 AS dim, CAST(u.p.v AS DOUBLE) AS x
  FROM embeddings,
       UNNEST([{{'d': i, 'v': embedding[i]}}
               for i in range(1, length(embedding) + 1)]) AS u(p)),
pm AS (SELECT dim, round(sum(x) / count(x), 6) AS m
       FROM pex GROUP BY dim),
ma AS (SELECT list(m ORDER BY dim) AS marr FROM pm),
vx AS MATERIALIZED (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
cvx AS (SELECT id,
               [vec[i] - ma.marr[i] for i in range(1, length(vec) + 1)]
                 AS cvec
        FROM vx, ma)
SELECT id,
       round(list_sum([cvec[i] * l1.arr[i]
                       for i in range(1, length(cvec) + 1)]), 6) AS p1,
       round(list_sum([cvec[i] * l2.arr[i]
                       for i in range(1, length(cvec) + 1)]), 6) AS p2
FROM cvx, l1, l2 ORDER BY id"""


def _sql_pca_plane_variance(rounds: int) -> str:
    c1 = _sql_pca_component(rounds)
    c2 = _sql_pca_second(rounds)
    return f"""
WITH comp1 AS MATERIALIZED ({c1}),
comp2 AS MATERIALIZED ({c2}),
{_sql_gramian_cells("g")},
pc3 AS MATERIALIZED (
  SELECT i, j, CAST(round(c / 1000.0, 0) AS BIGINT) AS c3 FROM gcells),
w1 AS (SELECT dim, CAST(round(loading * 1e3, 0) AS BIGINT) AS v3
       FROM comp1),
w2 AS (SELECT dim, CAST(round(loading * 1e3, 0) AS BIGINT) AS v3
       FROM comp2),
q1 AS (SELECT (SELECT CAST(sum(pc3.c3 * a.v3 * b.v3) AS BIGINT)
               FROM pc3 JOIN w1 a ON pc3.i = a.dim
                        JOIN w1 b ON pc3.j = b.dim) AS num1,
              (SELECT CAST(sum(v3 * v3) AS BIGINT) FROM w1) AS den1),
q2 AS (SELECT (SELECT CAST(sum(pc3.c3 * a.v3 * b.v3) AS BIGINT)
               FROM pc3 JOIN w2 a ON pc3.i = a.dim
                        JOIN w2 b ON pc3.j = b.dim) AS num2,
              (SELECT CAST(sum(v3 * v3) AS BIGINT) FROM w2) AS den2),
trr AS (SELECT CAST(sum(c3) AS BIGINT) AS tr3 FROM pc3 WHERE i = j)
SELECT round(CAST(num1 AS DOUBLE) / (den1 * 1000.0), 6) AS lambda1,
       round(CAST(num2 AS DOUBLE) / (den2 * 1000.0), 6) AS lambda2,
       round(CAST(tr3 AS DOUBLE) / 1e3, 6) AS trace,
       CASE WHEN tr3 > 0
            THEN round((100.0 * (CAST(num1 AS DOUBLE) / (den1 * 1000.0)
                                 + CAST(num2 AS DOUBLE) / (den2 * 1000.0)))
                       / (CAST(tr3 AS DOUBLE) / 1e3), 6)
       END AS plane_pct
FROM q1, q2, trr"""


def _sql_pca_variance(rounds: int) -> str:
    comp = _sql_pca_component(rounds)
    return f"""
WITH comp AS MATERIALIZED ({comp}),
{_sql_gramian_cells("g")},
v3 AS (SELECT dim, CAST(round(loading * 1e3, 0) AS BIGINT) AS v3
       FROM comp),
c3t AS (SELECT i, j, CAST(round(c / 1000.0, 0) AS BIGINT) AS c3
        FROM gcells),
num AS (SELECT CAST(sum(c3t.c3 * a.v3 * b.v3) AS BIGINT) AS num
        FROM c3t JOIN v3 a ON c3t.i = a.dim JOIN v3 b ON c3t.j = b.dim),
den AS (SELECT CAST(sum(v3 * v3) AS BIGINT) AS den FROM v3),
tr AS (SELECT CAST(sum(c3) AS BIGINT) AS tr3 FROM c3t WHERE i = j)
SELECT round(CAST(num AS DOUBLE) / (den * 1000.0), 6) AS lambda_top,
       round(CAST(tr3 AS DOUBLE) / 1e3, 6) AS trace,
       CASE WHEN tr3 > 0
            THEN round(CAST(100 * num AS DOUBLE) / (den * tr3), 6)
       END AS explained_pct
FROM num, den, tr"""


LANG_VOCAB_K = 10


def _sql_lang_modularity() -> str:
    return f"""
WITH g AS MATERIALIZED ({_sql_reference_graph()}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM g WHERE src != dst),
part AS MATERIALIZED (SELECT doc_id AS id, lang AS comm FROM documents),
wtot AS (SELECT CAST(count(*) AS BIGINT) AS w FROM canon),
intra AS MATERIALIZED (
  SELECT p1.comm, CAST(count(*) AS BIGINT) AS wc
  FROM canon c JOIN part p1 ON c.src = p1.id JOIN part p2 ON c.dst = p2.id
  WHERE p1.comm = p2.comm GROUP BY p1.comm),
deg AS MATERIALIZED (
  SELECT id, CAST(count(*) AS BIGINT) AS wsum FROM (
    SELECT src AS id FROM canon UNION ALL SELECT dst FROM canon) z
  GROUP BY id),
dtot AS MATERIALIZED (
  SELECT p.comm, CAST(sum(d.wsum) AS BIGINT) AS dc
  FROM part p JOIN deg d ON p.id = d.id GROUP BY p.comm),
num AS (SELECT CAST(sum(4 * (SELECT w FROM wtot) * COALESCE(i.wc, 0)
                     - d.dc * d.dc) AS BIGINT) AS n
        FROM dtot d LEFT JOIN intra i ON d.comm = i.comm)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM dtot) AS n_communities,
       (SELECT CAST(COALESCE(sum(wc), 0) AS BIGINT) FROM intra)
         AS intra_weight,
       round(CAST((SELECT n FROM num) AS DOUBLE)
             / CAST(4 * (SELECT w FROM wtot) * (SELECT w FROM wtot)
                    AS DOUBLE), 6) AS modularity"""


def _sql_session_stats(gap_s: int = 1800) -> str:
    return f"""
WITH x AS (
  SELECT user_id, ts, epoch_us(ts) AS tus,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL {int(gap_s)} SECOND
              THEN 0 ELSE 1 END AS brk
  FROM events),
g AS MATERIALIZED (
  SELECT user_id, tus,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM x),
s AS MATERIALIZED (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(tus) - min(tus) AS BIGINT) AS dur_us
  FROM g GROUP BY user_id, grp),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce,
             CAST(sum(n_events) AS BIGINT) AS se,
             CAST(sum(dur_us) AS BIGINT) AS sd,
             CAST(max(dur_us) AS BIGINT) AS max_dur_us
      FROM s)
SELECT n_sessions, n_bounce,
       round(CAST(100 * n_bounce AS DOUBLE) / n_sessions, 6) AS bounce_pct,
       round(CAST(se AS DOUBLE) / n_sessions, 6) AS avg_events,
       CAST(sd // n_sessions AS BIGINT) AS avg_dur_us,
       max_dur_us
FROM a"""


def _sql_trimmed_mean(nbins: int = 256) -> str:
    return ("WITH " + _sql_gq_chain(nbins, (0.05, 0.95), _GQ_EVENTS_SRC)
            + f""",
band AS (SELECT g,
                min(CASE WHEN q = 0.05 THEN lo + w * bin END) AS lo_t,
                min(CASE WHEN q = 0.95 THEN lo + w * (bin + 1) END) AS hi_t
         FROM pick GROUP BY g),
v AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS x,
             CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS xc
      FROM events WHERE value IS NOT NULL),
j AS (SELECT v.g, v.x, v.xc, b.lo_t, b.hi_t
      FROM v JOIN band b ON v.g = b.g),
a AS (SELECT g,
             CAST(sum(CASE WHEN x BETWEEN lo_t AND hi_t THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN x BETWEEN lo_t AND hi_t THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_trimmed,
             CAST(sum(CASE WHEN x BETWEEN lo_t AND hi_t THEN xc ELSE 0 END)
                  AS BIGINT) AS sc
      FROM j GROUP BY g)
SELECT g AS event_type, n_kept, n_trimmed,
       CASE WHEN n_kept > 0
            THEN round(CAST(sc AS DOUBLE) / (100.0 * n_kept), 6)
       END AS tmean
FROM a ORDER BY event_type""")


def _sql_mad_outliers(nbins: int = 256, k: float = 3.0) -> str:
    dev_src = "SELECT g, dev AS x FROM vv"
    return ("WITH " + _sql_gq_chain(nbins, (0.5,), _GQ_EVENTS_SRC, p="m1")
            + f""",
med AS (SELECT g, value AS med FROM m1val),
vv AS MATERIALIZED (
  SELECT e.g, e.x, med.med, abs(e.x - med.med) AS dev
  FROM ({_GQ_EVENTS_SRC}) e JOIN med ON e.g = med.g),
"""
            + _sql_gq_chain(nbins, (0.5,), dev_src, p="m2")
            + f""",
madt AS (SELECT g, value AS mad FROM m2val)
SELECT v.g AS event_type, v.med, m.mad,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN v.dev > {float(k)!r} * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM vv v JOIN madt m ON v.g = m.g
GROUP BY v.g, v.med, m.mad ORDER BY event_type""")


def _sql_harmonic_exact(num_roots: int = 64, bfs_iters: int = 6,
                        wcc_iters: int = 10, radius_cap: int = 20) -> str:
    import math as _math

    lcm = _math.lcm(*range(1, radius_cap + 1))
    return _sql_multi_bfs_ctes(num_roots, bfs_iters, wcc_iters) + f""",
u AS (SELECT root,
             CAST(sum(CASE WHEN dist > 0 THEN {lcm} // dist ELSE 0 END)
                  AS BIGINT) AS units
      FROM m{bfs_iters} GROUP BY root)
SELECT root AS id,
       round(CAST(units AS DOUBLE) / {float(lcm)!r}, 6) AS harmonic
FROM u ORDER BY id"""


def _sql_fixed_hist_quantiles(lo: float = 0.0, hi: float = 600.0,
                              nbins: int = 256) -> str:
    w = (float(hi) - float(lo)) / int(nbins)
    return f"""
WITH x AS (SELECT CAST(value AS DOUBLE) AS v FROM events
           WHERE value IS NOT NULL),
h AS MATERIALIZED (
  SELECT greatest(least(CAST(floor((v - {lo!r}) / {w!r}) AS INT),
                        {int(nbins) - 1}), 0) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM x GROUP BY 1),
c AS MATERIALIZED (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
  FROM h),
nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
qs AS (SELECT CAST(q AS DOUBLE) AS q
       FROM (VALUES (0.5), (0.9), (0.99)) AS t(q)),
rk AS (SELECT q, CAST(greatest(ceil(q * CAST(n AS DOUBLE)), 1) AS BIGINT)
                AS r
       FROM qs, nn),
pick AS (
  SELECT q, r, bin, cnt, cum FROM (
    SELECT rk.q, rk.r, c.bin, c.cnt, c.cum,
           row_number() OVER (PARTITION BY rk.q ORDER BY c.bin) AS rn
    FROM rk JOIN c ON c.cum >= rk.r) t
  WHERE rn = 1)
SELECT q, round({lo!r} + {w!r} * (bin + CAST(r - (cum - cnt) AS DOUBLE)
                                        / cnt), 6) AS value
FROM pick ORDER BY q"""


def _sql_dedup_savings() -> str:
    return f"""
WITH cl AS MATERIALIZED ({_sql_dedup_clusters_lsh()}),
mf AS (SELECT d.doc_id AS id, d.n_chars,
              (cl.keeper_id IS NULL OR cl.keeper_id = d.doc_id) AS keep
       FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS dropped,
       CAST(sum(CASE WHEN keep THEN 0 ELSE n_chars END) AS BIGINT)
         AS chars_reclaimed,
       round(CAST(100 * sum(CASE WHEN keep THEN 0 ELSE 1 END) AS DOUBLE)
             / count(*), 6) AS drop_pct
FROM mf"""


def _sql_dup_cross_sources() -> str:
    return f"""
WITH cl AS MATERIALIZED ({_sql_dedup_clusters_lsh()}),
m AS MATERIALIZED (
  SELECT cl.keeper_id, cl.doc_id, d.source
  FROM cl JOIN documents d ON cl.doc_id = d.doc_id)
SELECT least(a.source, b.source) AS source_a,
       greatest(a.source, b.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM m a JOIN m b ON a.keeper_id = b.keeper_id AND a.doc_id < b.doc_id
GROUP BY source_a, source_b ORDER BY source_a, source_b"""


def _emb_double(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )


SEEDED_LPA_ITERS = 3


def _sql_label_centroid_ctes() -> str:
    """ex/cd/cv/cn/cj CTE block (label, cvec, n) — shared by the
    centroid_similarity and embedding_purity oracles."""
    return """ex AS MATERIALIZED (
  SELECT label, u.p.d AS dim, CAST(u.p.v AS DOUBLE) AS v
  FROM embeddings,
       UNNEST([{'d': i, 'v': embedding[i]}
               for i in range(1, length(embedding) + 1)]) AS u(p)),
cd AS MATERIALIZED (
  SELECT label, dim, round(sum(v) / count(v), 6) AS m
  FROM ex GROUP BY label, dim),
cv AS MATERIALIZED (
  SELECT label, list(m ORDER BY dim) AS cvec FROM cd GROUP BY label),
cn AS (SELECT label, CAST(count(*) AS BIGINT) AS n
       FROM embeddings GROUP BY label),
cj AS (SELECT c.label, c.cvec, n.n FROM cv c JOIN cn n ON c.label = n.label)"""


def _sql_embedding_purity() -> str:
    cos9 = f"round({_cos_sql('v.vec', 'c.cvec')}, 9)"
    return f"""
WITH {_sql_label_centroid_ctes()},
v AS MATERIALIZED (
  SELECT vec_id AS id, label AS true_label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
asg AS MATERIALIZED (
  SELECT id, true_label, clabel AS pred FROM (
    SELECT v.id, v.true_label, c.label AS clabel,
           row_number() OVER (PARTITION BY v.id
                              ORDER BY {cos9} DESC, c.label ASC) AS rn
    FROM v CROSS JOIN cj c) t WHERE rn = 1)
SELECT true_label AS label, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN pred = true_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct
FROM asg GROUP BY true_label ORDER BY label"""


def _sql_peak_concurrency(gap_s: int = 1800) -> str:
    gap_us = gap_s * 1_000_000
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
o AS (SELECT user_id, t,
        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
               OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                    > {gap_us}
             THEN 1 ELSE 0 END AS ns
      FROM e),
sid AS MATERIALIZED (
  SELECT user_id, t,
         sum(ns) OVER (PARTITION BY user_id ORDER BY t
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM o),
s AS MATERIALIZED (
  SELECT user_id, sid, min(t) AS a, max(t) AS b
  FROM sid GROUP BY user_id, sid),
d AS (SELECT a AS t, 1 AS d FROM s
      UNION ALL SELECT b AS t, -1 AS d FROM s),
pt AS (SELECT t, CAST(sum(d) AS BIGINT) AS net,
              CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS ends
       FROM d GROUP BY t),
c AS MATERIALIZED (
  SELECT t, sum(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) + ends
           AS cand
  FROM pt),
p AS (SELECT max(cand) AS peak FROM c)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_sessions,
       CAST(p.peak AS BIGINT) AS peak,
       CAST((SELECT min(t) FROM c WHERE cand = p.peak) AS BIGINT)
         AS peak_at_us
FROM p"""


def _sql_silhouette() -> str:
    own = _cos_sql("v.vec", "c.cvec")
    return f"""
WITH {_sql_label_centroid_ctes()},
v AS MATERIALIZED (
  SELECT vec_id AS id, label AS true_label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
sc AS MATERIALIZED (
  SELECT v.id, v.true_label, c.label AS clabel,
         round({own}, 9) AS sim
  FROM v CROSS JOIN cj c),
per AS (
  SELECT id, true_label,
         max(CASE WHEN clabel = true_label THEN sim END) AS own_sim,
         max(CASE WHEN clabel <> true_label THEN sim END) AS other_sim
  FROM sc GROUP BY id, true_label),
sv AS (
  SELECT true_label,
         CASE WHEN other_sim IS NULL THEN NULL
              WHEN greatest(1.0 - own_sim, 1.0 - other_sim) > 0
              THEN CAST(round(round(((1.0 - other_sim) - (1.0 - own_sim))
                     / greatest(1.0 - own_sim, 1.0 - other_sim), 9) * 1e9,
                     0) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS s9
  FROM per)
SELECT true_label AS label, CAST(count(*) AS BIGINT) AS n,
       CASE WHEN count(s9) > 0
            THEN round(CAST(sum(s9) AS DOUBLE) / (count(s9) * 1e9), 6)
       END AS silhouette
FROM sv GROUP BY true_label ORDER BY label"""


PCA_ROUNDS = 8


def _sql_norm_quantiles(nbins: int = 256) -> str:
    return f"""
WITH x AS MATERIALIZED (
  SELECT round(sqrt(list_sum(
           [CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
            for v in embedding])), 6) AS x
  FROM embeddings),
st AS (SELECT min(x) AS lo, max(x) AS hi, CAST(count(x) AS BIGINT) AS n
       FROM x),
st2 AS (SELECT lo, hi, n, (hi - lo) / {nbins} AS w,
               CASE WHEN (hi - lo) / {nbins} <> 0.0
                    THEN (hi - lo) / {nbins} ELSE 1.0 END AS w_safe
        FROM st),
h AS MATERIALIZED (
  SELECT least(CAST(floor((x.x - s.lo) / s.w_safe) AS INT),
               {nbins - 1}) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM x, st2 s GROUP BY bin),
c AS (SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      FROM h),
qs AS (SELECT CAST(q AS DOUBLE) AS q
       FROM (VALUES (0.5), (0.9), (0.99)) AS t(q)),
rk AS (SELECT qs.q, s.lo, s.w,
              CAST(greatest(ceil(qs.q * CAST(s.n AS DOUBLE)), 1) AS BIGINT)
                AS r
       FROM qs, st2 s),
pick AS (
  SELECT q, r, lo, w, bin, cnt, cum FROM (
    SELECT rk.q, rk.r, rk.lo, rk.w, c.bin, c.cnt, c.cum,
           row_number() OVER (PARTITION BY rk.q ORDER BY c.bin) AS rn
    FROM rk JOIN c ON c.cum >= rk.r) z
  WHERE rn = 1)
SELECT q, round(lo + w * (bin + CAST(r - (cum - cnt) AS DOUBLE) / cnt), 6)
         AS value
FROM pick ORDER BY q"""


def _sql_gramian_cells(p: str = "") -> str:
    """{p}cells CTE chain: the mean-centered gramian as 1e6-scaled
    BIGINT cells (mirror of functions/similarity._gramian_cells)."""
    return f"""{p}ex AS MATERIALIZED (
  SELECT vec_id AS id, u.p.d - 1 AS dim, CAST(u.p.v AS DOUBLE) AS x
  FROM embeddings,
       UNNEST([{{'d': i, 'v': embedding[i]}}
               for i in range(1, length(embedding) + 1)]) AS u(p)),
{p}mns AS (SELECT dim, round(sum(x) / count(x), 6) AS m
           FROM {p}ex GROUP BY dim),
{p}cx AS MATERIALIZED (
  SELECT id, e.dim, x - m AS x
  FROM {p}ex e JOIN {p}mns mn ON e.dim = mn.dim),
{p}cells9 AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j,
         CAST(sum(CAST(round(round(a.x * b.x, 9) * 1e9, 0) AS BIGINT))
              AS BIGINT) AS c9
  FROM {p}cx a JOIN {p}cx b ON a.id = b.id GROUP BY a.dim, b.dim),
{p}cells AS MATERIALIZED (
  SELECT i, j, CAST(round(c9 / 1000.0, 0) AS BIGINT) AS c FROM {p}cells9)"""


def _sql_power_rounds(cells: str, vp: str, rounds: int) -> list:
    """Unrolled integer power-iteration CTEs over ``cells`` (i, j, c);
    the converged vector lands in {vp}{rounds}(j, v) at 1e6 scale."""
    ctes = [f"""{vp}0 AS MATERIALIZED (
  SELECT DISTINCT i AS j, CAST(1000000 AS BIGINT) AS v FROM {cells})"""]
    for k in range(rounds):
        ctes.append(f"""{vp}s{k} AS MATERIALIZED (
  SELECT c.i, CAST(sum(c.c * v.v) AS BIGINT) AS s
  FROM {cells} c JOIN {vp}{k} v ON c.j = v.j GROUP BY c.i),
{vp}m{k} AS (SELECT max(abs(s)) AS mx FROM {vp}s{k}),
{vp}{k + 1} AS MATERIALIZED (
  SELECT i AS j,
         CASE WHEN mx > 0
              THEN CAST(round((CAST(s AS DOUBLE) / mx) * 1e6, 0) AS BIGINT)
              ELSE 0 END AS v
  FROM {vp}s{k}, {vp}m{k})""")
    return ctes


def _sql_pca_component(rounds: int) -> str:
    ctes = [_sql_gramian_cells()] + _sql_power_rounds("cells", "v", rounds)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT j AS dim, round(CAST(v AS DOUBLE) / 1e6, 6) AS loading
FROM v{rounds} ORDER BY dim""")


def _sql_pca_second(rounds: int) -> str:
    ctes = [_sql_gramian_cells()] + _sql_power_rounds("cells", "v", rounds)
    ctes.append(f"""tv3 AS (SELECT j, CAST(round(v / 1000.0, 0) AS BIGINT)
                AS v3 FROM v{rounds}),
tc3 AS MATERIALIZED (
  SELECT i, j, CAST(round(c / 1000.0, 0) AS BIGINT) AS c3 FROM cells),
nd AS (SELECT (SELECT CAST(sum(tc3.c3 * a.v3 * b.v3) AS BIGINT)
               FROM tc3 JOIN tv3 a ON tc3.i = a.j JOIN tv3 b ON tc3.j = b.j)
                 AS num,
              (SELECT CAST(sum(v3 * v3) AS BIGINT) FROM tv3) AS den),
defl AS MATERIALIZED (
  SELECT tc3.i, tc3.j,
         tc3.c3 - CAST(round(((CAST(nd.num AS DOUBLE) / nd.den)
                             * (a.v3 * b.v3)) / nd.den, 0) AS BIGINT) AS c
  FROM tc3 JOIN tv3 a ON tc3.i = a.j JOIN tv3 b ON tc3.j = b.j, nd)""")
    ctes += _sql_power_rounds("defl", "w", rounds)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT j AS dim, round(CAST(v AS DOUBLE) / 1e6, 6) AS loading
FROM w{rounds} ORDER BY dim""")


def _sql_ivf_recall(k: int = 5) -> str:
    return f"""
WITH bf AS MATERIALIZED ({_sql_ann_topk(k)}),
iv AS MATERIALIZED ({_sql_ivf_ann(k)}),
h AS (SELECT b.query_id, CAST(count(*) AS BIGINT) AS hits
      FROM bf b JOIN iv ON b.query_id = iv.query_id
                       AND b.nbr_id = iv.nbr_id
      GROUP BY b.query_id)
SELECT q.query_id, COALESCE(h.hits, 0) AS hits
FROM (SELECT DISTINCT query_id FROM bf) q
LEFT JOIN h ON q.query_id = h.query_id ORDER BY q.query_id"""


def _sql_zorder(bits: int = 16) -> str:
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((((user_id & {mask}) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((((hh & {mask}) >> {i}) & 1) << {2 * i})")
    return f"""
WITH e AS (SELECT event_id,
                  user_id,
                  CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hh
           FROM events)
SELECT event_id, CAST({' + '.join(terms)} AS BIGINT) AS z
FROM e ORDER BY event_id"""


def _sql_bpe_compression(merges: int) -> str:
    """Mirror of functions/bpe.bpe_compression: the bpe_merges CTE chain
    plus one symbol-count aggregate per w{k}."""
    base = _sql_bpe_merges(merges)
    # keep the CTE chain, swap the merge-table read-out for counts
    head = base.split("\nSELECT CAST(", 1)[0]
    counts = ",\n".join(
        f"n{k} AS (SELECT CAST(sum(freq * length(s)) AS BIGINT)"
        f" AS total_symbols FROM w{k})"
        for k in range(0, merges + 1)
    )
    union = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS round, total_symbols FROM n{k}"
        for k in range(0, merges + 1)
    )
    return head + ",\n" + counts + "\n" + union + " ORDER BY round"


SPECTRAL_ROUNDS = 20


def q_spectral_coord(spark, sf_dir):
    """Fiedler-coordinate estimate via deflated power iteration on
    sigma*I - L (algos/spectral.spectral_coordinate): SPECTRAL_ROUNDS
    pinned rounds, mean-centering deflation, order-independent max-abs
    normalization — the spectral-bisection sweep order."""
    from plato_spark.algos.spectral import spectral_coordinate

    return spectral_coordinate(_sym(spark, sf_dir), rounds=SPECTRAL_ROUNDS)


def _sql_spectral(iters: int) -> str:
    """Mirror of algos/spectral.spectral_coordinate over the
    co-occurrence graph: unrolled gather/center/normalize chain."""
    ctes = ["""sg AS MATERIALIZED (
  SELECT CAST(2 * max(deg) + 1 AS DOUBLE) AS sigma FROM deg),
y0 AS MATERIALIZED (SELECT id, CAST(id AS DOUBLE) AS y FROM deg),
mu0 AS (SELECT sum(y) / count(y) AS mu FROM y0),
c0 AS MATERIALIZED (SELECT id, y - m.mu AS c FROM y0, mu0 m),
mm0 AS (SELECT max(abs(c)) AS m FROM c0),
x0 AS MATERIALIZED (
  SELECT id, CASE WHEN m.m > 0 THEN c / m.m ELSE c END AS x
  FROM c0, mm0 m)"""]
    for k in range(iters):
        ctes.append(f"""g{k + 1} AS MATERIALIZED (
  SELECT e.dst AS id, sum(x.x) AS g
  FROM edges e JOIN x{k} x ON e.src = x.id GROUP BY e.dst),
y{k + 1} AS MATERIALIZED (
  SELECT d.id, (s.sigma - d.deg) * x.x + COALESCE(g.g, 0.0) AS y
  FROM deg d JOIN x{k} x ON d.id = x.id
  LEFT JOIN g{k + 1} g ON d.id = g.id, sg s),
mu{k + 1} AS (SELECT sum(y) / count(y) AS mu FROM y{k + 1}),
c{k + 1} AS MATERIALIZED (
  SELECT id, y - m.mu AS c FROM y{k + 1}, mu{k + 1} m),
mm{k + 1} AS (SELECT max(abs(c)) AS m FROM c{k + 1}),
x{k + 1} AS MATERIALIZED (
  SELECT id, CASE WHEN m.m > 0 THEN c / m.m ELSE c END AS x
  FROM c{k + 1}, mm{k + 1} m)""")
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        # CASE canonicalizes IEEE -0.0 to +0.0 (the Fiedler coordinate
        # has an atom at zero; see algos/spectral.py): DuckDB's
        # round(-1e-9, 6) yields -0.0, which value-compares equal to
        # 0.0 but string-sorts into the negative block, misaligning a
        # sorted value-hash compare.
        + f"\nSELECT id, CASE WHEN round(x, 6) = 0 THEN 0.0 "
          f"ELSE round(x, 6) END AS f FROM x{iters} ORDER BY id"
    )


FUNNEL_WINDOW_S = 86400


DIFF_ALPHA = 0.5


DIFF_ROUNDS = 8


def _sql_attr_diffusion(iters: int, alpha: float) -> str:
    """Mirror of q_attr_diffusion: unrolled diffusion chain over the
    symmetrized planted citation graph with n_chars as x0."""
    ctes = [f"""cg AS MATERIALIZED ({_sql_reference_graph()}),
se AS MATERIALIZED (
  SELECT src, dst FROM cg UNION SELECT dst AS src, src AS dst FROM cg),
dv AS MATERIALIZED (
  SELECT DISTINCT src AS id FROM se UNION SELECT DISTINCT dst FROM se),
db AS MATERIALIZED (
  SELECT v.id, CAST(d.n_chars AS DOUBLE) AS x0,
         CAST(g.deg AS BIGINT) AS deg
  FROM dv v JOIN documents d ON v.id = d.doc_id
  JOIN (SELECT src AS id, count(*) AS deg FROM se GROUP BY src) g
    ON v.id = g.id),
x0 AS MATERIALIZED (SELECT id, x0 AS x FROM db)"""]
    for k in range(iters):
        ctes.append(f"""x{k + 1} AS MATERIALIZED (
  SELECT b.id,
         {1.0 - alpha} * b.x0
         + {alpha} * COALESCE(g.g, 0.0) / b.deg AS x
  FROM db b LEFT JOIN (
    SELECT e.dst AS id, sum(x.x) AS g
    FROM se e JOIN x{k} x ON e.src = x.id GROUP BY e.dst) g
    ON b.id = g.id)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, round(x, 6) AS x FROM x{iters} ORDER BY id"
    )


def _sql_rrf_fusion(k: int = 5, c: int = 60) -> str:
    """Mirror of q_rrf_fusion: both ranked lists as nested-WITH CTEs,
    1/(c+rank) terms, raw-score fused ordering."""
    return f"""
WITH bf AS MATERIALIZED ({_sql_ann_topk(k)}),
iv AS MATERIALIZED ({_sql_ivf_ann(k)}),
u AS (SELECT query_id, nbr_id, 1.0 / ({c} + "rank") AS t FROM bf
      UNION ALL
      SELECT query_id, nbr_id, 1.0 / ({c} + "rank") AS t FROM iv),
sc AS (SELECT query_id, nbr_id, sum(t) AS score
       FROM u GROUP BY query_id, nbr_id)
SELECT query_id, nbr_id, round(score, 6) AS rrf, CAST(rn AS INT) AS "rank"
FROM (SELECT query_id, nbr_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, nbr_id ASC) AS rn
      FROM sc) t
WHERE rn <= {k} ORDER BY query_id, "rank" """


HIT_ROUNDS = 10


HIT_SEEDS = 4


def _sql_hitting(iters: int, n_seeds: int) -> str:
    """Mirror of algos/hitting.truncated_hitting_time over the
    co-occurrence graph: unrolled Jacobi chain h0..h{iters}."""
    ctes = [f"""srcs AS MATERIALIZED (SELECT id FROM verts ORDER BY id LIMIT {n_seeds}),
hb AS MATERIALIZED (
  SELECT v.id, d.deg,
         CASE WHEN s.id IS NOT NULL THEN 1 ELSE 0 END AS is_seed
  FROM verts v JOIN deg d ON v.id = d.id LEFT JOIN srcs s ON v.id = s.id),
h0 AS MATERIALIZED (SELECT id, CAST(0.0 AS DOUBLE) AS h FROM verts)"""]
    for k in range(iters):
        ctes.append(f"""h{k + 1} AS MATERIALIZED (
  SELECT b.id,
         CASE WHEN b.is_seed = 1 THEN 0.0
              ELSE 1.0 + COALESCE(g.g, 0.0) / b.deg END AS h
  FROM hb b LEFT JOIN (
    SELECT e.dst AS id, sum(h.h) AS g
    FROM edges e JOIN h{k} h ON e.src = h.id GROUP BY e.dst) g
    ON b.id = g.id)""")
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT id, round(h, 6) AS hit FROM h{iters} ORDER BY id"
    )


SIMRANK_K = 32


SIMRANK_ITERS = 5


def _sql_simrank(k: int, iters: int, c: float = 0.8) -> str:
    """Mirror of algos/simrank.simrank_topk over the co-occurrence
    graph: unrolled pair-state chain s0..s{iters}."""
    ctes = [f"""topk AS MATERIALIZED (
  SELECT id FROM deg ORDER BY deg DESC, id ASC LIMIT {k}),
esub AS MATERIALIZED (
  SELECT e.src, e.dst FROM edges e
  JOIN topk x ON e.src = x.id JOIN topk y ON e.dst = y.id),
dsub AS MATERIALIZED (
  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM esub GROUP BY src),
prs AS MATERIALIZED (
  SELECT x.id AS a, y.id AS b,
         COALESCE(da.deg, 0) AS da, COALESCE(db.deg, 0) AS db
  FROM topk x CROSS JOIN topk y
  LEFT JOIN dsub da ON x.id = da.id LEFT JOIN dsub db ON y.id = db.id),
s0 AS MATERIALIZED (
  SELECT a, b, CASE WHEN a = b THEN 1.0 ELSE 0.0 END AS s FROM prs)"""]
    for i in range(iters):
        ctes.append(f"""s{i + 1} AS MATERIALIZED (
  SELECT p.a, p.b,
         CASE WHEN p.a = p.b THEN 1.0
              WHEN p.da > 0 AND p.db > 0
              THEN {c} * COALESCE(g.g, 0.0) / (p.da * p.db)
              ELSE 0.0 END AS s
  FROM prs p LEFT JOIN (
    SELECT ea.src AS a, eb.src AS b, sum(s.s) AS g
    FROM esub ea JOIN s{i} s ON ea.dst = s.a JOIN esub eb ON eb.dst = s.b
    GROUP BY ea.src, eb.src) g ON p.a = g.a AND p.b = g.b)""")
    return (
        SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
        + f"\nSELECT a, b, round(s, 6) AS sim FROM s{iters} ORDER BY a, b"
    )


BPE_MERGES = 8


def _sql_bpe_merges(merges: int) -> str:
    """Mirror of functions/bpe.bpe_merges: unrolled per-round CTE chain
    (pair counts -> top-1 -> positional merge via list comprehension)."""
    ctes = [f"""toks AS MATERIALIZED (
  SELECT unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS w FROM documents),
v AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY w),
w0 AS MATERIALIZED (
  SELECT freq, list_append([w[i] for i in range(1, length(w)+1)], '</w>') AS s FROM v)"""]
    for k in range(1, merges + 1):
        ctes.append(f"""p{k} AS MATERIALIZED (
  SELECT s[i] AS a, s[i+1] AS b, freq
  FROM w{k - 1}, UNNEST(range(1, length(s))) AS r(i)),
t{k} AS MATERIALIZED (
  SELECT a, b, CAST(sum(freq) AS BIGINT) AS n
  FROM p{k} WHERE a <> b GROUP BY a, b
  ORDER BY n DESC, a, b LIMIT 1),
w{k} AS MATERIALIZED (
  SELECT freq,
    list_filter([CASE WHEN i < length(s) AND s[i] = t.a AND s[i+1] = t.b
                      THEN t.a || t.b
                      WHEN i > 1 AND s[i] = t.b AND s[i-1] = t.a THEN NULL
                      ELSE s[i] END
                 for i in range(1, length(s)+1)],
                x -> x IS NOT NULL) AS s
  FROM w{k - 1}, t{k} t)""")
    union = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS round, a AS sym_a, b AS sym_b,"
        f" n AS pair_count FROM t{k}"
        for k in range(1, merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union + " ORDER BY round"


def _scan_planted_edges(spark, sf_dir):
    """Deterministic planted-community graph over doc ids (the
    planted-truth idiom of q_scc / q_reference_graph): ~2% of docs are
    designated hubs (wired to the two anchor members of two DIFFERENT
    communities), ~2% outliers (one edge to one community's first
    anchor), the rest are members of one of max(2, n//12) communities
    with 60% hash-sampled intra-community pairs — triangle-dense inside,
    empty across, exactly the topology SCAN's structural similarity
    separates.  Both engines rebuild the identical edge set from the
    portable md5 family."""
    from plato_spark.functions.text import portable_h1
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id").distinct()
    n = docs.count()
    k = max(2, n // 12)

    def h(tag, col):
        return portable_h1(F.concat(F.lit(tag), col.cast("string")))

    tagged = docs.select(
        "doc_id", F.pmod(h("scanr|", F.col("doc_id")), F.lit(50)).alias("rr"))
    mem = tagged.where(F.col("rr") >= 2).select(
        "doc_id",
        F.pmod(h("scanc|", F.col("doc_id")), F.lit(k)).alias("comm"))
    rk = mem.select(
        "doc_id", "comm",
        F.row_number().over(
            Window.partitionBy("comm").orderBy("doc_id")).alias("rn"))
    anchors = rk.where(F.col("rn") <= 2)

    a = mem.select(F.col("doc_id").alias("u"), "comm")
    b = mem.select(F.col("doc_id").alias("v"), "comm")
    intra = (
        a.join(b, "comm").where(F.col("u") < F.col("v"))
        .where(F.pmod(
            portable_h1(F.concat(
                F.lit("scane|"), F.col("u").cast("string"),
                F.lit("|"), F.col("v").cast("string"))), F.lit(10)) < 6)
        .select("u", "v")
    )
    hubs = tagged.where(F.col("rr") == 0).select(
        "doc_id",
        F.pmod(h("scanha|", F.col("doc_id")), F.lit(k)).alias("ca"),
        F.pmod(h("scanhb|", F.col("doc_id")), F.lit(k - 1)).alias("cbr"),
    ).select(
        "doc_id", "ca",
        F.pmod(F.col("ca") + 1 + F.col("cbr"), F.lit(k)).alias("cb"))
    hube = (
        hubs.select(F.col("doc_id").alias("u"), F.col("ca").alias("comm"))
        .unionByName(hubs.select(F.col("doc_id").alias("u"),
                                 F.col("cb").alias("comm")))
        .join(anchors.select("comm", F.col("doc_id").alias("v")), "comm")
        .select("u", "v")
    )
    oute = (
        tagged.where(F.col("rr") == 1)
        .select(F.col("doc_id").alias("u"),
                F.pmod(h("scanoa|", F.col("doc_id")), F.lit(k))
                .alias("comm"))
        .join(anchors.where(F.col("rn") == 1)
              .select("comm", F.col("doc_id").alias("v")), "comm")
        .select("u", "v")
    )
    allp = intra.unionByName(hube).unionByName(oute)
    return (
        allp.where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("src"),
                F.greatest("u", "v").alias("dst"))
        .distinct()
    )


MATRYOSHKA_DIMS = 16


def _sql_strength_core(thresholds: tuple, rounds: int = 10) -> str:
    """Mirror of algos/percolation.strength_core_sweep: unrolled peel
    rounds per threshold; rounds pinned past the measured fixpoint
    (extra rounds drop nothing and add 0 to peel_rounds)."""
    ctes = []
    rows = []
    for s in thresholds:
        ctes.append(f"""sc{s}_0 AS MATERIALIZED (
  SELECT src, dst, CAST(weight AS BIGINT) AS w FROM canon)""")
        for k in range(rounds):
            ctes.append(f"""scb{s}_{k} AS MATERIALIZED (
  SELECT id FROM (
    SELECT src AS id, CAST(sum(w) AS BIGINT) AS st FROM (
      SELECT src, dst, w FROM sc{s}_{k}
      UNION ALL SELECT dst AS src, src AS dst, w FROM sc{s}_{k}) z
    GROUP BY src) t
  WHERE st < {s}),
sc{s}_{k + 1} AS MATERIALIZED (
  SELECT e.src, e.dst, e.w FROM sc{s}_{k} e
  WHERE NOT EXISTS (SELECT 1 FROM scb{s}_{k} b WHERE b.id = e.src)
    AND NOT EXISTS (SELECT 1 FROM scb{s}_{k} b WHERE b.id = e.dst))""")
        drops = " + ".join(
            f"(CASE WHEN (SELECT count(*) FROM scb{s}_{k}) > 0 "
            f"THEN 1 ELSE 0 END)"
            for k in range(rounds))
        rows.append(f"""SELECT CAST({s} AS INTEGER) AS s,
  (SELECT CAST(count(*) AS BIGINT) FROM (
     SELECT DISTINCT src AS id FROM sc{s}_{rounds}
     UNION SELECT DISTINCT dst FROM sc{s}_{rounds}) v) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM sc{s}_{rounds}) AS n_edges,
  CAST({drops} AS BIGINT) AS peel_rounds""")
    return (SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(rows))


def _sql_kmv_jaccard(k: int = 256) -> str:
    h = H1_SQL.format(s="token")
    return f"""
WITH vocab AS MATERIALIZED (
  SELECT DISTINCT source,
         unnest(list_distinct(regexp_extract_all(text,
           '[A-Za-z0-9_]+'))) AS token
  FROM documents),
vh AS MATERIALIZED (SELECT source, token, {h} AS hh FROM vocab),
bk AS MATERIALIZED (SELECT source, token, hh FROM (
  SELECT source, token, hh, row_number() OVER (
    PARTITION BY source ORDER BY hh, token) AS rn FROM vh) t
  WHERE rn <= {k}),
srcs AS (SELECT DISTINCT source FROM vh),
prs AS (SELECT a.source AS sa, b.source AS sb
        FROM srcs a JOIN srcs b ON a.source < b.source),
uu AS MATERIALIZED (SELECT DISTINCT sa, sb, token, hh FROM (
  SELECT p.sa, p.sb, x.token, x.hh FROM prs p
  JOIN bk x ON x.source = p.sa
  UNION ALL
  SELECT p.sa, p.sb, x.token, x.hh FROM prs p
  JOIN bk x ON x.source = p.sb) z),
ubk AS MATERIALIZED (SELECT sa, sb, token FROM (
  SELECT sa, sb, token, row_number() OVER (
    PARTITION BY sa, sb ORDER BY hh, token) AS rn FROM uu) t
  WHERE rn <= {k}),
estt AS (SELECT sa, sb, CAST(count(*) AS BIGINT) AS kk,
  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM bk x
                             WHERE x.source = ubk.sa
                               AND x.token = ubk.token)
                 AND EXISTS (SELECT 1 FROM bk y
                             WHERE y.source = ubk.sb
                               AND y.token = ubk.token)
           THEN 1 ELSE 0 END) AS BIGINT) AS both
  FROM ubk GROUP BY sa, sb),
ex AS (SELECT p.sa, p.sb, CAST(count(*) AS BIGINT) AS inter
       FROM prs p JOIN vh a ON a.source = p.sa
       JOIN vh b ON b.source = p.sb AND b.token = a.token
       GROUP BY p.sa, p.sb),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM vh GROUP BY 1),
fin AS (SELECT e.sa, e.sb,
  round(CAST(COALESCE(e.both, 0) AS DOUBLE) / e.kk, 6) AS est_jaccard,
  round(CAST(COALESCE(x.inter, 0) AS DOUBLE)
        / (za.nv + zb.nv - COALESCE(x.inter, 0)), 6) AS exact_jaccard
  FROM estt e LEFT JOIN ex x ON e.sa = x.sa AND e.sb = x.sb
  JOIN sz za ON za.source = e.sa JOIN sz zb ON zb.source = e.sb)
SELECT sa, sb, est_jaccard, exact_jaccard,
       round(abs(est_jaccard - exact_jaccard), 6) AS abs_err
FROM fin ORDER BY sa, sb"""


SCORE_THRESHOLDS = (2, 4, 8)


KMV_K = 256


BOND_PS = (25, 50, 75)


HASH_TRICK_BUCKETS = 4096


K_ANON_K, K_ANON_BAND = 5, 1000


WL_ROUNDS = 3


def _sql_wl(rounds: int = 3) -> str:
    from plato_spark.functions.text import PORTABLE_H1_SQL

    ctes = ["wc0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) "
            "AS color FROM verts)"]
    for r in range(rounds):
        h = PORTABLE_H1_SQL.format(
            s="CAST(p.color AS VARCHAR) || '|' || COALESCE(m.sig, '')")
        ctes.append(f"""wm{r} AS MATERIALIZED (
  SELECT e.dst AS id,
         string_agg(CAST(x.color AS VARCHAR), ',' ORDER BY x.color)
           AS sig
  FROM edges e JOIN wc{r} x ON e.src = x.id GROUP BY e.dst),
wc{r + 1} AS MATERIALIZED (
  SELECT p.id, {h} AS color
  FROM wc{r} p LEFT JOIN wm{r} m ON p.id = m.id)""")
    return (SQL_GRAPH_PREFIX + ", " + ",\n".join(ctes)
            + f"\nSELECT id, color FROM wc{rounds} ORDER BY id")


def _sql_knn_label_noise(k: int = 10) -> str:
    thr = -(-8 * k // 10)
    cos = _cos_sql("a.vec", "b.vec")
    return EMB_SQL_PREFIX + f""",
lb AS MATERIALIZED (SELECT vec_id AS id, label FROM embeddings),
bf AS MATERIALIZED (
  SELECT query_id, nbr_id FROM (
    SELECT a.id AS query_id, b.id AS nbr_id,
           row_number() OVER (PARTITION BY a.id
                              ORDER BY round({cos}, 6) DESC,
                                       b.id ASC) AS rn
    FROM v a JOIN v b ON a.id != b.id) t WHERE rn <= {k})
SELECT bf.query_id AS vec_id, o.label,
       CAST(sum(CASE WHEN n.label != o.label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_disagree,
       CAST(CASE WHEN sum(CASE WHEN n.label != o.label THEN 1 ELSE 0
                          END) >= {thr} THEN 1 ELSE 0 END AS INT)
         AS suspect
FROM bf JOIN lb o ON bf.query_id = o.id
JOIN lb n ON bf.nbr_id = n.id
GROUP BY bf.query_id, o.label ORDER BY vec_id"""


def _sql_nearest_centroid(dim: int = 64) -> str:
    def pd2(a, b):
        return (f"CAST(list_dot_product({a}, {a})"
                f" + list_dot_product({b}, {b})"
                f" - 2 * list_dot_product({a}, {b}) AS BIGINT)")

    return f"""
WITH w AS MATERIALIZED (
  SELECT vec_id AS id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
           x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS iv
  FROM embeddings),
ex AS (SELECT label, p.pos, iv[p.pos] AS val
       FROM w CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS pos) p),
cent AS MATERIALIZED (
  SELECT label AS clabel, pos,
         CAST(round(sum(val) / CAST(count(*) AS DOUBLE), 0) AS BIGINT)
           AS c
  FROM ex GROUP BY label, pos),
cv AS MATERIALIZED (
  SELECT clabel, list(c ORDER BY pos) AS cvv FROM cent GROUP BY clabel),
asg AS MATERIALIZED (
  SELECT id, label, clabel FROM (
    SELECT w.id, w.label, cv.clabel,
           row_number() OVER (PARTITION BY w.id
                              ORDER BY {pd2('w.iv', 'cv.cvv')} ASC,
                                       cv.clabel ASC) AS rn
    FROM w CROSS JOIN cv) t WHERE rn = 1)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(CAST(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS accuracy
FROM asg GROUP BY label ORDER BY label"""


SNN_K, SNN_KT = 10, 3


def _sql_snn(k: int = 10, kt: int = 3, wcc_iters: int = 10) -> str:
    """Mirror of similarity.snn_clusters: exact-cosine top-k lists,
    mutual-kNN + shared-count filter, unrolled hash-min components
    (wcc_iters pinned past the measured SNN-graph diameter)."""
    cos = _cos_sql("a.vec", "b.vec")
    chain = ["j0 AS MATERIALIZED (SELECT id, id AS lab FROM jv)"]
    for i in range(wcc_iters):
        chain.append(f"""j{i + 1} AS MATERIALIZED (
  SELECT v.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM jv v JOIN j{i} l ON v.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM js e JOIN j{i} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON v.id = m.id)""")
    return EMB_SQL_PREFIX + f""",
bf AS MATERIALIZED (
  SELECT query_id, nbr_id FROM (
    SELECT a.id AS query_id, b.id AS nbr_id,
           row_number() OVER (PARTITION BY a.id
                              ORDER BY round({cos}, 6) DESC,
                                       b.id ASC) AS rn
    FROM v a JOIN v b ON a.id != b.id) t WHERE rn <= {k}),
mut AS MATERIALIZED (
  SELECT f.query_id AS u, f.nbr_id AS v FROM bf f
  WHERE f.query_id < f.nbr_id
    AND EXISTS (SELECT 1 FROM bf r
                WHERE r.query_id = f.nbr_id AND r.nbr_id = f.query_id)),
jp AS MATERIALIZED (
  SELECT m.u AS src, m.v AS dst
  FROM mut m JOIN bf a ON a.query_id = m.u
  JOIN bf b ON b.query_id = m.v AND b.nbr_id = a.nbr_id
  GROUP BY m.u, m.v HAVING count(*) >= {kt}),
js AS MATERIALIZED (SELECT src, dst FROM jp
  UNION ALL SELECT dst AS src, src AS dst FROM jp),
jv AS MATERIALIZED (SELECT DISTINCT src AS id FROM js),
{", ".join(chain)}
SELECT v.id AS vec_id, COALESCE(j.lab, v.id) AS cluster
FROM v LEFT JOIN j{wcc_iters} j ON v.id = j.id
ORDER BY vec_id"""


KCENTER_K = 8


EMB_DIM = 64


def _sql_anisotropy(dim: int = 64) -> str:
    return EMB_SQL_PREFIX + f""",
u AS MATERIALIZED (
  SELECT id, list_transform(vec,
    x -> CAST(round(round(x / sqrt(list_dot_product(vec, vec)), 6)
                    * 1000000, 0) AS BIGINT)) AS iv
  FROM v),
ex AS (SELECT p.pos, iv[p.pos] AS val
       FROM u CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS pos) p),
pd AS MATERIALIZED (
  SELECT pos, CAST(sum(val) AS HUGEINT) AS s,
         sum(CAST(val AS HUGEINT) * val) AS self_sq
  FROM ex GROUP BY pos),
t AS (SELECT sum(s * s) AS ss, sum(self_sq) AS selfsq FROM pd),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v)
SELECT n.n AS n_vectors,
       round(CAST(t.ss - t.selfsq AS DOUBLE) / (n.n * (n.n - 1.0))
             / 1e12, 6) AS mean_pairwise_cosine,
       round(CAST(t.selfsq AS DOUBLE) / CAST(n.n AS DOUBLE) / 1e12, 6)
         AS mean_self_sq
FROM t, n"""


def _sql_kcenter(k: int = 8) -> str:
    """Unrolled Gonzalez traversal: d2 via the integer polarization
    identity (exact; equals the Spark zip_with squared-diff fold)."""
    def pd2(a, b):
        return (f"CAST(list_dot_product({a}, {a})"
                f" + list_dot_product({b}, {b})"
                f" - 2 * list_dot_product({a}, {b}) AS BIGINT)")

    ctes = ["""u AS MATERIALIZED (
  SELECT id, list_transform(vec,
    x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS iv FROM v)""",
            "g1 AS MATERIALIZED (SELECT min(id) AS sid FROM u)",
            f"""d1 AS MATERIALIZED (
  SELECT a.id, a.iv, {pd2('a.iv', 's.iv')} AS dmin
  FROM u a JOIN u s ON s.id = (SELECT sid FROM g1)
  WHERE a.id != (SELECT sid FROM g1))"""]
    for r in range(2, k + 1):
        ctes.append(f"""g{r} AS MATERIALIZED (
  SELECT id AS sid, dmin FROM d{r - 1}
  ORDER BY dmin DESC, id ASC LIMIT 1)""")
        if r < k:
            ctes.append(f"""d{r} AS MATERIALIZED (
  SELECT a.id, a.iv, least(a.dmin, {pd2('a.iv', 's.iv')}) AS dmin
  FROM d{r - 1} a JOIN u s ON s.id = (SELECT sid FROM g{r})
  WHERE a.id != (SELECT sid FROM g{r}))""")
    sels = ["SELECT CAST(1 AS INT) AS seed_rank, sid AS vec_id, "
            "CAST(0 AS BIGINT) AS dist_micro FROM g1"]
    sels += [f"SELECT CAST({r} AS INT), sid, dmin FROM g{r}"
             for r in range(2, k + 1)]
    return (EMB_SQL_PREFIX + ", " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL ".join(sels) + " ORDER BY seed_rank")


def _sql_davies_bouldin(dim: int = 64) -> str:
    def pd2(a, b):
        return (f"CAST(list_dot_product({a}, {a})"
                f" + list_dot_product({b}, {b})"
                f" - 2 * list_dot_product({a}, {b}) AS BIGINT)")

    return f"""
WITH w AS MATERIALIZED (
  SELECT vec_id AS id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
           x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS iv
  FROM embeddings),
ex AS (SELECT label, p.pos, iv[p.pos] AS val
       FROM w CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS pos) p),
cent AS MATERIALIZED (
  SELECT label, pos,
         CAST(round(sum(val) / CAST(count(*) AS DOUBLE), 0) AS BIGINT)
           AS c
  FROM ex GROUP BY label, pos),
cv AS MATERIALIZED (
  SELECT label, list(c ORDER BY pos) AS cvv FROM cent GROUP BY label),
scat AS MATERIALIZED (
  SELECT w.label, CAST(count(*) AS BIGINT) AS n_members,
         CAST(sum({pd2('w.iv', 'cv.cvv')}) AS BIGINT) AS s2sum
  FROM w JOIN cv ON w.label = cv.label GROUP BY w.label),
r AS (SELECT a.label AS label, a.n_members, a.s2sum,
             max((CAST(a.s2sum AS DOUBLE) / a.n_members
                  + CAST(b.s2sum AS DOUBLE) / b.n_members)
                 / {pd2('ca.cvv', 'cb.cvv')}) AS worst
      FROM scat a JOIN cv ca ON a.label = ca.label
      JOIN scat b ON a.label != b.label
      JOIN cv cb ON b.label = cb.label
      GROUP BY a.label, a.n_members, a.s2sum)
SELECT label, n_members,
       round(CAST(s2sum AS DOUBLE) / n_members / 1e12, 6) AS scatter_sq,
       round(worst, 6) AS worst_ratio
FROM r ORDER BY label"""


def _sql_l2_topk(k: int = 5) -> str:
    """Mirror of similarity.brute_force_l2_topk: integer-micro squared
    L2 via the polarization identity (order-free; sums < 2^53 so the
    double-typed list_dot_product is still exact)."""
    return EMB_SQL_PREFIX + f""",
u AS MATERIALIZED (
  SELECT id, list_transform(vec,
           x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS iv
  FROM v),
n AS MATERIALIZED (
  SELECT id, iv, CAST(list_dot_product(iv, iv) AS BIGINT) AS nn FROM u),
p AS (SELECT a.id AS query_id, b.id AS nbr_id,
             CAST(a.nn + b.nn
                  - 2 * CAST(list_dot_product(a.iv, b.iv) AS BIGINT)
                  AS BIGINT) AS d2_micro
      FROM n a JOIN n b ON a.id != b.id)
SELECT query_id, nbr_id, d2_micro, CAST(rn AS INT) AS "rank" FROM (
  SELECT query_id, nbr_id, d2_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d2_micro ASC, nbr_id ASC) AS rn
  FROM p) t WHERE rn <= {k}"""


def _sql_matryoshka_recall(k: int = 5, dims: int = 16) -> str:
    from plato_spark.functions.text import PORTABLE_H1_SQL

    h = PORTABLE_H1_SQL.format(s="'mat|' || CAST(a.id AS VARCHAR)")
    cos_full = _cos_sql("a.vec", "b.vec")
    cos_pref = _cos_sql(f"a.vec[1:{dims}]", f"b.vec[1:{dims}]")

    def top(cos):
        return f"""SELECT query_id, nbr_id FROM (
  SELECT a.id AS query_id, b.id AS nbr_id,
         row_number() OVER (PARTITION BY a.id
                            ORDER BY round({cos}, 6) DESC,
                                     b.id ASC) AS rn
  FROM v a JOIN v b ON a.id != b.id
  WHERE {h} % 10 = 0) t WHERE rn <= {k}"""

    return EMB_SQL_PREFIX + f""",
pf AS MATERIALIZED ({top(cos_full)}),
pp AS MATERIALIZED ({top(cos_pref)}),
h AS (SELECT f.query_id, CAST(count(*) AS BIGINT) AS hits
      FROM pf f JOIN pp ON f.query_id = pp.query_id
                       AND f.nbr_id = pp.nbr_id
      GROUP BY f.query_id)
SELECT q.query_id, COALESCE(h.hits, 0) AS hits
FROM (SELECT DISTINCT query_id FROM pf) q
LEFT JOIN h ON q.query_id = h.query_id ORDER BY q.query_id"""


def _sql_wedge_closure() -> str:
    """Mirror of q_wedge_closure over the split co-activity graphs."""
    return """
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
           FROM events),
uea AS (SELECT DISTINCT user_id AS u, event_type AS t,
          date_trunc('hour', ts) AS h
        FROM events, b WHERE epoch_us(ts) < b.mid),
oka AS (SELECT t, h FROM uea GROUP BY t, h HAVING count(*) <= 256),
u2a AS (SELECT uea.u, uea.t, uea.h FROM uea
        JOIN oka ON uea.t = oka.t AND uea.h = oka.h),
ea AS MATERIALIZED (
  SELECT DISTINCT x.u AS src, y.u AS dst
  FROM u2a x JOIN u2a y ON x.t = y.t AND x.h = y.h AND x.u < y.u),
ueb AS (SELECT DISTINCT user_id AS u, event_type AS t,
          date_trunc('hour', ts) AS h
        FROM events, b WHERE epoch_us(ts) >= b.mid),
okb2 AS (SELECT t, h FROM ueb GROUP BY t, h HAVING count(*) <= 256),
u2b AS (SELECT ueb.u, ueb.t, ueb.h FROM ueb
        JOIN okb2 ON ueb.t = okb2.t AND ueb.h = okb2.h),
eb AS MATERIALIZED (
  SELECT DISTINCT x.u AS src, y.u AS dst
  FROM u2b x JOIN u2b y ON x.t = y.t AND x.h = y.h AND x.u < y.u),
sa AS MATERIALIZED (SELECT src, dst FROM ea
  UNION ALL SELECT dst AS src, src AS dst FROM ea),
wedge AS MATERIALIZED (
  SELECT DISTINCT a.dst AS src, bb.dst AS dst
  FROM sa a JOIN sa bb ON a.src = bb.src AND a.dst < bb.dst),
op AS MATERIALIZED (
  SELECT w.src, w.dst FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM ea
                    WHERE ea.src = w.src AND ea.dst = w.dst)),
av AS MATERIALIZED (SELECT DISTINCT src AS id FROM sa),
ebw AS MATERIALIZED (
  SELECT e.src, e.dst FROM eb e
  WHERE EXISTS (SELECT 1 FROM av WHERE av.id = e.src)
    AND EXISTS (SELECT 1 FROM av WHERE av.id = e.dst)
    AND NOT EXISTS (SELECT 1 FROM ea
                    WHERE ea.src = e.src AND ea.dst = e.dst)),
s AS (SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM op) AS open_wedge_pairs,
  (SELECT CAST(count(*) AS BIGINT) FROM op
   WHERE EXISTS (SELECT 1 FROM eb
                 WHERE eb.src = op.src AND eb.dst = op.dst))
    AS closed_pairs,
  (SELECT CAST(count(*) AS BIGINT) FROM av) AS nv,
  (SELECT CAST(count(*) AS BIGINT) FROM ea) AS n_ea,
  (SELECT CAST(count(*) AS BIGINT) FROM ebw) AS new_edges)
SELECT open_wedge_pairs, closed_pairs,
       CAST(nv * (nv - 1) // 2 - n_ea AS BIGINT) AS candidate_pairs,
       new_edges,
       CASE WHEN open_wedge_pairs > 0
            THEN round(CAST(closed_pairs AS DOUBLE)
                       / open_wedge_pairs, 6) END AS closure_rate,
       CASE WHEN nv * (nv - 1) // 2 - n_ea > 0
            THEN round(CAST(new_edges AS DOUBLE)
                       / (nv * (nv - 1) // 2 - n_ea), 6) END AS base_rate,
       CASE WHEN open_wedge_pairs > 0 AND new_edges > 0
                 AND nv * (nv - 1) // 2 - n_ea > 0
            THEN round(CAST(closed_pairs
                            * (nv * (nv - 1) // 2 - n_ea) AS DOUBLE)
                       / (open_wedge_pairs * new_edges), 6)
       END AS closure_lift
FROM s"""


def _sql_scan(wcc_iters: int = 6) -> str:
    """DuckDB mirror of q_scan_clusters: rebuild the planted-community
    fixture from the portable md5 family, then run the full SCAN chain
    — exact-integer ε-test ((cn+2)^2*den^2 >= num^2*(du+1)(dv+1)),
    unrolled hash-min components over the core-core ε-subgraph
    (wcc_iters pinned past the measured diameter of the dense planted
    communities), min-cluster border attachment, hub/outlier split."""
    from plato_spark.functions.text import PORTABLE_H1_SQL

    def h(expr):
        return PORTABLE_H1_SQL.format(s=expr)

    hr = h("'scanr|' || CAST(id AS VARCHAR)")
    hc = h("'scanc|' || CAST(t.id AS VARCHAR)")
    he = h("'scane|' || CAST(a.id AS VARCHAR) || '|' || CAST(b.id AS VARCHAR)")
    hca = h("'scanha|' || CAST(t.id AS VARCHAR)")
    hcb = h("'scanhb|' || CAST(t.id AS VARCHAR)")
    ho = h("'scanoa|' || CAST(t.id AS VARCHAR)")
    chain = ["s0 AS MATERIALIZED (SELECT id, id AS lab FROM ccv)"]
    for i in range(wcc_iters):
        chain.append(f"""s{i + 1} AS MATERIALIZED (
  SELECT v.id, least(l.lab, COALESCE(m.minlab, l.lab)) AS lab
  FROM ccv v JOIN s{i} l ON v.id = l.id
  LEFT JOIN (SELECT e.dst AS id, min(l2.lab) AS minlab
             FROM ccs e JOIN s{i} l2 ON e.src = l2.id
             GROUP BY e.dst) m ON v.id = m.id)""")
    return f"""
WITH d0 AS MATERIALIZED (SELECT DISTINCT doc_id AS id FROM documents),
kk AS MATERIALIZED (SELECT greatest(2, count(*) // 12) AS k FROM d0),
tg AS MATERIALIZED (SELECT id, {hr} % 50 AS rr FROM d0),
mem AS MATERIALIZED (
  SELECT t.id, {hc} % kk.k AS comm FROM tg t, kk WHERE t.rr >= 2),
rk AS MATERIALIZED (
  SELECT id, comm, row_number() OVER (PARTITION BY comm ORDER BY id)
    AS rn FROM mem),
anch AS MATERIALIZED (SELECT comm, rn, id FROM rk WHERE rn <= 2),
intra AS (
  SELECT a.id AS u, b.id AS v
  FROM mem a JOIN mem b ON a.comm = b.comm AND a.id < b.id
  WHERE {he} % 10 < 6),
hb0 AS (SELECT t.id, {hca} % kk.k AS ca,
               {hcb} % (kk.k - 1) AS cbr,
               kk.k AS k
        FROM tg t, kk WHERE t.rr = 0),
hb AS MATERIALIZED (SELECT id, ca, (ca + 1 + cbr) % k AS cb FROM hb0),
hbe AS (SELECT h.id AS u, a.id AS v FROM hb h
        JOIN anch a ON a.comm = h.ca OR a.comm = h.cb),
oe AS (SELECT o.id AS u, a.id AS v
       FROM (SELECT t.id, {ho} % kk.k AS comm
             FROM tg t, kk WHERE t.rr = 1) o
       JOIN anch a ON a.comm = o.comm AND a.rn = 1),
canon3 AS MATERIALIZED (
  SELECT DISTINCT least(u, v) AS src, greatest(u, v) AS dst
  FROM (SELECT u, v FROM intra UNION ALL SELECT u, v FROM hbe
        UNION ALL SELECT u, v FROM oe) z
  WHERE u <> v),
edges3 AS MATERIALIZED (SELECT src, dst FROM canon3
  UNION ALL SELECT dst AS src, src AS dst FROM canon3),
deg3 AS MATERIALIZED (
  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
  FROM edges3 GROUP BY src),
cn3 AS MATERIALIZED (
  SELECT a.src AS u, b.src AS v, CAST(count(*) AS BIGINT) AS cn
  FROM edges3 a JOIN edges3 b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src),
epse AS MATERIALIZED (
  SELECT c.src, c.dst FROM canon3 c
  JOIN deg3 du ON c.src = du.id JOIN deg3 dv ON c.dst = dv.id
  LEFT JOIN cn3 t ON c.src = t.u AND c.dst = t.v
  WHERE (COALESCE(t.cn, 0) + 2) * (COALESCE(t.cn, 0) + 2) * 25
        >= 9 * (du.deg + 1) * (dv.deg + 1)),
epss AS MATERIALIZED (SELECT src, dst FROM epse
  UNION ALL SELECT dst AS src, src AS dst FROM epse),
cores AS MATERIALIZED (
  SELECT d.id FROM deg3 d
  LEFT JOIN (SELECT src AS id, count(*) + 1 AS neps
             FROM epss GROUP BY src) e ON d.id = e.id
  WHERE COALESCE(e.neps, 1) >= 3),
cce AS MATERIALIZED (
  SELECT e.src, e.dst FROM epse e
  WHERE EXISTS (SELECT 1 FROM cores c WHERE c.id = e.src)
    AND EXISTS (SELECT 1 FROM cores c WHERE c.id = e.dst)),
ccs AS MATERIALIZED (SELECT src, dst FROM cce
  UNION ALL SELECT dst AS src, src AS dst FROM cce),
ccv AS MATERIALIZED (SELECT DISTINCT src AS id FROM ccs),
{", ".join(chain)},
clus AS MATERIALIZED (
  SELECT c.id, COALESCE(s.lab, c.id) AS cluster
  FROM cores c LEFT JOIN s{wcc_iters} s ON c.id = s.id),
bord AS MATERIALIZED (
  SELECT e.src AS id, min(cl.cluster) AS cluster
  FROM epss e JOIN clus cl ON e.dst = cl.id
  WHERE NOT EXISTS (SELECT 1 FROM cores c WHERE c.id = e.src)
  GROUP BY e.src),
memb AS MATERIALIZED (
  SELECT id, cluster, 'core' AS role FROM clus
  UNION ALL SELECT id, cluster, 'border' AS role FROM bord),
restv AS MATERIALIZED (
  SELECT d.id FROM deg3 d
  WHERE NOT EXISTS (SELECT 1 FROM memb m WHERE m.id = d.id)),
nbc AS (SELECT e.src AS id, count(DISTINCT m.cluster) AS nc
        FROM edges3 e JOIN memb m ON e.dst = m.id
        WHERE EXISTS (SELECT 1 FROM restv r WHERE r.id = e.src)
        GROUP BY e.src)
SELECT id, role, cluster FROM memb
UNION ALL
SELECT r.id, CASE WHEN COALESCE(n.nc, 0) >= 2 THEN 'hub'
                  ELSE 'outlier' END AS role,
       CAST(NULL AS BIGINT) AS cluster
FROM restv r LEFT JOIN nbc n ON r.id = n.id
ORDER BY id"""


from plato_spark.functions.text import PORTABLE_H1_SQL, PORTABLE_H2_SQL


stop_re = "(?i)\\b(the|a|of|and|to|in|is|for|on|with)\\b"
