"""Driver contract for the spark-graft builder (PySpark target).

Queries run the plato_spark engine over a deterministic co-occurrence graph
derived from the driver-provided tables: two parts are linked when they
appear in the same order — structurally identical to the corpus co-commit
relation (order ~ commit, part ~ file), so every graph algorithm is
exercised end-to-end AND oracle-checkable in DuckDB. Iterative algorithms
(pagerank / wcc / lpa) get UNROLLED multi-CTE SQL oracles with fixed
iteration counts matching the Spark runs; floating-point results are rounded
to 6dp on both sides so order-of-summation drift cannot flip the value hash.

Graph-query semantics are pinned to the reference (Tencent/plato):
pagerank /root/reference/plato/algo/pagerank/pagerank.hpp:90-146,
wcc /root/reference/plato/algo/cgm/connected_component.hpp:174-245,
lpa /root/reference/plato/algo/lpa/lpa.hpp:84-170 (deterministic tie-break),
triangles/mutual /root/reference/plato/algo/mutual/mutual.hpp:104-268.
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

# ---------------------------------------------------------------------------
# shared SQL building blocks (DuckDB) — must mirror part_cooccurrence_edges
# ---------------------------------------------------------------------------

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


# iteration counts for the oracle-checked runs (fixed => deterministic)
PR_ITERS = 10
PRW_ITERS = 5
LPA_ITERS = 3
WCC_SQL_ITERS = 10  # >= graph diameter at sf<=0.1 (dense co-occurrence graph)
BFS_SQL_ITERS = 5   # measured BFS eccentricity from min vertex is 2 at sf<=0.1
KCORE_SQL_ITERS = 40  # h-index fixpoint: 19 iters at sf0.01, 38 at sf0.1
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
    terms = " UNION ALL ".join(
        f"""SELECT least(e.src, e.dst) AS a, greatest(e.src, e.dst) AS b,
           l.sigma * (1.0 + n.delta) / n.sigma AS term
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
es AS (SELECT a, b, sum(term) AS t FROM allt GROUP BY a, b)
SELECT c.src, c.dst, round(COALESCE(es.t, 0.0), 6) AS edge_betweenness
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
    ctes = [f"""cg AS MATERIALIZED ({_sql_reference_graph()})""", """se AS MATERIALIZED (
  SELECT src, dst FROM cg UNION SELECT dst AS src, src AS dst FROM cg)""", """degs AS MATERIALIZED (
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


ONION_SQL_ROUNDS = 88  # 71 measured layers at sf0.01 + margin; idempotent past empty


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

# -- walk oracle building blocks --------------------------------------------

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


# -- embedding / sketch oracle building blocks ------------------------------

EMB_SQL_PREFIX = """
WITH v AS MATERIALIZED (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
"""

# portable md5-derived 56/52-bit hash pair (functions/text.py portable_h1/h2;
# verified bit-equal between Spark conv(substr(md5)) and this cast)
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


KTRUSS_SQL_ITERS = 12  # measured peel fixpoint: 4 rounds at sf0.01, 9 at
# sf0.1; extra rounds are identity (peeling a fixpoint changes nothing)


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


def _sql_mis(rounds: int = 8) -> str:
    """Mirror of algos/mis.maximal_independent_set: unrolled Luby rounds
    with the unique portable-hash priority (p = (h1(id) % 2^31) * 2^31
    + id); rounds pinned past the measured fixpoint (4 at sf0.001, 6 at
    sf0.01) — extra rounds operate on an empty alive set and add no rows.
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


def _sql_trussness(k_max: int = 6, rounds: tuple = (4, 5, 6, 8)) -> str:
    """Mirror of algos/ktruss.truss_decomposition: phased support-peel,
    trussness = 2 + number of phases survived (p_k nests in p_{k-1}).
    ``rounds`` pins the unrolled peel rounds per phase, >= the measured
    engine fixpoints at sf0.01 ((2,3,4,6); extra rounds are identity)."""
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


# ---------------------------------------------------------------------------
# Spark-side query callables
# ---------------------------------------------------------------------------

def _sym(spark: SparkSession, sf_dir: str) -> DataFrame:
    return symmetrize(part_cooccurrence_edges(spark, sf_dir))


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


PPR_ITERS = 10
PPR_SOURCES = 4


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


def q_gnn_neighbor_sample(spark, sf_dir):
    """Deterministic GraphSAGE fan-out (k=5) through the degree-aware
    prefilter scale path (exact by fallback; algos/neighbor_sample)."""
    from plato_spark.algos.neighbor_sample import neighbor_sample

    return neighbor_sample(part_cooccurrence_edges(spark, sf_dir), k=5)


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


def q_link_jaccard(spark, sf_dir):
    return neighborhood_similarity(
        part_cooccurrence_edges(spark, sf_dir), method="jaccard"
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


def _sql_bfs_parents() -> str:
    prefix, last = _sql_bfs()
    return prefix + f""",
pp AS (SELECT e.dst AS id, CAST(min(e.src) AS BIGINT) AS parent
       FROM edges e JOIN {last} p ON e.src = p.id
            JOIN {last} c ON e.dst = c.id
       WHERE p.dist = c.dist - 1 GROUP BY e.dst)
SELECT l.id, l.dist, pp.parent
FROM {last} l LEFT JOIN pp ON l.id = pp.id ORDER BY l.id"""


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


def q_waiting_suppliers(spark, sf_dir):
    """TPC-H-Q21-shape sole-late-supplier blame
    (functions/relational.waiting_suppliers): the EXISTS / NOT-EXISTS
    quantifier pair decorrelated into one grouped pass + one orderkey
    window — the oracle runs the literal double-quantifier SQL, so the
    gate proves the rewrite equivalent."""
    from plato_spark.functions.relational import waiting_suppliers

    return waiting_suppliers(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


def q_market_share(spark, sf_dir):
    """TPC-H-Q8-shape nation market share inside a customer region per
    order year (functions/relational.market_share): numerator as a
    map-side conditional sum beside the denominator in ONE aggregation,
    share as a single division of exact int64 folds."""
    from plato_spark.functions.relational import market_share

    return market_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_brand_band_revenue(spark, sf_dir):
    """TPC-H-Q19-shape disjunctive promo-band revenue
    (functions/relational.brand_band_revenue): OR-of-ANDs with the
    union bounds pre-pushed to both scans, residual conjunctions
    post-join, exact integer cents."""
    from plato_spark.functions.relational import brand_band_revenue

    return brand_band_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def q_ewma_revenue(spark, sf_dir):
    """Exponentially-weighted (alpha = 1/2) 20-day trailing revenue per
    day — the responsive smoother beside trailing_revenue's flat 7-day
    RANGE window.  The trick that makes EWMA oracle-checkable: with
    alpha = 1/2 every weight is a POWER OF TWO, so the weighted fold is
    an exact int64 sum of cents << (19 - gap) — float never enters
    until the ONE normalizing division ( / (2^20 - 1) / 100).

    Gap days are real zero-revenue days: the calendar is gap-filled
    in-plan (sequence + explode over the broadcast min/max bounds), so
    the decay rides CALENDAR days, not row offsets.  Scale plan: the
    window is an EXPAND x20 (each day offers its weighted contribution
    to its next 19 calendar days) + ONE shuffle on the target day —
    never a global-sort window; the series is the pre-aggregated
    per-day table (|days| rows, the bounded offsets-table role).  Only
    days with a full 20-day history report (constant weight mass)."""
    o = load_table(spark, sf_dir, "orders")
    per = (
        o.select(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long").alias("day_i"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
            .alias("pc"))
        .groupBy("day_i").agg(F.sum("pc").cast("long").alias("rev_c"))
    )
    b = per.agg(F.min("day_i").alias("lo"), F.max("day_i").alias("hi"))
    days = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day_i"))
    filled = days.join(per, "day_i", "left").select(
        "day_i", F.coalesce("rev_c", F.lit(0)).alias("c"))
    contrib = filled.select(
        F.explode(F.sequence(F.lit(0), F.lit(19))).alias("k"),
        "day_i", "c",
    ).select(
        (F.col("day_i") + F.col("k")).alias("t_day"),
        # shiftleft's bits arg must be a literal in the Python API;
        # the SQL form takes the column
        (F.col("c") * F.expr("shiftleft(1L, 19 - cast(k AS INT))"))
        .alias("w_c"),
    )
    num = contrib.groupBy(F.col("t_day").alias("day_i")).agg(
        F.sum("w_c").cast("long").alias("num"))
    return (
        num.crossJoin(F.broadcast(b))
        .where((F.col("day_i") >= F.col("lo") + 19)
               & (F.col("day_i") <= F.col("hi")))
        .select("day_i",
                F.round(F.col("num") / F.lit(((1 << 20) - 1) * 100.0), 6)
                .alias("ewma"))
    )


def q_revenue_autocorr(spark, sf_dir):
    """Lag-7 autocorrelation of daily order revenue — does the weekly
    cycle exist?  Pearson r over (x_t, x_{t-7}) pairs on the gap-filled
    calendar (missing days are REAL zero-revenue observations; skipping
    them would splice non-adjacent weeks together).

    Exactness: every sum (x, y, x^2, y^2, xy in cents) folds in
    DECIMAL(38,0) — 128-bit exact, order-free — mirrored by DuckDB's
    automatic HUGEINT sums; the lag pairing is a self-join on
    day_i = day_i + 7 (an equi-join, never a global-sort window), and
    float enters only at the final covariance / sqrt(var*var) division
    of exact integers.  sqrt is IEEE-correctly-rounded everywhere
    (unlike ln/log2 — the cross-libm lesson), so 6dp rounding is
    engine-stable."""
    o = load_table(spark, sf_dir, "orders")
    per = (
        o.select(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long").alias("day_i"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
            .alias("pc"))
        .groupBy("day_i").agg(F.sum("pc").cast("long").alias("rev_c"))
    )
    b = per.agg(F.min("day_i").alias("lo"), F.max("day_i").alias("hi"))
    days = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day_i"))
    filled = days.join(per, "day_i", "left").select(
        "day_i",
        F.coalesce("rev_c", F.lit(0)).cast("decimal(19,0)").alias("c"))
    x = filled.select(F.col("day_i").alias("tx"), F.col("c").alias("x"))
    y = filled.select((F.col("day_i") + 7).alias("tx"),
                      F.col("c").alias("y"))
    pairs = x.join(y, "tx")
    s = pairs.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return s.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.lit(7).cast("int").alias("lag"),
        F.round(
            cov.cast("double")
            / F.sqrt(vx.cast("double") * vy.cast("double")), 6
        ).alias("autocorr"),
    )


def q_rfm_segments(spark, sf_dir):
    """RFM customer segmentation: score recency / frequency / monetary
    1-4 by FIXED thresholds (quantile binning is balance_deciles' job —
    fixed cutoffs are the production-stable contract: a segment keeps
    its meaning when the population shifts), then report segment sizes
    and average spend.  Recency anchors on the dataset's LAST order
    date as a broadcast scalar (never wall-clock now() — results must
    not depend on run time); monetary folds exact int64 cents with ONE
    division at read-out."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    per = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("mx"), F.col("o_orderdate")))
            .cast("long").alias("rec_days"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").alias("mon_c"),
        )
    )
    r_s = (F.when(F.col("rec_days") <= 90, 4)
           .when(F.col("rec_days") <= 365, 3)
           .when(F.col("rec_days") <= 730, 2).otherwise(1))
    f_s = (F.when(F.col("freq") >= 15, 4)
           .when(F.col("freq") >= 10, 3)
           .when(F.col("freq") >= 5, 2).otherwise(1))
    m_s = (F.when(F.col("mon_c") >= 400_000_000, 4)
           .when(F.col("mon_c") >= 250_000_000, 3)
           .when(F.col("mon_c") >= 100_000_000, 2).otherwise(1))
    return (
        per.select(r_s.alias("r_score"), f_s.alias("f_score"),
                   m_s.alias("m_score"), "mon_c")
        .groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             F.sum("mon_c").cast("long").alias("mc"))
        .select("r_score", "f_score", "m_score", "n_customers",
                F.round(F.col("mc") / (F.col("n_customers") * F.lit(100.0)),
                        6).alias("avg_monetary"))
    )


def q_landmark_stretch(spark, sf_dir):
    """Landmark distance-estimation quality audit
    (algos/closeness.landmark_stretch): histogram of (landmark
    upper-bound estimate - exact hop count) over every (eval root,
    vertex) pair the shared multi-source BFS knows exactly — how loose
    the standard 100-TB distance-query trick is on THIS graph.  Pure
    integer hop arithmetic; no float enters at all."""
    from plato_spark.algos.closeness import landmark_stretch

    return landmark_stretch(part_cooccurrence_edges(spark, sf_dir))


def q_join_skew_audit(spark, sf_dir):
    """Pre-join skew dashboard over the lineitem fact's three join keys
    (functions/relational.join_skew_audit): the max-over-average key
    weight that decides salting / AQE skew-split BEFORE a 100-TB
    shuffle discovers a straggler.  Exact integer counts, skew factor
    as one integer cross-multiply divided once."""
    from plato_spark.functions.relational import join_skew_audit

    return join_skew_audit(
        load_table(spark, sf_dir, "lineitem"),
        keys=("l_orderkey", "l_partkey", "l_suppkey"),
    )


def q_graphsage_features(spark, sf_dir):
    """2-layer untrained GraphSAGE mean aggregation of the document
    embeddings over the symmetrized citation graph
    (algos/sage.sage_mean_features): the GNN-inference feature side
    beside gnn_neighbor_sample/negative_sampling/linkpred_eval.
    Features quantized once to int64 micro-units; each layer is one
    edge join + one (dst, dim) aggregation with a single floor'd IEEE
    division — engine-exact, incl. negative sums (floor, never
    truncating div).  Long (id, dim, value) output."""
    from plato_spark.algos.sage import sage_mean_features

    cg = q_reference_graph(spark, sf_dir).select("src", "dst")
    sym = cg.unionByName(
        cg.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    feats = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding")
    return sage_mean_features(sym, feats, layers=2)


def q_minhash_calibration(spark, sf_dir):
    """MinHash estimator audit on the LSH candidate pairs
    (functions/dedup.minhash_calibration): matching-slot fraction vs
    TRUE distinct-shingle Jaccard per pair — the empirical check that
    the 64-hash signature actually delivers its sqrt(J(1-J)/64)
    accuracy on THIS corpus.  Candidate-fed (never all-pairs), portable
    hash family, exact integer counts with three rounded divisions."""
    from plato_spark.functions.dedup import minhash_calibration

    return minhash_calibration(load_table(spark, sf_dir, "documents"))


def q_discount_qty_corr(spark, sf_dir):
    """Per-brand Pearson correlation between discount (scale-100 ints)
    and quantity (integral) — do discounts actually move volume, and
    differently per brand?  The revenue_autocorr discipline: all five
    sums fold in DECIMAL(38,0) (DuckDB HUGEINT), float enters only at
    cov/sqrt(var*var), zero-variance groups report NULL (never a fake
    0).  One broadcast part join + one map-side-combined aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
        F.col("l_quantity").cast("long").alias("q"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p),
                F.col("l_partkey") == F.col("p_partkey")).select(
        "p_brand",
        F.col("d").cast("decimal(19,0)").alias("x"),
        F.col("q").cast("decimal(19,0)").alias("y"))
    s = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return s.select(
        "p_brand", F.col("n").cast("long").alias("n_items"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(cov.cast("double")
                    / F.sqrt(vx.cast("double") * vy.cast("double")), 6),
        ).alias("corr"),
    )


def q_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint over daily order revenue: the day where the
    cumulative deviation from the all-period mean rate peaks — the
    single most likely level-shift point.  Exactness: dev_t =
    |n * cumsum_t - t * total| is a pure int64 cross-multiply (never a
    float mean fed into a running sum; cents x day-index stays < 2^63
    by orders of magnitude at any plausible SF), the argmax is ONE
    struct-max scalar aggregate with ties broken to the earliest day,
    and the only division is the normalized read-out.  The running sum
    rides a window over the pre-aggregated per-day table (|days| rows —
    the bounded offsets-table role)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    per = (
        o.select(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long").alias("day_i"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
            .alias("pc"))
        .groupBy("day_i").agg(F.sum("pc").cast("long").alias("rev_c"))
    )
    w = Window.orderBy("day_i").rowsBetween(Window.unboundedPreceding, 0)
    t = Window.orderBy("day_i")
    cum = per.select(
        "day_i",
        F.sum("rev_c").over(w).alias("cum"),
        F.row_number().over(t).cast("long").alias("t_idx"))
    tot = per.agg(F.sum("rev_c").cast("long").alias("total"),
                  F.count(F.lit(1)).cast("long").alias("n"))
    dev = cum.crossJoin(F.broadcast(tot)).select(
        "day_i", "total", "n",
        F.abs(F.col("n") * F.col("cum")
              - F.col("t_idx") * F.col("total")).alias("dev"))
    best = dev.agg(F.max(F.struct(F.col("dev"), (-F.col("day_i"))
                                  .alias("nd"))).alias("m"),
                   F.max("total").alias("total"), F.max("n").alias("n"))
    return best.select(
        (-F.col("m.nd")).alias("day_i"),
        F.col("m.dev").alias("scaled_dev"),
        F.round(F.col("m.dev") / (F.col("n") * F.col("total")), 6)
        .alias("rel_dev"),
    )


def q_skyline_parts(spark, sf_dir):
    """2-D skyline (Pareto frontier) of the part catalog: parts not
    dominated on (retailprice low, size high) — the best-value-per-size
    frontier.  The scale rewrite is the point: literal skyline is a
    quadratic NOT-EXISTS self-join; on 2 attributes it collapses to a
    cumulative min — best price over all STRICTLY larger sizes, and
    over >= sizes for the price-tie direction — computed on the
    per-size min table (<= |sizes| rows, the bounded-dimension role)
    and broadcast back.  The oracle runs the literal double-quantifier
    domination SQL, so the gate proves the rewrite.  Prices compare as
    exact integer cents."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("pc"))
    per_size = p.groupBy("p_size").agg(F.min("pc").alias("minp"))
    w_ge = (Window.orderBy(F.desc("p_size"))
            .rowsBetween(Window.unboundedPreceding, 0))
    w_gt = (Window.orderBy(F.desc("p_size"))
            .rowsBetween(Window.unboundedPreceding, -1))
    best = per_size.select(
        "p_size",
        F.min("minp").over(w_ge).alias("best_ge"),
        F.min("minp").over(w_gt).alias("best_gt"))
    return (
        p.join(F.broadcast(best), "p_size")
        .where(
            (F.col("best_gt").isNull() | (F.col("best_gt") > F.col("pc")))
            & (F.col("best_ge") >= F.col("pc"))
        )
        .select("p_partkey", "p_brand", "p_size",
                (F.col("pc") / F.lit(100.0)).alias("p_retailprice"))
    )


def q_token_cosine_topk(spark, sf_dir):
    """Sparse token-count cosine retrieval: top-5 most similar docs per
    doc via an INVERTED-INDEX join — the sparse sibling of ann_topk's
    dense brute force, and the plan BM25-style retrieval rides at
    100 TB.  Terms with document frequency > 64 are pruned BEFORE the
    self-join (stopword posting lists are the quadratic hub poison —
    the viral-bucket guard applied to retrieval); pair scores then flow
    only through shared rare-ish terms.  Exactness: term counts and
    dot products are exact integers, norms are per-doc integer folds,
    cosine = dot / sqrt(na * nb) is one IEEE division + sqrt, and the
    top-5 rank key is (6dp-rounded cosine DESC, neighbor id ASC) —
    fully deterministic in both engines."""
    from pyspark.sql import Window

    from plato_spark.functions.text import TOKEN_RE

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.regexp_extract_all(F.col("text"),
                                           F.lit(TOKEN_RE), F.lit(0)))
            .alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ok = (
        tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= 64).select("tok")
    )
    tfp = tf.join(df_ok, "tok", "left_semi")
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("n2"))
    lhs = tfp.select("tok", F.col("doc_id").alias("a"),
                     F.col("tf").alias("ta"))
    rhs = tfp.select("tok", F.col("doc_id").alias("b"),
                     F.col("tf").alias("tb"))
    dots = (
        lhs.join(rhs, "tok")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("ta") * F.col("tb")).cast("long").alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(norms.select(F.col("doc_id").alias("a"),
                                           F.col("n2").alias("na"))), "a")
        .join(F.broadcast(norms.select(F.col("doc_id").alias("b"),
                                       F.col("n2").alias("nb"))), "b")
        .select(
            "a", "b",
            F.round(F.col("dot")
                    / F.sqrt(F.col("na").cast("double") * F.col("nb")),
                    6).alias("cos"))
    )
    w = Window.partitionBy("a").orderBy(F.desc("cos"), F.asc("b"))
    return (
        scored.select("a", "b", "cos",
                      F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= 5)
    )


def q_graphlet_census(spark, sf_dir):
    """Non-induced 4-node graphlet census over the co-occurrence graph
    (algos/motifs.graphlet_census): claws / P4 paths / tailed triangles
    / diamonds / 4-cycles, every count a closed-form int64 fold over
    the degree and co-degree tables (ESCAPE decomposition) — no 4-way
    join ever runs."""
    from plato_spark.algos.motifs import graphlet_census

    return graphlet_census(part_cooccurrence_edges(spark, sf_dir))


def q_hll_set_ops(spark, sf_dir):
    """HLL set algebra between the 'view' and 'purchase' user sets
    (functions/sketches.hll_set_ops): union via per-index register max
    — the merge HLL is algebraically closed under — and intersection
    via inclusion-exclusion, with the EXACT answers in the same row as
    the accuracy report.  Portable registers, every estimate
    bit-reproducible in SQL."""
    from plato_spark.functions.sketches import hll_set_ops

    return hll_set_ops(load_table(spark, sf_dir, "events"),
                       "event_type", "user_id", "view", "purchase")


def q_theil_sen_trend(spark, sf_dir):
    """Theil-Sen robust trend of daily order revenue: the MEDIAN of all
    pairwise day-to-day slopes — outlier days move the OLS slope, not
    this one.  The quadratic pair set is over the per-day table, and
    DAYS do not scale with data volume (the bounded-offsets-table
    argument made explicit: 100x the rows is the same ~2.4k days, so
    the pair count is fixed ~3M while every per-day sum rides the
    normal fold).  Slopes are IEEE divisions of exact int64 cents /
    day gaps — identical in both engines — and the median is the
    value(s) at fixed ranks (ties share the value, so tie order cannot
    change the answer), averaged for even counts, ONE /100 at
    read-out."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    per = (
        o.select(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long").alias("day_i"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
            .alias("pc"))
        .groupBy("day_i").agg(F.sum("pc").cast("long").alias("rev_c"))
    )
    a = per.select(F.col("day_i").alias("di"), F.col("rev_c").alias("ri"))
    b = per.select(F.col("day_i").alias("dj"), F.col("rev_c").alias("rj"))
    pairs = a.join(b, F.col("dj") > F.col("di")).select(
        ((F.col("rj") - F.col("ri"))
         / (F.col("dj") - F.col("di")).cast("double")).alias("slope"))
    w = Window.orderBy("slope")
    ranked = pairs.select("slope", F.row_number().over(w).alias("rn"))
    m = pairs.count()
    lo, hi = (m + 1) // 2, (m + 2) // 2
    med = ranked.where(F.col("rn").isin([lo, hi])).agg(
        F.avg("slope").alias("med"))
    return med.select(
        F.lit(m).cast("long").alias("n_pairs"),
        F.round(F.col("med") / 100.0, 6).alias("slope_per_day"))


#: funnel window-sensitivity sweep (seconds): 1h / 6h / 1d
FUNNEL_SWEEP_S = (3600, 21600, 86400)

#: Benford first-digit expectations log10(1 + 1/d), 6dp — PYTHON
#: literals injected into BOTH engines so no runtime log10 ever runs
#: (the cross-libm lesson applied to constants)
BENFORD_P = {d: round(math.log10(1 + 1 / d), 6) for d in range(1, 10)}


def q_funnel_sensitivity(spark, sf_dir):
    """The windowed funnel's W, swept: view -> click -> purchase at 1h /
    6h / 1d conversion windows in one result — the curve that tells you
    whether windowed_funnel's pinned W sits on a cliff or a plateau
    (the inter_event_gaps pick-the-knee discipline, applied to the
    funnel definition itself).  Each window is the same exact
    integer-microsecond anchor chain; rows = |windows| x |steps|."""
    from plato_spark.functions.events import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    out = None
    for w in FUNNEL_SWEEP_S:
        f = funnel_counts(ev, ["view", "click", "purchase"],
                          window_s=w).select(
            F.lit(w).cast("long").alias("window_s"),
            "step", "event_type", "users")
        out = f if out is None else out.unionByName(f)
    return out


def q_benford_audit(spark, sf_dir):
    """Benford first-significant-digit audit of order totals — the
    classic fabricated-numbers / data-quality screen.  The first digit
    of the exact cents integer IS the first significant digit of the
    price (cents shift never changes it); expectations log10(1 + 1/d)
    are Python-computed literals injected into BOTH engines, so no
    runtime log10 ever runs (the cross-libm lesson applied to
    constants).  share is ONE division of exact int64 counts.  On this
    synthetic catalog the verdict is a loud NOT-Benford — which is the
    audit working, not failing."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.substring(F.round(F.col("o_totalprice") * 100, 0)
                    .cast("long").cast("string"), 1, 1).alias("digit"))
    counts = d.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("t"))
    exp = spark.createDataFrame(
        [(str(k), v) for k, v in BENFORD_P.items()],
        "digit string, benford_expected double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .join(F.broadcast(exp), "digit")
        .select(
            "digit", "n",
            F.round(F.col("n") / F.col("t"), 6).alias("share"),
            "benford_expected",
            F.round(F.col("n") / F.col("t")
                    - F.col("benford_expected"), 6).alias("dev"),
        )
    )


def q_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value matrix: customers grouped by FIRST-order
    year, revenue accumulated per years-since-acquisition — the money
    sibling of retention_cohorts' activity matrix (does an older
    cohort keep out-spending a newer one at the same age?).  Exact
    int64 cents; the cohort tag is one min-aggregation broadcast back
    onto the order stream; ages are exact integer year differences."""
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).cast("int").alias("cohort"))
    j = o.select("o_custkey",
                 F.year("o_orderdate").cast("int").alias("y"),
                 F.round(F.col("o_totalprice") * 100, 0).cast("long")
                 .alias("pc")).join(F.broadcast(first), "o_custkey")
    return (
        j.groupBy("cohort", (F.col("y") - F.col("cohort")).alias("age"))
        .agg(F.countDistinct("o_custkey").cast("long")
             .alias("active_customers"),
             F.sum("pc").cast("long").alias("rc"))
        .select("cohort", "age", "active_customers",
                F.round(F.col("rc") / F.lit(100.0), 2).alias("revenue"))
    )


def q_weighted_median_discount(spark, sf_dir):
    """Quantity-weighted discount quantiles — 'what discount does the
    MEDIAN UNIT ship at?' (unit-weighted, not line-weighted: a
    50-unit line counts 50x a 1-unit line).  The discount domain is 11
    exact scale-100 integers, so the weighted quantile needs NO
    binning or interpolation at all: cumulative quantity over the
    sorted 11-row domain, quantile q = the smallest value whose
    cumulative weight reaches ceil(q * total) — the exact
    lower-weighted-quantile rule, pure integer comparisons (the
    bounded-domain case where histogram_quantiles' machinery would be
    overkill).  Output one row per q in (0.25, 0.5, 0.75)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
          .alias("w"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select("d", F.sum("w").over(w).alias("cw")).crossJoin(
        F.broadcast(per.agg(F.sum("w").cast("long").alias("tw"))))
    qs = spark.createDataFrame(
        [(0.25,), (0.5,), (0.75,)], "q double")
    hit = (
        cum.crossJoin(F.broadcast(qs))
        # smallest d with 4*cw >= 4*q*tw, as an exact integer
        # cross-multiply: q in quarters -> 4q integral
        .where(F.col("cw") * 4 >= (F.col("q") * 4).cast("long")
               * F.col("tw"))
        .groupBy("q")
        .agg(F.min("d").alias("dmin"), F.max("tw").alias("tw"))
    )
    return hit.select(
        "q", (F.col("dmin") / F.lit(100.0)).alias("discount"),
        F.col("tw").alias("total_qty"))


def q_part_name_revenue(spark, sf_dir):
    """Catalog text facet: the top-20 part-NAME tokens by attributed
    discounted revenue — which words in the catalog sell?  Cross-domain
    join of the text tokenizer with the fact table: part names tokenize
    JVM-side, the token->part map broadcasts (parts are the dimension),
    revenue folds exact integer cents x 1e2 units once per (token,
    lineitem) incidence, and the top-20 rides TakeOrdered (never a
    global sort).  Deterministic tie-break by token."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ptok = p.select(
        "p_partkey",
        F.explode(F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("p_name")),
                                 F.lit("[a-z0-9]+"), F.lit(0))))
        .alias("token"))
    rev = (F.round(F.col("l_extendedprice") * 100, 0).cast("long")
           * F.round((F.lit(1.0) - F.col("l_discount")) * 100, 0)
           .cast("long"))
    j = li.select("l_partkey", rev.alias("rev_u")).join(
        F.broadcast(ptok),
        F.col("l_partkey") == F.col("p_partkey"))
    agg = j.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("rev_u").cast("long").alias("ru"))
    return (
        agg.orderBy(F.desc("ru"), F.asc("token")).limit(20)
        .select("token", "n_lines",
                (F.expr("(ru + 50) div 100").cast("long")
                 / F.lit(100.0)).alias("revenue"))
    )


#: packing-budget sweep (tokens per chunk)
PACKING_SWEEP = (128, 512, 2048)

#: dedup-threshold sweep over verified LSH-candidate Jaccard
DEDUP_THRESHOLDS = (0.3, 0.5, 0.7, 0.9)


def q_filter_ablation(spark, sf_dir):
    """Quality-filter ablation: for each of quality_filter's four rules
    (too-few-tokens, low-alpha, high-digit, token-length-band), how
    many docs fail IT at all and how many fail ONLY it — the number
    that says which rule is doing the work and which is redundant
    (a rule with n_failing_only = 0 never changes the corpus).  Same
    6dp-rounded ratios as the registered quality_filter, so the
    ablation and the gate can never disagree; exact integer counts."""
    from plato_spark.functions.text import text_quality

    q = text_quality(load_table(spark, sf_dir, "documents"))
    flags = q.select(
        (F.col("n_tokens") < 8).alias("f_tokens"),
        (F.col("alpha_ratio") < 0.45).alias("f_alpha"),
        (F.col("digit_ratio") > 0.3).alias("f_digit"),
        ((F.col("mean_token_len") < 2.0)
         | (F.col("mean_token_len") > 12.0)).alias("f_len"),
    )
    names = ["f_tokens", "f_alpha", "f_digit", "f_len"]
    aggs = []
    for n in names:
        others = [c for c in names if c != n]
        only = F.col(n)
        for o in others:
            only = only & ~F.col(o)
        aggs.append(F.sum(F.col(n).cast("long")).alias(f"{n}_all"))
        aggs.append(F.sum(only.cast("long")).alias(f"{n}_only"))
    any_fail = F.col(names[0])
    for n in names[1:]:
        any_fail = any_fail | F.col(n)
    aggs.append(F.sum(any_fail.cast("long")).alias("any_all"))
    s = flags.agg(*aggs)
    out = None
    for n in names + ["any"]:
        only = "any_all" if n == "any" else f"{n}_only"
        row = s.select(
            F.lit(n).alias("filter"),
            F.col(f"{n}_all").alias("n_failing"),
            F.col(only).alias("n_failing_only"))
        out = row if out is None else out.unionByName(row)
    return out


def q_packing_sensitivity(spark, sf_dir):
    """The packing budget, swept: the sequence_packing manifest
    summarized at 128 / 512 / 2048 tokens per chunk — split-doc count,
    extra splits (the attention-masking cost), and tail waste
    (chunks x budget - tokens), per budget.  The curve behind choosing
    a context length: small budgets split documents, large budgets
    waste tail tokens.  Same deterministic layout for every budget
    (the cut points move, the order does not); all exact BIGINTs."""
    from plato_spark.functions.packing import sequence_packing

    docs = load_table(spark, sf_dir, "documents")
    out = None
    for b in PACKING_SWEEP:
        m = sequence_packing(docs, budget=b)
        s = m.agg(
            F.lit(b).cast("long").alias("budget"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (F.max("last_chunk") + 1).cast("long").alias("total_chunks"),
            F.sum((F.col("n_chunks") > 1).cast("long")).cast("long")
            .alias("split_docs"),
            F.sum(F.col("n_chunks") - 1).cast("long")
            .alias("extra_splits"),
        ).select(
            "*",
            (F.col("total_chunks") * b - F.col("total_tokens"))
            .cast("long").alias("tail_waste"))
        out = s if out is None else out.unionByName(s)
    return out


def q_dedup_threshold_curve(spark, sf_dir):
    """The dedup threshold, swept: verified-Jaccard pair counts at
    0.3 / 0.5 / 0.7 / 0.9 over the LSH candidate set — the
    policy-decision curve behind every near-dup drop rule (a cliff
    between two thresholds means the corpus has a distinct duplication
    mode there; a plateau means the choice is safe).  Reuses the
    calibration kernel's exact integer intersections; candidate-fed."""
    from plato_spark.functions.dedup import minhash_calibration

    calib = minhash_calibration(load_table(spark, sf_dir, "documents"))
    qs = spark.createDataFrame([(t,) for t in DEDUP_THRESHOLDS],
                               "threshold double")
    return (
        calib.crossJoin(F.broadcast(qs))
        .groupBy("threshold")
        .agg(F.sum((F.col("jaccard") >= F.col("threshold"))
                   .cast("long")).cast("long").alias("n_pairs"))
    )


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


def q_coactivity_churn(spark, sf_dir):
    """Temporal edge churn of the co-activity graph: build the graph
    from the FIRST and SECOND half of the event range (split at the
    exact integer midpoint of min/max epoch micros — never wall-clock)
    and read edge counts, overlap, and Jaccard — how stable is the
    inferred social structure across time?  A near-zero Jaccard says
    every downstream graph metric is a snapshot artifact.  Exact
    integer counts, one rounded division."""
    from plato_spark.functions.events import co_activity_edges

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = ev.agg(F.min(us).alias("mn"), F.max(us).alias("mx")).select(
        F.expr("(mn + mx) div 2").alias("mid"))
    tagged = ev.crossJoin(F.broadcast(bounds))
    ea = co_activity_edges(tagged.where(us < F.col("mid")))
    eb = co_activity_edges(tagged.where(us >= F.col("mid")))
    n_a = ea.count()
    n_b = eb.count()
    common = ea.select("src", "dst").join(
        eb.select("src", "dst"), ["src", "dst"], "left_semi").count()
    base = spark.createDataFrame(
        [(n_a, n_b, common)],
        "edges_early long, edges_late long, common_edges long")
    # the division stays a Spark expression (half-up round), never
    # python round() (half-even) — 6dp tie discipline
    return base.select(
        "*",
        F.round(F.col("common_edges")
                / (F.col("edges_early") + F.col("edges_late")
                   - F.col("common_edges")), 6).alias("jaccard"))


def q_length_ks_distance(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov distance between two
    sources' doc-length distributions — the distribution-drift test
    behind 'did src1's crawler change?'.  D = max |F1(v) - F2(v)| is
    computed as the exact integer cross-multiply max |c1*n2 - c2*n1|
    over the merged distinct-value table (bounded by |distinct
    lengths|, the offsets-table role), with the argmax value tie-broken
    to the smallest v; float enters only at the two read-out
    divisions."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    a = docs.where(F.col("source") == "src0").groupBy(
        F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("ca"))
    b = docs.where(F.col("source") == "src1").groupBy(
        F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cb"))
    m = a.join(b, "v", "outer").select(
        "v", F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = m.select(
        "v", F.sum("ca").over(w).alias("f1"),
        F.sum("cb").over(w).alias("f2"))
    tot = m.agg(F.sum("ca").cast("long").alias("n1"),
                F.sum("cb").cast("long").alias("n2"))
    dev = cum.crossJoin(F.broadcast(tot)).select(
        "v", "n1", "n2",
        F.abs(F.col("f1") * F.col("n2")
              - F.col("f2") * F.col("n1")).alias("d"))
    best = dev.agg(
        F.max(F.struct(F.col("d"), (-F.col("v")).alias("nv"))).alias("m"),
        F.max("n1").alias("n1"), F.max("n2").alias("n2"))
    return best.select(
        F.col("n1"), F.col("n2"),
        (-F.col("m.nv")).cast("long").alias("ks_at_length"),
        F.round(F.col("m.d") / (F.col("n1") * F.col("n2")), 6)
        .alias("ks_distance"))


def q_charclass_profile(spark, sf_dir):
    """Per-source character-class profile: exact counts of lowercase /
    uppercase / digit / whitespace / other characters — the ingest
    fingerprint that catches a source flipping case conventions,
    going numeric, or injecting markup, one aggregation, JVM regex
    only."""
    docs = load_table(spark, sf_dir, "documents")

    def n_of(pat):
        return F.length(F.regexp_replace(F.col("text"),
                                         F.lit(pat), F.lit(""))).cast(
            "long")

    total = F.length(F.col("text")).cast("long")
    return (
        docs.select(
            "source", total.alias("n"),
            (total - n_of("[a-z]")).alias("lower"),
            (total - n_of("[A-Z]")).alias("upper"),
            (total - n_of("[0-9]")).alias("digit"),
            (total - n_of(r"[ \t\n\r]")).alias("white"),
        )
        .groupBy("source")
        .agg(F.sum("n").cast("long").alias("n_chars"),
             F.sum("lower").cast("long").alias("n_lower"),
             F.sum("upper").cast("long").alias("n_upper"),
             F.sum("digit").cast("long").alias("n_digit"),
             F.sum("white").cast("long").alias("n_white"),
             (F.sum("n") - F.sum("lower") - F.sum("upper")
              - F.sum("digit") - F.sum("white")).cast("long")
             .alias("n_other"))
    )


def q_ppjoin_pairs(spark, sf_dir):
    """EXACT set-similarity self-join via prefix filtering
    (functions/dedup.ppjoin_pairs, PPJoin): every token-set pair with
    Jaccard >= 0.95, no LSH recall loss — the deterministic complement
    to minhash_lsh_candidates.  The oracle computes the same pairs
    from the UNFILTERED all-token join, so the gate proves the prefix
    filter lossless on this corpus."""
    from plato_spark.functions.dedup import ppjoin_pairs

    return ppjoin_pairs(load_table(spark, sf_dir, "documents"),
                        threshold_pct=95)


def q_user_simpson_diversity(spark, sf_dir):
    """Per-user Gini-Simpson activity diversity: the probability two
    random events of the user differ in type, 1 - sum c_i(c_i-1) /
    (n(n-1)) — the diversity metric WITHOUT logs (source_entropy's
    bits need a documented libm caveat; this one is exact integer
    folds + ONE division).  Single-event users report NULL (no pair
    exists), never a fabricated 0."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    return per.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("ss"),
    ).select(
        "user_id", "n_events", "n_types",
        F.when(
            F.col("n_events") > 1,
            F.round(1 - F.col("ss")
                    / (F.col("n_events") * (F.col("n_events") - 1)), 6),
        ).alias("simpson"),
    )


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


def _sql_weighted_triangles() -> str:
    return SQL_GRAPH_PREFIX + """
SELECT CAST(count(*) AS BIGINT) AS n_triangles,
       CAST(sum(CAST(least(ab.weight, ac.weight, bc.weight) AS BIGINT))
            AS BIGINT) AS min_weight_sum
FROM canon ab
JOIN canon ac ON ac.src = ab.src AND ac.dst > ab.dst
JOIN canon bc ON bc.src = ab.dst AND bc.dst = ac.dst"""


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


def _sql_core_size_curve() -> str:
    return f"""
WITH kc AS MATERIALIZED ({_sql_kcore()}),
hist AS (SELECT coreness, CAST(count(*) AS BIGINT) AS c
         FROM kc GROUP BY coreness)
SELECT CAST(coreness AS BIGINT) AS k,
       CAST(sum(c) OVER (ORDER BY coreness DESC
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_vertices
FROM hist ORDER BY k"""


def q_closeness(spark, sf_dir):
    return closeness_sampled(
        part_cooccurrence_edges(spark, sf_dir), num_samples=CLOSENESS_SAMPLES
    )


def q_hanp(spark, sf_dir):
    sym = symmetrize(part_cooccurrence_edges(spark, sf_dir, weighted=True))
    return hanp(sym, iterations=3, weight="weight")


HYPERANF_STEPS = 4
NSTEP_STEPS = 2


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


def q_media_features(spark, sf_dir):
    """Encode each document as a real container file (PNG/BMP/JPEG/GIF/WAV,
    format + dimensions arithmetic in doc_id/n_chars), then parse the
    headers back with the independent spec-based struct parser. The oracle
    predicts every field arithmetically, so a single misplaced byte in
    either the encoder or the parser breaks the value hash."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return parse_media_headers(docs_to_media(docs))


FRAGMENT_HIST_K = 200


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


def q_graph_card(spark, sf_dir):
    """One-row graph dashboard — the corpus_card analog for the
    co-occurrence graph: vertices, canonical edges, density (one
    division of exact integers), max degree, component count, and the
    giant component's vertex share.  Composes degree aggregates with
    the proven hash-min WCC; exact integers throughout."""
    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    deg = (
        symmetrize(canon).groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    dstats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.max("deg").cast("long").alias("max_deg"),
    )
    ecnt = canon.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    comp = connected_components(canon)
    cstats = (
        comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"),
             F.max("sz").cast("long").alias("gcc"))
    )
    out = dstats.crossJoin(F.broadcast(ecnt)).crossJoin(F.broadcast(cstats))
    out = out.localCheckpoint(eager=True)
    canon.unpersist()
    n, e = F.col("n_vertices"), F.col("n_edges")
    return out.select(
        "n_vertices", "n_edges",
        F.round((F.lit(2) * e) / (n * (n - 1)), 6).alias("density"),
        "max_deg", "n_components",
        F.round((F.lit(100) * F.col("gcc")) / n, 6).alias("gcc_pct"),
    )


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


def q_events_card(spark, sf_dir):
    """One-row event-stream dashboard: events, users, span days,
    events-per-user, distinct types — the ingest sanity block beside
    corpus_card and graph_card.  Exact integers; span from exact
    microsecond min/max; one rounded division."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.unix_micros(F.min(F.col("ts").cast("timestamp"))).alias("lo"),
        F.unix_micros(F.max(F.col("ts").cast("timestamp"))).alias("hi"),
    )
    return g.select(
        "n_events", "n_users", "n_types",
        F.expr("(hi - lo) div 86400000000").cast("long").alias("span_days"),
        F.round(F.col("n_events") / F.col("n_users"), 6)
        .alias("events_per_user"),
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


def q_events_windowed(spark, sf_dir):
    """Batch form of the streaming tumbling-window aggregation
    (plato_spark.streaming.windowed_event_counts)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"),
             F.round(F.sum("value"), 6).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "value_sum")
    )


KATZ_ITERS = 8


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


def q_repetition_ratio(spark, sf_dir):
    """Type-token redundancy per document (boilerplate/spam signal)."""
    from plato_spark.functions.text import repetition_ratio

    docs = load_table(spark, sf_dir, "documents")
    return repetition_ratio(docs)


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


def q_redact_pii(spark, sf_dir):
    """PII scrub (emails/URLs/IPv4 -> typed tokens + counts). The corpus
    text is synthetic and PII-free, so the query plants deterministic PII
    per doc_id (mirrored verbatim in the oracle) — the redaction regexes
    then do real work that a single byte of drift would expose."""
    from plato_spark.functions.text import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit(" mail u"), F.col("doc_id"),
                            F.lit("@example.com now")))
            .when(F.col("doc_id") % 3 == 1,
                  F.concat(F.lit(" ref https://example.org/p/"),
                           F.col("doc_id"), F.lit(" end")))
            .otherwise(F.concat(F.lit(" host 10.0."),
                                F.col("doc_id") % 256, F.lit(".7 up"))),
        ).alias("text"),
    )
    return redact_pii(planted)


def q_domain_counts(spark, sf_dir):
    """URL host frequency across the corpus (source-mix analysis) over
    deterministically planted URLs (see q_redact_pii)."""
    from plato_spark.functions.text import domain_counts

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see http://site"), F.col("doc_id") % 5,
            F.lit(".example.com/x/"), F.col("doc_id"),
            F.when(F.col("doc_id") % 2 == 0,
                   F.concat(F.lit(" and https://mirror.example.net/"),
                            F.col("doc_id"))).otherwise(F.lit("")),
        ).alias("text"),
    )
    return domain_counts(planted)


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


def q_shingle_novelty(spark, sf_dir):
    """Per-document novel-shingle fraction vs all lower-id documents
    (functions/dedup.shingle_novelty) — the incremental-crawl "what does
    this snapshot add" curation signal.  Exact integers + one rounded
    division; only (id, hash) pairs and per-hash minima shuffle."""
    from plato_spark.functions.dedup import shingle_novelty

    return shingle_novelty(load_table(spark, sf_dir, "documents"))


def q_winnow_fingerprints(spark, sf_dir):
    """Robust-winnowing fingerprint selection (MOSS kernel, functions/
    text.winnow_fingerprints): token 5-gram hashes, window w=4, min hash
    per window with rightmost tie-break — (id, pos, fp) rows, all-JVM
    higher-order functions, zero shuffle before the final distinct."""
    from plato_spark.functions.text import winnow_fingerprints

    return winnow_fingerprints(load_table(spark, sf_dir, "documents"))


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


def q_hapax_stats(spark, sf_dir):
    """Per-source hapax-legomenon / type-token vocabulary profile
    (functions/text.hapax_stats) — the Heaps-law health check before
    tokenizer training."""
    from plato_spark.functions.text import hapax_stats

    return hapax_stats(load_table(spark, sf_dir, "documents"))


def q_partition_cut(spark, sf_dir):
    """Edge-cut audit of explicit mod vs contiguous-range vertex
    placement at 32 blocks (graph/partitioning.partition_cut_audit) —
    measures the superstep network cost the north rule's partitioning
    choices trade on."""
    from plato_spark.graph.partitioning import partition_cut_audit

    return partition_cut_audit(part_cooccurrence_edges(spark, sf_dir), 32)


def q_inter_event_gaps(spark, sf_dir):
    """Per-user inter-arrival profile in exact integer microseconds
    (functions/events.inter_event_gaps) — the empirical basis for the
    sessionization break and watermark delay."""
    from plato_spark.functions.events import inter_event_gaps

    return inter_event_gaps(load_table(spark, sf_dir, "events"))


def q_degree_gini(spark, sf_dir):
    """Gini coefficient of the degree distribution (graph/edges
    degree_gini) — the scalar skew audit behind hub/salting policy;
    rank-weighted sum folded over the degree HISTOGRAM so the only
    window runs over distinct degree values."""
    from plato_spark.graph.edges import degree_gini

    return degree_gini(part_cooccurrence_edges(spark, sf_dir))


SINKHORN_ITERS = 5


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


def q_cochange_lift(spark, sf_dir):
    """Top-50 item pairs by association-rule lift over order baskets
    (functions/recommend.association_lift) — the co-change-prediction
    signal for the code corpus, market-basket lift for curation."""
    from plato_spark.functions.recommend import association_lift

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    return association_lift(li, k=50, min_support=2)


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


def q_event_transitions(spark, sf_dir):
    """First-order event-type Markov transition matrix
    (functions/events.event_transitions) along each user's timeline."""
    from plato_spark.functions.events import event_transitions

    return event_transitions(load_table(spark, sf_dir, "events"))


def q_edit_distance_dups(spark, sf_dir):
    """Levenshtein-verified near-dup pairs over the MinHash-LSH
    candidate feed (functions/dedup.edit_distance_pairs) — the
    character-level final gate beside the token-level verifiers."""
    from plato_spark.functions.dedup import edit_distance_pairs

    return edit_distance_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.3
    )


HUB_SWEEP_KS = (0, 50, 100, 200)
HUB_SWEEP_SQL_ITERS = 24  # max measured fixpoint 15 (k=100); margin 9


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


def q_degree_incremental(spark, sf_dir):
    """Incrementally-maintained vertex degrees (streaming/degree_stream):
    the canonical edge table arrives as four micro-batches folded into
    bucket-pruned, epoch-tagged exactly-once state; the read-out must
    equal the batch degree count verbatim (addition monoid).  The live
    control surface for hub salting / push-pull policy on a growing
    crawl."""
    import shutil
    import tempfile

    from plato_spark.streaming.degree_stream import (
        merge_degree_batch,
        read_degree_state,
    )

    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    sd = tempfile.mkdtemp(prefix="plato_incdeg_")
    try:
        for i in range(4):
            # nbuckets=8 at gate scale: a dense fixture batch touches
            # every bucket, so bucket count is pure write overhead here;
            # production crawls touch few of many buckets (the pruning
            # case measured in streaming/incremental.py)
            merge_degree_batch(
                canon.where(F.pmod(F.col("src") + F.col("dst"), F.lit(4)) == i),
                sd,
                epoch_id=i,
                nbuckets=8,
            )
        out = read_degree_state(spark, sd).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sd, ignore_errors=True)
    canon.unpersist()
    return out


SP_COUNT_SQL_LEVELS = 8  # co-occurrence BFS depth 3-4 measured; margin


def q_sp_counts(spark, sf_dir):
    """BFS shortest-path counts from the smallest vertex
    (algos/bfs.bfs_path_counts — Brandes' sigma standalone): (id, dist,
    sigma) with exact BIGINT path counts; sigma=1 flags routing
    bottlenecks, large sigma flags redundant connectivity."""
    from plato_spark.algos.bfs import bfs_path_counts

    sym = _sym(spark, sf_dir)
    root = sym.agg(F.min("src")).collect()[0][0]
    out = bfs_path_counts(sym, int(root))
    return out.select("id", F.col("dist").cast("long").alias("dist"), "sigma")


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


def q_bloom_prune(spark, sf_dir):
    """Bloom-filter join-pruning audit (functions/sketches
    .bloom_probe_stats): portable md5 double-hashing filter over a
    third of the customer keys, probed by every ordering customer —
    exact realized false-positive count instead of the formula.
    m=2048/d=4 sized so the sf0.01 probe shows real false positives."""
    from plato_spark.functions.sketches import bloom_probe_stats

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 3 == 0
    )
    orders = load_table(spark, sf_dir, "orders")
    return bloom_probe_stats(
        cust, orders, "c_custkey", "o_custkey", m=2048, d=4
    )


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking dedup (functions/dedup.cdc_chunk_stats):
    rolling-hash chunk boundaries (h % 64 == 0 over 8-char windows)
    that RESYNCHRONIZE after edits — the content-store dedup strategy
    beside the fixed-window chunk_dedup.  All JVM higher-order
    functions; exact integer reclaim accounting."""
    from plato_spark.functions.dedup import cdc_chunk_stats

    return cdc_chunk_stats(load_table(spark, sf_dir, "documents"))


def q_triangle_incremental(spark, sf_dir):
    """Incrementally-maintained exact triangle count
    (streaming/triangle_stream): the canonical edge table arrives as
    four micro-batches; each batch counts only the triangles its new
    edges close against history (id-ordered union enumeration with
    is_new flags), and the running total telescopes to the one-shot
    batch triangle count — the oracle verbatim."""
    import shutil
    import tempfile

    from plato_spark.streaming.triangle_stream import (
        merge_triangle_batch,
        read_triangle_state,
    )

    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    sd = tempfile.mkdtemp(prefix="plato_inctri_")
    try:
        for i in range(4):
            merge_triangle_batch(
                canon.where(F.pmod(F.col("src") + F.col("dst"), F.lit(4)) == i),
                sd,
                epoch_id=i,
            )
        out = read_triangle_state(spark, sd).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sd, ignore_errors=True)
    canon.unpersist()
    return out


def q_component_stability(spark, sf_dir):
    """Rand / adjusted-Rand agreement (algos/partition_metrics) between
    the citation support graph's WCC partition and the partition after
    removing the top-100 hubs — quantifies what q_hub_removal shows
    structurally: how much does hub removal reshuffle co-membership?
    Restricted to vertices present in both partitions; exact binomial
    pair-count folds (shiftright halving, no double division)."""
    from plato_spark.algos.partition_metrics import partition_rand_index
    from plato_spark.algos.wcc import connected_components
    from plato_spark.graph.edges import canonicalize_undirected, symmetrize

    support = canonicalize_undirected(q_reference_graph(spark, sf_dir)).persist()
    labels_a = connected_components(symmetrize(support))
    deg = (
        symmetrize(support)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    hubs = F.broadcast(deg.orderBy(F.desc("deg"), F.asc("id")).limit(100).select("id"))
    sub = support.join(
        hubs.withColumnRenamed("id", "src"), "src", "anti"
    ).join(hubs.withColumnRenamed("id", "dst"), "dst", "anti")
    labels_b = connected_components(symmetrize(sub))
    out = partition_rand_index(labels_a, labels_b)
    support.unpersist()
    return out


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


def q_directed_assortativity(spark, sf_dir):
    """The four directed degree-degree correlations out-in/out-out/
    in-in/in-out (graph/edges.directed_degree_assortativity, Foster et
    al. PNAS 2010) over the planted citation digraph — the directed
    refinement of the undirected assortativity scalar."""
    from plato_spark.graph.edges import directed_degree_assortativity

    return directed_degree_assortativity(q_reference_graph(spark, sf_dir))


def q_markov_eval(spark, sf_dir):
    """Top-1 next-event prediction accuracy of the first-order Markov
    model across the day-parity split (functions/events.markov_eval) —
    train transitions on half 0, argmax-predict, score on half 1; the
    generalization check behind event_transitions."""
    from plato_spark.functions.events import markov_eval

    return markov_eval(load_table(spark, sf_dir, "events"))


def q_snm_candidates(spark, sf_dir):
    """Sorted-neighborhood near-dup candidates (functions/dedup
    .snm_candidates, Hernández-Stolfo 1995): window-8 pairs along the
    normalized 24-char-prefix sort order — the third blocking family
    beside MinHash-LSH and SimHash, catching prefix-anchored template
    dups hash blocking scatters.  Distributed rank via the vid-encoder
    range-sort idiom; the sliding window is two offset bucketings whose
    equi-joins are provably exact."""
    from plato_spark.functions.dedup import snm_candidates

    return snm_candidates(load_table(spark, sf_dir, "documents"))


def q_label_consistency(spark, sf_dir):
    """Per-doc neighborhood label agreement (algos/mixing
    .label_consistency) over the citation support graph — the
    weak-supervision QA pass flagging docs whose lang tag disagrees
    with their citation neighborhood; the per-vertex form of
    attr_assortativity."""
    from plato_spark.algos.mixing import label_consistency

    edges = q_reference_graph(spark, sf_dir)
    labels = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return label_consistency(edges, labels)


def q_triad_census(spark, sf_dir):
    """Full 16-class Holland-Leinhardt triad census (algos/triads) over
    the planted citation digraph with the whole document table as the
    vertex universe — the complete directed-structure fingerprint whose
    2-vertex prefix is q_dyad_census.  Engine: analytic decomposition
    (wedge enumeration for >=2-edge triples, per-dyad arithmetic for
    1-edge triples, complement for 003); oracle: independent FULL
    brute force over all C(500,3) ~ 20.7M triples — two genuinely
    different methods agreeing exactly."""
    from plato_spark.algos.triads import triad_census

    edges = q_reference_graph(spark, sf_dir)
    verts = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    return triad_census(edges, verts)


def q_style_divergence(spark, sf_dir):
    """Per-source total-variation style divergence from the corpus
    unigram distribution (functions/text.source_style_divergence) —
    the STYLE sibling of the Sinkhorn VOLUME balancer.  Exact BIGINT
    cross-multiplied fold over the top-200 vocab + residual bucket,
    one rounded division per source (TV needs no ln — the cross-libm
    lesson)."""
    from plato_spark.functions.text import source_style_divergence

    return source_style_divergence(load_table(spark, sf_dir, "documents"))


PRC_ITERS = 12


def q_pagerank_citation(spark, sf_dir):
    """Directed PageRank on the planted citation digraph — same kernel
    (algos/pagerank, join impl) and damping as q_pagerank, but on a
    graph where dangling vertices are REAL (docs nobody planted an
    out-link for): exercises the lost-mass branch the symmetrized
    co-occurrence graph keeps inert (plato pagerank.hpp:100-146 —
    rank of a vertex with no out-edges decays, no redistribution).
    Fixed 12 supersteps, eps=0, identical on both engines."""
    edges = q_reference_graph(spark, sf_dir)
    r = pagerank(edges, eps=0.0, max_iters=PRC_ITERS, impl="join")
    return r.select("id", F.round("rank", 6).alias("rank"))


def q_source_mixing(spark, sf_dir):
    """Cross-SOURCE citation mixing matrix (algos/mixing
    .attribute_mixing_matrix keyed on source): the container-level
    entanglement dashboard beside the language one — per
    (src_source, dst_source) directed edge counts."""
    from plato_spark.algos.mixing import attribute_mixing_matrix

    edges = q_reference_graph(spark, sf_dir)
    labels = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source")
    return attribute_mixing_matrix(edges, labels).select(
        F.col("src_label").alias("src_source"),
        F.col("dst_label").alias("dst_source"),
        "edges",
    )


def q_cocitation_cosine(spark, sf_dir):
    """Cosine-normalized co-citation (Small's weight over the geometric
    mean of citation in-degrees): corrects raw co-citation's popularity
    bias — two blockbusters co-cited 10 times may be LESS related than
    two niche docs co-cited 3 times.  One broadcast-scale join per side
    onto the existing co_citation kernel, exact integers until one
    rounded division."""
    from plato_spark.algos.citations import co_citation

    edges = q_reference_graph(spark, sf_dir)
    cc = co_citation(edges)
    ind = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("ind"))
    return (
        cc.join(ind.select(F.col("id").alias("a"),
                           F.col("ind").alias("da")), "a")
        .join(ind.select(F.col("id").alias("b"),
                         F.col("ind").alias("db")), "b")
        .select(
            "a", "b", "weight",
            F.round(F.col("weight")
                    / F.sqrt((F.col("da") * F.col("db")).cast("double")), 6)
            .alias("cosine"),
        )
    )


def q_bibcoupling_cosine(spark, sf_dir):
    """Cosine-normalized bibliographic coupling (Kessler's weight over
    the geometric mean of OUT-degrees): cocitation_cosine's time-mirror
    — shared references instead of shared citers, corrected for
    reference-list length (a survey shares references with everyone)."""
    from plato_spark.algos.citations import bibliographic_coupling

    edges = q_reference_graph(spark, sf_dir)
    bc = bibliographic_coupling(edges)
    outd = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("od"))
    return (
        bc.join(outd.select(F.col("id").alias("a"),
                            F.col("od").alias("da")), "a")
        .join(outd.select(F.col("id").alias("b"),
                          F.col("od").alias("db")), "b")
        .select(
            "a", "b", "weight",
            F.round(F.col("weight")
                    / F.sqrt((F.col("da") * F.col("db")).cast("double")), 6)
            .alias("cosine"),
        )
    )


def q_degree_quantiles(spark, sf_dir):
    """Degree-distribution percentiles (p50/p90/p99 of the symmetrized
    co-occurrence degrees via the histogram quantile kernel): the
    skew dashboard number beside degree_gini's scalar and the log2
    histogram's shape."""
    from plato_spark.functions.quantiles import histogram_quantiles
    from plato_spark.graph.edges import symmetrize

    deg = (
        symmetrize(part_cooccurrence_edges(spark, sf_dir))
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return histogram_quantiles(deg, "deg", quantiles=(0.5, 0.9, 0.99),
                               nbins=256)


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


def q_co_citation(spark, sf_dir):
    """Co-citation pairs (algos/citations.co_citation — Small 1973):
    docs cited together by a common third doc, over the planted
    citation digraph.  The 'related work' similarity signal that
    accrues as the corpus grows."""
    from plato_spark.algos.citations import co_citation

    return co_citation(q_reference_graph(spark, sf_dir))


def q_biblio_coupling(spark, sf_dir):
    """Bibliographic coupling pairs (algos/citations
    .bibliographic_coupling — Kessler 1963): docs citing the same
    targets, over the planted citation digraph.  Computable at crawl
    time from a doc's own out-links, unlike co-citation."""
    from plato_spark.algos.citations import bibliographic_coupling

    return bibliographic_coupling(q_reference_graph(spark, sf_dir))


def q_degree_clustering(spark, sf_dir):
    """Degree-dependent clustering curve c(k) (algos/triangles
    .degree_clustering_curve) on the co-occurrence graph — the
    hierarchical-modularity probe (Ravasz-Barabási), ratio-of-sums per
    degree class so both engines stay in exact BIGINTs."""
    from plato_spark.algos.triangles import degree_clustering_curve

    return degree_clustering_curve(part_cooccurrence_edges(spark, sf_dir))


def q_strength_disparity(spark, sf_dir):
    """Per-vertex edge-weight concentration Y(v) (graph/edges
    .strength_disparity) on the weighted co-occurrence graph — the
    weight-aware sibling of the degree audits, deciding whether a hub
    needs whole-vertex salting or just its one heavy edge isolated."""
    from plato_spark.graph.edges import strength_disparity

    return strength_disparity(
        part_cooccurrence_edges(spark, sf_dir, weighted=True)
    )


def q_edge_smoothness(spark, sf_dir):
    """Dirichlet energy of doc length over the planted citation digraph
    (graph/edges.attribute_dirichlet) — 'do linked documents look
    alike?', the smoothness precondition for neighborhood aggregation
    (GNN feeds, label spreading) carrying any signal.  Exact BIGINT
    folds, one rounded division."""
    from plato_spark.graph.edges import attribute_dirichlet

    edges = q_reference_graph(spark, sf_dir)
    attrs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return attribute_dirichlet(edges, attrs)


def q_hub_churn(spark, sf_dir):
    """Top-100 hub stability between the two day-parity halves of the
    event stream (graph/edges.hub_rank_churn over two co-activity
    snapshot graphs): Spearman-footrule rank drift + top-list
    entry/exit counts — the audit that decides whether yesterday's
    hub-capped partitioning is still valid today."""
    from plato_spark.functions.events import co_activity_edges
    from plato_spark.graph.edges import hub_rank_churn

    ev = load_table(spark, sf_dir, "events")
    half = F.pmod(
        F.datediff(
            F.to_date(F.col("ts").cast("timestamp")),
            F.to_date(F.lit("1970-01-01")),
        ),
        F.lit(2),
    )
    a = ev.where(half == 0)
    b = ev.where(half == 1)
    return hub_rank_churn(
        co_activity_edges(a), co_activity_edges(b), k=100
    )


def q_bowtie(spark, sf_dir):
    """Broder bow-tie decomposition (algos/bowtie) — CORE / IN / OUT /
    TENDRIL / DISCONNECTED vertex census of a planted variable-degree
    citation digraph.  The q_reference_graph wiring gives every doc
    out-degree exactly 2, which makes OUT/TENDRIL/DISCONNECTED
    structurally empty (every forward path re-enters the giant SCC) —
    so this fixture draws out-degree k = md5-hash('deg|id') % 3 in
    {0, 1, 2} per doc, which populates all five categories (59/75/111/
    162/93 at the shared 500-doc table).  PLANTED-TRUTH wiring; the
    engine still runs the real SCC + reachability + WCC kernels."""
    from plato_spark.algos.bowtie import bowtie_decomposition
    from plato_spark.functions.text import portable_h1

    docs = load_table(spark, sf_dir, "documents")
    n = docs.select("doc_id").distinct().count()
    sid = F.col("doc_id").cast("string")
    k = F.pmod(portable_h1(F.concat(F.lit("deg|"), sid)), F.lit(3))

    def _target(j):
        return F.pmod(
            portable_h1(F.concat(F.lit("ref|"), sid, F.lit(f"|{j}"))),
            F.lit(n),
        ).cast("long")

    base = docs.select(
        F.col("doc_id").alias("src"),
        k.alias("k"),
        _target(0).alias("t0"),
        _target(1).alias("t1"),
    )
    edges = (
        base.where(F.col("k") >= 1).select("src", F.col("t0").alias("dst"))
        .unionByName(
            base.where(F.col("k") >= 2).select("src", F.col("t1").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return bowtie_decomposition(edges, docs.select(F.col("doc_id").alias("id")))


def q_brand_mixing(spark, sf_dir):
    """Brand mixing over the co-occurrence graph (algos/mixing
    .attribute_mixing_matrix keyed on p_brand, canonical edges as the
    directed input): do baskets stay within a brand or mix? — the
    product-category cohesion matrix, the merchandising twin of the
    language one."""
    from plato_spark.algos.mixing import attribute_mixing_matrix

    canon = part_cooccurrence_edges(spark, sf_dir)
    labels = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("doc_id"), F.col("p_brand"))
    return attribute_mixing_matrix(canon, labels).select(
        F.col("src_label").alias("src_brand"),
        F.col("dst_label").alias("dst_brand"),
        "edges",
    )


def q_lang_mixing(spark, sf_dir):
    """Cross-language citation mixing matrix (algos/mixing
    .attribute_mixing_matrix) over the planted citation digraph — per
    (src_lang, dst_lang) directed edge counts, the entanglement
    dashboard behind per-language corpus splits (a split is only clean
    if the off-diagonal mass is small)."""
    from plato_spark.algos.mixing import attribute_mixing_matrix

    edges = q_reference_graph(spark, sf_dir)
    labels = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return attribute_mixing_matrix(edges, labels).select(
        F.col("src_label").alias("src_lang"),
        F.col("dst_label").alias("dst_lang"),
        "edges",
    )


def q_attr_assortativity(spark, sf_dir):
    """Newman categorical assortativity by language (algos/mixing
    .attribute_assortativity) over the planted citation digraph — the
    scalar 'do same-language docs cite each other' audit beside the
    degree-assortativity scalar.  Exact integer folds, one rounded
    division (NULL when undefined)."""
    from plato_spark.algos.mixing import attribute_assortativity

    edges = q_reference_graph(spark, sf_dir)
    labels = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return attribute_assortativity(edges, labels)


def q_retention_cohorts(spark, sf_dir):
    """Day-N retention matrix (functions/events.retention_cohorts):
    users from each first-event cohort still active k days later —
    exact integer counts, cohort emitted as yyyy-MM-dd text."""
    from plato_spark.functions.events import retention_cohorts

    return retention_cohorts(load_table(spark, sf_dir, "events"))


def q_vocabulary(spark, sf_dir):
    """Top-200 corpus vocabulary by term frequency (+doc frequency) —
    the tokenizer/vocab-building step of a training pipeline."""
    from plato_spark.functions.text import vocabulary_stats

    docs = load_table(spark, sf_dir, "documents")
    return vocabulary_stats(docs, top_k=VOCAB_TOP_K)


def q_orphan_docs(spark, sf_dir):
    """Per-source citation-orphan share: docs with zero citation
    degree in either direction (never cited, citing nothing) — the
    'dead weight' curation signal a link-graph corpus watches per
    container.  Composes instability's degree table; exact integers,
    one rounded division."""
    from plato_spark.algos.citations import instability

    edges = q_reference_graph(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    inst = instability(edges, docs.select(F.col("doc_id").alias("id")))
    j = docs.select(F.col("doc_id").alias("id"), "source").join(
        inst.select("id", (F.col("fan_in") + F.col("fan_out") == 0)
                    .alias("orphan")), "id")
    return (
        j.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum(F.when(F.col("orphan"), 1).otherwise(0)).cast("long")
             .alias("orphans"))
        .select("source", "n_docs", "orphans",
                F.round((F.lit(100) * F.col("orphans")) / F.col("n_docs"), 6)
                .alias("orphan_pct"))
    )


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


def q_quality_length_corr(spark, sf_dir):
    """Rank agreement between document LENGTH (n_chars) and the
    unigram-LM quality score (algos/rankcorr.rank_correlation): the
    'is the quality filter just a length filter?' audit — rho near 1
    says the expensive signal adds nothing over n_chars.  Same pinned
    (score DESC, id) total order and distributed dictionary rank as
    centrality_rank_corr; mean_tf is already 6dp-rounded so
    round(mean_tf*1e6) is an exact integer score."""
    from plato_spark.algos.rankcorr import rank_correlation
    from plato_spark.functions.text import unigram_commonness

    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("id"),
                    F.col("n_chars").cast("long").alias("score_u"))
    b = unigram_commonness(docs).select(
        F.col("doc_id").alias("id"),
        F.round(F.col("mean_tf") * 1e6, 0).cast("long").alias("score_u"))
    return rank_correlation(a, b)


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


def q_lm_quality(spark, sf_dir):
    """Unigram-LM document quality scoring (the perplexity-filter signal
    in exact arithmetic — see functions/text.unigram_commonness)."""
    from plato_spark.functions.text import unigram_commonness

    return unigram_commonness(load_table(spark, sf_dir, "documents"))


def q_pmi_collocations(spark, sf_dir):
    """Top-50 adjacent-token collocations by PMI lift (multiword
    expression mining; raw-ratio ranking, no ln — the tfidf lesson)."""
    from plato_spark.functions.text import pmi_collocations

    return pmi_collocations(load_table(spark, sf_dir, "documents"))


def q_boilerplate_lines(spark, sf_dir):
    """Line-level boilerplate shared by >=3 docs (C4/RefinedWeb-style
    chrome stripping) — only sha digests shuffle.  NOTE: a true negative
    on this corpus (synthetic docs carry no newlines, all 500 texts
    distinct) — both engines compute the full pipeline and agree on the
    empty result; semantics are pinned by the banner-detection pytest."""
    from plato_spark.functions.text import boilerplate_lines

    return boilerplate_lines(load_table(spark, sf_dir, "documents"))


def q_source_overlap(spark, sf_dir):
    """Cross-source 8-gram shingle contamination matrix (which sources
    are textually entangled before blend mixing)."""
    from plato_spark.functions.dedup import source_shingle_overlap

    return source_shingle_overlap(load_table(spark, sf_dir, "documents"))


def q_doclen_histogram(spark, sf_dir):
    """Log2-bucketed document token-length distribution (integer bit
    length, not libm log2 — the no-ln discipline)."""
    from plato_spark.functions.text import doclen_histogram

    return doclen_histogram(load_table(spark, sf_dir, "documents"))


def q_bigram_vocabulary(spark, sf_dir):
    """Top-200 word bigrams (tf, df) — overlapping windows built JVM-side
    from the token array (functions/text.ngram_vocabulary)."""
    from plato_spark.functions.text import ngram_vocabulary

    return ngram_vocabulary(load_table(spark, sf_dir, "documents"), n=2)


def q_doc_chunks(spark, sf_dir):
    """Fixed-token-window training chunks (64-token windows, stride 48)
    per document (functions/text.chunk_documents)."""
    from plato_spark.functions.text import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk=64, stride=48
    )


def q_modularity(spark, sf_dir):
    """Weighted modularity of the one-level Louvain partition (exact
    integer fold, single IEEE division at read-out; algos/modularity)."""
    from plato_spark.algos.modularity import modularity

    canon = part_cooccurrence_edges(spark, sf_dir, weighted=True)
    labels = louvain(
        canon, outer_iterations=1, inner_iterations=1, weight="weight"
    )
    return modularity(canon, labels, weight="weight")


def q_mis(spark, sf_dir):
    """Deterministic Luby maximal independent set (unique portable-hash
    priorities; algos/mis) — (id, mis_round) for every MIS member."""
    from plato_spark.algos.mis import maximal_independent_set

    return maximal_independent_set(
        symmetrize(part_cooccurrence_edges(spark, sf_dir))
    )


def q_matching(spark, sf_dir):
    """Deterministic maximal matching (locally-minimal hash-priority
    edges; algos/matching) — (src, dst, match_round) per matched edge."""
    from plato_spark.algos.matching import maximal_matching

    return maximal_matching(part_cooccurrence_edges(spark, sf_dir))


def q_source_health(spark, sf_dir):
    """Per-source corpus health rollup: doc counts, token mass, mean
    length, language mix entropy-free proxy (distinct langs), and
    exact-duplicate rate — the pre-mixing dashboard of a curation
    pipeline.  One aggregation over per-doc JVM expressions + one
    sha-digest dup join; exact integers + rounded divisions."""
    from plato_spark.functions.text import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        token_count_col(F.col("text")).alias("n_tok"),
        F.length("text").cast("long").alias("n_chars"),
        F.col("lang"),
        F.sha2(F.col("text"), 256).alias("sha"),
    )
    dup = (
        per.groupBy("source", "sha").agg(F.count("*").alias("c"))
        .groupBy("source")
        .agg((F.sum("c") - F.count("*")).cast("long").alias("n_dups"))
    )
    agg = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.round(F.avg("n_chars"), 2).alias("mean_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    return agg.join(dup, "source").select(
        "source", "n_docs", "n_tokens", "mean_chars", "n_langs",
        "n_dups",
        F.round(F.col("n_dups") / F.col("n_docs"), 6).alias("dup_rate"),
    )


def q_linkpred_eval(spark, sf_dir):
    """End-to-end link-prediction eval: portable-hash 20% edge holdout,
    common-neighbor top-10 ranking on the train graph, hits@10 against
    the held-out edges (functions/linkpred)."""
    from plato_spark.functions.linkpred import link_prediction_eval

    return link_prediction_eval(
        part_cooccurrence_edges(spark, sf_dir), k=10, holdout_mod=5
    )


def q_negative_sampling(spark, sf_dir):
    """Deterministic negative-edge sampling for link-prediction / GNN
    training: up to 5 portable-hash non-neighbors per vertex
    (functions/sampling.negative_edge_sampling)."""
    from plato_spark.functions.sampling import negative_edge_sampling

    return negative_edge_sampling(_sym(spark, sf_dir), k=5, attempts=16)


def q_revenue_rollup(spark, sf_dir):
    """TPC-H-Q5-shape star rollup: discounted revenue per region/nation
    with broadcast dimensions and exact integer-cents accumulation
    (functions/relational.revenue_rollup)."""
    from plato_spark.functions.relational import revenue_rollup

    return revenue_rollup(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_value_outliers(spark, sf_dir):
    """Per-event-type z-score outlier counts from sufficient statistics
    (functions/relational.value_outliers; 6dp-rounded mean/std cutoff)."""
    from plato_spark.functions.relational import value_outliers

    return value_outliers(load_table(spark, sf_dir, "events"), z=3.0)


def q_containment(spark, sf_dir):
    """Asymmetric shingle containment >= 0.8 (directed subset-duplication
    pairs; functions/dedup.containment_pairs, exact all-pairs baseline)."""
    from plato_spark.functions.dedup import containment_pairs

    return containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8, n=3
    )


def q_co_activity(spark, sf_dir):
    """Temporal co-activity graph from the event stream: users linked
    per shared (event_type, hour) bucket, 256-user bucket guard
    (functions/events.co_activity_edges)."""
    from plato_spark.functions.events import co_activity_edges

    return co_activity_edges(load_table(spark, sf_dir, "events"))


def q_percolation(spark, sf_dir):
    """Weight-threshold percolation sweep of the co-occurrence graph
    (algos/percolation): component structure at weight >= {1,2,3,5}."""
    from plato_spark.algos.percolation import percolation_sweep

    return percolation_sweep(
        part_cooccurrence_edges(spark, sf_dir, weighted=True), (1, 2, 3, 5)
    )


def q_oov(spark, sf_dir):
    """Tokenizer-coverage check: train/eval split by portable doc-id
    hash, eval-half OOV token mass vs the train vocabulary
    (functions/text.oov_stats)."""
    from plato_spark.functions.text import oov_stats

    return oov_stats(load_table(spark, sf_dir, "documents"))


def q_butterfly_vertices(spark, sf_dir):
    """Per-part butterfly participation over the order x part incidence
    (algos/butterflies.butterfly_per_vertex) — (id, butterflies)."""
    from plato_spark.algos.butterflies import butterfly_per_vertex

    inc = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    return butterfly_per_vertex(inc, left="o", right="p", side="right")


def q_rich_club(spark, sf_dir):
    """Rich-club coefficients of the co-occurrence graph at k in
    {4,8,16,32} (algos/motifs.rich_club) — exact counts + one rounded
    division per k."""
    from plato_spark.algos.motifs import rich_club

    return rich_club(part_cooccurrence_edges(spark, sf_dir))


def q_densest(spark, sf_dir):
    """(2+eps)-approximate densest subgraph via logarithmic-round
    average-degree peeling (Bahmani et al. PVLDB'12; algos/densest) —
    winning snapshot's vertices + exact rational density."""
    from plato_spark.algos.densest import densest_subgraph

    return densest_subgraph(part_cooccurrence_edges(spark, sf_dir))


def q_weighted_matching(spark, sf_dir):
    """Locally-heaviest greedy weighted matching (Preis 1999 shape,
    1/2-approximation; algos/matching with weight-first priority)."""
    from plato_spark.algos.matching import maximal_matching

    return maximal_matching(
        part_cooccurrence_edges(spark, sf_dir, weighted=True),
        weight_col="weight",
    )


def q_hll_user_cardinality(spark, sf_dir):
    """Per-event-type distinct-user estimates via the portable
    64-register HLL (functions/sketches.hll_group_cardinality) — the
    GROUP BY COUNT(DISTINCT) replacement whose shuffle carries at most
    |groups| x 64 register rows."""
    from plato_spark.functions.sketches import hll_group_cardinality

    return hll_group_cardinality(
        load_table(spark, sf_dir, "events"), "event_type", "user_id"
    )


def q_salsa(spark, sf_dir):
    """SALSA hub/authority scores over the order x part incidence
    (algos/salsa; 5 L1-normalized degree-stochastic iterations)."""
    from plato_spark.algos.salsa import salsa

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    return salsa(li, iters=5, left="o", right="p")


def q_motif_census(spark, sf_dir):
    """Exact motif census of the co-occurrence graph (algos/motifs):
    one row (n_vertices, n_edges, wedges, triangles, four_cycles);
    `triangles` cross-checks the independent orientation-based
    triangle_count query."""
    from plato_spark.algos.motifs import motif_census

    return motif_census(part_cooccurrence_edges(spark, sf_dir))


def q_price_quantiles(spark, sf_dir):
    """Histogram-interpolated quantiles (p50/p90/p99) of
    l_extendedprice — 256 fixed-width bins, no sort
    (functions/quantiles)."""
    from plato_spark.functions.quantiles import histogram_quantiles

    return histogram_quantiles(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice",
        quantiles=(0.5, 0.9, 0.99), nbins=256,
    )


def q_funnel(spark, sf_dir):
    """view -> click -> purchase funnel over the event stream: users
    reaching each step in strict timestamp order (functions/events)."""
    from plato_spark.functions.events import funnel_counts

    return funnel_counts(
        load_table(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def q_cms_incremental(spark, sf_dir):
    """Streaming count-min sketch (streaming/cms_stream): the corpus
    arrives as three micro-batches folded cell-wise into a persisted
    versioned sketch with epoch-tagged exactly-once commits; cell
    addition is a commutative monoid, so the folded sketch — and hence
    the heavy-hitter read-out — equals the batch CMS verbatim (same
    oracle as cms_heavy_hitters)."""
    import shutil
    import tempfile

    from plato_spark.functions.sketches import cms_probe
    from plato_spark.functions.text import TOKEN_RE
    from plato_spark.streaming.cms_stream import (
        merge_cms_batch,
        read_cms_state,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    sd = tempfile.mkdtemp(prefix="plato_inccms_")
    try:
        for i in range(3):
            merge_cms_batch(
                docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i),
                sd, epoch_id=i, depth=4, width=64,
            )
        cand = docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
            ).alias("token")
        ).distinct()
        out = cms_probe(
            read_cms_state(spark, sd), cand, threshold=50, depth=4, width=64
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sd, ignore_errors=True)
        docs.unpersist()
    return out


def q_asof_next(spark, sf_dir):
    """Forward as-of join (functions/events.asof_next): each view/click
    matched to the user's earliest purchase at-or-after within 1 hour —
    the time-to-convert mirror of asof_attribution, same tagged-union +
    one-user-keyed-window plan traversed descending."""
    from plato_spark.functions.events import asof_next

    return asof_next(load_table(spark, sf_dir, "events"), window_s=3600)


def q_embedding_quantization(spark, sf_dir):
    """Symmetric int8 quantization audit
    (functions/similarity.embedding_quantization): global 127/max|x|
    scale, per-label max/mean reconstruction error with exact-integer
    mean accumulation."""
    from plato_spark.functions.similarity import embedding_quantization

    return embedding_quantization(load_table(spark, sf_dir, "embeddings"))


def q_mixing_null_model(spark, sf_dir):
    """Language mixing matrix vs its configuration-model null
    (algos/mixing.mixing_null_model) over the planted citation digraph:
    observed, expected = rowsum*colsum/M, and lift per label pair —
    full |labels|^2 grid, exact integer folds, one rounded division
    each."""
    from plato_spark.algos.mixing import mixing_null_model

    edges = q_reference_graph(spark, sf_dir)
    labels = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return mixing_null_model(edges, labels).select(
        F.col("src_label").alias("src_lang"),
        F.col("dst_label").alias("dst_lang"),
        "observed", "expected", "lift",
    )


def q_conversion_latency(spark, sf_dir):
    """Time-to-convert quantiles (asof_next matches -> histogram
    quantiles over exact integer microsecond gaps): the latency
    distribution behind the conversion-window choice (windowed_funnel's
    W and asof_next's cap stop being folklore)."""
    from plato_spark.functions.events import asof_next
    from plato_spark.functions.quantiles import histogram_quantiles

    m = asof_next(load_table(spark, sf_dir, "events"), window_s=None)
    return histogram_quantiles(
        m.where(F.col("conversion_id").isNotNull()), "gap_us",
        quantiles=(0.5, 0.9, 0.99), nbins=256,
    )


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
x AS (SELECT CAST(gap_us AS DOUBLE) AS x FROM mt),
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


def q_group_quantiles(spark, sf_dir):
    """Per-event-type histogram quantiles fully in-plan
    (functions/quantiles.group_quantiles): broadcast per-group stats
    instead of driver-collected scalars, group-partitioned cumulative
    window, the proven interpolation ladder."""
    from plato_spark.functions.quantiles import group_quantiles

    return group_quantiles(
        load_table(spark, sf_dir, "events"), "event_type", "value"
    )


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


def q_rec_coverage(spark, sf_dir):
    """Catalog coverage + exposure Gini of the co-purchase recommender
    (functions/recommend.rec_coverage): never-recommended items stay in
    the Gini denominator — leaving them out flatters every
    recommender."""
    from plato_spark.functions.recommend import rec_coverage

    inc = load_table(spark, sf_dir, "orders").join(
        load_table(spark, sf_dir, "lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(F.col("o_custkey").alias("user"),
             F.col("l_partkey").alias("item"))
    return rec_coverage(inc, k=5)


def q_frequent_triples(spark, sf_dir):
    """Frequent 3-itemsets over order baskets
    (functions/recommend.frequent_triples): one distributed Apriori
    round — candidates only from frequent pairs with the (y,z) closure
    check, three basket-keyed semi-joins for counting."""
    from plato_spark.functions.recommend import frequent_triples

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    return frequent_triples(li, min_support=2)


def q_event_trigrams(spark, sf_dir):
    """Behavioural event-type 3-grams (functions/events.event_trigrams):
    one per-user window with two leads, (ts, event_id)-pinned order,
    exact counts over <= |types|^3 groups."""
    from plato_spark.functions.events import event_trigrams

    return event_trigrams(load_table(spark, sf_dir, "events"))


def q_pagerank_concentration(spark, sf_dir):
    """Attention concentration of the citation PageRank: share of total
    rank mass held by the top-k vertices, k in (10, 100) — the
    hub-domination audit behind mixture balancing (if 100 docs hold
    half the attention, per-source caps matter).  The 6dp-rounded ranks
    are EXACT integers at 1e6 scale, so shares are integer sums with
    one division; top-k under the (rank DESC, id) total order."""
    pr = pagerank(q_reference_graph(spark, sf_dir), eps=0.0,
                  max_iters=PRC_ITERS, impl="join").select(
        "id", F.round(F.col("rank") * 1e6, 0).cast("long").alias("r6"))
    pr = pr.localCheckpoint(eager=True)
    tot = pr.agg(F.sum("r6").cast("long").alias("tot"))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("r6"), F.asc("id"))
    spark_k = spark.createDataFrame([(10,), (100,)], "k int")
    top = pr.orderBy(F.desc("r6"), F.asc("id")).limit(100).select(
        "r6", F.row_number().over(w).alias("rn"))
    return (
        spark_k.join(top, F.col("rn") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("r6").cast("long").alias("mass"))
        .crossJoin(F.broadcast(tot))
        .select("k", "mass", "tot",
                F.round((F.lit(100) * F.col("mass")) / F.col("tot"), 6)
                .alias("share_pct"))
    )


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


def q_centrality_rank_corr(spark, sf_dir):
    """Spearman-style rank agreement between total degree and directed
    PageRank on the citation digraph (algos/rankcorr.rank_correlation):
    does link structure add signal over the cheap statistic?  Ranks via
    the distributed dictionary rank on a composite int64 key (pinned
    (score DESC, id) order — documented tie deviation), exact BIGINT
    d^2 fold, one rounded division."""
    from plato_spark.algos.rankcorr import rank_correlation

    edges = q_reference_graph(spark, sf_dir)
    deg = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("score_u"))
    )
    pr = pagerank(edges, eps=0.0, max_iters=PRC_ITERS, impl="join").select(
        "id", F.round(F.col("rank") * 1e6, 0).cast("long").alias("score_u")
    )
    return rank_correlation(deg, pr)


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


def q_propensity_by_activity(spark, sf_dir):
    """Purchase propensity by activity bucket: users bucketed by the
    integer bit length of their event count (the deterministic log2
    discipline — never libm, never a global rank), per bucket the user
    count, buyers, and conversion share.  The 'do heavy users actually
    buy more?' read-out behind engagement-driven ranking.  Exact
    integers, one rounded division per bucket."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("purchases"),
    )
    return (
        per.groupBy(F.length(F.bin(F.col("n_events"))).cast("int")
                    .alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("users"),
             F.sum(F.when(F.col("purchases") > 0, 1).otherwise(0))
             .cast("long").alias("buyers"))
        .select("bucket", "users", "buyers",
                F.round((F.lit(100) * F.col("buyers")) / F.col("users"), 6)
                .alias("buyer_pct"))
    )


def q_dow_profile(spark, sf_dir):
    """Day-of-week seasonality (0 = Sunday): hourly_profile's weekly
    sibling, with the weekday computed as PURE integer arithmetic
    ((epoch_days + 4) % 7 — 1970-01-01 is a Thursday) because engines'
    dayofweek()/day-name functions disagree on origin and locale.
    Exact counts, one guarded division."""
    ev = load_table(spark, sf_dir, "events")
    dow = F.pmod(
        F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(86_400_000_000)) + 4, F.lit(7)).cast("int")
    g = ev.groupBy(dow.alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long").alias("n_views"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("n_purchases"),
    )
    return g.select(
        "dow", "n_events", "n_views", "n_purchases",
        F.when(F.col("n_views") > 0,
               F.round(F.col("n_purchases") / F.col("n_views"), 6))
        .alias("cvr"),
    )


def q_error_precursors(spark, sf_dir):
    """What users do immediately before an error: the lag-1 event-type
    distribution over error events (first-event-of-timeline errors
    count under 'none') — the triage signal behind interval_counts'
    window counts.  One per-user window lag pinned by (ts, event_id),
    exact counts, one rounded share division."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("event_type") == "error")
        .groupBy(F.coalesce("prev", F.lit("none")).alias("prev_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = p.agg(F.sum("n").cast("long").alias("tot"))
    return p.crossJoin(F.broadcast(tot)).select(
        "prev_type", "n",
        F.round((F.lit(100) * F.col("n")) / F.col("tot"), 6)
        .alias("share_pct"),
    )


def q_hourly_profile(spark, sf_dir):
    """Hour-of-day seasonality + conversion profile
    (functions/events.hourly_profile): <= 24 groups, exact counts, one
    guarded division."""
    from plato_spark.functions.events import hourly_profile

    return hourly_profile(load_table(spark, sf_dir, "events"))


def q_hll_incremental(spark, sf_dir):
    """Streaming per-type distinct-user HLL (streaming/hll_stream):
    three micro-batches max-merged into <= |groups| x 64 register rows
    — the IDEMPOTENT member of the streaming-monoid trilogy (replays
    re-max harmlessly, unlike additive CMS/degree/histogram state);
    read-out equals batch hll_user_cardinality verbatim (same
    oracle)."""
    import shutil
    import tempfile

    from plato_spark.streaming.hll_stream import (
        hll_state_estimate,
        merge_hll_batch,
        read_hll_state,
    )

    ev = load_table(spark, sf_dir, "events").persist()
    sd = tempfile.mkdtemp(prefix="plato_inchll_")
    try:
        for i in range(3):
            merge_hll_batch(
                ev.where(F.pmod(F.xxhash64("event_id"), F.lit(3)) == i),
                sd, epoch_id=i, group_col="event_type", id_col="user_id",
            )
        out = hll_state_estimate(
            read_hll_state(spark, sd), "event_type"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sd, ignore_errors=True)
        ev.unpersist()
    return out


def q_order_size_histogram(spark, sf_dir):
    """Lines-per-order distribution: (n_lines, n_orders) — the basket
    shape profile behind join fan-out estimates and the quadratic
    basket guards; one map-side-combined count-of-counts."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"))
    return per.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"))


def q_segment_mix(spark, sf_dir):
    """Customer market-segment mix per nation: (nation, segment,
    n_customers, pct within nation) — the demographic slice behind
    segment-targeted queries like Q3; broadcast nation dimension, a
    per-nation window over |segments| rows for the share.  Exact
    counts, one rounded division."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    g = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
    w = Window.partitionBy("nation")
    return g.select(
        "nation", "segment", "n_customers",
        F.round((F.lit(100) * F.col("n_customers"))
                / F.sum("n_customers").over(w), 6).alias("pct"),
    )


def q_discount_bands(spark, sf_dir):
    """Revenue profile by discount band (exact integer percent bands
    over l_discount*100): the pricing-policy read-out — how much
    revenue ships at each discount depth, and the per-band margin
    forgone (list price minus discounted).  Pure integer cents/unit
    folds, one rounded division per band."""
    li = load_table(spark, sf_dir, "lineitem")
    dc = F.round(F.col("l_discount") * 100, 0).cast("long")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    b = li.select(
        dc.alias("discount_pct"),
        pc.alias("pc"),
        (pc * (100 - dc)).alias("dp_u"),
    )
    g = b.groupBy("discount_pct").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("pc").cast("long").alias("list_c"),
        F.sum("dp_u").cast("long").alias("disc_u"),
    )
    return g.select(
        "discount_pct", "n_items",
        F.round(F.col("list_c") / F.lit(100.0), 2).alias("list_revenue"),
        F.round(F.col("disc_u") / F.lit(1e4), 2).alias("disc_revenue"),
        F.round((F.col("list_c") * F.lit(100) - F.col("disc_u"))
                / F.lit(1e4), 2).alias("forgone"),
    )


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H-Q5 shape (functions/relational.local_supplier_volume):
    same-nation customer+supplier revenue per region/nation over one
    order year — the two-dimension-path correlation join; supplier tag
    broadcast, customer on the shuffle, exact integer revenue."""
    from plato_spark.functions.relational import local_supplier_volume

    return local_supplier_volume(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_returned_items(spark, sf_dir):
    """TPC-H-Q10 shape (functions/relational.returned_items): top-20
    customers by returned (l_returnflag='R') revenue under the pinned
    (revenue DESC, custkey) total order — aggregate-then-top-k-then-
    broadcast-join; only 20 rows ever touch the customer dimension."""
    from plato_spark.functions.relational import returned_items

    return returned_items(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        k=20,
    )


def q_top_supplier(spark, sf_dir):
    """TPC-H-Q15 shape (functions/relational.top_supplier): max-revenue
    supplier(s) over 1996Q1 shipments, tie membership decided on EXACT
    integer revenue units (a float max would be partitioning-
    dependent)."""
    from plato_spark.functions.relational import top_supplier

    return top_supplier(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


def q_product_profit(spark, sf_dir):
    """TPC-H-Q9 shape adapted (functions/relational.product_profit):
    per (part type, order year) margin = discounted revenue minus
    qty x retail cost, both folded in ONE exact integer unit system;
    part shuffles like a fact (never broadcast at 100 TB)."""
    from plato_spark.functions.relational import product_profit

    return product_profit(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
    )


def q_small_qty_revenue(spark, sf_dir):
    """TPC-H-Q17 shape (functions/relational.small_qty_revenue): list
    revenue in lines below 20% of their part's average quantity — the
    correlated per-part-average rejoin with the band test as a pure
    integer cross-multiply (5*qty*n < sum), exact at any
    partitioning."""
    from plato_spark.functions.relational import small_qty_revenue

    return small_qty_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def q_dormant_customers(spark, sf_dir):
    """TPC-H-Q22 shape (functions/relational.dormant_customers):
    above-average-balance customers with no order since 2000-01-01,
    per nation — the scalar-broadcast compare (integer cross-multiply,
    no float mean) plus LEFT ANTI against the collapsed recent-order
    custkeys."""
    from plato_spark.functions.relational import dormant_customers

    return dormant_customers(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


def q_late_shipments(spark, sf_dir):
    """TPC-H-Q4 shape adapted (functions/relational.late_shipments):
    orders with >=1 line shipped >90 days after order date, per
    priority — the EXISTS-decorrelated LEFT SEMI join carrying a
    non-equi date predicate on the orderkey equi-key."""
    from plato_spark.functions.relational import late_shipments

    return late_shipments(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        grace_days=90,
    )


def q_customer_distribution(spark, sf_dir):
    """TPC-H-Q13 shape: orders-per-customer count-of-counts INCLUDING
    the zero-order customers (the left join is the point — a groupBy
    over orders alone can never produce the 0 bin, and the 0 bin is the
    business signal: registered-but-inactive accounts).  Distinct from
    order_size_histogram (lines per order).  One left join + two
    map-side-combined aggs, exact counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    per = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.sum(F.when(F.col("o_custkey").isNull(), 0).otherwise(1))
             .cast("long").alias("n_orders"))
    )
    return per.groupBy("n_orders").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"))


def q_knn_hubness(spark, sf_dir):
    """In-degree histogram of the k=10 kNN graph: (in_degree,
    n_vertices) — the HUBNESS read-out of the similarity structure.  A
    heavy right tail (a few vertices in everyone's top-10) is the
    classic ANN pathology: those hubs dominate retrieval and drown
    recall; the 0 bin (never anyone's neighbor — anti-hubs) is kept via
    a left join against the full vertex set, because 'how much of the
    graph is unreachable through kNN' is the other half of the signal.
    Composes the proven knn_graph kernel; two map-side-combined
    aggs."""
    from plato_spark.functions.recommend import knn_graph

    canon = part_cooccurrence_edges(spark, sf_dir, weighted=True)
    knn = knn_graph(canon, k=10)
    verts = (
        canon.select(F.col("src").alias("id"))
        .unionByName(canon.select(F.col("dst").alias("id")))
        .distinct()
    )
    ind = knn.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("ind"))
    per = verts.join(ind, "id", "left").select(
        F.coalesce(F.col("ind"), F.lit(0)).cast("long").alias("in_degree"))
    return per.groupBy("in_degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"))


def q_degree_mixing_matrix(spark, sf_dir):
    """Joint degree-degree edge distribution: (bucket_lo, bucket_hi,
    n_edges) over bit-length degree buckets (the deterministic log2
    discipline) — the MATRIX behind the assortativity scalar.  The
    scalar can be ~0 while the matrix shows structure (hubs wired to
    leaves AND to each other cancel); buckets are unordered
    (least/greatest) because canonical a<b says nothing about which
    endpoint is bigger.  One degree agg + two tag joins on the edge
    table's own keys."""
    canon = part_cooccurrence_edges(spark, sf_dir)
    sym = canon.unionByName(canon.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    e = (
        canon.join(deg.select(F.col("id").alias("sid"),
                              F.col("deg").alias("ds")),
                   F.col("src") == F.col("sid"))
        .join(deg.select(F.col("id").alias("did"),
                         F.col("deg").alias("dd")),
              F.col("dst") == F.col("did"))
    )
    bs = F.length(F.bin(F.col("ds"))).cast("int")
    bd = F.length(F.bin(F.col("dd"))).cast("int")
    return (
        e.select(F.least(bs, bd).alias("bucket_lo"),
                 F.greatest(bs, bd).alias("bucket_hi"))
        .groupBy("bucket_lo", "bucket_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )


def q_zipf_curve(spark, sf_dir):
    """Rank-frequency (Zipf) profile of the corpus vocabulary:
    (bucket, n_tokens, mass, mass_pct) over bit-length RANK buckets —
    how fast token mass decays down the frequency ranking, the
    complement of hapax_stats' frequency spectrum (that buckets by
    count; this buckets by rank, which is what Zipf's law is stated
    over).  The global rank rides the vid-encoder distributed
    dictionary rank (graph/edges.build_dictionary — range partition +
    per-partition offsets, never a single-partition window) on a
    composite STRING key whose ascending order IS (tf DESC, token ASC):
    lpad(10^12 - tf) || token."""
    from plato_spark.functions.text import TOKEN_RE
    from plato_spark.graph.edges import build_dictionary

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.regexp_extract_all(
            F.col("text"), F.lit(TOKEN_RE), F.lit(0))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    keyed = tf.select(
        "tf",
        F.concat(
            F.lpad((F.lit(10**12) - F.col("tf")).cast("string"), 13, "0"),
            F.col("token"),
        ).alias("vkey"),
    )
    d = build_dictionary(keyed.select("vkey"), 8)
    ranked = keyed.join(d, "vkey").select(
        "tf", (F.col("id") + 1).cast("long").alias("rank"))
    tot = ranked.agg(F.sum("tf").cast("long").alias("tot"))
    g = ranked.groupBy(
        F.length(F.bin(F.col("rank"))).cast("int").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
          F.sum("tf").cast("long").alias("mass"))
    return g.crossJoin(F.broadcast(tot)).select(
        "bucket", "n_tokens", "mass",
        F.round((F.lit(100) * F.col("mass")) / F.col("tot"), 6)
        .alias("mass_pct"),
    )


def q_session_gaps(spark, sf_dir):
    """Inter-session gap quantiles: time from a session's last event to
    the user's next session's first event, through the proven histogram
    quantile kernel over exact integer microseconds — the empirical
    basis for the 30-minute session timeout itself (the
    inter_event_gaps pick-the-knee discipline applied one level up:
    gaps far above 30 min say the timeout isn't splitting real
    visits)."""
    from pyspark.sql import Window

    from plato_spark.functions.quantiles import histogram_quantiles

    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                   "user_id")
        .agg(F.min("ts").alias("st"), F.max("ts").alias("en"))
    )
    w = Window.partitionBy("user_id").orderBy("st")
    # parquet ts is TIMESTAMP_NTZ; cast reinterprets for unix_micros.
    # Gaps convert to SECONDS before the kernel: multi-hour gaps in µs
    # are ~3e10 and a 6dp-rounded double needs 17 significant digits
    # there — past float64; in seconds the same rounding is exact.
    # Both engines divide the SAME exact integer by 1e6, so the IEEE
    # result is bit-identical.
    st_us = F.unix_micros(F.col("st").cast("timestamp"))
    en_us = F.unix_micros(F.col("en").cast("timestamp"))
    gaps = sess.select(
        "user_id",
        ((st_us - F.lag(en_us).over(w)).cast("double")
         / F.lit(1e6)).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    return histogram_quantiles(gaps, "gap_s",
                               quantiles=(0.5, 0.9, 0.99), nbins=256)


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


def q_props_stats(spark, sf_dir):
    """Typed extraction from the semi-structured event payload:
    from_json(props, 'k INT') — the JSON column is parsed ONCE into a
    typed struct JVM-side (never string-sliced per use), then per
    event type: rows, null-payload rows, exact integer sum/min/max of
    k.  The semi-structured operator class: at 100 TB the payload
    column dominates scan bytes, and the typed parse keeps everything
    in whole-stage codegen — no Python, no UDF."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k INT").alias("p"),
    ).select("event_type", F.col("p.k").cast("long").alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).cast("long")
        .alias("n_null"),
        F.sum("k").cast("long").alias("k_sum"),
        F.min("k").cast("long").alias("k_min"),
        F.max("k").cast("long").alias("k_max"),
    )


# pinned pivot columns: schema stability demands a FIXED list (a
# discovered pivot makes the output schema data-dependent — the driver
# contract and any downstream consumer would see schema drift)
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


def q_status_priority_cube(spark, sf_dir):
    """Order counts + exact revenue over CUBE(status, priority) — all
    four grouping sets in ONE pass (Spark expands the cube before the
    shuffle, so at 100 TB this is one Exchange, not four jobs).  lvl =
    GROUPING(status)*2 + GROUPING(priority) disambiguates real NULLs
    from subtotal rows, the revenue_rollup_totals discipline."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderstatus", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("pc"))
    return (
        base.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") * 2
             + F.grouping("o_orderpriority")).cast("int").alias("lvl"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("pc").cast("long").alias("rev_c"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "lvl", "n_orders",
            F.round(F.col("rev_c") / F.lit(100.0), 2).alias("revenue"),
        )
    )


def q_audience_overlap(spark, sf_dir):
    """Set algebra over event audiences: viewers INTERSECT buyers,
    viewers EXCEPT buyers, buyers EXCEPT viewers — the funnel-leak
    Venn as one 3-row read-out.  The point is the operator class:
    INTERSECT/EXCEPT compile to aggregate-based semi/anti plans over
    the deduped key sets (each side collapses to distinct user_ids
    BEFORE the set op — at 100 TB the events never meet each other
    row-to-row)."""
    ev = load_table(spark, sf_dir, "events")
    viewers = ev.where(F.col("event_type") == "view").select(
        "user_id").distinct()
    buyers = ev.where(F.col("event_type") == "purchase").select(
        "user_id").distinct()

    def _n(df, tag):
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_users")
                      ).select(F.lit(tag).alias("relation"), "n_users")

    return (
        _n(viewers.intersect(buyers), "view_and_buy")
        .unionByName(_n(viewers.subtract(buyers), "view_only"))
        .unionByName(_n(buyers.subtract(viewers), "buy_only"))
    )


def q_lang_rand_index(spark, sf_dir):
    """Rand index between LPA communities on the citation graph and
    the documents' language labels — EXTERNAL clustering evaluation as
    an oracle-checked row (does community structure recover language?
    — the pair-counting answer beside lang_modularity's edge-cut one).
    RI = (C(n,2) + 2·ΣC(nij,2) - ΣC(ai,2) - ΣC(bj,2)) / C(n,2) — every
    term an exact integer from the contingency table (pair counts via
    m(m-1) div 2), ONE final division.  Communities come from the same
    3-iteration LPA protocol the lpa row pins."""
    from plato_spark.graph.edges import canonicalize_undirected

    canon = canonicalize_undirected(q_reference_graph(spark, sf_dir))
    comm = label_propagation(symmetrize(canon), iterations=LPA_ITERS)
    lang = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "lang")
    j = comm.join(lang, "id")
    cells = j.groupBy("label", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("m"))
    c2 = lambda c: F.expr(f"({c} * ({c} - 1)) div 2")  # noqa: E731
    parts = cells.agg(
        F.sum("m").cast("long").alias("n"),
        F.count_distinct("label").cast("long").alias("n_communities"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.sum(c2("m")).cast("long").alias("cell2"),
    )
    rows2 = (cells.groupBy("label").agg(F.sum("m").alias("a"))
             .agg(F.sum(c2("a")).cast("long").alias("row2")))
    cols2 = (cells.groupBy("lang").agg(F.sum("m").alias("b"))
             .agg(F.sum(c2("b")).cast("long").alias("col2")))
    return (
        parts.crossJoin(F.broadcast(rows2)).crossJoin(F.broadcast(cols2))
        .select(
            "n", "n_communities", "n_langs",
            F.round(
                (F.expr("(n * (n - 1)) div 2") + 2 * F.col("cell2")
                 - F.col("row2") - F.col("col2"))
                / F.expr("(n * (n - 1)) div 2").cast("double"), 6)
            .alias("rand_index"),
        )
    )


def q_revenue_gini(spark, sf_dir):
    """Gini coefficient of per-customer order revenue (in exact cents)
    through the generalized value-histogram Gini kernel
    (graph/edges.gini_from_counts) — the whole-distribution inequality
    scalar beside revenue_concentration's top-k share; the only window
    runs over |distinct revenue values| rows."""
    from plato_spark.graph.edges import gini_from_counts

    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long").alias("cnt"))
    return gini_from_counts(per.select("cnt")).select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_cents"), "gini")


def q_friendship_paradox(spark, sf_dir):
    """The friendship-paradox magnitude in one row: mean degree 2E/V
    vs mean NEIGHBOR degree Σd²/Σd — your contacts have more contacts
    than you whenever the degree distribution has variance, and the
    ratio measures by how much (the sampling-bias warning for any
    neighbor-based estimator, e.g. GNN neighbor sampling).  Every term
    folds as exact integers; two divisions rounded 6dp."""
    canon = part_cooccurrence_edges(spark, sf_dir)
    sym = canon.unionByName(canon.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d"))
    return deg.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        (F.sum("d") / 2).cast("long").alias("e"),
        F.round(F.sum("d") / F.count(F.lit(1)), 6).alias("mean_deg"),
        F.round(F.sum(F.col("d") * F.col("d")) / F.sum("d"), 6)
        .alias("mean_nbr_deg"),
        F.round((F.sum(F.col("d") * F.col("d")) / F.sum("d"))
                / (F.sum("d") / F.count(F.lit(1))), 6).alias("paradox"),
    )


def q_error_conversion_impact(spark, sf_dir):
    """Do errors kill conversion?  Per has-error flag over 30-minute
    sessions: session count and the share that converts (contains a
    purchase) — the incident-impact read-out composed from the proven
    session windows; exact counts, one rounded division."""
    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                   "user_id")
        .agg(F.max(F.when(F.col("event_type") == "error", 1)
                   .otherwise(0)).alias("has_error"),
             F.max(F.when(F.col("event_type") == "purchase", 1)
                   .otherwise(0)).alias("has_purchase"))
    )
    return sess.groupBy("has_error").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("has_purchase").cast("long").alias("n_converted"),
        F.round((F.lit(100) * F.sum("has_purchase"))
                / F.count(F.lit(1)), 6).alias("conversion_pct"),
    )


def q_integrity_audit(spark, sf_dir):
    """Referential-integrity audit across the star schema's four FK
    paths — each relation's violation count via a LEFT ANTI join
    against the parent's collapsed keys.  Zeros ARE the signal (the
    audit passing), unlike an empty result; at 100 TB this is the
    standard pre-flight before trusting any join's row counts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")

    def _viol(child, fk, parent, pk, tag):
        bad = child.select(F.col(fk)).join(
            parent.select(F.col(pk).alias(fk)).distinct(), fk,
            "left_anti")
        return bad.agg(F.count(F.lit(1)).cast("long").alias("n_violations")
                       ).select(F.lit(tag).alias("relation"),
                                "n_violations")

    return (
        _viol(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(_viol(li, "l_partkey", p, "p_partkey",
                           "lineitem->part"))
        .unionByName(_viol(li, "l_suppkey", s, "s_suppkey",
                           "lineitem->supplier"))
        .unionByName(_viol(o, "o_custkey", c, "c_custkey",
                           "orders->customer"))
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


def q_priority_drift(spark, sf_dir):
    """Order-priority mix drift: per (year, priority) the share of that
    year's orders and its deviation from the priority's ALL-TIME share
    — is the urgent-order fraction creeping up.  Exact counts; the
    year share rides a per-year window over <= |priorities| rows, the
    all-time share a broadcast join; two rounded divisions."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("year"),
        "o_orderpriority")
    per = o.groupBy("year", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    overall = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("tn"))
    tot = o.count()
    w = Window.partitionBy("year")
    return (
        per.join(F.broadcast(overall), "o_orderpriority")
        .select(
            "year", F.col("o_orderpriority").alias("priority"), "n",
            F.round((F.lit(100) * F.col("n"))
                    / F.sum("n").over(w), 6).alias("share_pct"),
            F.round((F.lit(100) * F.col("n")) / F.sum("n").over(w)
                    - (F.lit(100) * F.col("tn")) / F.lit(float(tot)), 6)
            .alias("dev_pct"),
        )
    )


def q_lsh_recall(spark, sf_dir):
    """Recall@5 of hyperplane-LSH against the exact brute-force top-5 —
    the estimator-quality audit AS an oracle-checked query (BENCH
    carried this number; now the gate proves it): per query the hit
    count is an exact integer (left join exact->LSH on (query, nbr)),
    mean recall = sum_hits/(k·n_queries) and the worst query's floor
    are the only divisions.  Same deterministic Rademacher planes and
    k as the registered lsh_ann/ann_topk rows."""
    from plato_spark.functions.similarity import (
        brute_force_topk,
        lsh_bucketed_neighbors_portable,
    )

    emb = _emb_double(spark, sf_dir)
    ex = brute_force_topk(emb, k=5).select("query_id", "nbr_id")
    ls = lsh_bucketed_neighbors_portable(emb, k=5).select(
        F.col("query_id").alias("q2"), F.col("nbr_id").alias("n2"))
    per = (
        ex.join(ls, (F.col("query_id") == F.col("q2"))
                & (F.col("nbr_id") == F.col("n2")), "left")
        .groupBy("query_id")
        .agg(F.count("n2").cast("long").alias("hits"))
    )
    return per.agg(
        F.lit(5).cast("int").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("hits").cast("long").alias("sum_hits"),
        F.round(F.sum("hits") / (F.lit(5) * F.count(F.lit(1))), 6)
        .alias("mean_recall"),
        F.round(F.min("hits") / F.lit(5.0), 6).alias("min_recall"),
    )


def q_open_order_aging(spark, sf_dir):
    """Open-order (status 'O') age quantiles per priority, aged against
    the dataset's LAST order date (a broadcast scalar — never
    wall-clock now(), which would make the result time-dependent):
    the backlog-health read-out.  Exact integer day ages through the
    in-plan per-group quantile kernel."""
    from plato_spark.functions.quantiles import group_quantiles

    o = load_table(spark, sf_dir, "orders")
    now = o.agg(F.max("o_orderdate").alias("now_d"))
    aged = (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(now))
        .select("o_orderpriority",
                F.datediff(F.col("now_d"), F.col("o_orderdate"))
                .cast("double").alias("age_days"))
    )
    return group_quantiles(aged, "o_orderpriority", "age_days")


def q_supply_demand_balance(spark, sf_dir):
    """Per-nation supply/demand imbalance: quantity SHIPPED by the
    nation's suppliers vs quantity ORDERED by its customers, and the
    exact-integer-fed ratio — which nations are net exporters of this
    catalog.  The two quantities ride the two different dimension
    paths Q5 correlates (supplier tag broadcast onto lineitem;
    customer path through orders), aggregated independently and
    full-outer-merged per nation (a nation missing one side shows 0,
    not a dropped row)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    cus = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    supplied = (
        li.select("l_suppkey", qty.alias("q"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("q").cast("long").alias("supplied_qty"))
    )
    consumed = (
        li.select("l_orderkey", qty.alias("q"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.withColumnRenamed("n_name", "nation2")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("nation2").alias("nation"))
        .agg(F.sum("q").cast("long").alias("consumed_qty"))
    )
    j = supplied.join(consumed, "nation", "full_outer").select(
        "nation",
        F.coalesce("supplied_qty", F.lit(0)).cast("long")
        .alias("supplied_qty"),
        F.coalesce("consumed_qty", F.lit(0)).cast("long")
        .alias("consumed_qty"),
    )
    return j.select(
        "nation", "supplied_qty", "consumed_qty",
        F.when(F.col("consumed_qty") > 0,
               F.round(F.col("supplied_qty") / F.col("consumed_qty"), 6))
        .alias("supply_ratio"),
    )


def q_lcc_histogram(spark, sf_dir):
    """Local-clustering-coefficient distribution in 10 EXACT bins:
    bin = min((20·T) div (d·(d-1)), 9) — the rational 2T/(d(d-1)) is
    binned by INTEGER cross-multiply, so bin membership never rides a
    float (a 0.septillion-ulp lcc at a bin edge would otherwise flip
    between engines).  deg < 2 vertices land in bin 0 with lcc 0, the
    clustering_coefficient convention; lcc = 1.0 caps into bin 9.
    The shape statistic behind transitivity's single scalar."""
    from plato_spark.algos.triangles import _degrees, triangle_count

    canon = part_cooccurrence_edges(spark, sf_dir)
    tri = triangle_count(canon, per_vertex=True)
    deg = _degrees(canon)
    j = tri.join(deg, "id", "left")
    b = F.when(
        F.col("deg") >= 2,
        F.least(F.expr("(20 * triangles) div (deg * (deg - 1))"),
                F.lit(9)),
    ).otherwise(F.lit(0)).cast("int")
    return j.select(b.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"))


def q_revenue_growth(spark, sf_dir):
    """Year-over-year revenue growth per nation: exact integer yearly
    revenue with the growth ratio as the ONLY float op (lag window per
    nation over <= |years| rows — the bounded offsets-table role); the
    first year emits NULL growth, never a fake 0 (no prior year is not
    zero growth)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    per = (
        o.select("o_custkey",
                 F.year("o_orderdate").cast("int").alias("year"),
                 F.round(F.col("o_totalprice") * 100, 0).cast("long")
                 .alias("pc"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "year")
        .agg(F.sum("pc").cast("long").alias("rev_c"))
    )
    w = Window.partitionBy("nation").orderBy("year")
    prev = F.lag("rev_c").over(w)
    return per.select(
        "nation", "year",
        F.round(F.col("rev_c") / F.lit(100.0), 2).alias("revenue"),
        F.round((F.lit(100) * (F.col("rev_c") - prev)) / prev, 6)
        .alias("yoy_pct"),
    )


def q_lifetime_quantiles(spark, sf_dir):
    """User lifetime (first to last event) quantiles in seconds through
    the proven histogram kernel — the engagement-horizon read-out
    behind retention_cohorts' window choice.  Exact integer µs spans
    divided by 1e6 once (the session_gaps float64-precision
    lesson)."""
    from plato_spark.functions.quantiles import histogram_quantiles

    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    span = ev.groupBy("user_id").agg(
        ((F.max(ts_us) - F.min(ts_us)).cast("double") / F.lit(1e6))
        .alias("lifetime_s"))
    return histogram_quantiles(span, "lifetime_s",
                               quantiles=(0.5, 0.9, 0.99), nbins=256)


def q_event_grouping_sets(spark, sf_dir):
    """Custom GROUPING SETS — (type), (day), (type, day) — in ONE pass:
    the grouping-set operator class beyond ROLLUP/CUBE's fixed
    lattices (this set is NOT a rollup: it keeps both one-dimensional
    marginals but drops the grand total).  Spark expands all three
    sets before a single exchange; lvl = GROUPING bits
    disambiguate."""
    ev = load_table(spark, sf_dir, "events")
    ev.select("event_type",
              F.date_format("ts", "yyyy-MM-dd").alias("day")
              ).createOrReplaceTempView("ev_gs")
    return spark.sql("""
        SELECT event_type, day,
               CAST(grouping(event_type) * 2 + grouping(day) AS INT)
                 AS lvl,
               CAST(count(*) AS BIGINT) AS n
        FROM ev_gs
        GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
    """)


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


def q_cheapest_supplier(spark, sf_dir):
    """TPC-H-Q2 shape over the observed catalog: per part the supplier
    with the LOWEST observed unit price (min over exact integer 1e-4
    cents, ties to the smaller suppkey — a struct-min total order, one
    map-side-combined agg, no window).  The min rides (unit_u, suppkey)
    packed lexicographically; only the winners join the supplier
    dimension."""
    cat = _observed_catalog(spark, sf_dir)
    best = (
        cat.groupBy("l_partkey")
        .agg(F.min(F.struct("unit_u", "l_suppkey")).alias("m"))
        .select(F.col("l_partkey").alias("p_partkey"),
                F.col("m.l_suppkey").alias("s_suppkey"),
                F.col("m.unit_u").alias("unit_u"))
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name")
    # half-up to 4 decimals as an INTEGER op (engines' float round()
    # disagree on exact .5 ties — the trade_volume lesson)
    return best.join(s, "s_suppkey").select(
        "p_partkey", "s_suppkey", "s_name",
        (F.expr("(unit_u + 50) div 100").cast("long") / F.lit(1e4))
        .alias("unit_price"))


def q_dominant_suppliers(spark, sf_dir):
    """TPC-H-Q20 shape: suppliers holding an OUTSIZED share (> 1/8) of
    a part's total observed quantity — concentrated-supply risk, per
    supplier.  With ~100 active suppliers the fair share is ~1%, so
    1/8 flags a 12.5x overweight; a strict >1/2 majority never occurs
    in this near-uniform synthetic catalog (the 0-row lesson — a
    threshold that can't fire proves nothing).  The share test is a
    pure integer cross-multiply (8 * supplier_qty > part_total)
    against the part aggregate rejoined on its own partitioning."""
    cat = _observed_catalog(spark, sf_dir)
    per = cat.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").cast("long").alias("sq"))
    tot = per.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("sq").cast("long").alias("st"))
    dom = per.join(tot, F.col("l_partkey") == F.col("pk")).where(
        F.lit(8) * F.col("sq") > F.col("st"))
    return dom.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts_dominated"),
        F.sum("sq").cast("long").alias("qty_mass"))


def q_catalog_breadth(spark, sf_dir):
    """TPC-H-Q16 shape over the observed catalog: per brand the
    distinct suppliers, distinct parts, and observed (part, supplier)
    pair count — supply-base breadth.  Two count-distincts share ONE
    expand over the pair-deduped catalog; part tag joins on
    partkey."""
    cat = _observed_catalog(spark, sf_dir).select(
        "l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = cat.join(p, F.col("l_partkey") == F.col("p_partkey"))
    return j.groupBy("p_brand").agg(
        F.count_distinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.count_distinct("l_partkey").cast("long").alias("n_parts"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"))


def q_price_dispersion(spark, sf_dir):
    """Per-brand unit-price dispersion: how differently the same part
    sells across lines — (parts, parts with any spread, mean relative
    spread (max-min)/min).  Spread membership is decided on EXACT
    integer unit_u; the per-part ratio is the only float op, averaged
    per brand and rounded 6dp."""
    cat = _observed_catalog(spark, sf_dir)
    per = cat.groupBy("l_partkey").agg(
        F.min("unit_u").alias("lo"), F.max("unit_u").alias("hi"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = per.join(p, F.col("l_partkey") == F.col("p_partkey"))
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.when(F.col("hi") > F.col("lo"), 1).otherwise(0))
        .cast("long").alias("n_spread"),
        F.round(F.avg((F.col("hi") - F.col("lo")) / F.col("lo")), 6)
        .alias("mean_rel_spread"))


def q_source_entropy(spark, sf_dir):
    """Per-source token Shannon entropy in bits: H = log2(N) -
    (Σ c·log2 c)/N over the per-(source, token) counts — vocabulary
    RICHNESS where lang_concentration's Herfindahl reads dominance;
    the two disagree exactly when a source mixes a few heavy tokens
    with a long tail.  Counts are exact integers; the Σ c·log2 c fold
    is the only float sum and its reassociation error is ~V·ε relative
    (≈1e-11 here) — invisible at the 6dp rounding both engines
    apply."""
    from plato_spark.functions.text import TOKEN_RE

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.regexp_extract_all(
            F.col("text"), F.lit(TOKEN_RE), F.lit(0))).alias("token"))
    c = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    g = c.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("c") * F.log2(F.col("c"))).alias("s"),
    )
    return g.select(
        "source", "n_tokens", "vocab",
        F.round(F.log2(F.col("n_tokens")) - F.col("s") / F.col("n_tokens"),
                6).alias("entropy_bits"),
    )


def q_reorder_gaps(spark, sf_dir):
    """Repeat-purchase interval quantiles: days between a customer's
    consecutive orders through the proven histogram-quantile kernel —
    the replenishment-cycle read-out behind dormancy cutoffs (Q22's
    'since' parameter stops being folklore).  One per-customer window
    lag under the pinned (date, orderkey) order; exact integer day
    gaps."""
    from pyspark.sql import Window

    from plato_spark.functions.quantiles import histogram_quantiles

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("long").alias("day_i"))
    w = Window.partitionBy("o_custkey").orderBy("day_i", "o_orderkey")
    gaps = o.select(
        (F.col("day_i") - F.lag("day_i").over(w)).cast("double")
        .alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    return histogram_quantiles(gaps, "gap_days",
                               quantiles=(0.5, 0.9, 0.99), nbins=256)


def q_audience_jaccard(spark, sf_dir):
    """Pairwise Jaccard between event-type audiences: the full
    |types| x |types| overlap matrix generalizing audience_overlap's
    single Venn — which behaviours share users.  The pair universe
    comes from the type list itself (zero-intersection pairs emit 0 —
    the 0-row lesson); intersections ride ONE self-join of the deduped
    (user, type) incidence on user_id; exact integers, one division."""
    ev = load_table(spark, sf_dir, "events")
    inc = ev.select("user_id", F.col("event_type").alias("t")).distinct()
    marg = inc.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("m"))
    inter = (
        inc.alias("a")
        .join(inc.alias("b"),
              (F.col("a.user_id") == F.col("b.user_id"))
              & (F.col("a.t") < F.col("b.t")))
        .groupBy(F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
        .agg(F.count(F.lit(1)).cast("long").alias("nab"))
    )
    pairs = (
        marg.select(F.col("t").alias("ta"), F.col("m").alias("ma"))
        .join(marg.select(F.col("t").alias("tb"), F.col("m").alias("mb")),
              F.col("ta") < F.col("tb"))
    )
    return (
        pairs.join(inter, ["ta", "tb"], "left")
        .select(
            "ta", "tb",
            F.coalesce("nab", F.lit(0)).cast("long").alias("n_both"),
            "ma", "mb",
            F.round(F.coalesce("nab", F.lit(0))
                    / (F.col("ma") + F.col("mb")
                       - F.coalesce("nab", F.lit(0))), 6).alias("jaccard"),
        )
    )


MARKOV_ITERS = 8


def q_markov_stationary(spark, sf_dir):
    """Stationary distribution of the first-order event-type Markov
    chain: 8 power iterations x_{t+1} = x_t P from uniform over the
    measured transition matrix (functions/events.event_transitions
    counts; probabilities recomputed as the same exact n/rowsum
    division in both engines — never the 6dp-rounded prob column,
    which would compound).  PageRank's kernel on a |types|-state
    chain: every join is broadcast-scale, the oracle unrolls the same
    8 steps, and states nothing transitions INTO get explicit 0 mass
    via the left join (the zero-bin discipline)."""
    from plato_spark.functions.events import event_transitions

    tr = event_transitions(load_table(spark, sf_dir, "events")).select(
        "src_type", "dst_type", "n")
    rows = tr.groupBy("src_type").agg(F.sum("n").alias("rs"))
    P = tr.join(rows, "src_type").select(
        "src_type", "dst_type",
        (F.col("n") / F.col("rs")).alias("p")).persist()
    states = (
        P.select(F.col("src_type").alias("state"))
        .unionByName(P.select(F.col("dst_type").alias("state")))
        .distinct().persist()
    )
    ns = states.agg(F.count(F.lit(1)).cast("long").alias("k"))
    x = states.crossJoin(F.broadcast(ns)).select(
        "state", (F.lit(1.0) / F.col("k")).alias("w"))
    for _ in range(MARKOV_ITERS):
        step = (
            P.join(x, F.col("state") == F.col("src_type"))
            .groupBy(F.col("dst_type").alias("state2"))
            .agg(F.sum(F.col("w") * F.col("p")).alias("w2"))
        )
        x = states.join(step, F.col("state") == F.col("state2"), "left"
                        ).select("state",
                                 F.coalesce("w2", F.lit(0.0)).alias("w"))
    return x.select("state", F.round("w", 6).alias("w"))


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


def q_balance_deciles(spark, sf_dir):
    """Customer account-balance decile profile: per decile (0 =
    richest) the customer count and exact min/max/sum balance in cents.
    Deciles come from the vid-encoder DISTRIBUTED rank
    (graph/edges.build_dictionary on the rankcorr composite int64 key
    custkey - bal_c*2^24, whose ascending order IS (bal DESC, custkey))
    — never ntile(), which is an unpartitioned window = a global sort
    at 100 TB.  decile = (rank * 10) div n, one scalar broadcast."""
    from plato_spark.graph.edges import build_dictionary

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_c"))
    keyed = c.select(
        "bal_c",
        (F.col("c_custkey") - F.col("bal_c") * F.lit(1 << 24))
        .cast("long").alias("vkey"))
    d = build_dictionary(keyed.select("vkey"), 8)
    ranked = keyed.join(d, "vkey").select(
        "bal_c", F.col("id").alias("rank"))
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select("bal_c",
                F.expr("(rank * 10) div n").cast("int").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             F.min("bal_c").cast("long").alias("min_bal_c"),
             F.max("bal_c").cast("long").alias("max_bal_c"),
             F.sum("bal_c").cast("long").alias("sum_bal_c"))
    )


def q_trailing_revenue(spark, sf_dir):
    """7-day trailing order revenue per priority: per (priority, day)
    the day's exact revenue and the RANGE-framed trailing week — the
    smoothed demand curve.  The sliding aggregate runs over the
    PRE-AGGREGATED per-day table (<= |priorities| x |days| rows — the
    bounded offsets-table role), partitioned by priority, with a RANGE
    BETWEEN 6 PRECEDING frame on the integer epoch day: RANGE on exact
    ints has identical semantics in both engines and skips calendar
    gaps correctly where a ROWS frame would not."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    per = (
        o.select("o_orderpriority",
                 F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
                 .cast("long").alias("day_i"),
                 F.round(F.col("o_totalprice") * 100, 0).cast("long")
                 .alias("pc"))
        .groupBy("o_orderpriority", "day_i")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
             F.sum("pc").cast("long").alias("rev_c"))
    )
    w = (Window.partitionBy("o_orderpriority").orderBy("day_i")
         .rangeBetween(-6, 0))
    return per.select(
        F.col("o_orderpriority").alias("priority"), "day_i", "n_orders",
        F.round(F.col("rev_c") / F.lit(100.0), 2).alias("revenue"),
        F.round(F.sum("rev_c").over(w) / F.lit(100.0), 2)
        .alias("trailing_7d_revenue"),
    )


def q_shipping_latency(spark, sf_dir):
    """Order-to-first-shipment latency quantiles per priority: exact
    integer day gaps (min ship date per order minus order date) through
    the in-plan per-group histogram-quantile kernel — does paying for
    1-URGENT actually ship sooner?  One map-side-combined min per
    order + one orderkey join feed the proven group_quantiles chain."""
    from plato_spark.functions.quantiles import group_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    first = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship"))
    j = o.select("o_orderkey", "o_orderpriority", "o_orderdate").join(
        first, F.col("o_orderkey") == F.col("l_orderkey"))
    lead = j.select(
        "o_orderpriority",
        F.datediff(F.col("first_ship"), F.col("o_orderdate"))
        .cast("double").alias("lead_days"))
    return group_quantiles(lead, "o_orderpriority", "lead_days")


def q_edge_weight_spectrum(spark, sf_dir):
    """Co-occurrence edge-weight spectrum: per bit-length weight bucket
    the edge count and total weight mass — the evidence-strength shape
    of the weighted graph (a mass-heavy tail bucket says a few
    always-together pairs carry the graph; the degree histogram can't
    see that).  Weights are exact integer counts; one
    map-side-combined agg over the canonical edge table."""
    canon = part_cooccurrence_edges(spark, sf_dir, weighted=True)
    wgt = F.col("weight").cast("long")
    return (
        canon.select(F.length(F.bin(wgt)).cast("int").alias("bucket"),
                     wgt.alias("w"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"),
             F.sum("w").cast("long").alias("weight_mass"))
    )


def q_link_overlap(spark, sf_dir):
    """Overlap (hub-promoted) coefficient per linked pair
    (algos/triangles.neighborhood_similarity method='overlap'):
    |N(u)∩N(v)| / min(deg) — completes the link-score family
    (jaccard / adamic-adar / resource-allocation / preferential);
    containment-vs-resemblance for neighborhoods: a leaf inside a hub's
    neighborhood scores 1.0 where Jaccard dilutes it."""
    from plato_spark.algos.triangles import neighborhood_similarity

    return neighborhood_similarity(
        part_cooccurrence_edges(spark, sf_dir), method="overlap")


def q_densification_curve(spark, sf_dir):
    """Temporal graph growth: per day, CUMULATIVE distinct users and
    distinct (user, event_type) incidences — the densification read-out
    (do incidences grow superlinearly in vertices, the Leskovec
    densification-law question).  Cumulative-distinct never runs as a
    distinct-per-window: each entity contributes its FIRST-SEEN day
    (one map-side-combined min per key), then a running sum over the
    <=|days| day table — the bounded offsets-table role.  Day emits as
    yyyy-MM-dd text (the retention_cohorts portability lesson)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.to_date("ts").alias("d"))
    fu = (ev.groupBy("user_id").agg(F.min("d").alias("d"))
          .groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("nu")))
    fi = (ev.groupBy("user_id", "event_type").agg(F.min("d").alias("d"))
          .groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("ni")))
    days = ev.select("d").distinct()
    j = (days.join(fu, "d", "left").join(fi, "d", "left")
         .select("d", F.coalesce("nu", F.lit(0)).alias("nu"),
                 F.coalesce("ni", F.lit(0)).alias("ni")))
    w = (Window.orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return j.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.sum("nu").over(w).cast("long").alias("cum_users"),
        F.sum("ni").over(w).cast("long").alias("cum_incidences"),
    )


def q_segment_unpivot(spark, sf_dir):
    """UNPIVOT (melt) of the segment_pivot contingency back to long
    form: (nation, segment, n_customers) INCLUDING explicit zero cells
    — the operator-class complement of pivot (Spark's unpivot compiles
    to one Expand, no join, no shuffle beyond the pivot's own).
    Distinct from segment_mix, which only emits observed pairs."""
    piv = q_segment_pivot(spark, sf_dir)
    return piv.unpivot(
        "nation", [s.lower() for s in MKT_SEGMENTS],
        "segment", "n_customers",
    ).select("nation", F.upper(F.col("segment")).alias("segment"),
             F.col("n_customers").cast("long").alias("n_customers"))


def q_brand_size_lift(spark, sf_dir):
    """Brand x size-decile contingency with independence lift:
    observed count and n*N / (brand_total * size_total) — pairs with
    lift far from 1 are where the catalog's brand lines specialize by
    size.  Pure integer margins via two broadcast-scale rejoins of the
    cell table onto its own marginals; ONE float division, rounded
    6dp."""
    p = load_table(spark, sf_dir, "part").select(
        "p_brand",
        F.expr("(p_size - 1) div 10").cast("int").alias("size_bucket"))
    cells = p.groupBy("p_brand", "size_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    rb = cells.groupBy("p_brand").agg(
        F.sum("n").cast("long").alias("brand_total"))
    cs = cells.groupBy("size_bucket").agg(
        F.sum("n").cast("long").alias("size_total"))
    tot = cells.agg(F.sum("n").cast("long").alias("total"))
    return (
        cells.join(F.broadcast(rb), "p_brand")
        .join(F.broadcast(cs), "size_bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "p_brand", "size_bucket", "n", "brand_total", "size_total",
            F.round((F.col("n") * F.col("total")).cast("double")
                    / (F.col("brand_total") * F.col("size_total")), 6)
            .alias("lift"),
        )
    )


def q_trade_volume(spark, sf_dir):
    """TPC-H-Q7-shape nation-pair trade volume per ship year
    (functions/relational.trade_volume): the first lineitem-to-supplier
    join emitting the full cross-nation trade matrix, nation tags
    broadcast, exact integer revenue."""
    from plato_spark.functions.relational import trade_volume

    return trade_volume(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def q_blocklist_hits(spark, sf_dir):
    """Blocklist coverage audit per source (functions/text
    .blocklist_hits): JVM array-filter hit counts for a term list,
    zero Python, zero pre-agg shuffle."""
    from plato_spark.functions.text import blocklist_hits

    return blocklist_hits(load_table(spark, sf_dir, "documents"))


def q_strength_assortativity(spark, sf_dir):
    """Weighted (strength) assortativity of the co-occurrence graph
    (graph/edges.strength_assortativity): do heavily-evidenced vertices
    attach to each other? — the evidence-mass sibling of the
    degree-assortativity scalar, same zero-variance-NULL sufficient-
    statistics form."""
    from plato_spark.graph.edges import strength_assortativity

    return strength_assortativity(
        part_cooccurrence_edges(spark, sf_dir, weighted=True))


def q_instability(spark, sf_dir):
    """Martin instability I = fan_out/(fan_in+fan_out) per doc of the
    citation digraph (algos/citations.instability) — the
    code-architecture coupling audit; full doc table as the universe so
    isolated docs report (0,0,NULL)."""
    from plato_spark.algos.citations import instability

    edges = q_reference_graph(spark, sf_dir)
    verts = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"))
    return instability(edges, verts)


def q_weighted_sample(spark, sf_dir):
    """Deterministic weight-proportional document sample
    (functions/sampling.weighted_sample): Efraimidis-Spirakis A-ES with
    the portable hash as the fixed-granularity uniform, top-32 by
    n_chars weight, TakeOrdered under (priority, id)."""
    from plato_spark.functions.sampling import weighted_sample

    return weighted_sample(load_table(spark, sf_dir, "documents"), k=32)


def q_pca_second(spark, sf_dir):
    """Second principal component via integer Hotelling deflation
    (functions/similarity.pca_second): rank-1 term subtracted on the
    exact-integer ladder, then the same pinned power iteration."""
    from plato_spark.functions.similarity import pca_second

    return pca_second(load_table(spark, sf_dir, "embeddings"),
                      rounds=PCA_ROUNDS)


def q_pca_project(spark, sf_dir):
    """2-d principal-plane projection of every embedding
    (functions/similarity.pca_project): in-plan loading reassembly,
    order-fixed array-fold dot products, one 6dp round."""
    from plato_spark.functions.similarity import pca_project

    return pca_project(load_table(spark, sf_dir, "embeddings"),
                       rounds=PCA_ROUNDS)


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


def q_pca_plane_variance(spark, sf_dir):
    """Two-term scree read-out (functions/similarity.pca_plane_variance):
    Rayleigh quotients of both components vs the original gramian and
    the 2-d plane's variance share; lambda1 must equal pca_variance's
    lambda_top — a cross-operator consistency check the gate sees."""
    from plato_spark.functions.similarity import pca_plane_variance

    return pca_plane_variance(load_table(spark, sf_dir, "embeddings"),
                              rounds=PCA_ROUNDS)


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


def q_pca_variance(spark, sf_dir):
    """Rayleigh quotient + trace share of the top principal component
    (functions/similarity.pca_variance): down-scaled exact integer
    quadratic form, one rounded division per output."""
    from plato_spark.functions.similarity import pca_variance

    return pca_variance(load_table(spark, sf_dir, "embeddings"),
                        rounds=PCA_ROUNDS)


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


def q_active_users(spark, sf_dir):
    """DAU / trailing-7d / trailing-28d distinct active users per
    observed day (functions/events.active_users): distinct (day, user)
    pairs exploded to their <= 28 bounded target days — never a
    non-equi range join — one groupBy with conditional distincts."""
    from plato_spark.functions.events import active_users

    return active_users(load_table(spark, sf_dir, "events"))


def q_lang_concentration(spark, sf_dir):
    """Per-source Herfindahl language concentration
    (functions/text.lang_concentration): the entropy-free mixture
    scalar, exact integer cross-multiplication, one rounded division."""
    from plato_spark.functions.text import lang_concentration

    return lang_concentration(load_table(spark, sf_dir, "documents"))


LANG_VOCAB_K = 10


def q_lang_vocabulary(spark, sf_dir):
    """Top-10 tokens per language (functions/recommend.topk_per_key
    over per-(lang, token) counts): the per-language tokenizer/quality
    audit beside the global vocabulary head; partition-local rank under
    the (tf DESC, token) total order."""
    from plato_spark.functions.recommend import topk_per_key
    from plato_spark.functions.text import TOKEN_RE

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select("lang", F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return topk_per_key(
        tc, "lang", [F.col("tf").desc(), F.col("token").asc()],
        LANG_VOCAB_K,
    ).select("lang", "token", "tf", F.col("rank").cast("int").alias("rank"))


def q_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth over 8 deterministic hash batches
    (functions/text.vocab_growth): per-batch token mass, first-seen
    types, cumulative vocab — the tokenizer-freeze signal."""
    from plato_spark.functions.text import vocab_growth

    return vocab_growth(load_table(spark, sf_dir, "documents"), n_batches=8)


def q_vocab_coverage(spark, sf_dir):
    """Zipf head coverage (functions/text.vocab_coverage): share of the
    corpus token mass covered by the top-k types for k in (10, 100,
    1000) — the vocab-size decision read-out."""
    from plato_spark.functions.text import vocab_coverage

    return vocab_coverage(load_table(spark, sf_dir, "documents"))


def q_corpus_card(spark, sf_dir):
    """Dataset-card headline block (functions/text.corpus_card): docs,
    sources, langs, tokens, chars, dup rate, empties — one
    map-side-combined pass, digests-only dup fold."""
    from plato_spark.functions.text import corpus_card

    return corpus_card(load_table(spark, sf_dir, "documents"))


def q_lang_modularity(spark, sf_dir):
    """Newman modularity of the LANGUAGE partition on the citation
    support graph (algos/modularity.modularity with lang as the
    community) — the partition-quality scalar beside lang_conductance's
    per-class cuts and attr_assortativity's correlation: 'would
    splitting the corpus by language cut few citations?' answered in
    one exact-integer fold."""
    from plato_spark.algos.modularity import modularity
    from plato_spark.graph.edges import canonicalize_undirected

    canon = canonicalize_undirected(q_reference_graph(spark, sf_dir))
    labels = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.col("lang").alias("community"))
    return modularity(canon, labels)


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


def q_session_stats(spark, sf_dir):
    """Session-quality dashboard (functions/events.session_stats):
    bounce share, mean events, exact integer duration stats over the
    proven boundary-inclusive session_window rule."""
    from plato_spark.functions.events import session_stats

    return session_stats(load_table(spark, sf_dir, "events"))


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


def q_trimmed_mean(spark, sf_dir):
    """Per-type trimmed mean over the [p05, p95] quantile band
    (functions/quantiles.trimmed_mean): broadcast 6dp band edges, kept
    values fold as exact integer cents, one rounded division."""
    from plato_spark.functions.quantiles import trimmed_mean

    return trimmed_mean(load_table(spark, sf_dir, "events"),
                        "event_type", "value")


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


def q_mad_outliers(spark, sf_dir):
    """Median-absolute-deviation outliers per type
    (functions/quantiles.mad_outliers): the robust twin of
    value_outliers — histogram medians of value and |value - med|,
    exact integer counts."""
    from plato_spark.functions.quantiles import mad_outliers

    return mad_outliers(load_table(spark, sf_dir, "events"),
                        "event_type", "value")


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


def q_harmonic_exact(spark, sf_dir):
    """Exact per-root harmonic centrality over the shared pinned-root
    multi-source BFS (algos/closeness.harmonic_exact): integer L/d
    weight folds, one float division at read-out."""
    from plato_spark.algos.closeness import harmonic_exact

    return harmonic_exact(part_cooccurrence_edges(spark, sf_dir),
                          num_roots=64)


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


def q_mixture_apply(spark, sf_dir):
    """Per-document replication factors materializing the temperature
    mixture (functions/packing.mixture_apply): floor(boost) copies plus
    one more iff the portable doc hash falls under the exact-integer
    fractional threshold — deterministic at any partitioning."""
    from plato_spark.functions.packing import mixture_apply

    return mixture_apply(load_table(spark, sf_dir, "documents"))


def q_rate_spikes(spark, sf_dir):
    """Per-type hourly event counts flagged against the type's own rate
    distribution (functions/events.rate_spikes): value_outliers' z-score
    discipline keyed on time buckets, 6dp-pre-rounded mean/std, exact
    epoch-microsecond hours."""
    from plato_spark.functions.events import rate_spikes

    return rate_spikes(load_table(spark, sf_dir, "events"))


def q_revenue_concentration(spark, sf_dir):
    """Revenue concentration: share of total order value held by the
    top-k customers (k = 10, 100) — the whale-dependence audit
    (pagerank_concentration's business twin).  Exact integer cents,
    top-k under the (revenue DESC, custkey) total order, one division
    per k."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long").alias("rc"))
    tot = per.agg(F.sum("rc").cast("long").alias("tot"))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("rc"), F.asc("o_custkey"))
    top = per.orderBy(F.desc("rc"), F.asc("o_custkey")).limit(100).select(
        "rc", F.row_number().over(w).alias("rn"))
    ks = spark_k = top.sparkSession.createDataFrame([(10,), (100,)], "k int")
    return (
        ks.join(top, F.col("rn") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("rc").cast("long").alias("mass_cents"))
        .crossJoin(F.broadcast(tot))
        .select("k", "mass_cents", "tot",
                F.round((F.lit(100) * F.col("mass_cents")) / F.col("tot"), 6)
                .alias("share_pct"))
    )


def q_revenue_rollup_totals(spark, sf_dir):
    """Q5-shape revenue with ROLLUP grouping sets
    (functions/relational.revenue_rollup_totals): leaf + per-region
    subtotal + grand total in ONE Expand pass, grouping-id lvl column
    disambiguating subtotal NULLs."""
    from plato_spark.functions.relational import revenue_rollup_totals

    return revenue_rollup_totals(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_quantiles_incremental(spark, sf_dir):
    """Streaming fixed-bin histogram quantiles (streaming/hist_stream):
    events arrive as three micro-batches folded bin-wise into a
    constant-size (<= nbins rows) versioned state with epoch-tagged
    exactly-once commits; bin counts are an additive monoid, so the
    folded histogram — and hence the interpolated quantile read-out —
    equals the fixed-edge batch histogram of the union verbatim."""
    import shutil
    import tempfile

    from plato_spark.streaming.hist_stream import (
        merge_hist_batch,
        quantiles_from_state,
        read_hist_state,
    )

    ev = load_table(spark, sf_dir, "events").persist()
    sd = tempfile.mkdtemp(prefix="plato_inchist_")
    try:
        for i in range(3):
            merge_hist_batch(
                ev.where(F.pmod(F.xxhash64("event_id"), F.lit(3)) == i),
                sd, epoch_id=i, col="value", lo=0.0, hi=600.0, nbins=256,
            )
        out = quantiles_from_state(
            read_hist_state(spark, sd), lo=0.0, hi=600.0, nbins=256,
            quantiles=(0.5, 0.9, 0.99),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sd, ignore_errors=True)
        ev.unpersist()
    return out


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


def q_pq_ann(spark, sf_dir):
    """Product-quantization ANN (functions/pq): m=4 x 16-dim subspaces,
    16 codewords each, integer-nano ADC top-5 per vector."""
    from plato_spark.functions.pq import pq_ann

    return pq_ann(load_table(spark, sf_dir, "embeddings"),
                  m=4, k_c=16, lloyd_iters=2, k=5)


def q_copurchase(spark, sf_dir):
    """Item-to-item collaborative filtering: top-5 cosine co-purchase
    recommendations per part over the customer x part incidence
    (functions/recommend; basket cap 256)."""
    from plato_spark.functions.recommend import co_purchase_topk

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    inc = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).select(
        F.col("o_custkey").alias("user"), F.col("l_partkey").alias("item")
    )
    out = co_purchase_topk(inc, k=5, max_basket=256)
    return out.withColumn("score", F.round("score", 6))


def q_knn_graph(spark, sf_dir):
    """kNN sparsification of the weighted co-occurrence graph: each
    vertex keeps its 10 strongest edges (weight DESC, dst ASC)
    (functions/recommend.knn_graph)."""
    from plato_spark.functions.recommend import knn_graph

    return knn_graph(part_cooccurrence_edges(spark, sf_dir, weighted=True),
                     k=10)


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters over corpus tokens
    (functions/sketches; d=4 x w=64 portable-hash sketch) —
    (token, est_count) for tokens whose estimate reaches 50."""
    from plato_spark.functions.sketches import cms_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    return cms_heavy_hitters(docs, threshold=50, depth=4, width=64)


def q_msf(spark, sf_dir):
    """Borůvka minimum spanning forest under the unique total order
    (weight, src, dst) (algos/msf) — (src, dst, weight, msf_round)."""
    from plato_spark.algos.msf import boruvka_msf

    return boruvka_msf(part_cooccurrence_edges(spark, sf_dir, weighted=True))


def q_coloring(spark, sf_dir):
    """Deterministic Jones–Plassmann greedy coloring (unique hash
    priorities; algos/coloring) over the Borůvka spanning forest of the
    co-occurrence graph — (id, color, jp_round) per vertex.

    The forest (not the raw graph) is the fixture because JP's round
    count is the longest decreasing-priority path: on the dense
    co-occurrence cliques winners per round are ~V/(deg+1) (~17/round at
    sf0.01 → ~120 rounds), while the sparse forest converges in O(log V)
    (measured 9 rounds at sf0.01) — the regime the operator targets.
    """
    from plato_spark.algos.coloring import jones_plassmann_coloring
    from plato_spark.algos.msf import boruvka_msf

    forest = boruvka_msf(part_cooccurrence_edges(spark, sf_dir, weighted=True))
    return jones_plassmann_coloring(symmetrize(forest.select("src", "dst")))


def q_butterflies(spark, sf_dir):
    """Exact bipartite butterfly statistics over the order x part
    incidence (algos/butterflies) — one row of int64 motif counts."""
    from plato_spark.algos.butterflies import butterfly_stats

    inc = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    return butterfly_stats(inc, left="o", right="p")


def q_tfidf(spark, sf_dir):
    """Top-3 tf-idf keywords per document (raw-inverse-idf scoring so the
    value is exact integer arithmetic + one IEEE division)."""
    from plato_spark.functions.text import tfidf_keywords

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_keywords(docs, top_k=3)


def q_contamination(spark, sf_dir):
    """Benchmark-contamination scan: word-8-gram overlap between the
    training split and a deterministic held-out eval split
    (portable_h1('eval|'||doc_id) % 17 == 0 — ~6% of docs). The synthetic
    corpus rarely collides on 8-grams naturally, so a deterministic
    11-token "benchmark passage" (7 variants keyed by doc_id % 7) is
    planted into every eval doc and into train docs with doc_id % 13 == 0
    — mirrored verbatim in the oracle — giving the scan real leaked
    passages to find (4 internal 8-grams per planted pair). Returns the
    contaminated train docs with shared-shingle / eval-doc counts."""
    from plato_spark.functions.dedup import contamination_check
    from plato_spark.functions.text import portable_h1

    docs = load_table(spark, sf_dir, "documents")
    is_eval = (
        portable_h1(F.concat(F.lit("eval|"), F.col("doc_id").cast("string"))) % 17
        == 0
    )
    passage = F.concat(
        F.lit(" bench passage alpha beta gamma delta epsilon zeta eta theta v"),
        (F.col("doc_id") % 7).cast("string"),
    )
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(is_eval | (F.col("doc_id") % 13 == 0), passage)
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return contamination_check(
        planted.where(~is_eval), planted.where(is_eval), n=CONTAM_NGRAM
    )


def q_spread_behaviour(spark, sf_dir):
    """spread.cc list mode (example/spread.cc:718-760): per relation
    vertex, aggregate its neighbors' behaviour rows by behaviour id —
    relation graph = co-occurrence edges, behaviour table = events
    (user_id -> event_type, value)."""
    from plato_spark.algos.spread import spread_aggregate

    canon = part_cooccurrence_edges(spark, sf_dir)
    beh = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("id"), "event_type", "value"
    )
    return spread_aggregate(
        canon, beh, id_col="id", behaviour_col="event_type", sum_cols=("value",)
    )


def q_events_sessions(spark, sf_dir):
    """Batch session windows (native F.session_window; the streaming
    counterpart is plato_spark.streaming.sessionize_events). A session
    extends while consecutive events are <= 30 min apart — the window
    end is last_event + gap, boundary-INCLUSIVE, so an exactly-30-min
    gap still merges (proven by a peak_concurrency fixture; the oracle
    mirrors <=)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "value_sum")
    )


def q_common_neighbor_payload(spark, sf_dir):
    """Mutual with vertex payload: avg part retail price over each linked
    pair's common neighbors (example/mutual.cc vertex-data variant)."""
    canon = part_cooccurrence_edges(spark, sf_dir)
    payload = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_retailprice").alias("v")
    )
    return common_neighbor_payload(canon, payload, "v")


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering through the BUCKETED scale path: portable
    minhash-LSH candidates -> jaccard verify -> WCC -> keeper per doc.
    The oracle mirrors the banding itself (portable md5 family), so the
    approximate candidate set is value-checked, not just the verifier."""
    return near_dup_clusters(
        load_table(spark, sf_dir, "documents"), threshold=0.5,
        use_lsh=True, hash_impl="portable",
    )


def q_dedup_savings(spark, sf_dir):
    """One-row executive summary of the near-dup pass: docs kept vs
    dropped and the exact character mass reclaimed — the number the
    curation report leads with.  Composes dedup_apply with doc lengths;
    exact integers, one rounded division."""
    from plato_spark.functions.dedup import dedup_apply

    docs = load_table(spark, sf_dir, "documents")
    manifest = dedup_apply(docs, threshold=0.5, hash_impl="portable")
    j = manifest.join(
        docs.select(F.col("doc_id").alias("id"),
                    F.col("n_chars").cast("long").alias("nc")), "id")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long")
        .alias("kept"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).cast("long")
        .alias("dropped"),
        F.sum(F.when(~F.col("keep"), F.col("nc")).otherwise(F.lit(0)))
        .cast("long").alias("chars_reclaimed"),
    ).select(
        "n_docs", "kept", "dropped", "chars_reclaimed",
        F.round((F.lit(100) * F.col("dropped")) / F.col("n_docs"), 6)
        .alias("drop_pct"),
    )


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


def q_dup_cross_sources(spark, sf_dir):
    """Cross-source near-dup pair matrix: for every near-dup cluster,
    the member pairs counted by UNORDERED source pair — mirror-site /
    template duplication localized to container pairs (the
    cluster-level sibling of source_overlap's shingle containment).
    Cluster sizes bound the self-join; exact integer counts."""
    from plato_spark.functions.dedup import near_dup_clusters

    docs = load_table(spark, sf_dir, "documents")
    cl = near_dup_clusters(docs, threshold=0.5, use_lsh=True,
                           hash_impl="portable")
    m = cl.join(docs.select("doc_id", "source"), "doc_id").select(
        "keeper_id", "doc_id", "source")
    a = m.select("keeper_id", F.col("doc_id").alias("da"),
                 F.col("source").alias("sa"))
    b = m.select("keeper_id", F.col("doc_id").alias("db"),
                 F.col("source").alias("sb"))
    return (
        a.join(b, "keeper_id")
        .where(F.col("da") < F.col("db"))
        .groupBy(F.least("sa", "sb").alias("source_a"),
                 F.greatest("sa", "sb").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


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


def q_dedup_apply(spark, sf_dir):
    """Per-document keep/drop manifest from the near-dup clusters
    (functions/dedup.dedup_apply): keepers and singletons keep, dropped
    rows carry their keeper for provenance — the verdict table the
    curation pipeline actually filters on."""
    from plato_spark.functions.dedup import dedup_apply

    return dedup_apply(load_table(spark, sf_dir, "documents"),
                       threshold=0.5, hash_impl="portable")


def q_dedup_exact(spark, sf_dir):
    return exact_dedup(load_table(spark, sf_dir, "documents"))


def q_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count_col(F.col("text")).alias("n_tokens"))


def q_text_quality(spark, sf_dir):
    return text_quality(load_table(spark, sf_dir, "documents"))


def q_corpus_curation(spark, sf_dir):
    """Five-stage curation DAG (quality -> exact dedup -> LSH near-dup ->
    stratified sample -> split), the bucketed scale path end-to-end —
    value-checked because every hash is portable (functions/curation)."""
    from plato_spark.functions.curation import curate_corpus

    return curate_corpus(
        load_table(spark, sf_dir, "documents"),
        fractions={"en": 0.5, "zh": 1.0},
        default_fraction=0.25,
    )


def q_quality_filter(spark, sf_dir):
    """Training-data KEEP/DROP gate over the quality heuristics."""
    return quality_filter(load_table(spark, sf_dir, "documents"))


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language downsample (portable hash gate):
    keep 50% of en, 100% of zh, 25% of every other stratum."""
    return stratified_sample(
        load_table(spark, sf_dir, "documents"),
        strata_col="lang",
        fractions={"en": 0.5, "zh": 1.0},
        default_fraction=0.25,
    ).select("doc_id", "lang")


def q_hash_split(spark, sf_dir):
    """Deterministic disjoint train/val/test assignment (90/5/5)."""
    return hash_split(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "split"
    )


def q_lang_distribution(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5, n=3
    )


def _emb_double(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )


def q_similarity_threshold(spark, sf_dir):
    return threshold_neighbors(_emb_double(spark, sf_dir), threshold=0.8)


def q_minhash_candidates(spark, sf_dir):
    # portable hash family => value-checked against the DuckDB oracle;
    # the xxhash64 fast path is equivalence-tested in pytest
    return minhash_lsh_candidates(
        load_table(spark, sf_dir, "documents"), hash_impl="portable"
    )


def q_simhash(spark, sf_dir):
    return simhash_signatures_portable(load_table(spark, sf_dir, "documents"))


def q_simhash_dups(spark, sf_dir):
    """Banded simhash near-dup join (pigeonhole-exact recall at
    hamming <= 3); the oracle computes the all-pairs ground truth."""
    return simhash_near_dup_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=3
    )


def q_doc_fingerprint(spark, sf_dir):
    return doc_fingerprint(
        load_table(spark, sf_dir, "documents"), hash_impl="portable"
    )


def q_lang_id(spark, sf_dir):
    return lang_id_ngram(load_table(spark, sf_dir, "documents"))


def q_lsh_ann(spark, sf_dir):
    # deterministic Rademacher planes => the approximate result itself is
    # value-checked; the gaussian numpy-matmul variant stays pytest-covered
    return lsh_bucketed_neighbors_portable(_emb_double(spark, sf_dir), k=5)


def q_ann_topk(spark, sf_dir):
    return brute_force_topk(_emb_double(spark, sf_dir), k=5)


def q_ivf_ann(spark, sf_dir):
    return ivf_ann(
        _emb_double(spark, sf_dir), k=5, n_clusters=8, n_probe=2, lloyd_iters=2
    )


def q_embedding_dedup(spark, sf_dir):
    """Embedding near-dup clusters fed by LSH-bucketed candidates — the
    100TB-shape pipeline (no crossJoin of the vector table anywhere in the
    plan); the Rademacher planes make the candidate set itself
    oracle-reproducible. All-pairs mode stays pytest-covered as the exact
    recall baseline."""
    emb = _emb_double(spark, sf_dir)
    cands = lsh_candidate_pairs_portable(emb, num_planes=10, num_tables=3)
    return embedding_near_dup_clusters(emb, threshold=0.42, candidates=cands)


def q_kmeans_clusters(spark, sf_dir):
    """Deterministic k-means document clustering over the embedding
    column — the topic-bucketing / corpus-mixing step of a training-data
    pipeline (and the ivf_ann index build, here graded standalone)."""
    from plato_spark.functions.similarity import kmeans_clusters

    return kmeans_clusters(
        _emb_double(spark, sf_dir), n_clusters=8, lloyd_iters=2
    )


def q_embedding_project(spark, sf_dir):
    """Rademacher random projection 64d -> 16d (deterministic JL sketch;
    scale 0.25 is exact). The dimensionality-reduction step before
    clustering / ANN over very wide embedding columns.

    Gate shape: the library returns (vec_id, proj: array<double>), but
    the driver's pandas canonicalizer cannot sort/hash list cells (the
    one red row of round 3) — so this wrapper posexplodes the projection
    to one (vec_id, dim, value) row per coordinate.  dim=64 is passed so
    the plan stays action-free until the driver collects."""
    from plato_spark.functions.similarity import embedding_project

    proj = embedding_project(_emb_double(spark, sf_dir), out_dim=16, dim=64)
    return proj.select(
        "vec_id", F.posexplode("proj").alias("dim", "value")
    ).select("vec_id", F.col("dim").cast("int").alias("dim"), "value")


def q_chunk_dedup(spark, sf_dir):
    """Paragraph-grain exact dedup: duplicate fixed-token-window chunks
    across the corpus (boilerplate/mirror detection below document
    grain), with the token mass dedup would reclaim."""
    from plato_spark.functions.text import chunk_dedup_stats

    return chunk_dedup_stats(load_table(spark, sf_dir, "documents"))


SEEDED_LPA_ITERS = 3


def q_seeded_lpa(spark, sf_dir):
    """Semi-supervised label spreading (algos/lpa.seeded_label_propagation)
    on the symmetric co-occurrence graph: every 40th vertex is a clamped
    seed carrying label md5-hash(id) % 4; three deterministic vote rounds
    spread labels outward (smallest label on ties); unreached -> -1."""
    from plato_spark.algos.lpa import seeded_label_propagation
    from plato_spark.functions.text import portable_h1

    sym = _sym(spark, sf_dir)
    verts = sym.select(F.col("src").alias("id")).distinct()
    seeds = verts.where(F.col("id") % 40 == 0).select(
        "id",
        (portable_h1(F.concat(F.lit("seedlab|"), F.col("id").cast("string")))
         % 4).alias("label"),
    )
    return seeded_label_propagation(sym, seeds, iterations=SEEDED_LPA_ITERS)


def q_dedup_incremental(spark, sf_dir):
    """Incremental exact dedup (streaming/dedup_stream.merge_doc_batch):
    the corpus arrives as three micro-batches folded into a persisted
    bucketed digest index with per-bucket epoch-tagged exactly-once
    commits; keeper = min doc_id makes the final index order-independent,
    so the plain batch GROUP BY sha256 oracle applies verbatim."""
    import shutil
    import tempfile

    from plato_spark.streaming.dedup_stream import (
        merge_doc_batch,
        read_dedup_state,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    sd = tempfile.mkdtemp(prefix="plato_incdedup_")
    try:
        for i in range(3):
            merge_doc_batch(
                docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i),
                sd, epoch_id=i,
            )
        out = read_dedup_state(spark, sd).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(sd, ignore_errors=True)
        docs.unpersist()
    return out


def q_topo_levels(spark, sf_dir):
    """DAG longest-path levels (topological depth) on a PLANTED-TRUTH
    dependency DAG derived deterministically from the corpus: doc_ids
    are dense-ranked; rank r emits a chain edge r -> r+1 iff
    md5-parity sel(r), and a skip edge r -> r+2 iff sel(r) and sel(r+1)
    (skips add multi-predecessor joins without changing the longest
    path).  Ground truth is the run length: level(r) = r - start of r's
    maximal consecutive-sel run, which the oracle computes with one
    gaps-and-islands window — while the engine must genuinely relax the
    planted DAG to a fixpoint (depth = longest run, ~2*log2(n) rounds)."""
    from plato_spark.algos.dag import dag_levels
    from plato_spark.functions.text import portable_h1
    from plato_spark.graph.edges import build_dictionary

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("vkey")).distinct()
    )
    n = docs.count()
    d = build_dictionary(docs, 16)
    base = d.select(F.col("id").alias("r"))
    rr = F.col("r")

    def _sel(c):
        return portable_h1(F.concat(F.lit("topo|"), c.cast("string"))) % 2 == 0

    step = base.where(_sel(rr) & (rr + 1 < n)).select(
        rr.alias("src"), (rr + 1).cast("long").alias("dst")
    )
    skip = base.where(_sel(rr) & _sel(rr + 1) & (rr + 2 < n)).select(
        rr.alias("src"), (rr + 2).cast("long").alias("dst")
    )
    edges = step.unionByName(skip)
    verts = base.select(rr.alias("id"))
    return dag_levels(edges, vertices=verts).select("id", "level")


def q_sequence_packing(spark, sf_dir):
    """Concat-then-chunk packing manifest (functions/packing
    .sequence_packing): documents laid out in deterministic portable-
    hash order, the token stream cut every 512 tokens; per-doc chunk
    ranges as exact BIGINTs.  The prefix sum is DISTRIBUTED (32
    hash-range buckets, bucket-partitioned window) — the only single-
    partition window in the plan is over the 32-row bucket-offset
    table, never the corpus."""
    from plato_spark.functions.packing import sequence_packing

    return sequence_packing(load_table(spark, sf_dir, "documents"), budget=512)


def q_mixture_weights(spark, sf_dir):
    """Temperature-sampling mixture weights per source, alpha=0.5
    (functions/packing.mixture_weights) — exact-integer isqrt weights,
    one rounded division per ratio; one map-side-combined agg plus a
    broadcast 1-row total."""
    from plato_spark.functions.packing import mixture_weights

    return mixture_weights(load_table(spark, sf_dir, "documents"))


def q_snapshot_diff(spark, sf_dir):
    """Dataset snapshot diff (functions/packing.snapshot_diff): v2 is
    synthesized deterministically from the documents table (hash mod
    10: 0 -> removed, 1 -> text edited, 2 -> cloned under a new id);
    the diff joins (id, md5 digest) pairs only — bodies never
    shuffle."""
    from plato_spark.functions.packing import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    from plato_spark.functions.text import portable_h1

    m = F.pmod(
        portable_h1(F.concat(F.lit("diffv2|"), F.col("doc_id").cast("string"))),
        F.lit(10),
    )
    base = docs.withColumn("m", m)
    v2 = base.where(F.col("m") != 0).select(
        "doc_id",
        F.when(F.col("m") == 1, F.concat(F.col("text"), F.lit(" [v2]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = base.where(F.col("m") == 2).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" [new]")).alias("text"),
    )
    return snapshot_diff(docs, v2.unionByName(added))


def q_wcc_trace(spark, sf_dir):
    """Per-superstep WCC convergence trace (algos/wcc.wcc_trace): the
    north rule's iteration metrics — messages-sent bound (frontier) and
    delta (changed count) per round — as a first-class oracle-checkable
    table instead of log lines.  Exact integers; pinned at
    WCC_SQL_ITERS rounds (>= measured diameter), trailing rows (0, 0)."""
    from plato_spark.algos.wcc import wcc_trace

    return wcc_trace(part_cooccurrence_edges(spark, sf_dir), rounds=WCC_SQL_ITERS)


def q_onion_layers(spark, sf_dir):
    """Onion decomposition (algos/kcore.onion_layers): peel-layer index
    + coreness per vertex over the co-occurrence graph — the
    depth-inside-the-core structure the flat core number hides; exact
    integers, branch-free batch peel mirrored by the unrolled oracle."""
    from plato_spark.algos.kcore import onion_layers

    return onion_layers(part_cooccurrence_edges(spark, sf_dir))


def q_edge_betweenness(spark, sf_dir):
    """Girvan-Newman edge betweenness, sampled Brandes estimator
    (algos/betweenness.edge_betweenness_sampled) — the dependency
    accumulation re-keyed to DAG edges; high scores mark the
    inter-community bridges whose traffic a vertex-cut placement pays
    per superstep.  Same pinned 4-smallest-root policy as
    betweenness_sampled."""
    from plato_spark.algos.betweenness import edge_betweenness_sampled

    return edge_betweenness_sampled(
        part_cooccurrence_edges(spark, sf_dir), num_samples=4
    )


def q_ppr_sweep(spark, sf_dir):
    """Andersen-Chung-Lang local-clustering sweep
    (algos/local_cluster.ppr_sweep_cut): single-seed personalized
    PageRank (seed = smallest vertex, PPR_ITERS pinned supersteps)
    ordered by round(rank,6)/deg, with exact BIGINT prefix cut/volume
    and one rounded conductance division per sweep row — 'the community
    around THIS repo' without touching global labels."""
    from plato_spark.algos.local_cluster import ppr_sweep_cut

    sym = _sym(spark, sf_dir)
    seed = int(sym.agg(F.min("src")).collect()[0][0])
    r = personalized_pagerank(sym, sources=[seed], iterations=PPR_ITERS)
    return ppr_sweep_cut(part_cooccurrence_edges(spark, sf_dir), r, k=32)


def q_lang_conductance(spark, sf_dir):
    """Per-language conductance over the planted citation digraph
    (algos/mixing.attribute_conductance): cut / min-volume per lang
    class — the normalized cut-quality audit beside lang_mixing's raw
    off-diagonal counts and attr_assortativity's global scalar.  Exact
    BIGINT cut/volume folds, one rounded division per class."""
    from plato_spark.algos.mixing import attribute_conductance

    edges = q_reference_graph(spark, sf_dir)
    labels = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return attribute_conductance(edges, labels).select(
        F.col("label").alias("lang"), "cut_edges", "volume", "conductance"
    )


def q_asof_attribution(spark, sf_dir):
    """Backward as-of join (last-touch attribution): each purchase event
    matched to the user's latest view/click at or before it
    (functions/events.asof_attribution — tagged union + one running
    window, never a per-row inequality subquery; oracle is DuckDB's
    LATERAL top-1, a genuinely different plan)."""
    from plato_spark.functions.events import asof_attribution

    return asof_attribution(load_table(spark, sf_dir, "events"))


def q_interval_counts(spark, sf_dir):
    """Banded range join: per error event, the same user's view/click
    count in the strictly-preceding 10 minutes
    (functions/events.interval_counts — time-bucket equi-join with a
    2-bucket probe explode; oracle is the naive inequality join)."""
    from plato_spark.functions.events import interval_counts

    return interval_counts(load_table(spark, sf_dir, "events"), window_s=600)


def q_lsh_incremental(spark, sf_dir):
    """Incremental MinHash-LSH near-dup index
    (streaming/lsh_stream.merge_lsh_batch): the corpus arrives as three
    micro-batches folded into a persisted band-bucket membership index
    (idempotent distinct-union per bucket, epoch-tagged commits); the
    final state's self-join equals batch minhash_lsh_candidates over
    the union VERBATIM (telescoping invariant), so the unchanged batch
    oracle applies."""
    import shutil
    import tempfile

    from plato_spark.streaming.lsh_stream import (
        merge_lsh_batch,
        read_lsh_state,
        state_candidates,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    sd = tempfile.mkdtemp(prefix="plato_inclsh_")
    try:
        for i in range(3):
            merge_lsh_batch(
                docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i),
                sd, epoch_id=i, hash_impl="portable",
            )
        out = state_candidates(read_lsh_state(spark, sd)).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(sd, ignore_errors=True)
        docs.unpersist()
    return out


def q_burstiness(spark, sf_dir):
    """Goh-Barabasi burstiness B = (sigma-mu)/(sigma+mu) of per-user
    inter-event gaps (functions/events.burstiness): exact integer-second
    sufficient statistics, one IEEE op sequence, 6dp read-out."""
    from plato_spark.functions.events import burstiness

    return burstiness(load_table(spark, sf_dir, "events"))


def q_embedding_purity(spark, sf_dir):
    """Nearest-centroid classification purity of the embedding space
    (functions/similarity.embedding_purity): broadcast 6dp-pre-rounded
    label centroids, 9dp-rounded argmax sim with smallest-label ties,
    exact integer counts per true label."""
    from plato_spark.functions.similarity import embedding_purity

    return embedding_purity(load_table(spark, sf_dir, "embeddings"))


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


def q_peak_concurrency(spark, sf_dir):
    """Max simultaneously-open sessions + earliest attaining timestamp
    (functions/events.peak_concurrency): session_window sessions, the
    +1/-1 sweep collapsed to order-independent per-ts aggregates, and
    the sequence_packing distributed prefix sum over time buckets."""
    from plato_spark.functions.events import peak_concurrency

    return peak_concurrency(load_table(spark, sf_dir, "events"))


def q_silhouette(spark, sf_dir):
    """Per-label simplified (centroid-based) silhouette
    (functions/similarity.silhouette): 6dp-pre-rounded centroids,
    9dp-rounded cosines, exact-integer mean accumulation (s * 1e9 as
    BIGINT), one IEEE division per label."""
    from plato_spark.functions.similarity import silhouette

    return silhouette(load_table(spark, sf_dir, "embeddings"))


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


def q_norm_quantiles(spark, sf_dir):
    """Embedding L2-norm distribution (p50/p90/p99 via the histogram
    kernel): the health check before cosine ANN — wildly varying norms
    mean dot-product shortcuts and IVF assignments quietly disagree
    with cosine.  Norms are per-row array folds (sequential,
    engine-fixed order — the embedding_project precedent) rounded 6dp
    before binning."""
    from plato_spark.functions.quantiles import histogram_quantiles

    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        F.round(
            F.sqrt(F.aggregate(
                F.transform("embedding", lambda x: x.cast("double")),
                F.lit(0.0), lambda acc, x: acc + x * x)),
            6,
        ).alias("nrm")
    )
    return histogram_quantiles(norms, "nrm", quantiles=(0.5, 0.9, 0.99),
                               nbins=256)


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


def q_pca_component(spark, sf_dir):
    """Top principal component of the embedding space
    (functions/similarity.pca_component): exact-integer gramian fold +
    integer-disciplined power iteration, PCA_ROUNDS pinned rounds."""
    from plato_spark.functions.similarity import pca_component

    return pca_component(load_table(spark, sf_dir, "embeddings"),
                         rounds=PCA_ROUNDS)


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


def q_ivf_recall(spark, sf_dir):
    """Recall@5 of the IVF index against the exact-cosine baseline, per
    query — measure-don't-guess promoted to a first-class oracle row:
    hits = |ivf top-5 ∩ brute top-5| as exact integers (the BENCH recall
    sweep's gate-checkable sibling)."""
    from plato_spark.functions.similarity import brute_force_topk, ivf_ann

    emb = _emb_double(spark, sf_dir)
    bf = brute_force_topk(emb, k=5).select("query_id", "nbr_id")
    iv = ivf_ann(emb, k=5, n_clusters=8, n_probe=2, lloyd_iters=2).select(
        "query_id", "nbr_id"
    )
    hits = (
        bf.join(iv, ["query_id", "nbr_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        bf.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select("query_id",
                F.coalesce("hits", F.lit(0)).cast("long").alias("hits"))
    )


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


def q_centroid_similarity(spark, sf_dir):
    """Pairwise cosine between per-label embedding centroids
    (functions/similarity.label_centroid_similarity): 6dp-pre-rounded
    per-dimension means, one deterministic cosine per label pair —
    the cluster-separation audit of the embedding space."""
    from plato_spark.functions.similarity import label_centroid_similarity

    return label_centroid_similarity(load_table(spark, sf_dir, "embeddings"))


def q_zorder_key(spark, sf_dir):
    """Morton/Z-order layout key over (user_id, absolute-hour) for the
    event stream (functions/layout.zorder_key): the write-time
    clustering order whose footer stats prune scans on EITHER filter
    dimension; pure exact bit arithmetic, shuffle-free."""
    from plato_spark.functions.layout import zorder_key

    ev = load_table(spark, sf_dir, "events")
    return zorder_key(
        ev, "event_id",
        F.col("user_id"),
        F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(3_600_000_000)),
        bits=16,
    ).select(F.col("id").alias("event_id"), "z")


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


def q_bpe_compression(spark, sf_dir):
    """Corpus compression curve of the first BPE_MERGES BPE merges
    (functions/bpe.bpe_compression): occurrence-weighted symbol count
    per round, round 0 = character baseline."""
    from plato_spark.functions.bpe import bpe_compression

    return bpe_compression(load_table(spark, sf_dir, "documents"),
                           merges=BPE_MERGES)


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
        + f"\nSELECT id, round(x, 6) AS f FROM x{iters} ORDER BY id"
    )


FUNNEL_WINDOW_S = 86400


def q_windowed_funnel(spark, sf_dir):
    """view -> click -> purchase funnel with a 1-day conversion window
    per step (functions/events.funnel_counts window_s): the constraint
    every product funnel ships with, exact integer-microsecond bounds."""
    from plato_spark.functions.events import funnel_counts

    return funnel_counts(
        load_table(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        window_s=FUNNEL_WINDOW_S,
    )


def q_postings(spark, sf_dir):
    """Positional inverted-index postings for the top-20 corpus tokens
    (functions/text.inverted_postings): TakeOrdered vocabulary head +
    broadcast semi-join back against the token stream."""
    from plato_spark.functions.text import inverted_postings

    return inverted_postings(load_table(spark, sf_dir, "documents"),
                             top_k=20)


def q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix: the n-gram classifier's prediction
    (functions/text.lang_id_ngram — already oracle-checked per doc)
    cross-tabulated against the planted lang label; exact counts."""
    from plato_spark.functions.text import lang_id_ngram

    docs = load_table(spark, sf_dir, "documents")
    pred = lang_id_ngram(docs)
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


DIFF_ALPHA = 0.5
DIFF_ROUNDS = 8


def q_attr_diffusion(spark, sf_dir):
    """Doc-length feature diffusion over the symmetrized citation graph
    (algos/diffusion.attribute_diffusion): K-round (1-a)x0 + a*mean
    neighbor smoothing — the regression sibling of label spreading and
    the closed form of an untrained mean-aggregation GCN."""
    from plato_spark.algos.diffusion import attribute_diffusion

    cg = q_reference_graph(spark, sf_dir).select("src", "dst")
    sym = cg.unionByName(
        cg.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    attrs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.col("n_chars").alias("x0")
    )
    return attribute_diffusion(sym, attrs, alpha=DIFF_ALPHA,
                               rounds=DIFF_ROUNDS)


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


def q_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of the exact-cosine and IVF neighbor lists
    (functions/similarity.rrf_fusion): rank-only channel combination,
    fused top-5 per query under the raw-score total order."""
    from plato_spark.functions.similarity import (
        brute_force_topk,
        ivf_ann,
        rrf_fusion,
    )

    emb = _emb_double(spark, sf_dir)
    return rrf_fusion(
        [brute_force_topk(emb, k=5),
         ivf_ann(emb, k=5, n_clusters=8, n_probe=2, lloyd_iters=2)],
        k=5,
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


def q_hitting_time(spark, sf_dir):
    """Sarkar-Moore truncated hitting time to the HIT_SEEDS smallest
    vertices (algos/hitting.truncated_hitting_time): HIT_ROUNDS pinned
    Jacobi supersteps, 6dp read-out — the random-walk proximity
    complement of personalized PageRank."""
    from plato_spark.algos.hitting import truncated_hitting_time

    sym = _sym(spark, sf_dir)
    seeds = [
        r["id"]
        for r in sym.select(F.col("src").alias("id")).distinct()
        .orderBy("id").limit(HIT_SEEDS).collect()
    ]
    return truncated_hitting_time(sym, seeds, rounds=HIT_ROUNDS)


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


def q_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-shape top-10 unshipped-revenue orders for the BUILDING
    segment (functions/relational.shipping_priority): broadcast
    segment-filtered customers, exact integer revenue folds,
    TakeOrderedAndProject under a total order."""
    from plato_spark.functions.relational import shipping_priority

    return shipping_priority(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
    )


SIMRANK_K = 32
SIMRANK_ITERS = 5


def q_simrank(spark, sf_dir):
    """SimRank structural similarity among the SIMRANK_K highest-degree
    vertices over their induced subgraph (algos/simrank.simrank_topk):
    the seeded production shape of the inherently-quadratic pair
    iteration, SIMRANK_ITERS pinned rounds, 6dp read-out round."""
    from plato_spark.algos.simrank import simrank_topk

    return simrank_topk(_sym(spark, sf_dir), k=SIMRANK_K,
                        iters=SIMRANK_ITERS)


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


def q_bpe_merges(spark, sf_dir):
    """First BPE_MERGES BPE merge rules learned over the corpus
    (functions/bpe.bpe_merges): Zipf-collapsed distinct-word loop,
    JVM-only pair counting + positional merge, TakeOrdered-1 per round
    under the (count DESC, a, b) total order; self-pairs excluded so
    the merge is a branch-free positional map on both engines."""
    from plato_spark.functions.bpe import bpe_merges

    return bpe_merges(load_table(spark, sf_dir, "documents"), merges=BPE_MERGES)


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


def q_pagerank_trace(spark, sf_dir):
    """Per-superstep PageRank convergence trace
    (algos/pagerank.pagerank_trace): changed-count + max-delta per round
    from the 6dp-pre-rounded rank vectors — the float-fixpoint sibling
    of wcc_trace, PR_ITERS pinned rounds."""
    from plato_spark.algos.pagerank import pagerank_trace

    return pagerank_trace(_sym(spark, sf_dir), rounds=PR_ITERS)


def q_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shape pricing summary over lineitem: exact integer-cents
    folds at scales 1e2/1e4/1e6, one rounded IEEE division per average
    (functions/relational.pricing_summary)."""
    from plato_spark.functions.relational import pricing_summary

    return pricing_summary(load_table(spark, sf_dir, "lineitem"))


def q_large_orders(spark, sf_dir):
    """TPC-H-Q18-shape large-quantity orders
    (functions/relational.large_orders): map-side-combined per-order
    quantity fold, HAVING filter to a tiny qualifying set, then only
    the SMALL side ever broadcasts — against orders, then against
    customer (never the reverse)."""
    from plato_spark.functions.relational import large_orders

    return large_orders(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
    )


def q_promo_revenue(spark, sf_dir):
    """TPC-H-Q14-shape promo revenue share per ship month
    (functions/relational.promo_revenue): broadcast part dimension,
    exact integer cents x discount-unit folds, one rounded IEEE
    division per month."""
    from plato_spark.functions.relational import promo_revenue

    return promo_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


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


def q_scan_clusters(spark, sf_dir):
    """SCAN structural clustering (algos/scan, Xu et al. KDD'07) on the
    planted-community fixture: exact-integer ε-similarity (no sqrt —
    rational ε, squared comparison), hash-min components over the
    core-core ε-subgraph, pinned min-cluster border attachment, and the
    hub/outlier read-out Louvain and LPA cannot give.  ε = 3/5, μ = 3."""
    from plato_spark.algos.scan import scan_clusters

    return scan_clusters(_scan_planted_edges(spark, sf_dir),
                         eps_num=3, eps_den=5, mu=3)


def q_forman_curvature(spark, sf_dir):
    """Per-edge augmented Forman-Ricci curvature (algos/curvature):
    4 - deg(u) - deg(v) + 3*triangles(e) — the discrete-geometry read
    of edge role (negative = inter-community traffic edge, positive =
    triangle-wrapped intra-community edge) at one common-neighbor join
    instead of all-sources Brandes.  All-integer output, no division."""
    from plato_spark.algos.curvature import forman_curvature

    return forman_curvature(part_cooccurrence_edges(spark, sf_dir))


def q_vertex_cover(spark, sf_dir):
    """Matching-based 2-approximate vertex cover with in-row
    certificates (algos/matching.vertex_cover_stats): n_uncovered = 0
    certifies coverage, n_matched lower-bounds the optimum, approx_ratio
    = cover/lower <= 2.  The oracle re-derives the cover from the
    identical unrolled hash-priority matching chain."""
    from plato_spark.algos.matching import vertex_cover_stats

    return vertex_cover_stats(part_cooccurrence_edges(spark, sf_dir))


def q_out_of_order_stats(spark, sf_dir):
    """Per-user event-stream disorder audit: with event_id as arrival
    order (the deterministic stand-in for ingestion sequence), an event
    is LATE when its timestamp precedes the running max over everything
    that arrived before it.  Reports n_events, n_late, max lateness
    (exact epoch-micro integers) and the late fraction — the number
    that sizes a streaming watermark: allowedLateness must exceed the
    observed max_lateness_us to avoid dropping these rows.  One window
    pass (partitioned by user — never a global sort) + one agg."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    flagged = ev.select(
        "user_id", "ts_us", F.max("ts_us").over(w).alias("pm"))
    late = F.when(F.col("pm") > F.col("ts_us"), 1).otherwise(0)
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(late).cast("long").alias("n_late"),
        F.coalesce(
            F.max(F.when(F.col("pm") > F.col("ts_us"),
                         F.col("pm") - F.col("ts_us"))),
            F.lit(0)).cast("long").alias("max_lateness_us"),
    ).select(
        "user_id", "n_events", "n_late", "max_lateness_us",
        F.round(F.col("n_late") / F.col("n_events"), 6).alias("late_frac"),
    )


def q_pq_recall(spark, sf_dir):
    """Recall@5 of the PQ/ADC index against the METRIC-MATCHED exact
    baseline — integer-micro squared L2 (similarity.brute_force_l2_topk,
    order-free polarization identity), not cosine, so the row measures
    quantization loss alone.  Completes the recall family next to
    ivf_recall and lsh_recall: every ANN index in the repo now carries a
    gate-checked recall number."""
    from plato_spark.functions.pq import pq_ann
    from plato_spark.functions.similarity import brute_force_l2_topk

    emb = load_table(spark, sf_dir, "embeddings")
    bf = brute_force_l2_topk(emb, k=5).select("query_id", "nbr_id")
    pq = pq_ann(emb, m=4, k_c=16, lloyd_iters=2, k=5).select(
        "query_id", "nbr_id")
    hits = (
        bf.join(pq, ["query_id", "nbr_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        bf.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select("query_id",
                F.coalesce("hits", F.lit(0)).cast("long").alias("hits"))
    )


MATRYOSHKA_DIMS = 16


def q_matryoshka_recall(spark, sf_dir):
    """Recall@5 of PREFIX-dimension search (first 16 of 64 dims) vs the
    full-dimension exact cosine top-5 — the matryoshka/truncation
    question ('how much index do the first dims buy?') as a
    gate-checked number.  Queries are a ~10% hash-picked sample
    (portable md5), the scale shape: at 100 TB the sampled-query recall
    audit is O(|Q| x N) instead of O(N^2)."""
    from plato_spark.functions.similarity import brute_force_topk
    from plato_spark.functions.text import portable_h1

    emb = _emb_double(spark, sf_dir)
    qs = emb.where(F.pmod(
        portable_h1(F.concat(F.lit("mat|"),
                             F.col("vec_id").cast("string"))),
        F.lit(10)) == 0)
    full = brute_force_topk(emb, k=5, queries=qs).select(
        "query_id", "nbr_id")
    pe = emb.select(
        "vec_id", F.slice("embedding", 1, MATRYOSHKA_DIMS)
        .alias("embedding"))
    pq_ = qs.select(
        "vec_id", F.slice("embedding", 1, MATRYOSHKA_DIMS)
        .alias("embedding"))
    pref = brute_force_topk(pe, k=5, queries=pq_).select(
        "query_id", "nbr_id")
    hits = (
        full.join(pref, ["query_id", "nbr_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        full.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select("query_id",
                F.coalesce("hits", F.lit(0)).cast("long").alias("hits"))
    )


def q_wedge_closure(spark, sf_dir):
    """Temporal triadic closure on the co-activity graph: open wedges
    (two users sharing an early-half neighbor but not linked) that CLOSE
    in the late half, against the base rate of new-edge formation over
    all unlinked early pairs — the Granovetter closure hypothesis as a
    lift number.  Split at the exact integer epoch-micros midpoint (the
    coactivity_churn discipline); exact integer counts, divisions only
    in the three read-out rates.  Wedge enumeration rides the
    clique-guarded co-activity extraction (max_bucket caps the degree),
    the standard triangle-join shape."""
    from plato_spark.functions.events import co_activity_edges
    from plato_spark.graph.edges import symmetrize

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = ev.agg(F.min(us).alias("mn"), F.max(us).alias("mx")).select(
        F.expr("(mn + mx) div 2").alias("mid"))
    tagged = ev.crossJoin(F.broadcast(bounds))
    ea = co_activity_edges(tagged.where(us < F.col("mid"))) \
        .select("src", "dst").persist()
    eb = co_activity_edges(tagged.where(us >= F.col("mid"))) \
        .select("src", "dst").persist()
    syma = symmetrize(ea)
    lu = syma.select(F.col("src").alias("v"), F.col("dst").alias("src"))
    lw = syma.select(F.col("src").alias("v"), F.col("dst").alias("dst"))
    wedge = (
        lu.join(lw, "v")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst").distinct()
    )
    open_pairs = wedge.join(ea, ["src", "dst"], "left_anti").persist()
    n_open = open_pairs.count()
    n_closed = open_pairs.join(eb, ["src", "dst"], "semi").count()
    n_verts = syma.select("src").distinct().count()
    # all unlinked early-vertex pairs, and the late edges they gained
    eb_within = (
        eb.join(ea.select(F.col("src").alias("id")).unionByName(
            ea.select(F.col("dst").alias("id"))).distinct()
            .withColumnRenamed("id", "src"), "src", "semi")
        .join(ea.select(F.col("src").alias("id")).unionByName(
            ea.select(F.col("dst").alias("id"))).distinct()
            .withColumnRenamed("id", "dst"), "dst", "semi")
        .join(ea, ["src", "dst"], "left_anti")
    )
    n_new = eb_within.count()
    n_ea = ea.count()
    cand = n_verts * (n_verts - 1) // 2 - n_ea
    base = spark.createDataFrame(
        [(n_open, n_closed, cand, n_new)],
        "open_wedge_pairs long, closed_pairs long, "
        "candidate_pairs long, new_edges long")
    rate = F.when(F.col("open_wedge_pairs") > 0,
                  F.round(F.col("closed_pairs")
                          / F.col("open_wedge_pairs"), 6))
    brate = F.when(F.col("candidate_pairs") > 0,
                   F.round(F.col("new_edges")
                           / F.col("candidate_pairs"), 6))
    return base.select(
        "*", rate.alias("closure_rate"), brate.alias("base_rate"),
        F.when((F.col("open_wedge_pairs") > 0) & (F.col("new_edges") > 0)
               & (F.col("candidate_pairs") > 0),
               F.round((F.col("closed_pairs") * F.col("candidate_pairs"))
                       / (F.col("open_wedge_pairs") * F.col("new_edges")),
                       6)).alias("closure_lift"))


def q_nation_arpu(spark, sf_dir):
    """Average revenue per customer BY NATION — the per-capita view the
    raw rollup hides (a big nation with many idle customers can out-
    revenue a small engaged one while losing per head).  Exact cents,
    customer counts from the dimension (idle customers stay in the
    denominator), one division per nation."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("cents"))
    per = (
        c.select("c_custkey", "c_nationkey")
        .join(rev.withColumnRenamed("o_custkey", "c_custkey"),
              "c_custkey", "left")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             F.sum(F.coalesce("cents", F.lit(0))).cast("long")
             .alias("revenue_cents"))
    )
    return per.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nationkey"),
                             "n_name")), "c_nationkey"
    ).select(
        F.col("c_nationkey").alias("nationkey"), "n_name",
        "n_customers", "revenue_cents",
        F.round(F.col("revenue_cents") / F.col("n_customers") / 100, 6)
        .alias("arpu"))


def q_first_day_conversion(spark, sf_dir):
    """Activation audit: how many users convert (purchase) on their
    FIRST active day — the onboarding-funnel headline.  Exact integer
    day comparison (min day per user vs purchase days), one row, one
    division."""
    ev = load_table(spark, sf_dir, "events")
    d = F.datediff(F.col("ts").cast("date"),
                   F.lit("1970-01-01").cast("date")).cast("long")
    days = ev.select("user_id", d.alias("d"),
                     (F.col("event_type") == "purchase").alias("p"))
    first = days.groupBy("user_id").agg(F.min("d").alias("fd"))
    conv = (
        days.where("p")
        .join(first, "user_id")
        .where(F.col("d") == F.col("fd"))
        .select("user_id").distinct()
    )
    n_users = first.count()
    n_conv = conv.count()
    out = spark.createDataFrame(
        [(n_users, n_conv)], "n_users long, n_first_day_converts long")
    return out.select(
        "*",
        F.round(F.col("n_first_day_converts") / F.col("n_users"), 6)
        .alias("first_day_conversion"))


def q_linenumber_audit(spark, sf_dir):
    """Line-number integrity of orders: l_linenumber should be a dense
    1..k sequence per order — violations (max != count, or duplicates
    collapsing the distinct count) flag partial deletes / double
    ingestion.  One grouped pass, exact counts, one rounded ratio."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("l_linenumber").cast("long").alias("nd"),
        F.max("l_linenumber").cast("long").alias("mx"),
        F.min("l_linenumber").cast("long").alias("mn"))
    bad = (F.col("mx") != F.col("n")) | (F.col("nd") != F.col("n")) \
        | (F.col("mn") != 1)
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(bad.cast("int")).cast("long").alias("n_violations"),
    ).select(
        "*",
        F.round(F.col("n_violations") / F.col("n_orders"), 6)
        .alias("violation_rate"))


def q_supplier_brand_focus(spark, sf_dir):
    """Per-supplier brand specialization: the Herfindahl concentration
    of each supplier's line volume over part brands (the entropy-free
    mixture scalar, lang_concentration's business twin) — 1.0 = single-
    brand specialist, 1/n_brands = perfectly diversified.  Exact
    integer cross-multiplication, ONE division per supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p.select(
        F.col("p_partkey").alias("l_partkey"), "p_brand")), "l_partkey")
    per = j.groupBy("l_suppkey", "p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    return per.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.sum("c").cast("long").alias("n_lines"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    ).select(
        "l_suppkey", "n_brands", "n_lines",
        F.round(F.col("ss") / (F.col("n_lines") * F.col("n_lines")), 6)
        .alias("hhi"))


def q_coreness_degree_corr(spark, sf_dir):
    """Spearman rank correlation between coreness and degree — the
    'is the core decomposition just degree in disguise?' audit (a rank
    correlation near 1 says a cheap degree cut would partition as well
    as the full peel).  Exact integer identity over deterministic
    (value, id) total-order ranks; the oracle nests the proven unrolled
    h-index kcore chain."""
    from pyspark.sql import Window
    from plato_spark.graph.edges import symmetrize

    canon = part_cooccurrence_edges(spark, sf_dir)
    cores = kcore(canon)
    deg = symmetrize(canon).groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    j = cores.join(deg, "id")
    wa = Window.orderBy(F.col("coreness").asc(), F.col("id").asc())
    wb = Window.orderBy(F.col("deg").asc(), F.col("id").asc())
    ranked = j.select(
        "id",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"))
    n = j.count()
    agg = ranked.agg(
        F.sum((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")))
        .cast("long").alias("d2"))
    return agg.select(
        F.lit(n).cast("long").alias("n_vertices"),
        "d2",
        F.round(1 - 6 * F.col("d2")
                / F.lit(float(n) * (n * n - 1)), 6).alias("spearman"))


def q_circuit_rank(spark, sf_dir):
    """Circuit rank (cyclomatic number) m - n + c of the co-occurrence
    graph — the dimension of its cycle space: 0 certifies a forest,
    and the number is exactly how many edges any spanning forest leaves
    out (the independent-cycle budget behind bridge/backbone reasoning).
    Three exact counts (edges, vertices, hash-min components), pure
    integer arithmetic."""
    from plato_spark.algos.wcc import connected_components
    from plato_spark.graph.edges import symmetrize

    canon = part_cooccurrence_edges(spark, sf_dir).persist()
    m = canon.count()
    comp = connected_components(symmetrize(canon))
    n = comp.count()
    c = comp.select("component").distinct().count()
    out = spark.createDataFrame(
        [(m, n, c)], "n_edges long, n_vertices long, n_components long")
    return out.select(
        "*",
        (F.col("n_edges") - F.col("n_vertices")
         + F.col("n_components")).cast("long").alias("circuit_rank"))


def q_token_length_profile(spark, sf_dir):
    """Per-source token-length fingerprint: token count, exact mean
    length (sum of lengths / count — two integer folds), the longest
    token, and the share of long tokens (> 10 chars) — the
    tokenizer-fertility prior (long-token-heavy sources fragment into
    more subwords)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.regexp_extract_all(
            "text", F.lit("[A-Za-z0-9_]+"), F.lit(0))).alias("t"))
    per = toks.select("source", F.length("t").cast("long").alias("l"))
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("l").cast("long").alias("total_chars"),
        F.max("l").cast("long").alias("max_len"),
        F.sum(F.when(F.col("l") > 10, 1).otherwise(0)).cast("long")
        .alias("n_long"),
    ).select(
        "source", "n_tokens", "total_chars", "max_len", "n_long",
        F.round(F.col("total_chars") / F.col("n_tokens"), 6)
        .alias("mean_len"),
        F.round(F.col("n_long") / F.col("n_tokens"), 6)
        .alias("long_frac"))


def q_monthly_profile(spark, sf_dir):
    """Calendar-month seasonality of orders (the month-of-year slot
    beside dow_profile and hourly_profile): per month 1-12, order
    count, exact cents revenue, and each month's share of both — the
    seasonality prior behind inventory and the deseasonalized trend
    reads."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(
        F.month(F.col("o_orderdate").cast("date")).cast("int")
        .alias("month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("revenue_cents"))
    tot = per.agg(F.sum("n_orders").alias("no"),
                  F.sum("revenue_cents").alias("rc"))
    return per.crossJoin(F.broadcast(tot)).select(
        "month", "n_orders", "revenue_cents",
        F.round(F.col("n_orders") / F.col("no"), 6).alias("order_share"),
        F.round(F.col("revenue_cents") / F.col("rc"), 6)
        .alias("revenue_share"))


def q_daily_error_rate(spark, sf_dir):
    """Per-day error pressure of the event stream: events, errors and
    the exact error rate per calendar day — the ops dashboard row the
    rate_spikes detector thresholds.  Integer day index (epoch days),
    one division, days without events absent."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(
        F.datediff(F.col("ts").cast("date"),
                   F.lit("1970-01-01").cast("date"))
        .cast("long").alias("day_i")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long").alias("n_errors"))
    return per.select(
        "day_i", "n_events", "n_errors",
        F.round(F.col("n_errors") / F.col("n_events"), 6)
        .alias("error_rate"))


def q_tax_incidence(spark, sf_dir):
    """Tax-rate incidence rollup — the one lineitem column (l_tax) with
    no cut of its own until now: per integer tax band (rate x 100),
    line counts, taxable base and collected tax in EXACT integer
    cent-percent units (base_cents x tax_units — no float tax math),
    plus each band's share of total collections."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(
        F.round(F.col("l_tax") * 100, 0).cast("long").alias("tax_pct")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("base_cents"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")
              * F.round(F.col("l_tax") * 100, 0).cast("long"))
        .cast("long").alias("collected_cpct"))
    tot = per.agg(F.sum("collected_cpct").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "tax_pct", "n_lines", "base_cents", "collected_cpct",
        F.when(F.col("t") > 0,
               F.round(F.col("collected_cpct") / F.col("t"), 6))
        .alias("collection_share"))


def q_lineitem_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation over the four lineitem numerics
    (quantity, extendedprice, discount, tax) — discount_qty_corr's
    single pair generalized to the full matrix, every moment an exact
    integer fold (values lifted to integer units) with float entering
    only at the two correctly-rounded sqrts and one division per pair.
    The feature-redundancy screen before any modeling."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = {
        "quantity": F.col("l_quantity").cast("long"),
        "extendedprice": F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long"),
        "discount": F.round(F.col("l_discount") * 100, 0).cast("long"),
        "tax": F.round(F.col("l_tax") * 100, 0).cast("long"),
    }
    v = li.select(*[e.alias(k) for k, e in cols.items()])
    names = list(cols)
    # decimal(38) folds: n * sum(x^2) overflows int64 at cent scale
    # (6e4 rows x 1e14 per-row squares already ~6e18)
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast(dec).alias("n")]
    for k in names:
        aggs.append(F.sum(F.col(k)).cast(dec).alias(f"s_{k}"))
        aggs.append(F.sum(F.col(k).cast(dec) * F.col(k))
                    .alias(f"ss_{k}"))
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            aggs.append(F.sum(F.col(a).cast(dec) * F.col(b))
                        .alias(f"sp_{a}_{b}"))
    m = v.agg(*aggs)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            num = F.col("n") * F.col(f"sp_{a}_{b}") \
                - F.col(f"s_{a}") * F.col(f"s_{b}")
            va = F.col("n") * F.col(f"ss_{a}") \
                - F.col(f"s_{a}") * F.col(f"s_{a}")
            vb = F.col("n") * F.col(f"ss_{b}") \
                - F.col(f"s_{b}") * F.col(f"s_{b}")
            rows.append(m.select(
                F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                F.round(num.cast("double")
                        / F.sqrt(va.cast("double") * vb.cast("double")),
                        6).alias("pearson")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def q_algebraic_connectivity(spark, sf_dir):
    """Algebraic-connectivity (lambda_2) estimate: the Rayleigh
    quotient x^T L x / x^T x of the Fiedler coordinate the spectral
    chain already computes — x^T L x = sum over canonical edges of
    (x_u - x_v)^2, so both folds are EXACT integers once the
    6dp-rounded coordinate is lifted to 1e-6 units; one division.  The
    how-partitionable scalar behind the spectral-bisection sweep
    (higher = better connected = worse cuts)."""
    coords = q_spectral_coord(spark, sf_dir).select(
        "id", F.round(F.col("f") * 1_000_000, 0).cast("long").alias("xi"))
    canon = part_cooccurrence_edges(spark, sf_dir)
    xu = coords.select(F.col("id").alias("src"), F.col("xi").alias("xu"))
    xv = coords.select(F.col("id").alias("dst"), F.col("xi").alias("xv"))
    xlx = canon.join(xu, "src").join(xv, "dst").agg(
        F.sum((F.col("xu") - F.col("xv")) * (F.col("xu") - F.col("xv")))
        .cast("long").alias("xlx")).collect()[0]["xlx"]
    xx = coords.agg(F.sum(F.col("xi") * F.col("xi")).cast("long")
                    .alias("xx")).collect()[0]["xx"]
    out = spark.createDataFrame(
        [(int(xlx), int(xx))], "xlx_micro2 long, xx_micro2 long")
    return out.select(
        "*",
        F.round(F.col("xlx_micro2") / F.col("xx_micro2"), 6)
        .alias("lambda2_est"))


def q_bracket_balance(spark, sf_dir):
    """Per-source bracket/quote hygiene: docs whose parentheses don't
    balance (open != close counts) or whose double-quote count is odd —
    the extraction-damage detector (truncated docs, stripped markup).
    Exact regex counts, one rounded ratio."""
    docs = load_table(spark, sf_dir, "documents")

    def n(pat):
        return F.size(F.regexp_extract_all("text", F.lit(pat),
                                           F.lit(0))).cast("long")

    per = docs.select(
        "source",
        (n(r"\(") != n(r"\)")).cast("int").alias("paren_bad"),
        (F.pmod(n("\""), F.lit(2)) == 1).cast("int").alias("quote_bad"))
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("paren_bad").cast("long").alias("n_unbalanced_paren"),
        F.sum("quote_bad").cast("long").alias("n_odd_quotes"),
    ).select(
        "*",
        F.round((F.col("n_unbalanced_paren") + F.col("n_odd_quotes"))
                / F.col("n_docs"), 6).alias("damage_rate"))


def q_ptype_revenue(spark, sf_dir):
    """Revenue rollup over the part TYPE tier (the one part dimension
    column without its own cut): broadcast part join, exact integer
    cents, per-tier share with one division each."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p.select(
        F.col("p_partkey").alias("l_partkey"), "p_type")), "l_partkey")
    per = j.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("cents"))
    tot = per.agg(F.sum("cents").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "p_type", "n_lines", F.col("cents").alias("revenue_cents"),
        F.round(F.col("cents") / F.col("total"), 6).alias("share"))


def q_triangle_participation(spark, sf_dir):
    """One row — triangle participation: how many vertices sit in at
    least one triangle (and the rate) next to the triangle count.  The
    clustering summary between transitivity's global ratio and the
    per-vertex lcc table; exact integers + one division."""
    canon = part_cooccurrence_edges(spark, sf_dir)
    ab = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ac = canon.select(F.col("src").alias("a2"), F.col("dst").alias("c"))
    bc = canon.select(F.col("src").alias("b2"), F.col("dst").alias("c2"))
    tri = (
        ab.join(ac, F.col("a") == F.col("a2"))
        .join(bc, (F.col("b") == F.col("b2"))
              & (F.col("c") == F.col("c2")))
        .select("a", "b", "c").persist()
    )
    n_tri = tri.count()
    corners = tri.select(F.col("a").alias("id")).unionByName(
        tri.select(F.col("b").alias("id"))).unionByName(
        tri.select(F.col("c").alias("id"))).distinct()
    n_in = corners.count()
    verts = canon.select(F.col("src").alias("id")).unionByName(
        canon.select(F.col("dst").alias("id"))).distinct()
    n_v = verts.count()
    out = spark.createDataFrame(
        [(n_v, n_in, n_tri)],
        "n_vertices long, n_in_triangle long, n_triangles long")
    return out.select(
        "*",
        F.round(F.col("n_in_triangle") / F.col("n_vertices"), 6)
        .alias("participation"))


def q_supplier_rank_corr(spark, sf_dir):
    """Spearman rank correlation between supplier account balance and
    shipped revenue — does the balance sheet predict the order book? —
    through the exact integer identity rho = 1 - 6*sum(d^2)/(n(n^2-1))
    over deterministic total-order ranks (value, then suppkey — the
    centrality_rank_corr tie discipline).  One row, all-integer folds,
    one division."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("cents"))
    j = s.select("s_suppkey",
                 F.round(F.col("s_acctbal") * 100, 0).cast("long")
                 .alias("bal")).join(rev, "s_suppkey")
    wa = Window.orderBy(F.col("bal").asc(), F.col("s_suppkey").asc())
    wb = Window.orderBy(F.col("cents").asc(), F.col("s_suppkey").asc())
    ranked = j.select(
        "s_suppkey",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"))
    n = j.count()
    agg = ranked.agg(
        F.sum((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")))
        .cast("long").alias("d2"))
    return agg.select(
        F.lit(n).cast("long").alias("n_suppliers"),
        "d2",
        F.round(1 - 6 * F.col("d2")
                / F.lit(float(n) * (n * n - 1)), 6).alias("spearman"))


def q_supplier_percentile(spark, sf_dir):
    """Each supplier's revenue percentile WITHIN its nation —
    percent_rank = (rank-1)/(n-1), an EXACT rational from two window
    integers (the one window statistic that needs no quantile math at
    all), ties sharing a rank under (revenue, suppkey) total order
    broken deterministically.  The cross-nation league table."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per = li.groupBy("l_suppkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("cents"))
    j = per.join(s.select(F.col("s_suppkey").alias("l_suppkey"),
                          "s_nationkey"), "l_suppkey")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("cents").asc(), F.col("l_suppkey").asc())
    return j.select(
        F.col("l_suppkey").alias("s_suppkey"), "s_nationkey", "cents",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"))


def q_gini_mean_difference(spark, sf_dir):
    """Gini mean difference of order values — the robust dispersion
    metric E|X - X'| — WITHOUT the O(n^2) pair join: over values sorted
    ascending, the UNORDERED pairwise sum sum_{i<j}(x_j - x_i) equals
    sum x_(i) * (2i - n - 1) — one rank window + one exact integer fold
    (cents * small integers); GMD doubles it over n(n-1) ordered pairs,
    and relative_gmd = GMD/mean (exactly twice the Gini coefficient).
    Two divisions at read-out."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    v = o.select(F.round(F.col("o_totalprice") * 100, 0).cast("long")
                 .alias("c"), "o_orderkey")
    w = Window.orderBy(F.col("c").asc(), F.col("o_orderkey").asc())
    ranked = v.select("c", F.row_number().over(w).alias("i"))
    n = v.count()
    agg = ranked.agg(
        F.sum(F.col("c") * (2 * F.col("i") - n - 1)).cast("long")
        .alias("pairsum"),
        F.sum("c").cast("long").alias("total"))
    return agg.select(
        F.lit(n).cast("long").alias("n_orders"),
        "pairsum", "total",
        F.round(2 * F.col("pairsum") / F.lit(float(n) * (n - 1)) / 100,
                6).alias("gmd"),
        F.round(2 * F.col("pairsum") / F.lit(float(n - 1))
                / F.col("total"), 6).alias("relative_gmd"))


def q_dup_order_audit(spark, sf_dir):
    """Suspect-duplicate audit: orders sharing (customer, order date,
    exact total cents) — the double-submit / replay detector a billing
    pipeline runs.  One row of exact counts."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(
        "o_custkey", F.col("o_orderdate").cast("date").alias("od"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
        .alias("cents")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).cast("long")
        .alias("n_dup_groups"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
        .cast("long").alias("n_dup_orders"))


def q_hourly_conversion(spark, sf_dir):
    """Conversion rate by hour of day: views/clicks vs purchases per
    hour bucket with the exact purchase-per-touch ratio — the dayparting
    read behind send-time optimization.  NULL rate on hours with no
    touches (never a fake 0)."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(F.hour(F.col("ts")).cast("int").alias("hour")).agg(
        F.sum(F.when(F.col("event_type").isin("view", "click"), 1)
              .otherwise(0)).cast("long").alias("n_touches"),
        F.sum(F.when(F.col("event_type") == "purchase", 1)
              .otherwise(0)).cast("long").alias("n_purchases"))
    return per.select(
        "hour", "n_touches", "n_purchases",
        F.when(F.col("n_touches") > 0,
               F.round(F.col("n_purchases") / F.col("n_touches"), 6))
        .alias("conversion"))


def q_single_source_parts(spark, sf_dir):
    """Supply-chain concentration risk: parts served by exactly ONE
    supplier (per the lineitem history) and the exact revenue share
    riding on them — the single-point-of-failure audit.  One row,
    integer cents, one division."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("cents"))
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.when(F.col("n_supp") == 1, 1).otherwise(0))
        .cast("long").alias("n_single_source"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.sum(F.when(F.col("n_supp") == 1, F.col("cents")).otherwise(0))
        .cast("long").alias("at_risk_cents"),
    ).select(
        "*",
        F.round(F.col("at_risk_cents") / F.col("revenue_cents"), 6)
        .alias("at_risk_share"))


def q_customer_value_drift(spark, sf_dir):
    """Are repeat customers spending more over time?  Per multi-order
    customer, last order value minus first (order by date, ties by
    orderkey — exact cents), rolled into one row: growing / shrinking /
    flat counts and the mean drift.  The retention-quality read beside
    repeat_customer_revenue's share."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
        .alias("cents"),
        F.col("o_orderdate").cast("date").alias("od"), "o_orderkey")
    wf = Window.partitionBy("o_custkey").orderBy(
        F.col("od").asc(), F.col("o_orderkey").asc())
    wl = Window.partitionBy("o_custkey").orderBy(
        F.col("od").desc(), F.col("o_orderkey").desc())
    per = base.select(
        "o_custkey",
        F.first("cents").over(wf).alias("first_c"),
        F.first("cents").over(wl).alias("last_c"),
        F.count(F.lit(1)).over(
            Window.partitionBy("o_custkey")).alias("n"),
    ).distinct().where(F.col("n") >= 2)
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_multi_customers"),
        F.sum(F.when(F.col("last_c") > F.col("first_c"), 1).otherwise(0))
        .cast("long").alias("n_growing"),
        F.sum(F.when(F.col("last_c") < F.col("first_c"), 1).otherwise(0))
        .cast("long").alias("n_shrinking"),
        F.sum(F.col("last_c") - F.col("first_c")).cast("long")
        .alias("drift_cents_sum"),
    ).select(
        "*",
        F.round(F.col("drift_cents_sum") / F.col("n_multi_customers")
                / 100, 6).alias("mean_drift"))


def q_stickiness(spark, sf_dir):
    """Per-day DAU / trailing-7-day WAU stickiness — the engagement
    ratio product teams watch.  WAU via a bounded 7-day band join over
    the distinct (day, user) table (never a sliding distinct window,
    which Spark cannot do exactly), exact integer counts, one division.
    Days with no events are absent (consistent with the distinct-day
    accounting elsewhere)."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.datediff(F.col("ts").cast("date"),
                   F.lit("1970-01-01").cast("date"))
        .cast("long").alias("d"), "user_id").distinct().persist()
    dau = du.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("dau"))
    days = du.select("d").distinct()
    wau = (
        days.join(
            du.select(F.col("d").alias("d2"), "user_id"),
            (F.col("d2") <= F.col("d")) & (F.col("d2") >= F.col("d") - 6))
        .select("d", "user_id").distinct()
        .groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("wau"))
    )
    return dau.join(wau, "d").select(
        F.col("d").alias("day_i"), "dau", "wau",
        F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"))


def q_attribution_comparison(spark, sf_dir):
    """First-touch vs last-touch attribution disagreement: for every
    purchase, the earliest and latest preceding view/click of the same
    user (ties by event_id — the asof_attribution discipline), and one
    row of exact counts: how many conversions exist, how many have any
    touch, and how often the two models credit the SAME event — the
    number that says whether the attribution-model debate matters on
    this data."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conversion_id"), "user_id",
        us.alias("cts"))
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_id").alias("touch_id"), us.alias("tts"))
    j = conv.join(touch, "user_id").where(F.col("tts") <= F.col("cts"))
    w_first = Window.partitionBy("conversion_id").orderBy(
        F.col("tts").asc(), F.col("touch_id").asc())
    w_last = Window.partitionBy("conversion_id").orderBy(
        F.col("tts").desc(), F.col("touch_id").desc())
    picked = j.select(
        "conversion_id",
        F.first("touch_id").over(w_first).alias("first_touch"),
        F.first("touch_id").over(w_last).alias("last_touch"),
    ).distinct()
    n_conv = conv.count()
    agg = picked.agg(
        F.count(F.lit(1)).cast("long").alias("with_touch"),
        F.sum(F.when(F.col("first_touch") == F.col("last_touch"), 1)
              .otherwise(0)).cast("long").alias("same_touch"))
    return agg.select(
        F.lit(n_conv).cast("long").alias("n_conversions"),
        "with_touch", "same_touch",
        F.round(F.col("same_touch") / F.col("with_touch"), 6)
        .alias("same_frac"))


def q_revenue_lorenz(spark, sf_dir):
    """Lorenz curve deciles of customer revenue — the table behind
    revenue_gini's scalar: customers ranked by (revenue, custkey),
    cumulative revenue share at each population decile boundary (exact
    integer rank (q*(n-1)) div 10 + 1 and integer cents; one division
    per row).  Reading: decile 9 at 0.4 means the bottom 90% of
    customers hold 40% of revenue."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("cents"))
    w = (Window.orderBy(F.col("cents").asc(), F.col("o_custkey").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    n = per.count()
    tot = per.agg(F.sum("cents").alias("total"))
    ranked = per.crossJoin(F.broadcast(tot)).select(
        F.row_number().over(
            Window.orderBy(F.col("cents").asc(),
                           F.col("o_custkey").asc())).alias("rn"),
        F.sum("cents").over(w).alias("cum"), "total")
    qs = spark.range(1, 11).select(
        F.col("id").cast("int").alias("decile"),
        (F.expr(f"id * ({n} - 1) div 10") + 1).alias("rn"))
    return qs.join(ranked, "rn").select(
        "decile",
        F.round(F.col("cum") / F.col("total"), 6).alias("cum_share"))


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


def q_strength_core(spark, sf_dir):
    """s-core sweep (algos/percolation.strength_core_sweep, Eidsaa &
    Almaas): iteratively peel vertices with total incident WEIGHT < s —
    the CASCADE member of the robustness family (percolation thresholds
    edges with no iteration; here each removal weakens neighbors).
    Exact integer strengths; peel_rounds counts only rounds that
    removed something, so the pinned-round oracle is idempotent."""
    from plato_spark.algos.percolation import strength_core_sweep

    return strength_core_sweep(
        part_cooccurrence_edges(spark, sf_dir, weighted=True),
        thresholds=SCORE_THRESHOLDS)


def q_casing_profile(spark, sf_dir):
    """Word-level casing fingerprint per source: letter-run tokens
    classified as lowercase / Titlecase / ALLCAPS by anchored JVM
    regexes (the charclass_profile discipline one level up) — the
    boilerplate/shouting detector and the casing prior a tokenizer
    normalization step needs.  Exact counts + three rounded ratios."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit("[A-Za-z]+"), F.lit(0))

    def cnt(pat):
        return F.size(F.filter(toks, lambda t: t.rlike(pat))) \
            .cast("long")

    per = docs.select(
        "source",
        F.size(toks).cast("long").alias("w"),
        cnt("^[a-z]+$").alias("lo"),
        cnt("^[A-Z][a-z]+$").alias("ti"),
        cnt("^[A-Z]{2,}$").alias("up"))
    agg = per.groupBy("source").agg(
        F.sum("w").cast("long").alias("n_words"),
        F.sum("lo").cast("long").alias("n_lower"),
        F.sum("ti").cast("long").alias("n_title"),
        F.sum("up").cast("long").alias("n_allcaps"))
    return agg.select(
        "source", "n_words", "n_lower", "n_title", "n_allcaps",
        F.round(F.col("n_lower") / F.col("n_words"), 6)
        .alias("lower_frac"),
        F.round(F.col("n_title") / F.col("n_words"), 6)
        .alias("title_frac"),
        F.round(F.col("n_allcaps") / F.col("n_words"), 6)
        .alias("allcaps_frac"))


KMV_K = 256


def q_kmv_jaccard(spark, sf_dir):
    """KMV (bottom-k) sketch Jaccard between every source pair's
    vocabulary, NEXT TO the exact value — the sketch-accuracy row: the
    estimator keeps only the k smallest portable-md5 token hashes per
    source, estimates J as |both-sketch members among the union's
    bottom-k| / min(k, |union sketch|), and the gate checks both
    numbers (the estimate is deterministic because the hash is).  The
    constant-memory path for pairwise corpus similarity at 100 TB."""
    from pyspark.sql import Window
    from plato_spark.functions.text import portable_h1

    docs = load_table(spark, sf_dir, "documents")
    vocab = docs.select(
        "source",
        F.explode(F.array_distinct(F.regexp_extract_all(
            "text", F.lit("[A-Za-z0-9_]+"), F.lit(0)))).alias("token")
    ).distinct().select(
        "source", "token", portable_h1(F.col("token")).alias("h"))
    vocab = vocab.persist()
    w = Window.partitionBy("source").orderBy("h", "token")
    bk = vocab.select(
        "source", "token", "h",
        F.row_number().over(w).alias("rn")).where(
        F.col("rn") <= KMV_K).drop("rn").persist()
    srcs = vocab.select("source").distinct()
    pairs = srcs.select(F.col("source").alias("sa")).join(
        srcs.select(F.col("source").alias("sb")),
        F.col("sa") < F.col("sb"))
    u = pairs.join(bk.withColumnRenamed("source", "sa"), "sa").select(
        "sa", "sb", "token", "h"
    ).unionByName(
        pairs.join(bk.withColumnRenamed("source", "sb"), "sb")
        .select("sa", "sb", "token", "h")
    ).distinct()
    wp = Window.partitionBy("sa", "sb").orderBy("h", "token")
    ubk = u.select("sa", "sb", "token",
                   F.row_number().over(wp).alias("rn")).where(
        F.col("rn") <= KMV_K)
    in_a = bk.select(F.col("source").alias("sa"),
                     F.col("token").alias("token"))
    in_b = bk.select(F.col("source").alias("sb"),
                     F.col("token").alias("token"))
    est = ubk.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).cast("long").alias("kk")
    ).join(
        ubk.join(in_a, ["sa", "token"], "semi")
        .join(in_b, ["sb", "token"], "semi")
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("both")),
        ["sa", "sb"], "left")
    ex = (
        pairs.join(vocab.withColumnRenamed("source", "sa"), "sa")
        .select("sa", "sb", "token")
        .join(vocab.select(F.col("source").alias("sb"),
                           F.col("token").alias("token")),
              ["sb", "token"], "semi")
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sizes = vocab.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("nv"))
    out = (
        est.join(ex, ["sa", "sb"], "left")
        .join(sizes.withColumnRenamed("source", "sa")
              .withColumnRenamed("nv", "na"), "sa")
        .join(sizes.withColumnRenamed("source", "sb")
              .withColumnRenamed("nv", "nb"), "sb")
        .select(
            "sa", "sb",
            F.round(F.coalesce("both", F.lit(0)) / F.col("kk"), 6)
            .alias("est_jaccard"),
            F.round(F.coalesce("inter", F.lit(0))
                    / (F.col("na") + F.col("nb")
                       - F.coalesce("inter", F.lit(0))), 6)
            .alias("exact_jaccard"))
    )
    return out.select(
        "sa", "sb", "est_jaccard", "exact_jaccard",
        F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 6)
        .alias("abs_err"))


def q_length_qq_table(spark, sf_dir):
    """QQ table of doc length between src0 and src1 — the visual drift
    diagnostic behind length_ks_distance's single number: at each
    decile q, the exact rank-picked length of both distributions
    (rank = (q*(n-1)) div 10 + 1, the lower-interpolation convention —
    an integer pick, no float quantile math).  Matching columns means
    same distribution; a bowed curve localizes WHERE the crawler
    changed."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")

    def deciles(src, out):
        d = docs.where(F.col("source") == src).select(
            F.col("n_chars").alias("v"))
        w = Window.orderBy("v")
        n = d.count()
        ranked = d.select("v", F.row_number().over(w).alias("rn"))
        qs = spark.range(0, 11).select(
            F.col("id").cast("int").alias("decile"),
            (F.col("id") * (n - 1)).cast("long").alias("t"))
        return qs.select(
            "decile", (F.expr("t div 10") + 1).alias("rn")
        ).join(ranked, "rn").select(
            "decile", F.col("v").alias(out))

    a = deciles("src0", "len_src0")
    b = deciles("src1", "len_src1")
    return a.join(b, "decile").select("decile", "len_src0", "len_src1")


def q_missing_days(spark, sf_dir):
    """Calendar-coverage audit of the order stream: one row with the
    span, days WITH orders, missing days, and the longest zero-order
    gap (via one lead window over the distinct day table — never a
    calendar cross join).  The ingestion-hole check that catches a
    dead upstream before any trend query lies."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    days = o.select(
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date"))
        .cast("long").alias("d")).distinct()
    w = Window.orderBy("d")
    gaps = days.select(
        "d", (F.lead("d").over(w) - F.col("d") - 1).alias("gap"))
    return gaps.agg(
        F.count(F.lit(1)).cast("long").alias("days_with_orders"),
        (F.max("d") - F.min("d") + 1).cast("long").alias("span_days"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("long")
        .alias("longest_gap_days"),
    ).select(
        "span_days", "days_with_orders",
        (F.col("span_days") - F.col("days_with_orders")).cast("long")
        .alias("missing_days"),
        "longest_gap_days")


def q_customer_streaks(spark, sf_dir):
    """Per-customer ordering streaks — gaps-and-islands run IN the
    engine (it is usually only our oracle idiom): distinct order days
    per customer, island id = day - dense row number (constant within
    a consecutive-day run), exact max streak and active-day counts."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    days = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date"))
        .cast("long").alias("d")).distinct()
    w = Window.partitionBy("o_custkey").orderBy("d")
    isl = days.select(
        "o_custkey", "d",
        (F.col("d") - F.row_number().over(w)).alias("isl"))
    runs = isl.groupBy("o_custkey", "isl").agg(
        F.count(F.lit(1)).cast("long").alias("run"))
    return runs.groupBy("o_custkey").agg(
        F.sum("run").cast("long").alias("n_active_days"),
        F.max("run").cast("long").alias("max_streak_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"))


def q_latency_variance(spark, sf_dir):
    """Per-supplier ship-latency spread WITHOUT float sums: day gaps
    are exact integers, so mean and the unbiased sample variance come
    from the all-integer identity var = (n*sum(x^2) - sum(x)^2) /
    (n*(n-1)) — two integer folds, two correctly-rounded divisions.
    The consistency read behind supplier SLAs (shipping_latency gives
    the quantiles; this gives the moment).  Single-shipment suppliers
    report NULL variance, never a fake 0."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    gap = li.join(o.select(F.col("o_orderkey").alias("l_orderkey"),
                           "o_orderdate"), "l_orderkey").select(
        "l_suppkey",
        F.datediff(F.col("l_shipdate").cast("date"),
                   F.col("o_orderdate").cast("date"))
        .cast("long").alias("d"))
    agg = gap.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("s"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("ss"))
    return agg.select(
        "l_suppkey", "n",
        F.round(F.col("s") / F.col("n"), 6).alias("mean_days"),
        F.when(F.col("n") > 1,
               F.round((F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
                       / (F.col("n") * (F.col("n") - 1)), 6))
        .alias("var_days"))


def q_repeat_customer_revenue(spark, sf_dir):
    """Repeat-buyer concentration: one row with customer counts and the
    exact share of order revenue held by customers with >= 2 orders —
    the retention-economics headline.  Integer cents, two rounded
    divisions."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("cents"))
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
        .cast("long").alias("n_repeat"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.sum(F.when(F.col("n_orders") >= 2, F.col("cents"))
              .otherwise(0)).cast("long").alias("repeat_revenue_cents"),
    ).select(
        "*",
        F.round(F.col("n_repeat") / F.col("n_customers"), 6)
        .alias("repeat_frac"),
        F.round(F.col("repeat_revenue_cents") / F.col("revenue_cents"),
                6).alias("repeat_revenue_share"))


def q_dormant_balance_gap(spark, sf_dir):
    """Do customers who stopped ordering look different?  Per segment
    (dormant = no order since 2000-01-01 vs active), exact count, mean
    and MEDIAN account balance — balances lifted to integer cents so
    the median is an exact rank pick (lower of the two middles, the
    deterministic convention), no float sums anywhere."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    recent = o.where(
        F.col("o_orderdate").cast("date") >= F.lit("2000-01-01")
    ).select(F.col("o_custkey").alias("c_custkey")).distinct()
    seg = c.join(recent, "c_custkey", "left_semi").select(
        F.lit("active").alias("segment"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents")
    ).unionByName(
        c.join(recent, "c_custkey", "left_anti").select(
            F.lit("dormant").alias("segment"),
            F.round(F.col("c_acctbal") * 100, 0).cast("long")
            .alias("cents")))
    w = Window.partitionBy("segment").orderBy("cents", "segment")
    ranked = seg.select(
        "segment", "cents",
        F.row_number().over(w).alias("rn"))
    n_per = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"))
    med = ranked.join(n_per, "segment").where(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select("segment", F.col("cents").alias("median_cents"))
    return n_per.join(med, "segment").select(
        "segment", "n",
        F.round(F.col("s") / F.col("n") / 100, 6).alias("mean_balance"),
        F.round(F.col("median_cents") / 100, 6).alias("median_balance"))


def q_user_twap(spark, sf_dir):
    """Per-user TIME-weighted average of the event value (the step-
    function integral: each value holds until the user's next event;
    TWAP = sum v_i * dt_i / total time) — the financial/metering
    aggregate a plain mean silently gets wrong under irregular
    sampling.  Exact integer arithmetic: values in cents, gaps in epoch
    micros, one division at read-out; single-event users are NULL
    (no interval exists), never a fake mean.  One user-partitioned
    window (lead) + one agg."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seg = ev.select(
        "user_id", "cents", "us",
        F.lead("us").over(w).alias("nxt"))
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("nxt").isNotNull(),
                     F.col("cents") * (F.col("nxt") - F.col("us"))))
        .cast("long").alias("weighted_cents_us"),
        F.sum(F.when(F.col("nxt").isNotNull(),
                     F.col("nxt") - F.col("us")))
        .cast("long").alias("span_us"),
    ).select(
        "user_id", "n_events", "span_us",
        F.when(F.col("span_us") > 0,
               F.round(F.col("weighted_cents_us") / F.col("span_us")
                       / 100, 6)).alias("twap"))


def q_lang_source_chisq(spark, sf_dir):
    """Chi-square statistic of the lang x source contingency table
    (independence of language and container — the mixture-drift test
    statistic, reported WITHOUT a p-value: no incomplete-gamma libm).
    Per-cell terms (O-E)^2/E come from exact integer margins through
    correctly-rounded single divisions, are rounded to 9dp and summed
    as DECIMAL(38,9) — an order-FREE fold, the pca-gramian lesson
    applied to a float statistic.  One row: n, rows, cols, dof, chi2."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o"))
    rm = cells.groupBy("lang").agg(F.sum("o").alias("rm"))
    cm = cells.groupBy("source").agg(F.sum("o").alias("cm"))
    n = docs.count()
    term = F.round(
        (F.col("o") - F.col("rm") * F.col("cm") / F.lit(float(n)))
        * (F.col("o") - F.col("rm") * F.col("cm") / F.lit(float(n)))
        / (F.col("rm") * F.col("cm") / F.lit(float(n))), 9)
    # absent (lang, source) cells contribute E (their O is 0):
    # chi2 = sum_present (O-E)^2/E + sum_absent E; the absent mass is
    # n - sum_present E, each term exact through the same fold
    present = cells.join(rm, "lang").join(cm, "source").select(
        term.cast("decimal(38,9)").alias("t"),
        F.round(F.col("rm") * F.col("cm") / F.lit(float(n)), 9)
        .cast("decimal(38,9)").alias("e"))
    nr = cells.select("lang").distinct().count()
    nc = cells.select("source").distinct().count()
    # final rounding stays a Spark DECIMAL expression (half-up), never
    # python round() (half-even) — the 6dp tie discipline
    return present.agg(
        F.sum("t").alias("tp"), F.sum("e").alias("ep")
    ).select(
        F.lit(n).cast("long").alias("n"),
        F.lit(nr).cast("long").alias("n_langs"),
        F.lit(nc).cast("long").alias("n_sources"),
        F.lit((nr - 1) * (nc - 1)).cast("long").alias("dof"),
        F.round(F.col("tp") + (F.lit(n) - F.col("ep")), 6)
        .cast("double").alias("chi2"))


def q_clustering_agreement(spark, sf_dir):
    """Exact Rand index between two INDEPENDENT clusterings of the
    embeddings — deterministic k-means (centroid paradigm) vs
    Jarvis-Patrick SNN (density paradigm): pair-counting agreement from
    the contingency table, ALL integer binomials (sum C(nij,2) etc.),
    one division — the cross-method stability read that tells you
    whether cluster structure is real or an artifact of one algorithm's
    bias."""
    from plato_spark.functions.similarity import (
        kmeans_clusters,
        snn_clusters,
    )

    emb = _emb_double(spark, sf_dir)
    km = kmeans_clusters(emb, n_clusters=8, lloyd_iters=2).select(
        F.col("vec_id").alias("id"), F.col("cluster").alias("ka"))
    sn = snn_clusters(emb, k=SNN_K, kt=SNN_KT).select(
        F.col("vec_id").alias("id"), F.col("cluster").alias("kb"))
    j = km.join(sn, "id")
    cont = j.groupBy("ka", "kb").agg(
        F.count(F.lit(1)).cast("long").alias("m"))
    a_m = j.groupBy("ka").agg(F.count(F.lit(1)).cast("long").alias("c"))
    b_m = j.groupBy("kb").agg(F.count(F.lit(1)).cast("long").alias("c"))

    def pairs(df):
        return df.agg(F.sum(F.col("c") * (F.col("c") - 1) / 2)
                      .cast("long")).collect()[0][0] or 0

    n = j.count()
    both = cont.agg(F.sum(F.col("m") * (F.col("m") - 1) / 2)
                    .cast("long")).collect()[0][0] or 0
    pa, pb = pairs(a_m), pairs(b_m)
    total = n * (n - 1) // 2
    out = spark.createDataFrame(
        [(n, pa, pb, both, total)],
        "n long, pairs_a long, pairs_b long, pairs_both long, "
        "pairs_total long")
    return out.select(
        "*",
        F.round((F.col("pairs_total") + 2 * F.col("pairs_both")
                 - F.col("pairs_a") - F.col("pairs_b"))
                / F.col("pairs_total"), 6).alias("rand_index"))


BOND_PS = (25, 50, 75)


def q_bond_percolation(spark, sf_dir):
    """Deterministic bond-percolation sweep (algos/percolation
    .bond_percolation_sweep): each co-occurrence edge survives at level
    p iff portable-md5 % 100 < p — nested survivor sets, one hash-min
    WCC per p — the edge-failure member of the robustness family beside
    the weight-threshold backbone and hub/random vertex removal."""
    from plato_spark.algos.percolation import bond_percolation_sweep

    return bond_percolation_sweep(part_cooccurrence_edges(spark, sf_dir),
                                  ps=BOND_PS)


def q_selfjoin_size_audit(spark, sf_dir):
    """Join-cardinality estimator audit: for each lineitem key column,
    the EXACT self-equijoin size sum c(k)^2 next to the textbook
    independence estimate n^2/d — the ratio is the skew multiplier a
    cost-based optimizer silently eats when it assumes uniform keys
    (join_skew_audit's max-row sibling, but for JOIN OUTPUT size).
    Exact integers + one rounded division per key."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        cnt = li.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("c"))
        parts.append(cnt.agg(
            F.lit(col).alias("key_col"),
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.col("c") * F.col("c")).cast("long")
            .alias("exact_join_size")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    est = (F.col("n_rows") * F.col("n_rows")) / F.col("n_keys")
    return out.select(
        "*",
        F.round(est, 6).alias("independence_estimate"),
        F.round(F.col("exact_join_size") / est, 6).alias("skew_ratio"))


def q_spectral_moments(spark, sf_dir):
    """Exact spectral moments of the co-occurrence adjacency matrix —
    trace(A^2) = 2|E|, trace(A^3) = 6*triangles, trace(A^4) =
    sum_u deg(u)^2 + sum_{u!=v} cn(u,v)^2 (A symmetric, so trace A^4 is
    the squared Frobenius norm of A^2, whose off-diagonal entries are
    common-neighbor counts over ALL 2-hop pairs, adjacent or not).
    Closed-walk counts = eigenvalue power sums, all exact integers — the
    linear-algebra fingerprint (graph energy bounds, quasi-randomness
    tests) from one wedge join + one degree fold, no eigensolver."""
    canon = part_cooccurrence_edges(spark, sf_dir)
    sym = symmetrize(canon)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("deg"))
    m2 = deg.agg(F.sum("deg")).collect()[0][0]
    sumdeg2 = deg.agg(
        F.sum(F.col("deg") * F.col("deg"))).collect()[0][0]
    ab = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ac = canon.select(F.col("src").alias("a2"), F.col("dst").alias("c"))
    bc = canon.select(F.col("src").alias("b2"), F.col("dst").alias("c2"))
    tri = (
        ab.join(ac, F.col("a") == F.col("a2"))
        .join(bc, (F.col("b") == F.col("b2"))
              & (F.col("c") == F.col("c2")))
        .count()
    )
    wa = sym.select(F.col("src").alias("c"), F.col("dst").alias("u"))
    wb = sym.select(F.col("src").alias("c"), F.col("dst").alias("v"))
    cn2 = (
        wa.join(wb, "c").where(F.col("u") != F.col("v"))
        .groupBy("u", "v").agg(F.count(F.lit(1)).alias("cn"))
        .agg(F.sum(F.col("cn") * F.col("cn"))).collect()[0][0]
    )
    return spark.createDataFrame(
        [(int(m2), 6 * int(tri), int(sumdeg2) + int(cn2))],
        "trace_a2 long, trace_a3 long, trace_a4 long")


def q_seasonal_naive_error(spark, sf_dir):
    """Forecast-baseline eval of daily order revenue: mean absolute
    error of the seasonal-naive forecast (value 7 days earlier) vs the
    1-step naive (previous PRESENT day is not used — strictly d-1;
    calendar gap days are skipped, not zero-filled), and their MASE-like
    ratio.  The sanity floor any revenue forecasting model must beat.
    Exact integer cents; divisions only at the three read-outs."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).alias("day_i")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
          .alias("cents"))
    base = per.select(F.col("day_i").alias("d"),
                      F.col("cents").alias("v"))

    def err(lag):
        prev = per.select((F.col("day_i") + lag).alias("d"),
                          F.col("cents").alias("pv"))
        return base.join(prev, "d").agg(
            F.count(F.lit(1)).cast("long"),
            F.sum(F.abs(F.col("v") - F.col("pv"))).cast("long"))

    n7, ae7 = err(7).collect()[0]
    n1, ae1 = err(1).collect()[0]
    out = spark.createDataFrame(
        [(n7, ae7, n1, ae1)],
        "n_scored_7d long, abs_err_7d_cents long, "
        "n_scored_1d long, abs_err_1d_cents long")
    mae7 = F.col("abs_err_7d_cents") / F.col("n_scored_7d")
    mae1 = F.col("abs_err_1d_cents") / F.col("n_scored_1d")
    return out.select(
        "*",
        F.round(mae7 / 100, 6).alias("mae_7d"),
        F.round(mae1 / 100, 6).alias("mae_1d"),
        F.when((F.col("abs_err_1d_cents") > 0)
               & (F.col("n_scored_7d") > 0),
               F.round(mae7 / mae1, 6)).alias("mase_vs_naive1"))


def q_linkpred_first_rank(spark, sf_dir):
    """Rank-resolved link prediction (functions/linkpred
    .link_prediction_first_rank): for every held-out edge, the exact
    position of the true neighbor in each endpoint's full
    common-neighbor ranking — the MRR read-out as per-edge integers
    (reciprocal-rank MEANS are reduce-order-sensitive; ranks are not),
    NULL when the CN scorer cannot reach the pair at any k."""
    from plato_spark.functions.linkpred import link_prediction_first_rank

    return link_prediction_first_rank(
        part_cooccurrence_edges(spark, sf_dir), holdout_mod=5)


def q_rbm_pairs(spark, sf_dir):
    """Reciprocal-best-match pairs over the embeddings: (a, b, cosine)
    where b is a's exact-cosine top-1 neighbor AND a is b's — the
    mutual-NN matching used for high-precision alignment/dedup seeding
    (each vector appears in at most one pair; a greedy matching with
    zero parameter choices).  Built from the brute_force_topk yardstick
    lists; production feeds the same rule from ivf/lsh."""
    from plato_spark.functions.similarity import brute_force_topk

    bf = brute_force_topk(_emb_double(spark, sf_dir), k=1).select(
        "query_id", "nbr_id", "cosine")
    fwd = bf.where(F.col("query_id") < F.col("nbr_id")).select(
        F.col("query_id").alias("a"), F.col("nbr_id").alias("b"),
        "cosine")
    rev = bf.where(F.col("query_id") > F.col("nbr_id")).select(
        F.col("nbr_id").alias("a"), F.col("query_id").alias("b"))
    return fwd.join(rev, ["a", "b"], "semi")


HASH_TRICK_BUCKETS = 4096


def q_hashing_trick_audit(spark, sf_dir):
    """Feature-hashing collision audit: the corpus vocabulary hashed
    into HASH_TRICK_BUCKETS buckets (portable md5 % 4096 — the
    hashing-trick a wide-feature model actually ships), one row of
    exact collision stats: distinct tokens, buckets used, max bucket
    load, tokens sharing a bucket, and the colliding fraction.  The
    number that decides whether 2^12 features is enough."""
    from plato_spark.functions.text import portable_h1

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.regexp_extract_all(
            "text", F.lit("[A-Za-z0-9_]+"), F.lit(0))).alias("token")
    ).distinct()
    bucketed = toks.select(
        "token",
        F.pmod(portable_h1(F.col("token")),
               F.lit(HASH_TRICK_BUCKETS)).alias("b"))
    loads = bucketed.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("load"))
    return loads.agg(
        F.sum("load").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        F.max("load").cast("long").alias("max_bucket_load"),
        F.sum(F.when(F.col("load") >= 2, F.col("load")).otherwise(0))
        .cast("long").alias("n_tokens_colliding"),
    ).select(
        "*",
        F.round(F.col("n_tokens_colliding") / F.col("n_tokens"), 6)
        .alias("pct_colliding"))


def q_dag_critical_path(spark, sf_dir):
    """Vertex-weighted critical path (algos/dag.dag_critical_path — the
    schedule-makespan primitive, dag_levels' (max,+) kernel with weight
    sums) on the topo_levels planted DAG with w(r) = 1 + (r mod 5).
    Skip edges make the DP multi-predecessor, but positive weights mean
    the optimum never skips, so ground truth stays analytic: the oracle
    reads path_weight(r) as a run-scoped prefix sum (gaps-and-islands)
    while the engine genuinely relaxes the DAG to a fixpoint."""
    from plato_spark.algos.dag import dag_critical_path
    from plato_spark.functions.text import portable_h1
    from plato_spark.graph.edges import build_dictionary

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("vkey")).distinct()
    )
    n = docs.count()
    d = build_dictionary(docs, 16)
    base = d.select(F.col("id").alias("r"))
    rr = F.col("r")

    def _sel(c):
        return portable_h1(
            F.concat(F.lit("topo|"), c.cast("string"))) % 2 == 0

    step = base.where(_sel(rr) & (rr + 1 < n)).select(
        rr.alias("src"), (rr + 1).cast("long").alias("dst"))
    skip = base.where(_sel(rr) & _sel(rr + 1) & (rr + 2 < n)).select(
        rr.alias("src"), (rr + 2).cast("long").alias("dst"))
    weights = base.select(rr.alias("id"),
                          (1 + rr % 5).cast("long").alias("w"))
    return dag_critical_path(step.unionByName(skip), weights)


K_ANON_K, K_ANON_BAND = 5, 1000


def q_k_anonymity(spark, sf_dir):
    """Privacy-release audit of the customer dimension: k-anonymity
    over the quasi-identifier pair (nation, market segment) and
    l-diversity of the account-balance band (floor(acctbal/1000)) as
    the sensitive attribute — the pre-release check a training-data
    export runs.  One row: group counts, the minimum group size, rows
    in groups below k=5, and the minimum per-group distinct-band count.
    Exact integers + one rounded division."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / K_ANON_BAND)).cast("long")
        .alias("ldiv"))
    return g.agg(
        F.sum("sz").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("sz").cast("long").alias("min_group_size"),
        F.sum(F.when(F.col("sz") < K_ANON_K, F.col("sz"))
              .otherwise(0)).cast("long").alias("rows_below_k"),
        F.min("ldiv").cast("long").alias("min_l_diversity"),
    ).select(
        "*",
        F.round(F.col("rows_below_k") / F.col("n_rows"), 6)
        .alias("pct_below_k"))


def q_abc_classification(spark, sf_dir):
    """ABC / Pareto inventory classification of parts by lineitem
    revenue: class A holds rows while the running revenue share is
    <= 80%, B to 95%, C after — boundaries decided by EXACT integer
    cross-multiplication (cum_cents * 100 <= 80 * total_cents), never
    a float share.  The global window runs over the bounded parts
    DIMENSION (post-aggregation), not the fact table; at 100 TB the
    same plan holds because |parts| << |lineitem|."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .alias("cents"))
    w = (Window.orderBy(F.col("cents").desc(), F.col("l_partkey").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    tot = per.agg(F.sum("cents").alias("total"))
    ranked = per.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.sum("cents").over(w).alias("cum"),
        "total")
    cls = F.when(F.col("cum") * 100 <= 80 * F.col("total"), "A") \
        .when(F.col("cum") * 100 <= 95 * F.col("total"), "B") \
        .otherwise("C")
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("class_revenue_cents"),
        F.round(F.sum("cents") / F.max("total"), 6)
        .alias("revenue_share"))


WL_ROUNDS = 3


def q_wl_colors(spark, sf_dir):
    """1-WL color refinement after WL_ROUNDS rounds (algos/wl): the
    graph-isomorphism signature and the exact expressiveness ceiling of
    message-passing GNNs — per-vertex colors from portable-md5 hashes
    of (own color | sorted neighbor-color multiset), bit-identical in
    both engines."""
    from plato_spark.algos.wl import wl_colors

    return wl_colors(part_cooccurrence_edges(spark, sf_dir),
                     rounds=WL_ROUNDS)


def q_knn_label_noise(spark, sf_dir):
    """kNN label-noise triage (similarity.knn_label_noise, Wilson
    editing): per vector, the count of exact-cosine top-10 neighbors
    carrying a different label; suspect = disagreement >= 8/10.  The
    mislabel sweep a labeled training corpus runs before any fit."""
    from plato_spark.functions.similarity import knn_label_noise

    return knn_label_noise(load_table(spark, sf_dir, "embeddings"), k=10)


def q_nearest_centroid_accuracy(spark, sf_dir):
    """Nearest-centroid (Rocchio) resubstitution accuracy per label
    (similarity.nearest_centroid_accuracy): integer-micro centroids,
    exact squared-L2 assignment with smallest-label ties — the
    linear-separability read of the labeled embedding space."""
    from plato_spark.functions.similarity import nearest_centroid_accuracy

    return nearest_centroid_accuracy(load_table(spark, sf_dir,
                                                "embeddings"))


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


def q_priority_late_orders(spark, sf_dir):
    """TPC-H-Q4-shape order-priority checking: per priority, how many
    orders have AT LEAST ONE line shipped more than 30 days after the
    order date (the EXISTS quantifier decorrelated into one semi-join
    — the Q21 lesson at Q4's simpler shape).  Exact integer counts."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.select(F.col("l_orderkey").alias("o_orderkey"), "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"), "o_orderkey")
        .where(F.col("l_shipdate").cast("date")
               > F.date_add(F.col("o_orderdate").cast("date"), 30))
        .select("o_orderkey").distinct()
    )
    return (
        o.join(late, "o_orderkey", "semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


def q_readability_cli(spark, sf_dir):
    """Per-source Coleman-Liau readability — the readability formula
    with NO syllable guessing and NO logs: CLI = 0.0588*L - 0.296*S -
    15.8 with L = letters per 100 words and S = sentences per 100
    words, all from exact corpus-level integer counts (letters via the
    charclass regex, words via the shared TOKEN_RE, sentences via
    [.!?]+ terminator runs floored at 1 per doc), so the only float ops
    are two correctly-rounded divisions and one linear combination."""
    docs = load_table(spark, sf_dir, "documents")
    letters = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    words = F.size(F.regexp_extract_all(
        "text", F.lit("[A-Za-z0-9_]+"), F.lit(0)))
    sents = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), F.lit(0))),
        F.lit(1))
    per = docs.select(
        "source", letters.cast("long").alias("lt"),
        words.cast("long").alias("wd"), sents.cast("long").alias("st"))
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("lt").cast("long").alias("letters"),
        F.sum("wd").cast("long").alias("words"),
        F.sum("st").cast("long").alias("sentences"))
    big_l = F.col("letters") / F.col("words") * 100
    big_s = F.col("sentences") / F.col("words") * 100
    return agg.select(
        "source", "n_docs", "letters", "words", "sentences",
        F.round(0.0588 * big_l - 0.296 * big_s - 15.8, 6).alias("cli"))


SNN_K, SNN_KT = 10, 3


def q_snn_clusters(spark, sf_dir):
    """Jarvis-Patrick shared-nearest-neighbor clustering over the
    embeddings (similarity.snn_clusters): mutual-kNN links with >= kt
    shared neighbors, min-id components, singletons keep their id — the
    density-adaptive clustering family beside kmeans (centroid) and
    SCAN (graph-structural).  kNN source is the exact top-k yardstick
    at gate scale; the JP rule itself is exact integer set arithmetic."""
    from plato_spark.functions.similarity import snn_clusters

    return snn_clusters(_emb_double(spark, sf_dir), k=SNN_K, kt=SNN_KT)


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


def q_embedding_anisotropy(spark, sf_dir):
    """Corpus-level embedding anisotropy (similarity.embedding_anisotropy):
    mean pairwise cosine over ALL distinct pairs WITHOUT the O(N^2)
    join — Gram identity over unit-normalized 6dp-rounded integer-micro
    vectors, exact decimal folds, float only in the two read-outs.  The
    collapsed-space health check that gates every downstream ANN row."""
    from plato_spark.functions.similarity import embedding_anisotropy

    return embedding_anisotropy(load_table(spark, sf_dir, "embeddings"))


KCENTER_K = 8


def q_kcenter_seeds(spark, sf_dir):
    """Gonzalez farthest-point traversal (similarity.kcenter_seeds):
    the deterministic k-center 2-approximation / coreset skeleton —
    k-1 rounds of ONE incremental min-dist update (broadcast newest
    seed) + one scalar argmax, integer-micro squared L2 throughout.
    The oracle unrolls the identical traversal."""
    from plato_spark.functions.similarity import kcenter_seeds

    return kcenter_seeds(load_table(spark, sf_dir, "embeddings"),
                         k=KCENTER_K)


def q_davies_bouldin(spark, sf_dir):
    """Davies-Bouldin cluster-validity components per ground-truth
    label (similarity.davies_bouldin, squared-metric variant): exact
    integer centroids/scatters, no float sums anywhere — only
    correctly-rounded single divisions, so both engines agree without
    reduce-order caveats.  Completes the cluster-quality family beside
    silhouette and embedding_purity."""
    from plato_spark.functions.similarity import davies_bouldin

    return davies_bouldin(load_table(spark, sf_dir, "embeddings"))


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


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank to 1e-6 convergence (plato protocol) on the
    sf0.001 co-occurrence graph; driver checks rows>0 + stable schema."""
    sym = _sym(spark, SF_SMOKE)
    return pagerank(sym, damping=0.85, eps=1e-6, max_iters=100).select(
        "id", F.round("rank", 6).alias("rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry order matters: the driver's correctness gate snapshots the
    # FIRST 50 entries per round.  Round-4 rotation: the 18 rows no
    # driver round ever proved lead, then this round's changed/new
    # queries, then the oldest (r1+r2-era) proofs; freshly r3-proven
    # rows sit at the tail.  Every row is value-matched through the
    # gate replica at sf0.001 AND sf0.01 (tools/validate_oracles.py)
    # regardless of rotation position.
    return {
        # -- r4 head block -1: VERDICT-r3-mandated changes that MUST
        # earn a driver-green row this round (they were pushed past
        # position 50 by later session additions): embedding_project
        # (the one red r3 row, reshaped to (vec_id, dim, value)),
        # closeness_exact (new exact Bavelas variant), and the two
        # materially-changed loops (weighted_matching hash tie-break
        # with a re-pinned oracle; infomap one-action move rounds) --
        "embedding_project": q_embedding_project,
        "closeness_exact": q_closeness_exact,
        "weighted_matching": q_weighted_matching,
        "infomap": q_infomap,
        # -- r4 head block 0: brand-new this session --
        "asof_attribution": q_asof_attribution,
        "interval_counts": q_interval_counts,
        "pricing_summary": q_pricing_summary,
        "pagerank_trace": q_pagerank_trace,
        "bpe_merges": q_bpe_merges,
        "simrank": q_simrank,
        "lsh_incremental": q_lsh_incremental,
        "hitting_time": q_hitting_time,
        "attr_diffusion": q_attr_diffusion,
        "spectral_coord": q_spectral_coord,
        "bpe_compression": q_bpe_compression,
        "centroid_similarity": q_centroid_similarity,
        "ivf_recall": q_ivf_recall,
        "zorder_key": q_zorder_key,
        "windowed_funnel": q_windowed_funnel,
        "postings": q_postings,
        "lang_confusion": q_lang_confusion,
        "rrf_fusion": q_rrf_fusion,
        "shipping_priority": q_shipping_priority,
        # -- r4 head block 1 (18): never driver-proven by any round
        # (VERDICT r3 item 1: the gate snapshots the first 50 rows;
        # these rotate to the front so CORRECTNESS_r04 finally proves
        # them — all were value-matched via the gate replica in r3) --
        "katz": q_katz,
        "assortativity": q_assortativity,
        "repetition_ratio": q_repetition_ratio,
        "redact_pii": q_redact_pii,
        "domain_counts": q_domain_counts,
        "vocabulary": q_vocabulary,
        "contamination": q_contamination,
        "harmonic_sampled": q_harmonic,
        "scc": q_scc,
        "trussness": q_trussness,
        "effective_diameter": q_effective_diameter,
        "tfidf_keywords": q_tfidf,
        "mis": q_mis,
        "modularity": q_modularity,
        "link_preferential": q_link_preferential,
        "link_resource_alloc": q_link_resource_alloc,
        "bigram_vocabulary": q_bigram_vocabulary,
        "doc_chunks": q_doc_chunks,
        # -- r4 head block 2: new this session (driver-gated on first
        # appearance; the rows they displace past the 50-row snapshot
        # are r4-new too and remain replica-checked) --
        "widest_path": q_widest_path,
        "temporal_reach": q_temporal_reach,
        "waiting_suppliers": q_waiting_suppliers,
        "market_share": q_market_share,
        "brand_band_revenue": q_brand_band_revenue,
        "ewma_revenue": q_ewma_revenue,
        "revenue_autocorr": q_revenue_autocorr,
        "rfm_segments": q_rfm_segments,
        "landmark_stretch": q_landmark_stretch,
        "join_skew_audit": q_join_skew_audit,
        "graphsage_features": q_graphsage_features,
        "minhash_calibration": q_minhash_calibration,
        "discount_qty_corr": q_discount_qty_corr,
        "cusum_changepoint": q_cusum_changepoint,
        "skyline_parts": q_skyline_parts,
        "token_cosine_topk": q_token_cosine_topk,
        "graphlet_census": q_graphlet_census,
        "hll_set_ops": q_hll_set_ops,
        "theil_sen_trend": q_theil_sen_trend,
        "funnel_sensitivity": q_funnel_sensitivity,
        "benford_audit": q_benford_audit,
        "cohort_ltv": q_cohort_ltv,
        "weighted_median_discount": q_weighted_median_discount,
        "part_name_revenue": q_part_name_revenue,
        "filter_ablation": q_filter_ablation,
        "packing_sensitivity": q_packing_sensitivity,
        "dedup_threshold_curve": q_dedup_threshold_curve,
        "collective_influence": q_collective_influence,
        "trade_reciprocity": q_trade_reciprocity,
        "hop_histogram": q_hop_histogram,
        "coactivity_churn": q_coactivity_churn,
        "length_ks_distance": q_length_ks_distance,
        "charclass_profile": q_charclass_profile,
        "ppjoin_pairs": q_ppjoin_pairs,
        "user_simpson_diversity": q_user_simpson_diversity,
        "coarsen_stats": q_coarsen_stats,
        "hub_removal": q_hub_removal,
        "component_stability": q_component_stability,
        "degree_incremental": q_degree_incremental,
        "triangle_incremental": q_triangle_incremental,
        "cdc_chunks": q_cdc_chunks,
        "sp_counts": q_sp_counts,
        "bloom_prune": q_bloom_prune,
        "directed_assortativity": q_directed_assortativity,
        "markov_eval": q_markov_eval,
        "snm_candidates": q_snm_candidates,
        "label_consistency": q_label_consistency,
        "triad_census": q_triad_census,
        "style_divergence": q_style_divergence,
        # -- post-gate additions (the curated 50 above is the round-4
        # driver snapshot; rows below here carry replica evidence) --
        "burstiness": q_burstiness,
        "embedding_purity": q_embedding_purity,
        "large_orders": q_large_orders,
        "promo_revenue": q_promo_revenue,
        "peak_concurrency": q_peak_concurrency,
        "silhouette": q_silhouette,
        "eccentricity": q_eccentricity,
        "quantiles_incremental": q_quantiles_incremental,
        "mixture_apply": q_mixture_apply,
        "rate_spikes": q_rate_spikes,
        "revenue_rollup_totals": q_revenue_rollup_totals,
        "revenue_concentration": q_revenue_concentration,
        "discount_bands": q_discount_bands,
        "segment_mix": q_segment_mix,
        "order_size_histogram": q_order_size_histogram,
        "local_supplier_volume": q_local_supplier_volume,
        "returned_items": q_returned_items,
        "top_supplier": q_top_supplier,
        "product_profit": q_product_profit,
        "small_qty_revenue": q_small_qty_revenue,
        "dormant_customers": q_dormant_customers,
        "late_shipments": q_late_shipments,
        "customer_distribution": q_customer_distribution,
        "knn_hubness": q_knn_hubness,
        "degree_mixing_matrix": q_degree_mixing_matrix,
        "zipf_curve": q_zipf_curve,
        "session_gaps": q_session_gaps,
        "props_stats": q_props_stats,
        "segment_pivot": q_segment_pivot,
        "status_priority_cube": q_status_priority_cube,
        "audience_overlap": q_audience_overlap,
        "link_overlap": q_link_overlap,
        "densification_curve": q_densification_curve,
        "segment_unpivot": q_segment_unpivot,
        "brand_size_lift": q_brand_size_lift,
        "balance_deciles": q_balance_deciles,
        "trailing_revenue": q_trailing_revenue,
        "shipping_latency": q_shipping_latency,
        "edge_weight_spectrum": q_edge_weight_spectrum,
        "source_entropy": q_source_entropy,
        "reorder_gaps": q_reorder_gaps,
        "audience_jaccard": q_audience_jaccard,
        "markov_stationary": q_markov_stationary,
        "cheapest_supplier": q_cheapest_supplier,
        "dominant_suppliers": q_dominant_suppliers,
        "catalog_breadth": q_catalog_breadth,
        "price_dispersion": q_price_dispersion,
        "lcc_histogram": q_lcc_histogram,
        "revenue_growth": q_revenue_growth,
        "lifetime_quantiles": q_lifetime_quantiles,
        "event_grouping_sets": q_event_grouping_sets,
        "lsh_recall": q_lsh_recall,
        "open_order_aging": q_open_order_aging,
        "supply_demand_balance": q_supply_demand_balance,
        "lpa_weighted": q_lpa_weighted,
        "priority_drift": q_priority_drift,
        "lang_rand_index": q_lang_rand_index,
        "revenue_gini": q_revenue_gini,
        "friendship_paradox": q_friendship_paradox,
        "error_conversion_impact": q_error_conversion_impact,
        "integrity_audit": q_integrity_audit,
        "group_quantiles": q_group_quantiles,
        "conversion_latency": q_conversion_latency,
        "harmonic_exact": q_harmonic_exact,
        "asof_next": q_asof_next,
        "random_removal": q_random_removal,
        "trimmed_mean": q_trimmed_mean,
        "mad_outliers": q_mad_outliers,
        "session_stats": q_session_stats,
        "corpus_card": q_corpus_card,
        "graph_card": q_graph_card,
        "component_histogram": q_component_histogram,
        "events_card": q_events_card,
        "lang_concentration": q_lang_concentration,
        "vocab_growth": q_vocab_growth,
        "vocab_coverage": q_vocab_coverage,
        "pca_variance": q_pca_variance,
        "pca_second": q_pca_second,
        "pca_plane_variance": q_pca_plane_variance,
        "pca_project": q_pca_project,
        "active_users": q_active_users,
        "instability": q_instability,
        "strength_assortativity": q_strength_assortativity,
        "weighted_sample": q_weighted_sample,
        "pca_component": q_pca_component,
        "norm_quantiles": q_norm_quantiles,
        "lang_modularity": q_lang_modularity,
        "trade_volume": q_trade_volume,
        "blocklist_hits": q_blocklist_hits,
        "hll_incremental": q_hll_incremental,
        "bfs_parents": q_bfs_parents,
        "hourly_profile": q_hourly_profile,
        "propensity_by_activity": q_propensity_by_activity,
        "error_precursors": q_error_precursors,
        "dow_profile": q_dow_profile,
        "frequent_triples": q_frequent_triples,
        "rec_coverage": q_rec_coverage,
        "event_trigrams": q_event_trigrams,
        "centrality_rank_corr": q_centrality_rank_corr,
        "pagerank_concentration": q_pagerank_concentration,
        "lang_vocabulary": q_lang_vocabulary,
        "embedding_quantization": q_embedding_quantization,
        "mixing_null_model": q_mixing_null_model,
        "pagerank_citation": q_pagerank_citation,
        "co_citation": q_co_citation,
        "source_mixing": q_source_mixing,
        "brand_mixing": q_brand_mixing,
        "cocitation_cosine": q_cocitation_cosine,
        "bibcoupling_cosine": q_bibcoupling_cosine,
        "degree_quantiles": q_degree_quantiles,
        "quality_length_corr": q_quality_length_corr,
        "orphan_docs": q_orphan_docs,
        "core_size_curve": q_core_size_curve,
        "weighted_triangles": q_weighted_triangles,
        "biblio_coupling": q_biblio_coupling,
        "degree_clustering": q_degree_clustering,
        "strength_disparity": q_strength_disparity,
        "edge_smoothness": q_edge_smoothness,
        "hub_churn": q_hub_churn,
        "bowtie": q_bowtie,
        "lang_mixing": q_lang_mixing,
        "attr_assortativity": q_attr_assortativity,
        "retention_cohorts": q_retention_cohorts,
        "scc_condensation": q_scc_condensation,
        "shingle_novelty": q_shingle_novelty,
        "winnow_fingerprints": q_winnow_fingerprints,
        "reference_graph": q_reference_graph,
        "transitivity": q_transitivity,
        "avg_neighbor_degree": q_avg_neighbor_degree,
        "hapax_stats": q_hapax_stats,
        "partition_cut": q_partition_cut,
        "inter_event_gaps": q_inter_event_gaps,
        "degree_gini": q_degree_gini,
        "sinkhorn_mixing": q_sinkhorn_mixing,
        "four_cliques": q_four_cliques,
        "cochange_lift": q_cochange_lift,
        "dyad_census": q_dyad_census,
        "local_bridges": q_local_bridges,
        "event_transitions": q_event_transitions,
        "edit_distance_dups": q_edit_distance_dups,
        # -- r4 head block 2 (5): ADVICE-fix-adjacent rows (cms
        # left-join probe; quantiles null filter; containment
        # distinct; salsa iters guard); the four VERDICT-mandated
        # rows that used to lead this block moved to block -1 at the
        # registry head so the 50-row gate snapshot reaches them --
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "cms_incremental": q_cms_incremental,
        "price_quantiles": q_price_quantiles,
        "containment_dups": q_containment,
        "salsa": q_salsa,
        # -- r4 head block 2b (7): new operators this round --
        "lm_quality": q_lm_quality,
        "pmi_collocations": q_pmi_collocations,
        "boilerplate_lines": q_boilerplate_lines,
        "source_overlap": q_source_overlap,
        "doclen_histogram": q_doclen_histogram,
        "eigenvector": q_eigenvector,
        "pseudo_diameter": q_pseudo_diameter,
        # -- r4 head block 3 (20 in top-50): oldest driver proofs
        # (r1+r2 era) rotate back in to refresh the headline algorithms
        # (random_walks/component_stats/dedup_exact fall just past the
        # 50-row snapshot; both have r1+r2 proofs) --
        # rotate back in to refresh the headline algorithms --
        "pagerank": q_pagerank,
        "pagerank_spmv": q_pagerank_spmv,
        "pagerank_weighted": q_pagerank_weighted,
        "personalized_pagerank": q_ppr,
        "wcc": q_wcc,
        "wcc_jump": q_wcc_jump,
        "wcc_incremental": q_wcc_incremental,
        "hits": q_hits,
        "lpa": q_lpa,
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
        "dedup_exact": q_dedup_exact,
        # -- tail: driver-proven in r3 (or r1/r2 rows awaiting their
        # next rotation); all remain replica-checked every session --
        "maximal_matching": q_matching,
        "butterflies": q_butterflies,
        "graph_coloring": q_coloring,
        "min_spanning_forest": q_msf,
        "copurchase_topk": q_copurchase,
        "knn_graph": q_knn_graph,
        "pq_ann": q_pq_ann,
        "event_funnel": q_funnel,
        "motif_census": q_motif_census,
        "hll_user_cardinality": q_hll_user_cardinality,
        "densest_subgraph": q_densest,
        "butterfly_vertices": q_butterfly_vertices,
        "rich_club": q_rich_club,
        "revenue_rollup": q_revenue_rollup,
        "value_outliers": q_value_outliers,
        "negative_sampling": q_negative_sampling,
        "linkpred_eval": q_linkpred_eval,
        "source_health": q_source_health,
        "co_activity_edges": q_co_activity,
        "percolation": q_percolation,
        "oov_stats": q_oov,
        "topo_levels": q_topo_levels,
        "dedup_incremental": q_dedup_incremental,
        "seeded_lpa": q_seeded_lpa,
        "kmeans_clusters": q_kmeans_clusters,
        "chunk_dedup": q_chunk_dedup,
        "corpus_curation": q_corpus_curation,
        "stratified_sample": q_stratified_sample,
        "hash_split": q_hash_split,
        "simhash": q_simhash,
        "simhash_dups": q_simhash_dups,
        "doc_fingerprint": q_doc_fingerprint,
        "lsh_ann": q_lsh_ann,
        "ann_topk": q_ann_topk,
        "ivf_ann": q_ivf_ann,
        "embedding_dedup": q_embedding_dedup,
        "lang_distribution": q_lang_distribution,
        "lang_id": q_lang_id,
        "minhash_lsh_candidates": q_minhash_candidates,
        "ngram_jaccard_dups": q_ngram_jaccard,
        "similarity_threshold": q_similarity_threshold,
        "media_features": q_media_features,
        "spread_behaviour": q_spread_behaviour,
        "co_occurrence_edges": q_edges,
        "degrees": q_degrees,
        "graph_stats": q_graph_stats,
        "gnn_neighbor_sample": q_gnn_neighbor_sample,
        "degree_histogram": q_degree_histogram,
        "common_neighbors": q_common_neighbors,
        "common_neighbor_lists": q_common_neighbor_lists,
        "link_jaccard": q_link_jaccard,
        "link_adamic_adar": q_link_adamic_adar,
        "common_neighbor_payload": q_common_neighbor_payload,
        "tree_stat": q_tree_stat,
        "closeness_sampled": q_closeness,
        "louvain_multi": q_louvain_multi,
        "louvain_density": q_louvain_density,
        "nstep_exact": q_nstep_exact,
        "node2vec_walks": q_node2vec_walks,
        "metapath_walks": q_metapath_walks,
        "component_edges": q_component_edges,
        "major_component_edges": q_major_component_edges,
        "events_windowed": q_events_windowed,
        "events_sessions": q_events_sessions,
        "dedup_clusters": q_dedup_clusters,
        "dedup_apply": q_dedup_apply,
        "dup_cross_sources": q_dup_cross_sources,
        "dedup_savings": q_dedup_savings,
        "token_count": q_token_count,
        "text_quality": q_text_quality,
        "quality_filter": q_quality_filter,
        # -- r4 continuation: training-feed assembly --
        "sequence_packing": q_sequence_packing,
        "mixture_weights": q_mixture_weights,
        "snapshot_diff": q_snapshot_diff,
        # -- r4 continuation: superstep telemetry + attribute cuts --
        "wcc_trace": q_wcc_trace,
        "lang_conductance": q_lang_conductance,
        "ppr_sweep": q_ppr_sweep,
        "edge_betweenness": q_edge_betweenness,
        "onion_layers": q_onion_layers,
        # -- r4 session 7: graph geometry + cover certificates +
        # stream-disorder audit --
        "forman_curvature": q_forman_curvature,
        "vertex_cover": q_vertex_cover,
        "out_of_order_stats": q_out_of_order_stats,
        "scan_clusters": q_scan_clusters,
        "pq_recall": q_pq_recall,
        "matryoshka_recall": q_matryoshka_recall,
        "wedge_closure": q_wedge_closure,
        "embedding_anisotropy": q_embedding_anisotropy,
        "kcenter_seeds": q_kcenter_seeds,
        "davies_bouldin": q_davies_bouldin,
        "priority_late_orders": q_priority_late_orders,
        "readability_cli": q_readability_cli,
        "snn_clusters": q_snn_clusters,
        "wl_colors": q_wl_colors,
        "knn_label_noise": q_knn_label_noise,
        "nearest_centroid_accuracy": q_nearest_centroid_accuracy,
        "dag_critical_path": q_dag_critical_path,
        "k_anonymity": q_k_anonymity,
        "abc_classification": q_abc_classification,
        "linkpred_first_rank": q_linkpred_first_rank,
        "rbm_pairs": q_rbm_pairs,
        "hashing_trick_audit": q_hashing_trick_audit,
        "spectral_moments": q_spectral_moments,
        "seasonal_naive_error": q_seasonal_naive_error,
        "bond_percolation": q_bond_percolation,
        "selfjoin_size_audit": q_selfjoin_size_audit,
        "user_twap": q_user_twap,
        "lang_source_chisq": q_lang_source_chisq,
        "clustering_agreement": q_clustering_agreement,
        "latency_variance": q_latency_variance,
        "repeat_customer_revenue": q_repeat_customer_revenue,
        "dormant_balance_gap": q_dormant_balance_gap,
        "length_qq_table": q_length_qq_table,
        "missing_days": q_missing_days,
        "customer_streaks": q_customer_streaks,
        "strength_core": q_strength_core,
        "casing_profile": q_casing_profile,
        "kmv_jaccard": q_kmv_jaccard,
        "stickiness": q_stickiness,
        "attribution_comparison": q_attribution_comparison,
        "revenue_lorenz": q_revenue_lorenz,
        "hourly_conversion": q_hourly_conversion,
        "single_source_parts": q_single_source_parts,
        "customer_value_drift": q_customer_value_drift,
        "supplier_percentile": q_supplier_percentile,
        "gini_mean_difference": q_gini_mean_difference,
        "dup_order_audit": q_dup_order_audit,
        "triangle_participation": q_triangle_participation,
        "supplier_rank_corr": q_supplier_rank_corr,
        "algebraic_connectivity": q_algebraic_connectivity,
        "bracket_balance": q_bracket_balance,
        "ptype_revenue": q_ptype_revenue,
        "tax_incidence": q_tax_incidence,
        "lineitem_corr_matrix": q_lineitem_corr_matrix,
        "monthly_profile": q_monthly_profile,
        "daily_error_rate": q_daily_error_rate,
        "coreness_degree_corr": q_coreness_degree_corr,
        "circuit_rank": q_circuit_rank,
        "token_length_profile": q_token_length_profile,
        "linenumber_audit": q_linenumber_audit,
        "supplier_brand_focus": q_supplier_brand_focus,
        "nation_arpu": q_nation_arpu,
        "first_day_conversion": q_first_day_conversion,
    }


def oracle_sql() -> dict[str, str]:
    from plato_spark.functions.text import PORTABLE_H1_SQL, PORTABLE_H2_SQL

    stop_re = "(?i)\\b(the|a|of|and|to|in|is|for|on|with)\\b"
    return {
        "asof_attribution": """
WITH l AS (SELECT event_id AS conversion_id, user_id, ts
           FROM events WHERE event_type = 'purchase'),
r AS (SELECT event_id, user_id, ts
      FROM events WHERE event_type IN ('view', 'click'))
SELECT l.conversion_id, l.user_id,
       m.event_id AS touch_id,
       CASE WHEN m.event_id IS NOT NULL
            THEN epoch_us(l.ts) - epoch_us(m.ts) END AS gap_us
FROM l LEFT JOIN LATERAL (
  SELECT r.event_id, r.ts FROM r
  WHERE r.user_id = l.user_id AND r.ts <= l.ts
  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) m ON true
ORDER BY conversion_id""",
        "interval_counts": """
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS lts
           FROM events WHERE event_type = 'error'),
r AS (SELECT user_id, epoch_us(ts) AS rts
      FROM events WHERE event_type IN ('view', 'click'))
SELECT l.event_id, l.user_id,
       CAST(count(r.rts) AS BIGINT) AS n_touches
FROM l LEFT JOIN r
  ON l.user_id = r.user_id
 AND r.rts < l.lts AND r.rts >= l.lts - 600000000
GROUP BY l.event_id, l.user_id ORDER BY l.event_id""",
        "large_orders": """
WITH q AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 200)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice, q.sum_qty
FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_orderkey""",
        "promo_revenue": """
WITH b AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round((1.0 - l_discount) * 100, 0) AS BIGINT) AS rev_u,
         p_type LIKE 'PROMO%' AS is_promo
  FROM lineitem JOIN part ON p_partkey = l_partkey),
g AS (
  SELECT month,
         CAST(sum(CASE WHEN is_promo THEN rev_u ELSE 0 END) AS BIGINT)
           AS promo_u,
         CAST(sum(rev_u) AS BIGINT) AS total_u
  FROM b GROUP BY month)
SELECT month, round(CAST(promo_u AS DOUBLE) / 1e4, 2) AS promo_rev,
       round(CAST(total_u AS DOUBLE) / 1e4, 2) AS total_rev,
       CASE WHEN total_u > 0
            THEN round(CAST(100 * promo_u AS DOUBLE) / total_u, 6)
       END AS promo_pct
FROM g ORDER BY month""",
        "pricing_summary": """
WITH b AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc,
         CAST(round(l_discount * 100, 0) AS BIGINT) AS dc,
         CAST(round(l_tax * 100, 0) AS BIGINT) AS tc
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'),
g AS (
  SELECT l_returnflag, l_linestatus,
         CAST(sum(qty) AS BIGINT) AS sum_qty,
         CAST(sum(pc) AS BIGINT) AS base_c,
         CAST(sum(pc * (100 - dc)) AS BIGINT) AS dp_u,
         CAST(sum(pc * (100 - dc) * (100 + tc)) AS BIGINT) AS ch_u,
         CAST(sum(dc) AS BIGINT) AS dcs,
         CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus, sum_qty,
       round(CAST(base_c AS DOUBLE) / 100.0, 2) AS sum_base,
       round(CAST(dp_u AS DOUBLE) / 1e4, 2) AS sum_disc_price,
       round(CAST(ch_u AS DOUBLE) / 1e6, 2) AS sum_charge,
       round(CAST(sum_qty AS DOUBLE) / n, 6) AS avg_qty,
       round(CAST(base_c AS DOUBLE) / (100.0 * n), 6) AS avg_price,
       round(CAST(dcs AS DOUBLE) / (100.0 * n), 6) AS avg_disc,
       n
FROM g ORDER BY l_returnflag, l_linestatus""",
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
        "shingle_novelty": f"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text,
                                '{TOKEN_RE_SQL}') AS toks FROM documents),
            sh AS MATERIALIZED (SELECT doc_id,
              CASE WHEN length(toks) >= 8 THEN
                list_distinct([array_to_string(toks[i:i+7], ' ')
                               for i in range(1, length(toks) - 6)])
              ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
            ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
            hh AS MATERIALIZED (
              SELECT DISTINCT doc_id AS id, {H1_SQL.format(s='s')} AS h
              FROM ex),
            f AS MATERIALIZED (
              SELECT h, min(id) AS first_id FROM hh GROUP BY h)
            SELECT id, CAST(count(*) AS BIGINT) AS n_shingles,
                   CAST(sum(CASE WHEN id = first_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel,
                   round(CAST(sum(CASE WHEN id = first_id THEN 1 ELSE 0
                                  END) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS novelty
            FROM hh JOIN f USING (h) GROUP BY id""",
        "winnow_fingerprints": f"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text,
                                '{TOKEN_RE_SQL}') AS toks FROM documents),
            g AS MATERIALIZED (SELECT doc_id,
              [{H1_SQL.format(s="array_to_string(toks[i:i+4], '')")}
               for i in range(1, greatest(length(toks) - 4, 1) + 1)] AS hs
              FROM t),
            e AS MATERIALIZED (
              SELECT doc_id, unnest(hs) AS h,
                     CAST(generate_subscripts(hs, 1) AS BIGINT) AS pos
              FROM g),
            mm AS (SELECT doc_id, CAST(max(pos) AS BIGINT) AS m
                   FROM e GROUP BY doc_id),
            st AS (SELECT doc_id,
                          unnest(range(1, greatest(m - 3, 1) + 1)) AS s
                   FROM mm),
            wmin AS (SELECT st.doc_id, st.s, min(e.h) AS fp
                     FROM st JOIN e ON e.doc_id = st.doc_id
                                   AND e.pos BETWEEN st.s AND st.s + 3
                     GROUP BY st.doc_id, st.s),
            sel AS (SELECT w.doc_id, w.s, CAST(max(e.pos) AS BIGINT) AS pos,
                           w.fp
                    FROM wmin w JOIN e ON e.doc_id = w.doc_id
                                      AND e.h = w.fp
                                      AND e.pos BETWEEN w.s AND w.s + 3
                    GROUP BY w.doc_id, w.s, w.fp)
            SELECT DISTINCT doc_id AS id, pos, fp FROM sel""",
        "reference_graph": _sql_reference_graph(),
        "hub_removal": _sql_hub_removal(HUB_SWEEP_KS, HUB_SWEEP_SQL_ITERS),
        "random_removal": _sql_random_removal(HUB_SWEEP_KS,
                                              HUB_SWEEP_SQL_ITERS),
        "component_stability": _sql_component_stability(HUB_SWEEP_SQL_ITERS),
        "degree_incremental": SQL_GRAPH_PREFIX
        + "SELECT id, deg FROM deg",
        "sp_counts": _sql_sp_counts(SP_COUNT_SQL_LEVELS),
        "bloom_prune": f"""
            WITH bk AS MATERIALIZED (
              SELECT DISTINCT CAST(c_custkey AS BIGINT) AS k
              FROM customer WHERE c_custkey % 3 = 0),
            pk AS MATERIALIZED (
              SELECT DISTINCT CAST(o_custkey AS BIGINT) AS k FROM orders),
            bbits AS MATERIALIZED (
              SELECT DISTINCT
                ({PORTABLE_H1_SQL.format(
                    s="('bloom|' || CAST(k AS VARCHAR))")}
                 + i * {PORTABLE_H2_SQL.format(
                    s="('bloom|' || CAST(k AS VARCHAR))")}) % 2048 AS bit
              FROM bk, (VALUES (0), (1), (2), (3)) AS js(i)),
            pbits AS MATERIALIZED (
              SELECT DISTINCT k,
                ({PORTABLE_H1_SQL.format(
                    s="('bloom|' || CAST(k AS VARCHAR))")}
                 + i * {PORTABLE_H2_SQL.format(
                    s="('bloom|' || CAST(k AS VARCHAR))")}) % 2048 AS bit
              FROM pk, (VALUES (0), (1), (2), (3)) AS js(i)),
            need AS (SELECT k, count(*) AS need FROM pbits GROUP BY k),
            have AS (SELECT p.k, count(*) AS have
                     FROM pbits p JOIN bbits b ON p.bit = b.bit GROUP BY p.k),
            pass_ AS (SELECT need.k FROM need JOIN have ON need.k = have.k
                      WHERE need.need = have.have),
            s AS (SELECT
               (SELECT CAST(count(*) AS BIGINT) FROM bk) AS build_keys,
               (SELECT CAST(count(*) AS BIGINT) FROM pk) AS probe_keys,
               (SELECT CAST(count(*) AS BIGINT) FROM pk
                WHERE k IN (SELECT k FROM bk)) AS true_matches,
               (SELECT CAST(count(*) AS BIGINT) FROM pass_) AS bloom_pass)
            SELECT build_keys, probe_keys, true_matches, bloom_pass,
                   CAST(bloom_pass - true_matches AS BIGINT)
                     AS false_positives
            FROM s""",
        "cdc_chunks": f"""
            WITH base AS (SELECT doc_id, text, length(text) AS ln,
                            greatest(length(text) - 7, 1) AS npos
                          FROM documents),
            pos AS (SELECT doc_id, text, ln,
                           unnest(range(1, npos + 1)) AS i
                    FROM base),
            cuts AS (SELECT doc_id, i FROM pos
                     WHERE i >= 2
                       AND {H1_SQL.format(
                           s="substr(text, CAST(i AS INT), 8)")} % 64 = 0),
            starts AS (SELECT doc_id, CAST(1 AS BIGINT) AS s FROM base
                       UNION ALL SELECT doc_id, CAST(i AS BIGINT) FROM cuts),
            ord AS (SELECT st.doc_id, st.s,
                           lead(st.s) OVER (PARTITION BY st.doc_id
                                            ORDER BY st.s) AS nxt,
                           b.ln, b.text
                    FROM starts st JOIN base b ON st.doc_id = b.doc_id),
            ch AS (SELECT md5(substr(text, CAST(s AS INT),
                              CAST(COALESCE(nxt, ln + 1) - s AS INT)))
                            AS dig,
                          COALESCE(nxt, ln + 1) - s AS clen
                   FROM ord),
            g AS (SELECT dig, CAST(count(*) AS BIGINT) AS cnt,
                         CAST(max(clen) AS BIGINT) AS clen
                  FROM ch GROUP BY dig)
            SELECT CAST(COALESCE(sum(cnt), 0) AS BIGINT) AS n_chunks,
                   CAST(count(*) AS BIGINT) AS distinct_chunks,
                   CAST(COALESCE(sum(cnt - 1), 0) AS BIGINT)
                     AS dup_occurrences,
                   CAST(COALESCE(sum((cnt - 1) * clen), 0) AS BIGINT)
                     AS reclaimable_chars
            FROM g""",
        "triangle_incremental": SQL_GRAPH_PREFIX
        + """SELECT
              (SELECT CAST(count(*) AS BIGINT)
               FROM canon a JOIN canon b ON a.dst = b.src
               JOIN canon c ON c.src = a.src AND c.dst = b.dst) AS triangles,
              (SELECT CAST(count(*) AS BIGINT) FROM canon) AS edges,
              CAST(3 AS BIGINT) AS epoch""",
        "directed_assortativity": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            e AS MATERIALIZED (
              SELECT DISTINCT src, dst FROM g WHERE src != dst),
            od AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS od
                   FROM e GROUP BY src),
            ig AS (SELECT dst AS id, CAST(count(*) AS DOUBLE) AS ig
                   FROM e GROUP BY dst),
            vv AS MATERIALIZED (
              SELECT v.id, COALESCE(od.od, 0) AS od, COALESCE(ig.ig, 0) AS ig
              FROM (SELECT src AS id FROM e UNION SELECT dst FROM e) v
              LEFT JOIN od ON v.id = od.id LEFT JOIN ig ON v.id = ig.id),
            j AS (SELECT s.od AS xo, s.ig AS xi, d.od AS yo, d.ig AS yi
                  FROM e JOIN vv s ON e.src = s.id JOIN vv d ON e.dst = d.id),
            a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   sum(xo) AS sxo, sum(xi) AS sxi,
                   sum(yo) AS syo, sum(yi) AS syi,
                   sum(xo*xo) AS sxo2, sum(xi*xi) AS sxi2,
                   sum(yo*yo) AS syo2, sum(yi*yi) AS syi2,
                   sum(xo*yo) AS sxoyo, sum(xo*yi) AS sxoyi,
                   sum(xi*yo) AS sxiyo, sum(xi*yi) AS sxiyi
                  FROM j)
            SELECT 'out-in' AS mode,
                   CASE WHEN n*sxo2 - sxo*sxo > 0 AND n*syi2 - syi*syi > 0
                        THEN round((n*sxoyi - sxo*syi)
                             / (sqrt(n*sxo2 - sxo*sxo)
                                * sqrt(n*syi2 - syi*syi)), 6)
                   END AS assortativity FROM a
            UNION ALL
            SELECT 'out-out',
                   CASE WHEN n*sxo2 - sxo*sxo > 0 AND n*syo2 - syo*syo > 0
                        THEN round((n*sxoyo - sxo*syo)
                             / (sqrt(n*sxo2 - sxo*sxo)
                                * sqrt(n*syo2 - syo*syo)), 6)
                   END FROM a
            UNION ALL
            SELECT 'in-in',
                   CASE WHEN n*sxi2 - sxi*sxi > 0 AND n*syi2 - syi*syi > 0
                        THEN round((n*sxiyi - sxi*syi)
                             / (sqrt(n*sxi2 - sxi*sxi)
                                * sqrt(n*syi2 - syi*syi)), 6)
                   END FROM a
            UNION ALL
            SELECT 'in-out',
                   CASE WHEN n*sxi2 - sxi*sxi > 0 AND n*syo2 - syo*syo > 0
                        THEN round((n*sxiyo - sxi*syo)
                             / (sqrt(n*sxi2 - sxi*sxi)
                                * sqrt(n*syo2 - syo*syo)), 6)
                   END FROM a""",
        "markov_eval": """
            WITH t0 AS MATERIALIZED (
              SELECT t AS s, nt AS d, CAST(count(*) AS BIGINT) AS n
              FROM (SELECT event_type AS t,
                           lead(event_type) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id)
                             AS nt
                    FROM events
                    WHERE date_diff('day', DATE '1970-01-01',
                                    CAST(ts AS DATE)) % 2 = 0) x
              WHERE nt IS NOT NULL GROUP BY 1, 2),
            t1 AS MATERIALIZED (
              SELECT t AS s, nt AS d, CAST(count(*) AS BIGINT) AS n
              FROM (SELECT event_type AS t,
                           lead(event_type) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id)
                             AS nt
                    FROM events
                    WHERE date_diff('day', DATE '1970-01-01',
                                    CAST(ts AS DATE)) % 2 = 1) x
              WHERE nt IS NOT NULL GROUP BY 1, 2),
            pred AS (SELECT s, d AS pred FROM (
                       SELECT s, d, row_number() OVER (
                         PARTITION BY s ORDER BY n DESC, d) AS rk
                       FROM t0) z WHERE rk = 1),
            ntr AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS n_train
                    FROM t0),
            sc AS (SELECT
                     CAST(COALESCE(sum(t1.n), 0) AS BIGINT) AS n_eval,
                     CAST(COALESCE(sum(CASE WHEN t1.d = pred.pred
                                            THEN t1.n ELSE 0 END), 0)
                          AS BIGINT) AS correct
                   FROM t1 LEFT JOIN pred ON t1.s = pred.s)
            SELECT n_train, n_eval, correct,
                   CASE WHEN n_eval > 0
                        THEN round(CAST(correct AS DOUBLE) / n_eval, 6)
                   END AS accuracy
            FROM ntr, sc""",
        "snm_candidates": """
            WITH k AS (SELECT doc_id,
                         substr(lower(regexp_replace(text,
                                '[^A-Za-z0-9]', '', 'g')), 1, 24) AS key
                       FROM documents),
            r AS (SELECT doc_id,
                         row_number() OVER (ORDER BY key, doc_id) AS rk
                  FROM k)
            SELECT least(a.doc_id, b.doc_id) AS a,
                   greatest(a.doc_id, b.doc_id) AS b
            FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk <= 7""",
        "label_consistency": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            sup AS (SELECT DISTINCT least(src, dst) AS a,
                           greatest(src, dst) AS b
                    FROM g WHERE src != dst),
            sym AS (SELECT a AS u, b AS v FROM sup
                    UNION ALL SELECT b, a FROM sup),
            j AS (SELECT sym.u, du.lang AS own, dv.lang AS nl
                  FROM sym JOIN documents du ON sym.u = du.doc_id
                           JOIN documents dv ON sym.v = dv.doc_id)
            SELECT u AS id, own AS label,
                   CAST(count(*) AS BIGINT) AS nbr_total,
                   CAST(sum(CASE WHEN own = nl THEN 1 ELSE 0 END)
                        AS BIGINT) AS nbr_same,
                   round(CAST(sum(CASE WHEN own = nl THEN 1 ELSE 0 END)
                              AS DOUBLE) / count(*), 6) AS consistency
            FROM j GROUP BY u, own""",
        "triad_census": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            dy AS MATERIALIZED (
              SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                     CAST(max(CASE WHEN src < dst THEN 1 ELSE 0 END)
                          AS TINYINT) AS f,
                     CAST(max(CASE WHEN src > dst THEN 1 ELSE 0 END)
                          AS TINYINT) AS r
              FROM g GROUP BY 1, 2),
            v AS MATERIALIZED (SELECT DISTINCT doc_id AS id FROM documents),
            tri AS (SELECT v1.id AS p, v2.id AS q, v3.id AS s
                    FROM v v1 JOIN v v2 ON v1.id < v2.id
                              JOIN v v3 ON v2.id < v3.id),
            tt AS (SELECT
                     COALESCE(d1.f, 0) AS f1, COALESCE(d1.r, 0) AS b1,
                     COALESCE(d2.f, 0) AS f2, COALESCE(d2.r, 0) AS b2,
                     COALESCE(d3.f, 0) AS f3, COALESCE(d3.r, 0) AS b3
                   FROM tri
                   LEFT JOIN dy d1 ON d1.a = tri.p AND d1.b = tri.q
                   LEFT JOIN dy d2 ON d2.a = tri.p AND d2.b = tri.s
                   LEFT JOIN dy d3 ON d3.a = tri.q AND d3.b = tri.s),
            inv AS (SELECT
               f1*b1 + f2*b2 + f3*b3 AS m,
               (f1+b1-2*f1*b1) + (f2+b2-2*f2*b2) + (f3+b3-2*f3*b3) AS a,
               (f1-f1*b1)+(f2-f2*b2) AS op, (b1-f1*b1)+(b2-f2*b2) AS ip,
               (b1-f1*b1)+(f3-f3*b3) AS oq, (f1-f1*b1)+(b3-f3*b3) AS iq,
               (b2-f2*b2)+(b3-f3*b3) AS os, (f2-f2*b2)+(f3-f3*b3) AS is_,
               f1*b1 AS m1, f2*b2 AS m2
              FROM tt),
            cls AS (SELECT CASE
               WHEN m = 0 AND a = 0 THEN '003'
               WHEN m = 0 AND a = 1 THEN '012'
               WHEN m = 1 AND a = 0 THEN '102'
               WHEN m = 0 AND a = 2 THEN
                 CASE WHEN greatest(op, oq, os) = 2 THEN '021D'
                      WHEN greatest(ip, iq, is_) = 2 THEN '021U'
                      ELSE '021C' END
               WHEN m = 1 AND a = 1 THEN
                 CASE WHEN (CASE WHEN m1 = 1 THEN os WHEN m2 = 1 THEN oq
                                 ELSE op END) = 1
                      THEN '111D' ELSE '111U' END
               WHEN m = 0 AND a = 3 THEN
                 CASE WHEN op = 1 AND ip = 1 AND oq = 1 AND iq = 1
                           AND os = 1 AND is_ = 1
                      THEN '030C' ELSE '030T' END
               WHEN m = 1 AND a = 2 THEN
                 CASE WHEN (CASE WHEN m1 = 1 THEN os WHEN m2 = 1 THEN oq
                                 ELSE op END) = 2 THEN '120D'
                      WHEN (CASE WHEN m1 = 1 THEN is_ WHEN m2 = 1 THEN iq
                                 ELSE ip END) = 2 THEN '120U'
                      ELSE '120C' END
               WHEN m = 2 AND a = 0 THEN '201'
               WHEN m = 2 AND a = 1 THEN '210'
               ELSE '300' END AS triad
              FROM inv)
            SELECT t.triad, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
            FROM (VALUES ('003'),('012'),('102'),('021D'),('021U'),
                         ('021C'),('111D'),('111U'),('030T'),('030C'),
                         ('201'),('120D'),('120U'),('120C'),('210'),
                         ('300')) AS t(triad)
            LEFT JOIN (SELECT triad, CAST(count(*) AS BIGINT) AS n
                       FROM cls GROUP BY 1) c
                   ON t.triad = c.triad""",
        "style_divergence": f"""
            WITH t AS MATERIALIZED (
              SELECT source,
                     unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                       AS token
              FROM documents),
            gc AS MATERIALIZED (
              SELECT token, CAST(count(*) AS BIGINT) AS gc
              FROM t GROUP BY token),
            vocab AS MATERIALIZED (
              SELECT token, gc FROM gc
              ORDER BY gc DESC, token ASC LIMIT 200),
            sc AS MATERIALIZED (
              SELECT source, token, CAST(count(*) AS BIGINT) AS sc
              FROM t GROUP BY source, token),
            st AS (SELECT source, CAST(sum(sc) AS BIGINT) AS ns
                   FROM sc GROUP BY source),
            gt AS (SELECT CAST(sum(gc) AS BIGINT) AS n FROM gc),
            cells AS (
              SELECT st.source, st.ns, v.gc,
                     CAST(COALESCE(sc.sc, 0) AS BIGINT) AS sc
              FROM st CROSS JOIN vocab v
              LEFT JOIN sc ON sc.source = st.source AND sc.token = v.token),
            agg AS (
              SELECT source, ns, n,
                     CAST(sum(abs(sc * n - gc * ns)) AS BIGINT) AS head_num,
                     CAST(sum(sc) AS BIGINT) AS head_sc,
                     CAST(sum(gc) AS BIGINT) AS head_gc
              FROM cells, gt GROUP BY source, ns, n)
            SELECT source, ns AS n_tokens,
                   round(CAST(head_num
                              + abs((ns - head_sc) * n - (n - head_gc) * ns)
                              AS DOUBLE)
                         / (2.0 * ns * n), 6) AS tv
            FROM agg""",
        "pagerank_citation": _sql_pagerank(
            PRC_ITERS, prefix=_sql_citation_prefix()
        ),
        "co_citation": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            kv AS (SELECT DISTINCT src AS k, dst AS v FROM g),
            ok AS (SELECT k FROM kv GROUP BY k HAVING count(*) <= 256),
            k2 AS MATERIALIZED (
              SELECT kv.k, kv.v FROM kv JOIN ok ON kv.k = ok.k)
            SELECT a.v AS a, b.v AS b, CAST(count(*) AS BIGINT) AS weight
            FROM k2 a JOIN k2 b ON a.k = b.k AND a.v < b.v
            GROUP BY 1, 2""",
        "biblio_coupling": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            kv AS (SELECT DISTINCT dst AS k, src AS v FROM g),
            ok AS (SELECT k FROM kv GROUP BY k HAVING count(*) <= 256),
            k2 AS MATERIALIZED (
              SELECT kv.k, kv.v FROM kv JOIN ok ON kv.k = ok.k)
            SELECT a.v AS a, b.v AS b, CAST(count(*) AS BIGINT) AS weight
            FROM k2 a JOIN k2 b ON a.k = b.k AND a.v < b.v
            GROUP BY 1, 2""",
        "degree_clustering": SQL_GRAPH_PREFIX
        + """, tri AS MATERIALIZED (
  SELECT a.src AS x, a.dst AS y, b.dst AS z
  FROM canon a JOIN canon b ON a.dst = b.src
  JOIN canon c ON c.src = a.src AND c.dst = b.dst),
corners AS (SELECT x AS id FROM tri UNION ALL
            SELECT y AS id FROM tri UNION ALL
            SELECT z AS id FROM tri),
tv AS (SELECT id, CAST(count(*) AS BIGINT) AS t FROM corners GROUP BY id),
pv AS (SELECT d.id, d.deg, COALESCE(tv.t, 0) AS t
       FROM deg d LEFT JOIN tv ON d.id = tv.id),
cls AS (SELECT deg, CAST(count(*) AS BIGINT) AS n_vertices,
               CAST(sum(2 * t) AS BIGINT) AS closed,
               CAST(sum(deg * (deg - 1)) AS BIGINT) AS possible
        FROM pv GROUP BY deg)
SELECT CAST(deg AS BIGINT) AS deg, n_vertices, closed, possible,
       CASE WHEN possible > 0
            THEN round(CAST(closed AS DOUBLE) / possible, 6)
            ELSE 0.0 END AS cc
FROM cls""",
        "strength_disparity": SQL_GRAPH_PREFIX
        + """
            SELECT id, deg, strength,
                   round(CAST(sq AS DOUBLE)
                         / CAST(strength * strength AS DOUBLE), 6)
                     AS disparity
            FROM (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg,
                         CAST(sum(CAST(weight AS BIGINT)) AS BIGINT)
                           AS strength,
                         CAST(sum(CAST(weight AS BIGINT)
                                  * CAST(weight AS BIGINT)) AS BIGINT) AS sq
                  FROM edges GROUP BY src)""",
        "edge_smoothness": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            d AS (SELECT CAST(x.n_chars - y.n_chars AS BIGINT) AS diff
                  FROM g JOIN documents x ON g.src = x.doc_id
                         JOIN documents y ON g.dst = y.doc_id),
            a AS (SELECT CAST(count(*) AS BIGINT) AS m_edges,
                         CAST(COALESCE(sum(diff * diff), 0) AS BIGINT)
                           AS energy,
                         CAST(COALESCE(sum(abs(diff)), 0) AS BIGINT)
                           AS sum_abs_diff
                  FROM d)
            SELECT m_edges, energy, sum_abs_diff,
                   CASE WHEN m_edges > 0
                        THEN round(CAST(energy AS DOUBLE) / m_edges, 6)
                        ELSE NULL END AS avg_sq_diff
            FROM a""",
        "hub_churn": """
            WITH ue AS MATERIALIZED (
              SELECT DISTINCT user_id AS u, event_type AS t,
                     date_trunc('hour', ts) AS h,
                     date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       % 2 AS p
              FROM events),
            ok AS (SELECT p, t, h FROM ue GROUP BY p, t, h
                   HAVING count(*) <= 256),
            u2 AS MATERIALIZED (
              SELECT ue.p, ue.u, ue.t, ue.h FROM ue
              JOIN ok ON ue.p = ok.p AND ue.t = ok.t AND ue.h = ok.h),
            pairs AS MATERIALIZED (
              SELECT DISTINCT a.p, a.u AS src, b.u AS dst
              FROM u2 a JOIN u2 b
                ON a.p = b.p AND a.t = b.t AND a.h = b.h AND a.u < b.u),
            deg AS (SELECT p, id, CAST(count(*) AS BIGINT) AS deg
                    FROM (SELECT p, src AS id FROM pairs
                          UNION ALL SELECT p, dst FROM pairs)
                    GROUP BY p, id),
            t0 AS (SELECT id, row_number() OVER (ORDER BY deg DESC, id)
                            AS r
                   FROM deg WHERE p = 0 ORDER BY deg DESC, id LIMIT 100),
            t1 AS (SELECT id, row_number() OVER (ORDER BY deg DESC, id)
                            AS r
                   FROM deg WHERE p = 1 ORDER BY deg DESC, id LIMIT 100),
            c AS (SELECT CAST(count(*) AS BIGINT) AS n_common,
                         CAST(COALESCE(sum(abs(t0.r - t1.r)), 0) AS BIGINT)
                           AS footrule
                  FROM t0 JOIN t1 USING (id)),
            en AS (SELECT CAST(count(*) AS BIGINT) AS entered FROM t1
                   WHERE id NOT IN (SELECT id FROM t0)),
            ex AS (SELECT CAST(count(*) AS BIGINT) AS exited FROM t0
                   WHERE id NOT IN (SELECT id FROM t1))
            SELECT n_common, entered, exited, footrule,
                   CASE WHEN n_common > 0
                        THEN round(CAST(footrule AS DOUBLE) / n_common, 6)
                        ELSE NULL END AS avg_rank_shift
            FROM c, en, ex""",
        "bowtie": f"""
            WITH RECURSIVE nn AS (
              SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
              FROM documents),
            d AS (SELECT doc_id,
                    {H1_SQL.format(
                        s="('deg|' || CAST(doc_id AS VARCHAR))")} % 3 AS k
                  FROM documents),
            g AS MATERIALIZED (
              SELECT DISTINCT doc_id AS src,
                     CAST({H1_SQL.format(
                        s="('ref|' || CAST(doc_id AS VARCHAR) || '|' "
                          "|| CAST(j AS VARCHAR))")} % n AS BIGINT) AS dst
              FROM d, nn, (VALUES (0), (1)) AS js(j)
              WHERE j < k
                AND doc_id != {H1_SQL.format(
                        s="('ref|' || CAST(doc_id AS VARCHAR) || '|' "
                          "|| CAST(j AS VARCHAR))")} % n),
            r(u, v) AS (
              SELECT src, dst FROM g
              UNION
              SELECT r.u, g.dst FROM r JOIN g ON r.v = g.src),
            verts AS (SELECT DISTINCT doc_id AS id FROM documents),
            mut AS (SELECT r1.u AS x, min(r1.v) AS m
                    FROM r r1 JOIN r r2 ON r1.u = r2.v AND r1.v = r2.u
                    GROUP BY r1.u),
            lab AS (SELECT v.id, least(v.id, coalesce(mut.m, v.id)) AS label
                    FROM verts v LEFT JOIN mut ON v.id = mut.x),
            core AS (SELECT label FROM lab GROUP BY label
                     ORDER BY count(*) DESC, label LIMIT 1),
            rep AS (SELECT label AS rid FROM core),
            fwd AS (SELECT DISTINCT v AS id FROM r, rep WHERE u = rid),
            bwd AS (SELECT DISTINCT u AS id FROM r, rep WHERE v = rid),
            und AS (SELECT src AS a, dst AS b FROM g
                    UNION SELECT dst, src FROM g),
            w(id) AS (SELECT rid FROM rep
                      UNION
                      SELECT und.b FROM w JOIN und ON w.id = und.a),
            cls AS (SELECT v.id,
                      CASE WHEN l.label = (SELECT label FROM core)
                             THEN 'CORE'
                           WHEN v.id IN (SELECT id FROM bwd) THEN 'IN'
                           WHEN v.id IN (SELECT id FROM fwd) THEN 'OUT'
                           WHEN v.id IN (SELECT id FROM w) THEN 'TENDRIL'
                           ELSE 'DISCONNECTED' END AS component
                    FROM verts v JOIN lab l ON v.id = l.id)
            SELECT cat.component, CAST(coalesce(n, 0) AS BIGINT) AS n
            FROM (VALUES ('CORE'), ('IN'), ('OUT'), ('TENDRIL'),
                         ('DISCONNECTED')) AS cat(component)
            LEFT JOIN (SELECT component, count(*) AS n
                       FROM cls GROUP BY component) c
                   ON cat.component = c.component""",
        "brand_mixing": SQL_GRAPH_PREFIX + """
SELECT x.p_brand AS src_brand, y.p_brand AS dst_brand,
       CAST(count(*) AS BIGINT) AS edges
FROM canon c JOIN part x ON c.src = x.p_partkey
             JOIN part y ON c.dst = y.p_partkey
GROUP BY 1, 2""",
        "source_mixing": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()})
            SELECT x.source AS src_source, y.source AS dst_source,
                   CAST(count(*) AS BIGINT) AS edges
            FROM g JOIN documents x ON g.src = x.doc_id
                   JOIN documents y ON g.dst = y.doc_id
            GROUP BY 1, 2""",
        "cocitation_cosine": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            kv AS (SELECT DISTINCT src AS k, dst AS v FROM g),
            ok AS (SELECT k FROM kv GROUP BY k HAVING count(*) <= 256),
            k2 AS MATERIALIZED (
              SELECT kv.k, kv.v FROM kv JOIN ok ON kv.k = ok.k),
            cc AS MATERIALIZED (
              SELECT a.v AS a, b.v AS b, CAST(count(*) AS BIGINT) AS weight
              FROM k2 a JOIN k2 b ON a.k = b.k AND a.v < b.v
              GROUP BY a.v, b.v),
            ind AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS ind
                    FROM g GROUP BY dst)
            SELECT cc.a, cc.b, cc.weight,
                   round(CAST(cc.weight AS DOUBLE)
                         / sqrt(CAST(da.ind * db.ind AS DOUBLE)), 6)
                     AS cosine
            FROM cc JOIN ind da ON cc.a = da.id JOIN ind db ON cc.b = db.id""",
        "bibcoupling_cosine": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            kv AS (SELECT DISTINCT dst AS k, src AS v FROM g),
            ok AS (SELECT k FROM kv GROUP BY k HAVING count(*) <= 256),
            k2 AS MATERIALIZED (
              SELECT kv.k, kv.v FROM kv JOIN ok ON kv.k = ok.k),
            bc AS MATERIALIZED (
              SELECT a.v AS a, b.v AS b, CAST(count(*) AS BIGINT) AS weight
              FROM k2 a JOIN k2 b ON a.k = b.k AND a.v < b.v
              GROUP BY a.v, b.v),
            outd AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS od
                     FROM g GROUP BY src)
            SELECT bc.a, bc.b, bc.weight,
                   round(CAST(bc.weight AS DOUBLE)
                         / sqrt(CAST(da.od * db.od AS DOUBLE)), 6) AS cosine
            FROM bc JOIN outd da ON bc.a = da.id
                    JOIN outd db ON bc.b = db.id""",
        "degree_quantiles": _sql_degree_quantiles(256),
        "quality_length_corr": _sql_quality_length_corr(),
        "orphan_docs": _sql_orphan_docs(),
        "core_size_curve": _sql_core_size_curve(),
        "weighted_triangles": _sql_weighted_triangles(),
        "dup_cross_sources": _sql_dup_cross_sources(),
        "dedup_savings": _sql_dedup_savings(),
        "lang_mixing": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()})
            SELECT x.lang AS src_lang, y.lang AS dst_lang,
                   CAST(count(*) AS BIGINT) AS edges
            FROM g JOIN documents x ON g.src = x.doc_id
                   JOIN documents y ON g.dst = y.doc_id
            GROUP BY 1, 2""",
        "attr_assortativity": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            e AS (SELECT x.lang AS sl, y.lang AS dl
                  FROM g JOIN documents x ON g.src = x.doc_id
                         JOIN documents y ON g.dst = y.doc_id),
            mm AS (SELECT sl, dl, CAST(count(*) AS BIGINT) AS c
                   FROM e GROUP BY 1, 2),
            r AS (SELECT sl AS l, CAST(sum(c) AS BIGINT) AS rs
                  FROM mm GROUP BY 1),
            c2 AS (SELECT dl AS l, CAST(sum(c) AS BIGINT) AS cs
                   FROM mm GROUP BY 1),
            s AS (SELECT CAST(COALESCE(sum(rs * cs), 0) AS BIGINT) AS sum_rc
                  FROM r JOIN c2 USING (l)),
            t AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS m_edges,
                         CAST(COALESCE(sum(CASE WHEN sl = dl THEN c
                                                ELSE 0 END), 0) AS BIGINT)
                           AS same_label
                  FROM mm)
            SELECT m_edges, same_label, sum_rc,
                   CASE WHEN m_edges * m_edges - sum_rc != 0
                        THEN round(CAST(m_edges * same_label - sum_rc
                                        AS DOUBLE)
                                   / (m_edges * m_edges - sum_rc), 6)
                        ELSE NULL END AS assortativity
            FROM t, s""",
        "retention_cohorts": """
            WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                          FROM events),
            f AS (SELECT user_id, min(day) AS cohort
                  FROM days GROUP BY user_id)
            SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
                   CAST(date_diff('day', f.cohort, d.day) AS BIGINT)
                     AS day_offset,
                   CAST(count(*) AS BIGINT) AS users
            FROM days d JOIN f ON d.user_id = f.user_id
            WHERE date_diff('day', f.cohort, d.day) <= 14
            GROUP BY 1, 2""",
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
        "event_transitions": """
            WITH s AS (SELECT event_type AS t,
                         lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS nt
                       FROM events),
            c AS (SELECT t AS src_type, nt AS dst_type,
                         CAST(count(*) AS BIGINT) AS n
                  FROM s WHERE nt IS NOT NULL GROUP BY 1, 2)
            SELECT src_type, dst_type, n,
                   round(CAST(n AS DOUBLE)
                         / sum(n) OVER (PARTITION BY src_type), 6) AS prob
            FROM c""",
        "edit_distance_dups": f"""
            WITH cand AS MATERIALIZED ({_sql_minhash_candidates()})
            SELECT c.a, c.b,
                   round(1.0 - CAST(levenshtein(x.text, y.text) AS DOUBLE)
                         / greatest(length(x.text), length(y.text), 1), 6)
                     AS edit_sim
            FROM cand c
            JOIN documents x ON c.a = x.doc_id
            JOIN documents y ON c.b = y.doc_id
            WHERE round(1.0 - CAST(levenshtein(x.text, y.text) AS DOUBLE)
                        / greatest(length(x.text), length(y.text), 1), 6)
                  >= 0.3""",
        "inter_event_gaps": """
            WITH x AS (SELECT user_id,
                 date_diff('microsecond',
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id),
                           ts) AS gap
               FROM events)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(gap) AS BIGINT) AS n_gaps,
                   CAST(min(gap) AS BIGINT) AS min_gap_us,
                   CAST(max(gap) AS BIGINT) AS max_gap_us,
                   CAST(CAST(sum(gap) AS BIGINT) // count(gap)
                        AS BIGINT) AS avg_gap_us
            FROM x GROUP BY user_id""",
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
        "cochange_lift": """
            WITH inc AS MATERIALIZED (
              SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
            ok AS (SELECT b FROM inc GROUP BY b HAVING count(*) <= 256),
            inc2 AS MATERIALIZED (
              SELECT inc.b, inc.i FROM inc JOIN ok USING (b)),
            nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets
                   FROM inc2),
            cnt AS MATERIALIZED (
              SELECT i, CAST(count(*) AS BIGINT) AS c FROM inc2 GROUP BY i),
            p AS (SELECT a.i AS src, d.i AS dst,
                         CAST(count(*) AS BIGINT) AS support
                  FROM inc2 a JOIN inc2 d ON a.b = d.b AND a.i < d.i
                  GROUP BY a.i, d.i HAVING count(*) >= 2)
            SELECT src, dst, support,
                   round(CAST(support * n_baskets AS DOUBLE)
                         / CAST(ca.c * cb.c AS DOUBLE), 6) AS lift
            FROM p JOIN cnt ca ON p.src = ca.i
                   JOIN cnt cb ON p.dst = cb.i
                   CROSS JOIN nb
            ORDER BY lift DESC, src ASC, dst ASC LIMIT 50""",
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
        "hapax_stats": f"""
            WITH t AS (SELECT source, unnest(regexp_extract_all(text,
                                '{TOKEN_RE_SQL}')) AS tok FROM documents),
            c AS MATERIALIZED (
              SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
              FROM t GROUP BY source, tok)
            SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hapax,
                   round(CAST(count(*) AS DOUBLE)
                         / CAST(sum(cnt) AS DOUBLE), 6) AS type_token_ratio,
                   round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                              AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio
            FROM c GROUP BY source""",
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
        "topo_levels": """
            WITH dd AS (SELECT DISTINCT doc_id FROM documents),
            d AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1
                              AS BIGINT) AS r FROM dd),
            s AS (SELECT r,
                         (r = 0 OR (CAST(('0x' || substr(md5('topo|' ||
                            CAST(r - 1 AS VARCHAR)), 1, 14)) AS BIGINT)
                            % 2) != 0) AS brk
                  FROM d),
            b AS (SELECT r, CASE WHEN brk THEN r END AS brk_r FROM s)
            SELECT r AS id,
                   CAST(r - max(brk_r) OVER (ORDER BY r
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS level
            FROM b""",
        "seeded_lpa": _sql_seeded_lpa(SEEDED_LPA_ITERS),
        "dedup_incremental": """
            SELECT sha256(text) AS content_sha,
                   CAST(min(doc_id) AS BIGINT) AS keeper_doc,
                   CAST(count(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY sha256(text)""",
        "kmeans_clusters": _sql_kmeans(8, 2),
        "embedding_project": _sql_embedding_project(16),
        "chunk_dedup": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '[A-Za-z0-9_]+') AS ts
                       FROM documents),
            b AS (SELECT doc_id, ts, len(ts) AS n FROM t WHERE len(ts) > 0),
            c AS (SELECT doc_id, ts, n,
                         unnest(generate_series(0,
                           CAST((greatest(n - 64, 0) + 47) // 48 AS INT)))
                           AS chunk_idx
                  FROM b),
            ch AS (SELECT doc_id,
                          CAST(len(list_slice(ts, 1 + chunk_idx * 48,
                                              chunk_idx * 48 + 64)) AS BIGINT)
                            AS n_tokens,
                          array_to_string(list_slice(ts, 1 + chunk_idx * 48,
                                                     chunk_idx * 48 + 64), ' ')
                            AS chunk
                   FROM c)
            SELECT sha256(chunk) AS chunk_sha,
                   CAST(count(*) AS BIGINT) AS n_copies,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   min(doc_id) AS min_doc,
                   CAST(sum(n_tokens) - max(n_tokens) AS BIGINT) AS dup_tokens
            FROM ch GROUP BY sha256(chunk) HAVING count(*) > 1""",
        "co_occurrence_edges": SQL_GRAPH_PREFIX
        + "SELECT src, dst, weight FROM canon ORDER BY src, dst",
        "degrees": SQL_GRAPH_PREFIX
        + "SELECT src AS id, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY src",
        "graph_stats": SQL_GRAPH_PREFIX
        + """SELECT (SELECT CAST(count(*) AS BIGINT) FROM verts) AS n_vertices,
                    (SELECT CAST(max(id) AS BIGINT) FROM verts) AS max_id,
                    (SELECT CAST(count(*) AS BIGINT) FROM canon) AS n_edges""",
        "pagerank": _sql_pagerank(PR_ITERS),
        "pagerank_trace": _sql_pagerank_trace(PR_ITERS),
        "bpe_merges": _sql_bpe_merges(BPE_MERGES),
        "simrank": _sql_simrank(SIMRANK_K, SIMRANK_ITERS),
        "lsh_incremental": _sql_minhash_candidates(),
        "hitting_time": _sql_hitting(HIT_ROUNDS, HIT_SEEDS),
        "attr_diffusion": _sql_attr_diffusion(DIFF_ROUNDS, DIFF_ALPHA),
        "spectral_coord": _sql_spectral(SPECTRAL_ROUNDS),
        "bpe_compression": _sql_bpe_compression(BPE_MERGES),
        "zorder_key": _sql_zorder(16),
        "ivf_recall": _sql_ivf_recall(5),
        "embedding_purity": _sql_embedding_purity(),
        "peak_concurrency": _sql_peak_concurrency(1800),
        "silhouette": _sql_silhouette(),
        "quantiles_incremental": _sql_fixed_hist_quantiles(0.0, 600.0, 256),
        "group_quantiles": _sql_group_quantiles(256),
        "conversion_latency": _sql_conversion_latency(256),
        "trimmed_mean": _sql_trimmed_mean(256),
        "mad_outliers": _sql_mad_outliers(256, 3.0),
        "session_stats": _sql_session_stats(1800),
        "lang_modularity": _sql_lang_modularity(),
        "pca_component": _sql_pca_component(PCA_ROUNDS),
        "norm_quantiles": _sql_norm_quantiles(256),
        "pca_variance": _sql_pca_variance(PCA_ROUNDS),
        "pca_second": _sql_pca_second(PCA_ROUNDS),
        "pca_plane_variance": _sql_pca_plane_variance(PCA_ROUNDS),
        "pca_project": _sql_pca_project(PCA_ROUNDS),
        "instability": f"""
WITH g AS MATERIALIZED ({_sql_reference_graph()}),
fi AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS fan_in
       FROM g GROUP BY dst),
fo AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS fan_out
       FROM g GROUP BY src)
SELECT d.doc_id AS id,
       CAST(COALESCE(fi.fan_in, 0) AS BIGINT) AS fan_in,
       CAST(COALESCE(fo.fan_out, 0) AS BIGINT) AS fan_out,
       CASE WHEN COALESCE(fi.fan_in, 0) + COALESCE(fo.fan_out, 0) > 0
            THEN round(CAST(COALESCE(fo.fan_out, 0) AS DOUBLE)
                       / (COALESCE(fi.fan_in, 0)
                          + COALESCE(fo.fan_out, 0)), 6)
       END AS instability
FROM documents d LEFT JOIN fi ON d.doc_id = fi.id
LEFT JOIN fo ON d.doc_id = fo.id""",
        "weighted_sample": f"""
SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS weight,
       CAST(({H1_SQL.format(s="('wsample|' || CAST(doc_id AS VARCHAR))")})
            AS DOUBLE) / CAST(n_chars AS DOUBLE) AS priority
FROM documents WHERE n_chars > 0
ORDER BY priority, id LIMIT 32""",
        "active_users": """
WITH du AS MATERIALIZED (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u FROM events),
dd AS (SELECT DISTINCT d FROM du)
SELECT strftime(dd.d, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT CASE WHEN du.d = dd.d THEN du.u END) AS BIGINT)
         AS dau,
       CAST(count(DISTINCT CASE WHEN du.d >= dd.d - 6 THEN du.u END)
            AS BIGINT) AS wau,
       CAST(count(DISTINCT du.u) AS BIGINT) AS mau
FROM dd JOIN du ON du.d <= dd.d AND du.d >= dd.d - 27
GROUP BY dd.d ORDER BY day""",
        "vocab_growth": f"""
WITH toks AS MATERIALIZED (
  SELECT CAST(({H1_SQL.format(s="('vg|' || CAST(doc_id AS VARCHAR))")}) % 8
              AS INTEGER) AS batch,
         unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
  FROM documents),
mass AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_tokens
         FROM toks GROUP BY batch),
fst AS (SELECT token, min(batch) AS batch FROM toks GROUP BY token),
news AS (SELECT batch, CAST(count(*) AS BIGINT) AS new_types
         FROM fst GROUP BY batch)
SELECT m.batch, m.n_tokens,
       CAST(COALESCE(nw.new_types, 0) AS BIGINT) AS new_types,
       CAST(sum(COALESCE(nw.new_types, 0)) OVER (
              ORDER BY m.batch ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS vocab_size
FROM mass m LEFT JOIN news nw ON m.batch = nw.batch
ORDER BY m.batch""",
        "vocab_coverage": f"""
WITH tc AS MATERIALIZED (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
    FROM documents) z
  GROUP BY token),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_tokens FROM tc),
rk AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r FROM tc),
cm AS (SELECT r, sum(n) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS cum
       FROM rk),
kd AS (SELECT CAST(k AS INTEGER) AS k
       FROM (VALUES (10), (100), (1000)) AS t(k)),
pick AS (SELECT k, CAST(max(cum) AS BIGINT) AS covered_tokens
         FROM kd JOIN cm ON cm.r <= kd.k GROUP BY k)
SELECT k, covered_tokens, tot.total_tokens,
       round(CAST(100 * covered_tokens AS DOUBLE) / tot.total_tokens, 6)
         AS coverage_pct
FROM pick, tot ORDER BY k""",
        "lang_concentration": """
WITH per AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
             FROM documents GROUP BY source, lang),
a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_langs,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM per GROUP BY source)
SELECT source, n_docs, n_langs,
       round(CAST(ss AS DOUBLE) / (n_docs * n_docs), 6) AS hhi
FROM a ORDER BY source""",
        "trade_volume": """
WITH n AS (SELECT n_nationkey, n_name FROM nation),
sup AS (SELECT s_suppkey, n.n_name AS supp_nation
        FROM supplier s JOIN n ON s.s_nationkey = n.n_nationkey),
cus AS (SELECT c_custkey, n.n_name AS cust_nation
        FROM customer c JOIN n ON c.c_nationkey = n.n_nationkey),
li AS (SELECT l_orderkey, l_suppkey,
              CAST(year(l_shipdate) AS INTEGER) AS year,
              CAST(round(l_extendedprice * 100, 0) AS BIGINT)
              * CAST(round((1.0 - l_discount) * 100, 0) AS BIGINT) AS rev_u
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate <= TIMESTAMP '1997-12-31'),
j AS (SELECT sup.supp_nation, cus.cust_nation, li.year, li.rev_u
      FROM li JOIN sup ON li.l_suppkey = sup.s_suppkey
      JOIN orders o ON li.l_orderkey = o.o_orderkey
      JOIN cus ON o.o_custkey = cus.c_custkey
      WHERE sup.supp_nation <> cus.cust_nation)
SELECT supp_nation, cust_nation, year,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST((sum(rev_u) + 50) // 100 AS BIGINT) / 100.0 AS revenue
FROM j GROUP BY supp_nation, cust_nation, year
ORDER BY supp_nation, cust_nation, year""",
        "blocklist_hits": f"""
WITH t AS (SELECT source,
             length(list_filter(
               regexp_extract_all(text, '{TOKEN_RE_SQL}'),
               x -> list_contains(['slow', 'dup'], x))) AS h
           FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit,
       CAST(sum(h) AS BIGINT) AS n_hits,
       round(CAST(100 * sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hit_pct
FROM t GROUP BY source ORDER BY source""",
        "corpus_card": f"""
WITH t AS (SELECT source, lang,
             CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                  AS BIGINT) AS tk,
             CAST(n_chars AS BIGINT) AS nc, md5(text) AS h,
             length(text) = 0 AS empty
           FROM documents),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(sum(tk) AS BIGINT) AS total_tokens,
             CAST(sum(nc) AS BIGINT) AS total_chars,
             CAST(count(DISTINCT h) AS BIGINT) AS uniq,
             CAST(sum(CASE WHEN empty THEN 1 ELSE 0 END) AS BIGINT)
               AS empty_docs
      FROM t)
SELECT n_docs, n_sources, n_langs, total_tokens, total_chars,
       round(CAST(total_tokens AS DOUBLE) / n_docs, 6) AS avg_tokens,
       CAST(n_docs - uniq AS BIGINT) AS dup_docs,
       round(CAST(100 * (n_docs - uniq) AS DOUBLE) / n_docs, 6) AS dup_pct,
       empty_docs
FROM a""",
        "harmonic_exact": _sql_harmonic_exact(64, bfs_iters=6),
        "asof_next": """
WITH e AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS ts,
                  event_id AS eid
           FROM events),
tch AS MATERIALIZED (SELECT u, ts, eid FROM e
                     WHERE t IN ('view', 'click')),
cv AS MATERIALIZED (SELECT u, ts, eid FROM e WHERE t = 'purchase')
SELECT t.eid AS touch_id, t.u AS user_id,
       CAST(c.ceid AS BIGINT) AS conversion_id,
       CAST(c.gap AS BIGINT) AS gap_us
FROM tch t LEFT JOIN LATERAL (
  SELECT c.eid AS ceid, c.ts - t.ts AS gap
  FROM cv c
  WHERE c.u = t.u AND c.ts >= t.ts AND c.ts <= t.ts + 3600000000
  ORDER BY c.ts, c.eid LIMIT 1) c ON TRUE
ORDER BY touch_id""",
        "embedding_quantization": """
WITH v AS MATERIALIZED (
  SELECT vec_id AS id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
g AS (SELECT max(list_max(list_transform(vec, x -> abs(x)))) AS maxabs
      FROM v),
per AS MATERIALIZED (
  SELECT id, label,
         CASE WHEN g.maxabs > 0 THEN
           list_max(list_transform(vec, x ->
             abs(x - greatest(least(round(x * (127.0 / g.maxabs), 0),
                                    127.0), -127.0)
                     / (127.0 / g.maxabs))))
         ELSE 0.0 END AS verr
  FROM v, g)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(max(verr), 6) AS max_err,
       round(CAST(sum(CAST(round(round(verr, 9) * 1e9, 0) AS BIGINT))
                  AS DOUBLE) / (count(*) * 1e9), 6) AS mean_err
FROM per GROUP BY label ORDER BY label""",
        "mixing_null_model": f"""
            WITH g AS MATERIALIZED ({_sql_reference_graph()}),
            e AS (SELECT x.lang AS sl, y.lang AS dl
                  FROM g JOIN documents x ON g.src = x.doc_id
                         JOIN documents y ON g.dst = y.doc_id),
            mm AS MATERIALIZED (SELECT sl, dl, CAST(count(*) AS BIGINT) AS c
                                FROM e GROUP BY 1, 2),
            r AS (SELECT sl AS l, CAST(sum(c) AS BIGINT) AS rs
                  FROM mm GROUP BY 1),
            c2 AS (SELECT dl AS l, CAST(sum(c) AS BIGINT) AS cs
                   FROM mm GROUP BY 1),
            t AS (SELECT CAST(sum(c) AS BIGINT) AS m FROM mm)
            SELECT r.l AS src_lang, c2.l AS dst_lang,
                   CAST(COALESCE(mm.c, 0) AS BIGINT) AS observed,
                   round(CAST(r.rs * c2.cs AS DOUBLE) / t.m, 6) AS expected,
                   round(CAST(COALESCE(mm.c, 0) * t.m AS DOUBLE)
                         / (r.rs * c2.cs), 6) AS lift
            FROM r CROSS JOIN c2 CROSS JOIN t
            LEFT JOIN mm ON mm.sl = r.l AND mm.dl = c2.l""",
        "burstiness": """
WITH g AS MATERIALIZED (
  SELECT user_id,
         CAST(floor((epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) / 1000000)
         AS BIGINT) AS gs
  FROM events),
a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gs) AS BIGINT) AS s,
             CAST(sum(gs * gs) AS BIGINT) AS ss
      FROM g WHERE gs IS NOT NULL GROUP BY user_id)
SELECT user_id, n_gaps,
       CASE WHEN sqrt(greatest(ss / n_gaps - (s / n_gaps) * (s / n_gaps),
                               0.0)) + s / n_gaps > 0
            THEN round((sqrt(greatest(ss / n_gaps
                                      - (s / n_gaps) * (s / n_gaps), 0.0))
                        - s / n_gaps)
                       / (sqrt(greatest(ss / n_gaps
                                        - (s / n_gaps) * (s / n_gaps), 0.0))
                          + s / n_gaps), 6) END AS b
FROM a ORDER BY user_id""",
        "centroid_similarity": f"""
WITH {_sql_label_centroid_ctes()}
SELECT a.label AS label_a, b.label AS label_b, a.n AS n_a, b.n AS n_b,
       round({_cos_sql("a.cvec", "b.cvec")}, 6) AS cosine
FROM cj a JOIN cj b ON a.label < b.label
ORDER BY label_a, label_b""",
        "windowed_funnel": """
WITH u1 AS MATERIALIZED (
  SELECT user_id AS u, min(ts) AS a FROM events
  WHERE event_type = 'view' GROUP BY user_id),
u2 AS MATERIALIZED (
  SELECT e.user_id AS u, min(e.ts) AS a FROM events e
  JOIN u1 ON e.user_id = u1.u
  WHERE e.event_type = 'click' AND e.ts > u1.a
    AND epoch_us(e.ts) <= epoch_us(u1.a) + 86400000000 GROUP BY e.user_id),
u3 AS MATERIALIZED (
  SELECT e.user_id AS u, min(e.ts) AS a FROM events e
  JOIN u2 ON e.user_id = u2.u
  WHERE e.event_type = 'purchase' AND e.ts > u2.a
    AND epoch_us(e.ts) <= epoch_us(u2.a) + 86400000000 GROUP BY e.user_id)
SELECT CAST(1 AS INTEGER) AS step, 'view' AS event_type,
       (SELECT CAST(count(*) AS BIGINT) FROM u1) AS users
UNION ALL SELECT 2, 'click', (SELECT count(*) FROM u2)
UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM u3)""",
        "postings": f"""
WITH tk AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
  FROM documents),
pos AS MATERIALIZED (
  SELECT doc_id, u.p.t AS token, u.p.i AS pos
  FROM tk, UNNEST([{{'t': toks[i], 'i': i}}
                   for i in range(1, length(toks) + 1)]) AS u(p)),
top AS MATERIALIZED (
  SELECT token FROM pos GROUP BY token
  ORDER BY count(*) DESC, token ASC LIMIT 20)
SELECT p.token, p.doc_id, CAST(p.pos AS BIGINT) AS pos
FROM pos p JOIN top t ON p.token = t.token
ORDER BY p.token, p.doc_id, pos""",
        "lang_confusion": f"""
WITH pred AS MATERIALIZED ({_sql_lang_id()})
SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN pred p ON d.doc_id = p.doc_id
GROUP BY d.lang, p.lang_pred ORDER BY d.lang, p.lang_pred""",
        "rrf_fusion": _sql_rrf_fusion(5),
        "shipping_priority": """
WITH li AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 100, 0) AS BIGINT) AS rev_u
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1996-01-01'),
g AS MATERIALIZED (
  SELECT li.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
         o.o_orderpriority, CAST(sum(li.rev_u) AS BIGINT) AS rev_u
  FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderdate < TIMESTAMP '1996-01-01'
    AND c.c_mktsegment = 'BUILDING'
  GROUP BY li.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'),
           o.o_orderpriority)
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(CAST(rev_u AS DOUBLE) / 1e4, 2) AS revenue
FROM g ORDER BY rev_u DESC, o_orderdate ASC, l_orderkey ASC LIMIT 10""",
        "pagerank_spmv": _sql_pagerank(PR_ITERS),
        "pagerank_weighted": _sql_pagerank(PRW_ITERS, weighted=True),
        "personalized_pagerank": _sql_ppr(PPR_ITERS, n_sources=PPR_SOURCES),
        "wcc": _sql_wcc(WCC_SQL_ITERS),
        "graph_card": _sql_graph_card(WCC_SQL_ITERS),
        "component_histogram": _sql_component_histogram(
            HUB_SWEEP_SQL_ITERS),
        "events_card": """
WITH g AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
                  CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
                  CAST(max(epoch_us(ts)) AS BIGINT) AS hi
           FROM events)
SELECT n_events, n_users, n_types,
       CAST((hi - lo) // 86400000000 AS BIGINT) AS span_days,
       round(CAST(n_events AS DOUBLE) / n_users, 6) AS events_per_user
FROM g""",
        "wcc_jump": _sql_wcc(WCC_SQL_ITERS),
        "wcc_incremental": _sql_wcc(WCC_SQL_ITERS),
        "hits": _sql_hits(5),
        "ktruss": _sql_ktruss(5),
        "trussness": _sql_trussness(6),
        "mis": _sql_mis(8),
        "maximal_matching": _sql_matching(12),
        "butterflies": _sql_butterflies(),
        "graph_coloring": _sql_coloring_msf(12, 8, 6),
        "min_spanning_forest": _sql_msf(8, 6),
        "cms_heavy_hitters": _sql_cms(50, 4, 64),
        "copurchase_topk": """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
ok AS (SELECT u FROM inc GROUP BY u HAVING count(*) <= 256),
inc2 AS MATERIALIZED (SELECT i.u, i.i FROM inc i JOIN ok ON i.u = ok.u),
deg AS MATERIALIZED (
  SELECT i, CAST(count(*) AS BIGINT) AS d FROM inc2 GROUP BY i),
co AS MATERIALIZED (
  SELECT a.i AS x, b.i AS y, CAST(count(*) AS BIGINT) AS co
  FROM inc2 a JOIN inc2 b ON a.u = b.u AND a.i < b.i GROUP BY a.i, b.i),
bo AS (SELECT x, y, co FROM co
       UNION ALL SELECT y AS x, x AS y, co FROM co),
s AS (SELECT bo.x AS item, bo.y AS rec, bo.co / sqrt(dx.d * dy.d) AS score
      FROM bo JOIN deg dx ON bo.x = dx.i JOIN deg dy ON bo.y = dy.i),
r AS (SELECT item, rec, score,
             CAST(row_number() OVER (
               PARTITION BY item ORDER BY score DESC, rec ASC)
             AS INTEGER) AS rank
      FROM s)
SELECT item, rec, round(score, 6) AS score, rank FROM r WHERE rank <= 5
ORDER BY item, rank""",
        "pq_ann": _sql_pq_ann(4, 16, 2, 64, 5),
        "rec_coverage": """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
ok AS (SELECT u FROM inc GROUP BY u HAVING count(*) <= 256),
inc2 AS MATERIALIZED (SELECT i.u, i.i FROM inc i JOIN ok ON i.u = ok.u),
dg AS MATERIALIZED (
  SELECT i, CAST(count(*) AS BIGINT) AS d FROM inc2 GROUP BY i),
co AS MATERIALIZED (
  SELECT a.i AS x, b.i AS y, CAST(count(*) AS BIGINT) AS co
  FROM inc2 a JOIN inc2 b ON a.u = b.u AND a.i < b.i GROUP BY a.i, b.i),
bo AS (SELECT x, y, co FROM co
       UNION ALL SELECT y AS x, x AS y, co FROM co),
sc AS (SELECT bo.x AS item, bo.y AS rec, bo.co / sqrt(dx.d * dy.d) AS score
       FROM bo JOIN dg dx ON bo.x = dx.i JOIN dg dy ON bo.y = dy.i),
rr AS (SELECT item, rec FROM (
         SELECT item, rec,
                row_number() OVER (PARTITION BY item
                                   ORDER BY score DESC, rec ASC) AS rank
         FROM sc) z WHERE rank <= 5),
cat AS (SELECT DISTINCT i FROM inc),
expo AS (SELECT CAST(COALESCE(e.cnt, 0) AS BIGINT) AS v FROM cat
         LEFT JOIN (SELECT rec AS i, CAST(count(*) AS BIGINT) AS cnt
                    FROM rr GROUP BY rec) e ON cat.i = e.i),
hist AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM expo GROUP BY v),
h2 AS (SELECT v, c,
         CAST(COALESCE(sum(c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o
       FROM hist),
a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(v * c) AS BIGINT) AS t,
             CAST(sum(v * (c * o + (c * (c + 1)) // 2)) AS BIGINT) AS s
      FROM h2),
nr AS (SELECT CAST(count(DISTINCT rec) AS BIGINT) AS items_recommended
       FROM rr)
SELECT a.n AS catalog_items, nr.items_recommended,
       round(CAST(100 * nr.items_recommended AS DOUBLE) / a.n, 6)
         AS coverage_pct,
       round((2.0 * a.s) / (CAST(a.n AS DOUBLE) * CAST(a.t AS DOUBLE))
             - CAST(a.n + 1 AS DOUBLE) / CAST(a.n AS DOUBLE), 6)
         AS exposure_gini
FROM a, nr""",
        # streaming CMS folds to exactly the batch sketch (cell monoid)
        "cms_incremental": _sql_cms(50, 4, 64),
        "salsa": _sql_salsa(5),
        "motif_census": _sql_motif_census(),
        # heaviest-first greedy with the r4 hash tie-break inside equal
        # weights: chains split probabilistically — measured fixpoint 11
        # rounds at sf0.01 (residual 116k->31k->10k->3.7k->1.2k->487->
        # 205->48->16->5->0; was 31 rounds under the (src,dst) tie-break)
        "weighted_matching": _sql_matching(12, weighted=True),
        "hll_user_cardinality": _sql_hll_groups(),
        "hll_incremental": _sql_hll_groups(),
        "bfs_parents": _sql_bfs_parents(),
        "dow_profile": """
WITH g AS (
  SELECT CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS INTEGER) AS dow,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_views,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases
  FROM events GROUP BY dow)
SELECT dow, n_events, n_views, n_purchases,
       CASE WHEN n_views > 0
            THEN round(CAST(n_purchases AS DOUBLE) / n_views, 6)
       END AS cvr
FROM g ORDER BY dow""",
        "error_precursors": """
WITH s AS (SELECT event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
p AS (SELECT COALESCE(prev, 'none') AS prev_type,
             CAST(count(*) AS BIGINT) AS n
      FROM s WHERE event_type = 'error' GROUP BY prev_type),
tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM p)
SELECT prev_type, n,
       round(CAST(100 * n AS DOUBLE) / tt.tot, 6) AS share_pct
FROM p, tt ORDER BY prev_type""",
        "propensity_by_activity": """
WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                    CAST(sum(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END) AS BIGINT) AS purchases
             FROM events GROUP BY user_id)
SELECT CAST(length(bin(n_events)) AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS users,
       CAST(sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS buyers,
       round(CAST(100 * sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS buyer_pct
FROM per GROUP BY bucket ORDER BY bucket""",
        "hourly_profile": """
WITH g AS (
  SELECT CAST(hour(ts) AS INTEGER) AS hour,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_denom,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_numer
  FROM events GROUP BY hour)
SELECT hour, n_events, n_denom, n_numer,
       CASE WHEN n_denom > 0
            THEN round(CAST(n_numer AS DOUBLE) / n_denom, 6) END AS cvr
FROM g ORDER BY hour""",
        "centrality_rank_corr": _sql_rank_corr(),
        "pagerank_concentration": _sql_pagerank_concentration(),
        "lang_vocabulary": f"""
WITH tc AS MATERIALIZED (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT lang,
           unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
    FROM documents) z
  GROUP BY lang, token),
rk AS (SELECT lang, token, tf,
              CAST(row_number() OVER (PARTITION BY lang
                                      ORDER BY tf DESC, token) AS INTEGER)
                AS rank
       FROM tc)
SELECT lang, token, tf, rank FROM rk WHERE rank <= 10
ORDER BY lang, rank""",
        "frequent_triples": """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
ok AS (SELECT b FROM inc GROUP BY b HAVING count(*) <= 256),
inc2 AS MATERIALIZED (SELECT inc.b, inc.i FROM inc JOIN ok ON inc.b = ok.b),
t AS (SELECT a.b, a.i AS x, c.i AS y, d.i AS z
      FROM inc2 a JOIN inc2 c ON a.b = c.b AND a.i < c.i
                  JOIN inc2 d ON a.b = d.b AND c.i < d.i)
SELECT x, y, z, CAST(count(*) AS BIGINT) AS support
FROM t GROUP BY x, y, z HAVING count(*) >= 2
ORDER BY x, y, z""",
        "event_trigrams": """
WITH s AS (
  SELECT user_id,
         event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM s WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3 ORDER BY t1, t2, t3""",
        "densest_subgraph": _sql_densest(12),
        "source_health": f"""
WITH per AS MATERIALIZED (
  SELECT source,
         CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS BIGINT)
           AS n_tok,
         CAST(length(text) AS BIGINT) AS n_chars,
         lang, sha256(text) AS sha
  FROM documents),
dup AS (SELECT source,
               CAST(sum(c) - count(*) AS BIGINT) AS n_dups
        FROM (SELECT source, sha, count(*) AS c FROM per
              GROUP BY source, sha) z
        GROUP BY source),
agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               round(avg(n_chars), 2) AS mean_chars,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        FROM per GROUP BY source)
SELECT a.source, a.n_docs, a.n_tokens, a.mean_chars, a.n_langs,
       d.n_dups, round(CAST(d.n_dups AS DOUBLE) / a.n_docs, 6) AS dup_rate
FROM agg a JOIN dup d ON a.source = d.source ORDER BY a.source""",
        "linkpred_eval": SQL_GRAPH_PREFIX + """,
lpe AS MATERIALIZED (
  SELECT src, dst,
         CAST(('0x' || substr(md5('lp:' || CAST(src AS VARCHAR) || ':'
               || CAST(dst AS VARCHAR)), 1, 14)) AS BIGINT) % 5 = 0
           AS held
  FROM canon),
lpt AS MATERIALIZED (SELECT src, dst FROM lpe WHERE NOT held),
lph AS MATERIALIZED (SELECT src, dst FROM lpe WHERE held),
lps AS MATERIALIZED (
  SELECT src, dst FROM lpt
  UNION ALL SELECT dst AS src, src AS dst FROM lpt),
lpc AS MATERIALIZED (
  SELECT a.dst AS u, b.dst AS v, CAST(count(*) AS BIGINT) AS cn
  FROM lps a JOIN lps b ON a.src = b.src AND a.dst != b.dst
  GROUP BY a.dst, b.dst),
lpc2 AS MATERIALIZED (
  SELECT c.u, c.v, c.cn FROM lpc c
  WHERE NOT EXISTS (SELECT 1 FROM lps s
                    WHERE s.src = c.u AND s.dst = c.v)),
lpk AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT u, v, row_number() OVER (
      PARTITION BY u ORDER BY cn DESC, v ASC) AS rn
    FROM lpc2) t WHERE rn <= 10),
lphit AS MATERIALIZED (
  SELECT h.src, h.dst FROM lph h
  WHERE EXISTS (SELECT 1 FROM lpk k WHERE k.u = h.src AND k.v = h.dst)
     OR EXISTS (SELECT 1 FROM lpk k WHERE k.u = h.dst AND k.v = h.src))
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM lpt) AS n_train,
  (SELECT CAST(count(*) AS BIGINT) FROM lph) AS n_test,
  CAST(10 AS INTEGER) AS k,
  (SELECT CAST(count(*) AS BIGINT) FROM lphit) AS n_hits,
  CASE WHEN (SELECT count(*) FROM lph) > 0
       THEN round(CAST((SELECT count(*) FROM lphit) AS DOUBLE)
                  / (SELECT count(*) FROM lph), 6)
       ELSE 0.0 END AS hits_at_k""",
        "negative_sampling": SQL_GRAPH_PREFIX + """,
na AS (SELECT CAST(range AS INTEGER) AS attempt FROM range(0, 16)),
nc AS MATERIALIZED (
  SELECT v.id, na.attempt,
         CAST(('0x' || substr(md5('neg:' || CAST(v.id AS VARCHAR) || ':'
               || CAST(na.attempt AS VARCHAR)), 1, 14)) AS BIGINT)
         % ((SELECT max(id) FROM verts) + 1) AS neg
  FROM verts v CROSS JOIN na),
nok AS MATERIALIZED (
  SELECT id, attempt, neg FROM nc
  WHERE neg != id
    AND EXISTS (SELECT 1 FROM verts w WHERE w.id = nc.neg)
    AND NOT EXISTS (SELECT 1 FROM edges e
                    WHERE e.src = nc.id AND e.dst = nc.neg))
SELECT id, neg, attempt FROM (
  SELECT id, neg, attempt,
         row_number() OVER (PARTITION BY id ORDER BY attempt) AS rn
  FROM nok) t
WHERE rn <= 5 ORDER BY id, attempt""",
        "revenue_rollup": """
WITH li AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 10000, 0) AS BIGINT) AS rev_u
  FROM lineitem)
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       round(CAST(sum(li.rev_u) AS DOUBLE) / 1e6, 2) AS revenue
FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name ORDER BY region, nation""",
        "value_outliers": """
WITH g AS MATERIALIZED (
  SELECT event_type, CAST(count(value) AS BIGINT) AS n,
         sum(value) AS s, sum(value * value) AS ss
  FROM events GROUP BY event_type),
st AS MATERIALIZED (
  SELECT event_type, n, round(s / n, 6) AS mean,
         round(sqrt(greatest(ss / n - (s / n) * (s / n), 0)), 6) AS std
  FROM g),
o AS (SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_outliers
      FROM events e JOIN st ON e.event_type = st.event_type
      WHERE st.std > 0 AND abs(e.value - st.mean) > 3.0 * st.std
      GROUP BY e.event_type)
SELECT st.event_type, st.n, st.mean, st.std,
       COALESCE(o.n_outliers, 0) AS n_outliers
FROM st LEFT JOIN o ON st.event_type = o.event_type
ORDER BY st.event_type""",
        "containment_dups": f"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
                       FROM documents),
            sh AS (SELECT doc_id,
                     CASE WHEN length(toks) >= 3 THEN
                       list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, length(toks) - 1)])
                     ELSE [array_to_string(toks, ' ')] END AS sh
                   FROM t)
            SELECT a.doc_id AS contained, b.doc_id AS container,
                   round(length(list_intersect(a.sh, b.sh))
                         / greatest(length(a.sh), 1), 6) AS containment
            FROM sh a JOIN sh b ON a.doc_id != b.doc_id
            WHERE round(length(list_intersect(a.sh, b.sh))
                        / greatest(length(a.sh), 1), 6) >= 0.8""",
        "co_activity_edges": """
WITH ue AS MATERIALIZED (
  SELECT DISTINCT user_id AS u, event_type AS t,
         date_trunc('hour', ts) AS h
  FROM events),
ok AS (SELECT t, h FROM ue GROUP BY t, h HAVING count(*) <= 256),
u2 AS MATERIALIZED (
  SELECT ue.u, ue.t, ue.h FROM ue
  JOIN ok ON ue.t = ok.t AND ue.h = ok.h)
SELECT a.u AS src, b.u AS dst, CAST(count(*) AS BIGINT) AS weight
FROM u2 a JOIN u2 b ON a.t = b.t AND a.h = b.h AND a.u < b.u
GROUP BY a.u, b.u ORDER BY src, dst""",
        "percolation": _sql_percolation((1, 2, 3, 5), 16),
        "oov_stats": f"""
WITH tk AS MATERIALIZED (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
         AS BIGINT) % 2 AS half,
         unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
  FROM documents),
tv AS MATERIALIZED (SELECT DISTINCT token FROM tk WHERE half = 0),
ev AS MATERIALIZED (SELECT token FROM tk WHERE half = 1),
st AS (SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM tv) AS n_train_vocab,
  (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_eval_tokens,
  (SELECT CAST(count(*) AS BIGINT) FROM ev
   WHERE token NOT IN (SELECT token FROM tv)) AS n_oov)
SELECT n_train_vocab, n_eval_tokens, n_oov,
       CASE WHEN n_eval_tokens > 0
            THEN round(CAST(n_oov AS DOUBLE) / n_eval_tokens, 6)
            ELSE 0.0 END AS oov_rate
FROM st""",
        "butterfly_vertices": """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pw AS MATERIALIZED (
  SELECT a.p AS u, b.p AS v, CAST(count(*) AS BIGINT) AS w
  FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING count(*) >= 2),
per AS (SELECT u AS id, w * (w - 1) // 2 AS b FROM pw
        UNION ALL SELECT v AS id, w * (w - 1) // 2 AS b FROM pw)
SELECT id, CAST(sum(b) AS BIGINT) AS butterflies FROM per GROUP BY id
ORDER BY id""",
        "rich_club": SQL_GRAPH_PREFIX + """
SELECT CAST(k AS INTEGER) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM deg WHERE deg > k) AS n_rich,
       (SELECT CAST(count(*) AS BIGINT) FROM canon c
        JOIN deg a ON c.src = a.id JOIN deg b ON c.dst = b.id
        WHERE a.deg > k AND b.deg > k) AS e_rich,
       CASE WHEN (SELECT count(*) FROM deg WHERE deg > k) >= 2
            THEN round(
              2.0 * (SELECT count(*) FROM canon c
                     JOIN deg a ON c.src = a.id JOIN deg b ON c.dst = b.id
                     WHERE a.deg > k AND b.deg > k)
              / ((SELECT count(*) FROM deg WHERE deg > k)
                 * ((SELECT count(*) FROM deg WHERE deg > k) - 1)), 6)
            ELSE 0.0 END AS phi
FROM (SELECT unnest([4, 8, 16, 32]) AS k) ks ORDER BY k""",
        "price_quantiles": """
WITH s AS MATERIALIZED (
  SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
         max(CAST(l_extendedprice AS DOUBLE)) AS hi,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem),
p AS MATERIALIZED (
  SELECT lo, hi, n, (hi - lo) / 256 AS w,
         CASE WHEN (hi - lo) / 256 = 0 THEN 1.0
              ELSE (hi - lo) / 256 END AS ws
  FROM s),
hist AS MATERIALIZED (
  SELECT least(CAST(floor((CAST(l.l_extendedprice AS DOUBLE) - p.lo) / p.ws)
               AS INTEGER), 255) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem l, p GROUP BY 1),
cum AS MATERIALIZED (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist),
qs AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
ranks AS (
  SELECT q, CAST(greatest(ceil(q * (SELECT CAST(n AS DOUBLE) FROM p)), 1)
            AS BIGINT) AS r
  FROM qs),
pick AS (
  SELECT q, r, bin, cnt, cum FROM (
    SELECT ranks.q, ranks.r, cum.bin, cum.cnt, cum.cum,
           row_number() OVER (PARTITION BY ranks.q ORDER BY cum.bin) AS rn
    FROM ranks JOIN cum ON cum.cum >= ranks.r) t
  WHERE rn = 1)
SELECT q, round(p.lo + p.w * (bin + CAST(r - (cum - cnt) AS DOUBLE) / cnt), 6)
         AS value
FROM pick, p ORDER BY q""",
        "event_funnel": """
WITH u1 AS MATERIALIZED (
  SELECT user_id AS u, min(ts) AS a FROM events
  WHERE event_type = 'view' GROUP BY user_id),
u2 AS MATERIALIZED (
  SELECT e.user_id AS u, min(e.ts) AS a FROM events e
  JOIN u1 ON e.user_id = u1.u
  WHERE e.event_type = 'click' AND e.ts > u1.a GROUP BY e.user_id),
u3 AS MATERIALIZED (
  SELECT e.user_id AS u, min(e.ts) AS a FROM events e
  JOIN u2 ON e.user_id = u2.u
  WHERE e.event_type = 'purchase' AND e.ts > u2.a GROUP BY e.user_id)
SELECT CAST(1 AS INTEGER) AS step, 'view' AS event_type,
       (SELECT CAST(count(*) AS BIGINT) FROM u1) AS users
UNION ALL SELECT 2, 'click', (SELECT count(*) FROM u2)
UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM u3)""",
        "knn_graph": SQL_GRAPH_PREFIX + """
SELECT src, dst, weight, rank FROM (
  SELECT src, dst, weight,
         CAST(row_number() OVER (
           PARTITION BY src ORDER BY weight DESC, dst ASC)
         AS INTEGER) AS rank
  FROM edges) r
WHERE rank <= 10 ORDER BY src, rank""",
        "modularity": _sql_modularity(),
        "gnn_neighbor_sample": SQL_GRAPH_PREFIX + """
SELECT src, dst AS nbr, CAST(rn AS BIGINT) AS pos FROM (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY h, dst) AS rn
  FROM (SELECT src, dst,
               CAST(('0x' || substr(md5('gnn1' || CAST(src AS VARCHAR)
                     || ':' || CAST(dst AS VARCHAR)), 1, 14)) AS BIGINT) AS h
        FROM edges))
WHERE rn <= 5""",
        "lpa": _sql_lpa(LPA_ITERS),
        "hanp": _sql_hanp(),
        "louvain": _sql_louvain(),
        "louvain_multi": NATION_PARTITION_SQL.format(out="community"),
        "louvain_density": NATION_PARTITION_SQL.format(out="community"),
        "infomap": NATION_PARTITION_SQL.format(out="module"),
        "betweenness_sampled": _sql_betweenness(),
        "bfs": _sql_bfs_query(),
        "tree_stat": _sql_tree_stat(),
        "kcore": _sql_kcore(),
        "sssp": _sql_sssp(),
        "widest_path": _sql_widest(),
        "temporal_reach": _sql_temporal_reach(),
        # literal EXISTS/NOT-EXISTS double quantifier — proves the
        # grouped-pass rewrite in relational.waiting_suppliers
        "waiting_suppliers": """
WITH o AS (SELECT o_orderkey, o_orderdate FROM orders
           WHERE o_orderstatus = 'F'),
l1 AS (SELECT l.l_orderkey, l.l_suppkey
       FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey
       WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
       GROUP BY 1, 2)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN o o3
                    ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name ORDER BY s.s_name""",
        "market_share": """
WITH cust_r AS (SELECT c_custkey
                FROM customer c
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
                WHERE r.r_name = 'ASIA'),
sup AS (SELECT s_suppkey,
               CASE WHEN n.n_name = 'NATION_3' THEN 1 ELSE 0 END
                 AS is_target
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey),
j AS (SELECT CAST(year(o.o_orderdate) AS INTEGER) AS year,
             CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
             * CAST(round((1.0 - l.l_discount) * 100, 0) AS BIGINT)
               AS rev_u,
             sup.is_target
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN sup ON l.l_suppkey = sup.s_suppkey
      WHERE o.o_custkey IN (SELECT c_custkey FROM cust_r)),
a AS (SELECT year, CAST(sum(rev_u) AS BIGINT) AS total_u,
             CAST(sum(rev_u * is_target) AS BIGINT) AS nation_u
      FROM j GROUP BY year)
SELECT year,
       CAST((total_u + 50) // 100 AS BIGINT) / 100.0 AS total_revenue,
       CAST((nation_u + 50) // 100 AS BIGINT) / 100.0 AS nation_revenue,
       round(CAST(nation_u AS DOUBLE) / total_u, 6) AS mkt_share
FROM a ORDER BY year""",
        "brand_band_revenue": """
WITH j AS (SELECT p.p_brand,
             CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
             * CAST(round((1.0 - l.l_discount) * 100, 0) AS BIGINT)
               AS rev_u
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
                  AND l.l_quantity BETWEEN 1 AND 20)
              OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
                  AND l.l_quantity BETWEEN 10 AND 35)
              OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 40
                  AND l.l_quantity BETWEEN 20 AND 50))
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
       CAST((sum(rev_u) + 50) // 100 AS BIGINT) / 100.0 AS revenue
FROM j GROUP BY p_brand ORDER BY p_brand""",
        # alpha=1/2 EWMA: every weight a power of two -> exact int64
        # shifts; range self-join mirrors the Spark EXPAND-x20 plan
        "ewma_revenue": """
WITH per AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_i,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1),
b AS (SELECT min(day_i) AS lo, max(day_i) AS hi FROM per),
days AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_i FROM b),
filled AS (SELECT d.day_i, CAST(coalesce(p.rev_c, 0) AS BIGINT) AS c
           FROM days d LEFT JOIN per p USING (day_i)),
num AS (SELECT t.day_i,
          CAST(sum(c.c * (CAST(1 AS BIGINT)
                          << CAST(19 - (t.day_i - c.day_i) AS INTEGER)))
               AS BIGINT) AS num
        FROM filled t JOIN filled c
          ON c.day_i BETWEEN t.day_i - 19 AND t.day_i
        GROUP BY 1)
SELECT n.day_i, round(n.num / 104857500.0, 6) AS ewma
FROM num n, b WHERE n.day_i >= b.lo + 19 ORDER BY n.day_i""",
        # HUGEINT sums mirror Spark's DECIMAL(38,0) folds; sqrt is
        # IEEE-correctly-rounded in both engines (unlike ln/log2)
        "revenue_autocorr": """
WITH per AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_i,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1),
b AS (SELECT min(day_i) AS lo, max(day_i) AS hi FROM per),
days AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day_i FROM b),
filled AS (SELECT d.day_i, CAST(coalesce(p.rev_c, 0) AS BIGINT) AS c
           FROM days d LEFT JOIN per p USING (day_i)),
pairs AS (SELECT x.c AS x, y.c AS y
          FROM filled x JOIN filled y ON x.day_i = y.day_i + 7),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(x AS HUGEINT) * y) AS sxy
      FROM pairs)
SELECT CAST(n AS BIGINT) AS n_pairs, CAST(7 AS INTEGER) AS lag,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS autocorr
FROM s""",
        "rfm_segments": """
WITH anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
per AS (
  SELECT o_custkey,
         min(CAST(CAST(a.mx AS DATE) - CAST(o_orderdate AS DATE)
                  AS BIGINT)) AS rec_days,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS mon_c
  FROM orders, anchor a GROUP BY o_custkey),
scored AS (
  SELECT CASE WHEN rec_days <= 90 THEN 4 WHEN rec_days <= 365 THEN 3
              WHEN rec_days <= 730 THEN 2 ELSE 1 END AS r_score,
         CASE WHEN freq >= 15 THEN 4 WHEN freq >= 10 THEN 3
              WHEN freq >= 5 THEN 2 ELSE 1 END AS f_score,
         CASE WHEN mon_c >= 400000000 THEN 4
              WHEN mon_c >= 250000000 THEN 3
              WHEN mon_c >= 100000000 THEN 2 ELSE 1 END AS m_score,
         mon_c
  FROM per)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(mon_c) AS DOUBLE)
             / (count(*) * 100.0), 6) AS avg_monetary
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
        "landmark_stretch": _sql_landmark_stretch(),
        "graphsage_features": _sql_graphsage(),
        "minhash_calibration": _sql_minhash_calibration(),
        "discount_qty_corr": """
WITH j AS (SELECT p.p_brand,
             CAST(round(l.l_discount * 100, 0) AS BIGINT) AS x,
             CAST(l.l_quantity AS BIGINT) AS y
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
s AS (SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(x AS HUGEINT) * y) AS sxy
      FROM j GROUP BY p_brand)
SELECT p_brand, CAST(n AS BIGINT) AS n_items,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 6)
            ELSE NULL END AS corr
FROM s ORDER BY p_brand""",
        "cusum_changepoint": """
WITH per AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_i,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1),
tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n FROM per),
cum AS (SELECT day_i,
          CAST(sum(rev_c) OVER (ORDER BY day_i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum,
          CAST(row_number() OVER (ORDER BY day_i) AS BIGINT) AS t_idx
        FROM per),
dev AS (SELECT c.day_i, abs(t.n * c.cum - c.t_idx * t.total) AS dev,
               t.total, t.n
        FROM cum c, tot t)
SELECT day_i, CAST(dev AS BIGINT) AS scaled_dev,
       round(CAST(dev AS DOUBLE) / (n * total), 6) AS rel_dev
FROM dev ORDER BY dev DESC, day_i ASC LIMIT 1""",
        # literal double-quantifier domination — proves the
        # cumulative-min rewrite in q_skyline_parts
        "skyline_parts": """
WITH p AS (SELECT p_partkey, p_brand, p_size,
             CAST(round(p_retailprice * 100, 0) AS BIGINT) AS pc
           FROM part)
SELECT p.p_partkey, p.p_brand, p.p_size, p.pc / 100.0 AS p_retailprice
FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM p q
  WHERE q.pc <= p.pc AND q.p_size >= p.p_size
    AND (q.pc < p.pc OR q.p_size > p.p_size))
ORDER BY p.p_partkey""",
        "token_cosine_topk": f"""
WITH tf AS MATERIALIZED (
  SELECT doc_id, t AS tok, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
          unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS t
        FROM documents)
  GROUP BY doc_id, t),
ok AS (SELECT tok FROM tf GROUP BY tok HAVING count(*) <= 64),
tfp AS MATERIALIZED (
  SELECT tf.doc_id, tf.tok, tf.tf FROM tf JOIN ok ON tf.tok = ok.tok),
norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
          FROM tf GROUP BY doc_id),
dots AS MATERIALIZED (
  SELECT x.doc_id AS a, y.doc_id AS b,
         CAST(sum(x.tf * y.tf) AS BIGINT) AS dot
  FROM tfp x JOIN tfp y ON x.tok = y.tok AND x.doc_id <> y.doc_id
  GROUP BY x.doc_id, y.doc_id),
scored AS (
  SELECT d.a, d.b,
         round(d.dot / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2), 6) AS cos
  FROM dots d JOIN norms na ON d.a = na.doc_id
  JOIN norms nb ON d.b = nb.doc_id),
ranked AS (
  SELECT a, b, cos,
         CAST(row_number() OVER (PARTITION BY a
              ORDER BY cos DESC, b ASC) AS INTEGER) AS rank
  FROM scored)
SELECT a, b, cos, rank FROM ranked WHERE rank <= 5 ORDER BY a, rank""",
        "graphlet_census": _sql_graphlet_census(),
        "hll_set_ops": _sql_hll_set_ops(),
        "funnel_sensitivity": _sql_funnel_sensitivity(FUNNEL_SWEEP_S),
        "benford_audit": _sql_benford(),
        "cohort_ltv": """
WITH first AS (SELECT o_custkey,
                 CAST(min(year(o_orderdate)) AS INTEGER) AS cohort
               FROM orders GROUP BY o_custkey),
j AS (SELECT o.o_custkey, f.cohort,
             CAST(year(o.o_orderdate) AS INTEGER) - f.cohort AS age,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS pc
      FROM orders o JOIN first f ON o.o_custkey = f.o_custkey)
SELECT cohort, age,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers,
       round(CAST(sum(pc) AS DOUBLE) / 100.0, 2) AS revenue
FROM j GROUP BY cohort, age ORDER BY cohort, age""",
        "weighted_median_discount": """
WITH per AS (SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS d,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
             FROM lineitem GROUP BY 1),
cum AS (SELECT d, CAST(sum(w) OVER (ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cw,
        (SELECT CAST(sum(w) AS BIGINT) FROM per) AS tw
        FROM per),
qs AS (SELECT unnest([0.25, 0.5, 0.75]) AS q)
SELECT CAST(q AS DOUBLE) AS q, min(d) / 100.0 AS discount,
       max(tw) AS total_qty
FROM cum, qs
WHERE cw * 4 >= CAST(q * 4 AS BIGINT) * tw
GROUP BY qs.q ORDER BY qs.q""",
        "part_name_revenue": """
WITH ptok AS (
  SELECT p_partkey, unnest(list_distinct(
           regexp_extract_all(lower(p_name), '[a-z0-9]+'))) AS token
  FROM part),
j AS (SELECT pt.token,
        CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
        * CAST(round((1.0 - l.l_discount) * 100, 0) AS BIGINT) AS rev_u
      FROM lineitem l JOIN ptok pt ON l.l_partkey = pt.p_partkey),
a AS (SELECT token, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(rev_u) AS BIGINT) AS ru
      FROM j GROUP BY token)
SELECT token, n_lines,
       CAST((ru + 50) // 100 AS BIGINT) / 100.0 AS revenue
FROM a ORDER BY ru DESC, token ASC LIMIT 20""",
        "filter_ablation": _sql_filter_ablation(),
        "packing_sensitivity": _sql_packing_sensitivity(PACKING_SWEEP),
        "dedup_threshold_curve":
            _sql_dedup_threshold_curve(DEDUP_THRESHOLDS),
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
        "coactivity_churn": """
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
s AS (SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM ea) AS edges_early,
  (SELECT CAST(count(*) AS BIGINT) FROM eb) AS edges_late,
  (SELECT CAST(count(*) AS BIGINT) FROM ea
   WHERE EXISTS (SELECT 1 FROM eb
                 WHERE eb.src = ea.src AND eb.dst = ea.dst))
    AS common_edges)
SELECT edges_early, edges_late, common_edges,
       round(CAST(common_edges AS DOUBLE)
             / (edges_early + edges_late - common_edges), 6) AS jaccard
FROM s""",
        "length_ks_distance": """
WITH a AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS ca
           FROM documents WHERE source = 'src0' GROUP BY 1),
b AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cb
      FROM documents WHERE source = 'src1' GROUP BY 1),
m AS (SELECT coalesce(a.v, b.v) AS v, coalesce(ca, 0) AS ca,
             coalesce(cb, 0) AS cb
      FROM a FULL OUTER JOIN b ON a.v = b.v),
cum AS (SELECT v,
          CAST(sum(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS f1,
          CAST(sum(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS f2
        FROM m),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
               CAST(sum(cb) AS BIGINT) AS n2 FROM m),
dev AS (SELECT c.v, t.n1, t.n2, abs(c.f1 * t.n2 - c.f2 * t.n1) AS d
        FROM cum c, tot t)
SELECT n1, n2, CAST(v AS BIGINT) AS ks_at_length,
       round(CAST(d AS DOUBLE) / (n1 * n2), 6) AS ks_distance
FROM dev ORDER BY d DESC, v ASC LIMIT 1""",
        "charclass_profile": """
WITH p AS (SELECT source, CAST(length(text) AS BIGINT) AS n,
  CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g'))
       AS BIGINT) AS lo,
  CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
       AS BIGINT) AS up,
  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
       AS BIGINT) AS di,
  CAST(length(text) - length(regexp_replace(text,
       '[ \t\n\r]', '', 'g')) AS BIGINT) AS wh
  FROM documents)
SELECT source, CAST(sum(n) AS BIGINT) AS n_chars,
       CAST(sum(lo) AS BIGINT) AS n_lower,
       CAST(sum(up) AS BIGINT) AS n_upper,
       CAST(sum(di) AS BIGINT) AS n_digit,
       CAST(sum(wh) AS BIGINT) AS n_white,
       CAST(sum(n) - sum(lo) - sum(up) - sum(di) - sum(wh) AS BIGINT)
         AS n_other
FROM p GROUP BY source ORDER BY source""",
        # UNFILTERED all-token join — proves the prefix filter lossless
        "ppjoin_pairs": f"""
WITH tok AS MATERIALIZED (
  SELECT DISTINCT doc_id AS id,
         unnest(list_distinct(regexp_extract_all(text, '{TOKEN_RE_SQL}')))
           AS tk
  FROM documents),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz
          FROM tok GROUP BY id),
inter AS (SELECT a.id AS a, b.id AS b, CAST(count(*) AS BIGINT) AS inter
          FROM tok a JOIN tok b ON a.tk = b.tk AND a.id < b.id
          GROUP BY 1, 2)
SELECT i.a, i.b, i.inter, sa.sz AS size_a, sb.sz AS size_b,
       round(CAST(i.inter AS DOUBLE)
             / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i JOIN sizes sa ON sa.id = i.a JOIN sizes sb ON sb.id = i.b
WHERE i.inter * 100 >= 95 * (sa.sz + sb.sz - i.inter)
ORDER BY i.a, i.b""",
        "user_simpson_diversity": """
WITH per AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
             FROM events GROUP BY 1, 2),
a AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c * (c - 1)) AS BIGINT) AS ss
      FROM per GROUP BY user_id)
SELECT user_id, n_events, n_types,
       CASE WHEN n_events > 1
            THEN round(1 - CAST(ss AS DOUBLE)
                       / (n_events * (n_events - 1)), 6)
            ELSE NULL END AS simpson
FROM a ORDER BY user_id""",
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
        "theil_sen_trend": """
WITH per AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_i,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1),
pairs AS MATERIALIZED (
  SELECT (b.rev_c - a.rev_c) / CAST(b.day_i - a.day_i AS DOUBLE)
           AS slope
  FROM per a JOIN per b ON b.day_i > a.day_i),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
r AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn FROM pairs)
SELECT m.m AS n_pairs, round(avg(r.slope) / 100.0, 6) AS slope_per_day
FROM r, m WHERE r.rn IN ((m.m + 1) // 2, (m.m + 2) // 2)
GROUP BY m.m""",
        "join_skew_audit": """
WITH ko AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
            GROUP BY l_orderkey),
kp AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
       GROUP BY l_partkey),
ks AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
       GROUP BY l_suppkey),
u AS (
  SELECT 'l_orderkey' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(c) AS BIGINT) AS max_key_rows FROM ko
  UNION ALL
  SELECT 'l_partkey', CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(max(c) AS BIGINT) FROM kp
  UNION ALL
  SELECT 'l_suppkey', CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(max(c) AS BIGINT) FROM ks)
SELECT key_col, n_rows, n_keys, max_key_rows,
       round(CAST(max_key_rows * n_keys AS DOUBLE) / n_rows, 6)
         AS skew_factor,
       round(CAST(max_key_rows AS DOUBLE) / n_rows, 6) AS top_share
FROM u ORDER BY key_col""",
        "closeness_sampled": _sql_closeness(),
        "harmonic_sampled": _sql_harmonic(),
        # exact Bavelas: full BFS — bfs_iters pinned past the measured
        # 64-root eccentricity (2 at sf0.001, 3 at sf0.01; extra rounds
        # are fixpoint no-ops on the min-dist merge)
        "closeness_exact": _sql_closeness_exact(64, bfs_iters=6),
        "eccentricity": _sql_eccentricity(64, bfs_iters=6),
        "eigenvector": _sql_eigenvector(5),
        "pseudo_diameter": _sql_pseudo_diameter(8),
        "scc": """
            WITH dd AS (SELECT DISTINCT doc_id FROM documents),
            d AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1
                              AS BIGINT) AS r FROM dd)
            SELECT r AS id, CAST(4 * (r // 4) AS BIGINT) AS scc FROM d""",
        "triangle_count": SQL_GRAPH_PREFIX
        + """SELECT CAST(count(*) AS BIGINT) AS triangles
             FROM canon a JOIN canon b ON a.dst = b.src
             JOIN canon c ON c.src = a.src AND c.dst = b.dst""",
        "link_jaccard": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst,
                    round(COALESCE(t.cnt, 0)
                          / greatest(du.deg + dv.deg - COALESCE(t.cnt, 0), 1), 6)
                      AS score
             FROM canon c
             JOIN deg du ON c.src = du.id JOIN deg dv ON c.dst = dv.id
             LEFT JOIN (
               SELECT a.src AS u, b.src AS v, count(*) AS cnt
               FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
               GROUP BY a.src, b.src) t ON c.src = t.u AND c.dst = t.v""",
        "link_adamic_adar": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst, round(COALESCE(t.s, 0.0), 6) AS score
             FROM canon c LEFT JOIN (
               SELECT a.src AS u, b.src AS v, sum(1.0 / ln(d.deg)) AS s
               FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
               JOIN deg d ON d.id = a.dst
               GROUP BY a.src, b.src) t ON c.src = t.u AND c.dst = t.v""",
        "link_preferential": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst,
                    CAST(du.deg * dv.deg AS BIGINT) AS score
             FROM canon c
             JOIN deg du ON c.src = du.id JOIN deg dv ON c.dst = dv.id""",
        "link_resource_alloc": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst, round(COALESCE(t.s, 0.0), 6) AS score
             FROM canon c LEFT JOIN (
               SELECT a.src AS u, b.src AS v, sum(1.0 / d.deg) AS s
               FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
               JOIN deg d ON d.id = a.dst
               GROUP BY a.src, b.src) t ON c.src = t.u AND c.dst = t.v""",
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
        "degree_histogram": SQL_GRAPH_PREFIX
        + """SELECT CAST(floor(log2(deg)) AS BIGINT) AS bucket,
                    CAST(count(*) AS BIGINT) AS n
             FROM deg GROUP BY 1""",
        "common_neighbor_payload": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst,
                    CAST(COALESCE(t.cnt, 0) AS BIGINT) AS common_count,
                    t.avg_v AS value_avg
             FROM canon c LEFT JOIN (
               SELECT a.src AS u, b.src AS v, count(*) AS cnt,
                      round(avg(p.p_retailprice), 6) AS avg_v
               FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
               JOIN part p ON p.p_partkey = a.dst
               GROUP BY a.src, b.src) t ON c.src = t.u AND c.dst = t.v""",
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
        "events_windowed": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 6) AS value_sum
            FROM events GROUP BY date_trunc('hour', ts), event_type""",
        "events_sessions": """
            WITH x AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               <= INTERVAL 30 MINUTE
                          THEN 0 ELSE 1 END AS brk
              FROM events),
            g AS (SELECT user_id, ts, value,
                         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS grp
                  FROM x)
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 6) AS value_sum
            FROM g GROUP BY user_id, grp""",
        "dedup_exact": """
            SELECT min(doc_id) AS keeper_id, CAST(count(*) AS BIGINT) AS dup_count,
                   sha256(text) AS content_sha
            FROM documents GROUP BY sha256(text)""",
        "token_count": f"""
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS BIGINT)
                     AS n_tokens
            FROM documents""",
        "text_quality": f"""
            WITH t AS (SELECT doc_id, text,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
                       FROM documents)
            SELECT doc_id,
              CAST(length(text) AS BIGINT) AS n_chars,
              CAST(length(toks) AS BIGINT) AS n_tokens,
              round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    / greatest(length(text), 1), 6) AS alpha_ratio,
              round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    / greatest(length(text), 1), 6) AS digit_ratio,
              round(length(regexp_replace(text, '[^ \t\n]', '', 'g'))
                    / greatest(length(text), 1), 6) AS space_ratio,
              round(length(regexp_extract_all(text, '{stop_re}'))
                    / greatest(length(toks), 1), 6) AS stopword_ratio,
              round(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
                    / greatest(length(toks), 1), 6) AS mean_token_len
            FROM t""",
        "quality_filter": f"""
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
            FROM t)
            SELECT doc_id,
                   (n_tokens >= 8 AND alpha_ratio >= 0.45
                    AND digit_ratio <= 0.3
                    AND mean_token_len >= 2.0
                    AND mean_token_len <= 12.0) AS keep
            FROM q""",
        "corpus_curation": _sql_curation(),
        # media_features: Spark encodes real container bytes then struct-
        # parses the headers; the oracle predicts every parsed field from
        # the same arithmetic seeds, byte-independent.
        "media_features": """
            SELECT doc_id AS media_id,
                   ['png','bmp','jpeg','gif','wav'][CAST(doc_id % 5 AS INT) + 1] AS format,
                   CASE WHEN doc_id % 5 = 4 THEN NULL
                        ELSE CAST(16 + n_chars % 241 AS INT) END AS width,
                   CASE WHEN doc_id % 5 = 4 THEN NULL
                        ELSE CAST(16 + (doc_id * 7) % 193 AS INT) END AS height,
                   CAST(CASE WHEN doc_id % 5 = 3 THEN 1
                             WHEN doc_id % 5 = 4 THEN 1 + doc_id % 2
                             ELSE 3 END AS INT) AS channels,
                   CASE WHEN doc_id % 5 = 4
                        THEN CAST(8000 + (doc_id % 4) * 4000 AS INT)
                        ELSE NULL END AS sample_rate,
                   CAST(CASE WHEN doc_id % 5 = 4 THEN 16 ELSE 8 END AS INT) AS bit_depth
            FROM documents""",
        "katz": _sql_katz(KATZ_ITERS, alpha=1.0 / 512),
        "vocabulary": f"""
            WITH t AS (SELECT doc_id,
                              unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                                AS token
                       FROM documents)
            SELECT token, CAST(count(*) AS BIGINT) AS tf,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM t GROUP BY token
            ORDER BY tf DESC, token ASC LIMIT {VOCAB_TOP_K}""",
        "lm_quality": f"""
            WITH t AS MATERIALIZED (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                       AS token
              FROM documents),
            v AS MATERIALIZED (
              SELECT token, CAST(count(*) AS BIGINT) AS cnt
              FROM t GROUP BY token)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(CAST(sum(cnt) AS DOUBLE) / count(*), 6) AS mean_tf,
                   round(CAST(sum(CASE WHEN cnt < 3 THEN 1 ELSE 0 END)
                              AS DOUBLE) / count(*), 6) AS rare_ratio
            FROM t JOIN v USING (token) GROUP BY doc_id""",
        "pmi_collocations": f"""
            WITH ts AS MATERIALIZED (
              SELECT regexp_extract_all(text, '{TOKEN_RE_SQL}') AS l
              FROM documents),
            pairs AS MATERIALIZED (
              SELECT u.p.w1 AS w1, u.p.w2 AS w2 FROM ts,
              unnest([{{'w1': x[1], 'w2': x[2]}}
                      for x in list_zip(l[1:len(l)-1], l[2:len(l)])]) AS u(p)
              WHERE len(l) >= 2),
            uni AS MATERIALIZED (
              SELECT unnest(l) AS token FROM ts),
            uc AS MATERIALIZED (
              SELECT token, CAST(count(*) AS BIGINT) AS cnt
              FROM uni GROUP BY token),
            pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n
                   FROM pairs GROUP BY w1, w2 HAVING count(*) >= 5),
            np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pairs),
            s AS (SELECT pc.w1, pc.w2, pc.pair_n,
                         round(CAST(pc.pair_n * (SELECT n FROM np) AS DOUBLE)
                               / CAST(a.cnt * b.cnt AS DOUBLE), 6) AS lift
                  FROM pc JOIN uc a ON pc.w1 = a.token
                          JOIN uc b ON pc.w2 = b.token)
            SELECT w1, w2, pair_n, lift,
                   CAST(row_number() OVER (
                     ORDER BY lift DESC, w1 ASC, w2 ASC) AS INT) AS "rank"
            FROM s ORDER BY lift DESC, w1 ASC, w2 ASC LIMIT 50""",
        "boilerplate_lines": """
            WITH ln AS (SELECT doc_id,
                               trim(unnest(string_split(text, chr(10))))
                                 AS line
                        FROM documents),
            f AS (SELECT doc_id, line FROM ln WHERE length(line) >= 16)
            SELECT sha256(line) AS line_sha,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_occurrences,
                   CAST(max(length(line)) AS INT) AS line_len
            FROM f GROUP BY sha256(line)
            HAVING count(DISTINCT doc_id) >= 3""",
        "source_overlap": f"""
            WITH t AS MATERIALIZED (
              SELECT source, regexp_extract_all(text, '{TOKEN_RE_SQL}')
                       AS toks
              FROM documents),
            sh AS MATERIALIZED (SELECT source,
              CASE WHEN length(toks) >= 8 THEN
                list_distinct([array_to_string(toks[i:i+7], ' ')
                               for i in range(1, length(toks) - 6)])
              ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
            ex AS (SELECT source, unnest(sh) AS s FROM sh),
            hh AS MATERIALIZED (
              SELECT DISTINCT source AS s_, {H1_SQL.format(s='s')} AS h
              FROM ex),
            sizes AS MATERIALIZED (
              SELECT s_, CAST(count(*) AS BIGINT) AS n FROM hh GROUP BY s_),
            p AS (SELECT a.s_ AS source_a, b.s_ AS source_b,
                         CAST(count(*) AS BIGINT) AS shared
                  FROM hh a JOIN hh b ON a.h = b.h AND a.s_ < b.s_
                  GROUP BY a.s_, b.s_)
            SELECT source_a, source_b, shared, x.n AS n_a, y.n AS n_b,
                   round(CAST(shared AS DOUBLE)
                         / CAST(least(x.n, y.n) AS DOUBLE), 6) AS containment
            FROM p JOIN sizes x ON p.source_a = x.s_
                   JOIN sizes y ON p.source_b = y.s_""",
        "doclen_histogram": f"""
            WITH d AS (SELECT CAST(length(regexp_extract_all(text,
                                '{TOKEN_RE_SQL}')) AS BIGINT) AS n
                       FROM documents),
            b AS (SELECT CAST(CASE WHEN n > 0 THEN length(bin(n))
                              ELSE 0 END AS INT) AS bucket, n FROM d)
            SELECT bucket,
                   CAST(CASE WHEN bucket > 0 THEN 1 << (bucket - 1)
                        ELSE 0 END AS BIGINT) AS lo_tokens,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n) AS BIGINT) AS total_tokens
            FROM b GROUP BY bucket""",
        "bigram_vocabulary": f"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS ts
                       FROM documents),
            g AS (SELECT doc_id,
                         unnest(list_transform(generate_series(1, len(ts) - 1),
                                i -> ts[i] || ' ' || ts[i + 1])) AS gram
                  FROM t)
            SELECT gram, CAST(count(*) AS BIGINT) AS tf,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM g GROUP BY gram
            ORDER BY tf DESC, gram ASC LIMIT 200""",
        "doc_chunks": f"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS ts
                       FROM documents),
            b AS (SELECT doc_id, ts, len(ts) AS n FROM t WHERE len(ts) > 0),
            c AS (SELECT doc_id, ts, n,
                         unnest(generate_series(0,
                           CAST((greatest(n - 64, 0) + 47) // 48 AS INT)))
                           AS chunk_idx
                  FROM b)
            SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
                   CAST(len(list_slice(ts, 1 + chunk_idx * 48,
                                       chunk_idx * 48 + 64)) AS BIGINT)
                     AS n_tokens,
                   array_to_string(list_slice(ts, 1 + chunk_idx * 48,
                                              chunk_idx * 48 + 64), ' ')
                     AS chunk
            FROM c ORDER BY doc_id, chunk_idx""",
        "tfidf_keywords": f"""
            WITH t AS (SELECT doc_id,
                              unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                                AS token
                       FROM documents),
            tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                   FROM t GROUP BY doc_id, token),
            dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                      FROM tf GROUP BY token),
            n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.token, tf.tf,
                     round(CAST(tf.tf * (SELECT n FROM n) AS DOUBLE)
                           / dfreq.df, 6) AS score
              FROM tf JOIN dfreq USING (token)),
            ranked AS (
              SELECT doc_id, token, tf, score,
                     CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, token ASC) AS INT) AS rank
              FROM scored)
            SELECT doc_id, token, tf, score, rank
            FROM ranked WHERE rank <= 3""",
        "contamination": f"""
            WITH planted AS MATERIALIZED (
              SELECT doc_id,
                     text || CASE WHEN
                         {H1_SQL.format(s="('eval|' || CAST(doc_id AS VARCHAR))")} % 17 = 0
                         OR doc_id % 13 = 0
                       THEN ' bench passage alpha beta gamma delta epsilon'
                            || ' zeta eta theta v' || CAST(doc_id % 7 AS VARCHAR)
                       ELSE '' END AS text
              FROM documents),
            t AS MATERIALIZED (
              SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
              FROM planted),
            sh AS MATERIALIZED (SELECT doc_id,
              CASE WHEN length(toks) >= {CONTAM_NGRAM} THEN
                list_distinct([array_to_string(toks[i:i+{CONTAM_NGRAM - 1}], ' ')
                               for i in range(1, length(toks) - {CONTAM_NGRAM - 2})])
              ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
            ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM sh),
            hh AS MATERIALIZED (
              SELECT DISTINCT doc_id, {H1_SQL.format(s='s')} AS h FROM ex),
            ev AS MATERIALIZED (
              SELECT doc_id AS eval_id, h FROM hh
              WHERE {H1_SQL.format(s="('eval|' || CAST(doc_id AS VARCHAR))")} % 17 = 0),
            tr AS (
              SELECT doc_id AS train_id, h FROM hh
              WHERE {H1_SQL.format(s="('eval|' || CAST(doc_id AS VARCHAR))")} % 17 <> 0)
            SELECT train_id, CAST(count(DISTINCT h) AS BIGINT) AS n_shared,
                   CAST(count(DISTINCT eval_id) AS BIGINT) AS n_eval_docs
            FROM tr JOIN ev USING (h) GROUP BY train_id""",
        "redact_pii": r"""
            WITH planted AS (
              SELECT doc_id,
                     text || CASE
                       WHEN doc_id % 3 = 0 THEN ' mail u' || doc_id || '@example.com now'
                       WHEN doc_id % 3 = 1 THEN ' ref https://example.org/p/' || doc_id || ' end'
                       ELSE ' host 10.0.' || (doc_id % 256) || '.7 up' END AS text
              FROM documents),
            s1 AS (
              SELECT doc_id, text,
                     CAST(length(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                       AS n_emails,
                     CAST(length(regexp_extract_all(text,
                       'https?://[A-Za-z0-9./_%+~#-]+')) AS BIGINT) AS n_urls,
                     regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       'https?://[A-Za-z0-9./_%+~#-]+', '<URL>', 'g') AS c2
              FROM planted)
            SELECT doc_id, n_emails, n_urls,
                   CAST(length(regexp_extract_all(c2,
                     '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT)
                     AS n_ips,
                   regexp_replace(c2,
                     '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')
                     AS clean
            FROM s1""",
        "domain_counts": """
            WITH planted AS (
              SELECT doc_id,
                     text || ' see http://site' || (doc_id % 5)
                          || '.example.com/x/' || doc_id
                          || CASE WHEN doc_id % 2 = 0
                             THEN ' and https://mirror.example.net/' || doc_id
                             ELSE '' END AS text
              FROM documents),
            u AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text,
                       'https?://[A-Za-z0-9./_%+~#-]+')) AS url
              FROM planted),
            d AS (
              SELECT doc_id,
                     regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS domain
              FROM u WHERE regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) != '')
            SELECT domain,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_urls
            FROM d GROUP BY domain""",
        "strength_assortativity": SQL_GRAPH_PREFIX + """
            SELECT round(corr(d1.wsum, d2.wsum), 6) AS assortativity
            FROM edges e JOIN deg d1 ON e.src = d1.id
                         JOIN deg d2 ON e.dst = d2.id""",
        "assortativity": SQL_GRAPH_PREFIX + """
            SELECT round(corr(CAST(d1.deg AS DOUBLE), CAST(d2.deg AS DOUBLE)), 6)
                   AS assortativity
            FROM edges e JOIN deg d1 ON e.src = d1.id
                         JOIN deg d2 ON e.dst = d2.id""",
        "repetition_ratio": f"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
                       FROM documents)
            SELECT doc_id,
                   CAST(length(toks) AS BIGINT) AS n_tokens,
                   CASE WHEN length(toks) > 0
                        THEN round(1.0 - length(list_distinct(toks))
                                   / length(toks), 6)
                        ELSE 0.0 END AS repetition
            FROM t""",
        "spread_behaviour": SQL_GRAPH_PREFIX + """
            SELECT e.src AS uin, ev.event_type AS behaviour_id,
                   CAST(count(*) AS BIGINT) AS cnt,
                   round(sum(ev.value), 6) AS value_sum
            FROM edges e JOIN events ev ON e.dst = ev.user_id
            GROUP BY e.src, ev.event_type""",
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CAST(('0x' || substr(md5('strat1' || CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                  % 1000000
                  < CASE lang WHEN 'en' THEN 500000
                              WHEN 'zh' THEN 1000000
                              ELSE 250000 END""",
        "hash_split": """
            SELECT doc_id,
                   CASE WHEN g < 900000 THEN 'train'
                        WHEN g < 950000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         CAST(('0x' || substr(md5('split1' || CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                         % 1000000 AS g
                  FROM documents)""",
        "lang_distribution": "SELECT lang, CAST(count(*) AS BIGINT) AS n "
        "FROM documents GROUP BY lang",
        "ngram_jaccard_dups": f"""
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
                       FROM documents),
            sh AS (SELECT doc_id,
                     CASE WHEN length(toks) >= 3 THEN
                       list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, length(toks) - 1)])
                     ELSE [array_to_string(toks, ' ')] END AS sh
                   FROM t)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   round(length(list_intersect(a.sh, b.sh))
                         / greatest(length(a.sh) + length(b.sh)
                                    - length(list_intersect(a.sh, b.sh)), 1), 6)
                     AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE round(length(list_intersect(a.sh, b.sh))
                        / greatest(length(a.sh) + length(b.sh)
                                   - length(list_intersect(a.sh, b.sh)), 1), 6) >= 0.5""",
        "dedup_clusters": _sql_dedup_clusters_lsh(),
        "dedup_apply": f"""
WITH cl AS MATERIALIZED ({_sql_dedup_clusters_lsh()})
SELECT d.doc_id AS id, cl.keeper_id,
       (cl.keeper_id IS NULL OR cl.keeper_id = d.doc_id) AS keep
FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
ORDER BY id""",
        "nstep_exact": SQL_GRAPH_PREFIX
        + """, r1 AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
r2 AS MATERIALIZED (
  SELECT DISTINCT a.src, b.dst FROM r1 a JOIN r1 b ON a.dst = b.src),
rr AS (SELECT src, dst FROM r1 UNION SELECT src, dst FROM r2)
SELECT src AS id, CAST(count(DISTINCT dst) AS BIGINT) AS n_reach
FROM rr GROUP BY src""",
        "nstep_degrees": sql_nstep_oracle(
            NSTEP_STEPS, SQL_GRAPH_PREFIX.rstrip()
        ),
        "hyperanf": sql_hyperanf_oracle(
            HYPERANF_STEPS, SQL_GRAPH_PREFIX.rstrip()
        ),
        "effective_diameter": sql_effective_diameter_oracle(
            HYPERANF_STEPS, SQL_GRAPH_PREFIX.rstrip(), q=0.9
        ),
        "random_walks": _sql_random_walks(5),
        "node2vec_walks": _sql_node2vec_walks(4),
        "metapath_walks": _sql_metapath_walks(4),
        "ann_topk": _sql_ann_topk(5),
        "ivf_ann": _sql_ivf_ann(5),
        "lsh_ann": _sql_lsh_ann(5),
        "embedding_dedup": _sql_embedding_dedup(0.42),
        "lang_id": _sql_lang_id(),
        "minhash_lsh_candidates": _sql_minhash_candidates(),
        "simhash": _sql_simhash(),
        "simhash_dups": _sql_simhash().replace(
            """SELECT d.doc_id AS id, CAST(COALESCE(s.simhash, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN sg s ON d.doc_id = s.doc_id""",
            """SELECT x.id AS a, y.id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM (SELECT d.doc_id AS id, CAST(COALESCE(s.simhash, 0) AS BIGINT) AS simhash
      FROM documents d LEFT JOIN sg s ON d.doc_id = s.doc_id) x
JOIN (SELECT d.doc_id AS id, CAST(COALESCE(s.simhash, 0) AS BIGINT) AS simhash
      FROM documents d LEFT JOIN sg s ON d.doc_id = s.doc_id) y
  ON x.id < y.id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""",
        ),
        "sequence_packing": f"""
            WITH t AS (SELECT doc_id,
                         CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                              AS BIGINT) AS n_tokens
                       FROM documents),
            k AS (SELECT doc_id, n_tokens,
                    {H1_SQL.format(s="('pack|' || CAST(doc_id AS VARCHAR))")}
                      AS key
                  FROM t WHERE n_tokens > 0),
            c AS (SELECT doc_id, n_tokens,
                    sum(n_tokens) OVER (
                      ORDER BY (key // 2251799813685248), key, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum
                  FROM k)
            SELECT doc_id, n_tokens,
                   CAST(cum - n_tokens AS BIGINT) AS start_off,
                   CAST((cum - n_tokens) // 512 AS BIGINT) AS first_chunk,
                   CAST((cum - 1) // 512 AS BIGINT) AS last_chunk,
                   CAST((cum - 1) // 512 - (cum - n_tokens) // 512 + 1
                        AS BIGINT) AS n_chunks
            FROM c""",
        "mixture_weights": f"""
            WITH t AS (SELECT source,
                         CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                              AS BIGINT) AS tk
                       FROM documents),
            per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                           CAST(sum(tk) AS BIGINT) AS n_tokens
                    FROM t GROUP BY source),
            f0 AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)))
                                  AS BIGINT) AS f FROM per),
            f1 AS (SELECT *, CASE WHEN (f+1)*(f+1) <= n_tokens
                                  THEN f+1 ELSE f END AS g FROM f0),
            iw AS (SELECT source, n_docs, n_tokens,
                          CASE WHEN g*g > n_tokens THEN g-1 ELSE g END AS w
                   FROM f1),
            tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
                           CAST(sum(w) AS BIGINT) AS tw FROM iw)
            SELECT source, n_docs, n_tokens,
                   round(CAST(n_tokens AS DOUBLE) / tt, 6) AS natural_share,
                   round(CAST(w AS DOUBLE) / tw, 6) AS temp_share,
                   round(CAST(w * tt AS DOUBLE) / (tw * n_tokens), 6) AS boost
            FROM iw, tot""",
        "mixture_apply": f"""
            WITH t AS (SELECT source,
                         CAST(length(regexp_extract_all(text, '{TOKEN_RE_SQL}'))
                              AS BIGINT) AS tk
                       FROM documents),
            per AS (SELECT source, CAST(sum(tk) AS BIGINT) AS n_tokens
                    FROM t GROUP BY source),
            f0 AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)))
                                  AS BIGINT) AS f FROM per),
            f1 AS (SELECT *, CASE WHEN (f+1)*(f+1) <= n_tokens
                                  THEN f+1 ELSE f END AS g FROM f0),
            iw AS (SELECT source, n_tokens,
                          CASE WHEN g*g > n_tokens THEN g-1 ELSE g END AS w
                   FROM f1),
            tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
                           CAST(sum(w) AS BIGINT) AS tw FROM iw),
            rates AS (SELECT source,
                   round(CAST(w * tt AS DOUBLE) / (tw * n_tokens), 6) AS b6
                      FROM iw, tot),
            rr AS (SELECT source, CAST(floor(b6) AS BIGINT) AS n_base,
                          CAST(round((b6 - floor(b6)) * 1e6, 0) AS BIGINT)
                            AS thresh
                   FROM rates)
            SELECT d.doc_id AS id, d.source,
                   CAST(r.n_base + CASE WHEN
                     ({H1_SQL.format(s="('mix|' || CAST(d.doc_id AS VARCHAR))")})
                       % 1000000 < r.thresh THEN 1 ELSE 0 END AS BIGINT)
                     AS n_copies
            FROM documents d JOIN rr r ON d.source = r.source""",
        "rate_spikes": """
WITH per AS MATERIALIZED (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) * 3600000000 AS BIGINT)
           AS hour_us,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hour_us),
g AS (SELECT event_type, count(*) AS k, CAST(sum(n) AS BIGINT) AS s,
             CAST(sum(n * n) AS BIGINT) AS ss
      FROM per GROUP BY event_type),
st AS (SELECT event_type,
              round(CAST(s AS DOUBLE) / k, 6) AS mean,
              round(sqrt(greatest(CAST(ss AS DOUBLE) / k
                                  - (CAST(s AS DOUBLE) / k)
                                    * (CAST(s AS DOUBLE) / k), 0.0)), 6)
                AS std
       FROM g)
SELECT p.event_type, p.hour_us, p.n, st.mean, st.std,
       (st.std > 0 AND abs(p.n - st.mean) > 3.0 * st.std) AS is_spike
FROM per p JOIN st ON p.event_type = st.event_type
ORDER BY p.event_type, p.hour_us""",
        "order_size_histogram": """
WITH per AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
             FROM lineitem GROUP BY l_orderkey)
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
FROM per GROUP BY n_lines ORDER BY n_lines""",
        "local_supplier_volume": """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 100, 0) AS BIGINT) AS rev_u
  FROM lineitem),
j AS (
  SELECT r.r_name AS region, n.n_name AS nation, li.rev_u
  FROM li
  JOIN orders o ON li.l_orderkey = o.o_orderkey
   AND o.o_orderdate >= TIMESTAMP '1996-01-01'
   AND o.o_orderdate < TIMESTAMP '1997-01-01'
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON li.l_suppkey = s.s_suppkey
   AND c.c_nationkey = s.s_nationkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey)
SELECT region, nation, CAST(count(*) AS BIGINT) AS n_items,
       CAST((sum(rev_u) + 50) // 100 AS BIGINT) / 100.0 AS revenue
FROM j GROUP BY region, nation ORDER BY region, nation""",
        "returned_items": """
WITH li AS (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 100, 0) AS BIGINT) AS rev_u
  FROM lineitem WHERE l_returnflag = 'R'),
per AS (
  SELECT o.o_custkey, CAST(sum(li.rev_u) AS BIGINT) AS rev_u
  FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey),
top AS (
  SELECT o_custkey, rev_u,
         CAST(row_number() OVER (ORDER BY rev_u DESC, o_custkey)
              AS INTEGER) AS rank
  FROM per ORDER BY rev_u DESC, o_custkey LIMIT 20)
SELECT t.rank, c.c_custkey, c.c_name, n.n_name AS nation,
       CAST((t.rev_u + 50) // 100 AS BIGINT) / 100.0 AS ret_revenue
FROM top t JOIN customer c ON t.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY t.rank""",
        "top_supplier": """
WITH per AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
              * CAST(round((1 - l_discount) * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name,
       CAST((p.rev_u + 50) // 100 AS BIGINT) / 100.0 AS total_revenue
FROM per p JOIN supplier s ON p.l_suppkey = s.s_suppkey
WHERE p.rev_u = (SELECT max(rev_u) FROM per)
ORDER BY s.s_suppkey""",
        "product_profit": """
WITH li AS (
  SELECT l_orderkey, l_partkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 100, 0) AS BIGINT) AS rev_u,
         CAST(round(l_quantity, 0) AS BIGINT) AS qty
  FROM lineitem),
j AS (
  SELECT p.p_type, CAST(year(o.o_orderdate) AS INTEGER) AS year,
         li.rev_u - li.qty
           * CAST(round(p.p_retailprice * 100, 0) AS BIGINT) * 100
           AS profit_u
  FROM li JOIN part p ON li.l_partkey = p.p_partkey
  JOIN orders o ON li.l_orderkey = o.o_orderkey),
g AS (
  SELECT p_type, year, CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(profit_u) AS BIGINT) AS profit_u
  FROM j GROUP BY p_type, year)
SELECT p_type, year, n_items,
       CAST(CASE WHEN profit_u >= 0 THEN (profit_u + 50) // 100
            ELSE -((-profit_u + 50) // 100) END AS BIGINT) / 100.0
         AS profit
FROM g ORDER BY p_type, year""",
        "small_qty_revenue": """
WITH li AS (
  SELECT l_partkey, CAST(round(l_quantity, 0) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c
  FROM lineitem),
per AS (
  SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(qty) AS BIGINT) AS sum_qty
  FROM li GROUP BY l_partkey)
SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_small_lines,
       round(CAST(sum(li.price_c) AS DOUBLE) / 100.0, 2) AS lost_revenue
FROM li JOIN per ON li.l_partkey = per.pk
JOIN part p ON li.l_partkey = p.p_partkey
WHERE 5 * li.qty * per.n_lines < per.sum_qty
GROUP BY p.p_brand ORDER BY p.p_brand""",
        "dormant_customers": """
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
  FROM customer),
st AS (SELECT CAST(count(*) AS BIGINT) AS n_pos,
              CAST(sum(bal_c) AS BIGINT) AS sum_pos
       FROM c WHERE bal_c > 0)
SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(c.bal_c) AS DOUBLE) / 100.0, 2) AS total_acctbal
FROM c
CROSS JOIN st
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.bal_c * st.n_pos > st.sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n.n_name ORDER BY nation""",
        "late_shipments": """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",
        "customer_distribution": """
WITH per AS (
  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey)
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM per GROUP BY n_orders ORDER BY n_orders""",
        "knn_hubness": SQL_GRAPH_PREFIX + """
, knn AS MATERIALIZED (
  SELECT dst FROM (
    SELECT dst, row_number() OVER (
      PARTITION BY src ORDER BY weight DESC, dst ASC) AS rank
    FROM edges) r
  WHERE rank <= 10),
ind AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS ind
        FROM knn GROUP BY dst)
SELECT COALESCE(i.ind, 0) AS in_degree,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM verts v LEFT JOIN ind i ON v.id = i.id
GROUP BY COALESCE(i.ind, 0) ORDER BY in_degree""",
        "degree_mixing_matrix": SQL_GRAPH_PREFIX + """
SELECT least(CAST(length(bin(da.deg)) AS INTEGER),
             CAST(length(bin(db.deg)) AS INTEGER)) AS bucket_lo,
       greatest(CAST(length(bin(da.deg)) AS INTEGER),
                CAST(length(bin(db.deg)) AS INTEGER)) AS bucket_hi,
       CAST(count(*) AS BIGINT) AS n_edges
FROM canon c JOIN deg da ON c.src = da.id JOIN deg db ON c.dst = db.id
GROUP BY 1, 2 ORDER BY bucket_lo, bucket_hi""",
        "zipf_curve": f"""
WITH t AS MATERIALIZED (
  SELECT unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
  FROM documents),
v AS MATERIALIZED (
  SELECT token, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY token),
r AS (SELECT tf,
             row_number() OVER (ORDER BY tf DESC, token) AS rank
      FROM v),
tot AS (SELECT CAST(sum(tf) AS BIGINT) AS tot FROM v)
SELECT CAST(length(bin(rank)) AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(tf) AS BIGINT) AS mass,
       round(CAST(100 * sum(tf) AS DOUBLE) / max(tot.tot), 6) AS mass_pct
FROM r CROSS JOIN tot GROUP BY bucket ORDER BY bucket""",
        "session_gaps": _sql_session_gaps(),
        "props_stats": """
WITH p AS (SELECT event_type,
                  CAST(json_extract(props, 'k') AS BIGINT) AS k
           FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(min(k) AS BIGINT) AS k_min,
       CAST(max(k) AS BIGINT) AS k_max
FROM p GROUP BY event_type ORDER BY event_type""",
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
        "status_priority_cube": """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
            AS INTEGER) AS lvl,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS DOUBLE) / 100.0, 2) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY lvl, status, priority""",
        "audience_overlap": """
WITH v AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'view'),
b AS (SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase')
SELECT 'view_and_buy' AS relation,
       CAST((SELECT count(*) FROM (SELECT * FROM v INTERSECT
                                   SELECT * FROM b)) AS BIGINT)
         AS n_users
UNION ALL
SELECT 'view_only',
       CAST((SELECT count(*) FROM (SELECT * FROM v EXCEPT
                                   SELECT * FROM b)) AS BIGINT)
UNION ALL
SELECT 'buy_only',
       CAST((SELECT count(*) FROM (SELECT * FROM b EXCEPT
                                   SELECT * FROM v)) AS BIGINT)""",
        "link_overlap": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst,
                    round(COALESCE(t.cnt, 0)
                          / least(du.deg, dv.deg), 6) AS score
             FROM canon c
             JOIN deg du ON c.src = du.id JOIN deg dv ON c.dst = dv.id
             LEFT JOIN (
               SELECT a.src AS u, b.src AS v, count(*) AS cnt
               FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
               GROUP BY a.src, b.src) t ON c.src = t.u AND c.dst = t.v""",
        "densification_curve": """
WITH ev AS MATERIALIZED (
  SELECT user_id, event_type, CAST(ts AS DATE) AS d FROM events),
fu AS (SELECT d, CAST(count(*) AS BIGINT) AS nu FROM (
         SELECT user_id, min(d) AS d FROM ev GROUP BY user_id)
       GROUP BY d),
fi AS (SELECT d, CAST(count(*) AS BIGINT) AS ni FROM (
         SELECT user_id, event_type, min(d) AS d FROM ev
         GROUP BY user_id, event_type)
       GROUP BY d),
days AS (SELECT DISTINCT d FROM ev)
SELECT strftime(days.d, '%Y-%m-%d') AS day,
       CAST(sum(COALESCE(fu.nu, 0)) OVER (ORDER BY days.d
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users,
       CAST(sum(COALESCE(fi.ni, 0)) OVER (ORDER BY days.d
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_incidences
FROM days LEFT JOIN fu ON days.d = fu.d LEFT JOIN fi ON days.d = fi.d
ORDER BY day""",
        "segment_unpivot": """
WITH g AS (SELECT n.n_name AS nation, c.c_mktsegment AS segment,
                  CAST(count(*) AS BIGINT) AS n_customers
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1, 2),
nats AS (SELECT DISTINCT n_name AS nation FROM nation
         WHERE n_nationkey IN (SELECT c_nationkey FROM customer)),
segs AS (SELECT seg FROM (VALUES ('AUTOMOBILE'), ('BUILDING'),
                                 ('FURNITURE'), ('HOUSEHOLD'),
                                 ('MACHINERY')) AS t(seg))
SELECT nats.nation AS nation, segs.seg AS segment,
       COALESCE(g.n_customers, 0) AS n_customers
FROM nats CROSS JOIN segs
LEFT JOIN g ON g.nation = nats.nation AND g.segment = segs.seg
ORDER BY nats.nation, segs.seg""",
        "brand_size_lift": """
WITH p AS (SELECT p_brand, CAST((p_size - 1) // 10 AS INTEGER)
                    AS size_bucket
           FROM part),
cells AS (SELECT p_brand, size_bucket, CAST(count(*) AS BIGINT) AS n
          FROM p GROUP BY p_brand, size_bucket),
rb AS (SELECT p_brand, CAST(sum(n) AS BIGINT) AS brand_total
       FROM cells GROUP BY p_brand),
cs AS (SELECT size_bucket, CAST(sum(n) AS BIGINT) AS size_total
       FROM cells GROUP BY size_bucket),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cells)
SELECT c.p_brand, c.size_bucket, c.n, rb.brand_total, cs.size_total,
       round(CAST(c.n * tot.total AS DOUBLE)
             / (rb.brand_total * cs.size_total), 6) AS lift
FROM cells c JOIN rb ON c.p_brand = rb.p_brand
JOIN cs ON c.size_bucket = cs.size_bucket
CROSS JOIN tot
ORDER BY c.p_brand, c.size_bucket""",
        "balance_deciles": """
WITH c AS (SELECT c_custkey,
                  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
           FROM customer),
r AS (SELECT bal_c,
             row_number() OVER (ORDER BY bal_c DESC, c_custkey) - 1
               AS rank
      FROM c),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c)
SELECT CAST((r.rank * 10) // n.n AS INTEGER) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(min(bal_c) AS BIGINT) AS min_bal_c,
       CAST(max(bal_c) AS BIGINT) AS max_bal_c,
       CAST(sum(bal_c) AS BIGINT) AS sum_bal_c
FROM r CROSS JOIN n GROUP BY 1 ORDER BY decile""",
        "trailing_revenue": """
WITH per AS (
  SELECT o_orderpriority,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_i,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1, 2)
SELECT o_orderpriority AS priority, day_i, n_orders,
       round(CAST(rev_c AS DOUBLE) / 100.0, 2) AS revenue,
       round(CAST(sum(rev_c) OVER (
               PARTITION BY o_orderpriority ORDER BY day_i
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS DOUBLE) / 100.0, 2) AS trailing_7d_revenue
FROM per ORDER BY priority, day_i""",
        "shipping_latency": "WITH " + _sql_gq_chain(
            256, (0.5, 0.9, 0.99),
            """SELECT o.o_orderpriority AS g,
                      CAST(CAST(f.first_ship AS DATE)
                           - CAST(o.o_orderdate AS DATE) AS DOUBLE) AS x
               FROM orders o JOIN (
                 SELECT l_orderkey, min(l_shipdate) AS first_ship
                 FROM lineitem GROUP BY l_orderkey) f
               ON o.o_orderkey = f.l_orderkey""",
        ) + "\nSELECT g AS o_orderpriority, q, value FROM val"
            "\nORDER BY o_orderpriority, q",
        "edge_weight_spectrum": SQL_GRAPH_PREFIX + """
SELECT CAST(length(bin(CAST(weight AS BIGINT))) AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CAST(weight AS BIGINT)) AS BIGINT) AS weight_mass
FROM canon GROUP BY bucket ORDER BY bucket""",
        "source_entropy": f"""
WITH t AS MATERIALIZED (
  SELECT source,
         unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS token
  FROM documents),
c AS MATERIALIZED (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c
  FROM t GROUP BY source, token)
SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6)
         AS entropy_bits
FROM c GROUP BY source ORDER BY source""",
        "reorder_gaps": _sql_reorder_gaps(),
        "audience_jaccard": """
WITH inc AS MATERIALIZED (
  SELECT DISTINCT user_id, event_type AS t FROM events),
marg AS (SELECT t, CAST(count(*) AS BIGINT) AS m FROM inc GROUP BY t),
inter AS (
  SELECT a.t AS ta, b.t AS tb, CAST(count(*) AS BIGINT) AS nab
  FROM inc a JOIN inc b ON a.user_id = b.user_id AND a.t < b.t
  GROUP BY a.t, b.t),
pairs AS (
  SELECT ma.t AS ta, ma.m AS ma, mb.t AS tb, mb.m AS mb
  FROM marg ma JOIN marg mb ON ma.t < mb.t)
SELECT p.ta, p.tb, COALESCE(i.nab, 0) AS n_both, p.ma, p.mb,
       round(CAST(COALESCE(i.nab, 0) AS DOUBLE)
             / (p.ma + p.mb - COALESCE(i.nab, 0)), 6) AS jaccard
FROM pairs p LEFT JOIN inter i ON p.ta = i.ta AND p.tb = i.tb
ORDER BY p.ta, p.tb""",
        "markov_stationary": _sql_markov_stationary(),
        "cheapest_supplier": """
WITH cat AS MATERIALIZED (
  SELECT l_partkey, l_suppkey,
         (CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 10000)
           // CAST(round(l_quantity, 0) AS BIGINT) AS unit_u
  FROM lineitem),
mn AS (SELECT l_partkey, CAST(min(unit_u) AS BIGINT) AS mu
       FROM cat GROUP BY l_partkey),
best AS (
  SELECT c.l_partkey AS p_partkey,
         CAST(min(c.l_suppkey) AS BIGINT) AS s_suppkey,
         mn.mu AS unit_u
  FROM cat c JOIN mn ON c.l_partkey = mn.l_partkey
                    AND c.unit_u = mn.mu
  GROUP BY c.l_partkey, mn.mu)
SELECT b.p_partkey, b.s_suppkey, s.s_name,
       CAST((b.unit_u + 50) // 100 AS BIGINT) / 1e4 AS unit_price
FROM best b JOIN supplier s ON b.s_suppkey = s.s_suppkey
ORDER BY b.p_partkey""",
        "dominant_suppliers": """
WITH cat AS MATERIALIZED (
  SELECT l_partkey, l_suppkey,
         CAST(round(l_quantity, 0) AS BIGINT) AS qty
  FROM lineitem),
per AS (SELECT l_partkey, l_suppkey, CAST(sum(qty) AS BIGINT) AS sq
        FROM cat GROUP BY 1, 2),
tot AS (SELECT l_partkey AS pk, CAST(sum(sq) AS BIGINT) AS st
        FROM per GROUP BY 1)
SELECT per.l_suppkey AS s_suppkey,
       CAST(count(*) AS BIGINT) AS n_parts_dominated,
       CAST(sum(per.sq) AS BIGINT) AS qty_mass
FROM per JOIN tot ON per.l_partkey = tot.pk
WHERE 8 * per.sq > tot.st
GROUP BY per.l_suppkey ORDER BY s_suppkey""",
        "catalog_breadth": """
WITH cat AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand,
       CAST(count(DISTINCT cat.l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(count(DISTINCT cat.l_partkey) AS BIGINT) AS n_parts,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM cat JOIN part p ON cat.l_partkey = p.p_partkey
GROUP BY p.p_brand ORDER BY p.p_brand""",
        "price_dispersion": """
WITH cat AS MATERIALIZED (
  SELECT l_partkey,
         (CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 10000)
           // CAST(round(l_quantity, 0) AS BIGINT) AS unit_u
  FROM lineitem),
per AS (SELECT l_partkey, CAST(min(unit_u) AS BIGINT) AS lo,
               CAST(max(unit_u) AS BIGINT) AS hi
        FROM cat GROUP BY l_partkey)
SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CASE WHEN hi > lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_spread,
       round(avg(CAST(hi - lo AS DOUBLE) / lo), 6) AS mean_rel_spread
FROM per JOIN part p ON per.l_partkey = p.p_partkey
GROUP BY p.p_brand ORDER BY p.p_brand""",
        "lcc_histogram": SQL_GRAPH_PREFIX
        + """, tri AS MATERIALIZED (
  SELECT a.src AS x, a.dst AS y, b.dst AS z
  FROM canon a JOIN canon b ON a.dst = b.src
  JOIN canon c ON c.src = a.src AND c.dst = b.dst),
corners AS (SELECT x AS id FROM tri UNION ALL
            SELECT y AS id FROM tri UNION ALL
            SELECT z AS id FROM tri),
tv AS (SELECT id, CAST(count(*) AS BIGINT) AS t FROM corners GROUP BY id)
SELECT CAST(CASE WHEN d.deg >= 2
            THEN least((20 * COALESCE(tv.t, 0))
                       // (d.deg * (d.deg - 1)), 9)
            ELSE 0 END AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM verts v JOIN deg d ON v.id = d.id LEFT JOIN tv ON v.id = tv.id
GROUP BY 1 ORDER BY bin""",
        "revenue_growth": """
WITH per AS (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS year,
         CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2)
SELECT nation, year,
       round(CAST(rev_c AS DOUBLE) / 100.0, 2) AS revenue,
       round(CAST(100 * (rev_c - lag(rev_c) OVER w) AS DOUBLE)
             / lag(rev_c) OVER w, 6) AS yoy_pct
FROM per WINDOW w AS (PARTITION BY nation ORDER BY year)
ORDER BY nation, year""",
        "lifetime_quantiles": "WITH " + _sql_gq_chain(
            256, (0.5, 0.9, 0.99),
            """SELECT 0 AS g,
                      CAST(epoch_us(max(ts)) - epoch_us(min(ts))
                           AS DOUBLE) / 1e6 AS x
               FROM events GROUP BY user_id""",
        ) + "\nSELECT q, value FROM val ORDER BY q",
        "event_grouping_sets": """
WITH ev AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day
            FROM events)
SELECT event_type, day,
       CAST(GROUPING(event_type) * 2 + GROUPING(day) AS INTEGER) AS lvl,
       CAST(count(*) AS BIGINT) AS n
FROM ev
GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
ORDER BY lvl, event_type, day""",
        "lsh_recall": f"""
WITH ex AS MATERIALIZED (
  SELECT query_id, nbr_id FROM ({_sql_ann_topk(5)})),
ls AS MATERIALIZED (
  SELECT query_id, nbr_id FROM ({_sql_lsh_ann(5)})),
per AS (
  SELECT e.query_id, CAST(count(l.nbr_id) AS BIGINT) AS hits
  FROM ex e LEFT JOIN ls l
    ON e.query_id = l.query_id AND e.nbr_id = l.nbr_id
  GROUP BY e.query_id)
SELECT CAST(5 AS INTEGER) AS k,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(hits) AS BIGINT) AS sum_hits,
       round(CAST(sum(hits) AS DOUBLE) / (5 * count(*)), 6)
         AS mean_recall,
       round(CAST(min(hits) AS DOUBLE) / 5.0, 6) AS min_recall
FROM per""",
        "open_order_aging": "WITH " + _sql_gq_chain(
            256, (0.5, 0.9, 0.99),
            """SELECT o_orderpriority AS g,
                      CAST(CAST((SELECT max(o_orderdate) FROM orders)
                                AS DATE)
                           - CAST(o_orderdate AS DATE) AS DOUBLE) AS x
               FROM orders WHERE o_orderstatus = 'O'""",
        ) + "\nSELECT g AS o_orderpriority, q, value FROM val"
            "\nORDER BY o_orderpriority, q",
        "supply_demand_balance": """
WITH s AS (
  SELECT n.n_name AS nation,
         CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS supplied_qty
  FROM lineitem l JOIN supplier sp ON l.l_suppkey = sp.s_suppkey
  JOIN nation n ON sp.s_nationkey = n.n_nationkey
  GROUP BY 1),
c AS (
  SELECT n.n_name AS nation,
         CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS consumed_qty
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer cu ON o.o_custkey = cu.c_custkey
  JOIN nation n ON cu.c_nationkey = n.n_nationkey
  GROUP BY 1)
SELECT COALESCE(s.nation, c.nation) AS nation,
       COALESCE(s.supplied_qty, 0) AS supplied_qty,
       COALESCE(c.consumed_qty, 0) AS consumed_qty,
       CASE WHEN COALESCE(c.consumed_qty, 0) > 0
            THEN round(CAST(COALESCE(s.supplied_qty, 0) AS DOUBLE)
                       / c.consumed_qty, 6)
       END AS supply_ratio
FROM s FULL OUTER JOIN c ON s.nation = c.nation
ORDER BY nation""",
        "lpa_weighted": _sql_lpa(LPA_ITERS, weighted=True),
        "lang_rand_index": _sql_lang_rand_index(),
        "revenue_gini": """
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY o_custkey),
hist AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM per GROUP BY v),
h2 AS (SELECT v, c,
         CAST(COALESCE(sum(c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS BIGINT) AS o
       FROM hist),
a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(v * c) AS BIGINT) AS t,
             CAST(sum(v * (c * o + (c * (c + 1)) // 2)) AS BIGINT) AS s
      FROM h2)
SELECT n AS n_customers, t AS total_cents,
       round((2.0 * s) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
FROM a""",
        "friendship_paradox": SQL_GRAPH_PREFIX + """
SELECT CAST(count(*) AS BIGINT) AS v,
       CAST(sum(deg) / 2 AS BIGINT) AS e,
       round(CAST(sum(deg) AS DOUBLE) / count(*), 6) AS mean_deg,
       round(CAST(sum(deg * deg) AS DOUBLE) / sum(deg), 6)
         AS mean_nbr_deg,
       round((CAST(sum(deg * deg) AS DOUBLE) / sum(deg))
             / (CAST(sum(deg) AS DOUBLE) / count(*)), 6) AS paradox
FROM deg""",
        "error_conversion_impact": """
WITH x AS (
  SELECT user_id, ts, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS brk
  FROM events),
g AS (SELECT user_id, event_type,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM x),
sess AS (SELECT user_id, grp,
                max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS has_error,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS has_purchase
         FROM g GROUP BY user_id, grp)
SELECT has_error, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(has_purchase) AS BIGINT) AS n_converted,
       round(CAST(100 * sum(has_purchase) AS DOUBLE) / count(*), 6)
         AS conversion_pct
FROM sess GROUP BY has_error ORDER BY has_error""",
        "integrity_audit": """
SELECT 'lineitem->orders' AS relation, CAST(count(*) AS BIGINT)
         AS n_violations
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem->part', CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
UNION ALL
SELECT 'orders->customer', CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""",
        "priority_drift": """
WITH o AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
                  o_orderpriority
           FROM orders),
per AS (SELECT year, o_orderpriority, CAST(count(*) AS BIGINT) AS n
        FROM o GROUP BY 1, 2),
ov AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS tn FROM o
       GROUP BY 1),
tt AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM o)
SELECT per.year, per.o_orderpriority AS priority, per.n,
       round(CAST(100 * per.n AS DOUBLE)
             / sum(per.n) OVER (PARTITION BY per.year), 6) AS share_pct,
       round(CAST(100 * per.n AS DOUBLE)
             / sum(per.n) OVER (PARTITION BY per.year)
             - CAST(100 * ov.tn AS DOUBLE) / tt.tot, 6) AS dev_pct
FROM per JOIN ov ON per.o_orderpriority = ov.o_orderpriority
CROSS JOIN tt
ORDER BY per.year, priority""",
        "segment_mix": """
WITH g AS (SELECT n.n_name AS nation, c.c_mktsegment AS segment,
                  CAST(count(*) AS BIGINT) AS n_customers
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1, 2)
SELECT nation, segment, n_customers,
       round(CAST(100 * n_customers AS DOUBLE)
             / sum(n_customers) OVER (PARTITION BY nation), 6) AS pct
FROM g ORDER BY nation, segment""",
        "discount_bands": """
WITH b AS (
  SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS discount_pct,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
  FROM lineitem),
g AS (SELECT discount_pct, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(pc) AS BIGINT) AS list_c,
             CAST(sum(pc * (100 - discount_pct)) AS BIGINT) AS disc_u
      FROM b GROUP BY discount_pct)
SELECT discount_pct, n_items,
       round(CAST(list_c AS DOUBLE) / 100.0, 2) AS list_revenue,
       round(CAST(disc_u AS DOUBLE) / 1e4, 2) AS disc_revenue,
       round(CAST(list_c * 100 - disc_u AS DOUBLE) / 1e4, 2) AS forgone
FROM g ORDER BY discount_pct""",
        "revenue_concentration": """
WITH per AS (SELECT o_custkey,
                    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                         AS BIGINT) AS rc
             FROM orders GROUP BY o_custkey),
tt AS (SELECT CAST(sum(rc) AS BIGINT) AS tot FROM per),
tp AS (SELECT rc, row_number() OVER (ORDER BY rc DESC, o_custkey) AS rn
       FROM per),
kd AS (SELECT CAST(k AS INTEGER) AS k FROM (VALUES (10), (100)) AS t(k))
SELECT k, CAST(sum(tp.rc) AS BIGINT) AS mass_cents, tt.tot,
       round(CAST(100 * sum(tp.rc) AS DOUBLE) / tt.tot, 6) AS share_pct
FROM kd JOIN tp ON tp.rn <= kd.k, tt
GROUP BY k, tt.tot ORDER BY k""",
        "revenue_rollup_totals": """
WITH li AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round((1 - l_discount) * 10000, 0) AS BIGINT) AS rev_u
  FROM lineitem),
j AS MATERIALIZED (
  SELECT r.r_name, n.n_name, o.o_orderkey, li.rev_u
  FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey)
SELECT r_name AS region, n_name AS nation,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS lvl,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       round(CAST(sum(rev_u) AS DOUBLE) / 1e6, 2) AS revenue
FROM j GROUP BY ROLLUP (r_name, n_name)
ORDER BY lvl, region, nation""",
        "snapshot_diff": f"""
            WITH m AS (SELECT doc_id, text,
                    ({H1_SQL.format(s="('diffv2|' || CAST(doc_id AS VARCHAR))")})
                      % 10 AS m
                       FROM documents),
            v2 AS (SELECT doc_id,
                          CASE WHEN m = 1 THEN text || ' [v2]' ELSE text END
                            AS text
                   FROM m WHERE m != 0
                   UNION ALL
                   SELECT doc_id + 10000000, text || ' [new]'
                   FROM m WHERE m = 2),
            a AS (SELECT doc_id AS id, md5(text) AS ho FROM documents),
            b AS (SELECT doc_id AS id, md5(text) AS hn FROM v2)
            SELECT COALESCE(a.id, b.id) AS id,
                   CASE WHEN a.id IS NULL THEN 'added'
                        WHEN b.id IS NULL THEN 'removed'
                        WHEN ho = hn THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM a FULL OUTER JOIN b ON a.id = b.id""",
        "doc_fingerprint": _sql_doc_fingerprint(),
        "similarity_threshold": """
            SELECT a.vec_id AS query_id,
                   CAST(sum(CASE WHEN
                     list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])) >= 0.8
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_similar
            FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
            GROUP BY a.vec_id""",
        "wcc_trace": _sql_wcc_trace(WCC_SQL_ITERS),
        "ppr_sweep": _sql_ppr_sweep(PPR_ITERS, k=32),
        "edge_betweenness": _sql_edge_betweenness(),
        "onion_layers": _sql_onion(),
        "lang_conductance": f"""
            WITH cg AS MATERIALIZED ({_sql_reference_graph()}),
            lab AS MATERIALIZED (
              SELECT doc_id AS id, lang AS label FROM documents),
            canon AS MATERIALIZED (
              SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              FROM cg WHERE src != dst),
            e AS MATERIALIZED (
              SELECT c.a, c.b, x.label AS la, y.label AS lb
              FROM canon c JOIN lab x ON c.a = x.id
                           JOIN lab y ON c.b = y.id),
            vol AS (
              SELECT label, CAST(count(*) AS BIGINT) AS volume FROM (
                SELECT la AS label FROM e
                UNION ALL SELECT lb FROM e) t GROUP BY label),
            cut AS (
              SELECT label, CAST(count(*) AS BIGINT) AS cut_edges FROM (
                SELECT la AS label FROM e WHERE la != lb
                UNION ALL SELECT lb FROM e WHERE la != lb) t GROUP BY label),
            tot AS (SELECT 2 * CAST(count(*) AS BIGINT) AS tot_vol FROM e)
            SELECT v.label AS lang,
                   COALESCE(c.cut_edges, 0) AS cut_edges,
                   v.volume,
                   CASE WHEN least(v.volume, t.tot_vol - v.volume) > 0
                        THEN round(CAST(COALESCE(c.cut_edges, 0) AS DOUBLE)
                             / CAST(least(v.volume, t.tot_vol - v.volume)
                                    AS DOUBLE), 6)
                   END AS conductance
            FROM vol v LEFT JOIN cut c ON v.label = c.label, tot t
            ORDER BY lang""",
        "forman_curvature": SQL_GRAPH_PREFIX
        + """SELECT c.src, c.dst,
                    CAST(COALESCE(t.cn, 0) AS BIGINT) AS support,
                    CAST(4 - du.deg - dv.deg + 3 * COALESCE(t.cn, 0)
                         AS BIGINT) AS curvature
             FROM canon c
             JOIN deg du ON c.src = du.id JOIN deg dv ON c.dst = dv.id
             LEFT JOIN (
               SELECT a.src AS u, b.src AS v,
                      CAST(count(*) AS BIGINT) AS cn
               FROM edges a JOIN edges b
                 ON a.dst = b.dst AND a.src < b.src
               GROUP BY a.src, b.src) t
               ON c.src = t.u AND c.dst = t.v
             ORDER BY c.src, c.dst""",
        # outer CTEs renamed (li2/canon2/verts2): the nested matching
        # chain brings its own li/canon/... and DuckDB rejects duplicate
        # CTE aliases across the nesting (same binder quirk coarsen_stats
        # recorded)
        "vertex_cover": f"""
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
cov AS MATERIALIZED (
  SELECT src AS id FROM m UNION SELECT dst AS id FROM m),
s AS (SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM verts2) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM canon2) AS n_edges,
  (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_matched,
  (SELECT CAST(count(*) AS BIGINT) FROM cov) AS cover_size,
  (SELECT CAST(count(*) AS BIGINT) FROM canon2 c
   WHERE NOT EXISTS (SELECT 1 FROM cov v WHERE v.id = c.src)
     AND NOT EXISTS (SELECT 1 FROM cov v WHERE v.id = c.dst))
    AS n_uncovered)
SELECT n_vertices, n_edges, n_matched, cover_size, n_uncovered,
       round(CAST(cover_size AS DOUBLE) / n_matched, 6) AS approx_ratio
FROM s""",
        "out_of_order_stats": """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  max(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS pm
           FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN pm > ts_us THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(COALESCE(max(CASE WHEN pm > ts_us THEN pm - ts_us END), 0)
            AS BIGINT) AS max_lateness_us,
       round(CAST(sum(CASE WHEN pm > ts_us THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS late_frac
FROM e GROUP BY user_id ORDER BY user_id""",
        "scan_clusters": _sql_scan(6),
        "pq_recall": f"""
WITH bf AS MATERIALIZED ({_sql_l2_topk(5)}),
pqt AS MATERIALIZED ({_sql_pq_ann(4, 16, 2, 64, 5)}),
h AS (SELECT b.query_id, CAST(count(*) AS BIGINT) AS hits
      FROM bf b JOIN pqt ON b.query_id = pqt.query_id
                        AND b.nbr_id = pqt.nbr_id
      GROUP BY b.query_id)
SELECT q.query_id, COALESCE(h.hits, 0) AS hits
FROM (SELECT DISTINCT query_id FROM bf) q
LEFT JOIN h ON q.query_id = h.query_id ORDER BY q.query_id""",
        "matryoshka_recall": _sql_matryoshka_recall(5, MATRYOSHKA_DIMS),
        "wedge_closure": _sql_wedge_closure(),
        "embedding_anisotropy": _sql_anisotropy(EMB_DIM),
        "kcenter_seeds": _sql_kcenter(KCENTER_K),
        "davies_bouldin": _sql_davies_bouldin(EMB_DIM),
        "priority_late_orders": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND CAST(l.l_shipdate AS DATE)
                    > CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        "readability_cli": """
WITH per AS (
  SELECT source,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
              AS BIGINT) AS lt,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+'))
              AS BIGINT) AS wd,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS st
  FROM documents),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(lt) AS BIGINT) AS letters,
             CAST(sum(wd) AS BIGINT) AS words,
             CAST(sum(st) AS BIGINT) AS sentences
      FROM per GROUP BY source)
SELECT source, n_docs, letters, words, sentences,
       round(0.0588 * (CAST(letters AS DOUBLE) / words * 100)
             - 0.296 * (CAST(sentences AS DOUBLE) / words * 100)
             - 15.8, 6) AS cli
FROM a ORDER BY source""",
        "snn_clusters": _sql_snn(SNN_K, SNN_KT, 10),
        "wl_colors": _sql_wl(WL_ROUNDS),
        "knn_label_noise": _sql_knn_label_noise(10),
        "nearest_centroid_accuracy": _sql_nearest_centroid(EMB_DIM),
        # closed-form ground truth: positive weights mean the optimal
        # path never takes a skip edge, so path_weight(r) is the
        # run-scoped prefix sum of w = 1 + r%5 over r's maximal
        # consecutive-sel island
        "dag_critical_path": """
WITH dd AS (SELECT DISTINCT doc_id FROM documents),
d AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT)
        AS r FROM dd),
s AS (SELECT r, (1 + r % 5) AS w,
             (r = 0 OR (CAST(('0x' || substr(md5('topo|' ||
                CAST(r - 1 AS VARCHAR)), 1, 14)) AS BIGINT) % 2) != 0)
               AS brk
      FROM d),
c AS (SELECT r, w, CASE WHEN brk THEN r END AS brk_r,
             sum(w) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS cw
      FROM s),
st AS (SELECT r, w, cw,
              max(brk_r) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
                AS run_start
       FROM c)
SELECT a.r AS id, CAST(a.cw - b.cw + b.w AS BIGINT) AS path_weight
FROM st a JOIN st b ON b.r = a.run_start
ORDER BY id""",
        "k_anonymity": f"""
WITH g AS (SELECT c_nationkey, c_mktsegment,
                  CAST(count(*) AS BIGINT) AS sz,
                  CAST(count(DISTINCT floor(c_acctbal / {K_ANON_BAND}))
                       AS BIGINT) AS ldiv
           FROM customer GROUP BY c_nationkey, c_mktsegment)
SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(sz) AS BIGINT) AS min_group_size,
       CAST(sum(CASE WHEN sz < {K_ANON_K} THEN sz ELSE 0 END) AS BIGINT)
         AS rows_below_k,
       CAST(min(ldiv) AS BIGINT) AS min_l_diversity,
       round(CAST(sum(CASE WHEN sz < {K_ANON_K} THEN sz ELSE 0 END)
                  AS DOUBLE) / sum(sz), 6) AS pct_below_k
FROM g""",
        "abc_classification": """
WITH per AS (SELECT l_partkey,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM lineitem GROUP BY l_partkey),
t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per),
rk AS (SELECT cents,
              sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                               ROWS UNBOUNDED PRECEDING) AS cum,
              t.total
       FROM per, t)
SELECT CASE WHEN cum * 100 <= 80 * total THEN 'A'
            WHEN cum * 100 <= 95 * total THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS class_revenue_cents,
       round(CAST(sum(cents) AS DOUBLE) / max(total), 6)
         AS revenue_share
FROM rk GROUP BY 1 ORDER BY 1""",
        "linkpred_first_rank": SQL_GRAPH_PREFIX + """,
lpe AS MATERIALIZED (
  SELECT src, dst,
         CAST(('0x' || substr(md5('lp:' || CAST(src AS VARCHAR) || ':'
               || CAST(dst AS VARCHAR)), 1, 14)) AS BIGINT) % 5 = 0
           AS held
  FROM canon),
lpt AS MATERIALIZED (SELECT src, dst FROM lpe WHERE NOT held),
lph AS MATERIALIZED (SELECT src, dst FROM lpe WHERE held),
lps AS MATERIALIZED (
  SELECT src, dst FROM lpt
  UNION ALL SELECT dst AS src, src AS dst FROM lpt),
lpc AS MATERIALIZED (
  SELECT a.dst AS u, b.dst AS v, CAST(count(*) AS BIGINT) AS cn
  FROM lps a JOIN lps b ON a.src = b.src AND a.dst != b.dst
  GROUP BY a.dst, b.dst),
lpc2 AS MATERIALIZED (
  SELECT c.u, c.v, c.cn FROM lpc c
  WHERE NOT EXISTS (SELECT 1 FROM lps s
                    WHERE s.src = c.u AND s.dst = c.v)),
lpr AS MATERIALIZED (
  SELECT u, v, CAST(row_number() OVER (
    PARTITION BY u ORDER BY cn DESC, v ASC) AS BIGINT) AS rnk
  FROM lpc2)
SELECT h.src, h.dst,
       f.rnk AS rank_from_src,
       r.rnk AS rank_from_dst,
       least(COALESCE(f.rnk, r.rnk), COALESCE(r.rnk, f.rnk))
         AS best_rank
FROM lph h
LEFT JOIN lpr f ON f.u = h.src AND f.v = h.dst
LEFT JOIN lpr r ON r.u = h.dst AND r.v = h.src
ORDER BY h.src, h.dst""",
        "rbm_pairs": EMB_SQL_PREFIX + f""",
b1 AS MATERIALIZED (
  SELECT query_id, nbr_id, cosine FROM (
    SELECT a.id AS query_id, b.id AS nbr_id,
           round({_cos_sql("a.vec", "b.vec")}, 6) AS cosine,
           row_number() OVER (PARTITION BY a.id
                              ORDER BY round({_cos_sql("a.vec", "b.vec")},
                                             6) DESC, b.id ASC) AS rn
    FROM v a JOIN v b ON a.id != b.id) t WHERE rn = 1)
SELECT f.query_id AS a, f.nbr_id AS b, f.cosine
FROM b1 f
WHERE f.query_id < f.nbr_id
  AND EXISTS (SELECT 1 FROM b1 r
              WHERE r.query_id = f.nbr_id AND r.nbr_id = f.query_id)
ORDER BY a""",
        "hashing_trick_audit": f"""
WITH toks AS (
  SELECT DISTINCT unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
    AS token
  FROM documents),
bk AS (SELECT token,
              {H1_SQL.format(s='token')} % {HASH_TRICK_BUCKETS} AS b
       FROM toks),
ld AS (SELECT b, CAST(count(*) AS BIGINT) AS load FROM bk GROUP BY b)
SELECT CAST(sum(load) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_buckets_used,
       CAST(max(load) AS BIGINT) AS max_bucket_load,
       CAST(sum(CASE WHEN load >= 2 THEN load ELSE 0 END) AS BIGINT)
         AS n_tokens_colliding,
       round(CAST(sum(CASE WHEN load >= 2 THEN load ELSE 0 END)
                  AS DOUBLE) / sum(load), 6) AS pct_colliding
FROM ld""",
        "spectral_moments": SQL_GRAPH_PREFIX + """,
tri AS (SELECT CAST(count(*) AS BIGINT) AS t
        FROM canon a JOIN canon b ON a.src = b.src
        JOIN canon c ON c.src = a.dst AND c.dst = b.dst),
cn4 AS (SELECT CAST(sum(cn * cn) AS BIGINT) AS s FROM (
          SELECT a.dst AS u, b.dst AS v,
                 CAST(count(*) AS BIGINT) AS cn
          FROM edges a JOIN edges b
            ON a.src = b.src AND a.dst != b.dst
          GROUP BY a.dst, b.dst) z),
dg AS (SELECT CAST(sum(deg) AS BIGINT) AS m2,
              CAST(sum(deg * deg) AS BIGINT) AS sd2 FROM deg)
SELECT dg.m2 AS trace_a2,
       CAST(6 * tri.t AS BIGINT) AS trace_a3,
       CAST(dg.sd2 + cn4.s AS BIGINT) AS trace_a4
FROM dg, tri, cn4""",
        "seasonal_naive_error": """
WITH per AS (SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                         AS BIGINT) AS day_i,
                    CAST(sum(CAST(round(o_totalprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM orders GROUP BY 1),
e7 AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(abs(a.cents - b.cents)) AS BIGINT) AS ae
       FROM per a JOIN per b ON a.day_i = b.day_i + 7),
e1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(abs(a.cents - b.cents)) AS BIGINT) AS ae
       FROM per a JOIN per b ON a.day_i = b.day_i + 1)
SELECT e7.n AS n_scored_7d, e7.ae AS abs_err_7d_cents,
       e1.n AS n_scored_1d, e1.ae AS abs_err_1d_cents,
       round((CAST(e7.ae AS DOUBLE) / e7.n) / 100, 6) AS mae_7d,
       round((CAST(e1.ae AS DOUBLE) / e1.n) / 100, 6) AS mae_1d,
       CASE WHEN e1.ae > 0 AND e7.n > 0
            THEN round((CAST(e7.ae AS DOUBLE) / e7.n)
                       / (CAST(e1.ae AS DOUBLE) / e1.n), 6)
       END AS mase_vs_naive1
FROM e7, e1""",
        "bond_percolation": _sql_bond_percolation(BOND_PS, 16),
        "selfjoin_size_audit": """
WITH ko AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
            GROUP BY l_orderkey),
kp AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
       GROUP BY l_partkey),
ks AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
       GROUP BY l_suppkey),
u AS (
  SELECT 'l_orderkey' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(c * c) AS BIGINT) AS exact_join_size FROM ko
  UNION ALL
  SELECT 'l_partkey', CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(sum(c * c) AS BIGINT) FROM kp
  UNION ALL
  SELECT 'l_suppkey', CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(sum(c * c) AS BIGINT) FROM ks)
SELECT key_col, n_rows, n_keys, exact_join_size,
       round(CAST(n_rows AS DOUBLE) * n_rows / n_keys, 6)
         AS independence_estimate,
       round(CAST(exact_join_size AS DOUBLE)
             / (CAST(n_rows AS DOUBLE) * n_rows / n_keys), 6)
         AS skew_ratio
FROM u ORDER BY key_col""",
        "user_twap": """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
s AS (SELECT user_id, cents, us,
             lead(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS nxt
      FROM e)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN nxt IS NOT NULL THEN nxt - us END) AS BIGINT)
         AS span_us,
       CASE WHEN COALESCE(sum(CASE WHEN nxt IS NOT NULL
                                   THEN nxt - us END), 0) > 0
            THEN round(CAST(sum(CASE WHEN nxt IS NOT NULL
                                     THEN cents * (nxt - us) END)
                            AS DOUBLE)
                       / sum(CASE WHEN nxt IS NOT NULL
                                  THEN nxt - us END) / 100, 6)
       END AS twap
FROM s GROUP BY user_id ORDER BY user_id""",
        "lang_source_chisq": """
WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
           FROM documents GROUP BY 1, 2),
rm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rm FROM c GROUP BY 1),
cm AS (SELECT source, CAST(sum(o) AS BIGINT) AS cm FROM c GROUP BY 1),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
p AS (SELECT
  CAST(round((c.o - rm.rm * cm.cm / CAST(nn.n AS DOUBLE))
             * (c.o - rm.rm * cm.cm / CAST(nn.n AS DOUBLE))
             / (rm.rm * cm.cm / CAST(nn.n AS DOUBLE)), 9)
       AS DECIMAL(38, 9)) AS t,
  CAST(round(rm.rm * cm.cm / CAST(nn.n AS DOUBLE), 9)
       AS DECIMAL(38, 9)) AS e
  FROM c JOIN rm ON c.lang = rm.lang
  JOIN cm ON c.source = cm.source, nn),
dims AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS nr,
                CAST(count(DISTINCT source) AS BIGINT) AS nc FROM c)
SELECT nn.n AS n, dims.nr AS n_langs, dims.nc AS n_sources,
       CAST((dims.nr - 1) * (dims.nc - 1) AS BIGINT) AS dof,
       CAST(round(sum(p.t) + (nn.n - sum(p.e)), 6) AS DOUBLE) AS chi2
FROM p, nn, dims GROUP BY nn.n, dims.nr, dims.nc""",
        "clustering_agreement": f"""
WITH kac AS MATERIALIZED (
  SELECT vec_id AS id, cluster AS a FROM ({_sql_kmeans(8, 2)})),
kbc AS MATERIALIZED (
  SELECT vec_id AS id, cluster AS b
  FROM ({_sql_snn(SNN_K, SNN_KT, 10)})),
jj AS MATERIALIZED (
  SELECT kac.id, a, b FROM kac JOIN kbc ON kac.id = kbc.id),
ct AS (SELECT a, b, CAST(count(*) AS BIGINT) AS m FROM jj GROUP BY 1, 2),
am AS (SELECT a, CAST(count(*) AS BIGINT) AS c FROM jj GROUP BY 1),
bm AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM jj GROUP BY 1),
s AS (SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM jj) AS n,
  (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0) AS BIGINT) FROM am)
    AS pairs_a,
  (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0) AS BIGINT) FROM bm)
    AS pairs_b,
  (SELECT CAST(COALESCE(sum(m * (m - 1) // 2), 0) AS BIGINT) FROM ct)
    AS pairs_both)
SELECT n, pairs_a, pairs_b, pairs_both,
       CAST(n * (n - 1) // 2 AS BIGINT) AS pairs_total,
       round(CAST(n * (n - 1) // 2 + 2 * pairs_both - pairs_a - pairs_b
                  AS DOUBLE) / (n * (n - 1) // 2), 6) AS rand_index
FROM s""",
        "latency_variance": """
WITH g AS (SELECT l.l_suppkey,
                  CAST(CAST(l.l_shipdate AS DATE)
                       - CAST(o.o_orderdate AS DATE) AS BIGINT) AS d
           FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey),
a AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS s,
             CAST(sum(d * d) AS BIGINT) AS ss
      FROM g GROUP BY l_suppkey)
SELECT l_suppkey, n,
       round(CAST(s AS DOUBLE) / n, 6) AS mean_days,
       CASE WHEN n > 1
            THEN round(CAST(n * ss - s * s AS DOUBLE)
                       / (n * (n - 1)), 6) END AS var_days
FROM a ORDER BY l_suppkey""",
        "repeat_customer_revenue": """
WITH per AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                    CAST(sum(CAST(round(o_totalprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM orders GROUP BY o_custkey)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST(sum(CASE WHEN n_orders >= 2 THEN cents ELSE 0 END)
            AS BIGINT) AS repeat_revenue_cents,
       round(CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS repeat_frac,
       round(CAST(sum(CASE WHEN n_orders >= 2 THEN cents ELSE 0 END)
                  AS DOUBLE) / sum(cents), 6) AS repeat_revenue_share
FROM per""",
        "dormant_balance_gap": """
WITH recent AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01'),
seg AS (SELECT CASE WHEN r.c_custkey IS NOT NULL
                    THEN 'active' ELSE 'dormant' END AS segment,
               CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS cents
        FROM customer c LEFT JOIN recent r
          ON c.c_custkey = r.c_custkey),
rk AS (SELECT segment, cents,
              row_number() OVER (PARTITION BY segment
                                 ORDER BY cents, segment) AS rn
       FROM seg),
np AS (SELECT segment, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(cents) AS BIGINT) AS s
       FROM seg GROUP BY segment),
md AS (SELECT rk.segment, rk.cents AS median_cents
       FROM rk JOIN np ON rk.segment = np.segment
       WHERE rk.rn = (np.n + 1) // 2)
SELECT np.segment, np.n,
       round(CAST(np.s AS DOUBLE) / np.n / 100, 6) AS mean_balance,
       round(CAST(md.median_cents AS DOUBLE) / 100, 6) AS median_balance
FROM np JOIN md ON np.segment = md.segment ORDER BY np.segment""",
        "length_qq_table": """
WITH a AS (SELECT n_chars AS v,
                  row_number() OVER (ORDER BY n_chars) AS rn
           FROM documents WHERE source = 'src0'),
b AS (SELECT n_chars AS v,
             row_number() OVER (ORDER BY n_chars) AS rn
      FROM documents WHERE source = 'src1'),
na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM a),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
q AS (SELECT CAST(range AS INT) AS decile FROM range(0, 11))
SELECT q.decile, a.v AS len_src0, b.v AS len_src1
FROM q
JOIN na ON true JOIN nb ON true
JOIN a ON a.rn = (q.decile * (na.n - 1)) // 10 + 1
JOIN b ON b.rn = (q.decile * (nb.n - 1)) // 10 + 1
ORDER BY q.decile""",
        "missing_days": """
WITH days AS (SELECT DISTINCT CAST(CAST(o_orderdate AS DATE)
                                   - DATE '1970-01-01' AS BIGINT) AS d
              FROM orders),
g AS (SELECT d, lead(d) OVER (ORDER BY d) - d - 1 AS gap FROM days)
SELECT CAST(max(d) - min(d) + 1 AS BIGINT) AS span_days,
       CAST(count(*) AS BIGINT) AS days_with_orders,
       CAST(max(d) - min(d) + 1 - count(*) AS BIGINT) AS missing_days,
       CAST(COALESCE(max(gap), 0) AS BIGINT) AS longest_gap_days
FROM g""",
        "customer_streaks": """
WITH days AS (SELECT DISTINCT o_custkey,
                     CAST(CAST(o_orderdate AS DATE)
                          - DATE '1970-01-01' AS BIGINT) AS d
              FROM orders),
isl AS (SELECT o_custkey, d,
               d - row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY d) AS isl
        FROM days),
runs AS (SELECT o_custkey, isl, CAST(count(*) AS BIGINT) AS run
         FROM isl GROUP BY o_custkey, isl)
SELECT o_custkey, CAST(sum(run) AS BIGINT) AS n_active_days,
       CAST(max(run) AS BIGINT) AS max_streak_days,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY o_custkey ORDER BY o_custkey""",
        "strength_core": _sql_strength_core(SCORE_THRESHOLDS, 10),
        "casing_profile": """
WITH per AS (SELECT source,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS w,
  CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+'),
       x -> regexp_matches(x, '^[a-z]+$'))) AS BIGINT) AS lo,
  CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+'),
       x -> regexp_matches(x, '^[A-Z][a-z]+$'))) AS BIGINT) AS ti,
  CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+'),
       x -> regexp_matches(x, '^[A-Z]{2,}$'))) AS BIGINT) AS up
  FROM documents),
a AS (SELECT source, CAST(sum(w) AS BIGINT) AS n_words,
             CAST(sum(lo) AS BIGINT) AS n_lower,
             CAST(sum(ti) AS BIGINT) AS n_title,
             CAST(sum(up) AS BIGINT) AS n_allcaps
      FROM per GROUP BY source)
SELECT source, n_words, n_lower, n_title, n_allcaps,
       round(CAST(n_lower AS DOUBLE) / n_words, 6) AS lower_frac,
       round(CAST(n_title AS DOUBLE) / n_words, 6) AS title_frac,
       round(CAST(n_allcaps AS DOUBLE) / n_words, 6) AS allcaps_frac
FROM a ORDER BY source""",
        "kmv_jaccard": _sql_kmv_jaccard(KMV_K),
        "stickiness": """
WITH du AS (SELECT DISTINCT CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                                 AS BIGINT) AS d, user_id
            FROM events),
dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d),
days AS (SELECT DISTINCT d FROM du),
wau AS (SELECT days.d, CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
        FROM days JOIN du ON du.d <= days.d AND du.d >= days.d - 6
        GROUP BY days.d)
SELECT dau.d AS day_i, dau.dau, wau.wau,
       round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
FROM dau JOIN wau ON dau.d = wau.d ORDER BY day_i""",
        "attribution_comparison": """
WITH conv AS (SELECT event_id AS conversion_id, user_id,
                     epoch_us(ts) AS cts
              FROM events WHERE event_type = 'purchase'),
touch AS (SELECT user_id, event_id AS touch_id, epoch_us(ts) AS tts
          FROM events WHERE event_type IN ('view', 'click')),
j AS (SELECT c.conversion_id, t.touch_id, t.tts
      FROM conv c JOIN touch t
        ON c.user_id = t.user_id AND t.tts <= c.cts),
p AS (SELECT DISTINCT conversion_id,
        first_value(touch_id) OVER (PARTITION BY conversion_id
          ORDER BY tts ASC, touch_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          AS first_touch,
        first_value(touch_id) OVER (PARTITION BY conversion_id
          ORDER BY tts DESC, touch_id DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          AS last_touch
      FROM j)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM conv) AS n_conversions,
       CAST(count(*) AS BIGINT) AS with_touch,
       CAST(sum(CASE WHEN first_touch = last_touch THEN 1 ELSE 0 END)
            AS BIGINT) AS same_touch,
       round(CAST(sum(CASE WHEN first_touch = last_touch
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS same_frac
FROM p""",
        "revenue_lorenz": """
WITH per AS (SELECT o_custkey,
                    CAST(sum(CAST(round(o_totalprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM orders GROUP BY o_custkey),
t AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n FROM per),
rk AS (SELECT row_number() OVER (ORDER BY cents ASC, o_custkey ASC)
                AS rn,
              sum(cents) OVER (ORDER BY cents ASC, o_custkey ASC
                               ROWS UNBOUNDED PRECEDING) AS cum
       FROM per),
q AS (SELECT CAST(range AS INT) AS decile FROM range(1, 11))
SELECT q.decile,
       round(CAST(rk.cum AS DOUBLE) / t.total, 6) AS cum_share
FROM q, t JOIN rk ON rk.rn = (q.decile * (t.n - 1)) // 10 + 1
ORDER BY q.decile""",
        "hourly_conversion": """
WITH per AS (SELECT CAST(hour(ts) AS INTEGER) AS hour,
  CAST(sum(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
       AS BIGINT) AS n_touches,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_purchases
  FROM events GROUP BY 1)
SELECT hour, n_touches, n_purchases,
       CASE WHEN n_touches > 0
            THEN round(CAST(n_purchases AS DOUBLE) / n_touches, 6)
       END AS conversion
FROM per ORDER BY hour""",
        "single_source_parts": """
WITH per AS (SELECT l_partkey,
                    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM lineitem GROUP BY l_partkey)
SELECT CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_source,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST(sum(CASE WHEN n_supp = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS at_risk_cents,
       round(CAST(sum(CASE WHEN n_supp = 1 THEN cents ELSE 0 END)
                  AS DOUBLE) / sum(cents), 6) AS at_risk_share
FROM per""",
        "customer_value_drift": """
WITH base AS (SELECT o_custkey,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT)
                       AS cents,
                     CAST(o_orderdate AS DATE) AS od, o_orderkey
              FROM orders),
per AS (SELECT DISTINCT o_custkey,
          first_value(cents) OVER (PARTITION BY o_custkey
            ORDER BY od ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS first_c,
          first_value(cents) OVER (PARTITION BY o_custkey
            ORDER BY od DESC, o_orderkey DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS last_c,
          count(*) OVER (PARTITION BY o_custkey) AS n
        FROM base)
SELECT CAST(count(*) AS BIGINT) AS n_multi_customers,
       CAST(sum(CASE WHEN last_c > first_c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_growing,
       CAST(sum(CASE WHEN last_c < first_c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shrinking,
       CAST(sum(last_c - first_c) AS BIGINT) AS drift_cents_sum,
       round(CAST(sum(last_c - first_c) AS DOUBLE) / count(*) / 100, 6)
         AS mean_drift
FROM per WHERE n >= 2""",
        "supplier_percentile": """
WITH per AS (SELECT l_suppkey,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM lineitem GROUP BY l_suppkey)
SELECT p.l_suppkey AS s_suppkey, s.s_nationkey, p.cents,
       round(percent_rank() OVER (PARTITION BY s.s_nationkey
                                  ORDER BY p.cents ASC,
                                           p.l_suppkey ASC), 6)
         AS pct_rank
FROM per p JOIN supplier s ON p.l_suppkey = s.s_suppkey
ORDER BY s_suppkey""",
        "gini_mean_difference": """
WITH v AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
                  o_orderkey
           FROM orders),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
rk AS (SELECT c, row_number() OVER (ORDER BY c ASC, o_orderkey ASC)
                AS i
       FROM v),
a AS (SELECT CAST(sum(c * (2 * i - nn.n - 1)) AS BIGINT) AS pairsum,
             CAST(sum(c) AS BIGINT) AS total, nn.n
      FROM rk, nn GROUP BY nn.n)
SELECT n AS n_orders, pairsum, total,
       round(CAST(2 * pairsum AS DOUBLE) / (n * (n - 1.0)) / 100, 6)
         AS gmd,
       round(CAST(2 * pairsum AS DOUBLE) / (n - 1.0) / total, 6)
         AS relative_gmd
FROM a""",
        "dup_order_audit": """
WITH g AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                  CAST(count(*) AS BIGINT) AS c
           FROM orders GROUP BY 1, 2, 3)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_groups,
       CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
         AS n_dup_orders
FROM g""",
        "triangle_participation": SQL_GRAPH_PREFIX + """,
tp AS MATERIALIZED (
  SELECT a.src AS x, a.dst AS y, b.dst AS z
  FROM canon a JOIN canon b ON a.dst = b.src
  JOIN canon c ON c.src = a.src AND c.dst = b.dst),
tc AS (SELECT DISTINCT id FROM (
  SELECT x AS id FROM tp UNION ALL SELECT y FROM tp
  UNION ALL SELECT z FROM tp) u)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM verts) AS n_vertices,
       (SELECT CAST(count(*) AS BIGINT) FROM tc) AS n_in_triangle,
       (SELECT CAST(count(*) AS BIGINT) FROM tp) AS n_triangles,
       round(CAST((SELECT count(*) FROM tc) AS DOUBLE)
             / (SELECT count(*) FROM verts), 6) AS participation""",
        "supplier_rank_corr": """
WITH rev AS (SELECT l_suppkey AS s_suppkey,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM lineitem GROUP BY l_suppkey),
j AS (SELECT s.s_suppkey,
             CAST(round(s.s_acctbal * 100, 0) AS BIGINT) AS bal,
             rev.cents
      FROM supplier s JOIN rev ON s.s_suppkey = rev.s_suppkey),
rk AS (SELECT s_suppkey,
              row_number() OVER (ORDER BY bal ASC, s_suppkey ASC)
                AS ra,
              row_number() OVER (ORDER BY cents ASC, s_suppkey ASC)
                AS rb
       FROM j),
a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS d2
      FROM rk)
SELECT n AS n_suppliers, d2,
       round(1 - CAST(6 * d2 AS DOUBLE) / (n * (n * n - 1.0)), 6)
         AS spearman
FROM a""",
        # outer CTEs renamed (li3/canon3): the nested spectral chain
        # brings its own li/canon (binder quirk, see coarsen_stats)
        "algebraic_connectivity": f"""
WITH sc AS MATERIALIZED (
  SELECT id, CAST(round(f * 1000000, 0) AS BIGINT) AS xi
  FROM ({_sql_spectral(SPECTRAL_ROUNDS)})),
li3 AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey
                     FROM lineitem),
canon3 AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM li3 a JOIN li3 b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey),
s AS (SELECT
  (SELECT CAST(sum((u.xi - v.xi) * (u.xi - v.xi)) AS BIGINT)
   FROM canon3 c JOIN sc u ON c.src = u.id JOIN sc v ON c.dst = v.id)
    AS xlx_micro2,
  (SELECT CAST(sum(xi * xi) AS BIGINT) FROM sc) AS xx_micro2)
SELECT xlx_micro2, xx_micro2,
       round(CAST(xlx_micro2 AS DOUBLE) / xx_micro2, 6) AS lambda2_est
FROM s""",
        "bracket_balance": """
WITH per AS (SELECT source,
  CASE WHEN len(regexp_extract_all(text, '\\('))
            != len(regexp_extract_all(text, '\\)'))
       THEN 1 ELSE 0 END AS paren_bad,
  CASE WHEN len(regexp_extract_all(text, '"')) % 2 = 1
       THEN 1 ELSE 0 END AS quote_bad
  FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(paren_bad) AS BIGINT) AS n_unbalanced_paren,
       CAST(sum(quote_bad) AS BIGINT) AS n_odd_quotes,
       round(CAST(sum(paren_bad) + sum(quote_bad) AS DOUBLE)
             / count(*), 6) AS damage_rate
FROM per GROUP BY source ORDER BY source""",
        "ptype_revenue": """
WITH per AS (SELECT p.p_type, CAST(count(*) AS BIGINT) AS n_lines,
                    CAST(sum(CAST(round(l.l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             GROUP BY p.p_type),
t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per)
SELECT p_type, n_lines, cents AS revenue_cents,
       round(CAST(cents AS DOUBLE) / t.total, 6) AS share
FROM per, t ORDER BY p_type""",
        "tax_incidence": """
WITH per AS (SELECT CAST(round(l_tax * 100, 0) AS BIGINT) AS tax_pct,
                    CAST(count(*) AS BIGINT) AS n_lines,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS base_cents,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)
                             * CAST(round(l_tax * 100, 0) AS BIGINT))
                         AS BIGINT) AS collected_cpct
             FROM lineitem GROUP BY 1),
t AS (SELECT CAST(sum(collected_cpct) AS BIGINT) AS t FROM per)
SELECT tax_pct, n_lines, base_cents, collected_cpct,
       CASE WHEN t.t > 0
            THEN round(CAST(collected_cpct AS DOUBLE) / t.t, 6)
       END AS collection_share
FROM per, t ORDER BY tax_pct""",
        "lineitem_corr_matrix": """
WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS v_quantity, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v_extendedprice, CAST(round(l_discount * 100, 0) AS BIGINT) AS v_discount, CAST(round(l_tax * 100, 0) AS BIGINT) AS v_tax FROM lineitem),
m AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n,
  CAST(sum(v_quantity) AS HUGEINT) AS s_quantity,
  sum(CAST(v_quantity AS HUGEINT) * v_quantity) AS ss_quantity,
  CAST(sum(v_extendedprice) AS HUGEINT) AS s_extendedprice,
  sum(CAST(v_extendedprice AS HUGEINT) * v_extendedprice) AS ss_extendedprice,
  CAST(sum(v_discount) AS HUGEINT) AS s_discount,
  sum(CAST(v_discount AS HUGEINT) * v_discount) AS ss_discount,
  CAST(sum(v_tax) AS HUGEINT) AS s_tax,
  sum(CAST(v_tax AS HUGEINT) * v_tax) AS ss_tax,
  sum(CAST(v_quantity AS HUGEINT) * v_extendedprice) AS sp_quantity_extendedprice,
  sum(CAST(v_quantity AS HUGEINT) * v_discount) AS sp_quantity_discount,
  sum(CAST(v_quantity AS HUGEINT) * v_tax) AS sp_quantity_tax,
  sum(CAST(v_extendedprice AS HUGEINT) * v_discount) AS sp_extendedprice_discount,
  sum(CAST(v_extendedprice AS HUGEINT) * v_tax) AS sp_extendedprice_tax,
  sum(CAST(v_discount AS HUGEINT) * v_tax) AS sp_discount_tax FROM v)
SELECT 'quantity' AS col_a, 'extendedprice' AS col_b,
  round(CAST(n * sp_quantity_extendedprice - s_quantity * s_extendedprice AS DOUBLE)
        / sqrt(CAST(n * ss_quantity - s_quantity * s_quantity AS DOUBLE)
               * CAST(n * ss_extendedprice - s_extendedprice * s_extendedprice AS DOUBLE)), 6)
    AS pearson FROM m
UNION ALL
SELECT 'quantity' AS col_a, 'discount' AS col_b,
  round(CAST(n * sp_quantity_discount - s_quantity * s_discount AS DOUBLE)
        / sqrt(CAST(n * ss_quantity - s_quantity * s_quantity AS DOUBLE)
               * CAST(n * ss_discount - s_discount * s_discount AS DOUBLE)), 6)
    AS pearson FROM m
UNION ALL
SELECT 'quantity' AS col_a, 'tax' AS col_b,
  round(CAST(n * sp_quantity_tax - s_quantity * s_tax AS DOUBLE)
        / sqrt(CAST(n * ss_quantity - s_quantity * s_quantity AS DOUBLE)
               * CAST(n * ss_tax - s_tax * s_tax AS DOUBLE)), 6)
    AS pearson FROM m
UNION ALL
SELECT 'extendedprice' AS col_a, 'discount' AS col_b,
  round(CAST(n * sp_extendedprice_discount - s_extendedprice * s_discount AS DOUBLE)
        / sqrt(CAST(n * ss_extendedprice - s_extendedprice * s_extendedprice AS DOUBLE)
               * CAST(n * ss_discount - s_discount * s_discount AS DOUBLE)), 6)
    AS pearson FROM m
UNION ALL
SELECT 'extendedprice' AS col_a, 'tax' AS col_b,
  round(CAST(n * sp_extendedprice_tax - s_extendedprice * s_tax AS DOUBLE)
        / sqrt(CAST(n * ss_extendedprice - s_extendedprice * s_extendedprice AS DOUBLE)
               * CAST(n * ss_tax - s_tax * s_tax AS DOUBLE)), 6)
    AS pearson FROM m
UNION ALL
SELECT 'discount' AS col_a, 'tax' AS col_b,
  round(CAST(n * sp_discount_tax - s_discount * s_tax AS DOUBLE)
        / sqrt(CAST(n * ss_discount - s_discount * s_discount AS DOUBLE)
               * CAST(n * ss_tax - s_tax * s_tax AS DOUBLE)), 6)
    AS pearson FROM m""",
        "monthly_profile": """
WITH per AS (SELECT CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER)
                      AS month,
                    CAST(count(*) AS BIGINT) AS n_orders,
                    CAST(sum(CAST(round(o_totalprice * 100, 0)
                                  AS BIGINT)) AS BIGINT)
                      AS revenue_cents
             FROM orders GROUP BY 1),
t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS no,
             CAST(sum(revenue_cents) AS BIGINT) AS rc FROM per)
SELECT month, n_orders, revenue_cents,
       round(CAST(n_orders AS DOUBLE) / t.no, 6) AS order_share,
       round(CAST(revenue_cents AS DOUBLE) / t.rc, 6) AS revenue_share
FROM per, t ORDER BY month""",
        "daily_error_rate": """
SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_i,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_errors,
       round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS error_rate
FROM events GROUP BY 1 ORDER BY day_i""",
        "coreness_degree_corr": f"""
WITH kc AS MATERIALIZED (
  SELECT id, coreness FROM ({_sql_kcore()})),
li4 AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey
                     FROM lineitem),
canon4 AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM li4 a JOIN li4 b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey),
dg4 AS MATERIALIZED (
  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT src AS id FROM canon4
    UNION ALL SELECT dst AS id FROM canon4) z GROUP BY id),
jj AS (SELECT kc.id, kc.coreness, dg4.deg
       FROM kc JOIN dg4 ON kc.id = dg4.id),
rk AS (SELECT id,
              row_number() OVER (ORDER BY coreness ASC, id ASC) AS ra,
              row_number() OVER (ORDER BY deg ASC, id ASC) AS rb
       FROM jj),
a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS d2
      FROM rk)
SELECT n AS n_vertices, d2,
       round(1 - CAST(6 * d2 AS DOUBLE) / (n * (n * n - 1.0)), 6)
         AS spearman
FROM a""",
        "circuit_rank": _sql_wcc(WCC_SQL_ITERS).replace(
            "SELECT id, lab AS component FROM l"
            + str(WCC_SQL_ITERS) + " ORDER BY id",
            f"""SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM canon) AS n_edges,
  (SELECT CAST(count(*) AS BIGINT) FROM l{WCC_SQL_ITERS})
    AS n_vertices,
  (SELECT CAST(count(DISTINCT lab) AS BIGINT) FROM l{WCC_SQL_ITERS})
    AS n_components,
  CAST((SELECT count(*) FROM canon)
       - (SELECT count(*) FROM l{WCC_SQL_ITERS})
       + (SELECT count(DISTINCT lab) FROM l{WCC_SQL_ITERS}) AS BIGINT)
    AS circuit_rank"""),
        "token_length_profile": """
WITH t AS (SELECT source,
                  unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                    AS tk
           FROM documents),
per AS (SELECT source, CAST(length(tk) AS BIGINT) AS l FROM t)
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(l) AS BIGINT) AS total_chars,
       CAST(max(l) AS BIGINT) AS max_len,
       CAST(sum(CASE WHEN l > 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_long,
       round(CAST(sum(l) AS DOUBLE) / count(*), 6) AS mean_len,
       round(CAST(sum(CASE WHEN l > 10 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS long_frac
FROM per GROUP BY source ORDER BY source""",
        "linenumber_audit": """
WITH per AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n,
                    CAST(count(DISTINCT l_linenumber) AS BIGINT) AS nd,
                    CAST(max(l_linenumber) AS BIGINT) AS mx,
                    CAST(min(l_linenumber) AS BIGINT) AS mn
             FROM lineitem GROUP BY l_orderkey)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN mx != n OR nd != n OR mn != 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       round(CAST(sum(CASE WHEN mx != n OR nd != n OR mn != 1
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS violation_rate
FROM per""",
        "supplier_brand_focus": """
WITH per AS (SELECT l.l_suppkey, p.p_brand,
                    CAST(count(*) AS BIGINT) AS c
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             GROUP BY l.l_suppkey, p.p_brand)
SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_brands,
       CAST(sum(c) AS BIGINT) AS n_lines,
       round(CAST(sum(c * c) AS DOUBLE) / (sum(c) * sum(c)), 6) AS hhi
FROM per GROUP BY l_suppkey ORDER BY l_suppkey""",
        "nation_arpu": """
WITH rev AS (SELECT o_custkey,
                    CAST(sum(CAST(round(o_totalprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS cents
             FROM orders GROUP BY o_custkey),
per AS (SELECT c.c_nationkey,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(COALESCE(rev.cents, 0)) AS BIGINT)
                 AS revenue_cents
        FROM customer c LEFT JOIN rev ON c.c_custkey = rev.o_custkey
        GROUP BY c.c_nationkey)
SELECT per.c_nationkey AS nationkey, n.n_name, per.n_customers,
       per.revenue_cents,
       round(CAST(per.revenue_cents AS DOUBLE) / per.n_customers / 100,
             6) AS arpu
FROM per JOIN nation n ON per.c_nationkey = n.n_nationkey
ORDER BY nationkey""",
        "first_day_conversion": """
WITH days AS (SELECT user_id,
                     CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                          AS BIGINT) AS d,
                     event_type = 'purchase' AS p
              FROM events),
f AS (SELECT user_id, CAST(min(d) AS BIGINT) AS fd
      FROM days GROUP BY user_id),
conv AS (SELECT DISTINCT days.user_id
         FROM days JOIN f ON days.user_id = f.user_id
         WHERE days.p AND days.d = f.fd)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM f) AS n_users,
       (SELECT CAST(count(*) AS BIGINT) FROM conv)
         AS n_first_day_converts,
       round(CAST((SELECT count(*) FROM conv) AS DOUBLE)
             / (SELECT count(*) FROM f), 6) AS first_day_conversion""",
    }
