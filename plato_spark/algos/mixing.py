"""Categorical attribute mixing over a directed edge table.

Newman's mixing-matrix statistics (Mixing patterns in networks, PRE 67,
2003): given edges (src, dst) and a per-vertex categorical label, count
how often each (src_label, dst_label) pair occurs and fold the matrix to
the scalar assortativity coefficient

    r = (sum_i e_ii - sum_i a_i * b_i) / (1 - sum_i a_i * b_i)

where e_ij is the FRACTION of edges from label i to label j and a/b are
its row/column marginals.  This is the attribute sibling of the degree
assortativity already in ``plato_spark.graph.edges.degree_assortativity``
and uses the same vertex-payload join idiom as the reference's
payload-carrying modes (``/root/reference/plato/algo/cnc/mutual.hpp``:
per-edge joins against vertex state) — re-expressed as two key-partitioned
equi-joins plus a tiny groupBy.

Exact-arithmetic form used here (all BIGINT until one final division):
with M = |edges|, trace = number of same-label edges, and
S = sum_i rowsum_i * colsum_i,

    r = (M * trace - S) / (M^2 - S)

which is Newman's formula with every term multiplied by M^2 — so both
engines fold integers and disagree on nothing before the single rounded
IEEE division.  When M^2 == S the coefficient is undefined (all
endpoints share one label); we return NULL there rather than invent a
convention.

Scale: the label join is a standard per-vertex equi-join (shuffles on the
vertex key, co-partitioned with every other per-vertex stage); the mixing
matrix itself has |labels|^2 rows, so everything after the first groupBy
is driver-trivial.  Nothing here collects per-vertex data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_mixing_matrix(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per (src_label, dst_label) directed edge counts.

    ``edges``: (src, dst).  ``labels``: (id, label).  Edges whose
    endpoint is missing from ``labels`` are dropped (inner join), the
    same convention the payload modes use for absent vertex state.
    """
    lab = labels.toDF("id", "label")
    src_l = lab.select(F.col("id").alias("src"), F.col("label").alias("src_label"))
    dst_l = lab.select(F.col("id").alias("dst"), F.col("label").alias("dst_label"))
    return (
        edges.join(src_l, "src")
        .join(dst_l, "dst")
        .groupBy("src_label", "dst_label")
        .agg(F.count(F.lit(1)).cast("long").alias("edges"))
    )


def attribute_assortativity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """1-row Newman categorical assortativity: (m_edges, same_label,
    sum_rc, assortativity) with the exact-integer folding documented in
    the module docstring."""
    m = attribute_mixing_matrix(edges, labels)
    rows = m.groupBy(F.col("src_label").alias("label")).agg(
        F.sum("edges").cast("long").alias("r")
    )
    cols = m.groupBy(F.col("dst_label").alias("label")).agg(
        F.sum("edges").cast("long").alias("c")
    )
    # a label absent from one side contributes rowsum * 0 — inner join
    # drops exactly those zero terms.
    s = rows.join(cols, "label").agg(
        F.coalesce(F.sum(F.col("r") * F.col("c")), F.lit(0)).cast("long").alias("sum_rc")
    )
    tot = m.agg(
        F.coalesce(F.sum("edges"), F.lit(0)).cast("long").alias("m_edges"),
        F.coalesce(
            F.sum(F.when(F.col("src_label") == F.col("dst_label"), F.col("edges")).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("same_label"),
    )
    # two 1-row frames -> broadcast cross join (the engine's usual
    # scalar-combine idiom, cf. algos/modularity.py)
    out = tot.crossJoin(F.broadcast(s))
    denom = F.col("m_edges") * F.col("m_edges") - F.col("sum_rc")
    return out.select(
        "m_edges",
        "same_label",
        "sum_rc",
        F.when(
            denom != 0,
            F.round(
                (F.col("m_edges") * F.col("same_label") - F.col("sum_rc")).cast("double")
                / denom.cast("double"),
                6,
            ),
        ).alias("assortativity"),
    )


def label_consistency(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(id, label, nbr_total, nbr_same, consistency) — per-vertex
    neighborhood label agreement over the UNDIRECTED support of a
    directed edge table: of a vertex's labeled neighbors, what fraction
    share its label?  The weak-supervision QA pass: a doc whose
    citation neighborhood disagrees with its own lang tag is a likely
    mislabel (or genuinely cross-lingual) — triage before the label is
    trusted for training splits.  Also the per-vertex form of the
    attribute_assortativity scalar above.

    Exact integer counts + one rounded division per vertex.  Plan: one
    distinct on canonical support pairs, symmetrize, two vertex-payload
    label joins, one groupBy on the vertex key.  Vertices with zero
    labeled neighbors are absent (no fabricated denominators).
    """
    support = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    sym = support.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        support.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    lab = labels.toDF("id", "label")
    own = lab.select(F.col("id").alias("u"), F.col("label").alias("own"))
    nbr = lab.select(F.col("id").alias("v"), F.col("label").alias("nl"))
    per = (
        sym.join(own, "u")
        .join(nbr, "v")
        .groupBy(F.col("u").alias("id"), F.col("own").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("nbr_total"),
            F.sum(F.when(F.col("own") == F.col("nl"), 1).otherwise(0))
            .cast("long")
            .alias("nbr_same"),
        )
    )
    return per.select(
        "id",
        "label",
        "nbr_total",
        "nbr_same",
        F.round(
            F.col("nbr_same").cast("double") / F.col("nbr_total"), 6
        ).alias("consistency"),
    )


def attribute_conductance(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(label, cut_edges, volume, conductance) — per-class conductance
    phi(S) = cut(S) / min(vol(S), vol(V\\S)) over the symmetrized simple
    graph, one row per label class present among labeled-edge endpoints.

    The cut-quality audit beside the mixing matrix and the assortativity
    scalar: the mixing matrix counts the off-diagonal mass, conductance
    normalizes it by class volume, so a small class fully fenced in by
    cross edges (phi near 1) is visible even when the global off-diagonal
    fraction is tiny.  This is the same functional Spark's partition
    planner would want minimized per shuffle key — here measured on an
    ATTRIBUTE partition (e.g. language) to decide whether a per-class
    corpus split leaks neighborhood context.

    Conventions (mirrored verbatim in the oracle): edges are canonicalized
    to undirected distinct (least, greatest) pairs with self-loops
    dropped; an edge with an unlabeled endpoint is excluded from cut AND
    volume (the inner-join convention of attribute_mixing_matrix);
    vol(S) = sum of degrees of S's vertices over the KEPT edge set;
    conductance is the one rounded IEEE division over exact BIGINT folds,
    NULL when the complement volume is 0 (single-class graph) — cut and
    volume stay exact either way.

    Plan: one distinct, two key-partitioned label joins, one exploded
    groupBy per side (label-cardinality-sized outputs), a 1-row total
    broadcast-crossed — no shuffle larger than the edge canonicalization.
    """
    lab = labels.toDF("id", "label")
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    la = lab.select(F.col("id").alias("a"), F.col("label").alias("la"))
    lb = lab.select(F.col("id").alias("b"), F.col("label").alias("lb"))
    e = canon.join(la, "a").join(lb, "b")
    vol = (
        e.select(F.col("la").alias("label"))
        .unionAll(e.select(F.col("lb").alias("label")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("volume"))
    )
    mixed = e.where(F.col("la") != F.col("lb"))
    cut = (
        mixed.select(F.col("la").alias("label"))
        .unionAll(mixed.select(F.col("lb").alias("label")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("cut_edges"))
    )
    tot = e.agg((F.count(F.lit(1)) * 2).cast("long").alias("tot_vol"))
    out = vol.join(cut, "label", "left").crossJoin(F.broadcast(tot))
    cut_c = F.coalesce(F.col("cut_edges"), F.lit(0)).cast("long")
    den = F.least(F.col("volume"), F.col("tot_vol") - F.col("volume"))
    return out.select(
        "label",
        cut_c.alias("cut_edges"),
        "volume",
        F.when(den > 0, F.round(cut_c.cast("double") / den.cast("double"), 6)).alias(
            "conductance"
        ),
    )


def mixing_null_model(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(src_label, dst_label, observed, expected, lift) — the mixing
    matrix scored against its configuration-model/independence null:
    expected_ij = rowsum_i * colsum_j / M (what random wiring with the
    same per-label degree totals would produce), lift = observed /
    expected.  The audit that separates "languages cite each other
    because the graph is dense" from genuine entanglement — lift >> 1
    off-diagonal is real cross-label structure, lift ~ 1 is volume.

    The full |labels|^2 grid emits (a zero observed cell with large
    marginals is itself a finding); marginals come from the observed
    matrix, so every grid row has rowsum, colsum > 0 and both divisions
    are defined.  Exact BIGINT folds; expected and lift are each ONE
    rounded IEEE division of exact integers (lift's numerator
    pre-multiplied by M as an integer).  Everything after the mixing
    matrix's groupBy is |labels|^2-row arithmetic — driver-trivial."""
    m = attribute_mixing_matrix(edges, labels)
    rows = m.groupBy(F.col("src_label")).agg(
        F.sum("edges").cast("long").alias("r"))
    cols = m.groupBy(F.col("dst_label")).agg(
        F.sum("edges").cast("long").alias("c"))
    tot = m.agg(F.sum("edges").cast("long").alias("mm"))
    # both grid factors are |labels|-bounded — broadcast the right sides
    # so the grid is a local expansion, not a CartesianProduct shuffle
    grid = rows.crossJoin(F.broadcast(cols)).crossJoin(F.broadcast(tot))
    obs = grid.join(m, ["src_label", "dst_label"], "left").select(
        "src_label", "dst_label", "r", "c", "mm",
        F.coalesce("edges", F.lit(0)).cast("long").alias("observed"),
    )
    return obs.select(
        "src_label", "dst_label", "observed",
        F.round((F.col("r") * F.col("c")) / F.col("mm"), 6).alias("expected"),
        F.round((F.col("observed") * F.col("mm"))
                / (F.col("r") * F.col("c")), 6).alias("lift"),
    )
