"""Deterministic sampling / splitting for training-data pipelines.

The two operations every corpus-preparation job needs downstream of dedup
and quality filtering:

- stratified_sample: per-stratum hash-gated downsampling (e.g. keep 100%
  of code, 50% of English, 25% of everything else) — the mix-rebalancing
  step of dataset curation.
- hash_split: disjoint train/val/test assignment.

Both are pure projections/filters over the PORTABLE md5 hash family
(functions/text.portable_h1) of (salt || id): no RNG state, no shuffle, no
driver involvement — every executor decides each row locally, the same row
always lands in the same bucket under ANY partitioning or re-run (the
property `.sample()` does NOT give you across retries/speculation), and a
DuckDB oracle reproduces the exact kept set. Scale shape: a narrow
whole-stage-codegen filter — zero exchanges at 100 TB.

The gate compares ``pmod(h1(salt || id), 1_000_000) < fraction * 1e6``;
fractions are exact to 1e-6, which is the resolution any practical corpus
quota needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from plato_spark.functions.text import portable_h1

GATE_MOD = 1_000_000


def _gate(id_col: Column, salt: str) -> Column:
    """Uniform-ish integer in [0, GATE_MOD) from the portable hash."""
    return F.pmod(portable_h1(F.concat(F.lit(salt), id_col.cast("string"))),
                  F.lit(GATE_MOD))


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    fractions: dict[str, float] | None = None,
    default_fraction: float = 0.25,
    id_col: str = "doc_id",
    salt: str = "strat1",
) -> DataFrame:
    """Rows whose hash gate falls under their stratum's keep-fraction.

    fractions: {stratum_value: keep_fraction}; strata not listed use
    default_fraction. Deterministic: same (salt, id) -> same decision.
    """
    fractions = fractions or {}
    thresh: Column = F.lit(int(round(default_fraction * GATE_MOD)))
    for val, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(val), F.lit(int(round(frac * GATE_MOD)))
        ).otherwise(thresh)
    return df.where(_gate(F.col(id_col), salt) < thresh)


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split1",
) -> DataFrame:
    """df + a ``split`` column: disjoint deterministic train/val/test.

    weights must sum to ~1; rows are assigned by cumulative gate ranges in
    the given dict order (insertion-ordered), so {"train": .9, "val": .05,
    "test": .05} maps gate [0, .9e6) -> train, [.9e6, .95e6) -> val, rest
    -> test (the last split absorbs rounding).
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(weights)
    gate = _gate(F.col(id_col), salt)
    expr: Column = F.lit(names[-1])
    cum = 0.0
    conds = []
    for name in names[:-1]:
        cum += weights[name]
        conds.append((int(round(cum * GATE_MOD)), name))
    for bound, name in reversed(conds):
        expr = F.when(gate < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def negative_edge_sampling(
    edges_sym: DataFrame, k: int = 5, attempts: int = 16
) -> DataFrame:
    """(id, neg, attempt) — up to ``k`` deterministic NON-neighbors per
    vertex, the negative-sampling step that pairs with
    algos/neighbor_sample to feed link-prediction / GNN training (one
    positive fan-out, one negative fan-out, both reproducible).

    Candidate i for vertex u is h1('neg:u:i') mod (max_id + 1) — the
    portable md5 family, so the exact sample is SQL-oracle-checkable;
    candidates are kept in attempt order when they (a) differ from u,
    (b) are real vertices (arbitrary id spaces — no dense-rank
    assumption), and (c) are NOT current neighbors.  Constant fan-out
    ``attempts`` per vertex, one anti-join against the edge table, a
    per-vertex window over <= attempts rows — no RNG state, no shuffle
    beyond the joins, identical under re-runs and speculation.
    """
    verts = edges_sym.select(F.col("src").alias("id")).distinct()
    max_id = verts.agg(F.max("id").alias("m")).collect()[0]["m"]
    cand = verts.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.lit(attempts - 1))
        ).alias("attempt"),
    ).select(
        "id", "attempt",
        F.pmod(
            portable_h1(
                F.concat_ws(":", F.lit("neg"), F.col("id").cast("string"),
                            F.col("attempt").cast("string"))
            ),
            F.lit(int(max_id) + 1),
        ).alias("neg"),
    ).where(F.col("neg") != F.col("id"))
    cand = cand.join(
        verts.withColumnRenamed("id", "neg"), "neg", "left_semi"
    ).join(
        edges_sym.select(F.col("src").alias("id"), F.col("dst").alias("neg")),
        ["id", "neg"], "left_anti",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("attempt")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("id", "neg", "attempt")
    )


def sinkhorn_mixing_weights(
    df: DataFrame,
    row_col: str = "source",
    col_col: str = "lang",
    iterations: int = 5,
) -> DataFrame:
    """(source, lang, n_docs, weight) — Sinkhorn-Knopp matrix scaling of
    the (row_col x col_col) document-count matrix toward PROBABILITY
    marginals (each row sums to 1/|rows|, each column to 1/|cols| —
    consistent for any matrix shape, unlike all-ones marginals which
    require a square matrix): weight = cnt * u_row * v_col after
    ``iterations`` alternating row/col normalizations.

    The training-blend balancing step: raw (source, lang) counts are
    wildly uneven; sampling documents with probability proportional to
    the scaled weight draws a blend where every source and every
    language contributes ~equal mass, without hand-tuned per-cell
    knobs.  (Sinkhorn & Knopp 1967; the OT/IPF workhorse.)

    Plan: the count matrix is one groupBy over the corpus (the only
    data-sized shuffle); u and v live at |rows| / |cols| cardinality and
    each iteration is two tiny equi-join + agg rounds, checkpointed so
    the plan stays flat.  Multiplications mirror the oracle's exact
    form (cnt * u * v, left-assoc); one 6dp round at read-out.
    """
    from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

    m = (
        df.groupBy(F.col(row_col).alias("r"), F.col(col_col).alias("c"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .transform(cheap_localCheckpoint)
    )
    # marginal targets: two bounded scalars (|rows|, |cols|) — the same
    # driver-action budget as any convergence check
    n_rows = m.select("r").distinct().count()
    n_cols = m.select("c").distinct().count()
    row_t = F.lit(1.0) / F.lit(float(n_rows))
    col_t = F.lit(1.0) / F.lit(float(n_cols))
    v = m.select("c").distinct().withColumn("v", F.lit(1.0))
    u = None
    for _ in range(iterations):
        u = (
            m.join(v, "c")
            .groupBy("r")
            .agg((row_t / F.sum(F.col("cnt") * F.col("v"))).alias("u"))
            .transform(cheap_localCheckpoint)
        )
        v = (
            m.join(u, "r")
            .groupBy("c")
            .agg((col_t / F.sum(F.col("cnt") * F.col("u"))).alias("v"))
            .transform(cheap_localCheckpoint)
        )
    return (
        m.join(u, "r")
        .join(v, "c")
        .select(
            F.col("r").alias(row_col),
            F.col("c").alias(col_col),
            F.col("cnt").alias("n_docs"),
            F.round(F.col("cnt") * F.col("u") * F.col("v"), 6).alias("weight"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int = 32,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    salt: str = "wsample",
) -> DataFrame:
    """(id, weight, priority) — deterministic weight-proportional sample
    without replacement: the k rows with the smallest
    portable_h1(salt|id) / weight.  This is Efraimidis–Spirakis A-ES
    with the uniform draw replaced by the portable 56-bit hash (fixed
    granularity, reproducible at any partitioning and in SQL): doubling
    a row's weight halves its key, doubling its selection odds — the
    importance-sampling primitive for eval-set construction.

    Zero/negative weights are excluded (a zero weight must never be
    sampled; guarding also keeps the one IEEE division defined).  Plan:
    one JVM hash + division per row, TakeOrderedAndProject under the
    (priority, id) total order — k rows per partition move, no global
    sort."""
    from plato_spark.functions.text import portable_h1

    h = portable_h1(F.concat(F.lit(salt + "|"),
                             F.col(id_col).cast("string")))
    scored = (
        df.where(F.col(weight_col) > 0)
        .select(
            F.col(id_col).alias("id"),
            F.col(weight_col).cast("long").alias("weight"),
            # raw IEEE division — identical operands on both engines;
            # a 6dp round at 1e13 magnitude would be a no-op anyway
            (h / F.col(weight_col).cast("double")).alias("priority"),
        )
    )
    return scored.orderBy(F.asc("priority"), F.asc("id")).limit(int(k))
