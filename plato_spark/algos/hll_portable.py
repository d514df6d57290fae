"""Engine-portable HyperLogLog — SQL-oracle-checkable HLL graph sketches.

Reference semantics: /root/reference/plato/algo/hyperanf/hyperanf.hpp:83-195
(per-vertex HLL of the reachable set, merged along edges each superstep;
ANF curve + average distance) and
/root/reference/plato/algo/nstepdegrees/nstepdegrees.hpp:48-164 (n-hop ball
sizes). The reference hand-rolls HLL registers
(/root/reference/plato/util/hyperloglog.hpp:76-120); here the sketch is an
``array<int>`` of M=64 registers whose register index / rank values are
derived from the PORTABLE md5 hash family (functions/text.portable_h1), so
a DuckDB oracle can reproduce every register — and therefore every
estimate — bit-for-bit from the exact reachability ball:

  register(u, j) after t steps = max over {v in Ball_t(u), idx(v)=j} rho(v)

All per-superstep work is JVM-side: the union of two sketches is
``zip_with(greatest)``, the gather is a groupBy(dst) with one ``max`` per
register (map-side combined), and the estimate is an integer fold over
exact powers of two followed by ONE float division — no cross-row float
sums anywhere, so results are deterministic under any partitioning.

This is the validation-grade sketch (M=64, ~13% standard error). The
Datasketches variants in algos/hyperanf.py / algos/nstep.py (lg_k=12,
~1.6% error) remain the accuracy path at scale; both share the same plan
shape.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint

from plato_spark.functions.text import PORTABLE_H1_SQL, portable_h1
from plato_spark.graph.edges import symmetrize
from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)

M = 64              # registers (p = 6 index bits)
W_BITS = 50         # h1 is 56-bit; 56 - 6 index bits
RHO_MAX = W_BITS + 1
ALPHA = 0.709       # alpha_64 (Flajolet et al. 2007)
# raw = alpha*m^2 / sum_j 2^-M_j = ALPHA_NUM / S with the EXACT BIGINT
# denominator S = sum_j 2^(RHO_MAX - M_j) (empty register: 2^RHO_MAX)
ALPHA_NUM = ALPHA * M * M * float(1 << RHO_MAX)
LINEAR_BOUND = 2.5 * M
# linear-counting table: LC[v] = m * ln(m / v), v = number of zero registers
LC = [M * math.log(M / v) for v in range(1, M + 1)]
# POW[x] = 2^(RHO_MAX - x) for register value x in 0..RHO_MAX (exact longs)
POW = [1 << (RHO_MAX - x) for x in range(RHO_MAX + 1)]


def _idx_rho(id_col: Column) -> tuple[Column, Column]:
    """(register index, rank) of a vertex id — portable md5 derivation."""
    h = portable_h1(id_col.cast("string"))
    idx = F.pmod(h, F.lit(M)).cast("int")
    w = F.shiftright(h, 6)
    bl = F.length(F.conv(w, 10, 2))  # exact bit length via binary string
    rho = F.when(w == 0, F.lit(RHO_MAX)).otherwise(F.lit(RHO_MAX) - bl)
    return idx, rho.cast("int")


def _init_sketch(id_col: Column) -> Column:
    idx, rho = _idx_rho(id_col)
    seq = F.array(*[F.lit(i) for i in range(M)])
    return F.transform(seq, lambda j: F.when(j == idx, rho).otherwise(F.lit(0)))


def _estimate(sk: str | Column) -> Column:
    """HLL estimate with linear-counting small-range correction.

    Integer-exact denominator + one float division + literal LC table =>
    bit-identical in any engine that derives the same registers.
    """
    pow_arr = F.array(*[F.lit(p) for p in POW])
    s = F.aggregate(
        sk,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.element_at(pow_arr, x + 1),
    )
    v = F.size(F.filter(sk, lambda x: x == 0))
    raw = F.lit(ALPHA_NUM) / s.cast("double")
    lc_arr = F.array(*[F.lit(x) for x in LC])
    return F.when(
        (raw <= F.lit(LINEAR_BOUND)) & (v > 0), F.element_at(lc_arr, v)
    ).otherwise(raw)


def _merge_step(e: DataFrame, state: DataFrame) -> DataFrame:
    """One superstep: every vertex unions its in-neighbors' sketches."""
    gathered = e.join(
        state.select(F.col("id").alias("src"), "sk"), "src"
    )
    aggs = [F.max(F.element_at("sk", i + 1)).alias(f"r{i}") for i in range(M)]
    merged = (
        gathered.groupBy(F.col("dst").alias("id"))
        .agg(*aggs)
        .select("id", F.array(*[F.col(f"r{i}") for i in range(M)]).alias("nsk"))
    )
    return state.join(merged, "id", "left").select(
        "id",
        F.when(F.col("nsk").isNull(), F.col("sk"))
        .otherwise(F.zip_with("sk", "nsk", lambda a, b: F.greatest(a, b)))
        .alias("sk"),
    )


def _prepared(edges: DataFrame, direction: str):
    spark = edges.sparkSession
    if direction == "in":
        e0 = edges.select("src", "dst")
    elif direction == "out":
        # propagate sketches backwards to collect the OUT-ball
        e0 = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        e0 = symmetrize(edges.select("src", "dst"))
    else:
        raise ValueError(direction)
    e0 = e0.persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_e)
    e = e0.repartition(shuffle_n, "src").persist()
    e.count()
    e0.unpersist()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(shuffle_n, "id")
    )
    state = verts.select("id", _init_sketch(F.col("id")).alias("sk")).persist()
    state.count()
    return spark, e, state, shuffle_n


def nstep_degrees_portable(
    edges: DataFrame, steps: int = 2, direction: str = "out"
) -> DataFrame:
    """(id, nstep_degree: double) — n-hop ball size estimate, self excluded.

    Value-checkable: the DuckDB oracle materializes the exact ball and
    reproduces every register from the portable hash family.
    """
    spark, e, state, shuffle_n = _prepared(edges, direction)
    with scoped_shuffle_partitions(spark, shuffle_n):
        prev = state
        for _ in range(steps):
            state = _merge_step(e, state).transform(cheap_localCheckpoint)
            try:
                prev.unpersist()
            except Exception:
                pass
            prev = state
    return state.select(
        "id", F.round(_estimate("sk") - 1.0, 4).alias("nstep_degree")
    )


def _anf_curve_scaled(
    edges: DataFrame, steps: int, direction: str
) -> tuple:
    """Integer-scaled ANF curve [sc_0..sc_steps] (sum over vertices of
    round(round(est,4)*10000) — deterministic, no float-sum ordering)."""
    spark, e, state, shuffle_n = _prepared(edges, direction)
    scaled = F.sum(
        F.round(F.round(_estimate("sk"), 4) * 10000.0, 0).cast("long")
    ).alias("s")

    def anf_scaled(st: DataFrame) -> int:
        return int(st.agg(scaled).collect()[0][0])

    curve = [anf_scaled(state)]
    with scoped_shuffle_partitions(spark, shuffle_n):
        prev = state
        for _ in range(steps):
            state = _merge_step(e, state).transform(cheap_localCheckpoint)
            curve.append(anf_scaled(state))
            try:
                prev.unpersist()
            except Exception:
                pass
            prev = state
    return spark, curve


def effective_diameter_portable(
    edges: DataFrame, steps: int = 4, q: float = 0.9, direction: str = "both"
) -> DataFrame:
    """One row (eff_diameter, avg_distance) — the classic HyperANF
    read-outs (Boldi-Rosa-Vigna): effective diameter at quantile ``q`` by
    linear interpolation of the neighbourhood function,
        ed = (t-1) + (q*ANF_S - ANF_{t-1}) / (ANF_t - ANF_{t-1})
    at the first t whose ANF reaches q*ANF_S (0 when ANF_0 already does),
    and the reference's average distance (hyperanf.hpp:61-70).

    All comparisons and the interpolation run in the integer-scaled curve
    domain (identical doubles both engines), so the result is
    value-checkable against the DuckDB mirror to 6dp.
    """
    spark, curve = _anf_curve_scaled(edges, steps, direction)
    target = q * float(curve[-1])
    ed = 0.0
    for t in range(len(curve)):
        if float(curve[t]) >= target:
            if t > 0:
                ed = (t - 1) + (target - float(curve[t - 1])) / (
                    float(curve[t]) - float(curve[t - 1])
                )
            break
    den = curve[-1] - curve[0]
    num = sum(i * (curve[i] - curve[i - 1]) for i in range(1, len(curve)))
    avg = (float(num) / float(den)) if den > 0 else 0.0
    # round via F.round (half-up, matching SQL round) — python's round()
    # is half-to-even and could diverge on exact .5 boundaries
    return spark.createDataFrame(
        [(ed, avg)], "eff_diameter double, avg_distance double"
    ).select(
        F.round("eff_diameter", 6).alias("eff_diameter"),
        F.round("avg_distance", 6).alias("avg_distance"),
    )


def hyperanf_portable(
    edges: DataFrame, steps: int = 4, direction: str = "both"
) -> DataFrame:
    """ANF curve + average distance, engine-portable.

    Returns rows (step: int, anf: double) for step 0..steps, plus one row
    (step=-1, anf=average distance) computed from the curve exactly as the
    reference does (hyperanf.hpp:61-70: avg = sum i*(ANF_i - ANF_{i-1}) /
    (ANF_last - ANF_0)). Per-vertex estimates are rounded to 4dp and
    integer-scaled before the global sum, so the curve is deterministic
    (no float-sum ordering) and oracle-reproducible.
    """
    spark, curve = _anf_curve_scaled(edges, steps, direction)
    den = curve[-1] - curve[0]
    num = sum(i * (curve[i] - curve[i - 1]) for i in range(1, len(curve)))
    avg = (float(num) / float(den)) if den > 0 else 0.0
    rows = [(t, s / 10000.0) for t, s in enumerate(curve)] + [(-1, avg)]
    return spark.createDataFrame(rows, "step int, anf double")


# ---------------------------------------------------------------------------
# DuckDB oracle SQL generators — kept beside the Spark expressions so the
# two derivations cannot drift apart.
# ---------------------------------------------------------------------------

def sql_rho_cte(vert_cte: str = "verts") -> str:
    """CTE computing (id, idx, rho) for every vertex — mirrors _idx_rho."""
    h = PORTABLE_H1_SQL.format(s="CAST(id AS VARCHAR)")
    return f"""
vh AS MATERIALIZED (SELECT id, {h} AS h FROM {vert_cte}),
vreg AS MATERIALIZED (
  SELECT id, CAST(h % {M} AS INT) AS idx,
         CASE WHEN (h >> 6) = 0 THEN {RHO_MAX}
              ELSE {RHO_MAX} - length(bin(h >> 6)) END AS rho
  FROM vh)"""


def sql_estimate_exprs(mr: str = "mr", cnt: str = "cnt") -> tuple[str, str]:
    """(S expr over grouped registers, estimate expr over (s, vz)).

    Use in: SELECT u, {S} AS s, {M} - count(*) AS vz ... GROUP BY u, then
    est = {EST} over columns s and vz. Mirrors _estimate.
    """
    s_expr = (
        f"sum(1::BIGINT << ({RHO_MAX} - {mr}))"
        f" + (CAST({M} AS BIGINT) - count(*)) * (1::BIGINT << {RHO_MAX})"
    )
    lc_list = "[" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in LC) + "]"
    est = (
        f"CASE WHEN (CAST({ALPHA_NUM!r} AS DOUBLE) / CAST(s AS DOUBLE))"
        f" <= CAST({LINEAR_BOUND!r} AS DOUBLE) AND vz > 0"
        f" THEN ({lc_list})[vz]"
        f" ELSE CAST({ALPHA_NUM!r} AS DOUBLE) / CAST(s AS DOUBLE) END"
    )
    return s_expr, est


def sql_ball_ctes(steps: int, edge_cte: str = "edges",
                  vert_cte: str = "verts") -> str:
    """Unrolled exact t-hop reachability ball b{steps}(u, v)."""
    parts = [
        f"b0 AS MATERIALIZED (SELECT id AS u, id AS v FROM {vert_cte})"
    ]
    for k in range(1, steps + 1):
        parts.append(
            f"b{k} AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
            f"SELECT u, v FROM b{k-1} UNION ALL "
            f"SELECT b.u, e.dst AS v FROM b{k-1} b "
            f"JOIN {edge_cte} e ON e.src = b.v))"
        )
    return ",\n".join(parts)


def sql_nstep_oracle(steps: int, prefix_sql: str) -> str:
    """Full oracle query for nstep_degrees_portable on the graph prefix.

    prefix_sql must define CTEs `edges` (directed rows, already oriented
    the way sketches flow) and `verts`.
    """
    s_expr, est = sql_estimate_exprs()
    return f"""{prefix_sql},
{sql_ball_ctes(steps)},
{sql_rho_cte()},
regs AS MATERIALIZED (
  SELECT b.u, r.idx, max(r.rho) AS mr
  FROM b{steps} b JOIN vreg r ON r.id = b.v
  GROUP BY b.u, r.idx),
sv AS (SELECT u, {s_expr} AS s, {M} - count(*) AS vz FROM regs GROUP BY u)
SELECT u AS id, round(({est}) - 1.0, 4) AS nstep_degree FROM sv"""


def sql_register_ctes(steps: int, edge_cte: str = "edges") -> str:
    """Iterative sparse register-merge s{t}(id, idx, mr) — the SQL replica
    of _merge_step (each vertex takes the element-wise max of its
    in-neighbors' registers and its own). Rows per vertex <= M, so each
    step is a bounded equi-join — unlike the exact ball this stays cheap
    past graph saturation (used for the multi-step hyperanf oracle; the
    nstep oracle keeps the STRONGER exact-ball derivation)."""
    parts = ["s0 AS MATERIALIZED (SELECT id, idx, rho AS mr FROM vreg)"]
    for k in range(1, steps + 1):
        parts.append(
            f"""s{k} AS MATERIALIZED (
  SELECT x.id, x.idx, max(x.mr) AS mr FROM (
    SELECT e.dst AS id, s.idx, s.mr
    FROM {edge_cte} e JOIN s{k-1} s ON s.id = e.src
    UNION ALL SELECT id, idx, mr FROM s{k-1}
  ) x GROUP BY x.id, x.idx)"""
        )
    return ",\n".join(parts)


def sql_effective_diameter_oracle(
    steps: int, prefix_sql: str, q: float = 0.9
) -> str:
    """Full oracle for effective_diameter_portable: same register/anf CTEs
    as the hyperanf oracle, then an unrolled CASE picking the first step
    whose scaled ANF reaches q * ANF_steps, with the identical
    interpolation arithmetic."""
    s_expr, est = sql_estimate_exprs()
    anf_ctes = []
    for t in range(steps + 1):
        anf_ctes.append(f"""
sv{t} AS MATERIALIZED (
  SELECT id AS u, {s_expr} AS s, {M} - count(*) AS vz FROM s{t} GROUP BY id),
anf{t} AS MATERIALIZED (
  SELECT sum(CAST(round(round({est}, 4) * 10000.0, 0) AS BIGINT)) AS sc
  FROM sv{t})""")
    sc = [f"(SELECT sc FROM anf{t})" for t in range(steps + 1)]
    target = f"({q} * CAST({sc[steps]} AS DOUBLE))"
    branches = [f"WHEN CAST({sc[0]} AS DOUBLE) >= {target} THEN 0.0"]
    for t in range(1, steps + 1):
        interp = (
            f"{t - 1} + ({target} - CAST({sc[t - 1]} AS DOUBLE))"
            f" / (CAST({sc[t]} AS DOUBLE) - CAST({sc[t - 1]} AS DOUBLE))"
        )
        branches.append(
            f"WHEN CAST({sc[t]} AS DOUBLE) >= {target} THEN {interp}"
        )
    ed = "CASE " + " ".join(branches) + " ELSE 0.0 END"
    num = " + ".join(
        f"{t} * ({sc[t]} - {sc[t - 1]})" for t in range(1, steps + 1)
    )
    den = f"({sc[steps]} - {sc[0]})"
    avg = (
        f"CASE WHEN {den} > 0 THEN CAST({num} AS DOUBLE)"
        f" / CAST({den} AS DOUBLE) ELSE 0.0 END"
    )
    return f"""{prefix_sql},
{sql_rho_cte()},
{sql_register_ctes(steps)},{','.join(anf_ctes)}
SELECT round({ed}, 6) AS eff_diameter, round({avg}, 6) AS avg_distance"""


def sql_hyperanf_oracle(steps: int, prefix_sql: str) -> str:
    """Full oracle for hyperanf_portable (curve rows + avg row)."""
    s_expr, est = sql_estimate_exprs()
    anf_ctes = []
    for t in range(steps + 1):
        anf_ctes.append(f"""
sv{t} AS MATERIALIZED (
  SELECT id AS u, {s_expr} AS s, {M} - count(*) AS vz FROM s{t} GROUP BY id),
anf{t} AS MATERIALIZED (
  SELECT sum(CAST(round(round({est}, 4) * 10000.0, 0) AS BIGINT)) AS sc
  FROM sv{t})""")
    curve_rows = " UNION ALL ".join(
        f"SELECT {t} AS step, CAST(sc AS DOUBLE) / 10000.0 AS anf FROM anf{t}"
        for t in range(steps + 1)
    )
    num = " + ".join(
        f"{t} * ((SELECT sc FROM anf{t}) - (SELECT sc FROM anf{t-1}))"
        for t in range(1, steps + 1)
    )
    den = f"((SELECT sc FROM anf{steps}) - (SELECT sc FROM anf0))"
    avg_row = (
        f"SELECT -1 AS step, CASE WHEN {den} > 0 THEN "
        f"CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) "
        f"ELSE 0.0 END AS anf"
    )
    return f"""{prefix_sql},
{sql_rho_cte()},
{sql_register_ctes(steps)},{','.join(anf_ctes)}
{curve_rows} UNION ALL {avg_row}"""
