"""Count-min sketch over corpus tokens — sketch build + heavy hitters.

Cormode & Muthukrishnan 2005 ("An Improved Data Stream Summary: The
Count-Min Sketch and its Applications").  Complements the engine's
HyperLogLog family (algos/hll_portable.py — distinct counting) with the
other workhorse streaming sketch: frequency estimation, overestimating
by at most eps*N with probability 1-delta (d rows of w counters:
eps = e/w, delta = e^-d).

Everything is DETERMINISTIC and engine-portable:

  * row hashes come from the portable md5 family
    (functions/text.portable_h1): h_r(tok) = h1(str(r) || ':' || tok)
    mod w — independent-enough rows via the salt, identical in ANSI SQL;
  * the sketch build shuffles ONLY the d*w counter cells (d=4, w=512 →
    2048 rows), never the token stream: the groupBy(r, b) is map-side
    combined, so each task emits at most d*w partial cells no matter how
    many tokens it saw.  That is the whole point at 100 TB — the full
    token groupBy that exact counting needs is replaced by a
    constant-size aggregation;
  * heavy-hitter probing broadcasts the 2048-cell sketch and evaluates
    the d probes JVM-side per candidate token.

Tokens follow the corpus-wide TOKEN_RE definition (functions/text.py),
the same tokens as vocabulary/tf-idf, so estimates line up with the
exact vocabulary query for audit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.functions.text import TOKEN_RE, portable_h1, portable_h2

__all__ = ["cms_sketch", "cms_heavy_hitters", "cms_probe"]


def _bucket(tok_col, r: int, width: int):
    return F.pmod(
        portable_h1(F.concat_ws(":", F.lit(str(r)), tok_col)), F.lit(width)
    ).cast("int")


def cms_sketch(
    docs: DataFrame, depth: int = 4, width: int = 512, text_col: str = "text"
) -> DataFrame:
    """(r, b, cnt) — the d x w count-min sketch of the corpus token
    stream.  One pass; the shuffle carries at most depth*width cells per
    map task (map-side combine), never the tokens."""
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("token")
    )
    cells = toks.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).cast("int").alias("r"),
                    _bucket(F.col("token"), r, width).alias("b"),
                )
                for r in range(depth)
            ])
        ).alias("c")
    ).select("c.r", "c.b")
    return cells.groupBy("r", "b").agg(F.count("*").cast("long").alias("cnt"))


def cms_heavy_hitters(
    docs: DataFrame,
    threshold: int,
    depth: int = 4,
    width: int = 512,
    text_col: str = "text",
) -> DataFrame:
    """(token, est_count) for every distinct token whose count-min
    ESTIMATE (min over the d probed cells) reaches ``threshold``.

    The estimate never undercounts, so recall of true heavy hitters is
    perfect; collisions can only promote a few extra tokens (bounded by
    the sketch error eps*N).  Candidates here are the corpus's distinct
    tokens; in a streaming deployment the candidate set is the arriving
    keys and the broadcast sketch answers point queries without any
    token-keyed shuffle.
    """
    sketch = cms_sketch(docs, depth=depth, width=width, text_col=text_col)
    cand = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(TOKEN_RE), F.lit(0)
                )
            ).alias("token")
        )
        .distinct()
    )
    return cms_probe(sketch, cand, threshold, depth, width)


def cms_probe(
    sketch: DataFrame,
    cand: DataFrame,
    threshold: int,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """(token, est_count) — point-query a (pre-built or streamed) sketch
    for every candidate token; keep estimates >= ``threshold``.  The
    sketch broadcasts (d x w rows); candidates never shuffle.

    The sketch is SPARSE (cms_sketch only materializes observed cells),
    so each probe is a LEFT join with absent cells counting as 0 — an
    external candidate hitting an empty cell must get estimate 0, not
    the min over only its colliding cells."""
    probes = [
        cand.join(
            F.broadcast(
                sketch.where(F.col("r") == r).select("b", "cnt")
            ),
            _bucket(F.col("token"), r, width) == F.col("b"),
            "left",
        ).select("token", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        for r in range(depth)
    ]
    allp = reduce(lambda a, b: a.unionByName(b), probes)
    return (
        allp.groupBy("token")
        .agg(F.min("cnt").alias("est_count"))
        .where(F.col("est_count") >= threshold)
    )


def hll_group_cardinality(
    df: DataFrame, group_col: str, id_col: str
) -> DataFrame:
    """(group, est_distinct) — per-group distinct-count estimate via the
    engine-portable 64-register HyperLogLog (algos/hll_portable: same
    register derivation the hyperanf family is oracle-checked on).

    The cardinality-side sibling of the count-min sketch above: the
    shuffle carries at most |groups| * M register rows per map task
    (groupBy(group, idx) with map-side combine and max-merge — a
    commutative monoid, so it also folds incrementally), never the ids;
    the estimate is an integer fold + one float division per group, so
    it is bit-reproducible in SQL.  Duplicated (group, id) rows are
    harmless (max-merge), no pre-distinct needed.
    """
    regs = hll_registers(df, group_col, id_col)
    return hll_estimate(regs).withColumnRenamed("g", group_col)


def hll_registers(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """(g, idx, mr) — per-group HLL register maxes (<= |groups| * M
    rows).  Max-merge is a commutative IDEMPOTENT monoid: registers
    fold incrementally AND survive replays unguarded (the WCC-min
    property, unlike additive CMS/degree counts)."""
    from plato_spark.algos.hll_portable import _idx_rho

    idx, rho = _idx_rho(F.col(id_col))
    return (
        df.select(F.col(group_col).alias("g"), idx.alias("idx"),
                  rho.alias("rho"))
        .groupBy("g", "idx")
        .agg(F.max("rho").cast("int").alias("mr"))
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(g, est_distinct) — the standard HLL read-out over (g, idx, mr)
    register rows: integer power fold + linear counting under the small
    bound, one float division, rounded 4dp."""
    from plato_spark.algos.hll_portable import (
        ALPHA_NUM,
        LC,
        LINEAR_BOUND,
        M,
        POW,
    )

    pow_arr = F.array(*[F.lit(p) for p in POW])
    sv = regs.groupBy("g").agg(
        (
            F.sum(F.element_at(pow_arr, F.col("mr") + 1))
            + (F.lit(M) - F.count("*")) * F.lit(POW[0])
        ).cast("long").alias("s"),
        (F.lit(M) - F.count("*")).cast("int").alias("vz"),
    )
    lc_arr = F.array(*[F.lit(x) for x in LC])
    raw = F.lit(ALPHA_NUM) / F.col("s").cast("double")
    est = F.when(
        (raw <= F.lit(LINEAR_BOUND)) & (F.col("vz") > 0),
        F.element_at(lc_arr, F.col("vz")),
    ).otherwise(raw)
    return sv.select("g", F.round(est, 4).alias("est_distinct"))


def bloom_bits(
    df: DataFrame, key_col: str, m: int = 4096, d: int = 4
) -> DataFrame:
    """(bit) — the distinct set bits of a portable Bloom filter over the
    build side's keys: positions (h1 + i*h2) % m for i in 0..d-1, the
    engine's md5-derived double-hashing family (Kirsch-Mitzenmacher),
    bit-reproducible in DuckDB.  The filter materializes as at most
    ``m`` BIGINT rows — broadcastable at any build-side cardinality.
    """
    k = F.concat(F.lit("bloom|"), F.col(key_col).cast("string"))
    h1, h2 = portable_h1(k), portable_h2(k)
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: F.pmod(h1 + i * h2, F.lit(m)),
    )
    return (
        df.select(F.explode(bits).alias("bit")).distinct()
    )


def bloom_probe_stats(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
    m: int = 4096,
    d: int = 4,
) -> DataFrame:
    """1 row (build_keys, probe_keys, true_matches, bloom_pass,
    false_positives) — the join-pruning audit behind Bloom-filtered
    joins (Spark's own runtime row-group pruning does this implicitly;
    this measures it explicitly): how many probe keys pass the filter,
    and how many of those are false positives the downstream join must
    still reject.  A probe key passes iff ALL d of its bit positions
    are set — counted as an equi-join on the bit table + a per-key
    count == d gate, exact integers end-to-end.

    Scale: the filter is <= m rows (broadcast); the probe side shuffles
    once on the bit key and once on its own key — no all-pairs
    anything.  The false-positive RATE follows (1 - e^(-dn/m))^d; this
    operator measures the realized count exactly instead of trusting
    the formula.
    """
    b_keys = build.select(F.col(build_key).cast("long").alias("k")).distinct()
    p_keys = probe.select(F.col(probe_key).cast("long").alias("k")).distinct()
    bits = bloom_bits(b_keys, "k", m=m, d=d)

    kk = F.concat(F.lit("bloom|"), F.col("k").cast("string"))
    h1, h2 = portable_h1(kk), portable_h2(kk)
    probe_bits = p_keys.select(
        "k",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: F.pmod(h1 + i * h2, F.lit(m)),
            )
        ).alias("bit"),
    )
    # distinct per (k, bit): double hashing can collide within one key,
    # so require #distinct set positions == #distinct positions, not d
    pb = probe_bits.distinct()
    need = pb.groupBy("k").agg(F.count(F.lit(1)).alias("need"))
    have = (
        pb.join(F.broadcast(bits), "bit")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("have"))
    )
    passed = (
        need.join(have, "k")
        .where(F.col("need") == F.col("have"))
        .select("k")
    )
    true_m = p_keys.join(b_keys, "k", "semi")
    stats = (
        b_keys.agg(F.count(F.lit(1)).cast("long").alias("build_keys"))
        .crossJoin(
            F.broadcast(p_keys.agg(F.count(F.lit(1)).cast("long").alias("probe_keys")))
        )
        .crossJoin(
            F.broadcast(true_m.agg(F.count(F.lit(1)).cast("long").alias("true_matches")))
        )
        .crossJoin(
            F.broadcast(passed.agg(F.count(F.lit(1)).cast("long").alias("bloom_pass")))
        )
    )
    return stats.select(
        "build_keys",
        "probe_keys",
        "true_matches",
        "bloom_pass",
        (F.col("bloom_pass") - F.col("true_matches"))
        .cast("long")
        .alias("false_positives"),
    )


def hll_set_ops(
    df: DataFrame,
    group_col: str,
    id_col: str,
    set_a: str,
    set_b: str,
) -> DataFrame:
    """One row: (est_a, est_b, est_union, est_intersect, exact_a,
    exact_b, exact_union, exact_intersect) — HLL SET ALGEBRA between
    two groups' id sets, with the exact answers beside the estimates so
    the row itself is the accuracy report.

    Union is the operation HLL is ALGEBRAICALLY closed under: per-index
    register max — the merge that makes the sketch distributable (the
    same zip_with(greatest) hyperanf rides).  Intersection has no
    register-level form; it falls out of inclusion-exclusion over the
    three estimates — correct in expectation but with RELATIVE error
    amplified by est_union / est_intersect, which is exactly why this
    row carries the exact columns (the production rule: trust HLL
    unions at any scale, trust I-E intersections only when the overlap
    is a large fraction of the union).

    Exactness/scale: registers and their maxes are exact integers from
    the portable hash (every estimate bit-reproducible in SQL); the
    exact side is one distinct-pair fold — the thing you could NOT
    afford at 100 TB, which is the point of shipping the sketch beside
    it."""
    two = df.where(F.col(group_col).isin([set_a, set_b]))
    regs = hll_registers(two, group_col, id_col)
    union_regs = regs.groupBy("idx").agg(
        F.max("mr").cast("int").alias("mr")
    ).select(F.lit("__union__").alias("g"), "idx", "mr")
    est = hll_estimate(regs.unionByName(union_regs))
    e = est.agg(
        F.max(F.when(F.col("g") == set_a, F.col("est_distinct")))
        .alias("est_a"),
        F.max(F.when(F.col("g") == set_b, F.col("est_distinct")))
        .alias("est_b"),
        F.max(F.when(F.col("g") == "__union__", F.col("est_distinct")))
        .alias("est_union"),
    )
    ids = two.select(F.col(group_col).alias("g"),
                     F.col(id_col).alias("i")).distinct()
    ex = ids.agg(
        F.sum((F.col("g") == set_a).cast("long")).alias("exact_a"),
        F.sum((F.col("g") == set_b).cast("long")).alias("exact_b"),
        F.countDistinct("i").cast("long").alias("exact_union"),
    )
    return e.crossJoin(ex).select(
        "est_a", "est_b", "est_union",
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4)
        .alias("est_intersect"),
        "exact_a", "exact_b", "exact_union",
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_union"))
        .cast("long").alias("exact_intersect"),
    )
