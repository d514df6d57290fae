"""Training-feed assembly operators: sequence packing, data-mixture
weights, dataset snapshot diff.

These are the last mile of an LLM data pipeline — after filtering and
dedup, documents are packed into fixed token-budget training sequences,
sources are re-weighted (temperature sampling), and dataset versions
are diffed for incremental re-training.  No reference counterpart
(plato is a graph engine); these extend SURVEY §2's beyond-reference
inventory the same way the dedup/ANN families do.

Scale notes (the 100 TB plan, not the sf0.01 test):

* ``sequence_packing`` follows the concat-then-chunk recipe most LLM
  trainers use (documents concatenated in a deterministic order, the
  token stream cut every ``budget`` tokens).  The only global structure
  it needs is a prefix sum of token counts over that order — computed
  here as a DISTRIBUTED prefix sum: per-bucket partial sums (map-side
  combined) -> a bucket-offset table of at most ``2**bucket_bits`` rows
  (the only single-partition window, bounded by the bucket count, the
  same role as an MPI exscan) -> a bucket-partitioned window for the
  within-bucket running sum.  The naive ``Window.orderBy(key)`` with no
  partition key would serialize the whole corpus through ONE task; this
  plan's per-document window is partitioned 2**bucket_bits ways, and
  the buckets align with the sort order by construction because the
  bucket IS the sort key's high bits (``key >> (56 - bucket_bits)``).
* ``mixture_weights`` is one map-side-combined aggregation over the
  corpus plus a broadcast of a one-row total — exact integer arithmetic
  (isqrt, not float sqrt-sums) until a single rounded division, so the
  result is bit-identical across engines and partitionings.
* ``snapshot_diff`` shuffles only (id, 16-byte digest) pairs, never
  document bodies — the full-outer-join diff of two 100 TB snapshots
  moves ~24 bytes per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plato_spark.functions.text import portable_h1, token_count_col

__all__ = ["sequence_packing", "mixture_weights", "snapshot_diff",
           "mixture_apply"]


def sequence_packing(
    docs: DataFrame,
    budget: int = 512,
    bucket_bits: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-then-chunk packing manifest.

    Documents are laid out in the deterministic order
    ``(portable_h1('pack|' || id), id)`` and the concatenated token
    stream is cut every ``budget`` tokens; each document is assigned
    the half-open token interval ``[start_off, start_off + n_tokens)``
    and therefore the chunk range ``[first_chunk, last_chunk]``.

    Returns ``(id, n_tokens, start_off, first_chunk, last_chunk,
    n_chunks)`` — all exact BIGINTs, so the result is bit-identical to
    the SQL mirror at any partitioning.  Zero-token documents occupy no
    chunk and are excluded (mirrored in the oracle).

    ``n_chunks > 1`` marks documents that straddle a chunk boundary
    (the attention-masking cost of packing); ``sum(n_chunks - 1)`` over
    the manifest is the total number of split documents.
    """
    shift = 56 - bucket_bits  # portable_h1 is 56-bit; high bits = bucket
    t = (
        docs.select(
            F.col(id_col),
            token_count_col(F.col(text_col)).alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "key",
            portable_h1(F.concat(F.lit("pack|"), F.col(id_col).cast("string"))),
        )
        .withColumn("bucket", F.shiftright(F.col("key"), shift))
    )
    # stage 1: per-bucket totals (map-side combined; <= 2**bucket_bits rows)
    tot = t.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    # stage 2: exclusive prefix over the tiny bucket table (the ONLY
    # single-partition window; bounded by 2**bucket_bits rows)
    w_excl = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = tot.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_excl), F.lit(0)).alias("bucket_off"),
    )
    # stage 3: within-bucket running sum, partitioned 2**bucket_bits ways;
    # bucket = key's high bits, so (bucket, key, id) IS the global order
    w_in = Window.partitionBy("bucket").orderBy("key", id_col)
    c = (
        t.join(F.broadcast(off), "bucket")
        .withColumn("cum", F.sum("n_tokens").over(w_in) + F.col("bucket_off"))
    )
    return c.select(
        F.col(id_col),
        F.col("n_tokens"),
        (F.col("cum") - F.col("n_tokens")).alias("start_off"),
        F.expr(f"(cum - n_tokens) div {int(budget)}").alias("first_chunk"),
        F.expr(f"(cum - 1) div {int(budget)}").alias("last_chunk"),
        (
            F.expr(f"(cum - 1) div {int(budget)}")
            - F.expr(f"(cum - n_tokens) div {int(budget)}")
            + F.lit(1)
        ).cast("long").alias("n_chunks"),
    )


def _isqrt(x):
    """Exact integer sqrt of a non-negative BIGINT column.

    ``floor(sqrt(x))`` alone can be off by one when the correctly-
    rounded double sqrt lands on the wrong side of an integer (e.g.
    sqrt(k*k - 1) rounding up to k); the two CASE corrections make it
    exact for all int64 inputs.  Mirrored step-by-step in the
    mixture_weights oracle CTEs.
    """
    w = F.floor(F.sqrt(x.cast("double"))).cast("long")
    w = F.when((w + 1) * (w + 1) <= x, w + 1).otherwise(w)
    return F.when(w * w > x, w - 1).otherwise(w)


def mixture_weights(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-sampling mixture weights per source (alpha = 0.5).

    The standard multilingual/multi-source re-weighting (mC4/XLM-R
    style): sampling weight proportional to ``tokens**alpha`` flattens
    the head so low-resource sources are seen more than their natural
    share.  alpha = 0.5 makes the weight ``isqrt(tokens)`` — EXACT
    integer arithmetic end-to-end (no float sqrt-sums whose addition
    order varies across engines); each output ratio is a single rounded
    division of exact BIGINTs.

    Returns ``(source, n_docs, n_tokens, natural_share, temp_share,
    boost)`` where boost = temp_share / natural_share computed as the
    exact integer cross-product ratio ``w*T / (S*tokens)``.
    """
    per = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_col(F.col(text_col))).alias("n_tokens"),
    )
    per = per.withColumn("w", _isqrt(F.col("n_tokens")))
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.sum("w").alias("tot_w")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col(source_col),
            F.col("n_docs"),
            F.col("n_tokens"),
            F.round(F.col("n_tokens") / F.col("tot_tokens"), 6).alias(
                "natural_share"
            ),
            F.round(F.col("w") / F.col("tot_w"), 6).alias("temp_share"),
            F.round(
                (F.col("w") * F.col("tot_tokens"))
                / (F.col("tot_w") * F.col("n_tokens")),
                6,
            ).alias("boost"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document diff of two dataset snapshots.

    Returns ``(id, status)`` with status in {added, removed, changed,
    unchanged} — the incremental-retraining planner's input (only
    added/changed documents re-enter the pipeline).  Compares md5
    digests, so the shuffle moves (id, 16-byte digest) pairs, never
    bodies; at 100 TB the diff costs two digest scans plus one
    digest-only join.
    """
    a = old.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("h_old")
    )
    b = new.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("h_new")
    )
    j = a.join(b, "id", "full_outer")
    return j.select(
        "id",
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") == F.col("h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def mixture_apply(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, source, n_copies) — materialize the mixture_weights plan as a
    per-document replication factor: every document of source s is
    consumed ``boost_s`` times in expectation, so each source's
    effective token share equals its temperature share.  The standard
    epochs-per-source recipe (boost > 1 upsamples by repetition,
    boost < 1 downsamples) made fully deterministic: n_copies =
    floor(boost) + 1 more iff portable_h1('mix|' || id) % 1e6 falls
    under the fractional part — reproducible at any partitioning, no
    RNG state, and exactly mirrorable in SQL.

    Portability contract: boost is the 6dp-ROUNDED division (the
    mixture_weights gate already proves both engines agree on it), so
    the fractional threshold round(frac * 1e6) is an EXACT integer and
    the hash comparison is integer-vs-integer — the float only ever
    passes through one agreed rounding.

    Scale: one broadcast of the per-source boost table (|sources| rows)
    against the corpus scan plus one JVM hash per document — no
    shuffle beyond mixture_weights' aggregation.  Downstream, a trainer
    repeats each doc n_copies times (0 drops it)."""
    w = mixture_weights(docs, source_col=source_col, text_col=text_col)
    b6 = F.col("boost")  # already rounded 6dp by mixture_weights
    rates = w.select(
        F.col(source_col).alias("__src"),
        F.floor(b6).cast("long").alias("n_base"),
        F.round((b6 - F.floor(b6)) * 1e6, 0).cast("long").alias("thresh"),
    )
    h = portable_h1(F.concat(F.lit("mix|"), F.col("id").cast("string")))
    return (
        docs.select(F.col(id_col).alias("id"),
                    F.col(source_col).alias("__src"))
        .join(F.broadcast(rates), "__src")
        .select(
            "id",
            F.col("__src").alias("source"),
            (F.col("n_base")
             + F.when(F.pmod(h, F.lit(1_000_000)) < F.col("thresh"), 1)
             .otherwise(0)).cast("long").alias("n_copies"),
        )
    )
