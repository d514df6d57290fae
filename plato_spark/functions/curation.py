"""End-to-end training-corpus curation as ONE composable DataFrame DAG.

The canonical large-scale data-preparation pipeline, staged in the order
every production curation job runs it (cheapest filter first, most
expensive similarity join last, each stage shrinking the next stage's
input):

  1. quality gate      (functions/text.quality_filter — codegen projection)
  2. exact dedup       (sha256 groupBy — only 64B digests shuffle)
  3. near-dup dedup    (minhash-LSH bucketed candidates -> n-gram Jaccard
                        verify -> WCC transitive closure; the bucketed
                        100 TB path, not the all-pairs oracle mode)
  4. stratified sample (portable-hash gate per language quota)
  5. train/val/test    (portable-hash disjoint split)

Returns one disposition row per input document:
  (doc_id, status in {low_quality, exact_dup, near_dup, sampled_out, kept},
   split in {train, val, test} for kept rows, '' otherwise)

With hash_impl='portable' every stage (including the LSH banding itself)
is reproducible in ANSI SQL, so the entire five-stage pipeline is
value-checked end-to-end by the DuckDB oracle — the near-dup semantics
under LSH are "Jaccard >= threshold AND bucket-collision", which is
exactly what the scale path computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.functions.dedup import near_dup_clusters
from plato_spark.functions.sampling import hash_split, stratified_sample
from plato_spark.functions.text import quality_filter


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "lang",
    fractions: dict[str, float] | None = None,
    default_fraction: float = 0.25,
    jaccard_threshold: float = 0.5,
    split_weights: dict[str, float] | None = None,
    hash_impl: str = "portable",
) -> DataFrame:
    """(doc_id, status, split) — full curation disposition per document."""
    ids = F.col(id_col)

    # 1. quality gate
    q = quality_filter(df, text_col, id_col).persist()
    base = df.join(q.where("keep").select(id_col), id_col).persist()

    # 2. exact dedup: keeper = min id per content digest
    sha = base.select(ids, F.sha2(F.col(text_col), 256).alias("sha"))
    ek = sha.groupBy("sha").agg(F.min(id_col).alias("ekeeper"))
    exact_dups = (
        sha.join(ek, "sha").where(ids != F.col("ekeeper")).select(id_col)
    ).persist()
    s1 = base.join(exact_dups, id_col, "left_anti").persist()

    # 3. near-dup dedup over the survivors (LSH-bucketed candidates)
    nd = near_dup_clusters(
        s1, threshold=jaccard_threshold, text_col=text_col, id_col=id_col,
        use_lsh=True, hash_impl=hash_impl,
    )
    near_dups = (
        nd.where(F.col("doc_id") != F.col("keeper_id"))
        .select(F.col("doc_id").alias(id_col))
    ).persist()
    s2 = s1.join(near_dups, id_col, "left_anti")

    # 4. + 5. sampling gate, then split assignment on what survives
    sampled = stratified_sample(
        s2, strata_col, fractions, default_fraction, id_col
    ).select(id_col)
    kept = hash_split(sampled, split_weights, id_col).persist()

    flag = F.lit(True)
    return (
        df.select(ids)
        .join(q, id_col)
        .join(exact_dups.withColumn("is_ed", flag), id_col, "left")
        .join(near_dups.withColumn("is_nd", flag), id_col, "left")
        .join(kept.withColumn("is_kept", flag), id_col, "left")
        .select(
            ids,
            F.when(~F.col("keep"), F.lit("low_quality"))
            .when(F.col("is_ed").isNotNull(), F.lit("exact_dup"))
            .when(F.col("is_nd").isNotNull(), F.lit("near_dup"))
            .when(F.col("is_kept").isNull(), F.lit("sampled_out"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.coalesce(F.col("split"), F.lit("")).alias("split"),
        )
    )
