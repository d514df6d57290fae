"""Deterministic synthetic source-code corpus.

Produces the exact input-table shape mandated by BASELINE.json input_hint:

    (repo: string, path: string, commit: string, lang: string, content: string)

one row per (commit, file) touch — an Iceberg-style repo-history table.
Everything is a pure function of (row index, seed) via xxhash64, so the same
(sf, seed) always yields byte-identical data on any partitioning/parallelism
— no Date.now, no RNG state, no external data.

Skew design (exercises the north rule's hub handling): the file index chosen
for each commit slot is ``floor(files_per_repo * u^3)`` with u uniform — a
polynomial skew that makes low-index files (file 0 especially) hubs that
appear in a large fraction of their repo's commits, giving the co-commit
graph a heavy-tailed degree distribution like a real monorepo.

Scale knobs (sf=1.0 ≈ 8M corpus rows; tests use 0.001-0.01, bench 0.1):
    n_repos = max(4, 200*sf), n_commits = max(120, 800_000*sf),
    files_per_repo = max(50, 5000*sf), slots per commit in [2, 9].
The generator itself is an embarrassingly parallel spark.range scan — at
100TB-corpus scale the same plan shape holds (range -> projections), no
shuffle until extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "java", "cpp", "go", "rs", "js"]


def corpus_params(sf: float) -> dict:
    return {
        "n_repos": max(4, int(200 * sf)),
        "n_commits": max(120, int(800_000 * sf)),
        "files_per_repo": max(50, int(5000 * sf)),
        "min_slots": 2,
        "max_slots": 9,
    }


def _h(*cols) -> F.Column:
    """Deterministic 64-bit hash of the given columns (+ fixed seed 42)."""
    return F.xxhash64(*cols, F.lit(42))


def synth_corpus(spark: SparkSession, sf: float, num_partitions: int | None = None) -> DataFrame:
    """Generate the corpus table at scale factor ``sf`` (deterministic)."""
    p = corpus_params(sf)
    n_repos, n_commits = p["n_repos"], p["n_commits"]
    fpr = p["files_per_repo"]
    span = p["max_slots"] - p["min_slots"] + 1

    if num_partitions is None:
        # generation is an embarrassingly parallel compute-bound scan
        # (md5 bodies): spread it over the full executor width even when
        # the ambient shuffle conf is sized down for a small workload —
        # every row is a pure function of its range index, so the
        # partition count never changes the data (TESTDATA.md invariant)
        num_partitions = max(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            spark.sparkContext.defaultParallelism,
        )

    commits = (
        spark.range(0, n_commits, 1, num_partitions)
        .select(
            F.col("id").alias("cid"),
            F.pmod(_h(F.col("id"), F.lit("repo")), F.lit(n_repos)).alias("r"),
            (F.lit(p["min_slots"]) + F.pmod(_h(F.col("id"), F.lit("k")), F.lit(span))).alias("k"),
        )
        .withColumn("commit", F.md5(F.concat(F.lit("commit-"), F.col("cid"))))
    )

    touches = commits.select(
        "cid", "r", "commit", F.explode(F.sequence(F.lit(0), F.col("k") - 1)).alias("slot")
    )
    # u in [0,1) from hash; file index skewed low via u^3 -> hub files
    u = (F.pmod(_h(F.col("cid"), F.col("slot"), F.lit("file")), F.lit(1_000_000))
         / F.lit(1_000_000.0))
    touches = touches.select(
        "r",
        "commit",
        F.floor(F.lit(float(fpr)) * u * u * u).cast("long").alias("fidx"),
    ).dropDuplicates(["r", "commit", "fidx"])

    n_dirs = max(2, fpr // 25)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(_h(F.col("r"), F.col("fidx"), F.lit("lang")), F.lit(len(LANGS))) + 1).cast("int"),
    )
    repo = F.concat(F.lit("org"), F.pmod(F.col("r"), F.lit(17)), F.lit("/repo"), F.col("r"))
    path = F.concat(
        F.lit("src/m"),
        F.pmod(_h(F.col("r"), F.col("fidx"), F.lit("dir")), F.lit(n_dirs)),
        F.lit("/f"),
        F.col("fidx"),
        F.lit("."),
        lang,
    )
    body = F.concat(
        F.lit("// synthetic source body\n"),
        F.md5(F.concat(repo, path, F.col("commit"), F.lit("b0"))), F.lit("\n"),
        F.md5(F.concat(repo, path, F.col("commit"), F.lit("b1"))), F.lit("\n"),
        F.repeat(F.md5(F.concat(repo, path, F.lit("stable"))),
                 (F.pmod(_h(F.col("r"), F.col("fidx")), F.lit(8)) + 1).cast("int")),
    )
    content = F.concat(
        F.lit("// "), repo, F.lit(":"), path, F.lit("@"), F.col("commit"), F.lit("\n"), body
    )

    return touches.select(
        repo.alias("repo"),
        path.alias("path"),
        F.col("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )
