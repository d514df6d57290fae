"""Edge extraction from the corpus table: co-commit + path-link.

North-star contract (BASELINE.json): "vertices are repos/files and edges come
from co-commit and path-link extraction via vectorized Arrow UDFs", with the
per-row sha256(content) invariant preserved through extraction.

- co-commit: two files edited in the same commit are linked; weight = number
  of shared commits. Pair generation is vectorized: one JVM group-agg
  collects each commit's distinct file list, then a mapInPandas Arrow pass
  emits the pairs with numpy (never per-row Python). A pure self-join
  variant (impl='join') exists for A/B benchmarking — same output.
- path-link: files within the same (repo, directory) are chained in
  lexicographic order (linear edge count — deliberately NOT a clique so hub
  directories don't explode), and each repo vertex links to the head file of
  each of its directories (repo<->file containment edges).

Vertex keys: files are "repo/path", repos are "repo:<repo>"; dense encoding
happens downstream (graph.edges.encode_vertices, mirroring plato's
vid_encoder_t, /root/reference/plato/graph/structure/vid_encoder.hpp:40-165).

sha256 invariant: ``with_content_sha`` stamps sha2(content,256) on the input;
``extract_graph`` returns the stamped corpus it actually read alongside the
edges so tests can assert digest equality pre/post extraction (input_hint).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_FILES_PER_COMMIT = 256  # clique guard: a commit touching >256 files is
# linked as a star around its lexicographically-first file instead of a
# full clique (keeps worst-case pair count linear; plato bounds the same
# blow-up with its load-balancing masks, mutual.hpp:148-159).


def with_content_sha(corpus: DataFrame) -> DataFrame:
    return corpus.withColumn("content_sha", F.sha2(F.col("content"), 256))


def _commit_file_lists(corpus: DataFrame) -> DataFrame:
    files = corpus.select(
        "commit", F.concat_ws("/", "repo", "path").alias("fkey")
    ).dropDuplicates(["commit", "fkey"])
    return files.groupBy("commit").agg(F.sort_array(F.collect_set("fkey")).alias("fkeys"))


def co_commit_edges(corpus: DataFrame, impl: str = "arrow") -> DataFrame:
    """(src, dst, weight, etype='co_commit') with src < dst (canonical).

    weight = number of commits in which the pair co-occurred.
    """
    if impl == "join":
        cf = corpus.select(
            "commit", F.concat_ws("/", "repo", "path").alias("fkey")
        ).dropDuplicates(["commit", "fkey"])
        a = cf.select("commit", F.col("fkey").alias("src"))
        b = cf.select("commit", F.col("fkey").alias("dst"))
        pairs = a.join(b, "commit").where(F.col("src") < F.col("dst"))
    elif impl == "arrow":
        lists = _commit_file_lists(corpus)

        def gen_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                srcs: list[np.ndarray] = []
                dsts: list[np.ndarray] = []
                for fkeys in pdf["fkeys"]:
                    arr = np.asarray(fkeys)
                    n = len(arr)
                    if n < 2:
                        continue
                    if n > MAX_FILES_PER_COMMIT:
                        srcs.append(np.repeat(arr[0], n - 1))
                        dsts.append(arr[1:])
                        continue
                    iu, ju = np.triu_indices(n, k=1)
                    srcs.append(arr[iu])
                    dsts.append(arr[ju])
                if srcs:
                    yield pd.DataFrame(
                        {"src": np.concatenate(srcs), "dst": np.concatenate(dsts)}
                    )
                else:
                    yield pd.DataFrame({"src": pd.Series(dtype=object),
                                        "dst": pd.Series(dtype=object)})

        pairs = lists.mapInPandas(gen_pairs, schema="src string, dst string")
    else:
        raise ValueError(f"unknown impl {impl!r}")

    return (
        pairs.groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
        .withColumn("etype", F.lit("co_commit"))
    )


def path_link_edges(corpus: DataFrame) -> DataFrame:
    """(src, dst, weight=1.0, etype='path_link'), canonical src<dst.

    Chain files within each (repo, dir) in lexicographic order; link the repo
    vertex to each directory's head file.

    Plan shape (r6): ONE pass — lead() and row_number() share a single
    window spec (one sort), and the chain/head edge variants leave the
    window as an exploded 2-slot array, so the (deduplicated) file table
    is scanned once instead of once per edge variant (the old
    chain-UNION-heads plan re-ran the corpus dropDuplicates scan twice).
    Output set is identical: explode emits the same (src, dst) pairs the
    union produced, and the same final distinct applies.
    """
    files = (
        corpus.select(
            "repo",
            "path",
            F.concat_ws("/", "repo", "path").alias("fkey"),
            # directory = path minus last component
            F.regexp_replace("path", "/[^/]*$", "").alias("dir"),
        )
        .dropDuplicates(["repo", "path"])
    )
    w = Window.partitionBy("repo", "dir").orderBy("path")
    ann = files.select(
        "repo", "fkey",
        F.lead("fkey").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    )
    rkey = F.concat(F.lit("repo:"), F.col("repo"))
    pair = ann.select(
        F.explode(
            F.array(
                F.when(
                    F.col("nxt").isNotNull(),
                    F.struct(F.least("fkey", "nxt").alias("src"),
                             F.greatest("fkey", "nxt").alias("dst")),
                ),
                F.when(
                    F.col("rn") == 1,
                    F.struct(F.least(rkey, F.col("fkey")).alias("src"),
                             F.greatest(rkey, F.col("fkey")).alias("dst")),
                ),
            )
        ).alias("p")
    ).where(F.col("p").isNotNull())
    return (
        pair.select("p.src", "p.dst")
        .distinct()
        .select("src", "dst", F.lit(1.0).alias("weight"), F.lit("path_link").alias("etype"))
    )


def extract_graph_encoded(
    corpus: DataFrame, num_partitions: int | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Scale-path extraction: returns (encoded_edges, dictionary, stamped).

    Two wins over extract_graph + encode_vertices (same results, proven by
    tests/test_corpus.py equivalence):

    1. Vertex keys are dictionary-encoded BEFORE pair generation, so the
       pair shuffle carries two longs instead of two "repo/path" strings
       (the dominant byte volume of the extraction at scale), and the
       Arrow pair generator runs numpy int64 kernels instead of object
       arrays.
    2. Pair counts are pre-aggregated per Arrow batch (a C-level groupby),
       shrinking the rows entering the global groupBy.

    Encoded edges are IDENTICAL to encode_vertices(extract_graph(...)):
    the dictionary rank preserves string sort order, so vid order == key
    order and the canonical (src<dst) orientation and the >256-file star
    guard pick the same endpoints.
    """
    from plato_spark.graph.edges import build_dictionary
    from plato_spark.graph.partitioning import auto_shuffle_partitions

    spark = corpus.sparkSession
    stamped = with_content_sha(corpus)
    # key the (commit, file) table by commit up front: hash(commit)
    # clusters every (commit, fkey) dedup group AND the later
    # groupBy(commit) list-building aggregation, so when the dictionary
    # join broadcasts (dictionary ≪ corpus) the whole
    # dedup -> encode -> commit-lists chain runs on ONE exchange (r6;
    # previously dedup exchanged on (commit, fkey) and the groupBy paid
    # a second full exchange on commit)
    files_cf = stamped.select(
        "commit", F.concat_ws("/", "repo", "path").alias("fkey")
    ).repartition("commit").dropDuplicates(["commit", "fkey"]).persist()
    if num_partitions is None:
        num_partitions = auto_shuffle_partitions(spark, files_cf.count())

    pl = path_link_edges(stamped.select("repo", "path")).persist()
    keys = (
        files_cf.select(F.col("fkey").alias("vkey"))
        .unionByName(pl.select(F.col("src").alias("vkey")))
        .unionByName(pl.select(F.col("dst").alias("vkey")))
        .distinct()
    )
    dic = build_dictionary(keys, num_partitions)

    cf_enc = files_cf.join(
        dic.select(F.col("vkey").alias("fkey"), "id"), "fkey"
    ).select("commit", "id")
    lists = cf_enc.groupBy("commit").agg(
        F.sort_array(F.collect_set("id")).alias("vids")
    )

    def gen_pairs_counted(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs: list[np.ndarray] = []
            dsts: list[np.ndarray] = []
            for vids in pdf["vids"]:
                arr = np.asarray(vids, dtype=np.int64)
                n = len(arr)
                if n < 2:
                    continue
                if n > MAX_FILES_PER_COMMIT:
                    srcs.append(np.repeat(arr[0], n - 1))
                    dsts.append(arr[1:])
                    continue
                iu, ju = np.triu_indices(n, k=1)
                srcs.append(arr[iu])
                dsts.append(arr[ju])
            if srcs:
                flat = pd.DataFrame(
                    {"src": np.concatenate(srcs), "dst": np.concatenate(dsts)}
                )
                yield (
                    flat.groupby(["src", "dst"], sort=False)
                    .size()
                    .rename("cnt")
                    .reset_index()
                )
            else:
                yield pd.DataFrame(
                    {"src": pd.Series(dtype="int64"),
                     "dst": pd.Series(dtype="int64"),
                     "cnt": pd.Series(dtype="int64")}
                )

    pairs = lists.mapInPandas(
        gen_pairs_counted, schema="src long, dst long, cnt long"
    )
    cc_enc = (
        pairs.groupBy("src", "dst")
        .agg(F.sum("cnt").cast("double").alias("weight"))
        .withColumn("etype", F.lit("co_commit"))
    )
    d_src = dic.select(F.col("vkey").alias("src"), F.col("id").alias("__sid"))
    d_dst = dic.select(F.col("vkey").alias("dst"), F.col("id").alias("__did"))
    pl_enc = (
        pl.join(d_src, "src").join(d_dst, "dst")
        .select(
            F.col("__sid").alias("src"), F.col("__did").alias("dst"),
            "weight", "etype",
        )
    )
    edges = cc_enc.unionByName(pl_enc)
    return edges, dic, stamped


def extract_graph(corpus: DataFrame, impl: str = "arrow") -> tuple[DataFrame, DataFrame]:
    """Full extraction: returns (edges, stamped_corpus).

    edges: canonical (src<dst) string-keyed union of co-commit + path-link.
    stamped_corpus: the exact rows read, with content_sha — callers verify
    sha-set equality against the pre-extraction stamp (input_hint invariant).
    """
    stamped = with_content_sha(corpus)
    cc = co_commit_edges(stamped.select("repo", "path", "commit"), impl=impl)
    pl = path_link_edges(stamped.select("repo", "path"))
    edges = cc.unionByName(pl)
    return edges, stamped


def content_reference_edges(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    group: int = 1,
) -> DataFrame:
    """(src, ref) — content-reference extraction: every capture-group
    match of ``pattern`` inside ``text_col`` becomes a directed reference
    edge from the containing row.  The generic kernel behind the north
    star's "path-link extraction" when links live IN the content (import
    statements, include paths, wiki-style mentions) rather than in the
    path hierarchy (path_link_edges above covers that case).

    Plan shape: one JVM ``regexp_extract_all`` scan (whole-stage codegen,
    no Python) + explode — embarrassingly parallel, no shuffle; callers
    resolve ``ref`` against a vertex table (equi-join) and dedup.  At
    100TB this is the same scan-side shape as co_commit's group-agg
    input: the regex never leaves the scan stage.
    """
    refs = F.regexp_extract_all(
        F.col(text_col), F.lit(pattern), F.lit(group)
    )
    return df.select(
        F.col(id_col).alias("src"), F.explode(refs).alias("ref")
    )
