"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design:
- exact:    one hash-groupBy (sha256) — the only full-shuffle; at 100TB the
            digest (64B) shuffles, never the content.
- minhash:  per-doc signatures are computed scan-side with JVM built-ins
            (transform/array_min/xxhash64 — whole-stage codegen, no Python);
            LSH banding turns near-dup search into an equi-join on
            (band, band_hash) buckets, so cost ~ bucket collisions, not n^2.
- ngram-jaccard: exact verification kernel — run on LSH candidates at scale;
            the all-pairs form (cross join) exists for oracle-checkable
            small-scale validation.
- simhash:  64-bit signature via numpy bit-packing in an Arrow UDF;
            hamming-radius bucketing by 16-bit chunks (Charikar/Manku-style).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from plato_spark.functions.text import TOKEN_RE, portable_h1, portable_h2


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content digest.

    Returns (keeper_id, dup_count, content_sha) — one row per distinct
    content, keeper = min id (deterministic).
    """
    return (
        df.select(F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(
            F.min("id").alias("keeper_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
        .select("keeper_id", "dup_count", "content_sha")
    )


def _token_shingles(text_col: str, n: int):
    """Distinct word n-gram shingles as a sorted array (JVM-side)."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    cnt = F.size(toks)
    grams = F.when(
        cnt >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), cnt - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return grams


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity >= threshold between document pairs.

    candidates: optional (a, b) pair table (e.g. from minhash_lsh_candidates)
    — without it, all pairs are compared (small-scale/oracle mode only).
    Returns (a, b, jaccard) with a < b, jaccard rounded to 6dp.
    """
    sh = df.select(
        F.col(id_col).alias("id"), _token_shingles(text_col, n).alias("sh")
    )
    left = sh.select(F.col("id").alias("a"), F.col("sh").alias("sha_"))
    right = sh.select(F.col("id").alias("b"), F.col("sh").alias("shb_"))
    if candidates is not None:
        pairs = candidates.join(left, "a").join(right, "b")
    else:
        pairs = left.crossJoin(right).where(F.col("a") < F.col("b"))
    inter = F.size(F.array_intersect("sha_", "shb_"))
    union = F.size("sha_") + F.size("shb_") - inter
    jac = F.round(inter / F.greatest(union, F.lit(1)), 6)
    return (
        pairs.select("a", "b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array<long>) — minhash signature, all JVM built-ins.

    Plan shape: explode shingles once, then ``num_hashes`` min-aggregates in
    a single pass (map-side combined). The naive nested-transform form
    re-tokenizes the document once PER HASH inside the lambda (measured 40s
    for 500 docs); this form tokenizes once (sub-second).

    hash_impl: "xxhash64" (fastest; seeded family, Spark-specific) or
    "portable" (md5-based Kirsch-Mitzenmacher family h1 + i*h2 — bit-equal
    in DuckDB SQL, so the LSH pipeline is value-checkable by an oracle).
    """
    sh_rows = df.select(
        F.col(id_col).alias("id"),
        F.explode(_token_shingles(text_col, n)).alias("s"),
    )
    if hash_impl == "portable":
        sh_rows = sh_rows.select(
            "id", portable_h1(F.col("s")).alias("__b1"),
            portable_h2(F.col("s")).alias("__b2"),
        )
        aggs = [
            F.min(F.col("__b1") + F.lit(i) * F.col("__b2")).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(F.xxhash64("s", F.lit(i))).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    sigs = sh_rows.groupBy("id").agg(*aggs)
    return sigs.select(
        "id", F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("sig")
    )


def banded_rows(
    sigs: DataFrame,
    num_hashes: int,
    bands: int,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """(id, band, bucket) — one LSH band-bucket membership row per doc
    per band, from a (id, sig: array<bigint>) signature table.  Shared
    by the batch candidate join and the streaming index
    (streaming/lsh_stream): the bucket key is the raw comma-joined band
    slots for hash_impl='portable' (joins equal iff slots equal — no
    engine-specific hash in the key) or an xxhash64 of it for the
    narrower fast-path shuffle key."""
    rows_per_band = num_hashes // bands

    def _bucket(b):
        slot_str = F.concat_ws(
            ",",
            F.transform(
                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                lambda v: v.cast("string"),
            ),
        )
        return slot_str if hash_impl == "portable" else F.xxhash64(slot_str).cast("string")

    return sigs.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def minhash_lsh_candidates(
    df: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Near-dup candidate pairs (a < b) via MinHash + LSH banding.

    Two docs collide when any band (num_hashes/bands consecutive signature
    slots) matches exactly. Shuffle key = (band, hash-or-concat of band
    slots): candidate generation is a self-equi-join on the bucket key —
    linear in collisions. Dedup across bands keeps one row per pair.
    hash_impl="portable" makes both the signatures and the bucket key
    engine-portable (oracle-checkable); "xxhash64" is the fast default.
    """
    sigs = minhash_signatures(df, num_hashes, n, text_col, id_col, hash_impl)
    banded = banded_rows(sigs, num_hashes, bands, hash_impl)
    lhs = banded.select("band", "bucket", F.col("id").alias("a"))
    rhs = banded.select("band", "bucket", F.col("id").alias("b"))
    return (
        lhs.join(rhs, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def near_dup_clusters(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_lsh: bool = True,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate CLUSTERS: candidate pairs (MinHash-LSH at scale, or
    all-pairs for oracle mode) -> exact n-gram Jaccard verification ->
    connected components over the dup graph -> canonical keeper per doc.

    This is the full training-data dedup pipeline: the similarity join
    produces an edge table and the graph engine (algos/wcc hash-min) closes
    transitive duplicate chains — doc A~B, B~C dedup to one keeper even when
    A~C is below threshold. Returns (doc_id, keeper_id) for every document
    that belongs to a near-dup cluster (singletons omitted).
    """
    from plato_spark.algos.wcc import connected_components

    candidates = minhash_lsh_candidates(
        df, n=n, text_col=text_col, id_col=id_col, hash_impl=hash_impl
    ) if use_lsh else None
    pairs = ngram_jaccard_pairs(
        df, threshold=threshold, n=n, text_col=text_col, id_col=id_col,
        candidates=candidates,
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    comp = connected_components(edges)
    return comp.select(
        F.col("id").alias("doc_id"), F.col("component").alias("keeper_id")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 56,
) -> DataFrame:
    """(a, b, hamming) near-dup pairs with hamming(simhash) <= max_hamming.

    Scale path for the simhash family (pairs with minhash_lsh_candidates):
    the signature is split into max_hamming+1 contiguous bit blocks; by
    pigeonhole, any pair within the hamming budget agrees EXACTLY on at
    least one block, so a per-block equi-join has perfect recall and the
    single JVM ``bit_count(xor)`` verification removes false positives.
    Shuffle volume = (max_hamming+1) rows per doc — linear, no crossJoin;
    the all-pairs DuckDB oracle over the same portable signatures checks
    the banding end-to-end (identical result set iff recall is exact).

    Skew note: byte-identical documents share a signature and land in the
    same buckets, so run exact dedup first at scale (curation.curate_corpus
    stages it that way); empty docs all carry signature 0 and would
    otherwise form one quadratic bucket.
    """
    bands = max_hamming + 1
    sigs = simhash_signatures_portable(df, text_col, id_col, bits)
    base, rem = divmod(bits, bands)
    blocks: list[tuple[int, int]] = []
    start = 0
    for b in range(bands):
        w = base + (1 if b < rem else 0)
        blocks.append((start, w))
        start += w
    banded = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", s)
                    .bitwiseAND(F.lit((1 << w) - 1))
                    .alias("key"),
                )
                for b, (s, w) in enumerate(blocks)
            ])
        ).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.key")
    lhs = banded.select(
        "band", "key", F.col("id").alias("a"), F.col("simhash").alias("sa")
    )
    rhs = banded.select(
        "band", "key", F.col("id").alias("b"), F.col("simhash").alias("sb")
    )
    return (
        lhs.join(rhs, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """(id, simhash: long) — Charikar simhash over token hashes (Arrow UDF).

    Vectorized: per batch, token streams are hashed with a stable 64-bit mix
    and bit-majority-voted in one numpy pass.
    """

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import re

        tok_re = re.compile(TOKEN_RE)
        n_docs = len(texts)
        out = np.zeros(n_docs, dtype=np.uint64)
        tok_lists = [tok_re.findall(t) for t in texts.fillna("")]
        tok_counts = np.fromiter((len(t) for t in tok_lists), np.int64, n_docs)
        n_tok = int(tok_counts.sum())
        if n_tok == 0:
            return pd.Series(out.view(np.int64))
        enc = [tok.encode() for toks in tok_lists for tok in toks]
        lens = np.fromiter((len(b) for b in enc), np.int64, n_tok)
        max_len = int(lens.max())
        flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
        offs = np.zeros(n_tok, dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        # stable 64-bit FNV-1a, vectorized ACROSS tokens: one fused
        # xor-multiply per byte position (uint64 wraparound == `& mask`).
        # Byte positions are processed in fixed-width chunks so peak extra
        # memory is bounded at |alive tokens| x CHUNK, not n_tok x max_len:
        # one pathological megabyte-long token no longer inflates a dense
        # padding matrix (values are bit-identical to the unchunked pass).
        CHUNK = 64
        h = np.full(n_tok, 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for c0 in range(0, max_len, CHUNK):
            idx = np.nonzero(lens > c0)[0]
            if idx.size == 0:
                break
            width = min(CHUNK, max_len - c0)
            pos = np.arange(c0, c0 + width, dtype=np.int64)
            sub_lens = lens[idx]
            valid = pos[None, :] < sub_lens[:, None]
            buf = np.zeros((idx.size, width), dtype=np.uint64)
            buf[valid] = flat[(offs[idx][:, None] + pos[None, :])[valid]]
            hh = h[idx]
            for p in range(width):
                m = sub_lens > c0 + p
                hh[m] = (hh[m] ^ buf[m, p]) * prime
            h[idx] = hh
        bits_matrix = (
            (h[:, None] >> np.arange(bits, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int64)
        doc_starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(tok_counts[:-1], out=doc_starts[1:])
        nonempty = tok_counts > 0
        votes = np.zeros((n_docs, bits), dtype=np.int64)
        votes[nonempty] = np.add.reduceat(
            bits_matrix, doc_starts[nonempty], axis=0
        )
        votes = votes * 2 - tok_counts[:, None]
        weights = (np.uint64(1) << np.arange(bits, dtype=np.uint64))
        sigs = ((votes > 0).astype(np.uint64) * weights).sum(axis=1)
        out[nonempty] = sigs[nonempty]
        return pd.Series(out.view(np.int64))

    return df.select(F.col(id_col).alias("id"), _simhash(F.col(text_col)).alias("simhash"))


def simhash_signatures_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 56
) -> DataFrame:
    """(id, simhash: long) — Charikar simhash, all JVM built-ins AND
    engine-portable (md5-based 56-bit token hash, oracle-checkable).

    Plan shape mirrors minhash: explode tokens once, one groupBy(id) with
    ``bits`` sum-aggregates (map-side combined — each partition reduces its
    token stream to one 56-counter row per doc before the shuffle), then a
    single bit-pack projection. Docs with no tokens get signature 0.
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    tok_rows = df.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("t")
    ).select("id", portable_h1(F.col("t")).alias("h"))
    aggs = [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"__v{b}")
        for b in range(bits)
    ]
    votes = tok_rows.groupBy("id").agg(*aggs)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"__v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    voted = votes.select("id", sig.cast("long").alias("simhash"))
    base = df.select(F.col(id_col).alias("id"))
    return base.join(voted, "id", "left").select(
        "id", F.coalesce("simhash", F.lit(0)).cast("long").alias("simhash")
    )


def contamination_check(
    train: DataFrame,
    evalset: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(train_id, n_shared, n_eval_docs) — benchmark-contamination scan:
    for every training document that shares at least one word ``n``-gram
    with ANY held-out/eval document, the number of distinct shared
    shingles and the number of distinct eval documents hit.

    The standard decontamination step of a training-data pipeline (drop or
    flag train docs that textually overlap the eval benchmark). Word
    8-grams are the common operating point (long enough that collisions
    are meaningful overlap, short enough to catch partial copies).

    Plan shape: shingle both sides JVM-side (same ``_token_shingles``
    kernel as the dedup family), hash each shingle to a 56-bit portable
    long so the equi-join shuffles fixed-width keys instead of strings,
    then one join + one map-side-combined groupBy(train_id). The eval side
    is typically a tiny fraction of the corpus — Catalyst/AQE broadcasts
    it when it fits; at 100 TB with a big eval set it degrades to a plain
    shuffle hash join on the 8-byte key. Production would use a 128-bit
    hash for collision headroom; 56-bit is chosen here because the same
    value is reproducible in the DuckDB oracle (portable_h1), making the
    whole check value-verifiable.
    """
    def _shingle_hashes(df: DataFrame, out_id: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(out_id),
                F.explode(_token_shingles(text_col, n)).alias("s"),
            )
            .select(out_id, portable_h1(F.col("s")).alias("h"))
            .distinct()
        )

    tr = _shingle_hashes(train, "train_id")
    ev = _shingle_hashes(evalset, "eval_id")
    return (
        tr.join(ev, "h")
        .groupBy("train_id")
        .agg(
            F.count_distinct("h").cast("long").alias("n_shared"),
            F.count_distinct("eval_id").cast("long").alias("n_eval_docs"),
        )
    )


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric shingle containment — (contained, container, containment)
    for DIRECTED pairs where |S(a) ∩ S(b)| / |S(a)| >= threshold, a != b.

    Broder's containment measure (1997, "On the resemblance and
    containment of documents"): symmetric Jaccard misses subset
    duplication — a short document quoted wholesale inside a long one
    scores low Jaccard but containment ~1.  This is the quote/boilerplate
    leg of the dedup family, same shingle machinery and the same
    LSH-candidate feeding contract as ngram_jaccard_pairs (without
    ``candidates`` it is the exact all-pairs baseline, oracle mode only;
    note banded minhash-LSH recalls high-JACCARD pairs — asymmetric
    containment with a small |S(a)| can evade it, so at scale feed
    candidates from a shingle-prefix index or accept Jaccard-gated
    recall).
    """
    sh = df.select(
        F.col(id_col).alias("id"), _token_shingles(text_col, n).alias("sh")
    )
    left = sh.select(F.col("id").alias("a"), F.col("sh").alias("sha_"))
    right = sh.select(F.col("id").alias("b"), F.col("sh").alias("shb_"))
    if candidates is not None:
        # distinct: callers may pass candidates already carrying both
        # orientations — without it each directed pair emits twice
        both = candidates.unionByName(
            candidates.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
        pairs = both.join(left, "a").join(right, "b")
    else:
        pairs = left.crossJoin(right).where(F.col("a") != F.col("b"))
    inter = F.size(F.array_intersect("sha_", "shb_"))
    cont = F.round(inter / F.greatest(F.size("sha_"), F.lit(1)), 6)
    return (
        pairs.select(
            F.col("a").alias("contained"),
            F.col("b").alias("container"),
            cont.alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def source_shingle_overlap(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source_a, source_b, shared, n_a, n_b, containment) — the
    cross-source contamination MATRIX: for every source pair, the number
    of distinct word ``n``-gram shingles they share and the containment
    ratio shared/min(|A|,|B|).

    The corpus-curation sibling of contamination_check (train-vs-eval):
    before mixing sources into a training blend you want to know which
    pairs are textually entangled (mirrors, scrapes of each other,
    shared boilerplate) so the mixing weights don't double-count.

    Plan shape: shingle JVM-side, hash to the portable 56-bit long, ONE
    distinct per (source, h) — the per-source shingle SET — then a
    self-equi-join on the 8-byte hash and a groupBy over at most
    |sources|^2 pairs.  The join's fan-out per hash is bounded by the
    source count (each h appears at most once per source after the
    distinct), so the shuffle is |distinct shingles| x small, never
    quadratic in documents.  Exact integers + one rounded division.
    """
    sh = (
        df.select(
            F.col(source_col).alias("s_"),
            F.explode(_token_shingles(text_col, n)).alias("g"),
        )
        .select("s_", portable_h1(F.col("g")).alias("h"))
        .distinct()
    )
    sh = sh.persist()
    sizes = sh.groupBy("s_").agg(F.count("*").cast("long").alias("n"))
    a = sh.select(F.col("s_").alias("source_a"), "h")
    b = sh.select(F.col("s_").alias("source_b"), "h")
    pairs = (
        a.join(b, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("shared"))
    )
    out = (
        pairs.join(sizes.select(F.col("s_").alias("source_a"),
                                F.col("n").alias("n_a")), "source_a")
        .join(sizes.select(F.col("s_").alias("source_b"),
                           F.col("n").alias("n_b")), "source_b")
        .select(
            "source_a", "source_b", "shared", "n_a", "n_b",
            F.round(
                F.col("shared").cast("double")
                / F.least("n_a", "n_b").cast("double"),
                6,
            ).alias("containment"),
        )
    )
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def shingle_novelty(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_shingles, n_novel, novelty) — per document, how many of its
    distinct word ``n``-gram shingles appear in NO lower-id document, and
    the novel fraction.

    The incremental-crawl curation signal (FineWeb/Dolma-style "what does
    this snapshot add on top of what we already have"): documents are
    ordered by id (ingest order); a shingle is *novel* for the earliest
    document that contains it.  A doc whose novelty ~ 0 is pure re-crawl
    and can be dropped before any expensive downstream stage.

    Plan shape: shingles built JVM-side (same ``_token_shingles`` kernel
    as the contamination family, <n-token docs fall back to one whole-doc
    shingle), hashed to the portable 56-bit long, ONE distinct over
    (id, h) — then a min-aggregation per h (map-side combined: only one
    (h, min_id) row per distinct shingle shuffles) and a rebroadcastless
    equi-join back on h.  No stage is quadratic; the join fan-out per h
    equals the shingle's doc frequency, which is exactly the data the
    operator measures.  Exact integers + one rounded division.
    """
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(_token_shingles(text_col, n)).alias("g"),
        )
        .select("id", portable_h1(F.col("g")).alias("h"))
        .distinct()
    )
    sh = sh.persist()
    first = sh.groupBy("h").agg(F.min("id").alias("first_id"))
    per = (
        sh.join(first, "h")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("id") == F.col("first_id"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
    )
    out = per.select(
        "id", "n_shingles", "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_shingles").cast("double"),
            6,
        ).alias("novelty"),
    )
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def edit_distance_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    hash_impl: str = "portable",
) -> DataFrame:
    """(a, b, edit_sim) — candidate near-dup pairs VERIFIED by character
    edit similarity 1 - lev(a,b)/max(|a|,|b|), kept when >= threshold.

    The character-level verifier beside the token-level Jaccard and
    containment checks: shingle measures miss single-character template
    edits (version bumps, id substitutions) that Levenshtein counts
    exactly — the right final gate before dropping a near-dup at
    curation time.  Candidates default to the MinHash-LSH feed (the
    same candidate-feeding contract as containment_pairs — NEVER
    all-pairs); lev runs only on the collided pairs, JVM-side
    (F.levenshtein, O(|a|*|b|) per pair — at 100x, cap or chunk
    documents beyond ~10k chars before this gate; the sf corpora are
    <600 chars).

    Portability: Spark's levenshtein counts CHARACTERS while DuckDB's
    counts BYTES — identical on ASCII corpora (the test corpus is
    verified all-ASCII); for multi-byte text the oracle would need a
    byte-cast mirror.  Exact integer distance, one rounded division.
    """
    if candidates is None:
        candidates = minhash_lsh_candidates(
            df, text_col=text_col, id_col=id_col, hash_impl=hash_impl
        )
    t = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    j = (
        candidates.join(
            t.select(F.col("id").alias("a"), F.col("txt").alias("ta")), "a"
        )
        .join(t.select(F.col("id").alias("b"), F.col("txt").alias("tb")), "b")
    )
    sim = F.round(
        1.0
        - F.levenshtein("ta", "tb").cast("double")
        / F.greatest(F.length("ta"), F.length("tb"), F.lit(1)),
        6,
    )
    return (
        j.select("a", "b", sim.alias("edit_sim"))
        .where(F.col("edit_sim") >= threshold)
    )


def snm_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    key_chars: int = 24,
) -> DataFrame:
    """(a, b) — sorted-neighborhood candidate pairs (Hernández &
    Stolfo 1995): sort the corpus by a normalized prefix key and pair
    every two records within ``window`` positions of each other.  The
    third blocking family beside MinHash-LSH (content shingles) and
    SimHash (bit sketches): SNM catches prefix-anchored near-dups —
    boilerplate headers, templated titles — that hash blocking scatters.

    Distributed sort without a single-partition window: the global rank
    comes from graph/edges.build_dictionary (range-partition + in-
    partition sort + one offsets job, the vid-encoder idiom).  The
    sliding window is then TWO offset bucketings of width 2(w-1): any
    pair at rank distance <= w-1 shares a bucket in at least one of
    them (if a 2d-boundary m·2d separates the ranks, both land in
    offset-bucket m), so the equi-join per bucketing + a rank-distance
    filter is EXACT — no cross-partition boundary cases, no skew beyond
    2(w-1)-row buckets.  Output canonical (a < b by id), deduped.
    """
    assert window >= 2
    d = window - 1
    from plato_spark.graph.edges import build_dictionary
    from plato_spark.graph.partitioning import auto_shuffle_partitions

    key = F.substring(
        F.lower(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9]", "")),
        1,
        key_chars,
    )
    verts = df.select(
        F.struct(key.alias("k"), F.col(id_col).alias("did")).alias("vkey")
    ).distinct()
    n_part = auto_shuffle_partitions(df.sparkSession, df.count())
    ranked = build_dictionary(verts, n_part).select(
        F.col("id").alias("rk"), F.col("vkey.did").alias("doc")
    )

    def bucket_pairs(expr):
        b = ranked.withColumn("bk", F.floor(expr))
        lhs = b.select("bk", F.col("rk").alias("r1"), F.col("doc").alias("d1"))
        rhs = b.select("bk", F.col("rk").alias("r2"), F.col("doc").alias("d2"))
        return (
            lhs.join(rhs, "bk")
            .where((F.col("r2") > F.col("r1")) & (F.col("r2") - F.col("r1") <= d))
            .select("d1", "d2")
        )

    cands = bucket_pairs(F.col("rk") / F.lit(2 * d)).unionByName(
        bucket_pairs((F.col("rk") + d) / F.lit(2 * d))
    )
    return cands.select(
        F.least("d1", "d2").alias("a"), F.greatest("d1", "d2").alias("b")
    ).distinct()


def cdc_chunk_stats(
    df: DataFrame,
    k: int = 8,
    mod: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """1 row (n_chunks, distinct_chunks, dup_occurrences,
    reclaimable_chars) — content-defined chunking dedup (the
    LBFS/FastCDC family): cut a document wherever the rolling hash of
    the ``k``-char window starting there satisfies h % ``mod`` == 0,
    then dedup the variable-length chunks by digest.  Unlike the
    fixed-token windows of chunk_dedup, CDC boundaries RESYNCHRONIZE
    after an insertion — a one-line edit changes O(1) chunks, not every
    window downstream — which is why content stores dedup this way.

    Expected chunk length ~``mod`` chars.  Everything per-document is
    JVM higher-order functions (sequence/filter/zip_with/substr — zero
    Python, zero shuffle before the digest groupBy, which map-side
    combines 16-byte md5 keys).  Documents shorter than ``k`` chars are
    one whole chunk; position 1 always starts a chunk.  Exact integer
    accounting: reclaimable = sum over digests of (count-1) * length.
    """
    t = F.col(text_col)
    ln = F.length(t)
    npos = F.greatest(ln - F.lit(k - 1), F.lit(1))
    cuts = F.filter(
        F.sequence(F.lit(1), npos),
        lambda i: (i >= 2)
        & (F.pmod(portable_h1(t.substr(i, F.lit(k))), F.lit(mod)) == 0),
    )
    starts = F.concat(F.array(F.lit(1)), cuts)
    ends = F.concat(
        F.slice(starts, 2, F.size(starts) - 1), F.array(ln + 1)
    )
    chunks = F.zip_with(starts, ends, lambda s, e: t.substr(s, e - s))
    per = df.select(
        F.col(id_col).alias("id"), F.explode(chunks).alias("chunk")
    ).select(F.md5("chunk").alias("dig"), F.length("chunk").alias("clen"))
    groups = per.groupBy("dig").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.max("clen").cast("long").alias("clen"),
    )
    return groups.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("distinct_chunks"),
        F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0))
        .cast("long")
        .alias("dup_occurrences"),
        F.coalesce(F.sum((F.col("cnt") - 1) * F.col("clen")), F.lit(0))
        .cast("long")
        .alias("reclaimable_chars"),
    )


def dedup_apply(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_impl: str = "portable",
) -> DataFrame:
    """(id, keeper_id, keep) — materialize the near-dup verdicts as the
    per-document keep/drop manifest the pipeline actually applies: every
    document keeps its cluster's keeper id (NULL when it never collided
    — singletons are implicit keeps), and ``keep`` is true for keepers
    and singletons.  Downstream: ``WHERE keep`` is the deduplicated
    corpus; the dropped rows carry their keeper for provenance.

    One left join of the corpus ids against the (clustered-docs-only)
    near_dup_clusters table — digests and ids move, never bodies."""
    clusters = near_dup_clusters(
        df, threshold=threshold, n=n, text_col=text_col, id_col=id_col,
        use_lsh=True, hash_impl=hash_impl,
    )
    ids = df.select(F.col(id_col).alias("id"))
    j = ids.join(clusters.select(F.col(id_col).alias("id"),
                                 F.col("keeper_id")), "id", "left")
    return j.select(
        "id", "keeper_id",
        (F.col("keeper_id").isNull()
         | (F.col("keeper_id") == F.col("id"))).alias("keep"),
    )


def minhash_calibration(
    df: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(a, b, n_match, jaccard, est, err) — MinHash ESTIMATOR audit on
    the LSH candidate pairs: matching-slot fraction (the estimate every
    dedup threshold decision trusts) against the TRUE distinct-shingle
    Jaccard, per pair.  E[est] = J, sd ~= sqrt(J(1-J)/64) ~ 0.06 — this
    query is the empirical check that the deployed signature width
    actually delivers that, on THIS corpus (if err spreads wider, the
    hash family or shingling is biased and every threshold is
    miscalibrated).

    Exactness: n_match (0..num_hashes), the shingle intersection and
    the set sizes are all exact integers; the three read-out values are
    single divisions of those integers rounded 6dp.  Scale plan:
    everything is CANDIDATE-FED (the LSH discipline — never all-pairs);
    the true-Jaccard join runs shingles-of-a against shingles-of-b per
    candidate pair, bounded by collision count x doc shingle size.
    Portable hash family throughout, so the oracle is bit-equal."""
    sigs = minhash_signatures(df, num_hashes, n, text_col, id_col,
                              hash_impl="portable")
    banded = banded_rows(sigs, num_hashes, bands, hash_impl="portable")
    lhs = banded.select("band", "bucket", F.col("id").alias("a"))
    rhs = banded.select("band", "bucket", F.col("id").alias("b"))
    cands = (
        lhs.join(rhs, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    matches = (
        cands.join(sigs.select(F.col("id").alias("a"),
                               F.col("sig").alias("sa")), "a")
        .join(sigs.select(F.col("id").alias("b"),
                          F.col("sig").alias("sb")), "b")
        .select(
            "a", "b",
            F.aggregate(
                F.zip_with("sa", "sb",
                           lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            ).alias("n_match"),
        )
    )
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(_token_shingles(text_col, n)).alias("s"),
    ).distinct()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("c"))
    inter = (
        cands.join(sh.select(F.col("id").alias("a"), "s"), "a")
        .join(sh.select(F.col("id").alias("bid"),
                        F.col("s").alias("s2")),
              (F.col("b") == F.col("bid")) & (F.col("s") == F.col("s2")),
              "left_semi")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    return (
        matches.join(inter, ["a", "b"], "left")
        .join(sizes.select(F.col("id").alias("a"),
                           F.col("c").alias("ca")), "a")
        .join(sizes.select(F.col("id").alias("b"),
                           F.col("c").alias("cb")), "b")
        .select(
            "a", "b", "n_match",
            F.round(F.coalesce("i", F.lit(0))
                    / (F.col("ca") + F.col("cb")
                       - F.coalesce("i", F.lit(0))), 6).alias("jaccard"),
            F.round(F.col("n_match") / F.lit(float(num_hashes)), 6)
            .alias("est"),
            F.round(F.col("n_match") / F.lit(float(num_hashes))
                    - F.coalesce("i", F.lit(0))
                    / (F.col("ca") + F.col("cb")
                       - F.coalesce("i", F.lit(0))), 6).alias("err"),
        )
    )


def ppjoin_pairs(
    df: DataFrame,
    threshold_pct: int = 70,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(a, b, inter, size_a, size_b, jaccard) — EXACT token-set
    similarity self-join via PREFIX FILTERING (PPJoin, Xiao et al.
    WWW'08): every pair with Jaccard >= threshold, no LSH recall loss.

    The trick: order each doc's distinct tokens by global rarity
    (df ASC, token ASC — one shared total order), keep only the first
    |d| - ceil(t*|d|) + 1 tokens as the PREFIX, and join on prefix
    tokens only.  Any pair with J >= t MUST share a prefix token
    (pigeonhole over the shared order), so the filter is LOSSLESS —
    which is exactly what the oracle proves, by computing the same
    pairs from the unfiltered all-token join.  Rare-first ordering
    makes prefixes the low-df tokens, so the candidate join fans out
    on the SMALL posting lists — the deterministic complement to
    MinHash-LSH: exact answer, no tuning, at the cost of a verify pass
    per candidate.

    Exactness: the threshold test is the integer cross-multiply
    100*inter >= t_pct*(|a| + |b| - inter); ceil(t*|d|) =
    (t_pct*|d| + 99) div 100.  One rounded division at read-out."""
    from pyspark.sql import Window

    t = int(threshold_pct)
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE),
                                 F.lit(0)))).alias("tk"),
    ).persist()
    dft = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("dfc"))
    sizes = tok.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("sz"))
    w = Window.partitionBy("id").orderBy("dfc", "tk")
    ranked = (
        tok.join(dft, "tk")
        .select("id", "tk", F.row_number().over(w).alias("rn"))
        .join(sizes, "id")
    )
    prefix = ranked.where(
        F.col("rn") <= F.col("sz")
        - F.expr(f"({t} * sz + 99) div 100") + 1)
    cand = (
        prefix.select("tk", F.col("id").alias("a"))
        .join(prefix.select("tk", F.col("id").alias("b")), "tk")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    inter = (
        cand.join(tok.select(F.col("id").alias("a"), "tk"), "a")
        .join(tok.select(F.col("id").alias("bid"),
                         F.col("tk").alias("tk2")),
              (F.col("b") == F.col("bid")) & (F.col("tk") == F.col("tk2")),
              "left_semi")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("a"),
                                F.col("sz").alias("size_a")), "a")
        .join(sizes.select(F.col("id").alias("b"),
                           F.col("sz").alias("size_b")), "b")
        .where(F.col("inter") * 100
               >= F.lit(t) * (F.col("size_a") + F.col("size_b")
                              - F.col("inter")))
        .select("a", "b", "inter", "size_a", "size_b",
                F.round(F.col("inter")
                        / (F.col("size_a") + F.col("size_b")
                           - F.col("inter")), 6).alias("jaccard"))
    )
    return out
