"""Random-walk engine: uniform first-order walks + node2vec second-order.

Reference: /root/reference/plato/engine/walk.hpp (KnightKing-style walker
engine: walkers-as-messages, alias-table O(1) sampling, p/q second-order
bias; opts walk.hpp:54-58) and example/node2vec_randomwalk.cc:38-45.

Spark-native: walkers are rows (walk_id, step, prev, cur, path); each step
joins the walker table with grouped adjacency arrays and picks the next
neighbor. DETERMINISM: the reference seeds mt19937 per thread (not
reproducible); we derive every choice from xxhash64(walk_id, step, seed) so
a walk set is a pure function of (graph, seed) on any partitioning.

- uniform walks: next = nbrs[hash % deg] — all JVM expressions.
- node2vec: per-candidate weights 1/p (back to prev), 1 (distance-1 from
  prev: membership via sorted-array binary search), 1/q (distance-2) —
  weighted pick by one Arrow-batched pandas UDF (cumsum + searchsorted),
  mirroring the alias-table's weighted choice without per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plato_spark.engine.ckpt_blocks import cheap_localCheckpoint
from pyspark.sql.functions import pandas_udf

from plato_spark.graph.partitioning import (
    auto_shuffle_partitions,
    scoped_shuffle_partitions,
)
from plato_spark.functions.text import portable_h1


def _dyadic_exact(v: float, bits: int = 20) -> bool:
    """True if v is an integer multiple of 2**-bits (e.g. 1/p for p in
    0.25, 0.5, 1, 2, 4 ...). Partial sums of such weights are exact in
    float64 up to ~2**(53-bits) terms, so a global cumsum with prefix
    subtraction is bitwise identical to per-row accumulation."""
    return float(v * (1 << bits)).is_integer()


def _step_uniform(walk_id_col, step: int, seed: int, hash_impl: str):
    """Deterministic per-(walker, step) uniform draw in [0, 1).

    hash_impl="xxhash64" (fast default) or "portable" (md5-based, bit-equal
    in DuckDB SQL so walk queries are value-checkable by an oracle).
    """
    if hash_impl == "portable":
        h = portable_h1(
            F.concat_ws("|", walk_id_col, F.lit(step), F.lit(seed))
        )
    else:
        h = F.xxhash64(walk_id_col, F.lit(step), F.lit(seed))
    return F.pmod(h, F.lit(1_000_003)) / F.lit(1_000_003.0)


def _adjacency(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("src").alias("cur")).agg(
        F.sort_array(F.collect_set("dst")).alias("nbrs")
    )


def metapath_walks(
    edges: DataFrame,
    metapath: list[str],
    walk_length: int = 10,
    seed: int = 42,
    etype_col: str = "etype",
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Heterogeneous walks constrained to an edge-type pattern.

    Reference analog: plato's hnbbcsr structure + metapath walk engine
    (/root/reference/plato/graph/structure/hnbbcsr.hpp:58-91,
     /root/reference/example/metapath_randomwalk.cc). Step k follows an
    edge of type metapath[k % len(metapath)]; walkers that reach a vertex
    with no matching-type out-edge stop growing. Deterministic (hash-seeded
    like random_walks).

    Returns (walk_id, path: array<long>); one walk per vertex that has at
    least one out-edge of metapath[0].
    """
    spark = edges.sparkSession
    e0 = edges.select("src", "dst", F.col(etype_col).alias("et")).persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_e)
    # one adjacency table per edge type (hnbbcsr's per-type buckets)
    adj_by_type = {
        t: e0.where(F.col("et") == t)
        .groupBy(F.col("src").alias("cur"))
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .repartition(shuffle_n, "cur")
        .persist()
        for t in metapath
    }
    for a in adj_by_type.values():
        a.count()

    starts = adj_by_type[metapath[0]].select(F.col("cur").alias("id"))
    walkers = starts.select(
        F.col("id").alias("walk_id"),
        F.col("id").alias("cur"),
        F.array(F.col("id")).alias("path"),
        F.lit(False).alias("stopped"),
    )
    with scoped_shuffle_partitions(spark, shuffle_n):
        for step in range(1, walk_length):
            adj = adj_by_type[metapath[(step - 1) % len(metapath)]]
            u = _step_uniform(F.col("walk_id"), step, seed, hash_impl)
            j = walkers.join(adj, "cur", "left")
            nxt = F.when(
                F.col("stopped") | F.col("nbrs").isNull(), F.lit(None).cast("long")
            ).otherwise(
                F.element_at(
                    "nbrs",
                    (F.pmod((u * F.size("nbrs")).cast("long"), F.size("nbrs")) + 1
                     ).cast("int"),
                )
            )
            walkers = j.select(
                "walk_id",
                F.coalesce(nxt, F.col("cur")).alias("cur"),
                F.when(nxt.isNull(), F.col("path"))
                .otherwise(F.concat("path", F.array(nxt)))
                .alias("path"),
                (F.col("stopped") | nxt.isNull()).alias("stopped"),
            ).transform(cheap_localCheckpoint)
    e0.unpersist()
    return walkers.select("walk_id", "path")


def _ranked_segment_adjacency(e0: DataFrame, cap: int) -> DataFrame:
    """(cur, seg, deg, nbrs) — out-neighbors in globally sorted order split
    into contiguous rank segments of at most ``cap`` entries, so a
    10^7-degree hub becomes ceil(d/cap) bounded rows (SURVEY §7.4.3). The
    walker's pick r = floor(u*deg) addresses segment r//cap at offset
    r%cap — bitwise the same neighbor the one-array plan picks."""
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy("dst")
    ranked = (
        e0.select("src", "dst").distinct()
        .withColumn("__r", F.row_number().over(w) - 1)
        .withColumn("__seg", (F.col("__r") / cap).cast("int"))
    )
    return (
        ranked.groupBy(F.col("src").alias("cur"), F.col("__seg").alias("seg"))
        .agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs"),
            F.count("*").alias("__segn"),
        )
        .withColumn(
            "deg",
            F.sum("__segn").over(
                Window.partitionBy("cur").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .drop("__segn")
    )


def _random_walks_segmented(
    e0: DataFrame,
    walk_length: int,
    walks_per_vertex: int,
    seed: int,
    hash_impl: str,
    cap: int,
    shuffle_n: int,
) -> DataFrame:
    """Hub-capped first-order walk loop — same picks as the one-array plan
    (r-th smallest distinct out-neighbor, r = pmod(floor(u*deg), deg)),
    addressed as (segment r//cap, offset r%cap)."""
    spark = e0.sparkSession
    seg_adj = (
        _ranked_segment_adjacency(e0, cap).repartition(shuffle_n, "cur").persist()
    )
    seg_adj.count()
    deg_tbl = seg_adj.select("cur", "deg").distinct().persist()

    verts = (
        e0.select(F.col("src").alias("id"))
        .unionByName(e0.select(F.col("dst").alias("id")))
        .distinct()
    )
    walkers = verts.crossJoin(
        spark.range(walks_per_vertex).select(F.col("id").alias("w"))
    ).select(
        (F.col("id") * walks_per_vertex + F.col("w")).alias("walk_id"),
        F.col("id").alias("cur"),
        F.array(F.col("id")).alias("path"),
    ).persist()
    walkers.count()
    e0.unpersist()

    with scoped_shuffle_partitions(spark, shuffle_n):
        for step in range(1, walk_length):
            u = _step_uniform(F.col("walk_id"), step, seed, hash_impl)
            j = walkers.join(deg_tbl, "cur", "left").select(
                "walk_id", "cur", "path",
                F.when(
                    F.col("deg").isNull(), F.lit(None).cast("long")
                ).otherwise(
                    F.pmod((u * F.col("deg")).cast("long"), F.col("deg"))
                ).alias("__r"),
            )
            j = j.withColumn("seg", (F.col("__r") / cap).cast("int"))
            j2 = j.join(
                seg_adj.select("cur", "seg", "nbrs"), ["cur", "seg"], "left"
            )
            nxt = F.when(
                F.col("__r").isNull() | F.col("nbrs").isNull(),
                F.lit(None).cast("long"),
            ).otherwise(
                F.element_at(
                    "nbrs", (F.col("__r") - F.col("seg") * cap + 1).cast("int")
                )
            )
            new_walkers = j2.select(
                "walk_id",
                F.coalesce(nxt, F.col("cur")).alias("cur"),
                F.when(nxt.isNull(), F.col("path"))
                .otherwise(F.concat("path", F.array(nxt)))
                .alias("path"),
            ).transform(cheap_localCheckpoint)
            walkers.unpersist()
            walkers = new_walkers
    return walkers.select("walk_id", "path")


def random_walks(
    edges: DataFrame,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    seed: int = 42,
    p: float | None = None,
    q: float | None = None,
    hash_impl: str = "xxhash64",
    hub_cap: int | None = None,
) -> DataFrame:
    """(walk_id, path: array<long>) — walks from every vertex, directed edges.

    p/q set => node2vec second-order bias (walk.hpp / node2vec example);
    both None => uniform first-order. Walks stop early at sinks.

    hub_cap (first-order only): bound any adjacency row to ``hub_cap``
    neighbors via contiguous rank segments — picks are identical to the
    one-array plan (same sorted order, same index), but no row blows up on
    a hub. Two co-partitioned joins per step instead of one.
    """
    spark = edges.sparkSession
    e0 = edges.select("src", "dst").persist()
    n_e = e0.count()
    shuffle_n = auto_shuffle_partitions(spark, n_e)
    second_order_req = p is not None or q is not None
    if hub_cap is not None:
        if second_order_req:
            raise ValueError(
                "hub_cap supports first-order walks only (the biased pick "
                "needs the full candidate set per row)"
            )
        return _random_walks_segmented(
            e0, walk_length, walks_per_vertex, seed, hash_impl,
            hub_cap, shuffle_n,
        )
    adj = _adjacency(e0).repartition(shuffle_n, "cur").persist()
    adj.count()
    second_order = p is not None or q is not None
    p = p if p is not None else 1.0
    q = q if q is not None else 1.0

    verts = (
        e0.select(F.col("src").alias("id"))
        .unionByName(e0.select(F.col("dst").alias("id")))
        .distinct()
    )
    walkers = verts.crossJoin(
        spark.range(walks_per_vertex).select(F.col("id").alias("w"))
    ).select(
        (F.col("id") * walks_per_vertex + F.col("w")).alias("walk_id"),
        F.col("id").alias("cur"),
        F.lit(None).cast("long").alias("prev"),
        F.array(F.col("id")).alias("path"),
    ).persist()
    walkers.count()
    e0.unpersist()

    if second_order:
        # The global-cumsum-minus-prefix pick below is bitwise identical to
        # a per-row np.cumsum (what the DuckDB oracle mirrors) ONLY when
        # every weight is a low-bit dyadic rational — then every partial sum
        # is exact and no float rounding can flip a pick at a bucket
        # boundary. For general p/q we keep the flattening but run the
        # cumsum per segment, which matches the oracle for any weights.
        global_cumsum_exact = _dyadic_exact(1.0 / p) and _dyadic_exact(1.0 / q)

        @pandas_udf("long")
        def pick_biased(nbrs: pd.Series, prev: pd.Series, prev_nbrs: pd.Series,
                        u: pd.Series) -> pd.Series:
            # Fully vectorized per Arrow batch (no per-row Python): flatten
            # all candidate arrays, compute weights segment-wise, pick with a
            # single global cumsum + searchsorted. Same pattern as the SpMV
            # kernel in graph/csr.py.
            n = len(nbrs)
            cand_list = [
                np.asarray(a, dtype=np.int64) if a is not None else
                np.empty(0, dtype=np.int64)
                for a in nbrs.values
            ]
            lens = np.fromiter((len(a) for a in cand_list), np.int64, n)
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            total = int(offs[-1])
            out = np.zeros(n, dtype=np.int64)
            if total == 0:
                return pd.Series(out)
            cand = np.concatenate(cand_list)
            row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
            uu = u.to_numpy(dtype=np.float64)
            has_prev = (~pd.isna(prev)).to_numpy()
            pn_list = [
                np.asarray(a, dtype=np.int64) if a is not None else
                np.empty(0, dtype=np.int64)
                for a in prev_nbrs.values
            ]
            pn_has = np.fromiter(
                (a is not None for a in prev_nbrs.values), bool, n
            )
            pn_lens = np.fromiter((len(a) for a in pn_list), np.int64, n)
            pn_flat = (
                np.concatenate(pn_list) if pn_lens.sum() > 0
                else np.empty(0, dtype=np.int64)
            )

            w = np.full(total, 1.0 / q)
            if len(pn_flat) > 0:
                # membership of cand[i] in its row's sorted prev_nbrs via one
                # global searchsorted over row-keyed values (key = v + row*M)
                m = int(max(cand.max(), pn_flat.max())) + 1
                if m * n < 2**62:
                    cand_key = cand + row_of * m
                    pn_key = pn_flat + np.repeat(
                        np.arange(n, dtype=np.int64), pn_lens
                    ) * m
                    idx = np.searchsorted(pn_key, cand_key)
                    in_pn = np.zeros(total, dtype=bool)
                    ok = idx < len(pn_key)
                    in_pn[ok] = pn_key[idx[ok]] == cand_key[ok]
                else:  # keyed ids would overflow int64 — per-row fallback
                    in_pn = np.zeros(total, dtype=bool)
                    for i in range(n):
                        s, e = offs[i], offs[i + 1]
                        pni = pn_list[i]
                        if e > s and len(pni) > 0:
                            ix = np.searchsorted(pni, cand[s:e]).clip(
                                0, len(pni) - 1
                            )
                            in_pn[s:e] = pni[ix] == cand[s:e]
                w[in_pn] = 1.0
            prev_f = np.where(has_prev, pd.to_numeric(prev).to_numpy(
                dtype=np.float64, na_value=np.nan), np.nan)
            w[cand == np.repeat(prev_f, lens)] = 1.0 / p

            nonempty = lens > 0
            lo = offs[:-1]
            hi = np.maximum(offs[1:] - 1, lo)
            if global_cumsum_exact:
                c = np.cumsum(w)
                pfx = np.concatenate([[0.0], c])
                prefix = pfx[offs[:-1]]
                totals = pfx[offs[1:]] - prefix
                target = prefix + uu * totals
                pos = np.searchsorted(c, target, side="right")
                pos = np.clip(pos, lo, hi)
            else:
                # per-segment cumsum: float-exact match of the per-row
                # oracle for arbitrary p/q (slower; only non-dyadic params)
                pos = lo.copy()
                for i in np.nonzero(nonempty)[0]:
                    s, e = int(offs[i]), int(offs[i + 1])
                    cw = np.cumsum(w[s:e])
                    j = np.searchsorted(cw, uu[i] * cw[-1], side="right")
                    pos[i] = s + min(int(j), e - s - 1)
            out[nonempty] = cand[pos[nonempty]]
            # rows with no usable prev context fall back to the uniform
            # index pick (bitwise-identical to the first-order formula)
            uni = nonempty & (~has_prev | ~pn_has)
            if uni.any():
                ui = (uu[uni] * lens[uni]).astype(np.int64) % lens[uni]
                out[uni] = cand[offs[:-1][uni] + ui]
            return pd.Series(out)

    with scoped_shuffle_partitions(spark, shuffle_n):
        for step in range(1, walk_length):
            u = _step_uniform(F.col("walk_id"), step, seed, hash_impl)
            j = walkers.join(adj, "cur", "left")
            if second_order:
                prev_adj = adj.select(
                    F.col("cur").alias("prev"), F.col("nbrs").alias("prev_nbrs")
                )
                j = j.join(prev_adj, "prev", "left")
                nxt_col = F.when(
                    F.col("nbrs").isNull(), F.lit(None).cast("long")
                ).otherwise(
                    pick_biased(F.col("nbrs"), F.col("prev"), F.col("prev_nbrs"), u)
                )
            else:
                nxt_col = F.when(
                    F.col("nbrs").isNull(), F.lit(None).cast("long")
                ).otherwise(
                    F.element_at(
                        "nbrs",
                        (F.pmod((u * F.size("nbrs")).cast("long"), F.size("nbrs")) + 1
                         ).cast("int"),
                    )
                )
            new_walkers = j.select(
                "walk_id",
                F.coalesce(nxt_col, F.col("cur")).alias("cur"),
                F.col("cur").alias("prev"),
                F.when(nxt_col.isNull(), F.col("path"))
                .otherwise(F.concat("path", F.array(nxt_col)))
                .alias("path"),
            ).transform(cheap_localCheckpoint)
            walkers.unpersist()
            walkers = new_walkers
    return walkers.select("walk_id", "path")
