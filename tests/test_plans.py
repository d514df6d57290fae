"""Physical-plan hygiene tests — the plan is part of the contract at 100TB.

Checks .explain('formatted') output for: parquet filter/column pushdown,
whole-stage codegen in the superstep hot path, hash-join (not per-iteration
sort) for the state-edges join, and partial aggregation (map-side combine)
standing in for plato's receiver-side write_add combiners.
"""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_parquet_pushdown(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id", "lang")
    p = plan_of(q)
    assert "PushedFilters" in p and "lang" in p.split("PushedFilters", 1)[1][:200]
    # column pruning: text must NOT be read
    assert "text" not in p.split("ReadSchema", 1)[1][:300]


def test_superstep_join_is_hash_not_sort(spark):
    # realistic superstep shape: cached edge table + state too big to
    # broadcast (>10MB) but well under threshold*partitions -> the
    # preferSortMergeJoin=false session conf must yield ShuffledHashJoin
    # (no re-sort of the big cached side every iteration)
    edges = (
        spark.range(0, 8_000_000)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)).alias("dst"),
        )
        .repartition(8, "src")
        .persist()
    )
    edges.count()  # materialize -> accurate InMemoryRelation stats
    state = (
        spark.range(0, 1_000_000)
        .select(F.col("id"), F.lit(1.0).alias("contrib"))
        .persist()
    )
    state.count()
    step = (
        edges.join(state.withColumnRenamed("id", "src"), "src")
        .groupBy("dst")
        .agg(F.sum("contrib").alias("g"))
    )
    p = plan_of(step)
    edges.unpersist()
    state.unpersist()
    assert "SortMergeJoin" not in p, p
    assert "ShuffledHashJoin" in p
    # map-side combine: partial then final HashAggregate
    assert p.count("HashAggregate") >= 2


def test_superstep_uses_wholestage_codegen(spark):
    edges = spark.createDataFrame(
        [(i % 50, (i * 7) % 50) for i in range(500)], "src long, dst long"
    )
    import io
    from contextlib import redirect_stdout

    # AQE defers codegen to runtime stages; disable it to inspect the
    # compiled template statically
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        step = edges.groupBy("dst").agg(F.count("*").alias("d"))
        b = io.StringIO()
        with redirect_stdout(b):
            step.explain(mode="codegen")
        out = b.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert "WholeStageCodegen" in out, out[:500]
    assert "Found 0 WholeStageCodegen" not in out


def test_lineitem_extraction_prunes_columns(spark):
    from plato_spark.sources.tables import part_cooccurrence_edges

    q = part_cooccurrence_edges(spark, "/root/testdata/sf0.001")
    p = plan_of(q)
    # only l_orderkey + l_partkey may be read from the 11-column table
    read = p.split("ReadSchema", 1)[1][:400]
    assert "l_orderkey" in read and "l_partkey" in read
    for col in ("l_extendedprice", "l_quantity", "l_shipdate", "l_returnflag"):
        assert col not in read


def test_minhash_signatures_stay_jvm_side(spark):
    """The sketch hot path must be whole-stage-codegen built-ins — a Python
    UDF here would serialize every shingle through Arrow for nothing."""
    from plato_spark.functions.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon {i}") for i in range(20)],
        "doc_id long, text string",
    )
    for impl in ("xxhash64", "portable"):
        p = plan_of(minhash_signatures(docs, hash_impl=impl))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, impl
        # partial aggregation: the 64 mins combine map-side before the shuffle
        assert "partial_min" in p or "HashAggregate" in p, impl


def test_simhash_portable_single_shuffle_partial_agg(spark):
    from plato_spark.functions.dedup import simhash_signatures_portable

    docs = spark.createDataFrame(
        [(i, f"one two three {i}") for i in range(10)], "doc_id long, text string"
    )
    p = plan_of(simhash_signatures_portable(docs))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # one exchange for the vote aggregation (plus the base-join exchanges)
    assert p.count("Exchange hashpartitioning(id") <= 3, p


def test_ivf_assignment_broadcasts_centroids(spark):
    """The k x dim centroid table must broadcast — shuffling the full vector
    table against 8 centroids would be a pointless wide exchange."""
    from plato_spark.functions.similarity import ivf_ann

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0, 0.5]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    p = plan_of(ivf_ann(emb, k=3, n_clusters=4, lloyd_iters=1))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p


def test_hits_no_driver_actions_per_iteration_and_no_sort(spark):
    """r3 HITS contract: L1 normalization rides in-plan (broadcast 1-row
    agg) — the loop must issue ZERO driver collect/first actions (the old
    shape paid 2 scalar collects per iteration) — and the readout must
    not force a global sort exchange."""
    import pyspark.sql.dataframe as dfmod

    from plato_spark.algos.hits import hits

    edges = spark.createDataFrame(
        [(0, 3), (0, 4), (1, 3), (1, 4), (2, 3), (4, 5), (3, 0)],
        "src long, dst long",
    )
    calls = {"n": 0}
    orig_collect, orig_first = dfmod.DataFrame.collect, dfmod.DataFrame.first

    def counting_collect(self):
        calls["n"] += 1
        return orig_collect(self)

    def counting_first(self):
        calls["n"] += 1
        return orig_first(self)

    dfmod.DataFrame.collect = counting_collect
    dfmod.DataFrame.first = counting_first
    try:
        out = hits(edges, iterations=5)
    finally:
        dfmod.DataFrame.collect = orig_collect
        dfmod.DataFrame.first = orig_first
    assert calls["n"] == 0, f"hits() ran {calls['n']} driver scalar actions"
    p = plan_of(out)
    assert "Sort [" not in p  # no global orderBy at readout


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # bucketed-by-src edge tables: a self-join on src (the superstep /
    # co-located join shape) must read pre-partitioned buckets with NO
    # shuffle exchange and (sorted buckets) NO sort before the join
    from plato_spark.sources.sinks import write_bucketed_edges

    edges = spark.range(0, 20_000).select(
        F.pmod(F.xxhash64("id"), F.lit(500)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(500)).alias("dst"),
    )
    write_bucketed_edges(
        edges, "bucketed_edges_t", buckets=8, key="src", path=str(tmp_path / "be")
    )
    try:
        # force the shuffle-join path so the assertion is about bucketing,
        # not about the small side happening to broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t = spark.table("bucketed_edges_t")
        state = spark.table("bucketed_edges_t").groupBy("src").count()
        joined = t.join(state, "src")
        p = plan_of(joined)
        # bucketed scan satisfies the hash requirement on BOTH sides: the
        # groupBy aggregates in place (single HashAggregate pair, no
        # partial->exchange->final) and the join is exchange-free
        assert "Exchange hashpartitioning" not in p, p
        n = joined.count()
        assert n > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bucketed_edges_t")


def test_cms_sketch_partial_aggregation(spark):
    # the CMS build must map-side combine (partial_count) so each task
    # emits at most d*w cells — the whole point of the sketch at scale
    from plato_spark.functions.sketches import cms_sketch

    import re

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(64)],
        "doc_id long, text string",
    )
    p = plan_of(cms_sketch(docs, depth=2, width=16))
    assert "partial_count" in p or "partial, count" in p.replace("(", " "), p
    # exactly ONE physical exchange: the 2x16-cell aggregation shuffle
    # (count node-detail headers — the tree section repeats each node)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_knn_graph_no_global_sort(spark):
    # per-vertex top-k must window-partition by src, never globally sort
    from plato_spark.functions.recommend import knn_graph

    e = spark.createDataFrame(
        [(1, 2, 3.0), (1, 3, 2.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    p = plan_of(knn_graph(e, k=2))
    # a window sort is partition-local: its Sort node is non-global
    assert "Sort [src" in p or "partitionBy" not in p  # window present
    assert "Exchange rangepartitioning" not in p, p


def test_copurchase_no_cartesian(spark):
    from plato_spark.functions.recommend import co_purchase_topk

    inc = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10)], "user long, item long"
    )
    p = plan_of(co_purchase_topk(inc, k=2))
    assert "CartesianProduct" not in p, p


def test_pq_assign_broadcasts_codebooks(spark):
    # the per-subspace assignment must broadcast the k_c x d_sub codebook
    from plato_spark.functions.pq import _assign_sub

    vecs = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(32)],
        "id long, vec array<double>",
    )
    cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [9.0, 0.0])],
        "cluster int, cvec array<double>",
    )
    p = plan_of(_assign_sub(vecs, cent))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p


def test_infomap_no_driver_actions_per_move_round(spark):
    """r4 infomap contract (the HITS discipline): the inner move loop's
    q_tot normalization rides in-plan as a broadcast 1-row agg, so the
    driver action count must NOT grow with inner_iterations — every
    remaining action (embedded-pagerank deltas, epoch counts, flow
    materialization) is loop-invariant per epoch."""
    import pyspark.sql.dataframe as dfmod

    from plato_spark.algos.infomap import infomap

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)],
        "src long, dst long",
    )
    orig = {n: getattr(dfmod.DataFrame, n) for n in ("collect", "first", "count")}

    def counted(name):
        def f(self, *a, **kw):
            calls["n"] += 1
            return orig[name](self, *a, **kw)
        return f

    counts = {}
    try:
        for inner in (2, 5):
            calls = {"n": 0}
            for n in orig:
                setattr(dfmod.DataFrame, n, counted(n))
            infomap(edges, outer_iterations=1, inner_iterations=inner,
                    pr_iters=3).count()
            counts[inner] = calls["n"]
    finally:
        for n, f in orig.items():
            setattr(dfmod.DataFrame, n, f)
    assert counts[2] == counts[5], (
        f"driver actions grew with inner rounds: {counts}"
    )


def test_eigenvector_no_driver_actions_in_loop(spark):
    """Eigenvector centrality follows the HITS contract: the L1 total
    rides in-plan (broadcast 1-row agg) — zero collect/first inside the
    power loop (localCheckpoint materialization is not a driver
    action)."""
    import pyspark.sql.dataframe as dfmod

    from plato_spark.algos.eigenvector import eigenvector_centrality

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3), (1, 3)], "src long, dst long"
    )
    calls = {"n": 0}
    orig_collect, orig_first = dfmod.DataFrame.collect, dfmod.DataFrame.first

    def cc(self):
        calls["n"] += 1
        return orig_collect(self)

    def cf(self):
        calls["n"] += 1
        return orig_first(self)

    dfmod.DataFrame.collect, dfmod.DataFrame.first = cc, cf
    try:
        out = eigenvector_centrality(edges, iterations=4)
    finally:
        dfmod.DataFrame.collect = orig_collect
        dfmod.DataFrame.first = orig_first
    assert calls["n"] == 0, calls
    assert "Sort [" not in plan_of(out)


def test_source_overlap_no_cartesian_and_partial_agg(spark):
    """The cross-source matrix must equi-join on the shingle hash —
    never a cartesian/nested-loop over sources — and the per-source
    distinct must partial-aggregate map-side."""
    from plato_spark.functions.dedup import source_shingle_overlap

    docs = spark.createDataFrame(
        [(i, f"tok{i} common words shared across sources here now {i}",
          f"s{i % 3}") for i in range(12)],
        "doc_id long, text string, source string",
    )
    p = plan_of(source_shingle_overlap(docs, n=3))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_pmi_topk_is_take_ordered(spark):
    """The global top-k must compile to TakeOrderedAndProject (local
    per-partition top-k), never a full global sort of the pair table."""
    from plato_spark.functions.text import pmi_collocations

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h " * 4) for i in range(6)],
        "doc_id long, text string",
    )
    p = plan_of(pmi_collocations(docs, top_k=10, min_count=2))
    assert "TakeOrderedAndProject" in p, p


def test_triad_census_no_cartesian(spark):
    # wedge enumeration + 3 dyad-bit joins must all be equi-joins
    from plato_spark.algos.triads import triad_census

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 0)], "src long, dst long"
    )
    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    p = plan_of(triad_census(e, v))
    # the only nested-loop is the broadcast of the 1-row total
    assert "CartesianProduct" not in p, p


def test_hub_churn_topk_is_take_ordered(spark):
    # the per-side top-k must compile to TakeOrderedAndProject; the only
    # full Sort allowed is the k-row rank window (single tiny partition)
    from plato_spark.graph.edges import hub_rank_churn

    e = spark.createDataFrame([(0, 1), (0, 2)], "src long, dst long")
    p = plan_of(hub_rank_churn(e, e, k=10))
    assert "TakeOrderedAndProject" in p, p
    assert "Exchange rangepartitioning" not in p, p


def test_snm_rank_window_is_partition_local(spark):
    # build_dictionary's row_number partitions by __p — no global
    # single-partition window, no range-exchange for the bucket joins
    from plato_spark.functions.dedup import snm_candidates

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id long, text string"
    )
    p = plan_of(snm_candidates(docs, window=3))
    assert "partitionBy" not in p or "Window" in p
    assert "CartesianProduct" not in p, p
    # the rank window is keyed on the partition id column
    assert "windowspecdefinition(__p" in p.replace(" ", "").lower() or "Window" in p


def test_mixing_assortativity_single_row_broadcast(spark):
    from plato_spark.algos.mixing import attribute_assortativity

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    lab = spark.createDataFrame([(0, "A"), (1, "B")], "id long, label string")
    p = plan_of(attribute_assortativity(e, lab))
    # the 1-row x 1-row combine must be a broadcast, not a shuffle join
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p


def test_sequence_packing_prefix_sum_is_distributed(spark):
    # the per-document running sum must be a bucket-partitioned window;
    # the only single-partition window is over the 32-row bucket-offset
    # aggregate.  A naive Window.orderBy(key) with no partition key
    # would serialize the whole corpus through one task at 100 TB.
    from plato_spark.functions.packing import sequence_packing

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok tok") for i in range(64)], "doc_id long, text string"
    )
    p = plan_of(sequence_packing(docs, budget=8))
    norm = p.replace(" ", "").lower()
    # the big window is keyed on the bucket column
    assert "windowspecdefinition(bucket" in norm, p
    # the bucket-offset table joins back as a broadcast, not a shuffle
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p


def test_ppr_sweep_topk_broadcast_no_cartesian(spark):
    # the sweep's global top-k must compile to TakeOrderedAndProject
    # (never a range-exchange full sort); the k-row rank tables must
    # join the edge scan as broadcasts; no cartesian anywhere
    from plato_spark.algos.local_cluster import ppr_sweep_cut

    e = spark.createDataFrame(
        [(i, (i + 1) % 12) for i in range(12)], "src long, dst long"
    )
    ppr = spark.createDataFrame(
        [(i, 1.0 / (i + 1)) for i in range(12)], "id long, rank double"
    )
    p = plan_of(ppr_sweep_cut(e, ppr, k=4))
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p


def test_asof_join_single_user_shuffle_no_inequality_join(spark):
    # the as-of plan must be tagged-union + ONE user-keyed window —
    # never a nested-loop/range join, and the window must be keyed on
    # the user column (not a single global partition)
    from datetime import datetime

    from plato_spark.functions.events import asof_attribution

    ev = spark.createDataFrame(
        [(i, i % 3, "view" if i % 2 else "purchase",
          datetime(2024, 1, 1, 0, 0, i)) for i in range(12)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    p = plan_of(asof_attribution(ev))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    norm = p.replace(" ", "").lower()
    assert "windowspecdefinition(u" in norm, p


def test_interval_join_is_equi_join_not_nested_loop(spark):
    # banding must turn the range predicate into an equi hash join
    from datetime import datetime

    from plato_spark.functions.events import interval_counts

    ev = spark.createDataFrame(
        [(i, i % 3, "view" if i % 2 else "error",
          datetime(2024, 1, 1, 0, 0, i)) for i in range(12)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    p = plan_of(interval_counts(ev))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    from plato_spark.functions.relational import pricing_summary

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = plan_of(pricing_summary(li))
    # shipdate filter reaches the scan; partial aggregation present
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters", 1)[1][:300], p
    assert "partial" in p.lower(), p
    # column pruning: join keys we never use must not be read
    tail = p.split("ReadSchema", 1)[1][:400]
    assert "l_partkey" not in tail and "l_suppkey" not in tail, p


def test_shipping_priority_takeordered_and_broadcast_dims(spark):
    from plato_spark.functions.relational import shipping_priority

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    p = plan_of(shipping_priority(o, li, c))
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p


def test_bpe_merge_apply_has_no_shuffle_and_no_python(spark):
    # one BPE round = pair-count aggregation (one exchange) + top-1;
    # the merge APPLY itself must add no exchange and no Python eval
    from plato_spark.functions.bpe import bpe_merges  # noqa: F401 (import path)
    from pyspark.sql import functions as FF

    docs = spark.createDataFrame(
        [(0, "low lower lowest")], "doc_id long, text string"
    )
    vocab = docs.select(
        FF.explode(FF.split("text", " ")).alias("w")
    ).groupBy("w").agg(FF.count(FF.lit(1)).alias("freq"))
    syms = vocab.select(
        "freq",
        FF.concat(
            FF.transform(FF.sequence(FF.lit(1), FF.length("w")),
                         lambda i: FF.col("w").substr(i, FF.lit(1))),
            FF.array(FF.lit("</w>")),
        ).alias("s"),
    ).localCheckpoint(eager=True)
    merged = syms.select(
        "freq",
        FF.filter(
            FF.transform(
                "s",
                lambda x, i: FF.when(
                    (x == FF.lit("l")) & (FF.get("s", i + 1) == FF.lit("o")),
                    FF.lit("lo"),
                ).when(
                    (x == FF.lit("o")) & (FF.get("s", i - 1) == FF.lit("l")),
                    FF.lit(None).cast("string"),
                ).otherwise(x),
            ),
            lambda x: x.isNotNull(),
        ).alias("s"),
    )
    p = plan_of(merged)
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_large_orders_broadcasts_small_side_only(spark):
    from plato_spark.functions.relational import large_orders

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    p = plan_of(large_orders(o, li, c))
    # the qualifying agg is map-side combined, both joins are broadcasts
    # of the small (qualifying) side, and nothing degenerates to a
    # cartesian or nested loop
    assert "partial" in p.lower(), p
    assert p.count("BroadcastExchange") >= 2, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_promo_revenue_broadcasts_part_dim(spark):
    from plato_spark.functions.relational import promo_revenue

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    p = plan_of(promo_revenue(li, part))
    assert "BroadcastExchange" in p, p
    # column pruning on the fact scan: quantity/tax are never referenced
    tail = p.split("ReadSchema", 1)[1][:400]
    assert "l_quantity" not in tail and "l_tax" not in tail, p


def test_peak_concurrency_windows_are_bucket_partitioned(spark):
    from plato_spark.functions.events import peak_concurrency

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = plan_of(peak_concurrency(ev))
    # the per-timestamp running sum MUST ride the bucket-partitioned
    # window; the only single-partition work is the <= |buckets|-row
    # offset table and 1-row scalar folds
    assert "hashpartitioning(bucket" in p, p
    assert "CartesianProduct" not in p, p
    # struct-max argmax: no self-join of cand back onto its own max
    assert p.count("SortMergeJoin") == 0, p


def test_group_quantiles_no_single_partition_exchange(spark):
    from plato_spark.functions.quantiles import group_quantiles

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = plan_of(group_quantiles(ev, "event_type", "value"))
    # fully in-plan AND fully partitioned: the cumulative window runs
    # per group, the stats table broadcasts — nothing serializes
    # through one task
    assert "SinglePartition" not in p, p
    assert "hashpartitioning(g" in p, p
    assert "BroadcastExchange" in p, p


def test_asof_next_single_user_shuffle_no_inequality_join(spark):
    from plato_spark.functions.events import asof_next

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = plan_of(asof_next(ev))
    assert "hashpartitioning(u" in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_mixture_apply_broadcasts_rates_no_extra_shuffle(spark):
    from plato_spark.functions.packing import mixture_apply

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan_of(mixture_apply(docs))
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p


def test_frequent_triples_apriori_no_cartesian(spark):
    from pyspark.sql import functions as FF

    from plato_spark.functions.recommend import frequent_triples

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        FF.col("l_orderkey").alias("basket"), FF.col("l_partkey").alias("item"))
    p = plan_of(frequent_triples(li, min_support=2))
    # candidate generation and counting are all equi/semi joins
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_active_users_bounded_explode_no_range_join(spark):
    from plato_spark.functions.events import active_users

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = plan_of(active_users(ev))
    # the trailing windows come from a bounded JVM sequence explode,
    # never a non-equi nested-loop range join
    assert "Generate" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_event_trigrams_user_partitioned_window(spark):
    from plato_spark.functions.events import event_trigrams

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = plan_of(event_trigrams(ev))
    assert "SinglePartition" not in p, p
    assert "hashpartitioning(u" in p, p


def test_blocklist_hits_jvm_only_single_exchange(spark):
    from plato_spark.functions.text import blocklist_hits

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan_of(blocklist_hits(docs))
    # pure JVM array filters: no Python eval, no pre-agg join shuffles
    assert "Python" not in p, p
    assert "Join" not in p, p


def test_vocab_coverage_head_is_take_ordered(spark):
    from plato_spark.functions.text import vocab_coverage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan_of(vocab_coverage(docs))
    assert "TakeOrderedAndProject" in p, p


def test_late_shipments_semi_join_not_cartesian(spark):
    from plato_spark.functions.relational import late_shipments

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = plan_of(late_shipments(o, li))
    # the non-equi date predicate must ride the orderkey equi-key as a
    # LeftSemi condition — never a nested-loop/cartesian EXISTS
    assert "LeftSemi" in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_returned_items_pushdown_and_take_ordered(spark):
    from plato_spark.functions.relational import returned_items

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    p = plan_of(returned_items(li, o, c, n, k=20))
    # returnflag filter reaches the parquet scan; the top-k is a
    # TakeOrdered, never a global sort; the k survivors broadcast
    assert "EqualTo(l_returnflag,R)" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastExchange" in p, p


def test_local_supplier_volume_pushdown_and_broadcast_dims(spark):
    from plato_spark.functions.relational import local_supplier_volume

    t = lambda n: spark.read.parquet(f"/root/testdata/sf0.001/{n}.parquet")
    p = plan_of(local_supplier_volume(
        t("lineitem"), t("orders"), t("customer"), t("supplier"),
        t("nation"), t("region")))
    # order-date year pushes to the orders scan BEFORE the fan-in;
    # supplier/nation/region tags broadcast; customer never does
    assert "o_orderdate" in p.split("PushedFilters", 1)[1][:600] or \
        "o_orderdate" in p, p
    assert p.count("BroadcastExchange") >= 3, p
    assert "CartesianProduct" not in p, p


def test_dormant_customers_anti_join_and_scalar_broadcast(spark):
    from plato_spark.functions.relational import dormant_customers

    t = lambda n: spark.read.parquet(f"/root/testdata/sf0.001/{n}.parquet")
    p = plan_of(dormant_customers(t("orders"), t("customer"), t("nation")))
    assert "LeftAnti" in p, p
    # the balance-average scalar rides a broadcast, not a re-aggregation
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p


def test_cube_single_expand_single_exchange(spark):
    import __spark_entry__ as E

    df = E.q_status_priority_cube(spark, "/root/testdata/sf0.001")
    p = plan_of(df)
    # CUBE = one Expand feeding one partial/final agg pair — all four
    # grouping sets in a single shuffle, never four jobs
    assert "Expand" in p, p
    assert p.count("Exchange") <= 2, p
    assert "partial" in p.lower(), p


def test_segment_pivot_single_pass(spark):
    import __spark_entry__ as E

    p = plan_of(E.q_segment_pivot(spark, "/root/testdata/sf0.001"))
    # pinned pivot values -> NO values-discovery job (the plan contains
    # the literal segment list inside pivotfirst); execution is the
    # standard two-phase pivot: count agg + pivot_first = exactly 2
    # shuffle exchanges, one scan of the data
    assert "pivotfirst" in p and "AUTOMOBILE" in p, p
    assert "BroadcastExchange" in p, p
    import re

    shuffles = len(re.findall(r"\(\d+\) Exchange", p))
    assert shuffles <= 2, p
    assert "partial" in p.lower(), p


def test_zipf_rank_is_range_partitioned_never_single_window(spark):
    import __spark_entry__ as E

    p = plan_of(E.q_zipf_curve(spark, "/root/testdata/sf0.001"))
    # the dictionary rank rides a range partition + per-partition
    # window; the only SinglePartition work is the 1-row total
    assert "rangepartitioning" in p, p
    assert "CartesianProduct" not in p, p


def test_knn_hubness_topk_window_is_src_partitioned(spark):
    import __spark_entry__ as E

    p = plan_of(E.q_knn_hubness(spark, "/root/testdata/sf0.001"))
    assert "hashpartitioning(src" in p, p
    assert "CartesianProduct" not in p, p
