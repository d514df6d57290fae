"""Round-4 batch 16: entropy identities, Markov fixpoint, Venn zeros."""

from datetime import datetime

from pyspark.sql import functions as F


def test_entropy_uniform_is_log2_vocab(spark):
    # 4 distinct tokens once each -> H = log2(4) = 2 bits;
    # one repeated token -> H = 0
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd", "u"), (2, "zz zz zz zz", "s")],
        "doc_id long, text string, source string")
    from plato_spark.functions.text import TOKEN_RE

    tok = docs.select("source", F.explode(F.regexp_extract_all(
        F.col("text"), F.lit(TOKEN_RE), F.lit(0))).alias("token"))
    c = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    g = c.groupBy("source").agg(
        F.sum("c").alias("n"), F.sum(F.col("c") * F.log2("c")).alias("s"))
    out = {r.source: r.h for r in g.select(
        "source",
        F.round(F.log2("n") - F.col("s") / F.col("n"), 6).alias("h")
    ).collect()}
    assert out == {"u": 2.0, "s": 0.0}


def test_markov_stationary_absorbing_state(spark):
    # user timelines: A always -> B, B always -> B => all mass on B
    rows = []
    eid = 0
    for u in range(3):
        for i, t in enumerate(["A", "B", "B", "B"]):
            rows.append((eid, u, t, datetime(2024, 1, 1, 0, i)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp")
    import __spark_entry__ as E
    from plato_spark.functions.events import event_transitions

    tr = event_transitions(ev).select("src_type", "dst_type", "n")
    rowsum = tr.groupBy("src_type").agg(F.sum("n").alias("rs"))
    P = tr.join(rowsum, "src_type").select(
        "src_type", "dst_type", (F.col("n") / F.col("rs")).alias("p"))
    states = (P.select(F.col("src_type").alias("state"))
              .unionByName(P.select(F.col("dst_type").alias("state")))
              .distinct())
    ns = states.agg(F.count(F.lit(1)).cast("long").alias("k"))
    x = states.crossJoin(F.broadcast(ns)).select(
        "state", (F.lit(1.0) / F.col("k")).alias("w"))
    for _ in range(E.MARKOV_ITERS):
        step = (P.join(x, F.col("state") == F.col("src_type"))
                .groupBy(F.col("dst_type").alias("state2"))
                .agg(F.sum(F.col("w") * F.col("p")).alias("w2")))
        x = states.join(step, F.col("state") == F.col("state2"), "left"
                        ).select("state",
                                 F.coalesce("w2", F.lit(0.0)).alias("w"))
    out = {r.state: r.w for r in
           x.select("state", F.round("w", 6).alias("w")).collect()}
    assert out == {"A": 0.0, "B": 1.0}


def test_audience_jaccard_disjoint_pair_is_zero(spark):
    ev = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (1, "C")],
        "user_id long, event_type string")
    inc = ev.select("user_id", F.col("event_type").alias("t")).distinct()
    marg = inc.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("m"))
    inter = (inc.alias("a").join(
        inc.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.t") < F.col("b.t")))
        .groupBy(F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
        .agg(F.count(F.lit(1)).cast("long").alias("nab")))
    pairs = (marg.select(F.col("t").alias("ta"), F.col("m").alias("ma"))
             .join(marg.select(F.col("t").alias("tb"),
                               F.col("m").alias("mb")),
                   F.col("ta") < F.col("tb")))
    out = {(r.ta, r.tb): (r.n_both, r.j) for r in
           pairs.join(inter, ["ta", "tb"], "left").select(
               "ta", "tb",
               F.coalesce("nab", F.lit(0)).alias("n_both"),
               F.round(F.coalesce("nab", F.lit(0))
                       / (F.col("ma") + F.col("mb")
                          - F.coalesce("nab", F.lit(0))), 6).alias("j"),
           ).collect()}
    # A∩B = {} -> explicit 0 row; A∩C = {1} with |A∪C| = 2
    assert out[("A", "B")] == (0, 0.0)
    assert out[("A", "C")] == (1, 0.5)
    assert out[("B", "C")] == (0, 0.0)
