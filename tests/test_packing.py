"""Training-feed assembly: sequence packing, mixture weights, snapshot diff."""

import math

from pyspark.sql import functions as F

from plato_spark.functions.packing import (
    mixture_weights,
    sequence_packing,
    snapshot_diff,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_sequence_packing_partitions_the_token_stream(spark):
    # 20 docs, 3..22 tokens each; the manifest must tile [0, total) exactly
    rows = [(i, " ".join(f"w{j}" for j in range(3 + i)), "s") for i in range(20)]
    total = sum(3 + i for i in range(20))
    out = sequence_packing(_docs(spark, rows), budget=16).collect()
    assert len(out) == 20
    ivals = sorted((r.start_off, r.start_off + r.n_tokens) for r in out)
    assert ivals[0][0] == 0
    for (a0, a1), (b0, _) in zip(ivals, ivals[1:]):
        assert a1 == b0  # contiguous, no gap or overlap
    assert ivals[-1][1] == total
    for r in out:
        assert r.first_chunk == r.start_off // 16
        assert r.last_chunk == (r.start_off + r.n_tokens - 1) // 16
        assert r.n_chunks == r.last_chunk - r.first_chunk + 1
    assert max(r.last_chunk for r in out) == (total - 1) // 16


def test_sequence_packing_straddles_and_zero_token_docs(spark):
    rows = [
        (1, " ".join(f"t{j}" for j in range(700)), "s"),  # > budget: must straddle
        (2, "only three tokens", "s"),
        (3, "!!! ... ---", "s"),  # zero tokens: excluded
    ]
    out = {r.doc_id: r for r in sequence_packing(_docs(spark, rows), budget=512).collect()}
    assert 3 not in out
    assert out[1].n_chunks >= 2  # 700 tokens cannot fit one 512 chunk
    assert out[2].n_tokens == 3


def test_mixture_weights_exact_isqrt(spark):
    # token counts around perfect squares exercise the isqrt corrections
    def text_of(n):
        return " ".join(f"x{j}" for j in range(n))

    counts = {"a": 143, "b": 144, "c": 145, "d": 9}  # 143=12^2-1, 145=12^2+1
    rows = [(i, text_of(n), s) for i, (s, n) in enumerate(counts.items())]
    out = {r.source: r for r in mixture_weights(_docs(spark, rows)).collect()}
    tt = sum(counts.values())
    tw = sum(math.isqrt(n) for n in counts.values())
    for s, n in counts.items():
        w = math.isqrt(n)
        assert out[s].n_tokens == n
        assert out[s].natural_share == round(n / tt, 6)
        assert out[s].temp_share == round(w / tw, 6)
        assert out[s].boost == round((w * tt) / (tw * n), 6)
    # temperature flattens: the smallest source is boosted, the largest damped
    assert out["d"].boost > 1.0 > out["b"].boost


def test_snapshot_diff_all_statuses(spark):
    v1 = spark.createDataFrame(
        [(1, "same"), (2, "edited"), (3, "gone")], "doc_id long, text string"
    )
    v2 = spark.createDataFrame(
        [(1, "same"), (2, "edited!"), (4, "fresh")], "doc_id long, text string"
    )
    got = {r.id: r.status for r in snapshot_diff(v1, v2).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_shuffles_digests_not_bodies(spark):
    # the join's projected schema must carry md5 digests, not text
    v = spark.createDataFrame([(1, "x" * 1000)], "doc_id long, text string")
    plan = snapshot_diff(v, v)._jdf.queryExecution().optimizedPlan().toString()
    assert "md5" in plan
