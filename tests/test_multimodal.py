import pytest

from plato_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    resize_images,
    sample_frames,
    synth_media,
)


def test_media_schema_and_decode(spark):
    media = synth_media(spark, n=30).persist()
    assert media.count() == 30
    decoded = decode_media(media).collect()
    assert len(decoded) == 30
    for r in decoded:
        assert len(r["samples"]) > 0
        assert all(0 <= s < 256 for s in r["samples"][:16])


def test_features_deterministic_unit_norm(spark):
    media = synth_media(spark, n=20).persist()
    f1 = {r["media_id"]: list(r["features"]) for r in extract_features(media).collect()}
    f2 = {r["media_id"]: list(r["features"]) for r in extract_features(media).collect()}
    assert f1 == f2
    for v in f1.values():
        assert len(v) == FEATURE_DIM
        norm = sum(x * x for x in v) ** 0.5
        assert abs(norm - 1.0) < 1e-5


def test_resize_shapes(spark):
    media = synth_media(spark, n=12)
    out = resize_images(media, width=16, height=8).collect()
    assert len(out) == 4  # every 3rd row is an image
    for r in out:
        assert r["width"] == 16 and r["height"] == 8
        assert len(bytes(r["data"])) == 16 * 8


def test_frame_sampling_plan(spark):
    media = synth_media(spark, n=9)
    plan = sample_frames(media, every_ms=500).collect()
    assert plan
    by_id = {}
    for r in plan:
        by_id.setdefault(r["media_id"], []).append((r["frame_idx"], r["ts_ms"]))
    for frames in by_id.values():
        idxs = [f for f, _ in sorted(frames)]
        assert idxs == list(range(len(idxs)))
        assert all(ts == i * 500 for i, ts in sorted(frames))


def test_real_decoder_is_marked_stub(spark):
    media = synth_media(spark, n=3)
    with pytest.raises(NotImplementedError):
        decode_media(media, decoder="real")
    with pytest.raises(NotImplementedError):
        extract_features(media, decoder="real")
