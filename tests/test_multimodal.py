import pytest

from plato_spark.functions.multimodal import (
    FEATURE_DIM,
    MEDIA_FORMATS,
    decode_media,
    docs_to_media,
    encode_media_bytes,
    extract_features,
    parse_media_header_bytes,
    parse_media_headers,
    resize_images,
    sample_frames,
    synth_media,
)


def test_header_roundtrip_every_format():
    for fmt in ("png", "bmp", "jpeg", "gif"):
        blob = encode_media_bytes(fmt, width=321, height=45, channels=3, seed=b"s")
        got = parse_media_header_bytes(blob)
        assert got[0] == fmt
        assert got[1] == 321 and got[2] == 45
    wav = encode_media_bytes("wav", channels=2, sample_rate=22050, n_samples=77, seed=b"s")
    assert parse_media_header_bytes(wav) == ("wav", None, None, 2, 22050, 16)


def test_header_parse_rejects_garbage():
    assert parse_media_header_bytes(b"")[0] == "unknown"
    assert parse_media_header_bytes(b"\x89PNGbroken....")[0] == "unknown"
    assert parse_media_header_bytes(b"RIFFxxxxNOPE" + b"\x00" * 30)[0] == "unknown"


def test_docs_to_media_parse(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 10 + i) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["media_id"]: r for r in parse_media_headers(docs_to_media(docs)).collect()}
    assert len(out) == 10
    for i in range(10):
        r = out[i]
        assert r["format"] == MEDIA_FORMATS[i % 5]
        if r["format"] == "wav":
            assert r["sample_rate"] == 8000 + (i % 4) * 4000
            assert r["channels"] == 1 + i % 2
            assert r["width"] is None
        else:
            assert r["width"] == 16 + (10 + i) % 241
            assert r["height"] == 16 + (i * 7) % 193


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
