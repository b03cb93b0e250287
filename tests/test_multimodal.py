"""Multimodal column plumbing: decode metadata, features, resize, frame
sampling — all via mapInPandas over binary columns (stub codecs, real shapes)."""

from __future__ import annotations

import pytest

from kafka_flow_spark.operators import multimodal as mm


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, mm.pack_blob("img", 640, 480, 0, bytes(range(256)) * 40), "img", 640, 480, 0),
        (2, mm.pack_blob("img", 64, 48, 0, b"\x05" * 500), "img", 64, 48, 0),
        (3, mm.pack_blob("vid", 1280, 720, 10_000, b"\xab" * 4000), "vid", 1280, 720, 10_000),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_decode_metadata_and_dead_letter(spark, media_df):
    corrupt = spark.createDataFrame(
        [(99, b"not-a-blob", "img", 0, 0, 0)], mm.MEDIA_SCHEMA
    )
    out = {r["media_id"]: r for r in mm.decode_metadata(media_df.union(corrupt)).collect()}
    assert out[1]["valid"] and out[1]["decoded_width"] == 640
    assert out[3]["decoded_type"] == "vid" and out[3]["decoded_duration_ms"] == 10_000
    assert out[99]["valid"] is False and out[99]["decoded_width"] is None


def test_extract_features_unit_norm(spark, media_df):
    feats = {r["media_id"]: r["features"] for r in mm.extract_features(media_df).collect()}
    assert len(feats[1]) == mm.FEATURE_DIM
    assert abs(sum(f * f for f in feats[1]) - 1.0) < 1e-5  # unit norm
    assert feats[2][5] == 1.0  # constant 0x05 payload → all mass in bucket 5


def test_resize_images_roundtrip(spark, media_df):
    resized = mm.resize_images(media_df.filter("media_type = 'img'"), 32, 24)
    out = {r["media_id"]: r for r in resized.collect()}
    assert out[1]["width"] == 32 and out[1]["height"] == 24
    # the resized blob itself decodes with the new dimensions
    mt, w, h, dur, payload = mm._decode_header(bytes(out[1]["media"]))
    assert (mt, w, h) == ("img", 32, 24) and len(payload) > 0


def test_sample_frames_explodes(spark, media_df):
    frames = mm.sample_frames(media_df.filter("media_type = 'vid'"), every_ms=1000)
    rows = sorted(frames.collect(), key=lambda r: r["frame_index"])
    assert len(rows) == 10  # 10s video / 1s sampling
    assert [r["frame_ts_ms"] for r in rows[:3]] == [0, 1000, 2000]
    assert all(len(bytes(r["frame"])) > 0 for r in rows)


def test_decode_raises_not_implemented_for_real_media():
    """The stub decoder is explicit about being a stub for real codecs."""
    with pytest.raises(NotImplementedError):
        mm._decode_header(b"\xff\xd8\xff\xe0 jpeg header")
