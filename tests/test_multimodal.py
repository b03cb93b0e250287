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


# --- r12: media dedup / quality parity (VERDICT r11 #2) ------------------------


def test_payload_expr_strips_exact_header(spark, media_df):
    """payload_expr is the JVM-side header strip: its bytes equal the packed
    payload exactly (the content-hash dedup depends on this slice)."""
    from pyspark.sql import functions as F

    got = {
        r["media_id"]: bytes(r["p"])
        for r in media_df.select("media_id", mm.payload_expr().alias("p")).collect()
    }
    assert got[2] == b"\x05" * 500
    assert got[1] == bytes(range(256)) * 40


def test_exact_media_duplicates_content_vs_full_blob(spark):
    """Content-only dedup groups re-muxed copies (same payload, different
    header stamps); full-blob dedup keeps them apart.  Survivor is min id."""
    rows = [
        (1, mm.pack_blob("img", 640, 480, 0, b"same-bytes"), "img", 640, 480, 0),
        (2, mm.pack_blob("img", 64, 48, 0, b"same-bytes"), "img", 64, 48, 0),
        (3, mm.pack_blob("vid", 64, 48, 9, b"same-bytes"), "vid", 64, 48, 9),
        (4, mm.pack_blob("img", 64, 48, 0, b"other"), "img", 64, 48, 0),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    content = {
        (r["canonical_id"], r["n_copies"])
        for r in mm.exact_media_duplicates(df).collect()
    }
    assert content == {(1, 3), (4, 1)}
    full = {
        (r["canonical_id"], r["n_copies"])
        for r in mm.exact_media_duplicates(df, content_only=False).collect()
    }
    assert full == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_media_quality_gate_flags(spark):
    """Each flag fires on its own fixture; corrupt blobs get ONLY the corrupt
    flag (their dimensions are undecodable, not out-of-bounds); images are
    exempt from the duration bound."""
    rows = [
        (1, mm.pack_blob("img", 100, 100, 0, b"x"), "img", 100, 100, 0),       # clean
        (2, mm.pack_blob("img", 10, 100, 0, b"x"), "img", 10, 100, 0),         # too_small
        (3, mm.pack_blob("img", 9000, 100, 0, b"x"), "img", 9000, 100, 0),     # too_large
        (4, mm.pack_blob("vid", 100, 100, 999_999, b"x"), "vid", 100, 100, 999_999),  # overlong
        (5, mm.pack_blob("img", 100, 100, 999_999, b"x"), "img", 100, 100, 999_999),  # img: exempt
        (6, b"garbage-not-a-container", "img", 0, 0, 0),                        # corrupt
        (7, mm.pack_blob("vid", 10, 9000, 999_999, b"x"), "vid", 10, 9000, 999_999),  # all three
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {
        r["media_id"]: (list(r["flags"]), r["passed"])
        for r in mm.media_quality_gate(df).collect()
    }
    assert out[1] == ([], True)
    assert out[2] == (["too_small"], False)
    assert out[3] == (["too_large"], False)
    assert out[4] == (["overlong"], False)
    assert out[5] == ([], True)
    assert out[6] == (["corrupt"], False)
    assert out[7] == (["overlong", "too_large", "too_small"], False)


def test_media_near_dup_via_semantic_machinery_recall(spark):
    """The 100 TB media near-dup path IS the text family's cluster-then-prune
    machinery (semantic_dedup_pairs) over extract_features vectors — pinned
    here by recall against the exact block-matmul pairs the oracle-gated
    query uses (same contract as the text twin's recall gate)."""
    from kafka_flow_spark.operators.similarity import (
        cosine_near_dup_pairs_matmul,
        semantic_dedup_pairs,
    )
    from kafka_flow_spark.plans.media import _synth_media

    feats = mm.extract_features(
        _synth_media(spark, "/root/testdata/sf0.001"), normalize=False
    ).cache()
    try:
        exact = {
            (r["a_id"], r["b_id"])
            for r in cosine_near_dup_pairs_matmul(
                feats, id_col="media_id", vec_col="features", threshold=0.9985
            ).collect()
        }
        assert exact  # the fixture plants near-identical histograms
        approx = {
            (r["a_id"], r["b_id"])
            for r in semantic_dedup_pairs(
                feats, id_col="media_id", vec_col="features",
                threshold=0.9985, n_cells=4, n_probe=2,
            ).collect()
        }
        assert approx <= exact  # never a false pair (each is exact-verified)
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.8, f"recall {recall:.2f} ({len(approx)}/{len(exact)})"
    finally:
        feats.unpersist()


def test_streaming_media_gate_and_dedup_restart_golden(spark, tmp_path):
    """Phase-4 operators ride the streaming surface (the SURVEY's thesis):
    a media stream flows through the quality gate (Arrow-batched decode
    probe INSIDE the streaming plan) into an exact-dedup materialized view
    (payload-sha agg), across a stop/restart boundary — maintained counts
    and min-id survivors equal the recompute over everything ever streamed
    that passed the gate."""
    from pyspark.sql import functions as F

    from kafka_flow_spark.streaming.materialize import (
        MaterializedAggView,
        run_view_sink,
    )

    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    sink = MaterializedAggView(str(tmp_path / "view"), ["payload_sha"], "mid")

    def write_batch(rows):
        spark.createDataFrame(rows, mm.MEDIA_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)

    def run():
        stream = spark.readStream.schema(mm.MEDIA_SCHEMA).parquet(input_dir)
        gated = mm.media_quality_gate(stream).where("passed")
        hashed = gated.select(
            F.sha2(mm.payload_expr(), 256).alias("payload_sha"),
            F.col("media_id").cast("double").alias("mid"),
        )
        run_view_sink(hashed, sink, chk)

    # batch 1: two re-muxed copies of asset A, one clean B, one corrupt, one
    # gate-failing (too small)
    write_batch([
        (1, mm.pack_blob("img", 640, 480, 0, b"asset-A"), "img", 640, 480, 0),
        (2, mm.pack_blob("vid", 64, 48, 5000, b"asset-A"), "vid", 64, 48, 5000),
        (3, mm.pack_blob("img", 100, 100, 0, b"asset-B"), "img", 100, 100, 0),
        (4, b"corrupt-bytes", "img", 0, 0, 0),
        (5, mm.pack_blob("img", 4, 4, 0, b"asset-A"), "img", 4, 4, 0),
    ])
    run()

    def survivors():
        return {
            (r["n_rows"], r["min_v"]) for r in sink.result(spark).collect()
        }

    assert survivors() == {(2, 1.0), (1, 3.0)}  # A: copies 1+2 (5 failed gate); B: 3

    # restart: another A copy and a fresh C; state rolls FORWARD
    write_batch([
        (6, mm.pack_blob("img", 200, 200, 0, b"asset-A"), "img", 200, 200, 0),
        (7, mm.pack_blob("img", 200, 200, 0, b"asset-C"), "img", 200, 200, 0),
    ])
    run()
    assert survivors() == {(3, 1.0), (1, 3.0), (1, 7.0)}
