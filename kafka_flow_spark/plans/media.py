"""Multimodal pipeline queries (rows-only checks — binary media has no SQL
oracle; the per-operator unit tests in tests/test_multimodal.py are the
value-level gate).

Media blobs are synthesized deterministically from ``documents`` (text bytes
as payload, doc stats as dimensions) so the pipeline runs against the driver's
tables without external media files.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flow_spark.operators import multimodal as mm
from kafka_flow_spark.plans.registry import register
from kafka_flow_spark.tables import load


def _synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic FAKE media blobs via mapInPandas."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "media", "media_type", "width", "height", "duration_ms")}
            for did, text, n in zip(pdf["doc_id"], pdf["text"], pdf["n_chars"]):
                w, h = 16 + int(n) % 640, 16 + (int(n) * 7) % 480
                dur = 1000 + (int(did) % 10) * 1000
                mt = "vid" if did % 3 == 0 else "img"
                out["media_id"].append(did)
                out["media"].append(
                    mm.pack_blob(mt, w, h, dur, (text or "").encode()[:4096])
                )
                out["media_type"].append(mt)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(dur)
            yield pd.DataFrame(out)

    return docs.mapInPandas(build, schema=mm.MEDIA_SCHEMA)


@register("q_media_decode_stats")
def q_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode metadata for every blob, aggregate by media type."""
    decoded = mm.decode_metadata(_synth_media(spark, sf_dir))
    return decoded.groupBy("decoded_type").agg(
        F.count("*").alias("n_items"),
        F.sum("payload_bytes").alias("total_payload"),
        F.sum(F.when(F.col("valid"), 0).otherwise(1)).alias("n_corrupt"),
    )


@register("q_media_frame_sampling")
def q_media_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample frames from the video blobs (1 fps), count per media item."""
    vids = _synth_media(spark, sf_dir).filter(F.col("media_type") == "vid")
    frames = mm.sample_frames(vids, every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"), F.max("frame_ts_ms").alias("last_ts_ms")
    )


@register("q_media_features")
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-encoder feature vectors for every media blob (plumbing for the
    embedding-based dedup/similarity operators over media)."""
    feats = mm.extract_features(_synth_media(spark, sf_dir))
    return feats.select(
        "media_id",
        F.size("features").alias("dim"),
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x * x), 4).alias(
            "sq_norm"
        ),
    )
