"""Multimodal pipeline queries.

Media blobs are synthesized deterministically from ``documents`` (text bytes
as payload, doc stats as dimensions) so the pipeline runs against the driver's
tables without external media files.  Because the synthesis is pure arithmetic
on documents columns, each query has a real DuckDB oracle that mirrors that
arithmetic in SQL — the comparison therefore verifies the whole Spark path
(pack_blob → mapInPandas decode → aggregate) round-trips the metadata exactly.
The byte-level codec remains the documented FAKE stub (no codecs in this
container); tests/test_multimodal.py is the value-level gate for blob bytes.
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


@register(
    "q_media_decode_stats",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'vid' ELSE 'img' END AS decoded_type,
           COUNT(*) AS n_items,
           CAST(SUM(LEAST(octet_length(encode(COALESCE(text, ''))), 4096)) AS BIGINT)
             AS total_payload,
           CAST(0 AS BIGINT) AS n_corrupt
    FROM documents GROUP BY 1
    """,
)
def q_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode metadata for every blob, aggregate by media type."""
    decoded = mm.decode_metadata(_synth_media(spark, sf_dir))
    return decoded.groupBy("decoded_type").agg(
        F.count("*").alias("n_items"),
        F.sum("payload_bytes").alias("total_payload"),
        F.sum(F.when(F.col("valid"), 0).otherwise(1)).alias("n_corrupt"),
    )


@register(
    "q_media_frame_sampling",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(1 + doc_id % 10 AS BIGINT) AS n_frames,
           CAST((doc_id % 10) * 1000 AS INT) AS last_ts_ms
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def q_media_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample frames from the video blobs (1 fps), count per media item."""
    vids = _synth_media(spark, sf_dir).filter(F.col("media_type") == "vid")
    frames = mm.sample_frames(vids, every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"), F.max("frame_ts_ms").alias("last_ts_ms")
    )


@register(
    "q_media_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(16 AS INT) AS dim,
           CAST(CASE WHEN octet_length(encode(COALESCE(text, ''))) = 0
                THEN 0.0 ELSE 1.0 END AS DOUBLE) AS sq_norm
    FROM documents
    """,
)
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
