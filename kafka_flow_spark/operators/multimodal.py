"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

No counterpart in the reference (SURVEY.md §7 Phase 4) — this is the
training-data-pipeline surface: media travels as a ``binary`` column with a
typed metadata struct, and per-item decode/transform runs as Arrow-batched
``mapInPandas`` so 1000 executors each stream their partition of blobs
without ever materializing media on the driver.

STUBBED DECODE: this container has no image/audio codecs (no PIL/ffmpeg), so
the byte-level decode is a deterministic fake — blobs use the ``FAKE`` header
format below, and ``_decode_header`` stands in for libjpeg/ffprobe.  The
Spark-side plumbing (schemas, mapInPandas batch shape, explode semantics,
partitioning) is real and tested; swapping in a real codec changes only the
body of ``_decode_header``/``_frame_bytes``.

Blob format (test fixture standing in for JPEG/WAV/MP4):
``b"FAKE" | media_type 3s | width int32 | height int32 | duration_ms int32 |
payload bytes``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = b"FAKE"
_HEADER = ">4s3siii"  # magic, media_type, width, height, duration_ms
_HEADER_LEN = struct.calcsize(_HEADER)

MEDIA_SCHEMA = (
    "media_id BIGINT, media BINARY, media_type STRING, "
    "width INT, height INT, duration_ms INT"
)
FEATURE_DIM = 16


def pack_blob(
    media_type: str, width: int, height: int, duration_ms: int, payload: bytes
) -> bytes:
    """Build a fake media blob (test fixture / stub-decoder input)."""
    return struct.pack(
        _HEADER, _MAGIC, media_type.encode()[:3], width, height, duration_ms
    ) + payload


def _decode_header(blob: bytes) -> tuple[str, int, int, int, bytes]:
    """STUB for the real codec probe (libjpeg / ffprobe).

    Raises on a non-FAKE blob the way a real decoder raises on corrupt media.
    """
    if blob[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decoding is not available in this container; "
            "blobs must use the FAKE stub format (see module docstring)"
        )
    magic, mt, w, h, dur = struct.unpack(_HEADER, blob[:_HEADER_LEN])
    return mt.decode(), w, h, dur, blob[_HEADER_LEN:]


def decode_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Probe each blob and attach decoded metadata columns.

    ``mapInPandas``: one pass over Arrow batches per partition; corrupt blobs
    yield ``valid = false`` instead of failing the task (dead-letter pattern).
    """
    fields = [c for c in df.columns]
    schema = (
        ", ".join(f"{name} {dtype}" for name, dtype in df.dtypes)
        + ", decoded_type STRING, decoded_width INT, decoded_height INT,"
        + " decoded_duration_ms INT, payload_bytes INT, valid BOOLEAN"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = {
                "decoded_type": [],
                "decoded_width": [],
                "decoded_height": [],
                "decoded_duration_ms": [],
                "payload_bytes": [],
                "valid": [],
            }
            for blob in pdf[media_col]:
                try:
                    mt, w, h, dur, payload = _decode_header(bytes(blob))
                    vals = (mt, w, h, dur, len(payload), True)
                except Exception:  # noqa: BLE001 — corrupt media → dead-letter row
                    vals = (None, None, None, None, None, False)
                for k, v in zip(meta, vals):
                    meta[k].append(v)
            yield pd.concat([pdf.reset_index(drop=True), pd.DataFrame(meta)], axis=1)

    _ = fields
    return df.mapInPandas(run, schema=schema)


def extract_features(
    df: DataFrame, media_col: str = "media", normalize: bool = True
) -> DataFrame:
    """Deterministic feature vector per media item (stub for a CNN/encoder).

    Vectorized: a rolling byte histogram folded to FEATURE_DIM floats in
    numpy — the shape (binary in, ``array<float>`` out, Arrow batches) is
    exactly what a real encoder UDF has.

    ``normalize=False`` emits the RAW integer counts (exactly representable
    in float) — the exact-arithmetic form the oracle-gated media near-dup
    uses so Spark and DuckDB compute cosines from IDENTICAL inputs.
    """
    schema = f"media_id BIGINT, features ARRAY<FLOAT>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf[media_col]:
                _mt, _w, _h, _dur, payload = _decode_header(bytes(blob))
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(
                    np.float32
                )
                if normalize:
                    norm = np.linalg.norm(hist)
                    hist = hist / norm if norm else hist
                feats.append(hist.tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(run, schema=schema)


def payload_expr(media_col: str = "media") -> F.Column:
    """The blob's payload (container header stripped) as a COLUMN EXPRESSION
    — the header is fixed-length, so this is a JVM-side ``substring`` on the
    binary column, no Python in the loop.  A real container (JPEG/MP4) has a
    variable-length header, which would make this a Pandas-UDF slice; the
    fixed stub keeps the hot dedup path whole-stage-codegen."""
    return F.expr(
        f"substring({media_col}, {_HEADER_LEN + 1}, octet_length({media_col}))"
    )


def exact_media_duplicates(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    content_only: bool = True,
) -> DataFrame:
    """Exact media dedup — the ``dedup.exact_duplicates`` twin over a binary
    column: one hash-aggregate on ``sha2`` of the blob, emitting
    (payload_sha, canonical_id = min id, n_copies) per content group.

    ``content_only=True`` (the useful default) hashes the PAYLOAD with the
    container header stripped — content-addressed dedup that ignores
    re-muxed metadata (two uploads of the same image with different
    width/duration stamps are the same asset); ``False`` hashes the whole
    blob byte-exactly.

    Scale shape: pure column expressions + one partial-aggregated groupBy —
    the shuffle carries (sha, min_id, count) triples, never blobs, so a
    100 TB media corpus shuffles ~70 bytes per DISTINCT asset.
    """
    key = payload_expr(media_col) if content_only else F.col(media_col)
    return (
        df.select(F.col(id_col), F.sha2(key, 256).alias("payload_sha"))
        .groupBy("payload_sha")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies"))
    )


def media_quality_gate(
    df: DataFrame,
    media_col: str = "media",
    min_w: int = 32,
    max_w: int = 4096,
    min_h: int = 32,
    max_h: int = 4096,
    max_duration_ms: int = 600_000,
) -> DataFrame:
    """Per-type media quality gate — the text-quality twin (quality.py's
    flag pattern) for blobs: probe each item (``decode_metadata``'s
    dead-letter decode: corrupt media flags, never fails the task) and
    attach ``flags`` + ``passed``:

    - ``corrupt``: the blob does not decode;
    - ``too_small`` / ``too_large``: decoded dimensions outside
      [min_w, max_w] × [min_h, max_h];
    - ``overlong``: decoded duration above ``max_duration_ms`` (time-based
      media only — the decoded-type check exempts images regardless of
      whatever duration stamp their container carries).

    Everything after the Arrow-batched probe is column expressions — the
    gate itself never enters Python.  Output: input columns +
    (flags ARRAY<STRING> sorted, passed BOOLEAN).
    """
    d = decode_metadata(df, media_col)
    corrupt = ~F.col("valid")
    too_small = F.col("valid") & (
        (F.col("decoded_width") < min_w) | (F.col("decoded_height") < min_h)
    )
    too_large = F.col("valid") & (
        (F.col("decoded_width") > max_w) | (F.col("decoded_height") > max_h)
    )
    overlong = (
        F.col("valid")
        & (F.col("decoded_type") == "vid")
        & (F.col("decoded_duration_ms") > max_duration_ms)
    )
    flags = F.array_sort(
        F.filter(
            F.array(
                F.when(corrupt, F.lit("corrupt")),
                F.when(too_small, F.lit("too_small")),
                F.when(too_large, F.lit("too_large")),
                F.when(overlong, F.lit("overlong")),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return d.withColumn("flags", flags).withColumn(
        "passed", F.size("flags") == 0
    )


def resize_images(
    df: DataFrame, target_w: int, target_h: int, media_col: str = "media"
) -> DataFrame:
    """Re-encode each image at a target size (stub resample).

    Real plumbing: output blob + updated metadata; the stub resamples the
    payload by byte-striding proportional to the area change, standing in for
    a real resampler.
    """
    schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "media", "media_type", "width", "height", "duration_ms")}
            for mid, blob in zip(pdf["media_id"], pdf[media_col]):
                mt, w, h, dur, payload = _decode_header(bytes(blob))
                stride = max(1, (w * h) // max(1, target_w * target_h))
                new_payload = payload[::stride]
                out["media_id"].append(mid)
                out["media"].append(pack_blob(mt, target_w, target_h, dur, new_payload))
                out["media_type"].append(mt)
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["duration_ms"].append(dur)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame, every_ms: int, media_col: str = "media"
) -> DataFrame:
    """Explode each video blob into sampled frames every ``every_ms``.

    1→N unnest inside ``mapInPandas`` (no driver involvement); each output row
    is (media_id, frame_index, frame_ts_ms, frame binary).  The stub frame
    extractor slices the payload; a real one seeks the container.
    """
    schema = "media_id BIGINT, frame_index INT, frame_ts_ms INT, frame BINARY"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_index": [], "frame_ts_ms": [], "frame": []}
            for mid, blob in zip(pdf["media_id"], pdf[media_col]):
                mt, w, h, dur, payload = _decode_header(bytes(blob))
                n = max(1, dur // every_ms)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_index"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame"].append(_frame_bytes(payload, i, n))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=schema)


def _frame_bytes(payload: bytes, i: int, n: int) -> bytes:
    """STUB frame extraction: the i-th of n equal payload slices."""
    step = max(1, len(payload) // n)
    return payload[i * step : (i + 1) * step]
