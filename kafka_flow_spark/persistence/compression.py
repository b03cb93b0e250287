"""State-blob compression envelope (reference #38).

Format (core/.../persistence/compression/Compressor.scala:27-96,
Compression.scala:26-77): ``| header_len int32 BE | header JSON | payload |``.
The header records whether the payload is compressed; compression is applied
only above a size threshold (default 10000 bytes — Compressor.scala:56).
Backward compat: a blob starting with ``{`` is sniffed as raw uncompressed
JSON with no envelope (Compressor.scala:77-96).

Codec: the reference uses LZ4; this container has no lz4 binding, so the
codec is zlib behind the same envelope (the header names the codec, so both
can coexist — a reader honors whatever the header says).

DataFrame surface: Arrow-batched pandas UDFs over ``binary`` columns — the
envelope is pure byte-twiddling, the documented Python-path exception.
"""

from __future__ import annotations

import json
import struct
import zlib

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.pandas.functions import pandas_udf

DEFAULT_THRESHOLD = 10000  # bytes, Compressor.scala:56


def compress(payload: bytes, threshold: int = DEFAULT_THRESHOLD) -> bytes:
    """Wrap ``payload`` in the envelope, compressing above ``threshold``."""
    compressed = len(payload) >= threshold
    body = zlib.compress(payload) if compressed else payload
    header = json.dumps({"compressed": compressed, "codec": "zlib"}).encode()
    return struct.pack(">i", len(header)) + header + body


def decompress(blob: bytes) -> bytes:
    """Unwrap an envelope; raw-JSON blobs (legacy, no envelope) pass through."""
    if blob[:1] == b"{":  # backward-compat sniff (Compressor.scala:77-96)
        return blob
    (hlen,) = struct.unpack(">i", blob[:4])
    header = json.loads(blob[4 : 4 + hlen])
    body = blob[4 + hlen :]
    return zlib.decompress(body) if header.get("compressed") else body


def compressed_json_codec(threshold: int = DEFAULT_THRESHOLD):
    """State codec for FlowSpec: JSON → thresholded compression envelope.

    Returns (encode, decode, state_schema) — plug into
    ``FlowSpec(encode_state=…, decode_state=…, state_schema=…)`` to persist
    large per-key states the way the reference wraps them through Compressor
    before Cassandra/Kafka writes (CassandraPersistence.scala:31 +
    Compressor.scala:55-69).
    """
    import json as _json

    def encode(state) -> tuple:
        return (compress(_json.dumps(state, sort_keys=True, default=str).encode(), threshold),)

    def decode(stored) -> object:
        return _json.loads(decompress(bytes(stored[0])))

    return encode, decode, "value BINARY"


def compress_col(c: Column, threshold: int = DEFAULT_THRESHOLD) -> Column:
    @pandas_udf("binary")
    def _compress(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: None if b is None else compress(bytes(b), threshold))

    return _compress(c)


def decompress_col(c: Column) -> Column:
    @pandas_udf("binary")
    def _decompress(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: None if b is None else decompress(bytes(b)))

    return _decompress(c)
