"""Multimodal column plumbing: opaque binary payloads with typed
metadata, decoded / feature-extracted via Arrow-batched mapInPandas.

The image/audio codec libraries are not in this container, so the
actual decode is stubbed (``decode_image`` raises NotImplementedError
unless pillow appears) — but the Spark-side plumbing is real and
tested: binary column + metadata struct schema, Arrow batch transfer,
mapInPandas feature extraction with a deterministic fake decoder whose
output the DuckDB oracle reproduces exactly.

At scale: payloads stay columnar (parquet BYTE_ARRAY) until the Arrow
batch hands them to the extractor; partitioning is whatever the
upstream scan gives (no shuffle introduced); batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal asset table: opaque binary payload + typed
    metadata struct (mime, n_chars). Here the payload is the utf-8
    encoding of the text column; in production it would be image/audio
    bytes read by `binaryFile` or a parquet BYTE_ARRAY column."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"), F.length(text_col).alias("n_chars")
        ).alias("meta"),
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("header_hex", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def decode_image(payload: bytes):
    """Real decode path — stubbed: pillow is not in this container."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires pillow; this container tests the Spark "
            "plumbing with extract_features' deterministic fake decoder"
        ) from e


def _fake_decode(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic stand-in for a decoder: byte length, 4-byte header
    hex, and md5-derived fake dimensions (reproducible in SQL)."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return (
        len(payload),
        payload[:4].hex().upper(),
        320 + h % 1600,
        240 + (h >> 20) % 840,
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (the decode
    / resize / frame-sample slot of a real pipeline).

    The closure is self-contained (stdlib + pandas only) so executors
    never need this package importable — works on a bare cluster
    without shipping a wheel.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def fake_decode(payload: bytes):
            h = int(_hl.md5(payload).hexdigest()[:15], 16)
            return (
                len(payload),
                payload[:4].hex().upper(),
                320 + h % 1600,
                240 + (h >> 20) % 840,
            )

        for pdf in batches:
            feats = [fake_decode(bytes(p)) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": _pd.Series([f[0] for f in feats], dtype="int64"),
                    "header_hex": [f[1] for f in feats],
                    "width": _pd.Series([f[2] for f in feats], dtype="int32"),
                    "height": _pd.Series([f[3] for f in feats], dtype="int32"),
                }
            )

    return assets.mapInPandas(fn, FEATURES_SCHEMA)
