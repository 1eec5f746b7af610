"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star surface for 100 TB multimodal training pipelines. The Spark-side
plumbing is real (schemas, Arrow-batched mapInPandas, partitioning); the
actual codec work is stubbed behind clearly-marked hooks because media
libraries are not available in this environment — swap `_decode_image` for
PIL/ffmpeg in production.

Design rules for scale:
  - binary payloads stay opaque until the last possible stage (no decode
    before filtering on metadata — predicate pushdown on the metadata
    columns prunes the scan first)
  - decode/feature-extract runs in mapInPandas over Arrow batches, one
    Python worker per partition, no shuffle
  - frame-sampling/resize emit new binary columns, never driver-side bytes
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def attach_media_columns(df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Wrap an existing binary column with typed metadata columns."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.lit(mime).alias("mime"),
        F.length(payload_col).cast("int").alias("payload_bytes"),
    )


def _decode_image(payload: bytes) -> "object":
    """STUB: real implementation uses PIL.Image.open(io.BytesIO(payload)).
    Not available in this container."""
    raise NotImplementedError("image decode requires PIL — not in this environment")


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature extractor: md5-seeded pseudo-features.
    Keeps the full pipeline testable end-to-end; the Arrow batch shape,
    schema and partition behavior are identical to a real extractor."""
    h = hashlib.md5(payload).digest()
    out = []
    for i in range(dim):
        b = h[i % 16]
        out.append(((b * (i + 7)) % 255) / 255.0 * 2.0 - 1.0)
    return out


def extract_features(
    df: DataFrame, payload_col: str = "payload", dim: int = 16, use_stub: bool = True
) -> DataFrame:
    """Feature extraction over Arrow batches (mapInPandas). Output schema:
    input columns + features array<float>."""
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_stub:
                pdf = pdf.assign(
                    features=pdf[payload_col].map(
                        lambda p: _fake_features(bytes(p), dim) if p is not None else None
                    )
                )
            else:  # pragma: no cover - requires media libs
                pdf = pdf.assign(
                    features=pdf[payload_col].map(lambda p: _decode_image(bytes(p)))
                )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame, payload_col: str = "payload", every_n_bytes: int = 1024, max_frames: int = 4
) -> DataFrame:
    """Frame sampling stub: emits one row per sampled 'frame' (byte-slice
    stand-in for video frame extraction — the explode/one-to-many row shape
    and binary output column are the real contract)."""
    import pandas as pd

    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != payload_col]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    other_cols = [f.name for f in df.schema.fields if f.name != payload_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[payload_col]) if r[payload_col] is not None else b""
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    rows.append(
                        {
                            **{c: r[c] for c in other_cols},
                            "frame_idx": i,
                            "frame": payload[i * every_n_bytes : (i + 1) * every_n_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=other_cols + ["frame_idx", "frame"])

    return df.mapInPandas(run, schema=out_schema)
