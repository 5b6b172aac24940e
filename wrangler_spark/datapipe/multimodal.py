"""Multimodal binary-column plumbing: decode / feature-extract / resize /
frame-sample over opaque `binary` payloads with typed metadata.

The Spark-side shape is real and tested — schema contracts, Arrow batch
transfer via mapInPandas, partition sizing — while the actual media
decoding is stubbed: this container ships no image/audio libraries, so
`decode_image`/`decode_audio` raise NotImplementedError unless a decoder
is registered, and `fake_features` provides a deterministic byte-level
extractor so pipelines (and the driver's checks) stay runnable.

At 100 TB: payloads should be read with `spark.read.format("binaryFile")`
or from parquet with a binary column; keep
`spark.sql.files.maxPartitionBytes` at 128–256 MB so a partition of
payload bytes fits executor memory, and mapInPandas streams one Arrow
batch at a time (bounded memory regardless of file count).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Registered real decoders (host app can plug in PIL/librosa/etc.)
_DECODERS: dict[str, Callable[[bytes], Any]] = {}


def register_decoder(kind: str, fn: Callable[[bytes], Any]) -> None:
    _DECODERS[kind.lower()] = fn


def attach_binary(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Test helper: synthesize a binary payload column from text (the
    driver tables have no binary columns; real pipelines read binaryFile
    or parquet binary directly)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("crc32", T.LongType()),
        T.StructField("md5_prefix", T.StringType()),
        T.StructField("byte_entropy_q", T.LongType()),
    ]
)


def _fake_feature_row(b: bytes | None) -> tuple | None:
    """Deterministic byte-level features — the stand-in for a real
    image/audio feature extractor (embedding, spectrogram stats, ...).
    md5 (not sha1) so the DuckDB oracle can mirror the digest."""
    if b is None:
        return None
    counts = [0] * 16
    for x in b[:4096]:
        counts[x >> 4] += 1
    total = max(sum(counts), 1)
    # quantized entropy proxy: number of non-rare nibble buckets
    q = sum(1 for c in counts if c / total > 0.02)
    return (len(b), zlib.crc32(b) & 0xFFFFFFFF, hashlib.md5(b).hexdigest()[:12], q)


def extract_features(
    df: DataFrame, payload_col: str = "payload", out_col: str = "features"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the real plumbing any decoder plugs into."""
    in_schema = df.schema
    out_schema = T.StructType(list(in_schema.fields) + [T.StructField(out_col, FEATURE_SCHEMA)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[payload_col].map(_fake_feature_row)
            yield pdf

    return df.mapInPandas(run, out_schema)


def decode_image(df: DataFrame, payload_col: str = "payload", out_col: str = "image") -> DataFrame:
    """Decode image payloads → struct(width, height, mode). Requires a
    registered decoder ('image'); the container has no imaging library."""
    dec = _DECODERS.get("image")
    if dec is None:
        raise NotImplementedError(
            "no image decoder registered — call register_decoder('image', fn) "
            "with a PIL/opencv-backed callable; this container ships none"
        )
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(
                out_col,
                T.StructType(
                    [
                        T.StructField("width", T.IntegerType()),
                        T.StructField("height", T.IntegerType()),
                        T.StructField("mode", T.StringType()),
                    ]
                ),
            )
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[payload_col].map(lambda b: None if b is None else dec(b))
            yield pdf

    return df.mapInPandas(run, out_schema)


def frame_sample_plan(
    df: DataFrame, payload_col: str = "payload", every_n: int = 30
) -> DataFrame:
    """Video frame-sampling *plan*: emits (payload, frame_index) rows for a
    downstream decoder — demonstrates the explode-shaped row generation
    without decoding (frame count approximated from payload size)."""
    approx_frames = F.greatest((F.length(F.col(payload_col)) / 1024).cast("int"), F.lit(1))
    idx = F.explode(F.sequence(F.lit(0), approx_frames - 1, F.lit(every_n)))
    return df.withColumn("frame_index", idx)
