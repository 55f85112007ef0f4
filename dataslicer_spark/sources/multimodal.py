"""Multimodal (image/audio/video) columns for training-data pipelines
(north-star extension per BASELINE.json).

Design: media are opaque ``binary`` columns with typed metadata structs.
Decode / resize / feature-extract / frame-sample run as ``mapInPandas``
kernels over Arrow batches — the executor-parallel shape that scales to
100 TB of assets (each task decodes its partition's blobs; no driver
involvement; decoded tensors never shuffle unless asked).

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so
decoders are pluggable callables: the default raises
``NotImplementedError`` naming the dependency, and
``deterministic_fake_decoder`` produces seeded pseudo-media so the Spark
plumbing — schemas, batching, UDF signatures, partitioning — is real and
tested end-to-end.  Swapping in a real codec changes one argument.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..utils import check_col

# typed metadata for opaque media blobs
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def read_binary_assets(
    spark: SparkSession, path_glob: str, media_type: str = "image"
) -> DataFrame:
    """Scan media files into (path, length, content binary, meta struct).

    ``binaryFile`` is the idiomatic Spark source for opaque blobs; at
    scale, prefer ingesting into parquet with the binary column + metadata
    so subsequent reads prune by metadata without touching bytes."""
    raw = spark.read.format("binaryFile").load(path_glob)
    fmt = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        fmt.alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("n_channels"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return raw.select("path", "length", "content", meta.alias("meta"))


def _missing_codec_decoder(raw: bytes) -> np.ndarray:
    raise NotImplementedError(
        "no image codec in this environment (PIL/imageio not installed); "
        "pass decoder= explicitly, e.g. deterministic_fake_decoder for tests"
    )


def deterministic_fake_decoder(
    raw: bytes, height: int = 8, width: int = 8, channels: int = 3
) -> np.ndarray:
    """Seeded pseudo-image from the blob's sha256 — a stand-in codec that
    makes the decode path fully testable and reproducible."""
    seed = int.from_bytes(hashlib.sha256(raw).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (height, width, channels), dtype=np.uint8)


def sha_cycle_decoder(
    raw: bytes, height: int = 8, width: int = 8, channels: int = 3
) -> np.ndarray:
    """SQL-replayable stand-in codec: pixel ``j`` is byte ``j % 32`` of the
    blob's sha256 digest.  Unlike :func:`deterministic_fake_decoder` (which
    routes the digest through numpy's PCG64, opaque to SQL), every pixel
    here is recomputable in any engine with a ``sha256`` function — DuckDB
    replays the full decode + feature math, giving the multimodal pipeline
    a value-level cross-engine oracle instead of a rows-only check."""
    digest = hashlib.sha256(raw).digest()
    n = height * width * channels
    reps = -(-n // len(digest))  # ceil
    flat = np.frombuffer(digest * reps, dtype=np.uint8)[:n]
    return flat.reshape(height, width, channels)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.IntegerType())),  # flattened
    ]
)


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = _missing_codec_decoder,
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """Decode blobs → (path, h, w, c, flattened pixels) via ``mapInPandas``.

    Batch shape: the kernel sees Arrow batches of (path, content); one
    decode per row, vectorized metadata assembly.  Failed decodes become
    NULL-dimension rows rather than task failures (PERMISSIVE analogue).
    """
    check_col([content_col, path_col], df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, raw in zip(pdf[path_col], pdf[content_col]):
                try:
                    arr = decoder(bytes(raw))
                    rows.append(
                        dict(
                            path=path,
                            height=arr.shape[0],
                            width=arr.shape[1],
                            n_channels=arr.shape[2] if arr.ndim > 2 else 1,
                            pixels=arr.reshape(-1).astype("int32"),
                        )
                    )
                except NotImplementedError:
                    raise
                except Exception:  # noqa: BLE001 — corrupt blob → null row
                    rows.append(
                        dict(path=path, height=None, width=None,
                             n_channels=None, pixels=None)
                    )
            yield pd.DataFrame(rows)

    return df.select(path_col, content_col).mapInPandas(run, DECODED_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
        T.StructField("channel_means", T.ArrayType(T.DoubleType())),
    ]
)


def extract_image_features(decoded: DataFrame) -> DataFrame:
    """Per-image intensity statistics from decoded pixel arrays — the
    feature-extraction stage's plumbing (swap the numpy body for a real
    embedding model's batch inference; the Spark shape is identical).

    Statistics are computed from *exact integer* pixel sums (``s``,
    ``ssq`` are exact in int64 for any image < 2^53 total intensity) and
    a fixed IEEE op sequence — ``mean = s/n``, ``std = sqrt((ssq -
    s*s/n)/n)`` (population std, matching ``np.std`` ddof=0) — so the
    same formula in another engine reproduces the doubles bit-for-bit.
    """
    check_col(["path", "pixels", "height", "width", "n_channels"], decoded)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if r.pixels is None:
                    rows.append(dict(path=r.path, mean_intensity=None,
                                     std_intensity=None, channel_means=None))
                    continue
                arr = np.asarray(r.pixels, dtype=np.int64).reshape(
                    r.height, r.width, r.n_channels
                )
                n = arr.size
                s = int(arr.sum())
                ssq = int((arr * arr).sum())
                var = (ssq - s * s / n) / n
                rows.append(
                    dict(
                        path=r.path,
                        mean_intensity=s / n,
                        std_intensity=math.sqrt(var) if var > 0 else 0.0,
                        channel_means=[
                            int(c) / (n // r.n_channels)
                            for c in arr.sum(axis=(0, 1))
                        ],
                    )
                )
            yield pd.DataFrame(rows)

    return decoded.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(
    decoded: DataFrame, out_height: int, out_width: int
) -> DataFrame:
    """Resize decoded images to (out_height, out_width) — nearest-neighbor
    index sampling in pure numpy (no codec dependency; swap the body for
    PIL/cv2 interpolation in deployments that have them).

    Output schema matches :data:`DECODED_SCHEMA`, so resize composes with
    :func:`extract_image_features` — the standard decode → resize →
    featurize pipeline shape.  NULL (failed-decode) rows pass through.
    """
    check_col(["path", "pixels", "height", "width", "n_channels"], decoded)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if r.pixels is None:
                    rows.append(dict(path=r.path, height=None, width=None,
                                     n_channels=None, pixels=None))
                    continue
                arr = np.asarray(r.pixels, dtype=np.int32).reshape(
                    r.height, r.width, r.n_channels
                )
                yi = (np.arange(out_height) * r.height) // out_height
                xi = (np.arange(out_width) * r.width) // out_width
                res = arr[yi][:, xi]
                rows.append(
                    dict(path=r.path, height=out_height, width=out_width,
                         n_channels=r.n_channels,
                         pixels=res.reshape(-1))
                )
            yield pd.DataFrame(rows)

    return decoded.mapInPandas(run, DECODED_SCHEMA)


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """Video frame sampling plumbing: blob → ``n_frames`` evenly-spaced
    decoded frames (one output row per frame).  Without a video codec the
    fake decoder treats the blob as ``n_frames`` independent seeds."""
    check_col([content_col, path_col], df)
    dec = decoder or (
        lambda raw, i: deterministic_fake_decoder(raw + bytes([i]))
    )

    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.IntegerType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, raw in zip(pdf[path_col], pdf[content_col]):
                for i in range(n_frames):
                    arr = dec(bytes(raw), i)
                    rows.append(
                        dict(path=path, frame_idx=i, height=arr.shape[0],
                             width=arr.shape[1],
                             pixels=arr.reshape(-1).astype("int32"))
                    )
            yield pd.DataFrame(rows)

    return df.select(path_col, content_col).mapInPandas(run, schema)


__all__ = [
    "MEDIA_META_SCHEMA",
    "read_binary_assets",
    "deterministic_fake_decoder",
    "decode_media",
    "extract_image_features",
    "resize_images",
    "frame_sample",
]
