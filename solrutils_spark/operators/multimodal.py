"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-aware batch
shapes, Arrow UDF signatures, metadata extraction; the codec-dependent decode
step is STUBBED (image/audio libraries are not in this container) behind
``NotImplementedError`` with a deterministic fake used by tests.

Schema convention for a multimodal table::

    (item_id long, modality string, payload binary, meta struct<
        mime string, width int, height int, duration_ms int, sample_rate int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solrutils_spark.operators.util import _extend_schema

MULTIMODAL_DDL = (
    "item_id long, modality string, payload binary, "
    "meta struct<mime string, width int, height int, duration_ms int, sample_rate int>"
)

FEATURE_DIM = 64


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — real impl needs Pillow/libjpeg (not in this container)."""
    raise NotImplementedError("image decode requires an image codec library")


def decode_audio(payload: bytes) -> "np.ndarray":
    """STUB — real impl needs soundfile/ffmpeg (not in this container)."""
    raise NotImplementedError("audio decode requires an audio codec library")


def fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature: seeded from payload sha256. Lets the
    whole distributed pipeline (batching, schema, joins) be tested without
    codecs; swap with a real extractor in production."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_features(
    df: DataFrame,
    feature_fn: Callable[[bytes], np.ndarray] = fake_feature,
    payload_col: str = "payload",
    out_col: str = "feature",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """payload → feature vector, Arrow-batched. The UDF signature/batch shape
    is the production one; only ``feature_fn`` is a stand-in."""
    cols = df.columns
    schema = _extend_schema(df, out_col, "array<float>")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[payload_col].map(
                lambda b: feature_fn(bytes(b)).tolist() if b is not None else None
            )
            yield pdf[cols + [out_col]]

    return df.mapInPandas(gen, schema)


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload") -> DataFrame:
    """STUB pipeline stage — plumbing (schema/partitioning) real, decode not."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError("image resize requires an image codec library")
        yield  # pragma: no cover

    return df.mapInPandas(gen, df.schema)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  payload_col: str = "payload") -> DataFrame:
    """STUB: video → frame rows (one→many). Schema contract is real."""
    schema = "item_id long, frame_idx int, frame binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError("frame sampling requires a video codec library")
        yield  # pragma: no cover

    return df.select("item_id", payload_col).mapInPandas(gen, schema)


def payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real (no codec needed): size + sha256 + magic-byte mime sniff, all
    JVM-side except the tiny sniff map."""
    magic = F.hex(F.substring(F.col(payload_col).cast("binary"), 1, 4))
    mime = (
        F.when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic.startswith("89504E47"), "image/png")
        .when(magic.startswith("47494638"), "image/gif")
        .when(magic.startswith("52494646"), "audio/wav")
        .when(magic.startswith("494433"), "audio/mpeg")
        .otherwise("application/octet-stream")
    )
    return df.select(
        "*",
        F.length(payload_col).alias("payload_bytes"),
        F.sha2(F.col(payload_col), 256).alias("payload_sha256"),
        mime.alias("sniffed_mime"),
    )


def synth_multimodal(spark, n: int = 100) -> DataFrame:
    """Deterministic fake multimodal table for tests (payload = seeded bytes
    with a real JPEG/PNG magic prefix)."""
    rows = []
    for i in range(n):
        seed_bytes = hashlib.sha256(f"mm:{i}".encode()).digest() * 4
        if i % 3 == 0:
            payload = b"\xff\xd8\xff\xe0" + seed_bytes
            modality, mime, w, h, dur, sr = "image", "image/jpeg", 640, 480, None, None
        elif i % 3 == 1:
            payload = b"\x89PNG" + seed_bytes
            modality, mime, w, h, dur, sr = "image", "image/png", 320, 240, None, None
        else:
            payload = b"RIFF" + seed_bytes
            modality, mime, w, h, dur, sr = "audio", "audio/wav", None, None, 2000, 16000
        rows.append((i, modality, payload, (mime, w, h, dur, sr)))
    return spark.createDataFrame(rows, MULTIMODAL_DDL)
