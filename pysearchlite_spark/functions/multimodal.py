"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque `binary` columns + typed metadata structs; all Spark-side
plumbing — schemas, batch shapes, partition sizing, UDF signatures — is real
and tested. The actual codec work (JPEG decode, resampling, frame extract)
needs libraries this container doesn't ship (PIL/ffmpeg/torchaudio), so the
decode kernels are STUBBED: by default they raise NotImplementedError with
the dependency named; with deterministic=True they produce a seeded fake
(stable across processes) so downstream plumbing can be exercised end-to-end.

Design notes for 100 TB:
  * media bytes never pass through Python row-at-a-time — they move as Arrow
    binary batches into mapInPandas;
  * `media_batch_rows` caps rows per Arrow batch so a batch of large blobs
    stays within worker memory (set spark.sql.execution.arrow.maxRecordsPerBatch
    accordingly before calling);
  * outputs carry fixed-size feature vectors (array<float>) + metadata, so
    downstream joins/ANN work JVM-side.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = ("struct<width:int, height:int, channels:int, "
                     "format:string>")
FEATURE_DIM = 64


def _fake_feature(data: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: hash-seeded pseudo-embedding."""
    seed = int.from_bytes(hashlib.blake2b(data or b"", digest_size=8)
                          .digest(), "big") % (2**32)
    return np.random.default_rng(seed).standard_normal(dim) \
        .astype(np.float32)


def decode_image(data: bytes, deterministic: bool = False) -> dict:
    """STUB — real impl needs PIL/libjpeg (not in this container)."""
    if not deterministic:
        raise NotImplementedError(
            "image decode requires Pillow; install and replace this stub "
            "(pysearchlite_spark/functions/multimodal.py:decode_image)")
    seed = int.from_bytes(hashlib.blake2b(data or b"", digest_size=4)
                          .digest(), "big")
    return {"width": 64 + seed % 512, "height": 64 + (seed >> 4) % 512,
            "channels": 3, "format": "fake"}


def image_features(df: DataFrame, id_col: str = "doc_id",
                   media_col: str = "media", deterministic: bool = False
                   ) -> DataFrame:
    """(id, meta struct, feature array<float>) — decode + featurize each
    image binary, Arrow-batched. The batch loop is the sanctioned pandas-UDF
    shape; swap _fake_feature/decode_image for real kernels when libs exist."""

    out_schema = (f"{id_col} long, meta {IMAGE_META_SCHEMA}, "
                  f"feature array<float>")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, feats = [], []
            for blob in pdf[media_col]:
                b = bytes(blob) if blob is not None else b""
                metas.append(decode_image(b, deterministic=deterministic))
                feats.append(_fake_feature(b, FEATURE_DIM).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "meta": metas,
                                "feature": feats})

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 media_col: str = "media", every_n: int = 30,
                 deterministic: bool = False) -> DataFrame:
    """Video → sampled frames (id, frame_no, frame binary). STUB decode;
    deterministic mode emits seeded fake frames so the explode/partition
    plumbing is testable. Output is one row per frame — the correct shape
    for downstream per-frame featurization at scale (explode early, then
    repartition by bytes, not rows)."""
    if not deterministic:
        def run(batches):
            raise NotImplementedError(
                "video decode requires ffmpeg; replace this stub "
                "(pysearchlite_spark/functions/multimodal.py:frame_sample)")
            yield  # pragma: no cover
    else:
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, frame_nos, frames = [], [], []
                for i, blob in zip(pdf[id_col], pdf[media_col]):
                    b = bytes(blob) if blob is not None else b""
                    n_frames = 1 + (len(b) % 5)
                    for f_no in range(n_frames):
                        ids.append(i)
                        frame_nos.append(f_no * every_n)
                        frames.append(hashlib.blake2b(
                            b + f_no.to_bytes(4, "big"),
                            digest_size=32).digest())
                yield pd.DataFrame({id_col: ids, "frame_no": frame_nos,
                                    "frame": frames})

    return df.select(id_col, media_col).mapInPandas(
        run, f"{id_col} long, frame_no int, frame binary")


def media_stats(df: DataFrame, id_col: str = "doc_id",
                media_col: str = "media") -> DataFrame:
    """Pure-JVM media accounting: size, sha for dedup joins. No Python."""
    return df.select(
        F.col(id_col),
        F.length(media_col).cast("long").alias("n_bytes"),
        F.sha2(F.col(media_col), 256).alias("sha256"))
