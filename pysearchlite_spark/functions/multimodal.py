"""Multimodal (image/audio/video) columns for training-data pipelines.

Media are opaque `binary` columns + typed metadata structs. Decoding is
SPEC'D BEHAVIOR, not a stub: this module defines a deterministic,
dependency-free raw container family (PSL1/PSLA/PSLV — documented below)
that decode/feature kernels parse with real pixel/sample math, plus an
import-guarded Pillow path for standard formats (JPEG/PNG) when the library
exists. Everything is reproducible across processes with stdlib+numpy only.

Container formats (all little-endian):
  PSL1 (image): b"PSL1" | u16 width | u16 height | u8 channels |
                width*height*channels uint8 pixels, row-major, channel-last.
  PSLA (audio): b"PSLA" | u32 sample_rate | u32 n_samples |
                n_samples int16 PCM mono samples.
  PSLV (video): b"PSLV" | u16 n_frames | n_frames x (u32 len | PSL1 blob).

Feature specs (deterministic, fixed FEATURE_DIM=64):
  image: [per-channel mean/255 (3), per-channel std/255 (3),
          58-bin luminance histogram (fraction of pixels/bin)] — channels<3
          broadcast to 3.
  audio: [duration_sec, rms, zero_crossing_rate, 61-bin amplitude histogram].

Design notes for 100 TB:
  * media bytes never pass through Python row-at-a-time — they move as Arrow
    binary batches into mapInPandas; per-blob work is numpy over frombuffer.
  * cap rows per Arrow batch (spark.sql.execution.arrow.maxRecordsPerBatch)
    so a batch of large blobs stays within worker memory.
  * outputs are fixed-size array<float> vectors + metadata structs, so
    downstream joins/ANN run JVM-side.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = ("struct<width:int, height:int, channels:int, "
                     "format:string>")
FEATURE_DIM = 64

try:  # import-guarded real decoder for standard formats
    from PIL import Image as _PIL_Image  # noqa: N812
except ImportError:  # pragma: no cover - container has no Pillow
    _PIL_Image = None


# ------------------------------------------------------------- containers --

def encode_image(pixels: np.ndarray) -> bytes:
    """uint8 (H, W) or (H, W, C) array → PSL1 blob."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    return b"PSL1" + struct.pack("<HHB", w, h, c) + a.tobytes()


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM → PSLA blob."""
    s = np.asarray(samples, dtype=np.int16)
    return (b"PSLA" + struct.pack("<II", sample_rate, s.size) + s.tobytes())


def encode_video(frames: list) -> bytes:
    """List of uint8 frame arrays → PSLV blob of PSL1 frames."""
    blobs = [encode_image(f) for f in frames]
    out = [b"PSLV", struct.pack("<H", len(blobs))]
    for b in blobs:
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def decode_image(data: bytes) -> Tuple[dict, Optional[np.ndarray]]:
    """(meta, pixels uint8 (H, W, C)) — PSL1 natively; JPEG/PNG/... via
    Pillow when installed; otherwise raises ValueError naming the gap."""
    if data[:4] == b"PSL1":
        w, h, c = struct.unpack_from("<HHB", data, 4)
        if w == 0 or h == 0 or c == 0:
            # fail loudly HERE: downstream feature math on a zero-sized
            # axis is an obscure IndexError or silent NaN features
            raise ValueError(
                f"degenerate PSL1 image dimensions {w}x{h}x{c}")
        px = np.frombuffer(data, dtype=np.uint8, count=w * h * c, offset=9)
        return ({"width": w, "height": h, "channels": c, "format": "psl1"},
                px.reshape(h, w, c))
    if _PIL_Image is not None:
        import io
        img = _PIL_Image.open(io.BytesIO(data))
        px = np.asarray(img.convert("RGB"), dtype=np.uint8)
        return ({"width": img.width, "height": img.height, "channels": 3,
                 "format": (img.format or "unknown").lower()}, px)
    raise ValueError(
        "unsupported image container (not PSL1) and Pillow is not "
        "installed — pip install Pillow for JPEG/PNG decode")


def decode_audio(data: bytes) -> Tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from a PSLA blob."""
    if data[:4] != b"PSLA":
        raise ValueError("unsupported audio container (not PSLA) — install "
                         "soundfile/ffmpeg bindings for standard formats")
    rate, n = struct.unpack_from("<II", data, 4)
    return rate, np.frombuffer(data, dtype=np.int16, count=n, offset=12)


def decode_video_frames(data: bytes) -> list:
    """PSLV blob → list of PSL1 frame blobs (bytes, undecoded)."""
    if data[:4] != b"PSLV":
        raise ValueError("unsupported video container (not PSLV) — install "
                         "ffmpeg bindings for standard formats")
    (n_frames,) = struct.unpack_from("<H", data, 4)
    out, off = [], 6
    for _ in range(n_frames):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        out.append(data[off:off + ln])
        off += ln
    return out


# ---------------------------------------------------------------- features --

def image_feature_vec(pixels: np.ndarray) -> np.ndarray:
    """Spec'd 64-dim image feature: 3x mean/255, 3x std/255, 58-bin
    luminance histogram (pixel fractions). Real pixel math, deterministic."""
    px = pixels.astype(np.float64)
    if px.shape[2] < 3:  # broadcast gray to 3 channels
        px = np.repeat(px[:, :, :1], 3, axis=2)
    mean = px.mean(axis=(0, 1))[:3] / 255.0
    std = px.std(axis=(0, 1))[:3] / 255.0
    luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2])
    hist, _ = np.histogram(luma, bins=58, range=(0.0, 255.0))
    hist = hist / max(1, luma.size)
    return np.concatenate([mean, std, hist]).astype(np.float32)


def audio_feature_vec(rate: int, samples: np.ndarray) -> np.ndarray:
    """Spec'd 64-dim audio feature: duration, rms, zero-crossing rate,
    61-bin |amplitude| histogram."""
    s = samples.astype(np.float64) / 32768.0
    dur = s.size / max(1, rate)
    rms = float(np.sqrt((s * s).mean())) if s.size else 0.0
    zcr = (float((np.signbit(s[1:]) != np.signbit(s[:-1])).mean())
           if s.size > 1 else 0.0)
    hist, _ = np.histogram(np.abs(s), bins=61, range=(0.0, 1.0))
    hist = hist / max(1, s.size)
    return np.concatenate([[dur, rms, zcr], hist]).astype(np.float32)


# ------------------------------------------------------------- operators ---

def _quarantine_mode(on_error: str) -> bool:
    """on_error contract shared by the media operators: 'raise' (default)
    fails the job on the first corrupt blob — right for curated fixtures,
    wrong for a 100-TB crawl where one bad row would kill the whole
    featurization after task retries. 'quarantine' keeps the job alive:
    corrupt rows come back with NULL outputs plus a `decode_error` string
    column (filter on it to route rows to a quarantine sink); good rows
    carry decode_error=NULL. The extra column exists ONLY in quarantine
    mode, so default-mode schemas are unchanged."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(
            f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
    return on_error == "quarantine"


def image_features(df: DataFrame, id_col: str = "doc_id",
                   media_col: str = "media",
                   on_error: str = "raise") -> DataFrame:
    """(id, meta struct, feature array<float>[, decode_error string]) —
    decode + featurize each image binary, Arrow-batched (the sanctioned
    mapInPandas shape). on_error: see _quarantine_mode."""
    quarantine = _quarantine_mode(on_error)
    out_schema = (f"{id_col} long, meta {IMAGE_META_SCHEMA}, "
                  f"feature array<float>"
                  + (", decode_error string" if quarantine else ""))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, feats, errs = [], [], []
            for blob in pdf[media_col]:
                try:
                    meta, px = decode_image(bytes(blob or b""))
                    feat = image_feature_vec(px).tolist()
                except Exception as e:  # noqa: BLE001 - per-row quarantine
                    if not quarantine:
                        raise
                    meta, feat = None, None
                    errs.append(f"{type(e).__name__}: {e}")
                else:
                    errs.append(None)
                metas.append(meta)
                feats.append(feat)
            data = {id_col: pdf[id_col], "meta": metas, "feature": feats}
            if quarantine:
                data["decode_error"] = errs
            yield pd.DataFrame(data)

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


def audio_features(df: DataFrame, id_col: str = "doc_id",
                   media_col: str = "media",
                   on_error: str = "raise") -> DataFrame:
    """(id, sample_rate, duration_sec, feature array<float>
    [, decode_error string]). on_error: see _quarantine_mode."""
    quarantine = _quarantine_mode(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, durs, feats, errs = [], [], [], []
            for blob in pdf[media_col]:
                try:
                    rate, samples = decode_audio(bytes(blob or b""))
                    dur = samples.size / max(1, rate)
                    feat = audio_feature_vec(rate, samples).tolist()
                except Exception as e:  # noqa: BLE001 - per-row quarantine
                    if not quarantine:
                        raise
                    rate, dur, feat = None, None, None
                    errs.append(f"{type(e).__name__}: {e}")
                else:
                    errs.append(None)
                rates.append(rate)
                durs.append(dur)
                feats.append(feat)
            data = {id_col: pdf[id_col], "sample_rate": rates,
                    "duration_sec": durs, "feature": feats}
            if quarantine:
                data["decode_error"] = errs
            yield pd.DataFrame(data)

    return df.select(id_col, media_col).mapInPandas(
        run, f"{id_col} long, sample_rate int, duration_sec double, "
             f"feature array<float>"
             + (", decode_error string" if quarantine else ""))


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 media_col: str = "media", every_n: int = 1,
                 on_error: str = "raise") -> DataFrame:
    """Video → sampled frames (id, frame_no, frame binary): keep every
    `every_n`-th frame. One output row per frame — the correct shape for
    downstream per-frame featurization at scale (explode early, then
    repartition by bytes, not rows). In quarantine mode a corrupt video
    yields ONE row (frame_no/frame NULL, decode_error set) so the doc
    stays visible for quarantine routing instead of vanishing."""
    quarantine = _quarantine_mode(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames, errs = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[media_col]):
                try:
                    blobs = decode_video_frames(bytes(blob or b""))
                except Exception as e:  # noqa: BLE001 - per-row quarantine
                    if not quarantine:
                        raise
                    ids.append(i)
                    frame_nos.append(None)
                    frames.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
                    continue
                for f_no, fb in enumerate(blobs):
                    if f_no % every_n == 0:
                        ids.append(i)
                        frame_nos.append(f_no)
                        frames.append(fb)
                        errs.append(None)
            data = {id_col: ids, "frame_no": frame_nos, "frame": frames}
            if quarantine:
                data["decode_error"] = errs
            yield pd.DataFrame(data)

    return df.select(id_col, media_col).mapInPandas(
        run, f"{id_col} long, frame_no int, frame binary"
             + (", decode_error string" if quarantine else ""))


def media_stats(df: DataFrame, id_col: str = "doc_id",
                media_col: str = "media") -> DataFrame:
    """Pure-JVM media accounting: size, sha for dedup joins. No Python."""
    return df.select(
        F.col(id_col),
        F.length(media_col).cast("long").alias("n_bytes"),
        F.sha2(F.col(media_col), 256).alias("sha256"))
