"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct
— the Spark-side schema, partitioning, Arrow batch shape, and UDF
signatures here are real and tested; the codec calls are STUBBED
(this container ships no image/audio libraries) behind
``_decode_image_bytes`` / ``_decode_audio_bytes``: deterministic fakes
driven by the byte content, or ``NotImplementedError`` when
``strict=True``. Swapping in PIL/torchaudio later changes only those
two private functions.

Design for scale: all media UDFs are ``mapInPandas`` iterators — one
Python worker per partition, Arrow-batched, bounded memory per batch
(`spark.sql.execution.arrow.maxRecordsPerBatch` × max blob size).
Heavy blobs should live in their own column family / parquet file so
text-only queries never scan them (column pruning).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_channels int, "
    "sample_rate int, duration_ms int, codec string"
)


def _blob_rng(blob: bytes) -> np.random.Generator:
    """Deterministic per-blob RNG (sha256-digest seed) — the single
    source of the stub decoders' fake-but-stable content."""
    d = hashlib.sha256(blob).digest()
    return np.random.default_rng(struct.unpack("<Q", d[:8])[0])


def _decode_image_bytes(blob: bytes, strict: bool = False) -> np.ndarray:
    """STUB decode: real impl would be PIL.Image.open(BytesIO(blob)).

    Deterministic fake: a 4x4x3 uint8 array seeded from the blob
    digest, so tests are stable and pipelines exercise real shapes."""
    if strict:
        raise NotImplementedError("image codec not available in this container")
    return _blob_rng(blob).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)


def _decode_audio_bytes(blob: bytes, strict: bool = False) -> np.ndarray:
    """STUB decode: real impl would be soundfile/torchaudio."""
    if strict:
        raise NotImplementedError("audio codec not available in this container")
    return _blob_rng(blob).normal(0, 0.1, size=256).astype(np.float32)


def extract_image_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_cols: tuple[str, ...] = ("media_id",),
    n_features: int = 8,
) -> DataFrame:
    """binary blobs → fixed-dim feature vectors (mean-pool channels of
    the decoded image; stub decoder). Output: *id_cols, features
    array<float>, img_width int, img_height int."""
    id_cols = list(id_cols)
    schema = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in id_cols)
    schema += ", features array<float>, img_width int, img_height int"

    def fe(batches):
        for pdf in batches:
            feats, ws, hs = [], [], []
            for blob in pdf[blob_col]:
                img = _decode_image_bytes(bytes(blob))
                pooled = img.reshape(-1, img.shape[-1]).mean(axis=0)
                v = np.resize(pooled / 255.0, n_features).astype(np.float32)
                feats.append(v.tolist())
                hs.append(img.shape[0])
                ws.append(img.shape[1])
            out = pdf[id_cols].copy()
            out["features"] = feats
            out["img_width"] = np.array(ws, dtype=np.int32)
            out["img_height"] = np.array(hs, dtype=np.int32)
            yield out

    return df.select(*id_cols, blob_col).mapInPandas(fe, schema)


def sample_audio_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_cols: tuple[str, ...] = ("media_id",),
    n_frames: int = 4,
    frame_size: int = 16,
) -> DataFrame:
    """binary audio → n evenly-spaced frames of RMS energy.
    Output: *id_cols, frame_idx int, rms double."""
    id_cols = list(id_cols)
    schema = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in id_cols)
    schema += ", frame_idx int, rms double"

    def fe(batches):
        for pdf in batches:
            rows = {c: [] for c in id_cols}
            rows["frame_idx"], rows["rms"] = [], []
            for i, blob in enumerate(pdf[blob_col]):
                wave = _decode_audio_bytes(bytes(blob))
                step = max(1, (len(wave) - frame_size) // max(1, n_frames - 1))
                for j in range(n_frames):
                    frame = wave[j * step: j * step + frame_size]
                    for c in id_cols:
                        rows[c].append(pdf[c].iloc[i])
                    rows["frame_idx"].append(j)
                    rows["rms"].append(float(np.sqrt((frame ** 2).mean())))
            yield pd.DataFrame(rows)

    return df.select(*id_cols, blob_col).mapInPandas(fe, schema)


def media_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Attach a typed metadata struct (JVM-side where possible: size,
    magic-byte sniffing; decode-dependent fields from the stub)."""
    magic = F.hex(F.substring(F.col(blob_col), 1, 4))
    return df.withColumn("blob_size", F.length(F.col(blob_col))).withColumn(
        "media_type",
        F.when(magic.startswith("89504E47"), "image/png")
        .when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic.startswith("52494646"), "audio/wav")
        .otherwise("application/octet-stream"),
    )


def _decode_video_bytes(blob: bytes, strict: bool = False) -> np.ndarray:
    """STUB decode: real impl would be pyav/decord frame iteration.

    Deterministic fake: [n_frames, 4, 4, 3] uint8 frames seeded from the
    blob digest; n_frames derived from blob length (longer blob =
    "longer video"), so frame-count logic is exercised for real."""
    if strict:
        raise NotImplementedError("video codec not available in this container")
    n_frames = 4 + (len(blob) % 13)
    return _blob_rng(blob).integers(0, 256, size=(n_frames, 4, 4, 3), dtype=np.uint8)


def sample_video_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_cols: tuple[str, ...] = ("media_id",),
    n_sample: int = 3,
) -> DataFrame:
    """binary video → ``n_sample`` evenly-spaced frames, each mean-pooled
    to an RGB triple (the usual keyframe-sampling shape for vision
    encoders). Output: *id_cols, frame_idx int, ts_frac double,
    rgb array<float> — one row per sampled frame, so downstream
    per-frame featurization is a plain DataFrame op.

    mapInPandas iterator like the image/audio paths: per-partition
    Arrow batching with no per-row UDF dispatch (the decode loop itself
    is per-blob Python, as any codec call is); the decode call is the
    stub seam."""
    id_cols = list(id_cols)
    schema = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in id_cols)
    schema += ", frame_idx int, ts_frac double, rgb array<float>"

    def fe(batches):
        for pdf in batches:
            rows = {c: [] for c in id_cols}
            rows["frame_idx"], rows["ts_frac"], rows["rgb"] = [], [], []
            for i, blob in enumerate(pdf[blob_col]):
                frames = _decode_video_bytes(bytes(blob))
                n = frames.shape[0]
                k = min(n_sample, n)
                # evenly spaced indices incl. first and last frame
                idxs = [int(round(j * (n - 1) / max(1, k - 1))) for j in range(k)]
                for j, fi in enumerate(idxs):
                    for c in id_cols:
                        rows[c].append(pdf[c].iloc[i])
                    rows["frame_idx"].append(fi)
                    rows["ts_frac"].append(fi / max(1, n - 1))
                    rows["rgb"].append(
                        (frames[fi].reshape(-1, 3).mean(axis=0) / 255.0)
                        .astype(np.float32).tolist()
                    )
            yield pd.DataFrame(rows)

    return df.select(*id_cols, blob_col).mapInPandas(fe, schema)
