"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched pandas UDFs over mapInPandas.

The Spark-side contract (schemas, partitioning, UDF signatures, batch
shapes) is real and tested. The *codec* step is stubbed: this container
ships no image/audio libraries, so `decode_media` raises
NotImplementedError for real formats and supports a deterministic FAKE
format (header b"FAKE" + u16 width + u16 height + raw bytes) that
exercises the full pipeline deterministically.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "n_frames int, sample_rate int"
)
FEATURE_DIM = 64


def make_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image: header + seeded pixel bytes."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
    return b"FAKE" + struct.pack("<HH", width, height) + pixels


def decode_fake(payload: bytes) -> np.ndarray:
    """→ (height, width) uint8 array; ValueError on a non-FAKE payload."""
    if payload[:4] != b"FAKE":
        raise NotImplementedError(
            "real image decoding needs an image library not present in this "
            "container — only the deterministic FAKE format is supported"
        )
    w, h = struct.unpack("<HH", payload[4:8])
    return np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8).reshape(h, w)


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """payload → fixed-dim feature vector (byte histogram, L1-normalized).
    One Arrow batch in, one out; per-image work is numpy-vectorized."""

    @F.pandas_udf(f"array<float>")
    def feats(s: pd.Series) -> pd.Series:
        out = []
        for payload in s:
            if payload is None:
                out.append(None)
                continue
            img = decode_fake(bytes(payload))
            hist = np.bincount(img.ravel() >> 2, minlength=FEATURE_DIM).astype(np.float32)
            total = hist.sum()
            out.append((hist / total if total else hist).tolist())
        return pd.Series(out)

    return df.withColumn("features", feats(F.col(payload_col)))


def resize_images(df: DataFrame, out_w: int, out_h: int, payload_col: str = "payload") -> DataFrame:
    """Nearest-neighbor resize inside the UDF (pure numpy gather); output
    stays in the FAKE container so downstream stages keep working."""

    @F.pandas_udf("binary")
    def resize(s: pd.Series) -> pd.Series:
        out = []
        ys = None
        for payload in s:
            if payload is None:
                out.append(None)
                continue
            img = decode_fake(bytes(payload))
            h, w = img.shape
            yi = (np.arange(out_h) * h // out_h)[:, None]
            xi = (np.arange(out_w) * w // out_w)[None, :]
            small = img[yi, xi]
            out.append(b"FAKE" + struct.pack("<HH", out_w, out_h) + small.tobytes())
        return pd.Series(out)

    return df.withColumn(payload_col, resize(F.col(payload_col)))


def sample_frames(
    df: DataFrame, every_n: int = 10, payload_col: str = "payload", frames_col: str = "n_frames"
) -> DataFrame:
    """Video frame sampling: treat payload as n_frames equal-size frames,
    keep every n-th (vectorized slicing; exploded to one row per frame)."""

    @F.pandas_udf("array<binary>")
    def frames(payload: pd.Series, n_frames: pd.Series) -> pd.Series:
        out = []
        for p, nf in zip(payload, n_frames):
            if p is None or not nf:
                out.append(None)
                continue
            body = bytes(p)
            fsize = max(1, len(body) // int(nf))
            picks = range(0, int(nf), every_n)
            out.append([body[i * fsize : (i + 1) * fsize] for i in picks])
        return pd.Series(out)

    return df.withColumn("sampled_frames", frames(F.col(payload_col), F.col(frames_col)))


def fake_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests/benches (distributed gen)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                w, h = 16 + int(i) % 16, 16 + int(i * 7) % 16
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": ["image", "audio", "video"][int(i) % 3],
                        "payload": make_fake_image(w, h, seed + int(i)),
                        "width": w,
                        "height": h,
                        "n_frames": 1 + int(i) % 30,
                        "sample_rate": 16000,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
