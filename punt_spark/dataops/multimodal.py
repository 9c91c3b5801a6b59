"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
batching, ``mapInPandas`` UDF signatures, Arrow batch shapes. The actual
codec work (image decode, audio resample, frame extraction) is STUBBED:
the media libraries (PIL/torchaudio/ffmpeg) are not in this container, so
``decode_mode="fake"`` produces a deterministic hash-derived feature vector
with the production schema, and ``decode_mode="real"`` raises
NotImplementedError at the exact call site a codec would plug into.

Scale notes: media bytes never shuffle — every transform here is a
map-only ``mapInPandas`` over the storage partitioning; only extracted
(small) features flow into joins/aggregations downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feat array<float>, feat_dim int, "
    "decode_ok boolean, decode_error string"
)

THUMB_SCHEMA = (
    "media_id long, thumb binary, thumb_w int, thumb_h int, decode_ok boolean"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int, frame binary"


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque binary fixture (stands in for real media)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])
    rows = []
    for i in range(n):
        kind = str(kinds[i % 3])
        payload = rng.bytes(128 + int(rng.integers(0, 256)))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 512)),
                int(rng.integers(16, 512)),
                int(rng.integers(100, 60_000)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: seeded from the payload hash, unit
    norm — same payload → same vector on every executor."""
    import hashlib

    h = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "big"))
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(
    df: DataFrame, dim: int = 32, decode_mode: str = "fake", batch_hint: int = 256
) -> DataFrame:
    """media table → per-item feature vectors via mapInPandas (map-only;
    Arrow batches of whole rows including the binary payload)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, errs = [], [], []
            for payload in pdf["payload"]:
                if decode_mode == "real":
                    raise NotImplementedError(
                        "real codec path: plug PIL/ffmpeg decode here"
                    )
                try:
                    feats.append(_fake_feature(bytes(payload), dim).tolist())
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # pragma: no cover
                    feats.append(None)
                    oks.append(False)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "feat_dim": dim,
                    "decode_ok": oks,
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, max_side: int = 64, decode_mode: str = "fake"
) -> DataFrame:
    """image rows → thumbnails. Fake mode: payload truncated to a
    deterministic length (schema-true placeholder)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs, ws, hs, oks = [], [], [], []
            for _, row in pdf.iterrows():
                if decode_mode == "real":
                    raise NotImplementedError(
                        "real resize path: plug PIL.Image.thumbnail here"
                    )
                scale = max_side / max(row["width"], row["height"], 1)
                w = max(1, int(row["width"] * min(scale, 1.0)))
                h = max(1, int(row["height"] * min(scale, 1.0)))
                thumbs.append(bytes(row["payload"])[: w * h % 97 + 16])
                ws.append(w)
                hs.append(h)
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": thumbs,
                    "thumb_w": ws,
                    "thumb_h": hs,
                    "decode_ok": oks,
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(run, THUMB_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8, decode_mode: str = "fake"
) -> DataFrame:
    """video rows → sampled frames (one output row per frame)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for _, row in pdf.iterrows():
                if decode_mode == "real":
                    raise NotImplementedError(
                        "real frame extraction: plug ffmpeg here"
                    )
                n = min(max_frames, max(1, int(row["duration_ms"]) // every_ms))
                for i in range(n):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame"].append(bytes(row["payload"])[:32])
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)
