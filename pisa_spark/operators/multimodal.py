"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schemas, partition-sized Arrow batches, UDF
signatures) is real and tested; the actual media decode is STUBBED because
no image/audio libraries ship in this container:

- decode_image / extract_audio_features raise NotImplementedError when
  asked for a real decode,
- deterministic_features=True substitutes a deterministic fake (md5-seeded
  vector) so the distributed plumbing is testable end-to-end.

At scale: media bytes stay in their own parquet/Iceberg column (columnar
pruning means metadata-only queries never read them); feature extraction is
mapInPandas so one task streams batches instead of materializing a
partition of blobs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16

FEATURES_SCHEMA = f"media_id long, kind string, n_bytes long, feature array<float>"


def synth_media(spark, n: int = 64, seed: int = 5):
    """Deterministic fake media table with typed metadata."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng((seed, i))
                kind = ("image", "audio", "video")[i % 3]
                payload = rng.bytes(128 + (i % 512))
                rows.append((i, kind, payload,
                             {"image": "image/png", "audio": "audio/wav",
                              "video": "video/mp4"}[kind],
                             64 + i % 256 if kind != "audio" else None,
                             64 + i % 128 if kind != "audio" else None,
                             1000 + i * 10 if kind != "image" else None))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms"])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: md5-seeded unit vector."""
    seed = int(hashlib.md5(payload).hexdigest()[:15], 16)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(FEATURE_DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(media_df, deterministic_features: bool = True):
    """mapInPandas feature extraction over the binary payload column.

    With deterministic_features=False this is where a real decoder (PIL /
    torchaudio / ffmpeg) would run; not available in this environment."""
    if not deterministic_features:
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present "
            "in this container; use deterministic_features=True")

    def run(batches):
        for pdf in batches:
            feats = [_fake_feature(bytes(p)).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len),
                "feature": feats,
            })

    return media_df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media_df, every_ms: int = 1000):
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows — the
    partition-exploding step a video pipeline runs before decode. Decode
    itself is stubbed (see extract_features)."""
    v = media_df.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"),
                             F.lit(every_ms))).alias("frame_ts_ms"))
