"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct,
processed by Arrow-batched ``mapInPandas`` kernels. The image/audio
codecs are NOT installed in this container (and are not the engine's
job), so the decode step is stubbed two ways:

- ``decode_image(strict=True)`` raises NotImplementedError — the
  clearly-marked production splice point (plug Pillow/ffmpeg here);
- ``decode_image(strict=False)`` runs a deterministic fake decoder
  (payload bytes → seeded pixel statistics) so the Spark-side plumbing
  — schema, batch shape, partitioning, UDF signature — is real and
  testable end-to-end.

The feature-extract path returns fixed-width float vectors compatible
with functions/similarity.py, so fake-decoded assets flow through the
same ANN/near-dup pipeline as text embeddings.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "width int, height int, sample_rate int"
)
FEATURE_DIM = 16


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: payload bytes → (h, w) uint8 array.
    Stands in for a real image codec; same signature/shape contract."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def decode_stats(assets: DataFrame, strict: bool = False) -> DataFrame:
    """assets → (asset_id, kind, mean_px double, std_px double).

    ``strict=True`` raises NotImplementedError (no codec in container).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image/audio decode requires a codec library (Pillow/"
                "ffmpeg) not present in this environment; use strict=False "
                "for the deterministic fake decoder"
            )
        for b in batches:
            means, stds = [], []
            for payload, w, h in zip(b["payload"], b["width"], b["height"]):
                px = _fake_pixels(payload, int(w or 8), int(h or 8))
                means.append(float(px.mean()))
                stds.append(float(px.std()))
            yield pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "kind": b["kind"],
                    "mean_px": means,
                    "std_px": stds,
                }
            )

    return assets.mapInPandas(
        run, schema="asset_id long, kind string, mean_px double, std_px double"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """assets → (asset_id, embedding array<float>) — FEATURE_DIM-wide
    deterministic features from the fake decoder (byte-histogram
    moments), Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for payload in b["payload"]:
                raw = np.frombuffer(payload or b"\x00", dtype=np.uint8)
                hist = np.bincount(raw % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float64)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm > 0 else hist).astype(np.float32))
            yield pd.DataFrame({"asset_id": b["asset_id"], "embedding": feats})

    return assets.mapInPandas(run, schema="asset_id long, embedding array<float>")


def frame_sample(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """Video-style frame sampling plumbing: payload → every-nth 'frame'
    (fixed-size byte slices standing in for decoded frames)."""
    frame_bytes = 16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_id, out_idx, out_frame = [], [], []
            for aid, payload in zip(b["asset_id"], b["payload"]):
                raw = payload or b""
                n_frames = max(len(raw) // frame_bytes, 0)
                for i in range(0, n_frames, every_n):
                    out_id.append(aid)
                    out_idx.append(i)
                    out_frame.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"asset_id": out_id, "frame_idx": out_idx, "frame": out_frame}
            )

    return assets.mapInPandas(run, schema="asset_id long, frame_idx int, frame binary")
