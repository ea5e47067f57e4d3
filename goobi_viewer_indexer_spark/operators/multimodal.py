"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

Reference analog: the image width/height probing pipeline
(Indexer.java:1032-1177 cascade IIIF→techMD→attribute→MIX→EXIF;
helper/ImageSizeReader.java reads binary headers) — the reference already
treats media as opaque bytes + extracted metadata, which is exactly the
Spark-side model here.

The decode step itself is STUBBED (no image/audio libs in this container):
``decode=\"fake\"`` yields a deterministic, seeded decode so the whole
pipeline — schema, partitioning, UDF signature, Arrow batch shape — is
real and tested; ``decode=\"real\"`` raises NotImplementedError at the
exact point a PIL/ffmpeg call would slot in.

Scale notes: assets stay in executor-side Arrow batches end to end (never
collected); feature extraction is a narrow map, so the only shuffle in a
typical pipeline is the downstream ANN bucketing join.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, data binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

DECODED_SCHEMA = "asset_id long, kind string, width int, height int, n_channels int, ok boolean"
FEATURE_DIM = 64
FEATURES_SCHEMA = f"asset_id long, kind string, features array<float>"
FRAMES_SCHEMA = "asset_id long, frame_idx int, frame_ms int, frame_data binary"

__all__ = [
    "ASSET_SCHEMA",
    "synth_assets",
    "decode_assets",
    "extract_features",
    "sample_frames",
]


def synth_assets(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets (for tests/bench — no external data)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"asset_id": [], "kind": [], "data": [], "meta": []}
            for rid in pdf["id"]:
                rng = np.random.default_rng(seed * 7919 + int(rid))
                kind = ["image", "audio", "video"][int(rid) % 3]
                data = rng.integers(0, 256, int(rng.integers(64, 4096)), dtype=np.uint8).tobytes()
                rows["asset_id"].append(int(rid))
                rows["kind"].append(kind)
                rows["data"].append(data)
                rows["meta"].append(
                    {
                        "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        "width": int(rng.integers(16, 4096)) if kind != "audio" else 0,
                        "height": int(rng.integers(16, 4096)) if kind != "audio" else 0,
                        "duration_ms": int(rng.integers(1000, 600000)) if kind != "image" else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, max(2, spark.sparkContext.defaultParallelism // 4)).mapInPandas(
        gen, ASSET_SCHEMA
    )


def _fake_decode(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: dimensions derived from
    a content digest (stable across runs/partitionings)."""
    h = hashlib.sha256(data).digest()
    return 16 + h[0] * 8, 16 + h[1] * 8, 1 + (h[2] % 4)


def decode_assets(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode step (mapInPandas).  ``decode='real'`` is the marked stub."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in this container); "
                    "plug the decoder in here — the Spark plumbing is complete"
                )
            out = {"asset_id": pdf["asset_id"], "kind": pdf["kind"], "width": [], "height": [], "n_channels": [], "ok": []}
            for d in pdf["data"]:
                w, h, c = _fake_decode(bytes(d))
                out["width"].append(w)
                out["height"].append(h)
                out["n_channels"].append(c)
                out["ok"].append(True)
            yield pd.DataFrame(out)

    return assets.mapInPandas(fn, DECODED_SCHEMA)


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM, decode: str = "fake") -> DataFrame:
    """Feature extraction → array<float> embeddings, Arrow-batched.
    Deterministic fake: seeded normal vector from the content digest
    (unit-normalized) — the downstream ANN operators consume it as a real
    embedding column."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "real":
                raise NotImplementedError("plug the real encoder here")
            feats = []
            for d in pdf["data"]:
                seed = int.from_bytes(hashlib.sha256(bytes(d)).digest()[:8], "big") % (2**32)
                v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
                feats.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "kind": pdf["kind"], "features": feats})

    return assets.mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 10000, max_frames: int = 8, decode: str = "fake") -> DataFrame:
    """Frame sampling for video assets: one output row per sampled frame
    (explode inside the Arrow batch — the shuffle-free shape)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "real":
                raise NotImplementedError("plug ffmpeg frame extraction here")
            out = {"asset_id": [], "frame_idx": [], "frame_ms": [], "frame_data": []}
            for aid, kind, d, meta in zip(pdf["asset_id"], pdf["kind"], pdf["data"], pdf["meta"]):
                if kind != "video":
                    continue
                dur = int(meta["duration_ms"]) if meta is not None else 0
                n = min(max_frames, max(1, dur // every_ms))
                blob = bytes(d)
                for i in range(n):
                    h = hashlib.sha256(blob + i.to_bytes(4, "big")).digest()
                    out["asset_id"].append(int(aid))
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["frame_data"].append(h)
            yield pd.DataFrame(out)

    return assets.mapInPandas(fn, FRAMES_SCHEMA)
