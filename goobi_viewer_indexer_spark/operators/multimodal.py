"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

Reference analog: the image width/height probing pipeline
(Indexer.java:1032-1177 cascade IIIF→techMD→attribute→MIX→EXIF;
helper/ImageSizeReader.java reads binary headers) — the reference already
treats media as opaque bytes + extracted metadata, which is exactly the
Spark-side model here.

Decode modes:

* ``decode="headers"`` — REAL image-size probing from binary headers
  (PNG IHDR, JPEG SOF marker walk, GIF logical screen, BMP info header),
  pure stdlib — byte-for-byte what the reference's
  helper/ImageSizeReader.java does (it also reads headers, never a full
  raster decode);
* ``decode="fake"`` — deterministic seeded decode (the test twin for
  pipelines whose assets are synthetic noise);
* ``decode="real"`` — full raster/audio decode: raises
  NotImplementedError at the exact point a PIL/ffmpeg call would slot in
  (those libs aren't in this container).

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
    "synth_image_bytes",
    "probe_image_size",
    "decode_assets",
    "extract_features",
    "sample_frames",
]


def probe_image_size(data: bytes) -> tuple[str, int, int] | None:
    """(mime, width, height) from real binary image headers — PNG IHDR,
    JPEG SOFn marker walk, GIF logical screen descriptor, BMP
    BITMAPINFOHEADER.  Pure stdlib, header-only (no raster decode) — the
    working analog of the reference's helper/ImageSizeReader.java probe
    cascade (Indexer.java:1032-1177).  None = not a recognized image."""
    import struct

    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return ("image/png", int(w), int(h))
    if len(data) >= 4 and data[:2] == b"\xff\xd8":  # JPEG: walk segments to SOFn
        i = 2
        while i + 9 <= len(data):
            if data[i] != 0xFF:
                return None  # corrupt marker stream
            marker = data[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2  # standalone markers have no length
                continue
            if i + 4 > len(data):
                return None
            seglen = int.from_bytes(data[i + 2: i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(data):
                    return None
                h = int.from_bytes(data[i + 5: i + 7], "big")
                w = int.from_bytes(data[i + 7: i + 9], "big")
                return ("image/jpeg", w, h)
            i += 2 + seglen
        return None
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        return ("image/gif", w, h)
    if len(data) >= 26 and data[:2] == b"BM":
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        return ("image/bmp", abs(w), abs(h))  # negative height = top-down DIB
    return None


def synth_image_bytes(w: int, h: int, fmt: str = "png") -> bytes:
    """A REAL, spec-valid image of the given dimensions (stdlib only) —
    png: full zlib-compressed RGB raster; jpeg: SOI/APP0/SOF0 header
    stream; gif/bmp: complete headers.  Test twin for the header prober."""
    import struct
    import zlib

    if fmt == "png":
        def chunk(typ: bytes, payload: bytes) -> bytes:
            return (
                struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
        raster = b"".join(b"\x00" + b"\x20\x40\x60" * w for _ in range(h))
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raster))
            + chunk(b"IEND", b"")
        )
    if fmt == "jpeg":
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
        sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"
    if fmt == "bmp":
        import struct as _s

        header = b"BM" + _s.pack("<IHHI", 54, 0, 0, 54) + _s.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
        return header
    raise ValueError(f"unknown format {fmt!r}")


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
    """Decode step (mapInPandas).  ``decode='headers'`` parses real image
    headers (see :func:`probe_image_size`); ``decode='real'`` is the marked
    full-raster stub."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "real":
                raise NotImplementedError(
                    "full raster decode requires PIL/ffmpeg (not in this container); "
                    "plug the decoder in here — the Spark plumbing is complete"
                )
            out = {"asset_id": pdf["asset_id"], "kind": pdf["kind"], "width": [], "height": [], "n_channels": [], "ok": []}
            for d in pdf["data"]:
                if decode == "headers":
                    probed = probe_image_size(bytes(d))
                    if probed is None:
                        out["width"].append(0)
                        out["height"].append(0)
                        out["n_channels"].append(0)
                        out["ok"].append(False)
                    else:
                        _mime, w, h = probed
                        out["width"].append(w)
                        out["height"].append(h)
                        out["n_channels"].append(3)
                        out["ok"].append(True)
                else:
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
