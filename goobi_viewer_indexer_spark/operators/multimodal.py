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
* ``decode="real"`` (round 5b) — REAL stdlib decode where the codec
  allows: PNG rasters (zlib inflate + all five scanline filters), 24-bit
  BMP rasters, GIF rasters (pure-python LZW incl. interlacing), baseline
  JPEG rasters (canonical Huffman entropy decode + dequant + float IDCT +
  chroma upsampling, :func:`decode_jpeg`), WAV PCM audio
  (:func:`decode_png`/:func:`decode_bmp`/:func:`decode_gif`/
  :func:`decode_wav`).  Codecs that genuinely need external libraries
  (progressive JPEG, compressed audio, video frame PIXELS) are
  FLAGGED (``ok=False`` / NotImplementedError at the exact slot) —
  never faked.  Video containers still parse for REAL:
  ``sample_frames(decode='container')`` walks the MP4 box tree
  (:func:`extract_mp4_keyframes`) and emits byte-exact encoded keyframe
  access units from the stbl sample tables.

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
    "AUDIO_SCHEMA",
    "synth_assets",
    "synth_image_bytes",
    "synth_wav_bytes",
    "probe_image_size",
    "decode_png",
    "decode_bmp",
    "decode_gif",
    "decode_jpeg",
    "jpeg_build_huffman",
    "extract_mp4_keyframes",
    "decode_wav",
    "decode_assets",
    "decode_audio",
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


def synth_wav_bytes(n_samples: int = 8000, rate: int = 8000, n_channels: int = 1,
                    seed: int = 0) -> bytes:
    """A REAL, spec-valid 16-bit PCM WAV (stdlib ``wave``) — seeded noise
    samples; test twin for :func:`decode_wav`."""
    import io
    import wave

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32767, n_samples * n_channels, dtype=np.int64).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL WAV PCM decode, stdlib ``wave`` + numpy: (sample_rate,
    n_channels, float32 samples in [-1, 1], shape (n_frames, n_channels)).
    None = not a parseable PCM WAV.  8/16/32-bit integer PCM supported
    (the WAV container's compressed codecs would need external libs)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            nch, sw, rate, nframes = w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
            raw = w.readframes(nframes)
    except (wave.Error, EOFError):
        return None
    if sw == 1:  # unsigned 8-bit
        arr = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        arr = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        arr = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        return None
    n = arr.size // max(nch, 1)
    return rate, nch, arr[: n * nch].reshape(n, nch)


def decode_png(data: bytes) -> np.ndarray | None:
    """REAL PNG raster decode, stdlib zlib + numpy unfiltering — returns a
    (h, w, channels) uint8 array.  Supports 8-bit depth, color types
    gray/RGB/palette/gray+alpha/RGBA, all five scanline filters (None,
    Sub, Up, Average, Paeth), multi-IDAT streams.  None = not a PNG;
    raises NotImplementedError for interlaced or non-8-bit images (rare
    shapes a production decoder would delegate to libpng).  Filters 0-2
    vectorize whole-row; Average/Paeth recurse along x (per-pixel numpy
    over channels) — fine for the asset sizes this pipeline batches."""
    import struct
    import zlib

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, idat, meta, plte = 8, [], None, None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos: pos + 8])
        payload = data[pos + 8: pos + 8 + ln]
        if typ == b"IHDR":
            meta = struct.unpack(">IIBBBBB", payload)
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if meta is None or not idat:
        return None
    w, h, depth, ctype, _comp, _filt, interlace = meta
    if depth != 8 or interlace != 0:
        raise NotImplementedError("PNG bit depth != 8 / Adam7 interlace — delegate to libpng")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None or (ctype == 3 and plte is None):
        return None
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) < h * (stride + 1):
        return None
    out = np.zeros((h, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    i = 0
    for y in range(h):
        f = raw[i]
        row = np.frombuffer(raw, np.uint8, stride, i + 1).astype(np.uint16)
        i += 1 + stride
        if f == 0:
            cur = row
        elif f == 1:  # Sub: out[x] = raw[x] + out[x-bpp] → cumsum per channel
            cur = (np.cumsum(row.reshape(w, nch), axis=0, dtype=np.uint64) % 256).reshape(stride).astype(np.uint16)
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential in x, vector over channels
            cur = np.zeros(stride, np.uint16)
            for x in range(w):
                s = slice(x * nch, (x + 1) * nch)
                a = cur[(x - 1) * nch: x * nch] if x else np.zeros(nch, np.uint16)
                b = prev[s]
                if f == 3:
                    cur[s] = (row[s] + (a + b) // 2) % 256
                else:
                    c = prev[(x - 1) * nch: x * nch] if x else np.zeros(nch, np.uint16)
                    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                    cur[s] = (row[s] + pred) % 256
        else:
            return None
        out[y] = cur
        prev = cur
    img = out.astype(np.uint8).reshape(h, w, nch)
    if ctype == 3:
        idx = img[:, :, 0]
        safe = np.minimum(idx, len(plte) - 1)
        img = plte[safe]
    return img


def _gif_lzw(data: bytes, mcs: int, n_expected: int) -> list[int] | None:
    """GIF-variant LZW decompression (LSB-first bit packing, variable code
    width mcs+1..12, CLEAR/END codes, 4096-entry table cap) — pure
    python; cost is linear in output pixels."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    base = [(i,) for i in range(clear)] + [None, None]
    table = list(base)
    width = mcs + 1
    out: list[int] = []
    prev: tuple | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                return None
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            return None
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_expected:
            break
    return out[:n_expected] if len(out) >= n_expected else None


def decode_gif(data: bytes) -> np.ndarray | None:
    """REAL GIF raster decode (round 5b), pure python/numpy: LZW
    decompression + palette mapping of the FIRST image frame, Adam-less
    4-pass interlacing and local color tables included — (h, w, 3) uint8
    RGB on the logical screen canvas.  None = not a decodable GIF.
    Animation composition (later frames, disposal methods) is out of
    scope — the first frame is what a thumbnailer reads."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    packed = data[10]
    pos, gct = 13, None
    if packed >> 7:
        n = 2 << (packed & 7)
        if pos + n * 3 > len(data):
            return None
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                return None
            ix = int.from_bytes(data[pos + 1: pos + 3], "little")
            iy = int.from_bytes(data[pos + 3: pos + 5], "little")
            iw = int.from_bytes(data[pos + 5: pos + 7], "little")
            ih = int.from_bytes(data[pos + 7: pos + 9], "little")
            ip = data[pos + 9]
            pos += 10
            lct = None
            if ip >> 7:
                n = 2 << (ip & 7)
                if pos + n * 3 > len(data):
                    return None
                lct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if pos >= len(data):
                return None
            mcs = data[pos]
            pos += 1
            blocks = []
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                blocks.append(data[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if iw <= 0 or ih <= 0:
                return None
            idxs = _gif_lzw(b"".join(blocks), mcs, iw * ih)
            pal = lct if lct is not None else gct
            if idxs is None or pal is None:
                return None
            img = pal[np.minimum(np.array(idxs, np.int64), len(pal) - 1)].reshape(ih, iw, 3)
            if ip & 0x40:  # interlaced: stream rows are in 4-pass order
                rows = (list(range(0, ih, 8)) + list(range(4, ih, 8))
                        + list(range(2, ih, 4)) + list(range(1, ih, 2)))
                out = np.zeros_like(img)
                out[rows] = img
                img = out
            if (ix, iy, iw, ih) != (0, 0, w, h):
                canvas = np.zeros((h, w, 3), np.uint8)
                canvas[iy: iy + ih, ix: ix + iw] = img[: max(h - iy, 0), : max(w - ix, 0)]
                img = canvas
            return img
        elif b0 == 0x3B:  # trailer
            break
        else:
            return None
    return None


def decode_bmp(data: bytes) -> np.ndarray | None:
    """REAL uncompressed 24-bit BMP raster decode (numpy): (h, w, 3) uint8
    RGB.  Bottom-up and top-down DIBs, 4-byte row padding; None for other
    BMP variants (RLE/16-bit need more of the spec than this pipeline's
    assets use)."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    rows, stride = abs(h), (w * 3 + 3) & ~3
    if len(data) < off + rows * stride:
        return None
    arr = np.frombuffer(data, np.uint8, rows * stride, off).reshape(rows, stride)
    img = arr[:, : w * 3].reshape(rows, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if h > 0 else img  # bottom-up → top-down


# -- baseline JPEG (ITU-T T.81 §F, SOF0) — pure numpy/stdlib ---------------
# Stream-order index k ↦ raster index _JZZ[k] of the k-th zigzag element.
_JZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_JDCT = None


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix M: forward = M·s·Mᵀ (T.81 A.3.3 with
    the ¼·C(u)C(v) normalization folded in), inverse = Mᵀ·S·M."""
    global _JDCT
    if _JDCT is None:
        x = np.arange(8)
        m = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16) / 2.0
        m[0, :] *= 1.0 / np.sqrt(2.0)
        _JDCT = m
    return _JDCT


def jpeg_build_huffman(counts: list[int], symbols: list[int]) -> dict:
    """Canonical Huffman (T.81 Annex C): {(code_length, code) → symbol}.
    ``counts[i]`` = number of codes of length i+1 (the DHT BITS list)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JBits:
    """MSB-first bit reader over one (unstuffed) entropy-coded segment."""
    __slots__ = ("d", "i", "b")

    def __init__(self, d: bytes):
        self.d, self.i, self.b = d, 0, 0

    def bit(self) -> int:
        v = (self.d[self.i] >> (7 - self.b)) & 1  # IndexError on truncation → None upstream
        self.b += 1
        if self.b == 8:
            self.b, self.i = 0, self.i + 1
        return v

    def take(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _jhuff(br: _JBits, table: dict) -> int | None:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        s = table.get((length, code))
        if s is not None:
            return s
    return None


def _jextend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v - ((1 << t) - 1) if v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray | None:
    """REAL baseline JPEG decode — pure python/numpy, no libjpeg: marker
    walk (DQT 8/16-bit, SOF0/SOF1, DHT, DRI, SOS), canonical Huffman
    entropy decode with byte-unstuffing and restart markers, DC
    prediction + AC run-length (ZRL/EOB), dequantize, float IDCT
    (orthonormal matrix product), sampling-factor chroma upsampling and
    JFIF YCbCr→RGB.  Returns (h, w, 3) uint8 RGB (grayscale replicated),
    or None for anything outside baseline (progressive SOF2, arithmetic
    coding) or malformed — flagged, never faked.

    This closes the JPEG slot in the reference's media cascade
    (helper/ImageSizeReader.java reads only headers; this goes to
    pixels).  Per-bit python decode is test-scale; at 100 TB the slot is
    where libjpeg-turbo plugs into the same mapInPandas stage."""
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, ValueError, ZeroDivisionError):
        return None


def _decode_jpeg(data: bytes) -> np.ndarray | None:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] | None = None
    scomp: dict[int, tuple[int, int]] = {}
    W = H = 0
    dri = 0
    scan = None
    i = 2
    while i + 2 <= len(data):
        if data[i] != 0xFF:
            return None
        m = data[i + 1]
        if m == 0xD9:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > len(data):
            return None
        seg_len = int.from_bytes(data[i + 2:i + 4], "big")
        seg = data[i + 4:i + 2 + seg_len]
        if m == 0xDB:  # DQT — possibly several tables per segment
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq == 0:
                    raw = np.frombuffer(seg, np.uint8, 64, j).astype(np.int32)
                    j += 64
                else:
                    raw = np.frombuffer(seg, ">u2", 64, j).astype(np.int32)
                    j += 128
                z = np.zeros(64, np.int32)
                z[_JZZ] = raw
                qt[tq] = z.reshape(8, 8)
        elif m in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended sequential
            H = int.from_bytes(seg[1:3], "big")
            W = int.from_bytes(seg[3:5], "big")
            comps = [
                {"id": seg[6 + 3 * c], "h": seg[7 + 3 * c] >> 4,
                 "v": seg[7 + 3 * c] & 15, "tq": seg[8 + 3 * c]}
                for c in range(seg[5])
            ]
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / hierarchical / arithmetic — out of baseline scope
        elif m == 0xC4:  # DHT — possibly several tables per segment
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1:j + 17])
                j += 17
                nsym = sum(counts)
                huff[(tc, th)] = jpeg_build_huffman(counts, list(seg[j:j + nsym]))
                j += nsym
        elif m == 0xDD:  # DRI
            dri = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:  # SOS
            for c in range(seg[0]):
                scomp[seg[1 + 2 * c]] = (seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
            scan = i + 2 + seg_len
            break
        i += 2 + seg_len
    if comps is None or scan is None or W == 0 or H == 0 or not scomp:
        return None

    # entropy-coded segments: unstuff FF00 → FF, split on RSTn
    segs: list[bytes] = []
    cur = bytearray()
    j = scan
    while j < len(data):
        b = data[j]
        if b == 0xFF:
            nb = data[j + 1] if j + 1 < len(data) else 0xD9
            if nb == 0x00:
                cur.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nb <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
            break  # EOI or next marker ends the scan
        cur.append(b)
        j += 1
    segs.append(bytes(cur))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or any(hmax % c["h"] or vmax % c["v"] for c in comps):
        return None
    mx = -(-W // (8 * hmax))
    my = -(-H // (8 * vmax))
    planes = [np.zeros((my * c["v"] * 8, mx * c["h"] * 8)) for c in comps]
    M = _jpeg_dct_matrix()
    preds = [0] * len(comps)
    seg_idx, br = 0, _JBits(segs[0])
    for n in range(mx * my):
        if dri and n and n % dri == 0:  # restart: new segment, reset DC preds
            seg_idx += 1
            if seg_idx >= len(segs):
                return None
            br = _JBits(segs[seg_idx])
            preds = [0] * len(comps)
        mcu_y, mcu_x = divmod(n, mx)
        for ci, c in enumerate(comps):
            dc_t = huff[(0, scomp[c["id"]][0])]
            ac_t = huff[(1, scomp[c["id"]][1])]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    stream = np.zeros(64)
                    s = _jhuff(br, dc_t)
                    if s is None:
                        return None
                    preds[ci] += _jextend(br.take(s), s) if s else 0
                    stream[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _jhuff(br, ac_t)
                        if rs is None:
                            return None
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            return None
                        stream[k] = _jextend(br.take(sz), sz)
                        k += 1
                    coef = np.zeros(64)
                    coef[_JZZ] = stream
                    spatial = M.T @ (coef.reshape(8, 8) * q) @ M + 128.0
                    py = (mcu_y * c["v"] + by) * 8
                    px = (mcu_x * c["h"] + bx) * 8
                    planes[ci][py:py + 8, px:px + 8] = spatial

    out = []
    for ci, c in enumerate(comps):
        p = np.repeat(np.repeat(planes[ci], vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:H, :W])
    if len(out) == 1:
        y = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    if len(out) == 3:  # JFIF YCbCr (BT.601)
        y, cb, cr = out
        rgb = np.stack([
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return None


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
    headers (see :func:`probe_image_size`); ``decode='real'`` (round 5b)
    runs the REAL raster decoders — :func:`decode_png` (zlib + full
    unfiltering), :func:`decode_bmp`, :func:`decode_gif` (pure-python
    LZW) and :func:`decode_jpeg` (baseline Huffman+IDCT) — and flags
    assets whose codec needs an external library (progressive JPEG)
    with ``ok=False`` rather than faking them."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": pdf["asset_id"], "kind": pdf["kind"], "width": [], "height": [], "n_channels": [], "ok": []}
            for d in pdf["data"]:
                if decode == "real":
                    # REAL raster decode (PNG via zlib+unfilter, 24-bit BMP,
                    # GIF via pure-python LZW, baseline JPEG via canonical
                    # Huffman + float IDCT); progressive JPEG still comes
                    # back ok=False (flagged, never faked)
                    img = decode_png(bytes(d))
                    if img is None:
                        img = decode_bmp(bytes(d))
                    if img is None:
                        img = decode_gif(bytes(d))
                    if img is None:
                        img = decode_jpeg(bytes(d))
                    if img is None:
                        out["width"].append(0)
                        out["height"].append(0)
                        out["n_channels"].append(0)
                        out["ok"].append(False)
                    else:
                        out["width"].append(int(img.shape[1]))
                        out["height"].append(int(img.shape[0]))
                        out["n_channels"].append(int(img.shape[2]))
                        out["ok"].append(True)
                elif decode == "headers":
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
            feats = []
            for d in pdf["data"]:
                if decode == "real":
                    feats.append(_real_features(bytes(d), dim))
                    continue
                seed = int.from_bytes(hashlib.sha256(bytes(d)).digest()[:8], "big") % (2**32)
                v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
                feats.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "kind": pdf["kind"], "features": feats})

    return assets.mapInPandas(fn, FEATURES_SCHEMA)


def _real_features(data: bytes, dim: int) -> list[float]:
    """REAL content features (round 5b) for stdlib-decodable assets: a
    block-mean downsampled grid of the PNG/BMP raster (or the WAV
    waveform), unit-normalized and padded/truncated to ``dim``.  Assets
    whose codec needs an external library get the all-zero vector —
    flagged, never faked (a learned encoder would slot in here)."""
    img = decode_png(data)
    if img is None:
        img = decode_bmp(data)
    if img is None:
        img = decode_gif(data)
    if img is None:
        img = decode_jpeg(data)
    if img is not None:
        h, w, c = img.shape
        g = max(1, int(np.sqrt(max(dim // max(c, 1), 1))))
        ys = np.linspace(0, h, g + 1, dtype=int)
        xs = np.linspace(0, w, g + 1, dtype=int)
        cells = [
            img[ys[i]: max(ys[i + 1], ys[i] + 1), xs[j]: max(xs[j + 1], xs[j] + 1)].mean(axis=(0, 1))
            for i in range(g)
            for j in range(g)
        ]
        v = (np.concatenate(cells).astype(np.float64) / 255.0) - 0.5
    else:
        wav = decode_wav(data)
        if wav is None:
            return [0.0] * dim
        _rate, _nch, samples = wav
        mono = samples.mean(axis=1)
        edges = np.linspace(0, mono.size, dim + 1, dtype=int)
        v = np.array([
            float(np.sqrt(np.mean(np.square(mono[a:b])))) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ])
    out = np.zeros(dim, dtype=np.float64)
    out[: min(dim, v.size)] = v[:dim]
    n = np.linalg.norm(out)
    return (out / n if n > 0 else out).astype(np.float32).tolist()


AUDIO_SCHEMA = "asset_id long, sample_rate int, n_channels int, n_samples long, duration_ms int, rms double, ok boolean"


def decode_audio(assets: DataFrame) -> DataFrame:
    """REAL audio decode step (round 5b, mapInPandas): WAV PCM via stdlib
    ``wave`` + numpy — per asset the stream parameters plus the RMS level
    computed from the decoded samples.  Non-WAV audio (or non-audio kinds)
    comes back ``ok=False`` — compressed codecs would need ffmpeg and are
    flagged, never faked."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "sample_rate": [], "n_channels": [], "n_samples": [],
                   "duration_ms": [], "rms": [], "ok": []}
            for aid, d in zip(pdf["asset_id"], pdf["data"]):
                wav = decode_wav(bytes(d))
                out["asset_id"].append(int(aid))
                if wav is None:
                    out["sample_rate"].append(0)
                    out["n_channels"].append(0)
                    out["n_samples"].append(0)
                    out["duration_ms"].append(0)
                    out["rms"].append(0.0)
                    out["ok"].append(False)
                else:
                    rate, nch, samples = wav
                    out["sample_rate"].append(int(rate))
                    out["n_channels"].append(int(nch))
                    out["n_samples"].append(int(samples.shape[0]))
                    out["duration_ms"].append(int(samples.shape[0] * 1000 / max(rate, 1)))
                    out["rms"].append(float(np.sqrt(np.mean(np.square(samples)))) if samples.size else 0.0)
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return assets.mapInPandas(fn, AUDIO_SCHEMA)


def _mp4_boxes(data: bytes, start: int, end: int):
    """Iterate (type, body_start, body_end) over the ISO-BMFF boxes in
    data[start:end] — 32-bit and 64-bit (size==1) lengths."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos: pos + 4], "big")
        typ = data[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8: pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos  # box extends to the end
        if size < 8 or pos + size > end:
            return
        yield typ, body, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, path: list[bytes]):
    """First box at the given path (e.g. [b'moov', b'trak']) — returns
    (body_start, body_end) or None."""
    if not path:
        return (start, end)
    for typ, b, e in _mp4_boxes(data, start, end):
        if typ == path[0]:
            r = _mp4_find(data, b, e, path[1:])
            if r is not None:
                return r
    return None


def extract_mp4_keyframes(data: bytes) -> list[tuple[int, int, bytes]] | None:
    """REAL MP4 container parse (round 5b): the sync-sample (keyframe)
    table of the FIRST video track — (sample_index, timestamp_ms,
    ENCODED sample bytes) per keyframe, straight from the stbl sample
    tables (stts decode times, stss sync samples, stsz sizes, stsc
    sample→chunk, stco/co64 chunk offsets).  This is the real first
    stage of any frame pipeline — byte-exact access units; only the
    codec DECODE of those units needs ffmpeg and stays out.  None = not
    a parseable MP4 with a video track."""
    if len(data) < 12:
        return None
    # find the video trak: iterate traks, check hdlr == 'vide'
    moov = _mp4_find(data, 0, len(data), [b"moov"])
    if moov is None:
        return None
    for typ, tb, te in _mp4_boxes(data, *moov):
        if typ != b"trak":
            continue
        hdlr = _mp4_find(data, tb, te, [b"mdia", b"hdlr"])
        if hdlr is None or data[hdlr[0] + 8: hdlr[0] + 12] != b"vide":
            continue
        mdhd = _mp4_find(data, tb, te, [b"mdia", b"mdhd"])
        stbl = _mp4_find(data, tb, te, [b"mdia", b"minf", b"stbl"])
        if mdhd is None or stbl is None:
            return None
        ver = data[mdhd[0]]
        timescale = int.from_bytes(
            data[mdhd[0] + (20 if ver == 1 else 12): mdhd[0] + (24 if ver == 1 else 16)], "big"
        )
        tables: dict[bytes, tuple[int, int]] = {}
        for btyp, bb, be in _mp4_boxes(data, *stbl):
            tables[btyp] = (bb, be)

        def u32s(box, skip, n):
            b0 = tables[box][0] + skip
            return [int.from_bytes(data[b0 + 4 * i: b0 + 4 * i + 4], "big") for i in range(n)]

        if b"stsz" not in tables or (b"stco" not in tables and b"co64" not in tables) \
                or b"stsc" not in tables or b"stts" not in tables:
            return None
        # stsz: fixed size or per-sample table
        szb = tables[b"stsz"][0]
        fixed = int.from_bytes(data[szb + 4: szb + 8], "big")
        n_samples = int.from_bytes(data[szb + 8: szb + 12], "big")
        sizes = [fixed] * n_samples if fixed else u32s(b"stsz", 12, n_samples)
        # stco/co64 chunk offsets
        if b"stco" in tables:
            cb = tables[b"stco"][0]
            n_chunks = int.from_bytes(data[cb + 4: cb + 8], "big")
            offsets = u32s(b"stco", 8, n_chunks)
        else:
            cb = tables[b"co64"][0]
            n_chunks = int.from_bytes(data[cb + 4: cb + 8], "big")
            offsets = [int.from_bytes(data[cb + 8 + 8 * i: cb + 16 + 8 * i], "big") for i in range(n_chunks)]
        # stsc: sample→chunk runs → per-sample (chunk, index-in-chunk)
        scb = tables[b"stsc"][0]
        n_runs = int.from_bytes(data[scb + 4: scb + 8], "big")
        runs = [
            (
                int.from_bytes(data[scb + 8 + 12 * i: scb + 12 + 12 * i], "big"),
                int.from_bytes(data[scb + 12 + 12 * i: scb + 16 + 12 * i], "big"),
            )
            for i in range(n_runs)
        ]
        sample_chunk: list[tuple[int, int]] = []  # (chunk_idx 0-based, idx in chunk)
        for ri, (first_chunk, per_chunk) in enumerate(runs):
            last_chunk = runs[ri + 1][0] - 1 if ri + 1 < n_runs else n_chunks
            for ch in range(first_chunk - 1, last_chunk):
                for j in range(per_chunk):
                    if len(sample_chunk) < n_samples:
                        sample_chunk.append((ch, j))
        # stts: cumulative decode timestamps
        ttb = tables[b"stts"][0]
        n_tt = int.from_bytes(data[ttb + 4: ttb + 8], "big")
        ts, t = [], 0
        for i in range(n_tt):
            cnt = int.from_bytes(data[ttb + 8 + 8 * i: ttb + 12 + 8 * i], "big")
            delta = int.from_bytes(data[ttb + 12 + 8 * i: ttb + 16 + 8 * i], "big")
            for _ in range(cnt):
                if len(ts) < n_samples:
                    ts.append(t)
                    t += delta
        # stss: sync samples (1-based); absent = every sample is sync
        if b"stss" in tables:
            ssb = tables[b"stss"][0]
            n_ss = int.from_bytes(data[ssb + 4: ssb + 8], "big")
            sync = [s - 1 for s in u32s(b"stss", 8, n_ss)]
        else:
            sync = list(range(n_samples))
        out = []
        for s in sync:
            if s >= len(sample_chunk) or s >= len(sizes):
                continue
            ch, j = sample_chunk[s]
            if ch >= len(offsets):
                continue
            # sample offset = chunk offset + sizes of preceding samples in chunk
            off = offsets[ch]
            for prev_s in range(s - j, s):
                off += sizes[prev_s]
            if off + sizes[s] > len(data):
                continue
            ms = int(ts[s] * 1000 / timescale) if timescale and s < len(ts) else 0
            out.append((s, ms, data[off: off + sizes[s]]))
        return out
    return None


def sample_frames(assets: DataFrame, every_ms: int = 10000, max_frames: int = 8, decode: str = "fake") -> DataFrame:
    """Frame sampling for video assets: one output row per sampled frame
    (explode inside the Arrow batch — the shuffle-free shape).

    ``decode='container'`` (round 5b): REAL ISO-BMFF (MP4) parsing —
    emits the ENCODED keyframe access units from the container's sample
    tables (:func:`extract_mp4_keyframes`), at most one per ``every_ms``
    and capped at ``max_frames``.  Un-parseable videos emit nothing.
    ``decode='real'`` (frame PIXELS) still needs ffmpeg and raises at
    the slot."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "real":
                raise NotImplementedError(
                    "decoding frame PIXELS needs ffmpeg; decode='container' extracts the "
                    "encoded keyframes via the real MP4 box parser"
                )
            if decode == "container":
                out = {"asset_id": [], "frame_idx": [], "frame_ms": [], "frame_data": []}
                for aid, kind, d in zip(pdf["asset_id"], pdf["kind"], pdf["data"]):
                    if kind != "video":
                        continue
                    keyframes = extract_mp4_keyframes(bytes(d)) or []
                    last_ms = None
                    taken = 0
                    for s, ms, blob in keyframes:
                        if taken >= max_frames:
                            break
                        if last_ms is not None and ms - last_ms < every_ms:
                            continue
                        out["asset_id"].append(int(aid))
                        out["frame_idx"].append(int(s))
                        out["frame_ms"].append(int(ms))
                        out["frame_data"].append(blob)
                        last_ms = ms
                        taken += 1
                yield pd.DataFrame(out)
                continue
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
