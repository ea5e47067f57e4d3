"""Round-trip tests for the pure-numpy baseline JPEG decoder: a spec-rule
encoder (ITU-T T.81 §F — FDCT, quantize, zigzag, canonical Huffman, byte
stuffing, restart markers) built INDEPENDENTLY in this file (own zigzag
table, own DCT matrix, own canonical-code derivation) encodes grayscale,
4:4:4 and 4:2:0 images; the decoder must reproduce the mathematically
expected reconstruction exactly and the original image within DCT
rounding error."""

from __future__ import annotations

import numpy as np
import pytest

from goobi_viewer_indexer_spark.operators.multimodal import decode_jpeg

# test-local spec constants (deliberately NOT imported from the package)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_x = np.arange(8)
_M = np.cos((2 * _x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16) / 2.0
_M[0, :] *= 1.0 / np.sqrt(2.0)

# valid canonical tables (Kraft-satisfying): 12 DC symbols at length 4,
# 162 AC symbols at length 8 — arbitrary but spec-legal; the decoder must
# take them from DHT, not assume Annex K
DC_COUNTS = [0, 0, 0, 12] + [0] * 12
DC_SYMS = list(range(12))
AC_COUNTS = [0] * 7 + [162] + [0] * 8
AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]


def _canon_codes(counts, symbols):
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1
    return out


class _BW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, ln: int):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits (T.81 F.1.2.3)


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _enc_block(bw, stream, pred, dc_codes, ac_codes) -> int:
    dc = int(stream[0])
    diff = dc - pred
    t = _cat(diff)
    ln, code = dc_codes[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(stream[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _cat(v)
        ln, code = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = ac_codes[0x00]
        bw.put(code, ln)
    return dc


def _pad_to(p: np.ndarray, mult: int) -> np.ndarray:
    h, w = p.shape
    return np.pad(p, ((0, -(-h // mult) * mult - h), (0, -(-w // mult) * mult - w)), mode="edge")


def _blocks_q(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(nby, nbx, 64) quantized zigzag streams of an 8-multiple plane."""
    h, w = plane.shape
    out = np.zeros((h // 8, w // 8, 64), np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
            coef = _M @ blk @ _M.T
            out[by, bx] = np.round(coef / q).astype(np.int64).flatten()[_ZZ]
    return out


def _recon_plane(bq: np.ndarray, q: np.ndarray) -> np.ndarray:
    nby, nbx, _ = bq.shape
    p = np.zeros((nby * 8, nbx * 8))
    for by in range(nby):
        for bx in range(nbx):
            coef = np.zeros(64)
            coef[_ZZ] = bq[by, bx]
            p[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = _M.T @ (coef.reshape(8, 8) * q) @ _M + 128.0
    return p


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg(img: np.ndarray, q_y: np.ndarray, q_c: np.ndarray | None = None,
                subsample: bool = False, dri: int = 0, dqt16: bool = False):
    """Spec-rule baseline encoder.  Returns (jpeg_bytes, expected_rgb) where
    expected_rgb is the mathematically exact reconstruction (dequant →
    IDCT → upsample → color convert → clip) a correct decoder must emit."""
    H, W = img.shape[:2]
    gray = img.ndim == 2
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qts = {0: q_y}
        comp_q = [0]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            def down(p):
                p2 = _pad_to(p, 2)
                return (p2[0::2, 0::2] + p2[1::2, 0::2] + p2[0::2, 1::2] + p2[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3
        qts = {0: q_y, 1: (q_c if q_c is not None else q_y)}
        comp_q = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad each plane so the MCU grid is complete
    mx = -(-W // (8 * hmax))
    my = -(-H // (8 * vmax))
    bqs = []
    for i, p in enumerate(planes):
        h_i, v_i = samp[i]
        need_h, need_w = my * v_i * 8, mx * h_i * 8
        p2 = np.pad(p, ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])), mode="edge")
        bqs.append(_blocks_q(p2, qts[comp_q[i]]))

    # entropy-coded scan
    dc_codes = _canon_codes(DC_COUNTS, DC_SYMS)
    ac_codes = _canon_codes(AC_COUNTS, AC_SYMS)
    bw = _BW()
    scan = bytearray()
    preds = [0] * len(planes)
    rst = 0
    for n in range(mx * my):
        if dri and n and n % dri == 0:
            bw.flush()
            scan += bw.out
            scan += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BW()
            preds = [0] * len(planes)
        mcu_y, mcu_x = divmod(n, mx)
        for ci in range(len(planes)):
            h_i, v_i = samp[ci]
            for by in range(v_i):
                for bx in range(h_i):
                    preds[ci] = _enc_block(
                        bw, bqs[ci][mcu_y * v_i + by, mcu_x * h_i + bx],
                        preds[ci], dc_codes, ac_codes)
    bw.flush()
    scan += bw.out

    # headers
    out = bytearray(b"\xff\xd8")
    for tq, q in qts.items():
        if dqt16:  # Pq=1: 16-bit table entries
            out += _seg(0xDB, bytes([0x10 | tq]) + q.astype(np.int64).flatten()[_ZZ].astype(">u2").tobytes())
        else:
            out += _seg(0xDB, bytes([tq]) + bytes(q.astype(np.int64).flatten()[_ZZ].astype(np.uint8)))
    nc = len(planes)
    sof = bytes([8]) + H.to_bytes(2, "big") + W.to_bytes(2, "big") + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], comp_q[i]])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + bytes(DC_SYMS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_COUNTS) + bytes(AC_SYMS))
    if dri:
        out += _seg(0xDD, dri.to_bytes(2, "big"))
    sos = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc)) + bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"

    # expected reconstruction — the exact float math a correct decoder runs
    recon = []
    for i in range(nc):
        h_i, v_i = samp[i]
        p = _recon_plane(bqs[i], qts[comp_q[i]])
        p = np.repeat(np.repeat(p, vmax // v_i, axis=0), hmax // h_i, axis=1)
        recon.append(p[:H, :W])
    if nc == 1:
        yy = np.clip(np.round(recon[0]), 0, 255).astype(np.uint8)
        expected = np.stack([yy] * 3, axis=-1)
    else:
        y, cb, cr = recon
        expected = np.clip(np.round(np.stack([
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ], axis=-1)), 0, 255).astype(np.uint8)
    return bytes(out), expected


def _img(h, w, channels=3, seed=7):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h, w) if channels == 1 else (h, w, channels))
    return base.astype(np.uint8)


Q1 = np.ones((8, 8), np.int64)
Q_STEPPY = (np.arange(64).reshape(8, 8) % 7 + 1).astype(np.int64)


def test_grayscale_roundtrip_exact_reconstruction():
    img = _img(24, 17, channels=1)
    data, expected = encode_jpeg(img, Q1)
    got = decode_jpeg(data)
    assert got is not None and got.shape == (24, 17, 3)
    assert np.array_equal(got, expected)
    # with unit quant tables the decode is within DCT rounding of the input
    assert np.max(np.abs(got[:, :, 0].astype(int) - img.astype(int))) <= 4


def test_color_444_roundtrip():
    img = _img(16, 16, channels=3)
    data, expected = encode_jpeg(img, Q1, Q1)
    got = decode_jpeg(data)
    assert got is not None and got.shape == (16, 16, 3)
    assert np.array_equal(got, expected)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 6  # color convert + DCT rounding


def test_color_420_subsampled_with_restart_markers():
    img = _img(40, 35, channels=3, seed=11)  # non-multiple-of-16 dims
    data, expected = encode_jpeg(img, Q_STEPPY, Q_STEPPY, subsample=True, dri=2)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data  # restarts really present
    got = decode_jpeg(data)
    assert got is not None and got.shape == (40, 35, 3)
    assert np.array_equal(got, expected)


def test_nontrivial_quant_tables_and_16bit_dqt():
    img = _img(8, 8, channels=1, seed=3)
    data, expected = encode_jpeg(img, Q_STEPPY)
    got = decode_jpeg(data)
    assert got is not None and np.array_equal(got, expected)
    # the same stream with a Pq=1 (16-bit) DQT decodes identically
    data16, expected16 = encode_jpeg(img, Q_STEPPY, dqt16=True)
    got16 = decode_jpeg(data16)
    assert got16 is not None and np.array_equal(got16, expected16)
    assert np.array_equal(got16, got)


def test_progressive_flagged_none():
    img = _img(8, 8, channels=1)
    data, _ = encode_jpeg(img, Q1)
    # flip SOF0 marker to SOF2 (progressive): decoder must flag, not fake
    i = data.index(b"\xff\xc0")
    assert decode_jpeg(data[:i] + b"\xff\xc2" + data[i + 2:]) is None
    assert decode_jpeg(b"\xff\xd8\x00\x00") is None
    assert decode_jpeg(b"not a jpeg") is None


def test_spark_real_decode_pipeline_handles_jpeg(spark):
    from goobi_viewer_indexer_spark.operators.multimodal import ASSET_SCHEMA, decode_assets
    img = _img(24, 17, channels=3, seed=5)
    data, _ = encode_jpeg(img, Q1, Q1)
    df = spark.createDataFrame(
        [(1, "image", bytearray(data), ("image/jpeg", 17, 24, 0))], ASSET_SCHEMA)
    row = decode_assets(df, decode="real").collect()[0]
    assert (row["ok"], row["width"], row["height"], row["n_channels"]) == (True, 17, 24, 3)
