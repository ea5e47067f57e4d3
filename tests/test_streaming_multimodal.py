"""Streaming ingest (AvailableNow, checkpointed) and multimodal pipeline."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.operators.multimodal import (
    decode_assets,
    extract_features,
    sample_frames,
    synth_assets,
)
from goobi_viewer_indexer_spark.operators.search import InvertedIndex
from goobi_viewer_indexer_spark.streaming.ingest import ingest_available_now, windowed_event_counts
from tests.conftest import SF01, read_index_table

CFG = IndexConfig(docs_per_segment=64, merge_fanin=2, postings_buckets=16)


def test_streaming_ingest_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "in")
    idxd = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inp)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    docs.filter("doc_id < 200").coalesce(1).write.parquet(f"{inp}/f1.parquet")
    ingest_available_now(spark, inp + "/*/", idxd, ckpt, CFG)
    assert read_index_table(spark, idxd, "doc_stats").count() == 200

    docs.filter("doc_id >= 200").coalesce(1).write.parquet(f"{inp}/f2.parquet")
    ingest_available_now(spark, inp + "/*/", idxd, ckpt, CFG)
    assert read_index_table(spark, idxd, "doc_stats").count() == 500

    # drain again: checkpoint ⇒ no reprocessing
    ingest_available_now(spark, inp + "/*/", idxd, ckpt, CFG)
    assert read_index_table(spark, idxd, "doc_stats").count() == 500

    idx = InvertedIndex(spark, idxd)
    assert len(idx.search(["table", "join"], k=5).collect()) == 5


def test_windowed_event_counts_batch_matches_manual(spark):
    events = spark.read.parquet(f"{SF01}/events.parquet")
    got = windowed_event_counts(events).orderBy("window_start", "event_type").collect()
    exp = (
        events.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_windowed_event_counts_streaming_equals_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF01}/events.parquet")
    src = str(tmp_path / "events_src")
    events.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src + "/*")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt2")
    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode only emits windows the watermark has passed; all emitted
    # rows must match the batch computation exactly
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    exp = {tuple(r) for r in windowed_event_counts(events).collect()}
    assert got <= exp
    assert len(got) > 0


def test_multimodal_pipeline(spark):
    assets = synth_assets(spark, 30)
    dec = decode_assets(assets).collect()
    assert len(dec) == 30 and all(r["ok"] for r in dec)
    feats = extract_features(assets).collect()
    assert all(len(r["features"]) == 64 for r in feats)
    # determinism: same asset → same features on re-run
    feats2 = extract_features(assets).collect()
    assert {r["asset_id"]: r["features"] for r in feats} == {r["asset_id"]: r["features"] for r in feats2}
    frames = sample_frames(assets).collect()
    assert all(r["asset_id"] % 3 == 2 for r in frames)  # only 'video' kind

    # decode='real' (round 5b): synthetic noise has no decodable codec —
    # every asset comes back FLAGGED (ok=False), never faked or raised
    real = decode_assets(assets, decode="real").collect()
    assert len(real) == 30 and all(not r["ok"] and r["width"] == 0 for r in real)


def test_debounced_stable_files_stateful(spark, tmp_path):
    """applyInPandasWithState debounce: a path is emitted exactly once, on
    the first observation whose size repeats — with state crossing
    micro-batch boundaries (maxFilesPerTrigger=1 forces one batch per
    input file)."""
    import time

    from goobi_viewer_indexer_spark.streaming.ingest import debounced_stable_files

    obs_dir = str(tmp_path / "obs")
    os.makedirs(obs_dir)
    # three observation files = three micro-batches
    b1 = [("a", 100, 1.0), ("b", 50, 1.0)]
    b2 = [("a", 100, 2.0), ("b", 60, 2.0)]   # a stable -> emit; b grew
    b3 = [("b", 60, 3.0), ("a", 100, 3.0)]   # b stable -> emit; a already emitted
    for i, rows in enumerate([b1, b2, b3]):
        spark.createDataFrame(rows, "path string, size long, ts double").coalesce(1).write.parquet(
            f"{obs_dir}/batch{i}.parquet"
        )
        time.sleep(0.05)  # distinct mtimes => deterministic file order

    stream = (
        spark.readStream.schema("path string, size long, ts double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(obs_dir + "/*/")
    )
    out = debounced_stable_files(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("debounced")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["path"], r["size"]) for r in spark.sql("SELECT * FROM debounced").collect()}
    assert got == {("a", 100), ("b", 60)}


def test_streaming_ingest_fielded(spark, tmp_path):
    """Fielded bootstrap + fielded delta appends through the same
    checkpointed AvailableNow loop."""
    from goobi_viewer_indexer_spark.operators.search import FieldedIndex

    inp = str(tmp_path / "fin")
    idxd = str(tmp_path / "fidx")
    ckpt = str(tmp_path / "fckpt")
    os.makedirs(inp)
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select("doc_id", "text", "source")
    docs.filter("doc_id < 300").coalesce(1).write.parquet(f"{inp}/f1.parquet")
    fields = {"text": "text", "source": "source"}
    ingest_available_now(spark, inp + "/*/", idxd, ckpt, CFG,
                         schema="doc_id long, text string, source string", fields=fields)
    assert read_index_table(spark, idxd, "doc_stats").count() == 300
    assert FieldedIndex(spark, idxd).search([("text", "table")], k=5).count() == 5

    docs.filter("doc_id >= 300").coalesce(1).write.parquet(f"{inp}/f2.parquet")
    ingest_available_now(spark, inp + "/*/", idxd, ckpt, CFG,
                         schema="doc_id long, text string, source string", fields=fields)
    assert read_index_table(spark, idxd, "doc_stats").count() == 500
    # a doc appended in batch 2 is findable field-scoped
    srcs = {r["source"] for r in spark.read.parquet(f"{SF01}/documents.parquet").filter("doc_id >= 300").select("source").distinct().collect()}
    some = sorted(srcs)[0]
    assert FieldedIndex(spark, idxd).search([("source", some)], k=500).count() > 0


def test_bootstrap_replay_after_lost_checkpoint_is_noop(spark, tmp_path):
    """ADVICE r2 exactly-once hole: if the process dies after the bootstrap
    build commits but before the checkpoint does, the replayed batch 0 must
    NOT re-ingest the bootstrap documents as a delta.  Simulated by redriving
    the same input with a fresh checkpoint (the replay reads the identical
    file set as batch 0 again)."""
    inp = str(tmp_path / "in")
    idxd = str(tmp_path / "idx")
    os.makedirs(inp)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    docs.filter("doc_id < 200").coalesce(1).write.parquet(f"{inp}/f1.parquet")
    ingest_available_now(spark, inp + "/*/", idxd, str(tmp_path / "ckpt1"), CFG)
    assert read_index_table(spark, idxd, "doc_stats").count() == 200
    # replayed bootstrap batch (checkpoint never committed)
    ingest_available_now(spark, inp + "/*/", idxd, str(tmp_path / "ckpt2"), CFG)
    assert read_index_table(spark, idxd, "doc_stats").count() == 200
    # genuinely new files after the replay still append normally
    docs.filter("doc_id >= 200").coalesce(1).write.parquet(f"{inp}/f2.parquet")
    ingest_available_now(spark, inp + "/*/", idxd, str(tmp_path / "ckpt2"), CFG)
    assert read_index_table(spark, idxd, "doc_stats").count() == 500


def test_probe_image_size_real_headers(spark):
    """decode='headers' parses REAL spec-valid image bytes (PNG raster via
    zlib, JPEG SOF0 stream, GIF/BMP headers) through the Spark pipeline —
    S12 (helper/ImageSizeReader.java analog) with an actual decoder."""
    from goobi_viewer_indexer_spark.operators.multimodal import (
        probe_image_size,
        synth_image_bytes,
    )

    cases = [(1, "png", 320, 200), (2, "jpeg", 640, 480), (3, "gif", 12, 34), (4, "bmp", 100, 50)]
    # driver-side prober unit checks
    for _i, fmt, w, h in cases:
        mime, pw, ph = probe_image_size(synth_image_bytes(w, h, fmt))
        assert (pw, ph) == (w, h) and fmt in mime
    assert probe_image_size(b"not an image at all") is None
    assert probe_image_size(b"\xff\xd8\x00\x00") is None  # corrupt jpeg

    # the distributed pipeline on real bytes + one junk asset
    rows = [
        (i, "image", synth_image_bytes(w, h, fmt), {"mime": f"image/{fmt}", "width": w, "height": h, "duration_ms": 0})
        for i, fmt, w, h in cases
    ] + [(99, "image", b"garbage", {"mime": "image/png", "width": 0, "height": 0, "duration_ms": 0})]
    from goobi_viewer_indexer_spark.operators.multimodal import ASSET_SCHEMA, decode_assets

    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {r["asset_id"]: (r["width"], r["height"], r["ok"]) for r in decode_assets(assets, decode="headers").collect()}
    for i, _fmt, w, h in cases:
        assert got[i] == (w, h, True)
    assert got[99] == (0, 0, False)

    # PNG raster is genuinely valid: stdlib zlib can re-inflate the IDAT
    import struct, zlib
    png = synth_image_bytes(8, 4, "png")
    idat_len = struct.unpack(">I", png[33:37])[0]
    raw = zlib.decompress(png[41:41 + idat_len])
    assert len(raw) == 4 * (1 + 8 * 3)


# ---- real stdlib decoders (round 5b: PNG/BMP rasters, WAV PCM) -----------


def test_decode_png_all_filters_roundtrip():
    """Hand-encoded PNG exercising every scanline filter (None/Sub/Up/
    Average/Paeth) decodes back to the exact raster."""
    import struct
    import zlib

    import numpy as np

    from goobi_viewer_indexer_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    h, w, nch = 6, 5, 3
    raster = rng.integers(0, 256, (h, w, nch), dtype=np.uint8)
    rows, prev = [], np.zeros(w * nch, np.int32)
    for y in range(h):
        cur = raster[y].reshape(-1).astype(np.int32)
        f = [0, 1, 2, 3, 4, 2][y]
        a = np.concatenate([np.zeros(nch, np.int32), cur[:-nch]])
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            enc = (cur - a) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            enc = (cur - (a + prev) // 2) % 256
        else:
            c = np.concatenate([np.zeros(nch, np.int32), prev[:-nch]])
            p = a + prev - c
            pa, pb, pc = abs(p - a), abs(p - prev), abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c))
            enc = (cur - pred) % 256
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(t, p):
        return struct.pack(">I", len(p)) + t + p + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), raster)


def test_real_decode_pipeline_on_spark(spark):
    """decode='real' (round 5b): PNG/BMP assets decode to true dimensions,
    WAV audio decodes to true stream params + RMS, undecodable codecs are
    flagged ok=False — all through the mapInPandas plumbing."""
    import numpy as np

    from goobi_viewer_indexer_spark.operators.multimodal import (
        ASSET_SCHEMA,
        decode_assets,
        decode_audio,
        decode_wav,
        extract_features,
        synth_image_bytes,
        synth_wav_bytes,
    )

    rows = [
        (1, "image", bytearray(synth_image_bytes(11, 7, "png")), ("image/png", 11, 7, 0)),
        (2, "image", bytearray(b"\xffnotanimage"), ("application/octet-stream", 0, 0, 0)),
        (3, "audio", bytearray(synth_wav_bytes(2000, 8000, 2, seed=5)), ("audio/wav", 0, 0, 250)),
        (4, "audio", bytearray(b"junkjunk"), ("audio/flac", 0, 0, 99)),
    ]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)

    dec = {r["asset_id"]: r for r in decode_assets(assets, decode="real").collect()}
    assert (dec[1]["width"], dec[1]["height"], dec[1]["n_channels"], dec[1]["ok"]) == (11, 7, 3, True)
    assert dec[2]["ok"] is False and dec[2]["width"] == 0

    aud = {r["asset_id"]: r for r in decode_audio(assets.filter("kind = 'audio'")).collect()}
    assert aud[3]["ok"] and (aud[3]["sample_rate"], aud[3]["n_channels"], aud[3]["n_samples"]) == (8000, 2, 2000)
    assert aud[3]["duration_ms"] == 250
    _r, _n, samples = decode_wav(bytes(rows[2][2]))
    assert abs(aud[3]["rms"] - float(np.sqrt(np.mean(np.square(samples))))) < 1e-9
    assert aud[4]["ok"] is False

    feats = {r["asset_id"]: r["features"] for r in extract_features(assets, decode="real").collect()}
    v1 = np.array(feats[1])
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5          # decodable → unit vector
    assert np.allclose(feats[2], 0.0)                     # flagged → zero vector
    assert abs(np.linalg.norm(np.array(feats[3])) - 1.0) < 1e-5  # audio real features
    # deterministic: same asset bytes → same features
    feats2 = {r["asset_id"]: r["features"] for r in extract_features(assets, decode="real").collect()}
    assert feats == feats2


def test_decode_gif_lzw_roundtrip():
    """GIF decode (round 5b): canonical-rule LZW encoder (width bump when
    just-added code == 2^width, one later than the decoder's rule — the
    spec's compensating offset) round-trips plain, interlaced, KwKwK and
    12-bit-table-growth streams."""
    import struct

    import numpy as np

    from goobi_viewer_indexer_spark.operators.multimodal import _gif_lzw, decode_gif

    def lzw_encode(idxs, mcs):
        clear, end = 1 << mcs, (1 << mcs) + 1
        d = {(i,): i for i in range(clear)}
        table_size, width = end + 1, mcs + 1
        out, buf = [(clear, width)], ()
        for p in idxs:
            nb = buf + (int(p),)
            if nb in d:
                buf = nb
                continue
            out.append((d[buf], width))
            if table_size < 4096:
                d[nb] = table_size
                table_size += 1
                if table_size == (1 << width) + 1 and width < 12:
                    width += 1
            buf = (int(p),)
        if buf:
            out.append((d[buf], width))
        out.append((end, width))
        acc = nbits = 0
        by = bytearray()
        for code, w_ in out:
            acc |= code << nbits
            nbits += w_
            while nbits >= 8:
                by.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            by.append(acc & 0xFF)
        return bytes(by)

    rng = np.random.default_rng(9)
    for n, mcs in [(50, 2), (20000, 3), (60000, 7)]:  # 60k@7 grows to the 4096 cap
        idxs = rng.integers(0, 1 << mcs, n).tolist()
        assert _gif_lzw(lzw_encode(idxs, mcs), mcs, n) == idxs, (n, mcs)
    rep = [1, 1, 1, 1, 2, 2, 2, 2] * 500  # KwKwK case
    assert _gif_lzw(lzw_encode(rep, 2), 2, len(rep)) == rep

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    h, w = 40, 33
    pidx = rng.integers(0, 4, (h, w))
    for interlaced in (False, True):
        rows = (list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2))) if interlaced else list(range(h))
        body = lzw_encode(pidx[rows].reshape(-1).tolist(), 2)
        blocks = b"".join(bytes([min(255, len(body) - i)]) + body[i: i + 255]
                          for i in range(0, len(body), 255))
        gif = (b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x81, 0, 0]) + pal.tobytes()
               + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
               + bytes([0x40 if interlaced else 0]) + bytes([2]) + blocks + b"\x00\x3b")
        out = decode_gif(gif)
        assert out is not None and np.array_equal(out, pal[pidx]), f"interlaced={interlaced}"
    assert decode_gif(b"nope") is None


def _synth_mp4(samples, sizes_per_chunk=3, timescale=1000, delta=100, sync=(1, 4)):
    """Minimal valid ISO-BMFF: ftyp + moov(trak video w/ full stbl) + mdat,
    chunked sample layout with absolute stco offsets."""
    import struct

    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    def full(typ, payload, version=0, flags=0):
        return box(typ, struct.pack(">I", (version << 24) | flags) + payload)

    n = len(samples)
    sizes = [len(b) for b in samples]
    n_chunks = (n + sizes_per_chunk - 1) // sizes_per_chunk

    def build(chunk_offsets):
        stsd = full(b"stsd", struct.pack(">I", 1) + box(b"mp4v", b"\x00" * 16))
        stts = full(b"stts", struct.pack(">III", 1, n, delta))
        stss = full(b"stss", struct.pack(">I", len(sync)) + b"".join(struct.pack(">I", x) for x in sync))
        stsz = full(b"stsz", struct.pack(">II", 0, n) + b"".join(struct.pack(">I", x) for x in sizes))
        stsc = full(b"stsc", struct.pack(">IIII", 1, 1, sizes_per_chunk, 1))
        stco = full(b"stco", struct.pack(">I", n_chunks) + b"".join(struct.pack(">I", o) for o in chunk_offsets))
        stbl = box(b"stbl", stsd + stts + stss + stsz + stsc + stco)
        minf = box(b"minf", stbl)
        hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12)
        mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, timescale, n * delta) + b"\x00" * 4)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", mdia)
        moov = box(b"moov", trak)
        ftyp = box(b"ftyp", b"isom" + b"\x00\x00\x00\x01" + b"isom")
        return ftyp, moov

    ftyp, moov = build([0] * n_chunks)
    mdat_body = len(ftyp) + len(moov) + 8
    offs, cur = [], mdat_body
    for c in range(n_chunks):
        offs.append(cur)
        cur += sum(sizes[c * sizes_per_chunk: (c + 1) * sizes_per_chunk])
    ftyp, moov = build(offs)
    import struct as _s
    mdat = _s.pack(">I", 8 + sum(sizes)) + b"mdat" + b"".join(samples)
    return ftyp + moov + mdat


def test_mp4_keyframe_extraction(spark):
    """Container-level frame extraction (round 5b): the MP4 box parser
    returns byte-exact encoded keyframe samples with correct timestamps,
    through sample_frames(decode='container') on Spark."""
    import numpy as np

    from goobi_viewer_indexer_spark.operators.multimodal import (
        ASSET_SCHEMA,
        extract_mp4_keyframes,
        sample_frames,
    )

    rng = np.random.default_rng(11)
    samples = [bytes(rng.integers(0, 256, 10 + i, dtype=np.uint8)) for i in range(6)]
    mp4 = _synth_mp4(samples, sync=(1, 4))

    kf = extract_mp4_keyframes(mp4)
    assert kf is not None and [(s, ms) for s, ms, _ in kf] == [(0, 0), (3, 300)]
    assert kf[0][2] == samples[0] and kf[1][2] == samples[3]  # byte-exact units

    # stss absent → every sample is a keyframe
    nosync = _synth_mp4(samples, sync=tuple(range(1, 7)))
    assert len(extract_mp4_keyframes(nosync)) == 6

    rows = [
        (1, "video", bytearray(mp4), ("video/mp4", 0, 0, 600)),
        (2, "video", bytearray(b"garbage"), ("video/mp4", 0, 0, 100)),
        (3, "image", bytearray(b"x"), ("image/png", 1, 1, 0)),
    ]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = sample_frames(assets, every_ms=100, max_frames=8, decode="container").collect()
    assert {(r["asset_id"], r["frame_idx"], r["frame_ms"]) for r in got} == {(1, 0, 0), (1, 3, 300)}
    by_idx = {r["frame_idx"]: bytes(r["frame_data"]) for r in got}
    assert by_idx[0] == samples[0] and by_idx[3] == samples[3]


def test_streaming_exact_dedup_stateful(spark, tmp_path):
    """Content dedup state crosses micro-batch boundaries: batch 2's copy
    of a batch-1 doc is suppressed; within a batch the smallest id wins."""
    import glob
    import os

    from goobi_viewer_indexer_spark.streaming.ingest import streaming_exact_dedup

    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: doc 0 and its in-batch copy 5 (0 wins); unique doc 1
    spark.createDataFrame(
        [(5, "same content alpha"), (0, "same content alpha"), (1, "unique one")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src + "/b1")
    # batch 2: cross-batch copy of doc 0 (suppressed) + new doc 2
    spark.createDataFrame(
        [(9, "same content alpha"), (2, "unique two")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out_dir = str(tmp_path / "out")
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [0, 1, 2]
    # re-running with the same checkpoint emits nothing new (exactly-once)
    q2 = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    got2 = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got2 == [0, 1, 2]
