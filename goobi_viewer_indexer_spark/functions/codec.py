"""Posting-list codec: delta-gap + LEB128 varint docIDs, varint tfs, skip
blocks and block-max metadata.

Replaces the Lucene codec behind the reference's Solr queries
(helper/SolrSearchIndex.java:189-215 delegates all of this to Lucene
segments).  Everything is vectorized numpy — these functions run inside
Arrow pandas UDFs on executors, so no per-row Python.

Layout per posting list (one term within one segment's doc_id range):

* ``doc_ids`` — strictly increasing int64, encoded as varint(delta-1 gaps)
  with the first value encoded absolutely (delta from -1).
* ``tfs``    — varint(tf-1), parallel to doc_ids.
* skip/block metadata every ``block_size`` postings:
  ``block_last_doc[i]``  last docID of block i (skip pointer),
  ``block_doc_off[i]``   byte offset of block i in the doc_ids buffer,
  ``block_tf_off[i]``    byte offset of block i in the tfs buffer,
  ``block_max_w[i]``     max over block of tf/(tf + k1*(1-b+b*dl/avgdl)),
  the doc-dependent BM25 factor — multiplied by idf at query time this is
  the block's score upper bound for block-max WAND pruning.
* ``positions`` (optional third stream, Lucene-style) — per posting, the
  token indexes of the term in the doc, varint-gap encoded with the first
  position absolute *per posting* (so merge concatenation needs NO splice
  — positions are doc-relative).  ``block_pos_off[i]`` is the byte offset
  of block i's positions; the per-posting split inside a block is implied
  by the tfs (position count == tf).  Enables phrase/proximity queries
  (the reference gets these from Solr's default positional text fields,
  helper/FulltextAugmentor.java:78-238).  BM25-only queries never read
  the stream — parquet column pruning skips it entirely.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "varint_encode",
    "varint_decode",
    "varint_lengths",
    "encode_postings",
    "encode_many",
    "encode_positions_flat",
    "decode_positions_flat",
    "splice_first_gap",
    "decode_postings",
    "bm25_weight",
]

_THRESH = [1 << (7 * i) for i in range(1, 10)]  # varint length breakpoints


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: 1 + (#thresholds <= v)
    lengths = np.ones(v.size, dtype=np.int64)
    for t in _THRESH:
        lengths += (v >= np.uint64(t)).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    out = np.zeros(int(lengths.sum()), dtype=np.uint8)
    pending = v.copy()
    max_len = int(lengths.max())
    for k in range(max_len):
        live = lengths > k
        byte = (pending[live] & np.uint64(0x7F)).astype(np.uint8)
        more = lengths[live] > (k + 1)
        byte |= more.astype(np.uint8) << 7
        out[offsets[live] + k] = byte
        pending[live] >>= np.uint64(7)
    return out.tobytes()


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    lengths = np.ones(v.size, dtype=np.int64)
    for t in _THRESH:
        lengths += (v >= np.uint64(t)).astype(np.int64)
    return lengths


def encode_positions_flat(positions: np.ndarray, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Varint-gap encode a flat position stream (posting i owns slice
    ``[tfcum[i], tfcum[i+1])``, ascending within each posting; first value
    per posting absolute).  Returns (byte buffer uint8, per-value byte
    offsets int64 of length npos+1)."""
    npos = positions.size
    tfcum = np.concatenate(([0], np.cumsum(tfs)))
    pg = np.empty(npos, dtype=np.int64)
    if npos > 1:
        pg[1:] = positions[1:] - positions[:-1] - 1
    if npos > 0:
        pg[0] = positions[0]
    pstarts = tfcum[:-1]
    pg[pstarts] = positions[pstarts]
    pgu = pg.astype(np.uint64)
    buf = np.frombuffer(varint_encode(pgu), dtype=np.uint8)
    off = np.concatenate(([0], np.cumsum(varint_lengths(pgu))))
    return buf, off


def decode_positions_flat(pos_bytes: bytes | np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_positions_flat` for one block/run whose
    per-posting counts are ``tfs``.  Returns the flat absolute positions."""
    total = int(tfs.sum())
    pg = varint_decode(pos_bytes, count=total).astype(np.int64)
    if pg.size == 0:
        return pg
    c = np.cumsum(pg + 1)
    starts_idx = (np.cumsum(tfs) - tfs).astype(np.int64)
    cbefore = np.concatenate(([0], c))[starts_idx]  # c[start-1], 0 at start 0
    return c - np.repeat(cbefore, tfs.astype(np.int64)) - 1


def encode_many(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    weights: np.ndarray,
    starts: np.ndarray,
    block_size: int = 128,
    positions: np.ndarray | None = None,
) -> dict:
    """Encode MANY posting lists laid out back-to-back in one flat array —
    the SPIMI stage-1 hot path (one call per segment, zero per-term Python).

    ``doc_ids``/``tfs``/``weights`` are flat arrays sorted by
    (term, doc_id); ``starts[i]`` is the index where term i's run begins.
    Returns per-term lists of buffers + block metadata, all produced by
    slicing two single varint_encode passes.
    """
    n = doc_ids.size
    nterms = starts.size
    ends = np.append(starts[1:], n)
    B = block_size

    # delta-gap with absolute first posting per term
    d = np.empty(n, dtype=np.int64)
    if n > 1:
        d[1:] = doc_ids[1:] - doc_ids[:-1] - 1
    if n > 0:
        d[0] = 0
    d[starts] = doc_ids[starts]
    gaps = d.astype(np.uint64)

    doc_buf = np.frombuffer(varint_encode(gaps), dtype=np.uint8)
    tf_buf = np.frombuffer(varint_encode((tfs - 1).astype(np.uint64)), dtype=np.uint8)
    doc_len = varint_lengths(gaps)
    tf_len = varint_lengths((tfs - 1).astype(np.uint64))
    doc_off = np.concatenate(([0], np.cumsum(doc_len)))   # n+1
    tf_off = np.concatenate(([0], np.cumsum(tf_len)))

    # global block layout: blocks tile each term's run
    nb = (ends - starts + B - 1) // B
    tot_b = int(nb.sum())
    term_of_block = np.repeat(np.arange(nterms), nb)
    nb_cum = np.cumsum(nb) - nb
    within = np.arange(tot_b) - np.repeat(nb_cum, nb)
    bstart = starts[term_of_block] + within * B
    bend = np.minimum(bstart + B, ends[term_of_block])

    block_last_doc = doc_ids[bend - 1]
    block_max_w = np.maximum.reduceat(weights, bstart) if tot_b else np.zeros(0)
    block_doc_off = doc_off[bstart] - doc_off[starts[term_of_block]]
    block_tf_off = tf_off[bstart] - tf_off[starts[term_of_block]]

    bsplit = np.cumsum(nb)[:-1]
    doc_bytes = [doc_buf[doc_off[s]:doc_off[e]].tobytes() for s, e in zip(starts, ends)]
    tf_bytes = [tf_buf[tf_off[s]:tf_off[e]].tobytes() for s, e in zip(starts, ends)]
    out = {
        "doc_bytes": doc_bytes,
        "tf_bytes": tf_bytes,
        "counts": (ends - starts),
        "min_doc": doc_ids[starts] if n else np.zeros(0, np.int64),
        "max_doc": doc_ids[ends - 1] if n else np.zeros(0, np.int64),
        "block_last_doc": np.split(block_last_doc, bsplit),
        "block_doc_off": np.split(block_doc_off, bsplit),
        "block_tf_off": np.split(block_tf_off, bsplit),
        "block_max_w": np.split(block_max_w, bsplit),
    }
    if positions is not None:
        pos_buf, pos_off = encode_positions_flat(positions, tfs)
        tfcum = np.concatenate(([0], np.cumsum(tfs)))
        out["pos_bytes"] = [
            pos_buf[pos_off[tfcum[s]]:pos_off[tfcum[e]]].tobytes() for s, e in zip(starts, ends)
        ]
        block_pos_off = pos_off[tfcum[bstart]] - pos_off[tfcum[starts[term_of_block]]]
        out["block_pos_off"] = np.split(block_pos_off, bsplit)
    return out


def splice_first_gap(doc_bytes: bytes, new_gap: int) -> tuple[bytes, int]:
    """Replace the leading varint of an encoded docID buffer with
    varint(new_gap) — the merge fix-up that re-bases an absolute-first
    segment list onto the previous segment's last docID, making plain
    byte concatenation a valid merged list (no full decode/re-encode).
    Returns (new_buffer, byte_delta)."""
    data = np.frombuffer(doc_bytes, dtype=np.uint8)
    first_end = int(np.flatnonzero((data & 0x80) == 0)[0])
    head = varint_encode(np.array([new_gap], dtype=np.uint64))
    return head + data[first_end + 1:].tobytes(), len(head) - (first_end + 1)


def varint_decode(buf: bytes | np.ndarray, offset: int = 0, count: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode → uint64 array.

    ``offset`` is a byte offset into ``buf`` (used with skip pointers);
    ``count`` limits how many values to decode (None = all).
    """
    data = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if offset:
        data = data[offset:]
    if data.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (data & 0x80) == 0
    ends = np.flatnonzero(is_last)
    if count is not None:
        ends = ends[:count]
        data = data[: ends[-1] + 1] if ends.size else data[:0]
    n = ends.size
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    out = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max())
    for k in range(max_len):
        live = lengths > k
        out[live] |= (data[starts[live] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return out


def bm25_weight(tfs: np.ndarray, doclens: np.ndarray, avgdl, k1: float, b: float) -> np.ndarray:
    """Doc-dependent BM25 factor w = tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)).

    Query-time score = idf(term) * w; block_max stores max(w) per block so
    idf * block_max upper-bounds any score inside the block.
    ``avgdl`` may be a scalar or an array parallel to ``tfs`` (multi-field
    indexes carry a per-posting field avgdl)."""
    tf = tfs.astype(np.float64)
    dl = doclens.astype(np.float64)
    if isinstance(avgdl, np.ndarray):
        av = np.where(avgdl > 0, avgdl, 1.0)
    else:
        av = avgdl if avgdl > 0 else 1.0
    denom_norm = k1 * (1.0 - b + b * dl / av)
    return tf * (k1 + 1.0) / (tf + denom_norm)


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int = 128,
    positions: np.ndarray | None = None,
) -> dict:
    """Encode one posting list (doc_ids strictly increasing).

    ``doclens[i]`` is the token length of ``doc_ids[i]``'s document — needed
    only for block-max computation at build time.
    Returns dict with binary buffers + block metadata arrays.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = doc_ids.size
    assert n > 0
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = np.uint64(doc_ids[0])
    if n > 1:
        deltas = np.diff(doc_ids)
        if (deltas <= 0).any():
            raise ValueError("doc_ids must be strictly increasing")
        gaps[1:] = (deltas - 1).astype(np.uint64)

    w = bm25_weight(tfs, doclens, avgdl, k1, b)

    n_blocks = (n + block_size - 1) // block_size
    block_last_doc = np.empty(n_blocks, dtype=np.int64)
    block_doc_off = np.empty(n_blocks, dtype=np.int64)
    block_tf_off = np.empty(n_blocks, dtype=np.int64)
    block_max_w = np.empty(n_blocks, dtype=np.float64)

    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    d_off = t_off = 0
    pos_chunks: list[bytes] = []
    block_pos_off = np.zeros(n_blocks, dtype=np.int64)
    p_off = 0
    if positions is not None:
        pos_buf, pos_voff = encode_positions_flat(positions, tfs)
        tfcum = np.concatenate(([0], np.cumsum(tfs)))
    for i in range(n_blocks):
        lo, hi = i * block_size, min((i + 1) * block_size, n)
        dch = varint_encode(gaps[lo:hi])
        tch = varint_encode((tfs[lo:hi] - 1).astype(np.uint64))
        block_doc_off[i] = d_off
        block_tf_off[i] = t_off
        block_last_doc[i] = doc_ids[hi - 1]
        block_max_w[i] = w[lo:hi].max()
        d_off += len(dch)
        t_off += len(tch)
        doc_chunks.append(dch)
        tf_chunks.append(tch)
        if positions is not None:
            pch = pos_buf[pos_voff[tfcum[lo]]:pos_voff[tfcum[hi]]].tobytes()
            block_pos_off[i] = p_off
            p_off += len(pch)
            pos_chunks.append(pch)

    out = {
        "doc_bytes": b"".join(doc_chunks),
        "tf_bytes": b"".join(tf_chunks),
        "count": n,
        "block_last_doc": block_last_doc,
        "block_doc_off": block_doc_off,
        "block_tf_off": block_tf_off,
        "block_max_w": block_max_w,
        "min_doc": int(doc_ids[0]),
        "max_doc": int(doc_ids[-1]),
    }
    if positions is not None:
        out["pos_bytes"] = b"".join(pos_chunks)
        out["block_pos_off"] = block_pos_off
    return out


def decode_postings(doc_bytes: bytes, tf_bytes: bytes, count: int, first_block_base: int = -1) -> tuple[np.ndarray, np.ndarray]:
    """Full decode of one encoded posting list → (doc_ids int64, tfs int64).

    Inverse of :func:`encode_postings` (block boundaries don't matter for a
    full decode because gaps are relative to the previous posting globally
    within the list — blocks only add byte offsets).
    """
    gaps = varint_decode(doc_bytes, count=count).astype(np.int64)
    if gaps.size == 0:
        return gaps, gaps
    doc_ids = np.cumsum(gaps + 1) - 1 + (first_block_base + 1)
    tfs = varint_decode(tf_bytes, count=count).astype(np.int64) + 1
    return doc_ids, tfs
