"""Property-based codec tests (hypothesis): varint/delta/position streams
round-trip for arbitrary well-formed posting lists, and the merge splice
equals a from-scratch encode of the concatenated list."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from goobi_viewer_indexer_spark.functions import codec

posting_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1 << 40),      # doc gap seed
        st.integers(min_value=1, max_value=200),          # tf
    ),
    min_size=1,
    max_size=300,
)


def _mk_docs(pairs):
    gaps = np.array([g % 1000 + 1 for g, _ in pairs], dtype=np.int64)
    docs = np.cumsum(gaps) - 1
    tfs = np.array([tf for _, tf in pairs], dtype=np.int64)
    return docs, tfs


@settings(max_examples=200, deadline=None)
@given(posting_lists)
def test_varint_roundtrip(pairs):
    docs, tfs = _mk_docs(pairs)
    buf = codec.varint_encode(docs.astype(np.uint64))
    out = codec.varint_decode(buf, count=docs.size).astype(np.int64)
    assert np.array_equal(out, docs)


@settings(max_examples=100, deadline=None)
@given(posting_lists, st.integers(min_value=2, max_value=64))
def test_encode_decode_postings_roundtrip(pairs, block_size):
    docs, tfs = _mk_docs(pairs)
    lens = np.maximum(tfs * 3, 1)
    enc = codec.encode_postings(docs, tfs, lens, avgdl=10.0, k1=1.2, b=0.75, block_size=block_size)
    d, t = codec.decode_postings(enc["doc_bytes"], enc["tf_bytes"], count=docs.size)
    assert np.array_equal(d, docs) and np.array_equal(t, tfs)
    assert enc["min_doc"] == docs[0] and enc["max_doc"] == docs[-1]
    # block metadata is consistent: last docs ascending, offsets monotone
    assert np.all(np.diff(enc["block_last_doc"]) > 0) or len(enc["block_last_doc"]) == 1
    assert np.all(np.diff(enc["block_doc_off"]) >= 0)


@settings(max_examples=100, deadline=None)
@given(posting_lists, st.integers(min_value=2, max_value=32))
def test_positions_roundtrip_property(pairs, maxpos_mult):
    docs, tfs = _mk_docs(pairs)
    rng = np.random.default_rng(int(tfs.sum()) % 2**31)
    flat = np.concatenate(
        [np.sort(rng.choice(int(tf) * maxpos_mult + 8, size=int(tf), replace=False)) for tf in tfs]
    ).astype(np.int64)
    buf, off = codec.encode_positions_flat(flat, tfs)
    assert int(off[-1]) == buf.size
    dec = codec.decode_positions_flat(buf.tobytes(), tfs)
    assert np.array_equal(dec, flat)


@settings(max_examples=100, deadline=None)
@given(posting_lists, posting_lists)
def test_splice_merge_equals_full_encode(pairs_a, pairs_b):
    """Byte-splice of two range-disjoint lists == encoding the concat."""
    docs_a, tfs_a = _mk_docs(pairs_a)
    docs_b0, tfs_b = _mk_docs(pairs_b)
    docs_b = docs_b0 + docs_a[-1] + 1 + (docs_b0[0] % 7)  # disjoint, arbitrary gap
    ea = codec.encode_postings(docs_a, tfs_a, np.maximum(tfs_a, 1), 10.0, 1.2, 0.75, 16)
    eb = codec.encode_postings(docs_b, tfs_b, np.maximum(tfs_b, 1), 10.0, 1.2, 0.75, 16)
    spliced, _delta = codec.splice_first_gap(eb["doc_bytes"], int(docs_b[0]) - int(docs_a[-1]) - 1)
    merged_bytes = ea["doc_bytes"] + spliced
    alldocs = np.concatenate([docs_a, docs_b])
    alltfs = np.concatenate([tfs_a, tfs_b])
    d, t = codec.decode_postings(merged_bytes, ea["tf_bytes"] + eb["tf_bytes"], count=alldocs.size)
    assert np.array_equal(d, alldocs) and np.array_equal(t, alltfs)
