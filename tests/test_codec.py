import numpy as np
import pytest

from goobi_viewer_indexer_spark.functions import codec


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    ids = np.unique(rng.integers(0, 10**12, 3000).astype(np.int64))
    tfs = rng.integers(1, 500, ids.size).astype(np.int64)
    dls = rng.integers(1, 3000, ids.size).astype(np.int64)
    enc = codec.encode_postings(ids, tfs, dls, 300.0, 1.2, 0.75, block_size=64)
    d, t = codec.decode_postings(enc["doc_bytes"], enc["tf_bytes"], enc["count"])
    assert np.array_equal(d, ids)
    assert np.array_equal(t, tfs)


def test_varint_edges():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**35, 2**56, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(v)), v)
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""


def test_single_posting():
    enc = codec.encode_postings(
        np.array([42]), np.array([7]), np.array([10]), 10.0, 1.2, 0.75
    )
    d, t = codec.decode_postings(enc["doc_bytes"], enc["tf_bytes"], 1)
    assert d.tolist() == [42] and t.tolist() == [7]


def test_block_offsets_allow_partial_decode():
    ids = np.arange(0, 1000, 3, dtype=np.int64)
    tfs = np.ones(ids.size, dtype=np.int64)
    enc = codec.encode_postings(ids, tfs, np.full(ids.size, 50), 50.0, 1.2, 0.75, block_size=100)
    # decode block 1 standalone, rebasing on block 0's last doc
    off = int(enc["block_doc_off"][1])
    gaps = codec.varint_decode(enc["doc_bytes"][off:], count=100)
    docs = np.cumsum(gaps.astype(np.int64) + 1) - 1 + int(enc["block_last_doc"][0]) + 1
    assert np.array_equal(docs, ids[100:200])


def test_encode_many_matches_encode_postings():
    rng = np.random.default_rng(7)
    # three terms back to back
    runs = []
    for _ in range(3):
        ids = np.unique(rng.integers(0, 10**6, 400).astype(np.int64))
        tfs = rng.integers(1, 9, ids.size).astype(np.int64)
        dls = rng.integers(1, 100, ids.size).astype(np.int64)
        runs.append((ids, tfs, dls))
    flat_ids = np.concatenate([r[0] for r in runs])
    flat_tfs = np.concatenate([r[1] for r in runs])
    flat_w = codec.bm25_weight(flat_tfs, np.concatenate([r[2] for r in runs]), 55.0, 1.2, 0.75)
    starts = np.array([0, runs[0][0].size, runs[0][0].size + runs[1][0].size])
    many = codec.encode_many(flat_ids, flat_tfs, flat_w, starts, block_size=128)
    for i, (ids, tfs, dls) in enumerate(runs):
        one = codec.encode_postings(ids, tfs, dls, 55.0, 1.2, 0.75, block_size=128)
        assert many["doc_bytes"][i] == one["doc_bytes"]
        assert many["tf_bytes"][i] == one["tf_bytes"]
        assert np.array_equal(many["block_last_doc"][i], one["block_last_doc"])
        assert np.array_equal(many["block_doc_off"][i], one["block_doc_off"])
        assert np.allclose(many["block_max_w"][i], one["block_max_w"])


def test_splice_first_gap():
    ids = np.array([500, 600, 700], dtype=np.int64)
    enc = codec.encode_postings(ids, np.ones(3, np.int64), np.full(3, 10), 10.0, 1.2, 0.75)
    # rebase as if previous list ended at doc 449
    new_buf, delta = codec.splice_first_gap(enc["doc_bytes"], 500 - 449 - 1)
    gaps = codec.varint_decode(new_buf).astype(np.int64)
    docs = np.cumsum(gaps + 1) - 1 + 450
    assert docs.tolist() == [500, 600, 700]
    assert delta == len(new_buf) - len(enc["doc_bytes"])
