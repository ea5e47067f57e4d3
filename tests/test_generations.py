"""Generation-pointer commits (Iceberg-lite): concurrent readers never see
a missing/torn table directory during a swap, crashed publishes heal, and
local searchers detect staleness and refresh (VERDICT r2 #7/#9)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import read_index_table
from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.operators.search import FieldedIndex, InvertedIndex
from goobi_viewer_indexer_spark.plans import build as build_mod
from goobi_viewer_indexer_spark.plans import maintenance as maint
from goobi_viewer_indexer_spark.plans import txn
from goobi_viewer_indexer_spark.plans.build import build_index_fielded

CFG = IndexConfig(docs_per_segment=16, merge_fanin=2, block_size=16, postings_buckets=4, compact_below_bytes=256)
CORPUS = [(i, f"alpha beta doc{i} " + ("shared run " * (i % 3 + 1))) for i in range(50)]


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_mod.build_index(spark.createDataFrame(CORPUS, "doc_id long, text string"), d, CFG)
    return d


def test_reader_mid_publish_sees_intact_old_generation(spark, idx, monkeypatch):
    """Crash between the version-dir rename and the pointer flip: a reader
    opening RIGHT THEN must resolve the old, fully intact generation —
    the failure mode of the old rename-pair (live dir missing mid-swap)."""
    ts_before = sorted(tuple(r) for r in read_index_table(spark, idx, "term_stats").collect())
    real_flip = txn._flip
    calls = {"n": 0}

    def crashing_flip(index_dir, name, new_dirname):
        calls["n"] += 1
        raise RuntimeError("injected crash between rename and pointer flip")

    monkeypatch.setattr(txn, "_flip", crashing_flip)
    with pytest.raises(RuntimeError):
        maint.delete_docs(spark, idx, [3, 4], tag="gcrash")
    monkeypatch.setattr(txn, "_flip", real_flip)
    assert calls["n"] == 1

    # mid-crash reader: term_stats directory resolves and reads completely
    ts_mid = sorted(tuple(r) for r in read_index_table(spark, idx, "term_stats").collect())
    assert ts_mid == ts_before  # old generation, intact — never torn
    engine = InvertedIndex(spark, idx)  # full open works too
    assert engine.search(["shared"], k=5).count() == 5

    # retry with the same tag adopts the orphan version and completes
    maint.delete_docs(spark, idx, [3, 4], tag="gcrash")
    assert txn.txn_done(idx, "gcrash")
    got = {r["term"] for r in read_index_table(spark, idx, "term_stats").collect()}
    assert "doc3" not in got and "doc4" not in got
    # orphan adopted, not duplicated: exactly one live version + retention
    vers = [p for p in os.listdir(idx) if p.startswith("term_stats")]
    assert len(vers) <= 2, vers  # current + at most one retained


def test_snapshot_reader_survives_one_publish(spark, idx):
    """The displaced generation is retained until the NEXT publish, so a
    reader opened before a swap keeps a working snapshot through it."""
    old = InvertedIndex(spark, idx)
    before = [tuple(r) for r in old.search(["shared", "alpha"], k=10).collect()]
    maint.delete_docs(spark, idx, [7])
    assert old.is_stale()
    # the old snapshot still answers from its retained generation
    again = [tuple(r) for r in old.search(["shared", "alpha"], k=10).collect()]
    assert again == before
    # a fresh open sees the delete
    fresh = InvertedIndex(spark, idx)
    assert all(d != 7 for d, _ in ((r["doc_id"], r["score"]) for r in fresh.search(["shared", "alpha"], k=50).collect()))


def test_local_searcher_detects_staleness_and_refreshes(spark, idx):
    """VERDICT r2 #9: delete → a held LocalSearcher detects the revision
    bump on its next query and serves the post-delete truth."""
    loc = InvertedIndex(spark, idx).open_local()
    before = loc.search(["shared", "alpha"], k=50)
    victim = before[0][0]
    maint.delete_docs(spark, idx, [victim])
    after = loc.search(["shared", "alpha"], k=50)  # auto-refresh
    assert all(d != victim for d, _ in after)
    fresh = InvertedIndex(spark, idx).search(["shared", "alpha"], k=50).collect()
    assert after == [tuple(r) for r in fresh]


def test_rev_monotonic_and_pointer_atomicity(spark, idx):
    r0 = txn.current_rev(idx)
    maint.delete_docs(spark, idx, [1])
    r1 = txn.current_rev(idx)
    assert r1 > r0
    maint.add_docs(spark, idx, spark.createDataFrame([("alpha fresh shared",)], "text string"))
    r2 = txn.current_rev(idx)
    assert r2 > r1
    # pointer file is valid json with resolvable tables at all times
    cur = txn._read_current(idx)
    for name, rel in cur["tables"].items():
        assert os.path.isdir(os.path.join(idx, rel)), (name, rel)


def test_compact_publishes_generations_and_reader_correct(spark, idx):
    maint.delete_docs(spark, idx, [10, 11, 12], trace=False)
    maint.compact(spark, idx)
    engine = InvertedIndex(spark, idx)
    assert engine._tomb_packed is None  # tombstones cleared
    ids = {r["doc_id"] for r in engine.match_ids(["shared"], mode="and").collect()}
    assert not ids & {10, 11, 12}
    # doc_stats resolved through pointer matches live corpus
    assert read_index_table(spark, idx, "doc_stats").count() == 47


def test_fielded_local_searcher_staleness(spark, tmp_path):
    d = str(tmp_path / "fidx")
    docs = [(i, f"alpha doc{i} shared", f"s{i % 3}") for i in range(40)]
    build_index_fielded(
        spark.createDataFrame(docs, "doc_id long, text string, source string"),
        d, {"text": "text", "source": "source"}, CFG,
    )
    loc = FieldedIndex(spark, d).open_local()
    before = loc.search("text:shared", k=40)
    victim = before[0][0]
    maint.delete_docs(spark, d, [victim])
    after = loc.search("text:shared", k=40)
    assert all(doc != victim for doc, _ in after)


# ---- named snapshots / restore / vacuum (round 5c) ------------------------

def _top10(spark, d):
    return [tuple(r) for r in InvertedIndex(spark, d).search(["alpha"], k=10).collect()]


def test_snapshot_restore_roundtrip(spark, idx):
    before = _top10(spark, idx)
    txn.snapshot(idx, "pre")
    maint.delete_docs(spark, idx, [0, 1, 2], tag="snapdel")
    after = _top10(spark, idx)
    assert after != before and not any(d in {0, 1, 2} for d, _ in after)
    rev_deleted = txn.current_rev(idx)
    txn.restore_snapshot(idx, "pre")
    assert txn.current_rev(idx) > rev_deleted  # rev bumps -> searchers refresh
    assert _top10(spark, idx) == before
    names = [s["name"] for s in txn.list_snapshots(idx)]
    assert names == ["pre"]
    with pytest.raises(ValueError, match="no snapshot"):
        txn.restore_snapshot(idx, "nope")


def test_snapshot_pins_generations_across_gc(spark, idx):
    """Two publishes normally GC the generation a snapshot references —
    the pin must keep it restorable."""
    before = _top10(spark, idx)
    txn.snapshot(idx, "keep")
    pinned = set(txn.snapshot(idx, "keep")["tables"].values())
    # two successive mutations: without pinning, flip #2 GCs the
    # generation flip #1 displaced (the snapshot's)
    maint.delete_docs(spark, idx, [5], tag="gc1")
    maint.delete_docs(spark, idx, [6], tag="gc2")
    for dname in pinned:
        assert os.path.exists(os.path.join(idx, dname)), dname
    txn.restore_snapshot(idx, "keep")
    assert _top10(spark, idx) == before


def test_drop_and_vacuum_reclaims_unreferenced(spark, idx):
    txn.snapshot(idx, "v")
    maint.delete_docs(spark, idx, [7], tag="vac1")
    maint.delete_docs(spark, idx, [8], tag="vac2")
    assert txn.vacuum(idx) == []  # everything still pinned or live
    txn.drop_snapshot(idx, "v")
    removed = txn.vacuum(idx)
    # current + retained generations survive, searches still work
    cur = txn._read_current(idx)
    live = set(cur["tables"].values()) | set(cur["retained"].values())
    assert not (set(removed) & live)
    assert len(_top10(spark, idx)) > 0
