"""Round-5b: the SymSpell delete-key table as a txn-managed INDEX table
(maintenance.set_spell_table) — the 100 TB deployment shape for ed≤2
spellcheck.  The lazy per-revision cache remains the fallback; a searcher
uses the managed table only while its revision matches the table's
post-commit marker, so stale suggestions are never served."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.operators.search import FieldedIndex, InvertedIndex
from goobi_viewer_indexer_spark.plans import txn
from goobi_viewer_indexer_spark.plans.build import build_index, build_index_fielded
from goobi_viewer_indexer_spark.plans.maintenance import set_spell_table, set_stored_fields
from tests.conftest import SF001

CFG = IndexConfig(docs_per_segment=64, merge_fanin=2, block_size=16, postings_buckets=8, compact_below_bytes=256)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


@pytest.fixture(scope="module")
def sdir(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spell_idx"))
    build_index(docs, d, CFG)
    return d


def test_managed_spell_table_served_and_identical(spark, sdir):
    before = InvertedIndex(spark, sdir).suggest("tabel", max_edits=2)
    assert before, "fixture term should yield suggestions"
    set_spell_table(spark, sdir, tag="sp_v1")
    idx = InvertedIndex(spark, sdir)  # opened AFTER: rev matches the marker
    assert idx.suggest("tabel", max_edits=2) == before
    assert idx._spell_path == txn.table_path(sdir, "spell")


def test_replay_noops_and_mutation_invalidates(spark, docs, sdir):
    # replay with the same tag must not rebuild (txn done)
    set_spell_table(spark, sdir, tag="sp_v1")
    # a later committed mutation bumps the rev: the managed table is now
    # stale and a NEW handle must fall back to the lazy cache
    set_stored_fields(spark, sdir, docs.select("doc_id", "source"), tag="sp_stored")
    idx = InvertedIndex(spark, sdir)
    got = idx.suggest("tabel", max_edits=2)
    assert got  # correct suggestions, served from the fallback cache
    assert idx._spell_path != txn.table_path(sdir, "spell")
    # re-materializing at the new revision restores the managed path
    set_spell_table(spark, sdir)
    idx2 = InvertedIndex(spark, sdir)
    assert idx2.suggest("tabel", max_edits=2) == got
    assert idx2._spell_path == txn.table_path(sdir, "spell")


def test_fielded_managed_spell_table(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spell_fidx"))
    build_index_fielded(docs, d, {"text": "text", "lang": "lang"}, CFG)
    before = FieldedIndex(spark, d).suggest("text", "tabel", max_edits=2)
    assert before
    set_spell_table(spark, d, tag="fsp_v1")
    fidx = FieldedIndex(spark, d)
    assert fidx.suggest("text", "tabel", max_edits=2) == before
    assert fidx._spell_path == txn.table_path(d, "spell")
    # field scoping still holds on the managed table
    assert fidx.suggest("lang", "tabel", max_edits=2) == []
