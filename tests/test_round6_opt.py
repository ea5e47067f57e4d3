"""Round-6 optimization internals: the per-index doclens/tombstone
broadcast must be plan-level only — rank/byte-identical to the join path
it replaces — and the term-stats memo must agree with fresh lookups.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.operators.search import FieldedIndex, InvertedIndex
from goobi_viewer_indexer_spark.plans.build import build_index, build_index_fielded
from goobi_viewer_indexer_spark.plans.maintenance import delete_docs
from tests.conftest import SF001


@pytest.fixture(scope="module")
def flat_idx_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r6_flat"))
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index(docs, d, IndexConfig(docs_per_segment=64, merge_fanin=4, postings_buckets=16))
    return d


@pytest.fixture(scope="module")
def fielded_idx_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r6_fielded"))
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index_fielded(
        docs, d, {"text": "text", "lang": "lang"},
        IndexConfig(docs_per_segment=64, merge_fanin=4, postings_buckets=16),
    )
    return d


def _force_join_path(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DOCLENS_BC_MB", "0.0000001")


def test_flat_broadcast_vs_join_parity(spark, flat_idx_dir, monkeypatch):
    bc_idx = InvertedIndex(spark, flat_idx_dir)
    assert bc_idx._rng_broadcast() is not None  # fixture corpus fits the budget
    _force_join_path(monkeypatch)
    join_idx = InvertedIndex(spark, flat_idx_dir)
    assert join_idx._rng_broadcast() is None

    def rows(df):
        return [tuple(r) for r in df.collect()]

    for q, mode in [(["table", "join"], "or"), (["table", "join"], "and")]:
        assert rows(bc_idx.search(q, k=10, mode=mode)) == rows(join_idx.search(q, k=10, mode=mode))
    assert rows(bc_idx.search_phrase(["table", "join"], k=10)) == \
        rows(join_idx.search_phrase(["table", "join"], k=10))
    assert rows(bc_idx.search_boolean("(table join) -spark", k=10)) == \
        rows(join_idx.search_boolean("(table join) -spark", k=10))
    assert sorted(rows(bc_idx.match_ids(["table", "join"], mode="and"))) == \
        sorted(rows(join_idx.match_ids(["table", "join"], mode="and")))
    assert bc_idx.search_many({"a": (["table", "join"], "or", 5)}) == \
        join_idx.search_many({"a": (["table", "join"], "or", 5)})


def test_flat_broadcast_sees_tombstones(spark, flat_idx_dir, tmp_path, monkeypatch):
    # copy the index, delete some matching docs, and check both paths
    # agree on the post-delete result (the broadcast folds tombstones in)
    import shutil

    d = str(tmp_path / "idx")
    shutil.copytree(flat_idx_dir, d)
    victims = [r["doc_id"] for r in InvertedIndex(spark, d).search(
        ["table", "join"], k=3, mode="or").collect()]
    delete_docs(spark, d, victims)
    bc_idx = InvertedIndex(spark, d)
    assert bc_idx._rng_broadcast() is not None
    got = [r["doc_id"] for r in bc_idx.search(["table", "join"], k=10, mode="or").collect()]
    assert not set(got) & set(victims)
    _force_join_path(monkeypatch)
    join_idx = InvertedIndex(spark, d)
    got_join = [r["doc_id"] for r in join_idx.search(["table", "join"], k=10, mode="or").collect()]
    assert got == got_join


def test_fielded_broadcast_vs_join_parity(spark, fielded_idx_dir, monkeypatch):
    bc_idx = FieldedIndex(spark, fielded_idx_dir)
    assert bc_idx._rng_broadcast() is not None
    _force_join_path(monkeypatch)
    join_idx = FieldedIndex(spark, fielded_idx_dir)
    assert join_idx._rng_broadcast() is None

    def rows(df):
        return [tuple(r) for r in df.collect()]

    for q in ["text:table AND lang:en", "text:(table join)", 'text:"table join"']:
        assert rows(bc_idx.search(q, k=10)) == rows(join_idx.search(q, k=10))
        assert sorted(rows(bc_idx.match_ids(q))) == sorted(rows(join_idx.match_ids(q)))
    qf = {"text": 1.0, "lang": 2.0}
    assert rows(bc_idx.search_dismax("table join", qf, k=10, tie=0.3)) == \
        rows(join_idx.search_dismax("table join", qf, k=10, tie=0.3))
    spec = {"a": ("table join", qf, 5, 0.3)}
    assert bc_idx.search_dismax_many(spec) == join_idx.search_dismax_many(spec)


def test_stats_memo_matches_fresh_lookup(spark, flat_idx_dir):
    idx = InvertedIndex(spark, flat_idx_dir)
    fresh = dict(idx.term_stats_for(["table", "join", "zzznope"]))
    # memo hit path returns the identical mapping, absent term stays absent
    again = dict(idx.term_stats_for(["table", "join", "zzznope"]))
    assert fresh == again
    assert "zzznope" not in fresh and idx._stats_memo["zzznope"] is None
    # expansion pre-population agrees with a cold handle's stats job
    cold = InvertedIndex(spark, flat_idx_dir)
    terms = idx.expand_fuzzy("tabl")
    assert terms  # 'table' reachable at ed1
    assert {t: idx._stats_memo[t] for t in terms} == cold.term_stats_for(terms)
