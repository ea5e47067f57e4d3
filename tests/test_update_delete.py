"""delete_by_query (predicate → tombstone txn) and field-level atomic
updates of stored fields (reference SolrSearchIndex.deleteByQuery /
updateDoc {"set": v})."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.operators.naive_bm25 import bm25_topk
from goobi_viewer_indexer_spark.operators.search import InvertedIndex
from goobi_viewer_indexer_spark.plans import build as build_mod
from goobi_viewer_indexer_spark.plans import maintenance as maint

CFG = IndexConfig(docs_per_segment=16, merge_fanin=2, block_size=16, postings_buckets=4)

CORPUS = [(i, ("purge me now " if i % 5 == 0 else "keep this doc ") + f"tail{i} shared") for i in range(60)]


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    build_mod.build_index(docs, d, CFG)
    return d


def test_match_ids_and_or(spark, idx):
    engine = InvertedIndex(spark, idx)
    got = sorted(r["doc_id"] for r in engine.match_ids(["purge", "shared"], mode="and").collect())
    assert got == [i for i in range(60) if i % 5 == 0]
    got_or = sorted(r["doc_id"] for r in engine.match_ids(["purge", "keep"], mode="or").collect())
    assert got_or == list(range(60))
    assert engine.match_ids(["purge", "zzz"], mode="and").count() == 0


def test_delete_by_query_then_search(spark, idx):
    maint.delete_by_query(spark, idx, ["purge"], mode="and", tag="dq1")
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    live = docs.filter(F.col("doc_id") % 5 != 0)
    exp = [(r["doc_id"], r["score"]) for r in bm25_topk(live, ["shared", "keep"], k=10).collect()]
    got = [(r["doc_id"], r["score"]) for r in InvertedIndex(spark, idx).search(["shared", "keep"], k=10).collect()]
    assert got == exp
    # matched set is pinned in the intent: replay is a no-op
    before = InvertedIndex(spark, idx).search(["shared"], k=60).count()
    maint.delete_by_query(spark, idx, ["purge"], mode="and", tag="dq1")
    assert InvertedIndex(spark, idx).search(["shared"], k=60).count() == before


def test_set_stored_fields_merge(spark, idx):
    u1 = spark.createDataFrame([(0, "open", None), (1, None, "urn:a")], "doc_id long, access string, urn string")
    maint.set_stored_fields(spark, idx, u1, tag="sf1")
    s = {r["doc_id"]: (r["access"], r["urn"]) for r in maint.get_stored(spark, idx).collect()}
    assert s[0] == ("open", None) and s[1] == (None, "urn:a")

    # second update: overwrite one value, add a column, keep the rest
    u2 = spark.createDataFrame([(0, "restricted", "note0")], "doc_id long, access string, note string")
    maint.set_stored_fields(spark, idx, u2, tag="sf2")
    rows = {r["doc_id"]: r.asDict() for r in maint.get_stored(spark, idx).collect()}
    assert rows[0]["access"] == "restricted" and rows[0]["urn"] is None and rows[0]["note"] == "note0"
    assert rows[1]["access"] is None and rows[1]["urn"] == "urn:a" and rows[1]["note"] is None

    # replay with same tag: no-op even with different payload
    u3 = spark.createDataFrame([(0, "evil", "x")], "doc_id long, access string, note string")
    maint.set_stored_fields(spark, idx, u3, tag="sf2")
    assert maint.get_stored(spark, idx).filter("doc_id = 0").collect()[0]["access"] == "restricted"


def test_stored_updates_do_not_touch_postings(spark, idx):
    before = [tuple(r) for r in InvertedIndex(spark, idx).search(["shared"], k=10).collect()]
    u = spark.createDataFrame([(i, f"v{i}") for i in range(60)], "doc_id long, meta string")
    maint.set_stored_fields(spark, idx, u, tag="sf3")
    after = [tuple(r) for r in InvertedIndex(spark, idx).search(["shared"], k=10).collect()]
    assert before == after
