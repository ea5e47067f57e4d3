"""Query-time synonym expansion (Solr SynonymGraphFilter at query time):
each term with an entry becomes an OR-group of itself plus its
alternatives, each scoring with its OWN idf (the documented,
SQL-checkable deviation from Lucene's blended-df SynonymQuery).  The
rewrite targets the existing boolean-group kernels, so these tests pin
IDENTITY with the explicit group queries the oracle gate already
covers."""

from __future__ import annotations

import pytest

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.operators.search import FieldedIndex, InvertedIndex
from goobi_viewer_indexer_spark.plans.build import build_index, build_index_fielded
from tests.conftest import SF001

CFG = IndexConfig(docs_per_segment=64, merge_fanin=2, block_size=32, postings_buckets=8, compact_below_bytes=512)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("syn_idx"))
    build_index(spark.read.parquet(f"{SF001}/documents.parquet"), d, CFG)
    return InvertedIndex(spark, d)


@pytest.fixture(scope="module")
def fidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("syn_fidx"))
    build_index_fielded(spark.read.parquet(f"{SF001}/documents.parquet"), d,
                        {"text": "text", "lang": "lang"}, CFG)
    return FieldedIndex(spark, d)


SYN = {"table": ["join"], "spark": ["window", "Spark"]}


def test_flat_and_equals_boolean_groups(spark, idx):
    got = [tuple(r) for r in idx.search(["table", "spark"], k=12, mode="and",
                                        synonyms=SYN).collect()]
    want = [tuple(r) for r in idx.search_boolean("(join table) (spark window)", k=12).collect()]
    assert got == want and got


def test_flat_or_equals_union(spark, idx):
    got = [tuple(r) for r in idx.search("table spark", k=12, mode="or", synonyms=SYN).collect()]
    want = [tuple(r) for r in idx.search(["join", "spark", "table", "window"], k=12,
                                         mode="or").collect()]
    assert got == want and got


def test_fielded_rewrite_identity_and_mm(spark, fidx):
    got = [tuple(r) for r in fidx.search("text:table AND lang:en", k=12,
                                         synonyms=SYN).collect()]
    want = [tuple(r) for r in fidx.search("text:(join table) AND lang:(en)", k=12).collect()]
    assert got == want and got
    # OR mode keeps mm semantics: mm counts the ORIGINAL clauses
    got2 = [tuple(r) for r in fidx.search("text:table OR text:zzznope OR lang:en", k=12,
                                          synonyms=SYN, min_match=2).collect()]
    want2 = [tuple(r) for r in fidx.search(
        "text:(join table) OR text:(zzznope) OR lang:(en)", k=12, min_match=2).collect()]
    assert got2 == want2 and got2


def test_synonym_guards(spark, idx, fidx):
    with pytest.raises(ValueError, match="single token"):
        idx.search(["table"], k=5, synonyms={"table": ["two words"]})
    with pytest.raises(ValueError, match="plain"):
        idx.search(["table"], k=5, synonyms=SYN, fl=["source"])
    with pytest.raises(ValueError, match="plain"):
        fidx.search("text:table", k=5, synonyms=SYN, offset=5)
    with pytest.raises(ValueError, match="boosts"):
        fidx.search("text:table^2.0", k=5, synonyms=SYN)
    # terms without an entry pass through unchanged
    got = [tuple(r) for r in idx.search(["table"], k=5, mode="or", synonyms={"x": ["y"]}).collect()]
    want = [tuple(r) for r in idx.search(["table"], k=5, mode="or").collect()]
    assert got == want
