"""facet.pivot / facet.query (round 4) against DataFrame twins, plus the
current.json committer lock (reentrancy + cross-process mutual exclusion)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr
from goobi_viewer_indexer_spark.operators.search import FieldedIndex, InvertedIndex
from goobi_viewer_indexer_spark.plans.build import build_index, build_index_fielded
from tests.conftest import SF001

CFG = IndexConfig(docs_per_segment=64, merge_fanin=2, block_size=16, postings_buckets=8, compact_below_bytes=256)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("facet_idx"))
    build_index(docs, d, CFG)
    return InvertedIndex(spark, d)


def _has(col, term):
    return F.array_contains(F.array_distinct(tokenize_expr(col)), term)


def test_facet_pivot_matches_twin(docs, idx):
    dims = docs.select("doc_id", "source", "lang")
    got = [tuple(r) for r in idx.facet_pivot(["table", "join"], dims, "source", "lang", min_count=2).collect()]
    want = [
        tuple(r)
        for r in docs.filter(_has("text", "table") & _has("text", "join"))
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .orderBy(F.desc("n"), "source", "lang")
        .collect()
    ]
    assert got == want and len(got) > 0
    # limit truncates the count-ordered list deterministically
    assert [tuple(r) for r in idx.facet_pivot(["table", "join"], dims, "source", "lang", min_count=2, limit=3).collect()] == want[:3]


def test_facet_query_matches_twin(docs, idx):
    got = {r["facet_query"]: r["n"] for r in idx.facet_query(
        ["table"], {"j": (["join"], "and"), "sw": (["spark", "window"], "and")}
    ).collect()}
    base = docs.filter(_has("text", "table"))
    want_j = base.filter(_has("text", "join")).count()
    want_sw = base.filter(_has("text", "spark") & _has("text", "window")).count()
    assert got == {"j": want_j, "sw": want_sw} and want_j > 0


def test_facet_query_fielded_with_range(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("facet_fidx"))
    build_index_fielded(
        docs.withColumn("nch", F.col("n_chars").cast("string")), d,
        {"text": "text", "nch": "nch"}, CFG,
    )
    fidx = FieldedIndex(spark, d)
    got = {r["facet_query"]: r["n"] for r in fidx.facet_query(
        "text:table", {"short": "nch:[0 TO 199]", "long": "nch:[200 TO *]"}
    ).collect()}
    base = docs.filter(_has("text", "table"))
    assert got["short"] == base.filter(F.col("n_chars") <= 199).count()
    assert got["long"] == base.filter(F.col("n_chars") >= 200).count()
    assert got["short"] + got["long"] == base.count()


def test_current_lock_reentrant_and_cross_process(tmp_path):
    import json
    import multiprocessing as mp
    import os

    from goobi_viewer_indexer_spark.plans import txn

    d = str(tmp_path)
    # reentrancy: publish_table holds the lock and calls _flip (which locks
    # again) — must not self-deadlock
    src = os.path.join(d, "stage")
    os.makedirs(src)
    open(os.path.join(src, "part-0"), "w").write("x")
    txn.publish_table(d, "t", src)
    assert txn.current_rev(d) == 1

    # cross-process: N workers bumping rev concurrently lose no increment
    def bump_many(index_dir, n):
        from goobi_viewer_indexer_spark.plans import txn as t

        for _ in range(n):
            t.bump_rev(index_dir)

    procs = [mp.Process(target=bump_many, args=(d, 25)) for _ in range(4)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    assert txn.current_rev(d) == 1 + 100
    cur = json.load(open(os.path.join(d, "current.json")))
    assert cur["tables"]["t"].startswith("t.v")


def test_facet_contains_matches_twin(docs, idx):
    """facet.contains (round 5b): substring filter on facet values, case
    -sensitive and -insensitive, against a DataFrame twin."""
    twin = (
        docs.filter(_has("text", "table"))
        .filter(F.lower(F.col("source")).contains("rc2"))
        .groupBy("source").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("source"))
    )
    exp = [tuple(r) for r in twin.collect()]
    got = [tuple(r) for r in idx.facet_counts(
        ["table"], docs.select("doc_id", "source"), "source",
        contains="RC2", contains_ignore_case=True).collect()]
    assert got == exp and len(got) > 0
    # case-sensitive: 'RC2' matches nothing in lowercase source values
    got_cs = idx.facet_counts(
        ["table"], docs.select("doc_id", "source"), "source", contains="RC2").collect()
    assert got_cs == []
