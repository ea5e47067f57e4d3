"""Incremental maintenance on MULTI-FIELD indexes: delete → tombstone-
filtered field-scoped search with corrected stats; append → fielded delta
segments; compact → purge.  Expected scores come from a from-scratch
Python BM25F over the live document set (field-local df/doclen/avgdl,
global N — the engine's documented contract)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import read_index_table

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.operators.search import FieldedIndex
from goobi_viewer_indexer_spark.plans import maintenance as maint
from goobi_viewer_indexer_spark.plans.build import build_index_fielded

CFG = IndexConfig(docs_per_segment=8, merge_fanin=2, block_size=8, postings_buckets=4)
FIELDS = {"title": "title", "body": "body"}

CORPUS = [
    (i, f"title{i % 7} shared", f"body text shared common{i % 5} filler word{i}")
    for i in range(40)
]


def tok(s):
    import re

    return re.findall(r"[a-z0-9]+", (s or "").lower())


def py_bm25f(rows, pairs, k1=1.2, b=0.75, k=10, mode="and"):
    """rows: (doc_id, title, body) live set; pairs: [(field, term)]."""
    cols = {"title": 1, "body": 2}
    toks = {f: {r[0]: tok(r[cols[f]]) for r in rows} for f in cols}
    n = len(rows)
    avgdl = {f: sum(len(v) for v in toks[f].values()) / n for f in cols}
    out = []
    for r in rows:
        i = r[0]
        s, matched = 0.0, 0
        for fname, term in pairs:
            tv = toks[fname][i]
            tf = tv.count(term)
            if tf == 0:
                continue
            matched += 1
            df = sum(1 for v in toks[fname].values() if term in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(tv) / avgdl[fname]))
        if matched == (len(pairs) if mode == "and" else 1) or (mode == "or" and matched > 0):
            out.append((i, round(s, 6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


PAIRS = [("title", "title3"), ("body", "shared")]


@pytest.fixture()
def fidx_dir(spark, tmp_path):
    d = str(tmp_path / "fidx")
    docs = spark.createDataFrame(CORPUS, "doc_id long, title string, body string")
    build_index_fielded(docs, d, FIELDS, CFG)
    return d


def _got(spark, d, pairs=PAIRS, mode="and", k=10):
    return [tuple(r) for r in FieldedIndex(spark, d).search(pairs, k=k, mode=mode).collect()]


def test_fielded_delete_then_search(spark, fidx_dir):
    victims = [3, 10, 17, 24, 31]  # title3 docs
    maint.delete_docs(spark, fidx_dir, victims, tag="fd1")
    live = [r for r in CORPUS if r[0] not in victims]
    assert _got(spark, fidx_dir) == py_bm25f(live, PAIRS)
    assert not any(v in {d for d, _ in _got(spark, fidx_dir, k=40)} for v in victims)
    # or-mode + phrase also tombstone-filtered
    assert _got(spark, fidx_dir, mode="or", k=40) == py_bm25f(live, PAIRS, k=40, mode="or")
    ph = {r["doc_id"] for r in FieldedIndex(spark, fidx_dir).search_phrase("body", ["body", "text"], k=40).collect()}
    assert ph == {r[0] for r in live}


def test_fielded_add_then_search(spark, fidx_dir):
    maint.delete_docs(spark, fidx_dir, [3, 10], tag="fd2")
    new = spark.createDataFrame(
        [("title3 shared extra", "body text shared common0 fresh"),
         ("unrelated heading", "completely different body")],
        "title string, body string",
    )
    maint.add_docs(spark, fidx_dir, new, tag="fa1")
    import pyspark.sql.functions as F

    ds = read_index_table(spark, fidx_dir, "doc_stats")
    new_ids = sorted(r["doc_id"] for r in ds.filter(F.col("doc_id") >= 40).collect())
    assert len(new_ids) == 2
    live = [r for r in CORPUS if r[0] not in (3, 10)] + [
        (new_ids[0], "title3 shared extra", "body text shared common0 fresh"),
        (new_ids[1], "unrelated heading", "completely different body"),
    ]
    assert _got(spark, fidx_dir, k=40) == py_bm25f(live, PAIRS, k=40)

    # replay of the add with the same tag: no-op
    maint.add_docs(spark, fidx_dir, new, tag="fa1")
    assert read_index_table(spark, fidx_dir, "doc_stats").count() == 42

    # compact purges tombstones; results unchanged (modulo exact stats)
    maint.compact(spark, fidx_dir)
    import os

    assert not os.path.exists(f"{fidx_dir}/tombstones")
    assert _got(spark, fidx_dir, k=40) == py_bm25f(live, PAIRS, k=40)
