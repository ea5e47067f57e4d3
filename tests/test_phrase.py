"""Positional postings + phrase queries: codec roundtrip, rank identity
across the three engines (naive DataFrame twin / distributed WAND engine /
LocalSearcher), merge/compact position survival, duplicate-term phrases."""

from __future__ import annotations

import numpy as np
import pytest

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.functions import codec
from goobi_viewer_indexer_spark.operators.naive_bm25 import bm25_phrase_topk
from goobi_viewer_indexer_spark.operators.search import InvertedIndex
from goobi_viewer_indexer_spark.plans import build as build_mod
from goobi_viewer_indexer_spark.plans import maintenance as maint
from tests.conftest import SF001

# tiny segments/blocks so merges, splices and multi-block lists all happen
CFG = IndexConfig(docs_per_segment=32, merge_fanin=2, block_size=16, postings_buckets=8, compact_below_bytes=256)

PHRASES = [
    ["spark", "window"],
    ["table", "join"],
    ["value", "value"],            # duplicate-term phrase
    ["table", "join", "spark"],
    ["scan", "a", "scan"],         # terms exist, phrase absent
]


def test_positions_roundtrip_random():
    rng = np.random.default_rng(3)
    tfs = rng.integers(1, 6, 200).astype(np.int64)
    flat = np.concatenate([np.sort(rng.choice(500, size=tf, replace=False)) for tf in tfs]).astype(np.int64)
    buf, off = codec.encode_positions_flat(flat, tfs)
    assert int(off[-1]) == buf.size
    dec = codec.decode_positions_flat(buf.tobytes(), tfs)
    assert np.array_equal(dec, flat)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("phrase_idx"))
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_mod.build_index(docs, d, CFG)
    return d


@pytest.mark.parametrize("phrase", PHRASES, ids=["_".join(p) for p in PHRASES])
def test_phrase_rank_identity_three_ways(spark, idx, phrase):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    exp = [(r["doc_id"], r["score"]) for r in bm25_phrase_topk(docs, phrase, k=10).collect()]
    engine = InvertedIndex(spark, idx)
    got = [(r["doc_id"], r["score"]) for r in engine.search_phrase(phrase, k=10).collect()]
    assert got == exp
    assert engine.open_local().search_phrase(phrase, k=10) == exp
    # mode="phrase" dispatch through the generic entry points
    assert [(r["doc_id"], r["score"]) for r in engine.search(phrase, k=10, mode="phrase").collect()] == exp


def test_phrase_survives_delete_and_compact(spark, tmp_path):
    rows = [
        (i, f"prefix{i} spark window tail{i}" if i % 3 == 0 else f"prefix{i} window spark tail{i}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "idx")
    build_mod.build_index(docs, d, IndexConfig(docs_per_segment=8, merge_fanin=2, block_size=8, postings_buckets=4))
    engine = InvertedIndex(spark, d)
    before = {r["doc_id"] for r in engine.search_phrase(["spark", "window"], k=40).collect()}
    assert before == {i for i in range(40) if i % 3 == 0}

    maint.delete_docs(spark, d, [0, 6], tag="pdel")
    after_del = {r["doc_id"] for r in InvertedIndex(spark, d).search_phrase(["spark", "window"], k=40).collect()}
    assert after_del == before - {0, 6}

    maint.compact(spark, d)  # re-encodes postings INCLUDING position streams
    after_compact = {r["doc_id"] for r in InvertedIndex(spark, d).search_phrase(["spark", "window"], k=40).collect()}
    assert after_compact == after_del


def test_phrase_positions_after_append(spark, tmp_path):
    docs = spark.createDataFrame([(i, f"alpha beta gamma{i}") for i in range(20)], "doc_id long, text string")
    d = str(tmp_path / "idx")
    build_mod.build_index(docs, d, IndexConfig(docs_per_segment=8, merge_fanin=2, block_size=8, postings_buckets=4))
    new = spark.createDataFrame([("omega alpha beta",), ("beta alpha omega",)], "text string")
    maint.add_docs(spark, d, new, tag="padd")
    engine = InvertedIndex(spark, d)
    hits = {r["doc_id"] for r in engine.search_phrase(["alpha", "beta"], k=50).collect()}
    assert set(range(20)) < hits and len(hits) == 21  # one appended doc matches
    assert engine.open_local().search_phrase(["omega", "alpha", "beta"], k=5)[0][0] >= 20


def test_phrase_offset_pages(spark, idx):
    """offset must apply in phrase mode too (ADVICE r2: it was ignored)."""
    engine = InvertedIndex(spark, idx)
    full = [tuple(r) for r in engine.search_phrase(["spark", "window"], k=6).collect()]
    page2 = [tuple(r) for r in engine.search(["spark", "window"], k=3, mode="phrase", offset=3).collect()]
    assert page2 == full[3:6]


# ---- phrase batching (round 4 — closes the ADVICE r2 "phrases do not
# batch" gap on both engines) ----------------------------------------------


def test_flat_search_many_batches_phrases(spark, idx):
    """Mixed batch of plain/boolean/phrase queries == per-query results."""
    eng = InvertedIndex(spark, idx)
    batch = {
        "p1": (["spark", "window"], "phrase", 10),
        "p2": (["value", "value"], "phrase", 10),
        "p3": (["scan", "a", "scan"], "phrase", 10),
        "plain": (["table", "join"], "and", 5),
        "px": (["zzznope", "table"], "phrase", 10),
    }
    got = eng.search_many(batch)
    assert got["p1"] == [tuple(r) for r in eng.search_phrase(["spark", "window"], k=10).collect()]
    assert got["p2"] == [tuple(r) for r in eng.search_phrase(["value", "value"], k=10).collect()]
    assert got["p3"] == [tuple(r) for r in eng.search_phrase(["scan", "a", "scan"], k=10).collect()]
    assert got["plain"] == [tuple(r) for r in eng.search(["table", "join"], k=5, mode="and").collect()]
    assert got["px"] == []  # phrase with an unindexed term never matches
    assert len(got["p1"]) > 0


def test_fielded_search_many_batches_phrases(spark, tmp_path_factory):
    """Fielded phrase clauses batch through the boolean kernel and stay
    rank-identical to per-query search()."""
    from goobi_viewer_indexer_spark.operators.search import FieldedIndex
    from goobi_viewer_indexer_spark.plans.build import build_index_fielded

    d = str(tmp_path_factory.mktemp("phrase_fidx"))
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index_fielded(docs, d, {"text": "text", "lang": "lang"}, CFG)
    fidx = FieldedIndex(spark, d)
    q1 = 'text:"spark window"'
    q2 = 'lang:en AND text:"spark window"'
    q3 = 'text:"spark window" AND -lang:de'
    got = fidx.search_many({"a": (q1, "and", 10), "b": (q2, "and", 10), "c": (q3, "and", 10)})
    for qid, q in [("a", q1), ("b", q2), ("c", q3)]:
        assert got[qid] == [tuple(r) for r in fidx.search(q, k=10).collect()], qid
    assert len(got["a"]) > 0 and len(got["b"]) > 0


# ---- sloppy phrases ("a b"~N ordered-window proximity, round 5b) ---------

SLOPPY = [
    (["table", "spark"], 3),
    (["table", "join"], 1),
    (["value", "value"], 2),       # duplicate-term proximity
    (["table", "join", "spark"], 4),
    (["spark", "window"], 0),      # slop=0 == exact phrase
]


@pytest.mark.parametrize("phrase,slop", SLOPPY, ids=["_".join(p) + f"_s{s}" for p, s in SLOPPY])
def test_sloppy_phrase_rank_identity_three_ways(spark, idx, phrase, slop):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    exp = [(r["doc_id"], r["score"]) for r in bm25_phrase_topk(docs, phrase, k=10, slop=slop).collect()]
    engine = InvertedIndex(spark, idx)
    got = [(r["doc_id"], r["score"]) for r in engine.search_phrase(phrase, k=10, slop=slop).collect()]
    assert got == exp
    assert engine.open_local().search_phrase(phrase, k=10, slop=slop) == exp


def test_sloppy_membership_df_truth(spark, idx):
    """Engine match set == brute-force ordered-window scan of the raw
    token streams (independent of the naive twin's join plan)."""
    from goobi_viewer_indexer_spark.functions.tokenize import tokenize_py

    phrase, slop = ["table", "spark"], 3
    engine = InvertedIndex(spark, idx)
    got = {r["doc_id"] for r in engine.search_phrase(phrase, k=10**6, slop=slop).collect()}
    want = set()
    for row in spark.read.parquet(f"{SF001}/documents.parquet").select("doc_id", "text").collect():
        toks = tokenize_py(row["text"])
        pos = [i for i, t in enumerate(toks) if t == phrase[0]]
        for p0 in pos:
            # greedy successor chain
            cur, ok = p0, True
            for t in phrase[1:]:
                nxt = next((i for i in range(cur + 1, len(toks)) if toks[i] == t), None)
                if nxt is None:
                    ok = False
                    break
                cur = nxt
            if ok and cur - p0 <= len(phrase) - 1 + slop:
                want.add(row["doc_id"])
                break
    assert got == want and len(got) > 0


def test_sloppy_exact_subset(spark, idx):
    engine = InvertedIndex(spark, idx)
    exact = {r["doc_id"] for r in engine.search_phrase(["table", "join"], k=10**6).collect()}
    slop2 = {r["doc_id"] for r in engine.search_phrase(["table", "join"], k=10**6, slop=2).collect()}
    assert exact <= slop2 and len(slop2) > len(exact)
    # slop never admits out-of-order matches: reversed phrase w/ slop 0..2
    rev = {r["doc_id"] for r in engine.search_phrase(["join", "table"], k=10**6, slop=2).collect()}
    assert rev != slop2  # distinct contracts (in-order only)


def test_fielded_sloppy_phrase(spark, tmp_path_factory):
    """f:"a b"~N parses, executes on both fielded engines, composes with
    AND clauses / negation / search_many batching."""
    from goobi_viewer_indexer_spark.operators.search import FieldedIndex, parse_fielded_clauses
    from goobi_viewer_indexer_spark.plans.build import build_index_fielded

    cl, _ = parse_fielded_clauses('text:"table spark"~3')
    assert cl[0].quoted and cl[0].slop == 3 and cl[0].toks == ["table", "spark"]
    cl2, _ = parse_fielded_clauses('text:"table spark"~2^1.5')
    assert cl2[0].slop == 2 and cl2[0].boost == 1.5

    d = str(tmp_path_factory.mktemp("sloppy_fidx"))
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index_fielded(docs, d, {"text": "text", "lang": "lang"}, CFG)
    fidx = FieldedIndex(spark, d)
    q = 'lang:en AND text:"table spark"~3'
    got = [tuple(r) for r in fidx.search(q, k=10).collect()]
    assert len(got) > 0
    assert fidx.open_local().search(q, k=10) == got
    # exact is a strict subset here (slop admits more docs)
    exact = {r["doc_id"] for r in fidx.search('lang:en AND text:"table spark"', k=10**6).collect()}
    slopd = {r["doc_id"] for r in fidx.search(q, k=10**6).collect()}
    assert exact <= slopd
    # negated sloppy phrase excludes its window matches
    neg = {r["doc_id"] for r in fidx.search('text:table AND -text:"table spark"~3', k=10**6).collect()}
    assert neg.isdisjoint(slopd & neg | (slopd & neg))
    assert not (neg & slopd)
    # search_many batch == per-query
    batch = fidx.search_many({"s": (q, "and", 10)})
    assert batch["s"] == got
