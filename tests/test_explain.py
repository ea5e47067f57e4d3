"""Solr debugQuery analog: LocalSearcher.explain / InvertedIndex.explain
per-term BM25 breakdowns must be bit-identical to the scores the engine
ranks by, for every doc on the first page, in both or/and modes."""

from __future__ import annotations

import numpy as np
import pytest

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.operators.search import InvertedIndex
from goobi_viewer_indexer_spark.operators import wand
from goobi_viewer_indexer_spark.plans.build import build_index
from tests.conftest import SF001

CFG = IndexConfig(docs_per_segment=64, merge_fanin=2, block_size=16, postings_buckets=8)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    d = str(tmp_path_factory.mktemp("explain_idx"))
    build_index(docs, d, CFG)
    return InvertedIndex(spark, d)


@pytest.mark.parametrize("mode,q", [("or", ["table", "join", "window"]),
                                    ("and", ["table", "join"])])
def test_explain_total_bit_identical_to_search(idx, mode, q):
    topk = [tuple(r) for r in idx.search(q, k=8, mode=mode).collect()]
    assert topk
    for doc_id, score in topk:
        ex = idx.explain(q, doc_id, mode=mode)
        assert ex["matched"] is True
        assert ex["score"] == score  # same round6 grid, same accumulation order
        # contributions recompose the total exactly (sorted-term fold)
        total = 0.0
        for row in sorted(ex["terms"], key=lambda r: r["term"]):
            assert row["contribution"] == row["idf"] * row["weight"]
            total += row["contribution"]
        assert wand.round6f(total) == score
        # df/tf sanity: present terms have tf >= 1 and df >= 1
        present = [r for r in ex["terms"] if r["tf"] > 0]
        assert present and all(r["df"] >= r["tf"] > 0 or r["df"] >= 1 for r in present)


def test_explain_every_clause_listed_and_and_mode_miss(idx):
    ex = idx.explain(["table", "zzznotaterm"], 0, mode="or")
    assert [r["term"] for r in ex["terms"]] == ["table", "zzznotaterm"]
    missing = ex["terms"][1]
    assert missing["tf"] == 0 and missing["df"] == 0 and missing["contribution"] == 0.0
    # AND mode: a doc missing one clause does not match, score 0
    hit = idx.search(["table"], k=1, mode="or").collect()[0]["doc_id"]
    ex_and = idx.explain(["table", "zzznotaterm"], hit, mode="and")
    assert ex_and["matched"] is False and ex_and["score"] == 0.0
    # the present clause still shows its would-be contribution
    t = {r["term"]: r for r in ex_and["terms"]}
    assert t["table"]["tf"] > 0 and t["table"]["contribution"] > 0


def test_explain_out_of_range_and_bad_mode(idx):
    ex = idx.explain(["table"], 10**9, mode="or")
    assert ex["matched"] is False and ex["score"] == 0.0 and ex["doclen"] == 0
    with pytest.raises(ValueError):
        idx.explain(["table"], 0, mode="phrase")


def test_explain_weight_formula_matches_definition(idx):
    q = ["table"]
    doc_id, score = [tuple(r) for r in idx.search(q, k=1, mode="or").collect()][0]
    ex = idx.explain(q, doc_id)
    row = ex["terms"][0]
    k1, b = idx.meta["k1"], idx.meta["b"]
    dl, avgdl, tf = ex["doclen"], ex["avgdl"], row["tf"]
    w = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert np.isclose(row["weight"], w, rtol=0, atol=1e-12)
    assert ex["score"] == score


# -- fielded (BM25F) explain ------------------------------------------------

@pytest.fixture(scope="module")
def fidx(spark, tmp_path_factory):
    from goobi_viewer_indexer_spark.operators.search import FieldedIndex
    from goobi_viewer_indexer_spark.plans.build import build_index_fielded

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    d = str(tmp_path_factory.mktemp("explain_fidx"))
    build_index_fielded(docs, d, {"text": "text", "lang": "lang"}, CFG)
    return FieldedIndex(spark, d)


@pytest.mark.parametrize("q", ["text:table AND text:join",
                               "text:table AND lang:en^2.0",
                               "text:(table join) AND lang:en"])
def test_fielded_explain_total_matches_search(fidx, q):
    topk = [tuple(r) for r in fidx.search(q, k=6).collect()]
    assert topk
    for doc_id, score in topk:
        ex = fidx.explain(q, doc_id)
        assert ex["matched"] is True and ex["score"] == score
        for row in ex["terms"]:
            assert row["contribution"] == row["boost"] * row["idf"] * row["weight"]
        # present terms saturate with the FIELD's doclen
        assert all(r["doclen"] > 0 for r in ex["terms"] if r["tf"] > 0)


def test_fielded_explain_shapes_and_guards(fidx):
    # non-matching doc for an AND query: matched False, score 0, rows kept
    hit = fidx.search("text:table AND lang:de", k=1).collect()
    if hit:
        d = hit[0]["doc_id"]
        ex = fidx.explain("text:zzznotaterm AND lang:de", d)
        assert ex["matched"] is False and ex["score"] == 0.0
    with pytest.raises(ValueError):
        fidx.explain('text:"a b"', 0)
    with pytest.raises(ValueError):
        fidx.explain("text:table AND -lang:de", 0)
