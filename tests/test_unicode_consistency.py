"""ADVICE r1: stage-0 doclens and stage-1 tf/block-maxima must use ONE
tokenization.  On decomposed-Unicode (NFD) input the engine now NFC-
normalizes in BOTH stages, so WAND == LocalSearcher == a pure-Python
BM25 over tokenize_py (the NFC contract) — rank AND score identical."""

from __future__ import annotations

import math
import unicodedata

import pytest

from tests.conftest import read_index_table

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.functions.tokenize import tokenize_py
from goobi_viewer_indexer_spark.operators.search import InvertedIndex
from goobi_viewer_indexer_spark.plans.build import build_index

CFG = IndexConfig(docs_per_segment=4, merge_fanin=2, block_size=4, postings_buckets=4)

# NFD strings: 'café' decomposed = 'cafe' + combining acute; tokenizer
# treats the combining mark as a separator UNLESS NFC runs first, in
# which case 'café' → ['caf'] both times... n.b. with NFC, é stays
# non-ascii → separator → token 'caf'; withOUT NFC, 'e'+combining →
# tokens 'cafe'.  So doclen/tf literally differ between the two chains.
NFD = lambda s: unicodedata.normalize("NFD", s)  # noqa: E731
CORPUS = [
    (0, NFD("café time café crème shared word")),
    (1, NFD("café shared word and more café café")),
    (2, "plain ascii shared word caf"),
    (3, NFD("crème brûlée shared")),
]


def py_bm25(corpus, terms, k1=1.2, b=0.75, k=10):
    toks = {i: tokenize_py(t) for i, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = []
    for i, tv in toks.items():
        s = 0.0
        matched = False
        for term in sorted(set(terms)):
            tf = tv.count(term)
            if tf == 0:
                continue
            matched = True
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(tv) / avgdl))
        if matched:
            out.append((i, round(s, 6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("terms", [["caf", "shared"], ["caf"], ["word", "shared"]])
def test_wand_rank_identity_on_nfd_input(spark, tmp_path, terms):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    d = str(tmp_path / "idx")
    build_index(docs, d, CFG)
    engine = InvertedIndex(spark, d)
    exp = py_bm25(CORPUS, terms)
    assert [tuple(r) for r in engine.search(terms, k=10).collect()] == exp
    assert engine.open_local().search(terms, k=10) == exp


def test_nfd_doclen_matches_nfc_chain(spark, tmp_path):
    """The stored doclen equals len(tokenize_py(text)) — NOT the no-NFC
    Catalyst tokenizer's count (they differ on doc 0/1/3)."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    d = str(tmp_path / "idx")
    build_index(docs, d, CFG)
    stored = {r["doc_id"]: r["doclen"] for r in read_index_table(spark, d, "doc_stats").collect()}
    for i, t in CORPUS:
        assert stored[i] == len(tokenize_py(t)), i
    # sanity: the fixture really exercises the NFC/no-NFC divergence —
    # the chains emit different token STRINGS ('caf' vs 'cafe'), which is
    # what would silently skew tf vs doclen if the stages mixed chains
    from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr

    nonfc_toks = {r["doc_id"]: r["t"] for r in docs.select("doc_id", tokenize_expr("text").alias("t")).collect()}
    assert "cafe" in nonfc_toks[0] and "cafe" not in tokenize_py(CORPUS[0][1])
    assert "caf" in tokenize_py(CORPUS[0][1])
