"""Solr TermsComponent (/terms handler) — dictionary terms under a prefix
with df/cf, both engines.

Reference behavior: the viewer's auto-complete / browse-by-term queries go
through Solr's TermsComponent (terms.prefix / terms.limit / terms.sort,
field-scoped via terms.fl).  Here the dictionary IS the index's term_stats
table, so the operator is a pushed StartsWith scan + one
TakeOrderedAndProject.

Truth is recomputed per test from the raw documents table with the pinned
tokenizer contract (tests/conftest tokenize twin) — the suite oracle
(term_stats_top100 matrix, qtags prefix_count / prefix_index /
fielded_lang) covers the DuckDB side.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.operators.search import FieldedIndex, InvertedIndex
from goobi_viewer_indexer_spark.plans.build import build_index, build_index_fielded
from goobi_viewer_indexer_spark.functions.tokenize import tokenize_py
from tests.conftest import SF001

CFG = IndexConfig(docs_per_segment=64, merge_fanin=2, block_size=16, postings_buckets=8, compact_below_bytes=256)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("terms_idx"))
    build_index(docs, d, CFG)
    return InvertedIndex(spark, d)


@pytest.fixture(scope="module")
def fidx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("terms_fidx"))
    build_index_fielded(docs, d, {"text": "text", "lang": "lang"}, CFG)
    return FieldedIndex(spark, d)


@pytest.fixture(scope="module")
def truth(docs):
    """(term -> (df, cf)) over the text field, pinned tokenizer."""
    df_c: Counter = Counter()
    cf_c: Counter = Counter()
    for r in docs.select("doc_id", "text").collect():
        toks = tokenize_py(r.text or "")
        cf_c.update(toks)
        df_c.update(set(toks))
    return {t: (df_c[t], cf_c[t]) for t in cf_c}


def _expected(truth, prefix, limit, sort):
    items = [(t, d, c) for t, (d, c) in truth.items() if t.startswith(prefix)]
    if sort == "count":
        items.sort(key=lambda x: (-x[1], x[0]))
    else:
        items.sort(key=lambda x: x[0])
    return items[:limit]


def test_terms_count_sort_matches_truth(idx, truth):
    got = [(r.term, r.df, r.cf) for r in idx.terms(prefix="s", limit=10, sort="count").collect()]
    assert got == _expected(truth, "s", 10, "count")


def test_terms_index_sort_matches_truth(idx, truth):
    got = [(r.term, r.df, r.cf) for r in idx.terms(prefix="st", limit=10, sort="index").collect()]
    assert got == _expected(truth, "st", 10, "index")


def test_terms_no_prefix_is_whole_dictionary_ranked(idx, truth):
    got = [(r.term, r.df, r.cf) for r in idx.terms(limit=5).collect()]
    assert got == _expected(truth, "", 5, "count")


def test_terms_unmatched_prefix_empty(idx):
    assert idx.terms(prefix="zzzznope", limit=10).count() == 0


def test_terms_bad_sort_raises(idx, fidx):
    with pytest.raises(ValueError):
        idx.terms(sort="freq")
    with pytest.raises(ValueError):
        fidx.terms("text", sort="freq")


def test_fielded_terms_strips_tag_and_scopes_field(fidx, docs, truth):
    # lang dictionary: single-token field, df == cf == per-value doc count
    lang_counts = Counter(
        r.lang for r in docs.select("lang").collect() if r.lang and tokenize_py(r.lang)
    )
    got = {r.term: (r.df, r.cf) for r in fidx.terms("lang", limit=100).collect()}
    exp = {}
    for v, n in lang_counts.items():
        for t in tokenize_py(v):
            d, c = exp.get(t, (0, 0))
            exp[t] = (d + n, c + n)
    assert got == exp
    # no NUL field tag leaks into the output, and text terms never appear
    assert all("\x00" not in t for t in got)

    text_terms = {r.term for r in fidx.terms("text", prefix="s", limit=5).collect()}
    assert text_terms == {t for t, _, _ in _expected(truth, "s", 5, "count")}


def test_fielded_terms_unknown_field_raises(fidx):
    with pytest.raises(ValueError):
        fidx.terms("nope", prefix="a")


def test_terms_plan_is_pushed_scan_plus_take_ordered(idx):
    plan = idx.terms(prefix="s", limit=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---- terms.regex / mincount / maxcount (round 5b) ------------------------


def test_terms_regex_and_count_bounds(idx, truth):
    import re

    got = [(r.term, r.df, r.cf) for r in idx.terms(regex="s.*n", mincount=3, limit=50).collect()]
    exp = sorted(
        ((t, d, c) for t, (d, c) in truth.items() if re.fullmatch("s.*n", t) and d >= 3),
        key=lambda x: (-x[1], x[0]),
    )[:50]
    assert got == exp and len(got) > 0
    # regex is anchored: 's.*n' never matches a term with a trailing char
    assert all(t.startswith("s") and t.endswith("n") for t, _, _ in got)
    # maxcount bounds df from above; composes with prefix
    cap = max(d for _, (d, _) in truth.items() if _ or True) // 2
    got2 = {r.term for r in idx.terms(prefix="s", maxcount=cap, limit=1000).collect()}
    exp2 = {t for t, (d, _) in truth.items() if t.startswith("s") and d <= cap}
    assert got2 == exp2


def test_fielded_terms_regex(fidx, truth):
    import re

    got = [(r.term, r.df) for r in fidx.terms("text", regex="[sw].*w", limit=50, sort="index").collect()]
    exp = sorted((t, d) for t, (d, _) in truth.items() if re.fullmatch("[sw].*w", t))[:50]
    assert got == exp
    assert all("\x00" not in t for t, _ in got)
