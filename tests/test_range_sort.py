"""Round-4 query-surface additions: f:[lo TO hi] range clauses (numeric +
lexicographic), facet.range gap-bucketed counts, compound score+field sort,
and keyset (cursorMark-style) paging for field sorts — each checked against
a DataFrame twin computed straight off the documents table.

Reference parity: the indexer manufactures YEAR/YEARMONTH/MDNUM_*/SORTNUM_*
numerics precisely so the viewer can range-filter and timeline-facet them
(coercion table helper/SolrSearchIndex.java:256-284, derivation
helper/MetadataHelper.java:1053-1123)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr
from goobi_viewer_indexer_spark.operators.search import FieldedIndex, InvertedIndex
from goobi_viewer_indexer_spark.plans.build import build_index, build_index_fielded
from goobi_viewer_indexer_spark.plans.maintenance import set_stored_fields
from tests.conftest import SF001

CFG = IndexConfig(docs_per_segment=64, merge_fanin=2, block_size=16, postings_buckets=8, compact_below_bytes=256)
FIELDS = {"text": "text", "source": "source", "lang": "lang", "nch": "nch"}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


@pytest.fixture(scope="module")
def fidx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("range_fidx"))
    build_index_fielded(docs.withColumn("nch", F.col("n_chars").cast("string")), d, FIELDS, CFG)
    return FieldedIndex(spark, d)


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("range_idx"))
    build_index(docs, d, CFG)
    set_stored_fields(spark, d, docs.select("doc_id", "source", "lang"), tag="rs_stored")
    return InvertedIndex(spark, d)


def _has(col, term):
    return F.array_contains(F.array_distinct(tokenize_expr(col)), term)


# ---- range clauses -------------------------------------------------------


def test_numeric_range_clause_matches_twin(docs, fidx):
    got = sorted(r["doc_id"] for r in fidx.match_ids("text:table AND nch:[120 TO 260]").collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(_has("text", "table") & F.col("n_chars").between(120, 260)).collect()
    )
    assert got == want and len(got) > 0


def test_numeric_range_is_numeric_not_lex(docs, fidx):
    # '99' > '260' lexicographically: a lex compare would wrongly exclude
    # 3-digit values below 260 while including 2-digit 99
    got = sorted(r["doc_id"] for r in fidx.match_ids("nch:[99 TO 260]").collect())
    want = sorted(r["doc_id"] for r in docs.filter(F.col("n_chars").between(99, 260)).collect())
    assert got == want


def test_open_ended_range(docs, fidx):
    got = sorted(r["doc_id"] for r in fidx.match_ids("nch:[400 TO *]").collect())
    want = sorted(r["doc_id"] for r in docs.filter(F.col("n_chars") >= 400).collect())
    assert got == want and len(got) > 0


def test_lex_range_clause(docs, fidx):
    got = sorted(r["doc_id"] for r in fidx.match_ids("source:[src10 TO src20]").collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter((F.col("source") >= "src10") & (F.col("source") <= "src20")).collect()
    )
    assert got == want and len(got) > 0


def test_negated_range_clause(docs, fidx):
    got = sorted(r["doc_id"] for r in fidx.match_ids("text:table AND -nch:[0 TO 199]").collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(_has("text", "table") & (F.col("n_chars") >= 200)).collect()
    )
    assert got == want and len(got) > 0


def test_range_filters_but_never_scores(fidx):
    """Constant-score contract: adding a range clause must not change the
    scores of the surviving docs (it filters membership only)."""
    base = {r["doc_id"]: r["score"] for r in fidx.search("text:table", k=1000).collect()}
    ranged = [tuple(r) for r in fidx.search("text:table AND nch:[120 TO 260]", k=1000).collect()]
    assert len(ranged) > 0
    for doc_id, score in ranged:
        assert base[doc_id] == score


def test_range_local_and_batch_parity(fidx):
    q = "text:table AND nch:[120 TO 260]"
    dist = [tuple(r) for r in fidx.search(q, k=10).collect()]
    assert fidx.open_local().search(q, k=10) == dist
    assert fidx.search_many({"q": (q, "and", 10)})["q"] == dist


def test_empty_range_required_matches_nothing(fidx):
    assert fidx.search("text:table AND nch:[100000 TO 200000]", k=10).count() == 0


def test_range_guards(fidx):
    with pytest.raises(ValueError, match="unknown field"):
        fidx.expand_range("nope", "1", "2")
    with pytest.raises(ValueError, match="one token"):
        fidx.expand_range("text", "two words", "zz")


# ---- facet.range ---------------------------------------------------------


def test_facet_range_matches_twin_and_fills_gaps(spark, docs, idx, fidx):
    dims = docs.select("doc_id", "n_chars")
    got = [(r["bucket_start"], r["n"]) for r in idx.facet_range(["table", "join"], dims, "n_chars", 0, 500, 100).collect()]
    twin = {
        int(r["b"]) * 100: r["n"]
        for r in docs.filter(_has("text", "table") & _has("text", "join"))
        .filter(F.col("n_chars").between(0, 499))
        .groupBy(F.floor(F.col("n_chars") / 100).alias("b"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == [(s, twin.get(s, 0)) for s in range(0, 500, 100)]
    # fielded engine twin over the same query
    gotf = [(r["bucket_start"], r["n"]) for r in fidx.facet_range("text:table AND text:join", dims, "n_chars", 0, 500, 100).collect()]
    assert gotf == got


def test_facet_range_guards(idx, docs):
    dims = docs.select("doc_id", "n_chars")
    with pytest.raises(ValueError, match="gap"):
        idx.facet_range(["table"], dims, "n_chars", 0, 500, 0)


# ---- compound score+field sort ------------------------------------------


def test_compound_score_field_sort(idx):
    rows = [tuple(r) for r in idx.search(["table", "join"], k=20, mode="and", sort="score desc, source asc", fl=["source"]).collect()]
    assert len(rows) == 20
    # total order: (score desc, source asc, doc_id asc)
    keys = [(-s, src, d) for d, s, src in rows]
    assert keys == sorted(keys)
    # scores agree with the plain scored search over the same matches
    plain = {r["doc_id"]: r["score"] for r in idx.search(["table", "join"], k=10000, mode="and").collect()}
    for d, s, _src in rows:
        assert plain[d] == s


def test_compound_sort_fielded_twin(fidx, docs, spark):
    st_dir = fidx.dir
    set_stored_fields(spark, st_dir, docs.select("doc_id", "source"), tag="rs_fstored")
    rows = [tuple(r) for r in fidx.search("text:table AND text:join", k=15, sort="score desc, source asc", fl=["source"]).collect()]
    assert len(rows) == 15
    keys = [(-s, src, d) for d, s, src in rows]
    assert keys == sorted(keys)


# ---- keyset paging for field sorts --------------------------------------


def test_keyset_paging_covers_field_sort(idx):
    full = [tuple(r) for r in idx.search(["table", "join"], k=30, mode="and", fl=["source", "lang"], sort="source asc, lang desc").collect()]
    assert len(full) == 30
    pages, cursor = [], None
    for _ in range(3):
        page = [
            tuple(r)
            for r in idx.search(
                ["table", "join"], k=10, mode="and", fl=["source", "lang"],
                sort="source asc, lang desc", after=cursor,
            ).collect()
        ]
        pages.extend(page)
        last = page[-1]
        cursor = (last[1], last[2], last[0])  # (source, lang, doc_id)
    assert pages == full


def test_keyset_guards(idx):
    with pytest.raises(ValueError, match="needs 2 values"):
        idx.search(["table"], k=5, sort="source asc", after=("a", "b", 3))
    with pytest.raises(ValueError, match="keyset|cursor"):
        idx.search(["table"], k=5, sort="source asc", offset=5, after=("a", 3))


# ---- spellcheck / suggest ------------------------------------------------


def test_suggest_misspelling_ranked_by_df(idx, docs):
    from goobi_viewer_indexer_spark.functions.tokenize import tokenize_py

    got = idx.suggest("tabl")
    assert got, "misspelling must yield suggestions"
    terms = [t for t, _df in got]
    assert "table" in terms
    # df values are true document frequencies and ordering is (df desc, term asc)
    dfs = {t: d for t, d in got}
    truth = (
        docs.select(F.explode(F.array_distinct(tokenize_expr("text"))).alias("t"))
        .groupBy("t").count().collect()
    )
    truth = {r["t"]: r["count"] for r in truth}
    for t, d in got:
        assert truth.get(t) == d
    assert got == sorted(got, key=lambda e: (-e[1], e[0]))
    # Levenshtein-1 guarantee against the plain-python truth
    def ed1(a, b):
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        s, l = (a, b) if la < lb else (b, a)
        i = 0
        while i < len(s) and s[i] == l[i]:
            i += 1
        return s[i:] == l[i + 1:]
    assert all(ed1("tabl", t) for t in terms)


def test_suggest_correct_term_returns_nothing(idx):
    assert idx.suggest("table") == []


# ---- minimum-should-match (Solr DisMax mm) -------------------------------


def test_min_match_three_way_identity(spark, docs, idx, duck):
    """engine(min_match) == naive DataFrame twin == DuckDB oracle, and the
    local searcher agrees; mm > indexed terms → empty."""
    from goobi_viewer_indexer_spark.operators import naive_bm25

    terms = ["spark", "window", "value"]
    for mm in (2, 3):
        exp = [tuple(r) for r in naive_bm25.bm25_topk(docs, terms, k=10, mode="or", min_match=mm).collect()]
        got = [tuple(r) for r in idx.search(terms, k=10, mode="or", min_match=mm).collect()]
        assert got == exp and len(got) > 0, mm
        assert idx.open_local().search(terms, k=10, mode="or", min_match=mm) == exp
        sql = naive_bm25.bm25_topk_sql(terms, k=10, mode="or", min_match=mm).replace(
            "documents", f"read_parquet('{SF001}/documents.parquet')"
        )
        oracle = duck.sql(sql).fetchall()
        assert [(d, round(s, 6)) for d, s in got] == [(d, round(float(s), 6)) for d, s in oracle]
    # every-term mm == AND mode result set
    and_res = [tuple(r) for r in idx.search(terms, k=10, mode="and").collect()]
    mm_all = [tuple(r) for r in idx.search(terms, k=10, mode="or", min_match=3).collect()]
    assert mm_all == and_res
    # more required matches than indexed terms → empty
    assert idx.search(["spark", "zzzznope"], k=10, mode="or", min_match=2).count() == 0


def test_min_match_composes_with_cursor(idx):
    terms = ["spark", "window", "value"]
    full = [tuple(r) for r in idx.search(terms, k=20, mode="or", min_match=2).collect()]
    p1 = full[:10]
    p2 = [tuple(r) for r in idx.search(terms, k=10, mode="or", min_match=2,
                                       after=(p1[-1][1], p1[-1][0])).collect()]
    assert p1 + p2 == full


def test_fielded_suggest_field_scoped(fidx):
    # 'tabl' edits live in text's dictionary, not lang's; exact terms get
    # no suggestions
    got = fidx.suggest("text", "tabl")
    assert got and got[0][0] == "table"
    assert fidx.suggest("lang", "tabl") == []
    assert fidx.suggest("text", "table") == []


def test_min_match_composes_with_compound_sort(idx):
    terms = ["spark", "window", "value"]
    rows = [tuple(r) for r in idx.search(terms, k=10, mode="or", min_match=2,
                                         sort="score desc, source asc", fl=["source"]).collect()]
    plain = {r["doc_id"]: r["score"] for r in idx.search(terms, k=10000, mode="or", min_match=2).collect()}
    assert len(rows) > 0
    for d, s, _src in rows:
        assert plain[d] == s
    keys = [(-s, src, d) for d, s, src in rows]
    assert keys == sorted(keys)


def test_search_grouped_group_sort(idx, docs):
    """Solr group.sort: docs order WITHIN groups by the given field while
    group selection/order stays by best score (identical groups + group
    order as default grouping)."""
    base = [tuple(r) for r in idx.search_grouped(["table", "join"], "source", k_groups=4, docs_per_group=3).collect()]
    gs = [tuple(r) for r in idx.search_grouped(["table", "join"], "source", k_groups=4, docs_per_group=3, group_sort="lang asc").collect()]
    # same multiset of rows per group, same group sequence
    def group_seq(rows):
        seen = []
        for g, _d, _s in rows:
            if not seen or seen[-1] != g:
                seen.append(g)
        return seen
    assert group_seq(gs) == group_seq(base)
    # docs_per_group truncation may pick different docs under a different
    # within-group order — group count and per-group row counts must match
    assert len(gs) == len(base)
    # within-group order follows (lang asc, doc_id asc)
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    from itertools import groupby
    for g, rows in groupby(gs, key=lambda r: r[0]):
        keys = [(langs[d], d) for _g, d, _s in rows]
        assert keys == sorted(keys), g
