"""Solr filter queries (``fq``) on both engines (round 5b): membership
filters that never score — the viewer passes its drill-downs as fq so
ranking ignores them (helper/SolrSearchIndex.java query assembly).

Contract pinned here: the filtered result equals the UNFILTERED
total-recall result restricted to the fq match set (scores unchanged),
truncated to k; fq composes with fl/sort/offset/facets/stats; lists of
filters intersect; the flat engine rejects phrase+fq (the fielded engine
handles filtered phrases through its clause groups)."""

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

Q = ["spark", "window", "value"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fq_idx"))
    build_index(docs, d, CFG)
    set_stored_fields(spark, d, docs.select("doc_id", "source", "lang"), tag="fq_stored")
    return InvertedIndex(spark, d)


@pytest.fixture(scope="module")
def fidx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fq_fidx"))
    build_index_fielded(
        docs.withColumn("nch", F.col("n_chars").cast("string")),
        d, {"text": "text", "lang": "lang", "nch": "nch"}, CFG,
    )
    set_stored_fields(
        spark, d,
        docs.select("doc_id", "source", F.col("n_chars").cast("long").alias("nch")),
        tag="fq_fstored",
    )
    h = FieldedIndex(spark, d)
    h.docvalues_fields.add("nch")
    return h


def _has(col, term):
    return F.array_contains(F.array_distinct(tokenize_expr(col)), term)


def _filtered_truth(idx, fq_ids, k=10, **kw):
    """Unfiltered total recall restricted to fq membership, top-k."""
    full = idx.search(Q, k=100000, mode="or", **kw).collect()
    kept = [(r["doc_id"], r["score"]) for r in full if r["doc_id"] in fq_ids]
    return kept[:k]


def test_flat_fq_filters_without_scoring(docs, idx):
    fq_ids = {
        r["doc_id"]
        for r in docs.filter(_has("text", "table") & ~_has("text", "join")).collect()
    }
    got = [tuple(r) for r in idx.search(Q, k=10, mode="or", fq="table -join").collect()]
    assert got == _filtered_truth(idx, fq_ids) and len(got) > 0


def test_flat_fq_list_intersects(docs, idx):
    fq_ids = {
        r["doc_id"]
        for r in docs.filter(_has("text", "table") & _has("text", "scan")).collect()
    }
    got = [tuple(r) for r in idx.search(Q, k=10, mode="or", fq=["table", "scan"]).collect()]
    assert got == _filtered_truth(idx, fq_ids) and len(got) > 0
    # plain term list = single AND filter, same result
    got2 = [tuple(r) for r in idx.search(Q, k=10, mode="or", fq=[["table", "scan"]]).collect()]
    assert got2 == got


def test_flat_fq_with_fl_and_offset(docs, idx):
    fq_ids = {r["doc_id"] for r in docs.filter(_has("text", "table")).collect()}
    want = _filtered_truth(idx, fq_ids, k=20)
    page2 = [
        (r["doc_id"], r["score"])
        for r in idx.search(Q, k=10, mode="or", offset=10, fq="table").collect()
    ]
    assert page2 == want[10:20]
    fl = idx.search(Q, k=5, mode="or", fq="table", fl=["source"]).collect()
    assert [(r["doc_id"], r["score"]) for r in fl] == want[:5]
    assert all(r["source"] is not None for r in fl)


def test_flat_fq_with_field_sort(docs, idx):
    members = docs.filter(_has("text", "table") & _has("text", "spark"))
    want = [
        (r["doc_id"], r["source"])
        for r in members.select("doc_id", "source").orderBy("source", "doc_id").limit(8).collect()
    ]
    # sort over the FULL spark-match set filtered by fq=table
    ids = {r["doc_id"] for r in idx.match_ids(["spark"], mode="and").collect()}
    want = [w for w in want if w[0] in ids][:8]
    got = [
        (r["doc_id"], r["source"])
        for r in idx.search(["spark"], k=8, mode="and", sort="source asc", fl=["source"], fq="table").collect()
    ]
    assert got == want and len(got) > 0


def test_flat_fq_phrase_raises(idx):
    with pytest.raises(ValueError, match="FieldedIndex"):
        idx.search(["spark", "window"], k=5, mode="phrase", fq="table")


def test_flat_facets_and_stats_take_fq(docs, idx):
    base = docs.filter(_has("text", "spark") & _has("text", "table"))
    want = {
        (r["source"], r["n"])
        for r in base.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    dims = docs.select("doc_id", "source")
    got = {
        (r["source"], r["n"])
        for r in idx.facet_counts(["spark"], dims, "source", mode="and", fq="table").collect()
    }
    assert got == want and len(got) > 0
    sdims = docs.select("doc_id", F.size(tokenize_expr("text")).alias("doclen"))
    row = idx.field_stats(["spark"], sdims, "doclen", mode="and", fq="table").collect()[0]
    assert row["n"] == base.count()


def test_fielded_fq_with_docvalues_range(docs, fidx):
    fq_ids = {
        r["doc_id"]
        for r in docs.filter(
            _has("lang", "en") & F.col("n_chars").between(120, 400)
        ).collect()
    }
    full = fidx.search("text:spark", k=100000).collect()
    want = [(r["doc_id"], r["score"]) for r in full if r["doc_id"] in fq_ids][:10]
    got = [
        tuple(r)
        for r in fidx.search("text:spark", k=10, fq=["lang:en", "nch:[120 TO 400]"]).collect()
    ]
    assert got == want and len(got) > 0
    # single-string AND form equivalent
    got2 = [
        tuple(r)
        for r in fidx.search("text:spark", k=10, fq="lang:en AND nch:[120 TO 400]").collect()
    ]
    assert got2 == got


def test_fielded_fq_filtered_phrase(docs, fidx):
    # the fielded engine DOES filter phrases (flat raises): text:"spark window"
    # scored, fq shrinks membership
    fq_ids = {r["doc_id"] for r in docs.filter(_has("lang", "en")).collect()}
    full = fidx.search('text:"spark window"', k=100000).collect()
    want = [(r["doc_id"], r["score"]) for r in full if r["doc_id"] in fq_ids][:10]
    got = [tuple(r) for r in fidx.search('text:"spark window"', k=10, fq="lang:en").collect()]
    assert got == want and len(got) > 0


def test_fielded_fq_with_compound_sort_and_facets(docs, fidx):
    got = [
        tuple(r)
        for r in fidx.search(
            "text:spark", k=8, sort="score desc, source asc", fl=["source"], fq="lang:en"
        ).collect()
    ]
    full = [
        tuple(r)
        for r in fidx.search(
            "text:spark", k=100000, sort="score desc, source asc", fl=["source"]
        ).collect()
    ]
    fq_ids = {r["doc_id"] for r in docs.filter(_has("lang", "en")).collect()}
    assert got == [t for t in full if t[0] in fq_ids][:8] and len(got) > 0
    dims = docs.select("doc_id", "source")
    want = {
        (r["source"], r["n"])
        for r in docs.filter(_has("text", "spark") & _has("lang", "en"))
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    fc = {
        (r["source"], r["n"])
        for r in fidx.facet_counts("text:spark", dims, "source", fq="lang:en").collect()
    }
    assert fc == want and len(fc) > 0


def test_search_many_fq_entries_match_per_query(idx, fidx):
    # flat: 4-tuple entries (q, mode, k, fq) == per-query search(fq=)
    batch = idx.search_many({
        "fq": (Q, "or", 10, "table -join"),
        "plain": (Q, "or", 5),
    })
    want = [tuple(r) for r in idx.search(Q, k=10, mode="or", fq="table -join").collect()]
    assert batch["fq"] == want and len(want) > 0
    assert batch["plain"] == [tuple(r) for r in idx.search(Q, k=5, mode="or").collect()]
    # fielded: fq with a dv-routed range in the batch
    fbatch = fidx.search_many({
        "fq": ("text:spark", "or", 10, ["lang:en", "nch:[120 TO 400]"]),
        "plain": ("text:spark", "or", 5),
    })
    fwant = [
        tuple(r)
        for r in fidx.search("text:spark", k=10, fq=["lang:en", "nch:[120 TO 400]"]).collect()
    ]
    assert fbatch["fq"] == fwant and len(fwant) > 0


def test_search_grouped_fq(docs, idx):
    got = {
        (r["source"], r["doc_id"])
        for r in idx.search_grouped(Q, "source", k_groups=5, docs_per_group=2,
                                    mode="or", fq="table").collect()
    }
    # every returned doc is in the fq set, and group ranking matches the
    # grouped run over the pre-filtered match set
    fq_ids = {r["doc_id"] for r in docs.filter(_has("text", "table")).collect()}
    assert got and all(d in fq_ids for _, d in got)
    full = idx.search_grouped(Q, "source", k_groups=1000, docs_per_group=2, mode="or").collect()
    # groups surviving the filter with their filtered best doc included
    filtered_rows = [
        r for r in idx.search_grouped(Q, "source", k_groups=5, docs_per_group=2,
                                      mode="or", fq="table").collect()
    ]
    assert all(r["doc_id"] in fq_ids for r in filtered_rows)


# ---- bq (Solr edismax additive boost query, round 5b) --------------------


def test_flat_bq_adds_scores_without_adding_docs(idx):
    qs = {r["doc_id"]: r["score"] for r in idx.score_matches(Q, mode="or").collect()}
    bs = {r["doc_id"]: r["score"] for r in idx.score_matches(["table"], mode="or").collect()}
    want = sorted(
        ((d, round(s + bs.get(d, 0.0), 6)) for d, s in qs.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = [tuple(r) for r in idx.search(Q, k=10, mode="or", bq="table").collect()]
    assert got == want and len(got) > 0
    assert {d for d, _ in got} <= set(qs)


def test_bq_composes_with_fq_and_fl(idx):
    got = idx.search(Q, k=5, mode="or", bq="table", fq="scan", fl=["source"]).collect()
    qs = {r["doc_id"]: r["score"] for r in idx.score_matches(Q, mode="or").collect()}
    bs = {r["doc_id"]: r["score"] for r in idx.score_matches(["table"], mode="or").collect()}
    fq_ids = {r["doc_id"] for r in idx.match_ids(["scan"], mode="and").collect()}
    want = sorted(
        ((d, round(s + bs.get(d, 0.0), 6)) for d, s in qs.items() if d in fq_ids),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert [(r["doc_id"], r["score"]) for r in got] == want and len(got) > 0
    assert all(r["source"] is not None for r in got)


def test_fielded_bq_with_clause_boost_and_function_boost(fidx):
    # ((q + bq) + bf) — Solr's edismax order: bq folds into the additive
    # score BEFORE the function boost recomputation
    base = [tuple(r) for r in fidx.search("text:spark", k=10, bq="lang:en^2.0").collect()]
    qs = {r["doc_id"]: r["score"] for r in fidx.score_matches("text:spark").collect()}
    bs = {r["doc_id"]: r["score"] for r in fidx.score_matches("lang:en^2.0").collect()}
    want = sorted(
        ((d, round(s + bs.get(d, 0.0), 6)) for d, s in qs.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert base == want and len(base) > 0
    boosted = [
        tuple(r) for r in fidx.search("text:spark", k=10, bq="lang:en^2.0", bf="nch").collect()
    ]
    stored = {r["doc_id"]: r["nch"] for r in fidx.stored().select("doc_id", "nch").collect()}
    wantb = sorted(
        ((d, round(round(s + bs.get(d, 0.0), 6) + float(stored.get(d) or 0), 6)) for d, s in qs.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert [d for d, _ in boosted] == [d for d, _ in wantb]


def test_bq_sort_guard(idx, fidx):
    with pytest.raises(ValueError, match="bq="):
        idx.search(Q, k=5, mode="or", bq="table", sort="source asc")
    with pytest.raises(ValueError, match="bq="):
        fidx.search("text:spark", k=5, bq="lang:en", sort="source asc")


# ---- pf/ps (edismax phrase-boost fields, round 5b) -----------------------


def test_flat_pf_scales_window_matches(idx):
    q = ["table", "spark"]
    qs = {r["doc_id"]: r["score"] for r in idx.score_matches(q, mode="or").collect()}
    win = {r["doc_id"] for r in idx.search_phrase(q, k=10**6, slop=3).collect()}
    want = sorted(
        ((d, round(s * (1 + (2.0 if d in win else 0.0)), 6)) for d, s in qs.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = [tuple(r) for r in idx.search(q, k=10, mode="or", pf=2.0, ps=3).collect()]
    assert got == want and len(got) > 0
    assert any(d in win for d, _ in got)  # boosted docs actually surface
    # single-token query: pf is a no-op (Solr skips pf there)
    a = [tuple(r) for r in idx.search(["table"], k=10, mode="or", pf=5.0, ps=2).collect()]
    b = [tuple(r) for r in idx.search(["table"], k=10, mode="or").collect()]
    assert a == b


def test_fielded_pf_folds_into_bq(fidx):
    got = [tuple(r) for r in fidx.search("text:table AND text:spark", k=10, pf="text", ps=3).collect()]
    want = [tuple(r) for r in fidx.search("text:table AND text:spark", k=10, bq='text:"table spark"~3').collect()]
    assert got == want and len(got) > 0
    # dict boost + merge with an existing bq clause (sum of boosts)
    got2 = [tuple(r) for r in fidx.search(
        "text:table AND text:spark", k=10, pf={"text": 2.0}, ps=3, bq="lang:en").collect()]
    want2 = [tuple(r) for r in fidx.search(
        "text:table AND text:spark", k=10, bq=["lang:en", 'text:"table spark"~3^2.0']).collect()]
    assert got2 == want2


def test_pf_sort_guard(idx, fidx):
    with pytest.raises(ValueError, match="pf="):
        idx.search(Q, k=5, mode="or", pf=2.0, sort="source asc")
    with pytest.raises(ValueError, match="bq=/pf="):
        fidx.search("text:spark AND text:table", k=5, pf="text", sort="source asc")


# ---- local-searcher fq (round 5b — closes the documented gap) -------------


def test_local_flat_fq_parity(idx):
    loc = idx.open_local()
    for q, mode, fq in [
        (Q, "or", "table -join"),
        (Q, "or", ["table", "scan"]),              # plain term list = AND filter
        (["table", "join"], "and", "(spark value) -window"),
        (Q, "or", ["table -join", "scan"]),        # filter list intersects
    ]:
        d_res = [tuple(r) for r in idx.search(q, k=10, mode=mode, fq=fq).collect()]
        assert loc.search(q, k=10, mode=mode, fq=fq) == d_res, fq
        assert len(d_res) > 0
    with pytest.raises(ValueError, match="phrase"):
        loc.search(["table", "join"], k=5, mode="phrase", fq="scan")


def test_local_fielded_fq_parity(fidx):
    floc = fidx.open_local()
    for q, fq in [
        ("text:value", "lang:en"),
        ("text:value", 'text:"table spark"~3'),     # sloppy phrase filter
        ("text:value", ["lang:en", "text:table"]),
        ("text:table AND text:join", "text:spark OR text:window"),
        ("text:value", "lang:en AND -text:join"),
        ("text:value", "text:s*"),
    ]:
        d_res = [tuple(r) for r in fidx.search(q, k=10, fq=fq).collect()]
        assert floc.search(q, k=10, fq=fq) == d_res, fq
        assert len(d_res) > 0
