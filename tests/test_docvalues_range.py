"""Doc-values range execution (round 5, VERDICT r4 #1): ``f:[lo TO hi]``
on a registered (or expansion-overflowing) field executes as a pushed
filter on the STORED side table joined with the residual match set —
never a dictionary expansion.  The reference stores DATECREATED/
DATEINDEXED/DATEUPDATED as epoch-millisecond longs
(helper/SolrSearchIndex.java:256-267) — near-unique per doc, so the
viewer's date drill-down can never fit a term expansion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr
from goobi_viewer_indexer_spark.operators.search import FieldedIndex
from goobi_viewer_indexer_spark.plans.build import build_index_fielded
from goobi_viewer_indexer_spark.plans.maintenance import set_stored_fields
from tests.conftest import SF001

CFG = IndexConfig(docs_per_segment=64, merge_fanin=2, block_size=16, postings_buckets=8, compact_below_bytes=256)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


@pytest.fixture(scope="module")
def fdir(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dv_fidx"))
    build_index_fielded(
        docs.withColumn("nch", F.col("n_chars").cast("string")),
        d, {"text": "text", "source": "source", "nch": "nch"}, CFG,
    )
    set_stored_fields(
        spark, d,
        docs.select("doc_id", "source", F.col("n_chars").cast("long").alias("nch")),
        tag="dv_stored",
    )
    return d


@pytest.fixture(scope="module")
def fidx(spark, fdir):
    """Dictionary-expansion handle (nothing registered)."""
    return FieldedIndex(spark, fdir)


@pytest.fixture(scope="module")
def dvidx(spark, fdir):
    """Doc-values handle: nch ranges route to the stored table."""
    h = FieldedIndex(spark, fdir)
    h.docvalues_fields.add("nch")
    return h


def _has(col, term):
    return F.array_contains(F.array_distinct(tokenize_expr(col)), term)


def test_dv_route_matches_dictionary_route(fidx, dvidx):
    q = "text:table AND nch:[150 TO 400]"
    via_dict = sorted(tuple(r) for r in fidx.search(q, k=1000).collect())
    via_dv = sorted(tuple(r) for r in dvidx.search(q, k=1000).collect())
    assert via_dv == via_dict and len(via_dv) > 0
    ids_dict = sorted(r["doc_id"] for r in fidx.match_ids(q).collect())
    ids_dv = sorted(r["doc_id"] for r in dvidx.match_ids(q).collect())
    assert ids_dv == ids_dict


def test_dv_route_never_expands_dictionary(dvidx, monkeypatch):
    def boom(*a, **kw):  # pragma: no cover
        raise AssertionError("dictionary expansion ran on the doc-values path")

    monkeypatch.setattr(dvidx, "expand_range", boom)
    got = dvidx.search("text:table AND nch:[150 TO 400]", k=10).collect()
    assert len(got) > 0


def test_dv_negated_range(docs, fidx, dvidx):
    q = "text:table AND -nch:[150 TO 400]"
    want = sorted(
        r["doc_id"]
        for r in docs.filter(_has("text", "table") & ~F.col("n_chars").between(150, 400)).collect()
    )
    assert sorted(r["doc_id"] for r in dvidx.match_ids(q).collect()) == want
    assert sorted(r["doc_id"] for r in fidx.match_ids(q).collect()) == want
    assert len(want) > 0


def test_overflow_falls_back_to_docvalues(docs, fidx):
    """Unregistered field whose expansion overflows the cap: with the
    column stored, the range routes doc-values-side instead of raising."""
    fidx.range_expansion_cap = 2  # force overflow (range spans > 2 terms)
    try:
        got = sorted(r["doc_id"] for r in fidx.match_ids("text:table AND nch:[150 TO 400]").collect())
    finally:
        fidx.range_expansion_cap = 1024
    want = sorted(
        r["doc_id"]
        for r in docs.filter(_has("text", "table") & F.col("n_chars").between(150, 400)).collect()
    )
    assert got == want and len(got) > 0


def test_overflow_without_stored_column_raises(spark, docs, tmp_path):
    d = str(tmp_path / "nodv")
    build_index_fielded(
        docs.withColumn("nch", F.col("n_chars").cast("string")),
        d, {"text": "text", "nch": "nch"}, CFG,
    )
    h = FieldedIndex(spark, d)
    h.range_expansion_cap = 2
    with pytest.raises(ValueError, match="doc-values"):
        h.match_ids("text:table AND nch:[150 TO 400]").collect()


def test_dv_or_disjunct_rank_identical_to_dictionary_route(fidx, dvidx):
    # OR-mode range = constant-score disjunct: union membership, docs
    # matched only by the range at score 0.0 — rank-identical to the
    # dictionary route's zero-weight expanded OR-group (round 5b)
    q = "text:table OR nch:[150 TO 400]"
    via_dict = sorted(tuple(r) for r in fidx.search(q, k=1000).collect())
    via_dv = sorted(tuple(r) for r in dvidx.search(q, k=1000).collect())
    assert via_dv == via_dict and len(via_dv) > 0
    assert any(s == 0.0 for _, s in via_dv) and any(s > 0.0 for _, s in via_dv)
    ids_dict = sorted(r["doc_id"] for r in fidx.match_ids(q).collect())
    ids_dv = sorted(r["doc_id"] for r in dvidx.match_ids(q).collect())
    assert ids_dv == ids_dict


def test_dv_or_with_negated_term_excludes_from_range_members(docs, fidx, dvidx):
    # a neg TERM clause excludes globally — including from docs only the
    # range matched (the re-applied-on-the-union path)
    q = "text:table OR nch:[150 TO 400] OR -text:join"
    via_dict = sorted(tuple(r) for r in fidx.search(q, k=1000).collect())
    via_dv = sorted(tuple(r) for r in dvidx.search(q, k=1000).collect())
    assert via_dv == via_dict and len(via_dv) > 0
    want = sorted(
        r["doc_id"]
        for r in docs.filter(
            (_has("text", "table") | F.col("n_chars").between(150, 400))
            & ~_has("text", "join")
        ).collect()
    )
    assert sorted(d for d, _ in via_dv) == want


def test_dv_or_two_ranges_union(docs, dvidx):
    # pure-dv OR: membership is the UNION of the routed filters
    got = sorted(r["doc_id"] for r in dvidx.match_ids("nch:[100 TO 150] OR nch:[300 TO 400]").collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(
            F.col("n_chars").between(100, 150) | F.col("n_chars").between(300, 400)
        ).collect()
    )
    assert got == want and len(got) > 0


def test_pure_dv_query(docs, dvidx):
    ids = sorted(r["doc_id"] for r in dvidx.match_ids("nch:[150 TO 400]").collect())
    want = sorted(r["doc_id"] for r in docs.filter(F.col("n_chars").between(150, 400)).collect())
    assert ids == want and len(ids) > 0
    # constant score 0.0 (ranges never score), doc_id tie-break order
    rows = [tuple(r) for r in dvidx.search("nch:[150 TO 400]", k=5).collect()]
    assert rows == [(d, 0.0) for d in want[:5]]


def test_pure_dv_with_negative_term_clause(docs, dvidx):
    got = sorted(r["doc_id"] for r in dvidx.match_ids("nch:[150 TO 400] AND -text:table").collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.col("n_chars").between(150, 400) & ~_has("text", "table")).collect()
    )
    assert got == want and len(got) > 0


def test_dv_composes_with_field_sort_and_facets(docs, dvidx):
    # sort path rides match_ids → the dv route composes transparently
    rows = [
        tuple(r)
        for r in dvidx.search(
            "text:table AND nch:[150 TO 400]", k=8, sort="source asc", fl=["source"]
        ).collect()
    ]
    want = (
        docs.filter(_has("text", "table") & F.col("n_chars").between(150, 400))
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
        .limit(8)
        .collect()
    )
    assert rows == [tuple(r) for r in want]
    # facet over a dv-routed query
    fc = {
        (r["source"], r["n"])
        for r in dvidx.facet_counts(
            "text:table AND nch:[150 TO 400]", docs.select("doc_id", "source"), "source"
        ).collect()
    }
    twin = {
        (r["source"], r["n"])
        for r in docs.filter(_has("text", "table") & F.col("n_chars").between(150, 400))
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert fc == twin and len(fc) > 0


def test_dv_range_in_search_many_batch(dvidx):
    q = "text:table AND nch:[150 TO 400]"
    single = [tuple(r) for r in dvidx.search(q, k=10).collect()]
    batch = dvidx.search_many({
        "dv": (q, "and", 10),
        "plain": ("text:table", "and", 5),
    })
    assert batch["dv"] == single and len(single) > 0
    assert batch["plain"] == [tuple(r) for r in dvidx.search("text:table", k=5).collect()]


# ---- LocalFieldedSearcher routing (round 5b) -----------------------------


def test_local_dv_route_rank_identical(dvidx):
    q = "text:table AND nch:[150 TO 400]"
    dist = [(r["doc_id"], r["score"]) for r in dvidx.search(q, k=25).collect()]
    assert dvidx.open_local().search(q, k=25) == dist and len(dist) > 0


def test_local_dv_negated_range(dvidx):
    q = "text:table AND -nch:[150 TO 400]"
    dist = [(r["doc_id"], r["score"]) for r in dvidx.search(q, k=25).collect()]
    assert dvidx.open_local().search(q, k=25) == dist and len(dist) > 0


def test_local_pure_dv_membership(dvidx):
    q = "nch:[100 TO 260]"
    dist = [(r["doc_id"], r["score"]) for r in dvidx.search(q, k=15).collect()]
    loc = dvidx.open_local().search(q, k=15)
    assert loc == dist and len(loc) > 0 and all(s == 0.0 for _, s in loc)


def test_local_overflow_fallback_routes(fidx):
    # unregistered field whose expansion overflows a tiny cap: the local
    # searcher must fall back to the stored column exactly like the
    # distributed engine instead of raising
    loc = fidx.open_local()
    old = fidx.range_expansion_cap
    fidx.range_expansion_cap = 2
    try:
        q = "text:table AND nch:[100 TO 400]"
        dist = [(r["doc_id"], r["score"]) for r in fidx.search(q, k=25).collect()]
        assert loc.search(q, k=25) == dist and len(dist) > 0
    finally:
        fidx.range_expansion_cap = old


def test_local_lex_dv_range(dvidx):
    h = dvidx
    had = "source" in h.docvalues_fields
    h.docvalues_fields.add("source")
    try:
        q = "text:table AND source:[src10 TO src20]"
        dist = [(r["doc_id"], r["score"]) for r in h.search(q, k=25).collect()]
        assert h.open_local().search(q, k=25) == dist and len(dist) > 0
    finally:
        if not had:
            h.docvalues_fields.discard("source")


def test_local_pure_dv_or_union(dvidx):
    q = "nch:[100 TO 150] OR nch:[300 TO 400]"
    dist = [(r["doc_id"], r["score"]) for r in dvidx.search(q, k=20).collect()]
    loc = dvidx.open_local().search(q, k=20)
    assert loc == dist and len(loc) > 0 and all(s == 0.0 for _, s in loc)


def test_local_or_disjunct_with_scored_clause_raises(dvidx):
    with pytest.raises(ValueError, match="use FieldedIndex.search"):
        dvidx.open_local().search("text:table OR nch:[150 TO 400]", k=10)


def test_dv_membership_excludes_tombstoned_docs(spark, docs, tmp_path):
    """Stored side table keeps rows until compact — dv membership that
    bypasses the postings kernels must still drop tombstoned docs."""
    from goobi_viewer_indexer_spark.plans.maintenance import delete_docs

    d = str(tmp_path / "dv_tomb")
    build_index_fielded(
        docs.withColumn("nch", F.col("n_chars").cast("string")),
        d, {"text": "text", "nch": "nch"}, CFG,
    )
    set_stored_fields(
        spark, d, docs.select("doc_id", F.col("n_chars").cast("long").alias("nch")), tag="t"
    )
    h = FieldedIndex(spark, d)
    h.docvalues_fields.add("nch")
    members = sorted(r["doc_id"] for r in h.match_ids("nch:[150 TO 400]").collect())
    assert len(members) > 2
    victim = members[1]
    delete_docs(spark, d, [victim], trace=False, tag="dv_tomb_del")
    h2 = FieldedIndex(spark, d)
    h2.docvalues_fields.add("nch")
    after = sorted(r["doc_id"] for r in h2.match_ids("nch:[150 TO 400]").collect())
    assert after == [i for i in members if i != victim]
    # the OR union path drops it too: score-0 disjunct members are live-only
    or_ids = sorted(r["doc_id"] for r in h2.match_ids("text:table OR nch:[150 TO 400]").collect())
    assert victim not in or_ids


def test_local_fq_dv_routed_range(docs, dvidx):
    """Local-searcher fq with a doc-values-routed range filter (round 5b):
    the member set comes from the cached stored columns, parity with the
    distributed semi-join."""
    floc = dvidx.open_local()
    for q, fq in [
        ("text:value", "nch:[120 TO 4000]"),
        ("text:value", "text:table AND nch:[120 TO 4000]"),
    ]:
        d_res = [tuple(r) for r in dvidx.search(q, k=10, fq=fq).collect()]
        assert floc.search(q, k=10, fq=fq) == d_res, fq
        assert len(d_res) > 0
