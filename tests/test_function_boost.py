"""Round-5 function-query boosts: Solr edismax ``bf`` (additive) and
``boost`` (multiplicative) function queries over stored doc-values columns
— ``final = (score + bf) · boost`` — checked against a DataFrame twin that
recomputes the boost from score_matches + the raw documents table.

Reference parity: the viewer tunes relevance with exactly this Solr
surface (boost/bf request params of the /select handler); the indexer's
job is to store the numeric doc-values fields the functions read
(helper/MetadataHelper.java's manufactured MDNUM_*/SORTNUM_* numerics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.operators.search import (
    FieldedIndex,
    FunctionQuery,
    InvertedIndex,
)
from goobi_viewer_indexer_spark.plans.build import build_index, build_index_fielded
from goobi_viewer_indexer_spark.plans.maintenance import set_stored_fields
from tests.conftest import SF001

CFG = IndexConfig(docs_per_segment=64, merge_fanin=2, block_size=16, postings_buckets=8, compact_below_bytes=256)
FIELDS = {"text": "text", "source": "source", "lang": "lang"}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boost_idx"))
    build_index(docs, d, CFG)
    set_stored_fields(
        spark, d,
        docs.select("doc_id", "source", F.col("n_chars").cast("long").alias("nch")),
        tag="fb_stored",
    )
    return InvertedIndex(spark, d)


@pytest.fixture(scope="module")
def fidx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boost_fidx"))
    build_index_fielded(docs, d, FIELDS, CFG)
    set_stored_fields(
        spark, d,
        docs.select("doc_id", F.col("n_chars").cast("long").alias("nch")),
        tag="fb_fstored",
    )
    return FieldedIndex(spark, d)


def round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _twin(scored_df, docs, fn, k=10):
    """(doc_id, round6(fn(score, nch))) top-k — driver-side recompute."""
    nch = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    rows = [(r["doc_id"], round6(fn(r["score"], float(nch[r["doc_id"]])))) for r in scored_df.collect()]
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


# ---- flat engine ---------------------------------------------------------


def test_bf_additive_matches_twin(idx, docs):
    got = [(r["doc_id"], r["score"]) for r in
           idx.search(["table", "join"], mode="and", k=10, bf="linear(nch,0.001,0)").collect()]
    want = _twin(idx.score_matches(["table", "join"], mode="and"), docs,
                 lambda s, x: (s + ((0.001 * x) + 0.0)) * 1.0)
    assert got == want


def test_boost_multiplicative_matches_twin(idx, docs):
    got = [(r["doc_id"], r["score"]) for r in
           idx.search(["table", "join"], mode="and", k=10,
                      boost="recip(nch,1,1000,1000)").collect()]
    want = _twin(idx.score_matches(["table", "join"], mode="and"), docs,
                 lambda s, x: (s + 0.0) * (1000.0 / ((1.0 * x) + 1000.0)))
    assert got == want


def test_bf_and_boost_compose(idx, docs):
    # Solr edismax: final = (score + bf) * boost, both present
    got = [(r["doc_id"], r["score"]) for r in
           idx.search(["table"], mode="or", k=10, bf="sqrt(nch)",
                      boost="recip(nch,1,1000,1000)").collect()]
    want = _twin(idx.score_matches(["table"], mode="or"), docs,
                 lambda s, x: (s + math.sqrt(x)) * (1000.0 / ((1.0 * x) + 1000.0)))
    assert got == want


def test_boost_changes_ranking_not_membership(idx):
    plain = {r["doc_id"] for r in idx.search(["table", "join"], mode="and", k=10**6).collect()}
    boosted = {r["doc_id"] for r in
               idx.search(["table", "join"], mode="and", k=10**6,
                          boost="recip(nch,1,1000,1000)").collect()}
    assert plain == boosted


def test_bf_composes_with_fl(idx):
    rows = idx.search(["table"], mode="or", k=5, bf="linear(nch,0.001,0)", fl=["source"]).collect()
    assert rows and rows[0]["source"] is not None
    assert [c for c in rows[0].asDict()] == ["doc_id", "score", "source"]


# ---- fielded engine ------------------------------------------------------


def test_fielded_boost_matches_twin(fidx, docs):
    got = [(r["doc_id"], r["score"]) for r in
           fidx.search("text:table AND text:join", k=10,
                       boost="recip(nch,1,1000,1000)").collect()]
    want = _twin(fidx.score_matches("text:table AND text:join"), docs,
                 lambda s, x: (s + 0.0) * (1000.0 / ((1.0 * x) + 1000.0)))
    assert got == want


def test_fielded_bf_full_query_surface(fidx, docs):
    # bf composes with the whole fielded string surface (here: NOT clause)
    got = [(r["doc_id"], r["score"]) for r in
           fidx.search("text:table AND -lang:de", k=10, bf="linear(nch,0.001,0)").collect()]
    want = _twin(fidx.score_matches("text:table AND -lang:de"), docs,
                 lambda s, x: (s + ((0.001 * x) + 0.0)) * 1.0)
    assert got == want


# ---- guards + parser -----------------------------------------------------


def test_boost_guards(idx):
    with pytest.raises(ValueError, match="bf=/boost="):
        idx.search(["table"], bf="linear(nch,1,0)", sort="source asc")
    with pytest.raises(ValueError, match="bf=/boost="):
        idx.search(["table"], boost="sqrt(nch)", offset=3)
    with pytest.raises(ValueError, match="not stored"):
        idx.search(["table"], bf="linear(zzz_missing,1,0)")


def test_function_query_parser():
    fq = FunctionQuery("recip(field(nch),1,1000,1000)")
    assert fq.fields == {"nch"}
    assert FunctionQuery("sum(sqrt(a),product(b,2),0.5)").fields == {"a", "b"}
    for bad in ["frob(nch)", "recip(nch,1)", "linear(nch,1,0))", "nch,1", ""]:
        with pytest.raises(ValueError):
            FunctionQuery(bad)


def test_boost_plan_is_take_ordered(idx):
    plan = idx.search(["table"], k=10, boost="recip(nch,1,1000,1000)")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_extended_function_grammar(spark, idx):
    """Round 5c: log/ln/div/pow/max/min/map — python-math truth over the
    stored nch column (exact for div/max/min/map; 1e-9 for libm fns)."""
    import math

    nch = {r["doc_id"]: r["nch"] for r in idx.stored().select("doc_id", "nch").collect()}
    base = {r["doc_id"]: r["score"]
            for r in idx.search(["table", "join"], k=10**6, mode="and").collect()}

    cases = {
        "log(sum(nch,1))": lambda v: math.log10(v + 1.0),
        "ln(sum(nch,1))": lambda v: math.log(v + 1.0),
        "div(nch,100)": lambda v: v / 100.0,
        "pow(nch,0.5)": lambda v: v ** 0.5,
        "max(nch,250)": lambda v: max(v, 250.0),
        "min(nch,250)": lambda v: min(v, 250.0),
        "map(nch,0,200,0)": lambda v: 0.0 if 0.0 <= v <= 200.0 else v,
    }
    for src, fn in cases.items():
        got = [(r["doc_id"], r["score"])
               for r in idx.search(["table", "join"], k=8, mode="and", bf=src).collect()]
        want = sorted(
            ((d, math.floor((s + fn(float(nch[d]))) * 1e6 + 0.5) / 1e6) for d, s in base.items()),
            key=lambda x: (-x[1], x[0]))[:8]
        assert [d for d, _ in got] == [d for d, _ in want], src
        for (_d, gs), (_w, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, (src, gs, ws)
    with pytest.raises(ValueError, match="takes 4 args|args"):
        idx.search(["table"], k=5, bf="map(nch,0,200)")
    with pytest.raises(ValueError, match="unsupported function"):
        idx.search(["table"], k=5, bf="scale(nch,0,1)")
