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


# --------------------------------------------------------------------------
# round 5b: facet.sort=index / facet.missing / group.facet + Solr mm specs
# --------------------------------------------------------------------------

def _null_lang(docs):
    # synthetic nulls: the sf corpus has none, facet.missing needs some
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(F.col("lang")).alias("lang"),
    )


def test_facet_sort_index_truncates_lexicographically(docs, idx):
    dims = docs.select("doc_id", "source")
    got = [tuple(r) for r in idx.facet_counts(["table"], dims, "source", mode="and",
                                              sort="index", limit=5).collect()]
    want = [
        tuple(r)
        for r in docs.filter(_has("text", "table"))
        .groupBy("source").agg(F.count("*").alias("n"))
        .orderBy("source").limit(5).collect()
    ]
    assert got == want and len(got) == 5


def test_facet_missing_appends_null_bucket(docs, idx):
    dims = _null_lang(docs)
    out = idx.facet_counts(["table"], dims, "lang", mode="and", missing=True).collect()
    base = docs.filter(_has("text", "table")).select(
        "doc_id", F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(F.col("lang")).alias("lang"))
    want_missing = base.filter(F.col("lang").isNull()).count()
    assert want_missing > 0
    # the null bucket is the LAST row, exempt from ordering/mincount
    assert out[-1]["lang"] is None and out[-1]["n"] == want_missing
    vals = {r["lang"]: r["n"] for r in out[:-1]}
    want = {r["lang"]: r["n"] for r in base.filter(F.col("lang").isNotNull())
            .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert vals == want
    # without missing= the null bucket is dropped (Solr's default)
    plain = idx.facet_counts(["table"], dims, "lang", mode="and").collect()
    assert all(r["lang"] is not None for r in plain)


def test_group_facet_counts_distinct_groups(docs, idx):
    dims = docs.select("doc_id", "lang", "source")
    got = {r["lang"]: r["n"] for r in idx.facet_counts(
        ["table"], dims, "lang", mode="and", group_field="source").collect()}
    want = {r["lang"]: r["n"] for r in docs.filter(_has("text", "table"))
            .groupBy("lang").agg(F.countDistinct("source").alias("n")).collect()}
    assert got == want and len(got) > 0
    docs_per = {r["lang"]: r["n"] for r in idx.facet_counts(
        ["table"], dims, "lang", mode="and").collect()}
    # group counts never exceed doc counts
    assert all(got[k] <= docs_per[k] for k in got)


def test_stats_cardinality_exact(docs, idx):
    dims = docs.select("doc_id", "n_chars")
    row = idx.field_stats(["table"], dims, "n_chars", mode="and", cardinality=True).collect()[0]
    want = (docs.filter(_has("text", "table"))
            .agg(F.countDistinct("n_chars").alias("c")).collect()[0]["c"])
    assert row["cardinality"] == want and want > 1


def test_parse_mm_full_grammar():
    from goobi_viewer_indexer_spark.operators.search import parse_mm
    assert parse_mm(7, 3) == 7                 # ints pass through unclamped
    assert parse_mm("3", 5) == 3
    assert parse_mm("-2", 5) == 3
    assert parse_mm("75%", 5) == 3             # Solr rounds DOWN
    assert parse_mm("-25%", 4) == 3
    assert parse_mm("2<-25% 9<-3", 2) == 2     # n <= smallest threshold: all
    assert parse_mm("2<-25% 9<-3", 8) == 6
    assert parse_mm("2<-25% 9<-3", 12) == 9
    assert parse_mm("0", 4) == 1               # clamp to [1, n]
    assert parse_mm("99", 4) == 4
    with pytest.raises(ValueError):
        parse_mm("2<", 4)


def test_mm_spec_equals_resolved_int(docs, idx):
    from goobi_viewer_indexer_spark.operators.search import LocalSearcher
    q = ["table", "join", "window"]
    spec = idx.search(q, k=10, mode="or", min_match="67%").collect()     # floor(2.01) = 2
    want = idx.search(q, k=10, mode="or", min_match=2).collect()
    assert [tuple(r) for r in spec] == [tuple(r) for r in want] and len(want) > 0
    ls = LocalSearcher(idx)
    assert ls.search(q, k=10, mode="or", min_match="67%") == ls.search(q, k=10, mode="or", min_match=2)
    # clamp low: "-99%" -> at least one term
    low = idx.search(q, k=10, mode="or", min_match="-99%").collect()
    one = idx.search(q, k=10, mode="or", min_match=1).collect()
    assert [tuple(r) for r in low] == [tuple(r) for r in one]


def test_facet_missing_and_range_other_single_scan_cached(docs, idx):
    # the two-consumer branches must read ONE materialization of the
    # aggregated counts (round 6: a GC-released localCheckpoint, shown as
    # Scan ExistingRDD — was an InMemoryTableScan cache that leaked a
    # CacheManager entry per call), not re-run the match scan per branch
    dims = _null_lang(docs)
    df = idx.facet_counts(["table"], dims, "lang", mode="and", missing=True)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "InMemoryTableScan" in plan
    assert plan.count("Scan parquet") == 0  # no branch re-reads the corpus
    dr = idx.facet_range(["table"], docs.select("doc_id", "n_chars"), "n_chars",
                         100, 400, 100, mode="and", other="all")
    dr.collect()
    plan = dr._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "InMemoryTableScan" in plan
    assert plan.count("Scan parquet") == 0


def test_facet_pivot_three_levels(docs, idx):
    # Solr facet.pivot=A,B,C — arbitrary depth (round 5b)
    dims = docs.select("doc_id", "source", "lang",
                       (F.floor(F.col("n_chars") / 200) * 200).alias("nb"))
    got = [tuple(r) for r in idx.facet_pivot(["table"], dims, ["source", "lang", "nb"],
                                             min_count=2).collect()]
    want = [
        tuple(r)
        for r in docs.filter(_has("text", "table"))
        .select("source", "lang", (F.floor(F.col("n_chars") / 200) * 200).alias("nb"))
        .groupBy("source", "lang", "nb").agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .orderBy(F.desc("n"), "source", "lang", "nb")
        .collect()
    ]
    assert got == want and len(got) > 0
    # legacy two-positional-column call still works
    two = idx.facet_pivot(["table", "join"], dims, "source", "lang", min_count=2)
    assert two.columns == ["source", "lang", "n"]
    with pytest.raises(ValueError):
        idx.facet_pivot(["table"], dims, "source")


def test_facet_interval_matches_twin(docs, idx):
    # Solr facet.interval (round 5c): overlapping intervals, bracket
    # grammar incl. exclusive bounds and open ends, zero-count rows kept
    dims = docs.select("doc_id", "n_chars")
    specs = [("low", "[0,200)"), ("midwide", "(100,350]"),
             ("high", "(300,*]"), ("none", "[900000,*]")]
    got = {r["facet_interval"]: r["n"]
           for r in idx.facet_interval(["table"], dims, "n_chars", specs).collect()}
    m = docs.filter(_has("text", "table"))
    want = {
        "low": m.filter((F.col("n_chars") >= 0) & (F.col("n_chars") < 200)).count(),
        "midwide": m.filter((F.col("n_chars") > 100) & (F.col("n_chars") <= 350)).count(),
        "high": m.filter(F.col("n_chars") > 300).count(),
        "none": 0,
    }
    assert got == want and want["midwide"] > 0
    # overlap really happened (a doc in both low and midwide) — the
    # conditional-count shape, not a partition
    both = m.filter((F.col("n_chars") > 100) & (F.col("n_chars") < 200)).count()
    assert both > 0 and got["low"] + got["midwide"] > m.filter(F.col("n_chars") <= 350).count()
    # bare specs label themselves; bad grammar raises
    bare = {r["facet_interval"] for r in
            idx.facet_interval(["table"], dims, "n_chars", ["[0,200)"]).collect()}
    assert bare == {"[0,200)"}
    with pytest.raises(ValueError, match="interval"):
        idx.facet_interval(["table"], dims, "n_chars", ["0 to 200"])
    with pytest.raises(ValueError, match="duplicate"):
        idx.facet_interval(["table"], dims, "n_chars", ["[0,1]", "[0,1]"])


def test_facet_interval_fielded_and_fq(spark, docs, idx, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("facet_interval_fidx"))
    build_index_fielded(docs, d, {"text": "text", "lang": "lang"}, CFG)
    fidx = FieldedIndex(spark, d)
    dims = docs.select("doc_id", "n_chars")
    got = {r["facet_interval"]: r["n"]
           for r in fidx.facet_interval("text:table AND -lang:de", dims, "n_chars",
                                        [("lo", "[*,250]"), ("hi", "(250,*]")]).collect()}
    m = docs.filter(_has("text", "table") & ~_has("lang", "de"))
    assert got == {"lo": m.filter(F.col("n_chars") <= 250).count(),
                   "hi": m.filter(F.col("n_chars") > 250).count()}
    # fq composes (flat): interval counts over q AND fq
    gotf = {r["facet_interval"]: r["n"]
            for r in idx.facet_interval(["table"], dims, "n_chars",
                                        [("all", "[*,*]")], fq="join").collect()}
    mf = docs.filter(_has("text", "table") & _has("text", "join"))
    assert gotf == {"all": mf.count()}
