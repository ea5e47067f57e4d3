"""Boolean queries: NOT (prohibited clauses) + AND-of-OR-groups across the
flat and fielded engines, rank-identical to the naive DataFrame twin, plus
the NOT-capable delete-by-query path (reference's own negated query shape
`+(URN:(v1 v2)) -PI_TOPSTRUCT:"pi"`, helper/SolrSearchIndex.java:918-921)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.operators.naive_bm25 import bm25_boolean_topk
from goobi_viewer_indexer_spark.operators.search import (
    FieldedIndex,
    InvertedIndex,
    parse_boolean_query,
    parse_fielded_clauses,
)
from goobi_viewer_indexer_spark.plans import maintenance as maint
from goobi_viewer_indexer_spark.plans.build import build_index, build_index_fielded
from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr
from tests.conftest import SF001

CFG = IndexConfig(docs_per_segment=32, merge_fanin=2, block_size=16, postings_buckets=8, compact_below_bytes=256)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bool_idx"))
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index(docs, d, CFG)
    return InvertedIndex(spark, d)


def test_parse_boolean_query():
    groups, negs = parse_boolean_query("(table join) spark -window -(foo bar)")
    assert groups == [["join", "table"], ["spark"]]
    assert negs == [["window"], ["bar", "foo"]]
    with pytest.raises(ValueError, match="positive"):
        parse_boolean_query("-table -join")


@pytest.mark.parametrize(
    "q,groups,negs",
    [
        ("table join -spark", [["table"], ["join"]], [["spark"]]),
        ("(spark window) value", [["spark", "window"], ["value"]], []),
        ("(spark window) value -join", [["spark", "window"], ["value"]], [["join"]]),
        ("table -zzznotexist", [["table"]], [["zzznotexist"]]),
    ],
)
def test_boolean_rank_identity_three_ways(spark, idx, q, groups, negs):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    exp = [tuple(r) for r in bm25_boolean_topk(docs, groups, negs, k=10).collect()]
    got_dist = [tuple(r) for r in idx.search_boolean(q, k=10).collect()]
    got_local = idx.open_local().search_boolean(q, k=10)
    assert got_dist == exp
    assert got_local == exp
    assert len(exp) > 0  # non-degenerate


def test_boolean_not_excludes(spark, idx):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    with_neg = {r["doc_id"] for r in idx.search_boolean("table -spark", k=500).collect()}
    spark_docs = {
        r["doc_id"]
        for r in docs.filter(F.array_contains(tokenize_expr("text"), "spark")).collect()
    }
    assert with_neg and not (with_neg & spark_docs)


def test_boolean_missing_positive_group_empty(idx):
    assert idx.search_boolean("zzznotexist table", k=10).count() == 0
    assert idx.search_boolean("(zzznotexist qqqnothere) table", k=10).count() == 0
    # a missing term inside an OR-group with a live sibling still matches
    assert idx.search_boolean("(zzznotexist table)", k=10).count() > 0


def test_match_ids_boolean_equals_filter(spark, idx):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    got = sorted(r["doc_id"] for r in idx.match_ids_boolean("(table join) -spark").collect())
    toks = tokenize_expr("text")
    exp = sorted(
        r["doc_id"]
        for r in docs.filter(
            (F.array_contains(toks, "table") | F.array_contains(toks, "join"))
            & ~F.array_contains(toks, "spark")
        ).collect()
    )
    assert got == exp and len(exp) > 0


def test_delete_by_query_boolean(spark, tmp_path):
    d = str(tmp_path / "idx")
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index(docs, d, CFG)
    toks = tokenize_expr("text")
    victims = {
        r["doc_id"]
        for r in docs.filter(F.array_contains(toks, "table") & ~F.array_contains(toks, "spark")).collect()
    }
    maint.delete_by_query(spark, d, "table -spark", mode="boolean")
    live = InvertedIndex(spark, d)
    remaining = {r["doc_id"] for r in live.match_ids(["table"], mode="and").collect()}
    assert remaining and not (remaining & victims)
    # everything left containing 'table' also contains 'spark'
    keep = {
        r["doc_id"]
        for r in docs.filter(F.array_contains(toks, "table") & F.array_contains(toks, "spark")).collect()
    }
    assert remaining == keep


FIELDS = {"text": "text", "source": "source", "lang": "lang"}


@pytest.fixture(scope="module")
def fidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bool_fidx"))
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index_fielded(docs, d, FIELDS, CFG)
    return FieldedIndex(spark, d)


def test_fielded_parse_boolean_clauses():
    clauses, mode = parse_fielded_clauses('text:(spark window) AND -lang:de AND source:src7')
    assert [(c.field, c.toks, c.neg, c.group) for c in clauses] == [
        ("text", ["spark", "window"], False, True),
        ("lang", ["de"], True, False),
        ("source", ["src7"], False, False),
    ]
    assert mode == "and"
    with pytest.raises(ValueError, match="positive"):
        parse_fielded_clauses("-text:spark")


def test_fielded_not_clause_local_equals_distributed(spark, fidx):
    q = "text:table AND -lang:de"
    dist = [tuple(r) for r in fidx.search(q, k=10).collect()]
    loc = fidx.open_local().search(q, k=10)
    assert dist == loc and len(dist) > 0
    # every result has lang != de
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    de = {r["doc_id"] for r in docs.filter(F.col("lang") == "de").collect()}
    assert not ({d for d, _ in dist} & de)


def test_fielded_or_group_clause(spark, fidx):
    q = "text:(spark window) AND source:src7"
    dist = [tuple(r) for r in fidx.search(q, k=20).collect()]
    loc = fidx.open_local().search(q, k=20)
    assert dist == loc and len(dist) > 0
    # OR-group: superset of the AND form over the same terms
    and_hits = {r["doc_id"] for r in fidx.search("text:spark AND text:window AND source:src7", k=50).collect()}
    assert and_hits <= {d for d, _ in dist} | and_hits  # consistency smoke


def test_fielded_neg_phrase(spark, fidx):
    q = 'text:table AND -text:"spark window"'
    dist = [tuple(r) for r in fidx.search(q, k=200).collect()]
    loc = fidx.open_local().search(q, k=200)
    assert dist == loc and len(dist) > 0
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    joined = F.concat(F.lit(" "), F.array_join(tokenize_expr("text"), " "), F.lit(" "))
    phrase_docs = {r["doc_id"] for r in docs.filter(F.contains(joined, F.lit(" spark window "))).collect()}
    assert not ({d for d, _ in dist} & phrase_docs)


def test_fielded_mixed_phrase_and_not(spark, fidx):
    # positive phrase + prohibited term in one query
    q = 'text:"spark window" AND -lang:de'
    dist = [tuple(r) for r in fidx.search(q, k=50).collect()]
    loc = fidx.open_local().search(q, k=50)
    assert dist == loc
    only_phrase = [tuple(r) for r in fidx.search('text:"spark window"', k=50).collect()]
    assert {d for d, _ in dist} <= {d for d, _ in only_phrase}


def test_prefix_search_equals_expanded_or(spark, idx):
    terms = idx.expand_prefix("s")
    assert set(terms) == {"scan", "slow", "stream", "small", "sort", "spark"}
    got = [tuple(r) for r in idx.search_prefix("s", k=10).collect()]
    exp = [tuple(r) for r in idx.search(terms, k=10, mode="or").collect()]
    assert got == exp and len(got) == 10


def test_prefix_expansion_plan_pushes_range_filter(idx):
    """The term-dictionary expansion must reach parquet as a pushed range
    predicate, not a post-scan filter."""
    hi = "s" + "\U0010ffff"
    plan = (
        idx._term_stats.filter((F.col("term") >= "s") & (F.col("term") < hi))
        .select("term")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(term,s)" in plan, plan


def test_prefix_max_expansions_raises(idx):
    with pytest.raises(ValueError, match="expands to"):
        idx.search_prefix("s", k=5, max_expansions=2)
    with pytest.raises(ValueError, match="empty"):
        idx.expand_prefix("")


def test_prefix_no_match_empty(idx):
    assert idx.search_prefix("zzz", k=5).count() == 0


def test_search_fl_requires_stored(idx):
    with pytest.raises(ValueError, match="stored"):
        idx.search(["table"], k=5, fl=["source"])


def test_search_fl_sort_paging(spark, tmp_path):
    d = str(tmp_path / "idx")
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index(docs, d, CFG)
    maint.set_stored_fields(spark, d, docs.select("doc_id", "source", "lang"), tag="t1")
    engine = InvertedIndex(spark, d)
    full = [tuple(r) for r in engine.search(["table"], k=20, mode="and", sort="source asc").collect()]
    page2 = [tuple(r) for r in engine.search(["table"], k=5, mode="and", sort="source asc", offset=5).collect()]
    assert page2 == full[5:10]
    # fl joins stored columns onto the scored top-k without changing ranks
    plain = [r["doc_id"] for r in engine.search(["table", "join"], k=8).collect()]
    with_fl = engine.search(["table", "join"], k=8, fl=["lang"]).collect()
    assert [r["doc_id"] for r in with_fl] == plain
    assert all(r["lang"] is not None for r in with_fl)
    with pytest.raises(ValueError, match="direction"):
        engine.search(["table"], k=5, sort="source sideways")


# ---- fielded prefix (wildcard) clauses ----------------------------------


def test_fielded_prefix_parse():
    clauses, mode = parse_fielded_clauses("lang:en AND text:tab*")
    assert clauses[1].prefix and clauses[1].toks == ["tab"] and not clauses[1].group
    assert mode == "and"
    clauses, _ = parse_fielded_clauses("text:x AND -text:tab*")
    assert clauses[1].neg and clauses[1].prefix
    with pytest.raises(ValueError, match="single-token"):
        parse_fielded_clauses("text:a-b*")  # 'a-b' tokenizes to two tokens


def test_fielded_prefix_equals_expanded_group(spark, fidx):
    terms = fidx.expand_prefix("text", "s")
    assert len(terms) > 1  # non-degenerate expansion
    q_pref = "lang:en AND text:s*"
    q_grp = f"lang:en AND text:({' '.join(terms)})"
    dist = [tuple(r) for r in fidx.search(q_pref, k=10).collect()]
    grp = [tuple(r) for r in fidx.search(q_grp, k=10).collect()]
    assert dist == grp and len(dist) > 0
    assert fidx.open_local().search(q_pref, k=10) == dist


def test_fielded_neg_prefix_excludes(spark, fidx):
    q = "text:table AND -text:wind*"
    dist = [tuple(r) for r in fidx.search(q, k=100).collect()]
    assert fidx.open_local().search(q, k=100) == dist
    assert len(dist) > 0
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    wind = {
        r["doc_id"]
        for r in docs.filter(
            F.exists(tokenize_expr("text"), lambda t: t.startswith("wind"))
        ).collect()
    }
    assert wind and not ({d for d, _ in dist} & wind)


def test_fielded_prefix_no_match_empty(fidx):
    # required wildcard group with an empty expansion matches nothing
    assert fidx.search("text:table AND text:qqqzzz*", k=10).count() == 0
    assert fidx.open_local().search("text:table AND text:qqqzzz*", k=10) == []


def test_fielded_prefix_field_scoped(fidx):
    # expansion is scoped to the FIELD dictionary: 'src' terms live in
    # source, not lang
    assert fidx.expand_prefix("lang", "src") == []
    assert len(fidx.expand_prefix("source", "src")) > 0


# ---- flat-engine wildcard clauses ---------------------------------------


def test_parse_boolean_wildcard_preserved():
    groups, negs = parse_boolean_query("table s* -(foo ba*)")
    assert groups == [["table"], ["s*"]]
    assert negs == [["ba*", "foo"]]


def test_boolean_wildcard_equals_expanded(spark, idx):
    terms = idx.expand_prefix("s")
    assert len(terms) > 1
    q = "table s*"
    q_exp = "table (" + " ".join(terms) + ")"
    dist = [tuple(r) for r in idx.search_boolean(q, k=10).collect()]
    exp = [tuple(r) for r in idx.search_boolean(q_exp, k=10).collect()]
    assert dist == exp and len(dist) > 0
    assert idx.open_local().search_boolean(q, k=10) == dist


def test_boolean_neg_wildcard_excludes(spark, idx):
    q = "table -wind*"
    dist = [tuple(r) for r in idx.search_boolean(q, k=200).collect()]
    assert idx.open_local().search_boolean(q, k=200) == dist
    assert len(dist) > 0
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    wind = {
        r["doc_id"]
        for r in docs.filter(
            F.exists(tokenize_expr("text"), lambda t: t.startswith("wind"))
        ).collect()
    }
    assert wind and not ({d for d, _ in dist} & wind)


def test_boolean_wildcard_no_match_empty(spark, idx):
    # a REQUIRED wildcard with an empty expansion is provably empty
    assert idx.search_boolean("table qqqzzz*", k=10).count() == 0
    assert idx.open_local().search_boolean("table qqqzzz*", k=10) == []
    # ... while an empty NEG expansion constrains nothing
    base = [tuple(r) for r in idx.search_boolean("table", k=10).collect()]
    neg = [tuple(r) for r in idx.search_boolean("table -qqqzzz*", k=10).collect()]
    assert base == neg


def test_delete_by_query_wildcard(spark, tmp_path):
    import shutil

    d = str(tmp_path / "delw_idx")
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index(docs, d, CFG)
    engine = InvertedIndex(spark, d)
    victims = {r["doc_id"] for r in engine.match_ids_boolean("table wind*").collect()}
    assert victims
    maint.delete_by_query(spark, d, "table wind*", mode="boolean", tag="delw")
    live = {r["doc_id"] for r in InvertedIndex(spark, d).match_ids(["table"], mode="and").collect()}
    assert not (live & victims)
    shutil.rmtree(d, ignore_errors=True)


def test_fielded_prefix_plan_pushes_tagged_range(fidx):
    # the tagged-dictionary range scan (field\x00prefix .. +U+10FFFF) must
    # reach the parquet reader as pushed predicates, same as the flat engine
    from goobi_viewer_indexer_spark.operators.spimi import tag_term

    tag = tag_term("text", "s")
    plan = (
        fidx._term_stats.filter(
            (F.col("term") >= tag) & (F.col("term") < tag + "\U0010ffff")
        )
        .select("term")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(term," in plan, plan


def test_search_grouped_matches_window_twin(spark, tmp_path):
    """search_grouped == windowing the total-recall scorer by hand."""
    from pyspark.sql.window import Window

    d = str(tmp_path / "grp_idx")
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index(docs, d, CFG)
    maint.set_stored_fields(spark, d, docs.select("doc_id", "source"), tag="t1")
    engine = InvertedIndex(spark, d)
    got = engine.search_grouped(["table", "join"], "source", k_groups=5, docs_per_group=2, mode="and").collect()
    # shape: <=5 groups, <=2 docs each
    by_grp: dict = {}
    for r in got:
        by_grp.setdefault(r["source"], []).append(r)
    assert 0 < len(by_grp) <= 5 and all(len(v) <= 2 for v in by_grp.values())
    # twin: window over score_matches joined to the group column
    j = engine.score_matches(["table", "join"], mode="and").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    wd = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("doc_id"))
    top_docs = j.withColumn("_dr", F.row_number().over(wd)).filter(F.col("_dr") <= 2)
    gtop = (
        j.groupBy("source").agg(F.max("score").alias("g"))
        .withColumn("_gr", F.row_number().over(Window.orderBy(F.desc("g"), F.asc("source"))))
        .filter(F.col("_gr") <= 5)
    )
    exp = {
        (r["source"], r["doc_id"], round(r["score"], 6))
        for r in top_docs.join(gtop, "source").collect()
    }
    assert {(r["source"], r["doc_id"], r["score"]) for r in got} == exp
    # the scorer is genuinely total-recall: matches == match_ids
    ids = {r["doc_id"] for r in engine.match_ids(["table", "join"], mode="and").collect()}
    assert {r["doc_id"] for r in engine.score_matches(["table", "join"], mode="and").collect()} == ids


def test_search_grouped_requires_stored(spark, tmp_path):
    d = str(tmp_path / "grp_nostored")
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index(docs, d, CFG)
    with pytest.raises(ValueError, match="stored"):
        InvertedIndex(spark, d).search_grouped(["table"], "source")


def test_flat_search_many_boolean_mode(spark, idx):
    qs = {
        "a": ("table join -spark", "boolean", 10),
        "b": ("(spark window) value", "boolean", 10),
        "c": ("table s*", "boolean", 10),
        "d": (["table", "join"], "and", 5),     # plain modes unaffected
        "e": ("table zzzneverever", "boolean", 5),  # provably empty
    }
    got = idx.search_many(qs)
    for qid in ("a", "b", "c"):
        exp = [tuple(r) for r in idx.search_boolean(qs[qid][0], k=qs[qid][2]).collect()]
        assert got[qid] == exp, qid
    exp_d = [tuple(r) for r in idx.search(["table", "join"], k=5, mode="and").collect()]
    assert got["d"] == exp_d
    assert got["e"] == []


# ---- fuzzy (term~1) -----------------------------------------------------


def test_edits1_construction():
    from goobi_viewer_indexer_spark.operators.search import _edits1

    e = _edits1("ab")
    assert {"ab", "b", "a", "ab1", "zb", "az", "xab", "abx"} <= e
    # every member really is at Levenshtein distance <= 1
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]
    assert all(lev("ab", x) <= 1 for x in e)
    # completeness spot-check: all single-char deletions/substitutions present
    assert len(_edits1("table")) == len({"table"} | {
        "table"[:i] + "table"[i + 1:] for i in range(5)
    } | {
        "table"[:i] + c + "table"[i + 1:] for i in range(5) for c in "abcdefghijklmnopqrstuvwxyz0123456789"
    } | {
        "table"[:i] + c + "table"[i:] for i in range(6) for c in "abcdefghijklmnopqrstuvwxyz0123456789"
    })


def test_fuzzy_expansion_matches_levenshtein_truth(spark, idx):
    import duckdb

    got = idx.expand_fuzzy("tabl")
    con = duckdb.connect()
    exp = {
        r[0]
        for r in con.execute(
            "SELECT DISTINCT term FROM (SELECT unnest("
            "list_filter(string_split_regex(lower(coalesce(text,'')), '[^a-z0-9]+'), x -> x <> '')"
            ") AS term FROM read_parquet(?)) WHERE levenshtein(term, 'tabl') <= 1",
            [f"{SF001}/documents.parquet"],
        ).fetchall()
    }
    assert set(got) == exp and got
    # rank identity with the expanded OR query
    a = [tuple(r) for r in idx.search_fuzzy("tabl", k=10).collect()]
    b = [tuple(r) for r in idx.search(got, k=10, mode="or").collect()]
    assert a == b and a


def test_fuzzy_guards(idx):
    with pytest.raises(ValueError, match="max_edits"):
        idx.expand_fuzzy("table", max_edits=2)
    with pytest.raises(ValueError, match="expands to"):
        idx.expand_fuzzy("table", max_expansions=0)


def test_fielded_fuzzy_equals_expanded_group(spark, fidx):
    terms = fidx.expand_fuzzy("text", "tabl")
    assert "table" in terms
    q = "lang:en AND text:tabl~"
    q_grp = f"lang:en AND text:({' '.join(terms)})"
    dist = [tuple(r) for r in fidx.search(q, k=10).collect()]
    grp = [tuple(r) for r in fidx.search(q_grp, k=10).collect()]
    assert dist == grp and len(dist) > 0
    assert fidx.open_local().search(q, k=10) == dist
    # ~1 suffix and batched form agree too
    assert [tuple(r) for r in fidx.search("lang:en AND text:tabl~1", k=10).collect()] == dist
    assert fidx.search_many({"f": (q, "and", 10)})["f"] == dist
    # field scoping: 'tabl' edits live in text's dictionary, not lang's
    assert fidx.expand_fuzzy("lang", "tabl") == []


# ---- cursor (deep) paging ----------------------------------------------


def test_cursor_pages_cover_full_ranking(spark, idx):
    """Walking pages via after= reproduces the full ranking exactly —
    every page, not just page 2 — and agrees with the local searcher."""
    full = [tuple(r) for r in idx.search(["table", "join"], k=50, mode="or").collect()]
    assert len(full) == 50
    pages, cursor = [], None
    for _ in range(5):
        page = [tuple(r) for r in idx.search(["table", "join"], k=10, mode="or", after=cursor).collect()]
        assert idx.open_local().search(["table", "join"], k=10, mode="or", after=cursor) == page
        pages.extend(page)
        cursor = (page[-1][1], page[-1][0])  # (score, doc_id) of the last row
    assert pages == full
    # AND mode too
    fa = [tuple(r) for r in idx.search(["table", "join"], k=20, mode="and").collect()]
    p1 = [tuple(r) for r in idx.search(["table", "join"], k=10, mode="and").collect()]
    p2 = [tuple(r) for r in idx.search(["table", "join"], k=10, mode="and", after=(p1[-1][1], p1[-1][0])).collect()]
    assert p1 + p2 == fa


def test_cursor_guards(idx):
    with pytest.raises(ValueError, match="cursor"):
        idx.search(["table"], k=5, mode="phrase", after=(1.0, 3))
    with pytest.raises(ValueError, match="cursor"):
        idx.search(["table"], k=5, offset=5, after=(1.0, 3))


def test_field_stats_and_multikey_sort(spark, tmp_path):
    d = str(tmp_path / "stats_idx")
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index(docs, d, CFG)
    maint.set_stored_fields(spark, d, docs.select("doc_id", "source", "lang"), tag="t1")
    engine = InvertedIndex(spark, d)
    dims = docs.select("doc_id", F.size(tokenize_expr("text")).alias("doclen"))
    row = engine.field_stats(["table"], dims, "doclen", mode="and").collect()[0]
    # twin via plain DataFrame ops
    ids = {r["doc_id"] for r in engine.match_ids(["table"], mode="and").collect()}
    truth = dims.filter(F.col("doc_id").isin(list(ids))).agg(
        F.count("*"), F.min("doclen"), F.max("doclen"), F.sum("doclen"), F.round(F.avg("doclen"), 6)
    ).collect()[0]
    assert (row["n"], row["min"], row["max"], row["sum"], row["mean"]) == tuple(truth)
    # multi-key sort: secondary key breaks ties of the first
    got = engine.search(["table"], k=30, mode="and", fl=["lang", "source"], sort="lang asc, source desc").collect()
    keys = [[r["lang"], r["source"], r["doc_id"]] for r in got]
    import pandas as pd

    exp = (
        pd.DataFrame(keys, columns=["lang", "source", "doc_id"])
        .sort_values(["lang", "source", "doc_id"], ascending=[True, False, True])
        .values.tolist()
    )
    assert keys == exp
    # the full match set respects the window too (first key really orders)
    assert [k[0] for k in keys] == sorted(k[0] for k in keys)


def test_field_stats_facet_missing_stddev(spark, tmp_path):
    """stats.facet breakdown + missing/stddev (round 5b): per-facet-value
    sample stddev against a python twin; null stats values count as
    missing; a single-value bucket gets stddev NULL; null facet keys ''."""
    import math

    d = str(tmp_path / "stats_facet_idx")
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index(docs, d, CFG)
    engine = InvertedIndex(spark, d)
    # doclen is NULL for doc_id % 7 == 0, facet NULL for doc_id % 11 == 0
    dims = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 != 0, F.size(tokenize_expr("text"))).alias("doclen"),
        F.when(F.col("doc_id") % 11 != 0, F.col("lang")).alias("lang"),
    )
    rows = {
        r["facet"]: r
        for r in engine.field_stats(["table"], dims, "doclen", mode="and", facet_col="lang").collect()
    }
    ids = {r["doc_id"] for r in engine.match_ids(["table"], mode="and").collect()}
    by_facet: dict[str, list] = {}
    missing: dict[str, int] = {}
    for r in dims.collect():
        if r["doc_id"] not in ids:
            continue
        f = r["lang"] if r["lang"] is not None else ""
        if r["doclen"] is None:
            missing[f] = missing.get(f, 0) + 1
            by_facet.setdefault(f, [])
        else:
            by_facet.setdefault(f, []).append(r["doclen"])
    assert set(rows) == set(by_facet)
    assert "" in rows  # null facet keys under ''
    for f, vals in by_facet.items():
        r = rows[f]
        assert r["n"] == len(vals) + missing.get(f, 0)
        assert r["missing"] == missing.get(f, 0)
        if len(vals) > 1:
            m = sum(vals) / len(vals)
            sd = math.sqrt(
                (sum(float(v) * float(v) for v in vals) - float(sum(vals)) * float(sum(vals)) / len(vals))
                / (len(vals) - 1)
            )
            assert abs(r["stddev"] - round(sd, 6)) < 2e-6, (f, r["stddev"], sd)
            assert r["sum"] == sum(vals) and r["min"] == min(vals) and r["max"] == max(vals)
        elif len(vals) <= 1:
            assert r["stddev"] is None or len(vals) == 1 and r["stddev"] is None


def test_field_stats_single_value_stddev_null(spark, tmp_path):
    d = str(tmp_path / "stats_one_idx")
    docs = spark.read.parquet(f"{SF001}/documents.parquet").limit(60)
    build_index(docs, d, CFG)
    engine = InvertedIndex(spark, d)
    # one doc only carries a value
    dims = docs.select(
        "doc_id", F.when(F.col("doc_id") == 1, F.lit(42)).alias("v")
    )
    # global stats over a query matching many docs but with exactly one
    # non-null value: stddev NULL, missing = n - 1
    r = engine.field_stats(["the"], dims, "v", mode="or").collect()[0]
    assert r["stddev"] is None
    assert r["missing"] == r["n"] - (1 if r["sum"] is not None else 0)


def test_field_stats_percentiles_exact(spark, tmp_path):
    """stats.percentiles (round 5b): EXACT linear-interpolated quantiles
    against numpy's definition (matching Spark `percentile` and DuckDB
    quantile_cont), global and per facet value."""
    import numpy as np

    d = str(tmp_path / "stats_pct_idx")
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    build_index(docs, d, CFG)
    engine = InvertedIndex(spark, d)
    dims = docs.select("doc_id", F.size(tokenize_expr("text")).alias("doclen"), "lang")
    pct = [0.25, 0.5, 0.9]
    row = engine.field_stats(["table"], dims, "doclen", mode="and", percentiles=pct).collect()[0]
    ids = {r["doc_id"] for r in engine.match_ids(["table"], mode="and").collect()}
    vals = [r["doclen"] for r in dims.collect() if r["doc_id"] in ids]
    want = [round(float(np.percentile(vals, q * 100)), 6) for q in pct]
    assert list(row["percentiles"]) == want and len(vals) > 2
    # facet breakdown carries per-bucket percentiles
    rows = {r["facet"]: r["percentiles"] for r in engine.field_stats(
        ["table"], dims, "doclen", mode="and", facet_col="lang", percentiles=pct).collect()}
    by = {}
    for r in dims.collect():
        if r["doc_id"] in ids:
            by.setdefault(r["lang"] or "", []).append(r["doclen"])
    for f, v in by.items():
        assert list(rows[f]) == [round(float(np.percentile(v, q * 100)), 6) for q in pct], f
