"""Driver-contract query suite: every implemented operator from
SURVEY.md §2 exposed as a (spark, sf_dir) -> DataFrame callable plus a
DuckDB-equivalent oracle SQL string.

Column names are aliased identically on both sides (the driver's compare
sorts columns by name and hashes values).  Floating aggregates are rounded
on both sides to absorb summation-order noise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr, duckdb_tokenize_sql
from goobi_viewer_indexer_spark.operators import (
    dedup,
    hierarchy,
    highlight,
    naive_bm25,
    similarity,
    stats,
    text_analysis,
)

CFG = IndexConfig()
# small-corpus index layout for the engine-backed entries (the driver gate
# runs at sf0.01 = 500 docs)
IDX_CFG = IndexConfig(docs_per_segment=128, merge_fanin=4, postings_buckets=16, compact_below_bytes=1024)

_INDEX_CACHE: dict[str, object] = {}


def _index_for(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir per process) the real SPIMI index over the
    documents table and return an InvertedIndex handle."""
    import hashlib
    import tempfile

    from goobi_viewer_indexer_spark.operators.search import InvertedIndex
    from goobi_viewer_indexer_spark.plans.build import build_index

    key = sf_dir.rstrip("/")
    if key not in _INDEX_CACHE:
        # v2: positional postings — version the on-disk cache so an index
        # built by an older layout is never reused
        tag = hashlib.md5(f"v2:{key}".encode()).hexdigest()[:10]
        d = f"{tempfile.gettempdir()}/gvi_suite_index_{tag}"
        docs = spark.read.parquet(f"{key}/documents.parquet")
        build_index(docs, d, IDX_CFG, id_col="doc_id", text_col="text")
        _INDEX_CACHE[key] = InvertedIndex(spark, d)
    return _INDEX_CACHE[key]

# Query-term sets chosen from the synthetic vocabulary (TESTDATA documents
# table): mixed common/rare terms exercising the FIXTURES.md §3 shapes.
Q_COMMON2 = ["table", "join"]
Q_MIXED3 = ["spark", "window", "value"]
Q_MISSING = ["zzzznotexist", "table"]
Q_COMMON_AND = ["table", "join"]
Q_STOPWORD = ["the"]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------
_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import goobi_viewer_indexer_spark.relational  # noqa: F401  (registers)

    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    import goobi_viewer_indexer_spark.relational  # noqa: F401  (registers)

    return dict(_ORACLES)


# --------------------------------------------------------------------------
# §2-B Q7/Q8 — fulltext BM25 top-k (the flagship; naive DataFrame plan)
# --------------------------------------------------------------------------
@register("bm25_disjunctive_topk", naive_bm25.bm25_topk_sql(Q_MIXED3, k=10, mode="or"))
def q_bm25_or(spark, sf_dir):
    return naive_bm25.bm25_topk(_load(spark, sf_dir, "documents"), Q_MIXED3, k=10, mode="or")


@register("bm25_conjunctive_topk", naive_bm25.bm25_topk_sql(Q_COMMON_AND, k=10, mode="and"))
def q_bm25_and(spark, sf_dir):
    return naive_bm25.bm25_topk(_load(spark, sf_dir, "documents"), Q_COMMON_AND, k=10, mode="and")


@register("bm25_missing_term", naive_bm25.bm25_topk_sql(Q_MISSING, k=10, mode="or"))
def q_bm25_missing(spark, sf_dir):
    return naive_bm25.bm25_topk(_load(spark, sf_dir, "documents"), Q_MISSING, k=10, mode="or")


@register("bm25_stopword_term", naive_bm25.bm25_topk_sql(Q_STOPWORD, k=20, mode="or"))
def q_bm25_stopword(spark, sf_dir):
    return naive_bm25.bm25_topk(_load(spark, sf_dir, "documents"), Q_STOPWORD, k=20, mode="or")


# --------------------------------------------------------------------------
# §2-B Q7 via the REAL engine: SPIMI index + block-max WAND, under the same
# DuckDB oracle as the naive scorer (rank-identity through the full stack)
# --------------------------------------------------------------------------
@register("bm25_wand_disjunctive", naive_bm25.bm25_topk_sql(Q_MIXED3, k=10, mode="or"))
def q_wand_or(spark, sf_dir):
    return _index_for(spark, sf_dir).search(Q_MIXED3, k=10, mode="or")


@register("bm25_wand_conjunctive", naive_bm25.bm25_topk_sql(Q_COMMON_AND, k=10, mode="and"))
def q_wand_and(spark, sf_dir):
    return _index_for(spark, sf_dir).search(Q_COMMON_AND, k=10, mode="and")


@register("bm25_wand_stopword", naive_bm25.bm25_topk_sql(Q_STOPWORD, k=20, mode="or"))
def q_wand_stopword(spark, sf_dir):
    return _index_for(spark, sf_dir).search(Q_STOPWORD, k=20, mode="or")


# --------------------------------------------------------------------------
# phrase queries (positional postings): naive twin + the real engine under
# ONE oracle — quoted-phrase capability the reference gets from Solr's
# positional text fields (helper/FulltextAugmentor.java:78-238)
# --------------------------------------------------------------------------
PHRASE_2GRAM = ["spark", "window"]          # ~30 matching docs at sf0.01
PHRASE_3GRAM = ["table", "join", "spark"]   # exactly 1 matching doc
PHRASE_DUP = ["value", "value"]             # duplicate-term phrase
PHRASE_MISSING = ["scan", "a", "scan"]      # terms exist, phrase never occurs


@register("bm25_phrase_naive", naive_bm25.bm25_phrase_topk_sql(PHRASE_2GRAM, k=10))
def q_phrase_naive(spark, sf_dir):
    return naive_bm25.bm25_phrase_topk(_load(spark, sf_dir, "documents"), PHRASE_2GRAM, k=10)


@register("bm25_wand_phrase", naive_bm25.bm25_phrase_topk_sql(PHRASE_2GRAM, k=10))
def q_wand_phrase(spark, sf_dir):
    return _index_for(spark, sf_dir).search_phrase(PHRASE_2GRAM, k=10)


@register("bm25_wand_phrase_trigram", naive_bm25.bm25_phrase_topk_sql(PHRASE_3GRAM, k=10))
def q_wand_phrase_trigram(spark, sf_dir):
    return _index_for(spark, sf_dir).search_phrase(PHRASE_3GRAM, k=10)


@register("bm25_wand_phrase_dup", naive_bm25.bm25_phrase_topk_sql(PHRASE_DUP, k=10))
def q_wand_phrase_dup(spark, sf_dir):
    return _index_for(spark, sf_dir).search_phrase(PHRASE_DUP, k=10)


@register("bm25_wand_phrase_missing", naive_bm25.bm25_phrase_topk_sql(PHRASE_MISSING, k=10))
def q_wand_phrase_missing(spark, sf_dir):
    return _index_for(spark, sf_dir).search_phrase(PHRASE_MISSING, k=10)


# --------------------------------------------------------------------------
# facet counts + pagination (Solr facet.field / start-rows — the viewer's
# drill-down sidebar and result paging, helper/SolrSearchIndex.java)
# --------------------------------------------------------------------------
@register(
    "facet_source_counts",
    f"""
SELECT source, count(*) AS n
FROM documents
WHERE list_contains({duckdb_tokenize_sql('text')}, 'table')
  AND list_contains({duckdb_tokenize_sql('text')}, 'join')
GROUP BY source HAVING count(*) >= 2
ORDER BY n DESC, source ASC
""".strip(),
)
def q_facet_source(spark, sf_dir):
    idx = _index_for(spark, sf_dir)
    dims = _load(spark, sf_dir, "documents").select("doc_id", "source")
    return idx.facet_counts(["table", "join"], dims, "source", mode="and", min_count=2)


@register(
    "facet_prefix_limit",
    f"""
SELECT source, count(*) AS n
FROM documents
WHERE list_contains({duckdb_tokenize_sql('text')}, 'table')
  AND source LIKE 'src1%'
GROUP BY source
ORDER BY n DESC, source ASC
LIMIT 5
""".strip(),
)
def q_facet_prefix(spark, sf_dir):
    # Solr facet.prefix + facet.limit: prefix filters before the join,
    # limit truncates the count-ordered list.  LIMIT is deterministic here
    # because (n desc, source asc) is a total order.
    idx = _index_for(spark, sf_dir)
    dims = _load(spark, sf_dir, "documents").select("doc_id", "source")
    return idx.facet_counts(["table"], dims, "source", mode="and", prefix="src1", limit=5)


@register("fn_snippets_highlight", highlight.snippets_sql(["spark", "window"], width=3))
def q_snippets(spark, sf_dir):
    # Solr highlighting analog: ±3-token window around the first match
    return highlight.snippets(_load(spark, sf_dir, "documents"), ["spark", "window"], width=3)


@register(
    "bm25_page2_offset",
    naive_bm25.bm25_topk_sql(Q_MIXED3, k=20, mode="or").replace("LIMIT 20", "LIMIT 10 OFFSET 10"),
)
def q_bm25_page2(spark, sf_dir):
    # Solr start=10&rows=10 over the same ranking
    return _index_for(spark, sf_dir).search(Q_MIXED3, k=10, mode="or", offset=10)


# --------------------------------------------------------------------------
# boolean queries: NOT (prohibited clauses) + AND-of-OR-groups — the
# reference's own generated negated shape `+(URN:(v1 v2)) -PI_TOPSTRUCT:"x"`
# (helper/SolrSearchIndex.java:918-921)
# --------------------------------------------------------------------------
@register("bm25_not_clause", naive_bm25.bm25_boolean_topk_sql([["table"], ["join"]], [["spark"]], k=10))
def q_bool_not(spark, sf_dir):
    return _index_for(spark, sf_dir).search_boolean("table join -spark", k=10)


@register(
    "bm25_or_groups_not",
    naive_bm25.bm25_boolean_topk_sql([["spark", "window"], ["value"]], [["join"]], k=10),
)
def q_bool_groups(spark, sf_dir):
    return _index_for(spark, sf_dir).search_boolean("(spark window) value -join", k=10)


@register("bm25_boolean_wildcard", naive_bm25.bm25_boolean_wildcard_sql("table", "s", k=10))
def q_bool_wildcard(spark, sf_dir):
    # 'table s*': the wildcard expands from the term dictionary into its
    # OR-group (each term its own idf), AND-ed with 'table'
    return _index_for(spark, sf_dir).search_boolean("table s*", k=10)


# --------------------------------------------------------------------------
# fl stored-field projection + field sort — the reference's read contract:
# every query passes fl (Indexer.java:382-388) and the indexer writes SORT_
# twins for field ordering (helper/MetadataHelper.java:905-931)
# --------------------------------------------------------------------------
def _stored_index_for(spark, sf_dir):
    """Suite index with stored fields (source, lang) populated once."""
    idx = _index_for(spark, sf_dir)
    key = "stored:" + sf_dir.rstrip("/")
    if key not in _INDEX_CACHE:
        from goobi_viewer_indexer_spark.plans.maintenance import set_stored_fields

        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        # fixed tag: replays (same disk-cached index across driver runs) no-op
        set_stored_fields(spark, idx.dir, docs.select("doc_id", "source", "lang"), tag="suite_stored_v1")
        _INDEX_CACHE[key] = True
    return idx


@register(
    "q_search_fl_sort",
    f"""
SELECT doc_id, source, lang FROM documents
WHERE list_contains({duckdb_tokenize_sql('text')}, 'table')
  AND list_contains({duckdb_tokenize_sql('text')}, 'join')
ORDER BY source ASC, doc_id ASC LIMIT 15
""".strip(),
)
def q_fl_sort(spark, sf_dir):
    # sort="SORT_X asc" analog: match scan → join stored → orderBy → limit
    return _stored_index_for(spark, sf_dir).search(
        ["table", "join"], k=15, mode="and", fl=["source", "lang"], sort="source asc"
    )


@register(
    "q_search_fl_projection",
    f"""
WITH base AS ({naive_bm25.bm25_topk_sql(Q_MIXED3, k=10, mode="or")})
SELECT b.doc_id, b.score, d.source
FROM base b JOIN documents d USING (doc_id)
ORDER BY b.score DESC, b.doc_id ASC
""".strip(),
)
def q_fl_projection(spark, sf_dir):
    # fl on a scored search: top-k first, stored fields joined after
    return _stored_index_for(spark, sf_dir).search(Q_MIXED3, k=10, mode="or", fl=["source"])


@register(
    "q_search_grouped",
    naive_bm25.bm25_grouped_sql(["table", "join"], "source", k_groups=5, docs_per_group=2, mode="and"),
)
def q_grouped(spark, sf_dir):
    # Solr result grouping (group.field): top-5 groups by best score, top-2
    # docs each — the viewer's collapse-by-PI_TOPSTRUCT shape
    return _stored_index_for(spark, sf_dir).search_grouped(
        ["table", "join"], "source", k_groups=5, docs_per_group=2, mode="and"
    )


@register(
    "bm25_cursor_page2",
    f"""
WITH base AS ({naive_bm25.bm25_topk_sql(Q_MIXED3, k=1000000, mode="or")}),
cur AS (SELECT score AS s0, doc_id AS d0 FROM base ORDER BY score DESC, doc_id ASC LIMIT 1 OFFSET 9)
SELECT b.doc_id, b.score
FROM base b, cur
WHERE b.score < cur.s0 OR (b.score = cur.s0 AND b.doc_id > cur.d0)
ORDER BY b.score DESC, b.doc_id ASC LIMIT 10
""".strip(),
)
def q_cursor_page2(spark, sf_dir):
    """cursorMark deep paging: page 2 fetched by feeding back page 1's last
    (score, doc_id) — the cursor predicate filters INSIDE the kernels, so
    deep pages never pay the offset+k fetch."""
    idx = _index_for(spark, sf_dir)
    page1 = idx.search(Q_MIXED3, k=10, mode="or").collect()
    last = page1[-1]
    return idx.search(Q_MIXED3, k=10, mode="or", after=(last["score"], last["doc_id"]))


@register("bm25_fuzzy_or", naive_bm25.bm25_fuzzy_topk_sql("tabl", k=10))
def q_fuzzy(spark, sf_dir):
    # Solr term~1: the misspelling 'tabl' reaches 'table'/'label'/... via
    # generated ed<=1 probes (bucket-pruned exact lookups, no dictionary
    # scan), then the ordinary per-term-idf OR scorer
    return _index_for(spark, sf_dir).search_fuzzy("tabl", k=10)


@register(
    "q_field_stats",
    f"""
SELECT CAST(count(*) AS BIGINT) AS n,
       min(len({duckdb_tokenize_sql('text')})) AS min,
       max(len({duckdb_tokenize_sql('text')})) AS max,
       CAST(sum(len({duckdb_tokenize_sql('text')})) AS BIGINT) AS sum,
       round(avg(len({duckdb_tokenize_sql('text')})), 6) AS mean
FROM documents
WHERE list_contains({duckdb_tokenize_sql('text')}, 'table')
  AND list_contains({duckdb_tokenize_sql('text')}, 'join')
""".strip(),
)
def q_field_stats(spark, sf_dir):
    # Solr StatsComponent (stats.field): numeric aggregates over the match
    # set — here doclen over docs matching table AND join
    idx = _index_for(spark, sf_dir)
    dims = _load(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokenize_expr("text")).alias("doclen")
    )
    return idx.field_stats(["table", "join"], dims, "doclen", mode="and")


@register(
    "q_search_sort_multikey",
    f"""
SELECT doc_id, lang, source FROM documents
WHERE list_contains({duckdb_tokenize_sql('text')}, 'table')
  AND list_contains({duckdb_tokenize_sql('text')}, 'join')
ORDER BY lang ASC, source DESC, doc_id ASC LIMIT 12
""".strip(),
)
def q_sort_multikey(spark, sf_dir):
    # Solr multi-key field sort: 'lang asc, source desc' with doc_id tiebreak
    return _stored_index_for(spark, sf_dir).search(
        ["table", "join"], k=12, mode="and", fl=["lang", "source"],
        sort="lang asc, source desc",
    )


@register("bm25_prefix_or", naive_bm25.bm25_prefix_topk_sql("s", k=10))
def q_prefix(spark, sf_dir):
    # wildcard s* → {scan, slow, stream, small, sort, spark} at sf0.01:
    # term-dictionary range scan, then the ordinary OR scorer
    return _index_for(spark, sf_dir).search_prefix("s", k=10)


@register(
    "delete_by_query_not",
    f"""
SELECT doc_id FROM documents
WHERE list_contains({duckdb_tokenize_sql('text')}, 'table')
  AND list_contains({duckdb_tokenize_sql('text')}, 'spark')
ORDER BY doc_id
""".strip(),
)
def q_delq_not(spark, sf_dir):
    """End-to-end NOT-capable delete-by-query: on a scratch index, delete
    docs matching ``table -spark``; the live matches of 'table' must then be
    exactly the table∧spark docs (which the oracle computes directly)."""
    import tempfile

    from goobi_viewer_indexer_spark.operators.search import InvertedIndex
    from goobi_viewer_indexer_spark.plans import maintenance
    from goobi_viewer_indexer_spark.plans.build import build_index

    key = "delq:" + sf_dir.rstrip("/")
    if key not in _INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="gvi_delq_")
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        build_index(docs, d, IDX_CFG)
        maintenance.delete_by_query(spark, d, "table -spark", mode="boolean")
        _INDEX_CACHE[key] = InvertedIndex(spark, d)
    return _INDEX_CACHE[key].match_ids(["table"], mode="and").orderBy("doc_id")


# --------------------------------------------------------------------------
# multi-field index (DEFAULT/FULLTEXT analog): field-scoped BM25F-lite —
# every reference §2-B query is field-scoped (model/SolrConstants.java)
# --------------------------------------------------------------------------
SUITE_FIELDS = {"text": "text", "source": "source", "lang": "lang"}


def _fielded_index_for(spark, sf_dir):
    import hashlib
    import tempfile

    from goobi_viewer_indexer_spark.operators.search import FieldedIndex
    from goobi_viewer_indexer_spark.plans.build import build_index_fielded

    key = "fielded:" + sf_dir.rstrip("/")
    if key not in _INDEX_CACHE:
        tag = hashlib.md5(f"v2:{key}".encode()).hexdigest()[:10]
        d = f"{tempfile.gettempdir()}/gvi_suite_findex_{tag}"
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        build_index_fielded(docs, d, SUITE_FIELDS, IDX_CFG)
        _INDEX_CACHE[key] = FieldedIndex(spark, d)
    return _INDEX_CACHE[key]


def _fielded_stored_index_for(spark, sf_dir):
    """Suite fielded index with stored fields (source, lang) populated once."""
    idx = _fielded_index_for(spark, sf_dir)
    key = "fielded_stored:" + sf_dir.rstrip("/")
    if key not in _INDEX_CACHE:
        from goobi_viewer_indexer_spark.plans.maintenance import set_stored_fields

        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        set_stored_fields(spark, idx.dir, docs.select("doc_id", "source", "lang"), tag="suite_fstored_v1")
        _INDEX_CACHE[key] = True
        # stored() is resolved per call; the cached engine needs no reopen
    return _fielded_index_for(spark, sf_dir)


@register(
    "bm25f_fl_sort_not",
    f"""
SELECT doc_id, source FROM documents
WHERE list_contains({duckdb_tokenize_sql('text')}, 'table')
  AND NOT list_contains({duckdb_tokenize_sql('lang')}, 'de')
ORDER BY source ASC, doc_id ASC LIMIT 15
""".strip(),
)
def q_bm25f_fl_sort(spark, sf_dir):
    # fielded read contract end-to-end: boolean NOT query → match scan →
    # join stored → orderBy SORT_-twin → limit
    return _fielded_stored_index_for(spark, sf_dir).search(
        "text:table AND -lang:de", k=15, fl=["source"], sort="source asc"
    )


F_AND_PAIRS = [("source", "src7"), ("text", "table")]
F_OR_PAIRS = [("text", "spark"), ("lang", "en")]
F_OR_BOOSTS = {"lang": 0.25}


@register("bm25f_fielded_and", naive_bm25.bm25f_topk_sql(F_AND_PAIRS, k=10, mode="and"))
def q_bm25f_and(spark, sf_dir):
    return _fielded_index_for(spark, sf_dir).search(F_AND_PAIRS, k=10, mode="and")


@register("bm25f_fielded_or_boosted", naive_bm25.bm25f_topk_sql(F_OR_PAIRS, k=10, mode="or", boosts=F_OR_BOOSTS))
def q_bm25f_or(spark, sf_dir):
    return _fielded_index_for(spark, sf_dir).search(F_OR_PAIRS, k=10, mode="or", boosts=F_OR_BOOSTS)


@register("bm25f_point_lookup", naive_bm25.bm25f_topk_sql([("source", "src42")], k=5))
def q_bm25f_point(spark, sf_dir):
    # reference Q1 analog (PI:<id> exact lookup), field-scoped
    return _fielded_index_for(spark, sf_dir).search([("source", "src42")], k=5)


@register(
    "bm25f_mixed_term_and_phrase",
    naive_bm25.bm25f_topk_sql(
        [("lang", "en"), ("text", "spark"), ("text", "window")],
        k=10,
        mode="and",
        phrase_filters=[("text", ["spark", "window"])],
    ),
)
def q_bm25f_mixed(spark, sf_dir):
    # the reference's bread-and-butter Solr shape: PI:x AND FULLTEXT:"a b"
    # (15 matching docs at sf0.01)
    return _fielded_index_for(spark, sf_dir).search('lang:en AND text:"spark window"', k=10)


@register(
    "bm25f_not_clause",
    naive_bm25.bm25f_topk_sql([("text", "table")], k=10, neg_filters=[("lang", "de")]),
)
def q_bm25f_not(spark, sf_dir):
    # prohibited clause in the fielded engine: -lang:de filters, never scores
    return _fielded_index_for(spark, sf_dir).search("text:table AND -lang:de", k=10)


@register(
    "bm25f_prefix_and",
    naive_bm25.bm25f_prefix_and_term_sql("text", "s", "lang", "en", k=10),
)
def q_bm25f_prefix(spark, sf_dir):
    # fielded wildcard: text:s* expands from the TAGGED term dictionary
    # (field\x00s range scan) into an OR-group, AND-ed with lang:en; every
    # expanded term scores with its own field-local idf
    return _fielded_index_for(spark, sf_dir).search("lang:en AND text:s*", k=10)


@register(
    "facet_fielded_not",
    f"""
SELECT source, count(*) AS n
FROM documents
WHERE list_contains({duckdb_tokenize_sql('text')}, 'table')
  AND NOT list_contains({duckdb_tokenize_sql('lang')}, 'de')
GROUP BY source HAVING count(*) >= 2
ORDER BY n DESC, source ASC
""".strip(),
)
def q_facet_fielded(spark, sf_dir):
    # facet.field over a FIELDED boolean query (prohibited clause included)
    dims = _load(spark, sf_dir, "documents").select("doc_id", "source")
    return _fielded_index_for(spark, sf_dir).facet_counts(
        "text:table AND -lang:de", dims, "source", min_count=2
    )


@register("bm25f_phrase_field", naive_bm25.bm25_phrase_topk_sql(PHRASE_2GRAM, k=10))
def q_bm25f_phrase(spark, sf_dir):
    # a single-field phrase over the fielded index == the flat-index phrase
    # contract on that field (field-local stats == text-field stats)
    return _fielded_index_for(spark, sf_dir).search_phrase("text", PHRASE_2GRAM, k=10)


# --------------------------------------------------------------------------
# hierarchical inheritance (MetsIndexer.indexAllChildren analog): forest
# synthesized deterministically from documents — 50 roots, chains via
# parent(d) = d-50; Spark resolves roots by pointer doubling (log2(depth)
# joins), DuckDB by recursive CTE
# --------------------------------------------------------------------------
def _doc_tree(spark, sf_dir):
    return (
        _load(spark, sf_dir, "documents")
        .select(
            F.col("doc_id").alias("id"),
            F.when(F.col("doc_id") >= 50, F.col("doc_id") - 50).alias("parent"),
            "source",
        )
    )


_TREE_SQL = (
    "SELECT doc_id AS id, CASE WHEN doc_id >= 50 THEN doc_id - 50 END AS parent, source FROM documents"
)


@register(
    "hierarchy_inherit_fields",
    f"""
WITH RECURSIVE t AS ({_TREE_SQL}),
walk AS (
  SELECT id, 0 AS depth, id AS root_id FROM t WHERE parent IS NULL
  UNION ALL
  SELECT c.id, w.depth + 1, w.root_id
  FROM t c JOIN walk w ON c.parent = w.id
)
SELECT w.id AS doc_id, w.root_id, CAST(w.depth AS BIGINT) AS depth, rt.source AS root_source
FROM walk w JOIN t rt ON rt.id = w.root_id
ORDER BY doc_id
""".strip(),
)
def q_hierarchy_inherit(spark, sf_dir):
    return (
        hierarchy.inherit_down(_doc_tree(spark, sf_dir), ["source"])
        .select(
            F.col("id").alias("doc_id"),
            "root_id",
            F.col("depth").cast("long").alias("depth"),
            "root_source",
        )
        .orderBy("doc_id")
    )


@register(
    "hierarchy_subtree_sizes",
    f"""
WITH RECURSIVE t AS ({_TREE_SQL}),
clo AS (
  SELECT id, parent AS ancestor FROM t WHERE parent IS NOT NULL
  UNION ALL
  SELECT c.id, t2.parent
  FROM clo c JOIN t t2 ON t2.id = c.ancestor AND t2.parent IS NOT NULL
)
SELECT t.id AS doc_id,
       CAST(coalesce((SELECT count(*) FROM clo WHERE clo.ancestor = t.id), 0) AS BIGINT) AS n_descendants
FROM t ORDER BY doc_id
""".strip(),
)
def q_hierarchy_sizes(spark, sf_dir):
    return (
        hierarchy.subtree_sizes(_doc_tree(spark, sf_dir), max_depth=64)
        .select(F.col("id").alias("doc_id"), "n_descendants")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# dedup suite (documents table)
# --------------------------------------------------------------------------
@register("dedup_exact", dedup.EXACT_DUP_SQL)
def q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_load(spark, sf_dir, "documents"))


@register("dedup_minhash_lsh", dedup.minhash_near_duplicates_sql(threshold=0.35))
def q_dedup_minhash(spark, sf_dir):
    return dedup.minhash_near_duplicates(_load(spark, sf_dir, "documents"), threshold=0.35)


@register("dedup_ngram_jaccard", dedup.ngram_jaccard_sql(threshold=0.35))
def q_dedup_ngram_jaccard(spark, sf_dir):
    # EXACT shared-shingle-join Jaccard (no minhash): the standalone n-gram
    # near-dup operator; the banded-LSH path above is the 100 TB variant
    return dedup.ngram_jaccard_pairs(_load(spark, sf_dir, "documents"), threshold=0.35)


@register("dedup_simhash", dedup.simhash_sql())
def q_dedup_simhash(spark, sf_dir):
    return dedup.simhash_fingerprint(_load(spark, sf_dir, "documents"))


@register("dedup_simhash_pairs", dedup.simhash_pairs_sql(max_hamming=3))
def q_dedup_simhash_pairs(spark, sf_dir):
    # radius 3 = the 4×16-bit-chunk pigeonhole guarantee, so the banded
    # self-join EQUALS the all-pairs oracle (12 real pairs at sf0.01).
    return dedup.simhash_candidate_pairs(_load(spark, sf_dir, "documents"), max_hamming=3)


# --------------------------------------------------------------------------
# similarity search (embeddings table)
# --------------------------------------------------------------------------
_ANN_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
         list_dot_product(embedding::DOUBLE[], qv)
           / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
              * sqrt(list_dot_product(qv, qv))) AS c
  FROM embeddings, q WHERE vec_id <> 0
)
SELECT vec_id, round(c, 6) AS cosine FROM s
ORDER BY c DESC, vec_id ASC LIMIT 10
""".strip()


@register("ann_cosine_topk_bruteforce", _ANN_SQL)
def q_ann_brute(spark, sf_dir):
    emb = _load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.cosine_topk_bruteforce(emb, list(qv), k=10, exclude_id=0)


@register("embedding_near_duplicates", similarity.embedding_near_duplicates_sql(threshold=0.9))
def q_emb_neardup(spark, sf_dir):
    return similarity.embedding_near_duplicates(_load(spark, sf_dir, "embeddings"), threshold=0.9)


# --------------------------------------------------------------------------
# text analysis suite (documents table)
# --------------------------------------------------------------------------
@register("text_language_id", text_analysis.LANG_ID_SQL)
def q_lang_id(spark, sf_dir):
    return text_analysis.language_id(_load(spark, sf_dir, "documents"))


@register("text_quality_score", text_analysis.QUALITY_SQL)
def q_quality(spark, sf_dir):
    return text_analysis.quality_score(_load(spark, sf_dir, "documents"))


@register("text_token_counts", text_analysis.TOKEN_COUNTS_SQL)
def q_token_counts(spark, sf_dir):
    return text_analysis.token_counts(_load(spark, sf_dir, "documents"))


@register("text_fingerprint", text_analysis.FINGERPRINT_SQL)
def q_fingerprint(spark, sf_dir):
    return text_analysis.fingerprint(_load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# stats side tables (Solr field-stats analog)
# --------------------------------------------------------------------------
_TOK = duckdb_tokenize_sql("text")

@register(
    "term_stats_top100",
    f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1,2)
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
FROM tf GROUP BY term
ORDER BY df DESC, term ASC LIMIT 100
""".strip(),
)
def q_term_stats(spark, sf_dir):
    return (
        stats.term_stats(_load(spark, sf_dir, "documents"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(100)
    )


@register(
    "doc_stats_sha256",
    f"""
SELECT doc_id, len({_TOK}) AS doclen, sha256(coalesce(text,'')) AS sha256
FROM documents ORDER BY doc_id
""".strip(),
)
def q_doc_stats(spark, sf_dir):
    return stats.doc_stats(_load(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "corpus_avgdl",
    f"""
SELECT count(*) AS n_docs, round(avg(len({_TOK})), 6) AS avgdl
FROM documents
""".strip(),
)
def q_avgdl(spark, sf_dir):
    d = _load(spark, sf_dir, "documents")
    return d.select(F.size(tokenize_expr("text")).alias("dl")).agg(
        F.count("*").alias("n_docs"), F.round(F.avg("dl"), 6).alias("avgdl")
    )
