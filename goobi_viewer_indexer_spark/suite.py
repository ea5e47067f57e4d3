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
from goobi_viewer_indexer_spark.operators import naive_bm25, stats

CFG = IndexConfig()

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
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
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
# stats side tables (Solr field-stats analog)
# --------------------------------------------------------------------------
_TOK = duckdb_tokenize_sql("text")

@register(
    "term_stats_top100",
    f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1,2)
SELECT term, count(*) AS df, sum(tf) AS cf
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
