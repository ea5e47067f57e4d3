"""Naive (pure-DataFrame) BM25 top-k scorer — the correctness reference the
block-max WAND engine must be rank-identical to, and the SQL-expressible
form of reference query shape Q7 (SURVEY.md §2-B: fulltext search over
FULLTEXT/DEFAULT/SUPER* fields, executed by Solr in the reference).

Plan shape (all Catalyst, zero Python):

    documents ─ tokenize ─ explode ─ groupBy(doc,term) tf
        ├─ join broadcast(query_terms)          ← only query terms survive
        ├─ join term_stats (df)  [broadcast]
        ├─ join doc_stats (doclen) — co-keyed on doc_id
        └─ groupBy(doc_id) Σ idf·w  → orderBy(score desc, doc_id) limit k

idf = ln(1 + (N-df+0.5)/(df+0.5))   (Lucene BM25Similarity)
w   = tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))

Scores are rounded to 6 decimals AFTER ordering so cross-engine float
comparisons (DuckDB oracle) hash-match; ties break on doc_id asc —
deterministic rank-identity per SURVEY.md §7 hard part (1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr, duckdb_tokenize_sql

__all__ = ["bm25_topk", "bm25_topk_sql"]


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    mode: str = "or",
    cfg: IndexConfig = IndexConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 over ``docs``; mode 'or' (disjunctive) or 'and'
    (conjunctive = doc must contain every distinct query term)."""
    spark = docs.sparkSession
    terms = sorted(set(query_terms))
    qt = spark.createDataFrame([(t,) for t in terms], "term string")

    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize_expr(text_col)).alias("term"))
    tf = (
        toks.join(F.broadcast(qt), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )

    # global stats as scalar subqueries — one tiny agg each, broadcastable
    dstats = docs.select(
        F.col(id_col).alias("doc_id"), F.size(tokenize_expr(text_col)).alias("doclen")
    )
    g = dstats.agg(F.count("*").alias("n"), F.avg("doclen").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["avgdl"] or 1.0)

    df_stats = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    k1, b = cfg.k1, cfg.b
    scored = (
        tf.join(F.broadcast(df_stats), "term")
        .join(dstats, "doc_id")
        .withColumn("idf", F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)))
        .withColumn(
            "w",
            (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("doclen") / avgdl)),
        )
        .groupBy("doc_id")
        .agg(F.sum(F.col("idf") * F.col("w")).alias("score_raw"), F.count("*").alias("nmatched"))
    )
    if mode == "and":
        scored = scored.filter(F.col("nmatched") == len(terms))
    return (
        scored.orderBy(F.desc("score_raw"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("score_raw", 6).alias("score"))
    )


def bm25_topk_sql(query_terms: list[str], k: int = 10, mode: str = "or", cfg: IndexConfig = IndexConfig(), table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB oracle SQL computing the exact same top-k (same tokenizer,
    same idf/w formulas, same rounding and tie-break)."""
    terms = sorted(set(query_terms))
    terms_sql = ", ".join("('" + t.replace("'", "''") + "')" for t in terms)
    and_filter = f"HAVING count(*) = {len(terms)}" if mode == "and" else ""
    k1, b = cfg.k1, cfg.b
    tok = duckdb_tokenize_sql(text_col)
    return f"""
WITH qt(term) AS (VALUES {terms_sql}),
tok AS (
  SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}
),
dl AS (
  SELECT {id_col} AS doc_id, len({tok}) AS doclen FROM {table}
),
g AS (SELECT count(*) AS n, avg(doclen) AS avgdl FROM dl),
tf AS (
  SELECT t.doc_id, t.term, count(*) AS tf
  FROM tok t JOIN qt USING (term)
  GROUP BY 1, 2
),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (g.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * (tf.tf * ({k1} + 1.0))
              / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.doclen / g.avgdl)) ) AS score_raw
  FROM tf
  JOIN dfs USING (term)
  JOIN dl  USING (doc_id)
  CROSS JOIN g
  GROUP BY tf.doc_id
  {and_filter}
)
SELECT doc_id, round(score_raw, 6) AS score
FROM scored
ORDER BY score_raw DESC, doc_id ASC
LIMIT {k}
""".strip()
