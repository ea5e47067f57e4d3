"""Document/term statistics — the engine's replacement for Solr/Lucene
field stats (docFreq, collection freq, avgFieldLength) that BM25 scoring
needs.  Reference analog: the stats Solr maintains per segment for the
fields written by helper/FulltextAugmentor.java:78-238 and
model/writestrategy/AbstractWriteStrategy.java:201-218.

All pure DataFrame ops: tokenize (Catalyst expr) → explode → groupBy.
Partial aggregation (map-side combine) is Catalyst-native, so the term
shuffle moves (term, df, cf) partials, not raw tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr

__all__ = ["with_tokens", "doc_stats", "term_stats", "corpus_stats"]


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("tokens", tokenize_expr(text_col))


def doc_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc_id, doclen, sha256 — per-row content invariant vs the source
    (BASELINE.json input_hint: content sha256 equality)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize_expr(text_col)).alias("doclen"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("sha256"),
    )


def term_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """term, df (distinct docs), cf (total occurrences)."""
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize_expr(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
    )


def corpus_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> tuple[int, float]:
    """(N, avgdl) — one tiny job; avgdl over ALL docs incl. empty ones."""
    row = doc_stats(docs, id_col, text_col).agg(
        F.count("*").alias("n"), F.avg("doclen").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)
