"""Search-result snippets — the Solr highlighting the viewer requests on
every result page (the reference ships raw *_UNTOKENIZED/FULLTEXT fields
to Solr and lets its highlighter window them; SolrConstants.FULLTEXT +
viewer-side hl.fl usage).

Pure Catalyst: tokenize → first matching token index (min over the query
terms' ``array_position``) → ``slice`` a ±width token window →
``array_join``.  No UDF, whole-stage codegen, and exactly expressible in
DuckDB SQL (``list_position``) — so the operator is value-checked by the
driver's oracle gate like any relational query.

Contract: the snippet windows the FIRST occurrence of the EARLIEST-
matching query term; docs matching no term are dropped.  (Lucene's
passage-scoring highlighter picks "best" passages — a scoring deviation
we document rather than replicate.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr, duckdb_tokenize_sql

__all__ = ["snippets", "snippets_sql"]


def snippets(
    docs: DataFrame,
    terms: list[str],
    width: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, match_pos, snippet) for every doc containing ≥1 term.

    ``match_pos`` is the 1-based token index of the first match;
    ``snippet`` is the ±``width``-token window around it."""
    toks = tokenize_expr(text_col)
    qterms = sorted(set(terms))
    pos_cols = [F.array_position(F.col("_toks"), t) for t in qterms]
    first_pos = F.array_min(
        F.filter(F.array(*pos_cols), lambda p: p > 0)
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .withColumn("match_pos", first_pos)
        .filter(F.col("match_pos").isNotNull())
        .select(
            "doc_id",
            "match_pos",
            F.array_join(
                F.slice(
                    F.col("_toks"),
                    F.greatest(F.col("match_pos") - width, F.lit(1)),
                    # window is [pos-width, pos+width] clipped at the front;
                    # length shrinks by exactly the front clip
                    F.lit(2 * width + 1)
                    - F.greatest(F.lit(width + 1) - F.col("match_pos"), F.lit(0)),
                ),
                " ",
            ).alias("snippet"),
        )
        .orderBy("doc_id")
    )


def snippets_sql(terms: list[str], width: int = 3, table: str = "documents",
                 id_col: str = "doc_id", text_col: str = "text") -> str:
    tok = duckdb_tokenize_sql(text_col)
    qterms = sorted(set(terms))
    pos_items = ", ".join("list_position(toks, '" + t.replace("'", "''") + "')" for t in qterms)
    w = width
    return f"""
WITH t AS (SELECT {id_col} AS doc_id, {tok} AS toks FROM {table}),
m AS (
  SELECT doc_id, toks,
         list_min(list_filter([{pos_items}], p -> p > 0)) AS match_pos
  FROM t
)
SELECT doc_id, match_pos,
       array_to_string(
         toks[greatest(match_pos - {w}, 1) :
              greatest(match_pos - {w}, 1)
              + ({2 * w + 1} - greatest({w + 1} - match_pos, 0)) - 1],
         ' ') AS snippet
FROM m WHERE match_pos IS NOT NULL
ORDER BY doc_id
""".strip()
