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

__all__ = [
    "bm25_topk", "bm25_topk_sql", "bm25_phrase_topk", "bm25_phrase_topk_sql",
    "bm25f_topk_sql", "bm25_boolean_topk", "bm25_boolean_topk_sql", "boolean_match_sql",
]


def _boolean_member_expr(groups: list[list[str]], negs: list[list[str]], text_col: str):
    """Catalyst membership predicate: AND over groups (OR within a group),
    NOT over every negative group."""
    toks = tokenize_expr(text_col)
    cond = F.lit(True)
    for g in groups:
        gc = F.lit(False)
        for t in g:
            gc = gc | F.array_contains(toks, t)
        cond = cond & gc
    for ng in negs:
        nc = F.lit(False)
        for t in ng:
            nc = nc | F.array_contains(toks, t)
        cond = cond & ~nc
    return cond


def _boolean_member_sql(groups: list[list[str]], negs: list[list[str]], tok: str) -> str:
    def or_group(g):
        return "(" + " OR ".join(f"list_contains({tok}, '{t.replace(chr(39), chr(39) * 2)}')" for t in g) + ")"

    parts = [or_group(g) for g in groups] + [f"NOT {or_group(ng)}" for ng in negs]
    return " AND ".join(parts)


def boolean_match_sql(
    groups: list[list[str]], negs: list[list[str]], table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB oracle for the NOT-capable match scan (delete-by-query twin)."""
    tok = duckdb_tokenize_sql(text_col)
    return f"SELECT {id_col} AS doc_id FROM {table} WHERE {_boolean_member_sql(groups, negs, tok)} ORDER BY doc_id"


def bm25_boolean_topk(
    docs: DataFrame,
    groups: list[list[str]],
    negs: list[list[str]],
    k: int = 10,
    cfg: IndexConfig = IndexConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Naive twin of ``InvertedIndex.search_boolean``: membership = AND over
    clause groups (OR within a group) minus any negative group; score = bag
    BM25 over the distinct positive terms present in each matching doc
    (negative clauses never score — Solr prohibited-clause semantics,
    reference helper/SolrSearchIndex.java:918-921)."""
    spark = docs.sparkSession
    terms = sorted({t for g in groups for t in g})
    qt = spark.createDataFrame([(t,) for t in terms], "term string")

    matching = docs.filter(_boolean_member_expr(groups, negs, text_col)).select(
        F.col(id_col).alias("doc_id")
    )
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize_expr(text_col)).alias("term"))
    tf_all = toks.join(F.broadcast(qt), "term").groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dstats = docs.select(F.col(id_col).alias("doc_id"), F.size(tokenize_expr(text_col)).alias("doclen"))
    g = dstats.agg(F.count("*").alias("n"), F.avg("doclen").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["avgdl"] or 1.0)
    df_stats = tf_all.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    k1, b = cfg.k1, cfg.b
    return (
        tf_all.join(F.broadcast(matching), "doc_id")
        .join(F.broadcast(df_stats), "term")
        .join(dstats, "doc_id")
        .withColumn("idf", F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)))
        .withColumn(
            "w",
            (F.col("tf") * (k1 + 1.0)) / (F.col("tf") + k1 * (1.0 - b + b * F.col("doclen") / avgdl)),
        )
        .groupBy("doc_id")
        .agg(F.sum(F.col("idf") * F.col("w")).alias("score_raw"))
        .orderBy(F.desc("score_raw"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("score_raw", 6).alias("score"))
    )


def bm25_boolean_topk_sql(
    groups: list[list[str]],
    negs: list[list[str]],
    k: int = 10,
    cfg: IndexConfig = IndexConfig(),
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`bm25_boolean_topk` (same membership, same
    bag scoring over positive terms, same rounding/tie-break)."""
    terms = sorted({t for g in groups for t in g})
    terms_sql = ", ".join("('" + t.replace("'", "''") + "')" for t in terms)
    k1, b = cfg.k1, cfg.b
    tok = duckdb_tokenize_sql(text_col)
    member = _boolean_member_sql(groups, negs, tok)
    return f"""
WITH qt(term) AS (VALUES {terms_sql}),
m AS (SELECT {id_col} AS doc_id FROM {table} WHERE {member}),
tok AS (SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}),
dl AS (SELECT {id_col} AS doc_id, len({tok}) AS doclen FROM {table}),
g AS (SELECT count(*) AS n, avg(doclen) AS avgdl FROM dl),
tf AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tok t JOIN qt USING (term) GROUP BY 1, 2),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (g.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * (tf.tf * ({k1} + 1.0))
              / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.doclen / g.avgdl)) ) AS score_raw
  FROM tf
  JOIN m   USING (doc_id)
  JOIN dfs USING (term)
  JOIN dl  USING (doc_id)
  CROSS JOIN g
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score_raw, 6) AS score
FROM scored ORDER BY score_raw DESC, doc_id ASC LIMIT {k}
""".strip()


def bm25f_topk_sql(
    pairs: list[tuple[str, str]],
    k: int = 10,
    mode: str = "or",
    boosts: dict[str, float] | None = None,
    cfg: IndexConfig = IndexConfig(),
    field_cols: dict[str, str] | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
    phrase_filters: list[tuple[str, list[str]]] | None = None,
    neg_filters: list[tuple[str, str]] | None = None,
    where_docs: str | None = None,
    min_match: int = 1,
) -> str:
    """DuckDB oracle for field-scoped BM25F-lite (operators/search.
    FieldedIndex.search): per-pair BM25 with FIELD-local df/doclen/avgdl,
    N = global doc count, boost multiplying idf; AND = every pair matches;
    ``min_match`` (OR mode) = Solr mm over the pairs — the doc must match
    at least that many distinct (field, term) clauses.
    ``phrase_filters``: quoted clauses — each (field, tokens) additionally
    restricts results to docs whose FIELD token stream contains the tokens
    consecutively (the mixed ``pi:x AND text:"a b"`` shape); a 3-tuple
    (field, tokens, slop) applies the ordered-window proximity contract
    instead (``text:"a b"~N`` — in order, span ≤ n−1+slop).
    ``neg_filters``: prohibited clauses — each (field, term) EXCLUDES docs
    whose field contains the term (``-lang:de``; filters, never scores)."""
    boosts = boosts or {}
    field_cols = field_cols or {f: f for f, _ in pairs}
    k1, b = cfg.k1, cfg.b
    pair_ctes = []
    for fname, term in pairs:
        col = field_cols[fname]
        w = boosts.get(fname, 1.0)
        t = term.replace("'", "''")
        tok = duckdb_tokenize_sql(col)
        pair_ctes.append(
            f"""
  SELECT tf.doc_id,
         {w} * ln(1.0 + ((SELECT count(*) FROM {table}) - st.df + 0.5) / (st.df + 0.5))
         * (tf.tf * ({k1} + 1.0)) / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / st.avgdl)) AS s
  FROM (SELECT {id_col} AS doc_id, count(*) AS tf
        FROM (SELECT {id_col}, unnest({tok}) AS term FROM {table}) WHERE term = '{t}' GROUP BY 1) tf
  JOIN (SELECT {id_col} AS doc_id, len({tok}) AS dl FROM {table}) dl USING (doc_id)
  CROSS JOIN (SELECT (SELECT count(*) FROM {table} WHERE list_contains({tok}, '{t}')) AS df,
                     (SELECT avg(len({tok})) FROM {table}) AS avgdl) st"""
        )
    union = " UNION ALL ".join(pair_ctes)
    if mode == "and":
        having = f"HAVING count(*) = {len(pairs)}"
    elif min_match > 1:
        having = f"HAVING count(*) >= {min_match}"
    else:
        having = ""
    phrase_joins = ""
    for pf in phrase_filters or []:
        fname, toks = pf[0], pf[1]
        pslop = pf[2] if len(pf) > 2 else 0
        col = field_cols[fname]
        tok = duckdb_tokenize_sql(col)
        if pslop > 0:
            n = len(toks)
            esc = [t.replace("'", "''") for t in toks]
            pj = "".join(
                f" JOIN (SELECT doc_id, pos FROM ptok WHERE term = '{esc[j]}') a{j}"
                f" ON a{j}.doc_id = a0.doc_id AND a{j}.pos > a{j - 1}.pos"
                for j in range(1, n)
            )
            phrase_joins += (
                f"\n  JOIN (WITH ptok AS (SELECT {id_col} AS doc_id, unnest({tok}) AS term, "
                f"unnest(range(len({tok}))) AS pos FROM {table}) "
                f"SELECT DISTINCT a0.doc_id FROM "
                f"(SELECT doc_id, pos FROM ptok WHERE term = '{esc[0]}') a0{pj} "
                f"WHERE a{n - 1}.pos - a0.pos <= {n - 1 + pslop}) USING (doc_id)"
            )
            continue
        needle = " " + " ".join(t.replace("'", "''") for t in toks) + " "
        phrase_joins += (
            f"\n  JOIN (SELECT {id_col} AS doc_id FROM {table} "
            f"WHERE contains(' ' || array_to_string({tok}, ' ') || ' ', '{needle}')) "
            f"USING (doc_id)"
        )
    for fname, term in neg_filters or []:
        col = field_cols.get(fname, fname)
        tok = duckdb_tokenize_sql(col)
        t = term.replace("'", "''")
        phrase_joins += (
            f"\n  JOIN (SELECT {id_col} AS doc_id FROM {table} "
            f"WHERE NOT list_contains({tok}, '{t}')) USING (doc_id)"
        )
    if where_docs:
        # doc-level membership filter that never scores — the range-clause
        # (f:[lo TO hi]) constant-score contract
        phrase_joins += (
            f"\n  JOIN (SELECT {id_col} AS doc_id FROM {table} "
            f"WHERE {where_docs}) USING (doc_id)"
        )
    return f"""
WITH u AS ({union}),
scored AS (SELECT doc_id, sum(s) AS score_raw FROM u{phrase_joins} GROUP BY doc_id {having})
SELECT doc_id, round(score_raw, 6) AS score
FROM scored ORDER BY score_raw DESC, doc_id ASC LIMIT {k}
""".strip()


def bm25f_dismax_topk_sql(
    terms: list[str],
    qf: dict[str, float],
    k: int = 10,
    tie: float = 0.0,
    min_match: int = 1,
    cfg: IndexConfig = IndexConfig(),
    field_cols: dict[str, str] | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for Solr edismax main-query scoring
    (FieldedIndex.search_dismax): every bare term searches every ``qf``
    field; per (doc, term) the score is DisjunctionMax over the fields —
    ``max + tie·(sum − max)`` of the per-field ``boost·BM25`` scores
    (field-local df/doclen/avgdl, N = global doc count, exactly the
    bm25f_topk_sql per-pair arithmetic) — and the doc's score sums the
    per-term results.  ``min_match`` = distinct matched terms required.
    Ordered (round6(score) desc, doc_id asc), the engine's grid."""
    field_cols = field_cols or {f: f for f in qf}
    k1, b = cfg.k1, cfg.b
    ctes = []
    for term in terms:
        t = term.replace("'", "''")
        for fname, w in qf.items():
            col = field_cols[fname]
            tok = duckdb_tokenize_sql(col)
            ctes.append(
                f"""
  SELECT tf.doc_id, '{t}' AS term,
         {w} * ln(1.0 + ((SELECT count(*) FROM {table}) - st.df + 0.5) / (st.df + 0.5))
         * (tf.tf * ({k1} + 1.0)) / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / st.avgdl)) AS s
  FROM (SELECT {id_col} AS doc_id, count(*) AS tf
        FROM (SELECT {id_col}, unnest({tok}) AS tk FROM {table}) WHERE tk = '{t}' GROUP BY 1) tf
  JOIN (SELECT {id_col} AS doc_id, len({tok}) AS dl FROM {table}) dl USING (doc_id)
  CROSS JOIN (SELECT (SELECT count(*) FROM {table} WHERE list_contains({tok}, '{t}')) AS df,
                     (SELECT avg(len({tok})) FROM {table}) AS avgdl) st"""
            )
    union = " UNION ALL ".join(ctes)
    return f"""
WITH u AS ({union}),
pt AS (SELECT doc_id, term, max(s) AS mx, sum(s) AS sm FROM u GROUP BY 1, 2),
sc AS (SELECT doc_id, sum(mx + {tie} * (sm - mx)) AS raw, count(*) AS nt FROM pt GROUP BY 1)
SELECT doc_id, round(raw, 6) AS score
FROM sc WHERE nt >= {min_match}
ORDER BY round(raw, 6) DESC, doc_id ASC LIMIT {k}
""".strip()


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    mode: str = "or",
    cfg: IndexConfig = IndexConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
    min_match: int = 1,
) -> DataFrame:
    """Top-k BM25 over ``docs``; mode 'or' (disjunctive) or 'and'
    (conjunctive = doc must contain every distinct query term).
    ``min_match``: OR-mode minimum-should-match (Solr DisMax ``mm``)."""
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
    elif min_match > 1:
        scored = scored.filter(F.col("nmatched") >= min_match)
    return (
        scored.orderBy(F.desc("score_raw"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("score_raw", 6).alias("score"))
    )


def _phrase_filter_expr(phrase_terms: list[str], text_col: str):
    """Docs whose token stream contains the phrase tokens consecutively:
    substring match on the space-joined tokens with sentinel spaces."""
    needle = " " + " ".join(phrase_terms) + " "
    joined = F.concat(F.lit(" "), F.array_join(tokenize_expr(text_col), " "), F.lit(" "))
    return F.contains(joined, F.lit(needle))


def bm25_phrase_topk(
    docs: DataFrame,
    phrase_terms: list[str],
    k: int = 10,
    cfg: IndexConfig = IndexConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
    slop: int = 0,
) -> DataFrame:
    """Naive phrase twin of ``InvertedIndex.search_phrase``: filter to docs
    containing the token sequence, score with the bag-of-distinct-terms
    BM25 using FULL-corpus stats (df/avgdl over all docs — the engine's
    idf/doclen side tables are corpus-global, matching Solr).  Token order
    matters; ``phrase_terms`` is NOT deduplicated.  ``slop`` > 0 switches
    the filter to the ordered-window proximity contract (positions in
    order, span ≤ n−1+slop) via an n-way position self-join."""
    spark = docs.sparkSession
    distinct = sorted(set(phrase_terms))
    qt = spark.createDataFrame([(t,) for t in distinct], "term string")

    if slop > 0:
        n = len(phrase_terms)
        pos = docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokenize_expr(text_col)).alias("pos", "term"),
        )
        cur = pos.filter(F.col("term") == phrase_terms[0]).select("doc_id", F.col("pos").alias("p0"))
        for j in range(1, n):
            pj = pos.filter(F.col("term") == phrase_terms[j]).select(
                "doc_id", F.col("pos").alias(f"p{j}")
            )
            cur = cur.join(pj, "doc_id").filter(F.col(f"p{j}") > F.col(f"p{j-1}"))
        matching = (
            cur.filter(F.col(f"p{n-1}") - F.col("p0") <= n - 1 + slop)
            .select("doc_id")
            .distinct()
        )
    else:
        matching = docs.filter(_phrase_filter_expr(phrase_terms, text_col)).select(
            F.col(id_col).alias("doc_id")
        )

    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize_expr(text_col)).alias("term"))
    tf_all = toks.join(F.broadcast(qt), "term").groupBy("doc_id", "term").agg(F.count("*").alias("tf"))

    dstats = docs.select(F.col(id_col).alias("doc_id"), F.size(tokenize_expr(text_col)).alias("doclen"))
    g = dstats.agg(F.count("*").alias("n"), F.avg("doclen").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["avgdl"] or 1.0)
    df_stats = tf_all.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    k1, b = cfg.k1, cfg.b
    return (
        tf_all.join(F.broadcast(matching), "doc_id")
        .join(F.broadcast(df_stats), "term")
        .join(dstats, "doc_id")
        .withColumn("idf", F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)))
        .withColumn(
            "w",
            (F.col("tf") * (k1 + 1.0)) / (F.col("tf") + k1 * (1.0 - b + b * F.col("doclen") / avgdl)),
        )
        .groupBy("doc_id")
        .agg(F.sum(F.col("idf") * F.col("w")).alias("score_raw"))
        .orderBy(F.desc("score_raw"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("score_raw", 6).alias("score"))
    )


def bm25_phrase_topk_sql(
    phrase_terms: list[str],
    k: int = 10,
    cfg: IndexConfig = IndexConfig(),
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    slop: int = 0,
) -> str:
    """DuckDB oracle for the phrase contract (same filter + bag scoring).
    ``slop`` > 0: ordered-window proximity — positions p0 < p1 < … < pn in
    token order with span ≤ n−1+slop (the engine's ``"a b"~N`` contract),
    expressed as an n-way position self-join."""
    distinct = sorted(set(phrase_terms))
    terms_sql = ", ".join("('" + t.replace("'", "''") + "')" for t in distinct)
    needle = " " + " ".join(t.replace("'", "''") for t in phrase_terms) + " "
    k1, b = cfg.k1, cfg.b
    tok = duckdb_tokenize_sql(text_col)
    if slop > 0:
        n = len(phrase_terms)
        joins = "".join(
            f"\n  JOIN (SELECT doc_id, pos FROM ptok WHERE term = '{phrase_terms[j].replace(chr(39), chr(39) * 2)}') a{j}"
            f" ON a{j}.doc_id = a0.doc_id AND a{j}.pos > a{j - 1}.pos"
            for j in range(1, n)
        )
        match_cte = f"""ptok AS (
  SELECT {id_col} AS doc_id, unnest({tok}) AS term, unnest(range(len({tok}))) AS pos FROM {table}
),
m AS (
  SELECT DISTINCT a0.doc_id
  FROM (SELECT doc_id, pos FROM ptok WHERE term = '{phrase_terms[0].replace(chr(39), chr(39) * 2)}') a0{joins}
  WHERE a{n - 1}.pos - a0.pos <= {n - 1 + slop}
)"""
    else:
        match_cte = f"""m AS (
  SELECT {id_col} AS doc_id FROM {table}
  WHERE contains(' ' || array_to_string({tok}, ' ') || ' ', '{needle}')
)"""
    return f"""
WITH qt(term) AS (VALUES {terms_sql}),
{match_cte},
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
  JOIN m   USING (doc_id)
  JOIN dfs USING (term)
  JOIN dl  USING (doc_id)
  CROSS JOIN g
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score_raw, 6) AS score
FROM scored
ORDER BY score_raw DESC, doc_id ASC
LIMIT {k}
""".strip()


def bm25_prefix_topk_sql(
    prefix: str,
    k: int = 10,
    cfg: IndexConfig = IndexConfig(),
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for ``InvertedIndex.search_prefix``: OR over every
    corpus term matching ``prefix*``, each with its own idf (Solr
    multi-term rewrite)."""
    k1, b = cfg.k1, cfg.b
    tok = duckdb_tokenize_sql(text_col)
    p = prefix.replace("'", "''")
    return f"""
WITH qt AS (
  SELECT DISTINCT term FROM (SELECT unnest({tok}) AS term FROM {table})
  WHERE term LIKE '{p}%'
),
tok AS (SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}),
dl AS (SELECT {id_col} AS doc_id, len({tok}) AS doclen FROM {table}),
g AS (SELECT count(*) AS n, avg(doclen) AS avgdl FROM dl),
tf AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tok t JOIN qt USING (term) GROUP BY 1, 2),
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
)
SELECT doc_id, round(score_raw, 6) AS score
FROM scored ORDER BY score_raw DESC, doc_id ASC LIMIT {k}
""".strip()


def bm25_fuzzy_topk_sql(
    term: str,
    k: int = 10,
    cfg: IndexConfig = IndexConfig(),
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for ``InvertedIndex.search_fuzzy``: OR over every
    corpus term within Levenshtein distance 1, each with its own idf."""
    k1, b = cfg.k1, cfg.b
    tok = duckdb_tokenize_sql(text_col)
    t = term.replace("'", "''")
    return f"""
WITH qt AS (
  SELECT DISTINCT term FROM (SELECT unnest({tok}) AS term FROM {table})
  WHERE levenshtein(term, '{t}') <= 1
),
tok AS (SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}),
dl AS (SELECT {id_col} AS doc_id, len({tok}) AS doclen FROM {table}),
g AS (SELECT count(*) AS n, avg(doclen) AS avgdl FROM dl),
tf AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tok t JOIN qt USING (term) GROUP BY 1, 2),
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
)
SELECT doc_id, round(score_raw, 6) AS score
FROM scored ORDER BY score_raw DESC, doc_id ASC LIMIT {k}
""".strip()


def bm25_grouped_sql(
    query_terms: list[str],
    group_field: str,
    k_groups: int = 10,
    docs_per_group: int = 2,
    mode: str = "and",
    cfg: IndexConfig = IndexConfig(),
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    group_offset: int = 0,
    include_ngroups: bool = False,
) -> str:
    """DuckDB oracle for ``InvertedIndex.search_grouped``: bag BM25 over
    ALL matching docs, groups [group_offset, group_offset+k_groups) by
    best score (ties: group value asc), top ``docs_per_group`` docs per
    group (ties: doc_id asc).  ``include_ngroups`` adds the total group
    count of the match set to every row (Solr ``ngroups=true``).  Ranks
    use RAW scores (same as the engine); display rounds to 6."""
    terms = sorted(set(query_terms))
    terms_sql = ", ".join("('" + t.replace("'", "''") + "')" for t in terms)
    k1, b = cfg.k1, cfg.b
    tok = duckdb_tokenize_sql(text_col)
    having = f"HAVING count(DISTINCT term) = {len(terms)}" if mode == "and" else ""
    ng_select = ", ng.ngroups" if include_ngroups else ""
    ng_join = f"CROSS JOIN (SELECT count(DISTINCT {group_field}) AS ngroups FROM j) ng" if include_ngroups else ""
    return f"""
WITH qt(term) AS (VALUES {terms_sql}),
tok AS (SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}),
dl AS (SELECT {id_col} AS doc_id, len({tok}) AS doclen FROM {table}),
g AS (SELECT count(*) AS n, avg(doclen) AS avgdl FROM dl),
tf AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tok t JOIN qt USING (term) GROUP BY 1, 2),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (g.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * (tf.tf * ({k1} + 1.0))
              / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.doclen / g.avgdl)) ) AS score_raw
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tf.doc_id {having}
),
j AS (SELECT s.doc_id, s.score_raw, d.{group_field} AS {group_field}
      FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}),
dr AS (SELECT *, row_number() OVER (PARTITION BY {group_field}
                                    ORDER BY score_raw DESC, doc_id ASC) AS _dr FROM j),
gr AS (SELECT {group_field},
              row_number() OVER (ORDER BY max(score_raw) DESC, {group_field} ASC) AS _gr
       FROM j GROUP BY {group_field})
SELECT d.{group_field}, d.doc_id, round(d.score_raw, 6) AS score{ng_select}
FROM dr d JOIN gr USING ({group_field}) {ng_join}
WHERE d._dr <= {docs_per_group} AND gr._gr > {group_offset} AND gr._gr <= {group_offset + k_groups}
""".strip()


def mlt_topk_sql(
    src_doc_id: int,
    k: int = 10,
    max_query_terms: int = 10,
    cfg: IndexConfig = IndexConfig(),
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for ``InvertedIndex.more_like_this``: the source
    doc's terms ranked by round(tf·idf, 6) (ties: term asc), the top
    ``max_query_terms`` OR-combined into a bag BM25 query, the source doc
    excluded — same idf/w formulas, rounding and tie-breaks as
    :func:`bm25_topk_sql`."""
    k1, b = cfg.k1, cfg.b
    tok = duckdb_tokenize_sql(text_col)
    return f"""
WITH tok AS (SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT {id_col} AS doc_id, len({tok}) AS doclen FROM {table}),
g AS (SELECT count(*) AS n, avg(doclen) AS avgdl FROM dl),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
sal AS (
  SELECT s.term
  FROM tf s JOIN dfs USING (term) CROSS JOIN g
  WHERE s.doc_id = {src_doc_id}
  ORDER BY round(s.tf * ln(1.0 + (g.n - dfs.df + 0.5) / (dfs.df + 0.5)), 6) DESC, s.term ASC
  LIMIT {max_query_terms}
),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (g.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * (tf.tf * ({k1} + 1.0))
              / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.doclen / g.avgdl)) ) AS score_raw
  FROM tf
  JOIN sal USING (term)
  JOIN dfs USING (term)
  JOIN dl  USING (doc_id)
  CROSS JOIN g
  WHERE tf.doc_id <> {src_doc_id}
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score_raw, 6) AS score
FROM scored ORDER BY score_raw DESC, doc_id ASC LIMIT {k}
""".strip()


def mlt_fielded_topk_sql(
    src_doc_id: int,
    fields: dict[str, str],
    k: int = 10,
    max_query_terms: int = 10,
    cfg: IndexConfig = IndexConfig(),
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for ``FieldedIndex.more_like_this``: the source
    doc's (field, term) pairs ranked by round(tf·idf, 6) with FIELD-LOCAL
    df (ties: field asc, term asc), the top ``max_query_terms``
    OR-combined into a BM25F-lite query (field-local df/doclen/avgdl,
    N = global doc count), the source doc excluded — same formulas,
    rounding and tie-breaks as :func:`bm25f_topk_sql`."""
    k1, b = cfg.k1, cfg.b
    tok_u = " UNION ALL ".join(
        f"SELECT '{f}' AS field, {id_col} AS doc_id, unnest({duckdb_tokenize_sql(c)}) AS term FROM {table}"
        for f, c in sorted(fields.items())
    )
    dl_u = " UNION ALL ".join(
        f"SELECT '{f}' AS field, {id_col} AS doc_id, len({duckdb_tokenize_sql(c)}) AS dl FROM {table}"
        for f, c in sorted(fields.items())
    )
    av_u = " UNION ALL ".join(
        f"SELECT '{f}' AS field, avg(len({duckdb_tokenize_sql(c)})) AS avgdl FROM {table}"
        for f, c in sorted(fields.items())
    )
    return f"""
WITH tok AS ({tok_u}),
tf AS (SELECT field, doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
dfs AS (SELECT field, term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1, 2),
g AS (SELECT count(*) AS n FROM {table}),
dls AS ({dl_u}),
fstats AS ({av_u}),
sal AS (
  SELECT s.field, s.term
  FROM tf s JOIN dfs USING (field, term) CROSS JOIN g
  WHERE s.doc_id = {src_doc_id}
  ORDER BY round(s.tf * ln(1.0 + (g.n - dfs.df + 0.5) / (dfs.df + 0.5)), 6) DESC,
           s.field ASC, s.term ASC
  LIMIT {max_query_terms}
),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (g.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * (tf.tf * ({k1} + 1.0))
              / (tf.tf + {k1} * (1.0 - {b} + {b} * dls.dl / fstats.avgdl)) ) AS score_raw
  FROM tf
  JOIN sal USING (field, term)
  JOIN dfs USING (field, term)
  JOIN dls ON dls.field = tf.field AND dls.doc_id = tf.doc_id
  JOIN fstats ON fstats.field = tf.field
  CROSS JOIN g
  WHERE tf.doc_id <> {src_doc_id}
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score_raw, 6) AS score
FROM scored ORDER BY score_raw DESC, doc_id ASC LIMIT {k}
""".strip()


def bm25_boolean_wildcard_sql(
    term: str,
    prefix: str,
    k: int = 10,
    cfg: IndexConfig = IndexConfig(),
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for ``InvertedIndex.search_boolean('{term} {prefix}*')``:
    membership = contains the term AND any dictionary term under the
    prefix; score = bag BM25 over the term plus every matched prefix term
    the doc contains (each its own idf)."""
    k1, b = cfg.k1, cfg.b
    tok = duckdb_tokenize_sql(text_col)
    t = term.replace("'", "''")
    p = prefix.replace("'", "''")
    return f"""
WITH tok AS (SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}),
dl AS (SELECT {id_col} AS doc_id, len({tok}) AS doclen FROM {table}),
g AS (SELECT count(*) AS n, avg(doclen) AS avgdl FROM dl),
qt AS (SELECT DISTINCT term FROM tok WHERE term LIKE '{p}%' UNION SELECT '{t}'),
tf AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tok t JOIN qt USING (term) GROUP BY 1, 2),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
m AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{t}'
      INTERSECT SELECT DISTINCT doc_id FROM tok WHERE term LIKE '{p}%'),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (g.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * (tf.tf * ({k1} + 1.0))
              / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.doclen / g.avgdl)) ) AS score_raw
  FROM tf
  JOIN m   USING (doc_id)
  JOIN dfs USING (term)
  JOIN dl  USING (doc_id)
  CROSS JOIN g
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score_raw, 6) AS score
FROM scored ORDER BY score_raw DESC, doc_id ASC LIMIT {k}
""".strip()


def bm25_boolean_range_sql(
    term: str,
    lo: str,
    hi: str,
    k: int = 10,
    cfg: IndexConfig = IndexConfig(),
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for ``InvertedIndex.search_boolean('{term} [lo TO
    hi]')`` (round 5): membership = contains the term AND any dictionary
    term in the inclusive lexicographic range; the range clause is
    CONSTANT-SCORE (Solr's rewrite), so the score is the bag BM25 of the
    scoring term alone — surviving docs keep their plain-query scores."""
    k1, b = cfg.k1, cfg.b
    tok = duckdb_tokenize_sql(text_col)
    t = term.replace("'", "''")
    l_ = lo.replace("'", "''")
    h_ = hi.replace("'", "''")
    return f"""
WITH tok AS (SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}),
dl AS (SELECT {id_col} AS doc_id, len({tok}) AS doclen FROM {table}),
g AS (SELECT count(*) AS n, avg(doclen) AS avgdl FROM dl),
tf AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = '{t}' GROUP BY 1),
dfs AS (SELECT count(*) AS df FROM tf),
m AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{t}'
      INTERSECT SELECT DISTINCT doc_id FROM tok WHERE term >= '{l_}' AND term <= '{h_}'),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (g.n - dfs.df + 0.5) / (dfs.df + 0.5))
         * (tf.tf * ({k1} + 1.0))
         / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.doclen / g.avgdl)) AS score_raw
  FROM tf
  JOIN m   USING (doc_id)
  JOIN dl  USING (doc_id)
  CROSS JOIN g CROSS JOIN dfs
)
SELECT doc_id, round(score_raw, 6) AS score
FROM scored ORDER BY score_raw DESC, doc_id ASC LIMIT {k}
""".strip()


def bm25f_prefix_and_term_sql(
    pfield: str,
    prefix: str,
    tfield: str,
    term: str,
    k: int = 10,
    cfg: IndexConfig = IndexConfig(),
    field_cols: dict[str, str] | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for ``FieldedIndex.search('{tfield}:{term} AND
    {pfield}:{prefix}*')``: membership = doc's pfield contains ANY
    dictionary term under the prefix AND its tfield contains the term;
    score = field-local BM25 summed over every matched prefix term (each
    its own idf, Solr multi-term rewrite) + the term clause (N = global
    doc count, df/dl/avgdl field-local — the BM25F-lite convention)."""
    field_cols = field_cols or {pfield: pfield, tfield: tfield}
    k1, b = cfg.k1, cfg.b
    ptok = duckdb_tokenize_sql(field_cols[pfield])
    ttok = duckdb_tokenize_sql(field_cols[tfield])
    p = prefix.replace("'", "''")
    t = term.replace("'", "''")
    return f"""
WITH n AS (SELECT count(*) AS n FROM {table}),
ptoks AS (SELECT {id_col} AS doc_id, unnest({ptok}) AS term FROM {table}),
pdl AS (SELECT {id_col} AS doc_id, len({ptok}) AS dl FROM {table}),
pg AS (SELECT avg(dl) AS avgdl FROM pdl),
qt AS (SELECT DISTINCT term FROM ptoks WHERE term LIKE '{p}%'),
ptf AS (SELECT doc_id, term, count(*) AS tf FROM ptoks JOIN qt USING (term) GROUP BY 1, 2),
pdfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM ptf GROUP BY 1),
tm AS (SELECT {id_col} AS doc_id, count(*) AS tf
       FROM (SELECT {id_col}, unnest({ttok}) AS term FROM {table}) WHERE term = '{t}' GROUP BY 1),
tdl AS (SELECT {id_col} AS doc_id, len({ttok}) AS dl FROM {table}),
tg AS (SELECT avg(dl) AS avgdl FROM tdl),
tdf AS (SELECT count(*) AS df FROM tm),
m AS (SELECT doc_id FROM (SELECT DISTINCT doc_id FROM ptf) JOIN tm USING (doc_id)),
pscore AS (
  SELECT ptf.doc_id,
         sum( ln(1.0 + (n.n - pdfs.df + 0.5) / (pdfs.df + 0.5))
              * (ptf.tf * ({k1} + 1.0))
              / (ptf.tf + {k1} * (1.0 - {b} + {b} * pdl.dl / pg.avgdl)) ) AS s
  FROM ptf JOIN pdfs USING (term) JOIN pdl USING (doc_id) CROSS JOIN pg CROSS JOIN n
  GROUP BY 1),
tscore AS (
  SELECT tm.doc_id,
         ln(1.0 + (n.n - tdf.df + 0.5) / (tdf.df + 0.5))
         * (tm.tf * ({k1} + 1.0))
         / (tm.tf + {k1} * (1.0 - {b} + {b} * tdl.dl / tg.avgdl)) AS s
  FROM tm JOIN tdl USING (doc_id) CROSS JOIN tg CROSS JOIN tdf CROSS JOIN n),
scored AS (
  SELECT m.doc_id, coalesce(p.s, 0) + coalesce(t.s, 0) AS score_raw
  FROM m LEFT JOIN pscore p USING (doc_id) LEFT JOIN tscore t USING (doc_id))
SELECT doc_id, round(score_raw, 6) AS score
FROM scored ORDER BY score_raw DESC, doc_id ASC LIMIT {k}
""".strip()


def bm25_topk_sql(query_terms: list[str], k: int = 10, mode: str = "or", cfg: IndexConfig = IndexConfig(), table: str = "documents", id_col: str = "doc_id", text_col: str = "text", min_match: int = 1) -> str:
    """DuckDB oracle SQL computing the exact same top-k (same tokenizer,
    same idf/w formulas, same rounding and tie-break).  ``min_match``:
    OR-mode minimum-should-match twin (HAVING count >= N)."""
    terms = sorted(set(query_terms))
    terms_sql = ", ".join("('" + t.replace("'", "''") + "')" for t in terms)
    and_filter = f"HAVING count(*) = {len(terms)}" if mode == "and" else (
        f"HAVING count(*) >= {min_match}" if min_match > 1 else "")
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
