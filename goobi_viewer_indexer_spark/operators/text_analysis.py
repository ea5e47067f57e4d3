"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Reference analogs: the DEFAULT-field cleanup + FACET_DEFAULT token
split/dedup (Indexer.java:492-498, AbstractWriteStrategy.java:225-241)
and the _LANG_XX field-name convention (SolrConstants.java:253-272) —
the reference trusts upstream language tags; a web-scale pipeline must
derive them.

Everything is a Catalyst expression (JVM, codegen) so each of these runs
as a narrow map over the corpus scan — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr, duckdb_tokenize_sql

__all__ = [
    "language_id",
    "quality_score",
    "token_counts",
    "fingerprint",
    "LANG_ID_SQL",
    "QUALITY_SQL",
    "TOKEN_COUNTS_SQL",
    "FINGERPRINT_SQL",
]

# tiny deterministic stopword lists (n-gram-free heuristic: function-word
# hit-rate per language); shared verbatim with the SQL oracle
_STOP = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "for", "with", "on"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une", "pour", "que"],
}


def _ratio(toks: Column, words: list[str]) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(words)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, en_ratio) — argmax of stopword hit-rates with a
    floor: below 2% of tokens → 'unknown'."""
    toks = tokenize_expr(text_col)
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    r = {lang: _ratio(F.col("toks"), words) for lang, words in _STOP.items()}
    best = F.greatest(*r.values())
    pred = (
        F.when(best < 0.02, F.lit("unknown"))
        .when(r["en"] == best, F.lit("en"))
        .when(r["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return d.select("doc_id", pred.alias("lang_pred"), F.round(r["en"], 6).alias("en_ratio")).orderBy("doc_id")


def _sql_ratio(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"(CASE WHEN len(toks)=0 THEN 0.0 ELSE len(list_filter(toks, t -> t IN ({lst})))::DOUBLE / len(toks) END)"


LANG_ID_SQL = f"""
WITH t AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
r AS (
  SELECT doc_id,
         {_sql_ratio(_STOP['en'])} AS r_en,
         {_sql_ratio(_STOP['de'])} AS r_de,
         {_sql_ratio(_STOP['fr'])} AS r_fr
  FROM t
)
SELECT doc_id,
       CASE WHEN greatest(r_en, r_de, r_fr) < 0.02 THEN 'unknown'
            WHEN r_en = greatest(r_en, r_de, r_fr) THEN 'en'
            WHEN r_de = greatest(r_en, r_de, r_fr) THEN 'de'
            ELSE 'fr' END AS lang_pred,
       round(r_en, 6) AS en_ratio
FROM r ORDER BY doc_id
""".strip()


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality: length band + punctuation ratio + stopword ratio
    + mean token length, combined into [0,1]."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokenize_expr(text_col)
    n_chars = F.length(txt)
    n_toks = F.size(toks)
    alnum = F.length(F.regexp_replace(F.lower(txt), "[^a-z0-9]", ""))
    punct_ratio = F.when(n_chars == 0, F.lit(1.0)).otherwise(1.0 - alnum / n_chars)
    stop_ratio = _ratio(toks, _STOP["en"])
    mean_tok_len = F.when(n_toks == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / n_toks
    )
    len_ok = F.when((n_toks >= 10) & (n_toks <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    tok_ok = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio <= 0.5, F.lit(1.0)).otherwise(F.lit(0.0))
    score = (len_ok + tok_ok + punct_ok + F.least(stop_ratio * 5.0, F.lit(1.0))) / 4.0
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_toks.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality"),
    ).orderBy("doc_id")


QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, coalesce(text,'') AS txt, {duckdb_tokenize_sql('text')} AS toks FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         CASE WHEN length(txt)=0 THEN 1.0
              ELSE 1.0 - length(regexp_replace(lower(txt), '[^a-z0-9]', '', 'g'))::DOUBLE / length(txt) END AS punct_ratio,
         {_sql_ratio(_STOP['en'])} AS stop_ratio,
         CASE WHEN len(toks)=0 THEN 0.0
              ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) END AS mean_tok_len
  FROM t
)
SELECT doc_id, n_tokens,
       round(punct_ratio, 6) AS punct_ratio,
       round(stop_ratio, 6) AS stopword_ratio,
       round(mean_tok_len, 6) AS mean_token_len,
       round(((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN punct_ratio <= 0.5 THEN 1.0 ELSE 0.0 END)
            + least(stop_ratio * 5.0, 1.0)) / 4.0, 6) AS quality
FROM m ORDER BY doc_id
""".strip()


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens vs analysis tokens vs BPE-ish subword estimate
    (alnum runs + each punct char = one piece, the usual pretokenizer)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    ws = F.size(F.filter(F.split(txt, "\\s+"), lambda t: t != ""))
    analysis = F.size(tokenize_expr(text_col))
    bpe_ish = F.size(F.filter(F.split(F.lower(txt), ""), lambda c: ~c.rlike("[a-z0-9\\s]") & (c != ""))) + analysis
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        analysis.alias("analysis_tokens"),
        bpe_ish.alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(coalesce(text,''), '\\s+'), t -> t <> '')) AS ws_tokens,
       len({duckdb_tokenize_sql('text')}) AS analysis_tokens,
       length(regexp_replace(lower(coalesce(text,'')), '[a-z0-9\\s]', '', 'g'))
         + len({duckdb_tokenize_sql('text')}) AS bpe_ish_tokens
FROM documents ORDER BY doc_id
""".strip()


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalized content fingerprint: md5 over the canonical token stream
    — robust to whitespace/punctuation-only edits (rolling-hash analog of
    the reference's file-content identity checks, Hotfolder.java:1017-1046)."""
    canon = F.array_join(tokenize_expr(text_col), " ")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(canon).alias("fp"),
    ).orderBy("doc_id")


FINGERPRINT_SQL = f"""
SELECT doc_id, md5(array_to_string({duckdb_tokenize_sql('text')}, ' ')) AS fp
FROM documents ORDER BY doc_id
""".strip()


def unigram_logprob(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-unigram language-model quality score: per doc the MEAN
    ``ln P(token)`` with ``P(t) = count(t) / total_tokens`` estimated
    from the corpus itself — the KenLM-perplexity idea reduced to the
    model a Spark pipeline can fit in one aggregation (docs full of
    corpus-rare garbage score far below fluent ones; the standard
    cheap quality filter next to the ratio heuristics).

    One token explode → self term-frequency aggregate → join back
    (AQE picks broadcast while the vocabulary fits, shuffle-hash beyond
    — no forced hint) → per-doc mean of ``ln(cnt/total)``.  Zero-token docs
    emit NULL.  Everything is Catalyst arithmetic; the ``ln`` parity
    with DuckDB holds on the same 1-ulp/round6 argument the BM25 idf
    oracles rely on."""
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize_expr(text_col)).alias("t"))
    tf = toks.groupBy("t").agg(F.count("*").alias("c"))
    total = tf.agg(F.sum("c")).collect()[0][0] or 1  # one scalar job
    per_doc = (
        toks.join(tf, "t")
        .groupBy("doc_id")
        .agg(F.avg(F.log(F.col("c") / F.lit(float(total)))).alias("mean_logp"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select("doc_id", F.round("mean_logp", 6).alias("mean_logp"))
        .orderBy("doc_id")
    )


UNIGRAM_LOGPROB_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({duckdb_tokenize_sql('text')}) AS t FROM documents),
tf AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
per AS (SELECT doc_id, avg(ln(c / n)) AS mean_logp FROM tok JOIN tf USING (t) CROSS JOIN tot GROUP BY doc_id)
SELECT d.doc_id, round(per.mean_logp, 6) AS mean_logp
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
""".strip()
