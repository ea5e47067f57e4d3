"""Config-driven field extraction/normalization DSL — the reference's
XML-configured metadata pipeline (SURVEY.md §2-A P1-P10) as declarative
column algebra.

Reference analogs per transform:
* replace rules (char/string/regex)      MetadataHelper.java:823-854   (P2)
* HTML strip/unescape                    MetadataHelper.java:864-872   (P3)
* value normalizer pad/truncate          ValueNormalizer.java:81-220   (P4)
* non-sort prefix removal for SORT_      NonSortConfiguration.apply    (P5)
* one-token / lowercase                  MetadataHelper.java:961-973   (P6)
* identifier sanitization                MetadataHelper.java:885-902   (P7)
* DEFAULT cleanup (",;:" → space)        Indexer.java:492-498          (P8)
* {SPLIT} multi-value split              MetadataHelper.java:745-755   (P9)
* blank/dup skip                         MetadataHelper.java:713-760   (P10)
* SORT_/FACET_/_UNTOKENIZED twins        SolrConstants.java:253-272,
                                         MetadataHelper.java:419-422,1299-1305
* GROUPFIELD 128-char truncation         MetadataHelper.java:1299-1305 (O5)

Every transform carries BOTH a Catalyst expression and the equivalent
DuckDB SQL text, so a whole FieldMap compiles to an oracle query — the
same two-sided contract the rest of the suite uses.  All JVM-side,
whole-stage-codegen; a FieldMap over N fields is one narrow projection.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["FieldSpec", "apply_field_map", "field_map_sql"]


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@dataclass(frozen=True)
class FieldSpec:
    name: str                       # output column
    source: str                     # input column
    replace_rules: tuple = ()       # ((regex, replacement), ...)
    strip_html: bool = False
    lowercase: bool = False
    one_token: bool = False         # whitespace → "." (P6)
    sanitize_identifier: bool = False  # "[ ,:()]" → "_" (P7)
    default_cleanup: bool = False   # ",;:" → " ", collapse doubles (P8)
    non_sort_prefixes: tuple = ()   # stripped for the SORT_ twin (P5)
    pad: tuple | None = None        # ("front"|"rear", length, char) (P4)
    truncate: int | None = None     # max chars (O5 GROUPFIELD analog)
    sort_twin: bool = False         # adds SORT_<name>
    facet_twin: bool = False        # adds FACET_<name> (lowercased)
    untokenized_twin: bool = False  # adds <name>_UNTOKENIZED (verbatim src)

    # ---- Spark side ------------------------------------------------------
    def expr(self) -> Column:
        c = F.coalesce(F.col(self.source).cast("string"), F.lit(""))
        if self.strip_html:
            c = F.regexp_replace(c, "<[^>]+>", "")
        for pat, repl in self.replace_rules:
            c = F.regexp_replace(c, pat, repl)
        if self.default_cleanup:
            c = F.regexp_replace(F.regexp_replace(c, "[,;:]", " "), "\\s{2,}", " ")
        if self.sanitize_identifier:
            c = F.regexp_replace(c, "[ ,:()]", "_")
        if self.lowercase:
            c = F.lower(c)
        if self.one_token:
            c = F.regexp_replace(c, "\\s+", ".")
        if self.pad:
            side, length, ch = self.pad
            c = (F.lpad if side == "front" else F.rpad)(c, length, ch)
        if self.truncate:
            c = F.substring(c, 1, self.truncate)
        return F.trim(c)

    def sort_expr(self) -> Column:
        c = F.lower(self.expr())
        for p in self.non_sort_prefixes:
            c = F.regexp_replace(c, f"^{p.lower()}", "")
        return F.trim(c)

    # ---- DuckDB side -----------------------------------------------------
    def sql(self) -> str:
        c = f"coalesce(CAST({self.source} AS VARCHAR), '')"
        if self.strip_html:
            c = f"regexp_replace({c}, '<[^>]+>', '', 'g')"
        for pat, repl in self.replace_rules:
            c = f"regexp_replace({c}, {_sql_quote(pat)}, {_sql_quote(repl)}, 'g')"
        if self.default_cleanup:
            c = f"regexp_replace(regexp_replace({c}, '[,;:]', ' ', 'g'), '\\s{{2,}}', ' ', 'g')"
        if self.sanitize_identifier:
            c = f"regexp_replace({c}, '[ ,:()]', '_', 'g')"
        if self.lowercase:
            c = f"lower({c})"
        if self.one_token:
            c = f"regexp_replace({c}, '\\s+', '.', 'g')"
        if self.pad:
            side, length, ch = self.pad
            fn = "lpad" if side == "front" else "rpad"
            c = f"{fn}({c}, {length}, {_sql_quote(ch)})"
        if self.truncate:
            c = f"substr({c}, 1, {self.truncate})"
        return f"trim({c})"

    def sort_sql(self) -> str:
        c = f"lower({self.sql()})"
        for p in self.non_sort_prefixes:
            c = f"regexp_replace({c}, {_sql_quote('^' + p.lower())}, '', 'g')"
        return f"trim({c})"


def apply_field_map(docs: DataFrame, specs: list[FieldSpec], id_col: str = "doc_id") -> DataFrame:
    """One narrow projection producing every configured field + twins,
    skipping rows where ALL outputs are blank (P10 skip-blank)."""
    cols = [F.col(id_col).alias(id_col)]
    out_names = []
    for s in specs:
        cols.append(s.expr().alias(s.name))
        out_names.append(s.name)
        if s.sort_twin:
            cols.append(s.sort_expr().alias(f"SORT_{s.name}"))
        if s.facet_twin:
            cols.append(F.lower(s.expr()).alias(f"FACET_{s.name}"))
        if s.untokenized_twin:
            cols.append(F.coalesce(F.col(s.source).cast("string"), F.lit("")).alias(f"{s.name}_UNTOKENIZED"))
    # P10 skip-blank: drop rows whose every SOURCE value is null/blank
    # (evaluated pre-transform — padding/prefixes can make any output
    # non-blank)
    blank = None
    for s in specs:
        cond = F.trim(F.coalesce(F.col(s.source).cast("string"), F.lit(""))) == ""
        blank = cond if blank is None else (blank & cond)
    out = docs.filter(~blank) if blank is not None else docs
    return out.select(*cols)


def field_map_sql(specs: list[FieldSpec], table: str = "documents", id_col: str = "doc_id") -> str:
    sel = [id_col]
    blanks = []
    for s in specs:
        sel.append(f"{s.sql()} AS {s.name}")
        blanks.append(f"trim(coalesce(CAST({s.source} AS VARCHAR), '')) = ''")
        if s.sort_twin:
            sel.append(f"{s.sort_sql()} AS SORT_{s.name}")
        if s.facet_twin:
            sel.append(f"lower({s.sql()}) AS FACET_{s.name}")
        if s.untokenized_twin:
            sel.append(f"coalesce(CAST({s.source} AS VARCHAR), '') AS {s.name}_UNTOKENIZED")
    where = f"WHERE NOT ({' AND '.join(blanks)})" if blanks else ""
    return f"SELECT {', '.join(sel)} FROM {table} {where} ORDER BY {id_col}".strip()
