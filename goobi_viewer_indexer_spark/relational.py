"""Relational re-expressions of the reference's index-build operators
(SURVEY.md §2-A) over the TPC-H-ish testdata tables — each registered in
the driver suite with a DuckDB oracle.

The reference works on one record tree at a time with hash maps and
mutable lists; here every operator is the equivalent declarative plan
(broadcast/hash joins, windows, partial aggregations), which is what it
must become at 100 TB.  Reference citations per operator below.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goobi_viewer_indexer_spark.operators.fieldmap import FieldSpec, apply_field_map, field_map_sql
from goobi_viewer_indexer_spark.suite import _load, register


# --------------------------------------------------------------------------
# J1 + W1/W2: page↔docstruct structLink join with deepest-owner selection
# (MetsIndexer.java:748-987 mapPagesToDocstruct; owner-depth window
# MetsIndexer.java:819-858).  Analog: per order pick the "deepest" line
# (max quantity, tie → lowest linenumber), then copy owner fields down.
# --------------------------------------------------------------------------
@register(
    "join_deepest_owner_per_page",
    """
WITH ranked AS (
  SELECT l.l_orderkey, l.l_partkey, l.l_quantity, o.o_custkey, o.o_orderpriority,
         row_number() OVER (PARTITION BY l.l_orderkey
                            ORDER BY l.l_quantity DESC, l.l_linenumber ASC, l.l_partkey ASC) AS rn
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT l_orderkey, l_partkey, l_quantity, o_custkey, o_orderpriority
FROM ranked WHERE rn = 1 ORDER BY l_orderkey
""".strip(),
)
def q_deepest_owner(spark, sf_dir):
    # round 6 (guide §2.3 "aggregate before you shuffle"): the deepest
    # line per order is picked with ONE partial-aggregating min(struct)
    # over lineitem's four needed columns BEFORE the orders join — the
    # old shape joined first and windowed the full join output, shuffling
    # every lineitem row wide.  Equivalent because the join is per-order
    # 1:1 (o_orderkey unique) so rank-1-then-join == join-then-rank-1;
    # (-quantity, linenumber, partkey) lexicographic min == the window's
    # (quantity DESC, linenumber ASC, partkey ASC) rank 1, and
    # (orderkey, linenumber) is unique so ties cannot occur.  Output
    # identical (oracle-gated).
    l = _load(spark, sf_dir, "lineitem")
    o = _load(spark, sf_dir, "orders")
    best = (
        l.select("l_orderkey", "l_quantity", "l_linenumber", "l_partkey")
        .groupBy("l_orderkey")
        .agg(
            F.min(
                F.struct(
                    (-F.col("l_quantity")).alias("nq"),
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_partkey").alias("pk"),
                    F.col("l_quantity").alias("q"),
                )
            ).alias("w")
        )
        .select("l_orderkey", F.col("w.pk").alias("l_partkey"), F.col("w.q").alias("l_quantity"))
    )
    return (
        best.join(o, best.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_partkey", "l_quantity", "o_custkey", "o_orderpriority")
        .orderBy("l_orderkey")
    )


# --------------------------------------------------------------------------
# J3 + U3 + O2: anchor→volumes aggregation join with ordered child list
# (MetsIndexer.java:1157-1310 anchorMerge/collectVolumeInfo; volume sort
# :1185-1199).  Analog: per customer, ordered order list + stats.
# --------------------------------------------------------------------------
@register(
    "agg_anchor_volume_list",
    """
SELECT o_custkey AS custkey,
       count(*) AS num_volumes,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderdate, o_orderkey) AS volume_list,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY o_custkey ORDER BY custkey
""".strip(),
)
def q_anchor_volumes(spark, sf_dir):
    o = _load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("num_volumes"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("o_orderdate", "o_orderkey"))
                    ),
                    lambda s: s["o_orderkey"].cast("string"),
                ),
                ",",
            ).alias("volume_list"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# W3: volume renumbering LOG_0001… (MetsIndexer.java:1213-1218,1323-1377)
# --------------------------------------------------------------------------
@register(
    "window_volume_renumber",
    """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       printf('LOG_%04d', CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey) AS INT)) AS logid
FROM orders ORDER BY custkey, orderkey
""".strip(),
)
def q_renumber(spark, sf_dir):
    o = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.format_string("LOG_%04d", F.row_number().over(w)).alias("logid"),
    ).orderBy("custkey", "orderkey")


# --------------------------------------------------------------------------
# J5/Q6: existence / anti joins (findCurrentDataRepository,
# SolrSearchIndex.java:302-316; anchor-without-children scan :632-655)
# --------------------------------------------------------------------------
@register(
    "join_customers_without_orders",
    """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
""".strip(),
)
def q_anti(spark, sf_dir):
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# J6/Q5: duplicate-constraint semi-join with negated clause
# (+(URN:(v1 v2…)) -PI_TOPSTRUCT:pi; AbstractWriteStrategy.java:158-195)
# --------------------------------------------------------------------------
@register(
    "join_urn_conflict_check",
    """
SELECT DISTINCT l.l_partkey AS partkey
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F' AND l.l_partkey IN (
  SELECT l2.l_partkey FROM lineitem l2 JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
  WHERE o2.o_orderstatus = 'O'
)
ORDER BY partkey LIMIT 100
""".strip(),
)
def q_urn_conflict(spark, sf_dir):
    l = _load(spark, sf_dir, "lineitem")
    o = _load(spark, sf_dir, "orders")
    f_side = l.join(o, l.l_orderkey == o.o_orderkey).filter(F.col("o_orderstatus") == "F")
    o_side = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("o_orderstatus") == "O")
        .select("l_partkey")
    )
    return (
        f_side.join(o_side, "l_partkey", "left_semi")
        .select(F.col("l_partkey").alias("partkey"))
        .distinct()
        .orderBy("partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# A1/A6/A7: DEFAULT roll-up + FACET token split-dedup
# (MetadataHelper.java:1485-1506; AbstractWriteStrategy.java:201-241)
# --------------------------------------------------------------------------
@register(
    "agg_default_rollup",
    """
SELECT o_custkey AS custkey,
       array_to_string(list_sort(list_distinct(list(o_orderpriority))), ' ') AS default_field
FROM orders GROUP BY o_custkey ORDER BY custkey
""".strip(),
)
def q_rollup(spark, sf_dir):
    o = _load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.array_join(F.array_sort(F.collect_set("o_orderpriority")), " ").alias("default_field"))
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# A4: year gap interpolation (MetadataHelper.java:1132-1183
# completeYears: fill min..max, report the gaps)
# --------------------------------------------------------------------------
@register(
    "agg_year_gap_fill",
    """
WITH y AS (SELECT DISTINCT year(o_orderdate) AS yr FROM orders),
b AS (SELECT min(yr) AS lo, max(yr) AS hi FROM y),
allyears AS (SELECT unnest(generate_series(lo, hi)) AS yr FROM b)
SELECT yr AS missing_year FROM allyears
WHERE yr NOT IN (SELECT yr FROM y) ORDER BY yr
""".strip(),
)
def q_yearfill(spark, sf_dir):
    o = _load(spark, sf_dir, "orders")
    y = o.select(F.year("o_orderdate").alias("yr")).distinct()
    b = y.agg(F.min("yr").alias("lo"), F.max("yr").alias("hi"))
    allyears = b.select(F.explode(F.sequence("lo", "hi")).alias("yr"))
    return allyears.join(y, "yr", "left_anti").select(F.col("yr").alias("missing_year")).orderBy("missing_year")


# --------------------------------------------------------------------------
# F1-F3: date derivatives YEAR/YEARMONTH/YEARMONTHDAY/MONTHDAY/CENTURY
# (MetadataHelper.java:1053-1123, DateTools.java:202-247)
# --------------------------------------------------------------------------
@register(
    "fn_date_derivatives",
    """
SELECT o_orderkey AS orderkey,
       year(o_orderdate) AS year,
       year(o_orderdate) * 100 + month(o_orderdate) AS yearmonth,
       year(o_orderdate) * 10000 + month(o_orderdate) * 100 + day(o_orderdate) AS yearmonthday,
       month(o_orderdate) * 100 + day(o_orderdate) AS monthday,
       CAST(floor((year(o_orderdate) - 1) / 100) + 1 AS BIGINT) AS century,
       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS solr_instant
FROM orders ORDER BY orderkey LIMIT 1000
""".strip(),
)
def q_dates(spark, sf_dir):
    o = _load(spark, sf_dir, "orders")
    y, m, d = F.year("o_orderdate"), F.month("o_orderdate"), F.dayofmonth("o_orderdate")
    return (
        o.select(
            F.col("o_orderkey").alias("orderkey"),
            y.alias("year"),
            (y * 100 + m).cast("long").alias("yearmonth"),
            (y * 10000 + m * 100 + d).cast("long").alias("yearmonthday"),
            (m * 100 + d).alias("monthday"),
            (F.floor((y - 1) / 100) + 1).cast("long").alias("century"),
            F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("solr_instant"),
        )
        .orderBy("orderkey")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# P2/P4/P5/P7/O5: string normalization chain — replace rules, identifier
# sanitization, SORT_ twin with padding, 128-char truncation
# (MetadataHelper.java:823-854,885-902,1299-1305; ValueNormalizer.java)
# --------------------------------------------------------------------------
@register(
    "fn_string_normalize",
    """
SELECT p_partkey AS partkey,
       regexp_replace(p_name, '[ ,:()]', '_', 'g') AS pi_sanitized,
       lpad(regexp_replace(lower(p_name), '^(the|a|an) ', ''), 20, '0') AS sort_name,
       substr(upper(p_name), 1, 128) AS groupfield,
       regexp_replace(p_name, '\\s+', '.', 'g') AS one_token
FROM part ORDER BY partkey
""".strip(),
)
def q_normalize(spark, sf_dir):
    p = _load(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.regexp_replace("p_name", "[ ,:()]", "_").alias("pi_sanitized"),
        F.lpad(F.regexp_replace(F.lower("p_name"), "^(the|a|an) ", ""), 20, "0").alias("sort_name"),
        F.substring(F.upper("p_name"), 1, 128).alias("groupfield"),
        F.regexp_replace("p_name", "\\s+", ".").alias("one_token"),
    ).orderBy("partkey")


# --------------------------------------------------------------------------
# P1-P10 as a subsystem: config-driven field map with twins
# (MetadataConfigurationManager/FieldConfig analog; operators/fieldmap.py)
# --------------------------------------------------------------------------
_FIELD_SPECS = [
    FieldSpec(
        name="MD_TITLE",
        source="text",
        replace_rules=(("\\bthe\\b", "THE"),),
        default_cleanup=True,
        truncate=80,
        sort_twin=True,
        non_sort_prefixes=("THE ",),
        facet_twin=True,
        untokenized_twin=True,
    ),
    FieldSpec(
        name="PI",
        source="source",
        sanitize_identifier=True,
        lowercase=True,
        pad=("front", 12, "0"),
    ),
    FieldSpec(name="MD_ONE_TOKEN", source="lang", one_token=True, lowercase=True),
]


@register("fieldmap_extraction", field_map_sql(_FIELD_SPECS))
def q_fieldmap(spark, sf_dir):
    return apply_field_map(_load(spark, sf_dir, "documents"), _FIELD_SPECS).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q1-Q4: point lookup / conjunctive filter / projection / count
# (Indexer.java:315,367; MetsIndexer.java:446-455; SolrSearchIndex.java:174)
# --------------------------------------------------------------------------
@register(
    "q_point_lookup_projection",
    "SELECT o_orderkey AS orderkey, o_orderstatus AS status, o_totalprice AS totalprice "
    "FROM orders WHERE o_orderkey = 42",
)
def q_point(spark, sf_dir):
    return (
        _load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 42)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@register(
    "q_conjunctive_count",
    "SELECT count(*) AS num_hits FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000",
)
def q_count(spark, sf_dir):
    return (
        _load(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
        .agg(F.count("*").alias("num_hits"))
    )


# --------------------------------------------------------------------------
# U2: access-condition union/override via array ops
# (IndexObject.java:184-202 — parent conditions minus OPENACCESS union own)
# --------------------------------------------------------------------------
@register(
    "setop_access_conditions",
    """
SELECT n_nationkey AS nationkey,
       array_to_string(list_sort(list_distinct(
         list_concat(
           CASE WHEN n_regionkey = 0 THEN ['OPENACCESS'] ELSE ['RESTRICTED_' || CAST(n_regionkey AS VARCHAR)] END,
           ['BASE']
         ))), ',') AS access_conditions
FROM nation ORDER BY nationkey
""".strip(),
)
def q_access(spark, sf_dir):
    n = _load(spark, sf_dir, "nation")
    parent = F.when(F.col("n_regionkey") == 0, F.array(F.lit("OPENACCESS"))).otherwise(
        F.array(F.concat(F.lit("RESTRICTED_"), F.col("n_regionkey").cast("string")))
    )
    return n.select(
        F.col("n_nationkey").alias("nationkey"),
        F.array_join(F.array_sort(F.array_distinct(F.concat(parent, F.array(F.lit("BASE"))))), ",").alias(
            "access_conditions"
        ),
    ).orderBy("nationkey")


# --------------------------------------------------------------------------
# 2-C batch analog of the streaming ingest: event-time tumbling window agg
# (the poll-loop's windowed counterpart; streaming path in streaming/ingest)
# --------------------------------------------------------------------------
@register(
    "events_tumbling_window_agg",
    """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""".strip(),
)
def q_events_window(spark, sf_dir):
    e = _load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# O3: priority ordering (largest first — Hotfolder.java:489-491,993-1008)
# --------------------------------------------------------------------------
@register(
    "sort_priority_largest_first",
    """
SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
""".strip(),
)
def q_priority(spark, sf_dir):
    return (
        _load(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("orderkey"), F.col("o_totalprice").alias("totalprice"))
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(50)
    )
