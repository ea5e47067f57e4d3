"""Field-extraction DSL (P1-P10 subsystem) — Spark output vs its own
generated DuckDB SQL on planted rows covering every transform."""

from __future__ import annotations

import duckdb
import pytest

from goobi_viewer_indexer_spark.operators.fieldmap import FieldSpec, apply_field_map, field_map_sql

SPECS = [
    FieldSpec(
        name="TITLE",
        source="raw_title",
        replace_rules=(("&amp;", "&"),),
        strip_html=True,
        default_cleanup=True,
        truncate=40,
        sort_twin=True,
        non_sort_prefixes=("the ", "a "),
        facet_twin=True,
        untokenized_twin=True,
    ),
    FieldSpec(name="PI", source="raw_pi", sanitize_identifier=True, pad=("front", 10, "0")),
    FieldSpec(name="LBL", source="raw_lbl", lowercase=True, one_token=True),
]

ROWS = [
    (0, "The <b>Quick</b> Brown,Fox;jumps:here &amp; there", "AB 12:3(x)", "Multi Word Label"),
    (1, "a plain title", "PI-1", "x"),
    (2, "", "", ""),             # all-blank → skipped (P10)
    (3, None, None, None),       # nulls → blank → skipped
    (4, "   spaced   out  ", "ok", "Tab\tSep"),
]


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(ROWS, "doc_id long, raw_title string, raw_pi string, raw_lbl string")


def test_fieldmap_matches_own_sql(spark, planted):
    got = apply_field_map(planted, SPECS).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.register("documents", planted.toPandas())
    exp = con.sql(field_map_sql(SPECS)).fetchall()
    assert [tuple(r) for r in got] == exp
    ids = [r["doc_id"] for r in got]
    assert 2 not in ids and 3 not in ids  # blank-skip predicate


def test_fieldmap_transform_semantics(spark, planted):
    row = {r["doc_id"]: r for r in apply_field_map(planted, SPECS).collect()}
    r0 = row[0]
    assert "<b>" not in r0["TITLE"] and "&amp;" not in r0["TITLE"]
    assert "," not in r0["TITLE"] and ";" not in r0["TITLE"]
    assert len(r0["TITLE"]) <= 40
    assert not r0["SORT_TITLE"].startswith("the ")
    assert r0["FACET_TITLE"] == r0["TITLE"].lower()
    assert r0["TITLE_UNTOKENIZED"] == ROWS[0][1]
    assert r0["PI"] == "AB_12_3_x_".rjust(10, "0")
    assert row[4]["LBL"] == "tab.sep"


def test_snippets_window_edges(spark):
    from goobi_viewer_indexer_spark.operators.highlight import snippets

    rows = [
        (0, "target at the very start of this doc"),
        (1, "some words before the target appears here later on"),
        (2, "no match here at all"),
        (3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["match_pos"], r["snippet"]) for r in snippets(docs, ["target"], width=3).collect()}
    assert set(out) == {0, 1}
    assert out[0] == (1, "target at the very")            # front-clipped window
    assert out[1] == (5, "words before the target appears here later")
