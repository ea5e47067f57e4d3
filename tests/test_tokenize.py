import pandas as pd
import pytest

from goobi_viewer_indexer_spark.functions import tokenize as tk


CASES = [
    ("Hello, World!", ["hello", "world"]),
    ("foo_bar baz-42 x", ["foo", "bar", "baz", "42", "x"]),
    ("", []),
    (None, []),
    ("   \t\n ", []),
    ("CamelCase123", ["camelcase123"]),
    ("a,;:b", ["a", "b"]),  # reference DEFAULT cleanup analog, Indexer.java:492-498
    ("x" * 5000, ["x" * 5000]),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_tokenize_py(raw, expected):
    assert tk.tokenize_py(raw) == expected


def test_tokenize_series_matches_py():
    vals = [c[0] for c in CASES]
    out = tk.tokenize_series(pd.Series(vals, dtype=object)).tolist()
    assert out == [c[1] for c in CASES]


def test_nfc_normalization():
    # e + combining acute (NFD) vs precomposed é (NFC) tokenize identically
    nfd = "Café menu"
    nfc = "Café menu"
    assert tk.tokenize_py(nfd) == tk.tokenize_py(nfc)


def test_expr_matches_py_on_ascii(spark):
    from pyspark.sql import functions as F

    vals = [(c[0],) for c in CASES if c[0] is not None]
    df = spark.createDataFrame(vals, "text string")
    got = [r["toks"] for r in df.select(tk.tokenize_expr("text").alias("toks")).collect()]
    assert got == [tk.tokenize_py(v[0]) for v in vals]
