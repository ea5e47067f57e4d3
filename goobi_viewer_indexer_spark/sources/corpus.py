"""Deterministic synthetic source-code corpus — the BASELINE.json
``input_hint`` table shape::

    repo:string, path:string, commit:string, lang:string, content:string

Replaces the reference's fixture corpus (src/test/resources/{METS,LIDO,…})
with a seeded generator that exercises every indexing edge the reference's
fixtures do (FIXTURES.md §1): Zipf-distributed shared vocabulary
(stopword-scale skewed terms → the salted-merge path), rare per-file
identifiers (unique terms), repeated tokens (tf>1), unicode needing NFC,
and empty/whitespace-only files.

Generation is distributed AND vectorized: a range DataFrame is expanded on
executors via ``mapInPandas``; all randomness comes from a counter-based
splitmix64 over (seed, row_id, stream) so the corpus is a pure function of
row ids — identical under any partitioning, and fast (no per-row RNG
objects; the first implementation spent ~10 ms/row constructing
``default_rng`` per document).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = np.array(["java", "python", "js", "go", "c", "md", "xml"], dtype=object)
LANG_EXT = {"java": "java", "python": "py", "js": "js", "go": "go", "c": "c", "md": "md", "xml": "xml"}
_LANG_CDF = np.cumsum([0.3, 0.25, 0.15, 0.1, 0.1, 0.06, 0.04])

# shared vocabulary, Zipf-ranked: rank 0 ("def") is stopword-scale
_VOCAB = np.array(
    [
        "def", "return", "if", "else", "for", "while", "import", "class",
        "public", "static", "void", "int", "string", "value", "result",
        "data", "self", "this", "new", "null", "true", "false", "func",
        "var", "let", "const", "print", "len", "range", "list", "map",
        "append", "index", "key", "node", "item", "count", "error", "err",
        "nil", "type", "struct", "interface", "package", "main", "test",
        "assert", "equals", "object", "array", "buffer", "stream", "read",
        "write", "open", "close", "file", "path", "name", "size", "util",
        "parse", "token", "lexer", "state", "config", "init", "update",
        "delete", "insert", "query", "table", "row", "column", "schema",
        "café", "naïve", "über", "señor",  # unicode / NFC cases
    ]
    + [f"word{i}" for i in range(400)],
    dtype=object,
)
_ZIPF_W = 1.0 / np.arange(1, len(_VOCAB) + 1) ** 1.07
_ZIPF_CDF = np.cumsum(_ZIPF_W / _ZIPF_W.sum())
_SEPS = np.array([" ", " ", " ", "\n", "(", ".", "_"], dtype=object)

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

__all__ = ["generate_corpus", "CORPUS_SCHEMA", "gen_rows_pdf"]

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    z = (x + _GOLD).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(seed: int, rids: np.ndarray, stream: int) -> np.ndarray:
    """Uniform [0,1) per row, pure function of (seed, row_id, stream)."""
    x = rids.astype(np.uint64) * np.uint64(0x100000001B3) + np.uint64(seed * 1_000_003 + stream)
    return _splitmix64(x).astype(np.float64) / 2.0**64


def gen_rows_pdf(row_ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate rows for the given row ids — fully vectorized."""
    rids = np.asarray(row_ids, dtype=np.int64)
    n = rids.size
    if n == 0:
        return pd.DataFrame({c: [] for c in ["repo", "path", "commit", "lang", "content"]})

    lang_idx = np.searchsorted(_LANG_CDF, _u01(seed, rids, 1), side="right").clip(0, len(LANGS) - 1)
    langs = LANGS[lang_idx]
    pkg = (_u01(seed, rids, 2) * 50).astype(np.int64)

    # 40-hex commit: 2.5 × 16-hex chunks via buffer-level hex (vectorized)
    def hex16(stream: int) -> np.ndarray:
        h = _splitmix64(rids.astype(np.uint64) + np.uint64(seed + 77 + stream))
        return np.frombuffer(h.astype(">u8").tobytes().hex().encode(), dtype="S16").astype(str).astype(object)

    commits = (
        pd.Series(hex16(0), dtype=object)
        + pd.Series(hex16(1), dtype=object)
        + pd.Series(np.frombuffer(
            _splitmix64(rids.astype(np.uint64) + np.uint64(seed + 79))
            .astype(">u8").tobytes().hex().encode(), dtype="S8"
        )[::2].astype(str).astype(object), dtype=object)
    ).to_numpy()

    r_kind = _u01(seed, rids, 3)
    n_tok = (20 + _u01(seed, rids, 4) * 380).astype(np.int64)
    n_tok[r_kind < 0.01] = 0          # empty file
    n_tok[(r_kind >= 0.01) & (r_kind < 0.02)] = -1  # whitespace-only marker

    # flat token sampling: per (row, position) uniform → Zipf inverse-CDF
    pos_counts = np.maximum(n_tok, 0)
    total = int(pos_counts.sum())
    flat_row = np.repeat(np.arange(n), pos_counts)
    flat_rid = rids[flat_row]
    pos_in_row = np.arange(total) - np.repeat(np.cumsum(pos_counts) - pos_counts, pos_counts)
    u = _splitmix64(
        flat_rid.astype(np.uint64) * np.uint64(0x9E3779B1) + pos_in_row.astype(np.uint64) + np.uint64(seed * 31 + 9)
    ).astype(np.float64) / 2.0**64
    tok_idx = np.searchsorted(_ZIPF_CDF, u, side="right").clip(0, len(_VOCAB) - 1)
    toks = _VOCAB[tok_idx]
    sep_idx = np.searchsorted(
        np.linspace(1 / 7, 1, 7), _u01(seed, flat_rid + pos_in_row, 10), side="right"
    ).clip(0, 6)
    # pandas object-concat: ~40x faster than np.char.add on 4M strings
    pieces = (pd.Series(toks, dtype=object) + pd.Series(_SEPS[sep_idx], dtype=object)).to_numpy()

    # assemble contents per row
    contents = np.empty(n, dtype=object)
    bounds = np.concatenate(([0], np.cumsum(pos_counts)))
    ident_rep = 1 + (_u01(seed, rids, 5) * 3).astype(np.int64)
    ident_num = (_u01(seed, rids, 6) * 10**6).astype(np.int64)
    for i in range(n):
        if n_tok[i] == 0:
            contents[i] = ""
        elif n_tok[i] == -1:
            contents[i] = "   \n\t  "
        else:
            body = "".join(pieces[bounds[i]: bounds[i + 1]])
            ident = f"id{rids[i]}x{ident_num[i]} "
            contents[i] = ident * int(ident_rep[i]) + body

    return pd.DataFrame(
        {
            "repo": [f"org{r % 7}/repo{r % 101}" for r in rids],
            "path": [
                f"src/pkg{p}/file_{r}.{LANG_EXT[lg]}" for p, r, lg in zip(pkg, rids, langs)
            ],
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


def generate_corpus(spark: SparkSession, n_rows: int, seed: int = 42, parallelism: int | None = None) -> DataFrame:
    """Distributed corpus generation: range DataFrame → mapInPandas."""
    parallelism = parallelism or spark.sparkContext.defaultParallelism

    def gen(it):
        for pdf in it:
            yield gen_rows_pdf(pdf["id"].to_numpy(), seed)

    return (
        spark.range(0, n_rows, 1, parallelism)
        .mapInPandas(gen, CORPUS_SCHEMA)
    )
