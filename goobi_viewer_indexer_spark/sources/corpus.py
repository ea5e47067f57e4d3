"""Deterministic synthetic source-code corpus — the BASELINE.json
``input_hint`` table shape::

    repo:string, path:string, commit:string, lang:string, content:string

Replaces the reference's fixture corpus (src/test/resources/{METS,LIDO,…})
with a seeded generator that exercises every indexing edge the reference's
fixtures do (FIXTURES.md §1): Zipf-distributed shared vocabulary
(stopword-scale skewed terms → the salted-merge path), rare per-file
identifiers (unique terms), repeated tokens (tf>1), unicode needing NFC,
and empty/whitespace-only files.

Generation is distributed: a tiny seed DataFrame of row-id ranges is
exploded on executors via ``mapInPandas`` — at 10^12-file design scale the
driver never materializes rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["java", "python", "js", "go", "c", "md", "xml"]
LANG_EXT = {"java": "java", "python": "py", "js": "js", "go": "go", "c": "c", "md": "md", "xml": "xml"}
LANG_P = np.array([0.3, 0.25, 0.15, 0.1, 0.1, 0.06, 0.04])

# shared vocabulary, Zipf-ranked: rank 0 ("def") is stopword-scale
_VOCAB = [
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
] + [f"word{i}" for i in range(400)]
_ZIPF_W = 1.0 / np.arange(1, len(_VOCAB) + 1) ** 1.07
_ZIPF_P = _ZIPF_W / _ZIPF_W.sum()

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

__all__ = ["generate_corpus", "CORPUS_SCHEMA", "gen_rows_pdf"]


def gen_rows_pdf(row_ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate rows for the given global row ids — pure function of
    (row_id, seed), so any partitioning yields the identical corpus."""
    out = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    vocab = np.asarray(_VOCAB, dtype=object)
    for rid in row_ids:
        rng = np.random.default_rng(seed * 1_000_003 + int(rid))
        repo = f"org{rid % 7}/repo{rid % 101}"
        lang = LANGS[int(rng.choice(len(LANGS), p=LANG_P))]
        path = f"src/pkg{int(rng.integers(0, 50))}/file_{rid}.{LANG_EXT[lang]}"
        commit = "".join(np.char.mod("%x", rng.integers(0, 16, 40)).tolist())
        r = rng.random()
        if r < 0.01:
            content = ""           # empty file
        elif r < 0.02:
            content = "   \n\t  "  # whitespace-only
        else:
            n_tok = int(rng.integers(20, 400))
            toks = list(vocab[rng.choice(len(vocab), size=n_tok, p=_ZIPF_P)])
            # rare per-file identifier, repeated (tf>1)
            ident = f"id{rid}x{int(rng.integers(0, 10**6))}"
            reps = int(rng.integers(1, 4))
            for _ in range(reps):
                toks.insert(int(rng.integers(0, len(toks) + 1)), ident)
            seps = rng.choice([" ", " ", " ", "\n", "(", ".", "_"], size=len(toks))
            content = "".join(t + s for t, s in zip(toks, seps))
        out["repo"].append(repo)
        out["path"].append(path)
        out["commit"].append(commit)
        out["lang"].append(lang)
        out["content"].append(content)
    return pd.DataFrame(out)


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
