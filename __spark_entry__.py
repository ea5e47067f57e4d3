"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`goobi_viewer_indexer_spark.suite`, which registers one
(queries, oracle_sql) pair per implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from goobi_viewer_indexer_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the BM25 top-k matrix (or/and/missing/stopword,
    naive DataFrame scorer) over sf0.001 documents."""
    return suite.queries()["bm25_naive_matrix"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
