"""goobi_viewer_indexer_spark — a from-scratch PySpark-native fulltext
indexing + BM25 query engine with the capabilities of
intranda/goobi-viewer-indexer (reference at /root/reference).

The reference is a single-JVM Java daemon that flattens METS/LIDO/EAD/...
records into Solr documents and delegates all query execution (tokenize,
posting lists, BM25) to Solr/Lucene.  This package re-creates both halves
natively on Spark:

* the **index-build dataflow** (SURVEY.md §2-A) as a declarative batch DAG:
  tokenize → doc/term stats → SPIMI per-segment posting construction →
  salted merge → atomic segment write with lineage manifests
  (checkpoint-resumable), plus incremental MERGE/delete semantics;
* the **query contract the reference outsources to Solr** (SURVEY.md §2-B):
  top-k BM25 (k1=1.2, b=0.75) conjunctive/disjunctive search with
  block-max WAND pruning over delta-gap varint-compressed postings.

All heavy lifting is DataFrame-native or Arrow-vectorized pandas UDFs —
no per-row Python, no RDDs in the hot path.
"""

__version__ = "0.1.0"

from goobi_viewer_indexer_spark.config import IndexConfig  # noqa: F401
