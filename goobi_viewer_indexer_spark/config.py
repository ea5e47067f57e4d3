"""Engine configuration.

The reference drives its behavior from ``config_indexer.xml``
(``model/config/MetadataConfigurationManager.java:88-260``); we use a plain
dataclass.  The BM25 parameters are pinned to Solr 9's default
BM25Similarity (k1=1.2, b=0.75), the similarity the reference relies on
(solr-solrj 9.10.1 per reference pom.xml:70).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    # --- BM25 scoring (Solr 9 defaults; BASELINE.json north rule) ---
    k1: float = 1.2
    b: float = 0.75

    # --- segment layout ---
    # Target docs per stage-1 SPIMI segment.  Each segment covers a
    # contiguous doc_id range so merged posting lists stay globally
    # doc_id-sorted by construction (concatenation in segment order).
    # At 100 TB this is the knob that bounds per-task memory: a segment's
    # in-memory term->postings dict must fit in one executor task.
    docs_per_segment: int = 4096
    max_segments: int = 65536

    # --- merge fan-in (explicit skew handling / "salted merge") ---
    # Stage-2 merges at most ``merge_fanin`` stage-1 partials per task for
    # any single term.  A stopword-scale term appearing in every segment is
    # therefore split across ceil(nseg/fanin) parallel merge tasks instead
    # of landing on one hot reducer (the skew the north rule calls out).
    merge_fanin: int = 8
    # Terms whose total merged payload is below this byte size are
    # compacted to a single row in a second narrow pass (light terms
    # dominate the vocabulary; this keeps query-side row counts low).
    compact_below_bytes: int = 1 << 16

    # --- posting codec ---
    block_size: int = 128          # postings per skip/block-max block
    postings_buckets: int = 64     # hash-partition count of the postings
    # table on pmod(hash(term), buckets) → parquet partition pruning turns
    # a query-term lookup into a handful of file reads.

    # --- build parallelism ---
    shuffle_partitions: int = 32

    extra: dict = field(default_factory=dict)
