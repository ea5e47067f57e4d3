"""SPIMI posting-list construction + salted merge.

Replaces the write path the reference delegates to Solr/Lucene (batched
``client.add(docs)`` at helper/SolrSearchIndex.java:388-413 and Lucene's
own segment building/merging).  Two stages, both Arrow-vectorized:

* **stage 1 (narrow)** — ``documents.groupBy(seg).applyInPandas``:
  each segment covers a contiguous doc_id range (``seg = doc_id //
  docs_per_segment``), so merged posting lists stay globally docID-sorted
  by construction.  One vectorized :func:`codec.encode_many` call per
  segment; no per-term Python.
* **stage 2 (wide, skew-safe)** — ``groupBy(term, salt)`` where
  ``salt = seg // merge_fanin``: a stopword-scale term present in every
  segment is merged by ceil(nseg/fanin) parallel tasks instead of one hot
  reducer (the explicit skew split the north rule requires; reference's
  nearest analog is its biggest-folder-first queue, helper/
  Hotfolder.java:489-491).  The merge itself is byte-level concatenation
  with a first-gap splice — no decode/re-encode of payloads.
* **optional compaction (narrow-ish)** — terms whose total payload is
  small are stitched to a single row per term (light terms dominate the
  vocabulary; this keeps query-side fan-in at 1 row for most terms while
  heavy terms intentionally stay split across salt groups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.functions import codec
from goobi_viewer_indexer_spark.functions.tokenize import tokenize_series

POSTINGS_SCHEMA = (
    "term string, seg int, df int, cf long, min_doc long, max_doc long, "
    "doc_bytes binary, tf_bytes binary, block_last_doc array<long>, "
    "block_doc_off array<long>, block_tf_off array<long>, block_max_w array<double>"
)

__all__ = ["POSTINGS_SCHEMA", "build_partials", "merge_partials", "compact_light_terms", "merge_group_pdf"]


def _build_segment_pdf(pdf: pd.DataFrame, avgdl: float, cfg: IndexConfig) -> pd.DataFrame:
    """One SPIMI segment: pandas rows (doc_id, text, seg) → postings rows."""
    seg = int(pdf["seg"].iloc[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    pdf = pdf.iloc[order]
    tokens = tokenize_series(pdf["text"])
    doc_ids = pdf["doc_id"].to_numpy(np.int64)
    lens = tokens.map(len).to_numpy(np.int64)
    total = int(lens.sum())
    if total == 0:
        return pd.DataFrame([], columns=[c.split(" ")[0] for c in POSTINGS_SCHEMA.split(", ")])

    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in tokens if t])
    flat_docs = np.repeat(doc_ids, lens)
    flat_dl = np.repeat(lens, lens)

    # sort by (term, doc) and collapse duplicates into tf counts
    g = (
        pd.DataFrame({"term": flat_terms, "doc": flat_docs, "dl": flat_dl})
        .groupby(["term", "doc"], sort=True)
        .agg(tf=("dl", "size"), dl=("dl", "first"))
        .reset_index()
    )
    terms = g["term"].to_numpy(object)
    docs = g["doc"].to_numpy(np.int64)
    tfs = g["tf"].to_numpy(np.int64)
    dls = g["dl"].to_numpy(np.int64)

    # term run boundaries (terms sorted)
    newterm = np.ones(len(terms), dtype=bool)
    newterm[1:] = terms[1:] != terms[:-1]
    starts = np.flatnonzero(newterm)

    w = codec.bm25_weight(tfs, dls, avgdl, cfg.k1, cfg.b)
    enc = codec.encode_many(docs, tfs, w, starts, cfg.block_size)

    cf = np.add.reduceat(tfs, starts)
    return pd.DataFrame(
        {
            "term": terms[starts],
            "seg": np.int32(seg),
            "df": enc["counts"].astype(np.int32),
            "cf": cf.astype(np.int64),
            "min_doc": enc["min_doc"],
            "max_doc": enc["max_doc"],
            "doc_bytes": enc["doc_bytes"],
            "tf_bytes": enc["tf_bytes"],
            "block_last_doc": enc["block_last_doc"],
            "block_doc_off": enc["block_doc_off"],
            "block_tf_off": enc["block_tf_off"],
            "block_max_w": enc["block_max_w"],
        }
    )


def build_partials(docs: DataFrame, avgdl: float, cfg: IndexConfig) -> DataFrame:
    """Stage 1.  ``docs`` must have (doc_id, text, seg)."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _build_segment_pdf(pdf, avgdl, cfg)

    return docs.select("doc_id", "text", "seg").groupBy("seg").applyInPandas(fn, POSTINGS_SCHEMA)


def merge_group_pdf(pdf: pd.DataFrame, out_seg: int | None = None) -> pd.DataFrame:
    """Merge all rows of ONE term (already doc-range-disjoint) into a single
    row by byte concatenation + first-gap splice.  Rows ordered by min_doc."""
    cols = [c.split(" ")[0] for c in POSTINGS_SCHEMA.split(", ")]
    if len(pdf) == 1:
        out = pdf.iloc[[0]][cols].copy()
        if out_seg is not None:
            out["seg"] = np.int32(out_seg)
        return out
    pdf = pdf.sort_values("min_doc")
    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    bl_doc, bd_off, bt_off, bm_w = [], [], [], []
    d_base = t_base = 0
    prev_last = None
    for row in pdf.itertuples(index=False):
        db = bytes(row.doc_bytes)
        delta = 0
        if prev_last is not None:
            db, delta = codec.splice_first_gap(db, int(row.min_doc) - prev_last - 1)
        doc_chunks.append(db)
        tf_chunks.append(bytes(row.tf_bytes))
        offs = np.asarray(row.block_doc_off, dtype=np.int64)
        # blocks after the first shift by the splice delta; block 0 offset is 0
        adj = offs.copy()
        adj[1:] += delta
        bd_off.append(adj + d_base)
        bt_off.append(np.asarray(row.block_tf_off, dtype=np.int64) + t_base)
        bl_doc.append(np.asarray(row.block_last_doc, dtype=np.int64))
        bm_w.append(np.asarray(row.block_max_w, dtype=np.float64))
        d_base += len(db)
        t_base += len(bytes(row.tf_bytes))
        prev_last = int(row.max_doc)
    first = pdf.iloc[0]
    return pd.DataFrame(
        {
            "term": [first["term"]],
            "seg": [np.int32(out_seg if out_seg is not None else first["seg"])],
            "df": [np.int32(pdf["df"].sum())],
            "cf": [np.int64(pdf["cf"].sum())],
            "min_doc": [np.int64(pdf["min_doc"].min())],
            "max_doc": [np.int64(pdf["max_doc"].max())],
            "doc_bytes": [b"".join(doc_chunks)],
            "tf_bytes": [b"".join(tf_chunks)],
            "block_last_doc": [np.concatenate(bl_doc)],
            "block_doc_off": [np.concatenate(bd_off)],
            "block_tf_off": [np.concatenate(bt_off)],
            "block_max_w": [np.concatenate(bm_w)],
        }
    )


def merge_partials(partials: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Stage 2: salted merge.  Output rows keyed (term, salt) with
    seg := salt (the merge-group id)."""
    fanin = cfg.merge_fanin

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return merge_group_pdf(pdf, out_seg=int(key[1]))

    salted = partials.withColumn("salt", (F.col("seg") / fanin).cast("int"))
    return salted.groupBy("term", "salt").applyInPandas(fn, POSTINGS_SCHEMA)


def compact_light_terms(merged: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Second narrow-ish pass: stitch small multi-row terms to one row.

    Heavy terms (total payload ≥ compact_below_bytes) keep their salt-group
    rows — concentrating a stopword's full posting list on one reducer is
    exactly the skew stage 2 exists to avoid.
    """
    sizes = merged.groupBy("term").agg(
        F.sum(F.length("doc_bytes")).alias("bytes"), F.count("*").alias("nrows")
    )
    light = sizes.filter((F.col("nrows") > 1) & (F.col("bytes") < cfg.compact_below_bytes)).select("term")

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return merge_group_pdf(pdf, out_seg=0)

    light_rows = merged.join(light, "term", "left_semi")
    heavy_rows = merged.join(light, "term", "left_anti")
    compacted = light_rows.groupBy("term").applyInPandas(fn, POSTINGS_SCHEMA)
    return compacted.unionByName(heavy_rows)
