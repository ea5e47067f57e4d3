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
    if len(pdf) == 0:  # Spark 4 grouped-map may deliver empty groups
        return pd.DataFrame([], columns=[c.split(" ")[0] for c in POSTINGS_SCHEMA.split(", ")])
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
    if len(pdf) == 0:
        return pd.DataFrame([], columns=cols)
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


def _merge_sorted_runs(pdf: pd.DataFrame, key_cols: list[str], out_seg_from_salt: bool,
                       size_threshold: int | None = None) -> pd.DataFrame:
    """Merge contiguous key groups of a (key, min_doc)-sorted frame.

    Single-row groups (the vast majority of the vocabulary — unique
    identifiers) pass through as one vectorized slice; only multi-row
    groups run the byte-splice merge loop.  ``size_threshold`` (compaction
    mode): multi-row groups whose total payload exceeds it also pass
    through unmerged (heavy-term skew protection)."""
    cols = [c.split(" ")[0] for c in POSTINGS_SCHEMA.split(", ")]
    if len(pdf) == 0:
        return pd.DataFrame([], columns=cols)
    key = pdf[key_cols[0]].astype(str)
    for c in key_cols[1:]:
        key = key + "\x00" + pdf[c].astype(str)
    k = key.to_numpy()
    change = np.concatenate(([True], k[1:] != k[:-1]))
    gid = np.cumsum(change) - 1
    counts = np.bincount(gid)
    single_mask = counts[gid] == 1

    outs = []
    singles = pdf.loc[single_mask]
    if len(singles):
        s = singles[cols].copy()
        if out_seg_from_salt:
            s["seg"] = singles["salt"].to_numpy(np.int32)
        outs.append(s)

    multi = pdf.loc[~single_mask]
    if len(multi):
        mk = k[~single_mask]
        mchange = np.concatenate(([0], np.flatnonzero(mk[1:] != mk[:-1]) + 1, [len(mk)]))
        for i in range(len(mchange) - 1):
            grp = multi.iloc[mchange[i]: mchange[i + 1]]
            if size_threshold is not None and int(grp["doc_bytes"].map(len).sum()) >= size_threshold:
                outs.append(grp[cols])
                continue
            out_seg = int(grp["salt"].iloc[0]) if out_seg_from_salt else int(grp["seg"].iloc[0])
            outs.append(merge_group_pdf(grp, out_seg=out_seg))
    return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame([], columns=cols)


def _stream_merge(df: DataFrame, key_cols: list[str], out_seg_from_salt: bool,
                  n_partitions: int, size_threshold: int | None = None) -> DataFrame:
    """repartition(key) → sortWithinPartitions(key, min_doc) → mapInPandas
    with a carry for groups spanning Arrow batches.  One pandas frame per
    batch instead of per group: the per-group applyInPandas overhead was
    the stage-2 bottleneck (25k tiny groups ≈ 100 s at 20k docs)."""

    def gen(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            key = pdf[key_cols[0]].astype(str)
            for c in key_cols[1:]:
                key = key + "\x00" + pdf[c].astype(str)
            k = key.to_numpy()
            change = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
            carry = pdf.iloc[change[-1]:]
            body = pdf.iloc[: change[-1]]
            if len(body):
                yield _merge_sorted_runs(body, key_cols, out_seg_from_salt, size_threshold)
        if carry is not None and len(carry):
            yield _merge_sorted_runs(carry, key_cols, out_seg_from_salt, size_threshold)

    shuffled = (
        df.repartition(n_partitions, *[F.col(c) for c in key_cols])
        .sortWithinPartitions(*key_cols, "min_doc")
    )
    return shuffled.mapInPandas(gen, POSTINGS_SCHEMA)


def merge_partials(partials: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Stage 2: salted merge.  Output rows keyed (term, salt) with
    seg := salt (the merge-group id)."""
    salted = partials.withColumn("salt", (F.col("seg") / cfg.merge_fanin).cast("int"))
    return _stream_merge(salted, ["term", "salt"], True, cfg.shuffle_partitions)


def compact_light_terms(merged: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Second pass: stitch small multi-row terms to one row, in-stream
    (the per-term size decision happens inside the sorted partition — no
    separate sizes aggregation or semi/anti joins).

    Heavy terms (total payload ≥ compact_below_bytes) keep their salt-group
    rows — concentrating a stopword's full posting list on one reducer is
    exactly the skew stage 2 exists to avoid.
    """
    return _stream_merge(merged, ["term"], False, cfg.shuffle_partitions,
                         size_threshold=cfg.compact_below_bytes)
