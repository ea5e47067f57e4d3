"""Incremental index maintenance: delete, append, atomic update, compact.

Reference analogs:
* delete-by-id with optional trace tombstone — Indexer.java:365-436
  (deleteWithPI) + :450-473 (DATEDELETED trace doc) → sorted tombstone
  table + exact term_stats correction; postings stay until compaction,
  the scorer filters tombstoned docs (Lucene-style deferred purge).
* prepareUpdate / iddocsToDelete (old-minus-new) — Indexer.java:1695-1756
  → :func:`update_docs` = delete old ids + append re-indexed rows.
* atomic partial update — SolrSearchIndex.java:328-343 → same path (a
  changed doc is a delete + append; dense ids are engine-internal).
* optimize / segment merge — SolrSearchIndex.java:565-577 →
  :func:`compact`: decode → drop tombstoned → re-encode, then stats and
  doclens rewritten exactly; tombstones cleared.

Scale notes: deletes touch only term_stats rows of affected terms and
append one tombstone row per doc; appends build partials ONLY for the new
segment ranges (new docs start at the next span boundary so appended
posting rows can never collide with existing (term, rng) pairs — the
scorer's ≤1-list-per-term-per-range invariant survives without rewriting
old rows).  :func:`purge_compact` rewrites only tombstone-affected rows
(the routine job at 100 TB); the full :func:`compact` (which also
re-bases block maxima on the live avgdl) is the rare full rewrite.
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig
from goobi_viewer_indexer_spark.functions import codec
from goobi_viewer_indexer_spark.functions.hashing import sha256_hex
from goobi_viewer_indexer_spark.functions.tokenize import doclen_nfc
from goobi_viewer_indexer_spark.operators import spimi
from goobi_viewer_indexer_spark.plans import txn
from goobi_viewer_indexer_spark.plans.build import load_meta, _write_meta, assign_sequential_ids

__all__ = [
    "delete_docs",
    "delete_by_query",
    "add_docs",
    "update_docs",
    "set_stored_fields",
    "get_stored",
    "compact",
    "purge_compact",
    "live_corpus_stats",
    "recover_pending",
]


def _cfg_from_meta(meta: dict) -> IndexConfig:
    return IndexConfig(
        k1=meta["k1"],
        b=meta["b"],
        docs_per_segment=meta["docs_per_segment"],
        merge_fanin=meta["merge_fanin"],
        block_size=meta["block_size"],
        postings_buckets=meta["postings_buckets"],
    )


def _tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    p = txn.table_path(index_dir, "tombstones")
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p)


def live_corpus_stats(spark: SparkSession, index_dir: str) -> tuple[int, float]:
    ds = spark.read.parquet(txn.table_path(index_dir, "doc_stats"))
    tomb = _tombstones(spark, index_dir)
    if tomb is not None:
        ds = ds.join(tomb.select("doc_id"), "doc_id", "left_anti")
    row = ds.agg(F.count("*").alias("n"), F.avg("doclen").alias("avgdl")).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def live_corpus_stats_fielded(spark: SparkSession, index_dir: str, fields: list[str]) -> tuple[int, dict[str, float]]:
    ds = spark.read.parquet(txn.table_path(index_dir, "doc_stats"))
    tomb = _tombstones(spark, index_dir)
    if tomb is not None:
        ds = ds.join(tomb.select("doc_id"), "doc_id", "left_anti")
    row = ds.agg(
        F.count("*").alias("n"), *[F.avg(f"doclen_{f}").alias(f"avgdl_{f}") for f in fields]
    ).collect()[0]
    return int(row["n"]), {f: float(row[f"avgdl_{f}"] or 0.0) for f in fields}


def _refresh_live_meta(spark: SparkSession, index_dir: str) -> dict:
    meta = load_meta(index_dir)
    if "fields" in meta:
        n_live, avgdls_live = live_corpus_stats_fielded(spark, index_dir, meta["fields"])
        meta["n_docs_live"] = n_live
        meta["avgdl_live_by_field"] = avgdls_live
    else:
        n_live, avgdl_live = live_corpus_stats(spark, index_dir)
        meta["n_docs_live"] = n_live
        meta["avgdl_live"] = avgdl_live
    _write_meta(index_dir, meta)
    return meta


def delete_docs(
    spark: SparkSession, index_dir: str, doc_ids: list[int], trace: bool = True, tag: str | None = None
) -> dict:
    """Tombstone ``doc_ids`` and correct term_stats exactly, crash-atomically.

    ``trace=True`` keeps a DATEDELETED-style record (reference tombstone
    doc, Indexer.java:450-473); ``trace=False`` (purge) only marks.

    Commit protocol (:mod:`.txn`): the effective id set is staged as
    parquet BEFORE any mutation, both the tombstone delta and the corrected
    term_stats are staged, then applied with individually idempotent steps
    — a crash anywhere is healed by retrying with the same ``tag`` (or by
    the automatic :func:`recover_pending` on the next maintenance call),
    and stats can never decrement twice nor diverge from the tombstones."""
    if tag is None:
        tag = f"del_{int(time.time() * 1000)}"
    ids = sorted(set(int(i) for i in doc_ids))
    ids_df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    return _delete_df(spark, index_dir, ids_df, trace, tag)


def _delete_df(spark: SparkSession, index_dir: str, ids_df: DataFrame, trace: bool, tag: str,
               recover: bool = True) -> dict:
    """Distributed delete core: the id set never touches the driver —
    dedup/filtering is an anti-join, the pinned copy is a staged parquet,
    per-range id arrays reach the stats decoder as packed binary columns
    (the delete-by-query path can carry millions of matches)."""
    if txn.txn_done(index_dir, tag):
        return load_meta(index_dir)
    if recover:
        # heal any OTHER crashed txn before mutating (ADVICE r2: a torn add
        # leaves doc_stats ahead of postings until something recovers it)
        recover_pending(spark, index_dir, skip_tag=tag)
    ts_path = txn.table_path(index_dir, "term_stats")
    txn.recover_dir(ts_path)
    meta = load_meta(index_dir)
    span = meta["docs_per_segment"] * meta["merge_fanin"]

    # ---- stage 0: pin the EFFECTIVE id set (distinct, minus already-
    # tombstoned — replays after this txn's own tombstone append read the
    # staged copy, so the set can never shrink to empty mid-txn) ----
    if not txn.staging_complete(index_dir, tag, "ids"):
        eff = ids_df.select(F.col("doc_id").cast("long").alias("doc_id")).distinct()
        tomb = _tombstones(spark, index_dir)
        if tomb is not None:
            eff = eff.join(tomb.select("doc_id").distinct(), "doc_id", "left_anti")
        eff.write.mode("overwrite").parquet(txn.staged_path(index_dir, tag, "ids"))
    txn.txn_intent(index_dir, tag, {"op": "delete", "trace": bool(trace)})
    ids = spark.read.parquet(txn.staged_path(index_dir, tag, "ids"))
    if ids.limit(1).count() == 0:
        txn.txn_commit(index_dir, tag)
        return meta

    # ---- stage 1: tombstone delta ----
    if not (txn.step_applied(index_dir, tag, "tombstones") or txn.staging_complete(index_dir, tag, "tombstones")):
        (
            ids.select(
                "doc_id",
                F.lit(float(time.time())).alias("deleted_ts"),
                F.lit(bool(trace)).alias("trace"),
            )
            .write.mode("overwrite")
            .parquet(txn.staged_path(index_dir, tag, "tombstones"))
        )

    # ---- stage 2: corrected term_stats ----
    # exact (df, cf) correction per term: the packed per-range id arrays
    # JOIN the exploded postings rows, so only affected ranges are decoded
    # and only their deleted ids ship to each task.  Staged from the LIVE
    # (pre-swap) stats; the in-dir swap marker tells a replay whether live
    # already contains this txn (no double decrement).
    if not (
        txn.step_applied(index_dir, tag, "term_stats")
        or txn.swap_already_live(ts_path, tag)
        or txn.staging_complete(index_dir, tag, "term_stats")
    ):
        def pack_ids(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame({"rng": [], "del_ids": []}).astype({"rng": "int32"})
            arr = np.sort(pdf["doc_id"].to_numpy(np.int64))
            return pd.DataFrame({"rng": [int(pdf["rng"].iloc[0])], "del_ids": [arr.tobytes()]})

        del_packed = (
            ids.withColumn("rng", (F.col("doc_id") / span).cast("int"))
            .groupBy("rng")
            .applyInPandas(pack_ids, "rng int, del_ids binary")
        )
        postings = spark.read.parquet(txn.table_path(index_dir, "postings"))
        rows = postings.withColumn(
            "rng",
            F.explode(F.sequence((F.col("min_doc") / span).cast("int"), (F.col("max_doc") / span).cast("int"))),
        ).join(del_packed, "rng")  # inner join == affected-range pruning

        def deltas(pdf: pd.DataFrame) -> pd.DataFrame:
            out_t, out_df, out_cf = [], [], []
            for row in pdf.itertuples(index=False):
                ids_arr = np.frombuffer(row.del_ids, dtype=np.int64)
                lo = int(row.rng) * span
                hi = lo + span - 1
                tl = _row_to_termlist(row)
                d, t = tl.decode_range(max(lo, int(row.min_doc)), min(hi, int(row.max_doc)))
                if d.size == 0:
                    continue
                pos = np.searchsorted(ids_arr, d)
                pos = np.minimum(pos, ids_arr.size - 1)
                hit = ids_arr[pos] == d
                n = int(hit.sum())
                if n:
                    out_t.append(row.term)
                    out_df.append(n)
                    out_cf.append(int(t[hit].sum()))
            return pd.DataFrame({"term": out_t, "df_delta": out_df, "cf_delta": out_cf})

        delta_df = (
            rows.mapInPandas(lambda it: (deltas(pdf) for pdf in it), "term string, df_delta int, cf_delta long")
            .groupBy("term")
            .agg(F.sum("df_delta").alias("df_delta"), F.sum("cf_delta").alias("cf_delta"))
        )
        ts = spark.read.parquet(ts_path)
        new_ts = (
            ts.join(delta_df, "term", "left")
            .select(
                "term",
                (F.col("df") - F.coalesce("df_delta", F.lit(0))).cast("int").alias("df"),
                (F.col("cf") - F.coalesce("cf_delta", F.lit(0))).cast("long").alias("cf"),
                "bucket",
            )
            .filter(F.col("df") > 0)
        )
        new_ts.write.mode("overwrite").partitionBy("bucket").parquet(txn.staged_path(index_dir, tag, "term_stats"))

    # ---- apply (each step idempotent, any order-crash recoverable) ----
    txn.apply_append(index_dir, tag, "tombstones", txn.table_path(index_dir, "tombstones"))
    txn.apply_swap(index_dir, tag, "term_stats", ts_path)
    txn.txn_commit(index_dir, tag)
    return _refresh_live_meta(spark, index_dir)


def _row_to_termlist(row):
    from goobi_viewer_indexer_spark.operators.wand import TermList

    return TermList(
        term=row.term,
        idf=0.0,
        doc_bytes=bytes(row.doc_bytes),
        tf_bytes=bytes(row.tf_bytes),
        block_last_doc=np.asarray(row.block_last_doc, dtype=np.int64),
        block_doc_off=np.asarray(row.block_doc_off, dtype=np.int64),
        block_tf_off=np.asarray(row.block_tf_off, dtype=np.int64),
        block_max_w=np.asarray(row.block_max_w, dtype=np.float64),
        pos_bytes=bytes(row.pos_bytes) if hasattr(row, "pos_bytes") else b"",
        block_pos_off=(
            np.asarray(row.block_pos_off, dtype=np.int64) if hasattr(row, "block_pos_off") else None
        ),
    )


def _publish(index_dir: str, name: str, tmp: str) -> None:
    """Publish a compaction rewrite as the new current generation of
    ``name`` — atomic pointer flip, previous generation retained for
    in-flight readers (txn.publish_table; VERDICT r2 #7)."""
    txn.publish_table(index_dir, name, tmp)


def add_docs(
    spark: SparkSession, index_dir: str, new_docs: DataFrame, text_col: str = "text", tag: str | None = None,
    recover: bool = True,
) -> dict:
    """Append new documents (LSM-style delta segment), crash-atomically.

    ``new_docs`` needs only ``text_col``; dense doc_ids are assigned from
    the next span boundary so the delta cannot collide with any existing
    (term, range) pair.  Returns updated meta (with id range added).

    Commit protocol (:mod:`.txn`): the id-assignment base is pinned in an
    intent and the id-stamped docs are staged FIRST — every later step
    derives from the staged copy, so a replay with the same ``tag``
    (idempotent streaming sinks, retried calls) re-applies the identical
    delta rather than appending a second copy under fresh ids, and a crash
    between the doc_stats/doclens/postings appends and the term_stats swap
    heals instead of leaving the four directories mutually inconsistent.

    Id assignment is partition-parallel (:func:`assign_sequential_ids`) —
    no global single-partition window in the append path."""
    meta = load_meta(index_dir)
    cfg = _cfg_from_meta(meta)
    span = cfg.docs_per_segment * cfg.merge_fanin
    ds_path = txn.table_path(index_dir, "doc_stats")
    ts_path = txn.table_path(index_dir, "term_stats")
    if tag is None:
        tag = f"add_{int(time.time() * 1000)}"
    if txn.txn_done(index_dir, tag):
        return load_meta(index_dir)
    if recover:
        recover_pending(spark, index_dir, skip_tag=tag)
    txn.recover_dir(ts_path)

    fields: dict[str, str] | None = meta.get("field_cols")
    fnames = meta.get("fields", [])

    # ---- stage 0: pin base, stamp ids, stage the delta corpus ----
    if not txn.staging_complete(index_dir, tag, "docs"):
        cur_max = spark.read.parquet(ds_path).agg(F.max("doc_id")).collect()[0][0]
        intent = txn.txn_intent(index_dir, tag, {"op": "add", "base": (int(cur_max) // span + 1) * span})
        src = (
            new_docs.select(*[F.col(c) for c in fields.values()])
            if fields
            else new_docs.select(F.col(text_col).alias("text"))
        )
        # barrier_dir: arbitrary caller DataFrames (possibly nondeterministic
        # shuffles upstream) are materialized before the two-pass id scheme
        docs = assign_sequential_ids(
            src, base=intent["base"], barrier_dir=txn.staged_path(index_dir, tag, "docs_raw")
        ).withColumn("seg", (F.col("doc_id") / cfg.docs_per_segment).cast("int"))
        docs.write.mode("overwrite").parquet(txn.staged_path(index_dir, tag, "docs"))
    docs = spark.read.parquet(txn.staged_path(index_dir, tag, "docs"))
    n_new = docs.count()
    if n_new == 0:
        txn.txn_commit(index_dir, tag)
        return meta

    # ---- stage 1: doc_stats + packed doclens deltas ----
    # every staging step derives from the staged (never-moved) docs copy:
    # applied appends MOVE staged files into the live dirs, so a replay
    # cannot re-read an already-applied staging dir
    if fields:
        sha_src = F.concat_ws("\x1e", *[F.coalesce(F.col(c), F.lit("")) for c in fields.values()])
        dstats = docs.select(
            "doc_id",
            *[doclen_nfc(F.col(col)).alias(f"doclen_{f}") for f, col in fields.items()],
            sha256_hex(sha_src).alias("sha256"),
            "seg",
        )
        len_cols = [f"doclen_{f}" for f in fnames]
        dl_schema = "rng int, base long, " + ", ".join(f"doclens_{f} binary" for f in fnames)
        dl_out_cols = [f"doclens_{f}" for f in fnames]
    else:
        dstats = docs.select(
            "doc_id",
            doclen_nfc(F.col("text")).alias("doclen"),
            sha256_hex(F.col("text")).alias("sha256"),
            "seg",
        )
        len_cols = ["doclen"]
        dl_schema = "rng int, base long, doclens binary"
        dl_out_cols = ["doclens"]
    if not (txn.step_applied(index_dir, tag, "doc_stats") or txn.staging_complete(index_dir, tag, "doc_stats")):
        dstats.write.mode("overwrite").parquet(txn.staged_path(index_dir, tag, "doc_stats"))

    if not (txn.step_applied(index_dir, tag, "doclens_packed") or txn.staging_complete(index_dir, tag, "doclens_packed")):

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                out = {"rng": pd.Series([], dtype="int32"), "base": pd.Series([], dtype="int64")}
                for oc in dl_out_cols:
                    out[oc] = pd.Series([], dtype=object)
                return pd.DataFrame(out)
            pdf = pdf.sort_values("doc_id")
            rng = int(pdf["rng"].iloc[0])
            b0 = rng * span
            idsv = pdf["doc_id"].to_numpy(np.int64)
            row = {"rng": [rng], "base": [b0]}
            for lc, oc in zip(len_cols, dl_out_cols):
                arr = np.zeros(int(idsv[-1]) - b0 + 1, dtype=np.int32)
                arr[idsv - b0] = pdf[lc].to_numpy(np.int32)
                row[oc] = [arr.tobytes()]
            return pd.DataFrame(row)

        (
            dstats.withColumn("rng", (F.col("doc_id") / span).cast("int"))
            .select("rng", "doc_id", *len_cols)
            .groupBy("rng")
            .applyInPandas(pack, dl_schema)
            .write.mode("overwrite")
            .parquet(txn.staged_path(index_dir, tag, "doclens_packed"))
        )

    # ---- stage 2: delta partials → merged postings rows ----
    # block_max uses the BUILD avgdl so existing UB semantics stay uniform
    if not txn.staging_complete(index_dir, tag, "partials"):
        partials_df = (
            spimi.build_partials_fielded(docs, meta["avgdl_by_field"], cfg, fields)
            if fields
            else spimi.build_partials(docs, meta["avgdl"], cfg)
        )
        partials_df.write.mode("overwrite").parquet(txn.staged_path(index_dir, tag, "partials"))
    partials = spark.read.parquet(txn.staged_path(index_dir, tag, "partials"))
    if not (txn.step_applied(index_dir, tag, "postings") or txn.staging_complete(index_dir, tag, "postings")):
        (
            spimi.merge_partials(partials, cfg)
            .withColumn("bucket", F.pmod(F.hash("term"), F.lit(cfg.postings_buckets)))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(txn.staged_path(index_dir, tag, "postings"))
        )

    # ---- stage 3: merged term_stats (from LIVE stats, swap-guarded) ----
    if not (
        txn.step_applied(index_dir, tag, "term_stats")
        or txn.swap_already_live(ts_path, tag)
        or txn.staging_complete(index_dir, tag, "term_stats")
    ):
        ts = spark.read.parquet(ts_path)
        add_ts = partials.groupBy("term").agg(F.sum("df").alias("df2"), F.sum("cf").alias("cf2"))
        (
            ts.join(add_ts, "term", "full")
            .select(
                "term",
                (F.coalesce("df", F.lit(0)) + F.coalesce("df2", F.lit(0))).cast("int").alias("df"),
                (F.coalesce("cf", F.lit(0)) + F.coalesce("cf2", F.lit(0))).cast("long").alias("cf"),
            )
            .withColumn("bucket", F.pmod(F.hash("term"), F.lit(cfg.postings_buckets)))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(txn.staged_path(index_dir, tag, "term_stats"))
        )

    # ---- apply (idempotent steps) + commit ----
    txn.apply_append(index_dir, tag, "doc_stats", ds_path)
    txn.apply_append(index_dir, tag, "doclens_packed", txn.table_path(index_dir, "doclens_packed"))
    txn.apply_append(index_dir, tag, "postings", txn.table_path(index_dir, "postings"))
    txn.apply_swap(index_dir, tag, "term_stats", ts_path)
    txn.txn_commit(index_dir, tag)

    meta = _refresh_live_meta(spark, index_dir)
    meta["appended"] = meta.get("appended", 0) + n_new
    _write_meta(index_dir, meta)
    return meta


def recover_pending(spark: SparkSession, index_dir: str, skip_tag: str | None = None) -> list[str]:
    """Complete (or abort) transactions interrupted by a crash.  Called
    automatically at the top of :func:`delete_docs`/:func:`add_docs`/
    :func:`compact` (``skip_tag`` excludes the caller's own in-flight txn)
    and safe to call any time: delete intents re-apply from their pinned id
    set; add intents re-apply from their staged delta, or abort cleanly if
    nothing was staged (nothing was mutated yet).  Healing runs with
    ``recover=False`` so two torn txns cannot recurse into each other."""
    import glob as _glob

    healed = []
    root = txn.txn_root(index_dir)
    for p in sorted(_glob.glob(os.path.join(root, "*.intent.json"))):
        tag = os.path.basename(p)[: -len(".intent.json")]
        if tag == skip_tag:
            continue
        with open(p) as f:
            intent = json.load(f)
        if intent.get("op") == "delete":
            ids = spark.read.parquet(txn.staged_path(index_dir, tag, "ids"))
            _delete_df(spark, index_dir, ids, bool(intent.get("trace", True)), tag, recover=False)
            healed.append(tag)
        elif intent.get("op") == "add":
            if txn.staging_complete(index_dir, tag, "docs"):
                add_docs(spark, index_dir, spark.createDataFrame([], "text string"), tag=tag, recover=False)
            else:
                txn.txn_commit(index_dir, tag)  # nothing applied — abort
            healed.append(tag)
    return healed


def update_docs(spark: SparkSession, index_dir: str, old_doc_ids: list[int], new_docs: DataFrame, text_col: str = "text") -> dict:
    """Atomic update = delete old ids + append re-indexed rows
    (prepareUpdate semantics, Indexer.java:1695-1756)."""
    delete_docs(spark, index_dir, old_doc_ids, trace=False)
    return add_docs(spark, index_dir, new_docs, text_col)


def delete_by_query(
    spark: SparkSession,
    index_dir: str,
    query: str | list[str],
    mode: str = "and",
    trace: bool = True,
    tag: str | None = None,
) -> dict:
    """Delete every doc matching a boolean term query — the reference's
    ``deleteByQuery`` (helper/SolrSearchIndex.java:498-528, used on every
    record purge).  Predicate → distributed postings scan
    (InvertedIndex.match_ids) → the same tombstone+stats txn as
    :func:`delete_docs`.  The matched id set is pinned as a STAGED PARQUET
    under the txn, so a replay deletes exactly the originally-matched docs
    even if the index moved underneath.

    ``mode='boolean'``: NOT + OR-group syntax ``'(a b) c -d'`` = docs with
    (a OR b) AND c AND NOT d (the reference's negated purge shape,
    helper/SolrSearchIndex.java:918-921)."""
    from goobi_viewer_indexer_spark.operators.search import InvertedIndex

    if tag is None:
        tag = f"delq_{int(time.time() * 1000)}"
    if txn.txn_done(index_dir, tag):
        return load_meta(index_dir)
    # the matched set stays a DataFrame end to end: _delete_df pins it as a
    # staged parquet (millions of matches never touch the driver), and a
    # replay short-circuits on the staged copy without re-running the scan
    idx = InvertedIndex(spark, index_dir)
    ids_df = idx.match_ids_boolean(query) if mode == "boolean" else idx.match_ids(query, mode=mode)
    return _delete_df(spark, index_dir, ids_df, trace, tag)


def set_term_vectors(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tag: str | None = None,
) -> None:
    """Build the FORWARD index (per-doc term vectors) as a side table —
    the minimal structure behind MoreLikeThis (Solr's MLT component reads
    stored term vectors to pick a source doc's "interesting terms",
    MoreLikeThisHandler; the reference exposes it through the viewer's
    related-records queries).

    Layout: (doc_id, term, tf), bucketed by ``pmod(doc_id, termvec_buckets)``
    so a single-doc read is a parquet partition-pruned point lookup — the
    doc_id twin of the postings' term-hash bucketing.  Size is one row per
    (doc, distinct term): the same order as the inverted index itself,
    which is what a forward index costs anywhere.  Published under the txn
    swap protocol (same-tag replays no-op)."""
    from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr
    from goobi_viewer_indexer_spark.plans.build import load_meta

    tv_path = txn.table_path(index_dir, "termvecs")
    if tag is None:
        tag = f"settv_{int(time.time() * 1000)}"
    if txn.txn_done(index_dir, tag):
        return
    txn.recover_dir(tv_path)

    if not (
        txn.step_applied(index_dir, tag, "termvecs")
        or txn.swap_already_live(tv_path, tag)
        or txn.staging_complete(index_dir, tag, "termvecs")
    ):
        nb = load_meta(index_dir)["postings_buckets"]
        tv = (
            docs.select(F.col(id_col).alias("doc_id"), F.explode(tokenize_expr(text_col)).alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").cast("long").alias("tf"))
            .withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(nb)).cast("int"))
        )
        (
            tv.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(txn.staged_path(index_dir, tag, "termvecs"))
        )

    txn.apply_swap(index_dir, tag, "termvecs", tv_path)
    txn.txn_commit(index_dir, tag)


def set_term_vectors_fielded(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    fields: dict[str, str],
    id_col: str = "doc_id",
    tag: str | None = None,
) -> None:
    """Fielded forward index (per-doc per-FIELD term vectors) — the side
    table behind ``FieldedIndex.more_like_this`` (Solr MLT with
    ``mlt.fl`` listing several fields).  Layout: (doc_id, field, term,
    tf), bucketed by ``pmod(doc_id, postings_buckets)`` like the flat
    termvecs table, so a single-doc read stays a partition-pruned point
    lookup.  ``fields``: field name → source column (the same map
    build_index_fielded takes).  Published under the txn swap protocol
    (same-tag replays no-op)."""
    from functools import reduce

    from goobi_viewer_indexer_spark.functions.tokenize import tokenize_expr
    from goobi_viewer_indexer_spark.plans.build import load_meta

    tv_path = txn.table_path(index_dir, "ftermvecs")
    if tag is None:
        tag = f"setftv_{int(time.time() * 1000)}"
    if txn.txn_done(index_dir, tag):
        return
    txn.recover_dir(tv_path)

    if not (
        txn.step_applied(index_dir, tag, "ftermvecs")
        or txn.swap_already_live(tv_path, tag)
        or txn.staging_complete(index_dir, tag, "ftermvecs")
    ):
        nb = load_meta(index_dir)["postings_buckets"]
        parts = [
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.lit(fname).alias("field"),
                F.explode(tokenize_expr(col)).alias("term"),
            )
            for fname, col in sorted(fields.items())
        ]
        tv = (
            reduce(lambda a, b: a.unionByName(b), parts)
            .groupBy("doc_id", "field", "term")
            .agg(F.count("*").cast("long").alias("tf"))
            .withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(nb)).cast("int"))
        )
        (
            tv.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(txn.staged_path(index_dir, tag, "ftermvecs"))
        )

    txn.apply_swap(index_dir, tag, "ftermvecs", tv_path)
    txn.txn_commit(index_dir, tag)


def set_spell_table(spark: SparkSession, index_dir: str, tag: str | None = None) -> None:
    """Materialize the SymSpell delete-key table (ed≤2 spellcheck probes)
    as a txn-managed INDEX table — the 100 TB deployment shape: built once
    per dictionary state at index/maintenance time instead of lazily on
    the first ``suggest(max_edits=2)`` call.  Auto-detects flat vs fielded
    from the index meta; layout matches the lazy cache exactly
    ((field,) delkey, term, df, bucket=hash(delkey) pmod nb), so the read
    path is identical.

    Freshness: a ``_built_at_rev`` marker (the index revision AFTER this
    txn commits) is written post-commit; searchers use the managed table
    only while their revision matches, and fall back to the per-revision
    lazy cache once any later mutation bumps the rev — stale suggestions
    are never served.  The default tag embeds the pre-build revision, so
    replays of an interrupted build no-op while a call after new commits
    rebuilds."""
    from goobi_viewer_indexer_spark.operators.search import (
        _spell_frame,
        _spell_frame_fielded,
    )
    from goobi_viewer_indexer_spark.plans.build import load_meta

    sp_path = txn.table_path(index_dir, "spell")
    if tag is None:
        tag = f"setspell_r{txn.current_rev(index_dir)}"
    if txn.txn_done(index_dir, tag):
        return
    txn.recover_dir(sp_path)

    if not (
        txn.step_applied(index_dir, tag, "spell")
        or txn.swap_already_live(sp_path, tag)
        or txn.staging_complete(index_dir, tag, "spell")
    ):
        meta = load_meta(index_dir)
        nb = meta["postings_buckets"]
        stats = spark.read.parquet(txn.table_path(index_dir, "term_stats"))
        frame = _spell_frame_fielded(stats, nb) if "fields" in meta else _spell_frame(stats, nb)
        (
            frame.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(txn.staged_path(index_dir, tag, "spell"))
        )

    txn.apply_swap(index_dir, tag, "spell", sp_path)
    txn.txn_commit(index_dir, tag)
    # post-commit freshness marker (leading underscore: parquet readers
    # skip it); a crash before this write just leaves the table unused —
    # searchers conservatively fall back to the lazy cache
    with open(os.path.join(txn.table_path(index_dir, "spell"), "_built_at_rev"), "w") as f:
        f.write(str(txn.current_rev(index_dir)))


def set_stored_fields(spark: SparkSession, index_dir: str, updates: DataFrame, tag: str | None = None) -> None:
    """Field-level atomic update for STORED (non-indexed) fields — the
    reference's Solr ``{"set": v}`` partial update (helper/
    SolrSearchIndex.java:328-343, driven by DocUpdateIndexer.java:57-160).

    ``updates``: (doc_id, col...) — listed columns overwrite per doc where
    non-null, other docs/columns keep their values; postings and doc_stats
    are NOT touched (no re-tokenization).  Updating an INDEXED field is a
    different contract — that's :func:`update_docs` (delete + re-add), the
    same split Lucene makes internally.  Merge runs under the txn swap
    protocol: replays with the same tag are no-ops."""
    stored_path = txn.table_path(index_dir, "stored")
    if tag is None:
        tag = f"setf_{int(time.time() * 1000)}"
    if txn.txn_done(index_dir, tag):
        return
    txn.recover_dir(stored_path)

    if not (
        txn.step_applied(index_dir, tag, "stored")
        or txn.swap_already_live(stored_path, tag)
        or txn.staging_complete(index_dir, tag, "stored")
    ):
        if os.path.exists(stored_path):
            old = spark.read.parquet(stored_path)
            upd_cols = [c for c in updates.columns if c != "doc_id"]
            u = updates.select("doc_id", *[F.col(c).alias(f"_u_{c}") for c in upd_cols])
            merged = old.join(u, "doc_id", "full")
            keep = []
            for c in old.columns:
                if c == "doc_id":
                    continue
                keep.append(
                    F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c) if c in upd_cols else F.col(c)
                )
            for c in upd_cols:
                if c not in old.columns:
                    keep.append(F.col(f"_u_{c}").alias(c))
            merged = merged.select("doc_id", *keep)
        else:
            merged = updates
        merged.write.mode("overwrite").parquet(txn.staged_path(index_dir, tag, "stored"))

    txn.apply_swap(index_dir, tag, "stored", stored_path)
    txn.txn_commit(index_dir, tag)


def get_stored(spark: SparkSession, index_dir: str) -> DataFrame | None:
    p = txn.table_path(index_dir, "stored")
    txn.recover_dir(p)
    return spark.read.parquet(p) if os.path.exists(p) else None


def purge_compact(spark: SparkSession, index_dir: str) -> dict:
    """Purge-only compaction: rewrite ONLY tombstone-affected posting rows.

    The full :func:`compact` decodes and re-encodes the ENTIRE index (it
    also re-bases block maxima on the live avgdl) — at 100 TB that is a
    full-corpus rewrite you schedule rarely.  This is the routine variant:

    * affected row keys = posting rows whose doc ranges intersect a
      tombstoned range (semi-join on rng — directory/row-group pruning
      scale: untouched rows are moved by reference, never decoded);
    * affected rows re-encode per range with the BUILD avgdl basis, so
      their block maxima stay on the same basis as untouched rows (the
      live-avgdl correction stays query-time ``ub_scale``, as before);
    * term_stats are NOT recomputed — delete-time correction already made
      them exact for the live corpus (invariant: stats == live postings);
    * doc_stats/doclens drop tombstoned rows; tombstones clear; meta keeps
      the build avgdl basis and records the live avgdl for scoring.
    """
    recover_pending(spark, index_dir)
    for sub in ("postings", "doc_stats", "doclens_packed"):
        txn.recover_dir(txn.table_path(index_dir, sub))
    meta = load_meta(index_dir)
    cfg = _cfg_from_meta(meta)
    span = cfg.docs_per_segment * cfg.merge_fanin
    tomb = _tombstones(spark, index_dir)
    if tomb is None:
        return meta
    fnames: list[str] = meta.get("fields", [])

    def pack_ids(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"rng": [], "del_ids": []}).astype({"rng": "int32"})
        arr = np.sort(pdf["doc_id"].to_numpy(np.int64))
        return pd.DataFrame({"rng": [int(pdf["rng"].iloc[0])], "del_ids": [arr.tobytes()]})

    del_packed = (
        tomb.select("doc_id").distinct()
        .withColumn("rng", (F.col("doc_id") / span).cast("int"))
        .groupBy("rng")
        .applyInPandas(pack_ids, "rng int, del_ids binary")
    )

    post_path = txn.table_path(index_dir, "postings")
    postings = spark.read.parquet(post_path)
    key = ["term", "seg", "min_doc"]
    expl = postings.select(
        *key,
        F.explode(
            F.sequence((F.col("min_doc") / span).cast("int"), (F.col("max_doc") / span).cast("int"))
        ).alias("rng"),
    )
    affected_keys = expl.join(del_packed.select("rng"), "rng", "left_semi").select(*key).distinct()
    untouched = postings.join(affected_keys, key, "left_anti")
    # affected rows split per range (splitting preserves the ≤1-list-per-
    # term-per-range invariant; unaffected ranges of a spanning row keep
    # their postings via the LEFT join's null del_ids)
    dl = spark.read.parquet(txn.table_path(index_dir, "doclens_packed"))
    aff_rows = (
        postings.join(affected_keys, key)
        .withColumn(
            "rng",
            F.explode(
                F.sequence((F.col("min_doc") / span).cast("int"), (F.col("max_doc") / span).cast("int"))
            ),
        )
        .join(dl, "rng")
        .join(del_packed, "rng", "left")
    )
    k1, b, bs = cfg.k1, cfg.b, cfg.block_size
    build_avgdl = meta["avgdl"]
    build_avgdls = meta.get("avgdl_by_field")

    def reencode(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for row in pdf.itertuples(index=False):
            rng = int(row.rng)
            lo, hi = rng * span, (rng + 1) * span - 1
            tl = _row_to_termlist(row)
            d, t, p = tl.decode_range_with_positions(max(lo, int(row.min_doc)), min(hi, int(row.max_doc)))
            if d.size == 0:
                continue
            if row.del_ids is not None:
                dels = np.frombuffer(row.del_ids, dtype=np.int64)
                pos = np.minimum(np.searchsorted(dels, d), dels.size - 1)
                keep = dels[pos] != d
                p = p[np.repeat(keep, t)]
                d, t = d[keep], t[keep]
            if d.size == 0:
                continue
            if fnames:
                fname = row.term.split(spimi.FIELD_SEP, 1)[0]
                lens = np.frombuffer(getattr(row, f"doclens_{fname}"), dtype=np.int32)[d - int(row.base)]
                av = build_avgdls[fname]
            else:
                lens = np.frombuffer(row.doclens, dtype=np.int32)[d - int(row.base)]
                av = build_avgdl
            enc = codec.encode_postings(d, t, lens, av, k1, b, bs, positions=p)
            out.append(
                {
                    "term": row.term,
                    "seg": np.int32(rng),
                    "df": np.int32(d.size),
                    "cf": np.int64(t.sum()),
                    "min_doc": enc["min_doc"],
                    "max_doc": enc["max_doc"],
                    "doc_bytes": enc["doc_bytes"],
                    "tf_bytes": enc["tf_bytes"],
                    "pos_bytes": enc["pos_bytes"],
                    "block_last_doc": enc["block_last_doc"],
                    "block_doc_off": enc["block_doc_off"],
                    "block_tf_off": enc["block_tf_off"],
                    "block_pos_off": enc["block_pos_off"],
                    "block_max_w": enc["block_max_w"],
                }
            )
        if not out:
            return pd.DataFrame([], columns=[c.split(" ")[0] for c in spimi.POSTINGS_SCHEMA.split(", ")])
        return pd.DataFrame(out)

    cols = [c.split(" ")[0] for c in spimi.POSTINGS_SCHEMA.split(", ")]
    rewritten = aff_rows.mapInPandas(lambda it: (reencode(pdf) for pdf in it), spimi.POSTINGS_SCHEMA)
    final = (
        untouched.select(*cols)
        .unionByName(rewritten)
        .withColumn("bucket", F.pmod(F.hash("term"), F.lit(cfg.postings_buckets)))
    )
    tmp = post_path + ".tmp"
    final.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    _publish(index_dir, "postings", tmp)

    _rewrite_docstats(spark, index_dir, span, fnames, tomb)
    txn.remove_table(index_dir, "tombstones")  # skips snapshot-pinned gens
    # keep the BUILD avgdl basis; record live values for scoring/ub_scale
    if fnames:
        n_live, avgdls_live = live_corpus_stats_fielded(spark, index_dir, fnames)
        meta["avgdl_live_by_field"] = avgdls_live
    else:
        n_live, avgdl_live = live_corpus_stats(spark, index_dir)
        meta["avgdl_live"] = avgdl_live
    meta["n_docs"] = n_live
    meta.pop("n_docs_live", None)
    _write_meta(index_dir, meta)
    return meta


def _rewrite_docstats(spark: SparkSession, index_dir: str, span: int, fnames: list[str], tomb: DataFrame) -> None:
    """Drop tombstoned rows from doc_stats and re-pack the doclens arrays."""
    ds_path = txn.table_path(index_dir, "doc_stats")
    ds = spark.read.parquet(ds_path)
    ds_live = ds.join(tomb.select("doc_id"), "doc_id", "left_anti")
    tmp3 = ds_path + ".tmp"
    ds_live.write.mode("overwrite").parquet(tmp3)
    _publish(index_dir, "doc_stats", tmp3)

    len_cols = [f"doclen_{f}" for f in fnames] if fnames else ["doclen"]
    dl_out_cols = [f"doclens_{f}" for f in fnames] if fnames else ["doclens"]
    dl_schema = "rng int, base long, " + ", ".join(f"{oc} binary" for oc in dl_out_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            out = {"rng": pd.Series([], dtype="int32"), "base": pd.Series([], dtype="int64")}
            for oc in dl_out_cols:
                out[oc] = pd.Series([], dtype=object)
            return pd.DataFrame(out)
        pdf = pdf.sort_values("doc_id")
        rng = int(pdf["rng"].iloc[0])
        b0 = rng * span
        idsv = pdf["doc_id"].to_numpy(np.int64)
        row = {"rng": [rng], "base": [b0]}
        for lc, oc in zip(len_cols, dl_out_cols):
            arr = np.zeros(int(idsv[-1]) - b0 + 1, dtype=np.int32)
            arr[idsv - b0] = pdf[lc].to_numpy(np.int32)
            row[oc] = [arr.tobytes()]
        return pd.DataFrame(row)

    dlp = txn.table_path(index_dir, "doclens_packed")
    tmp4 = dlp + ".tmp"
    (
        spark.read.parquet(txn.table_path(index_dir, "doc_stats"))
        .withColumn("rng", (F.col("doc_id") / span).cast("int"))
        .select("rng", "doc_id", *len_cols)
        .groupBy("rng")
        .applyInPandas(pack, dl_schema)
        .write.mode("overwrite")
        .parquet(tmp4)
    )
    _publish(index_dir, "doclens_packed", tmp4)


def compact(spark: SparkSession, index_dir: str) -> dict:
    """Optimize: purge tombstoned postings, re-align rows to ranges, drop
    empties, recompute stats, clear tombstones (Solr optimize analog).

    Crash behavior: each directory swap is rename-pair + ``.bak`` (healed
    below by recover_dir); a crash BETWEEN swaps (postings compacted,
    stats still stale) is self-healing — term_stats is a pure function of
    the postings, so re-running compact converges; queries in that window
    see slightly stale df (idf only, never membership)."""
    recover_pending(spark, index_dir)  # never compact a torn state
    for sub in ("postings", "term_stats", "doc_stats", "doclens_packed"):
        txn.recover_dir(txn.table_path(index_dir, sub))
    meta = load_meta(index_dir)
    cfg = _cfg_from_meta(meta)
    span = cfg.docs_per_segment * cfg.merge_fanin
    tomb = _tombstones(spark, index_dir)
    fnames: list[str] = meta.get("fields", [])
    if fnames:
        n_live, avgdls_live = live_corpus_stats_fielded(spark, index_dir, fnames)
        avgdl_live = None
    else:
        n_live, avgdl_live = live_corpus_stats(spark, index_dir)
        avgdls_live = None

    post_path = txn.table_path(index_dir, "postings")
    postings = spark.read.parquet(post_path)
    dl = spark.read.parquet(txn.table_path(index_dir, "doclens_packed"))
    rows = postings.withColumn(
        "rng",
        F.explode(F.sequence((F.col("min_doc") / span).cast("int"), (F.col("max_doc") / span).cast("int"))),
    ).join(dl, "rng")
    # tombstones stay distributed (VERDICT r2 #1): packed per-range id
    # arrays join the re-encode tasks, same as _delete_df/purge_compact —
    # a post-bulk-purge optimize with billions of tombstones must not
    # collect them to the driver
    if tomb is not None:
        def pack_ids(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame({"rng": [], "del_ids": []}).astype({"rng": "int32"})
            arr = np.sort(pdf["doc_id"].to_numpy(np.int64))
            return pd.DataFrame({"rng": [int(pdf["rng"].iloc[0])], "del_ids": [arr.tobytes()]})

        del_packed = (
            tomb.select("doc_id").distinct()
            .withColumn("rng", (F.col("doc_id") / span).cast("int"))
            .groupBy("rng")
            .applyInPandas(pack_ids, "rng int, del_ids binary")
        )
        rows = rows.join(del_packed, "rng", "left")
    else:
        rows = rows.withColumn("del_ids", F.lit(None).cast("binary"))

    k1, b, bs = cfg.k1, cfg.b, cfg.block_size

    def reencode(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for row in pdf.itertuples(index=False):
            rng = int(row.rng)
            lo, hi = rng * span, (rng + 1) * span - 1
            tl = _row_to_termlist(row)
            d, t, p = tl.decode_range_with_positions(max(lo, int(row.min_doc)), min(hi, int(row.max_doc)))
            if d.size == 0:
                continue
            if row.del_ids is not None:
                dels = np.frombuffer(row.del_ids, dtype=np.int64)
                pos = np.minimum(np.searchsorted(dels, d), dels.size - 1)
                keep = dels[pos] != d
                p = p[np.repeat(keep, t)]
                d, t = d[keep], t[keep]
            if d.size == 0:
                continue
            if fnames:  # field-tagged term: use ITS field's doclens/avgdl
                fname = row.term.split(spimi.FIELD_SEP, 1)[0]
                lens = np.frombuffer(getattr(row, f"doclens_{fname}"), dtype=np.int32)[d - int(row.base)]
                av = avgdls_live[fname]
            else:
                lens = np.frombuffer(row.doclens, dtype=np.int32)[d - int(row.base)]
                av = avgdl_live
            enc = codec.encode_postings(d, t, lens, av, k1, b, bs, positions=p)
            out.append(
                {
                    "term": row.term,
                    "seg": np.int32(rng),
                    "df": np.int32(d.size),
                    "cf": np.int64(t.sum()),
                    "min_doc": enc["min_doc"],
                    "max_doc": enc["max_doc"],
                    "doc_bytes": enc["doc_bytes"],
                    "tf_bytes": enc["tf_bytes"],
                    "pos_bytes": enc["pos_bytes"],
                    "block_last_doc": enc["block_last_doc"],
                    "block_doc_off": enc["block_doc_off"],
                    "block_tf_off": enc["block_tf_off"],
                    "block_pos_off": enc["block_pos_off"],
                    "block_max_w": enc["block_max_w"],
                }
            )
        if not out:
            return pd.DataFrame([], columns=[c.split(" ")[0] for c in spimi.POSTINGS_SCHEMA.split(", ")])
        return pd.DataFrame(out)

    merged = rows.mapInPandas(lambda it: (reencode(pdf) for pdf in it), spimi.POSTINGS_SCHEMA)
    final = spimi.compact_light_terms(merged, cfg)
    final = final.withColumn("bucket", F.pmod(F.hash("term"), F.lit(cfg.postings_buckets)))
    tmp = post_path + ".tmp"
    final.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    _publish(index_dir, "postings", tmp)

    # stats exact from compacted postings
    ts_path = txn.table_path(index_dir, "term_stats")
    postings2 = spark.read.parquet(txn.table_path(index_dir, "postings"))
    tmp2 = ts_path + ".tmp"
    (
        postings2.groupBy("term")
        .agg(F.sum("df").cast("int").alias("df"), F.sum("cf").alias("cf"))
        .withColumn("bucket", F.pmod(F.hash("term"), F.lit(cfg.postings_buckets)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp2)
    )
    _publish(index_dir, "term_stats", tmp2)

    # doc_stats: physically drop tombstoned rows; doclens re-packed
    ds_path = txn.table_path(index_dir, "doc_stats")
    ds = spark.read.parquet(ds_path)
    if tomb is not None:
        ds_live = ds.join(tomb.select("doc_id"), "doc_id", "left_anti")
        tmp3 = ds_path + ".tmp"
        ds_live.write.mode("overwrite").parquet(tmp3)
        _publish(index_dir, "doc_stats", tmp3)

        len_cols = [f"doclen_{f}" for f in fnames] if fnames else ["doclen"]
        dl_out_cols = [f"doclens_{f}" for f in fnames] if fnames else ["doclens"]
        dl_schema = "rng int, base long, " + ", ".join(f"{oc} binary" for oc in dl_out_cols)

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                out = {"rng": pd.Series([], dtype="int32"), "base": pd.Series([], dtype="int64")}
                for oc in dl_out_cols:
                    out[oc] = pd.Series([], dtype=object)
                return pd.DataFrame(out)
            pdf = pdf.sort_values("doc_id")
            rng = int(pdf["rng"].iloc[0])
            b0 = rng * span
            idsv = pdf["doc_id"].to_numpy(np.int64)
            row = {"rng": [rng], "base": [b0]}
            for lc, oc in zip(len_cols, dl_out_cols):
                arr = np.zeros(int(idsv[-1]) - b0 + 1, dtype=np.int32)
                arr[idsv - b0] = pdf[lc].to_numpy(np.int32)
                row[oc] = [arr.tobytes()]
            return pd.DataFrame(row)

        dlp = txn.table_path(index_dir, "doclens_packed")
        tmp4 = dlp + ".tmp"
        (
            spark.read.parquet(txn.table_path(index_dir, "doc_stats"))
            .withColumn("rng", (F.col("doc_id") / span).cast("int"))
            .select("rng", "doc_id", *len_cols)
            .groupBy("rng")
            .applyInPandas(pack, dl_schema)
            .write.mode("overwrite")
            .parquet(tmp4)
        )
        _publish(index_dir, "doclens_packed", tmp4)
        txn.remove_table(index_dir, "tombstones")  # skips snapshot-pinned gens

    if fnames:
        meta["avgdl_by_field"] = avgdls_live
        meta["avgdl"] = avgdls_live[fnames[0]]
        meta.pop("avgdl_live_by_field", None)
    else:
        meta["avgdl"] = avgdl_live
        meta.pop("avgdl_live", None)
    meta["n_docs"] = n_live
    meta.pop("n_docs_live", None)
    _write_meta(index_dir, meta)
    return meta
