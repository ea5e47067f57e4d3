"""Query execution over a built index — the native replacement for every
Solr query the reference issues (SURVEY.md §2-B Q1-Q9).

Two engines over the same kernels (operators/wand.py):

* :meth:`InvertedIndex.search` — distributed: postings rows for the query
  terms (bucket-pruned parquet read) are exploded to the doc ranges they
  overlap, joined with that range's packed doclens, and scored range-
  parallel in ``applyInPandas``; per-range top-k heaps are reduced by a
  global ``orderBy … limit k`` (the reference's rows=k).
* :class:`LocalSearcher` — driver-side, postings cached in memory after
  first touch; used for p95 latency measurement (q/s-style point queries
  where a Spark job launch would dominate).

Both are rank-identical to the naive DataFrame scorer and the DuckDB
oracle: same tokenizer, idf, tie-break (score desc, doc_id asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.functions.tokenize import tokenize_py
from goobi_viewer_indexer_spark.operators import wand
from goobi_viewer_indexer_spark.plans.build import load_meta

__all__ = ["InvertedIndex", "LocalSearcher"]


def _mk_termlist(row, idf_val: float, df: int) -> wand.TermList:
    return wand.TermList(
        term=row["term"],
        idf=idf_val,
        df=df,
        doc_bytes=bytes(row["doc_bytes"]),
        tf_bytes=bytes(row["tf_bytes"]),
        block_last_doc=np.asarray(row["block_last_doc"], dtype=np.int64),
        block_doc_off=np.asarray(row["block_doc_off"], dtype=np.int64),
        block_tf_off=np.asarray(row["block_tf_off"], dtype=np.int64),
        block_max_w=np.asarray(row["block_max_w"], dtype=np.float64),
    )


class InvertedIndex:
    def __init__(self, spark: SparkSession, index_dir: str):
        import os

        self.spark = spark
        self.dir = index_dir
        self.meta = load_meta(index_dir)
        self.span = self.meta["docs_per_segment"] * self.meta["merge_fanin"]
        self._postings = spark.read.parquet(f"{index_dir}/postings")
        self._term_stats = spark.read.parquet(f"{index_dir}/term_stats")
        self._doclens = spark.read.parquet(f"{index_dir}/doclens_packed")
        # live-corpus scoring params (diverge from build values only after
        # incremental deletes; see plans/maintenance.py)
        self.n_live = self.meta.get("n_docs_live", self.meta["n_docs"])
        self.avgdl_live = self.meta.get("avgdl_live", self.meta["avgdl"])
        # stored block maxima were computed with the build avgdl; if live
        # avgdl grew they must be inflated to stay upper bounds
        self.ub_scale = max(1.0, self.avgdl_live / self.meta["avgdl"]) if self.meta["avgdl"] else 1.0
        self._tomb_packed = None
        if os.path.exists(f"{index_dir}/tombstones"):
            span = self.span

            def pack_tomb(pdf: pd.DataFrame) -> pd.DataFrame:
                if len(pdf) == 0:
                    return pd.DataFrame({"rng": [], "deleted": []}).astype({"rng": "int32"})
                rng = int(pdf["rng"].iloc[0])
                arr = np.sort(pdf["doc_id"].to_numpy(np.int64))
                return pd.DataFrame({"rng": [rng], "deleted": [arr.tobytes()]})

            self._tomb_packed = (
                spark.read.parquet(f"{index_dir}/tombstones")
                .withColumn("rng", (F.col("doc_id") / span).cast("int"))
                .select("rng", "doc_id")
                .groupBy("rng")
                .applyInPandas(pack_tomb, "rng int, deleted binary")
                .cache()
            )

    # -- helpers ----------------------------------------------------------
    def _buckets_of(self, terms: list[str]) -> list[int]:
        # driver-side Murmur3 identical to Spark's hash(): bucket routing
        # without launching a job (tests/test_spark_hash.py pins parity)
        from goobi_viewer_indexer_spark.functions.spark_hash import bucket_of

        nb = self.meta["postings_buckets"]
        return sorted({bucket_of(t, nb) for t in terms})

    def postings_for(self, terms: list[str]) -> DataFrame:
        """Bucket-pruned point lookup (reference Q1 analog: parquet
        partition pruning replaces Solr's PI term lookup)."""
        bks = self._buckets_of(terms)
        return self._postings.filter(F.col("bucket").isin(bks) & F.col("term").isin(terms))

    def term_stats_for(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        bks = self._buckets_of(terms)
        rows = self._term_stats.filter(F.col("bucket").isin(bks) & F.col("term").isin(terms)).collect()
        return {r["term"]: (int(r["df"]), int(r["cf"])) for r in rows}

    # -- distributed search ------------------------------------------------
    def search(self, query: str | list[str], k: int = 10, mode: str = "or") -> DataFrame:
        terms = sorted(set(query if isinstance(query, list) else tokenize_py(query)))
        meta = self.meta
        n_docs, avgdl, k1, b, span = self.n_live, self.avgdl_live, meta["k1"], meta["b"], self.span
        ub_scale = self.ub_scale

        stats = self.term_stats_for(terms)
        present = [t for t in terms if t in stats]
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if not present or (mode == "and" and len(present) < len(terms)):
            return empty
        idfs = {t: wand.idf(n_docs, stats[t][0]) for t in present}
        n_terms = len(present)

        rows = self.postings_for(present).withColumn(
            "rng",
            F.explode(
                F.sequence(
                    (F.col("min_doc") / span).cast("int"),
                    (F.col("max_doc") / span).cast("int"),
                )
            ),
        )
        dl = self._doclens

        def score_range(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame({"doc_id": [], "score": []}).astype({"doc_id": np.int64, "score": np.float64})
            rng = int(pdf["rng"].iloc[0])
            lo, hi = rng * span, (rng + 1) * span - 1
            base = int(pdf["base"].iloc[0])
            lens = np.frombuffer(pdf["doclens"].iloc[0], dtype=np.int32)
            deleted = None
            if "deleted" in pdf.columns and pdf["deleted"].iloc[0] is not None:
                deleted = np.frombuffer(pdf["deleted"].iloc[0], dtype=np.int64)
            lists = [
                _mk_termlist(row, idfs[row["term"]], stats[row["term"]][0])
                for _, row in pdf.iterrows()
            ]
            if mode == "and" and len(lists) < n_terms:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": np.int64, "score": np.float64}
                )
            docs, scores = wand.score_topk(
                lists, wand.DenseDoclens(base, lens), avgdl, k1, b, k, mode, lo, hi,
                deleted=deleted, ub_scale=ub_scale,
            )
            return pd.DataFrame({"doc_id": docs, "score": scores})

        joined = rows.join(dl, "rng")
        if self._tomb_packed is not None:
            joined = joined.join(self._tomb_packed, "rng", "left")
        local_topk = joined.groupBy("rng").applyInPandas(score_range, "doc_id long, score double")
        return (
            local_topk.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", F.round("score", 6).alias("score"))
        )

    def search_many(self, queries: dict[str, tuple[list[str] | str, str, int]]) -> dict[str, list[tuple[int, float]]]:
        """Batch execution: one distributed job answers every query.

        ``queries``: qid -> (terms-or-raw-text, mode, k).  Amortizes the
        per-job latency (scheduler + scan) across the batch — on a real
        cluster one postings scan serves the whole query log slice.
        Results are identical to per-query :meth:`search` (tested)."""
        meta = self.meta
        n_docs, avgdl, k1, b, span = self.n_live, self.avgdl_live, meta["k1"], meta["b"], self.span
        ub_scale = self.ub_scale

        parsed: dict[str, tuple[list[str], str, int]] = {}
        for qid, (q, mode, k) in queries.items():
            terms = sorted(set(q if isinstance(q, list) else tokenize_py(q)))
            parsed[qid] = (terms, mode, k)
        all_terms = sorted({t for terms, _, _ in parsed.values() for t in terms})
        if not all_terms:
            return {qid: [] for qid in parsed}
        stats = self.term_stats_for(all_terms)
        idfs = {t: wand.idf(n_docs, stats[t][0]) for t in stats}

        # queries that can't match at all (AND with a missing term)
        results: dict[str, list] = {}
        live: dict[str, tuple[list[str], str, int]] = {}
        for qid, (terms, mode, k) in parsed.items():
            present = [t for t in terms if t in stats]
            if not present or (mode == "and" and len(present) < len(terms)):
                results[qid] = []
            else:
                live[qid] = (present, mode, k)
        if not live:
            return results

        needed = sorted({t for terms, _, _ in live.values() for t in terms})
        rows = self.postings_for(needed).withColumn(
            "rng",
            F.explode(
                F.sequence((F.col("min_doc") / span).cast("int"), (F.col("max_doc") / span).cast("int"))
            ),
        )

        def score_range(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame({"qid": [], "doc_id": [], "score": []}).astype(
                    {"qid": str, "doc_id": np.int64, "score": np.float64}
                )
            rng = int(pdf["rng"].iloc[0])
            lo, hi = rng * span, (rng + 1) * span - 1
            base = int(pdf["base"].iloc[0])
            lens = np.frombuffer(pdf["doclens"].iloc[0], dtype=np.int32)
            deleted = None
            if "deleted" in pdf.columns and pdf["deleted"].iloc[0] is not None:
                deleted = np.frombuffer(pdf["deleted"].iloc[0], dtype=np.int64)
            by_term = {}
            for _, row in pdf.iterrows():
                by_term[row["term"]] = _mk_termlist(row, idfs[row["term"]], stats[row["term"]][0])
            dlk = wand.DenseDoclens(base, lens)
            out_q, out_d, out_s = [], [], []
            for qid, (terms, mode, k) in live.items():
                lists = [by_term[t] for t in terms if t in by_term]
                if not lists or (mode == "and" and len(lists) < len(terms)):
                    continue
                docs, scores = wand.score_topk(
                    lists, dlk, avgdl, k1, b, k, mode, lo, hi,
                    deleted=deleted, ub_scale=ub_scale,
                )
                out_q.extend([qid] * docs.size)
                out_d.extend(docs.tolist())
                out_s.extend(scores.tolist())
            return pd.DataFrame({"qid": out_q, "doc_id": out_d, "score": out_s}).astype(
                {"qid": str, "doc_id": np.int64, "score": np.float64}
            )

        joined = rows.join(self._doclens, "rng")
        if self._tomb_packed is not None:
            joined = joined.join(self._tomb_packed, "rng", "left")
        local_topk = joined.groupBy("rng").applyInPandas(score_range, "qid string, doc_id long, score double")

        from pyspark.sql.window import Window

        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
        kmap = F.create_map(*[F.lit(x) for qid, (_, _, k) in live.items() for x in (qid, k)])
        final = (
            local_topk.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= kmap[F.col("qid")])
            .select("qid", "doc_id", F.round("score", 6).alias("score"), "_rk")
            .collect()
        )
        for qid in live:
            results[qid] = []
        for r in sorted(final, key=lambda r: (r["qid"], r["_rk"])):
            results[r["qid"]].append((r["doc_id"], r["score"]))
        return results

    def open_local(self) -> "LocalSearcher":
        return LocalSearcher(self)


class LocalSearcher:
    """Driver-side searcher: loads packed doclens once, caches per-term
    posting rows after first touch.  Millisecond-scale repeated queries —
    the p95-latency path of the bench."""

    def __init__(self, index: InvertedIndex):
        self.index = index
        self.meta = index.meta
        dl_rows = index._doclens.orderBy("rng").collect()
        max_id = max(r["base"] + len(r["doclens"]) // 4 for r in dl_rows)
        self.doclens = np.zeros(max_id, dtype=np.int32)
        for r in dl_rows:
            arr = np.frombuffer(r["doclens"], dtype=np.int32)
            self.doclens[r["base"]: r["base"] + arr.size] = arr
        self.deleted = np.zeros(0, np.int64)
        if index._tomb_packed is not None:
            parts = [np.frombuffer(r["deleted"], dtype=np.int64) for r in index._tomb_packed.collect()]
            if parts:
                self.deleted = np.sort(np.concatenate(parts))
        self._cache: dict[str, list] = {}

    def _rows_for(self, terms: list[str]) -> None:
        missing = [t for t in terms if t not in self._cache]
        if not missing:
            return
        stats = self.index.term_stats_for(missing)
        rows = self.index.postings_for(missing).collect()
        for t in missing:
            self._cache[t] = []
        n_docs = self.index.n_live
        for r in rows:
            t = r["term"]
            df = stats[t][0]
            self._cache[t].append((_mk_termlist(r.asDict(), wand.idf(n_docs, df), df), r["min_doc"]))
        for t in missing:
            self._cache[t].sort(key=lambda x: x[1])

    def search(self, query: str | list[str], k: int = 10, mode: str = "or") -> list[tuple[int, float]]:
        terms = sorted(set(query if isinstance(query, list) else tokenize_py(query)))
        self._rows_for(terms)
        lists = []
        for t in terms:
            rows = self._cache.get(t, [])
            if not rows:
                if mode == "and":
                    return []
                continue
            if len(rows) == 1:
                lists.append(rows[0][0])
            else:
                # stitch multi-row (heavy) terms into one virtual list via
                # the same byte-splice merge used at build time
                from goobi_viewer_indexer_spark.operators.spimi import merge_group_pdf

                pdf = pd.DataFrame(
                    [
                        {
                            "term": t,
                            "seg": 0,
                            "df": L.df,
                            "cf": 0,
                            "min_doc": md,
                            "max_doc": int(L.block_last_doc[-1]),
                            "doc_bytes": L.doc_bytes,
                            "tf_bytes": L.tf_bytes,
                            "block_last_doc": L.block_last_doc,
                            "block_doc_off": L.block_doc_off,
                            "block_tf_off": L.block_tf_off,
                            "block_max_w": L.block_max_w,
                        }
                        for (L, md) in rows
                    ]
                )
                merged = merge_group_pdf(pdf).iloc[0]
                total_df = int(pdf["df"].sum())
                lists.append(_mk_termlist(merged, rows[0][0].idf, total_df))
        if not lists:
            return []
        dl = wand.DenseDoclens(0, self.doclens)
        docs, scores = wand.score_topk(
            lists, dl, self.index.avgdl_live, self.meta["k1"], self.meta["b"], k, mode,
            0, self.doclens.size - 1,
            deleted=self.deleted if self.deleted.size else None,
            ub_scale=self.index.ub_scale,
        )
        return [(int(d), round(float(s), 6)) for d, s in zip(docs, scores)]
