#!/usr/bin/env python
"""Headline benchmark — driver contract: prints ONE JSON line
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Measures (BASELINE.md §2):
* index-build throughput (docs/sec): full SPIMI build + salted merge +
  stats over (a) the sf documents table and (b) a larger synthetic
  source-code corpus (input_hint shape) — the 100 TB-shaped workload;
* top-k BM25 latency: distributed search wall time and LocalSearcher
  p50/p95 over repeated mixed conjunctive/disjunctive queries;
* representative operator timings (dedup LSH, ANN, text quality,
  relational join/window) at the bench scale factor.

Measurement protocol (round 5, VERDICT r4 #1 "what's wrong" — this box
is a shared-host VM with documented ±2× minute-to-minute drift, which
made the round-4 official number swing +42% on byte-identical code):

* the process tree is PINNED with ``taskset -c 0..CPUS-1`` (re-exec;
  JVM, parquet IO and the Python pandas-UDF daemons included);
* the whole timed suite runs ``SPARK_GRAFT_BENCH_REPS`` (default 2)
  times back-to-back in one JVM — interleaved reps see the same host
  weather;
* ``queries`` reports the per-entry BEST-OF (noise is strictly
  additive), ``value`` their sum; ``pair_median`` is the median of the
  per-rep timed totals — the robust round-over-round comparison field;
  per-rep raw totals ship in ``rep_totals`` so any drift is visible.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CORPUS_DOCS = int(os.environ.get("SPARK_GRAFT_CORPUS_DOCS", "20000"))
QUERY_REPS = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "20"))
BENCH_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

BENCH_QUERIES = [
    (["table", "join"], "or", 10),
    (["table", "join"], "and", 10),
    (["spark", "window", "value"], "or", 10),
    (["the"], "or", 20),
    (["value", "row", "data", "key", "fast"], "or", 100),
    (["zzznope", "table"], "or", 10),
]
CORPUS_QUERIES = [
    (["def", "return", "token"], "or", 10),
    (["class", "import"], "and", 10),
    (["def"], "or", 10),
    (["lexer", "parse", "state", "config", "word13"], "or", 100),
]


def _pin_self() -> str:
    """Re-exec the whole process tree under ``taskset -c`` (once): the JVM
    and every forked pandas-UDF daemon inherit the affinity mask.  Returns
    the pin description for the emitted protocol string."""
    cores = f"0-{int(CPUS) - 1}"
    if os.environ.get("_GVI_BENCH_PINNED") == "1":
        return f"taskset -c {cores}"
    if shutil.which("taskset") is None:
        return "unpinned (no taskset)"
    os.environ["_GVI_BENCH_PINNED"] = "1"
    os.execvp("taskset", ["taskset", "-c", cores, sys.executable, *sys.argv])
    raise RuntimeError("unreachable")  # pragma: no cover


def run_suite(spark, corpus_src: str) -> tuple[dict[str, float], dict[str, object]]:
    """One full timed pass of every headline entry (fresh index dirs)."""
    from pyspark.sql import functions as F

    from goobi_viewer_indexer_spark.config import IndexConfig
    from goobi_viewer_indexer_spark.operators import dedup, similarity, text_analysis
    from goobi_viewer_indexer_spark.operators.search import FieldedIndex, InvertedIndex
    from goobi_viewer_indexer_spark.plans.build import build_index, build_index_fielded
    from goobi_viewer_indexer_spark.plans.maintenance import set_stored_fields
    from goobi_viewer_indexer_spark import suite

    timings: dict[str, float] = {}
    extras: dict[str, object] = {}

    def timed(name: str, fn):
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"[bench] {name} done in {timings[name]}s", file=sys.stderr, flush=True)
        return out

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()

    # ---- 1. index build over the sf documents table ----
    idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
    cfg = IndexConfig(docs_per_segment=max(256, n_docs // 64), merge_fanin=8, postings_buckets=64)
    timed("build_index_documents", lambda: build_index(docs, idx_dir, cfg))
    extras["build_docs_per_sec"] = round(n_docs / timings["build_index_documents"], 1)
    idx = InvertedIndex(spark, idx_dir)

    def _dir_bytes(d):
        total = 0
        for root, _dirs, files in os.walk(d):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    # storage efficiency: postings (incl. positional stream) per source byte
    src_bytes = docs.select(F.sum(F.length(F.coalesce(F.col("text"), F.lit(""))))).collect()[0][0]
    extras["postings_bytes"] = _dir_bytes(os.path.join(idx_dir, "postings"))
    extras["index_bytes_per_source_byte"] = round(extras["postings_bytes"] / max(src_bytes, 1), 3)

    # ---- 2. distributed search ----
    # search_many: ONE job answers the whole query batch (per-job scheduler
    # + scan overhead amortized — the default multi-query path)
    timed(
        "search_distributed_6q",
        lambda: idx.search_many({f"q{i}": (t, m, k) for i, (t, m, k) in enumerate(BENCH_QUERIES)}),
    )

    # phrase queries over the positional stream; the third is a common-term
    # phrase (both terms in ~78% of docs → ~3.2k AND-candidates at sf0.1),
    # the shape that stresses the vectorized position-verify kernel
    def run_phrases():
        idx.search_phrase(["table", "join"], k=10).collect()
        idx.search_phrase(["spark", "window"], k=10).collect()

    timed("search_phrase_2q", run_phrases)
    timed("search_phrase_common", lambda: idx.search_phrase(["stream", "value"], k=10).collect())

    # ---- 2b. multi-field index: build + field-scoped BM25F queries ----
    fidx_dir = tempfile.mkdtemp(prefix="bench_fidx_")
    timed(
        "build_index_fielded",
        lambda: build_index_fielded(docs, fidx_dir, {"text": "text", "source": "source", "lang": "lang"}, cfg),
    )
    fidx = FieldedIndex(spark, fidx_dir)

    def run_fielded():
        fidx.search([("source", "src7"), ("text", "table")], k=10, mode="and").collect()
        fidx.search([("text", "spark"), ("lang", "en")], k=10, mode="or", boosts={"lang": 0.25}).collect()
        fidx.search_phrase("text", ["spark", "window"], k=10).collect()

    timed("search_fielded_3q", run_fielded)

    # boolean NOT + wildcard expansion, both engines (round-3 surface)
    def run_boolean():
        idx.search_boolean("table join -spark", k=10).collect()
        idx.search_boolean("table s*", k=10).collect()
        fidx.search("lang:en AND text:s*", k=10).collect()

    timed("search_boolean_wildcard_3q", run_boolean)

    # round-3 rewrites + read contract: fuzzy probe expansion, grouped
    # collapse (needs stored fields), cursor deep page
    set_stored_fields(spark, idx_dir, docs.select("doc_id", "source"), tag="bench_stored")
    idx_st = InvertedIndex(spark, idx_dir)

    def run_rewrites():
        idx_st.search_fuzzy("tabl", k=10).collect()
        idx_st.search_grouped(["table", "join"], "source", k_groups=5, docs_per_group=2).collect()
        p1 = idx_st.search(["table", "join"], k=10, mode="or").collect()
        idx_st.search(["table", "join"], k=10, mode="or", after=(p1[-1]["score"], p1[-1]["doc_id"])).collect()

    timed("search_fuzzy_grouped_cursor", run_rewrites)

    # round-4 surface: range clause (constant-score dictionary expansion),
    # compound score+field sort (total-recall + TakeOrderedAndProject),
    # facet.range (gap buckets over the match set)
    def run_round4():
        fidx.search("text:table AND source:[src10 TO src20]", k=10).collect()
        idx_st.search(["table", "join"], k=10, mode="and", sort="score desc, source asc", fl=["source"]).collect()
        idx_st.facet_range(["table", "join"], docs.select("doc_id", "n_chars"), "n_chars", 0, 500, 100).collect()

    timed("search_range_compound_facetrange", run_round4)

    # round-5 surface: doc-values-routed high-cardinality range (pushed
    # stored filter ⋈ match set — no dictionary expansion), flat boolean
    # range token (constant-score dictionary slice)
    set_stored_fields(
        spark, fidx_dir,
        docs.select("doc_id", F.col("n_chars").cast("long").alias("nch")),
        tag="bench_fstored",
    )
    fidx_dv = FieldedIndex(spark, fidx_dir)
    fidx_dv.docvalues_fields.add("nch")

    def run_round5():
        fidx_dv.search("text:table AND nch:[150 TO 400]", k=10).collect()
        idx_st.search_boolean("table [sa TO sz]", k=10).collect()

    timed("search_docvalues_range_2q", run_round5)

    # round-5b surface: sloppy proximity phrase ("a b"~3 ordered-window
    # greedy-chain verify) and the edismax composition fq+pf (membership
    # semi-join + whole-query phrase boost, one TakeOrderedAndProject)
    def run_round5b():
        idx.search_phrase(["table", "spark"], k=10, slop=3).collect()
        idx.search(["table", "spark"], k=10, mode="or", pf=2.0, ps=3, fq="scan").collect()
        fidx_dv.search('lang:en AND text:"table spark"~3', k=10).collect()

    timed("search_proximity_pf_3q", run_round5b)

    # round-5c surface: edismax qf/tie DisMax main-query scoring — the
    # |terms|x|qf| fan-out + two partial-agg shuffles + one
    # TakeOrderedAndProject, with and without an fq membership semi-join
    def run_dismax():
        fidx_dv.search_dismax("table spark", {"text": 1.0, "source": 2.0}, k=10, tie=0.3).collect()
        fidx_dv.search_dismax("table spark", {"text": 1.0, "lang": 2.0}, k=10, tie=0.1, fq="lang:en").collect()

    timed("search_dismax_2q", run_dismax)

    # batched dismax: three edismax queries in ONE job (lists decoded once)
    timed("search_dismax_many_3q", lambda: fidx_dv.search_dismax_many({
        "a": ("table spark", {"text": 1.0, "source": 2.0}, 10, 0.3),
        "b": ("table join window", {"text": 1.0, "lang": 2.0}, 10, 0.5, 2),
        "c": ("scan value", {"text": 1.0}, 10, 1.0),
    }))
    shutil.rmtree(fidx_dir, ignore_errors=True)

    # ---- 3. local searcher latency p50/p95 ----
    local = idx.open_local()
    for terms, mode, k in BENCH_QUERIES:
        local.search(terms, k=k, mode=mode)  # warm cache
    lat = []
    t0 = time.time()
    for _ in range(QUERY_REPS):
        for terms, mode, k in BENCH_QUERIES:
            t1 = time.time()
            local.search(terms, k=k, mode=mode)
            lat.append(time.time() - t1)
    timings["search_local_repeated"] = round(time.time() - t0, 3)
    lat.sort()
    extras["query_p50_ms"] = round(lat[len(lat) // 2] * 1000, 3)
    extras["query_p95_ms"] = round(lat[int(len(lat) * 0.95)] * 1000, 3)

    # ---- 4. synthetic source-code corpus build (the 100 TB shape) ----
    corpus_dir = tempfile.mkdtemp(prefix="bench_corpus_idx_")
    ccfg = IndexConfig(docs_per_segment=2048, merge_fanin=8, postings_buckets=64)
    corpus = spark.read.parquet(corpus_src)

    timed("build_index_corpus", lambda: build_index(corpus, corpus_dir, ccfg, text_col="content"))
    extras["corpus_docs"] = CORPUS_DOCS
    extras["corpus_docs_per_sec"] = round(CORPUS_DOCS / timings["build_index_corpus"], 1)
    cidx = InvertedIndex(spark, corpus_dir)

    timed(
        "search_corpus_distributed_4q",
        lambda: cidx.search_many({f"c{i}": (t, m, k) for i, (t, m, k) in enumerate(CORPUS_QUERIES)}),
    )

    # ---- 5. operator suite at bench SF ----
    # production minhash path: xxhash64 (no JVM MessageDigest lock; verified
    # output == the md5 oracle twin by pytest)
    timed(
        "dedup_minhash_lsh",
        lambda: dedup.minhash_near_duplicates(docs, threshold=0.35, hash_fn="xxhash64").count(),
    )

    # round-5c graph stage: connected components over simhash candidate
    # pairs (min-label contraction + path compression) and a cross-corpus
    # decontamination scan against a small benchmark subset
    def run_dedup_graph():
        pairs = dedup.simhash_candidate_pairs(docs, max_hamming=3).select("doc_a", "doc_b")
        dedup.duplicate_components(pairs).collect()
        dedup.cross_ngram_overlap(
            docs, docs.filter(F.col("doc_id") % 499 == 0), threshold=0.8
        ).count()

    timed("dedup_clusters_decontam", run_dedup_graph)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    timed("ann_bruteforce_topk", lambda: similarity.cosine_topk_bruteforce(emb, list(qv), k=10, exclude_id=0).collect())
    # scale path: sketch once into a (table, bucket)-partitioned index,
    # then each query partition-prunes instead of re-sketching the table
    ann_dir = tempfile.mkdtemp(prefix="bench_ann_")
    timed("ann_index_build", lambda: similarity.AnnIndex.build(emb, ann_dir, dim=64, n_planes=5))
    aidx = similarity.AnnIndex(spark, ann_dir, 64, n_planes=5)
    timed("ann_lsh_topk", lambda: aidx.query(list(qv), k=10).collect())
    qv3 = {f"q{i}": list(emb.filter(F.col("vec_id") == i).select("embedding").collect()[0][0])
           for i in (0, 7, 23)}
    # batched probes: one scan of the cell union answers all three
    timed("ann_lsh_batch_3q", lambda: aidx.query_many(qv3, k=10))
    shutil.rmtree(ann_dir, ignore_errors=True)
    timed("text_quality_score", lambda: text_analysis.quality_score(docs).count())
    qs = suite.queries()
    timed("relational_deepest_owner", lambda: qs["join_deepest_owner_per_page"](spark, SF_DIR).count())
    timed("relational_window_renumber", lambda: qs["window_volume_renumber"](spark, SF_DIR).count())

    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    return timings, extras


def main() -> None:
    pin = _pin_self()

    from goobi_viewer_indexer_spark.plans.build import assign_doc_ids
    from goobi_viewer_indexer_spark.session import get_spark
    from goobi_viewer_indexer_spark.sources.corpus import generate_corpus

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the synthetic corpus ONCE (input production, not engine
    # work — every rep reads the same parquet)
    corpus_src = tempfile.mkdtemp(prefix="bench_corpus_src_")
    (
        assign_doc_ids(generate_corpus(spark, CORPUS_DOCS), ["repo", "path", "commit"])
        .write.mode("overwrite").parquet(corpus_src)
    )

    reps: list[tuple[dict[str, float], dict[str, object]]] = []
    for i in range(BENCH_REPS):
        print(f"[bench] === rep {i + 1}/{BENCH_REPS} ===", file=sys.stderr, flush=True)
        reps.append(run_suite(spark, corpus_src))
    shutil.rmtree(corpus_src, ignore_errors=True)
    spark.stop()

    names = list(reps[0][0].keys())
    best = {n: round(min(t[n] for t, _ in reps), 3) for n in names}
    med = {n: round(statistics.median(t[n] for t, _ in reps), 3) for n in names}
    rep_totals = [round(sum(t.values()), 3) for t, _ in reps]
    # extras from the best (fastest-total) rep; latency percentiles also
    # reported as across-rep medians
    best_extras = reps[rep_totals.index(min(rep_totals))][1]
    extras = dict(best_extras)
    extras["query_p50_ms_median"] = round(
        statistics.median(float(e["query_p50_ms"]) for _, e in reps), 3
    )
    extras["query_p95_ms_median"] = round(
        statistics.median(float(e["query_p95_ms"]) for _, e in reps), 3
    )

    print(
        json.dumps(
            {
                "metric": "index-build + BM25 query + pipeline-operator wall time (per-entry best-of)",
                "value": round(sum(best.values()), 3),
                "unit": "sec",
                "queries": best,
                "queries_median": med,
                "rep_totals": rep_totals,
                "pair_median": round(statistics.median(rep_totals), 3),
                "reps": BENCH_REPS,
                "protocol": (
                    f"{pin}; {BENCH_REPS} interleaved full-suite reps in one JVM; "
                    "queries/value = per-entry best-of (additive noise); "
                    "pair_median = median of per-rep timed totals (round-over-round field)"
                ),
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
