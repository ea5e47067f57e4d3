#!/usr/bin/env python
"""Two-parallelism-level scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox proxy per BASELINE.md:
the identical spark-submit job at local[8] vs local[32] on the same input).

Runs the full pipeline (corpus generation excluded from timing; SPIMI
build + merge + stats + distributed queries timed) in a FRESH JVM per
level via spark-submit --py-files, then reports throughput at both levels
and efficiency = (thr_32 / thr_8) / (32 / 8).

Writes SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))
N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "60000"))
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "8,32").split(",")]

WORKER = r"""
import json, os, sys, tempfile, time, shutil
from goobi_viewer_indexer_spark.session import get_spark
from goobi_viewer_indexer_spark.sources.corpus import generate_corpus
from goobi_viewer_indexer_spark.plans.build import build_index, assign_doc_ids
from goobi_viewer_indexer_spark.operators.search import InvertedIndex
from goobi_viewer_indexer_spark.config import IndexConfig

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); out = sys.argv[3]
spark = get_spark(app_name=f"scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
cfg = IndexConfig(docs_per_segment=2048, merge_fanin=8, postings_buckets=64)
# materialize the corpus first so generation cost is excluded from timing
corpus_path = tempfile.mkdtemp(prefix=f"scale_corpus_{cores}_")
(assign_doc_ids(generate_corpus(spark, n_docs), ["repo", "path", "commit"])
 .write.mode("overwrite").parquet(corpus_path))
docs = spark.read.parquet(corpus_path)
docs.count()

idx_dir = tempfile.mkdtemp(prefix=f"scale_idx_{cores}_")
t0 = time.time()
build_index(docs, idx_dir, cfg, text_col="content")
t_build = time.time() - t0

idx = InvertedIndex(spark, idx_dir)
queries = [(["def","return","token"], "or", 10), (["class","import"], "and", 10),
           (["def"], "or", 10), (["lexer","parse","state","config","word13"], "or", 100)]
t0 = time.time()
for terms, mode, k in queries:
    idx.search(terms, k=k, mode=mode).collect()
t_query = time.time() - t0

with open(out, "w") as f:
    json.dump({"cores": cores, "n_docs": n_docs, "build_sec": t_build,
               "build_docs_per_sec": n_docs / t_build, "query_4q_sec": t_query}, f)
shutil.rmtree(idx_dir, ignore_errors=True); shutil.rmtree(corpus_path, ignore_errors=True)
spark.stop()
"""


def main() -> None:
    # package zip for --py-files (the cluster-shaped deployment path)
    zpath = os.path.join(tempfile.gettempdir(), "gvi_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "goobi_viewer_indexer_spark")
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))

    worker_file = os.path.join(tempfile.gettempdir(), "gvi_scale_worker.py")
    with open(worker_file, "w") as f:
        f.write(WORKER)

    results = {}
    for cores in LEVELS:
        out = os.path.join(tempfile.gettempdir(), f"gvi_scale_{cores}.json")
        cmd = [
            "spark-submit",
            "--master", f"local[{cores}]",
            "--py-files", zpath,
            "--driver-memory", "8g",
            worker_file, str(cores), str(N_DOCS), out,
        ]
        env = dict(os.environ)
        subprocess.run(cmd, check=True, env=env, capture_output=True)
        with open(out) as f:
            results[cores] = json.load(f)

    lo, hi = min(LEVELS), max(LEVELS)
    thr_lo = results[lo]["build_docs_per_sec"]
    thr_hi = results[hi]["build_docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)

    lines = [
        "# SCALING — two-parallelism-level evidence (north rule proxy)",
        "",
        f"Same `spark-submit --py-files` job (SPIMI build + merge + stats over a",
        f"{N_DOCS}-doc synthetic source-code corpus, then 4 distributed BM25",
        "queries) at two parallelism levels on identical input:",
        "",
        "| cores | build sec | build docs/sec | 4-query sec |",
        "|---|---|---|---|",
    ]
    for c in LEVELS:
        r = results[c]
        lines.append(
            f"| local[{c}] | {r['build_sec']:.1f} | {r['build_docs_per_sec']:.0f} | {r['query_4q_sec']:.1f} |"
        )
    lines += [
        "",
        f"**Scaling efficiency (build throughput, {lo}→{hi} cores):** "
        f"(thr_{hi}/thr_{lo})/({hi}/{lo}) = ({thr_hi:.0f}/{thr_lo:.0f})/{hi // lo} = **{eff:.2f}**",
        "",
        "Interpretation: a single machine shares one memory bus and page cache,",
        "so this is a conservative lower bound for multi-node scaling where each",
        "executor gets its own memory bandwidth; the partition-parallel design",
        "(contiguous doc-range segments, salted term merge) has no serial stage",
        "besides the final tiny stats aggregation.",
    ]
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")

    print(json.dumps({"levels": results, "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
