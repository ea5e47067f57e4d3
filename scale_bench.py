#!/usr/bin/env python
"""Two-parallelism-level scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox proxy per BASELINE.md:
the identical spark-submit job at local[8] vs local[32] on the same input).

Protocol (this box is a shared-host VM with visible run-to-run noise):
* the corpus is generated ONCE and materialized to parquet;
* each parallelism level runs ``reps`` times in a FRESH JVM via
  ``spark-submit --py-files``, interleaved (2,8,2,8,…) so slow host
  phases hit both levels equally;
* each level is PINNED to that many physical CPUs with ``taskset -c``
  — otherwise local[2] on a 32-core host borrows extra cores for GC,
  parquet IO and the Python pandas-UDF daemons, which understates the
  true 2-core time and therefore the scaling efficiency (the honest
  "cluster of N executors" proxy is N actual cores);
* per level we report the MIN build time (noise is strictly additive),
  AND per interleaved rep the matched-pair efficiency (consecutive runs
  see the same host weather — the paired form controls for drift);
* timing covers the SPIMI build stages only (session startup excluded).

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
N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "300000"))
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "8,32").split(",")]
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))

GEN_WORKER = r"""
import sys
from goobi_viewer_indexer_spark.session import get_spark
from goobi_viewer_indexer_spark.sources.corpus import generate_corpus
from goobi_viewer_indexer_spark.plans.build import assign_doc_ids
n_docs, out = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name="scale-gen", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
(assign_doc_ids(generate_corpus(spark, n_docs), ["repo", "path", "commit"])
 .write.mode("overwrite").parquet(out))
spark.stop()
"""

BUILD_WORKER = r"""
import glob, json, os, sys, tempfile, time, shutil
from goobi_viewer_indexer_spark.session import get_spark
from goobi_viewer_indexer_spark.plans.build import build_index
from goobi_viewer_indexer_spark.operators.search import InvertedIndex
from goobi_viewer_indexer_spark.config import IndexConfig

cores, corpus_path, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
# Split-COUNT, not split-size, is the parallelism invariant: the stage-0/1
# scans feed CPU-heavy Arrow UDFs, so every core needs >=2 waves of input
# splits for balance at the LARGEST level.  At 100 TB the default 128 MB
# already yields ~10^6 splits (>> cores) and needs no tuning; a
# sandbox-scale corpus (~650 MB) gives only ~5 splits at the default,
# which starves local[8] and understates scaling.  The value is
# deliberately the SAME at every level (sized for the largest, 24 splits)
# so both cluster sizes execute the identical physical plan — a
# per-level split size would make the scaling comparison two different
# jobs.
corpus_bytes = sum(os.path.getsize(p) for p in glob.glob(corpus_path + "/*.parquet"))
mpb = min(128 << 20, max(4 << 20, corpus_bytes // 24))
spark = get_spark(app_name=f"scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores,
                  extra_conf={"spark.sql.files.maxPartitionBytes": str(mpb)})
spark.sparkContext.setLogLevel("ERROR")
cfg = IndexConfig(docs_per_segment=2048, merge_fanin=8, postings_buckets=64,
                  shuffle_partitions=cores)
docs = spark.read.parquet(corpus_path)
n_docs = docs.count()

idx_dir = tempfile.mkdtemp(prefix=f"scale_idx_{cores}_")
t0 = time.time()
meta = build_index(docs, idx_dir, cfg, text_col="content")
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
               "build_docs_per_sec": n_docs / t_build, "query_4q_sec": t_query,
               "stage_sec": meta.get("stage_sec", {})}, f)
shutil.rmtree(idx_dir, ignore_errors=True)
spark.stop()
"""


def _submit(pyfile: str, zpath: str, args: list[str], cores: int | None = None) -> None:
    """Run one worker in a fresh JVM; ``cores`` pins the WHOLE process tree
    (JVM + python UDF daemons) to that many physical CPUs."""
    prefix = ["taskset", "-c", f"0-{cores - 1}"] if cores else []
    master = f"local[{cores}]" if cores else "local[32]"
    cmd = [*prefix, "spark-submit", "--master", master, "--py-files", zpath,
           "--driver-memory", "48g", pyfile, *args]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(f"spark-submit failed ({r.returncode}): {' '.join(args)}")


def main() -> None:
    zpath = os.path.join(tempfile.gettempdir(), "gvi_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "goobi_viewer_indexer_spark")
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))

    tmp = tempfile.gettempdir()
    gen_file = os.path.join(tmp, "gvi_scale_gen.py")
    build_file = os.path.join(tmp, "gvi_scale_build.py")
    with open(gen_file, "w") as f:
        f.write(GEN_WORKER)
    with open(build_file, "w") as f:
        f.write(BUILD_WORKER)

    corpus_path = os.path.join(tmp, f"gvi_scale_corpus_{N_DOCS}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        _submit(gen_file, zpath, [str(N_DOCS), corpus_path])

    samples: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for rep in range(REPS):
        for cores in LEVELS:
            out = os.path.join(tmp, f"gvi_scale_{cores}_{rep}.json")
            _submit(build_file, zpath, [str(cores), corpus_path, out], cores=cores)
            with open(out) as f:
                samples[cores].append(json.load(f))

    best = {c: min(s, key=lambda r: r["build_sec"]) for c, s in samples.items()}
    lo, hi = min(LEVELS), max(LEVELS)
    thr_lo = best[lo]["build_docs_per_sec"]
    thr_hi = best[hi]["build_docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    # matched interleaved pairs: rep i at lo vs rep i at hi ran back-to-back
    pair_effs = [
        (samples[hi][i]["build_docs_per_sec"] / samples[lo][i]["build_docs_per_sec"]) / (hi / lo)
        for i in range(REPS)
    ]
    med_pair = sorted(pair_effs)[len(pair_effs) // 2]

    lines = [
        "# SCALING — two-parallelism-level evidence (north rule proxy)",
        "",
        f"Same `spark-submit --py-files` job (SPIMI build + merge + stats over a",
        f"pre-materialized {N_DOCS}-doc synthetic source-code corpus, then 4",
        f"distributed BM25 queries), {REPS} interleaved reps per level, fresh JVM",
        "each, each level pinned to its core count with `taskset -c` (so",
        "local[N] really gets N CPUs — JVM GC, parquet IO and the Python",
        "pandas-UDF daemons included); best-of-reps AND per-pair efficiencies",
        "reported (shared-host VM noise is additive):",
        "",
        "| cores | build sec (best) | build docs/sec | 4-query sec | all build samples (s) |",
        "|---|---|---|---|---|",
    ]
    for c in LEVELS:
        r = best[c]
        allsec = ", ".join(f"{s['build_sec']:.1f}" for s in samples[c])
        lines.append(
            f"| local[{c}] | {r['build_sec']:.1f} | {r['build_docs_per_sec']:.0f} | {r['query_4q_sec']:.1f} | {allsec} |"
        )
    lines += [
        "",
        "Per-stage seconds (best run):",
        "",
        "| stage | " + " | ".join(f"local[{c}]" for c in LEVELS) + " |",
        "|---|" + "|".join(["---"] * len(LEVELS)) + "|",
    ]
    stages = list(best[LEVELS[0]].get("stage_sec", {}).keys())
    for st in stages:
        lines.append("| " + st + " | " + " | ".join(str(best[c]["stage_sec"].get(st, "-")) for c in LEVELS) + " |")
    pair_rows = [
        f"| {i} | {samples[lo][i]['build_sec']:.1f} | {samples[hi][i]['build_sec']:.1f} | {pair_effs[i]:.2f} |"
        for i in range(REPS)
    ]
    lines += [
        "",
        f"Raw interleaved pairs (rep i at local[{lo}] ran back-to-back with rep i",
        f"at local[{hi}], same host weather):",
        "",
        f"| rep | local[{lo}] build s | local[{hi}] build s | pair efficiency |",
        "|---|---|---|---|",
        *pair_rows,
        "",
        f"**Scaling efficiency (build throughput, {lo}→{hi} pinned cores):**",
        f"best-of-reps (thr_{hi}/thr_{lo})/({hi}/{lo}) = ({thr_hi:.0f}/{thr_lo:.0f})/{hi // lo} = **{eff:.2f}**;",
        f"matched-pair median = **{med_pair:.2f}** (pairs: "
        + ", ".join(f"{e:.2f}" for e in pair_effs) + ")",
        "",
        "Interpretation: a single machine shares one memory bus, disk and page",
        "cache, so this is a conservative lower bound for multi-node scaling",
        "where each executor gets its own memory/IO bandwidth; the",
        "partition-parallel design (contiguous doc-range segments, salted term",
        "merge) has no serial stage besides the final tiny stats aggregation.",
    ]
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")

    print(json.dumps({
        "best": best,
        "samples": {str(k): v for k, v in samples.items()},
        "scaling_efficiency": round(eff, 3),
        "pair_efficiencies": [round(e, 3) for e in pair_effs],
        "matched_pair_median": round(med_pair, 3),
    }))


if __name__ == "__main__":
    main()
