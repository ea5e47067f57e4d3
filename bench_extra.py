#!/usr/bin/env python
"""Round-6 optimization helpers — NOT the driver bench (bench.py is frozen).

Two subcommands:

* ``plans [out_suffix] [name ...]`` — write ``.explain("formatted")`` for
  every (or the named) declared suite queries to ``plans/r06/<name>_<suffix>.txt``.
* ``time <entry> [reps]`` — time one bench entry in isolation with a noop
  sink where the entry returns a DataFrame (guide §1.4), several reps in
  one JVM, per-rep seconds printed.

Usage:
    python bench_extra.py plans before
    python bench_extra.py plans after q_field_stats join_deepest_owner_per_page
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session():
    from goobi_viewer_indexer_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_plans(argv: list[str]) -> None:
    suffix = argv[0] if argv else "before"
    import goobi_viewer_indexer_spark.relational  # noqa: F401 registers entries
    from goobi_viewer_indexer_spark import suite

    spark = get_session()
    names = argv[1:] or sorted(suite.queries().keys())
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    qs = suite.queries()
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"[plans] {name}: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cmd_query_noop(argv: list[str]) -> None:
    """Time declared suite queries with the noop sink: ``query_noop <name> [reps]``."""
    name, reps = argv[0], int(argv[1]) if len(argv) > 1 else 3
    import goobi_viewer_indexer_spark.relational  # noqa: F401
    from goobi_viewer_indexer_spark import suite

    spark = get_session()
    q = suite.queries()[name]
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.time()
        noop(q(spark, SF_DIR))
        print(f"[{name}] rep{i}: {time.time() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "plans"
    if cmd == "plans":
        cmd_plans(sys.argv[2:])
    elif cmd == "query_noop":
        cmd_query_noop(sys.argv[2:])
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")
