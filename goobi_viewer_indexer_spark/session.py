"""SparkSession factory with scale-oriented defaults.

Single place where engine-wide Spark tuning lives so tests, bench, and the
driver contract all run the same configuration.  Designed for a real
multi-executor cluster (AQE, skew-join handling, Arrow batches); in this
sandbox it runs on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "goobi-viewer-indexer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    # Python workers are separate processes: they must be able to import
    # this package regardless of the driver's cwd.  Exporting PYTHONPATH
    # before the JVM launches covers local mode; on a real cluster ship
    # the package with ``spark-submit --py-files`` (bench/scale scripts do).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{repo_root}{os.pathsep}{pp}" if pp else repo_root

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join splits.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas UDF / mapInPandas hop (the north rule's
        # "no per-row Python" requirement rides on this).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Generous broadcast ceiling: term_stats for query terms and dim
        # tables are always broadcast-joined.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # zstd everywhere: 24% smaller postings and 37% smaller text tables
        # than snappy AT THE SAME build wall time (A/B at 20k docs — the
        # smaller scan actually made the build faster); at 100 TB the saved
        # IO is the build's bottleneck resource.  Read-side zstd decode is
        # memory-bandwidth-fast and never showed in query p95.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
