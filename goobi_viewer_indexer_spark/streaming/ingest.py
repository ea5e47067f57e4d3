"""Structured-Streaming re-expression of the reference's hotfolder poll
loop (SURVEY.md §2-C).

The reference polls a directory every 500-1000 ms, debounces half-copied
folders by comparing sizes 1 s apart, and feeds a bounded in-process queue
(helper/Hotfolder.java:431-503,1017-1046; SolrIndexerDaemon.java:245-259).
Spark-native equivalents:

* file-source ``readStream`` with checkpointed offsets — replaces the
  queue and the "already indexed?" bookkeeping; end-to-end exactly-once:
  the checkpoint dedups files across triggers AND the sink is idempotent
  per batch_id (txn-tagged ``add_docs``), so a batch replayed after a
  mid-batch failure re-applies its staged delta instead of duplicating;
* ``Trigger.AvailableNow`` — drain-everything-then-stop semantics, the
  batch-friendly form of the poll loop;
* ``maxFilesPerTrigger`` — replaces queueCapacity(500);
* ``foreachBatch`` → :func:`plans.maintenance.add_docs` — each micro-batch
  appends an LSM delta segment, so the index stays queryable mid-ingest.

The reference has no event-time semantics; :func:`windowed_event_counts`
adds the watermarked tumbling-window aggregation a streaming corpus needs
(late data dropped after the watermark), exercised by tests over the
``events`` table replayed as a stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goobi_viewer_indexer_spark.config import IndexConfig

__all__ = ["ingest_available_now", "windowed_event_counts", "debounced_stable_files"]


def debounced_stable_files(observations: DataFrame) -> DataFrame:
    """The reference's half-copied-folder debounce as a CUSTOM STATEFUL
    streaming operator (``applyInPandasWithState``).

    Reference: helper/Hotfolder.java:1017-1046 polls a candidate folder,
    records its size, sleeps, and only enqueues it when two consecutive
    size probes agree (a copy in progress keeps growing).  Here the poll
    loop is a stream of (path, size, ts) observations; per-path state
    carries (last_size, emitted) across micro-batches, and a path is
    EMITTED exactly once — on the first observation whose size equals the
    previous one.  Pure Arrow: state is two scalars per live path, so a
    billion in-flight files is a few GB of state store.

    Works only on a streaming DataFrame (state requires a streaming
    query); the pytest drives it with maxFilesPerTrigger=1 so state
    provably crosses micro-batch boundaries.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key: tuple, pdfs, state: GroupState):
        last_size, emitted = state.get if state.exists else (None, False)
        out_rows = []
        for pdf in pdfs:
            for rec in pdf.sort_values("ts").to_dict("records"):
                size = int(rec["size"])
                if not emitted and last_size is not None and size == last_size:
                    emitted = True
                    out_rows.append({"path": key[0], "size": size})
                last_size = size
        state.update((last_size, emitted))
        if out_rows:
            yield pd.DataFrame(out_rows)

    return observations.groupBy("path").applyInPandasWithState(
        fn,
        outputStructType="path string, size long",
        stateStructType="last_size long, emitted boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ingest_available_now(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    cfg: IndexConfig = IndexConfig(),
    schema: str = "doc_id long, text string",
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
    fields: dict[str, str] | None = None,
) -> None:
    """Drain ``input_dir`` (parquet files) into the index, exactly once per
    file, resumable via the checkpoint.  First batch bootstraps the index;
    subsequent batches append delta segments.  ``fields`` (field name →
    source column) bootstraps a MULTI-FIELD index instead; appends are
    fielded automatically (add_docs reads the layout from meta)."""
    from goobi_viewer_indexer_spark.plans.build import (
        assign_sequential_ids,
        build_index,
        build_index_fielded,
    )
    from goobi_viewer_indexer_spark.plans.maintenance import add_docs

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # Exactly-once per BATCH, not just per file: foreachBatch replays a
        # batch after a mid-batch failure, so the append itself must be
        # idempotent.  The bootstrap build is (commit markers); appends run
        # under a batch_id-keyed txn tag — a replayed batch re-applies the
        # identical staged delta instead of appending a second copy
        # (ADVICE r1; see plans/txn.py for the commit protocol).
        if batch_df.isEmpty():
            return
        bootstrap_marker = os.path.join(index_dir, "_BOOTSTRAP_BATCH")
        if not os.path.exists(os.path.join(index_dir, "_SUCCESS")):
            # pin WHICH batch bootstraps the index BEFORE building: if the
            # process dies after the build commits but before the checkpoint
            # does, the replayed batch must not take the add_docs path and
            # ingest its documents a second time as a delta (ADVICE r2)
            os.makedirs(index_dir, exist_ok=True)
            if not os.path.exists(bootstrap_marker):
                tmp = bootstrap_marker + ".tmp"
                with open(tmp, "w") as f:
                    f.write(str(batch_id))
                os.rename(tmp, bootstrap_marker)
            docs = batch_df
            if "doc_id" not in docs.columns:
                # partition-parallel dense ids — a global orderBy window
                # would pull the whole bootstrap corpus into one task
                docs = assign_sequential_ids(docs, base=0)
            if fields:
                build_index_fielded(docs, index_dir, fields, cfg, id_col="doc_id")
            else:
                build_index(docs, index_dir, cfg, id_col="doc_id", text_col=text_col)
        elif os.path.exists(bootstrap_marker) and int(open(bootstrap_marker).read()) == batch_id:
            return  # replayed bootstrap batch after a pre-checkpoint crash: no-op
        else:
            cols = list(fields.values()) if fields else [text_col]
            add_docs(spark, index_dir, batch_df.select(*cols), text_col=text_col,
                     tag=f"ingest_batch_{batch_id}")

    (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — works on both a
    streaming and a batch DataFrame (the batch form is the DuckDB-checkable
    oracle twin registered in the suite)."""
    # event-time must be TIMESTAMP (with zone); parquet NTZ reinterprets as
    # UTC under the engine's fixed UTC session timezone
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def streaming_exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exactly-once CONTENT dedup across micro-batches — the streaming
    twin of ``dedup.exact_duplicates`` for continuous ingest: a doc
    passes through only if its sha256(text) has never been seen in any
    earlier micro-batch (or earlier in the same batch, smallest id
    first).  Custom stateful operator (``applyInPandasWithState``) keyed
    by the content hash; per-hash state is ONE boolean, so state-store
    size is bytes per distinct document ever seen — the shape that holds
    at an unbounded stream.  Emits (doc_id, content_sha256).

    Note Spark's built-in ``dropDuplicates`` on a stream also keeps
    state, but evicts it only under an event-time watermark — content
    dedup must NOT forget old hashes, so the explicit state op (NoTimeout)
    states that contract instead of hiding it."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("content_sha256"),
    )

    def fn(key: tuple, pdfs, state: GroupState):
        seen = state.get[0] if state.exists else False
        best = None
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                d = int(rec["doc_id"])
                if best is None or d < best:
                    best = d
        if not seen and best is not None:
            state.update((True,))
            yield pd.DataFrame([{"doc_id": best, "content_sha256": key[0]}])
        elif not state.exists:
            state.update((seen,))

    return hashed.groupBy("content_sha256").applyInPandasWithState(
        fn,
        outputStructType="doc_id long, content_sha256 string",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
