"""Streaming-native event jobs (SURVEY.md §2 J1-J7 streaming column).

The events fixture is a batch parquet standing in for an unbounded
source (TESTDATA.md); ``read_events_stream`` consumes the SAME file via
``readStream`` so the identical groupBy/window code runs under the
micro-batch engine. Tests drive it to completion with a memory sink
(processAllAvailable) and compare against the batch twin — proving the
query shapes are genuinely streaming-compatible, which is what matters
when the real deployment swaps parquet for Kafka.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver has shipped events.parquet with ts as TIMESTAMP(NANOS)
    (needs nanosAsLong + truncate) and as TIMESTAMP(MICROS, ntz) across
    rounds — derive the stream schema from the actual parquet footer
    instead of hard-coding one flavor, identical to catalog.load."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    phys = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source wants a directory; glob-filter to the events table
    raw = (
        spark.readStream.schema(phys)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":  # nanos flavor
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # withWatermark rejects TIMESTAMP_NTZ (EVENT_TIME_IS_NOT_ON_
        # TIMESTAMP_TYPE); reinterpret the naive micros as UTC instants.
        # Session tz is pinned to UTC (session.get_session), so this is
        # a type tag change, not a value shift.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """J1+J4 streaming-native: watermarked tumbling window aggregate.
    Works identically on batch and streaming frames."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """J3 streaming-native session windows (same shape as the batch twin)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "sum_value")
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """J5 streaming-native: exactly-once event ids within the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, on_left: str, on_right: str) -> DataFrame:
    """J7: stream-static join (static side broadcast by the planner)."""
    return events.join(dim, events[on_left] == dim[on_right], "inner")


def interval_join_purchase_clicks(events: DataFrame, window: str = "30 minutes") -> DataFrame:
    """Stream-stream interval join: every click by the same user within
    ``window`` BEFORE a purchase (inclusive). The time-range predicate
    bounds each side's event time relative to the other, so with
    watermarks on BOTH inputs the join state is evictable — the
    streaming-native attribution join. On batch frames ``withWatermark``
    is a no-op and the same code is a plain range join (C6/E2).
    State scales with events-per-watermark-horizon per user, not with
    history — the 100 TB-stream shape.
    """
    p = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window}")),
    )
    return joined.select(
        "purchase_id", F.col("p_user").alias("user_id"), "p_ts", "click_id", "c_ts"
    )


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """J6 streaming-native: per-user running value via arbitrary stateful
    processing (``applyInPandasWithState``). State = one double (the
    user's cumulative value so far); each micro-batch appends rows
    (user_id, event_id, running_value).

    Batch twin (oracle-checked): ``operators.udfs.user_running_total_
    grouped_map`` — a window running-sum. Tests assert stream == batch on
    the bounded fixture. At scale, state is partitioned by user_id across
    executors and bounded by the watermark.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        total = state.get[0] if state.exists else 0.0
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            running = pdf["value"].cumsum() + total
            total = float(running.iloc[-1]) if len(running) else total
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "event_id": pdf["event_id"],
                    "running_value": running.round(2),
                }
            )
        state.update((total,))

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, event_id bigint, running_value double",
        stateStructType="total double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_parquet_sink(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    mode: str = "append",
) -> None:
    """Production sink shape: foreachBatch -> idempotent parquet append
    with a checkpoint. Restarting with the same checkpoint reprocesses
    nothing (offsets are committed per micro-batch) — the exactly-once
    story for file sources. Bounded input: runs to completion and stops."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # partition by micro-batch so replays after failure overwrite
        # their own batch directory instead of duplicating rows
        batch_df.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy("_batch_id").parquet(
            out_path
        )

    q = (
        stream_df.writeStream.outputMode(mode)
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Drive a (bounded) stream to completion into a memory sink and
    return the materialized result as a batch DataFrame."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """J6 via Spark 4's transformWithStateInPandas — the successor API to
    applyInPandasWithState (same per-key state partitioning, but typed
    state handles, timers, and RocksDB-backed stores). Functionally
    identical to running_user_totals_stream above; registered separately
    so both arbitrary-state APIs stay covered. Requires the RocksDB state
    store provider (set by the caller / test) and protobuf in the Python
    workers — absent protobuf (this container), the test skips and the
    applyInPandasWithState twin carries J6."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", "total double")

        def handleInputRows(self, key, rows, timerValues):
            total = self._total.get()[0] if self._total.exists() else 0.0
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                running = pdf["value"].cumsum() + total
                if len(running):
                    total = float(running.iloc[-1])
                yield pd.DataFrame(
                    {
                        "user_id": pdf["user_id"],
                        "event_id": pdf["event_id"],
                        "running_value": running.round(2),
                    }
                )
            self._total.update((total,))

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotal(),
        outputStructType="user_id bigint, event_id bigint, running_value double",
        outputMode="append",
        timeMode="none",
    )


# ---------------------------------------------------------------------------
# S4 streaming ingest: continuous vector arrival -> frozen-centroid IVF
# assignment -> partitioned append. The production shape for "vector
# upserts keep flowing while the index serves": assignment is a pure
# per-row projection (kmeans_det.assign_cells — no state, no shuffle),
# so it runs unchanged under the micro-batch engine; the sink appends
# into the same partitionBy(centroid_id) layout the batch build wrote,
# and compact_ivf_index handles the small-files debt on a schedule.
# Work per micro-batch ∝ batch size, never corpus size.
# ---------------------------------------------------------------------------
def read_vectors_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    phys = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    return (
        spark.readStream.schema(phys)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )


def assign_vectors_stream(vectors: DataFrame, cents: list) -> DataFrame:
    """Streaming IVF assignment against FROZEN centroids (the same
    literal-matrix expression as the batch path — stateless, so the
    micro-batch engine needs no watermark or state store)."""
    from cloudvectordb_spark.operators.kmeans_det import assign_cells

    return assign_cells(vectors, cents)


def run_vector_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint_path: str,
    lease: int | None = None,
) -> None:
    """End-to-end continuous index ingestion: stream vectors, assign,
    append partitioned-by-cell parquet with a checkpoint (restart-safe:
    committed micro-batches never reprocess)."""
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        index_centroids,
    )

    cents = index_centroids(spark, ensure_ivf_index(spark, sf_dir))
    assigned = assign_vectors_stream(read_vectors_stream(spark, sf_dir), cents)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _check_lease(out_path, lease)
        # shuffle on the key first: an unshuffled partitionBy append
        # writes one file per (task x touched cell) EVERY micro-batch —
        # the small-files debt compounds per trigger; keyed, each batch
        # adds at most one file per touched cell (see write_ivf_index)
        batch_df.repartition("centroid_id").write.mode("append").partitionBy(
            "centroid_id"
        ).parquet(out_path)
        # post-append fence re-check (see _check_lease): surface a
        # zombie's interleaved batch before the checkpoint commits
        _check_lease(out_path, lease, at="post-append")

    q = (
        assigned.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_index_append_stream(
    spark: SparkSession,
    vec_dir: str,
    index_path: str,
    checkpoint_path: str,
    lease: int | None = None,
    max_files_per_trigger: int = 1,
) -> None:
    """Continuous vector arrival into an EXISTING index at any path:
    stream a directory of embedding parquet chunks (the Kafka-topic
    stand-in, one chunk per micro-batch), assign each batch to its
    frozen centroid (stateless literal-matrix projection), shuffle on
    the cell key, append into the index's partitionBy(centroid_id)
    layout. The generalized form of run_vector_ingest (which is pinned
    to the fixture layout); the composed streaming rehearsal
    (tools/streaming_e2e_probe.py) drives this at 1M vectors and pins
    streamed-ingest == batch-assign equality on (vec_id, centroid_id).
    Work per micro-batch ∝ batch size; the fence runs before AND after
    each append (see _check_lease)."""
    from cloudvectordb_spark.operators.kmeans_det import assign_cells
    from cloudvectordb_spark.operators.pipeline import index_centroids

    cents = index_centroids(spark, index_path)
    phys = spark.read.option("recursiveFileLookup", "true").parquet(
        vec_dir
    ).schema
    vectors = (
        spark.readStream.schema(phys)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(vec_dir)
    )
    assigned = assign_cells(vectors, cents)
    out_path = f"{index_path}/vectors"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # fence on the INDEX ROOT, not the vectors dir: the lease's
        # epoch files must not live inside a parquet partition tree
        # (partition discovery rejects foreign subdirs)
        _check_lease(index_path, lease)
        batch_df.repartition("centroid_id").write.mode("append").partitionBy(
            "centroid_id"
        ).parquet(out_path)
        _check_lease(index_path, lease, at="post-append")

    q = (
        assigned.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_residual_code_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint_path: str,
    lease: int | None = None,
) -> None:
    """Continuous residual-IVF-PQ maintenance (round 8, late): stream
    vectors, assign each to its FROZEN IVF cell, residual-encode
    against the FROZEN residual codebooks (normalized vector minus
    normalized cell centroid — operators.pq's 'rpq' space), append
    codes partitioned by cell with a checkpoint. The vector twin of
    run_postings_ingest: both quantizers are trained at bulk-build
    time; per-batch work is assignment + encode over the DELTA only,
    and the streamed shards are row-for-row the codes a full batch
    rebuild would produce (pytest-pinned), so compaction is a pure
    layout concern exactly as for the text shards."""
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        index_centroids,
    )
    from cloudvectordb_spark.operators.pq import (
        ensure_ivfpq_residual_index,
        pq_encode_residual,
    )

    cents = index_centroids(spark, ensure_ivf_index(spark, sf_dir))
    _, books, _ = ensure_ivfpq_residual_index(spark, sf_dir)
    assigned = assign_vectors_stream(read_vectors_stream(spark, sf_dir), cents)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _check_lease(out_path, lease)
        pq_encode_residual(batch_df, books, cents).repartition(
            "centroid_id"
        ).write.mode("append").partitionBy("centroid_id").parquet(out_path)
        _check_lease(out_path, lease, at="post-append")

    q = (
        assigned.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_query_serving(
    spark: SparkSession,
    sf_dir: str,
    queries_path: str,
    out_path: str,
    checkpoint_path: str,
    k: int = 10,
) -> list:
    """Continuous QUERY serving (round 8, continuation): the index side
    of the engine consumed as a stream processor — queries arrive as
    micro-batches (a parquet file stream standing in for the request
    topic), each batch is scored against the STATIC persisted text
    index in one plan (operators.search.serve_query_batch: pushed
    IN-list postings scan for the batch's term union, broadcast query
    table, per-query top-k), and per-query results append under a
    checkpoint — committed request batches never rescore on restart.
    maxFilesPerTrigger=1 keeps one request file per micro-batch, the
    shape a Kafka trigger would give. This is the J7 stream-static join
    topology applied to serving rather than enrichment: the corpus
    artifacts never re-shuffle per batch, only the (small) query side
    moves."""
    from cloudvectordb_spark.operators.search import (
        ensure_text_index,
        serve_query_batch,
    )

    ensure_text_index(spark, sf_dir)  # build once, before the stream
    queries = (
        spark.readStream.schema("query_id int, term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(queries_path)
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        serve_query_batch(spark, sf_dir, batch_df, k).write.mode(
            "append"
        ).parquet(out_path)

    q = (
        queries.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
        # per-micro-batch trigger durations (ms) for the latency probe;
        # callers that ignore the return value are unaffected
        return [
            p["durationMs"]["triggerExecution"]
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
    finally:
        q.stop()


def run_vector_query_serving(
    spark: SparkSession,
    sf_dir: str,
    probes_path: str,
    out_path: str,
    checkpoint_path: str,
    nprobe: int = 2,
    k: int = 10,
) -> list:
    """Continuous ANN serving — the vector twin of run_query_serving:
    probe vectors arrive as request files (one per micro-batch), each
    batch is served against the STATIC persisted IVF layout in one
    strict-nprobe plan (pipeline.ivf_batch_search_strict: per-probe
    cell pairs broadcast into the cell-partitioned vectors, grouped
    matmul, per-probe top-k), results append under a checkpoint —
    committed request batches never rescore on restart. The probe rows
    are collected per batch (bounded by the request batch size, the
    same driver-side budget the batch path uses for nearest-cell
    selection); the index side never re-shuffles."""
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        index_centroids,
        ivf_batch_search_strict,
        read_ivf_index,
    )

    path = ensure_ivf_index(spark, sf_dir)  # build once, before the stream
    vectors, _ = read_ivf_index(spark, path)
    cents = index_centroids(spark, path)
    probes = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(probes_path)
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        probe_rows = batch_df.collect()
        if not probe_rows:
            return
        ivf_batch_search_strict(
            spark, vectors, probe_rows, cents, nprobe=nprobe, k=k
        ).write.mode("append").parquet(out_path)

    q = (
        probes.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
        return [
            p["durationMs"]["triggerExecution"]
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
    finally:
        q.stop()


def run_hybrid_serving(
    spark: SparkSession,
    sf_dir: str,
    requests_path: str,
    out_path: str,
    checkpoint_path: str,
    n: int = 60,
    k: int = 10,
) -> list:
    """Continuous HYBRID serving — the third streaming serving job:
    each request carries keyword terms AND a probe-vector reference
    ((query_id int, terms array<string>, probe_vec_id long) parquet,
    one file per micro-batch), and every batch runs the full
    two-retriever RRF pipeline against the static artifacts in one plan
    (operators.search.serve_hybrid_batch: shared postings scan, shared
    BLAS probe batch, per-query fusion). Checkpointed like the text and
    vector twins: committed request batches never rescore."""
    from cloudvectordb_spark.operators.search import (
        ensure_text_index,
        serve_hybrid_batch,
    )

    ensure_text_index(spark, sf_dir)  # build once, before the stream
    requests = (
        spark.readStream.schema(
            "query_id int, terms array<string>, probe_vec_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(requests_path)
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        serve_hybrid_batch(spark, sf_dir, batch_df, n=n, k=k).write.mode(
            "append"
        ).parquet(out_path)

    q = (
        requests.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
        return [
            p["durationMs"]["triggerExecution"]
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
    finally:
        q.stop()


def sliding_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """J2+J4 streaming-native: watermarked SLIDING window aggregate
    (10 min window, 5 min slide — each event lands in two windows).
    Works identically on batch and streaming frames, like tumbling_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )


def read_docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    phys = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(phys)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def delta_postings_stream(docs: DataFrame) -> DataFrame:
    """Per-micro-batch postings build: explode -> (term, doc_id, tf).
    Aggregation is WITHIN a batch only (docs are immutable rows, each
    appears in exactly one micro-batch), so this runs under foreachBatch
    on the batch frame — no unbounded streaming state."""
    from cloudvectordb_spark.functions import text as TX

    return (
        docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def run_postings_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint_path: str,
    lease: int | None = None,
) -> None:
    """Continuous text-index maintenance (round 8): stream documents,
    build each micro-batch's delta postings, append them as shards with
    a checkpoint (restart-safe: committed batches never reprocess).
    The serving view is the tf-addition rollup over shards — the same
    mergeable-postings contract `postings_incremental_merge` and
    `incremental_ingest_e2e` prove against a full rebuild; here the
    micro-batch engine is the delta producer instead of an md5 split.
    At scale this is the Kafka->index maintenance topology: shard
    appends per batch, compaction amortized elsewhere."""
    docs = read_docs_stream(spark, sf_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _check_lease(out_path, lease)
        delta_postings_stream(batch_df).write.mode("append").parquet(out_path)
        # re-check AFTER the append (round-10 ADVICE item 3): a writer
        # that passed the start check then stalled through the write can
        # still interleave this one batch with its replacement — raising
        # here surfaces the violation before the checkpoint commits, so
        # the interleaved batch is flagged instead of silently absorbed
        _check_lease(out_path, lease, at="post-append")

    q = (
        docs.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_cdc_postings_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    tomb_path: str,
    checkpoint_path: str,
    lease: int | None = None,
) -> None:
    """CDC-shaped continuous index maintenance (round 8, delete half):
    every micro-batch appends BOTH its delta-postings shards and its
    delete tombstones (doc ids whose md5 starts '0' — the same
    deterministic rule as the batch delete-lifecycle queries, standing
    in for the stream's delete ops). The serving view is

        rollup(postings shards)  ANTI JOIN  tombstone shards

    — tf-addition stays mergeable, deletes stay a doc-id set, and
    compaction (physically dropping tombstoned rows, proved equivalent
    by index_delete_compaction) can run whenever it is amortized.
    Checkpointed like run_postings_ingest: committed batches never
    reprocess, so a restart appends neither duplicate shards nor
    duplicate tombstones. At scale this is the Kafka CDC topic ->
    index topology with delete markers flowing beside upserts."""
    docs = read_docs_stream(spark, sf_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _check_lease(out_path, lease)
        delta_postings_stream(batch_df).write.mode("append").parquet(out_path)
        (
            batch_df.filter(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
                == "0"
            )
            .select("doc_id")
            .write.mode("append")
            .parquet(tomb_path)
        )
        # post-append fence re-check, same rationale as run_postings_ingest
        _check_lease(out_path, lease, at="post-append")

    q = (
        docs.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _check_lease(root: str, lease: int | None, at: str = "batch-start") -> None:
    """Fencing check at a streaming job's commit points (round-9
    verdict #4): a checkpointed ingester that stalls (GC pause, hung
    executor) while its replacement restarts is the classic zombie
    writer — the checkpoint protects against REPROCESSING, not against
    two live generations appending concurrently. Callers acquire a
    ``versioning.acquire_lease`` epoch on the output root; any commit
    attempted after a NEWER epoch exists raises CommitConflict, so the
    stale generation dies at its next micro-batch instead of silently
    interleaving shards with its successor. The tiered job re-checks at
    its manifest commit too (_commit_shard_manifest), closing the
    check-then-stall window there; the plain-append jobs have no
    transactional commit point, so for them the fence runs BOTH before
    and after each micro-batch's append (``at='post-append'``, round-10
    ADVICE item 3) — a zombie that stalls through its own write is
    surfaced before the checkpoint commits, so an interleaved batch is
    flagged (the raise names the root so the orphaned shards can be
    GC'd) rather than silently absorbed. Appends needing
    exactly-one-writer guarantees with no window at all should go
    through the manifest or versioned writers. lease=None keeps the
    single-writer fast path (no fence, no epoch files)."""
    if lease is None:
        return
    from cloudvectordb_spark.versioning import CommitConflict, _max_epoch

    newest = _max_epoch(root)
    if newest > lease:
        detail = (
            f"; this batch's freshly appended shards under {root} belong "
            "to the stale generation and may interleave — GC or "
            "re-compact before trusting the rollup"
            if at == "post-append"
            else ""
        )
        raise CommitConflict(
            f"streaming writer epoch {lease} fenced by newer epoch "
            f"{newest} at {at} — a replacement ingester owns this "
            f"output root{detail}"
        )


def _read_shard_manifest(root: str) -> dict:
    """{"live": [shard dirs serving now], "consumed": [shard dirs ever
    folded into a tier]} — the consumed LEDGER is what makes a
    replacement ingester with a fresh checkpoint idempotent: a replayed
    micro-batch recreates its content-keyed L0 shard dir, sees the key
    in live ∪ consumed, and skips, instead of re-adding postings a tier
    already holds (the double-count the composed 1M streaming rehearsal
    caught — takeover had only ever been manifest-asserted, never
    serving-equality-checked). The ledger grows one entry per
    micro-batch; at scale, prune entries older than the source's
    retention horizon (a replay can only recreate shards the source can
    still produce). Old list-format manifests read as all-live."""
    import json
    import os

    p = os.path.join(root, "manifest.json")
    if not os.path.exists(p):
        return {"live": [], "consumed": []}
    with open(p) as f:
        m = json.load(f)
    if isinstance(m, list):
        return {"live": m, "consumed": []}
    return m


def _commit_shard_manifest(
    root: str, shards: dict, lease: int | None = None
) -> None:
    """Atomic manifest replace (tmp + os.rename): the manifest IS the
    commit point — a compaction that dies before this rename leaves the
    old manifest (and the still-live L0 shards) serving; one that dies
    after it leaves only garbage dirs for the GC pass. Readers never
    see a half-compacted state.

    The fence re-checks HERE, not only at batch start: a writer that
    passes the batch-start check and then stalls (GC pause) while its
    replacement takes over must still lose at the actual commit."""
    import json
    import os
    import uuid

    _check_lease(root, lease)
    tmp = os.path.join(root, f".manifest.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(shards, f)
    os.rename(tmp, os.path.join(root, "manifest.json"))


def run_tiered_postings_ingest(
    spark: SparkSession,
    docs_dir: str,
    out_root: str,
    checkpoint_path: str,
    tier_width: int = 4,
    lease: int | None = None,
) -> None:
    """LSM-tiered continuous text-index maintenance (round 8, late):
    like run_postings_ingest, each micro-batch appends a level-0
    delta-postings shard — but when ``tier_width`` L0 shards are live,
    they are folded into ONE level-1 tier shard
    (``compact_postings_shards``: cost ∝ Σ|shard|, the BASE postings
    are never read — the into-base merge measured slower than a rebuild
    at 10M docs, BASELINE.md). A JSON manifest names the live shards;
    compaction commits by atomically replacing the manifest, then
    physically deletes the consumed L0 dirs (pure GC — a crash between
    commit and GC leaves unreferenced dirs, never a wrong view).

    The serving view (``tiered_serving_postings``) is the same
    tf-addition rollup over the manifest's shards whatever the tier
    layout, so tiering changes WHEN merge work happens, never WHAT a
    query sees — pytest-pinned against the batch-built index.

    Tiering CASCADES: when any level n accumulates ``tier_width``
    shards they fold into one level-(n+1) shard, so merge work stays
    geometrically amortized exactly like an LSM tree — each posting row
    is rewritten O(log_width(batches)) times total, and no single merge
    ever exceeds width × (largest shard at that level).

    ``docs_dir`` is a directory of parquet doc files streamed with
    maxFilesPerTrigger=1 (one file per micro-batch), the local stand-in
    for a Kafka doc topic. Checkpointed: committed batches never
    reprocess. Idempotency is CONTENT-KEYED, not batch-id-keyed: each
    L0 shard is named by the md5 of its micro-batch's source file
    names, and the manifest keeps a ``consumed`` ledger of every shard
    a tier has folded — so even a REPLACEMENT ingester with a fresh
    checkpoint (whose batch ids restart at 0) replays to a no-op
    instead of re-adding postings its predecessor's tiers already hold.
    The composed rehearsal (tools/streaming_e2e_probe.py) pins takeover
    serving == a batch rebuild at 1M docs."""
    import hashlib
    import os
    import re
    import shutil
    import uuid

    from cloudvectordb_spark.operators.ingest import (
        compact_postings_shards,
    )

    os.makedirs(out_root, exist_ok=True)
    phys = spark.read.option("recursiveFileLookup", "true").parquet(
        docs_dir
    ).schema
    docs = (
        spark.readStream.schema(phys)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _check_lease(out_root, lease)
        # content-stable shard identity: the sorted source file names
        # (one distinct per file read — cost ∝ the batch we fully read
        # anyway, the file-source analogue of Kafka offset ranges)
        srcs = sorted(
            r.f
            for r in batch_df.select(
                F.input_file_name().alias("f")
            ).distinct().collect()
        )
        key = hashlib.md5("\n".join(srcs).encode()).hexdigest()[:16]
        shard_dir = os.path.join(out_root, "L0", f"shard-{key}")
        manifest = _read_shard_manifest(out_root)
        if shard_dir in manifest["live"] or shard_dir in manifest["consumed"]:
            return  # replay of an already-ingested batch: no-op
        delta_postings_stream(batch_df).write.mode("overwrite").parquet(
            shard_dir
        )
        manifest["live"] = manifest["live"] + [shard_dir]
        _commit_shard_manifest(out_root, manifest, lease)

        def level_of(p: str) -> int:
            return int(
                re.search(r"L(\d+)$", os.path.dirname(p)).group(1)
            )

        # Cascade: fold any full level into the next one, lowest level
        # first, until no level holds tier_width shards.
        while True:
            by_level: dict[int, list[str]] = {}
            for s in manifest["live"]:
                by_level.setdefault(level_of(s), []).append(s)
            full = [
                lv for lv in sorted(by_level)
                if len(by_level[lv]) >= tier_width
            ]
            if not full:
                break
            lv = full[0]
            consumed = by_level[lv]
            tier_dir = os.path.join(
                out_root, f"L{lv + 1}", f"tier-{uuid.uuid4().hex[:12]}"
            )
            compact_postings_shards(
                [spark.read.parquet(p) for p in consumed]
            ).write.mode("overwrite").parquet(tier_dir)
            manifest = {
                "live": [s for s in manifest["live"] if s not in consumed]
                + [tier_dir],
                # only L0 shards can ever be recreated by a replay, so
                # only they need the ledger; tiers are generation-local
                "consumed": manifest["consumed"]
                + [s for s in consumed if level_of(s) == 0],
            }
            _commit_shard_manifest(out_root, manifest, lease)  # commit point
            for p in consumed:  # GC after commit — dying here is safe
                shutil.rmtree(p, ignore_errors=True)

    q = (
        docs.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def tiered_serving_postings(spark: SparkSession, out_root: str) -> DataFrame:
    """The logically-current postings under the tier manifest: union
    the live shards (whatever their level), tf-addition rollup."""
    shards = _read_shard_manifest(out_root)["live"]
    frames = [spark.read.parquet(p) for p in shards]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.groupBy("term", "doc_id").agg(
        F.sum("tf").cast("bigint").alias("tf")
    )


def cdc_serving_postings(
    spark: SparkSession, out_path: str, tomb_path: str
) -> DataFrame:
    """The logically-current postings under the CDC shards: tf-addition
    rollup anti-joined with the tombstone set."""
    rolled = (
        spark.read.parquet(out_path)
        .groupBy("term", "doc_id")
        .agg(F.sum("tf").cast("bigint").alias("tf"))
    )
    tomb = spark.read.parquet(tomb_path).distinct()
    return rolled.join(tomb, "doc_id", "left_anti")
