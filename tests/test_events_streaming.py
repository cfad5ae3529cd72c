"""Streaming-native J-group jobs: the same query shapes must produce
the batch answer when driven through the micro-batch engine."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.streaming.jobs import (
    dedup_within_watermark,
    read_events_stream,
    run_to_memory,
    sessionize,
    tumbling_counts,
)


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    got = run_to_memory(tumbling_counts(stream), "t_tumbling", mode="complete")
    batch = tumbling_counts(load(spark, sf_dir, "events"))
    g = {(r.ws, r.event_type): (r.n, r.sum_value) for r in got.collect()}
    b = {(r.ws, r.event_type): (r.n, r.sum_value) for r in batch.collect()}
    assert g == b and len(g) > 0
    # …and against the ORACLE-REGISTERED batch query (events_tumbling_hour),
    # so the micro-batch engine is held to the same values DuckDB checks
    from cloudvectordb_spark.operators.events import events_tumbling_hour

    reg = {
        (r.ws, r.event_type): (r.n, r.sum_value)
        for r in events_tumbling_hour(spark, sf_dir).collect()
    }
    assert g == reg


def test_streaming_sessionize_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = run_to_memory(sessionize(stream), "t_sessions", mode="complete")
    batch = sessionize(load(spark, sf_dir, "events"))
    g = {(r.user_id, r.session_start): (r.n_events, r.sum_value) for r in got.collect()}
    b = {(r.user_id, r.session_start): (r.n_events, r.sum_value) for r in batch.collect()}
    assert g == b and len(g) > 0


def test_streaming_dedup_within_watermark(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = run_to_memory(
        dedup_within_watermark(stream), "t_dedup", mode="append"
    )
    n_batch = load(spark, sf_dir, "events").dropDuplicates(["event_id"]).count()
    assert got.count() == n_batch
    # value-level, not count-only: exactly one surviving row per
    # event_id, the id set equals the batch id set, and the registered
    # oracle-backed query (events_dedup_ids) agrees on both totals
    from cloudvectordb_spark.operators.events import events_dedup_ids

    got_ids = [r.event_id for r in got.select("event_id").collect()]
    assert len(got_ids) == len(set(got_ids))
    batch_ids = {
        r.event_id
        for r in load(spark, sf_dir, "events").select("event_id").distinct().collect()
    }
    assert set(got_ids) == batch_ids
    reg = events_dedup_ids(spark, sf_dir).collect()[0]
    assert reg.n_unique == len(got_ids)


def test_streaming_stateful_running_totals_matches_batch(spark, sf_dir):
    """J6: applyInPandasWithState stream == grouped-map batch twin."""
    from cloudvectordb_spark.operators.udfs import user_running_total_grouped_map
    from cloudvectordb_spark.streaming.jobs import running_user_totals_stream

    stream = read_events_stream(spark, sf_dir).filter(F.col("user_id") < 10)
    got = run_to_memory(running_user_totals_stream(stream), "t_stateful", mode="append")
    batch = user_running_total_grouped_map(spark, sf_dir)
    g = {(r.user_id, r.event_id): r.running_value for r in got.collect()}
    b = {(r.user_id, r.event_id): r.running_value for r in batch.collect()}
    assert len(g) > 0 and g == b


def test_streaming_parquet_sink_checkpoint_no_duplicates(spark, sf_dir, tmp_path):
    """foreachBatch parquet sink: bounded run lands every row exactly
    once; a RESTART from the same checkpoint must be a no-op (no new
    rows, no duplicates) because all source offsets are committed."""
    from cloudvectordb_spark.streaming.jobs import run_to_parquet_sink

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_dir).filter(F.col("user_id") < 20)
    run_to_parquet_sink(stream, out, ckpt)
    first = spark.read.parquet(out).drop("_batch_id")
    n_expected = load(spark, sf_dir, "events").filter(F.col("user_id") < 20).count()
    assert first.count() == n_expected
    assert first.select("event_id").distinct().count() == n_expected

    # restart with the same checkpoint: nothing to reprocess
    stream2 = read_events_stream(spark, sf_dir).filter(F.col("user_id") < 20)
    run_to_parquet_sink(stream2, out, ckpt)
    again = spark.read.parquet(out).drop("_batch_id")
    assert again.count() == n_expected, "restart duplicated rows"


def test_streaming_sliding_inline_window_matches_batch(spark, sf_dir):
    """J2 streaming-native: 10-min/5-min sliding windows through the
    micro-batch engine equal the batch shape (inline window expr; the
    jobs.sliding_counts twin is asserted separately below)."""
    from pyspark.sql import functions as F2

    def sliding(df):
        return (
            df.groupBy(F2.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
            .agg(F2.count("*").alias("n"))
            .select(F2.col("w.start").alias("ws"), "event_type", "n")
        )

    got = run_to_memory(sliding(read_events_stream(spark, sf_dir)), "t_sliding", "complete")
    batch = sliding(load(spark, sf_dir, "events"))
    g = {(r.ws, r.event_type): r.n for r in got.collect()}
    b = {(r.ws, r.event_type): r.n for r in batch.collect()}
    assert g == b and len(g) > 0


def test_streaming_multi_microbatch_incremental_state(spark, sf_dir, tmp_path):
    """Split events into 8 files and rate-limit to 2 files per trigger:
    the windowed aggregate must accumulate across ~4 micro-batches and
    still equal the batch answer — true incremental-state verification
    (a single-file source collapses to one batch and proves little)."""
    from pyspark.sql import functions as F2

    src = str(tmp_path / "events_split")
    ev = load(spark, sf_dir, "events")
    ev.repartition(8).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    agg = (
        stream.groupBy(F2.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F2.count("*").alias("n"), F2.round(F2.sum("value"), 2).alias("s"))
        .select(F2.col("w.start").alias("ws"), "event_type", "n", "s")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_microbatches")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 3, f"expected multiple micro-batches, got {n_batches}"

    got = {
        (r.ws, r.event_type): (r.n, r.s)
        for r in spark.sql("SELECT * FROM t_microbatches").collect()
    }
    batch = (
        ev.groupBy(F2.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F2.count("*").alias("n"), F2.round(F2.sum("value"), 2).alias("s"))
        .select(F2.col("w.start").alias("ws"), "event_type", "n", "s")
    )
    b = {(r.ws, r.event_type): (r.n, r.s) for r in batch.collect()}
    assert got == b and len(got) > 0


def test_streaming_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join (watermarked both sides) == batch twin."""
    from cloudvectordb_spark.streaming.jobs import interval_join_purchase_clicks

    stream = read_events_stream(spark, sf_dir)
    got = run_to_memory(
        interval_join_purchase_clicks(stream), "t_interval_join", mode="append"
    )
    batch = interval_join_purchase_clicks(load(spark, sf_dir, "events"))
    g = {(r.purchase_id, r.click_id) for r in got.collect()}
    b = {(r.purchase_id, r.click_id) for r in batch.collect()}
    # append-mode emission is watermark-gated: every emitted pair must be
    # correct, and the bounded replay must surface the full batch answer
    assert len(b) > 0 and g == b


def test_hll_rollup_union_accuracy(spark, sf_dir):
    """Unioned daily sketches estimate total distinct users within 5%."""
    from cloudvectordb_spark.operators.events import hll_daily_rollup_union

    row = hll_daily_rollup_union(spark, sf_dir).collect()[0]
    exact = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert row["n_days"] >= 1
    assert row["exact_union_users"] == exact
    assert row["est_within_5pct"]  # 5% envelope now part of the query output


def test_tws_running_totals_match_batch(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 stateful API) must equal the
    oracle-checked batch window running total. The operator's Python
    worker deserializes its state-server messages with google.protobuf —
    a hard runtime dependency of the classic-mode API, not of this repo's
    code. The container ships no protobuf runtime anywhere (verified by a
    filesystem sweep: only typeshed stubs and pyspark's generated _pb2
    wrappers, which themselves import google.protobuf), there is no
    network, and installs are prohibited — so the skip is environment-
    forced, not a coverage choice. Where protobuf IS importable this test
    runs in full; the applyInPandasWithState twin above covers J6
    unconditionally in every environment."""
    pytest.importorskip("google.protobuf")
    from cloudvectordb_spark.operators.udfs import user_running_total_grouped_map
    from cloudvectordb_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory,
        running_user_totals_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, sf_dir)
        got = run_to_memory(
            running_user_totals_tws(stream), "t_tws", mode="append"
        )
        g = {(r.user_id, r.event_id): r.running_value for r in got.collect()}
        b = {
            (r.user_id, r.event_id): r.running_value
            for r in user_running_total_grouped_map(spark, sf_dir).collect()
        }
        assert len(g) == len(b) > 0
        assert all(abs(g[k] - b[k]) < 1e-6 for k in b)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_vector_ingest_matches_batch_assignment(spark, sf_dir, tmp_path):
    """S4 streaming ingest: vectors streamed through the frozen-centroid
    assignment must land in EXACTLY the cells the batch build chose, in
    a partitioned layout the probe path can prune."""
    import glob

    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        read_ivf_index,
    )
    from cloudvectordb_spark.streaming.jobs import run_vector_ingest

    out = str(tmp_path / "stream_ivf")
    ckpt = str(tmp_path / "ckpt")
    run_vector_ingest(spark, sf_dir, out, ckpt)

    streamed = spark.read.parquet(out)
    vectors, _ = read_ivf_index(spark, ensure_ivf_index(spark, sf_dir))
    s = {r.vec_id: r.centroid_id for r in streamed.select("vec_id", "centroid_id").collect()}
    b = {r.vec_id: r.centroid_id for r in vectors.select("vec_id", "centroid_id").collect()}
    assert len(s) > 0 and s == b
    # layout is genuinely partitioned by cell
    assert glob.glob(out + "/centroid_id=*"), "expected hive-partitioned cells"


def test_streaming_vector_ingest_restart_no_duplicates(spark, sf_dir, tmp_path):
    """Exactly-once: re-running the ingest with the SAME checkpoint must
    reprocess nothing — committed micro-batch offsets make the restart a
    no-op instead of doubling the layout."""
    from cloudvectordb_spark.streaming.jobs import run_vector_ingest

    out = str(tmp_path / "stream_ivf")
    ckpt = str(tmp_path / "ckpt")
    run_vector_ingest(spark, sf_dir, out, ckpt)
    n1 = spark.read.parquet(out).count()
    run_vector_ingest(spark, sf_dir, out, ckpt)  # restart, same checkpoint
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0, "restart with committed offsets must not duplicate"


def test_streaming_sliding_matches_batch(spark, sf_dir):
    """J2 under the micro-batch engine: the sliding aggregate must equal
    the batch twin window-for-window."""
    from cloudvectordb_spark.streaming.jobs import sliding_counts

    stream = read_events_stream(spark, sf_dir)
    got = run_to_memory(sliding_counts(stream), "t_sliding", mode="complete")
    batch = sliding_counts(load(spark, sf_dir, "events"))
    g = {(r.ws, r.event_type): (r.n, r.sum_value) for r in got.collect()}
    b = {(r.ws, r.event_type): (r.n, r.sum_value) for r in batch.collect()}
    assert g == b and len(g) > 0


def test_streaming_postings_ingest_equals_batch_index(spark, sf_dir, tmp_path):
    """Round-8 continuous text-index maintenance: delta-postings shards
    appended per micro-batch, rolled up by tf-addition, must equal the
    batch-built postings artifact row-for-row (the same mergeable-
    postings contract incremental_ingest_e2e proves for the md5 split,
    here produced by the micro-batch engine with a checkpoint)."""
    from pyspark.sql import functions as F

    from cloudvectordb_spark.operators.search import text_index_frames
    from cloudvectordb_spark.streaming.jobs import run_postings_ingest

    out = str(tmp_path / "stream_postings")
    ckpt = str(tmp_path / "ckpt_postings")
    run_postings_ingest(spark, sf_dir, out, ckpt)

    rolled = (
        spark.read.parquet(out)
        .groupBy("term", "doc_id")
        .agg(F.sum("tf").cast("bigint").alias("tf"))
    )
    batch_postings = text_index_frames(spark, sf_dir)[0].select(
        "term", "doc_id", F.col("tf").cast("bigint").alias("tf")
    )
    assert rolled.exceptAll(batch_postings).count() == 0
    assert batch_postings.exceptAll(rolled).count() == 0
    assert rolled.count() > 0

    # restart with the same checkpoint: committed offsets, no reprocess
    n1 = spark.read.parquet(out).count()
    run_postings_ingest(spark, sf_dir, out, ckpt)
    assert spark.read.parquet(out).count() == n1


def test_tiered_postings_ingest_equals_batch_and_compacts(
    spark, sf_dir, tmp_path
):
    """LSM tiering under the micro-batch engine: 9 one-file batches at
    tier_width=2 must (a) serve postings identical to the batch-built
    index, (b) cascade — no level holds tier_width shards at rest and
    at least one level-2+ tier exists (folds of folds fired, consumed
    dirs GC'd), and (c) reprocess nothing on a checkpointed restart
    (manifest byte-identical)."""
    import os
    import re

    from pyspark.sql import functions as F

    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.search import text_index_frames
    from cloudvectordb_spark.streaming.jobs import (
        _read_shard_manifest,
        run_tiered_postings_ingest,
        tiered_serving_postings,
    )

    docs = load(spark, sf_dir, "documents")
    docs_dir = str(tmp_path / "doc_chunks")
    for i in range(9):
        (
            docs.filter(F.col("doc_id") % 9 == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{docs_dir}/chunk{i}")
        )
    out_root = str(tmp_path / "tiered_postings")
    ckpt = str(tmp_path / "ckpt_tiered")
    run_tiered_postings_ingest(
        spark, docs_dir, out_root, ckpt, tier_width=2
    )

    serving = tiered_serving_postings(spark, out_root)
    batch_postings = text_index_frames(spark, sf_dir)[0].select(
        "term", "doc_id", F.col("tf").cast("bigint").alias("tf")
    )
    assert serving.exceptAll(batch_postings).count() == 0
    assert batch_postings.exceptAll(serving).count() == 0
    assert serving.count() > 0

    manifest = _read_shard_manifest(out_root)
    by_level = {}
    for s in manifest["live"]:
        lv = int(re.search(r"L(\d+)$", os.path.dirname(s)).group(1))
        by_level.setdefault(lv, []).append(s)
    assert all(len(v) < 2 for v in by_level.values())  # nothing full
    assert max(by_level) >= 2  # folds of folds actually cascaded
    for s in manifest["live"]:  # every live shard exists; consumed GC'd
        assert os.path.exists(s)
    # the consumed ledger names every folded L0 shard, none still live
    assert manifest["consumed"]
    assert not set(manifest["consumed"]) & set(manifest["live"])
    l0_on_disk = (
        os.listdir(os.path.join(out_root, "L0"))
        if os.path.isdir(os.path.join(out_root, "L0"))
        else []
    )
    assert len(l0_on_disk) == len(by_level.get(0, []))

    run_tiered_postings_ingest(
        spark, docs_dir, out_root, ckpt, tier_width=2
    )
    assert _read_shard_manifest(out_root) == manifest


def test_streaming_residual_code_ingest_equals_batch_index(
    spark, sf_dir, tmp_path
):
    """The streamed residual-code shards must be row-for-row the codes
    the batch bulk build produces (same frozen centroids + codebooks),
    and a checkpointed restart appends nothing."""
    from cloudvectordb_spark.operators.pq import (
        ensure_ivfpq_residual_index,
    )
    from cloudvectordb_spark.streaming.jobs import run_residual_code_ingest

    out = str(tmp_path / "stream_rcodes")
    ckpt = str(tmp_path / "ckpt_rcodes")
    run_residual_code_ingest(spark, sf_dir, out, ckpt)

    streamed = {
        (r.vec_id, tuple(r.code), r.centroid_id)
        for r in spark.read.parquet(out).collect()
    }
    batch_codes, _, _ = ensure_ivfpq_residual_index(spark, sf_dir)
    batch = {
        (r.vec_id, tuple(r.code), r.centroid_id)
        for r in batch_codes.collect()
    }
    assert streamed == batch and len(streamed) > 0

    run_residual_code_ingest(spark, sf_dir, out, ckpt)
    assert spark.read.parquet(out).count() == len(streamed)


def test_streaming_query_serving_matches_batch_and_checkpoints(
    spark, sf_dir, tmp_path
):
    """Queries streamed as two request files must each be served
    against the static index with results bit-identical to the batch
    path (bm25_scores_batch + batch_topk_per_query on the same query
    table), and a checkpointed restart rescores nothing."""
    from cloudvectordb_spark.operators.search import (
        batch_topk_per_query,
        bm25_scores_batch,
    )
    from cloudvectordb_spark.streaming.jobs import run_query_serving

    qdir = str(tmp_path / "queries")
    out = str(tmp_path / "served")
    ckpt = str(tmp_path / "ckpt_serving")

    batch_a = ((0, ("data", "query")), (1, ("merge", "stream")))
    batch_b = ((2, ("vector", "scan")), (3, ("join", "sort", "hash")))
    for batch in (batch_a, batch_b):
        (
            spark.createDataFrame(
                [(qid, t) for qid, ts in batch for t in ts],
                schema="query_id int, term string",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(qdir)
        )

    run_query_serving(spark, sf_dir, qdir, out, ckpt, k=10)

    served = {
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in batch_topk_per_query(
            bm25_scores_batch(spark, sf_dir, batch_a + batch_b), 10
        ).collect()
    }
    assert served == expected and len(served) > 0
    assert {q for q, *_ in served} == {0, 1, 2, 3}

    run_query_serving(spark, sf_dir, qdir, out, ckpt, k=10)
    assert spark.read.parquet(out).count() == len(served)


def test_streaming_vector_serving_matches_batch_and_checkpoints(
    spark, sf_dir, tmp_path
):
    """Probe vectors streamed as two request files must be served
    against the static IVF index with results bit-identical to the
    batch strict-nprobe path on the same probe set, and a checkpointed
    restart rescores nothing."""
    from pyspark.sql import functions as F

    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        index_centroids,
        ivf_batch_search_strict,
        read_ivf_index,
    )
    from cloudvectordb_spark.streaming.jobs import run_vector_query_serving

    pdir = str(tmp_path / "probes")
    out = str(tmp_path / "ann_served")
    ckpt = str(tmp_path / "ckpt_ann_serving")

    emb = load(spark, sf_dir, "embeddings")
    all_probes = (
        emb.filter(F.col("vec_id") < 6).select("vec_id", "embedding")
    )
    for lo, hi in ((0, 3), (3, 6)):
        (
            all_probes.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(pdir)
        )

    run_vector_query_serving(spark, sf_dir, pdir, out, ckpt)

    served = {
        (r.probe_id, r.neighbor_id, r.score, r.rank)
        for r in spark.read.parquet(out).collect()
    }
    path = ensure_ivf_index(spark, sf_dir)
    vectors, _ = read_ivf_index(spark, path)
    cents = index_centroids(spark, path)
    expected = {
        (r.probe_id, r.neighbor_id, r.score, r.rank)
        for r in ivf_batch_search_strict(
            spark, vectors, all_probes.collect(), cents, nprobe=2, k=10
        ).collect()
    }
    assert served == expected and len(served) > 0
    assert {p for p, *_ in served} == {0, 1, 2, 3, 4, 5}

    run_vector_query_serving(spark, sf_dir, pdir, out, ckpt)
    assert spark.read.parquet(out).count() == len(served)


def test_streaming_hybrid_serving_matches_registered_batch(
    spark, sf_dir, tmp_path
):
    """Hybrid requests streamed as two files must reproduce (a) the
    registered hybrid_rrf_batch output for the batch it encodes
    (terms = _BATCH_QUERIES, probe_vec_id = query_id) and (b) nothing
    extra; restart rescores nothing."""
    from cloudvectordb_spark.operators.search import (
        _BATCH_QUERIES,
        hybrid_rrf_batch,
    )
    from cloudvectordb_spark.streaming.jobs import run_hybrid_serving

    rdir = str(tmp_path / "hybrid_requests")
    out = str(tmp_path / "hybrid_served")
    ckpt = str(tmp_path / "ckpt_hybrid")

    rows = [
        (qid, list(terms), qid) for qid, terms in _BATCH_QUERIES
    ]
    for half in (rows[:2], rows[2:]):
        (
            spark.createDataFrame(
                half,
                schema="query_id int, terms array<string>, probe_vec_id long",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(rdir)
        )

    run_hybrid_serving(spark, sf_dir, rdir, out, ckpt)

    served = {
        (r.query_id, r.doc_id, r.rrf_score, r.rank)
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        (r.query_id, r.doc_id, r.rrf_score, r.rank)
        for r in hybrid_rrf_batch(spark, sf_dir).collect()
    }
    assert served == expected and len(served) > 0

    run_hybrid_serving(spark, sf_dir, rdir, out, ckpt)
    assert spark.read.parquet(out).count() == len(served)


def test_zombie_streaming_ingester_fenced_by_lease(spark, sf_dir, tmp_path):
    """Round-9 verdict #4: the checkpoint protects against reprocessing,
    not against two live writer generations. A stalled gen-1 tiered
    ingester whose replacement has acquired a newer lease must have its
    LATE commit rejected (CommitConflict at the micro-batch commit
    point) and must leave the manifest exactly as gen-2 left it."""
    import pyspark.errors

    import pytest as _pytest
    from pyspark.sql import functions as F

    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.streaming.jobs import (
        _read_shard_manifest,
        run_tiered_postings_ingest,
    )
    from cloudvectordb_spark.versioning import acquire_lease

    docs = load(spark, sf_dir, "documents")
    docs_dir = str(tmp_path / "doc_chunks")
    for i in range(3):
        (
            docs.filter(F.col("doc_id") % 4 == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{docs_dir}/chunk{i}")
        )
    out_root = str(tmp_path / "tiered")
    ckpt1 = str(tmp_path / "ckpt_gen1")

    # generation 1 ingests the first three chunks and stalls (returns)
    lease1 = acquire_lease(out_root, owner="ingest-gen1")
    run_tiered_postings_ingest(
        spark, docs_dir, out_root, ckpt1, tier_width=2, lease=lease1
    )
    assert _read_shard_manifest(out_root)["live"]

    # the replacement generation takes over the SAME output root (its
    # own checkpoint — a fresh deploy), catching up on all chunks
    lease2 = acquire_lease(out_root, owner="ingest-gen2")
    ckpt2 = str(tmp_path / "ckpt_gen2")
    run_tiered_postings_ingest(
        spark, docs_dir, out_root, ckpt2, tier_width=2, lease=lease2
    )
    manifest_after_gen2 = _read_shard_manifest(out_root)

    # gen-1 wakes up: a new chunk arrives and its checkpoint says
    # "unprocessed" — without the fence it would append shards gen-2
    # never accounted for; with it, the late commit dies loudly
    (
        docs.filter(F.col("doc_id") % 4 == 3)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{docs_dir}/chunk3")
    )
    with _pytest.raises(pyspark.errors.exceptions.base.PySparkException) as exc:
        run_tiered_postings_ingest(
            spark, docs_dir, out_root, ckpt1, tier_width=2, lease=lease1
        )
    assert "fenced by newer epoch" in str(exc.value)
    assert _read_shard_manifest(out_root) == manifest_after_gen2

    # gen-2 itself is NOT fenced: it processes the new chunk fine
    run_tiered_postings_ingest(
        spark, docs_dir, out_root, ckpt2, tier_width=2, lease=lease2
    )
    assert len(_read_shard_manifest(out_root)["live"]) >= 1

    # the takeover must be IDEMPOTENT, not just fenced: gen-2's fresh
    # checkpoint replayed chunks gen-1's tiers had already consumed
    # (batch ids restarted at 0), and the content-keyed shards +
    # consumed ledger must make those replays no-ops — serving equals
    # the batch-built postings over the whole corpus, no double counts
    from cloudvectordb_spark.operators.search import text_index_frames
    from cloudvectordb_spark.streaming.jobs import tiered_serving_postings

    serving = tiered_serving_postings(spark, out_root)
    batch_postings = text_index_frames(spark, sf_dir)[0].select(
        "term", "doc_id", F.col("tf").cast("bigint").alias("tf")
    )
    assert serving.exceptAll(batch_postings).count() == 0
    assert batch_postings.exceptAll(serving).count() == 0
