"""Streaming-native J-group jobs: the same query shapes must produce
the batch answer when driven through the micro-batch engine."""

from __future__ import annotations

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
