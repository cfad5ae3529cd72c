"""Round 16 (optimization round 2) pins.

- The eager driver gathers introduced in round 15 are now budget-
  enforced: an oversized input raises instead of silently collecting
  an unbounded frame to the driver (round-15 verdict item 2).
- bm25_batch_pruned_scores dedups repeated terms inside one query's
  term tuple (round-16 ADVICE: restores the pre-round-15 distinct()
  robustness).
- bm25_pruned_merged_bounds tokenizes each corpus shard a constant
  number of times per invocation: the final plan reads the
  localCheckpoint'ed shard frames (ExistingRDD leaves), never a raw
  documents scan.
- with_global_prefix_sums validates its parallel column lists.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bounded_gather_within_budget_returns_all_rows(spark):
    from cloudvectordb_spark.gather import bounded_gather

    df = spark.range(100).select(F.col("id"))
    rows = bounded_gather(df, "test", budget=100)
    assert sorted(r.id for r in rows) == list(range(100))


def test_bounded_gather_over_budget_raises(spark):
    from cloudvectordb_spark.gather import bounded_gather

    df = spark.range(200)
    with pytest.raises(ValueError, match="exceeded its 100-row budget"):
        bounded_gather(df, "test", budget=100)


def test_batch_pruned_entry_guard_raises_on_oversized_batch(spark, sf_dir):
    from cloudvectordb_spark.gather import GATHER_ROW_BUDGET
    from cloudvectordb_spark.operators.search import bm25_batch_pruned_scores

    q = GATHER_ROW_BUDGET // 10 + 1  # q * k > budget
    batch = tuple((i, ("data",)) for i in range(q))
    with pytest.raises(ValueError, match="eager-gather"):
        bm25_batch_pruned_scores(spark, sf_dir, batch, k=10)


def test_batch_pruned_repeated_term_counts_once(spark, sf_dir):
    """A term repeated inside one query's tuple must score like a
    single occurrence (BM25 query-term semantics; the pre-round-15
    distinct()-based shape)."""
    from cloudvectordb_spark.operators.search import (
        batch_topk_per_query,
        bm25_batch_pruned_scores,
    )

    dup = ((0, ("data", "data", "query")),)
    ref = ((0, ("data", "query")),)
    _, scored_dup = bm25_batch_pruned_scores(spark, sf_dir, dup, k=10)
    _, scored_ref = bm25_batch_pruned_scores(spark, sf_dir, ref, k=10)
    got = {
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in batch_topk_per_query(scored_dup, 10).collect()
    }
    want = {
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in batch_topk_per_query(scored_ref, 10).collect()
    }
    assert got == want and len(got) == 10


def test_merged_bounds_final_plan_reads_checkpointed_shards(spark, sf_dir):
    """The round-16 restructure: the WAND kernel's survivor plan must
    consume the localCheckpoint'ed shard tf/dl frames (ExistingRDD),
    never re-derive the corpus tokenize — a raw documents scan in the
    final plan means the shared materialization regressed."""
    from cloudvectordb_spark.operators.search import bm25_pruned_merged_bounds
    from cloudvectordb_spark.plans.lint import formatted_plan

    plan = formatted_plan(bm25_pruned_merged_bounds(spark, sf_dir))
    assert "ExistingRDD" in plan
    assert "documents.parquet" not in plan


def test_split_leakage_audit_final_plan_reads_checkpointed_edges(
    spark, sf_dir
):
    """The shingle-Jaccard edge list is localCheckpoint'ed once and
    shared by connected_components AND the final leak-count join — the
    final plan must not re-derive the inverted-index self-join (its
    signature: an exploded-shingle scan of documents)."""
    from cloudvectordb_spark.operators.dedup import split_leakage_audit
    from cloudvectordb_spark.plans.lint import formatted_plan

    plan = formatted_plan(split_leakage_audit(spark, sf_dir))
    assert "ExistingRDD" in plan
    # ta/tb keep two cheap doc_id-only scans; the shingle explode
    # (posexplode/explode over word_shingles) must be gone.
    assert "array_distinct" not in plan


def test_prefix_sums_length_mismatch_raises(spark):
    from cloudvectordb_spark.ranking import with_global_prefix_sums

    df = spark.range(10).select(
        F.col("id").alias("v"), F.lit(1).alias("w1"), F.lit(2).alias("w2")
    )
    with pytest.raises(ValueError, match="equal lengths"):
        with_global_prefix_sums(df, "v", ["w1", "w2"], ["c1"], ["t1", "t2"])


def test_word_shingles_let_binding_matches_reference(spark):
    """word_shingles let-binds the token array through a one-element
    transform (one split per row instead of one per shingle); the
    values must match the pre-round-16 inline form on every edge case:
    NULL text, empty text, < n tokens, exactly n, and long docs."""
    from cloudvectordb_spark.functions.text import word_shingles

    def reference(col, n=3):
        t = F.split(F.col(col), " ")
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))

    docs = spark.createDataFrame(
        [
            (0, None),
            (1, ""),
            (2, "one"),
            (3, "one two"),
            (4, "one two three"),
            (5, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
        ],
        schema="doc_id int, text string",
    )
    rows = docs.select(
        "doc_id",
        word_shingles("text", 3).alias("new"),
        reference("text", 3).alias("ref"),
        word_shingles("text", 2).alias("new2"),
        reference("text", 2).alias("ref2"),
    ).collect()
    for r in rows:
        assert r.new == r.ref, (r.doc_id, r.new, r.ref)
        assert r.new2 == r.ref2, (r.doc_id, r.new2, r.ref2)
