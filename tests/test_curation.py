"""Invariant tests for the corpus-curation operators (operators/curation.py
and the maxsim retrieval in operators/vector_ops.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.operators.curation import (
    benchmark_contamination,
    corpus_split_counts,
    doc_repetition_scores,
    token_budget_mixture,
    _TOKEN_BUDGET,
)
from cloudvectordb_spark.operators.vector_ops import maxsim_late_interaction


def test_split_partitions_whole_corpus(spark, sf_dir):
    out = {r["split"]: r for r in corpus_split_counts(spark, sf_dir).collect()}
    n_total = load(spark, sf_dir, "documents").count()
    assert set(out) == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in out.values()) == n_total
    # 12/16 hex buckets -> train should dominate
    assert out["train"]["n_docs"] > out["val"]["n_docs"]
    assert out["train"]["n_docs"] > out["test"]["n_docs"]


def test_split_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, corpus_split_counts(spark, sf_dir).collect()))
    b = sorted(map(tuple, corpus_split_counts(spark, sf_dir).collect()))
    assert a == b


def test_repetition_fractions_bounded(spark, sf_dir):
    rows = doc_repetition_scores(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_bigram_frac"] <= 1.0
        # a doc has >= 1 token, so the top unigram holds (0, 1] of the mass
        assert 0.0 < r["top_unigram_frac"] <= 1.0


def test_contamination_excludes_eval_docs(spark, sf_dir):
    rows = benchmark_contamination(spark, sf_dir).collect()
    assert rows, "fixture corpus shares trigrams by construction"
    for r in rows:
        assert r["doc_id"] % 97 != 0
        assert r["n_shared_trigrams"] >= 1


def test_token_budget_respected(spark, sf_dir):
    rows = token_budget_mixture(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["tokens_kept"] <= _TOKEN_BUDGET
        assert r["n_docs_kept"] >= 1


def test_maxsim_ranking_shape(spark, sf_dir):
    rows = maxsim_late_interaction(spark, sf_dir).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    sims = [r["maxsim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(r["pdoc"] != 0 for r in rows)  # query doc never retrieves itself
    # maxsim over 10 query chunks of unit-bounded cosines
    assert all(-10.0 <= s <= 10.0 for s in sims)


def test_sequence_packing_offsets_contiguous(spark, sf_dir):
    from cloudvectordb_spark.operators.curation import sequence_packing_offsets

    df = sequence_packing_offsets(spark, sf_dir)
    rows = sorted(df.collect(), key=lambda r: r["doc_id"])
    assert rows[0]["start_offset"] == 0
    for a, b in zip(rows, rows[1:]):
        assert b["start_offset"] == a["start_offset"] + a["ntok"]
        assert a["bin_first"] <= a["bin_last"]
        assert a["spans_boundary"] == (a["bin_first"] != a["bin_last"])
    # The distributed prefix sum must not funnel row data through one
    # task: the only single-partition exchange allowed is the scalar
    # min/max stats aggregate (merges one 2-value row per task), and no
    # window may sort the full input globally (a global window plans as
    # Exchange SinglePartition + Sort over the row data).
    lines = df._jdf.queryExecution().executedPlan().toString().splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            below = "\n".join(lines[i + 1 : i + 4])
            assert "partial_min" in below, f"row-data funnel at plan line {i}"


def test_stratified_sample_hits_target_rates(spark, sf_dir):
    from cloudvectordb_spark.operators.curation import (
        _LANG_THRESH,
        stratified_hash_sample,
    )

    rows = {r["lang"]: r for r in stratified_hash_sample(spark, sf_dir).collect()}
    assert set(rows) == set(_LANG_THRESH)
    for lang, r in rows.items():
        target = int(_LANG_THRESH[lang], 16) / 256.0
        observed = r["n_kept"] / r["n_total"]
        assert abs(observed - target) < 0.2, (lang, observed, target)


def test_split_unigram_kl_nonnegative(spark, sf_dir):
    from cloudvectordb_spark.operators.curation import split_unigram_kl

    rows = split_unigram_kl(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["kl"] >= 0.0
        assert r["train_tokens"] > r["val_tokens"] > 0
