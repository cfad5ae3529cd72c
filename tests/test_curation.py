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
