"""ANN recall gates on a STRUCTURED corpus (round-8 verdict task 5).

The fixture embeddings are random vectors — there, cluster and sketch
structure provably cannot exist, so tier recall numbers are a floor,
not a regression signal (recall_report measured IVF 0.80 / IVF-PQ 0.67
on them). On the stub-encoded corpus — the encoder the pipeline
actually ships, with real cosine structure — the tiers are expected to
perform, and a future regression in the trainers/searchers shows up as
a recall drop long before an sf0.01 value oracle changes. These gates
pin the per-tier minimums measured on the 20k structured corpus
(headroom below the observed means: IVF/JL observed 1.0, PQ & IVF-PQ
0.867).

Binary sign-bit and matryoshka tiers are REPORTED but not gated here:
the smooth sin-wave stub encoder produces near-identical sign patterns
across neighboring ids (massive hamming ties, tie-broken by vec_id),
a corpus-specific degeneracy documented in BASELINE.md — their gates
live with the random-fixture invariant tests instead.
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def structured_sf(spark) -> str:
    from tools.recall_report import ensure_structured_corpus

    n = 20_000
    root = os.path.join("/tmp", "cloudvectordb_structured", str(n))
    return ensure_structured_corpus(spark, n, root)


def _topk_sets(df, k=10):
    got: dict = {}
    for r in df.collect():
        if getattr(r, "rank", 1) <= k:
            got.setdefault(r.probe_id, set()).add(r.neighbor_id)
    return got


def _mean_recall(spark, structured_sf, fn) -> float:
    from cloudvectordb_spark.operators.vector_ops import knn_exact_cosine

    exact = _topk_sets(knn_exact_cosine(spark, structured_sf))
    got = _topk_sets(fn(spark, structured_sf))
    # tiers score different probe windows (e.g. exact scores vec_id < 5,
    # IVF < 3): recall is defined over the shared probes, as in
    # tools/recall_report.py
    shared = [p for p in exact if p in got]
    assert shared, "no shared probes scored"
    per = [len(exact[p] & got[p]) / len(exact[p]) for p in shared]
    return sum(per) / len(per)


def test_ivf_recall_gate_structured(spark, structured_sf):
    from cloudvectordb_spark.operators.pipeline import ivf_topk_search

    assert _mean_recall(spark, structured_sf, ivf_topk_search) >= 0.95


def test_pq_recall_gate_structured(spark, structured_sf):
    from cloudvectordb_spark.operators.pq import pq_topk_search

    assert _mean_recall(spark, structured_sf, pq_topk_search) >= 0.80


def test_ivfpq_recall_gate_structured(spark, structured_sf):
    from cloudvectordb_spark.operators.pq import ivfpq_topk_search

    assert _mean_recall(spark, structured_sf, ivfpq_topk_search) >= 0.80


def test_jl_recall_gate_structured(spark, structured_sf):
    """JL tier ranks by L2; on the unit-norm stub corpus L2 and cosine
    orderings coincide, so the cosine exact set is the right baseline."""
    from cloudvectordb_spark.operators.vector_ops import jl_prefilter_knn

    assert _mean_recall(spark, structured_sf, jl_prefilter_knn) >= 0.90


def test_ivfpq_residual_recall_gate_structured(spark, structured_sf):
    """Unit-sphere residual quantization must hold at least plain
    IVF-PQ's gate, and its measured edge (0.933 vs 0.867 at 20k —
    residuals concentrate near the origin so the same 8x16 code budget
    quantizes finer) is pinned with headroom at >= 0.85."""
    from cloudvectordb_spark.operators.pq import ivfpq_residual_topk_search

    assert (
        _mean_recall(spark, structured_sf, ivfpq_residual_topk_search)
        >= 0.85
    )


def test_routed_imi_layout_recall_gate_structured(spark, structured_sf):
    """Round-9: the routed big-k default (build_imi_assignments via
    k > _FLAT_K_MAX) must produce a SEARCHABLE layout, not just a fast
    build: recall@10 vs exact cosine through an nprobe=2*sqrt(cells)
    pruned scan over the 20k structured corpus, gated with headroom
    under the measured 1.0 (tools/imi_build_probe.py at 2M)."""
    import numpy as np
    from pyspark.sql import functions as F

    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.pipeline import build_ivf_assignments

    emb = load(spark, structured_sf, "embeddings")
    assigned, cents_df = build_ivf_assignments(emb, k=1024)
    corpus = assigned.select("vec_id", "embedding", "centroid_id").persist()
    corpus.count()
    try:
        rows = corpus.collect()
        ids = np.array([r.vec_id for r in rows])
        M = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        cell = np.array([r.centroid_id for r in rows])
        cents = sorted(
            (r.centroid_id, np.asarray(r.centroid)) for r in cents_df.collect()
        )
        cm = np.stack([c for _, c in cents])
        cid = np.array([c0 for c0, _ in cents])
        nprobe = int(2 * np.sqrt(len(cents)))
        recs = []
        for qi in range(0, len(ids), 997):
            v = M[qi]
            sims = M @ v
            exact = set(ids[np.argsort(-sims)[1:11]])
            probe = cid[np.argsort(((cm - v) ** 2).sum(axis=1))[:nprobe]]
            idx = np.where(np.isin(cell, probe))[0]
            so = idx[np.argsort(-sims[idx])]
            so = so[ids[so] != ids[qi]][:10]
            recs.append(len(set(ids[so]) & exact) / 10)
        assert sum(recs) / len(recs) >= 0.90
    finally:
        corpus.unpersist()
