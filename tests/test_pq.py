"""PQ compression path: recall gate vs exact kNN, determinism, and
code-balance diagnostics (operators/pq.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.operators.pq import (
    _K,
    _M,
    pq_code_histogram,
    pq_topk_search,
    train_pq_codebooks,
)
from cloudvectordb_spark.operators.vector_ops import exact_knn


def test_pq_recall_vs_exact(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    exact = {}
    for r in exact_knn(emb, probes, k=10).collect():
        exact.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in pq_topk_search(spark, sf_dir).collect():
        got.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(exact)
    recalls = [len(exact[p] & got[p]) / 10 for p in exact]
    assert min(recalls) >= 0.5, f"per-probe recall collapsed: {recalls}"
    assert sum(recalls) / len(recalls) >= 0.6, f"mean recall too low: {recalls}"


def test_pq_codebooks_deterministic(spark, sf_dir):
    a = train_pq_codebooks(spark, sf_dir)
    b = train_pq_codebooks(spark, sf_dir)
    assert a.shape == (_M, _K, 64 // _M)
    assert (a == b).all(), "seeded + order-pinned training must be bit-stable"


def test_pq_code_histogram_complete(spark, sf_dir):
    """Exact-crosstab form (full value oracle since r5): per subspace the
    code counts must partition the corpus, and every code lies in
    [0, _K)."""
    n = load(spark, sf_dir, "embeddings").count()
    rows = pq_code_histogram(spark, sf_dir).collect()
    per_sub: dict = {}
    for r in rows:
        assert 0 <= r["code"] < _K
        per_sub[r["subspace"]] = per_sub.get(r["subspace"], 0) + r["n_rows"]
    assert per_sub == {s: n for s in range(_M)}


def test_ivfpq_recall_vs_exact(spark, sf_dir):
    """IVF cell pruning (2/8 cells) x PQ codes x exact rescore: the two
    approximations multiply, so the gate is looser than either alone —
    but the top of the list must substantially survive."""
    from cloudvectordb_spark.operators.pq import ivfpq_topk_search
    from cloudvectordb_spark.operators.vector_ops import knn_exact_cosine

    got: dict = {}
    for r in ivfpq_topk_search(spark, sf_dir).collect():
        got.setdefault(r.probe_id, set()).add(r.neighbor_id)
    exact: dict = {}
    for r in knn_exact_cosine(spark, sf_dir).collect():
        if r.rank <= 10 and r.probe_id in (0, 1, 2):
            exact.setdefault(r.probe_id, set()).add(r.neighbor_id)
    recalls = [len(exact[p] & got.get(p, set())) / len(exact[p]) for p in exact]
    assert min(recalls) >= 0.3, f"per-probe recall collapsed: {recalls}"
    assert sum(recalls) / len(recalls) >= 0.5, f"mean recall too low: {recalls}"


def test_pq_append_matches_bulk_encoding(spark, sf_dir, tmp_path):
    """Delta codes appended against frozen codebooks must equal the
    codes a bulk re-encode would produce, and the layout must contain
    every vector exactly once after the append."""
    from cloudvectordb_spark.operators.pq import (
        append_to_pq_index,
        pq_encode,
        train_pq_codebooks,
    )

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 50)
    delta = emb.filter(F.col("vec_id") < 50)
    books = train_pq_codebooks(spark, sf_dir)

    out = str(tmp_path / "codes")
    pq_encode(base, books).write.mode("overwrite").parquet(out)
    append_to_pq_index(delta.select("vec_id", "embedding"), out, books)

    after = spark.read.parquet(out)
    assert after.count() == emb.count()
    assert after.select("vec_id").distinct().count() == emb.count()
    bulk = {r.vec_id: list(r.code) for r in pq_encode(emb, books).collect()}
    got = {r.vec_id: list(r.code) for r in after.collect()}
    assert got == bulk
