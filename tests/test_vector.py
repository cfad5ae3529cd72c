"""Vector algebra invariants (SURVEY.md §5.3.3): K6/K7/K8."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.functions import vector as V
from cloudvectordb_spark.operators.vector_ops import exact_knn


def test_cosine_self_similarity_is_one(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").limit(20)
    rows = emb.select(F.round(V.cosine("embedding", "embedding"), 9).alias("c")).collect()
    assert rows and all(abs(r.c - 1.0) < 1e-8 for r in rows)


def test_cosine_symmetry(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [-4.0, 0.5, 2.0])], "a array<float>, b array<float>"
    )
    r = df.select(
        V.cosine("a", "b").alias("ab"), V.cosine("b", "a").alias("ba")
    ).collect()[0]
    assert math.isclose(r.ab, r.ba, rel_tol=1e-12)


def test_dot_matches_python(spark):
    a, b = [1.5, -2.0, 0.25], [4.0, 1.0, -8.0]
    expected = sum(x * y for x, y in zip(a, b))
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    got = df.select(V.dot("a", "b").alias("d")).collect()[0].d
    assert math.isclose(got, expected, rel_tol=1e-6)


def test_l2_normalize_idempotent_and_unit(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").limit(10)
    once = emb.select(V.l2_normalize("embedding").alias("v"))
    norms = once.select(V.l2_norm("v").alias("n")).collect()
    assert all(abs(r.n - 1.0) < 1e-5 for r in norms)
    twice = once.select(V.l2_normalize("v").alias("v2"), "v")
    pairs = twice.select(V.cosine("v", "v2").alias("c")).collect()
    assert all(abs(r.c - 1.0) < 1e-6 for r in pairs)


def test_zero_vector_cosine_is_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<float>, b array<float>"
    )
    assert df.select(V.cosine("a", "b").alias("c")).collect()[0].c is None


def test_exact_knn_matches_bruteforce(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    got = exact_knn(emb, probes, k=5).collect()
    assert len(got) == 15
    # brute force on the driver
    import numpy as np

    data = {r.vec_id: np.array(r.embedding, dtype=float) for r in emb.collect()}
    for pid in range(3):
        p = data[pid]
        sims = {
            vid: float(np.dot(v, p) / (np.linalg.norm(v) * np.linalg.norm(p)))
            for vid, v in data.items()
            if vid != pid
        }
        expect = sorted(sims, key=lambda v: (-round(sims[v], 6), v))[:5]
        mine = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.probe_id == pid]
        assert mine == expect, f"probe {pid}: {mine} != {expect}"


def test_knn_plan_broadcasts_probes(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    plan = exact_knn(emb, probes, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_exact_knn_fast_matches_slow(spark, sf_dir):
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.vector_ops import exact_knn, exact_knn_fast
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    slow = {(r.probe_id, r.rank): (r.neighbor_id, r.score)
            for r in exact_knn(emb, probes, k=10).collect()}
    fast = {(r.probe_id, r.rank): (r.neighbor_id, r.score)
            for r in exact_knn_fast(emb, probes, k=10).collect()}
    assert slow == fast and len(slow) == 50


def test_int8_quantization_fidelity(spark, sf_dir):
    """int8 quantization must stay within its theoretical error budget:
    per-element error <= scale/2, so l2_err <= sqrt(dim)*scale/2 and
    cosine fidelity stays ~1 for unit-ish vectors."""
    import math
    from cloudvectordb_spark.registry import all_queries

    rows = all_queries()["embedding_int8_quant_error"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cos_fidelity >= 0.999, f"vec {r.vec_id} fidelity {r.cos_fidelity}"
        assert r.l2_err <= math.sqrt(64) * r.scale / 2 + 1e-9


def test_search_over_quantized_corpus_preserves_topk(spark, sf_dir):
    """kNN over the int8-dequantized corpus must recover nearly all of
    the full-precision top-10 — the end-to-end check that a 4x-smaller
    index layout doesn't cost meaningful recall."""
    from pyspark.sql import functions as F
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    emb = load(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs)) / 127.0
    dequant = emb.select(
        "vec_id",
        F.transform(v, lambda x: (F.round(x / scale) * scale).cast("float")).alias(
            "embedding"
        ),
    )
    probes = emb.filter(F.col("vec_id") < 5)
    full = {}
    for r in exact_knn_fast(emb, probes, k=10).collect():
        full.setdefault(r.probe_id, set()).add(r.neighbor_id)
    quant = {}
    for r in exact_knn_fast(dequant, probes, k=10).collect():
        quant.setdefault(r.probe_id, set()).add(r.neighbor_id)
    recalls = [len(full[p] & quant.get(p, set())) / len(full[p]) for p in full]
    assert sum(recalls) / len(recalls) >= 0.8


def test_binary_quant_codes_roundtrip_sign_pattern(spark, sf_dir):
    """Sign-bit packing: bit j of (h0,h1) must equal v[j] > 0 exactly."""
    from cloudvectordb_spark.operators.vector_ops import binary_quantize

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    rows = binary_quantize(emb).select("vec_id", "embedding", "h0", "h1").collect()
    assert rows
    for r in rows:
        packed = (r.h1 << 32) | r.h0
        for j, x in enumerate(r.embedding):
            assert ((packed >> j) & 1) == (1 if x > 0 else 0), (r.vec_id, j)


def test_binary_quant_hamming_recall_vs_exact(spark, sf_dir):
    """The 16-byte Hamming candidate generator + exact rescore must
    recover most of the true cosine top-10 (floor 0.5 mean recall at
    C=50 candidates on the fixture)."""
    from cloudvectordb_spark.operators.vector_ops import (
        binary_quant_hamming_knn,
        exact_knn,
    )

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    exact: dict = {}
    for r in exact_knn(emb, probes, k=10).collect():
        exact.setdefault(r.probe_id, set()).add(r.neighbor_id)
    got: dict = {}
    for r in binary_quant_hamming_knn(spark, sf_dir).collect():
        got.setdefault(r.probe_id, set()).add(r.neighbor_id)
    recalls = [len(exact[p] & got.get(p, set())) / len(exact[p]) for p in exact]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_l0_append_tier_parity_and_fold(spark, sf_dir, tmp_path):
    """The L0 delta tier (round 12): a small append lands as a handful
    of vectors_delta files instead of one file per touched cell, and
    every read surface — contents, search, histogram, stats — sees the
    union; an explicitly-partitioned append of the same delta yields
    IDENTICAL search results; compaction folds the tier away."""
    import os

    from pyspark.sql import functions as F

    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.pipeline import (
        append_to_ivf_index,
        ivf_cell_histogram,
    )

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 50).select("vec_id", "embedding")
    delta = emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding")

    a = VectorIndex.build(spark, base, str(tmp_path / "a"), k=4)
    b = VectorIndex.build(spark, base, str(tmp_path / "b"), k=4)
    hist_before = dict(ivf_cell_histogram(spark, a.path))

    append_to_ivf_index(delta, a.path, l0=True)
    append_to_ivf_index(delta, b.path, l0=False)

    # layout shapes: a grew an L0 tier, b scattered into cell dirs
    assert os.path.isdir(f"{a.path}/vectors_delta")
    assert not os.path.isdir(f"{b.path}/vectors_delta")

    # contents identical
    rows = lambda ix: {  # noqa: E731
        (r.vec_id, tuple(r.embedding), r.centroid_id)
        for r in ix.vectors.collect()
    }
    assert rows(a) == rows(b)

    # search identical at full coverage AND pruned
    probes = delta.limit(5)
    for nprobe in (1, 4):
        ra = {
            tuple(r)
            for r in a.search(probes, k=3, nprobe=nprobe).collect()
        }
        rb = {
            tuple(r)
            for r in b.search(probes, k=3, nprobe=nprobe).collect()
        }
        assert ra == rb and len(ra) > 0

    # histogram cache invalidated by the L0 append (content tag moved)
    hist_after = dict(ivf_cell_histogram(spark, a.path))
    assert sum(hist_after.values()) == sum(hist_before.values()) + 50

    # delete removes L0 rows too (the demotion-correctness path)
    victims = [r.vec_id for r in delta.limit(3).collect()]
    a.delete(victims)
    assert not {
        r.vec_id for r in a.vectors.filter(F.col("vec_id").isin(victims)).collect()
    }

    # compaction folds the tier: pure partitioned layout, equal contents
    c = a.compact(str(tmp_path / "c"))
    assert not os.path.isdir(f"{c.path}/vectors_delta")
    b.delete(victims)
    assert rows(c) == rows(b)


def test_ivf_l0_split_carries_delta_rows(spark, sf_dir, tmp_path):
    """split_hot_cells on an index with an uncompacted L0 tier: hot
    cells re-split WITH their L0 rows; unchanged cells' L0 rows carry
    into the new root — contents preserved exactly."""
    from pyspark.sql import functions as F

    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.pipeline import append_to_ivf_index

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 40).select("vec_id", "embedding")
    delta = emb.filter(F.col("vec_id") < 40).select("vec_id", "embedding")
    ix = VectorIndex.build(spark, base, str(tmp_path / "s"), k=4)
    append_to_ivf_index(delta, ix.path, l0=True)
    before = {
        (r.vec_id, tuple(r.embedding)) for r in ix.vectors.collect()
    }
    new, stats = ix.split_hot_cells(str(tmp_path / "s2"), factor=1.2)
    after = {
        (r.vec_id, tuple(r.embedding)) for r in new.vectors.collect()
    }
    assert after == before
    # one cell per vector still holds
    assert new.vectors.groupBy("vec_id").count().filter(
        F.col("count") > 1
    ).count() == 0
