"""Engine-owned deterministic Lloyd's k-means (operators/kmeans_det.py)
and the md5-hyperplane LSH layout: the round-5 components that give the
whole index family value-level oracles. These tests pin the EQUIVALENCE
CONTRACT (Spark DataFrame program == DuckDB CTE replay, bit-for-bit at
the compared precision) directly, independent of the registry sweep."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.operators.kmeans_det import (
    assign_cells,
    assign_top2_cells,
    kmeans_cte_sql,
    lloyd_centroids,
    nearest_cells_py,
    seed_centroids,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{sf_dir}/embeddings.parquet')"
    )
    return con


def test_lloyd_assignments_match_duckdb_replay(spark, sf_dir, duck):
    """The full contract: same seeds, same rounds, same rounding => the
    Spark assignment of EVERY vector equals the CTE replay's."""
    emb = load(spark, sf_dir, "embeddings")
    cents = lloyd_centroids(emb, k=8, seed=42, rounds=3)
    spark_asg = {
        r.vec_id: r.centroid_id
        for r in assign_cells(emb, cents).select("vec_id", "centroid_id").collect()
    }
    sql = (
        "WITH " + kmeans_cte_sql(k=8, seed=42, rounds=3)
        + "\nSELECT vec_id, cid FROM km_assign"
    )
    duck_asg = {r[0]: r[1] for r in duck.execute(sql).fetchall()}
    assert spark_asg == duck_asg

    duck_cents = duck.execute(
        "WITH " + kmeans_cte_sql(k=8, seed=42, rounds=3)
        + "\nSELECT cid, v FROM km_c3 ORDER BY cid"
    ).fetchall()
    assert [(cid, list(v)) for cid, v in duck_cents] == [
        (cid, v) for cid, v in cents
    ]


def test_lloyd_deterministic_and_balanced(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    a = lloyd_centroids(emb, k=8, seed=42, rounds=3)
    b = lloyd_centroids(emb, k=8, seed=42, rounds=3)
    assert a == b, "same seed + rounds must be bit-stable"
    # different seed -> different layout (md5 seeding actually seeds)
    c = lloyd_centroids(emb, k=8, seed=7, rounds=3)
    assert a != c
    # every centroid has full dimension and finite components
    for cid, v in a:
        assert len(v) == 64
        assert all(x == x and abs(x) < 1e6 for x in v)


def test_seed_centroids_are_corpus_vectors(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    seeds = seed_centroids(emb, k=4, seed=42)
    assert [cid for cid, _ in seeds] == [0, 1, 2, 3]
    corpus = {
        tuple(round(float(x), 6) for x in r.embedding)
        for r in emb.select("embedding").collect()
    }
    for _, v in seeds:
        assert tuple(round(float(x), 6) for x in v) in corpus


def test_assign_top2_emits_two_distinct_cells(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").limit(50)
    cents = lloyd_centroids(
        load(spark, sf_dir, "embeddings"), k=8, seed=42, rounds=3
    )
    rows = assign_top2_cells(emb, cents).select("vec_id", "centroid_id").collect()
    by_vec: dict = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r.centroid_id)
    for vid, cells in by_vec.items():
        assert len(cells) == 2 and cells[0] != cells[1]


def test_nearest_cells_py_matches_spark_assignment(spark, sf_dir):
    """The driver-side probe shortcut must agree with the Spark
    expression on every corpus vector (rank-1 cell == assign_cells)."""
    emb = load(spark, sf_dir, "embeddings")
    cents = lloyd_centroids(emb, k=8, seed=42, rounds=3)
    spark_asg = {
        r.vec_id: r.centroid_id
        for r in assign_cells(emb, cents).select("vec_id", "centroid_id").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    for r in rows[:200]:
        assert nearest_cells_py(r.embedding, cents, 1)[0] == spark_asg[r.vec_id]


def test_nearest_cells_batch_parity(spark, sf_dir):
    """The vectorized batch router must replicate the scalar path's
    total order EXACTLY — full ranking (nprobe=k), not just rank-1 —
    on every corpus vector, plus adversarial boundary-tie probes."""
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_batch

    emb = load(spark, sf_dir, "embeddings")
    cents = lloyd_centroids(emb, k=8, seed=42, rounds=3)
    vecs = [r.embedding for r in emb.select("embedding").limit(300).collect()]
    batch = nearest_cells_batch(vecs, cents, nprobe=len(cents))
    for v, got in zip(vecs, batch):
        assert got == nearest_cells_py(v, cents, len(cents))
    # nprobe truncation + nprobe > k
    assert nearest_cells_batch(vecs[:5], cents, 2) == [
        nearest_cells_py(v, cents, 2) for v in vecs[:5]
    ]
    assert nearest_cells_batch(vecs[:2], cents, 99) == [
        nearest_cells_py(v, cents, 99) for v in vecs[:2]
    ]


def test_nearest_cells_batch_boundary_ties():
    """Hand-built centroids that tie exactly at the 6-decimal round
    boundary: equidistant cells must break ties to the SMALLER cid in
    both paths, and half-up rounding must agree (d2 landing on x.5e-6)."""
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_batch

    # two centroids exactly equidistant from the probe -> cid tie-break
    cents = [(3, [1.0, 0.0]), (7, [-1.0, 0.0]), (1, [0.0, 10.0])]
    probe = [0.0, 0.0]
    assert nearest_cells_py(probe, cents, 3) == [3, 7, 1]
    assert nearest_cells_batch([probe], cents, 3) == [[3, 7, 1]]
    # d2 exactly on the rounding boundary: 0.0000005 -> half-up to 1e-6;
    # both paths must round it identically (floor(x*1e6+0.5))
    eps2 = 5e-7  # d2 value
    cents2 = [(0, [eps2**0.5, 0.0]), (1, [0.0, 0.0])]
    for p in ([0.0, 0.0], [1e-3, 0.0]):
        assert (
            nearest_cells_batch([p], cents2, 2)[0]
            == nearest_cells_py(p, cents2, 2)
        )


def test_centroid_arrays_cache_identity(spark, sf_dir):
    """The (cids, cmat) cache is identity-keyed and holds the list: a
    DIFFERENT list with the same id must never be served stale arrays."""
    from cloudvectordb_spark.operators.kmeans_det import (
        _CENT_ARRAYS_CACHE,
        _centroid_arrays,
    )

    cents = [(0, [1.0, 2.0]), (1, [3.0, 4.0])]
    cids1, cmat1 = _centroid_arrays(cents)
    cids2, cmat2 = _centroid_arrays(cents)
    assert cids1 is cids2 and cmat1 is cmat2  # cache hit on same object
    # a fresh list gets fresh arrays even if dict state is poisoned
    other = [(0, [9.0, 9.0]), (1, [8.0, 8.0])]
    _CENT_ARRAYS_CACHE[id(other)] = (cents, cids1, cmat1)  # wrong entry
    cids3, cmat3 = _centroid_arrays(other)
    assert cmat3[0][0] == 9.0  # identity check rejected the stale entry


def test_lsh_hashed_matches_duckdb_replay(spark, sf_dir, duck):
    """md5-hyperplane buckets: every (vector, table) bucket id matches
    the SQL twin (the _LSH_CTES the registered queries embed)."""
    from cloudvectordb_spark.operators.pipeline import _LSH_CTES, lsh_hashed

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    spark_b = {
        (r.vec_id, r.table_id): r.bucket
        for r in lsh_hashed(emb).select("vec_id", "table_id", "bucket").collect()
    }
    duck_b = {
        (r[0], r[1]): r[2]
        for r in duck.execute(
            f"WITH {_LSH_CTES} SELECT vec_id, table_id, bucket FROM lsh_b"
        ).fetchall()
    }
    assert spark_b == duck_b


def test_lsh_single_table_helper_consistent(spark, sf_dir):
    from cloudvectordb_spark.operators.pipeline import lsh_bucket, lsh_hashed

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(20)
    batch = {
        (r.vec_id, r.table_id): r.bucket
        for r in lsh_hashed(emb).collect()
    }
    single = {
        (r.vec_id, 2): r.b
        for r in emb.select("vec_id", lsh_bucket("embedding", 2).alias("b")).collect()
    }
    for k, v in single.items():
        assert batch[k] == v


def test_blas_assignment_matches_expression_path(spark, sf_dir):
    """The large-k Arrow/BLAS assignment must agree with the JVM
    expression path on the fixture (same rounded argmin total order)."""
    from cloudvectordb_spark.operators.kmeans_det import assign_cells_blas

    emb = load(spark, sf_dir, "embeddings")
    cents = lloyd_centroids(emb, k=8, seed=42, rounds=3)
    expr = {
        r.vec_id: r.centroid_id
        for r in assign_cells(emb, cents).select("vec_id", "centroid_id").collect()
    }
    blas = {
        r.vec_id: r.centroid_id
        for r in assign_cells_blas(emb, cents)
        .select("vec_id", "centroid_id")
        .collect()
    }
    assert expr == blas
