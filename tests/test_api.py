"""VectorIndex facade (cloudvectordb_spark/api.py): the ergonomic
surface must compose the tested pieces without changing their answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudvectordb_spark.api import VectorIndex
from cloudvectordb_spark.catalog import load


def test_vector_index_lifecycle(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 20)
    delta = emb.filter(F.col("vec_id") < 20)

    idx = VectorIndex.build(spark, base, str(tmp_path / "ivf"), k=4)
    assert idx.vectors.count() == base.count()
    assert len(idx.centroids()) == 4

    # search returns the probe-pruned exact top-k shape
    probes = base.filter(F.col("vec_id") < 30)
    hits = idx.search(probes, k=5)
    got = {r.probe_id for r in hits.collect()}
    assert got == {r.vec_id for r in probes.select("vec_id").collect()}

    # append lands the delta; stats sees the grown corpus
    idx.append(delta.select("vec_id", "embedding", "label"))
    assert idx.vectors.count() == emb.count()
    st = idx.stats().collect()[0]
    assert st.n_cells == 4 and st.min_cell >= 1
    assert abs(st.imbalance - st.max_cell / st.avg_cell) < 1e-6

    # compaction preserves contents in a fresh path
    idx2 = idx.compact(str(tmp_path / "ivf2"))
    assert idx2.vectors.count() == emb.count()
    a = {(r.vec_id, r.centroid_id) for r in idx.vectors.collect()}
    b = {(r.vec_id, r.centroid_id) for r in idx2.vectors.collect()}
    assert a == b


def test_vector_index_search_matches_registered_query(spark, sf_dir, tmp_path):
    """Facade search over the SAME layout must equal ivf_topk_search's
    answer (both are pruned exact_knn_fast with nprobe=2)."""
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        ivf_topk_search,
    )

    emb = load(spark, sf_dir, "embeddings")
    idx = VectorIndex.open(spark, ensure_ivf_index(spark, sf_dir))
    probes = emb.filter(F.col("vec_id") < 3)
    via_api = {
        (r.probe_id, r.rank): r.neighbor_id
        for r in idx.search(probes, k=10, nprobe=2).collect()
    }
    via_query = {
        (r.probe_id, r.rank): r.neighbor_id
        for r in ivf_topk_search(spark, sf_dir).collect()
    }
    assert via_api == via_query


def test_vector_index_search_filtered_respects_predicate(spark, sf_dir):
    from cloudvectordb_spark.operators.pipeline import ensure_ivf_index

    idx = VectorIndex.open(spark, ensure_ivf_index(spark, sf_dir))
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    hits = idx.search_filtered(probes, F.col("label").isin(1, 3), k=10)
    rows = hits.collect()
    assert rows
    labels = {
        r.vec_id: r.label for r in emb.select("vec_id", "label").collect()
    }
    for r in rows:
        assert labels[r.neighbor_id] in (1, 3)
    # unfiltered search over the same cells returns a superset-or-equal
    # neighbor pool per probe (the predicate can only shrink candidates)
    unfiltered = {
        (r.probe_id, r.neighbor_id) for r in idx.search(probes, k=50).collect()
    }
    for r in rows:
        if labels[r.neighbor_id] in (1, 3):
            pass  # membership in the unfiltered top-50 is not guaranteed at k cut
