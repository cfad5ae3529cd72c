"""S1-S4 pipeline invariants (SURVEY.md §5.3.4): triplets, stub
embedding, IVF layout completeness, ANN recall vs exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.operators.pipeline import (
    build_ivf_assignments,
    embed_documents,
    export_triplet_shards,
    stub_encode,
    triplet_mining,
    write_ivf_index,
)
from cloudvectordb_spark.operators.vector_ops import exact_knn


def test_triplets_label_contract(spark, sf_dir):
    trips = triplet_mining(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    lbl = {r.vec_id: r.label for r in emb.collect()}
    rows = trips.collect()
    assert rows
    for r in rows:
        assert lbl[r.pos_id] == r.label, "positive must share the anchor label"
        assert lbl[r.neg_id] != r.label, "negative must differ from the anchor label"
        assert r.anchor_id != r.pos_id


def test_embed_documents_deterministic_dim(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = embed_documents(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(len(r.embedding) == 64 for r in rows[:20])
    # deterministic across runs
    again = {r.doc_id: r.embedding for r in embed_documents(docs).collect()}
    for r in rows[:20]:
        assert again[r.doc_id] == r.embedding


def test_ivf_layout_complete_and_written(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    assigned, centroids = build_ivf_assignments(emb, k=4, seed=42)
    n = emb.count()
    # every vector in exactly one bucket
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    assert centroids.count() == 4
    out = str(tmp_path / "ivf")
    write_ivf_index(assigned, centroids, out)
    back = spark.read.parquet(out + "/vectors")
    assert back.count() == n
    assert spark.read.parquet(out + "/centroids").count() == 4
    # layout is partitioned by centroid_id => partition pruning applies
    pruned = back.filter(F.col("centroid_id") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(centroid_id" in plan or "centroid_id" in plan


def test_ivf_search_recall_vs_exact(spark, sf_dir):
    """ANN with nprobe=4 of 8 centroids must recover most of the exact
    top-10 (recall floor 0.5 at this tiny sf; exactness not expected)."""
    from pyspark.sql import Window
    from cloudvectordb_spark.functions import vector as V

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    exact = exact_knn(emb, probes, k=10).collect()
    assigned, centroids = build_ivf_assignments(emb, k=8, seed=42)
    p = probes.select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec"))
    pc = p.crossJoin(F.broadcast(centroids)).withColumn(
        "cdist", V.l2_distance("probe_vec", "centroid")
    )
    wp = Window.partitionBy("probe_id").orderBy("cdist", "centroid_id")
    pb = (
        pc.withColumn("crank", F.row_number().over(wp))
        .filter(F.col("crank") <= 4)
        .select("probe_id", "probe_vec", "centroid_id")
    )
    cands = assigned.join(pb, on="centroid_id").filter(F.col("vec_id") != F.col("probe_id"))
    scored = cands.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(V.cosine("embedding", "probe_vec"), 6).alias("score"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    approx = (
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10).collect()
    )
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.probe_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.probe_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[pid] & approx_sets.get(pid, set())) / len(exact_sets[pid])
        for pid in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5


def test_export_triplet_shards(spark, sf_dir, tmp_path):
    trips = triplet_mining(spark, sf_dir)
    out = str(tmp_path / "shards")
    export_triplet_shards(trips, out, num_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == trips.count()


def test_stub_encoder_unit_norm():
    import numpy as np

    m = stub_encode(np.arange(10))
    assert m.shape == (10, 64)
    assert np.allclose(np.linalg.norm(m, axis=1), 1.0, atol=1e-5)


def test_ensure_ivf_index_builds_once(spark, sf_dir):
    import os
    from cloudvectordb_spark.operators.pipeline import ensure_ivf_index, read_ivf_index

    p1 = ensure_ivf_index(spark, sf_dir)
    marker_mtime = os.path.getmtime(os.path.join(p1, "_BUILT"))
    p2 = ensure_ivf_index(spark, sf_dir)
    assert p1 == p2
    assert os.path.getmtime(os.path.join(p2, "_BUILT")) == marker_mtime  # no rebuild
    vectors, centroids = read_ivf_index(spark, p1)
    n = load(spark, sf_dir, "embeddings").count()
    assert vectors.count() == n and vectors.select("vec_id").distinct().count() == n
    assert centroids.count() == 8


def test_build_routes_to_imi_above_k_threshold(spark, sf_dir):
    """Round-8 verdict #2: the scale-safe two-level build must be the
    DEFAULT above _FLAT_K_MAX, producing the same layout contract as
    flat (one assignment per vector; every used cell in the centroid
    table; global ids = parent*k2 + child)."""
    from cloudvectordb_spark.operators import pipeline as P

    emb = load(spark, sf_dir, "embeddings")
    # force routing at a test-sized k by lowering the threshold
    orig = P._FLAT_K_MAX
    P._FLAT_K_MAX = 8
    try:
        assigned, centroids = P.build_ivf_assignments(emb, k=12)
    finally:
        P._FLAT_K_MAX = orig
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    cells = {r.centroid_id for r in centroids.collect()}
    used = {r.centroid_id for r in assigned.select("centroid_id").distinct().collect()}
    assert used <= cells
    assert len(cells) <= 12 + 4  # k1*k2 >= k, at most one extra child row per parent
    # default k stays flat: same 8-cell layout the oracles replay
    _, flat_cents = P.build_ivf_assignments(emb, k=8)
    assert flat_cents.count() == 8


def test_ensure_ivf_index_routed_bigk_end_to_end(spark, sf_dir):
    """The routed build through the FULL persisted-index lifecycle:
    ensure_ivf_index(k=600 > _FLAT_K_MAX) builds the two-level layout,
    writes it partitioned, and a pruned probe search through the
    published index returns its own vector as top-1."""
    import numpy as np

    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        index_centroids,
        read_ivf_index,
    )

    path = ensure_ivf_index(spark, sf_dir, k=600)
    vectors, _ = read_ivf_index(spark, path)
    n = load(spark, sf_dir, "embeddings").count()
    assert vectors.count() == n
    assert vectors.select("vec_id").distinct().count() == n

    cents = index_centroids(spark, path)
    assert 2 <= len(cents) <= 600 + 24  # proportional alloc, <= ~k cells
    # probe vec 0 through the pruned layout: nearest 4 cells by the
    # published centroid table must contain the vector itself
    q = np.asarray(
        vectors.filter(F.col("vec_id") == 0).collect()[0].embedding,
        dtype=np.float64,
    )
    cm = np.array([c for _, c in cents])
    cid = np.array([c0 for c0, _ in cents])
    probe = [int(x) for x in cid[np.argsort(((cm - q) ** 2).sum(axis=1))[:4]]]
    hits = {
        r.vec_id
        for r in vectors.filter(F.col("centroid_id").isin(probe))
        .select("vec_id")
        .collect()
    }
    assert 0 in hits, "self-vector missing from its own probed cells"


def test_semantic_dup_ivf_recall_vs_exact(spark, sf_dir):
    """IVF-bucketed near-dup must recover a solid share of the exact
    tau=0.3 pairs (multi-probe assignment, nprobe=2). Precision must be
    perfect: every reported pair really clears tau."""
    from cloudvectordb_spark.operators.pipeline import semantic_dup_pairs_ivf
    from cloudvectordb_spark.operators.vector_ops import semantic_dup_pairs

    exact = {(r.a_id, r.b_id) for r in semantic_dup_pairs(spark, sf_dir).collect()}
    approx_rows = semantic_dup_pairs_ivf(spark, sf_dir).collect()
    approx = {(r.a_id, r.b_id) for r in approx_rows}
    assert approx <= exact, "IVF path reported a pair below tau (precision break)"
    assert exact, "fixture should contain pairs above tau"
    assert len(approx & exact) / len(exact) >= 0.35


def test_semantic_dup_capped_matches_uncapped(spark, sf_dir):
    """Round-8 verdict #1 gate: cell-size-capped sub-bucketing is a
    physical re-plan only — the (a_id, b_id, cos_sim) set must be
    IDENTICAL to the uncapped IVF path. cap=16 forces every fixture cell
    (~125 rows) through the split path, including cross-sub-cell
    bipartite tasks."""
    from cloudvectordb_spark.operators.pipeline import (
        semantic_dup_pairs_capped,
        semantic_dup_pairs_ivf,
    )

    uncapped = {
        tuple(r) for r in semantic_dup_pairs_ivf(spark, sf_dir).collect()
    }
    capped = {
        tuple(r)
        for r in semantic_dup_pairs_capped(spark, sf_dir, cap=16).collect()
    }
    assert uncapped, "fixture should contain pairs above tau"
    assert capped == uncapped


def test_sub_bucket_tasks_bound_and_cover(spark):
    """The task fan-out must (a) bound rows-per-task at ~2*cap and
    (b) place every within-cell pair in exactly one task. Checked on a
    synthetic hot cell of 40 rows with cap=8 (nsub=5)."""
    import itertools

    from pyspark.sql import functions as F

    from cloudvectordb_spark.operators.pipeline import _sub_bucket_tasks

    df = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.lit(0).alias("centroid_id"),
        F.array(F.lit(1.0)).alias("embedding"),
    )
    rows = _sub_bucket_tasks(df, cap=8).collect()
    per_task = {}
    for r in rows:
        per_task.setdefault((r.ti, r.tj), set()).add(r.vec_id)
    assert max(len(v) for v in per_task.values()) <= 16  # 2 * cap
    # every unordered pair appears in exactly one task
    seen = {}
    for key, ids in per_task.items():
        ti, tj = key
        if ti == tj:
            cand = [
                (a, b) for a, b in itertools.combinations(sorted(ids), 2)
                if a % 5 == ti and b % 5 == ti
            ]
        else:
            a_side = [i for i in ids if i % 5 == ti]
            b_side = [i for i in ids if i % 5 == tj]
            cand = [
                (min(a, b), max(a, b)) for a in a_side for b in b_side
            ]
        for p in cand:
            assert p not in seen, f"pair {p} in two tasks {seen[p]} and {key}"
            seen[p] = key
    assert len(seen) == 40 * 39 // 2


def test_cell_pairs_kernel_blocked_matches_naive(monkeypatch):
    """Hot-cell guard (round-5 verdict #4): the tiled within-cell kernel
    must emit EXACTLY the pairs the naive n x n form does, while never
    materializing more than a _CELL_BLOCK-sized sims tile. Force a cell
    far larger than the (patched) block size and compare pair-for-pair
    against a direct numpy computation."""
    import numpy as np
    import pandas as pd

    from cloudvectordb_spark.operators import pipeline as P

    rng = np.random.default_rng(7)
    n, d, tau = 53, 8, 0.3
    base = rng.normal(size=(6, d))
    # duplicate-heavy cell: many near-copies of a few base vectors
    vecs = base[rng.integers(0, 6, size=n)] + rng.normal(scale=0.05, size=(n, d))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs.astype(np.float32))}
    )

    monkeypatch.setattr(P, "_CELL_BLOCK", 7)  # n=53 spans 8 tiles per axis
    got = P._cell_pairs_kernel(tau)(pdf.sample(frac=1.0, random_state=3))

    m = vecs.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    # kernel normalizes the float32-cast embeddings; mirror that
    m32 = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    m32 /= np.linalg.norm(m32, axis=1, keepdims=True)
    sims = m32 @ m32.T
    iu, ju = np.triu_indices(n, k=1)
    keep = sims[iu, ju] >= tau
    # the kernel rounds HALF-UP to 6 dp (oracle round() convention);
    # np.round is banker's half-even and would diverge on .5e-7 boundaries
    kept = sims[iu, ju][keep]
    rounded = np.sign(kept) * np.floor(np.abs(kept) * 1e6 + 0.5) / 1e6
    want = {
        (int(a), int(b), float(s))
        for a, b, s in zip(iu[keep], ju[keep], rounded)
    }
    assert want, "synthetic hot cell must contain pairs above tau"
    got_set = {
        (int(r.a_id), int(r.b_id), float(r.cos_sim)) for r in got.itertuples()
    }
    assert got_set == want


def test_semantic_canonical_clusters_end_to_end(spark, sf_dir):
    """G6 end-to-end gate: the IVF-bucketed clustering must (a) only merge
    vectors the EXACT pair set also connects (no false merges beyond exact
    transitivity), and (b) canonical ids must be each cluster's min member
    with consistent sizes."""
    from cloudvectordb_spark.operators.pipeline import semantic_canonical_clusters
    from cloudvectordb_spark.operators.vector_ops import semantic_dup_pairs
    from cloudvectordb_spark.operators.dedup import connected_components

    rows = semantic_canonical_clusters(spark, sf_dir).collect()
    assert rows, "fixture should produce at least one semantic cluster"
    by_comp = {}
    for r in rows:
        assert r.canonical_id <= r.vec_id  # min-label canonical
        by_comp.setdefault(r.canonical_id, []).append(r)
    for comp_id, members in by_comp.items():
        assert comp_id == min(m.vec_id for m in members)
        assert all(m.cluster_size == len(members) for m in members)

    # no false merges: IVF components must refine the EXACT components
    exact_edges = semantic_dup_pairs(spark, sf_dir).select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    exact_comp = {
        r.node: r.component for r in connected_components(exact_edges).collect()
    }
    for r in rows:
        assert exact_comp.get(r.vec_id) is not None
        # two vectors in one IVF cluster must share an exact component
    comp_of = {r.vec_id: r.canonical_id for r in rows}
    for comp_id, members in by_comp.items():
        exact_ids = {exact_comp[m.vec_id] for m in members}
        assert len(exact_ids) == 1, "IVF clustering merged across exact clusters"


def test_lsh_search_recall_vs_exact(spark, sf_dir):
    """K10 probe path: LSH candidates must recover most of the exact
    L2 top-10 (4 hash tables, unbounded radius => high recall here)."""
    from pyspark.sql import Window
    from cloudvectordb_spark.operators.pipeline import lsh_topk_search
    from cloudvectordb_spark.functions import vector as V

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    scored = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.l2_distance("embedding", "probe_vec"), 6).alias("d"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .collect()
    )
    approx = lsh_topk_search(spark, sf_dir).collect()
    e, a = {}, {}
    for r in exact:
        e.setdefault(r.probe_id, set()).add(r.neighbor_id)
    for r in approx:
        a.setdefault(r.probe_id, set()).add(r.neighbor_id)
    recalls = [len(e[p] & a.get(p, set())) / len(e[p]) for p in e]
    assert sum(recalls) / len(recalls) >= 0.6


def test_ivf_incremental_append_and_search(spark, sf_dir, tmp_path):
    """Delta vectors appended against frozen centroids must (a) land in
    exactly one partition each, (b) be findable by the pruned search."""
    from pyspark.sql import functions as F2
    from cloudvectordb_spark.operators.pipeline import (
        append_to_ivf_index,
        build_ivf_assignments,
        ivf_vectors_frame,
        write_ivf_index,
    )
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F2.col("vec_id") >= 10)
    delta = emb.filter(F2.col("vec_id") < 10)
    out = str(tmp_path / "ivf")
    assigned, cents = build_ivf_assignments(base, k=4, seed=42)
    write_ivf_index(assigned, cents, out)
    n_base = ivf_vectors_frame(spark, out).count()

    append_to_ivf_index(delta.select("vec_id", "embedding", "label"), out)
    # the union read surface: a small delta lands in the L0 tier, so
    # the raw vectors/ dir alone no longer holds every row
    after = ivf_vectors_frame(spark, out)
    assert after.count() == n_base + delta.count()
    assert after.select("vec_id").distinct().count() == emb.count()

    # a probe identical to an appended vector must find it at rank 1
    probe = delta.filter(F2.col("vec_id") == 0)
    hits = exact_knn_fast(
        after.withColumn("embedding", F2.col("embedding")), probe, k=5
    ).collect()
    # vec 0's nearest neighbors exist; ensure the index contains vec 0
    # itself (self-match excluded by construction, so check membership)
    ids_in_index = {r.vec_id for r in after.select("vec_id").collect()}
    assert 0 in ids_in_index and len(hits) == 5


def test_embed_with_trained_artifact_deterministic(spark, sf_dir):
    """The registered query asserts the embedding CONTRACT (coverage,
    dim, unit norm — now oracle-checked); this test keeps the trained
    COMPONENT determinism the query no longer exposes: two embedding
    passes through the artifact must agree bit-for-bit per component."""
    from pyspark.sql import functions as F2

    from cloudvectordb_spark.catalog import load as _load
    from cloudvectordb_spark.operators.pipeline import (
        embed_documents_trained_artifact,
        embed_with_artifact,
        ensure_trained_artifact,
    )

    r1 = {(r.doc_id): (r.dim, r.unit_norm)
          for r in embed_documents_trained_artifact(spark, sf_dir).collect()}
    assert len(r1) > 0
    assert all(dim == 64 and norm == 1.0 for dim, norm in r1.values())

    art = ensure_trained_artifact(spark, sf_dir)
    docs = _load(spark, sf_dir, "documents").filter(F2.col("doc_id") < 50)
    e1 = {r.doc_id: tuple(r.embedding)
          for r in embed_with_artifact(docs, art).collect()}
    e2 = {r.doc_id: tuple(r.embedding)
          for r in embed_with_artifact(docs, art).collect()}
    assert e1 == e2 and len(e1) == 50

def test_ivf_compaction_one_file_per_cell(spark, sf_dir, tmp_path):
    """After appends fragment the layout, compaction rewrites each cell
    to a single file with identical contents and search behavior."""
    import glob

    from pyspark.sql import functions as F2
    from cloudvectordb_spark.operators.pipeline import (
        append_to_ivf_index,
        build_ivf_assignments,
        compact_ivf_index,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F2.col("vec_id") >= 100)
    out = str(tmp_path / "ivf")
    assigned, cents = build_ivf_assignments(base, k=4, seed=42)
    write_ivf_index(assigned, cents, out)
    # two delta increments -> multiple files per touched cell.
    # l0=False forces the partitioned-scatter path: this test is about
    # compaction healing THAT fragmentation (auto mode would route
    # these small deltas to the L0 tier, which has its own fold test
    # in test_vector.py).
    append_to_ivf_index(emb.filter(F2.col("vec_id") < 50).select("vec_id", "embedding", "label"), out, l0=False)
    append_to_ivf_index(
        emb.filter((F2.col("vec_id") >= 50) & (F2.col("vec_id") < 100)).select("vec_id", "embedding", "label"), out,
        l0=False,
    )
    frag_files = glob.glob(out + "/vectors/centroid_id=*/*.parquet")

    compacted = str(tmp_path / "ivf_compacted")
    compact_ivf_index(spark, out, compacted)
    comp_files = glob.glob(compacted + "/vectors/centroid_id=*/*.parquet")
    cells = {f.split("centroid_id=")[1].split("/")[0] for f in comp_files}
    assert len(comp_files) == len(cells), "exactly one file per cell"
    assert len(comp_files) < len(frag_files), "compaction reduced file count"

    before = {r.vec_id for r in spark.read.parquet(out + "/vectors").collect()}
    after = spark.read.parquet(compacted + "/vectors")
    assert {r.vec_id for r in after.collect()} == before == {
        r.vec_id for r in emb.select("vec_id").collect()
    }
    # pruning contract intact: per-cell counts unchanged
    a = {r.centroid_id: r.n for r in spark.read.parquet(out + "/vectors").groupBy("centroid_id").agg(F2.count("*").alias("n")).collect()}
    b = {r.centroid_id: r.n for r in after.groupBy("centroid_id").agg(F2.count("*").alias("n")).collect()}
    assert a == b


def test_ivf2_hierarchy_recall_and_partition_of_corpus(spark, sf_dir):
    """Two-level IVF: (a) the fine assignment partitions the corpus
    (every vector in exactly one (parent, child) cell, children nested
    inside their parent's vectors), (b) the 2x2-probe search recovers a
    solid share of the exact top-10 while scanning ~4/32 cells."""
    from cloudvectordb_spark.catalog import load as _load
    from cloudvectordb_spark.operators.ivf2 import (
        ivf2_cell_counts,
        ivf2_topk_search,
    )
    from cloudvectordb_spark.operators.vector_ops import exact_knn

    emb = _load(spark, sf_dir, "embeddings")
    n = emb.count()
    cells = ivf2_cell_counts(spark, sf_dir).collect()
    assert sum(r.n_vectors for r in cells) == n
    assert len({(r.parent_id, r.child_id) for r in cells}) == len(cells)
    assert len(cells) > 8, "fine level must split the 8 parents further"

    probes = emb.filter(F.col("vec_id") < 3)
    exact: dict = {}
    for r in exact_knn(emb, probes, k=10).collect():
        exact.setdefault(r.probe_id, set()).add(r.neighbor_id)
    got: dict = {}
    for r in ivf2_topk_search(spark, sf_dir).collect():
        got.setdefault(r.probe_id, set()).add(r.neighbor_id)
    recalls = [len(exact[p] & got.get(p, set())) / len(exact[p]) for p in exact]
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_lsh_multiprobe_beats_single_probe_recall(spark, sf_dir):
    """+-1 bucket probing must recover at least as much of the exact
    top-10 as the single-probe path (the boundary-split fix)."""
    from pyspark.sql import Window
    from cloudvectordb_spark.functions import vector as V
    from cloudvectordb_spark.operators.pipeline import (
        lsh_multiprobe_knn,
        lsh_topk_search,
    )

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    scored = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.l2_distance("embedding", "probe_vec"), 6).alias("d"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    exact: dict = {}
    for r in (
        scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10).collect()
    ):
        exact.setdefault(r.probe_id, set()).add(r.neighbor_id)

    def recall(df):
        got: dict = {}
        for r in df.collect():
            got.setdefault(r.probe_id, set()).add(r.neighbor_id)
        rs = [len(exact[p] & got.get(p, set())) / len(exact[p]) for p in exact]
        return sum(rs) / len(rs)

    single = recall(lsh_topk_search(spark, sf_dir))
    multi = recall(lsh_multiprobe_knn(spark, sf_dir))
    assert multi >= single
    assert multi >= 0.7


def test_ivf_strict_nprobe_candidates_and_seq_parity(spark, sf_dir):
    """Strict-nprobe batched search must (a) only return neighbors
    assigned to the PROBE'S OWN top-2 cells — never another probe's
    cell (the union superset ivf_topk_search accepts) — and (b) match
    the sequential single-probe path bit-for-bit per probe."""
    from pyspark.sql import functions as F

    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        index_centroids,
        ivf_strict_nprobe_search,
        read_ivf_index,
    )
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    path = ensure_ivf_index(spark, sf_dir)
    vectors, _ = read_ivf_index(spark, path)
    cents = index_centroids(spark, path)
    cell_of = {
        r.vec_id: r.centroid_id
        for r in vectors.select("vec_id", "centroid_id").collect()
    }
    probes = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    )
    own_cells = {
        r.vec_id: set(nearest_cells_py(r.embedding, cents, 2))
        for r in probes
    }

    out = ivf_strict_nprobe_search(spark, sf_dir).collect()
    assert len(out) > 0
    by_probe = {}
    for r in out:
        assert cell_of[r.neighbor_id] in own_cells[r.probe_id]
        by_probe.setdefault(r.probe_id, []).append(
            (r.rank, r.neighbor_id, r.score)
        )

    for pr in probes:
        pruned = vectors.filter(
            F.col("centroid_id").isin(list(own_cells[pr.vec_id]))
        )
        single = spark.createDataFrame(
            [(pr.vec_id, list(pr.embedding))],
            schema="vec_id long, embedding array<float>",
        )
        want = [
            (r.rank, r.neighbor_id, r.score)
            for r in exact_knn_fast(pruned, single, k=10).collect()
        ]
        assert sorted(by_probe[pr.vec_id]) == sorted(want)


def test_ivf_adaptive_nprobe_covers_candidate_floor(spark, sf_dir):
    """Adaptive expansion must give every probe a candidate pool of at
    least _ADAPTIVE_C vectors (or the whole corpus if smaller), with
    the selected cells a nearest-first prefix of the non-empty cells."""
    from pyspark.sql import functions as F

    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py
    from cloudvectordb_spark.operators.pipeline import (
        _ADAPTIVE_C,
        ensure_ivf_index,
        index_centroids,
        ivf_adaptive_nprobe_search,
        read_ivf_index,
    )

    path = ensure_ivf_index(spark, sf_dir)
    vectors, _ = read_ivf_index(spark, path)
    cents = index_centroids(spark, path)
    counts = {
        r.centroid_id: r.n
        for r in vectors.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    }
    cell_of = {
        r.vec_id: r.centroid_id
        for r in vectors.select("vec_id", "centroid_id").collect()
    }
    total = sum(counts.values())

    out = ivf_adaptive_nprobe_search(spark, sf_dir).collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r.probe_id, set()).add(cell_of[r.neighbor_id])

    probes = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    )
    for pr in probes:
        # recompute the expansion rule: nearest-first prefix of
        # non-empty cells until the pool clears the floor
        selected, cum = [], 0
        for c in nearest_cells_py(pr.embedding, cents, len(cents)):
            n = counts.get(c, 0)
            if n == 0:
                continue
            if cum >= _ADAPTIVE_C:
                break
            selected.append(c)
            cum += n
        # the returned neighbors' cells are a subset of the selection,
        # and the selected pool clears the candidate floor
        assert by_probe[pr.vec_id] <= set(selected)
        assert cum >= min(_ADAPTIVE_C, total)


def test_imi_split_hot_children_balances_skewed_corpus(spark):
    """Round-9 verdict #6: a corpus with half its mass in one tight
    blob must not leave the routed layout with a 2x-mean hot cell —
    the split pass carves the blob's children until every cell
    projects under the factor, while keeping the layout contract
    (every vector in exactly one cell, ids consistent with the
    published centroid table)."""
    import numpy as np
    import pandas as pd

    from cloudvectordb_spark.operators import pipeline as P

    rng_dim = 8
    n = 4000

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = []
            for i in ids:
                i = int(i)
                if i % 2 == 0:  # hot blob: tiny deterministic jitter
                    v = np.full(rng_dim, 1.0)
                    v[i % rng_dim] += 0.001 * ((i // 2) % 7)
                else:  # spread mass on distinct axes
                    v = np.zeros(rng_dim)
                    v[i % rng_dim] = 1.0 + 0.01 * (i % 97)
                out.append(v / np.linalg.norm(v))
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [list(map(float, v)) for v in out]}
            )

    emb = spark.range(0, n, 1, 4).mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    )
    orig = P._FLAT_K_MAX
    P._FLAT_K_MAX = 8  # force the routed path at a test-sized k
    try:
        assigned, centroids = P.build_imi_assignments(emb, k=16)
    finally:
        P._FLAT_K_MAX = orig
    assigned = assigned.persist()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    used = {r.centroid_id for r in assigned.select("centroid_id").distinct().collect()}
    published = {r.centroid_id for r in centroids.select("centroid_id").collect()}
    assert used <= published
    sizes = np.array(
        [r.c for r in assigned.groupBy("centroid_id").count()
         .withColumnRenamed("count", "c").collect()],
        dtype=np.float64,
    )
    # the hot blob (~50% of mass) would give one cell ~8x the mean
    # without splitting; the fit-projected 2x-mean cap must hold on
    # the full corpus within sampling slack
    assert sizes.max() / sizes.mean() <= 3.0, sizes.max() / sizes.mean()
    assigned.unpersist()
