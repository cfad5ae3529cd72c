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


def test_vector_index_vacuum_layouts_retention(spark, sf_dir, tmp_path):
    """Layout retention (round-12 verdict #2): after a lifecycle chain
    that published several roots, vacuum keeps the live tree + pinned
    snapshots + the newest `keep` others, deletes the rest, REFUSES
    leased roots, and accounts bytes hard-link-aware (an inode shared
    with a surviving root reclaims nothing; one shared between two
    deleted roots counts once, when its last link drops)."""
    import os
    import time

    from cloudvectordb_spark.versioning import acquire_lease

    fam = tmp_path / "family"
    os.makedirs(fam)
    emb = load(spark, sf_dir, "embeddings").limit(200)
    live = VectorIndex.build(spark, emb, str(fam / "live"), k=4)

    # lifecycle chain publishing 4 extra roots (mtime-ordered)
    snap_pinned = live.snapshot(str(fam / "snap_pinned")).pin()
    time.sleep(0.05)
    snap_old = live.snapshot(str(fam / "snap_old"))
    time.sleep(0.05)
    snap_mid = live.snapshot(str(fam / "snap_mid"))
    time.sleep(0.05)
    compacted = live.compact(str(fam / "compacted"))
    # a root some writer generation fenced on: must be refused
    leased = live.snapshot(str(fam / "leased"))
    acquire_lease(leased.path, owner="writer-gen")
    # staging litter that must be ignored
    os.makedirs(fam / "live.build999")

    out = VectorIndex.vacuum_layouts(str(fam), live.path, keep=2)

    names = lambda xs: {os.path.basename(p) for p in xs}  # noqa: E731
    # live + pinned always survive; keep=2 newest unpinned = compacted, snap_mid
    assert names(out["kept"]) == {
        "live", "snap_pinned", "compacted", "snap_mid"
    }
    assert names(out["deleted"]) == {"snap_old"}
    assert names(out["refused_leased"]) == {"leased"}
    assert os.path.isdir(leased.path) and os.path.isdir(snap_pinned.path)
    assert not os.path.exists(str(fam / "snap_old"))
    assert os.path.isdir(str(fam / "live.build999"))  # staging untouched

    # snap_old's files were hard-links shared with the live tree ->
    # nothing reclaimed, everything counted as shared
    assert out["bytes_reclaimed"] == 0 and out["bytes_shared"] > 0
    assert out["files_deleted"] > 0

    # the pinned snapshot still SERVES after vacuum
    probes = emb.limit(3)
    assert snap_pinned.search(probes, k=2, nprobe=4).count() > 0

    # second vacuum with keep=0: compacted has its OWN data files
    # (a rewrite, not links) -> real bytes reclaimed this time
    out2 = VectorIndex.vacuum_layouts(str(fam), live.path, keep=0)
    assert names(out2["deleted"]) == {"compacted", "snap_mid"}
    assert out2["bytes_reclaimed"] > 0  # compacted's unshared blocks
    # unpin -> the pinned snapshot becomes reclaimable
    snap_pinned.unpin()
    out3 = VectorIndex.vacuum_layouts(str(fam), live.path, keep=0)
    assert names(out3["deleted"]) == {"snap_pinned"}
    assert os.path.isdir(live.path)
    # an ex-live leased root can only go via EXPLICIT retire
    out4 = VectorIndex.vacuum_layouts(str(fam), live.path, keep=0)
    assert names(out4["refused_leased"]) == {"leased"}
    out5 = VectorIndex.vacuum_layouts(
        str(fam), live.path, keep=0, retire=(str(fam / "leased"),)
    )
    assert names(out5["deleted"]) == {"leased"}
    assert not os.path.exists(str(fam / "leased"))


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


def test_text_index_facade_matches_registered_queries(spark, sf_dir):
    """Every TextIndex surface must reproduce its registered-query
    twin bit-for-bit (the facade only composes verified pieces)."""
    from cloudvectordb_spark.api import TextIndex
    from cloudvectordb_spark.operators.search import (
        _BATCH_QUERIES,
        bm25_batch_topk,
        bm25_boolean_search,
        bm25_keyword_search,
        prefix_autocomplete,
    )

    idx = TextIndex.open(spark, sf_dir)

    a = {tuple(r) for r in idx.search(("data", "query", "fast")).collect()}
    b = {tuple(r) for r in bm25_keyword_search(spark, sf_dir).collect()}
    assert a == b and len(a) == 20

    a = {tuple(r) for r in idx.search_batch(_BATCH_QUERIES).collect()}
    b = {tuple(r) for r in bm25_batch_topk(spark, sf_dir).collect()}
    assert a == b

    a = {
        tuple(r)
        for r in idx.search_boolean(("data", "query"), ("stream",)).collect()
    }
    b = {tuple(r) for r in bm25_boolean_search(spark, sf_dir).collect()}
    assert a == b

    a = {tuple(r) for r in idx.complete("s").collect()}
    b = {tuple(r) for r in prefix_autocomplete(spark, sf_dir).collect()}
    assert a == b and len(a) > 0

    corr = idx.correct(("dta",)).collect()
    assert any(r.term == "data" and r.dist == 1 for r in corr)

    st = idx.stats().collect()[0]
    assert st.n_docs > 0 and st.vocab_size > 0


def test_vector_index_search_batch_matches_strict_query(spark, sf_dir, tmp_path):
    """VectorIndex.search_batch == the registered strict-nprobe search
    on the same probes (same index parameters as the package default)."""
    from pyspark.sql import functions as F

    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        ivf_strict_nprobe_search,
    )

    idx = VectorIndex.open(spark, ensure_ivf_index(spark, sf_dir))
    probes = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
    )
    a = {tuple(r) for r in idx.search_batch(probes, k=10, nprobe=2).collect()}
    b = {tuple(r) for r in ivf_strict_nprobe_search(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_text_index_phrase_matches_registered_query(spark, sf_dir):
    from cloudvectordb_spark.api import TextIndex
    from cloudvectordb_spark.operators.search import _PHRASE, phrase_search

    a = {tuple(r) for r in TextIndex.open(spark, sf_dir).phrase(_PHRASE).collect()}
    b = {tuple(r) for r in phrase_search(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_text_index_sparse_matches_registered_query(spark, sf_dir):
    from cloudvectordb_spark.api import TextIndex
    from cloudvectordb_spark.operators.search import _SPARSE_Q, sparse_dot_topk

    a = {
        tuple(r)
        for r in TextIndex.open(spark, sf_dir).search_sparse(_SPARSE_Q).collect()
    }
    b = {tuple(r) for r in sparse_dot_topk(spark, sf_dir).collect()}
    assert a == b and len(a) == 20


def test_vector_index_search_adaptive_matches_registered_query(spark, sf_dir):
    from pyspark.sql import functions as F

    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.pipeline import (
        _ADAPTIVE_C,
        ensure_ivf_index,
        ivf_adaptive_nprobe_search,
    )

    idx = VectorIndex.open(spark, ensure_ivf_index(spark, sf_dir))
    probes = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
    )
    a = {
        tuple(r)
        for r in idx.search_adaptive(
            probes, k=10, min_candidates=_ADAPTIVE_C
        ).collect()
    }
    b = {tuple(r) for r in ivf_adaptive_nprobe_search(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_vector_index_dedup_pairs_matches_registered_query(spark, sf_dir):
    """Facade parity: VectorIndex.dedup_pairs over the fixture index ==
    the registered semantic_dup_pairs_ivf query (same capped generator
    underneath)."""
    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        semantic_dup_pairs_ivf,
    )

    idx = VectorIndex.open(spark, ensure_ivf_index(spark, sf_dir))
    got = {tuple(r) for r in idx.dedup_pairs().collect()}
    want = {tuple(r) for r in semantic_dup_pairs_ivf(spark, sf_dir).collect()}
    assert got == want and want


def test_corpus_pipeline_composed_lifecycle(spark, sf_dir, tmp_path):
    """S1->S4 in one call on the fixture corpus: dedup survivors feed
    the encoder, every survivor lands in exactly one cell, and the
    resulting index serves a self-probe correctly."""
    from cloudvectordb_spark.api import CorpusPipeline
    from cloudvectordb_spark.catalog import load

    docs = load(spark, sf_dir, "documents")
    out = CorpusPipeline.run(spark, docs, str(tmp_path / "cp_idx"), tau=0.5)
    assert out["k"] == 8  # auto-k floors at the fixture shape
    assert out["docs"] == docs.count()
    assert out["survivors"] + out["removed"] == out["docs"]
    assert out["indexed"] == out["survivors"] > 0

    idx = out["index"]
    # collect ONCE: an unordered limit(1) can return different rows on
    # re-execution, so derive both the probe frame and the expected id
    # from the same collected row
    row = idx.vectors.select("vec_id", "embedding").limit(1).collect()[0]
    probe = spark.createDataFrame(
        [(row.vec_id, row.embedding)], schema="vec_id long, embedding array<float>"
    )
    rows = idx.search(probe, k=5).collect()
    assert rows, "composed index failed to serve"
    assert all(r.probe_id == row.vec_id for r in rows)


def test_corpus_pipeline_custom_encoder_plug_point(spark, sf_dir, tmp_path):
    """The encoder override is the real-model boundary: it must receive
    the TEXT batch (not doc ids — round-10 ADVICE item 1), and whatever
    it returns per text must be exactly what lands in the index keyed by
    that doc's id, with the same dedup/build plumbing around it."""
    import numpy as np

    from cloudvectordb_spark.api import CorpusPipeline
    from cloudvectordb_spark.catalog import load

    def tiny_encoder(texts: np.ndarray) -> np.ndarray:
        # a text-content-sensitive fake model: any id-keyed plumbing
        # regression (encoder fed something other than the raw text)
        # changes the values and fails the per-doc comparison below
        m = np.zeros((len(texts), 4), dtype=np.float32)
        for i, t in enumerate(texts):
            s = str(t)
            m[i, 0] = 1.0
            m[i, 1] = float(len(s) % 7)
            m[i, 2] = float(sum(ord(c) for c in s[:16]) % 11)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        return (m / n).astype(np.float32)

    docs = load(spark, sf_dir, "documents").limit(60)
    out = CorpusPipeline.run(
        spark, docs, str(tmp_path / "cp_enc"), encoder=tiny_encoder
    )
    text_of = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    vec = out["index"].vectors.select("vec_id", "embedding").limit(5).collect()
    for r in vec:
        expect = tiny_encoder(np.array([text_of[r.vec_id]], dtype=object))[0]
        assert len(r.embedding) == 4
        assert max(abs(a - b) for a, b in zip(r.embedding, expect)) < 1e-6


def test_search_sharded_scatter_gather_matches_global_exact(spark, sf_dir, tmp_path):
    """Two md5-split shard indexes searched with nprobe covering every
    shard cell (per-shard search exact) must merge to EXACTLY the
    unsharded exact top-k, with correct shard attribution."""
    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.vector_ops import exact_knn

    emb = load(spark, sf_dir, "embeddings")
    half = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1) < "8"
    shards = [
        VectorIndex.build(spark, emb.filter(half), str(tmp_path / "s0"), k=2),
        VectorIndex.build(spark, emb.filter(~half), str(tmp_path / "s1"), k=2),
    ]
    probes = emb.filter(F.col("vec_id") < 3)
    got = VectorIndex.search_sharded(shards, probes, k=10, nprobe=2)
    want = exact_knn(emb, probes, k=10)
    g = {(r.probe_id, r.rank): (r.neighbor_id, r.score, r.shard) for r in got.collect()}
    w = {(r.probe_id, r.rank): (r.neighbor_id, r.score) for r in want.collect()}
    assert len(g) == len(w) == 30
    shard_of = {
        r.vec_id: 0 if r.h < "8" else 1
        for r in emb.select(
            "vec_id",
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1).alias("h"),
        ).collect()
    }
    for key, (nid, score) in w.items():
        gn, gs, gsh = g[key]
        assert (gn, gs) == (nid, score), key
        assert gsh == shard_of[nid], key


def test_search_sharded_custom_columns_and_sequential_parity(spark, sf_dir, tmp_path):
    """Probes with non-default column names must route through the whole
    sharded path (round-10 ADVICE item 2), and the concurrent fan-out
    must return exactly the sequential fan-out's rows."""
    from cloudvectordb_spark.operators.vector_ops import exact_knn

    emb = load(spark, sf_dir, "embeddings")
    half = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1) < "8"
    shards = [
        VectorIndex.build(spark, emb.filter(half), str(tmp_path / "c0"), k=2),
        VectorIndex.build(spark, emb.filter(~half), str(tmp_path / "c1"), k=2),
    ]
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = VectorIndex.search_sharded(
        shards, probes, k=10, nprobe=2, id_col="qid", vec_col="qvec"
    )
    seq = VectorIndex.search_sharded(
        shards, probes, k=10, nprobe=2, id_col="qid", vec_col="qvec",
        concurrent=False,
    )
    g = {(r.probe_id, r.rank): (r.neighbor_id, r.score, r.shard) for r in got.collect()}
    s = {(r.probe_id, r.rank): (r.neighbor_id, r.score, r.shard) for r in seq.collect()}
    assert g == s and len(g) == 30
    want = exact_knn(emb, emb.filter(F.col("vec_id") < 3), k=10)
    w = {(r.probe_id, r.rank): (r.neighbor_id, r.score) for r in want.collect()}
    assert {k: v[:2] for k, v in g.items()} == w


def test_adaptive_histogram_cached_and_append_invalidates(spark, sf_dir, tmp_path):
    """Round-10 verdict #4 + ADVICE #4: the adaptive-search cell
    histogram is served from the content-fingerprinted cache (second
    call returns the SAME object — no count job), and an append that
    only adds files inside existing centroid_id=* subdirectories still
    flips the fingerprint (the append-proof property the old dir-level
    mtime tag lacked)."""
    from cloudvectordb_spark.operators.pipeline import (
        ivf_cell_histogram,
        ivf_content_tag,
    )

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 10)
    idx = VectorIndex.build(spark, base, str(tmp_path / "hc"), k=4)
    h1 = ivf_cell_histogram(spark, idx.path)
    h2 = ivf_cell_histogram(spark, idx.path)
    assert h1 is h2, "second call must be a cache hit (no count job)"
    assert sum(h1.values()) == base.count()
    tag_before = ivf_content_tag(idx.path)
    # the adaptive entry point itself serves from the same cache
    probes = base.filter(F.col("vec_id") < 20)
    res1 = {
        (r.probe_id, r.rank): r.neighbor_id
        for r in idx.search_adaptive(probes, k=5).collect()
    }
    assert len(res1) > 0
    # append: new files land INSIDE existing cell subdirs
    idx.append(emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding", "label"))
    assert ivf_content_tag(idx.path) != tag_before
    h3 = ivf_cell_histogram(spark, idx.path)
    assert h3 is not h1
    assert sum(h3.values()) == emb.count()


# -- CorpusPipeline.append: increment == rebuild (round-10 verdict #7) --

def _md5_sig(text):
    """Pure-Python replica of the engine's md5 MinHash signature
    (minhash_sigs(hasher='md5')): distinct 3-word shingles, 8 perms of
    int(md5(f'{p}:{g}')[:15 hex], 16), min per perm."""
    import hashlib

    words = text.split(" ")
    sh = {" ".join(words[i : i + 3]) for i in range(max(len(words) - 2, 0))}
    return [
        min(
            int(hashlib.md5(f"{p}:{g}".encode()).hexdigest()[:15], 16)
            for g in sh
        )
        for p in range(8)
    ]


def _near(t1, t2, tau):
    """Band-match AND est_jaccard >= tau — the engine's pair criterion."""
    s1, s2 = _md5_sig(t1), _md5_sig(t2)
    banded = any(
        s1[2 * b] == s2[2 * b] and s1[2 * b + 1] == s2[2 * b + 1]
        for b in range(4)
    )
    est = round(sum(a == b for a, b in zip(s1, s2)) / 8.0, 4)
    return banded and est >= tau


def _craft_append_fixture(tau):
    """Search deterministic texts exercising every append subtlety:
    a chain X1~X2~X3 where X3 reaches X1's cluster ONLY through the
    removed doc X2; a bridge Z that merges the Y- and W-clusters; all
    groups vocab-disjoint. Premises are asserted with the Python md5
    replica, so a hashing change fails loudly, never silently."""
    for salt in range(500):
        xs = [f"x{salt}w{i}" for i in range(40)]
        x1 = " ".join(xs[0:24])
        x2 = " ".join(xs[8:32])
        x3 = " ".join(xs[16:40])
        ys = [f"y{salt}w{i}" for i in range(24)]
        vs = [f"v{salt}w{i}" for i in range(24)]
        y, w = " ".join(ys), " ".join(vs)
        z = " ".join(ys[0:16] + vs[0:16])
        if (
            _near(x1, x2, tau)
            and _near(x2, x3, tau)
            and not _near(x1, x3, tau)
            and _near(z, y, tau)
            and _near(z, w, tau)
            and not _near(y, w, tau)
            and not any(_near(z, t, tau) for t in (x1, x2, x3))
        ):
            return x1, x2, x3, y, w, z
    raise AssertionError("no salt satisfied the append-fixture premises")


def test_corpus_pipeline_append_equals_rebuild_md5(spark, tmp_path):
    """append(delta) == rebuild(corpus ∪ delta) on the indexed
    (vec_id, embedding) set — both-direction exceptAll — including the
    through-a-removed-doc join and the cluster-merge demotion."""
    from cloudvectordb_spark.api import CorpusPipeline

    TAU = 0.25
    x1, x2, x3, y, w, z = _craft_append_fixture(TAU)
    uniq = lambda g: " ".join(f"{g}w{i}" for i in range(24))  # noqa: E731
    corpus_rows = [
        (0, uniq("u0")), (1, x1), (2, x2),       # {1,2}: canon 1, 2 removed
        (3, y), (4, y),                          # {3,4}: canon 3
        (5, w), (6, w),                          # {5,6}: canon 5
        (7, uniq("u7")),
    ]
    delta_rows = [
        (10, x3),            # joins cluster {1,2} ONLY via removed doc 2
        (11, z),             # bridges clusters of 3 and 5 -> 5 demoted
        (12, uniq("n")), (13, uniq("n")),        # delta-internal dup
        (14, uniq("u14")),
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, schema="doc_id long, text string"
    )
    out_run = CorpusPipeline.run(
        spark, mk(corpus_rows), str(tmp_path / "inc"), tau=TAU, hasher="md5"
    )
    assert out_run["survivors"] == 5  # 0,1,3,5,7
    out_app = CorpusPipeline.append(spark, str(tmp_path / "inc"), mk(delta_rows))
    assert out_app["removed"] == 3      # 10, 11, 13
    assert out_app["survivors"] == 2    # 12, 14
    assert out_app["demoted"] == 1      # 5 loses to 3 in the merge
    assert out_app["indexed"] == 6      # {0,1,3,7,12,14}

    out_reb = CorpusPipeline.run(
        spark,
        mk(corpus_rows + delta_rows),
        str(tmp_path / "reb"),
        tau=TAU,
        hasher="md5",
    )
    a = out_app["index"].vectors.select("vec_id", "embedding")
    b = out_reb["index"].vectors.select("vec_id", "embedding")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert {r.vec_id for r in a.collect()} == {0, 1, 3, 7, 12, 14}


def test_vector_index_snapshot_isolates_readers_from_demotion(spark, tmp_path):
    """A pinned snapshot keeps serving the exact pre-append state while
    CorpusPipeline.append demotes a canonical IN PLACE (cell rewrite
    deletes the live files a naive reader would still reference)."""
    import os

    from cloudvectordb_spark.api import CorpusPipeline

    TAU = 0.25
    x1, x2, x3, y, w, z = _craft_append_fixture(TAU)
    uniq = lambda g: " ".join(f"{g}w{i}" for i in range(24))  # noqa: E731
    corpus_rows = [
        (0, uniq("u0")), (1, x1), (2, x2),
        (3, y), (4, y),
        (5, w), (6, w),
        (7, uniq("u7")),
    ]
    delta_rows = [(10, x3), (11, z), (12, uniq("n")), (13, uniq("n")),
                  (14, uniq("u14"))]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, schema="doc_id long, text string"
    )
    out_run = CorpusPipeline.run(
        spark, mk(corpus_rows), str(tmp_path / "inc"), tau=TAU, hasher="md5"
    )
    live = out_run["index"]
    snap = live.snapshot(str(tmp_path / "snap"))
    pre = {(r.vec_id, tuple(r.embedding)) for r in live.vectors.collect()}
    assert {v for v, _ in pre} == {0, 1, 3, 5, 7}

    out_app = CorpusPipeline.append(
        spark, str(tmp_path / "inc"), mk(delta_rows)
    )
    assert out_app["demoted"] == 1  # vec 5's cell was REWRITTEN in place

    live_ids = {r.vec_id for r in live.vectors.collect()}
    assert 5 not in live_ids and {12, 14} <= live_ids
    # the snapshot's links outlive the live rewrite: content exact
    snap_rows = {(r.vec_id, tuple(r.embedding)) for r in snap.vectors.collect()}
    assert snap_rows == pre
    # and it still SEARCHES the demoted vector
    emb5 = [float(x) for x in dict(pre)[5]]
    probe = spark.createDataFrame(
        [(999, emb5)], schema="vec_id long, embedding array<float>"
    )
    got = {
        r.neighbor_id
        for r in snap.search(probe, k=1, nprobe=len(snap.centroids())).collect()
        if r.rank == 1
    }
    assert got == {5}
    # a post-append snapshot never carries writer fencing state, but
    # DOES carry the dedup_state sidecar (it doubles as a restore point)
    snap2 = live.snapshot(str(tmp_path / "snap2"))
    assert not os.path.isdir(os.path.join(snap2.path, "leases"))
    assert os.path.exists(
        os.path.join(snap2.path, "dedup_state", "meta.json")
    )
    # restore-point semantics: a fresh append onto the snapshot copy
    # produces the same contents as the append onto the live index did
    out_app2 = CorpusPipeline.append(
        spark, str(tmp_path / "snap"), mk(delta_rows)
    )
    a = out_app2["index"].vectors.select("vec_id", "embedding")
    b = live.vectors.select("vec_id", "embedding")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_corpus_pipeline_append_safe_restores_on_failure(
    spark, tmp_path, monkeypatch
):
    """safe=True append is crash-atomic: a failure injected AFTER the
    demotion rewrite (the index is already mutated) rolls the whole
    root back to the exact pre-append state, and the retry succeeds
    with rebuild-equal results."""
    import os

    import pytest

    from cloudvectordb_spark.api import CorpusPipeline

    TAU = 0.25
    x1, x2, x3, y, w, z = _craft_append_fixture(TAU)
    uniq = lambda g: " ".join(f"{g}w{i}" for i in range(24))  # noqa: E731
    corpus_rows = [
        (0, uniq("u0")), (1, x1), (2, x2),
        (3, y), (4, y),
        (5, w), (6, w),
        (7, uniq("u7")),
    ]
    delta_rows = [(10, x3), (11, z), (12, uniq("n")), (13, uniq("n")),
                  (14, uniq("u14"))]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, schema="doc_id long, text string"
    )
    inc = str(tmp_path / "inc")
    out_run = CorpusPipeline.run(
        spark, mk(corpus_rows), inc, tau=TAU, hasher="md5"
    )
    live = out_run["index"]
    pre_vec = {(r.vec_id, tuple(r.embedding)) for r in live.vectors.collect()}
    pre_meta = CorpusPipeline._read_state_meta(inc)
    pre_sigs = spark.read.parquet(f"{inc}/dedup_state/sigs").count()

    real = CorpusPipeline._remove_from_index

    def boom(spark_, path_, ids_):
        real(spark_, path_, ids_)  # the demotion rewrite HAS happened
        raise RuntimeError("injected crash after demotion")

    monkeypatch.setattr(
        CorpusPipeline, "_remove_from_index", staticmethod(boom)
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        CorpusPipeline.append(spark, inc, mk(delta_rows), safe=True)
    monkeypatch.setattr(
        CorpusPipeline, "_remove_from_index", staticmethod(real)
    )

    # rolled back to the exact pre-append state: vectors, sigs, meta
    assert {
        (r.vec_id, tuple(r.embedding)) for r in live.vectors.collect()
    } == pre_vec
    assert CorpusPipeline._read_state_meta(inc) == pre_meta
    assert spark.read.parquet(f"{inc}/dedup_state/sigs").count() == pre_sigs
    # no snapshot/restore litter left behind
    litter = [
        d for d in os.listdir(tmp_path)
        if ".pre_append" in d or ".broken" in d
    ]
    assert litter == []

    # the retry just works and equals the rebuild
    out_app = CorpusPipeline.append(spark, inc, mk(delta_rows), safe=True)
    assert out_app["demoted"] == 1
    out_reb = CorpusPipeline.run(
        spark, mk(corpus_rows + delta_rows), str(tmp_path / "reb"),
        tau=TAU, hasher="md5",
    )
    a = out_app["index"].vectors.select("vec_id", "embedding")
    b = out_reb["index"].vectors.select("vec_id", "embedding")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_corpus_pipeline_append_safe_fenced_never_restores(
    spark, tmp_path, monkeypatch
):
    """The fencing⊃rollback interaction: when a NEWER epoch appears
    mid-append (a successor writer took over the root), the fenced
    writer must die with CommitConflict WITHOUT swapping its pre-append
    snapshot back — restoring would silently revert whatever the
    successor commits. The snapshot is deleted (it is no longer a valid
    restore point for anyone) and the live tree is left exactly as the
    fence found it."""
    import os

    import pytest

    from cloudvectordb_spark.api import CorpusPipeline
    from cloudvectordb_spark.versioning import CommitConflict, acquire_lease

    TAU = 0.25
    x1, x2, x3, y, w, z = _craft_append_fixture(TAU)
    uniq = lambda g: " ".join(f"{g}w{i}" for i in range(24))  # noqa: E731
    corpus_rows = [
        (0, uniq("u0")), (1, x1), (2, x2),
        (3, y), (4, y),
        (5, w), (6, w),
    ]
    delta_rows = [(10, x3), (11, z), (12, uniq("n"))]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, schema="doc_id long, text string"
    )
    inc = str(tmp_path / "inc")
    out_run = CorpusPipeline.run(
        spark, mk(corpus_rows), inc, tau=TAU, hasher="md5"
    )
    live = out_run["index"]
    pre_vec = {r.vec_id for r in live.vectors.select("vec_id").collect()}

    real = CorpusPipeline._remove_from_index

    def usurp(spark_, path_, ids_):
        rows = real(spark_, path_, ids_)  # demotion rewrite HAS happened
        acquire_lease(inc, owner="successor")  # newer writer takes over
        return rows

    monkeypatch.setattr(
        CorpusPipeline, "_remove_from_index", staticmethod(usurp)
    )
    with pytest.raises(CommitConflict, match="fenced by newer epoch"):
        CorpusPipeline.append(spark, inc, mk(delta_rows), safe=True)

    # NOT rolled back: the demotion's removal is still visible (the
    # successor owns recovery), and no snapshot/broken litter remains
    post_vec = {r.vec_id for r in live.vectors.select("vec_id").collect()}
    assert post_vec != pre_vec and post_vec < pre_vec
    litter = [
        d for d in os.listdir(tmp_path)
        if ".pre_append" in d or ".broken" in d
    ]
    assert litter == []


def test_corpus_pipeline_append_safe_refuses_stale_snapshot(
    spark, tmp_path
):
    """A leftover .pre_append dir (hard-killed previous safe append) is
    the documented manual restore point: the next safe append must
    refuse with a clear error instead of destroying it or crashing
    later on the restore rename."""
    import os

    import pytest

    from cloudvectordb_spark.api import CorpusPipeline

    uniq = lambda g: " ".join(f"{g}w{i}" for i in range(24))  # noqa: E731
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, schema="doc_id long, text string"
    )
    inc = str(tmp_path / "inc")
    CorpusPipeline.run(
        spark, mk([(0, uniq("a")), (1, uniq("b"))]), inc,
        tau=0.25, hasher="md5",
    )
    stale = f"{inc}.pre_append424242"
    os.makedirs(stale)
    with open(os.path.join(stale, "marker"), "w") as f:
        f.write("restore point")
    with pytest.raises(RuntimeError, match="stale pre-append"):
        CorpusPipeline.append(
            spark, inc, mk([(10, uniq("c"))]), safe=True
        )
    # the restore point was NOT destroyed by the refusal
    assert os.path.exists(os.path.join(stale, "marker"))
    # after the operator clears it, the append proceeds normally
    import shutil

    shutil.rmtree(stale)
    out = CorpusPipeline.append(spark, inc, mk([(10, uniq("c"))]), safe=True)
    assert out["indexed"] == 3


def test_snapshot_ivf_index_skips_vanished_files(spark, tmp_path):
    """A file deleted between the walk and the hard-link (concurrent
    append/demotion rewriting a cell) is skipped, not a crash — and the
    copy2 fallback path tolerates the same race."""
    import os

    from cloudvectordb_spark.operators.pipeline import snapshot_ivf_index

    src = tmp_path / "idx"
    os.makedirs(src / "vectors")
    for i in range(4):
        with open(src / "vectors" / f"part-{i}.parquet", "w") as f:
            f.write(f"data{i}")

    victim = str(src / "vectors" / "part-2.parquet")
    real_link = os.link

    def racing_link(sp, dp, **kw):
        if sp == victim:
            os.remove(victim)  # writer deletes it just before our link
        return real_link(sp, dp, **kw)

    import unittest.mock as mock

    with mock.patch("os.link", side_effect=racing_link):
        n = snapshot_ivf_index(str(src), str(tmp_path / "snap"))
    assert n == 3
    got = sorted(os.listdir(tmp_path / "snap" / "vectors"))
    assert got == ["part-0.parquet", "part-1.parquet", "part-3.parquet"]


def test_corpus_pipeline_append_equals_rebuild_fast(spark, sf_dir, tmp_path):
    """Same equality on the fixture corpus with the production xxhash64
    hasher: split documents into corpus/delta by id, append the delta,
    compare against the joint rebuild."""
    from pyspark.sql import functions as F

    from cloudvectordb_spark.api import CorpusPipeline
    from cloudvectordb_spark.catalog import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 400)
    delta = docs.filter(F.col("doc_id") >= 400)
    out_run = CorpusPipeline.run(spark, corpus, str(tmp_path / "inc"), tau=0.5)
    out_app = CorpusPipeline.append(spark, str(tmp_path / "inc"), delta)
    out_reb = CorpusPipeline.run(spark, docs, str(tmp_path / "reb"), tau=0.5)
    assert out_app["indexed"] == out_reb["indexed"]
    a = out_app["index"].vectors.select("vec_id", "embedding")
    b = out_reb["index"].vectors.select("vec_id", "embedding")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # second append is rejected without fresh ids; state meta rolled
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fresh, distinct doc_ids"):
        CorpusPipeline.append(spark, str(tmp_path / "inc"), delta)
    # an index without run()'s state refuses with the remedy named
    from cloudvectordb_spark.api import VectorIndex

    emb = load(spark, sf_dir, "embeddings").limit(100)
    VectorIndex.build(spark, emb, str(tmp_path / "bare"), k=2)
    with _pytest.raises(FileNotFoundError, match="CorpusPipeline.run"):
        CorpusPipeline.append(spark, str(tmp_path / "bare"), delta)


def test_split_hot_cells_restores_balance_preserving_contents(spark, sf_dir, tmp_path):
    """The append->hot-cell lifecycle gap: build a small index, append
    a blob that lands in ONE frozen cell (making it hot), then split —
    contents preserved exactly, the hot cell gone, routing still exact,
    and the op deterministic across runs."""
    import numpy as np

    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load

    emb = load(spark, sf_dir, "embeddings")
    idx = VectorIndex.build(spark, emb, str(tmp_path / "ivf"), k=4)
    # a tight synthetic blob near one existing vector: frozen-centroid
    # append funnels every row into that vector's cell
    anchor = emb.filter(F.col("vec_id") == 0).first().embedding
    base_id = emb.agg(F.max("vec_id")).first()[0] + 1
    rng = np.random.default_rng(7)
    blob = [
        (
            int(base_id + i),
            [float(x + 1e-3 * rng.standard_normal()) for x in anchor],
        )
        for i in range(300)
    ]
    idx.append(
        spark.createDataFrame(blob, schema="vec_id long, embedding array<float>")
    )
    sizes = {
        r.centroid_id: r.n
        for r in idx.vectors.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    }
    mean = sum(sizes.values()) / len(sizes)
    assert max(sizes.values()) > 2.0 * mean, "fixture failed to create a hot cell"

    new_idx, stats = idx.split_hot_cells(str(tmp_path / "ivf_split"))
    assert stats["hot_cells_split"] >= 1
    # contents preserved exactly, one cell per vector
    a = idx.vectors.select("vec_id", "embedding")
    b = new_idx.vectors.select("vec_id", "embedding")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert (
        new_idx.vectors.select("vec_id").distinct().count()
        == new_idx.vectors.count()
    )
    # balance restored: no cell above the threshold that triggered us
    sizes2 = {
        r.centroid_id: r.n
        for r in new_idx.vectors.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    }
    assert max(sizes2.values()) < max(sizes.values())
    assert len(sizes2) == stats["cells_after"]
    # centroids table consistent with the layout
    cent_ids = {cid for cid, _ in new_idx.centroids()}
    assert set(sizes2) == cent_ids
    # serving still exact for a self-probe routed into a split cell
    probe_vec_id, probe_emb = blob[0]
    probe = spark.createDataFrame(
        [(probe_vec_id, probe_emb)], schema="vec_id long, embedding array<float>"
    )
    rows = new_idx.search(probe, k=3, nprobe=2).collect()
    # the blob clusters around vec 0's embedding, so the exact top-3 is
    # the anchor + blob members — all must come from that neighborhood
    ok_ids = {v for v, _ in blob} | {0}
    assert rows and all(r.neighbor_id in ok_ids for r in rows)
    # deterministic: a second split run publishes the identical layout
    idx2, stats2 = idx.split_hot_cells(str(tmp_path / "ivf_split2"))
    assert stats2["split_map"] == stats["split_map"]
    x = {(r.vec_id, r.centroid_id) for r in new_idx.vectors.collect()}
    y = {(r.vec_id, r.centroid_id) for r in idx2.vectors.collect()}
    assert x == y


def test_vector_index_delete_rewrites_only_touched_cells(spark, sf_dir, tmp_path):
    """Eager delete: exactly the named ids vanish, every other row
    survives byte-for-byte, untouched cell FILES are not rewritten,
    an emptied cell disappears from the layout, and search no longer
    returns the deleted ids."""
    import glob
    import os

    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load

    emb = load(spark, sf_dir, "embeddings")
    idx = VectorIndex.build(spark, emb, str(tmp_path / "ivf"), k=4)
    before = {(r.vec_id, r.centroid_id) for r in idx.vectors.collect()}
    by_cell: dict = {}
    for v, c in before:
        by_cell.setdefault(c, []).append(v)
    # victims: two ids from one cell + EVERY id of the smallest cell
    cells_by_size = sorted(by_cell, key=lambda c: len(by_cell[c]))
    small, big = cells_by_size[0], cells_by_size[-1]
    victims = set(by_cell[small]) | set(sorted(by_cell[big])[:2])
    untouched = [c for c in by_cell if c not in (small, big)]
    mtimes = {
        f: os.path.getmtime(f)
        for c in untouched
        for f in glob.glob(str(tmp_path / "ivf" / "vectors" / f"centroid_id={c}" / "*.parquet"))
    }

    n_cells_rewritten = idx.delete(sorted(victims))
    assert n_cells_rewritten == 2
    after = {(r.vec_id, r.centroid_id) for r in idx.vectors.collect()}
    assert after == {(v, c) for v, c in before if v not in victims}
    # the emptied cell's directory is gone
    assert not os.path.exists(
        str(tmp_path / "ivf" / "vectors" / f"centroid_id={small}")
    )
    # untouched cells were not rewritten (same files, same mtimes)
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m, f"untouched cell file rewritten: {f}"
    # search over all cells never returns a deleted id
    probes = emb.filter(F.col("vec_id").isin(list(victims)[:2]))
    hits = idx.search(probes, k=10, nprobe=4).collect()
    assert hits and not ({r.neighbor_id for r in hits} & victims)
    # deleting ids that are absent is a no-op
    assert idx.delete([10 ** 9]) == 0


def test_corpus_pipeline_append_fenced_by_newer_lease(spark, sf_dir, tmp_path):
    """Append is an in-place multi-dir mutation, so it must fence like
    the streaming writers: a stale generation's append dies with
    CommitConflict at its first fence; the live generation proceeds."""
    import pytest as _pytest

    from cloudvectordb_spark.api import CorpusPipeline
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.versioning import CommitConflict, acquire_lease

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    delta = docs.filter(F.col("doc_id") >= 300)
    CorpusPipeline.run(spark, corpus, str(tmp_path / "idx"), tau=0.5)

    stale = acquire_lease(str(tmp_path / "idx"), owner="append-gen1")
    live = acquire_lease(str(tmp_path / "idx"), owner="append-gen2")
    with _pytest.raises(CommitConflict, match="fenced by newer epoch"):
        CorpusPipeline.append(spark, str(tmp_path / "idx"), delta, lease=stale)
    out = CorpusPipeline.append(spark, str(tmp_path / "idx"), delta, lease=live)
    assert out["indexed"] > 0 and out["delta"] == delta.count()
    # default path (no explicit lease) self-acquires and still works
    delta2 = spark.createDataFrame(
        [(10_000, "completely fresh words only here")],
        "doc_id long, text string",
    )
    out2 = CorpusPipeline.append(spark, str(tmp_path / "idx"), delta2)
    assert out2["survivors"] == 1


def test_corpus_pipeline_lifecycle_chain_survives_split(spark, sf_dir, tmp_path):
    """The lifecycle pieces must COMPOSE: run -> append -> split (new
    path, state sidecar carried) -> append again on the split index ==
    one rebuild over everything, on the indexed (vec_id, embedding)
    set. This is what caught split/compact dropping dedup_state."""
    from cloudvectordb_spark.api import CorpusPipeline, VectorIndex
    from cloudvectordb_spark.catalog import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 200)
    d1 = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 350))
    d2 = docs.filter(F.col("doc_id") >= 350)

    CorpusPipeline.run(spark, corpus, str(tmp_path / "idx"), tau=0.5)
    CorpusPipeline.append(spark, str(tmp_path / "idx"), d1)
    idx = VectorIndex.open(spark, str(tmp_path / "idx"))
    # force at least one split so the chain genuinely crosses a re-layout
    split_idx, stats = idx.split_hot_cells(
        str(tmp_path / "idx_split"), factor=1.0
    )
    assert stats["hot_cells_split"] >= 1
    out = CorpusPipeline.append(spark, str(tmp_path / "idx_split"), d2)
    assert out["survivors"] > 0

    reb = CorpusPipeline.run(spark, docs, str(tmp_path / "reb"), tau=0.5)
    a = out["index"].vectors.select("vec_id", "embedding")
    b = reb["index"].vectors.select("vec_id", "embedding")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # compaction carries the state too: append still works afterwards
    comp_idx = out["index"].compact(str(tmp_path / "idx_compact"))
    n_compacted = comp_idx.vectors.count()  # BEFORE the append mutates it
    extra = spark.createDataFrame(
        [(99_000, "entirely novel vocabulary sentence")],
        "doc_id long, text string",
    )
    out2 = CorpusPipeline.append(spark, str(tmp_path / "idx_compact"), extra)
    assert out2["survivors"] == 1 and out2["indexed"] == n_compacted + 1


def test_corpus_pipeline_run_sharded_equals_unsharded(spark, sf_dir, tmp_path):
    """Fleet build: global dedup -> md5-split survivors -> S shard
    indexes. Union of shard contents == the unsharded run's index,
    shards disjoint, and full-coverage scatter-gather search == the
    unsharded exact top-k."""
    from cloudvectordb_spark.api import CorpusPipeline, VectorIndex
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.vector_ops import exact_knn

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out_s = CorpusPipeline.run_sharded(
        spark, docs, [str(tmp_path / f"s{i}") for i in range(2)], tau=0.5
    )
    out_u = CorpusPipeline.run(spark, docs, str(tmp_path / "mono"), tau=0.5)
    assert out_s["survivors"] == out_u["survivors"]
    assert out_s["indexed"] == out_u["indexed"] == sum(out_s["shard_rows"])

    union = out_s["shards"][0].vectors.select("vec_id", "embedding").unionByName(
        out_s["shards"][1].vectors.select("vec_id", "embedding")
    )
    mono = out_u["index"].vectors.select("vec_id", "embedding")
    assert union.exceptAll(mono).count() == 0
    assert mono.exceptAll(union).count() == 0
    a = {r.vec_id for r in out_s["shards"][0].vectors.select("vec_id").collect()}
    b = {r.vec_id for r in out_s["shards"][1].vectors.select("vec_id").collect()}
    assert not (a & b) and a and b  # disjoint, both non-empty

    # full-coverage sharded search == exact top-k over all survivors
    probes = union.orderBy("vec_id").limit(3)
    probes = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in probes.collect()],
        schema="vec_id long, embedding array<float>",
    )
    max_k = max(len(s.centroids()) for s in out_s["shards"])
    got = {
        (r.probe_id, r.rank): r.neighbor_id
        for r in VectorIndex.search_sharded(
            out_s["shards"], probes, k=5, nprobe=max_k
        ).collect()
    }
    want = {
        (r.probe_id, r.rank): r.neighbor_id
        for r in exact_knn(union, probes, k=5).collect()
    }
    assert got == want and len(got) == 15


def test_hybrid_index_facade_matches_registered_query(spark, sf_dir):
    """HybridIndex.search_batch with full cell coverage (vector leg
    exact) must reproduce the registered hybrid_rrf_batch bit-for-bit
    on the same query batch."""
    from cloudvectordb_spark.api import HybridIndex, TextIndex, VectorIndex
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.pipeline import ensure_ivf_index
    from cloudvectordb_spark.operators.search import _BATCH_QUERIES, hybrid_rrf_batch

    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents")
    hi = HybridIndex(
        TextIndex.open(spark, sf_dir),
        VectorIndex.open(spark, ensure_ivf_index(spark, sf_dir)),
    )
    # the registered query's vector leg is exact over corpus-joined
    # embeddings; full nprobe coverage makes the facade's leg exact too
    probes = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    ).filter(F.col("vec_id").isin([qid for qid, _ in _BATCH_QUERIES]))
    n_cells = len(hi.vectors.centroids())
    got = {
        tuple(r)
        for r in hi.search_batch(
            _BATCH_QUERIES, probes, k=10, leg_n=60, nprobe=n_cells
        ).collect()
    }
    want = {tuple(r) for r in hybrid_rrf_batch(spark, sf_dir).collect()}
    assert got == want and len(got) > 0


def test_hybrid_index_sharded_vector_leg_matches_monolithic(
    spark, sf_dir, tmp_path
):
    """HybridIndex with a LIST of vector shards (fleet topology) must
    reproduce the registered hybrid_rrf_batch bit-for-bit when each
    shard is probed at full cell coverage (sharded exact == mono
    exact, and the fusion is shard-agnostic)."""
    from cloudvectordb_spark.api import HybridIndex, TextIndex, VectorIndex
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.search import (
        _BATCH_QUERIES,
        hybrid_rrf_batch,
    )

    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents")
    corpus = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    shard_of = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(2),
    )
    shards = [
        VectorIndex.build(
            spark,
            corpus.withColumn("_s", shard_of).filter(F.col("_s") == i).drop("_s"),
            str(tmp_path / f"hs{i}"),
            k=4,
        )
        for i in range(2)
    ]
    hi = HybridIndex(TextIndex.open(spark, sf_dir), shards)
    probes = corpus.filter(
        F.col("vec_id").isin([qid for qid, _ in _BATCH_QUERIES])
    )
    got = {
        tuple(r)
        for r in hi.search_batch(
            _BATCH_QUERIES, probes, k=10, leg_n=60, nprobe=4
        ).collect()
    }
    want = {tuple(r) for r in hybrid_rrf_batch(spark, sf_dir).collect()}
    assert got == want and len(got) > 0


def test_text_index_search_sharded_shard_count_invariance(spark, sf_dir):
    """Sharded BM25 under merged global stats is score-exact and the
    k*S merge is lossless, so the result must be IDENTICAL for any
    shard count — including S=1 — and identical to the monolithic
    batch path (same scores, same tiebreaks, same ranks)."""
    from cloudvectordb_spark.api import TextIndex
    from cloudvectordb_spark.operators.search import (
        _BATCH_QUERIES,
        bm25_batch_topk,
    )

    want = {tuple(r) for r in bm25_batch_topk(spark, sf_dir).collect()}
    idx = TextIndex.open(spark, sf_dir)
    for s in (1, 2, 3):
        got = {
            tuple(r)
            for r in idx.search_sharded(_BATCH_QUERIES, k=10, n_shards=s)
            .select("query_id", "doc_id", "bm25", "rank")
            .collect()
        }
        assert got == want, f"shard count {s} diverged"
    # concurrent and sequential fan-outs agree (merge order-insensitive)
    seq = {
        tuple(r)
        for r in idx.search_sharded(
            _BATCH_QUERIES, k=10, n_shards=2, concurrent=False
        )
        .select("query_id", "doc_id", "bm25", "rank")
        .collect()
    }
    assert seq == want


def test_text_index_sharded_stats_merge_is_exact(spark, sf_dir):
    """The mergeable-stats algebra behind sharded serving: summed
    per-shard (n_docs, dl_sum, df) must reproduce the monolithic
    artifact's integers exactly, and the merged avgdl must be
    bit-equal to the monolithic one (exact bigint sums, one float
    division)."""
    from cloudvectordb_spark.operators.search import (
        sharded_text_frames,
        text_index_frames,
    )

    _, _, stats, term_meta = text_index_frames(spark, sf_dir)
    mono = stats.collect()[0]
    shards = sharded_text_frames(spark, sf_dir, 3)
    assert sum(int(s.n_docs) for _, _, s, _ in shards) == int(mono.n_docs)
    assert sum(int(s.dl_sum) for _, _, s, _ in shards) == int(mono.dl_sum)
    merged_avgdl = sum(int(s.dl_sum) for _, _, s, _ in shards) / sum(
        int(s.n_docs) for _, _, s, _ in shards
    )
    assert merged_avgdl == float(mono.avgdl)  # bit-equal, not approx
    # per-term df merges by exact sum
    mono_df = {r.term: r.df for r in term_meta.select("term", "df").collect()}
    merged_df: dict = {}
    for _, _, _, tm in shards:
        for r in tm.select("term", "df").collect():
            merged_df[r.term] = merged_df.get(r.term, 0) + r.df
    assert merged_df == mono_df


def test_hybrid_index_fully_sharded_matches_monolithic(
    spark, sf_dir, tmp_path
):
    """BOTH legs fleet-topology: 2 vector shards AND 2 text shards.
    The text leg is score-exact under merged stats and the vector leg
    is exact at full cell coverage, so the fully-sharded hybrid must
    reproduce the registered hybrid_rrf_batch bit-for-bit."""
    from cloudvectordb_spark.api import HybridIndex, TextIndex, VectorIndex
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.search import (
        _BATCH_QUERIES,
        hybrid_rrf_batch,
    )

    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents")
    corpus = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    shard_of = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(2),
    )
    shards = [
        VectorIndex.build(
            spark,
            corpus.withColumn("_s", shard_of).filter(F.col("_s") == i).drop("_s"),
            str(tmp_path / f"fhs{i}"),
            k=4,
        )
        for i in range(2)
    ]
    hi = HybridIndex(TextIndex.open(spark, sf_dir), shards, text_shards=2)
    probes = corpus.filter(
        F.col("vec_id").isin([qid for qid, _ in _BATCH_QUERIES])
    )
    got = {
        tuple(r)
        for r in hi.search_batch(
            _BATCH_QUERIES, probes, k=10, leg_n=60, nprobe=4
        ).collect()
    }
    want = {tuple(r) for r in hybrid_rrf_batch(spark, sf_dir).collect()}
    assert got == want and len(got) > 0


def test_corpus_pipeline_append_sharded_equals_rebuild(spark, sf_dir, tmp_path):
    """Fleet increment == fleet rebuild: ONE global delta dedup, then
    survivors route to their md5 shard and demoted canonicals are
    removed from whichever shard holds them — union-of-shards contents
    equal the joint run_sharded's, both directions."""
    import pytest as _pytest

    from cloudvectordb_spark.api import CorpusPipeline
    from cloudvectordb_spark.catalog import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 400)
    delta = docs.filter(F.col("doc_id") >= 400)

    paths = [str(tmp_path / f"s{i}") for i in range(2)]
    CorpusPipeline.run_sharded(spark, corpus, paths, tau=0.5)
    out = CorpusPipeline.append_sharded(spark, paths, delta)
    assert out["delta"] == delta.count() and out["survivors"] > 0

    reb_paths = [str(tmp_path / f"r{i}") for i in range(2)]
    reb = CorpusPipeline.run_sharded(spark, docs, reb_paths, tau=0.5)

    def union_of(shards):
        u = shards[0].vectors.select("vec_id", "embedding")
        for s in shards[1:]:
            u = u.unionByName(s.vectors.select("vec_id", "embedding"))
        return u

    a, b = union_of(out["shards"]), union_of(reb["shards"])
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # per-shard contents match too (same md5 routing on both sides)
    for s in range(2):
        x = out["shards"][s].vectors.select("vec_id")
        y = reb["shards"][s].vectors.select("vec_id")
        assert x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0
    # shard-count mismatch is rejected before any mutation
    with _pytest.raises(ValueError, match="md5 routing"):
        CorpusPipeline.append_sharded(spark, paths + [str(tmp_path / "s2")], delta)
