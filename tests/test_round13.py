"""Round-13 ADVICE fixes: maintained-counter parity for direct
VectorIndex.append, fenced n_indexed RMW, strict l0 validation,
vacuum failed-delete accounting, sig-cache in-place-rewrite staleness.
"""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


def _uniq(g: str) -> str:
    return " ".join(f"{g}w{i}" for i in range(24))


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def _build_pipeline(spark, tmp_path, name="cp"):
    from cloudvectordb_spark.api import CorpusPipeline

    rows = [(i, _uniq(f"u{i}")) for i in range(8)]
    out = CorpusPipeline.run(
        spark, _mk_docs(spark, rows), str(tmp_path / name), tau=0.25
    )
    return out


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, "dedup_state", "meta.json")) as f:
        return json.load(f)


def test_direct_append_maintains_counter(spark, tmp_path):
    """A direct VectorIndex.append on a CorpusPipeline root bumps the
    maintained n_indexed (ADVICE item 1 — delete got the decrement in
    round 12, append did not), so a later pipeline append's handoff
    arithmetic and the verify="full" physical recount both agree."""
    from cloudvectordb_spark.api import CorpusPipeline, VectorIndex

    out = _build_pipeline(spark, tmp_path)
    idx = out["index"]
    before = _read_meta(idx.path)["n_indexed"]
    assert before == out["indexed"]

    dim = len(idx.vectors.select("embedding").first().embedding)
    new = spark.createDataFrame(
        [(1000 + i, [float(i)] + [0.5] * (dim - 1)) for i in range(5)],
        schema="vec_id long, embedding array<float>",
    )
    idx.append(new)
    after = _read_meta(idx.path)["n_indexed"]
    assert after == before + 5

    # the physical recount agrees with the maintained counter — the
    # exact invariant the silent divergence used to break
    delta_rows = [(2000, _uniq("d0")), (2001, _uniq("d1"))]
    res = CorpusPipeline.append(
        spark, idx.path, _mk_docs(spark, delta_rows), verify="full"
    )
    assert res["indexed"] == after + 2

    # internal writers opt out: maintain_counter=False leaves the
    # counter alone (the pipeline commits the final count itself)
    before2 = _read_meta(idx.path)["n_indexed"]
    new2 = new.select(
        (F.col("vec_id") + 100).alias("vec_id"), "embedding"
    )
    idx.append(new2, maintain_counter=False)
    assert _read_meta(idx.path)["n_indexed"] == before2


def test_delete_decrement_is_fenced(spark, tmp_path):
    """The n_indexed RMW raises CommitConflict (after writing, loudly)
    when a successor epoch appears mid-update (ADVICE item 2), instead
    of silently racing a live append's meta commit."""
    from cloudvectordb_spark.versioning import CommitConflict, acquire_lease

    out = _build_pipeline(spark, tmp_path)
    idx = out["index"]
    lease = acquire_lease(idx.path, owner="test-writer")
    acquire_lease(idx.path, owner="test-successor")  # fences `lease`
    before = _read_meta(idx.path)["n_indexed"]
    with pytest.raises(CommitConflict, match="verify='full'"):
        idx._bump_n_indexed(-2, lease)
    # the write happened (loud, not lost) — the conflict tells the
    # caller the value may be stale, it does not roll it back
    assert _read_meta(idx.path)["n_indexed"] == before - 2

    # an unfenced delete (newest epoch is ours) works end to end
    victim = int(idx.vectors.select("vec_id").first().vec_id)
    n = _read_meta(idx.path)["n_indexed"]
    idx.delete([victim])
    assert _read_meta(idx.path)["n_indexed"] == n - 1


def test_append_l0_param_validated(spark, sf_dir, tmp_path):
    """l0 accepts only True/False/'auto' — a truthy typo like 'false'
    must raise, not silently route to the L0 tier (ADVICE item 3)."""
    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.pipeline import append_to_ivf_index

    emb = load(spark, sf_dir, "embeddings")
    idx = VectorIndex.build(spark, emb, str(tmp_path / "ivf"), k=4)
    delta = emb.select((F.col("vec_id") + 10**6).alias("vec_id"), "embedding")
    for bad in ("false", "none", "true", 1, 0):
        with pytest.raises(ValueError, match="l0 must be"):
            append_to_ivf_index(delta, idx.path, l0=bad)


def test_vacuum_reports_failed_deletes(spark, tmp_path, monkeypatch):
    """A root that survives rmtree (permissions, concurrent recreate)
    lands in delete_failed with ZERO bytes counted as reclaimed —
    never under `deleted` (ADVICE item 4)."""
    import shutil as _shutil
    import time

    from cloudvectordb_spark.operators.pipeline import vacuum_ivf_layouts

    fam = tmp_path / "fam"
    for i, name in enumerate(["live", "old1", "old2"]):
        v = fam / name / "vectors"
        v.mkdir(parents=True)
        (v / "part-0.parquet").write_bytes(b"x" * 100)
        t = 1_700_000_000 + i
        os.utime(v, (t, t))
        time.sleep(0)

    real_rmtree = _shutil.rmtree
    monkeypatch.setattr(_shutil, "rmtree", lambda *a, **k: None)
    res = vacuum_ivf_layouts(str(fam), str(fam / "live"), keep=0)
    assert res["deleted"] == []
    assert sorted(res["delete_failed"]) == [
        str(fam / "old1"), str(fam / "old2")
    ]
    assert res["bytes_reclaimed"] == 0 and res["files_deleted"] == 0

    monkeypatch.setattr(_shutil, "rmtree", real_rmtree)
    res2 = vacuum_ivf_layouts(str(fam), str(fam / "live"), keep=0)
    assert sorted(res2["deleted"]) == [str(fam / "old1"), str(fam / "old2")]
    assert res2["delete_failed"] == []
    assert res2["bytes_reclaimed"] == 200 and res2["files_deleted"] == 2


def test_sigs_cache_detects_inplace_rewrite(spark, tmp_path):
    """An in-place rewrite of a sigs file that PRESERVES its basename
    (external restore tooling) must roll the cache — the fingerprint
    includes size+mtime_ns, not names alone (ADVICE item 5)."""
    import glob

    from cloudvectordb_spark.api import CorpusPipeline, _corpus_sigs_cached

    out = _build_pipeline(spark, tmp_path)
    sd = CorpusPipeline._state_dir(out["index"].path)
    s1, b1 = _corpus_sigs_cached(spark, sd)
    s2, b2 = _corpus_sigs_cached(spark, sd)
    assert s1 is s2 and b1 is b2  # clean hit while files unchanged

    f = sorted(glob.glob(os.path.join(sd, "sigs", "*.parquet")))[0]
    data = open(f, "rb").read()
    with open(f, "wb") as fh:  # same name, same bytes, new mtime
        fh.write(data)
    s3, _b3 = _corpus_sigs_cached(spark, sd)
    assert s3 is not s1, "stale sig generation served after rewrite"


def _perturb(text: str) -> str:
    words = text.split(" ")
    words[len(words) // 2] = "zz"
    return " ".join(words)


def test_between_state_parity_and_pruning(spark, tmp_path):
    """minhash_pairs_between_state (bucket-pruned, generation-rolled)
    returns the EXACT pair set of the classic minhash_pairs_between on
    the same state — with pruning active (small delta, n_new set) and
    inactive (n_new=None). Bucket pruning can only remove rows that
    cannot equi-join, so any divergence is a routing bug."""
    from cloudvectordb_spark.api import CorpusPipeline
    from cloudvectordb_spark.operators.dedup import (
        minhash_pairs_between,
        minhash_pairs_between_state,
        minhash_sigs,
    )
    from cloudvectordb_spark.operators.sigstate import corpus_sig_state

    rows = [(i, _uniq(f"u{i}")) for i in range(20)]
    CorpusPipeline.run(spark, _mk_docs(spark, rows), str(tmp_path / "cp"))
    sd = CorpusPipeline._state_dir(str(tmp_path / "cp"))
    state = corpus_sig_state(spark, sd)

    # delta: 3 near-dups of corpus docs + 2 unique
    delta_rows = [
        (100, _perturb(_uniq("u3"))),
        (101, _perturb(_uniq("u7"))),
        (102, _uniq("u11")),
        (103, _uniq("x103")),
        (104, _uniq("x104")),
    ]
    sigs_delta = minhash_sigs(_mk_docs(spark, delta_rows))

    def pairs_set(df):
        return {
            (r.new_id, r.corpus_id, r.est_jaccard) for r in df.collect()
        }

    classic = pairs_set(minhash_pairs_between(sigs_delta, state.sigs()))
    pruned = pairs_set(
        minhash_pairs_between_state(sigs_delta, state, n_new=len(delta_rows))
    )
    unpruned = pairs_set(minhash_pairs_between_state(sigs_delta, state))
    assert classic == pruned == unpruned
    assert {(n, c) for n, c, _ in classic} >= {(100, 3), (101, 7), (102, 11)}


def test_l0_cost_based_admission(spark, sf_dir, tmp_path, monkeypatch):
    """The auto rule reasons in rows-per-created-file: a delta whose
    partitioned write would scatter near-empty files takes L0 even
    above the old 32-rows/cell ratio (the 100M decade's 537 s cliff:
    41 rows/cell went partitioned); a well-filled delta still goes
    partitioned; a bulk load never parks in L0."""
    import glob

    import cloudvectordb_spark.operators.pipeline as pl
    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load

    emb = load(spark, sf_dir, "embeddings")
    idx = VectorIndex.build(spark, emb, str(tmp_path / "ivf"), k=8)
    n_cells = len(idx.centroids())

    # the decade-cliff shape in miniature: fill ≈ 41 rows/file — must
    # route to L0 under the cost rule (old rule: partitioned)
    monkeypatch.setattr(pl, "_L0_MAX_TIER_ROWS", 10**6)
    delta = emb.limit(41 * n_cells).select(
        (F.col("vec_id") + 10**6).alias("vec_id"), "embedding"
    )
    pl.append_to_ivf_index(delta, idx.path)
    assert glob.glob(str(tmp_path / "ivf" / "vectors_delta" / "*.parquet"))

    # a bulk load (> _L0_MAX_TIER_ROWS) goes partitioned regardless
    monkeypatch.setattr(pl, "_L0_MAX_TIER_ROWS", 10)
    tier_before = len(
        glob.glob(str(tmp_path / "ivf" / "vectors_delta" / "*.parquet"))
    )
    bulk = emb.limit(41 * n_cells).select(
        (F.col("vec_id") + 2 * 10**6).alias("vec_id"), "embedding"
    )
    pl.append_to_ivf_index(bulk, idx.path)
    assert (
        len(glob.glob(str(tmp_path / "ivf" / "vectors_delta" / "*.parquet")))
        == tier_before
    )


def test_l0_auto_fold_and_crash_recovery(spark, sf_dir, tmp_path, monkeypatch):
    """The tier folds into the cells once it passes the scan-tax
    budget — contents exact — and a crashed fold heals from every
    failure point (pre-write, committed-unmarked, mid-commit)."""
    import os
    import shutil

    import cloudvectordb_spark.operators.pipeline as pl
    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load

    emb = load(spark, sf_dir, "embeddings")
    idx = VectorIndex.build(spark, emb, str(tmp_path / "ivf"), k=4)
    monkeypatch.setattr(pl, "_l0_fold_budget", lambda k: 30)
    d1 = emb.limit(20).select((F.col("vec_id") + 10**6).alias("vec_id"), "embedding")
    pl.append_to_ivf_index(d1, idx.path, l0=True)
    assert os.path.isdir(str(tmp_path / "ivf" / "vectors_delta"))
    expect = {r.vec_id for r in idx.vectors.select("vec_id").collect()}
    d2 = emb.limit(20).select((F.col("vec_id") + 2 * 10**6).alias("vec_id"), "embedding")
    pl.append_to_ivf_index(d2, idx.path, l0=True)  # 40 > 30 → auto-fold
    assert not os.path.isdir(str(tmp_path / "ivf" / "vectors_delta"))
    got = {r.vec_id for r in idx.vectors.select("vec_id").collect()}
    assert got == expect | {int(r.vec_id) for r in d2.collect()}
    assert idx.vectors.count() == idx.vectors.select("vec_id").distinct().count()

    # crash recovery, all three failure points
    delta_dir = str(tmp_path / "ivf" / "vectors_delta")
    staging = str(tmp_path / "ivf" / "vectors_delta.folding")
    d3 = emb.limit(10).select((F.col("vec_id") + 3 * 10**6).alias("vec_id"), "embedding")
    pl.append_to_ivf_index(d3, idx.path, l0=True)
    n_all = idx.vectors.count()

    # (a) crash BEFORE the write: staging exists, no rows in cells
    os.rename(delta_dir, staging)
    assert pl.recover_l0_fold(spark, idx.path) == "restored"
    assert os.path.isdir(delta_dir) and idx.vectors.count() == n_all

    # (b) crash AFTER the write committed but BEFORE the marker: the
    # audit finds every staged id already in the cells → drop staging
    folded = pl.fold_l0_tier(spark, idx.path)
    assert folded == 10
    d4 = emb.limit(10).select((F.col("vec_id") + 4 * 10**6).alias("vec_id"), "embedding")
    pl.append_to_ivf_index(d4, idx.path, l0=True)
    os.rename(delta_dir, staging)
    base_t = dict(spark.read.parquet(f"{idx.path}/vectors").dtypes)["centroid_id"]
    (
        spark.read.parquet(staging)
        .withColumn("centroid_id", F.col("centroid_id").cast(base_t))
        .write.mode("append").partitionBy("centroid_id")
        .parquet(f"{idx.path}/vectors")
    )
    assert pl.recover_l0_fold(spark, idx.path) == "committed"
    assert not os.path.isdir(staging)
    n_now = idx.vectors.count()
    assert n_now == idx.vectors.select("vec_id").distinct().count()

    # (b2) marker present: staging drops without any audit job
    os.makedirs(staging)
    with open(os.path.join(staging, "_COMMITTED"), "w") as f:
        f.write("folded")
    assert pl.recover_l0_fold(spark, idx.path) == "committed"
    assert not os.path.isdir(staging)

    # (c) mid-commit: SOME staged rows reached the cells — the audit
    # removes the partial copies and restores the tier intact
    d5 = emb.limit(10).select((F.col("vec_id") + 5 * 10**6).alias("vec_id"), "embedding")
    pl.append_to_ivf_index(d5, idx.path, l0=True)
    os.rename(delta_dir, staging)
    partial = [int(r.vec_id) for r in spark.read.parquet(staging).limit(3).collect()]
    half = spark.read.parquet(staging).filter(F.col("vec_id").isin(partial))
    base_t = dict(spark.read.parquet(f"{idx.path}/vectors").dtypes)["centroid_id"]
    (
        half.withColumn("centroid_id", F.col("centroid_id").cast(base_t))
        .write.mode("append").partitionBy("centroid_id")
        .parquet(f"{idx.path}/vectors")
    )
    assert pl.recover_l0_fold(spark, idx.path) == "restored"
    frame = pl.ivf_vectors_frame(spark, idx.path)
    assert frame.count() == n_now + 10
    assert frame.select("vec_id").distinct().count() == n_now + 10


def test_sharded_text_append_equals_rebuild(spark, sf_dir, tmp_path):
    """Incremental sharded-text append == full shard rebuild (verdict
    #3): postings/positions/dl content exact (both-direction
    exceptAll), stats bit-equal by integer algebra, term_meta df exact,
    max_impact a valid upper bound under avgdl drift — and the SERVED
    batch BM25 under the merged model is bit-identical to serving off
    rebuilt shards."""
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.search import (
        _BATCH_QUERIES,
        _batch_scoring_join,
        _write_text_artifacts,
        append_sharded_text_artifacts,
        batch_topk_per_query,
        read_term_meta_merged,
        text_shard_route,
    )

    docs = load(spark, sf_dir, "documents")
    cut = 400
    corpus = docs.filter(F.col("doc_id") < cut)
    delta = docs.filter(F.col("doc_id") >= cut)
    S = 2
    route = text_shard_route(S)

    inc_paths = [str(tmp_path / f"inc/shard={s}") for s in range(S)]
    reb_paths = [str(tmp_path / f"reb/shard={s}") for s in range(S)]
    for s in range(S):
        _write_text_artifacts(spark, corpus.filter(route == s), inc_paths[s])
        _write_text_artifacts(spark, docs.filter(route == s), reb_paths[s])
    out = append_sharded_text_artifacts(spark, inc_paths, delta)
    assert out["delta_docs"] == delta.count()

    for s in range(S):
        for art in ("postings", "positions", "dl"):
            a = spark.read.parquet(f"{inc_paths[s]}/{art}")
            b = spark.read.parquet(f"{reb_paths[s]}/{art}")
            assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
                f"shard {s} {art} diverged from rebuild"
            )
        sa = spark.read.parquet(f"{inc_paths[s]}/stats").collect()[0]
        sb = spark.read.parquet(f"{reb_paths[s]}/stats").collect()[0]
        assert (int(sa.n_docs), int(sa.dl_sum)) == (int(sb.n_docs), int(sb.dl_sum))
        assert float(sa.avgdl) == float(sb.avgdl)  # bit-equal
        # round 14: appends stage delta-vocab TIERS; the serving
        # contract moved to the merged view (exact df, valid bounds)
        tm_a = read_term_meta_merged(spark, inc_paths[s])
        tm_b = read_term_meta_merged(spark, reb_paths[s])
        da, db = tm_a.select("term", "df"), tm_b.select("term", "df")
        assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0
        # max_impact: appended bound must DOMINATE the rebuilt exact max
        viol = (
            tm_a.alias("a")
            .join(tm_b.alias("b"), "term")
            .filter(F.col("a.max_impact") < F.col("b.max_impact") - 1e-12)
            .count()
        )
        assert viol == 0, "appended max_impact is not a valid upper bound"

    # served results under the merged global model: bit-identical
    def serve(paths):
        stats = [
            spark.read.parquet(f"{p}/stats").collect()[0] for p in paths
        ]
        n_docs = sum(int(s.n_docs or 0) for s in stats)
        avgdl = sum(int(s.dl_sum or 0) for s in stats) / max(1, n_docs)
        stats_local = spark.createDataFrame(
            [(n_docs, avgdl)], schema="n_docs bigint, avgdl double"
        )
        terms = sorted({t for _, ts in _BATCH_QUERIES for t in ts})
        qt = spark.createDataFrame(
            [(qid, t) for qid, ts in _BATCH_QUERIES for t in ts],
            schema="query_id int, term string",
        )
        metas = [
            read_term_meta_merged(spark, p)
            .select("term", "df")
            .filter(F.col("term").isin(*terms))
            for p in paths
        ]
        u = metas[0]
        for m in metas[1:]:
            u = u.unionByName(m)
        meta = u.groupBy("term").agg(F.sum("df").cast("bigint").alias("df"))
        rows = set()
        for p in paths:
            tf = spark.read.parquet(f"{p}/postings").filter(
                F.col("term").isin(*terms)
            )
            dl = spark.read.parquet(f"{p}/dl")
            scored = _batch_scoring_join(tf, qt, dl, stats_local, meta)
            rows |= {
                (r.query_id, r.doc_id, r.bm25)
                for r in batch_topk_per_query(scored, 10).collect()
            }
        return rows

    assert serve(inc_paths) == serve(reb_paths)


def test_vacuum_text_indexes_retention(tmp_path):
    """Text-artifact retention (verdict #5): live and pinned trees
    survive (including a live SHARD path naming its fleet parent),
    staging dirs are ignored, the keep-N newest stay, older trees
    reclaim with hard-link-aware byte accounting."""
    import time

    from cloudvectordb_spark.operators.search import vacuum_text_indexes

    fam = tmp_path / "textindex"

    def mk(name, sharded=False, t=0):
        root = fam / name
        sub = root / ("shard=0/postings" if sharded else "postings")
        sub.mkdir(parents=True)
        (sub / "part-0.parquet").write_bytes(b"p" * 50)
        (root / "_DONE").write_text("")
        ts = 1_700_000_000 + t
        os.utime(sub, (ts, ts))
        return root

    live = mk("live", sharded=True, t=9)
    pinned = mk("pinned", t=1)
    (pinned / "_PINNED").write_text("pinned")
    newest = mk("newest", t=8)
    old1 = mk("old1", t=2)
    old2 = mk("old2", t=3)
    # a superseded tree hard-linking a file the pinned tree owns
    os.link(
        pinned / "postings" / "part-0.parquet",
        old1 / "postings" / "shared.parquet",
    )
    os.utime(old1 / "postings", (1_700_000_002, 1_700_000_002))
    staging = fam / "tag.build123"
    (staging / "postings").mkdir(parents=True)

    res = vacuum_text_indexes(
        str(fam), live_paths=(str(live / "shard=0"),), keep=1
    )
    assert sorted(os.path.basename(p) for p in res["kept"]) == [
        "live", "newest", "pinned"
    ]
    assert sorted(os.path.basename(p) for p in res["deleted"]) == [
        "old1", "old2"
    ]
    assert os.path.isdir(staging)
    assert os.path.isdir(pinned) and os.path.isdir(live) and os.path.isdir(newest)
    # old1: 50B own + 50B shared (inode survives in pinned); old2: 50B
    assert res["bytes_reclaimed"] == 100 and res["bytes_shared"] == 50
    assert (pinned / "postings" / "part-0.parquet").exists()
    time.sleep(0)


def test_sig_state_rolls_and_folds(spark, tmp_path, monkeypatch):
    """Appends add ONE persisted generation each (∝ delta — never a
    re-persist of the whole state); past _FOLD_DEPTH the generations
    fold into a single base and results stay identical."""
    import cloudvectordb_spark.operators.sigstate as sigstate
    from cloudvectordb_spark.api import CorpusPipeline
    from cloudvectordb_spark.operators.sigstate import corpus_sig_state

    monkeypatch.setattr(sigstate, "_FOLD_DEPTH", 2)
    out = _build_pipeline(spark, tmp_path)
    root = out["index"].path
    sd = CorpusPipeline._state_dir(root)
    assert len(corpus_sig_state(spark, sd).gens) == 1

    nid = 100
    CorpusPipeline.append(
        spark, root, _mk_docs(spark, [(nid, _uniq("a1"))])
    )
    assert len(corpus_sig_state(spark, sd).gens) == 2  # base + delta
    CorpusPipeline.append(
        spark, root, _mk_docs(spark, [(nid + 1, _uniq("a2"))])
    )
    # third generation exceeds the (patched) fold depth → one base
    assert len(corpus_sig_state(spark, sd).gens) == 1
    st = corpus_sig_state(spark, sd)
    assert st.sigs().count() == 10  # 8 corpus + 2 appended
    # a dup of an appended doc is found THROUGH the folded state
    res = CorpusPipeline.append(
        spark, root, _mk_docs(spark, [(nid + 2, _perturb(_uniq("a2")))])
    )
    assert res["removed"] == 1
