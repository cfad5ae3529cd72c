"""Round-14 fixes: parallelism floor inside the BLAS assign path
(verdict #1), owner-aware L0 fold recovery (ADVICE high), transactional
text append with crash recovery + reader fence (ADVICE medium),
post-meta-commit epoch re-check (ADVICE low), per-user FAIR pools file
(ADVICE low).
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest
from pyspark.sql import functions as F


def _uniq(g: str) -> str:
    return " ".join(f"{g}w{i}" for i in range(24))


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def _dead_owner_blob() -> str:
    """An owner blob whose process has verifiably exited (real pid +
    real start-tick captured while it ran, then reaped)."""
    from cloudvectordb_spark.operators.pipeline import _proc_starttime

    p = subprocess.Popen(["sleep", "30"])
    blob = json.dumps({"pid": p.pid, "starttime": _proc_starttime(p.pid)})
    p.kill()
    p.wait()
    return blob


# ---------------------------------------------------------------------------
# verdict #1: parallelism floor in assign_cells_blas
# ---------------------------------------------------------------------------
def test_assign_floor_on_coalesced_delta(spark):
    """A coalesced delta fed to the BLAS assign kernel is lifted to
    defaultParallelism (the engine guarantee the round-13 decade probe
    had to hand-patch: a 4-wide 1M x 24,833 x 64 kernel ran 12 min);
    a small-work input stays on its own partitioning (the shuffle
    would cost more than it saves); and repartitioning never changes
    the assignment (per-row kernel)."""
    from cloudvectordb_spark.operators.kmeans_det import assign_cells_blas

    dim = 64
    floor = spark.sparkContext.defaultParallelism
    emb = spark.range(20_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.col("id") % 97 + i).cast("double") / 100.0,
        ).alias("embedding"),
    )
    big_k = [(c, [float(c % 7) / 10.0] * dim) for c in range(5_000)]
    small_k = [(c, [float(c)] * dim) for c in range(100)]

    wide = assign_cells_blas(emb.coalesce(2), big_k)
    assert wide.rdd.getNumPartitions() == floor, (
        "heavy coalesced input must be lifted to the parallelism floor"
    )
    narrow = assign_cells_blas(emb.coalesce(2), small_k)
    assert narrow.rdd.getNumPartitions() == 2, (
        "sub-budget input must keep its own partitioning (no shuffle tax)"
    )

    # parity: the floor is a physical change only — the lifted plan
    # assigns every row identically to the unlifted one
    a = {
        (r.vec_id, r.centroid_id)
        for r in assign_cells_blas(emb.coalesce(2), big_k).collect()
    }
    b = {
        (r.vec_id, r.centroid_id)
        for r in assign_cells_blas(emb.repartition(floor), big_k).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# ADVICE high: owner-aware L0 fold recovery
# ---------------------------------------------------------------------------
def _tiny_index(spark, sf_dir, tmp_path, name="ivf"):
    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load

    emb = load(spark, sf_dir, "embeddings")
    return VectorIndex.build(spark, emb, str(tmp_path / name), k=4), emb


def test_recover_leaves_live_fold_alone(spark, sf_dir, tmp_path):
    """recover_l0_fold must NOT destructively heal a staging dir whose
    recorded owner is alive — that is an in-flight fold, and yanking
    the dir out from under its running write job duplicates or loses
    vectors (round-13 ADVICE item 1)."""
    import cloudvectordb_spark.operators.pipeline as pl

    idx, emb = _tiny_index(spark, sf_dir, tmp_path)
    d = emb.limit(10).select(
        (F.col("vec_id") + 10**6).alias("vec_id"), "embedding"
    )
    pl.append_to_ivf_index(d, idx.path, l0=True)
    delta_dir = f"{idx.path}/vectors_delta"
    staging = f"{idx.path}/vectors_delta.folding"

    # simulate a LIVE fold owned by this process
    os.rename(delta_dir, staging)
    with open(os.path.join(staging, "_FOLD_OWNER"), "w") as f:
        f.write(pl._fold_owner_blob())
    assert pl.recover_l0_fold(spark, idx.path) == "in-flight"
    assert os.path.isdir(staging) and not os.path.isdir(delta_dir)
    # a concurrent fold attempt also backs off (no tier to claim)
    assert pl.fold_l0_tier(spark, idx.path) == 0
    assert os.path.isdir(staging)

    # the owner dies -> same staging dir now heals (restore path)
    with open(os.path.join(staging, "_FOLD_OWNER"), "w") as f:
        f.write(_dead_owner_blob())
    assert pl.recover_l0_fold(spark, idx.path) == "restored"
    assert os.path.isdir(delta_dir) and not os.path.isdir(staging)
    # the restored tier carries no stale claim — it folds cleanly
    assert pl.fold_l0_tier(spark, idx.path) == 10
    n = pl.ivf_vectors_frame(spark, idx.path).count()
    assert (
        pl.ivf_vectors_frame(spark, idx.path)
        .select("vec_id").distinct().count() == n
    )


def test_fold_claim_mutual_exclusion(spark, sf_dir, tmp_path):
    """The exclusive-create _FOLD_OWNER claim closes the isdir->rename
    TOCTOU: a tier already claimed by a LIVE owner cannot be folded by
    anyone else; a DEAD owner's orphaned claim (crash between claim
    and rename) is cleared so folds are not blocked forever."""
    import cloudvectordb_spark.operators.pipeline as pl

    idx, emb = _tiny_index(spark, sf_dir, tmp_path)
    d = emb.limit(10).select(
        (F.col("vec_id") + 10**6).alias("vec_id"), "embedding"
    )
    pl.append_to_ivf_index(d, idx.path, l0=True)
    delta_dir = f"{idx.path}/vectors_delta"

    claim = os.path.join(delta_dir, "_FOLD_OWNER")
    with open(claim, "w") as f:
        f.write(pl._fold_owner_blob())  # live claim (this process)
    assert pl.fold_l0_tier(spark, idx.path) == 0
    assert os.path.isdir(delta_dir) and os.path.exists(claim)

    with open(claim, "w") as f:
        f.write(_dead_owner_blob())  # orphaned claim of a dead folder
    assert pl.fold_l0_tier(spark, idx.path) == 10  # recover cleared it
    assert not os.path.isdir(delta_dir)


# ---------------------------------------------------------------------------
# ADVICE medium: transactional text append
# ---------------------------------------------------------------------------
def _text_root(spark, sf_dir, tmp_path, name, hi=200):
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.search import _write_text_artifacts

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < hi)
    root = str(tmp_path / name)
    _write_text_artifacts(spark, docs, root)
    return root, docs


def _tree_fingerprint(spark, root) -> tuple:
    from cloudvectordb_spark.operators.search import (
        read_term_meta_merged,
        read_term_variants_merged,
    )

    parts = []
    frames = [
        spark.read.parquet(os.path.join(root, art))
        for art in ("postings", "positions", "dl")
    ] + [
        # tiered artifacts compare through their MERGED serving views
        # (tier dir names are uuids; content is the contract)
        read_term_meta_merged(spark, root),
        read_term_variants_merged(spark, root),
    ]
    for df in frames:
        h = df.select(F.xxhash64(*sorted(df.columns)).alias("h"))
        parts.append(h.select(F.expr("bit_xor(h)")).first()[0])
    srow = spark.read.parquet(os.path.join(root, "stats")).collect()[0]
    parts.append((int(srow.n_docs), int(srow.dl_sum), float(srow.avgdl)))
    return tuple(parts)


def test_text_append_rolls_back_pre_commit(spark, sf_dir, tmp_path, monkeypatch):
    """A crash BEFORE the _COMMIT marker leaves the live tree untouched
    (all writes were staged); recovery rolls back and a RETRY of the
    same delta succeeds — the fresh-doc_id check no longer bricks the
    root forever (round-13 ADVICE item 2)."""
    import cloudvectordb_spark.operators.search as sx
    from cloudvectordb_spark.catalog import load

    root, _ = _text_root(spark, sf_dir, tmp_path, "t1")
    before = _tree_fingerprint(spark, root)
    delta = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 230)
    )

    # crash mid-staging: the term_variants derivation explodes (after
    # postings/positions/dl are staged, before the _COMMIT marker)
    orig = sx._deletion_variants

    def exploding_variants(col):
        raise RuntimeError("injected pre-commit crash")

    monkeypatch.setattr(sx, "_deletion_variants", exploding_variants)
    with pytest.raises(RuntimeError, match="injected"):
        sx.append_text_artifacts(spark, delta, root)
    monkeypatch.setattr(sx, "_deletion_variants", orig)

    staging = os.path.join(root, "append.staging")
    assert os.path.isdir(staging)  # crash litter, not yet committed
    assert not os.path.exists(os.path.join(staging, "_COMMIT"))
    assert sx.recover_text_append(root) == "rolled_back"
    assert _tree_fingerprint(spark, root) == before, (
        "pre-commit crash must leave the live tree bit-identical"
    )
    # retry of the SAME delta passes the fresh-doc_id check
    out = sx.append_text_artifacts(spark, delta, root)
    assert out["delta_docs"] == delta.count()


def test_text_append_rolls_forward_post_commit(spark, sf_dir, tmp_path, monkeypatch):
    """A crash AFTER the _COMMIT marker rolls FORWARD: recovery
    finishes the idempotent apply and the tree equals a crash-free
    append (fingerprint-for-fingerprint); the retry then reports the
    doc_id clash because the delta IS ingested."""
    import cloudvectordb_spark.operators.search as sx
    from cloudvectordb_spark.catalog import load

    root, _ = _text_root(spark, sf_dir, tmp_path, "t2")
    twin, _ = _text_root(spark, sf_dir, tmp_path, "t2twin")
    delta = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 230)
    )

    # crash exactly between commit and apply
    monkeypatch.setattr(
        sx, "_apply_text_append",
        lambda r: (_ for _ in ()).throw(RuntimeError("injected post-commit")),
    )
    with pytest.raises(RuntimeError, match="post-commit"):
        sx.append_text_artifacts(spark, delta, root)
    monkeypatch.undo()

    staging = os.path.join(root, "append.staging")
    assert os.path.exists(os.path.join(staging, "_COMMIT"))
    assert sx.recover_text_append(root) == "rolled_forward"
    assert not os.path.isdir(staging)

    sx.append_text_artifacts(spark, delta, twin)  # crash-free twin
    assert _tree_fingerprint(spark, root) == _tree_fingerprint(spark, twin)

    with pytest.raises(ValueError, match="fresh doc_ids"):
        sx.append_text_artifacts(spark, delta, root)


def test_text_append_lock_serializes(spark, sf_dir, tmp_path):
    """A LIVE holder's lock makes a second appender fail loudly; a
    DEAD holder's lock is healed and stolen."""
    import cloudvectordb_spark.operators.pipeline as pl
    import cloudvectordb_spark.operators.search as sx
    from cloudvectordb_spark.catalog import load

    root, _ = _text_root(spark, sf_dir, tmp_path, "t3")
    delta = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 210)
    )
    lock = os.path.join(root, "_APPEND_LOCK")
    with open(lock, "w") as f:
        f.write(pl._fold_owner_blob())  # live holder
    with pytest.raises(RuntimeError, match="in flight"):
        sx.append_text_artifacts(spark, delta, root)
    with open(lock, "w") as f:
        f.write(_dead_owner_blob())  # dead holder -> steal
    out = sx.append_text_artifacts(spark, delta, root)
    assert out["delta_docs"] == 10
    assert not os.path.exists(lock)


def test_text_reader_fence(spark, sf_dir, tmp_path):
    """The mutable-fleet serving surface fences on an in-flight apply:
    a dead appender's committed staging is rolled forward by the
    reader itself; a live appender's window raises after the bounded
    wait instead of serving a mid-swap tree."""
    import cloudvectordb_spark.operators.pipeline as pl
    import cloudvectordb_spark.operators.search as sx

    root, _ = _text_root(spark, sf_dir, tmp_path, "t4")
    staging = os.path.join(root, "append.staging")
    os.makedirs(staging)
    with open(os.path.join(staging, "_COMMIT"), "w") as f:
        f.write(_dead_owner_blob())
    sx._await_stable_text_root(root)  # dead owner -> reader heals
    assert not os.path.isdir(staging)

    os.makedirs(staging)
    with open(os.path.join(staging, "_COMMIT"), "w") as f:
        f.write(pl._fold_owner_blob())  # live owner
    with pytest.raises(RuntimeError, match="apply phase"):
        sx._await_stable_text_root(root, timeout=0.2)
    shutil.rmtree(staging)

    # steady state: the fence is a no-op and serving works end to end
    res = sx.sharded_bm25_topk_batch_paths(
        spark, [root], batch=sx._BATCH_QUERIES[:1], k=3
    )
    assert res.count() > 0


# ---------------------------------------------------------------------------
# verdict #4: tiered term_meta / term_variants (∝ delta vocab appends)
# ---------------------------------------------------------------------------
def test_term_meta_tiered_append_and_fold(spark, sf_dir, tmp_path, monkeypatch):
    """Each append stages a DELTA-VOCAB term_meta/term_variants tier —
    the base is untouched (the r13 ∝-vocab rewrite is gone); the merged
    view equals a rebuild on (term, df) exactly with max_impact a
    dominating WAND bound; past _TEXT_META_FOLD_DEPTH the tiers fold
    into one re-anchored base and the served results stay bit-equal."""
    import cloudvectordb_spark.operators.search as sx
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.search import (
        _write_text_artifacts,
        read_term_meta_merged,
        read_term_variants_merged,
    )

    monkeypatch.setattr(sx, "_TEXT_META_FOLD_DEPTH", 3)
    docs = load(spark, sf_dir, "documents")
    inc = str(tmp_path / "inc")
    _write_text_artifacts(spark, docs.filter(F.col("doc_id") < 200), inc)
    reb = str(tmp_path / "reb")
    _write_text_artifacts(spark, docs.filter(F.col("doc_id") < 260), reb)

    def base_fp():
        df = spark.read.parquet(os.path.join(inc, "term_meta"))
        return df.select(
            F.expr("bit_xor(xxhash64(term, df, max_impact))")
        ).first()[0]

    fp0 = base_fp()
    # appends 1 and 2: tier path — base bit-untouched, one tier each,
    # tier rows == the delta's distinct vocab (∝ delta, not corpus)
    for i, (lo, hi) in enumerate([(200, 220), (220, 240)]):
        delta = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        sx.append_text_artifacts(spark, delta, inc)
        assert len(sx._meta_tier_dirs(inc)) == i + 1
        assert len(sx._variant_tier_dirs(inc)) == i + 1
        assert base_fp() == fp0, "tier append must not rewrite the base"
        tier = spark.read.parquet(sx._meta_tier_dirs(inc)[-1])
        n_delta_vocab = (
            delta.select(
                F.explode(sx.TX.tokens("text")).alias("t")
            ).distinct().count()
        )
        assert tier.count() == n_delta_vocab

    # append 3 crosses the (patched) fold depth: tiers fold into a
    # fresh base, nothing tiered remains
    delta3 = docs.filter((F.col("doc_id") >= 240) & (F.col("doc_id") < 260))
    sx.append_text_artifacts(spark, delta3, inc)
    assert sx._meta_tier_dirs(inc) == [] and sx._variant_tier_dirs(inc) == []
    assert base_fp() != fp0  # the fold IS the amortized rewrite

    # merged view == rebuild: df exact, variants exact, bounds dominate
    ma, mb = read_term_meta_merged(spark, inc), read_term_meta_merged(spark, reb)
    da, db = ma.select("term", "df"), mb.select("term", "df")
    assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0
    va = read_term_variants_merged(spark, inc)
    vb = read_term_variants_merged(spark, reb)
    assert va.exceptAll(vb).count() == 0 and vb.exceptAll(va).count() == 0
    viol = (
        ma.alias("a").join(mb.alias("b"), "term")
        .filter(F.col("a.max_impact") < F.col("b.max_impact") - 1e-12)
        .count()
    )
    assert viol == 0, "merged max_impact must dominate the rebuilt bound"

    # served batch: bit-identical to the rebuild through the mutable
    # serving surface (which reads the merged view)
    batch = sx._BATCH_QUERIES[:4]
    a = {
        tuple(r)
        for r in sx.sharded_bm25_topk_batch_paths(spark, [inc], batch, 5)
        .select("query_id", "doc_id", "bm25", "rank").collect()
    }
    b = {
        tuple(r)
        for r in sx.sharded_bm25_topk_batch_paths(spark, [reb], batch, 5)
        .select("query_id", "doc_id", "bm25", "rank").collect()
    }
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# round-14 cliff fix: O(1) doc_id freshness fence on text appends
# ---------------------------------------------------------------------------
def test_text_append_freshness_fence(spark, sf_dir, tmp_path, monkeypatch):
    """stats carries max_doc_id (v7): a monotonic-id delta proves
    clash-freedom in O(1) and SKIPS the corpus-sized dl semi-join (the
    fixed-cost floor of the 10M text-decade append wall); clashing or
    below-fence ids still fall back to the exact scan and raise; a
    pre-fence tree (no max_doc_id) scans once and upgrades."""
    import pyspark.sql.readwriter as rw

    import cloudvectordb_spark.operators.search as sx
    from cloudvectordb_spark.catalog import load

    root, _ = _text_root(spark, sf_dir, tmp_path, "tf", hi=200)
    docs = load(spark, sf_dir, "documents")

    dl_reads = []
    real_parquet = rw.DataFrameReader.parquet

    def spying_parquet(self, *paths):
        dl_reads.extend(p for p in paths if p.endswith(os.sep + "dl"))
        return real_parquet(self, *paths)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", spying_parquet)

    # fresh monotonic delta: NO dl read (the fence proves freshness)
    d1 = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 220))
    sx.append_text_artifacts(spark, d1, root)
    assert dl_reads == [], "fenced append must not scan the dl artifact"
    srow = spark.read.parquet(os.path.join(root, "stats")).collect()[0]
    assert int(srow.max_doc_id) == 219

    # clashing delta: falls back to the exact scan and raises
    with pytest.raises(ValueError, match="fresh doc_ids"):
        sx.append_text_artifacts(spark, d1, root)
    assert dl_reads, "below-fence ids must take the exact scan"

    # pre-fence tree (legacy stats row): one exact scan, then upgraded
    legacy = spark.createDataFrame(
        [(int(srow.n_docs), float(srow.avgdl), int(srow.dl_sum))],
        schema="n_docs bigint, avgdl double, dl_sum bigint",
    )
    import shutil as _sh

    _sh.rmtree(os.path.join(root, "stats"))
    legacy.coalesce(1).write.parquet(os.path.join(root, "stats"))
    dl_reads.clear()
    d2 = docs.filter((F.col("doc_id") >= 220) & (F.col("doc_id") < 240))
    sx.append_text_artifacts(spark, d2, root)
    assert dl_reads, "pre-fence tree must take the exact scan once"
    srow2 = spark.read.parquet(os.path.join(root, "stats")).collect()[0]
    assert int(srow2.max_doc_id) == 239  # upgraded with the TRUE max
    dl_reads.clear()
    d3 = docs.filter((F.col("doc_id") >= 240) & (F.col("doc_id") < 260))
    sx.append_text_artifacts(spark, d3, root)
    assert dl_reads == []  # fenced again after the upgrade


# ---------------------------------------------------------------------------
# ADVICE low: post-meta-commit epoch re-check
# ---------------------------------------------------------------------------
def test_pipeline_meta_commit_recheck(spark, tmp_path, monkeypatch):
    """A successor lease acquired in the check-then-act window between
    _fence('pre-meta-commit') and the meta rename is detected AFTER
    the rename and raised loudly (CommitConflict with the
    verify='full' remedy) instead of silently clobbering the direct
    writer's fenced counter update."""
    from cloudvectordb_spark.api import CorpusPipeline
    from cloudvectordb_spark.versioning import CommitConflict, acquire_lease

    rows = [(i, _uniq(f"u{i}")) for i in range(8)]
    out = CorpusPipeline.run(
        spark, _mk_docs(spark, rows), str(tmp_path / "cp"), tau=0.25
    )
    root = out["index"].path

    real_write = CorpusPipeline._write_state_meta

    def racing_write(index_path, meta):
        real_write(index_path, meta)
        # the racing direct writer lands its lease mid-window
        acquire_lease(root, owner="racing-direct-writer")

    monkeypatch.setattr(CorpusPipeline, "_write_state_meta", racing_write)
    with pytest.raises(CommitConflict, match="verify='full'"):
        CorpusPipeline.append(
            spark, root, _mk_docs(spark, [(100, _uniq("a1"))])
        )
    monkeypatch.undo()

    # the root is recoverable: verify='full' re-audits and proceeds
    res = CorpusPipeline.append(
        spark, root, _mk_docs(spark, [(101, _uniq("a2"))]), verify="full"
    )
    assert res["delta"] == 1


# ---------------------------------------------------------------------------
# verdict #2: sharded sig-state scatter-gather parity
# ---------------------------------------------------------------------------
def _perturb(text: str) -> str:
    words = text.split(" ")
    words[len(words) // 2] = "zz"
    return " ".join(words)


def test_sharded_sig_state_parity(spark, tmp_path):
    """minhash_pairs_between_sharded over S bucket-range shards returns
    the EXACT pair set of minhash_pairs_between_state and the classic
    between-join, for S in {1, 2, 4, 8} — shard ranges partition bucket
    space and bucket is a pure function of the join key, so every
    joinable pair meets in exactly one shard; the gather dedups pairs
    that surface via two bands in two shards."""
    from cloudvectordb_spark.api import CorpusPipeline
    from cloudvectordb_spark.operators.dedup import (
        minhash_pairs_between,
        minhash_pairs_between_sharded,
        minhash_pairs_between_state,
        minhash_sigs,
    )
    from cloudvectordb_spark.operators.sigstate import (
        corpus_sig_state,
        sharded_sig_state,
    )

    rows = [(i, _uniq(f"u{i}")) for i in range(20)]
    CorpusPipeline.run(spark, _mk_docs(spark, rows), str(tmp_path / "cp"))
    sd = CorpusPipeline._state_dir(str(tmp_path / "cp"))
    state = corpus_sig_state(spark, sd)

    delta_rows = [
        (100, _perturb(_uniq("u3"))),
        (101, _perturb(_uniq("u7"))),
        (102, _uniq("u11")),
        (103, _uniq("x103")),
    ]
    sigs_delta = minhash_sigs(_mk_docs(spark, delta_rows))

    def pairs_set(df):
        return {(r.new_id, r.corpus_id, r.est_jaccard) for r in df.collect()}

    classic = pairs_set(minhash_pairs_between(sigs_delta, state.sigs()))
    single = pairs_set(minhash_pairs_between_state(sigs_delta, state))
    assert classic == single
    assert {(n, c) for n, c, _ in classic} >= {(100, 3), (101, 7), (102, 11)}
    for S in (1, 2, 4, 8):
        stats: dict = {}
        sh = pairs_set(
            minhash_pairs_between_sharded(
                sigs_delta, sharded_sig_state(spark, sd, S), stats=stats
            )
        )
        assert sh == classic, f"S={S} pair set diverged"
        assert len(stats["per_shard_cand_s"]) == S
        assert sum(stats["per_shard_n_cand"]) >= len(
            {(n, c) for n, c, _ in classic}
        )


def test_append_with_sig_shards_matches_default(spark, tmp_path):
    """CorpusPipeline.append(sig_shards=S) routes the corpus probe
    through the scatter-gather fleet path; dedup decisions and the
    final indexed set are IDENTICAL to the default single-state probe
    (the pair-set parity theorem, end to end through the pipeline)."""
    from cloudvectordb_spark.api import CorpusPipeline

    rows = [(i, _uniq(f"u{i}")) for i in range(16)]
    for name in ("a", "b"):
        CorpusPipeline.run(
            spark, _mk_docs(spark, rows), str(tmp_path / name), tau=0.25
        )
    delta_rows = [
        (100, _perturb(_uniq("u3"))),
        (101, _perturb(_uniq("u7"))),
        (102, _uniq("x102")),
        (103, _perturb(_uniq("u3"))),
    ]
    ra = CorpusPipeline.append(
        spark, str(tmp_path / "a"), _mk_docs(spark, delta_rows)
    )
    rb = CorpusPipeline.append(
        spark, str(tmp_path / "b"), _mk_docs(spark, delta_rows),
        sig_shards=4,
    )
    for key in ("delta", "survivors", "removed", "demoted", "indexed"):
        assert ra[key] == rb[key], f"{key} diverged under sig_shards=4"
    va = {
        int(r.vec_id)
        for r in ra["index"].vectors.select("vec_id").collect()
    }
    vb = {
        int(r.vec_id)
        for r in rb["index"].vectors.select("vec_id").collect()
    }
    assert va == vb


# ---------------------------------------------------------------------------
# verdict #6: COVERAGE.md staleness gate
# ---------------------------------------------------------------------------
def test_coverage_md_matches_registry():
    """COVERAGE.md is the judge's coverage map and went stale for two
    rounds (header said 350 while the registry had 351). This test is
    red whenever the committed doc's query count diverges from the
    live registry — regenerate with `python tools/coverage_report.py`
    at every close-out."""
    import re

    from cloudvectordb_spark.registry import all_queries, import_errors

    assert not import_errors, f"registry import errors: {import_errors}"
    n_live = len(all_queries())
    doc = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    m = re.search(r"\*\*(\d+) queries, (\d+) with DuckDB", doc)
    assert m, "COVERAGE.md header not recognized — regenerate it"
    assert int(m.group(1)) == n_live, (
        f"COVERAGE.md says {m.group(1)} queries but the registry has "
        f"{n_live} — run `python tools/coverage_report.py`"
    )


# ---------------------------------------------------------------------------
# ADVICE low: per-user FAIR pools file
# ---------------------------------------------------------------------------
def test_fair_pools_file_is_per_user(tmp_path, monkeypatch):
    """The allocation XML lands at a uid-scoped path (a fixed
    world-shared name breaks under sticky-bit /tmp on multi-user
    boxes) and stays valid XML with the two standing pools."""
    import xml.etree.ElementTree as ET

    from cloudvectordb_spark.session import _fair_pools_file

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # re-resolve gettempdir() from TMPDIR
    try:
        path = _fair_pools_file()
        assert f"_{os.getuid()}.xml" in os.path.basename(path)
        assert os.path.dirname(path) == str(tmp_path)
        pools = {
            p.get("name"): p
            for p in ET.parse(path).getroot().findall("pool")
        }
        assert set(pools) == {"serving", "maintenance"}
        assert pools["serving"].findtext("weight") == "8"
    finally:
        tempfile.tempdir = None
