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
