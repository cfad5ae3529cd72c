"""Versioned index snapshots: time-travel reads, append/compact commits,
vacuum retention (cloudvectordb_spark/versioning.py)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.versioning import (
    commit_append,
    commit_build,
    commit_compact,
    latest_version,
    read_manifest,
    read_version,
    vacuum,
)


@pytest.fixture()
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").select("vec_id", "label")


def _ids(df):
    return {r.vec_id for r in df.collect()}


def test_build_append_compact_lineage(spark, emb, tmp_path):
    root = str(tmp_path / "vidx")
    base = emb.filter(F.col("vec_id") < 400)
    delta = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 500))

    assert commit_build(base, root) == 1
    assert commit_append(delta, root) == 2
    assert commit_compact(spark, root, num_files=1) == 3
    assert latest_version(root) == 3

    # every version stays readable with exactly its own contents
    assert _ids(read_version(spark, root, 1)) == _ids(base)
    assert _ids(read_version(spark, root, 2)) == _ids(base) | _ids(delta)
    assert _ids(read_version(spark, root, 3)) == _ids(base) | _ids(delta)
    # LATEST pointer resolves to v3
    assert _ids(read_version(spark, root)) == _ids(read_version(spark, root, 3))
    # compaction healed the layout to one file
    assert len(read_manifest(root, 3)["files"]) == 1
    assert read_manifest(root, 3)["op"] == "compact"


def test_pinned_reader_immune_to_later_commits(spark, emb, tmp_path):
    root = str(tmp_path / "vidx")
    base = emb.filter(F.col("vec_id") < 100)
    commit_build(base, root)
    pinned = read_version(spark, root, 1)  # reader pins v1
    commit_append(emb.filter(F.col("vec_id") >= 500), root)
    commit_compact(spark, root)
    # the pinned plan still reads only v1's files
    assert _ids(pinned) == _ids(base)


def test_vacuum_keeps_recent_versions_only(spark, emb, tmp_path):
    root = str(tmp_path / "vidx")
    commit_build(emb.filter(F.col("vec_id") < 100), root)
    commit_append(emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 200)), root)
    commit_compact(spark, root)

    # keep_last=2 retains v2+v3; v2 (an append) still references v1's
    # build files, so nothing is reclaimable yet
    assert vacuum(root, keep_last=2) == []
    assert len(_ids(read_version(spark, root, 2))) == 200

    # keep only the compacted v3: the pre-compaction files become garbage
    deleted = vacuum(root, keep_last=1)
    assert deleted, "files superseded by compaction should be reclaimed"
    assert len(_ids(read_version(spark, root, 3))) == 200
    # older manifests are gone
    assert not os.path.exists(os.path.join(root, "manifests", "v00001.json"))
    assert not os.path.exists(os.path.join(root, "manifests", "v00002.json"))
    # no dangling files: everything on disk is referenced by v3
    referenced = set(read_manifest(root, 3)["files"])
    on_disk = {
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(root, "data", "*", "*.parquet"))
    }
    assert on_disk <= referenced


def test_concurrent_commit_collision_raises(spark, emb, tmp_path):
    import json

    root = str(tmp_path / "vidx")
    commit_build(emb.filter(F.col("vec_id") < 50), root)
    # simulate a racing writer that already published v2
    m = dict(read_manifest(root, 1), version=2, parent=1, op="append")
    with open(os.path.join(root, "manifests", "v00002.json"), "w") as f:
        json.dump(m, f)
    with pytest.raises(FileExistsError):
        commit_append(emb.filter(F.col("vec_id") >= 50), root)


def test_stale_compactor_rejected_and_serving_unchanged(spark, emb, tmp_path):
    """Round-8 verdict #4: race a deliberately STALE compactor (prepared
    against v1) with a fresh ingest append (v2). The stale commit must
    be rejected with CommitConflict — a blind publish would drop the
    ingester's delta — and serving (read latest) must be byte-identical
    to the state before the failed commit."""
    from cloudvectordb_spark.versioning import CommitConflict, commit_compact

    root = str(tmp_path / "vidx")
    commit_build(emb.filter(F.col("vec_id") < 50), root)  # v1
    # compactor "reads" latest = 1 here, then stalls...
    stale_parent = latest_version(root)
    # ...while the ingester lands v2
    commit_append(emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 80)), root)
    before = {r.vec_id for r in read_version(spark, root).select("vec_id").collect()}

    with pytest.raises(CommitConflict):
        commit_compact(spark, root, as_of=stale_parent)

    assert latest_version(root) == 2
    after = {r.vec_id for r in read_version(spark, root).select("vec_id").collect()}
    assert after == before == set(range(80))


def test_fencing_lease_rejects_stalled_writer(spark, emb, tmp_path):
    """Epoch fencing: once a newer writer acquires a lease, a commit
    carrying the older epoch is rejected EVEN IF its parent is still
    the latest (the stalled-writer case the parent CAS alone cannot
    catch when the newer writer hasn't published yet)."""
    from cloudvectordb_spark.versioning import (
        CommitConflict,
        acquire_lease,
        commit_compact,
    )

    root = str(tmp_path / "vidx")
    commit_build(emb.filter(F.col("vec_id") < 50), root)  # v1
    old_lease = acquire_lease(root, "compactor")
    new_lease = acquire_lease(root, "ingester")  # fences the compactor
    assert new_lease > old_lease

    with pytest.raises(CommitConflict):
        commit_compact(spark, root, lease=old_lease)

    # the fresh lease-holder commits fine
    v = commit_append(
        emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 80)),
        root,
        lease=new_lease,
    )
    assert v == 2 and latest_version(root) == 2


def test_streaming_foreachbatch_commits_versions(spark, sf_dir, tmp_path):
    """Streaming ingest -> versioned index maintenance: each micro-batch
    lands as ONE manifest-pinned append, so readers pinned to version N
    never see later batches and the final version holds every row
    exactly once (file-source exactly-once + immutable commits)."""
    from cloudvectordb_spark.streaming.jobs import read_events_stream
    from cloudvectordb_spark.versioning import (
        commit_append,
        commit_build,
        latest_version,
        read_version,
    )

    root = str(tmp_path / "stream_versions")
    spark.createDataFrame([], "event_id long, user_id long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "seed"))
    commit_build(spark.read.parquet(str(tmp_path / "seed")), root)

    stream = read_events_stream(spark, sf_dir).select("event_id", "user_id")
    n_batches = 0

    def commit_batch(batch_df, batch_id):
        nonlocal n_batches
        if batch_df.count() > 0:
            commit_append(batch_df, root)
            n_batches += 1

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(commit_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert n_batches >= 1
    assert latest_version(root) == 1 + n_batches
    total = read_version(spark, root).count()
    from cloudvectordb_spark.catalog import load

    assert total == load(spark, sf_dir, "events").count()
    # a reader pinned to the initial build still sees zero rows
    assert read_version(spark, root, 1).count() == 0


def test_lease_epochs_unique_across_owners(tmp_path):
    """Two writer generations racing for a lease must NEVER share an
    epoch number: the epoch filename is the mutex, so it cannot embed
    the owner (a per-owner name lets both racers create 'their' file
    for the same number and both return it — then neither fences the
    other). Simulate the exact interleaving: a rival with a DIFFERENT
    owner grabs epoch N between our _max_epoch read and our create."""
    import os

    from cloudvectordb_spark import versioning as V

    root = str(tmp_path / "idx")
    e1 = V.acquire_lease(root, owner="gen1")
    # rival (different owner) takes the next epoch exactly as
    # acquire_lease would — by creating the epoch file
    rival_next = V._max_epoch(root) + 1
    with open(
        os.path.join(V._leases_dir(root), f"epoch-{rival_next:08d}"), "x"
    ) as f:
        f.write("gen2")
    # our acquire with a third owner must SKIP past the rival's epoch
    e3 = V.acquire_lease(root, owner="gen3")
    assert e1 < rival_next < e3
    assert V._max_epoch(root) == e3


def test_vacuum_prunes_superseded_epoch_files(tmp_path):
    """Only the newest epoch matters to the fence; vacuum drops the
    rest so a long-lived index doesn't accumulate one marker per
    writer generation forever."""
    import glob
    import os

    from cloudvectordb_spark import versioning as V
    from cloudvectordb_spark.catalog import load  # noqa: F401 — session fixture not needed

    root = str(tmp_path / "idx")
    for g in range(5):
        V.acquire_lease(root, owner=f"gen{g}")
    import pandas as pd  # build a minimal committed index for vacuum
    # vacuum needs LATEST; commit a tiny manifest chain by hand
    os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
    for v, parent in ((1, None), (2, 1)):
        V._publish(root, {"version": v, "parent": parent, "op": "t", "files": []})
    deleted = V.vacuum(root, keep_last=2)
    assert deleted == []
    epochs = glob.glob(os.path.join(V._leases_dir(root), "epoch-*"))
    assert len(epochs) == 1 and epochs[0].endswith("epoch-00000005")
    assert V._max_epoch(root) == 5  # the fence still sees the newest


def test_post_append_fence_surfaces_interleaved_batch(tmp_path):
    """Round-10 ADVICE item 3: the plain-append streaming jobs re-check
    the lease AFTER each micro-batch's append. A writer fenced while
    its write was in flight must raise (before the checkpoint commits),
    and the error must name the root and say the appended shards are
    the stale generation's — the interleaving is surfaced, not
    silently absorbed."""
    import pytest as _pytest

    from cloudvectordb_spark import versioning as V
    from cloudvectordb_spark.streaming.jobs import _check_lease

    root = str(tmp_path / "idx")
    lease1 = V.acquire_lease(root, owner="gen1")
    # batch-start check passes...
    _check_lease(root, lease1)
    # ...the replacement fences gen1 while gen1's append is in flight
    V.acquire_lease(root, owner="gen2")
    with _pytest.raises(V.CommitConflict) as exc:
        _check_lease(root, lease1, at="post-append")
    msg = str(exc.value)
    assert "post-append" in msg and root in msg
    assert "stale generation" in msg
    # no fence, no epoch files: the single-writer fast path stays silent
    _check_lease(str(tmp_path / "other"), None, at="post-append")
