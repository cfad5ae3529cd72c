"""Versioned index snapshots: manifest-pinned, time-travel-readable
(A3 extension; reference S4 "building the vectordb",
/root/reference/README.md:2 — a rebuilt index must not invalidate the
experiment that ran against the previous one).

Lakehouse-lite: data files are IMMUTABLE once written; each commit is a
JSON manifest listing exactly the files that make up that version; the
LATEST pointer is published by atomic rename. Readers pin a version and
are immune to concurrent appends/compactions; writers never delete —
`vacuum` is the only destructive op and only removes files no retained
manifest references.

    <root>/data/<commit-uuid>/part-*.parquet   immutable
    <root>/manifests/v00001.json               {"files": [...], "op": ...}
    <root>/LATEST                              "1"

Concurrent-writer safety (round-8 verdict #4) is optimistic, no lock
service required — two independent guards at publish time:

1. PARENT CAS: a commit is rejected (CommitConflict) unless its
   ``parent`` IS the current LATEST. A compactor that read version N
   and got raced by an ingest commit N+1 cannot publish — silently
   retrying at N+2 would drop the ingester's delta. The conflicted
   writer must restart from the new latest.
2. EPOCH FENCE: a writer may acquire a monotonically-increasing lease
   (``acquire_lease``, exclusive-create on an epoch file) and pass it
   to commits; any commit carrying an epoch older than the newest
   issued lease is rejected even if its parent check would race
   (the classic fencing-token discipline for stalled writers).

The version-number exclusive-create remains the lowest-level guard
(two same-version publishers: first os.link wins, loser gets
FileExistsError atomically — rename would silently replace). At
100 TB the manifest lists thousands of files, still KBs of JSON on
the driver.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """A concurrent writer advanced the index since this commit was
    prepared (stale parent or fenced lease). Re-read LATEST and redo
    the work against it — do NOT retry the same payload."""


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, "manifests", f"v{version:05d}.json")


def _leases_dir(root: str) -> str:
    return os.path.join(root, "leases")


def acquire_lease(root: str, owner: str = "writer") -> int:
    """Allocate the next fencing epoch via exclusive file create.
    Returns the epoch number; pass it as ``lease=`` to commit_*. Any
    LATER acquire fences every earlier epoch out.

    The epoch FILENAME must not embed the owner: exclusive create is
    the mutex, and a per-owner name would let two racing acquirers
    with different owners both create "their" epoch-N file and both
    return N — at which point neither generation fences the other
    (the exact zombie case leases exist for). The owner is recorded
    INSIDE the file for forensics instead."""
    d = _leases_dir(root)
    os.makedirs(d, exist_ok=True)
    while True:
        nxt = _max_epoch(root) + 1
        try:
            with open(os.path.join(d, f"epoch-{nxt:08d}"), "x") as f:
                f.write(owner)
            return nxt
        except FileExistsError:
            continue  # raced with another acquirer — take the next slot


def _max_epoch(root: str) -> int:
    names = glob.glob(os.path.join(_leases_dir(root), "epoch-*"))
    return max(
        (int(os.path.basename(n).split("-")[1].split(".")[0]) for n in names),
        default=0,
    )


def latest_version(root: str) -> int:
    with open(os.path.join(root, "LATEST")) as f:
        return int(f.read().strip())


def read_manifest(root: str, version: int | None = None) -> dict:
    if version is None:
        version = latest_version(root)
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _publish(root: str, manifest: dict, lease: int | None = None) -> int:
    version = manifest["version"]
    # fencing: a newer lease invalidates this writer no matter what the
    # parent check would say (stalled-compactor discipline)
    if lease is not None and _max_epoch(root) > lease:
        raise CommitConflict(
            f"lease epoch {lease} fenced by a newer writer "
            f"(current {_max_epoch(root)}) — restart from LATEST"
        )
    # parent CAS: committing over anything but the current latest would
    # silently drop the concurrent writer's rows on a blind retry
    cur = latest_version(root) if os.path.exists(os.path.join(root, "LATEST")) else None
    if manifest.get("parent") != cur:
        raise CommitConflict(
            f"stale parent {manifest.get('parent')} (latest is {cur}) — "
            "re-read LATEST and redo the commit against it"
        )
    os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
    mpath = _manifest_path(root, version)
    # Exclusive publish: rename() silently REPLACES an existing file, so
    # a bare exists()+rename race lets the second same-version writer
    # clobber the first's manifest (lost commit). link() is atomic and
    # fails with EEXIST — the loser gets FileExistsError, never a
    # silent overwrite. rename stays only for the LATEST pointer swap,
    # where last-writer-wins is the intended semantics.
    tmp = f"{mpath}.tmp{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    try:
        os.link(tmp, mpath)
    except FileExistsError:
        raise FileExistsError(
            f"version {version} already committed (concurrent writer?) — retry"
        )
    finally:
        os.unlink(tmp)
    ltmp = os.path.join(root, f"LATEST.tmp{os.getpid()}")
    with open(ltmp, "w") as f:
        f.write(str(version))
    os.rename(ltmp, os.path.join(root, "LATEST"))
    return version


def _write_data_files(df: DataFrame, root: str) -> list[str]:
    """One immutable commit directory per write; returns paths relative
    to root (manifests stay valid if the whole index tree moves)."""
    commit_dir = os.path.join("data", uuid.uuid4().hex[:12])
    df.write.mode("overwrite").parquet(os.path.join(root, commit_dir))
    files = sorted(
        glob.glob(os.path.join(root, commit_dir, "*.parquet"))
        + glob.glob(os.path.join(root, commit_dir, "*.parquet.*"))
    )
    return [os.path.relpath(p, root) for p in files]


def commit_build(df: DataFrame, root: str, lease: int | None = None) -> int:
    """Version 1: the initial bulk build."""
    files = _write_data_files(df, root)
    return _publish(
        root,
        {"version": 1, "parent": None, "op": "build", "files": files},
        lease=lease,
    )


def commit_append(df: DataFrame, root: str, lease: int | None = None) -> int:
    """New version = parent's files + this delta's files. The parent
    version stays readable forever (its files are untouched)."""
    parent_v = latest_version(root)
    parent = read_manifest(root, parent_v)
    files = _write_data_files(df, root)
    return _publish(
        root,
        {
            "version": parent_v + 1,
            "parent": parent_v,
            "op": "append",
            "files": parent["files"] + files,
        },
        lease=lease,
    )


def commit_compact(
    spark: SparkSession,
    root: str,
    num_files: int = 1,
    as_of: int | None = None,
    lease: int | None = None,
) -> int:
    """Rewrite a version's rows into ``num_files`` files and commit them
    as a new version — logically identical contents, healed small-files
    layout. Old versions keep reading their own files.

    ``as_of`` pins which version the compaction was PREPARED against
    (default: latest at call time). If a concurrent writer advanced
    LATEST past ``as_of`` before this publishes, the commit raises
    CommitConflict instead of silently dropping that writer's delta —
    the compactor must restart from the new latest."""
    parent_v = latest_version(root) if as_of is None else as_of
    current = read_version(spark, root, parent_v)
    files = _write_data_files(current.coalesce(num_files), root)
    return _publish(
        root,
        {"version": parent_v + 1, "parent": parent_v, "op": "compact", "files": files},
        lease=lease,
    )


def read_version(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Time-travel read: exactly the files the manifest pins — a reader
    holding version N never sees a concurrent writer's files."""
    m = read_manifest(root, version)
    paths = [os.path.join(root, f) for f in m["files"]]
    return spark.read.parquet(*paths)


def vacuum(root: str, keep_last: int = 2) -> list[str]:
    """Delete data files referenced ONLY by manifests older than the
    ``keep_last`` most recent versions (and drop those manifests), and
    prune superseded fencing-epoch files (only the NEWEST epoch ever
    matters to the fence, so older epoch markers are pure debt — a
    long-lived index would otherwise accumulate one file per writer
    generation forever). Returns the deleted data files. The single
    destructive operation."""
    # validate the root BEFORE any destructive side effect (a root with
    # leases but no committed version must fail cleanly, not half-prune)
    latest = latest_version(root)
    for n in sorted(glob.glob(os.path.join(_leases_dir(root), "epoch-*")))[:-1]:
        os.remove(n)
    keep_versions = [v for v in range(max(1, latest - keep_last + 1), latest + 1)]
    keep_files: set[str] = set()
    for v in keep_versions:
        keep_files.update(read_manifest(root, v)["files"])
    deleted = []
    for mpath in sorted(glob.glob(os.path.join(root, "manifests", "v*.json"))):
        v = int(os.path.basename(mpath)[1:-5])
        if v in keep_versions:
            continue
        for f in read_manifest(root, v)["files"]:
            full = os.path.join(root, f)
            if f not in keep_files and os.path.exists(full):
                os.remove(full)
                deleted.append(f)
        os.remove(mpath)
    return deleted
