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

This is deliberately a minimal single-writer design (concurrent
committers race on the version number and the loser must retry — no
lock service here); the READ side — manifest pinning — is the part the
engine's queries rely on and what the tests pin down. At 100 TB the
manifest lists thousands of files, still KBs of JSON on the driver.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, "manifests", f"v{version:05d}.json")


def latest_version(root: str) -> int:
    with open(os.path.join(root, "LATEST")) as f:
        return int(f.read().strip())


def read_manifest(root: str, version: int | None = None) -> dict:
    if version is None:
        version = latest_version(root)
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _publish(root: str, manifest: dict) -> int:
    version = manifest["version"]
    os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
    mpath = _manifest_path(root, version)
    if os.path.exists(mpath):
        raise FileExistsError(
            f"version {version} already committed (concurrent writer?) — retry"
        )
    tmp = f"{mpath}.tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.rename(tmp, mpath)
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


def commit_build(df: DataFrame, root: str) -> int:
    """Version 1: the initial bulk build."""
    files = _write_data_files(df, root)
    return _publish(root, {"version": 1, "parent": None, "op": "build", "files": files})


def commit_append(df: DataFrame, root: str) -> int:
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
    )


def commit_compact(spark: SparkSession, root: str, num_files: int = 1) -> int:
    """Rewrite the latest version's rows into ``num_files`` files and
    commit them as a new version — logically identical contents, healed
    small-files layout. Old versions keep reading their own files."""
    parent_v = latest_version(root)
    current = read_version(spark, root, parent_v)
    files = _write_data_files(current.coalesce(num_files), root)
    return _publish(
        root,
        {"version": parent_v + 1, "parent": parent_v, "op": "compact", "files": files},
    )


def read_version(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Time-travel read: exactly the files the manifest pins — a reader
    holding version N never sees a concurrent writer's files."""
    m = read_manifest(root, version)
    paths = [os.path.join(root, f) for f in m["files"]]
    return spark.read.parquet(*paths)


def vacuum(root: str, keep_last: int = 2) -> list[str]:
    """Delete data files referenced ONLY by manifests older than the
    ``keep_last`` most recent versions (and drop those manifests).
    Returns the deleted files. The single destructive operation."""
    latest = latest_version(root)
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
