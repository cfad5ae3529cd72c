"""Layout retention probe (round 12, verdict #2): run a realistic
index-family lifecycle at scale — build, reader-pinned snapshot,
frozen-centroid append, hot-cell split (new root), compaction (new
root), post-compact snapshot — then reclaim with
`VectorIndex.vacuum_layouts` and measure what actually frees.

The point of the hard-link-aware accounting: snapshots share data
blocks with the tree they pinned, so deleting a superseded snapshot
whose files are still linked from a survivor reclaims ~nothing
(bytes_shared), while deleting a superseded REWRITE generation (split
or compact output that lost the race to a newer generation) frees its
whole unshared tree (bytes_reclaimed). The probe prints both, plus the
family's on-disk footprint before/after.

Usage: python tools/layout_vacuum_probe.py [--n 1000000] [--delta 100000]
                                           [--k 512]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloudvectordb_spark.session import get_session


def du(path: str) -> int:
    """Apparent bytes under path, each inode counted ONCE (the real
    footprint of a hard-linked family, unlike a naive size sum)."""
    seen = set()
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            try:
                st = os.stat(os.path.join(dirpath, fn))
            except FileNotFoundError:
                continue
            if st.st_ino in seen:
                continue
            seen.add(st.st_ino)
            total += st.st_size
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--delta", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=512)
    args = ap.parse_args()

    spark = get_session("layout-vacuum-probe")
    from cloudvectordb_spark.api import VectorIndex
    from tools.scale_probe import synthetic_corpus

    fam = f"/tmp/cloudvectordb_vacuumprobe/{args.n}"
    if os.path.exists(fam):
        shutil.rmtree(fam)
    os.makedirs(fam)

    out = {"metric": "layout_vacuum", "n": args.n, "delta": args.delta}

    corpus = synthetic_corpus(spark, args.n + args.delta, 64)
    base = corpus.filter(F.col("vec_id") < args.n)
    delta = corpus.filter(F.col("vec_id") >= args.n)

    t0 = time.perf_counter()
    gen0 = VectorIndex.build(spark, base, f"{fam}/gen0", k=args.k)
    out["build_s"] = round(time.perf_counter() - t0, 1)

    # reader fleet pins the pre-append layout
    t0 = time.perf_counter()
    snap0 = gen0.snapshot(f"{fam}/snap0").pin()
    out["snapshot_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    gen0.append(delta)
    out["append_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    gen1, split_stats = gen0.split_hot_cells(f"{fam}/gen1", factor=1.5)
    out["split_s"] = round(time.perf_counter() - t0, 1)
    out["cells_split"] = split_stats.get("hot_cells_split", 0)

    t0 = time.perf_counter()
    gen2 = gen1.compact(f"{fam}/gen2")
    out["compact_s"] = round(time.perf_counter() - t0, 1)
    snap1 = gen2.snapshot(f"{fam}/snap1")  # unpinned, newest

    out["family_bytes_before"] = du(fam)
    n_before = gen2.vectors.count()

    # retention: live = gen2; snap0 pinned; keep the newest 1 unpinned
    # (snap1); gen0 and gen1 are superseded generations -> reclaimed
    t0 = time.perf_counter()
    v = VectorIndex.vacuum_layouts(fam, gen2.path, keep=1)
    out["vacuum_s"] = round(time.perf_counter() - t0, 1)
    out["deleted"] = [os.path.basename(p) for p in v["deleted"]]
    out["kept"] = [os.path.basename(p) for p in v["kept"]]
    out["refused_leased"] = [os.path.basename(p) for p in v["refused_leased"]]
    out["bytes_reclaimed"] = v["bytes_reclaimed"]
    out["bytes_shared"] = v["bytes_shared"]
    out["family_bytes_after"] = du(fam)

    # the pinned snapshot and the live tree still serve, contents intact
    assert gen2.vectors.count() == n_before
    probes = base.limit(8)
    assert snap0.search(probes, k=5, nprobe=8).count() > 0
    assert snap1.path in v["kept"] or os.path.isdir(snap1.path)
    out["post_vacuum_serving_ok"] = True
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
