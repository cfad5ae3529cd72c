"""Text-index retention probe (round-13 verdict #5): build three
generations of a REAL v5 artifact tree (the rebuild churn a fixture
regeneration or format bump leaves behind), hard-link-snapshot and PIN
one, vacuum the family, and prove:

- live + pinned trees survive; superseded trees reclaim;
- byte accounting is hard-link-aware (blocks shared with the pinned
  snapshot count as shared, not reclaimed);
- the PINNED tree still serves (bit-stable BM25 batch) after vacuum.

Usage: python tools/text_vacuum_probe.py [--n 100000]
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

from cloudvectordb_spark.session import get_session
from tools.text_index_probe import _probe_batch, ensure_docs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    args = ap.parse_args()

    spark = get_session("text-vacuum-probe")
    from pyspark.sql import functions as F

    from cloudvectordb_spark.operators.pipeline import pin_layout
    from cloudvectordb_spark.operators.search import (
        _write_text_artifacts,
        sharded_bm25_topk_batch_paths,
        vacuum_text_indexes,
    )

    root = f"/tmp/cloudvectordb_textvacuum/{args.n}"
    shutil.rmtree(root, ignore_errors=True)
    fam = f"{root}/family"
    os.makedirs(fam)
    sf_dir = os.path.dirname(ensure_docs(spark, args.n, root))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    out = {"metric": "text_vacuum", "n": args.n}
    # three rebuild generations (each slightly different corpus slice,
    # like successive fixture regenerations), oldest first
    t0 = time.perf_counter()
    for i, cut in enumerate((args.n - 2000, args.n - 1000, args.n)):
        p = os.path.join(fam, f"gen{i}")
        _write_text_artifacts(spark, docs.filter(F.col("doc_id") < cut), p)
        open(os.path.join(p, "_DONE"), "w").close()
    out["build_3gens_s"] = round(time.perf_counter() - t0, 1)
    live = os.path.join(fam, "gen2")

    # a reader fleet still serves gen0 through a PINNED hard-link
    # snapshot (zero-copy: every file links gen0's inodes)
    snap = os.path.join(fam, "snap_gen0")
    for dirpath, _dirs, files in os.walk(os.path.join(fam, "gen0")):
        rel = os.path.relpath(dirpath, os.path.join(fam, "gen0"))
        os.makedirs(os.path.join(snap, rel), exist_ok=True)
        for fn in files:
            os.link(
                os.path.join(dirpath, fn), os.path.join(snap, rel, fn)
            )
    pin_layout(snap)

    batch = _probe_batch(16)
    pre = {
        tuple(r)
        for r in sharded_bm25_topk_batch_paths(spark, [snap], batch, 10)
        .select("query_id", "doc_id", "bm25", "rank")
        .collect()
    }

    res = vacuum_text_indexes(fam, live_paths=(live,), keep=0)
    out["kept"] = sorted(os.path.basename(p) for p in res["kept"])
    out["deleted"] = sorted(os.path.basename(p) for p in res["deleted"])
    out["bytes_reclaimed_mb"] = round(res["bytes_reclaimed"] / 2**20, 1)
    out["bytes_shared_mb"] = round(res["bytes_shared"] / 2**20, 1)
    out["files_deleted"] = res["files_deleted"]
    assert out["kept"] == ["gen2", "snap_gen0"], out["kept"]
    assert out["deleted"] == ["gen0", "gen1"], out["deleted"]

    # the pinned snapshot serves IDENTICALLY after its source tree
    # (gen0) was reclaimed — hard links keep the blocks alive
    post = {
        tuple(r)
        for r in sharded_bm25_topk_batch_paths(spark, [snap], batch, 10)
        .select("query_id", "doc_id", "bm25", "rank")
        .collect()
    }
    assert post == pre and len(post) > 0
    out["pinned_serves_after_vacuum"] = True
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
