"""ANN batch-serving probe: Q probe vectors served against a persisted
1M-vector IVF index as ONE strict-nprobe batched plan
(pipeline.ivf_batch_search_strict) vs Q sequential single-probe jobs
(the per-request anti-pattern). Per-probe results are asserted
bit-identical between the two paths BEFORE timing — both use the same
strict per-probe cell set, rounding, and tie order — so the
amortization number compares identical answers.

The vector twin of `text_index_probe.py --batch`: per-job scheduling +
per-probe scan setup dominate the sequential path, so amortization
grows with batch size while the batched plan's cost tracks the sum of
probed cell sizes.

Usage: python tools/ann_batch_probe.py [--n 1000000] [--dim 64]
                                       [--batch 64] [--nprobe 4]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloudvectordb_spark.session import get_session


def ensure_probe_index(spark, n: int, dim: int, root: str) -> str:
    """Build (once, _BUILT-marked) a persisted IVF layout over the
    synthetic corpus — same writer the package index uses."""
    from cloudvectordb_spark.operators.pipeline import (
        build_ivf_assignments,
        write_ivf_index,
    )
    from tools.scale_probe import synthetic_corpus

    path = os.path.join(root, "ivf")
    if os.path.exists(os.path.join(path, "_BUILT")):
        return path
    corpus = synthetic_corpus(spark, n, dim)
    assigned, cents = build_ivf_assignments(
        corpus, k=max(8, n // 2000), seed=42
    )
    write_ivf_index(assigned, cents, path)
    with open(os.path.join(path, "_BUILT"), "w") as f:
        f.write("ok")
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = get_session("ann-batch-probe")
    root = os.path.join(
        "/tmp", "cloudvectordb_annbatch", f"{args.n}_{args.dim}"
    )
    path = ensure_probe_index(spark, args.n, args.dim, root)

    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py
    from cloudvectordb_spark.operators.pipeline import (
        index_centroids,
        ivf_batch_search_strict,
    )
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    vectors = spark.read.parquet(f"{path}/vectors")
    cents = index_centroids(spark, path)

    stride = max(1, args.n // args.batch)
    probe_rows = (
        vectors.filter(F.col("vec_id") % stride == 0)
        .select("vec_id", "embedding")
        .limit(args.batch)
        .collect()
    )

    def seq_one(r):
        cells = nearest_cells_py(r.embedding, cents, args.nprobe)
        pruned = vectors.filter(F.col("centroid_id").isin(cells))
        probe = spark.createDataFrame(
            [(r.vec_id, list(r.embedding))],
            schema="vec_id long, embedding array<float>",
        )
        return exact_knn_fast(pruned, probe, k=args.k)

    def batched():
        return ivf_batch_search_strict(
            spark, vectors, probe_rows, cents, nprobe=args.nprobe, k=args.k
        )

    # equality first: strict semantics on both sides -> bit-identical
    got = {}
    for r in batched().collect():
        got.setdefault(r.probe_id, []).append(
            (r.rank, r.neighbor_id, r.score)
        )
    for pr in probe_rows:
        want = [
            (r.rank, r.neighbor_id, r.score) for r in seq_one(pr).collect()
        ]
        assert sorted(got.get(pr.vec_id, [])) == sorted(
            want
        ), f"probe {pr.vec_id} diverged"

    def timed(fn):
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    seq_s = timed(lambda: [seq_one(r).collect() for r in probe_rows])
    batch_s = timed(lambda: batched().collect())

    n_cells = vectors.select("centroid_id").distinct().count()
    out = {
        "n_vectors": args.n,
        "dim": args.dim,
        "n_cells": n_cells,
        "nprobe": args.nprobe,
        "batch_q": args.batch,
        "sequential_s": seq_s,
        "batched_s": batch_s,
        "amortization_x": round(seq_s / batch_s, 2),
        "per_probe_ms_batched": round(1000 * batch_s / args.batch, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
