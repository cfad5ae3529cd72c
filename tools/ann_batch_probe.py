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
    ap.add_argument(
        "--skew",
        action="store_true",
        help="all probes are copies of one vector (every probe selects "
        "the SAME nprobe cells — the hot-cell worst case); times the "
        "batched plan with and without hot-cell rebalance and reports "
        "both against the balanced-batch number",
    )
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

    if args.skew:
        from pyspark.sql import Row

        from cloudvectordb_spark.operators.pipeline import (
            ivf_batch_search_strict as strict,
        )

        # COMPACTED layout for the skew test: the fresh build writes
        # each cell as ~32 small files (one per writer task), which
        # accidentally hands the scan dozens of splits per cell and
        # hides the hot-cell serialization. A served index is compacted
        # (one file per cell) — exactly the layout where a hot cell's
        # candidates funnel through one or two scan tasks.
        cpath = os.path.join(root, "ivf_compact")
        if not os.path.exists(os.path.join(cpath, "_BUILT")):
            spark.read.parquet(f"{path}/vectors").repartition(
                "centroid_id"
            ).write.mode("overwrite").partitionBy("centroid_id").parquet(
                f"{cpath}/vectors"
            )
            with open(os.path.join(cpath, "_BUILT"), "w") as f:
                f.write("ok")
        vectors = spark.read.parquet(f"{cpath}/vectors")

        # every probe = the SAME vector under a fresh id outside the
        # corpus id space -> all Q probes select one identical nprobe
        # cell set; that cell's tasks do Q x the matmul work
        base = list(probe_rows[0].embedding)
        skewed = [
            Row(vec_id=10**9 + i, embedding=base) for i in range(args.batch)
        ]

        def run(rows, rebalance):
            t0 = time.time()
            strict(
                spark, vectors, rows, cents,
                nprobe=args.nprobe, k=args.k, rebalance_hot=rebalance,
            ).collect()
            return round(time.time() - t0, 3)

        for rows, reb in ((skewed, True), (skewed, False), (probe_rows, True)):
            run(rows, reb)  # warm-up
        out = {
            "metric": "ann_batch_skew",
            "n_vectors": args.n,
            "batch_q": args.batch,
            "nprobe": args.nprobe,
            "balanced_s": min(run(probe_rows, True) for _ in range(2)),
            "skew_serialized_s": min(run(skewed, False) for _ in range(2)),
            "skew_rebalanced_s": min(run(skewed, True) for _ in range(2)),
        }
        out["parity_vs_balanced"] = round(
            out["skew_rebalanced_s"] / out["balanced_s"], 2
        )
        out["rebalance_speedup_x"] = round(
            out["skew_serialized_s"] / out["skew_rebalanced_s"], 2
        )
        print(json.dumps(out))
        return 0

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
