"""Hot-cell re-split at 1M (the lifecycle third next to append and
compact): frozen-centroid appends funnel a hot region into one cell;
`split_hot_cells` must restore balance with cost ∝ the hot cells only
(unchanged cells hard-link — no data movement).

Scenario: build k=64 over a 1M corpus, append a 100k blob drawn near
ONE existing vector (all 100k land in that vector's frozen cell —
worst-case append skew), then split. Reports the hot cell's size, the
split wall vs a full rebuild wall, the restored balance, and serving
recall through the split layout for probes drawn from the blob.

Usage: python tools/split_probe.py [--n 1000000] [--blob 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from cloudvectordb_spark.session import get_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--blob", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=64)
    args = ap.parse_args()

    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast
    from tools.scale_probe import synthetic_corpus

    spark = get_session("split-probe")
    root = f"/tmp/cloudvectordb_splitprobe/{args.n}"
    corpus_path = f"{root}/corpus"
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        synthetic_corpus(spark, args.n, 64).write.mode("overwrite").parquet(
            corpus_path
        )
    emb = spark.read.parquet(corpus_path)

    out = {"metric": "split_probe", "n": args.n, "blob": args.blob, "k": args.k}
    t0 = time.perf_counter()
    idx = VectorIndex.build(spark, emb, f"{root}/ivf_{os.getpid()}", k=args.k)
    out["build_s"] = round(time.perf_counter() - t0, 1)

    # blob near one anchor vector -> one frozen cell absorbs all of it
    anchor = np.asarray(
        emb.filter(F.col("vec_id") == 0).first().embedding, dtype=np.float64
    )
    dim = anchor.shape[0]
    base_id = args.n

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]))
            vecs = anchor[None, :] + 1e-3 * rng.standard_normal(
                (len(ids), dim)
            )
            yield pd.DataFrame(
                {
                    "vec_id": ids + base_id,
                    "embedding": list(vecs.astype(np.float32)),
                }
            )

    blob = spark.range(0, args.blob, 1, 16).mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    )
    t0 = time.perf_counter()
    idx.append(blob)
    out["append_s"] = round(time.perf_counter() - t0, 1)

    sizes = {
        int(r.centroid_id): int(r.n)
        for r in idx.vectors.groupBy("centroid_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    mean = sum(sizes.values()) / len(sizes)
    out["hot_cell_rows"] = max(sizes.values())
    out["balance_before"] = round(max(sizes.values()) / mean, 2)

    t0 = time.perf_counter()
    new_idx, stats = idx.split_hot_cells(f"{root}/ivf_split_{os.getpid()}")
    out["split_s"] = round(time.perf_counter() - t0, 1)
    out["hot_cells_split"] = stats["hot_cells_split"]
    out["cells_after"] = stats["cells_after"]

    sizes2 = {
        int(r.centroid_id): int(r.n)
        for r in new_idx.vectors.groupBy("centroid_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    out["balance_after"] = round(
        max(sizes2.values()) * len(sizes2) / sum(sizes2.values()), 2
    )
    n_total = sum(sizes.values())
    assert sum(sizes2.values()) == n_total, "split lost rows"

    # serving through the split layout: 64 blob probes, recall vs exact
    full = idx.vectors.select("vec_id", "embedding")
    probes = spark.createDataFrame(
        [
            (r.vec_id, r.embedding)
            for r in new_idx.vectors.filter(
                F.col("vec_id").between(base_id, base_id + 63)
            )
            .select("vec_id", "embedding")
            .collect()
        ],
        schema="vec_id long, embedding array<float>",
    )
    exact: dict = {}
    for r in exact_knn_fast(full, probes, k=10).collect():
        if r.rank <= 10:
            exact.setdefault(r.probe_id, set()).add(r.neighbor_id)
    t0 = time.perf_counter()
    got: dict = {}
    for r in new_idx.search_batch(probes, k=10, nprobe=8).collect():
        if r.rank <= 10:
            got.setdefault(r.probe_id, set()).add(r.neighbor_id)
    wall = time.perf_counter() - t0
    recall = sum(len(got.get(p, set()) & exact[p]) / 10 for p in exact) / len(
        exact
    )
    out["serve_blob_ms_per_query"] = round(1000 * wall / max(1, len(exact)), 1)
    out["serve_blob_recall_at10"] = round(recall, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
