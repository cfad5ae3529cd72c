"""Multi-tenant serving fairness probe (round 12, verdict #5): N
concurrent batch callers — one HEAVY tenant saturating the box with
large BM25 batches, three LIGHT tenants issuing small text/vector
queries — through Spark's FAIR scheduler pools vs the default shared
FIFO.

Under FIFO every light query queues behind whatever heavy stages are
already submitted: light-tenant latency inflates toward the heavy
batch wall. Under FAIR (`SPARK_GRAFT_SCHEDULER=FAIR` + one
`scheduler_pool` per caller) task slots round-robin between pools, so
the light tenants keep near-solo latency while the heavy tenant
stretches — the starvation-proofing a shared serving fleet needs.
Results are scheduling-independent: every tenant's result hash is
asserted stable across iterations and printed for cross-mode
comparison.

Usage: python tools/multitenant_probe.py --mode FIFO|FAIR
         [--n 1000000] [--duration 45]
Prints one JSON line per run; run both modes for the BASELINE table.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _hash_rows(rows) -> str:
    return hashlib.md5(
        json.dumps(sorted(tuple(r) for r in rows)).encode()
    ).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["FIFO", "FAIR"], required=True)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--duration", type=float, default=45.0)
    ap.add_argument("--k", type=int, default=512)
    args = ap.parse_args()

    # must be set BEFORE the JVM starts — the scheduler mode is fixed
    # at SparkContext init
    if args.mode == "FAIR":
        os.environ["SPARK_GRAFT_SCHEDULER"] = "FAIR"
    from pyspark.sql import functions as F

    from cloudvectordb_spark.session import get_session, scheduler_pool

    spark = get_session(f"multitenant-{args.mode.lower()}")
    assert (
        spark.sparkContext.getConf().get("spark.scheduler.mode", "FIFO")
        == args.mode
    )
    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.operators.search import (
        batch_topk_per_query,
        bm25_scores_batch,
        ensure_text_index,
    )
    from tools.scale_probe import synthetic_corpus
    from tools.text_index_probe import _probe_batch, ensure_docs

    # shared fixtures (idempotent across the two mode runs)
    troot = f"/tmp/cloudvectordb_textprobe/{args.n}"
    sf_dir = os.path.dirname(ensure_docs(spark, args.n, troot))
    ensure_text_index(spark, sf_dir)
    vroot = f"/tmp/cloudvectordb_mtprobe/{args.n}"
    if not os.path.exists(f"{vroot}/ivf/vectors/_SUCCESS"):
        VectorIndex.build(
            spark, synthetic_corpus(spark, args.n, 64), f"{vroot}/ivf",
            k=args.k,
        )
    vidx = VectorIndex.open(spark, f"{vroot}/ivf")
    vprobes = spark.read.parquet(f"{vroot}/ivf/vectors").filter(
        F.col("vec_id") < 8
    ).select("vec_id", "embedding").collect()
    vprobes_df = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in vprobes],
        schema="vec_id long, embedding array<float>",
    )

    heavy_batch = _probe_batch(128)
    light_batch_a = _probe_batch(4)
    light_batch_b = tuple((qid + 500, ts) for qid, ts in _probe_batch(4))

    def heavy_fn():
        return batch_topk_per_query(
            bm25_scores_batch(spark, sf_dir, heavy_batch), 10
        ).collect()

    def light_text_a():
        return batch_topk_per_query(
            bm25_scores_batch(spark, sf_dir, light_batch_a), 10
        ).collect()

    def light_text_b():
        return batch_topk_per_query(
            bm25_scores_batch(spark, sf_dir, light_batch_b), 10
        ).collect()

    def light_vec():
        return vidx.search_batch(vprobes_df, k=10, nprobe=4).collect()

    tenants = {
        "heavy_text": heavy_fn,
        "light_text_a": light_text_a,
        "light_text_b": light_text_b,
        "light_vector": light_vec,
    }

    # solo warm-up + reference hashes + solo latencies (no contention)
    solo: dict = {}
    hashes: dict = {}
    for name, fn in tenants.items():
        fn()  # warm
        t0 = time.perf_counter()
        rows = fn()
        solo[name] = round((time.perf_counter() - t0) * 1000, 1)
        hashes[name] = _hash_rows(rows)

    lat: dict = {name: [] for name in tenants}
    stable = {name: True for name in tenants}
    deadline = time.monotonic() + args.duration

    def run_tenant(name, fn):
        with scheduler_pool(spark, name):
            while time.monotonic() < deadline:
                t0 = time.perf_counter()
                rows = fn()
                lat[name].append((time.perf_counter() - t0) * 1000)
                stable[name] = stable[name] and (
                    _hash_rows(rows) == hashes[name]
                )

    threads = [
        threading.Thread(target=run_tenant, args=(n, f), daemon=True)
        for n, f in tenants.items()
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert all(stable.values()), f"results changed under contention: {stable}"
    pct = lambda xs, p: round(  # noqa: E731
        statistics.quantiles(xs, n=100)[p - 1], 1
    ) if len(xs) >= 2 else round(xs[0], 1)
    out = {
        "metric": "multitenant_fairness",
        "mode": args.mode,
        "n": args.n,
        "duration_s": args.duration,
        "results_stable": True,
        "result_hashes": hashes,
        "tenants": {
            name: {
                "requests": len(xs),
                "solo_ms": solo[name],
                "p50_ms": round(statistics.median(xs), 1),
                "p95_ms": pct(xs, 95),
                "p50_vs_solo_x": round(statistics.median(xs) / solo[name], 2),
            }
            for name, xs in lat.items()
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
