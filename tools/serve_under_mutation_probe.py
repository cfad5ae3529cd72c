"""Serve-under-mutation probe (round 12, verdict #3): a continuous
query stream against a PINNED reader snapshot WHILE the live index
takes the full mutation gamut — frozen-centroid append, in-place
delete (cell rewrites that REMOVE the files the snapshot hard-links),
hot-cell split and compaction (new-root publishes) — asserting every
serving batch stays BIT-STABLE across the writers, and measuring the
latency jitter the concurrent writers impose vs a quiet baseline.

This is the reader-isolation contract measured, not argued: the
snapshot's hard links keep the pinned files alive no matter what the
live tree rewrites or deletes, so results can't tear; the only thing
writers can steal is CPU, which shows up as latency jitter — the
number a serving fleet actually provisions for.

Usage: python tools/serve_under_mutation_probe.py [--n 1000000]
         [--delta 100000] [--k 512] [--batch 32] [--topk 10]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloudvectordb_spark.session import get_session


def _result_hash(rows) -> str:
    canon = sorted(
        (int(r.probe_id), int(r.rank), int(r.neighbor_id), round(float(r.score), 6))
        for r in rows
    )
    return hashlib.md5(json.dumps(canon).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--delta", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--quiet-batches", type=int, default=8)
    ap.add_argument(
        "--pools",
        action="store_true",
        help="writer isolation (round-13 verdict #4): FAIR scheduler "
        "with the serving batches in the high-weight/minShare "
        "'serving' pool and the mutation chain in the low-share "
        "'maintenance' pool — the p95 tail the shared-FIFO run shows "
        "is the split phase stealing cores",
    )
    args = ap.parse_args()

    if args.pools:
        os.environ["SPARK_GRAFT_SCHEDULER"] = "FAIR"
    spark = get_session("serve-under-mutation")
    from cloudvectordb_spark.session import scheduler_pool

    class _noop:
        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    serve_pool = (
        (lambda: scheduler_pool(spark, "serving")) if args.pools else _noop
    )
    write_pool = (
        (lambda: scheduler_pool(spark, "maintenance")) if args.pools else _noop
    )
    from cloudvectordb_spark.api import VectorIndex
    from tools.scale_probe import synthetic_corpus

    fam = f"/tmp/cloudvectordb_mutprobe/{args.n}"
    if os.path.exists(fam):
        shutil.rmtree(fam)
    os.makedirs(fam)

    corpus = synthetic_corpus(spark, args.n + args.delta, 64)
    base = corpus.filter(F.col("vec_id") < args.n)
    delta = corpus.filter(F.col("vec_id") >= args.n)

    out = {
        "metric": "serve_under_mutation",
        "n": args.n,
        "delta": args.delta,
        "pools": bool(args.pools),
    }
    t0 = time.perf_counter()
    live = VectorIndex.build(spark, base, f"{fam}/live", k=args.k)
    out["build_s"] = round(time.perf_counter() - t0, 1)
    snap = live.snapshot(f"{fam}/snap").pin()

    probes = base.filter(F.col("vec_id") < args.batch)

    def serve_once() -> tuple[float, str]:
        with serve_pool():
            t = time.perf_counter()
            rows = snap.search_batch(
                probes, k=args.topk, nprobe=args.nprobe
            ).collect()
            return time.perf_counter() - t, _result_hash(rows)

    # quiet baseline (first call warms the plan/code paths, untimed)
    serve_once()
    quiet = []
    want_hash = None
    for _ in range(args.quiet_batches):
        w, h = serve_once()
        quiet.append(w * 1000)
        want_hash = want_hash or h
        assert h == want_hash, "serving is nondeterministic even when quiet"

    # the writer chain: append -> delete (cell REWRITES: the old files
    # the snapshot links are deleted from the live tree) -> split -> compact
    writer_walls: dict = {}
    writer_err: list = []

    def writer():
        try:
            ctx = write_pool()
            ctx.__enter__()
            t = time.perf_counter()
            live.append(delta)
            writer_walls["append_s"] = round(time.perf_counter() - t, 1)
            t = time.perf_counter()
            live.delete(list(range(200, 1200)))
            writer_walls["delete_s"] = round(time.perf_counter() - t, 1)
            t = time.perf_counter()
            live.split_hot_cells(f"{fam}/gen1", factor=1.5)
            writer_walls["split_s"] = round(time.perf_counter() - t, 1)
            t = time.perf_counter()
            VectorIndex(spark, f"{fam}/gen1").compact(f"{fam}/gen2")
            writer_walls["compact_s"] = round(time.perf_counter() - t, 1)
        except BaseException as e:  # surfaced after the join
            writer_err.append(repr(e))
        finally:
            ctx.__exit__(None, None, None)

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    busy = []
    stable = True
    while th.is_alive():
        w, h = serve_once()
        busy.append(w * 1000)
        stable = stable and (h == want_hash)
    th.join()
    assert not writer_err, f"writer failed: {writer_err}"
    # a few post-swap batches: live is now mutated + gen2 published,
    # the pinned snapshot must STILL serve the pre-mutation results
    post = []
    for _ in range(4):
        w, h = serve_once()
        post.append(w * 1000)
        stable = stable and (h == want_hash)
    assert stable, "snapshot results changed under mutation"

    pct = lambda xs, p: round(  # noqa: E731
        statistics.quantiles(xs, n=100)[p - 1], 1
    ) if len(xs) >= 2 else round(xs[0], 1)
    out.update(
        {
            "writer": writer_walls,
            "quiet_batches": len(quiet),
            "busy_batches": len(busy),
            "quiet_p50_ms": round(statistics.median(quiet), 1),
            "quiet_p95_ms": pct(quiet, 95),
            "busy_p50_ms": round(statistics.median(busy), 1),
            "busy_p95_ms": pct(busy, 95),
            "post_p50_ms": round(statistics.median(post), 1),
            "jitter_p50_x": round(
                statistics.median(busy) / statistics.median(quiet), 2
            ),
            "bit_stable": True,
        }
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
