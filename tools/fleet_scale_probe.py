"""Fleet lifecycle at rehearsal scale: CorpusPipeline.run_sharded /
append_sharded / VectorIndex.search_sharded measured COMPOSED on a
10M-doc corpus (round 11 — the fixture-pinned fleet facade's scale
evidence, completing the story the monolithic rehearsal told in
tools/e2e_scale_probe.py).

The fleet topology is the 100 TB shape: one IVF tree never holds the
fleet's vectors, so the corpus is globally deduped ONCE (a duplicate
pair must die even when its docs land on different shards), survivors
md5-split across S independent index builds, and serving scatter-
gathers a bounded S*k-row merge. This probe measures each leg and
asserts the handoffs:

  ingest   N docs, planted near-dups (the rehearsal corpus)
  build    run_sharded: global dedup -> embed -> S auto-k builds
           handoffs: union(shards) == survivors; shards disjoint;
           md5 split balanced (max/mean shard rows reported)
  serve    search_sharded over the S shards, concurrent vs sequential
           fan-out, recall@10 vs exact BLAS top-k on the union corpus
  append   append_sharded: ONE global 100k-delta dedup, survivors
           routed to their md5 shard; planted cross-corpus dup recall
           and delta-proportional wall (vs the build's full-corpus wall)

Stages are idempotent (stats JSON per stage under --root) so the probe
survives this container's command caps via --stages re-invocation; on
an uncapped box one command runs the whole rehearsal.

Usage:
  python tools/fleet_scale_probe.py --n 10000000 --shards 4
  python tools/fleet_scale_probe.py --n 10000000 --stages serve,append
  python tools/fleet_scale_probe.py --n 10000000 --stages report
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

DUP_EVERY = 10  # doc i%10==1 near-dups doc i-1 (rehearsal planting)
SERVE_BATCH = 64
NPROBE = 8
TOPK = 10


def _stats_path(root: str, stage: str) -> str:
    return os.path.join(root, f"stats_{stage}.json")


def _done(root: str, stage: str) -> bool:
    return os.path.exists(_stats_path(root, stage))


def _write_stats(root: str, stage: str, stats: dict) -> None:
    os.makedirs(root, exist_ok=True)
    with open(_stats_path(root, stage), "w") as f:
        json.dump(stats, f)
    print(f"[{stage}] {json.dumps(stats)}", file=sys.stderr)



def _union_shards(spark, paths: list):
    """Union the shard layouts (each is its own partitioned root, so a
    single multi-path read would conflict on partition discovery)."""
    from functools import reduce

    frames = [spark.read.parquet(f"{p}/vectors") for p in paths]
    return reduce(lambda a, b: a.unionByName(b), frames)


def _shard_paths(root: str, shards: int) -> list:
    return [f"{root}/shard{s}" for s in range(shards)]


def stage_ingest(spark, root: str, n: int) -> None:
    from tools.minhash_scale_probe import synthetic_docs

    t0 = time.perf_counter()
    synthetic_docs(spark, n).write.mode("overwrite").parquet(f"{root}/docs")
    wall = time.perf_counter() - t0
    rows = spark.read.parquet(f"{root}/docs").count()
    assert rows == n
    _write_stats(root, "ingest", {"wall_s": round(wall, 1), "rows": rows})


def stage_build(spark, root: str, n: int, shards: int, tau: float) -> None:
    from cloudvectordb_spark.api import CorpusPipeline

    docs = spark.read.parquet(f"{root}/docs")
    paths = _shard_paths(root, shards)
    t0 = time.perf_counter()
    out = CorpusPipeline.run_sharded(
        spark, docs, paths, tau=tau, hasher="fast"
    )
    wall = time.perf_counter() - t0

    # fleet handoffs beyond what run_sharded itself asserts: the shard
    # layouts on DISK are disjoint and their union is the survivor set
    union = _union_shards(spark, paths)
    n_union = union.count()
    n_distinct = union.select("vec_id").distinct().count()
    if not (n_union == n_distinct == out["survivors"]):
        raise RuntimeError(
            f"fleet layout violated: union={n_union} "
            f"distinct={n_distinct} survivors={out['survivors']}"
        )
    rows = out["shard_rows"]
    _write_stats(
        root,
        "build",
        {
            "wall_s": round(wall, 1),
            "docs": out["docs"],
            "survivors": out["survivors"],
            "removed": out["removed"],
            "shards": shards,
            "shard_rows": rows,
            "shard_balance_max_over_mean": round(
                max(rows) / (sum(rows) / len(rows)), 3
            ),
            "docs_per_s": int(n / wall),
        },
    )


def stage_serve(spark, root: str, n: int, shards: int) -> None:
    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    paths = _shard_paths(root, shards)
    indexes = [VectorIndex.open(spark, p) for p in paths]
    union = _union_shards(spark, paths)

    stride = max(1, n // SERVE_BATCH)
    probes = (
        union.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(SERVE_BATCH)
    )
    probes.persist().count()

    exact: dict = {}
    t0 = time.perf_counter()
    for r in exact_knn_fast(union, probes, k=TOPK).collect():
        exact.setdefault(r.probe_id, set()).add(r.neighbor_id)
    exact_s = time.perf_counter() - t0

    def run(concurrent: bool):
        # search_sharded fans out EAGERLY (per-shard collects inside the
        # call), so the timed region must include the call itself, not
        # just the merged frame's collect
        def once():
            return VectorIndex.search_sharded(
                indexes, probes, k=TOPK, nprobe=NPROBE,
                concurrent=concurrent,
            ).collect()

        once()  # warm (page cache, codegen)
        t0 = time.perf_counter()
        rows = once()
        wall = time.perf_counter() - t0
        got: dict = {}
        for r in rows:
            got.setdefault(r.probe_id, set()).add(r.neighbor_id)
        rec = sum(
            len(got.get(p, set()) & exact[p]) / TOPK for p in exact
        ) / len(exact)
        return wall, rec, got

    seq_s, seq_rec, seq_got = run(concurrent=False)
    con_s, con_rec, con_got = run(concurrent=True)
    if seq_got != con_got:
        raise RuntimeError(
            "concurrent fan-out changed results — merge must be "
            "order-insensitive"
        )
    probes.unpersist()
    _write_stats(
        root,
        "serve",
        {
            "batch": SERVE_BATCH,
            "nprobe": NPROBE,
            "exact_s": round(exact_s, 1),
            "sequential_s": round(seq_s, 2),
            "concurrent_s": round(con_s, 2),
            "speedup": round(seq_s / con_s, 2),
            "ms_per_query_concurrent": round(1000 * con_s / SERVE_BATCH, 1),
            "recall_at_10": round(con_rec, 4),
        },
    )


def stage_append(
    spark, root: str, n: int, shards: int, n_delta: int
) -> None:
    from cloudvectordb_spark.api import CorpusPipeline
    from tools.append_probe import synthetic_delta

    paths = _shard_paths(root, shards)
    delta = synthetic_delta(spark, n, n_delta)
    delta.write.mode("overwrite").parquet(f"{root}/delta_docs")
    delta = spark.read.parquet(f"{root}/delta_docs")

    before = [
        spark.read.parquet(f"{p}/vectors").count() for p in paths
    ]
    t0 = time.perf_counter()
    out = CorpusPipeline.append_sharded(spark, paths, delta)
    wall = time.perf_counter() - t0
    after = [spark.read.parquet(f"{p}/vectors").count() for p in paths]

    grew = [a - b for b, a in zip(before, after, strict=True)]
    # delta survivors land on their md5 shard; demoted canonicals are
    # deleted from whichever shard held them — net fleet growth is
    # exactly survivors - demoted ("indexed" is the post-append total)
    if sum(grew) != out["survivors"] - out["demoted"]:
        raise RuntimeError(
            f"fleet routing violated: shard growth {grew} vs "
            f"survivors={out['survivors']} demoted={out['demoted']}"
        )
    n_planted = n_delta // DUP_EVERY
    build_wall = json.load(open(_stats_path(root, "build")))["wall_s"]
    _write_stats(
        root,
        "append",
        {
            "wall_s": round(wall, 1),
            "delta": n_delta,
            "delta_docs_per_s": int(n_delta / wall),
            "survivors": out["survivors"],
            "removed": out["removed"],
            "demoted": out["demoted"],
            "indexed": out["indexed"],
            "planted_cross_dups": n_planted,
            "planted_recall": round(out["removed"] / max(1, n_planted), 4),
            "shard_growth": grew,
            "rebuild_wall_s": build_wall,
            "speedup_vs_rebuild": round(build_wall / wall, 1),
        },
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--delta", type=int, default=100_000)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--root", default=None)
    ap.add_argument(
        "--stages", default="ingest,build,serve,append,report"
    )
    args = ap.parse_args()
    root = args.root or f"/tmp/cloudvectordb_fleet/{args.n}"
    stages = args.stages.split(",")

    spark = get_session("fleet-scale-probe")
    try:
        if "ingest" in stages and not _done(root, "ingest"):
            stage_ingest(spark, root, args.n)
        if "build" in stages and not _done(root, "build"):
            stage_build(spark, root, args.n, args.shards, args.tau)
        if "serve" in stages and not _done(root, "serve"):
            stage_serve(spark, root, args.n, args.shards)
        if "append" in stages and not _done(root, "append"):
            stage_append(spark, root, args.n, args.shards, args.delta)
        if "report" in stages:
            report = {"metric": "fleet_rehearsal", "n": args.n,
                      "shards": args.shards}
            total = 0.0
            for st in ("ingest", "build", "serve", "append"):
                if _done(root, st):
                    s = json.load(open(_stats_path(root, st)))
                    report[st] = s
                    total += s.get("wall_s", 0)
            report["total_wall_s"] = round(total, 1)
            print(json.dumps(report))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
