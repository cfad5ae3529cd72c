"""100M-vector decade probe (round 12, verdict #6): one more order of
magnitude on the vector hot paths, on one box.

Confirms at 100M × dim-64 (~26 GB of raw vectors):
- BUILD stays flat-in-k: the routed two-level IMI assignment is timed
  at two k values spanning ~3× (write-free, so the comparison is pure
  trainer+assign cost), then the real partitioned layout is written
  once at the auto-k (n/4096) the facade would pick;
- SERVING stays ∝ probed cells: strict-nprobe batch latency at
  nprobe 2/8/32 against the partition-pruned layout, plus recall@10
  of the nprobe=32 tier vs exact BLAS over the full corpus;
- the APPEND floor amortizes: one 1M frozen-centroid append (1% of
  corpus) timed against the build wall.

Stage-idempotent: each stage persists its artifact/stats and is
skipped on re-run (long probes get killed; re-invoke to continue).
Run under tmux with SPARK_DRIVER_MEMORY=48g (container notes).

Usage: python tools/decade_probe.py [--n 100000000] [--delta 1000000]
Prints one JSON line per completed stage and a final combined line.
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

DIM = 64


def _load_stats(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _save_stats(path: str, stats: dict) -> None:
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.rename(tmp, path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--delta", type=int, default=1_000_000)
    ap.add_argument("--k-scan", default="8192")
    ap.add_argument("--probes", type=int, default=32)
    ap.add_argument("--recall-probes", type=int, default=8)
    ap.add_argument("--parts", type=int, default=512)
    args = ap.parse_args()

    spark = get_session("decade-probe")
    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.operators import pipeline as P
    from tools.scale_probe import synthetic_corpus

    root = f"/tmp/cloudvectordb_decade/{args.n}"
    os.makedirs(root, exist_ok=True)
    stats_path = f"{root}/stats.json"
    stats = _load_stats(stats_path)
    stats.update({"metric": "decade_probe", "n": args.n, "dim": DIM})

    corpus_path = f"{root}/corpus"
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        t0 = time.perf_counter()
        synthetic_corpus(spark, args.n + args.delta, DIM, parts=args.parts).write.mode(
            "overwrite"
        ).parquet(corpus_path)
        stats["corpus_write_s"] = round(time.perf_counter() - t0, 1)
        _save_stats(stats_path, stats)
        print(json.dumps({"stage": "corpus", "s": stats["corpus_write_s"]}))
    corpus = spark.read.parquet(corpus_path)
    base = corpus.filter(F.col("vec_id") < args.n)
    delta = corpus.filter(F.col("vec_id") >= args.n)

    auto_k = max(8, min(65536, args.n // 4096))
    stats["auto_k"] = auto_k

    # flat-in-k evidence: routed assign+count at a smaller k, write-free
    for k in (int(x) for x in args.k_scan.split(",") if x):
        key = f"assign_k{k}_s"
        if key not in stats:
            t0 = time.perf_counter()
            assigned, _cents = P.build_ivf_assignments(base, k=k)
            n_cells = (
                assigned.groupBy("centroid_id").count().count()
            )
            stats[key] = round(time.perf_counter() - t0, 1)
            stats[f"assign_k{k}_cells"] = int(n_cells)
            _save_stats(stats_path, stats)
            print(json.dumps({"stage": key, "s": stats[key]}))

    index_path = f"{root}/ivf"
    if not os.path.exists(f"{index_path}/_BUILT"):
        t0 = time.perf_counter()
        assigned, cents = P.build_ivf_assignments(base, k=auto_k)
        stats["build_assign_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        # WAVE write: this box's usable disk (~94 GB) cannot hold
        # corpus (27 GB) + one full 27 GB shuffle + the 27 GB output
        # simultaneously, so the partitioned write lands in 4 waves —
        # live shuffle stays ~7 GB while the output accrues (each wave
        # re-runs the cheap assignment scan; the trainer ran once
        # above). On a cluster with real shuffle capacity this is
        # write_ivf_index verbatim; results identical (4 files/cell
        # instead of 1 — compaction heals that, and probes prune by
        # dir either way).
        waves = 4
        for w in range(waves):
            (
                assigned.filter(F.pmod(F.col("vec_id"), waves) == w)
                .repartition("centroid_id")
                .write.mode("append")
                .partitionBy("centroid_id")
                .parquet(f"{index_path}/vectors")
            )
        cents.coalesce(1).write.mode("overwrite").parquet(
            f"{index_path}/centroids"
        )
        with open(f"{index_path}/_BUILT", "w") as f:
            f.write("ok")
        stats["build_write_s"] = round(time.perf_counter() - t0, 1)
        stats["build_write_waves"] = waves
        _save_stats(stats_path, stats)
        print(
            json.dumps(
                {
                    "stage": "build",
                    "assign_s": stats["build_assign_s"],
                    "write_s": stats["build_write_s"],
                }
            )
        )
    idx = VectorIndex.open(spark, index_path)

    if "serving" not in stats:
        cents = idx.centroids()
        probes = spark.createDataFrame(
            [
                (int(r.vec_id), r.embedding)
                for r in base.filter(
                    F.col("vec_id") < args.probes
                ).collect()
            ],
            schema="vec_id long, embedding array<float>",
        )
        serving = {"n_cells": len(cents)}
        for nprobe in (2, 8, 32):
            idx.search_batch(probes, k=10, nprobe=nprobe).count()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                idx.search_batch(probes, k=10, nprobe=nprobe).collect()
                best = min(best, time.perf_counter() - t0)
            serving[f"nprobe{nprobe}_ms_per_q"] = round(
                best / args.probes * 1000, 1
            )
        stats["serving"] = serving
        _save_stats(stats_path, stats)
        print(json.dumps({"stage": "serving", **serving}))

    if "recall_at_10" not in stats:
        from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

        rp = [
            (int(r.vec_id), r.embedding)
            for r in base.filter(
                F.col("vec_id") < args.recall_probes
            ).collect()
        ]
        probes_df = spark.createDataFrame(
            rp, schema="vec_id long, embedding array<float>"
        )
        t0 = time.perf_counter()
        exact = {
            (int(r.probe_id), int(r.neighbor_id))
            for r in exact_knn_fast(base, probes_df, k=10).collect()
        }
        stats["exact_scan_s"] = round(time.perf_counter() - t0, 1)
        approx = {
            (int(r.probe_id), int(r.neighbor_id))
            for r in idx.search_batch(probes_df, k=10, nprobe=32).collect()
        }
        stats["recall_at_10"] = round(len(exact & approx) / len(exact), 4)
        _save_stats(stats_path, stats)
        print(
            json.dumps(
                {
                    "stage": "recall",
                    "recall_at_10": stats["recall_at_10"],
                    "exact_scan_s": stats["exact_scan_s"],
                }
            )
        )

    if "append_s" not in stats:
        t0 = time.perf_counter()
        idx.append(delta.select("vec_id", "embedding"))
        stats["append_s"] = round(time.perf_counter() - t0, 1)
        stats["indexed_after_append"] = idx.vectors.count()
        _save_stats(stats_path, stats)
        print(json.dumps({"stage": "append", "s": stats["append_s"]}))

    if "append2_s" not in stats:
        # round-13 rerun of the 537 s cliff (verdict #2/#8): a FRESH 1M
        # delta through the auto admission — the cost rule must route
        # it to L0 (fill ≈ 40 rows per would-be file at ~25k cells)
        # with NO manual knob, and land orders of magnitude under the
        # partitioned scatter. Self-probe proves the tier serves.
        import glob as _glob

        # materialize the delta first (like the corpus), derived from
        # the persisted corpus by an id shift (no generator pass: the
        # stub-encoder mapInPandas sits BELOW the id filter, so a
        # generated delta would re-encode all N+2Δ rows to keep Δ).
        # Reused embeddings are fine for an append probe — routing,
        # admission, and file mechanics only see (id, vector).
        d2_path = f"{root}/delta2"
        if not os.path.exists(f"{d2_path}/_SUCCESS"):
            (
                corpus.filter(F.col("vec_id") < args.delta)
                .select(
                    (F.col("vec_id") + args.n + args.delta).alias("vec_id"),
                    "embedding",
                )
                .repartition(64)
                .write.mode("overwrite")
                .parquet(d2_path)
            )
        delta2 = spark.read.parquet(d2_path)
        t0 = time.perf_counter()
        idx.append(delta2.select("vec_id", "embedding"))
        stats["append2_s"] = round(time.perf_counter() - t0, 1)
        stats["append2_l0_files"] = len(
            _glob.glob(f"{index_path}/vectors_delta/*.parquet")
        )
        probe_id = args.n + args.delta
        probe_df = delta2.filter(F.col("vec_id") == probe_id).select(
            "vec_id", "embedding"
        )
        top = idx.search_batch(probe_df, k=1, nprobe=8).first()
        # the shifted delta duplicates an existing embedding exactly, so
        # rank 1 is either the new id or its zero-distance twin
        stats["append2_selfprobe_rank1"] = bool(
            top is not None
            and int(top.neighbor_id)
            in (probe_id, probe_id - (args.n + args.delta))
        )
        _save_stats(stats_path, stats)
        print(
            json.dumps(
                {
                    "stage": "append2",
                    "s": stats["append2_s"],
                    "l0_files": stats["append2_l0_files"],
                    "selfprobe_rank1": stats["append2_selfprobe_rank1"],
                }
            )
        )

    if "fold_l0_s" not in stats:
        # round-14 verdict #1 rerun prep: fold the r13 tier (≈1M rows
        # from append2) into the cells FIRST, timed as its own stage —
        # this is the amortized burst scatter the L0 design defers, and
        # folding now lets append3 measure the pure L0 append wall.
        t0 = time.perf_counter()
        folded = P.fold_l0_tier(spark, index_path)
        stats["fold_l0_s"] = round(time.perf_counter() - t0, 1)
        stats["fold_l0_rows"] = folded
        _save_stats(stats_path, stats)
        print(
            json.dumps(
                {
                    "stage": "fold_l0",
                    "s": stats["fold_l0_s"],
                    "rows": folded,
                }
            )
        )

    if "append3_s" not in stats:
        # round-14 verdict #1: the 752 s append2 wall was a 4-task BLAS
        # assign from the AQE-coalesced delta read — the parallelism
        # floor now lives INSIDE assign_cells_blas. Rerun the same
        # 1M-append shape with NO probe-side repartition workaround;
        # done = minutes-scale wall, L0 admission, self-probe serves.
        import glob as _glob

        d3_path = f"{root}/delta3"
        shift3 = args.n + 2 * args.delta
        if not os.path.exists(f"{d3_path}/_SUCCESS"):
            (
                corpus.filter(F.col("vec_id") < args.delta)
                .select(
                    (F.col("vec_id") + shift3).alias("vec_id"),
                    "embedding",
                )
                .write.mode("overwrite")
                .parquet(d3_path)
            )
        delta3 = spark.read.parquet(d3_path)
        stats["append3_read_partitions"] = delta3.rdd.getNumPartitions()
        t0 = time.perf_counter()
        idx.append(delta3.select("vec_id", "embedding"))
        stats["append3_s"] = round(time.perf_counter() - t0, 1)
        stats["append3_l0_files"] = len(
            _glob.glob(f"{index_path}/vectors_delta/*.parquet")
        )
        probe_df = delta3.filter(F.col("vec_id") == shift3).select(
            "vec_id", "embedding"
        )
        top = idx.search_batch(probe_df, k=1, nprobe=8).first()
        # delta3 row 0 duplicates corpus vec 0's embedding, which also
        # has a delta2 twin — rank 1 is any of the three exact copies
        stats["append3_selfprobe_rank1"] = bool(
            top is not None
            and int(top.neighbor_id) in (0, args.n + args.delta, shift3)
        )
        _save_stats(stats_path, stats)
        print(
            json.dumps(
                {
                    "stage": "append3",
                    "s": stats["append3_s"],
                    "read_partitions": stats["append3_read_partitions"],
                    "l0_files": stats["append3_l0_files"],
                    "selfprobe_rank1": stats["append3_selfprobe_rank1"],
                }
            )
        )

    if "serving_post_append3" not in stats:
        rp = [
            (int(r.vec_id), [float(x) for x in r.embedding])
            for r in base.filter(F.col("vec_id") < args.probes).collect()
        ]
        probes_df = spark.createDataFrame(
            rp, schema="vec_id long, embedding array<float>"
        )
        post3: dict = {}
        for np_ in (2, 8, 32):
            idx.search_batch(probes_df, k=10, nprobe=np_).collect()  # warm
            t0 = time.perf_counter()
            idx.search_batch(probes_df, k=10, nprobe=np_).collect()
            post3[f"nprobe{np_}_ms_per_q"] = round(
                (time.perf_counter() - t0) / args.probes * 1000, 1
            )
        stats["serving_post_append3"] = post3
        _save_stats(stats_path, stats)
        print(json.dumps({"stage": "serving_post_append3", **post3}))

    if "serving_post_append2" not in stats:
        # latency with the L0 tier live: the union read surface's
        # bounded small-file leg must not erase the ∝-probed-cells shape
        rp = [
            (int(r.vec_id), [float(x) for x in r.embedding])
            for r in base.filter(F.col("vec_id") < args.probes).collect()
        ]
        probes_df = spark.createDataFrame(
            rp, schema="vec_id long, embedding array<float>"
        )
        post: dict = {}
        for np_ in (2, 8, 32):
            idx.search_batch(probes_df, k=10, nprobe=np_).collect()  # warm
            t0 = time.perf_counter()
            idx.search_batch(probes_df, k=10, nprobe=np_).collect()
            post[f"nprobe{np_}_ms_per_q"] = round(
                (time.perf_counter() - t0) / args.probes * 1000, 1
            )
        stats["serving_post_append2"] = post
        _save_stats(stats_path, stats)
        print(json.dumps({"stage": "serving_post_append2", **post}))

    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
