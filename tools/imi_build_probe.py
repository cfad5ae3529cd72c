"""Routed IMI build probe (round-8 verdict #2): prove the k-routed
default build is sub-linear in k past `_FLAT_K_MAX`.

For each requested k, times `build_ivf_assignments` (which auto-routes
to the two-level IMI above the threshold) through the full materialize
(assign + count-by-cell — the same work a partitioned write shuffles),
and, for comparison, the FORCED flat build at the same k. Expect the
flat build to grow ~linearly in k while the routed build grows ~sqrt(k).

Also reports layout quality: number of non-empty cells and the
max/mean cell-size ratio (balance), plus recall@10 of an nprobe-scaled
probe through the routed layout vs brute force on 8 query vectors —
a routed layout you can't search well would be a hollow win.

Usage: python tools/imi_build_probe.py [--n 1000000] [--ks 512,1024,2048]
Prints one JSON line.
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
from tools.scale_probe import synthetic_corpus

DIM = 64


def timed_build(emb, k: int, force_flat: bool):
    from cloudvectordb_spark.operators import pipeline as P

    t0 = time.perf_counter()
    if force_flat:
        from cloudvectordb_spark.operators.kmeans_det import (
            assign_cells,
            lloyd_centroids,
        )

        cents = lloyd_centroids(emb, k=k, seed=42, rounds=P._IVF_ROUNDS)
        assigned = assign_cells(emb, cents)
        cent_rows = cents
    else:
        assigned, centroids = P.build_ivf_assignments(emb, k=k)
        cent_rows = None
    sizes = (
        assigned.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    )
    sec = time.perf_counter() - t0
    ns = np.array([r.n for r in sizes], dtype=np.float64)
    out = {
        "sec": round(sec, 1),
        "cells": len(sizes),
        "balance_max_over_mean": round(float(ns.max() / ns.mean()), 2),
    }
    if not force_flat:
        out["_centroids_df"] = centroids
        out["_assigned_df"] = assigned
    return out


def routed_recall(spark, emb, assigned, centroids, k: int, topk: int = 10):
    """recall@10 through the routed layout, nprobe scaled to ~2/sqrt(k)
    of cells, vs brute force — 8 query vectors."""
    cents = [
        (r.centroid_id, list(r.centroid))
        for r in centroids.collect()
    ]
    qs = emb.filter(F.col("vec_id") < 8).collect()
    cmat = np.array([c for _, c in cents])
    cids = np.array([cid for cid, _ in cents])
    # persist: the eval loop runs 2 jobs per query and must not recompute
    # the assignment lineage each time (a real layout would be parquet)
    corpus = assigned.select("vec_id", "embedding", "centroid_id").persist()
    corpus.count()
    hits = total = 0
    nprobe = max(4, int(2 * np.sqrt(len(cents))))
    for q in qs:
        v = np.asarray(q.embedding, dtype=np.float64)
        d2 = ((cmat - v) ** 2).sum(axis=1)
        probe = [int(x) for x in cids[np.argsort(d2)[:nprobe]]]
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.lit([float(x) for x in v]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
        approx = {
            r.vec_id
            for r in corpus.filter(F.col("centroid_id").isin(probe))
            .select("vec_id", dot.alias("s"))
            .orderBy(F.desc("s"), "vec_id")
            .limit(topk)
            .collect()
        }
        exact = {
            r.vec_id
            for r in corpus.select("vec_id", dot.alias("s"))
            .orderBy(F.desc("s"), "vec_id")
            .limit(topk)
            .collect()
        }
        hits += len(approx & exact)
        total += topk
    corpus.unpersist()
    return round(hits / total, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--ks", default="512,1024,2048")
    ap.add_argument("--flat-ks", default="512,1024")
    ap.add_argument("--recall-k", type=int, default=1024)
    args = ap.parse_args()

    spark = get_session("imi-build-probe")
    path = f"/tmp/cloudvectordb_imiprobe/{args.n}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        synthetic_corpus(spark, args.n, DIM).write.mode("overwrite").parquet(
            path
        )
    emb = spark.read.parquet(path)

    out = {"metric": "imi_routed_build", "n": args.n, "dim": DIM}
    routed_frames = {}
    for k in (int(x) for x in args.ks.split(",") if x):
        r = timed_build(emb, k, force_flat=False)
        routed_frames[k] = (r.pop("_assigned_df", None), r.pop("_centroids_df", None))
        out[f"routed_k{k}"] = r
    for k in (int(x) for x in args.flat_ks.split(",") if x):
        out[f"flat_k{k}"] = timed_build(emb, k, force_flat=True)

    rk = args.recall_k
    if rk in routed_frames and routed_frames[rk][0] is not None:
        a, c = routed_frames[rk]
        out["routed_recall_at10"] = routed_recall(spark, emb, a, c, rk)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
