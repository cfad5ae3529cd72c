"""Scatter-gather serving probe: S independent index shards vs one
monolithic index on the same corpus (round 10, follow-on to the
value-oracled `sharded_knn_merge` query and `VectorIndex.search_sharded`).

Builds S md5-split shard indexes over the synthetic corpus (each its
own routed/flat build + partitioned layout — a real fleet's
per-shard lifecycle), serves one probe batch through
`VectorIndex.search_sharded`, and compares against the single-index
path AND exact brute force:

- exact-merge check: with nprobe covering the shard layout, the
  sharded top-k must match the single-index result per probe;
- recall: both vs exact BLAS top-k on the unsharded corpus;
- cost: sharded wall ~ S independent pruned scans + one k*S-row merge
  window per probe — the scatter-gather tax measured, not argued.

Usage: python tools/sharded_serve_probe.py [--n 1000000] [--shards 2]
                                           [--batch 64] [--k 512]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--shards", type=int, default=2)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=512, help="cells per shard index")
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--topk", type=int, default=10)
    args = ap.parse_args()

    spark = get_session("sharded-serve-probe")
    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast
    from tools.scale_probe import synthetic_corpus

    root = f"/tmp/cloudvectordb_shardprobe/{args.n}"
    corpus_path = f"{root}/corpus"
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        synthetic_corpus(spark, args.n, 64).write.mode("overwrite").parquet(
            corpus_path
        )
    emb = spark.read.parquet(corpus_path)

    out = {"metric": "sharded_serving", "n": args.n, "shards": args.shards}

    # per-shard builds (md5 split — every shard is ~n/S rows)
    shard_of = F.pmod(
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(args.shards),
    )
    t0 = time.perf_counter()
    indexes = []
    for s in range(args.shards):
        path = f"{root}/shard{s}_k{args.k}"
        if not os.path.exists(f"{path}/vectors/_SUCCESS"):
            VectorIndex.build(
                spark,
                emb.withColumn("_s", shard_of).filter(F.col("_s") == s).drop("_s"),
                path,
                k=args.k,
            )
            indexes.append(VectorIndex.open(spark, path))
        else:
            indexes.append(VectorIndex.open(spark, path))
    out["shard_builds_s"] = round(time.perf_counter() - t0, 1)

    mono_path = f"{root}/mono_k{args.k}"
    t0 = time.perf_counter()
    if not os.path.exists(f"{mono_path}/vectors/_SUCCESS"):
        mono = VectorIndex.build(spark, emb, mono_path, k=args.k)
    else:
        mono = VectorIndex.open(spark, mono_path)
    out["mono_build_s"] = round(time.perf_counter() - t0, 1)

    stride = max(1, args.n // args.batch)
    probes = (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(args.batch)
    )
    probes.persist().count()

    def recall_of(df) -> float:
        got: dict = {}
        for r in df.collect():
            if r.rank <= args.topk:
                got.setdefault(r.probe_id, set()).add(r.neighbor_id)
        return sum(
            len(got.get(p, set()) & exact[p]) / args.topk for p in exact
        ) / len(exact)

    exact: dict = {}
    t0 = time.perf_counter()
    for r in exact_knn_fast(emb, probes, k=args.topk).collect():
        if r.rank <= args.topk:
            exact.setdefault(r.probe_id, set()).add(r.neighbor_id)
    out["exact_s"] = round(time.perf_counter() - t0, 1)

    def timed(fn):
        fn().collect()  # warm
        t0 = time.perf_counter()
        res = fn()
        r = recall_of(res)
        return round(time.perf_counter() - t0, 1), r

    out["mono_s"], out["mono_recall"] = timed(
        lambda: mono.search(probes, k=args.topk, nprobe=args.nprobe)
    )
    # round-10 verdict #3: the thread-per-shard fan-out vs the strictly
    # sequential one — identical results (merge is order-insensitive),
    # the wall should move toward the slowest shard's bound
    out["sharded_seq_s"], out["sharded_seq_recall"] = timed(
        lambda: VectorIndex.search_sharded(
            indexes, probes, k=args.topk, nprobe=args.nprobe,
            concurrent=False,
        )
    )
    out["sharded_s"], out["sharded_recall"] = timed(
        lambda: VectorIndex.search_sharded(
            indexes, probes, k=args.topk, nprobe=args.nprobe
        )
    )
    probes.unpersist()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
