"""JL-tier scale probe: 64->16 projection + coarse/rescore search at 1M
vectors — completes the ANN tier table (BLAS exact / IVF / PQ in
tools/scale_probe.py) with the cheapest filter tier.

Measures (a) projection throughput (a pure JVM map stage — the cost you
pay ONCE at ingest to persist the sketch column), (b) coarse top-C scan
over 16-dim sketches + exact rescore of C candidates per probe, vs (c)
the exact 64-dim scan, all on the same deterministic corpus.

Usage: python tools/jl_probe.py [--n 1000000] [--probes 3] [--c 200]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from pyspark.sql import functions as F

from scale_probe import synthetic_corpus

from cloudvectordb_spark.operators.vector_ops import jl_project
from cloudvectordb_spark.session import get_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--probes", type=int, default=3)
    ap.add_argument("--c", type=int, default=200)
    args = ap.parse_args()

    spark = get_session("jl-probe")
    root = f"/tmp/cloudvectordb_jlprobe/{args.n}"
    if not os.path.exists(f"{root}/_SUCCESS"):
        synthetic_corpus(spark, args.n, 64).write.mode("overwrite").parquet(root)
    corpus = spark.read.parquet(root)

    # (a) projection throughput: JVM map stage, materialized once.
    jl_path = f"{root}_jl"
    t0 = time.perf_counter()
    jl_project(corpus).select("vec_id", "jl").write.mode("overwrite").parquet(jl_path)
    project_s = round(time.perf_counter() - t0, 3)
    sketches = spark.read.parquet(jl_path)

    probes = [r for r in corpus.filter(F.col("vec_id") < args.probes).collect()]
    psk = {r.vec_id: r.jl for r in sketches.filter(F.col("vec_id") < args.probes).collect()}

    def l2_expr(col, lit_vec):
        arr = "array(" + ",".join(f"{float(x)}D" for x in lit_vec) + ")"
        return F.expr(
            f"aggregate(zip_with({col}, {arr}, (p, q) -> (CAST(p AS DOUBLE) - q)"
            f" * (CAST(p AS DOUBLE) - q)), 0D, (acc, z) -> acc + z)"
        )

    def timed(fn):
        fn()
        t0 = time.perf_counter()
        out = fn()
        return round(time.perf_counter() - t0, 3), out

    def jl_search():
        got = {}
        for p in probes:
            cand = (
                sketches.filter(F.col("vec_id") != p.vec_id)
                .select("vec_id", l2_expr("jl", psk[p.vec_id]).alias("d16"))
                .orderBy("d16", "vec_id")
                .limit(args.c)
            )
            top = (
                corpus.join(cand.select("vec_id"), "vec_id", "left_semi")
                .select("vec_id", l2_expr("embedding", list(p.embedding)).alias("d"))
                .orderBy("d", "vec_id")
                .limit(10)
                .collect()
            )
            got[p.vec_id] = [r.vec_id for r in top]
        return got

    def exact_search():
        got = {}
        for p in probes:
            top = (
                corpus.filter(F.col("vec_id") != p.vec_id)
                .select("vec_id", l2_expr("embedding", list(p.embedding)).alias("d"))
                .orderBy("d", "vec_id")
                .limit(10)
                .collect()
            )
            got[p.vec_id] = [r.vec_id for r in top]
        return got

    jl_s, jl_top = timed(jl_search)
    exact_s, exact_top = timed(exact_search)
    recall = sum(
        len(set(jl_top[p]) & set(exact_top[p])) / 10 for p in exact_top
    ) / len(exact_top)

    print(
        json.dumps(
            {
                "n": args.n,
                "project_s": project_s,
                "project_vecs_per_s": int(args.n / project_s),
                "jl_search_s": jl_s,
                "exact_search_s": exact_s,
                "speedup": round(exact_s / jl_s, 2),
                "recall_at_10": round(recall, 3),
                "rescore_c": args.c,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
