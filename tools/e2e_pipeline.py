"""The reference pipeline, end to end, as ONE measured command.

/root/reference/README.md:2 describes exactly four stages: "building a
very large dataset of triplets, then training encoders, then building
the embeddings with the encoder, then building the vectordb with the
encoder." This tool runs them in sequence with the EXECUTED paths (real
local-SGD trainer, trained-artifact embedding, KMeans-IVF partitioned
layout, probe search over the pruned index) and prints one JSON line
with per-stage wall-clock and output cardinalities.

Usage: python tools/e2e_pipeline.py [--sf /root/testdata/sf0.001] [--k 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.session import get_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    spark = get_session("e2e-pipeline")
    from cloudvectordb_spark.operators.pipeline import (
        build_ivf_assignments,
        build_text_triplets,
        embed_with_artifact,
        export_triplet_shards,
        read_ivf_index,
        write_ivf_index,
    )
    from cloudvectordb_spark.training import train_encoder_spark

    work = f"/tmp/cloudvectordb_e2e/{args.sf.strip('/').replace('/', '_')}"
    shutil.rmtree(work, ignore_errors=True)  # cold run: measure every stage
    out = {"sf": args.sf}

    # S1 — triplet dataset
    t0 = time.perf_counter()
    triplets = build_text_triplets(spark, args.sf)
    shards = f"{work}/shards"
    export_triplet_shards(triplets, shards)
    out["s1_triplets"] = spark.read.parquet(shards).count()
    out["s1_s"] = round(time.perf_counter() - t0, 3)

    # S2 — train the encoder (distributed local-SGD + model averaging)
    t0 = time.perf_counter()
    art = f"{work}/artifact"
    train_encoder_spark(spark, shards, art)
    out["s2_s"] = round(time.perf_counter() - t0, 3)

    # S3 — embed the corpus with the trained encoder
    t0 = time.perf_counter()
    docs = load(spark, args.sf, "documents")
    emb_path = f"{work}/embeddings"
    embed_with_artifact(docs, art).write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    out["s3_vectors"] = emb.count()
    out["s3_s"] = round(time.perf_counter() - t0, 3)

    # S4 — build the vectordb (KMeans-IVF partitioned layout)
    t0 = time.perf_counter()
    assigned, centroids = build_ivf_assignments(
        emb.select(F.col("doc_id").alias("vec_id"), "embedding"), k=args.k
    )
    idx = f"{work}/ivf"
    write_ivf_index(assigned, centroids, idx)
    out["s4_cells"] = args.k
    out["s4_s"] = round(time.perf_counter() - t0, 3)

    # Probe the finished index: nearest cell -> partition-pruned scan.
    t0 = time.perf_counter()
    vectors, cents = read_ivf_index(spark, idx)
    probe = emb.filter(F.col("doc_id") == 0).collect()[0].embedding
    cl = sorted(
        cents.collect(),
        key=lambda c: sum((a - b) ** 2 for a, b in zip(c.centroid, probe)),
    )[:2]
    cells = [c.centroid_id for c in cl]
    arr = "array(" + ",".join(f"{float(x)}D" for x in probe) + ")"
    hits = (
        vectors.filter(F.col("centroid_id").isin(cells))
        .select(
            "vec_id",
            F.expr(
                f"aggregate(zip_with(embedding, {arr}, (p, q) ->"
                " (CAST(p AS DOUBLE) - q) * (CAST(p AS DOUBLE) - q)),"
                " 0D, (acc, z) -> acc + z)"
            ).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    )
    out["search_hits"] = len(hits)
    out["search_self_top1"] = bool(hits and hits[0].vec_id == 0)
    out["search_s"] = round(time.perf_counter() - t0, 3)
    out["total_s"] = round(
        out["s1_s"] + out["s2_s"] + out["s3_s"] + out["s4_s"] + out["search_s"], 3
    )

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
