"""Recall report: every approximate search path vs exact cosine top-10
on the same probes — the tuning loop for nprobe / rescore-C / code
widths. Prints one JSON line:
  {"ivf": {...}, "pq": {...}, "ivfpq": {...}, "binary": {...}, "matryoshka": {...}}
each with per-probe recall and the mean.

Usage: python tools/recall_report.py [--sf /root/testdata/sf0.01]
                                     [--structured N]

--structured N replaces the fixture embeddings (RANDOM vectors, where
cluster/sketch structure provably cannot exist and the measured recall
is a floor, not a regression signal) with an N-row STUB-ENCODED corpus
— the encoder the pipeline actually ships, whose outputs have real
cosine structure. Recall gates belong on this corpus
(tests/test_recall_gates.py pins per-tier minimums); the fixture
numbers remain in the report for contrast. (Round-8 verdict task 5.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudvectordb_spark.session import get_session


def ensure_structured_corpus(spark, n: int, root: str) -> str:
    """Write {root}/embeddings.parquet with stub-encoded vectors
    (vec_id 0..n-1, embedding = stub_encode(vec_id), label = vec_id %
    10) so any sf_dir-shaped consumer can point at it. Idempotent."""
    import pandas as pd

    from pyspark.sql import functions as F

    from cloudvectordb_spark.operators.pipeline import stub_encode

    path = f"{root}/embeddings.parquet"
    if os.path.exists(f"{path}/_SUCCESS"):
        return root

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = stub_encode(ids)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": list(vecs),
                    "label": (ids % 10).astype("int32"),
                }
            )

    (
        spark.range(n)
        .repartition(max(2, spark.sparkContext.defaultParallelism))
        .mapInPandas(
            gen, schema="vec_id long, embedding array<float>, label int"
        )
        .write.mode("overwrite")
        .parquet(path)
    )
    return root


def topk_sets(df, probe_col="probe_id", n_col="neighbor_id", k=10):
    got: dict = {}
    for r in df.collect():
        if getattr(r, "rank", 1) <= k:
            got.setdefault(r[probe_col], set()).add(r[n_col])
    return got


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--structured", type=int, default=0)
    ap.add_argument(
        "--rescore-c",
        type=int,
        default=0,
        help="override the PQ/IVF-PQ rescore candidate-pool width "
        "(0 = the oracle's default; scale with corpus size to recover "
        "recall at large N — BASELINE.md round 8)",
    )
    args = ap.parse_args()

    spark = get_session("recall-report")
    if args.structured:
        args.sf = ensure_structured_corpus(
            spark,
            args.structured,
            os.path.join("/tmp", "cloudvectordb_structured", str(args.structured)),
        )
    from cloudvectordb_spark.operators.pq import (
        ivfpq_residual_topk_search,
        ivfpq_topk_search,
        pq_topk_search,
    )
    from cloudvectordb_spark.operators.pipeline import ivf_topk_search
    from cloudvectordb_spark.operators.vector_ops import (
        binary_quant_hamming_topk,
        knn_exact_cosine,
        matryoshka_truncated_knn,
    )

    exact = topk_sets(knn_exact_cosine(spark, args.sf))

    c = args.rescore_c or None
    methods = {
        "ivf": ivf_topk_search,
        "pq": lambda s, sf: pq_topk_search(s, sf, rescore_c=c),
        "ivfpq": lambda s, sf: ivfpq_topk_search(s, sf, rescore_c=c),
        "ivfpq_residual": lambda s, sf: ivfpq_residual_topk_search(
            s, sf, rescore_c=c
        ),
        "binary": binary_quant_hamming_topk,
        "matryoshka": matryoshka_truncated_knn,
    }
    out: dict = {}

    # JL tier: L2 metric, so its baseline is exact L2 top-10 (cosine and
    # L2 rank differently on unnormalized vectors). Exact set = the same
    # rescore with an unbounded candidate window.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.vector_ops import jl_prefilter_knn

    emb = load(spark, args.sf, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    d = F.sqrt(
        F.expr(
            "aggregate(zip_with(v, pv, (p, q) -> (p - q) * (p - q)),"
            " 0D, (acc, z) -> acc + z)"
        )
    )
    wl2 = Window.partitionBy("probe_id").orderBy("dist", "neighbor_id")
    exact_l2_df = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", F.col("vec_id").alias("neighbor_id"), d.alias("dist"))
        .withColumn("rank", F.row_number().over(wl2))
        .filter(F.col("rank") <= 10)
    )
    exact_l2 = topk_sets(exact_l2_df)
    got_jl = topk_sets(jl_prefilter_knn(spark, args.sf))
    per = {str(p): len(got_jl.get(p, set()) & exact_l2[p]) / 10 for p in exact_l2}
    out["jl_prefilter"] = {
        "per_probe": per,
        "mean": round(sum(per.values()) / len(per), 3),
    }

    for name, fn in methods.items():
        try:
            got = topk_sets(fn(spark, args.sf))
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        shared = [p for p in exact if p in got]
        recalls = {
            int(p): round(len(exact[p] & got[p]) / len(exact[p]), 3) for p in shared
        }
        out[name] = {
            "per_probe": recalls,
            "mean": round(sum(recalls.values()) / len(recalls), 3) if recalls else None,
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
