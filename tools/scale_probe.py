"""Scale probe: run the vector hot paths on a synthetic corpus far past
the fixtures (default 1M x dim-64 ~ 500x sf0.1) and print one JSON line
per stage. Evidence for BASELINE.md / SCALE.md that the chosen plans are
throughput-bound (BLAS / shuffle-light), not overhead-bound.

Usage: python tools/scale_probe.py [--n 1000000] [--dim 64] [--probes 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloudvectordb_spark.session import get_session


def synthetic_corpus(spark, n: int, dim: int, parts: int = 32):
    """n deterministic unit vectors via the stub encoder (mapInPandas —
    itself a K5-shaped distributed generate)."""
    import numpy as np
    import pandas as pd

    from cloudvectordb_spark.operators.pipeline import stub_encode

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = stub_encode(ids, dim)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    return (
        spark.range(0, n, 1, parts)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--probes", type=int, default=8)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    spark = get_session("scale-probe")
    work = tempfile.mkdtemp(prefix="scale_probe_")
    results = {}

    corpus_path = os.path.join(work, "corpus")
    t0 = time.perf_counter()
    synthetic_corpus(spark, args.n, args.dim).write.mode("overwrite").parquet(
        corpus_path
    )
    results["generate_write_s"] = round(time.perf_counter() - t0, 2)

    corpus = spark.read.parquet(corpus_path)
    probes = corpus.filter(F.col("vec_id") < args.probes)

    # exact kNN, BLAS partial-top-k path
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    t0 = time.perf_counter()
    n_rows = exact_knn_fast(corpus, probes, k=args.k).count()
    dt = time.perf_counter() - t0
    results["knn_fast_s"] = round(dt, 2)
    results["knn_fast_scored_vec_per_s"] = int(args.n * args.probes / dt)
    assert n_rows == args.probes * args.k

    # IVF build (sampled KMeans fit + assign + partitioned write)
    from cloudvectordb_spark.operators.pipeline import (
        build_ivf_assignments,
        write_ivf_index,
    )

    # k sized so E[|cell|] ~ 2k rows: the near-dup stage materializes one
    # |cell| x |cell| matrix per cell — k is the memory knob (SCALE.md)
    ivf_k = max(8, args.n // 2000)
    t0 = time.perf_counter()
    assigned, cents = build_ivf_assignments(corpus, k=ivf_k, seed=42)
    write_ivf_index(assigned, cents, os.path.join(work, "ivf"))
    results["ivf_build_s"] = round(time.perf_counter() - t0, 2)
    results["ivf_k"] = ivf_k

    # IVF search on the persisted layout: literal centroid filter =
    # partition pruning, then BLAS top-k over the pruned candidates
    from cloudvectordb_spark.functions import vector as V
    from pyspark.sql import Window

    vectors = spark.read.parquet(os.path.join(work, "ivf", "vectors"))
    centroids = spark.read.parquet(os.path.join(work, "ivf", "centroids"))
    t0 = time.perf_counter()
    p = probes.select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv"))
    pc = p.crossJoin(F.broadcast(centroids)).withColumn(
        "cdist", V.l2_distance("pv", "centroid")
    )
    wp = Window.partitionBy("probe_id").orderBy("cdist", "centroid_id")
    cell_ids = sorted(
        {
            r.centroid_id
            for r in pc.withColumn("r", F.row_number().over(wp))
            .filter(F.col("r") <= 4)
            .select("centroid_id")
            .collect()
        }
    )
    pruned = vectors.filter(F.col("centroid_id").isin(cell_ids))
    n_found = exact_knn_fast(pruned, probes, k=args.k).count()
    results["ivf_search_s"] = round(time.perf_counter() - t0, 2)
    results["ivf_search_rows"] = n_found
    results["ivf_cells_scanned"] = len(cell_ids)

    # IVF-bucketed near-dup over the full synthetic corpus
    import pandas as pd
    import numpy as np

    t0 = time.perf_counter()

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(
                {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64")}
            )
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= 0.999
        return pd.DataFrame({"a_id": ids[iu[keep]], "b_id": ids[ju[keep]]})

    n_dups = (
        vectors.groupBy("centroid_id")
        .applyInPandas(cell_pairs, "a_id bigint, b_id bigint")
        .count()
    )
    results["neardup_ivf_s"] = round(time.perf_counter() - t0, 2)
    results["neardup_pairs"] = n_dups

    # PQ: sample-trained codebooks, distributed encode (8-byte codes),
    # ADC table-lookup scan + top-C window — the 32x-compressed scan path
    from cloudvectordb_spark.operators.pq import (
        _RESCORE_C,
        adc_scores,
        pq_encode,
        train_pq_codebooks_from_df,
    )

    t0 = time.perf_counter()
    books = train_pq_codebooks_from_df(corpus)
    results["pq_train_s"] = round(time.perf_counter() - t0, 2)

    codes_path = os.path.join(work, "pq_codes")
    t0 = time.perf_counter()
    pq_encode(corpus, books).write.mode("overwrite").parquet(codes_path)
    dt = time.perf_counter() - t0
    results["pq_encode_s"] = round(dt, 2)
    results["pq_encode_vec_per_s"] = int(args.n / dt)

    encoded = spark.read.parquet(codes_path)
    probe_rows = probes.orderBy("vec_id").collect()
    plist = [
        (
            r["vec_id"],
            (lambda v: v / (np.linalg.norm(v) or 1.0))(
                np.array(r["embedding"], dtype=np.float64)
            ),
        )
        for r in probe_rows
    ]
    t0 = time.perf_counter()
    wc = Window.partitionBy("probe_id").orderBy("adc_dist", "vec_id")
    n_cand = (
        adc_scores(encoded, plist, books)
        .withColumn("r", F.row_number().over(wc))
        .filter(F.col("r") <= _RESCORE_C)
        .count()
    )
    dt = time.perf_counter() - t0
    results["pq_adc_scan_s"] = round(dt, 2)
    results["pq_adc_scored_vec_per_s"] = int(args.n * args.probes / dt)
    assert n_cand == args.probes * _RESCORE_C

    results.update({"n": args.n, "dim": args.dim, "probes": args.probes})
    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
