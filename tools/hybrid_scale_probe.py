"""Hybrid retrieval (BM25 + vector RRF fusion) at corpus scale
(round-10 verdict #6): hybrid_rrf_batch is value-oracled and benched at
sf0.1 while each of its legs has 1M-doc probes — this measures the
FUSED batch on ONE 1M-doc corpus carrying both a persisted text index
and an IVF vector index.

Per 64-query batch, each query = (3 BM25 terms, one probe embedding):

  text leg    bm25_scores_batch top-N from the persisted postings
              (one plan for the whole batch)
  vector leg  ivf_batch_search_strict top-N (strict nprobe, one plan)
  fusion      RRF (1/(60+rank), the registered query's constant) ->
              top-10 per query

Reports each leg's wall, the fusion overhead, and the fused list's
composition: overlap@10 vs the exact full-BM25 ranking and vs the
exact BLAS vector ranking — the evidence that fusion actually draws
from both legs at corpus scale instead of collapsing into one.

The crossover constant (RRF k=60) is value-oracled at fixture scale by
the registered `hybrid_rrf_batch`/`hybrid_rrf_search` queries; this
probe reuses the same arithmetic verbatim.

Usage: python tools/hybrid_scale_probe.py --docs 1000000
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

N_QUERIES = 64
LEG_N = 60  # candidates per leg fed into the fusion
TOPK = 10
RRF_K = 60
NPROBE = 8
K_CELLS = 256


def ensure_corpus(spark, n_docs: int, root: str) -> str:
    """The text probe's sf-dir corpus, extended with a same-id
    embeddings table — one corpus, both modalities."""
    from cloudvectordb_spark.operators.pipeline import embed_documents
    from tools.text_index_probe import ensure_docs

    ensure_docs(spark, n_docs, root)
    sf_dir = f"{root}/sf"
    emb_path = f"{sf_dir}/embeddings.parquet"
    if not os.path.exists(f"{emb_path}/_SUCCESS"):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        embed_documents(docs).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).write.mode("overwrite").parquet(emb_path)
    return sf_dir


def ensure_ivf(spark, sf_dir: str, root: str) -> str:
    from cloudvectordb_spark.operators.pipeline import (
        build_ivf_assignments,
        write_ivf_index,
    )

    ivf = f"{root}/ivf"
    if not os.path.exists(f"{ivf}/vectors/_SUCCESS") and not os.path.exists(
        f"{ivf}/_BUILT"
    ):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        assigned, cents = build_ivf_assignments(emb, k=K_CELLS, seed=42)
        write_ivf_index(assigned, cents, ivf)
    return ivf


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--shards", type=int, default=0,
                    help="also measure the fused batch with the vector leg split across N shard indexes (HybridIndex shard-list mode)")
    args = ap.parse_args()
    root = os.path.join("/tmp", "cloudvectordb_hybrid", str(args.docs))

    from cloudvectordb_spark.operators.pipeline import (
        index_centroids,
        ivf_batch_search_strict,
    )
    from cloudvectordb_spark.operators.search import (
        batch_topk_per_query,
        bm25_scores_batch,
        ensure_text_index,
    )
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast
    from tools.text_index_probe import _probe_batch

    spark = get_session("hybrid-scale-probe")
    sf_dir = ensure_corpus(spark, args.docs, root)

    t0 = time.perf_counter()
    ensure_text_index(spark, sf_dir)
    text_build_s = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    ivf = ensure_ivf(spark, sf_dir, root)
    ivf_build_s = round(time.perf_counter() - t0, 1)

    batch = _probe_batch(N_QUERIES)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe_rows = (
        emb.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    )
    vectors = spark.read.parquet(f"{ivf}/vectors")
    cents = index_centroids(spark, ivf)

    def text_leg():
        return batch_topk_per_query(
            bm25_scores_batch(spark, sf_dir, batch), LEG_N
        ).select("query_id", "doc_id", F.col("rank").alias("krank"))

    def vec_leg():
        return ivf_batch_search_strict(
            spark, vectors, probe_rows, cents, nprobe=NPROBE, k=LEG_N
        ).select(
            F.col("probe_id").cast("int").alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("vrank"),
        )

    def fused():
        f = text_leg().join(vec_leg(), ["query_id", "doc_id"], "full_outer")
        scored = f.select(
            "query_id",
            "doc_id",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("krank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("vrank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("rrf_score"), F.asc("doc_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOPK)
            .select("query_id", "doc_id", "rank")
        )

    def timed(fn):
        fn().collect()  # warm (index reads, codegen)
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            rows = fn().collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), rows

    text_s, _ = timed(text_leg)
    vec_s, _ = timed(vec_leg)
    fused_s, fused_rows = timed(fused)

    # composition: how much of each leg's own exact@10 the fusion kept
    probes_df = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in probe_rows],
        schema="vec_id long, embedding array<float>",
    )
    vec_exact: dict = {}
    for r in exact_knn_fast(emb, probes_df, k=TOPK).collect():
        if r.rank <= TOPK:
            vec_exact.setdefault(r.probe_id, set()).add(r.neighbor_id)
    bm_exact: dict = {}
    for r in batch_topk_per_query(
        bm25_scores_batch(spark, sf_dir, batch), TOPK
    ).collect():
        bm_exact.setdefault(r.query_id, set()).add(r.doc_id)
    fused_sets: dict = {}
    for r in fused_rows:
        fused_sets.setdefault(r.query_id, set()).add(r.doc_id)
    qs = sorted(fused_sets)
    overlap_vec = sum(
        len(fused_sets[q] & vec_exact.get(q, set())) / TOPK for q in qs
    ) / len(qs)
    overlap_bm = sum(
        len(fused_sets[q] & bm_exact.get(q, set())) / TOPK for q in qs
    ) / len(qs)

    extra = {}
    if args.shards > 1:
        # fleet mode: same text index, vector leg scattered over N md5
        # shards through HybridIndex's shard-list constructor (the
        # facade pytest pins bit-equality at full coverage; here we
        # measure the wall and report top-10 agreement at serving
        # nprobe, where per-shard pruning may legitimately differ)
        from cloudvectordb_spark.api import HybridIndex, TextIndex, VectorIndex

        shard_of = F.pmod(
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8),
                16, 10,
            ).cast("bigint"),
            F.lit(args.shards),
        )
        shard_idx = []
        t0 = time.perf_counter()
        for i in range(args.shards):
            path = f"{root}/ivf_shard{i}_of{args.shards}"
            if not os.path.exists(f"{path}/vectors/_SUCCESS"):
                VectorIndex.build(
                    spark,
                    emb.withColumn("_s", shard_of)
                    .filter(F.col("_s") == i)
                    .drop("_s"),
                    path,
                    k=max(8, K_CELLS // args.shards),
                )
            shard_idx.append(VectorIndex.open(spark, path))
        shard_build_s = round(time.perf_counter() - t0, 1)
        text_ix = TextIndex.open(spark, sf_dir)
        hi_shard = HybridIndex(text_ix, shard_idx)
        hi_mono = HybridIndex(text_ix, VectorIndex.open(spark, ivf))

        def timed_hi(hi):
            # HybridIndex's sharded vector leg fans out eagerly inside
            # search_batch, so time the whole call
            def once():
                return hi.search_batch(
                    batch, probes_df, k=TOPK, leg_n=LEG_N, nprobe=NPROBE
                ).collect()

            once()  # warm
            best, rows = 9e9, None
            for _ in range(2):
                t0 = time.perf_counter()
                rows = once()
                best = min(best, time.perf_counter() - t0)
            sets: dict = {}
            for r in rows:
                sets.setdefault(r.query_id, set()).add(r.doc_id)
            return round(best, 3), sets

        mono_s, mono_sets = timed_hi(hi_mono)
        shard_s, shard_sets = timed_hi(hi_shard)
        qs = sorted(mono_sets)
        agree = sum(
            len(mono_sets[q] & shard_sets.get(q, set())) / TOPK for q in qs
        ) / len(qs)
        extra = {
            "shards": args.shards,
            "shard_builds_s": shard_build_s,
            "hybrid_mono_s": mono_s,
            "hybrid_sharded_s": shard_s,
            "ms_per_query_sharded": round(1000 * shard_s / N_QUERIES, 1),
            "sharded_vs_mono_top10_agreement": round(agree, 3),
        }

    print(
        json.dumps(
            {
                "metric": "hybrid_scale_probe",
                "docs": args.docs,
                "n_queries": N_QUERIES,
                "leg_n": LEG_N,
                "builds_s": {"text": text_build_s, "ivf": ivf_build_s},
                "text_leg_s": text_s,
                "vec_leg_s": vec_s,
                "fused_s": fused_s,
                "fusion_overhead_s": round(fused_s - text_s - vec_s, 3),
                "ms_per_query_fused": round(1000 * fused_s / N_QUERIES, 1),
                "fused_overlap_vs_vector_exact_at10": round(overlap_vec, 3),
                "fused_overlap_vs_bm25_exact_at10": round(overlap_bm, 3),
                **extra,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
