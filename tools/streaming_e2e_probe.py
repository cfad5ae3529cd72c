"""Composed 1M-doc STREAMING rehearsal (round-10 verdict #5).

The five checkpointed streaming jobs, the fencing leases, the LSM
tiered compaction, and serving are each pytest-gated in isolation;
this probe runs the streaming story COMPOSED on one synthetic corpus,
with a zombie-writer kill mid-run, so the takeover/interleave cliffs
are measured, not assumed away:

  text half (inverted index, manifest/tier path):
    gen-1 tiered ingest over the first half of the doc chunks (lease 1)
    -> gen-1 "stalls"; gen-2 acquires a newer lease and catches up over
       ALL chunks with a FRESH checkpoint (a fresh deploy: batch ids
       restart at 0, so chunks gen-1's tiers consumed REPLAY — the
       content-keyed shards + consumed ledger must no-op them)
    -> one more chunk arrives; zombie gen-1 wakes and must die with
       CommitConflict at its first commit point, manifest untouched
    -> serving rollup over the manifest == a batch rebuild over every
       chunk, exceptAll BOTH directions (the equality that catches
       double-counted replays, which manifest-only assertions never did)

  vector half (IVF index, cell-shuffled append path):
    batch-build a seed index -> stream the remaining vectors through
    run_index_append_stream (frozen-centroid assign, repartition on the
    cell key per micro-batch, fenced before and after each append)
    -> streamed layout == batch assign_cells over the full corpus on
       (vec_id, centroid_id), exceptAll both directions
    -> compact_ivf_index (1 file/cell) and re-assert equality
    -> serve a 64-probe strict-nprobe batch off the compacted streamed
       index; recall@10 vs exact BLAS >= 0.9 gate.

Stages are idempotent (stats JSON per stage under --root) so the probe
survives the container's 600 s background cap via --stages re-invokes.

Usage:
  python tools/streaming_e2e_probe.py --n 1000000
  python tools/streaming_e2e_probe.py --n 1000000 --stages report
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

N_CHUNKS = 12  # primary doc/vector chunks; chunk 12 is the zombie bait
SEED_FRAC_NUM, SEED_FRAC_DEN = 4, 5  # 80% batch-built, 20% streamed
K_CELLS = 256
TOPK = 10
NPROBE = 8
SERVE_BATCH = 64


def _stats_path(root: str, stage: str) -> str:
    return os.path.join(root, f"stats_{stage}.json")


def _done(root: str, stage: str) -> bool:
    return os.path.exists(_stats_path(root, stage))


def _write_stats(root: str, stage: str, stats: dict) -> None:
    os.makedirs(root, exist_ok=True)
    with open(_stats_path(root, stage), "w") as f:
        json.dump(stats, f)
    print(f"[{stage}] {json.dumps(stats)}", file=sys.stderr)


def stage_prep(spark, root: str, n: int) -> None:
    from cloudvectordb_spark.operators.pipeline import embed_documents
    from tools.minhash_scale_probe import synthetic_docs

    t0 = time.perf_counter()
    # materialize the corpus and its embeddings ONCE; every chunk file
    # below is a cheap columnar re-read, not a generator/encoder re-run
    synthetic_docs(spark, n).write.mode("overwrite").parquet(f"{root}/docs")
    docs = spark.read.parquet(f"{root}/docs")
    embed_documents(docs).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    ).write.mode("overwrite").parquet(f"{root}/emb_all")
    emb = spark.read.parquet(f"{root}/emb_all")
    # the doc "topic": one parquet file per future micro-batch; the
    # first half lands now, the rest arrives mid-run (stage_takeover)
    for i in range(N_CHUNKS // 2):
        docs.filter(F.col("doc_id") % (N_CHUNKS + 1) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/doc_chunks/chunk{i:02d}")
    # the vector "topic": 80% seeds the batch build, 20% streams in
    seed = F.col("vec_id") % SEED_FRAC_DEN < SEED_FRAC_NUM
    emb.filter(seed).write.mode("overwrite").parquet(f"{root}/seed_vectors")
    for i in range(8):
        emb.filter(~seed & (F.col("vec_id") % 8 == i)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/vec_chunks/chunk{i}")
    wall = time.perf_counter() - t0
    _write_stats(
        root,
        "prep",
        {
            "docs": n,
            "seed_vectors": spark.read.parquet(f"{root}/seed_vectors").count(),
            "wall_s": round(wall, 1),
        },
    )


def stage_text_ingest(spark, root: str) -> None:
    """Gen-1: tiered ingest over the first N_CHUNKS//2 chunks, then
    'stall' (return)."""
    from cloudvectordb_spark.streaming.jobs import (
        _read_shard_manifest,
        run_tiered_postings_ingest,
    )
    from cloudvectordb_spark.versioning import acquire_lease

    out_root = f"{root}/tiered_index"
    lease1 = acquire_lease(out_root, owner="ingest-gen1")
    t0 = time.perf_counter()
    run_tiered_postings_ingest(
        spark,
        f"{root}/doc_chunks",
        out_root,
        f"{root}/ckpt_gen1",
        tier_width=4,
        lease=lease1,
    )
    wall = time.perf_counter() - t0
    m = _read_shard_manifest(out_root)
    _write_stats(
        root,
        "text_ingest",
        {
            "chunks": N_CHUNKS // 2,
            "lease1": lease1,
            "live_shards": len(m["live"]),
            "consumed_shards": len(m["consumed"]),
            "wall_s": round(wall, 1),
            "s_per_chunk": round(wall / (N_CHUNKS // 2), 1),
        },
    )


def stage_takeover(spark, root: str, n: int) -> None:
    """The rest of the topic arrives; gen-2 takes over with a newer
    lease and a FRESH checkpoint (replays gen-1's chunks — must no-op);
    then the zombie gen-1 wakes on one more chunk and must die fenced."""
    from cloudvectordb_spark.streaming.jobs import (
        _read_shard_manifest,
        run_tiered_postings_ingest,
    )
    from cloudvectordb_spark.versioning import acquire_lease

    docs = spark.read.parquet(f"{root}/docs")
    for i in range(N_CHUNKS // 2, N_CHUNKS):
        docs.filter(F.col("doc_id") % (N_CHUNKS + 1) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/doc_chunks/chunk{i:02d}")

    out_root = f"{root}/tiered_index"
    with open(_stats_path(root, "text_ingest")) as f:
        lease1 = json.load(f)["lease1"]
    lease2 = acquire_lease(out_root, owner="ingest-gen2")
    t0 = time.perf_counter()
    run_tiered_postings_ingest(
        spark,
        f"{root}/doc_chunks",
        out_root,
        f"{root}/ckpt_gen2",
        tier_width=4,
        lease=lease2,
    )
    gen2_wall = time.perf_counter() - t0

    # zombie bait: a 13th chunk gen-1's checkpoint has never seen
    docs.filter(F.col("doc_id") % (N_CHUNKS + 1) == N_CHUNKS).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{root}/doc_chunks/chunk{N_CHUNKS:02d}")
    manifest_before = _read_shard_manifest(out_root)
    fenced = False
    t0 = time.perf_counter()
    try:
        run_tiered_postings_ingest(
            spark,
            f"{root}/doc_chunks",
            out_root,
            f"{root}/ckpt_gen1",
            tier_width=4,
            lease=lease1,
        )
    except Exception as e:  # StreamingQueryException wrapping CommitConflict
        fenced = "fenced by newer epoch" in str(e)
    zombie_wall = time.perf_counter() - t0
    assert fenced, "zombie gen-1 committed despite a newer lease"
    assert _read_shard_manifest(out_root) == manifest_before, (
        "zombie gen-1 mutated the manifest"
    )
    # gen-2 (the live generation) absorbs the bait chunk normally
    t0 = time.perf_counter()
    run_tiered_postings_ingest(
        spark,
        f"{root}/doc_chunks",
        out_root,
        f"{root}/ckpt_gen2",
        tier_width=4,
        lease=lease2,
    )
    catchup_wall = time.perf_counter() - t0
    m = _read_shard_manifest(out_root)
    _write_stats(
        root,
        "takeover",
        {
            "gen2_chunks": N_CHUNKS,
            "gen2_wall_s": round(gen2_wall, 1),
            "zombie_fenced": fenced,
            "zombie_wall_s": round(zombie_wall, 1),
            "bait_chunk_wall_s": round(catchup_wall, 1),
            "live_shards": len(m["live"]),
            "consumed_shards": len(m["consumed"]),
        },
    )


def stage_text_verify(spark, root: str) -> None:
    """Serving rollup under the manifest == batch postings over every
    chunk — the equality that catches takeover double-counts."""
    from cloudvectordb_spark.streaming.jobs import (
        delta_postings_stream,
        tiered_serving_postings,
    )

    t0 = time.perf_counter()
    serving = tiered_serving_postings(spark, f"{root}/tiered_index")
    batch = delta_postings_stream(
        spark.read.option("recursiveFileLookup", "true").parquet(
            f"{root}/doc_chunks"
        )
    )
    extra = serving.exceptAll(batch).count()
    missing = batch.exceptAll(serving).count()
    n_postings = serving.count()
    wall = time.perf_counter() - t0
    assert extra == 0 and missing == 0, (extra, missing)
    _write_stats(
        root,
        "text_verify",
        {
            "postings": n_postings,
            "extra_vs_batch": extra,
            "missing_vs_batch": missing,
            "wall_s": round(wall, 1),
        },
    )


def stage_vec_build(spark, root: str) -> None:
    from cloudvectordb_spark.operators.pipeline import (
        build_ivf_assignments,
        write_ivf_index,
    )

    seed = spark.read.parquet(f"{root}/seed_vectors")
    t0 = time.perf_counter()
    assigned, cents = build_ivf_assignments(seed, k=K_CELLS, seed=42)
    write_ivf_index(assigned, cents, f"{root}/ivf")
    wall = time.perf_counter() - t0
    n = spark.read.parquet(f"{root}/ivf/vectors").count()
    assert n == seed.count()
    _write_stats(
        root,
        "vec_build",
        {"seed_rows": n, "k": K_CELLS, "wall_s": round(wall, 1)},
    )


def stage_vec_ingest(spark, root: str) -> None:
    """Stream the remaining 20% through the fenced, cell-shuffled
    append job; assert streamed layout == batch assignment; compact."""
    from cloudvectordb_spark.operators.kmeans_det import assign_cells
    from cloudvectordb_spark.operators.pipeline import (
        compact_ivf_index,
        index_centroids,
    )
    from cloudvectordb_spark.streaming.jobs import run_index_append_stream
    from cloudvectordb_spark.versioning import acquire_lease

    idx_path = f"{root}/ivf"
    lease = acquire_lease(idx_path, owner="vec-ingest")
    t0 = time.perf_counter()
    run_index_append_stream(
        spark, f"{root}/vec_chunks", idx_path, f"{root}/ckpt_vec", lease=lease
    )
    ingest_wall = time.perf_counter() - t0

    streamed = spark.read.parquet(f"{idx_path}/vectors").select(
        "vec_id", "centroid_id"
    )
    full = spark.read.parquet(f"{root}/seed_vectors").unionByName(
        spark.read.option("recursiveFileLookup", "true").parquet(
            f"{root}/vec_chunks"
        )
    )
    cents = index_centroids(spark, idx_path)
    want = assign_cells(full, cents).select("vec_id", "centroid_id")
    extra = streamed.exceptAll(want).count()
    missing = want.exceptAll(streamed).count()
    assert extra == 0 and missing == 0, (extra, missing)

    def n_files(p: str) -> int:
        return sum(
            1
            for _, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    files_before = n_files(f"{idx_path}/vectors")
    t0 = time.perf_counter()
    compact_ivf_index(spark, idx_path, f"{root}/ivf_compact")
    compact_wall = time.perf_counter() - t0
    files_after = n_files(f"{root}/ivf_compact/vectors")
    streamed_c = spark.read.parquet(f"{root}/ivf_compact/vectors").select(
        "vec_id", "centroid_id"
    )
    assert streamed_c.exceptAll(want).count() == 0
    assert want.exceptAll(streamed_c).count() == 0
    _write_stats(
        root,
        "vec_ingest",
        {
            "streamed_rows": spark.read.option(
                "recursiveFileLookup", "true"
            ).parquet(f"{root}/vec_chunks").count(),
            "ingest_wall_s": round(ingest_wall, 1),
            "files_before_compact": files_before,
            "files_after_compact": files_after,
            "compact_wall_s": round(compact_wall, 1),
            "layout_equals_batch_assign": True,
        },
    )


def stage_vec_serve(spark, root: str) -> None:
    from cloudvectordb_spark.operators.pipeline import (
        index_centroids,
        ivf_batch_search_strict,
    )
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    vectors = spark.read.parquet(f"{root}/ivf_compact/vectors")
    cents = index_centroids(spark, f"{root}/ivf_compact")
    emb = vectors.select("vec_id", "embedding")
    n = emb.count()
    stride = max(1, n // SERVE_BATCH)
    probe_rows = (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(SERVE_BATCH)
        .collect()
    )
    probes_df = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in probe_rows],
        schema="vec_id long, embedding array<float>",
    )
    exact: dict = {r.vec_id: set() for r in probe_rows}
    for r in exact_knn_fast(emb, probes_df, k=TOPK).collect():
        if r.rank <= TOPK:
            exact[r.probe_id].add(r.neighbor_id)
    t0 = time.perf_counter()
    got: dict = {}
    for r in ivf_batch_search_strict(
        spark, vectors, probe_rows, cents, nprobe=NPROBE, k=TOPK
    ).collect():
        if r.rank <= TOPK:
            got.setdefault(r.probe_id, set()).add(r.neighbor_id)
    wall = time.perf_counter() - t0
    recall = sum(
        len(got.get(p, set()) & exact[p]) / TOPK for p in exact
    ) / len(exact)
    assert recall >= 0.9, recall
    _write_stats(
        root,
        "vec_serve",
        {
            "corpus": n,
            "probes": len(probe_rows),
            "nprobe": NPROBE,
            "wall_s": round(wall, 1),
            "ms_per_query": round(1000 * wall / len(probe_rows), 1),
            "recall_at10": round(recall, 3),
        },
    )


def stage_report(root: str, n: int) -> None:
    stages = [
        "prep",
        "text_ingest",
        "takeover",
        "text_verify",
        "vec_build",
        "vec_ingest",
        "vec_serve",
    ]
    merged = {"metric": "streaming_e2e_probe", "docs": n}
    total = 0.0
    for s in stages:
        p = _stats_path(root, s)
        if not os.path.exists(p):
            merged[s] = "MISSING"
            continue
        with open(p) as f:
            st = json.load(f)
        merged[s] = st
        total += sum(v for k, v in st.items() if k.endswith("wall_s"))
    merged["total_wall_s"] = round(total, 1)
    print(json.dumps(merged))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument(
        "--stages",
        default="prep,text_ingest,takeover,text_verify,"
        "vec_build,vec_ingest,vec_serve,report",
    )
    ap.add_argument("--root", default=None)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    root = args.root or f"/tmp/cloudvectordb_stream_e2e/{args.n}"

    wanted = [s.strip() for s in args.stages.split(",") if s.strip()]
    spark = None
    runners = {
        "prep": lambda: stage_prep(spark, root, args.n),
        "text_ingest": lambda: stage_text_ingest(spark, root),
        "takeover": lambda: stage_takeover(spark, root, args.n),
        "text_verify": lambda: stage_text_verify(spark, root),
        "vec_build": lambda: stage_vec_build(spark, root),
        "vec_ingest": lambda: stage_vec_ingest(spark, root),
        "vec_serve": lambda: stage_vec_serve(spark, root),
    }
    for s in wanted:
        if s == "report":
            stage_report(root, args.n)
            continue
        if _done(root, s) and not args.force:
            print(f"[{s}] already done — skipping", file=sys.stderr)
            continue
        if spark is None:
            spark = get_session("streaming-e2e-probe")
        runners[s]()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
