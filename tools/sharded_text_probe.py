"""Sharded TEXT serving probe: S independent postings shards with
globally-consistent BM25 vs the monolithic index, same corpus (round
12 — the text-side mirror of tools/sharded_serve_probe.py).

Builds S md5-split shard indexes over the synthetic word-soup corpus
(each shard a complete v5 artifact tree with mergeable stats), serves
one query batch through `sharded_bm25_topk_batch` (per-shard candidate
generation, scores under the MERGED global model, k*S lossless merge),
and compares against the monolithic batched path:

- exactness check: the sharded top-k must equal the monolithic top-k
  per query BIT-FOR-BIT — same scores, same tiebreaks, same ranks
  (merged stats make sharding score-exact, unlike approximate federated
  scoring that uses shard-local idf);
- cost: sharded wall ~ S concurrent pruned postings scans + one
  Q*k*S-row merge window — the scatter-gather tax measured, not argued.

Usage: python tools/sharded_text_probe.py [--n 1000000] [--shards 2]
                                          [--batch 64] [--topk 10]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudvectordb_spark.session import get_session
from tools.text_index_probe import _probe_batch, ensure_docs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--shards", type=int, default=2)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument(
        "--append", type=int, default=0,
        help="delta docs for the incremental sharded append phase "
        "(round-13 verdict #3): append == rebuild equality + cost row",
    )
    ap.add_argument(
        "--no-rebuild-check", action="store_true",
        help="skip the full-rebuild equality oracle for the append "
        "(the 10k-delta run already pins it; a 1M-delta rebuild at 10M "
        "doubles the probe wall for a second copy of the same proof)",
    )
    ap.add_argument(
        "--serve-under-append", action="store_true",
        help="round-14 verdict #3: serve batches concurrently with the "
        "append and assert every batch is bit-equal to either the "
        "pre-append or post-append reference (the reader fence makes "
        "mid-apply states unobservable); records serve latencies "
        "quiet vs busy",
    )
    args = ap.parse_args()

    spark = get_session("sharded-text-probe")
    from cloudvectordb_spark.operators.search import (
        batch_topk_per_query,
        bm25_scores_batch,
        ensure_sharded_text_index,
        ensure_text_index,
        sharded_bm25_topk_batch,
    )

    root = f"/tmp/cloudvectordb_textshard/{args.n}"
    sf_dir = os.path.dirname(ensure_docs(spark, args.n, root))
    batch = _probe_batch(args.batch)

    out = {
        "metric": "sharded_text_serving",
        "n": args.n,
        "shards": args.shards,
        "batch": args.batch,
    }

    t0 = time.perf_counter()
    ensure_text_index(spark, sf_dir)
    out["mono_build_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    ensure_sharded_text_index(spark, sf_dir, args.shards)
    out["shard_build_s"] = round(time.perf_counter() - t0, 1)

    def mono():
        return batch_topk_per_query(
            bm25_scores_batch(spark, sf_dir, batch), args.topk
        )

    def sharded():
        return sharded_bm25_topk_batch(
            spark, sf_dir, batch, args.topk, n_shards=args.shards
        ).select("query_id", "doc_id", "bm25", "rank")

    # exactness first (also the warm-up pass for both paths)
    a = {tuple(r) for r in mono().collect()}
    b = {tuple(r) for r in sharded().collect()}
    assert a == b and len(a) > 0, (
        f"sharded != monolithic: {len(a ^ b)} differing rows"
    )
    out["exact_match"] = True
    out["rows"] = len(a)

    # steady-state timing: best of 2 after the warm-up above
    for name, fn in (("mono", mono), ("sharded", sharded)):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn().collect()
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_batch_s"] = round(best, 2)
    out["ms_per_query_sharded"] = round(
        out["sharded_batch_s"] / args.batch * 1000, 1
    )

    # --- incremental sharded-text append (round-13 verdict #3) ------
    # delta docs are the word-soup corpus's NEXT ids (ensure_docs is
    # deterministic per doc_id, so corpus(n+Δ) == corpus(n) ∪ delta):
    # append routes them to their md5 shard trees; a full shard
    # rebuild over corpus(n+Δ) is the equality oracle AND the cost
    # comparison the increment replaces.
    if args.append:
        import shutil

        from pyspark.sql import functions as F

        from cloudvectordb_spark.operators.search import (
            _write_text_artifacts,
            append_sharded_text_artifacts,
            sharded_bm25_topk_batch_paths,
            text_shard_route,
        )

        big_root = f"/tmp/cloudvectordb_textshard/{args.n + args.append}"
        sf_big = os.path.dirname(ensure_docs(spark, args.n + args.append, big_root))
        docs_big = spark.read.parquet(f"{sf_big}/documents.parquet")
        delta = docs_big.filter(F.col("doc_id") >= args.n)

        src_paths = ensure_sharded_text_index(spark, sf_dir, args.shards)
        inc_paths = [f"{root}/appendable/shard={s}" for s in range(args.shards)]
        shutil.rmtree(f"{root}/appendable", ignore_errors=True)
        for sp, ip in zip(src_paths, inc_paths):
            shutil.copytree(sp, ip)

        if args.serve_under_append:
            # reference: quiet pre-append serving (also the latency base)
            import threading

            def serve():
                return sorted(
                    tuple(r)
                    for r in sharded_bm25_topk_batch_paths(
                        spark, inc_paths, batch, args.topk
                    ).select("query_id", "doc_id", "bm25", "rank").collect()
                )

            pre = serve()
            quiet = []
            for _ in range(3):
                t0 = time.perf_counter()
                serve()
                quiet.append(time.perf_counter() - t0)
            app_err: list = []

            def run_append():
                try:
                    append_sharded_text_artifacts(spark, inc_paths, delta)
                except Exception as exc:  # noqa: BLE001
                    app_err.append(exc)

            th = threading.Thread(target=run_append)
            t_app = time.perf_counter()
            th.start()
            busy, mid_results = [], []
            while th.is_alive():
                t0 = time.perf_counter()
                mid_results.append(serve())
                busy.append(time.perf_counter() - t0)
            th.join()
            out["append_under_serve_wall_s"] = round(
                time.perf_counter() - t_app, 1
            )
            if app_err:
                raise app_err[0]
            post = serve()
            # Consistency model (per-shard atomicity, pytest-pinned in
            # test_round14): each SHARD's tree flips atomically behind
            # the reader fence, but the S shard appends commit
            # independently — a merged batch may legitimately combine
            # shard generations (the standard sharded-search reality;
            # there is no cross-shard transaction). So: with S == 1
            # every mid-append batch must be exactly pre or post; with
            # S > 1 mixed-generation batches are counted, not failed.
            states = set()
            mixed = 0
            for got in mid_results:
                if got == pre:
                    states.add("pre")
                elif got == post:
                    states.add("post")
                elif args.shards == 1:
                    raise AssertionError(
                        "mid-append batch matched neither the pre- nor "
                        "post-append tree — a torn read escaped the fence"
                    )
                else:
                    mixed += 1
                    states.add("mixed-shard-generations")
            out["serve_mixed_generation_batches"] = mixed
            out["serve_under_append_batches"] = len(busy)
            out["serve_quiet_s"] = round(min(quiet), 2)
            out["serve_busy_max_s"] = round(max(busy), 2) if busy else None
            out["serve_states_observed"] = sorted(states)
        else:
            t0 = time.perf_counter()
            res = append_sharded_text_artifacts(spark, inc_paths, delta)
            out["append_delta"] = args.append
            out["append_wall_s"] = round(time.perf_counter() - t0, 1)
            out["append_docs_indexed"] = res["n_docs"]

        if not args.no_rebuild_check:
            reb_paths = [f"{root}/rebuilt/shard={s}" for s in range(args.shards)]
            shutil.rmtree(f"{root}/rebuilt", ignore_errors=True)
            route = text_shard_route(args.shards)
            t0 = time.perf_counter()
            for s in range(args.shards):
                _write_text_artifacts(
                    spark, docs_big.filter(route == s), reb_paths[s]
                )
            out["rebuild_wall_s"] = round(time.perf_counter() - t0, 1)
            if "append_wall_s" in out:
                out["append_vs_rebuild_x"] = round(
                    out["rebuild_wall_s"] / max(0.1, out["append_wall_s"]), 1
                )

            a = {
                tuple(r)
                for r in sharded_bm25_topk_batch_paths(
                    spark, inc_paths, batch, args.topk
                ).select("query_id", "doc_id", "bm25", "rank").collect()
            }
            b = {
                tuple(r)
                for r in sharded_bm25_topk_batch_paths(
                    spark, reb_paths, batch, args.topk
                ).select("query_id", "doc_id", "bm25", "rank").collect()
            }
            assert a == b and len(a) > 0, (
                f"appended fleet != rebuilt fleet: {len(a ^ b)} differing rows"
            )
            out["append_exact_match"] = True

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
