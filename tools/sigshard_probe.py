"""Sharded sig-state scatter-gather probe (round-13 verdict #2 →
round 14): does the MID-SIZE-delta candidate scan stay flat per shard
as the state doubles?

The single bucketed state's adaptive IN-list prunes only point-lookup
deltas (≤_PRUNE_MAX touched buckets); a 10k-doc delta touches ~40k
buckets and pays the FULL band scan — ∝ state on one box, the regime
round-13 honestly left open. The fleet answer is S bucket-RANGE shards
(`sigstate.ShardedSigState` + `dedup.minhash_pairs_between_sharded`):
each shard's scan is range-pruned to its contiguous slice of the
sorted bucketed cache (∝ state/S), the S legs submit concurrently, and
on a real fleet each leg is a different machine's local scan — so the
per-shard wall is the fleet's append latency.

For each state size n (S ∝ n, so per-shard state is CONSTANT):
  1. build-or-reuse a sigs dir from synthetic docs (fast hasher);
  2. probe a 10k delta (planted dups) through BOTH paths, warm,
     median of --reps timed runs;
  3. assert pair-set parity sharded == single-state;
  4. record single-state cand_scan_s (expected ∝ n) vs per-shard max
     (expected ~flat — the scatter-gather claim).

Usage:
  SPARK_DRIVER_MEMORY=24g python tools/sigshard_probe.py \
      [--sizes 1000000,2000000,4000000] [--delta 10000] [--reps 3]
Prints one JSON line per size and a combined summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloudvectordb_spark.session import get_session

BASE_DOCS_PER_SHARD = 500_000  # S = n // this — per-shard state constant


def ensure_sigs(spark, n: int) -> str:
    """Build (once) /tmp/cloudvectordb_sigshard/<n>/sigs from the
    minhash_scale_probe synthetic corpus, fast hasher."""
    from cloudvectordb_spark.operators.dedup import minhash_sigs
    from tools.minhash_scale_probe import synthetic_docs

    root = f"/tmp/cloudvectordb_sigshard/{n}"
    done = f"{root}/_DONE"
    if not os.path.exists(done):
        t0 = time.perf_counter()
        minhash_sigs(synthetic_docs(spark, n), hasher="fast").write.mode(
            "overwrite"
        ).parquet(f"{root}/sigs")
        open(done, "w").close()
        print(
            json.dumps(
                {"stage": "build_sigs", "n": n,
                 "s": round(time.perf_counter() - t0, 1)}
            )
        )
    return root


def probe_once(spark, sd: str, n: int, n_delta: int, n_shards: int | None = None):
    from cloudvectordb_spark.operators.dedup import (
        minhash_pairs_between_sharded,
        minhash_pairs_between_state,
        minhash_sigs,
    )
    from cloudvectordb_spark.operators.sigstate import (
        corpus_sig_state,
        sharded_sig_state,
    )
    from tools.append_probe import synthetic_delta

    state = corpus_sig_state(spark, sd, n_hint=n)
    S = n_shards if n_shards else max(2, n // BASE_DOCS_PER_SHARD)
    sstate = sharded_sig_state(spark, sd, S, n_hint=n)
    delta = synthetic_delta(spark, n, n_delta).persist()
    delta.count()
    sigs_delta = minhash_sigs(delta, hasher="fast").persist()
    sigs_delta.count()

    def single():
        st: dict = {}
        pairs = minhash_pairs_between_state(
            sigs_delta, state, n_new=n_delta, stats=st
        )
        rows = {(r.new_id, r.corpus_id) for r in pairs.collect()}
        return rows, st

    def sharded():
        st: dict = {}
        pairs = minhash_pairs_between_sharded(sigs_delta, sstate, stats=st)
        rows = {(r.new_id, r.corpus_id) for r in pairs.collect()}
        return rows, st

    return S, delta, sigs_delta, single, sharded


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000000,2000000,4000000")
    ap.add_argument("--delta", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sd",
        default=None,
        help="probe an EXISTING sigs dir (e.g. the 10M e2e rehearsal's "
        "dedup_state) instead of building synthetic states; pass the "
        "corpus size via --sizes N so S and the delta ids line up",
    )
    ap.add_argument(
        "--shards",
        type=int,
        default=None,
        help="override S (default n // 500k) — decomposes per-leg "
        "fixed job overhead from the range-pruned scan itself",
    )
    args = ap.parse_args()

    spark = get_session("sigshard-probe")
    rows = []
    for n in (int(x) for x in args.sizes.split(",")):
        root = args.sd if args.sd else ensure_sigs(spark, n)
        S, delta, sigs_delta, single, sharded = probe_once(
            spark, f"{root}", n, args.delta, n_shards=args.shards
        )
        # warm both paths (state load + codegen), check parity once
        p_single, _ = single()
        p_sharded, _ = sharded()
        parity = p_single == p_sharded
        singles, shard_maxes, shard_all = [], [], []
        for _ in range(args.reps):
            _, st1 = single()
            singles.append(st1["cand_scan_s"])
            _, st2 = sharded()
            shard_maxes.append(max(st2["per_shard_cand_s"]))
            shard_all.append(st2["per_shard_cand_s"])
        row = {
            "metric": "sigshard_probe",
            "n": n,
            "n_delta": args.delta,
            "S": S,
            "parity_ok": parity,
            "n_pairs": len(p_single),
            "single_cand_scan_s": round(statistics.median(singles), 3),
            "sharded_per_shard_max_s": round(
                statistics.median(shard_maxes), 3
            ),
            "per_shard_s_last": shard_all[-1],
        }
        rows.append(row)
        print(json.dumps(row))
        delta.unpersist()
        sigs_delta.unpersist()
        # drop this state's cache before the next (bigger) corpus
        from cloudvectordb_spark.operators import sigstate as _sg

        for st in list(_sg._STATES.values()):
            for sig_f, band_f in st.gens:
                st.pending.extend([sig_f, band_f])
            st.release_pending()
        _sg._STATES.clear()
    print(
        json.dumps(
            {
                "metric": "sigshard_scaling",
                "delta": args.delta,
                "runs": rows,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
