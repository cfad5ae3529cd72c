"""Banded-MinHash dedup at 1M/10M docs (round-8 verdict #8).

The registered `minhash_banded_pairs_md5` query is capped at
`_MINHASH_LIM` docs so its DuckDB oracle stays tractable; this probe
runs the SAME pipeline (`dedup.minhash_banded_pairs_df`) on a synthetic
corpus with PLANTED near-duplicates, so candidate generation, verify
cost, and pair quality are measured at scale, not argued:

- corpus: N docs of 30 words from a 10k-word hash vocab; every 10th
  doc has a planted near-dup neighbor (one word substituted → 3-gram
  Jaccard ≈ 25/31 ≈ 0.8), giving N/10 known true pairs.
- sig_candidates_s: shingle → 8 md5 permutations → per-(doc,p) min →
  4 band keys → (band,key) self-join, timed to the candidate count.
- verify_s: signature re-join estimating Jaccard on candidates only.
- pair_recall: fraction of planted pairs among verified est_j ≥ 0.5.
- pair_precision: fraction of verified est_j ≥ 0.5 pairs that are
  planted (random 30-word docs from a 10k vocab share almost no
  shingles, so anything else surviving verify is a true hash collision
  band accident).

Usage: python tools/minhash_scale_probe.py [--n 1000000]
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

WORDS_PER_DOC = 30
VOCAB = 10_000
DUP_EVERY = 10  # doc i with i % DUP_EVERY == 1 duplicates doc i-1


def synthetic_docs(spark, n: int, parts: int = 64):
    """Deterministic (doc_id, text) corpus with planted near-dups."""
    import pandas as pd
    from zlib import crc32

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                i = int(i)
                base = i - 1 if i % DUP_EVERY == 1 else i
                words = [
                    f"w{crc32(f'{base}:{j}'.encode()) % VOCAB}"
                    for j in range(WORDS_PER_DOC)
                ]
                if base != i:  # perturb one mid-doc word
                    words[WORDS_PER_DOC // 2] = f"z{i}"
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(0, n, 1, parts).mapInPandas(
        gen, schema="doc_id long, text string"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument(
        "--clusters",
        action="store_true",
        help="also run connected-components canonicalization on the "
        "verified pair set and report rounds + wall",
    )
    ap.add_argument(
        "--fast",
        action="store_true",
        help="use the xxhash64 production twin (minhash_banded_pairs_"
        "fast) instead of the md5 oracle form",
    )
    ap.add_argument(
        "--simhash",
        action="store_true",
        help="run the SimHash sign+band path instead of MinHash on the "
        "same planted corpus (64-bit signatures, 4x16 bands, "
        "hamming <= 3)",
    )
    args = ap.parse_args()

    spark = get_session("minhash-scale-probe")
    from cloudvectordb_spark.operators.dedup import (
        minhash_banded_pairs_df,
        minhash_banded_pairs_fast,
    )

    root = f"/tmp/cloudvectordb_mhprobe/{args.n}"
    if not os.path.exists(f"{root}/_SUCCESS"):
        synthetic_docs(spark, args.n).write.mode("overwrite").parquet(root)
    docs = spark.read.parquet(root)

    if args.simhash:
        from cloudvectordb_spark.operators.dedup import (
            simhash_band_pairs,
            simhash_fast,
        )

        t0 = time.perf_counter()
        sigs = simhash_fast(docs).persist()
        sigs.count()
        sig_s = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        pairs = simhash_band_pairs(sigs).persist()
        n_pairs = pairs.count()
        band_s = round(time.perf_counter() - t0, 1)
        planted_hits = pairs.filter(
            (F.col("b_id") == F.col("a_id") + 1)
            & (F.col("a_id") % DUP_EVERY == 0)
        ).count()
        n_planted = args.n // DUP_EVERY
        print(
            json.dumps(
                {
                    "metric": "simhash_banded_scale",
                    "docs": args.n,
                    "planted_pairs": n_planted,
                    "sig_s": sig_s,
                    "band_join_s": band_s,
                    "pairs_hamming_le3": n_pairs,
                    "pair_recall": round(planted_hits / max(1, n_planted), 4),
                    "pair_precision": round(planted_hits / max(1, n_pairs), 4),
                }
            )
        )
        sigs.unpersist()
        pairs.unpersist()
        return 0

    t0 = time.perf_counter()
    # persist: the quality metrics below must not re-run the shingle ->
    # permute -> band -> join -> verify lineage once per count
    pair_fn = minhash_banded_pairs_fast if args.fast else minhash_banded_pairs_df
    verified = pair_fn(docs).persist()
    n_verified = verified.count()
    total_s = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    kept = verified.filter(F.col("est_jaccard") >= args.tau)
    # planted pair: (a, a+1) with a % DUP_EVERY == 0
    planted_hits = kept.filter(
        (F.col("b_id") == F.col("a_id") + 1)
        & (F.col("a_id") % DUP_EVERY == 0)
    ).count()
    n_kept = kept.count()
    eval_s = round(time.perf_counter() - t0, 1)

    cc = {}
    if args.clusters:
        from cloudvectordb_spark.operators.dedup import connected_components

        t0 = time.perf_counter()
        stats: dict = {}
        labels = connected_components(
            kept.select("a_id", "b_id"), src="a_id", dst="b_id", stats=stats
        )
        n_canon = labels.select("component").distinct().count()
        cc = {
            "cc_s": round(time.perf_counter() - t0, 1),
            "cc_rounds": stats["rounds"],
            "cc_mode": stats.get("mode", "distributed"),
            "clusters": n_canon,
        }
    verified.unpersist()

    n_planted = args.n // DUP_EVERY
    out = {
        "metric": "minhash_banded_scale_fast" if args.fast else "minhash_banded_scale",
        "docs": args.n,
        "planted_pairs": n_planted,
        "verified_candidates": n_verified,
        "pairs_tau": n_kept,
        "pipeline_s": total_s,
        "eval_s": eval_s,
        "pair_recall": round(planted_hits / max(1, n_planted), 4),
        "pair_precision": round(planted_hits / max(1, n_kept), 4),
        **cc,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
