"""Benchmark decontamination at 1M+ docs with PLANTED contamination.

`benchmark_contamination` is a headline query at fixture scale; this
probe runs its df-level core (`curation.contamination_scan` — the same
code) on a synthetic corpus where ground truth is known:

- 50 eval docs + N train docs, all 30 words from a 10k-word hash vocab
  (random docs share essentially no trigrams: expected cross-collisions
  ≈ |tr_trigrams|·|ev_trigrams| / 10k³ « 1).
- every 1000th train doc has eval doc (i/1000 mod 50)'s first 10 words
  spliced in — 8 shared trigrams each, N/1000 known contaminated docs.

Reports wall time, recall of planted docs among flagged, and false
flags (flagged docs that were not planted).

Usage: python tools/contamination_probe.py [--n 1000000]
Prints one JSON line; exit 1 on any quality miss.
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

WORDS = 30
VOCAB = 10_000
N_EVAL = 50
PLANT_EVERY = 1000
SPLICE = 10  # words copied from the eval doc


def eval_words(e: int) -> list[str]:
    from zlib import crc32

    return [f"e{crc32(f'ev{e}:{j}'.encode()) % VOCAB}" for j in range(WORDS)]


def synthetic(spark, n: int, parts: int = 64):
    import pandas as pd
    from zlib import crc32

    ev = {e: eval_words(e) for e in range(N_EVAL)}

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                i = int(i)
                words = [
                    f"w{crc32(f't{i}:{j}'.encode()) % VOCAB}"
                    for j in range(WORDS)
                ]
                if i % PLANT_EVERY == 0:
                    src = ev[(i // PLANT_EVERY) % N_EVAL]
                    words[10 : 10 + SPLICE] = src[:SPLICE]
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(0, n, 1, parts).mapInPandas(
        gen, schema="doc_id long, text string"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()

    spark = get_session("contamination-probe")
    from cloudvectordb_spark.operators.curation import contamination_scan

    root = f"/tmp/cloudvectordb_contam/{args.n}"
    if not os.path.exists(f"{root}/_SUCCESS"):
        synthetic(spark, args.n).write.mode("overwrite").parquet(root)
    train = spark.read.parquet(root)
    eval_docs = spark.createDataFrame(
        [(10**9 + e, " ".join(eval_words(e))) for e in range(N_EVAL)],
        schema="doc_id long, text string",
    )

    t0 = time.perf_counter()
    flagged = contamination_scan(train, eval_docs)
    rows = flagged.collect()  # bounded: ~n/PLANT_EVERY contaminated docs
    scan_s = round(time.perf_counter() - t0, 1)

    flagged_ids = {r.doc_id for r in rows}
    planted = {i for i in range(0, args.n, PLANT_EVERY)}
    hits = len(flagged_ids & planted)
    false_flags = len(flagged_ids - planted)
    min_shared = min((r.n_shared_trigrams for r in rows), default=0)

    out = {
        "metric": "contamination_scan_scale",
        "train_docs": args.n,
        "eval_docs": N_EVAL,
        "planted": len(planted),
        "flagged": len(flagged_ids),
        "recall": round(hits / len(planted), 4),
        "false_flags": false_flags,
        "min_shared_trigrams": min_shared,
        "scan_s": scan_s,
    }
    print(json.dumps(out))
    return 0 if (hits == len(planted) and false_flags == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
