"""Recall report: every approximate search path vs exact cosine top-10
on the same probes — the tuning loop for nprobe / rescore-C / code
widths. Prints one JSON line:
  {"ivf": {...}, "pq": {...}, "ivfpq": {...}, "binary": {...}, "matryoshka": {...}}
each with per-probe recall and the mean.

Usage: python tools/recall_report.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudvectordb_spark.session import get_session


def topk_sets(df, probe_col="probe_id", n_col="neighbor_id", k=10):
    got: dict = {}
    for r in df.collect():
        if getattr(r, "rank", 1) <= k:
            got.setdefault(r[probe_col], set()).add(r[n_col])
    return got


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session("recall-report")
    from cloudvectordb_spark.operators.pq import ivfpq_topk_search, pq_topk_search
    from cloudvectordb_spark.operators.pipeline import ivf_topk_search
    from cloudvectordb_spark.operators.vector_ops import (
        binary_quant_hamming_topk,
        knn_exact_cosine,
        matryoshka_truncated_knn,
    )

    exact = topk_sets(knn_exact_cosine(spark, args.sf))

    methods = {
        "ivf": ivf_topk_search,
        "pq": pq_topk_search,
        "ivfpq": ivfpq_topk_search,
        "binary": binary_quant_hamming_topk,
        "matryoshka": matryoshka_truncated_knn,
    }
    out: dict = {}
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
