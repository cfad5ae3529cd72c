"""BPE trainer job-count probe (round-8 verdict #5).

The former trainer ran one pair-count Spark job + one argmax collect +
one checkpoint PER MERGE — a 32k-merge production vocab would be ~96k
sequential jobs. The reshaped trainer collects the word-frequency vocab
in ONE job and trains merges driver-side, so job count must be FLAT in
the merge count. This probe runs the trainer at two round counts under
distinct job groups and reports jobs-per-run straight from the status
tracker, plus the determinism prefix property (rounds=R' merges extend
rounds=R merges).

Usage: python tools/bpe_probe.py [--sf /root/testdata/sf0.01]
Prints one JSON line; exit 1 if job count grows with rounds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudvectordb_spark.session import get_session


def jobs_for(spark, group: str, fn) -> tuple[int, object]:
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        out = fn()
    finally:
        sc.setJobGroup("", "")
    return len(sc.statusTracker().getJobIdsForGroup(group)), out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--rounds-big", type=int, default=40)
    args = ap.parse_args()

    spark = get_session("bpe-probe")
    from cloudvectordb_spark.operators.text_ops import _bpe_train

    j_small, (m_small, _) = jobs_for(
        spark, "bpe_small", lambda: _bpe_train(spark, args.sf, args.rounds)
    )
    j_big, (m_big, _) = jobs_for(
        spark, "bpe_big", lambda: _bpe_train(spark, args.sf, args.rounds_big)
    )

    prefix_ok = m_big[: len(m_small)] == m_small
    out = {
        "metric": "bpe_jobs_vs_rounds",
        "sf": args.sf,
        "rounds_small": args.rounds,
        "rounds_big": args.rounds_big,
        "jobs_small": j_small,
        "jobs_big": j_big,
        "merges_big": len(m_big),
        "prefix_property": prefix_ok,
        "flat": j_big <= j_small,
    }
    print(json.dumps(out))
    return 0 if (j_big <= j_small and prefix_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
