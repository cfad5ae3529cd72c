"""Diff two bench JSON artifacts (BENCH_r{N}.json or raw bench.py
output) per query, flagging deltas beyond a noise threshold.

    python tools/bench_compare.py BENCH_r04.json BENCH_r05.json
    python tools/bench_compare.py old.json new.json --noise 0.15

Host context matters: identical code measured 13.5-16.7 s across runs
on the round-5 VM, so treat sub-noise deltas as machine jitter and
re-run the OLD commit on the CURRENT host (git worktree) before calling
a regression structural.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> tuple[float, dict]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver artifact wraps the bench line
        d = d["parsed"]
    return float(d["value"]), dict(d["queries"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--noise", type=float, default=0.15,
                    help="seconds of per-query jitter to ignore")
    args = ap.parse_args()
    told, qold = load_queries(args.old)
    tnew, qnew = load_queries(args.new)

    print(f"total: {told:.3f} -> {tnew:.3f} ({tnew - told:+.3f})")
    rows = []
    for name in sorted(set(qold) | set(qnew)):
        a, b = qold.get(name), qnew.get(name)
        if a is None or b is None:
            rows.append((float("inf"), name, a, b, "added" if a is None else "removed"))
            continue
        d = b - a
        if abs(d) > args.noise:
            rows.append((abs(d), name, a, b, f"{d:+.3f}"))
    if not rows:
        print(f"no per-query delta beyond ±{args.noise}s")
        return 0
    for _, name, a, b, note in sorted(rows, reverse=True):
        print(f"{name:36s} {a if a is not None else '—':>7} -> "
              f"{b if b is not None else '—':>7}  {note}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
