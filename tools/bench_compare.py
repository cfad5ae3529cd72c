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


def load_bench(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver artifact wraps the bench line
        d = d["parsed"]
    return d


def diff_group(label: str, told, tnew, qold: dict, qnew: dict, noise: float) -> None:
    print(f"{label} total: {told:.3f} -> {tnew:.3f} ({tnew - told:+.3f})")
    rows = []
    for name in sorted(set(qold) | set(qnew)):
        a, b = qold.get(name), qnew.get(name)
        if a is None or b is None:
            rows.append((float("inf"), name, a, b, "added" if a is None else "removed"))
            continue
        d = b - a
        if abs(d) > noise:
            rows.append((abs(d), name, a, b, f"{d:+.3f}"))
    if not rows:
        print(f"  no per-query delta beyond ±{noise}s")
        return
    for _, name, a, b, note in sorted(rows, reverse=True):
        print(f"  {name:36s} {a if a is not None else '—':>7} -> "
              f"{b if b is not None else '—':>7}  {note}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--noise", type=float, default=0.15,
                    help="seconds of per-query jitter to ignore")
    args = ap.parse_args()
    dold, dnew = load_bench(args.old), load_bench(args.new)

    for d, path in ((dold, args.old), (dnew, args.new)):
        la = d.get("load", {})
        if la:
            print(f"load[{path}]: start {la.get('loadavg_1m_start')} "
                  f"({la.get('java_procs_start')} JVMs) end "
                  f"{la.get('loadavg_1m_end')} ({la.get('java_procs_end')} JVMs)")
    diff_group("headline", float(dold["value"]), float(dnew["value"]),
               dict(dold["queries"]), dict(dnew["queries"]), args.noise)
    # serving group shipped in round 9 — older artifacts simply lack it
    sold, snew = dold.get("serving"), dnew.get("serving")
    if sold or snew:
        diff_group(
            "serving",
            float(dold.get("serving_seconds", 0.0)),
            float(dnew.get("serving_seconds", 0.0)),
            dict(sold or {}), dict(snew or {}), args.noise,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
