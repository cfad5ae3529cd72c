"""Driver-side probe->cell routing wall: scalar vs vectorized batch.

Round-10 verdict #1: every serving entry point routed probes through
``nearest_cells_py`` — an O(k) pure-Python pass per probe, ~16.7M
interpreted distance evaluations for a 256-probe batch at the
CorpusPipeline auto-k cap (k=65536). ``nearest_cells_batch`` does one
numpy row reduction per probe over the cached centroid matrix with a
BIT-IDENTICAL total order (parity-pinned in tests/test_kmeans_det.py).

This probe times both paths on synthetic centroids (no Spark — the
routing is driver-side by design) across k, for a Q-probe batch, and
asserts the outputs are identical while it measures. Usage:

    python tools/routing_probe.py [--q 256] [--dim 64]
                                  [--ks 2048,16384,65536]
                                  [--nprobe 64] [--scalar-cap 16384]

Prints one JSON line. ``--scalar-cap``: largest k the scalar path is
timed at (the full sweep at k=65536 costs minutes — the point).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=256)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--ks", type=str, default="2048,16384,65536")
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--scalar-cap", type=int, default=16384)
    args = ap.parse_args()

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cloudvectordb_spark.operators.kmeans_det import (
        nearest_cells_batch,
        nearest_cells_py,
    )

    rng = np.random.default_rng(42)
    out = {"metric": "probe_routing", "q": args.q, "dim": args.dim,
           "nprobe": args.nprobe, "rows": []}
    for k in (int(x) for x in args.ks.split(",")):
        cents = [(i, [float(x) for x in rng.normal(size=args.dim)]) for i in range(k)]
        vecs = [list(map(float, rng.normal(size=args.dim))) for _ in range(args.q)]
        t0 = time.perf_counter()
        got_b = nearest_cells_batch(vecs, cents, args.nprobe)
        cold_s = time.perf_counter() - t0  # includes matrix build
        t0 = time.perf_counter()
        got_b2 = nearest_cells_batch(vecs, cents, args.nprobe)
        warm_s = time.perf_counter() - t0  # cached matrix: serving steady state
        assert got_b == got_b2
        row = {"k": k, "batch_cold_s": round(cold_s, 3),
               "batch_warm_s": round(warm_s, 3)}
        if k <= args.scalar_cap:
            t0 = time.perf_counter()
            got_s = [nearest_cells_py(v, cents, args.nprobe) for v in vecs]
            row["scalar_s"] = round(time.perf_counter() - t0, 3)
            assert got_s == got_b, f"parity broken at k={k}"
            row["speedup_warm"] = round(row["scalar_s"] / max(warm_s, 1e-9), 1)
        out["rows"].append(row)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
