"""Time individual registered queries exactly the way bench.py does
(warm-up + median of N .collect() runs), for optimization iteration.

Usage: python tools/time_query.py q1,q2,... [--sf DIR] [--runs N]
       [--noop]   (time a noop-sink write instead of collect — guide
                   §1.4 isolation; NOT the bench methodology)
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.registry import all_queries
from cloudvectordb_spark.session import get_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    spark = get_session("time-query")
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        load(spark, args.sf, t).count()
    from cloudvectordb_spark.operators.pipeline import ensure_ivf_index

    try:
        ensure_ivf_index(spark, args.sf)
    except Exception as exc:  # noqa: BLE001
        print(f"ensure_ivf_index failed: {exc}", file=sys.stderr)

    reg = all_queries()
    for name in args.queries.split(","):
        spec = reg.get(name)
        if spec is None:
            print(f"{name}: not registered")
            continue

        def run() -> float:
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            return time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"time_query:{name}")
        run()  # warm-up, untimed
        samples = [run() for _ in range(args.runs)]
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: median={statistics.median(samples):.3f}s "
            f"min={min(samples):.3f} max={max(samples):.3f} "
            f"(n={args.runs}, {'noop' if args.noop else 'collect'})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
