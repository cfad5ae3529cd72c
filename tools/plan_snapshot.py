"""Snapshot .explain("formatted") for every bench + serving query into
plans/<tag>/<query>_<suffix>.txt — the before/after plan evidence for
optimization rounds (the judge checks plan claims against these files).

NOTE: queries whose builders gather bounded frames eagerly
(bm25_batch_pruned, bm25_topk_pruned, bm25_pruned_merged_bounds,
bm25_batch_tiered_append, ann_tier_recall_summary, ...) EXECUTE those
eager phases during snapshotting — building the plan runs their driver
jobs. The snapshotted plan is therefore only the final lazy stage;
read the eager jobs' shape from the code (they are all
bounded_gather-guarded local-relation re-entries).

Usage: python tools/plan_snapshot.py --tag r15 --suffix before [--sf DIR]
       [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudvectordb_spark.plans.lint import formatted_plan
from cloudvectordb_spark.registry import SERVING, all_queries
from cloudvectordb_spark.session import get_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", default="")
    args = ap.parse_args()

    reg = all_queries()
    names = (
        [q for q in args.queries.split(",") if q]
        if args.queries
        else sorted([n for n, s in reg.items() if s.bench] + list(SERVING))
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session("plan-snapshot", cpus=8, shuffle_partitions=8)
    n_err = 0
    for name in names:
        spec = reg.get(name)
        if spec is None:
            print(f"SKIP {name}: not registered")
            n_err += 1
            continue
        try:
            plan = formatted_plan(spec.fn(spark, args.sf))
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            n_err += 1
            continue
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
