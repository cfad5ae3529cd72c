"""Plan-shape lint primitives.

The classic 100-TB scale-killers, detectable from a physical plan string
before a single task runs:

- ``CartesianProduct`` (all-pairs joins) — hard flag
- ``BroadcastNestedLoopJoin`` — soft flag: legitimate when the build side
  is a bounded broadcast (probe vectors, global-stats rows — the designed
  "broadcast scalar fan-out" pattern), a killer when both sides are
  corpus-sized
- ``Exchange SinglePartition`` carrying non-trivial input (whitelisted
  when it only feeds/follows a bounded aggregate or limit)
- ``Window`` with NO partition spec (single-partition WindowExec, the
  "WindowExec: No Partition Defined" warning) — hard flag everywhere;
  ``ranking._zero`` exists precisely so no registered query needs one

Used as a library by tests/test_scale_plans.py (regression gate over the
whole registry) and as a CLI by tools/plan_audit.py (PLAN_AUDIT.md
evidence generator).
"""

from __future__ import annotations

import contextlib
import io
import re

HARD_FLAGS = ("CartesianProduct",)
SOFT_FLAGS = ("BroadcastNestedLoopJoin",)


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


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


# Nodes that bound the rows feeding a single-partition exchange: partial
# aggregates (k rows per task), limits, top-k merges, or a reuse of an
# exchange already audited at its definition site.
_BOUNDED_FEEDER = re.compile(
    r"(HashAggregate|SortAggregate|ObjectHashAggregate|CollectLimit"
    r"|GlobalLimit|LocalLimit|TakeOrderedAndProject|ReusedExchange|Subquery)"
)


def unbounded_single_partition_exchanges(plan: str) -> int:
    """Count ``Exchange SinglePartition`` nodes whose IMMEDIATE child is
    not a bounding node (round-4 advisor: the old check whitelisted every
    single-partition exchange if ANY aggregate appeared anywhere in the
    plan string — the bound must be scoped to the subtree feeding each
    exchange).

    Handles both plan formats: ``executedPlan().toString()`` (the node
    line itself says ``Exchange SinglePartition`` and its child is the
    next, deeper-indented line) and ``explain("formatted")`` (the tree
    says ``Exchange (n)`` and the partitioning lives in a later
    ``(n) Exchange / Arguments: SinglePartition`` detail block — which
    the old substring test could never even see).
    """
    lines = plan.splitlines()
    # formatted-explain detail blocks -> ids of SinglePartition exchanges
    sp_ids: set[str] = set()
    for i, ln in enumerate(lines):
        m = re.match(r"\((\d+)\) Exchange\b", ln.strip())
        if not m:
            continue
        for det in lines[i + 1 : i + 8]:
            if det.strip().startswith("Arguments:"):
                if "SinglePartition" in det:
                    sp_ids.add(m.group(1))
                break
    bad = 0
    for i, ln in enumerate(lines):
        is_tostring_sp = "Exchange SinglePartition" in ln
        m = re.search(r"Exchange \((\d+)\)\s*$", ln)
        is_formatted_sp = bool(m and m.group(1) in sp_ids)
        if not (is_tostring_sp or is_formatted_sp):
            continue
        child = lines[i + 1].strip() if i + 1 < len(lines) else ""
        child = child.lstrip("+-:* ")
        if not _BOUNDED_FEEDER.match(child):
            bad += 1
    return bad


def audit_plan(
    plan: str, *, allow_cartesian: bool = False
) -> tuple[list[str], list[str]]:
    """Return (hard_flags, soft_flags) for one plan string (either
    ``explain("formatted")`` output or ``executedPlan().toString()``)."""
    flags: list[str] = []
    soft: list[str] = []
    for f in HARD_FLAGS:
        if f in plan and not allow_cartesian:
            flags.append(f)
    for f in SOFT_FLAGS:
        if f in plan:
            soft.append(f)
    # single-partition exchanges: fine when the subtree FEEDING each one
    # is bounded (partial aggregate, limit, top-k merge); flagged
    # per-exchange otherwise — never whitelisted by an unrelated
    # aggregate elsewhere in the plan.
    n_bad = unbounded_single_partition_exchanges(plan)
    if n_bad:
        flags.append(f"Exchange SinglePartition (unbounded?) x{n_bad}")
    return flags, soft
