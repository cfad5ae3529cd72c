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


def optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


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


# --- constant-keyed windows (round-5 verdict #3) --------------------------
#
# ``ranking._zero`` = pmod(xxhash64(col), 1): a constant-0 partition key
# that survives constant folding. It keeps a window partitioned in the
# plan while still funnelling EVERY row to one task — exactly as bad as
# an empty partition spec when the input is corpus-proportional. The
# empty-spec gate above is structurally blind to it (the spec is
# non-empty), so this walk resolves the pattern explicitly: a window
# whose partition key is (or aliases) pmod(xxhash64(...), 1) is flagged
# UNLESS its input subtree is bounded before any corpus scan — by a
# limit / top-k merge, or by a grouping aggregate whose key is one of
# the declared bounded-cardinality keys below.
#
# BOUNDED_WINDOW_KEYS is a *declaration*, reviewed per entry: `_bucket`
# (ranking.py range buckets, <= 256 rows), `decile` (10), `lang`
# (fixture language codes, O(10)), `day` (calendar days — bounded by
# retention, not corpus size). Keys NOT listed (customer keys, doc ids,
# event ids …) are corpus-proportional and never make a constant-keyed
# window safe.

BOUNDED_WINDOW_KEYS = {"_bucket", "decile", "lang", "day"}

# balanced-paren match (three nesting levels inside xxhash64's arg
# list — enough for e.g. xxhash64(coalesce(cast(x as bigint), 0), 42)):
# a lazy `.*?` could span unrelated text on one plan line, e.g.
# 'pmod(xxhash64(a#1, 42), 16) ... foo(b, 1)' would false-positive,
# so the group is an explicit fixed-depth balanced matcher instead.
_BAL_ARGS = r"[^()]*"
for _ in range(3):
    _BAL_ARGS = r"[^()]*(?:\(" + _BAL_ARGS + r"\)[^()]*)*"
_CONST_KEY = re.compile(r"pmod\(xxhash64\(" + _BAL_ARGS + r"\), 1\)")
_CONST_ALIAS = re.compile(
    r"pmod\(xxhash64\(" + _BAL_ARGS + r"\), 1\) AS (\w+#\d+L?)"
)
_BOUNDING_NODE = re.compile(
    r"(GlobalLimit|LocalLimit|CollectLimit|TakeOrderedAndProject)"
)
# physical: HashAggregate(keys=[k#1L], ...) — keys=[] is a global agg
_PHYS_AGG = re.compile(r"(?:Hash|Sort|ObjectHash)Aggregate\(keys=\[([^\]]*)\]")
_OUTPUT_LIST = re.compile(r"output=\[([^\]]*)\]")
# logical: Aggregate [keys], [output]  (one list == global agg)
_LOGI_AGG = re.compile(r"(?<![A-Za-z])Aggregate \[")
_FIRST_AS = re.compile(r" AS (\w+)#")
_SCAN_NODE = re.compile(
    r"(FileScan|BatchScan|Scan parquet|RowDataSourceScan|Relation \[)"
)


def _indent(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _window_partition_spec(line: str) -> str | None:
    """The partition-spec bracket group of a Window node line, or None if
    the spec is empty/absent (that case is the empty-spec gate's job)."""
    m = _WINDOW_NODE.search(line)
    if not m:
        return None
    tail = line[m.start() :]
    parts = tail.split("], [")
    if len(parts) >= 3:
        return parts[-2]
    if len(parts) == 2:
        last = parts[-1]
        if " ASC" in last or " DESC" in last:
            return None  # empty partition spec
        return last
    return None


def _key_names(keys: str) -> list[str]:
    """Key names from an aggregate key list string like
    ``day#12, _groupingexpression#45L`` (attribute references only —
    a computed key expression yields its leading identifier)."""
    names = []
    for part in keys.split(","):
        km = re.match(r"\s*(\w+)#", part)
        names.append(km.group(1) if km else part.strip())
    return names


def _agg_verdict(line: str) -> bool | None:
    """True/False if ``line`` is an aggregate node (bounded / unbounded
    under BOUNDED_WINDOW_KEYS), None if it is not an aggregate.

    Output cardinality of a grouped aggregate is the PRODUCT of its key
    cardinalities, so the tuple is bounded only when EVERY key is
    bounded — ``[day, user_id]`` is corpus-proportional even though its
    first key alone is bounded (advisor r6 #1: judging by the first key
    only was a false negative).

    Handles both formats. Physical ``HashAggregate(keys=[...])``: empty
    keys = global agg = 1 row = bounded; else every key name must be
    bounded, with ``_groupingexpression`` keys resolved positionally
    through the agg's output columns (grouping columns lead the output
    list). Logical ``Aggregate [keys], [output]``: a single bracket
    list = global agg = bounded; else every key name must be bounded,
    with ``_groupingexpression`` resolved through the output list's
    ``AS name#`` aliases in order."""
    m = _PHYS_AGG.search(line)
    if m:
        keys = m.group(1)
        if not keys:
            return True  # global aggregate: one row
        names = _key_names(keys)
        outs = re.findall(r"(\w+)#", _OUTPUT_LIST.search(line).group(1)) if _OUTPUT_LIST.search(line) else []
        resolved = [
            outs[i] if n.startswith("_groupingexpression") and i < len(outs) else n
            for i, n in enumerate(names)
        ]
        return all(n in BOUNDED_WINDOW_KEYS for n in resolved)
    m = _LOGI_AGG.search(line)
    if m:
        tail = line[m.end() :]
        if "], [" not in tail:
            return True  # single list: global aggregate
        keys, output = tail.split("], [", 1)
        names = _key_names(keys)
        aliases = _FIRST_AS.findall(output)
        ai = iter(aliases)
        resolved = [
            next(ai, n) if n.startswith("_groupingexpression") else n
            for n in names
        ]
        return all(n in BOUNDED_WINDOW_KEYS for n in resolved)
    return None


def unbounded_constant_key_windows(plan: str) -> int:
    """Count Window nodes whose partition key is constant
    (pmod(xxhash64(...), 1), inline or via a projected alias) and whose
    input subtree hits a corpus scan or an unbounded-key aggregate
    before any bounding node. Works on either tree format (indent
    encodes the subtree); prefer ``optimizedPlan().toString()`` — the
    physical toString can fold the pmod alias definition into an
    aggregate's result list where it is textually invisible, so alias
    resolution is only complete on the logical plan."""
    lines = plan.splitlines()
    aliases = set(_CONST_ALIAS.findall(plan))
    bad = 0
    for i, ln in enumerate(lines):
        spec = _window_partition_spec(ln)
        if spec is None:
            continue
        is_const = bool(_CONST_KEY.search(spec)) or any(a in spec for a in aliases)
        if not is_const:
            continue
        d = _indent(ln)
        verdict_bounded = False
        for nxt in lines[i + 1 :]:
            if _indent(nxt) <= d:
                break  # left the subtree: nothing decisive -> flag
            if _BOUNDING_NODE.search(nxt):
                verdict_bounded = True
                break
            agg = _agg_verdict(nxt)
            if agg is not None:
                verdict_bounded = agg
                break
            if _SCAN_NODE.search(nxt):
                break  # reached a corpus scan unbounded -> flag
        if not verdict_bounded:
            bad += 1
    return bad


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
    plan: str,
    *,
    allow_cartesian: bool = False,
    allow_constant_window: bool = False,
    logical_plan: str | None = None,
) -> tuple[list[str], list[str]]:
    """Return (hard_flags, soft_flags) for one plan string (either
    ``explain("formatted")`` output or ``executedPlan().toString()``).

    The constant-key window check needs a toString-style plan carrying
    Window partition specs — ``explain("formatted")`` tree sections don't
    have them, so on formatted input the check would silently pass
    (advisor r6 #3). Pass ``logical_plan=optimized_plan(df)`` to run it
    on the plan format where alias resolution is complete; when omitted,
    the check falls back to ``plan`` and is only meaningful if ``plan``
    is itself a toString-style tree."""
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
    # constant-keyed (ranking._zero) windows over unbounded input: the
    # single-reducer pattern the empty-spec gate can't see. Opt-out is
    # per-query and must carry a written rationale at the call site.
    if not allow_constant_window:
        n_ck = unbounded_constant_key_windows(
            logical_plan if logical_plan is not None else plan
        )
        if n_ck:
            flags.append(f"constant-keyed Window over unbounded input x{n_ck}")
    return flags, soft
