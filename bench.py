"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.registry import all_queries
from cloudvectordb_spark.session import get_session

# Second bench group (round-8 verdict #6): the serving/maintenance layer
# — batched text + ANN serving, hybrid fusion, incremental index
# maintenance — so regressions there gate perf like the r1 headline set
# does. Timed identically; reported under "serving" and NOT folded into
# the headline total (BASELINE.md carries the committed per-query
# numbers). The list itself lives in registry.py (round-14 verdict #2:
# the driver's correctness window must include it too); re-exported here
# so tools/plan_audit.py and existing imports keep working.
from cloudvectordb_spark.registry import SERVING  # noqa: F401

# The serving subtotal comparable across rounds r8–r13 (before the two
# r14 mutated-index additions) — emitted as serving_core_seconds so the
# cross-round trend line doesn't conflate group growth with regression
# (round-14 verdict nit #4).
SERVING_CORE = [
    n for n in SERVING
    if n not in ("bm25_batch_tiered_append", "ivf_l0_tier_search")
]


# The repo's own validity rule (BASELINE.md "Reading bench numbers
# under load", round-9 verdict #8): a reading that STARTS with another
# JVM on the box or loadavg_1m above this threshold is load-skewed.
_LOAD_VALID_MAX = 4.0


def _settle(budget_s: float) -> tuple[float, int]:
    """Wait (bounded) for the box to go quiet before starting: the 1-min
    loadavg decays with a ~60 s time constant once the foreign work
    stops, so a just-finished neighbor clears in well under the budget.
    Returns the final (loadavg_1m, java_procs) snapshot — which may
    still violate the rule if the neighbor is persistent; the artifact
    then carries valid=false rather than a silently skewed number
    (round-12 verdict #6: BENCH_r12 was committed with start load 4.24
    and 1 pre-existing JVM, overstating the suite ~15%)."""
    deadline = time.monotonic() + budget_s
    while True:
        la, nj = round(os.getloadavg()[0], 2), _count_java_procs()
        if (la <= _LOAD_VALID_MAX and nj == 0) or time.monotonic() >= deadline:
            return la, nj
        time.sleep(5)


def main() -> None:
    # snapshot host load BEFORE the JVM starts (a loaded box at start is
    # the clearest "this reading is skewed" signal); give a transiently
    # busy box a bounded chance to settle first
    settle_budget = float(os.environ.get("SPARK_GRAFT_BENCH_SETTLE", "120"))
    load0 = _settle(settle_budget)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    # A broken operator module silently shrinks all_queries() (registry
    # swallows import errors by design so one module can't sink the whole
    # surface) — make any such partial registry loud at bench time.
    from cloudvectordb_spark.registry import import_errors

    all_queries()
    for mod, err in import_errors.items():
        print(f"registry import error: {mod}: {err}", file=sys.stderr)

    spark = get_session("cloudvectordb-bench")
    # warm up the JVM + parquet footer caches outside the timed region
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        load(spark, sf_dir, t).count()
    # S4 bulk index build is its own lifecycle stage; search queries bench
    # the PROBE path against the persisted layout (like any vectordb)
    from cloudvectordb_spark.operators.pipeline import ensure_ivf_index

    try:
        ensure_ivf_index(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001 — search queries will record it
        print(f"ensure_ivf_index failed: {exc}", file=sys.stderr)

    # Steady-state latency: one untimed warm-up execution per query
    # (whole-stage codegen compile + AQE stats land there), then the
    # MEDIAN of N timed runs with the max−min SPREAD recorded beside it
    # (round-13 verdict #7: this container's scheduler noise reached 3×
    # on identical workloads with zero foreign JVMs — the load gate
    # catches neighbors, the spread column makes the box's OWN variance
    # visible in the artifact instead of silently riding the number).
    # Median ≥ best-of-N by construction; r14+ artifacts are medians.
    # Set SPARK_GRAFT_BENCH_RUNS=1 for single-shot cold timings.
    import statistics

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    serving: dict[str, float] = {}
    spreads: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Mid-run load samples (round-15 verdict #6): the start/end load
    # pair cannot see a co-tenant that arrives MID-run (the r15 run
    # started at 2.99 and ended at 7.52 with valid=true); sampling
    # loadavg between queries makes that skew visible in the artifact.
    # The bench's own Spark work keeps 1-min loadavg well above zero,
    # so the number is an upper-bound indicator, not a gate.
    mid_loads: list[float] = []

    def time_query(spec) -> tuple[float, float]:
        if runs > 1:
            spec.fn(spark, sf_dir).collect()  # warm-up, untimed
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        mid_loads.append(os.getloadavg()[0])
        return (
            round(statistics.median(samples), 3),
            round(max(samples) - min(samples), 3),
        )

    for name, spec in sorted(all_queries().items()):
        if not spec.bench:
            continue
        # One failing query must not zero the whole bench: record it and
        # keep timing the rest (the per-query error is visible in the JSON).
        try:
            timings[name], spreads[name] = time_query(spec)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    reg = all_queries()
    for name in SERVING:
        spec = reg.get(name)
        if spec is None:
            errors[name] = "not registered"
            continue
        try:
            serving[name], spreads[name] = time_query(spec)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    detail, out = build_output(
        timings, serving, spreads, errors, runs, sf, load0, mid_loads
    )
    if not out["valid"]:
        print(
            f"bench reading is LOAD-SKEWED ({out['invalid_reason']}) — "
            "re-run on an idle box before committing",
            file=sys.stderr,
        )
    # Full per-query spread dict on an EARLIER stdout line: the driver
    # captures only the last ~2000 chars of stdout and parses the FINAL
    # JSON line, so detail that is allowed to scale with query count must
    # never ride on the machine-readable line (round-14 verdict #1:
    # BENCH_r14.json was parsed:null because the spread dict pushed the
    # final line to 2124 chars). tests/test_bench_output.py pins the
    # final line under FINAL_LINE_BUDGET.
    print(json.dumps(detail))
    print(json.dumps(out))


# The driver's tail capture is 2000 chars; keep headroom for per-query
# timing digits growing (e.g. 9.999 -> 12.345) and an occasional short
# errors entry. tests/test_bench_output.py builds the dict from the LIVE
# registry and asserts the emitted final line stays under this.
FINAL_LINE_BUDGET = 1800


def build_output(
    timings: dict[str, float],
    serving: dict[str, float],
    spreads: dict[str, float],
    errors: dict[str, str],
    runs: int,
    sf: float,
    load0: tuple[float, int],
    mid_loads: list[float] | None = None,
) -> tuple[dict, dict]:
    """Build the (detail_line, final_machine_line) pair.

    The FINAL line is the one the driver parses and must stay compact
    (< FINAL_LINE_BUDGET chars): per-query medians, group subtotals, the
    spread SUMMARY (sum + the single widest query), stat/runs/sf/load/
    valid. The detail line carries the full per-query spread dict.
    """
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "serving": serving,
        "serving_seconds": round(sum(serving.values()), 3),
        # subtotal over the r8–r13-comparable subset (round-14 nit #4)
        "serving_core_seconds": round(
            sum(serving.get(n, 0.0) for n in SERVING_CORE), 3
        ),
        "spread_seconds": round(sum(spreads.values()), 3),
        "stat": "median" if runs > 1 else "single",
        "runs": runs,
        "sf": sf,
        # Host-load indicator (round-9 verdict #8): the r9 driver reading
        # ran +20% over the quiet-box number purely from concurrent probe
        # traffic. loadavg_end > ~1.5x the bench's own CPU budget or
        # java_procs > 1 means OTHER work shared the box — interpret the
        # timings per BASELINE.md "Reading bench numbers under load".
        "load": _load_indicator(load0, mid_loads),
    }
    if spreads:
        worst = max(spreads, key=lambda n: spreads[n])
        out["spread_max"] = {worst: spreads[worst]}
    # validity gate (round-12 verdict #6): the artifact itself declares
    # whether its own load line passes the repo's reading rule — a
    # consumer (or the builder about to commit BENCH_r{N}.json) must
    # re-run rather than record a valid=false number
    la_start, procs_start = load0
    reasons = []
    if procs_start > 0:
        reasons.append(f"java_procs_start={procs_start} (another JVM on the box)")
    if la_start > _LOAD_VALID_MAX:
        reasons.append(f"loadavg_1m_start={la_start} > {_LOAD_VALID_MAX}")
    out["valid"] = not reasons
    if reasons:
        out["invalid_reason"] = "; ".join(reasons)
    if errors:
        out["errors"] = errors
    detail = {"metric": "per_query_spread_seconds", "spread": spreads}
    return detail, out


def _count_java_procs() -> int:
    """Concurrently-running JVMs (this bench owns exactly one)."""
    import glob

    n = 0
    for comm in glob.glob("/proc/[0-9]*/comm"):
        try:
            with open(comm) as f:
                n += f.read().strip() == "java"
        except OSError:
            continue  # process exited mid-scan
    return n


def _load_indicator(
    start: tuple[float, int] | None, mid_loads: list[float] | None = None
) -> dict:
    la1 = round(os.getloadavg()[0], 2)
    out = {"loadavg_1m_end": la1, "java_procs_end": _count_java_procs()}
    if start is not None:
        out["loadavg_1m_start"], out["java_procs_start"] = start
    if mid_loads:
        # sampled once per query between timed regions (round-15
        # verdict #6): a co-tenant arriving mid-run shows up here even
        # when the start gate passed
        out["loadavg_1m_mid_max"] = round(max(mid_loads), 2)
    return out


if __name__ == "__main__":
    main()
