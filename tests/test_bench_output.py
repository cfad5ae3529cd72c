"""bench.py artifact emission invariants (round-14 verdict #1).

The driver stores only the last ~2000 chars of bench stdout and parses
the FINAL JSON line. BENCH_r14.json was ``parsed: null`` because the
per-query spread dict grew that line to 2124 chars. These tests build
the output from the LIVE registry (so query-name growth counts) and pin
the final line under ``bench.FINAL_LINE_BUDGET`` (< 2000 with headroom).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from cloudvectordb_spark.registry import all_queries


def _synthetic_parts():
    """Timings/spreads shaped exactly like a real run: every bench query
    in ``queries``, every SERVING query in ``serving``, a spread entry for
    each, worst-case 6-char values (e.g. 12.345)."""
    qs = all_queries()
    timings = {n: 12.345 for n, s in qs.items() if s.bench}
    serving = {n: 12.345 for n in bench.SERVING}
    spreads = {n: 0.987 for n in list(timings) + list(serving)}
    assert len(timings) >= 10, "headline set unexpectedly small"
    assert len(serving) >= 11
    return timings, serving, spreads


def test_final_line_fits_driver_tail_capture():
    timings, serving, spreads = _synthetic_parts()
    detail, out = bench.build_output(
        timings, serving, spreads, errors={}, runs=3, sf=0.1, load0=(0.42, 0)
    )
    line = json.dumps(out)
    assert len(line) < bench.FINAL_LINE_BUDGET, (
        f"final bench line {len(line)} chars >= budget {bench.FINAL_LINE_BUDGET}: "
        "the driver's 2000-char tail capture would truncate it "
        "(BENCH_r14.json parsed:null). Move new detail to the earlier "
        "detail line or a sidecar."
    )
    # the full spread dict must ride the DETAIL line, not the final one
    assert "spread" not in out
    assert detail["spread"] == spreads
    # the final line still carries the spread summary
    assert out["spread_seconds"] == round(sum(spreads.values()), 3)
    assert len(out["spread_max"]) == 1


def test_final_line_core_fields_present():
    timings, serving, spreads = _synthetic_parts()
    _, out = bench.build_output(
        timings, serving, spreads, errors={}, runs=3, sf=0.1, load0=(0.42, 0)
    )
    for key in (
        "metric", "value", "unit", "queries", "serving", "serving_seconds",
        "serving_core_seconds", "spread_seconds", "stat", "runs", "sf",
        "load", "valid",
    ):
        assert key in out, f"missing {key}"
    assert out["valid"] is True
    assert out["value"] == round(sum(timings.values()), 3)
    # serving_core excludes the two r14 mutated-index additions
    assert out["serving_core_seconds"] == round(
        sum(v for n, v in serving.items() if n in bench.SERVING_CORE), 3
    )
    assert "bm25_batch_tiered_append" not in bench.SERVING_CORE
    assert "ivf_l0_tier_search" not in bench.SERVING_CORE


def test_invalid_load_marks_artifact():
    timings, serving, spreads = _synthetic_parts()
    _, out = bench.build_output(
        timings, serving, spreads, errors={}, runs=3, sf=0.1, load0=(9.9, 1)
    )
    assert out["valid"] is False
    assert "invalid_reason" in out
    assert len(json.dumps(out)) < bench.FINAL_LINE_BUDGET


def test_mid_run_load_sample_rides_final_line_within_budget():
    """Round-16 (r15 verdict #6): a co-tenant arriving MID-run must be
    visible in the artifact — loadavg sampled between queries, max
    reported — without blowing the driver's tail-capture budget."""
    timings, serving, spreads = _synthetic_parts()
    _, out = bench.build_output(
        timings, serving, spreads, errors={}, runs=3, sf=0.1,
        load0=(0.42, 0), mid_loads=[0.5, 7.52, 3.1],
    )
    assert out["load"]["loadavg_1m_mid_max"] == 7.52
    assert len(json.dumps(out)) < bench.FINAL_LINE_BUDGET
    # absent when not sampled (old callers / unit paths)
    _, out2 = bench.build_output(
        timings, serving, spreads, errors={}, runs=3, sf=0.1, load0=(0.42, 0)
    )
    assert "loadavg_1m_mid_max" not in out2["load"]
