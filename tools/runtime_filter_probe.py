"""Runtime-filter scale probe: bloom prefilter vs plain semi-join, and
Misra-Gries two-pass heavy hitters vs full groupBy, on the synthetic 6M-
row star slice (shared, mtime-cached, from relational_scale_probe).

Shows the scale_patterns.py mechanisms keep their shape an order of
magnitude past fixture scale:
- bloom: probe-side rows entering the join shuffle drop to selectivity
  x (1 + fp); the bitmap stays 8 KiB at any build size.
- MG heavy hitters: pass-1 memory fixed at 125 counters/task while the
  key domain here is ~1M; the exact pass touches only candidates.

Usage: python tools/runtime_filter_probe.py [--lines 6000000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from pyspark.sql import functions as F

from relational_scale_probe import ensure_data

from cloudvectordb_spark.operators import scale_patterns as sp
from cloudvectordb_spark.session import get_session


def timed(fn):
    fn()  # warm
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def capfp(n_keys: int, n_probe: int = 2_000_000) -> int:
    """Measure the bloom's false-positive rate IN THE CAPPED REGIME
    (n_keys * 16 > _MAX_BITS): build on n_keys distinct longs, probe a
    DISJOINT key range, report the fp share. Verdict r4 item 3's "record
    fp at the cap" — the driver collect stays bounded at 2^20 words while
    fp degrades gracefully instead of the bitmap growing."""
    spark = get_session("bloom-capfp")
    keys = spark.range(n_keys).select(F.col("id").alias("o_orderkey"))
    t0 = time.perf_counter()
    words, m_bits = sp.build_bloom(keys, "o_orderkey")
    build_s = round(time.perf_counter() - t0, 2)
    probe = spark.range(n_keys, n_keys + n_probe).select(
        F.col("id").alias("o_orderkey")
    )
    fp = sp.bloom_filter_rows(probe, "o_orderkey", words, m_bits).count()
    import math

    k = 4
    theory = (1 - math.exp(-k * n_keys / m_bits)) ** k
    print(
        json.dumps(
            {
                "mode": "capfp",
                "n_keys": n_keys,
                "m_bits": m_bits,
                "bits_per_key": round(m_bits / n_keys, 2),
                "bitmap_words_collected": m_bits >> 6,
                "build_s": build_s,
                "probe_disjoint_keys": n_probe,
                "fp_rate": round(fp / n_probe, 4),
                "fp_theory": round(theory, 4),
            }
        )
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=6_000_000)
    ap.add_argument(
        "--capfp-keys",
        type=int,
        default=0,
        help="measure capped-regime fp with this many build keys (skips the join probe)",
    )
    args = ap.parse_args()
    if args.capfp_keys:
        return capfp(args.capfp_keys)

    spark = get_session("runtime-filter-probe")
    root = os.path.join("/tmp", "cloudvectordb_relprobe", str(args.lines))
    lpath, opath = ensure_data(spark, args.lines, root)
    li, orders = spark.read.parquet(lpath), spark.read.parquet(opath)

    # --- bloom prefilter vs plain semi-join -------------------------------
    # Build side: one month of orders (~8% selectivity on the probe).
    keys = orders.filter(
        (F.col("o_orderdate") >= "2024-03-01") & (F.col("o_orderdate") < "2024-04-01")
    ).select("o_orderkey")
    n_keys = keys.count()

    def plain():
        return (
            li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi")
            .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2))
            .collect()[0]
        )

    words, m_bits = sp.build_bloom(keys, "o_orderkey")

    def bloomed():
        surv = sp.bloom_filter_rows(li, "l_orderkey", words, m_bits)
        return (
            surv.join(keys, surv.l_orderkey == keys.o_orderkey, "left_semi")
            .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2))
            .collect()[0]
        )

    plain_s, plain_row = timed(plain)
    bloom_s, bloom_row = timed(bloomed)
    assert plain_row.n == bloom_row.n, "bloom path changed the exact result"
    surv_n = sp.bloom_filter_rows(li, "l_orderkey", words, m_bits).count()

    # --- MG two-pass heavy hitters vs full groupBy ------------------------
    # Skewed key over a ~1M-key domain: 5 hot keys carry ~5% of rows each
    # (hash-derived, deterministic), the rest uniform.
    ev = li.select(
        F.when(
            F.pmod(F.xxhash64("l_orderkey", F.lit(99)), 4) == 0,
            F.pmod(F.xxhash64("l_orderkey", F.lit(98)), 5),
        )
        .otherwise(F.pmod(F.xxhash64("l_orderkey", F.lit(97)), 1_000_000) + 10)
        .alias("k")
    )
    phi, cap = 0.01, 100
    n_total = ev.count()

    def full_groupby():
        return sorted(
            r.k
            for r in ev.groupBy("k")
            .agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") > phi * n_total)
            .collect()
        )

    def two_pass(count_only: bool = False):
        def mg(batches):
            import pandas as pd

            counters: dict[int, int] = {}
            for pdf in batches:
                for key, cnt in pdf.groupby("k").size().items():
                    counters[key] = counters.get(key, 0) + int(cnt)
                if len(counters) > cap:
                    cut = sorted(counters.values(), reverse=True)[cap]
                    counters = {k: c - cut for k, c in counters.items() if c > cut}
            if counters:
                yield pd.DataFrame({"k": list(counters)})

        cands = ev.mapInPandas(mg, "k long").dropDuplicates(["k"])
        if count_only:
            return cands.count()
        return sorted(
            r.k
            for r in ev.join(F.broadcast(cands), "k", "left_semi")
            .groupBy("k")
            .agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") > phi * n_total)
            .collect()
        )

    full_s, full_keys = timed(full_groupby)
    mg_s, mg_keys = timed(two_pass)
    assert full_keys == mg_keys, "two-pass heavy hitters diverged from ground truth"
    n_cands = two_pass(count_only=True)

    print(
        json.dumps(
            {
                "n_lineitem": args.lines,
                "bloom_build_keys": n_keys,
                "bloom_bits": m_bits,
                "bloom_survivor_rows": surv_n,
                "bloom_selectivity": round(surv_n / args.lines, 4),
                "semi_join_plain_s": plain_s,
                "semi_join_bloom_s": bloom_s,
                "hh_domain": 1_000_005,
                "hh_candidate_rows": n_cands,
                "hh_true_heavy": len(full_keys),
                "hh_full_groupby_s": full_s,
                "hh_two_pass_s": mg_s,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
