"""Relational scale probe: synthesize a ~10x-sf0.1 star slice (6M
lineitem rows, 1.5M orders) in /tmp and time the three core relational
shapes — scan+agg (Q1), fact-fact join+agg (Q3-ish), partitioned window
(running total) — to show the plans hold beyond fixture scale.

Synthetic data is generated IN SPARK (range + column exprs, written
once, mtime-cached) — it exercises the same operators; it is NOT used
for correctness (the driver fixtures remain the only oracle inputs).

Usage: python tools/relational_scale_probe.py [--lines 6000000]
Prints one JSON line with per-shape seconds and rows/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cloudvectordb_spark.session import get_session


def ensure_data(spark, n_lines: int, root: str) -> tuple[str, str]:
    lpath, opath = f"{root}/lineitem", f"{root}/orders"
    if os.path.exists(f"{lpath}/_SUCCESS") and os.path.exists(f"{opath}/_SUCCESS"):
        return lpath, opath
    n_orders = n_lines // 4
    orders = (
        spark.range(n_orders)
        .select(
            F.col("id").alias("o_orderkey"),
            (F.pmod(F.xxhash64("id"), 150_000)).alias("o_custkey"),
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                F.pmod(F.xxhash64("id", F.lit(1)), 365).cast("int"),
            ).alias("o_orderdate"),
            (F.pmod(F.xxhash64("id", F.lit(2)), 500_000) / 100.0 + 1.0).alias(
                "o_totalprice"
            ),
        )
    )
    lines = (
        spark.range(n_lines)
        .select(
            (F.col("id") % n_orders).alias("l_orderkey"),
            (F.pmod(F.xxhash64("id"), 50) + 1).cast("double").alias("l_quantity"),
            (F.pmod(F.xxhash64("id", F.lit(1)), 90_000) / 100.0 + 1.0).alias(
                "l_extendedprice"
            ),
            (F.pmod(F.xxhash64("id", F.lit(2)), 11) / 100.0).alias("l_discount"),
            F.element_at(
                F.array(F.lit("N"), F.lit("R"), F.lit("A")),
                (F.pmod(F.xxhash64("id", F.lit(3)), 3) + 1).cast("int"),
            ).alias("l_returnflag"),
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                F.pmod(F.xxhash64("id", F.lit(4)), 365).cast("int"),
            ).alias("l_shipdate"),
        )
    )
    orders.write.mode("overwrite").parquet(opath)
    lines.write.mode("overwrite").parquet(lpath)
    return lpath, opath


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=6_000_000)
    args = ap.parse_args()

    spark = get_session("relational-scale-probe")
    root = os.path.join("/tmp", "cloudvectordb_relprobe", str(args.lines))
    lpath, opath = ensure_data(spark, args.lines, root)
    li, orders = spark.read.parquet(lpath), spark.read.parquet(opath)

    def timed(fn):
        fn().collect()  # warm
        t0 = time.perf_counter()
        fn().collect()
        return round(time.perf_counter() - t0, 3)

    # Q1 shape: scan + filter + grouped agg with map-side combine
    q1 = lambda: (
        li.filter(F.col("l_shipdate") <= "2024-11-01")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n"),
        )
    )
    # Q3 shape: fact-fact shuffle join + agg + top-k
    q3 = lambda: (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_orderdate") < "2024-06-01")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        .orderBy(F.desc("rev"), F.asc("o_custkey"))
        .limit(10)
    )
    # window shape: partitioned running total over the fact table
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    qw = lambda: (
        orders.withColumn(
            "rt", F.round(F.sum("o_totalprice").over(w), 2)
        ).groupBy().agg(F.count("*").alias("n"), F.round(F.sum("rt"), 0).alias("s"))
    )

    # --- global ranking primitives (ranking.py) at the same row scale ---
    # These are the engine's distributed replacements for the
    # single-reducer global rank / cumsum / running-max windows; the
    # probe proves the keyed-exchange forms hold beyond fixture scale
    # and quantifies the value-skew caveat (equal values share a bucket,
    # so a hot value concentrates one bucket's local window).
    from cloudvectordb_spark.ranking import (
        with_global_prefix_sum,
        with_global_row_number,
        with_global_running_max,
    )

    n = args.lines

    def base(skewed: bool):
        # uniform: ~1M distinct values; skewed: HALF the rows share one
        # hot value (worst realistic case short of all-equal)
        v_uniform = F.pmod(F.xxhash64("id"), 1_000_000).cast("double")
        v = (
            F.when(F.pmod(F.xxhash64("id", F.lit(7)), 2) == 0, F.lit(500_000.0))
            .otherwise(v_uniform)
            if skewed
            else v_uniform
        )
        return spark.range(n).select(
            "id",
            v.alias("v"),
            (F.pmod(F.xxhash64("id", F.lit(9)), 100) + 1.0).alias("wt"),
        )

    def rank_probe(skewed: bool):
        def run():
            ranked = with_global_row_number(base(skewed), "v", [F.col("id")])
            return ranked.agg(
                F.count("*").alias("n"),
                F.max("global_rn").alias("mx"),
                F.sum("global_rn").alias("s"),
            )

        sec = timed(run)
        row = run().collect()[0]
        assert row.n == n and row.mx == n and row.s == n * (n + 1) // 2, (
            "global row number not a permutation of 1..n"
        )
        return sec

    def prefix_probe():
        def run():
            cum = with_global_prefix_sum(base(False), "id", "wt")
            return cum.agg(
                F.count("*").alias("n"),
                F.max(F.col("cum_before") + F.col("wt")).alias("mx"),
                F.max("_total_weight").alias("tot"),
            )

        sec = timed(run)
        row = run().collect()[0]
        assert row.n == n and row.mx == row.tot, "prefix sum total mismatch"
        return sec

    def runmax_probe():
        width = -(-n // 256)  # ceil: 256 monotone buckets over the id order

        def run():
            rm = with_global_running_max(
                base(False), F.floor(F.col("id") / width), [F.asc("id")], "v"
            )
            return rm.agg(
                F.count("*").alias("n"), F.max("run_max").alias("mx"),
                F.max("v").alias("vmax"),
            )

        sec = timed(run)
        row = run().collect()[0]
        assert row.n == n and row.mx == row.vmax, "running max mismatch"
        return sec

    out = {
        "n_lineitem": args.lines,
        "q1_scan_agg_s": timed(q1),
        "q3_join_topk_s": timed(q3),
        "window_running_total_s": timed(qw),
        "global_rank_s": rank_probe(False),
        "global_rank_hot_value_s": rank_probe(True),
        "global_prefix_sum_s": prefix_probe(),
        "global_running_max_s": runmax_probe(),
    }
    out["q1_rows_per_s"] = int(args.lines / out["q1_scan_agg_s"])
    out["global_rank_rows_per_s"] = int(n / out["global_rank_s"])
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
