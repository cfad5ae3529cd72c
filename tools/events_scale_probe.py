"""Event sessionization + tumbling rollup at 10-60M rows.

The J-group operators were measured only at sf0.1 (100k events); this
probe runs the SAME plan shapes on a synthetic clickstream so the
"one exchange on the grouping key" claim carries a number:

- sessionize: the lag-gap-flag + running-sum + groupBy plan of
  `events_sessions` (one exchange on user_id, two window passes over
  one sort) — wall should scale ~linearly in rows.
- tumbling rollup: hour-bucket groupBy (one exchange on the bucket).

Synthetic stream: N events over U users, deterministic xxhash64
timestamps within a 30-day span; value uniform. Row counts of both
outputs are asserted > 0 and the sessions output must be consistent
(sum of n_events == N).

Usage: python tools/events_scale_probe.py [--n 10000000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from cloudvectordb_spark.session import get_session

USERS_FRAC = 1000  # n // USERS_FRAC distinct users
SPAN_DAYS = 30


def synthetic_events(spark, n: int, parts: int = 64):
    base = F.lit("2026-01-01 00:00:00").cast("timestamp")
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(max(1, n // USERS_FRAC))).alias("user_id"),
        F.timestamp_micros(
            F.unix_micros(base)
            + F.pmod(F.xxhash64("id", F.lit(1)), SPAN_DAYS * 86_400_000_000)
        ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 1000) / 10.0).alias("value"),
    )


def sessionize(ev):
    """The events_sessions plan shape on any (user_id, ts, event_id,
    value) frame (cloudvectordb_spark/operators/events.py:158)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev_ts = F.lag(F.col("ts")).over(w)
    new_s = F.when(
        prev_ts.isNull()
        | (F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts")) >= gap_us),
        1,
    ).otherwise(0)
    sid = F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        ev.withColumn("_sid", sid)
        .groupBy("user_id", "_sid")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    args = ap.parse_args()

    spark = get_session("events-scale-probe")
    root = f"/tmp/cloudvectordb_evprobe/{args.n}"
    if not os.path.exists(f"{root}/_SUCCESS"):
        synthetic_events(spark, args.n).write.mode("overwrite").parquet(root)
    ev = spark.read.parquet(root)

    t0 = time.perf_counter()
    sess = sessionize(ev)
    agg = sess.agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
    ).collect()[0]
    sess_s = round(time.perf_counter() - t0, 1)
    assert agg.total_events == args.n, "sessionize lost/duplicated events"

    t0 = time.perf_counter()
    n_buckets = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .count()
    )
    roll_s = round(time.perf_counter() - t0, 1)

    out = {
        "metric": "events_scale",
        "rows": args.n,
        "users": max(1, args.n // USERS_FRAC),
        "sessionize_s": sess_s,
        "n_sessions": int(agg.n_sessions),
        "sessionize_rows_per_s": int(args.n / sess_s),
        "tumbling_hour_s": roll_s,
        "hour_buckets": n_buckets,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
