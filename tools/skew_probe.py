"""Skew-join probe: AQE skew-split vs explicit salting, measured.

SCALE.md's skew playbook says (1) AQE skew-split is the free first line
of defense, (2) `skew.salted_join` is the deterministic fallback. This
probe measures both claims on a deliberately skewed 6M-row join — one
hot key carrying 20% of the fact rows, dim side 100k keys:

- baseline: AQE skew-join ON (the shipped session default)
- naive:    AQE skew-join OFF, plain join — the hot key lands on one task
- salted:   AQE skew-join OFF, `salted_join(n_salts=8)` — the hot key is
            spread over 8 tasks by row-content hash

All three must produce the identical aggregate (asserted).

Usage: python tools/skew_probe.py [--rows 6000000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloudvectordb_spark.session import get_session
from cloudvectordb_spark.skew import salted_join

N_DIM = 100_000
HOT_FRAC = 5  # 1/5 of fact rows hit key 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6_000_000)
    args = ap.parse_args()

    spark = get_session("skew-probe")
    root = f"/tmp/cloudvectordb_skewprobe/{args.rows}"
    fpath, dpath = f"{root}/fact", f"{root}/dim"
    if not os.path.exists(f"{fpath}/_SUCCESS"):
        fact = spark.range(args.rows).select(
            F.col("id").alias("row_id"),
            F.when(F.pmod("id", F.lit(HOT_FRAC)) == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), N_DIM))
            .alias("k"),
            (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 10.0).alias("x"),
        )
        fact.write.mode("overwrite").parquet(fpath)
        dim = spark.range(N_DIM).select(
            F.col("id").alias("k"), (F.pmod(F.xxhash64("id"), 97)).alias("w")
        )
        dim.write.mode("overwrite").parquet(dpath)

    fact, dim = spark.read.parquet(fpath), spark.read.parquet(dpath)

    def agg(joined):
        return joined.agg(
            F.count("*").alias("n"), F.round(F.sum(F.col("x") * F.col("w")), 2).alias("s")
        ).collect()[0]

    def timed(fn):
        fn()
        t0 = time.perf_counter()
        out = fn()
        return round(time.perf_counter() - t0, 3), out

    def with_skew_split(flag: bool, fn):
        prev = spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(flag).lower())
        try:
            return timed(fn)
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev)

    # dim must not be broadcast (that would sidestep the skew entirely);
    # pin a shuffle join so the probe exercises the skewed exchange.
    hinted = dim.hint("shuffle_hash")

    aqe_s, aqe_row = with_skew_split(True, lambda: agg(fact.join(hinted, "k")))
    naive_s, naive_row = with_skew_split(False, lambda: agg(fact.join(hinted, "k")))
    salted_s, salted_row = with_skew_split(
        False, lambda: agg(salted_join(fact, hinted, "k", salt_source="row_id"))
    )
    assert aqe_row == naive_row == salted_row, "paths disagree"

    print(
        json.dumps(
            {
                "n_fact": args.rows,
                "n_dim": N_DIM,
                "hot_key_rows": args.rows // HOT_FRAC,
                "join_rows": aqe_row.n,
                "aqe_skew_split_s": aqe_s,
                "naive_no_split_s": naive_s,
                "salted_8_s": salted_s,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
