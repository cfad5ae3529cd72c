"""Hot-cell probe for the capped semantic-dedup kernel (round-8 verdict #1).

Builds a deliberately skewed IVF assignment — ``--hot-frac`` of all
vectors land in ONE cell, the rest spread uniformly over the remaining
cells — then runs within-cell pair generation two ways on the SAME
assignment:

- uncapped: ``groupBy(cell).applyInPandas(_cell_pairs_kernel)`` — the
  hot cell is one task doing O(m^2) work while 31 cores idle.
- capped:   ``_sub_bucket_tasks`` + ``_sub_cell_pairs_kernel`` — the hot
  cell fans out into ceil(m/CAP)^2/2 bounded tasks.

Both pair sets are asserted identical (count + symmetric-difference).
Prints one JSON line with wall-clock for each and the speedup. The
capped path should approach min(ncores, ntasks)x on the hot cell —
that is the "bounded per-task time with one artificially hot cell"
evidence the verdict asked for.

Usage: python tools/hotcell_probe.py [--rows 200000] [--cap 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Model a real cluster's task slot (1 core per task) BEFORE the JVM
# starts: locally, numpy's BLAS is multi-threaded, so the "single" hot
# task would secretly use all 32 cores and mask the serialization the
# probe exists to expose. Python workers inherit this env from the JVM.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloudvectordb_spark.operators.pipeline import (
    _cell_pairs_kernel,
    _sub_bucket_tasks,
    _sub_cell_pairs_kernel,
)
from cloudvectordb_spark.session import get_session

DIM = 64
N_CELLS = 32
TAU = 0.95  # high threshold keeps the emitted pair set small; the WORK
# (the per-cell matmul) is threshold-independent, which is what we time.


def make_skewed(spark, rows: int, hot_frac: float):
    """(vec_id, embedding, centroid_id): hot_frac of rows in cell 0,
    rest uniform over cells 1..N_CELLS-1. Embeddings are deterministic
    xxhash64-derived unit-ish vectors — content is irrelevant, only the
    matmul shape matters."""
    hot_mod = max(2, int(round(1.0 / hot_frac)))
    base = spark.range(rows).select(
        F.col("id").alias("vec_id"),
        F.when(F.pmod("id", F.lit(hot_mod)) == 0, F.lit(0))
        .otherwise((F.pmod(F.xxhash64("id"), N_CELLS - 1) + 1).cast("int"))
        .alias("centroid_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (F.pmod(F.xxhash64(F.col("id"), j), 1000) - 500) / 500.0,
        ).alias("embedding"),
    )
    return base


def run(df, label: str):
    t0 = time.time()
    n = df.count()
    return {"label": label, "pairs": n, "sec": round(time.time() - t0, 2)}


def timed(kernel):
    """Wrap a grouped-map kernel to emit ONE row per task:
    (rows_in, pairs, kernel_sec) — direct evidence of per-task bound."""
    import pandas as pd

    def inner(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        out = kernel(pdf)
        return pd.DataFrame(
            {
                "rows_in": [len(pdf)],
                "pairs": [len(out)],
                "kernel_sec": [time.time() - t0],
            }
        )

    return inner


TIMED_SCHEMA = "rows_in bigint, pairs bigint, kernel_sec double"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--cap", type=int, default=2048)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    args = ap.parse_args()

    spark = get_session("hotcell-probe")
    root = f"/tmp/cloudvectordb_hotcell/{args.rows}_{args.hot_frac}"
    if not os.path.exists(f"{root}/_SUCCESS"):
        make_skewed(spark, args.rows, args.hot_frac).write.mode(
            "overwrite"
        ).parquet(root)
    assigned = spark.read.parquet(root)

    uncapped = assigned.groupBy("centroid_id").applyInPandas(
        _cell_pairs_kernel(TAU), "a_id bigint, b_id bigint, cos_sim double"
    )
    exploded = _sub_bucket_tasks(assigned, args.cap)
    capped = exploded.groupBy("centroid_id", "ti", "tj").applyInPandas(
        _sub_cell_pairs_kernel(TAU), "a_id bigint, b_id bigint, cos_sim double"
    )

    r_cap = run(capped, "capped")
    r_unc = run(uncapped, "uncapped")

    # per-task kernel time: max over tasks is THE bounded-per-task claim
    unc_tasks = (
        assigned.groupBy("centroid_id")
        .applyInPandas(timed(_cell_pairs_kernel(TAU)), TIMED_SCHEMA)
        .agg(F.max("kernel_sec").alias("mx"), F.max("rows_in").alias("mr"))
        .collect()[0]
    )
    cap_tasks = (
        exploded.groupBy("centroid_id", "ti", "tj")
        .applyInPandas(timed(_sub_cell_pairs_kernel(TAU)), TIMED_SCHEMA)
        .agg(F.max("kernel_sec").alias("mx"), F.max("rows_in").alias("mr"))
        .collect()[0]
    )

    # correctness: identical pair sets (exceptAll both ways, no collect
    # of the full sets)
    diff = (
        uncapped.exceptAll(capped).count() + capped.exceptAll(uncapped).count()
    )
    hot_rows = assigned.filter(F.col("centroid_id") == 0).count()
    n_tasks = (
        exploded.filter(F.col("centroid_id") == 0)
        .select("ti", "tj")
        .distinct()
        .count()
    )
    out = {
        "metric": "hotcell_capped_speedup",
        "rows": args.rows,
        "hot_cell_rows": hot_rows,
        "cap": args.cap,
        "hot_cell_tasks": n_tasks,
        "uncapped_sec": r_unc["sec"],
        "capped_sec": r_cap["sec"],
        "speedup": round(r_unc["sec"] / max(r_cap["sec"], 1e-9), 2),
        "uncapped_max_task_sec": round(unc_tasks["mx"], 2),
        "capped_max_task_sec": round(cap_tasks["mx"], 2),
        "uncapped_max_task_rows": int(unc_tasks["mr"]),
        "capped_max_task_rows": int(cap_tasks["mr"]),
        "pairs": r_cap["pairs"],
        "pair_set_diff": diff,
    }
    print(json.dumps(out))
    return 0 if diff == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
