"""Z-order vs linear layout: MEASURED row-group skipping.

`zorder_layout_stats` (the registered query) proves per-z-range min/max
envelopes are tight in BOTH dimensions; this probe closes the loop by
writing the same rows twice — linearly clustered on o_custkey vs
Morton-clustered on (o_custkey, day) — and counting, from the parquet
FOOTERS (pyarrow row-group statistics, exactly what any stats-based
reader prunes with), how many row groups a 2-D box predicate actually
has to read under each layout.

Usage: python tools/zorder_probe.py [--sf /root/testdata/sf0.1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.operators.sources import _z_interleave
from cloudvectordb_spark.session import get_session

N_FILES = 32


def rowgroup_stats(root: str, cols: tuple[str, str]):
    """Yield (min, max) per column per row group across all files."""
    for path in sorted(glob.glob(os.path.join(root, "*.parquet"))):
        md = pq.ParquetFile(path).metadata
        name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            out = {}
            for c in cols:
                st = g.column(name_to_idx[c]).statistics
                out[c] = (st.min, st.max)
            yield out


def frac_scanned(root: str, box: dict[str, tuple]) -> tuple[int, int]:
    total = kept = 0
    for st in rowgroup_stats(root, tuple(box)):
        total += 1
        if all(st[c][0] <= hi and st[c][1] >= lo for c, (lo, hi) in box.items()):
            kept += 1
    return kept, total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--synthetic-lines",
        type=int,
        default=0,
        help="use the relational_scale_probe synthetic orders slice"
        " (lines/4 orders) instead of the fixture",
    )
    args = ap.parse_args()

    spark = get_session("zorder-probe")
    if args.synthetic_lines:
        from relational_scale_probe import ensure_data

        root = os.path.join(
            "/tmp", "cloudvectordb_relprobe", str(args.synthetic_lines)
        )
        _, opath = ensure_data(spark, args.synthetic_lines, root)
        orders = spark.read.parquet(opath).select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate"), F.lit("2024-01-01").cast("date")
            ).alias("day_ord"),
            "o_totalprice",
        )
    else:
        orders = load(spark, args.sf, "orders").select(
            "o_custkey",
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
            ).alias("day_ord"),
            "o_totalprice",
        )
    stats = orders.agg(
        F.min("o_custkey").alias("mnc"),
        F.max("o_custkey").alias("mxc"),
        F.min("day_ord").alias("mnd"),
        F.max("day_ord").alias("mxd"),
    ).collect()[0]

    tag = f"syn{args.synthetic_lines}" if args.synthetic_lines else "fixture"
    root = f"/tmp/cloudvectordb_zorder_probe/{tag}"
    linear, zorder = f"{root}/linear", f"{root}/zorder"

    # Linear: clustered on custkey only (the "sorted by primary key" default).
    orders.repartitionByRange(N_FILES, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.mode("overwrite").parquet(linear)

    # Z-order: Morton-interleave 8-bit buckets of both dimensions.
    bx = f"(o_custkey - {stats.mnc}) * 256 div ({stats.mxc - stats.mnc} + 1)"
    by = f"(day_ord - {stats.mnd}) * 256 div ({stats.mxd - stats.mnd} + 1)"
    z = orders.withColumn("z", F.expr(_z_interleave(f"({bx})", f"({by})", "div")))
    z.repartitionByRange(N_FILES, "z").sortWithinPartitions("z").drop(
        "z"
    ).write.mode("overwrite").parquet(zorder)

    # Three predicate shapes: the primary-key dimension alone (linear's
    # best case), the secondary dimension alone (linear's worst case --
    # every file intersects), and the 2-D box. Z-order's trade: good
    # pruning on EVERY dimension instead of perfect on one / none on the
    # rest.
    ck_w = (stats.mxc - stats.mnc) // 16
    ck_box = (stats.mnc + 5 * ck_w, stats.mnc + 6 * ck_w)
    day_span = stats.mxd - stats.mnd
    day_box = (
        stats.mnd + int(day_span * 0.30),
        stats.mnd + int(day_span * 0.34),
    )
    boxes = {
        "custkey_only": {"o_custkey": ck_box},
        "day_only": {"day_ord": day_box},
        "both": {"o_custkey": ck_box, "day_ord": day_box},
    }

    out = {
        "sf": tag if args.synthetic_lines else args.sf,
        "n_rows": orders.count(),
        "n_files": N_FILES,
    }
    for label, box in boxes.items():
        # Both layouts must return identical query results (sanity).
        pred = None
        for c, (lo, hi) in box.items():
            term = (F.col(c) >= lo) & (F.col(c) <= hi)
            pred = term if pred is None else (pred & term)
        r_lin = spark.read.parquet(linear).filter(pred).count()
        r_z = spark.read.parquet(zorder).filter(pred).count()
        assert r_lin == r_z, f"layouts disagree on {label}"
        k_lin, t_lin = frac_scanned(linear, box)
        k_z, t_z = frac_scanned(zorder, box)
        out[f"{label}_match_rows"] = r_lin
        out[f"{label}_linear_scan_frac"] = round(k_lin / t_lin, 4)
        out[f"{label}_zorder_scan_frac"] = round(k_z / t_z, 4)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
