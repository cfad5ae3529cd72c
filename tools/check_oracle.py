"""Local stand-in for the driver's t2 correctness gate.

Runs every registered query on Spark AND its oracle SQL on DuckDB over
the same parquet fixtures, then compares row count, schema (pandas
dtypes), and order-insensitive values (exact for non-floats, exact-and-
tolerance-reported for floats). Use while developing; the real gate is
the driver's CORRECTNESS_r{N}.json.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only name[,name]]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudvectordb_spark.catalog import TABLES
from cloudvectordb_spark.registry import all_queries
from cloudvectordb_spark.session import get_session


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.astype(str).agg("|".join, axis=1)
    return df.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    if list(s.columns) != list(d.columns):
        problems.append(f"columns spark={list(s.columns)} duck={list(d.columns)}")
        return problems
    for c in s.columns:
        st, dt = s[c], d[c]
        # ns-vs-us datetime resolution is a pandas artifact, not a schema
        # difference (Spark timestamp == DuckDB TIMESTAMP); normalize.
        if st.dtype.kind == "M" and dt.dtype.kind == "M":
            st = st.astype("datetime64[us]")
            dt = dt.astype("datetime64[us]")
        elif str(st.dtype) != str(dt.dtype):
            problems.append(f"dtype[{c}] spark={st.dtype} duck={dt.dtype}")
        if st.dtype.kind == "f" or dt.dtype.kind == "f":
            a, b = st.to_numpy(dtype=float), dt.to_numpy(dtype=float)
            both_nan = np.isnan(a) & np.isnan(b)
            exact = np.array_equal(a, b, equal_nan=True)
            if not exact:
                with np.errstate(invalid="ignore"):
                    diff = np.where(both_nan, 0.0, np.abs(a - b))
                mx = np.nanmax(diff) if len(diff) else 0.0
                problems.append(f"float[{c}] not bit-equal, max_abs_diff={mx:.3e}")
        else:
            if not st.astype(str).equals(dt.astype(str)):
                n_bad = int((st.astype(str) != dt.astype(str)).sum())
                problems.append(f"values[{c}] mismatch in {n_bad} rows")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    spark = get_session("oracle-check", cpus=8, shuffle_partitions=8)
    con = duck_connection(args.sf)
    specs = all_queries()
    if args.only:
        keep = set(args.only.split(","))
        specs = {k: v for k, v in specs.items() if k in keep}

    n_pass = n_fail = n_rows_only = 0
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        try:
            spark_pdf = spec.fn(spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if spec.oracle is None:
            n_rows_only += 1
            print(f"ROWS  {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(spec.oracle).df()
        except Exception:
            print(f"FAIL  {name}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      - {p}")
        else:
            n_pass += 1
            print(f"PASS  {name} ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
