"""Faithful simulation of the correctness driver: a VANILLA SparkSession
(no custom builder confs — self-configuration via __spark_entry__ is part
of what's under test), the first DRIVER_SAMPLE entries of queries(), and
a DuckDB value compare of each oracle twin.

This is the pre-flight that would have caught the round-2 regression
(TIMESTAMP_NTZ testdata breaking unix_micros under the driver's session)
before the driver did.

Usage: python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--n 50]
Exit 1 on any spark error, oracle error, or value mismatch.
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()  # vanilla!
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    n_bad = 0
    for name in itertools.islice(qs, args.n):
        try:
            spdf = qs[name](spark, args.sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {str(exc)[:200]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(spdf)} rows (no oracle)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {str(exc)[:200]}")
            n_bad += 1
            continue
        s = spdf.reindex(sorted(spdf.columns), axis=1)
        d = ddf.reindex(sorted(ddf.columns), axis=1)
        if len(s) != len(d) or list(s.columns) != list(d.columns):
            print(
                f"FAIL {name}: rows {len(s)} vs {len(d)}, "
                f"cols {list(s.columns)} vs {list(d.columns)}"
            )
            n_bad += 1
            continue
        sk = s.astype(str).agg("|".join, axis=1).sort_values().reset_index(drop=True)
        dk = d.astype(str).agg("|".join, axis=1).sort_values().reset_index(drop=True)
        if not sk.equals(dk):
            print(f"FAIL {name}: value mismatch")
            n_bad += 1
        else:
            print(f"PASS {name}")

    print(f"\n{args.n} sampled; {n_bad} problems")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
