"""CLI runner: execute any registered query by name against a fixture
directory and print its rows (or list what is available).

    python -m cloudvectordb_spark --list
    python -m cloudvectordb_spark pricing_summary
    python -m cloudvectordb_spark knn_exact_cosine --sf /root/testdata/sf0.01 -n 5
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser(prog="cloudvectordb_spark")
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument(
        "--sf", default="/root/testdata/sf0.001", help="fixture directory"
    )
    ap.add_argument("-n", "--rows", type=int, default=20, help="rows to show")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    ap.add_argument(
        "--explain", action="store_true", help="print the formatted plan instead"
    )
    ap.add_argument(
        "--oracle", action="store_true", help="print the DuckDB oracle SQL instead"
    )
    args = ap.parse_args()

    from cloudvectordb_spark.registry import all_queries

    qs = all_queries()
    if args.list or not args.query:
        for name, spec in sorted(qs.items()):
            tags = ",".join(spec.operators)
            mark = "" if spec.oracle else " [rows-only]"
            print(f"{name:42s} {tags}{mark}")
        return 0
    if args.query not in qs:
        print(f"unknown query {args.query!r}; --list shows all", file=sys.stderr)
        return 2
    if args.oracle:
        sql = qs[args.query].oracle
        print(sql.strip() if sql else f"-- {args.query} is rows-only (no oracle)")
        return 0

    from cloudvectordb_spark.session import get_session

    spark = get_session("cloudvectordb-cli")
    df = qs[args.query].fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
