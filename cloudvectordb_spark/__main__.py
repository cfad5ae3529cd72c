"""CLI runner: execute any registered query by name against a fixture
directory and print its rows (or list what is available), plus ad-hoc
serving verbs over the persisted indexes.

    python -m cloudvectordb_spark --list
    python -m cloudvectordb_spark pricing_summary
    python -m cloudvectordb_spark knn_exact_cosine --sf /root/testdata/sf0.01 -n 5
    python -m cloudvectordb_spark search --terms data,query
    python -m cloudvectordb_spark search --terms data --exclude stream
    python -m cloudvectordb_spark complete --prefix s
    python -m cloudvectordb_spark correct --terms dta,qery
"""

from __future__ import annotations

import argparse
import sys

_SERVING_VERBS = ("search", "complete", "correct")


def _serve(args) -> int:
    """Ad-hoc keyword serving through the TextIndex facade."""
    from cloudvectordb_spark.api import TextIndex
    from cloudvectordb_spark.session import get_session

    idx = TextIndex.open(get_session("cloudvectordb-cli"), args.sf)
    if args.query == "search":
        if not args.terms:
            print("search needs --terms t1,t2", file=sys.stderr)
            return 2
        must = tuple(args.terms.split(","))
        if args.exclude:
            df = idx.search_boolean(
                must, tuple(args.exclude.split(",")), k=args.rows
            )
        else:
            df = idx.search(must, k=args.rows)
    elif args.query == "complete":
        if not args.prefix:
            print("complete needs --prefix p", file=sys.stderr)
            return 2
        df = idx.complete(args.prefix, k=args.rows)
    else:  # correct
        if not args.terms:
            print("correct needs --terms t1,t2", file=sys.stderr)
            return 2
        df = idx.correct(tuple(args.terms.split(",")))
    df.show(args.rows, truncate=False)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(prog="cloudvectordb_spark")
    ap.add_argument(
        "query",
        nargs="?",
        help="registered query name, or a serving verb: search | complete | correct",
    )
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
    ap.add_argument("--terms", help="comma-separated terms (search/correct)")
    ap.add_argument("--exclude", help="comma-separated MUST_NOT terms (search)")
    ap.add_argument("--prefix", help="prefix to complete (complete)")
    args = ap.parse_args()

    if args.query in _SERVING_VERBS:
        return _serve(args)

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
