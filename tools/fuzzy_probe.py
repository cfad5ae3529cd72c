"""Scale probe for the symmetric-delete fuzzy term lookup
(operators/search.py fuzzy_term_search): the fixture vocabulary is 31
words, so the sf oracles prove CORRECTNESS; this measures the DESIGN at
realistic vocabulary sizes.

Synthetic vocabulary: N distinct 8-hex-char terms (md5 of the row id —
deterministic, no RNG). Queries: Q typo terms made by deleting one
character from every (N//Q)-th vocab term, so every query has >=1 true
match. Two plans over the same inputs, asserted to return the SAME
(query, term) match set before any timing:

- symspell: deletion-variant equi-join (vocab side ~N*(len+1) variant
  rows) + levenshtein verify on the candidates only.
- brute: crossJoin(vocab, queries) + levenshtein filter — the
  quadratic baseline the equi-join exists to avoid.

Steady-state methodology as bench.py (one warm-up, best of 2).

Usage: python tools/fuzzy_probe.py [--n 100000,1000000] [--q 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloudvectordb_spark.operators.search import _deletion_variants
from cloudvectordb_spark.session import get_session


def timed(fn) -> float:
    fn()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=str, default="100000,1000000")
    ap.add_argument("--q", type=int, default=100)
    ap.add_argument(
        "--skip-brute-above",
        type=int,
        default=2_000_000,
        help="vocab size beyond which the quadratic baseline is skipped",
    )
    args = ap.parse_args()
    spark = get_session("fuzzy-probe")

    for n in (int(x) for x in args.n.split(",")):
        vocab = (
            spark.range(n)
            .select(F.substring(F.md5(F.col("id").cast("string")), 1, 8).alias("term"))
            .distinct()
        )
        step = max(1, n // args.q)
        queries = (
            spark.range(0, n, step)
            .select(
                F.substring(F.md5(F.col("id").cast("string")), 1, 8).alias("t"),
                (F.col("id") % 7 + 1).alias("i"),
            )
            .select(
                F.concat(
                    F.expr("substring(t, 1, i - 1)"),
                    F.expr("substring(t, i + 1, 8)"),
                ).alias("query_term")
            )
            .distinct()
        )
        vocab.persist().count()
        queries.persist().count()

        # The variant frame is the PERSISTED artifact in production —
        # built once beside the text index, not per query. Its build
        # cost is reported separately; lookups are timed against the
        # materialized frame.
        dict_var = vocab.select(
            "term", F.explode(_deletion_variants("term")).alias("var")
        ).distinct()
        t0 = time.perf_counter()
        dict_var.persist().count()
        variant_build_s = round(time.perf_counter() - t0, 3)
        q_var = queries.select(
            "query_term",
            F.explode(_deletion_variants("query_term")).alias("var"),
        ).distinct()

        def symspell():
            return (
                F.broadcast(q_var)
                .join(dict_var, "var")
                .select("query_term", "term")
                .distinct()
                .filter(F.levenshtein("query_term", "term") <= 1)
            )

        def brute():
            return vocab.crossJoin(F.broadcast(queries)).filter(
                F.levenshtein("query_term", "term") <= 1
            ).select("query_term", "term")

        n_variants = dict_var.count()
        n_matches = symspell().count()
        row = {
            "n_vocab": n,
            "n_queries": queries.count(),
            "n_dict_variants": n_variants,
            "variant_build_s": variant_build_s,
            "n_matches": n_matches,
            "symspell_s": timed(lambda: symspell().count()),
        }
        if n <= args.skip_brute_above:
            # same match set, then time the quadratic baseline
            a = {(r.query_term, r.term) for r in symspell().collect()}
            b = {(r.query_term, r.term) for r in brute().collect()}
            assert a == b, "symspell and brute-force disagree"
            row["brute_s"] = timed(lambda: brute().count())
            row["speedup_x"] = round(row["brute_s"] / row["symspell_s"], 2)
        print(json.dumps(row), flush=True)
        vocab.unpersist()
        queries.unpersist()
        dict_var.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
