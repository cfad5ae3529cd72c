"""Scale-pattern operators: bloom runtime filter, Misra-Gries two-pass
heavy hitters, weekly Jaccard (operators/scale_patterns.py).

The DuckDB oracle carries value-level correctness (tools/check_oracle.py
/ the driver gate); these tests pin the MECHANISM guarantees the oracle
can't see: bloom has zero false negatives, the MG candidate set is a
superset of the true heavy hitters, and the bloom bitmap stays bounded.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.operators import scale_patterns as sp


def test_bloom_words_bounded_and_no_false_negatives(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    keys = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    n_keys = keys.count()
    words, m_bits = sp.build_bloom(keys, "o_orderkey")
    assert len(words) == m_bits >> 6
    assert m_bits >= n_keys * sp._BITS_PER_KEY  # sizing keeps fp bounded

    # Every build-side key must probe positive (bloom FNs are impossible;
    # this catches a build/probe hash or indexing mismatch).
    survivors = sp.bloom_filter_rows(keys, "o_orderkey", words, m_bits).count()
    assert survivors == n_keys

    # Disjoint keys must be mostly rejected (fp <= ~1% at 16 bits/key).
    other = orders.filter(F.col("o_orderpriority") != "1-URGENT").select("o_orderkey")
    n_other = other.count()
    fp = sp.bloom_filter_rows(other, "o_orderkey", words, m_bits).count()
    assert fp <= max(0.01 * n_other, 2)


def test_bloom_query_matches_plain_semi_join(spark, sf_dir):
    got = sp.bloom_prefilter_revenue(spark, sf_dir).collect()[0]
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    keys = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    ).select("o_orderkey")
    want = (
        li.join(keys, li["l_orderkey"] == keys["o_orderkey"], "left_semi")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("urgent_revenue"),
            F.count("*").alias("n_lines"),
        )
        .collect()[0]
    )
    assert got.n_lines == want.n_lines
    assert got.urgent_revenue == want.urgent_revenue


def test_mg_candidates_superset_of_true_heavy_hitters(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("int").alias("hr")
    )
    n = ev.count()
    true_hh = {
        (r.event_type, r.hr)
        for r in ev.groupBy("event_type", "hr")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > sp._HH_PHI * n)
        .collect()
    }
    res = {
        (r.event_type, r.hr) for r in sp.heavy_hitters_sketch_exact(spark, sf_dir).collect()
    }
    assert res == true_hh  # exact two-pass result == ground truth


def test_weekly_jaccard_bounds(spark, sf_dir):
    rows = sp.weekly_active_jaccard(spark, sf_dir).collect()
    assert rows  # fixture spans multiple weeks
    for r in rows:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_inter <= min(r.users_a, r.users_b)


def test_dynamic_backfill_rewrites_only_bad_partition(spark, sf_dir):
    """The query's oracle proves the repair; this proves the SCOPING —
    files under untouched date partitions are byte-identical (same
    inode set, same mtimes) after the dynamic overwrite."""
    import os

    from cloudvectordb_spark.operators import sources as src

    path, bad_date = src.seed_corrupted_daily(spark, sf_dir)

    def snapshot():
        out = {}
        for d in os.listdir(path):
            if not d.startswith("event_date="):
                continue
            pdir = os.path.join(path, d)
            out[d] = {
                f: os.path.getmtime(os.path.join(pdir, f))
                for f in os.listdir(pdir)
                if f.endswith(".parquet")
            }
        return out

    before = snapshot()
    src.repair_bad_day(spark, sf_dir, path, bad_date)
    after = snapshot()

    bad_part = f"event_date={bad_date}"
    assert before[bad_part] != after[bad_part]  # repaired partition rewritten
    for part in before:
        if part != bad_part:
            assert before[part] == after[part], f"{part} was touched by backfill"


def test_bloom_sizing_properties():
    """Pure sizing function: power-of-two, >= 16 bits/key until the cap,
    monotone, and CAPPED at _MAX_BITS so the driver collect/broadcast is
    bounded at any build-side cardinality (round-4 verdict item 3)."""
    from cloudvectordb_spark.operators.scale_patterns import (
        _BITS_PER_KEY,
        _MAX_BITS,
        _MIN_BITS,
        _bloom_bits_for,
    )

    prev = 0
    for n in (1, 100, 4096, 127_622, 1_274_945, 10_000_000, 1_000_000_000):
        m = _bloom_bits_for(n)
        assert m >= min(max(n * _BITS_PER_KEY, _MIN_BITS), _MAX_BITS)
        assert m <= _MAX_BITS  # bounded driver state at ANY cardinality
        assert m & (m - 1) == 0  # power of two
        assert m >= prev
        prev = m
    assert _bloom_bits_for(10**12) == _MAX_BITS


def test_pareto_frontier_no_dominated_rows(spark, sf_dir):
    from cloudvectordb_spark.operators.scale_patterns import (
        pareto_frontier_lineitems,
    )

    rows = pareto_frontier_lineitems(spark, sf_dir).collect()
    assert rows
    pts = [(r.price, r.qty) for r in rows]
    for p, q in pts:
        assert not any(
            (p2 < p and q2 > q) for p2, q2 in pts
        ), "frontier contains a strictly dominated point"


def test_bloom_onepass_resizes_when_provisional_undersized(spark):
    """build_bloom_onepass's rare second pass: a provisional bitmap too
    small for the build cardinality (< 16 bits/key) must trigger a
    rebuild at the properly-sized m, and the resulting filter must keep
    every build key (no false negatives at any size)."""
    from pyspark.sql import functions as F2

    from cloudvectordb_spark.operators.scale_patterns import (
        _bloom_bits_for,
        bloom_filter_rows,
        build_bloom_onepass,
    )

    n = 20_000  # 20k keys need 320k bits; provisional 2^16 = 65k is short
    keys = spark.range(n).select(F2.col("id").alias("k"))
    words, m_bits = build_bloom_onepass(keys, "k", provisional_bits=1 << 16)
    assert m_bits == _bloom_bits_for(n) > (1 << 16)
    kept = bloom_filter_rows(keys, "k", words, m_bits).count()
    assert kept == n, "bloom dropped a build key (false negative)"

    # and the common case: provisional big enough -> kept as-is, exact
    # count piggybacked (no resize)
    words2, m2 = build_bloom_onepass(keys, "k", provisional_bits=1 << 20)
    assert m2 == 1 << 20
    assert bloom_filter_rows(keys, "k", words2, m2).count() == n
