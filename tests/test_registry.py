"""Registry ordering invariants.

The correctness driver samples only the first ``DRIVER_SAMPLE`` entries of
``queries()`` (CORRECTNESS_r01 checked 50 of 109). These tests pin the
covering-set property so a future registration can't silently push an
operator ID or a bench query outside the driver's window.
"""

from cloudvectordb_spark.registry import DRIVER_SAMPLE, all_queries


def test_first_window_covers_every_operator_id():
    qs = all_queries()
    first = list(qs)[:DRIVER_SAMPLE]
    all_ids = {op for s in qs.values() for op in s.operators}
    window_ids = {op for n in first for op in qs[n].operators}
    assert all_ids <= window_ids, f"uncovered in driver window: {all_ids - window_ids}"


def test_first_window_contains_every_bench_query():
    qs = all_queries()
    first = set(list(qs)[:DRIVER_SAMPLE])
    missing = [n for n, s in qs.items() if s.bench and n not in first]
    assert not missing, f"bench queries outside driver window: {missing}"


def test_first_window_contains_every_serving_query():
    # Round-14 verdict #2: the mutation-surface serving queries
    # (ivf_l0_tier_search, bm25_batch_tiered_append, ...) were timed by
    # the driver's bench but sat outside its 50-query correctness window.
    # The serving group is now pinned ahead of the set-cover picks so the
    # driver VALUE-checks the mutable read surfaces every round.
    from cloudvectordb_spark.registry import WINDOW_PINNED

    qs = all_queries()
    first = set(list(qs)[:DRIVER_SAMPLE])
    missing = [n for n in sorted(WINDOW_PINNED) if n not in first]
    assert not missing, f"pinned queries outside driver window: {missing}"
    for name in (
        "ivf_l0_tier_search",
        "bm25_batch_tiered_append",
        "minhash_sharded_state_pairs",
    ):
        assert name in WINDOW_PINNED, f"{name} must stay window-pinned"


def test_window_prefers_oracle_backed_queries():
    # Rows-only queries may sit in the window only if they are bench queries
    # or the sole cover for some operator ID; everything else oracle-first.
    qs = all_queries()
    names = list(qs)
    first = names[:DRIVER_SAMPLE]
    oracle_outside = [n for n in names[DRIVER_SAMPLE:] if qs[n].oracle]
    for n in first:
        if qs[n].oracle or qs[n].bench:
            continue
        # a rows-only, non-bench pick must be pulling its weight: it covers
        # some ID that no oracle-backed query covers
        oracle_ids = {
            op for m, s in qs.items() if s.oracle for op in s.operators
        }
        assert not set(qs[n].operators) <= oracle_ids or not oracle_outside, (
            f"rows-only {n} occupies a window slot while oracle-backed "
            f"queries wait outside"
        )


def test_ordering_is_deterministic():
    assert list(all_queries()) == list(all_queries())


def test_every_query_callable_and_named():
    qs = all_queries()
    for name, spec in qs.items():
        assert callable(spec.fn)
        assert spec.name == name


def test_priority_order_rescues_sole_cover_from_synthetic_reorder():
    """VERDICT r3 item 6: a registration order that pushes the SOLE cover
    of an operator ID past the window must be repaired by
    ``_priority_order`` — the sole-cover query lands inside the first
    ``DRIVER_SAMPLE`` entries no matter where it was registered."""
    from cloudvectordb_spark.registry import QuerySpec, _priority_order

    def spec(name, ops, oracle="SELECT 1", bench=False):
        return QuerySpec(name, lambda s, d: None, oracle, tuple(ops), bench)

    # 70 filler queries all covering the same id, registered FIRST, then
    # the only query covering the rare id registered LAST (position 71 —
    # outside any naive first-50 window).
    reg = {f"filler_{i:03d}": spec(f"filler_{i:03d}", ("X1",)) for i in range(70)}
    reg["sole_cover"] = spec("sole_cover", ("RARE",))
    order = _priority_order(reg)
    assert "sole_cover" in order[:50], "sole cover pushed outside the window"

    # and the plain registration order genuinely violates the invariant,
    # so the test fails without the reordering (a synthetic reorder check)
    naive_first = list(reg)[:50]
    naive_ids = {op for n in naive_first for op in reg[n].operators}
    assert "RARE" not in naive_ids


def test_no_operator_module_import_errors():
    """Module imports are isolated (one broken module must not take down
    the registry) — but any failure is a hard test failure here."""
    from cloudvectordb_spark import registry

    registry.all_queries()
    assert registry.import_errors == {}, registry.import_errors


def test_every_oracle_parses_in_duckdb(sf_dir):
    """EXPLAIN every oracle SQL against the fixture views — a seconds-fast
    syntax/binder gate (the full value compare is tools/check_oracle.py;
    this catches a broken oracle edit without a 13-minute sweep). Uses
    the shared sf_dir fixture (round-4 advisor item 5: no hardcoded
    machine path) and skips loudly if the parquet fixtures are absent."""
    import os

    import duckdb
    import pytest

    from cloudvectordb_spark.catalog import TABLES
    from cloudvectordb_spark.registry import all_queries

    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        pytest.skip(f"fixture parquet absent under {sf_dir}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        try:
            con.execute("EXPLAIN " + spec.oracle)
        except Exception as exc:  # noqa: BLE001
            bad.append(f"{name}: {type(exc).__name__}: {str(exc)[:120]}")
    assert not bad, "\n".join(bad)


# The canonical SURVEY.md §2 inventory — exactly these 80 operator IDs.
_SURVEY_S2_IDS = frozenset(
    [f"A{i}" for i in range(1, 7)]
    + [f"B{i}" for i in range(1, 9)]
    + [f"C{i}" for i in range(1, 11)]
    + [f"D{i}" for i in range(1, 9)]
    + [f"E{i}" for i in range(1, 5)]
    + [f"F{i}" for i in range(1, 4)]
    + [f"G{i}" for i in range(1, 7)]
    + [f"H{i}" for i in range(1, 11)]
    + [f"J{i}" for i in range(1, 8)]
    + [f"K{i}" for i in range(1, 13)]
    + [f"L{i}" for i in range(1, 7)]
)


def test_operator_tags_are_canonical_survey_ids():
    """A typo'd tag (e.g. 'K13') would silently create a phantom operator
    in COVERAGE.md and could displace a real cover in the driver window —
    every tag must be one of the 80 §2 IDs, and all 80 must be covered."""
    qs = all_queries()
    used = {op for s in qs.values() for op in s.operators}
    assert used <= _SURVEY_S2_IDS, f"unknown tags: {sorted(used - _SURVEY_S2_IDS)}"
    assert _SURVEY_S2_IDS <= used, f"uncovered IDs: {sorted(_SURVEY_S2_IDS - used)}"


def test_registry_has_no_rows_only_queries():
    """Round-7 invariant: every registered query carries a DuckDB value
    oracle (full or invariant-style). A new rows-only registration is a
    deliberate decision — if genuinely unavoidable, document why the
    output admits no invariant oracle (see minhash_dedup_pairs and
    embed_documents_trained_artifact for the conversion patterns) and
    update this test."""
    from cloudvectordb_spark.registry import all_queries

    rows_only = [n for n, s in all_queries().items() if s.oracle is None]
    assert rows_only == [], rows_only


def test_driver_window_tail_rotates_with_round_salt():
    """Round-8 sample rotation: a different round-artifact salt must
    reshuffle the post-cover tail of the ordering while the covering
    window itself keeps covering every operator ID and bench query."""
    from cloudvectordb_spark import registry as R

    qs = all_queries()
    try:
        R._SALT_CACHE.clear()
        R._SALT_CACHE.append("salt-a")
        order_a = list(R._priority_order(dict(qs)))
        R._SALT_CACHE.clear()
        R._SALT_CACHE.append("salt-b")
        order_b = list(R._priority_order(dict(qs)))
    finally:
        R._SALT_CACHE.clear()
    assert set(order_a) == set(order_b)
    assert order_a != order_b, "tail must reshuffle with the salt"
    # covering prefix invariant holds under BOTH salts
    for order in (order_a, order_b):
        window = order[: R.DRIVER_SAMPLE]
        covered = {op for n in window for op in qs[n].operators}
        all_ids = {op for s in qs.values() for op in s.operators}
        assert all_ids <= covered
        assert all(n in window for n, s in qs.items() if s.bench)
