"""Unified artifact cache (cloudvectordb_spark.cache) — the single
keying/staleness story behind the IVF/PQ/bloom/text-index caches
(round-8 verdict task 6 + round-7 ADVICE items 1-3)."""

from __future__ import annotations

import os
import shutil
import threading

import pytest

from cloudvectordb_spark.cache import (
    artifact_cache,
    build_lock,
    invalidate,
    session_key,
    source_tag,
)


def test_source_tag_subsecond_mtime_sensitivity(tmp_path):
    """A file rewritten within the SAME second (same floor(mtime)) must
    still change the tag — the whole-second truncation hole the ad-hoc
    caches had (ADVICE: use st_mtime_ns + size)."""
    p = tmp_path / "f.parquet"
    p.write_bytes(b"abc")
    t1 = source_tag(str(p))
    st = os.stat(p)
    # +1 microsecond: identical int(mtime), different mtime_ns
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000))
    t2 = source_tag(str(p))
    assert t1 != t2
    assert int(os.path.getmtime(p)) == int(st.st_mtime)  # same whole second


def test_source_tag_size_sensitivity(tmp_path):
    p = tmp_path / "f.parquet"
    p.write_bytes(b"abc")
    t1 = source_tag(str(p))
    st = os.stat(p)
    p.write_bytes(b"abcd")
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))  # pin mtime: size alone
    assert source_tag(str(p)) != t1


def test_artifact_cache_memoizes_and_invalidates():
    calls = []

    def build():
        calls.append(1)
        return object()

    key = ("test_cache_unit", "k1")
    a = artifact_cache(key, build)
    b = artifact_cache(key, build)
    assert a is b and len(calls) == 1
    assert invalidate(("test_cache_unit",)) == 1
    c = artifact_cache(key, build)
    assert c is not a and len(calls) == 2
    invalidate(("test_cache_unit",))


def test_build_lock_is_per_token_and_exclusive():
    lk1 = build_lock("/tmp/test_cache_root_a")
    lk2 = build_lock("/tmp/test_cache_root_a")
    lk3 = build_lock("/tmp/test_cache_root_b")
    assert lk1 is lk2 and lk1 is not lk3
    order = []

    def worker(i):
        with build_lock("/tmp/test_cache_root_a"):
            order.append(("enter", i))
            order.append(("exit", i))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    with lk1:  # hold: workers must queue behind us
        for t in ts:
            t.start()
    for t in ts:
        t.join()
    # strict enter/exit alternation == no two threads inside at once
    assert [e for e, _ in order] == ["enter", "exit"] * 4


def test_session_key_stable_and_not_id_based(spark):
    k1 = session_key(spark)
    k2 = session_key(spark)
    assert k1 == k2
    assert k1[0] == spark.sparkContext.applicationId
    # the key must not be the (reusable-after-gc) CPython object id
    assert id(spark) not in k1


def test_fixture_load_cache_invalidates_on_regen(spark, tmp_path):
    """catalog.load caches the scan DataFrame per (session, source
    fingerprint) — the round-8 bench win. A regenerated fixture (same
    path, new content, even same-second) MUST be re-read, and the two
    loads of an unchanged file must be the same cached object."""
    import pandas as pd

    from cloudvectordb_spark.catalog import load

    sfd = tmp_path / "sf"
    sfd.mkdir()
    p = sfd / "region.parquet"
    pd.DataFrame({"r_regionkey": [1, 2], "r_name": ["A", "B"]}).to_parquet(p)
    df1 = load(spark, str(sfd), "region")
    assert df1.count() == 2
    assert load(spark, str(sfd), "region") is df1  # cached object
    pd.DataFrame(
        {"r_regionkey": [1, 2, 3], "r_name": ["A", "B", "C"]}
    ).to_parquet(p)
    df2 = load(spark, str(sfd), "region")
    assert df2 is not df1
    assert df2.count() == 3


# --- staleness, parameterized over artifact kinds (verdict task 6:
# one eviction/staleness story for every cache) -------------------------


def _text_index_root(spark, sfd):
    from cloudvectordb_spark.operators.search import ensure_text_index

    return ensure_text_index(spark, sfd)


def _ivf_index_root(spark, sfd):
    from cloudvectordb_spark.operators.pipeline import ensure_ivf_index

    return ensure_ivf_index(spark, sfd)


@pytest.mark.parametrize(
    "source,builder",
    [
        ("documents.parquet", _text_index_root),
        ("embeddings.parquet", _ivf_index_root),
    ],
    ids=["text_index", "ivf_index"],
)
def test_artifact_rebuilds_on_subsecond_source_change(
    spark, sf_dir, tmp_path, source, builder
):
    """Sub-second fixture regeneration must yield a NEW artifact root
    for every persisted-index kind (the text-index-only mtime test from
    round 7, generalized per the unified staleness story)."""
    sfd = tmp_path / "sf"
    sfd.mkdir()
    shutil.copy(os.path.join(sf_dir, source), sfd / source)
    r1 = builder(spark, str(sfd))
    st = os.stat(sfd / source)
    os.utime(sfd / source, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000))
    r2 = builder(spark, str(sfd))
    assert r1 != r2
    assert int(os.path.getmtime(sfd / source)) == int(st.st_mtime)


def test_scheduler_pool_tags_and_clears_thread_jobs(spark):
    """The multi-tenant pool wiring: scheduler_pool must tag THIS
    thread's jobs with the pool name for the with-block only, results
    unchanged by the tag (the FAIR/FIFO mode switch itself is a
    JVM-start option probed in tools/multitenant_probe.py)."""
    from cloudvectordb_spark.session import scheduler_pool

    sc = spark.sparkContext
    assert sc.getLocalProperty("spark.scheduler.pool") is None
    with scheduler_pool(spark, "tenant-a"):
        assert sc.getLocalProperty("spark.scheduler.pool") == "tenant-a"
        got = spark.range(100).count()
        assert got == 100
        # nesting another tenant on a DIFFERENT thread is independent
        import threading

        seen = {}

        def other():
            seen["pool"] = sc.getLocalProperty("spark.scheduler.pool")

        t = threading.Thread(target=other)
        t.start()
        t.join()
        # child threads may inherit or start clean depending on the
        # py4j thread origin; the contract is only that THIS thread's
        # tag is exact and restored after the block
        # NESTED blocks restore the OUTER pool, not bare None
        with scheduler_pool(spark, "sub-task"):
            assert sc.getLocalProperty("spark.scheduler.pool") == "sub-task"
        assert sc.getLocalProperty("spark.scheduler.pool") == "tenant-a"
    assert sc.getLocalProperty("spark.scheduler.pool") is None
