"""Round-15 fixes, each pinned by a test:

- fold_l0_tier releases its claim and heals in-line when the fold body
  fails in a still-running process (r14 ADVICE high — previously the
  tier's rows vanished from serving for the process lifetime);
- _await_stable_text_root times out instead of spinning forever on an
  unreadable-but-present _COMMIT marker (r14 ADVICE medium);
- first v7 append to a pre-v6 text base records _BASE_AVGDL_REF so the
  merged view inflates the base's WAND bounds from the TRUE anchor
  (r14 ADVICE medium — previously factor was silently 1.0);
- text_index_variant_frame routes through read_term_variants_merged
  (r14 ADVICE low);
- cross-shard generation manifests: pinned serving can never mix shard
  generations during a fleet append (r14 verdict #5).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


def _tiny_index(spark, sf_dir, tmp_path, name="ivf"):
    from cloudvectordb_spark.api import VectorIndex
    from cloudvectordb_spark.catalog import load

    emb = load(spark, sf_dir, "embeddings")
    return VectorIndex.build(spark, emb, str(tmp_path / name), k=4), emb


# ---------------------------------------------------------------------------
# ADVICE high: in-process fold failure must not strand the tier
# ---------------------------------------------------------------------------
def test_fold_failure_releases_claim_and_restores_tier(
    spark, sf_dir, tmp_path, monkeypatch
):
    import cloudvectordb_spark.operators.pipeline as pl

    idx, emb = _tiny_index(spark, sf_dir, tmp_path)
    served_before = pl.ivf_vectors_frame(spark, idx.path).count()
    d = emb.limit(10).select(
        (F.col("vec_id") + 10**6).alias("vec_id"), "embedding"
    )
    pl.append_to_ivf_index(d, idx.path, l0=True)
    delta_dir = f"{idx.path}/vectors_delta"
    staging = f"{idx.path}/vectors_delta.folding"

    # inject a failure into the fold's write job (after the rename,
    # before the _COMMITTED marker — the exact r14 ADVICE window)
    from pyspark.sql.readwriter import DataFrameWriter

    real_parquet = DataFrameWriter.parquet

    def boom(self, path, *a, **kw):
        if path.endswith("/vectors"):
            raise RuntimeError("injected fold-write failure")
        return real_parquet(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", boom)
    with pytest.raises(RuntimeError, match="injected fold-write failure"):
        pl.fold_l0_tier(spark, idx.path)
    monkeypatch.setattr(DataFrameWriter, "parquet", real_parquet)

    # the in-line heal restored the tier: no stranded staging dir, no
    # live-pid claim, rows still served, and nothing marked in-flight
    assert os.path.isdir(delta_dir) and not os.path.isdir(staging)
    assert not os.path.exists(os.path.join(delta_dir, "_FOLD_OWNER"))
    assert pl.recover_l0_fold(spark, idx.path) is None
    frame = pl.ivf_vectors_frame(spark, idx.path)
    assert frame.count() == served_before + 10
    assert frame.select("vec_id").distinct().count() == served_before + 10

    # and a retry fold completes normally
    assert pl.fold_l0_tier(spark, idx.path) == 10
    assert pl.ivf_vectors_frame(spark, idx.path).count() == served_before + 10


# ---------------------------------------------------------------------------
# ADVICE medium: reader fence must time out on an unreadable marker
# ---------------------------------------------------------------------------
def test_reader_fence_times_out_on_unreadable_marker(tmp_path):
    from cloudvectordb_spark.operators.search import (
        _TEXT_STAGING,
        _await_stable_text_root,
    )

    root = tmp_path / "root"
    # a _COMMIT that EXISTS but cannot be open()ed as a file: the old
    # loop `continue`d past the deadline check forever
    (root / _TEXT_STAGING / "_COMMIT").mkdir(parents=True)
    with pytest.raises(RuntimeError, match="still open"):
        _await_stable_text_root(str(root), timeout=0.3)


# ---------------------------------------------------------------------------
# ADVICE medium: pre-v6 base anchor
# ---------------------------------------------------------------------------
def test_pre_v6_base_gets_avgdl_anchor_and_inflated_bounds(
    spark, sf_dir, tmp_path
):
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators import search as S

    docs = load(spark, sf_dir, "documents")
    root = str(tmp_path / "txt")
    S._write_text_artifacts(spark, docs.filter(F.col("doc_id") < 60), root)

    # regress the base to pre-v6: drop the avgdl_ref column in place
    tm = spark.read.parquet(f"{root}/term_meta").drop("avgdl_ref")
    tmp_tm = str(tmp_path / "tm_old")
    tm.write.parquet(tmp_tm)
    import shutil

    shutil.rmtree(f"{root}/term_meta")
    os.rename(tmp_tm, f"{root}/term_meta")
    base_tm = spark.read.parquet(f"{root}/term_meta")
    assert "avgdl_ref" not in base_tm.columns

    avgdl_old = float(
        spark.read.parquet(f"{root}/stats").collect()[0].avgdl
    )
    # delta: long docs over a DISJOINT synthetic vocabulary -> avgdl
    # grows and the base vocab stays base-only (so the inflation factor
    # is observable on the anti-joined terms)
    delta = spark.range(30).select(
        (F.col("id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ", *[F.lit(f"zzzw{j % 40}") for j in range(200)]
        ).alias("text"),
    )
    S.append_text_artifacts(spark, delta, root)

    # the first v7 append recorded the TRUE anchor
    with open(os.path.join(root, "_BASE_AVGDL_REF")) as f:
        assert json.load(f)["avgdl_ref"] == pytest.approx(avgdl_old)
    avgdl_now = float(
        spark.read.parquet(f"{root}/stats").collect()[0].avgdl
    )
    assert avgdl_now > avgdl_old  # the regime the bug corrupted

    # merged view must INFLATE the base generation's bounds from the
    # anchor: for base-only terms, merged max_impact ==
    # base * avgdl_now/avgdl_old (not the pre-fix silent 1.0 factor)
    merged = S.read_term_meta_merged(spark, root)
    tiers = S._meta_tier_dirs(root)
    assert tiers, "append should have staged a delta-vocab tier"
    tier_terms = spark.read.parquet(tiers[0]).select("term")
    base_only = (
        base_tm.join(tier_terms, "term", "left_anti")
        .select("term", F.col("max_impact").alias("mi_base"))
    )
    got = merged.join(base_only, "term").select(
        "term", "max_impact", "mi_base"
    )
    factor = avgdl_now / avgdl_old
    bad = got.filter(
        F.abs(F.col("max_impact") - F.col("mi_base") * factor) > 1e-9
    ).count()
    assert bad == 0 and got.count() > 0

    # and the inflated bounds DOMINATE a full rebuild's exact bounds
    reb = str(tmp_path / "reb")
    S._write_text_artifacts(
        spark,
        docs.filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
        .unionByName(delta),
        reb,
    )
    viol = (
        merged.alias("a")
        .join(
            spark.read.parquet(f"{reb}/term_meta").alias("b"), "term"
        )
        .filter(F.col("a.max_impact") < F.col("b.max_impact") - 1e-12)
        .count()
    )
    assert viol == 0


# ---------------------------------------------------------------------------
# ADVICE low: variant lookups route through the merged view
# ---------------------------------------------------------------------------
def test_variant_frame_serves_merged_view_on_tiered_root(
    spark, sf_dir, tmp_path
):
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators import search as S

    docs = load(spark, sf_dir, "documents")
    root = str(tmp_path / "txt")
    S._write_text_artifacts(spark, docs.filter(F.col("doc_id") < 60), root)
    # disjoint delta vocabulary so the tier provably carries NEW terms
    delta = spark.range(20).select(
        (F.col("id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ", *[F.lit(f"qqxv{j % 10}") for j in range(30)]
        ).alias("text"),
    )
    S.append_text_artifacts(spark, delta, root)
    assert S._variant_tier_dirs(root), "append should stage a variant tier"
    merged = S.read_term_variants_merged(spark, root)
    base = spark.read.parquet(f"{root}/term_variants")
    # the merged view sees delta vocab the base misses
    extra = merged.join(
        base.select("term", "var"), ["term", "var"], "left_anti"
    )
    assert extra.count() > 0


# ---------------------------------------------------------------------------
# verdict #5: pinned snapshots cannot mix fleet generations
# ---------------------------------------------------------------------------
def test_pinned_manifest_isolates_serving_from_fleet_append(
    spark, sf_dir, tmp_path
):
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators import search as S

    docs = load(spark, sf_dir, "documents")
    S_n = 2
    route = S.text_shard_route(S_n)
    fam = tmp_path / "fam"
    paths = [str(fam / f"shard-{s}") for s in range(S_n)]
    corpus = docs.filter(F.col("doc_id") < 60)
    for s in range(S_n):
        S._write_text_artifacts(spark, corpus.filter(route == s), paths[s])

    batch = ((0, ("data", "query")), (1, ("join", "merge")))
    out = S.append_sharded_text_artifacts(
        spark,
        paths,
        docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 90)),
    )
    assert os.path.exists(out["manifest"])  # pinned at completion
    pinned0 = S.sharded_bm25_topk_batch_pinned(
        spark, str(fam), batch, k=5
    ).collect()
    live0 = S.sharded_bm25_topk_batch_paths(spark, paths, batch, k=5).collect()
    assert sorted(map(tuple, pinned0)) == sorted(map(tuple, live0))

    # simulate MID-fleet-append: shard 0 takes another delta, shard 1
    # has not yet — the live trees are now mixed generations
    d2 = docs.filter((F.col("doc_id") >= 90) & (F.col("doc_id") < 120))
    S.append_text_artifacts(spark, d2.filter(route == 0), paths[0])
    pinned_mid = S.sharded_bm25_topk_batch_pinned(
        spark, str(fam), batch, k=5
    ).collect()
    # pinned serving still sees the LAST COMPLETE generation, bit-equal
    assert sorted(map(tuple, pinned_mid)) == sorted(map(tuple, pinned0))

    # complete the fleet append + pin: pinned serving now reflects it
    S.append_text_artifacts(spark, d2.filter(route == 1), paths[1])
    S.pin_text_fleet_manifest(paths)
    pinned1 = S.sharded_bm25_topk_batch_pinned(
        spark, str(fam), batch, k=5
    ).collect()
    live1 = S.sharded_bm25_topk_batch_paths(spark, paths, batch, k=5).collect()
    assert sorted(map(tuple, pinned1)) == sorted(map(tuple, live1))

    # a snapshot without manifest.json is invisible to readers
    m = S.read_text_fleet_manifest(str(fam))
    litter = fam / "snapshots" / "snap-999999"
    litter.mkdir()
    assert S.read_text_fleet_manifest(str(fam))["path"] == m["path"]


def test_pin_vacuum_keeps_newest_snapshots(spark, sf_dir, tmp_path):
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators import search as S

    docs = load(spark, sf_dir, "documents")
    fam = tmp_path / "fam"
    paths = [str(fam / "shard-0")]
    S._write_text_artifacts(
        spark, docs.filter(F.col("doc_id") < 40), paths[0]
    )
    for _ in range(3):
        S.pin_text_fleet_manifest(paths, keep=2)
    snaps = sorted(os.listdir(fam / "snapshots"))
    assert len(snaps) == 2  # older generations vacuumed
    assert S.read_text_fleet_manifest(str(fam))["snapshot"] == snaps[-1]


def test_single_shard_fast_path_matches_gather(spark, sf_dir):
    """Round 15: S=1 text serving takes the one-lazy-plan fast path
    (no scatter-gather collect, vocab-pruned meta as broadcast side)
    while S>1 keeps the per-shard gather. Scores are computed under
    merged GLOBAL stats either way, so the two shardings must agree on
    every shared column bit-for-bit; the fast path's shard column is
    the literal 0."""
    from cloudvectordb_spark.operators.search import sharded_bm25_topk_batch

    one_rows = sharded_bm25_topk_batch(
        spark, sf_dir, n_shards=1, concurrent=False
    ).collect()
    two_rows = sharded_bm25_topk_batch(
        spark, sf_dir, n_shards=2, concurrent=False
    ).collect()
    k1 = {(r.query_id, r.doc_id, r.bm25, r.rank) for r in one_rows}
    k2 = {(r.query_id, r.doc_id, r.bm25, r.rank) for r in two_rows}
    assert k1 == k2
    assert len(k1) == 40  # 4 queries x top-10
    assert {r.shard for r in one_rows} == {0}
