"""Search-surface operators: keyword relevance, hybrid fusion, filtered
ANN, and CDC-style index maintenance (SURVEY.md §2 K8/E4/C10 extensions;
reference S4 "building the vectordb", /root/reference/README.md:2 — the
query-side surface a vector-DB user actually calls).

All four are single declarative plans with DuckDB oracle twins:

- ``bm25_keyword_search``: full BM25 (k1=1.2, b=0.75) from explode ->
  tf/df/dl aggregates. The df and corpus-stats sides are
  vocabulary-sized / scalar — broadcast; the tf side reduces map-side.
- ``hybrid_rrf_search``: reciprocal-rank fusion of the BM25 ranking and
  an embedding-cosine ranking — the standard hybrid-search scoring.
- ``filtered_knn_search``: exact kNN under a metadata predicate; the
  filter lands in the parquet scan (pushdown) BEFORE any scoring, which
  is what makes filtered ANN cheap at 100 TB.
- ``vector_upsert_merge``: last-wins merge of a change log (upserts +
  deletes, sequenced) into a base vector table — one window over the
  unioned log, the maintenance primitive behind incremental indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.functions import text as TX
from cloudvectordb_spark.functions import vector as V
from cloudvectordb_spark.gather import GATHER_ROW_BUDGET, bounded_gather
from cloudvectordb_spark.ranking import global_topk_ranked
from cloudvectordb_spark.registry import query

_QUERY_TERMS = ("data", "query", "fast")
_TERMS_SQL = "('" + "', '".join(_QUERY_TERMS) + "')"
_K1, _B = 1.2, 0.75

_BM25_SCORED_SQL = f"""
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN {_TERMS_SQL} GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
           WHERE term IN {_TERMS_SQL} GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY tf.doc_id
    )
"""


def _bm25_from_parts(
    tf: DataFrame, dl: DataFrame, stats: DataFrame
) -> DataFrame:
    """The BM25 scoring join, shared by the inline and indexed paths.
    Inputs: tf(doc_id, term, tf) restricted to the query terms,
    dl(doc_id, dl), stats(n_docs, avgdl). All arithmetic on the same
    integer counts / avgdl double regardless of which path produced
    them, so the two paths are bit-identical."""
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (_K1 + 1.0)) / (
        F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
    )


def bm25_scores(docs: DataFrame, terms: tuple[str, ...] = _QUERY_TERMS) -> DataFrame:
    """(doc_id, bm25) for docs containing >= 1 query term.

    Corpus stats (N, avgdl) are a 1-row aggregate and df is
    query-term-sized — both broadcast into the scoring join, so the only
    large shuffle is the per-(doc, term) tf reduction, which combines
    map-side. Scores rounded to 6 before any ranking (oracle parity).
    """
    tok = docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tok.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return _bm25_from_parts(tf, dl, stats)


# ---------------------------------------------------------------------------
# Persisted inverted index (round 7): a real search engine does not
# re-tokenize the corpus per query — it builds postings ONCE and serves
# every query from them (reference S4's build-then-query split, applied
# to the keyword side). ensure_text_index writes three artifacts keyed
# on the fixture mtime: postings (term, doc_id, tf) REPARTITIONED AND
# SORTED BY TERM so parquet row-group min/max statistics prune the
# per-query IN-list scan to a handful of row groups; dl (doc lengths);
# stats (n_docs, avgdl — one row). The indexed scorer then reads
# query-term postings only — the inline tokenize/explode/aggregate of
# the whole corpus (the dominant cost of every BM25-family query)
# happens once per fixture instead of once per query. Counts are stored
# exactly, so indexed and inline scores are bit-identical and the DuckDB
# oracles (which recompute from raw documents) are unchanged.
# At 100 TB the same layout is the standard postings shard: term-range
# row groups, doc-partitioned within term, rebuilt incrementally.
# ---------------------------------------------------------------------------
def _write_text_artifacts(spark: SparkSession, docs: DataFrame, build: str) -> None:
    """Write the full v5 artifact set (postings, positions, dl, stats,
    term_meta, term_variants) for ONE corpus — the whole fixture
    (``ensure_text_index``) or one md5-routed shard of it
    (``ensure_sharded_text_index``). The builder is corpus-agnostic:
    every artifact derives from the ``docs`` frame it was handed.

    posexplode keeps the 0-based token position for the positional
    postings (phrase / proximity serving, round 8). The corpus-sized
    token stream is exploded and shuffled ONCE into the grouped
    (term, doc_id) frame; all four artifacts (postings, positions, dl,
    term_meta) derive from it. A first cut re-exploded the stream per
    artifact — four corpus passes — and went superlinear at 10M docs
    (282 s build; BASELINE.md round 8). The grouped frame persists
    MEMORY_AND_DISK for the derived writes, then unpersists."""
    import os

    from pyspark import StorageLevel

    ptok = docs.select(
        "doc_id", F.posexplode(TX.tokens("text")).alias("pos", "term")
    )
    grouped = (
        ptok.groupBy("term", "doc_id")
        .agg(
            F.sort_array(F.collect_list("pos")).alias("positions"),
            F.count("*").alias("tf"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # dl + corpus stats first: the one-row stats agg also sizes the
    # term-partition width (~1 partition / 25M tokens, floor 8) so
    # per-partition sort volume stays flat as the corpus grows.
    # Partition width never changes artifact VALUES. v5 adds dl_sum —
    # the EXACT bigint token total — so S shard stats merge into the
    # exact full-corpus avgdl (sum of bigints / sum of bigints, one
    # float division) instead of a float-weighted mean of per-shard
    # avgdl values: globally-consistent sharded BM25 needs the merged
    # avgdl bit-equal to the monolithic one.
    dl = grouped.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dl.write.mode("overwrite").parquet(os.path.join(build, "dl"))
    # v6 adds max_doc_id: the O(1) freshness fence — an append whose
    # delta ids all exceed it is provably clash-free without the
    # corpus-sized dl semi-join (the fixed-cost floor the 10M text
    # decade measured: 46 s for a 10k delta, mostly this scan)
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").cast("bigint").alias("dl_sum"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )
    stats.write.mode("overwrite").parquet(os.path.join(build, "stats"))
    srow = stats.collect()[0]  # bounded: one row
    n_tokens = int(srow.dl_sum or 0)
    n_parts = max(8, min(256, n_tokens // 25_000_000 + 1))
    postings = grouped.select("term", "doc_id", "tf")
    (
        postings.repartition(n_parts, "term")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(os.path.join(build, "postings"))
    )
    # positional postings: one row per (term, doc), positions as a
    # sorted int array — the standard phrase-serving layout, term-
    # sorted row groups like the tf postings so the per-query
    # IN-list scan prunes identically.
    (
        grouped.select("term", "doc_id", "positions")
        .repartition(n_parts, "term")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(os.path.join(build, "positions"))
    )
    # Per-term max impact for WAND-style top-k pruning (round 8):
    # the BM25 tf-saturation term tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    # is maximized over a term's postings at index-build time using
    # the EXACT (tf, dl) pairs, so idf * max_impact is a true upper
    # bound on any doc's contribution from that term. Stored beside
    # df so the query-time pruner needs no extra corpus pass.
    tf_sat = (F.col("tf") * (_K1 + 1.0)) / (
        F.col("tf")
        + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    term_meta_f = (
        postings.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("n_docs", "avgdl")))
        .groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.max(tf_sat).alias("max_impact"),
        )
        # v6: the avgdl these impacts were computed against rides with
        # the rows, so a TIERED append's merged reader can inflate each
        # generation's bound to the current avgdl exactly (see
        # read_term_meta_merged) instead of rewriting the vocab
        .withColumn("avgdl_ref", F.lit(float(srow.avgdl or 0.0)))
    )
    term_meta_f.write.mode("overwrite").parquet(
        os.path.join(build, "term_meta")
    )
    # Symmetric-deletion variants (v4): the persisted candidate key
    # for the fuzzy lookup family — vocab-sized × (len+1) rows,
    # var-sorted so a query's variant IN-list prunes row groups the
    # same way query terms prune the postings.
    (
        spark.read.parquet(os.path.join(build, "term_meta"))
        .select(
            "term",
            "df",
            F.explode(_deletion_variants("term")).alias("var"),
        )
        .distinct()
        .repartition(8, "var")
        .sortWithinPartitions("var")
        .write.mode("overwrite")
        .parquet(os.path.join(build, "term_variants"))
    )
    grouped.unpersist()


_TEXT_STAGING = "append.staging"
# vocab-sized artifacts replaced wholesale by an append (the delta
# artifacts — postings/positions/dl — are file-moves, not swaps)
_TEXT_SWAPPED = ("term_meta", "term_variants", "stats")
# term_meta/term_variants tiers per fold: each append stages a
# delta-vocab tier; past this depth the append absorbs base + tiers
# into a fresh base (amortized vocab rewrite ∝ vocab/DEPTH per append)
_TEXT_META_FOLD_DEPTH = 8


def _base_avgdl_anchor(root: str) -> float | None:
    """The avgdl a PRE-v6 base term_meta's bounds were computed against
    — recorded once by the first v7 append (``_BASE_AVGDL_REF``) before
    any tier lands. None when absent (v6+ bases carry the anchor as a
    per-row ``avgdl_ref`` column instead)."""
    import json
    import os

    try:
        with open(os.path.join(root, "_BASE_AVGDL_REF")) as f:
            return float(json.load(f)["avgdl_ref"])
    except (OSError, ValueError, KeyError):
        return None


def _meta_tier_dirs(root: str) -> list:
    import glob as _glob
    import os

    return sorted(_glob.glob(os.path.join(root, "term_meta_tiers", "tier-*")))


def _variant_tier_dirs(root: str) -> list:
    import glob as _glob
    import os

    return sorted(
        _glob.glob(os.path.join(root, "term_variants_tiers", "tier-*"))
    )


def _merged_term_meta_frame(
    spark: SparkSession, root: str, extra=None, avgdl_now: float | None = None
):
    """(term, df, max_impact, avgdl_ref) merged across the base
    term_meta, every tier, and an optional in-flight delta frame — df
    by EXACT bigint addition (fresh docs ⇒ disjoint postings), each
    generation's max_impact inflated by max(1, avgdl_now/avgdl_ref):
    tf·(k1+1)/(tf+k1(1-b+b·dl/avgdl)) is increasing in avgdl with
    growth factor < avgdl_new/avgdl_old (the dl-dominated limit), so
    the inflated value stays a TRUE upper bound. Output rows re-anchor
    at avgdl_now."""
    import os
    from functools import reduce as _reduce

    if avgdl_now is None:
        srow = spark.read.parquet(os.path.join(root, "stats")).collect()[0]
        avgdl_now = float(srow.avgdl or 0.0)
    base_anchor = _base_avgdl_anchor(root)

    def leg(df):
        if "avgdl_ref" in df.columns:
            ref = F.coalesce(F.col("avgdl_ref"), F.lit(avgdl_now))
        else:
            # pre-v6 base (no avgdl_ref column): its bounds were last
            # valid at the avgdl of its final rewrite, which the FIRST
            # v7 append recorded in _BASE_AVGDL_REF before staging any
            # tier (round-14 ADVICE medium — falling back to avgdl_now
            # here would make the inflation factor 1.0 and serve an
            # UN-inflated, possibly invalid WAND bound once avgdl
            # grew). A root with tiers but no anchor predates the fix;
            # avgdl_now is the only honest value left for it.
            ref = F.lit(
                base_anchor if base_anchor is not None else avgdl_now
            )
        infl = F.when(
            (ref > 0) & (F.lit(avgdl_now) > ref), F.lit(avgdl_now) / ref
        ).otherwise(F.lit(1.0))
        return df.select(
            "term",
            F.col("df").cast("bigint").alias("df"),
            (F.col("max_impact") * infl).alias("mi"),
        )

    legs = [leg(spark.read.parquet(os.path.join(root, "term_meta")))]
    legs += [leg(spark.read.parquet(t)) for t in _meta_tier_dirs(root)]
    if extra is not None:
        legs.append(leg(extra))
    u = _reduce(DataFrame.unionByName, legs)
    return u.groupBy("term").agg(
        F.sum("df").cast("bigint").alias("df"),
        F.max("mi").alias("max_impact"),
    ).withColumn("avgdl_ref", F.lit(avgdl_now))


def read_term_meta_merged(
    spark: SparkSession, root: str, avgdl_now: float | None = None
) -> DataFrame:
    """(term, df, max_impact) — the SERVING view of a tiered text root
    (round-14 verdict #4): base + delta-vocab tiers merged by exact df
    addition, WAND bounds inflated per generation to the current
    avgdl. A tier-free root (the immutable fixture trees, or right
    after a fold) returns the base scan unchanged, so the merged read
    costs nothing until tiers exist; term filters push into every leg
    (Catalyst pushes the IN-list through union and partial-agg).
    Callers that already hold the root's stats row pass ``avgdl_now``
    to skip the merged view's own one-row stats job (round 15)."""
    import os

    if not _meta_tier_dirs(root):
        return spark.read.parquet(os.path.join(root, "term_meta")).select(
            "term", "df", "max_impact"
        )
    return _merged_term_meta_frame(spark, root, avgdl_now=avgdl_now).select(
        "term", "df", "max_impact"
    )


def read_term_variants_merged(spark: SparkSession, root: str) -> DataFrame:
    """(term, df, var) — the fuzzy-lookup candidate key across base +
    tiers; a term's variant set is identical in every generation, so
    the exact merged df is a (term, var)-keyed sum."""
    import os
    from functools import reduce as _reduce

    tiers = _variant_tier_dirs(root)
    base = spark.read.parquet(os.path.join(root, "term_variants"))
    if not tiers:
        return base
    legs = [base] + [spark.read.parquet(t) for t in tiers]
    u = _reduce(DataFrame.unionByName, [x.select("term", "df", "var") for x in legs])
    return u.groupBy("term", "var").agg(
        F.sum("df").cast("bigint").alias("df")
    ).select("term", "df", "var")


def _acquire_text_append_lock(root: str) -> str:
    """Per-root append lease (round-13 ADVICE item 2): exclusive-create
    a ``_APPEND_LOCK`` recording pid + /proc start-tick. A LIVE holder
    makes a second appender fail loudly (appends on one tree must
    serialize — the artifacts cross-reference each other); a DEAD
    holder's crashed append is healed (``recover_text_append``) and
    the lock stolen. Returns the lock path (caller unlinks in
    ``finally``)."""
    import os

    from cloudvectordb_spark.operators.pipeline import (
        _fold_owner_blob,
        _owner_alive,
    )

    lock = os.path.join(root, "_APPEND_LOCK")
    for _ in range(4):
        try:
            with open(lock, "x") as f:
                f.write(_fold_owner_blob())
            return lock
        except FileExistsError:
            try:
                with open(lock) as f:
                    blob = f.read()
            except OSError:
                blob = ""
            if _owner_alive(blob):
                raise RuntimeError(
                    f"append already in flight on {root} (live owner "
                    f"{blob!r}) — text appends serialize per root; "
                    "retry after it completes"
                )
            # dead owner: finish or undo its crashed append, steal lock
            recover_text_append(root)
            try:
                os.unlink(lock)
            except OSError:
                pass
    raise RuntimeError(f"could not acquire append lock on {root}")


def _apply_text_append(root: str) -> None:
    """Apply a COMMITTED staged append to the live tree — pure renames,
    idempotent at every crash point, so ``recover_text_append`` can
    re-run it verbatim to roll a crashed append forward:

    - delta artifacts (dl/postings/positions): each staged parquet file
      moves into the live dir under its Spark job-UUID basename (a
      crashed retry simply skips files already moved);
    - vocab-sized rewrites (term_meta/term_variants/stats): two-phase
      rename — live parks at ``<name>.swapping``, staged dir renames
      in, parked dir removed. Each state the crash can leave (parked
      only / parked+new-live / done) re-resolves deterministically.
    """
    import glob as _glob
    import os
    import shutil

    staging = os.path.join(root, _TEXT_STAGING)
    if not os.path.exists(os.path.join(staging, "_COMMIT")):
        return
    for name in ("dl", "postings", "positions"):
        src = os.path.join(staging, name)
        if os.path.isdir(src):
            for fp in _glob.glob(os.path.join(src, "*.parquet")):
                os.rename(
                    fp, os.path.join(root, name, os.path.basename(fp))
                )
            shutil.rmtree(src)
    # delta-vocab tiers: staged as tier-<uuid>.term_meta / .term_variants,
    # landing under term_meta_tiers/ and term_variants_tiers/ (idempotent:
    # a moved tier's source is gone; a duplicate retry drops its source)
    for src in _glob.glob(os.path.join(staging, "tier-*.*")):
        base = os.path.basename(src)
        tname, kind = base.split(".", 1)
        dest_dir = os.path.join(root, f"{kind}_tiers")
        os.makedirs(dest_dir, exist_ok=True)
        dest = os.path.join(dest_dir, tname)
        if os.path.isdir(dest):
            shutil.rmtree(src)
        else:
            os.rename(src, dest)
    for name in _TEXT_SWAPPED:
        src = os.path.join(staging, name)
        live = os.path.join(root, name)
        parked = f"{live}.swapping"
        if os.path.isdir(src):
            if os.path.isdir(live) and not os.path.isdir(parked):
                os.rename(live, parked)
            if not os.path.isdir(live):
                os.rename(src, live)
        if os.path.isdir(parked):
            shutil.rmtree(parked)
    # a FOLD append lists the tiers its merged base absorbed — they
    # drop only after the swaps above landed (missing dirs are fine on
    # a roll-forward retry)
    drop = os.path.join(staging, "_DROP_TIERS")
    if os.path.exists(drop):
        with open(drop) as f:
            for rel in f.read().splitlines():
                if rel:
                    shutil.rmtree(os.path.join(root, rel), ignore_errors=True)
    shutil.rmtree(staging)


def recover_text_append(root: str) -> str | None:
    """Heal a crashed ``append_text_artifacts`` on ``root``:

    - staging dir WITHOUT the ``_COMMIT`` marker → the crash happened
      while everything was still being staged; the live tree was never
      touched — roll BACK (drop staging). A retry of the same delta
      passes the fresh-doc_id check (nothing was ingested).
    - staging dir WITH ``_COMMIT`` → every artifact was fully staged;
      roll FORWARD by re-running the idempotent apply. A retry then
      correctly reports the doc_id clash (the delta IS ingested).

    Returns None / "rolled_back" / "rolled_forward"."""
    import os
    import shutil

    staging = os.path.join(root, _TEXT_STAGING)
    if not os.path.isdir(staging):
        return None
    if os.path.exists(os.path.join(staging, "_COMMIT")):
        _apply_text_append(root)
        return "rolled_forward"
    shutil.rmtree(staging)
    return "rolled_back"


def _await_stable_text_root(root: str, timeout: float = 10.0) -> None:
    """Reader fence for the mutable-fleet serving surface
    (``sharded_bm25_topk_batch_paths``): an append's APPLY phase is a
    brief window of renames where term_meta/stats may be mid-swap
    (round-13 ADVICE item 2). The window opens only once the
    ``_COMMIT`` marker exists (all heavy writes happen in staging, so
    pre-commit readers see the old consistent tree); spin the
    milliseconds until it closes, and if the appender is DEAD, roll
    its committed append forward ourselves.

    Honesty note (round-14 ADVICE): this fence closes the window only
    at PLAN time. Spark reads lazily — an append whose ``_COMMIT``
    lands after the fence can still swap term_meta/stats while this
    reader's jobs run, so a sufficiently unlucky in-flight read can
    hit FileNotFound or a mixed generation. The probability window is
    the milliseconds of the rename phase; the serve-under-mutation
    probe observed 0 torn reads across 83 busy batches, but "possible,
    unobserved" is the accurate claim. Readers that need a GUARANTEE
    pin a generation manifest instead (``pin_text_fleet_manifest`` /
    ``read_text_fleet_manifest``) — swapped artifacts stay on disk
    until vacuum, so a pinned snapshot never mixes generations."""
    import os
    import time

    from cloudvectordb_spark.operators.pipeline import _owner_alive

    commit = os.path.join(root, _TEXT_STAGING, "_COMMIT")
    if not os.path.exists(commit):
        return
    deadline = time.monotonic() + timeout
    while os.path.exists(commit):
        # deadline first: an unreadable-but-present marker (the r14
        # ADVICE infinite-loop path) must still time out loudly
        if time.monotonic() > deadline:
            raise RuntimeError(
                f"append apply phase on {root} still open after "
                f"{timeout}s"
            )
        try:
            with open(commit) as f:
                blob = f.read()
        except OSError:
            time.sleep(0.005)  # marker vanished between exists() and open()
            continue
        if not _owner_alive(blob):
            recover_text_append(root)
            return
        time.sleep(0.005)


def append_text_artifacts(spark: SparkSession, docs: DataFrame, root: str) -> dict:
    """Incremental delta ingest into ONE v5 artifact tree (round-13
    verdict #3) — the per-shard building block of
    ``append_sharded_text_artifacts``. Cost shape:

    - postings / positions / dl: APPEND-ONLY (∝ delta rows — the
      corpus-sized artifacts are never rewritten; delta files are
      term-sorted so the per-query IN-list prunes them like base
      files, LSM-style tiers that a rebuild/compaction folds);
    - stats: EXACT integer algebra — n_docs += Δn, dl_sum += Δdl_sum
      (bigints), avgdl = dl_sum / n_docs: bit-equal to a rebuild, so
      merged sharded BM25 stays bit-identical to monolithic;
    - term_meta / term_variants: ∝ DELTA VOCAB per append (round-14
      verdict #4 — the r13 version rewrote the whole merged vocab per
      append). Each append stages a delta-vocab TIER carrying its own
      ``avgdl_ref`` anchor; serving reads the merged view
      (``read_term_meta_merged``): df(t) = Σ tiers' df(t) by exact
      integer addition (fresh docs ⇒ disjoint postings), and each
      generation's max_impact inflates by max(1, avgdl_now/avgdl_ref)
      — a VALID upper bound because tf·(k1+1)/(tf+k1(1-b+b·dl/avgdl))
      is increasing in avgdl with growth factor < avgdl_new/avgdl_old
      (the dl-dominated limit). WAND pruning stays exact (bounds only
      loosen); every ``_TEXT_META_FOLD_DEPTH`` appends the tiers FOLD
      into a fresh re-anchored base (amortized ∝ vocab/DEPTH), and a
      rebuild re-tightens the bounds fully.

    Crash + concurrency discipline (round-13 ADVICE item 2, mirroring
    the vector-side L0 fold protocol): a per-root ``_APPEND_LOCK``
    lease serializes appends (a dead holder's crashed append is healed
    and the lock stolen); EVERY artifact — delta files and vocab-sized
    rewrites — is first written into ``append.staging/``, then a
    ``_COMMIT`` marker makes the append durable, then the idempotent
    apply (pure renames) moves deltas in and swaps the rewrites. A
    crash before the marker rolls BACK (live tree untouched; the retry
    passes the fresh-doc_id check); after it, ``recover_text_append``
    rolls FORWARD (the retry then correctly reports the clash because
    the delta IS ingested). Readers fence on the marker
    (``_await_stable_text_root``) — a PLAN-time fence that closes the
    mid-swap window for reads planned while it is open, but cannot
    stop an append committing under a read already in flight (Spark
    reads lazily; see the fence's honesty note). Readers that need a
    consistency GUARANTEE under concurrent appends pin a generation
    manifest (``pin_text_fleet_manifest``).

    Requires fresh doc_ids (enforced against the dl artifact). Returns
    {"n_docs", "dl_sum", "delta_docs"}. Pytest pins append == rebuild
    on postings/positions/dl/stats/term_meta.df content and on served
    BM25 results."""
    import os
    import shutil

    from pyspark import StorageLevel

    lock = _acquire_text_append_lock(root)  # heals any crashed append
    ptok = docs.select(
        "doc_id", F.posexplode(TX.tokens("text")).alias("pos", "term")
    )
    grouped = (
        ptok.groupBy("term", "doc_id")
        .agg(
            F.sort_array(F.collect_list("pos")).alias("positions"),
            F.count("*").alias("tf"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    staging = os.path.join(root, _TEXT_STAGING)
    try:
        # a prior append may have crashed between releasing its lock
        # and finishing (or its apply raised): roll a COMMITTED staging
        # forward before the doc_id check, never silently delete it
        recover_text_append(root)
        shutil.rmtree(staging, ignore_errors=True)  # rolled-back litter
        dl_delta = grouped.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        srow = spark.read.parquet(os.path.join(root, "stats")).collect()[0]
        drow = dl_delta.agg(
            F.count("*").alias("n"),
            F.sum("dl").alias("s"),
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
        ).first()
        # Freshness check, two tiers (round-14 — the 10M decade showed
        # the append wall is FIXED-COST dominated, mostly this scan):
        # when the stats row carries the maintained max_doc_id fence
        # and every delta id sits above it, clash-freedom is PROVEN in
        # O(1) — the common monotonic-id ingest stream skips the
        # corpus-sized dl semi-join entirely. Non-monotonic deltas (or
        # pre-fence trees) fall back to the exact scan, which also
        # upgrades the tree: the new stats row records the true max.
        fence = getattr(srow, "max_doc_id", None)
        corpus_max = None
        if fence is None or drow.lo is None or int(drow.lo) <= int(fence):
            old_dl = spark.read.parquet(os.path.join(root, "dl"))
            clash = old_dl.join(
                docs.select("doc_id"), "doc_id", "left_semi"
            ).agg(F.count("*").alias("n")).first()
            if int(clash.n):
                raise ValueError(
                    f"append_text_artifacts requires fresh doc_ids; "
                    f"{int(clash.n)} delta ids already exist in "
                    f"{root}/dl (a prior append of this delta that "
                    "crashed post-commit was rolled forward — it IS "
                    "ingested)"
                )
            if fence is None:
                corpus_max = int(
                    old_dl.agg(F.max("doc_id").alias("mx")).first().mx or 0
                )
        n_docs = int(srow.n_docs or 0) + int(drow.n or 0)
        dl_sum = int(srow.dl_sum or 0) + int(drow.s or 0)
        max_doc_id = max(
            int(fence) if fence is not None else (corpus_max or 0),
            int(drow.hi) if drow.hi is not None else 0,
        )
        avgdl_old = float(srow.avgdl or 0.0)
        avgdl = dl_sum / max(1, n_docs)

        # First v7 append to a PRE-v6 base (term_meta without the
        # avgdl_ref column): record the base's true anchor — the
        # pre-append avgdl its bounds were last rewritten against —
        # BEFORE any tier can land (round-14 ADVICE medium). Written
        # directly (not staged): the value is correct whether this
        # append commits or rolls back, and idempotently skipped once
        # present.
        anchor_p = os.path.join(root, "_BASE_AVGDL_REF")
        if not os.path.exists(anchor_p) and "avgdl_ref" not in (
            spark.read.parquet(os.path.join(root, "term_meta")).columns
        ):
            import json as _json

            with open(anchor_p, "w") as f:
                _json.dump({"avgdl_ref": avgdl_old}, f)

        # corpus-sized artifacts: delta files STAGED (∝ delta), moved
        # into the live dirs only at apply time
        dl_delta.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(staging, "dl")
        )
        n_parts = max(1, int(drow.s or 0) // 25_000_000 + 1)
        postings_delta = grouped.select("term", "doc_id", "tf")
        (
            postings_delta.repartition(n_parts, "term")
            .sortWithinPartitions("term", "doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(staging, "postings"))
        )
        (
            grouped.select("term", "doc_id", "positions")
            .repartition(n_parts, "term")
            .sortWithinPartitions("term", "doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(staging, "positions"))
        )

        # vocab-sized artifacts — TIERED (round-13 verdict #4 → round
        # 14): the r13 append rewrote the whole merged vocab per append
        # (∝ vocab, the last non-∝-delta term in the append wall; vocab
        # grows with corpus). Now each append stages only a DELTA-vocab
        # tier carrying its own avgdl_ref anchor; serving reads the
        # merged view (read_term_meta_merged — df by exact bigint
        # addition, bounds inflated per generation), and every
        # _TEXT_META_FOLD_DEPTH appends the tiers FOLD into a fresh
        # base (the amortized vocab rewrite, ∝ vocab/DEPTH per append).
        tf_sat = (F.col("tf") * (_K1 + 1.0)) / (
            F.col("tf")
            + _K1 * (1.0 - _B + _B * F.col("dl") / F.lit(avgdl))
        )
        delta_tm = (
            postings_delta.join(dl_delta, "doc_id")
            .groupBy("term")
            .agg(
                F.count("*").cast("bigint").alias("df"),
                F.max(tf_sat).alias("max_impact"),
            )
            .withColumn("avgdl_ref", F.lit(float(avgdl)))
        )
        tiers = _meta_tier_dirs(root)
        if len(tiers) + 1 < _TEXT_META_FOLD_DEPTH:
            # tier path: ∝ delta vocab only
            import uuid as _uuid

            tname = f"tier-{_uuid.uuid4().hex[:12]}"
            delta_tm.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(staging, f"{tname}.term_meta")
            )
            (
                delta_tm.select(
                    "term",
                    "df",
                    F.explode(_deletion_variants("term")).alias("var"),
                )
                .distinct()
                .coalesce(1)
                .sortWithinPartitions("var")
                .write.mode("overwrite")
                .parquet(os.path.join(staging, f"{tname}.term_variants"))
            )
        else:
            # fold path: ONE merged rewrite absorbs base + tiers +
            # delta (exact df sums; every bound inflated to the new
            # avgdl and re-anchored at it — validity unchanged), and
            # the apply drops the folded tiers
            merged = _merged_term_meta_frame(
                spark, root, extra=delta_tm, avgdl_now=float(avgdl)
            )
            tm_build = os.path.join(staging, "term_meta")
            merged.write.mode("overwrite").parquet(tm_build)
            new_tm = spark.read.parquet(tm_build)
            (
                new_tm.select(
                    "term",
                    "df",
                    F.explode(_deletion_variants("term")).alias("var"),
                )
                .distinct()
                .repartition(8, "var")
                .sortWithinPartitions("var")
                .write.mode("overwrite")
                .parquet(os.path.join(staging, "term_variants"))
            )
            with open(os.path.join(staging, "_DROP_TIERS"), "w") as f:
                f.write(
                    "\n".join(
                        os.path.relpath(t, root)
                        for t in tiers
                        + _variant_tier_dirs(root)
                    )
                )
        spark.createDataFrame(
            [(n_docs, avgdl, dl_sum, max_doc_id)],
            schema="n_docs bigint, avgdl double, dl_sum bigint, "
            "max_doc_id bigint",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(staging, "stats")
        )
        # COMMIT: every artifact is staged — from here the append rolls
        # forward (crash-healed by recover_text_append), never back
        from cloudvectordb_spark.operators.pipeline import _fold_owner_blob

        with open(os.path.join(staging, "_COMMIT"), "w") as f:
            f.write(_fold_owner_blob())
        _apply_text_append(root)
    finally:
        grouped.unpersist()
        try:
            os.unlink(lock)
        except OSError:
            pass
    return {"n_docs": n_docs, "dl_sum": dl_sum, "delta_docs": int(drow.n or 0)}


def vacuum_text_indexes(
    family_dir: str,
    live_paths: tuple = (),
    keep: int = 2,
    pins: tuple = (),
) -> dict:
    """Retention for TEXT index artifact roots (round-13 verdict #5) —
    the text-side twin of ``pipeline.vacuum_ivf_layouts``: every
    rebuild (v3→v5 format bumps, fixture regeneration, shard-count
    changes) leaves a superseded tree under the family dir, and
    nothing reclaimed them. A ROOT is a direct child holding a v5 tree
    (``_DONE`` marker, a ``postings`` subdir, or a ``shard=0`` fleet
    layout). Classification mirrors the vector side:

    - roots in ``live_paths`` (or that CONTAIN a live path — a shard
      path names its parent fleet root) are never touched;
    - pinned roots (``pins`` or an on-disk ``_PINNED`` marker, see
      ``pipeline.pin_layout``) survive every vacuum — the contract a
      reader still serving from a superseded tree needs;
    - in-flight ``*.build*`` staging dirs belong to their writer;
    - of the rest, the ``keep`` most recently PUBLISHED (postings dir
      mtime) survive; older roots reclaim through the shared
      hard-link-aware loop (``pipeline.reclaim_roots``).

    Versioned postings stores (the tiered-ingest manifest trees) keep
    their own manifest-pinned vacuum in ``versioning.vacuum``; this
    function covers the immutable artifact-tree family."""
    import os

    from cloudvectordb_spark.operators.pipeline import reclaim_roots

    def _is_root(p: str) -> bool:
        return (
            os.path.exists(os.path.join(p, "_DONE"))
            or os.path.isdir(os.path.join(p, "postings"))
            or os.path.isdir(os.path.join(p, "shard=0"))
        )

    live_reals = {os.path.realpath(p) for p in live_paths}
    pin_reals = {os.path.realpath(p) for p in pins}
    roots = []
    for name in sorted(os.listdir(family_dir)):
        p = os.path.join(family_dir, name)
        if not os.path.isdir(p) or ".build" in name or not _is_root(p):
            continue
        roots.append(p)

    def _published_at(p: str) -> float:
        for sub in ("postings", os.path.join("shard=0", "postings")):
            d = os.path.join(p, sub)
            if os.path.isdir(d):
                return os.path.getmtime(d)
        return os.path.getmtime(p)

    kept, candidates = [], []
    for p in roots:
        rp = os.path.realpath(p)
        is_live = rp in live_reals or any(
            lr == rp or lr.startswith(rp + os.sep) for lr in live_reals
        )
        if is_live or rp in pin_reals or os.path.exists(
            os.path.join(p, "_PINNED")
        ):
            kept.append(p)
        else:
            candidates.append(p)
    candidates.sort(key=_published_at, reverse=True)
    kept.extend(candidates[:keep])
    stats = reclaim_roots(candidates[keep:])
    deleted = stats.pop("deleted")
    return {"kept": kept, "deleted": deleted, **stats}


def text_shard_route(n_shards: int):
    """The md5 doc->shard routing expression — MUST stay identical to
    the build-time rule in ensure_sharded_text_index (and to the
    vector fleet's _shard_of) or deltas land on the wrong shard."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(n_shards),
    ).cast("int")


def append_sharded_text_artifacts(
    spark: SparkSession, shard_paths: list, docs: DataFrame, pin: bool = True
) -> dict:
    """Route a text delta to its md5 shards and run the per-shard
    incremental append on each — the text fleet's missing increment
    (round-13 verdict #3): a delta no longer means rebuilding S shard
    trees. Shard appends touch disjoint trees, so they submit
    concurrently like the shard builds/searches; merged-stats
    exactness is inherited from the per-shard exact integer algebra
    (sharded_bm25_topk_batch recomputes its merged model from the
    shard stats on every call, so served scores stay bit-identical to
    a monolithic index over the same corpus)."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import StorageLevel

    S = len(shard_paths)
    routed = docs.withColumn("_shard", text_shard_route(S)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        routed.count()

        def one(s: int) -> dict:
            return append_text_artifacts(
                spark,
                routed.filter(F.col("_shard") == s).drop("_shard"),
                shard_paths[s],
            )

        with ThreadPoolExecutor(max_workers=S) as pool:
            outs = list(pool.map(one, range(S)))
    finally:
        routed.unpersist()
    out = {
        "n_docs": sum(o["n_docs"] for o in outs),
        "dl_sum": sum(o["dl_sum"] for o in outs),
        "delta_docs": sum(o["delta_docs"] for o in outs),
        "shards": outs,
    }
    if pin:
        out["manifest"] = pin_text_fleet_manifest(shard_paths)
    return out


# ---------------------------------------------------------------------------
# Cross-shard consistent snapshots (round-14 verdict #5): per-shard
# append atomicity is pytest-pinned, but a merged batch read DURING a
# fleet append could mix shard generations (shard 0 post-append, shard 1
# pre-append) — documented "possible, unobserved" in r14. A generation
# MANIFEST turns that into a guarantee: at fleet-append completion the
# family pins a snapshot — every shard's artifact tree mirrored by HARD
# LINKS (no data copy; linking holds the shard's _APPEND_LOCK so a
# snapshot can never straddle one shard's apply) — and a manifest.json
# written last via atomic rename marks it complete. Pinned serving
# resolves the newest COMPLETE manifest and reads the immutable snapshot
# tree, so it sees either the fleet generation before an append or the
# one after, never a mix; in-place renames/deletes on the live trees
# (vocab swaps, tier folds, vacuum) cannot reach the snapshot's inodes.
# The same shape at 100 TB: an object-store fleet pins a manifest of
# immutable file keys instead of inodes — manifest-last-commit is the
# protocol, hard links are the single-box implementation.
# ---------------------------------------------------------------------------
_SNAP_EXCLUDE = (_TEXT_STAGING, "_APPEND_LOCK")


def _link_tree(src: str, dst: str) -> None:
    """Mirror ``src`` into ``dst``: directories recreated, files HARD-
    LINKED (same inode, zero copy). Transient names excluded."""
    import os

    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        if name in _SNAP_EXCLUDE or name.endswith(".swapping"):
            continue
        s, d = os.path.join(src, name), os.path.join(dst, name)
        if os.path.isdir(s):
            _link_tree(s, d)
        else:
            try:
                os.link(s, d)
            except FileExistsError:
                pass


def _family_dir(shard_paths: list) -> str:
    import os

    fams = {os.path.dirname(os.path.abspath(p)) for p in shard_paths}
    if len(fams) != 1:
        raise ValueError(
            f"shard paths span {len(fams)} parent dirs; a fleet family "
            "shares one parent"
        )
    return fams.pop()


def pin_text_fleet_manifest(
    shard_paths: list, keep: int = 2, retry_s: float = 5.0
) -> str:
    """Pin a consistent fleet snapshot; returns the manifest path.

    Per shard (in order): take the shard's ``_APPEND_LOCK`` (appends
    serialize on it, so the link pass can never interleave with an
    apply), fence any committed-but-unapplied staging, hard-link the
    tree into ``<family>/snapshots/snap-<n>/shard-<i>``. The manifest
    file lands LAST by atomic rename — a crash mid-pin leaves an
    incomplete snapshot that readers skip (no manifest) and the next
    pin's vacuum sweeps. Keeps the newest ``keep`` complete snapshots;
    older ones (and manifest-less litter) are removed — their inodes
    survive in any newer snapshot that still links them."""
    import glob as _glob
    import json
    import os
    import shutil
    import time

    fam = _family_dir(shard_paths)
    snaps_dir = os.path.join(fam, "snapshots")
    os.makedirs(snaps_dir, exist_ok=True)
    existing = sorted(
        int(os.path.basename(p).split("-")[1])
        for p in _glob.glob(os.path.join(snaps_dir, "snap-*"))
        if os.path.basename(p).split("-")[1].isdigit()
    )
    n = (existing[-1] + 1) if existing else 0
    while True:
        snap = os.path.join(snaps_dir, f"snap-{n:06d}")
        try:
            os.makedirs(snap)
            break
        except FileExistsError:
            n += 1  # concurrent pinner took this id
    for i, p in enumerate(sorted(shard_paths)):
        deadline = time.monotonic() + retry_s
        while True:
            try:
                lock = _acquire_text_append_lock(p)
                break
            except RuntimeError:
                if time.monotonic() > deadline:
                    shutil.rmtree(snap, ignore_errors=True)
                    raise
                time.sleep(0.05)
        try:
            _link_tree(p, os.path.join(snap, f"shard-{i}"))
        finally:
            try:
                os.unlink(lock)
            except OSError:
                pass
    manifest = {
        "snapshot": os.path.basename(snap),
        "shards": [
            f"{os.path.basename(snap)}/shard-{i}"
            for i in range(len(shard_paths))
        ],
        "n_shards": len(shard_paths),
    }
    tmp = os.path.join(snaps_dir, f".manifest.{os.path.basename(snap)}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(snap, "manifest.json"))
    # vacuum: drop superseded snapshots and manifest-less litter
    for p in sorted(_glob.glob(os.path.join(snaps_dir, "snap-*")))[:-keep]:
        if p != snap:
            shutil.rmtree(p, ignore_errors=True)
    return os.path.join(snap, "manifest.json")


def read_text_fleet_manifest(family_dir: str) -> dict | None:
    """The newest COMPLETE snapshot's manifest (absolute shard paths
    under "shard_paths"), or None when the family has never pinned."""
    import glob as _glob
    import json
    import os

    snaps = sorted(
        _glob.glob(os.path.join(family_dir, "snapshots", "snap-*")),
        reverse=True,
    )
    for snap in snaps:
        mp = os.path.join(snap, "manifest.json")
        try:
            with open(mp) as f:
                m = json.load(f)
        except (OSError, ValueError):
            continue  # incomplete or mid-write snapshot — skip
        m["shard_paths"] = [
            os.path.join(family_dir, "snapshots", rel) for rel in m["shards"]
        ]
        m["path"] = mp
        return m
    return None


def sharded_bm25_topk_batch_pinned(
    spark: SparkSession,
    family_dir: str,
    batch: tuple,
    k: int | None = None,  # defaults to _BATCH_K (defined with the
    # batch-serving block below)
    concurrent: bool = True,
) -> DataFrame:
    """Batch BM25 over the family's newest pinned snapshot — the
    guaranteed-consistent serving mode for mutable fleets: the snapshot
    tree is immutable (hard-linked inodes; live-tree swaps and folds
    cannot reach it), so a concurrent fleet append can NEVER tear or
    mix generations under this read. Freshness trades at the pin
    cadence: results reflect the fleet as of the last completed
    append's manifest."""
    m = read_text_fleet_manifest(family_dir)
    if m is None:
        raise FileNotFoundError(
            f"no complete snapshot manifest under {family_dir}/snapshots "
            "— run pin_text_fleet_manifest (or a fleet append with "
            "pin=True) first"
        )
    return sharded_bm25_topk_batch_paths(
        spark, m["shard_paths"], batch, k if k is not None else _BATCH_K,
        concurrent,
    )


def ensure_text_index(spark: SparkSession, sf_dir: str) -> str:
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from cloudvectordb_spark.cache import build_lock, source_tag

    src = os.path.join(sf_dir, "documents.parquet")
    # mtime_ns + size fingerprint (cache.source_tag): a fixture
    # regenerated within the same second as the prior build still gets
    # a fresh index (round-7 ADVICE). md5 keeps the dir name short.
    # "v7" = index format version (postings + dl + stats(+dl_sum,
    # +max_doc_id — the O(1) append freshness fence) +
    # term_meta(+avgdl_ref — the per-generation WAND-bound anchor the
    # tiered append's merged reader inflates from) + positional
    # postings + term deletion variants); bump whenever the artifact
    # schema changes so an old on-disk index can never be read by
    # newer code.
    fp = hashlib.md5(f"v7|{source_tag(src)}".encode()).hexdigest()[:16]
    tag = f"{sf_dir.strip('/').replace('/', '_')}_{fp}"
    root = os.path.join(tempfile.gettempdir(), "cloudvectordb_textindex", tag)
    if os.path.exists(os.path.join(root, "_DONE")):
        return root
    # Same-process threads serialize on a per-root lock; cross-process
    # builders still race benignly via unique build dirs + atomic
    # rename (identical deterministic artifacts, first rename wins).
    with build_lock(root):
        if os.path.exists(os.path.join(root, "_DONE")):
            return root
        build = f"{root}.build{os.getpid()}_{uuid.uuid4().hex[:8]}"
        _write_text_artifacts(spark, load(spark, sf_dir, "documents"), build)
        open(os.path.join(build, "_DONE"), "w").close()
        try:
            os.rename(build, root)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)
    return root


def ensure_sharded_text_index(
    spark: SparkSession, sf_dir: str, n_shards: int
) -> list:
    """Build (once) S INDEPENDENT inverted-index shards for the fixture
    corpus — docs md5-route to shards by doc_id (the SAME rule the
    vector fleet uses, so a hybrid deployment co-shards both
    modalities), and each shard gets the complete v5 artifact tree via
    the shared builder. Shard builds are independent job chains over
    disjoint doc subsets, so they submit from S driver threads (the
    build-side fan-out measured for run_sharded in BASELINE.md r11).

    This is the 100 TB text topology: one postings tree never holds
    the fleet's tokens — each shard owns its postings scan, its build
    lifecycle, and its mergeable stats (n_docs, dl_sum, per-term df),
    which combine by exact integer sums into the global BM25 model
    (`sharded_bm25_topk_batch`)."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid
    from concurrent.futures import ThreadPoolExecutor

    from cloudvectordb_spark.cache import build_lock, source_tag

    src = os.path.join(sf_dir, "documents.parquet")
    fp = hashlib.md5(
        f"v7|shards={n_shards}|{source_tag(src)}".encode()
    ).hexdigest()[:16]
    tag = f"{sf_dir.strip('/').replace('/', '_')}_{fp}"
    root = os.path.join(tempfile.gettempdir(), "cloudvectordb_textindex", tag)
    paths = [os.path.join(root, f"shard={s}") for s in range(n_shards)]
    if os.path.exists(os.path.join(root, "_DONE")):
        return paths
    with build_lock(root):
        if os.path.exists(os.path.join(root, "_DONE")):
            return paths
        build = f"{root}.build{os.getpid()}_{uuid.uuid4().hex[:8]}"
        docs = load(spark, sf_dir, "documents")
        route = F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint"),
            F.lit(n_shards),
        ).cast("int")

        def build_one(s: int) -> None:
            _write_text_artifacts(
                spark,
                docs.filter(route == s),
                os.path.join(build, f"shard={s}"),
            )

        with ThreadPoolExecutor(max_workers=n_shards) as pool:
            list(pool.map(build_one, range(n_shards)))
        open(os.path.join(build, "_DONE"), "w").close()
        try:
            os.rename(build, root)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)
    return paths


def text_index_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(postings, dl, stats, term_meta) DataFrames for the fixture's
    persisted index, cached per (session, index root). Round-7's driver
    bench showed every `spark.read.parquet` call costs a driver-side
    file listing + footer read (~0.2 s/job on the bench host) and
    bm25_scores_indexed paid it 3x PER CALL; the frames are pure
    functions of the immutable index root, so they are built once per
    session (mirroring cached_bloom_onepass). dl and stats are tiny
    relative to the corpus text (two ints / one row) and every BM25
    query touches them, so they are persisted."""
    from cloudvectordb_spark.cache import artifact_cache, session_key

    root = ensure_text_index(spark, sf_dir)

    def build():
        postings = spark.read.parquet(f"{root}/postings")
        dl = spark.read.parquet(f"{root}/dl").persist()
        stats = spark.read.parquet(f"{root}/stats").persist()
        term_meta = spark.read.parquet(f"{root}/term_meta")
        return postings, dl, stats, term_meta

    return artifact_cache(
        ("text_index_frames", root, session_key(spark)), build
    )


def text_index_variant_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, df, var) — the persisted symmetric-deletion variant
    artifact (index v4), session-cached like the other index frames.

    Routed through ``read_term_variants_merged`` (round-14 ADVICE low):
    on a tier-free root (the immutable fixture trees) that is the plain
    base scan, but if this root ever carries delta-vocab tiers the
    fuzzy lookup sees the merged vocabulary instead of silently missing
    appended terms / serving stale df. The cache key carries the tier
    census so an append on the root invalidates the cached frame."""
    from cloudvectordb_spark.cache import artifact_cache, session_key

    root = ensure_text_index(spark, sf_dir)
    tiers = tuple(_variant_tier_dirs(root))
    return artifact_cache(
        ("text_index_variants", root, tiers, session_key(spark)),
        lambda: read_term_variants_merged(spark, root),
    )


def bm25_scores_indexed(
    spark: SparkSession, sf_dir: str, terms: tuple[str, ...] = _QUERY_TERMS
) -> DataFrame:
    """bm25_scores served from the persisted inverted index: the scan
    reads query-term postings (term-sorted row groups -> pushed IN-list
    prunes the read), never the raw text. Bit-identical to the inline
    path; the oracle twins recompute from documents unchanged.

    df comes from term_meta (round 15) — the SAME integers the inline
    countDistinct produces (term_meta is built as one row per (term,
    doc) pair of these postings), read from a ≤ |terms|-row vocab scan
    instead of a second pass over the query-term postings: the executed
    plan drops from two postings scans per call to one."""
    postings, dl, stats, term_meta = text_index_frames(spark, sf_dir)
    tf = postings.filter(F.col("term").isin(*terms))
    dfreq = term_meta.filter(F.col("term").isin(*terms)).select("term", "df")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (_K1 + 1.0)) / (
        F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
    )


# ---------------------------------------------------------------------------
# WAND / max-score top-k pruning (round 8): the persisted index already
# restricts every BM25 query to its query-term postings; pruning makes
# the EXPENSIVE part of scoring (the dl join + float scoring math)
# sublinear in postings length too. term_meta stores, per term, the df
# and the max tf-saturation over the term's postings (computed at build
# time from the exact (tf, dl) pairs), so idf_t * max_impact_t is a
# true per-term upper bound on any doc's contribution:
#
#   1. ub(d) = sum of ub_t over the query terms d contains — a sum of
#      per-term CONSTANTS over the same pushed postings scan, no dl
#      join, map-side combined.
#   2. theta = k-th EXACT score among the top-k docs by ub. The k-th
#      order statistic over a subset lower-bounds the k-th over the
#      full set, and every true top-k doc d has ub(d) >= exact(d) >=
#      final k-th >= theta — so dropping ub < theta is LOSSLESS.
#   3. Exact-score only the survivors (typically a small multiple of k
#      on skewed postings) and take the final top-k.
#
# df comes from term_meta (identical integers to the inline
# countDistinct — one row per (term, doc) in postings), so pruned
# scores are bit-identical to bm25_scores / bm25_scores_indexed and
# the DuckDB oracle (which recomputes from raw text) is unchanged.
# At 100 TB this is the standard top-k keyword-serving shape: postings
# already shard by term; the candidate phase streams constants, the
# scoring phase touches ~k docs per query instead of every match.
# ---------------------------------------------------------------------------
_ROUND_SLOP = 1e-6  # exact scores round half-up to 6 dp before ranking


def _bm25_pruned_parts(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...] = _QUERY_TERMS,
    k: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """(survivor tf pairs, scored survivors) — split out so tests can
    count exactly how many (doc, term) pairs reach the scoring join."""
    postings, dl, stats, term_meta = text_index_frames(spark, sf_dir)
    tf = postings.filter(F.col("term").isin(*terms))
    meta = (
        term_meta.filter(F.col("term").isin(*terms))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "df",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * F.col("max_impact")
            ).alias("ub_t"),
        )
    )
    return _wand_pruned_parts(tf, dl, stats, meta, k)


def _wand_pruned_parts(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    meta: DataFrame,
    k: int,
) -> tuple[DataFrame, DataFrame]:
    """The 3-phase WAND/max-score kernel, generic over where the
    per-term metadata came from. ``meta`` carries (term, df, ub_t)
    where ub_t is any VALID upper bound on a doc's contribution from
    that term — exact build-time max-impact (``_bm25_pruned_parts``)
    or the mergeable (tf_max, dl_min) bound
    (``bm25_pruned_merged_bounds``). Looser bounds keep losslessness
    (every true top-k doc still clears theta) and only admit more
    survivors into exact scoring."""
    # Phase 1: per-doc upper bounds — constants summed over the pushed
    # postings scan (map-side combine; no dl join, no per-pair floats).
    ub = (
        tf.join(F.broadcast(meta.select("term", "ub_t")), "term")
        .groupBy("doc_id")
        .agg(F.sum("ub_t").alias("ub"))
    )

    def exact_scores(pairs: DataFrame) -> DataFrame:
        # identical arithmetic to _bm25_from_parts, df from term_meta
        idf = F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        tf_part = (F.col("tf") * (_K1 + 1.0)) / (
            F.col("tf")
            + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
        )
        return (
            pairs.join(F.broadcast(meta.select("term", "df")), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
        )

    # Phase 2: theta = k-th exact score among the top-k docs BY UB.
    # theta is ONE bounded value — gathered eagerly (round 15, same
    # restructure as bm25_batch_pruned_scores) so phase 3's survivor
    # filter re-enters the plan as a literal instead of re-deriving the
    # whole theta subtree (cand window + exact-score join) inside it:
    # the executed bm25_topk_pruned plan dropped from 32 scans / 0
    # reused exchanges to one eager theta job + a 2-scan final plan.
    cand = global_topk_ranked(ub, [F.desc("ub"), F.asc("doc_id")], k).select(
        "doc_id"
    )
    theta_row = bounded_gather(
        exact_scores(tf.join(F.broadcast(cand), "doc_id")).agg(
            F.min("bm25").alias("theta")
        ),
        "_wand_pruned_parts theta",
    )
    theta_val = theta_row[0].theta if theta_row else None
    # Phase 3: survivors — ub >= theta (minus the 6-dp rounding slop on
    # exact scores, so half-up rounding can never evict a tied doc).
    # A null theta (no candidates at all) admits nothing, exactly like
    # the old inner-join-with-empty-theta shape.
    if theta_val is None:
        survivor_ids = ub.filter(F.lit(False)).select("doc_id")
    else:
        survivor_ids = ub.filter(
            F.col("ub") >= F.lit(float(theta_val)) - _ROUND_SLOP
        ).select("doc_id")
    survivor_pairs = tf.join(F.broadcast(survivor_ids), "doc_id")
    return survivor_pairs, exact_scores(survivor_pairs)


@query(
    "bm25_topk_pruned",
    # Pruning is lossless for top-k, so the oracle is EXACTLY the
    # unpruned bm25_keyword_search oracle — DuckDB recomputes full BM25
    # from raw text and the pruned engine path must hash-match it.
    oracle=f"""
    WITH {_BM25_SCORED_SQL}
    SELECT doc_id, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 20
    """,
    operators=("K2", "E4", "F2", "C2"),
)
def bm25_topk_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, scored = _bm25_pruned_parts(spark, sf_dir, _QUERY_TERMS, 20)
    return global_topk_ranked(scored, [F.desc("bm25"), F.asc("doc_id")], 20)


# ---------------------------------------------------------------------------
# Mergeable WAND bounds (round 8, continuation): the exact build-time
# max_impact is NOT mergeable — it bakes in corpus-global avgdl, which
# moves whenever documents arrive, so incremental index maintenance
# would have to rescan every posting to refresh it. Per-term
# (df, tf_max, dl_min) IS mergeable (sum / max / max->max, min->min
# across shards), and because the BM25 tf-part is increasing in tf and
# decreasing in dl,
#
#   tf_part(tf_d, dl_d) <= tf_part(tf_max, dl_min)   for every doc d
#
# — a VALID (looser) upper bound computable from shard-mergeable
# integers plus the current avgdl at query time. This query runs the
# full maintenance story in one plan: split the corpus into two shards
# (md5 rule, the same split every incremental query uses), compute
# per-shard mergeable stats, MERGE them, rebuild the bounds under the
# merged avgdl, and WAND-prune — the result must be bit-identical to
# the unpruned full-corpus top-20 (the oracle), proving pruning stays
# lossless under incrementally-maintained metadata. At 100 TB this is
# how WAND survives a growing corpus: shards keep (df, tf_max, dl_min)
# counters, compaction merges them with sum/max/min, and no posting is
# ever rescanned to refresh a bound.
# ---------------------------------------------------------------------------
def _shard_term_stats(
    docs: DataFrame, terms: tuple[str, ...]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(query-term tf, dl, per-term mergeable stats) for one corpus
    shard.

    Round 16: tf and dl are lazily ``localCheckpoint``'ed, so each
    shard is tokenized exactly TWICE per invocation (one streaming
    aggregation pass per frame) no matter how many times the WAND
    kernel re-references them — previously the merged-stats gather,
    the theta job and the survivor plan each re-derived the shard
    tokenize per reference (~9 executions of the tokenize subtree per
    shard in one call).  localCheckpoint, not persist: the
    materialization is keyed to THIS invocation's RDD, so repeated
    calls recompute from the parquet inputs (no cross-run reuse —
    Spark's CacheManager plan-matching never sees it) and the blocks
    are GC'd with the returned plan (no unpersist lifetime problem).
    Going to ONE tokenize pass per shard would require materializing
    the full-vocabulary tf (dl = per-doc sum of tf) — at scale that is
    writing the whole postings index per query, strictly worse than a
    second streaming pass over the tokens.

    Stats are computed from the same checkpointed frames, restricted
    to the query terms: per-term (df, tf_max, dl_min) depend only on
    that term's own (tf, dl) rows, so the query-term subset yields
    integers identical to the old full-vocabulary aggregate filtered
    late."""
    tok = docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl")).localCheckpoint(
        eager=False
    )
    tf = (
        tok.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    stats = (
        tf.join(dl, "doc_id")
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.max("tf").alias("tf_max"),
            F.min("dl").alias("dl_min"),
        )
    )
    return tf, dl, stats


@query(
    "bm25_pruned_merged_bounds",
    # Lossless under merged bounds => the oracle is the plain unpruned
    # full-corpus top-20, identical to bm25_topk_pruned's.
    oracle=f"""
    WITH {_BM25_SCORED_SQL}
    SELECT doc_id, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 20
    """,
    operators=("K2", "E4", "F2", "C2", "D4"),
)
def bm25_pruned_merged_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    is_delta = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    )
    shards = [docs.filter(is_delta), docs.filter(~is_delta)]
    tfs, dls, stats_parts, counts = [], [], [], []
    for shard in shards:
        tf_s, dl_s, st_s = _shard_term_stats(shard, _QUERY_TERMS)
        tfs.append(tf_s)
        dls.append(dl_s)
        stats_parts.append(st_s)
        counts.append(
            dl_s.agg(
                F.count("*").alias("n_docs"), F.sum("dl").alias("dl_sum")
            )
        )
    # shard merge: docs are disjoint, so sum/max/min reproduce the
    # full-corpus integers exactly (df) or bound them (tf_max, dl_min)
    tf = tfs[0].unionByName(tfs[1])
    dl = dls[0].unionByName(dls[1])
    stats = (
        counts[0]
        .unionByName(counts[1])
        .agg(
            F.sum("n_docs").alias("n_docs"),
            (
                F.sum("dl_sum").cast("double") / F.sum("n_docs")
            ).alias("avgdl"),
        )
    )
    merged = (
        stats_parts[0]
        .unionByName(stats_parts[1])
        .groupBy("term")
        .agg(
            F.sum("df").alias("df"),
            F.max("tf_max").alias("tf_max"),
            F.min("dl_min").alias("dl_min"),
        )
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    ub_tf_part = (F.col("tf_max") * (_K1 + 1.0)) / (
        F.col("tf_max")
        + _K1 * (1.0 - _B + _B * F.col("dl_min") / F.col("avgdl"))
    )
    # meta is ≤ |query terms| rows and stats is one row — both bounded,
    # both derived from the (now checkpointed) shard frames. One eager
    # gather (round 15) re-enters them as local relations so the
    # merged-stats aggregation runs once instead of once per kernel
    # reference; this gather job is also what materializes the shard
    # tf/dl checkpoints that the theta job and the final survivor plan
    # reuse (round 16). Values identical: doubles round-trip the
    # driver exactly. Budget-enforced (round 16): the gather is
    # |query terms|-bounded by the groupBy, never corpus-sized.
    meta_rows = bounded_gather(
        merged.crossJoin(F.broadcast(stats)).select(
            "term", "df", (idf * ub_tf_part).alias("ub_t"),
            "n_docs", "avgdl",
        ),
        "bm25_pruned_merged_bounds meta",
    )
    meta = spark.createDataFrame(
        [(r.term, int(r.df), float(r.ub_t)) for r in meta_rows],
        schema="term string, df bigint, ub_t double",
    )
    stats_local = spark.createDataFrame(
        [(int(meta_rows[0].n_docs), float(meta_rows[0].avgdl))]
        if meta_rows
        else [],
        schema="n_docs bigint, avgdl double",
    )
    _, scored = _wand_pruned_parts(tf, dl, stats_local, meta, 20)
    return global_topk_ranked(scored, [F.desc("bm25"), F.asc("doc_id")], 20)


def positional_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The positional postings DataFrame (term, doc_id, positions
    array<int>, 0-based), session-cached like text_index_frames."""
    from cloudvectordb_spark.cache import artifact_cache, session_key

    root = ensure_text_index(spark, sf_dir)
    return artifact_cache(
        ("text_index_positions", root, session_key(spark)),
        lambda: spark.read.parquet(f"{root}/positions"),
    )


# ---------------------------------------------------------------------------
# Phrase + proximity search (round 8): the one common keyword-serving
# surface the engine lacked. Served from the positional postings — the
# query reads ONLY the phrase terms' position lists (same pushed
# IN-list row-group pruning as the tf postings), joins them on doc_id,
# and counts adjacency (phrase) or within-window pairs (proximity) with
# array intrinsics. Never a raw-text scan at query time; the DuckDB
# oracles recompute from raw text, proving the positional index
# faithful. At 100 TB: position lists ride the same term-sorted shards,
# so a phrase query touches exactly its terms' row groups.
# ---------------------------------------------------------------------------
_PHRASE = ("data", "query")
_PROX_TERMS = ("data", "fast")
_PROX_WINDOW = 3


def phrase_match_counts(
    spark: SparkSession, sf_dir: str, phrase: tuple[str, ...]
) -> DataFrame:
    """(doc_id, n_occurrences) for an exact consecutive phrase, folded
    left-to-right: after step i, `starts` holds the start positions
    whose first i+1 phrase terms match consecutively."""
    pos = positional_frame(spark, sf_dir)
    acc = (
        pos.filter(F.col("term") == phrase[0])
        .select("doc_id", F.col("positions").alias("starts"))
    )
    for i, t in enumerate(phrase[1:], start=1):
        nxt = pos.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias("_p")
        )
        # NB: the transform lambda must take exactly ONE parameter — a
        # two-parameter lambda makes pyspark pass the array INDEX as
        # the second argument, silently shadowing a captured default.
        offset = F.lit(i)
        acc = (
            acc.join(nxt, "doc_id")
            .select(
                "doc_id",
                F.array_intersect(
                    "starts",
                    F.transform("_p", lambda x: x - offset),  # noqa: B023
                ).alias("starts"),
            )
            .filter(F.size("starts") > 0)
        )
    return acc.select(
        "doc_id", F.size("starts").cast("bigint").alias("n_occurrences")
    )


@query(
    "phrase_search",
    oracle=f"""
    SELECT doc_id, n_occurrences,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, doc_id)
                AS BIGINT) AS rank
    FROM (
      SELECT doc_id,
             CAST(len(list_filter(range(1, len(toks)),
                  i -> toks[i] = '{_PHRASE[0]}' AND toks[i+1] = '{_PHRASE[1]}'))
               AS BIGINT) AS n_occurrences
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ) WHERE n_occurrences > 0
    QUALIFY rank <= 20
    """,
    operators=("K2", "H7", "H8", "E4", "C1"),
)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 docs by exact-phrase occurrence count for "data query",
    served from positional postings (the oracle scans raw text)."""
    counts = phrase_match_counts(spark, sf_dir, _PHRASE)
    return global_topk_ranked(
        counts, [F.desc("n_occurrences"), F.asc("doc_id")], 20
    )


@query(
    "proximity_search",
    oracle=f"""
    SELECT doc_id, n_pairs,
           CAST(row_number() OVER (ORDER BY n_pairs DESC, doc_id)
                AS BIGINT) AS rank
    FROM (
      SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_pairs
      FROM (
        SELECT doc_id,
               unnest(list_filter(range(1, len(toks) + 1),
                      i -> toks[i] = '{_PROX_TERMS[0]}')) AS pa
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      ) a
      JOIN (
        SELECT doc_id,
               unnest(list_filter(range(1, len(toks) + 1),
                      i -> toks[i] = '{_PROX_TERMS[1]}')) AS pb
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      ) b ON a.doc_id = b.doc_id AND abs(a.pa - b.pb) <= {_PROX_WINDOW}
      GROUP BY a.doc_id
    ) QUALIFY rank <= 20
    """,
    operators=("K2", "H7", "H8", "E4", "C6"),
)
def proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 docs by count of ("data", "fast") position pairs within
    a 3-token window — positional-postings-served proximity ranking.
    The pair count explodes both terms' position lists for matching
    docs only (bounded by per-doc term frequency, never corpus-wide)."""
    pos = positional_frame(spark, sf_dir)
    a = (
        pos.filter(F.col("term") == _PROX_TERMS[0])
        .select("doc_id", F.explode("positions").alias("pa"))
    )
    b = (
        pos.filter(F.col("term") == _PROX_TERMS[1])
        .select("doc_id", F.explode("positions").alias("pb"))
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.abs(F.col("pa") - F.col("pb")) <= _PROX_WINDOW)
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )
    return global_topk_ranked(
        pairs, [F.desc("n_pairs"), F.asc("doc_id")], 20
    )


# ---------------------------------------------------------------------------
# Snippet extraction (round 8): the last hop of the serving pipeline —
# retrieve (phrase match on positional postings) -> locate (first
# occurrence position, already IN the index, no text re-scan to find
# it) -> render (one bounded slice of the matched doc's tokens). Only
# the matched docs' text rows are ever touched; at 100 TB snippets are
# a broadcast-join of the ~k result ids back to the doc store.
# ---------------------------------------------------------------------------
_SNIPPET_PAD = 3  # tokens of context either side of the phrase


@query(
    "phrase_search_snippets",
    oracle=f"""
    SELECT doc_id, first_pos, snippet FROM (
      SELECT doc_id,
             CAST(hits[1] AS BIGINT) - 1 AS first_pos,  -- 0-based, engine parity
             array_to_string(
               toks[greatest(1, hits[1] - {_SNIPPET_PAD}) :
                    least(len(toks), hits[1] + 1 + {_SNIPPET_PAD})],
               ' ') AS snippet
      FROM (
        SELECT doc_id, toks,
               list_filter(range(1, len(toks)),
                 i -> toks[i] = '{_PHRASE[0]}' AND toks[i+1] = '{_PHRASE[1]}')
                 AS hits
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      ) WHERE len(hits) > 0
    ) ORDER BY doc_id LIMIT 10
    """,
    operators=("K2", "H1", "H7", "C2", "F3"),
)
def phrase_search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence snippet (±3 tokens) for the first 10 docs
    matching the "data query" phrase. The occurrence position comes
    from the positional index; only matched docs' text is read."""
    pos = positional_frame(spark, sf_dir)
    a = pos.filter(F.col("term") == _PHRASE[0]).select(
        "doc_id", F.col("positions").alias("pa")
    )
    b = pos.filter(F.col("term") == _PHRASE[1]).select(
        "doc_id", F.col("positions").alias("pb")
    )
    first = (
        a.join(b, "doc_id")
        .select(
            "doc_id",
            F.array_min(
                F.array_intersect(
                    "pa", F.transform("pb", lambda x: x - 1)
                )
            ).alias("first_pos"),
        )
        .filter(F.col("first_pos").isNotNull())
    )
    docs = load(spark, sf_dir, "documents")
    matched = global_topk_ranked(
        first, [F.asc("doc_id")], 10
    ).drop("rank")
    toks = TX.tokens("text")
    # slice() is 1-based: phrase starts at token first_pos+1; window
    # covers [start-PAD, start+1+PAD] clamped to the doc
    start1 = F.col("first_pos") + 1
    lo = F.greatest(F.lit(1), start1 - _SNIPPET_PAD)
    hi = F.least(F.size(toks), start1 + 1 + _SNIPPET_PAD)
    return (
        docs.join(F.broadcast(matched), "doc_id")
        .select(
            "doc_id",
            F.col("first_pos").cast("bigint").alias("first_pos"),
            F.array_join(
                F.slice(toks, lo, hi - lo + 1), " "
            ).alias("snippet"),
        )
    )


# ---------------------------------------------------------------------------
# Sparse-vector search (round 8): the SPLADE/learned-sparse serving
# shape — query = sparse (term -> weight) vector, doc = sparse tf-idf
# vector, score = sparse dot product. Served from the SAME persisted
# postings + term_meta + stats artifacts as BM25 (pushed IN-list over
# term-sorted row groups); only the scoring expression differs, which
# is exactly why an inverted index is the universal sparse-retrieval
# layout. The query weights here stand in for a learned sparse
# encoder's output (a handful of nonzero terms).
# ---------------------------------------------------------------------------
_SPARSE_Q = (("data", 1.0), ("query", 0.7), ("engine", 0.5), ("fast", 0.25))


def sparse_dot_scores(
    spark: SparkSession, sf_dir: str, qweights=_SPARSE_Q
) -> DataFrame:
    terms = tuple(t for t, _ in qweights)
    postings, _, stats, term_meta = text_index_frames(spark, sf_dir)
    qw = spark.createDataFrame(
        list(qweights), schema="term string, qw double"
    )
    tf = postings.filter(F.col("term").isin(*terms))
    meta = term_meta.filter(F.col("term").isin(*terms)).select("term", "df")
    # tf-idf weight: tf * ln(n_docs / df); score = sum over shared terms
    return (
        tf.join(F.broadcast(meta), "term")
        .join(F.broadcast(qw), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("qw")
                    * F.col("tf")
                    * F.log(F.col("n_docs") / F.col("df"))
                ),
                6,
            ).alias("score")
        )
    )


@query(
    "sparse_dot_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
    qw(term, qw) AS (VALUES {", ".join(f"('{t}', {w})" for t, w in _SPARSE_Q)}),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN (SELECT term FROM qw) GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
           WHERE term IN (SELECT term FROM qw) GROUP BY term)
    SELECT doc_id, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
    FROM (
      SELECT tf.doc_id,
             round(sum(qw.qw * tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE))), 6)
               AS score
      FROM tf JOIN df USING (term) JOIN qw USING (term) CROSS JOIN n
      GROUP BY tf.doc_id
    ) QUALIFY rank <= 20
    """,
    operators=("K2", "K7", "E4", "C2", "D1"),
)
def sparse_dot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 docs by sparse query-doc dot product, index-served (the
    oracle recomputes tf-idf from raw text)."""
    return global_topk_ranked(
        sparse_dot_scores(spark, sf_dir),
        [F.desc("score"), F.asc("doc_id")],
        20,
    )


@query(
    "bm25_keyword_search",
    oracle=f"""
    WITH {_BM25_SCORED_SQL}
    SELECT doc_id, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 20
    """,
    operators=("K2", "E4", "D1", "C2", "F2"),
    bench=True,
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Served from the persisted inverted index (ensure_text_index): the
    # corpus tokenize/explode happens once per fixture at index-build
    # time; the query scan reads query-term postings only.
    scored = bm25_scores_indexed(spark, sf_dir)
    # TakeOrderedAndProject top-20, then rank the 20 survivors — no
    # single-partition window over the corpus-sized score table.
    return global_topk_ranked(
        scored, [F.desc("bm25"), F.asc("doc_id")], 20
    )


# ---------------------------------------------------------------------------
# Hybrid search: reciprocal-rank fusion of the BM25 top-N and the
# embedding-cosine top-N lists (capped RRF — the standard formulation:
# each retriever contributes its top-N, fusion scores only those lists).
# Each top-N is a TakeOrderedAndProject (per-partition heap + driver merge
# of n_parts x N rows), the fusion join is N-row broadcast-sized, and the
# final rank window sees <= N rows — no single-partition window anywhere,
# and no driver-side count(): the "embeddings that are documents"
# restriction is an in-plan left-semi join.
# ---------------------------------------------------------------------------
_RRF_N = 60


@query(
    "hybrid_rrf_search",
    oracle=f"""
    WITH {_BM25_SCORED_SQL},
    bm AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS krank
      FROM scored QUALIFY krank <= {_RRF_N}
    ),
    vec AS (
      SELECT d.vec_id AS doc_id,
             CAST(row_number() OVER (
               ORDER BY round(list_cosine_similarity(CAST(d.embedding AS DOUBLE[]),
                                                     CAST(p.embedding AS DOUBLE[])), 6) DESC,
                        d.vec_id) AS BIGINT) AS vrank
      FROM embeddings d
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) p
      WHERE d.vec_id IN (SELECT doc_id FROM documents)
      QUALIFY vrank <= {_RRF_N}
    ),
    fused AS (
      -- union semantics: a doc in either top-N list scores; a missing
      -- ranking contributes 0 (the standard RRF-over-lists definition)
      SELECT COALESCE(bm.doc_id, vec.doc_id) AS doc_id,
             round(COALESCE(1.0 / (60 + bm.krank), 0)
                 + COALESCE(1.0 / (60 + vec.vrank), 0), 6) AS rrf_score
      FROM bm FULL OUTER JOIN vec USING (doc_id)
    )
    SELECT doc_id, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
    FROM fused QUALIFY rank <= 10
    """,
    operators=("K8", "K7", "E4", "C1", "C2", "C4", "F2"),
    bench=True,
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    bm = global_topk_ranked(
        bm25_scores_indexed(spark, sf_dir), [F.desc("bm25"), F.asc("doc_id")], _RRF_N, "krank"
    ).select("doc_id", "krank")

    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("probe_vec")
    )
    sims = (
        emb.join(
            docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("sim"),
        )
    )
    vec = global_topk_ranked(
        sims, [F.desc("sim"), F.asc("doc_id")], _RRF_N, "vrank"
    ).select("doc_id", "vrank")

    fused = bm.join(vec, ["doc_id"], "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (60 + F.col("krank")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("vrank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return global_topk_ranked(
        fused, [F.desc("rrf_score"), F.asc("doc_id")], 10
    )


# ---------------------------------------------------------------------------
# Hybrid search, weighted LINEAR fusion — the other standard hybrid
# formulation next to RRF: min-max-normalize each retriever's top-N
# score list to [0,1], fuse as alpha*bm + (1-alpha)*vec (missing list
# membership contributes 0). Same scale shape as the RRF twin: two
# TakeOrderedAndProject top-N lists, min/max computed over the N-row
# lists only (broadcast scalar fan-out), fusion join on <= 2N rows.
# ---------------------------------------------------------------------------
_LIN_ALPHA = 0.6


@query(
    "hybrid_linear_fusion_search",
    oracle=f"""
    WITH {{_BM25}},
    bm AS (
      SELECT doc_id, bm25 FROM (
        SELECT doc_id, bm25,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
        FROM scored
      ) WHERE r <= {_RRF_N}
    ),
    bmn AS (
      SELECT doc_id,
             CASE WHEN max(bm25) OVER () = min(bm25) OVER () THEN 0.0
                  ELSE round((bm25 - min(bm25) OVER ())
                             / (max(bm25) OVER () - min(bm25) OVER ()), 6)
             END AS bnorm
      FROM bm
    ),
    vecl AS (
      SELECT doc_id, sim FROM (
        SELECT d.vec_id AS doc_id,
               round(list_cosine_similarity(CAST(d.embedding AS DOUBLE[]),
                                            CAST(p.embedding AS DOUBLE[])), 6) AS sim,
               row_number() OVER (
                 ORDER BY round(list_cosine_similarity(CAST(d.embedding AS DOUBLE[]),
                                                       CAST(p.embedding AS DOUBLE[])), 6) DESC,
                          d.vec_id) AS r
        FROM embeddings d
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) p
        WHERE d.vec_id IN (SELECT doc_id FROM documents)
      ) WHERE r <= {_RRF_N}
    ),
    vecn AS (
      SELECT doc_id,
             CASE WHEN max(sim) OVER () = min(sim) OVER () THEN 0.0
                  ELSE round((sim - min(sim) OVER ())
                             / (max(sim) OVER () - min(sim) OVER ()), 6)
             END AS vnorm
      FROM vecl
    ),
    fused AS (
      SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
             round({_LIN_ALPHA} * COALESCE(b.bnorm, 0)
                 + {round(1 - _LIN_ALPHA, 6)} * COALESCE(v.vnorm, 0), 6)
               AS fused_score
      FROM bmn b FULL OUTER JOIN vecn v USING (doc_id)
    )
    SELECT doc_id, fused_score,
           CAST(row_number() OVER (ORDER BY fused_score DESC, doc_id) AS BIGINT)
             AS rank
    FROM fused QUALIFY rank <= 10
    """.replace("{_BM25}", _BM25_SCORED_SQL),
    operators=("K8", "K7", "E4", "C1", "C2", "F2", "H6"),
)
def hybrid_linear_fusion_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    def _minmax(df: DataFrame, col: str, out: str) -> DataFrame:
        # stats over the N-row list only — as a constant-partition window
        # over the already-bounded top-N frame (the global_topk_ranked
        # _zero pattern), so df is referenced ONCE: the old separate
        # agg + crossJoin referenced df twice and re-derived the whole
        # corpus-pass lineage per reference (round 15). Same values.
        from cloudvectordb_spark.ranking import _zero

        wall = Window.partitionBy(_zero(F.col("doc_id"))).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        mn, mx = F.min(col).over(wall), F.max(col).over(wall)
        norm = F.when(mx == mn, F.lit(0.0)).otherwise(
            F.round((F.col(col) - mn) / (mx - mn), 6)
        )
        return df.select("doc_id", norm.alias(out))

    bm = global_topk_ranked(
        bm25_scores_indexed(spark, sf_dir), [F.desc("bm25"), F.asc("doc_id")], _RRF_N, "krank"
    ).select("doc_id", "bm25")
    bmn = _minmax(bm, "bm25", "bnorm")

    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("probe_vec")
    )
    sims = (
        emb.join(docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi")
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("sim"),
        )
    )
    vec = global_topk_ranked(
        sims, [F.desc("sim"), F.asc("doc_id")], _RRF_N, "vrank"
    ).select("doc_id", "sim")
    vecn = _minmax(vec, "sim", "vnorm")

    fused = bmn.join(vecn, ["doc_id"], "full_outer").select(
        "doc_id",
        F.round(
            _LIN_ALPHA * F.coalesce(F.col("bnorm"), F.lit(0.0))
            + round(1 - _LIN_ALPHA, 6) * F.coalesce(F.col("vnorm"), F.lit(0.0)),
            6,
        ).alias("fused_score"),
    )
    return global_topk_ranked(fused, [F.desc("fused_score"), F.asc("doc_id")], 10)


# ---------------------------------------------------------------------------
# Filtered ANN: metadata predicate + exact kNN. The predicate is a plain
# Column filter, so Catalyst pushes it into the parquet scan (PushedFilters)
# — the corpus is pre-shrunk BEFORE any vector math, the pre-filter
# strategy every vector DB uses for selective metadata.
# ---------------------------------------------------------------------------
@query(
    "filtered_knn_search",
    oracle="""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe_vec
      FROM embeddings WHERE vec_id < 3
    ), scored AS (
      SELECT p.probe_id, e.vec_id AS neighbor_id, e.label,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.probe_vec), 6) AS score
      FROM embeddings e, p
      WHERE e.label IN (1, 3) AND e.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, label, score, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
                                        ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K8", "K7", "E4", "C10", "B1"),
)
def filtered_knn_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    scored = (
        emb.filter(F.col("label").isin(1, 3))
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# CDC merge: apply a sequenced change log (upsert/delete) onto a base
# vector table, last-wins per key. The log here is derived
# deterministically from the fixtures (so the oracle can replay it):
#   seq 0: base       = vec_id < 400
#   seq 1: deletes    = vec_id % 7 == 0
#   seq 2: upserts    = vec_id in [350, 450) with the vector doubled
# One union + one (key)-partitioned window — the standard Spark shape for
# applying a day's worth of index deltas; at scale the window exchange is
# the only shuffle and partitions by the merge key.
# ---------------------------------------------------------------------------
@query(
    "vector_upsert_merge",
    oracle="""
    WITH log AS (
      SELECT vec_id, 0 AS seq, 'upsert' AS op, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 400
      UNION ALL
      SELECT vec_id, 1, 'delete', NULL
      FROM embeddings WHERE vec_id < 400 AND vec_id % 7 = 0
      UNION ALL
      SELECT vec_id, 2, 'upsert', list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0)
      FROM embeddings WHERE vec_id >= 350 AND vec_id < 450
    ),
    latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY seq DESC) AS rn
        FROM log
      ) WHERE rn = 1
    )
    SELECT vec_id, CAST(seq AS BIGINT) AS version, round(v[1], 6) AS v0
    FROM latest
    WHERE op <> 'delete' AND vec_id < 60
    """,
    operators=("G1", "E1", "D3", "K6", "C1"),
)
def vector_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    v_dbl = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.filter(F.col("vec_id") < 400).select(
        "vec_id", F.lit(0).alias("seq"), F.lit("upsert").alias("op"), v_dbl.alias("v")
    )
    deletes = emb.filter((F.col("vec_id") < 400) & (F.col("vec_id") % 7 == 0)).select(
        "vec_id",
        F.lit(1).alias("seq"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("array<double>").alias("v"),
    )
    upserts = emb.filter(F.col("vec_id").between(350, 449)).select(
        "vec_id",
        F.lit(2).alias("seq"),
        F.lit("upsert").alias("op"),
        F.transform(v_dbl, lambda x: x * 2.0).alias("v"),
    )
    log = base.unionByName(deletes).unionByName(upserts)
    w = Window.partitionBy("vec_id").orderBy(F.desc("seq"))
    latest = log.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        latest.filter((F.col("op") != "delete") & (F.col("vec_id") < 60))
        .select(
            "vec_id",
            F.col("seq").cast("bigint").alias("version"),
            F.round(F.element_at("v", 1), 6).alias("v0"),
        )
    )


# ---------------------------------------------------------------------------
# Radius (range) search: every neighbor with cosine >= tau — the "find
# all sufficiently similar" form of K8 (vector DBs expose it alongside
# top-k). Same broadcast-probes shape as exact kNN, but the threshold
# filter replaces the rank window entirely: no global sort, no window
# exchange — the scan emits qualifying pairs and is done. The cheapest
# possible plan at 100 TB.
# ---------------------------------------------------------------------------
_RADIUS_TAU = 0.25


@query(
    "radius_search",
    oracle=f"""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe_vec
      FROM embeddings WHERE vec_id < 3
    )
    SELECT p.probe_id, e.vec_id AS neighbor_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.probe_vec), 6) AS score
    FROM embeddings e, p
    WHERE e.vec_id <> p.probe_id
      AND round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.probe_vec), 6) >= {_RADIUS_TAU}
    """,
    operators=("K8", "K7", "C10", "B2"),
)
def radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    return (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("score"),
        )
        .filter(F.col("score") >= _RADIUS_TAU)
    )


# ---------------------------------------------------------------------------
# Diversified top-k: at most 2 results per label per probe, best 6
# overall — the "don't return 10 near-identical hits" result shaping
# every retrieval UI applies. Two stacked windows: the per-(probe,label)
# cap runs on (probe, label)-partitioned exchanges, and the global
# per-probe rank then sees <= 2*n_labels rows per probe — tiny.
# ---------------------------------------------------------------------------
@query(
    "diversified_topk_search",
    oracle="""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe_vec
      FROM embeddings WHERE vec_id < 3
    ), scored AS (
      SELECT p.probe_id, e.vec_id AS neighbor_id, e.label,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.probe_vec), 6) AS score
      FROM embeddings e, p
      WHERE e.vec_id <> p.probe_id
    ), capped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id, label
                                     ORDER BY score DESC, neighbor_id) AS label_rank
        FROM scored
      ) WHERE label_rank <= 2
    )
    SELECT probe_id, neighbor_id, label, score,
           CAST(label_rank AS BIGINT) AS label_rank, rank
    FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
                                        ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
      FROM capped
    ) WHERE rank <= 6
    """,
    operators=("K8", "E4", "E1", "C10"),
)
def diversified_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    scored = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("score"),
        )
    )
    wl = Window.partitionBy("probe_id", "label").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    capped = (
        scored.withColumn("label_rank", F.row_number().over(wl))
        .filter(F.col("label_rank") <= 2)
    )
    wg = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        capped.withColumn("label_rank", F.col("label_rank").cast("bigint"))
        .withColumn("rank", F.row_number().over(wg).cast("bigint"))
        .filter(F.col("rank") <= 6)
    )


# ---------------------------------------------------------------------------
# Two-stage retrieval: cheap first-stage recall (exact/ANN top-C) then a
# cross-encoder RERANK of only C pairs per probe. The encoder here is a
# deterministic stub (this container ships no model runtime — see
# operators/multimodal.py for the same convention); the Spark-side
# plumbing is the production shape: candidates shrink BEFORE the Python
# crossing, pairs batch through mapInPandas (Arrow), the model loads
# once per worker, and the final window re-ranks C rows per probe. Swap
# `_stub_cross_encoder` for a real model and nothing else changes.
# ---------------------------------------------------------------------------
_RERANK_C = 30


def _stub_cross_encoder(probe_ids, neighbor_ids, first_scores) -> "np.ndarray":
    """Deterministic fake: monotone-ish in the retrieval score plus a
    pair-keyed md5 perturbation (never Python hash(), which is
    process-salted). Linear on purpose — pure double arithmetic replays
    bit-identically in the DuckDB oracle (a sigmoid would hinge the
    value compare on libm exp() ULP parity); a real model returns
    arbitrary floats through the identical plumbing."""
    import hashlib

    import numpy as np

    noise = np.array(
        [
            (int(hashlib.md5(f"{p}:{n}".encode()).hexdigest()[:3], 16) % 1000)
            / 1000.0
            - 0.5
            for p, n in zip(probe_ids, neighbor_ids)
        ]
    )
    return 8.0 * np.asarray(first_scores, dtype=np.float64) + 0.2 * noise


@query(
    "rerank_cross_encoder_topk",
    # The md5-noise linear stub replays exactly in SQL, so even the
    # rerank stage has a value-level oracle (cosine round-6 parity is
    # proven by knn_exact_cosine; the hex digits decode via strpos).
    oracle="""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
      FROM embeddings WHERE vec_id < 3
    ), cands AS (
      SELECT probe_id, neighbor_id, score FROM (
        SELECT s.*, row_number() OVER (PARTITION BY probe_id
                     ORDER BY score DESC, neighbor_id) AS rn
        FROM (
          SELECT p.probe_id, e.vec_id AS neighbor_id,
                 round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pv), 6)
                   AS score
          FROM embeddings e, p WHERE e.vec_id <> p.probe_id
        ) s
      ) WHERE rn <= 30
    ), scored AS (
      SELECT probe_id, neighbor_id,
             round(8.0 * score + 0.2 * ((((strpos('0123456789abcdef', substr(md5(probe_id || ':' || neighbor_id), 1, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(md5(probe_id || ':' || neighbor_id), 2, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(probe_id || ':' || neighbor_id), 3, 1)) - 1)) % 1000) / 1000.0 - 0.5), 6) AS ce_score
      FROM cands
    )
    SELECT probe_id, neighbor_id, ce_score, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                  ORDER BY ce_score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K8", "E4", "L2", "L5"),
)
def rerank_cross_encoder_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from cloudvectordb_spark.operators.vector_ops import exact_knn

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    cands = exact_knn(emb, probes, k=_RERANK_C).select(
        "probe_id", "neighbor_id", "score"
    )

    def run(batches):
        for pdf in batches:
            out = pdf[["probe_id", "neighbor_id"]].copy()
            ce = _stub_cross_encoder(
                pdf["probe_id"].to_numpy(),
                pdf["neighbor_id"].to_numpy(),
                pdf["score"].to_numpy(),
            )
            # half-up to match the oracle's round() (np.round is half-even)
            out["ce_score"] = np.sign(ce) * np.floor(np.abs(ce) * 1e6 + 0.5) / 1e6
            yield out

    scored = cands.mapInPandas(
        run, schema="probe_id long, neighbor_id long, ce_score double"
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("ce_score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# Faceted search: alongside the top-k hits, a search engine returns per-
# facet candidate counts so the UI can offer drill-downs. Facets here =
# the label column over the exact top-50 candidate pool per probe:
# (count, best rank, best score) per (probe, label). One broadcast-probe
# kNN + one keyed aggregate — the facet agg rides the candidate pool,
# never re-scans the corpus.
# ---------------------------------------------------------------------------
_FACET_C = 50


@query(
    "search_with_facets",
    oracle=f"""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
      FROM embeddings WHERE vec_id < 3
    ),
    cand AS (
      SELECT probe_id, vec_id, label, score, rnk FROM (
        SELECT p.probe_id, e.vec_id, e.label,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pv), 6)
                 AS score,
               row_number() OVER (PARTITION BY p.probe_id
                 ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pv), 6) DESC,
                          e.vec_id) AS rnk
        FROM embeddings e, p WHERE e.vec_id <> p.probe_id
      ) WHERE rnk <= {_FACET_C}
    )
    SELECT probe_id, label,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(min(rnk) AS BIGINT) AS best_rank,
           max(score) AS best_score
    FROM cand GROUP BY probe_id, label
    """,
    operators=("K8", "E4", "D1", "C2"),
)
def search_with_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.operators.vector_ops import exact_knn

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    cand = exact_knn(emb, probes, k=_FACET_C).join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
    )
    return cand.groupBy("probe_id", "label").agg(
        F.count("*").cast("bigint").alias("n_candidates"),
        F.min("rank").cast("bigint").alias("best_rank"),
        F.max("score").alias("best_score"),
    )


# ---------------------------------------------------------------------------
# MMR diversified rerank: greedy maximal-marginal-relevance over the
# exact top-C candidates — pick the most relevant, then repeatedly the
# candidate maximizing lambda*rel - (1-lambda)*max_sim_to_selected.
# The standard redundancy killer for retrieval-augmented pipelines
# (near-duplicate chunks crowd out coverage). Fixed K=5 greedy steps,
# every comparison key rounded half-up at 6 dp, ties broken by id — so
# the whole greedy unrolls into DuckDB CTEs (selection state carried
# forward per step, the kmeans_det recipe applied to a ranking loop).
# Scale shape: candidate generation is the broadcast-probe kNN; the
# greedy runs per-probe over C<=10 rows inside one grouped-map task.
# ---------------------------------------------------------------------------
_MMR_C = 10  # candidate pool per probe
_MMR_K = 5  # diversified picks
_MMR_LAMBDA = 0.7


def _mmr_oracle_sql() -> str:
    steps = []
    prev = "selall1"
    for t in range(2, _MMR_K + 1):
        steps.append(f"""
    pen{t} AS (
      SELECT c.probe_id, c.vec_id, any_value(c.rel) AS rel, max(s.s) AS pen
      FROM cand c
      JOIN sim s ON s.probe_id = c.probe_id AND s.i = c.vec_id
      JOIN {prev} q ON q.probe_id = s.probe_id AND q.vec_id = s.j
      WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                        WHERE x.probe_id = c.probe_id AND x.vec_id = c.vec_id)
      GROUP BY c.probe_id, c.vec_id
    ),
    sel{t} AS (
      SELECT probe_id, vec_id, {t} AS rank, mmr AS mmr_score FROM (
        SELECT probe_id, vec_id,
               round({_MMR_LAMBDA}*rel - {round(1 - _MMR_LAMBDA, 6)}*pen, 6) AS mmr,
               row_number() OVER (PARTITION BY probe_id
                 ORDER BY round({_MMR_LAMBDA}*rel - {round(1 - _MMR_LAMBDA, 6)}*pen, 6) DESC,
                          vec_id) AS rn
        FROM pen{t}
      ) WHERE rn = 1
    ),
    selall{t} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM sel{t})""")
        prev = f"selall{t}"
    step_block = ",".join(steps)
    return f"""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
      FROM embeddings WHERE vec_id < 3
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cand AS (
      SELECT probe_id, vec_id, rel FROM (
        SELECT p.probe_id, e.vec_id,
               round(list_cosine_similarity(e.v, p.pv), 6) AS rel,
               row_number() OVER (PARTITION BY p.probe_id
                 ORDER BY round(list_cosine_similarity(e.v, p.pv), 6) DESC,
                          e.vec_id) AS rn
        FROM e, p WHERE e.vec_id <> p.probe_id
      ) WHERE rn <= {_MMR_C}
    ),
    sim AS (
      SELECT a.probe_id, a.vec_id AS i, b.vec_id AS j,
             round(list_cosine_similarity(ea.v, eb.v), 6) AS s
      FROM cand a
      JOIN cand b ON a.probe_id = b.probe_id AND a.vec_id <> b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
    ),
    selall1 AS (
      SELECT probe_id, vec_id, 1 AS rank, rel AS mmr_score FROM (
        SELECT probe_id, vec_id, rel,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY rel DESC, vec_id) AS rn
        FROM cand
      ) WHERE rn = 1
    ),{step_block}
    SELECT probe_id, CAST(rank AS BIGINT) AS rank,
           vec_id AS neighbor_id, mmr_score
    FROM {prev}
    """


def _mmr_greedy_kernel(lam: float, k: int):
    """The per-probe greedy MMR selection as a grouped-map kernel,
    shared by mmr_rerank_topk and mmr_diversified_search. Input pdf:
    (probe_id, neighbor_id, rel, embedding); output: k rows of
    (probe_id, rank, neighbor_id, mmr_score). All comparison keys
    rounded half-up at 6 dp so the greedy replays exactly as the
    CTE-unrolled DuckDB oracle."""
    import numpy as np
    import pandas as pd

    mu = round(1 - lam, 6)

    def _hu6(x):
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        ids = pdf["neighbor_id"].to_numpy()
        rel = pdf["rel"].to_numpy(dtype=np.float64)
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = _hu6(m @ m.T)
        # ids ascend, so argmax's first-match IS the (key DESC, id ASC)
        # tie-break row_number() picks on the oracle side
        chosen = [int(np.argmax(rel))]
        scores = [rel[chosen[0]]]
        for _t in range(1, min(k, len(ids))):
            pen = sims[:, chosen].max(axis=1)
            mmr = _hu6(lam * rel - mu * pen)
            mmr[chosen] = -np.inf
            nxt = int(np.argmax(mmr))
            chosen.append(nxt)
            scores.append(mmr[nxt])
        return pd.DataFrame(
            {
                "probe_id": pdf["probe_id"].iloc[0],
                "rank": np.arange(1, len(chosen) + 1, dtype=np.int64),
                "neighbor_id": ids[chosen],
                "mmr_score": scores,
            }
        )

    return greedy


@query(
    "mmr_rerank_topk",
    oracle=_mmr_oracle_sql(),
    operators=("K8", "E4", "L3", "K12"),
)
def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR over the exact top-10, lambda=0.7, 5 picks per probe
    (see block comment; oracle = the same greedy unrolled into CTEs)."""
    from cloudvectordb_spark.operators.vector_ops import exact_knn

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    cands = exact_knn(emb, probes, k=_MMR_C).select(
        "probe_id", "neighbor_id", F.col("score").alias("rel")
    )
    with_vec = cands.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    return with_vec.groupBy("probe_id").applyInPandas(
        _mmr_greedy_kernel(_MMR_LAMBDA, _MMR_K),
        "probe_id bigint, rank bigint, neighbor_id bigint, mmr_score double",
    )


# ---------------------------------------------------------------------------
# Filtered ANN, POST-filter strategy: over-fetch an unfiltered top-C,
# then apply the metadata predicate and re-rank. The complement of
# filtered_knn_search's pre-filter: pre-filter wins when the predicate
# is selective (scan shrinks first), post-filter wins when the predicate
# is broad and the index (here: the capped top-C candidate generation)
# is much cheaper than a filtered full scan. C/k = the over-fetch ratio
# that bounds the recall loss; both strategies share one output shape so
# they are directly comparable.
# ---------------------------------------------------------------------------
_POSTFILTER_C = 40


@query(
    "filtered_knn_postfilter",
    oracle=f"""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe_vec
      FROM embeddings WHERE vec_id < 3
    ), scored AS (
      SELECT p.probe_id, e.vec_id AS neighbor_id, e.label,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.probe_vec), 6) AS score
      FROM embeddings e, p
      WHERE e.vec_id <> p.probe_id
    ), overfetch AS (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY score DESC, neighbor_id) AS crank
      FROM scored QUALIFY crank <= {_POSTFILTER_C}
    )
    SELECT probe_id, neighbor_id, label, score,
           CAST(row_number() OVER (PARTITION BY probe_id
                                   ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
    FROM overfetch
    WHERE label IN (1, 3)
    QUALIFY rank <= 10
    """,
    operators=("K8", "K7", "E4", "C10", "B4"),
)
def filtered_knn_postfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    scored = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("score"),
        )
    )
    wc = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    overfetch = (
        scored.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= _POSTFILTER_C)
        .drop("crank")
    )
    refiltered = overfetch.filter(F.col("label").isin(1, 3))
    return (
        refiltered.withColumn("rank", F.row_number().over(wc).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# Hybrid search, weighted linear fusion: min-max normalize each
# retriever's capped top-N scores onto [0, 1] and blend 0.5/0.5 — the
# score-interpolation alternative to rank-based RRF (sensitive to score
# calibration where RRF is not; both ship because both are standard).
# Same scale shape as RRF: two TakeOrdered top-N lists, 1-row stats
# broadcasts, and windows only over <= N fused rows.
# ---------------------------------------------------------------------------
_FUSE_ALPHA = 0.5


@query(
    "hybrid_linear_fusion",
    oracle=f"""
    WITH {_BM25_SCORED_SQL},
    bm AS (
      SELECT doc_id, bm25,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS krank
      FROM scored QUALIFY krank <= {_RRF_N}
    ),
    bstats AS (SELECT min(bm25) AS bmin, max(bm25) AS bmax FROM bm),
    vec AS (
      SELECT d.vec_id AS doc_id,
             round(list_cosine_similarity(CAST(d.embedding AS DOUBLE[]),
                                          CAST(p.embedding AS DOUBLE[])), 6) AS sim,
             row_number() OVER (
               ORDER BY round(list_cosine_similarity(CAST(d.embedding AS DOUBLE[]),
                                                     CAST(p.embedding AS DOUBLE[])), 6) DESC,
                        d.vec_id) AS vrank
      FROM embeddings d
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) p
      WHERE d.vec_id IN (SELECT doc_id FROM documents)
      QUALIFY vrank <= {_RRF_N}
    ),
    vstats AS (SELECT min(sim) AS vmin, max(sim) AS vmax FROM vec),
    fused AS (
      SELECT COALESCE(bm.doc_id, vec.doc_id) AS doc_id,
             round({_FUSE_ALPHA} * COALESCE((bm.bm25 - bstats.bmin)
                     / nullif(bstats.bmax - bstats.bmin, 0), 0)
                 + {1 - _FUSE_ALPHA} * COALESCE((vec.sim - vstats.vmin)
                     / nullif(vstats.vmax - vstats.vmin, 0), 0), 6) AS fused_score
      FROM bm FULL OUTER JOIN vec USING (doc_id)
      CROSS JOIN bstats CROSS JOIN vstats
    )
    SELECT doc_id, fused_score,
           CAST(row_number() OVER (ORDER BY fused_score DESC, doc_id) AS BIGINT) AS rank
    FROM fused QUALIFY rank <= 10
    """,
    operators=("K8", "K7", "E4", "C1", "C2", "F2", "H6"),
)
def hybrid_linear_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    from cloudvectordb_spark.ranking import _zero

    # min/max ride each bounded top-N list as a constant-partition
    # window (round 15): the old separate agg + crossJoin referenced
    # each list twice, re-deriving its full corpus-pass lineage per
    # reference. On the full-outer join a row missing from one side has
    # NULL score AND NULL stats — norm coalesces to 0 either way, so
    # the fused values are unchanged.
    wb = Window.partitionBy(_zero(F.col("doc_id"))).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    bm = (
        global_topk_ranked(
            bm25_scores_indexed(spark, sf_dir),
            [F.desc("bm25"), F.asc("doc_id")],
            _RRF_N,
            "krank",
        )
        .select("doc_id", "bm25")
        .withColumn("bmin", F.min("bm25").over(wb))
        .withColumn("bmax", F.max("bm25").over(wb))
    )

    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("probe_vec")
    )
    sims = (
        emb.join(docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi")
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("sim"),
        )
    )
    vec = (
        global_topk_ranked(
            sims, [F.desc("sim"), F.asc("doc_id")], _RRF_N, "vrank"
        )
        .select("doc_id", "sim")
        .withColumn("vmin", F.min("sim").over(wb))
        .withColumn("vmax", F.max("sim").over(wb))
    )

    norm_b = F.coalesce(
        (F.col("bm25") - F.col("bmin"))
        / F.nullif(F.col("bmax") - F.col("bmin"), F.lit(0)),
        F.lit(0.0),
    )
    norm_v = F.coalesce(
        (F.col("sim") - F.col("vmin"))
        / F.nullif(F.col("vmax") - F.col("vmin"), F.lit(0)),
        F.lit(0.0),
    )
    fused = bm.join(vec, ["doc_id"], "full_outer").select(
        "doc_id",
        F.round(
            _FUSE_ALPHA * norm_b + (1 - _FUSE_ALPHA) * norm_v, 6
        ).alias("fused_score"),
    )
    return global_topk_ranked(
        fused, [F.desc("fused_score"), F.asc("doc_id")], 10
    )


# ---------------------------------------------------------------------------
# Multilingual retrieval: BM25 where EVERY corpus statistic (N, avgdl,
# df) is computed per language shard — the routing shape of a
# multilingual index, where a query scores against its language's
# statistics rather than corpus-global ones. All aggregates and the
# final top-3 window are keyed by lang, so each language's work is an
# independent partition at any corpus size.
# ---------------------------------------------------------------------------
@query(
    "bm25_per_lang_search",
    oracle=f"""
    WITH tok AS (
      SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT lang, doc_id, count(*) AS dl FROM tok GROUP BY lang, doc_id),
    stats AS (SELECT lang, count(*) AS n_docs, avg(dl) AS avgdl FROM dl GROUP BY lang),
    tf AS (
      SELECT lang, doc_id, term, count(*) AS tf FROM tok
      WHERE term IN {_TERMS_SQL} GROUP BY lang, doc_id, term
    ),
    df AS (SELECT lang, term, count(DISTINCT doc_id) AS df FROM tok
           WHERE term IN {_TERMS_SQL} GROUP BY lang, term),
    scored AS (
      SELECT tf.lang, tf.doc_id,
             round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN df ON df.lang = tf.lang AND df.term = tf.term
      JOIN dl ON dl.lang = tf.lang AND dl.doc_id = tf.doc_id
      JOIN stats ON stats.lang = tf.lang
      GROUP BY tf.lang, tf.doc_id
    )
    SELECT lang, doc_id, bm25,
           CAST(row_number() OVER (PARTITION BY lang
                                   ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 3
    """,
    operators=("K2", "E4", "D1", "C1", "D3"),
)
def bm25_per_lang_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", "doc_id", F.explode(TX.tokens("text")).alias("term")
    )
    dl = tok.groupBy("lang", "doc_id").agg(F.count("*").alias("dl"))
    stats = dl.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qt = tok.filter(F.col("term").isin(*_QUERY_TERMS))
    tf = qt.groupBy("lang", "doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = qt.groupBy("lang", "term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    contrib = (
        tf.join(df_, ["lang", "term"])
        .join(dl, ["lang", "doc_id"])
        .join(F.broadcast(stats), "lang")
        .select(
            "lang",
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * F.col("tf")
                * (_K1 + 1.0)
                / (
                    F.col("tf")
                    + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("lang", "doc_id").agg(
        F.round(F.sum("c"), 6).alias("bm25")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
    )


# ---------------------------------------------------------------------------
# K8/E4 result diversification: Maximal Marginal Relevance over the
# vector top-N. The DISTRIBUTED part scores the corpus and builds the
# bounded candidate pool (top-20 by cosine); the greedy 5-pick selection
# runs inside ONE grouped-map task over those 20 rows — the same shared
# kernel as mmr_rerank_topk (since round 7; the original driver-side
# collect-then-loop form is gone — no registered query collects and
# iterates on the driver). Fully deterministic (rounded scores, vec_id
# tiebreak), so the oracle unrolls the 5 greedy rounds into CTE stages
# like the BPE/Lloyd loops.
# ---------------------------------------------------------------------------
_MMRD_POOL = 20
_MMRD_K = 5
_MMRD_LAMBDA = 0.7


def _mmr_oracle() -> str:
    rel = (
        "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pv), 6)"
    )
    parts = [
        f"""pool AS (
      SELECT vec_id, rel FROM (
        SELECT e.vec_id, {rel} AS rel,
               row_number() OVER (ORDER BY {rel} DESC, e.vec_id) AS rn
        FROM embeddings e
        CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS pv
                    FROM embeddings WHERE vec_id = 0) p
        WHERE e.vec_id <> 0
      ) WHERE rn <= {_MMRD_POOL}
    )""",
        """psim AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                          CAST(eb.embedding AS DOUBLE[])), 6) AS sim
      FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
    )""",
        """sel1 AS (
      SELECT vec_id, rel AS mmr FROM pool ORDER BY rel DESC, vec_id LIMIT 1
    )""",
        "acc1 AS (SELECT vec_id FROM sel1)",
    ]
    lam = _MMRD_LAMBDA
    for r in range(2, _MMRD_K + 1):
        parts.append(
            f"""sel{r} AS (
      SELECT p.vec_id,
             round({lam} * p.rel - {round(1 - lam, 1)} * max(ps.sim), 6) AS mmr
      FROM pool p
      JOIN psim ps ON ps.a_id = p.vec_id
                  AND ps.b_id IN (SELECT vec_id FROM acc{r - 1})
      WHERE p.vec_id NOT IN (SELECT vec_id FROM acc{r - 1})
      GROUP BY p.vec_id, p.rel
      ORDER BY mmr DESC, p.vec_id LIMIT 1
    )"""
        )
        parts.append(
            f"acc{r} AS (SELECT vec_id FROM acc{r - 1} UNION ALL SELECT vec_id FROM sel{r})"
        )
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS pick_order, vec_id, mmr FROM sel{r}"
        for r in range(1, _MMRD_K + 1)
    )
    return "WITH " + ",\n    ".join(parts) + f"\n    SELECT * FROM ({union})"


@query(
    "mmr_diversified_search",
    oracle=_mmr_oracle(),
    operators=("K8", "K7", "E4", "C9"),
)
def mmr_diversified_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR rerank of the probe-0 top-20: pick 5 greedily maximizing
    lambda*rel - (1-lambda)*max_sim_to_selected (rounded 6, vec_id
    tiebreak — the oracle replays the rounds as CTE stages).

    Since round 7 this runs on the SAME grouped-map kernel as
    mmr_rerank_topk (r6 verdict #6): candidate generation is the
    distributed broadcast-probe top-k, and the bounded 20-row greedy
    executes inside one executor task — no driver-side collect-then-
    loop anywhere in a registered query path."""
    from cloudvectordb_spark.operators.vector_ops import exact_knn

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") == 0)
    cands = exact_knn(emb, probes, k=_MMRD_POOL).select(
        "probe_id", "neighbor_id", F.col("score").alias("rel")
    )
    with_vec = cands.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    picked = with_vec.groupBy("probe_id").applyInPandas(
        _mmr_greedy_kernel(_MMRD_LAMBDA, _MMRD_K),
        "probe_id bigint, rank bigint, neighbor_id bigint, mmr_score double",
    )
    return picked.select(
        F.col("rank").alias("pick_order"),
        F.col("neighbor_id").alias("vec_id"),
        F.col("mmr_score").alias("mmr"),
    )


# ---------------------------------------------------------------------------
# K2/K8 related-documents: for every doc in the slice, the top-3 most
# similar OTHER docs by TF-IDF term overlap — the "related articles"
# table a retrieval product precomputes. Candidates come from the
# shared-term equi-join (docs sharing no term can't score), so the
# candidate volume is term-bounded, never all-pairs; hot terms are the
# skew axis and AQE splits them. Deterministic scoring (rounded before
# the rank cut) => full value oracle.
# ---------------------------------------------------------------------------
_RELATED_LIM = 100


@query(
    "related_docs_tfidf_topk",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < {_RELATED_LIM}
      ) GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
    w AS (
      SELECT tf.doc_id, tf.tok,
             tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)) AS wt
      FROM tf JOIN df USING (tok) CROSS JOIN n
    ),
    pair AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             round(sum(a.wt * b.wt), 6) AS score
      FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT a_id, b_id, score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY a_id
                                   ORDER BY score DESC, b_id) AS rank
      FROM pair
    ) WHERE rank <= 3 AND score > 0
    """,
    operators=("K2", "K8", "E4", "C1", "D1"),
)
def related_docs_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _RELATED_LIM)
    tf = (
        docs.select("doc_id", F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = tf.select("doc_id").distinct().count()  # bounded slice
    w = tf.join(df, "tok").select(
        "doc_id",
        "tok",
        (F.col("tf") * F.log(F.lit(float(n)) / F.col("df"))).alias("wt"),
    )
    a = w.select(F.col("doc_id").alias("a_id"), "tok", F.col("wt").alias("wa"))
    b = w.select(F.col("doc_id").alias("b_id"), "tok", F.col("wt").alias("wb"))
    pair = (
        a.join(b, "tok")
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")), 6).alias("score"))
    )
    wr = Window.partitionBy("a_id").orderBy(F.desc("score"), F.asc("b_id"))
    return (
        pair.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter((F.col("rank") <= 3) & (F.col("score") > 0))
    )


# ---------------------------------------------------------------------------
# Incremental postings maintenance (round 7): the update story for the
# persisted inverted index above. New documents arrive as a delta batch;
# delta postings are built from the BATCH ONLY (work proportional to new
# docs, never a corpus rescan) and merge into the base by (term, doc_id)
# count addition — postings are a mergeable artifact exactly like the
# CM/HLL sketch tables. The query proves the contract the maintenance
# job ships with: merged(base + delta) == full-rebuild, per query term,
# value-for-value. Split is md5-deterministic so DuckDB replays the
# whole check; the equality columns carry the invariant, the per-term
# stats carry real recomputed content.
# ---------------------------------------------------------------------------
@query(
    "postings_incremental_merge",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'e' AS in_base,
             unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    base_p AS (
      SELECT term, doc_id, count(*) AS tf FROM tok
      WHERE in_base AND term IN {_TERMS_SQL} GROUP BY term, doc_id
    ),
    delta_p AS (
      SELECT term, doc_id, count(*) AS tf FROM tok
      WHERE NOT in_base AND term IN {_TERMS_SQL} GROUP BY term, doc_id
    ),
    merged AS (
      SELECT term, doc_id, CAST(sum(tf) AS BIGINT) AS tf FROM (
        SELECT * FROM base_p UNION ALL SELECT * FROM delta_p
      ) GROUP BY term, doc_id
    ),
    full_p AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM tok
      WHERE term IN {_TERMS_SQL} GROUP BY term, doc_id
    ),
    ddocs AS (SELECT DISTINCT doc_id FROM delta_p)
    SELECT m.term,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(m.tf) AS BIGINT) AS total_tf,
           bool_and(m.tf = f.tf) AS merged_equals_full,
           CAST(count(*) FILTER (
             WHERE m.doc_id NOT IN (SELECT doc_id FROM ddocs)
           ) AS BIGINT) AS n_docs_untouched_by_delta
    FROM merged m
    JOIN full_p f ON f.term = m.term AND f.doc_id = m.doc_id
    GROUP BY m.term
    """,
    operators=("K2", "D1", "G1", "H4"),
)
def postings_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    in_base = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) >= "e"
    )
    tok = docs.select(
        "doc_id",
        in_base.alias("in_base"),
        F.explode(TX.tokens("text")).alias("term"),
    ).filter(F.col("term").isin(*_QUERY_TERMS))
    base_p = (
        tok.filter("in_base").groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    )
    delta_p = (
        tok.filter(~F.col("in_base"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    merged = (
        base_p.unionAll(delta_p)
        .groupBy("term", "doc_id")
        .agg(F.sum("tf").cast("bigint").alias("tf"))
    )
    full_p = (
        tok.groupBy("term", "doc_id").agg(F.count("*").cast("bigint").alias("tf"))
    )
    delta_docs = delta_p.select("doc_id").distinct().withColumn("_d", F.lit(True))
    return (
        merged.join(
            full_p.select(
                F.col("term"), F.col("doc_id"), F.col("tf").alias("full_tf")
            ),
            ["term", "doc_id"],
        )
        .join(F.broadcast(delta_docs), "doc_id", "left")
        .groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("tf").cast("bigint").alias("total_tf"),
            F.min(F.col("tf") == F.col("full_tf")).alias("merged_equals_full"),
            F.count(F.when(F.col("_d").isNull(), 1))
            .cast("bigint")
            .alias("n_docs_untouched_by_delta"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental maintenance for the v4 fuzzy artifacts (round 8,
# continuation): term_variants is keyed by TERM only, so the delta work
# is variants for delta-NEW terms plus a df counter merge (sum across
# shards) — never a re-derivation over the existing vocabulary. The
# query proves the contract per term: shard-merged df == full-corpus
# df, the merged-vocabulary variant expansion matches the rebuild
# (n_variants from the same _deletion_variants the index builder and
# the SQL twin both apply), and the new-term accounting is exact. At
# 100 TB the vocabulary is the tiny side; this keeps fuzzy lookup
# maintainable by counter merges while postings merge by tf addition.
# ---------------------------------------------------------------------------
@query(
    "variants_incremental_merge",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'e' AS in_base,
             unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    base_v AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
               WHERE in_base GROUP BY term),
    delta_v AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
                WHERE NOT in_base GROUP BY term),
    merged AS (
      SELECT term, CAST(sum(df) AS BIGINT) AS df FROM (
        SELECT * FROM base_v UNION ALL SELECT * FROM delta_v
      ) GROUP BY term
    ),
    full_v AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df_full
               FROM tok GROUP BY term),
    mv AS (
      SELECT DISTINCT term, var FROM (
        SELECT term, term AS var FROM merged
        UNION ALL
        SELECT term, substr(term, 1, i - 1) || substr(term, i + 1) AS var
        FROM merged, LATERAL unnest(range(1, length(term) + 1)) AS t(i)
      )
    ),
    nv AS (SELECT term, CAST(count(*) AS BIGINT) AS n_variants
           FROM mv GROUP BY term)
    SELECT m.term, m.df, f.df_full,
           m.df = f.df_full AS merged_df_equals_full,
           nv.n_variants,
           m.term NOT IN (SELECT term FROM base_v) AS term_new_in_delta
    FROM merged m JOIN full_v f USING (term) JOIN nv USING (term)
    """,
    operators=("K2", "H1", "H8", "G1", "D1"),
)
def variants_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    in_base = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) >= "e"
    )
    tok = docs.select(
        "doc_id",
        in_base.alias("in_base"),
        F.explode(TX.tokens("text")).alias("term"),
    )
    base_v = (
        tok.filter("in_base")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    delta_v = (
        tok.filter(~F.col("in_base"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    merged = (
        base_v.unionByName(delta_v)
        .groupBy("term")
        .agg(F.sum("df").cast("bigint").alias("df"))
    )
    full_v = tok.groupBy("term").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df_full")
    )
    nv = (
        merged.select(
            "term", F.explode(_deletion_variants("term")).alias("var")
        )
        .distinct()
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("n_variants"))
    )
    base_terms = base_v.select("term").withColumn("_b", F.lit(True))
    return (
        merged.join(full_v, "term")
        .join(nv, "term")
        .join(F.broadcast(base_terms), "term", "left")
        .select(
            "term",
            "df",
            "df_full",
            (F.col("df") == F.col("df_full")).alias(
                "merged_df_equals_full"
            ),
            "n_variants",
            F.col("_b").isNull().alias("term_new_in_delta"),
        )
    )


# ---------------------------------------------------------------------------
# Filtered-ANN strategy planner (round 8, late): the canonical vector-DB
# planner decision. A metadata predicate can be applied BEFORE scoring
# (prefilter: the filter reaches the parquet scan, every surviving row
# is scored exactly — right when the predicate is selective, because the
# scan shrinks and IVF cell pruning would throw away most survivors
# anyway) or AFTER candidate generation (ivf_postfilter: the persisted
# cell layout prunes the scan to nprobe cells, the predicate drops
# candidates in-flight — right when the predicate keeps most rows, so
# cells stay full and recall is unaffected in expectation). The choice
# is a pure cost call; this operator makes it from measured selectivity
# (one scalar aggregate — at 100 TB the same number comes free from
# catalog column stats) and the DuckDB oracle REPLAYS THE DECISION: all
# four (case x strategy) arms exist in SQL, each gated on the same
# selectivity threshold, so a drifted engine-side decision hash-fails.
# ---------------------------------------------------------------------------
_ADAPTIVE_SEL_THRESHOLD = 0.3


def _adaptive_oracle() -> str:
    from cloudvectordb_spark.operators.pipeline import (
        _IVF_ROUNDS,
        _KM_CTES,
        _KM_D2,
    )

    t = _ADAPTIVE_SEL_THRESHOLD
    arms = []
    for case, pred in (("selective", "label = 1"), ("broad", "label >= 1")):
        for strat, src, gate in (
            ("prefilter", f"pre_{case}", f"(SELECT s FROM sel_{case}) < {t}"),
            (
                "ivf_postfilter",
                f"post_{case}",
                f"(SELECT s FROM sel_{case}) >= {t}",
            ),
        ):
            arms.append(
                f"SELECT '{case}' AS case_name, '{strat}' AS strategy,"
                f" probe_id, neighbor_id, score, rank FROM {src}"
                f" WHERE {gate}"
            )
    arm_sql = "\n    UNION ALL ".join(arms)

    def topk(src: str) -> str:
        return f"""(
      SELECT probe_id, neighbor_id, score,
             CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY score DESC, neighbor_id) AS rank
        FROM {src}
      ) WHERE rank <= 10
    )"""

    return f"""
    WITH {_KM_CTES},
    sel_selective AS (
      SELECT avg(CASE WHEN label = 1 THEN 1.0 ELSE 0.0 END) AS s
      FROM embeddings),
    sel_broad AS (
      SELECT avg(CASE WHEN label >= 1 THEN 1.0 ELSE 0.0 END) AS s
      FROM embeddings),
    p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
          FROM embeddings WHERE vec_id < 3),
    probe_cells AS (
      SELECT DISTINCT cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c WHERE e.vec_id < 3
      ) WHERE rn <= 2
    ),
    pre_scored_selective AS (
      SELECT p.probe_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          p.pv), 6) AS score
      FROM embeddings e, p
      WHERE e.label = 1 AND e.vec_id <> p.probe_id),
    pre_scored_broad AS (
      SELECT p.probe_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          p.pv), 6) AS score
      FROM embeddings e, p
      WHERE e.label >= 1 AND e.vec_id <> p.probe_id),
    post_scored_selective AS (
      SELECT p.probe_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.v, p.pv), 6) AS score
      FROM km_assign a JOIN embeddings l ON a.vec_id = l.vec_id, p
      WHERE a.cid IN (SELECT cid FROM probe_cells)
        AND l.label = 1 AND a.vec_id <> p.probe_id),
    post_scored_broad AS (
      SELECT p.probe_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.v, p.pv), 6) AS score
      FROM km_assign a JOIN embeddings l ON a.vec_id = l.vec_id, p
      WHERE a.cid IN (SELECT cid FROM probe_cells)
        AND l.label >= 1 AND a.vec_id <> p.probe_id),
    pre_selective AS {topk("pre_scored_selective")},
    pre_broad AS {topk("pre_scored_broad")},
    post_selective AS {topk("post_scored_selective")},
    post_broad AS {topk("post_scored_broad")}
    {arm_sql}
    """


@query(
    "filtered_knn_adaptive",
    oracle=_adaptive_oracle(),
    operators=("K8", "K9", "E4", "B1"),
)
def filtered_knn_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two predicate regimes through the planner in one result:
    'selective' (label = 1, ~9%) must route to prefilter; 'broad'
    (label >= 1, ~90%) must route to ivf_postfilter. The strategy
    column is part of the oracle-checked output — the DECISION is
    gated, not just the rows."""
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        index_centroids,
        read_ivf_index,
    )
    from cloudvectordb_spark.operators.vector_ops import (
        exact_knn,
        exact_knn_fast,
    )

    emb = load(spark, sf_dir, "embeddings")
    preds = {
        "selective": F.col("label") == 1,
        "broad": F.col("label") >= 1,
    }
    # one bounded driver scalar per case (catalog column stats at scale)
    sel_row = emb.agg(
        F.count("*").alias("n"),
        *[
            F.count(F.when(p, 1)).alias(name)
            for name, p in preds.items()
        ],
    ).collect()[0]

    path = ensure_ivf_index(spark, sf_dir)
    vectors, _ = read_ivf_index(spark, path)
    cents = index_centroids(spark, path)
    probe_rows = (
        emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    )
    cell_ids = sorted(
        {c for r in probe_rows for c in nearest_cells_py(r.embedding, cents, 2)}
    )
    probes_local = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in probe_rows],
        schema="vec_id long, embedding array<float>",
    )

    parts = []
    for name, pred in preds.items():
        selectivity = sel_row[name] / sel_row["n"]
        if selectivity < _ADAPTIVE_SEL_THRESHOLD:
            strategy = "prefilter"
            res = exact_knn(emb.filter(pred), probes_local, k=10)
        else:
            strategy = "ivf_postfilter"
            cand = vectors.filter(
                F.col("centroid_id").isin(cell_ids)
            ).filter(pred)
            res = exact_knn_fast(cand, probes_local, k=10)
        parts.append(
            res.select(
                F.lit(name).alias("case_name"),
                F.lit(strategy).alias("strategy"),
                "probe_id",
                "neighbor_id",
                "score",
                "rank",
            )
        )
    return parts[0].unionByName(parts[1])


# ---------------------------------------------------------------------------
# Typo-tolerant term lookup via symmetric deletes (SymSpell scheme,
# public algorithm: Garbe, 2012). Candidate generation is an EQUI-JOIN
# on deletion variants — for max edit distance 1, two words are within
# distance 1 only if deleting ≤1 char from each yields a common string.
# The dictionary side (|vocab| × (len+1) variant rows) is built from
# the persisted index's term_meta, so lookup never rescans the corpus
# and never does an all-pairs vocabulary × query edit-distance pass —
# the property that keeps fuzzy matching viable on a 100 TB corpus
# vocabulary. A final levenshtein() filter discards the dist-2 pairs
# the variant join admits (delete-one-from-each false positives);
# plain Levenshtein, so transpositions (dist 2) are out of scope.
# _fuzzy_hits is the shared candidate+verify stage; fuzzy_term_search
# ranks the top-3 per query term, bm25_fuzzy_search takes the rank-1
# correction per term and feeds it straight into the indexed BM25
# scorer — typo-tolerant keyword search end to end.
# ---------------------------------------------------------------------------

_FUZZY_QUERY_TERMS = (
    "data",   # exact hit, dist 0
    "dta",    # deletion typo of "data"
    "scann",  # insertion typo of "scan"
    "joib",   # substitution typo of "join"
    "merg",   # deletion typo of "merge"
    "sow",    # multi-match: dist 1 to both "slow" and "row"
    "xqzw",   # no match — absent from output (inner join)
)


def _deletion_variants(name: str):
    """array<string>: the term itself plus every single-character
    deletion, deduplicated (array_union) — repeated letters collapse,
    e.g. "small" yields "smal" once."""
    return F.array_union(
        F.array(F.col(name)),
        F.expr(
            f"transform(sequence(1, length({name})), i -> "
            f"concat(substring({name}, 1, i-1), "
            f"substring({name}, i+1, length({name}))))"
        ),
    )


def _fuzzy_hits(
    spark: SparkSession, sf_dir: str, qterms: tuple[str, ...]
) -> DataFrame:
    """(query_term, term, dist, df): vocabulary terms within
    Levenshtein distance 1 of each query term, candidates from the
    symmetric-deletion-variant equi-join against the PERSISTED variant
    artifact (index v4) — built once with the index, var-sorted row
    groups, never re-derived per query."""
    dict_var = text_index_variant_frame(spark, sf_dir)
    q = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in qterms])).alias(
            "query_term"
        )
    )
    q_var = q.select(
        "query_term",
        F.explode(_deletion_variants("query_term")).alias("var"),
    ).distinct()
    cand = (
        F.broadcast(q_var)
        .join(dict_var, "var")
        .select("query_term", "term", "df")
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("query_term", "term").cast("bigint")
    ).filter(F.col("dist") <= 1)


@query(
    "fuzzy_term_search",
    oracle="""
    WITH q(query_term) AS (
      VALUES ('data'), ('dta'), ('scann'), ('joib'), ('merg'),
             ('sow'), ('xqzw')
    ),
    vocab AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY term
    ),
    dict_var AS (
      SELECT DISTINCT term, var FROM (
        SELECT term, term AS var FROM vocab
        UNION ALL
        SELECT term, substr(term, 1, i - 1) || substr(term, i + 1) AS var
        FROM vocab, LATERAL unnest(range(1, length(term) + 1)) AS t(i)
      )
    ),
    q_var AS (
      SELECT DISTINCT query_term, var FROM (
        SELECT query_term, query_term AS var FROM q
        UNION ALL
        SELECT query_term,
               substr(query_term, 1, i - 1) || substr(query_term, i + 1)
                 AS var
        FROM q, LATERAL unnest(range(1, length(query_term) + 1)) AS t(i)
      )
    ),
    cand AS (
      SELECT DISTINCT query_term, term
      FROM q_var JOIN dict_var USING (var)
    ),
    hits AS (
      SELECT query_term, term,
             CAST(levenshtein(query_term, term) AS BIGINT) AS dist
      FROM cand
      WHERE levenshtein(query_term, term) <= 1
    ),
    ranked AS (
      SELECT query_term, term, dist, df,
             CAST(row_number() OVER (
               PARTITION BY query_term
               ORDER BY dist, df DESC, term) AS BIGINT) AS rank
      FROM hits JOIN vocab USING (term)
    )
    SELECT query_term, term, dist, df, rank
    FROM ranked WHERE rank <= 3
    """,
    operators=("H3", "H1", "H8", "C1", "E1", "K2"),
)
def fuzzy_term_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant dictionary lookup, index-served: for each query
    term, the ≤3 vocabulary terms within Levenshtein distance 1,
    ranked (distance, df desc, term). Candidates come from a
    symmetric-deletion-variant equi-join (see module comment) against
    term_meta's vocabulary — the df integers are the index's own, so a
    stale index would hash-mismatch the oracle's raw-text recount.

    Plan shape at scale: the query side is a handful of literal rows —
    its variants broadcast; the dictionary-variant side streams through
    the join with no corpus access at all (vocabulary-sized, built once
    with the index). The levenshtein verify runs on the candidate pairs
    only — a few per query term — never vocabulary × queries."""
    hits = _fuzzy_hits(spark, sf_dir, _FUZZY_QUERY_TERMS)
    w = Window.partitionBy("query_term").orderBy(
        "dist", F.col("df").desc(), "term"
    )
    return (
        hits.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("rank") <= 3)
        .select("query_term", "term", "dist", "df", "rank")
    )


_FUZZY_BM25_TYPOS = ("dta", "qery", "fast")  # -> data, query, fast


@query(
    "bm25_fuzzy_search",
    # Full pipeline replay: the oracle re-derives the corrections
    # (variant join + levenshtein + rank-1) AND the BM25 scoring from
    # raw text — a wrong correction changes the scored term set and
    # hash-mismatches, not just a wrong score.
    oracle=f"""
    WITH q(query_term) AS (VALUES ('dta'), ('qery'), ('fast')),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    vocab AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS vdf
      FROM tok GROUP BY term
    ),
    dict_var AS (
      SELECT DISTINCT term, var FROM (
        SELECT term, term AS var FROM vocab
        UNION ALL
        SELECT term, substr(term, 1, i - 1) || substr(term, i + 1) AS var
        FROM vocab, LATERAL unnest(range(1, length(term) + 1)) AS t(i)
      )
    ),
    q_var AS (
      SELECT DISTINCT query_term, var FROM (
        SELECT query_term, query_term AS var FROM q
        UNION ALL
        SELECT query_term,
               substr(query_term, 1, i - 1) || substr(query_term, i + 1)
                 AS var
        FROM q, LATERAL unnest(range(1, length(query_term) + 1)) AS t(i)
      )
    ),
    corrected AS (
      SELECT DISTINCT term FROM (
        SELECT query_term, term,
               row_number() OVER (
                 PARTITION BY query_term
                 ORDER BY levenshtein(query_term, term), vdf DESC, term
               ) AS rn
        FROM (SELECT DISTINCT query_term, term
              FROM q_var JOIN dict_var USING (var)) c
        JOIN vocab USING (term)
        WHERE levenshtein(query_term, term) <= 1
      ) WHERE rn = 1
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN (SELECT term FROM corrected) GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tok
      WHERE term IN (SELECT term FROM corrected) GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
             AS rank
    FROM scored QUALIFY rank <= 20
    """,
    operators=("H3", "K2", "E4", "F2", "C2"),
)
def bm25_fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant keyword search, end to end and index-served: each
    (possibly misspelled) query term is corrected to its rank-1
    dictionary match (distance, df desc, term — the fuzzy_term_search
    ordering), and the corrected term set feeds the same indexed BM25
    scoring join as bm25_keyword_search — all in ONE plan, no
    driver-side collect of the corrections.

    Plan shape at scale: correction touches only vocabulary-sized
    term_meta variants (query side broadcast); the corrected term set
    (≤ |query| rows) broadcasts into the postings join, so the postings
    scan stays the only corpus-sized input, exactly as in the
    clean-query path. On these fixtures the typos correct to
    ("data", "query", "fast"), so a correct pipeline must reproduce
    bm25_keyword_search's exact top-20 — and the oracle re-derives the
    corrections itself rather than assuming them."""
    postings, dl, stats, _meta = text_index_frames(spark, sf_dir)
    hits = _fuzzy_hits(spark, sf_dir, _FUZZY_BM25_TYPOS)
    w = Window.partitionBy("query_term").orderBy(
        "dist", F.col("df").desc(), "term"
    )
    corrected = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("term")
        .distinct()
    )
    tf = postings.join(F.broadcast(corrected), "term")
    scored = _bm25_from_parts(tf, dl, stats)
    return global_topk_ranked(
        scored, [F.desc("bm25"), F.asc("doc_id")], 20
    )


# ---------------------------------------------------------------------------
# Batched multi-query serving (round 8, continuation): a serving tier
# never runs one Spark job per user query — it drains a QUERY BATCH in
# one plan. The batch is a (query_id, term) table broadcast into the
# same postings join every single-query path uses: the postings scan is
# read ONCE for the union of all query terms (one pushed IN-list), the
# per-(query, doc) scores reduce map-side, and the per-query top-k is a
# window keyed by query_id — so driver/job overhead and the corpus scan
# amortize over the whole batch instead of multiplying with it. Per
# query the arithmetic is exactly _bm25_from_parts (df from term_meta,
# same integers), so batch slot 0 reproduces bm25_keyword_search
# bit-for-bit (pytest-pinned).
# ---------------------------------------------------------------------------
_BATCH_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (0, _QUERY_TERMS),
    (1, ("merge", "stream")),
    (2, ("vector", "window", "scan")),
    (3, ("join", "hash", "sort")),
)
_BATCH_K = 10


def _batch_scoring_join(
    tf: DataFrame,
    qt: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    term_meta: DataFrame,
) -> DataFrame:
    """The shared batch BM25 join: term-pruned postings × broadcast
    query table × broadcast df/stats, reduced per (query_id, doc_id).
    Same arithmetic and rounding as _bm25_from_parts, df from term_meta
    (identical integers to the inline countDistinct)."""
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (_K1 + 1.0)) / (
        F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(term_meta.select("term", "df")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
    )


def bm25_scores_batch(
    spark: SparkSession,
    sf_dir: str,
    batch: tuple[tuple[int, tuple[str, ...]], ...] = _BATCH_QUERIES,
) -> DataFrame:
    """(query_id, doc_id, bm25) for every query in the batch, from ONE
    postings scan whose pushed IN-list is the union of query terms."""
    postings, dl, stats, term_meta = text_index_frames(spark, sf_dir)
    all_terms = sorted({t for _, ts in batch for t in ts})
    qt = spark.createDataFrame(
        [(qid, t) for qid, ts in batch for t in ts],
        schema="query_id int, term string",
    )
    tf = postings.filter(F.col("term").isin(*all_terms))
    return _batch_scoring_join(tf, qt, dl, stats, term_meta)


def serve_query_batch(
    spark: SparkSession, sf_dir: str, qt: DataFrame, k: int = _BATCH_K
) -> DataFrame:
    """Score an ARBITRARY (query_id, term) query table against the
    persisted index — the foreachBatch body of the continuous serving
    job (streaming/jobs.run_query_serving). The batch's distinct terms
    are collected (bounded by the batch's own vocabulary — query
    batches are small by construction, never corpus-sized) so the
    postings scan still gets a pushed IN-list per micro-batch."""
    terms = sorted(
        r.term for r in qt.select("term").distinct().collect()
    )
    if not terms:
        return qt.sparkSession.createDataFrame(
            [], schema="query_id int, doc_id long, bm25 double, rank long"
        )
    postings, dl, stats, term_meta = text_index_frames(spark, sf_dir)
    tf = postings.filter(F.col("term").isin(*terms))
    scored = _batch_scoring_join(
        tf, qt.select("query_id", "term"), dl, stats, term_meta
    )
    return batch_topk_per_query(scored, k)


def _batch_qt_sql() -> str:
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, ts in _BATCH_QUERIES for t in ts
    )
    return f"qt(query_id, term) AS (VALUES {rows})"


@query(
    "bm25_batch_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    {_batch_qt_sql()},
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
           WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
    scored AS (
      SELECT qt.query_id, tf.doc_id,
             round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN qt USING (term)
      JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, bm25,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY bm25 DESC, doc_id) AS BIGINT)
             AS rank
    FROM scored QUALIFY rank <= {_BATCH_K}
    """,
    operators=("K2", "E4", "D1", "C2"),
)
def bm25_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query for a 4-query batch, served in ONE plan from
    the persisted index. The per-query rank window partitions by
    query_id — bounded per partition by that query's matching docs, the
    same shape ivf_topk_search uses per probe; at scale the batch
    dimension is the parallelism, and AQE splits a skewed query's
    partition if one term matches half the corpus."""
    return batch_topk_per_query(bm25_scores_batch(spark, sf_dir), _BATCH_K)


def batch_topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k over (query_id, doc_id, bm25) batch scores —
    shared by the registered 4-query demo and the scale probe."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "bm25", "rank")
    )


# ---------------------------------------------------------------------------
# Sharded text serving with GLOBALLY-CONSISTENT BM25 (round 12): the
# text-side mirror of VectorIndex.search_sharded. S independent
# postings shards each generate candidates LOCALLY, but every score is
# computed under the MERGED global statistics, so per-doc scores are
# bit-identical to the monolithic index's:
#
#   n_docs = Σ n_docs_s          (exact bigint sum)
#   avgdl  = Σ dl_sum_s / n_docs (exact bigint sums, ONE float divide —
#                                 dl totals < 2^53 are exact in double,
#                                 so this equals the monolithic avg)
#   df(t)  = Σ df_s(t)           (docs are disjoint across shards)
#
# tf and dl are doc-local (a doc's postings live entirely on its
# shard), so shard-local scoring under merged (n_docs, avgdl, df)
# reproduces the full-corpus BM25 exactly — which makes the k*S merge
# LOSSLESS: every global top-k doc ranks <= k in its own shard (same
# invariant sharded_knn_merge pins for vectors). The registered
# `bm25_batch_sharded` query is value-oracled against the SAME oracle
# as the monolithic `bm25_batch_topk`, proving hash-identity.
# ---------------------------------------------------------------------------
def sharded_text_frames(spark: SparkSession, sf_dir: str, n_shards: int):
    """Per-shard (postings, dl, stats_row, term_meta) for the S-shard
    index, session-cached like text_index_frames. The one-row stats
    are collected once (they are immutable artifacts)."""
    from cloudvectordb_spark.cache import artifact_cache, session_key

    paths = ensure_sharded_text_index(spark, sf_dir, n_shards)

    def build():
        out = []
        for p in paths:
            postings = spark.read.parquet(f"{p}/postings")
            dl = spark.read.parquet(f"{p}/dl").persist()
            srow = spark.read.parquet(f"{p}/stats").collect()[0]
            term_meta = spark.read.parquet(f"{p}/term_meta")
            out.append((postings, dl, srow, term_meta))
        return out

    return artifact_cache(
        ("sharded_text_frames", tuple(paths), session_key(spark)), build
    )


def sharded_bm25_topk_batch(
    spark: SparkSession,
    sf_dir: str,
    batch: tuple = _BATCH_QUERIES,
    k: int = _BATCH_K,
    n_shards: int = 2,
    concurrent: bool = True,
) -> DataFrame:
    """Scatter-gather BM25 batch serving over S postings shards.

    Router side (driver): merge the S one-row shard stats by exact
    integer algebra, and merge per-term df for the batch's union terms
    in one tiny vocab-pruned job — the merged model is O(query terms),
    never corpus-sized, and ships to each shard as a broadcast local
    relation. Shard side: the shard's postings scan (pushed IN-list of
    union terms) scores under the merged model and returns its bounded
    local top-k (<= Q*k rows — the scatter-gather message, never the
    candidates). Gather: one window over <= Q*k*S rows. With
    ``concurrent=True`` the S shard jobs submit from S driver threads
    (stages overlap; on a fleet each shard owns executors). Results
    are identical either way — the merge is order-insensitive."""
    shards = sharded_text_frames(spark, sf_dir, n_shards)
    return _sharded_bm25_from_frames(spark, shards, batch, k, concurrent)


def sharded_bm25_topk_batch_paths(
    spark: SparkSession,
    shard_paths: list,
    batch: tuple,
    k: int = _BATCH_K,
    concurrent: bool = True,
) -> DataFrame:
    """`sharded_bm25_topk_batch` over EXPLICIT shard tree paths,
    frames read fresh (no fingerprint cache) — the serving surface for
    MUTABLE fleets maintained by ``append_sharded_text_artifacts``,
    where the merged model must be recomputed from the shards' current
    stats on every call. Each shard root is fenced against an
    in-flight append's brief apply window first
    (``_await_stable_text_root``), so the frames always come from a
    consistent artifact generation.

    Round 16: with ``concurrent=True`` the per-shard setup (fence wait
    + one-row stats job + parquet schema reads) submits from S driver
    threads, like the gather legs already did — the fleet pays
    max(per-shard setup) instead of the S× sequential sum of tiny-job
    floors (guide §2.6). Frames and merged models are identical; the
    shard order is preserved by pool.map."""

    def _setup(p: str):
        _await_stable_text_root(p)
        srow = spark.read.parquet(f"{p}/stats").collect()[0]
        return (
            spark.read.parquet(f"{p}/postings"),
            spark.read.parquet(f"{p}/dl"),
            srow,
            # merged tier view: exact df across base + delta-vocab
            # tiers (tier-free roots return the raw base scan);
            # the stats row already in hand skips the view's own
            # one-row avgdl job (round 15)
            read_term_meta_merged(spark, p, avgdl_now=float(srow.avgdl or 0.0)),
        )

    if concurrent and len(shard_paths) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(shard_paths)) as pool:
            shards = list(pool.map(_setup, shard_paths))
    else:
        shards = [_setup(p) for p in shard_paths]
    return _sharded_bm25_from_frames(spark, shards, batch, k, concurrent)


def _ensure_tiered_text_root(spark: SparkSession, sf_dir: str) -> str:
    """Build-once: a MUTATED text root — corpus (doc_id < 400) built,
    then the 400..499 delta INCREMENTALLY appended, leaving a real
    delta-vocab term_meta/term_variants tier in place (the append is
    below `_TEXT_META_FOLD_DEPTH`, so no fold hides it). Serving this
    root exercises the full round-14 mutable-path stack — append
    protocol, O(1) freshness fence, tiered merged view — under the
    driver's value oracle, not just pytest."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from cloudvectordb_spark.cache import build_lock, source_tag

    src = os.path.join(sf_dir, "documents.parquet")
    fp = hashlib.md5(
        f"tiered-v7|{source_tag(src)}".encode()
    ).hexdigest()[:16]
    root = os.path.join(
        tempfile.gettempdir(), "cloudvectordb_texttier", fp
    )
    if os.path.exists(os.path.join(root, "_DONE")):
        return root
    with build_lock(root):
        if os.path.exists(os.path.join(root, "_DONE")):
            return root
        docs = load(spark, sf_dir, "documents")
        build = f"{root}.build{os.getpid()}_{uuid.uuid4().hex[:8]}"
        _write_text_artifacts(
            spark, docs.filter(F.col("doc_id") < 400), build
        )
        append_text_artifacts(
            spark,
            docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 500)),
            build,
        )
        open(os.path.join(build, "_DONE"), "w").close()
        try:
            os.rename(build, root)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)
    return root


@query(
    "bm25_batch_tiered_append",
    # IDENTICAL scoring to bm25_batch_topk restricted to doc_id < 500:
    # the served root is corpus(<400) + an INCREMENTAL append of
    # 400..499, so exact stats/df algebra makes the appended tree's
    # scores bit-equal to an index built over the union — DuckDB
    # replays the union index directly. This puts the round-14 mutable
    # stack (append protocol, freshness fence, tiered term_meta merged
    # view) under the driver's value oracle on every round.
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE doc_id < 500
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    {{qt}},
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
           WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
    scored AS (
      SELECT qt.query_id, tf.doc_id,
             round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN qt USING (term)
      JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, bm25,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY bm25 DESC, doc_id) AS BIGINT)
             AS rank
    FROM scored QUALIFY rank <= {_BATCH_K}
    """.replace("{qt}", _batch_qt_sql()),
    operators=("K2", "E4", "D1", "C2", "G1"),
)
def bm25_batch_tiered_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 mutable-path serving: batch BM25 over a root that was BUILT
    at doc_id<400 and incrementally APPENDED to 500 — the term_meta
    tier is live, so df comes through the tiered merged view and the
    stats row through the exact append algebra. Value-identical to an
    index built over the union corpus (the oracle)."""
    root = _ensure_tiered_text_root(spark, sf_dir)
    return sharded_bm25_topk_batch_paths(
        spark, [root], _BATCH_QUERIES, _BATCH_K
    ).select("query_id", "doc_id", "bm25", "rank")


def _sharded_bm25_from_frames(
    spark: SparkSession,
    shards: list,
    batch: tuple,
    k: int,
    concurrent: bool,
) -> DataFrame:
    all_terms = sorted({t for _, ts in batch for t in ts})
    qt_local = spark.createDataFrame(
        [(qid, t) for qid, ts in batch for t in ts],
        schema="query_id int, term string",
    )
    # merged global stats: exact bigint sums, one float division
    # (an empty shard — S > corpus clusters — contributes 0/0 nulls)
    n_docs = sum(int(s.n_docs or 0) for _, _, s, _ in shards)
    avgdl = sum(int(s.dl_sum or 0) for _, _, s, _ in shards) / max(1, n_docs)
    stats_local = spark.createDataFrame(
        [(n_docs, avgdl)], schema="n_docs bigint, avgdl double"
    )
    # merged df for the union terms only: S vocab-pruned meta scans
    # reduced to <= |terms| rows — collected once, shipped to every
    # shard plan as a local relation
    metas = [
        tm.select("term", "df").filter(F.col("term").isin(*all_terms))
        for _, _, _, tm in shards
    ]
    u = metas[0]
    for m in metas[1:]:
        u = u.unionByName(m)

    # Single-shard fast path (round 15): with S=1 the shard-local top-k
    # IS the global top-k (same ordering keys), so the scatter-gather
    # collect + local-relation re-window is pure overhead — serve the
    # whole thing as ONE lazy plan: the vocab-pruned meta frame rides
    # the plan as the broadcast side (same ≤ |terms| rows, same df
    # integers — S=1 needs no cross-shard summing) and the one scoring
    # job replaces a df-merge collect, a per-shard top-k collect, and a
    # local-relation re-window. Bit-identical: the gather path's
    # float(r.bm25) driver round-trip is exact for doubles and the
    # re-window re-derives the same rank.
    if len(shards) == 1:
        postings, dl, _, _ = shards[0]
        tf = postings.filter(F.col("term").isin(*all_terms))
        scored = _batch_scoring_join(tf, qt_local, dl, stats_local, u)
        return (
            batch_topk_per_query(scored, k)
            .withColumn("shard", F.lit(0).cast("int"))
            .select("query_id", "doc_id", "bm25", "shard", "rank")
        )

    df_rows = [
        (r.term, r.df)
        for r in u.groupBy("term").agg(F.sum("df").alias("df")).collect()
    ]
    meta_local = spark.createDataFrame(
        df_rows, schema="term string, df bigint"
    )

    def gather(i: int):
        postings, dl, _, _ = shards[i]
        tf = postings.filter(F.col("term").isin(*all_terms))
        scored = _batch_scoring_join(tf, qt_local, dl, stats_local, meta_local)
        return [
            (int(r.query_id), int(r.doc_id), float(r.bm25), i)
            for r in batch_topk_per_query(scored, k).collect()
        ]

    if concurrent and len(shards) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(shards)) as pool:
            shard_rows = list(pool.map(gather, range(len(shards))))
    else:
        shard_rows = [gather(i) for i in range(len(shards))]
    gathered = spark.createDataFrame(
        [t for part in shard_rows for t in part],
        schema="query_id int, doc_id long, bm25 double, shard int",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    return (
        gathered.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "bm25", "shard", "rank")
    )


@query(
    "bm25_batch_sharded",
    # Sharding with merged global stats is LOSSLESS and score-exact, so
    # the oracle is EXACTLY the monolithic bm25_batch_topk oracle — the
    # sharded engine path must hash-match the full-corpus computation.
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    {_batch_qt_sql()},
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
           WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
    scored AS (
      SELECT qt.query_id, tf.doc_id,
             round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN qt USING (term)
      JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, bm25,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY bm25 DESC, doc_id) AS BIGINT)
             AS rank
    FROM scored QUALIFY rank <= {_BATCH_K}
    """,
    operators=("K2", "E4", "D1", "C2", "D4"),
)
def bm25_batch_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4-query batch served from TWO independent postings shards
    under merged global stats — hash-identical to the monolithic
    bm25_batch_topk (same oracle). See sharded_bm25_topk_batch."""
    return sharded_bm25_topk_batch(
        spark, sf_dir, _BATCH_QUERIES, _BATCH_K, n_shards=2
    ).select("query_id", "doc_id", "bm25", "rank")


@query(
    "prefix_autocomplete",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
           WHERE term LIKE 's%' GROUP BY term)
    SELECT term, df,
           CAST(row_number() OVER (ORDER BY df DESC, term) AS BIGINT)
             AS rank
    FROM df QUALIFY rank <= 10
    """,
    operators=("K2", "B5", "F2"),
)
def prefix_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-box autocomplete: top-10 completions of prefix 's' by
    document frequency, served ENTIRELY from the vocabulary-sized
    term_meta artifact — the StartsWith filter pushes into its parquet
    scan, no postings or raw-text read at all. At 100 TB term_meta is
    the (tiny) dictionary shard; autocomplete never touches the corpus.
    The oracle recomputes df from raw text."""
    return prefix_completions(spark, sf_dir, "s", 10)


# ---------------------------------------------------------------------------
# Two-stage cascade retrieval (round 8, continuation): the standard
# candidate-generation -> rerank serving pipeline as ONE plan. Stage 1
# is the cheap retriever (indexed BM25 — postings-only, pushed IN-list)
# producing a bounded candidate list; stage 2 rescoring touches ONLY the
# candidates' embeddings (the candidate ids broadcast into the embedding
# join), so the expensive scorer's cost is O(candidates), never
# O(corpus). hybrid_rrf_search FUSES two full rankings; the cascade is
# the other canonical topology — stage 2 REPLACES stage 1's order and
# only ever sees stage 1's survivors.
# ---------------------------------------------------------------------------
_CASCADE_N = 50


@query(
    "cascade_rerank_search",
    oracle=f"""
    WITH {_BM25_SCORED_SQL},
    cand AS (
      SELECT doc_id, bm25,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
               AS krank
      FROM scored QUALIFY krank <= {_CASCADE_N}
    ),
    rescored AS (
      SELECT c.doc_id, c.bm25,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(p.embedding AS DOUBLE[])), 6)
               AS cos_sim
      FROM cand c
      JOIN embeddings e ON e.vec_id = c.doc_id
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) p
    )
    SELECT doc_id, bm25, cos_sim,
           CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS BIGINT)
             AS rank
    FROM rescored QUALIFY rank <= 10
    """,
    operators=("K2", "K8", "K7", "E4", "C1", "C2"),
)
def cascade_rerank_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 by SECOND-stage (embedding cosine) score over the BM25
    top-50 candidate set — candidates without an embedding row drop
    (inner join), matching the oracle."""
    emb = load(spark, sf_dir, "embeddings")
    cand = global_topk_ranked(
        bm25_scores_indexed(spark, sf_dir),
        [F.desc("bm25"), F.asc("doc_id")],
        _CASCADE_N,
        "krank",
    ).select("doc_id", "bm25")
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("probe_vec")
    )
    rescored = (
        emb.join(F.broadcast(cand), emb.vec_id == cand.doc_id)
        .crossJoin(F.broadcast(probe))
        .select(
            "doc_id",
            "bm25",
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("cos_sim"),
        )
    )
    return global_topk_ranked(
        rescored, [F.desc("cos_sim"), F.asc("doc_id")], 10
    )


@query(
    "text_index_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term)
    SELECT CAST(stats.n_docs AS BIGINT) AS n_docs,
           round(stats.avgdl, 6) AS avgdl,
           CAST((SELECT count(*) FROM df) AS BIGINT) AS vocab_size,
           CAST((SELECT count(*) FROM tf) AS BIGINT) AS n_postings,
           CAST((SELECT max(df) FROM df) AS BIGINT) AS max_df
    FROM stats
    """,
    operators=("K2", "D2"),
)
def text_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index monitoring surface: one row of collection statistics
    served ENTIRELY from the persisted artifacts (stats + term_meta +
    postings counts — no raw-text read); the oracle recomputes every
    number from documents, so this also VERIFIES the artifacts agree
    with the corpus they index. The operational health check a serving
    tier runs after every compaction."""
    postings, _dl, stats, term_meta = text_index_frames(spark, sf_dir)
    vocab = term_meta.agg(
        F.count("*").cast("bigint").alias("vocab_size"),
        F.max("df").cast("bigint").alias("max_df"),
    )
    np_ = postings.agg(F.count("*").cast("bigint").alias("n_postings"))
    return (
        stats.select(
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round("avgdl", 6).alias("avgdl"),
        )
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(np_))
        .select("n_docs", "avgdl", "vocab_size", "n_postings", "max_df")
    )


# ---------------------------------------------------------------------------
# Batched HYBRID serving (round 8, continuation): the full hybrid-RRF
# pipeline for a whole query batch in ONE plan. Per query q: BM25
# top-N from ONE shared postings scan (bm25_scores_batch), cosine
# top-N from ONE shared BLAS probe-batch (exact_knn_fast — all probe
# vectors in one matmul per Arrow batch), reciprocal-rank fusion per
# (query, doc), per-query top-10. Probe vector for query q is the
# embedding with vec_id == q (deterministic, oracle-replayable). The
# expensive sides amortize exactly like their single-retriever twins
# (18.5x text / 5.5x vector at 1M, BASELINE.md); fusion itself joins
# two <= Q*N-row lists. exact_knn_fast excludes the probe row itself,
# so the oracle's vector arm carries d.vec_id <> query_id.
# ---------------------------------------------------------------------------
def _rrf_batch_vec_sql() -> str:
    ids = ", ".join(str(qid) for qid, _ in _BATCH_QUERIES)
    return f"""
    p AS (
      SELECT CAST(vec_id AS INTEGER) AS query_id,
             vec_id, CAST(embedding AS DOUBLE[]) AS pv
      FROM embeddings WHERE vec_id IN ({ids})
    ),
    vec AS (
      SELECT query_id, doc_id, vrank FROM (
        SELECT p.query_id, d.vec_id AS doc_id,
               CAST(row_number() OVER (
                 PARTITION BY p.query_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(d.embedding AS DOUBLE[]), p.pv), 6) DESC,
                          d.vec_id) AS BIGINT) AS vrank
        FROM embeddings d CROSS JOIN p
        WHERE d.vec_id IN (SELECT doc_id FROM documents)
          AND d.vec_id <> p.vec_id
      ) WHERE vrank <= {_RRF_N}
    )"""


@query(
    "hybrid_rrf_batch",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    {_batch_qt_sql()},
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
           WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
    scored AS (
      SELECT qt.query_id, tf.doc_id,
             round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN qt USING (term)
      JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY qt.query_id, tf.doc_id
    ),
    bm AS (
      SELECT query_id, doc_id, krank FROM (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY bm25 DESC, doc_id) AS BIGINT)
                 AS krank
        FROM scored
      ) WHERE krank <= {_RRF_N}
    ),
    {_rrf_batch_vec_sql()},
    fused AS (
      SELECT COALESCE(bm.query_id, vec.query_id) AS query_id,
             COALESCE(bm.doc_id, vec.doc_id) AS doc_id,
             round(COALESCE(1.0 / (60 + bm.krank), 0)
                 + COALESCE(1.0 / (60 + vec.vrank), 0), 6) AS rrf_score
      FROM bm FULL OUTER JOIN vec
        ON bm.query_id = vec.query_id AND bm.doc_id = vec.doc_id
    )
    SELECT query_id, doc_id, rrf_score,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id) AS BIGINT)
             AS rank
    FROM fused QUALIFY rank <= 10
    """,
    operators=("K2", "K8", "K7", "E4", "C1", "C2", "C4", "L2"),
)
def hybrid_rrf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    bm = batch_topk_per_query(
        bm25_scores_batch(spark, sf_dir), _RRF_N
    ).select("query_id", "doc_id", F.col("rank").alias("krank"))

    probes = emb.filter(
        F.col("vec_id").isin([qid for qid, _ in _BATCH_QUERIES])
    ).select("vec_id", "embedding")
    corpus = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    vec = exact_knn_fast(corpus, probes, k=_RRF_N).select(
        F.col("probe_id").cast("int").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("vrank"),
    )

    fused = (
        bm.join(vec, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.coalesce(1.0 / (60 + F.col("krank")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("vrank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rrf_score", "rank")
    )


# ---------------------------------------------------------------------------
# Boolean keyword search (round 8, continuation): MUST / MUST_NOT
# operators over the same persisted postings. MUST terms score as
# usual; docs containing ANY MUST_NOT term are removed by an anti-join
# against a second pushed-IN-list postings scan (exclusion-term
# postings only — never a corpus scan). The classic "-term" search
# operator, index-served end to end.
# ---------------------------------------------------------------------------
_BOOL_MUST = ("data", "query")
_BOOL_MUST_NOT = ("stream",)


@query(
    "bm25_boolean_search",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ('{"', '".join(_BOOL_MUST)}') GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
           WHERE term IN ('{"', '".join(_BOOL_MUST)}') GROUP BY term),
    excluded AS (
      SELECT DISTINCT doc_id FROM tok
      WHERE term IN ('{"', '".join(_BOOL_MUST_NOT)}')
    ),
    scored AS (
      SELECT tf.doc_id,
             round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      WHERE tf.doc_id NOT IN (SELECT doc_id FROM excluded)
      GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
             AS rank
    FROM scored QUALIFY rank <= 20
    """,
    operators=("K2", "C5", "E4", "F2", "C2"),
)
def bm25_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 for MUST=('data','query') excluding docs containing
    MUST_NOT=('stream',) — both term sets read as pushed IN-lists from
    the persisted postings; exclusion is a left-anti join on the (tiny)
    excluded-doc-id set. df comes from the inline countDistinct over
    the MUST postings (bit-identical to term_meta)."""
    scored = bm25_boolean_scores(
        spark, sf_dir, _BOOL_MUST, _BOOL_MUST_NOT
    )
    return global_topk_ranked(scored, [F.desc("bm25"), F.asc("doc_id")], 20)


def bm25_boolean_scores(
    spark: SparkSession,
    sf_dir: str,
    must: tuple[str, ...],
    must_not: tuple[str, ...],
) -> DataFrame:
    """(doc_id, bm25) for docs matching >=1 MUST term and no MUST_NOT
    term — the general form behind bm25_boolean_search and the
    TextIndex facade."""
    postings, dl, stats, _meta = text_index_frames(spark, sf_dir)
    tf_all = postings.filter(F.col("term").isin(*must))
    # idf uses the FULL-index df (Lucene semantics: boolean exclusion
    # filters the result set, it does not reweight term rarity) — so df
    # is computed BEFORE the anti-join, identical to the oracle's
    dfreq = tf_all.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    tf = tf_all
    if must_not:
        excluded = (
            postings.filter(F.col("term").isin(*must_not))
            .select("doc_id")
            .distinct()
        )
        tf = tf_all.join(excluded, "doc_id", "left_anti")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (_K1 + 1.0)) / (
        F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
    )


def prefix_completions(
    spark: SparkSession, sf_dir: str, prefix: str, k: int = 10
) -> DataFrame:
    """Top-k completions of ``prefix`` by df — the general form behind
    prefix_autocomplete and the TextIndex facade (term_meta only)."""
    _postings, _dl, _stats, term_meta = text_index_frames(spark, sf_dir)
    cand = term_meta.filter(F.col("term").startswith(prefix)).select(
        "term", "df"
    )
    return global_topk_ranked(cand, [F.desc("df"), F.asc("term")], k)


# ---------------------------------------------------------------------------
# Batched + pruned serving (round 8, continuation): WAND/max-score
# top-k pruning composed WITH batch amortization — the full keyword
# serving stack. Per (query, doc) upper bounds come from the same
# per-term constants as the single-query pruned path (term_meta's
# exact build-time max-impact), summed per query over ONE shared
# postings scan; each query gets its own theta (the k-th exact score
# among its top-k docs BY UB, a per-query groupBy min); survivors of
# EACH query's threshold flow into one shared exact-scoring join.
# Lossless per query (same argument as _wand_pruned_parts, applied
# per partition key), so the oracle is exactly bm25_batch_topk's.
# At 100 TB: one postings scan per request batch AND exact scoring
# touches ~k docs per query instead of every match — the two wins
# multiply.
# ---------------------------------------------------------------------------
def bm25_batch_pruned_scores(
    spark: SparkSession,
    sf_dir: str,
    batch: tuple[tuple[int, tuple[str, ...]], ...] = _BATCH_QUERIES,
    k: int = _BATCH_K,
) -> tuple[DataFrame, DataFrame]:
    """(survivor (query, doc, term) pairs, exact-scored survivors) —
    split like _bm25_pruned_parts so tests can count scored pairs.

    Round-15 restructure: the original fully-lazy formulation nested
    exact_scores(tagged ⨝ cand) inside theta inside survivors inside the
    final exact_scores, and each exact_scores referenced its input three
    times — the physical plan exploded to 604 operators / 102 postings
    scans (plans/r15/bm25_batch_pruned_before.txt). The candidate set
    (≤ k·Q rows) and per-query thetas (Q rows) are BOUNDED by
    construction, so they are gathered eagerly to the driver (the same
    ≤ Q·k gather budget the sharded scatter paths use) and re-enter the
    plan as local relations, collapsing the lineage to 4 postings scans
    (2 eager candidate/theta jobs + 2 in the final lazy plan). Scores
    are unchanged: same pairs, same arithmetic, same 6-dp rounding."""
    # Entry guard (round 16): the eager candidate/theta restructure
    # gathers ≤ Q·k rows to the driver — enforce the budget up front so
    # an oversized caller batch raises instead of silently collecting.
    if len(batch) * k > GATHER_ROW_BUDGET:
        raise ValueError(
            f"bm25_batch_pruned_scores: batch of {len(batch)} queries x "
            f"k={k} exceeds the {GATHER_ROW_BUDGET}-row eager-gather "
            "budget; serve it through the sharded scatter-gather path"
        )
    postings, dl, stats, term_meta = text_index_frames(spark, sf_dir)
    all_terms = sorted({t for _, ts in batch for t in ts})
    # dict.fromkeys dedup (round-16 ADVICE): a caller batch repeating a
    # term inside one query's term tuple must count it once, like the
    # pre-round-15 distinct()-based shape did; for dup-free batches the
    # rows (and their order) are unchanged.
    qt = spark.createDataFrame(
        list(dict.fromkeys((qid, t) for qid, ts in batch for t in ts)),
        schema="query_id int, term string",
    )
    tf = postings.filter(F.col("term").isin(*all_terms))
    meta = (
        term_meta.filter(F.col("term").isin(*all_terms))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "df",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * F.col("max_impact")
            ).alias("ub_t"),
        )
    )
    tagged = tf.join(F.broadcast(qt), "term")
    # Phase 1: per-(query, doc) upper bounds from per-term constants
    ub = (
        tagged.join(F.broadcast(meta.select("term", "ub_t")), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("ub_t").alias("ub"))
    )

    def exact_scores(pairs: DataFrame) -> DataFrame:
        # pairs rows are unique per (query_id, doc_id, term) — tagged is
        # a key-preserving join of unique postings rows with unique qt
        # rows, and the pair-set join below keys on (query_id, doc_id) —
        # so scoring them directly (single reference, no distincts, no
        # semi-join) groups exactly the rows the old deduped
        # _batch_scoring_join + semi-join shape did, term-overlap
        # included (pytest: ..._overlapping_terms_lossless).
        idf = F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        tf_part = (F.col("tf") * (_K1 + 1.0)) / (
            F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
        )
        return (
            pairs.join(F.broadcast(meta.select("term", "df")), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("query_id", "doc_id")
            .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
        )

    # Phase 2: per-query theta = k-th exact score among its top-k by ub.
    # One eager job: the candidate window stays lazy inside the theta
    # plan (cand is never needed as a value, only theta's Q rows are),
    # and the bounded theta gather re-enters phase 3 as a local
    # relation, cutting the plan's recursive re-derivation (docstring).
    wu = Window.partitionBy("query_id").orderBy(
        F.desc("ub"), F.asc("doc_id")
    )
    cand = (
        ub.withColumn("r", F.row_number().over(wu))
        .filter(F.col("r") <= k)
        .select("query_id", "doc_id")
    )
    theta_rows = bounded_gather(
        exact_scores(tagged.join(F.broadcast(cand), ["query_id", "doc_id"]))
        .groupBy("query_id")
        .agg(F.min("bm25").alias("theta")),
        "bm25_batch_pruned_scores theta",
    )
    theta = spark.createDataFrame(
        [(int(r.query_id), float(r.theta)) for r in theta_rows],
        schema="query_id int, theta double",
    )
    # Phase 3: per-query survivors (rounding slop as in the single path)
    survivors = (
        ub.join(F.broadcast(theta), "query_id")
        .filter(F.col("ub") >= F.col("theta") - _ROUND_SLOP)
        .select("query_id", "doc_id")
    )
    survivor_pairs = tagged.join(
        F.broadcast(survivors), ["query_id", "doc_id"]
    )
    return survivor_pairs, exact_scores(survivor_pairs)


@query(
    "bm25_batch_pruned",
    # Lossless per query => oracle identical to bm25_batch_topk's
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    {_batch_qt_sql()},
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
           WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
    scored AS (
      SELECT qt.query_id, tf.doc_id,
             round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN qt USING (term)
      JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, bm25,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY bm25 DESC, doc_id) AS BIGINT)
             AS rank
    FROM scored QUALIFY rank <= {_BATCH_K}
    """,
    operators=("K2", "E4", "D1", "C2", "F2"),
)
def bm25_batch_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25_batch_topk's exact answer via the pruned path: WAND
    thresholds applied PER QUERY inside one batched plan."""
    _, scored = bm25_batch_pruned_scores(spark, sf_dir)
    return batch_topk_per_query(scored, _BATCH_K)


# ---------------------------------------------------------------------------
# Adaptive plan routing (round-9 verdict #2): choose pruned-vs-unpruned
# PER REQUEST BATCH from the index's own stats, instead of hardcoding
# the plan per registered query. The cost model, in "exact-score one
# (query, doc, term) pair on hot postings" units:
#
#   unpruned  ~ P * r
#   pruned    ~ P + OVERHEAD + r * k * Q      (UB pass still touches all
#                                              P pairs; exact scoring
#                                              only the ~k*Q survivors)
#
# where P = sum of df over the batch's (query, term) rows (from
# term_meta — the same bounded driver lookup filtered_knn_adaptive
# does against column stats), Q = batch size, and r = the relative
# cost of exactly scoring a pair vs the UB bound arithmetic. Route to
# pruned iff (r-1)*P > OVERHEAD + r*k*Q. For hot in-cluster BM25,
# r = 1 (Spark's vectorized scan scores a pair about as cheaply as
# the UB pass touches it — BASELINE.md "Batched + pruned, measured
# honestly": 78x fewer scored pairs still lost 1.7 s -> 11.2 s), so
# the rule NEVER prunes: the router formalizes the measured serving
# default. Pruning wins when the per-pair scorer is expensive (learned
# ranker, remote fetch) or postings are cold — callers say so via
# pair_cost_ratio, and the _cold registered query pins that arm.
# OVERHEAD is a conservative pair-equivalent for the five extra stages
# (per-query UB window, theta pass, survivor join): at 1M docs x 64
# queries they cost 9.5 s wall vs 1.7 s for the ENTIRE unpruned plan,
# i.e. well above exact-scoring 100k pairs.
#
# Batched-vs-single needs no routing arm: the batched plan AT Q=1 IS
# the single-query plan (one qt row, same joins), so single requests
# ride the same code path with zero penalty.
# ---------------------------------------------------------------------------
_ADAPTIVE_OVERHEAD_PAIRS = 100_000
_HOT_PAIR_COST = 1.0  # in-cluster BM25: exact scoring ~ UB arithmetic
_COLD_PAIR_COST = 50.0  # expensive scorer / cold postings regime

# Pathological shape from the --skew probe: one query holding many
# corpus-hot terms while the rest are narrow — the batch a naive
# per-batch heuristic would misroute.
_SKEWED_BATCH: tuple[tuple[int, tuple[str, ...]], ...] = (
    (0, ("data", "small", "batch", "scan", "join", "stream")),
    (1, ("merge",)),
    (2, ("vector",)),
    (3, ("hash",)),
)


def route_bm25_batch(
    df_by_term: dict,
    batch: tuple[tuple[int, tuple[str, ...]], ...],
    k: int,
    pair_cost_ratio: float,
    overhead_pairs: int = _ADAPTIVE_OVERHEAD_PAIRS,
) -> tuple[str, int]:
    """The routing decision, pure and driver-side: (strategy,
    est_pairs). est_pairs double-counts a term shared by two queries —
    the tagged scoring join really does score it once per query."""
    est_pairs = sum(df_by_term.get(t, 0) for _, ts in batch for t in ts)
    pruned = (pair_cost_ratio - 1.0) * est_pairs > (
        overhead_pairs + pair_cost_ratio * k * len(batch)
    )
    return ("pruned" if pruned else "unpruned"), est_pairs


def bm25_batch_route_and_run(
    spark: SparkSession,
    sf_dir: str,
    batch: tuple[tuple[int, tuple[str, ...]], ...],
    k: int,
    pair_cost_ratio: float,
    df_by_term: dict | None = None,
) -> tuple[str, int, DataFrame]:
    """Route one request batch and run the chosen plan. The df lookup
    is bounded by the batch's own vocabulary (a broadcast-sized
    term_meta filter), never a corpus scan; a caller routing SEVERAL
    batches passes one prefetched ``df_by_term`` covering their union
    vocabulary so the lookup job runs once, not per batch (round 15)."""
    if df_by_term is None:
        _postings, _dl, _stats, term_meta = text_index_frames(spark, sf_dir)
        terms = sorted({t for _, ts in batch for t in ts})
        df_by_term = {
            r.term: int(r.df)
            for r in term_meta.filter(F.col("term").isin(*terms))
            .select("term", "df")
            .collect()
        }
    strategy, est_pairs = route_bm25_batch(df_by_term, batch, k, pair_cost_ratio)
    if strategy == "pruned":
        _, scored = bm25_batch_pruned_scores(spark, sf_dir, batch, k)
    else:
        scored = bm25_scores_batch(spark, sf_dir, batch)
    return strategy, est_pairs, batch_topk_per_query(scored, k)


def _adaptive_batch_oracle(
    cases: tuple[tuple[str, tuple, float], ...]
) -> str:
    """Oracle for the routed batches: per case, the lossless BM25
    top-k (identical SQL to bm25_batch_topk) PLUS the decision replayed
    from tok-derived df — the strategy column is gated, not just the
    rows (the filtered_knn_adaptive pattern)."""
    all_terms = sorted(
        {t for _n, batch, _r in cases for _q, ts in batch for t in ts}
    )
    in_list = "('" + "', '".join(all_terms) + "')"
    ctes = [
        f"""tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN {in_list} GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
            WHERE term IN {in_list} GROUP BY term)"""
    ]
    arms = []
    for name, batch, r in cases:
        rows = ", ".join(f"({qid}, '{t}')" for qid, ts in batch for t in ts)
        ctes.append(
            f"""qt_{name}(query_id, term) AS (VALUES {rows}),
    p_{name} AS (SELECT CAST(sum(d.df) AS BIGINT) AS p
                 FROM qt_{name} q JOIN dfq d USING (term)),
    scored_{name} AS (
      SELECT q.query_id, tf.doc_id,
             round(sum(
               ln((stats.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ), 6) AS bm25
      FROM tf JOIN qt_{name} q USING (term)
      JOIN dfq d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY q.query_id, tf.doc_id
    )"""
        )
        arms.append(
            f"""SELECT '{name}' AS case_name,
           CASE WHEN ({r} - 1.0) * (SELECT p FROM p_{name})
                     > {_ADAPTIVE_OVERHEAD_PAIRS}
                       + {r} * {_BATCH_K} * {len(batch)}
                THEN 'pruned' ELSE 'unpruned' END AS strategy,
           (SELECT p FROM p_{name}) AS est_pairs,
           query_id, doc_id, bm25,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
    FROM scored_{name} QUALIFY rank <= {_BATCH_K}"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    "
        + "\n    UNION ALL ".join(arms)
    )


_ADAPTIVE_HOT_CASES = (
    ("uniform", _BATCH_QUERIES, _HOT_PAIR_COST),
    ("skewed", _SKEWED_BATCH, _HOT_PAIR_COST),
)
_ADAPTIVE_COLD_CASES = (("uniform_cold", _BATCH_QUERIES, _COLD_PAIR_COST),)


def _run_adaptive_cases(
    spark: SparkSession, sf_dir: str, cases
) -> DataFrame:
    # One df-lookup job for the UNION of the cases' vocabularies — each
    # case's routing reads its own terms out of the shared dict, so N
    # cases cost one bounded collect instead of N (round 15; decisions
    # and est_pairs unchanged — same integers from the same artifact).
    _postings, _dl, _stats, term_meta = text_index_frames(spark, sf_dir)
    all_terms = sorted(
        {t for _n, batch, _r in cases for _q, ts in batch for t in ts}
    )
    df_by_term = {
        r.term: int(r.df)
        for r in term_meta.filter(F.col("term").isin(*all_terms))
        .select("term", "df")
        .collect()
    }
    parts = []
    for name, batch, r in cases:
        strategy, est_pairs, topk = bm25_batch_route_and_run(
            spark, sf_dir, batch, _BATCH_K, r, df_by_term=df_by_term
        )
        parts.append(
            topk.select(
                F.lit(name).alias("case_name"),
                F.lit(strategy).alias("strategy"),
                F.lit(est_pairs).cast("bigint").alias("est_pairs"),
                "query_id",
                "doc_id",
                "bm25",
                "rank",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "bm25_batch_adaptive",
    oracle=_adaptive_batch_oracle(_ADAPTIVE_HOT_CASES),
    operators=("K2", "E4", "D1", "C2", "F2"),
)
def bm25_batch_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-driving serving entry: routes the uniform AND the skewed
    (Zipf-head) batch through the cost model. Both land on the
    unpruned plan under the hot profile (r=1 never prunes — the
    measured local truth), so the serving-bench time tracks
    min(bm25_batch_topk, bm25_batch_pruned) by construction; the
    DECISION and its est_pairs input are part of the oracle-checked
    output, so a silently misrouting cost model fails the hash."""
    return _run_adaptive_cases(spark, sf_dir, _ADAPTIVE_HOT_CASES)


@query(
    "bm25_batch_adaptive_cold",
    oracle=_adaptive_batch_oracle(_ADAPTIVE_COLD_CASES),
    operators=("K2", "E4", "D1", "C2", "F2"),
)
def bm25_batch_adaptive_cold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expensive-scorer regime (r=50): the router flips to the
    WAND-pruned plan once est_pairs clears the overhead bar (~2.1k
    pairs at r=50, k=10, Q=4 — the fixture batch is ~4.3k at both
    sf0.001 and sf0.01, so THIS query exercises the pruned arm
    through the router, decision replayed identically by the oracle).
    Not in the serving bench group: it exists to pin the pruned arm's
    routing, the hot entry pins the serving cost."""
    return _run_adaptive_cases(spark, sf_dir, _ADAPTIVE_COLD_CASES)


# ---------------------------------------------------------------------------
# Batched phrase serving (round 8, continuation): the phrase surface
# under the same batch economics as bm25_batch_topk. A batch of 2-term
# phrases becomes two broadcast (query_id, term) tables; ONE positional
# scan (pushed IN-list = all phrase terms) feeds both sides; adjacency
# is the same array_intersect-with-offset used by phrase_search, now
# keyed by (query_id, doc_id); per-query top-10. The positional lists
# never re-scan per phrase.
# ---------------------------------------------------------------------------
_PHRASE_BATCH: tuple[tuple[int, tuple[str, str]], ...] = (
    (0, ("data", "query")),
    (1, ("merge", "stream")),
    (2, ("join", "hash")),
    (3, ("vector", "scan")),
)


def _phrase_batch_oracle() -> str:
    arms = " UNION ALL ".join(
        f"""
      SELECT {qid} AS query_id, doc_id,
             CAST(len(list_filter(range(1, len(toks)),
                  i -> toks[i] = '{t1}' AND toks[i+1] = '{t2}'))
               AS BIGINT) AS n_occurrences
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        """
        for qid, (t1, t2) in _PHRASE_BATCH
    )
    return f"""
    SELECT query_id, doc_id, n_occurrences,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY n_occurrences DESC, doc_id) AS BIGINT) AS rank
    FROM ({arms}) WHERE n_occurrences > 0
    QUALIFY rank <= 10
    """


@query(
    "phrase_batch_search",
    oracle=_phrase_batch_oracle(),
    operators=("K2", "H7", "H8", "E4", "C1", "C2"),
)
def phrase_batch_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per phrase for a 4-phrase batch, one positional scan."""
    pos = positional_frame(spark, sf_dir)
    firsts = sorted({t1 for _, (t1, _t2) in _PHRASE_BATCH})
    seconds = sorted({t2 for _, (_t1, t2) in _PHRASE_BATCH})
    q1 = spark.createDataFrame(
        [(qid, t1) for qid, (t1, _) in _PHRASE_BATCH],
        schema="query_id int, term string",
    )
    q2 = spark.createDataFrame(
        [(qid, t2) for qid, (_, t2) in _PHRASE_BATCH],
        schema="query_id int, term string",
    )
    p1 = (
        pos.filter(F.col("term").isin(*firsts))
        .join(F.broadcast(q1), "term")
        .select("query_id", "doc_id", F.col("positions").alias("starts"))
    )
    p2 = (
        pos.filter(F.col("term").isin(*seconds))
        .join(F.broadcast(q2), "term")
        .select("query_id", "doc_id", F.col("positions").alias("_p"))
    )
    counts = (
        p1.join(p2, ["query_id", "doc_id"])
        .select(
            "query_id",
            "doc_id",
            F.size(
                F.array_intersect(
                    "starts", F.transform("_p", lambda x: x - F.lit(1))
                )
            )
            .cast("bigint")
            .alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") > 0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_occurrences"), F.asc("doc_id")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "n_occurrences", "rank")
    )


def serve_hybrid_batch(
    spark: SparkSession,
    sf_dir: str,
    requests: DataFrame,
    n: int = _RRF_N,
    k: int = 10,
) -> DataFrame:
    """Serve an ARBITRARY hybrid request batch — rows of (query_id,
    terms array<string>, probe_vec_id long) — with hybrid_rrf_batch's
    plan: one shared postings scan for every query's BM25 arm, one
    shared BLAS probe batch for every query's vector arm, per-query RRF
    fusion and top-k. The request rows are collected (bounded by the
    batch, the same budget every serving kernel uses); the probe
    vectors are looked up by id in the embeddings table and mapped back
    to query ids through a broadcast (query, vec) table, so two queries
    may share a probe vector."""
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    reqs = requests.select("query_id", "terms", "probe_vec_id").collect()
    if not reqs:
        return spark.createDataFrame(
            [],
            schema="query_id int, doc_id long, rrf_score double, rank long",
        )
    batch = tuple((int(r.query_id), tuple(r.terms)) for r in reqs)
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    bm = batch_topk_per_query(
        bm25_scores_batch(spark, sf_dir, batch), n
    ).select("query_id", "doc_id", F.col("rank").alias("krank"))

    probe_ids = sorted({int(r.probe_vec_id) for r in reqs})
    probe_map = spark.createDataFrame(
        [(int(r.query_id), int(r.probe_vec_id)) for r in reqs],
        schema="query_id int, probe_id long",
    )
    probes = emb.filter(F.col("vec_id").isin(probe_ids)).select(
        "vec_id", "embedding"
    )
    corpus = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    vec = (
        exact_knn_fast(corpus, probes, k=n)
        .join(F.broadcast(probe_map), "probe_id")
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("vrank"),
        )
    )
    fused = bm.join(vec, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.round(
            F.coalesce(1.0 / (60 + F.col("krank")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("vrank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf_score", "rank")
    )


@query(
    "bm25_explain",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN {_TERMS_SQL} GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
           WHERE term IN {_TERMS_SQL} GROUP BY term),
    contrib AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf AS BIGINT) AS tf,
             CAST(df.df AS BIGINT) AS df,
             round(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             , 6) AS contribution
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    scored AS (
      SELECT doc_id, round(sum(contribution), 6) AS bm25 FROM contrib
      GROUP BY doc_id
    ),
    top AS (
      SELECT doc_id, bm25,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
               AS rank
      FROM scored QUALIFY rank <= 5
    )
    SELECT t.rank, c.doc_id, c.term, c.tf, c.df, c.contribution, t.bm25
    FROM contrib c JOIN top t ON t.doc_id = c.doc_id
    """,
    operators=("K2", "D1", "C2", "E4"),
)
def bm25_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score EXPLANATION for the top-5 BM25 docs: one row per
    (doc, query term) with the term's tf, df, and exact additive
    contribution (contributions sum to the doc's bm25 — the oracle
    recomputes every number from raw text). The relevance-debugging
    surface every search engine exposes; served from the same postings
    artifacts as the search itself, restricted to the top-5 docs by an
    in-plan broadcast semi-join so explain cost is O(k · |query|)."""
    postings, dl, stats, term_meta = text_index_frames(spark, sf_dir)
    tf = postings.filter(F.col("term").isin(*_QUERY_TERMS))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (_K1 + 1.0)) / (
        F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(
            F.broadcast(
                term_meta.filter(F.col("term").isin(*_QUERY_TERMS)).select(
                    "term", "df"
                )
            ),
            "term",
        )
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round(idf * tf_part, 6).alias("contribution"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.round(F.sum("contribution"), 6).alias("bm25")
    )
    top = global_topk_ranked(scored, [F.desc("bm25"), F.asc("doc_id")], 5)
    return contrib.join(F.broadcast(top), "doc_id").select(
        "rank", "doc_id", "term", "tf", "df", "contribution", "bm25"
    )
