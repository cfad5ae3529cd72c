"""Bucketed, generation-rolled MinHash sig/band state for the ingest
service's O(delta) appends (round-13 verdict #1).

The round-12 "forward-rolled" cache had a hidden ∝-state term: every
append UNION+PERSISTED the whole corpus state, so materializing the new
generation copied all N sig rows and all 4N band rows through the
block store — a full state copy per append (the measured 19-20 s
dedup_cc floor at 10M docs was mostly this, not the probe join itself).

This module replaces it with an LSM-shaped cache:

- Each GENERATION (the base load, then one per append) is persisted
  SEPARATELY and never re-persisted; probes scan the lazy union of the
  cached generations, so per-append cache work is ∝ delta (persist the
  delta's own sigs/bands) instead of ∝ state. Generations fold back
  into one base every _FOLD_DEPTH rolls to keep plans shallow —
  amortized ∝ state/_FOLD_DEPTH per append, read from cache not disk.

- The state is SHARDED BY BAND BUCKET: every band row carries
  ``bucket = pmod(xxhash64(key), nb)`` and the cached layout is
  hash-partitioned AND sorted by bucket, so the in-memory columnar
  scan's per-batch min/max stats are tight on the bucket column. A
  probe that knows its touched buckets applies one ``bucket IN (...)``
  filter and the InMemoryTableScan skips every untouched batch: the
  candidate scan is ∝ touched buckets, not corpus. ``nb`` scales with
  the corpus (≈ one cache batch per bucket), so a FIXED-size delta
  touches a fixed number of buckets and its probe cost stays FLAT as
  the corpus grows — the single-box shape of the fleet's
  scatter-gather (each shard owns a bucket range and probes only when
  a delta key routes to it). Sig rows carry the same bucketing on
  xxhash64(doc_id) for the verify join's candidate-id point reads.

- Pruning is ADAPTIVE: past _PRUNE_MAX touched buckets (a corpus-sized
  "delta") the IN-list would cost more than it saves (and a huge
  literal list degrades the batch-stat filter), so the probe falls
  back to the full scan — exactly today's behavior, never worse.

Results are provably identical with or without pruning: a band row
whose bucket is not touched cannot equi-join any delta key (same
xxhash64, same modulus), so the filter removes only non-matching rows.
"""

from __future__ import annotations

import glob as _glob
import os
from functools import reduce

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, functions as F

_FOLD_DEPTH = 32  # generations per fold (plan depth / small-frame bound)
# Max touched-bucket IN-list the probe will apply. Measured at 10M
# docs (40M band rows): the warm single-key scan is already ~0.3-0.45 s,
# a ≤128-literal filter is free, and a ~500-literal filter is NET
# NEGATIVE (the per-batch stat evaluation costs more than the skipped
# batches save) — so pruning is reserved for the point-lookup regime
# (tiny deltas / single-doc upserts), where it stays a strict win as
# the state grows 10-100× and the full scan stops being ~free.
_PRUNE_MAX = 256
_BASE_PARTS = 32  # cache partitions for the folded base generation


def band_bucket(col, nb: int):
    """The shard-routing expression for band keys — MUST be identical
    on the corpus and delta sides (same hash, same modulus) or pruning
    would drop true candidates."""
    return F.pmod(F.xxhash64(col), F.lit(nb)).cast("int")


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def pick_nb(n_docs: int) -> int:
    """Bucket count ≈ one 10k-row cache batch per bucket (4 band rows
    per doc): small enough that the per-batch stat check is noise, big
    enough that a bounded delta's touched set covers a vanishing
    fraction of buckets at any corpus size."""
    return max(64, min(65536, _next_pow2(max(1, n_docs // 2500))))


class CorpusSigState:
    """The corpus MinHash state as a list of persisted generations.
    ``gens`` holds (sigs, bands) DataFrames, each persisted once and
    never rewritten; ``pending`` holds frames awaiting unpersist (the
    deferred-release discipline: a superseded generation stays cached
    until its successor has materialized, so the fold never forces a
    disk re-read)."""

    def __init__(self, spark: SparkSession, sd: str, nb: int):
        self.spark = spark
        self.sd = sd
        self.nb = nb
        self.files: frozenset = frozenset()
        self.gens: list[tuple[DataFrame, DataFrame]] = []
        self.pending: list[DataFrame] = []
        # memoized lazy unions (one object per generation — identity
        # is the cheap "is this the same state?" check callers use)
        self._sigs_all: DataFrame | None = None
        self._bands_all: DataFrame | None = None

    # -- accessors -------------------------------------------------------
    def sigs(self, touched: list[int] | None = None) -> DataFrame:
        """(doc_id, sig) across all generations; with ``touched`` (the
        candidate ids' buckets) the scan batch-prunes to those buckets."""
        df = self._union(0)
        if touched is not None and self._prunable(touched):
            df = df.filter(F.col("sbucket").isin([int(b) for b in touched]))
        return df.select("doc_id", "sig")

    def bands(self, touched: list[int] | None = None) -> DataFrame:
        """(corpus_id, bk) across all generations — ``bk`` is the
        band-folded single bigint join key (see ``_bucketize``); with
        ``touched`` (the delta keys' buckets) the candidate scan is
        ∝ touched buckets."""
        df = self._union(1)
        if touched is not None and self._prunable(touched):
            df = df.filter(F.col("bucket").isin([int(b) for b in touched]))
        return df.select("corpus_id", "bk")

    def _prunable(self, touched: list) -> bool:
        return len(touched) <= min(self.nb // 2, _PRUNE_MAX)

    def _union(self, ix: int) -> DataFrame:
        memo = "_sigs_all" if ix == 0 else "_bands_all"
        if getattr(self, memo) is None:
            setattr(
                self,
                memo,
                reduce(DataFrame.unionByName, [g[ix] for g in self.gens]),
            )
        return getattr(self, memo)

    # -- lifecycle -------------------------------------------------------
    def defer_release(self, frame: DataFrame) -> None:
        self.pending.append(frame)

    def release_pending(self) -> None:
        for f in self.pending:
            try:
                f.unpersist()
            except Exception:  # session already stopped — nothing to free
                pass
        self.pending = []

    def _bucketize(
        self, sigs_raw: DataFrame, parts: int | None
    ) -> tuple[DataFrame, DataFrame]:
        """One generation's (sigs, bands) in the bucketed layout. With
        ``parts`` the frames are hash-partitioned by bucket and SORTED
        so cached batches carry tight bucket stats (the base/fold
        shape); delta generations pass parts=None — they are small
        enough that one compact partition beats a shuffle."""
        from cloudvectordb_spark.operators.dedup import minhash_bands_hashed

        sigs = sigs_raw.withColumn("sbucket", band_bucket(F.col("doc_id"), self.nb))
        if parts:
            sigs = sigs.repartition(parts, "sbucket").sortWithinPartitions(
                "sbucket"
            )
        else:
            sigs = sigs.coalesce(1).sortWithinPartitions("sbucket")
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
        # bands derive from the PERSISTED sigs — the source parquet is
        # read exactly once per (re)load, the band explode reads blocks.
        # The band index FOLDS into one bigint join key ``bk`` =
        # xxhash64(band, key): probing a broadcast hash table on a
        # single bigint takes Spark's LongHashedRelation fast path —
        # measured 10× over the composite (band, key) probe (4.2 s →
        # 0.4 s for the 40M-row scan at 10M docs), and the cached state
        # narrows to two data columns. A bk collision across different
        # (band, key) pairs only ADDS a candidate; the exact sig verify
        # removes it (the same argument as the hashed band keys).
        bands = (
            minhash_bands_hashed(
                sigs.select("doc_id", "sig"), id_out="corpus_id"
            )
            .select("corpus_id", F.xxhash64("band", "key").alias("bk"))
            .withColumn("bucket", band_bucket(F.col("bk"), self.nb))
        )
        if parts:
            bands = bands.repartition(parts, "bucket").sortWithinPartitions(
                "bucket"
            )
        else:
            bands = bands.coalesce(1).sortWithinPartitions("bucket")
        return sigs, bands.persist(StorageLevel.MEMORY_AND_DISK)

    def _push_gen(self, gen: tuple[DataFrame, DataFrame], files: frozenset) -> None:
        self.gens.append(gen)
        self.files = files
        self._sigs_all = None
        self._bands_all = None

    def _fold(self) -> None:
        """Collapse the generation list into one re-bucketed base, read
        from the CACHED generations (not disk). Old frames release
        after the next probe materializes the fold."""
        sigs_raw = reduce(
            DataFrame.unionByName, [g[0].select("doc_id", "sig") for g in self.gens]
        )
        folded = self._bucketize(sigs_raw, _BASE_PARTS)
        for sig_f, band_f in self.gens:
            self.pending.extend([sig_f, band_f])
        self.gens = [folded]
        self._sigs_all = None
        self._bands_all = None


def shard_ranges(nb: int, n_shards: int) -> list[tuple[int, int]]:
    """Contiguous bucket ranges [lo, hi) per shard. Contiguity matters:
    the cached layout is SORTED by bucket, so each shard's rows sit in
    contiguous cache batches and a range predicate prunes by batch
    min/max stats — cheap regardless of how many buckets a delta
    touches, which is exactly the mid-size-delta regime the
    ≤_PRUNE_MAX IN-list honestly can't cover."""
    step = (nb + n_shards - 1) // n_shards
    return [(s * step, min(nb, (s + 1) * step)) for s in range(n_shards)]


class ShardedSigState:
    """S independent bucket-range shards of the corpus MinHash state —
    the fleet's scatter-gather layout (round-13 verdict #2 → round 14).

    On a fleet, shard s is a separate machine holding ONLY its bucket
    range's band/sig rows; a delta's band keys route by
    ``bucket = pmod(xxhash64(bk), nb)`` and each shard probes only the
    keys that land in its range. On one box the shards are
    range-filtered legs over the same sorted bucketed cache
    (``CorpusSigState``), and the sorted layout's per-batch min/max
    stats make each leg scan ~1/S of the cached batches — the same
    ∝ state/S per-shard cost the fleet shape promises, measured per
    shard by ``tools/sigshard_probe.py``. Probes submit the S legs
    from S driver threads (mirroring ``search_sharded``), and the
    gather is a union of bounded candidate sets — keyed equi-joins
    only, never all-pairs.

    This is a VIEW: it adds no second persisted copy of the state and
    rolls forward with the underlying ``corpus_sig_state`` cache."""

    def __init__(self, state: CorpusSigState, n_shards: int):
        if n_shards < 1:
            raise ValueError(f"n_shards must be >= 1, got {n_shards}")
        self.state = state
        self.n_shards = n_shards
        self.ranges = shard_ranges(state.nb, n_shards)

    @property
    def nb(self) -> int:
        return self.state.nb

    def bands_shard(self, s: int) -> DataFrame:
        """(corpus_id, bk) owned by shard ``s`` — a batch-pruned range
        scan of the bucketed band cache (∝ state/S rows read)."""
        lo, hi = self.ranges[s]
        return (
            self.state._union(1)
            .filter((F.col("bucket") >= lo) & (F.col("bucket") < hi))
            .select("corpus_id", "bk")
        )

    def sigs_shard(self, s: int) -> DataFrame:
        """(doc_id, sig) whose sbucket lands in shard ``s`` — the
        verify join's range-pruned point-read leg."""
        lo, hi = self.ranges[s]
        return (
            self.state._union(0)
            .filter((F.col("sbucket") >= lo) & (F.col("sbucket") < hi))
            .select("doc_id", "sig")
        )


def sharded_sig_state(
    spark: SparkSession, sd: str, n_shards: int, n_hint: int | None = None
) -> ShardedSigState:
    """The S-shard scatter-gather view over the cached (and
    forward-rolled) ``corpus_sig_state`` for a dedup-state dir."""
    return ShardedSigState(corpus_sig_state(spark, sd, n_hint), n_shards)


# (sigs dir, session key) -> CorpusSigState
_STATES: dict = {}


def _stat_tag(f: str) -> tuple:
    st = os.stat(f)
    return (os.path.basename(f), st.st_size, st.st_mtime_ns)


def _sweep_dead_sessions() -> None:
    dead = []
    for ck, state in _STATES.items():
        try:
            alive = getattr(state.spark.sparkContext, "_jsc", None) is not None
        except Exception:
            alive = False
        if not alive:
            dead.append(ck)
    for ck in dead:
        del _STATES[ck]


def corpus_sig_state(
    spark: SparkSession, sd: str, n_hint: int | None = None
) -> CorpusSigState:
    """The cached CorpusSigState for a dedup-state dir, rolled forward
    under the sig files currently on disk. The fingerprint is
    (basename, size, mtime_ns) per file — an in-place rewrite that
    preserves names still rolls the cache; a pure append (the pipeline
    writing one delta's sigs) adds ONE persisted generation costing
    ∝ delta. Bound to the calling session; stopped sessions' entries
    are swept."""
    from cloudvectordb_spark.cache import session_key

    files = frozenset(
        _stat_tag(f) for f in _glob.glob(os.path.join(sd, "sigs", "*.parquet"))
    )
    _sweep_dead_sessions()
    ck = (sd, session_key(spark))
    state = _STATES.get(ck)
    if state is not None and state.files == files:
        return state
    if state is not None and state.files < files:
        new_files = [
            os.path.join(sd, "sigs", name)
            for (name, _sz, _mt) in files - state.files
        ]
        gen = state._bucketize(spark.read.parquet(*new_files), None)
        state._push_gen(gen, files)
        if len(state.gens) > _FOLD_DEPTH:
            state._fold()
        return state
    # full (re)load: a fresh process, a rewritten state (run()
    # regenerating), or a vanished file — choose nb for THIS corpus
    if state is not None:
        for sig_f, band_f in state.gens:
            state.pending.extend([sig_f, band_f])
        pending = state.pending
    else:
        pending = []
    if n_hint is None:
        # ~55 B/doc of sig parquet at P=8; only the magnitude matters
        n_hint = max(
            1, sum(sz for (_n, sz, _m) in files) // 55
        )
    fresh = CorpusSigState(spark, sd, pick_nb(n_hint))
    fresh.pending = pending
    # read the EXACT files in the fingerprint, never the directory: a
    # directory read's listing can resolve as late as first
    # materialization, and a generation leg that materializes lazily
    # (the sig leg is skipped entirely when an append has no
    # candidates) would silently absorb files later appends wrote —
    # rows then double-count once those appends roll their own gens
    base = fresh._bucketize(
        spark.read.parquet(
            *[os.path.join(sd, "sigs", name) for (name, _sz, _mt) in files]
        ),
        _BASE_PARTS,
    )
    fresh._push_gen(base, files)
    _STATES[ck] = fresh
    return fresh
