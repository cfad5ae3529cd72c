"""User-facing facade over the index lifecycle (SURVEY.md §3.1 S4; the
"vectordb" a reference user actually drives day to day).

The registered queries are the verification surface; this module is the
ERGONOMIC surface — one object per persisted index that composes the
already-tested pieces:

    idx = VectorIndex.build(spark, emb_df, path, k=8)     # S4 bulk build
    idx = VectorIndex.open(spark, path)                   # reattach
    idx.search(probe_df, k=10)                            # pruned ANN
    idx.append(new_vectors)                               # delta ingest
    idx.compact(new_path)                                 # small-files GC
    idx.stats()                                           # cell balance

Everything delegates to operators.kmeans_det / operators.pipeline, so
the facade inherits their scale shapes (literal-matrix assignment,
partition-pruned probes, bounded driver state) and their determinism —
an index built here is bit-identical to the one the oracle CTEs replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VectorIndex:
    """A persisted IVF layout: partitioned vectors + centroid table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        vectors: DataFrame,
        path: str,
        k: int = 8,
        seed: int = 42,
        rounds: int | None = None,
    ) -> "VectorIndex":
        """S4 bulk build: deterministic Lloyd's + partitionBy write."""
        from cloudvectordb_spark.operators.pipeline import (
            _IVF_ROUNDS,
            build_ivf_assignments,
            write_ivf_index,
        )

        assigned, centroids = build_ivf_assignments(
            vectors, k=k, seed=seed, rounds=rounds or _IVF_ROUNDS
        )
        write_ivf_index(assigned, centroids, path)
        return cls(spark, path)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "VectorIndex":
        return cls(spark, path)

    # -- reads ---------------------------------------------------------
    @property
    def vectors(self) -> DataFrame:
        """Every indexed row: the partitioned base layout plus the L0
        delta tier small appends land in (pipeline.ivf_vectors_frame);
        compact() folds the tier back into the cells."""
        from cloudvectordb_spark.operators.pipeline import ivf_vectors_frame

        return ivf_vectors_frame(self.spark, self.path)

    def centroids(self) -> list:
        from cloudvectordb_spark.operators.pipeline import index_centroids

        return index_centroids(self.spark, self.path)

    def search(
        self, probes: DataFrame, k: int = 10, nprobe: int = 2,
        id_col: str = "vec_id", vec_col: str = "embedding",
    ) -> DataFrame:
        """Partition-pruned ANN: driver-side cell selection over the
        cached centroid list (vectorized batch routing — one numpy row
        reduction per probe, not Q*k Python ops), literal isin pruning,
        BLAS exact top-k. Probe set must be bounded (it is collected)."""
        from cloudvectordb_spark.operators.kmeans_det import nearest_cells_batch
        from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

        cents = self.centroids()
        rows = probes.select(id_col, vec_col).collect()
        routed = nearest_cells_batch([r[vec_col] for r in rows], cents, nprobe)
        cells = sorted({c for cs in routed for c in cs})
        # normalize probe columns HERE: the index's own frame is always
        # (vec_id, embedding), and exact_knn_fast applies one column
        # pair to both sides — forwarding custom probe names would make
        # the corpus scan look for them (round-10 ADVICE item 2)
        probes_local = self.spark.createDataFrame(
            [(r[id_col], r[vec_col]) for r in rows],
            schema="vec_id long, embedding array<float>",
        )
        pruned = self.vectors.filter(F.col("centroid_id").isin(cells))
        return exact_knn_fast(pruned, probes_local, k=k)

    @staticmethod
    def search_sharded(
        indexes: list,
        probes: DataFrame,
        k: int = 10,
        nprobe: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        concurrent: bool = True,
    ) -> DataFrame:
        """Scatter-gather over S independent index shards — the 100 TB
        serving topology (one IVF tree never holds the fleet's vectors;
        each shard owns its executors, its cell-pruned scan, its own
        build lifecycle). Every shard serves its LOCAL top-k; the
        bounded S*k rows per probe merge in one window. The merge is
        lossless over whatever each shard returned (the value-oracled
        sharded_knn_merge query pins the invariant for exact per-shard
        search: every global top-k member ranks <= k in its own
        shard); per-shard nprobe recall composes exactly like the
        single-index case. Output carries the winning shard's ordinal.

        ``concurrent=True`` (default) submits the S shard jobs from S
        driver threads so their stages overlap in the scheduler instead
        of serializing — on a shared cluster the fan-out wall drops
        toward the slowest shard (round-10 verdict #3; measured in
        tools/sharded_serve_probe.py). Each shard's result is its
        bounded local top-k (<= Q*k rows), so gathering them as one
        local relation for the merge window is driver-safe at any
        corpus size. ``concurrent=False`` keeps a strictly sequential
        fan-out (deterministic job ordering for debugging); results are
        identical — the merge is order-insensitive by construction."""
        from pyspark.sql import Window

        if not indexes:
            raise ValueError("search_sharded needs at least one index shard")
        # materialize the probe batch ONCE: each shard's search collects
        # its probe frame, and an arbitrary probe lineage would re-run
        # its upstream job per shard — a local relation makes those S
        # collects free
        spark = indexes[0].spark
        rows = probes.select(id_col, vec_col).collect()
        probes_local = spark.createDataFrame(
            [(r[id_col], r[vec_col]) for r in rows],
            schema=f"{id_col} long, {vec_col} array<float>",
        )

        def gather(i: int):
            # one bounded collect per shard: <= Q*k (probe_id,
            # neighbor_id, score) rows — the scatter-gather message,
            # never the candidates
            return [
                (int(r.probe_id), int(r.neighbor_id), float(r.score), i)
                for r in indexes[i]
                .search(probes_local, k=k, nprobe=nprobe,
                        id_col=id_col, vec_col=vec_col)
                .select("probe_id", "neighbor_id", "score")
                .collect()
            ]

        if concurrent and len(indexes) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(indexes)) as pool:
                shard_rows = list(pool.map(gather, range(len(indexes))))
        else:
            shard_rows = [gather(i) for i in range(len(indexes))]
        gathered = spark.createDataFrame(
            [t for part in shard_rows for t in part],
            schema="probe_id long, neighbor_id long, score double, shard int",
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.desc("score"), F.asc("neighbor_id")
        )
        return (
            gathered.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select("probe_id", "neighbor_id", "score", "shard", "rank")
        )

    def search_filtered(
        self, probes: DataFrame, predicate, k: int = 10, nprobe: int = 2,
        id_col: str = "vec_id", vec_col: str = "embedding",
    ) -> DataFrame:
        """Metadata-filtered ANN: the literal cell filter prunes parquet
        partitions AND ``predicate`` (a Column) pushes into the surviving
        scans before any vector math — the stacked pre-filter strategy
        (see operators.ivf2.filtered_ivf_knn for the verified query form)."""
        from cloudvectordb_spark.operators.kmeans_det import nearest_cells_batch
        from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

        cents = self.centroids()
        rows = probes.select(id_col, vec_col).collect()
        routed = nearest_cells_batch([r[vec_col] for r in rows], cents, nprobe)
        cells = sorted({c for cs in routed for c in cs})
        probes_local = self.spark.createDataFrame(
            [(r[id_col], r[vec_col]) for r in rows],
            schema="vec_id long, embedding array<float>",
        )
        pruned = self.vectors.filter(
            F.col("centroid_id").isin(cells) & predicate
        )
        return exact_knn_fast(pruned, probes_local, k=k)

    def dedup_pairs(self, tau: float = 0.3, cap: int = 4096) -> DataFrame:
        """Semantic near-dup pairs (a_id, b_id, cos_sim >= tau) over
        THIS index's vectors: top-2 multi-probe cell assignment, within-
        cell BLAS pairing, and cell-size-capped sub-bucketing so a hot
        cell fans out across tasks instead of serializing one worker
        (degrades to one-task-per-cell when no cell exceeds ``cap``)."""
        from cloudvectordb_spark.operators.pipeline import (
            semantic_pairs_on_index,
        )

        return semantic_pairs_on_index(self.spark, self.path, tau=tau, cap=cap)

    def stats(self) -> DataFrame:
        """Cell-balance health view (n_cells, min/max/avg, imbalance)."""
        sizes = self.vectors.groupBy("centroid_id").agg(F.count("*").alias("n"))
        return sizes.agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.min("n").cast("bigint").alias("min_cell"),
            F.max("n").cast("bigint").alias("max_cell"),
            F.round(F.avg("n"), 6).alias("avg_cell"),
            F.round(F.max("n") / F.avg("n"), 6).alias("imbalance"),
        )

    # -- writes --------------------------------------------------------
    def _tracked_meta_path(self) -> str:
        import os

        return os.path.join(self.path, "dedup_state", "meta.json")

    def _has_tracked_counter(self) -> bool:
        import json
        import os

        p = self._tracked_meta_path()
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return "n_indexed" in json.load(f)

    def _bump_n_indexed(self, delta_rows: int, lease: int) -> None:
        """Fenced read-modify-write of the maintained ``n_indexed``
        counter in the dedup-state meta. MUST be called under a held
        lease on this root: the lease fences any in-flight
        CorpusPipeline.append (it checks the epoch before every state
        mutation and before its own meta commit), so the value read
        here cannot be concurrently overwritten by an older writer.
        After the rename, verifies this lease is STILL the newest
        epoch — if a successor writer appeared mid-RMW the counter may
        have raced, and that is reported loudly (CommitConflict with
        the verify="full" remedy) instead of silently diverging
        (round-12 ADVICE item 2)."""
        import json
        import os

        from cloudvectordb_spark.versioning import CommitConflict, _max_epoch

        meta_path = self._tracked_meta_path()
        with open(meta_path) as f:
            meta = json.load(f)
        meta["n_indexed"] += delta_rows
        tmp = f"{meta_path}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.rename(tmp, meta_path)
        newest = _max_epoch(self.path)
        if newest > lease:
            raise CommitConflict(
                f"n_indexed update under epoch {lease} raced a newer "
                f"writer (epoch {newest}) on {self.path} — the "
                "maintained counter may be stale; re-audit with "
                "CorpusPipeline.append(..., verify='full')"
            )

    def append(
        self,
        new_vectors: DataFrame,
        l0: str | bool = "auto",
        maintain_counter: bool = True,
    ) -> None:
        """Delta ingest against FROZEN centroids (work ∝ delta).
        ``l0``: where the rows land — the L0 delta tier or the
        partitioned cells (see pipeline.append_to_ivf_index). Callers
        that know the delta's size can pass True/False to skip auto
        mode's routing count (one extra job over the delta lineage —
        persist the delta first if it is expensive to recompute).

        If THIS ROOT carries the dedup_state sidecar (a single-index
        CorpusPipeline root), the maintained ``n_indexed`` counter is
        bumped by the rows appended, under a fencing lease, mirroring
        ``delete`` — a direct append no longer silently diverges the
        counter the O(delta) handoff invariant rides on (round-12
        ADVICE item 1). NOTE: a direct append bypasses the pipeline's
        dedup state (no sigs, no labels) — later near-dup appends will
        not see these rows as corpus; for deduplicated corpora route
        deltas through CorpusPipeline.append. ``maintain_counter=False``
        is for writers that own the counter themselves (the pipeline's
        internal shard appends, which hold the lease and commit the
        final count in one place)."""
        from cloudvectordb_spark.operators.pipeline import append_to_ivf_index

        if maintain_counter and self._has_tracked_counter():
            from cloudvectordb_spark.versioning import acquire_lease

            lease = acquire_lease(self.path, owner="vector-append")
            rows = append_to_ivf_index(
                new_vectors, self.path, l0=l0, return_rows=True
            )
            if rows:
                self._bump_n_indexed(rows, lease)
            return
        append_to_ivf_index(new_vectors, self.path, l0=l0)

    def delete(self, vec_ids: list) -> int:
        """Eagerly drop ``vec_ids`` in place by rewriting only the
        cells that hold them (a bounded id set — for bulk expiry use
        the tombstone + compaction lifecycle instead). Returns the
        number of cells rewritten.

        If THIS ROOT carries the dedup_state sidecar (a single-index
        CorpusPipeline root — the primary), the maintained ``n_indexed``
        counter in the state meta is decremented by the rows actually
        removed, so the O(delta) append invariants stay exact after
        out-of-band deletes. The decrement is FENCED: a lease is
        acquired before the rewrite (any in-flight pipeline append
        aborts at its next epoch check instead of racing the counter),
        and a successor epoch appearing mid-update raises loudly with
        the verify="full" remedy (round-12 ADVICE item 2). CAVEAT: on
        a run_sharded fleet the state lives on the PRIMARY shard only,
        so a delete on a secondary shard cannot adjust the global
        counter (route fleet deletes through the pipeline, or follow
        with CorpusPipeline.append(..., verify="full"))."""
        from cloudvectordb_spark.operators.pipeline import (
            remove_vectors_from_index,
        )

        tracked = self._has_tracked_counter()
        lease = None
        if tracked:
            from cloudvectordb_spark.versioning import acquire_lease

            lease = acquire_lease(self.path, owner="vector-delete")
        cells, rows = remove_vectors_from_index(
            self.spark, self.path, vec_ids, return_rows=True
        )
        if rows and tracked:
            self._bump_n_indexed(-rows, lease)
        return cells

    def snapshot(self, out_path: str) -> "VectorIndex":
        """Pin the current layout as an immutable READER snapshot
        (full-tree hard-link: zero data copy, atomic publish). In-place
        writers — ``CorpusPipeline.append``'s demotion rewrites,
        ``delete`` — replace cell files under the live path; a reader
        that opened before the write would hit missing files mid-scan.
        A pinned snapshot keeps serving the exact pre-write results no
        matter what the live index rewrites (the IVF-layout counterpart
        of the postings store's manifest-pinned versions). Vacuum by
        removing the snapshot dir; data blocks free with the last link."""
        from cloudvectordb_spark.operators.pipeline import snapshot_ivf_index

        snapshot_ivf_index(self.path, out_path)
        return VectorIndex(self.spark, out_path)

    def compact(self, out_path: str) -> "VectorIndex":
        """Rewrite to one file per cell (small-files GC); returns the new
        index, leaving this one untouched (atomic publish)."""
        from cloudvectordb_spark.operators.pipeline import compact_ivf_index

        compact_ivf_index(self.spark, self.path, out_path)
        return VectorIndex(self.spark, out_path)

    def pin(self) -> "VectorIndex":
        """Mark this layout retention-exempt (`_PINNED` marker): it
        survives every ``vacuum_layouts`` until unpinned — the contract
        a reader fleet needs while it still serves from a snapshot."""
        from cloudvectordb_spark.operators.pipeline import pin_layout

        pin_layout(self.path)
        return self

    def unpin(self) -> "VectorIndex":
        from cloudvectordb_spark.operators.pipeline import unpin_layout

        unpin_layout(self.path)
        return self

    @staticmethod
    def vacuum_layouts(
        family_dir: str,
        live_path: str,
        keep: int = 2,
        pins: tuple = (),
        retire: tuple = (),
    ) -> dict:
        """Reclaim superseded layout roots for an index family — the
        retention half of the snapshot/compact/split lifecycle (each
        publishes a new root, none reclaims). Keeps the live tree,
        every pin (`pins` or on-disk `_PINNED`), and the `keep` newest
        others; REFUSES roots a writer lease fences; hard-link-aware
        byte accounting (a block counts as reclaimed only when its
        last link drops). See pipeline.vacuum_ivf_layouts."""
        from cloudvectordb_spark.operators.pipeline import vacuum_ivf_layouts

        return vacuum_ivf_layouts(
            family_dir, live_path, keep=keep, pins=pins, retire=retire
        )

    def split_hot_cells(
        self,
        out_path: str,
        factor: float = 2.0,
        target_rows: int | None = None,
    ) -> tuple["VectorIndex", dict]:
        """Re-split cells that grew past ``factor × target`` under
        frozen-centroid appends (the lifecycle third next to append and
        compact): each hot cell re-trains a deterministic mini-Lloyd
        over its own rows; unchanged cells hard-link into the new
        layout (no data movement), published atomically at ``out_path``.
        Returns (new index, split stats); this index stays untouched."""
        from cloudvectordb_spark.operators.pipeline import split_hot_cells

        stats = split_hot_cells(
            self.spark, self.path, out_path,
            factor=factor, target_rows=target_rows,
        )
        return VectorIndex(self.spark, out_path), stats

    def search_batch(
        self,
        probes: DataFrame,
        k: int = 10,
        nprobe: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Batched STRICT-nprobe ANN: the whole probe batch in one plan,
        each probe restricted to its OWN nprobe nearest cells (the
        serving-contract semantics `ivf_strict_nprobe_search` verifies;
        measured 7-20x over per-probe jobs at 1M, BASELINE.md)."""
        from cloudvectordb_spark.operators.pipeline import (
            ivf_batch_search_strict,
        )

        rows = probes.selectExpr(
            f"{id_col} as vec_id", f"{vec_col} as embedding"
        ).collect()
        return ivf_batch_search_strict(
            self.spark, self.vectors, rows, self.centroids(),
            nprobe=nprobe, k=k,
        )

    def search_adaptive(
        self,
        probes: DataFrame,
        k: int = 10,
        min_candidates: int = 60,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Candidate-count-adaptive batched ANN: each probe expands
        nearest-first through the cell histogram until the selected
        cells hold >= min_candidates vectors (the decision rule
        `ivf_adaptive_nprobe_search` value-oracles), then the strict
        batched kernel scores exactly those cells. The histogram is
        cached under the index's append-proof content fingerprint
        (repeat calls issue no count job) and the full per-probe cell
        ranking is one vectorized numpy pass per probe — the two
        round-10 driver-side ceilings."""
        from cloudvectordb_spark.operators.kmeans_det import (
            nearest_cells_batch,
        )
        from cloudvectordb_spark.operators.pipeline import (
            ivf_batch_search_strict,
            ivf_cell_histogram,
        )

        cents = self.centroids()
        counts = ivf_cell_histogram(self.spark, self.path, self.vectors)
        rows = probes.selectExpr(
            f"{id_col} as vec_id", f"{vec_col} as embedding"
        ).collect()
        ranked = nearest_cells_batch(
            [r.embedding for r in rows], cents, len(cents)
        )
        pc_pairs = []
        for r, cids_r in zip(rows, ranked):
            cum = 0
            for cid in cids_r:
                n = counts.get(cid, 0)
                if n == 0:
                    continue
                if cum >= min_candidates:
                    break
                pc_pairs.append((int(r.vec_id), int(cid)))
                cum += n
        return ivf_batch_search_strict(
            self.spark, self.vectors, rows, cents, k=k, pc_pairs=pc_pairs
        )


class TextIndex:
    """The keyword half of the engine as one object per fixture corpus:
    a persisted inverted index (postings + dl + stats + term_meta +
    positional + deletion-variants, `ensure_text_index` v4) with the
    serving surfaces composed from the oracle-verified operators —
    ranked search, batched serving, boolean operators, typo correction,
    autocomplete, and collection stats. Build is idempotent and
    fingerprint-keyed; every method serves from the artifacts, never
    the raw text."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        from cloudvectordb_spark.operators.search import ensure_text_index

        self.spark = spark
        self.sf_dir = sf_dir
        self.path = ensure_text_index(spark, sf_dir)

    @classmethod
    def open(cls, spark: SparkSession, sf_dir: str) -> "TextIndex":
        return cls(spark, sf_dir)

    def search(self, terms: tuple[str, ...], k: int = 20) -> DataFrame:
        """Top-k by BM25, served from query-term postings only."""
        from cloudvectordb_spark.operators.search import bm25_scores_indexed
        from cloudvectordb_spark.ranking import global_topk_ranked

        return global_topk_ranked(
            bm25_scores_indexed(self.spark, self.sf_dir, tuple(terms)),
            [F.desc("bm25"), F.asc("doc_id")],
            k,
        )

    def search_batch(
        self,
        batch: tuple[tuple[int, tuple[str, ...]], ...],
        k: int = 10,
    ) -> DataFrame:
        """A whole query batch in ONE plan (one postings scan for the
        union of query terms; measured 9.7-61x over per-query jobs,
        BASELINE.md)."""
        from cloudvectordb_spark.operators.search import (
            batch_topk_per_query,
            bm25_scores_batch,
        )

        return batch_topk_per_query(
            bm25_scores_batch(self.spark, self.sf_dir, tuple(batch)), k
        )

    def search_sharded(
        self,
        batch: tuple[tuple[int, tuple[str, ...]], ...],
        k: int = 10,
        n_shards: int = 2,
        concurrent: bool = True,
    ) -> DataFrame:
        """Batch serving over S INDEPENDENT postings shards with
        globally-consistent BM25 — the text-side fleet topology,
        mirroring VectorIndex.search_sharded. Each shard generates
        candidates from its own postings scan but scores under the
        MERGED global statistics (n_docs/avgdl/df combine by exact
        integer sums — the mergeable algebra proven lossless by
        ``bm25_pruned_merged_bounds``), so per-doc scores are
        bit-identical to the monolithic index and the k*S merge is
        lossless: results hash-match ``search_batch`` (value-oracled
        by the registered `bm25_batch_sharded` query; shard-count
        invariance pytest-pinned). Output carries the winning shard's
        ordinal."""
        from cloudvectordb_spark.operators.search import (
            sharded_bm25_topk_batch,
        )

        return sharded_bm25_topk_batch(
            self.spark,
            self.sf_dir,
            tuple(batch),
            k,
            n_shards=n_shards,
            concurrent=concurrent,
        )

    def search_boolean(
        self,
        must: tuple[str, ...],
        must_not: tuple[str, ...] = (),
        k: int = 20,
    ) -> DataFrame:
        """MUST/MUST_NOT search (Lucene full-index idf semantics)."""
        from cloudvectordb_spark.operators.search import bm25_boolean_scores
        from cloudvectordb_spark.ranking import global_topk_ranked

        return global_topk_ranked(
            bm25_boolean_scores(
                self.spark, self.sf_dir, tuple(must), tuple(must_not)
            ),
            [F.desc("bm25"), F.asc("doc_id")],
            k,
        )

    def correct(self, terms: tuple[str, ...]) -> DataFrame:
        """(query_term, term, dist, df) typo candidates within
        Levenshtein distance 1, from the persisted variant artifact."""
        from cloudvectordb_spark.operators.search import _fuzzy_hits

        return _fuzzy_hits(self.spark, self.sf_dir, tuple(terms))

    def complete(self, prefix: str, k: int = 10) -> DataFrame:
        """Top-k prefix completions by df (term_meta only)."""
        from cloudvectordb_spark.operators.search import prefix_completions

        return prefix_completions(self.spark, self.sf_dir, prefix, k)

    def stats(self) -> DataFrame:
        """One-row collection statistics from the artifacts."""
        from cloudvectordb_spark.operators.search import text_index_stats

        return text_index_stats(self.spark, self.sf_dir)

    def phrase(self, phrase: tuple[str, ...], k: int = 20) -> DataFrame:
        """Top-k docs by exact consecutive-phrase occurrence count,
        served from the positional postings."""
        from cloudvectordb_spark.operators.search import phrase_match_counts
        from cloudvectordb_spark.ranking import global_topk_ranked

        return global_topk_ranked(
            phrase_match_counts(self.spark, self.sf_dir, tuple(phrase)),
            [F.desc("n_occurrences"), F.asc("doc_id")],
            k,
        )

    def search_sparse(
        self, qweights: tuple[tuple[str, float], ...], k: int = 20
    ) -> DataFrame:
        """Learned-sparse (SPLADE-shape) retrieval: query term-weight
        vector dotted against doc tf-idf, served from the same postings
        artifacts."""
        from cloudvectordb_spark.operators.search import sparse_dot_scores
        from cloudvectordb_spark.ranking import global_topk_ranked

        return global_topk_ranked(
            sparse_dot_scores(self.spark, self.sf_dir, tuple(qweights)),
            [F.desc("score"), F.asc("doc_id")],
            k,
        )



class HybridIndex:
    """Both retrieval modalities over one corpus as one object: the
    persisted inverted index (TextIndex) and an IVF vector index
    (VectorIndex), fused per query batch with reciprocal-rank fusion —
    the serving shape tools/hybrid_scale_probe.py measured at 1M docs
    (the fused single plan is CHEAPER than its two legs run back to
    back: both legs and the merge schedule as one job). The RRF
    constant (1/(60+rank)) is the registered `hybrid_rrf_batch`
    query's, value-oracled at fixture scale; the facade is
    parity-pinned against it in pytest."""

    RRF_K = 60

    def __init__(self, text: TextIndex, vectors, text_shards: int = 1):
        """``vectors``: one VectorIndex, or a LIST of shard indexes —
        the fleet topology. With shards, the vector leg goes through
        ``VectorIndex.search_sharded`` (lossless k*S merge, concurrent
        fan-out) and the fusion is unchanged; pytest pins the sharded
        hybrid == the monolithic hybrid at full cell coverage.

        ``text_shards > 1`` shards the TEXT leg the same way: BM25
        candidates come from S independent postings shards scored
        under merged global stats (``TextIndex.search_sharded``, score-
        exact vs the monolithic index), so a fully-sharded hybrid —
        both legs fleet-topology — is pytest-pinned bit-equal to the
        monolithic hybrid."""
        self.text = text
        self.vectors = vectors
        self.text_shards = text_shards

    def search_batch(
        self,
        queries: tuple[tuple[int, tuple[str, ...]], ...],
        probes: DataFrame,
        k: int = 10,
        leg_n: int = 60,
        nprobe: int = 8,
    ) -> DataFrame:
        """One fused plan per batch: BM25 top-``leg_n`` per query from
        the postings + strict-nprobe vector top-``leg_n`` per probe,
        full-outer joined on (query_id, doc_id), RRF-scored, top-``k``.
        ``queries`` and ``probes`` pair by id (query_id == probe
        vec_id)."""
        from pyspark.sql import Window

        from cloudvectordb_spark.operators.search import (
            batch_topk_per_query,
            bm25_scores_batch,
        )

        if self.text_shards > 1:
            bm = self.text.search_sharded(
                tuple(queries), k=leg_n, n_shards=self.text_shards
            ).select("query_id", "doc_id", F.col("rank").alias("krank"))
        else:
            bm = batch_topk_per_query(
                bm25_scores_batch(
                    self.text.spark, self.text.sf_dir, tuple(queries)
                ),
                leg_n,
            ).select("query_id", "doc_id", F.col("rank").alias("krank"))
        if isinstance(self.vectors, (list, tuple)):
            vec_leg = VectorIndex.search_sharded(
                list(self.vectors), probes, k=leg_n, nprobe=nprobe
            )
        else:
            vec_leg = self.vectors.search_batch(probes, k=leg_n, nprobe=nprobe)
        vec = vec_leg.select(
            F.col("probe_id").cast("int").alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("vrank"),
        )
        fused = bm.join(vec, ["query_id", "doc_id"], "full_outer").select(
            "query_id",
            "doc_id",
            F.round(
                F.coalesce(1.0 / (self.RRF_K + F.col("krank")), F.lit(0.0))
                + F.coalesce(1.0 / (self.RRF_K + F.col("vrank")), F.lit(0.0)),
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


def _corpus_sigs_cached(spark: SparkSession, sd: str):
    """Back-compat shim over ``operators.sigstate.corpus_sig_state``
    (round-13 verdict #1 moved the state cache there): returns the
    state's memoized lazy-union (sigs, bands) frames. The union is a
    view over per-generation persisted frames — scanning it reads each
    generation from ITS OWN cache; nothing is ever union-re-persisted
    (the round-12 shape copied the WHOLE state through the block store
    on every append — a hidden ∝-state term this removes). The frames
    carry the layout's bucket columns (sbucket / bucket) alongside the
    classic (doc_id, sig) / (corpus_id, band, key)."""
    from cloudvectordb_spark.operators.sigstate import corpus_sig_state

    state = corpus_sig_state(spark, sd)
    return state._union(0), state._union(1)


def _corpus_sigs_release_prev(spark: SparkSession, sd: str) -> None:
    """Release superseded cache generations once the current probe has
    materialized (folds and full reloads defer their predecessors'
    unpersist until here, so a roll never forces a disk re-read)."""
    from cloudvectordb_spark.cache import session_key
    from cloudvectordb_spark.operators.sigstate import _STATES

    state = _STATES.get((sd, session_key(spark)))
    if state is not None:
        state.release_pending()


class CorpusPipeline:
    """The composed reference lifecycle (S1→S4: raw docs → near-dup
    dedup → embed → vectordb) as ONE ergonomic call — the same
    composition tools/e2e_scale_probe.py rehearses at 10M docs, here
    as a library surface with stage handoffs asserted inline.

    >>> result = CorpusPipeline.run(spark, docs_df, "/idx/path", k=8)
    >>> result["index"].search(probes, k=10)

    ``encoder``: optional (texts: np.ndarray) -> np.ndarray override
    for the stub encoder — the real-model plug point. It receives each
    Arrow batch's TEXT column (``text_col``, default ``text``) as a
    numpy object array and returns one (len(texts), dim) float32 row
    per input; doc_ids never leave the frame, so a sentence-transformer
    style model plugs in directly with no id->text side lookup
    (round-10 ADVICE item 1). The Spark plumbing (Arrow batches,
    mapInPandas, one load per worker) is identical either way. Every
    stage is keyed joins/groupBys — never all-pairs, never a
    driver-side corpus loop — so the composition inherits each piece's
    measured scale shape."""

    # target rows per cell for the auto-sized index: matches the capped
    # dedup kernel's per-task bound and the measured serving sweet spot
    # (cells around this size keep probe scans ~1 file / few MB each)
    _ROWS_PER_CELL = 4096
    # largest delta whose bands+sigs still broadcast in append's
    # incremental dedup join (~4 band rows + an 8-slot sig per doc —
    # 500k docs is ~100-200 MB of broadcast state); bigger deltas fall
    # back to symmetric shuffle joins
    _BROADCAST_DELTA_MAX = 500_000

    @staticmethod
    def _embed(survivors: DataFrame, encoder, text_col: str) -> DataFrame:
        """Survivors -> (doc_id, embedding). With ``encoder`` the model
        sees the TEXT batch; ids ride alongside only to key the output
        frame — a real text-embedding model needs no id->text lookup
        inside the worker (round-10 ADVICE item 1)."""
        from cloudvectordb_spark.operators.pipeline import embed_documents

        if encoder is None:
            return embed_documents(survivors)

        def run_enc(batches):
            import pandas as _pd  # worker-side

            for pdf in batches:
                ids = pdf["doc_id"].to_numpy()
                texts = pdf[text_col].to_numpy()
                vecs = encoder(texts)
                if len(vecs) != len(ids):
                    raise RuntimeError(
                        "encoder contract violated: "
                        f"{len(ids)} texts in, {len(vecs)} embeddings out"
                    )
                yield _pd.DataFrame({"doc_id": ids, "embedding": list(vecs)})

        return survivors.select("doc_id", text_col).mapInPandas(
            run_enc, schema="doc_id long, embedding array<float>"
        )

    @staticmethod
    def _state_dir(index_path: str) -> str:
        return f"{index_path}/dedup_state"

    @staticmethod
    def _write_state_meta(index_path: str, meta: dict) -> None:
        import json
        import os

        sd = CorpusPipeline._state_dir(index_path)
        os.makedirs(sd, exist_ok=True)
        tmp = os.path.join(sd, ".meta.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.rename(tmp, os.path.join(sd, "meta.json"))

    @staticmethod
    def _read_state_meta(index_path: str) -> dict:
        import json
        import os

        p = os.path.join(CorpusPipeline._state_dir(index_path), "meta.json")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"no dedup state at {p} — CorpusPipeline.append only "
                "extends an index built by CorpusPipeline.run (which "
                "persists the MinHash signatures and canonical labels "
                "the delta dedups against); rebuild via run() first"
            )
        with open(p) as f:
            return json.load(f)

    @staticmethod
    def _global_dedup(
        spark: SparkSession,
        docs: DataFrame,
        state_root: str,
        tau: float,
        hasher: str,
    ):
        """Shared S1 front half of run()/run_sharded(): MinHash sigs
        materialized FIRST into the append state (one shingle+hash pass
        over the corpus text, ever — pairs and state read the parquet
        back), banded pairs, CC canonicalization, survivors. Returns
        (survivors, labels)."""
        from cloudvectordb_spark.operators.dedup import (
            connected_components,
            minhash_pairs_within,
            minhash_sigs,
        )

        sd = CorpusPipeline._state_dir(state_root)
        minhash_sigs(docs, hasher=hasher).write.mode("overwrite").parquet(
            f"{sd}/sigs"
        )
        sigs = spark.read.parquet(f"{sd}/sigs")
        pairs = (
            minhash_pairs_within(sigs)
            .filter(F.col("est_jaccard") >= tau)
            .select("a_id", "b_id")
        )
        labels = connected_components(pairs, src="a_id", dst="b_id")
        doomed = labels.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        return docs.join(doomed, "doc_id", "left_anti"), labels

    @staticmethod
    def _finish_state(
        spark: SparkSession,
        docs: DataFrame,
        state_root: str,
        labels,
        meta_extra: dict,
    ) -> None:
        """Back half of the run state: NON-IDENTITY canonical labels
        (rows ∝ duplicates, not corpus) then meta.json LAST — a crash
        mid-state-write leaves no meta, so append() refuses rather than
        reading half a state."""
        sd = CorpusPipeline._state_dir(state_root)
        labels.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id"), F.col("component").alias("canonical")
        ).write.mode("overwrite").parquet(f"{sd}/labels")
        stats = docs.agg(
            F.count("*").alias("n"), F.max("doc_id").alias("mx")
        ).first()
        CorpusPipeline._write_state_meta(
            state_root,
            {
                "n_docs": int(stats.n),
                "max_doc_id": int(stats.mx),
                **meta_extra,
            },
        )

    @staticmethod
    def _shard_of(S: int):
        """The md5 shard-routing expression (shared by build and
        append so a vector always lands on the same shard)."""
        return F.pmod(
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint"),
            F.lit(S),
        ).cast("int")

    @staticmethod
    def run(
        spark: SparkSession,
        docs: DataFrame,
        index_path: str,
        tau: float = 0.5,
        k: int | None = None,
        encoder=None,
        hasher: str = "fast",
        text_col: str = "text",
    ) -> dict:
        # "fast" = xxhash64 permutations (JVM columns, ~3x cheaper at
        # 10M docs, pytest recall-pinned); "md5" = the oracle-replayable
        # scheme the registered queries verify against. The sig->band->
        # verify composition is value-identical to the fused
        # minhash_banded_pairs_{fast,df} pipelines (pytest-pinned); it
        # is split at the SIGNATURE so the sigs persist as append state.
        n_docs = docs.count()
        survivors, labels = CorpusPipeline._global_dedup(
            spark, docs, index_path, tau, hasher
        )

        embedded = CorpusPipeline._embed(survivors, encoder, text_col)
        # PERSIST before the build: the trainer's fit filter cannot push
        # below mapInPandas, so an unmaterialized encoder lineage would
        # re-run model inference over every survivor once per Lloyd
        # round plus the final assign/write (~5x the most expensive
        # stage with a real model plugged in — the e2e rehearsal writes
        # this frame to parquet between stages for the same reason)
        from pyspark import StorageLevel

        vectors = embedded.select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n_surv = vectors.count()  # materializes; == survivor count (1:1 map)
            if k is None:
                # self-scaling k (the rescore_c discipline applied to the
                # build knob): ~_ROWS_PER_CELL rows per cell, floor 8 so
                # tiny corpora keep the fixture shape, cap 65536; above
                # _FLAT_K_MAX the build auto-routes to the two-level IMI,
                # so the build cost stays flat in k either way
                k = max(8, min(65536, n_surv // CorpusPipeline._ROWS_PER_CELL))
            idx = VectorIndex.build(spark, vectors, index_path, k=k)
            # stage handoffs, validated exactly like the 10M rehearsal
            # (real exceptions, not asserts — python -O must not strip
            # the library surface's only handoff check)
            n_indexed = idx.vectors.count()
            n_distinct = idx.vectors.select("vec_id").distinct().count()
            if not (n_indexed == n_surv == n_distinct):
                raise RuntimeError(
                    "corpus pipeline handoff violated: "
                    f"docs={n_docs} survivors/embedded={n_surv} "
                    f"indexed={n_indexed} distinct_vec_ids={n_distinct}"
                )
        finally:
            vectors.unpersist()
        CorpusPipeline._finish_state(
            spark,
            docs,
            index_path,
            labels,
            {
                "hasher": hasher,
                "tau": tau,
                "text_col": text_col,
                "shards": 1,
                "n_indexed": n_indexed,
            },
        )
        return {
            "docs": n_docs,
            "survivors": n_surv,
            "removed": n_docs - n_surv,
            "indexed": n_indexed,
            "k": k,
            "index": idx,
        }

    @staticmethod
    def run_sharded(
        spark: SparkSession,
        docs: DataFrame,
        index_paths: list,
        tau: float = 0.5,
        k: int | None = None,
        encoder=None,
        hasher: str = "fast",
        text_col: str = "text",
    ) -> dict:
        """The fleet topology in one call: GLOBAL near-dup dedup (a
        duplicate pair must die even when its two docs land on
        different shards, so dedup runs before the split), then the
        survivors md5-split across ``len(index_paths)`` independent
        index builds — each shard owns its layout, its build lifecycle
        and, on a real fleet, its executors. Serving goes through
        ``VectorIndex.search_sharded`` (lossless k*S merge, value-
        oracled by `sharded_knn_merge`; concurrent fan-out measured in
        tools/sharded_serve_probe.py). Pytest pins: union of shard
        contents == the unsharded run's index, shards disjoint, and
        full-coverage sharded search == unsharded exact top-k.

        ``k`` is PER SHARD (auto-sized from each shard's row count when
        None — the same rows-per-cell rule as run())."""
        S = len(index_paths)
        if S < 2:
            raise ValueError("run_sharded wants >= 2 index paths; use run()")
        from pyspark import StorageLevel

        state_root = index_paths[0]  # the primary shard holds the state
        n_docs = docs.count()
        survivors, labels = CorpusPipeline._global_dedup(
            spark, docs, state_root, tau, hasher
        )
        vectors = (
            CorpusPipeline._embed(survivors, encoder, text_col)
            .select(F.col("doc_id").alias("vec_id"), "embedding")
            .withColumn("_shard", CorpusPipeline._shard_of(S))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            n_surv = vectors.count()

            # the S shard builds are independent job chains over the
            # same persisted frame — submit them from S driver threads
            # so their stages overlap in the scheduler instead of
            # serializing (the build-side mirror of search_sharded's
            # concurrent fan-out; on a real fleet each shard also gets
            # its own executors). Outputs are deterministic either way:
            # each build is a self-contained deterministic trainer
            # writing its own path.
            def _build_one(s_path):
                s, path = s_path
                part = vectors.filter(F.col("_shard") == s).drop("_shard")
                n_part = part.count()
                ks = k or max(
                    8, min(65536, n_part // CorpusPipeline._ROWS_PER_CELL)
                )
                return s, VectorIndex.build(spark, part, path, k=ks), n_part

            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=S) as pool:
                built = sorted(
                    pool.map(_build_one, enumerate(index_paths)),
                    key=lambda t: t[0],
                )
            shards = [ix for _, ix, _ in built]
            shard_rows = [n for _, _, n in built]
            n_indexed = sum(
                idx.vectors.count() for idx in shards
            )
            if not (n_indexed == n_surv == sum(shard_rows)):
                raise RuntimeError(
                    "sharded pipeline handoff violated: "
                    f"survivors={n_surv} shard_rows={shard_rows} "
                    f"indexed={n_indexed}"
                )
        finally:
            vectors.unpersist()
        CorpusPipeline._finish_state(
            spark,
            docs,
            state_root,
            labels,
            {
                "hasher": hasher,
                "tau": tau,
                "text_col": text_col,
                "shards": S,
                "n_indexed": n_indexed,
            },
        )
        return {
            "docs": n_docs,
            "survivors": n_surv,
            "removed": n_docs - n_surv,
            "indexed": n_indexed,
            "shard_rows": shard_rows,
            "shards": shards,
        }

    @staticmethod
    def _snapshot_guard(
        spark: SparkSession, indexes: list, run, lease: int
    ) -> dict:
        """Crash-atomic wrapper for the append paths (``safe=True``):
        hard-link-snapshot every shard root BEFORE the first mutation
        (near-free: O(files) metadata ops, zero data copy), run the
        append, and on failure swap the snapshots back — the index and
        its dedup state return to the exact pre-append bytes, so the
        caller just retries. The live ``leases`` dir is carried across
        a restore (it is excluded from snapshots) so fencing epochs
        stay monotonic through a rollback.

        FENCING vs ROLLBACK: the restore only runs while THIS writer
        still holds the newest epoch on the state root. If the failure
        is a ``CommitConflict`` — or any failure observed after a newer
        epoch appeared — a successor writer owns the tree, and swapping
        our pre-append snapshot back would silently revert the
        successor's committed mutations (and yank the layout out from
        under it mid-append). In that case the snapshots are deleted
        and the error re-raised: recovery belongs to the newest-epoch
        writer, whose own guard snapshotted whatever state it took
        over.

        A pre-existing ``.pre_append*`` sibling means a previous
        ``safe=True`` append died hard (its snapshot is the documented
        manual restore point) — we REFUSE to start rather than
        silently destroy it or crash later on the restore rename."""
        import glob
        import os
        import shutil

        from cloudvectordb_spark.operators.pipeline import snapshot_ivf_index
        from cloudvectordb_spark.versioning import CommitConflict, _max_epoch

        state_root = indexes[0].path
        snaps = []
        try:
            for ix in indexes:
                stale = glob.glob(f"{ix.path}.pre_append*")
                if stale:
                    raise RuntimeError(
                        f"stale pre-append snapshot(s) {stale} exist — a "
                        "previous safe append died mid-flight. Restore "
                        "the snapshot over the root (or delete it if the "
                        "live tree is known good) before appending again."
                    )
                snap = f"{ix.path}.pre_append{os.getpid()}"
                snapshot_ivf_index(ix.path, snap)
                snaps.append((ix.path, snap))
        except BaseException:
            # partial snapshot set is useless — don't leak earlier
            # shards' snapshots (they'd trip the stale check forever)
            for _, snap in snaps:
                shutil.rmtree(snap, ignore_errors=True)
            raise
        try:
            out = run()
        except BaseException as exc:
            fenced = isinstance(exc, CommitConflict) or (
                _max_epoch(state_root) > lease
            )
            if fenced:
                # a newer writer owns the tree: its committed work is
                # in there, so our pre-append bytes are not a valid
                # restore point for ANYONE anymore — drop them.
                for _, snap in snaps:
                    shutil.rmtree(snap, ignore_errors=True)
                raise
            for path, snap in reversed(snaps):
                broken = f"{path}.broken{os.getpid()}"
                os.rename(path, broken)
                os.rename(snap, path)
                # fencing state lives only in the live tree: keep it
                leases = os.path.join(broken, "leases")
                if os.path.isdir(leases):
                    os.rename(leases, os.path.join(path, "leases"))
                shutil.rmtree(broken)
            raise
        for _, snap in snaps:
            shutil.rmtree(snap)
        return out

    @staticmethod
    def append_sharded(
        spark: SparkSession,
        index_paths: list,
        delta_docs: DataFrame,
        encoder=None,
        lease: int | None = None,
        safe: bool = False,
        verify: str = "fast",
        sig_shards: int = 1,
    ) -> dict:
        """Incremental append for a run_sharded() fleet: ONE global
        delta dedup against the state on the primary shard (the same
        increment == rebuild semantics as append()), then survivors
        route to their md5 shard and demoted canonicals are removed
        from whichever shard holds them. Fenced on the primary shard's
        root. Pytest pins append_sharded(delta) == run_sharded(corpus ∪
        delta) on the union-of-shards contents."""
        shards = [VectorIndex.open(spark, p) for p in index_paths]
        meta = CorpusPipeline._read_state_meta(index_paths[0])
        if meta.get("shards") != len(index_paths):
            raise ValueError(
                f"state at {index_paths[0]} was built for "
                f"{meta.get('shards')} shard(s); got {len(index_paths)} "
                "paths — the md5 routing would disagree with the layout"
            )
        if safe and lease is None:
            from cloudvectordb_spark.versioning import acquire_lease

            lease = acquire_lease(index_paths[0], owner="corpus-append")

        def run():
            return CorpusPipeline._append_impl(
                spark,
                state_root=index_paths[0],
                indexes=shards,
                delta_docs=delta_docs,
                encoder=encoder,
                lease=lease,
                verify=verify,
                sig_shards=sig_shards,
            )

        if safe:
            return CorpusPipeline._snapshot_guard(spark, shards, run, lease)
        return run()

    @staticmethod
    def append(
        spark: SparkSession,
        index_path: str,
        delta_docs: DataFrame,
        encoder=None,
        lease: int | None = None,
        safe: bool = False,
        verify: str = "fast",
        sig_shards: int = 1,
    ) -> dict:
        """Incremental S1→S4 over a NEW batch of docs, cost ∝ delta
        (round-10 verdict #7): the delta is near-dup-deduped within
        itself AND against the persisted corpus signatures (a banded
        equi-join against narrow sig state — the corpus text is never
        re-shingled, the corpus vectors never re-embedded), survivors
        embed through the same encoder plumbing as run(), and land in
        the index under FROZEN centroids (VectorIndex.append).

        Semantics match a full rebuild — pytest pins
        ``append(delta) == run(corpus ∪ delta)`` on the indexed
        (vec_id, embedding) set, both-direction exceptAll — including
        the two subtle cases:

        - a delta doc that near-dups a REMOVED corpus doc joins that
          doc's cluster through the persisted canonical labels (the
          removed doc's signature is still in state);
        - a delta doc that BRIDGES two existing clusters merges them:
          the losing canonical (min-label rule) is demoted — physically
          deleted from the index by rewriting only its cells — exactly
          what the rebuild would have produced.

        Requires ``min(delta doc_id) > max(corpus doc_id)`` (the
        append-log id discipline): min-label canonicalization keeps
        every existing canonical canonical unless a merge demotes it,
        which is what makes increment == rebuild provable. Raises
        ValueError otherwise.

        CONCURRENCY: append is a multi-dir in-place mutation (vector
        appends + demotion rewrites + state roll), so it fences like
        the streaming writers — it acquires a ``versioning`` epoch on
        the index root (or takes ``lease`` from a caller that manages
        its own generations) and re-checks it before every mutation
        phase and before the meta commit; a writer fenced by a newer
        epoch dies with CommitConflict instead of interleaving.

        CRASH SEMANTICS: with ``safe=True`` the append is crash-atomic
        against in-process failures — every index root is hard-link-
        snapshotted before the first mutation (near-free metadata op)
        and swapped back on failure, so the index and its dedup state
        return to the exact pre-append bytes and the caller just
        retries (pytest-pinned, including a failure injected between
        the demotion rewrite and the vector append). EXCEPTION: a
        writer fenced out by a newer epoch (CommitConflict, or any
        failure once a newer epoch exists) re-raises WITHOUT restoring
        — the successor writer's committed mutations are in the tree
        and rolling them back would lose its data; recovery belongs to
        the newest-epoch writer. Default
        ``safe=False`` keeps the bare path: a crash MID-append leaves
        the index mutated with the meta NOT rolled (meta commits last)
        — the layout still serves correctly, but the next append must
        not trust half-rolled sigs; recover by re-running run() or by
        restoring a ``VectorIndex.snapshot``. A hard process KILL under
        ``safe=True`` leaves the ``.pre_append`` snapshot dir next to
        the root as the manual restore point. Either way the fence
        guarantees two live appends never interleave."""
        idx = VectorIndex.open(spark, index_path)
        if safe and lease is None:
            from cloudvectordb_spark.versioning import acquire_lease

            lease = acquire_lease(index_path, owner="corpus-append")

        def run():
            return CorpusPipeline._append_impl(
                spark,
                state_root=index_path,
                indexes=[idx],
                delta_docs=delta_docs,
                encoder=encoder,
                lease=lease,
                verify=verify,
                sig_shards=sig_shards,
            )

        if safe:
            return CorpusPipeline._snapshot_guard(spark, [idx], run, lease)
        return run()

    @staticmethod
    def _append_impl(
        spark: SparkSession,
        state_root: str,
        indexes: list,
        delta_docs: DataFrame,
        encoder,
        lease: int | None,
        verify: str = "fast",
        sig_shards: int = 1,
    ) -> dict:
        import hashlib
        import os
        import shutil
        import time

        from cloudvectordb_spark.operators.dedup import (
            connected_components,
            minhash_pairs_between_state,
            minhash_pairs_within,
            minhash_sigs,
        )
        from pyspark import StorageLevel

        S = len(indexes)
        walls: dict = {}
        t0 = time.perf_counter()

        def _lap(stage: str) -> None:
            nonlocal t0
            walls[stage] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()

        from cloudvectordb_spark.versioning import (
            CommitConflict,
            _max_epoch,
            acquire_lease,
        )

        meta = CorpusPipeline._read_state_meta(state_root)
        tau, hasher = meta["tau"], meta["hasher"]
        text_col = meta.get("text_col", "text")
        sd = CorpusPipeline._state_dir(state_root)
        if lease is None:
            lease = acquire_lease(state_root, owner="corpus-append")

        def _fence(at: str) -> None:
            newest = _max_epoch(state_root)
            if newest > lease:
                raise CommitConflict(
                    f"append epoch {lease} fenced by newer epoch {newest} "
                    f"at {at} — another writer owns {state_root}"
                )

        def _total_count() -> int:
            return sum(ix.vectors.count() for ix in indexes)

        def _shard_of_py(vid: int) -> int:
            # MUST match _shard_of's SQL expression (md5 hex prefix)
            return (
                int(hashlib.md5(str(vid).encode()).hexdigest()[:8], 16) % S
            )

        _fence("start")

        n_delta = delta_docs.count()
        # corpus-wide stats come from the atomically-committed state
        # meta, MAINTAINED across appends instead of recounted — the
        # fused post-append count+distinct over the whole index was the
        # last ∝-corpus term in the append wall (~8 s at 10M for a 10k
        # delta; round-11 verdict #4). Legacy states (pre-n_indexed)
        # fall back to one physical count and start the counter.
        n_tracked = meta.get("n_indexed")
        if n_tracked is None:
            n_tracked = _total_count()
        if n_delta == 0:
            return {
                "delta": 0, "survivors": 0, "removed": 0, "demoted": 0,
                "indexed": n_tracked,
                "index": indexes[0], "shards": indexes,
            }
        bounds = delta_docs.agg(
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
            F.count_distinct("doc_id").alias("nd"),
        ).first()
        if bounds.lo <= meta["max_doc_id"] or bounds.nd != n_delta:
            raise ValueError(
                "append requires fresh, distinct doc_ids above the "
                f"corpus max ({meta['max_doc_id']}); got min={bounds.lo} "
                f"distinct={bounds.nd} of {n_delta}"
            )

        # the corpus sig state: bucketed, generation-rolled, persisted
        # per generation (operators/sigstate.py, round-13 verdict #1) —
        # a repeat append persists ONLY the previous delta's sigs/bands
        # (∝ delta), and the candidate/verify scans batch-prune to the
        # delta's touched band buckets (∝ touched buckets, flat in
        # corpus for a bounded delta)
        from cloudvectordb_spark.operators.sigstate import corpus_sig_state

        state = corpus_sig_state(spark, sd, n_hint=meta["n_docs"])
        _lap("state_load_s")
        labels = spark.read.parquet(f"{sd}/labels")  # doc_id -> canonical
        sigs_delta = minhash_sigs(delta_docs, hasher=hasher).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        sigs_delta.count()  # materialize: the ∝-delta shingle+hash pass
        _lap("delta_sig_s")
        comp = None
        probe_stats: dict = {}
        try:
            pairs_dd = (
                minhash_pairs_within(sigs_delta)
                .filter(F.col("est_jaccard") >= tau)
                .select("a_id", "b_id")
            )
            # delta-vs-corpus matches, compressed through each corpus
            # doc's canonical: connectivity through REMOVED corpus docs
            # is preserved (their sigs are state), and the edge list
            # stays ∝ delta matches. The delta side broadcasts only
            # while it is broadcast-SIZED (each delta doc is ~4 band
            # rows + one 8-slot sig); past the cap the join falls back
            # to symmetric shuffles — results identical either way
            # sig_shards > 1 opts the corpus probe into the
            # scatter-gather fleet path (round 14): S bucket-range legs
            # each range-prune to ~state/S rows — pair-set identical to
            # the single-state probe (pytest-pinned), so the dedup
            # semantics are unchanged; on one box prefer the default
            # (the warm full scan beats S-way job overhead — measured,
            # BASELINE.md round-14 sig-shard table).
            if sig_shards > 1:
                from cloudvectordb_spark.operators.dedup import (
                    minhash_pairs_between_sharded,
                )
                from cloudvectordb_spark.operators.sigstate import (
                    ShardedSigState,
                )

                probe_pairs = minhash_pairs_between_sharded(
                    sigs_delta,
                    ShardedSigState(state, sig_shards),
                    stats=probe_stats,
                )
            else:
                probe_pairs = minhash_pairs_between_state(
                    sigs_delta,
                    state,
                    broadcast_new=n_delta
                    <= CorpusPipeline._BROADCAST_DELTA_MAX,
                    n_new=n_delta,
                    stats=probe_stats,
                )
            cross = (
                probe_pairs
                .filter(F.col("est_jaccard") >= tau)
                .join(labels, F.col("corpus_id") == labels.doc_id, "left")
                .select(
                    F.coalesce("canonical", "corpus_id").alias("a_id"),
                    F.col("new_id").alias("b_id"),
                )
                .distinct()
            )
            comp = connected_components(
                pairs_dd.unionByName(cross), src="a_id", dst="b_id"
            ).persist(StorageLevel.MEMORY_AND_DISK)
            _lap("dedup_cc_s")
            lo = int(bounds.lo)
            delta_removed = comp.filter(
                (F.col("node") >= lo) & (F.col("node") != F.col("component"))
            ).select(F.col("node").alias("doc_id"))
            n_removed = delta_removed.count()
            survivors = delta_docs.join(delta_removed, "doc_id", "left_anti")
            # a bridge merge demotes the larger of two corpus canonicals
            # (bounded: one row per cluster the delta touched)
            demoted = {
                int(r.node): int(r.component)
                for r in comp.filter(
                    (F.col("node") < lo) & (F.col("node") != F.col("component"))
                ).collect()
            }
            # comp is materialized now, so frames in ITS lineage (the
            # probe's persisted candidate set) and any superseded cache
            # generations (a fold's inputs) can release their storage
            _corpus_sigs_release_prev(spark, sd)

            _lap("labels_survivors_s")
            n_before = n_tracked
            _fence("pre-demotion")
            rows_demoted = 0
            if demoted:
                # each demoted canonical lives on exactly one md5 shard;
                # the per-shard rewrites are independent (disjoint
                # paths), so they submit concurrently like the shard
                # builds/searches do
                from concurrent.futures import ThreadPoolExecutor

                by_shard: dict[int, list[int]] = {}
                for d in sorted(demoted):
                    by_shard.setdefault(
                        _shard_of_py(d) if S > 1 else 0, []
                    ).append(d)
                with ThreadPoolExecutor(max_workers=len(by_shard)) as pool:
                    rows_demoted = sum(
                        pool.map(
                            lambda si: CorpusPipeline._remove_from_index(
                                spark, indexes[si[0]].path, si[1]
                            ),
                            by_shard.items(),
                        )
                    )
            _lap("demotion_s")

            vectors = (
                CorpusPipeline._embed(survivors, encoder, text_col)
                .select(F.col("doc_id").alias("vec_id"), "embedding")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            try:
                n_surv = vectors.count()
                _fence("pre-append")
                if n_surv and S == 1:
                    # the pipeline holds the lease and commits the final
                    # count itself — the per-index counter bump (which
                    # acquires its OWN lease and would fence this very
                    # append) must not run here
                    indexes[0].append(vectors, maintain_counter=False)
                elif n_surv:
                    # per-shard appends write disjoint paths from the
                    # same persisted frame — concurrent submission,
                    # like the shard builds
                    from concurrent.futures import ThreadPoolExecutor

                    routed = vectors.withColumn(
                        "_shard", CorpusPipeline._shard_of(S)
                    )

                    def _append_one(s_ix):
                        s, ix = s_ix
                        ix.append(
                            routed.filter(F.col("_shard") == s).drop("_shard"),
                            maintain_counter=False,
                        )

                    with ThreadPoolExecutor(max_workers=S) as pool:
                        list(pool.map(_append_one, enumerate(indexes)))
                _lap("embed_append_s")
                # O(delta) handoff check: every term is maintained or
                # bounded — n_surv/n_removed are delta-side counts, and
                # rows_demoted comes from the demotion rewrite's own
                # partition-pruned cell accounting. Each demoted
                # canonical must have been indexed EXACTLY once
                # (rows_demoted == len(demoted)): together with fresh
                # distinct delta ids (enforced at entry) this carries
                # the corpus-wide distinctness invariant inductively,
                # with no ∝-corpus recount. ``verify="full"`` (the
                # escape hatch for auditing a state of unknown
                # provenance) additionally recounts the physical union
                # and cross-checks the maintained counter.
                n_after = n_before - rows_demoted + n_surv
                if not (
                    n_surv + n_removed == n_delta
                    and rows_demoted == len(demoted)
                ):
                    raise RuntimeError(
                        "append handoff violated: "
                        f"delta={n_delta} survivors={n_surv} "
                        f"removed={n_removed} before={n_before} "
                        f"demoted={len(demoted)} rows_demoted={rows_demoted}"
                    )
                if verify == "full":
                    union = indexes[0].vectors.select("vec_id")
                    for ix in indexes[1:]:
                        union = union.unionByName(ix.vectors.select("vec_id"))
                    post = union.agg(
                        F.count("*").alias("n"),
                        F.count_distinct("vec_id").alias("nd"),
                    ).first()
                    if not (n_after == int(post.n) == int(post.nd)):
                        raise RuntimeError(
                            "maintained index count diverged from "
                            f"physical: tracked={n_after} "
                            f"physical={int(post.n)} distinct={int(post.nd)}"
                        )
            finally:
                vectors.unpersist()
            _lap("handoff_counts_s")

            # -- state forward-roll (meta commits last) ----------------
            _fence("pre-state-roll")
            sigs_delta.write.mode("append").parquet(f"{sd}/sigs")
            delta_labels = comp.filter(
                F.col("node") != F.col("component")
            ).select(
                F.col("node").alias("doc_id"),
                F.col("component").alias("canonical"),
            )
            if not demoted:
                # no demotions → every existing label row is unchanged
                # and every non-identity comp node is a FRESH delta id
                # (corpus nodes in comp are canonicals, and with no
                # demotion each stays its own component) — the roll is
                # a pure append of ∝-delta rows, not a rewrite of the
                # ∝-duplicates label set (the rewrite was the last
                # ∝-state term in a demotion-free append's state roll)
                delta_labels.write.mode("append").parquet(f"{sd}/labels")
            else:
                remap = spark.createDataFrame(
                    [(o, n) for o, n in demoted.items()],
                    schema="old_canon long, new_canon long",
                )
                new_rows = (
                    labels.join(
                        F.broadcast(remap),
                        labels.canonical == remap.old_canon,
                        "left",
                    )
                    .select(
                        "doc_id",
                        F.coalesce("new_canon", "canonical").alias("canonical"),
                    )
                    .unionByName(delta_labels)
                    .distinct()
                )
                build = f"{sd}/labels.build{os.getpid()}"
                new_rows.write.mode("overwrite").parquet(build)
                shutil.rmtree(f"{sd}/labels")
                os.rename(build, f"{sd}/labels")
            _fence("pre-meta-commit")
            CorpusPipeline._write_state_meta(
                state_root,
                {
                    **meta,
                    "n_docs": meta["n_docs"] + n_delta,
                    "max_doc_id": int(bounds.hi),
                    "n_indexed": n_after,
                },
            )
            # post-rename re-check (round-13 ADVICE item 3): the
            # pre-commit fence is check-then-act — a direct
            # VectorIndex.append/delete acquiring its lease in the
            # window between _fence and the meta rename would have its
            # fenced counter update silently clobbered by this write.
            # Mirroring _bump_n_indexed: verify this lease is STILL
            # the newest epoch AFTER the rename and report the race
            # loudly with the verify="full" remedy.
            newest_after = _max_epoch(state_root)
            if newest_after > lease:
                raise CommitConflict(
                    f"state meta committed under epoch {lease} raced a "
                    f"newer writer (epoch {newest_after}) on "
                    f"{state_root} — the maintained counters may have "
                    "interleaved; re-audit with "
                    "CorpusPipeline.append(..., verify='full')"
                )
        finally:
            sigs_delta.unpersist()
            # sigs_corpus stays persisted — _SIGS_CACHE owns it and
            # rolls it forward under the files this append added
            if comp is not None:
                comp.unpersist()
        _lap("state_roll_s")
        walls.update(probe_stats)
        return {
            "delta": n_delta,
            "survivors": n_surv,
            "removed": n_delta - n_surv,
            "demoted": len(demoted),
            "indexed": n_after,
            "index": indexes[0],
            "shards": indexes,
            "walls": walls,
        }

    @staticmethod
    def _remove_from_index(
        spark: SparkSession, index_path: str, vec_ids: list
    ) -> int:
        """Demoted canonicals drop through the shared bounded-cell
        rewrite (`pipeline.remove_vectors_from_index`, also the
        VectorIndex.delete surface). Returns rows removed (the
        partition-pruned accounting the maintained index counter
        rides on)."""
        from cloudvectordb_spark.operators.pipeline import (
            remove_vectors_from_index,
        )

        _cells, rows = remove_vectors_from_index(
            spark, index_path, vec_ids, return_rows=True
        )
        return rows
