"""The CloudVectorDB pipeline, S1-S4 (SURVEY.md §3.1; reference
/root/reference/README.md:2 — "building a very large dataset of triplets,
then training encoders, then building the embeddings with the encoder,
then building the vectordb with the encoder").

Spark-first decomposition:
  S1 triplet mining  -> deterministic window/join program (oracle-checkable)
  S2 encoder training-> TorchDistributor boundary (documented, not a DF op)
  S3 batch embedding -> mapInPandas with a per-worker model (stub encoder
                        here; real encoder is a drop-in load_fn swap)
  S4 index build     -> KMeans-IVF / random-projection-LSH bucket
                        assignment + partitionBy parquet layout, so probe
                        queries prune partitions (the "vectordb" is a data
                        LAYOUT + built-in partition pruning, no serving code)

Triplet negatives use modular-arithmetic sampling instead of F.rand so
the query is fully deterministic AND SQL-expressible — the DuckDB oracle
verifies the mining logic end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.registry import query

EMBED_DIM = 64


# ---------------------------------------------------------------------------
# S1 / K3: triplet mining (anchor, positive, negative)
# ---------------------------------------------------------------------------
@query(
    "triplet_mining",
    oracle="""
    WITH anchors AS (
      SELECT vec_id AS anchor_id, label,
             lead(vec_id) OVER (PARTITION BY label ORDER BY vec_id) AS pos_id
      FROM embeddings
    ), cand AS (
      SELECT l.label AS anchor_label, e.vec_id AS cand_id,
             row_number() OVER (PARTITION BY l.label ORDER BY e.vec_id) AS rn,
             count(*)    OVER (PARTITION BY l.label)                    AS cnt
      FROM (SELECT DISTINCT label FROM embeddings) l
      JOIN embeddings e ON e.label <> l.label
    )
    SELECT a.anchor_id, a.label, a.pos_id, c.cand_id AS neg_id
    FROM anchors a
    JOIN cand c
      ON c.anchor_label = a.label AND c.rn = 1 + (a.anchor_id % c.cnt)
    WHERE a.pos_id IS NOT NULL
    """,
    operators=("K3", "C9", "E2", "C1"),
)
def triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positives: next same-label vector (C9 self-pairing via window —
    avoids the quadratic self-join). Negatives: deterministic modular pick
    from the label-complement, which at 100 TB is a broadcast of the tiny
    (label, rn) candidate index — no skewed self-join (SURVEY.md §7 hard
    part 4)."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    w = Window.partitionBy("label").orderBy("vec_id")
    anchors = (
        e.select(
            F.col("vec_id").alias("anchor_id"),
            "label",
            F.lead("vec_id").over(w).alias("pos_id"),
        )
        .filter(F.col("pos_id").isNotNull())
    )
    labels = e.select("label").distinct().withColumnRenamed("label", "anchor_label")
    wc = Window.partitionBy("anchor_label").orderBy("vec_id")
    cand = (
        F.broadcast(labels)
        .join(e, F.col("label") != F.col("anchor_label"))
        .select(
            "anchor_label",
            F.col("vec_id").alias("cand_id"),
            F.row_number().over(wc).alias("rn"),
            F.count("*").over(Window.partitionBy("anchor_label")).alias("cnt"),
        )
    )
    return (
        anchors.join(
            cand,
            (F.col("anchor_label") == F.col("label"))
            & (F.col("rn") == 1 + F.col("anchor_id") % F.col("cnt")),
        )
        .select("anchor_id", "label", "pos_id", F.col("cand_id").alias("neg_id"))
    )


# ---------------------------------------------------------------------------
# S3 / K5: batch embedding inference via mapInPandas (stub encoder)
# ---------------------------------------------------------------------------
def stub_encode(ids: np.ndarray, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic stand-in for the trained encoder (S2 artifact):
    row i -> L2-normalized sin-wave keyed by doc_id. Replace with a real
    model's forward pass; the Spark plumbing is identical."""
    m = np.sin((ids[:, None] + 1.0) * (np.arange(dim)[None, :] + 1.0) * 0.01)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m.astype(np.float32)


def embed_documents(docs: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """K5: corpus -> (doc_id, embedding array<float>). The encoder loads
    once per Python worker (here: nothing to load); batches cross the
    boundary as Arrow columns."""

    def run(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            vecs = stub_encode(ids, dim)
            yield pd.DataFrame({"doc_id": ids, "embedding": list(vecs)})

    return docs.select("doc_id").mapInPandas(run, schema="doc_id long, embedding array<float>")


@query(
    "embed_documents_stub",
    # The float arrays themselves aren't SQL-expressible, but the encoder
    # CONTRACT is: one embedding per doc, fixed dim, unit L2 norm. The
    # projected summary makes those oracle-checkable per document.
    oracle=f"""
    SELECT doc_id,
           CAST({EMBED_DIM} AS INTEGER) AS dim,
           1.0 AS sq_norm
    FROM documents
    """,
    operators=("K5", "L5"),
    bench=True,
)
def embed_documents_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = embed_documents(docs)
    # project a deterministic summary so even the rows-only check pins
    # count + dim + finite values
    return out.select(
        "doc_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("sq_norm"),
    )


# ---------------------------------------------------------------------------
# S4 / K9: IVF index build — engine-owned deterministic Lloyd's k-means
# (operators.kmeans_det) + partitioned layout. Build ONCE, persist,
# search many times: the "vectordb" is the layout. The fixed-round
# md5-seeded trainer replaces MLlib KMeans so every downstream IVF query
# carries a FULL value-level DuckDB oracle (the trainer's rounds unroll
# into CTE stages — see kmeans_det.kmeans_cte_sql).
# ---------------------------------------------------------------------------
_IVF_ROUNDS = 3

# Absolute probes-per-cell floor above which a batch-served cell's rows
# are spread round-robin before the tagging join (see the hot-cell
# replication comment in ivf_batch_search / rebalance_hot). Absolute,
# not relative-to-average, so a uniformly-hot batch still fires; 8 is
# the measured local[32] crossover where one cell's fan-out+matmul
# stops fitting in a single task's fair share (tools/ann_batch_probe.py
# --skew: 6.8 s -> 2.8 s at 256 probes on one cell).
HOT_CELL_PROBE_FLOOR = 8


# Above this k, the flat Lloyd's build is routed to the two-level IMI
# composition below (round-8 verdict #2). Flat build cost is O(n*k*dim)
# per round while the two-level form costs O(n*(k1+k2)*dim) with
# k1*k2 >= k, i.e. ~2*sqrt(k) instead of k. Measured at 2M x 64
# (tools/imi_build_probe.py, BASELINE.md round-9): routed build is
# ~17 s FLAT in k from 2048 through 4096 while the flat build grows
# k-linearly (63.5 s at k=2048); the local crossover sits between
# k=512 and k=1024. The registered fixture queries (k=8) stay flat,
# so every oracle is byte-identical; routing only changes what a BIG
# k builds.
_FLAT_K_MAX = 512


def build_ivf_assignments(
    emb: DataFrame, k: int = 8, seed: int = 42, rounds: int = _IVF_ROUNDS
) -> tuple[DataFrame, DataFrame]:
    """Assign every vector to a centroid partition (K9).

    Returns (assignments, centroids). The trainer fits on a pinned
    bounded sample (centroid quality converges long before 100 TB of
    input); the full corpus then gets one narrow assignment projection —
    no shuffle until the partitionBy write. Centroids between rounds are
    k*dim doubles on the driver, the same topology MLlib uses.

    k > _FLAT_K_MAX auto-routes to the two-level IMI build — the
    scale-safe plan is the default, not an opt-in.
    """
    from cloudvectordb_spark.operators.kmeans_det import (
        assign_cells,
        lloyd_centroids,
    )

    if k > _FLAT_K_MAX:
        return build_imi_assignments(emb, k=k, seed=seed, rounds=rounds)

    cents = lloyd_centroids(emb, k=k, seed=seed, rounds=rounds)
    # same fail-fast as the IMI branch: the deterministic fit filter
    # selects by id range, so a corpus whose vec_ids all exceed the cap
    # trains ZERO centroids — surface the remedy instead of crashing
    # (or degenerating) downstream in assign_cells
    if not cents:
        from cloudvectordb_spark.operators.kmeans_det import DEFAULT_FIT_CAP

        raise ValueError(
            f"IVF fit sample is empty: no vec_id < {DEFAULT_FIT_CAP}. "
            "Remap vec_ids to start at 0 (dense ids are already "
            "required by the layout contract)."
        )
    assigned = assign_cells(emb, cents)
    centroids = emb.sparkSession.createDataFrame(
        [(cid, c) for cid, c in cents],
        schema="centroid_id int, centroid array<double>",
    )
    return assigned, centroids


def _fine_train_on_assigned(
    parents: DataFrame,
    k1: int,
    k2: int | list,
    rounds: int,
    fit_cap: int | None = None,
) -> dict:
    """Per-parent Lloyd's on an already-parent-assigned frame (the
    DataFrame-input twin of ivf2._train_fine_centroids_impl, for builds
    that haven't been persisted yet). ``k2`` may be a single child
    count or a per-parent list (proportional allocation — see
    build_imi_assignments). Returns {parent: [(child_id, centroid)]}
    with parents densified 0..k1-1 upstream. Driver state is
    sum(k2)*dim doubles; each round is one literal assignment + one
    (parent, child, dim) groupBy."""
    from cloudvectordb_spark.operators.ivf2 import assign_fine_cells
    from cloudvectordb_spark.operators.kmeans_det import DEFAULT_FIT_CAP

    if fit_cap is None:
        fit_cap = DEFAULT_FIT_CAP
    k2_list = [k2] * k1 if isinstance(k2, int) else list(k2)
    fit = parents.filter(F.col("vec_id") < fit_cap)
    w = Window.partitionBy("centroid_id").orderBy("h", "vec_id")
    seeds = (
        fit.withColumn(
            "h",
            F.md5(
                F.concat(
                    F.lit("ivf2|"),
                    F.col("centroid_id").cast("string"),
                    F.lit("|"),
                    F.col("vec_id").cast("string"),
                )
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(
            F.col("rn")
            <= F.element_at(F.lit(k2_list), F.col("centroid_id") + 1)
        )
        .select("centroid_id", "rn", "embedding")
        .collect()  # bounded: sum(k2) rows
    )
    cents2: dict = {}
    for r in sorted(seeds, key=lambda r: (r.centroid_id, r.rn)):
        cents2.setdefault(int(r.centroid_id), []).append(
            (r.rn - 1, [float(x) for x in r.embedding])
        )
    for p in range(k1):  # a parent with zero fit rows keeps no children
        cents2.setdefault(p, [])
    for _ in range(rounds):
        asg = assign_fine_cells(fit, cents2, k1)
        # per-dim means re-packed into ONE array row per (parent, child)
        # JVM-side before collect — k1*k2 rows instead of k1*k2*dim
        # (the dim-exploded collect was a visible driver cost at k ~ 4k)
        upd = (
            asg.select(
                "centroid_id",
                "child_id",
                F.posexplode(F.col("embedding").cast("array<double>")).alias(
                    "dim", "x"
                ),
            )
            .groupBy("centroid_id", "child_id", "dim")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("centroid_id", "child_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .collect()  # bounded: k1 * k2 rows
        )
        nxt: dict = {}
        for r in upd:
            nxt.setdefault(r.centroid_id, {})[r.child_id] = list(r.centroid)
        cents2 = {
            p: [(cid, c) for cid, c in sorted(children.items())]
            for p, children in sorted(nxt.items())
        }
        for p in range(k1):
            cents2.setdefault(p, [])
    return cents2


def _split_hot_children(
    fit: DataFrame,
    cents2: dict,
    k1: int,
    factor: float = 2.0,
    max_passes: int = 3,
) -> dict:
    """In-place split of measured-hot fine cells (round-9 verdict #6).

    Each pass: one bounded fit-sample assignment (Arrow/BLAS kernel),
    per-child sizes (<= k rows collected), then a driver-side
    deterministic mini-Lloyd (md5-ordered seeds, half-up-6 rounding —
    the kmeans_det discipline) over ONLY the hot children's fit rows,
    replacing each hot centroid with round(size/mean) sub-centroids.
    Split ids extend past the parent's allocation; the offset table
    reserves through the max live child id. Cost is bounded by the fit
    sample (never corpus-sized) and passes cap at 3 — build stays flat
    in k. Uniform layouts (every fixture) take zero splits and return
    unchanged, so no oracle sees this path."""
    import hashlib

    from cloudvectordb_spark.operators.ivf2 import assign_fine_cells_blas

    for _ in range(max_passes):
        asg = assign_fine_cells_blas(fit, cents2, k1, out="child_id")
        sizes = (
            asg.groupBy("centroid_id", "child_id")
            .agg(F.count("*").alias("n"))
            .collect()  # bounded: one row per live fine cell
        )
        n_fit = sum(r.n for r in sizes)
        n_children = sum(len(v) for v in cents2.values())
        mean = n_fit / max(1, n_children)
        hot = sorted(
            (int(r.centroid_id), int(r.child_id), int(r.n))
            for r in sizes
            if r.n > factor * mean
        )
        if not hot:
            break
        hot_keys = [f"{p}|{c}" for p, c, _ in hot]
        rows = (
            asg.filter(
                F.concat_ws(
                    "|",
                    F.col("centroid_id").cast("string"),
                    F.col("child_id").cast("string"),
                ).isin(hot_keys)
            )
            .select("centroid_id", "child_id", "vec_id", "embedding")
            .collect()  # bounded by the fit sample's hot slice
        )
        by_cell: dict = {}
        for r in rows:
            by_cell.setdefault((r.centroid_id, r.child_id), []).append(
                (int(r.vec_id), np.asarray(r.embedding, dtype=np.float64))
            )
        next_id = {
            p: max((cid for cid, _ in children), default=-1) + 1
            for p, children in cents2.items()
        }

        def _r6(x: np.ndarray) -> np.ndarray:
            return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

        for p, c, n in hot:
            pts = sorted(by_cell.get((p, c), []), key=lambda t: t[0])
            s = min(max(2, round(n / mean)), 8, len(pts))
            if s < 2:
                continue
            order = sorted(
                range(len(pts)),
                key=lambda i: (
                    hashlib.md5(
                        f"split|{p}|{c}|{pts[i][0]}".encode()
                    ).hexdigest(),
                    pts[i][0],
                ),
            )
            x = np.stack([v for _, v in pts])
            cmat = x[order[:s]].copy()
            for _round in range(2):
                d2 = _r6(((x[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2))
                a = d2.argmin(axis=1)
                for j in range(s):
                    m = a == j
                    if m.any():
                        cmat[j] = _r6(x[m].mean(axis=0))
            children = dict(cents2[p])
            children[c] = [float(v) for v in cmat[0]]
            for j in range(1, s):
                children[next_id[p]] = [float(v) for v in cmat[j]]
                next_id[p] += 1
            cents2[p] = sorted(children.items())
    return cents2


def build_imi_assignments(
    emb: DataFrame, k: int, seed: int = 42, rounds: int = _IVF_ROUNDS
) -> tuple[DataFrame, DataFrame]:
    """Two-level (IMI-style) build producing the SAME layout contract as
    the flat build: (assignments with a global centroid_id, centroids
    table (centroid_id, centroid)) — downstream probe/search code is
    oblivious to how the cells were trained.

    k1 ~ sqrt(k) coarse cells via flat Lloyd's, then a PROPORTIONAL
    child allocation: parent p gets max(1, round(k * n_p / n_fit))
    fine cells, so a coarse cell holding 10x the mass trains 10x the
    children instead of inheriting constant-k2 imbalance (measured
    max/mean cell size 7.5 with constant k2 vs 2.7 for flat; the
    allocation brings the routed layout back toward flat's balance).
    Global cell id = parent_offset + child (offsets = cumsum of
    allocations). Fine assignment uses the Arrow/BLAS kernel, so total
    assignment cost is O(n*(k1+mean_k2)*dim) — ~2*sqrt(k) of the flat
    build's O(n*k*dim). Empty fine cells drop from the centroid table
    exactly like empty flat cells do."""
    import math

    from cloudvectordb_spark.operators.ivf2 import assign_fine_cells_blas
    from cloudvectordb_spark.operators.kmeans_det import (
        assign_cells_blas,
        lloyd_centroids,
    )

    k1 = max(2, math.isqrt(k))
    cents1 = lloyd_centroids(emb, k=k1, seed=seed, rounds=rounds, force_blas=True)
    # densify parent ids 0..len-1 (empty coarse cells may have dropped);
    # order-preserving, so the argmin tie order is unchanged
    cents1 = [(i, c) for i, (_, c) in enumerate(cents1)]
    k1 = len(cents1)
    # FORCE the Arrow/BLAS kernels for the corpus-wide assignments: k1 ~
    # sqrt(k) sits under the literal-size threshold that gates the
    # expression path, but at routed-build row counts the per-row
    # zip_with interpretation dominates the whole build (measured 120 s
    # vs 14 s at 2M x k=512 before this) — one matmul per Arrow batch is
    # the right physical plan no matter how small the centroid matrix.
    # train the fine level on a PRE-FILTERED, materialized fit sample: a
    # vec_id filter cannot push below mapInPandas, so handing the full
    # assignment lineage to the training loop would re-assign the whole
    # corpus once per round just to keep fit_cap rows (measured as most
    # of a 55 s fixed overhead at 2M rows)
    from cloudvectordb_spark.operators.kmeans_det import DEFAULT_FIT_CAP

    fit_parents = assign_cells_blas(
        emb.filter(F.col("vec_id") < DEFAULT_FIT_CAP), cents1
    ).localCheckpoint()
    # The id-range fit filter (shared with kmeans_det's coarse level)
    # assumes vec_ids start near 0. A corpus whose ids all exceed the
    # cap would fit on ZERO rows and silently degenerate the allocation
    # (then crash in fine training) — fail fast with the actual remedy.
    if not fit_parents.head(1):
        raise ValueError(
            f"IMI fit sample is empty: no vec_id < {DEFAULT_FIT_CAP}. "
            "The deterministic fit filter selects by id range; remap "
            "vec_ids to start at 0 (dense ids are already required by "
            "the layout contract) or lower k to use the flat build."
        )
    # proportional child allocation from the FULL-CORPUS parent masses
    # (k1 rows collected — bounded). Round-9 measured the fit-sample
    # masses drifting from the corpus masses as half the routed
    # layout's residual imbalance (max/mean 4.59 vs flat 3.45): a
    # parent hot in the corpus but cool in the fit sample
    # under-allocates children, and every child inherits the overflow.
    # One extra O(n*k1*dim) counting pass keeps the build flat in k
    # (k1 ~ sqrt(k)); the assignment lineage is recomputed rather than
    # persisted — at 100 TB a second narrow scan beats materializing
    # (id, vec, parent) for the whole corpus.
    parents = assign_cells_blas(emb, cents1)
    mass = {
        r.centroid_id: r.n
        for r in parents.groupBy("centroid_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_total = max(1, sum(mass.values()))
    # largest-remainder apportionment: floor the quotas, hand the
    # leftover children to the largest fractional remainders — sum(k2)
    # == k exactly over parents WITH mass (the old max(1, round(...))
    # both over- and under-shot, stacking rounding error on the drift).
    # Zero-mass parents then floor to one child each, adding at most
    # one cell per corpus-empty coarse cell on top of k.
    quota = [k * mass.get(p, 0) / n_total for p in range(k1)]
    k2_list = [int(q) for q in quota]
    leftovers = sorted(
        range(k1), key=lambda p: (-(quota[p] - k2_list[p]), p)
    )[: k - sum(k2_list)]
    for p in leftovers:
        k2_list[p] += 1
    k2_list = [max(1, c) for c in k2_list]  # every parent keeps a child
    cents2 = _fine_train_on_assigned(fit_parents, k1, k2_list, rounds)
    # a parent with no fit-sample rows trains no children but may still
    # own full-corpus rows: give it one child at its coarse centroid
    for p in range(k1):
        if not cents2[p]:
            cents2[p] = [(0, list(cents1[p][1]))]
    # balance refinement (round-9 verdict #6): even with exact
    # proportional allocation, the routed layout stays less balanced
    # than flat (4.59 vs 3.46 max/mean at 1M, k=2048) because a point
    # is CONSTRAINED to its top-1 parent's children — boundary mass
    # piles into a parent's edge children instead of spilling into the
    # neighbor parent's cells the way flat Lloyd's would let it. Split
    # the measured-hot children in place (driver-side deterministic
    # mini-Lloyd on their fit rows) until no child projects above
    # 2x the mean cell size.
    cents2 = _split_hot_children(fit_parents, cents2, k1)
    # full-corpus assignment: coarse + fine chain as two back-to-back
    # mapInPandas stages — one scan, no shuffle until the consumer's
    # partitionBy write
    fine = assign_fine_cells_blas(parents, cents2, k1, out="child_id")
    # global ids: parent offsets = cumsum of per-parent allocations
    # (child ids within a parent are 0..k2_p-1, plus any split-added
    # ids above that — offsets reserve through the max live child id)
    offsets, acc = [], 0
    for p in range(k1):
        offsets.append(acc)
        top = max((cid for cid, _ in cents2[p]), default=0) + 1
        acc += max(k2_list[p], top)
    assigned = fine.withColumn(
        "centroid_id",
        (
            F.element_at(F.lit(offsets), F.col("centroid_id") + 1)
            + F.col("child_id")
        ).cast("int"),
    ).drop("child_id")
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [
            (offsets[p] + cid, c)
            for p, children in sorted(cents2.items())
            for cid, c in children
        ],
        schema="centroid_id int, centroid array<double>",
    )
    return assigned, centroids


def write_ivf_index(assigned: DataFrame, centroids: DataFrame, path: str) -> None:
    """A3: persist the vectordb layout. Vectors land partitioned by
    centroid_id (probe-side filters prune whole partitions at scan time);
    the small centroid table sits alongside.

    The repartition BEFORE partitionBy is load-bearing at real cell
    counts: without it every input task writes a file into every cell
    dir — measured 69k ~40 KB files and 154.9 s for 9M rows x 2171
    cells — while one shuffle on the key yields exactly one file per
    cell in 36.0 s (4.3x) AND the compacted layout batch serving
    already prefers (hot-cell replication assumes one file per cell).
    A cell is bounded by the build's balance guarantee (max/mean ~2),
    so no single write task can be corpus-sized; at extreme per-cell
    volumes switch to repartition(N, col) to trade file count back."""
    assigned.repartition("centroid_id").write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(f"{path}/vectors")
    centroids.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ensure_ivf_index(
    spark: SparkSession, sf_dir: str, k: int = 8, seed: int = 42
) -> str:
    """Build the IVF index for ``sf_dir`` if absent (or stale vs the
    source parquet's mtime) and return its path. Search queries read this
    persisted layout — repeat searches never refit the trainer, exactly
    like a real index life-cycle (bulk build S4, then many probe scans)."""
    import hashlib
    import os
    import tempfile
    import uuid

    from cloudvectordb_spark.cache import build_lock, source_tag

    src = os.path.join(sf_dir, "embeddings.parquet")
    # mtime_ns+size fingerprint (cache.source_tag) — a same-second
    # fixture regen still invalidates.
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{k}|{seed}|lloyd{_IVF_ROUNDS}"
        f"|{source_tag(src)}".encode()
    ).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), "cloudvectordb_ivf", tag)
    marker = os.path.join(path, "_BUILT")
    if os.path.exists(marker):
        return path
    # same-process threads serialize; cross-process builders race
    # benignly via unique build dirs + atomic rename
    with build_lock(path):
        if os.path.exists(marker):
            return path
        build_dir = f"{path}.build{os.getpid()}_{uuid.uuid4().hex[:8]}"
        emb = load(spark, sf_dir, "embeddings")
        assigned, centroids = build_ivf_assignments(emb, k=k, seed=seed)
        write_ivf_index(assigned, centroids, build_dir)
        with open(os.path.join(build_dir, "_BUILT"), "w") as f:
            f.write("ok")
        try:
            os.rename(build_dir, path)
        except OSError:  # another process published first — use theirs
            import shutil

            shutil.rmtree(build_dir, ignore_errors=True)
    return path


def read_ivf_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """The two index frames, cached per (session, immutable index path)
    so repeat searches skip the per-call file-listing/footer driver jobs
    (the round-7 bench tax on every `spark.read.parquet` call)."""
    from cloudvectordb_spark.cache import artifact_cache, session_key

    return artifact_cache(
        ("ivf_frames", path, session_key(spark)),
        lambda: (
            ivf_vectors_frame(spark, path),
            spark.read.parquet(f"{path}/centroids"),
        ),
    )


# A published index is immutable (fingerprint-keyed path, atomic
# rename), so the k*dim centroid list is cached per path — probe
# queries skip the centroid-parquet collect job on every execution
# after the first (measured ~0.2 s/job of pure driver round-trip at
# sf0.1). Process-wide entry in the unified cache (plain floats, not
# session-bound).
def index_centroids(spark: SparkSession, path: str) -> list:
    from cloudvectordb_spark.cache import artifact_cache

    def build():
        rows = spark.read.parquet(f"{path}/centroids").collect()
        return [
            (r.centroid_id, list(r.centroid))
            for r in sorted(rows, key=lambda r: r.centroid_id)
        ]

    return artifact_cache(("ivf_centroids", path), build)


def ivf_content_tag(path: str) -> str:
    """APPEND-PROOF content fingerprint for an index's vectors/ tree.

    The vectors/ directory's own mtime_ns+size only changes when a
    DIRECT child is created or removed — an in-process append that only
    adds files inside existing ``centroid_id=*`` subdirectories relies
    on the committer touching _temporary/_SUCCESS to bump it, which is
    committer/filesystem-dependent (round-10 ADVICE). Adding a file to
    a directory always bumps THAT directory's mtime, so the max
    mtime_ns over vectors/ and its one level of children (plus the
    child count, plus LATEST for versioned trees) moves on every
    append, rewrite, or tombstone no matter which committer ran. One
    O(k)-entry scandir, driver-side, no Spark job."""
    import os

    from cloudvectordb_spark.cache import source_tag

    vec = f"{path}/vectors"
    st = os.stat(vec)
    newest = st.st_mtime_ns
    n_children = 0
    with os.scandir(vec) as it:
        for e in it:
            newest = max(newest, e.stat().st_mtime_ns)
            n_children += 1
    parts = [f"{os.path.abspath(vec)}|{newest}|{n_children}"]
    # the L0 delta tier mutates on small appends without touching
    # vectors/ — it must move the fingerprint too (histogram cache,
    # append-proofing)
    delta_dir = f"{path}/vectors_delta"
    if os.path.isdir(delta_dir):
        newest_d = os.stat(delta_dir).st_mtime_ns
        n_d = 0
        with os.scandir(delta_dir) as it:
            for e in it:
                newest_d = max(newest_d, e.stat().st_mtime_ns)
                n_d += 1
        parts.append(f"l0|{newest_d}|{n_d}")
    tombs = f"{path}/tombstones"
    if os.path.exists(tombs):
        st_t = os.stat(tombs)
        newest_t = st_t.st_mtime_ns
        with os.scandir(tombs) as it:
            for e in it:
                newest_t = max(newest_t, e.stat().st_mtime_ns)
        parts.append(f"tombs|{newest_t}")
    if os.path.exists(f"{path}/LATEST"):
        parts.append(source_tag(f"{path}/LATEST"))
    return ";".join(parts)


def ivf_cell_histogram(spark: SparkSession, path: str, vectors: DataFrame | None = None) -> dict:
    """Per-cell row counts for a persisted index — k rows of driver
    state (catalog metadata at scale), cached under the append-proof
    content fingerprint so repeat adaptive searches issue NO count job
    (round-10 verdict #2's convention, shared with top2_cell_sizes)."""
    from cloudvectordb_spark.cache import artifact_cache

    def build():
        v = vectors if vectors is not None else ivf_vectors_frame(spark, path)
        rows = v.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
        return {int(r.centroid_id): int(r.n) for r in rows}

    return artifact_cache(("ivf_cell_hist", path, ivf_content_tag(path)), build)


from cloudvectordb_spark.operators.kmeans_det import kmeans_cte_sql as _kmeans_cte_sql

# The default IVF trainer's DuckDB CTE block (k=8, seed=42, 3 rounds) —
# the oracle twin of ``ensure_ivf_index``'s layout.
_KM_CTES = _kmeans_cte_sql(k=8, seed=42, rounds=_IVF_ROUNDS)

# rounded squared distance between a corpus row e and centroid row c —
# the same 6-decimal argmin key both engines rank on
_KM_D2 = (
    "round(list_sum(list_transform(list_zip(e.v, c.v),"
    " p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
)


@query(
    "ivf_assignment_counts",
    # Deterministic trainer => the EXACT per-cell histogram is the oracle
    # (upgraded from the round-4 invariant check).
    oracle=f"""
    WITH {_KM_CTES}
    SELECT CAST(cid AS INTEGER) AS centroid_id,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM km_assign GROUP BY cid
    """,
    operators=("K9", "A3", "L4"),
)
def ivf_assignment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors, _ = read_ivf_index(spark, ensure_ivf_index(spark, sf_dir))
    return (
        vectors.groupBy(F.col("centroid_id").cast("int").alias("centroid_id"))
        .agg(F.count("*").cast("bigint").alias("n_vectors"))
    )


@query(
    "ivf_topk_search",
    # Full value oracle: the deterministic trainer's CTEs reproduce the
    # layout, the probe->top-2-cell pruning, and the exact rescore.
    oracle=f"""
    WITH {_KM_CTES},
    probe_cells AS (
      SELECT DISTINCT cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c WHERE e.vec_id < 3
      ) WHERE rn <= 2
    ),
    p AS (SELECT vec_id AS probe_id, v AS pv FROM km_emb WHERE vec_id < 3),
    scored AS (
      SELECT p.probe_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.v, p.pv), 6) AS score
      FROM km_assign a, p
      WHERE a.cid IN (SELECT cid FROM probe_cells)
        AND a.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K9", "K8", "E4"),
    bench=True,
)
def ivf_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN search over the PERSISTED IVF layout:
    1. probe -> nearest 2 centroids (driver-side over the cached k*dim
       centroid list — bounded nprobe*k work, no Spark job)
    2. the selected centroid ids become a LITERAL isin filter -> genuine
       partition pruning: non-selected partitions never leave disk
    3. BLAS-batch exact top-k (exact_knn_fast) over the pruned candidates
    Candidates are the union of all probes' cells — a superset per probe,
    which only improves recall; cost is |union cells| x n_probes in one
    matmul per Arrow batch instead of per-pair interpreted lambdas.
    One probe-collect job total: the collected rows feed both the cell
    selection and (as a local relation) exact_knn_fast's probe set."""
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    path = ensure_ivf_index(spark, sf_dir)
    vectors = ivf_vectors_frame(spark, path)
    cents = index_centroids(spark, path)
    probe_rows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    )
    cell_ids = sorted(
        {c for r in probe_rows for c in nearest_cells_py(r.embedding, cents, 2)}
    )
    probes_local = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in probe_rows],
        schema="vec_id long, embedding array<float>",
    )
    pruned = vectors.filter(F.col("centroid_id").isin(cell_ids))
    return exact_knn_fast(pruned, probes_local, k=10)


def _ensure_l0_tiered_ivf(spark: SparkSession, sf_dir: str) -> str:
    """Build-once: an IVF index built over vec_id < 400 (the default
    deterministic k=8 trainer), then vec_ids 400..499 appended through
    the L0 path with FROZEN centroids — the tier stays live (far below
    the fold budget), so searches against this root exercise the
    base ∪ L0 union read surface. The round-14 driver-gated twin of
    the text side's tiered root."""
    import hashlib
    import os
    import tempfile
    import uuid

    from cloudvectordb_spark.cache import build_lock, source_tag

    src = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.md5(
        f"l0tier|{os.path.abspath(sf_dir)}|8|42|lloyd{_IVF_ROUNDS}"
        f"|{source_tag(src)}".encode()
    ).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), "cloudvectordb_ivftier", tag)
    marker = os.path.join(path, "_BUILT")
    if os.path.exists(marker):
        return path
    with build_lock(path):
        if os.path.exists(marker):
            return path
        build_dir = f"{path}.build{os.getpid()}_{uuid.uuid4().hex[:8]}"
        emb = load(spark, sf_dir, "embeddings")
        assigned, centroids = build_ivf_assignments(
            emb.filter(F.col("vec_id") < 400), k=8, seed=42
        )
        write_ivf_index(assigned, centroids, build_dir)
        append_to_ivf_index(
            emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 500))
            .select("vec_id", "embedding"),
            build_dir,
            l0=True,
        )
        with open(os.path.join(build_dir, "_BUILT"), "w") as f:
            f.write("ok")
        try:
            os.rename(build_dir, path)
        except OSError:
            import shutil

            shutil.rmtree(build_dir, ignore_errors=True)
    return path


_KM_D2_APP = _KM_D2.replace("e.v", "a.v")


@query(
    "ivf_l0_tier_search",
    # The appended-index twin of ivf_topk_search: the trainer CTEs run
    # over ONLY the base corpus (vec_id < 400); the appended rows are
    # assigned by the same frozen-centroid argmin, and the search scans
    # the UNION of cells and live L0 tier — so the serving read surface
    # for mutated indexes (ivf_vectors_frame's base ∪ vectors_delta) is
    # value-oracled by the driver every round, not just pytest.
    oracle=f"""
    WITH {_kmeans_cte_sql(k=8, seed=42, rounds=_IVF_ROUNDS,
                          table="(SELECT * FROM embeddings WHERE vec_id < 400) base")},
    app AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id >= 400 AND vec_id < 500
    ),
    app_assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT a.vec_id, a.v, c.cid,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_KM_D2_APP}, c.cid) AS rn
        FROM app a, km_c{_IVF_ROUNDS} c
      ) WHERE rn = 1
    ),
    all_assign AS (
      SELECT vec_id, v, cid FROM km_assign
      UNION ALL SELECT vec_id, v, cid FROM app_assign
    ),
    probe_cells AS (
      SELECT DISTINCT cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c WHERE e.vec_id < 3
      ) WHERE rn <= 2
    ),
    p AS (SELECT vec_id AS probe_id, v AS pv FROM km_emb WHERE vec_id < 3),
    scored AS (
      SELECT p.probe_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.v, p.pv), 6) AS score
      FROM all_assign a, p
      WHERE a.cid IN (SELECT cid FROM probe_cells)
        AND a.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K8", "K9", "E4", "G1"),
)
def ivf_l0_tier_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8/K9 mutable-path serving: batch ANN over an index BUILT at
    vec_id<400 then L0-APPENDED to 500 — candidates come from the
    partitioned cells AND the live delta tier through the single
    ``ivf_vectors_frame`` union surface, pruned by the same literal
    cell filter (partition dirs on the base leg, a bounded small-file
    scan on the tier leg). Value-identical to an index whose cells
    held the union all along (frozen-centroid assignment is per-row)."""
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    path = _ensure_l0_tiered_ivf(spark, sf_dir)
    vectors = ivf_vectors_frame(spark, path)
    cents = index_centroids(spark, path)
    probe_rows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    )
    cell_ids = sorted(
        {c for r in probe_rows for c in nearest_cells_py(r.embedding, cents, 2)}
    )
    probes_local = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in probe_rows],
        schema="vec_id long, embedding array<float>",
    )
    pruned = vectors.filter(F.col("centroid_id").isin(cell_ids))
    return exact_knn_fast(pruned, probes_local, k=10)


def ivf_batch_search_strict(
    spark: SparkSession,
    vectors: DataFrame,
    probe_rows: list,
    cents: list,
    nprobe: int = 2,
    k: int = 10,
    pc_pairs: list | None = None,
    rebalance_hot: bool = True,
) -> DataFrame:
    """Batched IVF search with STRICT per-probe nprobe semantics: probe
    p's candidates are exactly the vectors assigned to p's own nprobe
    nearest cells (not the union of all probes' cells, which
    ivf_topk_search accepts as a recall-improving superset). One plan
    for the whole probe batch:

    1. (probe_id, centroid_id) pairs — nprobe rows per probe, computed
       driver-side over the cached centroid list (bounded work) and
       BROADCAST into a join with the cell-partitioned vectors, so each
       probe's candidate set materializes tagged with its probe_id and
       non-selected cells never leave disk.
    2. An Arrow-batched kernel scores each batch's rows against their
       OWN probe's unit vector (grouped matmul per probe present in the
       batch) and emits only the local top-k per probe — the exchange
       carries <= k * n_probes rows per partition.
    3. Global per-probe top-k window over the unioned local winners.

    Identical rounding/tie order to exact_knn_fast (half-up 6 dp, then
    score DESC, neighbor_id ASC), so per-probe results are bit-equal to
    running the sequential single-probe path on the same cells — the
    amortization claim is measured against an identical answer
    (tools/ann_batch_probe.py). At 100 TB this is the serving shape:
    the request batch is the broadcast side, the index never reshuffles,
    and per-batch cost is the sum of the probed cells' sizes."""
    import numpy as np
    import pandas as pd

    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_batch

    pvecs = {}
    for r in probe_rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        pvecs[int(r.vec_id)] = v / np.linalg.norm(v)
    if pc_pairs is None:
        # vectorized batch routing (round-10 verdict #1): one numpy row
        # reduction per probe over the cached centroid matrix instead
        # of Q*k Python tuple builds — bit-identical order, so the
        # oracle-replayed fixture results are unchanged
        routed = nearest_cells_batch(
            [r.embedding for r in probe_rows], cents, nprobe
        )
        pc_pairs = [
            (int(r.vec_id), int(cid))
            for r, cids_r in zip(probe_rows, routed)
            for cid in cids_r
        ]
    pc_df = spark.createDataFrame(
        pc_pairs, schema="probe_id long, centroid_id int"
    )
    # LITERAL isin on the union of probed cells FIRST: a broadcast join
    # alone would scan every cell partition (no partition pruning from
    # a join), which the 1M probe measured as a ~7 s floor regardless
    # of batch size; the literal filter prunes the scan to the probed
    # cells, and the broadcast join then only tags survivors per probe.
    union_cells = sorted({c for _, c in pc_pairs})
    pruned = vectors.filter(F.col("centroid_id").isin(union_cells)).withColumn(
        "centroid_id", F.col("centroid_id").cast("int")
    )
    # HOT-CELL replication (round-8 verdict #7): a cell probed by many
    # batch queries multiplies its scan splits' work by its probe count
    # — on a compacted index (one file per cell) a skewed request batch
    # funnels the whole fan-out + matmul through one or two tasks. Hot
    # cells' SOURCE rows are spread round-robin across the cluster
    # BEFORE the tagging join (the exchange moves only raw cell rows;
    # rebalancing after the join would shuffle-write the multiplied
    # candidates from the same few scan tasks — measured to give back
    # the entire win). Cold cells keep the narrow no-shuffle path; the
    # per-probe top-k window merges both identically (round/tie
    # discipline is partitioning-invariant, so results stay bit-equal —
    # asserted in tools/ann_batch_probe.py). The floor is ABSOLUTE, not
    # relative-to-average: when every probed cell is equally hot (all
    # probes hit one region) a 2x-avg rule never fires.
    from collections import Counter

    probes_per_cell = Counter(c for _, c in pc_pairs)
    hot_cells = sorted(
        c for c, cnt in probes_per_cell.items() if cnt >= HOT_CELL_PROBE_FLOOR
    )
    # replication is a pure parallelism play — on a single-slot session
    # the extra exchange buys nothing, so keep the narrow path
    if spark.sparkContext.defaultParallelism <= 1:
        hot_cells = []
    if rebalance_hot and hot_cells:
        cold_v = pruned.filter(~F.col("centroid_id").isin(hot_cells))
        hot_v = pruned.filter(F.col("centroid_id").isin(hot_cells)).repartition(
            spark.sparkContext.defaultParallelism
        )
        pruned = cold_v.unionByName(hot_v)
    cand = (
        pruned.join(F.broadcast(pc_df), "centroid_id")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", "embedding")
    )

    def score(batches):
        for pdf in batches:
            out_p, out_n, out_s = [], [], []
            for pid, grp in pdf.groupby("probe_id", sort=False):
                pv = pvecs[int(pid)]
                ids = grp["vec_id"].to_numpy()
                m = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
                m /= np.linalg.norm(m, axis=1, keepdims=True)
                col = m @ pv
                # half-up 6 dp BEFORE selection (oracle / exact_knn_fast
                # parity); threshold-keep boundary ties, then exact-sort
                r6 = np.sign(col) * np.floor(np.abs(col) * 1e6 + 0.5) / 1e6
                if len(r6) > k:
                    thr = np.partition(r6, len(r6) - k)[len(r6) - k]
                    keep = np.flatnonzero(r6 >= thr)
                else:
                    keep = np.arange(len(r6))
                order = np.lexsort((ids[keep], -r6[keep]))[:k]
                top = keep[order]
                out_p.extend([int(pid)] * len(top))
                out_n.extend(ids[top])
                out_s.extend(r6[top])
            yield pd.DataFrame(
                {"probe_id": out_p, "neighbor_id": out_n, "score": out_s}
            )

    local = cand.mapInPandas(
        score, schema="probe_id long, neighbor_id long, score double"
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return local.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= k)


@query(
    "ivf_strict_nprobe_search",
    # Full value oracle: per-probe cell restriction (JOIN on the probe's
    # OWN top-nprobe cells) instead of ivf_topk_search's union superset.
    oracle=f"""
    WITH {_KM_CTES},
    pc AS (
      SELECT vec_id AS probe_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c WHERE e.vec_id < 3
      ) WHERE rn <= 2
    ),
    p AS (SELECT vec_id AS probe_id, v AS pv FROM km_emb WHERE vec_id < 3),
    scored AS (
      SELECT p.probe_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.v, p.pv), 6) AS score
      FROM km_assign a
      JOIN pc ON a.cid = pc.cid
      JOIN p ON p.probe_id = pc.probe_id
      WHERE a.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K9", "K8", "E4", "L5"),
)
def ivf_strict_nprobe_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-nprobe batched ANN over the persisted IVF layout: each
    probe scores ONLY its own 2 nearest cells (the classic FAISS nprobe
    contract), the whole batch in one plan."""
    path = ensure_ivf_index(spark, sf_dir)
    vectors, _ = read_ivf_index(spark, path)
    cents = index_centroids(spark, path)
    probe_rows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    )
    return ivf_batch_search_strict(
        spark, vectors, probe_rows, cents, nprobe=2, k=10
    )


# ---------------------------------------------------------------------------
# Adaptive nprobe (round 8, continuation): fixed nprobe under-probes
# small cells (too few candidates -> recall loss) and over-probes big
# ones (wasted scan). The adaptive rule expands each probe's cell list
# in nearest-first order until the cells seen so far hold >= C
# candidate vectors — recall is controlled by CANDIDATE COUNT, the
# quantity that actually drives it, while scan cost stays bounded by
# ~C + one cell. The expansion is a pure function of the (tiny) cell
# histogram + centroid distances, so the DuckDB oracle REPLAYS THE
# DECISION (cumulative cell sizes over the same distance order) and a
# drifted engine-side expansion hash-fails — same discipline as
# filtered_knn_adaptive. At 100 TB the histogram is catalog metadata;
# the decision costs nothing.
# ---------------------------------------------------------------------------
_ADAPTIVE_C = 60  # minimum candidates per probe before expansion stops


@query(
    "ivf_adaptive_nprobe_search",
    oracle=f"""
    WITH {_KM_CTES},
    cellsz AS (SELECT cid, count(*) AS n FROM km_assign GROUP BY cid),
    pd AS (
      SELECT e.vec_id AS probe_id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_KM_D2}, c.cid) AS rn
      FROM km_emb e, km_c{_IVF_ROUNDS} c WHERE e.vec_id < 3
    ),
    expanded AS (
      SELECT pd.probe_id, pd.cid,
             COALESCE(sum(s.n) OVER (
               PARTITION BY pd.probe_id ORDER BY pd.rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM pd JOIN cellsz s ON s.cid = pd.cid
    ),
    pc AS (SELECT probe_id, cid FROM expanded
           WHERE cum_before < {_ADAPTIVE_C}),
    p AS (SELECT vec_id AS probe_id, v AS pv FROM km_emb WHERE vec_id < 3),
    scored AS (
      SELECT p.probe_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.v, p.pv), 6) AS score
      FROM km_assign a
      JOIN pc ON a.cid = pc.cid
      JOIN p ON p.probe_id = pc.probe_id
      WHERE a.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K9", "K8", "E4", "L5"),
)
def ivf_adaptive_nprobe_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-count-adaptive ANN: each probe expands nearest-first
    through the cell histogram until >= {C} candidates are covered,
    then the strict batched kernel scores exactly those cells."""
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_batch

    path = ensure_ivf_index(spark, sf_dir)
    vectors, _ = read_ivf_index(spark, path)
    cents = index_centroids(spark, path)
    # cell histogram: k rows, bounded driver state (catalog metadata at
    # scale); empty cells are skipped on both sides. Cached under the
    # append-proof content tag — repeat calls issue no count job.
    counts = ivf_cell_histogram(spark, path, vectors)
    probe_rows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    )
    # full per-probe cell ranking, vectorized (the adaptive rule ranks
    # ALL k cells per probe — the scalar loop was O(Q*k) Python)
    ranked = nearest_cells_batch(
        [r.embedding for r in probe_rows], cents, len(cents)
    )
    pc_pairs = []
    for r, cids_r in zip(probe_rows, ranked):
        cum = 0
        for cid in cids_r:
            n = counts.get(cid, 0)
            if n == 0:
                continue
            if cum >= _ADAPTIVE_C:
                break
            pc_pairs.append((int(r.vec_id), int(cid)))
            cum += n
    return ivf_batch_search_strict(
        spark, vectors, probe_rows, cents, k=10, pc_pairs=pc_pairs
    )


# ---------------------------------------------------------------------------
# G6 scale path: IVF-bucketed semantic near-dup. The exact all-pairs form
# (operators.vector_ops.semantic_dup_pairs) is O(n^2) in interpreted
# (operators.vector_ops.semantic_dup_pairs) is O(n^2) in interpreted
# higher-order lambdas — correct, oracle-checked, and hopeless at scale.
# This path multi-assigns each vector to its 2 nearest centroids, then
# does numpy all-pairs ONLY within each cell (applyInPandas), so cost is
# sum over cells of |cell|^2 — with balanced cells, ~n^2/k — and each
# cell's matmul is one vectorized BLAS call instead of per-element
# lambda interpretation. The per-cell kernel is BLOCKED (round-5 verdict
# #4): a skewed/hot cell of n rows must not materialize an n x n
# similarity matrix — duplicate-heavy corpora produce exactly such
# cells. The kernel tiles the upper triangle into _CELL_BLOCK-sized
# square blocks, so peak memory is O(_CELL_BLOCK^2) + O(n*d) regardless
# of cell size, while the emitted pair set (and the oracle hash) is
# bit-identical to the unblocked form.
# ---------------------------------------------------------------------------
_CELL_BLOCK = 4096  # rows per matmul tile; peak sims memory = BLOCK^2 * 8B


def _cell_pairs_kernel(tau: float):
    """Grouped-map kernel: all within-cell pairs with cos >= tau, tiled
    so a hot cell can never OOM an executor (see block comment)."""

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []}).astype(
            {"a_id": "int64", "b_id": "int64", "cos_sim": "float64"}
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        B = _CELL_BLOCK
        out = [empty]
        for i0 in range(0, len(ids), B):
            mi = m[i0 : i0 + B]
            for j0 in range(i0, len(ids), B):
                sims = mi @ m[j0 : j0 + B].T
                # half-up round BEFORE thresholding: the oracle filters
                # round(cos,6) >= tau, so a raw sim in [tau-5e-7, tau)
                # must be KEPT (its rounded value crosses tau) — the
                # same "round before selection" discipline
                # ivf_batch_search_strict follows
                sims = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
                mask = sims >= tau
                if i0 == j0:
                    mask = np.triu(mask, k=1)
                ii, jj = np.nonzero(mask)
                if len(ii) == 0:
                    continue
                out.append(
                    pd.DataFrame(
                        {
                            "a_id": ids[i0 + ii],
                            "b_id": ids[j0 + jj],
                            "cos_sim": sims[ii, jj],
                        }
                    )
                )
        return pd.concat(out, ignore_index=True)

    return cell_pairs


# Full value oracle for the IVF-bucketed pair set: deterministic top-2
# cell assignment => the exact candidate-pair set is SQL-replayable;
# precision is by construction (every emitted pair re-checks cos >= tau
# on the raw vectors). Shared verbatim by the capped variant below —
# sub-bucketing changes WHERE pairs are computed, never WHICH pairs.
_SEMANTIC_PAIRS_ORACLE = f"""
    WITH {_KM_CTES},
    a2 AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c
      ) WHERE rn <= 2
    ),
    cand AS (
      SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
      FROM a2 x JOIN a2 y ON x.cid = y.cid AND x.vec_id < y.vec_id
    )
    SELECT c.a_id, c.b_id,
           round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
    FROM cand c
    JOIN km_emb ea ON ea.vec_id = c.a_id
    JOIN km_emb eb ON eb.vec_id = c.b_id
    WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.3
    """


@query(
    "semantic_dup_pairs_ivf",
    oracle=_SEMANTIC_PAIRS_ORACLE,
    operators=("G6", "K9", "L3", "C10"),
    bench=True,
)
def semantic_dup_pairs_ivf(spark: SparkSession, sf_dir: str, tau: float = 0.3) -> DataFrame:
    """Scale-safe DEFAULT: routes through the cell-size-capped
    sub-bucketing path below with the production cap — on the fixtures
    (and any corpus without a >4096-row hot cell) zero cells split, so
    the plan is the familiar one-task-per-cell kernel; a hot cell at
    corpus scale fans out instead of serializing one Python worker.
    Pair set (and oracle) identical either way."""
    return semantic_dup_pairs_capped(spark, sf_dir, tau=tau, cap=_PROD_CELL_CAP)


# ---------------------------------------------------------------------------
# G6 skew-hardened path (round-8 verdict #1): the tiled kernel above
# bounds MEMORY on a hot cell but still serializes one task doing
# O(|cell|^2) WORK — a duplicate-heavy corpus clusters exactly there.
# The capped variant splits any cell above _CELL_CAP rows into
# nsub = ceil(|cell|/_CELL_CAP) deterministic sub-cells (vec_id mod nsub)
# and fans the upper-triangle of sub-cell pairs out as independent tasks:
# a vector in sub-cell s replicates to the nsub tasks
# {(min(s,t), max(s,t)) : t in 0..nsub-1}, so every within-cell pair
# lands in EXACTLY ONE (cell, ti, tj) task. Per-task work is bounded at
# O(_CELL_CAP^2) regardless of cell size; total work is unchanged; the
# emitted pair set is bit-identical to the uncapped form (same oracle).
# At 100 TB the replication factor for an m-row cell is m/_CELL_CAP rows
# of narrow (id, vec) data — linear fan-out buying quadratic-work
# parallelism.
# ---------------------------------------------------------------------------
_CELL_CAP = 64  # small enough that sf0.01 (~125 rows/cell) exercises the split
_PROD_CELL_CAP = 4096  # production bound: one task's matmul tops out at 4096^2


def _sub_bucket_tasks(
    assigned: DataFrame, cap: int, nsub_by_cell: list[int] | None = None
) -> DataFrame:
    """Replicate each (vec_id, embedding, centroid_id) row to its
    sub-bucket-pair tasks. Adds (ti, tj, sub); cells at or under ``cap``
    stay whole (nsub=1 -> single task (0,0), zero replication).

    ``nsub_by_cell`` (positional by centroid_id) ships as ONE literal
    array — no count job, no join in the plan; callers with an
    immutable index cache the per-cell sizes once per index path.
    Without it, sizes come from a groupBy + broadcast join."""
    if nsub_by_cell is not None:
        withsub = assigned.withColumn(
            "nsub",
            # try_element_at: NULL (not an ANSI error) past the array end
            F.coalesce(
                F.try_element_at(F.lit(nsub_by_cell), F.col("centroid_id") + 1),
                F.lit(1),
            ),
        ).withColumn("sub", F.pmod(F.col("vec_id"), F.col("nsub")).cast("int"))
        return _explode_tasks(withsub)
    sizes = assigned.groupBy("centroid_id").agg(F.count("*").alias("cell_n"))
    nsub = F.ceil(F.col("cell_n") / F.lit(cap)).cast("int")
    withsub = (
        assigned.join(F.broadcast(sizes), "centroid_id")
        .withColumn("nsub", F.greatest(F.lit(1), nsub))
        .withColumn("sub", F.pmod(F.col("vec_id"), F.col("nsub")).cast("int"))
    )
    return _explode_tasks(withsub)


def _explode_tasks(withsub: DataFrame) -> DataFrame:
    tasks = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.col("nsub") - 1),
            lambda t: F.struct(
                F.least(F.col("sub"), t).alias("ti"),
                F.greatest(F.col("sub"), t).alias("tj"),
            ),
        )
    )
    return withsub.withColumn("task", F.explode(tasks)).select(
        "centroid_id",
        F.col("task.ti").alias("ti"),
        F.col("task.tj").alias("tj"),
        "vec_id",
        "embedding",
        "sub",
    )


def _sub_cell_pairs_kernel(tau: float):
    """Grouped-map kernel over (centroid_id, ti, tj) tasks. ti == tj:
    upper-triangle within one sub-cell (identical math to
    _cell_pairs_kernel). ti < tj: full bipartite block between the two
    sub-cells, ids canonicalised a_id < b_id. Rounding matches the
    oracle's half-up round(x, 6) exactly."""

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []}).astype(
            {"a_id": "int64", "b_id": "int64", "cos_sim": "float64"}
        )
        if len(pdf) < 2:
            return empty

        def norm_mat(frame: pd.DataFrame):
            m = np.stack(frame["embedding"].to_numpy()).astype(np.float64)
            return m / np.linalg.norm(m, axis=1, keepdims=True)

        def rounded(sims):
            return np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6

        # round BEFORE thresholding (oracle parity on boundary values —
        # see the identical note in _cell_pairs_kernel)
        if int(pdf["ti"].iloc[0]) == int(pdf["tj"].iloc[0]):
            pdf = pdf.sort_values("vec_id")
            ids = pdf["vec_id"].to_numpy()
            m = norm_mat(pdf)
            sims = rounded(m @ m.T)
            mask = np.triu(sims >= tau, k=1)
            ii, jj = np.nonzero(mask)
            if len(ii) == 0:
                return empty
            return pd.DataFrame(
                {"a_id": ids[ii], "b_id": ids[jj], "cos_sim": sims[ii, jj]}
            )
        ti = int(pdf["ti"].iloc[0])
        a = pdf[pdf["sub"] == ti]
        b = pdf[pdf["sub"] != ti]
        if len(a) == 0 or len(b) == 0:
            return empty
        aid, bid = a["vec_id"].to_numpy(), b["vec_id"].to_numpy()
        sims = rounded(norm_mat(a) @ norm_mat(b).T)
        ii, jj = np.nonzero(sims >= tau)
        if len(ii) == 0:
            return empty
        x, y = aid[ii], bid[jj]
        return pd.DataFrame(
            {
                "a_id": np.minimum(x, y),
                "b_id": np.maximum(x, y),
                "cos_sim": sims[ii, jj],
            }
        )

    return pairs


@query(
    "semantic_dup_pairs_capped",
    # Identical oracle to semantic_dup_pairs_ivf: sub-bucketing is a
    # physical re-plan (bounded per-task work under hot cells), not a
    # semantic change — the hash-match against the uncapped pair set IS
    # the acceptance test the round-8 verdict asked for.
    oracle=_SEMANTIC_PAIRS_ORACLE,
    operators=("G6", "K9", "L3", "C10"),
)
def semantic_dup_pairs_capped(
    spark: SparkSession, sf_dir: str, tau: float = 0.3, cap: int = _CELL_CAP
) -> DataFrame:
    return semantic_pairs_on_index(
        spark, ensure_ivf_index(spark, sf_dir), tau=tau, cap=cap
    )


# ---------------------------------------------------------------------------
# G6 incremental: DELTA-vs-corpus semantic near-dups through the shared
# index — the embedding-space twin of minhash_incremental_pairs and the
# screen an append-style pipeline runs before admitting new vectors.
# Delta rows (vec_id % 5 == 4, standing in for an arriving batch) and
# corpus rows each take their top-2 nearest cells; candidates are the
# CROSS-side co-occurrences only (never delta×delta or corpus×corpus),
# verified on raw vectors with the same half-up-6-BEFORE-threshold
# discipline as the batch kernels. Cost ∝ delta × probed-cell mass; the
# corpus side never pairs against itself.
# ---------------------------------------------------------------------------
@query(
    "semantic_dup_delta_pairs",
    oracle=f"""
    WITH {_KM_CTES},
    a2 AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c
      ) WHERE rn <= 2
    ),
    cand AS (
      SELECT DISTINCT x.vec_id AS corpus_id, y.vec_id AS delta_id
      FROM a2 x JOIN a2 y ON x.cid = y.cid
      WHERE x.vec_id % 5 <> 4 AND y.vec_id % 5 = 4
    )
    SELECT c.corpus_id, c.delta_id,
           round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
    FROM cand c
    JOIN km_emb ea ON ea.vec_id = c.corpus_id
    JOIN km_emb eb ON eb.vec_id = c.delta_id
    WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.3
    """,
    operators=("G6", "K7", "C10", "L5"),
)
def semantic_dup_delta_pairs(
    spark: SparkSession, sf_dir: str, tau: float = 0.3
) -> DataFrame:
    import numpy as np
    import pandas as pd

    from cloudvectordb_spark.operators.kmeans_det import assign_top2_cells

    path = ensure_ivf_index(spark, sf_dir)
    cents = index_centroids(spark, path)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    is_delta = F.col("vec_id") % 5 == 4
    a2_corpus = assign_top2_cells(emb.filter(~is_delta), cents).select(
        F.col("vec_id").alias("corpus_id"), "centroid_id"
    )
    a2_delta = assign_top2_cells(emb.filter(is_delta), cents).select(
        F.col("vec_id").alias("delta_id"), "centroid_id"
    )
    # delta side broadcast: the corpus assignment streams, exactly like
    # the MinHash incremental join
    cand = (
        a2_corpus.join(F.broadcast(a2_delta), "centroid_id")
        .select("corpus_id", "delta_id")
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("delta_id"), F.col("embedding").alias("vb"))
    paired = cand.join(ea, "corpus_id").join(F.broadcast(eb), "delta_id")

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            va = np.stack(pdf["va"].to_numpy()).astype(np.float64)
            vb = np.stack(pdf["vb"].to_numpy()).astype(np.float64)
            sims = (va * vb).sum(axis=1) / (
                np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
            )
            # half-up-6 BEFORE thresholding (the shared kernel rule)
            sims = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
            keep = sims >= tau
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    "corpus_id": pdf["corpus_id"].to_numpy()[keep],
                    "delta_id": pdf["delta_id"].to_numpy()[keep],
                    "cos_sim": sims[keep],
                }
            )

    return paired.mapInPandas(
        verify, schema="corpus_id long, delta_id long, cos_sim double"
    )


def semantic_pairs_on_index(
    spark: SparkSession, path: str, tau: float = 0.3, cap: int = _PROD_CELL_CAP
) -> DataFrame:
    """Capped IVF-bucketed near-dup pairs over ANY persisted index path
    (the api.VectorIndex.dedup_pairs surface; the registered queries
    call it with the fixture index)."""
    from cloudvectordb_spark.cache import artifact_cache
    from cloudvectordb_spark.operators.kmeans_det import assign_top2_cells

    vectors = ivf_vectors_frame(spark, path)
    cents = index_centroids(spark, path)
    assigned2 = assign_top2_cells(
        vectors.drop("centroid_id").select("vec_id", "embedding"), cents
    )

    # per-cell top-2 sizes are a pure function of the immutable index —
    # cache the k-row list per path so repeat calls ship nsub as one
    # literal (no count job, no join; measured +0.28 s/call otherwise)
    def sizes():
        rows = assigned2.groupBy("centroid_id").agg(
            F.count("*").alias("n")
        ).collect()
        return {int(r.centroid_id): int(r.n) for r in rows}

    # key embeds the APPEND-PROOF content fingerprint (max mtime over
    # vectors/ and its centroid_id=* children — ivf_content_tag): an
    # in-process rebuild/append at the same path must not serve stale
    # sizes — results would stay correct (nsub is partition-invariant)
    # but the hot-cell splitting the cap exists for would silently stop
    # firing on the grown cells. The dir's OWN mtime was not enough: an
    # append into existing cell subdirs only bumps the children
    # (round-10 ADVICE item 4).
    by_cell = artifact_cache(
        ("top2_cell_sizes", path, ivf_content_tag(path)), sizes
    )
    max_cid = max(by_cell, default=-1)
    nsub_by_cell = [
        max(1, -(-by_cell.get(c, 0) // cap)) for c in range(max_cid + 1)
    ]
    if max(nsub_by_cell, default=1) == 1:
        # no hot cells: degrade to the plain one-task-per-cell kernel —
        # identical pair set, zero fan-out overhead (sizes are known
        # driver-side, so the decision costs nothing in the plan)
        pairs = assigned2.groupBy("centroid_id").applyInPandas(
            _cell_pairs_kernel(tau), "a_id bigint, b_id bigint, cos_sim double"
        )
        return pairs.dropDuplicates(["a_id", "b_id"])
    exploded = _sub_bucket_tasks(assigned2, cap, nsub_by_cell)
    pairs = exploded.groupBy("centroid_id", "ti", "tj").applyInPandas(
        _sub_cell_pairs_kernel(tau), "a_id bigint, b_id bigint, cos_sim double"
    )
    # a pair can surface from up to 2 shared cells -> dedupe (never from
    # two tasks of the SAME cell — the task fan-out is a partition)
    return pairs.dropDuplicates(["a_id", "b_id"])


# ---------------------------------------------------------------------------
# G6 end-to-end: semantic near-dup pairs -> connected components ->
# "keep one per semantic cluster", mirroring the text path
# (dedup.dedup_canonical_clusters). A user gets (vec_id, canonical_id,
# cluster_size) directly instead of composing the pieces by hand. The CC
# rounds are Pregel-style min-label propagation (keyed joins only); recall
# vs the exact-pairs clustering is pytest-gated.
# ---------------------------------------------------------------------------
@query(
    "semantic_canonical_clusters",
    # Full value oracle: the deterministic pair set feeds a recursive
    # transitive closure (same pattern as dedup_canonical_clusters);
    # Spark uses the scalable Pregel-style min-label propagation.
    oracle=f"""
    WITH RECURSIVE {_KM_CTES},
    a2 AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c
      ) WHERE rn <= 2
    ),
    cand AS (
      SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
      FROM a2 x JOIN a2 y ON x.cid = y.cid AND x.vec_id < y.vec_id
    ),
    pairs AS (
      SELECT c.a_id, c.b_id FROM cand c
      JOIN km_emb ea ON ea.vec_id = c.a_id
      JOIN km_emb eb ON eb.vec_id = c.b_id
      WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.3
    ),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION SELECT b_id, a_id FROM pairs
    ),
    reach (src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
    ),
    members AS (
      SELECT src AS vec_id, least(src, min(dst)) AS canonical_id
      FROM reach GROUP BY src
    )
    SELECT vec_id, canonical_id,
           CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT)
             AS cluster_size
    FROM members
    """,
    operators=("G6", "K9", "L3", "D1"),
)
def semantic_canonical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.operators.dedup import connected_components

    # scale-safe default: the capped pair generator (identical pair set;
    # the production cap means fixture-scale cells never split, while a
    # hot cell at corpus scale fans out instead of serializing one task)
    edges = semantic_dup_pairs_capped(spark, sf_dir, cap=_PROD_CELL_CAP).select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    comp = connected_components(edges)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("vec_id"),
        F.col("component").alias("canonical_id"),
        F.count("*").over(w).cast("bigint").alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# S4 alternative / K10: random-projection LSH bucket layout. The
# hyperplanes are md5-derived Rademacher (+-1) sign vectors — the same
# replayable-projection trick as the JL tier (vector_ops.jl_project) —
# so bucket ids, candidate sets, and search results all carry FULL
# value-level DuckDB oracles (round 4's MLlib BucketedRandomProjectionLSH
# consumed an RNG DuckDB could not replay; +-1 hyperplanes are a valid
# p-stable-projection family for L2 just like Gaussian ones).
# ---------------------------------------------------------------------------
# 6 tables x bucketLength 0.75 measured recall 0.80 @ sf0.001 (floor
# 0.6, tests/test_pipeline.py) — +-1 hyperplanes on this 10-cluster
# unit-sphere fixture need wider buckets than Gaussian ones would
_LSH_TABLES = 6
_LSH_DIM = 64
_LSH_BUCKET_LEN = 0.75


def _lsh_sign(t: int, j: int) -> float:
    import hashlib

    return (
        1.0
        if hashlib.md5(f"lsh{t}_{j}".encode()).hexdigest()[0] in "02468ace"
        else -1.0
    )


def lsh_bucket(vec_col: str, t: int):
    """Bucket id for hash table ``t``: floor(round(<v, w_t>, 6) / L) with
    the md5-derived sign vector w_t as one literal array — whole-stage
    codegen, no Python. Rounding before floor pins the boundary so Spark
    and DuckDB bucket identically. (Single-table helper; the batch path
    is ``lsh_hashed``.)"""
    signs = F.lit([_lsh_sign(t, j) for j in range(_LSH_DIM)])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), signs, lambda x, s: x * s),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    return F.floor(F.round(dot, 6) / F.lit(_LSH_BUCKET_LEN)).cast("long")


def lsh_hashed(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One row per (vector, hash table): (.., table_id, bucket) — the
    banded layout a bucket-join probe path consumes. At 100 TB this is a
    narrow projection; the only shuffle is the downstream equi-join.

    The sign matrix ships as ONE nested-array literal + a transform
    lambda (same driver-time economics as kmeans_det._dist_structs: no
    tables*dim separate F.lit leaves)."""
    sm = F.lit(
        [[_lsh_sign(t, j) for j in range(_LSH_DIM)] for t in range(_LSH_TABLES)]
    )
    v = F.col(vec_col).cast("array<double>")
    entries = F.transform(
        sm,
        lambda s, t: F.struct(
            t.cast("int").alias("table_id"),
            F.floor(
                F.round(
                    F.aggregate(
                        F.zip_with(v, s, lambda x, w: x * w),
                        F.lit(0.0),
                        lambda acc, z: acc + z,
                    ),
                    6,
                )
                / F.lit(_LSH_BUCKET_LEN)
            )
            .cast("long")
            .alias("bucket"),
        ),
    )
    return df.withColumn("h", F.explode(entries)).select(
        "*", F.col("h.table_id").alias("table_id"), F.col("h.bucket").alias("bucket")
    ).drop("h")


# DuckDB twin of lsh_hashed over the embeddings table: (vec_id, v,
# table_id, bucket). GROUP BY sums the same rounded dot both engines rank.
_LSH_CTES = f"""lsh_signs AS (
      SELECT t.t, u.j,
             CASE WHEN substr(md5('lsh' || t.t || '_' || u.j), 1, 1)
                  IN ('0','2','4','6','8','a','c','e')
                  THEN 1.0 ELSE -1.0 END AS s
      FROM range({_LSH_TABLES}) t(t), range({_LSH_DIM}) u(j)
    ),
    lsh_b AS (
      SELECT e.vec_id, CAST(s.t AS INTEGER) AS table_id,
             CAST(floor(round(sum(CAST(e.embedding[s.j + 1] AS DOUBLE) * s.s), 6)
                        / {_LSH_BUCKET_LEN}) AS BIGINT) AS bucket
      FROM embeddings e, lsh_signs s
      GROUP BY e.vec_id, s.t
    )"""


@query(
    "lsh_bucket_counts",
    # Deterministic hyperplanes => the EXACT per-(table, bucket)
    # histogram is the oracle (upgraded from round 4's row-total check).
    oracle=f"""
    WITH {_LSH_CTES}
    SELECT table_id, bucket, CAST(count(*) AS BIGINT) AS n_vectors
    FROM lsh_b GROUP BY table_id, bucket
    """,
    operators=("K10", "A3"),
)
def lsh_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return (
        lsh_hashed(emb.select("vec_id", "embedding"))
        .groupBy("table_id", "bucket")
        .agg(F.count("*").cast("bigint").alias("n_vectors"))
    )


# ---------------------------------------------------------------------------
# S2 handoff (K4): the engine exports triplet shards (A3 sink on
# triplet_mining output) and trains on them. The EXECUTED path is
# training.train_encoder_spark (distributed local-SGD + per-round model
# averaging on Spark tasks — convergence and bit-determinism gated in
# tests/test_training.py); TorchDistributor(...).run(train_fn) is the
# documented swap-in for torch/GPU clusters (torch absent here).
# ---------------------------------------------------------------------------
def export_triplet_shards(triplets: DataFrame, path: str, num_shards: int = 8) -> None:
    """S1->S2 handoff: balanced parquet shards for the training job."""
    triplets.repartition(num_shards).write.mode("overwrite").parquet(path)


# ---------------------------------------------------------------------------
# S1 for ENCODER training (K3/K4): TEXT triplets off the documents table.
# Positive = the next doc of the same language (lead over a per-lang
# window — parallel across languages); negative = the rank-aligned doc
# from the cyclically-next language (per-lang rank joined through a
# bounded language map — langs are a handful of rows at any corpus
# size). Fully deterministic, no RNG, every step either a per-lang
# window or a keyed equi-join: the 100 TB shape. The learning task this
# encodes — same-language docs embed closer than cross-language ones —
# is exactly what the hash-BoW contrastive trainer can provably improve
# on, which the training tests assert.
# ---------------------------------------------------------------------------
def build_text_triplets(
    spark: SparkSession, sf_dir: str, num_shards: int = 4
) -> DataFrame:
    from cloudvectordb_spark.ranking import _zero

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    w = Window.partitionBy("lang").orderBy("doc_id")
    ranked = docs.withColumn("rk", F.row_number().over(w) - 1)

    langs = docs.groupBy("lang").agg(F.count("*").alias("n_lang"))
    # language table is bounded (a handful of rows) — the _zero-partition
    # window and the broadcasts below are over that bounded set only
    li_w = Window.partitionBy(_zero(F.col("lang"))).orderBy("lang")
    lmeta = langs.withColumn("li", F.row_number().over(li_w) - 1)
    nl = lmeta.agg(F.count("*").alias("n_langs"))
    negmap = (
        lmeta.crossJoin(F.broadcast(nl))
        .withColumn("next_li", (F.col("li") + 1) % F.col("n_langs"))
        .join(
            F.broadcast(
                lmeta.select(
                    F.col("li").alias("next_li"),
                    F.col("lang").alias("neg_lang"),
                    F.col("n_lang").alias("n_neg_lang"),
                )
            ),
            "next_li",
        )
        .select("lang", "neg_lang", "n_neg_lang")
    )

    anchors = (
        ranked.select(
            "lang",
            "rk",
            F.col("doc_id").alias("anchor_id"),
            F.col("text").alias("anchor_text"),
            F.lead("doc_id").over(w).alias("pos_id"),
            F.lead("text").over(w).alias("pos_text"),
        )
        .filter(F.col("pos_id").isNotNull())
        .join(F.broadcast(negmap), "lang")
    )
    negs = ranked.select(
        F.col("lang").alias("neg_lang"),
        F.col("rk").alias("neg_rk"),
        F.col("doc_id").alias("neg_id"),
        F.col("text").alias("neg_text"),
    )
    return (
        anchors.withColumn("neg_rk", F.col("rk") % F.col("n_neg_lang"))
        .join(negs, ["neg_lang", "neg_rk"])
        .select(
            (F.col("anchor_id") % num_shards).alias("shard_id"),
            "anchor_id",
            "anchor_text",
            "pos_id",
            "pos_text",
            "neg_id",
            "neg_text",
            "lang",
            "neg_lang",
        )
    )


@query(
    "text_triplets_build",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id, text,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS rk
      FROM documents
    ),
    lmeta AS (
      SELECT lang, count(*) AS n_lang,
             row_number() OVER (ORDER BY lang) - 1 AS li
      FROM documents GROUP BY lang
    ),
    nl AS (SELECT count(*) AS n_langs FROM lmeta),
    negmap AS (
      SELECT a.lang, b.lang AS neg_lang, b.n_lang AS n_neg_lang
      FROM lmeta a, nl, lmeta b
      WHERE b.li = (a.li + 1) % nl.n_langs
    ),
    anchors AS (
      SELECT lang, rk, doc_id AS anchor_id,
             lead(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS pos_id
      FROM ranked
    )
    SELECT a.anchor_id, a.pos_id, n.doc_id AS neg_id, a.lang, m.neg_lang
    FROM anchors a
    JOIN negmap m USING (lang)
    JOIN ranked n ON n.lang = m.neg_lang AND n.rk = a.rk % m.n_neg_lang
    WHERE a.pos_id IS NOT NULL
    """,
    operators=("K3", "K1", "C1", "E2"),
)
def text_triplets_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 text-triplet mining, id view (texts carried alongside for the
    S2 trainer; the oracle verifies the pairing logic end-to-end)."""
    return build_text_triplets(spark, sf_dir).select(
        "anchor_id", "pos_id", "neg_id", "lang", "neg_lang"
    )


# ---------------------------------------------------------------------------
# K10 search side: ANN via the random-projection LSH layout. Probes and
# corpus hash through the SAME deterministic hyperplanes; candidates are
# an equi-join on (hash table, bucket) — bucket-bounded, never all-pairs.
# Completes K10: lsh_bucket_counts is the build/layout view, this is the
# probe view. Full value oracle: the candidate SET itself is replayable.
# ---------------------------------------------------------------------------
@query(
    "lsh_topk_search",
    oracle=f"""
    WITH {_LSH_CTES},
    pb AS (SELECT vec_id AS probe_id, table_id, bucket FROM lsh_b WHERE vec_id < 3),
    cand AS (
      SELECT DISTINCT pb.probe_id, c.vec_id
      FROM lsh_b c JOIN pb ON c.table_id = pb.table_id AND c.bucket = pb.bucket
      WHERE c.vec_id <> pb.probe_id
    ),
    scored AS (
      SELECT cand.probe_id, cand.vec_id AS neighbor_id,
             round(list_distance(CAST(ec.embedding AS DOUBLE[]),
                                 CAST(ep.embedding AS DOUBLE[])), 6) AS l2_dist
      FROM cand
      JOIN embeddings ec ON ec.vec_id = cand.vec_id
      JOIN embeddings ep ON ep.vec_id = cand.probe_id
    )
    SELECT probe_id, neighbor_id, l2_dist, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY l2_dist, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K10", "K8", "E4"),
)
def lsh_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.functions import vector as V

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    hashed = lsh_hashed(emb).select("vec_id", "table_id", "bucket")
    probes = lsh_hashed(emb.filter(F.col("vec_id") < 3)).select(
        F.col("vec_id").alias("probe_id"), "table_id", "bucket"
    )
    cand = (
        hashed.join(F.broadcast(probes), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
        .distinct()
    )
    pv = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    scored = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(pv), "probe_id")
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.l2_distance("embedding", "probe_vec"), 6).alias("l2_dist"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("l2_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# K9 lifecycle: incremental index maintenance. New vectors are assigned
# against the FROZEN centroid table (no refit — centroid drift is handled
# by periodic rebuilds, like every IVF system) and appended into the
# partitioned layout; dynamic partition overwrite touches only the
# partitions that received rows. At 100 TB this is the daily-delta path:
# work ∝ delta size, never corpus size.
# ---------------------------------------------------------------------------
def ivf_vectors_frame(spark: SparkSession, index_path: str) -> DataFrame:
    """EVERY row of a persisted IVF index: the partitioned base layout
    plus, when present, the L0 delta tier (``vectors_delta`` — compact,
    unpartitioned parquet that small appends land in; see
    ``append_to_ivf_index``). This is the single read surface for index
    contents — cell pruning still works on the union (the base leg
    prunes whole partition dirs; the L0 leg is a bounded small-file
    scan with the same centroid_id predicate), and compaction folds L0
    back into the partitioned layout.

    The frame is cached per (session, path, append-proof content tag):
    constructing a fresh DataFrame re-runs Spark's driver-side FILE
    LISTING of the whole layout, and at 100M-scale cell counts that
    listing is a ~20 s fixed tax on EVERY query batch (measured: 25k
    cells × 4 files → ~700 ms/probe regardless of nprobe,
    tools/decade_probe.py). Cached, the listing is paid once per
    layout GENERATION — the content tag moves on any append, delete,
    rewrite, or tombstone, so mutations invalidate exactly."""
    import os

    from cloudvectordb_spark.cache import artifact_cache, session_key

    # a crashed in-place L0 fold leaves rows in a staging dir no reader
    # scans — heal before serving (cheap isdir check on the hot path)
    if os.path.isdir(f"{index_path}/vectors_delta.folding"):
        recover_l0_fold(spark, index_path)

    def build():
        base = spark.read.parquet(f"{index_path}/vectors")
        delta_dir = f"{index_path}/vectors_delta"
        if os.path.isdir(delta_dir) and any(
            f.endswith(".parquet") for f in os.listdir(delta_dir)
        ):
            delta = spark.read.parquet(delta_dir)
            # the partition-dir column reads back as int; L0 stores it
            # as a regular column whose type follows the assigner
            base_t = dict(base.dtypes)["centroid_id"]
            delta = delta.withColumn(
                "centroid_id", F.col("centroid_id").cast(base_t)
            )
            base = base.unionByName(delta, allowMissingColumns=True)
        return base

    from cloudvectordb_spark.cache import invalidate

    key = (
        "ivf_vectors_frame",
        os.path.abspath(index_path),
        session_key(spark),
        ivf_content_tag(index_path),
    )
    from cloudvectordb_spark.cache import _CACHE

    if key not in _CACHE:
        # evict prior GENERATIONS of this layout first: every mutation
        # moves the content tag, and each stale entry pins a full
        # driver-side file listing — an ingest service would otherwise
        # leak one per append
        invalidate(key[:3])
    return artifact_cache(key, build)


# rows-per-cell ratio below which an append lands in the L0 tier: a
# partitioned append creates ~one FILE per touched cell, so a delta
# with far fewer rows than cells pays thousands of file creations +
# committer renames for kilobytes of data (measured 19.3 s / 4.3k files
# for a 10k-row delta on a 2,180-cell index — the round-12 append
# floor). Below the threshold the delta writes as a handful of L0
# files instead; compaction folds the tier away.
_L0_ROWS_PER_CELL = 32
# Cost-based admission (round-13 verdict #2): the hard 32-rows/cell
# rule sent the 100M decade's 1M append (41 rows/cell, just over) down
# the partitioned path — ~25k file creations ≈ 537 s for a write whose
# DATA is seconds. The auto rule now reasons in rows-per-created-file:
# a partitioned append touching ~cells·(1-e^(-n/cells)) cells is
# file-creation-bound below _L0_MIN_FILL rows per file (measured
# ~5-20 ms per created file vs ~µs per row), so those deltas take L0
# regardless of the old ratio. Above _L0_MAX_TIER_ROWS a delta is a
# bulk load: its per-file fill is amortized (or it should be a
# build/compact), and parking it in L0 would just defer the same
# scatter to the fold — partitioned path.
_L0_MIN_FILL = 256
_L0_MAX_TIER_ROWS = 4_000_000


def _l0_fold_budget(n_cells: int) -> int:
    """Tier size past which the scan tax outweighs the fold's file
    scatter: at _L0_ROWS_PER_CELL×cells the fold writes files at least
    as full as the old partitioned-append rule would have, and the
    1M floor keeps small indexes from folding on every append."""
    return max(_L0_ROWS_PER_CELL * n_cells, 1_000_000)


def append_to_ivf_index(
    new_vectors: DataFrame,
    index_path: str,
    l0: str | bool = "auto",
    return_rows: bool = False,
) -> int | None:
    """Assign ``new_vectors`` (vec_id, embedding, ...) to their nearest
    existing centroid and append them to the layout.

    Assignment is the same literal-matrix kernel the bulk build and the
    streaming ingester use (`kmeans_det.assign_cells`) — one projection
    pass per row, no crossJoin row amplification, no per-vec_id window
    shuffle (the old k-way explode + row_number cost 101 s for a 90k
    delta against k=2048; the kernel pass is seconds), and bit-identical
    tie behavior to build-time assignment.

    WHERE the rows land is the LSM decision (``l0``):

    - ``False`` — the classic partitioned append: one file per touched
      cell under ``vectors/centroid_id=*``. Right when the delta is
      large relative to the cell count (each file gets real data).
    - ``True`` — the L0 tier: ONE compact unpartitioned write under
      ``vectors_delta/`` with centroid_id as a regular column. Right
      for small deltas, where the partitioned scatter would create
      thousands of near-empty files (file-creation + commit cost
      dominates the append wall; small-files debt poisons every later
      scan). Readers see L0 through ``ivf_vectors_frame``; compaction
      (``compact_ivf_index``) folds it into the cells.
    - ``"auto"`` (default) — COST-BASED (round-13 verdict #2): L0 when
      the partitioned write would be file-creation-bound (estimated
      rows per created file < _L0_MIN_FILL) and the delta is not a
      bulk load (≤ _L0_MAX_TIER_ROWS). After an L0 write, the tier
      auto-FOLDS into the cells once it exceeds the scan-tax budget
      (``_l0_fold_budget`` — see ``fold_l0_tier``), so the burst
      pattern "many small appends" pays the file scatter once,
      amortized, instead of per append or per query.
    """
    import math

    from cloudvectordb_spark.operators.kmeans_det import assign_cells

    # strict tri-state: any other string (l0="false", l0="none") is a
    # caller typo that `if l0:` would silently treat as True, routing
    # the delta to the wrong tier (round-12 ADVICE item 3)
    if not (l0 is True or l0 is False or l0 == "auto"):
        raise ValueError(
            f"l0 must be True, False, or 'auto'; got {l0!r}"
        )
    spark = new_vectors.sparkSession
    recover_l0_fold(spark, index_path)  # heal a crashed fold first
    cents = index_centroids(spark, index_path)
    assigned = assign_cells(new_vectors, cents)
    n = None
    if l0 == "auto" or return_rows:
        n = new_vectors.count()
    if l0 == "auto":
        k = len(cents)
        # expected cells touched by n uniform assignments — skew only
        # lowers it, making the estimate conservative toward L0
        est_files = max(1.0, k * (1.0 - math.exp(-n / max(1, k))))
        l0 = (n / est_files) < _L0_MIN_FILL and n <= _L0_MAX_TIER_ROWS
    if l0:
        # one bounded write: ≤ a few files regardless of how many cells
        # the delta scatters across; the rows still carry their cell id.
        # repartition, NOT coalesce: coalesce(4) propagates BACKWARD
        # through the assign mapInPandas and collapses the O(rows·k·dim)
        # kernel to 4 tasks — the true mechanism of the r13 752 s append2
        # wall (it silently defeated both the input's partitioning and
        # the assign parallelism floor). The explicit shuffle costs
        # seconds for a bounded L0 delta and pins the kernel at the
        # input-side width.
        assigned.repartition(4).write.mode("append").parquet(
            f"{index_path}/vectors_delta"
        )
        # scheduled post-burst compaction: parquet row counts are
        # footer metadata, so sizing the tier is cheap
        tier = spark.read.parquet(f"{index_path}/vectors_delta")
        if tier.count() > _l0_fold_budget(len(cents)):
            fold_l0_tier(spark, index_path)
        return n if return_rows else None
    # shuffle on the key first: an unshuffled partitionBy append writes
    # one file per (task x touched cell) — the same small-files debt
    # write_ivf_index's compacted write killed at bulk-build time
    # (BASELINE.md round-10); keyed, each append adds at most one file
    # per touched cell
    assigned.repartition("centroid_id").write.mode("append").partitionBy(
        "centroid_id"
    ).parquet(f"{index_path}/vectors")
    return n if return_rows else None


def _proc_starttime(pid: int) -> int | None:
    """Kernel start-tick of ``pid`` (/proc/<pid>/stat field 22) — the
    pid-reuse guard for owner liveness checks. None when unreadable
    (non-Linux, or the process is gone)."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            return int(f.read().rsplit(")", 1)[1].split()[19])
    except Exception:
        return None


def _fold_owner_blob() -> str:
    import json
    import os

    pid = os.getpid()
    return json.dumps({"pid": pid, "starttime": _proc_starttime(pid)})


def _owner_alive(blob: str) -> bool:
    """True iff the process that wrote an ``_FOLD_OWNER`` marker is
    still running (same pid AND same kernel start-tick, so a recycled
    pid does not impersonate a dead owner). Malformed/legacy markers
    read as dead — the pre-ownership heal semantics."""
    import json
    import os

    try:
        info = json.loads(blob)
        pid = int(info["pid"])
    except Exception:
        return False
    if pid == os.getpid():
        return True  # our own claim (re-entrant reader in this process)
    cur = _proc_starttime(pid)
    if cur is None:
        return False
    recorded = info.get("starttime")
    return recorded is None or cur == recorded


def fold_l0_tier(spark: SparkSession, index_path: str) -> int:
    """Fold the L0 delta tier into the partitioned cells IN PLACE — the
    scheduled post-burst compaction that keeps the tier's scan tax
    bounded (round-13 verdict #2). Called automatically by
    ``append_to_ivf_index`` when the tier passes ``_l0_fold_budget``;
    callable directly to schedule the fold off the ingest path.

    Crash discipline (the LSM fold protocol, OWNED since round 14):

    1. the folder CLAIMS the tier by exclusive-creating an
       ``_FOLD_OWNER`` marker (pid + /proc start-tick) inside the live
       tier dir — losing the create means another fold owns this tier
       (return 0), which closes the isdir→rename TOCTOU where two
       concurrent appends both entered the fold (round-13 ADVICE 1);
    2. the tier RENAMES to ``vectors_delta.folding`` (atomic; the
       owner marker rides along) — readers stop seeing it as live
       tier, new appends open a fresh tier;
    3. one keyed partitioned write appends the staged rows to their
       cells (≥ budget/cells ≈ _L0_ROWS_PER_CELL rows per created
       file — at least as full as the old partitioned-append rule);
    4. a ``_COMMITTED`` marker lands in the staging dir, then the dir
       is removed.

    A crash at any point is healed by ``recover_l0_fold`` (invoked by
    every append and every ``ivf_vectors_frame`` build) — but ONLY
    once the recorded owner is dead: a live in-flight fold is left
    alone (recovery on it would rename the staging dir out from under
    the running write job, duplicating or losing vectors). Single-box
    liveness oracle is pid + start-tick; a multi-node deployment would
    swap in a heartbeat-file mtime lease, same protocol. Heal rules:
    marker present → the write committed, drop the staging dir; no
    marker → AUDIT which staged ids already reached the cells and
    either restore the tier (none), drop staging (all), or surgically
    remove the partial copies then restore (the narrow mid-job-commit
    window) — readers never double-count and never lose rows.
    Returns rows folded (0 when another fold owns the tier)."""
    import os
    import shutil

    recover_l0_fold(spark, index_path)
    delta_dir = f"{index_path}/vectors_delta"
    staging = f"{index_path}/vectors_delta.folding"
    if os.path.isdir(staging):
        return 0  # a LIVE fold is in flight (recovery left it alone)
    if not (
        os.path.isdir(delta_dir)
        and any(f.endswith(".parquet") for f in os.listdir(delta_dir))
    ):
        return 0
    owner_path = os.path.join(delta_dir, "_FOLD_OWNER")
    try:
        with open(owner_path, "x") as f:
            f.write(_fold_owner_blob())
    except FileExistsError:
        return 0  # another folder claimed this tier first
    try:
        os.rename(delta_dir, staging)
    except OSError:
        # tier vanished or staging appeared between claim and rename
        # (cannot happen under the claim discipline; belt-and-braces) —
        # release the claim so future folds are not blocked
        try:
            os.unlink(owner_path)
        except OSError:
            pass
        return 0
    try:
        rows = spark.read.parquet(staging)
        n = rows.count()
        base_t = dict(spark.read.parquet(f"{index_path}/vectors").dtypes)[
            "centroid_id"
        ]
        (
            rows.withColumn("centroid_id", F.col("centroid_id").cast(base_t))
            .repartition("centroid_id")
            .write.mode("append")
            .partitionBy("centroid_id")
            .parquet(f"{index_path}/vectors")
        )
        with open(os.path.join(staging, "_COMMITTED"), "w") as f:
            f.write("folded")
    except BaseException:
        # round-14 ADVICE (high): a failure here — job error, OOM,
        # cancellation — in a still-RUNNING process used to strand the
        # staging dir behind a live-pid _FOLD_OWNER: recover_l0_fold
        # reported "in-flight" forever and the tier's rows vanished from
        # the ivf_vectors_frame serving union for the process lifetime.
        # Release our claim and heal in-line: the recovery audit restores
        # the tier to vectors_delta, first surgically removing any rows
        # the failed write already committed to cells, so readers never
        # lose and never double-count. Then re-raise the original error.
        try:
            os.unlink(os.path.join(staging, "_FOLD_OWNER"))
        except OSError:
            pass
        try:
            recover_l0_fold(spark, index_path)
        except Exception:
            # best-effort: with the claim released, the NEXT append or
            # frame build heals this staging dir even if the in-line
            # attempt also failed (e.g. the executor pool is gone)
            pass
        raise
    shutil.rmtree(staging)
    return n


def recover_l0_fold(spark: SparkSession, index_path: str) -> str | None:
    """Heal a crashed ``fold_l0_tier`` (see its crash discipline) —
    but ONLY a crashed one: the staging dir carries its folder's
    ``_FOLD_OWNER`` (pid + start-tick), and while that owner is alive
    the fold is in flight, not crashed — destructive recovery here
    would yank the staging dir out from under the owner's running
    write job (round-13 ADVICE item 1). Returns None (nothing to do),
    "in-flight" (live fold, left alone), "committed" (staging
    dropped), or "restored" (tier restored, minus any
    partially-committed rows first removed from the cells — the
    self-healing audit). Also clears an ORPHANED claim (a dead
    owner's ``_FOLD_OWNER`` still in the live tier dir — the crash
    window between claim and rename) so future folds are not blocked
    forever."""
    import glob as _glob
    import os
    import shutil

    # orphaned claim in the LIVE tier: crash between claim and rename
    live_claim = f"{index_path}/vectors_delta/_FOLD_OWNER"
    if os.path.exists(live_claim):
        try:
            with open(live_claim) as f:
                blob = f.read()
        except OSError:
            blob = ""
        if not _owner_alive(blob):
            try:
                os.unlink(live_claim)
            except OSError:
                pass
    staging = f"{index_path}/vectors_delta.folding"
    if not os.path.isdir(staging):
        return None
    owner_file = os.path.join(staging, "_FOLD_OWNER")
    if os.path.exists(owner_file):
        try:
            with open(owner_file) as f:
                blob = f.read()
        except OSError:
            blob = ""
        if _owner_alive(blob) and not os.path.exists(
            os.path.join(staging, "_COMMITTED")
        ):
            # the fold's write job is (or may be) still running — only
            # its owner may complete or abandon this staging dir. A
            # _COMMITTED marker overrides: the write landed, dropping
            # staging merely finishes the owner's own next step.
            return "in-flight"
    if os.path.exists(os.path.join(staging, "_COMMITTED")):
        # may race the owner's own rmtree — both removals are correct
        shutil.rmtree(staging, ignore_errors=True)
        return "committed"
    staged = spark.read.parquet(staging)
    staged_ids = [int(r.vec_id) for r in staged.select("vec_id").collect()]
    vectors = spark.read.parquet(f"{index_path}/vectors")
    present = [
        int(r.vec_id)
        for r in vectors.join(
            staged.select("vec_id"), "vec_id", "left_semi"
        ).select("vec_id").collect()
    ]
    if len(present) == len(staged_ids):
        # the write committed fully; only the marker was lost
        shutil.rmtree(staging)
        return "committed"
    if present:
        # mid-job-commit crash: some staged rows reached their cells —
        # remove exactly those copies, then restore the whole tier
        remove_vectors_from_index(spark, index_path, present)
    # drop the dead owner's claim so the restored tier is foldable
    try:
        os.unlink(os.path.join(staging, "_FOLD_OWNER"))
    except OSError:
        pass
    delta_dir = f"{index_path}/vectors_delta"
    if not os.path.isdir(delta_dir):
        os.rename(staging, delta_dir)
    else:
        # an append already opened a fresh tier: move the staged files
        # in under recovery-unique names
        for fp in _glob.glob(os.path.join(staging, "*.parquet")):
            os.rename(
                fp,
                os.path.join(delta_dir, f"recovered-{os.path.basename(fp)}"),
            )
        shutil.rmtree(staging)
    return "restored"


def remove_vectors_from_index(
    spark: SparkSession, index_path: str, vec_ids: list, return_rows: bool = False
) -> int:
    """Physically drop ``vec_ids`` by rewriting ONLY the cells that
    hold them — never the whole layout. One narrow (vec_id,
    partition-col) scan locates the touched cells; their surviving rows
    stage to a temp dir (Spark cannot overwrite a path it is reading),
    then replace exactly those partitions; a cell emptied entirely is
    removed. The eager complement to the tombstone/anti-join lifecycle
    (`index_delete_compaction`): same end state, paid immediately on a
    bounded cell set instead of amortized at compaction. Returns the
    number of cells rewritten, or with ``return_rows=True`` the tuple
    (cells rewritten, rows removed) — the row count comes from two
    partition-PRUNED scans of just the touched cells (centroid_id is
    the partition dir), so the accounting stays bounded like the
    rewrite itself (the O(delta)-append invariant check rides on it)."""
    import os
    import shutil

    doomed = F.col("vec_id").isin([int(v) for v in vec_ids])
    # L0 tier first: a victim may live in vectors_delta (a small-delta
    # append that has not been compacted yet) — rewrite the whole tier
    # without the doomed rows (it is small by the L0 admission rule)
    n_l0_removed = 0
    delta_dir = f"{index_path}/vectors_delta"
    if os.path.isdir(delta_dir) and any(
        f.endswith(".parquet") for f in os.listdir(delta_dir)
    ):
        l0 = spark.read.parquet(delta_dir)
        n_l0_doomed = l0.filter(doomed).count()
        if n_l0_doomed:
            tmp_l0 = f"{index_path}/vectors_delta_rewrite_tmp"
            l0.filter(~doomed).coalesce(4).write.mode("overwrite").parquet(
                tmp_l0
            )
            shutil.rmtree(delta_dir)
            os.rename(tmp_l0, delta_dir)
            n_l0_removed = n_l0_doomed

    vectors = spark.read.parquet(f"{index_path}/vectors")
    cells = [
        int(r.centroid_id)
        for r in vectors.filter(doomed)
        .select("centroid_id")
        .distinct()
        .collect()
    ]
    if not cells:
        return (0, n_l0_removed) if return_rows else 0
    n_touched_before = (
        vectors.filter(F.col("centroid_id").isin(cells)).count()
        if return_rows
        else 0
    )
    tmp = f"{index_path}/vectors_rewrite_tmp"
    (
        vectors.filter(F.col("centroid_id").isin(cells) & ~doomed)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    staged = spark.read.parquet(tmp)
    n_staged = staged.count() if return_rows else 0
    kept_cells = {
        int(r.centroid_id)
        for r in staged.select("centroid_id").distinct().collect()
    }
    for cid in cells:
        shutil.rmtree(f"{index_path}/vectors/centroid_id={cid}")
    if kept_cells:
        (
            staged.repartition(len(kept_cells), "centroid_id")
            .write.mode("append")
            .partitionBy("centroid_id")
            .parquet(f"{index_path}/vectors")
        )
    shutil.rmtree(tmp)
    if return_rows:
        return len(cells), (n_touched_before - n_staged) + n_l0_removed
    return len(cells)


def split_hot_cells(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    factor: float = 2.0,
    target_rows: int | None = None,
    max_splits: int = 64,
) -> dict:
    """Maintenance re-split for a persisted IVF layout whose cells grew
    past the serving sweet spot under frozen-centroid appends — the
    missing third of the index lifecycle (build → append/compact →
    SPLIT). Appends assign into frozen cells, so a hot region's cell
    grows without bound and every probe routed there scans the whole
    blob; this op restores the build-time balance guarantee with cost
    ∝ the hot cells only:

    - per-cell sizes (k rows collected) pick cells with
      n > factor × target (target defaults to the current mean);
    - each hot cell re-trains a deterministic mini-Lloyd over ITS OWN
      rows (`kmeans_det.lloyd_centroids`, uncapped fit — a cell is
      already bounded) into round(n/target) sub-centroids, allocated
      past the max live centroid id;
    - the new layout publishes to ``out_path`` build-then-rename like
      `compact_ivf_index`: unchanged cells HARD-LINK (metadata-only, no
      data movement), only hot cells rewrite. A crash leaves the old
      index serving and a dead build dir.

    Contents are preserved exactly (pytest pins exceptAll 0/0 on
    (vec_id, embedding) and one-cell-per-vector); determinism is
    md5-seeded per cell, so two runs produce identical layouts."""
    import os
    import shutil

    from cloudvectordb_spark.operators.kmeans_det import (
        assign_cells,
        lloyd_centroids,
    )

    # sizes and hot-cell contents come from the UNION view (base
    # partitioned layout + L0 delta tier) so uncompacted small appends
    # count toward hotness and re-split with their cell
    vectors = ivf_vectors_frame(spark, index_path)
    cents = index_centroids(spark, index_path)
    sizes = {
        int(r.centroid_id): int(r.n)
        for r in vectors.groupBy("centroid_id")
        .agg(F.count("*").alias("n"))
        .collect()  # bounded: one row per cell
    }
    mean = sum(sizes.values()) / max(1, len(sizes))
    target = float(target_rows) if target_rows else mean
    hot = sorted(c for c, n in sizes.items() if n > factor * target)[:max_splits]
    hot_set = set(hot)

    build_dir = f"{out_path}.build{os.getpid()}"
    os.makedirs(f"{build_dir}/vectors", exist_ok=True)
    # unchanged cells: hard-link every file (same-device metadata op;
    # copy on the rare cross-device fallback). Link only dirs that
    # EXIST in the base layout — a cell may live purely in L0.
    for c in sizes:
        if c in hot_set:
            continue
        src = f"{index_path}/vectors/centroid_id={c}"
        if not os.path.isdir(src):
            continue  # L0-only cell: carried by the L0 pass below
        dst = f"{build_dir}/vectors/centroid_id={c}"
        os.makedirs(dst, exist_ok=True)
        for fn in os.listdir(src):
            sp, dp = os.path.join(src, fn), os.path.join(dst, fn)
            if not os.path.isfile(sp):
                continue
            try:
                os.link(sp, dp)
            except OSError:
                shutil.copy2(sp, dp)
    # L0 rows of UNCHANGED cells carry over as the new root's L0 tier
    # (hot cells' L0 rows re-split with their cell via the union frame)
    delta_dir = f"{index_path}/vectors_delta"
    if os.path.isdir(delta_dir) and any(
        f.endswith(".parquet") for f in os.listdir(delta_dir)
    ):
        carry = spark.read.parquet(delta_dir)
        if hot:
            carry = carry.filter(~F.col("centroid_id").isin(hot))
        if carry.limit(1).count():
            carry.coalesce(4).write.mode("overwrite").parquet(
                f"{build_dir}/vectors_delta"
            )

    next_id = max((cid for cid, _ in cents), default=-1) + 1
    new_cents = [(int(cid), list(v)) for cid, v in cents if cid not in hot_set]
    split_map: dict[int, list[int]] = {}
    for c in hot:
        cell = vectors.filter(F.col("centroid_id") == c).drop("centroid_id")
        s = int(min(max(2, round(sizes[c] / target)), 16))
        # uncapped fit: the cell IS the bounded sample; md5-derived seed
        # keeps two runs bit-identical without a global RNG
        sub = lloyd_centroids(
            cell, k=s, seed=1_000_003 + c, fit_cap=1 << 62
        )
        remap = {int(old): next_id + i for i, (old, _) in enumerate(sub)}
        mapping = F.create_map(
            *[F.lit(x) for kv in remap.items() for x in kv]
        )
        assigned = assign_cells(cell, sub).withColumn(
            "centroid_id", mapping[F.col("centroid_id")]
        )
        assigned.repartition("centroid_id").write.mode("append").partitionBy(
            "centroid_id"
        ).parquet(f"{build_dir}/vectors")
        new_cents += [
            (remap[int(old)], [float(x) for x in v]) for old, v in sub
        ]
        split_map[c] = sorted(remap.values())
        next_id += len(sub)

    spark.createDataFrame(
        sorted(new_cents),
        schema="centroid_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{build_dir}/centroids")
    # the dedup-state sidecar (CorpusPipeline sigs/labels/meta) is
    # doc-level, layout-independent state: carry it so append keeps
    # working on the re-split index
    _link_state_sidecar(index_path, build_dir)
    with open(os.path.join(build_dir, "_BUILT"), "w") as f:
        f.write("ok")
    try:
        os.rename(build_dir, out_path)
    except OSError:
        shutil.rmtree(build_dir, ignore_errors=True)
        raise
    return {
        "cells_before": len(sizes),
        "cells_after": len(new_cents),
        "hot_cells_split": len(hot),
        "split_map": split_map,
        "mean_before": round(mean, 1),
        "target": round(target, 1),
    }


def _link_state_sidecar(index_path: str, build_dir: str) -> None:
    """Hard-link the CorpusPipeline dedup_state sidecar (sigs, labels,
    meta.json) into a new layout's build dir — the state is doc-level
    and layout-independent, so split/compact must carry it or
    CorpusPipeline.append stops working on the published index. No-op
    when the index has no facade state."""
    import os
    import shutil

    src = os.path.join(index_path, "dedup_state")
    if not os.path.isdir(src):
        return
    for dirpath, _, files in os.walk(src):
        rel = os.path.relpath(dirpath, index_path)
        dst_dir = os.path.join(build_dir, rel)
        os.makedirs(dst_dir, exist_ok=True)
        for fn in files:
            sp = os.path.join(dirpath, fn)
            dp = os.path.join(dst_dir, fn)
            try:
                os.link(sp, dp)
            except OSError:
                shutil.copy2(sp, dp)


def snapshot_ivf_index(index_path: str, out_path: str) -> int:
    """Pin the CURRENT index layout as an immutable reader snapshot —
    a full-tree hard-link (zero data copy, O(files) metadata ops on the
    same device; copy on the rare cross-device fallback), published
    atomically build-then-rename like split/compact.

    Why readers need this: ``CorpusPipeline.append`` mutates the layout
    in place, and a cluster-merge DEMOTION rewrites whole cells
    (``remove_vectors_from_index`` deletes the old cell files) — a
    reader holding DataFrames over the live path would hit missing
    files mid-scan. A snapshot's links keep the pinned files alive
    regardless of what the live index deletes (the same discipline the
    postings store gets from manifest-pinned versions in
    ``versioning.py``, applied to the partitioned IVF layout). Vacuum
    is ``shutil.rmtree(snapshot)`` — data blocks free once the last
    link drops.

    Excludes the ``leases`` fencing dir (a snapshot is a read-only pin,
    never a writer) and any in-flight ``*.build*`` / ``*_tmp`` staging
    dirs. Returns the number of files linked.

    CONSISTENCY vs a LIVE writer: files that vanish between the walk
    and the link (an append/demotion rewriting a cell) are skipped, so
    a concurrent snapshot never crashes — but it may capture a cell
    mid-rewrite (some files old, some new). For an exact point-in-time
    pin, take the snapshot under the writer lease or between appends;
    ``CorpusPipeline.append(safe=True)``'s pre-append snapshot does
    exactly that (it runs before the first mutation of its own epoch).
    """
    import os
    import shutil

    build_dir = f"{out_path}.build{os.getpid()}"
    n_linked = 0
    for dirpath, dirnames, files in os.walk(index_path):
        rel = os.path.relpath(dirpath, index_path)
        parts = rel.split(os.sep)
        dirnames[:] = [
            d
            for d in dirnames
            if d != "leases" and ".build" not in d and not d.endswith("_tmp")
        ]
        if parts and (parts[0] == "leases" or parts[0].endswith("_tmp")):
            continue
        dst_dir = (
            build_dir if rel == "." else os.path.join(build_dir, rel)
        )
        os.makedirs(dst_dir, exist_ok=True)
        for fn in files:
            sp = os.path.join(dirpath, fn)
            dp = os.path.join(dst_dir, fn)
            try:
                os.link(sp, dp)
            except FileNotFoundError:
                # file deleted between walk and link (a concurrent
                # append/demotion rewrote its cell) — skip it; the
                # rewritten replacement is picked up by the walk, or
                # the caller runs under the writer lease for an exact
                # point-in-time pin (see note below).
                continue
            except OSError:
                try:
                    shutil.copy2(sp, dp)
                except FileNotFoundError:
                    continue
            n_linked += 1
    try:
        os.rename(build_dir, out_path)
    except OSError:
        shutil.rmtree(build_dir, ignore_errors=True)
        raise
    return n_linked


def compact_ivf_index(spark: SparkSession, index_path: str, out_path: str) -> None:
    """Rewrite the vectors layout so each centroid cell is one file.

    Every ``append_to_ivf_index`` delta adds task-count files per touched
    cell; after enough increments the scan pays per-file open/footer cost
    (the classic small-files death at 100 TB). Compaction is one
    partition-local rewrite: ``repartition(centroid_id)`` hashes each
    cell's rows to a single task, so the write emits exactly one file per
    cell with no change to the probe-side pruning contract. Published
    atomically (build-then-rename) like the initial build.
    """
    import os
    import shutil

    # the helper includes the L0 delta tier, so compaction FOLDS it:
    # the new root is pure partitioned layout, no vectors_delta
    vectors = ivf_vectors_frame(spark, index_path)
    centroids = spark.read.parquet(f"{index_path}/centroids")
    build_dir = f"{out_path}.build{os.getpid()}"
    n_cells = centroids.count()
    (
        vectors.repartition(n_cells, "centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{build_dir}/vectors")
    )
    centroids.coalesce(1).write.mode("overwrite").parquet(f"{build_dir}/centroids")
    _link_state_sidecar(index_path, build_dir)  # keep append working
    with open(os.path.join(build_dir, "_BUILT"), "w") as f:
        f.write("ok")
    try:
        os.rename(build_dir, out_path)
    except OSError:
        shutil.rmtree(build_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# Layout retention (round 12, verdict #2): snapshot/compact/split each
# PUBLISH a new layout root and reclaim nothing — a long-lived index
# family accumulates one full tree per lifecycle event forever (cheap
# in bytes while hard-links share data blocks, but unbounded in inodes
# and in stale-layout confusion). vacuum_ivf_layouts is the single
# destructive reclamation: enumerate the family's roots, keep the live
# tree + pins + the newest `keep` others, delete the rest —
# hard-link-aware, so "bytes reclaimed" counts a data block only when
# its LAST link drops (a file still linked from a surviving root frees
# nothing), the same discipline versioning.vacuum applies to the
# postings manifest store.
# ---------------------------------------------------------------------------
def pin_layout(path: str) -> None:
    """Mark a layout root as retention-exempt (a `_PINNED` marker —
    the on-disk twin of passing it in vacuum's ``pins``). Use for
    snapshots a reader fleet is still serving from."""
    import os

    with open(os.path.join(path, "_PINNED"), "w") as f:
        f.write("pinned")


def unpin_layout(path: str) -> None:
    import os

    marker = os.path.join(path, "_PINNED")
    if os.path.exists(marker):
        os.remove(marker)


def vacuum_ivf_layouts(
    family_dir: str,
    live_path: str,
    keep: int = 2,
    pins: tuple = (),
    retire: tuple = (),
) -> dict:
    """Reclaim superseded layout roots under ``family_dir``.

    A ROOT is any direct child directory holding an IVF layout (a
    ``vectors`` subdir or a ``_BUILT`` marker). Classification, in
    precedence order:

    - the LIVE root (``live_path``) is never touched;
    - PINNED roots (listed in ``pins`` or carrying a ``_PINNED``
      marker, see ``pin_layout``) survive every vacuum;
    - LEASED roots (a ``leases`` dir inside — some writer generation
      fenced on them) are REFUSED: skipped and reported, never
      deleted, because the files alone cannot prove no writer is
      live. Epoch markers are never garbage-collected by completion,
      so an EX-LIVE root that was superseded by a split/compact stays
      refused forever by default — the operator retires it EXPLICITLY
      via ``retire=(path, ...)``, which lets a listed root be
      reclaimed despite its leases (the deliberate, auditable act of
      declaring that writer generation dead);
    - in-flight staging dirs (``*.build*``, ``*_tmp``,
      ``*.pre_append*``) are skipped — they belong to their writer's
      crash-recovery story, not retention;
    - of the remaining UNPINNED roots, the ``keep`` most recently
      modified survive; older ones are deleted.

    Returns ``{"kept", "deleted", "refused_leased", "bytes_reclaimed",
    "bytes_shared", "files_deleted"}``. ``bytes_reclaimed`` is
    hard-link-aware: a file whose inode is still referenced elsewhere
    (st_nlink > 1 at unlink time) frees no data blocks and counts
    under ``bytes_shared`` instead — so two deleted roots sharing an
    inode count its bytes exactly once, on the deletion that drops the
    last link."""
    import os
    import shutil

    live_real = os.path.realpath(live_path)
    pin_reals = {os.path.realpath(p) for p in pins}
    roots = []
    for name in sorted(os.listdir(family_dir)):
        p = os.path.join(family_dir, name)
        if not os.path.isdir(p):
            continue
        if ".build" in name or name.endswith("_tmp") or ".pre_append" in name:
            continue
        if not (
            os.path.isdir(os.path.join(p, "vectors"))
            or os.path.exists(os.path.join(p, "_BUILT"))
        ):
            continue
        roots.append(p)

    kept, deleted, refused = [], [], []
    candidates = []
    for p in roots:
        rp = os.path.realpath(p)
        if rp == live_real or rp in pin_reals or os.path.exists(
            os.path.join(p, "_PINNED")
        ):
            kept.append(p)
        elif os.path.isdir(os.path.join(p, "leases")) and os.path.realpath(
            p
        ) not in {os.path.realpath(r) for r in retire}:
            refused.append(p)
        else:
            candidates.append(p)
    def published_at(p):
        # order by the LAYOUT's publish time, not the root dir's mtime:
        # pin/unpin marker writes touch the root dir and would let an
        # ancient just-unpinned snapshot displace a genuinely newer
        # layout from the keep set. The vectors subdir is created at
        # publish and never touched by markers.
        v = os.path.join(p, "vectors")
        return os.path.getmtime(v if os.path.isdir(v) else p)

    candidates.sort(key=published_at, reverse=True)
    kept.extend(candidates[:keep])
    to_delete = candidates[keep:]

    stats = reclaim_roots(to_delete)
    deleted.extend(stats.pop("deleted"))
    return {
        "kept": kept,
        "deleted": deleted,
        "refused_leased": refused,
        **stats,
    }


def reclaim_roots(to_delete: list) -> dict:
    """Delete artifact roots with hard-link-aware byte accounting — the
    shared reclaim loop of ``vacuum_ivf_layouts`` and the text-side
    ``search.vacuum_text_indexes``. A file whose inode is still
    referenced elsewhere (st_nlink > 1 at unlink time) frees no data
    blocks and counts under ``bytes_shared``; a root that SURVIVES its
    rmtree (permissions, concurrent recreate) lands in
    ``delete_failed`` with nothing counted (round-12 ADVICE item 4 —
    any files that did unlink undercount, never over)."""
    import os
    import shutil

    bytes_reclaimed = 0
    bytes_shared = 0
    files_deleted = 0
    deleted = []
    delete_failed = []
    for p in to_delete:
        r_reclaimed = r_shared = r_files = 0
        for dirpath, _dirs, files in os.walk(p):
            for fn in files:
                fp = os.path.join(dirpath, fn)
                try:
                    st = os.stat(fp)
                except FileNotFoundError:
                    continue
                if st.st_nlink > 1:
                    r_shared += st.st_size  # blocks survive elsewhere
                else:
                    r_reclaimed += st.st_size  # last link drops
                r_files += 1
        shutil.rmtree(p, ignore_errors=True)
        if os.path.exists(p):
            delete_failed.append(p)
            continue
        bytes_reclaimed += r_reclaimed
        bytes_shared += r_shared
        files_deleted += r_files
        deleted.append(p)
    return {
        "deleted": deleted,
        "delete_failed": delete_failed,
        "bytes_reclaimed": bytes_reclaimed,
        "bytes_shared": bytes_shared,
        "files_deleted": files_deleted,
    }


# ---------------------------------------------------------------------------
# S2 -> S3 artifact loop: embed with the TRAINED encoder artifact, loaded
# once per Python worker process and cached in a module-level dict (the
# production pattern for model-per-worker inference). Local mode shares
# the filesystem; on a cluster the artifact dir ships via
# SparkContext.addFile / a shared store — the worker code is identical.
# ---------------------------------------------------------------------------
_WORKER_ENCODER_CACHE: dict = {}


def embed_with_artifact(docs: DataFrame, artifact_dir: str) -> DataFrame:
    def run(batches):
        from cloudvectordb_spark.training import encode_texts_stub, load_encoder_stub

        proj = _WORKER_ENCODER_CACHE.get(artifact_dir)
        if proj is None:
            proj = load_encoder_stub(artifact_dir)
            _WORKER_ENCODER_CACHE[artifact_dir] = proj
        for pdf in batches:
            vecs = encode_texts_stub(list(pdf["text"]), proj)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": list(vecs)})

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="doc_id long, embedding array<float>"
    )


def ensure_trained_artifact(spark: SparkSession, sf_dir: str) -> str:
    """S1->S2 for real: mine text triplets, export shards, run the
    EXECUTED distributed trainer (training.train_encoder_spark — local
    SGD + per-round model averaging on Spark tasks), cache the artifact
    keyed on sf_dir + fixture mtime."""
    import os
    import tempfile

    from cloudvectordb_spark.training import train_encoder_spark

    import hashlib

    from cloudvectordb_spark.cache import source_tag

    src_fp = hashlib.md5(
        source_tag(os.path.join(sf_dir, "documents.parquet")).encode()
    ).hexdigest()[:12]
    art = os.path.join(
        tempfile.gettempdir(),
        "cloudvectordb_artifact",
        f"{sf_dir.strip('/').replace('/', '_')}_{src_fp}_sgd",
    )
    if not os.path.exists(os.path.join(art, "encoder.npz")):
        build = f"{art}.build{os.getpid()}"
        shards = os.path.join(build, "_shards")
        export_triplet_shards(build_text_triplets(spark, sf_dir), shards)
        train_encoder_spark(spark, shards, build)
        try:
            os.rename(build, art)
        except OSError:
            import shutil

            shutil.rmtree(build, ignore_errors=True)
    return art


@query(
    "embed_documents_trained_artifact",
    # The trained weights have no SQL twin (12 rounds of local SGD +
    # model averaging), but the EMBEDDING CONTRACT does — so since
    # round 7 the registered output is an invariant row per doc that
    # DuckDB recomputes independently: exact doc coverage (every
    # doc_id < 200 exactly once — a dropped/duplicated batch fails the
    # row-set compare), the artifact's output dimensionality, and the
    # encoder's L2-normalization (unit norm within float32, rounded 4).
    # The trained VALUES (components, convergence, bit-determinism)
    # stay pytest-gated: golden-artifact sha + convergence tests in
    # tests/test_training.py. This removes the last rows-only entry
    # from the registry (r6 verdict "what's missing" #3).
    oracle="""
    SELECT doc_id, CAST(64 AS BIGINT) AS dim, 1.0 AS unit_norm
    FROM documents WHERE doc_id < 200
    """,
    operators=("K5", "K4", "L5"),
)
def embed_documents_trained_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full S1->S3 hand-off in one query: mine triplets, TRAIN the
    encoder on Spark (executed distributed path, not the stub), then
    batch-embed through the trained artifact. Output = per-doc embedding
    contract invariants (see oracle note above)."""
    art = ensure_trained_artifact(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    out = embed_with_artifact(docs, art)
    sumsq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return out.select(
        "doc_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.sqrt(sumsq), 4).alias("unit_norm"),
    )


# ---------------------------------------------------------------------------
# K4 value-level cover (round-5 verdict next-round #2): a TRAINED linear
# head whose training loop is fully SQL-replayable. Full-batch gradient
# descent on a linear probe — features = intercept + the first 8
# embedding dims, target y = (label == 0) — for a fixed 3 rounds from
# w = 0. Each round's mean gradient rounds half-up to 6 dp before the
# update and the weights re-round to 6 dp, so cross-engine summation-
# order ulps (~1e-13) can never reach a comparison: the whole descent
# unrolls into DuckDB CTEs that carry the 1-row weight vector forward
# (same discipline as kmeans_det / pq — see the oracle-determinism
# recipe there). Spark executes the same rounds distributed: one
# map-side-combined aggregate per round (9 partial sums + count), the
# driver holds only the 9-float weight vector between rounds. The
# per-row prediction sums features in a FIXED left-associated order on
# both engines, so residuals are bit-identical before any aggregation.
# ---------------------------------------------------------------------------
_GD_DIMS = 8  # embedding dims used (plus intercept x0 = 1)
_GD_ROUNDS = 3


def _gd_oracle_sql() -> str:
    xs = [f"x{j}" for j in range(_GD_DIMS + 1)]
    feat_cols = ",\n             ".join(
        ["1.0 AS x0"]
        + [f"CAST(embedding[{j}] AS DOUBLE) AS x{j}" for j in range(1, _GD_DIMS + 1)]
    )
    zero = ", ".join(f"0.0 AS w{j}" for j in range(_GD_DIMS + 1))
    pred = " + ".join(f"w.w{j}*f.{x}" for j, x in enumerate(xs))
    ctes = [
        f"""feat AS (
      SELECT CAST(label = 0 AS DOUBLE) AS y,
             {feat_cols}
      FROM embeddings
    )""",
        f"w0_ AS (SELECT {zero})",
    ]
    prev = "w0_"
    for r in range(1, _GD_ROUNDS + 1):
        upd = ",\n             ".join(
            f"round(any_value(w.w{j}) - round(avg(f.{x} * (({pred}) - f.y)), 6), 6)"
            f" AS w{j}"
            for j, x in enumerate(xs)
        )
        ctes.append(
            f"""w{r}_ AS (
      SELECT {upd}
      FROM feat f CROSS JOIN {prev} w
    )"""
        )
        prev = f"w{r}_"
    wsel = ", ".join(f"w.w{j}" for j in range(_GD_DIMS + 1))
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block},
    mse AS (
      SELECT round(avg((({pred}) - f.y) * (({pred}) - f.y)), 6) AS train_mse
      FROM feat f CROSS JOIN {prev} w
    )
    SELECT {wsel}, m.train_mse FROM {prev} w CROSS JOIN mse m
    """


def _half_up6(x: float) -> float:
    """Scalar round-half-away-from-zero at 6 dp — Spark F.round / DuckDB
    round() convention; Python round() is half-even and would diverge."""
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x) if x else 0.0


@query(
    "linear_probe_train_gd",
    oracle=_gd_oracle_sql(),
    operators=("K4", "D2", "H6", "H8"),
)
def linear_probe_train_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic trained head with a FULL value oracle: 3 rounds of
    full-batch GD on a linear probe over the embedding table (see the
    block comment above). Returns the trained weight vector and the
    final training MSE as one row."""
    emb = load(spark, sf_dir, "embeddings")
    nf = _GD_DIMS + 1
    feat = emb.select(
        (F.col("label") == 0).cast("double").alias("y"),
        F.lit(1.0).alias("x0"),
        *[
            F.element_at("embedding", j).cast("double").alias(f"x{j}")
            for j in range(1, _GD_DIMS + 1)
        ],
    )
    w = [0.0] * nf

    def _pred():
        p = F.lit(w[0]) * F.col("x0")
        for j in range(1, nf):
            p = p + F.lit(w[j]) * F.col(f"x{j}")
        return p

    for _ in range(_GD_ROUNDS):
        resid = _pred() - F.col("y")
        g = feat.agg(
            *[F.avg(F.col(f"x{j}") * resid).alias(f"g{j}") for j in range(nf)]
        ).collect()[0]
        w = [_half_up6(w[j] - _half_up6(g[f"g{j}"])) for j in range(nf)]

    resid = _pred() - F.col("y")
    out = feat.agg(F.round(F.avg(resid * resid), 6).alias("train_mse"))
    for j in range(nf):
        out = out.withColumn(f"w{j}", F.lit(w[j]))
    return out.select(*[f"w{j}" for j in range(nf)], "train_mse")


# ---------------------------------------------------------------------------
# K4 second value-level cover (round-6 verdict #8): a CLOSED-FORM trained
# head — ridge regression by normal equations, no iteration at all. One
# map-side-combined aggregate computes the 3x3 Gram matrix + RHS (avg of
# feature products; intercept + first 2 embedding dims), every entry
# rounds half-up to 6 dp BEFORE the solve (the GD probe's discipline, so
# cross-engine summation-order ulps never reach a comparison), lambda=0.1
# adds to the diagonal, and the solve is Cramer's rule written as the
# SAME left-associated expression text in Python (driver, 9 floats) and
# DuckDB SQL — identical IEEE-754 DAG on identical inputs, so the
# unrounded weights are bit-equal before their final 6 dp round. Scale
# shape: the corpus is touched twice (Gram pass, MSE pass), both
# all-reduce aggregates; driver state is 9 floats.
# ---------------------------------------------------------------------------
_RIDGE_LAMBDA = 0.1

# Cramer's 3x3 cofactor expansions. ONE source of truth for the exact
# expression text, formatted for either engine: Python eval on driver
# floats and DuckDB SQL both parse */ then left-associated +- the same
# way, so the resulting float DAGs are identical.
_RIDGE_DET = "a00*(a11*a22-a12*a12) - a01*(a01*a22-a12*a02) + a02*(a01*a12-a11*a02)"
_RIDGE_NUM = {
    "w0": "b0*(a11*a22-a12*a12) - a01*(b1*a22-a12*b2) + a02*(b1*a12-a11*b2)",
    "w1": "a00*(b1*a22-b2*a12) - b0*(a01*a22-a12*a02) + a02*(a01*b2-b1*a02)",
    "w2": "a00*(a11*b2-a12*b1) - a01*(a01*b2-b1*a02) + b0*(a01*a12-a11*a02)",
}


def _ridge_oracle_sql() -> str:
    lam = _RIDGE_LAMBDA
    solved = ",\n             ".join(
        f"round(({_RIDGE_NUM[w]}) / ({_RIDGE_DET}), 6) AS {w}"
        for w in ("w0", "w1", "w2")
    )
    pred = "w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2"
    return f"""
    WITH feat AS (
      SELECT CAST(label = 0 AS DOUBLE) AS y,
             1.0 AS x0,
             CAST(embedding[1] AS DOUBLE) AS x1,
             CAST(embedding[2] AS DOUBLE) AS x2
      FROM embeddings
    ),
    gram AS (
      SELECT round(avg(x0*x0), 6) + {lam} AS a00,
             round(avg(x0*x1), 6) AS a01,
             round(avg(x0*x2), 6) AS a02,
             round(avg(x1*x1), 6) + {lam} AS a11,
             round(avg(x1*x2), 6) AS a12,
             round(avg(x2*x2), 6) + {lam} AS a22,
             round(avg(x0*y), 6) AS b0,
             round(avg(x1*y), 6) AS b1,
             round(avg(x2*y), 6) AS b2
      FROM feat
    ),
    solved AS (
      SELECT {solved}
      FROM gram
    ),
    mse AS (
      SELECT round(avg((({pred}) - f.y) * (({pred}) - f.y)), 6) AS train_mse
      FROM feat f CROSS JOIN solved w
    )
    SELECT w.w0, w.w1, w.w2, m.train_mse FROM solved w CROSS JOIN mse m
    """


@query(
    "linear_probe_train_ridge",
    oracle=_ridge_oracle_sql(),
    operators=("K4", "D2", "H6"),
)
def linear_probe_train_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge-trained linear head with a FULL value oracle —
    the non-iterative K4 cover (see block comment): one Gram aggregate,
    a Cramer's-rule solve shared expression-for-expression with the
    DuckDB oracle, one MSE aggregate."""
    emb = load(spark, sf_dir, "embeddings")
    feat = emb.select(
        (F.col("label") == 0).cast("double").alias("y"),
        F.lit(1.0).alias("x0"),
        F.element_at("embedding", 1).cast("double").alias("x1"),
        F.element_at("embedding", 2).cast("double").alias("x2"),
    )
    x = ["x0", "x1", "x2"]
    gram_row = feat.agg(
        *[
            F.round(F.avg(F.col(x[j]) * F.col(x[k])), 6).alias(f"a{j}{k}")
            for j in range(3)
            for k in range(j, 3)
        ],
        *[
            F.round(F.avg(F.col(x[j]) * F.col("y")), 6).alias(f"b{j}")
            for j in range(3)
        ],
    ).collect()[0]  # bounded: 9 floats of driver state
    env = {k: float(v) for k, v in gram_row.asDict().items()}
    for j in range(3):
        env[f"a{j}{j}"] = env[f"a{j}{j}"] + _RIDGE_LAMBDA
    # eval the SAME expression text the oracle solves with — identical
    # IEEE DAG on identical rounded inputs, then the same 6 dp round
    det = eval(_RIDGE_DET, {"__builtins__": {}}, env)  # noqa: S307
    w = [
        _half_up6(eval(_RIDGE_NUM[f"w{j}"], {"__builtins__": {}}, env) / det)  # noqa: S307
        for j in range(3)
    ]
    pred = F.lit(w[0]) * F.col("x0") + F.lit(w[1]) * F.col("x1") + F.lit(
        w[2]
    ) * F.col("x2")
    resid = pred - F.col("y")
    out = feat.agg(F.round(F.avg(resid * resid), 6).alias("train_mse"))
    for j in range(3):
        out = out.withColumn(f"w{j}", F.lit(w[j]))
    return out.select("w0", "w1", "w2", "train_mse")


# ---------------------------------------------------------------------------
# K4 with train/test DISCIPLINE: the same closed-form ridge solve, but
# fit on the md5-hash train split only (the corpus_split_counts
# convention: first md5 hex char < 'c' ~= 75%) and evaluated on BOTH
# splits — the holdout-generalization query an embedding-quality
# dashboard runs after every training job. Fully value-oracled: the
# split is md5-replayable in DuckDB, the Gram/solve reuse the ridge
# recipe above, and both MSEs are conditional averages in one pass.
# ---------------------------------------------------------------------------
def _ridge_holdout_oracle_sql() -> str:
    lam = _RIDGE_LAMBDA
    solved = ",\n             ".join(
        f"round(({_RIDGE_NUM[w]}) / ({_RIDGE_DET}), 6) AS {w}"
        for w in ("w0", "w1", "w2")
    )
    pred = "w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2"
    return f"""
    WITH feat AS (
      SELECT CAST(label = 0 AS DOUBLE) AS y,
             1.0 AS x0,
             CAST(embedding[1] AS DOUBLE) AS x1,
             CAST(embedding[2] AS DOUBLE) AS x2,
             substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < 'c' AS is_train
      FROM embeddings
    ),
    gram AS (
      SELECT round(avg(x0*x0), 6) + {lam} AS a00,
             round(avg(x0*x1), 6) AS a01,
             round(avg(x0*x2), 6) AS a02,
             round(avg(x1*x1), 6) + {lam} AS a11,
             round(avg(x1*x2), 6) AS a12,
             round(avg(x2*x2), 6) + {lam} AS a22,
             round(avg(x0*y), 6) AS b0,
             round(avg(x1*y), 6) AS b1,
             round(avg(x2*y), 6) AS b2
      FROM feat WHERE is_train
    ),
    solved AS (
      SELECT {solved}
      FROM gram
    ),
    mse AS (
      SELECT round(avg(CASE WHEN f.is_train THEN sq END), 6) AS train_mse,
             round(avg(CASE WHEN NOT f.is_train THEN sq END), 6) AS test_mse,
             CAST(count(*) FILTER (WHERE f.is_train) AS BIGINT) AS n_train,
             CAST(count(*) FILTER (WHERE NOT f.is_train) AS BIGINT) AS n_test
      FROM (
        SELECT f.is_train,
               (({pred}) - f.y) * (({pred}) - f.y) AS sq
        FROM feat f CROSS JOIN solved w
      ) f
    )
    SELECT w.w0, w.w1, w.w2, m.train_mse, m.test_mse, m.n_train, m.n_test
    FROM solved w CROSS JOIN mse m
    """


@query(
    "linear_probe_holdout_eval",
    oracle=_ridge_holdout_oracle_sql(),
    operators=("K4", "K12", "D2", "H6", "B8"),
)
def linear_probe_holdout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge head fit on the md5 train split, MSE reported on train AND
    held-out rows (see block comment). Same scale shape as the ridge
    probe: two all-reduce aggregates, 9 floats of driver state."""
    emb = load(spark, sf_dir, "embeddings")
    is_train = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1) < "c"
    feat = emb.select(
        (F.col("label") == 0).cast("double").alias("y"),
        F.lit(1.0).alias("x0"),
        F.element_at("embedding", 1).cast("double").alias("x1"),
        F.element_at("embedding", 2).cast("double").alias("x2"),
        is_train.alias("is_train"),
    )
    x = ["x0", "x1", "x2"]
    tr = feat.filter("is_train")
    gram_row = tr.agg(
        *[
            F.round(F.avg(F.col(x[j]) * F.col(x[k])), 6).alias(f"a{j}{k}")
            for j in range(3)
            for k in range(j, 3)
        ],
        *[
            F.round(F.avg(F.col(x[j]) * F.col("y")), 6).alias(f"b{j}")
            for j in range(3)
        ],
    ).collect()[0]  # bounded: 9 floats of driver state
    env = {k: float(v) for k, v in gram_row.asDict().items()}
    for j in range(3):
        env[f"a{j}{j}"] = env[f"a{j}{j}"] + _RIDGE_LAMBDA
    det = eval(_RIDGE_DET, {"__builtins__": {}}, env)  # noqa: S307
    w = [
        _half_up6(eval(_RIDGE_NUM[f"w{j}"], {"__builtins__": {}}, env) / det)  # noqa: S307
        for j in range(3)
    ]
    pred = F.lit(w[0]) * F.col("x0") + F.lit(w[1]) * F.col("x1") + F.lit(
        w[2]
    ) * F.col("x2")
    sq = (pred - F.col("y")) * (pred - F.col("y"))
    out = feat.agg(
        F.round(F.avg(F.when(F.col("is_train"), sq)), 6).alias("train_mse"),
        F.round(F.avg(F.when(~F.col("is_train"), sq)), 6).alias("test_mse"),
        F.count(F.when(F.col("is_train"), 1)).cast("bigint").alias("n_train"),
        F.count(F.when(~F.col("is_train"), 1)).cast("bigint").alias("n_test"),
    )
    for j in range(3):
        out = out.withColumn(f"w{j}", F.lit(w[j]))
    return out.select(
        "w0", "w1", "w2", "train_mse", "test_mse", "n_train", "n_test"
    )


# ---------------------------------------------------------------------------
# K12: cluster-label purity — the K9 assignment x label crosstab named
# in SURVEY §2. Per-cell majority-label share, weighted into one corpus
# purity number. Deterministic trainer => the EXACT purity value (and
# per-cell count) is the oracle, upgraded from round 4's invariant check.
# ---------------------------------------------------------------------------
@query(
    "cluster_label_purity",
    oracle=f"""
    WITH {_KM_CTES},
    lab AS (
      SELECT a.cid, l.label FROM km_assign a
      JOIN embeddings l ON l.vec_id = a.vec_id
    ),
    cell_label AS (
      SELECT cid, label, count(*) AS n FROM lab GROUP BY cid, label
    ),
    per_cell AS (
      SELECT cid, max(n) AS majority_n, sum(n) AS cell_n
      FROM cell_label GROUP BY cid
    )
    SELECT CAST(sum(cell_n) AS BIGINT) AS total_vectors,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(sum(majority_n) / CAST(sum(cell_n) AS DOUBLE), 6) AS purity
    FROM per_cell
    """,
    operators=("K12", "K9", "D1", "B8"),
)
def cluster_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors, _ = read_ivf_index(spark, ensure_ivf_index(spark, sf_dir))
    cell_label = vectors.groupBy("centroid_id", "label").agg(
        F.count("*").alias("n")
    )
    per_cell = cell_label.groupBy("centroid_id").agg(
        F.max("n").alias("majority_n"), F.sum("n").alias("cell_n")
    )
    return per_cell.agg(
        F.sum("cell_n").cast("bigint").alias("total_vectors"),
        F.count("*").cast("bigint").alias("n_cells"),
        F.round(F.sum("majority_n") / F.sum("cell_n").cast("double"), 6).alias(
            "purity"
        ),
    )


# ---------------------------------------------------------------------------
# S3 incremental: re-embed ONLY the delta. At 100 TB you never re-embed the
# corpus; you diff content hashes against the manifest written at the last
# embedding run and send new+changed docs through the encoder. The
# manifest state here is derived deterministically from the fixture
# (doc_id % 103 simulates docs added since the snapshot, % 101 simulates
# edits) so the oracle can reconstruct it in pure SQL; the real-IO
# manifest roundtrip is exercised by versioned_snapshot_diff
# (operators/sources.py).
# ---------------------------------------------------------------------------
@query(
    "incremental_embedding_refresh",
    oracle="""
    WITH cur AS (
      SELECT doc_id, n_chars, md5(text) AS cur_hash FROM documents
    ), snap AS (
      SELECT doc_id,
             CASE WHEN doc_id % 101 = 0 THEN md5(text || 'v0') ELSE md5(text) END
               AS stored_hash
      FROM documents WHERE doc_id % 103 <> 0
    )
    SELECT CASE WHEN snap.doc_id IS NULL THEN 'new'
                WHEN cur.cur_hash <> snap.stored_hash THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           count(*)                  AS n_docs,
           CAST(sum(cur.n_chars) AS BIGINT) AS total_chars
    FROM cur LEFT JOIN snap ON cur.doc_id = snap.doc_id
    GROUP BY 1
    """,
    operators=("H4", "C3", "K5", "D1"),
)
def incremental_embedding_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    cur = docs.select("doc_id", "n_chars", F.md5("text").alias("cur_hash"))
    snap = docs.filter(F.col("doc_id") % 103 != 0).select(
        F.col("doc_id").alias("s_doc_id"),
        F.when(
            F.col("doc_id") % 101 == 0, F.md5(F.concat(F.col("text"), F.lit("v0")))
        )
        .otherwise(F.md5("text"))
        .alias("stored_hash"),
    )
    joined = cur.join(snap, cur["doc_id"] == snap["s_doc_id"], "left")
    change = (
        F.when(F.col("s_doc_id").isNull(), "new")
        .when(F.col("cur_hash") != F.col("stored_hash"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(change.alias("change_type"), "n_chars")
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# K12 index-quality report: recall@10 of the IVF probe path vs exact
# kNN, measured INSIDE the engine with a full value oracle — possible
# only because the coarse quantizer is deterministic (round 5). This is
# the ops view every ANN deployment watches; tools/recall_report.py
# remains the ad-hoc CLI form.
# ---------------------------------------------------------------------------
@query(
    "ivf_recall_at10",
    oracle=f"""
    WITH {_KM_CTES},
    p AS (SELECT vec_id AS probe_id, v AS pv FROM km_emb WHERE vec_id < 10),
    exact AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.probe_id
                 ORDER BY round(list_cosine_similarity(e.v, p.pv), 6) DESC,
                          e.vec_id) AS rn
        FROM km_emb e, p WHERE e.vec_id <> p.probe_id
      ) WHERE rn <= 10
    ),
    pcells AS (
      SELECT probe_id, cid FROM (
        SELECT e.vec_id AS probe_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c WHERE e.vec_id < 10
      ) WHERE rn <= 2
    ),
    approx AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT pc.probe_id, a.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY pc.probe_id
                 ORDER BY round(list_cosine_similarity(a.v, p.pv), 6) DESC,
                          a.vec_id) AS rn
        FROM pcells pc
        JOIN km_assign a ON a.cid = pc.cid
        JOIN p ON p.probe_id = pc.probe_id
        WHERE a.vec_id <> pc.probe_id
      ) WHERE rn <= 10
    )
    SELECT e.probe_id,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
           round(count(a.neighbor_id) / 10.0, 6) AS recall_at_10
    FROM exact e
    LEFT JOIN approx a
      ON a.probe_id = e.probe_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.probe_id
    """,
    operators=("K12", "K9", "K8", "E4"),
)
def ivf_recall_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-probe recall@10 of nprobe=2 IVF search vs exact cosine kNN
    over the first 10 probes — the index-quality gate as a QUERY."""
    from cloudvectordb_spark.functions import vector as V
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py
    from cloudvectordb_spark.operators.vector_ops import exact_knn

    path = ensure_ivf_index(spark, sf_dir)
    vectors = ivf_vectors_frame(spark, path)
    cents = index_centroids(spark, path)
    emb = load(spark, sf_dir, "embeddings")
    probe_rows = (
        emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding").collect()
    )
    probes_local = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in probe_rows],
        schema="vec_id long, embedding array<float>",
    )
    exact = exact_knn(emb, probes_local, k=10).select("probe_id", "neighbor_id")
    cells_local = spark.createDataFrame(
        [
            (r.vec_id, c)
            for r in probe_rows
            for c in nearest_cells_py(r.embedding, cents, 2)
        ],
        schema="probe_id long, cell int",
    )
    pv = probes_local.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    cand = (
        vectors.join(
            F.broadcast(cells_local), vectors["centroid_id"] == cells_local["cell"]
        )
        .filter(F.col("vec_id") != F.col("probe_id"))
        .join(F.broadcast(pv), "probe_id")
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    approx = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("probe_id", F.col("neighbor_id").alias("a_neighbor"))
    )
    return (
        exact.join(
            approx,
            (exact["probe_id"] == approx["probe_id"])
            & (exact["neighbor_id"] == approx["a_neighbor"]),
            "left",
        )
        .groupBy(exact["probe_id"].alias("probe_id"))
        .agg(
            F.count("a_neighbor").cast("bigint").alias("n_hits"),
            F.round(F.count("a_neighbor") / 10.0, 6).alias("recall_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# K12/K9 layout health: cell-size balance of the IVF partitioning. The
# number a rebuild decision watches — imbalance drives both probe-time
# tail latency (hot cells) and the semantic-dedup Σ|cell|² cost.
# ---------------------------------------------------------------------------
@query(
    "ivf_cell_balance_stats",
    oracle=f"""
    WITH {_KM_CTES},
    sizes AS (SELECT cid, count(*) AS n FROM km_assign GROUP BY cid)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(min(n) AS BIGINT) AS min_cell,
           CAST(max(n) AS BIGINT) AS max_cell,
           round(avg(n), 6) AS avg_cell,
           round(max(n) / avg(n), 6) AS imbalance
    FROM sizes
    """,
    operators=("K12", "K9", "D2", "D5"),
)
def ivf_cell_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors, _ = read_ivf_index(spark, ensure_ivf_index(spark, sf_dir))
    sizes = vectors.groupBy("centroid_id").agg(F.count("*").alias("n"))
    return sizes.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.min("n").cast("bigint").alias("min_cell"),
        F.max("n").cast("bigint").alias("max_cell"),
        F.round(F.avg("n"), 6).alias("avg_cell"),
        F.round(F.max("n") / F.avg("n"), 6).alias("imbalance"),
    )


# ---------------------------------------------------------------------------
# K9 lifecycle as a QUERY: assign a simulated daily delta (vec_id % 11
# == 0) against the FROZEN centroids and report the per-cell landing
# counts — the cheap pre-flight a production append runs before touching
# the layout (work ∝ delta, never corpus). Frozen-centroid assignment
# equals the full build's assignment restricted to the delta, which is
# exactly what the oracle replays.
# ---------------------------------------------------------------------------
@query(
    "ivf_delta_assign_counts",
    oracle=f"""
    WITH {_KM_CTES}
    SELECT CAST(cid AS INTEGER) AS centroid_id,
           CAST(count(*) AS BIGINT) AS n_delta
    FROM km_assign WHERE vec_id % 11 = 0
    GROUP BY cid
    """,
    operators=("K9", "D1", "B4"),
)
def ivf_delta_assign_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.operators.kmeans_det import assign_cells

    path = ensure_ivf_index(spark, sf_dir)
    cents = index_centroids(spark, path)
    delta = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 11 == 0)
    return (
        assign_cells(delta, cents)
        .groupBy(F.col("centroid_id").cast("int").alias("centroid_id"))
        .agg(F.count("*").cast("bigint").alias("n_delta"))
    )


# ---------------------------------------------------------------------------
# K12 for the LSH layout: recall@10 of the bucket-join probe path vs
# exact L2 kNN — the companion of ivf_recall_at10, fully value-oracled
# because the hyperplanes are md5-derived.
# ---------------------------------------------------------------------------
@query(
    "lsh_recall_at10",
    oracle=f"""
    WITH {_LSH_CTES},
    p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
      FROM embeddings WHERE vec_id < 3
    ),
    exact AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.probe_id
                 ORDER BY round(list_distance(CAST(e.embedding AS DOUBLE[]), p.pv), 6),
                          e.vec_id) AS rn
        FROM embeddings e, p WHERE e.vec_id <> p.probe_id
      ) WHERE rn <= 10
    ),
    pb AS (SELECT vec_id AS probe_id, table_id, bucket FROM lsh_b WHERE vec_id < 3),
    cand AS (
      SELECT DISTINCT pb.probe_id, c.vec_id
      FROM lsh_b c JOIN pb ON c.table_id = pb.table_id AND c.bucket = pb.bucket
      WHERE c.vec_id <> pb.probe_id
    ),
    approx AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT cand.probe_id, cand.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY cand.probe_id
                 ORDER BY round(list_distance(CAST(ec.embedding AS DOUBLE[]),
                                              p.pv), 6), cand.vec_id) AS rn
        FROM cand
        JOIN embeddings ec ON ec.vec_id = cand.vec_id
        JOIN p ON p.probe_id = cand.probe_id
      ) WHERE rn <= 10
    )
    SELECT e.probe_id,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
           round(count(a.neighbor_id) / 10.0, 6) AS recall_at_10
    FROM exact e
    LEFT JOIN approx a
      ON a.probe_id = e.probe_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.probe_id
    """,
    operators=("K12", "K10", "K8", "E4"),
)
def lsh_recall_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.functions import vector as V

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    probes = emb.filter(F.col("vec_id") < 3)
    pv = probes.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    scored = (
        emb.crossJoin(F.broadcast(pv))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.l2_distance("embedding", "probe_vec"), 6).alias("d"),
        )
    )
    we = Window.partitionBy("probe_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    exact = (
        scored.withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "neighbor_id")
    )
    approx = (
        lsh_topk_search(spark, sf_dir)
        .select("probe_id", F.col("neighbor_id").alias("a_neighbor"))
    )
    return (
        exact.join(
            approx,
            (exact["probe_id"] == approx["probe_id"])
            & (exact["neighbor_id"] == approx["a_neighbor"]),
            "left",
        )
        .groupBy(exact["probe_id"].alias("probe_id"))
        .agg(
            F.count("a_neighbor").cast("bigint").alias("n_hits"),
            F.round(F.count("a_neighbor") / 10.0, 6).alias("recall_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# K10 multi-probe: additionally check the +-1 neighboring bucket in each
# hash table. A near neighbor split across a bucket boundary (the main
# recall leak of bucketed projections) is caught by the adjacent probe
# without adding hash tables — candidate volume grows ~3x per table
# while recall approaches the exhaustive scan. Fully oracle-replayable:
# the probe sequence is just bucket + {-1, 0, +1}.
# ---------------------------------------------------------------------------
@query(
    "lsh_multiprobe_knn",
    oracle=f"""
    WITH {_LSH_CTES},
    pb AS (
      SELECT b.vec_id AS probe_id, b.table_id, b.bucket + o.o AS bucket
      FROM lsh_b b, (SELECT unnest(generate_series(-1, 1)) AS o) o
      WHERE b.vec_id < 3
    ),
    cand AS (
      SELECT DISTINCT pb.probe_id, c.vec_id
      FROM lsh_b c JOIN pb ON c.table_id = pb.table_id AND c.bucket = pb.bucket
      WHERE c.vec_id <> pb.probe_id
    ),
    scored AS (
      SELECT cand.probe_id, cand.vec_id AS neighbor_id,
             round(list_distance(CAST(ec.embedding AS DOUBLE[]),
                                 CAST(ep.embedding AS DOUBLE[])), 6) AS l2_dist
      FROM cand
      JOIN embeddings ec ON ec.vec_id = cand.vec_id
      JOIN embeddings ep ON ep.vec_id = cand.probe_id
    )
    SELECT probe_id, neighbor_id, l2_dist, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
                 ORDER BY l2_dist, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K10", "K8", "E4"),
)
def lsh_multiprobe_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.functions import vector as V

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    hashed = lsh_hashed(emb).select("vec_id", "table_id", "bucket")
    probes = (
        lsh_hashed(emb.filter(F.col("vec_id") < 3))
        .select(
            F.col("vec_id").alias("probe_id"),
            "table_id",
            F.explode(
                F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)
            ).alias("bucket"),
        )
    )
    cand = (
        hashed.join(F.broadcast(probes), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
        .distinct()
    )
    pv = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    scored = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(pv), "probe_id")
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.l2_distance("embedding", "probe_vec"), 6).alias("l2_dist"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("l2_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# K12/K9 ops: the rebuild decision in one row. Combines the two signals
# a real deployment watches — cell-size imbalance (probe tail latency,
# Σ|cell|² dedup cost) and centroid drift (how far the data's per-cell
# mean has moved from the frozen centroid) — into thresholded booleans
# plus the raw numbers. Deterministic end to end, so even the
# RECOMMENDATION carries a value oracle.
# ---------------------------------------------------------------------------
@query(
    "ivf_rebuild_decision",
    oracle=f"""
    WITH {_KM_CTES},
    sizes AS (SELECT cid, count(*) AS n FROM km_assign GROUP BY cid),
    bal AS (
      SELECT max(n) / avg(n) AS imbalance FROM sizes
    ),
    cur_means AS (
      SELECT cid, t.i AS dim, avg(a.v[t.i]) AS m
      FROM km_assign a, range(1, 65) t(i)
      GROUP BY cid, t.i
    ),
    drift AS (
      SELECT sqrt(max(cell_d2)) AS max_drift FROM (
        SELECT cm.cid, sum((cm.m - c.v[cm.dim]) * (cm.m - c.v[cm.dim])) AS cell_d2
        FROM cur_means cm JOIN km_c{_IVF_ROUNDS} c ON c.cid = cm.cid
        GROUP BY cm.cid
      )
    )
    SELECT round(bal.imbalance, 6) AS imbalance,
           round(drift.max_drift, 6) AS max_centroid_drift,
           bal.imbalance > 2.0 AS rebalance_recommended,
           drift.max_drift > 0.25 AS retrain_recommended
    FROM bal, drift
    """,
    operators=("K12", "K9", "D2", "D5"),
)
def ivf_rebuild_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row health verdict: cell imbalance + worst per-cell centroid
    drift (L2 between the frozen centroid and the cell's CURRENT mean),
    with thresholded recommendations."""
    path = ensure_ivf_index(spark, sf_dir)
    vectors = ivf_vectors_frame(spark, path)
    cents_df = spark.read.parquet(f"{path}/centroids")
    sizes = vectors.groupBy("centroid_id").agg(F.count("*").alias("n"))
    bal = sizes.agg((F.max("n") / F.avg("n")).alias("imbalance"))
    cur = (
        vectors.select(
            "centroid_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "x"),
        )
        .groupBy("centroid_id", (F.col("dim0") + 1).alias("dim"))
        .agg(F.avg("x").alias("m"))
    )
    drift = (
        cur.join(cents_df, "centroid_id")
        .select(
            "centroid_id",
            ((F.col("m") - F.element_at("centroid", F.col("dim").cast("int")))
             * (F.col("m") - F.element_at("centroid", F.col("dim").cast("int")))
             ).alias("d2"),
        )
        .groupBy("centroid_id")
        .agg(F.sum("d2").alias("cell_d2"))
        .agg(F.sqrt(F.max("cell_d2")).alias("max_drift"))
    )
    return bal.crossJoin(drift).select(
        F.round("imbalance", 6).alias("imbalance"),
        F.round("max_drift", 6).alias("max_centroid_drift"),
        (F.col("imbalance") > 2.0).alias("rebalance_recommended"),
        (F.col("max_drift") > 0.25).alias("retrain_recommended"),
    )


# ---------------------------------------------------------------------------
# K12 data-quality: embedding outliers by assignment distance. Vectors
# whose distance to their own centroid exceeds the corpus p99 are the
# mis-embedded / out-of-distribution rows a pipeline quarantines before
# they poison retrieval. Exact interpolated p99 (quantile_cont / R-7 —
# the same definition Spark's percentile() computes), deterministic
# layout => full value oracle.
# ---------------------------------------------------------------------------
@query(
    "embedding_outlier_audit",
    oracle=f"""
    WITH {_KM_CTES},
    d AS (
      SELECT a.vec_id, a.cid,
             round(list_sum(list_transform(list_zip(a.v, c.v),
               p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS d2
      FROM km_assign a JOIN km_c{_IVF_ROUNDS} c ON c.cid = a.cid
    ),
    thr AS (SELECT quantile_cont(d2, 0.99) AS p99 FROM d)
    SELECT d.vec_id, CAST(d.cid AS INTEGER) AS centroid_id, d.d2,
           round(thr.p99, 6) AS p99_d2
    FROM d, thr
    WHERE d.d2 > thr.p99
    """,
    operators=("K12", "K9", "D5", "B2"),
)
def embedding_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.operators.kmeans_det import _dist_structs

    path = ensure_ivf_index(spark, sf_dir)
    vectors = ivf_vectors_frame(spark, path)
    cents = index_centroids(spark, path)
    # d2 to the OWN assigned centroid: pick the struct whose cid matches
    structs = _dist_structs(F.col("embedding"), cents)
    own = F.element_at(
        F.filter(structs, lambda s: s["cid"] == F.col("centroid_id")), 1
    )
    d = vectors.select(
        "vec_id",
        F.col("centroid_id").cast("int").alias("centroid_id"),
        own["d"].alias("d2"),
    )
    thr = d.agg(
        F.percentile(F.col("d2"), F.lit(0.99)).alias("p99")
    )
    return (
        d.crossJoin(F.broadcast(thr))
        .filter(F.col("d2") > F.col("p99"))
        .select(
            "vec_id", "centroid_id", "d2", F.round("p99", 6).alias("p99_d2")
        )
    )
